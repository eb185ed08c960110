package graft

/** DuckDB oracle SQL for the extension operators (text analysis, dedup,
  * similarity, events) — textual twins of [[graft.ext]] (same parity rules as
  * [[Oracles]]).
  *
  * DuckDB deltas worth remembering:
  *  - regexp_replace needs the 'g' flag (Spark replaces globally by default)
  *  - list lambdas: list_filter / list_transform / list_reduce;
  *    list_reduce has no init value → seed via list_prepend
  *  - len() for lists, length() for strings
  */
object OraclesExt {
  private def R(e: String, k: Int): String = s"FLOOR(($e) * 1e$k + 0.5) / 1e$k"

  /** Tokens incl. empties — twin of Text.tokens. */
  private val toks = "string_split(text, ' ')"
  private def hits(words: Seq[String]): String =
    s"len(list_filter($toks, w -> w IN (${words.map("'" + _ + "'").mkString(",")})))"

  /** Twin of Text.rollingHash. */
  private def rollhash(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (h, c) -> (h * 131 + c) % 2147483647)""".stripMargin

  import graft.ext.Text.{Markers, Stopwords, BpePattern}

  val textStats: String = {
    val nTok = s"CAST(len($toks) AS BIGINT)"
    val nChars = "CAST(length(text) AS BIGINT)"
    val punct = s"$nChars - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))"
    val stopRatio = s"CAST(${hits(Stopwords)} AS DOUBLE) / $nTok"
    val punctRatio = s"CAST($punct AS DOUBLE) / $nChars"
    val uniqRatio = s"CAST(len(list_distinct($toks)) AS DOUBLE) / $nTok"
    s"""SELECT doc_id, lang, source,
       |  $nChars AS n_chars_measured,
       |  $nTok AS n_tokens,
       |  CAST(len(regexp_extract_all(text, '$BpePattern')) AS BIGINT) AS n_bpe_tokens,
       |  ${R(s"CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / $nTok", 2)} AS avg_token_len,
       |  ${R(stopRatio, 4)} AS stopword_ratio,
       |  ${R(punctRatio, 4)} AS punct_ratio,
       |  ${R(uniqRatio, 4)} AS uniq_token_ratio,
       |  ${R(s"LEAST(CAST($nTok AS DOUBLE), 1e2) / 100 * 3e-1" +
            s" + LEAST(($stopRatio) * 5, 1e0) * 2e-1" +
            s" + GREATEST(1e0 - ($punctRatio) * 10, 0e0) * 2e-1" +
            s" + ($uniqRatio) * 3e-1", 4)} AS quality_score
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  val textLangid: String = {
    val hitCols = Markers.map { case (l, ws) => s"${hits(ws)} AS ${l}_hits" }
    val best = Markers.map(l => s"${l._1}_hits").mkString("GREATEST(", ", ", ")")
    val arms = Markers.map { case (l, _) => s"WHEN ${l}_hits = best THEN '$l'" }
    s"""WITH h AS (
       |  SELECT doc_id, lang AS declared_lang, ${hitCols.mkString(",\n    ")}
       |  FROM documents),
       |b AS (SELECT *, $best AS best FROM h)
       |SELECT doc_id, declared_lang, ${Markers.map(l => s"${l._1}_hits").mkString(", ")},
       |  CASE WHEN best = 0 THEN 'und' ${arms.mkString(" ")} ELSE 'und' END AS predicted_lang
       |FROM b
       |ORDER BY doc_id""".stripMargin
  }

  val textFingerprint: String =
    s"""SELECT doc_id,
       |  ${rollhash("text")} AS fingerprint,
       |  ${rollhash("trim(regexp_replace(text, ' +', ' ', 'g'))")} AS fingerprint_normalized,
       |  md5(text) AS md5_hex
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  val textTokenFrequency: String =
    s"""SELECT token,
       |  COUNT(*) AS occurrences,
       |  COUNT(DISTINCT doc_id) AS doc_frequency
       |FROM (SELECT doc_id, unnest($toks) AS token FROM documents)
       |WHERE token <> ''
       |GROUP BY token
       |ORDER BY token""".stripMargin

  val all: Map[String, String] = Map(
    "text_stats" -> textStats,
    "text_langid" -> textLangid,
    "text_fingerprint" -> textFingerprint,
    "text_token_frequency" -> textTokenFrequency
  )
}
