package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Sources

/** PII detection and redaction over the `documents` corpus — the scrub
  * stage every training-data pipeline runs before text leaves the ingest
  * boundary (emails, phone numbers, IP addresses, national-id shapes).
  *
  * Reference surface: none (the reference's quality checks stop at
  * null/range gates — `data_quality_checks.py`); this extends the DQ
  * family the same way the dedup/similarity kit does.
  *
  * Shape at 100 TB: pure map-only regex work — no shuffle anywhere, scales
  * with scan bandwidth. The patterns are codegen'd `regexp_extract_all` /
  * `regexp_replace` over each partition; a real deployment swaps in
  * domain-tuned patterns (or an NER model via mapInPandas at the
  * [[Multimodal]] codec leaf) without changing the plan shape.
  *
  * Determinism / oracle parity: patterns are restricted to the
  * Java-regex ∩ RE2 common subset — character classes, bounded repetition,
  * `\b` word boundaries; NO backreferences or lookarounds (RE2, hence the
  * DuckDB twin, rejects them). The corpus fixture carries no PII, so the
  * queries run over [[withSyntheticPii]] — a deterministic PII-bearing twin
  * derived from doc_id that both engines construct identically: the oracle
  * then exercises nonzero matches of every pattern while the fixture stays
  * clean. A production caller points the same operators at raw text.
  */
object Pii {

  /** RFC-ish email shape (the pragmatic scrub pattern, not full RFC 5322). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style 3-3-4 phone with dash separators. */
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** US SSN shape 3-2-4 (distinct from the phone's 3-3-4). */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (scrub-grade: no 0-255 range check). */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redaction order + placeholder per pattern. Email first (it may embed
    * digit runs), SSN before phone (both dashed-digit shapes; the shapes
    * are disjoint but a fixed order keeps both engines identical), IP
    * last. */
  val Redactions: Seq[(String, String)] = Seq(
    EmailRe -> "[EMAIL]",
    SsnRe -> "[SSN]",
    PhoneRe -> "[PHONE]",
    Ipv4Re -> "[IP]")

  /** Deterministic PII-bearing twin of a clean corpus: appends synthetic
    * identifiers derived from doc_id (different moduli per type, so docs
    * carry every subset of the four types and some stay clean). The DuckDB
    * twin builds the identical string. */
  def withSyntheticPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def num(c: Column): Column = c.cast("string")
    val ip = when(id % 2 === 0, concat(lit(" host 10."), num(id % 256),
      lit(".0."), num((id * 3) % 256))).otherwise(lit(""))
    val mail = when(id % 3 === 0, concat(lit(" mail user"), num(id),
      lit("@example.com"))).otherwise(lit(""))
    val phone = when(id % 4 === 0, concat(lit(" call 555-"),
      lpad(num(id % 1000), 3, "0"), lit("-"),
      lpad(num((id * 7) % 10000), 4, "0"))).otherwise(lit(""))
    val ssn = when(id % 5 === 0, concat(lit(" ssn 123-45-"),
      lpad(num(id % 10000), 4, "0"))).otherwise(lit(""))
    docs.withColumn("text", concat(col("text"), ip, mail, phone, ssn))
  }

  private def count(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** PRODUCTION ENTRY — per-document PII inventory over ANY (doc_id, text)
    * frame: match count per pattern family plus the has_pii gate a filter
    * stage keys on. Map-only; point it at raw ingested text. Extra input
    * columns pass through untouched so the scan can sit inline in a wider
    * pipeline. */
  def scanOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_emails", count(col("text"), EmailRe))
      .withColumn("n_ssns", count(col("text"), SsnRe))
      .withColumn("n_phones", count(col("text"), PhoneRe))
      .withColumn("n_ips", count(col("text"), Ipv4Re))
      .withColumn("has_pii",
        col("n_emails") + col("n_ssns") + col("n_phones") + col("n_ips") > 0)

  /** PRODUCTION ENTRY — redact ANY (doc_id, text) frame: each pattern
    * family replaced by its typed placeholder, in [[Redactions]] order,
    * plus the redaction count (the audit number a scrub job reports).
    * Map-only; the `redacted_text` output is the training corpus every
    * downstream stage reads. */
  def redactedOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_redactions",
        count(col("text"), EmailRe) + count(col("text"), SsnRe) +
          count(col("text"), PhoneRe) + count(col("text"), Ipv4Re))
      .withColumn("redacted_text",
        Redactions.foldLeft(col("text")) {
          case (c, (re, tag)) => regexp_replace(c, re, tag)
        })

  /** Registered oracle harness: [[scanOf]] over the deterministic
    * PII-bearing twin of the clean fixture corpus (see [[withSyntheticPii]])
    * — exercises nonzero matches of every pattern family. A production
    * caller uses [[scanOf]] on raw text directly. */
  def scan(spark: SparkSession, dir: String): DataFrame =
    scanOf(withSyntheticPii(Sources.documents(spark, dir)))
      .select("doc_id", "n_emails", "n_ssns", "n_phones", "n_ips", "has_pii")

  /** Registered oracle harness for [[redactedOf]], same framing as
    * [[scan]]. */
  def redacted(spark: SparkSession, dir: String): DataFrame =
    redactedOf(withSyntheticPii(Sources.documents(spark, dir)))
      .select("doc_id", "n_redactions", "redacted_text")

  // ---------------------------------------------------- group privacy

  /** k-anonymity group floor: a quasi-identifier combination shared by
    * fewer than this many rows is re-identifiable. */
  val AnonK = 5
  /** l-diversity floor: an anonymous group whose sensitive attribute
    * takes fewer than this many distinct values still leaks it. */
  val DiversityL = 2

  /** Group-privacy audit — the structured-data side of the scrub stage:
    * regex redaction protects free text, but a released TABLE re-identifies
    * through quasi-identifier combinations (Sweeney's k-anonymity) and
    * leaks through uniform sensitive attributes within a group
    * (l-diversity). One groupBy over the quasi columns yields both: group
    * size vs [[AnonK]] and sensitive-value NDV vs [[DiversityL]]. Rows in
    * failing groups are what a release either suppresses or generalizes.
    *
    * Shape at 100 TB: one hash shuffle on the quasi key with map-side
    * partial aggregation; output is group-grain (bounded by the quasi
    * domain, not the table). */
  def kAnonymityOf(df: DataFrame, quasi: Seq[String],
                   sensitive: String): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(
        // qualified: this object's private regex `count` helper shadows
        // the aggregate function
        org.apache.spark.sql.functions.count(lit(1)).as("group_size"),
        countDistinct(col(sensitive)).as("sensitive_ndv"))
      .withColumn("k_anonymous", col("group_size") >= AnonK)
      .withColumn("l_diverse", col("sensitive_ndv") >= DiversityL)

  /** Registered oracle harness: the customer dimension released by
    * (nation, market segment) — the classic demographic quasi-identifier
    * pair — with the account-balance SIGN as the sensitive attribute
    * (credit standing: the thing a re-identified row leaks). */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    kAnonymityOf(
      Sources.customer(spark, dir)
        .withColumn("acctbal_sign",
          when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("nonneg"))),
      Seq("c_nationkey", "c_mktsegment"), "acctbal_sign")
}
