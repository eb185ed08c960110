package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.apache.spark.sql.types._

/** Output-TYPE gate between every oracle twin and its Spark query
  * (VERDICT r10 #2). The driver's hash canonicalizes values through
  * pandas, where a DuckDB HUGEINT (int128, from `SUM(BIGINT)` promotion)
  * renders as float64 — `50.0` vs Spark's `50` — a hash-only, value-equal
  * divergence that value-level sweeps (compare.py, ExactnessSpec) cannot
  * see. Two rounds shipped that disease past a green local harness
  * (`text_vocab_drift` r9+r10, `corpus_quality_sample` r10).
  *
  * This spec closes the class: for EVERY `SparkEntry.oracleSql` entry it
  * runs `DESCRIBE <sql>` in DuckDB (tools/typegate.py — plan-only, no
  * execution) against the sf0.001 tables and asserts each output column's
  * DuckDB type maps EXACTLY to the Spark result schema's type:
  * BIGINT↔LongType, INTEGER↔IntegerType, VARCHAR↔StringType, … Integer
  * WIDTH must match (no int32-vs-BIGINT rank skew), HUGEINT never maps
  * (the promotion must be cast away in the twin), and TIMESTAMP must be
  * µs-exact (TIMESTAMP_NS in a twin is a mismatch to pin with a CAST).
  *
  * Requires python3+duckdb on the host (the same dependency the driver's
  * oracle itself has); the spec cancels, loudly, if they're absent.
  */
class OracleTypeSpec extends SparkSpec {

  /** DuckDB DESCRIBE type → the Spark DDL type it must equal. None =
    * never representable (unsigned / int128 families): always a failure. */
  private def duckToSpark(t: String): Option[String] = {
    val T = t.trim.toUpperCase
    if (T.endsWith("[]")) duckToSpark(T.dropRight(2)).map(e => s"ARRAY<$e>")
    else T match {
      case "BIGINT"            => Some("BIGINT")
      case "INTEGER"           => Some("INT")
      case "SMALLINT"          => Some("SMALLINT")
      case "TINYINT"           => Some("TINYINT")
      case "DOUBLE"            => Some("DOUBLE")
      case "FLOAT" | "REAL"    => Some("FLOAT")
      case "VARCHAR"           => Some("STRING")
      case "BOOLEAN"           => Some("BOOLEAN")
      case "DATE"              => Some("DATE")
      case "TIMESTAMP"         => Some("TIMESTAMP")
      case "BLOB"              => Some("BINARY")
      case d if d.startsWith("DECIMAL") => Some(d.replaceAll("\\s", ""))
      // TIMESTAMP_NS / HUGEINT / unsigned: deliberately unmapped — pin a
      // CAST in the oracle twin instead of widening the contract here.
      case _ => None
    }
  }

  private def sparkDdl(dt: DataType): String = dt match {
    case ArrayType(e, _) => s"ARRAY<${sparkDdl(e)}>"
    case LongType        => "BIGINT"
    case IntegerType     => "INT"
    case StringType      => "STRING"
    case other           => other.sql
  }

  private lazy val pythonOk: Boolean =
    scala.util.Try(Process(Seq("python3", "-c", "import duckdb")).!).toOption
      .contains(0)

  test("every oracle twin's DuckDB output types match the Spark schema exactly (137/137)") {
    assume(pythonOk, "python3+duckdb unavailable — type gate skipped")
    val dir = Files.createTempDirectory("typegate")
    val oraclePath = dir.resolve("oracle_sql.json")
    Files.writeString(oraclePath, Verify.oracleJson)

    // one DESCRIBE sweep for all twins: query \t column \t duck_type
    val out = Process(Seq("python3", "tools/typegate.py", sf, oraclePath.toString)).!!
    val duckCols: Map[String, Seq[(String, String)]] = out.linesIterator
      .filter(_.nonEmpty).toSeq
      .map { l => val Array(q, c, t) = l.split("\t", 3); (q, c, t) }
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap

    val names = SparkEntry.oracleSql.keySet
    assert(names.subsetOf(SparkEntry.queries.keySet),
      s"oracleSql names missing from queries: ${names.diff(SparkEntry.queries.keySet)}")

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var checked = 0
    for (name <- names.toSeq.sorted) {
      duckCols.get(name) match {
        case None => failures += s"$name: no DESCRIBE output"
        case Some(cols) if cols.exists(_._1 == "!ERROR") =>
          failures += s"$name: DESCRIBE failed: ${cols.head._2}"
        case Some(cols) =>
          // Spark schema is available lazily — no job runs for the plan
          val schema = SparkEntry.queries(name)(spark, sf).schema
          val sparkTypes = schema.fields.map(f => f.name -> sparkDdl(f.dataType)).toMap
          val duckTypes  = cols.map { case (c, t) => c -> t }.toMap
          if (sparkTypes.keySet != duckTypes.keySet)
            failures += s"$name: column sets differ spark=${sparkTypes.keySet.toSeq.sorted} duck=${duckTypes.keySet.toSeq.sorted}"
          else duckTypes.toSeq.sortBy(_._1).foreach { case (c, dt) =>
            duckToSpark(dt) match {
              case None => failures += s"$name.$c: oracle type $dt has no exact Spark mapping (cast it in the twin)"
              case Some(exp) if exp != sparkTypes(c) =>
                failures += s"$name.$c: oracle $dt→$exp vs spark ${sparkTypes(c)}"
              case _ => ()
            }
          }
          checked += 1
      }
    }
    assert(failures.isEmpty, s"${failures.size} type mismatches:\n${failures.mkString("\n")}")
    assert(checked == names.size, s"checked $checked of ${names.size}")
    info(s"$checked/${names.size} oracle twins type-identical to their Spark queries")
  }
}
