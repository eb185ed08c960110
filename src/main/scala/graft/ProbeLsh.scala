package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the MinHash-LSH pipeline. */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.build(s"local[$cpus]", cpus, "graft-probe-lsh")
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"LSH $tag n=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import graft.ext.{Dedup, Text}
    import graft.engine.Sources
    val docs = Sources.documents(spark, sfDir)
    t("docs")(docs.count())
    t("tokens")(docs.select(Text.tokens(col("text")).as("t")).select(sum(size(col("t")))).first().getLong(0))
    val sh = Dedup.shingles(docs)
    t("shingles")(sh.count())
    t("shingles2")(sh.count())
    val hashed = sh.select(col("doc_id"), Text.rollingHash(col("shingle")).as("h"))
    t("hashed")(hashed.count())
    val P = Dedup.P
    val mins = Dedup.Perms.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % P).as(s"mh$i")
    }
    val sigs = hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    t("sigs")(sigs.count())
    t("pairs_total")(Dedup.minhashLshPairs(spark, sfDir).count())
    spark.stop()
  }
}
