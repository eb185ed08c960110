package graft

/** Dev probe: time one named query in isolation (fresh JVM). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Session.build(s"local[$cpus]", cpus, "graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"PROBE $name rows=$n build=${(t1 - t0) / 1e9}%.2fs exec=${(t2 - t1) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
