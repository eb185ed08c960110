package graft.ext

// dev scratch (round 9): plan-shape + timing probe for the round's new operators
object Probe9 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Session.build("local[32]", "32", "graft-probe9")
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val w0 = System.nanoTime()
      val r = f
      println(f"[probe9] $name%-32s ${(System.nanoTime() - w0) / 1e9}%7.2f s")
      r
    }
    val names = sys.env.getOrElse("PROBE9_QUERIES", "sampling_cluster_balanced")
      .split(",").toSeq
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      if (sys.env.contains("PROBE9_EXPLAIN")) df.explain("formatted")
      t(n)(df.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
