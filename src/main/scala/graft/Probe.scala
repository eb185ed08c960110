package graft

/** Dev probe: time one named query in isolation (fresh JVM). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Session.build(s"local[$cpus]", cpus, "graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_STAGE_DEBUG"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
          val cpu = i.taskMetrics.executorCpuTime / 1e9
          val run = i.taskMetrics.executorRunTime / 1e3
          if (wall > 1.0)
            println(f"SLOWSTAGE id=${i.stageId}%3d tasks=${i.numTasks}%4d wall=$wall%7.2fs " +
              f"taskrun=$run%7.2fs taskcpu=$cpu%7.2fs  ${i.name.take(70)}")
        }
      })
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
