package graft

import org.apache.spark.sql.SparkSession

/** One place that builds the engine's SparkSession with every setting the
  * library depends on — so loaders stay side-effect-free (a scan function
  * mutating session conf was VERDICT r2 finding #3).
  */
object Session {
  def build(master: String, shufflePartitions: String, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries INT64 TIMESTAMP(NANOS), which Spark's reader
      // rejects natively; read the nanos as long here (session construction)
      // and let Sources.events truncate to a µs timestamp
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // wide profile rows (64-dim embedding literals, 60-col gold frames)
      // trip the default 25-field plan-string truncation, whose WARN lands
      // in the driver's parsed stdout tail; plan strings here are debug
      // output only, so raise the cap past anything the engine builds
      .config("spark.sql.debug.maxToStringFields", "10000")
      // this VM throttles CPU ~10x at random for minutes at a time; at the
      // default 10s heartbeat x 60 allowed misses, one long starved task
      // (a 10-min quadratic baseline at sf1) kills the in-process executor
      // ("unable to send heartbeats to driver more than 60 times") and the
      // whole context with it. 60s x 60 tolerates a full hour of stall
      // without weakening real-cluster semantics (network.timeout must stay
      // above the heartbeat interval).
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()

  /** Discard ALL log4j output for this JVM — for the bench mains, whose
    * stdout tail the driver parses as JSON and whose stderr may be merged
    * into that capture. Must run BEFORE any Spark class initializes
    * logging. Root at OFF with a single discarding Null appender: Spark's
    * Logging only re-applies its INFO console profile when the root is
    * appender-less or ERROR-on-DefaultConfiguration, so this config
    * survives SparkContext init untouched. Delivered via the
    * log4j2.configurationFile property (read at first LogManager use) —
    * programmatic Configurator.initialize proved unreliable across
    * logger-context selectors. */
  def silenceAllLogs(): Unit = {
    val quiet = java.nio.file.Files.createTempFile("graft-quiet-log4j2", ".properties")
    quiet.toFile.deleteOnExit()
    java.nio.file.Files.writeString(quiet,
      """rootLogger.level = OFF
        |appender.discard.type = Null
        |appender.discard.name = discard
        |rootLogger.appenderRef.discard.ref = discard
        |""".stripMargin)
    System.setProperty("log4j2.configurationFile", quiet.toString)
  }
}
