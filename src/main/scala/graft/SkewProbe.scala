package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

// dev scratch — measured skew evidence (round-7 item 8): a hot-key join
// fixture at sf1-like volume, comparing the naive sort-merge join, AQE's
// skew-join split, and Skew.saltedJoin. Broadcast is disabled throughout:
// the scenario is the cluster case where the dim side is too big to
// broadcast (locally a 2000-row dim would broadcast and hide the skew).
// Variants are interleaved per pass so VM throttle episodes hit them alike.
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.build("local[32]", "32", "graft-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/repo/target/skewfix"
    if (!new java.io.File(s"$dir/fact").exists()) {
      // 20M fact rows: 40% land on key 0, the rest spread over 2000 keys
      spark.range(20000000L).select(
          col("id"),
          when(pmod(col("id"), lit(5)) < 2, 0L)
            .otherwise(pmod(hash(col("id")), lit(2000)).cast("long")).as("k"),
          (col("id") % 97).as("v"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/fact")
      spark.range(2000L).select(col("id").as("k"), (col("id") * 7 % 101).as("w"))
        .write.mode("overwrite").parquet(s"$dir/dim")
    }
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")
    def run(j: DataFrame): Long =
      j.select(sum(col("v") * col("w")).as("s")).first().getLong(0)
    def conf(k: String, v: String): Unit = spark.conf.set(k, v)
    conf("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val variants: Seq[(String, () => Long)] = Seq(
      "naive_smj" -> { () =>
        conf("spark.sql.adaptive.skewJoin.enabled", "false")
        run(fact.join(dim, "k"))
      },
      "aqe_skew" -> { () =>
        conf("spark.sql.adaptive.skewJoin.enabled", "true")
        conf("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        conf("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        run(fact.join(dim, "k"))
      },
      "salted_32" -> { () =>
        conf("spark.sql.adaptive.skewJoin.enabled", "false")
        run(graft.ext.Skew.saltedJoin(fact, dim, "k", col("id"), 32))
      })
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    var checksum = Option.empty[Long]
    for (pass <- 1 to 3; (name, body) <- variants) {
      val t0 = System.nanoTime()
      val s = body()
      val dt = (System.nanoTime() - t0) / 1e9
      checksum match {
        case None => checksum = Some(s)
        case Some(c) => assert(c == s, s"variant $name checksum mismatch: $s vs $c")
      }
      times(name) = dt :: times(name)
      println(f"[skew] pass$pass $name%-10s ${dt}%7.2f s  (sum=$s)")
    }
    for ((name, _) <- variants)
      println(f"[skew] MIN $name%-10s ${times(name).min}%7.2f s")
    spark.stop()
  }
}
