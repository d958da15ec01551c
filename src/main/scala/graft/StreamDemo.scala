package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Drives the Structured Streaming operators against the events table
  * re-landed as a streaming parquet source (memory sink, synchronous).
  * Usage: runMain graft.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val srcDir = Files.createTempDirectory("graft_stream").toString
    Tables(spark, sfDir, "events").write.mode("overwrite").parquet(srcDir)

    val q = EventStreams.tumblingCounts(EventStreams.source(spark, srcDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("windows").start()
    q.processAllAvailable()
    val windows = spark.table("windows")
    println(s"streaming windows: ${windows.count()} rows")
    windows.orderBy(desc("n")).show(5)
    q.stop()

    val sessions = EventStreams.sessionize(
      Tables(spark, sfDir, "events")
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStreams.EventIn])
    println(s"closed sessions: ${sessions.count()}")
    spark.stop()
  }
}
