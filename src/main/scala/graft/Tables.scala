package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table catalog over a driver-provided scale-factor directory
  * (see /root/repo/TESTDATA.md). The storage swap for the reference's
  * Cassandra reads (reference: ccdc/cassandra.py:30-42 → SURVEY.md S4):
  * columnar Parquet gives us predicate pushdown + column pruning for free,
  * which the reference's DSV1 Cassandra scan only partially had.
  *
  * At 100 TB these reads become multi-file partitioned datasets; nothing
  * here assumes a single file — `spark.read.parquet(dir)` handles both.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 only reads as
    // a long (spark.sql.legacy.parquet.nanosAsLong). Convert to a real
    // microsecond timestamp with exact integer arithmetic — `div`
    // truncates like DuckDB's own ns→µs read of the same file.
    if (name == "events" &&
        df.schema.find(_.name == "ts").exists(_.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
