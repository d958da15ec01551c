package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
