package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev plan-audit for the ITERATED folds (companion to [[Explain]]):
  * a registered query's `.explain` shows only its FINAL frame, whose
  * leaves are the loop rounds' checkpointed RDDs — the per-round plan
  * (where the round-floor exchanges live) never appears in it. This
  * main reconstructs ONE round frame per loop family, unexecuted, and
  * prints its formatted plan; the round-plan artifacts under
  * `plans/r17` are produced by exactly this command:
  *
  *   runMain graft.ExplainRound <sfDir>
  *
  * The frames are built from the SAME private[graft] pieces the
  * registered loops call (knnRoundCand/knnScore/knnTopK,
  * ccRound), so the printed plan is the loop body's, not a
  * reconstruction that can drift.
  */
object ExplainRound {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain-round")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- k-NN descent round (the s29/s34/s37 loop body) ----
    // One checkpointed list state + fixed-point frame, exactly as the
    // loop holds them between rounds; the printed plan is the round
    // frame the next Subplan.once would execute.
    val all = ops.Subplan.once(
      ext.Similarity.emb(spark, sfDir).select(col("vec_id"), col("v")))
    val fx = ops.Subplan.once(ext.Similarity.knnFx(all))
    val nbr = ops.Subplan.once(ext.Similarity.knnTopK(
      ext.Similarity.knnScore(ext.Similarity.knnInit(all), fx),
      ext.Similarity.KnnK))
    println("==== knn_round (full build: s29 loop body) ====")
    ext.Similarity.knnRound(nbr, fx, ext.Similarity.KnnK)
      .explain("formatted")

    // ---- CC contraction round (the d07/d08 loop body) ----
    val pairs = ext.Dedup.jaccardPairsPrefix(
      ext.Dedup.shingles(spark, sfDir), 0.5)
      .select(col("doc_a"), col("doc_b"))
    val e = ops.Subplan.once(
      ext.Dedup.ccCanon(pairs.select(col("doc_a").as("u"),
        col("doc_b").as("v"))))
    println("==== cc_round (d07/d08 loop body: large-star + small-star) ====")
    ext.Dedup.ccRound(e).explain("formatted")

    spark.stop()
  }
}
