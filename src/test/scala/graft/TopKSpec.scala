package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg

class TopKSpec extends AnyFunSuite {
  import SparkTestSession._

  test("top_k aggregate equals the window formulation (incl. heap merges)") {
    val li = Tables(spark, sf, "lineitem")
      .repartition(16) // force cross-partition partial merges
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"))
    val viaAgg = li.groupBy(col("l_suppkey"))
      .agg(TopKAgg.topK(struct(col("l_extendedprice"),
        (-col("l_orderkey")).as("neg"), col("l_orderkey")), 3).as("top"))
      .select(col("l_suppkey"), posexplode(col("top")))
      .select(col("l_suppkey"), col("col.l_extendedprice").as("price"),
        col("col.l_orderkey").as("okey"), (col("pos") + 1).as("rk"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc)
    val viaWindow = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("l_suppkey"), col("l_extendedprice").as("price"),
        col("l_orderkey").as("okey"), col("rk").cast("long").as("rk"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty,
      "top_k aggregate must reproduce the window result exactly")
  }

  test("top_k with k larger than group size returns the whole group") {
    import spark.implicits._
    val df = Seq((1, 10.0), (1, 5.0), (2, 7.0)).toDF("g", "v")
    val out = df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct(col("v")), 10).as("top"))
      .select(col("g"), size(col("top")).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(out == Map(1 -> 2, 2 -> 1))
  }

  test("top_k partial aggregation shows in the plan (objectHashAgg partial)") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    val p = li.groupBy(col("l_suppkey"))
      .agg(TopKAgg.topK(struct(col("l_quantity")), 2).as("t"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_top_k"), s"expected partial top_k:\n$p")
  }
}
