package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity
import graft.sources.Sink

class BucketSpec extends AnyFunSuite {
  import SparkTestSession._

  test("co-bucketed tables join without any exchange") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Sink.writeBucketed(li, "li_b", 8, Seq("l_orderkey"))
    Sink.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_b", 8, Seq("l_orderkey"))
    val joined = spark.table("li_b").join(spark.table("o_b"), Seq("l_orderkey"))
    // Force the join wide enough that broadcast doesn't kick in.
    val noBroadcast = joined.hint("merge")
    val plan = noBroadcast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-bucketed join must not shuffle:\n$plan")
    assert(noBroadcast.count() ==
      li.join(o, li("l_orderkey") === o("o_orderkey")).count())
  }

  test("BRP-LSH ANN returns plausible neighbors vs brute force") {
    val brute = SparkEntry.queries("s01_ann_bruteforce")(spark, sf)
      .filter(col("qid") === 0).collect().map(_.getAs[Long]("nn_id")).toSet
    val lsh = Similarity.annLsh(spark, sf, queryVecId = 0L, k = 5,
        bucketLength = 5.0, numTables = 8)
      .collect().map(_.getAs[Long]("nn_id")).toSet
    assert(lsh.size == 5)
    // On unit-ish random embeddings euclidean and cosine rank nearly
    // identically; require overlap rather than equality (LSH is approx).
    assert(brute.intersect(lsh).nonEmpty,
      s"no overlap between LSH $lsh and brute-force $brute")
  }
}
