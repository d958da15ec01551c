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

  test("int8 quantization round-trips within scale/2 and preserves NN ranking") {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val deq = Similarity.dequantize(Similarity.quantize(e, "v"), "v")
    val err = e.as("a").join(deq.as("b"), Seq("vec_id"))
      .select(aggregate(zip_with(col("a.v"), col("b.v"),
        (x, y) => abs(x - y)), lit(0.0),
        (acc, x) => greatest(acc, x)).as("maxerr"))
      .agg(max("maxerr")).head().getDouble(0)
    // range ~[-0.3, 0.3] → scale ~0.6/255 → error bound ~0.0012
    assert(err < 0.01, s"quantization error too large: $err")
    // top-1 neighbor of vec 0 unchanged under quantization
    def nn1(df: org.apache.spark.sql.DataFrame): Long = {
      val q = df.filter(col("vec_id") === 0).select(col("v").as("qv"))
      df.filter(col("vec_id") =!= 0).crossJoin(q)
        .select(col("vec_id"),
          graft.functions.CosineSimilarity.cosineSim(col("qv"), col("v")).as("c"))
        .orderBy(col("c").desc, col("vec_id").asc).head().getLong(0)
    }
    assert(nn1(e) == nn1(deq), "top-1 neighbor should survive int8 quantization")
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
