package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Similarity}
import graft.functions.{CosineSimilarity, GraftExtensions}

class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fused cosine_sim is bit-identical to the composed fold form") {
    import spark.implicits._
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val both = pairs.select(
      CosineSimilarity.cosineSim(col("va"), col("vb")).as("fused"),
      Similarity.cosineFold(col("va"), col("vb")).as("folded"))
    val diff = both.filter(col("fused") =!= col("folded")).count()
    assert(diff == 0, s"$diff rows differ between fused and fold cosine")
  }

  test("cosine_sim registers into SQL via extensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val orth = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").head()
    assert(math.abs(orth.getDouble(0)) < 1e-12)
  }

  test("cosine_sim null propagation") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(cast(null as array<double>), array(1.0d)) AS c").head()
    assert(r.isNullAt(0))
  }

  test("top_k registers into SQL and matches the Scala-side aggregate") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT top_k(named_struct('v', x, 'id', id), 3) AS top
        |FROM VALUES (1.0d, 1L), (5.0d, 2L), (3.0d, 3L), (4.0d, 4L), (2.0d, 5L)
        |  AS t(x, id)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(_.getDouble(0)) == Seq(5.0, 4.0, 3.0),
      "descending top-3 by struct order")
    assert(rows.map(_.getLong(1)) == Seq(2L, 4L, 3L))
    // non-literal k is a plan-time error, not a wrong answer
    val err = intercept[Exception](spark.sql(
      "SELECT top_k(named_struct('v', x), cast(x as int)) FROM VALUES (1.0d) t(x)")
      .collect())
    assert(err.getMessage.contains("literal integer k"))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted sets") {
    import spark.implicits._
    // random long sets with overlap, pre-sorted — the expression's
    // contract; parity against the built-in on every pair, plus a
    // codegen-stage check (same discipline as cosine_sim).
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      (i.toLong, rnd.shuffle((0L until 80L).toList).take(30 + rnd.nextInt(30))
        .distinct.sorted)
    }
    val df = rows.toDF("id", "xs")
    val pairs = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .select(col("a.xs").as("xa"), col("b.xs").as("xb"))
    val both = pairs.select(
      graft.functions.SortedIntersectCount
        .sortedIntersectCount(col("xa"), col("xb")).as("merged"),
      size(array_intersect(col("xa"), col("xb"))).as("builtin"))
    val rowsOut = both.collect()
    assert(rowsOut.nonEmpty && rowsOut.forall(r => r.getInt(0) == r.getInt(1)),
      "merge count must equal the built-in intersection size on every pair")
    // executing `both` finalizes AQE, making codegen `*(n)` markers visible
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("sortedintersectcount") && l.contains("*(")),
      s"expected the merge count inside a codegen stage:\n$plan")
    // null propagation
    val n = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]))
      .toDF("xa", "xb")
      .select(graft.functions.SortedIntersectCount
        .sortedIntersectCount(col("xa"), col("xb")).as("c")).head()
    assert(n.isNullAt(0))
  }

  test("sorted_intersect_count registers into SQL via extensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c")
      .head()
    assert(r.getInt(0) == 2)
  }

  test("kmv_mins dedups inside the buffer: matches t09's distinct+top_k path") {
    // KMV proper (k smallest DISTINCT hashes) over the RAW token
    // stream must equal the batch formulation that pre-distincts and
    // heaps — the property that lets the streaming sketch skip the
    // unbounded distinct.
    val hashed = Tables(spark, sf, "documents")
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("source"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
    val viaKmv = hashed.groupBy(col("source"))
      .agg(graft.functions.KmvAgg.kmvMins(col("h"), 64).as("mins"))
      .select(col("source"), col("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaDistinct = hashed.distinct().groupBy(col("source"))
      .agg(graft.functions.TopKAgg.topK(
        struct((-col("h")).as("nh"), col("h")), 64).as("tops"))
      .select(col("source"), col("tops"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getAs[Long]("h"))).toMap
    assert(viaKmv.nonEmpty && viaKmv == viaDistinct,
      "kmv buffer dedup must reproduce the distinct+heap sketch exactly")
  }

  test("top_k_distinct over a multiset equals top_k over its distinct form") {
    // The identity that lets the k-NN descent rounds drop the
    // whole-frame `.distinct()` exchange before knnTopK: a duplicate
    // struct (same (v, w) ⇒ same exact-long d ⇒ identical struct)
    // must occupy ONE slot. Build a frame with heavy, slot-critical
    // duplication: every row twice, plus the per-key top row a third
    // time (a duplicate that would win a slot if double-counted).
    val base = Tables(spark, sf, "embeddings")
      .select((col("vec_id") % 7).as("v"), col("vec_id").as("w"),
        (col("vec_id") * 37 % 101).as("d"))
    val tops = base.groupBy(col("v")).agg(min(col("d")).as("d"))
      .join(base, Seq("v", "d"))
    val multiset = base.unionAll(base).unionAll(tops)
    def lists(df: org.apache.spark.sql.DataFrame, distinctAgg: Boolean) = {
      val agg =
        if (distinctAgg) graft.functions.TopKAgg.topKDistinct(
          struct((-col("d")).as("nd"), (-col("w")).as("nw"),
            col("w"), col("d")), 4)
        else graft.functions.TopKAgg.topK(
          struct((-col("d")).as("nd"), (-col("w")).as("nw"),
            col("w"), col("d")), 4)
      df.groupBy(col("v")).agg(agg.as("top"))
        .select(col("v"), posexplode(col("top")))
        .select(col("v"), col("pos"), col("col.w").as("w"), col("col.d").as("d"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSet
    }
    val viaDistinctAgg = lists(multiset, distinctAgg = true)
    val viaDedupThenTopK = lists(multiset.distinct(), distinctAgg = false)
    assert(viaDistinctAgg.nonEmpty && viaDistinctAgg == viaDedupThenTopK,
      "top_k_distinct must reproduce distinct-then-top_k exactly")
    // And the multiset path WITHOUT set semantics must differ (the
    // duplicate really is slot-critical), so the pin cannot pass
    // vacuously on a duplicate-free frame.
    assert(lists(multiset, distinctAgg = false) != viaDedupThenTopK,
      "fixture carries no slot-critical duplicate - the pin is vacuous")
  }

  test("minhash_all equals the 32 array_min(transform) folds, " +
      "empty set included") {
    // d03/d11/d19 + the streaming filter ride the ONE native pass;
    // minhashExpr stays the pinned reference form. The empty-set row
    // must be NULL exactly as each array_min is (concat_ws downstream
    // treats the two identically).
    val sets = Dedup.minhashSets(spark, sf)
      .unionByName(spark.range(1).select(lit(-1L).as("doc_id"),
        array().cast("array<bigint>").as("xs"), lit(0).as("n")))
    val native = sets.select(col("doc_id"),
      Dedup.minhashAllCol(col("xs")).as("mha"))
    val folded = sets.select(col("doc_id"),
      when(size(col("xs")) > 0,
        array((0 until 32).map(i => Dedup.minhashExpr(col("xs"), i)): _*))
        .as("mha"))
    val joined = native.as("a").join(folded.as("b"), "doc_id")
    assert(joined.count() > 1 &&
      joined.filter(not(col("a.mha") <=> col("b.mha"))).count() == 0,
      "minhash_all drifted from the array_min(transform) family")
    assert(native.filter(col("doc_id") === -1L && col("mha").isNull)
      .count() == 1, "empty shingle set must yield NULL")
  }

  test("vec_sum equals the per-coordinate sum(element_at) columns") {
    // The Lloyd update's arithmetic pin: ONE vec_sum buffer must
    // reproduce the 64 separate column sums exactly (exact long
    // addition — no order sensitivity, so plain equality).
    val e = Tables(spark, sf, "embeddings")
      .select((col("vec_id") % 5).as("cid"),
        Similarity.fixedPoint(col("embedding").cast("array<double>")).as("x"))
    val viaCols = e.groupBy(col("cid"))
      .agg((1 to 64).map(i => sum(element_at(col("x"), i)).as(s"s$i")).head,
        (1 to 64).map(i => sum(element_at(col("x"), i)).as(s"s$i")).tail: _*)
      .select(col("cid"), array((1 to 64).map(i => col(s"s$i")): _*).as("sx"))
    val viaVec = e.groupBy(col("cid"))
      .agg(graft.functions.VecSumAgg.vecSum(col("x"), 64).as("sx"))
    val joined = viaCols.as("a").join(viaVec.as("b"), "cid")
      .filter(col("a.sx") =!= col("b.sx"))
    assert(viaVec.count() == 5 && joined.count() == 0,
      "vec_sum drifted from the column-sum form")
  }

  test("rp_project yields NULL on input narrower than 64 dims " +
      "(composed element_at semantics) and minhash_all skips null " +
      "elements (array_min semantics)") {
    // ADVICE r17 guards. Short input: the composed form's
    // element_at(v, i) past the array end made every sum NULL — the
    // native loop must never emit a silently-partial sum.
    val short = spark.range(1).select(
      expr("array(1.0d, 2.0d)").as("v"))
    val projected = short.select(
      graft.functions.RpProject.rpProject(col("v")).as("p"))
    assert(projected.filter(col("p").isNull).count() == 1 &&
      projected.filter(col("p").isNotNull).count() == 0,
      "rp_project must be NULL on short input, not a partial sum")
    // Null elements must be SKIPPED exactly as each composed
    // array_min(transform) skips them — never read as an undefined
    // long that could wrongly lower a minimum; an all-null input has
    // no minima at all (NULL, the empty-set rule).
    val mixed = spark.range(1).select(
      expr("array(7L, cast(null as bigint))").as("xs"))
      .select(Dedup.minhashAllCol(col("xs")).as("mha"))
    val clean = spark.range(1).select(expr("array(7L)").as("xs"))
      .select(Dedup.minhashAllCol(col("xs")).as("mha"))
    assert(mixed.collect().head.getSeq[Long](0) ==
      clean.collect().head.getSeq[Long](0),
      "a null element must not perturb any minimum")
    val allNull = spark.range(1).select(
      expr("array(cast(null as bigint))").as("xs"))
      .select(Dedup.minhashAllCol(col("xs")).as("mha"))
    assert(allNull.filter(col("mha").isNull).count() == 1,
      "an all-null input has no minima (NULL, the empty-set rule)")
  }

  test("rp_project is bit-identical to the composed 1,024-term form") {
    // The s04 projection as it was stated through round 16: 16 columns
    // of reduce(_ + _) over element_at(v, i) * sign(i, j). The native
    // expression must reproduce every IEEE rounding step (accumulator
    // starts from the FIRST term, ascending i), so the comparison is
    // exact ===, not a tolerance.
    val signs = graft.functions.RpProject.signs
    val composed = (0 until 16).map { j =>
      (1 to 64).map(i => element_at(col("v"), i) * lit(signs(j)(i - 1)))
        .reduce(_ + _) / lit(4.0)
    }
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(col("vec_id"),
        graft.functions.RpProject.rpProject(col("v")).as("native"),
        array(composed: _*).as("folded"))
      .select(col("vec_id"), posexplode(arrays_zip(col("native"), col("folded"))))
    assert(both.count() > 0 &&
      both.filter(col("col.native") =!= col("col.folded")).count() == 0,
      "rp_project drifted from the composed reduce form")
  }

  test("sq_dist_long and nearest_id match their composable fold forms " +
      "and break ties to the lowest cid") {
    GraftExtensions.register(spark)
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), Similarity.fixedPoint(col("v")).as("x"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.x").as("xa"), col("b.x").as("xb"))
    val d = pairs.select(
      graft.functions.SqDistLong.sqDist(col("xa"), col("xb")).as("native"),
      aggregate(zip_with(col("xa"), col("xb"), (p, q) => (p - q) * (p - q)),
        lit(0L), (acc, z) => acc + z).as("folded"))
    assert(d.filter(col("native") =!= col("folded")).count() == 0,
      "sq_dist_long drifted from the fold form")
    // nearest_id ≡ the aggregate/least argmin fold over a real codebook
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("x").as("m"))
      .agg(array_sort(collect_list(struct(col("cid"), col("m")))).as("cents"))
      .withColumn("one", ops.ConstKey.one(size(col("cents"))))
    val both = e.withColumn("one", ops.ConstKey.one(col("vec_id")))
      .join(broadcast(cents), "one")
      .select(
        graft.functions.NearestId.nearest(col("x"), col("cents")).as("native"),
        aggregate(col("cents"),
          struct(lit(Long.MaxValue).as("d"), lit(-1).as("cid")),
          (acc, c) => least(acc, struct(
            aggregate(zip_with(col("x"), c.getField("m"),
              (p, q) => (p - q) * (p - q)), lit(0L), (a2, z) => a2 + z).as("d"),
            c.getField("cid").as("cid")))).getField("cid").as("folded"))
    assert(both.filter(col("native") =!= col("folded")).count() == 0,
      "nearest_id drifted from the argmin fold")
    // equidistant centroids: the LOWEST cid must win, regardless of order
    val tie = spark.sql(
      """SELECT nearest_id(array(0L, 0L),
        |  array(named_struct('cid', 7, 'm', array(1L, 0L)),
        |        named_struct('cid', 3, 'm', array(1L, 0L)))) AS c""".stripMargin)
      .head()
    assert(tie.getInt(0) == 3, "tie must resolve to the lowest cid")
    // pq_adc: codes index the per-subspace tables (0-based)
    val adc = spark.sql(
      """SELECT pq_adc(array(1, 0),
        |  array(array(10L, 20L), array(30L, 40L))) AS a""".stripMargin).head()
    assert(adc.getLong(0) == 20L + 30L, "pq_adc must sum qt[s][codes[s]]")
  }

  test("qlog2 codegen matches the JVM reference recurrence on a sweep, " +
      "is exact at powers of two, bounds error vs float log2, and " +
      "nulls out non-positive input") {
    import graft.functions.QLog2
    GraftExtensions.register(spark)
    val xs = (1L to 4096L) ++
      Seq(1L << 20, (1L << 20) - 1, (1L << 20) + 1, 999983L, 12345678L,
        1000000007L, (1L << 42) - 1, 1L << 42, (1L << 42) + 1, 1L << 62)
    val rows = spark.range(1).select(
        explode(lit(xs.toArray)).as("x"))
      .select(col("x"), QLog2.qlog2(col("x")).as("ql"))
      .collect()
    // codegen path ≡ QLog2.ref (the eval/spec/oracle one-definition)
    rows.foreach { r =>
      assert(r.getLong(1) == QLog2.ref(r.getLong(0)),
        s"codegen drifted from ref at x=${r.getLong(0)}")
    }
    // exact at powers of two: qlog2(2^k) = k·2^Q, and monotone
    (0 to 62).foreach { k =>
      assert(QLog2.ref(1L << k) == k.toLong << QLog2.FracBits,
        s"qlog2(2^$k) must be exactly k shifted by Q, k=$k")
    }
    val sorted = rows.sortBy(_.getLong(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1),
        s"qlog2 not monotone between ${a.getLong(0)} and ${b.getLong(0)}")
    }
    // |qlog2(x) − 2^Q·log2(x)| ≤ 2 units of 2^-Q across the sweep
    rows.foreach { r =>
      val ideal = math.log(r.getLong(0).toDouble) / math.log(2.0) *
        (1L << QLog2.FracBits)
      assert(math.abs(r.getLong(1) - ideal) <= 2.0,
        s"qlog2(${r.getLong(0)}) = ${r.getLong(1)} vs ideal $ideal")
    }
    // SQL registration + null for x ≤ 0
    val nulls = spark.sql(
      "SELECT qlog2(0L) AS a, qlog2(-5L) AS b, qlog2(1L) AS c").head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.getLong(2) == 0L)
  }

  test("cosine_sim survives whole-stage codegen on a real plan") {
    val df = Tables(spark, sf, "embeddings")
      .select(CosineSimilarity.cosineSim(col("embedding"), col("embedding")).as("self"))
    // self-similarity is exactly 1.0 up to fp rounding
    val bad = df.filter(abs(col("self") - 1.0) > 1e-9).count()
    assert(bad == 0)
    // `*(n)` prefixes mark WholeStageCodegen stages in the plan string;
    // the Project carrying cosinesimilarity must be inside one.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("cosinesimilarity") && l.trim.startsWith("*(")),
      s"expected the cosine Project inside a codegen stage:\n$plan")
  }
}
