package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The §2.8(a) relational core: the reference's operator surface
  * (SURVEY.md §2.1-2.6 — projections P1-P3, filters P6-P8, joins J1-J4,
  * aggregations A1-A3, plus the engine-declared sorts/limits/set-ops of
  * §2.5) generalized onto the driver's TPC-H-ish tables.
  *
  * Determinism discipline for the DuckDB hash-match oracle:
  *  - Double aggregation is order-sensitive, so every SUM/AVG over doubles
  *    is computed in exact decimal arithmetic (cast to DECIMAL(18,2) per
  *    row — both engines round half-up to the same nearest 2-dp value —
  *    then summed exactly) and only cast back to double at the end.
  *  - Every computed column is aliased identically here and in the SQL.
  *  - Array-valued results are explicitly sorted inside the array.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact decimal sum of a double column, returned as double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** A3 grouped gather in its first-class array-returning form: per-nation
    * sorted supplier-name list (ccdc/timeseries.py:120-123's chip→array
    * transpose shape). q09 wraps this with `concat_ws` because the driver
    * harness can't hash array cells; library callers get the real array.
    */
  def groupedGather(supplier: DataFrame, nation: DataFrame): DataFrame =
    supplier.join(broadcast(nation),
        supplier("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sort_array(collect_list(col("s_name"))).as("suppliers"),
        count(lit(1)).as("n_sup"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A3 + P1: scan → filter (pushed to parquet) → hash aggregate.
    // Reference analogue: per-key aggregation assembling products
    // (ccdc/timeseries.py:104-115); pricing-summary shape exercises
    // partial (map-side) aggregation, the 100 TB-safe default.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // P6/P7/P8: predicate surface — IN / NOT IN / BETWEEN / IS NOT NULL /
    // range conjunction (reference: ccdc/randomforest.py:64,69).
    "q02_filter_predicates" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(1000.0, 200000.0) &&
          !col("o_orderpriority").isin("1-URGENT") &&
          col("o_orderdate").isNotNull)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    }),

    // J1-generalized: multi-way inner equi-join, small dims broadcast
    // (reference's ids⋈table scan restriction, ccdc/chip.py:49-51).
    "q03_join_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
    }),

    // Left-semi join: the reference's keyed-read scan restriction is
    // semantically a semi-join (SURVEY.md S7).
    "q04_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // Left-anti join: customers with no large order.
    "q05_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 280000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // §2.5 engine-declared: top-k = orderBy + limit (TakeOrderedAndProject
    // physically — no global sort at scale). Deterministic tie-break on key.
    "q06_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // A1: DISTINCT projection (reference: ccdc/randomforest.py:67).
    "q07_distinct" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey"), col("c_mktsegment")).distinct()
    }),

    // §2.5 set ops: UNION ALL / INTERSECT / EXCEPT.
    "q08_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val buyers = o.select(col("o_custkey").as("k")).distinct()
      val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
      val poor = c.filter(col("c_acctbal") < 0).select(col("c_custkey").as("k"))
      buyers.intersect(rich).unionAll(buyers.intersect(poor))
        .except(c.filter(col("c_nationkey") === 0).select(col("c_custkey").as("k")))
    }),

    // A3: grouped gather — per-key sorted list assembly, the Spark-native
    // form of merlin's chip→pixel-array transpose (ccdc/timeseries.py:120-123).
    // The list is emitted '|'-joined: the driver harness row-sorts results in
    // pandas, which cannot hash array cells. The array-returning form stays
    // first-class as Relational.groupedGather.
    "q09_collect_list" -> ((s, dir) => {
      groupedGather(t(s, dir, "supplier"), t(s, dir, "nation"))
        .select(col("n_name"),
          concat_ws("|", col("suppliers")).as("suppliers"),
          col("n_sup"))
    }),

    // §2.5 engine-declared: window function — first 3 orders per customer.
    "q10_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // F2-adjacent scalar surface: date parts + string concat/substring
    // (the reference keeps dates ordinal/ISO — ccdc/pyccd.py:113-115).
    "q11_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
          length(col("o_orderpriority")).as("prio_len"))
        .filter(col("o_year") === 1995)
    }),

    // CASE WHEN + derived-column surface (P4 generalization).
    "q12_case_when" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, lit("debt"))
            .when(col("c_acctbal") < 5000, lit("low"))
            .otherwise(lit("high")).as("bal_band"),
          coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
    }),

    // J3-generalized: fact-fact join on composite condition + grouped agg;
    // sort-merge at scale (pixel-level aux⋈ccd join, ccdc/features.py:15-17).
    "q13_join_groupby" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(
          dsum(col("l_extendedprice")).as("sum_price"),
          countDistinct(col("o_custkey")).as("n_cust"))
    }),

    // Full-outer join: customers vs their large-order aggregates, both
    // unmatched sides surviving with nulls.
    "q15_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_nationkey") < 5)
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_big"), dsum(col("o_totalprice")).as("big_total"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("n_big"), col("big_total"))
    }),

    // Array-column scalar surface (P4 generalized): subscript, size,
    // slice over a real array column.
    "q16_array_funcs" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .filter(col("label").isin(1, 2, 3))
        .select(
          col("vec_id"),
          col("label"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_val"),
          element_at(col("embedding"), -1).cast("double").as("last_val"))
    }),

    // HAVING: post-aggregation filter.
    "q17_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .filter(col("n") >= 8)
    }),

    // TPC-H Q3-shaped headline: 3-way join + grouped revenue + top-k.
    // Dims filter before the join; the orders⋈lineitem join is the
    // only wide shuffle; top-k is TakeOrderedAndProject (no global sort).
    "q18_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // ROLLUP subtotals (grouping-set surface; beyond the reference's
    // own operators, declared for the engine).
    "q19_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),

    // Exact median via interpolated percentile — identical linear
    // interpolation definition in both engines, over raw (not
    // accumulated) doubles, so results hash-match.
    "q20_median" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
          expr("percentile(l_extendedprice, 0.75)").as("p75_price"))
    }),

    // String-function battery: case mapping, trim/pad, replace,
    // reverse, locate, repeat + null-handling scalars.
    "q21_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
          regexp_replace(col("p_name"), "a", "@").as("name_sub"),
          reverse(col("p_brand")).as("brand_rev"),
          instr(col("p_type"), "BRUSHED").as("pos_brushed"),
          repeat(col("p_brand"), 2).as("brand_x2"),
          greatest(col("p_size"), lit(25)).as("size_hi"),
          least(col("p_size"), lit(25)).as("size_lo"),
          nullif(col("p_size"), lit(25)).as("size_nn"))
    }),

    // Correlated scalar subquery through the spark.sql entry — Catalyst
    // decorrelates it into an aggregate+join; predicate arithmetic is
    // exact (decimal sum, deterministic double compare) for parity.
    "q22_correlated" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
          |WHERE o_totalprice * (
          |    SELECT COUNT(*) FROM orders_v o2
          |    WHERE o2.o_custkey = o.o_custkey)
          |  > 1.5 * (
          |    SELECT CAST(SUM(CAST(o3.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)""".stripMargin)
    }),

    // EXISTS / NOT EXISTS correlated subqueries through the SQL
    // planner — the subquery-decorrelation path (rewritten by Catalyst
    // into semi/anti joins), distinct from q04/q05's explicit
    // DataFrame "left_semi"/"left_anti" joins.
    "q26_exists" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v2")
      s.sql(
        """SELECT c_custkey, c_nationkey FROM customer_v c
          |WHERE EXISTS (
          |    SELECT 1 FROM orders_v2 o
          |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM orders_v2 o2
          |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
          |      AND o2.o_totalprice < 2000)""".stripMargin)
    }),

    // Multi-key grouped aggregation with exact decimal AVG
    // (avg = exact decimal sum / count, both engines IEEE-identical).
    "q14_avg_by_key" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_linenumber"))
        .agg(
          (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n"))
    }),

    // Full grouping-sets lattice (CUBE) with the grouping_id bitmask
    // distinguishing subtotal levels from real NULL group values —
    // q19's rollup sibling, one pass, partial-agg per grouping set.
    "q23_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().cast("int").as("gid"))
    }),

    // Cumulative window aggregation: running per-customer spend in
    // order-date order. The ROWS UNBOUNDED PRECEDING frame over exact
    // decimals is deterministic because (o_orderdate, o_orderkey) is a
    // total order; one hash shuffle on the partition key.
    // lag/lead window functions (§2.5): per customer, days since the
    // previous order and the next order's key, both over ONE window
    // spec (one hash exchange on customer, in-partition sort) with a
    // total order (date, then key) so offsets are deterministic.
    "q27_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("gap_days",
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("gap_days"),
          col("next_key"))
    }),

    "q25_running_total" -> ((s, dir) => {
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          sum(dec(col("o_totalprice")))
            .over(byCust.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running_spend"),
          row_number().over(byCust).as("nth_order"))
    }),

    // Pivot (cross-tabulation): per return-flag row, one exact-decimal
    // quantity column per line status. Spark's pivot with declared
    // values is a single partial-aggregable pass (no per-value scans);
    // the oracle states the equivalent conditional aggregation.
    "q24_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND o_totalprice BETWEEN 1000.0 AND 200000.0
        |  AND o_orderpriority NOT IN ('1-URGENT')
        |  AND o_orderdate IS NOT NULL""".stripMargin,
    "q03_join_agg" ->
      """SELECT r_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate >= TIMESTAMP '1995-01-01')""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 280000.0)""".stripMargin,
    "q06_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q07_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "q08_set_ops" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |  rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
        |  poor AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0)
        |SELECT k FROM (
        |  (SELECT k FROM buyers INTERSECT SELECT k FROM rich)
        |  UNION ALL
        |  (SELECT k FROM buyers INTERSECT SELECT k FROM poor))
        |EXCEPT SELECT c_custkey AS k FROM customer WHERE c_nationkey = 0""".stripMargin,
    "q09_collect_list" ->
      """SELECT n_name, string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
        |  COUNT(*) AS n_sup
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q11_scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  substring(o_orderpriority, 1, 1) AS prio_code,
        |  concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
        |  CAST(length(o_orderpriority) AS INTEGER) AS prio_len
        |FROM orders WHERE year(o_orderdate) = 1995""".stripMargin,
    "q12_case_when" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS bal_band,
        |  COALESCE(c_mktsegment, 'UNKNOWN') AS segment
        |FROM customer""".stripMargin,
    "q13_join_groupby" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(DISTINCT o_custkey) AS n_cust
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY l_returnflag""".stripMargin,
    "q15_outer_join" ->
      """WITH big AS (
        |  SELECT o_custkey, COUNT(*) AS n_big,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_total
        |  FROM orders WHERE o_totalprice > 250000.0 GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name, n_big, big_total
        |FROM (SELECT * FROM customer WHERE c_nationkey < 5) c
        |FULL OUTER JOIN big ON c_custkey = o_custkey""".stripMargin,
    "q16_array_funcs" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  CAST(embedding[-1] AS DOUBLE) AS last_val
        |FROM embeddings WHERE label IN (1, 2, 3)""".stripMargin,
    "q17_having" ->
      """SELECT l_partkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 8""".stripMargin,
    "q18_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q19_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q20_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |  quantile_cont(l_extendedprice, 0.75) AS p75_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q21_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  lower(p_type) AS type_l,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
        |  regexp_replace(p_name, 'a', '@', 'g') AS name_sub,
        |  reverse(p_brand) AS brand_rev,
        |  CAST(instr(p_type, 'BRUSHED') AS INTEGER) AS pos_brushed,
        |  repeat(p_brand, 2) AS brand_x2,
        |  CAST(greatest(p_size, 25) AS INTEGER) AS size_hi,
        |  CAST(least(p_size, 25) AS INTEGER) AS size_lo,
        |  CAST(nullif(p_size, 25) AS INTEGER) AS size_nn
        |FROM part""".stripMargin,
    "q22_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice * (
        |    SELECT COUNT(*) FROM orders o2
        |    WHERE o2.o_custkey = o.o_custkey)
        |  > 1.5 * (
        |    SELECT CAST(SUM(CAST(o3.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    FROM orders o3 WHERE o3.o_custkey = o.o_custkey)""".stripMargin,
    "q14_avg_by_key" ->
      """SELECT l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_linenumber""".stripMargin,
    "q23_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n,
        |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INTEGER) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q26_exists" ->
      """SELECT c_custkey, c_nationkey FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o2
        |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
        |      AND o2.o_totalprice < 2000)""".stripMargin,
    "q27_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day',
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC),
        |    o_orderdate) AS INTEGER) AS gap_days,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_key
        |FROM orders""".stripMargin,
    "q25_running_total" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |    AS INTEGER) AS nth_order
        |FROM orders""".stripMargin,
    "q24_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
