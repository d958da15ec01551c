package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructType}

/** Exact int64 squared L2 distance over two array<long> lattice
  * columns — the inner loop of the exact-integer k-means family
  * (s13/s14). A native expression: one fused primitive loop, no
  * intermediate array, bit-identical to the composable
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0L, _+_)` form
  * (long addition is associative and exact — no order sensitivity to
  * preserve, unlike the double folds). Codegen when in a plain
  * projection; inside a higher-order-function lambda the interpreted
  * `eval` still beats the HOF fold by skipping the per-element boxing
  * and the zip_with array allocation.
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"sq_dist_long expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) {
      val t = x.getLong(i) - y.getLong(i)
      d += t * t
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $t = $a.getLong($i) - $b.getLong($i);
         |  $d += $t * $t;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  import org.apache.spark.sql.GraftColumnBridge._

  def sqDist(a: Column, b: Column): Column =
    toColumn(SqDistLong(toExpression(a), toExpression(b)))
}

/** The whole k-means assignment step as ONE native expression:
  * `nearest_id(x, cents)` returns the `cid` of the centroid in
  * `cents: array<struct<cid int, m array<long>>>` nearest to
  * `x: array<long>` under exact int64 squared L2, ties to the lowest
  * cid — exactly the semantics of the composable
  * `aggregate(cents, (Long.Max, -1), least(acc, (dist, cid)))` fold.
  *
  * Why native: the fold form evaluates one interpreted lambda (with a
  * nested zip_with allocation) PER CENTROID PER ROW — at K=16 over a
  * subspaced corpus that interpreted overhead dominated the s14 sf1
  * soak. This expression is a flat primitive double loop per row;
  * whole-stage codegen'd in a plain projection, and a single
  * allocation-free `eval` per (row, subspace) when nested inside a
  * higher-order lambda.
  */
case class NearestId(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(s: StructType, _))
          if s.length == 2 && s(0).dataType == IntegerType &&
            s(1).dataType.isInstanceOf[ArrayType] &&
            s(1).dataType.asInstanceOf[ArrayType].elementType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"nearest_id expects (array<bigint>, array<struct<int, array<bigint>>>)," +
            s" got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    var bestD = Long.MaxValue
    var bestId = -1
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      val cid = row.getInt(0)
      val m = row.getArray(1)
      val n = math.min(x.numElements(), m.numElements())
      var d = 0L
      var i = 0
      while (i < n) {
        val t = x.getLong(i) - m.getLong(i)
        d += t * t
        i += 1
      }
      if (d < bestD || (d == bestD && cid < bestId)) {
        bestD = d
        bestId = cid
      }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val row = ctx.freshName("row")
      val cid = ctx.freshName("cid")
      val m = ctx.freshName("m")
      val bestD = ctx.freshName("bestD")
      val bestId = ctx.freshName("bestId")
      s"""
         |int $k = $b.numElements();
         |long $bestD = Long.MAX_VALUE;
         |int $bestId = -1;
         |for (int $c = 0; $c < $k; $c++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $b.getStruct($c, 2);
         |  int $cid = $row.getInt(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $m = $row.getArray(1);
         |  int $n = java.lang.Math.min($a.numElements(), $m.numElements());
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $t = $a.getLong($i) - $m.getLong($i);
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD || ($d == $bestD && $cid < $bestId)) {
         |    $bestD = $d;
         |    $bestId = $cid;
         |  }
         |}
         |if ($k == 0) { ${ev.isNull} = true; } else { ${ev.value} = $bestId; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestId {
  import org.apache.spark.sql.GraftColumnBridge._

  def nearest(x: Column, cents: Column): Column =
    toColumn(NearestId(toExpression(x), toExpression(cents)))
}

/** The ADC lookup sum as one native expression:
  * `pq_adc(codes, qt) = Σ_s qt[s][codes[s]]` over
  * `codes: array<int>` and `qt: array<array<long>>` — the scoring
  * inner loop of the PQ family (s14/s16), exactly the composable
  * `aggregate(zip_with(codes, qt, (c, d) => d[c + 1]), 0L, _+_)`
  * (codes are 0-based, SQL element_at 1-based). Exact int64; a
  * missing code (index out of range) contributes 0 — the composable
  * form's element_at would return null and poison the sum, so
  * callers guarantee code ∈ [0, k); the PQ encoder does by
  * construction. */
case class PqAdcLookup(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects (array<int>, array<array<bigint>>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val qt = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), qt.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val c = codes.getInt(i)
      val row = qt.getArray(i)
      if (c >= 0 && c < row.numElements()) s += row.getLong(c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $c = $a.getInt($i);
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($i);
         |  if ($c >= 0 && $c < $row.numElements()) $s += $row.getLong($c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcLookup {
  import org.apache.spark.sql.GraftColumnBridge._

  def pqAdc(codes: Column, qt: Column): Column =
    toColumn(PqAdcLookup(toExpression(codes), toExpression(qt)))
}
