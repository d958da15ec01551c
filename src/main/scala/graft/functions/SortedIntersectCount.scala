package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Merge-based intersection COUNT of two ascending-sorted
  * array<bigint> columns — a native Catalyst expression with
  * whole-stage codegen.
  *
  * The near-dup verify stages (d02/d03 and the Jaccard of any pair
  * pipeline) only need |A ∩ B|; `size(array_intersect(a, b))` builds a
  * hash set AND materializes the intersection array per pair — at sf1
  * the d02 verify evaluates ~16M candidate pairs, so those per-row
  * allocations are the hot path. With both arrays pre-sorted ONCE per
  * document (row-local `sort_array`, ~n log n on ~50 elements, done
  * 50k times instead of any per-pair work), the count is a single
  * allocation-free two-cursor merge scan: O(|A|+|B|) comparisons per
  * pair, zero garbage.
  *
  * Duplicate semantics: inputs are sets (distinct by construction —
  * `array_distinct`/`collect_set` upstream), so each match advances
  * both cursors and the count is exact set-intersection cardinality.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  import org.apache.spark.sql.GraftColumnBridge._

  /** Column-API entry. Both inputs MUST be ascending-sorted
    * array<bigint> (sort once per row upstream, not per pair). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    toColumn(SortedIntersectCount(toExpression(a), toExpression(b)))
}
