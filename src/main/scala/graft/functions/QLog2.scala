package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Quantized fixed-point base-2 logarithm of a positive int64:
  * `qlog2(x) ≈ ⌊2^Q · log2(x)⌋` with Q = [[QLog2.FracBits]] fractional
  * bits, computed by an EXACT integer shift-square algorithm — the
  * log the quantized-scoring family (t22's discipline) cannot
  * otherwise have, because float `ln` may differ in the last ulp
  * across engines and a `floor` at a boundary would then flip a
  * score. Every step here is integer arithmetic with a pinned
  * rounding rule, so Spark and the DuckDB oracle restatement
  * (`Text.qlogChainCte` — the SAME algorithm unrolled to chained
  * CTEs; change both or neither) produce bit-identical values:
  *
  *  1. `m = ⌊log2 x⌋` (the msb index — exact).
  *  2. Normalize to an S-fractional-bit mantissa `y ∈ [2^S, 2^(S+1))`
  *     with S = [[QLog2.MantBits]]: left-shift exactly when m ≤ S,
  *     truncating right-shift otherwise (the one deliberate
  *     approximation; deterministic, identically stated in SQL).
  *  3. Q rounds of mantissa squaring: `y ← (y·y) >> S`, emit bit 1
  *     and halve when y ≥ 2^(S+1) — the classic bit-by-bit log₂
  *     recurrence (log2(y²) = 2·log2 y). `y < 2^(S+2)` keeps
  *     `y·y < 2^(2S+4) = 2^44`: no int64 overflow for any input.
  *
  * Result error vs the ideal ⌊2^Q log2 x⌋ is ≤ ~1 unit of 2^-Q
  * (measured over a sweep in FunctionsSpec against the BigInt-free
  * JVM reference [[QLog2.ref]], which `eval` delegates to — one
  * definition). Returns NULL for x ≤ 0 (the SQL-registered form
  * documents this; there is no truncation divergence to warn about —
  * the expression is unary).
  *
  * Why native: the recurrence needs a loop carrying two mutable
  * longs; as column algebra each step would reference the previous
  * step's column twice, and CollapseProject would inline that into a
  * 2^Q-node expression tree. Callers only apply it to model-sized
  * frames (vocab × classes rows), never the corpus — the cost story
  * is the classifier's (t29), not this expression's.
  */
case class QLog2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"qlog2 expects bigint, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    if (x <= 0L) null else QLog2.ref(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m")
      val y = ctx.freshName("y")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val S = QLog2.MantBits
      val Q = QLog2.FracBits
      s"""
         |if ($c <= 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $m = 63 - java.lang.Long.numberOfLeadingZeros($c);
         |  long $y = ($m <= $S) ? ($c << ($S - $m)) : ($c >> ($m - $S));
         |  long $r = 0L;
         |  for (int $i = 0; $i < $Q; $i++) {
         |    $y = ($y * $y) >> $S;
         |    if ($y >= (1L << ${S + 1})) { $r = $r * 2 + 1; $y >>= 1; }
         |    else { $r = $r * 2; }
         |  }
         |  ${ev.value} = ((long) $m << $Q) + $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QLog2 {
  import org.apache.spark.sql.GraftColumnBridge._

  /** Fractional bits of the result (Q). Shared with the DuckDB oracle
    * chain generator — the ONE quantization constant of the family. */
  val FracBits = 16

  /** Fractional bits of the normalized mantissa (S). */
  val MantBits = 20

  /** The JVM reference recurrence — `eval`, the FunctionsSpec sweep,
    * and ExtSpec's classifier replay all call exactly this. */
  def ref(x: Long): Long = {
    require(x > 0L, s"qlog2 requires a positive input, got $x")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var y = if (m <= MantBits) x << (MantBits - m) else x >> (m - MantBits)
    var r = 0L
    var i = 0
    while (i < FracBits) {
      y = (y * y) >> MantBits
      if (y >= (1L << (MantBits + 1))) { r = r * 2 + 1; y >>= 1 }
      else r *= 2
      i += 1
    }
    (m.toLong << FracBits) + r
  }

  def qlog2(x: Column): Column = toColumn(QLog2(toExpression(x)))
}
