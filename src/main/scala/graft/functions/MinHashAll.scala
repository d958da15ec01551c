package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_all(xs)` — ALL k minhashes of a shingle-id array in ONE
  * pass: out[i] = min_x (a_i·x + b_i) mod p, NULL when `xs` is empty
  * (each composable `array_min(transform(...))` is null there, and
  * the banded consumer's concat_ws treats the two identically —
  * FunctionsSpec pins the equivalence including the empty case).
  *
  * Why native (round 17, the RpProject/SqDistLong precedent): the
  * composable form evaluates k=32 separate `transform` lambdas —
  * 32 allocated intermediate arrays and 64 array traversals per doc,
  * in a plan whose 32-column projection chain doubled the d03 plan
  * text. This is one flat primitive loop, k running minima, zero
  * allocations beyond the output (measured: d03 2.3 → 1.4 s at
  * sf0.1).
  *
  * The (a, b, p) family is passed IN (value-equal Seqs) so the
  * constants keep their ONE definition at the call site
  * ([[graft.ext.Dedup.minhashA]]/[[graft.ext.Dedup.minhashB]] — the
  * same values the DuckDB oracle states); exactness: a·x + b stays
  * under 2⁶³ for the ≤36-bit shingle hashes the family is fed
  * (CLAUDE.md hash-width rule), so JVM long arithmetic is the
  * engine arithmetic.
  */
case class MinHashAll(child: Expression, as: Seq[Long], bs: Seq[Long],
    p: Long) extends UnaryExpression {

  require(as.nonEmpty && as.length == bs.length,
    "minhash_all requires matching non-empty (a, b) families")

  private def k = as.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_all expects array<bigint>, got ${other.simpleString}")
    }

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  // Null elements are SKIPPED, matching the composed
  // array_min(transform(...))'s null-skipping (ADVICE r17 — a bare
  // getLong on a null slot reads an undefined value and can wrongly
  // lower a minimum). Unreachable corner recorded: an all-null
  // non-empty input yields NULL here, where the composed form emits an
  // array of 32 per-slot nulls (unrepresentable in this output's
  // containsNull=false type); no caller can produce one (shingle sets
  // come from collect_set).
  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val out = Array.fill(k)(Long.MaxValue)
    var seen = false
    var j = 0
    while (j < n) {
      if (!xs.isNullAt(j)) {
        seen = true
        val x = xs.getLong(j)
        var i = 0
        while (i < k) {
          val v = (aArr(i) * x + bArr(i)) % p
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) return null
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  boolean $seen = false;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) continue;
         |    $seen = true;
         |    long $x = $a.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $v = ($aRef[$i] * $x + $bRef[$i]) % ${p}L;
         |      if ($v < $out[$i]) $out[$i] = $v;
         |    }
         |  }
         |  if (!$seen) { ${ev.isNull} = true; } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "minhash_all"
}

object MinHashAll {
  import org.apache.spark.sql.GraftColumnBridge._

  def minhashAll(xs: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    toColumn(MinHashAll(toExpression(xs), as, bs, p))
}
