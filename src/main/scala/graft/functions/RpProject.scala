package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The s04 JL random projection as ONE native expression:
  * `rp_project(v)` = the 16 outputs `(Σ_{i=1..64} v[i]·sign(i,j)) / 4`
  * over a 64-dim array<double>, sign(i,j) = ±1 from the parity of the
  * first hex char of md5("i:j") — the exact matrix the s04 oracle
  * derives in SQL (computed once here, JVM md5, the rpSign parity).
  *
  * Why native (the SqDistLong/NearestId precedent): the composable
  * form inlines 16 × 64 `element_at · lit` terms — a 1,024-node
  * expression tree that (a) Catalyst re-optimizes on EVERY action
  * (~seconds of driver planning per evaluation at any scale), and
  * (b) compiles past the JVM's 64 KB method limit once a downstream
  * consumer (the full-output Verify write) fuses into the same
  * whole-stage method, silently degrading the stage to interpreted
  * execution. This expression is a 3-line plan node and a flat
  * primitive loop.
  *
  * Bit-identical to the composed `reduce(_ + _)` form: the
  * accumulator starts from the FIRST term (not 0.0 — `0.0 + (-0.0)`
  * would flip a sign bit) and adds terms in ascending-i order, so
  * every IEEE rounding step matches; the /4.0 is exact. FunctionsSpec
  * pins native ≡ composed on the real corpus.
  */
case class RpProject(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rp_project expects array<double>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    // Composed-form semantics on short input: element_at past the array
    // end made every composed sum NULL, so an input narrower than the
    // 64-dim domain yields NULL here too — never a silently-partial sum
    // (ADVICE r17). Longer arrays read their first 64 dims, exactly as
    // the composed element_at(1..64) terms did.
    if (v.numElements() < RpProject.InDims) return null
    val signs = RpProject.signs
    val out = new Array[Double](RpProject.OutDims)
    val n = RpProject.InDims
    var j = 0
    while (j < RpProject.OutDims) {
      val sj = signs(j)
      var acc = v.getDouble(0) * sj(0)
      var i = 1
      while (i < n) {
        acc += v.getDouble(i) * sj(i)
        i += 1
      }
      out(j) = acc / 4.0
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signs = ctx.addReferenceObj("rpSigns", RpProject.signs,
        "double[][]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val sj = ctx.freshName("sj")
      s"""
         |if ($a.numElements() < ${RpProject.InDims}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[${RpProject.OutDims}];
         |  int $n = ${RpProject.InDims};
         |  for (int $j = 0; $j < ${RpProject.OutDims}; $j++) {
         |    double[] $sj = $signs[$j];
         |    double $acc = $a.getDouble(0) * $sj[0];
         |    for (int $i = 1; $i < $n; $i++) {
         |      $acc += $a.getDouble($i) * $sj[$i];
         |    }
         |    $out[$j] = $acc / 4.0;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "rp_project"
}

object RpProject {
  val InDims = 64
  val OutDims = 16

  /** sign(i, j) for input dim i (1-based) × output dim j (0-based),
    * laid out [j][i-1] — parity of the first hex char of md5("i:j"),
    * the exact value the s04 oracle derives in SQL. */
  lazy val signs: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(OutDims, InDims) { (j, i0) =>
      val hex = md.digest(s"${i0 + 1}:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1.0 else -1.0
    }
  }

  import org.apache.spark.sql.GraftColumnBridge._

  def rpProject(v: Column): Column = toColumn(RpProject(toExpression(v)))
}
