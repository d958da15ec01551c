package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions hook exposing graft's native expressions to
  * SQL. Attach with:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  * or `spark.sql.extensions=graft.functions.GraftExtensions`, after
  * which `SELECT cosine_sim(a, b)` parses anywhere SQL does.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSimDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimDescriptor._1, cosineSimDescriptor._2, cosineSimDescriptor._3)
}
