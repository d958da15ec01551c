package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's own bloom-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the exact
  * expressions AQE's runtime row-level filtering injects, exposed
  * through the [[GraftColumnBridge]] because Spark keeps them out of
  * the public FunctionRegistry). The aggregate consumes xxhash64
  * longs and emits the filter as one binary row; the predicate is a
  * pure map over a scan, so a membership pre-filter drops
  * non-candidate rows BEFORE any exchange — the scale tool for the
  * "batch too large to broadcast" regime (d21): a broadcast join
  * ships the whole key set per executor, the bloom ships a fixed
  * bit-budget with a bounded false-positive rate, and an exact join
  * on the survivors removes the false positives from the answer.
  *
  * Determinism: the final answer never depends on the filter's
  * contents (false positives are verified away), so the bloom's
  * internal hashing cannot leak into a hash-checked result.
  */
object Bloom {

  /** `bloom_agg(h)` over an xxhash64 long column: the filter sized
    * for `items` expected keys in `bits` bits, returned as one
    * binary value. */
  def bloomAgg(h: Column, items: Long, bits: Long): Column =
    GraftColumnBridge.toColumn(new BloomFilterAggregate(
      GraftColumnBridge.toExpression(h),
      Literal(items), Literal(bits)).toAggregateExpression())

  /** `might_contain(filter, h)` — true for every inserted hash, true
    * with the filter's false-positive rate otherwise, never false for
    * a member (the property the verify-exact tail relies on). */
  def mightContain(filter: Column, h: Column): Column =
    GraftColumnBridge.toColumn(BloomFilterMightContain(
      GraftColumnBridge.toExpression(filter),
      GraftColumnBridge.toExpression(h)))
}
