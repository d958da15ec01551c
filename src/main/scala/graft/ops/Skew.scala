package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join handling (on by default in every session here)
  * splits oversized sort-merge partitions at runtime; salting is the
  * complementary static technique for when one join key dominates so
  * heavily that even split partitions hot-spot — the classic case in
  * this engine being document shingles whose document frequency is a
  * large fraction of the corpus.
  */
object Skew {

  /** Inner equi-join with an exploded salt on the build side: `left`
    * rows get a deterministic salt in [0, factor); `right` rows are
    * replicated once per salt value. Results equal the plain join, but
    * a hot key's rows spread over `factor` shuffle partitions.
    *
    * Use when the LEFT side is the large/skewed fact and the RIGHT
    * side is small enough to replicate `factor`× (but too big or too
    * numerous-keyed to broadcast outright).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor > 0)
    // Per-row salt, independent of the row's values: duplicate rows of
    // a hot key must NOT share a salt (a value-derived hash would send
    // the whole hot key to one partition again). Row position is fine —
    // the salt only routes rows, it never affects the join result.
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }
}
