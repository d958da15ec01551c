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
    // Deterministic salt: hash of the whole left row's key columns plus
    // a cheap per-row discriminator (monotonically varying column set).
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }
}
