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
    // Salt = hash of the FULL left row: deterministic under task retry
    // (a position-based salt could change on recomputation, silently
    // dropping/duplicating rows fetched by already-finished reducers)
    // and spreads a hot key as long as its rows differ in any non-key
    // column. Fully identical duplicate rows do share a salt — callers
    // with such data should carry a unique id column into `left`.
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(factor.toLong))
        .cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }
}
