package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The constant-key broadcast idiom: joining a tiny bounded relation
  * (a single-row corpus count, a fixed query set) onto a big one with
  * no natural key normally plans as a BroadcastNestedLoopJoin over an
  * IdentityBroadcastMode build — the plan shape the engine-wide
  * PlanSpec pin forbids, because at 100 TB the same shape with an
  * unbounded build side is a memory cliff, and a pin with exceptions
  * stops being a pin. Joining both sides on a constant-valued key
  * turns the plan into a keyed BroadcastHashJoin (hashed relation,
  * codegen probe) with any remaining predicate as a residual filter —
  * identical work for a bounded build side, and the scan side never
  * shuffles.
  *
  * The key must be constant-VALUED but not constant-FOLDABLE: a
  * `lit(1)` on both sides folds to `ON true`, which re-plans as the
  * very cross join being avoided. `least(1, greatest(1, x))` is 1 for
  * every x and Catalyst has no rule to see through it.
  */
object ConstKey {

  /** A column that always evaluates to int 1 but is opaque to constant
    * folding. `x` may be any non-null numeric column. */
  def one(x: Column): Column =
    least(lit(1L), greatest(lit(1L), x.cast("long"))).cast("int")
}
