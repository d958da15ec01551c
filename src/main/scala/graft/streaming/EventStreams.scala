package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event operators
  * (graft.ext.Events): the same column algebra lifted onto an unbounded
  * source with watermarks and state.
  *
  * The reference had no streaming surface (SURVEY.md §2.7) — its
  * nearest analogue was incremental append-mode writes. This module is
  * part of the §2.8(b) extension surface.
  *
  * At scale: watermarks bound state; the windowed agg is a streaming
  * partial-aggregation (no global shuffle beyond the keyed exchange);
  * session state is per-user and evicted on event-time timeout, so
  * replay/backfill agrees with the batch operators.
  */
object EventStreams {

  /** The events schema as a streaming source expects it (ts arrives as
    * a proper timestamp from upstream ingestion). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** readStream over a parquet directory of event files. */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 1-hour windowed counts/sums with a 2-hour watermark —
    * the streaming twin of e02_tumbling_window. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))

  // ------------------------------------------------------------------ //

  case class EventIn(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(sessionStart: Timestamp, lastTs: Timestamp, nEvents: Int)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int)

  /** Exact microseconds since epoch (Timestamp keeps sub-ms in nanos). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  /** Gap-based session tracking with mapGroupsWithState — the
    * streaming twin of e04_sessionize. A session closes when event
    * time advances `gapMinutes` past its last event: the timeout is an
    * EVENT-TIME timestamp evicted by the watermark, so replaying a
    * historical day produces exactly the batch sessionizer's
    * boundaries — a processing-time timeout would close sessions by
    * wall clock and diverge on backfill. In-batch gap comparison stays
    * exact-microsecond to agree with the batch twin's interval
    * arithmetic.
    *
    * `watermarkDelay` bounds state for late data; replay correctness
    * needs only that events per user arrive time-ordered across
    * triggers within the delay. */
  def sessionize(events: Dataset[EventIn], gapMinutes: Int = 30,
      watermarkDelay: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60 * 1000000L

    def update(userId: Long, batch: Iterator[EventIn],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(userId, s.sessionStart, s.lastTs, s.nEvents))
      } else {
        val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        sorted.foreach { e =>
          cur match {
            case Some(s) if micros(e.ts) - micros(s.lastTs) <= gapUs =>
              cur = Some(s.copy(lastTs = e.ts, nEvents = s.nEvents + 1))
            case Some(s) =>
              closed ::= SessionOut(userId, s.sessionStart, s.lastTs, s.nEvents)
              cur = Some(SessionState(e.ts, e.ts, 1))
            case None =>
              cur = Some(SessionState(e.ts, e.ts, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // Event-time eviction: fire when the watermark passes the
          // gap after the last event. Spark rejects timestamps at or
          // below the current watermark, so clamp just above it (the
          // session is then already closable and fires next trigger).
          // Batch execution drops the watermark node (timeouts never
          // fire there), so the clamp falls back to no-op.
          val wm = scala.util.Try(state.getCurrentWatermarkMs())
            .getOrElse(Long.MinValue)
          state.setTimeoutTimestamp(
            math.max(s.lastTs.getTime + gapUs / 1000L, wm + 1))
        }
        closed.reverseIterator
      }
    }

    events.withWatermark("ts", watermarkDelay)
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  // ------------------------------------------------------------------ //

  case class AsofState(pMicros: Long, pEventId: Long)
  case class AsofOut(event_id: Long, user_id: Long, ts: Timestamp,
      p_event_id: Option[Long], micros_since: Option[Long])

  /** Streaming twin of e06_asof_join: enrich the click stream with the
    * most recent prior-or-equal purchase by the same user. State is one
    * tiny record per user (last purchase id + time) that only ever
    * moves forward, so it is O(users), not O(events) — no timeout
    * eviction needed; an idle-user TTL could bound it further.
    * In-batch ordering (ts, purchase-before-click, event_id) reproduces
    * the batch operator's tie discipline exactly: equal-ts purchases
    * resolve to the max event_id, and a click at a purchase's exact ts
    * sees that purchase. Replay correctness needs per-user time-ordered
    * arrival across triggers (same contract as [[sessionize]]).
    */
  def asofEnrich(events: Dataset[EventIn]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, batch: Iterator[EventIn],
        state: GroupState[AsofState]): Iterator[AsofOut] = {
      val relevant = batch
        .filter(e => e.event_type == "purchase" || e.event_type == "click")
        .toSeq
        .sortBy(e => (micros(e.ts), if (e.event_type == "purchase") 0 else 1,
          e.event_id))
      var cur = state.getOption
      val out = Seq.newBuilder[AsofOut]
      relevant.foreach { e =>
        if (e.event_type == "purchase") {
          val m = micros(e.ts)
          val newer = cur.forall(s =>
            m > s.pMicros || (m == s.pMicros && e.event_id > s.pEventId))
          if (newer)
            cur = Some(AsofState(m, e.event_id))
        } else {
          out += AsofOut(e.event_id, userId, e.ts,
            cur.map(_.pEventId), cur.map(s => micros(e.ts) - s.pMicros))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }

    events.as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  // ------------------------------------------------------------------ //

  /** Streaming exact dedup — the unbounded twin of d01's batch
    * fingerprint dedup, for at-least-once ingestion: duplicate
    * event_ids arriving within `watermarkDelay` of each other collapse
    * to the first occurrence, and the watermark bounds the dedup state
    * (an id older than the watermark is evicted — unbounded
    * `dropDuplicates` state is the classic streaming-ingest OOM).
    * At 100 TB/day this is the difference between state ∝ retention
    * window and state ∝ all-time event count. */
  def dedupEvents(events: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  // ------------------------------------------------------------------ //

  case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])
  case class FunnelUpdate(user_id: Long, t1: Option[Long], t2: Option[Long],
      t3: Option[Long])

  /** Streaming twin of e07_funnel: per-user signup → first-later-click
    * → first-later-purchase stage tracking. Each stage timestamp sets
    * exactly once (arrival is per-user time-ordered, so "first X after
    * Y" is just "first X once Y is set") and a FunnelUpdate row is
    * emitted on every stage transition — the LAST update per user is
    * that user's final funnel, and downstream can aggregate updates
    * into the batch operator's summary. State is three optional
    * timestamps per user: O(users), monotone, no eviction needed.
    * In-batch ordering (ts, stage rank, event_id) reproduces e07's
    * window-order tie discipline at equal timestamps. */
  def funnelStages(events: Dataset[EventIn]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    val rank = Map("signup" -> 0, "click" -> 1, "purchase" -> 2)

    def update(userId: Long, batch: Iterator[EventIn],
        state: GroupState[FunnelState]): Iterator[FunnelUpdate] = {
      val relevant = batch.filter(e => rank.contains(e.event_type)).toSeq
        .sortBy(e => (micros(e.ts), rank(e.event_type), e.event_id))
      var cur = state.getOption.getOrElse(FunnelState(None, None, None))
      val out = Seq.newBuilder[FunnelUpdate]
      relevant.foreach { e =>
        val m = micros(e.ts)
        val next = e.event_type match {
          case "signup" if cur.t1.isEmpty => cur.copy(t1 = Some(m))
          case "click" if cur.t1.isDefined && cur.t2.isEmpty => cur.copy(t2 = Some(m))
          case "purchase" if cur.t2.isDefined && cur.t3.isEmpty => cur.copy(t3 = Some(m))
          case _ => cur
        }
        if (next != cur) {
          cur = next
          out += FunnelUpdate(userId, cur.t1, cur.t2, cur.t3)
        }
      }
      state.update(cur)
      out.result().iterator
    }

    events.as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  case class RetentionState(firstDay: Long, seen: Long)
  case class RetentionHit(cohort_day: Timestamp, day_offset: Int,
      user_id: Long)

  /** Streaming twin of e09_cohort_retention: per-user cohort (first
    * active epoch-aligned day) and retention-day tracking. Emits ONE
    * RetentionHit per (user, day_offset ≤ maxOffset) — the increments
    * a counting sink aggregates into the batch operator's
    * (cohort_day, day_offset, n_active) matrix; the once-per-offset
    * guarantee is a per-user seen-offset BITMASK, so re-activity
    * within a day emits nothing. State is two longs per user EVER
    * seen, monotone, never evicted — the funnelStages discipline
    * (O(users), 16 bytes each), deliberately NOT a timeout: evicting
    * a user's state once their retention window closes would
    * RE-COHORT them on their next activity (empty state ⇒ "first day
    * seen") and emit a phantom offset-0 hit with a wrong cohort_day —
    * trigger-timing-dependent output the batch matrix never contains.
    * The exhausted state is the tombstone that prevents exactly that.
    *
    * Cohort is the minimum day seen SO FAR: an event arriving later
    * than the watermark delay after a user's true first day can
    * mis-cohort that user (the batch operator sees all history; a
    * stream cannot) — size `watermarkDelay` to the tolerated cohort
    * skew. Days before the current cohort within the watermark are
    * ignored rather than re-cohorted (offsets already emitted can't
    * be retracted in append mode). */
  def cohortRetention(events: Dataset[EventIn], maxOffset: Int = 7,
      watermarkDelay: String = "1 day"): Dataset[RetentionHit] = {
    require(maxOffset >= 0 && maxOffset < 63,
      s"seen-offset bitmask holds offsets 0..62, got $maxOffset")
    import events.sparkSession.implicits._
    val dayUs = 86400L * 1000000L

    def update(userId: Long, batch: Iterator[EventIn],
        state: GroupState[RetentionState]): Iterator[RetentionHit] = {
      val days = batch.map(e => Math.floorDiv(micros(e.ts), dayUs))
        .toSeq.distinct.sorted
      var cur = state.getOption.getOrElse(RetentionState(days.head, 0L))
      val out = Seq.newBuilder[RetentionHit]
      days.foreach { d =>
        val off = d - cur.firstDay
        if (off >= 0 && off <= maxOffset && (cur.seen & (1L << off)) == 0L) {
          cur = cur.copy(seen = cur.seen | (1L << off))
          out += RetentionHit(new Timestamp(cur.firstDay * 86400000L),
            off.toInt, userId)
        }
      }
      state.update(cur)
      out.result().iterator
    }

    events.withWatermark("ts", watermarkDelay)
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
