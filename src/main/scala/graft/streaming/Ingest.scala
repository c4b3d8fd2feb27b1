package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.store.SnapshotStore

/** Structured-Streaming ingestion and stateful stream operators.
  *
  * The reference's "insert → searchable" path (MemTable absorbing writes,
  * vecgo `internal/segment/memtable`) maps to micro-batches here: each
  * micro-batch commits ONE new snapshot version (SURVEY.md §1.1 MemTable
  * row, §2.1 W6 "one micro-batch = one new snapshot version"), giving the
  * same at-least-once durability boundary as vecgo's Commit without any
  * online mutable state.
  */
object Ingest {

  /** Stream → snapshot store: every micro-batch becomes a store version.
    * Combine with `store.shouldCompact`/`compact()` housekeeping (the
    * streaming analog of vecgo's background compaction loop).
    */
  def toStore(stream: DataFrame, store: SnapshotStore,
      checkpoint: String, compactEvery: Int = 8): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.insert(batch)
        if (store.shouldCompact(compactEvery)) store.compact()
        ()
      }
      .start()

  /** Watermarked tumbling-window counts — late data beyond the watermark
    * is dropped, state is bounded.
    */
  def windowedCounts(stream: DataFrame, tsCol: String, keyCol: String,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col(keyCol), col("n"))

  /** Per-key session state for [[sessionCounts]]. */
  case class SessionState(sessions: Long, events: Long, lastTsSec: Long)
  /** One output row per key per micro-batch: running session/event counts. */
  case class SessionUpdate(key: Long, sessions: Long, events: Long)

  /** Per-user as-of state: the most recent purchase carried forward. */
  case class AsofState(pId: Long, pValue: Double)
  /** One output row per click: the as-of matched purchase (None = no
    * purchase at or before the click yet).
    */
  case class AsofMatch(eventId: Long, userId: Long,
      lastPId: Option[Long], lastPValue: Option[Double])

  /** Custom stateful operator (flatMapGroupsWithState): streaming AS-OF
    * join. Input rows are (userId, eventId, tsUs, isPurchase, value);
    * purchases update the per-user carried state, clicks emit the state
    * as of their timestamp. Within a micro-batch rows are processed in
    * event-time order with purchases winning timestamp ties (the batch
    * twin [[graft.EventQueries.asofJoin]] orders `isP.desc` at equal ts),
    * so feeding time-ordered micro-batches reproduces the batch result
    * exactly — each click emits exactly once, in the batch it arrives.
    */
  def asofMatches(events: Dataset[(Long, Long, Long, Boolean, Double)])
      : Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[AsofState]) =>
          // event-time order; purchase-first at ties, then event id
          val sorted = rows.toSeq.sortBy {
            case (_, eventId, tsUs, isP, _) => (tsUs, !isP, eventId)
          }
          val out = Seq.newBuilder[AsofMatch]
          var st = state.getOption
          sorted.foreach { case (_, eventId, _, isP, value) =>
            if (isP) st = Some(AsofState(eventId, value))
            else out += AsofMatch(eventId, user, st.map(_.pId), st.map(_.pValue))
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Custom stateful operator (mapGroupsWithState): gap-based session
    * counting per key over a stream of (key, epochSeconds). The batch-mode
    * twin is [[graft.EventQueries.sessionize]] — same gap rule.
    */
  def sessionCounts(events: Dataset[(Long, Long)],
      gapSec: Long = 1800): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[SessionState]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          val init = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          val out = sorted.foldLeft(init) { (st, ts) =>
            val newSession = st.lastTsSec == Long.MinValue || ts - st.lastTsSec > gapSec
            SessionState(st.sessions + (if (newSession) 1 else 0),
              st.events + 1, ts)
          }
          state.update(out)
          SessionUpdate(key, out.sessions, out.events)
      }
  }
}
