package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class Event(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

final case class SessionUpdate(
    user_id: Long, n_events: Long,
    sess_start: java.sql.Timestamp, sess_end: java.sql.Timestamp,
    closed: Boolean)

private final case class SessionBuf(
    n: Long, startUs: Long, endUs: Long)

/** Structured Streaming operators over the `events` shape (TESTDATA.md).
  *
  * The reference is strictly batch (SURVEY.md §1.1 — its closest analogs
  * are freshness checks and Prefect cron), so these are forward-looking
  * scale operators: the same windowed aggregation and sessionization
  * semantics as the batch queries (ExtensionQueries e1/e2), expressed as
  * incremental streams with watermarked state so they run continuously
  * over an unbounded feed.
  */
object EventStreams extends Serializable {

  /** Tumbling-window counts/sums with a watermark bounding state: late
    * events beyond 1 hour are dropped, everything else re-aggregates
    * incrementally. */
  def hourlyByType(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming exact dedup: duplicates arriving within the watermark
    * window are dropped; state expires with the watermark so it is bounded
    * by the dedup horizon, not the stream's lifetime — the streaming twin
    * of `Dedup.exact` for continuous ingestion pipelines. */
  def dedupWithinWatermark(events: DataFrame, idCol: String = "event_id",
      tsCol: String = "ts", horizon: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stateful sessionization with a 30-minute inactivity gap via
    * `flatMapGroupsWithState` + event-time timeout. State per user is one
    * small buffer; the watermark expires idle sessions so state size is
    * bounded by *active* users, not total users — the property that matters
    * at cluster scale. */
  /** java.sql.Timestamp ↔ epoch-µs, keeping full microsecond precision
    * (getTime alone floors to ms, which would desync the streaming result
    * from the µs-precise batch twin). */
  private[streaming] def tsToUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private[streaming] def usToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessionize(events: Dataset[Event],
      gapMinutes: Long = 30): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionBuf]): Iterator[SessionUpdate] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionUpdate(userId, s.n,
          usToTs(s.startUs), usToTs(s.endUs), closed = true))
      }
      val sorted = rows.toSeq.sortBy(e => (tsToUs(e.ts), e.event_id))
      var out = Vector.empty[SessionUpdate]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = tsToUs(e.ts)
        cur match {
          case Some(s) if t - s.endUs <= gapUs =>
            cur = Some(s.copy(n = s.n + 1, endUs = math.max(s.endUs, t)))
          case Some(s) => // gap exceeded: close previous, open new
            out :+= SessionUpdate(userId, s.n,
              usToTs(s.startUs), usToTs(s.endUs), closed = true)
            cur = Some(SessionBuf(1, t, t))
          case None =>
            cur = Some(SessionBuf(1, t, t))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.endUs / 1000L + gapUs / 1000L)
      }
      out.iterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
