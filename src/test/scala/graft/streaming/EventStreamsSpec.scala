package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime + minute * 60000L)

  test("windowed streaming counts match batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.hourlyByType(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(70), 2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select(col("window.start"), col("event_type"), col("n"), col("total_value"))
        .orderBy("start", "event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(2) == 2 && rows(0).getDouble(3) == 3.0) // 2 clicks hour 10
      assert(rows(1).getString(1) == "view" && rows(1).getLong(2) == 1)
    } finally q.stop()
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupWithinWatermark(mem.toDF(), "event_id", "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(0), 1, "click", 1.0), // same-batch dup
        Event(2, ts(5), 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(10), 1, "click", 1.0)) // cross-batch dup id
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L)) // each id exactly once
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // user 1: two events 10 min apart (one session), then a 90-min gap
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(100), 1, "click", 1.0)) // advances watermark too
      q.processAllAvailable()
      mem.addData(Event(4, ts(200), 2, "view", 1.0))  // push watermark further
      q.processAllAvailable()
      val sess = spark.table("sessions")
        .filter(col("user_id") === 1 && col("closed"))
        .orderBy("sess_start").collect()
      assert(sess.nonEmpty, "first session should have closed")
      assert(sess(0).getAs[Long]("n_events") == 2)
      assert(sess(0).getAs[java.sql.Timestamp]("sess_start") == ts(0))
      assert(sess(0).getAs[java.sql.Timestamp]("sess_end") == ts(10))
    } finally q.stop()
  }
}
