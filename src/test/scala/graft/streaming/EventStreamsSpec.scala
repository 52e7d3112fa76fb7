package graft.streaming

import graft.util.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class EventStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Sessions.local("stream-spec", "4")

  override def afterAll(): Unit = spark.stop()

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed counts with watermark drop late rows beyond 30 minutes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.windowedCounts(df)
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    mem.addData((1L, ts(0), "a", 1.0), (2L, ts(5), "a", 2.0), (3L, ts(12), "b", 3.0))
    q.processAllAvailable()
    // advance event time far ahead → closes earlier windows
    mem.addData((4L, ts(59), "a", 1.0))
    q.processAllAvailable()
    // this row is > 30 min late vs max event time → dropped by watermark
    mem.addData((5L, ts(0), "a", 100.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wc").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(out.contains(("2026-01-01 10:00:00.0", "a", 2L))) // late row NOT counted
    assert(out.contains(("2026-01-01 10:10:00.0", "b", 1L)))
  }

  test("session_window: gaps split sessions, chained rows merge, state bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStreams.sessionCounts(df, gap = "10 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // user 1: rows at 10:00, 10:05, 10:12 chain into ONE session (each
    // gap < 10m); the row at 10:40 starts a new one. user 2: one row.
    mem.addData((1L, ts(0), 1L), (2L, ts(5), 1L), (3L, ts(12), 1L),
      (4L, ts(40), 1L), (5L, ts(3), 2L))
    q.processAllAvailable()
    // push event time far ahead so the watermark closes every session
    mem.addData((9L, Timestamp.valueOf("2026-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess")
      .select("user_id", "n_events", "sess_start", "sess_end").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toString, r.getTimestamp(3).toString)).toSet
    assert(out.contains((1L, 3L, "2026-01-01 10:00:00.0", "2026-01-01 10:22:00.0")))
    assert(out.contains((1L, 1L, "2026-01-01 10:40:00.0", "2026-01-01 10:50:00.0")))
    assert(out.contains((2L, 1L, "2026-01-01 10:03:00.0", "2026-01-01 10:13:00.0")))
  }

  test("dropDuplicatesWithinWatermark: replays within the window emit once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.dedupWithinWatermark(df, Seq("event_id"))
      .writeStream.format("memory").queryName("ddw")
      .outputMode("append").start()
    mem.addData((1L, ts(0), "a", 1.0), (2L, ts(1), "a", 2.0),
      (1L, ts(2), "a", 1.0)) // in-batch duplicate
    q.processAllAvailable()
    mem.addData((2L, ts(3), "a", 2.0), (3L, ts(4), "b", 3.0)) // replayed 2
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("ddw").select("event_id").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == Seq(1L, 2L, 3L)) // each id exactly once
  }

  test("flatMapGroupsWithState dedups replayed event ids per user") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupByEventId(mem.toDS())
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    mem.addData(
      EventStreams.Event(1, ts(0), 7, "a", 1.0),
      EventStreams.Event(2, ts(1), 7, "a", 2.0))
    q.processAllAvailable()
    mem.addData( // replay id=1 for same user + same id for another user
      EventStreams.Event(1, ts(2), 7, "a", 9.0),
      EventStreams.Event(1, ts(2), 8, "a", 5.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dd").select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out == Seq((1L, 7L), (1L, 8L), (2L, 7L))) // replay suppressed
  }

  test("mapGroupsWithState keeps running user totals") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.userTotals(mem.toDS())
      .writeStream.format("memory").queryName("ut")
      .outputMode("update").start()
    mem.addData(EventStreams.Event(1, ts(0), 7, "a", 1.0))
    q.processAllAvailable()
    mem.addData(EventStreams.Event(2, ts(1), 7, "a", 2.5))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("ut").filter(col("user_id") === 7)
      .orderBy(col("events").desc).head()
    assert(last.getAs[Long]("events") == 2L)
    assert(last.getAs[Double]("total") == 3.5)
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val df = mem.toDF()
    val q = EventStreams.attributionJoin(df, windowMinutes = 10)
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    mem.addData(
      EventStreams.Event(1, ts(0), 7, "click", 0.0),
      EventStreams.Event(2, ts(5), 7, "purchase", 9.5), // 5 min after → match
      EventStreams.Event(3, ts(20), 7, "purchase", 1.0), // 20 min after → no
      EventStreams.Event(4, ts(3), 8, "purchase", 2.0)) // other user → no
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attr")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((2L, 1L)))
  }

  test("left-outer interval join emits unmatched purchases after watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.attributionJoin(mem.toDF(), windowMinutes = 10,
        delay = "10 minutes", joinType = "leftOuter")
      .writeStream.format("memory").queryName("attr_lo")
      .outputMode("append").start()
    mem.addData(
      EventStreams.Event(1, ts(0), 7, "click", 0.0),
      EventStreams.Event(2, ts(5), 7, "purchase", 9.5), // matches
      EventStreams.Event(3, ts(6), 9, "purchase", 4.0)) // no click: outer row
    q.processAllAvailable()
    // push event time far ahead on BOTH branches — the global watermark
    // is the MIN over all watermark nodes, so advancing only the click
    // side would leave the purchase-side watermark (and state cleanup)
    // behind. Next batch's cleanup then emits the outer row for id=3.
    mem.addData(EventStreams.Event(4, ts(59), 1, "click", 0.0),
      EventStreams.Event(5, ts(59), 1, "purchase", 0.0))
    q.processAllAvailable()
    mem.addData(EventStreams.Event(6, ts(59), 2, "click", 0.0),
      EventStreams.Event(7, ts(59), 2, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr_lo")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows.contains((2L, 1L)))
    assert(rows.contains((3L, -1L)), s"expected outer row: $rows")
  }
  test("dropDuplicatesWithinWatermark re-admits a dup that outwaits the window") {
    // the BOUNDED-STATE side of the contract (the companion test above
    // pins in-window dedup): once the watermark passes an id's state it
    // is evicted, so a sufficiently late duplicate is emitted AGAIN —
    // state never grows with history, and the out-of-window straggler
    // converges by record key at the lake's idempotent sink
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStreams.dedupWithinWatermark(df, Seq("event_id"),
        delay = "30 minutes")
      .writeStream.format("memory").queryName("ddw2")
      .outputMode("append").start()
    mem.addData((1L, ts(0), 1L), (1L, ts(2), 1L), (2L, ts(5), 1L))
    q.processAllAvailable()
    assert(spark.table("ddw2").select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // push event time ~2h ahead: watermark (max - 30m) passes id 1
    mem.addData((99L, Timestamp.valueOf("2026-01-01 12:00:00"), 9L))
    q.processAllAvailable()
    mem.addData((1L, Timestamp.valueOf("2026-01-01 11:58:00"), 1L))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("ddw2").select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 1L, 2L, 99L), ids.toString)
  }
}
