package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming transforms over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference delegates all stateful semantics to Hudi keyed upserts
  * (SURVEY §2.7: no watermarks/windows/state anywhere); a complete
  * Spark-native engine should still expose the Structured Streaming
  * surface — windowed aggregation with late-data policy, and custom
  * per-key state — for pipelines that want stream-side semantics before
  * the lake write.
  *
  * Scale: windowed aggregation is a keyed shuffle with partial combine;
  * state stores are per-key, checkpointed, and bounded by the watermark
  * (no unbounded growth).
  */
object EventStreams {

  /** Tumbling 10-minute event counts + value sums with a 30-minute
    * watermark (late rows beyond it are dropped).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Streaming gap sessionization via Spark's NATIVE session_window — the
    * stream counterpart of the batch q19_sessionize oracle: a session
    * closes after `gap` idle time, merges any rows that chain within it,
    * and emits once the watermark passes the session end (bounded state,
    * the 100 TB-safe formulation; a hand-rolled flatMapGroupsWithState
    * sessionizer would carry unbounded per-key state).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SeenState(ids: Set[Long])
  case class UserSession(user_id: Long, events: Long, total: Double)

  /** Stateful exactly-once-per-key dedup: drops events whose event_id was
    * already seen for the user (custom state via flatMapGroupsWithState —
    * the streaming analog of the lake's keyed idempotence).
    */
  def dedupByEventId(events: Dataset[Event]): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(dedupFn)
  }

  private def dedupFn(userId: Long, rows: Iterator[Event],
      state: GroupState[SeenState]): Iterator[Event] = {
    val seen = state.getOption.map(_.ids).getOrElse(Set.empty)
    val (out, newSeen) = rows.foldLeft((List.empty[Event], seen)) {
      case ((acc, s), e) =>
        if (s.contains(e.event_id)) (acc, s)
        else (e :: acc, s + e.event_id)
    }
    state.update(SeenState(newSeen))
    out.reverseIterator
  }

  /** Watermark-bounded exact dedup on a key column set — built-in
    * dropDuplicatesWithinWatermark state that EXPIRES with the watermark,
    * the scale-safe default for unbounded streams (dedupByEventId's
    * custom state grows forever; use it only when replays can arrive
    * arbitrarily late). This is streaming exact-dedup for a training-data
    * ingest: duplicate records within the lateness window emit once.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      delay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join: each purchase attributed to clicks by
    * the same user within the preceding `windowMinutes` — the streaming
    * counterpart of the batch as-of/range joins (q21/q22).
    *
    * Scale contract: BOTH sides carry watermarks and the join condition
    * bounds the event-time distance, so Spark can expire join state —
    * without the time constraint a stream-stream join buffers both
    * streams forever. State ≈ each side's rows within
    * (watermark delay + window) per user — bounded, checkpointed.
    * `joinType` "inner" emits on match; "leftOuter" additionally emits
    * unmatched purchases (null click columns) once the watermark proves
    * no matching click can still arrive.
    */
  def attributionJoin(events: DataFrame, windowMinutes: Int = 60,
      delay: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", delay)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("value"), col("click_id"), col("click_ts"))
  }

  /** Running per-user totals via mapGroupsWithState (Update mode). */
  def userTotals(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserSession]) =>
          val prev = state.getOption.getOrElse(UserSession(uid, 0L, 0.0))
          val next = rows.foldLeft(prev)((s, e) =>
            s.copy(events = s.events + 1, total = s.total + e.value))
          state.update(next)
          next
      }
  }
}
