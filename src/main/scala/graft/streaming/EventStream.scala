package graft.streaming

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events stream
  * (SURVEY.md §2.G). Each transform is written against a plain
  * DataFrame so the SAME code path serves batch backfill (driver
  * oracle checks) and the live stream (MemoryStream specs) —
  * watermarking is the only streaming-specific step and is applied
  * only when the input is actually streaming.
  */
object EventStream {

  private def withWatermarkIfStreaming(events: DataFrame, watermark: String): DataFrame =
    if (events.isStreaming) {
      // watermarks require TIMESTAMP (ltz); sessions run in UTC so the
      // ntz→ltz cast is value-preserving
      events.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    } else events

  /** Watermarked tumbling 1-hour aggregate: window start/end kept as
    * plain columns. Batch twin of a `writeStream` hourly rollup.
    */
  def hourlyWindow(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    withWatermarkIfStreaming(events, watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("num_events"), sum("value").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("num_events"), col("total_value"))

  /** Watermark + dropDuplicates on event_id — exactly-once style
    * dedup with bounded state in streaming; plain distinct-by-key in
    * batch.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    withWatermarkIfStreaming(events, watermark)
      .dropDuplicates("event_id")
      .select("event_id", "ts", "user_id", "event_type", "value")

  /** Stream-stream inner join: purchases enriched with the clicks
    * that preceded them within `windowMinutes` per user. Both sides
    * watermarked so the state store evicts — the interval condition
    * bounds how long a click stays buffered. Works identically in
    * batch (the watermarks no-op).
    */
  def purchaseClickJoin(events: DataFrame, windowMinutes: Int = 30,
                        watermark: String = "1 hour"): DataFrame = {
    val purchases = withWatermarkIfStreaming(
      events.filter(col("event_type") === "purchase"), watermark)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val clicks = withWatermarkIfStreaming(
      events.filter(col("event_type") === "click"), watermark)
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select("purchase_id", "user_id", "purchase_ts", "purchase_value",
        "click_id", "click_ts")
  }

  case class Event(event_id: Long, ts: LocalDateTime, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: LocalDateTime, last: LocalDateTime,
                          n: Long, total: Double)
  case class Session(user_id: Long, session_start: LocalDateTime,
                     session_end: LocalDateTime, num_events: Long, total_value: Double)

  /** Stateful sessionization with `flatMapGroupsWithState`: a
    * session closes after `gapMinutes` of user inactivity (event-time
    * timeout in streaming; end-of-group flush in batch). State per
    * user is O(1) — start/last/count/sum — so state store size is
    * bounded by active users, not events.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapSec = gapMinutes * 60L
    // hoisted: capturing the Dataset itself in the closure would fail
    // task serialization
    val isStreamingInput = events.isStreaming

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
      var cur = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      sorted.foreach { e =>
        cur match {
          case Some(s) if java.time.Duration.between(s.last, e.ts).getSeconds <= gapSec =>
            cur = Some(s.copy(last = e.ts, n = s.n + 1, total = s.total + e.value))
          case Some(s) =>
            out += Session(userId, s.start, s.last, s.n, s.total)
            cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
          case None =>
            cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
        }
      }
      cur match {
        case Some(s) if !isStreamingInput =>
          // batch: end-of-group flushes the trailing session;
          // streaming keeps it in state until more events arrive
          out += Session(userId, s.start, s.last, s.n, s.total)
          state.remove()
        case Some(s) =>
          state.update(s)
        case None => state.remove()
      }
      out.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }
}
