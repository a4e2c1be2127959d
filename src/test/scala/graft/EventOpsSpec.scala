package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Crafted-input specs for the event-derived warehouse operators
  * (SCD2 dimension build, new-vs-returning actives). The oracle gate
  * covers full-table semantics; these pin the distinguishing branches
  * — run collapsing, interval chaining, first-day classification.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, String, Long, String)*): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("scd2UserState collapses runs and chains validity intervals") {
    val e = events(
      (1L, "2024-01-01 10:00:00", 7L, "click"),
      (2L, "2024-01-01 11:00:00", 7L, "click"),   // same run
      (3L, "2024-01-02 09:00:00", 7L, "purchase"), // version 2
      (4L, "2024-01-03 09:00:00", 7L, "click"),   // back to click: version 3
      (5L, "2024-01-01 08:00:00", 9L, "signup"))  // other user
    val out = EventOps.scd2UserState(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getTimestamp(3), Option(r.getTimestamp(4)),
          r.getLong(5), r.getBoolean(6))).toMap
    assert(out.size == 4)
    val (s1, from1, to1, n1, cur1) = out((7L, 1L))
    assert(s1 == "click" && n1 == 2L && !cur1)
    assert(from1.toString.startsWith("2024-01-01 10:00"))
    assert(to1.get.toString.startsWith("2024-01-02 09:00")) // next version's start
    val (s3, _, to3, _, cur3) = out((7L, 3L))
    assert(s3 == "click" && to3.isEmpty && cur3) // reverting opens a NEW version
    val (_, _, to9, _, cur9) = out((9L, 1L))
    assert(to9.isEmpty && cur9)
  }

  test("scd2 versions within a user are contiguous and half-open") {
    val e = events(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-02 10:00:00", 1L, "b"),
      (3L, "2024-01-03 10:00:00", 1L, "c"))
    val rows = EventOps.scd2UserState(e).orderBy("version").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    // each valid_to equals the next version's valid_from (half-open chain)
    rows.sliding(2).foreach {
      case Array(prev, next) =>
        assert(prev.getTimestamp(4) == next.getTimestamp(3))
      case _ =>
    }
    assert(rows.last.getTimestamp(4) == null)
  }

  test("newVsReturning classifies a user as new only on the first day") {
    val e = events(
      (1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 12:00:00", 1L, "click"), // same day, still one active
      (3L, "2024-01-02 10:00:00", 1L, "click"), // returning
      (4L, "2024-01-02 11:00:00", 2L, "click")) // new on day 2
    val out = EventOps.newVsReturning(e).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      "2024-01-01" -> (1L, 0L, 1L),
      "2024-01-02" -> (1L, 1L, 2L)))
  }
}
