package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned interval join: equivalence to the naive theta join,
  * exactly-one-bin matching (no dedup pass), and the plan shape that
  * justifies the operator (equi-join, no nested loop).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("matches the naive theta join exactly, including edge cases") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == lo of A: in (inclusive lo)
      (2L, ts("2024-01-01 00:59:59")),
      (3L, ts("2024-01-01 01:00:00")), // == hi of A: out (exclusive hi)
      (4L, ts("2024-01-01 05:30:00")), // in B and C (overlap → two matches)
      (5L, ts("2024-01-02 00:00:00"))) // in nothing
      .toDF("pid", "ts")
    val intervals = Seq(
      ("A", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      ("B", ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00")),
      ("C", ts("2024-01-01 05:15:00"), ts("2024-01-01 05:45:00")))
      .toDF("iid", "lo", "hi")

    for (binSeconds <- Seq(60L, 3600L, 86400L)) {
      val got = RangeJoin.pointInInterval(points, "ts", intervals, "lo", "hi",
        binSeconds).select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val want = points.crossJoin(intervals)
        .filter(col("ts") >= col("lo") && col("ts") < col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.sorted.toSeq == want.sorted.toSeq, s"binSeconds=$binSeconds")
      // each qualifying pair appears exactly once — no dedup needed
      assert(got.length == got.distinct.length, s"binSeconds=$binSeconds duplicated")
    }
  }

  test("random points x random intervals equal the naive join") {
    val rnd = new scala.util.Random(17)
    val base = ts("2024-03-01 00:00:00").getTime
    val points = (0L until 300L)
      .map(i => (i, new java.sql.Timestamp(base + rnd.nextInt(86400) * 1000L)))
      .toDF("pid", "ts")
    val intervals = (0 until 40).map { i =>
      val lo = base + rnd.nextInt(86400) * 1000L
      (s"i$i", new java.sql.Timestamp(lo),
        new java.sql.Timestamp(lo + (60 + rnd.nextInt(7200)) * 1000L))
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "ts", intervals, "lo", "hi", 1800L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = points.crossJoin(intervals)
      .filter(col("ts") >= col("lo") && col("ts") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.length == got.distinct.length, "no duplicated pairs")
  }

  test("plans as an equi-join on the bin, never a nested loop") {
    val points = (0L until 100L).map(i => (i, ts(f"2024-01-01 ${i % 24}%02d:00:01")))
      .toDF("pid", "ts")
    val intervals = Seq(("w", ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")))
      .toDF("iid", "lo", "hi")
    val p = RangeJoin.pointInInterval(points, "ts", intervals, "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join must not plan a product:\n$p")
    assert(p.contains("graft_bin"), s"expected the bin equi-key in the join:\n$p")
  }

  test("eventImpactWindows counts the trigger's own window population") {
    val events = Seq(
      (100L, ts("2024-01-01 10:00:00"), "error"),
      (101L, ts("2024-01-01 10:01:00"), "click"),
      (102L, ts("2024-01-01 10:04:59"), "view"),
      (103L, ts("2024-01-01 10:05:00"), "click"), // outside the 5-min window
      (104L, ts("2024-01-01 12:00:00"), "error"))
      .toDF("event_id", "ts", "event_type")
    val out = RangeJoin.eventImpactWindows(events, "error", 300L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (100L, "error") -> 1L,   // the trigger itself
      (100L, "click") -> 1L,
      (100L, "view") -> 1L,
      (104L, "error") -> 1L))
  }
}
