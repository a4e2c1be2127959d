package graft

import java.sql.Timestamp

import graft.operators.AsOf

/** As-of join semantics on crafted rows: inclusive match, no-prior
  * nulls, per-key isolation, tie-breaking.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("each left row gets the latest right row at or before its time") {
    val left = Seq(
      (1L, 100L, t(10), 5.0),
      (2L, 100L, t(20), 6.0),
      (3L, 100L, t(5), 7.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (901L, 100L, t(8), 1.0),
      (902L, 100L, t(15), 2.0),
      (903L, 100L, t(40), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.join(left, right, Seq("user_id"), "ts",
      rightValues = Seq("value"), tieBreak = Some("event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(1L) == Some(1.0))  // t10 → click at t8
    assert(out(2L) == Some(2.0))  // t20 → click at t15
    assert(out(3L) == None)       // t5 → no prior click
  }

  test("equal timestamps match inclusively (right <= left)") {
    val left = Seq((1L, 100L, t(10), 5.0)).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((901L, 100L, t(10), 9.0)).toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.join(left, right, Seq("user_id"), "ts", Seq("value"),
      tieBreak = Some("event_id")).collect()
    assert(out(0).getDouble(4) == 9.0)
  }

  test("keys are isolated: no bleed across users") {
    val left = Seq((1L, 100L, t(10), 5.0), (2L, 200L, t(10), 6.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((901L, 100L, t(5), 1.0)).toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.join(left, right, Seq("user_id"), "ts", Seq("value"),
      tieBreak = Some("event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(1L) == Some(1.0))
    assert(out(2L) == None)
  }

  test("tie among right rows at the same timestamp: latest tieBreak wins") {
    val left = Seq((1L, 100L, t(10), 5.0)).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((901L, 100L, t(8), 1.0), (902L, 100L, t(8), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.join(left, right, Seq("user_id"), "ts", Seq("value"),
      tieBreak = Some("event_id")).collect()
    assert(out(0).getDouble(4) == 2.0)
  }

  test("carried values all come from the same right row, even with nulls") {
    val left = Seq((1L, 100L, t(10), 5.0)).toDF("event_id", "user_id", "ts", "value")
    // latest right row has a NULL value; its event_id must still win,
    // and the null must NOT be patched from the older row
    val right = Seq(
      (901L, 100L, t(5), Some(1.0)),
      (902L, 100L, t(8), Option.empty[Double]))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.join(left, right, Seq("user_id"), "ts",
      rightValues = Seq("value", "event_id"), tieBreak = Some("event_id")).head()
    assert(out.isNullAt(4), "null value of the matching row must be preserved")
    assert(out.getLong(5) == 902L)
  }

  test("right rows with null timestamps are ignored") {
    val left = Seq((1L, 100L, t(10), 5.0)).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((901L, 100L, Option.empty[Timestamp], 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.join(left, right, Seq("user_id"), "ts", Seq("value"),
      tieBreak = Some("event_id")).head()
    assert(out.isNullAt(4), "timeless right row must not match")
  }

  test("multiple carried right columns") {
    val left = Seq((1L, 100L, t(10), 5.0)).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((901L, 100L, t(8), 1.0)).toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.join(left, right, Seq("user_id"), "ts",
      rightValues = Seq("value", "event_id"), tieBreak = Some("event_id")).head()
    assert(out.getDouble(4) == 1.0)
    assert(out.getLong(5) == 901L)
  }
}
