package graft

import java.sql.Timestamp

import graft.operators.AsOf

/** Randomized (seeded, reproducible) check of the as-of join: on
  * arbitrary generated inputs, the union+window encoding must equal
  * a naive per-key reference ("latest right row with time ≤ left
  * time, ties by largest tie-break id"). Random keys/times/ties
  * exercise orderings the crafted AsOfSpec rows can't enumerate;
  * small domains make key/time/tie collisions common on purpose.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  private def naive(left: Seq[(Long, Int, Double)],
                    right: Seq[(Long, Long, Int, Double)]): Seq[Option[Double]] =
    left.map { case (k, sec, _) =>
      val candidates = right.filter(r => r._2 == k && r._3 <= sec)
      if (candidates.isEmpty) None
      else Some(candidates.maxBy(r => (r._3, r._1))._4) // latest ts, then largest tie id
    }

  test("as-of join equals the naive reference on random inputs") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 8) {
      val leftRows = Seq.fill(25)(
        (rnd.nextLong(4), rnd.nextInt(21), rnd.nextInt(1000).toDouble))
      val rightRows = Seq.tabulate(25)(i =>
        (900L + i, rnd.nextLong(4), rnd.nextInt(21), rnd.nextInt(1000).toDouble))
      val left = leftRows.zipWithIndex
        .map { case ((k, sec, v), i) => (i.toLong, k, ts(sec), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val right = rightRows.map { case (id, k, sec, v) => (id, k, ts(sec), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val got = AsOf.join(left, right, Seq("user_id"), "ts",
        rightValues = Seq("value"), tieBreak = Some("event_id"))
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double]))
        .toMap
      val want = naive(leftRows, rightRows)
      leftRows.indices.foreach { i =>
        assert(got(i.toLong) == want(i),
          s"round $round, left row ${leftRows(i)}: got ${got(i.toLong)}, want ${want(i)}")
      }
    }
  }

  test("as-of join never matches null-keyed rows on either side") {
    val left = Seq(
      (1L, Some(7L), ts(10), 1.0),
      (2L, None, ts(10), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (901L, Some(7L), ts(5), 11.0),
      (902L, None, ts(5), 22.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.join(left, right, Seq("user_id"), "ts",
      rightValues = Seq("value"), tieBreak = Some("event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(out(1L) == Some(11.0))
    assert(out(2L).isEmpty, "null-keyed left row must never enrich from null-keyed right rows")
  }
}
