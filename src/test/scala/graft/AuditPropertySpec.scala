package graft

import graft.operators.{Analytics, DataSplit, RetailEtl}

/** Randomized (seeded, reproducible) checks of the r9 audit and
  * time-series operators against naive in-memory references —
  * the regime where quota edge cases, window-boundary off-by-ones
  * and island splits actually show up.
  */
class AuditPropertySpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSplit: exact floor quotas and total partition for random weights") {
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 4) {
      // random stratum sizes incl. tiny ones (the case hash splits lose)
      val sizes = Seq.fill(4)(1 + rnd.nextInt(40))
      val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map(i => (s * 1000L + i, s"src$s")) }
        .toDF("doc_id", "source")
      // random 3-way weights normalized to sum 1 exactly (last takes
      // the remainder, mirroring how callers construct them)
      val a = (1 + rnd.nextInt(7)) / 10.0
      val b = (1 + rnd.nextInt(math.max(1, 8 - (a * 10).toInt))) / 10.0
      val weights = Seq("w1" -> a, "w2" -> b, "w3" -> (1.0 - a - b))
      val got = DataSplit.stratifiedSplit(docs, "doc_id", "source", weights)
        .collect().map(r => (r.getString(1), r.getString(2)))
      assert(got.length == sizes.sum, s"round $round: every doc assigned once")
      val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      sizes.zipWithIndex.foreach { case (n, s) =>
        val bySplit = got.filter(_._1 == s"src$s").groupBy(_._2)
          .map { case (k, v) => k -> v.length }
        val quotas = cuts.map(c => math.floor(c * n).toLong)
        val want = weights.map(_._1).zip(
          quotas.zip(0L +: quotas.init).map { case (hi, lo) => (hi - lo).toInt })
          .filter(_._2 > 0).toMap
        assert(bySplit == want,
          s"round $round src$s (n=$n, w=$weights): got $bySplit want $want")
      }
    }
  }

  test("rollingActiveUsers equals the brute-force window count on random activity") {
    val rnd = new scala.util.Random(17)
    for (round <- 1 to 3) {
      val events = Seq.fill(150)((
        s"u${rnd.nextInt(12)}",
        f"1995-01-${1 + rnd.nextInt(20)}%02d ${rnd.nextInt(24)}%02d:00:00"))
      val df = events.toDF("user_id", "t")
        .select($"user_id", $"t".cast("timestamp").as("ts"))
      val got = Analytics.rollingActiveUsers(df).collect()
        .map(r => r.getDate(0).toString ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val byDay = events.map { case (u, t) => (u, t.substring(0, 10)) }.distinct
      val days = byDay.map(_._2).distinct
      val want = days.map { d =>
        val dayNum = d.substring(8, 10).toInt
        val window = (dayNum - 6 to dayNum).map(x => f"1995-01-$x%02d").toSet
        d -> ((byDay.filter(p => window(p._2)).map(_._1).distinct.length.toLong,
          byDay.filter(_._2 == d).map(_._1).distinct.length.toLong))
      }.toMap
      assert(got == want, s"round $round: got $got want $want")
    }
  }

  test("purchaseStreaks equals the naive run-length reference on random months") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 4) {
      val orders = Seq.fill(120)((
        rnd.nextInt(8).toLong,
        f"${1994 + rnd.nextInt(3)}%04d-${1 + rnd.nextInt(12)}%02d-15"))
      val df = orders.toDF("o_custkey", "d")
        .select($"o_custkey", $"d".cast("date").as("o_orderdate"))
      val got = Analytics.purchaseStreaks(df).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val want = orders.groupBy(_._1).map { case (c, os) =>
        val months = os.map { case (_, d) =>
          d.substring(0, 4).toInt * 12 + d.substring(5, 7).toInt - 1 }
          .distinct.sorted
        val runs = months.foldLeft(List.empty[List[Int]]) {
          case (acc @ (run :: rest), m) if run.head == m - 1 => (m :: run) :: rest
          case (acc, m) => List(m) :: acc
        }
        c -> ((months.length.toLong, runs.length.toLong,
          runs.map(_.length).max.toLong))
      }
      assert(got == want, s"round $round: got $got want $want")
    }
  }

  test("fdAudit violation counts equal the naive group census on random pairs") {
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(4).toLong))
    val df = rows.toDF("k", "v")
    val r = RetailEtl.fdAudit(df, Seq(("kv", Seq("k"), "v"))).collect().head
    val byK = rows.groupBy(_._1).map { case (_, vs) => vs.map(_._2).distinct.size }
    assert(r.getLong(1) == byK.size.toLong, "n_keys")
    assert(r.getLong(2) == byK.count(_ > 1).toLong, "n_violating_keys")
    assert(r.getLong(4) == byK.max.toLong, "max_variants")
  }
}
