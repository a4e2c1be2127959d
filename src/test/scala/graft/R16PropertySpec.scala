package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution
import graft.sources.Lake

/** Randomized (seeded, reproducible) invariants for the round-16
  * machinery against naive in-memory references: the hot-block cap's
  * subset/bound/determinism laws on skewed corpora, vacuum↔time-
  * travel equivalence on random snapshot manifests, the bench
  * measurement protocol on random attempt streams, and the
  * rank-containment criterion's soundness at true order statistics.
  */
class R16PropertySpec extends SparkSpec {
  import spark.implicits._

  test("capBlocks laws on random skewed corpora: capped pairs are a " +
    "subset, per-block fan-out is bounded, survivors are the smallest ids") {
    val rnd = new scala.util.Random(161)
    for (round <- 1 to 3) {
      // a few hot prefixes + a uniform tail; identical names inside a
      // prefix so every in-block pair matches at lev 0. The block key
      // is the first SIX normalized chars, so the hot-block id must
      // land inside them (f"hot$b%02dx") — a suffix-varied name would
      // collapse every "hot" corpus into ONE block and leave the
      // per-block assertions vacuous for b >= 1 (r16 review finding)
      val hotBlocks = 2 + rnd.nextInt(3)
      val rows = (0 until hotBlocks).flatMap { b =>
        val size = 20 + rnd.nextInt(60)
        (0 until size).map(i =>
          (b * 1000L + i, f"hot$b%02dx-common"))
      } ++ (0 until 30).map(i => (90000L + i, s"tail${i}name"))
      val recs = rnd.shuffle(rows).toDF("rec_id", "raw_name")
      val cap = 5 + rnd.nextInt(12)
      def pairSet(maxBlock: Int) =
        EntityResolution.entityPairs(recs, maxBlock = maxBlock)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val capped = pairSet(cap)
      val full = pairSet(Int.MaxValue)
      assert(capped.subsetOf(full), s"round $round: cap invented a pair")
      // fan-out bound: pairs per block <= C(cap, 2)
      val byBlock = capped.groupBy(_._1 / 1000L)
      byBlock.foreach { case (b, ps) =>
        assert(ps.size <= cap * (cap - 1) / 2,
          s"round $round block $b: ${ps.size} pairs exceed C($cap,2)") }
      // determinism: EVERY hot block must pair (>= 20 identical
      // names against cap <= 16 — a vacuous block means the fixture
      // broke), and its participants are exactly the smallest ids
      (0 until hotBlocks).foreach { b =>
        val ids = capped.filter(_._1 / 1000L == b)
          .flatMap(p => Seq(p._1, p._2))
        assert(ids == (0 until cap).map(b * 1000L + _).toSet,
          s"round $round block $b: survivor subset not the min ids " +
            s"(${ids.size} participants)")
      }
    }
  }

  test("vacuum + time travel on random manifests: kept+reclaimed " +
    "conservation, and every in-window as-of read is vacuum-invariant") {
    val rnd = new scala.util.Random(162)
    for (round <- 1 to 4) {
      val current = 6L + rnd.nextInt(6)
      val retain = rnd.nextInt(4).toLong
      val mf = (0 until 120).map { i =>
        val created = rnd.nextInt(current.toInt).toLong
        val removed =
          if (rnd.nextBoolean()) None
          else Some(created + 1 + rnd.nextInt(6).toLong)
        ("p" + rnd.nextInt(3), i.toLong, 10L + rnd.nextInt(500),
          created, removed)
      }.toDF("part", "file_id", "bytes", "created_snap", "removed_snap")
        .localCheckpoint(true)
      val plan = Lake.vacuumPlan(mf, current, retain)
      val vac = Lake.vacuumApply(mf, current, retain).localCheckpoint(true)
      val kept = vac.agg(sum("bytes")).first().getLong(0)
      val reclaimed = plan.agg(sum("reclaim_bytes")).first().getLong(0)
      assert(kept + reclaimed === mf.agg(sum("bytes")).first().getLong(0),
        s"round $round: conservation broke")
      def files(df: org.apache.spark.sql.DataFrame, snap: Long) =
        Lake.timeTravelRead(df, snap, current, retain)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      ((current - retain) to current).foreach { snap =>
        assert(files(vac, snap) === files(mf, snap),
          s"round $round: as-of $snap differs post-vacuum " +
            s"(current $current retain $retain)")
      }
      // below-horizon reads refuse (when a below-horizon snap exists)
      if (current - retain > 0)
        intercept[IllegalArgumentException] {
          Lake.timeTravelRead(vac, current - retain - 1, current, retain)
        }
    }
  }

  test("measureKey on random attempt streams: ships the min valid " +
    "attempt, never retries a failed first/second run, caps at 4") {
    val rnd = new scala.util.Random(163)
    for (_ <- 1 to 200) {
      val bm = 1.0
      // scripted attempts: occasional failures (-1), values around the band
      def draw(): Double =
        if (rnd.nextInt(8) == 0) -1.0 else 0.5 + rnd.nextDouble() * 4.0
      val script = Vector.fill(8)(draw())
      val it = script.iterator
      var consumed = 0
      def next(): Double = { consumed += 1; it.next() }
      val (shipped, attempts) = Bench.measureKey(next _, next _, bm)
      assert(attempts === script.take(consumed), "attempt trail mismatch")
      assert(attempts.size <= 4, s"cap broke: $attempts")
      if (attempts.head < 0) {
        assert(shipped === -1.0 && attempts.size === 1)
      } else if (attempts.size >= 2 && attempts(1) < 0) {
        assert(shipped === -1.0 && attempts.size === 2)
      } else {
        val valid = attempts.filter(_ >= 0)
        assert(valid.nonEmpty && shipped === valid.min,
          s"shipped $shipped != min valid of $attempts")
        // the loop only continues while the running min is over band
        // and fewer than 4 attempts are in hand
        if (attempts.size < 4 && attempts.last >= 0)
          assert(attempts.min <= 2 * bm,
            s"stopped early while over band: $attempts")
      }
    }
  }

  test("rank containment is sound at true order statistics for any " +
    "random discrete multiset (eps >= 1/n)") {
    val rnd = new scala.util.Random(164)
    for (_ <- 1 to 100) {
      val n = 20 + rnd.nextInt(200)
      // heavy ties on purpose: values from a tiny alphabet
      val xs = Vector.fill(n)(rnd.nextInt(6).toDouble).sorted
      val eps = 1.0 / n + 1e-12
      for (q <- Seq(0.5, 0.9, 0.99)) {
        // the lower q-order statistic: smallest v with frac(<= v) >= q
        val v = xs(math.min(n - 1, math.max(0, math.ceil(q * n).toInt - 1)))
        val lt = xs.count(_ < v).toDouble / n
        val le = xs.count(_ <= v).toDouble / n
        assert(lt <= q + eps && le >= q - eps,
          s"containment failed at q=$q for n=$n: lt=$lt le=$le v=$v")
      }
    }
  }
}
