package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca
import graft.sources.Tables

/** PCA specs: driver-side eigen solver against known decompositions,
  * distributed fit against hand-computed covariance, and the
  * model-level invariants (orthonormality, descending variance,
  * rotation-invariant distances) that carry correctness for the
  * rows-only driver keys.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("symEigen recovers a known symmetric decomposition") {
    // A = [[2, 1], [1, 2]] → eigenvalues 3, 1; eigenvectors along
    // (1,1)/√2 and (1,−1)/√2
    val (vals, vecs) = Pca.symEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12,
      s"eigenvalues: ${vals.toSeq}")
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(vecs(0)(0)) - inv) < 1e-9 &&
      math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-9, s"v0: ${vecs(0).toSeq}")
    assert(math.abs(vecs(1)(0) + vecs(1)(1)) < 1e-9, s"v1: ${vecs(1).toSeq}")
  }

  test("fit finds the dominant direction of a line-plus-noise cloud") {
    // points along (3, 4)/5 with tiny orthogonal jitter: the first
    // component must align with the line, and the explained-variance
    // split must be extreme
    val pts = (-50 to 50).map { i =>
      val t = i.toDouble
      (i.toLong + 100L,
        Array((0.6 * t + 0.001 * (i % 3)).toFloat,
          (0.8 * t - 0.00075 * (i % 3)).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val m = Pca.fit(df, dim = 2, k = 2)
    val c0 = m.components(0).map(_.toDouble)
    val align = math.abs(c0(0) * 0.6 + c0(1) * 0.8)
    assert(align > 0.999, s"first component off the line: ${c0.toSeq}")
    assert(m.explainedVariance(0) > 1000 * m.explainedVariance(1),
      s"variance split: ${m.explainedVariance.toSeq}")
    assert(m.explainedVariance(0) <= m.totalVariance + 1e-9)
  }

  test("components are orthonormal on the driver testdata") {
    val m = Pca.fit(Tables.embeddings(spark, "/root/testdata/sf0.001"), k = 16)
    val comps = m.components.map(_.map(_.toDouble))
    for (i <- comps.indices; j <- i until comps.length) {
      val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-5, s"<c$i, c$j> = $dot")
    }
    // variance is non-increasing and non-negative
    val ev = m.explainedVariance
    assert(ev.zip(ev.drop(1)).forall { case (a, b) => a >= b - 1e-12 },
      s"explained variance not sorted: ${ev.toSeq}")
    assert(ev.forall(_ >= -1e-9))
  }

  test("full-rank projection preserves pairwise distances (pure rotation)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 20)
    val m = Pca.fit(e, k = 64)
    val raw = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = Pca.project(e, m).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ids = raw.keys.toSeq.sorted.take(10)
    for (i <- ids; j <- ids if i < j) {
      val dr = d(raw(i), raw(j)); val dp = d(proj(i), proj(j))
      assert(math.abs(dr - dp) < 1e-3 * math.max(dr, 1.0),
        s"distance distorted for ($i, $j): raw $dr vs projected $dp")
    }
  }

  test("pcaTopK returns k neighbors per query, self excluded") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val res = Pca.pcaTopK(e, e.filter(col("vec_id") % 100 === 0), k = 5,
      pcaDims = 32, rerank = 8).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 5), "k rows per query")
    assert(res.forall(r => r.getLong(0) != r.getLong(1)), "self excluded")
  }

  test("PcaFrozen: the published artifact matches a live refit (sign-aligned)") {
    // the frozen-model convention's drift guard (r16): the committed
    // PcaFrozen literals must be the float-snap of what Pca.fit
    // produces TODAY on the reference corpus — a fit-code or
    // testdata change without a PcaFreezeMain re-run fails here, not
    // in a silent oracle divergence. Eigenvector sign is arbitrary
    // and partial-merge order shifts the Gram sums ~1 ulp, so the
    // compare is |dot| ≈ 1 per eigenpair (plus mean/eigenvalue
    // tolerance), not bit equality.
    import graft.operators.PcaFrozen
    val refit = Pca.fit(
      Tables.embeddings(spark, "/root/testdata/sf0.1"), dim = 64, k = 32)
    refit.mean.zip(PcaFrozen.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"mean drift: $a vs $b") }
    refit.explainedVariance.zip(PcaFrozen.explainedVariance).foreach {
      case (a, b) => assert(math.abs(a - b) < 1e-6 * (1.0 + math.abs(b)),
        s"eigenvalue drift: $a vs $b") }
    refit.components.zip(PcaFrozen.components).zipWithIndex.foreach {
      case ((a, b), j) =>
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        assert(math.abs(math.abs(dot) - 1.0) < 1e-6,
          s"component $j drifted from the artifact: |dot| = ${math.abs(dot)}")
    }
    assert(math.abs(refit.totalVariance - PcaFrozen.totalVariance) <
      1e-6 * (1.0 + PcaFrozen.totalVariance), "total variance drift")
  }
}
