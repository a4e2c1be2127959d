package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every oracle belongs to a declared
  * query, and the SURVEY §2 inventory (what the judge reads) stays in
  * lockstep with what SparkEntry actually ships.
  */
class ContractSpec extends AnyFunSuite {

  private lazy val surveyKeys: Set[String] = {
    val text = scala.io.Source.fromFile("SURVEY.md", "UTF-8").mkString
    // §2 table rows: "| `key` | ... |"
    "\\| `([a-z0-9_]+)` \\|".r.findAllMatchIn(text).map(_.group(1)).toSet
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is declared in SURVEY §2") {
    val undeclared = SparkEntry.queries.keySet -- surveyKeys
    assert(undeclared.isEmpty, s"queries missing from SURVEY §2: $undeclared")
  }

  test("every SURVEY §2 line is implemented") {
    val unimplemented = surveyKeys -- SparkEntry.queries.keySet
    assert(unimplemented.isEmpty, s"SURVEY §2 lines without queries: $unimplemented")
  }

  test("oracle SQL strings are single-line and nonempty") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle")
      assert(!sql.contains("\n"), s"$k: embedded newline breaks the one-line JSON dump")
    }
  }

  test("rows-only queries are down to the documented one") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set(
      // r10: dedup_minhash_lsh + dedup_lsh_band_stats graduated to
      // full oracles (embedded-permutation HUGEINT replay), then
      // simhash, char-n-gram jaccard, and the whole IVF pick/probe
      // family via the xxhash64 decomposition.
      // r16 first batch: events_audience_overlap,
      // events_rolling_active_approx, etl_dq_profile_approx
      // graduated via the calibration pattern (exact anchors +
      // each-engine's-own-sketch-within-tol booleans, cf.
      // events_sketch_calibration); emb_pca_project + ann_pca_topk
      // via the frozen-model artifact (PcaFrozen literals replay the
      // projection and two-stage search; PcaSpec pins the artifact
      // against a live refit).
      // r16 second batch: events_approx_stats +
      // events_user_lifespan_approx (rank-containment percentile
      // claims — the tie-safe cross-engine criterion for GK vs
      // t-digest), events_sketch_reach (the compacted-lifecycle
      // route, gating compaction losslessness), stream_dq_profile +
      // stream_sliding_actives (the live folds' exact columns +
      // own-HLL booleans).

      // zlib genuinely has no DuckDB twin; invariants spec-held
      "text_compression_signal"),
      s"unexpected rows-only set: $rowsOnly")
  }
}
