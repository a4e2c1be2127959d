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

  test("rows-only queries are the documented eleven") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set(
      // r10: dedup_minhash_lsh + dedup_lsh_band_stats graduated to
      // full oracles (embedded-permutation HUGEINT replay)
      // r10 second batch: simhash + char-n-gram jaccard replay too
      // r10 third batch: the xxhash64 decomposition graduated the
      // whole IVF pick/probe family and the xxhash64 split twin

      "events_approx_stats", "events_audience_overlap", "events_sketch_reach",
      // r9 additions, each spec-bounded against an exact anchor:
      // LSH SemDeDup closure (DedupRecallSpec), the two approx twins
      // (ApproxSpec error bounds), the persisted-index probes
      // (AnnIndexSpec parity + AnnRecallGateSpec floors)
      "etl_dq_profile_approx",
      "events_user_lifespan_approx",

      // PCA: eigen state is driver-trained, not SQL-expressible —
      // PcaSpec invariants + the recall gate carry correctness
      "emb_pca_project", "ann_pca_topk",
      // zlib has no DuckDB twin; invariants spec-held
      "text_compression_signal",
      // HLL day sketches are error-bounded vs the exact key
      // (ApproxSpec); ann_mmr_diverse graduated to an unrolled-CTE
      // oracle in r10
      "events_rolling_active_approx",
      // live DQ monitor: HLL state per column (ApproxSpec bounds,
      // StreamingSpec cross-batch accumulation)
      "stream_dq_profile",
      // sliding-window HLL actives: ApproxSpec ties each window to
      // the exact rolling-actives key; StreamingSpec drives updates
      "stream_sliding_actives"),
      s"unexpected rows-only set: $rowsOnly")
  }
}
