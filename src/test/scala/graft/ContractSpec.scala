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

  test("rows-only queries are down to ZERO (r17)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // The graduation history: r10 took the minhash/LSH + IVF
    // families via hash-replay decompositions; r16 took the sketch
    // family via calibration booleans (exact anchors +
    // each-engine's-own-sketch-within-tol) and the PCA pair via the
    // frozen-model artifact; r17 closed the set with
    // text_compression_signal — zlib has no DuckDB twin, but the
    // calibration pattern doesn't need one (lined-corpus anchors +
    // deflate-format-feasibility band + planted-copy
    // back-reference claim, docs/ORACLE_NOTES.md r17).
    assert(rowsOnly.isEmpty,
      s"every key must carry an oracle now: $rowsOnly")
  }
}
