package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property check of the shared connected-components closure
  * ([[Dedup.dedupGroups]] — under five oracled driver keys plus the
  * SemDeDup/blob groups) against a local union-find reference, on
  * shapes the testdata never produces:
  *
  *  - a LONG PATH (diameter 150): pure one-hop min-label needs 150
  *    rounds and would trip the runaway guard; pointer doubling
  *    closes it in O(log d) — this case is what keeps the guard an
  *    impossibility check instead of a live limit
  *  - random sparse graphs (many small components, the dedup shape)
  *  - random denser graphs (merging components, cycles)
  */
class DedupGroupsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // full path compression, then the root IS the min member id
    // (merges always point the larger root at the smaller)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val docs = (0L until n.toLong).toDF("doc_id")
    val pairs = edges.toDF("id_a", "id_b")
    Dedup.dedupGroups(docs, pairs)
      .select(col("doc_id"), col("group_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 150-long chain closes to one component (log-round doubling)") {
    val n = 151
    val edges = (0 until 150).map(i => (i.toLong, i.toLong + 1))
    val got = run(n, edges)
    assert(got.values.toSet == Set(0L),
      s"chain must collapse to min-id 0, got labels ${got.values.toSet}")
  }

  test("random graphs match union-find (sparse and dense)") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 6) {
      val n = 120
      val nEdges = if (round % 2 == 0) 40 else 160 // sparse | dense
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      val got = run(n, edges)
      val want = unionFind(n, edges)
      assert(got == want, s"round $round (${edges.size} edges): " +
        s"${got.toSet.diff(want.toSet).take(5)} vs union-find")
    }
  }
}
