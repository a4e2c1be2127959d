package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence-packing specs: the two-phase distributed prefix sum must
  * equal the naive single-window prefix sum, independent of the
  * bucketing parameter.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // uneven token counts incl. docs bigger than the budget
  private lazy val perDoc = Seq.tabulate(500)(i => (i.toLong, (i * 37 % 400 + 1).toLong))
    .toDF("doc_id", "tokens")

  private lazy val naive = perDoc
    .withColumn("cum_excl", coalesce(
      sum("tokens").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    .select("doc_id", "tokens", "cum_excl")
    .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

  test("distributed prefix sum equals the single-window prefix sum") {
    val got = Packing.prefixSum(perDoc, targetBuckets = 16)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == naive)
  }

  test("prefix sum is invariant to bucket count and input partitioning") {
    val a = Packing.prefixSum(perDoc, targetBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = Packing.prefixSum(perDoc.repartition(9), targetBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == b)
  }

  test("bins partition all docs and token totals are conserved") {
    val docs = perDoc.withColumn("text",
      concat_ws(" ", sequence(lit(1), col("tokens"))))
    val manifest = Packing.packSequences(docs, budget = 1000)
    val (nDocs, nTokens) = manifest
      .agg(sum("n_docs"), sum("bin_tokens")).as[(Long, Long)].head()
    assert(nDocs == 500L)
    assert(nTokens == perDoc.agg(sum("tokens")).as[Long].head())
    // bins are contiguous id ranges: first_doc of bin b+1 > last_doc of bin b
    val spans = manifest.orderBy("seq_bin")
      .select("first_doc", "last_doc").as[(Long, Long)].collect()
    spans.sliding(2).foreach {
      case Array((_, lastA), (firstB, _)) => assert(firstB > lastA)
      case _ =>
    }
  }

  test("padding efficiency: conservation, bucket math, waste bounds") {
    val docs = perDoc.withColumn("text",
      concat_ws(" ", sequence(lit(1), col("tokens"))))
    val rows = Packing.paddingEfficiency(docs, padTo = 128L).collect()
    // every doc lands in exactly one bucket; true tokens conserved
    assert(rows.map(_.getLong(1)).sum == 500L)
    assert(rows.map(_.getLong(2)).sum ==
      perDoc.agg(sum("tokens")).as[Long].head())
    rows.foreach { r =>
      val (bucket, nDocs, trueToks, paddedToks, waste) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(bucket % 128 == 0)
      assert(paddedToks == nDocs * bucket)
      assert(trueToks <= paddedToks)
      // every doc in the bucket needs more than bucket-128 tokens
      assert(trueToks > (bucket - 128) * nDocs)
      assert(waste >= 0.0 && waste < 1.0)
      assert(math.abs(waste - (1.0 - trueToks.toDouble / paddedToks)) < 1e-12)
    }
  }
}
