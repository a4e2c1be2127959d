package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityLr

/** Learned-quality-filter specs: training determinism under
  * re-partitioning (the float-snap claim), usefulness of the learned
  * model, and the exact-margin prediction contract. */
class QualityLrSpec extends SparkSpec {
  import spark.implicits._

  private val docs =
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  test("training is partition-invariant: float narrowing snaps the gradient sums") {
    // the determinism design under the oracle: gradient sums are the
    // only order-dependent folds, and float narrowing must absorb
    // their re-partitioning noise — different partition counts fold
    // the sums in different orders, yet the weights must be
    // bit-identical
    val w1 = QualityLr.trainWeights(docs.repartition(1))
    val w32 = QualityLr.trainWeights(docs.repartition(32))
    assert(w1.toSeq == w32.toSeq,
      s"weights must not depend on partitioning:\n${w1.toSeq}\nvs\n${w32.toSeq}")
    assert(w1.exists(_ != 0.0f), "training must move the weights")
  }

  test("the distilled filter beats the majority-class baseline and learns the gate's direction") {
    val rows = QualityLr.score(docs).collect()
      .map(r => (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    val n = rows.length
    val acc = rows.count(_._3).toDouble / n
    val prior = math.max(rows.count(_._2), n - rows.count(_._2)).toDouble / n
    assert(rows.map(_._2).distinct.length == 2,
      "fixture must contain both gate classes")
    assert(acc >= prior,
      f"3-iteration accuracy $acc%.3f must not lose to the prior $prior%.3f")
    // direction: stopword ratio raises the gate's composite score, so
    // its learned weight must be positive; the bias alone can't do it
    val w = QualityLr.trainWeights(docs)
    assert(w(3) > 0.0f, s"stopword_ratio weight must be positive: ${w.toSeq}")
  }

  test("stream gate over MemoryStream reproduces the batch score, zero state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val w = QualityLr.trainWeights(docs)
    val batch = QualityLr.score(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    val mem = MemoryStream[StreamingSpec.Doc]
    val q = graft.streaming.DocStream.qualityLrGate(mem.toDF(), w)
      .writeStream.format("memory").queryName("lr_gate_test")
      .outputMode("append").start()
    try {
      val rows = docs.collect()
        .map(r => StreamingSpec.Doc(r.getLong(0), r.getString(1)))
      mem.addData(rows.take(rows.length / 2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2): _*)
      q.processAllAvailable()
      val streamed = spark.table("lr_gate_test").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
          r.getBoolean(3), r.getBoolean(4))).toSet
      assert(streamed == batch,
        s"stream must reproduce the batch score rows: ${streamed.size} vs ${batch.size}")
      val ops = q.lastProgress.stateOperators
      assert(ops == null || ops.isEmpty || ops.forall(_.numRowsTotal == 0),
        "the gate must keep zero state")
    } finally q.stop()
  }

  test("prediction cuts on the exact margin: predicted == (score >= 0.5) everywhere") {
    // the discrete output must agree with the rounded score's cut at
    // every non-boundary row (margin >= 0 <=> sigmoid >= 0.5), which
    // is what makes `predicted` bit-stable while `score` is rtol-class
    val bad = QualityLr.score(docs)
      .filter((col("score") >= 0.5) =!= col("predicted"))
      // rounding can pull a barely-negative margin's score UP to
      // exactly 0.500000 — the one legitimate disagreement window
      .filter(col("score") =!= 0.5)
      .count()
    assert(bad == 0L, s"$bad rows disagree between margin and score cut")
  }
}
