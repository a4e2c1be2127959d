package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LEARNED quality filter — the DCLM/fastText production pattern
  * (train a cheap linear classifier to mimic an expensive composite
  * gate, then run the classifier at corpus scale) as a fully
  * deterministic, oracle-checked Spark operator pair:
  *
  *  - [[trainDf]]: full-batch logistic-regression gradient descent
  *    over per-document features, the label being the C4-style
  *    quality gate itself (distillation: the linear model learns to
  *    approximate the gate from the same cheap signals).
  *  - [[score]]: the trained weights applied per document — score,
  *    hard prediction, gate label, agreement flag.
  *
  * Determinism design (the kmeans-centroid convention): features are
  * RATIONALS of exact integer counters (bit-identical cross-engine),
  * weights are FLOAT-narrowed after every gradient step — the
  * gradient sums are the only order-dependent float folds in the
  * loop, their cross-engine noise is ~1e-12 relative while the float
  * grid is ~1e-7, so narrowing snaps both engines to identical
  * weights and the unrolled-iteration DuckDB oracle replays training
  * bit-for-bit. The hard prediction cuts on the EXACT margin
  * (margin ≥ 0 ⇔ sigmoid ≥ ½ — no transcendental in the discrete
  * output), so `predicted`/`correct` are bit-stable; only the
  * emitted sigmoid score carries last-ulp exp() noise (rtol class).
  *
  * 100 TB shape: training is `iters` partial-agg-friendly full scans
  * producing ONE 5-float row each (the model state never exceeds a
  * driver scalar); scoring is a stateless projection — the shape
  * that makes fastText-style filtering the default pre-filter for
  * web-scale corpora.
  */
object QualityLr {

  val FeatureNames: Seq[String] =
    Seq("bias", "len_norm", "punct_ratio", "stopword_ratio",
      "avg_token_len_norm")

  /** Per-doc feature vector + gate label, all exact-rational doubles:
    * x0 bias, x1 = min(n_tokens,128)/128 (exact: /2^7), x2 punct
    * ratio, x3 stopword ratio, x4 mean token length / 10; y = the
    * C4-style gate (token bounds + composite score ≥ 0.2). */
  def featureLabel(docs: DataFrame): DataFrame =
    TextAnalysis.stats(docs).select(col("doc_id"),
      lit(1.0).as("x0"),
      (least(col("n_tokens"), lit(128L)) / 128.0).as("x1"),
      col("punct_ratio").as("x2"),
      col("stopword_ratio").as("x3"),
      (col("avg_token_len") / 10.0).as("x4"),
      when(col("n_tokens") >= 20L && col("n_tokens") <= 100000L &&
        col("quality_score") >= 0.2, 1.0).otherwise(0.0).as("y"))

  private val nF = 5

  private def marginOf(w: Array[Float]): Column =
    (0 until nF).map(j => lit(w(j).toDouble) * col(s"x$j"))
      .reduce(_ + _)

  /** Full-batch GD, float-snapped per step: w ← f32(w − lr·f32(∇)),
    * ∇_j = Σ(σ(w·x) − y)·x_j / n. `lr` defaults to a power of two so
    * the very first step (σ ≡ ½ at w₀ = 0) is exact in both engines
    * even before narrowing. Driver cost: `iters` rows of `nF`
    * doubles — O(iters) scalars, the bounded-collect class. */
  def trainWeights(docs: DataFrame, iters: Int = 3,
                   lr: Double = 2.0): Array[Float] = {
    // consumed once per iteration — pin or the tokenization re-runs
    val f = featureLabel(docs).localCheckpoint(true)
    var w = Array.fill(nF)(0.0f)
    for (_ <- 0 until iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-marginOf(w)))
      val g = f.select((0 until nF).map(j =>
        (sum((p - col("y")) * col(s"x$j")) / count(lit(1)))
          .as(s"g$j")): _*).head()
      w = Array.tabulate(nF)(j =>
        (w(j).toDouble - lr * g.getDouble(j).toFloat.toDouble).toFloat)
    }
    w
  }

  /** The trained model as a relation: (feature_idx, feature, weight)
    * — the artifact a nightly pipeline persists and the score pass
    * broadcasts. Weights are float-exact doubles. */
  def trainDf(docs: DataFrame, iters: Int = 3, lr: Double = 2.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainWeights(docs, iters, lr).zipWithIndex
      .map { case (w, j) => (j, FeatureNames(j), w.toDouble) }.toSeq
      .toDF("feature_idx", "feature", "weight")
  }

  /** Per-doc readout of the trained filter: sigmoid score (1e-6
    * rounded — the only last-ulp column), hard prediction on the
    * EXACT margin, the gate label, and the agreement flag. The
    * disagreement rows are the interesting ones: a linear model
    * cannot represent the gate's AND-of-thresholds exactly, so
    * `correct = false` marks where the cheap filter and the full
    * gate would route a document differently. */
  def score(docs: DataFrame, iters: Int = 3, lr: Double = 2.0): DataFrame = {
    val w = trainWeights(docs, iters, lr)
    featureLabel(docs)
      .withColumn("margin", marginOf(w))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 6).as("score"),
        (col("margin") >= 0.0).as("predicted"),
        (col("y") === 1.0).as("label"),
        ((col("margin") >= 0.0) === (col("y") === 1.0)).as("correct"))
  }
}
