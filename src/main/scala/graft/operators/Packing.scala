package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing (SURVEY.md §2.E): assign documents, in
  * deterministic doc_id order, to fixed-token-budget bins — the
  * "concatenate-and-chunk" layout LLM training shards use. A doc's
  * bin is `floor(exclusive-prefix-sum(tokens) / budget)`.
  *
  * The interesting part at 100 TB is the GLOBAL ordered prefix sum.
  * A bare `Window.orderBy(doc_id)` funnels the entire corpus through
  * one task; instead this uses the classic two-phase form:
  *
  *  1. bucket rows by an explicit id range (`doc_id div width`) —
  *     a pure projection, no sampling, so the bucketing is
  *     deterministic and identical across jobs/retries;
  *  2. per-bucket token totals (tiny: one row per bucket) are
  *     collected, turned into exclusive per-bucket offsets, and
  *     broadcast back;
  *  3. the within-bucket prefix sum runs as a per-bucket window —
  *     all buckets in parallel — and adds the bucket's offset.
  *
  * Bucket width is derived from max(doc_id) (a parquet-stats-only
  * scan) so the bucket count stays O(targetBuckets) at any corpus
  * size — the driver-side collect in step 2 never grows with data.
  */
object Packing {

  /** (doc_id, tokens) with whitespace tokenization — same tokenizer
    * as [[TextAnalysis.tokens]] so packing and token stats agree. */
  def tokensPerDoc(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("tokens"))

  /** Exclusive global prefix sum of `tokens` in doc_id order, as
    * (doc_id, tokens, cum_excl). */
  def prefixSum(perDoc: DataFrame, targetBuckets: Int = 256): DataFrame = {
    val spark = perDoc.sparkSession
    import spark.implicits._

    val maxId = perDoc.agg(max("doc_id")).as[Option[Long]].head().getOrElse(0L)
    val width = math.max(maxId / math.max(targetBuckets, 1) + 1, 1L)
    val bucketed = perDoc.withColumn("bucket", expr(s"doc_id div ${width}L"))

    // per-bucket totals → exclusive offsets (driver-side, O(targetBuckets))
    val totals = bucketed.groupBy("bucket").agg(sum("tokens").as("btokens"))
      .as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    val exclusive = totals.map { case (b, t) => val off = acc; acc += t; (b, off) }
    val offsetsDf = spark.createDataFrame(exclusive.toSeq).toDF("bucket", "bucket_offset")

    val inBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsetsDf), Seq("bucket"))
      .withColumn("cum_excl",
        col("bucket_offset") + coalesce(sum("tokens").over(inBucket), lit(0L)))
      .select("doc_id", "tokens", "cum_excl")
  }

  /** Per-document bin assignment: (doc_id, tokens, seq_bin). */
  def assignBins(docs: DataFrame, budget: Long = 2048,
                 targetBuckets: Int = 256): DataFrame =
    prefixSum(tokensPerDoc(docs), targetBuckets)
      .withColumn("seq_bin", expr(s"cum_excl div ${budget}L"))
      .select("doc_id", "tokens", "seq_bin")

  /** Bin-level manifest: docs per bin, token fill, id span — what a
    * shard writer consumes. */
  def packSequences(docs: DataFrame, budget: Long = 2048,
                    targetBuckets: Int = 256): DataFrame =
    assignBins(docs, budget, targetBuckets)
      .groupBy("seq_bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tokens").as("bin_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))

  /** Padding-efficiency report for naive pad-to-multiple batching —
    * the "what NOT packing costs" manifest: each doc padded up to the
    * next multiple of `padTo` tokens; per padded length, doc count,
    * true token total, padded token total, and the wasted fraction.
    * Pure integer bucket arithmetic feeding a |buckets|-row
    * aggregate — fully partial-agg friendly, one tiny shuffle. Read
    * next to [[packSequences]]: the gap between `padded_tokens` here
    * and the packed bins' fill there is the compute packing saves.
    */
  def paddingEfficiency(docs: DataFrame, padTo: Long = 128L): DataFrame =
    tokensPerDoc(docs)
      .withColumn("padded_len",
        expr(s"((tokens + ${padTo - 1}L) div ${padTo}L) * ${padTo}L"))
      .groupBy("padded_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tokens").as("true_tokens"))
      .select(col("padded_len"), col("n_docs"), col("true_tokens"),
        (col("n_docs") * col("padded_len")).as("padded_tokens"),
        when(col("padded_len") === 0L, lit(0.0))
          .otherwise(lit(1.0) -
            col("true_tokens") / (col("n_docs") * col("padded_len")))
          .as("waste_frac"))
}
