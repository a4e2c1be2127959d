package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.gf

/** Persisted dedup FINGERPRINT store — the layout that makes daily
  * incremental dedup O(batch), not O(corpus): one row per document
  * holding only its canonical-text md5 (exact identity) and minhash
  * signature (near-dup banding key). Text is never stored and the
  * historical corpus is never re-tokenized — the nightly job appends
  * one batch of fingerprint rows, and tomorrow's dedup joins against
  * fingerprints alone. Corpus TEXT is read again only for the
  * candidate ids a band join actually surfaces (a tiny, targeted
  * semi-join — the verification contract at 100 TB).
  *
  * This is the dedup twin of [[AnnIndex]]: the search structure is
  * the physical layout, nothing more, and everything derived is a
  * pure deterministic function of the text — so the store-based
  * paths are EXACTLY equal to recomputing from text (spec-held),
  * just without the history scan.
  */
object DedupStore {

  val DefaultPerms = 64
  val DefaultSeed = 42L

  /** The store row shape: (doc_id, norm_md5, sig). Pure per-doc
    * projection — no shuffle, safe to run inside any ingest job. */
  def fingerprintRows(docs: DataFrame, shingleSize: Int = 3,
                      numPerms: Int = DefaultPerms,
                      seed: Long = DefaultSeed): DataFrame =
    docs.select(
      col("doc_id"),
      md5(TextAnalysis.canonical(col("text"))).as("norm_md5"),
      gf.minhashSignature(
        array_distinct(gf.tokenShingleHashes(col("text"), shingleSize)),
        numPerms, seed).as("sig"))

  /** Builder and maintenance take the SAME fingerprint parameters as
    * the query side: a store built with one shingle/signature shape
    * and banded with another would silently collide on (almost)
    * nothing — recall collapse, no error — so the parameters travel
    * together everywhere.
    *
    * All three writers (build, [[append]], and the streaming
    * [[graft.streaming.StreamingLoad.fingerprintStoreSink]]) emit
    * the SAME `batch_id`-partitioned layout, so one store path can
    * be batch-built, nightly-appended and stream-maintained
    * interchangeably — mixing a partitioned and an unpartitioned
    * writer on one path would fail parquet partition discovery.
    * Convention: negative ids are "unversioned" batch writes; the
    * streaming sink's micro-batch ids are ≥ 0 and never collide
    * with them. */
  def build(docs: DataFrame, path: String, shingleSize: Int = 3,
            numPerms: Int = DefaultPerms, seed: Long = DefaultSeed,
            batchId: Long = -1L): Unit =
    fingerprintRows(docs, shingleSize, numPerms, seed)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").partitionBy("batch_id").parquet(path)

  /** Nightly maintenance: append one batch's fingerprints (must use
    * the build-time parameters). Pass a stable per-run `batchId`
    * (e.g. the run date as yyyyMMdd) and a re-run becomes
    * idempotent — it overwrites its OWN partition, the same replay
    * contract as the streaming sink; the default -1 is a plain
    * append into the shared unversioned partition (no replay
    * protection). */
  def append(newDocs: DataFrame, path: String, shingleSize: Int = 3,
             numPerms: Int = DefaultPerms, seed: Long = DefaultSeed,
             batchId: Long = -1L): Unit = {
    val rows = fingerprintRows(newDocs, shingleSize, numPerms, seed)
      .withColumn("batch_id", lit(batchId))
    if (batchId >= 0L)
      rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(path)
    else rows.write.mode("append").partitionBy("batch_id").parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental EXACT dedup against the store: new docs whose
    * canonical text has never been seen. The corpus side is
    * fingerprints only — an anti-join on 32-hex strings, no history
    * text, no history tokenization. Result-identical to
    * [[Dedup.incrementalExact]] (md5 of the same canonical form).
    */
  def incrementalExact(newDocs: DataFrame, store: DataFrame): DataFrame =
    newDocs
      .withColumn("norm_md5", md5(TextAnalysis.canonical(col("text"))))
      .join(store.select("norm_md5").distinct(), Seq("norm_md5"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars")

  /** LSH band keys from a signature column — the same banding as
    * [[Dedup]]'s in-memory minhash path (the raw signature slice,
    * r10 — see Dedup.bandedKeys), exposed for store-side joins. */
  private def bandKeys(sigs: DataFrame, bands: Int): DataFrame = {
    val rowsPerBand = ceil(size(col("sig")) / lit(bands)).cast("int")
    sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
  }

  /** Incremental NEAR-dup pairs, new batch × stored corpus, with the
    * history side driven ENTIRELY by stored signatures:
    *
    *  1. band keys of the new batch (computed) join band keys of the
    *     store (persisted) — only new×corpus collisions survive, the
    *     corpus never pairs with itself;
    *  2. per-bucket fan-out is capped (deterministic smallest-id
    *     subset, same documented loss as every banded path);
    *  3. exact-Jaccard verification re-reads text for the CANDIDATE
    *     corpus ids only — a semi-join on an id list whose size is
    *     bounded by the band collisions, not the corpus.
    *
    * Returns (id_new, id_corpus, jaccard ≥ tau). Requires globally
    * unique doc_ids across batch and corpus (same contract as
    * [[Dedup.incrementalExact]]).
    */
  def incrementalNearDupPairs(newDocs: DataFrame, corpus: DataFrame,
                              store: DataFrame, tau: Double = 0.5,
                              shingleSize: Int = 3, bands: Int = 16,
                              maxBucket: Int = 64,
                              numPerms: Int = DefaultPerms,
                              seed: Long = DefaultSeed): DataFrame = {
    val newKeys = bandKeys(
      fingerprintRows(newDocs, shingleSize, numPerms, seed)
        .select("doc_id", "sig"), bands)
      .withColumnRenamed("doc_id", "id_new")
    val storeKeys = bandKeys(store.select("doc_id", "sig"), bands)
      .withColumnRenamed("doc_id", "id_corpus")
    val candidates = newKeys
      .join(storeKeys, Seq("band", "band_key"))
      .select("id_new", "id_corpus")
      .distinct()
      // deterministic cap per new doc: verification work per batch
      // doc is bounded no matter how templated the corpus is
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id_new").orderBy("id_corpus")))
      .filter(col("rk") <= maxBucket)
      .drop("rk")
    def shingles(docs: DataFrame) = docs.select(
      col("doc_id"),
      array_distinct(gf.tokenShingleHashes(col("text"), shingleSize))
        .as("shingles"))
    // corpus text touched ONLY for surfaced candidate ids
    val corpusSets = shingles(corpus.join(
      candidates.select(col("id_corpus").as("doc_id")).distinct(),
      Seq("doc_id"), "left_semi"))
    val newSets = shingles(newDocs)
    candidates
      .join(newSets.select(col("doc_id").as("id_new"),
        col("shingles").as("sh_new")), Seq("id_new"))
      .join(corpusSets.select(col("doc_id").as("id_corpus"),
        col("shingles").as("sh_corpus")), Seq("id_corpus"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_new"), col("sh_corpus"))) /
          greatest(size(array_union(col("sh_new"), col("sh_corpus"))), lit(1)))
      .filter(col("jaccard") >= tau)
      .select("id_new", "id_corpus", "jaccard")
  }
}
