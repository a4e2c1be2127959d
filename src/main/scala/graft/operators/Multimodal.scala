package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.F): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata,
  * processed per-partition without ever collecting to the driver.
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment): [[decodeStub]] derives deterministic fake
  * image properties from the bytes. The Spark-side plumbing —
  * binary schema, frame explode, typed Dataset batching — is real;
  * swap `decodeStub` for a JNI/codec call in production.
  *
  * Payloads here are derived from `documents.text` (the testdata has
  * no binary table); every byte-level op works unchanged on real
  * media bytes.
  */
object Multimodal {

  /** Project a documents table into (doc_id, payload binary, meta). */
  def asBlobs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        lit("text/plain").as("content_type")).as("meta"))

  /** Byte-level stats: size, sha-256, leading-magic hex — the
    * dedup/integrity pass for binary corpora. */
  def blobStats(docs: DataFrame): DataFrame =
    asBlobs(docs).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      hex(substring(col("payload"), 1, 4)).as("magic_hex"))

  /** Corpus rollup by sniffed type (leading magic bytes): blob
    * counts and size stats per detected format — the manifest pass
    * that decides which decoder fleet each subset routes to. One
    * narrow projection + a tiny aggregate.
    */
  def typeSummary(docs: DataFrame): DataFrame =
    asBlobs(docs)
      .select(hex(substring(col("payload"), 1, 2)).as("magic2"),
        col("meta.n_bytes").as("n_bytes"))
      .groupBy("magic2")
      .agg(
        count(lit(1)).as("n_blobs"),
        sum("n_bytes").as("total_bytes"),
        min("n_bytes").as("min_bytes"),
        max("n_bytes").as("max_bytes"))

  /** Duplication profile by sniffed type — which FORMAT carries the
    * copy weight (crawled image corpora and scraped PDFs duplicate
    * at wildly different rates, and dedup budget should follow the
    * waste): per magic2 type, blob count, distinct-payload count
    * (sha-256 identity), the duplicate ratio, and the bytes a
    * per-type exact dedup would reclaim. Two hash aggregates — the
    * inner one on (type, sha) carries only hashes and byte counts,
    * never payloads (identical payloads have identical length, so
    * one representative's size is `max(len)` within the sha group).
    */
  def dedupByType(docs: DataFrame): DataFrame =
    asBlobs(docs)
      .select(hex(substring(col("payload"), 1, 2)).as("magic2"),
        sha2(col("payload"), 256).as("sha"),
        col("meta.n_bytes").as("len"))
      .groupBy("magic2", "sha")
      .agg(count(lit(1)).as("n"), max("len").as("len1"),
        sum("len").as("bytes"))
      .groupBy("magic2")
      .agg(
        sum("n").as("n_blobs"),
        count(lit(1)).as("n_distinct"),
        round(lit(1.0) - count(lit(1)) / sum("n"), 6).as("dup_ratio"),
        (sum("bytes") - sum("len1")).as("reclaimable_bytes"))

  /** Frame/chunk sampling: cut each payload into `frameSize`-byte
    * frames every `stride` bytes (video frame-sample / audio window
    * shape). Pure explode+substring — codegen'd, no UDF, and the
    * explode keeps rows within the source partition.
    */
  def frameSample(docs: DataFrame, frameSize: Int = 64, stride: Int = 128): DataFrame =
    asBlobs(docs)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          greatest(((col("meta.n_bytes") - 1) / stride).cast("int"), lit(0))))
          .as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * stride).cast("long").as("byte_offset"),
        length(expr(s"substring(payload, frame_idx * $stride + 1, $frameSize)"))
          .cast("long").as("frame_len"),
        md5(expr(s"substring(payload, frame_idx * $stride + 1, $frameSize)"))
          .as("frame_md5"))

  /** Chunk-level dedup across payloads: frames whose bytes appear in
    * more than one document — the binary analogue of boilerplate
    * detection (shared headers, repeated segments). GroupBy on the
    * frame hash, never on the bytes themselves.
    */
  def chunkDedup(docs: DataFrame, frameSize: Int = 64, stride: Int = 128): DataFrame =
    frameSample(docs, frameSize, stride)
      .groupBy("frame_md5")
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min("doc_id").as("first_doc_id"))
      .filter(col("n_docs") > 1)

  /** Binary NEAR-DUP pairs: blob pairs whose chunk-hash vocabularies
    * overlap — re-encoded/truncated/header-patched copies that a
    * whole-file sha256 misses. Same candidate discipline as the text
    * near-dup family: per-blob DISTINCT chunk hashes, df-capped
    * postings (a boilerplate chunk shared by every file never
    * explodes — [[graft.functions.BoundedCollectSetAgg]] caps the
    * buffer at maxDf+1), pair fan-out only inside rare chunks, then
    * Jaccard over the df-capped chunk vocabulary (both sides of the
    * oracle replay the cap, so the score is deterministic). GroupBys
    * ride on 32-hex hashes, never payload bytes.
    */
  def blobNearDupPairs(docs: DataFrame, frameSize: Int = 64,
                       stride: Int = 128, tau: Double = 0.3,
                       maxDf: Int = 64): DataFrame = {
    val perDoc = frameSample(docs, frameSize, stride)
      .select(col("doc_id"), col("frame_md5")).distinct()
      .localCheckpoint(true) // consumed by sizes, postings, and nothing re-derives frames
    val sizes = perDoc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = perDoc.groupBy("frame_md5")
      .agg(graft.functions.BoundedCollectSetAgg
        .boundedCollectSet(col("doc_id"), maxDf + 1).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("chunk_jaccard",
        round(col("n_shared") / (col("n_a") + col("n_b") - col("n_shared")), 6))
      .filter(col("chunk_jaccard") >= tau)
      .select("id_a", "id_b", "n_shared", "chunk_jaccard")
  }

  /** INCREMENTAL blob near-dup — the daily-ingest shape for binary
    * corpora, completing the incremental family across modalities
    * (text: [[Dedup.incrementalNearDupPairs]]; vectors:
    * [[AnnIndex.appendIvf]]): only new×history candidates form —
    * history is never re-paired with itself, which at 100 TB is the
    * difference between O(delta) and re-verifying yesterday's
    * corpus nightly. Same tagged-id trick as the text twin (is_new
    * rides the posting id's low bit, so old×old combinations die
    * map-side inside the df-capped bucket enumeration before any
    * shuffle); chunk df is capped over the union so boilerplate
    * shared between batch and history still drops out. In
    * production the history side reads a persisted chunk-hash
    * store ([[DedupStore]] economics) instead of re-framing blobs.
    */
  def incrementalBlobPairs(newDocs: DataFrame, corpus: DataFrame,
                           frameSize: Int = 64, stride: Int = 128,
                           tau: Double = 0.3, maxDf: Int = 64): DataFrame = {
    val tagged = newDocs.select((col("doc_id") * 2 + 1).as("doc_id"), col("text"))
      .unionByName(corpus.select((col("doc_id") * 2).as("doc_id"), col("text")))
    val perDoc = frameSample(tagged, frameSize, stride)
      .select(col("doc_id"), col("frame_md5")).distinct()
      .localCheckpoint(true) // sizes + postings share it
    val sizes = perDoc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = perDoc.groupBy("frame_md5")
      .agg(graft.functions.BoundedCollectSetAgg
        .boundedCollectSet(col("doc_id"), maxDf + 1).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") % 2 === 1 && col("id_b") % 2 === 0)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("chunk_jaccard",
        round(col("n_shared") / (col("n_a") + col("n_b") - col("n_shared")), 6))
      .filter(col("chunk_jaccard") >= tau)
      .select(expr("id_a div 2").as("new_id"), expr("id_b div 2").as("corpus_id"),
        col("n_shared"), col("chunk_jaccard"))
  }

  /** Connected components over the blob near-dup pair relation —
    * the multimodal member of the groups family ([[Dedup.dedupGroups]]
    * for text pairs, [[Dedup.embeddingGroups]] for embeddings):
    * re-encoded copy CHAINS (a≈b≈c where the ends no longer share
    * enough frames directly) collapse to one cluster with the min-id
    * survivor. Same min-label propagation, same `WITH RECURSIVE`
    * oracle shape as the other two.
    */
  def blobDedupGroups(docs: DataFrame, frameSize: Int = 64,
                      stride: Int = 128, tau: Double = 0.3,
                      maxDf: Int = 64): DataFrame =
    Dedup.dedupGroups(docs.select(col("doc_id")),
      blobNearDupPairs(docs, frameSize, stride, tau, maxDf))

  case class Frame(doc_id: Long, frame_idx: Long, bytes: Array[Byte])
  case class DecodedFrame(doc_id: Long, frame_idx: Long,
                          width: Int, height: Int, mean_luma: Double)

  /** Deterministic fake decode: "image" properties derived from the
    * bytes. Replace with a real codec in production — the signature
    * (bytes in, typed struct out) is the contract.
    */
  def decodeStub(f: Frame): DecodedFrame = {
    var h = 0xcbf29ce484222325L
    var s = 0L
    f.bytes.foreach { b => h = (h ^ (b & 0xffL)) * 0x100000001b3L; s += (b & 0xff) }
    DecodedFrame(f.doc_id, f.frame_idx,
      width = 16 + ((h >>> 8) % 48).toInt.abs,
      height = 16 + ((h >>> 24) % 48).toInt.abs,
      mean_luma = if (f.bytes.isEmpty) 0.0 else s.toDouble / f.bytes.length)
  }

  /** Typed decode pass over sampled frames: the batch shape
    * (Dataset[Frame] → mapPartitions → Dataset[DecodedFrame]) is how
    * a real codec would be driven — per-partition, streaming,
    * driver never touches payload bytes.
    */
  def decodeFrames(docs: DataFrame, frameSize: Int = 64, stride: Int = 128): Dataset[DecodedFrame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBlobs(docs)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          greatest(((col("meta.n_bytes") - 1) / stride).cast("int"), lit(0))))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, frame_idx * $stride + 1, $frameSize)").as("bytes"))
      .as[Frame]
      .mapPartitions(_.map(decodeStub))
  }

  /** Per-document pooled feature embedding: decode frames, mean-pool
    * their (stub) features into one `array<float>` per document —
    * the bridge from binary payloads into the [[Similarity]] ANN /
    * [[Dedup]] embedding operators (`embedding-cosine dedup over
    * video corpora` is exactly this composition). Pooling is an
    * ordinary partial-friendly aggregate; with a real encoder the
    * mapPartitions step emits model features and nothing else
    * changes.
    */
  def pooledFeatures(docs: DataFrame, frameSize: Int = 64,
                     stride: Int = 128): DataFrame =
    decodeFrames(docs, frameSize, stride).toDF()
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        array(
          avg("width").cast("float"),
          avg("height").cast("float"),
          avg("mean_luma").cast("float"),
          stddev_pop("mean_luma").cast("float")).as("embedding"))

  /** Format policy over the [[typeSummary]] manifest — the multimodal
    * twin of `docs_source_policy`: which sniffed formats the decoder
    * fleet DROPs (below `minCount`, long-tail formats not worth a
    * decoder), CAPs (above `maxByteShare` of corpus bytes — one
    * format must not monopolize training), or KEEPs. `byte_share` is
    * one division of two exact longs, so the thresholds replay
    * bit-for-bit in any engine. The decision table is O(formats)
    * rows; the partition-less share window is bounded by the format
    * universe (256² magic pairs), correct by construction.
    */
  def blobPolicy(docs: DataFrame, minCount: Long = 3L,
                 maxByteShare: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    typeSummary(docs)
      .withColumn("byte_share",
        col("total_bytes").cast("double") /
          sum("total_bytes").over(all).cast("double"))
      .withColumn("action",
        when(col("n_blobs") < minCount, "drop")
          .when(col("byte_share") > maxByteShare, "cap")
          .otherwise("keep"))
      .select("magic2", "n_blobs", "total_bytes", "byte_share", "action")
  }

  /** Format-mix drift between corpus halves — the multimodal
    * spelling of `events_type_psi`: categorical PSI over the sniffed
    * magic2 formats, halves split at the doc_id midpoint (ingest
    * order — documents carry no timestamp). The "crawl composition
    * is shifting" alarm for a binary corpus: a format appearing or
    * dying between halves produces a large FINITE term (Laplace
    * smoothing over the format universe), and the decoder-fleet
    * sizing that [[blobPolicy]] froze yesterday stops matching the
    * feed. One payload scan into an O(formats) relation; the windows
    * run over that bounded relation only.
    */
  def formatPsi(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = asBlobs(docs)
      .select(hex(substring(col("payload"), 1, 2)).as("magic2"),
        col("doc_id"))
      .crossJoin(broadcast(docs.agg(
        floor((min("doc_id") + max("doc_id")) / 2).cast("long").as("mid"))))
      .groupBy("magic2")
      .agg(
        sum(when(col("doc_id") <= col("mid"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("doc_id") <= col("mid"), 0L).otherwise(1L)).as("n_b"))
    val all = Window.orderBy("magic2")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pa = (col("n_a") + lit(0.5)) /
      (sum("n_a").over(all) + lit(0.5) * count(lit(1)).over(all))
    val pb = (col("n_b") + lit(0.5)) /
      (sum("n_b").over(all) + lit(0.5) * count(lit(1)).over(all))
    counts
      .withColumn("p_a", pa).withColumn("p_b", pb)
      .withColumn("psi_term", (col("p_b") - col("p_a")) *
        log(col("p_b") / col("p_a")))
      .withColumn("psi_total", sum("psi_term").over(all))
      .select(col("magic2"), col("n_a"), col("n_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("psi_term"), 6).as("psi_term"),
        round(col("psi_total"), 6).as("psi_total"))
  }
}
