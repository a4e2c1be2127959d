package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupStore}

case class StoreDoc(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)

/** The persisted fingerprint store must answer exactly like
  * recomputing from text — it persists deterministic functions of
  * the text, so any divergence is a bug, not noise.
  */
class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  // the incremental split used by the dedup_incremental driver keys
  private lazy val batch = docs.filter($"doc_id" % 10 === 0)
  private lazy val corpus = docs.filter($"doc_id" % 10 =!= 0)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ds").toString + "/store"

  test("store round-trip: fingerprints persist and reload byte-identically") {
    val path = tmp()
    DedupStore.build(corpus, path)
    val stored = DedupStore.load(spark, path)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Long](2)))
      .toMap
    val fresh = DedupStore.fingerprintRows(corpus)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Long](2)))
      .toMap
    assert(stored == fresh)
  }

  test("incremental exact from the store equals the text-based path") {
    val path = tmp()
    DedupStore.build(corpus, path)
    val fromStore = DedupStore
      .incrementalExact(batch, DedupStore.load(spark, path))
      .collect().map(_.getLong(0)).toSet
    val fromText = Dedup.incrementalExact(batch, corpus)
      .collect().map(_.getLong(0)).toSet
    assert(fromStore == fromText,
      "anti-join on stored norm_md5 must equal canonical-text dedup")
  }

  test("append accumulates batches; a re-appended doc dedups against itself") {
    val path = tmp()
    DedupStore.build(corpus, path)
    DedupStore.append(batch, path)
    // now the batch's own texts are in the store → nothing is new
    val unseen = DedupStore
      .incrementalExact(batch, DedupStore.load(spark, path))
      .count()
    assert(unseen == 0L, "every batch doc was just appended to the store")
  }

  test("near-dup pairs from stored signatures equal fresh-from-text banding") {
    val path = tmp()
    DedupStore.build(corpus, path)
    val fromStore = DedupStore
      .incrementalNearDupPairs(batch, corpus, DedupStore.load(spark, path),
        tau = 0.3)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    // reference: identical banding computed fresh from corpus text
    val freshStore = DedupStore.fingerprintRows(corpus)
    val fromFresh = DedupStore
      .incrementalNearDupPairs(batch, corpus, freshStore, tau = 0.3)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(fromStore == fromFresh,
      "persisted signatures are the same deterministic function of text")
    // contract: one side is always a batch doc, the other corpus
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    fromStore.foreach { case (c, n) =>
      assert(batchIds.contains(n) && !batchIds.contains(c),
        s"pair ($c, $n) must be corpus x new")
    }
  }

  test("streaming fingerprint sink: streamed store equals the batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus.select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => StoreDoc(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val base = java.nio.file.Files.createTempDirectory("graft_fs").toString
    val (store, chk) = (s"$base/store", s"$base/chk")
    val mem = MemoryStream[StoreDoc]
    val q = graft.streaming.StreamingLoad
      .fingerprintStoreSink(mem.toDF(), store, chk)
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(store)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Long](2)))
      .toMap
    val batchBuilt = DedupStore.fingerprintRows(corpus)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Long](2)))
      .toMap
    assert(streamed == batchBuilt,
      "micro-batched appends must equal the one-shot build")
  }

  test("streamed store feeds the NEXT batch's incremental dedup end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val (store, chk) = (s"$base/store", s"$base/chk")
    // night 1: stream today's corpus slice into the fingerprint store
    val night1 = corpus.select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => StoreDoc(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val mem = MemoryStream[StoreDoc]
    val q = graft.streaming.StreamingLoad
      .fingerprintStoreSink(mem.toDF(), store, chk)
    try { mem.addData(night1.toSeq); q.processAllAvailable() } finally q.stop()
    // night 2's batch: half genuinely new docs, half re-ingested
    // copies of night-1 texts under new ids — only the new survive
    val reingested = corpus.limit(5)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val night2 = batch.unionByName(reingested)
    val unseen = DedupStore
      .incrementalExact(night2, DedupStore.load(spark, store))
      .collect().map(_.getLong(0)).toSet
    val expected = Dedup.incrementalExact(batch, corpus)
      .collect().map(_.getLong(0)).toSet
    assert(unseen == expected,
      s"re-ingested texts must drop against the STREAMED store: " +
        s"${unseen -- expected} unexpected, ${expected -- unseen} missing")
  }

  test("near-dup verification finds a planted near-copy of a corpus doc") {
    val path = tmp()
    DedupStore.build(corpus, path)
    // plant: a batch doc that is a corpus doc's text with one token
    // changed — the banding must surface it, verification must pass it
    val victim = corpus.orderBy("doc_id").limit(1)
      .select("doc_id", "text").collect().head
    val planted = Seq((victim.getLong(0) + 1000000L,
      victim.getString(1) + " tail"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("plant"))
      .withColumn("n_chars", length($"text").cast("long"))
    val pairs = DedupStore
      .incrementalNearDupPairs(planted, corpus, DedupStore.load(spark, path),
        tau = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
    assert(pairs.exists { case (c, n, j) =>
      n == victim.getLong(0) + 1000000L && c == victim.getLong(0) && j > 0.8
    }, s"planted near-copy must pair with its victim: ${pairs.toSeq}")
  }
}
