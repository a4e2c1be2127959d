package graft

import graft.operators.Curation

/** The composed curation pass drops each failure class for its own
  * reason and keeps the clean survivor. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from a warm window sill and the birds sing in the morning light"
  private val other =
    "completely different content about databases indexes partitions " +
      "shuffles joins aggregates and the relational algebra of query engines"
  // ≥ 27 tokens so the C4 length factor clears minQuality
  private val good = base + " " + base
  private val benchText = other + " " + other

  test("quality, dedup, benchmark and contamination drops compose") {
    val docs = Seq(
      (0L, benchText),                       // benchMod slice: held-out benchmark
      (10L, good),                           // unique, clean → the one survivor
      // whitespace-only variant: canonical duplicate of 10 that still
      // PASSES quality (uppercasing would fail the stopword check
      // first and be attributed to 'quality', not 'duplicate')
      (11L, good.replace(" ", "  ")),
      (12L, "tiny low quality doc"),         // fails the quality filter
      (13L, "extra words here " + benchText)) // shares bench 3-grams → contaminated
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))

    val kept = Curation.curate(docs).collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L), s"expected only the clean survivor, got $kept")

    // the manifest attributes every doc to exactly one reason, with
    // curate's precedence, and its 'kept' bucket matches curate
    val reasons = Curation.manifest(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(reasons.values.sum == 5L, "every doc appears exactly once")
    assert(reasons(("s", "kept")) == 1L)
    assert(reasons(("s", "quality")) == 1L)      // doc 12
    assert(reasons(("s", "duplicate")) == 1L)    // doc 11
    assert(reasons(("s", "benchmark")) == 1L)    // doc 0
    assert(reasons(("s", "contaminated")) == 1L) // doc 13
  }
}
