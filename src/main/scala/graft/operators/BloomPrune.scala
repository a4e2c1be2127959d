package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning: when a selective filter on one fact
  * side qualifies few join keys, a Bloom filter of those keys can
  * drop most of the OTHER side's rows before they ever reach the
  * shuffle — the standard runtime-filter trick (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` does this inside a
  * query; this operator makes it explicit and composable across
  * queries/stages).
  *
  * Cost model at 100 TB: the filter is built with one pass over the
  * small (qualifying) side and broadcasts at ~1.2 bytes/key at 1%
  * FPP — 10M qualifying keys ≈ 12 MB, well inside broadcast budget —
  * and saves shuffling the (1-selectivity) complement of a
  * multi-terabyte fact. False positives survive the pre-filter but
  * are dropped by the real join, so results are exactly unchanged —
  * which is why [[graft.SparkEntry]] checks the pruned variant
  * against the unpruned query's oracle.
  */
object BloomPrune {

  /** Build a Bloom filter over `keyCol` (long) of `keys`. */
  def keyFilter(keys: DataFrame, keyCol: String,
                expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    keys.stat.bloomFilter(keyCol, math.max(expectedItems, 1L), fpp)

  /** Keep only rows whose `keyCol` might be in the filter. The test
    * runs map-side before any exchange, so the join shuffle carries
    * only survivors (+ FPP false positives). The probe is a native
    * codegen'd expression ([[graft.functions.gf.bloomMightContain]]),
    * not a Scala UDF — no per-row ser/de, and the filter stays fused
    * into the scan's whole-stage-codegen span.
    */
  def prune(big: DataFrame, keyCol: String, bf: BloomFilter): DataFrame =
    // null keys are dropped explicitly — the downstream inner join
    // would drop them anyway, so the prefilter can't change results
    big.filter(col(keyCol).isNotNull &&
      graft.functions.gf.bloomMightContain(col(keyCol), bf))
}
