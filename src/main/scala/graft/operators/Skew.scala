package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5).
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime;
  * these helpers cover the cases AQE doesn't: aggregation hot keys
  * and broadcast-replicated joins against a skewed build of
  * candidates.
  */
object Skew {

  /** Key-skew profile — the MEASUREMENT that decides whether
    * [[saltedAgg]]/[[saltedJoin]] (or AQE skew handling) is worth
    * its shuffle: one row summarizing how unevenly `key` distributes
    * — distinct keys, total rows, the hottest key and its row count,
    * the exact mean rows/key, and `skew_ratio` = max/mean. A ratio
    * near 1 says the keys are flat and salting only adds a merge
    * phase; a large ratio says the hottest key's partition IS the
    * job's critical path at scale. Two aggregates over one count
    * relation (key-cardinality-sized, not row-sized); the hottest
    * key reports deterministically (smallest key wins count ties).
    * skew_ratio is exact integer arithmetic (max·n_keys/total)
    * rounded once — engine-stable.
    */
  def keySkewProfile(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("n_rows"))
      .localCheckpoint(true) // consumed by the summary AND the argmax
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum("n_rows").as("n_rows_total"),
      max("n_rows").as("max_rows"))
    val top = counts.join(broadcast(summary.select("max_rows")),
        col("n_rows") === col("max_rows"))
      .agg(min("key").as("top_key"))
    summary.crossJoin(broadcast(top))
      .withColumn("avg_rows",
        round(col("n_rows_total").cast("double") / col("n_keys"), 6))
      .withColumn("skew_ratio",
        // cast BEFORE the multiply: a Long product can silently wrap
        // at extreme cardinalities (non-ANSI), and the result is a
        // double anyway
        round(col("max_rows").cast("double") * col("n_keys") /
          col("n_rows_total"), 6))
      .select("n_keys", "n_rows_total", "max_rows", "top_key",
        "avg_rows", "skew_ratio")
  }

  /** Two-phase salted aggregation for hot grouping keys: rows are
    * spread over `saltBuckets` sub-keys, partially aggregated, then
    * merged. Works for any algebraic aggregate (sum/count/min/max):
    * pass the partial aggregates and how to merge them.
    *
    * {{{
    *   Skew.saltedAgg(sales, Seq("product_id"),
    *     partials = Seq(sum("quantity").as("q"), sum("sale_amount").as("a")),
    *     merge    = Seq(sum("q").as("total_quantity"), sum("a").as("total_sale_amount")))
    * }}}
    *
    * The salt is a hash of the row's own column values — deterministic
    * under task retries (a `monotonically_increasing_id` salt changes
    * on partial stage recompute, which can lose or duplicate rows at
    * the final aggregate, SPARK-23207-style). Identical rows share a
    * salt, which only matters if one literal row dominates — and the
    * aggregate is still correct either way.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                partials: Seq[Column], merge: Seq[Column],
                saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for a skewed probe side against a small build
    * side: the big side gets a random-but-stable salt, the small side
    * is replicated once per salt bucket, and the join key becomes
    * (key, salt) — one hot key fans out over `saltBuckets` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
