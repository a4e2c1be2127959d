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
