package graft

import graft.operators.Spread

/** The input-spread helper's contract: it fixes the
  * single-small-file fixture without ever taxing a well-split scan.
  */
class SpreadSpec extends SparkSpec {

  test("spread widens an under-split input to defaultParallelism") {
    val df = spark.range(1000).toDF("id").coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    assert(Spread.spread(df).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("spread is a NO-OP when the scan already has enough splits") {
    val wide = spark.range(1000).toDF("id")
      .repartition(spark.sparkContext.defaultParallelism + 4)
    // eq on the exact plan: no exchange inserted at all
    assert(Spread.spread(wide) eq wide,
      "a well-split input must pass through untouched")
  }
}
