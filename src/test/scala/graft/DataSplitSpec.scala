package graft

import graft.operators.DataSplit

/** Hash-split specs: determinism, disjoint-complete partitioning,
  * proportion accuracy.
  */
class DataSplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 10000L).toDF("id")
  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("assignment is deterministic and partition-independent") {
    val a = DataSplit.assign(ids, "id", weights).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = DataSplit.assign(ids.repartition(7), "id", weights).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("splits are disjoint and complete with ~correct proportions") {
    val s = DataSplit.splits(ids, "id", weights)
    val counts = s.map { case (k, df) => k -> df.count() }
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") - 8000L) < 400, s"train ${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 200, s"val ${counts("val")}")
    assert(math.abs(counts("test") - 1000L) < 200, s"test ${counts("test")}")
  }

  test("different seeds give different assignments") {
    val a = DataSplit.assign(ids, "id", weights, seed = 1L)
      .filter($"split" === "train").count()
    val moved = DataSplit.assign(ids, "id", weights, seed = 1L)
      .withColumnRenamed("split", "s1")
      .join(DataSplit.assign(ids, "id", weights, seed = 2L), "id")
      .filter($"s1" =!= $"split").count()
    assert(moved > 500, s"only $moved rows moved between seeds")
    assert(a > 0)
  }

  test("bad weights are rejected") {
    intercept[IllegalArgumentException] {
      DataSplit.assign(ids, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }
}
