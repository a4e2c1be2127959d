package graft

import org.apache.spark.sql.functions._

import graft.operators.{CountMin, EntityResolution, RetailEtl}
import graft.sources.Lake

/** Randomized (seeded, reproducible) invariants for the round-15
  * operators against naive in-memory references — the entity
  * matcher vs brute-force Levenshtein over ALL record pairs, the
  * Count-Min estimator algebra on adversarial multisets, vacuum's
  * action partition on random manifests, and the erasure cascade's
  * conservation under random request sets.
  */
class R15PropertySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    var prev = (0 to n).toArray
    for (i <- 1 to m) {
      val cur = new Array[Int](n + 1); cur(0) = i
      for (j <- 1 to n)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(n)
  }

  test("entityPairs == brute-force blocked Levenshtein over ALL pairs " +
    "(random customer subsets)") {
    val rnd = new scala.util.Random(151)
    val customer = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .localCheckpoint(true)
    for (round <- 1 to 3) {
      val mod = 2 + rnd.nextInt(3)
      val res = rnd.nextInt(mod)
      val recs = EntityResolution
        .synthCrmCorpus(customer.filter(col("c_custkey") % mod === res))
        .localCheckpoint(true)
      val norm = recs.select(col("rec_id"),
        EntityResolution.normName(col("raw_name")).as("n")).collect()
        .map(r => r.getLong(0) -> r.getString(1))
      // the reference: every pair, the FULL match rule re-derived
      val expect = (for {
        (ra, na) <- norm; (rb, nb) <- norm
        if ra < rb && na.take(6) == nb.take(6) &&
          math.abs(na.length - nb.length) <= 1 && lev(na, nb) <= 1
      } yield (ra, rb, lev(na, nb).toLong)).toSet
      val got = EntityResolution.entityPairs(recs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expect,
        s"round $round (mod=$mod res=$res): " +
          s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
      assert(expect.nonEmpty, s"round $round must exercise matches")
    }
  }

  test("CountMin: est >= exact and merge associativity hold on " +
    "adversarial random multisets (hot keys + long tail)") {
    val rnd = new scala.util.Random(152)
    for (round <- 1 to 2) {
      // a few very hot tokens + a wide tail, shuffled into docs
      val hot = (0 until 5).flatMap(h =>
        Seq.fill(200 + rnd.nextInt(300))(s"hot$h"))
      val tail = (0 until 2000).map(t => s"t${rnd.nextInt(5000)}")
      val toks = rnd.shuffle(hot ++ tail)
      val docs = toks.grouped(97).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
        .toDF("doc_id", "text").localCheckpoint(true)
      val exact = toks.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong }
      val sk = CountMin.sketch(docs).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // every key's min-over-rows estimate dominates its true count
      val consts = CountMin.rowConsts
      exact.foreach { case (t, c) =>
        val h = graft.functions.TextHashes.hash64(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
        val est = consts.zipWithIndex.map { case ((a, b), r) =>
          sk((r, (a * h + b) >>> CountMin.Shift)) }.min
        assert(est >= c, s"round $round: undercount for $t: $est < $c")
      }
      // merge associativity on a random 3-way split
      val parts = (0 until 3).map(i =>
        CountMin.sketch(docs.filter(pmod(col("doc_id"), lit(3)) === i)))
      val merged = parts.reduce(_ unionByName _)
        .groupBy("r", "bucket").agg(sum("cnt").as("cnt")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(merged === sk, s"round $round: 3-way merge must be exact")
    }
  }

  test("vacuumPlan: the action column partitions every random manifest " +
    "exactly by the retention rule") {
    val rnd = new scala.util.Random(153)
    for (round <- 1 to 3) {
      val current = 5L + rnd.nextInt(10)
      val retain = rnd.nextInt(6).toLong
      val mf = (0 until 200).map { i =>
        val created = rnd.nextInt(current.toInt).toLong
        val removed = if (rnd.nextBoolean()) None
          else Some(created + rnd.nextInt(5).toLong)
        ("p" + rnd.nextInt(4), i.toLong, 10L + rnd.nextInt(1000),
          created, removed)
      }.toDF("part", "file_id", "bytes", "created_snap", "removed_snap")
      val out = Lake.vacuumPlan(mf, current, retain).collect()
      out.foreach { r =>
        val removed = if (r.isNullAt(4)) None else Some(r.getLong(4))
        val expected = removed match {
          case None => "keep-live"
          case Some(x) if x >= current - retain => "keep-travel"
          case _ => "expire"
        }
        assert(r.getString(5) === expected, s"round $round: $r")
        assert(r.getLong(6) ===
          (if (expected == "expire") r.getLong(2) else 0L))
      }
      assert(out.length === 200)
    }
  }

  test("rtbf conservation: random request sets never lose or invent " +
    "rows, and zero requests remove nothing") {
    val rnd = new scala.util.Random(154)
    val dir = "/root/testdata/sf0.001"
    val cust = graft.sources.Tables.customer(spark, dir)
    val ords = graft.sources.Tables.orders(spark, dir)
    val li = graft.sources.Tables.lineitem(spark, dir)
    for (round <- 1 to 2) {
      val mod = 11 + rnd.nextInt(40)
      val reqs = cust.filter(col("c_custkey") % mod === rnd.nextInt(mod))
      val plan = RetailEtl.rtbfPlan(reqs, cust, ords, li)
        .agg(count(lit(1)), sum("n_orders"), sum("n_lineitems")).head()
      val apply = RetailEtl.rtbfApply(reqs, cust, ords, li).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      apply.values.foreach { case (b, r, a) => assert(b === r + a) }
      assert(apply("customer")._2 === plan.getLong(0))
      assert(apply("orders")._2 === plan.getLong(1))
      assert(apply("lineitem")._2 === plan.getLong(2))
    }
    val none = RetailEtl.rtbfApply(cust.filter(lit(false)), cust, ords, li)
      .collect()
    assert(none.forall(_.getLong(2) == 0L), "empty queue removes nothing")
  }
}
