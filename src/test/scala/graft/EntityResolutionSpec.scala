package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

/** Entity-resolution family: fixture separation guarantees, the
  * match/closure/survivorship chain, and the plan shape (blocked
  * equi-join, never a cartesian). */
class EntityResolutionSpec extends SparkSpec {

  private lazy val customer: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
  private lazy val recs = EntityResolution.synthCrmCorpus(customer)
    .localCheckpoint(true)
  private lazy val pairs = EntityResolution.entityPairs(recs)
    .localCheckpoint(true)
  private lazy val groups = EntityResolution.entityGroups(recs, pairs)
    .localCheckpoint(true)

  test("syllable alphabet: 30 globally distinct symbols — distinct " +
    "customers are >= 3 edits apart by construction") {
    val chars = EntityResolution.Syllables.flatMap(_.toSeq)
    assert(chars.distinct.size === 30, "cross-position symbol reuse would " +
      "let a deletion remnant of one syllable impersonate another")
    assert(EntityResolution.Syllables.forall(_.length == 3))
  }

  test("fixture shape: every variant class present, rec_id arithmetic " +
    "recovers the customer, web noise is normalization-only") {
    val n = customer.count()
    val bySrc = recs.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("crm") === n)
    assert(bySrc("web") === customer.filter(col("c_custkey") % 5 === 2).count())
    assert(bySrc("pos") === customer.filter(col("c_custkey") % 3 === 1).count())
    assert(bySrc("legacy") === customer.filter(col("c_custkey") % 6 === 1).count())
    // web records normalize to EXACTLY their base's name
    val webMismatch = recs.filter(col("src") === "web")
      .select((col("rec_id") - 1).as("rec_id"),
        EntityResolution.normName(col("raw_name")).as("nw"))
      .join(recs.filter(col("src") === "crm")
        .select(col("rec_id"), col("raw_name").as("nb")), "rec_id")
      .filter(col("nw") =!= col("nb")).count()
    assert(webMismatch === 0L)
  }

  test("pairs: each variant matches at its designed distance, and the " +
    "legacy record reaches its base ONLY through the closure") {
    val p = pairs.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byPair = p.map { case (a, b, l, rule) => (a, b) -> (l, rule) }.toMap
    val ks = customer.select("c_custkey").collect().map(_.getLong(0))
    ks.filter(_ % 5 == 2).foreach { k =>
      assert(byPair.get((k * 4, k * 4 + 1)).contains((0L, "exact_norm")),
        s"web variant of $k should exact-match after normalization")
    }
    ks.filter(_ % 3 == 1).foreach { k =>
      assert(byPair.get((k * 4, k * 4 + 2)).contains((1L, "fuzzy")),
        s"pos typo of $k should match at distance 1")
    }
    ks.filter(_ % 6 == 1).foreach { k =>
      assert(byPair.contains((k * 4 + 2, k * 4 + 3)),
        s"legacy record of $k should match the pos record at distance 1")
      assert(!byPair.contains((k * 4, k * 4 + 3)),
        s"legacy record of $k is 2 edits from base — the direct pair " +
          "must NOT form (the length band excludes it); only the " +
          "closure unites them")
    }
  }

  test("no false merges: every matched pair belongs to one customer") {
    val cross = pairs
      .filter((col("rec_a") / 4).cast("long") =!=
        (col("rec_b") / 4).cast("long")).count()
    assert(cross === 0L, "a cross-customer pair at lev <= 1 means the " +
      "syllable separation argument broke")
  }

  test("closure: all of a customer's records land on entity_id = base " +
    "rec_id, including the distance-2 legacy chain") {
    val wrong = groups
      .withColumn("expected", (col("rec_id") / 4).cast("long") * 4)
      .filter(col("entity_id") =!= col("expected")).count()
    assert(wrong === 0L)
    // keep = exactly one survivor per entity
    val multi = groups.filter(col("keep")).groupBy("entity_id")
      .count().filter(col("count") =!= 1).count()
    assert(multi === 0L)
  }

  test("survivorship: golden record is the crm feed, conflicts are " +
    "flagged exactly where a stale feed disagrees") {
    val golden = EntityResolution.goldenRecords(recs, groups)
      .localCheckpoint(true)
    // golden_rec is always the base record (crm has priority 0 and
    // every entity contains its base)
    assert(golden.filter(col("golden_rec") =!= col("entity_id")).count() === 0L)
    // nation conflict iff a pos/legacy member exists (they carry the
    // shifted nationkey)
    val expectConflict = recs.filter(col("src").isin("pos", "legacy"))
      .select(((col("rec_id") / 4).cast("long") * 4).as("entity_id"))
      .distinct()
    val flagged = golden.filter(col("nation_conflict"))
      .select("entity_id")
    assert(flagged.exceptAll(expectConflict).count() === 0L)
    assert(expectConflict.exceptAll(flagged).count() === 0L)
    // the golden balance is the crm record's, not a stale rounding
    val balWrong = golden.join(
      customer.select((col("c_custkey") * 4).as("entity_id"),
        round(col("c_acctbal"), 2).as("expected_bal")), "entity_id")
      .filter(col("acctbal") =!= col("expected_bal")).count()
    assert(balWrong === 0L)
    // member counts: 1 (base) + web? + pos? + legacy?
    val cntWrong = golden.join(
      customer.select((col("c_custkey") * 4).as("entity_id"),
        (lit(1) + (col("c_custkey") % 5 === 2).cast("int") +
          (col("c_custkey") % 3 === 1).cast("int") +
          (col("c_custkey") % 6 === 1).cast("int")).cast("long")
          .as("expected_n")), "entity_id")
      .filter(col("n_members") =!= col("expected_n")).count()
    assert(cntWrong === 0L)
  }

  test("incremental attach: deltas land on the store's closure label, " +
    "new customers found entities, within-batch resolution defers") {
    val hist = recs
      .filter((col("rec_id") % 4).isin(0L, 2L) && col("rec_id") % 28 =!= 0)
    val store = EntityResolution.entityStore(hist,
      EntityResolution.entityGroups(hist, EntityResolution.entityPairs(hist)))
      .localCheckpoint(true)
    val delta = recs
      .filter((col("rec_id") % 4).isin(1L, 3L) || col("rec_id") % 28 === 0)
    val att = EntityResolution.attachToStore(delta, store)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // nothing ever attaches across customers
    val storeEntities = store.select("entity_id").collect()
      .map(_.getLong(0)).toSet
    att.foreach { case (rec, (ent, isNew)) =>
      assert(ent / 4 === rec / 4,
        s"record $rec attached to another customer's entity $ent")
      // an attach carries a label the store owns; a found entity is
      // labeled by the record itself (delta rec ids are never store
      // labels, so the two cases cannot alias)
      if (isNew) assert(ent === rec && !storeEntities.contains(ent))
      else assert(storeEntities.contains(ent))
    }
    val ks = customer.select("c_custkey").collect().map(_.getLong(0))
    ks.filter(k => k % 5 == 2).foreach { k =>
      val (ent, isNew) = att(k * 4 + 1)
      if (k % 7 != 0) {
        // web finds the base record → the store's entity label
        assert(ent === k * 4 && !isNew)
      } else if (k % 3 == 1) {
        // base is absent from history; the pos feed carries the
        // entity, so the attach lands on ITS closure label
        assert(ent === k * 4 + 2 && !isNew)
      } else {
        // truly unseen customer → founds a new entity
        assert(ent === k * 4 + 1 && isNew)
      }
    }
    // legacy is 2 edits from base but 1 from pos — it attaches to the
    // store label of the POS record, which the history closure
    // resolved to the base: label indirection, not a direct match
    ks.filter(k => k % 6 == 1 && k % 7 != 0).foreach { k =>
      assert(att(k * 4 + 3) === ((k * 4, false)))
    }
    // the same-batch deferral: a brand-new customer arriving as BOTH
    // base and web founds TWO entities this batch (the nightly
    // closure merges them) — asserted wherever the fixture plants it
    val deferred = ks.filter(k => k % 7 == 0 && k % 5 == 2 && k % 3 != 1)
    deferred.foreach { k =>
      assert(att(k * 4) === ((k * 4, true)))
      assert(att(k * 4 + 1) === ((k * 4 + 1, true)))
    }
    assert(deferred.nonEmpty, "fixture must exercise the deferral path")
  }

  test("plan: the match is a blocked equi-join — no cartesian, no " +
    "nested-loop fallback anywhere in the pair build") {
    val plan = EntityResolution.entityPairs(recs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pair build must join on the blocking key, never all-pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the length band must ride the equi-join, not force a theta join")
  }

  test("maxBlock cap bounds a planted 1000-record hot block (and never " +
    "binds on the uniform driver fixture)") {
    import spark.implicits._
    // a production hot prefix: 1000 records sharing one block with
    // identical normalized names — uncapped that is C(1000,2) =
    // 499 500 candidate pairs from ONE block
    val hot = (0L until 1000L)
      .map(i => (i, "johnsmith")).toDF("rec_id", "raw_name")
    val capped = EntityResolution.entityPairs(hot, maxBlock = 30).collect()
    assert(capped.length === 30 * 29 / 2,
      s"cap must keep exactly C(30,2) pairs, got ${capped.length}")
    val ids = capped.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids === (0L until 30L).toSet,
      "the survivor subset must be the deterministic smallest rec_ids")
    // attach tier: a delta record probing a 1000-member hot STORE
    // block compares against maxBlock members only, and still lands
    // on the smallest capped entity label
    val store = hot.select(col("rec_id"),
        lower(col("raw_name")).as("norm"),
        substring(lower(col("raw_name")), 1, 6).as("block"),
        length(col("raw_name")).as("len"),
        col("rec_id").as("entity_id"))
    val att = EntityResolution.attachToStore(
        Seq((5000L, "johnsmith")).toDF("rec_id", "raw_name"),
        store, maxBlock = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(att.toSeq === Seq((5000L, 0L, false)),
      s"delta must attach to the smallest capped store entity: ${att.toSeq}")
    // the driver fixture's blocks sit far under the 256 default —
    // the cap can never bind there, which is what keeps the capped
    // oracle and the uncapped exhaustive definition identical
    val blockSizes = recs
      .select(EntityResolution.normName(col("raw_name")).as("norm"))
      .select(substring(col("norm"), 1, 6).as("block"))
      .groupBy("block").count().agg(max("count")).head().getLong(0)
    assert(blockSizes <= 128,
      s"driver fixture max block $blockSizes exceeds half the 256 cap")
  }
}
