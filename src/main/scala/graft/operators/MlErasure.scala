package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten for the ML DERIVED stores (r16) — the reach
  * [[RetailEtl.rtbfPlan]]/[[RetailEtl.rtbfApply]] have over the
  * relational cascade, extended to where a training pipeline
  * actually keeps subject data after ingestion:
  *
  *  - the dedup FINGERPRINT store ([[DedupStore.fingerprintRows]]:
  *    one md5+minhash row per document — fingerprints of erased text
  *    are still derived personal data),
  *  - the WINNOW fingerprint store (the (doc_id, fp) inverted
  *    relation behind [[TextAnalysis.winnowDedup]] — many rows per
  *    document),
  *  - the ANN INDEX's vector rows ([[AnnIndex]] — the embedding IS
  *    the subject's content in vector form).
  *
  * Plan and apply are pure metadata over the store relations
  * (O(stores) output rows; each store is read ONCE — a broadcast
  * left-join presence marker feeds a single conditional aggregate
  * carrying both counts).
  * The PHYSICAL index erasure reuses the r15 delete lifecycle as its
  * execution primitive — [[AnnIndex.deleteIvf]] tombstones the
  * requested ids so probes exclude them IMMEDIATELY (the legal
  * clock), and the next compact/rebuild removes the bytes
  * (AnnIndexSpec probes that an erased vector never scores again).
  * Erasure of the relational rows themselves is [[RetailEtl]]'s
  * cascade; the two aprons together are the full RTBF surface.
  */
object MlErasure {

  /** One scan per store: LEFT-join the broadcast request set as a
    * presence marker (distinct on the key, so no row multiplication)
    * and read total + to-erase from one conditional aggregate —
    * half the passes of the agg ⋈ semi-join-agg shape, which at
    * 100 TB means half the store reads. */
  private def markReqs(df: DataFrame, key: String,
                       reqs: DataFrame): DataFrame =
    df.select(col(key)).join(
      broadcast(reqs.select(col(key)).distinct()
        .withColumn("__req", lit(1))),
      Seq(key), "left")

  private def planRow(store: String, df: DataFrame, key: String,
                      reqs: DataFrame): DataFrame =
    markReqs(df, key, reqs)
      .agg(count(lit(1)).as("rows_total"),
        count(col("__req")).as("rows_to_erase"))
      .select(lit(store).as("store"), col("rows_total"),
        col("rows_to_erase"))

  /** The erasure PLAN: per ML store, total rows and the rows the
    * request will remove — what a data-protection officer signs off
    * before [[rtbfMlApply]] runs. `reqDocs` carries the subject's
    * `doc_id`s, `reqVecs` their `vec_id`s. */
  def rtbfMlPlan(reqDocs: DataFrame, reqVecs: DataFrame,
                 fingerprints: DataFrame, winnowFps: DataFrame,
                 annVectors: DataFrame): DataFrame =
    planRow("fingerprints", fingerprints, "doc_id", reqDocs)
      .unionByName(planRow("winnow_fps", winnowFps, "doc_id", reqDocs))
      .unionByName(planRow("ann_vectors", annVectors, "vec_id", reqVecs))

  private def applyRow(store: String, df: DataFrame, key: String,
                       reqs: DataFrame): DataFrame =
    markReqs(df, key, reqs)
      .agg(count(lit(1)).as("rows_before"),
        count(col("__req")).as("rows_removed"))
      .select(lit(store).as("store"), col("rows_before"),
        col("rows_removed"),
        (col("rows_before") - col("rows_removed")).as("rows_after"))

  /** EXECUTE the erasure over the ML stores: per store, rows
    * before / removed / after, where removal is membership in the
    * request set (conservation `after ≡ before − removed` is
    * structural, the [[RetailEtl.rtbfApply]] discipline).
    * When `annPath` names a persisted [[AnnIndex]] layout, the
    * subject's vectors are ALSO tombstoned there via the delete
    * lifecycle ([[AnnIndex.deleteIvf]]) — probes exclude them from
    * the next query on; compact/rebuild reclaims the bytes. */
  def rtbfMlApply(reqDocs: DataFrame, reqVecs: DataFrame,
                  fingerprints: DataFrame, winnowFps: DataFrame,
                  annVectors: DataFrame,
                  annPath: Option[String] = None): DataFrame = {
    annPath.foreach(p =>
      AnnIndex.deleteIvf(reqVecs.select("vec_id"), p))
    applyRow("fingerprints", fingerprints, "doc_id", reqDocs)
      .unionByName(applyRow("winnow_fps", winnowFps, "doc_id", reqDocs))
      .unionByName(applyRow("ann_vectors", annVectors, "vec_id", reqVecs))
  }
}
