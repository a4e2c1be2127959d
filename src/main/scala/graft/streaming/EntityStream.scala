package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.EntityResolution

/** Streaming entity intake — arriving CRM records attach to the
  * persisted entity store per micro-batch (SURVEY §2.G × §2.A).
  *
  * The same replay-the-batch-kernel convention as
  * [[AnnStream.probeSink]]: each micro-batch runs the full
  * [[EntityResolution.attachToStore]] kernel against the store
  * relation, and the stream keeps ZERO state — each record's attach
  * decision depends only on itself and the store, never on its batch
  * cohort (within-batch resolution is deliberately deferred to the
  * nightly closure, see attachToStore's scaladoc), so nothing
  * carries across batches and batch-split invariance lets the stream
  * share `etl_entity_incremental`'s oracle verbatim.
  *
  * At 100 TB the per-batch cost is O(batch · block): the blocked
  * equi-join touches only the store partitions the batch's blocking
  * keys hash to, and the store never self-joins.
  */
object EntityStream {

  /** Streaming sink: attach each arriving record micro-batch to the
    * store and hand the labeled batch to `onBatch`. */
  def attachSink(deltaStream: DataFrame, store: DataFrame)
                (onBatch: DataFrame => Unit): StreamingQuery =
    deltaStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(EntityResolution.attachToStore(batch, store))
      }
      .start()

  /** Batch replay of the stream path (the driver key): the delta
    * split into `batches` deterministic micro-batches, each attached
    * independently, results unioned — exercising the batch-split
    * invariance that makes the stream share the incremental key's
    * oracle. */
  def attachReplay(delta: DataFrame, store: DataFrame,
                   batches: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    (0 until batches).map { i =>
      EntityResolution.attachToStore(
        delta.filter(pmod(xxhash64(col("rec_id")), lit(batches)) === i),
        store)
    }.reduce(_ unionByName _)
  }
}
