package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.RetailEtl

/** Streaming load stage: the reference's idempotent
  * `INSERT … ON DUPLICATE KEY UPDATE` sink
  * (/root/reference/scripts/loading.py:25-32), run continuously —
  * each micro-batch is merged into the parquet summary by key via
  * `foreachBatch` + [[RetailEtl.upsertSummary]].
  *
  * The read-merge-overwrite cycle materializes the existing summary
  * (localCheckpoint) before overwriting the path it came from —
  * fine for summary-sized state; a production deployment at table
  * scale would swap in an ACID table format (the merge semantics and
  * this sink's shape are unchanged).
  */
object StreamingLoad {

  def upsertSink(updates: DataFrame, path: String, checkpoint: String,
                 keys: Seq[String] = Seq("product_id")): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // Hadoop FS, not java.io.File: the path may be s3://, hdfs://,
        // or resolved against a non-local defaultFS
        val hPath = new org.apache.hadoop.fs.Path(path)
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(hPath)) {
            // pin the current state off the files we're about to replace
            val existing = spark.read.parquet(path).localCheckpoint(true)
            RetailEtl.upsertSummary(existing, batch, keys)
          } else batch
        merged.write.mode("overwrite").parquet(path)
      }
      .start()
}
