package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Data-lake layout utilities — the physical-design levers that
  * decide whether a 100 TB join shuffles or not.
  *
  *  - [[writeBucketed]]: hash-bucketed + sorted table. Two tables
  *    bucketed by the same key into the same bucket count join with
  *    NO exchange (and with sortBy, no sort either) — the shuffle is
  *    paid once at write time, amortized over every later join.
  *  - [[writePartitioned]]: directory-partitioned parquet; filters
  *    on partition columns prune entire directories at planning time
  *    (`PartitionFilters` in the scan, zero I/O for pruned values).
  *  - [[compact]]: rewrite a dataset into `numFiles` files — the
  *    small-files fix after streaming/incremental ingestion.
  */
object Lake {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def compact(spark: SparkSession, path: String, outPath: String, numFiles: Int): Unit =
    spark.read.parquet(path).repartition(numFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
}
