package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines source for event streams — the wire format most
  * clickstream/webhook feeds arrive in before they become parquet.
  *
  * Same design rules as [[SalesCsv]]: the schema is DECLARED (no
  * inference pass — at 100 TB schema inference is a full extra scan),
  * and malformed lines are never allowed to kill the batch NOR to
  * vanish silently: PERMISSIVE mode routes them to
  * `_corrupt_record`, and [[readWithQuarantine]] splits the result
  * into (clean, quarantined) — the same dead-letter contract as
  * `RetailEtl.quarantine`.
  */
object EventsJson {

  /** Declared wire schema; `props` stays a raw JSON string (its keys
    * are producer-defined — parse at query time, not at ingest). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt_record", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS]")
      .json(path)

  /** (clean, quarantined): clean rows drop the corrupt column;
    * quarantined rows carry the raw offending line for replay. A
    * line is quarantined if it failed to parse OR parsed without
    * the key identity fields.
    */
  def readWithQuarantine(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    // json() lazily populates _corrupt_record; cache-free split via
    // two filters over the same scan
    val raw = read(spark, path)
    val bad = col("_corrupt_record").isNotNull ||
      col("event_id").isNull || col("ts").isNull
    val clean = raw.filter(!bad).drop("_corrupt_record")
    val quarantined = raw.filter(bad)
      .select(coalesce(col("_corrupt_record"),
        to_json(struct(raw.columns.filter(_ != "_corrupt_record").map(col): _*)))
        .as("raw_line"))
    (clean, quarantined)
  }
}
