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
      // no explicit timestampFormat: Spark's lenient ISO-8601 parser
      // accepts 'Z'/offset suffixes and any fraction width — a fixed
      // pattern would quarantine those valid wire forms wholesale
      .json(path)

  /** (clean, quarantined): clean rows drop the corrupt column;
    * quarantined rows carry the raw offending line for replay. A
    * line is quarantined if it failed to parse OR parsed without
    * the key identity fields.
    *
    * The two branches are lazy filters over the same source — each
    * materialization re-reads the path (standard Spark laziness).
    * For exact clean ∪ quarantined ≡ input accounting, snapshot the
    * input (write both branches in one job, or read an immutable
    * directory) rather than materializing the branches at different
    * times against a moving directory.
    */
  def readWithQuarantine(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
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
