package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source for the reference's online-sales extract
  * (/root/reference/scripts/extraction.py:98-144 reads the
  * `online_sales` Postgres table; extraction.py:60-68 stringifies
  * every column for transport).
  *
  * Unlike the reference's single-cursor `get_pandas_df`, the read is
  * range-partitioned on `partitionColumn` so a 100 TB-era table
  * lands as `numPartitions` parallel cursors — the only JDBC read
  * shape that scales. `fetchsize` keeps each cursor streaming
  * instead of buffering the partition.
  */
object SalesJdbc {

  final case class Config(
      url: String,
      table: String = "online_sales",
      user: Option[String] = None,
      password: Option[String] = None,
      partitionColumn: String = "sale_id",
      lowerBound: Long = 0L,
      upperBound: Long = 1000000L,
      numPartitions: Int = 32,
      fetchSize: Int = 10000)

  /** The option map for `spark.read.format("jdbc")` — pure function,
    * unit-testable without a live database. */
  def options(cfg: Config): Map[String, String] =
    Map(
      "url" -> cfg.url,
      "dbtable" -> cfg.table,
      "partitionColumn" -> cfg.partitionColumn,
      "lowerBound" -> cfg.lowerBound.toString,
      "upperBound" -> cfg.upperBound.toString,
      "numPartitions" -> cfg.numPartitions.toString,
      "fetchsize" -> cfg.fetchSize.toString) ++
      cfg.user.map("user" -> _) ++
      cfg.password.map("password" -> _)

  def read(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.format("jdbc").options(options(cfg)).load()

  /** Full extract in the reference's transport format (stringified
    * columns, `yyyy-MM-dd` dates), ready for
    * [[graft.operators.RetailEtl.convertTyped]].
    */
  def extractOnlineSales(spark: SparkSession, cfg: Config): DataFrame =
    graft.operators.RetailEtl.asTransportStrings(
      graft.operators.RetailEtl.validateColumns(read(spark, cfg)))
}
