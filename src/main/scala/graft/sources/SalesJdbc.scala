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
  * shape that scales. Bounds default to a min/max probe of the
  * partition column at read time (hardcoded defaults would silently
  * collapse parallelism: everything past a stale upperBound piles
  * into the last partition). `fetchsize` keeps each cursor streaming
  * instead of buffering the partition.
  */
object SalesJdbc {

  final case class Config(
      url: String,
      table: String = "online_sales",
      user: Option[String] = None,
      password: Option[String] = None,
      partitionColumn: String = "sale_id",
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 32,
      fetchSize: Int = 10000) {
    // never leak credentials through logs/exceptions
    override def toString: String =
      s"Config($url, $table, user=${user.map(_ => "***")}, " +
        s"password=${password.map(_ => "***")}, $partitionColumn, " +
        s"$bounds, $numPartitions, $fetchSize)"
  }

  private def baseOptions(cfg: Config): Map[String, String] =
    Map("url" -> cfg.url, "fetchsize" -> cfg.fetchSize.toString) ++
      cfg.user.map("user" -> _) ++
      cfg.password.map("password" -> _)

  /** The option map for `spark.read.format("jdbc")` — pure function,
    * unit-testable without a live database. Partitioning options are
    * emitted only when bounds are known; Spark rejects
    * `partitionColumn` without both bounds.
    */
  def options(cfg: Config): Map[String, String] =
    baseOptions(cfg) + ("dbtable" -> cfg.table) ++
      cfg.bounds.toSeq.flatMap { case (lo, hi) =>
        Seq(
          "partitionColumn" -> cfg.partitionColumn,
          "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString,
          "numPartitions" -> cfg.numPartitions.toString)
      }

  /** One-row probe for the partition bounds (pushed down to the
    * database as min/max — trivial for a btree-indexed key). None
    * when the table is empty (min/max are NULL): the caller falls
    * back to an unpartitioned read instead of NPE-ing.
    */
  def probeBounds(spark: SparkSession, cfg: Config): Option[(Long, Long)] = {
    val probe = spark.read.format("jdbc")
      .options(baseOptions(cfg) + ("dbtable" ->
        s"(SELECT min(${cfg.partitionColumn}) AS lo, max(${cfg.partitionColumn}) AS hi FROM ${cfg.table}) b"))
      .load()
      .collect()(0)
    if (probe.isNullAt(0) || probe.isNullAt(1)) None
    else Some((probe.getLong(0), probe.getLong(1)))
  }

  def read(spark: SparkSession, cfg: Config): DataFrame = {
    val bounded = if (cfg.bounds.isDefined) cfg
      else cfg.copy(bounds = probeBounds(spark, cfg))
    spark.read.format("jdbc").options(options(bounded)).load()
  }

  /** Full extract in the reference's transport format (stringified
    * columns, `yyyy-MM-dd` dates), ready for
    * [[graft.operators.RetailEtl.convertTyped]].
    */
  def extractOnlineSales(spark: SparkSession, cfg: Config): DataFrame =
    graft.operators.RetailEtl.asTransportStrings(
      graft.operators.RetailEtl.validateColumns(read(spark, cfg)))
}
