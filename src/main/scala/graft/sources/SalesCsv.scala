package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV source/sink for the reference's in-store sales files
  * (/root/reference/scripts/extraction.py:146-183 reads
  * `data/input/in_store_sales.csv`; loading.py:124-132 writes
  * `sales_summary.csv`).
  *
  * The reference reads with pandas then stringifies; here the schema
  * is declared up front so Spark never runs schema inference (an
  * extra full pass at 100 TB) and malformed rows are surfaced
  * per-record via PERMISSIVE mode instead of failing the batch.
  */
object SalesCsv {

  /** Declared input schema — matches in_store_sales.csv. Quantities
    * arrive as strings in the reference transport; we parse to typed
    * columns directly and let RetailEtl.asTransportStrings reproduce
    * the stringly format when needed.
    */
  val schema: StructType = StructType(Seq(
    StructField("sale_id", LongType),
    StructField("product_id", LongType),
    StructField("quantity", DoubleType),
    StructField("sale_amount", DoubleType),
    StructField("sale_date", DateType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("dateFormat", "yyyy-MM-dd")
      .schema(schema)
      .csv(path)

  /** Overwrite-sink mirroring loading.py's always-replaced CSV. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
