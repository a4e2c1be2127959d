package graft
// scratch diagnostic (r17): timing the dq calibration aggregate shapes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
object DqShapeBench {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val cols = Seq("l_partkey", "l_returnflag", "l_shipdate", "l_quantity")
    import graft.operators.RetailEtl
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[dq] $name%-12s ${ts.min}%.3f  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("fused") { noop(RetailEtl.dqCalibration(li, cols)) }
    def oldCal(df: DataFrame): DataFrame =
      RetailEtl.dqProfile(df, cols)
        .join(RetailEtl.dqProfileApprox(df, cols)
          .select(col("col_name"), col("n_distinct").as("apx_distinct")), Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("null_frac"),
          (abs(col("apx_distinct") - col("n_distinct")) <=
            greatest(lit(2L), expr("n_distinct * 5 div 100"))).as("distinct_within_tol"))
    time("old-2scan") { noop(oldCal(li)) }
    def unpivotCal(df: DataFrame): DataFrame =
      df.select(expr("stack(4, " + cols.map(c =>
          s"'$c', CAST(`$c` AS STRING)").mkString(", ") + ") as (col_name, v)"))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col("v")).as("n_distinct"),
          approx_count_distinct(col("v"), 0.02).as("apx"))
    time("unpivot") { noop(unpivotCal(li)) }
    time("exact-only") { noop(RetailEtl.dqProfile(li, cols)) }
    time("apx-only") { noop(RetailEtl.dqProfileApprox(li, cols)) }
    spark.stop()
  }
}
