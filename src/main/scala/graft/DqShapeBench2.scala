package graft
// scratch diagnostic (r17): stream calibration keys in isolation
import org.apache.spark.sql.functions._
object DqShapeBench2 {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.1")
    import graft.streaming.EventStream
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[dq2] $name%-16s ${ts.min}%.3f  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cols = Seq("user_id", "event_type", "value")
    time("state-cal(new)") { noop(EventStream.dqStateCalibration(ev, cols)) }
    // the r16 spelling: plain CAST, no float normalization
    def oldCal = ev
      .select(expr("stack(3, " + cols.map(c =>
        s"'$c', CAST(`$c` AS STRING)").mkString(", ") + ") as (col_name, v)"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        approx_count_distinct(col("v"), 0.02).as("apx"))
    time("state-cal(r16)") { noop(oldCal) }
    time("sliding-actives") { noop(EventStream.slidingActivesCalibration(ev)) }
    spark.stop()
  }
}
