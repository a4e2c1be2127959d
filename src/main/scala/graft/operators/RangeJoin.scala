package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — the operator Spark's optimizer lacks: a
  * plain `points JOIN intervals ON ts BETWEEN lo AND hi` has no equi
  * key, so Catalyst plans a broadcast-nested-loop or cartesian
  * product, O(|points|·|intervals|).
  *
  * The binned plan makes it an equi-join: pick a bin width on the
  * time axis, put each point in its one bin, explode each interval
  * over the bins it covers, equi-join on the bin, and re-check the
  * exact predicate. Every qualifying (point, interval) pair meets in
  * EXACTLY one bin — the point's — so no dedup pass is needed, and
  * the shuffle key (the bin) spreads load across the whole time
  * axis. Cost: |points| + Σ(interval span / binWidth) join rows —
  * pick binWidth near the typical interval length so intervals
  * explode to O(1) bins each.
  */
object RangeJoin {

  /** Join each point row to every interval row with
    * `lo ≤ ts < hi` (end-exclusive). `binSeconds` is the time-axis
    * bucket; both sides may carry arbitrary payload columns (they
    * must not share names other than the join inputs).
    */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binSeconds: Long = 3600L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    // TIMESTAMP_NTZ has no direct BIGINT cast; the hop through
    // TIMESTAMP is value-preserving in the UTC session (and a no-op
    // for TIMESTAMP inputs)
    def epochBin(c: String) =
      expr(s"CAST(CAST($c AS TIMESTAMP) AS BIGINT) div ${binSeconds}L")
    val binned = points.withColumn("graft_bin", epochBin(tsCol))
    // hi is exclusive, but an interval ending exactly on a bin edge
    // still explodes to that bin (harmless: the exact filter drops it)
    val ibinned = intervals.withColumn("graft_bin",
      explode(sequence(epochBin(loCol), epochBin(hiCol))))
    binned.join(ibinned, Seq("graft_bin"))
      .filter(col(tsCol) >= col(loCol) && col(tsCol) < col(hiCol))
      .drop("graft_bin")
  }

  /** Events within a trailing window after each trigger event: for
    * every `triggerType` event, the per-type counts of ALL events in
    * `[trigger_ts, trigger_ts + windowSeconds)` — impact analysis of
    * error/deploy/alert moments, a non-aligned interval join (window
    * edges are event times, not clock boundaries).
    */
  def eventImpactWindows(events: DataFrame, triggerType: String = "error",
                         windowSeconds: Long = 300L): DataFrame = {
    val windows = events.filter(col("event_type") === triggerType)
      .select(col("event_id").as("window_id"), col("ts").as("w_lo"),
        (col("ts") + expr(s"INTERVAL $windowSeconds SECONDS")).as("w_hi"))
    pointInInterval(events.select("ts", "event_type"), "ts",
      windows, "w_lo", "w_hi", binSeconds = windowSeconds)
      .groupBy("window_id", "event_type")
      .agg(count(lit(1)).as("n_events"))
  }
}
