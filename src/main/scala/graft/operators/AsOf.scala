package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent
  * right row with `right.time <= left.time` within the same key
  * group. Spark has no native ASOF operator; the scalable encoding
  * is union + ordered window:
  *
  *  1. tag both inputs and union them (schemas aligned with nulls),
  *  2. one shuffle: partition by key, order by (time, side, tie),
  *     right rows sorting before left rows at equal timestamps
  *     (inclusive `<=` semantics, matching ANSI/DuckDB ASOF),
  *  3. `last(col, ignoreNulls)` carries the latest right values
  *     forward to each left row.
  *
  * Cost is a single sort-shuffle of |left| + |right| — no range-join
  * explosion, no per-key collect, skew bounded by the hottest key
  * (salt upstream via [[Skew]] if one key dominates).
  */
object AsOf {

  /** @param keys        equi-join key columns (present in both inputs)
    * @param timeCol     event-time column name (present in both inputs)
    * @param rightValues right columns to carry (emitted as
    *                    `asof_<name>`, null when no prior right row)
    * @param tieBreak    right-side column ordering rows that share a
    *                    timestamp (latest wins), e.g. a sequence id
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String], timeCol: String,
           rightValues: Seq[String], tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideCol = "__asof_side"
    val tieCol = "__asof_tie"

    val taggedLeft = left
      .withColumn(sideCol, lit(1))
      .withColumn(tieCol, lit(null).cast("long"))
    val taggedRight = right.select(
      (keys :+ timeCol).map(col) ++
        rightValues.map(c => col(c).as(s"asof_$c")) :+
        tieBreak.fold(lit(0L))(col(_).cast("long")).as(tieCol): _*)
      .withColumn(sideCol, lit(0))

    val unified = taggedLeft
      .select(
        leftCols.map(col) ++
          rightValues.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")) :+
          col(sideCol) :+ col(tieCol): _*)
      .unionByName(
        taggedRight.select(
          leftCols.map(c =>
            if (keys.contains(c) || c == timeCol) col(c)
            else lit(null).cast(left.schema(c).dataType).as(c)) ++
            rightValues.map(c => col(s"asof_$c")) :+
            col(sideCol) :+ col(tieCol): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(sideCol).asc, col(tieCol).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightValues.foldLeft(unified)((df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w)))

    carried
      .filter(col(sideCol) === 1)
      .select(leftCols.map(col) ++ rightValues.map(c => col(s"asof_$c")): _*)
  }
}
