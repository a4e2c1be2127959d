package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** `collect_set` with a hard buffer cap: collects distinct longs up
  * to `cap` elements and then STOPS GROWING — the aggregation buffer
  * can never exceed `cap` entries no matter how many rows the group
  * has. A group whose true distinct count exceeds `cap` comes back
  * with exactly `cap` elements, so `size(result) = cap` is the
  * overflow marker.
  *
  * This is the single-pass form of the "count df first, collect
  * postings after" guard in [[graft.operators.Dedup]]: with
  * `cap = maxDf + 1`, a boilerplate gram shared by 10⁸ documents
  * costs a (maxDf+1)-element buffer instead of a 10⁸-element one,
  * and the df filter becomes `size(ids) BETWEEN 2 AND maxDf` — one
  * shuffle, one scan of the inverted index, bounded memory.
  *
  * Correctness of the cap under partial aggregation: inputs are
  * distinct per group by construction ((doc_id, gram) pairs are
  * unique), so partial buffers hold disjoint id sets; merging
  * truncates at `cap`, which can only under-report ids for groups
  * already past the cap — exactly the groups the caller discards.
  */
object BoundedCollectSetAgg {

  private class BoundedSet(cap: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    override def zero: Seq[Long] = Seq.empty
    override def reduce(b: Seq[Long], e: Long): Seq[Long] =
      if (b.length >= cap || b.contains(e)) b else b :+ e
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      if (a.length >= cap) a
      else ((a ++ b.filterNot(a.contains)): Seq[Long]).take(cap)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** `boundedCollectSet(col, cap)` — distinct values of a long
    * column, buffer-capped at `cap` elements. */
  def boundedCollectSet(value: Column, cap: Int): Column =
    udaf(new BoundedSet(cap), ExpressionEncoder[Long]()).apply(value)
}
