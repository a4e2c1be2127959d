package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory deterministic k-sample as a typed [[Aggregator]]:
  * keeps the k elements with the smallest sampling keys per group.
  *
  * Same semantics as ranking by `Sampling.sampleKey` and keeping
  * rank ≤ k (so the two share an oracle), but a different — better —
  * plan: a hash aggregate with partial merge (each map task reduces
  * its slice to ≤ k candidates before the exchange) instead of a
  * full window sort-shuffle of every row. At 100 TB the shuffle
  * carries |groups|·k rows, not the corpus.
  *
  * Determinism: the caller supplies the sampling key (hash of id +
  * salt); ties break by id, so results are partitioning- and
  * retry-invariant — "reservoir" in memory-bound shape, not in
  * rand()-semantics.
  */
object ReservoirAgg {

  final case class KeyId(key: String, id: Long)

  private class SmallestK(k: Int)
    extends Aggregator[KeyId, Seq[(String, Long)], Seq[Long]] {
    require(k >= 1, s"k must be >= 1, got $k") // b.last below assumes nonempty-when-full
    private def cap(s: Seq[(String, Long)]): Seq[(String, Long)] =
      s.sortBy(identity).take(k)
    override def zero: Seq[(String, Long)] = Seq.empty
    private val ord = Ordering.Tuple2[String, Long]
    override def reduce(b: Seq[(String, Long)], e: KeyId): Seq[(String, Long)] =
      // null sampling keys can't be ordered — skip them, matching the
      // window variant's behavior of never selecting an unrankable row
      if (e == null || e.key == null) b
      else if (b.size < k || ord.lt((e.key, e.id), b.last)) cap(b :+ (e.key -> e.id))
      else b
    override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
      cap(a ++ b)
    override def finish(b: Seq[(String, Long)]): Seq[Long] = b.map(_._2)
    override def bufferEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** `smallestKByKey(key, id, k)` — array of the ids of the group's
    * k smallest (key, id) pairs, in key order. */
  def smallestKByKey(key: Column, id: Column, k: Int): Column =
    udaf(new SmallestK(k), ExpressionEncoder[KeyId]()).apply(key, id)
}
