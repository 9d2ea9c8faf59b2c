package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory "approximate top-k frequent items" aggregate that no
  * built-in expresses (extension preference (b): custom typed aggregate
  * before custom plan nodes).
  *
  * The buffer never exceeds `capacity` counters regardless of input
  * cardinality, and buffers merge associatively — so at 100 TB each
  * partition carries O(capacity) state and the final merge is cheap,
  * where an exact groupBy-count would shuffle every distinct token.
  * Guarantee: any item with frequency > n/capacity survives, and counts
  * are undercounted by at most n/capacity (estimates are
  * merge-order-dependent within that bound, hence spec-gated, not
  * oracle-gated).
  */
class TopKFreq(k: Int, capacity: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(capacity >= k, "capacity must be at least k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) buf
    else buf.get(item) match {
      case Some(n) => buf.updated(item, n + 1)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None => // decrement-all step: drop zeroed counters
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, n)) => m.updated(t, m.getOrElse(t, 0L) + n) }
    if (summed.size <= capacity) summed
    else { // keep the top `capacity` counters, offset by the evicted max
      val sorted = summed.toSeq.sortBy { case (t, n) => (-n, t) }
      val cut = sorted(capacity)._2
      sorted.take(capacity).map { case (t, n) => t -> (n - cut) }.filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).map(_._1)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object TopKFreq {
  /** Column API: approximate top-k frequent strings in `c`. */
  def top_k_freq(c: Column, k: Int, capacity: Int = 256): Column =
    udaf(new TopKFreq(k, capacity)).apply(c)
}
