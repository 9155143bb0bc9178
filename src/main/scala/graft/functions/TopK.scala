package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into [[TopK]]. */
case class Scored(sim: Double, nn_id: Long)

/** Typed top-k-by-score aggregation (SURVEY §7.3's reserved custom piece
  * for similarity search): keeps the k best (sim DESC, nn_id ASC ties)
  * candidates per group in a bounded buffer.
  *
  * This is the scale-right ANN reduction: the window-function formulation
  * (`row_number over (partition by qid order by sim)`) shuffles EVERY
  * scored row to sort it, while an Aggregator is planned as a partial
  * aggregate — each map task prunes to k rows per group before the
  * exchange, so shuffle volume is k·groups·partitions regardless of
  * corpus size. Buffer is a k-bounded sorted list (k is small; insertion
  * beats a heap's constant factor and keeps merge trivial).
  */
class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  // descending sim with NaN ranked FIRST — matching Spark's `ORDER BY sim
  // DESC` (and DuckDB's), where NaN compares greater than any value; a
  // plain Ordering.by(-sim) would rank NaN last and silently diverge from
  // the window formulation on NaN cosines (zero-norm vectors)
  private val ord: Ordering[Scored] = new Ordering[Scored] {
    def compare(a: Scored, b: Scored): Int = {
      val c = java.lang.Double.compare(b.sim, a.sim)
      if (c != 0) c else java.lang.Long.compare(a.nn_id, b.nn_id)
    }
  }

  private def bound(xs: Seq[Scored]): Seq[Scored] = xs.sorted(ord).take(k)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size >= k && ord.lteq(buf.last, a)) buf else bound(buf :+ a)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    bound(b1 ++ b2)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[Scored]] = TopK.seqEncoder
  override def outputEncoder: Encoder[Seq[Scored]] = TopK.seqEncoder
}

object TopK {
  private[functions] val seqEncoder: Encoder[Seq[Scored]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[Scored]]()
  }
}
