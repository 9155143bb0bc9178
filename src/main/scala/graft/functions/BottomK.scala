package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bottom-k-distinct-strings aggregation — the bottom-k (KMV)
  * sketch primitive behind `source_overlap`.
  *
  * Keeps the k lexicographically smallest DISTINCT input strings per
  * group in a bounded sorted buffer. Like [[TopK]], the Aggregator form
  * is the scale-right spelling: a `row_number() OVER (PARTITION BY
  * group ORDER BY h)` window funnels EVERY hash row into #groups tasks
  * (and corpus sources are few — hot by construction), while this is
  * planned as a partial aggregate, each map task pruning to k strings
  * before the exchange. Shuffle volume is k·groups·partitions whatever
  * the corpus size. Deduplication happens inside the buffer, so callers
  * need no distinct() shuffle upstream either — the whole sketch is ONE
  * partial-aggregable pass over raw hash rows.
  */
class BottomK(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {

  // sorted ascending, distinct, bounded at k
  private def bound(xs: Seq[String]): Seq[String] = xs.distinct.sorted.take(k)

  override def zero: Seq[String] = Vector.empty

  override def reduce(buf: Seq[String], a: String): Seq[String] =
    if (a == null) buf
    else if (buf.size >= k && buf.last <= a) buf // covers duplicates of last
    else if (buf.contains(a)) buf
    else bound(buf :+ a)

  override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] =
    bound(b1 ++ b2)

  override def finish(buf: Seq[String]): Seq[String] = buf

  override def bufferEncoder: Encoder[Seq[String]] = BottomK.seqEncoder
  override def outputEncoder: Encoder[Seq[String]] = BottomK.seqEncoder
}

object BottomK {
  private[functions] val seqEncoder: Encoder[Seq[String]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[String]]()
  }
}
