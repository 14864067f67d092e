package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (candidate, score) pair entering the top-k aggregate. */
final case class ScoredVec(vec_id: Long, cos: Double)

/** Partial-aggregating top-k by (score desc, id asc) — the UDAF surface
  * (SURVEY §2.2) and the scale-correct alternative to a
  * `row_number().over(Window.partitionBy(query))` top-k: the window form
  * shuffles and sorts EVERY scored pair (at 100 TB: the full n×q score
  * matrix), while an Aggregator keeps at most k rows per group per map
  * task and merges k-sized buffers on the reduce side — shuffle volume
  * is O(groups × k), independent of candidate count.
  *
  * The buffer invariant: always sorted by (cos desc, vec_id asc) and at
  * most k long — `reduce` inserts only when the candidate beats the
  * current floor, so per-row work is O(k) worst case and O(1) for the
  * common below-floor case.
  */
final class TopKAgg(k: Int)(implicit seqEnc: Encoder[Seq[ScoredVec]])
  extends Aggregator[ScoredVec, Seq[ScoredVec], Seq[ScoredVec]] {

  private def better(a: ScoredVec, b: ScoredVec): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.vec_id < b.vec_id)

  override def zero: Seq[ScoredVec] = Vector.empty

  override def reduce(buf: Seq[ScoredVec], in: ScoredVec): Seq[ScoredVec] =
    if (buf.size >= k && better(buf.last, in)) buf
    else {
      val i = buf.indexWhere(b => better(in, b)) match {
        case -1 => buf.size
        case x  => x
      }
      (buf.take(i) :+ in) ++ buf.drop(i).take(k - i - 1)
    }

  override def merge(b1: Seq[ScoredVec], b2: Seq[ScoredVec]): Seq[ScoredVec] =
    b2.foldLeft(b1)(reduce)

  override def finish(buf: Seq[ScoredVec]): Seq[ScoredVec] = buf

  // Buffer rides the shuffle opaquely (kryo); the OUTPUT uses the
  // product-seq encoder so callers get a real array<struct<vec_id,cos>>
  // column they can posexplode.
  override def bufferEncoder: Encoder[Seq[ScoredVec]] =
    Encoders.kryo[Seq[ScoredVec]]

  override def outputEncoder: Encoder[Seq[ScoredVec]] = seqEnc
}
