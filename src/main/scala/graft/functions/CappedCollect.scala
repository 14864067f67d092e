package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.reflect.ClassTag

/** Bounded-state `collect_list` for the rare-key pair generators
  * (VERDICT r19 #7, guide §2.5 skew).
  *
  * The r19 shape — `groupBy(sid).agg(collect_list(...))` THEN
  * `filter(size(docs) <= cap)` — is output-correct but buffers a hot
  * key's ENTIRE posting list in one aggregation buffer before the cap
  * can drop it: a stopword shingle at 100 TB is a single-task OOM (the
  * same buffered-aggregate failure mode the r19 q60 200k witness
  * DNF'd on). This Aggregator enforces the cap INSIDE the aggregation:
  * the buffer holds at most `cap` items, the (cap+1)-th arrival (or a
  * merge that would exceed cap) flips a sticky overflow flag and drops
  * the items immediately, and an overflowed group finishes as an EMPTY
  * list — indistinguishable output-wise from the old collect-then-
  * filter (a surviving group always has ≥ 1 item, so `size(..) > 0` is
  * exactly the old `size(..) <= cap` survivor set), with O(cap) state
  * per group on every path (map-side partials included).
  *
  * Output order is arrival order — callers sort (`sort_array`) exactly
  * as they sorted the old collect_list. `CappedCollectSpec` pins
  * agg ≡ collect-then-filter on corpora with over-cap hot keys.
  */
final case class CapBuf[T](items: Vector[T], over: Boolean)

final class CappedCollect[T](cap: Int)(implicit seqEnc: Encoder[Seq[T]],
    bufTag: ClassTag[CapBuf[T]])
  extends Aggregator[T, CapBuf[T], Seq[T]] {

  override def zero: CapBuf[T] = CapBuf(Vector.empty, over = false)

  override def reduce(b: CapBuf[T], x: T): CapBuf[T] =
    if (b.over) b
    else if (b.items.size >= cap) CapBuf(Vector.empty, over = true)
    else CapBuf(b.items :+ x, over = false)

  override def merge(a: CapBuf[T], b: CapBuf[T]): CapBuf[T] =
    if (a.over || b.over || a.items.size + b.items.size > cap)
      CapBuf(Vector.empty, over = true)
    else CapBuf(a.items ++ b.items, over = false)

  override def finish(b: CapBuf[T]): Seq[T] =
    if (b.over) Vector.empty else b.items

  override def bufferEncoder: Encoder[CapBuf[T]] = Encoders.kryo[CapBuf[T]]

  override def outputEncoder: Encoder[Seq[T]] = seqEnc
}

/** Input rows for [[CappedCollect]] at its two call sites — field names
  * are part of the contract (downstream pair transforms reference
  * x.doc_id / x.n / x.tf / x.n2). */
final case class PostingN(doc_id: Long, n: Long)
final case class PostingTf(doc_id: Long, tf: Long, n2: Long)
