package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** Buffer invariants of the partial top-k aggregate: sorted, bounded by
  * k, tie-broken by id, merge-order independent.
  */
class TopKAggSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private def agg = new TopKAgg(3)

  test("reduce keeps the buffer sorted, deduped by rank rules, and ≤ k") {
    val items = Seq(
      ScoredVec(1, 0.5), ScoredVec(2, 0.9), ScoredVec(3, 0.1),
      ScoredVec(4, 0.9), ScoredVec(5, 0.7))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    // ties on 0.9 break by smaller vec_id first
    assert(buf == Seq(ScoredVec(2, 0.9), ScoredVec(4, 0.9), ScoredVec(5, 0.7)))
  }

  test("below-floor inserts are no-ops once full") {
    val full = Seq(ScoredVec(1, 0.9), ScoredVec(2, 0.8), ScoredVec(3, 0.7))
    assert(agg.reduce(full, ScoredVec(9, 0.1)) eq full)
  }

  test("merge is order-independent") {
    val xs = (1 to 20).map(i => ScoredVec(i.toLong, (i * 37 % 11) / 10.0))
    val (l, r) = xs.splitAt(7)
    val b1 = l.foldLeft(agg.zero)(agg.reduce)
    val b2 = r.foldLeft(agg.zero)(agg.reduce)
    val direct = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b1, b2) == direct)
    assert(agg.merge(b2, b1) == direct)
  }

  test("k=1 and empty buffers behave") {
    val a1 = new TopKAgg(1)
    assert(a1.merge(a1.zero, a1.zero) == Nil)
    assert(a1.reduce(a1.zero, ScoredVec(5, 0.2)) == Seq(ScoredVec(5, 0.2)))
    assert(a1.reduce(Seq(ScoredVec(5, 0.2)), ScoredVec(6, 0.3)) ==
      Seq(ScoredVec(6, 0.3)))
  }
}
