package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** [[CappedCollect]] must be output-equivalent to the r19
  * collect_list-then-filter pair-generation shape it replaces (same
  * survivor keys, same sorted lists) while holding only O(cap) state —
  * the hot-key (over-cap) groups must come back EMPTY, exactly the
  * groups the old `size(docs) <= cap` filter dropped.
  */
class CappedCollectSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  test("agg ≡ collect_list-then-filter on a corpus with over-cap hot keys") {
    val rnd = new scala.util.Random(7)
    // sid 0 is HOT (400 postings, way over cap 5); sids 1..40 carry
    // 1..8 postings each so both sides of the cap boundary appear.
    val rows = (0 until 400).map(i => (0L, i.toLong, (i % 7).toLong)) ++
      (1 to 40).flatMap { sid =>
        (0 until (rnd.nextInt(8) + 1)).map(j =>
          (sid.toLong, (sid * 100 + j).toLong, rnd.nextInt(9).toLong))
      }
    val df = rows.toDF("sid", "doc_id", "n").repartition(5, $"sid")

    val cap = 5
    val want = df.groupBy($"sid")
      .agg(sort_array(collect_list(struct($"doc_id", $"n"))).as("docs"))
      .filter(size($"docs") <= cap)
      .collect().map(r => (r.getLong(0), r.getSeq[Any](1).toList)).toMap

    val capped = udaf(new CappedCollect[PostingN](cap))
    val got = df.groupBy($"sid")
      .agg(capped($"doc_id", $"n").as("docs0"))
      .filter(size($"docs0") > 0)
      .select($"sid", sort_array($"docs0").as("docs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Any](1).toList)).toMap

    assert(!want.contains(0L), "fixture must have an over-cap hot key")
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(got(k).toString == v.toString,
      s"sid $k: ${got(k)} != $v")
  }

  test("a merge that crosses the cap overflows (map-side partials)") {
    // 2 partitions × 3 postings of one sid: each partial is under the
    // cap of 5, the merged group is 6 — must drop.
    val df = (0 until 6).map(i => (1L, i.toLong, 0L))
      .toDF("sid", "doc_id", "n").repartition(2)
    val capped = udaf(new CappedCollect[PostingN](5))
    val out = df.groupBy($"sid").agg(capped($"doc_id", $"n").as("d"))
      .filter(size($"d") > 0).collect()
    assert(out.isEmpty, "6 postings across partials must overflow cap 5")
  }
}
