package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The sorted-dictionary MinHash variant is outside the driver contract
  * (its vocabulary broadcast + global id sort is not a 100 TB plan) —
  * this spec is its gate, pinning it against the shipped dictionary-free
  * q22b the way q17's exact percentiles witness q17b.
  *
  * The two formulations hash shingles into different id spaces, so their
  * LSH candidate sets may differ slightly; the verify stage computes the
  * exact same Jaccard either way. Hence: identical jaccard on common
  * pairs, near-total overlap, and every reported pair ≥ the 0.6 cut.
  */
class MinhashDictWitnessSpec extends AnyFunSuite {

  private lazy val spark = graft.gsheets.Fixtures.spark

  test("dictionary-id variant agrees with q22b on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val dict = pairs(PipelineQueries.minhashDictVariant(spark, dir))
    val nodict = pairs(
      PipelineQueries.queries("q22b_minhash_nodict")(spark, dir))

    assert(dict.nonEmpty && nodict.nonEmpty)
    (dict.values ++ nodict.values).foreach(j => assert(j >= 0.6))

    val common = dict.keySet.intersect(nodict.keySet)
    common.foreach { k =>
      assert(dict(k) == nodict(k), s"jaccard differs on $k")
    }
    // Different minhash id spaces → slightly different candidate recall;
    // anything below 90% overlap means a formulation broke, not LSH luck.
    assert(common.size >= 0.9 * math.max(dict.size, nodict.size),
      s"overlap ${common.size} of ${dict.size}/${nodict.size}")
  }
}
