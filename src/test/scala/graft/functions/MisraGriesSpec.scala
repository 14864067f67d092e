package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** The Misra–Gries mergeable-summary GUARANTEE, not just the happy
  * path: q135's exactness argument rests on "every token with true
  * count > N/(k+1) has a live counter after ANY partition/merge
  * schedule" — so that is what gets property-tested, over random
  * streams, random partitionings, and random merge orders, plus the
  * undercount bound and a distributed end-to-end superset check.
  */
class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark

  import scala.collection.mutable

  private def buf(kv: (String, Long)*): mutable.HashMap[String, Long] =
    mutable.HashMap(kv: _*)

  private def runSchedule(
      stream: Seq[String], k: Int, parts: Int,
      rnd: scala.util.Random): collection.Map[String, Long] = {
    val agg = new MisraGriesAgg(k)(null) // encoders unused off-plan
    // Random contiguous partitioning (preserves per-partition stream
    // order, as Spark's map tasks do), then a random binary merge tree.
    val cuts = (Seq(0, stream.size) ++
      Seq.fill(parts - 1)(rnd.nextInt(stream.size + 1))).sorted
    var bufs = cuts.zip(cuts.tail).map { case (a, b) =>
      stream.slice(a, b).foldLeft(agg.zero)(agg.reduce)
    }.toVector
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size - 1)
      bufs = (bufs.take(i) :+ agg.merge(bufs(i), bufs(i + 1))) ++
        bufs.drop(i + 2)
    }
    bufs.head
  }

  test("guarantee: count > N/(k+1) always survives; undercount <= N/(k+1)") {
    val rnd = new scala.util.Random(20260814L)
    val k = 8
    for (trial <- 1 to 60) {
      // Skewed vocabulary much larger than k, stream length 200..2000.
      val n = 200 + rnd.nextInt(1800)
      val vocab = 5 + rnd.nextInt(40)
      val stream = Seq.fill(n) {
        // Zipf-ish: low ids much more frequent.
        val z = math.min(vocab - 1,
          (math.pow(rnd.nextDouble(), 2.5) * vocab).toInt)
        s"w$z"
      }
      val truth = stream.groupBy(identity).map { case (w, xs) =>
        (w, xs.size.toLong) }
      val summary = runSchedule(stream, k, 1 + rnd.nextInt(7), rnd)
      assert(summary.size <= k, s"trial $trial: summary exceeded k")
      val bound = n.toDouble / (k + 1)
      truth.foreach { case (w, c) =>
        if (c > bound)
          assert(summary.contains(w),
            s"trial $trial: heavy token $w (count $c > $bound) lost")
      }
      summary.foreach { case (w, est) =>
        val c = truth(w)
        assert(est <= c, s"trial $trial: $w overcounted ($est > $c)")
        assert(c - est <= bound + 1e-9,
          s"trial $trial: $w undercount ${c - est} exceeds $bound")
      }
    }
  }

  test("merge is summary-safe: empty identity, k respected, order-free guarantee") {
    val agg = new MisraGriesAgg(4)(null)
    val m = Seq("a", "a", "b", "c").foldLeft(agg.zero)(agg.reduce)
    // merge mutates its FIRST argument in place (the Aggregator
    // contract), so identity is asserted on content snapshots of
    // cloned inputs, not object equality.
    val snap = m.toMap
    assert(agg.merge(m.clone(), agg.zero).toMap == snap)
    assert(agg.merge(agg.zero, m.clone()).toMap == snap)
    // Merging two full summaries subtracts the (k+1)-th largest value
    // and keeps at most k strictly positive counters.
    val m1 = buf("a" -> 5L, "b" -> 3L, "c" -> 1L, "d" -> 1L)
    val m2 = buf("e" -> 4L, "f" -> 2L, "a" -> 1L, "g" -> 1L)
    val merged = agg.merge(m1, m2)
    assert(merged.size <= 4 && merged.values.forall(_ > 0))
    assert(merged.contains("a"), "dominant key must survive the spill")
  }

  test("finish orders by (est desc, token asc) deterministically") {
    val agg = new MisraGriesAgg(8)(null)
    val out = agg.finish(buf("b" -> 2L, "a" -> 2L, "c" -> 5L))
    assert(out.map(_.token) == Seq("c", "a", "b"))
  }

  test("distributed superset: sketch candidates cover all true heavy tokens") {
    import spark.implicits._
    val mg = udaf(new MisraGriesAgg(64))
    val tok = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(7, $"doc_id") // force multiple partials + merges
      .select(explode(expr("array_remove(split(text, ' '), '')")).as("w"))
    val cands = tok.agg(mg($"w").as("s"))
      .select(explode($"s.token").as("w")).as[String].collect().toSet
    val counts = tok.groupBy($"w").count().as[(String, Long)].collect()
    val n = counts.map(_._2).sum
    val heavy = counts.filter(_._2 * 65 > n).map(_._1).toSet
    assert(heavy.nonEmpty, "fixture should have at least one heavy token")
    assert(heavy.subsetOf(cands),
      s"sketch lost heavy tokens: ${heavy -- cands}")
  }
}
