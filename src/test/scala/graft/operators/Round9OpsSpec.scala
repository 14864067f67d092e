package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the round-9 additions: cohort retention (q111), the
  * per-source KS drift statistic (q112), corpus-adaptive phrase search
  * (q113), tokenizer fertility (q114), held-out n-gram coverage (q115)
  * and similarity-graph PageRank (q116). Exact values are pinned by the
  * DuckDB oracle; these recompute the contracts independently (driver-
  * side reimplementations over the tiny sf0.001 fixture) so they hold
  * on any corpus.
  */
class Round9OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def words(text: String): Array[String] =
    text.split(' ').filter(_.nonEmpty)

  test("q111: offset-0 rows equal cohort size; matrix recomputes") {
    val out = RelationalQueries.queries("q111_cohort_retention")(spark, dir)
      .collect()
    // Independent recompute from the raw events.
    val wk = Tables(spark, dir).events
      .select($"user_id",
        expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7")
          .as("week"))
      .distinct().as[(Long, Long)].collect()
    val cohort = wk.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val nCohort = cohort.values.groupBy(identity).map { case (w, us) => w -> us.size.toLong }
    val nActive = wk.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, rows) => k -> rows.size.toLong }
    assert(out.length == nActive.size)
    out.foreach { r =>
      val cw = r.getAs[Long]("cohort_week")
      val off = r.getAs[Long]("week_offset")
      assert(r.getAs[Long]("n_cohort") == nCohort(cw))
      assert(r.getAs[Long]("n_active") == nActive((cw, off)))
      if (off == 0L) // every user is active in its own cohort week
        assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_cohort"))
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
      assert(ret == math.floor(
        nActive((cw, off)).toDouble / nCohort(cw) * 10000 + 0.5) / 10000)
    }
  }

  test("q112: KS statistic recomputes from the raw length lists") {
    val out = PipelineQueries.queries("q112_ks_distance")(spark, dir)
      .collect()
    val lens = Tables(spark, dir).documents
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val grid = lens.map(_._2).distinct.sorted
    val nAll = lens.length.toLong
    val bySource = lens.groupBy(_._1)
    assert(out.length == bySource.size)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = bySource(src).map(_._2)
      assert(r.getAs[Long]("n_docs") == mine.length.toLong)
      val d = grid.map { x =>
        val cs = mine.count(_ <= x).toDouble / mine.length
        val cg = lens.count(_._2 <= x).toDouble / nAll
        math.abs(cs - cg)
      }.max
      assert(r.getAs[Double]("ks") == math.floor(d * 1e6 + 0.5) / 1e6,
        s"KS mismatch for $src")
      assert(r.getAs[Double]("ks") >= 0.0 && r.getAs[Double]("ks") <= 1.0)
    }
  }

  test("q113: phrase is the modal bigram; top-10 recomputes exactly") {
    val out = PipelineQueries.queries("q113_phrase_search")(spark, dir)
      .collect()
    val docs = Tables(spark, dir).documents
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val bigrams = docs.flatMap { case (id, t) =>
      words(t).sliding(2).filter(_.length == 2)
        .map(p => (id, p.mkString(" "))).toSeq
    }
    val phrase = bigrams.groupBy(_._2).map { case (b, xs) => (b, xs.size) }
      .toSeq.minBy { case (b, c) => (-c, b) }._1
    val perDoc = bigrams.filter(_._2 == phrase)
      .groupBy(_._1).map { case (id, xs) => (id, xs.size.toLong) }
    val expect = perDoc.toSeq.sortBy { case (id, n) => (-n, id) }.take(10)
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (r, (id, n)) =>
      assert(r.getAs[String]("phrase") == phrase)
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Long]("n_matches") == n)
    }
  }

  test("q114: per-lang sums recompute from a driver-side regex scan") {
    val out = PipelineQueries.queries("q114_tokenizer_fertility")(spark, dir)
      .collect()
    val re = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+".r
    val docs = Tables(spark, dir).documents
      .select($"lang", $"text").as[(String, String)].collect()
    val byLang = docs.groupBy(_._1)
    assert(out.length == byLang.size)
    out.foreach { r =>
      val mine = byLang(r.getAs[String]("lang"))
      val ws = mine.map(d => words(d._2).length.toLong).sum
      val bp = mine.map(d => re.findAllIn(d._2).length.toLong).sum
      assert(r.getAs[Long]("n_docs") == mine.length.toLong)
      assert(r.getAs[Long]("n_ws_tokens") == ws)
      assert(r.getAs[Long]("n_bpe_tokens") == bp)
      assert(r.getAs[Double]("fertility") ==
        math.floor(bp.toDouble / ws * 10000 + 0.5) / 10000)
    }
  }

  test("q115: only held-out docs appear; coverage recomputes on strings") {
    val out = PipelineQueries.queries("q115_ngram_coverage")(spark, dir)
      .collect()
    val docs = Tables(spark, dir).documents
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sets = docs.map { case (id, t) =>
      id -> words(t).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSet
    }.toMap
    val train = sets.filter(_._1 % 2 == 0).values.flatten.toSet
    val expect = sets.filter(_._1 % 2 != 0)
    assert(out.length == expect.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 2 != 0, "train docs must not appear")
      // 64-bit sids: a collision merging two distinct bigrams is
      // astronomically unlikely at fixture scale, so the raw-string
      // recompute matches the hashed pipeline exactly.
      val mine = expect(id)
      val cov = mine.count(train.contains).toLong
      assert(r.getAs[Long]("n_bigrams") == mine.size.toLong)
      assert(r.getAs[Long]("n_covered") == cov)
      assert(r.getAs[Double]("coverage") ==
        math.floor(cov.toDouble / mine.size * 10000 + 0.5) / 10000)
    }
  }

  test("q116: ranks positive, isolated docs at teleport, mass bounded") {
    val out = PipelineQueries.queries("q116_pagerank")(spark, dir)
      .collect()
    val n = Tables(spark, dir).documents.count()
    assert(out.length == n.toInt)
    val teleport = math.floor(0.15 / n * 1e8 + 0.5) / 1e8
    var mass = 0.0
    out.foreach { r =>
      val pr = r.getAs[Double]("pr")
      assert(pr > 0.0)
      mass += pr
      if (r.getAs[Long]("deg") == 0L)
        assert(pr == teleport,
          s"isolated doc ${r.getAs[Long]("doc_id")} must sit at 0.15/N")
      else assert(pr >= teleport - 1e-12)
    }
    // Dangling/isolated mass is dropped, never created: the TRUE sum is
    // ≤ 1; each reported pr is rounded to 8 decimals (≤ 5e-9 upward per
    // row), so the reported sum can exceed it by at most n·5e-9.
    assert(mass <= 1.0 + out.length * 5e-9, s"rank mass $mass exceeds 1")
    // The degree column is the undirected degree: total is even.
    val degSum = out.map(_.getAs[Long]("deg")).sum
    assert(degSum % 2 == 0, "undirected degree total must be even")
  }
}
