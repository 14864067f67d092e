package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the round-10 additions: Gopher repetition rules
  * (q117), bag-of-words dedup (q118), corpus-adaptive stopword ratio
  * (q119), curriculum binning (q120), the prefix-filtered exact
  * similarity join (q121) and the per-source dataset card (q122).
  * Exact values are pinned by the DuckDB oracle; these recompute the
  * contracts independently (driver-side reimplementations over the
  * tiny sf0.001 fixture) so they hold on any corpus.
  */
class Round10OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def words(text: String): Array[String] =
    text.split(' ').filter(_.nonEmpty)

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 131 + c.toLong) % 1000000007L)

  private def r(x: Double, d: Int): Double = {
    val s = math.pow(10.0, d)
    math.floor(x * s + 0.5) / s
  }

  private lazy val docs = Tables(spark, dir).documents
    .select($"doc_id", $"text", $"source", $"lang", $"n_chars")
    .as[(Long, String, String, String, Long)].collect()

  test("q117: both repetition fractions recompute; both gate sides fire") {
    val out = PipelineQueries.queries("q117_gopher_repetition")(spark, dir)
      .collect()
    val exp = docs.map { case (id, text, _, _, _) =>
      val ws = words(text)
      val wc = ws.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
      val totW = wc.map { case (w, c) => c * w.length }.sum
      val (topW, topC) = wc.toSeq.sortBy { case (w, c) => (-c, w) }.head
      val topFrac = r(topC.toDouble * topW.length / totW, 4)
      val grams = ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
        .toSeq.groupBy(identity).map { case (g, o) => g -> o.length.toLong }
      val totG = grams.map { case (g, c) => c * g.length }.sum
      val dupG = grams.collect { case (g, c) if c >= 2 => c * g.length }.sum
      val dupFrac = if (totG == 0L) 0.0 else r(dupG.toDouble / totG, 4)
      id -> (topFrac, dupFrac)
    }.toMap
    val tTop = r(exp.values.map(v => math.floor(v._1 * 10000 + 0.5)).sum /
      (exp.size * 10000.0), 6)
    val tDup = r(exp.values.map(v => math.floor(v._2 * 10000 + 0.5)).sum /
      (exp.size * 10000.0), 6)
    assert(out.length == docs.length)
    out.foreach { row =>
      val (tf, df) = exp(row.getAs[Long]("doc_id"))
      assert(row.getAs[Double]("top_frac") == tf)
      assert(row.getAs[Double]("dup_frac") == df)
      assert(row.getAs[Boolean]("keep") == (tf <= tTop && df <= tDup))
    }
    // The corpus must exercise BOTH rules: some doc repeats a bigram,
    // and the gate rejects on each side somewhere.
    assert(exp.values.exists(_._2 > 0.0), "no doc with a duplicate bigram")
    assert(out.exists(!_.getAs[Boolean]("keep")))
    assert(out.exists(_.getAs[Boolean]("keep")))
  }

  test("q118: bag signature is order-insensitive and groups match") {
    val out = PipelineQueries.queries("q118_bag_dedup")(spark, dir)
      .collect()
    val canon = docs.map { case (id, text, _, _, _) =>
      id -> polyHash(words(text).sorted.mkString(" "))
    }.toMap
    val groups = canon.groupBy(_._2).map { case (sig, m) =>
      sig -> (m.size.toLong, m.keys.min)
    }
    assert(out.length == docs.length)
    out.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val sig = canon(id)
      assert(row.getAs[Long]("bag_sig") == sig)
      val (n, cid) = groups(sig)
      assert(row.getAs[Long]("n_bag") == n)
      assert(row.getAs[Boolean]("keep") == (id == cid))
    }
    // Order-insensitivity, the property q21 lacks: a permuted token
    // sequence hashes to the same bag signature.
    val ws = words(docs.head._2)
    assert(polyHash(ws.sorted.mkString(" ")) ==
      polyHash(ws.reverse.sorted.mkString(" ")))
  }

  test("q119: top-20 stoplist and ratios recompute") {
    val out = PipelineQueries.queries("q119_stopword_ratio")(spark, dir)
      .collect()
    val all = docs.flatMap(d => words(d._2))
    val stop = all.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(20).map(_._1).toSet
    val exp = docs.map { case (id, text, _, _, _) =>
      val ws = words(text)
      val nStop = ws.count(stop).toLong
      id -> (ws.length.toLong, nStop, r(nStop.toDouble / ws.length, 4))
    }.toMap
    val thr = r(exp.values.map(v => math.floor(v._3 * 10000 + 0.5)).sum /
      (exp.size * 10000.0), 6)
    out.foreach { row =>
      val (n, s, ratio) = exp(row.getAs[Long]("doc_id"))
      assert(row.getAs[Long]("n_toks") == n)
      assert(row.getAs[Long]("n_stop") == s)
      assert(row.getAs[Double]("stop_ratio") == ratio)
      assert(row.getAs[Boolean]("keep") == (ratio >= thr))
    }
    assert(out.exists(_.getAs[Boolean]("keep")))
    assert(out.exists(!_.getAs[Boolean]("keep")))
  }

  test("q120: inverted-CDF deciles partition the corpus") {
    val out = PipelineQueries.queries("q120_curriculum_bins")(spark, dir)
      .collect()
    val lens = docs.map(d => words(d._2).length.toLong)
    val n = lens.length.toLong
    val sorted = lens.sorted
    val thresholds = (1 to 9).map { k =>
      val need = (k * n + 9) / 10
      sorted(need.toInt - 1) // min v with cum >= need
    }
    val bins = lens.groupBy(v => 1 + thresholds.count(v > _))
    assert(out.map(_.getAs[Long]("n_docs")).sum == n)
    out.foreach { row =>
      val e = row.getAs[Int]("epoch")
      val members = bins(e)
      assert(row.getAs[Long]("n_docs") == members.length.toLong)
      assert(row.getAs[Long]("tot_tokens") == members.sum)
      assert(row.getAs[Double]("mean_tokens") ==
        r(members.sum.toDouble / members.length, 4))
    }
    // Epochs order shortest-first: per-epoch means must be monotone.
    val means = out.sortBy(_.getAs[Int]("epoch"))
      .map(_.getAs[Double]("mean_tokens"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b })
  }

  test("q121: prefix filter is COMPLETE — equals brute-force all-pairs") {
    val out = PipelineQueries.queries("q121_prefix_filter_join")(spark, dir)
      .collect()
      .map(row => (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b"),
        row.getAs[Long]("i"), row.getAs[Long]("na"), row.getAs[Long]("nb")))
      .toSet
    val sets = docs.map { case (id, text, _, _, _) =>
      id -> words(text).sliding(3).filter(_.length == 3)
        .map(g => polyHash(g.mkString(" "))).toSet
    }
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = (sa & sb).size.toLong
      if i * 2 >= sa.size + sb.size - i && i > 0
    } yield (a, b, i, sa.size.toLong, sb.size.toLong)).toSet
    assert(out == brute,
      s"prefix filter diverged from brute force: " +
        s"missed=${(brute -- out).take(3)} extra=${(out -- brute).take(3)}")
  }

  test("q123: sketch fidelity recomputes from the raw hash family") {
    val out = PipelineQueries.queries("q123_minhash_fidelity")(spark, dir)
      .collect()
    val sets = docs.map { case (id, text, _, _, _) =>
      id -> words(text).sliding(3).filter(_.length == 3)
        .map(g => polyHash(g.mkString(" "))).toSet
    }.toMap
    def sig(sids: Set[Long], s: Int): Long =
      sids.map(sid => ((37L * s + 7) * sid + (101L * s + 3)) % 1000000007L).min
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = (sa & sb).size.toLong
      if i * 2 >= sa.size + sb.size - i && i > 0
    } yield {
      val jac = r(i.toDouble / (sa.size + sb.size - i), 6)
      val k = (0 until 16).count(s => sig(sa, s) == sig(sb, s)).toLong
      (a, b) -> (jac, k, k / 16.0, r(math.abs(k / 16.0 - jac), 6))
    }).toMap
    assert(out.length == expected.size)
    val meanErr = r(expected.values.map(v =>
      math.floor(v._4 * 1000000 + 0.5)).sum / (expected.size * 1000000.0), 6)
    out.foreach { row =>
      val (jac, k, est, err) = expected(
        (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b")))
      assert(row.getAs[Double]("jac") == jac)
      assert(row.getAs[Long]("k") == k)
      assert(row.getAs[Double]("est") == est)
      assert(row.getAs[Double]("err") == err)
      assert(row.getAs[Double]("mean_err") == meanErr)
    }
    // The sketch must actually carry signal on near-dup pairs: the
    // mean absolute error of a 16-hash MinHash on J >= 0.5 pairs is
    // bounded well below the trivial baseline (est == 0 would err
    // at >= 0.5).
    assert(meanErr < 0.25, s"sketch carries no signal: mean_err=$meanErr")
  }

  test("q124: shard balance recomputes from the scramble") {
    val out = PipelineQueries.queries("q124_shard_balance")(spark, dir)
      .collect()
    def scramble(id: Long): Long = {
      val m = id % 4294967296L
      ((m / 65536) * 2654435761L % 4294967296L * 65536 +
        (m % 65536) * 2654435761L) % 4294967296L
    }
    val per = docs.map { case (id, text, _, _, _) =>
      (scramble(id) % 8, words(text).length.toLong)
    }.groupBy(_._1)
    val total = per.values.flatten.map(_._2).sum
    assert(out.map(_.getAs[Long]("tot_tokens")).sum == total)
    out.foreach { row =>
      val g = per(row.getAs[Long]("shard"))
      assert(row.getAs[Long]("n_docs") == g.length.toLong)
      assert(row.getAs[Long]("tot_tokens") == g.map(_._2).sum)
      assert(row.getAs[Double]("balance") ==
        r(g.map(_._2).sum.toDouble * 8 / total, 6))
    }
    // The scramble must spread docs: every shard populated, and no
    // shard more than 2x its fair token share on the fixture.
    assert(out.length == 8)
    assert(out.forall(r => r.getAs[Double]("balance") < 2.0))
  }

  test("q125: winnow screen recomputes; planted dups hit full containment") {
    val out = PipelineQueries.queries("q125_winnow_neardup")(spark, dir)
      .collect()
      .map(row => (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b")) ->
        (row.getAs[Long]("i"), row.getAs[Long]("na"), row.getAs[Long]("nb"),
          row.getAs[Double]("overlap")))
      .toMap
    val fps = docs.flatMap { case (id, text, _, _, _) =>
      val sids = words(text).sliding(3).filter(_.length == 3)
        .map(g => polyHash(g.mkString(" "))).toArray
      if (sids.length < 4) None
      else Some(id -> sids.sliding(4).map(_.min).toSet)
    }.toMap
    val df = fps.toSeq.flatMap(_._2).groupBy(identity)
      .map { case (fp, o) => fp -> o.size }
    val rare = df.filter(_._2 <= 50).keySet
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      i = (fa & fb).count(rare).toLong if i >= 2
    } yield (a, b) -> (i, fa.size.toLong, fb.size.toLong,
      r(i.toDouble / math.min(fa.size, fb.size), 4))).toMap
    assert(out == expected,
      s"missed=${(expected.keySet -- out.keySet).take(3)} " +
        s"extra=${(out.keySet -- expected.keySet).take(3)}")
    // The fixture's planted exact dups must screen at full containment.
    assert(out.values.exists(_._4 == 1.0), "no pair at overlap 1.0")
  }

  test("q126: aHash recomputes from the pixel formula; bits are balanced") {
    val out = PipelineQueries.queries("q126_image_ahash")(spark, dir)
      .collect()
    assert(out.length == docs.length)
    out.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val textLen = docs.find(_._1 == id).get._2.length
      val w = textLen % 64 + 16
      val h = (textLen * 7) % 48 + 16
      val d = (id % 256).toInt
      def weight(x: Int, y: Int): Long =
        ((x * 31 + y * 7 + d) % 256 + 2 * ((x * 13 + y * 11 + 2 * d) % 256) +
          3 * ((x * 5 + y * 3 + 3 * d) % 256)).toLong
      val vs = (0 until 64).map(j => weight((j % 8) * w / 8, (j / 8) * h / 8))
      val sum = vs.sum
      var lo = 0L; var hi = 0L; var n = 0
      for (j <- 0 until 64 if 64L * vs(j) > sum) {
        n += 1
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      assert(row.getAs[Int]("width") == w)
      assert(row.getAs[Int]("height") == h)
      assert(row.getAs[Long]("hash_hi") == hi)
      assert(row.getAs[Long]("hash_lo") == lo)
      assert(row.getAs[Int]("n_above") == n)
      // Mean-thresholded bits are roughly balanced — a degenerate
      // all-zero/all-one hash carries no dedup signal.
      assert(n > 8 && n < 56)
    }
  }

  test("q127: edit-distance verify recomputes over the screened candidates") {
    val out = PipelineQueries.queries("q127_editdist_verify")(spark, dir)
      .collect()
      .map(row => (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b")) ->
        (row.getAs[Long]("edit_dist"), row.getAs[Long]("max_len"),
          row.getAs[Double]("sim"), row.getAs[Boolean]("is_dup")))
      .toMap
    def lev(a: String, b: String): Long = {
      val prev = Array.tabulate(b.length + 1)(_.toLong)
      val cur = new Array[Long](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i.toLong
        for (j <- 1 to b.length) {
          val cost = if (a(i - 1) == b(j - 1)) 0L else 1L
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + cost)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val texts = docs.map(d => d._1 -> d._2).toMap
    val fps = docs.flatMap { case (id, text, _, _, _) =>
      val sids = words(text).sliding(3).filter(_.length == 3)
        .map(g => polyHash(g.mkString(" "))).toArray
      if (sids.length < 4) None
      else Some(id -> sids.sliding(4).map(_.min).toSet)
    }.toMap
    val df = fps.toSeq.flatMap(_._2).groupBy(identity)
      .map { case (fp, o) => fp -> o.size }
    val rare = df.filter(_._2 <= 50).keySet
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      i = (fa & fb).count(rare).toLong
      if i >= 2 && i * 2 >= math.min(fa.size, fb.size)
    } yield {
      val d = lev(texts(a), texts(b))
      val m = math.max(texts(a).length, texts(b).length).toLong
      val sim = r(1.0 - d.toDouble / m, 4)
      (a, b) -> (d, m, sim, 1.0 - d.toDouble / m >= 0.8)
    }).toMap
    assert(out == expected,
      s"missed=${(expected.keySet -- out.keySet).take(3)} " +
        s"extra=${(out.keySet -- expected.keySet).take(3)}")
    // The verifier must separate: the fixture has both confirmed dups
    // and screened-but-rejected candidates ... or at least one side.
    assert(out.values.exists(_._4), "no pair verified as dup")
  }

  test("q128: stickiness recomputes from raw events") {
    val out = RelationalQueries.queries("q128_stickiness")(spark, dir)
      .collect()
    val ev = Tables(spark, dir).events
      .select($"user_id", expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01')").cast("long"))
      .as[(Long, Long)].collect()
    val byWeek = ev.map { case (u, d) => (d / 7, d, u) }.distinct
      .groupBy(_._1)
    assert(out.length == byWeek.size)
    out.foreach { row =>
      val g = byWeek(row.getAs[Long]("week"))
      val wau = g.map(_._3).distinct.length.toLong
      val sumDau = g.groupBy(_._2).values
        .map(_.map(_._3).distinct.length.toLong).sum
      assert(row.getAs[Long]("wau") == wau)
      assert(row.getAs[Long]("sum_dau") == sumDau)
      val st = row.getAs[Double]("stickiness")
      assert(st == r(sumDau.toDouble / (7 * wau), 4))
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("q122: dataset card recomputes per source") {
    val out = PipelineQueries.queries("q122_dataset_card")(spark, dir)
      .collect()
    val bySrc = docs.groupBy(_._3)
    assert(out.length == bySrc.size)
    out.foreach { row =>
      val g = bySrc(row.getAs[String]("source"))
      val toks = g.map(d => words(d._2).length.toLong)
      assert(row.getAs[Long]("n_docs") == g.length.toLong)
      assert(row.getAs[Long]("n_tokens") == toks.sum)
      assert(row.getAs[Long]("n_langs") == g.map(_._4).distinct.length.toLong)
      assert(row.getAs[Double]("exact_dup_rate") ==
        r(1.0 - g.map(_._2).distinct.length.toDouble / g.length, 4))
      assert(row.getAs[Double]("mean_tokens") ==
        r(toks.sum.toDouble / g.length, 4))
      assert(row.getAs[Double]("mean_chars") ==
        r(g.map(_._5).sum.toDouble / g.length, 2))
    }
  }
}
