package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the round-7 additions: perplexity filtering (q93)
  * and importance resampling (q94). Exact values are pinned by the
  * DuckDB oracle; these hold for any corpus.
  */
class Round7OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q93: every doc scored once, keep flag is exactly nll <= mean(nll)") {
    val out = PipelineQueries.queries("q93_perplexity_filter")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents.count()
    assert(out.count() == nDocs, "every document must be scored")
    assert(out.filter($"nll" <= 0).isEmpty, "NLL of a proper LM is positive")
    // n_bigrams = token count - 1 (every doc has >= 10 tokens).
    val tok = Tables(spark, dir).documents.select($"doc_id",
      size(expr("array_remove(split(text, ' '), '')")).cast("long").as("nt"))
    assert(out.join(tok, "doc_id").filter($"n_bigrams" =!= $"nt" - 1).isEmpty)
    // The gate is internally consistent: recomputing the corpus-mean
    // threshold from the output reproduces every keep flag, and the
    // gate actually splits the corpus (corpus-adaptive threshold).
    val thr = out.agg(avg($"nll")).first.getDouble(0)
    val eps = 1e-6 // threshold is rounded to 6 dp in-query
    assert(out.filter(($"nll" <= thr - eps) && !$"keep").isEmpty)
    assert(out.filter(($"nll" > thr + eps) && $"keep").isEmpty)
    assert(out.filter($"keep").count() > 0 && out.filter(!$"keep").count() > 0,
      "corpus-mean threshold must split the corpus")
    out.unpersist()
  }

  test("q93: train-split docs score no worse than unseen docs on average") {
    // Train docs contain only seen bigrams (higher probability under
    // add-1 smoothing), so their mean NLL must be below the held-out
    // docs' mean — the sanity check that the LM actually trained.
    val out = PipelineQueries.queries("q93_perplexity_filter")(spark, dir)
      .withColumn("train", $"doc_id" % 5 === 0)
    val m = out.groupBy($"train").agg(avg($"nll").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) < m(false),
      s"train mean ${m(true)} should be below held-out mean ${m(false)}")
  }

  test("q95: clusters partition the corpus, purity is the majority fraction") {
    val out = PipelineQueries.queries("q95_cluster_purity")(spark, dir).cache()
    val nVecs = Tables(spark, dir).embeddings.count()
    assert(out.agg(sum($"n_vecs")).first.getLong(0) == nVecs,
      "cluster sizes must partition the embedding corpus")
    assert(out.filter($"n_top" > $"n_vecs" || $"n_top" < 1).isEmpty)
    assert(out.filter($"purity" <= 0 || $"purity" > 1).isEmpty)
    // Majority really is the majority: recompute per-cluster label
    // counts from the SAME assignment and compare the max.
    val a = PipelineQueries.queries("q72_kmeans_train")(spark, dir)
      .select($"vec_id", $"cluster")
    val lab = Tables(spark, dir).embeddings.select($"vec_id", $"label")
    val mx = a.join(lab, "vec_id").groupBy($"cluster", $"label")
      .agg(count(lit(1)).as("n"))
      .groupBy($"cluster").agg(max($"n").as("mx"))
    assert(out.join(mx, "cluster").filter($"n_top" =!= $"mx").isEmpty,
      "n_top must be the true per-cluster majority count")
    out.unpersist()
  }

  test("q96: split counts are exactly floor(0.8n)/floor(0.9n) per source") {
    val out = PipelineQueries.queries("q96_train_split")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents.count()
    assert(out.count() == nDocs, "every document must land in one split")
    val got = out.groupBy($"source")
      .agg(sum(when($"split" === "train", 1L).otherwise(0L)).as("tr"),
        sum(when($"split" === "val", 1L).otherwise(0L)).as("va"),
        sum(when($"split" === "test", 1L).otherwise(0L)).as("te"),
        count(lit(1)).as("n"))
    // Exact integer boundaries — the whole point vs a Bernoulli split.
    assert(got.filter($"tr" =!= expr("(8 * n) div 10") ||
      $"va" =!= expr("(9 * n) div 10 - (8 * n) div 10") ||
      $"te" =!= expr("n - (9 * n) div 10")).isEmpty,
      "per-source split counts must be the exact floor boundaries")
    assert(got.filter($"te" < 1).isEmpty,
      "test stratum must be non-empty for every source in the fixture")
    out.unpersist()
  }

  test("q97: canonical pairs, intersections bounded by set sizes") {
    val out = PipelineQueries.queries("q97_source_overlap")(spark, dir).cache()
    assert(out.filter($"source_a" >= $"source_b").isEmpty,
      "pairs must be canonical (source_a < source_b)")
    assert(out.filter($"n_common" < 1).isEmpty,
      "pairs with empty intersections must not appear")
    assert(out.filter($"n_common" > least($"n_a", $"n_b")).isEmpty,
      "an intersection cannot exceed either set size")
    // Set sizes are per-source facts: the same source must report the
    // same size on every row it appears in, on either side.
    val szs = out.select($"source_a".as("s"), $"n_a".as("n"))
      .unionByName(out.select($"source_b".as("s"), $"n_b".as("n")))
    assert(szs.distinct().groupBy($"s").count().filter($"count" > 1).isEmpty,
      "per-source set size must be consistent across all pair rows")
    // Jaccard recomputes from the three integers it's derived from.
    assert(out.filter(abs($"jaccard" -
      $"n_common" / ($"n_a" + $"n_b" - $"n_common")) > 1e-4).isEmpty)
    val nSources = Tables(spark, dir).documents
      .select($"source").distinct().count()
    assert(out.count() <= nSources * (nSources - 1) / 2)
    out.unpersist()
  }

  test("q98: every metric is consistent with its integer numerators") {
    val out = PipelineQueries.queries("q98_source_lexical")(spark, dir).cache()
    val nSources = Tables(spark, dir).documents
      .select($"source").distinct().count()
    assert(out.count() == nSources, "one profile row per source")
    assert(out.filter($"n_types" > $"n_tokens").isEmpty)
    assert(out.filter($"ttr" <= 0 || $"ttr" > 1).isEmpty)
    assert(out.filter($"hapax_frac" < 0 || $"hapax_frac" > 1).isEmpty)
    assert(out.filter($"top10_mass" <= 0 || $"top10_mass" > 1).isEmpty)
    assert(out.filter(abs($"ttr" -
      $"n_types" / $"n_tokens".cast("double")) > 1e-4).isEmpty)
    // Total token mass matches an independent corpus count.
    val toks = Tables(spark, dir).documents
      .select($"source",
        size(expr("array_remove(split(text, ' '), '')")).cast("long").as("nt"))
      .groupBy($"source").agg(sum($"nt").as("nt"))
    assert(out.join(toks, "source").filter($"n_tokens" =!= $"nt").isEmpty,
      "n_tokens must equal the independent per-source token count")
    out.unpersist()
  }

  test("q99: nearest centroid is the true argmin; ratios recompute") {
    val out = PipelineQueries.queries("q99_label_cohesion")(spark, dir).cache()
    val emb = Tables(spark, dir).embeddings
    assert(out.count() == emb.select($"label").distinct().count())
    assert(out.agg(sum($"n_vecs")).first.getLong(0) == emb.count(),
      "per-label sizes must partition the embedding corpus")
    assert(out.filter($"label" === $"nearest_label").isEmpty)
    assert(out.filter($"intra_d2" <= 0 || $"inter_d2" <= 0).isEmpty)
    assert(out.filter(abs($"separation" - $"inter_d2" / $"intra_d2")
      > 2e-3).isEmpty, "separation must recompute from its rounded parts")
    // Independent centroid recomputation: per-label mean (rounded 6 dp
    // like the query), then check each row's inter_d2 really is the
    // MINIMUM distance to any other label's centroid.
    val cent = emb
      .select($"label", posexplode($"embedding".cast("array<double>"))
        .as(Seq("dim", "v")))
      .groupBy($"label", $"dim").agg(CrossRound.r(avg($"v"), 6).as("m"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"dim", $"m"))).as("pm"))
      .select($"label", expr("transform(pm, x -> x.m)").as("ce"))
    val minD = cent.as("a").crossJoin(cent.as("b"))
      .filter($"a.label" =!= $"b.label")
      .select($"a.label".as("label"),
        graft.functions.GraftFunctions.l2Sq($"a.ce", $"b.ce").as("dc"))
      .groupBy($"label").agg(min($"dc").as("mind"))
    assert(out.join(minD, "label")
      .filter(abs($"inter_d2" - $"mind") > 1e-3).isEmpty,
      "inter_d2 must be the minimum inter-centroid distance")
    out.unpersist()
  }

  test("q100: excision removes exactly the token mass q89 reports") {
    val out = PipelineQueries.queries("q100_span_excise")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents.count()
    assert(out.count() == nDocs, "every document must be rewritten")
    // Detection and excision share dupTokenSpans, so the removed mass
    // must equal q89's dup_tokens doc-for-doc (q89 only reports docs
    // with >= 3 tokens; the rest pass through whole).
    val d = PipelineQueries.queries("q89_dup_spans")(spark, dir)
      .select($"doc_id", $"dup_tokens")
    assert(out.join(d, "doc_id")
      .filter($"n_tokens" - $"kept_tokens" =!= $"dup_tokens").isEmpty,
      "kept_tokens must be n_tokens minus q89's dup_tokens")
    assert(out.filter($"kept_tokens" < 0 || $"kept_tokens" > $"n_tokens").isEmpty)
    // The rebuilt text really has kept_tokens tokens.
    assert(out.filter(
      size(expr("array_remove(split(text_clean, ' '), '')")) =!= $"kept_tokens")
      .isEmpty, "text_clean must re-tokenize to exactly kept_tokens")
    // Excision is real on the fixture corpus (it contains duplicates).
    assert(out.filter($"kept_tokens" < $"n_tokens").count() > 0)
    out.unpersist()
  }

  test("q94: p decreases with source size, keep flags recompute from u < p") {
    val out = PipelineQueries.queries("q94_importance_resample")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents.count()
    assert(out.count() == nDocs, "every document must carry a decision")
    assert(out.filter($"p_keep" <= 0 || $"p_keep" > 1).isEmpty)
    // Temperature scaling upweights small sources: p is monotone
    // non-increasing in per-source token count.
    val per = out.groupBy($"source")
      .agg(sum($"n_tokens").as("t"), max($"p_keep").as("p"))
    val pairs = per.as("a").crossJoin(per.as("b"))
      .filter($"a.t" < $"b.t" && $"a.p" < $"b.p" - lit(1e-9))
    assert(pairs.isEmpty, "a larger source must not get a larger keep-prob")
    // The thinning is real on this corpus (nothing saturates at 1 when
    // the adaptive budget is half the corpus and sources are similar).
    assert(out.filter($"keep").count() > 0 && out.filter(!$"keep").count() > 0)
    out.unpersist()
  }

  test("q89/q100 match a brute-force cross-doc cover on random corpora") {
    // Property check against a from-scratch model of the span contract:
    // a position is covered iff some 3-token shingle starting within 2
    // positions of it appears in >= 2 distinct documents (raw token
    // triples, no hashing — a polyHash collision would surface here as
    // a real finding). Deterministic seed; small vocab forces rich
    // cross-doc overlap, lengths 0..25 include shingle-free docs.
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 1 to 3) {
      val docs = (0 until 40).map { i =>
        val tks = Vector.fill(rnd.nextInt(26))(vocab(rnd.nextInt(vocab.size)))
        (i.toLong, tks.mkString(" "), "en", "src0", 0L)
      }
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_spanprop$trial").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val toks = docs.map { case (id, text, _, _, _) =>
        id -> text.split(" ").filter(_.nonEmpty).toVector
      }.toMap
      val tripleDocs = scala.collection.mutable.Map[Seq[String], Set[Long]]()
      for ((id, tk) <- toks; p <- 0 to tk.length - 3)
        tripleDocs.update(tk.slice(p, p + 3),
          tripleDocs.getOrElse(tk.slice(p, p + 3), Set.empty) + id)
      val dup = tripleDocs.filter(_._2.size >= 2).keySet
      val covered: Map[Long, Set[Int]] = toks.map { case (id, tk) =>
        id -> (0 to tk.length - 3).filter(p => dup(tk.slice(p, p + 3)))
          .flatMap(p => p to p + 2).toSet
      }
      val out89 = PipelineQueries.queries("q89_dup_spans")(spark, tmp)
        .collect().map(r => r.getLong(0) -> r).toMap
      for ((id, tk) <- toks if tk.length >= 3) {
        val cov = covered(id).toVector.sorted
        val comps = cov.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
          if (acc.nonEmpty && acc.last.last == p - 1) acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
        }
        val r = out89(id)
        assert(r.getAs[Long]("dup_tokens") == cov.size, s"doc $id dup_tokens")
        assert(r.getAs[Long]("n_spans") == comps.size, s"doc $id n_spans")
        assert(r.getAs[Long]("longest_span") ==
          (if (comps.isEmpty) 0L else comps.map(_.size).max.toLong),
          s"doc $id longest_span")
      }
      val out100 = PipelineQueries.queries("q100_span_excise")(spark, tmp)
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(out100.size == docs.size)
      for ((id, tk) <- toks) {
        val cov = covered.getOrElse(id, Set.empty[Int])
        val kept = tk.zipWithIndex.collect { case (t, p) if !cov(p) => t }
        assert(out100(id).getAs[Long]("kept_tokens") == kept.size.toLong,
          s"doc $id kept_tokens")
        assert(out100(id).getAs[String]("text_clean") == kept.mkString(" "),
          s"doc $id text_clean")
      }
    }
  }

  test("q101: weights are 1/|group|, groups agree with q46, mass ≈ #groups") {
    val out = PipelineQueries.queries("q101_soft_dedup_weight")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents.count()
    assert(out.count() == nDocs, "every document gets a weight")
    // Weight recomputes from the reported group size (6-dp round).
    assert(out.filter(
      abs($"weight" - lit(1.0) / $"group_size") > 5e-7).isEmpty)
    // Group membership matches q46's labels for every non-singleton.
    val q46 = PipelineQueries.queries("q46_dedup_groups")(spark, dir)
      .select($"doc_id", $"group_id".as("g46"))
    assert(out.join(q46, "doc_id").filter($"group_id" =!= $"g46").isEmpty)
    // Singletons (not in q46) weigh exactly 1.
    assert(out.join(q46, Seq("doc_id"), "left_anti")
      .filter($"weight" =!= 1.0).isEmpty)
    // Total weighted mass = number of groups, up to rounding.
    val mass = out.agg(sum($"weight")).first.getDouble(0)
    val nGroups = out.select($"group_id").distinct().count()
    assert(math.abs(mass - nGroups) < 1e-3 * nDocs)
    out.unpersist()
  }

  test("q102: negatives differ in label and are the true cross-label top-3") {
    val out = PipelineQueries.queries("q102_hard_negatives")(spark, dir).cache()
    val lab = Tables(spark, dir).embeddings
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val anchors = out.select($"query_id").distinct().as[Long].collect()
    for (a <- anchors) {
      val rows = out.filter($"query_id" === a)
        .orderBy($"rank").collect()
      assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length),
        s"anchor $a ranks contiguous")
      rows.foreach { r =>
        assert(r.getAs[Int]("label") != lab(a), s"anchor $a label clash")
        assert(lab(r.getAs[Long]("vec_id")) == r.getAs[Int]("label"))
      }
      // cos is non-increasing down the ranks.
      val cs = rows.map(_.getAs[Double]("cos")).toSeq
      assert(cs == cs.sorted.reverse, s"anchor $a cos ordering")
    }
    // Spot-agreement with the brute-force window form on anchor 0:
    // q25's exact scorer restricted to cross-label rows gives the same
    // top-3 ids.
    val e = Tables(spark, dir).embeddings.collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val (q0, l0, v0) = e.find(_._1 == 0L).get
    def cos(x: Array[Double], y: Array[Double]) = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) { d += x(i)*y(i); nx += x(i)*x(i); ny += y(i)*y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val want = e.filter(x => x._1 != q0 && x._2 != l0)
      .map(x => (x._1, cos(v0, x._3)))
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSeq
    val got = out.filter($"query_id" === 0).orderBy($"rank")
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == want, "anchor 0 top-3 matches brute force")
    out.unpersist()
  }

  test("q103: Cauchy-Schwarz holds, pairs share shingles, dup pairs score ≈1") {
    val out = PipelineQueries.queries("q103_shingle_cosine")(spark, dir).cache()
    assert(out.count() > 0, "fixture near-dups must surface")
    // Cauchy-Schwarz: the capped dot can only undershoot the full one,
    // so cos ≤ 1 always.
    assert(out.filter($"cos" > 1.0 + 1e-9).isEmpty)
    assert(out.filter($"n_shared" <= 0 || $"dot" <= 0).isEmpty)
    // The q22b verified near-dup pairs (jaccard ≥ 0.6 on distinct sids)
    // are a subset of high-cosine pairs: multiset cosine ≥ 0.5 is a
    // weaker cut than 0.6 set-Jaccard for these corpora.
    val nd = PipelineQueries.queries("q22b_minhash_nodict")(spark, dir)
      .select($"doc_a", $"doc_b")
    assert(nd.join(out, Seq("doc_a", "doc_b"), "left_anti").isEmpty,
      "every verified near-dup pair clears the cosine cut")
    out.unpersist()
  }

  test("q104: chunk counts tie to q64 and dup fractions recompute") {
    val out = PipelineQueries.queries("q104_chunk_dedup")(spark, dir).cache()
    val chunks = PipelineQueries.queries("q64_doc_chunks")(spark, dir)
      .select($"doc_id", $"chunk_text").cache()
    // Per-doc chunk counts equal q64's rows for that doc.
    val cnt = chunks.groupBy($"doc_id").agg(count(lit(1)).as("n64"))
    assert(out.join(cnt, "doc_id").filter($"n_chunks" =!= $"n64").isEmpty)
    assert(out.filter($"n_dup" > $"n_chunks").isEmpty)
    // Brute-force recount of duplicated chunks from q64's own output.
    val occ = chunks.groupBy($"chunk_text").agg(count(lit(1)).as("o"))
    val dup = chunks.join(occ, "chunk_text").filter($"o" >= 2)
      .groupBy($"doc_id").agg(count(lit(1)).as("nd"))
    assert(out.join(dup, "doc_id").filter($"n_dup" =!= $"nd").isEmpty)
    assert(out.join(dup, Seq("doc_id"), "left_anti")
      .filter($"n_dup" =!= 0).isEmpty)
    chunks.unpersist()
    out.unpersist()
  }
}
