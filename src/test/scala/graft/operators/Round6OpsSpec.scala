package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the round-6 additions: BM25 retrieval (q84) and the
  * weighted per-stratum sample (q85). Exact values are pinned by the
  * DuckDB oracle; these hold for any corpus.
  */
class Round6OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q84: ranked descending, positive scores, at most 5 matched terms") {
    val out = PipelineQueries.queries("q84_bm25_topk")(spark, dir).cache()
    val rows = out.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("score") > 0))
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_terms"); n >= 1 && n <= 5
    })
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse, "not ranked by score desc")
    out.unpersist()
  }

  test("q84: every returned doc actually contains a query term") {
    val docs = Tables(spark, dir).documents
    val inst = docs.select($"doc_id",
      explode(expr("array_remove(split(text, ' '), '')")).as("tok"))
    val qterms = inst.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(5).select($"tok")
    val matching = inst.join(qterms, "tok").select($"doc_id").distinct()
    val out = PipelineQueries.queries("q84_bm25_topk")(spark, dir)
    assert(out.join(matching, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("q85: at most 10 per language, ranks contiguous, keys recompute") {
    val out = PipelineQueries.queries("q85_weighted_sample")(spark, dir).cache()
    val per = out.groupBy($"lang").agg(count(lit(1)).as("n"),
      max($"rk").as("mx"))
    // n == mx means ranks 1..n are contiguous within each stratum.
    assert(per.filter($"n" > 10 || $"n" =!= $"mx").isEmpty)
    // Rank order is key order: within each language the emitted keys
    // are non-decreasing in rk (exact key values are the oracle's job).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"rk")
    assert(out.withColumn("prev", lag($"key", 1).over(w))
      .filter($"prev".isNotNull && $"key" < $"prev").isEmpty)
    out.unpersist()
  }

  test("q86: merged symbol is the pair, counts positive and non-increasing") {
    val out = PipelineQueries.queries("q86_bpe_train")(spark, dir).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("it")).toSeq == Seq(1, 2, 3))
    out.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("pair").replace(" ", ""))
      assert(r.getAs[Long]("pcnt") > 0)
    }
    // A pair first expressible at iteration i was a sub-pair of something
    // already countable at i-1, so the winning count cannot grow.
    val counts = out.map(_.getAs[Long]("pcnt")).toSeq
    assert(counts == counts.sorted.reverse, s"counts grew: $counts")
  }

  /** The engine's merge-application semantics, straight-line: 3 greedy
    * left-to-right replace passes over the space-padded symbol string —
    * EXACTLY what both the Spark side and the DuckDB oracle execute, so
    * a reference built on it matches the distributed result on ANY
    * corpus. (Textbook single-pass greedy BPE agrees whenever no symbol
    * run exceeds 4; the deviation test below pins the 5-run case where
    * it does not.)
    */
  private def replacePassMerge(syms: String, pair: String): String = {
    val merged = pair.replace(" ", "")
    var s = " " + syms + " "
    for (_ <- 1 to 3) s = s.replace(" " + pair + " ", " " + merged + " ")
    s.trim
  }

  /** Sequential 3-iteration BPE trainer over a word-count map using
    * [[replacePassMerge]]; returns the per-iteration (pair, count). */
  private def sequentialBpe(wordCounts: Map[String, Long])
      : Seq[(String, Long)] = {
    var words = wordCounts
    (1 to 3).map { _ =>
      val pc = scala.collection.mutable.Map.empty[String, Long]
      for ((syms, cnt) <- words; arr = syms.split(" ") if arr.length >= 2;
           p <- arr.zip(arr.tail))
        pc(p._1 + " " + p._2) = pc.getOrElse(p._1 + " " + p._2, 0L) + cnt
      val (best, bc) = pc.toSeq.minBy { case (p, c) => (-c, p) }
      words = words.groupMapReduce { case (syms, _) =>
        replacePassMerge(syms, best)
      }(_._2)(_ + _)
      (best, bc)
    }
  }

  test("q86: distributed merges equal the sequential replace-pass reference") {
    val docs = Tables(spark, dir).documents
      .select(explode(expr("array_remove(split(text, ' '), '')")).as("w"))
      .filter(expr("char_length(w) <= 15"))
      .groupBy($"w").count().as[(String, Long)].collect()
    val expected = sequentialBpe(
      docs.groupMapReduce(_._1.map(_.toString).mkString(" "))(_._2)(_ + _))
    val got = PipelineQueries.queries("q86_bpe_train")(spark, dir)
      .collect().map(r => (r.getAs[String]("pair"), r.getAs[Long]("pcnt"))).toSeq
    assert(got == expected, s"got $got, reference says $expected")
  }

  test("q86: the 5-run padded-replace deviation from textbook BPE is pinned") {
    // Word 'aaaaa' (×2) forces a 5-run of symbol 'a'. Iteration 1 merges
    // 'a a' (pcnt 8). The padded replace consumes each match's trailing
    // space, so 'a a a a a' becomes 'aa a aa' — textbook greedy BPE says
    // 'aa aa a'. Iteration 2's pair table is therefore
    // {'aa a': 2, 'a aa': 2, 'c c': 1} and the (count desc, pair asc)
    // argmax picks 'a aa' — textbook would have picked 'aa a'. Both
    // engines execute the same passes, so this IS the cross-engine
    // contract; this test pins it (and documents the deviation).
    val tmp = java.nio.file.Files.createTempDirectory("q86run").toString
    spark.createDataFrame(Seq(
      (0L, "aaaaa aaaaa cc", "en", "src0", 14L)
    )).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = PipelineQueries.queries("q86_bpe_train")(spark, tmp)
      .collect()
      .map(r => (r.getAs[Int]("it"), r.getAs[String]("pair"),
        r.getAs[Long]("pcnt"))).toSeq
    assert(out == Seq((1, "a a", 8L), (2, "a aa", 2L), (3, "aa aaa", 2L)),
      s"replace-pass contract changed: $out")
    // The sequential reference reproduces the same chain (sanity: the
    // reference really does mirror the engine, runs included).
    assert(sequentialBpe(Map("a a a a a" -> 2L, "c c" -> 1L)) ==
      Seq(("a a", 8L), ("a aa", 2L), ("aa aaa", 2L)))
  }

  test("q87: codes are bytes, sse within the half-step bound") {
    val out = PipelineQueries.queries("q87_embed_quantize")(spark, dir).cache()
    assert(out.filter($"c0" < 0 || $"c0" > 255 || $"c1" < 0 || $"c1" > 255).isEmpty)
    assert(out.filter($"code_sum" < 0 || $"code_sum" > 255L * 64).isEmpty)
    assert(out.filter($"sse" < 0).isEmpty)
    // Affine SQ error is at most half a step per dimension.
    val e = Tables(spark, dir).embeddings
      .select(posexplode(expr("transform(embedding, x -> cast(x as double))"))
        .as(Seq("pos", "x")))
      .groupBy($"pos").agg((max($"x") - min($"x")).as("range"))
    val bound = e.agg(sum(pow($"range" / 510.0, 2))).first.getDouble(0) + 1e-9
    assert(out.filter($"sse" > bound).isEmpty, s"sse above half-step bound $bound")
    out.unpersist()
  }

  test("q88: per-source size equals min(cap, n_docs); keeps the longest docs") {
    val out = PipelineQueries.queries("q88_source_cap")(spark, dir).cache()
    val docs = Tables(spark, dir).documents
    val per = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .withColumn("expect",
        least(greatest(lit(5L), expr("n_docs div 5")), $"n_docs"))
    val got = out.groupBy($"source")
      .agg(count(lit(1)).as("kept"), max($"rk").as("mx"))
    // kept == mx: ranks are contiguous 1..kept.
    assert(got.filter($"kept" =!= $"mx").isEmpty)
    assert(got.join(per, "source").filter($"kept" =!= $"expect").isEmpty)
    // Nothing dropped is strictly longer than anything kept (per source).
    val minKept = out.groupBy($"source").agg(min($"n_chars").as("min_kept"))
    val dropped = docs.join(out.select($"doc_id"), Seq("doc_id"), "left_anti")
      .groupBy($"source").agg(max($"n_chars").as("max_drop"))
    assert(minKept.join(dropped, "source")
      .filter($"max_drop" > $"min_kept").isEmpty)
    out.unpersist()
  }

  test("q89: span accounting is internally consistent") {
    val out = PipelineQueries.queries("q89_dup_spans")(spark, dir).cache()
    // Spans cover 3..n_tokens tokens; each span is >= one 3-token
    // shingle; totals bound the parts.
    assert(out.filter($"dup_tokens" > $"n_tokens").isEmpty)
    assert(out.filter($"longest_span" > $"dup_tokens").isEmpty)
    assert(out.filter($"n_spans" > 0 &&
      ($"longest_span" < 3 || $"dup_tokens" < $"n_spans" * 3)).isEmpty)
    assert(out.filter($"n_spans" === 0 &&
      ($"dup_tokens" =!= 0 || $"longest_span" =!= 0)).isEmpty)
    out.unpersist()
  }

  test("q89: a constructed shared span is found with exact boundaries") {
    // Two docs sharing exactly the 5-token run "c d e f g" and nothing
    // else: the merged span must cover exactly those 5 tokens in each.
    val tmp = java.nio.file.Files.createTempDirectory("q89fix").toString
    spark.createDataFrame(Seq(
      (0L, "a b c d e f g h", "en", "src0", 15L),
      (1L, "p q r c d e f g u v", "en", "src0", 19L)
    )).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = PipelineQueries.queries("q89_dup_spans")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, 5L, 5L, 1L), (1L, 5L, 5L, 1L)),
      s"unexpected spans: ${out.toSeq}")
  }

  test("q90: every shingle is novel exactly once, first doc fully novel") {
    val out = PipelineQueries.queries("q90_novelty_score")(spark, dir).cache()
    assert(out.filter($"n_novel" < 0 || $"n_novel" > $"n_shingles").isEmpty)
    // The corpus-wide novel count IS the distinct-sid count: each sid
    // is first-seen in exactly one doc.
    val totalNovel = out.agg(sum($"n_novel")).first.getLong(0)
    val distinctSids = Tables(spark, dir).documents
      .select(explode(graft.functions.GraftFunctions.polyHashArray(
        graft.functions.GraftFunctions.shingles3(
          expr("array_remove(split(text, ' '), '')")))).as("sid"))
      .select($"sid").distinct().count()
    assert(totalNovel == distinctSids,
      s"novel sum $totalNovel != distinct sids $distinctSids")
    val firstDoc = out.orderBy($"doc_id").first
    assert(firstDoc.getAs[Double]("novelty") == 1.0,
      "arrival-order first doc must be fully novel")
    out.unpersist()
  }

  test("q85: heavier docs get stochastically smaller keys (bias witness)") {
    // Within each language, the mean token count of the SELECTED docs
    // must exceed the stratum mean — the whole point of weighting by
    // length. (Deterministic: fixed scramble, fixed corpus.)
    val sel = PipelineQueries.queries("q85_weighted_sample")(spark, dir)
      .groupBy($"lang").agg(avg($"n_tokens").as("sel_mean"))
    val all = Tables(spark, dir).documents
      .select($"lang",
        size(expr("array_remove(split(text, ' '), '')")).as("n_tokens"))
      .filter($"n_tokens" > 0)
      .groupBy($"lang").agg(avg($"n_tokens").as("all_mean"))
    val bad = sel.join(all, "lang").filter($"sel_mean" <= $"all_mean")
    assert(bad.isEmpty, "length bias missing in at least one stratum")
  }

  test("q91: one keep per group, kept doc is group max, docs partitioned") {
    val out = PipelineQueries.queries("q91_keep_list")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents.count()
    assert(out.count() == nDocs, "keep list must cover every document")
    val perGroup = out.groupBy($"group_id").agg(
      sum(when($"keep", 1L).otherwise(0L)).as("kept"),
      max($"n_chars").as("mx"),
      max(when($"keep", $"n_chars")).as("kept_chars"))
    assert(perGroup.filter($"kept" =!= 1L).isEmpty,
      "every group keeps exactly one copy")
    assert(perGroup.filter($"kept_chars" =!= $"mx").isEmpty,
      "kept copy must have the group max n_chars")
    // Singletons (group of one) keep themselves.
    val singletons = out.groupBy($"group_id").agg(count(lit(1)).as("n"))
      .filter($"n" === 1).select($"group_id")
    assert(out.join(singletons, "group_id").filter(!$"keep").isEmpty)
    out.unpersist()
  }

  test("q92: compression >= 1, totals consistent, merges bought something") {
    val out = PipelineQueries.queries("q92_bpe_encode")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter($"compression" < 1.0).isEmpty,
      "merges never add symbols, so chars/symbol >= 1")
    assert(out.filter($"n_syms" > $"n_chars_toks").isEmpty)
    assert(out.filter($"n_words" > $"n_syms").isEmpty,
      "every word emits at least one symbol")
    // The 3 learned merges must actually fire somewhere: at least one
    // source compresses strictly.
    assert(out.filter($"n_syms" < $"n_chars_toks").count() > 0,
      "no merge ever applied — encoder is a no-op")
    out.unpersist()
  }

  test("q91/q46 agree: group assignment matches the dedup-group labels") {
    val keep = PipelineQueries.queries("q91_keep_list")(spark, dir)
      .select($"doc_id", $"group_id")
    val groups = PipelineQueries.queries("q46_dedup_groups")(spark, dir)
      .select($"doc_id", $"group_id".as("g46"))
    // Every labeled doc carries the same group id in both outputs.
    assert(keep.join(groups, "doc_id").filter($"group_id" =!= $"g46").isEmpty)
  }
}
