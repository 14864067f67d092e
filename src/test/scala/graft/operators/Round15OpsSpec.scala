package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Pins the round-14 ANN production variants (VERDICT r13 #1/#2): the
  * TRAINED fixed-K codebook ([[PipelineQueries.trainedCodebook]],
  * K = [[AnnPolicy.TrainedK]]) and its consumers — q36b (IVF), q60b
  * (IVFADC+refine), q141b (streaming ingest), q142 (streaming ANN
  * query over the persisted IVFPQ index). Four layers:
  *
  *  1. codebook/artifact invariants (fixed K, dense full-dim centroids,
  *     index↔ledger routing agreement through the shared `pqRoute`),
  *  2. recall floors vs exact-L2 ground truth at the sf0.01 fixture,
  *  3. streaming semantics — staged multi-batch runs equal the
  *     single-batch runs for q141b and q142,
  *  4. the hermetic 5k-vector gate (Round14OpsSpec's corpus, flat-file
  *     layout so the streaming variants run): the trained quantizer's
  *     recall with all dials off-floor — where it BEATS the fixture
  *     quantizer's measured 0.36 (q36 at the same corpus) by design:
  *     trained lists concentrate true neighbors, arbitrary seeds don't.
  */
class Round15OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recall(gt: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
    val r = gt.keys.toSeq.map(q =>
      (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
    r.sum / r.size
  }

  /** Exact-L2 top-5 ground truth for the 5 query vectors of `d`. */
  private def gtL2(d: String): Map[Long, Set[Long]] = {
    val e = PipelineQueries.embGlob(spark, d)
    val qv = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"l2", $"vec_id")
    topSets(e.crossJoin(broadcast(qv)).filter($"vec_id" =!= $"query_id")
      .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"vec_id"))
  }

  // ---- 1. codebook / artifact invariants -------------------------------

  test("trained codebook: fixed K, seeded ids, dense 64-dim double centroids") {
    assert(AnnPolicy.TrainedK == 64L)
    // The policy dial a K=64 codebook resolves to: 7 of 64 lists
    // (~11% expected scan on near-random data).
    assert(AnnPolicy.ivfNprobe(AnnPolicy.TrainedK) == 7L)
    val cb = PipelineQueries.trainedCodebook(spark, dir).collect()
    assert(cb.nonEmpty && cb.length <= AnnPolicy.TrainedK,
      s"codebook has ${cb.length} centroids")
    val cids = cb.map(_.getAs[Long]("cid"))
    assert(cids.distinct.length == cids.length, "duplicate centroid ids")
    assert(cids.forall(c => c >= 0 && c < AnnPolicy.TrainedK),
      "centroid ids must be the Lloyd seeds (first-K vec_ids)")
    cb.foreach { r =>
      val ce = r.getSeq[Double](r.fieldIndex("ce"))
      assert(ce.length == 64, s"centroid ${r.getAs[Long]("cid")} not 64-dim")
      assert(ce.forall(v => !v.isNaN && !v.isInfinite))
    }
  }

  test("IVFPQ index and q141b ledger agree on routing (shared pqRoute)") {
    val idx = PipelineQueries.ivfpqIndex(spark, dir).collect()
    val nVec = PipelineQueries.embGlob(spark, dir).count()
    assert(idx.length == nVec, "one index row per vector")
    assert(idx.forall(_.getSeq[Long](2).length == 8), "8 subspace codes")
    val fromIdx = idx.groupBy(r => (r.getAs[Long]("cid"),
        r.getSeq[Long](2).mkString("-")))
      .map { case (k, rs) =>
        (k._1, k._2, rs.length.toLong, rs.map(_.getAs[Long]("vec_id")).min) }
      .toSet
    val ledger = graft.streaming.StreamingQueries
      .queries("q141b_stream_ingest_trained")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[String]("pcode"),
        r.getAs[Long]("n_ingested"), r.getAs[Long]("canonical_vec")))
      .toSet
    assert(fromIdx == ledger,
      "static index routing differs from the streaming ingest ledger")
  }

  // ---- 2. recall floors at the sf0.01 fixture --------------------------

  test("q36b/q60b/q142 recall@5 vs exact L2 at sf0.01 (500 vectors)") {
    val gt = gtL2(dir)
    val r36b = recall(gt, topSets(
      PipelineQueries.queries("q36b_ann_ivf_trained")(spark, dir)))
    val r60b = recall(gt, topSets(
      PipelineQueries.queries("q60b_ann_pq_trained")(spark, dir)))
    val r142 = recall(gt, topSets(graft.streaming.StreamingQueries
      .queries("q142_stream_ann_query")(spark, dir)))
    info(f"sf0.01 recall@5: q36b=$r36b%.2f q60b=$r60b%.2f q142=$r142%.2f")
    // Measured on this deterministic fixture: 0.80 / 1.00 / 0.80.
    assert(r36b >= 0.6, f"q36b recall $r36b%.2f below floor")
    assert(r60b >= 0.9, f"q60b recall $r60b%.2f below floor")
    assert(r142 >= 0.6, f"q142 recall $r142%.2f below floor")
  }

  // ---- 3. streaming semantics: batching independence -------------------

  /** Stages the sf0.01 embeddings as TWO files (even/odd vec_ids) so a
    * maxFilesPerTrigger=1 run splits into two micro-batches with query
    * vectors arriving in BOTH (0,2,4 / 1,3). */
  private def withStagedEmbeddings[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r15_stage")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      for ((pred, i) <- Seq(col("vec_id") % 2 === 0, col("vec_id") % 2 === 1)
          .zipWithIndex) {
        val slice = s"$tmp/_tmp/$i"
        e.filter(pred).coalesce(1).write.mode("overwrite").parquet(slice)
        val part = new java.io.File(slice).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(s"$tmp/embeddings_$i.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(1000000L * (i + 1))
      }
      spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
      try f(tmp.toString)
      finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
    } finally Fixtures.deleteRecursively(tmp)
  }

  test("q141b: ledger accounts for every vector, routes into trained cells, " +
      "and is feed-batching-independent") {
    val single = graft.streaming.StreamingQueries
      .queries("q141b_stream_ingest_trained")(spark, dir).collect()
    val nVec = PipelineQueries.embGlob(spark, dir).count()
    assert(single.map(_.getAs[Long]("n_ingested")).sum == nVec)
    val cids = PipelineQueries.trainedCodebook(spark, dir)
      .select("cid").as[Long].collect().toSet
    assert(single.map(_.getAs[Long]("cid")).forall(cids),
      "every route target is a trained centroid")
    assert(single.forall(_.getAs[String]("pcode").split("-").length == 8))
    withStagedEmbeddings { staged =>
      val multi = graft.streaming.StreamingQueries
        .queries("q141b_stream_ingest_trained")(spark, staged).collect()
      assert(multi.map(_.toSeq).toSet == single.map(_.toSeq).toSet,
        "staged multi-batch ledger differs from the single-batch run")
    }
  }

  test("q142: staged multi-batch run equals the single-batch run") {
    val single = graft.streaming.StreamingQueries
      .queries("q142_stream_ann_query")(spark, dir).collect()
    assert(single.length == 25, "5 queries x top-5")
    withStagedEmbeddings { staged =>
      val multi = graft.streaming.StreamingQueries
        .queries("q142_stream_ann_query")(spark, staged).collect()
      assert(multi.map(_.toSeq).toSet == single.map(_.toSeq).toSet,
        "staged multi-batch top-5 differs from the single-batch run")
    }
  }

  test("q140b: total assignment into trained cells, median property, 4x rule") {
    val rows = PipelineQueries.queries("q140b_outliers_trained")(spark, dir)
      .collect()
    val nVec = PipelineQueries.embGlob(spark, dir).count()
    assert(rows.length == nVec, "one verdict per vector, no drops/dups")
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    val cids = PipelineQueries.trainedCodebook(spark, dir)
      .select("cid").as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("cid")).forall(cids),
      "every assignment target is a trained centroid")
    // Median property + the exact-IEEE 4x-median verdict (q140's pins).
    rows.groupBy(_.getAs[Long]("cid")).foreach { case (cid, members) =>
      val atOrBelow = members.count { r =>
        val ratio = r.getAs[java.lang.Double]("ratio")
        ratio == null || ratio <= 1.0001
      }
      assert(atOrBelow * 2 >= members.length,
        s"cluster $cid: only $atOrBelow/${members.length} at/below median")
    }
    rows.foreach { r =>
      val ratio = r.getAs[java.lang.Double]("ratio")
      if (ratio != null) {
        if (ratio <= 3.999) assert(r.getAs[Boolean]("keep"))
        if (ratio >= 4.001) assert(!r.getAs[Boolean]("keep"))
      }
    }
  }

  test("q68b: total assignment into cell-bounded trained cells; " +
      "dup targets are kept-or-dup partitioned") {
    // The partition-style dial: K = max(64, ceil(n/125)) — 64 at the
    // 500-vector fixture, 160/640 at the 20k/80k witnesses where the
    // fixed-K alternative measured a 10x verify blow-up (SCALE.md §9).
    assert(AnnPolicy.cellBoundedK(500L) == 64L)
    assert(AnnPolicy.cellBoundedK(20000L) == 160L)
    assert(AnnPolicy.cellBoundedK(80000L) == 640L)
    val rows = PipelineQueries.queries("q68b_semantic_dedup_trained")(spark, dir)
      .collect()
    val nVec = PipelineQueries.embGlob(spark, dir).count()
    assert(rows.length == nVec)
    val cids = PipelineQueries.trainedCodebookCellBounded(spark, dir)
      .select("cid").as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("cid")).forall(cids))
    // Every dropped vector has a KEPT earlier same-cell representative:
    // the SemDeDup contract (dup = some earlier vec in the cell within
    // cosine 0.4 — and the earliest vec of any cell is always kept).
    val byCell = rows.groupBy(_.getAs[Long]("cid"))
    byCell.foreach { case (cid, members) =>
      val first = members.minBy(_.getAs[Long]("vec_id"))
      assert(first.getAs[Boolean]("keep"),
        s"cell $cid: earliest member ${first.getAs[Long]("vec_id")} dropped")
    }
  }

  test("q143: delta merge accounts for both partitions and never moves a corpus cell") {
    val rows = PipelineQueries.queries("q143_index_delta_maintain")(spark, dir)
      .collect()
    val e = PipelineQueries.embGlob(spark, dir)
    val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
    val corpusN = e.filter($"vec_id" < cut).count()
    val deltaN = e.filter($"vec_id" >= cut).count()
    assert(rows.map(_.getAs[Long]("n_corpus")).sum == corpusN,
      "every corpus vector lands in exactly one cell")
    assert(rows.map(_.getAs[Long]("n_delta")).sum == deltaN,
      "every delta vector lands in exactly one cell")
    // The frozen-codebook contract: the persisted corpus index's cell
    // set is EXACTLY the output's corpus-occupied cells — merging the
    // delta moved nothing.
    val idxCells = PipelineQueries.ivfpqIndexBefore(spark, dir, cut)
      .groupBy($"cid", $"codes").count().collect()
      .map(r => (r.getAs[Long]("cid"),
        r.getSeq[Long](1).mkString("-"), r.getAs[Long]("count"))).toSet
    val outCorpusCells = rows.filter(_.getAs[Long]("n_corpus") > 0)
      .map(r => (r.getAs[Long]("cid"), r.getAs[String]("pcode"),
        r.getAs[Long]("n_corpus"))).toSet
    assert(idxCells == outCorpusCells,
      "corpus cells in the merged ledger differ from the persisted index")
  }

  // ---- 4. hermetic 5k gate: trained quantizer off every floor ----------

  test("trained-quantizer recall at the hermetic 5k corpus beats the " +
      "fixture quantizer's curve") {
    // Same deterministic corpus as Round14OpsSpec's gate (seed 42),
    // written FLAT-FILE so the streaming q142 source matches it too.
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann5k_b")
    try {
      val rnd = new scala.util.Random(42)
      val rows = (0L until 5000L).map { i =>
        val emb = Seq.fill(64)(
          (math.rint((rnd.nextDouble() * 2 - 1 + rnd.nextGaussian() * 0.3)
            * 1e6) / 1e6).toFloat)
        (i, emb, rnd.nextInt(10))
      }
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage")
      val part = new java.io.File(s"$tmp/_stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/embeddings.parquet"))

      val gt = gtL2(tmp.toString)
      val r36b = recall(gt, topSets(
        PipelineQueries.queries("q36b_ann_ivf_trained")(spark, tmp.toString)))
      val r60b = recall(gt, topSets(
        PipelineQueries.queries("q60b_ann_pq_trained")(spark, tmp.toString)))
      val r142 = recall(gt, topSets(graft.streaming.StreamingQueries
        .queries("q142_stream_ann_query")(spark, tmp.toString)))
      info(f"5k recall@5: q36b=$r36b%.2f q60b=$r60b%.2f q142=$r142%.2f")
      // Measured: 0.88 / 0.80 / 0.84. The fixture quantizer's IVF at
      // the same corpus and a comparable ~10-11% scan fraction reads
      // 0.36 (Round14OpsSpec's gate) — trained lists concentrate the
      // true neighbors, which is the entire point of training. Floors
      // sit a margin under the measured values; the corpus is
      // deterministic, so a dip means the operators changed.
      assert(r36b >= 0.6, f"q36b 5k recall $r36b%.2f below floor")
      assert(r60b >= 0.6, f"q60b 5k recall $r60b%.2f below floor")
      assert(r142 >= 0.6, f"q142 5k recall $r142%.2f below floor")
    } finally Fixtures.deleteRecursively(tmp)
  }
}
