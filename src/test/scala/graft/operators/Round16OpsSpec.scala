package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Pins the round-15 ANN-lifecycle completions (VERDICT r14 #1-#4/#6):
  *
  *  - q144 CDC deletes + compaction: the maintained count ledger equals
  *    a from-scratch routing of the surviving set, tombstoned singleton
  *    cells actually disappear, and nothing corpus-sized is touched.
  *  - q145 drift-triggered retrain gate: χ²-floor threshold arithmetic,
  *    no-fire on the same-distribution sf0.01 delta, FIRE on a hermetic
  *    shifted delta (the frozen-codebook-rot alarm).
  *  - q142b append-mode serving: identical final rows to q142's
  *    complete-mode run, with the state store EVICTED down to the one
  *    sentinel window (complete mode's state never shrinks).
  *  - q146 streaming CDC maintenance: equals the batch q143 merge on
  *    the same corpus, batching-independent, both state-store
  *    providers.
  *  - The grow-K policy dials ([[AnnPolicy.grownK]]) for the 320k
  *    witness (evidence/r15/ann_320k.json).
  */
class Round16OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  // ---- grow-K / drift-gate policy dials --------------------------------

  test("AnnPolicy.ceilSqrt is exact at and around perfect squares") {
    assert(AnnPolicy.ceilSqrt(1L) == 1L)
    assert(AnnPolicy.ceilSqrt(2L) == 2L)
    assert(AnnPolicy.ceilSqrt(4L) == 2L)
    assert(AnnPolicy.ceilSqrt(15L) == 4L)
    assert(AnnPolicy.ceilSqrt(16L) == 4L)
    assert(AnnPolicy.ceilSqrt(17L) == 5L)
    assert(AnnPolicy.ceilSqrt(320000L) == 566L)
    assert(AnnPolicy.ceilSqrt(999999999999L) == 1000000L)
    assert(AnnPolicy.ceilSqrt(1000000000000L) == 1000000L)
    assert(AnnPolicy.ceilSqrt(1000000000001L) == 1000001L)
  }

  test("AnnPolicy.grownK: sqrt growth, TrainedK floor, coarse-route cap") {
    assert(AnnPolicy.grownK(500L) == 64L, "small corpora keep K = 64")
    assert(AnnPolicy.grownK(4096L) == 64L, "floor holds to K^2")
    assert(AnnPolicy.grownK(4097L) == 65L, "first step past the floor")
    assert(AnnPolicy.grownK(80000L) == 283L)
    assert(AnnPolicy.grownK(320000L) == 566L, "the r15 witness dial")
    assert(AnnPolicy.grownK(16777216L) == 4096L, "cap boundary (4096^2)")
    assert(AnnPolicy.grownK(1L << 60) == AnnPolicy.CoarseRouteBound,
      "past the cap routing must switch to the two-level coarse shape")
    // The nprobe policy keeps the ~10% scan target as K grows.
    assert(AnnPolicy.ivfNprobe(566L) == 57L)
  }

  test("q36c: two-level coarse routing — dials, oracle shape, recall floor") {
    // Coarse-probe dial (set on data — see AnnPolicy.CoarseProbeDiv's
    // measurement history: single-assign 0.72/0.72, +multi-assign
    // 0.80/0.76, +⌈C/2⌉ probe 0.80/0.80 at 20k/80k).
    assert(AnnPolicy.CoarseProbeDiv == 2L)
    assert(AnnPolicy.coarseProbe(8L) == 4L)   // sf0.01: K=64, step=8
    assert(AnnPolicy.coarseProbe(12L) == 6L)  // K=142 (20k vectors)
    assert(AnnPolicy.coarseProbe(24L) == 12L) // K=566 (320k vectors)
    assert(AnnPolicy.coarseProbe(64L) == 32L) // K=4096 (the cap)
    assert(AnnPolicy.coarseProbe(2L) == 2L, "floor")
    // The oracle's K scalar carries both policy constants.
    assert(AnnPolicy.grownKSql.contains(AnnPolicy.CoarseRouteBound.toString))
    assert(AnnPolicy.grownKSql.contains(AnnPolicy.TrainedK.toString))

    val rows = PipelineQueries.queries("q36c_ann_ivf_coarse")(spark, dir)
      .collect()
    assert(rows.length == 25, "5 queries x top-5")
    // Recall floor vs exact L2. The two-level hierarchy pays a recall
    // toll vs the flat scan (0.80 vs ~1.0 at 20k/80k; lower still in
    // the 500-vector noise regime where every probe decision is a
    // coin toss between near-equidistant cells) — the floor documents
    // the measured value with margin, and the scale numbers live in
    // SCALE.md §10.7 / evidence/r15.
    val e = PipelineQueries.embGlob(spark, dir)
    val qv = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"l2", $"vec_id")
    val gt = e.crossJoin(broadcast(qv)).filter($"vec_id" =!= $"query_id")
      .withColumn("l2",
        graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = rows.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("vec_id"))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val rec = gt.keys.toSeq.map(q =>
      (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
      .sum / gt.size
    info(f"q36c sf0.01 recall@5 = $rec%.2f")
    assert(rec >= 0.4, f"q36c recall $rec%.2f below floor")
  }

  test("drift gate: χ²-floor threshold arithmetic") {
    assert(AnnPolicy.DriftGateFactor == 4L)
    // sf0.01 shape: K = 64 actual cells, delta = 50 rows
    // → floor = 4·63/100 = 2.52 exactly.
    assert(4.0 * 63 / 100 == 2.52)
  }

  // ---- q144: deletes + compaction --------------------------------------

  test("q144: maintained ledger equals from-scratch routing of survivors; " +
      "emptied cells are compacted away") {
    val rows = PipelineQueries.queries("q144_index_delete_compact")(spark, dir)
      .collect()
    val e = PipelineQueries.embGlob(spark, dir)
    val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
    val nDeleted = e.filter($"vec_id" < cut && $"vec_id" % 13 === 5).count()
    val nCorpus = e.filter($"vec_id" < cut).count()
    val nDelta = e.filter($"vec_id" >= cut).count()
    assert(nDeleted > 0, "fixture must exercise the tombstone path")
    assert(rows.map(_.getAs[Long]("n_corpus")).sum == nCorpus - nDeleted,
      "corpus counts must drop by exactly the tombstone count")
    assert(rows.map(_.getAs[Long]("n_delta")).sum == nDelta)
    assert(rows.forall(r => r.getAs[Long]("n_live") ==
      r.getAs[Long]("n_corpus") + r.getAs[Long]("n_delta")))
    assert(rows.forall(_.getAs[Long]("n_live") > 0), "compaction filter")
    assert(rows.forall(_.getAs[Long]("n_corpus") >= 0),
      "a tombstone can never over-subtract: routing is deterministic " +
        "under the frozen codebook, so every delete hits a stored cell")

    // From-scratch rebuild of the surviving set through the same frozen
    // artifacts — the maintained state must equal the rebuilt state.
    val cb = PipelineQueries.trainedCodebookBefore(spark, dir, cut)
      .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))
    val surv = e.filter(($"vec_id" >= cut) ||
      ($"vec_id" % 13 =!= 5)).repartition(8, $"vec_id")
    val rebuilt = PipelineQueries.pqRoute(surv.crossJoin(broadcast(cb)))
      .groupBy($"cid", $"pcode")
      .agg(sum(when($"vec_id" < cut, 1L).otherwise(0L)).as("n_corpus"),
        sum(when($"vec_id" >= cut, 1L).otherwise(0L)).as("n_delta"),
        count(lit(1)).as("n_live"))
      .collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[String]("pcode"),
        r.getAs[Long]("n_corpus"), r.getAs[Long]("n_delta"),
        r.getAs[Long]("n_live"))).toSet
    val maintained = rows.map(r => (r.getAs[Long]("cid"),
      r.getAs[String]("pcode"), r.getAs[Long]("n_corpus"),
      r.getAs[Long]("n_delta"), r.getAs[Long]("n_live"))).toSet
    assert(maintained == rebuilt,
      "maintained ledger differs from the from-scratch rebuild")

    // Compaction is real: at this fixture most cells are singletons, so
    // some tombstoned cell must have emptied and vanished.
    val idxCells = PipelineQueries.ivfpqIndexBefore(spark, dir, cut)
      .select($"cid",
        array_join($"codes".cast("array<string>"), "-").as("pcode"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[String]("pcode"))).toSet
    val liveCells = maintained.map(t => (t._1, t._2))
    val emptied = idxCells.diff(liveCells)
    assert(emptied.nonEmpty,
      "fixture produced no emptied cell — compaction path unexercised")
  }

  // ---- q145: drift gate -------------------------------------------------

  test("q145: same-distribution delta stays under the gate") {
    val r = PipelineQueries.queries("q145_index_drift_gate")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_delta") == 50L)
    assert(r.getAs[Long]("k") == 64L)
    assert(r.getAs[Double]("noise_floor") == 2.52)
    assert(r.getAs[Double]("kl") >= 0.0, "KL with smoothing can dip below " +
      "0 only by the smoothing bias bound; sf0.01 measures 0.62")
    assert(!r.getAs[Boolean]("retrain"),
      "gate must NOT fire on a same-distribution delta")
  }

  test("q145: a shifted delta fires the gate (hermetic corpus)") {
    // 450 corpus rows from the uniform cube, 50 delta rows packed into
    // one far-off cluster — the delta routes into one or two cells and
    // the occupancy KL jumps past the χ² floor.
    val tmp = java.nio.file.Files.createTempDirectory("graft_r16_shift")
    try {
      val rnd = new scala.util.Random(7)
      val rows = (0L until 500L).map { i =>
        val emb =
          if (i < 450) Seq.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
          else Seq.fill(64)((10.0 + rnd.nextDouble() * 0.1).toFloat)
        (i, emb)
      }
      rows.toDF("vec_id", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage")
      val part = new java.io.File(s"$tmp/_stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/embeddings.parquet"))

      val r = PipelineQueries.queries("q145_index_drift_gate")(
        spark, tmp.toString).collect().head
      info(f"shifted delta: kl=${r.getAs[Double]("kl")}%.3f floor=" +
        f"${r.getAs[Double]("noise_floor")}%.3f " +
        s"cells=${r.getAs[Long]("n_cells_delta")}")
      assert(r.getAs[Boolean]("retrain"),
        "gate must fire on a distribution-shifted delta")
      assert(r.getAs[Long]("n_cells_delta") <= 4,
        "the shifted delta should concentrate into a few cells")
    } finally Fixtures.deleteRecursively(tmp)
  }

  // ---- q142b: append-mode serving ---------------------------------------

  test("q142b equals q142's complete-mode result and evicts its state") {
    val complete = graft.streaming.StreamingQueries
      .queries("q142_stream_ann_query")(spark, dir).collect()
    val append = graft.streaming.StreamingQueries
      .queries("q142b_stream_ann_append")(spark, dir).collect()
    assert(append.length == 25, "5 queries x top-5")
    assert(append.map(_.toSeq).toSet == complete.map(_.toSeq).toSet,
      "append-mode serving rows differ from the complete-mode state")
    assert(graft.streaming.StreamingQueries
      .stateRowsAfter("q142b_stream_ann_append") == 1L,
      "append mode must evict every emitted window — only the " +
        "sentinel's never-closed window may remain")
  }

  // ---- q146: streaming CDC maintenance ----------------------------------

  private def rowSet(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(_.toSeq).toSet

  test("q146 equals the batch q143 merge, survives staged batching, " +
      "and matches under RocksDB state") {
    val batch = PipelineQueries
      .queries("q143_index_delta_maintain")(spark, dir).collect()
    val stream = graft.streaming.StreamingQueries
      .queries("q146_stream_index_maintain")(spark, dir).collect()
    assert(rowSet(stream) == rowSet(batch),
      "streaming maintenance differs from the batch q143 merge")

    // Staged two-file feed (even/odd vec_ids, maxFilesPerTrigger=1):
    // delta vectors arrive across two micro-batches and the final
    // merged ledger must not care.
    val tmp = java.nio.file.Files.createTempDirectory("graft_r16_stage")
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
      try {
        val multi = graft.streaming.StreamingQueries
          .queries("q146_stream_index_maintain")(spark, tmp.toString).collect()
        assert(rowSet(multi) == rowSet(batch),
          "staged multi-batch maintenance differs from the batch merge")
      } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")

      spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
      try {
        val rocks = graft.streaming.StreamingQueries
          .queries("q146_stream_index_maintain")(spark, tmp.toString).collect()
        assert(rowSet(rocks) == rowSet(batch),
          "RocksDB-state maintenance differs from the batch merge")
      } finally spark.conf.unset("spark.graft.streaming.stateStore")
    } finally Fixtures.deleteRecursively(tmp)
  }
}
