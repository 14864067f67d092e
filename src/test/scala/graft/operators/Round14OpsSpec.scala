package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Pins [[AnnPolicy]] — the ANN recall/latency dials as functions of
  * index size (VERDICT r11 #1, promised by AnnPolicy's scaladoc since
  * r12 and owed since then: ADVICE r12). Three layers:
  *
  *  1. the POLICY VALUES at the corpus sizes the scale witness
  *     measures (500 / 2k / 20k / 80k vectors — SCALE.md §6's rows),
  *  2. every integer THRESHOLD EDGE (the exact n where a dial steps),
  *  3. LOCKSTEP between the Scala functions and the in-plan Column /
  *     DuckDB-SQL twins that `PipelineQueries` interpolates — the
  *     single-source-of-truth guarantee that replaced the r12
  *     hand-triplicated literals.
  */
class Round14OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  // ---- 1. policy values at the witness corpus sizes -------------------

  test("lshRadius at the SCALE.md §6 corpus sizes") {
    // 500 vectors: every probe set short of r=6 misses the 250-candidate
    // target; 2k steps to 4; ≥ ~3.5k sits on the r=3 floor forever
    // (the probe FRACTION, not count, is fixed — recall does not decay).
    assert(AnnPolicy.lshRadius(500L) == 6)
    assert(AnnPolicy.lshRadius(2000L) == 4)
    assert(AnnPolicy.lshRadius(20000L) == 3)
    assert(AnnPolicy.lshRadius(80000L) == 3)
  }

  test("ivfNprobe at the witness index sizes (1 list per 125 vectors)") {
    // 500 vecs → 4 lists, 2k → 16, 20k → 160, 80k → 640. The divisor
    // is 10 (a 10% scan), measured against 20 and 5 at 20k/80k —
    // recall@5 0.52/0.72 vs 0.32/0.52 vs 0.68/0.76 (SCALE.md §6).
    assert(AnnPolicy.ivfNprobe(4L) == 2L)    // floor: half the index
    assert(AnnPolicy.ivfNprobe(16L) == 2L)   // floor: 12.5%
    assert(AnnPolicy.ivfNprobe(160L) == 16L) // ⌈160/10⌉ — 10% scan
    assert(AnnPolicy.ivfNprobe(640L) == 64L) // ⌈640/10⌉ — 10% scan
  }

  test("pqShortlist at the witness corpus sizes") {
    assert(AnnPolicy.pqShortlist(500L) == 100L)   // floor: 20× k
    assert(AnnPolicy.pqShortlist(2000L) == 100L)  // exactly n/20
    assert(AnnPolicy.pqShortlist(20000L) == 1000L)
    assert(AnnPolicy.pqShortlist(80000L) == 4000L)
  }

  // ---- 2. threshold edges ---------------------------------------------

  test("lshRadius steps at the exact integer thresholds") {
    // cum(r)·n ≥ 250·4096 = 1 024 000: r=3 needs n ≥ ⌈1024000/299⌉ =
    // 3425; r=4 needs n ≥ ⌈1024000/794⌉ = 1290; r=5 needs n ≥
    // ⌈1024000/1586⌉ = 646.
    assert(AnnPolicy.lshRadius(3425L) == 3)
    assert(AnnPolicy.lshRadius(3424L) == 4)
    assert(AnnPolicy.lshRadius(1290L) == 4)
    assert(AnnPolicy.lshRadius(1289L) == 5)
    assert(AnnPolicy.lshRadius(646L) == 5)
    assert(AnnPolicy.lshRadius(645L) == 6)
    assert(AnnPolicy.lshRadius(1L) == 6)
  }

  test("scan-fraction dials leave their floors at the exact thresholds") {
    // nprobe floor 2 holds through L = 20 (⌈20/10⌉ = 2), steps at 21.
    assert(AnnPolicy.ivfNprobe(20L) == 2L)
    assert(AnnPolicy.ivfNprobe(21L) == 3L)
    // shortlist floor 100 holds through n = 2000, steps at 2001.
    assert(AnnPolicy.pqShortlist(2000L) == 100L)
    assert(AnnPolicy.pqShortlist(2001L) == 101L)
    // Ceiling division, not floor: one extra row rounds UP.
    assert(AnnPolicy.scanCeil(20001L, AnnPolicy.PqScanDiv, 100L) == 1001L)
  }

  // ---- 3. Scala / Column / SQL lockstep --------------------------------

  /** The n values the lockstep sweep evaluates: every edge above, the
    * witness sizes, and a spread through six decades. */
  private val sweep: Seq[Long] = Seq(
    1L, 10L, 100L, 500L, 645L, 646L, 1289L, 1290L, 2000L, 2001L,
    3424L, 3425L, 20000L, 20001L, 80000L, 1000000L, 123456789L)

  test("lshRadiusCol computes exactly lshRadius for every sweep point") {
    val got = sweep.toDF("nv")
      .select($"nv", AnnPolicy.lshRadiusCol($"nv").as("r"))
      .as[(Long, Int)].collect().toMap
    sweep.foreach { n =>
      assert(got(n) == AnnPolicy.lshRadius(n), s"lshRadiusCol at n=$n")
    }
  }

  test("scanCeilCol computes exactly scanCeil for every sweep point") {
    for ((div, floor) <- Seq(
        AnnPolicy.IvfScanDiv -> AnnPolicy.IvfNprobeFloor,
        AnnPolicy.PqScanDiv -> AnnPolicy.PqShortlistFloor)) {
      val got = sweep.toDF("nv")
        .select($"nv", AnnPolicy.scanCeilCol("nv", div, floor).as("v"))
        .as[(Long, Long)].collect().toMap
      sweep.foreach { n =>
        assert(got(n) == AnnPolicy.scanCeil(n, div, floor),
          s"scanCeilCol at n=$n div=$div floor=$floor")
      }
    }
  }

  test("SQL twins carry the same constants as the Scala policy") {
    // DuckDB isn't linkable from the JVM suite, so the SQL twins are
    // pinned by spelling: the exact arithmetic the driver's oracle gate
    // then executes against real corpora (CORRECTNESS_r*.json is the
    // cross-engine value check; this is the drift check).
    assert(AnnPolicy.scanCeilSql("count(1)",
      AnnPolicy.IvfScanDiv, AnnPolicy.IvfNprobeFloor) ==
      "greatest(2, (count(1) + 9) // 10)")
    assert(AnnPolicy.scanCeilSql("count(1)",
      AnnPolicy.PqScanDiv, AnnPolicy.PqShortlistFloor) ==
      "greatest(100, (count(1) + 19) // 20)")
    val radSql = AnnPolicy.lshRadiusSql("count(1)")
    AnnPolicy.LshCum.init.foreach { case (r, cum) =>
      assert(radSql.contains(s"WHEN count(1) * $cum >= 1024000 THEN $r"),
        s"lshRadiusSql missing the r=$r threshold")
    }
    assert(radSql.endsWith(s"ELSE ${AnnPolicy.LshCum.last._1} END"))
  }

  // ---- 4. hermetic mid-scale recall gate --------------------------------

  /** The repo fixtures stop at 2,000 vectors, where every dial still
    * sits on its small-corpus floor (radius 4–6, nprobe 2, shortlist
    * 100); the 20k/80k corpora that exercise the policy live in /tmp
    * and are witnessed offline (SCALE.md §6). This test is the
    * HERMETIC middle: a deterministic 5,000-vector corpus — the same
    * near-random distribution as the fuzz generator's embeddings
    * (uniform(-1,1) + N(0, 0.3) per dim) — generated in-test, where
    * the policy is OFF every floor for the first time (radius 3,
    * nprobe 4 of 40 lists, shortlist 250), so the policy-active plan
    * branches are gated in `sbt test`, not only in offline runs.
    */
  test("policy-active recall at a hermetic 5k-vector corpus (all dials off-floor)") {
    // Off-floor dials at n = 5000 (40 lists at 1 centroid per 125).
    assert(AnnPolicy.lshRadius(5000L) == 3)
    assert(AnnPolicy.ivfNprobe(40L) == 4L)
    assert(AnnPolicy.pqShortlist(5000L) == 250L)

    val tmp = java.nio.file.Files.createTempDirectory("graft_ann5k")
    try {
      val rnd = new scala.util.Random(42)
      val rows = (0L until 5000L).map { i =>
        val emb = Seq.fill(64)(
          (math.rint((rnd.nextDouble() * 2 - 1 + rnd.nextGaussian() * 0.3)
            * 1e6) / 1e6).toFloat)
        (i, emb, rnd.nextInt(10))
      }
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

      def topSets(name: String, rankCap: Boolean): Map[Long, Set[Long]] = {
        val df = PipelineQueries.queries(name)(spark, tmp.toString)
        val capped = if (rankCap) df.filter($"rank" <= 5) else df
        capped.select($"query_id", $"vec_id").as[(Long, Long)]
          .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      }
      def recall(gt: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
        val r = gt.keys.toSeq.map(q =>
          (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
        r.sum / r.size
      }
      val gtCos = topSets("q25_cosine_topk", rankCap = true)
      val rLsh = recall(gtCos, topSets("q26_ann_lsh", rankCap = false))
      val rIvf = recall(gtCos, topSets("q36_ann_ivf", rankCap = false))
      // PQ's truth is the L2 ranking (its ADC approximates L2).
      val e = spark.read.parquet(s"$tmp/embeddings.parquet")
        .select($"vec_id", $"embedding")
      val qv = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"l2", $"vec_id")
      val gtL2 = e.crossJoin(broadcast(qv))
        .filter($"vec_id" =!= $"query_id")
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
        .select($"query_id", $"vec_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rPq = recall(gtL2, topSets("q60_ann_pq", rankCap = false))

      info(f"5k-vector recall@5: lsh=$rLsh%.2f ivf=$rIvf%.2f pq=$rPq%.2f")
      // Measured at this deterministic corpus: LSH 0.36 / IVF 0.36 /
      // PQ 0.80 — the 5k point of the SCALE.md §6 curve (IVF at a 10%
      // scan rises with n on near-random data: 0.36 at 5k, 0.52 at
      // 20k, 0.72 at 80k). Floors sit a margin under the measured
      // values; the corpus is deterministic, so a dip means the
      // OPERATORS or the policy changed — which is the point.
      assert(rLsh >= 0.28, f"LSH radius-3 recall@5 $rLsh%.2f below floor")
      assert(rIvf >= 0.28, f"IVF nprobe-4 recall@5 $rIvf%.2f below floor")
      assert(rPq >= 0.70, f"PQ shortlist-250 recall@5 $rPq%.2f below floor")
    } finally Fixtures.deleteRecursively(tmp)
  }

  // ---- 5. round-13 operators: q140 / q141 -------------------------------

  test("q140: assignment is total, centroids are their own cluster floor, " +
      "and the keep verdict is the 4x-median rule") {
    val dir = "/root/testdata/sf0.01"
    val rows = PipelineQueries.queries("q140_embedding_outliers")(spark, dir)
      .collect()
    val nVec = Tables(spark, dir).embeddings.count()
    assert(rows.length == nVec, "one verdict per vector, no drops/dups")
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    rows.filter(_.getAs[Long]("vec_id") % 125 == 0).foreach { r =>
      // A centroid is a member of its own cluster at distance 0.
      assert(r.getAs[Long]("cid") == r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("d2") == 0.0)
      assert(r.getAs[Boolean]("keep"))
    }
    // Median property: within each cluster at least half the members
    // sit at or below the cluster median (ratio <= 1 + rounding ulp).
    rows.groupBy(_.getAs[Long]("cid")).foreach { case (cid, members) =>
      val atOrBelow = members.count { r =>
        val ratio = r.getAs[java.lang.Double]("ratio")
        ratio == null || ratio <= 1.0001
      }
      assert(atOrBelow * 2 >= members.length,
        s"cluster $cid: only $atOrBelow/${members.length} at/below median")
    }
    // keep <=> d <= 4*med, checked away from the rounded boundary.
    rows.foreach { r =>
      val ratio = r.getAs[java.lang.Double]("ratio")
      if (ratio != null) {
        if (ratio <= 3.999) assert(r.getAs[Boolean]("keep"))
        if (ratio >= 4.001) assert(!r.getAs[Boolean]("keep"))
      }
    }
  }

  test("q141: the ingest ledger is feed-batching-independent and " +
      "accounts for every vector") {
    val dir = "/root/testdata/sf0.01"
    val single = graft.streaming.StreamingQueries
      .queries("q141_stream_vector_ingest")(spark, dir).collect()
    val nVec = Tables(spark, dir).embeddings.count()
    assert(single.map(_.getAs[Long]("n_ingested")).sum == nVec,
      "every ingested vector lands in exactly one cell")
    val centIds = Tables(spark, dir).embeddings
      .filter(col("vec_id") % 125 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(single.map(_.getAs[Long]("cid")).forall(centIds),
      "every route target is a codebook centroid")
    assert(single.forall(_.getAs[String]("pcode").split("-").length == 8),
      "PQ code is 8 subspace ids")

    // Staged 2-file feed, maxFilesPerTrigger=1: two micro-batches must
    // produce the identical ledger (the complete-mode state carries
    // cells across batches; cell counts are arrival-order independent).
    val tmp = java.nio.file.Files.createTempDirectory("graft_q141_stage")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      for ((pred, i) <- Seq(col("vec_id") < 250, col("vec_id") >= 250).zipWithIndex) {
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
        val staged = graft.streaming.StreamingQueries
          .queries("q141_stream_vector_ingest")(spark, tmp.toString).collect()
        assert(staged.map(_.toSeq).toSet == single.map(_.toSeq).toSet,
          "staged multi-batch ledger differs from the single-batch run")
      } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
    } finally Fixtures.deleteRecursively(tmp)
  }

  test("the in-plan dials at the sf0.001 fixture resolve the calibrated values") {
    // 500-vector fixture: radius 6, nprobe 2 (4 lists), shortlist 100 —
    // the small-corpus branches AnnRecallSpec's floors were calibrated
    // on. Resolved THROUGH the actual query plans' 1-row aggregates.
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir).embeddings.select($"vec_id")
    val n = e.count()
    val nl = e.filter($"vec_id" % 125 === 0).count()
    assert(AnnPolicy.lshRadius(n) == 6)
    assert(AnnPolicy.ivfNprobe(nl) == 2L)
    assert(AnnPolicy.pqShortlist(n) == 100L)
  }
}
