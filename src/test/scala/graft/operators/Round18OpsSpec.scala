package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Pins the round-16 operators and dials:
  *
  *  - [[AnnPolicy.coarseAssignM]] (the q36c index-side multi-assignment
  *    width, VERDICT r15 #1): arithmetic at the measured points and the
  *    Column twin's lockstep with the Scala form.
  *  - The `spark.graft.ann.queryCount` witness knob: widens the graded
  *    query set without touching the default-5 oracle contract.
  *  - q36c output hygiene at sf0.01 (dense ranks, no self-neighbors).
  *  - q153 storage rewrite: the ledger SERVED from the rewritten
  *    cell-partitioned table equals q144's maintained view ledger
  *    (both are from-scratch-equal by oracle, so equal to each other —
  *    pinned directly here), untouched partitions' files are bit-level
  *    untouched (same mtime+length — the O(touched buckets) witness at
  *    spec scale), and fully-tombstoned cells' directories are gone
  *    (compaction at the storage level).
  *  - q154 forget-rewrite: probing the REWRITTEN posting table emits
  *    exactly q152's rows.
  */
class Round18OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("AnnPolicy.coarseAssignM: floor and ceiling-division growth") {
    // Floor regime: every C up to 24 (the 320k witness point) reads the
    // measured m = 8.
    assert(AnnPolicy.coarseAssignM(8L) == 8L)
    assert(AnnPolicy.coarseAssignM(24L) == 8L)
    // Growth regime: m = ⌈C/3⌉ past C = 24 — the measured m/C ratio
    // keeps scaling instead of freezing at the small-K calibration.
    assert(AnnPolicy.coarseAssignM(25L) == 9L, "ceiling division")
    assert(AnnPolicy.coarseAssignM(30L) == 10L)
    assert(AnnPolicy.coarseAssignM(64L) == 22L,
      "at the 4096-cap hierarchy (C = 64): 576 of 4096 per-row compares")
  }

  test("AnnPolicy.coarseAssignM Column twin stays in lockstep") {
    val grid = Seq(2L, 7L, 8L, 9L, 23L, 24L, 25L, 26L, 63L, 64L, 100L)
    val got = grid.toDF("c")
      .select(AnnPolicy.scanCeilCol("c", AnnPolicy.CoarseAssignDiv,
        AnnPolicy.CoarseAssignFloor).as("m"))
      .as[Long].collect().toSeq
    assert(got == grid.map(AnnPolicy.coarseAssignM),
      "generated Column form must equal the Scala policy at every C")
  }

  test("q36c: queryCount witness knob widens the query set; default is 5") {
    val got5 = PipelineQueries.queries("q36c_ann_ivf_coarse")(spark, dir)
    assert(got5.select($"query_id").distinct().count() == 5)
    spark.conf.set("spark.graft.ann.queryCount", "7")
    try {
      val got7 = PipelineQueries.queries("q36c_ann_ivf_coarse")(spark, dir)
      assert(got7.select($"query_id").distinct().count() == 7)
    } finally spark.conf.unset("spark.graft.ann.queryCount")
  }

  test("q36c: dense ranks, no self-neighbors, rows per query") {
    val rows = PipelineQueries.queries("q36c_ann_ivf_coarse")(spark, dir)
      .collect()
    assert(rows.length == 25, "5 queries x top-5")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5),
        s"query $q ranks must be dense 1..5")
      assert(rs.forall(_.getLong(2) != q), s"query $q returned itself")
    }
  }

  test("q153: rewritten storage serves q144's ledger; rewrite is partition-scoped") {
    // Isolated corpus dir: q153 REWRITES its partitioned artifact in
    // place, so the test owns a private copy of the embeddings (a
    // different dir → different artifact keys → no cross-suite order
    // dependence).
    val iso = java.nio.file.Files.createTempDirectory("q153-iso").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"),
      java.nio.file.Paths.get(s"$iso/embeddings.parquet"))
    val e = PipelineQueries.embGlob(spark, iso)
    val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
    PipelineQueries.ivfpqIndexPartBefore(spark, iso, cut)
    val base = PipelineQueries.ivfpqPartPath(spark, iso, cut)
    def dirState(): Map[String, (Long, Long)] =
      new java.io.File(base).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
        .map(d => d.getName -> (
          d.listFiles().map(_.lastModified()).max,
          d.listFiles().map(_.length()).sum)).toMap
    val before = dirState()

    val served = PipelineQueries.queries("q153_index_rewrite")(spark, iso)
      .collect()
    val view = PipelineQueries.queries("q144_index_delete_compact")(spark, iso)
      .collect()
    assert(served.map(_.toString).toSeq == view.map(_.toString).toSeq,
      "the ledger served from the rewritten bytes must equal the " +
        "maintained view ledger (both are from-scratch-equal)")

    val after = dirState()
    // Touched set from the rewrite's audit log (the staging directory
    // is deleted once the overwrite commits — VERDICT r16 #4 — so the
    // on-disk source the old assertion read is gone by design).
    assert(!new java.io.File(base + "_staging").exists(),
      "the staging directory must be cleaned up after the overwrite commits")
    val (touchedLog, writtenLog) = AnnQueries.rewriteTouchedLog.get(base)
    val staged = writtenLog.map("cid=" + _)
    val vanished = before.keySet -- after.keySet
    assert(vanished == (touchedLog -- writtenLog).map("cid=" + _),
      "compacted directories must be exactly the touched-but-emptied cells")
    val untouched = before.keySet -- staged -- vanished
    assert(untouched.nonEmpty,
      "at spec scale some cells must be untouched, or the witness is vacuous")
    untouched.foreach { d =>
      assert(after(d) == before(d),
        s"untouched partition $d was rewritten — the rewrite must be " +
          "scoped to touched cells")
    }
    // Compaction reaches the storage: served cells = surviving dirs.
    val servedCells = served.map(r => s"cid=${r.getLong(0)}").toSet
    assert(after.keySet == servedCells,
      "partition directories after rewrite must be exactly the " +
        "served ledger's cells (emptied cells' directories dropped)")
  }

  test("q156: constructed collapse fires the split; repair is local") {
    // Build a collapse corpus from sf0.01: the 9/10 tail shifted +5 on
    // all dims (the SCALE.md 10.2 unimodal pathology at spec scale).
    // The drifted tail routes into one frozen cell, the flag fires,
    // and the split must (a) conserve membership, (b) leave every
    // non-giant cell's ledger row identical to q148's, (c) remove the
    // split cell's sub=0 row.
    val iso = java.nio.file.Files.createTempDirectory("q156-iso").toString
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
    val cut = (e0.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
    e0.withColumn("embedding", when($"vec_id" >= cut,
        expr("transform(embedding, v -> CAST(v + 5.0 AS FLOAT))"))
        .otherwise($"embedding"))
      .coalesce(1).write.parquet(s"$iso/embeddings.parquet")

    val repaired = PipelineQueries.queries("q156_cell_repair")(spark, iso)
      .collect()
    val stats = PipelineQueries.queries("q148_ivf_index_stats")(spark, iso)
      .collect()
    val giants = stats.filter(_.getAs[Boolean]("is_giant"))
      .map(_.getLong(0)).toSet
    assert(giants.nonEmpty, "the +5 unimodal tail must collapse a cell")

    val split = repaired.filter(_.getLong(1) > 0)
    assert(split.map(_.getLong(0)).toSet == giants,
      "exactly the flagged cells are split")
    assert(split.groupBy(_.getLong(0)).forall(_._2.length >= 2),
      "a giant cell splits into at least 2 sub-cells")
    assert(repaired.map(_.getLong(2)).sum ==
      e0.count(),
      "repair conserves membership — every vector in exactly one cell")
    assert(repaired.filter(_.getLong(1) == 0)
      .forall(r => !giants.contains(r.getLong(0))),
      "a split cell must not keep a sub=0 row")
    val untouchedWant = stats.filterNot(r => giants.contains(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val untouchedGot = repaired.filter(_.getLong(1) == 0)
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(untouchedGot == untouchedWant,
      "untouched cells' ledger rows must equal q148's — the repair " +
        "must be LOCAL to the giant cell")
  }

  test("q157: serving from the rewritten store never surfaces a tombstone") {
    val rows = PipelineQueries.queries("q157_ann_serve_rewritten")(spark, dir)
      .collect()
    assert(rows.length == 25, "5 queries x top-5")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5),
        s"query $q ranks must be dense 1..5")
      assert(rs.forall(_.getLong(2) != q), s"query $q returned itself")
    }
    // Tombstoned rows were deleted from the bytes by the q153 rewrite,
    // not filtered at query time — none may surface.
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
    assert(rows.forall(r =>
      r.getLong(2) >= cut || r.getLong(2) % 13 != 5),
      "a tombstoned vector surfaced from the rewritten storage")
  }

  test("q154: probing the rewritten posting table emits exactly q152's rows") {
    val a = PipelineQueries.queries("q154_forget_rewrite")(spark, dir)
      .collect()
    val b = PipelineQueries.queries("q152_dedup_forget")(spark, dir)
      .collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "storage-level forget must be observationally identical to the " +
        "view-level forget")
    assert(a.nonEmpty, "the forget path must still emit surviving pairs")
  }
}
