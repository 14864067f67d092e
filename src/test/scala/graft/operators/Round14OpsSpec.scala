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
