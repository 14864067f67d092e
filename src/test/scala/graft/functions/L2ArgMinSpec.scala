package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** The native argmin kernel behind the map-only Lloyd assignment and
  * q36c's in-row fine assignment: parity with the reference
  * crossJoin + min_by(struct(d, cid)) formulation it replaced (same
  * (d, cid) ties), the gid-restriction path, and float/double input
  * mixing — pinned on a seeded random corpus so every branch of the
  * compiled loop is exercised, not just the fixtures'.
  */
class L2ArgMinSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(17)
  private def vec(d: Int): Seq[Float] =
    Seq.fill(d)((rnd.nextDouble() * 2 - 1).toFloat)

  test("parity with min_by(struct(d, cid)) on a 200x32 random corpus") {
    val e = (0L until 200L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val cents = (0L until 32L)
      .map(c => (c, vec(16).map(_.toDouble)))
      .toDF("cid", "ce")
    val want = e.crossJoin(broadcast(cents))
      .withColumn("d", GraftFunctions.l2Sq($"embedding", $"ce"))
      .groupBy($"vec_id")
      .agg(min_by($"cid", struct($"d", $"cid")).as("cid"))
      .orderBy($"vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cb = cents.agg(array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))
    val got = e.crossJoin(broadcast(cb))
      .select($"vec_id",
        GraftFunctions.l2ArgminCid($"embedding", $"kcb", lit(null)).as("cid"))
      .orderBy($"vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("exact ties resolve to the smaller cid") {
    // Two identical centroids at different cids: (d, cid) ties by cid.
    val e = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val cents = Seq((7L, Seq(0.0, 0.0)), (3L, Seq(0.0, 0.0)))
      .toDF("cid", "ce")
    val cb = cents.agg(array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))
    val got = e.crossJoin(broadcast(cb))
      .select(GraftFunctions.l2ArgminCid($"embedding", $"kcb", lit(null)))
      .first.getLong(0)
    assert(got == 3L)
  }

  test("gid restriction scans only the allowed cells") {
    // Nearest cell overall has gid 1; with gids = [2] the argmin must
    // come from gid-2 cells only.
    val e = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cells = Seq(
      (1L, 10L, Seq(0.1, 0.0)),  // global best, gid 1
      (2L, 20L, Seq(5.0, 0.0)),
      (2L, 21L, Seq(3.0, 0.0))   // best within gid 2
    ).toDF("gid", "cid", "ce")
    val fa = cells.agg(
      array_sort(collect_list(struct($"gid", $"cid", $"ce"))).as("fa"))
    val got = e.crossJoin(broadcast(fa))
      .select(GraftFunctions.l2ArgminCid($"embedding", $"fa",
        array(lit(2L))))
      .first.getLong(0)
    assert(got == 21L)
    val unrestricted = e.crossJoin(broadcast(fa))
      .select(GraftFunctions.l2ArgminCid($"embedding", $"fa", lit(null)))
      .first.getLong(0)
    assert(unrestricted == 10L)
  }

  test("empty allowed set returns NULL, not a wrong cell") {
    val e = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cells = Seq((1L, 10L, Seq(0.1, 0.0))).toDF("gid", "cid", "ce")
    val fa = cells.agg(
      array_sort(collect_list(struct($"gid", $"cid", $"ce"))).as("fa"))
    val row = e.crossJoin(broadcast(fa))
      .select(GraftFunctions.l2ArgminCid($"embedding", $"fa",
        array().cast("array<long>")))
      .first
    assert(row.isNullAt(0))
  }

  test("double-typed vectors and float-typed centroids both work") {
    val e = Seq((1L, Seq(1.0, 1.0))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(0.9f, 1.1f)), (1L, Seq(9.0f, 9.0f)))
      .toDF("cid", "ce")
    val cb = cents.agg(array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))
    val got = e.crossJoin(broadcast(cb))
      .select(GraftFunctions.l2ArgminCid($"embedding", $"kcb", lit(null)))
      .first.getLong(0)
    assert(got == 0L)
  }
}
