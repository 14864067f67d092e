package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Native as-of join operator: semantics the sf data doesn't exercise
  * (unmatched rows, ties, null keys, empty sides), planner integration
  * (strategy + EnsureRequirements exchanges/sorts), and equivalence to
  * the union+window composition q35 uses.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private def l(rows: (Long, Long, String)*) =
    rows.toDF("k", "t", "tag")
  private def r(rows: (Long, Long, String)*) =
    rows.toDF("rk", "rt", "payload")

  test("latest at-or-before semantics, unmatched left gets nulls") {
    val left = l((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
    val right = r((1L, 10L, "p10"), (1L, 15L, "p15"), (1L, 25L, "p25"),
      (2L, 6L, "late"))
    val out = AsOf.asofJoin(left, right, "k", "t", "rk", "rt")
      .select($"k", $"t", $"payload").orderBy($"k", $"t")
      .collect().map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) null else row.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 10L, "p10"),  // tie: rt == t matches (at-or-before)
      (1L, 20L, "p15"),  // latest <= 20
      (2L, 5L, null),    // right row exists but is later
      (3L, 9L, null)))   // key absent on right
  }

  test("null keys and times never match or participate") {
    val left = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val right = Seq((Some(1L), Some(5L), "p"),
      (None.asInstanceOf[Option[Long]], Some(1L), "nullk"),
      (Some(1L), None.asInstanceOf[Option[Long]], "nullt"))
      .toDF("rk", "rt", "payload")
    val out = AsOf.asofJoin(left, right, "k", "t", "rk", "rt")
      .select($"k", $"t", $"payload").collect()
    val matched = out.filter(!_.isNullAt(2)).map(_.getString(2)).toSeq
    assert(matched == Seq("p"))
    assert(out.count(_.isNullAt(2)) == 2)
  }

  test("empty right side leaves every left row unmatched") {
    val left = l((1L, 10L, "a"), (2L, 20L, "b"))
    val right = r().limit(0)
    val out = AsOf.asofJoin(left, right, "k", "t", "rk", "rt")
    assert(out.count() == 2 && out.filter($"payload".isNotNull).isEmpty)
  }

  test("plan contains the custom exec with exchanges and sorts under it") {
    val left = l((1L, 10L, "a"))
    val right = r((1L, 5L, "p"))
    val plan = AsOf.asofJoin(left, right, "k", "t", "rk", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // exec nodeName strips "Exec"
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert("Sort ".r.findAllIn(plan).size >= 2, plan)
  }

  test("matches the union+window composition on random many-partition data") {
    val rnd = new scala.util.Random(43)
    val left = (0 until 4000).map(i =>
      (rnd.nextLong(50), rnd.nextLong(1000), i.toLong)).toDF("k", "t", "lid")
      .repartition(7)
    // One right row per (key, time) so the match is deterministic.
    val right = (0 until 2000).map(i =>
      (rnd.nextLong(60), rnd.nextLong(1000)))
      .distinct.map { case (k, t) => (k, t, k * 100000 + t) }
      .toDF("rk", "rt", "rid").repartition(5)

    val native = AsOf.asofJoin(left, right, "k", "t", "rk", "rt")
      .select($"lid", $"rid")

    val oside = right.select($"rk".as("k"), $"rt".as("t"),
      lit(0).as("tag"), $"rid", lit(null).cast("long").as("lid"))
    val eside = left.select($"k", $"t", lit(1).as("tag"),
      lit(null).cast("long").as("rid"), $"lid")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"k")
      .orderBy($"t", $"tag")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val viaWindow = oside.union(eside)
      .withColumn("m", last($"rid", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"lid", $"m".as("rid"))

    assert(native.except(viaWindow).isEmpty && viaWindow.except(native).isEmpty)
  }
}
