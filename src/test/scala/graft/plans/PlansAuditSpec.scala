package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** PLANS.md staleness guard (VERDICT r8 #5): the audit table is
  * regenerated manually by `tools/gen_plans.scala`, so without a check
  * a drifted table would silently misreport plan shapes. Two pins:
  *
  *  1. the table's row set equals the live query registry — a query
  *     added or renamed without a PLANS regen fails here;
  *  2. every batch row's pinned shuffle/broadcast counts equal a fresh
  *     capture (same `PlanAudit` metric the generator uses) — a plan
  *     reshaped without a PLANS regen fails here.
  *
  * The fresh capture runs at sf0.001 against the sf0.01-pinned table:
  * the doc/embedding tables are identical at both factors and the
  * TPC-H tables are far below every size threshold at both, so plan
  * STRUCTURE matches — any query whose shape legitimately depends on
  * the scale factor must be listed in `sfSensitive` with the reason.
  * Streaming rows are covered by pin 1 and by PlanShapeSpec's
  * per-query streaming pins (their executed plans only exist
  * post-run; re-running all 8 jobs here would double-audit them).
  */
class PlansAuditSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark

  private val dir = "/root/testdata/sf0.001"

  private val streamingQs = Set("q31_stream_window", "q50_stream_dedup",
    "q59_stream_decontaminate", "q62_stream_stream_join",
    "q63_state_profile", "q65_sliding_window", "q75_stream_quality",
    "q133_stream_chunk_dedup")

  // Queries whose audited shape differs between sf0.001 and sf0.01,
  // with the reason. Keep EMPTY unless a mismatch is understood and
  // written down — an entry here is exempt from pin 2, not from pin 1.
  private val sfSensitive: Map[String, String] = Map.empty

  private lazy val table: Map[String, PlanAudit.Counts] =
    PlanAudit.parsePlansMd(java.nio.file.Files.readString(
      java.nio.file.Paths.get("PLANS.md")))

  test("PLANS.md rows equal the registered query set") {
    val registry = graft.SparkEntry.queries.keySet
    val missing = registry -- table.keySet
    val extra = table.keySet -- registry
    assert(missing.isEmpty && extra.isEmpty,
      s"PLANS.md is stale — missing rows: ${missing.toSeq.sorted}; " +
        s"rows for unregistered queries: ${extra.toSeq.sorted}. " +
        "Regen: .claude/skills/verify/SKILL.md §3.")
  }

  test("no PLANS.md row is an error row") {
    val errors = table.collect { case (n, c) if c.shuffles < 0 => n }
    assert(errors.isEmpty,
      s"PLANS.md has error rows (query failed during the last regen): " +
        s"${errors.toSeq.sorted}")
  }

  test("pinned shuffle/broadcast counts match a fresh capture") {
    // Other suites' cached frames overlap these queries' lineages
    // (one shared CacheManager per context), turning a pinned Exchange
    // into an InMemoryTableScan read and failing the compare with a
    // phantom drift (seen: q93 5→4 shuffles under the full suite,
    // clean standalone). Capture from a cache-clean state, like the
    // fresh spark-shell gen_plans runs in; caches other suites still
    // need re-materialize on demand.
    spark.catalog.clearCache()
    val drifted = for {
      name <- graft.SparkEntry.queries.keys.toSeq.sorted
      if !streamingQs(name) && !sfSensitive.contains(name)
      pinned <- table.get(name)
      fresh = PlanAudit.counts(
        graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString)
      if fresh.shuffles != pinned.shuffles ||
        fresh.broadcasts != pinned.broadcasts
    } yield s"$name: PLANS.md (shuffles=${pinned.shuffles}, " +
      s"broadcasts=${pinned.broadcasts}) vs fresh (${fresh.shuffles}, " +
      s"${fresh.broadcasts})"
    assert(drifted.isEmpty,
      "PLANS.md shuffle/broadcast counts drifted from the live plans — " +
        "regen via .claude/skills/verify/SKILL.md §3 (or, if the " +
        "divergence is scale-factor-dependent, document it in " +
        s"sfSensitive):\n${drifted.mkString("\n")}")
  }
}
