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
    "q133_stream_chunk_dedup", "q139_stream_heavy_hitters")

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
    // The capture must replay gen_plans' FRESH-SESSION protocol, which
    // means resetting two kinds of shared state other suites leave
    // behind (VERDICT r9 #1 — the full-suite q51 phantom drift):
    //
    //  1. Cached frames (one CacheManager per context): an overlapping
    //     cache turns a pinned Exchange into an InMemoryTableScan read.
    //     `clearCache()` handles these.
    //  2. The graft artifact memos. q51's drift was exactly this path:
    //     `dedupLabelsArtifact`'s BUILD path unpersists the shared
    //     docSidArrays cache when q46 is constructed mid-loop, but the
    //     memo-HIT path (an earlier suite already built the artifact)
    //     skips that unpersist — so the entry MATERIALIZED by q22b's
    //     construction-time strategy probe survives to q51's capture,
    //     whose accurate (tiny) stats flip the sizes⟕overlap join to
    //     broadcast: 3 shuffles fresh vs the pinned 4. Clearing the
    //     memos makes the loop rebuild artifacts exactly as gen_plans'
    //     fresh shell does, so capture order and cache states match the
    //     generator's byte for byte.
    graft.operators.PipelineQueries.cleanupArtifacts(spark)
    spark.catalog.clearCache()
    val captured = for {
      name <- graft.SparkEntry.queries.keys.toSeq.sorted
      if !streamingQs(name) && !sfSensitive.contains(name)
      pinned <- table.get(name)
    } yield {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      (name, pinned, PlanAudit.counts(plan), plan)
    }
    val driftedFull = captured.filter { case (_, pinned, fresh, _) =>
      fresh.shuffles != pinned.shuffles ||
        fresh.broadcasts != pinned.broadcasts
    }
    val drifted = driftedFull.map { case (name, pinned, fresh, _) =>
      s"$name: PLANS.md (shuffles=${pinned.shuffles}, " +
        s"broadcasts=${pinned.broadcasts}) vs fresh (${fresh.shuffles}, " +
        s"${fresh.broadcasts})"
    }
    // On drift, dump the first drifted query's fresh plan — the r9
    // diagnosis needed exactly this text and had to rebuild it by hand.
    val planDump = driftedFull.headOption
      .map { case (name, _, _, plan) => s"\nFresh plan of $name:\n$plan" }
      .getOrElse("")
    assert(drifted.isEmpty,
      "PLANS.md shuffle/broadcast counts drifted from the live plans — " +
        "regen via .claude/skills/verify/SKILL.md §3 (or, if the " +
        "divergence is scale-factor-dependent, document it in " +
        s"sfSensitive):\n${drifted.mkString("\n")}$planDump")
  }
}
