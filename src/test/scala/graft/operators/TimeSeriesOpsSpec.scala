package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the time-series / skew / incremental additions:
  * gap-fill (q76), batch sessionization (q77), the skew-split join
  * (q78), and delta dedup against the persisted index (q81). Exact
  * values are pinned by the DuckDB oracle; these hold for any corpus.
  */
class TimeSeriesOpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q76: dense daily grid per user, purchase counts conserved, LOCF total") {
    val out = RelationalQueries.queries("q76_gapfill")(spark, dir).cache()
    val purchases = Tables(spark, dir).events
      .filter($"event_type" === "purchase")
    // Grid density: one row per day in the user's own [first, last] span.
    val perUser = out.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), min($"day").as("d0"), max($"day").as("d1"))
      .withColumn("span", datediff($"d1", $"d0") + 1)
    assert(perUser.filter($"n" =!= $"span").isEmpty)
    // Conservation: the grid invents no purchases and loses none.
    assert(out.agg(sum($"n_purch")).head.getLong(0) == purchases.count())
    // LOCF totality: the span starts at the first purchase day, so the
    // carried-forward value is never null anywhere in the grid.
    assert(out.filter($"filled_val".isNull).isEmpty)
    // A zero-purchase day carries the PREVIOUS day's value verbatim.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"day")
    val lagged = out.withColumn("prev_val", lag($"filled_val", 1).over(w))
    assert(lagged.filter($"n_purch" === 0 && $"filled_val" =!= $"prev_val").isEmpty)
    out.unpersist()
  }

  test("q77: sessions partition the events; consecutive sessions gap > 2h") {
    val out = RelationalQueries.queries("q77_sessionize")(spark, dir).cache()
    val events = Tables(spark, dir).events
    // Every event lands in exactly one session.
    assert(out.agg(sum($"n_events")).head.getLong(0) == events.count())
    // Session ids are contiguous 1..k per user.
    val ids = out.groupBy($"user_id")
      .agg(min($"session_id").as("lo"), max($"session_id").as("hi"),
        count(lit(1)).as("n"))
    assert(ids.filter($"lo" =!= 1 || $"hi" =!= $"n").isEmpty)
    // Bounds are ordered within a session...
    assert(out.filter($"end_sec" < $"start_sec").isEmpty)
    // ...and the NEXT session starts more than 2 h after this one ends
    // (the break definition, re-checked on the output).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_id")
    val gaps = out.withColumn("prev_end", lag($"end_sec", 1).over(w))
      .filter($"prev_end".isNotNull)
    assert(gaps.filter($"start_sec" - $"prev_end" <= 7200).isEmpty)
    out.unpersist()
  }

  test("q78: skew-split result is bit-identical to the plain join") {
    val t = Tables(spark, dir)
    val plain = t.events.select($"user_id", $"value")
      .join(t.customer.select($"c_custkey".as("user_id"), $"c_mktsegment"),
        "user_id")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("sum_value"))
      .orderBy($"c_mktsegment")
      .collect().toSeq
    val split = RelationalQueries.queries("q78_salted_join")(spark, dir)
      .collect().toSeq
    assert(split == plain)
  }

  test("q81: delta pairs come from the persisted index and agree with a direct check") {
    val out = PipelineQueries.queries("q81_delta_dedup")(spark, dir).cache()
    // Pairs are strictly delta-vs-corpus, never delta-delta or corpus-corpus.
    assert(out.filter($"new_doc" < 450 || $"corpus_doc" >= 450).isEmpty)
    // est_sim is exactly n_match/16 and the gate held.
    assert(out.filter($"n_match" < 8 || $"n_match" > 16).isEmpty)
    assert(out.filter($"est_sim" =!= $"n_match" / 16.0).isEmpty)
    // The index artifact exists on disk (the delta path's only corpus
    // input) in the banded posting layout: 4 (band, sig) rows per
    // corpus doc with shingles, each carrying the 16-int signature.
    val idxPath = PipelineQueries.deltaIndexPath(spark, dir)
    val idx = spark.read.parquet(idxPath)
    assert(idx.filter($"doc_id" >= 450).isEmpty)
    assert(idx.filter(size($"mh") =!= 16).isEmpty)
    assert(idx.groupBy($"doc_id").count().filter($"count" =!= 4).isEmpty)
    // And the catalog knows it as a BUCKETED table on the join keys —
    // the property that lets the delta probe skip the index-side
    // shuffle.
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        PipelineQueries.deltaIndexKey(spark, dir)))
    assert(cat.bucketSpec.exists(b =>
      b.bucketColumnNames == Seq("band", "sig")))
    // A reported pair's agreement recomputes identically straight from
    // the index signature vs a fresh delta-side signature (no banding) —
    // value-level agreement is the oracle's job; this pins the plumbing:
    // every reported corpus_doc actually has an index row.
    val missing = out.select($"corpus_doc")
      .join(idx.select($"doc_id".as("corpus_doc")), Seq("corpus_doc"), "left_anti")
    assert(missing.isEmpty)
    out.unpersist()
  }

  test("q78: hot keys take the broadcast path, the tail the shuffled path") {
    // Drop the auto-broadcast threshold so only the EXPLICIT broadcast
    // hint survives — the cold path must then plan a shuffled join.
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = RelationalQueries.queries("q78_salted_join")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
