package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** Physical-plan regression pins: correctness tests can't catch a
  * query silently degrading into a scale-killer shape (a cartesian, an
  * unpushed filter, an extra corpus shuffle), so the load-bearing plan
  * properties are pinned here. The audit table in PLANS.md is the
  * human-readable sweep; these are the subset that must never drift.
  */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark

  private val dir = "/root/testdata/sf0.001"

  private val streamingQs = Set("q31_stream_window", "q50_stream_dedup",
    "q59_stream_decontaminate", "q62_stream_stream_join",
    "q63_state_profile", "q65_sliding_window", "q75_stream_quality",
    "q133_stream_chunk_dedup", "q139_stream_heavy_hitters")

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  // Walk through the AQE wrapper (executedPlan is a childless
  // AdaptiveSparkPlanExec until execution) and into cached subtrees
  // (InMemoryTableScan hides its build plan from toString/collect).
  private def planNodes(name: String)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val root = p match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case x => x
      }
      val direct = root.collectWithSubqueries { case n => n }
      direct ++ direct.flatMap {
        case s: InMemoryTableScanExec => nodes(s.relation.cachedPlan)
        case a: AdaptiveSparkPlanExec => nodes(a.inputPlan)
        case _ => Nil
      }
    }
    nodes(graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan)
  }

  /** Condition strings of every equality-join node in the plan, for
    * pins that must anchor to a JOIN CONDITION rather than the whole
    * plan text (ADVICE r8: a raw substring over the full plan can stay
    * green on an unrelated expression after the pinned predicate is
    * deleted).
    */
  private def joinConditions(name: String): Seq[String] = {
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    planNodes(name).collect {
      case j: BroadcastHashJoinExec => j.condition
      case j: ShuffledHashJoinExec => j.condition
      case j: SortMergeJoinExec => j.condition
    }.flatten.map(_.toString)
  }

  test("no batch query plans a CartesianProduct") {
    // The dedup/ANN family's design contract: every pairwise comparison
    // rides an equality join on derived keys or a broadcast-tiny build;
    // an all-pairs product sneaking in would pass correctness at test
    // scale and melt at corpus scale.
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted
         if !streamingQs(name)) {
      assert(!plan(name).contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filtered_revenue")
    assert(p.contains("PushedFilters: [Is") || p.contains("PushedFilters: [Gr") ||
      p.contains("PushedFilters: [*"), s"no pushed filters in:\n$p")
    // The scan reads only the columns the query needs, not the full
    // 16-column lineitem schema.
    assert(!p.contains("l_comment"), "projection pruning lost: scan reads l_comment")
  }

  test("q21: exact dedup is one hash shuffle plus the output sort") {
    val p = plan("q21_dedup_exact")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    assert(shuffles <= 2, s"q21 grew to $shuffles shuffles:\n$p")
  }

  test("q51: the benchmark sid set joins by broadcast, never SMJ") {
    val p = plan("q51_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"bench-sid join degraded to a sort-merge join:\n$p")
  }

  test("q47: sampling stays map-only (no extra corpus shuffle)") {
    val p = plan("q47_stratified_sample")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    // One range exchange for the output ordering; the sample decision
    // itself must not shuffle.
    assert(shuffles <= 1, s"q47 grew to $shuffles shuffles:\n$p")
  }

  test("q68: assignment is two-level and IN-ROW — no per-pair exploration") {
    val p = plan("q68_semantic_dedup")
    // Since round 18 all three routing levels run through the
    // cosine-mode L2ArgMinCid kernel: one compiled scan per row over a
    // one-row collected array (fine candidates restricted to the row's
    // coarse cell via the gid filter). The pre-round-6 hazard this pin
    // guarded — a nested-loop EXPLORING n×K (row, centroid) pairs —
    // and the round-7..17 equality-join shape — n×(K/C) rows buffered
    // through a max_by sort-aggregate — must both stay gone: the plan
    // carries the kernel calls and NO per-vector cosine column (the
    // old chains' ccos/gcos stages materialized one row per pair).
    assert("cos_argmax_cid".r.findAllIn(p).size >= 3,
      s"q68 lost its three in-row routing scans:\n$p")
    assert(!p.contains("AS ccos") && !p.contains("AS gcos"),
      s"q68 re-grew a per-(row, centroid) scored-pair stage:\n$p")
  }

  test("q81: the delta probe reads the bucketed index with zero index-side Exchange") {
    val p = plan("q81_delta_dedup")
    // The index must come in through the bucketed-table read path...
    assert(p.contains("Bucketed: true") && p.contains("SelectedBucketsCount"),
      s"q81 index scan is not bucketed:\n$p")
    // ...and the branch between the candidate join and the index scan
    // must contain no Exchange: bucket layout IS the join partitioning.
    val lines = p.linesIterator.toVector
    val scanIdx = lines.indexWhere(_.contains("graft_mh_index"))
    assert(scanIdx >= 0, s"q81 lost the index-table scan:\n$p")
    val joinIdx = lines.lastIndexWhere(_.contains("HashJoin"), scanIdx)
    assert(joinIdx >= 0, s"q81 lost the candidate join:\n$p")
    // An index-side Exchange would be an ANCESTOR of the index scan
    // strictly below the join. Walk the ancestor chain by tree indent
    // (each parent's node marker sits left of its child's) and assert
    // none of those nodes is an Exchange.
    def indent(l: String): Int = {
      val i = l.indexOf("+-"); val j = l.indexOf(":-")
      if (i < 0 && j < 0) Int.MaxValue else if (i < 0) j else if (j < 0) i
      else math.min(i, j)
    }
    var cur = indent(lines(scanIdx))
    for (k <- (joinIdx + 1 until scanIdx).reverse if indent(lines(k)) < cur) {
      assert(!lines(k).contains("Exchange"),
        s"q81 index side re-shuffles despite bucketing: ${lines(k).trim}\n$p")
      cur = indent(lines(k))
    }
  }

  test("streaming executed plans carry the right state operators") {
    // Streaming plans exist only post-execution (IncrementalExecution);
    // each query records q.explain() on termination. Running the query
    // populates the capture; the pins are the state-shape claims
    // PLANS.md used to make in prose (VERDICT r5 #3).
    def run(name: String): String = {
      graft.SparkEntry.queries(name)(spark, dir).collect()
      val p = graft.streaming.StreamingQueries.executedPlans.get(name)
      assert(p.isDefined, s"$name captured no executed plan")
      p.get
    }
    // Stateful aggregation: windows flow into the state store.
    assert(run("q31_stream_window").contains("StateStoreSave"))
    assert(run("q65_sliding_window").contains("StateStoreSave"))
    // Keyed dedup state.
    assert(run("q50_stream_dedup").contains("StreamingDeduplicate"))
    // Chunk-store dedup: map-side CDC chunking, then ONLY the 8-byte
    // signatures reach the dedup state operator — no aggregation
    // state, no text past the scan.
    assert(run("q133_stream_chunk_dedup").contains("StreamingDeduplicate"))
    // The two ingest gates are STATELESS map-only pipelines: no state
    // operator, no Exchange anywhere in the micro-batch plan.
    for (name <- Seq("q59_stream_decontaminate", "q75_stream_quality")) {
      val p = run(name)
      assert(!p.contains("StateStore") && !p.contains("Exchange"),
        s"$name is no longer a zero-state zero-shuffle gate:\n$p")
    }
    // Sketch-at-ingest: the Misra–Gries summary IS the aggregation
    // state — one O(k) buffer through the state store, so the plan
    // must carry StateStoreSave (and the object-buffer aggregate).
    val hh = run("q139_stream_heavy_hitters")
    assert(hh.contains("StateStoreSave"),
      s"q139 lost its sketch aggregation state:\n$hh")
    // Stream-stream join: symmetric hash join with per-side state.
    assert(run("q62_stream_stream_join")
      .contains("StreamingSymmetricHashJoin"))
    // Custom state: flatMapGroupsWithState.
    assert(run("q63_state_profile").contains("FlatMapGroupsWithState"))
  }

  test("q84: postings prune via broadcast before any shuffle; top-k never global-sorts") {
    val p = plan("q84_bm25_topk")
    // The query-term set must reach the posting stream as a broadcast
    // hash join (map-side pruning), never a shuffled join of the
    // exploded corpus against the term table.
    assert(p.contains("BroadcastHashJoin"), s"no broadcast term pruning in:\n$p")
    // Top-20 is TakeOrderedAndProject — no global Sort of all scored docs.
    assert(p.contains("TakeOrderedAndProject"), s"q84 lost the top-k operator:\n$p")
  }

  test("BPE training (artifact build) rides 1-row broadcasts over the cached word table") {
    // The merge chain now runs inside the persisted-artifact build
    // (bpeArtifact, shared by q86+q92), so the TRAINING shape is pinned
    // on the same chain the build executes, not on the registered query
    // (which only reads the artifact — see the next pin).
    val words = PipelineQueries.bpeWords(Tables(spark, dir).documents).cache()
    try {
      val (t1, _, _, w4) = PipelineQueries.bpeMergeChain(words)
      val p = w4.queryExecution.executedPlan.toString
      // Each merge iteration is crossJoin(broadcast(top-1 row)) — never
      // a shuffled join; the word table is computed once and cached.
      assert(p.contains("BroadcastNestedLoopJoin"), s"merge lost its broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"BPE training grew a shuffled join:\n$p")
      assert(p.contains("InMemoryTableScan"), s"word table no longer cached:\n$p")
      // argmax pair is TakeOrdered, never a global sort of the pair table.
      val pt = t1.queryExecution.executedPlan.toString
      assert(pt.contains("TakeOrderedAndProject"), s"top-pair lost TakeOrdered:\n$pt")
    } finally { words.unpersist(); () }
  }

  test("q86: the registered query reads the persisted artifact, join-free") {
    val p = plan("q86_bpe_train")
    assert(!p.contains("Join"), s"q86 should only read the artifact:\n$p")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    // 3-row artifact scan + the output sort, nothing else.
    assert(shuffles <= 1, s"q86 artifact read grew to $shuffles shuffles:\n$p")
  }

  test("q87: quantization is map-only after one 64-group stats pass") {
    val p = plan("q87_embed_quantize")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    // posexplode stats agg + 1-row array assembly + output range sort.
    assert(shuffles <= 3, s"q87 grew to $shuffles shuffles:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"per-dim stats no longer broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q87 grew a shuffled join:\n$p")
  }

  test("q88: the per-source cap joins by broadcast, never SMJ") {
    val p = plan("q88_source_cap")
    assert(p.contains("BroadcastHashJoin"), s"cap join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"cap join degraded to SMJ:\n$p")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    // source-cap agg + the rank window partitioning + output range sort.
    assert(shuffles <= 3, s"q88 grew to $shuffles shuffles:\n$p")
  }

  test("q89: the registered query aggregates the persisted span artifact") {
    val p = plan("q89_dup_spans")
    // The shingle-df shuffle + dup-sid join + interval-union windows all
    // live in the spanArtifact build (shared with q100); the registered
    // query is one parquet scan of (doc_id, s, e), a per-doc aggregate,
    // and the left join onto token counts — equality shapes only.
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q89 grew a BNLJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"q89 grew a cartesian:\n$p")
    assert(!p.contains("Window"),
      s"q89 should read spans, not recompute the sweep:\n$p")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    assert(shuffles <= 5, s"q89 grew to $shuffles shuffles:\n$p")
  }

  test("q90: novelty is two sid shuffles plus the per-doc ratio") {
    val p = plan("q90_novelty_score")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    assert(shuffles <= 6, s"q90 grew to $shuffles shuffles:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q90 join degraded:\n$p")
  }

  test("q91: keep list is one label join + one group window") {
    val p = plan("q91_keep_list")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q91 join degraded:\n$p")
    assert(p.contains("Window"), s"retention rank window missing:\n$p")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    // label join + group window partitioning + output range sort; the
    // artifact scan side arrives pre-materialized (one parquet read).
    assert(shuffles <= 4, s"q91 grew to $shuffles shuffles:\n$p")
  }

  test("q92: occurrence join is equality over the artifact vocabulary") {
    val p = plan("q92_bpe_encode")
    // Training happens in the shared artifact build (pinned above); the
    // registered query is the ENCODE side only: corpus occurrences
    // equality-join the vocabulary-sized artifact scan, then a
    // per-source aggregate. No cartesian, no cross shape, no retrain.
    assert(!p.contains("CartesianProduct"), s"q92 grew a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q92 should be an equality join, found a BNLJ (retrain leak?):\n$p")
    // Distinct-normalized count (cached subtrees reprint per use site —
    // same rule as tools/gen_plans): vocab join + source agg + output
    // sort, never a corpus-side re-shuffle per merge stage.
    val shuffles = p.linesIterator
      .map(_.replaceAll("^[\\s:+*-]+", "").replaceAll("#\\d+L?", "#x")
        .replaceAll("plan_id=\\d+", "plan_id=x"))
      .filter(l => l.startsWith("Exchange") && !l.contains("SinglePartition"))
      .toSet.size
    assert(shuffles <= 4, s"q92 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q93: the LM join is equality on sid; threshold rides a 1-row broadcast") {
    val p = plan("q93_perplexity_filter")
    assert(!p.contains("CartesianProduct"), s"q93 grew a cartesian:\n$p")
    // The bigram-LM probabilities join back by equality on the bigram
    // sid; only the 1-row corpus-mean threshold may ride a BNLJ. A BNLJ
    // whose build side is a corpus-derived relation would be the
    // all-pairs failure shape.
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"q93 lost its equality LM join:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 6, s"q93 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q94: resampling is map-only after the #sources aggregate") {
    val p = plan("q94_importance_resample")
    assert(!p.contains("CartesianProduct"), s"q94 grew a cartesian:\n$p")
    // No window: the keep decision is u < p with p broadcast per
    // source. A Window node here means the rank-threshold form leaked
    // back into the default path.
    assert(!p.contains("Window"), s"q94 grew a window (rank form leaked):\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 4, s"q94 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q95: purity is bounded counting over the shared assignment") {
    val p = plan("q95_cluster_purity")
    assert(!p.contains("CartesianProduct"), s"q95 grew a cartesian:\n$p")
    // The label join on vec_id must stay an equality join; the only
    // BNLJ allowed is the broadcast-tiny centroid table inside the
    // shared k-means assignment.
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"q95 lost its equality label join:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 7, s"q95 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q96: both split boundaries ride ONE per-source window partition") {
    val p = plan("q96_train_split")
    // rn and n must share the same window frame's exchange — a second
    // Window partitioning would mean the count leaked into its own
    // shuffle.
    assert(p.contains("Window"), s"q96 lost its window:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 2, s"q96 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q97: overlap counting never self-joins the shingle relation") {
    val p = plan("q97_source_overlap")
    // Pair generation is map-side from per-sid source lists; the only
    // joins are the two broadcast-tiny size lookups.
    assert(!p.contains("SortMergeJoin"),
      s"q97 grew a sort-merge join (shingle self-join shape leaked):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q97 lost its size joins:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 6, s"q97 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q98: all three metrics come off one (source, token) count") {
    val p = plan("q98_source_lexical")
    assert(p.contains("Window"), s"q98 lost its top-10 window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q98's profile join degraded to sort-merge:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 6, s"q98 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q99: distances ride equality/broadcast joins only") {
    val p = plan("q99_label_cohesion")
    // Member→centroid distances join by label equality (broadcast-tiny
    // centroid build); the only BNLJ allowed is the #labels² centroid
    // cross — never a corpus-sized build.
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 8, s"q99 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q100: the rewrite is map-only after the span join") {
    val p = plan("q100_span_excise")
    // Spans join back by doc_id equality (left join — corpus-sized
    // probe, never broadcast of the corpus); no window or shuffle may
    // appear downstream of it beyond the output sort.
    assert(!p.contains("CartesianProduct"), s"q100 grew a cartesian:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 6, s"q100 grew to $shuffles distinct shuffles:\n$p")
  }

  // Distinct-normalized data-shuffle count (cached subtrees reprint per
  // use site — same normalization as tools/gen_plans).
  private def distinctShuffles(p: String): Int = p.linesIterator
    .map(_.replaceAll("^[\\s:+*-]+", "").replaceAll("#\\d+L?", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x"))
    .filter(l => l.startsWith("Exchange") && !l.contains("SinglePartition"))
    .toSet.size

  test("q73: the classifier is map-only ahead of the output sort") {
    val p = plan("q73_quality_classifier")
    val shuffles = "Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size
    // repartition(doc_id) + the orderBy range exchange, nothing else.
    assert(shuffles <= 2, s"q73 grew to $shuffles shuffles:\n$p")
    assert(p.contains("bucket_dot"), "native kernel missing from the plan")
  }

  test("q101: weights read the label artifact — no minhash recompute") {
    val p = plan("q101_soft_dedup_weight")
    assert(!p.contains("minhash_sigs"),
      s"q101 must read the persisted labels, not re-sign the corpus:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q101 join degraded:\n$p")
    val shuffles = distinctShuffles(p)
    // label join + group-size agg + size join + output range sort.
    assert(shuffles <= 5, s"q101 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q102: negatives shuffle O(anchors×k) partials, labels by broadcast") {
    val p = plan("q102_hard_negatives")
    // The scoring pass is the q25b shape: partial TopKAgg above a
    // BNLJ against the broadcast-tiny anchor build; the label ride-back
    // must stay a broadcast join, never SMJ.
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"partial top-k aggregate missing:\n$p")
    assert(!p.contains("SortMergeJoin"), s"label join degraded to SMJ:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 3, s"q102 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q103: pair stream is map-side generated — no self-join of postings") {
    val p = plan("q103_shingle_cosine")
    // One sid-keyed aggregate builds bounded doc lists; pairs explode
    // map-side from each list. A SortMergeJoin would mean the postings
    // self-join crept back in.
    assert(!p.contains("SortMergeJoin"), s"postings self-join returned:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q103 join degraded:\n$p")
    val shuffles = distinctShuffles(p)
    // doc repartition + (doc,sid) tf agg + per-doc list agg + sid
    // posting agg + pair-count agg + output range sort.
    assert(shuffles <= 6, s"q103 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q104: only digests shuffle — chunk text stays map-side") {
    val p = plan("q104_chunk_dedup")
    assert(p.contains("chunk_tokens"), "native chunker missing from plan")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q104 join degraded:\n$p")
    val shuffles = distinctShuffles(p)
    // doc repartition + digest agg + digest join + per-doc agg + sort.
    assert(shuffles <= 5, s"q104 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q105: band edges broadcast; first-seen is one word-keyed agg") {
    val p = plan("q105_vocab_growth")
    // The only BNLJ build is the 1-row min/max bounds; the band joins
    // are equality on the 10-value decile key. A Window is fine ONLY
    // because its input is 10 rows by construction.
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"q105 lost its decile equality joins:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 6, s"q105 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q106: ranking happens after a top-k cut, never over the vocabulary") {
    val p = plan("q106_zipf_slope")
    // The freq table must be cut by TakeOrderedAndProject BEFORE the
    // row_number window — a Window whose input is the full vocabulary
    // is the 100 TB funnel this query is designed to avoid.
    assert(p.contains("TakeOrderedAndProject"),
      s"q106 lost its top-100 cut:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 4, s"q106 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q107: the gate is doc-keyed aggs plus a 1-row threshold broadcast") {
    val p = plan("q107_token_entropy")
    assert(!p.contains("Window"), s"q107 grew a window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q107's threshold join degraded to SMJ:\n$p")
    val shuffles = distinctShuffles(p)
    // doc repartition + (doc,word) agg + per-doc agg + output sort.
    assert(shuffles <= 4, s"q107 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q108: stages join by user_id equality; no stream-wide window") {
    val p = plan("q108_event_funnel")
    // Strict-after stages are per-user min-aggs joined on user_id; the
    // only window runs over the 4-row summary. An event-stream window
    // (partitioned or global) would serialize the corpus.
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"q108 lost its user_id equality joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"q108 grew a cartesian:\n$p")
  }

  test("q109: two 1-row percentile broadcasts then a map-only flag") {
    val p = plan("q109_mad_outlier")
    assert(!p.contains("Window"), s"q109 grew a window:\n$p")
    val shuffles = distinctShuffles(p)
    // Each percentile is a partial+final agg; the flag pass adds only
    // the output range sort.
    assert(shuffles <= 2, s"q109 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q110: transitions are one user-keyed window + broadcast normalize") {
    val p = plan("q110_type_transitions")
    assert(p.contains("Window"), s"q110 lost its per-user lag window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q110's |types|^2 normalizing join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q110 normalizing join degraded to SMJ:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 4, s"q110 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q111: cohorts are key-equality aggs; the size join broadcasts") {
    val p = plan("q111_cohort_retention")
    // Every step is a user- or cohort-keyed aggregate — a window over
    // the event stream (or per-cohort row_numbers) would serialize it.
    assert(!p.contains("Window"), s"q111 grew a window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q111's #weeks-sized cohort-size join must broadcast:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 5, s"q111 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q112: CDF windows partition by source over the value-domain grid") {
    val p = plan("q112_ks_distance")
    assert(p.contains("Window"), s"q112 lost its CDF windows:\n$p")
    // The grid cross product is #sources × |grid| — both builds tiny
    // relative to the corpus; the corpus itself only ever feeds
    // map-side-combining counts.
    assert(!p.contains("CartesianProduct"), s"q112 grew a cartesian:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 8, s"q112 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q113: phrase match prunes via broadcast; top-10 is TakeOrdered") {
    val p = plan("q113_phrase_search")
    assert(p.contains("TakeOrderedAndProject"),
      s"q113's top-10 cut must be TakeOrderedAndProject:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q113's 1-row phrase must broadcast into the bigram stream:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q113's phrase prune degraded to SMJ:\n$p")
  }

  test("q114: fertility is map-only into one lang-keyed agg") {
    val p = plan("q114_tokenizer_fertility")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"q114 must stay a pure map + aggregate:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 2, s"q114 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q115: coverage joins on sid equality; no window, no cartesian") {
    val p = plan("q115_ngram_coverage")
    assert(!p.contains("Window"), s"q115 grew a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"q115 grew a cartesian:\n$p")
    assert(p.contains("Join"), s"q115 lost its sid-equality join:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 7, s"q115 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q116: rank sweeps are src-keyed joins + dst-keyed folds") {
    val p = plan("q116_pagerank")
    // The message-passing contract: ranks reach edges by src-equality
    // join, per-node sums are dst-keyed aggregates. N and the teleport
    // term ride 1-row BNL broadcasts; nothing node-count-sized may
    // broadcast, and no window may appear.
    assert(!p.contains("Window"), s"q116 grew a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"q116 grew a cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q116's 1-row N broadcast disappeared:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 12, s"q116 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q117: repetition stats are doc-keyed; thresholds ride a 1-row BNL") {
    val p = plan("q117_gopher_repetition")
    // The one Window is the doc-partitioned top-word row_number —
    // partitions are doc-vocabulary-sized, never corpus-sized. The
    // threshold mean is a plain reduce (scaled-integer sum), NOT an
    // ordered corpus-wide fold, so no corpus-sized collect_list may
    // appear in the agg.
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q117's 1-row thresholds must ride a BNL broadcast:\n$p")
    assert(!p.contains("collect_list"),
      s"q117's threshold mean regressed to an ordered fold:\n$p")
    assert(!p.contains("CartesianProduct"), s"q117 grew a cartesian:\n$p")
  }

  test("q118: bag dedup is two 8-byte-key shuffles, no window") {
    val p = plan("q118_bag_dedup")
    assert(!p.contains("Window"), s"q118 grew a window:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 3, s"q118 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q119: stoplist is TakeOrdered into a broadcast; no SMJ") {
    val p = plan("q119_stopword_ratio")
    assert(p.contains("TakeOrderedAndProject"),
      s"q119's top-20 stoplist must be TakeOrderedAndProject:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q119's stoplist tag must be a broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q119's stoplist join degraded to SMJ:\n$p")
    assert(!p.contains("Window"), s"q119 grew a window:\n$p")
  }

  test("q120: binning is map-side against a broadcast threshold array") {
    val p = plan("q120_curriculum_bins")
    // The only Window runs over the bounded length VALUE domain (q112's
    // argument); each doc bins map-side against the 9-value broadcast
    // array — no per-doc rank, no corpus-sized window, no cartesian.
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q120's 1-row threshold array must ride a BNL broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"q120 grew a cartesian:\n$p")
    val windows = "Window".r.findAllIn(p).size
    assert(windows <= 2,
      s"q120 grew $windows Window operators (expected the one value-domain cum):\n$p")
  }

  test("q121: candidates join on sid equality; verify joins are hash joins") {
    val p = plan("q121_prefix_filter_join")
    // The prefix self-join and both verify joins are equality joins;
    // an all-pairs product would pass correctness here and melt at
    // corpus scale — exactly what the prefix filter exists to avoid.
    assert(!p.contains("CartesianProduct"), s"q121 grew a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q121 grew a nested-loop join:\n$p")
    assert(p.contains("HashAggregate"), s"q121 lost its candidate dedup:\n$p")
    // The PPJoin prunes live in the candidate join's CONDITION, so
    // deleting them changes no result — only this pin (and the perf
    // cliff) would notice. Anchor to the join-node conditions
    // themselves (ADVICE r8), not the whole plan text: ONE join must
    // carry BOTH the positional filter ((least(pa,pb) +
    // least(na-pa, nb-pb)) * 3 >= na+nb — two least() calls feeding a
    // *3 comparison) and the length filter (n <= m*2, both directions).
    val conds = joinConditions("q121_prefix_filter_join")
    val positional = "least\\(.*least\\(.*\\* 3\\) >=".r
    val length = "<= \\([^()]* \\* 2\\)".r
    assert(conds.exists(c => positional.findFirstIn(c).isDefined &&
        length.findFirstIn(c).isDefined),
      s"no join condition carries both PPJoin prunes; conditions were:\n" +
        conds.mkString("\n---\n"))
  }

  test("q123: fidelity joins pairs to sigs by doc equality; no cartesian") {
    val p = plan("q123_minhash_fidelity")
    // The pair set comes from the prefix filter (q121's machinery),
    // signatures ride the native map-only kernel; the only acceptable
    // non-equality join is the 1-row mean-err broadcast.
    assert(!p.contains("CartesianProduct"), s"q123 grew a cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q123's 1-row mean-err must ride a BNL broadcast:\n$p")
  }

  test("q124: shard balance is one 8-group agg + a 1-row total broadcast") {
    val p = plan("q124_shard_balance")
    assert(!p.contains("Window"), s"q124 grew a window:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q124's 1-row total must ride a BNL broadcast:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 3, s"q124 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q125: winnow screen rides the map-side pair machinery") {
    val p = plan("q125_winnow_neardup")
    // Since round 11 the pair stream is the shared winnow-pairs
    // artifact (one parquet read + threshold); the machinery itself is
    // pinned through the BUILD plan in the test below.
    assert(!p.contains("CartesianProduct"), s"q125 grew a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q125 grew a nested-loop join:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 4, s"q125 grew to $shuffles distinct shuffles:\n$p")
  }

  test("pair-artifact builds: map-side pair generation, no posting self-join") {
    // q23/q71 (rare-shingle) and q125/q127 (winnow) read persisted pair
    // artifacts, so THEIR plans no longer show the machinery — this
    // pins the literal build-side frames instead: one sid-keyed
    // aggregate into bounded doc lists, pairs exploded map-side from
    // each list, one pair-count aggregate. A SortMergeJoin or cartesian
    // here would mean the postings self-join crept back into the build.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    for (arrs <- Seq(PipelineQueries.docSidArrays(docs),
        PipelineQueries.winnowSidArrays(docs))) {
      val build = PipelineQueries.rareSharedSidPairs(arrs, 50)
      val p = build.queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin"),
        s"pair build grew a postings self-join:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"pair build join degraded:\n$p")
      val shuffles = distinctShuffles(p)
      // doc repartition + sid posting agg + pair-count agg.
      assert(shuffles <= 3, s"pair build grew to $shuffles shuffles:\n$p")
    }
  }

  test("q126: aHash is the mapPartitions codec shape, no join, no window") {
    val p = plan("q126_image_ahash")
    // The codec stages ride mapPartitions after a 12-byte/doc
    // repartition; no relational operator may sneak between decode and
    // output.
    assert(!p.contains("Join") && !p.contains("Window"),
      s"q126 must stay scan → repartition → mapPartitions:\n$p")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      s"q126 lost its mapPartitions codec stage:\n$p")
  }

  test("q127: only screened candidates ship texts; all joins equality") {
    val p = plan("q127_editdist_verify")
    // The O(n·m) Levenshtein runs on candidate pairs only; the text
    // joins are doc_id-equality, the screen is the shared map-side pair
    // machinery — never a corpus-pair product.
    assert(!p.contains("CartesianProduct"), s"q127 grew a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q127 grew a nested-loop join:\n$p")
  }

  test("q128: stickiness is two distinct-aggs and one week join") {
    val p = plan("q128_stickiness")
    assert(!p.contains("Window"), s"q128 grew a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"q128 grew a cartesian:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 6, s"q128 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q122: dataset card is one source-keyed aggregate") {
    val p = plan("q122_dataset_card")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"q122 must stay a pure map + aggregate:\n$p")
    // distinct-count expansion keeps it within a few source-keyed
    // exchanges; the corpus never shuffles raw text (16-byte md5 only).
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 3, s"q122 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q129: CDC chunking shuffles 8-byte signatures, never windows") {
    val p = plan("q129_cdc_chunks")
    // Tokenize→hash→boundary→chunk-signature is ONE map-only projection
    // per doc; only the sig df aggregate, the join back and the doc
    // rollup shuffle — all on 8-byte keys. A Window (per-doc running
    // chunk index) would mean the HOF formulation regressed to the
    // oracle's relational shape.
    assert(!p.contains("Window"), s"q129 grew a window:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q129 grew a product:\n$p")
    val shuffles = distinctShuffles(p)
    assert(shuffles <= 5, s"q129 grew to $shuffles distinct shuffles:\n$p")
  }

  test("q130: both retrieval channels prune against broadcast builds") {
    val p = plan("q130_rrf_fusion")
    // The lexical channel is q84's inverted-index shape (corpus
    // explodes once, prunes map-side against the <=25-term broadcast);
    // the semantic channel is q25's broadcast-query BNL. The fusion
    // join touches only O(queries x k) rows.
    assert(!p.contains("CartesianProduct"), s"q130 grew a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q130's query-term prune must ride a broadcast hash join:\n$p")
  }

  test("q132: support floor precedes the joins; top-20 never global-sorts") {
    val p = plan("q132_pmi_collocations")
    // The >= 5 floor is applied to the bigram aggregate BEFORE the two
    // unigram joins (the joined relation is the frequent-bigram table,
    // not the tail); the cut is a TakeOrderedAndProject, the 1-row
    // stats ride a BNL broadcast.
    assert(p.contains("TakeOrderedAndProject"),
      s"q132's top-20 degraded to a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"q132 grew a cartesian:\n$p")
  }

  test("global collect_list aggregates fold only bounded frames") {
    // The q93/q107 regression guard (VERDICT r7 #2): a GLOBAL aggregate
    // (keys=[]) whose buffer is a collect_list materializes its entire
    // input frame in ONE reducer's memory. Over a bounded frame
    // (#sources rows, decile edges, a top-k cut) that is fine; over a
    // corpus-cardinality frame it is the single-reducer OOM shape that
    // q93/q107 shipped with in round 7. Every global collect_list site
    // must be allow-listed here with its bound; corpus-adaptive scalar
    // thresholds must use q117's scaled-integer mean instead.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // name -> why its global collect_list input frame is bounded (the
    // bound must hold at ANY corpus size, not just test scale).
    val bounded: Map[String, String] = Map(
      "q74_mixture_weights" -> "folds per-source rows (#sources)",
      "q94_importance_resample" -> "folds per-source rows (#sources)",
      "q87_embed_quantize" -> "folds per-dimension stats (embedding dim)",
      "q106_zipf_slope" -> "folds the top-100 rank cut (<= 100 rows)",
      "q120_curriculum_bins" -> "folds the 9 decile edges",
      "q143_index_delta_maintain" ->
        ("folds the trained codebook (<= AnnPolicy.TrainedK = 64 rows) " +
          "into the one-row broadcast the delta routes against"),
      "q144_index_delete_compact" ->
        ("folds the trained codebook (<= 64 rows) into the one-row " +
          "broadcast both the tombstones and the upserts route against"),
      "q145_index_drift_gate" ->
        ("folds the trained codebook (<= 64 rows) into the one-row " +
          "broadcast the delta routes against; the KL sum itself is a " +
          "plain scaled-integer aggregate, not a collect"),
      "q36c_ann_ivf_coarse" ->
        ("folds the COARSE cells (<= ceil(sqrt(K)) <= 64 rows at the " +
          "CoarseRouteBound cap) into the one-row array the per-row " +
          "top-m multi-assignment sorts, and the FINE cells (<= K <= " +
          "4096 rows = ~2 MB at the cap) into the one-row array the " +
          "in-row fine argmin filters — both bounded by the policy's " +
          "own cap, never corpus-sized; the in-row argmin replaced the " +
          "explode-join-min_by chain whose sort-based aggregate " +
          "spilled the n*m*(K/C)-row stream at the 16.9M cap witness"),
      "q72_kmeans_train" ->
        ("kmAssign folds the K = 8 fixture centroids into the one-row " +
          "array each row's in-row argmin scans (the map-only Lloyd " +
          "assignment — same K x D bytes the old row-broadcast shipped)"),
      "q95_cluster_purity" ->
        ("q72's kmAssign folds (K = 8 centroid rows), same bound"),
      "q140_embedding_outliers" ->
        ("folds the fixture quantizer's K = ceil(n/125) centroid rows " +
          "into the one-row array the in-row argmin scans — the SAME " +
          "frame (same K x D bytes) the previous plan broadcast as " +
          "rows into the crossJoin; the corpus-proportional growth is " +
          "the query's documented fixture caveat (ADVICE r13 #2, " +
          "oracle-pinned), production swaps trainedCodebook (K = 64) " +
          "as q140b does"),
      "q140b_outliers_trained" ->
        ("folds the trained codebook (<= AnnPolicy.TrainedK = 64 " +
          "rows) into the one-row array the in-row argmin scans"),
      "q147_ann_filtered" ->
        ("folds the trained codebook (<= 64 rows) into the one-row " +
          "array the in-row argmin scans; embedding/label ride the " +
          "row, not an aggregate buffer"),
      "q68b_semantic_dedup_trained" ->
        ("folds the coarse level (<= ceil(sqrt(K)) rows) and the " +
          "fine cells (K = cellBoundedK = max(64, ceil(n/125)) rows) " +
          "into the one-row arrays the two in-row routing scans read " +
          "— the same K x D bytes the previous max_by chain's " +
          "broadcast-join build side shipped; K's ~n/125 growth is " +
          "SemDeDup's partition dial (cells stay ~125 vectors so the " +
          "verify stays linear), documented in the query's scaladoc"),
      "q68_semantic_dedup" ->
        ("q68b's bound with the fixture quantizer: coarse <= " +
          "ceil(sqrt(K)) rows, fine K = ceil(n/125) rows — the " +
          "corpus-proportional fixture caveat is the query's own " +
          "(oracle-pinned), and the bytes equal the old equality " +
          "join's K-row build side"),
      "q36_ann_ivf" ->
        ("folds the fixture quantizer's K = ceil(n/125) centroids " +
          "into the one-row array the in-row cosine argmax scans — " +
          "same fixture caveat as q140/q68; replaced a FULL n x K " +
          "shuffle + per-vector row_number sort"),
      "q36b_ann_ivf_trained" ->
        ("folds the trained codebook (<= 64 rows) into the one-row " +
          "array the in-row argmin scans; embedding rides the row"),
      "q151_ann_matryoshka" ->
        ("folds the trained codebook (<= 64 rows, PREFIX-sliced under " +
          "the structure guard) into the one-row routing array"),
      "q148_ivf_index_stats" ->
        ("folds the trained codebook (<= 64 rows) into the one-row " +
          "array the in-row argmin scans"),
      "q156_cell_repair" ->
        ("folds the trained codebook (<= 64 rows) into the one-row " +
          "array the main routing pass scans; the giant-cell repair " +
          "passes fold the seed/sub-centroid sets (Σ s_sub <= ~2K " +
          "rows by the ceiling split: Σ ceil(n_live*K/n) <= K + " +
          "#giants <= 2K) into one-row arrays the in-row per-cell " +
          "argmins scan (r19 — replaced the two member-side min_by " +
          "Exchanges)"),
      "q60_ann_pq" ->
        ("folds the deterministic codebook (capped at vec_id < 2500 / " +
          "every 25th = <= 100 rows) into 8 one-row subspace-slice " +
          "arrays the in-row PQ encode scans (r19 — replaced the " +
          "n x 800-row posexplode + min_by Exchange)"),
      "q60b_ann_pq_trained" ->
        ("folds the trained codebook (<= AnnPolicy.TrainedK = 64 rows) " +
          "into 8 one-row subspace-slice arrays the in-row PQ encode " +
          "scans (r19)"),
      "q61_range_join" ->
        ("folds the per-day counts (calendar-bounded: one row per " +
          "observed ship day) into the one-row dense prefix-sum array " +
          "each order reads with two O(1) lookups (r19 — replaced the " +
          "31x explode + o_orderkey re-aggregation)"))
    def offenders(name: String): Seq[String] = planNodes(name).collect {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty &&
          a.aggregateExpressions.exists(
            _.aggregateFunction.prettyName == "collect_list") =>
        a.nodeName
    }
    val unlisted = for {
      name <- graft.SparkEntry.queries.keys.toSeq.sorted
      if !streamingQs(name) && !bounded.contains(name)
      hits = offenders(name)
      if hits.nonEmpty
    } yield s"$name (${hits.distinct.mkString(", ")})"
    assert(unlisted.isEmpty,
      s"global collect_list aggregates not allow-listed as bounded: " +
        s"${unlisted.mkString("; ")} — if the input frame is " +
        "corpus-cardinality this is the q93/q107 single-reducer " +
        "shape; use the scaled-integer mean (q117) or bound the " +
        "frame first")
  }

  test("q131: hashes compute once (cached); the band join is equality") {
    val p = plan("q131_image_neardup")
    // The codec pipeline materializes once behind the cache — the
    // band self-join must read InMemoryTableScan on both sides, never
    // re-decode; candidates come from (band, sig, cell) equality via
    // saltedBandPairs, never a pairwise product, and the hot-bucket
    // list joins back by BROADCAST (the q78 hot-key pattern) — an SMJ
    // there would shuffle the whole band relation just to find the
    // handful of over-cap keys.
    assert(p.contains("InMemoryTableScan"),
      s"q131 lost its hash cache — the codec would run twice:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q131 grew a product:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q131's hot-bucket list lost its broadcast join:\n$p")
  }
}
