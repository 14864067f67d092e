package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sampling / mixing / packing family: deterministic samplers,
  * mixture weights, token budgets, sequence packing, splits, sharding.
  *
  * Moved verbatim from `PipelineQueries` (round 14, VERDICT r13 #5 —
  * a pure file split along the family seams; shared helpers, artifacts
  * and oracle CTE fragments stay in [[PipelineQueries]] and arrive via
  * the wildcard import). Registered through [[PipelineQueries.queries]]
  * / [[PipelineQueries.oracleSql]], so the driver contract is unchanged.
  */
private[operators] object SamplingQueries {
  import PipelineQueries._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- deterministic stratified sampling (training-mixture control) -----
    // Keep a per-language fraction of the corpus with a hash-derived
    // uniform u ∈ [0,1) per doc — reproducible across runs/engines
    // (unlike rand()), map-only, zero shuffle before the output sort. At
    // 100 TB this is the shape mixture construction wants: rates come
    // from a tiny config, the decision is pure per-row arithmetic.
    "q47_stratified_sample" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.documents
        .withColumn("rate", when($"lang" === "en", 0.2).otherwise(0.5))
        .withColumn("u", expr(scrambleExpr("doc_id")) / lit(4294967296.0))
        .filter($"u" < $"rate")
        .select($"doc_id", $"lang", $"source", round($"u", 6).as("u"))
        .orderBy($"doc_id")
    },


    // ----- sequence packing: fixed token budget, contiguous greedy -----
    // Pack documents into training sequences of ≤512 tokens (plus at
    // most one straddling doc): within each source, docs in doc_id order
    // go to bin floor(tokens-before / 512) — the standard one-pass
    // approximation of concat-and-chunk corpus packing. The running sum
    // is a per-source window (parallel across sources; at 100 TB the
    // partition key is the shard, same shape), everything else is one
    // hash aggregation.
    "q48_pack_sequences" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.documents
        .select($"source", $"doc_id",
          size(expr(toksExpr)).cast("long").as("n_tokens"))
        .withColumn("cum_before", sum($"n_tokens").over(w) - $"n_tokens")
        .withColumn("seq_id", expr("cum_before div 512"))
        .groupBy($"source", $"seq_id")
        .agg(count(lit(1)).as("n_docs"),
             sum($"n_tokens").as("sum_tokens"),
             min($"doc_id").as("first_doc"),
             max($"doc_id").as("last_doc"))
        .orderBy($"source", $"seq_id")
    },


    // ----- weighted mixture interleave (training-order scheduling) -----
    // Stride-schedule the corpus across sources by mixture weight: docs
    // are hash-scrambled within each source (per-source window — fully
    // parallel), each gets schedule key idx/weight, and the global
    // training order is the ascending-key merge — a source with weight 3
    // appears 3× as often in any prefix. Emitting the first 500
    // positions is a TakeOrderedAndProject (top-k, no global sort); the
    // position column is computed on that bounded prefix only. A full
    // materialization at 100 TB would range-partition by sched_key
    // instead of ranking globally.
    "q53_interleave" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val wIdx = Window.partitionBy($"source").orderBy($"h", $"doc_id")
      val prefix = t.documents
        .select($"doc_id", $"source")
        .withColumn("h", expr(scrambleExpr("doc_id")))
        .withColumn("idx", row_number().over(wIdx).cast("long"))
        .withColumn("weight",
          when($"source".isin("src0", "src1"), 3.0).otherwise(1.0))
        .withColumn("sched_key", $"idx" / $"weight")
        .orderBy($"sched_key", $"source", $"doc_id")
        .limit(500)
      val wPos = Window.orderBy($"sched_key", $"source", $"doc_id")
      prefix
        .withColumn("position", row_number().over(wPos).cast("long"))
        .select($"position", $"doc_id", $"source",
          CrossRound.r($"sched_key", 4).as("sched_key"))
        .orderBy($"position")
    },


    // ----- leakage-aware train/val split (group-level assignment) -----
    // The split step after dedup that naive pipelines get wrong: hashing
    // doc_id sends near-duplicates to BOTH sides (train/val leakage).
    // Assign by the near-dup GROUP label instead — the q46 connected
    // component (singletons label themselves) — so a whole duplicate
    // cluster lands on one side by construction. The split hash is the
    // q47 deterministic scramble over group_id, 90/10. Scale: the label
    // propagation is q46's O(diameter)-round loop, paid ONCE per corpus
    // via the shared [[dedupLabelsArtifact]]; assignment itself is one
    // left join + map-only arithmetic.
    "q67_leakage_split" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val labels = dedupLabelsArtifact(s, dir)
      t.documents.select($"doc_id", $"source")
        .join(labels.select($"node".as("doc_id"), $"lbl"), Seq("doc_id"), "left")
        .withColumn("group_id", coalesce($"lbl", $"doc_id"))
        .withColumn("u", expr(scrambleExpr("group_id")) / lit(4294967296.0))
        .withColumn("split", when($"u" < 0.9, "train").otherwise("val"))
        .select($"doc_id", $"group_id", $"source", $"split")
        .orderBy($"doc_id")
    },


    // ----- deterministic global shuffle + shard assignment -----
    // The training-order step: every doc gets a pseudorandom-but-
    // deterministic order key (the q47 overflow-safe scramble of
    // doc_id), a shard (ord mod 8), and its token count — a reader
    // consumes shard s sorted by ord. Emitting the ORDER KEY instead of
    // a dense position is the 100 TB design choice: a per-shard dense
    // row_number would funnel corpus/8 rows through one window task,
    // while the key itself is map-only and sorts lazily at read time.
    "q70_shard_assign" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.documents.repartition($"doc_id")
        .select($"doc_id", expr(toksExpr).as("toks"))
        .withColumn("ord", expr(scrambleExpr("doc_id")).cast("long"))
        .select($"doc_id", ($"ord" % 8).as("shard"), $"ord",
          size($"toks").cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    },


    // ----- temperature-scaled mixture weights (the data-mix plan) -----
    // The planning step that feeds q53's interleave: per-source token
    // counts → sampling weight ∝ tokens^α (α = 0.5, the standard
    // temperature that upweights small high-quality sources), then the
    // per-source epoch factor a 1M-token budget implies (>1 = upsample,
    // <1 = downsample). Shape at 100 TB: ONE map-side-combining
    // aggregate whose output is #sources rows; everything after is
    // arithmetic over that tiny relation (the denominator broadcast is
    // one row). Cross-engine determinism: sqrt is correctly-rounded per
    // IEEE-754 (identical in both engines), and the denominator folds
    // over the SORTED per-source terms, so the only order-sensitive sum
    // is pinned to one order in both engines.
    "q74_mixture_weights" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val per = t.documents.repartition($"doc_id")
        .select($"source", size(expr(toksExpr)).cast("long").as("n"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
      val denom = per.agg(
        aggregate(sort_array(collect_list(sqrt($"n_tokens".cast("double")))),
          lit(0.0), (acc, x) => acc + x).as("z"))
      per.crossJoin(broadcast(denom))
        .withColumn("w", sqrt($"n_tokens".cast("double")) / $"z")
        .select($"source", $"n_docs", $"n_tokens",
          CrossRound.r($"w", 4).as("weight"),
          CrossRound.r(lit(1000000.0) * $"w" / $"n_tokens", 4).as("epochs"))
        .orderBy($"source")
    },


    // ----- token-budget selection: materialize a per-source budget -----
    // The curriculum/budget step after q74 picks mixture weights: each
    // source contributes its docs in a deterministic priority order
    // (longest first, doc_id tiebreak) until a token budget fills. One
    // window per source partition computes the running total; the filter
    // keeps the prefix. Integer token counts sum exactly — no float
    // contract needed. Scale: like q48, the per-source window is the
    // small-corpus formulation; at 100 TB the same prefix selection runs
    // as per-range partial sums + a broadcast of per-range offsets (the
    // classic distributed prefix-sum), or as a two-pass length-quantile
    // cutoff — the CONTRACT (deterministic priority order, budget-bounded
    // prefix) is what this query pins.
    "q79_budget_select" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"source")
        .orderBy($"n_tokens".desc, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.documents
        .select($"source", $"doc_id",
          size(expr(toksExpr)).cast("long").as("n_tokens"))
        .withColumn("cum_tokens", sum($"n_tokens").over(w))
        .filter($"cum_tokens" <= 20000)
        .select($"source", $"doc_id", $"n_tokens", $"cum_tokens")
        .orderBy($"source", $"cum_tokens", $"doc_id")
    },


    // ----- exact-N stratified sample: fixed-size eval carve-out -----
    // (see budgetSelectPrefixSum below for q79's documented scale form,
    // implemented as a spec-gated witness)
    // q47 samples at a RATE; eval/holdout sets need an exact SIZE. Rank
    // each stratum by the same deterministic key-derived scramble
    // (uniform, reproducible, independent of physical order) and keep
    // exactly the first 20 per language. Small-stratum-count
    // formulation: one window partition per language. At scale the
    // same contract runs as the two-pass rank-threshold — approximate
    // the N-th scramble key per stratum, filter map-only, trim the
    // boundary ties exactly — so no stratum ever funnels through one
    // reducer.
    "q82_exact_sample" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"lang").orderBy($"u", $"doc_id")
      t.documents
        .select($"doc_id", $"lang", $"source")
        .withColumn("u", expr(scrambleExpr("doc_id")) / lit(4294967296.0))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 20)
        .select($"doc_id", $"lang", $"source", $"rk", round($"u", 6).as("u"))
        .orderBy($"lang", $"rk")
    },


    // ----- weighted per-stratum sample (priority-biased carve-out) -----
    // q82 samples uniformly; curation often wants LENGTH-BIASED picks
    // (keep the stratum's substantial docs more often, reproducibly).
    // Each doc gets priority key u/w — u the q47 deterministic dyadic
    // scramble fraction, w = n_tokens — and the 10 smallest keys per
    // language win. u/w is a documented engineering deviation from the
    // A-ES exponential-key form u^(1/w): pow, like ln (see q84), has no
    // cross-engine correct-rounding guarantee, while u/w is one
    // exactly-rounded IEEE divide on identical inputs — bit-identical
    // in both engines — and keeps the property that matters (heavier
    // docs get stochastically smaller keys; P[i beats j] is monotone in
    // w_i/w_j, though not exactly w_i/(w_i+w_j)). Map-only until the
    // bounded per-language window; the q82 two-pass rank-threshold note
    // is the 100 TB form here too.
    "q85_weighted_sample" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"lang").orderBy($"key", $"doc_id")
      t.documents
        .select($"doc_id", $"lang",
          size(expr(toksExpr)).cast("long").as("n_tokens"))
        .filter($"n_tokens" > 0)
        .withColumn("u", expr(scrambleExpr("doc_id")) / lit(4294967296.0))
        .withColumn("key", $"u" / $"n_tokens")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 10)
        .select($"doc_id", $"lang", $"n_tokens", $"rk",
          CrossRound.r($"key", 8).as("key"))
        .orderBy($"lang", $"rk")
    },


    // ----- proportional per-source cap (the per-domain cap) -----
    // The guard against one domain flooding the mixture: each source
    // keeps its longest 20% of docs (integer floor, minimum 5) by
    // (n_chars desc, doc_id). Integer arithmetic only — the cap is
    // n_docs div 5, exact in both engines. One agg for per-source sizes
    // (#sources rows, broadcast back) and one rank window per source; at
    // 100 TB the rank-threshold two-pass (q82's note) replaces the
    // per-source window so no hot source funnels one reducer.
    "q88_source_cap" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val per = t.documents.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("cap", greatest(lit(5L), expr("n_docs div 5")))
        .select($"source", $"cap")
      val w = Window.partitionBy($"source").orderBy($"n_chars".desc, $"doc_id")
      t.documents.select($"doc_id", $"source", $"n_chars")
        .withColumn("rk", row_number().over(w).cast("long"))
        .join(broadcast(per), "source")
        .filter($"rk" <= $"cap")
        .select($"source", $"doc_id", $"n_chars", $"rk", $"cap")
        .orderBy($"source", $"rk")
    },


    // ----- importance resampling: APPLY the q74 mixture by thinning -----
    // q74 plans the mixture (weight ∝ √tokens); this op executes it:
    // each source gets keep-probability p = min(1, B·w_s / tokens_s)
    // (B = half the corpus's total tokens — CORPUS-ADAPTIVE, so the
    // gate thins on every fuzz corpus instead of saturating at p = 1
    // under a fixed budget) and each doc keeps iff its deterministic
    // scramble fraction u < p — reproducible Bernoulli thinning toward
    // the temperature-scaled target, the downsample half of the
    // mixture (upsampling = epochs > 1 is q53's interleave). Map-only
    // after one #sources-row aggregate: probabilities broadcast, u is
    // a per-row projection, no window anywhere — the 100 TB shape
    // outright. Cross-engine: z folds sorted per-source terms (q74's
    // argument), sqrt is correctly-rounded IEEE, u is a dyadic
    // rational, and the fixed op chain B·√t/z/t is exactly-rounded on
    // identical inputs — so u < p is decided on bit-identical doubles.
    "q94_importance_resample" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val base = t.documents.repartition($"doc_id")
        .select($"doc_id", $"source", size(expr(toksExpr)).cast("long").as("n"))
      val per = base.groupBy($"source").agg(sum($"n").as("n_tokens"))
      val denom = per.agg(
        aggregate(sort_array(collect_list(sqrt($"n_tokens".cast("double")))),
          lit(0.0), (acc, x) => acc + x).as("z"),
        expr("sum(n_tokens) div 2").as("b"))
      val probs = per.crossJoin(broadcast(denom))
        .withColumn("p", least(lit(1.0),
          $"b".cast("double") * sqrt($"n_tokens".cast("double"))
            / $"z" / $"n_tokens"))
        .select($"source", $"p")
      base.join(broadcast(probs), "source")
        .withColumn("u", expr(scrambleExpr("doc_id")) / lit(4294967296.0))
        .select($"doc_id", $"source", $"n".as("n_tokens"),
          CrossRound.r($"p", 6).as("p_keep"), ($"u" < $"p").as("keep"))
        .orderBy($"doc_id")
    },


    // ----- stratified train/val/test split: exact counts per stratum -----
    // The split every training pipeline runs before anything else:
    // within each source, docs rank by their deterministic scramble
    // (ties impossible to matter — doc_id breaks them) and the first
    // ⌊0.8n⌋ go to train, the next ⌊0.9n⌋−⌊0.8n⌋ to val, the rest to
    // test — EXACT integer counts per stratum (a Bernoulli split like
    // q47 only hits 80/10/10 in expectation; eval sets care about the
    // exact count). rn and n ride the SAME per-source window partition
    // (one shuffle); boundaries are integer arithmetic, so both engines
    // agree without a float anywhere. At 100 TB: rank-within-stratum is
    // a per-source window — partition-parallel across sources, and the
    // documented two-pass rank-threshold form (q85) applies verbatim if
    // one stratum outgrows a task.
    "q96_train_split" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"source")
      val wr = w.orderBy($"u", $"doc_id")
      t.documents
        .select($"doc_id", $"source",
          expr(scrambleExpr("doc_id")).as("u"))
        .withColumn("rn", row_number().over(wr))
        .withColumn("n", count(lit(1)).over(w))
        .select($"doc_id", $"source",
          when($"rn" <= expr("(8 * n) div 10"), "train")
            .when($"rn" <= expr("(9 * n) div 10"), "val")
            .otherwise("test").as("split"))
        .orderBy($"doc_id")
    },


    // ----- curriculum binning by exact length deciles -----
    // Length-curriculum assignment (shortest-first epochs) WITHOUT a
    // global rank: decile thresholds come from the inverted-CDF
    // quantile over the BOUNDED length value domain (q112's trick —
    // distinct token counts, ~10⁴ values at any corpus size, so the
    // one cumulative window runs over a bounded single partition),
    // t_k = min{v : cum(v) ≥ ⌈kN/10⌉}. The 9 thresholds collapse to
    // one broadcast array and every doc bins MAP-SIDE as
    // epoch = 1 + #{t_k < n_tokens} — ties share a bin
    // deterministically in both engines. Per-epoch stats are integer
    // sums + one exact division each.
    "q120_curriculum_bins" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val base = t.documents
        .select($"doc_id", size(expr(toksExpr)).cast("long").as("n_tokens"))
        .cache()
      val vc = base.groupBy($"n_tokens".as("v")).agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vc.withColumn("cum", sum($"c").over(wCum))
      val n = base.agg(count(lit(1)).as("n"))
      val thresholds = cum.crossJoin(broadcast(n))
        .select($"v", $"cum", $"n",
          explode(expr("sequence(1, 9)")).as("k"))
        .filter($"cum" >= expr("(k * n + 9) DIV 10"))
        .groupBy($"k").agg(min($"v").as("tv"))
      val tarr = thresholds
        .agg(expr("transform(array_sort(collect_list(struct(k, tv))), x -> x.tv)")
          .as("tvs"))
      base.crossJoin(broadcast(tarr))
        .select($"doc_id", $"n_tokens",
          (lit(1) + size(expr("filter(tvs, t -> n_tokens > t)")))
            .cast("int").as("epoch"))
        .groupBy($"epoch")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("tot_tokens"))
        .withColumn("mean_tokens",
          CrossRound.r($"tot_tokens".cast("double") / $"n_docs", 4))
        .orderBy($"epoch")
    },


    // ----- shard balance audit -----
    // The health check after q70's deterministic shard assignment:
    // per-shard doc and token totals plus the balance ratio
    // shard_tokens·8/total — the skew a training job's data loader
    // actually feels. One shard-keyed aggregate (8 groups) + a 1-row
    // total broadcast; the scramble is q70's exact expression, so the
    // audit measures the REAL assignment.
    "q124_shard_balance" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val per = t.documents.repartition($"doc_id")
        .select($"doc_id",
          (expr(scrambleExpr("doc_id")).cast("long") % 8).as("shard"),
          size(expr(toksExpr)).cast("long").as("n_tokens"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("tot_tokens"))
      val tot = per.agg(sum($"tot_tokens").as("all_tokens"))
      per.crossJoin(broadcast(tot))
        .select($"shard", $"n_docs", $"tot_tokens",
          CrossRound.r(
            $"tot_tokens".cast("double") * 8 / $"all_tokens", 6)
            .as("balance"))
        .orderBy($"shard")
    },
  )

  def oracleSql: Map[String, String] = Map(

      // Group labels from the same transitive closure as q46; singleton
      // docs label themselves; split = q47's scramble over group_id.
      "q67_leakage_split" -> s"""
        WITH RECURSIVE $minhashChain,
        pairs AS MATERIALIZED (SELECT doc_a, doc_b
                  FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                             JOIN sizes sb ON doc_b = sb.doc_id
                  WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.6),
        edges AS (SELECT doc_a src, doc_b dst FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach AS (SELECT src AS node, src AS lbl FROM edges
                  UNION
                  SELECT e.dst, r.lbl FROM reach r
                  JOIN edges e ON e.src = r.node),
        comp AS (SELECT node AS doc_id, min(lbl) AS group_id
                 FROM reach GROUP BY node),
        g AS (SELECT d.doc_id, d.source,
                     coalesce(c.group_id, d.doc_id) AS group_id
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
        SELECT doc_id, group_id, source,
               CASE WHEN (${oracleScramble("group_id")}) / 4294967296.0 < 0.9
                    THEN 'train' ELSE 'val' END AS split
        FROM g
        ORDER BY doc_id""",


      "q70_shard_assign" -> s"""
        WITH t AS (SELECT doc_id, $toks tk FROM documents),
        o AS (SELECT doc_id,
                     CAST((${oracleScramble("doc_id")}) AS BIGINT) AS ord,
                     CAST(len(tk) AS BIGINT) AS n_tokens
              FROM t)
        SELECT doc_id, ord % 8 AS shard, ord, n_tokens
        FROM o
        ORDER BY doc_id""",


      "q47_stratified_sample" -> s"""
        SELECT doc_id, lang, source,
               round((${oracleScramble("doc_id")})
                     / 4294967296.0, 6) AS u
        FROM documents
        WHERE (${oracleScramble("doc_id")}) / 4294967296.0
              < CASE WHEN lang = 'en' THEN 0.2 ELSE 0.5 END
        ORDER BY doc_id""",


      "q48_pack_sequences" -> s"""
        WITH t AS (SELECT source, doc_id,
                          len($toks)::BIGINT AS n_tokens
                   FROM documents),
        c AS (SELECT source, doc_id, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS cum_before
              FROM t)
        SELECT source, (cum_before // 512)::BIGINT AS seq_id,
               count(1) AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c GROUP BY 1, 2
        ORDER BY source, seq_id""",


      "q53_interleave" -> s"""
        WITH s AS (
          SELECT doc_id, source,
                 (${oracleScramble("doc_id")}) AS h,
                 CASE WHEN source IN ('src0', 'src1') THEN 3.0 ELSE 1.0 END
                   AS weight
          FROM documents),
        i AS (SELECT doc_id, source, weight,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY h, doc_id) AS idx
              FROM s),
        k AS (SELECT doc_id, source, idx / weight AS sched_key FROM i
              ORDER BY sched_key, source, doc_id LIMIT 500)
        SELECT row_number() OVER (ORDER BY sched_key, source, doc_id)
                 AS position,
               doc_id, source, floor(sched_key * 10000 + 0.5) / 10000 AS sched_key
        FROM k ORDER BY position""",


      // Integer-only split boundaries: both engines rank on the same
      // dyadic scramble key and compare rn against (8n)//10 / (9n)//10.
      "q96_train_split" -> s"""
        WITH t AS (SELECT doc_id, source,
                          (${oracleScramble("doc_id")}) u
                   FROM documents),
        r AS (SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY u, doc_id) rn,
                     count(1) OVER (PARTITION BY source) n
              FROM t)
        SELECT doc_id, source,
               CASE WHEN rn <= (8 * n) // 10 THEN 'train'
                    WHEN rn <= (9 * n) // 10 THEN 'val'
                    ELSE 'test' END AS split
        FROM r
        ORDER BY doc_id""",


      // Denominator folds over the SORTED sqrt terms in both engines —
      // the one order-sensitive float sum is pinned to one order.
      "q74_mixture_weights" -> s"""
        WITH toks AS (SELECT doc_id, source, $toks tk FROM documents),
        per AS (SELECT source, count(1) n_docs,
                       CAST(sum(len(tk)) AS BIGINT) n_tokens
                FROM toks GROUP BY 1),
        z AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
                       list_sort(list(sqrt(n_tokens::DOUBLE)))),
                     (a, b) -> a + b) z
              FROM per)
        SELECT source, n_docs, n_tokens,
               floor((sqrt(n_tokens::DOUBLE) / z.z) * 10000 + 0.5) / 10000 AS weight,
               floor((1000000.0 * (sqrt(n_tokens::DOUBLE) / z.z)
                     / n_tokens) * 10000 + 0.5) / 10000 AS epochs
        FROM per, z
        ORDER BY source""",


      "q82_exact_sample" -> s"""
        WITH s AS (SELECT doc_id, lang, source,
                          (${oracleScramble("doc_id")}) / 4294967296.0 AS u
                   FROM documents),
        r AS (SELECT doc_id, lang, source, u,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY u, doc_id) AS rk
              FROM s)
        SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS rk,
               round(u, 6) AS u
        FROM r WHERE rk <= 20
        ORDER BY lang, rk""",


      // Weighted-sample twin: same scramble, same single divide, same
      // (key, doc_id) order — keys are bit-identical, so the rank cut
      // can't flip.
      "q85_weighted_sample" -> s"""
        WITH t AS (SELECT doc_id, lang,
                          CAST(len($toks) AS BIGINT) AS n_tokens
                   FROM documents),
        k AS (SELECT doc_id, lang, n_tokens,
                     ((${oracleScramble("doc_id")}) / 4294967296.0)
                       / n_tokens AS key
              FROM t WHERE n_tokens > 0),
        r AS (SELECT doc_id, lang, n_tokens, key,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY key, doc_id) AS rk
              FROM k)
        SELECT doc_id, lang, n_tokens, CAST(rk AS BIGINT) AS rk,
               floor(key * 100000000 + 0.5) / 100000000 AS key
        FROM r WHERE rk <= 10
        ORDER BY lang, rk""",


      // Resample twin: same sorted-fold denominator as q74, same single
      // op chain for p, same dyadic scramble fraction for u — u < p is
      // decided on bit-identical doubles.
      "q94_importance_resample" -> s"""
        WITH t AS (SELECT doc_id, source,
                          CAST(len($toks) AS BIGINT) n FROM documents),
        per AS (SELECT source, CAST(sum(n) AS BIGINT) n_tokens
                FROM t GROUP BY 1),
        z AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
                       list_sort(list(sqrt(n_tokens::DOUBLE)))),
                     (a, b) -> a + b) z,
                     CAST(sum(n_tokens) // 2 AS BIGINT) b
              FROM per),
        pr AS (SELECT source,
                      least(1.0, z.b::DOUBLE * sqrt(n_tokens::DOUBLE) / z.z
                                 / n_tokens) p
               FROM per, z)
        SELECT t.doc_id, t.source, t.n AS n_tokens,
               floor(p * 1000000 + 0.5) / 1000000 AS p_keep,
               (${oracleScramble("t.doc_id")}) / 4294967296.0 < p AS keep
        FROM t JOIN pr USING (source)
        ORDER BY doc_id""",


      "q79_budget_select" -> s"""
        WITH t AS (SELECT source, doc_id,
                          len($toks)::BIGINT AS n_tokens
                   FROM documents),
        c AS (SELECT source, doc_id, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY source
                                         ORDER BY n_tokens DESC, doc_id
                                         ROWS UNBOUNDED PRECEDING)
                       AS cum_tokens
              FROM t)
        SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM c WHERE cum_tokens <= 20000
        ORDER BY source, cum_tokens, doc_id""",


      "q88_source_cap" -> """
        WITH per AS (SELECT source,
                            CAST(greatest(5, count(1) // 5) AS BIGINT) cap
                     FROM documents GROUP BY 1),
        r AS (SELECT source, doc_id, n_chars,
                     CAST(row_number() OVER (PARTITION BY source
                                             ORDER BY n_chars DESC, doc_id)
                          AS BIGINT) rk
              FROM documents)
        SELECT r.source, r.doc_id, r.n_chars, r.rk, per.cap
        FROM r JOIN per USING (source)
        WHERE r.rk <= per.cap
        ORDER BY source, rk""",


      "q120_curriculum_bins" -> s"""
        WITH base AS (SELECT doc_id, CAST(len($toks) AS BIGINT) n_tokens
                      FROM documents),
        vc AS (SELECT n_tokens v, CAST(count(1) AS BIGINT) c
               FROM base GROUP BY 1),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v) cum FROM vc),
        n AS (SELECT CAST(count(1) AS BIGINT) n FROM base),
        t AS (SELECT k, min(v) tv
              FROM (SELECT unnest(range(1, 10)) k) ks, cum, n
              WHERE cum.cum >= (k * n.n + 9) // 10 GROUP BY k),
        binned AS (SELECT b.doc_id, b.n_tokens,
                          CAST(1 + coalesce((SELECT count(1) FROM t
                                             WHERE b.n_tokens > t.tv), 0)
                               AS INT) epoch
                   FROM base b)
        SELECT epoch, CAST(count(1) AS BIGINT) n_docs,
               CAST(sum(n_tokens) AS BIGINT) tot_tokens,
               ${CrossRound.sql("sum(n_tokens)::DOUBLE / count(1)", 4)}
                 AS mean_tokens
        FROM binned GROUP BY 1 ORDER BY 1""",


      "q124_shard_balance" -> s"""
        WITH t AS (SELECT doc_id, $toks tk FROM documents),
        o AS (SELECT doc_id,
                     CAST((${oracleScramble("doc_id")}) AS BIGINT) AS ord,
                     CAST(len(tk) AS BIGINT) AS n_tokens
              FROM t),
        per AS (SELECT ord % 8 AS shard,
                       CAST(count(1) AS BIGINT) n_docs,
                       CAST(sum(n_tokens) AS BIGINT) tot_tokens
                FROM o GROUP BY 1),
        tot AS (SELECT CAST(sum(tot_tokens) AS BIGINT) all_tokens FROM per)
        SELECT shard, n_docs, tot_tokens,
               ${CrossRound.sql(
                 "tot_tokens::DOUBLE * 8 / tot.all_tokens", 6)} AS balance
        FROM per, tot ORDER BY shard""",
  )
}
