package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus/relational analytics family: salted aggregation,
  * as-of joins, percentiles, drift and distribution distances,
  * PageRank, heavy hitters, dataset cards.
  *
  * Moved verbatim from `PipelineQueries` (round 14, VERDICT r13 #5 —
  * a pure file split along the family seams; shared helpers, artifacts
  * and oracle CTE fragments stay in [[PipelineQueries]] and arrive via
  * the wildcard import). Registered through [[PipelineQueries.queries]]
  * / [[PipelineQueries.oracleSql]], so the driver contract is unchanged.
  */
private[operators] object AnalyticsQueries {
  import PipelineQueries._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- skew-safe aggregation: explicit two-phase salting -----
    // events.event_type has a handful of hot keys — the exact shape that
    // funnels a 100 TB groupBy into a few reducers. Phase 1 fans each hot
    // key across 32 salt buckets (partial aggregates per (key, salt));
    // phase 2 merges the 32 partials per key. Same technique AQE's
    // skew-join handles for joins, written out for aggregation. The
    // oracle is the plain single-phase GROUP BY — results are identical,
    // only the shuffle distribution differs.
    "q34_salted_agg" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.events
        .withColumn("salt", pmod(xxhash64($"event_id"), lit(32)))
        .groupBy($"event_type", $"salt")
        .agg(count(lit(1)).as("pn"), sum($"value").as("psum"),
             max($"value").as("pmax"), min($"value").as("pmin"))
        .groupBy($"event_type")
        .agg(sum($"pn").as("n_events"),
             round(sum($"psum"), 2).as("sum_value"),
             round(max($"pmax"), 4).as("max_value"),
             round(min($"pmin"), 4).as("min_value"))
        .orderBy($"event_type")
    },


    // ----- as-of join: latest order at or before each event date -----
    // Spark has no native ASOF JOIN (DuckDB does — the oracle uses it);
    // the scalable composition is union-and-fill: tag both sides, sort
    // within each key partition by (date, tag), and carry the last seen
    // order forward with last(ignoreNulls). One shuffle on the key, an
    // in-partition sort, no per-row range probe — rows per key bound the
    // window state, not total volume.
    "q35_asof_join" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      // One order per (customer, date) — greatest orderkey wins — so the
      // as-of match is deterministic on both engines.
      val o1 = t.orders
        .withColumn("od", to_date($"o_orderdate"))
        .groupBy($"o_custkey", $"od")
        .agg(max($"o_orderkey").as("o_orderkey"),
             max_by($"o_totalprice", $"o_orderkey").as("o_totalprice"))
      val oside = o1.select($"o_custkey".as("k"), $"od".as("d"),
        lit(0).as("tag"), $"o_orderkey", $"o_totalprice",
        lit(null).cast("long").as("event_id"))
      val eside = t.events.select($"user_id".as("k"), to_date($"ts").as("d"),
        lit(1).as("tag"), lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"), $"event_id")
      val w = Window.partitionBy($"k").orderBy($"d", $"tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      oside.union(eside)
        .withColumn("m_orderkey", last($"o_orderkey", ignoreNulls = true).over(w))
        .withColumn("m_totalprice", last($"o_totalprice", ignoreNulls = true).over(w))
        .filter($"tag" === 1 && $"m_orderkey".isNotNull)
        .select($"event_id", $"k".as("user_id"), $"d".as("event_date"),
          $"m_orderkey".as("o_orderkey"),
          round($"m_totalprice", 2).as("o_totalprice"))
        .orderBy($"event_id")
    },


    // ----- as-of join, native whole-operator form -----
    // The same contract as q35 through the custom logical+physical
    // operator ([[graft.plans.AsOfJoin]] → planner strategy →
    // AsOfJoinExec): each side shuffles once on its key and sorts by
    // (key, time) — planned by EnsureRequirements from the operator's
    // declared requirements — then a single forward merge with one-row
    // state per partition. Compare q35's composition (union both sides
    // + last(ignoreNulls) window): same rows, but no union
    // materialization and no window buffering. Shares q35's DuckDB
    // ASOF JOIN oracle.
    "q35b_asof_native" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      // Pre-partition on the JOIN key alone, then aggregate: hash(k)
      // co-locates every (k, od) group, so the groupBy runs on the
      // existing partitioning AND its output already satisfies the
      // as-of join's ClusteredDistribution(o_custkey) — one exchange
      // feeds both the aggregation and the join (3 total in the plan,
      // matching q35's composition; without this, the agg's (k, od)
      // hash partitioning forces a 4th re-shuffle on k).
      val o1 = t.orders
        .withColumn("od", to_date($"o_orderdate"))
        .repartition($"o_custkey")
        .groupBy($"o_custkey", $"od")
        .agg(max($"o_orderkey").as("o_orderkey"),
             max_by($"o_totalprice", $"o_orderkey").as("o_totalprice"))
      val e = t.events.select($"event_id", $"user_id", to_date($"ts").as("d"))
      graft.plans.AsOf.asofJoin(e, o1, "user_id", "d", "o_custkey", "od")
        .filter($"o_orderkey".isNotNull)
        .select($"event_id", $"user_id", $"d".as("event_date"),
          $"o_orderkey", round($"o_totalprice", 2).as("o_totalprice"))
        .orderBy($"event_id")
    },


    // ----- score normalization: percent_rank + deciles per language -----
    // Rank-normalizing a quality score within a stratum (here: token
    // count within language) — the step that makes thresholds comparable
    // across languages before a global filter. percent_rank is
    // (rank-1)/(n-1) in both engines over the same total order
    // (n_tokens, doc_id), so the division is one identical IEEE op;
    // ntile's bucket-size rule (larger buckets first) is the SQL
    // standard in both. One window partition per language — bounded
    // partition count, each a single ordered pass.
    "q80_score_percentiles" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"lang").orderBy($"n_tokens", $"doc_id")
      t.documents
        .select($"doc_id", $"lang",
          size(expr(toksExpr)).cast("long").as("n_tokens"))
        .withColumn("pr", CrossRound.r(percent_rank().over(w), 6))
        .withColumn("decile", ntile(10).over(w).cast("int"))
        .select($"doc_id", $"lang", $"n_tokens", $"pr", $"decile")
        .orderBy($"doc_id")
    },


    // ----- novelty scoring over arrival order -----
    // The corpus-growth metric curation tracks as data streams in: what
    // fraction of each doc's (distinct) shingles has never been seen in
    // any EARLIER doc (arrival order = doc_id)? Complements q81 (delta
    // vs a frozen index) and q89 (where the duplicated spans sit): one
    // min-aggregation per sid — first_seen is a selection, exactly
    // deterministic — and a per-doc ratio. Two shuffles on 8-byte sids;
    // shingle strings never leave their row (docSidArrays carrier).
    "q90_novelty_score" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val dsid = docSidArrays(t.documents)
        .select($"doc_id", explode($"sids").as("sid"))
      val first = dsid.groupBy($"sid").agg(min($"doc_id").as("fd"))
      dsid.join(first, "sid")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"fd" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
        .select($"doc_id", $"n_shingles", $"n_novel",
          CrossRound.r($"n_novel".cast("double") / $"n_shingles", 4)
            .as("novelty"))
        .orderBy($"doc_id")
    },


    // ----- robust length-outlier filter (median + MAD) -----
    // The robust alternative to 3σ length clipping: median and median
    // absolute deviation are insensitive to the heavy tail that defines
    // the outliers being hunted. Two exact global percentiles (each a
    // 1-row broadcast) then a map-only flag. n_chars is integer, so the
    // interpolated median is integer-or-half — every derived double is
    // exact and tie-free under round(…, 2). At 100 TB the exact
    // percentile pair becomes the q17b sketch (approx_percentile) with
    // the same downstream shape; the flag pass itself is already
    // map-only.
    "q109_mad_outlier" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val med = t.documents.agg(
        expr("percentile(n_chars, 0.5)").as("med"))
      val dev = t.documents.crossJoin(broadcast(med))
        .withColumn("adev", abs($"n_chars".cast("double") - $"med"))
      val mad = dev.agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.crossJoin(broadcast(mad))
        .select($"doc_id", $"n_chars",
          round($"med", 2).as("med"),
          round($"mad", 2).as("mad"),
          round($"adev", 2).as("adev"),
          ($"adev" > lit(3.0) * $"mad").as("is_outlier"))
        .orderBy($"doc_id")
    },


    // ----- per-source distribution drift (two-sample KS statistic) -----
    // The data-mix audit q74/q94 assume implicitly: does each source's
    // length distribution actually differ from the corpus? D_s =
    // max_x |CDF_s(x) − CDF(x)|, evaluated on the shared breakpoint
    // grid (every distinct length — step CDFs change only there, so the
    // sup over the reals IS the max over the grid). The grid is bounded
    // by the VALUE domain (distinct integer lengths — ~10⁴ even at
    // 100 TB), not the row count: counts collapse to (source, len)
    // first, the #sources×|grid| filled relation is windowed per source
    // over grid-sized partitions, and the single-partition global-CDF
    // window runs over |grid| rows only (the q79 band rewrite applies
    // verbatim if a value domain ever outgrows a task). Every CDF value
    // is an int/int division on identical integers → bit-identical
    // doubles; |difference| and max are single-op/selection, so only
    // the final report rounds.
    "q112_ks_distance" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val docs = t.documents.select($"source", $"n_chars".as("len"))
      val c = docs.groupBy($"source", $"len").agg(count(lit(1)).as("n"))
      val g = docs.groupBy($"len").agg(count(lit(1)).as("n")).cache()
      val tot = docs.agg(count(lit(1)).as("n_all"))
      val ns = docs.groupBy($"source").agg(count(lit(1)).as("n_s"))
      val filled = ns.select($"source").crossJoin(g.select($"len"))
        .join(c, Seq("source", "len"), "left")
        .withColumn("n", coalesce($"n", lit(0L)))
      val cs = filled.withColumn("cum_s",
        sum($"n").over(Window.partitionBy($"source").orderBy($"len")))
      val cg = g
        .withColumn("cum_g", sum($"n").over(Window.orderBy($"len")))
        .select($"len", $"cum_g")
      cs.join(cg, "len")
        .join(broadcast(ns), "source")
        .crossJoin(broadcast(tot))
        .withColumn("d", abs($"cum_s".cast("double") / $"n_s" -
          $"cum_g".cast("double") / $"n_all"))
        .groupBy($"source", $"n_s")
        .agg(CrossRound.r(max($"d"), 6).as("ks"))
        .select($"source", $"n_s".as("n_docs"), $"ks")
        .orderBy($"source")
    },


    // ----- PageRank over the rare-shingle similarity graph -----
    // Centrality-weighted curation (which documents anchor dense
    // near-duplicate neighborhoods): PageRank, damping 0.85, two
    // synchronous iterations unrolled, over the undirected graph whose
    // edges are [[rareSharedSidPairs]] candidates sharing ≥ 3 df≤50
    // shingles (the same bounded-fanout pair stream q23/q71/q103 ride;
    // q46 walks these edges for components, this WEIGHS them). The
    // multiplicity threshold is load-bearing at scale: single-shingle
    // collisions make the candidate graph nearly dense on a
    // shared-vocabulary corpus (measured sf0.1: 1.13M pairs at i≥1 vs
    // 10k at i≥3 over 5000 docs) — ≥3 keeps edges that witness real
    // lexical overlap and bounds the message volume the sweeps ship.
    // Each
    // iteration is one src-keyed join (rank onto edges) + one dst-keyed
    // aggregate — the standard message-passing shape, parallel in
    // nodes, no broadcast of anything node-count-sized (N and the
    // teleport term ride a 1-row broadcast). Dangling mass is NOT
    // redistributed (documented simplification — both engines drop it
    // identically, so ranks sum below 1 when isolated docs exist).
    // Determinism: every contribution is a single divide of identical
    // doubles; per-node sums fold neighbor lists in src order, so both
    // engines add in the same sequence — bit-identical before the one
    // rounding.
    "q116_pagerank" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val arrs = docSidArrays(t.documents)
      val pairs = rareSharedSidPairs(arrs, 50)
        .filter($"i" >= 3)
        .select($"doc_a", $"doc_b").cache()
      val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
        .unionByName(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
      val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      val edgesD = edges.join(deg, "src").cache()
      val tot = t.documents.agg(count(lit(1)).as("n_docs"))
      val docs = t.documents.select($"doc_id")
      def sweep(ranks: DataFrame): DataFrame =
        edgesD.join(ranks.withColumnRenamed("doc_id", "src"), "src")
          .select($"dst", $"src", ($"r" / $"deg").as("contrib"))
          .groupBy($"dst")
          .agg(aggregate(
            array_sort(collect_list(struct($"src", $"contrib"))),
            lit(0.0), (acc, e) => acc + e.getField("contrib")).as("s"))
      def step(ranks: DataFrame): DataFrame =
        docs.join(sweep(ranks).withColumnRenamed("dst", "doc_id"),
            Seq("doc_id"), "left")
          .crossJoin(broadcast(tot))
          .select($"doc_id",
            (lit(0.15) / $"n_docs" +
              lit(0.85) * coalesce($"s", lit(0.0))).as("r"))
      val r0 = docs.crossJoin(broadcast(tot))
        .select($"doc_id", (lit(1.0) / $"n_docs").as("r"))
      val r1 = step(r0).cache()
      val r2 = step(r1)
      r2.join(deg.withColumnRenamed("src", "doc_id"), Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"deg", lit(0L)).as("deg"),
          CrossRound.r($"r", 8).as("pr"))
        .orderBy($"doc_id")
    },


    // ----- per-source dataset card -----
    // The rollup a dataset release ships: per source, doc and token
    // counts, language spread, byte-exact duplicate rate (distinct
    // md5 — 16-byte keys shuffle, never full texts), and exact integer
    // means. One source-keyed aggregate; every mean is
    // (BIGINT sum)/(count) — a single exactly-rounded division.
    "q122_dataset_card" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.documents
        .select($"source", $"lang", $"n_chars", md5($"text").as("h"),
          size(expr(toksExpr)).cast("long").as("n_tokens"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("n_tokens"),
          countDistinct($"lang").as("n_langs"),
          countDistinct($"h").as("n_distinct"),
          sum($"n_chars").as("sum_chars"))
        .select($"source", $"n_docs", $"n_tokens", $"n_langs",
          CrossRound.r(
            lit(1.0) - $"n_distinct".cast("double") / $"n_docs", 4)
            .as("exact_dup_rate"),
          CrossRound.r($"n_tokens".cast("double") / $"n_docs", 4)
            .as("mean_tokens"),
          CrossRound.r($"sum_chars".cast("double") / $"n_docs", 2)
            .as("mean_chars"))
        .orderBy($"source")
    },


    // ----- heavy hitters: mergeable Misra–Gries propose → exact verify -----
    // q55's propose/verify pattern applied to FREQUENCY instead of
    // membership: a 64-counter Misra–Gries summary
    // ([[graft.functions.MisraGriesAgg]] — the mergeable PODS'12 form,
    // guarantee property-tested in `MisraGriesSpec`) aggregates the
    // token stream into ONE ≤ 64-entry row (shuffle volume
    // O(map_tasks·k), never vocabulary-sized — the reason a sketch, not
    // a full count table, is the 100 TB shape for "what are the top
    // tokens"), and every token with true count > N/65 is guaranteed a
    // live counter. The candidate set then broadcasts back and an exact
    // count over JUST those ≤ 64 tokens (map-side pruned semi-join)
    // verifies against the emit threshold 64·count > N ⊂ the guarantee
    // region — so the output is EXACT (sketch false positives die in
    // the verify, and false negatives cannot exist), which is what lets
    // a DuckDB GROUP BY/HAVING oracle check a sketch-powered query
    // hash-for-hash.
    "q135_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val mg = udaf(new graft.functions.MisraGriesAgg(64))
      def tok = t.documents.repartition($"doc_id")
        .select(explode(expr(toksExpr)).as("w"))
      val cands = tok.agg(mg($"w").as("summary"))
        .select(explode($"summary").as("e")).select($"e.token".as("w"))
      val tot = t.documents
        .select(size(expr(toksExpr)).cast("long").as("nt"))
        .agg(sum($"nt").cast("long").as("n"))
      tok.join(broadcast(cands), "w")
        .groupBy($"w").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter($"cnt" * 64 > $"n")
        .select($"w".as("token"), $"cnt", $"n",
          CrossRound.r($"cnt".cast("double") / $"n", 6).as("frac"))
        .orderBy($"cnt".desc, $"token")
    },
  )

  def oracleSql: Map[String, String] = Map(

      // Plain single-phase GROUP BY: the salting on the Spark side is a
      // shuffle-distribution strategy, not a semantic change.
      "q34_salted_agg" -> """
        SELECT event_type,
               count(1) AS n_events,
               round(sum(value), 2) AS sum_value,
               round(max(value), 4) AS max_value,
               round(min(value), 4) AS min_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type""",


      // Native-operator twin of q35 — identical contract, same oracle.
      "q35b_asof_native" -> """
        WITH o1 AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) od,
                 max(o_orderkey) AS o_orderkey,
                 arg_max(o_totalprice, o_orderkey) AS o_totalprice
          FROM orders GROUP BY 1, 2),
        e AS (SELECT event_id, user_id, CAST(ts AS DATE) d FROM events)
        SELECT e.event_id, e.user_id, e.d AS event_date,
               o1.o_orderkey, round(o1.o_totalprice, 2) AS o_totalprice
        FROM e ASOF JOIN o1
          ON e.user_id = o1.o_custkey AND e.d >= o1.od
        ORDER BY event_id""",


      "q35_asof_join" -> """
        WITH o1 AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) od,
                 max(o_orderkey) AS o_orderkey,
                 arg_max(o_totalprice, o_orderkey) AS o_totalprice
          FROM orders GROUP BY 1, 2),
        e AS (SELECT event_id, user_id, CAST(ts AS DATE) d FROM events)
        SELECT e.event_id, e.user_id, e.d AS event_date,
               o1.o_orderkey, round(o1.o_totalprice, 2) AS o_totalprice
        FROM e ASOF JOIN o1
          ON e.user_id = o1.o_custkey AND e.d >= o1.od
        ORDER BY event_id""",


      "q80_score_percentiles" -> s"""
        WITH t AS (SELECT doc_id, lang,
                          len($toks)::BIGINT AS n_tokens
                   FROM documents)
        SELECT doc_id, lang, n_tokens,
               floor(percent_rank() OVER (PARTITION BY lang
                                          ORDER BY n_tokens, doc_id)
                     * 1000000 + 0.5) / 1000000 AS pr,
               CAST(ntile(10) OVER (PARTITION BY lang
                                    ORDER BY n_tokens, doc_id) AS INT) AS decile
        FROM t
        ORDER BY doc_id""",


      "q90_novelty_score" -> s"""
        WITH $dsh, $dsid,
        first AS (SELECT sid, min(doc_id) fd FROM dsid GROUP BY 1)
        SELECT doc_id, CAST(count(1) AS BIGINT) n_shingles,
               CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_novel,
               floor(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END)::DOUBLE
                     / count(1) * 10000 + 0.5) / 10000 AS novelty
        FROM dsid JOIN first USING (sid)
        GROUP BY doc_id
        ORDER BY doc_id""",


      // MAD twin: quantile_cont's interpolation on integer-valued
      // doubles is exact in both engines (dyadic arithmetic below
      // 2^52), so med/mad/adev and the 3·MAD flag are bit-identical.
      "q109_mad_outlier" -> """
        WITH med AS (SELECT quantile_cont(n_chars::DOUBLE, 0.5) med
                     FROM documents),
        dev AS (SELECT doc_id, n_chars,
                       abs(n_chars::DOUBLE - med.med) adev, med.med
                FROM documents, med),
        mad AS (SELECT quantile_cont(adev, 0.5) mad FROM dev)
        SELECT doc_id, n_chars,
               round(dev.med, 2) AS med,
               round(mad.mad, 2) AS mad,
               round(adev, 2) AS adev,
               adev > 3.0 * mad.mad AS is_outlier
        FROM dev, mad
        ORDER BY doc_id""",


      // Step CDFs on the shared breakpoint grid; every CDF value a
      // single int/int division, max a selection — one rounding at the
      // end. Window frames are the default RANGE-to-current-row in both
      // engines; (source, len) / len keys are unique so ties can't
      // differ.
      "q112_ks_distance" -> s"""
        WITH d AS (SELECT source, n_chars len FROM documents),
        c AS (SELECT source, len, CAST(count(1) AS BIGINT) n
              FROM d GROUP BY 1, 2),
        g AS (SELECT len, CAST(count(1) AS BIGINT) n FROM d GROUP BY 1),
        tot AS (SELECT CAST(count(1) AS BIGINT) n_all FROM d),
        ns AS (SELECT source, CAST(count(1) AS BIGINT) n_s
               FROM d GROUP BY 1),
        filled AS (SELECT s.source, gl.len, coalesce(c.n, 0) n
                   FROM (SELECT source FROM ns) s
                   CROSS JOIN (SELECT len FROM g) gl
                   LEFT JOIN c ON c.source = s.source AND c.len = gl.len),
        cs AS (SELECT source, len,
                      sum(n) OVER (PARTITION BY source ORDER BY len) cum_s
               FROM filled),
        cg AS (SELECT len, sum(n) OVER (ORDER BY len) cum_g FROM g),
        dd AS (SELECT cs.source, ns.n_s,
                      abs(cum_s::DOUBLE / ns.n_s
                          - cum_g::DOUBLE / tot.n_all) dv
               FROM cs JOIN cg USING (len) JOIN ns USING (source)
               CROSS JOIN tot)
        SELECT source, n_s AS n_docs,
               ${CrossRound.sql("max(dv)", 6)} AS ks
        FROM dd GROUP BY source, n_s
        ORDER BY source""",


      // Two unrolled synchronous iterations; contributions fold in src
      // order (the same sequence Spark's array_sort'ed fold adds in),
      // teleport/damping constants cast to DOUBLE so no DECIMAL
      // arithmetic sneaks in. Dangling mass intentionally not
      // redistributed — identically in both engines.
      "q116_pagerank" -> s"""
        WITH $dsh, $dsid,
        rare AS (SELECT sid FROM dsid GROUP BY sid
                 HAVING count(1) <= 50),
        rdsh AS (SELECT doc_id, sid FROM dsid JOIN rare USING (sid)),
        pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b
                  FROM rdsh a JOIN rdsh b
                    ON a.sid = b.sid AND a.doc_id < b.doc_id
                  GROUP BY 1, 2 HAVING count(1) >= 3),
        edges AS (SELECT doc_a src, doc_b dst FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        deg AS (SELECT src, CAST(count(1) AS BIGINT) deg
                FROM edges GROUP BY 1),
        tot AS (SELECT CAST(count(1) AS BIGINT) n_docs FROM documents),
        r0 AS (SELECT doc_id, 1.0::DOUBLE / tot.n_docs r
               FROM documents CROSS JOIN tot),
        s1 AS (SELECT dst, list_reduce(list_prepend(0.0::DOUBLE,
                 list(r0.r / deg.deg ORDER BY e.src)), (a, b) -> a + b) s
               FROM edges e JOIN deg USING (src)
                    JOIN r0 ON r0.doc_id = e.src
               GROUP BY dst),
        r1 AS (SELECT d.doc_id,
                      0.15::DOUBLE / tot.n_docs
                        + 0.85::DOUBLE * coalesce(s1.s, 0.0::DOUBLE) r
               FROM documents d LEFT JOIN s1 ON s1.dst = d.doc_id
               CROSS JOIN tot),
        s2 AS (SELECT dst, list_reduce(list_prepend(0.0::DOUBLE,
                 list(r1.r / deg.deg ORDER BY e.src)), (a, b) -> a + b) s
               FROM edges e JOIN deg USING (src)
                    JOIN r1 ON r1.doc_id = e.src
               GROUP BY dst),
        r2 AS (SELECT d.doc_id,
                      0.15::DOUBLE / tot.n_docs
                        + 0.85::DOUBLE * coalesce(s2.s, 0.0::DOUBLE) r
               FROM documents d LEFT JOIN s2 ON s2.dst = d.doc_id
               CROSS JOIN tot)
        SELECT r2.doc_id, coalesce(deg.deg, 0) AS deg,
               ${CrossRound.sql("r2.r", 8)} AS pr
        FROM r2 LEFT JOIN deg ON deg.src = r2.doc_id
        ORDER BY doc_id""",


      "q122_dataset_card" -> s"""
        WITH base AS (SELECT source, lang, md5(text) h, n_chars,
                             CAST(len($toks) AS BIGINT) n_tokens
                      FROM documents)
        SELECT source,
               CAST(count(1) AS BIGINT) n_docs,
               CAST(sum(n_tokens) AS BIGINT) n_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) n_langs,
               ${CrossRound.sql(
                 "1.0 - count(DISTINCT h)::DOUBLE / count(1)", 4)}
                 AS exact_dup_rate,
               ${CrossRound.sql("sum(n_tokens)::DOUBLE / count(1)", 4)}
                 AS mean_tokens,
               ${CrossRound.sql("sum(n_chars)::DOUBLE / count(1)", 2)}
                 AS mean_chars
        FROM base GROUP BY 1 ORDER BY 1""",


      // The sketch is exact-by-verification: every token with count
      // > N/65 is guaranteed a Misra–Gries counter (mergeable-summaries
      // bound), the emit threshold 64·count > N is strictly inside that
      // region, and survivors are re-counted exactly — so a plain
      // GROUP BY/HAVING twin checks the sketch-powered plan.
      "q135_heavy_hitters" -> s"""
        WITH tok AS (SELECT unnest($toks) w FROM documents),
        tot AS (SELECT CAST(count(1) AS BIGINT) n FROM tok),
        c AS (SELECT w, CAST(count(1) AS BIGINT) cnt FROM tok GROUP BY 1)
        SELECT w AS token, cnt, n,
               ${CrossRound.sql("cnt::DOUBLE / n", 6)} AS frac
        FROM c CROSS JOIN tot
        WHERE cnt * 64 > n
        ORDER BY cnt DESC, token""",
  )
}
