package graft.operators

import graft.Par
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity-search / embedding-space family: brute-force and
  * approximate top-k (LSH, IVF, PQ — fixture and TRAINED-codebook
  * variants), quantization, clustering and its evaluation, embedding
  * hygiene.
  *
  * Moved verbatim from `PipelineQueries` (round 14, VERDICT r13 #5 —
  * a pure file split along the family seams; shared helpers, artifacts
  * and oracle CTE fragments stay in [[PipelineQueries]] and arrive via
  * the wildcard import). Registered through [[PipelineQueries.queries]]
  * / [[PipelineQueries.oracleSql]], so the driver contract is unchanged.
  */
private[operators] object AnnQueries {
  import PipelineQueries._

  /** WITNESS-ONLY query-set width for the recall-graded ANN variants
    * (VERDICT r15 #1: a 5-query witness resolves recall@5 only in 0.04
    * steps — 50 queries resolve 0.004, enough to distinguish the 0.68
    * vs 0.80 bands the r15 verdict could not). The oracle gate always
    * runs at the default 5 (the conf is never set there), so the
    * graded rows are unchanged; AnnRecall/CoarseExp/MrlExp set 50 to
    * measure the REGISTERED plan rather than a reimplementation. */
  private[graft] def annNq(s: SparkSession): Long =
    s.conf.getOption("spark.graft.ann.queryCount").map { v =>
      val nq = try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.ann.queryCount must be a positive integer, got " +
            s"'$v' — it is a WITNESS knob; the oracle gate runs at the " +
            "default 5 and must never see it set")
      }
      require(nq > 0, s"spark.graft.ann.queryCount must be > 0, got $nq")
      nq
    }.getOrElse(5L)

  /** q60/q60b shared body — IVFADC + refine with BOTH corpus-sized
    * stages map-only (guide §2.3/§2.4):
    *
    *  - ENCODE (r19, VERDICT r18 #6): the codebook's 8 subspace SLICES
    *    ride one broadcast row (ca0..ca7, each ARRAY<STRUCT<cid, ce>>
    *    sorted by cid) and each vector argmins its own 8 slices in-row
    *    via the compiled [[graft.functions.L2ArgMinCid]] kernel — the
    *    identical ascending-index double L2 the old pq_subdists →
    *    min_by(cid, struct(d, cid)) chain folded (same ties-by-cid,
    *    same NaN-last, same NULLS FIRST), so codes are bit-identical
    *    and the n×K×8-row Exchange is gone. The explicit session-width
    *    repartition spreads the one-split parquet scan (q127/q140
    *    lesson) — it is the ONLY corpus shuffle left.
    *  - ADC (r20, VERDICT r19 #4): the r19 form still posexploded 8
    *    code rows per vector, broadcast-hash-joined them against the
    *    (query × cid × subspace) LUT and rebuilt per-(query, vec) sums
    *    through two ObjectHashAggregates (collect_list + array_sort +
    *    fold). Instead the kernel now returns each winner's POSITION
    *    in the cid-sorted slice (`l2ArgminIdx` — selection and tie
    *    rules untouched), the LUT compacts to ONE broadcast row of
    *    per-query position-aligned arrays (dss[s][pos] = d, d values
    *    bit-identical pass-throughs of the same pq_subdists outputs),
    *    and each vector folds its 8 lookups IN-ROW in the same
    *    ascending-subspace order seeded 0.0 (all d ≥ +0.0, so the
    *    seed is exact) — the fold is a codegen Add chain, no HOF on
    *    the corpus path. Generate + BroadcastHashJoin + both
    *    ObjectHashAggregates are gone; nothing corpus×fanout ever
    *    materializes.
    *  - The top-S SHORTLIST window stays a window on purpose: S =
    *    max(100, ⌈n/20⌉) ([[AnnPolicy.pqShortlist]], VERDICT r11 #1)
    *    scales with the corpus, so a partial-aggregating top-S
    *    (TopKAgg) would hold O(n/20) rows PER MAP TASK — the exact
    *    buffered-aggregate failure mode the r19 200k witness DNF'd on.
    *    The window's Exchange carries (query_id, vec_id, adc) rows
    *    only — 24 bytes/row, ~5% of the encode repartition's vector
    *    bytes.
    *  - Re-rank: exact L2 over the shortlist rows (equality join,
    *    never a scan), top-5 per query.
    *
    * ADVICE r19 #3: both slice paths assert 8-divisibility up front —
    * the encode previously truncated remainder dims silently where
    * pq_subdists threw.
    */
  private def pqAnnShortlistRerank(s: SparkSession, e: DataFrame,
      cents0: DataFrame): DataFrame = {
    import s.implicits._
    val nSub = 8
    val cents = cents0.withColumn("ce",
      when(size($"ce") % nSub === 0, $"ce").otherwise(raise_error(
        concat(lit("pq encode: dim "), size($"ce").cast("string"),
          lit(s" not divisible by $nSub")))))
    val subCb = cents.agg(
      array_sort(collect_list(struct($"cid",
        expr(s"slice(ce, 1, size(ce) DIV $nSub)").as("ce")))).as("ca0"),
      (1 until nSub).map { si =>
        array_sort(collect_list(struct($"cid",
          expr(s"slice(ce, $si * (size(ce) DIV $nSub) + 1, " +
            s"size(ce) DIV $nSub)").as("ce")))).as(s"ca$si")
      }: _*)
    // Per-vector in-row encode to POSITIONS (p0..p7) in the cid-sorted
    // slices — one compiled kernel call per subspace, map-only. The
    // embedding NOT-NULL guard replicates the old inner code↔LUT
    // join's drop of null-embedding vectors AT THE SCAN (PushedFilters)
    // — filtering on the computed adc instead would let the optimizer
    // re-express isnotnull(adc) as isnotnull(<kernel call>) per
    // subspace and push those below the projection, DOUBLING every
    // kernel evaluation (measured: the first cut of this rewrite read
    // 1.25× on q60b for exactly that reason; guide §4.4's
    // duplicated-evaluation trap, Catalyst-expression edition).
    val enc = e.where($"embedding".isNotNull)
      .repartition(Par.width(s), $"vec_id")
      .crossJoin(broadcast(subCb))
      .select(($"vec_id" +: (0 until nSub).map { si =>
        graft.functions.GraftFunctions.l2ArgminIdx(
          expr(s"slice(embedding, $si * (size(embedding) DIV $nSub) + 1, " +
            s"size(embedding) DIV $nSub)"),
          col(s"ca$si"), lit(null)).as(s"p$si")
      }): _*)
    // Query-side ADC lookup table: 5 queries × |cents| × 8 subspace
    // distances — rebuilt directly from the query rows (map-only,
    // broadcast-small), then compacted to ONE row of position-aligned
    // arrays: qlut[q].dss[s][pos] is the pq_subdists value of the
    // pos-th cid (lds is sorted by (ls, cid), and filter() preserves
    // that order, so each dss[s] is cid-ascending — aligned with the
    // cid-sorted ca_s slices the kernel indexes into).
    val lut = e.filter($"vec_id" < 5).crossJoin(broadcast(cents))
      .select($"vec_id".as("query_id"), $"cid", posexplode(
        graft.functions.GraftFunctions.pqSubDists($"embedding", $"ce", nSub))
        .as(Seq("ls", "d")))
    val lutRow = lut
      .groupBy($"query_id")
      .agg(array_sort(collect_list(struct($"ls", $"cid", $"d"))).as("lds"))
      .select($"query_id", expr(
        s"transform(sequence(0, ${nSub - 1}), " +
          "s -> transform(filter(lds, x -> x.ls = s), x -> x.d))").as("dss"))
      .agg(array_sort(collect_list(struct($"query_id", $"dss"))).as("qlut"))
    // In-row ADC: explode the 5 broadcast queries per vector, fold the
    // 8 position lookups in ascending subspace order (seeded 0.0 — the
    // exact fold the old aggregate(array_sort(...)) ran). 0-based []
    // subscripts; positions are always in-bounds (the LUT covers every
    // cid) and never NULL (null embeddings are gone at the scan).
    val adc = enc.crossJoin(broadcast(lutRow))
      .select(($"vec_id" +: (0 until nSub).map(si => col(s"p$si"))) :+
        explode($"qlut").as("q"): _*)
      .filter($"vec_id" =!= $"q.query_id")
      .select($"q.query_id".as("query_id"), $"vec_id",
        (0 until nSub).map { si =>
          expr(s"q.dss[$si][CAST(p$si AS INT)]")
        }.foldLeft(lit(0.0))(_ + _).as("adc"))
    val sw = Window.partitionBy($"query_id").orderBy($"adc", $"vec_id")
    // Shortlist size follows [[AnnPolicy.pqShortlist]]: max(100,
    // ⌈n/20⌉), so the exact re-rank always reads ≥ 5% of the corpus
    // per query instead of a fixed 100 whose recall would decay as
    // the index grows (VERDICT r11 #1) — in-plan 1-row count,
    // integer ceiling division, oracle-mirrored.
    val slist = e.agg(count(lit(1)).as("nv"))
      .select(AnnPolicy.scanCeilCol("nv", AnnPolicy.PqScanDiv,
        AnnPolicy.PqShortlistFloor).as("slist"))
    val shortlist = adc
      .withColumn("srank", row_number().over(sw))
      .crossJoin(broadcast(slist))
      .filter($"srank" <= $"slist")
      .select($"query_id", $"vec_id")
    val qv = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
    shortlist.join(e, "vec_id").join(broadcast(qv), "query_id")
      .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"vec_id", CrossRound.r($"l2", 4).as("l2"))
      .orderBy($"query_id", $"rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- similarity search: brute-force cosine top-k (baseline) -----
    // Query vectors broadcast; scoring is the native codegen'd
    // CosineSim expression (one fused loop per pair — the SQL-fold
    // formulation walks the arrays 3× and allocates a product array),
    // accumulating in double left-to-right like the oracle's list fold.
    "q25_cosine_topk" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
      e.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"query_id")
        .withColumn("cos", graft.functions.GraftFunctions.cosineSim($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 10)
        .select($"query_id", $"rank", $"vec_id", CrossRound.r($"cos", 4).as("cos"))
        .orderBy($"query_id", $"rank")
    },


    // ----- top-k via partial-aggregating UDAF (scale path for q25) -----
    // Same result as q25's window rank, but the Aggregator keeps ≤k rows
    // per group per map task — shuffle is O(queries × k), not the full
    // score matrix. Same oracle as q25.
    "q25b_topk_agg" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val topk = udaf(new graft.functions.TopKAgg(10))
      val e = t.embeddings.select($"vec_id", $"embedding")
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
      e.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"query_id")
        .withColumn("cos", graft.functions.GraftFunctions.cosineSim($"embedding", $"qe"))
        .groupBy($"query_id")
        .agg(topk($"vec_id", $"cos").as("top"))
        .select($"query_id", posexplode($"top").as(Seq("i", "sv")))
        .select($"query_id", ($"i" + 1).cast("int").as("rank"),
          $"sv.vec_id".as("vec_id"), CrossRound.r($"sv.cos", 4).as("cos"))
        .orderBy($"query_id", $"rank")
    },


    // ----- embedding-cosine near-dup: banded hyperplane LSH + verify -----
    // Dedup by embedding similarity: 8 deterministic hyperplane bits in
    // 2 bands of 4; candidate pairs agree on at least one band (never
    // all-pairs — O(n·bands) shuffle), then the native CosineSim verifies
    // cos >= 0.4. Banding trades precision for recall exactly like the
    // MinHash bands in q22b. The signature is a per-row map-only fold
    // ([[hyperDots]], native codegen) and the embedding rides along to the band join,
    // so the only shuffles left are the candidate equality-join and the
    // pair dedup — no join back to the base table.
    "q33_embed_neardup" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val sigs = e
        .withColumn("dots", hyperDots(8))
        .withColumn("band_sigs", expr(
          """transform(sequence(0, 1), b ->
               aggregate(sequence(0, 3), CAST(0 AS BIGINT),
                 (acc, r) -> acc + IF(dots[b*4 + r] >= 0D,
                   shiftleft(CAST(1 AS BIGINT), r), CAST(0 AS BIGINT))))"""))
        .select($"vec_id", $"embedding",
          posexplode($"band_sigs").as(Seq("band", "sig")))
      sigs.as("a").join(sigs.as("b"),
          $"a.band" === $"b.band" && $"a.sig" === $"b.sig" &&
          $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
          graft.functions.GraftFunctions.cosineSim($"a.embedding", $"b.embedding")
            .as("rawcos"))
        .filter($"rawcos" >= 0.4)
        .select($"vec_a", $"vec_b", CrossRound.r($"rawcos", 4).as("cos"))
        .distinct()
        .orderBy($"vec_a", $"vec_b")
    },


    // ----- similarity scale path: multi-probe hyperplane LSH -----
    // 12 deterministic hyperplanes → 4096 buckets; each query probes its
    // bucket AND every bucket within Hamming distance r of it — classic
    // multi-probe LSH (neighboring sign patterns hold the near misses):
    // expected candidate fraction on sign-independent data is
    // Σ_{i≤r} C(12,i)/4096 (≈ 7.3% at the r = 3 floor), much less when
    // the data clusters; exact cosine top-5 over the candidates. The
    // single-bucket probe (r6 and earlier) had recall@5 ≈ 0 on the
    // synthetic corpus — 4096 buckets over 500 near-random vectors
    // leave every probe basically empty (`AnnRecallSpec` now gates
    // this). The radius follows [[AnnPolicy.lshRadius]]: the fraction-
    // of-buckets probe makes recall corpus-size-INdependent at scale
    // (unlike q36's fixed count was), so the floor stays 3 for any
    // corpus ≥ ~3.5k vectors; on smaller corpora the radius widens
    // until the expected candidate pool reaches 250 (r = 4 at 2k
    // vectors, 6 at 500) instead of probing near-empty buckets —
    // computed in-plan from a 1-row corpus count with integer
    // threshold compares the oracle mirrors exactly. The probe is a
    // bit_count(xor) predicate against the 5-row broadcast query
    // side — BNLJ(tiny build), the same bounded shape as the q25
    // brute-force scoring, never a corpus×corpus product. The
    // hyperplane "randomness" is a fixed integer mix so the oracle
    // reproduces it.
    "q26_ann_lsh" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      // Bucket id is a pure per-row projection ([[hyperDots]], native codegen,
      // sign-bit pack) — no explode, no groupBy, no join back to e. The
      // remaining shuffles are the top-k window and the output sort.
      val eb = e
        .withColumn("dots", hyperDots(12))
        .withColumn("bucket", expr(
          """aggregate(sequence(0, 11), CAST(0 AS BIGINT),
               (acc, h) -> acc + IF(dots[h] >= 0D,
                 shiftleft(CAST(1 AS BIGINT), h), CAST(0 AS BIGINT)))"""))
        .drop("dots")
      val rad = e.agg(count(lit(1)).as("nv")).select(
        AnnPolicy.lshRadiusCol($"nv").as("radius"))
      val q = eb.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"bucket".as("qbucket"))
        .crossJoin(rad)
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
      eb.join(broadcast(q),
          expr("bit_count(bucket ^ qbucket) <= radius") && $"vec_id" =!= $"query_id")
        .withColumn("cos", graft.functions.GraftFunctions.cosineSim($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id", CrossRound.r($"cos", 4).as("cos"))
        .orderBy($"query_id", $"rank")
    },


    // ----- similarity scale path 2: IVF (inverted-file) ANN -----
    // Coarse quantizer: every 125th vector is a centroid (deterministic,
    // so the oracle reproduces it — a k-means fit would converge
    // engine-differently). Each vector joins its nearest centroid's
    // inverted list; queries probe their nprobe nearest lists, then
    // exact cosine top-5. nprobe follows [[AnnPolicy.ivfNprobe]] —
    // max(2, ⌈L/10⌉) over L lists, a ≥10% scan fraction at ANY index
    // size, computed in-plan from a 1-row centroid count (the fixed
    // nprobe=2 of rounds 7–11 scanned 2/L, and recall@5 decayed
    // 0.84 → 0.20 as the corpus grew 500 → 20k vectors — VERDICT r11
    // #1; `AnnRecallSpec` floors plus the scale measurements in
    // SCALE.md §6 gate the policy). Lists are disjoint, so probes
    // never duplicate a candidate. Centroids are broadcast (tiny);
    // assignment is one map-side pass over the corpus — at 100 TB:
    // n×C scored rows with no shuffle until the per-list grouping, C
    // constant, and per-query probe cost is nprobe average-sized
    // lists ≈ a fixed fraction of n.
    "q36_ann_ivf" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" % 125 === 0)
        .select($"vec_id".as("cid"), $"embedding".as("ce"))
      // Corpus assignment is IN-ROW via the cosine-mode
      // [[graft.functions.L2ArgMinCid]] kernel (the r18 sweep): the
      // previous plan ranked ALL n×K scored rows through a
      // row_number window — a full n×K shuffle + per-vector sort just
      // to keep rank 1. Same (ccos DESC, cid) order (NaN-greatest,
      // ties to min cid), so the oracle's row_number CTE grades
      // unchanged. Only the 5 QUERY vectors still rank their probes
      // through the window (5×K rows).
      val centsArr = cents.agg(
        array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))
      val assigned = e.repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(centsArr))
        .withColumn("cid", graft.functions.GraftFunctions
          .cosArgmaxCid($"embedding", $"kcb", lit(null)))
        .select($"vec_id", $"embedding", $"cid")
      // The query side keeps its nprobe highest-scoring centroids —
      // nprobe probe rows per query, each an equality join against the
      // disjoint inverted lists. Integer ceiling division so the
      // oracle's `//`-arithmetic twin is bit-identical.
      val np = cents.agg(count(lit(1)).as("nl"))
        .select(AnnPolicy.scanCeilCol("nl", AnnPolicy.IvfScanDiv,
          AnnPolicy.IvfNprobeFloor).as("nprobe"))
      val aw = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cid")
      val q = e.filter($"vec_id" < 5).crossJoin(broadcast(cents))
        .withColumn("ccos", graft.functions.GraftFunctions
          .cosineSim($"embedding", $"ce"))
        .withColumn("arank", row_number().over(aw))
        .crossJoin(broadcast(np))
        .filter($"arank" <= $"nprobe")
        .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"cid".as("qcid"))
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
      assigned.join(broadcast(q),
          $"cid" === $"qcid" && $"vec_id" =!= $"query_id")
        .withColumn("cos", graft.functions.GraftFunctions.cosineSim($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id", CrossRound.r($"cos", 4).as("cos"))
        .orderBy($"query_id", $"rank")
    },


    // ----- IVF over the TRAINED fixed-K codebook (production variant) -----
    // q36 with the fixture's every-125th-vector quantizer (K = n/125 —
    // total assignment work O(n²/125), the VERDICT r13 #1 seam)
    // replaced by the PERSISTED q72-trained K=64 codebook
    // ([[trainedCodebook]]): per-row routing is O(K) against a ~32 KB
    // broadcast, so index build is LINEAR in the corpus at any size —
    // the 100 TB shape. Metric is L2 (the metric the quantizer was
    // trained in; q36 stays the cosine-metric fixture twin). Assignment
    // argmins via ONE map-side-combining min_by carrying the embedding
    // as payload — one row per vector shuffles, never vector×centroid
    // (strictly better than q36's window-over-scored-rows shape, which
    // shuffled all n×K scored rows to rank them). Only the 5 query
    // rows rank their probes through a window (5×K rows). nprobe
    // follows [[AnnPolicy.ivfNprobe]] over the artifact's ACTUAL list
    // count (empty clusters drop out of the Lloyd update in both
    // engines identically).
    "q36b_ann_ivf_trained" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = trainedCodebook(s, dir).select($"cid", $"ce")
      // Explicit-width repartition: the n×K scoring runs at the probe
      // side's parallelism and the embeddings table is one parquet
      // split (the q127/q140 lesson). Assignment is IN-ROW via
      // [[graft.functions.L2ArgMinCid]] (the r18 sweep): the previous
      // min_by(struct(cid, embedding)) buffered full vectors through a
      // sort-based aggregate over n×K rows; the kernel scans the same
      // 64-entry broadcast array once per row, map-only, and the
      // embedding never leaves its row.
      val asg = e.repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cents.agg(
          array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"kcb", lit(null)))
        .select($"vec_id", $"cid", $"embedding")
      val np = cents.agg(count(lit(1)).as("nl"))
        .select(AnnPolicy.scanCeilCol("nl", AnnPolicy.IvfScanDiv,
          AnnPolicy.IvfNprobeFloor).as("nprobe"))
      val qw = Window.partitionBy($"query_id").orderBy($"qd", $"cid")
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
        .crossJoin(broadcast(cents))
        .withColumn("qd", graft.functions.GraftFunctions.l2Sq($"qe", $"ce"))
        .withColumn("qrank", row_number().over(qw))
        .crossJoin(broadcast(np))
        .filter($"qrank" <= $"nprobe")
        .select($"query_id", $"qe", $"cid".as("qcid"))
      val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
      asg.join(broadcast(q),
          $"cid" === $"qcid" && $"vec_id" =!= $"query_id")
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id", CrossRound.r($"l2", 4).as("l2"))
        .orderBy($"query_id", $"rank")
    },

    // ----- IVF with TWO-LEVEL coarse routing (the past-the-cap plan) -----
    // [[AnnPolicy.CoarseRouteBound]] documents that once grownK(n)
    // crosses the broadcast bound, flat O(K)-per-row routing must give
    // way to a two-level shape — this query IS that plan, implemented
    // and oracle-checked rather than left as a scaladoc promise. The
    // codebook is the grown one (K = grownK(n), the q36c/GrowK dial);
    // routing is q68b's two-level chain in the L2 metric: ⌈√K⌉ COARSE
    // cells (ONE Lloyd step over the fine centroids from the
    // every-step-th init — see the trained-coarse note below) are the
    // only broadcast a corpus row scans — O(√K) — then fine assignment
    // is an EQUALITY join on the coarse cell (each row compares
    // against the fine centroids of its TOP-m coarse cells,
    // m = [[AnnPolicy.coarseAssignM]] — see the multi-assignment
    // note at vCell). The index this defines is
    // exact BY CONTRACT (the oracle mirrors the two-level rule step
    // for step, ties (d, cid) NULLS FIRST — the family convention), so
    // the rows are graded exactly, not probe-lucky. The QUERY side
    // probes [[AnnPolicy.coarseProbe]](⌈√K⌉) coarse cells, ranks the
    // pooled fine centroids (pool ≈ K/2 ≥ the nprobe the scan policy
    // wants), and probes the [[AnnPolicy.ivfNprobe]](K) nearest fine
    // lists — per-query routing work O(√K + K/2) instead of O(K),
    // which at the 4096-centroid cap is 64 + ~2k vs 4096 comparisons
    // and, more importantly, a 16 KB coarse broadcast instead of a
    // 2 MB flat one on every executor. All three dials are the shared
    // scanCeil arithmetic; K itself crosses engines via grownKSql's
    // exact-⌈√n⌉ argument.
    "q36c_ann_ivf_coarse" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val k = AnnPolicy.grownK(e.count())
      val cents = trainedCodebookK(s, dir, k).select($"cid", $"ce")
      val kdf = cents.agg(
        ceil(sqrt(count(lit(1)).cast("double"))).cast("long").as("step"))
      // The coarse level is TRAINED — one Lloyd step over the fine
      // centroids, initialized from the every-step-th subsample
      // (VERDICT r15 #1, measured at 50-query granularity: the trained
      // coarse is worth ≈ one full multi-assignment step of recall at
      // every m — see [[AnnPolicy.CoarseAssignDiv]]'s table). One
      // K×C in-plan pass; the q72-proven assignment/update parity
      // chain, so the oracle mirrors it step for step.
      val coarse0 = cents.crossJoin(broadcast(kdf))
        .filter($"cid" % $"step" === 0)
        .select($"cid".as("gid"), $"ce".as("ge"))
      val centsAsE = cents.select($"cid".as("vec_id"), $"ce".as("embedding"))
      val coarse = kmUpdate(centsAsE, kmAssign(centsAsE,
          coarse0.select($"gid".as("cid"), $"ge".as("ce"))))
        .select($"cid".as("gid"), $"ce".as("ge"))
      // Fine→coarse routing in-row too (the r18 sweep): K rows × a
      // ≤64-entry coarse array, same (gd, gid) ties as the min_by it
      // replaces.
      val fineCell = cents.crossJoin(broadcast(coarse.agg(array_sort(
          collect_list(struct($"gid".as("cid"), $"ge".as("ce")))).as("gc"))))
        .withColumn("gid", graft.functions.GraftFunctions
          .l2ArgminCid($"ce", $"gc", lit(null)))
        .select($"gid", $"cid", $"ce")
      // Corpus-side MULTI-ASSIGNMENT (the hierarchical-IVF recall fix):
      // each vector considers the fine cells of its TOP-m coarse cells
      // before the fine argmin, m = [[AnnPolicy.coarseAssignM]](C) —
      // the r15 top-2 was re-measured at 50-query granularity and read
      // 0.62 at 320k; the recall loss is entirely index-side (widening
      // the query probe moved nothing), and the shipped trained-coarse
      // m = max(8, ⌈C/3⌉) reads 0.93 there (evidence/r16/
      // coarse_exp_160x.json). Per-row work is C + m·K/C compares —
      // 2.7× under the flat scan at the witness K, 7× at the 4096
      // cap — and the top-m cut is a per-row array_sort over the
      // broadcast coarse ARRAY (the pqRoute pattern) — no n×√K shuffle,
      // still exactly one ledger row per vector after the argmin.
      val tfc = org.apache.spark.sql.functions.transform(_: Column, _: Column => Column)
      val coarseArr = coarse
        .agg(array_sort(collect_list(struct($"gid", $"ge"))).as("ca"),
          AnnPolicy.scanCeilCol("count(1)", AnnPolicy.CoarseAssignDiv,
            AnnPolicy.CoarseAssignFloor).cast("int").as("m"))
      // Fine argmin IN-ROW over the (≤ K ≤ 4096-row, ≤ 2 MB) fine-cell
      // array restricted to the row's top-m coarse cells — the same
      // candidate set the previous explode → equality-join →
      // groupBy(vec_id).min_by chain scored, same (d, cid) ties, but
      // MAP-ONLY via the native [[graft.functions.L2ArgMinCid]] kernel
      // (one compiled scan per row: gid filter + distance fold +
      // argmin). The join shape put n·m·(K/C) rows through a
      // struct-buffered min_by, which plans as a sort-based aggregate
      // and at the 16.9M-vector cap witness spilled the whole
      // 2.4·10¹⁰-row stream to disk; the HOF
      // array_min(transform(filter(...))) form re-hit the §8.5
      // interpreted-lambda tax (both measured, round-17 cap runs).
      val faArr = fineCell
        .agg(array_sort(collect_list(struct($"gid", $"cid", $"ce"))).as("fa"))
      val asg = e.repartition(Par.width(s), $"vec_id").crossJoin(broadcast(coarseArr))
        .withColumn("g2", slice(array_sort(tfc($"ca", c => struct(
          graft.functions.GraftFunctions.l2Sq($"embedding", c.getField("ge"))
            .as("gd"),
          c.getField("gid").as("gid")))), lit(1), $"m"))
        .crossJoin(broadcast(faArr))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"fa", $"g2.gid"))
        .select($"vec_id", $"cid", $"embedding")
      val np = cents.agg(count(lit(1)).as("nl"))
        .select(AnnPolicy.scanCeilCol("nl", AnnPolicy.IvfScanDiv,
          AnnPolicy.IvfNprobeFloor).as("nprobe"))
      val pcDf = kdf.select(AnnPolicy.scanCeilCol("step",
        AnnPolicy.CoarseProbeDiv, AnnPolicy.CoarseProbeFloor).as("pc"))
      val gw = Window.partitionBy($"query_id").orderBy($"gd", $"gid")
      val qCoarse = e.filter($"vec_id" < annNq(s))
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
        .crossJoin(broadcast(coarse))
        .withColumn("gd", graft.functions.GraftFunctions.l2Sq($"qe", $"ge"))
        .withColumn("grk", row_number().over(gw))
        .crossJoin(broadcast(pcDf))
        .filter($"grk" <= $"pc")
        .select($"query_id", $"qe", $"gid")
      val qw = Window.partitionBy($"query_id").orderBy($"qd", $"cid")
      val qFine = qCoarse
        .join(broadcast(fineCell.select($"gid", $"cid", $"ce")), "gid")
        .withColumn("qd", graft.functions.GraftFunctions.l2Sq($"qe", $"ce"))
        .withColumn("qrank", row_number().over(qw))
        .crossJoin(broadcast(np))
        .filter($"qrank" <= $"nprobe")
        .select($"query_id", $"qe", $"cid".as("qcid"))
      val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
      asg.join(broadcast(qFine),
          $"cid" === $"qcid" && $"vec_id" =!= $"query_id")
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id", CrossRound.r($"l2", 4).as("l2"))
        .orderBy($"query_id", $"rank")
    },


    // ----- semantic dedup: cluster-then-prune over embeddings -----
    // The SemDeDup shape (Abbas et al. 2023): assign every embedding to
    // a cluster, then mark as duplicate any vector whose cosine to a
    // LOWER-id vector in the SAME cluster is >= τ — pairwise comparison
    // never crosses a cluster boundary, so the quadratic term is
    // bounded by cluster size, and K is chosen ∝ N to keep that bound
    // flat as the corpus grows. Because K ∝ N, the K fine centroids can
    // NEVER be broadcast (the broadcast would grow with the corpus), so
    // assignment is TWO-LEVEL, the q36/q60 coarse-quantizer shape made
    // exact by contract: (1) ⌈√K⌉-ish COARSE centroids (every
    // 125·step-th vector, step = ⌈√K⌉, computed in-plan from the
    // centroid count — no driver action) are the only broadcast set,
    // O(√K·D); (2) the K fine centroids and then every corpus vector
    // route to their nearest coarse cell via that broadcast + ONE
    // map-side-combining max_by each; (3) fine assignment is an
    // EQUALITY join on the coarse cell id — co-partitioned shuffle,
    // N·(K/√K cell width) compared rows instead of the N·K a flat scan
    // costs, and no O(K) broadcast anywhere. The cluster is DEFINED by
    // this two-level rule (the oracle mirrors it step for step), so the
    // rows are exact, not probe-lucky; ties break (ccos DESC, cid) at
    // both levels. The intra-cluster self-join shuffles each vector
    // once, keyed by its fine cluster, and cluster width stays ~125 by
    // construction as N grows.
    "q68_semantic_dedup" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" % 125 === 0)
        .select($"vec_id".as("cid"), $"embedding".as("ce"))
      // step = ⌈√K⌉ rides along as a one-row broadcast scalar; coarse =
      // every step-th fine centroid, so |coarse| ≈ √K.
      val kdf = cents.agg(
        ceil(sqrt(count(lit(1)).cast("double"))).cast("long").as("step"))
      val coarse = cents.crossJoin(broadcast(kdf))
        .filter($"cid" % (lit(125L) * $"step") === 0)
        .select($"cid".as("gid"), $"ce".as("ge"))
      // All three routing levels are IN-ROW via the cosine-mode
      // [[graft.functions.L2ArgMinCid]] kernel — the q68b rewrite
      // (VERDICT r17 next-round #3) applied to the fixture twin, whose
      // K ∝ n/125 hits the same sort-agg wall: same (cos, -id) ties
      // (gcos DESC, gid / ccos DESC, cid), so the oracle's row_number
      // CTEs grade unchanged. The fine scan reads the row's own cell
      // via the kernel's gid restriction over the one-row collected
      // fine array — the SAME K×D bytes the old equality join's build
      // side shipped, with zero n×(K/C) intermediate rows.
      val coarseArr = coarse.agg(array_sort(
        collect_list(struct($"gid".as("cid"), $"ge".as("ce")))).as("ca"))
      val fineCell = cents.crossJoin(broadcast(coarseArr))
        .withColumn("gid", graft.functions.GraftFunctions
          .cosArgmaxCid($"ce", $"ca", lit(null)))
        .select($"gid", $"cid", $"ce")
      val vCell = e.repartition(Par.width(s), $"vec_id").crossJoin(broadcast(coarseArr))
        .withColumn("gid", graft.functions.GraftFunctions
          .cosArgmaxCid($"embedding", $"ca", lit(null)))
        .select($"gid", $"vec_id", $"embedding")
      val fineArr = fineCell.agg(array_sort(
        collect_list(struct($"gid", $"cid", $"ce"))).as("fa"))
      val assign = vCell.crossJoin(broadcast(fineArr))
        .withColumn("cid", graft.functions.GraftFunctions
          .cosArgmaxCid($"embedding", $"fa", array($"gid")))
        .select($"vec_id", $"cid", $"embedding")
      // Cached: probed by both sides of the intra-cluster self-join and
      // the final projection — without it the embeddings scan + the
      // assignment aggregate re-execute three times (at 100 TB, three
      // full corpus reads).
      val clustered = assign.cache()
      val dups = clustered.as("a").join(clustered.as("b"),
          $"a.cid" === $"b.cid" && $"a.vec_id" < $"b.vec_id")
        .filter(graft.functions.GraftFunctions
          .cosineSim($"a.embedding", $"b.embedding") >= 0.4)
        .select($"b.vec_id".as("vec_id")).distinct()
      clustered.select($"vec_id", $"cid")
        .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
        .select($"vec_id", $"cid", coalesce(!$"dup", lit(true)).as("keep"))
        .orderBy($"vec_id")
    },


    // ----- similarity scale path 3: PQ ANN with exact re-ranking -----
    // The 4th standard ANN shape (after brute q25, LSH q26, IVF q36),
    // now the full production design (IVFADC + refine): vectors encode
    // to 8 sub-space centroid codes (deterministic codebook = every
    // 25th vector, CAPPED at vec_id < 2500 so the broadcast stays ≤100
    // centroids at any corpus size), queries score ALL codes by ADC —
    // summing 8 per-subspace query↔centroid distances looked up from a
    // broadcast table — keep a top-S SHORTLIST per query
    // (S = max(100, ⌈n/20⌉), [[AnnPolicy.pqShortlist]]), and
    // re-rank the shortlist by EXACT L2 over the real vectors. The
    // r6 form ranked by raw ADC with the coarse 4-centroid codebook and
    // scored recall@5 = 0.04 against exact L2 on the synthetic corpus;
    // shortlist+rerank lifts it to ~0.8 (`AnnRecallSpec` gates it).
    // ADC now folds the 8 subspace distances in SUBSPACE ORDER (q84's
    // sorted-fold trick) so the shortlist cut is bit-identical
    // cross-engine — strictly stronger than the old round(.,6) guard.
    // At 100 TB: codes are 8 bytes/vector — the only corpus-sized state
    // the ADC pass touches; the rerank reads exactly S full vectors
    // per query (an equality join on the shortlist, never a scan).
    "q60_ann_pq" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" % 25 === 0 && $"vec_id" < 2500)
        .select($"vec_id".as("cid"), $"embedding".as("ce"))
      pqAnnShortlistRerank(s, e, cents)
    },


    // ----- IVFADC+refine over the TRAINED fixed-K codebook (production variant) -----
    // q60's pipeline (encode → ADC shortlist → exact re-rank, the
    // [[AnnPolicy.pqShortlist]] dial) with the deterministic
    // every-25th-vector codebook replaced by the PERSISTED q72-trained
    // K=64 artifact ([[trainedCodebook]]) — the per-subspace code
    // tables are the trained codebook's 8-dim slices (the shared-
    // codebook IVFPQ simplification; an independently trained 256-code
    // subspace codebook drops into the same plan as a wider `cents`).
    // Same shapes as q60 — codes are the only corpus-sized state the
    // ADC pass touches, the re-rank reads exactly S full vectors per
    // query — plus the explicit-width repartition of the one-split
    // probe side (q127/q140 lesson). The subspace-ordered ADC fold and
    // the NULLS FIRST oracle orderings pin the same cross-engine seams
    // q60/q141 proved out.
    "q60b_ann_pq_trained" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = trainedCodebook(s, dir)
        .select($"cid", $"ce")
      pqAnnShortlistRerank(s, e, cents)
    },


    // ----- k-means training (Lloyd's) — the quantizer the ANN family assumes -----
    // q36 IVF, q60 PQ, and q68 SemDeDup all TAKE a coarse quantizer as
    // given (every-125th-vector); this is the op that trains one. Two
    // fixed Lloyd iterations (fixed so the oracle is expressible as
    // plain CTEs — a convergence loop is the same plan repeated):
    // assignment scans the corpus against K BROADCAST centroids and
    // argmins via ONE map-side-combining min_by aggregate over the
    // native l2_sq kernel (shuffle = one row per vector, never
    // vector×centroid); the centroid update explodes assigned vectors
    // to (cluster, dim, value) and partial-aggregates, so its shuffle
    // is K×D running sums regardless of corpus size — textbook
    // distributed Lloyd's. At 100 TB: per-iteration cost is one corpus
    // scan + an O(K·D) shuffle; the corpus is cached here because three
    // passes re-read it (assignment ×2, update ×1) — on a cluster
    // that's persist-to-executors or recompute-from-parquet, same plan.
    // Centroid means round to 6 dp in BOTH engines, which pins the
    // ROUNDING op (CrossRound's IEEE fold) but not the pre-round sum:
    // avg() still sums in engine-specific order, so a 1-ulp input
    // difference CAN in principle straddle a floor boundary and flip
    // an iteration-2 centroid — unlike the avgMoney/sumMoney
    // exact-integer path, which is order-independent outright. The
    // residual risk is ulp-at-boundary only (none of the twelve fuzz
    // seeds or the tie-generator sweep has hit it); the order-pinned
    // fix — per-(cid, dim) sorted fold, bounded when K ∝ N keeps
    // cluster size flat — is documented here as the escalation path
    // rather than paid up front, since q72 fixes K=8 and a sorted
    // collect over N/K elements is NOT bounded under that demo
    // contract. Distances then fold bit-identically (left-to-right,
    // all-double) and ties break on the lowest centroid id.
    "q72_kmeans_train" -> { (s, dir) =>
      kmeansAssignments(s, dir).orderBy(col("vec_id"))
    },


    // ----- int8 scalar quantization of the embedding column -----
    // The SQ-8 compression step vector indexes apply before ANN — the
    // cheaper sibling of q60's PQ. Per-dimension [min, max] over the
    // corpus (one map-side-combinable agg onto 64 groups, broadcast back
    // as two 64-element arrays — corpus-size-independent), then a
    // map-only affine quantize to one byte per dimension. Codes are
    // exact cross-engine: float→double widening is exact, min/max are
    // selections (no summation order), and the quantize chain
    // (v−mn)·(255/(mx−mn))+0.5 → floor is the same correctly-rounded
    // IEEE sequence in both engines (q84's argument). Reconstruction SSE
    // folds index-ordered (q74's trick — the array IS the order), so it
    // is bit-identical too; rounded for presentation only.
    "q87_embed_quantize" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id",
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      val stats = e.select(posexplode($"v").as(Seq("pos", "x")))
        .groupBy($"pos").agg(min($"x").as("mn"), max($"x").as("mx"))
      val arrs = stats.agg(
        expr("transform(sort_array(collect_list(struct(pos, mn))), s -> s.mn)")
          .as("mns"),
        expr("transform(sort_array(collect_list(struct(pos, mx))), s -> s.mx)")
          .as("mxs"))
      e.crossJoin(broadcast(arrs))
        .withColumn("codes", expr(
          """transform(sequence(1, size(v)), i ->
               cast(case when element_at(mxs, i) > element_at(mns, i)
                 then floor((element_at(v, i) - element_at(mns, i))
                        * (cast(255.0 as double)
                           / (element_at(mxs, i) - element_at(mns, i)))
                        + cast(0.5 as double))
                 else cast(0.0 as double) end as int))"""))
        .withColumn("errs", expr(
          """transform(sequence(1, size(v)), i ->
               element_at(v, i)
                 - (element_at(mns, i)
                    + cast(element_at(codes, i) as double)
                      * ((element_at(mxs, i) - element_at(mns, i))
                         / cast(255.0 as double))))"""))
        .select($"vec_id",
          expr("aggregate(codes, cast(0 as bigint), (a, c) -> a + cast(c as bigint))")
            .as("code_sum"),
          element_at($"codes", 1).as("c0"),
          element_at($"codes", 2).as("c1"),
          CrossRound.r(
            expr("aggregate(errs, cast(0.0 as double), (a, x) -> a + x * x)"), 6)
            .as("sse"))
        .orderBy($"vec_id")
    },


    // ----- cluster purity: label-based evaluation of the quantizer -----
    // The evaluation step after clustering: how well do q72's k-means
    // cells align with the embedding labels (the one schema column no
    // operator consumed)? Per cluster: size, majority label (tie →
    // lowest label), and purity = majority fraction — the standard
    // external clustering metric. Reuses the EXACT assignment q72
    // reports ([[kmeansAssignments]]); after it, everything is integer
    // counting over a #clusters × #labels relation (bounded: 8 × 10),
    // one equality join on vec_id and two tiny aggregates — nothing
    // here grows with the corpus beyond the assignment pass itself.
    "q95_cluster_purity" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val a = kmeansAssignments(s, dir).select($"vec_id", $"cluster")
      val cl = a.join(t.embeddings.select($"vec_id", $"label"), "vec_id")
        .groupBy($"cluster", $"label").agg(count(lit(1)).as("n"))
      cl.groupBy($"cluster")
        .agg(sum($"n").as("n_vecs"),
          min_by(struct($"label", $"n"), struct(-$"n", $"label")).as("top"))
        .select($"cluster", $"n_vecs",
          $"top.label".as("top_label"), $"top.n".as("n_top"),
          CrossRound.r($"top.n".cast("double") / $"n_vecs", 4).as("purity"))
        .orderBy($"cluster")
    },


    // ----- label cohesion/separation: is the embedding space usable? -----
    // The embedding-quality gate run before any similarity-based
    // curation (ANN dedup, semantic clustering): per label, how tight
    // is the class (MEDIAN member→centroid L2², not mean — the median
    // is selection over bit-identical doubles, order-free, where a
    // mean would re-open the summation-order ulp hazard q72 documents)
    // and how far is the nearest other class (min inter-centroid L2²,
    // tie → lowest label). separation = nearest/intra: > 1 means
    // classes are tighter than their spacing. Centroids follow q72's
    // update-step contract (per-dim avg rounded 6 dp); member
    // distances are one broadcast join + the codegen'd l2_sq kernel;
    // the centroid×centroid relation is #labels² — bounded, broadcast.
    // At 100 TB: one corpus pass for centroids, one for distances,
    // exact median per label via q17c's two-pass rank selection if a
    // label outgrows one aggregation buffer.
    "q99_label_cohesion" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"label", $"vec_id", $"embedding")
      val cent = e
        .select($"label",
          posexplode($"embedding".cast("array<double>")).as(Seq("dim", "v")))
        .groupBy($"label", $"dim").agg(CrossRound.r(avg($"v"), 6).as("m"))
        .groupBy($"label")
        .agg(array_sort(collect_list(struct($"dim", $"m"))).as("pm"))
        .select($"label".as("clabel"), expr("transform(pm, x -> x.m)").as("ce"))
      val intra = e.join(broadcast(cent), $"label" === $"clabel")
        .select($"label",
          graft.functions.GraftFunctions.l2Sq($"embedding", $"ce").as("d"))
        .groupBy($"label")
        .agg(count(lit(1)).as("n_vecs"),
          expr("percentile(d, 0.5)").as("med_raw"))
      val near = cent.select($"clabel".as("la"), $"ce".as("ca"))
        .crossJoin(broadcast(cent.select($"clabel".as("lb"), $"ce".as("cb"))))
        .filter($"la" =!= $"lb")
        .select($"la",
          graft.functions.GraftFunctions.l2Sq($"ca", $"cb").as("dc"), $"lb")
        .groupBy($"la")
        .agg(min_by(struct($"lb", $"dc"), struct($"dc", $"lb")).as("nb"))
        .select($"la".as("label"), $"nb.lb".as("nearest_label"),
          $"nb.dc".as("dc_raw"))
      intra.join(broadcast(near), "label")
        .select($"label", $"n_vecs",
          CrossRound.r($"med_raw", 4).as("intra_d2"),
          $"nearest_label",
          CrossRound.r($"dc_raw", 4).as("inter_d2"),
          CrossRound.r($"dc_raw" / $"med_raw", 4).as("separation"))
        .orderBy($"label")
    },


    // ----- hard-negative mining: top-k nearest with a DIFFERENT label -----
    // The contrastive-training counterpart of q25: for each anchor
    // vector, the 3 most cosine-similar vectors whose label differs —
    // the "hard negatives" an embedding trainer pairs with each anchor.
    // Uses the partial-aggregating TopKAgg (q25b's scale shape: each map
    // task keeps ≤ k candidates per anchor, so the shuffle is
    // O(anchors × k), never the score matrix); the negative's label
    // rides back via one bounded join (anchors × k rows, broadcast).
    "q102_hard_negatives" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val topk = udaf(new graft.functions.TopKAgg(3))
      val e = t.embeddings.select($"vec_id", $"label", $"embedding")
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"label".as("qlabel"),
          $"embedding".as("qe"))
      val top = e.crossJoin(broadcast(q))
        .filter($"label" =!= $"qlabel")
        .withColumn("cos",
          graft.functions.GraftFunctions.cosineSim($"embedding", $"qe"))
        .groupBy($"query_id")
        .agg(topk($"vec_id", $"cos").as("top"))
        .select($"query_id", posexplode($"top").as(Seq("i", "sv")))
        .select($"query_id", ($"i" + 1).cast("int").as("rank"),
          $"sv.vec_id".as("vec_id"), $"sv.cos".as("cos"))
      e.select($"vec_id", $"label")
        .join(broadcast(top), "vec_id")
        .select($"query_id", $"rank", $"vec_id", $"label",
          CrossRound.r($"cos", 4).as("cos"))
        .orderBy($"query_id", $"rank")
    },


    // ----- Johnson–Lindenstrauss projection + distortion audit -----
    // The dimensionality-reduction step in front of a 100 TB ANN stack:
    // 64-float embeddings compress map-only to 16 hyperplane
    // projections (the SAME native [[graft.functions.HyperplaneDots]]
    // kernel q26/q33 sign for LSH bits — here the real-valued dots ARE
    // the reduced vector, random-projection JL), and the audit grades
    // the compression the q123 way: over the deterministic
    // consecutive-id pair sample, cosine in the projected space vs
    // exact cosine, per-pair |error| plus the corpus mean error via the
    // order-independent scaled-integer mean. Projection is zero-shuffle
    // (one codegen'd kernel per row); the pair sample is one
    // equality join on a derived key (vec_id+1) — never a window over
    // a global vector order.
    "q137_jl_projection" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      def dot(x: String, y: String): Column = expr(
        s"aggregate(zip_with($x, $y, (p, q) -> p * q), " +
          "CAST(0 AS DOUBLE), (acc, e) -> acc + e)")
      val proj = t.embeddings.repartition($"vec_id")
        .select($"vec_id", $"embedding".as("v"),
          graft.functions.GraftFunctions.hyperplaneDots($"embedding", 16)
            .as("dots"))
      val a = proj.select($"vec_id".as("vec_a"), $"v".as("va"),
        $"dots".as("da"))
      val b = proj.select(($"vec_id" - 1L).as("vec_a"),
        $"vec_id".as("vec_b"), $"v".as("vb"), $"dots".as("db"))
      val per = a.join(b, "vec_a")
        .withColumn("cos_full", CrossRound.r(
          graft.functions.GraftFunctions.cosineSim($"va", $"vb"), 6))
        .withColumn("cos_proj", CrossRound.r(
          dot("da", "db") / (sqrt(dot("da", "da")) * sqrt(dot("db", "db"))),
          6))
        .withColumn("err", CrossRound.r(abs($"cos_full" - $"cos_proj"), 6))
        .select($"vec_a", $"vec_b", $"cos_full", $"cos_proj", $"err")
        .cache() // read twice: per-pair rows + the 1-row mean (q123's shape)
      val thr = per.agg(CrossRound.r(
        sum(floor($"err" * 1000000 + 0.5)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          / (count(lit(1)) * 1000000.0), 6).as("mean_err"))
      per.crossJoin(broadcast(thr)).orderBy($"vec_a")
    },


    // ----- embedding-space outlier pruning (cluster-distance z-filter) -----
    // The embedding-quality sibling of the text-side Gopher rules: a
    // curation run drops vectors that sit far outside their own
    // cluster before any similarity-based step trusts them (mis-encoded
    // docs, empty-input embeddings, wrong-modality rows — the
    // SemDeDup-adjacent hygiene pass). Quantizer = the family's shared
    // every-125th-vector coarse codebook (q36/q60/q68 contract, so the
    // oracle reproduces assignment bit-for-bit); each vector's
    // distance-to-own-centroid is compared against its CLUSTER MEDIAN
    // distance: keep iff d ≤ 4·median. Median, not mean — selection/
    // interpolation over bit-identical doubles is summation-order-free
    // (the q99 argument), and 4·med is an EXACT IEEE product (scaling
    // by a power of two), so the keep verdict has no rounding seam at
    // all; the reported ratio is one correctly-rounded divide. Shapes
    // at 100 TB: assignment is one map-side pass against broadcast
    // centroids folded by a map-side-combining min_by (q72's shape —
    // one row per vector shuffles, never vector×centroid); cluster
    // stats are a K-row aggregate broadcast back; no windows, no
    // collects, nothing corpus-sized on the driver. CAVEAT (ADVICE r13
    // #2): the FIXTURE codebook here has no size cap — K = n/125, so
    // the broadcast grows with the corpus and per-row routing is
    // O(n/125), i.e. O(n²/125) total. A production run swaps in the
    // fixed-K [[trainedCodebook]] artifact (exactly what q36b/q60b/
    // q141b/q142 consume — K constant, ~32 KB broadcast, linear total
    // work) without changing any other part of this plan; the fixture
    // convention stays here because this query's oracle pins it.
    "q140_embedding_outliers" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = e.filter($"vec_id" % 125 === 0)
        .select($"vec_id".as("cid"), $"embedding".as("ce"))
      // Explicit-width repartition of the probe side: the broadcast
      // join (and the n×K distance projection above it) runs at the
      // PROBE side's parallelism, and the embeddings table is ONE
      // parquet split at every witness size — without this the scoring
      // serializes onto a single core (the q127 lesson, re-caught live
      // by the 40× witness on this very query; 80k×640 distances on
      // one task). Explicit numPartitions so AQE cannot coalesce it
      // back.
      // cache(): asg feeds TWO plan branches (the K-row cluster stats
      // and the per-vector verdict join), and with nothing above the
      // repartition for ReuseExchange to share — uncached, the
      // dominant distance stage runs twice (the q72 corpus-cache
      // pattern; one row per vector, bounded).
      //
      // Assignment is IN-ROW via [[graft.functions.L2ArgMinCid]]
      // (VERDICT r17 next-round #3): the crossJoin → min_by(struct)
      // chain planned as a sort-based aggregate buffering n×K rows —
      // the shape that spilled 75 GB at q36c's 16.9M cap, and this
      // query's K grows ∝ n/125. One compiled scan per row picks the
      // cid; the winner's distance is recomputed by ONE l2Sq against
      // the cid's centroid (broadcast K-row join) — the same
      // left-to-right double fold the kernel ran, so d is
      // bit-identical to the old min(d).
      val asg = e.repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cents.agg(
          array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"kcb", lit(null)))
        .drop("kcb")
        .join(broadcast(cents), "cid")
        .withColumn("d",
          graft.functions.GraftFunctions.l2Sq($"embedding", $"ce"))
        .select($"vec_id", $"cid", $"d")
        .cache()
      val st = asg.groupBy($"cid")
        .agg(count(lit(1)).as("n_members"),
          expr("percentile(d, 0.5)").as("med"))
      asg.join(broadcast(st), "cid")
        .select($"vec_id", $"cid", $"n_members",
          CrossRound.r($"d", 4).as("d2"),
          CrossRound.r($"med", 4).as("med_d2"),
          when($"med" > 0, CrossRound.r($"d" / $"med", 4)).as("ratio"),
          ($"d" <= lit(4.0) * $"med").as("keep"))
        .orderBy($"vec_id")
    },

    // ----- embedding-outlier pruning over the TRAINED codebook -----
    // q140's cluster-median rule with its unbounded fixture quantizer
    // (the ADVICE r13 #2 caveat: K = n/125, O(n²/125) total routing)
    // replaced by the persisted K=64 [[PipelineQueries.trainedCodebook]]
    // — the last fixture-codebook consumer without a trained twin, so
    // every member of the q36/q60/q68/q140/q141 seam family now has
    // one. Same shapes: one map-side assignment pass against a ~32 KB
    // broadcast folded by min_by, a K-row median aggregate broadcast
    // back, the exact-IEEE 4·median verdict. Trained centroids are
    // cluster CENTERS rather than arbitrary member vectors, so the
    // median distances this verdict compares against are the honest
    // within-cluster spread (a fixture "centroid" is itself a member
    // at d = 0, which inflates its own cluster's tail ratio).
    "q140b_outliers_trained" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = trainedCodebook(s, dir).select($"cid", $"ce")
      // In-row kernel assignment + winner-distance recompute — see
      // q140 above (same rewrite, VERDICT r17 next-round #3).
      val asg = e.repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cents.agg(
          array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"kcb", lit(null)))
        .drop("kcb")
        .join(broadcast(cents), "cid")
        .withColumn("d",
          graft.functions.GraftFunctions.l2Sq($"embedding", $"ce"))
        .select($"vec_id", $"cid", $"d")
        .cache()
      val st = asg.groupBy($"cid")
        .agg(count(lit(1)).as("n_members"),
          expr("percentile(d, 0.5)").as("med"))
      asg.join(broadcast(st), "cid")
        .select($"vec_id", $"cid", $"n_members",
          CrossRound.r($"d", 4).as("d2"),
          CrossRound.r($"med", 4).as("med_d2"),
          when($"med" > 0, CrossRound.r($"d" / $"med", 4)).as("ratio"),
          ($"d" <= lit(4.0) * $"med").as("keep"))
        .orderBy($"vec_id")
    },

    // ----- incremental IVFPQ index maintenance (CDC delta merge) -----
    // The index LIFECYCLE piece the ANN family was missing: build
    // (ivfpqIndex), ingest (q141b), query (q142) — and now MAINTAIN.
    // q81's CDC shape applied to vectors: the corpus partition
    // (first 90% of the id space, integer-cut like q81) has a PERSISTED
    // index built under a codebook trained BEFORE the delta existed
    // (the frozen-codebook contract — training on data that includes
    // the delta would silently re-route existing cells, which is
    // exactly the bug ADVICE r13 #1 flagged for q141's live codebook
    // read); the delta batch routes through that same frozen codebook
    // — one O(K)-per-row map-side pass over ONLY the new vectors, no
    // index-side rebuild, no corpus re-read — and merges into the cell
    // ledger. Output = one row per occupied cell with corpus/delta
    // provenance counts, so the oracle checks both that delta routing
    // matches a from-scratch routing AND that no corpus cell moved.
    // At 100 TB: maintenance cost is O(delta × K); the index partition
    // is untouched bytes on disk (a real deployment appends the delta
    // rows to the codes table).
    "q143_index_delta_maintain" -> { (s, dir) =>
      import s.implicits._
      val e = embGlob(s, dir)
      val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
      val idx = ivfpqIndexBefore(s, dir, cut)
      val cb = trainedCodebookBefore(s, dir, cut)
        .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))
      val delta = pqRoute(e.filter($"vec_id" >= cut)
          .repartition(Par.width(s), $"vec_id").crossJoin(broadcast(cb)))
        .select($"vec_id", $"cid",
          split($"pcode", "-").cast("array<long>").as("codes"))
      idx.withColumn("src", lit(0))
        .unionByName(delta.withColumn("src", lit(1)))
        .groupBy($"cid", $"codes")
        .agg(sum(when($"src" === 0, 1L).otherwise(0L)).as("n_corpus"),
             sum(when($"src" === 1, 1L).otherwise(0L)).as("n_delta"),
             min($"vec_id").as("canonical_vec"))
        .select($"cid",
          array_join($"codes".cast("array<string>"), "-").as("pcode"),
          $"n_corpus", $"n_delta", $"canonical_vec")
        .orderBy($"cid", $"pcode")
    },

    // ----- CDC deletes + compaction (the other half of q143) -----
    // q143 merges INSERTS only; a real index ledger also takes delete
    // tombstones, or state grows forever (VERDICT r14 #1 — the same
    // gap q81→q143 closed for inserts). CDC shape: the delta batch
    // carries op ∈ {upsert, delete} — upserts are the new ids
    // (vec_id ≥ cut, q143's partition), tombstones target EXISTING
    // corpus rows (the deterministic vec_id % 13 = 5 stripe, so the
    // oracle reproduces the op assignment and the deletes land across
    // cells rather than in one). Tombstones are resolved to their
    // (cid, pcode) by routing the tombstoned vectors through the SAME
    // frozen codebook that built the index — routing is deterministic
    // under a frozen codebook (q143's contract), so the computed cell
    // equals the stored cell without touching a single index byte:
    // delete-merge cost is O(|tombstones| × K), insert-merge is
    // O(|upserts| × K), i.e. O(delta) total, never O(index).
    // Tombstone counts subtract from the per-cell ledger, emptied
    // cells drop out (COMPACTION — the n_live > 0 filter), and cells
    // born by the delta appear via the full-outer merge. q143's
    // canonical_vec is deliberately ABSENT here: a min-witness cannot
    // be maintained from cell-level aggregates when the minimum itself
    // is tombstoned — recovering it needs the per-row codes table
    // (which a real deployment has; the COUNT ledger is what maintains
    // in O(delta)). Oracle = from-scratch routing of the SURVIVING set
    // grouped to the same ledger — the maintained state must equal the
    // rebuilt state exactly.
    "q144_index_delete_compact" -> { (s, dir) =>
      import s.implicits._
      val e = embGlob(s, dir)
      val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
      val idx = ivfpqIndexBefore(s, dir, cut)
      val cb = trainedCodebookBefore(s, dir, cut)
        .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))
      def routed(part: DataFrame): DataFrame =
        pqRoute(part.repartition(Par.width(s), $"vec_id").crossJoin(broadcast(cb)))
          .select($"cid", split($"pcode", "-").cast("array<long>").as("codes"))
      val dels = routed(e.filter($"vec_id" < cut && $"vec_id" % 13 === 5))
        .groupBy($"cid", $"codes").agg(count(lit(1)).as("n_del"))
      val ins = routed(e.filter($"vec_id" >= cut))
        .groupBy($"cid", $"codes").agg(count(lit(1)).as("n_ins"))
      idx.groupBy($"cid", $"codes").agg(count(lit(1)).as("n0"))
        .join(dels, Seq("cid", "codes"), "left")
        .na.fill(0L, Seq("n_del"))
        .withColumn("n_corpus", $"n0" - $"n_del")
        .select($"cid", $"codes", $"n_corpus")
        .join(ins, Seq("cid", "codes"), "full_outer")
        .na.fill(0L, Seq("n_corpus", "n_ins"))
        .withColumn("n_live", $"n_corpus" + $"n_ins")
        .filter($"n_live" > 0)
        .select($"cid",
          array_join($"codes".cast("array<string>"), "-").as("pcode"),
          $"n_corpus", $"n_ins".as("n_delta"), $"n_live")
        .orderBy($"cid", $"pcode")
    },

    // ----- storage-level index rewrite (deletes+upserts APPLIED) -----
    // q144 computes the maintained ledger as a VIEW; a production
    // index is a persisted table that gets REWRITTEN (VERDICT r15 #4).
    // This query applies the same CDC batch (tombstones = the
    // vec_id % 13 = 5 stripe, upserts = vec_id ≥ cut) to the
    // cell-PARTITIONED storage artifact ([[ivfpqIndexPartBefore]]:
    // one partition directory per inverted list) as an actual table
    // rewrite, then SERVES the ledger from the rewritten bytes. The
    // rewrite is Spark's storage-level delete-by-key unit — dynamic
    // partition overwrite: tombstones and upserts are routed through
    // the frozen codebook (deterministic, q143's contract) to find
    // the TOUCHED cells; only those cells' rows are read (partition
    // pruning on cid), anti-joined against the tombstone ids, unioned
    // with the upserts, and written back over ONLY those partitions.
    // Untouched lists' files are never opened — rewrite cost is
    // O(touched cells' rows + delta×K routing), never O(index) — and
    // a touched cell whose rows all died is COMPACTED away (its
    // partition directory is dropped; dynamic overwrite alone would
    // leave the stale files). The oracle is q144's from-scratch twin
    // verbatim: the ledger served from the rewritten storage must
    // equal a DuckDB routing of the surviving set — the strongest
    // statement that the bytes on disk are the maintained index.
    "q153_index_rewrite" -> { (s, dir) =>
      import s.implicits._
      val e = embGlob(s, dir)
      val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
      rewrittenPartIndex(s, dir, cut)
        .groupBy($"cid", $"codes")
        .agg(sum(when($"vec_id" < cut, 1L).otherwise(0L)).as("n_corpus"),
          sum(when($"vec_id" >= cut, 1L).otherwise(0L)).as("n_delta"),
          count(lit(1)).as("n_live"))
        .select($"cid",
          array_join($"codes".cast("array<string>"), "-").as("pcode"),
          $"n_corpus", $"n_delta", $"n_live")
        .orderBy($"cid", $"pcode")
    },

    // ----- ANN top-k SERVED from the rewritten storage -----
    // The other half of VERDICT r15 #4's "serve the next query from
    // the rewritten table": q153 proves the bytes equal the maintained
    // ledger; q157 is the SERVING query a vector store actually runs
    // over them — route each query through the frozen cut-trained
    // codebook, probe the policy's ⌈K/10⌉ nearest lists of the
    // REWRITTEN cell-partitioned table (the probed cells are the
    // partition keys, so the scan prunes to the probed directories),
    // exact-rerank the candidates' full vectors from the base table.
    // Tombstoned rows can never surface (they are no longer in the
    // bytes — deleted by the q153 rewrite, not filtered at query
    // time), and upserts are servable immediately. The oracle mirrors:
    // q144's from-scratch index chain restricted to survivors, the
    // q36b-style query routing and (l2, vec_id) ranking.
    "q157_ann_serve_rewritten" -> { (s, dir) =>
      import s.implicits._
      val e = embGlob(s, dir)
      val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
      val idx = rewrittenPartIndex(s, dir, cut).select($"vec_id", $"cid")
      val cents = trainedCodebookBefore(s, dir, cut).select($"cid", $"ce")
      val np = cents.agg(count(lit(1)).as("nl"))
        .select(AnnPolicy.scanCeilCol("nl", AnnPolicy.IvfScanDiv,
          AnnPolicy.IvfNprobeFloor).as("nprobe"))
      val qw = Window.partitionBy($"query_id").orderBy($"qd", $"cid")
      val q = e.filter($"vec_id" < annNq(s))
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
        .crossJoin(broadcast(cents))
        .withColumn("qd", graft.functions.GraftFunctions.l2Sq($"qe", $"ce"))
        .withColumn("qrank", row_number().over(qw))
        .crossJoin(broadcast(np))
        .filter($"qrank" <= $"nprobe")
        .select($"query_id", $"qe", $"cid")
      val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
      idx.join(broadcast(q), Seq("cid"))
        .filter($"vec_id" =!= $"query_id")
        .join(e, "vec_id")
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id", CrossRound.r($"l2", 4).as("l2"))
        .orderBy($"query_id", $"rank")
    },

    // ----- drift-triggered retrain gate (frozen-codebook rot alarm) -----
    // The frozen-codebook contract (q143/q144) is correct for one
    // delta but rots under distribution shift — a shifted delta routes
    // into cells whose centroids no longer describe it and recall
    // decays silently (VERDICT r14 #2). The standard audit is q134's
    // KL machinery applied to the CELL-OCCUPANCY histogram: the delta
    // batch's routing distribution against the corpus ledger's, with
    // add-one smoothing on the corpus side over the K trained cells
    // (the delta can land in cells the corpus left empty; without
    // smoothing one such cell makes the KL infinite). Every term
    // (c_d/n_d)·ln((c_d/n_d)·((n_c+K)/(c_c+1))) is exact-integer-fed
    // with a fixed op order (two divides, one multiply, one ln, one
    // multiply — q134's argument) and the sum is the order-independent
    // scaled-integer form at 10¹² (q117's pattern). The GATE threshold
    // is not a magic constant: 2·n·KL is asymptotically χ²_{K-1} under
    // no-drift, so the noise floor is (K-1)/(2·n_d) and the gate fires
    // at [[AnnPolicy.DriftGateFactor]]× that — it ADAPTS to the delta
    // size (tiny deltas get a wide band, 100 TB deltas a tight one).
    // Both sides of the compare are 6-dp rounded with identical op
    // order, so the boolean crosses engines exactly. Inputs: one
    // O(delta×K) routing pass + two cell-count aggregates (K-row and
    // delta-cell-row frames) — nothing corpus-sized moves.
    "q145_index_drift_gate" -> { (s, dir) =>
      import s.implicits._
      val e = embGlob(s, dir)
      val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L
      val idx = ivfpqIndexBefore(s, dir, cut)
      val cbDf = trainedCodebookBefore(s, dir, cut)
      val cb = cbDf.agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))
      val cd = pqRoute(e.filter($"vec_id" >= cut)
          .repartition(Par.width(s), $"vec_id").crossJoin(broadcast(cb)))
        .groupBy($"cid").agg(count(lit(1)).as("c_d"))
        .cache()
      val cc = idx.groupBy($"cid").agg(count(lit(1)).as("c_c"))
      val scal = idx.agg(count(lit(1)).as("n_c"))
        .crossJoin(cbDf.agg(count(lit(1)).as("k")))
        .crossJoin(cd.agg(sum($"c_d").cast("long").as("n_d"),
          count(lit(1)).as("n_cells_delta")))
      cd.join(cc, Seq("cid"), "left")
        .na.fill(0L, Seq("c_c"))
        .crossJoin(broadcast(scal))
        .withColumn("a", $"c_d".cast("double") / $"n_d".cast("double"))
        .withColumn("b", ($"n_c" + $"k").cast("double") /
          ($"c_c" + lit(1L)).cast("double"))
        .withColumn("term", $"a" * log($"a" * $"b"))
        .groupBy($"n_c", $"n_d", $"k", $"n_cells_delta")
        .agg(sum(floor($"term" * 1000000000000.0 + 0.5)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("ts"))
        .select($"n_c".as("n_corpus"), $"n_d".as("n_delta"), $"k",
          $"n_cells_delta",
          CrossRound.r($"ts".cast("double") / 1000000000000.0, 6).as("kl"),
          CrossRound.r(
            (lit(AnnPolicy.DriftGateFactor) * ($"k" - 1L)).cast("double") /
              (lit(2L) * $"n_d").cast("double"), 6).as("noise_floor"))
        .withColumn("retrain", $"kl" > $"noise_floor")
    },

    // ----- SemDeDup over the TRAINED (cell-size-bounded) codebook -----
    // q68's two-level ⌈√K⌉ cosine routing with the fixture quantizer
    // replaced by a TRAINED codebook — but NOT the fixed-K one the
    // routing-style consumers (q36b/q60b/q140b/q141b/q142) share:
    // SemDeDup's verify stage costs Σ cell_size²/2, so a codebook that
    // stays at K=64 while the corpus grows makes the verify quadratic
    // (the round-14 40× witness MEASURED it: 20.4 s at 80k vectors vs
    // 2.2 s for the fixture's n/125 cells — caught pre-ship, the
    // q140/q141 discipline). The partition-style dial is
    // [[AnnPolicy.cellBoundedK]]: K = max(64, ⌈n/125⌉) trained
    // centroids ([[PipelineQueries.trainedCodebookCellBounded]]), so
    // cells stay ~125 vectors and the verify stays linear; coarse =
    // every step-th trained centroid (cid % step = 0 over the dense
    // 0..K-1 seed ids). Same 100 TB shapes as q68 (two bounded
    // broadcasts, one equality join on the coarse cell, the verify
    // self-join inside bounded fine cells).
    "q68b_semantic_dedup_trained" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = trainedCodebookCellBounded(s, dir).select($"cid", $"ce")
      val kdf = cents.agg(
        ceil(sqrt(count(lit(1)).cast("double"))).cast("long").as("step"))
      val coarse = cents.crossJoin(broadcast(kdf))
        .filter($"cid" % $"step" === 0)
        .select($"cid".as("gid"), $"ce".as("ge"))
      // Routing is IN-ROW via the cosine-mode [[graft.functions
      // .L2ArgMinCid]] kernel (VERDICT r17 next-round #3): the
      // previous crossJoin/equality-join → max_by(struct) chains
      // planned as sort-based aggregates buffering n×C (coarse), K×C
      // (cell) and n×(K/C) (fine) struct rows — exactly the plan
      // shape q36c abandoned after its 16.9M-cap run spilled 75 GB,
      // and q68b's K grows ∝ n/125 so it WOULD have hit that wall.
      // Now each level is one compiled scan per row over a broadcast
      // array (coarse: C entries; fine: the row's own cell selected
      // by the gid restriction), zero shuffle, zero aggregation —
      // same (cos, -id) tie order, so assignments are bit-identical
      // and the oracle's max_by CTEs grade unchanged.
      val coarseArr = coarse.agg(array_sort(
        collect_list(struct($"gid".as("cid"), $"ge".as("ce")))).as("ca"))
      val fineCell = cents.crossJoin(broadcast(coarseArr))
        .withColumn("gid", graft.functions.GraftFunctions
          .cosArgmaxCid($"ce", $"ca", lit(null)))
        .select($"gid", $"cid", $"ce")
      val vCell = e.repartition(Par.width(s), $"vec_id").crossJoin(broadcast(coarseArr))
        .withColumn("gid", graft.functions.GraftFunctions
          .cosArgmaxCid($"embedding", $"ca", lit(null)))
        .select($"gid", $"vec_id", $"embedding")
      val fineArr = fineCell.agg(array_sort(
        collect_list(struct($"gid", $"cid", $"ce"))).as("fa"))
      val assign = vCell.crossJoin(broadcast(fineArr))
        .withColumn("cid", graft.functions.GraftFunctions
          .cosArgmaxCid($"embedding", $"fa", array($"gid")))
        .select($"vec_id", $"cid", $"embedding")
      val clustered = assign.cache()
      val dups = clustered.as("a").join(clustered.as("b"),
          $"a.cid" === $"b.cid" && $"a.vec_id" < $"b.vec_id")
        .filter(graft.functions.GraftFunctions
          .cosineSim($"a.embedding", $"b.embedding") >= 0.4)
        .select($"b.vec_id".as("vec_id")).distinct()
      clustered.select($"vec_id", $"cid")
        .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
        .select($"vec_id", $"cid", coalesce(!$"dup", lit(true)).as("keep"))
        .orderBy($"vec_id")
    },

    // ----- PREDICATE-FILTERED ANN (constrained search, q36b + filter) -----
    // "Nearest neighbors of q AMONG rows WHERE label = q.label" — the
    // serving shape every production vector store has to solve (RAG
    // with a tenant/source/language predicate). The naive plans both
    // fail: post-filtering a fixed-width probe starves under a
    // selective predicate (k survivors of ~nprobe/L·m matching
    // candidates), and always pre-filtering forfeits the index. This
    // query is the policy plan: the filter is applied INSIDE the
    // probed inverted lists (the index prunes, the predicate prunes,
    // same scan), and the probe WIDTH adapts to the predicate's
    // cardinality via [[AnnPolicy.filteredNprobe]] — integer counts
    // in, integer width out, capped at L where it degenerates to an
    // exact full scan of the matching rows (the low-cardinality
    // brute-force switch). Cardinalities come from a 10-row label
    // histogram (broadcast), never a driver collect; the label rides
    // the routing ledger so the candidate join needs no base-table
    // lookup. At sf0.01 (m≈50, L=64) every query sits past the cap —
    // the oracle grades the EXACT branch; at sf0.1 (m≈200) the widened
    // 32-list probe; at the 20k witness (m≈2000) the base 7-list probe
    // — all three policy regimes are oracle- or witness-covered.
    "q147_ann_filtered" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding", $"label")
      val cents = trainedCodebook(s, dir).select($"cid", $"ce")
      // In-row kernel assignment (the q140 rewrite, VERDICT r17
      // next-round #3) — strictly simpler here: no distance rides the
      // ledger, so the winner needs no recompute join and embedding/
      // label stay on the row instead of being buffered through a
      // min_by struct.
      val asg = e.repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cents.agg(
          array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"kcb", lit(null)))
        .select($"vec_id", $"cid", $"embedding", $"label")
      val hist = e.groupBy($"label").agg(count(lit(1)).as("nm"))
      val nl = cents.agg(count(lit(1)).as("nl"))
      val qw = Window.partitionBy($"query_id").orderBy($"qd", $"cid")
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"),
          $"label".as("ql"))
        .join(broadcast(hist), $"ql" === hist("label")).drop("label")
        .crossJoin(broadcast(nl))
        .withColumn("np", AnnPolicy.filteredNprobeCol("nl", "nm"))
        .crossJoin(broadcast(cents))
        .withColumn("qd", graft.functions.GraftFunctions.l2Sq($"qe", $"ce"))
        .withColumn("qrank", row_number().over(qw))
        .filter($"qrank" <= $"np")
        .select($"query_id", $"qe", $"ql", $"cid".as("qcid"))
      val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
      asg.join(broadcast(q),
          $"cid" === $"qcid" && $"label" === $"ql" &&
          $"vec_id" =!= $"query_id")
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id",
          CrossRound.r($"l2", 4).as("l2"))
        .orderBy($"query_id", $"rank")
    },

    // ----- Matryoshka (truncated-prefix) routing IVF -----
    // The routing-cost dial real vector stores ship (MRL embeddings):
    // ROUTE in the first 16 of 64 dims — 4× less per-row routing
    // arithmetic and a 4× smaller routing broadcast, the costs that
    // dominate index build at 100 TB — then RERANK candidates in full
    // dimension, so the final ranking quality is bounded only by which
    // lists the truncated route picks. Assignment, probe and policy
    // are q36b's exactly, with every routing distance a 16-term
    // prefix fold (`slice` before the native kernel; the oracle's
    // range(1, 17) twin folds identically); the candidate rank is the
    // full 64-term fold. On THESE unstructured synthetic embeddings
    // the prefix carries only 1/4 of the variance, so the witness
    // measures what truncation costs when the MRL training assumption
    // is absent (recall vs exact full-dim truth, SCALE.md §10.10) —
    // on real matryoshka-trained embeddings the prefix is constructed
    // to carry the signal and the same plan keeps the 4× saving at
    // full recall. The oracle grades the rows exactly either way (the
    // index is exact BY CONTRACT given the truncated routing rule).
    "q151_ann_matryoshka" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      // Query-probe multiplier: EXPERIMENT knob only (MrlExp's dial
      // sweeps; the cap-degenerates-to-exact spec). Default 1 under
      // the structure guard — prefix routing only runs on corpora
      // whose prefix carries the signal, where the measured boost
      // knee is 1 (evidence/r16/mrl_exp.json: 0.996–1.000 at boost 1).
      val boost = s.conf.getOption("spark.graft.ann.matryoshkaBoost")
        .map(_.toLong).getOrElse(1L)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val pfx = AnnPolicy.MrlPrefixDims
      // STRUCTURE GUARD (VERDICT r16 #2): route the prefix only when
      // it carries ≥ [[AnnPolicy.MrlPrefixShareMin]] of the per-dim
      // variance on a bounded sample — otherwise fall back to q36b's
      // full-dim routing instead of silently serving the measured
      // 0.44-recall unstructured regime. One 64-row aggregate over ≤
      // MrlGuardSampleRows rows (constant work at any corpus size);
      // `spark.graft.ann.mrlRoute` ∈ {prefix, full} pins the branch
      // for experiment harnesses (MrlExp measures the forced-prefix
      // regime on unstructured corpora).
      //
      // The verdict is evaluated ONCE on the driver and memoized per
      // (session, dir, data fingerprint), then spliced into the plan
      // as a LITERAL (VERDICT r17 #1 / ADVICE r17): the previous
      // in-plan 1-row guard DataFrame was crossJoined into THREE
      // separate subplans (centroid, corpus, query sides), so the
      // sample aggregate ran three times per query — a per-corpus
      // CONSTANT paid per invocation — and aggregation-order
      // nondeterminism at the rounded threshold boundary could in
      // principle have let the branches disagree within one query.
      // One collected Boolean removes both. The oracle still computes
      // its own guard CTE; parity is untouched because both sides
      // round to 4dp before the threshold compare.
      val mrl: Boolean = s.conf.getOption("spark.graft.ann.mrlRoute") match {
        case Some("prefix") => true
        case Some("full") => false
        case _ => mrlGuardMemo.getOrElseUpdate(
          s"${s.sparkContext.applicationId}|$dir|" +
            PipelineQueries.dataFingerprint(dir, "embeddings"),
          e.filter($"vec_id" < AnnPolicy.MrlGuardSampleRows)
            .select(posexplode($"embedding").as(Seq("dim", "v")))
            .groupBy($"dim").agg(var_pop($"v").as("vd"))
            .agg((CrossRound.r(
              sum(when($"dim" < pfx, $"vd").otherwise(lit(0.0))) / sum($"vd"),
              4) >= AnnPolicy.MrlPrefixShareMin).as("mrl"))
            .first match {
              // On an empty/degenerate sample the var_pop/sum chain
              // yields NULL; the pre-memo in-plan guard treated a null
              // mrl as false (full-width route) via when($"mrl", ...) —
              // keep that, don't NPE (ADVICE r18).
              case r0 => if (r0.isNullAt(0)) false else r0.getBoolean(0)
            })
      }
      def pfxOf(c: Column): Column = if (mrl) slice(c, 1, pfx) else c
      val cents = trainedCodebook(s, dir).select($"cid", $"ce")
        .withColumn("ce16", pfxOf($"ce"))
      // Pre-slice the corpus prefix ONCE PER ROW before the routing
      // scan — slicing inside the kernel's array would allocate the
      // 16-element prefix once per (row, centroid) pair, K× redundant
      // work on exactly the hot path this plan exists to cheapen
      // (review finding, session 2; the centroid side was already
      // pre-sliced). Routing is IN-ROW via [[graft.functions
      // .L2ArgMinCid]] over the PREFIX-sliced centroid array (the r18
      // sweep); the full-width embedding stays on the row instead of
      // being buffered through a min_by struct.
      val asg = e.repartition(Par.width(s), $"vec_id")
        .withColumn("e16", pfxOf($"embedding"))
        .crossJoin(broadcast(cents.agg(array_sort(
          collect_list(struct($"cid", $"ce16".as("ce")))).as("kcb"))))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"e16", $"kcb", lit(null)))
        .select($"vec_id", $"cid", $"embedding")
      val np = cents.agg(count(lit(1)).as("nl"))
        .select(least($"nl",
          AnnPolicy.scanCeilCol("nl", AnnPolicy.IvfScanDiv,
            AnnPolicy.IvfNprobeFloor) * boost).as("nprobe"))
      val qw = Window.partitionBy($"query_id").orderBy($"qd", $"cid")
      val q = e.filter($"vec_id" < annNq(s))
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
        .withColumn("qe16", pfxOf($"qe"))
        .crossJoin(broadcast(cents))
        .withColumn("qd", graft.functions.GraftFunctions
          .l2Sq($"qe16", $"ce16"))
        .withColumn("qrank", row_number().over(qw))
        .crossJoin(broadcast(np))
        .filter($"qrank" <= $"nprobe")
        .select($"query_id", $"qe", $"cid".as("qcid"))
      val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
      asg.join(broadcast(q),
          $"cid" === $"qcid" && $"vec_id" =!= $"query_id")
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id", CrossRound.r($"l2", 4).as("l2"))
        .orderBy($"query_id", $"rank")
    },

    // ----- ANN index health stats (the maintainer's dashboard) -----
    // The operational readout the lifecycle family acts on: per-cell
    // live counts of the trained-codebook routing, each cell's share
    // of the corpus and its imbalance vs the uniform ideal, and a
    // GIANT-CELL flag — the §10.2 drift witness measured exactly this
    // pathology (a shifted delta collapsing into one frozen cell
    // balloons the per-query scan fraction from ~10.5% to 19.3%), and
    // a maintainer runs this after every q143/q144 merge and before
    // trusting a q145 no-fire verdict. The flag's threshold is
    // [[AnnPolicy.GiantCellFactor]]× the mean occupancy, compared in
    // INTEGER form (n_live·L vs factor·n) so the boolean crosses
    // engines with no float seam; the ratios are display columns
    // rounded the family's 4dp. Scale: one O(K)-per-row routing pass
    // (linear, the q36b shape) and a K-row aggregate — nothing
    // corpus-sized past the groupBy.
    "q148_ivf_index_stats" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = trainedCodebook(s, dir).select($"cid", $"ce")
      // In-row kernel routing (the r18 sweep) — map-only, one 64-entry
      // scan per row, no n×K aggregate buffer.
      val asg = e.repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cents.agg(
          array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"kcb", lit(null)))
        .select($"vec_id", $"cid")
      // LEFT join from the trained codebook: a trained cell that lost
      // every row (post-Lloyd re-assignment, CDC deletes, drift) must
      // appear as an n_live = 0 dashboard row, and the mean in the
      // giant-cell compare must divide by the TRAINED list count L —
      // counting only surviving cells would hide dead lists and
      // under-fire the flag exactly in the collapse scenario it exists
      // to catch (review finding, session 2).
      val cells = cents.select($"cid")
        .join(asg.groupBy($"cid").agg(count(lit(1)).as("nl")), Seq("cid"), "left")
        .select($"cid", coalesce($"nl", lit(0L)).as("n_live"))
      val tot = cells.agg(sum($"n_live").as("n"),
        count(lit(1)).as("nlists"))
      cells.crossJoin(broadcast(tot))
        .select($"cid", $"n_live",
          CrossRound.r($"n_live".cast("double") / $"n", 4).as("frac"),
          CrossRound.r($"n_live" * $"nlists" / $"n".cast("double"), 4)
            .as("imbalance"),
          ($"n_live" * $"nlists" >= lit(AnnPolicy.GiantCellFactor) * $"n")
            .as("is_giant"))
        .orderBy($"cid")
    },

    // ----- giant-cell LOCAL repair (q148 detects; this repairs) -----
    // VERDICT r15 #7: a fired giant-cell flag (the §10.2 unimodal
    // pathology — one frozen cell absorbing a whole drifted delta,
    // per-query scan +84%) should trigger a LOCAL repair, not the full
    // stratified retrain: re-seed and one-Lloyd-step ONLY the giant
    // cell's members, splitting the cell into S = ⌈n_live·L/n⌉
    // sub-cells (size over the uniform ideal n/L, integer ceiling
    // division so S crosses engines exactly), while every other cell's
    // routing — and therefore its ledger row — is untouched BY
    // CONSTRUCTION: only giant-cell members are ever re-assigned, so
    // the repair costs O(Σ giant sizes × S), never a corpus re-route.
    // Seeds are the first S members by vec_id (the q72 init
    // convention); the split chain is the q72-proven
    // assign → round(avg,6) update → re-assign parity machinery scoped
    // to the cell. Output: the repaired ledger — (cid, sub=0, n_live)
    // for untouched cells, (cid, sub=1..S, n_live) for split cells
    // (sub-cells emptied by the re-assignment drop out, as in the
    // oracle). On undrifted corpora no flag fires and the output IS
    // q148's live ledger at sub=0 — the detection arithmetic still
    // crosses engines on every corpus; the split path is exercised by
    // the RepairWitness drift run and a constructed-collapse spec.
    "q156_cell_repair" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.embeddings.select($"vec_id", $"embedding")
      val cents = trainedCodebook(s, dir).select($"cid", $"ce")
      // Cached (class-1 construction cache): the O(n·K) routing pass
      // feeds the cell counts AND every split-side branch (members →
      // seeds, a1, sub-centroid update, re-assignment) — without the
      // pin each branch re-runs the corpus routing, 5× the single most
      // expensive stage at 100 TB.
      val asg = e.repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cents.agg(
          array_sort(collect_list(struct($"cid", $"ce"))).as("kcb"))))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"kcb", lit(null)))
        .select($"vec_id", $"cid", $"embedding")
        .cache()
      val cells = cents.select($"cid")
        .join(asg.groupBy($"cid").agg(count(lit(1)).as("nl")),
          Seq("cid"), "left")
        .select($"cid", coalesce($"nl", lit(0L)).as("n_live"))
      val tot = cells.agg(sum($"n_live").as("n"), count(lit(1)).as("nlists"))
      val flagged = cells.crossJoin(broadcast(tot))
        .withColumn("is_giant",
          $"n_live" * $"nlists" >= lit(AnnPolicy.GiantCellFactor) * $"n")
        .withColumn("s_sub", expr("(n_live * nlists + n - 1) DIV n"))
        .select($"cid", $"n_live", $"is_giant", $"s_sub")
      // Members of flagged cells only, ranked by vec_id within the
      // cell — the flagged frame is K rows (broadcast), so this join
      // marks the giant membership without moving the corpus. Cached:
      // probed by seeds, both Lloyd passes, and the final count.
      val wv = Window.partitionBy($"cid").orderBy($"vec_id")
      val members = asg
        .join(broadcast(flagged.filter($"is_giant")
          .select($"cid", $"s_sub")), "cid")
        .withColumn("rk", row_number().over(wv))
        .cache()
      val seeds = members.filter($"rk" <= $"s_sub")
        .select($"cid", $"rk".cast("long").as("sub"),
          $"embedding".cast("array<double>").as("se"))
      // One Lloyd step INSIDE each giant cell: assign to seeds, 6-dp
      // rounded mean update (dim-sorted collect — kmUpdate's shape),
      // re-assign for the final sub-ledger. Ties (d, sub) both times.
      // Both assignment passes run IN-ROW through the compiled argmin
      // kernel (VERDICT r18 next-round #6): seeds/sub-centroids ride a
      // one-row broadcast array of STRUCT<gid = giant cell, cid = sub
      // id, ce>, and each member restricts the scan to its OWN cell via
      // gids = array(cid) — q36c's top-m pattern. The r18 form joined
      // members×seeds and buffered the n×seeds rows through a
      // min_by(… struct(d, sub)) sort-aggregate Exchange, twice; the
      // kernel folds the identical widened-double L2 with the identical
      // (d, sub)-ascending tie rule, so the assignments are
      // bit-identical and both groupBy(vec_id) shuffles are gone.
      val seedArr = seeds.agg(array_sort(collect_list(
        struct($"cid".as("gid"), $"sub".as("cid"), $"se".as("ce")))).as("sa"))
      val a1 = members.crossJoin(broadcast(seedArr))
        .withColumn("sub", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"sa", array($"cid")))
        .select($"vec_id", $"cid", $"sub", $"embedding")
      val subCents = a1
        .select($"cid", $"sub", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"cid", $"sub", $"dim")
        .agg(CrossRound.r(avg($"v"), 6).as("mm"))
        .groupBy($"cid", $"sub")
        .agg(array_sort(collect_list(struct($"dim", $"mm"))).as("pm"))
        .select($"cid", $"sub", expr("transform(pm, x -> x.mm)").as("sce"))
      val subArr = subCents.agg(array_sort(collect_list(
        struct($"cid".as("gid"), $"sub".as("cid"), $"sce".as("ce")))).as("pa"))
      val repaired = members.crossJoin(broadcast(subArr))
        .withColumn("sub", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"pa", array($"cid")))
        .groupBy($"cid", $"sub")
        .agg(count(lit(1)).as("n_live"))
      flagged.filter(!$"is_giant")
        .select($"cid", lit(0L).as("sub"), $"n_live")
        .unionByName(repaired)
        .orderBy($"cid", $"sub")
    },
  )

  /** The REWRITTEN cell-partitioned index, shared by q153 (ledger
    * serve) and q157 (ANN serve): builds [[PipelineQueries
    * .ivfpqIndexPartBefore]] if needed, then applies the CDC batch
    * (tombstones = the vec_id % 13 = 5 stripe, upserts = vec_id ≥ cut)
    * IN PLACE as a dynamic-partition-overwrite rewrite of only the
    * TOUCHED cells, dropping fully-emptied cells' directories
    * (compaction). Once per (session, dir, cut); returns the
    * post-rewrite table (vec_id, codes, cid). */
  /** File-level audit trail of the last rewrite per base path:
    * (touched cell ids, cell ids with surviving bytes). Spec-facing —
    * the staging directory is deleted once the overwrite commits, so
    * the touched set is no longer recoverable from disk. */
  private[operators] val rewriteTouchedLog =
    new java.util.concurrent.ConcurrentHashMap[String, (Set[Long], Set[Long])]()

  /** q151's structure-guard verdict per (session, dir, fingerprint) —
    * a per-corpus CONSTANT (prefix-variance share vs threshold), so it
    * is probed once on the driver and spliced into every consumer plan
    * as a literal (VERDICT r17 #1). Fingerprint-keyed like the
    * artifact memos: an in-place corpus rewrite invalidates it. */
  private[operators] val mrlGuardMemo =
    scala.collection.concurrent.TrieMap[String, Boolean]()

  private def rewrittenPartIndex(s: SparkSession, dir: String,
      cut: Long): DataFrame = {
    import s.implicits._
    val e = embGlob(s, dir)
    ivfpqIndexPartBefore(s, dir, cut) // ensure the storage exists
    val base = ivfpqPartPath(s, dir, cut)
    val cb = trainedCodebookBefore(s, dir, cut)
      .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))
    val staging = base + "_staging"
    materializeOnce(base + "_rw", staging) {
      def routed(part: DataFrame): DataFrame =
        pqRoute(part.repartition(Par.width(s), $"vec_id").crossJoin(broadcast(cb)))
          .select($"vec_id",
            split($"pcode", "-").cast("array<long>").as("codes"), $"cid")
      val stripe = e.filter($"vec_id" < cut && $"vec_id" % 13 === 5)
      val delIds = stripe.select($"vec_id")
      // Cached: `ups` feeds both the touched-cell collect and the
      // staging write — uncached, the delta×K routing pass (the
      // rewrite's most expensive stage) ran twice (review finding,
      // r16). Unpersisted after the staging write below.
      val ups = routed(e.filter($"vec_id" >= cut)).cache()
      // Touched cells: ≤ K values — a bounded driver fetch (cell
      // COUNT, not rows), the same class as q148's K-row readout.
      val touched = routed(stripe).select($"cid")
        .union(ups.select($"cid")).distinct().as[Long].collect().sorted
      val stored = s.read.parquet(base)
        .filter($"cid".cast("long").isin(touched: _*))
        .select($"vec_id", $"codes", $"cid".cast("long").as("cid"))
      // Stage the touched cells' new content first (a path cannot be
      // read and overwritten in one job), then dynamic-overwrite
      // exactly those partitions of the live table.
      stored.join(delIds, Seq("vec_id"), "left_anti")
        .unionByName(ups)
        .write.mode("overwrite").parquet(staging)
      ups.unpersist()
      val staged = s.read.parquet(staging)
      val oldMode = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try staged.write.mode("overwrite").partitionBy("cid").parquet(base)
      finally oldMode match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      val written = staged.select($"cid").distinct().as[Long].collect().toSet
      // Compaction (fully-emptied cells) and staging cleanup go through
      // Spark's storage layer — Hadoop FileSystem, resolved from the
      // path — not java.io.File: on HDFS/S3 (the storage this
      // operator's 100 TB story targets) a local-FS delete silently
      // does nothing and stale files survive (VERDICT r16 #1/#4).
      val hconf = s.sparkContext.hadoopConfiguration
      rewriteTouchedLog.put(base, (touched.toSet, written))
      (touched.toSet -- written).foreach { c =>
        val p = new org.apache.hadoop.fs.Path(s"$base/cid=$c")
        p.getFileSystem(hconf).delete(p, true): Unit
      }
      val sp = new org.apache.hadoop.fs.Path(staging)
      sp.getFileSystem(hconf).delete(sp, true): Unit
    }
    s.read.parquet(base)
      .select($"vec_id", $"codes", $"cid".cast("long").as("cid"))
  }

  // q153 serves the ledger from the REWRITTEN storage; its contract is
  // exactly q144's from-scratch twin (the bytes on disk must equal a
  // rebuild over the survivors), so the oracle is shared by aliasing —
  // the two strings cannot drift.
  def oracleSql: Map[String, String] = oracleBase +
    ("q153_index_rewrite" -> oracleBase("q144_index_delete_compact"))

  private lazy val oracleBase: Map[String, String] = Map(

      // Assignment twin of q68's two-level max_by(·, (cos, -id)) chain:
      // row_number ORDER BY cos DESC, id picks the same coarse cell for
      // fine centroids and vectors, then the same fine centroid within
      // the cell, incl. ties. step = ⌈√K⌉ exactly as the Spark plan
      // computes it (IEEE sqrt is correctly rounded in both engines).
      "q68_semantic_dedup" -> s"""
        WITH $cosFragment,
        cents AS (SELECT vec_id cid, v ce FROM e WHERE vec_id % 125 = 0),
        k AS (SELECT CAST(ceil(sqrt(count(1)::DOUBLE)) AS BIGINT) AS step
              FROM cents),
        coarse AS (SELECT cid gid, ce ge FROM cents, k
                   WHERE cid % (125 * step) = 0),
        fcell AS (SELECT cid, ce, gid FROM (
                    SELECT c.cid, c.ce, g.gid,
                           row_number() OVER (PARTITION BY c.cid ORDER BY
                             list_dot_product(c.ce, g.ge) /
                             (sqrt(list_dot_product(c.ce, c.ce)) *
                              sqrt(list_dot_product(g.ge, g.ge))) DESC,
                             g.gid) rk
                    FROM cents c CROSS JOIN coarse g) WHERE rk = 1),
        vcell AS (SELECT vec_id, v, gid FROM (
                    SELECT e.vec_id, e.v, g.gid,
                           row_number() OVER (PARTITION BY e.vec_id ORDER BY
                             list_dot_product(e.v, g.ge) /
                             (sqrt(list_dot_product(e.v, e.v)) *
                              sqrt(list_dot_product(g.ge, g.ge))) DESC,
                             g.gid) rk
                    FROM e CROSS JOIN coarse g) WHERE rk = 1),
        assigned AS (SELECT vec_id, cid FROM (
                       SELECT v.vec_id, f.cid,
                              row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY
                                  list_dot_product(v.v, f.ce) /
                                  (sqrt(list_dot_product(v.v, v.v)) *
                                   sqrt(list_dot_product(f.ce, f.ce))) DESC,
                                  f.cid) rk
                       FROM vcell v JOIN fcell f ON v.gid = f.gid)
                     WHERE rk = 1),
        dups AS (SELECT DISTINCT b.vec_id
                 FROM assigned a JOIN assigned b
                      ON a.cid = b.cid AND a.vec_id < b.vec_id
                 JOIN e x ON x.vec_id = a.vec_id
                 JOIN e y ON y.vec_id = b.vec_id
                 WHERE list_dot_product(x.v, y.v) /
                       (sqrt(list_dot_product(x.v, x.v)) *
                        sqrt(list_dot_product(y.v, y.v))) >= 0.4)
        SELECT a.vec_id, a.cid, d.vec_id IS NULL AS keep
        FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
        ORDER BY a.vec_id""",

      // q68's chain over the trained-codebook CTEs at the CELL-BOUNDED
      // K = greatest(64, ⌈n/125⌉) (integer arithmetic identical to the
      // Spark side's driver scalar); coarse = every step-th trained
      // centroid over the dense 0..K-1 cids.
      "q68b_semantic_dedup_trained" -> s"""
        WITH ${PipelineQueries.trainedCbOracleCtesFor(
          "(SELECT " + AnnPolicy.scanCeilSql("count(1)",
            AnnPolicy.CellTarget, AnnPolicy.TrainedK) + " FROM te)")},
        k AS (SELECT CAST(ceil(sqrt(count(1)::DOUBLE)) AS BIGINT) AS step
              FROM tcb),
        coarse AS (SELECT cid gid, ce ge FROM tcb, k
                   WHERE cid % step = 0),
        fcell AS (SELECT cid, ce, gid FROM (
                    SELECT c.cid, c.ce, g.gid,
                           row_number() OVER (PARTITION BY c.cid ORDER BY
                             list_dot_product(c.ce, g.ge) /
                             (sqrt(list_dot_product(c.ce, c.ce)) *
                              sqrt(list_dot_product(g.ge, g.ge))) DESC,
                             g.gid) rk
                    FROM tcb c CROSS JOIN coarse g) WHERE rk = 1),
        vcell AS (SELECT vec_id, v, gid FROM (
                    SELECT te.vec_id, te.v, g.gid,
                           row_number() OVER (PARTITION BY te.vec_id ORDER BY
                             list_dot_product(te.v, g.ge) /
                             (sqrt(list_dot_product(te.v, te.v)) *
                              sqrt(list_dot_product(g.ge, g.ge))) DESC,
                             g.gid) rk
                    FROM te CROSS JOIN coarse g) WHERE rk = 1),
        assigned AS (SELECT vec_id, cid FROM (
                       SELECT v.vec_id, f.cid,
                              row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY
                                  list_dot_product(v.v, f.ce) /
                                  (sqrt(list_dot_product(v.v, v.v)) *
                                   sqrt(list_dot_product(f.ce, f.ce))) DESC,
                                  f.cid) rk
                       FROM vcell v JOIN fcell f ON v.gid = f.gid)
                     WHERE rk = 1),
        dups AS (SELECT DISTINCT b.vec_id
                 FROM assigned a JOIN assigned b
                      ON a.cid = b.cid AND a.vec_id < b.vec_id
                 JOIN te x ON x.vec_id = a.vec_id
                 JOIN te y ON y.vec_id = b.vec_id
                 WHERE list_dot_product(x.v, y.v) /
                       (sqrt(list_dot_product(x.v, x.v)) *
                        sqrt(list_dot_product(y.v, y.v))) >= 0.4)
        SELECT a.vec_id, a.cid, d.vec_id IS NULL AS keep
        FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
        ORDER BY a.vec_id""",

      // Delta-maintenance twin: codebook trained on the pre-cut
      // partition ONLY (trainSrc = tt), every vector routed through it
      // with the q141-proven subspace chain, cells counted with
      // corpus/delta provenance. The cut is the same integer arithmetic
      // as the Spark side's driver scalar (q81's precedent).
      "q143_index_delta_maintain" -> s"""
        WITH ${PipelineQueries.trainedCbOracleCtesTrainOn(
          graft.operators.AnnPolicy.TrainedK.toString,
          """
        tcut AS (SELECT (max(vec_id) + 1) * 9 // 10 c FROM te),
        tt AS (SELECT * FROM te WHERE vec_id < (SELECT c FROM tcut)),""",
          "tt")},
        pd AS (SELECT te.vec_id, c.cid, s.s,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 9),
                          j -> (te.v[s.s*8+j] - c.ce[s.s*8+j])
                               * (te.v[s.s*8+j] - c.ce[s.s*8+j]))),
                        (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c
                    CROSS JOIN (SELECT unnest(generate_series(0, 7)) s) s),
        fd AS (SELECT vec_id, cid,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list(d ORDER BY s)), (x, y) -> x + y) d
               FROM pd GROUP BY vec_id, cid),
        asg AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d NULLS FIRST, cid) rn
                  FROM fd) WHERE rn = 1),
        codes AS (SELECT vec_id, s, cid code FROM (
                    SELECT vec_id, s, cid,
                           row_number() OVER (PARTITION BY vec_id, s
                                              ORDER BY d NULLS FIRST, cid) rn
                    FROM pd) WHERE rn = 1),
        pc AS (SELECT vec_id, string_agg(code::VARCHAR, '-' ORDER BY s) pcode
               FROM codes GROUP BY 1)
        SELECT a.cid, p.pcode,
               CAST(sum(CASE WHEN a.vec_id < (SELECT c FROM tcut)
                             THEN 1 ELSE 0 END) AS BIGINT) n_corpus,
               CAST(sum(CASE WHEN a.vec_id >= (SELECT c FROM tcut)
                             THEN 1 ELSE 0 END) AS BIGINT) n_delta,
               min(a.vec_id) canonical_vec
        FROM asg a JOIN pc p USING (vec_id)
        GROUP BY 1, 2
        ORDER BY 1, 2""",

      // Delete+compaction twin: from-scratch routing of the SURVIVING
      // set (corpus minus the vec_id % 13 = 5 tombstone stripe, plus
      // the delta) through the q143 cut-trained chain — the maintained
      // ledger must equal this rebuilt ledger cell-for-cell, and
      // emptied cells must be ABSENT (the survivors join performs the
      // compaction implicitly: a cell with no surviving member has no
      // row to group).
      "q144_index_delete_compact" -> s"""
        WITH ${PipelineQueries.trainedCbOracleCtesTrainOn(
          graft.operators.AnnPolicy.TrainedK.toString,
          """
        tcut AS (SELECT (max(vec_id) + 1) * 9 // 10 c FROM te),
        tt AS (SELECT * FROM te WHERE vec_id < (SELECT c FROM tcut)),""",
          "tt")},
        pd AS (SELECT te.vec_id, c.cid, s.s,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 9),
                          j -> (te.v[s.s*8+j] - c.ce[s.s*8+j])
                               * (te.v[s.s*8+j] - c.ce[s.s*8+j]))),
                        (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c
                    CROSS JOIN (SELECT unnest(generate_series(0, 7)) s) s),
        fd AS (SELECT vec_id, cid,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list(d ORDER BY s)), (x, y) -> x + y) d
               FROM pd GROUP BY vec_id, cid),
        asg AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d NULLS FIRST, cid) rn
                  FROM fd) WHERE rn = 1),
        codes AS (SELECT vec_id, s, cid code FROM (
                    SELECT vec_id, s, cid,
                           row_number() OVER (PARTITION BY vec_id, s
                                              ORDER BY d NULLS FIRST, cid) rn
                    FROM pd) WHERE rn = 1),
        pc AS (SELECT vec_id, string_agg(code::VARCHAR, '-' ORDER BY s) pcode
               FROM codes GROUP BY 1),
        surv AS (SELECT vec_id FROM te
                 WHERE vec_id >= (SELECT c FROM tcut) OR vec_id % 13 <> 5)
        SELECT a.cid, p.pcode,
               CAST(sum(CASE WHEN a.vec_id < (SELECT c FROM tcut)
                             THEN 1 ELSE 0 END) AS BIGINT) n_corpus,
               CAST(sum(CASE WHEN a.vec_id >= (SELECT c FROM tcut)
                             THEN 1 ELSE 0 END) AS BIGINT) n_delta,
               CAST(count(1) AS BIGINT) n_live
        FROM asg a JOIN pc p USING (vec_id) JOIN surv USING (vec_id)
        GROUP BY 1, 2
        ORDER BY 1, 2""",

      // Serving twin over the REWRITTEN store: q144's from-scratch
      // index chain (cut-trained codebook, 8-subspace pqRoute-parity
      // assignment) restricted to the SURVIVING set — exactly what the
      // rewritten bytes hold — then q36b-style query routing (64-term
      // fold vs the same codebook, ⌈K/10⌉ probe) and (l2, vec_id)
      // exact rerank.
      "q157_ann_serve_rewritten" -> {
        def f64(a: String, b: String) =
          s"""list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(range(1, 65),
                     i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
                   (x, y) -> x + y)"""
        s"""
        WITH ${PipelineQueries.trainedCbOracleCtesTrainOn(
          graft.operators.AnnPolicy.TrainedK.toString,
          """
        tcut AS (SELECT (max(vec_id) + 1) * 9 // 10 c FROM te),
        tt AS (SELECT * FROM te WHERE vec_id < (SELECT c FROM tcut)),""",
          "tt")},
        pd AS (SELECT te.vec_id, c.cid, s.s,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 9),
                          j -> (te.v[s.s*8+j] - c.ce[s.s*8+j])
                               * (te.v[s.s*8+j] - c.ce[s.s*8+j]))),
                        (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c
                    CROSS JOIN (SELECT unnest(generate_series(0, 7)) s) s),
        fd AS (SELECT vec_id, cid,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list(d ORDER BY s)), (x, y) -> x + y) d
               FROM pd GROUP BY vec_id, cid),
        asg AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d NULLS FIRST, cid) rn
                  FROM fd) WHERE rn = 1),
        surv AS (SELECT vec_id FROM te
                 WHERE vec_id >= (SELECT c FROM tcut) OR vec_id % 13 <> 5),
        np AS (SELECT ${AnnPolicy.scanCeilSql("count(1)",
          AnnPolicy.IvfScanDiv, AnnPolicy.IvfNprobeFloor)} np FROM tcb),
        qc AS (SELECT query_id, qv, cid FROM (
                 SELECT te.vec_id query_id, te.v qv, c.cid,
                        row_number() OVER (PARTITION BY te.vec_id
                          ORDER BY ${f64("te.v", "c.ce")} NULLS FIRST,
                                   c.cid) qrank
                 FROM te CROSS JOIN tcb c WHERE te.vec_id < 5)
               WHERE qrank <= (SELECT np FROM np)),
        ranked AS (SELECT query_id, vec_id, l2,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY l2 NULLS FIRST,
                                                      vec_id) rk
                   FROM (SELECT q.query_id, a.vec_id,
                                ${f64("t.v", "q.qv")} l2
                         FROM qc q
                              JOIN asg a ON a.cid = q.cid
                              JOIN surv s ON s.vec_id = a.vec_id
                              JOIN te t ON t.vec_id = a.vec_id
                         WHERE a.vec_id != q.query_id))
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id,
               floor(l2 * 10000 + 0.5) / 10000 AS l2
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank"""
      },

      // Drift-gate twin: corpus/delta cell occupancies from the same
      // cut-trained assignment chain, the q134 KL term op order
      // (divide, divide, multiply, ln, multiply — each exactly-rounded
      // IEEE on exact integer inputs), the scaled-integer sum at 10¹²,
      // and the χ²-floor threshold as one integer-fed divide. The
      // retrain boolean compares the two 6-dp-rounded doubles — DuckDB
      // lateral alias references keep it on the identical values.
      "q145_index_drift_gate" -> s"""
        WITH ${PipelineQueries.trainedCbOracleCtesTrainOn(
          graft.operators.AnnPolicy.TrainedK.toString,
          """
        tcut AS (SELECT (max(vec_id) + 1) * 9 // 10 c FROM te),
        tt AS (SELECT * FROM te WHERE vec_id < (SELECT c FROM tcut)),""",
          "tt")},
        pd AS (SELECT te.vec_id, c.cid, s.s,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 9),
                          j -> (te.v[s.s*8+j] - c.ce[s.s*8+j])
                               * (te.v[s.s*8+j] - c.ce[s.s*8+j]))),
                        (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c
                    CROSS JOIN (SELECT unnest(generate_series(0, 7)) s) s),
        fd AS (SELECT vec_id, cid,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list(d ORDER BY s)), (x, y) -> x + y) d
               FROM pd GROUP BY vec_id, cid),
        asg AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d NULLS FIRST, cid) rn
                  FROM fd) WHERE rn = 1),
        cc AS (SELECT cid, CAST(count(1) AS BIGINT) c_c FROM asg
               WHERE vec_id < (SELECT c FROM tcut) GROUP BY 1),
        cdt AS (SELECT cid, CAST(count(1) AS BIGINT) c_d FROM asg
                WHERE vec_id >= (SELECT c FROM tcut) GROUP BY 1),
        scal AS (SELECT
          (SELECT CAST(count(1) AS BIGINT) FROM te
           WHERE vec_id < (SELECT c FROM tcut)) n_c,
          (SELECT CAST(count(1) AS BIGINT) FROM tcb) k,
          (SELECT CAST(count(1) AS BIGINT) FROM te
           WHERE vec_id >= (SELECT c FROM tcut)) n_d,
          (SELECT CAST(count(1) AS BIGINT) FROM cdt) n_cells_delta),
        terms AS (SELECT (d.c_d::DOUBLE / s.n_d::DOUBLE) a,
                         ((s.n_c + s.k)::DOUBLE
                          / (coalesce(c.c_c, 0) + 1)::DOUBLE) b
                  FROM cdt d LEFT JOIN cc c USING (cid) CROSS JOIN scal s),
        agg AS (SELECT sum(CAST(floor(a * ln(a * b)
                  * 1000000000000.0 + 0.5) AS BIGINT)) ts FROM terms)
        SELECT s.n_c AS n_corpus, s.n_d AS n_delta, s.k AS k,
               s.n_cells_delta AS n_cells_delta,
               ${CrossRound.sql("ts::DOUBLE / 1000000000000.0", 6)} AS kl,
               ${CrossRound.sql(
                 s"(${graft.operators.AnnPolicy.DriftGateFactor} * (s.k - 1))::DOUBLE" +
                   " / (2 * s.n_d)::DOUBLE", 6)} AS noise_floor,
               kl > noise_floor AS retrain
        FROM agg CROSS JOIN scal s""",

      // q140's cluster-median rule over the shared trained-codebook
      // CTEs (NULLS FIRST per the family convention).
      "q140b_outliers_trained" -> s"""
        WITH $trainedCbCtes,
        sc AS (SELECT te.vec_id, c.cid,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 65),
                          i -> (te.v[i] - c.ce[i]) * (te.v[i] - c.ce[i]))),
                        (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c),
        asg AS (SELECT vec_id, cid, d FROM (
                  SELECT vec_id, cid, d,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d NULLS FIRST, cid) rn
                  FROM sc) WHERE rn = 1),
        st AS (SELECT cid, CAST(count(1) AS BIGINT) n_members,
                      quantile_cont(d, 0.5) med
               FROM asg GROUP BY 1)
        SELECT a.vec_id, a.cid, n_members,
               floor(a.d * 10000 + 0.5) / 10000 AS d2,
               floor(med * 10000 + 0.5) / 10000 AS med_d2,
               CASE WHEN med > 0
                    THEN floor(a.d / med * 10000 + 0.5) / 10000 END AS ratio,
               a.d <= 4 * med AS keep
        FROM asg a JOIN st USING (cid)
        ORDER BY a.vec_id""",


      "q25_cosine_topk" -> s"""
        WITH $cosFragment,
        q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < 5),
        scored AS (SELECT q.query_id, e.vec_id,
                          list_dot_product(e.v, q.qv) /
                          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) cos
                   FROM e CROSS JOIN q WHERE e.vec_id != q.query_id),
        ranked AS (SELECT query_id, vec_id, cos,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY cos DESC, vec_id) rk
                   FROM scored)
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id, floor(cos * 10000 + 0.5) / 10000 AS cos
        FROM ranked WHERE rk <= 10
        ORDER BY query_id, rank""",


      // Identical result contract to q25 — the Spark side differs only in
      // HOW the top-k is computed (partial-aggregating UDAF vs window).
      "q25b_topk_agg" -> s"""
        WITH $cosFragment,
        q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < 5),
        scored AS (SELECT q.query_id, e.vec_id,
                          list_dot_product(e.v, q.qv) /
                          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) cos
                   FROM e CROSS JOIN q WHERE e.vec_id != q.query_id),
        ranked AS (SELECT query_id, vec_id, cos,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY cos DESC, vec_id) rk
                   FROM scored)
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id, floor(cos * 10000 + 0.5) / 10000 AS cos
        FROM ranked WHERE rk <= 10
        ORDER BY query_id, rank""",


      "q33_embed_neardup" -> s"""
        WITH $cosFragment,
        ${hyperDotsSql(8)},
        sigs AS (SELECT vec_id, b.b AS band,
                        ( CASE WHEN dot[b.b*4 + 1] >= 0 THEN 1 ELSE 0 END
                        + CASE WHEN dot[b.b*4 + 2] >= 0 THEN 2 ELSE 0 END
                        + CASE WHEN dot[b.b*4 + 3] >= 0 THEN 4 ELSE 0 END
                        + CASE WHEN dot[b.b*4 + 4] >= 0 THEN 8 ELSE 0 END)::BIGINT sig
                 FROM dots CROSS JOIN (SELECT unnest(generate_series(0, 1)) b) b),
        cand AS (SELECT DISTINCT a.vec_id vec_a, b.vec_id vec_b
                 FROM sigs a JOIN sigs b
                   ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
        verified AS (SELECT vec_a, vec_b,
                            list_dot_product(ea.v, eb.v) /
                            (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) cos
                     FROM cand
                     JOIN e ea ON vec_a = ea.vec_id
                     JOIN e eb ON vec_b = eb.vec_id)
        SELECT vec_a, vec_b, floor(cos * 10000 + 0.5) / 10000 AS cos
        FROM verified WHERE cos >= 0.4
        ORDER BY vec_a, vec_b""",


      "q26_ann_lsh" -> s"""
        WITH $cosFragment,
        ${hyperDotsSql(12)},
        eb AS (SELECT vec_id, v,
                      list_reduce(list_prepend(0::BIGINT,
                        list_transform(range(0, 12), h ->
                          CASE WHEN dot[h+1] >= 0 THEN (1::BIGINT << h)
                               ELSE 0::BIGINT END)),
                        (acc, x) -> acc + x) bucket
               FROM dots),
        q AS (SELECT vec_id query_id, v qv, bucket qbucket FROM eb WHERE vec_id < 5),
        -- multi-probe: candidates within Hamming distance r of the
        -- query's 12-bit signature; r per AnnPolicy.lshRadius —
        -- smallest r in [3, 6] whose expected candidate pool reaches
        -- 250 (integer threshold compares, mirroring the Spark side's
        -- CASE over the corpus count).
        rad AS (SELECT ${AnnPolicy.lshRadiusSql("count(1)")} r FROM eb),
        scored AS (SELECT q.query_id, eb.vec_id,
                          list_dot_product(eb.v, q.qv) /
                          (sqrt(list_dot_product(eb.v, eb.v)) * sqrt(list_dot_product(q.qv, q.qv))) cos
                   FROM eb JOIN q ON bit_count(xor(eb.bucket, q.qbucket)) <= (SELECT r FROM rad)
                                 AND eb.vec_id != q.query_id),
        ranked AS (SELECT query_id, vec_id, cos,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY cos DESC, vec_id) rk
                   FROM scored)
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id, floor(cos * 10000 + 0.5) / 10000 AS cos
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank""",


      "q36_ann_ivf" -> s"""
        WITH $cosFragment,
        cents AS (SELECT vec_id cid, v ce FROM e WHERE vec_id % 125 = 0),
        scoredc AS (SELECT e.vec_id, cents.cid,
                           list_dot_product(e.v, cents.ce) /
                           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cents.ce, cents.ce))) ccos
                    FROM e CROSS JOIN cents),
        rankedc AS (SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY ccos DESC, cid) ar
                    FROM scoredc),
        assigned AS (SELECT vec_id, cid FROM rankedc WHERE ar = 1),
        ea AS (SELECT e.vec_id, e.v, a.cid FROM e JOIN assigned a USING (vec_id)),
        -- AnnPolicy.ivfNprobe: max(2, ceil(L/10)) over L inverted
        -- lists — integer ceiling division, mirroring the Spark side's
        -- (nl + 9) DIV 10 exactly.
        np AS (SELECT ${
          AnnPolicy.scanCeilSql("count(1)", AnnPolicy.IvfScanDiv,
            AnnPolicy.IvfNprobeFloor)
        } np FROM cents),
        q AS (SELECT r.vec_id query_id, e.v qv, r.cid qcid
              FROM rankedc r JOIN e ON r.vec_id = e.vec_id
              WHERE r.vec_id < 5 AND r.ar <= (SELECT np FROM np)),
        scored AS (SELECT q.query_id, ea.vec_id,
                          list_dot_product(ea.v, q.qv) /
                          (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(q.qv, q.qv))) cos
                   FROM ea JOIN q ON ea.cid = q.qcid AND ea.vec_id != q.query_id),
        ranked AS (SELECT query_id, vec_id, cos,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY cos DESC, vec_id) rk
                   FROM scored)
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id, floor(cos * 10000 + 0.5) / 10000 AS cos
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank""",


      // Trained-codebook IVF twin: assignment/probe/scoring are all the
      // flat 64-term L2 fold (q72's d1 pattern ≡ the Spark side's
      // l2_sq), the codebook is the shared trained chain, and every
      // distance ordering carries NULLS FIRST (ADVICE r13 #3).
      "q36b_ann_ivf_trained" -> s"""
        WITH $trainedCbCtes,
        sc AS (SELECT te.vec_id, c.cid,
                 list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(range(1, 65),
                     i -> (te.v[i] - c.ce[i]) * (te.v[i] - c.ce[i]))),
                   (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c),
        asgd AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d NULLS FIRST, cid) rn
                   FROM sc) WHERE rn = 1),
        np AS (SELECT ${
          AnnPolicy.scanCeilSql("count(1)", AnnPolicy.IvfScanDiv,
            AnnPolicy.IvfNprobeFloor)
        } np FROM tcb),
        qp AS (SELECT vec_id query_id, cid qcid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY d NULLS FIRST, cid) rn
                 FROM sc WHERE vec_id < 5)
               WHERE rn <= (SELECT np FROM np)),
        scored AS (SELECT q.query_id, a.vec_id,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(range(1, 65),
                         i -> (ev.v[i] - qv.v[i]) * (ev.v[i] - qv.v[i]))),
                       (x, y) -> x + y) l2
                   FROM asgd a
                   JOIN qp q ON a.cid = q.qcid AND a.vec_id != q.query_id
                   JOIN te ev ON a.vec_id = ev.vec_id
                   JOIN te qv ON q.query_id = qv.vec_id),
        ranked AS (SELECT query_id, vec_id, l2,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY l2 NULLS FIRST, vec_id) rk
                   FROM scored)
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id,
               floor(l2 * 10000 + 0.5) / 10000 AS l2
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank""",


      // Two-level-coarse twin: the q68b routing chain in L2 over the
      // GROWN codebook (grownKSql's exact-⌈√n⌉ scalar feeds the shared
      // Lloyd CTEs), then coarse-probe → pooled-fine-probe → the q36b
      // candidate/rank tail. Every distance is the flat 64-term fold
      // (the native l2_sq kernel's order), every tie (d, id) NULLS
      // FIRST, every dial a generated scanCeil form.
      "q36c_ann_ivf_coarse" -> {
        def f(a: String, b: String) =
          s"""list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(range(1, 65),
                     i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
                   (x, y) -> x + y)"""
        s"""
        WITH ${PipelineQueries.trainedCbOracleCtesFor(AnnPolicy.grownKSql)},
        k2 AS (SELECT CAST(ceil(sqrt(count(1)::DOUBLE)) AS BIGINT) step
               FROM tcb),
        coarse0 AS (SELECT cid gid, ce ge FROM tcb, k2 WHERE cid % step = 0),
        casg AS (SELECT cid, gid FROM (
                   SELECT c.cid, g.gid,
                          row_number() OVER (PARTITION BY c.cid ORDER BY
                            ${f("c.ce", "g.ge")} NULLS FIRST, g.gid) rk
                   FROM tcb c CROSS JOIN coarse0 g) WHERE rk = 1),
        ccm AS (SELECT a.gid, t.dim,
                       floor(avg(c.ce[t.dim + 1]) * 1000000 + 0.5) / 1000000 m
                FROM casg a JOIN tcb c USING (cid)
                     CROSS JOIN (SELECT unnest(range(0, 64)) dim) t
                GROUP BY 1, 2),
        coarse AS (SELECT gid, list(m ORDER BY dim) ge FROM ccm GROUP BY gid),
        mm AS (SELECT ${AnnPolicy.scanCeilSql("count(1)",
          AnnPolicy.CoarseAssignDiv, AnnPolicy.CoarseAssignFloor)} m
               FROM coarse),
        fcell AS (SELECT cid, ce, gid FROM (
                    SELECT c.cid, c.ce, g.gid,
                           row_number() OVER (PARTITION BY c.cid ORDER BY
                             ${f("c.ce", "g.ge")} NULLS FIRST, g.gid) rk
                    FROM tcb c CROSS JOIN coarse g) WHERE rk = 1),
        vcell AS (SELECT vec_id, v, gid FROM (
                    SELECT te.vec_id, te.v, g.gid,
                           row_number() OVER (PARTITION BY te.vec_id ORDER BY
                             ${f("te.v", "g.ge")} NULLS FIRST, g.gid) rk
                    FROM te CROSS JOIN coarse g)
                  WHERE rk <= (SELECT m FROM mm)),
        asg AS (SELECT vec_id, v, cid FROM (
                  SELECT v.vec_id, v.v, f.cid,
                         row_number() OVER (PARTITION BY v.vec_id ORDER BY
                           ${f("v.v", "f.ce")} NULLS FIRST, f.cid) rk
                  FROM vcell v JOIN fcell f ON v.gid = f.gid) WHERE rk = 1),
        pcp AS (SELECT ${AnnPolicy.scanCeilSql("step",
          AnnPolicy.CoarseProbeDiv, AnnPolicy.CoarseProbeFloor)} pc FROM k2),
        np AS (SELECT ${AnnPolicy.scanCeilSql("count(1)",
          AnnPolicy.IvfScanDiv, AnnPolicy.IvfNprobeFloor)} np FROM tcb),
        qc AS (SELECT query_id, qv, gid FROM (
                 SELECT te.vec_id query_id, te.v qv, g.gid,
                        row_number() OVER (PARTITION BY te.vec_id ORDER BY
                          ${f("te.v", "g.ge")} NULLS FIRST, g.gid) rk
                 FROM te CROSS JOIN coarse g WHERE te.vec_id < 5)
               WHERE rk <= (SELECT pc FROM pcp)),
        qf AS (SELECT query_id, qv, qcid FROM (
                 SELECT q.query_id, q.qv, f.cid qcid,
                        row_number() OVER (PARTITION BY q.query_id ORDER BY
                          ${f("q.qv", "f.ce")} NULLS FIRST, f.cid) rk
                 FROM qc q JOIN fcell f ON q.gid = f.gid)
               WHERE rk <= (SELECT np FROM np)),
        ranked AS (SELECT query_id, vec_id, l2,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY l2 NULLS FIRST, vec_id) rk
                   FROM (SELECT q.query_id, a.vec_id,
                                ${f("a.v", "q.qv")} l2
                         FROM asg a JOIN qf q
                           ON a.cid = q.qcid AND a.vec_id != q.query_id))
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id,
               floor(l2 * 10000 + 0.5) / 10000 AS l2
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank"""
      },

      // DuckDB's native ASOF JOIN is the oracle for our union-and-fill
      // composition (orders deduped to one per (customer, date) so the
      // match is deterministic in both engines).
      // PQ ANN: identical deterministic codebook/encode/ADC pipeline;
      // the subspace fold is index-ascending in both engines, and the
      // per-candidate ADC total folds the 8 subspace distances in
      // SUBSPACE ORDER (list(d ORDER BY s) ≡ the Spark sorted-struct
      // fold), so the shortlist cut is bit-identical. The rerank L2 is
      // the q72 fold (index-ascending) — also bit-identical.
      "q60_ann_pq" -> s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        cents AS (SELECT vec_id cid, v cv FROM e
                  WHERE vec_id % 25 = 0 AND vec_id < 2500),
        pd AS (SELECT a.vec_id, c.cid, s.s,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 9),
                          j -> (a.v[s.s*8+j] - c.cv[s.s*8+j])
                               * (a.v[s.s*8+j] - c.cv[s.s*8+j]))),
                        (x, y) -> x + y) d
               FROM e a CROSS JOIN cents c
                    CROSS JOIN (SELECT unnest(generate_series(0, 7)) s) s),
        codes AS (SELECT vec_id, s, cid AS code FROM (
                    SELECT vec_id, s, cid,
                           row_number() OVER (PARTITION BY vec_id, s
                                              ORDER BY d NULLS FIRST, cid) rn
                    FROM pd) WHERE rn = 1),
        lut AS (SELECT vec_id query_id, s, cid, d FROM pd WHERE vec_id < 5),
        adc AS (SELECT l.query_id, c.vec_id,
                       list_reduce(list_prepend(0.0::DOUBLE,
                         list(l.d ORDER BY l.s)), (x, y) -> x + y) adc
                FROM codes c JOIN lut l ON l.s = c.s AND l.cid = c.code
                WHERE c.vec_id != l.query_id
                GROUP BY 1, 2),
        -- AnnPolicy.pqShortlist: max(100, ceil(n/20)) — integer
        -- ceiling division, mirroring the Spark side's
        -- (nv + 19) DIV 20.
        sl AS (SELECT ${
          AnnPolicy.scanCeilSql("count(1)", AnnPolicy.PqScanDiv,
            AnnPolicy.PqShortlistFloor)
        } sl FROM e),
        short AS (SELECT query_id, vec_id FROM (
                    SELECT query_id, vec_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY adc, vec_id) sr
                    FROM adc) WHERE sr <= (SELECT sl FROM sl)),
        rer AS (SELECT sh.query_id, sh.vec_id,
                       list_reduce(list_prepend(0.0::DOUBLE,
                         list_transform(range(1, 65),
                           i -> (ev.v[i] - qv.v[i]) * (ev.v[i] - qv.v[i]))),
                         (x, y) -> x + y) l2
                FROM short sh
                JOIN e ev ON sh.vec_id = ev.vec_id
                JOIN e qv ON sh.query_id = qv.vec_id),
        ranked AS (SELECT query_id, vec_id, l2,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY l2, vec_id) AS rank
                   FROM rer)
        SELECT query_id, rank, vec_id, floor(l2 * 10000 + 0.5) / 10000 AS l2
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""",


      // Trained-codebook PQ twin: q60's encode→ADC→re-rank chain over
      // the shared trained CTEs; subspace distances, the subspace-
      // ordered ADC fold and the re-rank L2 keep q60's proven parity
      // shapes, with NULLS FIRST orderings (ADVICE r13 #3).
      "q60b_ann_pq_trained" -> s"""
        WITH $trainedCbCtes,
        pd AS (SELECT a.vec_id, c.cid, s.s,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 9),
                          j -> (a.v[s.s*8+j] - c.ce[s.s*8+j])
                               * (a.v[s.s*8+j] - c.ce[s.s*8+j]))),
                        (x, y) -> x + y) d
               FROM te a CROSS JOIN tcb c
                    CROSS JOIN (SELECT unnest(generate_series(0, 7)) s) s),
        codes AS (SELECT vec_id, s, cid AS code FROM (
                    SELECT vec_id, s, cid,
                           row_number() OVER (PARTITION BY vec_id, s
                                              ORDER BY d NULLS FIRST, cid) rn
                    FROM pd) WHERE rn = 1),
        lut AS (SELECT vec_id query_id, s, cid, d FROM pd WHERE vec_id < 5),
        adc AS (SELECT l.query_id, c.vec_id,
                       list_reduce(list_prepend(0.0::DOUBLE,
                         list(l.d ORDER BY l.s)), (x, y) -> x + y) adc
                FROM codes c JOIN lut l ON l.s = c.s AND l.cid = c.code
                WHERE c.vec_id != l.query_id
                GROUP BY 1, 2),
        sl AS (SELECT ${
          AnnPolicy.scanCeilSql("count(1)", AnnPolicy.PqScanDiv,
            AnnPolicy.PqShortlistFloor)
        } sl FROM te),
        short AS (SELECT query_id, vec_id FROM (
                    SELECT query_id, vec_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY adc NULLS FIRST, vec_id) sr
                    FROM adc) WHERE sr <= (SELECT sl FROM sl)),
        rer AS (SELECT sh.query_id, sh.vec_id,
                       list_reduce(list_prepend(0.0::DOUBLE,
                         list_transform(range(1, 65),
                           i -> (ev.v[i] - qv.v[i]) * (ev.v[i] - qv.v[i]))),
                         (x, y) -> x + y) l2
                FROM short sh
                JOIN te ev ON sh.vec_id = ev.vec_id
                JOIN te qv ON sh.query_id = qv.vec_id),
        ranked AS (SELECT query_id, vec_id, l2,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY l2 NULLS FIRST, vec_id) AS rank
                   FROM rer)
        SELECT query_id, rank, vec_id, floor(l2 * 10000 + 0.5) / 10000 AS l2
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""",


      // Assignment twin of q72's min_by(cid, (d, cid)): row_number
      // ORDER BY d NULLS FIRST, cid. Distances fold left-to-right over doubles in
      // both engines (l2_sq ≡ list_reduce), iteration-2 centroids are
      // round(avg, 6) in both, so assignments match exactly.
      "q72_kmeans_train" -> s"""
        $kmeansOracleCtes
        SELECT a1.vec_id, a1.cid AS cluster_init, a2.cid AS cluster
        FROM a1 JOIN a2 USING (vec_id)
        ORDER BY vec_id""",


      // Purity twin over the SAME assignment CTEs: integer counting
      // only after the join; majority tie broken by lowest label in
      // both engines (ORDER BY n DESC, label ≡ min_by struct(-n, label)).
      "q95_cluster_purity" -> s"""
        $kmeansOracleCtes,
        lbl AS (SELECT a2.vec_id, a2.cid AS cluster, emb.label
                FROM a2 JOIN embeddings emb USING (vec_id)),
        cl AS (SELECT cluster, label, CAST(count(1) AS BIGINT) n
               FROM lbl GROUP BY 1, 2),
        per AS (SELECT cluster, CAST(sum(n) AS BIGINT) n_vecs
                FROM cl GROUP BY 1),
        top AS (SELECT cluster, label top_label, n n_top FROM (
                  SELECT cluster, label, n,
                         row_number() OVER (PARTITION BY cluster
                                            ORDER BY n DESC, label) rn
                  FROM cl) WHERE rn = 1)
        SELECT per.cluster AS cluster, n_vecs, top_label, n_top,
               floor((n_top::DOUBLE / n_vecs) * 10000 + 0.5) / 10000 AS purity
        FROM per JOIN top USING (cluster)
        ORDER BY cluster""",


      // Centroids follow q72's cm CTE (round(avg,6) per dim); the
      // median is quantile_cont ≡ Spark's percentile — selection +
      // one interpolation over bit-identical doubles, order-free.
      "q99_label_cohesion" -> s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v, label FROM embeddings),
        cm AS (SELECT label, t.dim,
                      floor(avg(e.v[t.dim + 1]) * 1000000 + 0.5) / 1000000 m
               FROM e CROSS JOIN (SELECT unnest(range(0, 64)) dim) t
               GROUP BY 1, 2),
        c AS (SELECT label, list(m ORDER BY dim) ce FROM cm GROUP BY label),
        dm AS (SELECT e.label, list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, 65),
                   i -> (e.v[i] - c.ce[i]) * (e.v[i] - c.ce[i]))),
                 (x, y) -> x + y) d
               FROM e JOIN c USING (label)),
        intra AS (SELECT label, CAST(count(1) AS BIGINT) n_vecs,
                         quantile_cont(d, 0.5) med
                  FROM dm GROUP BY 1),
        cc AS (SELECT a.label la, b.label lb,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 65),
                          i -> (a.ce[i] - b.ce[i]) * (a.ce[i] - b.ce[i]))),
                        (x, y) -> x + y) dc
               FROM c a JOIN c b ON a.label != b.label),
        near AS (SELECT la AS label, lb nearest_label, dc FROM (
                   SELECT la, lb, dc,
                          row_number() OVER (PARTITION BY la
                                             ORDER BY dc, lb) rn
                   FROM cc) WHERE rn = 1)
        SELECT intra.label AS label, n_vecs,
               floor(med * 10000 + 0.5) / 10000 AS intra_d2,
               nearest_label,
               floor(dc * 10000 + 0.5) / 10000 AS inter_d2,
               floor((dc / med) * 10000 + 0.5) / 10000 AS separation
        FROM intra JOIN near USING (label)
        ORDER BY label""",


      "q102_hard_negatives" -> s"""
        WITH $cosFragment,
        el AS (SELECT e.vec_id, emb.label, e.v
               FROM e JOIN embeddings emb USING (vec_id)),
        q AS (SELECT vec_id query_id, label qlabel, v qv
              FROM el WHERE vec_id < 5),
        scored AS (SELECT q.query_id, el.vec_id, el.label,
                          list_dot_product(el.v, q.qv) /
                          (sqrt(list_dot_product(el.v, el.v)) *
                           sqrt(list_dot_product(q.qv, q.qv))) cos
                   FROM el CROSS JOIN q WHERE el.label != q.qlabel),
        ranked AS (SELECT query_id, vec_id, label, cos,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY cos DESC, vec_id) rk
                   FROM scored)
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id, label,
               floor(cos * 10000 + 0.5) / 10000 AS cos
        FROM ranked WHERE rk <= 3
        ORDER BY query_id, rank""",


      // DuckDB twin of q87: `list(x ORDER BY pos)` pins the per-dim
      // stats arrays to index order (Spark: sort_array-of-structs), and
      // both error folds run index-ordered, so codes AND sse are
      // bit-identical.
      "q87_embed_quantize" -> """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        d AS (SELECT vec_id, v, unnest(range(1, len(v) + 1)) pos FROM e),
        vals AS (SELECT vec_id, pos, v[pos] x FROM d),
        st AS (SELECT pos, min(x) mn, max(x) mx FROM vals GROUP BY 1),
        arrs AS (SELECT list(mn ORDER BY pos) mns, list(mx ORDER BY pos) mxs
                 FROM st),
        q AS (SELECT vec_id, v, mns, mxs,
                list_transform(range(1, len(v) + 1), i ->
                  CASE WHEN mxs[i] > mns[i]
                    THEN CAST(floor((v[i] - mns[i])
                           * (255.0::DOUBLE / (mxs[i] - mns[i]))
                           + 0.5::DOUBLE) AS INT)
                    ELSE 0 END) codes
              FROM e, arrs),
        er AS (SELECT vec_id, codes,
                 list_transform(range(1, len(v) + 1), i ->
                   v[i] - (mns[i] + codes[i]::DOUBLE
                           * ((mxs[i] - mns[i]) / 255.0::DOUBLE))) errs
               FROM q)
        SELECT vec_id,
               CAST(list_reduce(list_prepend(0::BIGINT,
                      list_transform(codes, c -> c::BIGINT)),
                    (a, b) -> a + b) AS BIGINT) AS code_sum,
               codes[1] AS c0, codes[2] AS c1,
               floor(list_reduce(list_prepend(0.0::DOUBLE, errs),
                       (a, b) -> a + b * b) * 1000000 + 0.5) / 1000000 AS sse
        FROM er
        ORDER BY vec_id""",


      // Full-space cosine and projected-space cosine both fold in
      // ascending element order (list_dot_product ≡ the Spark kernel /
      // zip_with-aggregate fold); the mean distortion is the
      // scaled-integer mean over the ROUNDED per-pair errors (q123's
      // exact shape).
      "q137_jl_projection" -> s"""
        WITH $cosFragment,
        ${hyperDotsSql(16)},
        p AS (SELECT a.vec_id vec_a, b.vec_id vec_b,
                ${CrossRound.sql(
                  "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))" +
                    " * sqrt(list_dot_product(b.v, b.v)))", 6)} cos_full,
                ${CrossRound.sql(
                  "list_dot_product(a.dot, b.dot) / (sqrt(list_dot_product(a.dot, a.dot))" +
                    " * sqrt(list_dot_product(b.dot, b.dot)))", 6)} cos_proj
              FROM dots a JOIN dots b ON b.vec_id = a.vec_id + 1),
        r AS (SELECT vec_a, vec_b, cos_full, cos_proj,
                     ${CrossRound.sql("abs(cos_full - cos_proj)", 6)} err
              FROM p),
        thr AS (SELECT ${CrossRound.sql(
                  "sum(CAST(floor(err * 1000000 + 0.5) AS BIGINT))" +
                    " / (count(1) * 1000000.0)", 6)} mean_err
                FROM r)
        SELECT vec_a, vec_b, cos_full, cos_proj, err, mean_err
        FROM r CROSS JOIN thr
        ORDER BY vec_a""",


      // Assignment is q36's deterministic coarse codebook; the cluster
      // stat is quantile_cont (the q99-proven twin of Spark's exact
      // interpolated percentile); keep compares d against 4*med — an
      // exact IEEE product — so the verdict can never tie-split across
      // engines.
      "q140_embedding_outliers" -> s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        cents AS (SELECT vec_id cid, v cv FROM e WHERE vec_id % 125 = 0),
        sc AS (SELECT e.vec_id, c.cid,
                      list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(range(1, 65),
                          i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))),
                        (x, y) -> x + y) d
               FROM e CROSS JOIN cents c),
        asg AS (SELECT vec_id, cid, d FROM (
                  SELECT vec_id, cid, d,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d NULLS FIRST, cid) rn
                  FROM sc) WHERE rn = 1),
        st AS (SELECT cid, CAST(count(1) AS BIGINT) n_members,
                      quantile_cont(d, 0.5) med
               FROM asg GROUP BY 1)
        SELECT a.vec_id, a.cid, n_members,
               floor(a.d * 10000 + 0.5) / 10000 AS d2,
               floor(med * 10000 + 0.5) / 10000 AS med_d2,
               CASE WHEN med > 0
                    THEN floor(a.d / med * 10000 + 0.5) / 10000 END AS ratio,
               a.d <= 4 * med AS keep
        FROM asg a JOIN st USING (cid)
        ORDER BY a.vec_id""",


      // Filtered-search twin: q36b's routing/probe/rank chain with (a)
      // the label riding the ledger, (b) the per-query probe width the
      // generated filteredNprobeSql form (exact integer counts from
      // the 10-row label histogram and the artifact list count), (c)
      // the label-equality predicate applied with the cid-equality in
      // the candidate join. Ties and folds are the family convention
      // (d NULLS FIRST then id; left-to-right 64-term fold).
      "q147_ann_filtered" -> s"""
        WITH $trainedCbCtes,
        lab AS (SELECT vec_id, label FROM embeddings),
        hist AS (SELECT label, CAST(count(1) AS BIGINT) nm
                 FROM lab GROUP BY 1),
        nlc AS (SELECT CAST(count(1) AS BIGINT) nl FROM tcb),
        sc AS (SELECT te.vec_id, c.cid,
                 list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(range(1, 65),
                     i -> (te.v[i] - c.ce[i]) * (te.v[i] - c.ce[i]))),
                   (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c),
        asgd AS (SELECT s.vec_id, s.cid, l.label FROM (
                   SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d NULLS FIRST, cid) rn
                   FROM sc) s JOIN lab l ON s.vec_id = l.vec_id
                 WHERE s.rn = 1),
        qr AS (SELECT vec_id, cid,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d NULLS FIRST, cid) rn
               FROM sc WHERE vec_id < 5),
        qp AS (SELECT qr.vec_id query_id, qr.cid qcid, l.label ql
               FROM qr JOIN lab l ON qr.vec_id = l.vec_id
                    JOIN hist h ON h.label = l.label
                    CROSS JOIN nlc
               WHERE qr.rn <= ${AnnPolicy.filteredNprobeSql("nlc.nl", "h.nm")}),
        scored AS (SELECT q.query_id, a.vec_id,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(range(1, 65),
                         i -> (ev.v[i] - qv.v[i]) * (ev.v[i] - qv.v[i]))),
                       (x, y) -> x + y) l2
                   FROM asgd a
                   JOIN qp q ON a.cid = q.qcid AND a.label = q.ql
                            AND a.vec_id != q.query_id
                   JOIN te ev ON a.vec_id = ev.vec_id
                   JOIN te qv ON q.query_id = qv.vec_id),
        ranked AS (SELECT query_id, vec_id, l2,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY l2 NULLS FIRST, vec_id) rk
                   FROM scored)
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id,
               floor(l2 * 10000 + 0.5) / 10000 AS l2
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank""",


      // Matryoshka twin: q36b's chain with every ROUTING distance a
      // prefix fold GATED by the structure guard — the `mrlg` CTE is
      // the same sampled per-dim variance-share probe as the Spark
      // plan (4dp-rounded share ≥ threshold routes range(1, 17); below
      // it every routing fold is the full 64-term q36b form), and the
      // candidate rank is the full fold either way. Probe multiplier
      // is the default 1 (the oracle pins defaults; the boost knob is
      // experiment-only under the guard).
      "q151_ann_matryoshka" -> s"""
        WITH $trainedCbCtes,
        vdim AS (SELECT dim, var_pop(x) vd FROM (
                   SELECT unnest(v) x, generate_subscripts(v, 1) dim
                   FROM te WHERE vec_id < ${AnnPolicy.MrlGuardSampleRows})
                 GROUP BY 1),
        mrlg AS (SELECT floor(sum(CASE WHEN dim <= ${AnnPolicy.MrlPrefixDims}
                                       THEN vd ELSE 0 END) / sum(vd)
                              * 10000 + 0.5) / 10000
                        >= ${AnnPolicy.MrlPrefixShareMin} AS mrl FROM vdim),
        sc AS (SELECT te.vec_id, c.cid,
                 list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(range(1, CASE WHEN g.mrl
                       THEN ${AnnPolicy.MrlPrefixDims + 1} ELSE 65 END),
                     i -> (te.v[i] - c.ce[i]) * (te.v[i] - c.ce[i]))),
                   (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c CROSS JOIN mrlg g),
        asgd AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d NULLS FIRST, cid) rn
                   FROM sc) WHERE rn = 1),
        np AS (SELECT least(count(1), ${
          AnnPolicy.scanCeilSql("count(1)", AnnPolicy.IvfScanDiv,
            AnnPolicy.IvfNprobeFloor)
        }) np FROM tcb),
        qp AS (SELECT vec_id query_id, cid qcid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                                           ORDER BY d NULLS FIRST, cid) rn
                 FROM sc WHERE vec_id < 5)
               WHERE rn <= (SELECT np FROM np)),
        scored AS (SELECT q.query_id, a.vec_id,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(range(1, 65),
                         i -> (ev.v[i] - qv.v[i]) * (ev.v[i] - qv.v[i]))),
                       (x, y) -> x + y) l2
                   FROM asgd a
                   JOIN qp q ON a.cid = q.qcid AND a.vec_id != q.query_id
                   JOIN te ev ON a.vec_id = ev.vec_id
                   JOIN te qv ON q.query_id = qv.vec_id),
        ranked AS (SELECT query_id, vec_id, l2,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY l2 NULLS FIRST, vec_id) rk
                   FROM scored)
        SELECT query_id, CAST(rk AS INT) AS rank, vec_id,
               floor(l2 * 10000 + 0.5) / 10000 AS l2
        FROM ranked WHERE rk <= 5
        ORDER BY query_id, rank""",


      // Index-health twin: the same trained routing, then K-row count
      // arithmetic. The giant flag is the integer compare
      // n_live·L ≥ factor·n (no float seam); frac/imbalance are 4dp
      // display ratios computed int/double in both engines.
      "q148_ivf_index_stats" -> s"""
        WITH $trainedCbCtes,
        sc AS (SELECT te.vec_id, c.cid,
                 list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(range(1, 65),
                     i -> (te.v[i] - c.ce[i]) * (te.v[i] - c.ce[i]))),
                   (x, y) -> x + y) d
               FROM te CROSS JOIN tcb c),
        asgd AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d NULLS FIRST, cid) rn
                   FROM sc) WHERE rn = 1),
        lcnt AS (SELECT cid, CAST(count(1) AS BIGINT) nl
                 FROM asgd GROUP BY 1),
        cells AS (SELECT t.cid, CAST(coalesce(l.nl, 0) AS BIGINT) n_live
                  FROM tcb t LEFT JOIN lcnt l ON t.cid = l.cid),
        tot AS (SELECT CAST(sum(n_live) AS BIGINT) n,
                       CAST(count(1) AS BIGINT) nlists FROM cells)
        SELECT cid, n_live,
               floor(n_live::DOUBLE / n * 10000 + 0.5) / 10000 AS frac,
               floor(n_live * nlists / n::DOUBLE * 10000 + 0.5) / 10000
                 AS imbalance,
               n_live * nlists >= ${AnnPolicy.GiantCellFactor} * n AS is_giant
        FROM cells CROSS JOIN tot
        ORDER BY cid""",

      // Repair twin: q148's routing + flag arithmetic, then the q72
      // Lloyd parity chain (assign → floor(avg·10⁶+0.5)/10⁶ update →
      // re-assign) SCOPED to each giant cell's member set, seeds = the
      // first S members by vec_id, S = the integer ceiling division
      // (n_live·L + n − 1) // n. Ties (d, sub) both passes.
      "q156_cell_repair" -> {
        def f(a: String, b: String) =
          s"""list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(range(1, 65),
                     i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
                   (x, y) -> x + y)"""
        s"""
        WITH $trainedCbCtes,
        sc AS (SELECT te.vec_id, c.cid, ${f("te.v", "c.ce")} d
               FROM te CROSS JOIN tcb c),
        asgd AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d NULLS FIRST, cid) rn
                   FROM sc) WHERE rn = 1),
        lcnt AS (SELECT cid, CAST(count(1) AS BIGINT) nl
                 FROM asgd GROUP BY 1),
        cells AS (SELECT t.cid, CAST(coalesce(l.nl, 0) AS BIGINT) n_live
                  FROM tcb t LEFT JOIN lcnt l ON t.cid = l.cid),
        tot AS (SELECT CAST(sum(n_live) AS BIGINT) n,
                       CAST(count(1) AS BIGINT) nlists FROM cells),
        flg AS (SELECT cid, n_live,
                       n_live * nlists >= ${AnnPolicy.GiantCellFactor} * n
                         AS is_giant,
                       (n_live * nlists + n - 1) // n s_sub
                FROM cells CROSS JOIN tot),
        mem AS (SELECT a.vec_id, a.cid, te.v, fl.s_sub,
                       row_number() OVER (PARTITION BY a.cid
                                          ORDER BY a.vec_id) rk
                FROM asgd a JOIN te USING (vec_id)
                     JOIN flg fl ON a.cid = fl.cid AND fl.is_giant),
        seeds AS (SELECT cid, CAST(rk AS BIGINT) sub, v se FROM mem
                  WHERE rk <= s_sub),
        a1 AS (SELECT vec_id, cid, sub FROM (
                 SELECT m.vec_id, m.cid, s.sub,
                        row_number() OVER (PARTITION BY m.vec_id
                          ORDER BY ${f("m.v", "s.se")} NULLS FIRST, s.sub) rn
                 FROM mem m JOIN seeds s ON m.cid = s.cid) WHERE rn = 1),
        scm AS (SELECT a.cid, a.sub, t.dim,
                       floor(avg(m.v[t.dim + 1]) * 1000000 + 0.5)
                         / 1000000 mm
                FROM a1 a JOIN mem m USING (vec_id)
                     CROSS JOIN (SELECT unnest(range(0, 64)) dim) t
                GROUP BY 1, 2, 3),
        sc1 AS (SELECT cid, sub, list(mm ORDER BY dim) sce
                FROM scm GROUP BY 1, 2),
        a2 AS (SELECT vec_id, cid, sub FROM (
                 SELECT m.vec_id, m.cid, c.sub,
                        row_number() OVER (PARTITION BY m.vec_id
                          ORDER BY ${f("m.v", "c.sce")} NULLS FIRST, c.sub) rn
                 FROM mem m JOIN sc1 c ON m.cid = c.cid) WHERE rn = 1),
        subcnt AS (SELECT cid, sub, CAST(count(1) AS BIGINT) n_live
                   FROM a2 GROUP BY 1, 2)
        SELECT cid, CAST(0 AS BIGINT) sub, n_live FROM flg WHERE NOT is_giant
        UNION ALL
        SELECT cid, sub, n_live FROM subcnt
        ORDER BY cid, sub"""
      },
  )
}
