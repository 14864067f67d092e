package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.Par
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{CrossRound, Tables}

/** One event of a user's stream for the q63 custom-state profile;
  * `ts_us` is the µs epoch of the normalized [[StreamingQueries.eventsStream]] `ts`.
  */
private[streaming] case class UserEvent(user_id: Long, ts_us: Long, value: Double)

/** q63 running state, carried per user across micro-batches by the
  * state store: event/session counts, value sum, and the observed time
  * span. One fixed-size record per user — state scales with entity
  * cardinality, never event volume.
  */
private[streaming] case class ProfileState(
    nEvents: Long, nSessions: Long, sumValue: Double,
    firstUs: Long, lastUs: Long)

/** q63 emission row (timestamps converted from µs after the sink). */
private[streaming] case class UserProfileRow(
    user_id: Long, n_events: Long, n_sessions: Long, sum_value: Double,
    first_us: Long, last_us: Long)

/** Structured Streaming operator coverage (SURVEY §2.2 "Streaming" —
  * absent from the reference, which is batch-only; supplied here by
  * Spark's streaming engine exactly as the batch categories are supplied
  * by Spark SQL).
  *
  * Both queries return a batch-comparable `DataFrame` so the driver's
  * DuckDB oracle can grade them like any other operator:
  *   - q31 runs a REAL `readStream` → windowed-aggregation →
  *     `Trigger.AvailableNow` job over the events parquet and hands back
  *     the memory-sink table; on a bounded input the final complete-mode
  *     state equals the batch group-by, which is what the oracle checks.
  *   - q32 exercises `session_window` (the streaming-native gap-session
  *     operator) through the batch path — same operator semantics, plus
  *     a watermarked streaming run covered in StreamingQueriesSpec.
  *   - q62 is the stream-stream join proper (both sides unbounded,
  *     watermark-bounded join state, event-time range condition).
  *   - q63 is arbitrary stateful processing (flatMapGroupsWithState)
  *     with one fixed-size state record per user.
  *
  * Scale: the streaming aggregation shuffles once on the window/group
  * keys with partial aggregation map-side (same plan shape as batch);
  * state store size is bounded by #(windows × event_types) — calendar
  * time × small enum, not data volume — so a 100× input only widens the
  * per-batch scan, never the state.
  */
object StreamingQueries {

  private val sinkCounter = new AtomicInteger(0)

  /** Last EXECUTED physical plan per streaming query, captured right
    * after each run terminates (VERDICT r5 #6): streaming plans only
    * exist post-execution (`IncrementalExecution`), so the batch-style
    * `queryExecution.executedPlan` audit can't see them. tools/
    * gen_plans reads this map to give the 7 streaming rows the same
    * pinned audit as the batch ones, and PlanShapeSpec asserts the
    * state-operator shapes. Public: the audit script runs in a plain
    * spark-shell outside the graft package. */
  val executedPlans =
    scala.collection.concurrent.TrieMap[String, String]()

  /** Per-micro-batch `triggerExecution` durations (ms) of the most
    * recent run of each streaming query, captured alongside the plan
    * (VERDICT r6 #8): the bench wall time for a streaming query is
    * dominated by job lifecycle (planning, state-store init, WALs), so
    * Bench reports these as `streaming_batch_ms` — the steady-state
    * number a long-lived stream actually sees — next to the wall time.
    * Public for the same reason as [[executedPlans]]. */
  val batchDurationsMs =
    scala.collection.concurrent.TrieMap[String, Seq[Long]]()

  /** State-store rows remaining after the final micro-batch of the most
    * recent run of each streaming query (from the last progress event's
    * state operators). The WATERMARK-BOUNDED serving variants exist to
    * keep this number from growing with stream age — q142's complete
    * mode holds every query ever seen, q142b's append mode must evict
    * each emitted window — so Round15OpsSpec pins it at 0 for q142b.
    * Public for the same reason as [[executedPlans]]. */
  val stateRowsAfter =
    scala.collection.concurrent.TrieMap[String, Long]()

  /** The doc_id boundary the most recent state-TRIGGERED flush (q161)
    * committed at — spec-facing: the window close fires from observed
    * state size inside the run, so the boundary is a runtime fact, not
    * a harness input (VERDICT r17 next-round #2). */
  val flushBoundary =
    scala.collection.concurrent.TrieMap[String, Long]()

  /** Captures `q.explain()`'s output (the public surface over
    * `lastExecution.executedPlan`) without touching private[sql] API,
    * plus the run's per-batch durations from the progress log. */
  private def capturePlan(name: String,
      q: org.apache.spark.sql.streaming.StreamingQuery,
      accumulate: Boolean = false): Unit =
    try {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        q.explain()
      }
      executedPlans(name) = bos.toString("UTF-8")
      val runMs = q.recentProgress.toSeq
        .flatMap(p => Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue()))
      // `accumulate` is for multi-incarnation lifecycles (q160 runs
      // two streaming windows per invocation): the steady-state batch
      // metric must cover BOTH incarnations' triggers, not just the
      // last one's (ADVICE r17). Bench resets the map per run by
      // query, so accumulation never crosses runs: the FIRST window of
      // each invocation overwrites.
      batchDurationsMs(name) =
        (if (accumulate) batchDurationsMs.getOrElse(name, Nil) else Nil) ++
          runMs
    } catch { case _: Throwable => () }

  /** The events feed as a streaming DataFrame with `ts` normalized to a
    * session-tz µs TimestampType — the streaming twin of
    * [[Tables.events]]. File sources need an explicit schema, and
    * `events.ts` has shipped in two parquet layouts across testdata
    * generations (TIMESTAMP(NANOS), read as ns longs under the legacy
    * conf; TIMESTAMP(MICROS) `isAdjustedToUTC=false`, read as
    * TIMESTAMP_NTZ), so sniff the batch footer once per call and
    * declare the matching type before normalizing. The footer read is a
    * driver-side metadata fetch, not a data scan.
    */
  private def eventsStream(s2: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[String] = None): DataFrame = {
    val tsType = s2.read.option("pathGlobFilter", glob).parquet(dir)
      .schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val reader = s2.readStream.schema(schema).option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val df = reader.parquet(dir)
    tsType match {
      case LongType => // nanos-as-long: floor to µs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // micros NTZ: value-preserving under UTC
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** 30-minute session gap in µs (the q32/q63 session rule). */
  private val sessionGapUs = 30L * 60 * 1000000L

  /** q63's state-update function: merges one micro-batch of a user's
    * events (sorted by event time within the batch) into the running
    * [[ProfileState]]. A new session starts when the gap from the last
    * seen event is >= 30 min — the same rule as q32's `session_window`
    * (which merges only strictly-overlapping [ts, ts+gap) windows).
    * Emits the updated profile once per (user, batch).
    *
    * The per-group sort buffers ONE user's batch slice — bounded by the
    * batch interval, not the corpus; a user whose in-batch events arrive
    * unsorted across micro-batch boundaries would need a watermark-held
    * reorder buffer, which this profile (monotone counters) doesn't.
    */
  private[streaming] def updateProfile(uid: Long, rows: Iterator[UserEvent],
      state: GroupState[ProfileState]): Iterator[UserProfileRow] = {
    val evs = rows.toArray.sortBy(_.ts_us)
    var st = state.getOption.getOrElse(
      ProfileState(0L, 0L, 0.0, Long.MaxValue, Long.MinValue))
    evs.foreach { e =>
      val newSession = st.nEvents == 0L || e.ts_us - st.lastUs >= sessionGapUs
      st = ProfileState(
        st.nEvents + 1L,
        st.nSessions + (if (newSession) 1L else 0L),
        st.sumValue + e.value,
        math.min(st.firstUs, e.ts_us),
        math.max(st.lastUs, e.ts_us))
    }
    state.update(st)
    Iterator.single(UserProfileRow(
      uid, st.nEvents, st.nSessions, st.sumValue, st.firstUs, st.lastUs))
  }

  /** documents.parquet schema for readStream. */
  private val docsStreamSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val embStreamSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** The q149 curation stream: quality ∧ decontamination gates (both
    * map-only, integer/dyadic-exact booleans) BEFORE the dedup state,
    * then exact dedup vs everything-already-curated — one boolean per
    * distinct content hash in flatMapGroupsWithState. Shared between
    * the registered q149 (memory sink) and the restart-recovery
    * witness (checkpointed file sink), so both drive the IDENTICAL
    * stateful pipeline. */
  private[streaming] def curateStream(s2: SparkSession, dir: String,
      maxFilesPerTrigger: Option[String]): DataFrame = {
    import s2.implicits._
    // Monotone-arrival guard (ADVICE r15): the dedup state keeps ONE
    // boolean per content hash, so the emitted survivor is the min
    // doc_id of the FIRST micro-batch containing that hash — equal to
    // the batch twin's global min ONLY when files arrive in doc_id
    // order. FileStreamSource drains files in (modification time,
    // path) order, so a multi-file staging whose doc_id ranges
    // interleave across that order (e.g. mod-striped staging) would
    // silently emit a non-min survivor. Refuse it up front: each
    // file's doc_id range must sit strictly above its predecessor's.
    // One (min, max) agg per staged file — footer-cheap, and skipped
    // entirely on the standard single-file corpora.
    val staged = graft.operators.PipelineQueries.docStems(s2, dir)
      .sortBy(f => (f.getModificationTime, f.getPath.toString))
    if (staged.length > 1) {
      // flatMap: a zero-row staged file has NULL min/max — it carries
      // no docs, so it cannot violate arrival order; skip it rather
      // than NPE on the unboxing (review finding, r16).
      val ranges = staged.flatMap { f =>
        val r = s2.read.parquet(f.getPath.toString)
          .agg(min("doc_id"), max("doc_id")).head()
        if (r.isNullAt(0)) None
        else Some((f.getPath.getName, r.getLong(0), r.getLong(1)))
      }
      ranges.sliding(2).foreach {
        case Seq((pn, _, pMax), (cn, cMin, _)) =>
          require(cMin > pMax,
            s"q149 staging violates monotone doc_id arrival: $cn " +
              s"(min doc_id $cMin) follows $pn (max doc_id $pMax); " +
              "the first-batch survivor would not be the global min. " +
              "Stage files so doc_id ranges increase in arrival order.")
        case _ => ()
      }
    }
    val bench: Array[Long] = graft.operators.PipelineQueries
      .benchSortedSidsGlob(s2, dir)
    val weights = (0 until 64).map { j =>
      ((j.toLong * 2654435761L) % 4294967296L) / 4294967296.0 - 0.5
    }.toArray

    val reader = s2.readStream
      .schema(docsStreamSchema)
      .option("pathGlobFilter", "documents*.parquet")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(dir)

    val toksExpr = "array_remove(split(text, ' '), '')"
    val gated = stream
      .filter($"doc_id" >= 10) // the eval set never trains
      .select($"doc_id", md5($"text").as("eh"), expr(toksExpr).as("toks"))
      .filter(size($"toks") > 0)
      .withColumn("sids",
        graft.functions.GraftFunctions.polyHashArray($"toks"))
      .withColumn("dot",
        graft.functions.GraftFunctions.bucketDot($"sids", lit(weights)))
      .withColumn("ssids", array_distinct(
        graft.functions.GraftFunctions.polyHashArray(
          graft.functions.GraftFunctions.shingles3($"toks"))))
      .withColumn("n_sh", size($"ssids").cast("long"))
      .withColumn("n_ov", graft.functions.GraftFunctions
        .sortedCountIn($"ssids", lit(bench)).cast("long"))
      .filter($"dot" >= 0 &&
        ($"n_sh" === 0 || $"n_ov" * 2 < $"n_sh"))
      .select($"doc_id", $"eh",
        CrossRound.r($"dot" / size($"sids"), 4).as("quality_logit"),
        when($"n_sh" === 0, lit(0.0))
          .otherwise(CrossRound.r($"n_ov" / $"n_sh", 4)).as("overlap_ratio"))

    gated
      .as[(Long, String, Double, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(Long, String, Double, Double)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val r = rows.minBy(_._1)
            Iterator((r._1, r._3, r._4))
          }
      }
      .toDF("doc_id", "quality_logit", "overlap_ratio")
  }

  /** The q155 near-dup ingest stream (VERDICT r15 #6): the q149 gates
    * (quality ∧ decontamination, both map-only, integer/dyadic-exact)
    * applied to each ARRIVING delta document, then q81's MinHash
    * banded probe against the PERSISTED corpus posting index — a
    * stream-static equality join on the bucketed (band, sig) keys,
    * STATELESS per micro-batch — then the n_match ≥ 8 signature
    * verify inside a per-doc flatMapGroupsWithState whose state is ONE
    * boolean per candidate-bearing delta doc (the q133/q141/q149
    * state class: bounded by distinct arriving docs, never stream
    * volume or index size). All of a doc's band rows arrive in its own
    * micro-batch (a doc lives in exactly one staged file), so the
    * per-doc group sees its complete candidate set; the state boolean
    * only guards pathological re-delivery. */
  /** The GATED delta-signature stream shared by q155 and q158: each
    * arriving delta doc (doc_id ≥ cut) through the q149 quality ∧
    * decontamination gates, then its MinHash(16) signature over the
    * shingle-sid set. Returns (the (doc_id, mh) stream, the static
    * posting-index side keyed (band, sig), the cut). */
  /** The q149 quality ∧ decontamination gates + MinHash(16) signature
    * over any documents frame (streaming OR batch — the expressions
    * are all map-only). ONE body for the live gate in [[gatedDeltaSigs]]
    * and the q160 flush job's batch recomputation of a closed window's
    * gated postings, so the absorbed index and the stream's state can
    * never disagree on what passed the gate. Returns (doc_id, mh). */
  private[graft] def gateAndSign(docs: DataFrame,
      bench: Array[Long]): DataFrame = {
    val s2 = docs.sparkSession; import s2.implicits._
    val weights = (0 until 64).map { j =>
      ((j.toLong * 2654435761L) % 4294967296L) / 4294967296.0 - 0.5
    }.toArray
    val toksExpr = "array_remove(split(text, ' '), '')"
    docs
      .select($"doc_id", expr(toksExpr).as("toks"))
      .filter(size($"toks") > 0)
      .withColumn("sids",
        graft.functions.GraftFunctions.polyHashArray($"toks"))
      .withColumn("dot",
        graft.functions.GraftFunctions.bucketDot($"sids", lit(weights)))
      .withColumn("ssids", array_distinct(
        graft.functions.GraftFunctions.polyHashArray(
          graft.functions.GraftFunctions.shingles3($"toks"))))
      .withColumn("n_sh", size($"ssids").cast("long"))
      .withColumn("n_ov", graft.functions.GraftFunctions
        .sortedCountIn($"ssids", lit(bench)).cast("long"))
      .filter($"dot" >= 0 &&
        ($"n_sh" === 0 || $"n_ov" * 2 < $"n_sh"))
      .filter(size($"ssids") > 0)
      .withColumn("mh",
        graft.functions.GraftFunctions.minhashSigs($"ssids", 16))
      .select($"doc_id", $"mh")
  }

  /** `probeIdxs`: the static posting tables the arrivals probe — Nil
    * means the live q81 artifact; q159 passes the forget-REWRITTEN
    * table (q154's bytes), q160's window-2 incarnation the base index
    * PLUS the O(window) flush table. Multiple tables are returned as
    * SEPARATE frames, never unioned at the relation level: each keeps
    * its bucketed zero-index-side-Exchange join plan (`UnionExec`
    * reports no output partitioning, so a pre-join union would plan an
    * Exchange over the whole index), and the caller unions the JOIN
    * RESULTS — the tables are doc-disjoint, so so are the pair sets.
    * `window`: half-open [lo, hi) arrival filter on doc_id — the q160
    * delta-window split; the gate/cut semantics are unchanged. */
  private def gatedDeltaSigs(s2: SparkSession, dir: String,
      maxFilesPerTrigger: Option[String],
      probeIdxs: Seq[DataFrame] = Nil,
      window: Option[(Long, Long)] = None)
      : (DataFrame, Seq[DataFrame], Long) = {
    import s2.implicits._
    val bench: Array[Long] = graft.operators.PipelineQueries
      .benchSortedSidsGlob(s2, dir)
    val (indexes, cut) =
      if (probeIdxs.nonEmpty)
        (probeIdxs, graft.operators.DedupQueries.postingIndex(s2, dir)._2)
      else {
        val (idx, c) = graft.operators.DedupQueries.postingIndex(s2, dir)
        (Seq(idx), c)
      }
    val idxSides = indexes.map(_.select($"band", $"sig",
      $"doc_id".as("corpus_doc"), $"mh".as("bmh")))

    val reader = s2.readStream
      .schema(docsStreamSchema)
      .option("pathGlobFilter", "documents*.parquet")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(dir)

    val arriving = window.foldLeft(stream.filter($"doc_id" >= cut)) {
      case (df, (lo, hi)) => df.filter($"doc_id" >= lo && $"doc_id" < hi)
    }
    (gateAndSign(arriving, bench), idxSides, cut)
  }

  private[streaming] def neardupIngestStream(s2: SparkSession, dir: String,
      maxFilesPerTrigger: Option[String],
      probeIdxs: Seq[DataFrame] = Nil): DataFrame = {
    import s2.implicits._
    val (gated, idxSides, _) =
      gatedDeltaSigs(s2, dir, maxFilesPerTrigger, probeIdxs)
    val banded = gated
      .select($"doc_id", $"mh",
        graft.operators.PipelineQueries.mhBandCols.as(Seq("band", "sig")))
    idxSides.map(banded.join(_, Seq("band", "sig")))
      .reduce(_.unionByName(_))
      .select($"doc_id".as("new_doc"), $"mh".as("amh"),
        $"corpus_doc", $"bmh")
      .as[(Long, Seq[Long], Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (newDoc: Long, rows: Iterator[(Long, Seq[Long], Long, Seq[Long])],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val seen = scala.collection.mutable.Set[Long]()
            rows.flatMap { case (_, amh, corpusDoc, bmh) =>
              if (!seen.add(corpusDoc)) None
              else {
                val nm = amh.iterator.zip(bmh.iterator)
                  .count { case (x, y) => x == y }.toLong
                if (nm >= 8L)
                  Some((newDoc, corpusDoc, nm,
                    math.floor(nm / 16.0 * 10000 + 0.5) / 10000))
                else None
              }
            }.toVector.sortBy(r => (r._1, r._2)).iterator
          }
      }
      .toDF("new_doc", "corpus_doc", "n_match", "est_sim")
  }

  /** The q158 streaming LSH INDEX (SCALE.md §11.5's named next piece):
    * q155 probes the static corpus index only, so near-dups WITHIN the
    * arriving delta are invisible. q158 additionally MAINTAINS a live
    * banded posting store as state — keyed by (band, sig), holding the
    * arrived gated docs' (doc_id, mh) postings, the same bounded class
    * as the persisted q81 index restricted to the delta — and matches
    * each arrival against (a) the static corpus index (stream-static
    * join, stateless) and (b) the live store (flatMapGroupsWithState
    * per bucket: pair against stored + earlier-in-batch postings, then
    * append self). Pair labels are (max, min) doc_id, so the emitted
    * PAIR SET is arrival-order-INDEPENDENT (a pair emits when its
    * second member arrives, whichever that is) — unlike q149 no
    * monotone-staging contract is needed, and the spec pins equality
    * under mod-striped staging. The n_match ≥ 8 verify runs where both
    * signatures are in hand (a column expression on the corpus branch,
    * in-state on the delta branch — same integer compare); duplicate
    * candidates across bands collapse in a chained dropDuplicates
    * whose state is one row per verified pair (bounded by the output,
    * not the stream). Batch twin: q81's statement over the gated set
    * with the candidate relation widened to delta×delta (b < a). */
  private[streaming] def lshIndexStream(s2: SparkSession, dir: String,
      maxFilesPerTrigger: Option[String],
      probeIdxs: Seq[DataFrame] = Nil,
      window: Option[(Long, Long)] = None): DataFrame = {
    import s2.implicits._
    val (gated, idxSides, _) =
      gatedDeltaSigs(s2, dir, maxFilesPerTrigger, probeIdxs, window)
    val banded = gated.select($"doc_id", $"mh",
      graft.operators.PipelineQueries.mhBandCols.as(Seq("band", "sig")))

    val nmExpr =
      expr("size(filter(zip_with(amh, bmh, (x, y) -> x = y), z -> z))")
        .cast("long")
    val corpusPairs = idxSides.map { idxSide =>
      banded
        .join(idxSide, Seq("band", "sig"))
        .select($"doc_id".as("doc_a"), $"corpus_doc".as("doc_b"),
          $"mh".as("amh"), $"bmh")
        .withColumn("n_match", nmExpr)
        .filter($"n_match" >= 8)
        .select($"doc_a", $"doc_b", $"n_match")
    }.reduce(_.unionByName(_))

    val intraPairs = banded
      .select(concat($"band", lit("|"), $"sig").as("bk"), $"doc_id", $"mh")
      .as[(String, Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long, Seq[Long])],
         state: GroupState[Seq[(Long, Seq[Long])]]) =>
          var seen = state.getOption.getOrElse(Seq.empty)
          // Replay guard: a doc already in the store (batch re-delivery
          // after checkpoint recovery) must not re-pair or re-append —
          // output would survive the downstream dropDuplicates anyway,
          // but state and per-arrival compare work would grow per replay.
          val stored = seen.iterator.map(_._1).toSet
          val arrived = rows.map(r => (r._2, r._3)).toVector
            .distinctBy(_._1).sortBy(_._1)
            .filterNot(r => stored.contains(r._1))
          val out = Vector.newBuilder[(Long, Long, Long)]
          arrived.foreach { case (d, mh) =>
            seen.foreach { case (d2, mh2) =>
              if (d2 != d) {
                val nm = mh.iterator.zip(mh2.iterator)
                  .count { case (x, y) => x == y }.toLong
                if (nm >= 8L)
                  out += ((math.max(d, d2), math.min(d, d2), nm))
              }
            }
            seen = seen :+ ((d, mh))
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF("doc_a", "doc_b", "n_match")

    corpusPairs.unionByName(intraPairs)
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est_sim",
        floor($"n_match" / 16.0 * 10000 + 0.5) / 10000)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- streaming tumbling-window aggregation over the events feed -----
    // readStream → 1h window × event_type agg → AvailableNow → memory sink.
    "q31_stream_window" -> { (s, dir) =>
      // Per-query tuning (state partition count, state-store provider)
      // belongs to THIS query, not the shared session: newSession()
      // shares the SparkContext but owns an isolated SQL conf, so
      // nothing here leaks or races with concurrent callers (r2
      // VERDICT #8 — the previous version flipped the shared conf and
      // restored it in a finally).
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // State keys = windows × event_types (calendar-bounded, ~thousands)
      // — each state-store partition costs ~400 ms/batch in checkpoint
      // IO (measured: 8 partitions → 3.0 s addBatch, 1 → 0.7 s), so
      // extra partitions multiply overhead for no parallelism gain. The
      // map-side partial aggregation stays fully parallel; only the
      // final state update narrows. At 100 TB the state is STILL
      // calendar-bounded — this knob scales with window count, not
      // input rows.
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      // Documented toggle: the HDFS-backed provider (default) holds
      // state on the executor heap — right for calendar-bounded state
      // like this window agg. Set spark.graft.streaming.stateStore=
      // rocksdb on the calling session for state that grows with key
      // cardinality (per-user dedup, large session maps): RocksDB keeps
      // state off-heap/on-disk with incremental checkpoints.
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      // File streaming sources take a directory; glob-filter to the
      // events table (one file per table in the testdata layout).
      val stream = eventsStream(s2, dir)

      val agg = stream
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
             round(sum($"value"), 2).as("sum_value"))
        .select($"window.start".as("hour_start"), $"event_type",
                $"n_events", $"sum_value")

      val sink = s"q31_sink_${sinkCounter.incrementAndGet()}"
      val q = agg.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete") // final state == batch aggregate
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q31_stream_window", q)
      s2.table(sink).orderBy($"hour_start", $"event_type")
    },

    // ----- streaming stateful dedup (dropDuplicates over a stream) -----
    // Keep-first semantics over the (user_id, event_type) key stream —
    // the streaming form of training-pipeline dedup. Only the KEYS are
    // emitted, so the result is deterministic under parallelism (which
    // arrival wins is not) and equals batch DISTINCT on a bounded input
    // — what the oracle checks. State = one entry per distinct key:
    // bounded by entity cardinality, not event volume. For unbounded key
    // spaces use dropDuplicatesWithinWatermark (state then bounded by
    // the watermark horizon) and the RocksDB provider toggle below —
    // this is precisely the state class that outgrows the executor heap.
    "q50_stream_dedup" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      val stream = eventsStream(s2, dir)

      val dedup = stream
        .select($"user_id", $"event_type")
        .dropDuplicates("user_id", "event_type")

      val sink = s"q50_sink_${sinkCounter.incrementAndGet()}"
      val q = dedup.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q50_stream_dedup", q)
      s2.table(sink).orderBy($"user_id", $"event_type")
    },

    // ----- streaming decontamination (gate-at-ingest) -----
    // The q51 contract run AS the corpus arrives: the benchmark sid set
    // is computed batch-side once (eval suites are small by
    // construction) and pinned into the stream as a SORTED array
    // literal; each arriving document is tokenized, shingled, hashed,
    // and overlap-counted ENTIRELY map-side (native shingles3 →
    // poly_hash_array → sorted_count_in kernels — binary search per
    // sid, no per-row set builds, no stream-side aggregation, so append
    // mode needs no watermark and every output row is deterministic).
    // At 100 TB/day this is the ingest-gate shape: per-row work is
    // O(shingles·log |bench|), state is zero.
    "q59_stream_decontaminate" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")

      val bench: Array[Long] = graft.operators.PipelineQueries
        .benchSortedSids(s2, dir)

      val stream = s2.readStream
        .schema(docsStreamSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)

      val toksExpr = "array_remove(split(text, ' '), '')"
      val gated = stream
        .filter($"doc_id" >= 10)
        .select($"doc_id", array_distinct(
          graft.functions.GraftFunctions.polyHashArray(
            graft.functions.GraftFunctions.shingles3(expr(toksExpr))))
          .as("sids"))
        .select($"doc_id",
          size($"sids").cast("long").as("n_shingles"),
          graft.functions.GraftFunctions.sortedCountIn($"sids", lit(bench))
            .cast("long").as("n_overlap"))
        .withColumn("overlap_ratio", CrossRound.r($"n_overlap" / $"n_shingles", 4))
        .withColumn("contaminated", ($"n_overlap" / $"n_shingles") >= 0.5)

      val sink = s"q59_sink_${sinkCounter.incrementAndGet()}"
      val q = gated.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q59_stream_decontaminate", q)
      s2.table(sink).orderBy($"doc_id")
    },

    // ----- streaming quality gate (model scoring at ingest) -----
    // q73's hashed-feature linear classifier run WHERE a production
    // pipeline runs it: at ingestion, before anything lands. The whole
    // scorer — tokenize, poly-hash, bucket_dot against the broadcast
    // weight literal — is map-only, so the streaming plan has ZERO
    // state, no watermark, and no stream-side shuffle: each micro-batch
    // scores and gates independently at ingest rate. Results equal the
    // batch q73 exactly (same kernels, same dyadic-exact arithmetic),
    // which is what the shared oracle asserts.
    "q75_stream_quality" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")

      val weights = (0 until 64).map { j =>
        ((j.toLong * 2654435761L) % 4294967296L) / 4294967296.0 - 0.5
      }.toArray

      val stream = s2.readStream
        .schema(docsStreamSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)

      val toksExpr = "array_remove(split(text, ' '), '')"
      val gated = stream
        .select($"doc_id",
          graft.functions.GraftFunctions.polyHashArray(expr(toksExpr)).as("sids"))
        .filter(size($"sids") > 0)
        .withColumn("logit",
          graft.functions.GraftFunctions.bucketDot($"sids", lit(weights)) /
            size($"sids"))
        .select($"doc_id", size($"sids").cast("long").as("n_tokens"),
          CrossRound.r($"logit", 4).as("quality_logit"),
          ($"logit" >= 0).as("keep"))

      val sink = s"q75_sink_${sinkCounter.incrementAndGet()}"
      val q = gated.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q75_stream_quality", q)
      s2.table(sink).orderBy($"doc_id")
    },

    // ----- streaming chunk-store dedup (CDC dedup at ingest) -----
    // q129+q104's batch form run WHERE a production dedup store runs
    // it: as content arrives. Each arriving document is chunked
    // map-side by the IDENTICAL content-defined rule as batch q129
    // (3-token rolling signature % 16 == 0 — same native kernels, same
    // expression chain), each chunk's 8-byte polynomial signature is
    // emitted, and `dropDuplicates` keyed on the signature answers the
    // ingest question: WHICH chunks must be written to the
    // content-addressed store. Only the keys are emitted (q50's
    // argument — which arrival wins is parallelism-dependent, the key
    // set is not), so on a bounded input the result equals the batch
    // DISTINCT over q129's chunk relation — what the shared oracle
    // checks. State = one 8-byte entry per DISTINCT chunk: the
    // content-store's key set, which CDC keeps stable under document
    // edits (only genuinely novel chunks grow it); for an unbounded
    // store horizon use dropDuplicatesWithinWatermark + the RocksDB
    // provider, exactly as q50 notes. Per-batch work is map-side
    // chunking + one shuffle of 8-byte signatures to the dedup state
    // operator — text never leaves the scanning task.
    "q133_stream_chunk_dedup" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      // The chunk-store key set is exactly the state class that
      // outgrows an executor heap (it grows with distinct content, not
      // entities), so the RocksDB provider toggle matters here most.
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      // documents*.parquet: one file in testdata, but a staged
      // multi-file feed exercises the dedup state ACROSS micro-batches
      // (q63's staging trick; StreamingQueriesSpec pins that a chunk
      // seen in batch 1 is not re-emitted by batch 2).
      val reader = s2.readStream
        .schema(docsStreamSchema)
        .option("pathGlobFilter", "documents*.parquet")
      s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
        .foreach(n => reader.option("maxFilesPerTrigger", n))
      val stream = reader.parquet(dir)

      val toksExpr = "array_remove(split(text, ' '), '')"
      val sigs = stream
        .select(expr(toksExpr).as("toks"))
        .filter(size($"toks") > 0)
        .select(
          graft.functions.GraftFunctions.polyHashArray($"toks").as("thash"),
          graft.functions.GraftFunctions.polyHashArray(
            graft.functions.GraftFunctions.shingles3($"toks")).as("sh"))
        .withColumn("bnds", expr(
          """CASE WHEN size(sh) = 0 THEN array()
             ELSE filter(sequence(0, size(sh) - 1),
                         p -> element_at(sh, CAST(p + 1 AS INT)) % 16 = 0)
             END"""))
        .withColumn("starts",
          expr("concat(array(0), transform(bnds, p -> CAST(p + 3 AS INT)))"))
        .withColumn("ends", expr(
          "concat(transform(bnds, p -> CAST(p + 3 AS INT)), array(size(thash)))"))
        .select(explode(expr(
          """filter(zip_with(starts, ends, (st, en) -> IF(en > st,
               aggregate(slice(thash, st + 1, en - st),
                 CAST(0 AS BIGINT), (h, x) -> (h * 131 + x) % 1000000007),
               NULL)), c -> c IS NOT NULL)""")).as("sig"))
        .dropDuplicates("sig")

      val sink = s"q133_sink_${sinkCounter.incrementAndGet()}"
      val q = sigs.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q133_stream_chunk_dedup", q)
      s2.table(sink).orderBy($"sig")
    },

    // ----- streaming heavy hitters (mergeable sketch at ingest) -----
    // q135's Misra–Gries propose stage run WHERE a monitoring pipeline
    // runs it: as a streaming aggregation. The 64-counter mergeable
    // summary ([[graft.functions.MisraGriesAgg]]) IS the aggregation
    // state — one O(k) buffer total, regardless of stream volume or
    // vocabulary size (the reason a sketch, not a count table, is what
    // a stream can afford to keep: a per-token streaming count would
    // grow state with the vocabulary). Complete-mode AvailableNow over
    // the bounded input yields a summary whose CONTENT may differ from
    // the batch run's (Misra–Gries summaries are partition-order
    // dependent) but whose GUARANTEE is schedule-independent — every
    // token with count > N/65 holds a live counter (`MisraGriesSpec`
    // property-tests exactly this over random merge schedules) — so the
    // batch-side exact verify emits the identical final rows and the
    // shared q135 oracle grades both paths hash-for-hash.
    "q139_stream_heavy_hitters" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      val mg = udaf(new graft.functions.MisraGriesAgg(64))
      val stream = s2.readStream
        .schema(docsStreamSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)

      val toksExpr = "array_remove(split(text, ' '), '')"
      val agg = stream
        .select(explode(expr(toksExpr)).as("w"))
        .agg(mg($"w").as("summary"), count(lit(1)).as("n"))

      val sink = s"q139_sink_${sinkCounter.incrementAndGet()}"
      val q = agg.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q139_stream_heavy_hitters", q)

      // Exact verify, batch-side (the q135 contract): candidates are
      // the ≤ 64 sketch survivors; false positives die here, false
      // negatives cannot exist by the MG bound.
      val last = s2.table(sink)
      val cands = last.select(explode($"summary").as("e"))
        .select($"e.token".as("w"))
      val tot = last.select($"n".cast("long").as("n"))
      Tables(s2, dir).documents.repartition($"doc_id")
        .select(explode(expr(toksExpr)).as("w"))
        .join(broadcast(cands), "w")
        .groupBy($"w").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter($"cnt" * 64 > $"n")
        .select($"w".as("token"), $"cnt", $"n",
          CrossRound.r($"cnt".cast("double") / $"n", 6).as("frac"))
        .orderBy($"cnt".desc, $"token")
    },

    // ----- streaming vector ingestion: IVFPQ cell routing + ingest dedup -----
    // The vector-database ingest path: embeddings arrive as a stream,
    // each is routed to its IVF list (nearest coarse centroid — the
    // family's shared every-125th codebook, q36/q60/q68 contract) and
    // quantized to its 8-subspace PQ code (q60's exact cell
    // arithmetic); the ledger keeps ONE row per occupied (list, code)
    // cell — canonical vector = min vec_id, plus how many ingested
    // vectors collapsed into the cell (the quantization-duplicate
    // count an ingest pipeline uses to short-circuit re-indexing).
    //
    // The scale design is what this query exists to demonstrate:
    // routing must NOT be a streaming aggregation. The static codebook
    // folds into ONE broadcastable row of array<struct<cid, ce>>, a
    // stream-static cross join pins it to every arriving row, and both
    // the full-dim argmin and the 8 per-subspace argmins are PURE
    // PER-ROW expressions (array_min over a transform — struct
    // ordering compares d then cid, the oracle's row_number twin), so
    // the only stateful operator is the final (cid, pcode) aggregate:
    // one state row per OCCUPIED CELL. That is the q133 chunk-store
    // argument, not q139's O(k): the ledger grows with DISTINCT
    // ingested content (≤ min(stream volume, cell space)) — on this
    // repo's near-random embeddings with the fixture's n/125-centroid
    // codebook, occupancy is close to one cell per vector, and a
    // production deployment bounds it the way production PQ does:
    // a FIXED small per-subspace codebook (e.g. 256 trained codes),
    // which caps per-cell re-ingest cost and concentrates duplicates
    // without changing this plan's shape. On bounded input the
    // complete-mode final state equals the batch group-by, which is
    // what the oracle computes; every distance is a left-to-right
    // fold of exactly-rounded doubles (the q60-proven parity shape),
    // so cell assignment can never tie-split across engines.
    "q141_stream_vector_ingest" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      // BOUNDED-INPUT CONTRACT (ADVICE r13 #1): this codebook is a
      // batch read over the SAME directory the stream ingests, and the
      // static side of a stream-static join re-executes per
      // micro-batch — files landing mid-run would shift centroid
      // assignment between batches and destabilize the (cid, pcode)
      // ledger keys. Safe here ONLY because the query runs under
      // Trigger.AvailableNow over a fixed file set (the verify-harness
      // contract every streaming query in this registry shares). A
      // continuous-trigger deployment must freeze the codebook instead
      // — which is exactly what q141b does (trained-codebook artifact
      // parquet, immutable for the life of the run).
      val cb = s2.read.option("pathGlobFilter", "embeddings*.parquet")
        .parquet(dir)
        .filter($"vec_id" % 125 === 0)
        .select($"vec_id".as("cid"), $"embedding".as("ce"))
        .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))

      val reader = s2.readStream
        .schema(embStreamSchema)
        .option("pathGlobFilter", "embeddings*.parquet")
      s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
        .foreach(n => reader.option("maxFilesPerTrigger", n))
      val stream = reader.parquet(dir)

      // Explicit-width repartition BEFORE the heavy per-row routing:
      // the embeddings feed is one parquet split per file, and the
      // O(K)-per-row routing above a broadcast join runs at the probe
      // side's width — unrepartitioned, the 40× witness measured the
      // whole micro-batch serialized onto one core (the q127
      // broadcast-probe-width lesson, streaming edition). Explicit 32
      // because this session pins shuffle.partitions=2 for the small
      // state-store stage.
      //
      // The distance arithmetic is the NATIVE [[graft.functions
      // .PqSubDists]] kernel, one fused 64-dim loop per (row,
      // centroid), composed into the per-row HOFs through the typed
      // `transform(col, fn)` API (no FunctionRegistry dependency) —
      // an all-lambda zip_with/aggregate formulation was 50× slower
      // interpreted (the 40× witness measured 216 s per micro-batch
      // at 80k vectors; the shinglesCol HOF lesson again). The
      // full-dim distance is the ordered fold of the 8 subspace sums
      // (identical grouping in the oracle via list(d ORDER BY s)), so
      // the IVF argmin and the 8 PQ argmins read ONE dsub array.
      val tf = org.apache.spark.sql.functions.transform(_: Column, _: Column => Column)
      val routed = stream
        .repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cb))
        .withColumn("dsub", tf($"cb", c => struct(
          c.getField("cid").as("cid"),
          graft.functions.GraftFunctions
            .pqSubDists($"embedding", c.getField("ce"), 8).as("ds"))))
        .withColumn("cid", array_min(tf($"dsub", x => struct(
          aggregate(x.getField("ds"), lit(0.0d), (a, b) => a + b).as("d"),
          x.getField("cid").as("cid")))).getField("cid"))
        .withColumn("pcode", array_join(
          tf(sequence(lit(0), lit(7)), s =>
            array_min(tf($"dsub", x => struct(
              element_at(x.getField("ds"), (s + 1).cast("int")).as("d"),
              x.getField("cid").as("cid")))).getField("cid").cast("string")),
          "-"))

      val ledger = routed
        .groupBy($"cid", $"pcode")
        .agg(count(lit(1)).as("n_ingested"),
          min($"vec_id").as("canonical_vec"))

      val sink = s"q141_sink_${sinkCounter.incrementAndGet()}"
      val q = ledger.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q141_stream_vector_ingest", q)
      s2.table(sink).orderBy($"cid", $"pcode")
    },

    // ----- streaming IVFPQ ingest over the TRAINED fixed-K codebook -----
    // q141 with its every-125th-vector fixture codebook (K = n/125 —
    // the VERDICT r13 #1 quadratic-by-construction seam; the 40×
    // witness measured 4.7× wall per 4× corpus) replaced by the
    // PERSISTED q72-trained K=64 artifact: per-row routing is O(K)
    // against a ~32 KB broadcast, so ingest is LINEAR in stream volume
    // at any corpus size — the number SCALE.md §8 re-measures. The
    // codebook is read from the FROZEN artifact parquet, not the live
    // ingest directory, so the static side's per-micro-batch
    // re-execution can never shift cell routing mid-run — this variant
    // is trigger-agnostic where q141 is safe only under its bounded
    // AvailableNow contract (ADVICE r13 #1). Routing expressions are
    // [[graft.operators.PipelineQueries.pqRoute]], SHARED with the
    // q142 index build, so ledger and index can never disagree.
    "q141b_stream_ingest_trained" -> { (s, dir) =>
      // Train (or reuse) the codebook via the parent batch session
      // BEFORE the stream starts.
      graft.operators.PipelineQueries.trainedCodebook(s, dir)
      val cbPath = graft.operators.PipelineQueries.trainedCbPath(s, dir)
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      val cb = s2.read.parquet(cbPath)
        .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))

      val reader = s2.readStream
        .schema(embStreamSchema)
        .option("pathGlobFilter", "embeddings*.parquet")
      s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
        .foreach(n => reader.option("maxFilesPerTrigger", n))
      val stream = reader.parquet(dir)

      // Same explicit-width repartition as q141 (broadcast-probe-width
      // lesson, streaming edition): the one-file feed is one partition
      // and the O(K)-per-row routing runs at the probe side's width.
      val routed = graft.operators.PipelineQueries.pqRoute(
        stream.repartition(Par.width(s), $"vec_id").crossJoin(broadcast(cb)))

      val ledger = routed
        .groupBy($"cid", $"pcode")
        .agg(count(lit(1)).as("n_ingested"),
          min($"vec_id").as("canonical_vec"))

      val sink = s"q141b_sink_${sinkCounter.incrementAndGet()}"
      val q = ledger.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q141b_stream_ingest_trained", q)
      s2.table(sink).orderBy($"cid", $"pcode")
    },

    // ----- streaming ANN QUERY path over the static IVFPQ index -----
    // The other half of the vector-db story (VERDICT r13 #2): q141b
    // INGESTS vectors into IVFPQ cells; this query serves a STREAM of
    // query vectors against the persisted index. Per micro-batch, each
    // query row routes against the broadcast trained codebook (same
    // 8-subspace native-kernel distances as ingest), keeps its
    // [[graft.operators.AnnPolicy.ivfNprobe]] nearest lists, probes the
    // static (vec_id, cid, codes) index with a stream-static equality
    // join on list id, scores every candidate by ADC — 8 lookups into
    // the query's own per-centroid subspace-distance table, folded in
    // subspace order (the q60/q141-proven parity shape) — and keeps a
    // [[graft.operators.AnnPolicy.pqShortlist]]-sized shortlist per
    // query through the partial-aggregating [[graft.functions.TopKAgg]]
    // (the UDAF rides the streaming aggregation: O(queries × S) state,
    // never the candidate volume). The exact re-rank then reads ONLY
    // the shortlisted full vectors — a bounded batch join on the sink,
    // exactly the point-lookup re-rank a production serving tier runs.
    // At 100 TB: the index probe is an equality join on cid (the
    // candidates are ~nprobe/K of the codes table — 8-byte codes, not
    // vectors), the ADC table is per-query-row local, and the only
    // stateful operator is the per-query top-S aggregate. The two
    // policy dials arrive as bounded driver scalars (corpus count +
    // artifact list count — the q81-cut precedent), identical to the
    // oracle's integer-arithmetic twins.
    "q142_stream_ann_query" -> { (s, dir) =>
      val ops = graft.operators.PipelineQueries
      ops.trainedCodebook(s, dir)
      ops.ivfpqIndex(s, dir)
      val cbPath = ops.trainedCbPath(s, dir)
      val idxPath = ops.ivfpqIndexPath(s, dir)
      val nVecs = ops.embGlob(s, dir).count()
      val nLists = s.read.parquet(cbPath).count()
      val nprobe = graft.operators.AnnPolicy.ivfNprobe(nLists).toInt
      val shortS = graft.operators.AnnPolicy.pqShortlist(nVecs).toInt

      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      val cb = s2.read.parquet(cbPath)
        .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))
      val idx = s2.read.parquet(idxPath)

      val reader = s2.readStream
        .schema(embStreamSchema)
        .option("pathGlobFilter", "embeddings*.parquet")
      s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
        .foreach(n => reader.option("maxFilesPerTrigger", n))
      // Query set = vec_id < bound; 5 is the family's oracle-pinned
      // contract (Verify/the checker never override it). The bound is a
      // harness knob for the SERVING-THROUGHPUT witness only
      // (SCALE.md §9.7 runs 200 concurrent queries at 80k vectors) —
      // the q62 shufflePartitions / maxFilesPerTrigger precedent.
      val qBound = s.conf.get("spark.graft.streaming.annQueryBound", "5").toInt
      val queryStream = reader.parquet(dir).filter($"vec_id" < qBound)

      val tf = org.apache.spark.sql.functions.transform(_: Column, _: Column => Column)
      val probes = queryStream
        .repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cb))
        .withColumn("dsub", tf($"cb", c => struct(
          c.getField("cid").as("cid"),
          graft.functions.GraftFunctions
            .pqSubDists($"embedding", c.getField("ce"), 8).as("ds"))))
        // The query's per-centroid subspace-distance table as a map —
        // the ADC lookup structure (bounded: K entries × 8 doubles).
        .withColumn("dmap", map_from_entries(tf($"dsub", x =>
          struct(x.getField("cid"), x.getField("ds")))))
        // Top-nprobe lists by full-dim distance = the ordered fold of
        // the 8 subspace sums (identical grouping in the oracle).
        .withColumn("plists", slice(array_sort(tf($"dsub", x => struct(
          aggregate(x.getField("ds"), lit(0.0d), (a, b) => a + b).as("d"),
          x.getField("cid").as("cid")))), 1, nprobe))
        .select($"vec_id".as("query_id"), $"dmap",
          explode($"plists".getField("cid")).as("qcid"))

      // ADC = Σ_s dmap[codes[s]][s], folded in subspace order.
      val cand = probes.join(idx,
          probes("qcid") === idx("cid") &&
            idx("vec_id") =!= probes("query_id"))
        .withColumn("adc", aggregate(sequence(lit(0), lit(7)), lit(0.0d),
          (acc, sb) => acc + element_at(
            element_at($"dmap", element_at($"codes", (sb + 1).cast("int"))),
            (sb + 1).cast("int"))))

      // Shortlist by (adc asc, vec_id asc) — TopKAgg ranks by (score
      // desc, vec_id asc), so the score is the (exact) negated ADC.
      val topS = udaf(new graft.functions.TopKAgg(shortS))
      val short = cand.groupBy($"query_id")
        .agg(topS($"vec_id", -$"adc").as("top"))

      val sink = s"q142_sink_${sinkCounter.incrementAndGet()}"
      val q = short.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q142_stream_ann_query", q)

      // Exact re-rank over the shortlist: a BOUNDED batch join
      // (queries × S rows against the base vectors), top-5 by exact L2.
      val e = ops.embGlob(s2, dir)
      val qv = e.filter($"vec_id" < qBound)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"l2", $"vec_id")
      s2.table(sink)
        .select($"query_id", explode($"top").as("sv"))
        .select($"query_id", $"sv.vec_id".as("vec_id"))
        .join(e, "vec_id").join(broadcast(qv), "query_id")
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id",
          CrossRound.r($"l2", 4).as("l2"))
        .orderBy($"query_id", $"rank")
    },

    // ----- streaming ANN query, APPEND-mode serving variant -----
    // q142's complete mode re-emits the FULL result set every
    // micro-batch and its state holds every query ever seen — fine for
    // the oracle, wrong shape for serving (VERDICT r14 #3). This
    // variant is the serving shape: queries arrive on their OWN staged
    // stream (production queries are not carved out of the corpus
    // feed), each carrying an event time (vec_id seconds — the staged
    // feeds' arrival proxy); the aggregation groups by a 10 s
    // event-time window under a 5 s watermark, and APPEND mode emits
    // each window once — finalized — then EVICTS it from the state
    // store (complete mode's state never shrinks). A far-future
    // SENTINEL row rides the staged feed to advance the watermark past
    // every real window on a bounded run — the later-queries-keep-
    // arriving property a live serving stream has for free — so
    // [[stateRowsAfter]] pins exactly 1 surviving state row (the
    // sentinel's own never-closed window). Deriving the watermark from
    // a filter over the corpus feed does NOT work: a deterministic
    // query-set filter pushes below the EventTimeWatermark node, so
    // the watermark only ever sees the filtered rows (measured — the
    // windows never flush). Probe/ADC/shortlist/re-rank are q142's
    // exact chain (same policy dials, same TopKAgg shortlist), so the
    // oracle is the SAME statement — per-window finalized results
    // equal the complete-mode final state on a bounded feed.
    "q142b_stream_ann_append" -> { (s, dir) =>
      val ops = graft.operators.PipelineQueries
      ops.trainedCodebook(s, dir)
      ops.ivfpqIndex(s, dir)
      val cbPath = ops.trainedCbPath(s, dir)
      val idxPath = ops.ivfpqIndexPath(s, dir)
      val nVecs = ops.embGlob(s, dir).count()
      val nLists = s.read.parquet(cbPath).count()
      val nprobe = graft.operators.AnnPolicy.ivfNprobe(nLists).toInt
      val shortS = graft.operators.AnnPolicy.pqShortlist(nVecs).toInt

      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      val cb = s2.read.parquet(cbPath)
        .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))
      val idx = s2.read.parquet(idxPath)

      val qBound = s.conf.get("spark.graft.streaming.annQueryBound", "5").toInt

      // Stage the query stream: one file of query vectors, one of the
      // watermark sentinel (vec_id = 10⁶, et ≈ 11 days — far past any
      // real window at any qBound the witnesses use). Two files so a
      // maxFilesPerTrigger=1 harness run exercises the multi-batch
      // path: queries land, the sentinel batch advances the watermark,
      // the no-data batch flushes and evicts.
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_q142b_" +
        s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_") +
        s"_${sinkCounter.incrementAndGet()}"
      val eBatch = ops.embGlob(s, dir)
      def stageFile(df: DataFrame, name: String): Unit = {
        val tmp = s"$stage/_$name"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$stage/$name.parquet"))
      }
      stageFile(eBatch.filter(col("vec_id") < qBound), "embeddings_0")
      stageFile(eBatch.filter(col("vec_id") === 0)
        .select(lit(1000000L).as("vec_id"), col("embedding")), "embeddings_1")

      val reader = s2.readStream
        .schema(embStreamSchema)
        .option("pathGlobFilter", "embeddings_*.parquet")
      s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
        .foreach(n => reader.option("maxFilesPerTrigger", n))
      val queryStream = reader.parquet(stage)
        .withColumn("et", timestamp_seconds($"vec_id"))
        .withWatermark("et", "5 seconds")

      val tf = org.apache.spark.sql.functions.transform(_: Column, _: Column => Column)
      val probes = queryStream
        .repartition(Par.width(s), $"vec_id")
        .crossJoin(broadcast(cb))
        .withColumn("dsub", tf($"cb", c => struct(
          c.getField("cid").as("cid"),
          graft.functions.GraftFunctions
            .pqSubDists($"embedding", c.getField("ce"), 8).as("ds"))))
        .withColumn("dmap", map_from_entries(tf($"dsub", x =>
          struct(x.getField("cid"), x.getField("ds")))))
        .withColumn("plists", slice(array_sort(tf($"dsub", x => struct(
          aggregate(x.getField("ds"), lit(0.0d), (a, b) => a + b).as("d"),
          x.getField("cid").as("cid")))), 1, nprobe))
        .select($"vec_id".as("query_id"), $"et", $"dmap",
          explode($"plists".getField("cid")).as("qcid"))

      val cand = probes.join(idx,
          probes("qcid") === idx("cid") &&
            idx("vec_id") =!= probes("query_id"))
        .withColumn("adc", aggregate(sequence(lit(0), lit(7)), lit(0.0d),
          (acc, sb) => acc + element_at(
            element_at($"dmap", element_at($"codes", (sb + 1).cast("int"))),
            (sb + 1).cast("int"))))

      val topS = udaf(new graft.functions.TopKAgg(shortS))
      val short = cand
        .groupBy(window($"et", "10 seconds"), $"query_id")
        .agg(topS($"vec_id", -$"adc").as("top"))
        .select($"query_id", $"top")

      val sink = s"q142b_sink_${sinkCounter.incrementAndGet()}"
      val q = short.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q142b_stream_ann_append", q)
      Option(q.lastProgress).foreach(p =>
        stateRowsAfter("q142b_stream_ann_append") =
          p.stateOperators.map(_.numRowsTotal).sum)
      // The returned frame reads the memory sink + the original dir —
      // the staged query feed is dead once the stream terminates.
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(stage))

      val e = ops.embGlob(s2, dir)
      val qv = e.filter($"vec_id" < qBound)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"l2", $"vec_id")
      s2.table(sink)
        .select($"query_id", explode($"top").as("sv"))
        .select($"query_id", $"sv.vec_id".as("vec_id"))
        .join(e, "vec_id").join(broadcast(qv), "query_id")
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"vec_id",
          CrossRound.r($"l2", 4).as("l2"))
        .orderBy($"query_id", $"rank")
    },

    // ----- streaming CDC index maintenance (q143's streaming twin) -----
    // q141b ingests into a fresh ledger per run; q143 merges a batch
    // delta into a PERSISTED corpus index. This unifies the two
    // (VERDICT r14 #6): the delta partition (vec_id ≥ cut) arrives as
    // a STREAM, routes per micro-batch through the broadcast
    // cut-FROZEN codebook (the q143 contract — the artifact parquet,
    // never the live feed, so no micro-batch can shift existing
    // routing), accumulates the delta ledger as streaming state
    // (bounded by occupied cells, q141b's argument), and the final
    // state merges with the untouched corpus index in one bounded
    // batch join. Output = q143's ledger EXACTLY (same oracle
    // statement), including the provenance counts and the min-witness
    // — maintainable here because both sides of the merge carry their
    // own per-cell minima (Spark's least() skips the NULL side of the
    // full-outer merge). Staged multi-batch equivalence and both
    // state-store providers are pinned in Round15OpsSpec.
    "q146_stream_index_maintain" -> { (s, dir) =>
      val ops = graft.operators.PipelineQueries
      val eB = ops.embGlob(s, dir)
      val cut = (eB.agg(max(col("vec_id"))).head().getLong(0) + 1L) * 9L / 10L
      ops.ivfpqIndexBefore(s, dir, cut)
      val cbPath = ops.trainedCbPath(s, dir) + s"_cut$cut"
      val idxPath = ops.ivfpqIndexPath(s, dir) + s"_cut$cut"

      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      val cb = s2.read.parquet(cbPath)
        .agg(array_sort(collect_list(struct($"cid", $"ce"))).as("cb"))

      val reader = s2.readStream
        .schema(embStreamSchema)
        .option("pathGlobFilter", "embeddings*.parquet")
      s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
        .foreach(n => reader.option("maxFilesPerTrigger", n))
      val stream = reader.parquet(dir).filter($"vec_id" >= cut)

      val routed = ops.pqRoute(
        stream.repartition(Par.width(s), $"vec_id").crossJoin(broadcast(cb)))
      val ledger = routed
        .groupBy($"cid", $"pcode")
        .agg(count(lit(1)).as("n_delta"), min($"vec_id").as("min_delta"))

      val sink = s"q146_sink_${sinkCounter.incrementAndGet()}"
      val q = ledger.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q146_stream_index_maintain", q)

      val corpus = s2.read.parquet(idxPath)
        .select($"vec_id", $"cid",
          array_join($"codes".cast("array<string>"), "-").as("pcode"))
        .groupBy($"cid", $"pcode")
        .agg(count(lit(1)).as("n_corpus"), min($"vec_id").as("min_corpus"))
      s2.table(sink)
        .join(corpus, Seq("cid", "pcode"), "full_outer")
        .na.fill(0L, Seq("n_corpus", "n_delta"))
        .select($"cid", $"pcode", $"n_corpus", $"n_delta",
          least($"min_corpus", $"min_delta").as("canonical_vec"))
        .orderBy($"cid", $"pcode")
    },

    // ----- streaming SLIDING-window aggregation -----
    // Overlapping 1-hour windows every 15 minutes — each event lands in
    // 4 windows (the rate-monitoring shape tumbling q31 can't express).
    // State = 4× the tumbling window count: still calendar-bounded
    // (windows × event types), never data volume. Same complete-mode /
    // AvailableNow contract as q31: on bounded input the final state
    // equals the batch aggregate the oracle computes by exploding each
    // event into its 4 covering window starts.
    "q65_sliding_window" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      val stream = eventsStream(s2, dir)

      val agg = stream
        .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
             round(sum($"value"), 2).as("sum_value"))
        .select($"window.start".as("window_start"), $"event_type",
                $"n_events", $"sum_value")

      val sink = s"q65_sink_${sinkCounter.incrementAndGet()}"
      val q = agg.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q65_sliding_window", q)
      s2.table(sink).orderBy($"window_start", $"event_type")
    },

    // ----- stream-stream join (watermarked, event-time range) -----
    // Two live streams carved from the events feed — clicks and
    // purchases — joined per user on "purchase within 1 hour after the
    // click". This is the streaming join proper: BOTH sides are
    // unbounded, each holds watermark-bounded state, and the event-time
    // range condition lets Spark evict a row once the other side's
    // watermark passes its join horizon. State per side = one hour of
    // events (the range width + watermark delay), independent of stream
    // age — the property that makes this run forever at 100 TB/day.
    // Inner-join matches emit in the batch that completes them, so on a
    // bounded input the final sink equals the batch join (the oracle).
    "q62_stream_stream_join" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // State-partition width, overridable for the RocksDB bulk-ingest
      // experiments (evidence/r14/q62_rocksdb_exp.log): the 30 s
      // first-batch tax at 50k docs is per-row JNI write-path cost
      // SERIALIZED over the harness default of 2 state partitions —
      // invariant to write-buffer / row-tracking / changelog-checkpoint
      // confs (4 variants measured ±10%), and it divides by the
      // partition width, which is the production remedy (a real
      // cluster shards state over hundreds of partitions).
      s2.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.graft.streaming.shufflePartitions", "2"))
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      def src: DataFrame = eventsStream(s2, dir)

      val clicks = src.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = src.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id".as("p_user_id"),
          $"ts".as("purchase_ts"), $"value".as("purchase_value"))
        .withWatermark("purchase_ts", "1 hour")

      val joined = clicks.join(purchases,
          $"user_id" === $"p_user_id" &&
            $"purchase_ts" >= $"click_ts" &&
            $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"))
        .select($"click_id", $"user_id", $"click_ts",
          $"purchase_id", $"purchase_ts", $"purchase_value")

      val sink = s"q62_sink_${sinkCounter.incrementAndGet()}"
      val q = joined.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q62_stream_stream_join", q)
      s2.table(sink).orderBy($"click_id", $"purchase_id")
    },

    // ----- arbitrary stateful processing (flatMapGroupsWithState) -----
    // Per-user behavioral profile via the custom-state API: the state
    // store carries one fixed-size ProfileState per user across
    // micro-batches ([[updateProfile]]); sessions follow the q32 30-min
    // gap rule but are counted by hand-rolled state, not the built-in
    // session_window operator. Update output mode emits the refreshed
    // profile each batch; on a bounded single-batch input that final
    // profile equals the batch gap-islands aggregate (the oracle).
    // State = entity cardinality (users), not event volume — the RocksDB
    // provider toggle covers the key-space class that outgrows the heap.
    "q63_state_profile" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      // events*.parquet: the testdata feed is one file, but a staged
      // multi-file feed (events_0.parquet, …) exercises genuine
      // multi-batch runs; spark.graft.streaming.maxFilesPerTrigger
      // bounds files admitted per micro-batch (AvailableNow honors it).
      val stream = eventsStream(s2, dir, "events*.parquet",
          s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger"))
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"value")
        .as[UserEvent]

      val profiles = stream
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(
          OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateProfile)

      val sink = s"q63_sink_${sinkCounter.incrementAndGet()}"
      val q = profiles.toDF().writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q63_state_profile", q)
      // Update mode appends one refreshed profile per (user, batch); if
      // the run splits into several micro-batches (more input files, a
      // lower maxFilesPerTrigger), earlier rows are stale. Keep only the
      // latest per user — n_events grows monotonically, so max wins.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"n_events".desc)
      s2.table(sink)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"n_events", $"n_sessions",
          round($"sum_value", 2).as("sum_value"),
          timestamp_micros($"first_us").as("first_ts"),
          timestamp_micros($"last_us").as("last_ts"))
        .orderBy($"user_id")
    },

    // ----- gap-based session windows (session_window operator) -----
    // A session = consecutive events of one user with < 30 min between
    // them; window end = last event + gap (Spark session_window spec).
    "q32_session_window" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"),
             round(sum($"value"), 2).as("sum_value"))
        .select($"session_window.start".as("session_start"),
                $"session_window.end".as("session_end"),
                $"user_id", $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start")
    },

    // ----- streaming curation: the composed ingest gate -----
    // The ComposedPipeline's streaming twin for the stages a real
    // pipeline runs AT INGEST (SCALE.md §10.6 closed the batch DAG;
    // this is the arrival-time half of that architecture — global
    // passes like near-dup grouping, budget selection and packing stay
    // periodic batch jobs over the curated store, exactly as deployed
    // systems split them). One streaming query chains, per arriving
    // document:
    //   1. quality gate    — q75's map-only hashed-feature scorer
    //   2. decontamination — q59's map-only sorted-set membership
    //      (both gates BEFORE the dedup state, so rejected docs never
    //      enter the store)
    //   3. exact dedup vs everything-already-curated — one boolean of
    //      state per distinct content hash (flatMapGroupsWithState;
    //      the q133 chunk-store state class, so the RocksDB toggle
    //      matters here too)
    // Gate booleans are INTEGER/dyadic-exact compares (2·overlap <
    // shingles; the dyadic weight sum ≥ 0), so batch and stream agree
    // bit-for-bit and the DuckDB oracle — the batch twin: gated set,
    // then min doc_id per hash — grades the composition end-to-end.
    // Survivor rule is deterministic under ANY doc_id-ordered staging:
    // within a micro-batch the min doc_id of the group wins, across
    // batches the state makes the first batch win
    // (StreamingQueriesSpec pins staged-vs-single-batch equality).
    "q149_stream_curate" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      val curated = curateStream(s2, dir,
        s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger"))

      val sink = s"q149_sink_${sinkCounter.incrementAndGet()}"
      val q = curated.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q149_stream_curate", q)
      s2.table(sink).orderBy($"doc_id")
    },

    // ----- near-dup probe AT INGEST (the q81 stage made streaming) -----
    // q149 curates with quality/decontam/exact-dup; production ingest
    // ALSO needs the fuzzy probe against the persisted posting index
    // before a delta doc enters the corpus (VERDICT r15 #6). See
    // [[neardupIngestStream]] for the shape; the batch twin — q81's
    // delta-pair statement over the GATED delta set — grades the
    // composition end-to-end.
    "q155_stream_neardup_ingest" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")

      val pairs = neardupIngestStream(s2, dir,
        s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger"))

      val sink = s"q155_sink_${sinkCounter.incrementAndGet()}"
      val q = pairs.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q155_stream_neardup_ingest", q)
      s2.table(sink).orderBy($"new_doc", $"corpus_doc")
    },

    // ----- the LIVE LSH index: corpus probe + intra-delta matching -----
    // See [[lshIndexStream]]. Registered output is the complete
    // verified pair set (corpus ∪ intra-delta), ordered (doc_a, doc_b).
    "q158_stream_lsh_index" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")

      val pairs = lshIndexStream(s2, dir,
        s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger"))

      val sink = s"q158_sink_${sinkCounter.incrementAndGet()}"
      val q = pairs.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q158_stream_lsh_index", q)
      Option(q.lastProgress).foreach(p =>
        stateRowsAfter("q158_stream_lsh_index") =
          p.stateOperators.map(_.numRowsTotal).sum)
      s2.table(sink).orderBy($"doc_a", $"doc_b")
    },

    // ----- ingest probe against the FORGET-REWRITTEN posting store -----
    // The q157 move applied to the dedup side (VERDICT r16 #7): q155
    // probes the live q81 artifact, so a forget committed to storage
    // (q154's rewrite) was invisible to the stream. q159 probes the
    // REWRITTEN table's bytes — post-rewrite arrivals cannot match
    // forgotten docs, because their postings are no longer in the
    // bytes the stream-static join reads (not because a query-time
    // filter hides them). Same bucketed layout, so the probe plan
    // stays q81's zero-index-side-Exchange shape. Oracle: q155's
    // statement with the corpus side restricted to the survivors.
    "q159_stream_neardup_rewritten" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")

      val (fgtIdx, _) =
        graft.operators.DedupQueries.forgottenPostingIndex(s2, dir)
      val pairs = neardupIngestStream(s2, dir,
        s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger"),
        Seq(fgtIdx))

      val sink = s"q159_sink_${sinkCounter.incrementAndGet()}"
      val q = pairs.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      capturePlan("q159_stream_neardup_rewritten", q)
      s2.table(sink).orderBy($"new_doc", $"corpus_doc")
    },

    // ----- the q158 flush lifecycle: close a window, flush, continue -----
    // VERDICT r16 next-round #2: q158's live posting store never
    // flushed — state grew with every gated doc ever arrived. The
    // flush cycle, end to end: the delta is split into two windows at
    // cut2 = ⌈19/20⌉ of the id space (integer arithmetic, the cut
    // precedent); window 1 runs the live q158 stream (state = its
    // gated postings); at the window boundary the store is flushed as
    // its OWN O(window) bucketed table ([[graft.operators
    // .DedupQueries.windowPostingTable]] — VERDICT r17 next-round #1:
    // the previous absorb rewrote the ENTIRE persisted index per
    // flush) and the continuation runs as a FRESH incarnation — empty
    // state — probing base index AND window table (join results
    // unioned; each join keeps its bucket-local plan), where
    // (window-2 doc ⋈ window-1 doc) pairs now emerge from the
    // stream-static probe instead of state. [[graft.operators
    // .DedupQueries.absorbedPostingIndex]] remains as the
    // slow-cadence compactor folding window tables back into base.
    // Output contract: the union of the two windows equals the
    // never-flushed q158 stream's output over the whole delta — the
    // oracle is q158's by alias, so the two cannot drift. State is
    // bounded by the OPEN window, not stream age; the spec pins the
    // state-size drop, the cross-window pair, and the file-level
    // O(window) flush cost (base index bytes untouched).
    "q160_stream_index_flush" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
      val mfpt = s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
      val maxId = graft.operators.PipelineQueries.docsGlob(s2, dir)
        .agg(org.apache.spark.sql.functions.max($"doc_id"))
        .first.getLong(0)
      val cut2 = (maxId + 1L) * 19L / 20L

      def runWindow(tag: String, probeIdxs: Seq[DataFrame],
          window: (Long, Long)): DataFrame = {
        val pairs = lshIndexStream(s2, dir, mfpt, probeIdxs, Some(window))
        val sink = s"q160_${tag}_${sinkCounter.incrementAndGet()}"
        val q = pairs.writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Window 1 overwrites (fresh invocation), window 2 accumulates
        // — the steady-state batch metric covers the whole lifecycle.
        capturePlan("q160_stream_index_flush", q, accumulate = tag != "w1")
        Option(q.lastProgress).foreach(p =>
          stateRowsAfter(s"q160_stream_index_flush:$tag") =
            p.stateOperators.map(_.numRowsTotal).sum)
        s2.table(sink)
      }
      val w1 = runWindow("w1", Nil, (0L, cut2))
      val (baseIdx, cut) = graft.operators.DedupQueries.postingIndex(s2, dir)
      val winTbl = graft.operators.DedupQueries
        .windowPostingTable(s2, dir, cut, cut2)
      val w2 = runWindow("w2", Seq(baseIdx, winTbl), (cut2, Long.MaxValue))
      w1.unionByName(w2).orderBy($"doc_a", $"doc_b")
    },

    // ----- the full compaction cadence: flush, flush, compact, serve -----
    // The slow-cadence leg the q160 rewrite left spec-only (VERDICT
    // r17 next-round #1's second half): after enough O(window) flushes
    // the probe's per-table join fan-out is worth one O(index) pass,
    // and [[graft.operators.DedupQueries.absorbedPostingIndex]] folds
    // base + every closed window back into ONE bucketed table. This
    // entry registers the whole cycle: window 1 runs live (state =
    // open window); flush 1 → winA; window 2 probes base + winA with
    // fresh state; flush 2, then COMPACT (absorb covers [cut, cutB) —
    // both windows in one pass); window 3 probes ONLY the compacted
    // table — a single join, proving the compacted bytes serve alone.
    // Output contract: w1 ∪ w2 ∪ w3 ≡ the never-flushed q158 stream
    // (shared oracle by alias), so neither the flushes nor the
    // compaction may change a single pair.
    "q162_stream_flush_compact" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
      val mfpt = s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
      val maxId = graft.operators.PipelineQueries.docsGlob(s2, dir)
        .agg(org.apache.spark.sql.functions.max($"doc_id"))
        .first.getLong(0)
      val cutA = (maxId + 1L) * 19L / 20L
      val cutB = (maxId + 1L) * 39L / 40L

      def runWindow(tag: String, probeIdxs: Seq[DataFrame],
          window: (Long, Long), first: Boolean): DataFrame = {
        val pairs = lshIndexStream(s2, dir, mfpt, probeIdxs, Some(window))
        val sink = s"q162_${tag}_${sinkCounter.incrementAndGet()}"
        val q = pairs.writeStream
          .format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        capturePlan("q162_stream_flush_compact", q, accumulate = !first)
        Option(q.lastProgress).foreach(p =>
          stateRowsAfter(s"q162_stream_flush_compact:$tag") =
            p.stateOperators.map(_.numRowsTotal).sum)
        s2.table(sink)
      }
      val w1 = runWindow("w1", Nil, (0L, cutA), first = true)
      val (baseIdx, cut) = graft.operators.DedupQueries.postingIndex(s2, dir)
      val winA = graft.operators.DedupQueries
        .windowPostingTable(s2, dir, cut, cutA)
      val w2 = runWindow("w2", Seq(baseIdx, winA), (cutA, cutB),
        first = false)
      val compacted = graft.operators.DedupQueries
        .absorbedPostingIndex(s2, dir, cut, cutB)
      val w3 = runWindow("w3", Seq(compacted), (cutB, Long.MaxValue),
        first = false)
      w1.unionByName(w2).unionByName(w3).orderBy($"doc_a", $"doc_b")
    },

    // ----- state-TRIGGERED flush: the window closes itself -----
    // VERDICT r17 next-round #2: q160's boundary cut2 is computed
    // BEFORE the run — a harness input. Here the flush fires from
    // OBSERVED state: the first incarnation runs with no upper window
    // bound while the driver polls `lastProgress` between
    // `awaitTermination` slices; when the state-row total crosses
    // `spark.graft.streaming.flushStateRows` (default 4096) the query
    // is stopped, and the committed boundary is recovered from the
    // CHECKPOINT — the file-source metadata log of every batch the
    // commit log marks done, i.e. the same source of truth a restarted
    // production query would resume from, never the stop-time race.
    // cut2 = 1 + max doc_id over those committed files (monotone
    // staging required and VERIFIED: every doc below the boundary must
    // live in a committed file, or the guard refuses — the q149
    // arrival-order contract). The flush then writes the O(window)
    // [[graft.operators.DedupQueries.windowPostingTable]] for
    // [cut, cut2) and the continuation probes base + window with
    // FRESH state, exactly q160's union-read. Output contract is
    // STILL q158's pair set regardless of where the boundary lands —
    // an interrupted batch's docs fall above cut2 and are simply
    // re-processed by the continuation, with the union's
    // dropDuplicates absorbing any pairs both incarnations emitted
    // (pair rows are value-identical by construction). On a
    // single-file corpus the stream drains before the poll can fire,
    // the boundary degenerates to cut-or-end, and the output is the
    // never-flushed q158's — which is why the shared oracle grades
    // this entry at any staging.
    "q161_stream_flush_threshold" -> { (s, dir) =>
      val s2 = s.newSession()
      import s2.implicits._
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      if (s.conf.get("spark.graft.streaming.stateStore", "hdfs") == "rocksdb")
        s2.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
      val mfpt = s.conf.getOption("spark.graft.streaming.maxFilesPerTrigger")
      val threshold = s.conf
        .getOption("spark.graft.streaming.flushStateRows")
        .map(_.toLong).getOrElse(4096L)

      // Checkpoint dir is deleted after the boundary is recovered (the
      // commit/sources logs are only needed within the run) — repeated
      // bench/fuzz runs must not accumulate state-store files in /tmp
      // (ADVICE r18).
      val ck = java.nio.file.Files.createTempDirectory("q161_ck").toString
      val ckPath = new org.apache.hadoop.fs.Path(ck)
      val ckFs = ckPath.getFileSystem(s2.sparkContext.hadoopConfiguration)
      try {
      val sink1 = s"q161_w1_${sinkCounter.incrementAndGet()}"
      val q1 = lshIndexStream(s2, dir, mfpt, Nil, None).writeStream
        .format("memory").queryName(sink1).outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      var fired = false
      while (q1.isActive) {
        q1.awaitTermination(50)
        if (!fired && q1.isActive) {
          Option(q1.lastProgress).foreach { p =>
            if (p.stateOperators.map(_.numRowsTotal).sum >= threshold) {
              fired = true
              q1.stop()
            }
          }
        }
      }
      capturePlan("q161_stream_flush_threshold", q1)
      Option(q1.lastProgress).foreach(p =>
        stateRowsAfter("q161_stream_flush_threshold:w1") =
          p.stateOperators.map(_.numRowsTotal).sum)
      val w1 = s2.table(sink1)

      val (baseIdx, cut) = graft.operators.DedupQueries.postingIndex(s2, dir)
      // The committed boundary, from the checkpoint the stopped query
      // left behind: commits/<b> marks batch b done; sources/0/<b>
      // lists the files batch b read (FileStreamSource's v1 metadata
      // log — one JSON entry per file). Read through the Hadoop
      // [[FileSystem]] API: a production checkpoint lives on HDFS/S3,
      // where a `java.io.File` listing silently finds no commits and
      // the boundary degenerates to cut-or-end (VERDICT r18 #2 — the
      // boundary recovery IS the production story of this entry).
      val commitsDir = new org.apache.hadoop.fs.Path(ckPath, "commits")
      val commits: Seq[Long] =
        if (!ckFs.exists(commitsDir)) Nil
        else ckFs.listStatus(commitsDir).toSeq.map(_.getPath.getName)
          .filter(_.forall(_.isDigit)).map(_.toLong)
      val processed: Seq[String] =
        if (commits.isEmpty) Nil
        else (0L to commits.max).flatMap { b =>
          val src = new org.apache.hadoop.fs.Path(ckPath, s"sources/0/$b")
          if (!ckFs.exists(src)) Nil
          else {
            val in = ckFs.open(src)
            val s0 = scala.io.Source.fromInputStream(in)
            try s0.getLines().toList.flatMap { l =>
              "\"path\":\"([^\"]+)\"".r.findFirstMatchIn(l).map(_.group(1))
            } finally { s0.close(); in.close() }
          }
        }
      val cut2: Long =
        if (processed.isEmpty) cut
        else math.max(cut, s2.read.parquet(processed: _*)
          .agg(org.apache.spark.sql.functions.max($"doc_id"))
          .first.getLong(0) + 1L)
      // Monotone-arrival guard (the q149 contract, enforced on the
      // COMMITTED set): every doc below the boundary must be in a
      // committed file, or the continuation's >= cut2 filter would
      // silently skip it. Trivially satisfied — and skipped, saving
      // two corpus-count jobs per run — when EVERY staged file
      // committed (the boundary then covers the whole id space
      // whatever the arrival order; the common single-file and
      // drained-stream cases land here).
      val allCommitted = processed.nonEmpty && {
        val done = processed.map(p =>
          new org.apache.hadoop.fs.Path(p).getName).toSet
        graft.operators.PipelineQueries.docStems(s2, dir)
          .forall(f => done.contains(f.getPath.getName))
      }
      if (cut2 > cut && processed.nonEmpty && !allCommitted) {
        val below = graft.operators.PipelineQueries.docsGlob(s2, dir)
          .filter($"doc_id" < cut2).count()
        val got = s2.read.parquet(processed: _*)
          .filter($"doc_id" < cut2).count()
        require(got == below,
          s"q161 staging violates monotone doc_id arrival: committed " +
            s"files hold $got of the $below docs below the flush " +
            "boundary; stage files so doc_id ranges increase in " +
            "arrival order.")
      }
      flushBoundary("q161_stream_flush_threshold") = cut2

      val winTbl = graft.operators.DedupQueries
        .windowPostingTable(s2, dir, cut, cut2)
      val pairs2 = lshIndexStream(s2, dir, mfpt, Seq(baseIdx, winTbl),
        Some((cut2, Long.MaxValue)))
      val sink2 = s"q161_w2_${sinkCounter.incrementAndGet()}"
      val q2 = pairs2.writeStream
        .format("memory").queryName(sink2).outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      capturePlan("q161_stream_flush_threshold", q2, accumulate = true)
      Option(q2.lastProgress).foreach(p =>
        stateRowsAfter("q161_stream_flush_threshold:w2") =
          p.stateOperators.map(_.numRowsTotal).sum)
      w1.unionByName(s2.table(sink2))
        .dropDuplicates("doc_a", "doc_b")
        .orderBy($"doc_a", $"doc_b")
      } finally ckFs.delete(ckPath, true)
    })

  def oracleSql: Map[String, String] = Map(

    // Streaming implementation of the q51 decontamination contract —
    // identical rows, so the shared oracle grades it.
    "q59_stream_decontaminate" ->
      graft.operators.PipelineQueries.decontamOracleSql,

    // The composed ingest gate must emit exactly its batch twin:
    // quality ∧ decontamination over the non-bench corpus, then min
    // doc_id per content hash among the gated docs.
    "q149_stream_curate" ->
      graft.operators.PipelineQueries.streamCurateOracleSql,

    // The ingest-time near-dup probe must emit exactly q81's delta
    // pairs restricted to the gated (quality ∧ decontam) delta set.
    "q155_stream_neardup_ingest" ->
      graft.operators.PipelineQueries.streamNeardupOracleSql,

    // The live LSH index must emit that set PLUS the intra-delta pairs
    // its posting-store state makes visible.
    "q158_stream_lsh_index" ->
      graft.operators.PipelineQueries.streamLshIndexOracleSql,

    // The rewritten-store probe must emit q155's pairs restricted to
    // the forget-stripe SURVIVORS — the rows the q154 rewrite left in
    // the bytes.
    "q159_stream_neardup_rewritten" ->
      graft.operators.PipelineQueries.streamNeardupRewrittenOracleSql,

    // The flush lifecycle's contract IS q158's output: closing the
    // window, absorbing the store into the persisted index, and
    // continuing with fresh state must not change the emitted pair
    // set. Shared by alias so the two strings cannot drift.
    "q160_stream_index_flush" ->
      graft.operators.PipelineQueries.streamLshIndexOracleSql,

    // The state-triggered flush has the same contract: wherever the
    // observed-state boundary lands, the union of the incarnations
    // must equal the never-flushed q158 stream's pair set.
    "q161_stream_flush_threshold" ->
      graft.operators.PipelineQueries.streamLshIndexOracleSql,

    // ...and so does the full flush→flush→compact→serve cycle: the
    // compaction folds exactly what the windows flushed, so the pair
    // set cannot move.
    "q162_stream_flush_compact" ->
      graft.operators.PipelineQueries.streamLshIndexOracleSql,

    // The streaming quality gate must emit exactly the batch q73 rows.
    "q75_stream_quality" ->
      graft.operators.PipelineQueries.oracleSql("q73_quality_classifier"),

    // The ingest-time chunk dedup must produce exactly the distinct
    // chunk-signature set of q129's batch chunker (shared CTE chain).
    "q133_stream_chunk_dedup" ->
      graft.operators.PipelineQueries.chunkDedupOracleSql,

    // The streaming sketch + exact verify must emit exactly the batch
    // q135 rows — sketch CONTENT is schedule-dependent, the verified
    // output is not (the MG guarantee; see the query's comment).
    "q139_stream_heavy_hitters" ->
      graft.operators.PipelineQueries.oracleSql("q135_heavy_hitters"),

    // The ingest ledger on bounded input equals the batch (list, code)
    // group-by — assignment and sub-codes via the q60-proven CTE
    // shapes (row_number over (d, cid) = the Spark side's struct
    // array_min).
    "q141_stream_vector_ingest" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      cents AS (SELECT vec_id cid, v cv FROM e WHERE vec_id % 125 = 0),
      pd AS (SELECT e.vec_id, c.cid, s.s,
                    list_reduce(list_prepend(0.0::DOUBLE,
                      list_transform(range(1, 9),
                        j -> (e.v[s.s*8+j] - c.cv[s.s*8+j])
                             * (e.v[s.s*8+j] - c.cv[s.s*8+j]))),
                      (x, y) -> x + y) d
             FROM e CROSS JOIN cents c
                  CROSS JOIN (SELECT unnest(generate_series(0, 7)) s) s),
      -- Full-dim distance = the ORDERED fold of the 8 subspace sums —
      -- the same grouping as the Spark side's aggregate over the
      -- pq_subdists array (a flat 64-term fold would round differently).
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
             CAST(count(1) AS BIGINT) n_ingested,
             min(a.vec_id) canonical_vec
      FROM asg a JOIN pc p USING (vec_id)
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    // Trained-codebook ingest twin: the q141 ledger chain with the
    // fixture codebook replaced by the shared trained-Lloyd CTEs
    // (PipelineQueries.trainedCbOracleCtes) and NULLS FIRST distance
    // orderings (ADVICE r13 #3).
    "q141b_stream_ingest_trained" -> s"""
      WITH ${graft.operators.PipelineQueries.trainedCbOracleCtes},
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
             CAST(count(1) AS BIGINT) n_ingested,
             min(a.vec_id) canonical_vec
      FROM asg a JOIN pc p USING (vec_id)
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    // Streaming ANN query twin: the q141b routing chain (assignment +
    // per-subspace codes over the trained codebook) feeding the
    // q60-proven probe→ADC→shortlist→re-rank pipeline. The probed
    // lists, the subspace-ordered ADC fold, both policy dials
    // (integer-arithmetic twins of the Spark side's driver scalars)
    // and the shortlist/re-rank cuts are all bit-pinned.
    "q142_stream_ann_query" -> q142AnnOracle,

    // The append-mode serving variant (q142b) emits each query's
    // window once, finalized — on a bounded feed those rows equal the
    // complete-mode final state, so both are graded against the SAME
    // statement and can never drift apart.
    "q142b_stream_ann_append" -> q142AnnOracle,

    // The streaming CDC maintenance run must equal the batch q143
    // merge exactly — same frozen codebook, same delta, same ledger —
    // so it shares q143's oracle statement verbatim.
    "q146_stream_index_maintain" ->
      graft.operators.PipelineQueries.oracleSql("q143_index_delta_maintain"),
  ) ++ oracleSqlTail

  /** q142/q142b shared oracle (see the q142b map entry). */
  private lazy val q142AnnOracle: String = s"""
      WITH ${graft.operators.PipelineQueries.trainedCbOracleCtes},
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
      np AS (SELECT ${graft.operators.AnnPolicy.scanCeilSql("count(1)",
        graft.operators.AnnPolicy.IvfScanDiv,
        graft.operators.AnnPolicy.IvfNprobeFloor)} np FROM tcb),
      qp AS (SELECT vec_id query_id, cid qcid FROM (
               SELECT vec_id, cid,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d NULLS FIRST, cid) rn
               FROM fd WHERE vec_id < 5)
             WHERE rn <= (SELECT np FROM np)),
      cand AS (SELECT q.query_id, a.vec_id
               FROM asg a JOIN qp q
                 ON a.cid = q.qcid AND a.vec_id != q.query_id),
      adc AS (SELECT c.query_id, c.vec_id,
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list(p.d ORDER BY p.s)), (x, y) -> x + y) adc
              FROM cand c
              JOIN codes k ON k.vec_id = c.vec_id
              JOIN pd p ON p.vec_id = c.query_id
                       AND p.s = k.s AND p.cid = k.code
              GROUP BY 1, 2),
      sl AS (SELECT ${graft.operators.AnnPolicy.scanCeilSql("count(1)",
        graft.operators.AnnPolicy.PqScanDiv,
        graft.operators.AnnPolicy.PqShortlistFloor)} sl FROM te),
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
      ORDER BY query_id, rank"""

  /** The rest of the streaming oracles (split from the main literal so
    * [[q142AnnOracle]] can sit between map sections). */
  private lazy val oracleSqlTail: Map[String, String] = Map(

    "q31_stream_window" -> """
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
             event_type,
             count(1) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_start, event_type""",

    "q50_stream_dedup" -> """
      SELECT DISTINCT user_id, event_type
      FROM events
      ORDER BY user_id, event_type""",

    // Sliding-window twin: every event belongs to the 4 hour-long
    // windows starting at its 15-min floor minus 0/15/30/45 min (Spark
    // windows align to the epoch, as does the floor arithmetic here).
    "q65_sliding_window" -> """
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
                 FROM events),
      x AS (SELECT make_timestamp(
                     ((CAST(floor(epoch(ts) / 900) AS BIGINT) - k.k) * 900)
                     * 1000000) AS window_start,
                   event_type, value
            FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k)
      SELECT window_start, event_type,
             count(1) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM x
      GROUP BY 1, 2
      ORDER BY window_start, event_type""",

    // Batch twin of the watermarked stream-stream join: every
    // (click, purchase) pair of one user with the purchase inside the
    // hour after the click.
    "q62_stream_stream_join" -> """
      SELECT c.event_id AS click_id,
             c.user_id,
             CAST(c.ts AS TIMESTAMP) AS click_ts,
             p.event_id AS purchase_id,
             CAST(p.ts AS TIMESTAMP) AS purchase_ts,
             p.value AS purchase_value
      FROM events c
      JOIN events p
        ON c.user_id = p.user_id
       AND c.event_type = 'click'
       AND p.event_type = 'purchase'
       AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
       AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id""",

    // Gap-islands twin of the custom-state profile: session breaks at
    // >= 30 min, profile = counts + value sum + observed span per user.
    "q63_state_profile" -> """
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP))
                           OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
      )
      SELECT user_id,
             count(1) AS n_events,
             CAST(1 + sum(brk) AS BIGINT) AS n_sessions,
             round(sum(value), 2) AS sum_value,
             min(ts) AS first_ts,
             max(ts) AS last_ts
      FROM e
      GROUP BY user_id
      ORDER BY user_id""",

    // Gap-islands twin of session_window: a new session starts when the
    // gap to the previous event is >= 30 min (Spark merges only strictly
    // overlapping [ts, ts+gap) windows); session_end = last event + gap.
    "q32_session_window" -> """
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP))
                           OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
      ), sessioned AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM e
      )
      SELECT min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             user_id,
             count(1) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM sessioned
      GROUP BY user_id, sess
      ORDER BY user_id, session_start""")
}
