package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.gsheets.Fixtures

/** Streaming-engine semantics not expressible through the batch oracle:
  * watermark-driven append-mode emission for session windows, and
  * arbitrary stateful processing (flatMapGroupsWithState) across
  * micro-batches.
  */
class StreamingQueriesSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermarked session_window emits only watermark-closed sessions in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]

    val sessions = input.toDS().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_v"))
      .select($"session_window.start".as("start"), $"user_id", $"n", $"sum_v")

    val q = sessions.writeStream
      .format("memory").queryName("ss_sessions")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()

    try {
      // Batch 1: user 1 has a burst at 10:00-10:05, then a lone event at
      // 10:40 that advances the watermark to 10:40 and closes the burst
      // session (end = 10:05 + 10min = 10:15 <= watermark).
      input.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(40), 5.0))
      q.processAllAvailable()
      // Batch 2: nothing new for user 1 — the 10:40 session is still open
      // (end 10:50 > watermark 10:40), so exactly one session is emitted.
      val got = spark.table("ss_sessions").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == Seq((ts(0), 1L, 2L, 3.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps per-key running state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]

    // Running max per key, emitted on every update — state survives
    // between micro-batches (KeyValueGroupedDataset stateful API).
    def updateMax(key: String, rows: Iterator[(String, Double)],
        state: GroupState[Double]): Iterator[(String, Double)] = {
      val prev = state.getOption.getOrElse(Double.MinValue)
      val mx = math.max(prev, rows.map(_._2).max)
      state.update(mx)
      Iterator((key, mx))
    }

    val out = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(updateMax)
      .toDF("key", "running_max")

    val q = out.writeStream
      .format("memory").queryName("ss_runmax")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()

    try {
      input.addData(("a", 1.0), ("a", 3.0), ("b", 7.0))
      q.processAllAvailable()
      input.addData(("a", 2.0), ("b", 9.0)) // a's max must NOT drop to 2
      q.processAllAvailable()
      val rows = spark.table("ss_runmax").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(rows.sorted == Seq(("a", 3.0), ("a", 3.0), ("b", 7.0), ("b", 9.0)))
    } finally q.stop()
  }

  test("q31/q32 streaming queries run and match their batch twins on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val q31 = StreamingQueries.queries("q31_stream_window")(spark, dir)
    val batchTwin = graft.operators.Tables(spark, dir).events
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    assert(q31.count() == batchTwin.count())
    assert(q31.exceptAll(batchTwin).isEmpty && batchTwin.exceptAll(q31).isEmpty)

    val q32 = StreamingQueries.queries("q32_session_window")(spark, dir)
    assert(q32.count() > 0)
    // Sessions are disjoint per user and each holds >= 1 event.
    val bad = q32.selectExpr("user_id", "session_start", "session_end")
      .withColumn("prev_end",
        lag("session_end", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("session_start")))
      .filter(col("prev_end").isNotNull && col("session_start") < col("prev_end"))
    assert(bad.count() == 0)
  }

  test("q75 streaming quality gate equals batch q73 exactly on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.queries("q75_stream_quality")(spark, dir)
    val batch = graft.operators.PipelineQueries
      .queries("q73_quality_classifier")(spark, dir)
    // Map-only scoring with dyadic-exact arithmetic: the streamed rows
    // must equal the batch rows bit-for-bit, not approximately.
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("q62 stream-stream join equals the batch range join on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingQueries.queries("q62_stream_stream_join")(spark, dir)
    val ev = graft.operators.Tables(spark, dir).events
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_uid"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val twin = c.join(p,
      col("user_id") === col("p_uid") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select("click_id", "user_id", "click_ts",
        "purchase_id", "purchase_ts", "purchase_value")
    assert(got.count() > 0)
    assert(got.exceptAll(twin).isEmpty && twin.exceptAll(got).isEmpty)
  }

  test("q63 profile state carries sessions across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]

    val profiles = input.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(StreamingQueries.updateProfile)

    val q = profiles.toDF().writeStream
      .format("memory").queryName("ss_profile")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(0))
      .start()

    def us(minute: Int): Long = ts(0).getTime * 1000L + minute * 60L * 1000000L
    try {
      // Batch 1: two events 10 min apart — one session.
      input.addData(UserEvent(1L, us(10), 1.0), UserEvent(1L, us(0), 2.0))
      q.processAllAvailable()
      // Batch 2: 10:20 continues the open session (gap 10 min from the
      // 10:10 state), 11:30 starts a second one. Both depend on state
      // from batch 1 — a stateless re-run would count differently.
      input.addData(UserEvent(1L, us(20), 3.0), UserEvent(1L, us(90), 4.0))
      q.processAllAvailable()
      val last = spark.table("ss_profile").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5)))
        .maxBy(_._2) // update mode appends one row per batch; latest has most events
      assert(last == ((1L, 4L, 2L, 10.0, us(0), us(90))))
    } finally q.stop()
  }

  test("q63 state profile equals the batch gap-islands aggregate on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingQueries.queries("q63_state_profile")(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val twin = graft.operators.Tables(spark, dir).events
      .withColumn("gap_break",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
          >= 30L * 60 * 1000000L, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum("gap_break") + 1L).as("n_sessions"),
        round(sum("value"), 2).as("sum_value"),
        min("ts").as("first_ts"), max("ts").as("last_ts"))
    assert(got.count() > 0)
    assert(got.exceptAll(twin).isEmpty && twin.exceptAll(got).isEmpty)
  }

  test("q31 produces identical results under the RocksDB state store") {
    val dir = "/root/testdata/sf0.001"
    val hdfs = StreamingQueries.queries("q31_stream_window")(spark, dir)
    spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
    try {
      val rocks = StreamingQueries.queries("q31_stream_window")(spark, dir)
      assert(rocks.count() == hdfs.count())
      assert(rocks.exceptAll(hdfs).isEmpty && hdfs.exceptAll(rocks).isEmpty)
    } finally spark.conf.unset("spark.graft.streaming.stateStore")
  }

  test("q62 stream-stream join is identical under the RocksDB state store") {
    val dir = "/root/testdata/sf0.001"
    val hdfs = StreamingQueries.queries("q62_stream_stream_join")(spark, dir)
    spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
    try {
      val rocks = StreamingQueries.queries("q62_stream_stream_join")(spark, dir)
      assert(rocks.count() == hdfs.count() && hdfs.count() > 0)
      assert(rocks.exceptAll(hdfs).isEmpty && hdfs.exceptAll(rocks).isEmpty)
    } finally spark.conf.unset("spark.graft.streaming.stateStore")
  }

  test("q63 state profile is identical under the RocksDB state store") {
    val dir = "/root/testdata/sf0.001"
    val hdfs = StreamingQueries.queries("q63_state_profile")(spark, dir)
    spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
    try {
      val rocks = StreamingQueries.queries("q63_state_profile")(spark, dir)
      assert(rocks.count() == hdfs.count() && hdfs.count() > 0)
      assert(rocks.exceptAll(hdfs).isEmpty && hdfs.exceptAll(rocks).isEmpty)
    } finally spark.conf.unset("spark.graft.streaming.stateStore")
  }

  test("q63 keeps only the latest profile per user when the run is multi-batch") {
    // Force the bounded AvailableNow run to split: maxFilesPerTrigger
    // can't split one parquet file, so stage the events feed as several
    // files and admit one per micro-batch. Files are TIME-ordered slices
    // (how an append-only feed actually arrives): the gap-session state
    // assumes a user's events don't time-travel across batches, so a
    // round-robin split would be an invalid input, not a harder test.
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("q63-multi").toString
    val tmp = s"$staged/_tmp"
    val ev = graft.operators.Tables(spark, dir).events
      .select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .withColumn("q", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts")))
    for (i <- 1 to 4) {
      val slice = s"$tmp/$i"
      ev.filter(col("q") === i).drop("q")
        .coalesce(1).write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$staged/events_$i.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1000000L * i) // feed order = time order
    }
    spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
    try {
      val got = StreamingQueries.queries("q63_state_profile")(spark, staged)
      // One row per user despite >= 2 update-mode batches…
      assert(got.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
      // …and it is the FINAL profile: equals the batch gap-islands twin.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val twin = graft.operators.Tables(spark, dir).events
        .withColumn("gap_break",
          when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
            >= 30L * 60 * 1000000L, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          (sum("gap_break") + 1L).as("n_sessions"),
          round(sum("value"), 2).as("sum_value"),
          min("ts").as("first_ts"), max("ts").as("last_ts"))
      assert(got.exceptAll(twin).isEmpty && twin.exceptAll(got).isEmpty)
    } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
  }

  test("q133 chunk dedup equals the batch chunker's distinct signatures") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.queries("q133_stream_chunk_dedup")(spark, dir)
    // Batch twin: q129's chunk relation is internal, but its per-doc
    // output determines the chunk COUNT; the signature set itself is
    // recomputed here with the same expression chain over the table.
    val toksExpr = "array_remove(split(text, ' '), '')"
    val twin = graft.operators.Tables(spark, dir).documents
      .select(expr(toksExpr).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(
        graft.functions.GraftFunctions.polyHashArray(col("toks")).as("thash"),
        graft.functions.GraftFunctions.polyHashArray(
          graft.functions.GraftFunctions.shingles3(col("toks"))).as("sh"))
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
      .distinct()
    assert(streamed.count() > 0)
    assert(streamed.count() == twin.count())
    assert(streamed.exceptAll(twin).isEmpty && twin.exceptAll(streamed).isEmpty)
    // Chunk-store state grows with distinct CONTENT (not entities), so
    // the off-heap provider is this query's production posture — the
    // key set must be identical under it.
    spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
    try {
      val rocks = StreamingQueries.queries("q133_stream_chunk_dedup")(spark, dir)
      assert(rocks.exceptAll(twin).isEmpty && twin.exceptAll(rocks).isEmpty)
    } finally spark.conf.unset("spark.graft.streaming.stateStore")
  }

  test("q133 dedup state holds across micro-batches: batch 2 emits only novel chunks") {
    // Stage the corpus as two document files and admit one per
    // micro-batch: every signature must appear EXACTLY once in the
    // sink even when its chunk recurs in both halves — the
    // content-addressed store's write-once contract at ingest.
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("q133-multi").toString
    val tmp = s"$staged/_tmp"
    val docs = graft.operators.Tables(spark, dir).documents
    for (i <- 1 to 2) {
      val slice = s"$tmp/$i"
      docs.filter(col("doc_id") % 2 === (i - 1)).coalesce(1)
        .write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$staged/documents_$i.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1000000L * i)
    }
    spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
    try {
      val got = StreamingQueries.queries("q133_stream_chunk_dedup")(spark, staged)
      val dupes = got.groupBy("sig").count().filter(col("count") > 1)
      assert(dupes.count() == 0,
        "a chunk signature was re-emitted in a later micro-batch")
      // And the multi-batch key set equals the single-batch run's.
      val single = StreamingQueries.queries("q133_stream_chunk_dedup")(spark, dir)
      assert(got.exceptAll(single).isEmpty && single.exceptAll(got).isEmpty)
    } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
  }

  test("q149 curate state holds across micro-batches; staged = single-batch") {
    // Stage the corpus as two doc_id-RANGE files admitted one per
    // micro-batch — the monotone-ingest arrival order the survivor
    // rule (first batch wins, min doc_id within a batch) is defined
    // over. The staged run must equal the single-batch run row for
    // row, and no doc_id may appear twice (the curated store's
    // write-once contract).
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("q149-multi").toString
    val tmp = s"$staged/_tmp"
    val docs = graft.operators.Tables(spark, dir).documents
    val mid = docs.agg(org.apache.spark.sql.functions.expr(
      "percentile_approx(doc_id, 0.5)")).first.getLong(0)
    for (i <- 1 to 2) {
      val slice = s"$tmp/$i"
      (if (i == 1) docs.filter(col("doc_id") <= mid)
       else docs.filter(col("doc_id") > mid)).coalesce(1)
        .write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$staged/documents_$i.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1000000L * i)
    }
    spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
    try {
      val got = StreamingQueries.queries("q149_stream_curate")(spark, staged)
      val dupes = got.groupBy("doc_id").count().filter(col("count") > 1)
      assert(dupes.count() == 0, "a doc was re-emitted in a later batch")
      val single = StreamingQueries.queries("q149_stream_curate")(spark, dir)
      assert(got.exceptAll(single).isEmpty && single.exceptAll(got).isEmpty,
        "doc_id-ordered staging must not change the curated set")
    } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
  }

  test("q155 near-dup ingest: staged two-batch = single-batch; no dup pairs") {
    // The probe is stateless per batch (stream-static join against the
    // persisted posting index) and each doc lives in exactly one staged
    // file, so batching must not change the emitted pair set.
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("q155-multi").toString
    val tmp = s"$staged/_tmp"
    val docs = graft.operators.Tables(spark, dir).documents
    val mid = docs.agg(org.apache.spark.sql.functions.expr(
      "percentile_approx(doc_id, 0.5)")).first.getLong(0)
    for (i <- 1 to 2) {
      val slice = s"$tmp/$i"
      (if (i == 1) docs.filter(col("doc_id") <= mid)
       else docs.filter(col("doc_id") > mid)).coalesce(1)
        .write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$staged/documents_$i.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1000000L * i)
    }
    spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
    try {
      val got = StreamingQueries
        .queries("q155_stream_neardup_ingest")(spark, staged)
      val dupes = got.groupBy("new_doc", "corpus_doc").count()
        .filter(col("count") > 1)
      assert(dupes.count() == 0, "a pair was re-emitted in a later batch")
      val single = StreamingQueries
        .queries("q155_stream_neardup_ingest")(spark, dir)
      assert(got.exceptAll(single).isEmpty && single.exceptAll(got).isEmpty,
        "staging must not change the ingest near-dup pair set")
    } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
  }

  test("q158 live LSH index: striped staging = single batch; intra pairs fire") {
    // Unlike q149, the q158 pair set is arrival-order-INDEPENDENT by
    // construction ((max, min) labels; a pair emits when its second
    // member arrives, whichever that is) — so even a mod-2 STRIPED
    // staging, which q149's guard must refuse, yields the identical
    // output. That independence is the point of this pin.
    val dir = "/root/testdata/sf0.1"
    val staged = java.nio.file.Files.createTempDirectory("q158-stripe").toString
    val tmp = s"$staged/_tmp"
    val docs = graft.operators.Tables(spark, dir).documents
    for (i <- 1 to 2) {
      val slice = s"$tmp/$i"
      docs.filter(col("doc_id") % 2 === (i - 1)).coalesce(1)
        .write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$staged/documents_$i.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1000000L * i)
    }
    spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
    try {
      val got = StreamingQueries
        .queries("q158_stream_lsh_index")(spark, staged)
      val single = StreamingQueries
        .queries("q158_stream_lsh_index")(spark, dir)
      assert(got.exceptAll(single).isEmpty && single.exceptAll(got).isEmpty,
        "striped staging must not change the live-index pair set")
      // The state path is exercised, not just present: at sf0.1 the
      // delta holds near-identical doc pairs, so intra-delta pairs
      // (both endpoints >= cut) must appear.
      val cut = (docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
        .first.getLong(0) + 1L) * 9L / 10L
      assert(single.filter(col("doc_b") >= cut).count() > 0,
        "no intra-delta pair surfaced — the live posting store is idle")
    } finally spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
  }

  test("q159: forget-rewrite MID-STREAM — post-rewrite batches cannot " +
      "match forgotten docs") {
    // The production sequence (VERDICT r16 #7): an ingest stream runs
    // against the posting store, a right-to-be-forgotten batch commits
    // q154's storage rewrite between micro-batch campaigns, and the
    // stream RESUMES FROM ITS CHECKPOINT probing the rewritten bytes —
    // arrivals after the rewrite must not match forgotten docs, and
    // not because a query-time filter hides them: their postings are
    // gone from the bytes the stream-static join reads.
    //
    // Fixture: sf0.01 with the texts of docs 429 and 435 SWAPPED, so
    // the one gated near-dup pair (486 ⋈ 435 on the pristine fixture)
    // becomes (486 ⋈ 429) — and 429 is on the forget stripe
    // (429 = 33·13). File 1 carries every doc except 486 (including
    // max id 499, so the 90% cut stays 450 across both lives); file 2
    // carries only 486 and arrives after the rewrite.
    val src = "/root/testdata/sf0.01"
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    val t429 = docs0.filter(col("doc_id") === 429)
      .select("text").first.getString(0)
    val t435 = docs0.filter(col("doc_id") === 435)
      .select("text").first.getString(0)
    val swapped = docs0.withColumn("text",
      when(col("doc_id") === 429, lit(t435))
        .when(col("doc_id") === 435, lit(t429))
        .otherwise(col("text")))

    val outSchema = "new_doc LONG, corpus_doc LONG, n_match LONG, " +
      "est_sim DOUBLE"
    def stage(base: String, i: Int): Unit = {
      val slice = s"$base/_tmp/$i"
      (if (i == 1) swapped.filter(col("doc_id") =!= 486)
       else swapped.filter(col("doc_id") === 486)).coalesce(1)
        .write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$base/documents_$i.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1000000L * i)
    }
    def life(base: String, rewritten: Boolean): Unit = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      val probe =
        if (rewritten) Seq(graft.operators.DedupQueries
          .forgottenPostingIndex(s2, base)._1)
        else Nil
      val q = StreamingQueries.neardupIngestStream(s2, base, None, probe)
        .writeStream.format("parquet")
        .option("path", s"$base/_out")
        .option("checkpointLocation", s"$base/_ck")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def outRows(base: String): Set[(Long, Long)] =
      spark.read.schema(outSchema).parquet(s"$base/_out")
        .select("new_doc", "corpus_doc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // The REWRITE run: life 1 against the live store, forget-rewrite,
    // life 2 (checkpoint resume — only file 2 is read) against the
    // rewritten bytes.
    val rw = java.nio.file.Files.createTempDirectory("q159-rw").toString
    stage(rw, 1); life(rw, rewritten = false)
    stage(rw, 2); life(rw, rewritten = true)
    val rwPairs = outRows(rw)
    assert(!rwPairs.contains((486L, 429L)),
      "a post-rewrite arrival matched a forgotten doc")
    assert(rwPairs.forall(_._2 % 13 != 0),
      "no pair may survive against a forget-stripe corpus doc")

    // CONTROL — same staging, no rewrite: the (486, 429) pair IS
    // there to find, so the suppression above is the rewrite's doing.
    val ctl = java.nio.file.Files.createTempDirectory("q159-ctl").toString
    stage(ctl, 1); life(ctl, rewritten = false)
    stage(ctl, 2); life(ctl, rewritten = false)
    assert(outRows(ctl).contains((486L, 429L)),
      "control without the rewrite must match the (gated) forgotten " +
        "pair, or this test pins nothing")

    // And the two-life rewrite run equals the registered q159 (all
    // batches against the rewritten store) over the same corpus — the
    // mid-stream upgrade does not change the survivor pair set.
    val reg = StreamingQueries
      .queries("q159_stream_neardup_rewritten")(spark, rw)
      .select("new_doc", "corpus_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rwPairs == reg,
      "mid-stream rewrite adoption must converge to the registered " +
        "rewritten-store probe")
  }

  test("q160 flush: absorbed probe finds cross-window pairs; state is " +
      "bounded by the OPEN window") {
    // VERDICT r16 next-round #2, the acceptance pins: (a) a pair whose
    // members straddle the flush boundary is found by the CONTINUATION
    // incarnation — whose state starts EMPTY — via the absorbed static
    // index (in the never-flushed q158 it could only come from state);
    // (b) output equals the never-flushed stream's (the oracle
    // contract, asserted in-spec too); (c) the continuation's state is
    // strictly smaller than the never-flushed stream's.
    //
    // Fixture: sf0.01 with doc 462's text REPLACED by doc 486's —
    // identical text ⇒ identical gate verdict and signature, so
    // (486, 462) is a guaranteed gated intra-delta pair straddling
    // cut2 = 475 (462 ∈ window 1, 486 ∈ window 2).
    val src = "/root/testdata/sf0.01"
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    val t486 = docs0.filter(col("doc_id") === 486)
      .select("text").first.getString(0)
    val iso = java.nio.file.Files.createTempDirectory("q160-iso").toString
    // A FLAT file, not a Spark directory: the streaming source's
    // pathGlobFilter matches leaf-file names, and part-*.parquet
    // inside a documents.parquet directory would yield an empty feed.
    docs0.withColumn("text",
        when(col("doc_id") === 462, lit(t486)).otherwise(col("text")))
      .coalesce(1).write.parquet(s"$iso/_tmp")
    java.nio.file.Files.move(
      new java.io.File(s"$iso/_tmp").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath,
      new java.io.File(s"$iso/documents.parquet").toPath)

    def pairs(name: String): Set[(Long, Long)] =
      StreamingQueries.queries(name)(spark, iso)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val flushed = pairs("q160_stream_index_flush")
    val never = pairs("q158_stream_lsh_index")
    assert(flushed == never,
      "closing the window, absorbing, and continuing with fresh state " +
        "must not change the emitted pair set")
    assert(flushed.contains((486L, 462L)),
      "the cross-window pair must be found — and window 2's state " +
        "starts empty, so only the absorbed static probe can find it")
    val w2Rows = StreamingQueries.stateRowsAfter("q160_stream_index_flush:w2")
    val neverRows = StreamingQueries.stateRowsAfter("q158_stream_lsh_index")
    assert(w2Rows < neverRows,
      s"the continuation's state ($w2Rows rows) must be strictly " +
        s"smaller than the never-flushed stream's ($neverRows rows) — " +
        "that bound is the point of the flush")
    // All-tags state pin (VERDICT r19 #5, completing r18 #7): window 1
    // accumulates only the pre-cut docs, so its state at flush time is
    // non-empty and strictly below the never-flushed accumulation.
    val w1Rows = StreamingQueries.stateRowsAfter("q160_stream_index_flush:w1")
    assert(w1Rows > 0 && w1Rows < neverRows,
      s"window 1's state at flush ($w1Rows) must be non-empty and " +
        s"strictly below the never-flushed stream's ($neverRows)")
    // Probe-plan pin (VERDICT r17 next-round #1 acceptance): the
    // continuation's captured micro-batch plan must probe BOTH the
    // base index and the window table, and neither index scan may
    // have a shuffle Exchange between it and its candidate join — the
    // union happens above the per-table joins, never at the relation
    // level where it would cost the index its bucket-local plan.
    val p = StreamingQueries.executedPlans("q160_stream_index_flush")
    assert(p.contains("graft_mh_index") && p.contains("_win"),
      s"q160 w2 must probe base + window tables:\n$p")
    val lines = p.linesIterator.toVector
    def indent(l: String): Int = {
      val i = l.indexOf("+-"); val j = l.indexOf(":-")
      if (i < 0 && j < 0) Int.MaxValue else if (i < 0) j else if (j < 0) i
      else math.min(i, j)
    }
    for (scanIdx <- lines.indices
         if lines(scanIdx).contains("graft_mh_index")) {
      val joinIdx = lines.lastIndexWhere(_.contains("HashJoin"), scanIdx)
      assert(joinIdx >= 0, s"q160 index scan lost its candidate join:\n$p")
      var cur = indent(lines(scanIdx))
      for (k <- (joinIdx + 1 until scanIdx).reverse
           if indent(lines(k)) < cur) {
        assert(!lines(k).contains("Exchange hashpartitioning"),
          s"q160 index side re-shuffles: ${lines(k).trim}\n$p")
        cur = indent(lines(k))
      }
    }
  }

  test("q162 compaction cycle: the compacted table ALONE serves the " +
      "last window; pairs reach across both closed windows") {
    // The full cadence on a constructed fixture: docs 462 (window 1),
    // 486 (window 2) and 493 (window 3) share one text, so (486, 462)
    // straddles flush 1 and (493, 462)/(493, 486) straddle the
    // COMPACTION — window 3 runs with fresh state probing ONLY the
    // absorbed table, so those pairs exist iff the compacted bytes
    // really carry both closed windows' postings. Output must equal
    // the never-flushed q158 stream's, per the shared oracle contract.
    val src = "/root/testdata/sf0.01"
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    val t486 = docs0.filter(col("doc_id") === 486)
      .select("text").first.getString(0)
    val iso = java.nio.file.Files.createTempDirectory("q162-iso").toString
    docs0.withColumn("text",
        when(col("doc_id") === 462 || col("doc_id") === 493, lit(t486))
          .otherwise(col("text")))
      .coalesce(1).write.parquet(s"$iso/_tmp")
    java.nio.file.Files.move(
      new java.io.File(s"$iso/_tmp").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath,
      new java.io.File(s"$iso/documents.parquet").toPath)

    def pairs(name: String): Set[(Long, Long)] =
      StreamingQueries.queries(name)(spark, iso)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cycled = pairs("q162_stream_flush_compact")
    val never = pairs("q158_stream_lsh_index")
    assert(cycled == never,
      "flush x2 + compaction + serve-from-compacted must not change " +
        "the emitted pair set")
    assert(cycled.contains((493L, 462L)) && cycled.contains((493L, 486L)),
      "window 3 starts with EMPTY state and probes only the compacted " +
        "table — these pairs exist iff compaction carried both closed " +
        "windows' postings")
    val w2Rows = StreamingQueries.stateRowsAfter("q162_stream_flush_compact:w2")
    val w3Rows = StreamingQueries.stateRowsAfter("q162_stream_flush_compact:w3")
    val neverRows = StreamingQueries.stateRowsAfter("q158_stream_lsh_index")
    // State-bound regression pins (VERDICT r18 next-round #7): EVERY
    // post-flush window's state must stay strictly below the
    // never-flushed accumulation — w2 after flush 1 and w3 after the
    // compaction each hold only their OPEN window.
    assert(w2Rows < neverRows,
      s"window 2's state ($w2Rows) must be strictly smaller than the " +
        s"never-flushed stream's ($neverRows)")
    assert(w3Rows < neverRows,
      s"window 3's state ($w3Rows) must be strictly smaller than the " +
        s"never-flushed stream's ($neverRows)")
    // All-tags state pin (VERDICT r19 #5, completing r18 #7).
    val w1Rows = StreamingQueries.stateRowsAfter("q162_stream_flush_compact:w1")
    assert(w1Rows > 0 && w1Rows < neverRows,
      s"window 1's state at flush 1 ($w1Rows) must be non-empty and " +
        s"strictly below the never-flushed stream's ($neverRows)")
  }

  test("q161: the flush fires MID-STREAM from the state threshold; " +
      "output equals the never-flushed stream") {
    // VERDICT r17 next-round #2 acceptance: q160's boundary is a
    // harness input (cut2 precomputed); q161's must fire from state
    // OBSERVED inside one staged run. Fixture: the sf0.01 corpus
    // staged as one corpus file + 6 monotone delta slices, one file
    // per micro-batch; with the threshold set far below one slice's
    // posting-store rows, the poll stops the stream after the first
    // delta batches and the boundary recovered from the CHECKPOINT's
    // commit log must land strictly inside the delta — neither at the
    // precomputed cut nor at the end of the stream. The output
    // contract is boundary-independent: whatever batch the stop lands
    // on, the union of the incarnations equals the never-flushed
    // q158 stream's pair set.
    val src = "/root/testdata/sf0.01"
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
    val maxId = docs0.agg(max(col("doc_id"))).first.getLong(0)
    val cut = (maxId + 1L) * 9L / 10L
    val iso = java.nio.file.Files.createTempDirectory("q161-mid").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val slice = s"$iso/_tmp/$name"
      df.coalesce(1).write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$iso/documents_$name.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime): Unit
    }
    stage(docs0.filter(col("doc_id") < cut), "0corpus", 1000000L)
    val nSlices = 6
    val step = (maxId + 1L - cut) / nSlices + 1L
    for (i <- 0 until nSlices) {
      val lo = cut + i * step
      stage(docs0.filter(col("doc_id") >= lo &&
        col("doc_id") < lo + step), s"d$i", 1000000L * (i + 2))
    }
    spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
    spark.conf.set("spark.graft.streaming.flushStateRows", "50")
    try {
      def pairs(name: String): Set[(Long, Long)] =
        StreamingQueries.queries(name)(spark, iso)
          .select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val flushed = pairs("q161_stream_flush_threshold")
      val never = pairs("q158_stream_lsh_index")
      assert(flushed == never,
        "a state-triggered flush must not change the emitted pair set")
      val cut2 =
        StreamingQueries.flushBoundary("q161_stream_flush_threshold")
      assert(cut2 > cut && cut2 <= maxId,
        s"the flush must fire MID-STREAM from the threshold: boundary " +
          s"$cut2 should sit strictly inside the delta ($cut, $maxId]")
      val w2Rows =
        StreamingQueries.stateRowsAfter("q161_stream_flush_threshold:w2")
      val neverRows =
        StreamingQueries.stateRowsAfter("q158_stream_lsh_index")
      assert(w2Rows < neverRows,
        s"the continuation's state ($w2Rows) must be strictly smaller " +
          s"than the never-flushed stream's ($neverRows)")
      // All-tags state pin (VERDICT r19 #5, completing r18 #7): the
      // threshold fires LATE in the staged delta (boundary > 90 % of
      // ids), so window 1's state dominates the continuation's.
      val w1Rows =
        StreamingQueries.stateRowsAfter("q161_stream_flush_threshold:w1")
      assert(w1Rows > 0 && w2Rows < w1Rows,
        s"window 1's state at the threshold flush ($w1Rows) must be " +
          s"non-empty and above the continuation's ($w2Rows)")
    } finally {
      spark.conf.unset("spark.graft.streaming.maxFilesPerTrigger")
      spark.conf.unset("spark.graft.streaming.flushStateRows")
    }
  }

  test("q160 flush writes O(window) bytes, leaves the base index's " +
      "bytes untouched; absorb compaction equals base UNION window") {
    // VERDICT r17 next-round #1 acceptance, the file-level witness:
    // the per-flush artifact is the closed window's postings ONLY —
    // the base index's files must be byte-identical before and after
    // (the old absorb rewrote the whole index per flush), and the
    // flushed bytes must scale with the window (here window = 5% of
    // the id space vs the base's 90%). absorbedPostingIndex remains
    // as the slow-cadence compactor; its output must equal the
    // union-read's posting set exactly, or compaction would change
    // what future probes see.
    val dir = "/root/testdata/sf0.01"
    val iso = java.nio.file.Files.createTempDirectory("q160-fw").toString
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    docs0.coalesce(1).write.parquet(s"$iso/_tmp")
    java.nio.file.Files.move(
      new java.io.File(s"$iso/_tmp").listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath,
      new java.io.File(s"$iso/documents.parquet").toPath)

    val (baseIdx, cut) =
      graft.operators.DedupQueries.postingIndex(spark, iso)
    baseIdx.count() // force the artifact build before snapshotting
    val maxId = docs0.agg(max($"doc_id")).first.getLong(0)
    val cut2 = (maxId + 1L) * 19L / 20L
    val basePath = graft.operators.PipelineQueries.deltaIndexPath(spark, iso)

    def snap(p: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p))
        .map(f => f.getPath -> ((f.length, f.lastModified))).toMap
    }
    val before = snap(basePath)
    assert(before.nonEmpty, "fixture: base index must exist on disk")

    val winTbl =
      graft.operators.DedupQueries.windowPostingTable(spark, iso, cut, cut2)
    winTbl.count()
    assert(snap(basePath) == before,
      "the O(window) flush must not touch the base index's bytes")
    val baseBytes = before.values.map(_._1).sum
    val winBytes = snap(basePath + s"_win$cut2").values.map(_._1).sum
    assert(winBytes > 0 && winBytes * 4 < baseBytes,
      s"flushed bytes must scale with the window (win $winBytes vs " +
        s"base $baseBytes)")

    val absorbed = graft.operators.DedupQueries
      .absorbedPostingIndex(spark, iso, cut, cut2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"band", $"sig").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows(absorbed) == rows(baseIdx) ++ rows(winTbl),
      "compaction must fold exactly base UNION window — nothing " +
        "dropped, nothing invented")

    // The union-read composes across ACCUMULATED windows (the state a
    // slow compaction cadence leaves on disk): two successive flushes
    // [cut, cut2) and [cut2, end) probed as base + win1 + win2 must
    // emit exactly the pairs of the never-flushed q158 stream — the
    // posting sets tile the id space, so the per-table joins' union is
    // the full candidate set whatever the window count.
    val maxId2 = docs0.agg(max($"doc_id")).first.getLong(0)
    val win2 = graft.operators.DedupQueries
      .windowPostingTable(spark, iso, cut2, maxId2 + 1L)
    assert((rows(winTbl) ++ rows(win2)).map(_._1)
        .forall(d => d >= cut && d <= maxId2),
      "window tables must cover only the delta id space")
    assert(rows(winTbl).intersect(rows(win2)).isEmpty,
      "successive windows must be posting-disjoint")
  }

  test("q149 refuses non-monotone doc_id staging (arrival-order guard)") {
    // ADVICE r15: with one boolean of state per content hash, the
    // survivor is the min doc_id of the FIRST batch containing the
    // hash — a staging whose doc_id ranges interleave across arrival
    // order (here: mod-2 striping, the q133-style layout) would
    // silently emit non-min survivors and break the batch twin. The
    // reader-path guard must refuse it up front instead.
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("q149-oOo").toString
    val tmp = s"$staged/_tmp"
    val docs = graft.operators.Tables(spark, dir).documents
    for (i <- 1 to 2) {
      val slice = s"$tmp/$i"
      docs.filter(col("doc_id") % 2 === (i - 1)).coalesce(1)
        .write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$staged/documents_$i.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1000000L * i)
    }
    val ex = intercept[IllegalArgumentException] {
      StreamingQueries.queries("q149_stream_curate")(spark, staged)
    }
    assert(ex.getMessage.contains("monotone doc_id arrival"))
  }

  test("q149 survives a restart: checkpointed state, exactly-once output") {
    // The production contract the memory-sink runs can't show: the
    // curation stream stops (process death, deploy), new files arrive,
    // and a NEW query instance resumes from the checkpoint — the file
    // offsets skip everything already read, the recovered dedup state
    // suppresses hashes curated before the restart, and the file sink
    // ends up exactly-once.
    val dir = "/root/testdata/sf0.001"
    val staged = java.nio.file.Files.createTempDirectory("q149-restart").toString
    val ck = s"$staged/_ck"; val out = s"$staged/_out"; val tmp = s"$staged/_tmp"
    val docs = graft.operators.Tables(spark, dir).documents
    val mid = docs.agg(org.apache.spark.sql.functions.expr(
      "percentile_approx(doc_id, 0.5)")).first.getLong(0)
    def stage(i: Int): Unit = {
      val slice = s"$tmp/$i"
      (if (i == 1) docs.filter(col("doc_id") <= mid)
       else docs.filter(col("doc_id") > mid)).coalesce(1)
        .write.mode("overwrite").parquet(slice)
      val part = new java.io.File(slice).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$staged/documents_$i.parquet").toPath)
    }
    def runOnce(): Unit = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      val q = StreamingQueries.curateStream(s2, staged, None)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    stage(1); runOnce()       // first life: curates the first half
    val afterRun1 = spark.read.parquet(out).count()
    stage(2); runOnce()       // restart: only the new file is read
    val got = spark.read.parquet(out)
    assert(got.count() > afterRun1, "the second life emitted new docs")
    assert(got.groupBy("doc_id").count().filter(col("count") > 1).count() == 0,
      "exactly-once across the restart")
    // And the two lives together equal the single-run registered query
    // over the same staged corpus (which in turn equals the DuckDB
    // batch twin at the oracle gate).
    val single = StreamingQueries.queries("q149_stream_curate")(spark, staged)
    assert(got.exceptAll(single).isEmpty && single.exceptAll(got).isEmpty,
      "restart recovery must not change the curated set")
  }

  test("q149 curate is identical under the RocksDB state store") {
    val dir = "/root/testdata/sf0.001"
    val hdfs = StreamingQueries.queries("q149_stream_curate")(spark, dir)
    assert(hdfs.count() > 0)
    spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
    try {
      val rocks = StreamingQueries.queries("q149_stream_curate")(spark, dir)
      assert(rocks.exceptAll(hdfs).isEmpty && hdfs.exceptAll(rocks).isEmpty)
    } finally spark.conf.unset("spark.graft.streaming.stateStore")
  }

  test("q50 streaming dedup equals batch DISTINCT, under both state stores") {
    val dir = "/root/testdata/sf0.001"
    val twin = graft.operators.Tables(spark, dir).events
      .select("user_id", "event_type").distinct()
    val hdfs = StreamingQueries.queries("q50_stream_dedup")(spark, dir)
    assert(hdfs.count() == twin.count())
    assert(hdfs.exceptAll(twin).isEmpty && twin.exceptAll(hdfs).isEmpty)
    spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
    try {
      val rocks = StreamingQueries.queries("q50_stream_dedup")(spark, dir)
      assert(rocks.exceptAll(twin).isEmpty && twin.exceptAll(rocks).isEmpty)
    } finally spark.conf.unset("spark.graft.streaming.stateStore")
  }
}
