package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark. Fixes over the round-1 harness (VERDICT "What's
  * wrong" #3-5):
  *   - noop-sink writes instead of `.count()` so Catalyst cannot prune
  *     the projected columns away — every output column is computed;
  *   - fixed (sorted) query order + one untimed warm-up query, so JVM /
  *     codegen warm-up doesn't pollute whichever query runs first;
  *   - the JSON line is also written to `bench_out.json` (cwd, or
  *     $SPARK_GRAFT_BENCH_OUT) so the driver never has to fish it out of
  *     sbt log noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same provider toggle as Verify: SPARK_GRAFT_STATE_STORE=rocksdb
    // benches the streaming family on the off-heap state store.
    sys.env.get("SPARK_GRAFT_STATE_STORE")
      .foreach(v => spark.conf.set("spark.graft.streaming.stateStore", v))

    // Optional comma-separated name filter (scale-witness subset runs;
    // the driver never sets it, so its runs always cover the registry).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Fail loudly on a filter that matches nothing (a typoed name would
    // otherwise die on names.head with a bare NoSuchElementException —
    // ADVICE r9).
    if (names.isEmpty) sys.error(
      s"SPARK_GRAFT_BENCH_ONLY matched no registered query: " +
        s"${only.map(_.toSeq.sorted.mkString(",")).getOrElse("")}")

    // q133 steady-state staging (VERDICT r8 #4): feed q133 a 3-file
    // copy of the documents table with maxFilesPerTrigger=1 so its
    // streaming_batch_ms rows report MULTI-batch steady state — the
    // post-first-batch state-probe amortization — instead of one
    // all-of-input batch. The chunk-signature key set is independent
    // of arrival batching (the q50 argument; StreamingQueriesSpec pins
    // the 2-file staged run equal to the single-batch run), so the
    // measured query is result-identical; only the feed is staged.
    // Built only when q133 is in the run set (ADVICE r9: a filtered
    // run that excludes q133 must not pay the 3 parquet rewrites).
    //
    // INVARIANT (VERDICT r9 #7): maxFilesPerTrigger=1 is set
    // SESSION-WIDE, so it also applies to the other seven streaming
    // benches. Today that is a no-op for them — every other streaming
    // source dir holds exactly ONE parquet file, so one-file triggers
    // and all-files triggers are the same single batch. The assert
    // below pins that invariant at bench time: if a future testdata
    // generation ships a multi-file events/documents table, it fails
    // here instead of silently turning the other streaming benches
    // into multi-batch runs with different per-batch numbers.
    val q133Dir: String = if (!names.contains("q133_stream_chunk_dedup")) sfDir
    else {
      for (stem <- Seq("events", "documents")) {
        val f = new java.io.File(s"$sfDir/$stem.parquet")
        require(!f.isDirectory ||
          f.listFiles().count(_.getName.endsWith(".parquet")) <= 1,
          s"$stem.parquet holds multiple part files: with " +
            "spark.graft.streaming.maxFilesPerTrigger=1 set session-wide " +
            "for q133's staging, the other streaming benches would " +
            "silently become multi-batch runs — re-stage them explicitly " +
            "or scope the conf to q133.")
      }
      val staged = Files.createTempDirectory("q133-stage").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      for (i <- 1 to 3) {
        val slice = s"$staged/_tmp/$i"
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 3 === (i - 1))
          .coalesce(1).write.mode("overwrite").parquet(slice)
        val part = new java.io.File(slice).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(s"$staged/documents_$i.parquet")
        Files.move(part.toPath, dest.toPath)
        dest.setLastModified(1000000L * i) // deterministic batch order
      }
      spark.conf.set("spark.graft.streaming.maxFilesPerTrigger", "1")
      staged
    }

    // A failed query records the sentinel -1, never its elapsed-to-crash
    // time — a regression that breaks a query must not read as a speedup.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        val dirFor = if (name == "q133_stream_chunk_dedup") q133Dir else sfDir
        SparkEntry.queries(name)(spark, dirFor)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name
        -1.0
      }
    }

    // Pass epilogue (VERDICT r9 #3 — the q46–q99 warm-tail regression):
    // each pass's streaming runs use FRESH checkpoint dirs, so their
    // state-store providers are garbage the moment the query stops —
    // but Spark keeps them in the JVM-wide StateStore.loadedProviders
    // map, every in-memory state version included, until an unload.
    // Four passes × 8 streaming queries accumulate against the 16g
    // heap exactly where the bench order puts the batch tail.
    // Cached BATCH frames are deliberately NOT cleared: cache entries
    // dedup by canonical plan, so passes 2–4 re-hit pass 1's entries —
    // that reuse IS the warm-session semantics this pass measures.
    def passEpilogue(tag: String): Unit = {
      org.apache.spark.sql.graft.Bridge.unloadStateStores()
      val storage = spark.sparkContext.getRDDStorageInfo
      val rt = Runtime.getRuntime
      System.err.println(
        f"[bench] $tag: cachedRDDs=${storage.length} " +
          f"cachedMem=${storage.map(_.memSize).sum / 1e6}%.0fMB " +
          f"cachedDisk=${storage.map(_.diskSize).sum / 1e6}%.0fMB " +
          f"heapUsed=${(rt.totalMemory - rt.freeMemory) / 1e6}%.0fMB")
    }

    // Artifact-build attribution (VERDICT r15 #2): session artifacts
    // (BPE merges, trained codebooks, posting indexes, …) build lazily
    // inside whichever query first touches them, so per-query COLD
    // numbers mixed plan cost with amortization (q86 read 13.1 s cold
    // / 0.18 s warm — 13 s of that was the one-per-session BPE train).
    // materializeOnce now logs each (key, build seconds); draining the log
    // after each cold run attributes every build to its first-toucher,
    // and the JSON reports builds as their own line so cold plan cost
    // is readable without a same-box diff.
    def drainArtifacts(): Seq[(String, Double)] = {
      val q = graft.operators.PipelineQueries.artifactBuildLog
      val buf = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      var e = q.poll()
      while (e != null) { buf += e; e = q.poll() }
      buf.toSeq
    }
    def artName(k: String): String = k
      .replaceAll(".*/", "")
      .replaceAll("local[_0-9]+_*", "")
      .replaceAll("_[0-9a-f]{8}", "")

    val artRows = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
    runOnce(names.head) // untimed JVM/codegen warm-up
    drainArtifacts().foreach { case (k, s2) =>
      artRows += ((artName(k), s"warmup:${names.head}", s2)) }
    val results = names.map { n =>
      val t = runOnce(n)
      drainArtifacts().foreach { case (k, s2) => artRows += ((artName(k), n, s2)) }
      n -> t
    }
    passEpilogue("after-cold")
    // Warm = per-query MEDIAN over three post-cold passes: codegen
    // compilation (the dominant fixed cost at this scale — measured 16s
    // cold vs 3.7s warm for the MinHash pipeline) is already paid, so
    // this is the steady-state number a long-lived session sees. The
    // median suppresses one-off host stalls (a shared host lands a
    // multi-second hiccup on ONE random query per pass — observed as a
    // 21s q16 in one run, a 12s q23 in the next, each trivially sub-
    // second in every other run — which would otherwise read as a fake
    // per-query regression) WITHOUT the flattering bias a min has
    // (min-of-2 was the round-4–7 estimator; VERDICT r7 #3 asked for
    // the stall-robust unbiased one). Reported alongside, never
    // replacing, the cold pass.
    // Streaming steady-state, triage-grade (VERDICT r16 #8): the warm
    // WALL time of a streaming query measures run lifecycle (planning,
    // state-store init, offset/commit WALs) as much as plan — q59's
    // warm read ABOVE its cold in r16. Snapshot each warm run's total
    // triggerExecution ms right after the run (batchDurationsMs is
    // overwritten per run), then report the per-query MEDIAN across
    // the three warm passes as its own map so cross-round triage can
    // diff the steady-state number instead of the lifecycle-noisy wall.
    val warmBatchMs =
      scala.collection.mutable.Map[String, List[Long]]().withDefaultValue(Nil)
    val warmPasses = (1 to 3).map { p =>
      val r = names.map { n =>
        val t = runOnce(n)
        // Snapshot only on success: batchDurationsMs is overwritten
        // per successful run, so after a failed run (t < 0) the map
        // still holds the PREVIOUS run's durations — appending then
        // would duplicate a stale value into the warm median.
        if (t >= 0)
          graft.streaming.StreamingQueries.batchDurationsMs.get(n)
            .foreach(ds => warmBatchMs(n) = warmBatchMs(n) :+ ds.sum)
        // A build landing in a WARM pass means the cold run failed
        // mid-build (its memo entry was never written) — drain it too,
        // so the artifact report stays total and the distortion of
        // that warm number is at least visible (review finding, r16).
        drainArtifacts().foreach { case (k, s2) =>
          artRows += ((artName(k), s"warm$p:$n", s2)) }
        n -> t
      }.toMap
      passEpilogue(s"after-warm-$p")
      r
    }
    val warm = names.map { n =>
      val ok = warmPasses.map(_(n)).filter(_ >= 0).sorted
      // Median of the surviving passes. With one failed pass (two
      // survivors) the median IS their mean — ok(1) would silently be
      // the MAX of the two, a pessimistic bias the estimator never
      // intended (ADVICE r8).
      n -> (ok.size match {
        case 0 => -1.0
        case 2 => (ok(0) + ok(1)) / 2
        case k => ok(k / 2)
      })
    }

    def fmt(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def sum(rs: Seq[(String, Double)]): Double = rs.map(_._2).filter(_ >= 0).sum
    // Streaming wall times are dominated by per-run job lifecycle
    // (planning, state-store init, offset/commit WALs); the per-batch
    // triggerExecution durations from the LAST (warm) run are the
    // steady-state cost a long-lived stream sees — reported additively
    // so streaming rows are comparable to batch rows (driver schema
    // untouched).
    val batchMs = graft.streaming.StreamingQueries.batchDurationsMs.toSeq
      .sortBy(_._1)
      .map { case (k, ds) =>
        "\"" + k + "\":" + ds.mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val batchMsWarm = warmBatchMs.toSeq.sortBy(_._1)
      .map { case (k, sums) =>
        val s2 = sums.sorted
        val med = if (s2.isEmpty) -1L else s2(s2.size / 2)
        "\"" + k + "\":" + med
      }.mkString("{", ",", "}")
    // Final state-store rows per streaming query (and per lifecycle
    // tag for multi-incarnation queries) from the most recent run —
    // the state-bound numbers SCALE.md's streaming sections cite, so
    // scale witnesses don't need a side-channel (VERDICT r17 #6).
    val stateRows = graft.streaming.StreamingQueries.stateRowsAfter.toSeq
      .sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val artJson = artRows.map { case (a, q, s2) =>
      f"""{"artifact":"$a","query":"$q","build_s":$s2%.3f}"""
    }.mkString("[", ",", "]")
    val artByQ = artRows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val coldArtJson = results.collect {
      case (n, _) if artByQ.contains(n) =>
        "\"" + n + "\":" + f"${artByQ(n)}%.3f"
    }.mkString("{", ",", "}")
    val artTotal = artRows.map(_._3).sum
    val json =
      s"""{"metric":"total","value":${sum(results)},"unit":"sec","n_queries":${names.size},""" +
        s""""queries":${fmt(results)},"value_warm":${sum(warm)},""" +
        s""""queries_warm":${fmt(warm)},""" +
        f""""artifact_total_s":$artTotal%.3f,""" +
        s""""artifact_build_s":$artJson,""" +
        s""""queries_cold_artifact_s":$coldArtJson,""" +
        s""""streaming_batch_ms":$batchMs,""" +
        s""""streaming_batch_ms_warm_median":$batchMsWarm,""" +
        s""""state_rows":$stateRows,""" +
        s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""sf":"$sfDir"}"""
    // The driver's artifact capture keeps only the TAIL of stdout
    // (~2000 chars — BENCH_r12/r13 both parsed null because the full
    // per-query line is ~9.5 KB and its head was cut off; VERDICT r13
    // #3/#7; BENCH_r18/r19 confirm the stored tail is exactly 2000
    // chars, so the 173-name per-query maps can never ride stdout).
    // The LAST line must therefore be a summary that fits the tail
    // whole: totals + failures + the streaming steady-state medians
    // (~0.8 KB — the one per-query map that DOES fit), with the full
    // per-query maps pointed at by `detail`.
    //
    // VERDICT r19 #2 (measurement-reporting fix, declared in
    // OPTIMIZATION_r20.md): the detail path is now RUN-STAMPED by
    // (cpus, sf) so the driver's own low-core re-run minutes later can
    // no longer clobber the 32-core detail before the PERF comparator
    // reads it (r19's n_common=0). The legacy un-stamped name is still
    // written for any consumer of the old path, and SPARK_GRAFT_BENCH_OUT
    // keeps absolute priority — nothing else about the JSON schema or
    // the timed region changes.
    val sfName = Paths.get(sfDir).getFileName.toString
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"bench_out_c${cpus}_$sfName.json")
    val compact =
      f"""{"metric":"total","value":${sum(results)}%.3f,"unit":"sec",""" +
        f""""n_queries":${names.size},"value_warm":${sum(warm)}%.3f,""" +
        f""""artifact_s":$artTotal%.3f,""" +
        s""""streaming_batch_ms_warm_median":$batchMsWarm,""" +
        s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""sf":"$sfDir","detail":"$outPath"}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    if (!sys.env.contains("SPARK_GRAFT_BENCH_OUT"))
      Files.writeString(Paths.get("bench_out.json"), json + "\n")
    // Epilogue: drop session-keyed persisted artifacts (see Verify).
    graft.operators.PipelineQueries.cleanupArtifacts(spark)
    spark.stop()
    // Printed AFTER spark.stop() so the bare JSON lines are the
    // process's last stdout lines (run / outputStrategy := StdoutOutput
    // keeps sbt's logger from prefixing them with "[info] "): first the
    // full per-query line (for logs and anyone reading the whole
    // stream), then the tail-sized compact summary as the FINAL line.
    println(json)
    println(compact)
  }
}
