package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnPolicy, PipelineQueries}

/** q68b cap-regime assignment witness (VERDICT r17 next-round #3
  * acceptance): measures the two-level SemDeDup routing — coarse
  * argmax + in-row fine argmax through the cosine-mode
  * [[graft.functions.L2ArgMinCid]] kernel — at a corpus where the
  * cell-bounded K (= max(64, ⌈n/125⌉)) is large enough that the
  * previous crossJoin/equality-join → `max_by(struct)` chains would
  * have planned the n×C and n×(K/C) struct streams through sort-based
  * aggregates (the shape that spilled 75 GB at q36c's 16.9M cap), and
  * pins BIT-PARITY of the kernel assignment against that old chain on
  * a deterministic sample. One JSON line:
  *
  *   spark-submit --class graft.SemAssignWitness <jar> <corpusDir> [out.json]
  *
  * Reported: n, K, C, codebook build wall (the Lloyd step is itself
  * kernel-routed), assignment wall + µs/row for the full corpus, and
  * the sample-parity verdict.
  */
object SemAssignWitness {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = PipelineQueries.embGlob(spark, dir)
      .select($"vec_id", $"embedding").cache()
    val n = e.count()

    val tCb0 = System.nanoTime()
    val cents = PipelineQueries.trainedCodebookCellBounded(spark, dir)
      .select($"cid", $"ce").cache()
    val k = cents.count()
    val cbWall = (System.nanoTime() - tCb0) / 1e9

    // q68b's two-level routing, kernel path — the registered plan.
    val kdf = cents.agg(
      ceil(sqrt(count(lit(1)).cast("double"))).cast("long").as("step"))
    val coarse = cents.crossJoin(broadcast(kdf))
      .filter($"cid" % $"step" === 0)
      .select($"cid".as("gid"), $"ce".as("ge"))
    val c = coarse.count()
    val coarseArr = coarse.agg(array_sort(
      collect_list(struct($"gid".as("cid"), $"ge".as("ce")))).as("ca"))
    val fineCell = cents.crossJoin(broadcast(coarseArr))
      .withColumn("gid", graft.functions.GraftFunctions
        .cosArgmaxCid($"ce", $"ca", lit(null)))
      .select($"gid", $"cid", $"ce")
    val fineArr = fineCell.agg(array_sort(
      collect_list(struct($"gid", $"cid", $"ce"))).as("fa"))
    val assign = e.repartition(cpus.toInt, $"vec_id")
      .crossJoin(broadcast(coarseArr))
      .withColumn("gid", graft.functions.GraftFunctions
        .cosArgmaxCid($"embedding", $"ca", lit(null)))
      .crossJoin(broadcast(fineArr))
      .withColumn("cid", graft.functions.GraftFunctions
        .cosArgmaxCid($"embedding", $"fa", array($"gid")))
      .select($"vec_id", $"cid")
      .cache()
    val t0 = System.nanoTime()
    val nOut = assign.count()
    val wall = (System.nanoTime() - t0) / 1e9

    // Deterministic ~2000-row sample, re-assigned through the OLD
    // max_by chain (coarse max_by + equality join on gid + fine
    // max_by) — bounded here because the probe side is the sample,
    // not the corpus. The kernel result must match bit-for-bit: same
    // (cos, -id) tie order, same fold.
    val stride = math.max(1L, n / 2000L)
    val sample = e.filter($"vec_id" % stride === 0)
    val vOld = sample.crossJoin(broadcast(coarse))
      .withColumn("gcos",
        graft.functions.GraftFunctions.cosineSim($"embedding", $"ge"))
      .groupBy($"vec_id")
      .agg(max_by($"gid", struct($"gcos", -$"gid")).as("gid"),
        first($"embedding").as("embedding"))
    val aOld = vOld.join(fineCell, "gid")
      .withColumn("ccos",
        graft.functions.GraftFunctions.cosineSim($"embedding", $"ce"))
      .groupBy($"vec_id")
      .agg(max_by($"cid", struct($"ccos", -$"cid")).as("cid"))
      .select($"vec_id", $"cid")
    val oldMap = aOld.as[(Long, Long)].collect().toMap
    val newMap = assign.filter($"vec_id" % stride === 0)
      .as[(Long, Long)].collect().toMap
    val sampleN = oldMap.size
    val mismatches = oldMap.count { case (v, cd) => newMap.get(v) != Some(cd) }

    val json =
      f"""{"corpus":"$dir","n":$n,"k":$k,"c":$c,""" +
        f""""codebook_build_s":$cbWall%.1f,"assign_s":$wall%.1f,""" +
        f""""assign_us_per_row":${wall * 1e6 / n}%.2f,""" +
        f""""rows_out":$nOut,"sample_n":$sampleN,""" +
        f""""sample_mismatches":$mismatches}"""
    println(json)
    if (args.length > 1) Files.writeString(Paths.get(args(1)), json + "\n")
    spark.stop()
  }
}
