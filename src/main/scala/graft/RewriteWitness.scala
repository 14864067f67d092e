package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.PipelineQueries

/** Storage-rewrite cost witness (VERDICT r15 #4): the q153 rewrite
  * mechanism — dynamic partition overwrite of the cell-partitioned
  * index — measured at corpus scale with a LOCALIZED delete, the
  * delete shape the touched-buckets bound is about. (The registered
  * q153's tombstone stripe is deliberately uniform, so at scale it
  * touches every cell — the honest worst case; a real
  * right-to-be-forgotten batch clusters in few cells.) This main:
  *
  *  1. times the FULL partitioned-index build (the rebuild a
  *     non-writable index would pay);
  *  2. tombstones HALF the members of 3 of the K cells, rewrites via
  *     the same staging + dynamic-overwrite path, and times it;
  *  3. asserts at the FILE level that exactly those 3 partition
  *     directories changed (mtime/length) and the other K−3 are
  *     byte-identical — rewrite cost is O(touched buckets).
  *
  *   sbt -batch "runMain graft.RewriteWitness /tmp/scale_160x_r15 [out]"
  */
object RewriteWitness {

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

    val e = PipelineQueries.embGlob(spark, dir).cache()
    val n = e.count()
    val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L

    val t0 = System.nanoTime()
    val idx = PipelineQueries.ivfpqIndexPartBefore(spark, dir, cut)
    idx.count()
    val buildS = (System.nanoTime() - t0) / 1e9
    val base = PipelineQueries.ivfpqPartPath(spark, dir, cut)

    def dirState(): Map[String, (Long, Long)] =
      new java.io.File(base).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
        .map(d => d.getName -> (
          d.listFiles().map(_.lastModified()).max,
          d.listFiles().map(_.length()).sum)).toMap

    val cells3 = idx.select($"cid").distinct().orderBy($"cid")
      .limit(3).as[Long].collect()
    val before = dirState()
    val nLists = before.size

    // Localized delete: half the members (vec_id % 2 = 0) of 3 cells.
    val t1 = System.nanoTime()
    val tomb = idx.filter($"cid".isin(cells3: _*) && $"vec_id" % 2 === 0)
      .select($"vec_id")
    val stored = spark.read.parquet(base)
      .filter($"cid".cast("long").isin(cells3: _*))
      .select($"vec_id", $"codes", $"cid".cast("long").as("cid"))
    val staging = base + "_locstage"
    stored.join(tomb, Seq("vec_id"), "left_anti")
      .write.mode("overwrite").parquet(staging)
    val staged = spark.read.parquet(staging)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try staged.write.mode("overwrite").partitionBy("cid").parquet(base)
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val rewriteS = (System.nanoTime() - t1) / 1e9

    val after = dirState()
    val touched = cells3.map("cid=" + _).toSet
    val untouched = before.keySet -- touched
    val untouchedOk = untouched.forall(d => after(d) == before(d))
    val touchedChanged = touched.count(d => after(d) != before(d))
    require(untouchedOk, "an untouched partition changed — not O(touched)")

    val json =
      f"""{"dir":"$dir","n_vectors":$n,"cut":$cut,"n_lists":$nLists""" +
        f""","build_s":$buildS%.2f,"rewrite_s":$rewriteS%.2f""" +
        f""","touched_cells":${cells3.length}""" +
        f""","touched_changed":$touchedChanged""" +
        f""","untouched_cells":${untouched.size}""" +
        f""","untouched_identical":$untouchedOk}"""
    if (args.length > 1) Files.writeString(Paths.get(args(1)), json + "\n")
    // The manual staging tree is not materializeOnce-registered —
    // drop it ourselves (review finding, r16).
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
      f.delete(): Unit
    }
    rmTree(new java.io.File(staging))
    PipelineQueries.cleanupArtifacts(spark)
    spark.stop()
    println(json)
  }
}
