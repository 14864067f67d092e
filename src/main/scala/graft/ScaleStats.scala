package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scale-witness diagnostics (VERDICT r8 #1): PPJoin candidate/prune
  * counts and LSH band-bucket histograms at a given corpus dir, as one
  * JSON line — run at the base and 10× corpora and quoted in SCALE.md.
  *
  *   sbt -batch "runMain graft.ScaleStats /tmp/scale_10x [out.json]"
  */
object ScaleStats {
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
    val stats = graft.operators.PipelineQueries.prefixPruneStats(spark, dir) ++
      graft.operators.PipelineQueries.bandBucketStats(spark, dir)
    // dir is user input riding inside a JSON string — escape it
    // (ADVICE r9: a quote or backslash in the path produced malformed
    // JSON for the SCALE.md tooling).
    val dirJson = dir.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = stats.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"dir":"$dirJson",""", ",", "}")
    if (args.length > 1) Files.writeString(Paths.get(args(1)), json + "\n")
    spark.stop()
    println(json)
  }
}
