// Dump `.explain("formatted")` for a named query list to files -- the
// plans/r19/<query>_{before,after}.txt evidence. Parameters via -D:
//   -Dgraft.plans.queries=q60_ann_pq,q61_range_join
//   -Dgraft.plans.outdir=/root/repo/plans/r19
//   -Dgraft.plans.suffix=after
//   -Dgraft.plans.dir=/root/testdata/sf0.01   (default)
// Usage: spark-shell --jars <jar> -i tools/r19/dump_plans.scala
val names = sys.props("graft.plans.queries").split(",").toSeq
val outDir = sys.props("graft.plans.outdir")
val suffix = sys.props.getOrElse("graft.plans.suffix", "after")
val dataDir = sys.props.getOrElse("graft.plans.dir", "/root/testdata/sf0.01")
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
for (n <- names) {
  val df = graft.SparkEntry.queries(n)(spark, dataDir)
  val plan = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)
  java.nio.file.Files.writeString(
    java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
  println(s"[done] $n -> $outDir/${n}_$suffix.txt")
}
System.exit(0)
