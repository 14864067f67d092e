package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Witness for AQE's runtime skew-join handling, documenting the
  * division of labor with q34's manual salting:
  *
  *   - JOINS: let AQE split skewed shuffle partitions at runtime
  *     (`skewJoin.enabled`) — no query rewrite, exact results, works on
  *     sort-merge joins whatever the key distribution turns out to be.
  *   - AGGREGATIONS: AQE does NOT split skewed aggregation partitions
  *     (a partial per split would need a second merge the plan doesn't
  *     have), so a hot-key groupBy needs q34's explicit two-phase
  *     salting (`PipelineQueries.scala`, q34_salted_agg).
  *
  * The spec lowers the skew thresholds so a deliberately hot key
  * triggers a split at test scale, then asserts the adaptive plan
  * actually rewrote the join (`skew=true` marker on the SMJ node).
  */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark = graft.gsheets.Fixtures.spark

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    import spark.implicits._
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key + ~200 rows on each of 50 tail keys, with a
      // payload that makes the hot partition dwarf the 64 KB threshold
      // and the 2x-median factor.
      val pad = "x" * 100
      val facts = spark.range(0, 60000).select(
        org.apache.spark.sql.functions.when($"id" < 50000, 0L)
          .otherwise($"id" % 50 + 1).as("k"),
        org.apache.spark.sql.functions.concat_ws("-", $"id",
          org.apache.spark.sql.functions.lit(pad)).as("payload"))
      val dims = spark.range(0, 51).select($"id".as("k"),
        org.apache.spark.sql.functions.concat_ws("_", $"id",
          org.apache.spark.sql.functions.lit("dim")).as("dim_name"))

      val joined = facts.join(dims, "k")
      // collect() executes THIS QueryExecution, so the adaptive plan
      // below is the finalized one (count() would plan separately).
      assert(joined.collect().length == 60000) // every fact row matches one dim

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split SMJ in the adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q34's salted aggregation equals the plain groupBy it protects") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val salted = PipelineQueries.queries("q34_salted_agg")(spark, dir)
    val plain = Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        round(max("value"), 4).as("max_value"),
        round(min("value"), 4).as("min_value"))
      .orderBy("event_type")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }
}
