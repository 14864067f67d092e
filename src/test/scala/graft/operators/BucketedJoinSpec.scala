package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** Bucketing witness: the third co-location tool next to broadcast
  * (dimension sides) and repartition (transient co-location). Writing
  * both join sides bucketed on the join key makes every future join on
  * that key SHUFFLE-FREE — the physical plan has zero Exchange nodes —
  * which is the 100 TB answer for fact⋈fact joins repeated across a
  * pipeline: pay the partitioning once at write time, never per query.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with zero Exchange nodes") {
    val wh = Files.createTempDirectory("graft_bucket_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$wh'")
    try {
      val t = Tables(spark, dir)
      t.orders.select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .format("parquet").mode("overwrite").saveAsTable("bucketdb.orders_b")
      t.customer.select($"c_custkey", $"c_name", $"c_acctbal")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .format("parquet").mode("overwrite").saveAsTable("bucketdb.customer_b")

      // Forbid broadcast so the join must co-locate by partitioning —
      // the case bucketing exists for.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bucketdb.orders_b")
          .join(spark.table("bucketdb.customer_b"),
            $"o_custkey" === $"c_custkey")
          .groupBy($"c_custkey")
          .agg(count(lit(1)).as("n_orders"), sum($"o_totalprice").as("sum_price"))

        val rows = joined.count()
        val plan = joined.queryExecution.executedPlan.toString

        // Both sides expose bucket partitioning on the join key: no
        // shuffle for the join AND none for the aggregation either
        // (it groups on the same key).
        assert(!plan.contains("Exchange"),
          s"expected a shuffle-free bucketed join + agg, got:\n$plan")

        // Same result as the plain (shuffling) join over raw parquet.
        val expected = t.orders.join(t.customer,
            $"o_custkey" === $"c_custkey")
          .groupBy($"c_custkey").agg(count(lit(1)))
          .count()
        assert(rows == expected)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
    }
  }
}
