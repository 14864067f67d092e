package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** Partition-pruning witness: the lake-layout half of scan pruning
  * (PlanShapeSpec pins the row-group half). A 100 TB events corpus is
  * laid out partitioned by day; a one-day query must read ONE
  * partition directory, not scan-and-filter the corpus — free when the
  * filter is declarative on the partition column.
  */
class PartitionPruningSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  test("a one-day query over day-partitioned parquet reads one partition") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    val events = Tables(spark, "/root/testdata/sf0.001").events
      .withColumn("day", to_date($"ts"))
    events.write.partitionBy("day").parquet(dir)
    val nDays = events.select($"day").distinct().count()
    assert(nDays > 1, "fixture must span multiple days")

    val someDay = events.select(min($"day")).head().getDate(0)
    val q = spark.read.parquet(dir).filter($"day" === lit(someDay))

    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    // The partition filter resolved at PLAN time: exactly one of the
    // nDays directories is listed, the rest are never touched.
    assert(scan.metadata("PartitionFilters").contains("day"),
      scan.metadata("PartitionFilters"))
    assert(scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length == 1)

    val expected = events.filter($"day" === lit(someDay)).count()
    assert(q.count() == expected && expected > 0)
  }
}
