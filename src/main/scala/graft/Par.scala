package graft

import org.apache.spark.sql.SparkSession

/** Session-derived repartition width for corpus-sized kernel passes.
  *
  * The explicit-width repartitions that spread a one-split parquet scan
  * across the cluster before a compiled-kernel stage used a literal 32 —
  * local[32]'s core count — which would cap every such pass at 32 tasks
  * on any real cluster (VERDICT r19 #1: a local[32]-only constant).
  * Width now follows the session: `defaultParallelism` is the live core
  * count both in local[N] and on a cluster (total executor cores), so
  * the same query text scales its task count with the hardware, and at
  * the bench's local[32] the produced plans are byte-identical to the
  * old literal (hashpartitioning(key, 32)).
  *
  * An EXPLICIT width is kept (rather than `repartition(col)` alone,
  * which reads spark.sql.shuffle.partitions) because AQE would coalesce
  * the small-at-test-scale exchange back to one partition and serialize
  * the kernel stage that follows it — the repartition exists precisely
  * to spread a one-split scan, not to right-size shuffle output.
  * `NoLiteralRepartitionSpec` pins that no literal-width repartition is
  * reintroduced in src/main.
  */
object Par {
  def width(s: SparkSession): Int = s.sparkContext.defaultParallelism
}
