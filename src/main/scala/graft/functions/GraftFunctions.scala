package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge

/** Registration surface for the engine's native Catalyst expressions
  * (SURVEY §2.2 "UDF/UDAF surface" — supplied by us, not the reference).
  *
  * Two paths, mirroring how Spark's own functions are reachable:
  *   - [[graft.GraftExtensions]] injects them at session build
  *     (`spark.sql.extensions`) so plain SQL text can call them;
  *   - [[ensureRegistered]] registers at first use for sessions built
  *     without the extension (e.g. the driver's own harness session).
  * DataFrame code can skip both and use the typed [[cosineSim]] column
  * wrapper directly.
  */
object GraftFunctions {

  /** (name, info, builder) for every native function we expose to SQL. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", CosineSim.info, { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"cosine_sim expects 2 arguments, got ${exprs.length}")
      CosineSim(exprs.head, exprs(1))
    }),
    ("hyperplane_dots", HyperplaneDots.info, { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"hyperplane_dots expects 2 arguments, got ${exprs.length}")
      val n = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"hyperplane_dots: numPlanes must be an integer literal, got $other")
      }
      HyperplaneDots(exprs.head, n)
    }))

  /** Typed column API: `cosineSim($"embedding", $"qe")`. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** Typed column API: `hyperplaneDots($"embedding", 12)`. */
  def hyperplaneDots(a: Column, numPlanes: Int): Column =
    Bridge.column(HyperplaneDots(Bridge.expression(a), numPlanes))

  /** Idempotent runtime registration into the session's function
    * registry (temp-function namespace, like `spark.udf.register`).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      Bridge.registerTempFunction(spark, name, builder)
    }
}
