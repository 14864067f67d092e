package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Native CosineSim expression: value parity with the SQL-fold
  * formulation it replaced, codegen vs interpreted agreement, null
  * handling, and SQL-text reachability through the session extension.
  */
class CosineSimSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val foldCos =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                 CAST(0 AS DOUBLE), (acc, v) -> acc + v)
       / (sqrt(aggregate(a, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
          * sqrt(aggregate(b, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"""

  test("matches the SQL-fold cosine bit-for-bit on random vectors") {
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2f - 1f),
      Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = data.toDF("a", "b")
      .withColumn("native", GraftFunctions.cosineSim($"a", $"b"))
      .withColumn("fold", expr(foldCos))
    // Bit-identical, not just approximately equal: same accumulation order.
    assert(df.filter($"native" =!= $"fold").count() == 0)
  }

  test("known values") {
    val df = Seq((Array(1f, 2f), Array(2f, 4f)), (Array(1f, 0f), Array(0f, 1f)))
      .toDF("a", "b")
      .withColumn("c", round(GraftFunctions.cosineSim($"a", $"b"), 10))
    assert(df.collect().map(_.getDouble(2)).toSeq == Seq(1.0, 0.0))
  }

  test("null inputs propagate to null") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .withColumn("c", GraftFunctions.cosineSim($"a", $"b"))
    assert(df.collect().head.isNullAt(2))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Literal.create(ArrayData.toArrayData(Array(1f, 2f, 3f)), ArrayType(FloatType))
    val b = Literal.create(ArrayData.toArrayData(Array(4f, 5f, 6f)), ArrayType(FloatType))
    val interpreted = CosineSim(a, b).eval(null).asInstanceOf[Double]
    val viaDf = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .select(GraftFunctions.cosineSim($"a", $"b")).collect().head.getDouble(0)
    assert(interpreted == viaDf)
  }

  test("reachable from SQL text via the session extension") {
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
      "array(CAST(2 AS FLOAT), CAST(4 AS FLOAT)))").collect().head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("ensureRegistered is idempotent and enables SQL on bare sessions") {
    GraftFunctions.ensureRegistered(spark)
    GraftFunctions.ensureRegistered(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(3 AS FLOAT)), array(CAST(7 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }
}
