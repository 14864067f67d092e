package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** [[HyperplaneDots]] — the native signature step of the hyperplane-LSH
  * family (q26/q33). The ground truth is the SQL higher-order-function
  * fold with identical semantics; the native expression must match it
  * bit-for-bit in both interpreted and codegen evaluation.
  */
class HyperplaneDotsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  /** The (slow, interpreted) SQL formulation the expression replaces. */
  private def foldExpr(nH: Int): String =
    s"""transform(sequence(0, ${nH - 1}), h ->
          aggregate(
            zip_with(embedding, sequence(0, size(embedding) - 1),
              (ev, d) -> CAST(ev AS DOUBLE) *
                ((CAST(h AS BIGINT) * 64 + d) * 2654435761 % 4294967296
                 / 2147483648.0D - 1.0D)),
            CAST(0 AS DOUBLE), (acc, x) -> acc + x))"""

  private def vecs = Seq(
    (1L, Array(0.5f, -1.25f, 3.0f, 0.0f)),
    (2L, Array.tabulate(64)(i => (i * 0.37f - 11.0f))),
    (3L, Array(42.0f)),
    (4L, Array.empty[Float])
  ).toDF("vec_id", "embedding")

  test("matches the SQL fold bit-for-bit (codegen path)") {
    for (nH <- Seq(1, 8, 12)) {
      val got = vecs
        .withColumn("native", GraftFunctions.hyperplaneDots($"embedding", nH))
        .withColumn("fold", expr(foldExpr(nH)))
        .select($"vec_id", $"native", $"fold")
        .collect()
      for (r <- got) {
        val n = r.getSeq[Double](1)
        val f = r.getSeq[Double](2)
        assert(n.length == nH && f.length == nH, s"vec ${r.getLong(0)}")
        // Bit-equality, not epsilon: the oracle hash compare needs it.
        assert(n.map(java.lang.Double.doubleToLongBits) ==
               f.map(java.lang.Double.doubleToLongBits), s"vec ${r.getLong(0)} nH=$nH")
      }
    }
  }

  test("interpreted eval matches codegen") {
    // Interpreted path, driven directly through eval on a literal row.
    val lit8 = HyperplaneDots(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.5f, -1.25f, 3.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)), 8)
    val viaEval = lit8.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    val viaDf = Seq((1L, Array(0.5f, -1.25f, 3.0f))).toDF("vec_id", "embedding")
      .select(GraftFunctions.hyperplaneDots($"embedding", 8).as("d"))
      .collect().head.getSeq[Double](0).toArray
    assert(viaEval.toSeq.map(java.lang.Double.doubleToLongBits) ==
           viaDf.toSeq.map(java.lang.Double.doubleToLongBits))
  }

  test("a null array ELEMENT nulls every plane's dot, like the SQL fold") {
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS embedding")
      .withColumn("native", GraftFunctions.hyperplaneDots($"embedding", 4))
      .withColumn("fold", expr(foldExpr(4)))
    val r = df.collect().head
    val native = r.getSeq[Any](1)
    val fold = r.getSeq[Any](2)
    assert(native.length == 4 && native.forall(_ == null))
    assert(native == fold)
  }

  test("null embedding yields null; SQL registration works") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((1L, Some(Array(1.0f))), (2L, None))
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "hyperplane_dots(embedding, 4) AS d")
      .orderBy("vec_id")
    val rows = df.collect()
    assert(rows(0).getSeq[Double](1).length == 4)
    assert(rows(1).isNullAt(1))
  }

  test("rejects wrong input type and non-literal plane count") {
    val e = intercept[Exception] {
      Seq((1L, "nope")).toDF("vec_id", "embedding")
        .select(GraftFunctions.hyperplaneDots($"embedding", 4)).collect()
    }
    assert(e.getMessage.contains("hyperplane_dots") ||
           e.getMessage.contains("ARRAY<FLOAT>"))
    GraftFunctions.ensureRegistered(spark)
    val e2 = intercept[Exception] {
      Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
        .selectExpr("hyperplane_dots(embedding, vec_id)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }
}
