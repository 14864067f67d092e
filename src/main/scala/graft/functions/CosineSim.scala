package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two embedding columns.
  *
  * The engine-extension ops (SURVEY §2.2 north star) score embeddings in
  * their hot loops; the SQL-function formulation
  * (`aggregate(zip_with(...))`) walks the arrays three times and
  * allocates an intermediate product array per row. This expression is
  * the preferred Catalyst form (brief: native `Expression` with
  * `doGenCode` > UDF): one fused loop, no allocation, and it lives
  * inside whole-stage codegen, so the surrounding filter/project stays
  * in one generated function.
  *
  * Like [[L2Sq]]/[[PqSubDists]] it accepts `ARRAY<FLOAT>` or
  * `ARRAY<DOUBLE>` on EITHER side independently: corpus vectors arrive
  * as float32 parquet, while TRAINED codebook centroids (the q72 Lloyd
  * artifact the production ANN variants route against) are double
  * averages — forcing a cast of the corpus side would materialize a
  * doubled copy of every vector.
  *
  * Semantics (bit-parity with the DuckDB oracle's
  * `list_dot_product(a,b) / (sqrt(list_dot_product(a,a)) *
  * sqrt(list_dot_product(b,b)))` on double lists): every float is
  * widened to double, the three accumulators fold left-to-right in one
  * pass, mismatched lengths score the common prefix, and a zero norm
  * yields NaN — identical to the SQL-fold formulation it replaces.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  // Not ExpectsInputTypes (its signature type is private[sql] in Spark
  // 4); embeddings arrive as ARRAY<FLOAT|DOUBLE> so no implicit casts
  // needed — just validate.
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects ARRAY<FLOAT|DOUBLE> on both sides, got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = isFloat(left)
    val bf = isFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA =
        if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB =
        if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        |final int $n = Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $x = $getA;
        |  final double $y = $getB;
        |  $dot += $x * $y;
        |  $na += $x * $x;
        |  $nb += $y * $y;
        |}
        |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[CosineSim].getName, null, "cosine_sim")
}
