package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native hashed-feature linear scoring: folds
  * `Σ_i weights[ids[i] mod |weights|]` left-to-right over an
  * `ARRAY<LONG>` id column — the inner product `x·w` of a
  * feature-hashed bag-of-words `x` (unnormalized counts) with a dense
  * weight vector `w`, without ever materializing `x`. This is the
  * fastText-style quality-classifier kernel (q73): one fused loop per
  * row, map-only, inside whole-stage codegen, where the
  * `aggregate(transform(...))` SQL formulation evaluates an
  * interpreted lambda per token (the measured trap the other kernels
  * in this package exist to avoid).
  *
  * The bucket index uses floor-Mod, so negative ids land in
  * `[0, |weights|)` rather than out of range; the q73 ids are
  * poly-hashes in `[0, 1e9+7)`, where floorMod ≡ `%` in both engines.
  * Out-of-range never occurs by construction, and an empty weight
  * array yields NULL (no bucket to score into).
  */
case class BucketDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  // Can yield NULL even from non-null inputs (empty weight array, or a
  // NULL element when the child type allows them) — without this
  // override, nullSafeCodeGen's non-nullable branch renders ev.isNull
  // as the literal `false` and the generated `false = true;` fails
  // Janino compilation (ADVICE r5).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bucket_dot expects (ARRAY<BIGINT>, ARRAY<DOUBLE>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  /** Whether either array type admits NULL elements; only then do the
    * loops pay per-element null checks (a NULL element propagates NULL,
    * matching the SQL higher-order fold this kernel replaces — parquet
    * schemas mark elements nullable even when no nulls exist, so this
    * must be handled, not rejected). */
  private def elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  override def prettyName: String = "bucket_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val ids = l.asInstanceOf[ArrayData]
    val w = r.asInstanceOf[ArrayData]
    val m = w.numElements()
    if (m == 0) return null
    val n = ids.numElements()
    val checkNulls = elemsNullable
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && ids.isNullAt(i)) return null
      val b = java.lang.Math.floorMod(ids.getLong(i), m.toLong).toInt
      if (checkNulls && w.isNullAt(b)) return null
      acc += w.getDouble(b)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ids, w) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val body =
        if (elemsNullable)
          s"""
            |    if ($ids.isNullAt($i)) { ${ev.isNull} = true; break; }
            |    final int $b =
            |      (int) java.lang.Math.floorMod($ids.getLong($i), (long) $m);
            |    if ($w.isNullAt($b)) { ${ev.isNull} = true; break; }
            |    $acc += $w.getDouble($b);"""
        else
          s"""
            |    $acc += $w.getDouble(
            |      (int) java.lang.Math.floorMod($ids.getLong($i), (long) $m));"""
      s"""
        |final int $m = $w.numElements();
        |if ($m == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  final int $n = $ids.numElements();
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {$body
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = $acc;
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketDot =
    copy(left = newLeft, right = newRight)
}

object BucketDot {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[BucketDot].getName, null, "bucket_dot")
}
