package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native argmin-by-(l2, cid) over a BROADCAST centroid array — the
  * kernel behind the map-only Lloyd assignment (kmAssign) and q36c's
  * in-row fine assignment. One eval scans every centroid struct in the
  * collected array, folds the [[L2Sq]] distance left-to-right in
  * doubles (bit-parity with the oracle's `list_reduce` fold), and
  * returns the cid minimizing (d, cid) — ties by cid, a NULL distance
  * ordering FIRST (the family's `NULLS FIRST` convention; arises only
  * when an embedding element is NULL, which no corpus ships).
  *
  * Why a dedicated kernel instead of `array_min(transform(...))` over
  * the same array: higher-order-function lambdas evaluate INTERPRETED
  * per element — the SCALE.md §8.5 pq_subdists lesson, re-measured
  * here at the 16.9M×4096 cap witness where the transform form ran
  * ~50× slower than this compiled loop (the whole n×K distance work
  * went through interpreted `Expression.eval` and per-element struct
  * allocation). This kernel does the complete K-entry scan — distance
  * fold, optional gid filter, argmin — inside ONE call with zero
  * allocation.
  *
  * Children: (vec ARRAY<FLOAT|DOUBLE>, cents ARRAY<STRUCT<..>>, gids
  * ARRAY<LONG> | NULL). The struct must carry `cid` LONG and `ce`
  * ARRAY<FLOAT|DOUBLE>; when `gids` is non-NULL the struct must also
  * carry `gid` LONG and only entries whose gid ∈ gids participate —
  * q36c's top-m coarse-cell restriction, filtered inside the same
  * compiled loop instead of a per-row `filter()` HOF.
  */
case class L2ArgMinCid(vec: Expression, cents: Expression,
    gids: Expression)
  extends TernaryExpression with CodegenFallback {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = gids

  override def prettyName: String = "l2_argmin_cid"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def structType: StructType = cents.dataType match {
    case ArrayType(st: StructType, _) => st
    case _ => StructType(Nil)
  }
  private lazy val cidIdx = structType.fieldIndex("cid")
  private lazy val ceIdx = structType.fieldIndex("ce")
  private lazy val gidIdx =
    if (structType.fieldNames.contains("gid")) structType.fieldIndex("gid")
    else -1
  private lazy val nFields = structType.length
  private lazy val vecIsFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val ceIsFloat = structType.fields(ceIdx).dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val anyElemNullable: Boolean = {
    val vecN = vec.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    }
    val ceN = structType.fields(ceIdx).dataType match {
      case ArrayType(_, n) => n
      case _ => false
    }
    vecN || ceN
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val st = structType
    val centsOk = st.nonEmpty &&
      st.fieldNames.contains("cid") && st.fieldNames.contains("ce") &&
      (st.fields(st.fieldIndex("ce")).dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      })
    val gidsOk = gids.dataType match {
      case ArrayType(LongType, _) | NullType => true
      case _ => false
    }
    val gidPresentOk = gids.dataType == NullType ||
      st.fieldNames.contains("gid")
    if (vecOk && centsOk && gidsOk && gidPresentOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "l2_argmin_cid expects (ARRAY<FLOAT|DOUBLE>, " +
        "ARRAY<STRUCT<cid LONG, ce ARRAY<FLOAT|DOUBLE> [, gid LONG]>>, " +
        s"ARRAY<LONG>|NULL), got (${vec.dataType}, ${cents.dataType}, " +
        s"${gids.dataType})")
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val c = cents.eval(input)
    if (v == null || c == null) return null
    val va = v.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val g = if (gids.dataType == NullType) null else gids.eval(input)
    val ga = if (g == null) null else g.asInstanceOf[ArrayData]
    val nG = if (ga == null) 0 else ga.numElements()
    val vn = va.numElements()
    val checkNulls = anyElemNullable

    var bestD = Double.PositiveInfinity
    var bestCid = 0L
    var found = false
    // NULLS FIRST: a null distance outranks every real one; among
    // null-distance candidates the min cid wins (struct (d, cid)
    // ordering with null-first fields — the committed array_min
    // semantics and the oracle's ORDER BY d NULLS FIRST, cid).
    var nullCid = 0L
    var foundNull = false

    val nC = ca.numElements()
    var j = 0
    while (j < nC) {
      if (!ca.isNullAt(j)) {
        val row = ca.getStruct(j, nFields)
        var allowed = true
        if (ga != null) {
          val gid = row.getLong(gidIdx)
          allowed = false
          var t = 0
          while (t < nG && !allowed) {
            if (ga.getLong(t) == gid) allowed = true
            t += 1
          }
        }
        if (allowed) {
          val cid = row.getLong(cidIdx)
          val ce = row.getArray(ceIdx)
          val n = math.min(vn, ce.numElements())
          var acc = 0.0
          var isNullD = false
          var i = 0
          while (i < n && !isNullD) {
            if (checkNulls && (va.isNullAt(i) || ce.isNullAt(i)))
              isNullD = true
            else {
              val x = if (vecIsFloat) va.getFloat(i).toDouble
                      else va.getDouble(i)
              val y = if (ceIsFloat) ce.getFloat(i).toDouble
                      else ce.getDouble(i)
              val d = x - y
              acc += d * d
              i += 1
            }
          }
          if (isNullD) {
            if (!foundNull || cid < nullCid) { nullCid = cid; foundNull = true }
          } else if (!found || acc < bestD ||
              (acc == bestD && cid < bestCid)) {
            bestD = acc; bestCid = cid; found = true
          }
        }
      }
      j += 1
    }
    if (foundNull) nullCid
    else if (found) bestCid
    else null
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, cents = newSecond, gids = newThird)
}
