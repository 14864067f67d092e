package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** Native AS-OF join — the whole-operator rung of the custom-op ladder
  * (logical node → planner strategy → physical operator), supplied
  * because Spark has no ASOF JOIN while the oracle engine does.
  *
  * Semantics (matching DuckDB `ASOF JOIN ... ON l.k = r.k AND
  * l.t >= r.t`): every left row pairs with the LATEST right row of the
  * same key whose time is ≤ the left row's time, or nulls if none.
  * Left rows with a null key/time never match; right rows with a null
  * key/time never participate.
  *
  * Physical shape: each child hash-clustered on its key and sorted by
  * (key, time) — `requiredChildDistribution`/`requiredChildOrdering`,
  * so EnsureRequirements plans the exchanges and sorts — then ONE
  * forward merge per partition with O(1) state (the current candidate
  * row). That is the scalable form of the composition q35 uses
  * (union + last(ignoreNulls) window): no union materialization, no
  * window buffering, and per-key state never exceeds one row. At
  * 100 TB both inputs shuffle once on the key and stream through the
  * merge.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of merge join. Children arrive clustered by key and
  * sorted by (key, time) — this node only streams.
  */
case class AsOfJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = BindReferences.bindReference(leftKey, lOut)
    val lt = BindReferences.bindReference(leftTime, lOut)
    val rk = BindReferences.bindReference(rightKey, rOut)
    val rt = BindReferences.bindReference(rightTime, rOut)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Comparators specialized to the key/time types ONCE per
      // partition: the merge loop then runs monomorphic primitive
      // compares instead of a megamorphic Comparable cast per row
      // (keys/times are atomic and non-null inside the loop).
      val cmpKey = AsOfJoinExec.typedComparator(keyType)
      val cmpTime = AsOfJoinExec.typedComparator(timeType)
      // Bind against NULLABLE right attributes: unmatched left rows pair
      // with an all-null row, and a projection bound to the children's
      // original (possibly non-nullable) attrs would skip the null
      // checks and read raw zeros out of it.
      val resultProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // Right cursor: one copied row of lookahead (iterators reuse row
      // objects), plus the best-so-far candidate per current key.
      var rHead: InternalRow = null
      var rHeadKey: Any = null
      var rHeadTime: Any = null
      def advanceRight(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val row = rIter.next()
          val k = rk.eval(row)
          val t = rt.eval(row)
          if (k != null && t != null) {
            rHead = row.copy()
            rHeadKey = k
            rHeadTime = t
          }
        }
      }
      advanceRight()
      var cand: InternalRow = null
      var candKey: Any = null

      lIter.map { lRow =>
        val k = lk.eval(lRow)
        val t = lt.eval(lRow)
        if (k == null || t == null) {
          resultProj(joined(lRow, nullRight))
        } else {
          // Advance the right cursor up to (key, time): rows with a
          // smaller key are dead (both sides ascend); rows with the
          // same key and time <= t become the candidate.
          var advancing = true
          while (advancing && rHead != null) {
            val ck = cmpKey(rHeadKey, k)
            if (ck < 0) advanceRight()
            else if (ck == 0 && cmpTime(rHeadTime, t) <= 0) {
              cand = rHead
              candKey = rHeadKey
              advanceRight()
            } else advancing = false
          }
          val matched = cand != null && cmpKey(candKey, k) == 0
          resultProj(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }
}

object AsOfJoinExec {
  import org.apache.spark.sql.types._

  /** Comparator for evaluated (boxed) values of one atomic type, chosen
    * once per partition so the merge loop's call sites stay
    * monomorphic. Values are non-null (null keys/times are filtered
    * before comparison).
    */
  def typedComparator(dt: DataType): (Any, Any) => Int = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      (a, b) => java.lang.Long.compare(
        a.asInstanceOf[java.lang.Long], b.asInstanceOf[java.lang.Long])
    case IntegerType | DateType =>
      (a, b) => java.lang.Integer.compare(
        a.asInstanceOf[java.lang.Integer], b.asInstanceOf[java.lang.Integer])
    case ShortType =>
      (a, b) => java.lang.Short.compare(
        a.asInstanceOf[java.lang.Short], b.asInstanceOf[java.lang.Short])
    case ByteType =>
      (a, b) => java.lang.Byte.compare(
        a.asInstanceOf[java.lang.Byte], b.asInstanceOf[java.lang.Byte])
    case DoubleType =>
      (a, b) => java.lang.Double.compare(
        a.asInstanceOf[java.lang.Double], b.asInstanceOf[java.lang.Double])
    case FloatType =>
      (a, b) => java.lang.Float.compare(
        a.asInstanceOf[java.lang.Float], b.asInstanceOf[java.lang.Float])
    case StringType =>
      (a, b) => a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    case _ =>
      (a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }
}

/** Planner strategy mapping the logical node to its physical form. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(lk, lt, rk, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOf {

  /** Idempotent runtime registration (sessions built without
    * `spark.sql.extensions=graft.GraftExtensions` — e.g. the driver
    * harness — get the strategy through the public experimental hook).
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(GraftStrategies))
      spark.experimental.extraStrategies = cur :+ GraftStrategies
  }

  /** `asofJoin(events, orders, "k", "d", "o_custkey", "od")` — every
    * left row joined to the latest right row with the same key and
    * time ≤ the left time (right columns null when none). Column-name
    * based; both frames must already be analyzed (any DataFrame is).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$name' in ${df.queryExecution.analyzed.output.map(_.name)}"))
    val la = df2plan(left)
    val ra = df2plan(right)
    Bridge.ofRows(spark, AsOfJoin(la, ra,
      attr(left, leftKey), attr(left, leftTime),
      attr(right, rightKey), attr(right, rightTime)))
  }

  private def df2plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
