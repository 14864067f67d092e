package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}

/** Native document chunker — the UDTF rung of the custom-op ladder
  * (scalar `Expression`s, partial-agg UDAFs, a resolution rule, a DSV2
  * connector, and a whole physical operator cover the others).
  *
  * `chunk_tokens(toks, size, stride)` generates one row per training
  * chunk: `(chunk_idx, chunk)` where chunk i covers tokens
  * `[i*stride, i*stride + size)`, and a tail chunk fully contained in
  * its predecessor's window is suppressed (the q64 coverage guard: the
  * last start survives only when `(i-1)*stride + size < n`). As a
  * [[CollectionGenerator]] with `inline=true`, the chunk array builds
  * in ONE compiled pass per document inside `GenerateExec`'s codegen —
  * replacing a `posexplode(transform(filter(sequence(...))))` chain
  * whose three higher-order lambdas evaluate interpreted per CHUNK
  * (the same measured trap the scalar kernels in this package avoid).
  */
case class ChunkTokens(child: Expression, size: Int, stride: Int)
  extends UnaryExpression with CollectionGenerator {

  require(size > 0 && stride > 0,
    s"chunk_tokens: size and stride must be positive, got ($size, $stride)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_tokens expects ARRAY<STRING>, got $other")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", ArrayType(StringType, containsNull = true),
      nullable = false)))

  override def collectionType: DataType =
    ArrayType(elementSchema, containsNull = false)

  override val inline: Boolean = true
  override val position: Boolean = false

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else ChunkTokens.build(v.asInstanceOf[ArrayData], size, stride)
      .asInstanceOf[GenericArrayData].array.iterator
      .map(_.asInstanceOf[InternalRow])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Produce the collection (ArrayData of struct rows); GenerateExec's
    // codegen iterates it and, with inline=true, splices the struct
    // fields into the output row.
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val empty = "new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0])"
    ev.copy(code = code"""
      |${childGen.code}
      |boolean ${ev.isNull} = ${childGen.isNull};
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
      |  ${ev.isNull}
      |  ? $empty
      |  : graft.functions.ChunkTokens.build(${childGen.value}, $size, $stride);
    """.stripMargin)
  }

  override def prettyName: String = "chunk_tokens"

  override protected def withNewChildInternal(newChild: Expression): ChunkTokens =
    copy(child = newChild)
}

object ChunkTokens {

  /** Builds the chunk-row array for one document; called from both the
    * interpreted path and the generated code.
    */
  def build(toks: ArrayData, size: Int, stride: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val lastStart = (n - 1) / stride
    val out = new scala.collection.mutable.ArrayBuffer[Any](lastStart + 1)
    var i = 0
    while (i <= lastStart) {
      // Coverage guard: drop a tail start whose predecessor's window
      // already reaches the document end.
      if (i == 0 || (i - 1) * stride + size < n) {
        val from = i * stride
        val len = math.min(size, n - from)
        val chunk = new Array[Any](len)
        var j = 0
        while (j < len) {
          chunk(j) = toks.get(from + j, StringType)
          j += 1
        }
        out += InternalRow(i, new GenericArrayData(chunk))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  val info: ExpressionInfo =
    new ExpressionInfo(classOf[ChunkTokens].getName, null, "chunk_tokens")
}
