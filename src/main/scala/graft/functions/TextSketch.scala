package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the text-sketch family (MinHash, SimHash,
  * winnowing). Each replaces a SQL higher-order-function formulation
  * (`aggregate(sequence(...), ...)` folds) that had the right *plan* but
  * evaluated interpreted lambdas per row — the same lesson
  * [[HyperplaneDots]] taught for embeddings: at 100 TB the signature step
  * runs once per shingle/token, so it must be a compiled loop, not an
  * interpreted fold that also allocates a `sequence` array per value.
  *
  * Every kernel is bit-compatible with its SQL twin (and therefore with
  * the DuckDB oracle): identical fold order, identical 64-bit integer
  * arithmetic, identical null semantics. Property specs
  * (`TextSketchSpec`) pin native-vs-SQL equality on random inputs.
  *
  * Codegen calls the static helpers on [[TextSketch]] — one JIT-compiled
  * call per row keeps the surrounding project inside whole-stage codegen
  * without duplicating the loop bodies as generated Java.
  */
object TextSketch {

  final val P: Long = 1000000007L

  /** h = (131·h + codePoint) mod P, folded left-to-right — identical to
    * `aggregate(sequence(1, length(s)), 0L, (h,i) -> (h*131 +
    * ascii(substring(s,i,1))) % P)`: Spark's `length`/`substring`/`ascii`
    * operate on code points, so the fold visits each code point once.
    * ASCII fast path reads UTF-8 bytes directly (code point == byte).
    */
  def polyHash(s: UTF8String): Long = {
    val nb = s.numBytes
    var ascii = true
    var i = 0
    while (i < nb && ascii) {
      if (s.getByte(i) < 0) ascii = false else i += 1
    }
    var h = 0L
    if (ascii) {
      var j = 0
      while (j < nb) {
        h = (h * 131 + s.getByte(j)) % P
        j += 1
      }
    } else {
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        h = (h * 131 + cp) % P
        j += Character.charCount(cp)
      }
    }
    h
  }

  /** Element-wise [[polyHash]]; null elements stay null (the semantics of
    * `transform(arr, x -> poly_hash(x))`).
    */
  def polyHashArray(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.lang.Long.valueOf(polyHash(a.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** mh[h] = min over the array of ((37h+7)·sid + 101h+3) mod P — the
    * classic per-row MinHash signature. Null elements are skipped (SQL
    * `min` semantics); an all-null/empty input yields an EMPTY array
    * (callers filter `size(...) > 0` first, mirroring how the
    * explode+groupBy formulation simply has no row for such a doc).
    * No overflow: (37·63+7)·(P−1) ≈ 2.3e12 ≪ 2⁶³.
    */
  def minhashSigs(a: ArrayData, numHashes: Int): ArrayData = {
    val n = a.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        any = true
        val sid = a.getLong(i)
        var h = 0
        while (h < numHashes) {
          val v = ((37L * h + 7L) * sid + 101L * h + 3L) % P
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(mins)
  }

  /** out[i] = min(a[i..i+w-1]) for i ∈ [0, n−w] — the winnowing window.
    * n < w ⇒ empty array (the doc has no full window; the window+filter
    * formulation emits no rows for it). Null elements are skipped; a
    * window of only nulls yields a null element.
    */
  def slidingMin(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Any](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var m = Long.MaxValue
      var any = false
      var j = i
      while (j < i + w) {
        if (!a.isNullAt(j)) {
          val v = a.getLong(j)
          if (v < m) m = v
          any = true
        }
        j += 1
      }
      if (any) out(i) = java.lang.Long.valueOf(m)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[RleTfStats]]. Sorts a null-free copy of the input, then one
    * linear run-length pass; n2 accumulates tf² as it goes and is
    * patched onto every struct (functionally determined by the row, so
    * duplication is free at the consumer after projection).
    */
  def rleTfStats(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val arr = new Array[Long](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!a.isNullAt(i)) { arr(m) = a.getLong(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(arr, 0, m)
    var runs = 0
    var s = 0
    while (s < m) {
      var e = s + 1
      while (e < m && arr(e) == arr(s)) e += 1
      runs += 1
      s = e
    }
    val sids = new Array[Long](runs)
    val tfs = new Array[Long](runs)
    var n2 = 0L
    var r = 0
    s = 0
    while (s < m) {
      var e = s + 1
      while (e < m && arr(e) == arr(s)) e += 1
      val tf = (e - s).toLong
      sids(r) = arr(s)
      tfs(r) = tf
      n2 += tf * tf
      r += 1
      s = e
    }
    val out = new Array[Any](runs)
    r = 0
    while (r < runs) {
      out(r) = org.apache.spark.sql.catalyst.InternalRow(sids(r), tfs(r), n2)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** See [[RleTfStr]]. [[rleTfStats]]' shape over STRING tokens: sorts
    * a null-free copy (UTF8String binary order — only equality matters
    * to consumers, the sort just groups runs), then one linear
    * run-length pass emitting (token, tf). tf values are
    * integer-identical to a `groupBy(doc, token).count()` aggregation.
    *
    * Each retained token is CLONED into the output (ADVICE r19): the
    * input strings are views into the scan's reusable column-vector /
    * unsafe buffers, so a consumer that buffers the raw array across
    * rows (collect_list, sort — GenericArrayData copies are shallow)
    * would otherwise observe corrupted tokens. One copy per DISTINCT
    * token, not per occurrence — noise next to the O(n log n) sort.
    */
  def rleTfStr(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val arr = new Array[AnyRef](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!a.isNullAt(i)) { arr(m) = a.getUTF8String(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(arr, 0, m)
    var runs = 0
    var s = 0
    while (s < m) {
      var e = s + 1
      while (e < m && arr(e) == arr(s)) e += 1
      runs += 1
      s = e
    }
    val out = new Array[Any](runs)
    var r = 0
    s = 0
    while (s < m) {
      var e = s + 1
      while (e < m && arr(e) == arr(s)) e += 1
      out(r) = org.apache.spark.sql.catalyst.InternalRow(
        arr(s).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone(),
        (e - s).toLong)
      r += 1
      s = e
    }
    new GenericArrayData(out)
  }

  /** See [[SortedCountIn]]. `sorted` MUST be ascending; null elements of
    * `a` are skipped, nulls must not occur in `sorted`.
    */
  def sortedCountIn(a: ArrayData, sorted: ArrayData): Int = {
    val n = a.numElements()
    val m = sorted.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val k = a.getLong(i)
        var lo = 0
        var hi = m - 1
        var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          val v = sorted.getLong(mid)
          if (v == k) found = true
          else if (v < k) lo = mid + 1
          else hi = mid - 1
        }
        if (found) cnt += 1
      }
      i += 1
    }
    cnt
  }

  private val SPACE = UTF8String.fromString(" ")

  /** out[i] = concat_ws(' ', toks[i], toks[i+1], toks[i+2]) for
    * i ∈ [0, n−3]; n < 3 ⇒ empty array. Identical to the
    * `transform(sequence(0, size(toks)-3), i -> concat_ws(...))`
    * formulation — including concat_ws's skip-null semantics — but the
    * token array is ONE child expression evaluated once per row, so
    * there is no CollapseProject trap (the lambda form re-evaluated the
    * tokenizer per element when the projections merged; see the
    * posShingles history note).
    */
  def shingles3(a: ArrayData): ArrayData = shinglesK(a, 3)

  /** General k-gram form of [[shingles3]]: out[i] = concat_ws(' ',
    * toks[i..i+k-1]) for i ∈ [0, n−k]; n < k ⇒ empty array.
    */
  def shinglesK(a: ArrayData, k: Int): ArrayData = {
    val n = a.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - k + 1)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        window(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash over pre-hashed token ids, one occurrence = weight 1:
    * h(tid) = tid·2654435761 mod 2³²; bit b of the result is set iff
    * Σ_occurrences (±1 by bit b of h) > 0. Occurrence-weighting is
    * EXACTLY the `groupBy(doc,tk).count` → Σ ±w formulation (the sign
    * depends only on the token, so Σ_distinct ±count ≡ Σ_occurrences ±1)
    * — the oracle's weighted CTE matches bit-for-bit. Null elements are
    * skipped; an empty input packs to 0 (callers filter empties, as the
    * agg formulation has no row).
    */
  def simhash32(a: ArrayData): Long = {
    val sums = new Array[Long](32)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = (a.getLong(i) * 2654435761L) % 4294967296L
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) packed |= 1L << b
      b += 1
    }
    packed
  }
}

/** `poly_hash(s)` — portable polynomial string hash (see
  * [[TextSketch.polyHash]]).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash expects STRING, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val info: ExpressionInfo = new ExpressionInfo(classOf[PolyHash].getName, null, "poly_hash")
}

/** `poly_hash_array(arr)` — element-wise [[PolyHash]] in one compiled
  * loop (vs `transform(arr, x -> ...)`, whose lambda is interpreted per
  * element).
  */
case class PolyHashArray(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash_array expects ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "poly_hash_array"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.polyHashArray(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.polyHashArray($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashArray =
    copy(child = newChild)
}

object PolyHashArray {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[PolyHashArray].getName, null, "poly_hash_array")
}

/** `minhash_sigs(sids, numHashes)` — per-row MinHash signature (see
  * [[TextSketch.minhashSigs]]). Map-only: the signature that an
  * explode+groupBy(doc).agg(16 mins) formulation needs a shuffle for.
  */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 64,
    s"minhash_sigs: numHashes must be in [1, 64], got $numHashes")
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs expects ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.minhashSigs(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextSketch.minhashSigs($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[MinHashSigs].getName, null, "minhash_sigs")
}

/** `sliding_min(arr, w)` — windowed minima (see
  * [[TextSketch.slidingMin]]). Turns the winnowing fingerprint step from
  * a doc_id-partitioned window (shuffle + sort) into a per-row map.
  */
case class SlidingMin(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"sliding_min: window must be positive, got $w")
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sliding_min expects ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "sliding_min"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.slidingMin(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.slidingMin($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): SlidingMin =
    copy(child = newChild)
}

object SlidingMin {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[SlidingMin].getName, null, "sliding_min")
}

/** `sorted_count_in(arr, sortedSet)` — how many of `arr`'s non-null
  * elements occur in the ASCENDING-sorted long array `sortedSet`
  * (binary search per element, O(n log m), no per-row hash-set build —
  * `array_intersect` against a large constant set rebuilds its set
  * every evaluation). With `arr` distinct this is |arr ∩ set|: the
  * map-only exact-overlap kernel for checking rows against a pinned
  * reference set (e.g. streaming decontamination against an eval
  * suite).
  */
case class SortedCountIn(left: Expression, right: Expression)
  extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_count_in expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_count_in"
  override protected def nullSafeEval(a: Any, set: Any): Any =
    TextSketch.sortedCountIn(a.asInstanceOf[ArrayData], set.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, set) => s"graft.functions.TextSketch.sortedCountIn($a, $set)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCountIn =
    copy(left = newLeft, right = newRight)
}

object SortedCountIn {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[SortedCountIn].getName, null, "sorted_count_in")
}

/** `shingles3(toks)` — word 3-shingles in token order (see
  * [[TextSketch.shingles3]]).
  */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles3 expects ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.shingles3(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.shingles3($c)")
  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

object Shingles3 {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[Shingles3].getName, null, "shingles3")
}

/** `shingles_k(toks, k)` — word k-shingles in token order (see
  * [[TextSketch.shinglesK]]).
  */
case class ShinglesK(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"shingles_k: k must be positive, got $k")
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles_k expects ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_k"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.shinglesK(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.shinglesK($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesK =
    copy(child = newChild)
}

object ShinglesK {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[ShinglesK].getName, null, "shingles_k")
}

/** `simhash32(tids)` — packed 32-bit SimHash (see
  * [[TextSketch.simhash32]]). Map-only: replaces a per-(doc, token)
  * count agg + 32-column sign agg (two shuffles) with zero.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash32 expects ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.simhash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[SimHash32].getName, null, "simhash32")
}

/** `rle_tf_stats(sids)` — per-row term-frequency run-length encoding
  * with the squared norm riding along (see [[TextSketch.rleTfStats]]):
  * `array<struct<sid, tf, n2>>` where each distinct sid of the input
  * appears once with its multiplicity `tf`, sids ascending, and
  * `n2 = Σ tf²` (identical on every element of one row's output).
  *
  * This is q103's map-side replacement for TWO posting-volume shuffles
  * (the (doc, sid) count aggregate and the per-doc re-collection): the
  * entire per-doc sparse tf vector — values AND norm — is built in one
  * compiled pass and handed straight to `explode`. Carrying n2 inside
  * the struct (8 redundant bytes per element, gone after the explode
  * projection) is what makes the consumer HOF-free: an
  * `aggregate(st, …)` fold over the kernel output would re-open the
  * CollapseProject lambda-inlining trap the shinglesCol scaladoc
  * documents (the round-11 SQL-RLE attempt hit exactly that — the hash
  * chain re-evaluated per element and a 2.5 s query became a 25-minute
  * spin).
  *
  * tf values and n2 are integer-identical to the aggregation
  * formulation, so oracles are unchanged; null input elements are
  * skipped (the hash kernels never emit them).
  */
case class RleTfStats(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rle_tf_stats expects ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sid", LongType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("n2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "rle_tf_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.rleTfStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.rleTfStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RleTfStats =
    copy(child = newChild)
}

object RleTfStats {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[RleTfStats].getName, null, "rle_tf_stats")
}

/** `rle_tf_str(tokens)` — [[RleTfStats]] over STRING tokens (see
  * [[TextSketch.rleTfStr]]): `array<struct<token, tf>>` where each
  * distinct token of the input appears once with its multiplicity.
  *
  * The map-side replacement for a `groupBy(doc_id, token).count()`
  * posting-volume Exchange when the per-doc term frequency is all the
  * consumer needs (q49's tf side, whose df side then reuses the SAME
  * relation instead of a second `distinct()` Exchange). tf values are
  * integer-identical to the aggregation formulation, so oracles are
  * unchanged; null input elements are skipped (the tokenizers never
  * emit them).
  */
case class RleTfStr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rle_tf_str expects ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "rle_tf_str"
  override protected def nullSafeEval(input: Any): Any =
    TextSketch.rleTfStr(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.rleTfStr($c)")
  override protected def withNewChildInternal(newChild: Expression): RleTfStr =
    copy(child = newChild)
}

object RleTfStr {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[RleTfStr].getName, null, "rle_tf_str")
}
