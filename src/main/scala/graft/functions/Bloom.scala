package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Deterministic Bloom filter over BIGINT keys — the broadcastable
  * prefilter a 100 TB decontamination / semi-join pipeline wants when
  * the probe set is too large to broadcast exactly: build the filter
  * with one aggregation over the probe keys (partial buffers OR-merge),
  * broadcast the resulting bitset (m/8 bytes regardless of key count),
  * drop ~all non-members map-side, and run the EXACT equality join only
  * on the survivors — false positives are eliminated there, so results
  * stay exact while the shuffled volume drops by the corpus's
  * non-member fraction.
  *
  * Double hashing (Kirsch–Mitzenmacher): pos_i = (h1 + i·h2) mod m,
  * with h1/h2 from two splitmix64 finalizer mixes of the key (a plain
  * multiplicative hash leaves the low bits under-mixed, and m is a
  * power of two — measured 8% FP where theory says 0.5%). All integer
  * math — deterministic across engines and runs, unlike
  * `spark.util.sketch.BloomFilter`'s Murmur3 of the JVM long bytes
  * (fine in-engine; this one is also reproducible in a spec by hand).
  */
object Bloom {

  /** splitmix64 finalizer (Steele et al., public domain constants). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def h1Of(key: Long): Long = mix(key) & 0x1fffffffffffffffL
  @inline private def h2Of(key: Long): Long =
    (mix(key ^ 0xda3e39cb94b95bdbL) | 1L) & 0x1fffffffffffffffL

  /** Set the k bit positions of `key` in `bits` (length m/64 longs). */
  def add(bits: Array[Long], key: Long, k: Int): Unit = {
    val m = bits.length.toLong * 64
    val h1 = h1Of(key)
    val h2 = h2Of(key)
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      bits((pos >> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Membership probe — false positives possible, false negatives not. */
  def mightContain(bits: Array[Long], key: Long, k: Int): Boolean = {
    val m = bits.length.toLong * 64
    val h1 = h1Of(key)
    val h2 = h2Of(key)
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      if ((bits((pos >> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Byte-packed form (little-endian longs) for a BINARY column/literal. */
  def toBytes(bits: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](bits.length * 8)
    var i = 0
    while (i < bits.length) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = (bits(i) >>> (8 * j)).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) {
      var v = 0L
      var j = 0
      while (j < 8) {
        v |= (bytes(i * 8 + j) & 0xffL) << (8 * j)
        j += 1
      }
      out(i) = v
      i += 1
    }
    out
  }

  def mightContainBytes(bytes: Array[Byte], key: Long, k: Int): Boolean = {
    // Probe the byte form directly (no long-array materialization per row).
    val m = bytes.length.toLong * 8
    val h1 = h1Of(key)
    val h2 = h2Of(key)
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) % m
      if (((bytes((pos >> 3).toInt) >> (pos & 7).toInt) & 1) == 0) return false
      i += 1
    }
    true
  }
}

/** Aggregator building the bitset: `numBits` must be a multiple of 64.
  * Buffers are m/64-long arrays that OR-merge — partial aggregation
  * works map-side, the reduce side merges fixed-size buffers, and the
  * single output row is the packed filter.
  */
final class BloomAgg(numBits: Int, k: Int)
  extends Aggregator[Long, Array[Long], Array[Byte]] {
  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    Bloom.add(buf, key, k); buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Byte] = Bloom.toBytes(buf)

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `bloom_contains(bits, key)` — native membership probe against a
  * BINARY bitset (typically a literal/broadcast of [[BloomAgg]]'s
  * output), k hash probes per row inside whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  require(k > 0 && k <= 16, s"bloom_contains: k must be in [1, 16], got $k")
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (BINARY, BIGINT), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"
  override protected def nullSafeEval(bits: Any, key: Any): Any =
    Bloom.mightContainBytes(bits.asInstanceOf[Array[Byte]], key.asInstanceOf[Long], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, key) => s"graft.functions.Bloom.mightContainBytes($b, $key, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[BloomContains].getName, null, "bloom_contains")
}
