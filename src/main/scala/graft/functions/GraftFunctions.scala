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
    }),
    ("poly_hash", PolyHash.info, { exprs: Seq[Expression] =>
      require(exprs.length == 1,
        s"poly_hash expects 1 argument, got ${exprs.length}")
      PolyHash(exprs.head)
    }),
    ("poly_hash_array", PolyHashArray.info, { exprs: Seq[Expression] =>
      require(exprs.length == 1,
        s"poly_hash_array expects 1 argument, got ${exprs.length}")
      PolyHashArray(exprs.head)
    }),
    ("minhash_sigs", MinHashSigs.info, { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"minhash_sigs expects 2 arguments, got ${exprs.length}")
      MinHashSigs(exprs.head, intLit("minhash_sigs", exprs(1)))
    }),
    ("sliding_min", SlidingMin.info, { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"sliding_min expects 2 arguments, got ${exprs.length}")
      SlidingMin(exprs.head, intLit("sliding_min", exprs(1)))
    }),
    ("shingles_k", ShinglesK.info, { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"shingles_k expects 2 arguments, got ${exprs.length}")
      ShinglesK(exprs.head, intLit("shingles_k", exprs(1)))
    }),
    ("bloom_contains", BloomContains.info, { exprs: Seq[Expression] =>
      require(exprs.length == 3,
        s"bloom_contains expects 3 arguments, got ${exprs.length}")
      BloomContains(exprs.head, exprs(1), intLit("bloom_contains", exprs(2)))
    }),
    ("pq_subdists", PqSubDists.info, { exprs: Seq[Expression] =>
      require(exprs.length == 3,
        s"pq_subdists expects 3 arguments, got ${exprs.length}")
      PqSubDists(exprs.head, exprs(1), intLit("pq_subdists", exprs(2)))
    }),
    ("sorted_count_in", SortedCountIn.info, { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"sorted_count_in expects 2 arguments, got ${exprs.length}")
      SortedCountIn(exprs.head, exprs(1))
    }),
    ("shingles3", Shingles3.info, { exprs: Seq[Expression] =>
      require(exprs.length == 1,
        s"shingles3 expects 1 argument, got ${exprs.length}")
      Shingles3(exprs.head)
    }),
    ("simhash32", SimHash32.info, { exprs: Seq[Expression] =>
      require(exprs.length == 1,
        s"simhash32 expects 1 argument, got ${exprs.length}")
      SimHash32(exprs.head)
    }),
    ("rle_tf_stats", RleTfStats.info, { exprs: Seq[Expression] =>
      require(exprs.length == 1,
        s"rle_tf_stats expects 1 argument, got ${exprs.length}")
      RleTfStats(exprs.head)
    }),
    ("rle_tf_str", RleTfStr.info, { exprs: Seq[Expression] =>
      require(exprs.length == 1,
        s"rle_tf_str expects 1 argument, got ${exprs.length}")
      RleTfStr(exprs.head)
    }),
    ("l2_sq", L2Sq.info, { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"l2_sq expects 2 arguments, got ${exprs.length}")
      L2Sq(exprs.head, exprs(1))
    }),
    ("bucket_dot", BucketDot.info, { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"bucket_dot expects 2 arguments, got ${exprs.length}")
      BucketDot(exprs.head, exprs(1))
    }),
    ("chunk_tokens", ChunkTokens.info, { exprs: Seq[Expression] =>
      require(exprs.length == 3,
        s"chunk_tokens expects 3 arguments, got ${exprs.length}")
      ChunkTokens(exprs.head, intLit("chunk_tokens", exprs(1)),
        intLit("chunk_tokens", exprs(2)))
    }))

  private def intLit(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }

  /** Typed column API: `cosineSim($"embedding", $"qe")`. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** Typed column API: `hyperplaneDots($"embedding", 12)`. */
  def hyperplaneDots(a: Column, numPlanes: Int): Column =
    Bridge.column(HyperplaneDots(Bridge.expression(a), numPlanes))

  /** Typed column API: `polyHash($"shingle")`. */
  def polyHash(s: Column): Column =
    Bridge.column(PolyHash(Bridge.expression(s)))

  /** Typed column API: `polyHashArray($"shingles")`. */
  def polyHashArray(arr: Column): Column =
    Bridge.column(PolyHashArray(Bridge.expression(arr)))

  /** Typed column API: `minhashSigs($"sids", 16)`. */
  def minhashSigs(sids: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(sids), numHashes))

  /** Typed column API: `slidingMin($"sids", 4)`. */
  def slidingMin(sids: Column, w: Int): Column =
    Bridge.column(SlidingMin(Bridge.expression(sids), w))

  /** Typed column API: `simhash32($"tids")`. */
  def simhash32(tids: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(tids)))

  /** Typed column API: `rleTfStats($"sids")`. */
  def rleTfStats(sids: Column): Column =
    Bridge.column(RleTfStats(Bridge.expression(sids)))

  /** Typed column API: `rleTfStr($"toks")`. */
  def rleTfStr(toks: Column): Column =
    Bridge.column(RleTfStr(Bridge.expression(toks)))

  /** Typed column API: `shingles3($"toks")`. */
  def shingles3(toks: Column): Column =
    Bridge.column(Shingles3(Bridge.expression(toks)))

  /** Typed column API: `shinglesK($"toks", 2)`. */
  def shinglesK(toks: Column, k: Int): Column =
    Bridge.column(ShinglesK(Bridge.expression(toks), k))

  /** Typed column API: `bloomContains($"bits", $"sid", 4)`. */
  def bloomContains(bits: Column, key: Column, k: Int): Column =
    Bridge.column(BloomContains(Bridge.expression(bits), Bridge.expression(key), k))

  /** Typed column API: `sortedCountIn($"sids", lit(sortedSet))`. */
  def sortedCountIn(arr: Column, sortedSet: Column): Column =
    Bridge.column(SortedCountIn(Bridge.expression(arr), Bridge.expression(sortedSet)))

  /** Typed column API: `l2Sq($"embedding", $"ce")`. */
  def l2Sq(a: Column, b: Column): Column =
    Bridge.column(L2Sq(Bridge.expression(a), Bridge.expression(b)))

  /** Map-only argmin-by-(l2, cid) over a broadcast centroid array; a
    * NULL `gids` scans every entry, a non-NULL ARRAY<LONG> restricts
    * to entries whose `gid` is in it (q36c's top-m cells). See
    * [[L2ArgMinCid]] for why this is a kernel and not
    * `array_min(transform(...))`. */
  def l2ArgminCid(vec: Column, cents: Column, gids: Column): Column =
    Bridge.column(L2ArgMinCid(Bridge.expression(vec),
      Bridge.expression(cents), Bridge.expression(gids)))

  /** [[l2ArgminCid]] returning the winner's POSITION in the cents
    * array instead of its cid (selection and tie rules identical —
    * still by (l2, cid)); on a cid-sorted array the position indexes a
    * position-aligned lookup table directly, which is what q60/q60b's
    * in-row ADC fold needs to skip the code↔LUT join. */
  def l2ArgminIdx(vec: Column, cents: Column, gids: Column): Column =
    Bridge.column(L2ArgMinCid(Bridge.expression(vec),
      Bridge.expression(cents), Bridge.expression(gids), retIdx = true))

  /** Map-only argMAX-by-(cosine, -cid) over a broadcast centroid
    * array — the [[l2ArgminCid]] kernel in cosine mode (q68b's
    * two-level routing metric): [[CosineSim]]'s fold per entry, NaN
    * wins (Spark double ordering), ties by min cid. Same `gids`
    * restriction contract. */
  def cosArgmaxCid(vec: Column, cents: Column, gids: Column): Column =
    Bridge.column(L2ArgMinCid(Bridge.expression(vec),
      Bridge.expression(cents), Bridge.expression(gids), cosine = true))

  /** Typed column API: `bucketDot($"sids", lit(weights))`. */
  def bucketDot(ids: Column, weights: Column): Column =
    Bridge.column(BucketDot(Bridge.expression(ids), Bridge.expression(weights)))

  /** Typed column API: `chunkTokens($"toks", 32, 24)` (a generator —
    * use in `select` like `posexplode`).
    */
  def chunkTokens(toks: Column, size: Int, stride: Int): Column =
    Bridge.column(ChunkTokens(Bridge.expression(toks), size, stride))

  /** Typed column API: `pqSubDists($"embedding", $"ce", 8)`. */
  def pqSubDists(a: Column, b: Column, numSub: Int): Column =
    Bridge.column(PqSubDists(Bridge.expression(a), Bridge.expression(b), numSub))

  /** Idempotent runtime registration into the session's function
    * registry (temp-function namespace, like `spark.udf.register`).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      Bridge.registerTempFunction(spark, name, builder)
    }
}
