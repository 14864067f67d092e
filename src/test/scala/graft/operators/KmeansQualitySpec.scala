package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the Lloyd's k-means trainer (q72) and the
  * hashed-feature quality classifier (q73), plus value pins for the
  * native kernels they ride on (l2_sq, bucket_dot) against the SQL
  * higher-order-function formulations the DuckDB oracle mirrors.
  */
class KmeansQualitySpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- l2_sq

  /** The SQL fold l2_sq replaces (both sides pre-cast to double). */
  private val foldL2 =
    """aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>),
       (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""

  test("l2_sq matches the SQL fold on random float arrays") {
    val rnd = new scala.util.Random(19)
    val data = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = data.toDF("a", "b")
      .withColumn("native", graft.functions.GraftFunctions.l2Sq($"a", $"b"))
      .withColumn("fold", expr(foldL2))
    assert(df.filter($"native" =!= $"fold").count() == 0)
  }

  test("l2_sq accepts mixed float/double sides and scores the common prefix") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5d, 1.0d)))
      .toDF("a", "b")
      .select(graft.functions.GraftFunctions.l2Sq($"a", $"b").as("d"))
    // (1-0.5)^2 + (2-1)^2 = 1.25 over the common prefix of 2.
    assert(df.head().getDouble(0) == 1.25)
    val empty = Seq((Array.empty[Float], Array(1.0d)))
      .toDF("a", "b")
      .select(graft.functions.GraftFunctions.l2Sq($"a", $"b").as("d"))
    assert(empty.head().getDouble(0) == 0.0)
  }

  test("l2_sq metric properties: identity, symmetry, non-negativity") {
    val rnd = new scala.util.Random(29)
    val data = Seq.fill(100)((
      Array.fill(32)(rnd.nextFloat() * 4 - 2),
      Array.fill(32)(rnd.nextFloat() * 4 - 2)))
    val df = data.toDF("a", "b")
      .withColumn("daa", graft.functions.GraftFunctions.l2Sq($"a", $"a"))
      .withColumn("dab", graft.functions.GraftFunctions.l2Sq($"a", $"b"))
      .withColumn("dba", graft.functions.GraftFunctions.l2Sq($"b", $"a"))
    assert(df.filter($"daa" =!= 0.0).count() == 0)
    // Symmetry is exact: (x-y)^2 == (y-x)^2 in IEEE, same fold order.
    assert(df.filter($"dab" =!= $"dba").count() == 0)
    assert(df.filter($"dab" < 0.0).count() == 0)
  }

  // ------------------------------------------------------------ bucket_dot

  test("bucket_dot matches the SQL aggregate/transform formulation") {
    val rnd = new scala.util.Random(23)
    val w = Array.tabulate(64)(j =>
      ((j.toLong * 2654435761L) % 4294967296L) / 4294967296.0 - 0.5)
    val data = Seq.fill(200)(Array.fill(1 + rnd.nextInt(50))(
      rnd.nextLong().abs % 1000000007L))
    val df = data.toDF("ids")
      .withColumn("w", lit(w))
      .withColumn("native", graft.functions.GraftFunctions.bucketDot($"ids", $"w"))
      .withColumn("fold", expr(
        """aggregate(transform(ids, i -> element_at(w, CAST(i % 64 AS INT) + 1)),
           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""))
    assert(df.filter($"native" =!= $"fold").count() == 0)
  }

  test("bucket_dot floor-mods negative ids into range; empty cases") {
    val w = Array(10.0, 20.0, 30.0)
    val neg = Seq(Array(-1L, -4L)).toDF("ids")
      .select(graft.functions.GraftFunctions.bucketDot($"ids", lit(w)).as("s"))
    // floorMod(-1,3)=2 -> 30, floorMod(-4,3)=2 -> 30.
    assert(neg.head().getDouble(0) == 60.0)
    val emptyIds = Seq(Array.empty[Long]).toDF("ids")
      .select(graft.functions.GraftFunctions.bucketDot($"ids", lit(w)).as("s"))
    assert(emptyIds.head().getDouble(0) == 0.0)
    val emptyW = Seq(Array(1L)).toDF("ids")
      .select(graft.functions.GraftFunctions
        .bucketDot($"ids", lit(Array.empty[Double])).as("s"))
    assert(emptyW.head().isNullAt(0))
  }

  test("kernels survive non-nullable inputs and propagate element NULLs") {
    // Two literals → both children non-nullable: before the `nullable`
    // overrides, nullSafeCodeGen rendered ev.isNull as the literal
    // `false` and bucket_dot's generated `false = true;` failed Janino
    // compilation (falling back to interpreted eval returning null for
    // an expression declared non-nullable) — ADVICE r5.
    val lit2 = spark.range(1)
      .select(graft.functions.GraftFunctions
        .bucketDot(lit(Array(1L, 2L)), lit(Array(10.0, 20.0))).as("s"))
    // ids 1 → w[1]=20, 2 → floorMod(2,2)=0 → w[0]=10.
    assert(lit2.head().getDouble(0) == 30.0)
    val lit3 = spark.range(1)
      .select(graft.functions.GraftFunctions
        .bucketDot(lit(Array(1L)), lit(Array.empty[Double])).as("s"))
    assert(lit3.head().isNullAt(0))
    // A NULL element propagates NULL (the SQL fold's semantics: the
    // accumulator is poisoned), instead of being read as 0/garbage.
    val nid: Array[java.lang.Long] = Array(1L, null)
    val bd = Seq(Tuple1(nid)).toDF("ids")
      .select(graft.functions.GraftFunctions
        .bucketDot($"ids".cast("array<long>"), lit(Array(10.0, 20.0))).as("s"))
    assert(bd.head().isNullAt(0))
    val nd: Array[java.lang.Double] = Array(1.0, null)
    val l2 = Seq(Tuple1(nd)).toDF("a")
      .select(graft.functions.GraftFunctions
        .l2Sq($"a".cast("array<double>"), lit(Array(0.0, 0.0))).as("d"))
    assert(l2.head().isNullAt(0))
    // And the SQL fold agrees on the same poisoned input.
    val fold = Seq(Tuple1(nd)).toDF("a")
      .select(expr(
        """aggregate(zip_with(a, array(0.0d, 0.0d),
           (x, y) -> (x - y) * (x - y)),
           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""").as("d"))
    assert(fold.head().isNullAt(0))
  }

  test("bucket_dot is additive over concatenation (exact dyadic sums)") {
    val rnd = new scala.util.Random(31)
    val w = Array.tabulate(64)(j =>
      ((j.toLong * 2654435761L) % 4294967296L) / 4294967296.0 - 0.5)
    val data = Seq.fill(100)((
      Array.fill(rnd.nextInt(40))(rnd.nextLong().abs % 1000000007L),
      Array.fill(rnd.nextInt(40))(rnd.nextLong().abs % 1000000007L)))
    val df = data.toDF("x", "y")
      .withColumn("w", lit(w))
      .withColumn("cat", graft.functions.GraftFunctions.bucketDot(
        concat($"x", $"y"), $"w"))
      .withColumn("parts",
        graft.functions.GraftFunctions.bucketDot($"x", $"w") +
          graft.functions.GraftFunctions.bucketDot($"y", $"w"))
    // Every partial sum is a multiple of 2^-32 well inside double's 53
    // bits, so concatenated and split folds agree BITWISE.
    assert(df.filter($"cat" =!= $"parts").count() == 0)
  }

  // ---------------------------------------------------------- chunk_tokens

  test("chunk_tokens matches the HOF formulation it replaced") {
    val rnd = new scala.util.Random(37)
    val data = Seq.fill(300)(Array.fill(rnd.nextInt(130))(
      "tok" + rnd.nextInt(50))) ++
      // Exact boundary shapes: multiples of the stride, the contained
      // tail (n mod 24 in 1..8), one-chunk docs, single token.
      Seq(Array.fill(24)("a"), Array.fill(32)("a"), Array.fill(33)("a"),
        Array.fill(48)("a"), Array.fill(56)("a"), Array.fill(57)("a"),
        Array("solo"))
    val df = data.toDF("toks").filter(size($"toks") > 0)
    val native = df.select($"toks",
      graft.functions.GraftFunctions.chunkTokens($"toks", 32, 24)
        .as(Seq("chunk_idx", "chunk")))
    val hof = df.select($"toks", posexplode(expr(
      "transform(filter(sequence(0, (size(toks)-1) div 24), " +
        "i -> i = 0 OR (i-1)*24 + 32 < size(toks)), " +
        "i -> slice(toks, i*24 + 1, 32))"))
      .as(Seq("chunk_idx", "chunk")))
    assert(native.count() == hof.count())
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  // ----------------------------------------------------------------- q72

  test("q72: total single assignment into the 8-centroid id space") {
    val out = PipelineQueries.queries("q72_kmeans_train")(spark, dir).cache()
    val e = Tables(spark, dir).embeddings
    assert(out.count() == e.count())
    assert(out.groupBy($"vec_id").count().filter($"count" > 1).isEmpty)
    assert(out.filter($"cluster" < 0 || $"cluster" >= 8).isEmpty)
    assert(out.filter($"cluster_init" < 0 || $"cluster_init" >= 8).isEmpty)
    // Iteration 1 keeps each seed in its own cluster (distance 0).
    assert(out.filter($"vec_id" < 8).filter($"vec_id" =!= $"cluster_init").isEmpty)
    out.unpersist()
  }

  test("q72: the Lloyd step does not increase the clustering objective") {
    // Σ d(v, centroid(assigned)) after (update + reassign) must be ≤ the
    // seed-round objective — the textbook monotonicity of Lloyd's, up to
    // the 6-dp rounding of the updated centroids.
    val t = Tables(spark, dir)
    val out = PipelineQueries.queries("q72_kmeans_train")(spark, dir)
    val e = t.embeddings.select($"vec_id", $"embedding")
    val c0 = e.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".cast("array<double>").as("ce"))
    // Recompute iteration-2 centroids exactly as q72 does.
    val joined = out.join(e, "vec_id")
    val c1 = joined
      .select($"cluster_init".as("cid"), posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"cid", $"dim").agg(round(avg($"v"), 6).as("m"))
      .groupBy($"cid").agg(array_sort(collect_list(struct($"dim", $"m"))).as("pm"))
      .select($"cid", expr("transform(pm, x -> x.m)").as("ce"))
    def objective(assignCol: String, cents: org.apache.spark.sql.DataFrame) =
      joined.join(cents, col(assignCol) === cents("cid"))
        .select(graft.functions.GraftFunctions.l2Sq($"embedding", $"ce").as("d"))
        .agg(sum($"d")).head().getDouble(0)
    val before = objective("cluster_init", c0)
    val after = objective("cluster", c1)
    assert(after <= before + 1e-6 * before,
      s"Lloyd objective increased: $before -> $after")
  }

  // ----------------------------------------------------------------- q73

  test("q73: logit bounded by the weight range; keep consistent") {
    val out = PipelineQueries.queries("q73_quality_classifier")(spark, dir).cache()
    val docs = Tables(spark, dir).documents
    assert(out.count() == docs.count())
    // Mean of weights in [-0.5, 0.5) stays in [-0.5, 0.5).
    assert(out.filter($"quality_logit" < -0.5 || $"quality_logit" >= 0.5).isEmpty)
    assert(out.filter($"keep" =!= ($"quality_logit" >= 0)).isEmpty)
    // n_tokens is the whitespace token count.
    val tok = docs.select($"doc_id",
      size(expr("array_remove(split(text, ' '), '')")).cast("long").as("n"))
    assert(out.join(tok, "doc_id").filter($"n_tokens" =!= $"n").isEmpty)
    out.unpersist()
  }

  test("q74: weights normalize to 1; epochs consistent with the budget") {
    val out = PipelineQueries.queries("q74_mixture_weights")(spark, dir).cache()
    val srcs = Tables(spark, dir).documents.select($"source").distinct().count()
    assert(out.count() == srcs)
    val wsum = out.agg(sum($"weight")).head().getDouble(0)
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    // epochs = budget * weight / tokens, up to the two independent
    // 4-dp roundings (the weight error amplifies by budget/tokens ≈
    // 1e6/1.2k, so ±5e-5 on weight is ±~0.04 here).
    val bad = out.filter(
      abs($"epochs" - lit(1000000.0) * $"weight" / $"n_tokens") > 0.1)
    assert(bad.isEmpty)
    // α = 0.5 compresses the range: the weight RATIO between the
    // largest and smallest source is the sqrt of their token ratio.
    val rows = out.select($"n_tokens".cast("double"), $"weight").collect()
    val (tMax, wMax) = { val r = rows.maxBy(_.getDouble(0)); (r.getDouble(0), r.getDouble(1)) }
    val (tMin, wMin) = { val r = rows.minBy(_.getDouble(0)); (r.getDouble(0), r.getDouble(1)) }
    assert(math.abs(wMax / wMin - math.sqrt(tMax / tMin)) < 0.01)
    out.unpersist()
  }

  test("q73: score is invariant to token order (bag-of-words contract)") {
    val fwd = Seq((1L, "alpha beta gamma delta alpha")).toDF("doc_id", "text")
    val rev = Seq((1L, "alpha delta gamma beta alpha")).toDF("doc_id", "text")
    def score(df: org.apache.spark.sql.DataFrame): Double = {
      val weights = (0 until 64).map { j =>
        ((j.toLong * 2654435761L) % 4294967296L) / 4294967296.0 - 0.5
      }.toArray
      df.select((graft.functions.GraftFunctions.bucketDot(
        graft.functions.GraftFunctions.polyHashArray(
          expr("array_remove(split(text, ' '), '')")), lit(weights)) /
        size(expr("array_remove(split(text, ' '), '')"))).as("logit"))
        .head().getDouble(0)
    }
    // Dyadic weights: the sums are EXACT, so equality is bitwise.
    assert(score(fwd) == score(rev))
  }
}
