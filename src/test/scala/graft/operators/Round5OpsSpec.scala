package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the round-5 additions: semantic dedup (q68),
  * vocabulary/OOV (q69), shard assignment (q70), and containment dedup
  * (q71). Exact values are pinned by the DuckDB oracle; these hold for
  * any corpus.
  */
class Round5OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q68: every vector assigned to a real centroid; dups only demoted") {
    val out = PipelineQueries.queries("q68_semantic_dedup")(spark, dir).cache()
    val e = Tables(spark, dir).embeddings
    // Total coverage, one row per vector.
    assert(out.count() == e.count())
    assert(out.groupBy($"vec_id").count().filter($"count" > 1).isEmpty)
    // cid is an actual centroid id (vec_id % 125 == 0).
    assert(out.filter($"cid" % 125 =!= 0).isEmpty)
    // The globally lowest id can never be a duplicate (no lower witness).
    assert(out.orderBy($"vec_id").limit(1).filter(!$"keep").isEmpty)
    // Some vector is kept; dedup never empties a corpus.
    assert(out.filter($"keep").count() > 0)
    out.unpersist()
  }

  test("q68: a marked duplicate has a kept lower-id witness in-cluster") {
    val out = PipelineQueries.queries("q68_semantic_dedup")(spark, dir).cache()
    val e = Tables(spark, dir).embeddings.select($"vec_id", $"embedding")
    val dups = out.filter(!$"keep")
    // For every dup there EXISTS a lower-id same-cluster vector with
    // cosine >= τ (the definition, re-checked against raw embeddings).
    val witness = dups.as("d")
      .join(out.as("o"), $"o.cid" === $"d.cid" && $"o.vec_id" < $"d.vec_id")
      .join(e.as("x"), $"x.vec_id" === $"d.vec_id")
      .join(e.as("y"), $"y.vec_id" === $"o.vec_id")
      .filter(graft.functions.GraftFunctions
        .cosineSim($"x.embedding", $"y.embedding") >= 0.4)
      .select($"d.vec_id").distinct()
    assert(witness.count() == dups.count())
    out.unpersist()
  }

  test("q69: vocabulary covers the corpus head; rates bounded") {
    val out = PipelineQueries.queries("q69_vocab_oov")(spark, dir).cache()
    assert(out.filter($"oov_rate" < 0 || $"oov_rate" > 1).isEmpty)
    assert(out.filter($"n_oov" > $"n_tokens").isEmpty)
    // The synthetic corpus has a small vocabulary (< 256 distinct
    // tokens), so the vocab is total and OOV must be zero everywhere —
    // a strong end-to-end witness that the join direction is right.
    val distinctToks = Tables(spark, dir).documents
      .select(explode(expr("array_remove(split(text, ' '), '')")).as("tok"))
      .distinct().count()
    if (distinctToks <= 256) assert(out.filter($"n_oov" =!= 0).isEmpty)
    out.unpersist()
  }

  test("q69: truncated vocab yields nonzero OOV (crafted corpus)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vocab").toString
    // 300 distinct rare tokens + one dominant token: the top-256 vocab
    // must exclude >= 44 rare tokens, so docs holding them score OOV>0.
    val docs = (0 until 300).map { i =>
      (i.toLong, s"common common tok$i", "en", "src0", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = PipelineQueries.queries("q69_vocab_oov")(spark, tmp).cache()
    assert(out.count() == 300)
    // Every doc is 3 tokens; OOV docs have exactly 1 OOV instance.
    assert(out.filter($"n_tokens" =!= 3).isEmpty)
    val nOov = out.filter($"n_oov" > 0).count()
    // 301 distinct tokens, vocab keeps 256 (incl. 'common' at count
    // 600): exactly 45 rare tokens fall out.
    assert(nOov == 45)
    out.unpersist()
  }

  test("q70: sharding is total, deterministic, and balanced-ish") {
    val out = PipelineQueries.queries("q70_shard_assign")(spark, dir).cache()
    val docs = Tables(spark, dir).documents
    assert(out.count() == docs.count())
    // shard = ord mod 8, ord in [0, 2^32).
    assert(out.filter($"shard" =!= ($"ord" % 8)).isEmpty)
    assert(out.filter($"ord" < 0 || $"ord" >= 4294967296L).isEmpty)
    // Deterministic: a second run is identical.
    val again = PipelineQueries.queries("q70_shard_assign")(spark, dir)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // All 8 shards populated, and no shard hoards the corpus (the
    // scramble is uniform; at n=50 allow wide slack).
    val sizes = out.groupBy($"shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.max <= out.count() / 2)
    out.unpersist()
  }

  test("q71: containment catches an embedded quote that jaccard misses") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_contain").toString
    val small = (1 to 6).map(i => s"quote$i").mkString(" ") // 4 shingles
    val bigTail = (1 to 60).map(i => s"body$i").mkString(" ")
    val docs = Seq(
      (0L, small, "en", "src0", 0L),             // the quoted source
      (1L, s"$small $bigTail", "en", "src1", 0L), // quotes doc 0 verbatim
      (2L, bigTail, "en", "src2", 0L)             // unrelated big doc
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = PipelineQueries.queries("q71_containment")(spark, tmp).cache()
    val hit = out.filter($"doc_a" === 0 && $"doc_b" === 1).collect()
    // Doc 0 is fully contained in doc 1 (containment 1.0) but the pair's
    // jaccard is far below the 0.6 dedup threshold — the asymmetric case.
    assert(hit.length == 1)
    assert(hit(0).getAs[Double]("containment") == 1.0)
    assert(hit(0).getAs[Double]("jaccard") < 0.6)
    // The unrelated pair (0,2) shares nothing.
    assert(out.filter($"doc_a" === 0 && $"doc_b" === 2).isEmpty)
    out.unpersist()
  }

  test("q71: agrees with brute-force all-pairs containment at small sf") {
    // The df cap (<= 50) exists to bound hot-key join fan-out at scale;
    // at sf0.001 no shingle is that common, so the candidate generation
    // must be LOSSLESS here — q71 equals the all-pairs computation.
    val docs = Tables(spark, dir).documents
    val arrs = docs.repartition($"doc_id")
      .select($"doc_id", array_distinct(
        graft.functions.GraftFunctions.polyHashArray(
          graft.functions.GraftFunctions.shingles3(
            expr("array_remove(split(text, ' '), '')")))).as("sids"))
      .filter(size($"sids") > 0)
    val brute = arrs.as("a").crossJoin(arrs.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        size(array_intersect($"a.sids", $"b.sids")).cast("long").as("n_shared"),
        least(size($"a.sids"), size($"b.sids")).cast("long").as("mn"),
        (size($"a.sids") + size($"b.sids")).cast("long").as("tot"))
      .filter($"n_shared".cast("double") / $"mn" >= 0.8)
      .select($"doc_a", $"doc_b", $"n_shared",
        round($"n_shared".cast("double") / $"mn", 4).as("containment"),
        round($"n_shared".cast("double") / ($"tot" - $"n_shared"), 4)
          .as("jaccard"))
    val q71 = PipelineQueries.queries("q71_containment")(spark, dir)
    assert(q71.except(brute).isEmpty && brute.except(q71).isEmpty)
  }

  test("q71: metrics are consistent on the synthetic corpus") {
    val out = PipelineQueries.queries("q71_containment")(spark, dir).cache()
    // containment >= jaccard always (min <= union), both in (0, 1].
    assert(out.filter($"containment" < $"jaccard").isEmpty)
    assert(out.filter($"containment" > 1 || $"jaccard" > 1 ||
      $"containment" <= 0 || $"jaccard" <= 0).isEmpty)
    assert(out.filter($"doc_a" >= $"doc_b").isEmpty)
    out.unpersist()
  }
}
