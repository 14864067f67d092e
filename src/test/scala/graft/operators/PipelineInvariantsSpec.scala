package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Structural invariants of the round-3 pipeline operators, checked
  * independently of the DuckDB oracle (which pins exact values): these
  * hold for ANY corpus, so they'd catch a semantics regression even if
  * both engines drifted together.
  */
class PipelineInvariantsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q67: near-duplicate pairs never straddle the train/val split") {
    val split = PipelineQueries.queries("q67_leakage_split")(spark, dir).cache()
    val pairs = PipelineQueries.queries("q22b_minhash_nodict")(spark, dir)
      .select($"doc_a", $"doc_b")

    // THE leakage invariant: both ends of every verified near-dup pair
    // share a group and therefore a split side.
    val straddling = pairs
      .join(split.select($"doc_id".as("doc_a"), $"group_id".as("ga"),
        $"split".as("sa")), "doc_a")
      .join(split.select($"doc_id".as("doc_b"), $"group_id".as("gb"),
        $"split".as("sb")), "doc_b")
      .filter($"ga" =!= $"gb" || $"sa" =!= $"sb")
    assert(straddling.isEmpty)

    // Total coverage: every document is assigned exactly one side, and
    // both sides are populated at the 90/10 scramble.
    assert(split.count() ==
      Tables(spark, dir).documents.count())
    val sides = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.keySet == Set("train", "val") && sides.forall(_._2 > 0))
    split.unpersist()
  }

  test("q66: boilerplate coverage is a sane fraction and df-consistent") {
    val out = PipelineQueries.queries("q66_boilerplate")(spark, dir).cache()
    // Fractions in [0,1]; n_boiler never exceeds n_shingles; keep
    // matches the 0.5 rule.
    assert(out.filter($"boiler_frac" < 0 || $"boiler_frac" > 1).isEmpty)
    assert(out.filter($"n_boiler" > $"n_shingles").isEmpty)
    assert(out.filter($"keep" =!= ($"boiler_frac" <= 0.5)).isEmpty)
    out.unpersist()
  }

  test("q46: components are consistent with the verified pair graph") {
    val groups = PipelineQueries.queries("q46_dedup_groups")(spark, dir).cache()
    val pairs = PipelineQueries.queries("q22b_minhash_nodict")(spark, dir)
      .select($"doc_a", $"doc_b")

    // Every verified pair lands in one group.
    val crossGroup = pairs
      .join(groups.select($"doc_id".as("doc_a"), $"group_id".as("ga")), "doc_a")
      .join(groups.select($"doc_id".as("doc_b"), $"group_id".as("gb")), "doc_b")
      .filter($"ga" =!= $"gb")
    assert(crossGroup.isEmpty)

    // group_id is the minimum member; exactly one canonical per group.
    val bad = groups.groupBy($"group_id")
      .agg(min($"doc_id").as("mn"),
           sum(when($"is_canonical", 1).otherwise(0)).as("n_canon"))
      .filter($"group_id" =!= $"mn" || $"n_canon" =!= 1)
    assert(bad.isEmpty)

    // Canonical flag is exactly doc_id == group_id.
    assert(groups.filter($"is_canonical" =!= ($"doc_id" === $"group_id")).isEmpty)
    groups.unpersist()
  }

  test("q48: bins are dense, contiguous, and cover each source exactly") {
    val packed = PipelineQueries.queries("q48_pack_sequences")(spark, dir).cache()
    val docs = Tables(spark, dir).documents

    // Doc coverage: bin doc counts sum to the per-source doc count.
    val cover = packed.groupBy($"source").agg(sum($"n_docs").as("n"))
      .join(docs.groupBy($"source").agg(count(lit(1)).as("total")), "source")
      .filter($"n" =!= $"total")
    assert(cover.isEmpty)

    // Bins are dense from 0 and doc-id ranges never overlap or reorder.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"seq_id")
    val bad = packed
      .withColumn("rk", row_number().over(w))
      .withColumn("prev_last", lag($"last_doc", 1).over(w))
      .filter($"seq_id" =!= $"rk" - 1 ||
        ($"prev_last".isNotNull && $"first_doc" <= $"prev_last") ||
        $"first_doc" > $"last_doc")
    assert(bad.isEmpty)
    packed.unpersist()
  }

  test("q53: positions are dense and schedule keys non-decreasing") {
    val sched = PipelineQueries.queries("q53_interleave")(spark, dir).cache()
    val n = sched.count()
    assert(n > 0)
    assert(sched.agg(min($"position"), max($"position")).as[(Long, Long)]
      .head() == ((1L, n)))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"position")
    assert(sched
      .withColumn("prev", lag($"sched_key", 1).over(w))
      .filter($"prev".isNotNull && $"sched_key" < $"prev")
      .isEmpty)
    sched.unpersist()
  }

  test("q51/q52: ratios bounded and consistent with their counts") {
    val dec = PipelineQueries.queries("q51_decontaminate")(spark, dir)
    assert(dec.filter($"n_overlap" > $"n_shingles" ||
      $"overlap_ratio" < 0 || $"overlap_ratio" > 1).isEmpty)
    // Contamination flag matches its own ratio definition.
    assert(dec.filter($"contaminated" =!=
      ($"n_overlap" / $"n_shingles" >= 0.5)).isEmpty)

    val rep = PipelineQueries.queries("q52_repetition")(spark, dir)
    assert(rep.filter($"n_distinct" > $"n_shingles" ||
      $"dup_ratio" < 0 || $"dup_ratio" > 1).isEmpty)
  }

  test("q55 bloom path reproduces q51's exact decontamination rows") {
    val exact = PipelineQueries.queries("q51_decontaminate")(spark, dir)
    val bloom = PipelineQueries.queries("q55_bloom_decontaminate")(spark, dir)
    assert(exact.except(bloom).isEmpty && bloom.except(exact).isEmpty)
  }

  test("q58: funnel is monotone and chained") {
    val f = PipelineQueries.queries("q58_filter_funnel")(spark, dir)
      .orderBy($"stage_idx").as[(Long, String, Long, Long)].collect()
    assert(f.length == 5)
    assert(f.forall { case (_, _, in, kept) => kept <= in && kept >= 0 })
    // stage i's input is exactly stage i-1's survivors
    assert(f.sliding(2).forall { case Array(a, b) => b._3 == a._4 })
    // something survives end-to-end at this sf
    assert(f.last._4 > 0)
  }

  test("q54: every cross-corpus pair crosses the source split") {
    val srcs = Tables(spark, dir).documents
      .select($"doc_id", $"source")
    val aSet = Seq("src0", "src1", "src2", "src3", "src4")
    val pairs = PipelineQueries.queries("q54_crosscorpus_neardup")(spark, dir)
    assert(pairs.count() > 0)
    val bad = pairs
      .join(srcs.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("source", "src_a"), "doc_a")
      .join(srcs.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("source", "src_b"), "doc_b")
      .filter(!$"src_a".isin(aSet: _*) || $"src_b".isin(aSet: _*))
    assert(bad.isEmpty)
  }
}
