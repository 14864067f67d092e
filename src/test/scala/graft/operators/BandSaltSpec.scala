package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Pins [[PipelineQueries.saltedBandPairs]] — the hot-bucket triangle
  * split behind q22b's MinHash bands and q131's aHash bands — on a
  * CONSTRUCTED skew fixture no real corpus conveniently produces: one
  * degenerate bucket holding hundreds of rows (the all-dark-thumbnail
  * shape), forced onto the g > 1 salted path by a tiny cap.
  *
  * Three claims: (1) the emitted pair set is EXACTLY the brute-force
  * per-bucket pair set — salting changes distribution, never results;
  * (2) each pair is emitted exactly once per shared bucket (no
  * double-emission from the cell grid — `distinct()` downstream is for
  * cross-BAND duplicates only); (3) per-cell input stays bounded by
  * ~2·cap rows, the property that keeps any single reducer from owning
  * a hot bucket's full m² at corpus scale.
  */
class BandSaltSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark

  private val cap = 16

  // One hot bucket (band 0, sig 7) with 300 rows — g = ceil(300/16) =
  // 19 groups; two cold buckets; one doc in both a hot and a cold
  // bucket so the cross-band dedup contract stays visible.
  private def fixture = {
    val s = spark
    import s.implicits._
    val hot = (0L until 300L).map(d => (0, 7L, d))
    val cold = (0L until 10L).map(d => (1, 99L, d)) ++
      Seq((2, 5L, 500L), (2, 5L, 501L))
    (hot ++ cold).toDF("band", "sig", "doc_id")
  }

  test("salted pairs equal brute force on a degenerate hot bucket") {
    val s = spark
    import s.implicits._
    val rows = fixture.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val expected = (for {
      (ba, sa, da) <- rows
      (bb, sb, db) <- rows
      if ba == bb && sa == sb && da < db
    } yield (da, db)).toSet
    val got = PipelineQueries.saltedBandPairs(fixture, cap)
      .select($"doc_a", $"doc_b")
    val gotPairs = got.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotPairs.toSet === expected,
      s"salted pair SET diverged from brute force " +
        s"(missing ${expected -- gotPairs.toSet}, " +
        s"extra ${gotPairs.toSet -- expected})")
    // Exactly once per shared bucket (the documented contract — docs
    // 0–9 sit in TWO buckets, so their pairs emit twice and distinct()
    // downstream dedups): multiset size must equal Σ_bucket C(m, 2),
    // no more (cell-grid double-emission) and no less.
    val perBucket = rows.groupBy(r => (r._1, r._2)).values
      .map(b => b.size.toLong * (b.size - 1) / 2).sum
    assert(gotPairs.length.toLong === perBucket,
      s"pairs not emitted exactly once per shared bucket: " +
        s"${gotPairs.length} rows, expected $perBucket")
  }

  test("shuffle fallback past the broadcast ceiling emits identical pairs") {
    // ADVICE r8: the hot-key list is broadcast only while a bounded
    // probe confirms it fits under hotKeyBroadcastMax; force the
    // fallback (ceiling 0 — every hot list "too big") and pin that the
    // shuffle-join path is pair-for-pair identical, so the guard can
    // never change results, only the join strategy.
    val s = spark
    import s.implicits._
    val viaBroadcast = PipelineQueries.saltedBandPairs(fixture, cap)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaShuffle =
      PipelineQueries.saltedBandPairs(fixture, cap, hotBroadcastMax = 0L)
        .select($"doc_a", $"doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaShuffle === viaBroadcast,
      "hot-list shuffle fallback changed the emitted pair multiset")
  }

  test("per-cell input is bounded — no reducer owns the full bucket") {
    val s = spark
    import s.implicits._
    // Recompute the helper's salt assignment (same formulas: g =
    // ceil(bdf/cap), grp = pmod(xxhash64(doc_id), g)) and check the
    // largest group. Each cell (i, j) reads group i from the A side
    // and group j from the B side, so per-cell input ≤ 2·max-group.
    val g = math.ceil(300.0 / cap).toInt
    val groups = fixture.filter($"band" === 0)
      .select(pmod(xxhash64($"doc_id"), lit(g)).as("grp"))
      .groupBy($"grp").count().collect().map(_.getLong(1))
    assert(groups.length === g, "salt left empty groups unexpectedly")
    val maxGroup = groups.max
    // xxhash64 spreads uniformly: with 300 rows over 19 groups the
    // expected group is ~16; 3·cap tolerates binomial wobble while
    // still failing if salting silently degrades to few groups.
    assert(maxGroup <= 3L * cap,
      s"hot-bucket salt group grew to $maxGroup rows (cap $cap)")
  }

  test("q131/q22b keep their oracle rows through the salted path") {
    // The registered queries run the SAME code with bandSaltCap —
    // every bucket at sf0.001 is below it (g = 1), so this pins the
    // cold path's identity; the oracle gate at sf0.01 re-proves it per
    // round. A direct g > 1 end-to-end run: q131's four 16-bit bands
    // over the fixture corpus with cap = 2 must still match its own
    // plain self-join.
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = PipelineQueries.queries("q131_image_neardup")(s, dir)
    assert(out.count() >= 0) // materializes the cold path
    val t = Tables(s, dir)
    val hashes = t.documents
      .select($"doc_id", length($"text").cast("int").as("text_len"))
      .as[(Long, Int)]
      .mapPartitions(_.map { case (docId, n) =>
        Multimodal.aHash(docId, Multimodal.encodePng(docId, n))
      }).toDF()
      .select($"doc_id", $"hash_hi", $"hash_lo").cache()
    val bands = hashes.select($"doc_id", $"hash_hi", $"hash_lo",
      posexplode(expr(
        """array(hash_lo % 65536, hash_lo div 65536,
                 hash_hi % 65536, hash_hi div 65536)"""))
        .as(Seq("band", "sig")))
      .select($"band", $"sig", $"doc_id", $"hash_hi", $"hash_lo")
    def verify(pairs: org.apache.spark.sql.DataFrame) = pairs
      .filter(expr("""CAST(bit_count(pa.hash_hi ^ pb.hash_hi)
                   + bit_count(pa.hash_lo ^ pb.hash_lo) AS INT) <= 3"""))
      .select($"doc_a", $"doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val saltedLow = verify(PipelineQueries.saltedBandPairs(bands, 2))
    val plain = verify(PipelineQueries.saltedBandPairs(bands, 1 << 30))
    assert(saltedLow === plain,
      "cap = 2 salted near-dup set diverged from the plain-path set")
  }
}
