package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** Pins the decimal-tie divergence class BY CONSTRUCTION (VERDICT r5
  * #7): the twelve fuzz seeds found ties empirically; this generator
  * manufactures doubles landing exactly on x…5 rounding ties (and
  * their ±1-ulp neighbors) and asserts
  *
  *  1. Spark's evaluation of [[CrossRound.r]] is bit-identical to the
  *     direct JVM fold `floor(x·10ⁿ + 0.5) / 10ⁿ` — the same
  *     exactly-rounded IEEE-754 op sequence DuckDB executes for
  *     [[CrossRound.sql]], so agreement here IS cross-engine agreement
  *     (each step is deterministic in IEEE arithmetic, no decimal
  *     rendering anywhere); and
  *
  *  2. the generator is genuinely adversarial: Spark's plain
  *     `round(x, n)` (BigDecimal HALF_UP over the shortest-decimal
  *     rendering) disagrees with that IEEE sequence on a healthy
  *     fraction of the constructed ties — the exact divergence class
  *     CrossRound exists to eliminate.
  */
class CrossRoundTieSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  /** Deterministic sampler (same shape as gsheets.PropertySpec — the
    * scalatest/scalacheck bridge artifact isn't in the offline cache). */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(20260813L)
    val out = Seq.newBuilder[A]
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a =>
        out += a; produced += 1
      }
      seed = seed.next
      attempts += 1
    }
    val res = out.result()
    assert(res.size >= n / 2, s"generator too sparse: ${res.size}")
    res
  }

  /** (digits, tie-double): the double nearest to the exact decimal
    * (k + 1/2)/10^digits — a value whose true decimal expansion ends in
    * 5 at position digits+1, the HALF_UP tie for round-to-digits. */
  private val tieGen: Gen[(Int, Double)] = for {
    digits <- Gen.oneOf(2, 4, 6)
    k <- Gen.choose(-100000000L, 100000000L)
    nudge <- Gen.oneOf(-1, 0, 1) // ±1-ulp neighborhood of the tie
  } yield {
    val tie = (k.toDouble + 0.5) / math.pow(10.0, digits)
    val d = nudge match {
      case -1 => Math.nextDown(tie)
      case 1  => Math.nextUp(tie)
      case _  => tie
    }
    (digits, d)
  }

  private def ieee(x: Double, digits: Int): Double = {
    val scale = math.pow(10.0, digits)
    math.floor(x * scale + 0.5) / scale
  }

  test("CrossRound.r is bit-identical to the IEEE fold on constructed ties") {
    for (digits <- Seq(2, 4, 6)) {
      val xs = samples(tieGen.suchThat(_._1 == digits), 400).map(_._2)
      val got = xs.toDF("x")
        .select(CrossRound.r($"x", digits).as("r"))
        .collect().map(_.getDouble(0))
      xs.zip(got).foreach { case (x, g) =>
        assert(java.lang.Double.doubleToLongBits(g) ==
          java.lang.Double.doubleToLongBits(ieee(x, digits)),
          s"digits=$digits x=$x: spark=$g jvm=${ieee(x, digits)}")
      }
    }
  }

  test("the generator actually hits the round() divergence class") {
    val xs = samples(tieGen, 600)
    val rows = xs.map { case (digits, x) => (digits, x) }
      .toDF("digits", "x")
    val viaRound = rows
      .withColumn("r2", when($"digits" === 2, round($"x", 2))
        .when($"digits" === 4, round($"x", 4))
        .otherwise(round($"x", 6)))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val divergent = viaRound.count { case (digits, x, r) =>
      java.lang.Double.doubleToLongBits(r) !=
        java.lang.Double.doubleToLongBits(ieee(x, digits))
    }
    // Plain round() must disagree with the IEEE sequence somewhere in
    // the set (empirically ~30–50% of exact ties diverge): if this ever
    // reads 0, the generator stopped producing real ties and test 1 is
    // vacuous.
    assert(divergent > 10,
      s"only $divergent/${viaRound.length} constructed ties diverge under " +
        "plain round() — tie generator no longer adversarial")
  }
}
