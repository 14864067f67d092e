package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{count, floor, sum}
import org.apache.spark.sql.types.DecimalType

/** Cross-engine deterministic rounding for DIVISION-DERIVED doubles.
  *
  * `round(x, n)` is NOT cross-engine deterministic when the value lands
  * exactly on a decimal tie (…x5): Spark rounds the shortest-decimal
  * rendering of the double (BigDecimal HALF_UP), DuckDB rounds the binary
  * double itself, and the two legitimately differ by one output ulp.
  * Sums of the fixture's 2-decimal money columns can never hit a tie
  * (their true sums keep ≤ 2 decimals), but DIVISIONS can — `avg`,
  * percentile interpolation, ratio features, cosine similarities — and
  * seeded fuzz corpora land on one roughly every ~25 query outputs.
  *
  * `floor(x * 10^n + 0.5) / 10^n` eliminates the class: multiply, add,
  * floor and divide are each a single exactly-rounded IEEE-754 op, so both
  * engines evaluate the identical double given the identical input — there
  * is no decimal rendering step for their semantics to diverge on. Every
  * division-derived rounding site uses [[r]] on the Spark side and [[sql]]
  * in its DuckDB oracle twin; exact-by-construction sites (money sums,
  * min/max of 2-dec columns, dyadic scramble fractions) keep plain
  * `round`, which is safe there and keeps the query text conventional.
  *
  * Caveats, deliberate: (1) ties round toward +inf rather than away from
  * zero — a different-but-consistent convention on negative values;
  * (2) Spark's `floor` returns LONG, so a single |x|·10^n must stay
  * below 2^63 (fixture values are ≤ ~5e5 scaled by ≤ 1e6; SUMS of those
  * units go through DECIMAL(38,0) in [[avgMoney]]/[[sumMoney]], so no
  * row-count bound); (3) NaN becomes 0 on the Spark side where `round`
  * would keep NaN — no site feeds NaN (norms and denominators are
  * nonzero by construction).
  */
object CrossRound {
  /** Spark-side tie-safe round to `digits` decimal places. */
  def r(c: Column, digits: Int): Column = {
    val scale = math.pow(10.0, digits) // exact double for digits <= 15
    floor(c * scale + 0.5) / scale
  }

  /** DuckDB oracle twin of [[r]] — identical IEEE op sequence. */
  def sql(inner: String, digits: Int): String = {
    val scale = math.pow(10.0, digits).toLong
    s"floor(($inner) * $scale + 0.5) / $scale"
  }

  /** Exact average of a fixed-point money column (≤ 2 decimals), rounded
    * to `outDigits`. [[r]] alone is not enough for `avg(money)`: the
    * pre-round SUM of doubles is summation-ORDER-sensitive in its last
    * ulp, engines sum in different orders, and money averages land on
    * exact decimal ties (x…5) often — the 1-ulp sum difference then
    * decides the rounded digit. Fix the sum itself: per value,
    * `floor(x*100 + 0.5)` recovers the exact integer cents (the double
    * is within ~2 ulp of the true 2-dec decimal, far inside the ±0.5
    * recovery window), the DECIMAL(38,0) sum of those is exact in ANY
    * order at ANY row count (no int64 wrap — DuckDB's BIGINT sum widens
    * to HUGEINT the same way), and a single division by (count·100) is
    * one exactly-rounded IEEE op after both engines convert the same
    * exact integer to double. Bit-identical cross-engine, independent
    * of partitioning.
    */
  def avgMoney(c: Column, outDigits: Int): Column =
    r(sum(floor(c * 100.0 + 0.5).cast(DecimalType(38, 0))) / (count(c) * 100.0),
      outDigits)

  /** DuckDB twin of [[avgMoney]]. */
  def avgMoneySql(inner: String, outDigits: Int): String =
    sql(s"sum(CAST(floor(($inner) * 100 + 0.5) AS BIGINT)) / (count($inner) * 100.0)",
      outDigits)

  /** Exact sum of a money EXPRESSION whose true value has `inDigits`
    * decimals (e.g. price·(1−discount) has 4), rounded to `outDigits`.
    * Same order-independence argument as [[avgMoney]]: recover exact
    * integer units per row (product doubles stay within ~3 ulp of the
    * true decimal — far inside ±0.5 at the fixture's magnitudes), sum
    * as DECIMAL(38,0) (exact, any order, any row count), divide once. */
  def sumMoney(c: Column, inDigits: Int, outDigits: Int): Column = {
    val s = math.pow(10.0, inDigits)
    r(sum(floor(c * s + 0.5).cast(DecimalType(38, 0))) / s, outDigits)
  }

  /** DuckDB twin of [[sumMoney]]. */
  def sumMoneySql(inner: String, inDigits: Int, outDigits: Int): String = {
    val s = math.pow(10.0, inDigits).toLong
    sql(s"sum(CAST(floor(($inner) * $s + 0.5) AS BIGINT)) / $s", outDigits)
  }
}
