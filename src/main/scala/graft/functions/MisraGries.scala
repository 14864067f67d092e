package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (token, estimated count) entry of a Misra–Gries summary. */
final case class TokenEst(token: String, est: Long)

/** Mergeable Misra–Gries heavy-hitter summary over a token stream —
  * the third partial-aggregating UDAF beside [[TopKAgg]] and the Bloom
  * bitset (SURVEY §2.2 UDAF surface), and the propose stage of q135's
  * propose→exact-verify heavy-hitter pattern (q55's Bloom shape applied
  * to frequency instead of membership).
  *
  * Per map task the classic MG update runs (Misra & Gries '82): an
  * incoming token increments its counter, opens a counter if fewer than
  * `k` are live, else decrements ALL live counters by one (dropping
  * zeros). `merge` is the Agarwal et al. (PODS'12, "Mergeable
  * Summaries") form: sum counters pointwise, and if more than `k`
  * remain, subtract the (k+1)-th largest counter value from every
  * counter and drop the non-positive ones. Both operations maintain the
  * MG invariant — for every token, 0 ≤ true_count − est ≤ N/(k+1)
  * where N is the TOTAL stream length consumed so far (across all
  * merged partials, in any merge tree order) — so after an arbitrary
  * partition/merge schedule, EVERY token with true count > N/(k+1) has
  * a live counter (its estimate cannot have reached zero). That
  * superset guarantee is what makes the sketch a sound candidate
  * proposer: q135 verifies candidates with exact counts and emits
  * tokens with count > N/k ⊂ (N/(k+1), ∞), so the final output is
  * EXACT (false positives die in the verify join, the q55 contract).
  * The guarantee — not just the happy path — is property-tested over
  * random streams, random partitionings, and random merge orders in
  * `MisraGriesSpec`.
  *
  * The buffer is a MUTABLE hash map updated in place — `Aggregator`'s
  * contract explicitly permits `reduce`/`merge` to mutate and return
  * their first argument. The previous immutable-`Map` buffer paid a
  * persistent-node allocation per token and an O(k) full-copy rebuild
  * on every decrement-all — pure overhead on the hottest ingest path
  * of a sketch whose purpose is corpus-scale token streams (VERDICT
  * r11 #3). Serialization cost is unchanged: the buffer crosses a
  * boundary only at shuffle/state-store time (kryo, ≤ k entries),
  * never per row.
  *
  * Scale shape: the buffer is ≤ `k` entries regardless of input size —
  * shuffle volume for the whole-corpus aggregate is O(map_tasks × k),
  * never vocabulary-sized; the driver receives ONE ≤ k-entry row.
  * `finish` orders by (est desc, token asc) so the output column is
  * deterministic for a given merge result.
  */
final class MisraGriesAgg(k: Int)(implicit outEnc: Encoder[Seq[TokenEst]])
  extends Aggregator[String, mutable.HashMap[String, Long], Seq[TokenEst]] {

  require(k > 0, s"misra_gries: k must be positive, got $k")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(
      m: mutable.HashMap[String, Long], w: String): mutable.HashMap[String, Long] = {
    val c = m.getOrElse(w, 0L)
    if (c > 0L) m.update(w, c + 1L)
    else if (m.size < k) m.update(w, 1L)
    else {
      // Decrement-all, in place: the incoming token's +1 and one global
      // −1 cancel, so it never materializes.
      m.mapValuesInPlace((_, v) => v - 1L)
      m.filterInPlace((_, v) => v > 0L)
    }
    m
  }

  override def merge(
      m1: mutable.HashMap[String, Long],
      m2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    m2.foreachEntry((t, c) => m1.update(t, m1.getOrElse(t, 0L) + c))
    if (m1.size > k) {
      // (k+1)-th largest counter value — subtracting it leaves at most
      // k positive counters and charges every surviving token at most
      // one more bounded undercount (the mergeable-summaries bound).
      val vals = m1.values.toArray
      java.util.Arrays.sort(vals)
      val kth = vals(vals.length - 1 - k)
      m1.mapValuesInPlace((_, v) => v - kth)
      m1.filterInPlace((_, v) => v > 0L)
    }
    m1
  }

  override def finish(m: mutable.HashMap[String, Long]): Seq[TokenEst] =
    m.toSeq.map { case (t, c) => TokenEst(t, c) }
      .sortBy(e => (-e.est, e.token))

  // Buffer rides the shuffle opaquely (kryo, ≤ k entries); the OUTPUT
  // uses the product-seq encoder so callers get a real
  // array<struct<token,est>> column they can explode.
  //
  // State-format note (ADVICE r12): r12 changed this buffer's kryo
  // class from immutable Map to mutable.HashMap, so a q139 streaming
  // state-store checkpoint persisted by a pre-r12 build would fail to
  // deserialize on restore. Harmless today — q139 runs fresh-per-run
  // against a memory sink with a throwaway checkpoint dir — but if
  // durable streaming checkpoints are ever adopted, pin the buffer to
  // an immutable snapshot at the encoder boundary (or version the
  // state) before relying on restart-over-upgrade.
  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[TokenEst]] = outEnc
}
