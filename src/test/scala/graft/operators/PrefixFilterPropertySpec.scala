package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property proof of the prefix-filter completeness lemma q121/q123
  * stand on (Bayardo et al. WWW'07; Vernica et al. SIGMOD'10): under
  * ANY common global token order, if two sets have Jaccard ≥ t then
  * their prefixes of length n − ⌈t·n⌉ + 1 share a token — so the
  * sid-equality self-join over prefixes proposes every qualifying
  * pair. The DuckDB oracle already checks this on every corpus it
  * runs on (it computes all-pairs directly); this spec checks it on
  * thousands of RANDOM set collections, including the adversarial
  * shapes fixture corpora never produce (tiny sets, near-misses at
  * the threshold, skewed frequencies).
  *
  * The simulation mirrors the Spark side exactly: global order =
  * (document frequency asc, sid asc), prefix length ⌊n/2⌋ + 1 for
  * t = 0.5, accept decision in exact integers (2i ≥ na + nb − i),
  * AND the two PPJoin prunes the candidate join applies row-wise —
  * the length filter (max(na,nb) ≤ 2·min(na,nb)) and the positional
  * filter (a shared prefix sid at 1-based positions (pa, pb) proposes
  * the pair only if 3·(min(pa,pb) + min(na−pa, nb−pb)) ≥ na+nb).
  * Completeness here proves the prunes never drop a qualifying pair.
  * (Plain ScalaCheck sampling — the scalatest/scalacheck bridge
  * artifact isn't in the offline cache.)
  */
class PrefixFilterPropertySpec extends AnyFunSuite {

  private def sweep[A](gen: Gen[A], n: Int)(check: A => Unit): Unit = {
    var seed = Seed(20260814L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => check(a); produced += 1
        case None    => ()
      }
      seed = seed.next
      attempts += 1
    }
    assert(produced >= n / 2, s"generator too sparse: $produced samples")
  }

  private val collectionGen: Gen[List[Set[Int]]] = for {
    nSets <- Gen.choose(2, 14)
    universe <- Gen.choose(6, 40)
    sets <- Gen.listOfN(nSets, for {
      sz <- Gen.choose(1, universe)
      s <- Gen.pick(sz, 0 until universe)
    } yield s.toSet)
  } yield sets

  private def simulate(
      sets: List[Set[Int]]): (Set[(Int, Int)], Set[(Int, Int)]) = {
    val df = sets.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    // Global rarity order, exactly the Spark side's (df asc, sid asc);
    // prefix positions are 1-based indices into the FULL ordered array.
    def prefixPos(s: Set[Int]): Map[Int, Int] =
      s.toList.sortBy(x => (df(x), x)).take(s.size / 2 + 1)
        .zipWithIndex.map { case (sid, i0) => sid -> (i0 + 1) }.toMap
    val qualifying = (for {
      (a, ia) <- sets.zipWithIndex
      (b, ib) <- sets.zipWithIndex if ia < ib
      i = (a & b).size
      if i * 2 >= a.size + b.size - i // exact integer J >= 0.5
    } yield (ia, ib)).toSet
    val proposed = (for {
      (a, ia) <- sets.zipWithIndex
      (b, ib) <- sets.zipWithIndex if ia < ib
      na = a.size; nb = b.size
      if math.max(na, nb) <= 2 * math.min(na, nb) // length filter
      pa = prefixPos(a); pb = prefixPos(b)
      if pa.keySet.intersect(pb.keySet).exists { sid =>
        val (qa, qb) = (pa(sid), pb(sid)) // positional filter
        3 * (math.min(qa, qb) + math.min(na - qa, nb - qb)) >= na + nb
      }
    } yield (ia, ib)).toSet
    (qualifying, proposed)
  }

  test("every J >= 0.5 pair shares a prefix token (completeness)") {
    sweep(collectionGen, 2000) { sets =>
      val (qualifying, proposed) = simulate(sets)
      val missed = qualifying -- proposed
      assert(missed.isEmpty,
        s"prefix filter missed qualifying pairs $missed in $sets")
    }
  }

  test("the filter is not vacuous: non-pairs get pruned somewhere") {
    // On at least some generated collections the candidate set must be
    // SMALLER than all-pairs — otherwise the prefix rule would be doing
    // no work and the completeness test above would be trivially true.
    var prunedSomewhere = false
    sweep(collectionGen, 300) { sets =>
      val (_, proposed) = simulate(sets)
      val allPairs = sets.size * (sets.size - 1) / 2
      if (proposed.size < allPairs) prunedSomewhere = true
    }
    assert(prunedSomewhere, "prefix filter never pruned a single pair")
  }

  test("the positional/length prunes cut candidates beyond the prefix rule") {
    // Regression pin for the PPJoin filters specifically: deleting them
    // from the candidate join would change NO query result (they only
    // prune non-qualifying candidates before verification), so without
    // this pin the only symptom would be a silent perf cliff. On at
    // least some generated collections the filtered candidate set must
    // be strictly smaller than the prefix-share-only set (measured
    // 979→764 on the sf0.01 fixture, 917→682 on fuzz seed 1234).
    def prefixOnly(sets: List[Set[Int]]): Set[(Int, Int)] = {
      val df = sets.flatten.groupBy(identity)
        .map { case (s, o) => s -> o.size }
      def prefix(s: Set[Int]): Set[Int] =
        s.toList.sortBy(x => (df(x), x)).take(s.size / 2 + 1).toSet
      (for {
        (a, ia) <- sets.zipWithIndex
        (b, ib) <- sets.zipWithIndex if ia < ib
        if (prefix(a) & prefix(b)).nonEmpty
      } yield (ia, ib)).toSet
    }
    var cutSomewhere = false
    sweep(collectionGen, 300) { sets =>
      val (_, proposed) = simulate(sets)
      if (proposed.size < prefixOnly(sets).size) cutSomewhere = true
    }
    assert(cutSomewhere,
      "positional/length filters never pruned beyond the prefix rule")
  }
}
