package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck fuzz of the two-level coarse quantizer's size derivation
  * ([[graft.queries.SimilarityQueries.km2K]]) — the invariants the
  * graph build's linearity argument rests on, checked over the whole
  * corpus-size domain instead of the handful of SFs we run:
  *
  *  - coverage: Ks·Ksub ≥ K (the hierarchy offers at least the derived
  *    flat cell count, so mean cell size stays ≤ KmCell — the cell-equi
  *    ADC join's bound);
  *  - balance: Ks ≤ Ksub + Ks-per-tier symmetry within +1 of √K each
  *    (the per-row argmin cost is (Ks+Ksub)·dim ≈ 2√K·dim — a tier
  *    drifting toward K would silently restore the flat cost);
  *  - global cell ids scell·Ksub + sid stay within Int for any corpus
  *    this engine can address.
  */
object Km2Props extends Properties("Km2K") {

  import graft.queries.SimilarityQueries.{km2K, KmCell, KmMinK}

  private val nGen: Gen[Long] =
    Gen.oneOf(
      Gen.choose(1L, 10000L),
      Gen.choose(1L, 100000000L),
      // the 100-TB-ish regime: up to ~1e11 vectors
      Gen.choose(1L, 100000000000L))

  private def flatK(n: Long): Long =
    math.max(KmMinK.toLong, (n + KmCell - 1) / KmCell)

  property("coverage: Ks*Ksub >= derived K") = Prop.forAll(nGen) { n =>
    val (ks, kb) = km2K(n)
    ks.toLong * kb.toLong >= flatK(n)
  }

  property("tiers stay sqrt-sized: Ks and Ksub within +1 of ceil(sqrt(K))") =
    Prop.forAll(nGen) { n =>
      val (ks, kb) = km2K(n)
      val r = math.ceil(math.sqrt(flatK(n).toDouble)).toLong
      ks <= r && kb <= r + 1
    }

  property("no overcount: Ks*Ksub < K + Ks (ceil slack only)") =
    Prop.forAll(nGen) { n =>
      val (ks, kb) = km2K(n)
      ks.toLong * kb.toLong < flatK(n) + ks.toLong
    }

  property("global cell id fits Int") = Prop.forAll(nGen) { n =>
    val (ks, kb) = km2K(n)
    // max id = (Ks-1)*Ksub + (Ksub-1) = Ks*Ksub - 1
    ks.toLong * kb.toLong - 1 <= Int.MaxValue
  }
}
