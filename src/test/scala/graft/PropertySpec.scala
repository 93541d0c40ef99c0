package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.{Multimodal, Sampling}

/** Property-based invariants for the pure operator cores (scalacheck
  * native Properties — sbt runs these alongside the ScalaTest suites). */
object SamplingProps extends Properties("graft") {

  property("evenSampling.sortedInRangeCongruent") =
    forAll(Gen.choose(1, 5000), Gen.choose(1, 20)) { (n: Int, k: Int) =>
      val kept = Sampling.evenSampleIndices(n, k)
      val sortedInRange = kept == kept.sorted &&
        kept.forall(i => i >= 0 && i < n) && kept.nonEmpty
      val semantics =
        if (n <= k) kept == (0 until n)
        else {
          val interval = n / (k + 1)
          val start = (n - (k - 1) * interval) / 2
          // exactly the congruent indices survive (reference formula)
          (0 until n).filter(i => (i - start) % interval == 0) == kept
        }
      sortedInRange && semantics
    }

  property("evenSampling.edgeModes") =
    forAll(Gen.choose(0, 1000)) { (n: Int) =>
      Sampling.evenSampleIndices(n, -1) == (0 until n) &&
        Sampling.evenSampleIndices(n, 0).isEmpty
    }

  property("minhash.affineInRange") = {
    import graft.functions.HashFunctions
    forAll(Gen.choose(0L, 4294967295L),
      Gen.choose(0, HashFunctions.MinHashCoeffs.size - 1)) { (h: Long, j: Int) =>
      val (a, b) = HashFunctions.MinHashCoeffs(j)
      val v = (h * a + b) % HashFunctions.MinHashPrime
      v >= 0 && v < HashFunctions.MinHashPrime
    }
  }

  property("decodeStub.deterministicBounded") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      val m1 = Multimodal.decodeStub(arr)
      val m2 = Multimodal.decodeStub(arr)
      m1 == m2 && m1.width >= 16 && m1.width <= 1024 &&
        m1.height >= 16 && m1.height <= 1024 && m1.channels == 3
    }

  property("wireFormat.trackletIdShape") = {
    val t = graft.model.Tracklet("v1", 4, 5, 0, Seq.empty)
    Prop(t.id == "v1_tarid4")
  }
}
