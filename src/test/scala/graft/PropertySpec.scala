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

/** The native hash kernels against an INDEPENDENT driver-side model
  * (java.lang.String / code-point arithmetic, no UTF8String, no
  * ArrayData) over random strings mixing ascii, spaces, multi-byte
  * unicode and surrogate-pair emoji. */
object HashKernelProps extends Properties("graft.hashkernels") {
  import org.apache.spark.sql.graft.HashKernels
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.HashFunctions.{MinHashCoeffs, MinHashPrime}

  // ---- model ----
  private def mHash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
  private def mShingleHashes(s: String, k: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val n = math.max(cps.length - k + 1, 1)
    (0 until n)
      .map(i => new String(cps, i, math.min(k, math.max(cps.length - i, 0))))
      .distinct.map(mHash32)
  }
  private def mTokenHashes(s: String): Seq[Long] =
    s.split(" ", -1).toSeq.map(mHash32)
  private def mSigs(hs: Seq[Long]): Seq[Long] =
    MinHashCoeffs.map { case (a, b) => hs.map(h => (h * a + b) % MinHashPrime).min }
  private def mSimHash(th: Seq[Long]): Long =
    (0 until 32).map { b =>
      val votes = th.map(h => ((h >> b) & 1L) * 2 - 1).sum
      if (votes > 0) 1L << b else 0L
    }.sum
  private def mFingerprint(th: Seq[Long]): Long =
    th.foldLeft(0L)((acc, h) => (acc + h) % 2305843009213693951L)

  private def longs(a: ArrayData): Seq[Long] = a.toLongArray().toSeq

  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.const(" "),
    1 -> Gen.oneOf("é", "ü", "日", "本", "🙂", "'", "!", "=", "語")
  )).map(_.mkString)

  property("shingleHash32.matchesModel") =
    forAll(genText, Gen.choose(1, 7)) { (s: String, k: Int) =>
      longs(HashKernels.shingleHash32(UTF8String.fromString(s), k)) ==
        mShingleHashes(s, k)
    }

  property("tokenHash32.matchesModel") = forAll(genText) { s: String =>
    longs(HashKernels.tokenHash32(UTF8String.fromString(s))) == mTokenHashes(s)
  }

  property("minhashSigs.matchesModel") = forAll(genText) { s: String =>
    val hs = HashKernels.shingleHash32(UTF8String.fromString(s), 5)
    longs(HashKernels.minHashSigs(hs)) == mSigs(mShingleHashes(s, 5))
  }

  property("simhash32.matchesModel") = forAll(genText) { s: String =>
    val th = HashKernels.tokenHash32(UTF8String.fromString(s))
    HashKernels.simHash32(th) == mSimHash(mTokenHashes(s))
  }

  property("contentFingerprint.matchesModel") = forAll(genText) { s: String =>
    HashKernels.contentFingerprint(UTF8String.fromString(s)) ==
      mFingerprint(mTokenHashes(s))
  }
}
