package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sketches, TemporalJoins}

/** TemporalJoins (as-of, binned range join) and Sketches (HLL) checked
  * against brute-force reference computations on randomized-but-seeded
  * crafted data — the operators' own formulations (union+window, bin
  * keys, register math) never appear on the reference side.
  */
class TemporalJoinsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // --- as-of join -----------------------------------------------------

  test("asOfJoin equals the brute-force newest-earlier match, incl. ties and no-match") {
    val rnd = new scala.util.Random(42)
    val build = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(100).toLong, i.toLong, rnd.nextInt(1000)))
      // determinism contract: unique per (key, ts)
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val probe = (1 to 200).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(110).toLong, 1000L + i))

    val b = build.toDF("k", "ts", "bid", "payload")
    val p = probe.toDF("k", "ts", "pid")
    val got = TemporalJoins.asOfJoin(p, b, "k", "ts")
      .select($"pid", $"asof_bid", $"asof_ts", $"asof_payload")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2), r.getInt(3)))))
      .toMap

    val byKey = build.groupBy(_._1)
    probe.foreach { case (k, ts, pid) =>
      val expect = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= ts) // inclusive backward match
        .sortBy(b => (b._2, b._3)).lastOption
        .map(b => (b._3, b._2, b._4))
      assert(got(pid) == expect, s"probe $pid (k=$k ts=$ts)")
    }
  }

  test("asOfJoin at equal timestamps matches inclusively (build sorts before probe)") {
    val b = Seq((1L, 10L, 7L)).toDF("k", "ts", "bid")
    val p = Seq((1L, 10L, 100L)).toDF("k", "ts", "pid")
    val row = TemporalJoins.asOfJoin(p, b, "k", "ts").select($"asof_bid").head()
    assert(row.getLong(0) == 7L)
  }

  test("asOfJoin carries build rows ATOMICALLY when payload fields are null") {
    // newest build row has a NULL payload field; a per-field carry
    // would let that field 'see through' to the older row's value
    // while asof_ts comes from the newest — whole-row ASOF must emit
    // (ts=20, tag=null), never the mixed (ts=20, tag="old")
    val b = Seq((1L, 10L, Some("old")), (1L, 20L, None))
      .toDF("k", "ts", "tag")
    val p = Seq((1L, 30L, 100L)).toDF("k", "ts", "pid")
    val row = TemporalJoins.asOfJoin(p, b, "k", "ts")
      .select($"asof_ts", $"asof_tag").head()
    assert(row.getLong(0) == 20L)
    assert(row.isNullAt(1), s"expected null tag from the newest build row, got ${row.get(1)}")
  }

  test("q20 oracle fixture DISCRIMINATES: a per-field carry yields a different frame") {
    // the round-8 gap: the struct-carry fix was spec-verified but the
    // oracle corpus had no NULL payloads, so a per-field-carry
    // implementation would still have hash-matched. With the nullable
    // click payload now in the fixture, rebuild q20's exact inputs and
    // run a DELIBERATELY per-field carry — its frame must differ from
    // the atomic operator's, proving the oracle would catch the bug
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("click_id"),
        max_by($"value", $"event_id").as("click_value0"))
      .select($"user_id", $"ts", $"click_id",
        when($"click_id" % 3 === 0, lit(null))
          .otherwise($"click_value0").as("click_value"),
        when($"click_id" % 4 === 0, lit(null))
          .otherwise(($"click_id" % 97).cast("long")).as("click_tag"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq

    val atomic = TemporalJoins.asOfJoin(purchases, clicks, "user_id", "ts")
      .select($"event_id", $"asof_click_id", $"asof_click_value", $"asof_click_tag")

    // the broken shape: same union + window, but each payload field
    // carries through its OWN last(ignoreNulls) — NULLs see through
    import org.apache.spark.sql.expressions.Window
    val b = clicks.select($"user_id", $"ts".as("__ts"), lit(0).as("__side"),
      $"click_id", $"click_value", $"click_tag",
      lit(null).cast("long").as("event_id"))
    val p = purchases.select($"user_id", $"ts".as("__ts"), lit(1).as("__side"),
      lit(null).cast("long").as("click_id"),
      lit(null).cast("double").as("click_value"),
      lit(null).cast("long").as("click_tag"),
      $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"__ts", $"__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val broken = b.unionByName(p)
      .select($"user_id", $"__side", $"event_id",
        last($"click_id", ignoreNulls = true).over(w).as("asof_click_id"),
        last($"click_value", ignoreNulls = true).over(w).as("asof_click_value"),
        last($"click_tag", ignoreNulls = true).over(w).as("asof_click_tag"))
      .filter($"__side" === 1)
      .select($"event_id", $"asof_click_id", $"asof_click_value", $"asof_click_tag")

    val a = canon(atomic)
    assert(a.nonEmpty)
    assert(canon(broken) != a,
      "fixture does not discriminate: per-field carry produced the atomic frame")
    // and the discriminating rows exist in the shipped result shape:
    // matched rows whose payload field is NULL
    assert(atomic.filter($"asof_click_id".isNotNull &&
      $"asof_click_value".isNull).count() > 0)
    assert(atomic.filter($"asof_click_id".isNotNull &&
      $"asof_click_tag".isNull).count() > 0)
  }

  // --- range join -----------------------------------------------------

  test("rangeJoinBinned equals the brute-force interval filter for hostile widths") {
    val rnd = new scala.util.Random(7)
    // negative and positive domains, intervals up to 40 wide
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextLong() % 500 // JVM %: sign follows dividend — negatives included
      (i.toLong, lo, lo + rnd.nextInt(40).toLong)
    }
    val pts = (1 to 500).map(j => (1000L + j, rnd.nextLong() % 520))
    val ivDf = ivs.toDF("iv_id", "lo", "hi")
    val ptDf = pts.toDF("pt_id", "pt")
    val expected = (for {
      (iid, lo, hi) <- ivs
      (pid, pt) <- pts
      if pt >= lo && pt < hi
    } yield (iid, pid)).toSet
    // widths smaller, comparable and larger than intervals; 1 = degenerate
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = TemporalJoins.rangeJoinBinned(ivDf, "lo", "hi", ptDf, "pt", w)
        .select($"iv_id", $"pt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"binWidth=$w")
    }
  }

  test("rangeJoinBinned boundaries: lo inclusive, hi exclusive, exactly at bin edges") {
    val iv = Seq((1L, 100L, 200L)).toDF("iv_id", "lo", "hi")
    val pt = Seq((1L, 99L), (2L, 100L), (3L, 199L), (4L, 200L)).toDF("pt_id", "pt")
    val got = TemporalJoins.rangeJoinBinned(iv, "lo", "hi", pt, "pt", 100L)
      .select($"pt_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  // --- HLL sketch -----------------------------------------------------

  test("hll rho/bucket match a JVM-reference computation of the same md5 hash") {
    val values = (1 to 2000).map(i => s"tok_$i")
    val got = {
      val (bucket, rho) = Sketches.bucketAndRho($"v")
      values.toDF("v").select($"v", bucket, rho).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    values.foreach { v =>
      val h = java.lang.Long.parseLong(
        md.digest(v.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
      val w = h >>> 8
      // rho = (leading zeros within the 24-bit suffix) + 1
      //     = (nlz64(w) - 40) + 1
      val rho = if (w == 0) 25 else java.lang.Long.numberOfLeadingZeros(w) - 39
      assert(got(v) == (h % 256, rho), s"value $v h=$h w=$w")
    }
  }

  test("histogram quantile is the exact percentile's bin, and bins merge by sum") {
    val rnd = new scala.util.Random(5)
    // skewed: lognormal-ish longs in [0, ~3000)
    val vals = (1 to 20000).map(_ => math.min(
      math.exp(rnd.nextGaussian() * 1.2 + 5).toLong, 2999L))
    val df = vals.toDF("v")
    val binW = 16L
    val bins = Sketches.histogramBins(df, "v", binW)
    val qs = Seq(2500, 5000, 9000, 9900)
    val got = Sketches.histogramQuantiles(bins, binW, qs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      // exact percentile = ceil(q*N/10000)-th order statistic
      val k = (q.toLong * vals.size + 9999) / 10000
      val exact = sorted((k - 1).toInt)
      val qv = got(q.toLong)
      assert(qv <= exact && exact < qv + binW,
        s"q=$q: answer bin [$qv, ${qv + binW}) must contain exact $exact")
    }
    // shard histograms merge by per-bin sum to the whole-corpus histogram
    val merged = (0 until 3).map(k =>
        Sketches.histogramBins(df.filter(pmod($"v", lit(3)) === k), "v", binW))
      .reduce(_ unionByName _)
      .groupBy($"bin").agg(sum($"c").as("c"))
    val whole = bins.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == whole)
  }

  test("count-min never underestimates, bounds overestimates, and merges by sum") {
    // Zipf-ish corpus: token t_i appears ~1000/i times
    val df = spark.range(100000)
      .select(concat(lit("t"), (pmod(col("id") * 2654435761L, lit(1000)) % (pmod(col("id"), lit(97)) + 1)).cast("string")).as("v"))
    val exact = df.groupBy($"v").agg(count(lit(1)).as("n"))
    val counters = Sketches.cmCounters(df, "v")
    val est = Sketches.cmEstimate(counters, exact, "v").collect()
    val total = 100000L
    est.foreach { r =>
      val (n, e) = (r.getAs[Long]("n"), r.getAs[Long]("cm_estimate"))
      assert(e >= n, s"CM underestimated ${r.getAs[String]("v")}: $e < $n")
      // classic bound: overestimate <= ~2eN/w with high probability;
      // use a loose 4x slack — a broken position hash blows far past it
      assert(e - n <= 4 * math.E * total / Sketches.CmWidth,
        s"overestimate ${e - n} breaches the CM bound")
    }
    // a probe value ABSENT from the sketched corpus: its estimate must
    // come from the true cells INCLUDING empty ones (0 unless every one
    // of its d cells collides with corpus mass) — the inner-join form
    // either dropped the row or inflated it to the colliding cells' min
    val ghost = Seq("zzz_never_hashed_1", "zzz_never_hashed_2").toDF("v")
    val ghostEst = Sketches.cmEstimate(counters, ghost, "v").collect()
    assert(ghostEst.length == 2, "absent probes must not vanish")
    ghostEst.foreach { r =>
      val e = r.getAs[Long]("cm_estimate")
      assert(e <= 4 * math.E * total / Sketches.CmWidth,
        s"absent probe estimated $e — zero cells were ignored")
    }
    // shard-merge: per-shard counter matrices sum to the whole-corpus one
    val merged = (0 until 3).map(k =>
        Sketches.cmCounters(df.filter(pmod(crc32($"v".cast("binary")), lit(3)) === k), "v"))
      .reduce(_ unionByName _)
      .groupBy($"r", $"pos").agg(sum($"c").as("c"))
    val whole = counters.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == whole)
    // round-13: the weighted form over the exact wordcount rebuilds the
    // SAME matrix (additivity — one corpus pass instead of two in the
    // heavy-hitters consumer)
    val weighted = Sketches.cmCountersWeighted(exact, "v", "n")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(weighted == whole, "weighted-from-wordcount matrix diverged")
  }

  test("hll estimate is within 20% of truth and registers merge by max across shards") {
    val n = 20000
    val df = spark.range(n).select(concat(lit("u"), $"id").as("v"))
    val regs = Sketches.hllRegisters(df, "v")
    val est = Sketches.hllSummary(regs).select($"hll_estimate").head().getDouble(0)
    assert(math.abs(est - n) / n < 0.20, s"estimate $est vs $n")

    // shard-merge property: element-wise max of per-shard registers
    // equals the whole-corpus registers (what makes sketches roll up)
    val shardRegs = (0 until 4).map(s =>
      Sketches.hllRegisters(df.filter(pmod($"id", lit(4)) === s), "v"))
    val merged = shardRegs.reduce(_ unionByName _)
      .groupBy($"bucket").agg(max($"m_j").as("m_j"))
    val whole = regs.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = merged.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == whole)
  }
}
