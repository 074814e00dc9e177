package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the *mechanism* claims of the scale-pattern queries (their
  * results are oracle-graded by the driver gate; these assert the part
  * the oracle can't see). */
class ScalePatternsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("bloom prefilter actually cuts probe rows before the join") {
    val hot = Tables.orders(spark, sf)
      .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"))
    val bf = hot.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    val kept = li.where(mightContain(col("l_orderkey"))).count()
    val trueMatches = li.join(hot, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept < total / 2, s"bloom kept $kept of $total — no real cut")
    assert(kept >= trueMatches, "bloom may never drop a true match")
  }

  test("salted join: equals the plain join AND really spreads a hot key") {
    import spark.implicits._
    import graft.functions.SkewJoin
    // hot fixture: one key owns 90% of the probe side
    val probe = ((1 to 900).map(i => (7L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 5, 1000L + i))).toDF("k", "payload")
    val build = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e")).toDF("bk", "name")
    val salted = SkewJoin.salted(probe, build, "k", "bk",
      salts = 8, probeSalt = xxhash64(col("k"), col("payload")))
    val plain = probe.join(build, col("k") === col("bk"))
    assert(salted.columns.toSeq == plain.columns.toSeq,
      "the salt must not leak into the output schema")
    assert(salted.select("k", "payload", "bk", "name").as[(Long, Long, Long, String)]
      .collect().sorted.toSeq ==
      plain.select("k", "payload", "bk", "name").as[(Long, Long, Long, String)]
        .collect().sorted.toSeq)
    // the mechanism: the hot key's probe rows occupy SEVERAL salt shards
    val shards = probe.where(col("k") === 7L)
      .select(pmod(xxhash64(col("k"), col("payload")), lit(8L)))
      .distinct().count()
    assert(shards >= 6, s"hot key only hit $shards of 8 salt shards")
  }

  test("sequence packing: windows tile each shard's token stream exactly") {
    import spark.implicits._
    val out = SparkEntry.queries("pipe_seq_packing")(spark, sf)
      .select("doc_id", "shard", "start_tok", "first_window", "last_window")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // within a shard, start offsets strictly increase with doc_id and
    // first_window is consistent with the 2048-token window size
    out.groupBy(_._2).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._1)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq, "offsets out of order")
      sorted.foreach { case (_, _, start, fw, lw) =>
        assert(fw == start / 2048)
        assert(lw >= fw)
      }
    }
  }

  test("clique cap: a planted mega-order is excluded from pair expansion; real data unchanged") {
    import spark.implicits._
    import graft.queries.RelationalQueries
    // mega-order 999 carries 200 DISJOINT parts (ids 1000+) so its k²
    // contribution is separable from the three normal-order pairs
    val mega = (1 to 200).map(p => (999L, 1000L + p))
    val normal = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L))
    val dir = s"/tmp/graft_cliquecap_${suiteName.hashCode}"
    (mega ++ normal).toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    def pairs(cap: Int) = RelationalQueries.cooccurPairs(spark, dir, cap)
      .as[(Long, Long, Long)].collect().toSet
    val uncapped = pairs(0)
    val capped = pairs(100)
    assert(uncapped.size == 200 * 199 / 2 + 3, s"uncapped k² expansion: ${uncapped.size}")
    assert(capped == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)),
      s"capped must be exactly the normal-order pairs: $capped")
    // adjacency shares the kernel: the mega parts vanish, degrees exact
    val adj = RelationalQueries.adjacencyRows(spark, dir, 100)
      .select("pkey", "neighbors", "degree")
      .as[(Long, String, Long)].collect().toSet
    assert(adj == Set((1L, "2|3", 2L), (2L, "1|3", 2L), (3L, "1|2", 2L)),
      s"capped adjacency: $adj")
    assert(RelationalQueries.adjacencyRows(spark, dir, 0).count() == 203)

    // the default cap (1000) is invisible on real testdata — TPC-H
    // orders carry ≤ 7 parts, so capped output == uncapped output
    val real0 = RelationalQueries.cooccurPairs(spark, sf, 0)
      .as[(Long, Long, Long)].collect().toSet
    val real1000 = RelationalQueries.cooccurPairs(spark, sf, 1000)
      .as[(Long, Long, Long)].collect().toSet
    assert(real0 == real1000, "default cap must preserve driver-SF output")
  }

  test("blocking cap: a planted hot block is excluded from ER pair generation; cold blocks survive") {
    import spark.implicits._
    import graft.queries.MiscQueries
    // hot block: 50 names sharing first token "hot"; cold block: 3
    val hot = (1 to 50).map(i => s"hot name$i")
    val cold = Seq("cold alpha", "cold alphb", "cold zeta")
    val names = (hot ++ cold).toDF("p_name")
    val capped = MiscQueries.cappedBlocks(names, cap = 10)
      .select("p_name").as[String].collect().toSet
    assert(capped == cold.toSet, s"hot block must vanish, cold survive: $capped")
    // cap 0 disables: everything survives with its block key
    assert(MiscQueries.cappedBlocks(names, cap = 0).count() == 53)
    // default cap is invisible on real testdata: same survivor set
    val real = Tables.part(spark, sf).select(col("p_name")).distinct()
    assert(MiscQueries.cappedBlocks(real, MiscQueries.blockCap).count() ==
      MiscQueries.cappedBlocks(real, 0).count(),
      "default block cap must preserve driver-SF blocking")
  }

  test("learned SemDeDup bucket count derives from corpus cardinality; pair envelope shrinks") {
    import graft.queries.SimilarityQueries
    // the pure B-selection mirror: driver-SF anchors, monotonicity,
    // both clamps (the in-plan selection is the same caps table)
    assert(SimilarityQueries.semBitsFor(1) == SimilarityQueries.SemMinBits)
    assert(SimilarityQueries.semBitsFor(500) == 5)   // sf0.01 regime
    assert(SimilarityQueries.semBitsFor(5000) == 8)  // sf0.1 → first LCG plane
    assert(SimilarityQueries.semBitsFor(40000) == 11) // soak ×8
    assert(SimilarityQueries.semBitsFor(Long.MaxValue) == SimilarityQueries.SemMaxBits)
    val ns = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L)
    assert(ns.map(SimilarityQueries.semBitsFor) == ns.map(SimilarityQueries.semBitsFor).sorted,
      "B must be monotone in N")
    // expected-occupancy envelope: 2^B · SemTargetOcc ≥ N for every
    // unclamped N — the linear pair-stage guarantee
    ns.filter(n => SimilarityQueries.semBitsFor(n) < SimilarityQueries.SemMaxBits)
      .foreach { n =>
        val b = SimilarityQueries.semBitsFor(n)
        assert((1L << b) * SimilarityQueries.SemTargetOcc >= n, s"n=$n b=$b")
      }
    // real-corpus A/B at sf0.001 (N≈500 → adaptive B=5): the adaptive
    // bucketing must occupy MORE buckets than the r9 fixed-3-bit
    // scheme and cut the within-bucket pair envelope Σ C(n_b, 2)
    val dv = graft.CacheRegistry.persistTracked(
      SimilarityQueries.learnedDocVectors(spark, sf))
    val nsq = graft.CacheRegistry.persistTracked(
      dv.groupBy("doc_id")
        .agg(sum(col("s").cast("decimal(38,0)") * col("s").cast("decimal(38,0)")).as("nsq"))
        .where(col("nsq") > 0))
    def envelope(bits: Option[Int]): (Long, Long) = {
      val occ = SimilarityQueries.learnedBuckets(dv, nsq, bits)
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("buckets"),
          sum(expr("n * (n - 1) div 2")).as("pairs")).head
      (occ.getLong(0), occ.getLong(1))
    }
    val (bFixed, pFixed) = envelope(Some(3))
    val (bAuto, pAuto) = envelope(None)
    SparkEntry.releaseCaches()
    assert(bAuto > bFixed, s"adaptive buckets $bAuto must exceed fixed $bFixed")
    assert(pAuto < pFixed, s"pair envelope must shrink: $pAuto vs $pFixed")
  }

  test("learned SemDeDup bucket cap: a planted correlated corpus bounds the pair stage; census intact") {
    import spark.implicits._
    import graft.queries.SimilarityQueries
    val cap = SimilarityQueries.semBucketCap
    assert(cap == 256L, s"test assumes the default cap, got $cap")
    // adversarial corpus: every doc IDENTICAL (all projections share
    // signs → one bucket, the exact failure mode the cap guards) —
    // cap+20 members, each pair at cosine exactly 1.0 ≥ SemDupT
    val m = (cap + 20).toInt
    val text = graft.functions.EmbeddingVectors.Vectors.take(3)
      .map(_._1).mkString(" ")
    val dir = s"/tmp/graft_sembucketcap_${suiteName.hashCode}"
    (0 until m).map(i => (i.toLong, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_learned_semantic")(spark, dir)
      .select("n_docs", "n_dup_pairs").as[(Long, Long)].collect()
    SparkEntry.releaseCaches()
    assert(out.length == 1, s"identical docs must share one bucket: ${out.toSeq}")
    // census counts EVERY member (capped bucket visible, not truncated)…
    assert(out.head._1 == m.toLong, s"census must be $m, got ${out.head._1}")
    // …while the pair stage reads only the first `cap` members by doc_id
    assert(out.head._2 == cap * (cap - 1) / 2,
      s"pairs must bound at C(cap,2)=${cap * (cap - 1) / 2}, got ${out.head._2}")
    // the default cap is invisible on an honest corpus: no sf0.001
    // bucket comes near it, so the capped prefix is every member
    val dv = graft.CacheRegistry.persistTracked(
      SimilarityQueries.learnedDocVectors(spark, sf))
    val nsq = dv.groupBy("doc_id")
      .agg(sum(col("s").cast("decimal(38,0)") * col("s").cast("decimal(38,0)")).as("nsq"))
      .where(col("nsq") > 0)
    val maxOcc = SimilarityQueries.learnedBuckets(dv, nsq)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .agg(max("n")).head.getLong(0)
    SparkEntry.releaseCaches()
    assert(maxOcc < cap, s"real-corpus max occupancy $maxOcc must sit under the cap")
  }

  test("dedup_semantic cluster cap: planted identical vectors stay O(cap²); every row still in the census") {
    import spark.implicits._
    import graft.queries.DedupQueries
    val cap = DedupQueries.semClusterCap
    assert(cap == 256L, s"test assumes the default cap, got $cap")
    // cap+20 identical embeddings: one SRP bucket, every sim ties at
    // 1.0 so the whole corpus assigns to cluster 0 (lowest centroid)
    val m = (cap + 20).toInt
    val vec = Array.tabulate(64)(i => (0.01f * (i % 7 + 1)))
    val dir = s"/tmp/graft_semclustercap_${suiteName.hashCode}"
    (0 until m).map(i => (i.toLong, vec)).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("dedup_semantic")(spark, dir)
      .select("vec_id", "cluster", "is_dup").as[(Long, Long, Long)].collect()
    SparkEntry.releaseCaches()
    assert(out.length == m, s"census must keep every vector, got ${out.length}")
    assert(out.forall(_._2 == 0L), "ties must all resolve to the lowest centroid")
    // pair stage saw only the first `cap` members: b-sides 1..cap-1
    // flag as dups, the excluded tail stays 0 — bounded, deterministic
    assert(out.count(_._3 == 1L) == (cap - 1),
      s"exactly cap-1 dups expected, got ${out.count(_._3 == 1L)}")
    assert(out.filter(_._1 >= cap).forall(_._3 == 0L),
      "members past the cap never enter the pair stage")
  }

  test("kthLargestDecimal property sweep: arbitrary tie/cluster shapes equal the sorted reference") {
    import spark.implicits._
    import graft.queries.StatsQueries
    import org.scalacheck.Gen
    // adversarial generators: heavy ties, tight clusters (many values in
    // one routing bucket), wide outliers, negatives
    val value: Gen[BigDecimal] = Gen.frequency(
      4 -> Gen.choose(-1000L, 1000L).map(v => BigDecimal(v) / 16),
      3 -> Gen.oneOf(Seq(BigDecimal(7), BigDecimal("7.0001"), BigDecimal("7.0002"))),
      2 -> Gen.choose(0L, 50L).map(BigDecimal(_)),
      1 -> Gen.oneOf(Seq(BigDecimal("-99999999.9999"), BigDecimal("99999999.9999"))))
    // pinned seed: the sweep covers the SAME adversarial inputs every
    // run (an unseeded .sample.get made coverage nondeterministic and
    // could throw on a None sample — r9 ADVICE); pureApply is total
    val lists = Gen.listOfN(12, Gen.nonEmptyListOf(value))
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(0x5ca1ab1eL))
    lists.foreach { vs0 =>
      val vs = vs0.map(_.setScale(4))
      val df = vs.map(Tuple1(_)).toDF("v")
        .select(col("v").cast("decimal(38,4)").as("v")).repartition(5).persist()
      val sorted = vs.sorted.reverse
      val ks = Seq(1, vs.size, (vs.size + 3) / 4, vs.size / 2 + 1).distinct
      ks.foreach { k =>
        val got = StatsQueries.kthLargestDecimal(df, "v", k.toLong)
        assert(BigDecimal(got) == sorted(k - 1),
          s"n=${vs.size} k=$k: got $got want ${sorted(k - 1)} in $vs")
      }
      df.unpersist()
    }
  }

  test("exactQuantileDouble reproduces percentile() bit-for-bit (duplicates, longs, skew)") {
    import spark.implicits._
    import graft.queries.StatsQueries
    import org.scalacheck.Gen
    val value: Gen[Double] = Gen.frequency(
      5 -> Gen.choose(-1e6, 1e6),
      2 -> Gen.oneOf(Seq(42.0, 42.0, 7.125)),   // planted duplicates
      2 -> Gen.choose(0L, 1000000L).map(_.toDouble), // long-ish latencies
      1 -> Gen.oneOf(Seq(1e12, -1e12)))
    // pinned seed, same reproducibility discipline as the decimal sweep
    val lists = Gen.listOfN(8, Gen.nonEmptyListOf(value))
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(0xdecaf123L))
    for (vs <- lists) {
      val qs = Seq(0.25, 0.5, 0.75, 0.9)
      val df = vs.map(Tuple1(_)).toDF("v").repartition(5).persist()
      // the multi-rank walk must agree too (one walk, all quantiles)
      val multi = StatsQueries.exactQuantilesDouble(df, "v", qs, vs.size.toLong)
      for (q <- qs) {
        val expected = df.agg(percentile(col("v"), lit(q))).head.getDouble(0)
        val got = StatsQueries.exactQuantileDouble(df, "v", q, vs.size.toLong)
        assert(got == expected,
          s"q=$q n=${vs.size}: selection $got vs percentile() $expected")
        assert(multi(q) == expected,
          s"q=$q n=${vs.size}: multi-rank ${multi(q)} vs percentile() $expected")
      }
      df.unpersist()
    }
  }

  test("kthLargestDecimal: exact selection equals the sorted reference, ties and all") {
    import spark.implicits._
    import graft.queries.StatsQueries
    // values with heavy ties and a wide range, shuffled
    val vals: Seq[BigDecimal] = (Seq.fill(40)(BigDecimal("7.5000")) ++
      (1 to 200).map(i => BigDecimal(i * 13 % 97) + BigDecimal("0.1230")) ++
      Seq(BigDecimal("1000000.0001"), BigDecimal("-5.2500")))
      .map(_.setScale(4))
    val df = vals.map(v => Tuple1(v)).toDF("v")
      .select(col("v").cast("decimal(38,4)").as("v"))
      .repartition(7).persist()
    val sorted = vals.sorted.reverse
    for (k <- Seq(1, 2, 40, 41, 100, vals.size / 4, vals.size)) {
      val got = StatsQueries.kthLargestDecimal(df, "v", k.toLong)
      assert(BigDecimal(got) == sorted(k - 1),
        s"k=$k: got $got, want ${sorted(k - 1)}")
    }
    df.unpersist()
  }
}
