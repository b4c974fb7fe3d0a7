package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "zh"))
      .toDF("doc_id", "lang")
  }

  test("hashSample is deterministic and partitioning-invariant") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on input partitioning")
    // rate lands near the target (binomial, n=2000)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    // df.sample does NOT have this property — membership there follows
    // partition iteration order, which is the failure mode this fixes
  }

  test("samples nest: smaller fraction is a subset of larger") {
    val small = Sampling.hashSample(docs, col("doc_id"), 0.05)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(docs, col("doc_id"), 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("stratified rates apply per stratum; default covers unlisted strata") {
    val out = Sampling.stratifiedHashSample(
        docs, "lang", Map("en" -> 0.6, "de" -> 0.1), defaultRate = 0.0, key = col("doc_id"))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~667 docs per stratum
    assert(math.abs(out("en") / 667.0 - 0.6) < 0.12)
    assert(math.abs(out("de") / 667.0 - 0.1) < 0.08)
    assert(!out.contains("zh"), "defaultRate=0 must drop unlisted strata entirely")
  }

  test("trainTestSplit partitions every row exactly once, keyed") {
    val out = Sampling.trainTestSplit(docs, col("doc_id"), testFraction = 0.2)
    assert(out.count() == 2000)
    val test = out.where(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    // same key + same seed ⇒ same side, independently of the frame it's in
    val again = Sampling.trainTestSplit(docs.repartition(7), col("doc_id"), testFraction = 0.2)
      .where(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(test == again)
    assert(math.abs(test.size / 2000.0 - 0.2) < 0.04)
  }

  test("md5 family selection matches the portable DuckDB-replicable rule") {
    // the oracle's rendering of the bucket rule, computed via Spark SQL's
    // md5/conv — pinned here so q45's Spark and oracle sides cannot drift
    val viaOracleRule = docs
      .where(expr("cast(conv(substring(md5(concat('42:', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 1000000 < 300000"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaOp = Sampling.hashSample(docs, col("doc_id"), 0.3, seed = 42, hash = Md5Hash)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaOp == viaOracleRule)
  }

  test("sampling plan is a pure filter — no shuffle, no aggregation") {
    val plan = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample must be map-side only:\n$plan")
  }

  test("toTargetMix: binding stratum kept whole, proportions near target, absent strata dropped") {
    // docs: en 667, de 667, zh 666 (i%3). Target 60/40 en/de → c/w: 1111 vs
    // 1667 → en binds (rate 1.0), de rate = 0.4·1111.67/667 ≈ 0.667
    val out = Sampling.toTargetMix(docs, "lang",
      weights = Map("en" -> 0.6, "de" -> 0.4), key = col("doc_id"))
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("zh"), "unlisted strata must be excluded")
    assert(counts("en") == 667L, "the binding stratum samples at rate 1.0")
    // de is Binomial(667, ~0.667) — expect ≈445, allow generous slack
    assert(counts("de") > 350 && counts("de") < 550, s"de count implausible: $counts")
    // deterministic
    val again = Sampling.toTargetMix(docs.repartition(11), "lang",
      weights = Map("en" -> 0.6, "de" -> 0.4), key = col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("temperatureMix flattens the domain distribution; alpha=1 is proportional") {
    import spark.implicits._
    // skewed corpus: en 1600, de 300, zh 100
    val skewed = (0L until 2000L).map { i =>
      (i, if (i < 1600) "en" else if (i < 1900) "de" else "zh")
    }.toDF("doc_id", "lang")
    val out = Sampling.temperatureMix(skewed, "lang", alpha = 0.5, targetFraction = 0.5,
      key = col("doc_id"))
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rates: en ≈ 0.371, de ≈ 0.858, zh capped at 1.0 → zh kept whole
    assert(counts("zh") === 100L, "smallest domain caps at rate 1.0 and is kept whole")
    assert(counts("en") < 1600L * 0.45 && counts("en") > 1600L * 0.30, s"en: $counts")
    assert(counts("de") > 300L * 0.75, s"de must be upweighted vs natural share: $counts")
    // flattened: en's kept FRACTION must be below de's
    assert(counts("en").toDouble / 1600 < counts("de").toDouble / 300)
    // alpha = 1 → proportional: identical row set to a plain hashSample
    val prop = Sampling.temperatureMix(skewed, "lang", alpha = 1.0, targetFraction = 0.5,
      key = col("doc_id")).select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = Sampling.hashSample(skewed, col("doc_id"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(prop === plain)
    // deterministic under repartitioning
    val again = Sampling.temperatureMix(skewed.repartition(13), "lang", alpha = 0.5,
      targetFraction = 0.5, key = col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(skewed, "lang", alpha = 0.0, targetFraction = 0.5, key = col("doc_id")))
  }

  test("deterministicShuffle is a reproducible, seed-sensitive permutation") {
    val once  = Sampling.deterministicShuffle(docs, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val again = Sampling.deterministicShuffle(docs.repartition(9), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(once === again, "same seed + key → same order, any partitioning")
    assert(once.sorted === (0L until 2000L), "a permutation: every row exactly once")
    assert(once !== (0L until 2000L).toSeq, "and actually shuffled")
    val other = Sampling.deterministicShuffle(docs, col("doc_id"), seed = 7)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(other !== once, "different seed → different permutation")
    // full-width permutation key: above ~1M rows the 1/Granularity-quantized
    // bucket would collide constantly and leave key-ordered runs; the raw
    // seeded hash must be used (its range vastly exceeds the bucket range)
    val maxKey = Sampling.deterministicShuffle(docs, col("doc_id"))
      .agg(max(abs(col("shuffle_id")))).head.getLong(0)
    assert(maxKey > Sampling.Granularity,
      "shuffle_id is the full-width seeded hash, not the quantized bucket")
  }

  test("topKPerKey keeps exactly min(k, |stratum|) rows, deterministically") {
    val out = Sampling.topKPerKey(docs, Seq("lang"), k = 25, rowKey = col("doc_id"))
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 25L, "de" -> 25L, "zh" -> 25L), s"got $counts")
    // partitioning-invariant
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.topKPerKey(docs.repartition(17), Seq("lang"), 25, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // nested in k: top-10 is a prefix of top-25
    val small = Sampling.topKPerKey(docs, Seq("lang"), 10, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a))
    // a stratum smaller than k survives whole
    import spark.implicits._
    val tiny = docs.union(Seq((9999L, "fr")).toDF("doc_id", "lang"))
    val fr = Sampling.topKPerKey(tiny, Seq("lang"), 25, col("doc_id"))
      .where(col("lang") === "fr").count()
    assert(fr == 1L)
  }

  test("cluster-keyed trainTestSplit: no near-dup cluster straddles the split") {
    import spark.implicits._
    // 60 docs in 20 clusters of 3 — keyed on cluster_id, every cluster
    // must land wholly on one side
    val labeled = (0L until 60L).map(i => (i, i / 3L)).toDF("doc_id", "cluster_id")
    val out = Sampling.trainTestSplit(labeled, key = col("cluster_id"), testFraction = 0.4)
    val sidesPerCluster = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"))
      .collect().map(_.getLong(1))
    assert(sidesPerCluster.forall(_ == 1L), "a cluster straddled the split")
    val bySide = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide.keySet == Set("train", "test") && bySide.values.forall(_ > 0), s"got $bySide")
    // doc-keyed split on the same data DOES straddle clusters — the
    // pitfall the cluster key exists to prevent
    val naive = Sampling.trainTestSplit(labeled, key = col("doc_id"), testFraction = 0.4)
      .groupBy("cluster_id").agg(countDistinct(col("split")).as("n"))
      .collect().map(_.getLong(1))
    assert(naive.exists(_ == 2L), "fixture too small to show the doc-keyed pitfall")
  }

  test("weightedTopK ≡ the A-ES formula computed locally; repartition-stable") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, "s", (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "stratum", "w")
    def local(k: Int): Set[Long] = {
      val scored = rows.map { case (id, _, w) =>
        // replicate bucket(md5) + the rounded ln(u)/w rank key exactly
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"42:$id".getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(15)
        val b = java.lang.Long.parseLong(hex, 16) % 1000000L
        val u = (b + 1).toDouble / 1000000.0
        val s = BigDecimal(math.log(u) / w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, s)
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }
    for (k <- Seq(5, 20)) {
      val got = Sampling.weightedTopK(df, Seq("stratum"), k,
          weight = col("w"), rowKey = col("id"), hash = Md5Hash)
        .collect().map(_.getLong(0)).toSet
      assert(got == local(k), s"k=$k")
      val gotRep = Sampling.weightedTopK(df.repartition(13), Seq("stratum"), k,
          weight = col("w"), rowKey = col("id"), hash = Md5Hash)
        .collect().map(_.getLong(0)).toSet
      assert(gotRep == local(k), s"k=$k repartitioned")
    }
    // nested in k: top-5 is a prefix of top-20
    assert(local(5).subsetOf(local(20)))
  }

  test("mixing operators fail loudly when the stratum column is high-cardinality") {
    import spark.implicits._
    // 50 distinct "strata" (a mistaken id column) against a cap of 10:
    // the guard must fire instead of collecting the key space
    val docs = (1L to 50L).map(i => (i, s"k$i")).toDF("doc_id", "lang")
    val e1 = intercept[IllegalArgumentException](
      Sampling.temperatureMix(docs, "lang", alpha = 0.5, targetFraction = 0.5,
        key = col("doc_id"), maxStrata = 10))
    assert(e1.getMessage.contains("distinct strata"))
    val e2 = intercept[IllegalArgumentException](
      Sampling.toTargetMix(docs, "lang", Map("k1" -> 1.0),
        key = col("doc_id"), maxStrata = 10))
    assert(e2.getMessage.contains("distinct strata"))
    // at-the-cap cardinality still works
    val ok = Sampling.temperatureMix(docs, "lang", alpha = 1.0, targetFraction = 1.0,
      key = col("doc_id"), maxStrata = 50)
    assert(ok.count() == 50L)
  }

  test("rankTrim keeps the inner rank band per stratum; ties kept or dropped atomically") {
    import spark.implicits._
    // stratum A: values 1..21 → percent_rank = (i-1)/20; [0.05, 0.95]
    // keeps ranks 2..20 (values 2..20). stratum B: all-equal values share
    // percent_rank 0 — below loP, so the whole tie group drops together
    // (ties are atomic: never a partial keep of one distinct value)
    val docs = ((1 to 21).map(i => ("A", i.toLong)) ++ (1 to 5).map(_ => ("B", 7L)))
      .zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v) }
      .toDF("id", "stratum", "v")
    val kept = Sampling.rankTrim(docs, col("v"), Seq("stratum"), 0.05, 0.95)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(kept.filter(_._1 == "A").map(_._2).sorted.toSeq == (2L to 20L))
    assert(kept.count(_._1 == "B") == 0)
    // with loP = 0 the tie group survives intact
    val keptLo = Sampling.rankTrim(docs, col("v"), Seq("stratum"), 0.0, 0.95)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(keptLo.count(_._1 == "B") == 5)
  }

  test("toTargetMixByTokens: binding stratum by token mass, not doc count") {
    import spark.implicits._
    // en: 100 docs × 10 tokens = 1000 tokens; de: 400 docs × 1 token = 400.
    // Doc-count mixing at 50/50 would bind on en (100 docs); token mixing
    // binds on de (400/0.5=800 < 1000/0.5=2000) → de kept whole, en
    // sampled at 0.5·800/1000 = 0.4 of its token mass
    val docs = ((0L until 100L).map(i => (i, "en", "t " * 10)) ++
      (100L until 500L).map(i => (i, "de", "t"))).toDF("doc_id", "lang", "text")
    val toks = graft.ops.TextAnalysis.tokenCount(col("text"))
    val out = Sampling.toTargetMixByTokens(docs, "lang",
      weights = Map("en" -> 0.5, "de" -> 0.5), tokens = toks, key = col("doc_id"))
    val kept = out.groupBy("lang").agg(count(lit(1)).as("n"), sum(toks).as("tok"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(kept("de") == ((400L, 400L)), "binding stratum (by tokens) kept whole")
    // en keeps ≈40% of docs (uniform 10 tokens/doc → token rate = doc rate)
    assert(math.abs(kept("en")._1 / 100.0 - 0.4) < 0.12, s"got $kept")
    // deterministic under repartitioning
    val again = Sampling.toTargetMixByTokens(docs.repartition(11), "lang",
        weights = Map("en" -> 0.5, "de" -> 0.5), tokens = toks, key = col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("withEpochs: whole, fractional, sub-1.0 and default factors; epochs contiguous") {
    // en 667 docs @2.5 → every doc epochs 1..2, ~half a 3rd copy;
    // de 667 @0.5 → ~half survive at epoch 1; zh 666 on default 1.0 → kept whole
    val out = Sampling.withEpochs(docs, "lang", Map("en" -> 2.5, "de" -> 0.5),
      defaultRepeat = 1.0, key = col("doc_id"))
    // per-doc epochs are exactly 1..n (contiguous, no gaps, no duplicates)
    val perDoc = out.groupBy("lang", "doc_id")
      .agg(max("epoch").as("m"), count(lit(1)).as("c"), min("epoch").as("lo"))
    assert(perDoc.where(col("m") =!= col("c") || col("lo") =!= 1L).count() == 0)
    val counts = out.groupBy("lang", "epoch").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // zh: default factor 1.0 → exactly one copy of every row, all epoch 1
    assert(counts.get(("zh", 1L)).contains(666L) && !counts.contains(("zh", 2L)))
    // en: epochs 1 and 2 complete, epoch 3 ≈ half (Binomial(667, 0.5))
    assert(counts(("en", 1L)) == 667L && counts(("en", 2L)) == 667L)
    assert(math.abs(counts(("en", 3L)) / 667.0 - 0.5) < 0.08, s"en epoch-3: $counts")
    // de: sub-one-pass — only epoch 1, about half the stratum
    assert(!counts.contains(("de", 2L)))
    assert(math.abs(counts(("de", 1L)) / 667.0 - 0.5) < 0.08, s"de epoch-1: $counts")
    // partitioning-invariant: identical (doc_id, epoch) multiset
    val a = out.select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.withEpochs(docs.repartition(13), "lang",
        Map("en" -> 2.5, "de" -> 0.5), defaultRepeat = 1.0, key = col("doc_id"))
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("withEpochs: factors nest — raising 2.4 → 2.6 keeps every 2.4-copy") {
    def copies(f: Double): Set[(Long, Long)] =
      Sampling.withEpochs(docs, "lang", Map("en" -> f), defaultRepeat = 0.0, key = col("doc_id"))
        .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lo = copies(2.4); val hi = copies(2.6)
    assert(lo.subsetOf(hi), "hash-threshold selection must nest across factor changes")
    assert(hi.size > lo.size, "fixture too small to distinguish 2.4 from 2.6")
    // defaultRepeat = 0.0 drops unlisted strata entirely
    assert(lo.forall { case (id, _) => id % 3 == 0 }, "only en (doc_id % 3 == 0) survives")
  }

  test("withEpochs and stratifiedHashSample: empty maps fall through to the default") {
    // `map()` with zero entries is untyped — the operators must short-circuit
    // to the default instead of building it
    val e = Sampling.withEpochs(docs, "lang", Map.empty, defaultRepeat = 2.0, key = col("doc_id"))
      .groupBy("epoch").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e == Map(1L -> 2000L, 2L -> 2000L), s"got $e")
    val s = Sampling.stratifiedHashSample(docs, "lang", Map.empty, defaultRate = 0.3,
        key = col("doc_id")).select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s == plain, "empty rate map ≡ uniform sample at the default rate")
  }

  test("withEpochs plan is map-side only; zero-epoch rows vanish before explode") {
    val out = Sampling.withEpochs(docs, "lang", Map("en" -> 0.0), defaultRepeat = 1.0,
      key = col("doc_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"withEpochs must not shuffle:\n$plan")
    // factor 0.0: the stratum vanishes (sequence(1,0) would DESCEND — guarded)
    assert(out.where(col("lang") === "en").count() == 0)
    assert(out.where(col("lang") =!= "en").count() == 1333)
  }

  test("weightedTopK: heavy weights dominate; zero/null weights never selected") {
    import spark.implicits._
    val heavy = (1L to 10L).map(i => (i, "s", Some(1e9)))
    val light = (11L to 110L).map(i => (i, "s", Some(1e-4)))
    val bad   = Seq((200L, "s", Some(0.0)), (201L, "s", None))
    val df = (heavy ++ light ++ bad).toDF("id", "stratum", "w")
    val top10 = Sampling.weightedTopK(df, Seq("stratum"), 10,
        weight = col("w"), rowKey = col("id"))
      .collect().map(_.getLong(0)).toSet
    // ln(u)/1e9 ≈ 0⁻ beats ln(u)/1e-4 ≪ 0 for every u drawable at 1e-6
    // granularity — the ten heavy rows win deterministically
    assert(top10 == (1L to 10L).toSet)
    val all = Sampling.weightedTopK(df, Seq("stratum"), 1000,
        weight = col("w"), rowKey = col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(!all.contains(200L) && !all.contains(201L))
  }

  test("targetEncode: out-of-fold algebra vs driver reference; lone-fold category → prior") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0), (4L, "b", 100.0),
      (5L, "b", 50.0), (6L, "c", 7.0)).toDF("id", "cat", "y")
    val alpha = 2.0
    val enc = Sampling.targetEncode(df, col("cat"), col("y"), col("id"),
        k = 2, smoothing = alpha)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // driver reference off the SAME deterministic fold assignment
    val rows = Sampling.kFold(df, col("id"), k = 2).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
    val gm = rows.map(t => BigDecimal(t._2)).sum.toDouble / rows.length
    rows.groupBy(_._1).foreach { case (cat, rs) =>
      val s = rs.map(t => BigDecimal(t._2)).sum
      rs.groupBy(_._3).foreach { case (fold, fr) =>
        val sf = fr.map(t => BigDecimal(t._2)).sum
        val exp = r6(((s - sf).toDouble + alpha * gm) / ((rs.length - fr.length) + alpha))
        val got = enc((cat, fold))
        assert(got == ((fr.length.toLong, (rs.length - fr.length).toLong, exp)),
          s"($cat, $fold): $got vs $exp")
      }
    }
    // a category confined to one fold trains against the pure prior
    val cCells = enc.filter(_._1._1 == "c")
    assert(cCells.size == 1 && cCells.head._2._2 == 0L && cCells.head._2._3 == r6(gm))
    graft.Caches.clear()
  }

  test("kFold: every row gets one fold in [0,k); deterministic, partition-invariant, all folds populated") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val f1 = Sampling.kFold(df, col("id"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f2 = Sampling.kFold(df.repartition(7), col("id"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(f => f >= 0 && f < 5))
    val sizes = f1.values.groupBy(identity).map { case (f, xs) => f -> xs.size }
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // hash-uniform: no fold is badly starved on 1000 keys
    assert(sizes.values.min > 100, s"fold sizes skewed: $sizes")
    // fold ∈ {0,1} at k=2 refines the trainTestSplit idea: same family
    val f3 = Sampling.kFold(df, col("id"), k = 2).collect().map(_.getLong(1)).toSet
    assert(f3 == Set(0L, 1L))
  }

  test("negativePairs: deterministic draws, self-pairs dropped, positives excluded, ids from corpus") {
    import spark.implicits._
    val df = (1L to 200L).toDF("doc_id")
    val n1 = Sampling.negativePairs(df, "doc_id", m = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val n2 = Sampling.negativePairs(df.repartition(9), "doc_id", m = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(n1 == n2, "draws must not depend on input partitioning")
    assert(n1.values.forall(v => v >= 1L && v <= 200L))
    assert(n1.forall { case ((a, _), neg) => a != neg })
    // each anchor has m draws minus self-collisions (rare but legal)
    val perAnchor = n1.keySet.groupBy(_._1).map { case (a, ks) => a -> ks.size }
    assert(perAnchor.values.forall(c => c >= 2 && c <= 3))
    assert(perAnchor.keySet.size == 200)
    // positives exclusion: forbid exactly the pairs drawn for anchor 1
    val a1 = n1.collect { case ((1L, _), neg) => neg }.toSeq
    val pos = a1.map(v => (1L, v)).toDF("id_a", "id_b")
    val excl = Sampling.negativePairs(df, "doc_id", m = 3, positives = Some(pos))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(!excl.exists { case (a, neg) => a == 1L && a1.contains(neg) })
    // the reverse orientation is excluded too: (v, 1) pairs are gone
    assert(excl.toSet.intersect(a1.map(v => (v, 1L)).toSet).isEmpty)
  }

  test("quotaSample: largest-remainder allocation hand-computed; total exact") {
    import spark.implicits._
    // strata a:5, b:3, c:2 → N=10, T=6: base 3/1/1 (floor of 3.0/1.8/1.2),
    // rems 0/8/2 → leftover 1 goes to b → quotas 3/2/1
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("lang", "doc_id")
    val got = Sampling.quotaSample(df, "lang", total = 6L, key = col("doc_id"))
      .collect().map(r => r.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(got == Map("a" -> 3, "b" -> 2, "c" -> 1))
  }

  test("quotaSample: T >= N returns everything; T=0 returns nothing; partition-invariant") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (if (i % 3 == 0) "x" else "y", i)).toDF("lang", "doc_id")
    assert(Sampling.quotaSample(df, "lang", 1000L, col("doc_id")).count() == 40L)
    assert(Sampling.quotaSample(df, "lang", 0L, col("doc_id")).count() == 0L)
    val a = Sampling.quotaSample(df, "lang", 10L, col("doc_id"))
      .collect().map(_.getLong(1)).sorted.toSeq
    val b = Sampling.quotaSample(df.repartition(13), "lang", 10L, col("doc_id"))
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(a == b && a.size == 10)
  }

  test("quotaSample nests: growing T keeps every row whose stratum quota grew or held") {
    import spark.implicits._
    val df = (1L to 60L).map(i => (if (i % 4 == 0) "x" else "y", i)).toDF("lang", "doc_id")
    val small = Sampling.quotaSample(df, "lang", 12L, col("doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
    val big = Sampling.quotaSample(df, "lang", 30L, col("doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
    small.foreach { case (lang, rows) =>
      if (big(lang).size >= rows.size)
        assert(rows.map(_._2).toSet.subsetOf(big(lang).map(_._2).toSet))
    }
  }

  test("tokenBudget: prefix matches the single-partition window reference") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, (i * 37 % 91) + 1)).toDF("doc_id", "tok")
    val got = Sampling.tokenBudget(df.repartition(11), col("tok"), budget = 2000L,
        sortCols = Seq(col("tok"), col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tok"), col("doc_id")).rowsBetween(Long.MinValue, 0)
    val ref = df.withColumn("cum", sum(col("tok")).over(w))
      .where(col("cum") <= 2000L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == ref && got.nonEmpty)
    graft.Caches.clear()
  }

  test("stratifiedKFold: folds exactly balanced per stratum; deterministic") {
    import spark.implicits._
    // stratum sizes 7 and 5 with k=3: sizes must be {3,2,2} and {2,2,1}
    val df = ((1L to 7L).map(i => (i, "a")) ++ (8L to 12L).map(i => (i, "b")))
      .toDF("id", "g")
    val got = Sampling.stratifiedKFold(df, "g", col("id"), k = 3)
    val sizes = got.groupBy("g", "fold").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert((0 to 2).map(f => sizes(("a", f.toLong))).sorted == Seq(2L, 2L, 3L))
    assert((0 to 2).map(f => sizes.getOrElse(("b", f.toLong), 0L)).sorted == Seq(1L, 2L, 2L))
    // deterministic across partitionings
    val a = got.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Sampling.stratifiedKFold(df.repartition(7), "g", col("id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("temporalSplit: band boundaries are inclusive/exclusive exactly as documented") {
    import spark.implicits._
    val df = Seq(1L, 79L, 80L, 99L, 100L, 150L).toDF("t")
    val got = Sampling.temporalSplit(df, col("t"), cutoff = 100L, embargo = 20L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "train", 79L -> "train", 80L -> "embargo",
      99L -> "embargo", 100L -> "test", 150L -> "test"))
    // zero embargo degenerates to a plain two-way time split
    val two = Sampling.temporalSplit(df, col("t"), cutoff = 100L)
      .collect().map(r => r.getString(1)).toSet
    assert(two == Set("train", "test"))
  }

  test("neymanQuota: allocation tracks N·σ; zero-variance strata get nothing; total exact") {
    import spark.implicits._
    // stratum a: values ±30 around 100 (σ=30); b: ±10 around 100 (σ=10);
    // z: constant (σ=0). Equal sizes → allocation a:b ≈ 3:1, z = 0.
    val rows =
      (1L to 40L).map(i => (i, "a", if (i % 2 == 0) 130L else 70L)) ++
      (41L to 80L).map(i => (i, "b", if (i % 2 == 0) 110L else 90L)) ++
      (81L to 120L).map(i => (i, "z", 100L))
    val df = rows.toDF("id", "g", "v")
    val got = Sampling.neymanQuota(df, "g", col("v"), total = 40L, key = col("id"))
    val byG = got.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG.getOrElse("z", 0L) == 0L)
    assert(byG("a") == 30L && byG("b") == 10L) // exact 3:1 on these weights
    assert(byG.values.sum == 40L)
    // per-stratum prefix property: a bigger budget keeps every row whose
    // stratum quota did not shrink (here quotas grow with T)
    val more = Sampling.neymanQuota(df, "g", col("v"), total = 60L, key = col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    val base = got.select("id").collect().map(_.getLong(0)).toSet
    assert(base.subsetOf(more))
  }

  test("coordinatedSample: referential closure across tables; per-table ≡ hashSample") {
    import spark.implicits._
    val parent = (1L to 300L).map(i => (i, s"p$i")).toDF("pid", "pv")
    // child keys cover a subset of parents, many rows per key
    val child = (1L to 900L).map(i => (i, i % 300 + 1)).toDF("cid", "pid")
    val Seq(sp, sc) = Sampling.coordinatedSample(
      Seq((parent, col("pid")), (child, col("pid"))), fraction = 0.4, seed = 7)
    // every sampled child's key appears among the sampled parents: closure
    val orphans = sc.join(sp.select("pid"), Seq("pid"), "left_anti").count()
    assert(orphans == 0L)
    // and each side is exactly the single-table hashSample under the same rule
    assert(sp.collect().toSet ==
      Sampling.hashSample(parent, col("pid"), 0.4, seed = 7).collect().toSet)
    assert(sc.collect().toSet ==
      Sampling.hashSample(child, col("pid"), 0.4, seed = 7).collect().toSet)
    // the sample is not empty and not everything
    val n = sp.count()
    assert(n > 0 && n < 300)
  }

  test("tokenBudget plans the distributed prefix sum, not a single-partition window") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("doc_id", "tok")
    val out = Sampling.tokenBudget(df, col("tok"), 100L, Seq(col("tok"), col("doc_id")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"tokenBudget must not use a global window:\n$plan")
    graft.Caches.clear()
  }

  test("waterFillBudget: exact level, uncapped small strata, covering budget, determinism") {
    import spark.implicits._
    // masses 10/20/40/80 (=150). budget 100: keep 10 and 20 whole,
    // level t = (100-30)/2 = 35 caps 40 and 80
    val df = (Seq.fill(1)(("a", 10.0)) ++ Seq.fill(2)(("b", 10.0)) ++
      Seq.fill(4)(("c", 10.0)) ++ Seq.fill(8)(("d", 10.0))).toDF("src", "m")
    val got = Sampling.waterFillBudget(df, Seq("src"), col("m"), budget = 100.0)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got("a") == ((10.0, 10.0, false)) && got("b") == ((20.0, 20.0, false)))
    assert(got("c") == ((40.0, 35.0, true)) && got("d") == ((80.0, 35.0, true)))
    // allocations hit the budget exactly
    assert(got.values.map(_._2).sum == 100.0)
    // budget below the smallest stratum: everyone capped at budget/k
    val low = Sampling.waterFillBudget(df, Seq("src"), col("m"), budget = 20.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(low.values.forall(_ == 5.0))
    // budget covering everything: no cap, full masses back
    val free = Sampling.waterFillBudget(df, Seq("src"), col("m"), budget = 1000.0)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(free == Map("a" -> ((10.0, false)), "b" -> ((20.0, false)),
      "c" -> ((40.0, false)), "d" -> ((80.0, false))))
    // partitioning cannot move the decimal prefix sums
    val re = Sampling.waterFillBudget(df.repartition(7), Seq("src"), col("m"), budget = 100.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(re == got.map { case (k, v) => k -> v._2 })
  }

  test("ipfWeights: both margins converge to uniform; mass conserved; partition-stable") {
    import spark.implicits._
    // skewed 2×2 mix: source r1 is 6/8 of the corpus, lang c1 is 5/8
    val rows = Seq.fill(4)(("r1", "c1")) ++ Seq.fill(2)(("r1", "c2")) ++
      Seq.fill(1)(("r2", "c1")) ++ Seq.fill(1)(("r2", "c2"))
    val df = rows.toDF("src", "lang")
    val w = Sampling.ipfWeights(df, col("src"), col("lang"), rounds = 8)
    val cells = w.collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(cells.size == 4)
    // total mass N = 8 survives raking (the last pass scales columns to target)
    val totalW = cells.values.map(_._2).sum
    assert(math.abs(totalW - 8.0) < 1e-3)
    // column margins exactly at target 8/2 = 4 after the final column pass
    val colMass = cells.groupBy(_._1._2).view.mapValues(_.values.map(_._2).sum)
    assert(colMass.values.forall(m => math.abs(m - 4.0) < 1e-6))
    // row margins converge to 4 (8 sweeps is far past display precision)
    val rowMass = cells.groupBy(_._1._1).view.mapValues(_.values.map(_._2).sum)
    assert(rowMass.values.forall(m => math.abs(m - 4.0) < 1e-3))
    // factor is the per-example multiplier weight/n
    val facs = w.collect().map(r => (r.getDouble(3), r.getLong(2), r.getDouble(4)))
    facs.foreach { case (wt, n, fac) =>
      assert(math.abs(fac - wt / n) < 5e-6)
    }
    // partitioning cannot move the decimal-cast per-pass sums
    val re = Sampling.ipfWeights(df.repartition(7), col("src"), col("lang"), rounds = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(re == cells.map { case (k, v) => k -> v._2 })
    graft.Caches.clear()
  }

  test("approxAggregate: HT estimator ≡ driver math on the op's own sample; CIs bracket") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = (1L to 400L).map(k => (k, if (k % 2 == 0) "even" else "odd", (k % 7).toDouble))
      .toDF("k", "g", "v")
    val f = 0.5
    val got = Sampling.approxAggregate(df, col("k"), col("v"), Seq("g"), fraction = f)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // recompute from the SAME hash-rule sample with driver arithmetic
    val sample = Sampling.hashSample(df, col("k"), f)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    val z = 1.959963984540054
    val inv = 2.0; val vf = inv * inv * (1.0 - f)
    sample.groupBy(_._1).foreach { case (g, rows) =>
      val n = rows.length.toDouble
      val s = rows.map(_._2).sum // exact: small integers
      val s2 = rows.map(x => x._2 * x._2).sum
      val (gn, estC, cLo, cHi, estT, tLo, tHi) = got(g)
      assert(gn == rows.length.toLong && estC == r6(n * inv))
      assert(cLo == r6(n * inv - z * math.sqrt(n * vf)))
      assert(cHi == r6(n * inv + z * math.sqrt(n * vf)))
      assert(estT == r6(s * inv))
      assert(tLo == r6(s * inv - z * math.sqrt(s2 * vf)))
      assert(tHi == r6(s * inv + z * math.sqrt(s2 * vf)))
      assert(tLo < estT && estT < tHi)
    }
    // the deterministic sample makes the "approximate" answer reproducible
    val re = Sampling.approxAggregate(df.repartition(7), col("k"), col("v"), Seq("g"),
      fraction = f).collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(re == got.map { case (k, v) => k -> v._5 })
  }

  test("rendezvousAssign: minimal disruption on reshard; deterministic; all shards used") {
    import spark.implicits._
    val df = (1L to 400L).map(k => Tuple1(k)).toDF("k")
    val three = Sampling.rendezvousAssign(df, col("k"), Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val four = Sampling.rendezvousAssign(df, col("k"), Seq("a", "b", "c", "d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the defining property: a key either keeps its shard or moves to the NEW one
    four.foreach { case (k, s) => assert(s == three(k) || s == "d") }
    val moved = four.count { case (k, s) => s != three(k) }
    // expected ≈ 1/4 of keys; generous band, zero would mean d never wins
    assert(moved > 40 && moved < 180, s"moved=$moved")
    assert(three.values.toSet == Set("a", "b", "c"))
    // pure projection: repartitioning cannot move an assignment
    val re = Sampling.rendezvousAssign(df.repartition(7), col("k"), Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == three)
  }

  test("systematicSample: exact stride positions, partition-invariant, offset contract") {
    import spark.implicits._
    val df = (1L to 50L).map(k => (k, s"row$k")).toDF("k", "v")
    val got = Sampling.systematicSample(df, col("k"), every = 7L, offset = 3L)
      .collect().map(_.getLong(0)).sorted
    // rank-1 positions with (rank-1) % 7 == 3 → ranks 4, 11, 18, …
    assert(got.toSeq == Seq(4L, 11L, 18L, 25L, 32L, 39L, 46L))
    val re = Sampling.systematicSample(df.repartition(9), col("k"), every = 7L, offset = 3L)
      .collect().map(_.getLong(0)).sorted
    assert(re.toSeq == got.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.systematicSample(df, col("k"), every = 5L, offset = 5L)
    }
    graft.Caches.clear()
  }
}
