package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("LshIndex: disk roundtrip ≡ in-memory incremental; append visible; geometry gate; compact invariant") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog at noon",
      3L -> "completely unrelated text about spark physical planning")
    val batch = docs(
      10L -> "the quick brown fox jumps over the lazy dog tonight",
      11L -> "nothing in the corpus looks remotely like this row")
    val late = docs(20L -> "nothing in the corpus looks remotely like this row")
    val idx = Dedup.LshIndex(numHashes = 16, shingleWidth = 3)
    val path = java.nio.file.Files.createTempDirectory("lsh_idx").toString + "/index"

    idx.save(corpus, path)
    def pairs(df: DataFrame) = idx.probe(spark, path, df, bands = 4, verifyThreshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = pairs(batch)
    val mem = Dedup.incrementalMinhash(batch, corpus,
        numHashes = 16, bands = 4, verifyThreshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == mem, s"disk probe $got must equal in-memory incremental $mem")
    assert(got.map(p => (p._1, p._2)).contains((10L, 1L)), got.toString)

    // appended batches are immediately probe-visible
    idx.append(spark, path, batch)
    val afterAppend = pairs(late)
    assert(afterAppend.map(p => (p._1, p._2)) == Set((20L, 11L)), afterAppend.toString)

    // compaction changes files, never results
    idx.compact(spark, path)
    assert(pairs(late) == afterAppend)

    // a mismatched handle must refuse, not silently find nothing
    intercept[IllegalArgumentException] {
      Dedup.LshIndex(numHashes = 32, shingleWidth = 3).probe(spark, path, batch)
    }
    graft.Caches.clear()
  }

  test("LshIndex feeds incrementalClusters across appended batches ≡ the inline incremental path") {
    // the daily-crawl consumer story: labels are MAINTAINED from index
    // probes — batch 2's dup of a batch-1 doc is only findable because
    // batch 1 was APPENDED (not rebuilt) into the standing index
    val history = docs(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog at noon",
      3L -> "completely unrelated text about spark physical planning")
    val batch1 = docs(
      10L -> "the quick brown fox jumps over the lazy dog tonight",
      11L -> "a fresh paragraph on columnar shuffle layouts and codecs")
    val batch2 = docs(
      20L -> "a fresh paragraph on columnar shuffle layouts and codecs",
      21L -> "yet another singleton that matches nothing anywhere")
    val all = history.unionAll(batch1).unionAll(batch2)
    val idx = Dedup.LshIndex(numHashes = 16, shingleWidth = 3)
    val path = java.nio.file.Files.createTempDirectory("lsh_idx_inc").toString + "/index"
    idx.save(history, path)

    val labels0 = Dedup.clusters(spark,
      Dedup.minhashLsh(history, numHashes = 16, bands = 4, shingleWidth = 3,
        verifyThreshold = 0.7),
      docs = Some(history)).select(col("doc_id"), col("cluster_id"))

    def lab(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    // index-served: probe → label → append, twice
    val p1 = idx.probe(spark, path, batch1, bands = 4, verifyThreshold = 0.7)
      .select(col("new_id"), col("old_id")).cache()
    p1.count() // force BEFORE the append mutates the store the probe reads
    val l1 = Dedup.incrementalClusters(spark, labels0, p1,
      docs = Some(history.unionAll(batch1)), aCol = "new_id", bCol = "old_id")
    idx.append(spark, path, batch1)
    val p2 = idx.probe(spark, path, batch2, bands = 4, verifyThreshold = 0.7)
      .select(col("new_id"), col("old_id"))
    val l2 = lab(Dedup.incrementalClusters(spark,
      l1.select(col("doc_id"), col("cluster_id")), p2,
      docs = Some(all), aCol = "new_id", bCol = "old_id"))

    // inline: same flow, history frames re-banded in memory per batch
    val q1 = Dedup.incrementalMinhash(batch1, history,
      numHashes = 16, bands = 4, verifyThreshold = 0.7)
      .select(col("new_id"), col("old_id"))
    val m1 = Dedup.incrementalClusters(spark, labels0, q1,
      docs = Some(history.unionAll(batch1)), aCol = "new_id", bCol = "old_id")
    val q2 = Dedup.incrementalMinhash(batch2, history.unionAll(batch1),
      numHashes = 16, bands = 4, verifyThreshold = 0.7)
      .select(col("new_id"), col("old_id"))
    val m2 = lab(Dedup.incrementalClusters(spark,
      m1.select(col("doc_id"), col("cluster_id")), q2,
      docs = Some(all), aCol = "new_id", bCol = "old_id"))

    assert(l2 == m2, s"index-served $l2 must equal inline $m2")
    // the cross-batch family proves the append is load-bearing
    val byId = l2.map(t => t._1 -> t._2).toMap
    assert(byId(20L) == byId(11L) && byId(20L) != 20L,
      s"batch-2 doc 20 must join batch-1 doc 11's cluster: $l2")
    assert(byId(10L) == byId(1L) && byId(2L) == byId(1L), l2.toString)
    assert(byId(21L) == 21L && byId(3L) == 3L, l2.toString)
    graft.Caches.clear()
  }

  test("semanticDedup drops min-id-neighbor dups within a bucket only") {
    import spark.implicits._
    val e = Seq(
      (1L, "A", Seq(1.0, 0.0)), // kept: smallest id of the A-duplicates
      (2L, "A", Seq(1.0, 0.0)), // dropped: dup of 1
      (5L, "A", Seq(1.0, 0.0)), // dropped: dup of 1 AND 2 (n_smaller_dups = 2)
      (3L, "A", Seq(0.0, 1.0)), // kept: orthogonal to everything in A
      (4L, "B", Seq(1.0, 0.0))  // kept: identical to 1 but in another bucket
    ).toDF("vec_id", "blk", "embedding")
    val out = Dedup.semanticDedup(e, bucketCol = col("blk"), threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((0L, true)))
    assert(out(2L) === ((1L, false)))
    assert(out(5L) === ((2L, false)))
    assert(out(3L) === ((0L, true)))
    assert(out(4L) === ((0L, true)), "blocking must confine the compare to the bucket")
  }

  test("semanticPairs composes with clustersBy for quality-policy semantic groups") {
    import spark.implicits._
    val e = Seq(
      (1L, "A", Seq(1.0, 0.0), 5L),  // dup group {1,2,5}; 5 has the best score
      (2L, "A", Seq(1.0, 0.0), 3L),
      (5L, "A", Seq(1.0, 0.0), 9L),
      (3L, "A", Seq(0.0, 1.0), 1L)   // singleton
    ).toDF("vec_id", "blk", "embedding", "score")
    val pairs = Dedup.semanticPairs(e, bucketCol = col("blk"), threshold = 0.9)
    assert(pairs.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (1L, 5L), (2L, 5L)))
    val docs = e.select(col("vec_id").as("doc_id"), col("score"))
    val verdict = Dedup.clustersBy(spark, pairs, docs, score = col("score"), idCol = "doc_id")
    val kept = verdict.where(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(5L, 3L), s"highest-score representative per semantic group: $kept")
  }

  test("semanticPairs: family collapse reproduces the naive all-pairs compare exactly") {
    import spark.implicits._
    // exact-duplicate families, near-dups, zero vectors, split across buckets
    val rnd = new scala.util.Random(11)
    val base = (0 until 6).map(_ => Array.fill(4)(rnd.nextDouble() * 2 - 1))
    val rows: Seq[(Long, String, Seq[Double])] = (0 until 30).map { i =>
      val v =
        if (i % 10 == 9) Array(0.0, 0.0, 0.0, 0.0)           // zero family
        else if (i % 3 == 0) base(i % 6)                      // verbatim copies
        else base(i % 6).map(x => x + (i % 7) * 1e-3)         // near-dups
      (i.toLong, if (i % 2 == 0) "A" else "B", v.toSeq)
    }
    val df = rows.toDF("vec_id", "blk", "embedding")
    val got = Dedup.semanticPairs(df, bucketCol = col("blk"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0.0 || nb == 0.0) None else Some(dot / (na * nb))
    }
    val brute = (for {
      (ia, ba, va) <- rows; (ib, bb, vb) <- rows
      if ba == bb && ia < ib
      c <- cos(va, vb) if c >= 0.5
    } yield (ia, ib,
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got == brute, s"collapse/expand must equal all-pairs: got ${got.size} vs ${brute.size}")
    graft.Caches.clear()
  }

  test("blockingEval: hand counts; orientation and duplicate pairs canonicalize; empty truth → NULL") {
    import spark.implicits._
    val corpus = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // candidates carry a reversed duplicate (3,2)≡(2,3) and a self-pair to drop
    val cand = Seq((1L, 2L), (2L, 3L), (3L, 2L), (4L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val truth = Seq((2L, 1L), (3L, 5L)).toDF("id_a", "id_b") // (1,2) hit, (3,5) missed
    val r = Dedup.blockingEval(corpus, cand, truth).collect().head
    // n=6 → total 15; canonical candidates {12,23,56} = 3; truth {12,35} = 2; hit 1
    assert((r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((6L, 15.0, 3L, 2L, 1L)))
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.8)
    val empty = Dedup.blockingEval(corpus, cand, truth.where(lit(false)))
      .collect().head
    assert(empty.isNullAt(5) && empty.getLong(3) == 0L)
  }

  test("prefixJaccardPairs: exact-duplicate collapse reproduces the naive compare exactly") {
    import spark.implicits._
    // duplicate families (verbatim + case/whitespace variants that
    // normalize equal), near-dups, and short docs below the shingle width
    val texts = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel",
      "alpha bravo charlie delta echo foxtrot golf INDIA",
      "kilo lima mike november oscar papa quebec",
      "tiny doc",
      "solo")
    val rows: Seq[(Long, String)] = (0 until 25).map { i =>
      val base = texts(i % 5)
      val t = if (i % 3 == 0) base.toUpperCase + "  " else base // same fingerprint
      (i.toLong, t)
    }
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(df, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive reference: all pairs, exact jaccard over the same shingles
    def sh(t: String): Set[String] = {
      val tk = t.trim.toLowerCase.split("\\s+").toSeq
      (0 to math.max(tk.size - 3, 0)).map(i => tk.slice(i, i + 3).mkString(" ")).toSet
    }
    val brute = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      j = sh(ta).intersect(sh(tb)).size.toDouble / sh(ta).union(sh(tb)).size
      if j >= 0.5
    } yield (ia, ib,
      BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got == brute, s"got ${got.size} vs brute ${brute.size}")
    graft.Caches.clear()
  }

  test("semanticPairsMulti: independent hyperplane families strictly improve planted-pair recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // 60 random unit vectors, each with a perturbed twin — the planted
    // near-dup pairs a 4-bit family will partially split across buckets
    val base = Seq.tabulate(60)(_ => unit(Array.fill(8)(rnd.nextGaussian())))
    val twins = base.map(v => unit(v.map(_ + rnd.nextGaussian() * 0.2)))
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      twins.zipWithIndex.map { case (v, i) => ((i + 1000).toLong, v.toSeq) }
    val df = rows.toDF("vec_id", "embedding")
    def cos(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    val planted = base.zip(twins).zipWithIndex
      .filter { case ((v, t), _) => cos(v, t) >= 0.8 }
      .map { case (_, i) => (i.toLong, (i + 1000).toLong) }.toSet
    assert(planted.size >= 50, s"fixture degenerate: only ${planted.size} planted pairs")

    def fam(f: Int) = SimilaritySearch.RandomHyperplaneLsh(bits = 4, dim = 8, family = f)
      .bucketExpr(col("embedding"))
    def pairSet(df2: org.apache.spark.sql.DataFrame) =
      df2.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairSet(Dedup.semanticPairs(df, fam(0), threshold = 0.8))
    val multi  = pairSet(Dedup.semanticPairsMulti(df, Seq(fam(0), fam(1)), threshold = 0.8))

    assert(single.subsetOf(multi), "the union can only add pairs")
    val rSingle = (planted intersect single).size
    val rMulti  = (planted intersect multi).size
    assert(rSingle < planted.size, "fixture must leave family 0 some misses to recover")
    assert(rMulti > rSingle,
      s"second family must recover pairs family 0 split: single=$rSingle multi=$rMulti of ${planted.size}")
  }

  test("exact dedup groups identical keys, keeps min id, counts dups") {
    val df  = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val out = Dedup.exact(df, Seq("text")).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a b c", 1L, 2L), ("x y z", 3L, 1L)))
  }

  test("exactByHash equals exact-on-text after whitespace/case normalization") {
    val df  = docs(1L -> "Hello  World", 2L -> "hello world", 3L -> "other doc")
    val out = Dedup.exactByHash(df).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L), (3L, 1L))) // (keep_id, dup_count)
  }

  test("shingles produces distinct w-token windows") {
    val df = docs(1L -> "a b c d")
    val sh = df.select(Dedup.shingles(col("text"), 3).as("sh")).head().getSeq[String](0)
    assert(sh.toSet == Set("a b c", "b c d"))
  }

  test("minhashLsh finds an exact duplicate pair with jaccard 1.0") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog tonight",
      3L -> "completely different content with no overlap at all here"
    )
    val pairs = Dedup.minhashLsh(df, numHashes = 16, bands = 4).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("snapshotDiff: added/removed/changed/unchanged; cosmetic edits are unchanged") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept text"), (4L, "goes away")
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "alpha beta EDITED"),       // changed
      (2L, "  GAMMA   delta  "),       // cosmetic only → unchanged
      (3L, "kept text"),               // unchanged
      (5L, "brand new")                // added
    ).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(oldSnap, newSnap)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
  }

  test("minhashEstimates: exact dup estimates 1.0 with zero error; est is a component-agreement fraction") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog tonight",
      3L -> "the quick brown fox jumps over the lazy dog today then",
      4L -> "completely different content with no overlap at all here"
    )
    val rows = Dedup.minhashEstimates(df, numHashes = 16, bands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // identical docs: every signature component agrees, exact jaccard 1.0
    assert(rows((1L, 2L)) == ((1.0, 1.0, 0.0)))
    // every estimate is a multiple of 1/16 in [0,1]; err = |est − exact|
    rows.values.foreach { case (est, jac, err) =>
      assert(est >= 0.0 && est <= 1.0 && (est * 16).round == est * 16)
      assert(jac >= 0.0 && jac <= 1.0)
      assert(math.abs(err - math.abs(est - jac)) < 2e-6)
    }
    // the near-dup pair (1,3) must estimate clearly above any pair
    // involving the unrelated doc 4
    rows.get((1L, 3L)).foreach { case (est, jac, _) =>
      assert(jac > 0.3 && est > 0.3)
    }
  }

  test("simhash of identical docs is identical; pairs found within hamming bound") {
    val df   = docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta", 3L -> "unrelated words here now")
    val sigs = Dedup.simhash(df)
    val byId = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == byId(2L))
    val pairs = Dedup.simhashPairs(sigs, maxHamming = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
  }

  test("SimHashAgg sketch aggregate is bit-identical to the wide formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(5 + rng.nextInt(30))(s"w${rng.nextInt(50)}").mkString(" "))
    ).toDF("doc_id", "text")
    val a = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhashWide(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("ngramJaccardPairs computes exact jaccard on overlapping docs") {
    // doc1 shingles: {a b c, b c d}; doc2: {a b c, b c x} → jaccard = 1/3
    val df    = docs(1L -> "a b c d", 2L -> "a b c x")
    val pairs = Dedup.ngramJaccardPairs(df, threshold = 0.1).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(math.abs(pairs.head.getDouble(2) - 0.333333) < 1e-6)
  }

  test("Md5Hash matches the pinned cross-engine constant and stays in 60 bits") {
    import spark.implicits._
    // DuckDB: SELECT CAST(('0x' || substr(md5('abc'), 1, 15)) AS BIGINT)
    //         → 648541476951500027. If either side's rendering changes,
    // this pin catches the drift before the oracle does.
    val r = Seq("abc").toDF("s")
      .select(
        Md5Hash.plain(col("s")).as("h"),
        Md5Hash.seeded(3, col("s")).as("hs"),
        Md5Hash.unit(col("s")).as("u"))
      .head()
    assert(r.getLong(0) == 648541476951500027L)
    assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 60))
    assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << 60))
    assert(r.getDouble(2) >= -1.0 && r.getDouble(2) < 1.0)
    assert(Md5Hash.duckdbPlain("s") == "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)")
  }

  test("minhashLsh with the portable hash family finds the same exact-dup pair") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog tonight",
      3L -> "completely different content with no overlap at all here"
    )
    val pairs = Dedup.minhashLsh(df, numHashes = 16, bands = 4, hash = Md5Hash).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("ngram df-prune (groupBy + anti-join) matches the window formulation") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // random corpus over a tiny vocabulary so shingles repeat and the
    // maxDocFreq cap actually prunes
    val rng = new scala.util.Random(29)
    val df = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(6 + rng.nextInt(10))(s"w${rng.nextInt(6)}").mkString(" "))
    ).toDF("doc_id", "text")
    val cap = 12L

    val got = Dedup.ngramJaccardPairs(df, threshold = 0.3, maxDocFreq = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // the original window-based df computation, inlined as the oracle
    val base = df.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")))
    val sizes = base.select(col("id"), col("sz"))
    val pruned = base.select(col("id"), explode(col("sh")).as("shingle"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .where(col("df") <= cap).drop("df")
    val co = pruned.as("a")
      .join(pruned.as("b"), col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val want = co
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .where(col("jaccard") >= 0.3)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got == want)
    assert(got.nonEmpty)
  }

  test("embeddingCosinePairs finds near-identical vectors within a block only") {
    import spark.implicits._
    val df = Seq(
      (1L, "b0", Seq(1.0, 0.0, 0.0)),
      (2L, "b0", Seq(1.0, 0.001, 0.0)),
      (3L, "b1", Seq(1.0, 0.0, 0.0)), // identical direction but different block
      (4L, "b0", Seq(0.0, 1.0, 0.0))
    ).toDF("vec_id", "blk", "embedding")
    val out = Dedup.embeddingCosinePairs(df, blockCol = "blk", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }
}

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String): Row = {
    import spark.implicits._
    TextAnalysis.analyze(Seq((1L, text)).toDF("doc_id", "text")).head()
  }

  test("token counts: whitespace and bpe-ish") {
    import spark.implicits._
    val df = Seq((1L, "hello world spark"), (2L, ""), (3L, "internationalization")).toDF("doc_id", "text")
    val tc = df.select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0)).toSeq
    assert(tc == Seq(3, 0, 1))
    val bp = df.select(TextAnalysis.bpeishTokenCount(col("text"))).collect().map(_.getInt(0)).toSeq
    assert(bp == Seq(6, 0, 5)) // ceil(5/4)*3 = 6; ""→0; ceil(20/4) = 5
  }

  test("dedupSpans: duplicated spans removed from all but the first holder; intra-doc repeats survive") {
    import spark.implicits._
    val span = "one two three four five six seven eight"
    val df = Seq(
      (1L, s"intro-a $span tail-a"),            // first holder: keeps the span
      (2L, s"intro-b $span tail-b"),            // later holder: loses exactly the span
      (3L, "completely unrelated words that repeat nothing from the others"),
      (4L, s"solo $span $span solo-tail")       // shares the span; both copies covered
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpans(df, window = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((s"intro-a $span tail-a", 10L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == (("intro-b tail-b", 10L, 8L)), s"got ${out(2L)}")
    assert(out(3L)._3 == 0L, s"got ${out(3L)}")
    assert(out(4L) == (("solo solo-tail", 18L, 16L)), s"got ${out(4L)}")

    // a span repeated only WITHIN one doc is untouched (minDocs = 2 means
    // distinct documents)
    val solo = Seq(
      (1L, s"only-here $span then $span again"),
      (2L, "nothing shared with the document above at all right")
    ).toDF("doc_id", "text")
    val soloOut = TextAnalysis.dedupSpans(solo, window = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(soloOut == Map(1L -> 0L, 2L -> 0L), s"got $soloOut")
  }

  test("dedupParagraphs: first occurrence wins corpus-wide, order preserved, empties stripped") {
    import spark.implicits._
    val df = Seq(
      (1L, "BANNER\nunique one\nFOOTER"),
      (2L, "BANNER\nunique two\nFOOTER"),   // sheds both boilerplate paras
      (3L, "BANNER\n\n   \nFOOTER"),        // all boilerplate + whitespace paras
      (4L, "solo text"),                    // no separator at all
      (5L, "twice\ntwice"),                 // within-doc repeat: first kept
      (6L, "")                              // empty document
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupParagraphs(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("BANNER\nunique one\nFOOTER", 3L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == (("unique two", 3L, 2L)), s"got ${out(2L)}")
    assert(out(3L) == (("", 2L, 2L)), s"got ${out(3L)}")
    assert(out(4L) == (("solo text", 1L, 0L)))
    assert(out(5L) == (("twice", 2L, 1L)), s"within-doc repeat: ${out(5L)}")
    assert(out(6L) == (("", 0L, 0L)))
    // determinism under repartition (winner election must not depend on layout)
    val again = TextAnalysis.dedupParagraphs(df.repartition(7)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again == out)
  }

  test("corpusReport: per-stratum counts, exact quality mean, dup rate") {
    import spark.implicits._
    val good = ("x " * 300).trim // 300 tokens, 599 chars → quality ≈ 0.667
    val df = Seq(
      (1L, "en", good), (2L, "en", good),   // exact duplicates
      (3L, "en", "short low quality"),      // unique, low quality (≈0.34)
      (4L, "de", "kurz")                    // unique, low quality
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.corpusReport(df).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val en = out("en")
    assert(en._1 == 3L && en._2 == 603L, s"en docs/tokens: $en")
    assert(en._4 == 1L, s"exactly the short doc is low quality: $en")
    assert(en._5 == 2L && math.abs(en._6 - 0.333333) < 1e-9, s"dup rate: $en")
    val de = out("de")
    assert(de._1 == 1L && de._4 == 1L && de._5 == 1L && de._6 == 0.0, s"de: $de")
    // the mean equals the decimal-exact fold of the per-doc scores
    val qs = df.where(col("lang") === "en")
      .select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(math.abs(en._3 - math.rint(qs.sum / 3 * 1e6) / 1e6) < 1e-9, s"mean: ${en._3} vs $qs")
  }

  test("rakeKeyphrases: deg/freq scoring, stopword+symbol boundaries, rounded-score cut") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // apple: freq 3, deg 2+2+1=5 → ws 5/3; red/green: ws 2 → the two-word
    // phrases tie at 2 + 5/3 and cut by phrase text ascending
    val docs = Seq((1L, "the red apple and green apple"), (2L, "apple")).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(docs, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("green apple", 2L, 1L, r6(2.0 + 5.0 / 3)),
      ("red apple", 2L, 1L, r6(2.0 + 5.0 / 3))))
    // symbol-only tokens delimit like stopwords; repeats collapse with a count
    val sym = Seq((1L, "alpha beta ### alpha beta")).toDF("doc_id", "text")
    val g2 = TextAnalysis.rakeKeyphrases(sym, topK = 1).collect().head
    assert(g2.getString(0) == "alpha beta" && g2.getLong(2) == 2L && g2.getDouble(3) == 4.0)
    graft.Caches.clear()
  }

  test("cooccurrenceLift: hand-computed marginals and ratios; threshold prunes") {
    import spark.implicits._
    // slots: (a,b),(b,a),(a,b) from doc1 + (a,b) from doc2 → N=4
    // left marginals a:3 b:1; right marginals b:3 a:1
    val df = Seq("a b a b", "a b", "x").toDF("text")
    val got = TextAnalysis.cooccurrenceLift(df, minPairCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(("a", "b")) == ((3L, math.rint(4.0 * 3 / (3 * 3) * 1e6) / 1e6)))
    assert(got(("b", "a")) == ((1L, 4.0)))
    assert(got.size == 2)
    val pruned = TextAnalysis.cooccurrenceLift(df, minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set(("a", "b")))
  }

  test("collocationsG2: hand 2×2 cells; a bound pair beats an equally-frequent free mix") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // "u v" always bound; "p"/"q" co-occur only by chance against filler
    val docs = (Seq.fill(4)("u v") ++ Seq("p q", "p r", "s q", "s r")).toDF("text")
    val got = TextAnalysis.collocationsG2(docs, topK = 10, minPairCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // 8 bigrams total; (u,v): k11=4 k12=0 k21=0 k22=4 →
    // G² = 2·(4·ln(4·8/(4·4)) + 4·ln(4·8/(4·4))) = 16·ln 2
    assert(got(("u", "v"))._4 == r6(2.0 * (4 * math.log(2.0) + 4 * math.log(2.0))))
    assert(got(("u", "v"))._1 == 4L)
    // (p,q): observed 1, expected 2·2/8 = 0.5 — some evidence, far less
    assert(got(("p", "q"))._4 < got(("u", "v"))._4)
    // the ranked cut keeps the bound pair first
    val top = TextAnalysis.collocationsG2(docs, topK = 1, minPairCount = 1L).collect().head
    assert((top.getString(0), top.getString(1)) == (("u", "v")))
    graft.Caches.clear()
  }

  test("textRank: the hub of a star outranks its leaves; symmetric pairs tie; repartition-stable") {
    import spark.implicits._
    // star: hub adjacent to 3 distinct leaves; plus an isolated symmetric pair
    val docs = (Seq.fill(2)("hub l1") ++ Seq.fill(2)("hub l2") ++ Seq.fill(2)("hub l3") ++
      Seq.fill(2)("p q")).toDF("text")
    val got = TextAnalysis.textRank(docs, topK = 10, minPairCount = 1L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.size == 6)
    // every leaf sends its full mass to the hub; the hub splits its mass 3 ways
    assert(Seq("l1", "l2", "l3").forall(l => got("hub") > got(l)))
    // the symmetric pair's ranks are equal by symmetry
    assert(got("p") == got("q"))
    // leaves are mutually symmetric too
    assert(got("l1") == got("l2") && got("l2") == got("l3"))
    // decimal-summed contributions: partitioning cannot move a rank
    val re = TextAnalysis.textRank(docs.repartition(7), topK = 10, minPairCount = 1L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(re == got)
    graft.Caches.clear()
  }

  test("punct and stopword ratios on a known sentence") {
    val r = one("the cat, the hat!")
    // punct chars: ',' '!' → 2/17; tokens: the cat, the hat! → stopwords 'the' x2 of 4
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 17) < 1e-6)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-6)
  }

  test("language id picks marker-heavy language, und when no markers") {
    assert(one("the cat and the dog of the house is here").getAs[String]("lang_pred") == "en")
    assert(one("der hund und die katze und das haus").getAs[String]("lang_pred") == "de")
    assert(one("zzz qqq").getAs[String]("lang_pred") == "und")
  }

  test("repetitionRatio: known fractions, short-doc zero, whitespace/case invariance") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b a b a"),       // bigrams: ab,ba,ab,ba -> 2 distinct of 4 -> 0.5
      (1L, "x y z w"),         // all bigrams distinct -> 0.0
      (2L, "q"),               // shorter than n -> 0.0
      (3L, ""),                // empty -> 0.0
      (4L, "A  b a B a")       // normalization: same as doc 0
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.repetitionRatio(col("text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(0L -> 0.5, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.5), s"got $out")
  }

  test("topNgramStats: dominant bigram, char fraction, smallest-gram tie-break, degenerate docs") {
    import spark.implicits._
    val df = Seq(
      // "b c" wins with 2 of 4 bigrams; words chars = 5; frac = 2*3/5? no:
      // chars("b c") - 1 space = 3-1=2 -> 2*2/5 = 0.8
      (0L, "a b c b c"),
      // tie between "x y" and "y x" (2 each) -> smallest ("x y") wins
      (1L, "x y x y x"),
      (2L, "solo"),   // no bigram: empty winner, zero frac
      (3L, "")        // no words at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topNgramStats(df, n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getString(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(0L) == ((5L, 0.4, "b c", 2L, 0.8)), s"got ${out(0L)}")
    assert(out(1L) == ((5L, 0.6, "x y", 2L, 0.8)), s"got ${out(1L)}")
    assert(out(2L) == ((1L, 0.0, "", 0L, 0.0)), s"got ${out(2L)}")
    assert(out(3L) == ((0L, 0.0, "", 0L, 0.0)), s"got ${out(3L)}")
  }

  test("bm25 matches the textbook formula, only matching docs returned, repartition-stable") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "durian durian durian")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq("apple", "banana"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // brute-force reference computation (same constant shapes)
    val n = 3.0; val avgdl = 8.0 / 3.0; val k1 = 1.2; val b = 0.75
    def idf(df: Long) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Long, df: Long, dl: Long) =
      idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Map(
      0L -> r6(term(2, 1, 3) + term(1, 2, 3)), // apple tf=2 df=1; banana tf=1 df=2
      1L -> r6(term(1, 2, 2)))                 // banana only; doc 2 matches nothing
    assert(out == expected, s"got $out expected $expected")
    val shuffled = TextAnalysis.bm25(docs.repartition(7), Seq("apple", "banana"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(shuffled == out)
  }

  test("fingerprint is whitespace/case invariant") {
    assert(
      one("Hello   World").getAs[String]("fingerprint") ==
        one("hello world").getAs[String]("fingerprint"))
  }

  test("rolling fingerprints produce one hash per window") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.rollingFingerprints(col("text"), 4).as("f")).head().getSeq[String](0)
    assert(fps.length == 2) // windows: a b c d, b c d e
    assert(fps.distinct.length == 2)
  }

  test("bigramLmScore matches the hand-computed Laplace bigram LM") {
    import spark.implicits._
    // corpus: "a b" ×3, "a c" ×1 → C(a b)=3, C(a c)=1, C(a ·)=4, V={b,c}=2
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(corpus, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sortBy(_._1)
    val pAB = math.log((3.0 + 1) / (4.0 + 2)) // (c2+1)/(c1+V)
    val pAC = math.log((1.0 + 1) / (4.0 + 2))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out == List(
      (1L, 1L, r6(pAB)), (2L, 1L, r6(pAB)), (3L, 1L, r6(pAB)), (4L, 1L, r6(pAC))), s"got $out")
  }

  test("bigramLmScore ranks an improbable shuffle below in-distribution text; unseen bigrams score lowest") {
    import spark.implicits._
    val corpus = (1L to 40L).map(i => (i, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val probes = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"), // in-distribution
      (102L, "dog lazy the over jumps fox brown quick the"), // reversed: unseen transitions
      (103L, "the quick brown cat sleeps under a red car")   // mostly-unseen words
    ).toDF("doc_id", "text")
    val s = TextAnalysis.bigramLmScore(corpus, probes)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(101L) > s(102L), s"in-distribution must beat shuffled: $s")
    assert(s(102L) >= s(103L) || s(101L) > s(103L), s"unseen-vocab text must rank low: $s")
    // docs shorter than 2 tokens have no bigram and are absent
    val short = TextAnalysis.bigramLmScore(corpus, Seq((9L, "word")).toDF("doc_id", "text"))
    assert(short.isEmpty)
  }

  test("chunk windows cover every token with the configured overlap") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "x y"), (3L, "  ")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, maxTokens = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3)))).toMap
    // 5 tokens, overlap 2 → ceil((5-2)/2) = 2 windows
    assert(out((1L, 0L)) === (("a b c d", 4L)))
    assert(out((1L, 1L)) === (("c d e", 3L)), "tail window is clamped, overlap carries c d")
    // short doc → exactly one chunk; blank doc → none
    assert(out((2L, 0L)) === (("x y", 2L)))
    assert(out.keys.map(_._1).toSet === Set(1L, 2L))
    // a doc that fits exactly emits one window, not a contained tail
    val exact = TextAnalysis.chunk(Seq((9L, "a b c d")).toDF("doc_id", "text"), maxTokens = 4, stride = 2)
    assert(exact.count() === 1L)
    intercept[IllegalArgumentException](TextAnalysis.chunk(df, maxTokens = 4, stride = 5))
  }

  test("redactPii counts and redacts emails, IPs and long digit runs") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b-c_1@foo-bar.co.uk now ip 192.168.0.1 card 4111111111111111 ok"),
      (2L, "no pii here just words and 12345678 short digits"),
      (3L, "two mails x@y.com z@w.org and host 10.0.0.7")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    val (e1, i1, n1, c1) = out(1L)
    assert((e1, i1, n1) === ((1L, 1L, 1L)))
    assert(c1 === "mail <EMAIL> now ip <IP> card <NUM> ok")
    val (e2, i2, n2, c2) = out(2L)
    assert((e2, i2, n2) === ((0L, 0L, 0L)), "8-digit runs are not long numbers")
    assert(c2 === "no pii here just words and 12345678 short digits")
    val (e3, i3, _, c3) = out(3L)
    assert((e3, i3) === ((2L, 1L)))
    assert(c3 === "two mails <EMAIL> <EMAIL> and host <IP>")
  }

  test("nfcNormalize: decomposed sequences compose; composed text is a fixpoint; codegen") {
    import spark.implicits._
    val decomposed = "Café naïve"
    val composed   = "Café naïve"
    val out = Seq((1L, decomposed), (2L, composed), (3L, "ascii only"), (4L, null))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.nfcNormalize(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == composed, "combining marks must compose")
    assert(out(2L) == composed, "already-composed input is a fixpoint")
    assert(out(3L) == "ascii only")
    assert(out(4L) == null, "null-safe")
    // the dedup motivation: both spellings now share one fingerprint
    val fps = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
      .select(TextAnalysis.fingerprint(TextAnalysis.nfcNormalize(col("t"))).as("fp"))
      .collect().map(_.getString(0)).distinct
    assert(fps.length == 1, "NFC-normalized spellings must hash identically")
  }

  test("compressionRatio: repetition compresses below prose, prose below noise; deterministic") {
    import spark.implicits._
    val rep   = "spam ham " * 200
    val prose = (1 to 50).map(i => s"sentence number $i differs every time").mkString(". ")
    // seeded Random: deterministic, and genuinely structure-free (a linear
    // congruence mod 93 has visible period structure deflate finds)
    val noise = new scala.util.Random(7).alphanumeric.take(400).mkString
    val out = Seq((1L, rep), (2L, prose), (3L, noise), (4L, null))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    assert(out(1L) < out(2L) && out(2L) < out(3L),
      s"ordering must be repetition < prose < noise, got $out")
    assert(out(1L) < 0.1 && out(3L) > 0.5)
    assert(out(4L) == -1.0, "null-safe")
    // partitioning cannot change a per-row projection
    val a = Seq.tabulate(40)(i => (i.toLong, prose + i)).toDF("id", "t")
    val r1 = a.select(TextAnalysis.compressionRatio(col("t"))).collect().map(_.getDouble(0)).sorted
    val r2 = a.repartition(7).select(TextAnalysis.compressionRatio(col("t"))).collect().map(_.getDouble(0)).sorted
    assert(r1.sameElements(r2))
  }

  test("stripMarkup: tags/entities to space, link labels kept, marks dropped, ws collapsed") {
    import spark.implicits._
    val out = Seq(
      (1L, "<div class=\"x\"><p>Hello <b>world</b></p></div>"),
      (2L, "See [the docs](http://example.com/a?b=c) now"),
      (3L, "# Title\n\nSome *bold* and _em_ and `code` text"),
      (4L, "A &amp; B &#39;quoted&#39; &lt;tag&gt;"),
      (5L, "plain text stays")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.stripMarkup(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "Hello world")
    assert(out(2L) === "See the docs now")
    assert(out(3L) === "Title Some bold and em and code text")
    // entities become WHITESPACE (no decoding): "&lt;tag&gt;" leaves "tag"
    assert(out(4L) === "A B quoted tag")
    assert(out(5L) === "plain text stays")
  }

  test("normalizeText strips controls, folds case, collapses whitespace") {
    import spark.implicits._
    val out = Seq(
      (1L, "  Hello\t\tWORLD  x\n\n done  "),
      (2L, "already clean"),
      (3L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "hello world x done")
    assert(out(2L) === "already clean")
    assert(out(3L) === "", "control-only input normalizes to empty")
  }

  test("topTokens returns the k most frequent tokens with deterministic ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a d d")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.topTokens(docs, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a:3, b:3 (tie → token order), d:2, c:1
    assert(top === Seq(("a", 3L), ("b", 3L), ("d", 2L)))
    intercept[IllegalArgumentException](TextAnalysis.topTokens(docs, k = 0))
  }

  test("readability: hand Flesch/FK values, sentence floor, wordless NULL, null text dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences, 6 vowel groups
      (2L, "no punctuation here"),       // sentence floor: 1
      (3L, ""),                          // wordless → NULL scores
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    val d1 = got(1L)
    assert(d1.getLong(1) == 6L && d1.getLong(2) == 2L && d1.getLong(3) == 6L)
    assert(math.abs(d1.getDouble(4) - (206.835 - 1.015 * 3 - 84.6 * 1)) < 1e-9) // 119.19
    assert(math.abs(d1.getDouble(5) - (0.39 * 3 + 11.8 - 15.59)) < 1e-9)
    assert(got(2L).getLong(2) == 1L) // floor
    assert(got(3L).getLong(1) == 0L && got(3L).isNullAt(4) && got(3L).isNullAt(5))
  }

  test("termLabelChi2: perfect discriminators score n, balanced terms 0, degenerates excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "the apple banana"), (2L, "x", "the apple cherry"),
      (3L, "y", "the dog banana"), (4L, "y", "the dog cherry")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.termLabelChi2(docs, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))).toMap
    // apple marks x exactly: a=2,b=0,c=0,d=2 → χ² = n = 4; dog marks y
    assert(got(("x", "apple")) == ((2L, 2L, 4.0, 1)))
    assert(got(("y", "dog")) == ((2L, 2L, 4.0, 1)))
    // balanced terms score 0; rank-2 tie broken by token (banana < cherry)
    assert(got(("x", "banana"))._3 == 0.0 && got(("x", "banana"))._4 == 2)
    // 'the' is in every doc → no signal → excluded entirely
    assert(!got.keySet.exists(_._2 == "the"))
    assert(got.size == 4) // topK=2 per label
    // a single-label corpus has no contrast to score
    val mono = docs.withColumn("lang", lit("x"))
    assert(TextAnalysis.termLabelChi2(mono).count() == 0L)
  }

  test("vocabulary: tf/df counts, normalization, minDf floor") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  The cat  sat on the MAT "),
      (2L, "the dog"),
      (3L, "cat cat")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(v("the") === ((3L, 2L)), "tf counts every occurrence, df distinct docs")
    assert(v("cat") === ((3L, 2L)))
    assert(v("dog") === ((1L, 1L)))
    assert(v("mat") === ((1L, 1L)), "tokens are lowercased")
    assert(!v.contains(""), "whitespace runs produce no empty token")
    // minDf keeps only tokens seen in >= 2 documents
    val floored = TextAnalysis.vocabulary(docs, minDf = 2L)
      .collect().map(_.getString(0)).toSet
    assert(floored === Set("the", "cat"))
  }

  test("hashedNgramScoreWith(derived weights) ≡ hashedNgramScore; truncated table zero-fills") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow")
    ).toDF("doc_id", "text")
    val full = TextAnalysis.hashedNgramScore(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val served = TextAnalysis.hashedNgramScoreWith(
        docs, TextAnalysis.derivedNgramWeights(docs))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(served == full, "served derived table must equal the inline rule exactly")
    // the weight probe must broadcast
    val plan = TextAnalysis.hashedNgramScoreWith(docs, TextAnalysis.derivedNgramWeights(docs))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weights must broadcast:\n$plan")
    // a truncated model: missing buckets score 0 but still count as
    // features — an empty table yields logit 0, score 0.5, same n_features
    val empty = TextAnalysis.derivedNgramWeights(docs).limit(0)
    val zeroed = TextAnalysis.hashedNgramScoreWith(docs, empty)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    zeroed.foreach { case (id, nf, logit, score) =>
      assert(nf == full(id).head.asInstanceOf[Long], s"doc $id n_features")
      assert(logit == 0.0 && score == 0.5, s"doc $id: $logit/$score")
    }
  }

  test("vocabularyCoverage: per-doc OOV against the top-N vocab; empty docs report zeros") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog barked"),
      (3L, "zyzzyva qwerty"),
      (4L, "   ")
    ).toDF("doc_id", "text")
    // top-2 by tf (ties by token): "the" tf=3, then "cat"/"dog"/... tf=1 -> "barked" wins the tie
    val got = TextAnalysis.vocabularyCoverage(docs, TextAnalysis.vocabulary(docs), topN = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((6L, 4L, 0.666667)), s"got $got")   // the,the in-vocab; cat,sat,on,mat OOV
    assert(got(2L) == ((3L, 1L, 0.333333)), s"got $got")   // the,barked in; dog OOV
    assert(got(3L) == ((2L, 2L, 1.0)), s"got $got")        // fully OOV
    assert(got(4L) == ((0L, 0L, 0.0)), s"got $got")        // no tokens at all
    // a bigger N only shrinks OOV (coverage is monotone in N)
    val wide = TextAnalysis.vocabularyCoverage(docs, TextAnalysis.vocabulary(docs), topN = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(wide.values.forall(_ == 0L), s"every corpus token is in its own full vocab: $wide")
    // the membership probe must broadcast (no shuffle on the token stream join)
    val plan = TextAnalysis.vocabularyCoverage(docs, TextAnalysis.vocabulary(docs), topN = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"top-N probe must broadcast:\n$plan")
  }

  test("weightedCosinePairs: hand-computed cosine; no-overlap docs produce no pair") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.weightedCosinePairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // w(d1)=(a:2/2, b:1/2), w(d2)=(a:1/2, b:1/2) → dot .75, n1 1.25, n2 .5
    val exp = BigDecimal(0.75 / (math.sqrt(1.25) * math.sqrt(0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 2L, exp)))
  }

  test("weightedCosinePairs: df cap drops hot terms from the join AND the norms") {
    import spark.implicits._
    val docs = Seq((1L, "h a a b"), (2L, "h a b"), (3L, "h z z")).toDF("doc_id", "text")
    // uncapped: h (df 3) links all three docs
    val all = TextAnalysis.weightedCosinePairs(docs, threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // cap 2 removes h everywhere: the (d1,d2) cosine must equal the corpus
    // WITHOUT h — not just lose the h pairs
    val capped = TextAnalysis.weightedCosinePairs(docs, threshold = 0.01, maxDocFreq = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exp = BigDecimal(0.75 / (math.sqrt(1.25) * math.sqrt(0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(capped == Seq((1L, 2L, exp)))
    graft.Caches.clear()
  }

  test("weightedCosinePairs: identical docs score 1; df=1 terms weigh into norms") {
    import spark.implicits._
    val same = Seq((1L, "p q"), (2L, "p q")).toDF("doc_id", "text")
    val one = TextAnalysis.weightedCosinePairs(same, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(one == Seq((1L, 2L, 1.0)))
    // a df=1 token inflates its doc's norm and LOWERS the cosine, even
    // though it can never produce a candidate pair itself
    val rare = Seq((1L, "p q r"), (2L, "p q")).toDF("doc_id", "text")
    val c = TextAnalysis.weightedCosinePairs(rare, threshold = 0.1)
      .collect().map(r => r.getDouble(2)).head
    assert(c < 1.0)
    graft.Caches.clear()
  }

  test("dupNgramCoverage: hand positions, no-repeat zero, short-doc no grams") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c d"),   // "a b c" repeats at 0 and 3 → covers pos 0..5
      (2L, "x y z"),           // no repeated 3-gram
      (3L, "hello")            // too short for any 3-gram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramCoverage(df, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((7L, 6L, r6(6.0 / 7.0)))) // 1-char tokens: frac = 6/7
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(got(3L) == ((1L, 0L, 0.0)))
    graft.Caches.clear()
  }

  test("codeScore: exact signal counts; code flags, prose doesn't") {
    import spark.implicits._
    val df = Seq(
      (1L, "def f() { return 1; }"),
      (2L, "plain words only here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.codeScore(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // symbols: ( ) { ; } = 5; keywords: def, return = 2; len = 21
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((5L, 2L, r6(16.0 / 21.0), true)))
    assert(got(2L) == ((0L, 0L, 0.0, false)))
  }

  test("tokenEntropy: hand-computed H and normalized H; degenerate vocab → NULL norm") {
    import spark.implicits._
    val docs = Seq(("X", "a a b"), ("X", "b c"), ("Y", "z z z")).toDF("lang", "text")
    val got = TextAnalysis.tokenEntropy(docs, keys = Seq("lang"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    // X: counts a=2 b=2 c=1, n=5 → H = ln5 − (2ln2 + 2ln2 + 0)/5
    val hx = math.log(5.0) - (2.0 * math.log(2.0) * 2.0) / 5.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("X") == ((5L, 3L, r6(hx), r6(hx / math.log(3.0)))))
    // Y: one distinct token → H = 0 (up to the decimal-term rounding, which
    // may surface as -0.0 — boxed Double equality distinguishes the two),
    // normalized H undefined
    val y = got("Y")
    assert(y._1 == 3L && y._2 == 1L && math.abs(y._3) == 0.0 && y._4 == null)
  }
}

class VectorOpsSpec extends SparkSpec {

  test("native cosine/dot match the HOF formulation bit-for-bit") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(50)(i => (i.toLong, Seq.fill(16)(rng.nextDouble() * 2 - 1)))
    val df = rows.toDF("id", "v").selectExpr("id", "v as a", "reverse(v) as b")
    val cmp = df.select(
      VectorOps.cosine(col("a"), col("b")).as("native"),
      VectorOps.cosineHof(col("a"), col("b")).as("hof"),
      VectorOps.dot(col("a"), col("b")).as("ndot"),
      VectorOps.dotHof(col("a"), col("b")).as("hdot"))
    cmp.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "cosine mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "dot mismatch")
    }
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0), Seq(0.0, 0.0, 1.0), Seq(0.0, 1.0, 0.0)))
      .toDF("a", "b", "c", "d")
    val r = df.select(VectorOps.cosine(col("a"), col("b")), VectorOps.cosine(col("c"), col("d"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }
}

class SimilaritySearchSpec extends SparkSpec {

  test("IVF save/load roundtrip: identical query results, cell-pruned scan, k mismatch fails") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0L until 200L)
      .map(i => (i, Seq.fill(8)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "embedding")
    val ivf = SimilaritySearch.IvfIndex(k = 4, nprobe = 2, seed = 42L)
    val (indexed, centroids) = ivf.index(df)
    val dir = tempDir("ivf") + "/index"
    ivf.save(indexed, centroids, dir)
    val (loaded, loadedCentroids) = ivf.load(spark, dir)
    assert(loadedCentroids.map(_.toSeq).toSeq === centroids.map(_.toSeq).toSeq,
      "centroid text roundtrip must be exact")
    val q = Seq.fill(8)(0.3)
    val a = ivf.query(indexed, centroids, q, topK = 5).collect().map(_.getLong(0)).toSeq
    val b = ivf.query(loaded, loadedCentroids, q, topK = 5).collect().map(_.getLong(0)).toSeq
    assert(a === b, "served results must match the in-memory index")
    // the cell restriction must prune at the directory level on the loaded index
    val plan = ivf.query(loaded, loadedCentroids, q, topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition pruning in:\n$plan")
    // geometry mismatch fails fast
    intercept[IllegalArgumentException](
      SimilaritySearch.IvfIndex(k = 8).load(spark, dir))
    // re-save over an existing index is an atomic replace, not a merge
    ivf.save(indexed, centroids, dir)
    val (reloaded, _) = ivf.load(spark, dir)
    assert(reloaded.count() === 200L, "replaced index must not accumulate old cells")
    // a crashed save (leftover scratch, target untouched) must not corrupt
    // the live index, and the next save heals the debris
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = graft.io.AtomicSwap.scratch(new org.apache.hadoop.fs.Path(dir))
    fs.mkdirs(new org.apache.hadoop.fs.Path(scratch, "cells"))
    val (afterCrash, cs) = ivf.load(spark, dir)
    assert(afterCrash.count() === 200L, "live index unaffected by crash debris")
    ivf.save(indexed, cs, dir)
    assert(!fs.exists(scratch), "save heals the crashed attempt's scratch")
    assert(ivf.load(spark, dir)._1.count() === 200L)
  }

  test("knnJoin: agrees with the window formulation, bounded-shuffle plan, deterministic ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(400)(i => (i.toLong, Seq.fill(8)(rnd.nextDouble() - 0.5)))
    val corpus  = rows.toDF("vec_id", "embedding").repartition(7)
    val queries = rows.take(6).toDF("vec_id", "embedding")

    val viaAgg = SimilaritySearch.knnJoin(queries, corpus, k = 10)
    val got = viaAgg.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // reference: full scoring + window row_number, identical tie rule
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    val ref = corpus.crossJoin(q)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorOps.cosine(col("embedding").cast("array<double>"),
          col("_qv").cast("array<double>")), 6).as("score"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === ref)
    // self-match ranks first at score 1.0
    assert(got((0L, 1))._1 === 0L && got((0L, 1))._2 === 1.0)
    // k larger than the corpus returns the whole corpus, ranked
    val all = SimilaritySearch.knnJoin(queries.limit(1), corpus.limit(20), k = 50)
    assert(all.count() === 20L)
    // the aggregate runs in two phases (partial map-side heap + final) —
    // the shuffle carries bounded buffers, not the scored cross product
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, s"expected 2-phase agg:\n$plan")
    assert(!plan.contains("Window"), "knnJoin must not fall back to a window sort")
  }

  test("retrievalMetrics: hand case, graded ideal, no-truth queries dropped") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d2 = math.log(2.0) / math.log(3.0) // log2 discount at rank 2
    val results = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 20L, 3), // the rank-3 hit is past k=2
      (2L, 7L, 1), (2L, 40L, 2),
      (3L, 10L, 1),                             // no truth → dropped
      (4L, 8L, 1), (4L, 9L, 2)                  // all misses
    ).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 40L), (4L, 50L))
      .toDF("query_id", "doc_id")
    val out = SimilaritySearch.retrievalMetrics(results, truth, k = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 4L))
    val q1 = out(1L)
    assert(q1.getLong(1) == 3L && q1.getLong(2) == 1L)
    assert(q1.getDouble(3) == r6(1.0 / 3))          // recall: 1 of 3 relevant
    assert(q1.getDouble(4) == 1.0)                  // rr: hit at rank 1
    assert(q1.getDouble(5) == r6(1.0 / (1.0 + d2))) // dcg=1, idcg=1+d2
    val q2 = out(2L)
    assert(q2.getDouble(3) == 1.0 && q2.getDouble(4) == 0.5 && q2.getDouble(5) == r6(d2))
    val q4 = out(4L)
    assert(q4.getLong(2) == 0L && q4.getDouble(3) == 0.0 &&
      q4.getDouble(4) == 0.0 && q4.getDouble(5) == 0.0)
    // graded judgments: the ideal ranking puts the grade-3 doc first
    val gres = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val gtruth = Seq((1L, 10L, 1.0), (1L, 20L, 3.0)).toDF("query_id", "doc_id", "g")
    val g = SimilaritySearch.retrievalMetrics(gres, gtruth, k = 2, gradeCol = Some("g"))
      .collect().head
    assert(g.getDouble(5) == r6((1.0 + 3.0 * d2) / (3.0 + d2)))
  }

  test("averagePrecision: per-hit precision fold; order sensitivity; zero-hit and cut ranks") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val results = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 20L, 3), // hits at ranks 1 and 3
      (2L, 99L, 1), (2L, 40L, 2),               // hit only at rank 2
      (4L, 8L, 1), (4L, 9L, 2)                  // all misses
    ).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 31L),
      (2L, 40L), (4L, 50L)).toDF("query_id", "doc_id")
    val out = SimilaritySearch.averagePrecision(results, truth, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // q1: P@1=1, P@3=2/3 → AP = (1 + 2/3)/min(4,3)
    assert(out(1L) == ((4L, 2L, r6((1.0 + 2.0 / 3) / 3))))
    // q2: single hit at rank 2 → AP = (1/2)/min(1,3) = 0.5
    assert(out(2L) == ((1L, 1L, 0.5)))
    assert(out(4L) == ((1L, 0L, 0.0)))
    // order sensitivity: the same hit set at better ranks scores higher
    val better = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 99L, 3))
      .toDF("query_id", "doc_id", "rank")
    val ap2 = SimilaritySearch.averagePrecision(better, truth, k = 3)
      .where(col("query_id") === 1).collect().head.getDouble(3)
    assert(ap2 == r6(2.0 / 3) && ap2 > out(1L)._3)
    // the rank-cut: a hit past k contributes nothing
    val cut = SimilaritySearch.averagePrecision(results, truth, k = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cut(1L) == 0.5) // only the rank-1 hit counts: 1/min(4,2)
  }

  test("randomProjection: deterministic under repartition, map-side, JL norm preservation") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val df = (0L until 200L).map(i => (i, Seq.fill(64)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    val p = SimilaritySearch.randomProjection(df, outDim = 16, inDim = 64)
    val a = p.select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.values.forall(_.size == 16))
    val b = SimilaritySearch.randomProjection(df.repartition(7), outDim = 16, inDim = 64)
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b, "the matrix is a pure function of the hash family — layout must not matter")
    // JL contract: squared norms preserved in expectation (uniform entries
    // scaled by sqrt(3/outDim)); mean ratio over 200 vectors concentrates
    val orig = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => x * x).sum).toMap
    val ratios = a.map { case (id, v) => v.map(x => x * x).sum / orig(id) }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean squared-norm ratio drifted: $mean")
    // pure projection: no shuffle anywhere in the plan
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must be map-side only:\n$plan")
  }

  test("IVF incremental assignment: appended vectors join existing cells and are served") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val all = (0L until 300L).map(i => (i, Seq.fill(8)(rnd.nextDouble() - 0.5)))
    val base  = all.take(250).toDF("vec_id", "embedding")
    val batch = all.drop(250).toDF("vec_id", "embedding")

    val ivf = SimilaritySearch.IvfIndex(k = 4, nprobe = 2, seed = 42L)
    val (indexed, centroids) = ivf.index(base)
    val dir = tempDir("ivf-inc") + "/index"
    ivf.save(indexed, centroids, dir)

    // assign() with no refit reproduces the build-time KMeans cell for
    // every already-indexed vector
    val reassigned = ivf.assign(base, centroids)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val stored = indexed.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(reassigned === stored, "assign must agree with the KMeans build assignment")

    // append the new batch; the loaded store now serves old ∪ new
    ivf.append(spark, dir, batch)
    val (loaded, loadedCentroids) = ivf.load(spark, dir)
    assert(loaded.count() === 300L)

    // querying WITH an appended vector's own embedding returns it first
    // (its cell is by construction the query's nearest centroid)
    val probe = all(299)._2
    val top = ivf.query(loaded, loadedCentroids, probe, topK = 3).collect()
    assert(top.head.getLong(0) === 299L, s"appended vector must be served: ${top.toSeq}")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)

    // scores over the merged store agree with brute force on the union
    val brute = SimilaritySearch.bruteForceTopK(all.toDF("vec_id", "embedding"), probe, k = 300)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.query(loaded, loadedCentroids, probe, topK = 10).collect()
      .foreach(r => assert(r.getDouble(1) == brute(r.getLong(0))))

    // appending to a mismatched-geometry handle fails fast (load validates)
    intercept[IllegalArgumentException](
      SimilaritySearch.IvfIndex(k = 8).append(spark, dir, batch))
  }

  test("IVF compact: micro-append file bloat collapses; rows, model and query results identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val all = (0L until 240L).map(i => (i, Seq.fill(8)(rnd.nextDouble() - 0.5)))
    val ivf = SimilaritySearch.IvfIndex(k = 4, nprobe = 4, seed = 42L)
    val (indexed, centroids) = ivf.index(all.take(120).toDF("vec_id", "embedding"))
    val dir = tempDir("ivf-compact") + "/index"
    ivf.save(indexed, centroids, dir)
    // 12 micro-appends: every one adds files to its touched cells
    (120 until 240 by 10).foreach { s =>
      ivf.append(spark, dir, all.slice(s, s + 10).toDF("vec_id", "embedding"))
    }
    def parquetFiles: Int = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.isDirectory)
      .map(_.listFiles().count(f => f.getName.endsWith(".parquet"))).sum
    val before = parquetFiles
    val (l0, c0) = ivf.load(spark, dir)
    val rows0 = l0.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probe = all(5)._2
    val q0 = ivf.query(l0, c0, probe, topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    ivf.compact(spark, dir)
    val after = parquetFiles
    assert(after < before, s"compaction must reduce file count: $before -> $after")
    assert(after <= 2 * 4, s"~one file per cell expected after compact, got $after")
    val (l1, c1) = ivf.load(spark, dir)
    assert(l1.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap == rows0,
      "compaction must preserve every row and its cell")
    assert(c1.flatten.toSeq == c0.flatten.toSeq, "compaction never refits centroids")
    assert(ivf.query(l1, c1, probe, topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == q0)
  }

  test("centroidOutliers flags vectors far from their own label centroid only") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Seq(1.0f, 0.0f)),   // aligned with a's centroid
      (2L, "a", Seq(1.0f, 0.1f)),   // aligned
      (3L, "a", Seq(-1.0f, 0.0f)),  // anti-aligned → outlier
      (4L, "b", Seq(-1.0f, 0.0f))   // b's centroid IS itself → inlier
    ).toDF("vec_id", "label", "embedding")
    val out = VectorOps.centroidOutliers(df, VectorOps.labelCentroids(df), tau = 0.0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(!out(1L)._2 && !out(2L)._2, s"aligned vectors are inliers: $out")
    assert(out(3L)._2, s"anti-aligned vector must flag: $out")
    assert(!out(4L)._2, "outlier-ness is relative to the OWN label's centroid")
    assert(out(4L)._1 === 1.0)
  }

  test("centroidMargin: clean classes get positive margins; a mislabel counts confused") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Seq(1.0f, 0.0f)),
      (2L, "a", Seq(1.0f, 0.1f)),
      (3L, "b", Seq(0.0f, 1.0f)),
      (4L, "b", Seq(0.1f, 1.0f)),
      (5L, "a", Seq(0.0f, 1.0f))  // labeled a, sits on b's axis → negative margin
    ).toDF("vec_id", "label", "embedding")
    val out = VectorOps.centroidMargin(df, VectorOps.labelCentroids(df))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out("b")._1 == 2L && out("b")._3 == 0L && out("b")._2 > 0.0,
      s"clean class b separates: $out")
    assert(out("a")._1 == 3L && out("a")._3 == 1L,
      s"exactly the mislabeled point confuses: $out")
  }

  test("labelCentroids: per-(label, dim) means, exploded shape, counts") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)),
      ("a", Seq(3.0f, 6.0f)),
      ("b", Seq(10.0f, 20.0f))
    ).toDF("label", "embedding")
    val out = VectorOps.labelCentroids(df)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(out == Map(
      ("a", 0) -> (2.0, 2L), ("a", 1) -> (4.0, 2L),
      ("b", 0) -> (10.0, 1L), ("b", 1) -> (20.0, 1L)), s"got $out")
  }

  test("nearestCentroid assigns the closest class mean, deterministically on ties") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Seq(1.0f, 0.0f)),
      (2L, "a", Seq(1.0f, 0.2f)),
      (3L, "b", Seq(0.0f, 1.0f)),
      (4L, "b", Seq(0.2f, 1.0f)),
      (5L, "a", Seq(0.1f, 1.0f)) // mislabeled: closest to b's mean
    ).toDF("vec_id", "label", "embedding")
    val out = VectorOps.nearestCentroid(df, VectorOps.labelCentroids(df))
      .select("vec_id", "pred_label")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a" && out(2L) == "a" && out(3L) == "b" && out(4L) == "b")
    assert(out(5L) == "b", s"mislabeled vector must be pulled to the nearer mean: $out")
  }

  test("bruteForceTopK returns the nearest vectors in score order") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = SimilaritySearch.bruteForceTopK(df, Seq(1.0, 0.0), k = 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(top.head.getDouble(1) == 1.0)
  }

  test("LSH query returns a subset of brute-force candidates with same scoring") {
    import spark.implicits._
    val rng  = new scala.util.Random(11)
    val rows = Seq.tabulate(200)(i => (i.toLong, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
    val df   = rows.toDF("vec_id", "embedding")
    val q    = Seq.fill(8)(rng.nextDouble() * 2 - 1)
    val lsh  = SimilaritySearch.RandomHyperplaneLsh(bits = 3, dim = 8)
    val idx  = lsh.index(df)
    assert(idx.select(countDistinct(col("lsh_bucket"))).head().getLong(0) > 1)
    val got = lsh.query(idx, q, k = 5).collect()
    assert(got.nonEmpty && got.length <= 5)
    // scores must agree with the brute-force scorer for the same ids
    val brute = SimilaritySearch.bruteForceTopK(df, q, k = 200).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach(r => assert(r.getDouble(1) == brute(r.getLong(0))))
  }

  test("int8 scalar quantization: bounded error, cosine preserved, zero-safe") {
    import spark.implicits._
    val rng  = new scala.util.Random(17)
    val rows = Seq.tabulate(100)(i => (i.toLong, Seq.fill(16)(rng.nextDouble() * 4 - 2))) :+
      (100L, Seq.fill(16)(0.0)) // zero vector must not produce NaN
    val df = rows.toDF("vec_id", "embedding")
    val q  = SimilaritySearch.ScalarQuant.quantize(df)

    val checked = q.select(
      col("vec_id"),
      col("embedding"),
      SimilaritySearch.ScalarQuant.dequantize(col("qvec"), col("qscale")).as("deq"),
      col("qscale"),
      VectorOps.cosine(col("embedding"), col("qvec").cast("array<double>")).as("cos_q"))
      .collect()
    checked.foreach { r =>
      val orig = r.getSeq[Double](1); val deq = r.getSeq[Double](2); val scale = r.getDouble(3)
      // symmetric round-to-nearest: per-element error <= scale/2
      orig.zip(deq).foreach { case (o, d) => assert(math.abs(o - d) <= scale / 2 + 1e-12) }
      if (r.getLong(0) == 100L) assert(scale == 0.0 && deq.forall(_ == 0.0)) // zero vector stays zero
      // cosine against the raw int8 vector stays ~1 (scale invariance)
      else assert(r.getDouble(4) > 0.999, s"cosine degraded: ${r.getDouble(4)}")
    }
    // quantized top-k recovers the exact top-k on well-separated data
    val exact = SimilaritySearch.bruteForceTopK(df, Seq.fill(16)(1.0), k = 5)
      .collect().map(_.getLong(0)).toSet
    val quant = SimilaritySearch.bruteForceTopK(q, Seq.fill(16)(1.0), k = 5, vecCol = "qvec")
      .collect().map(_.getLong(0)).toSet
    assert((exact & quant).size >= 4)
  }

  test("goodTuring: textbook count-of-counts table; top frequency has no r_star") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq("a a a b b c").toDF("text")
    val got = TextAnalysis.goodTuring(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((1L, 2.0, r6(1.0 / 6)))) // r*=2·N2/N1; unseen mass = N1/N = 1/6
    assert(got(2L) == ((1L, 3.0, r6(2.0 / 6))))
    assert(got(3L)._1 == 1L && got(3L)._2.isNaN && got(3L)._3 == 0.5)
  }

  test("lexicalRichness: hand card on the goodTuring corpus") {
    import spark.implicits._
    // "a a a b b c": N=6, V=3, Σf²V_f = 14 → K = 10⁴·8/36; V₂/V = 1/3
    val docs = Seq("a a a b b c").toDF("text")
    val r = TextAnalysis.lexicalRichness(docs).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2222.222222)
    assert(r.getDouble(3) == 0.613147)
    assert(r.getDouble(4) == 1.224745)
    assert(r.getDouble(5) == 0.333333)
    // all-hapax corpus: K = 10⁴(V−N)/N² = 0, no dis-legomena
    val hapax = Seq("x y z").toDF("text")
    val h = TextAnalysis.lexicalRichness(hapax).collect().head
    assert(h.getDouble(2) == 0.0 && h.getDouble(5) == 0.0)
  }

  test("heapsCurve: nested fractions grow monotonically; the last step is the full corpus") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"w$i w${i % 7} common")).toDF("doc_id", "text")
    val got = TextAnalysis.heapsCurve(docs, steps = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.length == 10)
    got.sliding(2).foreach { case Array((_, d1, v1), (_, d2, v2)) =>
      assert(d1 <= d2 && v1 <= v2)
    }
    // step 10 sees every document and therefore the full vocabulary
    assert(got.last._2 == 60L)
    val fullVocab = docs.select(explode(split(lower(trim(col("text"))), "\\s+")))
      .distinct().count()
    assert(got.last._3 == fullVocab)
    graft.Caches.clear()
  }

  test("mmrDiversify: near-dup of pick 1 demoted; lambda=1 degrades to plain top-k") {
    import spark.implicits._
    // query along e1; ids 1,2 nearly identical high-relevance near-dups;
    // id 3 moderately relevant but orthogonal to them in the tail dims
    val rows = Seq(
      (1L, Seq(1.0, 0.10, 0.0)),
      (2L, Seq(1.0, 0.11, 0.0)),
      (3L, Seq(0.8, 0.0, 0.6)),
      (4L, Seq(0.1, 1.0, 0.0)))
    val df = rows.toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0, 0.0)
    val mmr = SimilaritySearch.mmrDiversify(df, q, k = 3, poolSize = 4, lambda = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(mmr(0) == ((1, 1L))) // the relevance argmax opens
    assert(mmr(1)._2 == 3L) // the near-dup 2 is demoted below the diverse 3
    val plain = SimilaritySearch.mmrDiversify(df, q, k = 3, poolSize = 4, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    val topk = SimilaritySearch.bruteForceTopK(df, q, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(plain == topk)
  }

  test("rrfFuse: consensus docs beat single-system winners; hand RRF arithmetic") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 10 is rank 2 in BOTH systems; 1 and 2 top one system each
    val sysA = Seq((1L, 1), (10L, 2), (3L, 3)).toDF("doc_id", "rank")
    val sysB = Seq((2L, 1), (10L, 2), (4L, 3)).toDF("doc_id", "rank")
    val got = SimilaritySearch.rrfFuse(Seq(sysA, sysB), k = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.head._1 == 10L && got.head._2 == 2L)
    assert(got.head._3 == r6(1.0 / 62 + 1.0 / 62))
    val single = got.find(_._1 == 1L).get
    assert(single._2 == 1L && single._3 == r6(1.0 / 61))
    // rank-1-in-one-system loses to rank-2-in-both: 2/62 > 1/61
    assert(got.head._3 > single._3)
    // topKRanking: the cut + rank agrees with a global row_number
    val scoredDf = (1L to 20L).map(i => (i, (i % 5).toDouble)).toDF("id", "s")
    val ranked = SimilaritySearch.topKRanking(scoredDf, col("s"), col("id"), topK = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // order: s desc, id asc → 4,9,14,19 (s=4) then 3,8 (s=3)
    assert(ranked == Map(4L -> 1, 9L -> 2, 14L -> 3, 19L -> 4, 3L -> 5, 8L -> 6))
  }
}

class GramMatrixSpec extends SparkSpec {

  test("gramMatrix: hand-computed on a tiny corpus; partitioning-invariant") {
    import spark.implicits._
    // rows (1,2,3) and (4,5,6): sum_prod(i,j) = v1[i]v1[j] + v2[i]v2[j]
    val df = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)).toDF("embedding")
    val got = SimilaritySearch.gramMatrix(df, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val expect = Map(
      (0L, 0L) -> ((2L, 17.0)), (0L, 1L) -> ((2L, 22.0)), (0L, 2L) -> ((2L, 27.0)),
      (1L, 1L) -> ((2L, 29.0)), (1L, 2L) -> ((2L, 36.0)), (2L, 2L) -> ((2L, 45.0)))
    assert(got == expect, s"got $got")
    // upper triangle only: d(d+1)/2 rows, i <= j
    assert(got.keySet.forall { case (i, j) => i <= j })
    // partials merge exactly: any batch split reproduces the one-shot matrix
    val whole = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)), (2L, Seq(5.0, 6.0)),
      (3L, Seq(7.0, 8.0))).toDF("id", "embedding")
    val oneShot = SimilaritySearch.gramMatrix(whole, dim = 2).collect().map(_.toSeq).toSet
    val merged = SimilaritySearch.gramFromPartials(
        SimilaritySearch.gramPartials(whole.where(col("id") % 2 === 0), dim = 2)
          .union(SimilaritySearch.gramPartials(whole.where(col("id") % 2 === 1), dim = 2)))
      .collect().map(_.toSeq).toSet
    assert(merged == oneShot, "batch-split gram partials must merge to the one-shot matrix")
    // decimal sums: identical under any partitioning (a double fold would not be)
    val big = (1 to 500).map(k => Seq.tabulate(8)(d => math.sin(k * 7 + d) * 3)).toDF("embedding")
    val a = SimilaritySearch.gramMatrix(big, dim = 8).collect().map(_.toSeq).toSet
    val b = SimilaritySearch.gramMatrix(big.repartition(17), dim = 8).collect().map(_.toSeq).toSet
    assert(a == b, "gram sums must not depend on input partitioning")
  }
}

class CorrelationMatrixSpec extends SparkSpec {

  test("correlationMatrix: diagonal exactly 1, anti/un-correlated planted pairs, constant dim NULL") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // dim0 = x, dim1 = -x (corr -1), dim2 independent, dim3 constant
    val df = (1 to 500).map { _ =>
      val x = rnd.nextGaussian(); Seq(x, -x, rnd.nextGaussian(), 7.0)
    }.toDF("embedding")
    val got = SimilaritySearch.correlationMatrix(df, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size == 10, "upper triangle of 4x4")
    for (i <- 0L to 2L) assert(got((i, i)) == Some(1.0), s"diag $i: ${got((i, i))}")
    assert(got((0L, 1L)) == Some(-1.0), s"planted anti-correlation: ${got((0L, 1L))}")
    assert(math.abs(got((0L, 2L)).get) < 0.15, "independent dims near 0")
    for (i <- 0L to 3L) assert(got((math.min(i, 3L), 3L)).isEmpty || i == 3L && got((3L, 3L)).isEmpty,
      s"constant dim must NULL out: ${got.filter(_._1._2 == 3L)}")
    // partition-invariant (decimal moments)
    val a = SimilaritySearch.correlationMatrix(df, dim = 4).collect().map(_.toSeq).toSet
    val b = SimilaritySearch.correlationMatrix(df.repartition(13), dim = 4).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}

class PcaSpec extends SparkSpec {

  test("fitPca recovers planted principal axes; components orthonormal; partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // planted structure in 6-d: big variance along e0+e1, medium along e2,
    // tiny noise elsewhere; mean offset exercises centering
    val rows = (1 to 2000).map { _ =>
      val a = rnd.nextGaussian() * 10; val b = rnd.nextGaussian() * 3
      Seq(3.0 + a / math.sqrt(2), -1.0 + a / math.sqrt(2), b,
        rnd.nextGaussian() * 0.01, rnd.nextGaussian() * 0.01, rnd.nextGaussian() * 0.01)
    }
    val df = rows.toDF("embedding")
    val m = SimilaritySearch.fitPca(df, dim = 6, k = 2)
    // PC1 ≈ (1/√2, 1/√2, 0, …), PC2 ≈ e2
    assert(math.abs(math.abs(m.components(0)(0)) - 1 / math.sqrt(2)) < 0.02, m.components(0).toSeq)
    assert(math.abs(math.abs(m.components(0)(1)) - 1 / math.sqrt(2)) < 0.02)
    assert(math.abs(math.abs(m.components(1)(2)) - 1.0) < 0.02, m.components(1).toSeq)
    // eigenvalues descending, ≈ planted variances (100 and 9)
    assert(m.explained(0) > m.explained(1) && m.explained(0) > 80 && m.explained(1) > 6)
    assert(m.explainedRatio > 0.99, s"two planted axes carry ~all variance: ${m.explainedRatio}")
    // orthonormal components
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(1), m.components(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
    // the fitted model is IDENTICAL under repartitioning (decimal moments)
    val m2 = SimilaritySearch.fitPca(df.repartition(17), dim = 6, k = 2)
    assert(m.mean.toSeq == m2.mean.toSeq && m.explained.toSeq == m2.explained.toSeq)
    assert(m.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
  }

  test("pcaProject: projected coordinates are the centered dots; map-side only") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 8.0), Seq(0.0, 0.0, 1.0))
      .toDF("embedding")
    val m = SimilaritySearch.fitPca(df, dim = 3, k = 2)
    val out = SimilaritySearch.pcaProject(df, m)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    val got = out.collect().map(r =>
      (r.getSeq[Double](0), r.getSeq[Double](1)))
    got.foreach { case (v, p) =>
      m.components.zipWithIndex.foreach { case (e, i) =>
        val expect = v.zip(e).map { case (x, w) => x * w }.sum -
          m.mean.zip(e).map { case (x, w) => x * w }.sum
        assert(math.abs(p(i) - expect) < 1e-9, s"v=$v comp=$i")
      }
    }
    // whitened coordinates have unit population variance per component
    val w = SimilaritySearch.pcaProject(df, m, whiten = true)
      .select(org.apache.spark.sql.functions.posexplode(org.apache.spark.sql.functions.col("pca")).as(Seq("i", "x")))
      .groupBy("i")
      .agg((org.apache.spark.sql.functions.avg(org.apache.spark.sql.functions.col("x") * org.apache.spark.sql.functions.col("x"))
        - org.apache.spark.sql.functions.avg(org.apache.spark.sql.functions.col("x"))
          * org.apache.spark.sql.functions.avg(org.apache.spark.sql.functions.col("x"))).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    w.values.foreach(v => assert(math.abs(v - 1.0) < 1e-6, s"whitened variance $v"))

    // the residual of Cv = λv is tiny for every returned component (the
    // q116 gate's contract, checked here at full precision)
    val vecs = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 6.0, 8.0), Seq(0.0, 0.0, 1.0))
    val n = vecs.length.toDouble
    val mu = (0 until 3).map(i => vecs.map(_(i)).sum / n)
    def cov(i: Int, j: Int) = vecs.map(v => v(i) * v(j)).sum / n - mu(i) * mu(j)
    m.components.zip(m.explained).foreach { case (e, lambda) =>
      val cv = (0 until 3).map(i => (0 until 3).map(j => cov(i, j) * e(j)).sum)
      val resid = math.sqrt((0 until 3).map(i => math.pow(cv(i) - lambda * e(i), 2)).sum)
      assert(resid < 1e-6, s"eigen residual $resid")
    }
  }
}

class MultimodalSpec extends SparkSpec {

  test("decodeMeta emits typed metadata per row, dropping the payload") {
    import spark.implicits._
    val df  = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.decodeMeta(df, "payload")
    assert(out.columns.toSeq == Seq("doc_id", "byte_len", "format", "width", "height"))
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == 3)
    assert(byId(1L).getInt(3) == 64 + 3 % 640)
    assert(byId(2L).getString(2) == "empty")
  }

  test("decodeMeta keeps payload when asked and respects parallelism") {
    import spark.implicits._
    val df = Seq((1L, "xy")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.decodeMeta(df, "payload", keepPayload = true, parallelism = 2)
    assert(out.columns.contains("payload"))
    assert(out.rdd.getNumPartitions == 2)
  }

  test("sampleFrames explodes every-nth frame indices") {
    import spark.implicits._
    // 4000 bytes → 3 frames (0,1,2) → sampled every 2nd: 0, 2
    val df = Seq((1L, Array.fill(4000)('x').mkString)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val idx = Multimodal.sampleFrames(df, "payload", everyNth = 2).select("frame_idx")
      .collect().map(_.getInt(0)).toSeq
    assert(idx == Seq(0, 2))
  }

  test("cluster validity trio: hand DB/silhouette/CH on two separated clusters") {
    import spark.implicits._
    // a = {(0,0),(0,2)}, b = {(10,0),(10,2)}: centroids (0,1)/(10,1),
    // scatter 1 each, gap 10 → DB = 0.2; silhouette (√101−1)/√101;
    // CH: W = 4, B = 100, k = 2, n = 4 → (100/1)/(4/2) = 50
    val df = Seq(
      (1L, "a", Seq(0.0, 0.0)), (2L, "a", Seq(0.0, 2.0)),
      (3L, "b", Seq(10.0, 0.0)), (4L, "b", Seq(10.0, 2.0)))
      .toDF("vec_id", "label", "embedding")
    val db = VectorOps.daviesBouldin(df).collect().head
    assert(db.getLong(0) == 2L && db.getDouble(1) == 0.2)
    val sil = VectorOps.silhouetteSimplified(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(sil("a").getLong(1) == 2L && sil("a").getDouble(2) == 0.900496)
    assert(sil("b").getDouble(2) == 0.900496 && sil("b").getLong(3) == 0L)
    val ch = VectorOps.calinskiHarabasz(df).collect().head
    assert(ch.getLong(0) == 4L && ch.getLong(1) == 2L)
    assert(ch.getDouble(2) == 100.0 && ch.getDouble(3) == 4.0)
    assert(ch.getDouble(4) == 50.0)
    // one cluster: DB and CH undefined → NULL, silhouette b-side absent
    val one = Seq((1L, "a", Seq(0.0, 0.0)), (2L, "a", Seq(0.0, 2.0)))
      .toDF("vec_id", "label", "embedding")
    assert(VectorOps.daviesBouldin(one).collect().head.isNullAt(1))
    assert(VectorOps.calinskiHarabasz(one).collect().head.isNullAt(4))
    graft.Caches.clear()
  }
}
