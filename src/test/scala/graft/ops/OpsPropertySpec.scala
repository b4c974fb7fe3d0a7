package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests over randomly generated inputs for the round-7 operators:
  * salted-join equivalence, chunk coverage, and temperature-mix rate
  * invariants. Raw `Gen.apply` sampling (scalatestplus is not on this
  * classpath — see NOTES.md).
  */
class OpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: saltedJoin(inner) equals the plain join on random skewed tables") {
    val factGen = for {
      n    <- Gen.choose(1, 60)
      keys <- Gen.listOfN(n, Gen.frequency(6 -> Gen.const(1L), 4 -> Gen.choose(1L, 8L)))
    } yield keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    samples(factGen, 6).foreach { rows =>
      val facts = rows.toDF("k", "row_id")
      val dim   = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
      val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), col("row_id"), salts = 5)
        .collect().map(_.mkString("|")).sorted.toSeq
      val plain = facts.join(dim, Seq("k"))
        .collect().map(_.mkString("|")).sorted.toSeq
      assert(salted === plain, s"mismatch for ${rows.take(5)}…")
    }
  }

  test("property: chunk windows cover every token exactly, in order") {
    val gen = for {
      n         <- Gen.choose(1, 40)
      maxTokens <- Gen.choose(1, 12)
      stride    <- Gen.choose(1, maxTokens)
    } yield (n, maxTokens, stride)
    samples(gen, 12).foreach { case (n, maxTokens, stride) =>
      val toks = (0 until n).map(i => s"t$i")
      val df   = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextAnalysis.chunk(df, maxTokens = maxTokens, stride = stride)
        .orderBy("chunk_id").collect()
      // every chunk w has the exact expected slice
      chunks.foreach { r =>
        val w     = r.getLong(1).toInt
        val start = w * stride
        val expect = toks.slice(start, start + maxTokens)
        assert(r.getString(2) === expect.mkString(" "), s"(n=$n m=$maxTokens s=$stride w=$w)")
        assert(r.getLong(3) === expect.length.toLong)
      }
      // full coverage: the union of windows is exactly [0, n)
      val covered = chunks.flatMap { r =>
        val w = r.getLong(1).toInt; (w * stride) until math.min(w * stride + maxTokens, n)
      }.toSet
      assert(covered === (0 until n).toSet, s"coverage gap (n=$n m=$maxTokens s=$stride)")
      // no window is fully contained in its predecessor
      val ids = chunks.map(_.getLong(1)).toSeq
      assert(ids === (0L until ids.length.toLong), "window ids are dense from 0")
    }
  }

  test("round-7 operators degrade safely on empty input") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.vocabulary(emptyDocs).isEmpty)
    assert(TextAnalysis.topTokens(emptyDocs, k = 5).isEmpty)
    assert(TextAnalysis.chunk(emptyDocs).isEmpty)
    assert(TextAnalysis.redactPii(emptyDocs).isEmpty)
    val emptyLabeled = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(Sampling.temperatureMix(emptyLabeled, "lang", key = col("doc_id")).isEmpty)
    val emptyVecs = Seq.empty[(Long, String, Seq[Double])].toDF("vec_id", "blk", "embedding")
    assert(Dedup.semanticDedup(emptyVecs, bucketCol = col("blk")).isEmpty)
    val emptyFacts = Seq.empty[(Long, Long)].toDF("k", "row_id")
    val dim        = Seq((1L, "one")).toDF("k", "name")
    assert(SkewJoin.saltedJoin(emptyFacts, dim, Seq("k"), col("row_id")).isEmpty)
    val emptyGrid = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(graft.io.Layout.zorderBy(emptyGrid, Seq("x", "y"), numPartitions = 4).isEmpty)
  }

  test("property: incrementalClusters over random batched pair streams ≡ full recompute") {
    val gen = for {
      n     <- Gen.choose(2, 80)
      pairs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)))
    } yield pairs.filter(p => p._1 != p._2)
    samples(gen, 5).filter(_.nonEmpty).foreach { pairs =>
      // split the stream into 3 batches and fold incrementally
      val batches = pairs.grouped(math.max(1, pairs.size / 3 + 1)).toSeq
        .map(_.toDF("id_a", "id_b"))
      val incremental = batches.tail.foldLeft(
        Dedup.clusters(spark, batches.head).select("doc_id", "cluster_id")) { (labels, b) =>
        Dedup.incrementalClusters(spark, labels, b).select("doc_id", "cluster_id")
      }.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Dedup.clusters(spark, batches.reduce(_ union _))
        .select("doc_id", "cluster_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(incremental === full, s"for ${pairs.take(6)}…")
    }
  }

  test("property: dedupParagraphs is idempotent and leaves no cross-doc duplicate paragraph") {
    val paraGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon zeta", "eta theta")
    val docGen = for {
      n     <- Gen.choose(1, 5)
      paras <- Gen.listOfN(n, paraGen)
    } yield paras.mkString("\n")
    val corpusGen = for {
      n    <- Gen.choose(1, 10)
      docs <- Gen.listOfN(n, docGen)
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(corpusGen, 5).foreach { rows =>
      val df  = rows.toDF("doc_id", "text")
      val out = TextAnalysis.dedupParagraphs(df)
      val cleaned = out.select(col("doc_id"), col("clean_text").as("text"))
      // corpus-wide uniqueness: every surviving paragraph appears exactly once
      val all = cleaned.collect().flatMap(r => r.getString(1).split("\n").filter(_.nonEmpty))
      assert(all.length === all.distinct.length, s"dup paragraph survived in $rows")
      // idempotence: a second pass changes nothing and drops nothing
      val again = TextAnalysis.dedupParagraphs(cleaned)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
      cleaned.collect().foreach { r =>
        val (text2, dropped) = again(r.getLong(0))
        assert(text2 === r.getString(1) && dropped === 0L, s"not idempotent for $rows")
      }
    }
  }

  test("property: triangleCountsDF equals GraphX across random graphs") {
    val gen = for {
      nv <- Gen.choose(5, 60)
      ne <- Gen.choose(0, 150)
      es <- Gen.listOfN(ne, Gen.zip(Gen.choose(1L, 60L), Gen.choose(1L, 60L)))
    } yield (nv.toLong, es)
    samples(gen, 3).foreach { case (nv, esRaw) =>
      // map endpoints into the vertex universe: absent-endpoint semantics
      // differ by design (GraphX materializes them, the DF keeps the given
      // universe) and are spec'd separately for pageRankDF
      val es = esRaw.map(p => (p._1 % nv + 1, p._2 % nv + 1))
      val v = (1L to nv).toDF("id")
      val e = (es :+ ((1L, 2L))).toDF("src", "dst").withColumn("propVal", lit(1))
      val viaDf = graft.graph.GraphQueries.triangleCountsDF(spark, v, e)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaGx = graft.graph.GraphQueries.triangleCounts(spark, v, e)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDf === viaGx, s"nv=$nv edges=${es.take(6)}…")
    }
  }

  test("property: temperatureMix keeps per-stratum rates in (0, 1] and total near target") {
    val gen = for {
      c1 <- Gen.choose(50, 400)
      c2 <- Gen.choose(50, 400)
      c3 <- Gen.choose(50, 400)
    } yield Seq("a" -> c1, "b" -> c2, "c" -> c3)
    samples(gen, 5).foreach { strata =>
      val rows = strata.flatMap { case (s, c) => (0 until c).map(i => (s"$s$i".hashCode.toLong, s)) }
      val df = rows.toDF("doc_id", "lang").dropDuplicates("doc_id")
      val total = df.count().toDouble
      val out = Sampling.temperatureMix(df, "lang", alpha = 0.5, targetFraction = 0.5,
        key = col("doc_id"))
      val kept = out.count().toDouble
      // capped strata can only pull the total BELOW the target, never above;
      // Binomial noise bounds the rest (generous 3-sigma-ish slack)
      assert(kept <= 0.5 * total + 3 * math.sqrt(total), s"kept=$kept total=$total")
      assert(kept >= 0.25 * total, s"kept=$kept total=$total")
    }
  }

  /** Textbook DP Levenshtein (the FuzzyJoinSpec reference, repeated here so
    * the property test stands alone).
    */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: editDistancePairs ≡ brute force on random corpora over varied alphabets") {
    val gen = for {
      alpha <- Gen.oneOf("ab", "abc", "aé☃") // incl. non-ASCII BMP chars
      n     <- Gen.choose(10, 60)
      d     <- Gen.choose(1, 2)
      strs  <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 6)
        cs  <- Gen.listOfN(len, Gen.oneOf(alpha.toSeq))
      } yield cs.mkString)
    } yield (d, strs.zipWithIndex.map { case (s, i) => (i.toLong, s) })
    samples(gen, 8).foreach { case (d, rows) =>
      val expect = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib
        dd = lev(sa, sb) if dd <= d
      } yield (ia, ib, dd.toLong)).toSet
      val got = FuzzyJoin.editDistancePairs(rows.toDF("id", "s"), "s", "id", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expect, s"d=$d rows=${rows.take(6)}…")
    }
  }

  test("property: weightedTopK respects weight proportionality in expectation") {
    // two strata of keys, weights 9:1 — over many independent draws
    // (varied seeds) heavy keys must win ~90% of the single slot
    val n = 400
    val rows = (1L to n.toLong).map(i => (i, "s", if (i % 2 == 0) 9.0 else 1.0))
    val df = rows.toDF("id", "stratum", "w")
    val wins = (1 to 40).map { seed =>
      val id = Sampling.weightedTopK(df, Seq("stratum"), 1,
        weight = col("w"), rowKey = col("id"), seed = seed).head().getLong(0)
      if (id % 2 == 0) 1 else 0
    }.sum
    // E[wins] = 36, sd ≈ 1.9 — accept ≥ 28 (4+ sigma slack)
    assert(wins >= 28, s"heavy-weight keys won only $wins/40 draws")
  }

  test("property: containment of a planted prefix slice is always 1.0") {
    val gen = for {
      n   <- Gen.choose(20, 60)
      cut <- Gen.choose(10, 15)
    } yield (n, cut)
    samples(gen, 6).foreach { case (n, cut) =>
      val page = (1 to n).map(i => s"w$i").mkString(" ")
      val snip = (1 to cut).map(i => s"w$i").mkString(" ")
      val got = Dedup.containmentPairs(
          Seq((1L, page), (2L, snip)).toDF("doc_id", "text"), threshold = 0.99)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === Set((2L, 1L, 1.0)), s"n=$n cut=$cut")
    }
  }

  test("property: mutual information bounds — 0 ≤ MI ≤ min(H), NMI in [0,1]") {
    val tblGen = for {
      n    <- Gen.choose(2, 80)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 4), Gen.choose(0, 3)))
    } yield rows
    samples(tblGen, 8).foreach { rows =>
      val df = rows.map { case (a, b) => (s"a$a", s"b$b") }.toDF("a", "b")
      val r = Stats.mutualInformation(df, col("a"), col("b"), scale = 9).collect().head
      val (ha, hb, mi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(mi >= -1e-9, s"MI negative: $mi for ${rows.take(6)}…")
      assert(mi <= math.min(ha, hb) + 1e-9, s"MI exceeds min entropy for ${rows.take(6)}…")
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= -1e-9 && r.getDouble(4) <= 1 + 1e-9)
    }
  }

  test("property: waterFillBudget allocates exactly min(budget, total), caps monotone") {
    val gen = for {
      k  <- Gen.choose(1, 12)
      ws <- Gen.listOfN(k, Gen.choose(1, 500))
      b  <- Gen.choose(1, 3000)
    } yield (ws, b)
    samples(gen, 10).foreach { case (ws, b) =>
      val df = ws.zipWithIndex.map { case (w, i) => (s"s$i", w.toDouble) }.toDF("src", "m")
      val out = Sampling.waterFillBudget(df, Seq("src"), col("m"), budget = b.toDouble)
        .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      val total = ws.sum.toDouble
      val allocated = out.map(_._2).sum
      assert(math.abs(allocated - math.min(b.toDouble, total)) < 1e-4,
        s"alloc $allocated vs ${math.min(b.toDouble, total)} for ws=$ws b=$b")
      // capped strata all share one level; uncapped keep their full mass
      out.foreach { case (w, alloc, capped) =>
        if (capped) assert(alloc < w) else assert(alloc == w)
      }
      val levels = out.filter(_._3).map(_._2).distinct
      assert(levels.size <= 1, s"capped allocations disagree: $levels")
    }
  }

  test("property: approxCloseness at full pivots matches driver BFS harmonic sums") {
    val gen = for {
      ne <- Gen.choose(1, 20)
      es <- Gen.listOfN(ne, Gen.zip(Gen.choose(1L, 9L), Gen.choose(1L, 9L)))
    } yield es
    samples(gen, 5).foreach { es =>
      val edges = es.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = graft.graph.GraphQueries
          .approxCloseness(spark, edges.toDF("src", "dst"), numSources = 9)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        val adj = (edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1)))
          .distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val verts = adj.keySet.toSeq.sorted
        def dists(s: Long): Map[Long, Int] = {
          var res = Map(s -> 0); var frontier = Set(s); var d = 0
          while (frontier.nonEmpty) {
            d += 1
            val next = frontier.flatMap(adj).filterNot(res.contains)
            next.foreach(w => res += w -> d)
            frontier = next
          }
          res
        }
        val exp = verts.map { v =>
          val ds = dists(v).filter(_._2 > 0)
          v -> ((ds.size.toLong, math.rint(ds.values.map(1.0 / _).sum * 1e6) / 1e6))
        }.toMap
        assert(got == exp, s"edges=$edges")
      }
    }
    graft.Caches.clear()
  }

  test("property: approxBetweenness at full pivots matches the pairwise sigma form") {
    val gen = for {
      ne <- Gen.choose(1, 20)
      es <- Gen.listOfN(ne, Gen.zip(Gen.choose(1L, 9L), Gen.choose(1L, 9L)))
    } yield es
    samples(gen, 6).foreach { es =>
      val edges = es.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = graft.graph.GraphQueries
          .approxBetweenness(spark, edges.toDF("src", "dst"), numSources = 9)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        // reference: driver-side BFS σ/dist + pairwise accumulation
        val adj = (edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1)))
          .distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val verts = adj.keySet.toSeq.sorted
        def bfs(s: Long): Map[Long, (Int, Long)] = {
          var res = Map(s -> ((0, 1L)))
          var frontier = Set(s)
          var d = 0
          while (frontier.nonEmpty) {
            val next = scala.collection.mutable.Map[Long, Long]()
            frontier.foreach { v =>
              adj(v).foreach { w =>
                if (!res.contains(w)) next(w) = next.getOrElse(w, 0L) + res(v)._2
              }
            }
            d += 1
            res = res ++ next.map { case (w, sig) => w -> ((d, sig)) }
            frontier = next.keySet.toSet
          }
          res
        }
        val sp = verts.map(v => v -> bfs(v)).toMap
        val exp = verts.map { v =>
          val x = (for {
            s <- verts if s != v; t <- verts if t != v && t != s
            dsv <- sp(s).get(v); dvt <- sp(v).get(t); dst <- sp(s).get(t)
            if dsv._1 + dvt._1 == dst._1
          } yield dsv._2.toDouble * dvt._2 / dst._2).sum / 2
          v -> math.rint(x * 1e6) / 1e6
        }.toMap
        assert(got == exp, s"edges=$edges")
      }
    }
    graft.Caches.clear()
  }
}
