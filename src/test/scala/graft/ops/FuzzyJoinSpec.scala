package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {

  /** Textbook DP Levenshtein — the spec's independent reference. */
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

  private def bruteForce(strs: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib
      d = lev(sa, sb) if d <= maxDist
    } yield (ia, ib, d.toLong)).toSet

  private def run(strs: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    FuzzyJoin.editDistancePairs(strs.toDF("id", "s"), "s", "id", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("editDistancePairs d=1: substitution, insertion, deletion and identity shapes all found") {
    val strs = Seq(
      1L -> "kitten", 2L -> "sitten", // substitution
      3L -> "abc", 4L -> "abcd",      // insertion at end
      5L -> "xabc",                   // insertion at front (vs 3)
      6L -> "ab",                     // deletion (vs 3)
      7L -> "abc",                    // identical to 3 (distance 0)
      8L -> "zzzz")                   // no partner
    assert(run(strs, 1) == bruteForce(strs, 1))
    // and the expected pairs are actually in there
    val got = run(strs, 1)
    assert(got.contains((1L, 2L, 1L)) && got.contains((3L, 4L, 1L)) &&
      got.contains((3L, 7L, 0L)) && got.contains((3L, 6L, 1L)) && got.contains((3L, 5L, 1L)))
    assert(!got.exists(p => p._1 == 8L || p._2 == 8L))
  }

  test("editDistancePairs ≡ brute force on a pseudorandom corpus (d=1 and d=2)") {
    val rnd = new scala.util.Random(42)
    val strs = (1L to 120L).map(i => i -> Seq.fill(3 + rnd.nextInt(5))("ab" (rnd.nextInt(2))).mkString)
    assert(run(strs, 1) == bruteForce(strs, 1))
    assert(run(strs, 2) == bruteForce(strs, 2))
  }

  test("editDistancePairs handles empty strings and is repartition-stable") {
    import spark.implicits._
    val strs = Seq(1L -> "", 2L -> "a", 3L -> "", 4L -> "ab")
    assert(run(strs, 1) == bruteForce(strs, 1)) // ("","") d=0, ("","a") d=1, ("a","ab") d=1
    val df = strs.toDF("id", "s").repartition(7)
    val got = FuzzyJoin.editDistancePairs(df, "s", "id", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteForce(strs, 1))
  }

  test("editDistanceJoin (two-table) ≡ brute force cross pairs; self-pairs allowed") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val mk = (n: Int) => (1L to n.toLong).map(i => i -> Seq.fill(2 + rnd.nextInt(4))("abc" (rnd.nextInt(3))).mkString)
    val (ls, rs) = (mk(40), mk(60))
    val expect = (for {
      (il, sl) <- ls; (ir, sr) <- rs
      d = lev(sl, sr) if d <= 1
    } yield (il, ir, d.toLong)).toSet
    val got = FuzzyJoin.editDistanceJoin(
        ls.toDF("id", "s"), rs.toDF("id", "s"), "s", "id", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("jaroWinkler matches the textbook values (cross-checked against DuckDB's implementation)") {
    import spark.implicits._
    // expected values verified against duckdb jaro_winkler_similarity —
    // the driver oracle's engine — including the either-empty → 0.0 and
    // window-excluded ("ab"/"ba") conventions
    val cases = Seq(
      ("martha", "marhta", 0.961111),
      ("dixon", "dicksonx", 0.813333),
      ("jellyfish", "smellyfish", 0.896296),
      ("hello", "hello", 1.0),
      ("abc", "", 0.0),
      ("", "", 0.0),
      ("ab", "ba", 0.0),
      ("crate", "trace", 0.733333),
      ("dwayne", "duane", 0.84),
      ("a", "ab", 0.85),
      ("Customer#000000001", "Customer#000000002", 0.977778),
      ("aaaa", "aaa", 0.941667))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(col("a"), col("b"),
        round(FuzzyJoin.jaroWinkler(col("a"), col("b")), 6).as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    cases.foreach { case (a, b, exp) =>
      assert(got((a, b)) == exp, s"jw($a, $b)")
    }
    // symmetric
    val sym = Seq(("marhta", "martha")).toDF("a", "b")
      .select(round(FuzzyJoin.jaroWinkler(col("a"), col("b")), 6)).head().getDouble(0)
    assert(sym == 0.961111)
  }

  test("jaroWinkler: null-safe, usable in SQL, interpreted eval equals codegen") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12)
    val withNull = Seq((Some("a"), None: Option[String])).toDF("a", "b")
      .select(FuzzyJoin.jaroWinkler(col("a"), col("b"))).head()
    assert(withNull.isNullAt(0))
    // interpreted path (nullSafeEval) agrees with the codegen result
    val interp = org.apache.spark.sql.graft.JaroWinklerAlgo.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("martha"),
      org.apache.spark.unsafe.types.UTF8String.fromString("marhta"))
    assert(interp == viaSql)
  }

  test("containmentPairs: planted snippet contained at 1.0; jaccard would miss it") {
    import spark.implicits._
    val page = (1 to 40).map(i => s"tok$i").mkString(" ")         // 40 distinct tokens
    val snippet = (1 to 10).map(i => s"tok$i").mkString(" ")      // its first 10
    val other = (100 to 130).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, page), (2L, other), (3L, snippet)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // snippet→page at 1.0 (all 8 of its 3-shingles appear in the page); the
    // reverse direction is 8/38 ≪ 0.9; `other` shares nothing
    assert(got == Set((3L, 1L, 1.0)))
    // sanity: the symmetric operator at any dedup-grade threshold misses it
    assert(Dedup.ngramJaccardPairs(docs, threshold = 0.5).count() == 0)
  }

  test("containmentPairs ≡ brute-force shingle containment on overlapping docs") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "a b c d e",
      3L -> "c d e f g h i j",
      4L -> "x y z x y z")
    def sh(s: String): Set[String] =
      s.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val expect = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia != ib
      inter = (sh(sa) intersect sh(sb)).size
      c = BigDecimal(inter.toDouble / sh(sa).size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if inter > 0 && c >= 0.5
    } yield (ia, ib, c)).toSet
    val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
  }

  test("containmentPairs: exact-duplicate collapse reproduces brute force; df prune counts members") {
    import spark.implicits._
    val page = (1 to 40).map(i => s"tok$i").mkString(" ")
    val snippet = (1 to 10).map(i => s"tok$i").mkString(" ")
    // families: 4 copies of the page (one uppercased — same fingerprint),
    // 3 copies of the snippet, 1 unrelated doc
    val rows: Seq[(Long, String)] =
      (0L to 3L).map(i => i -> (if (i == 1L) page.toUpperCase else page)) ++
      (10L to 12L).map(i => i -> snippet) ++ Seq(20L -> "u v w x y z u v w")
    def sh(s: String): Set[String] =
      s.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    def brute(maxDf: Long): Set[(Long, Long, Double)] = {
      val dfOf = rows.flatMap { case (_, t) => sh(t) }.groupBy(identity).map { case (k, v) => k -> v.size }
      val keep = (t: String) => sh(t).filter(g => dfOf(g) <= maxDf)
      (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia != ib
        inter = (keep(ta) intersect keep(tb)).size
        c = BigDecimal(inter.toDouble / sh(ta).size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if c >= 0.9
      } yield (ia, ib, c)).toSet
    }
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute(1000), s"got ${got.size} vs ${brute(1000).size}")
    // prune parity: maxDocFreq=3 — the page family alone (4 member docs)
    // pushes its shingles over the cap, which only a MEMBER-counting df
    // reproduces (4 families would not); snippet shingles sit at exactly
    // 4+3=7 > 3 too, so the prune bites and containments drop
    val pruned = Dedup.containmentPairs(df, threshold = 0.9, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned == brute(3), s"pruned ${pruned.size} vs ${brute(3).size}")
  }

  test("tfidfTopTerms: hand-computed scores, rounded-score ranking, topK bound") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana cherry shared"),
      (3L, "cherry cherry cherry shared")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    def score(tf: Int, df: Int): Double =
      BigDecimal(tf * math.log(3.0 / df)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDoc = got.groupBy(_._1)
    // doc 1: apple tf=2 df=1 beats banana tf=1 df=2; "shared" df=3 → idf 0
    assert(byDoc(1L).sortBy(_._5).map(t => (t._2, t._4)).toSeq ==
      Seq("apple" -> score(2, 1), "banana" -> score(1, 2)))
    // doc 3: cherry tf=3 df=2 first; tie at 0.0 between banana? no — second is shared (0.0)
    assert(byDoc(3L).sortBy(_._5).map(_._2).toSeq == Seq("cherry", "shared"))
    // topK honored everywhere
    assert(got.groupBy(_._1).forall(_._2.length <= 2))
    // ranks are 1..k dense per doc
    assert(byDoc.values.forall(v => v.map(_._5).sorted.toSeq == (1L to v.length)))
  }
}
