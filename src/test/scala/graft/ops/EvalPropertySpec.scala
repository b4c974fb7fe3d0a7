package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-pins the round-11 eval additions against brute-force Scala
  * references on random inputs: BH step-up rejections and PR-AUC step
  * areas are easy to get subtly wrong (step-up vs step-down, tie
  * handling, descending cumulatives), so the distributed forms are
  * checked row-for-row against the textbook O(n²)-naive computations.
  * Raw `Gen.apply` sampling (scalatestplus is not on this classpath).
  */
class EvalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: bhFdr matches brute-force step-up on random p tables (incl. ties)") {
    val gen = for {
      n  <- Gen.choose(1, 60)
      // thousandth-grid p values: ties are common, and the brute-force
      // step-up check stays in exact integer space (the op compares on
      // the decimal grid — a double-arithmetic reference could disagree
      // by one ulp exactly at the boundary ranks)
      pm <- Gen.listOfN(n, Gen.oneOf(Gen.choose(0, 40), Gen.choose(0, 1000)))
    } yield pm.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    samples(gen, 12).foreach { rows =>
      val df = rows.map { case (id, pm) => (id, pm / 1000.0) }.toDF("id", "p")
        .repartition(4)
      val got = Stats.bhFdr(df, col("p"), col("id"), alphaNum = 1, alphaDen = 20)
        .select("id", "reject").as[(Long, Boolean)].collect().toMap
      // brute force: sort (p, id), largest k with p_(k) <= k/(20m) —
      // checked as pm·m·20 <= k·1000, exact integers
      val m = rows.size
      val sorted = rows.sortBy { case (id, pm) => (pm, id) }
      val kStar = (1 to m).reverse
        .find(k => sorted(k - 1)._2.toLong * m * 20 <= k.toLong * 1000)
        .getOrElse(0)
      val want = sorted.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1 <= kStar) }.toMap
      assert(got === want, s"m=$m kStar=$kStar rows=${rows.take(5)}…")
    }
  }

  test("property: byFdr matches brute-force BY step-up; never rejects more than bhFdr") {
    val gen = for {
      n  <- Gen.choose(1, 60)
      pm <- Gen.listOfN(n, Gen.oneOf(Gen.choose(0, 40), Gen.choose(0, 1000)))
    } yield pm.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    samples(gen, 12).foreach { rows =>
      val df = rows.map { case (id, pm) => (id, pm / 1000.0) }.toDF("id", "p")
        .repartition(4)
      val got = Stats.byFdr(df, col("p"), col("id"), alphaNum = 1, alphaDen = 20)
        .select("id", "reject").as[(Long, Boolean)].collect().toMap
      // brute force with the SAME ascending harmonic fold and comparison
      // shape the op pins — the reference differs only in machinery
      val m = rows.size
      var cM = 0.0; (1 to m).foreach(i => cM += 1.0 / i)
      val sorted = rows.sortBy { case (id, pm) => (pm, id) }
      val kStar = (1 to m).reverse
        .find { k =>
          (sorted(k - 1)._2 / 1000.0 * (m * 20).toDouble) * cM <= k.toDouble * 1.0
        }.getOrElse(0)
      val want = sorted.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1 <= kStar) }.toMap
      assert(got === want, s"m=$m kStar=$kStar cM=$cM rows=${rows.take(5)}…")
      // BY is uniformly more conservative than BH (c(m) ≥ 1)
      val bh = Stats.bhFdr(df, col("p"), col("id"), alphaNum = 1, alphaDen = 20)
        .select("id", "reject").as[(Long, Boolean)].collect().toMap
      got.foreach { case (id, rej) => assert(!rej || bh(id), s"BY rejected $id but BH did not") }
    }
  }

  test("property: cliffsDelta prefix-sum masses match brute-force pair counts (ties)") {
    val gen = for {
      n  <- Gen.choose(2, 50)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 12), Gen.oneOf(true, false)))
    } yield xs
    samples(gen, 10).foreach { xs =>
      val df = xs.map { case (v, y) => (v, y) }.toDF("v", "y").repartition(3)
      val r = Stats.cliffsDelta(df, col("v"), col("y")).collect().head
      val as = xs.filter(_._2).map(_._1); val bs = xs.filterNot(_._2).map(_._1)
      val gt = (for (a <- as; b <- bs if a > b) yield 1).size.toLong
      val lt = (for (a <- as; b <- bs if a < b) yield 1).size.toLong
      val tie = (for (a <- as; b <- bs if a == b) yield 1).size.toLong
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((gt, lt, tie)), xs.toString)
      if (as.nonEmpty && bs.nonEmpty) {
        val want = BigDecimal((gt - lt).toDouble / (as.size.toLong * bs.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(5) == want)
      } else assert(r.isNullAt(5))
    }
  }

  test("property: hodgesLehmann is the exact lower median of all pairwise differences") {
    val gen = for {
      n  <- Gen.choose(2, 40)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 20L), Gen.oneOf(true, false)))
    } yield xs
    samples(gen, 10).foreach { xs =>
      val as = xs.filter(_._2).map(_._1); val bs = xs.filterNot(_._2).map(_._1)
      val df = xs.toDF("v", "y").repartition(3)
      val r = Stats.hodgesLehmann(df, col("v"), col("y")).collect().head
      assert(r.getLong(2) == as.size.toLong * bs.size)
      if (as.nonEmpty && bs.nonEmpty) {
        val diffs = (for (a <- as; b <- bs) yield a - b).sorted
        val lower = diffs((diffs.size + 1) / 2 - 1) // type-1 lower median
        assert(r.getDouble(3) == lower.toDouble, s"as=$as bs=$bs diffs=$diffs")
      } else assert(r.isNullAt(3))
    }
  }

  test("property: ansariBradley W equals brute-force midrank min-scores") {
    val gen = for {
      n  <- Gen.choose(4, 50)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 10), Gen.oneOf(true, false)))
    } yield xs
    samples(gen, 10).foreach { xs =>
      val df = xs.toDF("v", "y").repartition(3)
      val r = Stats.ansariBradley(df, col("v"), col("y")).collect().head
      val sorted = xs.map(_._1).sorted
      val nn = sorted.size
      // midrank of value v = mean of its 1-based positions; AB score =
      // min(r, N+1-r) — compute per distinct value, sum over group A
      def midrank(v: Int): Double = {
        val ps = sorted.zipWithIndex.collect { case (x, i) if x == v => i + 1 }
        ps.sum.toDouble / ps.size
      }
      def score(v: Int): Double = math.min(midrank(v), nn + 1 - midrank(v))
      val w = xs.filter(_._2).map(x => score(x._1)).sum
      val as = xs.count(_._2); val bs = nn - as
      if (as > 0 && bs > 0) {
        val want = BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(2) == want, s"xs=$xs w=$w got=${r.getDouble(2)}")
      } else assert(r.isNullAt(2))
    }
  }

  test("property: welchAnova matches a direct implementation; zero-variance groups drop") {
    val gen = for {
      k  <- Gen.choose(2, 5)
      xs <- Gen.listOfN(60, Gen.zip(Gen.choose(0, k - 1), Gen.choose(0, 30)))
    } yield xs.map { case (g, v) => (s"g$g", v.toDouble) }
    samples(gen, 8).foreach { xs =>
      val byG = xs.groupBy(_._1).filter { case (_, vs) =>
        vs.size > 1 && vs.map(_._2).distinct.size > 1 }
      val df = xs.toDF("g", "v").repartition(3)
      val r = Stats.welchAnova(df, col("v"), col("g")).collect().head
      val k = byG.size
      assert(r.getLong(0) == k.toLong)
      if (k > 1) {
        val stats = byG.values.map { vs =>
          val n = vs.size; val m = vs.map(_._2).sum / n
          val s2 = vs.map(x => (x._2 - m) * (x._2 - m)).sum / (n - 1)
          (n, m, n / s2)
        }.toSeq
        val w = stats.map(_._3).sum
        val xw = stats.map(s => s._3 * s._2).sum / w
        val a = stats.map(s => s._3 * (s._2 - xw) * (s._2 - xw)).sum / (k - 1)
        val lam = stats.map(s => (1 - s._3 / w) * (1 - s._3 / w) / (s._1 - 1)).sum
        val f = a / (1 + 2.0 * (k - 2) * lam / (k.toDouble * k - 1))
        val df2 = (k.toDouble * k - 1) / (3 * lam)
        assert(math.abs(r.getDouble(5) - f) < 2e-6, s"f: ${r.getDouble(5)} vs $f")
        assert(math.abs(r.getDouble(4) - df2) < 2e-4, s"df2: ${r.getDouble(4)} vs $df2")
      }
    }
    // a constant group is excluded and counted, not NaN-poisoned
    val mixed = (Seq.fill(6)(("c", 5.0)) ++
      Seq(("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 4.0), ("b", 8.0), ("b", 6.0))).toDF("g", "v")
    val m = Stats.welchAnova(mixed, col("v"), col("g")).collect().head
    assert(m.getLong(0) == 2L && m.getLong(2) == 1L && !m.isNullAt(5))
  }

  test("property: brunnerMunzel matches a direct midrank/placement implementation") {
    def brute(as: Seq[Int], bs: Seq[Int]): (Double, Double, Double) = {
      val all = as ++ bs
      def mid(x: Int, in: Seq[Int]): Double =
        (in.count(_ < x) + 1 + in.count(_ <= x)).toDouble / 2
      val n1 = as.size; val n2 = bs.size; val nT = (n1 + n2).toDouble
      val ra = as.map(mid(_, all)); val rb = bs.map(mid(_, all))
      val rbar1 = ra.sum / n1; val rbar2 = rb.sum / n2
      val d1 = as.zip(ra).map { case (x, r) => r - mid(x, as) }
      val d2 = bs.zip(rb).map { case (x, r) => r - mid(x, bs) }
      def svar(d: Seq[Double], n: Int): Double = {
        val m = d.sum / n; d.map(x => (x - m) * (x - m)).sum / (n - 1)
      }
      val s1 = svar(d1, n1); val s2 = svar(d2, n2)
      val vsum = n1 * s1 + n2 * s2
      val pHat = (rbar2 - rbar1) / nT + 0.5
      val w = n1 * n2 * (rbar2 - rbar1) / (nT * math.sqrt(vsum))
      val dfv = vsum * vsum /
        ((n1 * s1) * (n1 * s1) / (n1 - 1) + (n2 * s2) * (n2 * s2) / (n2 - 1))
      (pHat, w, dfv)
    }
    val gen = for {
      n1 <- Gen.choose(3, 30); n2 <- Gen.choose(3, 30)
      as <- Gen.listOfN(n1, Gen.choose(0, 15))
      bs <- Gen.listOfN(n2, Gen.choose(0, 15))
    } yield (as, bs)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    samples(gen, 10).foreach { case (as, bs) =>
      val df = (as.map((_, true)) ++ bs.map((_, false))).toDF("v", "y").repartition(3)
      val r = Stats.brunnerMunzel(df, col("v"), col("y")).collect().head
      val (p, w, dfv) = brute(as, bs)
      assert(r.getDouble(2) == r6(p), s"p_hat: ${r.getDouble(2)} vs $p")
      if (!w.isNaN && !w.isInfinite) {
        assert(math.abs(r.getDouble(3) - w) < 2e-6, s"w: ${r.getDouble(3)} vs $w as=$as bs=$bs")
        assert(math.abs(r.getDouble(4) - dfv) < 2e-5, s"df: ${r.getDouble(4)} vs $dfv")
      } else assert(r.isNullAt(3) && r.isNullAt(4))
    }
    // constant samples: placement variance 0 → NULL w/df, p_hat defined
    val const = (Seq.fill(5)((3, true)) ++ Seq.fill(4)((3, false))).toDF("v", "y")
    val c = Stats.brunnerMunzel(const, col("v"), col("y")).collect().head
    assert(c.getDouble(2) == 0.5 && c.isNullAt(3) && c.isNullAt(4))
  }

  test("cvmFromHists: brute-force squared-gap integral; identical states → 0") {
    val ha = Seq((0L, 4L), (1L, 6L), (2L, 2L)).toDF("bin", "n")
    val hb = Seq((0L, 2L), (1L, 3L), (3L, 5L)).toDF("bin", "n")
    val r = Stats.cvmFromHists(ha, hb).collect().head
    // brute: bins 0..3, cA=(4,6,2,0) cB=(2,3,0,5); FA=(4,10,12,12)/12 FB=(2,5,5,10)/10
    val cA = Seq(4L, 6L, 2L, 0L); val cB = Seq(2L, 3L, 0L, 5L)
    val fA = cA.scanLeft(0L)(_ + _).tail; val fB = cB.scanLeft(0L)(_ + _).tail
    val nA = 12.0; val nB = 10.0
    val s = (0 until 4).map { i =>
      val d = (fA(i) * 10 - fB(i) * 12).toDouble / (nA * nB)
      (cA(i) + cB(i)).toDouble * d * d
    }.sum
    val want = BigDecimal(nA * nB / ((nA + nB) * (nA + nB)) * s)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getLong(0), r.getLong(1)) == ((12L, 10L)))
    assert(r.getDouble(2) == want, s"got ${r.getDouble(2)} want $want")
    val same = Stats.cvmFromHists(ha, ha).collect().head
    assert(same.getDouble(2) == 0.0)
  }

  test("qini: hand curve; degenerate single-arm inputs → NULL summaries") {
    val rows = Seq((0.9, true, true, 1L), (0.8, false, false, 2L),
      (0.7, true, false, 3L), (0.6, false, true, 4L))
      .toDF("s", "t", "y", "id")
    val r = Stats.qini(rows, col("s"), col("t"), col("y"), col("id")).collect().head
    // Q(i) over desc prefixes: 1, 1, 1, 0 → AUUC 0.75; Q(N)=0 → qini 0.75
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 2L, 2L)))
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) == ((0.0, 0.75, 0.75)))
    val oneArm = Seq((0.9, true, true, 1L), (0.8, true, false, 2L))
      .toDF("s", "t", "y", "id")
    val d = Stats.qini(oneArm, col("s"), col("t"), col("y"), col("id")).collect().head
    assert(d.isNullAt(3) && d.isNullAt(4) && d.isNullAt(5))
    graft.Caches.clear()
  }

  test("property: qini matches the brute-force desc-prefix curve on random cohorts") {
    val gen = for {
      n  <- Gen.choose(2, 60)
      ss <- Gen.listOfN(n, Gen.choose(0, 15).map(_ / 15.0)) // tied scores
      ts <- Gen.listOfN(n, Gen.oneOf(true, false))
      ys <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield ss.lazyZip(ts).lazyZip(ys).toList.zipWithIndex
      .map { case ((s, t, y), i) => (s, t, y, i.toLong) }
    samples(gen, 12)
      .filter(r => r.exists(_._2) && r.exists(!_._2))
      .foreach { rows =>
        val df = rows.toDF("s", "t", "y", "id").repartition(4)
        val got = Stats.qini(df, col("s"), col("t"), col("y"), col("id"))
          .collect().head
        // brute force in descending (score, id) order
        val desc = rows.sortBy { case (s, _, _, id) => (-s, -id) }
        var (nt, yt, nc, yc, sq) = (0L, 0L, 0L, 0L, 0.0)
        desc.foreach { case (_, t, y, _) =>
          if (t) { nt += 1; if (y) yt += 1 } else { nc += 1; if (y) yc += 1 }
          sq += yt.toDouble - (if (nc > 0) yc.toDouble * nt / nc else 0.0)
        }
        val n = rows.size
        val qf = yt.toDouble - yc.toDouble * nt / nc
        val auuc = sq / n
        val qini = auuc - qf * (n + 1) / (2.0 * n)
        assert(got.getLong(1) == nt && got.getLong(2) == nc)
        assert(math.abs(got.getDouble(4) - auuc) < 2e-6, s"auuc ${got.getDouble(4)} vs $auuc")
        assert(math.abs(got.getDouble(5) - qini) < 2e-6, s"qini ${got.getDouble(5)} vs $qini")
      }
    graft.Caches.clear()
  }

  test("property: prAuc matches the brute-force threshold sweep on random scored labels") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gen = for {
      n  <- Gen.choose(2, 80)
      ss <- Gen.listOfN(n, Gen.choose(0, 20).map(_ / 20.0)) // heavy score ties
      ys <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield ss.zip(ys)
    samples(gen, 12).filter(_.exists(_._2)).foreach { rows =>
      val df = rows.toDF("s", "y").repartition(4)
      val got = Stats.prAuc(df, col("s"), col("y")).collect().head
      // brute force: distinct scores desc, AP = sum over groups of
      // (pos_g / nPos) * (cumPos / cumAll)
      val nPos = rows.count(_._2).toLong
      val groups = rows.groupBy(_._1).toSeq.sortBy(-_._1)
        .map { case (s, g) => (g.size.toLong, g.count(_._2).toLong) }
      var (cumAll, cumPos, ap) = (0L, 0L, 0.0)
      groups.foreach { case (cnt, pos) =>
        cumAll += cnt; cumPos += pos
        ap += (pos.toDouble * cumPos) / (nPos.toDouble * cumAll)
      }
      assert(got.getLong(0) == nPos && got.getLong(1) == rows.size - nPos)
      assert(math.abs(got.getDouble(2) - ap) < 2e-6,
        s"got ${got.getDouble(2)} want ${r6(ap)} rows=${rows.take(5)}…")
    }
    graft.Caches.clear()
  }

  test("property: jonckheereTerpstra's JT matches the brute-force pair count (ties ½)") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // narrow grids force heavy group AND value ties — exactly where a
    // cell-fold implementation can silently double- or zero-count
    val gen = for {
      n  <- Gen.choose(2, 40)
      gs <- Gen.listOfN(n, Gen.choose(1, 4))
      vs <- Gen.listOfN(n, Gen.choose(0, 6))
    } yield gs.zip(vs)
    samples(gen, 12).foreach { rows =>
      val df = rows.toDF("g", "v").repartition(4)
      val got = Stats.jonckheereTerpstra(df, col("g"), col("v")).collect().head
      // brute force: every cross-group ordered pair, ties worth ½
      val jt = (for {
        (a, i) <- rows.zipWithIndex; (b, j) <- rows.zipWithIndex
        if a._1 < b._1
      } yield {
        if (b._2 > a._2) 1.0 else if (b._2 == a._2) 0.5 else 0.0
      }).sum
      assert(got.getDouble(2) == r6(jt),
        s"got ${got.getDouble(2)} want ${r6(jt)} rows=${rows.take(6)}…")
      graft.Caches.clear()
    }
  }

  test("property: gkGamma's C/D fold matches brute-force concordance on random grids") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gen = for {
      n  <- Gen.choose(2, 40)
      xs <- Gen.listOfN(n, Gen.choose(1, 5))
      ys <- Gen.listOfN(n, Gen.choose(1, 5))
    } yield xs.zip(ys)
    samples(gen, 12).foreach { rows =>
      val df = rows.toDF("x", "y").repartition(4)
      val got = Stats.gkGamma(df, col("x"), col("y")).collect().head
      var c = 0L; var d = 0L
      for (i <- rows.indices; j <- rows.indices if i < j) {
        val dx = rows(j)._1 - rows(i)._1; val dy = rows(j)._2 - rows(i)._2
        if (dx != 0 && dy != 0) { if (dx.sign == dy.sign) c += 1 else d += 1 }
      }
      if (c + d == 0) assert(got.isNullAt(1), s"expected NULL γ, rows=${rows.take(6)}…")
      else assert(got.getDouble(1) == r6((c - d).toDouble / (c + d).toDouble),
        s"got ${got.getDouble(1)} want C=$c D=$d rows=${rows.take(6)}…")
      graft.Caches.clear()
    }
  }
}
