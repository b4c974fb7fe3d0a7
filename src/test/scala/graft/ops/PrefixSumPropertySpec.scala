package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-pins the distributed prefix-sum core (`Stats.prefixSumsCore`
  * via `runningTotal`/`runningTotals`/`globalNtile`) to the
  * single-partition `Window.orderBy` semantics it replaces: random frames
  * covering empty/single-row/ties/null-weights/multi-partition inputs
  * must be row-identical to the window form. This pins the r10
  * range-partition rewrite's equivalence independently of the eight
  * oracle queries that ride it (q107/q176/q177/q197/q200/q207/q218/q220).
  * Raw `Gen.apply` sampling (scalatestplus is not on this classpath).
  */
class PrefixSumPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Random frame `(id, k, w)`: id unique (the tie-break), k heavily tied,
    * w a small long or NULL; spread over several partitions so the
    * range-partition path actually exercises cross-partition offsets.
    */
  private val frameGen: Gen[Seq[(Long, Long, Option[Long])]] = for {
    n  <- Gen.frequency(1 -> Gen.const(0), 1 -> Gen.const(1), 8 -> Gen.choose(2, 80))
    ks <- Gen.listOfN(n, Gen.choose(0L, 6L)) // few distinct keys → many ties
    ws <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(-3L, 9L).map(Some(_)), 1 -> Gen.const(None)))
  } yield ks.zip(ws).zipWithIndex.map { case ((k, w), i) => (i.toLong, k, w) }

  private def toDf(rows: Seq[(Long, Long, Option[Long])]) =
    rows.toDF("id", "k", "w").repartition(5)

  test("property: runningTotal equals the single-partition window cumsum") {
    samples(frameGen, 10).foreach { rows =>
      val df = toDf(rows)
      val got = Stats.runningTotal(df, Seq(col("k"), col("id")), col("w"), out = "cum")
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val w = Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("cum", sum(coalesce(col("w").cast("long"), lit(0L))).over(w))
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got === want, s"n=${rows.size} rows=${rows.take(5)}…")
    }
  }

  test("property: runningTotals k-weight pass equals k window cumsums + grand totals") {
    samples(frameGen, 8).filter(_.nonEmpty).foreach { rows =>
      val df = toDf(rows)
      val (ranked, grand) = Stats.prefixSumsCore(
        df, Seq(col("k"), col("id")),
        Seq(col("w") -> "cw", lit(1L) -> "crank"))
      val got = ranked.select("id", "cw", "crank")
        .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      val w = Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("cw", sum(coalesce(col("w").cast("long"), lit(0L))).over(w))
        .withColumn("crank", sum(lit(1L)).over(w))
        .select("id", "cw", "crank")
        .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      assert(got === want)
      assert(grand("cw") === rows.flatMap(_._3).sum)
      assert(grand("crank") === rows.size.toLong)
    }
  }

  test("property: globalNtile equals ntile(bins) OVER (ORDER BY …) − 1, incl. bins > n") {
    val gen = for { rows <- frameGen; bins <- Gen.choose(1, 12) } yield (rows, bins)
    samples(gen, 10).foreach { case (rows, bins) =>
      val df = toDf(rows)
      val got = Stats.globalNtile(df, bins, Seq(col("k"), col("id")), out = "bin")
        .select("id", "bin").as[(Long, Long)].collect().toMap
      val want = df
        .withColumn("bin", ntile(bins).over(Window.orderBy(col("k"), col("id"))) - 1)
        .select("id", "bin").as[(Long, Int)].collect()
        .map(t => t._1 -> t._2.toLong).toMap
      assert(got === want, s"n=${rows.size} bins=$bins")
    }
  }

  test("prefix-sum core on the degenerate frames: empty and single-row") {
    val empty = Seq.empty[(Long, Long, Option[Long])].toDF("id", "k", "w")
    assert(Stats.runningTotal(empty, Seq(col("k"), col("id")), col("w")).isEmpty)
    assert(Stats.globalNtile(empty, 4, Seq(col("k"), col("id"))).isEmpty)
    val one = Seq((7L, 3L, Some(5L))).toDF("id", "k", "w")
    val r = Stats.runningTotal(one, Seq(col("k"), col("id")), col("w"), out = "cum")
      .select("cum").as[Long].head()
    assert(r === 5L)
    val b = Stats.globalNtile(one, 4, Seq(col("k"), col("id")), out = "bin")
      .select("bin").as[Long].head()
    assert(b === 0L)
  }
}
