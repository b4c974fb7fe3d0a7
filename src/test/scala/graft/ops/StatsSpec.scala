package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("histogram: clamped edge bins, derived edges, nothing dropped") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 3.0, 9.9, 10.0, 15.0, 19.9, 20.0, 42.0)
      .toDF("v")
    val got = Stats.histogram(df, col("v"), lo = 0.0, hi = 20.0, bins = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // -5 clamps into bin 0; 10.0 goes UP (floor semantics); 20 and 42 clamp into bin 1
    assert(got == Map(
      0L -> ((0.0, 10.0, 4L)),
      1L -> ((10.0, 20.0, 5L))))
    assert(got.values.map(_._3).sum == df.count())
  }

  test("histogram: per-stratum bins stay independent") {
    import spark.implicits._
    val df = Seq(("x", 1.0), ("x", 1.0), ("y", 9.0)).toDF("s", "v")
    val got = Stats.histogram(df, col("v"), lo = 0.0, hi = 10.0, bins = 10,
        strataCols = Seq("s"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got == Map(("x", 1L) -> 2L, ("y", 9L) -> 1L))
  }

  test("ntileBins: near-equal group sizes, deterministic under ties") {
    import spark.implicits._
    // 10 rows, 4 bins -> sizes 3,3,2,2; equal values order by the id tie-break
    val df = (1 to 10).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val got = Stats.ntileBins(df, bins = 4, orderCols = Seq(col("v"), col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      7L -> 2L, 8L -> 2L, 9L -> 3L, 10L -> 3L))
  }

  test("ntileBins: strata partition independently") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 1.0), ("b", 4L, 2.0))
      .toDF("s", "id", "v")
    val got = Stats.ntileBins(df, bins = 2, orderCols = Seq(col("v"), col("id")),
        strataCols = Seq("s"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
  }
}
