package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics over a value column — the profiling face of the
  * engine (corpus length distributions, score distributions, per-stratum
  * skew checks before sampling/trim decisions).
  */
object Stats {

  /** Equi-width histogram of `value` over `[lo, hi)` with `bins` buckets,
    * optionally per stratum: returns
    * `(strataCols…, bin, bin_lo, bin_hi, n)` with underflow clamped into
    * bin 0 and overflow into bin `bins−1` (so Σn = row count — nothing is
    * silently dropped), bins sorted dense (empty bins absent).
    *
    * The bin index is ONE integer floor per row computed at the scan, then
    * a single partial-aggregated shuffle on `(strata…, bin)` whose result
    * is at most |strata| × bins rows — the profiling query stays this
    * cheap at any corpus size. Bin edges are derived from the INTEGER bin
    * index (`lo + i·w`), not accumulated, so engines agree on boundaries;
    * a value exactly on an interior edge goes to the upper bin (floor
    * semantics), and `hi` itself clamps into the last bin.
    */
  def histogram(
      df: DataFrame,
      value: Column,
      lo: Double,
      hi: Double,
      bins: Int,
      strataCols: Seq[String] = Nil,
      scale: Int = 6
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val bin = least(
      greatest(floor((value.cast("double") - lit(lo)) / lit(w)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    val strata = strataCols.map(col)
    df.groupBy((strata :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"))
      .select(strata ++ Seq(
        col("bin"),
        round(lit(lo) + col("bin") * lit(w), scale).as("bin_lo"),
        round(lit(lo) + (col("bin") + 1) * lit(w), scale).as("bin_hi"),
        col("n")): _*)
  }

  /** Equal-frequency discretization: adds `bin` (0-based ntile index over
    * `orderCols` within each stratum) — the quantile-binning step of
    * feature bucketing. `ntile` splits each stratum into `bins` groups
    * whose sizes differ by at most one row; because the order includes the
    * caller's unique tie-break column, the assignment is deterministic and
    * engine-portable (an interpolated-quantile threshold would not be).
    * One shuffle on the strata key; each stratum sorts independently.
    */
  def ntileBins(
      df: DataFrame,
      bins: Int,
      orderCols: Seq[Column],
      strataCols: Seq[String] = Nil
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val w0 = org.apache.spark.sql.expressions.Window.orderBy(orderCols: _*)
    val w  = if (strataCols.isEmpty) w0 else
      org.apache.spark.sql.expressions.Window
        .partitionBy(strataCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("bin", (ntile(bins).over(w) - 1).cast("long"))
  }
}
