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

  /** Pearson correlation + least-squares line per stratum, computed to be
    * ENGINE-PORTABLE: the five accumulations (Σx, Σy, Σxy, Σx², Σy²) run
    * as EXACT decimal sums (inputs cast to `decimal(18,6)`, products at
    * `decimal(37,12)` — still inside the 38-digit cap, so no engine's
    * overflow rounding kicks in), and only the final closed-form ratios
    * drop to IEEE doubles. A plain `corr()` over doubles is
    * order-dependent (partial sums differ per partitioning, and another
    * engine sums in yet another order); this formulation gives every
    * engine identical inputs to identical final arithmetic. Returns
    * `(strataCols…, n, corr, slope, intercept)` — the corpus-statistics /
    * scaling-law-fit primitive. NULL corr/slope where a side is constant
    * (zero variance), NULL pairs skipped via an explicit filter.
    *
    * One partial-aggregated shuffle of five decimals + a count per
    * stratum; the result frame is |strata| rows.
    */
  def linearFit(
      df: DataFrame,
      x: Column,
      y: Column,
      strataCols: Seq[String] = Nil,
      scale: Int = 6
  ): DataFrame = {
    val xd = x.cast("decimal(18,6)")
    val yd = y.cast("decimal(18,6)")
    val strata = strataCols.map(col)
    val sums = df
      .where(x.isNotNull && y.isNotNull)
      .groupBy(strata: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).as("_sx"), sum(yd).as("_sy"),
        sum(xd * yd).as("_sxy"), sum(xd * xd).as("_sxx"), sum(yd * yd).as("_syy"))
    val n   = col("n").cast("double")
    val sx  = col("_sx").cast("double");  val sy  = col("_sy").cast("double")
    val sxy = col("_sxy").cast("double")
    val sxx = col("_sxx").cast("double"); val syy = col("_syy").cast("double")
    val covN  = n * sxy - sx * sy   // n² · covariance
    val varXN = n * sxx - sx * sx   // n² · variance(x)
    val varYN = n * syy - sy * sy
    val slope = when(varXN > 0, covN / varXN)
    sums.select(strata ++ Seq(
      col("n"),
      round(when(varXN > 0 && varYN > 0, covN / (sqrt(varXN) * sqrt(varYN))), scale)
        .as("corr"),
      round(slope, scale).as("slope"),
      round(when(varXN > 0, (sy - slope * sx) / n), scale).as("intercept")): _*)
  }

  /** Per-stratum EXACT quantile profile (p50/p90/p99-style release
    * reports): for each requested `p ∈ (0, 1]`, the value at 1-based rank
    * `max(1, ⌈p·n⌉)` within the stratum — the rank-based (type-1)
    * quantile. Returns `(strataCols…, p, q)`.
    *
    * Rank-based rather than interpolated on purpose, the [[ntileBins]] /
    * rankTrim discipline: the selected value is an ACTUAL data value at
    * an integer rank, so engines agree exactly, where interpolated
    * quantiles are arithmetic whose ulps differ; ties are harmless
    * because any row at the target rank of a tie group carries the same
    * value. Cost: one shuffle + per-stratum sort (ranking is inherently a
    * sort — for a cheaper approximate profile at extreme scale, use
    * `approx_percentile`; this is the exact report). The probe list rides
    * a literal-array explode — no join. With EMPTY strata the global rank
    * comes from the [[runningTotal]] range-partition prefix-sum — never
    * an unpartitioned single-partition window.
    */
  def quantileProfile(
      df: DataFrame,
      value: Column,
      strataCols: Seq[String],
      ps: Seq[Double]
  ): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"probes must be in (0, 1], got $ps")
    if (strataCols.isEmpty) {
      // narrowed to the value alone: the prefix-sum shuffles and caches
      // only the one live column, not the caller's full row
      val slim = df.select(value.as("_qp_v"))
      val (ranked, grand) = prefixSumsCore(slim, Seq(col("_qp_v")), Seq(lit(1L) -> "_rn"))
      val n = grand("_rn")
      ranked
        .select(explode(array(ps.map(lit(_)): _*)).as("p"), col("_rn"), col("_qp_v").as("q"))
        .where(col("_rn") === greatest(lit(1L), ceil(col("p") * lit(n)).cast("long")))
        .select(col("p"), col("q"))
    } else {
      val strata = strataCols.map(col)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(strata: _*).orderBy(value)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(strata: _*)
      df.withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(wAll))
        .select(strata ++ Seq(
          explode(array(ps.map(lit(_)): _*)).as("p"),
          col("_rn"), col("_n"), value.as("q")): _*)
        .where(col("_rn") === greatest(lit(1L), ceil(col("p") * col("_n")).cast("long")))
        .select(strata ++ Seq(col("p"), col("q")): _*)
    }
  }

  /** Per-stratum z-score standardization: adds `z = (x − μ)/σ` (population
    * σ) — the feature-normalization step before mixing heterogeneous
    * quality/length signals into one score. NULL where the stratum has
    * zero variance or the value is NULL.
    *
    * Engine-portable by the [[linearFit]] discipline: μ and σ derive from
    * EXACT decimal sums (Σx, Σx² at decimal(18,6)/(37,12)), and the final
    * expression is written as `(x − sx/n)·n / √(n·sxx − sx²)` so both
    * engines run the identical double arithmetic. One partial-aggregated
    * |strata|-row shuffle + a broadcast join back — the data itself never
    * shuffles.
    */
  def zscore(
      df: DataFrame,
      value: Column,
      strataCols: Seq[String] = Nil,
      outCol: String = "z",
      scale: Int = 6
  ): DataFrame = {
    val xd = value.cast("decimal(18,6)")
    val strata = strataCols.map(col)
    val moments = df.groupBy(strata: _*)
      .agg(count(when(value.isNotNull, 1)).as("_n"),
        sum(xd).as("_sx"), sum(xd * xd).as("_sxx"))
    val joined =
      if (strataCols.isEmpty) df.crossJoin(broadcast(moments))
      else df.join(broadcast(moments), strataCols)
    val n    = col("_n").cast("double")
    val sx   = col("_sx").cast("double")
    val sxx  = col("_sxx").cast("double")
    val varN = n * sxx - sx * sx // n² · population variance
    joined
      .withColumn(outCol,
        round(when(varN > 0, (value.cast("double") - sx / n) * n / sqrt(varN)), scale))
      .drop("_n", "_sx", "_sxx")
  }

  /** Equal-frequency discretization: adds `bin` (0-based ntile index over
    * `orderCols` within each stratum) — the quantile-binning step of
    * feature bucketing. `ntile` splits each stratum into `bins` groups
    * whose sizes differ by at most one row; because the order includes the
    * caller's unique tie-break column, the assignment is deterministic and
    * engine-portable (an interpolated-quantile threshold would not be).
    *
    * Scale shape: with strata, one shuffle on the strata key and each
    * stratum sorts independently (partitioned window). WITHOUT strata the
    * global ntile routes through [[globalNtile]]'s range-partition
    * prefix-sum rank — never the unpartitioned `Window.orderBy` whose
    * single-partition WindowExec is the classic global-rank scale-killer.
    */
  def ntileBins(
      df: DataFrame,
      bins: Int,
      orderCols: Seq[Column],
      strataCols: Seq[String] = Nil
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    if (strataCols.isEmpty) globalNtile(df, bins, orderCols, "bin")
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(strataCols.map(col): _*).orderBy(orderCols: _*)
      df.withColumn("bin", (ntile(bins).over(w) - 1).cast("long"))
    }
  }

  /** Per-stratum MAD-based robust outlier scoring: adds
    * `med` (stratum median), `mad` (median absolute deviation),
    * `rscore = |x − med| / mad` and `is_outlier = rscore > k` — the
    * heavy-tail screen that [[zscore]] cannot provide (one 10 MB document
    * in a stratum of tweets inflates σ until nothing else flags; the
    * median and MAD ignore it). `k ≈ 3.5` is the conventional cut
    * (Iglewicz–Hoaglin); callers wanting the σ-consistent score can fold
    * the 1.4826 constant into `k`.
    *
    * Both medians are the rank-based type-1 quantile (an ACTUAL data
    * value at rank ⌈n/2⌉, the [[quantileProfile]] rule) — so for integer
    * inputs `med`, `mad` and the deviation are exact integers and the
    * score is ONE double division, reproducible bit-for-bit by another
    * engine where mean/σ or interpolated percentiles would not be.
    * Zero-MAD strata (over half the rows share the median) yield NULL
    * score and NULL flag rather than a division blowup.
    *
    * Scale shape: two per-stratum sort passes (the [[quantileProfile]]
    * cost family) each collapsing to a |strata|-row frame that joins back
    * broadcast — the data shuffles for ranking but never for the join.
    */
  def robustOutliers(
      df: DataFrame,
      value: Column,
      strataCols: Seq[String] = Nil,
      k: Double = 3.5,
      scale: Int = 6
  ): DataFrame = {
    val strata = strataCols.map(col)
    // empty strata: a global median rank would plan a single-partition
    // window — route it through the prefix-sum rank instead
    def strataWindowRank(in: DataFrame, v: Column): DataFrame =
      if (strataCols.isEmpty) {
        val (ranked, grand) = prefixSumsCore(in, Seq(v), Seq(lit(1L) -> "_rn"))
        val n = grand("_rn")
        ranked.where(col("_rn") === greatest(lit(1L), ceil(lit(0.5) * lit(n)).cast("long")))
      } else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(strata: _*).orderBy(v)
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(strata: _*)
        in.withColumn("_rn", row_number().over(w))
          .withColumn("_n", count(lit(1)).over(wAll))
          .where(col("_rn") === greatest(lit(1L), ceil(lit(0.5) * col("_n")).cast("long")))
      }
    val med = strataWindowRank(df, value)
      .select(strata :+ value.as("_med"): _*)
    val withDev =
      (if (strataCols.isEmpty) df.crossJoin(broadcast(med))
       else df.join(broadcast(med), strataCols, "left"))
        .withColumn("_dev", abs(value - col("_med")))
    val mad = strataWindowRank(withDev, col("_dev"))
      .select(strata :+ col("_dev").as("_mad"): _*)
    val scoredBase =
      if (strataCols.isEmpty) withDev.crossJoin(broadcast(mad))
      else withDev.join(broadcast(mad), strataCols, "left")
    scoredBase
      .withColumn("rscore",
        when(col("_mad") > 0, round(col("_dev") / col("_mad"), scale)))
      .withColumn("is_outlier",
        when(col("_mad") > 0, col("_dev") / col("_mad") > k))
      .withColumnRenamed("_med", "med")
      .withColumnRenamed("_mad", "mad")
      .drop("_dev")
  }
  /** Simpson diversity of a categorical mix, optionally per stratum — the
    * corpus-composition monitor (is a language dominated by one source?
    * is the training mix collapsing onto one domain?): simpson =
    * `Σ (n_i/N)²` (the probability two random rows share the category —
    * 1/|categories| when uniform, →1 when concentrated) and
    * `effective = 1/simpson`, the equivalent number of uniform categories.
    * Returns `(strataCols…, n, n_categories, simpson, effective)`.
    *
    * Engine-portable: each share is ONE double division, its square is
    * cast to `decimal(38,18)` before summing (a binary rational never
    * lands on a decimal half-grid — the q112 argument), so the sum is
    * order-free and the final reciprocal is a deterministic chain. Two
    * grouped aggregates; |strata| result rows at any corpus size.
    */
  def diversityIndex(
      df: DataFrame,
      dimCol: String,
      strataCols: Seq[String] = Nil,
      scale: Int = 6
  ): DataFrame = {
    val strata = strataCols.map(col)
    val counts = df.groupBy(strata :+ col(dimCol): _*).agg(count(lit(1)).as("_cn"))
    val totals = counts.groupBy(strata: _*)
      .agg(sum(col("_cn")).as("_total"), count(lit(1)).as("n_categories"))
    val joined =
      if (strataCols.isEmpty) counts.crossJoin(broadcast(totals))
      else counts.join(broadcast(totals), strataCols)
    val share = col("_cn").cast("double") / col("_total")
    val agg = joined
      .groupBy(strata: _*)
      .agg(
        sum((share * share).cast("decimal(38,18)")).as("_simpson_d"),
        max(col("_total")).as("n"),
        max(col("n_categories")).as("n_categories"))
    agg.select(strata ++ Seq(
      col("n"), col("n_categories"),
      round(col("_simpson_d").cast("double"), scale).as("simpson"),
      round(lit(1.0) / col("_simpson_d").cast("double"), scale).as("effective")): _*)
  }

  /** Heavy-key diagnostics for a join/group key — the skew report a
    * planner (or an engineer sizing a salted join) reads before shuffling
    * on the key: the top-`topK` keys by count with each key's corpus
    * share and its skew factor (count ÷ the mean count per key — how many
    * "average keys" of load this one key carries). Exact counts, two
    * single-division doubles per row.
    *
    * Scale shape: one partial-aggregated count per key, then
    * TakeOrderedAndProject for the top-k (map-side bounded heaps — the
    * full |keys| frame is never globally sorted) and a rank window over
    * the TINY top-k frame only; the two corpus scalars ride a one-row
    * broadcast. Returns `(key, n, rank, share, skew)`.
    */
  def keySkewReport(
      df: DataFrame,
      key: Column,
      topK: Int = 10,
      scale: Int = 6
  ): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("_total"), count(lit(1)).as("_nkeys"))
    counts.orderBy(col("n").desc, col("key")).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("key"))).cast("int"))
      .crossJoin(broadcast(tot))
      .select(
        col("key"), col("n"), col("rank"),
        round(col("n").cast("double") / col("_total"), scale).as("share"),
        round((col("n") * col("_nkeys")).cast("double") / col("_total"), scale).as("skew"))
  }

  /** Categorical distribution drift between two snapshots of a corpus —
    * the chi-square drift monitor (did the language / source / length-bin
    * mix shift since the last release?). Per category of `dimCol`:
    * observed counts on both sides, the expected new-side count under the
    * old distribution (`e = n_new · c_old / n_old`), and the Pearson
    * contribution `(c_new − e)² / e`; the statistic is the sum of the
    * contributions. Categories absent from a side count 0 there; a
    * category NEW in the new snapshot has `e = 0` and a NULL contribution
    * (its chi-square term is undefined — it is reported as a row so the
    * monitor flags it explicitly rather than silently inflating the
    * statistic).
    *
    * Engine-portable: counts are exact integers, `e` is one
    * multiply+divide on doubles, and the contribution is three more IEEE
    * ops on those — deterministic per ROW with no cross-row float
    * summation anywhere (callers summing the statistic sum the ROUNDED
    * contributions, which is decimal-exact). Cost: two count aggregates,
    * one full-outer equi-join on the category, two scalar broadcasts —
    * |categories| result rows at any corpus size.
    */
  def chiSquareDrift(
      oldDf: DataFrame,
      newDf: DataFrame,
      dimCol: String,
      scale: Int = 6
  ): DataFrame = {
    val co = oldDf.groupBy(col(dimCol)).agg(count(lit(1)).as("n_old"))
    val cn = newDf.groupBy(col(dimCol)).agg(count(lit(1)).as("n_new"))
    val to = oldDf.agg(count(lit(1)).as("_to"))
    val tn = newDf.agg(count(lit(1)).as("_tn"))
    val joined = co.withColumnRenamed(dimCol, "_k")
      .join(cn.withColumnRenamed(dimCol, "_k2"), col("_k") <=> col("_k2"), "full_outer")
      .select(
        coalesce(col("_k"), col("_k2")).as(dimCol),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val e = col("_tn").cast("double") * col("n_old") / col("_to")
    joined.crossJoin(broadcast(to)).crossJoin(broadcast(tn))
      .select(
        col(dimCol), col("n_old"), col("n_new"),
        round(e, scale).as("expected"),
        when(col("n_old") > 0,
          round((col("n_new") - e) * (col("n_new") - e) / e, scale)).as("contrib"))
  }

  /** Column profiling report — the "describe this table" primitive of data
    * exploration and ingest validation: one row per requested column with
    * `(col_name, n_rows, n_nonnull, null_frac, n_distinct, min_value,
    * max_value)`. Min/max aggregate on the NATIVE type (numeric order, not
    * lexicographic) and only the scalar result casts to string, so the
    * report is schema-uniform across heterogeneous columns.
    *
    * Scale shape: ONE aggregation pass — the multi-column exact distinct
    * counts plan as a single Expand + partial-aggregated shuffle (factor
    * = |cols|+1 over the slim projected input), and the per-column report
    * rows come from a `stack` generator over the single aggregated row,
    * not per-column scans. Exact-distinct is the contract here (it feeds
    * dedup-rate and key-uniqueness checks); for a cheap screening profile
    * at extreme scale swap in `approx_count_distinct` upstream.
    */
  def profile(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_n_$c"),
        countDistinct(col(c)).as(s"_d_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `_n_$c`, `_d_$c`, `_min_$c`, `_max_$c`")
      .mkString(", ")
    one
      .selectExpr(
        "_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nonnull, n_distinct, min_value, max_value)")
      .select(
        col("col_name"),
        col("_rows").as("n_rows"),
        col("n_nonnull"),
        round((col("_rows") - col("n_nonnull")).cast("double") / col("_rows"), scale)
          .as("null_frac"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Per-stratum WEIGHTED exact quantiles — "the doc length below which
    * half the TOKENS sit", the token-mass counterpart of
    * [[quantileProfile]] (which weights every row equally): for each
    * `p ∈ (0, 1]`, the smallest value whose cumulative integer weight
    * reaches `⌈p·W⌉`, `W` the stratum's total weight. Returns
    * `(strataCols…, p, q)`.
    *
    * The portability contract requires INTEGER weights (token/char/byte
    * counts — the natural corpus weights): cumulative weights are then
    * exact, the target rank is one double multiply + ceil off the exact
    * total, and the selected `q` is an actual data value — no
    * interpolation. The crossing row is unique because weights are
    * required positive. Cost: one shuffle + per-stratum sort, the
    * [[quantileProfile]] shape with a summed rank.
    */
  def weightedQuantileProfile(
      df: DataFrame,
      value: Column,
      weight: Column,
      strataCols: Seq[String],
      ps: Seq[Double],
      tieCol: Column
  ): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"probes must be in (0, 1], got $ps")
    val strata = strataCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata: _*).orderBy(value, tieCol)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(strata: _*)
    df.where(weight.isNotNull && weight > 0)
      .withColumn("_wt", weight.cast("long"))
      .withColumn("_cw", sum(col("_wt")).over(w))
      .withColumn("_tw", sum(col("_wt")).over(wAll))
      .select(strata ++ Seq(
        explode(array(ps.map(lit(_)): _*)).as("p"),
        col("_cw"), col("_wt"), col("_tw"), value.as("q")): _*)
      .withColumn("_target",
        greatest(lit(1L), ceil(col("p") * col("_tw")).cast("long")))
      .where(col("_cw") >= col("_target") && col("_cw") - col("_wt") < col("_target"))
      .select(strata ++ Seq(col("p"), col("q")): _*)
  }

  /** Calibration curve of a scoring model against a binary label — the
    * classifier-eval staple "when the model says 0.8, is it right 80% of
    * the time?": equal-count score bins ([[ntileBins]] over
    * `(score, tie)`), each reporting size, mean score and observed
    * positive rate. Monotone rates ⇒ the score RANKS well; rate ≈ mean
    * score ⇒ it is CALIBRATED.
    *
    * Portability: the label rate is exact-integer/n (one division); the
    * mean score decimal-sums the already-rounded scores then divides
    * once. The global ntile is the q107 discipline — exactness of the
    * equal-count binning is the contract — and runs as [[globalNtile]]'s
    * distributed prefix-sum rank, so the eval frame's size is not bounded
    * by one partition.
    */
  def calibrationCurve(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int,
      tieCol: Column,
      scale: Int = 6
  ): DataFrame = {
    // narrow to the three live columns, then track: the frame feeds the
    // global ntile's sample/sums/consumer jobs, and without the cache the
    // scoring chain upstream would run once per job. Null score/label rows
    // are excluded up front — an unscored or unlabeled row carries no
    // calibration evidence, and keeping them would NULL a bin's
    // positive_rate (count(*) counts them while sum skips them), which
    // downstream consumers like isotonicCalibrate read as doubles.
    val slim = graft.Caches.track(
      df.select(score.as("_cal_s"), label.cast("int").as("_cal_y"), tieCol.as("_cal_t"))
        .where(col("_cal_s").isNotNull && col("_cal_y").isNotNull))
    val binned = ntileBins(slim, bins, Seq(col("_cal_s"), col("_cal_t")))
    binned.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      round(sum(col("_cal_s").cast("decimal(38,12)")).cast("double") / count(lit(1)),
        scale).as("mean_score"),
      round(sum(col("_cal_y")).cast("double") / count(lit(1)), scale).as("positive_rate"))
  }

  /** Hosmer–Lemeshow goodness-of-fit — the hypothesis-test companion of
    * [[calibrationCurve]] ("is the model's miscalibration more than
    * noise?"): equal-count score bins, each contributing
    * `(o_g − e_g)² / (e_g·(1 − e_g/n_g))` where `o_g` is observed
    * positives and `e_g = Σ score` the model-expected positives; the sum
    * is the HL statistic, read against χ²(bins−2). One row
    * `(bins_used, n, hl_stat, dof)`. Degenerate bins (e_g = 0 or
    * e_g = n_g — the term's denominator vanishes) are excluded and
    * reported honestly via `bins_used`; `dof = bins_used − 2`.
    *
    * Scale shape: the global equal-count ntile is [[globalNtile]]'s
    * range-partition prefix-sum rank (the [[calibrationCurve]]
    * discipline), one partial-agg shuffle to the ≤bins frame, per-bin
    * terms in pinned scalar IEEE re-summed on the decimal grid so the
    * fold order is canonical in both engines. Null score/label rows are
    * excluded — they carry no calibration evidence.
    */
  def hosmerLemeshow(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int,
      tieCol: Column,
      scale: Int = 6): DataFrame = {
    require(bins >= 3, s"bins must be >= 3 (dof = bins - 2), got $bins")
    val slim = graft.Caches.track(
      df.select(score.as("_hl_s"), label.cast("int").as("_hl_y"), tieCol.as("_hl_t"))
        .where(col("_hl_s").isNotNull && col("_hl_y").isNotNull))
    val binned = ntileBins(slim, bins, Seq(col("_hl_s"), col("_hl_t")))
    val g = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("_n"),
      sum(col("_hl_y")).as("_o"),
      sum(col("_hl_s").cast("decimal(38,12)")).as("_ss"))
    // pinned evaluation order — the oracle mirrors these formulas
    // text-for-text; the division lives inside the when guard (ANSI)
    val per = g.withColumn("_e", col("_ss").cast("double"))
      .withColumn("_term",
        when(col("_e") > 0 && col("_e") < col("_n").cast("double"),
          (col("_o").cast("double") - col("_e")) * (col("_o").cast("double") - col("_e")) /
            (col("_e") * (lit(1.0) - col("_e") / col("_n")))))
    per.agg(
        count(col("_term")).as("bins_used"),
        sum(col("_n")).as("n"),
        sum(col("_term").cast("decimal(38,12)")).as("_hl"))
      .select(
        col("bins_used"), col("n"),
        round(col("_hl").cast("double"), scale).as("hl_stat"),
        (col("bins_used") - 2).as("dof"))
  }

  /** Isotonic calibration (PAVA) of a score against a binary label — the
    * standard monotone recalibration step before serving ("the model's
    * 0.8 means 55% — remap it"): [[calibrationCurve]]'s equal-count bins
    * are pooled by the pool-adjacent-violators algorithm into the
    * weighted L2-OPTIMAL non-decreasing rate fit. Returns the curve with
    * `rate_calibrated` appended:
    * `(bin, n, mean_score, positive_rate, rate_calibrated)` — serve by
    * score-bucket lookup (the |bins|-row table broadcasts anywhere).
    *
    * Scale shape: the heavy lifting is [[calibrationCurve]]'s — a
    * distributed global ntile (prefix-sum rank) plus one partial-agg
    * shuffle; PAVA itself is inherently sequential WITH BACKTRACKING, so
    * it runs on the driver over the ≤bins collapsed rows (the q283-class
    * documented bounded endgame — `bins` is capped to make the bound a
    * contract, and the result is a LocalTableScan). Pooled rates are
    * exact weighted means of the ROUNDED bin rates, re-rounded once.
    */
  def isotonicCalibrate(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int,
      tieCol: Column,
      scale: Int = 6): DataFrame = {
    require(bins >= 1 && bins <= 100000,
      s"bins must be in [1, 100000] (it bounds the driver endgame), got $bins")
    val spark = df.sparkSession
    val curve = calibrationCurve(df, score, label, bins, tieCol, scale)
    val rows = curve.orderBy(col("bin")).collect() // ≤bins rows — documented
    // PAVA: maintain a stack of blocks (weight, weighted rate sum); a new
    // bin merges backward while its pooled mean undercuts its predecessor
    final case class Block(var w: Double, var s: Double, var count: Int) {
      def mean: Double = s / w
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    rows.foreach { r =>
      val n = r.getLong(1).toDouble
      val rate = r.getDouble(3)
      stack += Block(n, n * rate, 1)
      while (stack.length > 1 && stack(stack.length - 2).mean >= stack.last.mean) {
        val top = stack.remove(stack.length - 1)
        val prev = stack.last
        prev.w += top.w; prev.s += top.s; prev.count += top.count
      }
    }
    val calibrated = stack.iterator.flatMap(b => Iterator.fill(b.count)(b.mean)).toArray
    val out = rows.zip(calibrated).map { case (r, c) =>
      org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), BigDecimal(c).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    val schema = org.apache.spark.sql.types.StructType(curve.schema.fields :+
      org.apache.spark.sql.types.StructField(
        "rate_calibrated", org.apache.spark.sql.types.DoubleType))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }

  /** Exact ROC-AUC of a score against a binary label — the Mann-Whitney
    * U formulation with MIDRANKS for score ties, all-integer until one
    * final division:
    * `AUC = (Σ_pos 2·midrank − n₊(n₊+1)) / (2·n₊·n₋)` where
    * `2·midrank = 2·prior + cnt + 1` per distinct-score group. Returns
    * one row `(n_pos, n_neg, auc)`; NULL auc when either class is empty.
    *
    * Scale shape: rows collapse to the |distinct scores| frame FIRST
    * (one aggregate shuffle — with 6-decimal scores this is bounded far
    * below the data), and the prior-count cumulative over that collapsed
    * frame is the [[runningTotal]] range-partition prefix-sum, NOT an
    * unpartitioned window — a continuous raw-double score column keeps
    * |distinct| ≈ |rows| and a single-partition cumulative would not
    * survive it (for truly corpus-scale CDFs pre-bin via [[aucFromState]]);
    * the final fold is a scalar aggregate.
    */
  def auc(df: DataFrame, score: Column, label: Column, scale: Int = 6): DataFrame = {
    val base = df
      .select(score.as("_s"), label.cast("int").cast("long").as("_y"))
      .where(col("_s").isNotNull)
    // tracked: the collapsed frame feeds the prefix-sum's sample + sums +
    // consumer JOBS — without the cache the upstream scoring chain runs
    // once per job (the NOTES no-cross-job-CSE discipline)
    val groups = graft.Caches.track(base.groupBy(col("_s"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_y")).as("_np")))
    val ranked = runningTotal(groups, Seq(col("_s")), col("_cnt"), "_cum")
      .withColumn("_prior", col("_cum") - col("_cnt"))
    ranked.agg(
        sum(col("_np")).as("_npos"),
        sum(col("_cnt") - col("_np")).as("_nneg"),
        sum(col("_np") * (lit(2L) * col("_prior") + col("_cnt") + 1L)).as("_m2"))
      .select(
        col("_npos").as("n_pos"),
        col("_nneg").as("n_neg"),
        when(col("_npos") > 0 && col("_nneg") > 0,
          round((col("_m2") - col("_npos") * (col("_npos") + 1L)).cast("double")
            / (lit(2L) * col("_npos") * col("_nneg")), scale)).as("auc"))
  }

  /** Exact PR-AUC (average precision over thresholds) — [[auc]]'s
    * companion for IMBALANCED labels, where ROC-AUC flatters ("0.95 ROC"
    * on a 1:1000 class can still mean most flagged rows are false):
    * `AP = Σ_g ΔR_g · P_g` over distinct-score groups in DESCENDING
    * score order, with `ΔR_g = pos_g/n₊` and `P_g = P≥/N≥` the
    * precision at the group's threshold (the step-interpolated area —
    * sklearn's `average_precision_score` convention, ties collapsed to
    * one step). Returns one row `(n_pos, n_neg, pr_auc)`; NULL when
    * there are no positives (precision is undefined at every threshold).
    *
    * Scale shape: [[auc]]'s exactly — collapse to |distinct scores|
    * groups first, ONE [[runningTotals]] range-partition prefix-sum for
    * both cumulative counts (descending cumulatives are total − cum +
    * self off the grand totals, no second sort), per-group terms are
    * pinned scalar IEEE off exact longs, decimal-summed order-free.
    */
  def prAuc(df: DataFrame, score: Column, label: Column, scale: Int = 6): DataFrame = {
    val base = df
      .select(score.as("_s"), label.cast("int").cast("long").as("_y"))
      .where(col("_s").isNotNull)
    val groups = graft.Caches.track(base.groupBy(col("_s"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_y")).as("_np")))
    val (ranked, grand) = prefixSumsCore(groups, Seq(col("_s")),
      Seq(col("_cnt") -> "_cumn", col("_np") -> "_cump"))
    val nTot = grand("_cumn")
    val pTot = grand("_cump")
    val nGe = lit(nTot) - col("_cumn") + col("_cnt") // rows scoring ≥ this group
    val pGe = lit(pTot) - col("_cump") + col("_np")
    val term = (col("_np").cast("double") * pGe) / (lit(pTot.toDouble) * nGe)
    ranked.agg(sum(term.cast("decimal(38,12)")).as("_ap"))
      .select(
        lit(pTot).as("n_pos"), lit(nTot - pTot).as("n_neg"),
        (if (pTot > 0) round(col("_ap").cast("double"), scale)
         else lit(null).cast("double")).as("pr_auc"))
  }

  /** ROC-AUC per SLICE — the sliced-eval scoreboard ("the classifier is
    * fine globally but useless on src7"): [[auc]]'s exact integer midrank
    * Mann-Whitney, computed independently inside every slice. Unlike the
    * global face (which needs the [[runningTotal]] prefix-sum to avoid a
    * single-partition rank), the per-slice cumulative is a window
    * PARTITIONED BY the slice columns — the natural scale-safe shape, no
    * prefix-sum machinery needed. Scores collapse to per-(slice, score)
    * integer counts before the window, so the ordered step runs on
    * |distinct scores| rows per slice, never raw rows. NULL AUC where a
    * slice lacks a class. Returns `(sliceCols…, n_pos, n_neg, auc)`.
    */
  def aucBySlice(df: DataFrame, score: Column, label: Column,
      sliceCols: Seq[String], scale: Int = 6): DataFrame = {
    require(sliceCols.nonEmpty, "sliceCols must be non-empty")
    val slices = sliceCols.map(col)
    val base = df
      .select(slices ++ Seq(score.as("_s"), label.cast("int").cast("long").as("_y")): _*)
      .where(col("_s").isNotNull)
    val groups = base.groupBy(slices :+ col("_s"): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col("_y")).as("_np"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(slices: _*).orderBy(col("_s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = groups.withColumn("_cum", sum(col("_cnt")).over(w))
      .withColumn("_prior", col("_cum") - col("_cnt"))
    ranked.groupBy(slices: _*).agg(
        sum(col("_np")).as("_npos"),
        sum(col("_cnt") - col("_np")).as("_nneg"),
        sum(col("_np") * (lit(2L) * col("_prior") + col("_cnt") + 1L)).as("_m2"))
      .select(slices ++ Seq(
        col("_npos").as("n_pos"),
        col("_nneg").as("n_neg"),
        when(col("_npos") > 0 && col("_nneg") > 0,
          round((col("_m2") - col("_npos") * (col("_npos") + 1L)).cast("double")
            / (lit(2L) * col("_npos") * col("_nneg")), scale)).as("auc")): _*)
  }

  /** Precision / recall / F1 at a literal threshold sweep (`score >= t`
    * predicts positive): `(threshold, tp, fp, fn, precision, recall,
    * f1)` — the operating-point companion to [[auc]]. Counts are exact
    * integers; each derived metric is scalar IEEE arithmetic per
    * threshold row (NULL where undefined). The sweep rides a literal
    * explode — one aggregate shuffle of |thresholds| × classes scalars.
    */
  def prAtThresholds(
      df: DataFrame,
      score: Column,
      label: Column,
      thresholds: Seq[Double],
      scale: Int = 6
  ): DataFrame = {
    require(thresholds.nonEmpty, "prAtThresholds needs at least one threshold")
    val exploded = df
      .select(score.as("_s"), label.cast("int").cast("long").as("_y"))
      .where(col("_s").isNotNull)
      .select(col("_s"), col("_y"),
        explode(array(thresholds.map(lit(_)): _*)).as("threshold"))
    val counts = exploded.groupBy(col("threshold")).agg(
      sum(when(col("_s") >= col("threshold") && col("_y") === 1L, 1L).otherwise(0L)).as("tp"),
      sum(when(col("_s") >= col("threshold") && col("_y") === 0L, 1L).otherwise(0L)).as("fp"),
      sum(when(col("_s") < col("threshold") && col("_y") === 1L, 1L).otherwise(0L)).as("fn"))
    val p = col("tp").cast("double") / (col("tp") + col("fp"))
    val r = col("tp").cast("double") / (col("tp") + col("fn"))
    counts.select(
      col("threshold"), col("tp"), col("fp"), col("fn"),
      round(when(col("tp") + col("fp") > 0, p), scale).as("precision"),
      round(when(col("tp") + col("fn") > 0, r), scale).as("recall"),
      round(when(col("tp") > 0, lit(2.0) * p * r / (p + r)), scale).as("f1"))
  }

  /** Null imputation with the per-stratum MEDIAN (the rank-based type-1
    * median — an actual data value, so the filled column stays
    * engine-exact where a mean would be float-summed): returns the frame
    * with `valueCol` null-filled and an `imputed` flag. Strata with ONLY
    * null values keep their nulls (flag false — nothing to impute from).
    *
    * Cost: the quantile pass runs on the non-null rows (one shuffle +
    * per-stratum sort), produces a |strata|-row median frame that
    * broadcast-joins back; the data itself never shuffles for the fill.
    */
  def imputeMedian(
      df: DataFrame,
      valueCol: String,
      strataCols: Seq[String]
  ): DataFrame = {
    val medians = quantileProfile(
        df.where(col(valueCol).isNotNull), col(valueCol), strataCols, Seq(0.5))
      .withColumnRenamed("q", "_med")
      .drop("p")
    val joined =
      if (strataCols.isEmpty) df.crossJoin(broadcast(medians))
      else df.join(broadcast(medians), strataCols, "left")
    joined
      .withColumn("imputed", col(valueCol).isNull && col("_med").isNotNull)
      .withColumn(valueCol, coalesce(col(valueCol), col("_med")))
      .drop("_med")
  }

  /** Per-stratum winsorization: CLAMPS `value` into the stratum's
    * `[q(loP), q(hiP)]` rank-based quantile band instead of dropping the
    * tail rows (the complement of `Sampling.rankTrim` — keep every row,
    * bound the influence of outliers before means/fits). Adds
    * `<out>` = clamped value; the band bounds are ACTUAL data values
    * (type-1 quantiles), so the result is engine-exact.
    *
    * One quantile pass (shuffle + per-stratum sort) to a 2×|strata| band
    * frame, pivoted to `(strata…, lo, hi)` and broadcast back — the data
    * never shuffles for the clamp.
    */
  def winsorize(
      df: DataFrame,
      value: Column,
      strataCols: Seq[String],
      loP: Double,
      hiP: Double,
      out: String = "winsorized"
  ): DataFrame = {
    require(loP > 0.0 && hiP <= 1.0 && loP <= hiP,
      s"need 0 < loP <= hiP <= 1, got [$loP, $hiP]")
    val qs = quantileProfile(df.where(value.isNotNull), value, strataCols, Seq(loP, hiP))
    val bands = qs.groupBy(strataCols.map(col): _*).agg(
      max(when(col("p") === loP, col("q"))).as("_lo"),
      max(when(col("p") === hiP, col("q"))).as("_hi"))
    val joined =
      if (strataCols.isEmpty) df.crossJoin(broadcast(bands))
      else df.join(broadcast(bands), strataCols, "left")
    joined
      // explicit null guard: least/greatest IGNORE nulls (a null value
      // would otherwise "clamp" to the band edge instead of staying null)
      .withColumn(out,
        when(value.isNotNull, greatest(col("_lo"), least(col("_hi"), value))))
      .drop("_lo", "_hi")
  }

  /** Global running total in a total order WITHOUT a single-partition
    * window — the distributed prefix-sum: adds `out` = cumulative sum of
    * `weight` (integer, nulls count 0) in the order of `sortCols`, which
    * must be a TOTAL order (include a unique tie-break column) for the
    * result to be well-defined.
    *
    * `Window.orderBy` with no partition key collapses the whole frame
    * into ONE partition — the classic scale-killer for cumulative
    * queries. This instead range-partitions on the sort key (the global
    * order becomes partition-local order), takes one tiny pass for the
    * |partitions| per-partition sums (a bounded driver collect, same
    * class as the max-id scalar), and adds each partition's exclusive
    * offset to its local cumsum in a single mapPartitions — the one
    * genuinely imperative per-partition step in this module, which is
    * exactly what mapPartitions is for. Two jobs over a tracked-persisted
    * sorted frame; released by the harness `Caches.clear()` epilogue.
    */
  def runningTotal(
      df: DataFrame,
      sortCols: Seq[Column],
      weight: Column,
      out: String = "cum"): DataFrame =
    prefixSumsCore(df, sortCols, Seq(weight -> out))._1

  /** Several [[runningTotal]]s in ONE sort pass: adds one cumulative-sum
    * column per `(weight, outName)` pair, all in the same `sortCols` total
    * order. The two-CDF shape ([[ksTest]]'s F_A and F_B, stratified
    * cumulative masses) pays for one range-partition sort instead of k.
    */
  def runningTotals(
      df: DataFrame,
      sortCols: Seq[Column],
      weights: Seq[(Column, String)]): DataFrame =
    prefixSumsCore(df, sortCols, weights)._1

  /** The distributed prefix-sum core shared by [[runningTotal]] /
    * [[runningTotals]] / [[globalNtile]]: range-partition on the sort key,
    * one bounded pass for the |partitions|×k per-partition sums, then each
    * partition adds its exclusive offsets in a single mapPartitions. Also
    * returns the GRAND total per weight — free from the partition-sums
    * pass, and exactly what rank-to-bucket arithmetic needs (a consumer
    * that re-aggregated for the total would pay a third job).
    */
  private[graft] def prefixSumsCore(
      df: DataFrame,
      sortCols: Seq[Column],
      weights: Seq[(Column, String)]): (DataFrame, Map[String, Long]) = {
    require(sortCols.nonEmpty, "prefix sums need a total-order sort key")
    require(weights.nonEmpty, "prefix sums need at least one weight column")
    val spark = df.sparkSession
    val tmpNames = weights.indices.map(i => s"_ps_w$i")
    // NOT caching the input: the range partitioner's boundary sampling
    // re-runs the input lineage, but that pass is column-pruned to the
    // sort keys — measured CHEAPER than materializing an input cache
    // (which re-ran the full-width frame into storage first)
    val withW = weights.zip(tmpNames).foldLeft(df) { case (d, ((w, _), n)) =>
      d.withColumn(n, coalesce(w.cast("long"), lit(0L)))
    }
    val sorted = graft.Caches.track(
      withW.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*))
    val idxs = tmpNames.map(sorted.schema.fieldIndex).toArray
    val k = idxs.length
    val partSums = sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val s = new Array[Long](k)
        it.foreach { r =>
          var j = 0
          while (j < k) { s(j) += r.getLong(idxs(j)); j += 1 }
        }
        Iterator((pid, s))
      }
      .collect() // ≤ |partitions|×k longs — bounded driver state
    val offs = scala.collection.mutable.HashMap.empty[Int, Array[Long]]
    val acc = new Array[Long](k)
    partSums.sortBy(_._1).foreach { case (pid, s) =>
      offs(pid) = acc.clone()
      var j = 0
      while (j < k) { acc(j) += s(j); j += 1 }
    }
    val grand = weights.map(_._2).zip(acc).toMap
    val bc = spark.sparkContext.broadcast(offs.toMap)
    val outSchema = weights.foldLeft(sorted.schema) { case (sch, (_, out)) =>
      sch.add(out, org.apache.spark.sql.types.LongType, nullable = false)
    }
    val rows = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      val cum = bc.value(pid).clone()
      it.map { r =>
        var j = 0
        while (j < k) { cum(j) += r.getLong(idxs(j)); j += 1 }
        // cum.toList COPIES the longs — Row must not capture the mutable array
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ cum.toList)
      }
    }
    (spark.createDataFrame(rows, outSchema).drop(tmpNames: _*), grand)
  }

  /** Distributed global ntile — SQL `ntile(bins) OVER (ORDER BY …)` − 1
    * (0-based) WITHOUT the single-partition window that global ntile
    * otherwise plans: the global rank comes from the [[runningTotal]]
    * range-partition prefix-sum (weight 1 in a total order IS the rank),
    * and the bucket is closed-form literal arithmetic on that rank —
    * with `q = n div bins`, `r = n mod bins`, the first `r` buckets take
    * `q+1` rows and the rest take `q`, exactly the SQL-standard (and
    * Spark/DuckDB) ntile split, so results are bit-identical to the
    * window form. `orderCols` must be a TOTAL order (include a unique
    * tie-break) for the assignment to be well-defined.
    *
    * The rank-to-bucket divisions run as `floor` over IEEE doubles —
    * exact while ranks stay below 2⁵³, i.e. for any corpus that exists.
    */
  def globalNtile(
      df: DataFrame,
      bins: Int,
      orderCols: Seq[Column],
      out: String = "bin"): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val (ranked, grand) = prefixSumsCore(df, orderCols, Seq(lit(1L) -> "_gnt_rank"))
    val n = grand("_gnt_rank")
    val kk = col("_gnt_rank")
    val bucket0 =
      if (n == 0L) lit(null).cast("long") // empty frame — no rows to tag anyway
      else {
        val q = n / bins
        val r = n % bins
        val cut = r * (q + 1) // rows absorbed by the first r (larger) buckets
        if (q == 0L) kk - 1L  // bins > n: every row its own bucket
        else
          when(kk <= cut, floor((kk - 1L) / lit(q + 1)).cast("long"))
            .otherwise(lit(r) + floor((kk - 1L - cut) / lit(q)).cast("long"))
      }
    ranked.withColumn(out, bucket0).drop("_gnt_rank")
  }

  /** Functional-dependency violation report — does `lhs → rhs` hold, and
    * where does it break? Returns the lhs keys mapping to MORE than one
    * distinct rhs value, with `(lhsCols…, n_rows, n_rhs)` — the data-
    * quality probe behind "is source-id unique?", "does every order key
    * determine its customer?", and schema-inference sanity checks.
    *
    * One partial-aggregated shuffle on the lhs key; the distinct-rhs count
    * is exact (it IS the violation predicate). Result size is bounded by
    * the number of violating keys — on a clean table, zero rows.
    */
  def fdViolations(df: DataFrame, lhsCols: Seq[String], rhs: Column): DataFrame = {
    require(lhsCols.nonEmpty, "fdViolations needs at least one lhs column")
    df.groupBy(lhsCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), countDistinct(rhs).as("n_rhs"))
      .where(col("n_rhs") > 1)
  }

  /** Functional-dependency DISCOVERY across ordered column pairs — the
    * profiling complement of [[fdViolations]] (which audits one GIVEN
    * dependency): for every pair `a → b` over `cols`, whether the
    * dependency holds exactly and how badly it fails when it doesn't,
    * measured by the standard g3 error — the minimum fraction of rows to
    * delete for it to hold, `1 − Σ_a max_b count(a,b) / n`. The schema
    * archaeologist for inherited tables ("is source_id really determined
    * by url_host?") and a redundant-column screen before feature
    * selection. Nulls are values on both sides (a null determinant group
    * is observable; a null dependent disagrees with a non-null one).
    *
    * Returns one row per ordered pair: `(determinant, dependent,
    * n_groups, violating_groups, holds, g3)`.
    *
    * Scale shape: each pair costs two partial-agg shuffles over frames
    * that collapse to |a×b cells| then |a groups| rows — the corpus never
    * shuffles raw; the k(k−1) pairs are independent union legs Spark
    * schedules concurrently. Exact integer counts end to end, one double
    * division per pair.
    */
  def fdDiscover(df: DataFrame, cols: Seq[String], scale: Int = 6): DataFrame = {
    require(cols.distinct.size == cols.size, "cols must be distinct")
    require(cols.size >= 2, "fdDiscover needs at least two columns")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    pairs.map { case (a, b) =>
      val cells = df.groupBy(col(a).as("_a"), col(b).as("_b")).agg(count(lit(1)).as("_n"))
      cells.groupBy(col("_a"))
        .agg(sum(col("_n")).as("_na"), max(col("_n")).as("_mx"), count(lit(1)).as("_db"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("_db") > 1, 1L).otherwise(0L)).as("violating_groups"),
          sum(col("_na")).as("_n"), sum(col("_mx")).as("_keep"))
        .select(lit(a).as("determinant"), lit(b).as("dependent"),
          col("n_groups"), col("violating_groups"),
          (col("violating_groups") === 0L).as("holds"),
          round(lit(1.0) - col("_keep").cast("double") / col("_n").cast("double"), scale)
            .as("g3"))
    }.reduce(_ union _)
  }

  /** Exact per-key mode — the majority-vote aggregation behind noisy-label
    * resolution (k annotators per doc → one label), canonical-value
    * election in entity resolution, and "most common category per group"
    * profiling. Returns `(keys…, mode, n)` with `n` the winning count.
    *
    * Ties break DETERMINISTICALLY toward the greatest value: the count
    * frame collapses to one `max(struct(n, value))` partial aggregate per
    * key — lexicographic struct ordering elects max-count-then-max-value,
    * so the result is engine- and partitioning-stable without a window
    * sort. Two partial-agg shuffles, the second over the already-collapsed
    * `(key, value)` frame; no row ever carries more than the key, the
    * value and a count.
    */
  def modeBy(df: DataFrame, value: Column, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "modeBy needs at least one key column")
    df.groupBy((keys.map(col) :+ value.as("_v")): _*)
      .agg(count(lit(1)).as("_n"))
      .groupBy(keys.map(col): _*)
      .agg(max(struct(col("_n"), col("_v"))).as("_m"))
      .select((keys.map(col) :+ col("_m._v").as("mode") :+ col("_m._n").as("n")): _*)
  }

  /** 2-D skyline (pareto frontier, maximize both): the points no other
    * point in the same group dominates — `(x', y')` dominates `(x, y)` iff
    * `x' ≥ x ∧ y' ≥ y` and they differ in at least one coordinate. The
    * multi-criteria selection shape ("longest documents at the highest
    * quality", "cheapest supplier at the fastest ship date" after
    * negation), returned as `(keys…, x, y, n)` with `n` the input
    * multiplicity of the exact point.
    *
    * Scale shape: the input collapses FIRST — one partial-agg shuffle to
    * distinct `(keys, x, y)` points, a second to the best y per x (only
    * `(x, max y(x))` can sit on the frontier) — and only then does a
    * single running-max window scan over the ≤|distinct x| collapsed rows
    * mark the frontier: a point survives iff its y strictly exceeds every
    * y at strictly greater x. The window partition is |distinct x| rows
    * per group, never the data.
    */
  def skyline(df: DataFrame, x: Column, y: Column, keys: Seq[String] = Nil): DataFrame = {
    val p = df.groupBy((keys.map(col) :+ x.as("x") :+ y.as("y")): _*)
      .agg(count(lit(1)).as("n"))
    val best = p.groupBy((keys.map(col) :+ col("x")): _*)
      .agg(max(struct(col("y"), col("n"))).as("_b"))
      .select((keys.map(col) :+ col("x") :+ col("_b.y").as("y") :+ col("_b.n").as("n")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("x").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    best.withColumn("_rm", max(col("y")).over(w))
      .where(col("_rm").isNull || col("y") > col("_rm"))
      .drop("_rm")
  }

  /** Cumulative Poisson(1) distribution quantized to the 1e-6 sampling
    * grid ([[Sampling.Granularity]]): `thresholds(k)` is the grid tick
    * below which a uniform draw maps to a resample weight of ≤ k. Integer
    * ticks make the weight assignment EXACTLY portable across engines —
    * no `exp()` ulp lottery in the decision — while the ≤ 5·10⁻⁷
    * quantization of each probability is far below bootstrap noise.
    * Truncated where the tail probability drops under the grid
    * (weight ≤ 9 covers 1 − 3·10⁻⁷ of the mass).
    */
  val poissonThresholds: Seq[Long] = {
    val fact = Seq(1L, 1L, 2L, 6L, 24L, 120L, 720L, 5040L, 40320L)
    fact.scanLeft(0.0)((acc, f) => acc + math.exp(-1.0) / f).tail
      .map(c => math.round(c * Sampling.Granularity))
  }

  /** Poissonized-bootstrap confidence interval for the mean of `value`:
    * `b` resample replicates, each weighting every row by an independent
    * Poisson(1) count, yield `b` replicate means whose rank-based
    * quantiles at `levels` are the CI bounds — returned as `(p, q)` rows
    * (the [[quantileProfile]] contract). The error-bar machinery for any
    * corpus-scale metric ("mean quality 0.62 ± what?") without ever
    * materializing a resample.
    *
    * Distributed-bootstrap shape: a map-side explode to `b` replicate
    * rows per input row (no shuffle until the aggregate), one
    * partial-aggregated shuffle to `b` replicate moments, and a window
    * over the `b`-row means frame. Determinism: the Poisson draw is the
    * inverse CDF at a seeded-hash uniform on the [[Sampling.bucket]]
    * grid against [[poissonThresholds]] — integer-vs-integer compares,
    * reproducible across runs, partitionings, and engines; replicate
    * means are decimal-exact sums with ONE final division. Zero-weight
    * rows drop before the shuffle (≈ 37% of the exploded frame).
    */
  def bootstrapMeanCI(
      df: DataFrame,
      value: Column,
      key: Column,
      b: Int = 200,
      levels: Seq[Double] = Seq(0.025, 0.975),
      seed: Int = 42,
      hash: HashFamily = XxHash
  ): DataFrame = {
    require(b >= 2, s"need at least 2 replicates, got $b")
    val reps = df.select(value.cast("double").as("_v"), key.cast("string").as("_k"))
      .where(col("_v").isNotNull)
      .withColumn("_r", explode(sequence(lit(0), lit(b - 1))))
    val u = pmod(hash.seeded(seed, concat(col("_k"), lit(":"), col("_r").cast("string"))),
      lit(Sampling.Granularity))
    val w = poissonThresholds.zipWithIndex
      .foldRight(lit(poissonThresholds.length): Column) { case ((t, i), acc) =>
        when(u < t, lit(i)).otherwise(acc)
      }
    val means = reps.withColumn("_w", w)
      .where(col("_w") > 0)
      .groupBy(col("_r"))
      .agg(
        sum((col("_v") * col("_w")).cast("decimal(38,12)")).as("_s"),
        sum(col("_w").cast("long")).as("_n"))
      .select(col("_r"), (col("_s").cast("double") / col("_n")).as("_m"))
    quantileProfile(means, col("_m"), Nil, levels)
  }

  /** Quantile normalization across strata: each row's value maps to the
    * GLOBAL value at the same within-stratum quantile rank — after it,
    * every stratum has (up to rank granularity) the global distribution.
    * The cross-source score-calibration step: quality scores from
    * different classifiers/sources become comparable before one corpus-
    * wide threshold is applied.
    *
    * Exact and engine-portable by construction: within-stratum rank `rn`
    * of `n` maps to global rank `⌈rn·N/n⌉`, computed in INTEGER
    * arithmetic (`(rn·N + n − 1) div n` — callers at the 10⁹×10⁹ row
    * scale where `rn·N` would overflow a long must pre-aggregate), and
    * the normalized value is an ACTUAL data value at that rank, never an
    * interpolation. `tieCol` fixes both rank orders deterministically.
    *
    * Scale shape: the stratum ranks are partitioned windows; the global
    * rank table avoids the single-partition global window via the sorted
    * `RDD.zipWithIndex` idiom ([[graft.ids.ZipWithIndex]] — one sort
    * shuffle + a parallel offset map), and the mapping is one equi-join
    * on the rank. The rank table is tracked-persisted (it feeds the join
    * build side and the `N` scalar); release via [[graft.Caches.clear]].
    */
  def quantileNormalize(
      df: DataFrame,
      value: Column,
      strataCols: Seq[String],
      tieCol: Column): DataFrame = {
    require(strataCols.nonEmpty, "quantileNormalize needs at least one stratum column")
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*).orderBy(value, tieCol)
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
    val ranked = df.withColumn("_rn", row_number().over(ws).cast("long"))
      .withColumn("_n", count(lit(1)).over(wn))
    val g = graft.Caches.track(
      graft.ids.ZipWithIndex.zipWithIndex(
        df.select(value.as("_gv"), tieCol.as("_gt")).orderBy(col("_gv"), col("_gt")),
        colName = "_grk"
      ).select(col("_grk"), col("_gv")))
    val nTotal = g.count()
    ranked
      .withColumn("_num", col("_rn") * lit(nTotal) + col("_n") - lit(1L))
      .withColumn("_grk", expr("_num div _n"))
      .join(g, Seq("_grk"))
      .select(df.columns.map(col) :+ col("_gv").as("normalized"): _*)
  }

  /** Two-sample Kolmogorov–Smirnov statistic, EXACT: `D = max |F_A − F_B|`
    * over the empirical CDFs of the two groups split by `label`. The
    * distribution-level complement of [[welchTtest]] (a mean can match
    * while the shapes diverge — mixture collapse, truncation, bimodality).
    * Returns one row `(n_a, n_b, d, ks_stat)` where
    * `ks_stat = D·√(n_a·n_b/(n_a+n_b))` — compare against the usual
    * 1.36/1.63 critical values.
    *
    * Engine-portable with no float in the MAXIMIZATION: the candidate
    * suprema are rationals `c_a/n_a − c_b/n_b`, maximized as the exact
    * integer `|c_a·n_b − c_b·n_a|` and divided ONCE at the end. Callers
    * at the scale where `c·n` overflows a long (n_a·n_b ≥ 2⁶³) must
    * pre-bin.
    *
    * Scale shape: collapse-first — the data reduces to one row per
    * DISTINCT value (partial-agg shuffle), then BOTH cumulative CDFs come
    * from one [[runningTotals]] range-partition prefix-sum pass, never an
    * unpartitioned window (a continuous value column keeps |distinct| ≈
    * |rows|, where a single-partition cumulative dies; for corpus-scale
    * pre-binned comparison see [[ksFromStates]]); group totals ride a
    * one-row crossJoin (the documented scalar-attach class).
    */
  def ksTest(df: DataFrame, value: Column, label: Column, scale: Int = 6): DataFrame = {
    val d = df.select(value.as("_v"), label.as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    // tracked: feeds the prefix-sum's sample/sums/consumer jobs plus the
    // totals aggregate — one upstream scan instead of four
    val g = graft.Caches.track(d.groupBy(col("_v")).agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("_c1"),
      sum(when(!col("_y"), 1L).otherwise(0L)).as("_c2")))
    val cum = runningTotals(g, Seq(col("_v")),
        Seq(col("_c1") -> "_f1", col("_c2") -> "_f2"))
      .select(col("_v"), col("_f1"), col("_f2"))
    val tot = d.agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_y"), 1L).otherwise(0L)).as("n_b"))
    cum.crossJoin(tot)
      .agg(
        max(abs(col("_f1") * col("n_b") - col("_f2") * col("n_a"))).as("_num"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .withColumn("d",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("_num").cast("double") / (col("n_a") * col("n_b"))))
      .select(col("n_a"), col("n_b"), round(col("d"), scale).as("d"),
        round(col("d") * sqrt((col("n_a") * col("n_b")).cast("double") /
          (col("n_a") + col("n_b"))), scale).as("ks_stat"))
  }

  /** Per-batch mergeable histogram state on the fixed `[lo, hi)`×`bins`
    * grid — exact `(bin, n)` counts whose merge is a plain sum
    * ([[histMerge]]), the quantile-serving face of the MaterializedAgg
    * discipline: at 100 TB the length/score distribution dashboard reads
    * ≤`bins` rows per batch and never rescans the corpus. Serve with
    * [[quantilesFromHist]].
    */
  def histPartials(df: DataFrame, value: Column, lo: Double, hi: Double,
      bins: Int): DataFrame =
    histogram(df, value, lo, hi, bins).select(col("bin"), col("n"))

  /** Exact merge of [[histPartials]] states (same grid): counts sum. */
  def histMerge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "histMerge needs at least one partial state")
    parts.reduce(_ unionByName _).groupBy(col("bin")).agg(sum(col("n")).as("n"))
  }

  /** Grid-resolution quantiles from a (merged) histogram state: for each
    * probe `p`, the bin containing the rank-`⌈p·N⌉` value — returned as
    * `(p, bin, q_lo, q_hi)` bounds with guaranteed error ≤ one bin width.
    * All-integer rank arithmetic (the [[quantileProfile]] rank rule
    * applied to cumulative bin counts); the window runs over ≤`bins`
    * rows.
    */
  def quantilesFromHist(hist: DataFrame, lo: Double, hi: Double, bins: Int,
      ps: Seq[Double], scale: Int = 6): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"probes must be in (0, 1], got $ps")
    val w = (hi - lo) / bins
    val wc = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    hist
      .withColumn("cum", sum(col("n")).over(wc))
      .withColumn("_nt", sum(col("n")).over(wAll))
      .select(explode(array(ps.map(lit(_)): _*)).as("p"),
        col("bin"), col("n"), col("cum"), col("_nt"))
      .withColumn("_rk", greatest(lit(1L), ceil(col("p") * col("_nt")).cast("long")))
      .where(col("cum") >= col("_rk") && col("cum") - col("n") < col("_rk"))
      .select(col("p"), col("bin"),
        round(lit(lo) + col("bin") * lit(w), scale).as("q_lo"),
        round(lit(lo) + (col("bin") + 1) * lit(w), scale).as("q_hi"))
  }

  /** Population Stability Index between the `label`=true (A, e.g. the
    * reference period) and `label`=false (B, the current period)
    * distributions of `value`, over the fixed grid `[lo, hi)` ×`bins`
    * (the q106 histogram formula, edge bins clamped):
    * `PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ)` — the industry-standard drift score
    * (<0.1 stable, 0.1–0.25 drifting, >0.25 act), complementing the
    * chi-square monitor with a magnitude-scaled, symmetric measure.
    *
    * Bins empty on EITHER side are excluded from the sum (ln is
    * undefined; an epsilon hack would make the score grid-size-dependent)
    * and reported in `bins_dropped` — a drop is itself a drift signal.
    * Returns one row `(n_a, n_b, bins_used, bins_dropped, psi)`.
    * Shares are exact-integer ratios; per-bin contributions are
    * decimal-cast before the sum, so partitioning cannot move the total.
    *
    * Scale shape: one partial-aggregated shuffle to ≤ `bins` rows, a
    * one-row totals crossJoin (the documented scalar-attach class), one
    * final aggregate.
    */
  def psi(
      df: DataFrame,
      value: Column,
      label: Column,
      lo: Double,
      hi: Double,
      bins: Int,
      scale: Int = 6): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val d = df.select(value.cast("double").as("_v"), label.as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    val bin = least(
      greatest(floor((col("_v") - lit(lo)) / lit(w)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    val g = d.groupBy(bin.as("bin")).agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("_ca"),
      sum(when(!col("_y"), 1L).otherwise(0L)).as("_cb"))
    psiOfBinCounts(g, scale)
  }

  /** PSI served from two (merged) [[histPartials]] STATES on the same
    * grid — the deployment shape of [[psi]]: the reference period's
    * histogram is persisted once, each new batch folds into the current
    * state, and the drift score reads ≤`bins` rows per side instead of
    * rescanning either period. Produces the IDENTICAL result to [[psi]]
    * over the underlying rows (the q214 oracle is q199's SQL verbatim):
    * the outer-joined bin counts ARE the per-bin counts the inline path
    * aggregates.
    */
  def psiFromHists(histA: DataFrame, histB: DataFrame, scale: Int = 6): DataFrame = {
    val g = histA.select(col("bin"), col("n").as("_ca"))
      .join(histB.select(col("bin"), col("n").as("_cb")), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    psiOfBinCounts(g, scale)
  }

  /** Two-sample KS served from two (merged) [[histPartials]] STATES on
    * the same grid — the corpus-scale face of [[ksTest]] for CONTINUOUS
    * columns: exact KS collapses rows to |distinct values| first, which
    * for raw doubles is ≈|rows| and keeps growing with the corpus, while
    * the states pre-bin both sides to ≤`bins` rows each (each batch folds
    * via [[histMerge]], nothing rescans). The statistic is then the EXACT
    * KS of the two binned distributions — it differs from the raw-value D
    * by at most the larger single-bin mass, the usual grid-resolution
    * contract of the state family ([[quantilesFromHist]]'s error bound).
    *
    * Same arithmetic discipline as [[ksTest]]: the supremum is maximized
    * as the exact integer `|F_a·n_b − F_b·n_a|` with ONE final division;
    * returns one row `(n_a, n_b, d, ks_stat)`. The cumulative window runs
    * over ≤`bins` rows — the bounded-window class, a single partition by
    * construction.
    */
  def ksFromHists(histA: DataFrame, histB: DataFrame, scale: Int = 6): DataFrame = {
    val g = histA.select(col("bin"), col("n").as("_c1"))
      .join(histB.select(col("bin"), col("n").as("_c2")), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("_c1"), lit(0L)).as("_c1"),
        coalesce(col("_c2"), lit(0L)).as("_c2"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = g.select(col("bin"),
      sum(col("_c1")).over(w).as("_f1"), sum(col("_c2")).over(w).as("_f2"))
    val tot = g.agg(sum(col("_c1")).as("n_a"), sum(col("_c2")).as("n_b"))
    // decimal BEFORE the cross-products: this face's counts are
    // corpus-sized by design, so F·n would overflow a long exactly where
    // the state path is supposed to take over from the exact one
    cum.crossJoin(tot)
      .agg(
        max(abs(col("_f1").cast("decimal(38,0)") * col("n_b") -
          col("_f2").cast("decimal(38,0)") * col("n_a"))).as("_num"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .withColumn("d",
        when(col("n_a") > 0 && col("n_b") > 0,
          col("_num").cast("double") /
            (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double")))
      .select(col("n_a"), col("n_b"), round(col("d"), scale).as("d"),
        round(col("d") * sqrt((col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double") /
          (col("n_a") + col("n_b"))), scale).as("ks_stat"))
  }

  /** Per-batch mergeable LABELED score histogram on the fixed
    * `[lo, hi)`×`bins` grid — the state [[aucFromHist]] serves from:
    * `(bin, n_pos, n_neg)` exact counts, edge bins clamped (the
    * [[histogram]] rule), merge = plain sums ([[scoreHistMerge]]).
    */
  def scoreHistPartials(df: DataFrame, score: Column, label: Column,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val d = df.select(score.cast("double").as("_s"), label.as("_y"))
      .where(col("_s").isNotNull && col("_y").isNotNull)
    val bin = least(
      greatest(floor((col("_s") - lit(lo)) / lit(w)), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    d.groupBy(bin.as("bin")).agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(!col("_y"), 1L).otherwise(0L)).as("n_neg"))
  }

  /** Exact merge of [[scoreHistPartials]] states (same grid): counts sum. */
  def scoreHistMerge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "scoreHistMerge needs at least one partial state")
    parts.reduce(_ unionByName _).groupBy(col("bin"))
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"))
  }

  /** ROC-AUC served from a (merged) [[scoreHistPartials]] STATE — the
    * corpus-scale face of [[auc]] for continuous scores (same argument as
    * [[ksFromHists]]: exact AUC's distinct-score frame grows with the
    * corpus; the state is ≤`bins` rows however much data folded in). All
    * scores inside a bin count as TIED at the bin — the Mann-Whitney
    * midrank formula over bins, which IS the exact AUC of the binned
    * scores (when every distinct score maps to its own bin the result
    * equals [[auc]] exactly, the spec-pinned contract):
    * `AUC = Σ_bins pos_b·(2·negBelow_b + neg_b) / (2·n₊·n₋)` —
    * all-integer until one division. Returns `(n_pos, n_neg, auc)`;
    * the cumulative runs over ≤`bins` rows (bounded-window class).
    */
  def aucFromHist(hist: DataFrame, scale: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1L)
    val ranked = hist.withColumn("_below",
      coalesce(sum(col("n_neg")).over(w), lit(0L)))
    ranked.agg(
        sum(col("n_pos")).as("_np"),
        sum(col("n_neg")).as("_nn"),
        sum(col("n_pos") * (lit(2L) * col("_below") + col("n_neg"))).as("_m2"))
      .select(
        col("_np").as("n_pos"),
        col("_nn").as("n_neg"),
        when(col("_np") > 0 && col("_nn") > 0,
          round(col("_m2").cast("double") / (lit(2L) * col("_np") * col("_nn")), scale))
          .as("auc"))
  }

  /** Jensen–Shannon divergence between two (merged) [[histPartials]]
    * STATES on the same grid — the bounded, symmetric drift score that
    * completes the state-served family ([[psiFromHists]] is unbounded and
    * drops one-sided bins; JS is ≤ ln 2, symmetric, and one-sided bins
    * contribute finitely): `JS = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m)` with
    * `m = (p+q)/2`, natural log. Zero-count bins contribute 0 on their
    * side (`0·ln 0 = 0` by continuity — no epsilon hack, so the score is
    * grid-extension-invariant). Returns `(n_a, n_b, js)`; NULL when
    * either side is empty. Shares are exact-integer ratios; per-bin terms
    * are decimal-cast before the sum (partitioning cannot move the
    * total); the frame is ≤2·bins rows end to end.
    */
  def jsDivergenceFromHists(histA: DataFrame, histB: DataFrame, scale: Int = 6): DataFrame = {
    val g = histA.select(col("bin"), col("n").as("_ca"))
      .join(histB.select(col("bin"), col("n").as("_cb")), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    val tot = g.agg(sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"))
    g.crossJoin(tot)
      // guarded shares: an EMPTY side must yield the NULL result row, not
      // an ANSI divide-by-zero in the eagerly-evaluated projection
      .withColumn("_p",
        when(col("n_a") > 0, col("_ca").cast("double") / col("n_a")).otherwise(0.0))
      .withColumn("_q",
        when(col("n_b") > 0, col("_cb").cast("double") / col("n_b")).otherwise(0.0))
      .withColumn("_m", (col("_p") + col("_q")) / 2.0)
      .withColumn("_term",
        when(col("_ca") > 0 && col("n_a") > 0,
          col("_p") * log(col("_p") / col("_m"))).otherwise(0.0) +
          when(col("_cb") > 0 && col("n_b") > 0,
            col("_q") * log(col("_q") / col("_m"))).otherwise(0.0))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum(col("_term").cast("decimal(38,12)")).as("_s"))
      .select(col("n_a"), col("n_b"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          col("_s").cast("double") / 2.0), scale).as("js"))
  }

  /** Hellinger distance + Bhattacharyya coefficient between two (merged)
    * [[histPartials]] STATES on the same grid — the divergence that is a
    * true METRIC (symmetric AND triangle-inequality, unlike PSI/KL) and
    * stays bounded in [0,1] on disjoint supports (unlike PSI's ∞):
    * `BC = Σ √(p_b·q_b)`, `H = √(1 − BC)`. The remaining face of the
    * drift drawer (PSI = penalty, JS = information, EMD = distance in
    * value units, KS = worst gap, THIS = the metric form). Per-bin
    * √-products of exact rationals are decimal-cast before the sum
    * (order-free); NULL on an empty side. Returns `(n_a, n_b, bc,
    * hellinger)`.
    */
  def hellingerFromHists(
      histA: DataFrame, histB: DataFrame, scale: Int = 6): DataFrame = {
    val g = histA.select(col("bin"), col("n").as("_ca"))
      .join(histB.select(col("bin"), col("n").as("_cb")), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    val tot = g.agg(sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"))
    g.crossJoin(tot)
      .withColumn("_p",
        when(col("n_a") > 0, col("_ca").cast("double") / col("n_a")).otherwise(0.0))
      .withColumn("_q",
        when(col("n_b") > 0, col("_cb").cast("double") / col("n_b")).otherwise(0.0))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum(sqrt(col("_p") * col("_q")).cast("decimal(38,12)")).as("_bc"))
      .select(col("n_a"), col("n_b"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          col("_bc").cast("double")), scale).as("bc"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          sqrt(greatest(lit(0.0), lit(1.0) - col("_bc").cast("double")))), scale)
          .as("hellinger"))
  }

  /** Murphy decomposition of the Brier score — WHY is the model's
    * probability bad? `Brier = REL − RES + UNC`: reliability (how far
    * each bin's confidence sits from its realized rate — calibration
    * error, lower better), resolution (how much the bins separate the
    * base rate — discrimination, HIGHER better), uncertainty (the base
    * rate's own variance — the data's floor, untouchable by the model).
    * [[probEvalReport]] scores; this explains. Same binning discipline
    * (probability rounded to 6 then decimal(7,6)); returns one row
    * `(n, brier, reliability, resolution, uncertainty)` with the Brier
    * recomputed directly from the exact per-row squares — the identity
    * holds up to float rounding and the spec pins it.
    *
    * Scale shape: one scan → ≤bins partials (exact decimal sums) → a
    * one-row base-rate attach → a ≤bins-row fold with every per-bin term
    * decimal-cast (order-free).
    */
  def brierDecomposition(
      df: DataFrame, prob: Column, label: Column, bins: Int = 10,
      scale: Int = 6): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val p = round(prob.cast("double"), 6).cast("decimal(7,6)")
    val d = df.select(p.as("_p"), label.cast("int").cast("long").as("_y"))
      .where(col("_p").isNotNull && col("_y").isNotNull)
    val diff = col("_p") - col("_y").cast("decimal(1,0)")
    val binned = d
      .withColumn("_bin",
        least(floor(col("_p").cast("double") * bins), lit((bins - 1).toDouble)).cast("long"))
      .withColumn("_sq", (diff * diff).cast("decimal(38,12)"))
      .groupBy(col("_bin")).agg(
        count(lit(1)).as("_n"), sum(col("_y")).as("_sy"),
        sum(col("_p")).as("_sp"), sum(col("_sq")).as("_ssq"))
    val tot = binned.agg(sum(col("_n")).as("n"), sum(col("_sy")).as("_ty"))
    val conf = col("_sp").cast("double") / col("_n")
    val acc = col("_sy").cast("double") / col("_n")
    val base = col("_ty").cast("double") / col("n")
    binned.crossJoin(broadcast(tot))
      .withColumn("_rel",
        (col("_n").cast("double") * (conf - acc) * (conf - acc)).cast("decimal(38,12)"))
      .withColumn("_res",
        (col("_n").cast("double") * (acc - base) * (acc - base)).cast("decimal(38,12)"))
      .agg(first(col("n")).as("n"), first(col("_ty")).as("_ty"),
        sum(col("_ssq")).as("_tsq"), sum(col("_rel")).as("_trel"),
        sum(col("_res")).as("_tres"))
      .select(col("n"),
        round(col("_tsq").cast("double") / col("n"), scale).as("brier"),
        round(col("_trel").cast("double") / col("n"), scale).as("reliability"),
        round(col("_tres").cast("double") / col("n"), scale).as("resolution"),
        round((col("_ty").cast("double") / col("n"))
          * (lit(1.0) - col("_ty").cast("double") / col("n")), scale).as("uncertainty"))
  }

  /** 1-D Wasserstein-1 (earth mover's) distance between two (merged)
    * [[histPartials]] STATES on the same `[lo, hi)`×`bins` grid — the
    * drift score that knows HOW FAR mass moved, where PSI/JS only know
    * THAT it moved (shifting every document 10 chars longer barely moves
    * JS but moves EMD by exactly 10): on an equal-width grid,
    * `EMD = Σ_bins |F_a(b) − F_b(b)| · width` over the bin CDFs. The CDF
    * differences are exact integers (`|F_a·n_b − F_b·n_a|`, the
    * [[ksTest]] discipline — KS takes their max, EMD their sum), summed
    * as decimals with ONE final scale by `width / (n_a·n_b)`. Returns
    * `(n_a, n_b, emd)` in VALUE units; NULL when either side is empty;
    * the cumulative runs over ≤bins rows (bounded-window class).
    */
  def emdFromHists(histA: DataFrame, histB: DataFrame, lo: Double, hi: Double,
      bins: Int, scale: Int = 6): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val g = histA.select(col("bin"), col("n").as("_c1"))
      .join(histB.select(col("bin"), col("n").as("_c2")), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("_c1"), lit(0L)).as("_c1"),
        coalesce(col("_c2"), lit(0L)).as("_c2"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = g.select(col("bin"),
      sum(col("_c1")).over(w).as("_f1"), sum(col("_c2")).over(w).as("_f2"))
    val tot = g.agg(sum(col("_c1")).as("n_a"), sum(col("_c2")).as("n_b"))
    cum.crossJoin(tot)
      .agg(
        sum(abs(col("_f1").cast("decimal(38,0)") * col("n_b") -
          col("_f2").cast("decimal(38,0)") * col("n_a"))).as("_s"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .select(col("n_a"), col("n_b"),
        round(when(col("n_a") > 0 && col("n_b") > 0,
          col("_s").cast("double") * lit(width) /
            (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double")), scale)
          .as("emd"))
  }

  /** Lorenz curve of a non-negative quantity — the curve behind [[gini]]
    * ("the bottom 80% of users hold x% of the events"): rows sort
    * ascending by `value` into `bins` equal-POPULATION buckets
    * ([[globalNtile]]'s distributed prefix-sum rank — never a
    * single-partition window), and each bucket reports its exact
    * population and value mass plus the cumulative shares. Returns
    * `(bin, n, total, cum_n, cum_total, pop_share, value_share)`;
    * a perfectly equal distribution has `value_share = pop_share`
    * everywhere, concentration bows the curve down-right.
    *
    * `tieCol` must make (value, tie) a total order. The accumulation grid
    * follows the RESOLVED input type, [[gini]]'s discipline: integral
    * columns sum exactly as longs (`total`/`cum_total` stay `bigint`);
    * fractional columns (double / float / decimal) sum on a
    * `decimal(38,12)` grid and report `total`/`cum_total` as rounded
    * doubles — never a silent `cast("long")`, which would truncate every
    * score in [0,1] to zero while still RANKING by the untruncated value.
    * The shares are single divisions over the ≤bins-row collapsed frame
    * (bounded-window class).
    */
  def lorenzCurve(
      df: DataFrame,
      value: Column,
      bins: Int,
      tieCol: Column,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types._
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val integral = df.select(value.as("_x")).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    val vx = if (integral) value.cast("long") else value.cast("decimal(38,12)")
    val binned = globalNtile(
        df.where(value.isNotNull), bins, Seq(value, tieCol), "_lz_bin")
      .groupBy(col("_lz_bin"))
      .agg(count(lit(1)).as("n"), sum(vx).as("_total"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_lz_bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    def massOut(c: Column, name: String): Column =
      if (integral) c.as(name) else round(c.cast("double"), scale).as(name)
    binned
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("_cum_total", sum(col("_total")).over(w))
      .withColumn("_tn", sum(col("n")).over(wAll))
      .withColumn("_tt", sum(col("_total")).over(wAll))
      .select(col("_lz_bin").as("bin"), col("n"), massOut(col("_total"), "total"),
        col("cum_n"), massOut(col("_cum_total"), "cum_total"),
        round(col("cum_n").cast("double") / col("_tn"), scale).as("pop_share"),
        round(when(col("_tt") > 0, col("_cum_total").cast("double") / col("_tt")), scale)
          .as("value_share"))
  }

  /** Shared PSI core over a per-bin `(bin, _ca, _cb)` count frame. */
  private def psiOfBinCounts(g: DataFrame, scale: Int): DataFrame = {
    val tot = g.agg(sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"))
    g.crossJoin(tot)
      .withColumn("_p", col("_ca").cast("double") / col("n_a"))
      .withColumn("_q", col("_cb").cast("double") / col("n_b"))
      .withColumn("_contrib",
        when(col("_ca") > 0 && col("_cb") > 0,
          (col("_p") - col("_q")) * log(col("_p") / col("_q"))))
      .agg(
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum(when(col("_contrib").isNotNull, 1L).otherwise(0L)).as("bins_used"),
        sum(when(col("_contrib").isNull, 1L).otherwise(0L)).as("bins_dropped"),
        sum(col("_contrib").cast("decimal(38,12)")).as("_s"))
      .select(col("n_a"), col("n_b"), col("bins_used"), col("bins_dropped"),
        round(col("_s").cast("double"), scale).as("psi"))
  }

  /** Gini coefficient of `value` per stratum — the concentration /
    * inequality monitor ("do 1% of users generate 90% of events?", "how
    * unequal are per-source token masses?"). Uses the rank form
    * `G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)` over ascending-sorted
    * non-negative values — exact integer/decimal accumulations
    * (rank-by-value ties cannot move the sum: tied ranks multiply equal
    * values), ONE final division. NULL where the stratum total is zero.
    * Returns `(strataCols…, n, total, gini)`.
    *
    * The accumulation grid follows the RESOLVED input type: integral
    * columns sum as exact longs with `decimal(38,0)` rank products
    * (`total` stays a `bigint`); fractional columns (double / float /
    * decimal) sum on a `decimal(38,12)` grid instead and report `total`
    * as a rounded double — never a silent `cast("long")`, which would
    * truncate every score in [0,1] to zero and rank by a value the sum
    * no longer sees.
    *
    * Scale shape: one partitioned rank window + one partial-aggregated
    * shuffle; the `i·x` products are decimal-cast so rank·value cannot
    * overflow at any scale.
    */
  def gini(
      df: DataFrame,
      value: Column,
      strataCols: Seq[String],
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types._
    val strata = strataCols.map(col)
    val integral = df.select(value.as("_x")).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(strata: _*).orderBy(value)
    val ranked = df.where(value.isNotNull)
      .withColumn("_x", if (integral) value.cast("long") else value.cast("decimal(38,12)"))
      .withColumn("_i", row_number().over(ws).cast("long"))
    val aggd = ranked
      .groupBy(strata: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("_x")).as("_tot"),
        sum((col("_i") * col("_x")).cast(if (integral) "decimal(38,0)" else "decimal(38,12)"))
          .as("_s1"))
      .withColumn("gini",
        when(col("_tot") > 0,
          (lit(2.0) * col("_s1").cast("double") -
            (col("n") + 1).cast("double") * col("_tot").cast("double")) /
            (col("n").cast("double") * col("_tot").cast("double"))))
    val totalOut =
      if (integral) col("_tot").as("total")
      else round(col("_tot").cast("double"), scale).as("total")
    aggd.select(strata ++ Seq(col("n"), totalOut, round(col("gini"), scale).as("gini")): _*)
  }

  /** One-way ANOVA F statistic — "does document length differ across ALL
    * five languages?" in one test, where pairwise [[welchTtest]]s would
    * need k(k−1)/2 comparisons and a multiplicity correction. Returns one
    * row `(k, n, df1, df2, f_stat)` with
    * `F = (SSB/(k−1)) / (SSW/(N−k))`; NULL where undefined (k < 2 or
    * N ≤ k or zero within-group variance).
    *
    * Per-group exact decimal moments (n, Σx, Σx²) in one partial-agg
    * shuffle; group means and the grand mean are pinned IEEE scalars;
    * the between/within contributions are decimal-cast before their
    * k-row sums, so nothing depends on partition order. Totals ride the
    * documented one-row crossJoin.
    */
  def anovaF(df: DataFrame, value: Column, groupCol: Column, scale: Int = 6): DataFrame = {
    val d = df.select(value.cast("double").as("_v"), groupCol.as("_g"))
      .where(col("_v").isNotNull && col("_g").isNotNull)
    val g = d.groupBy(col("_g")).agg(
      count(lit(1)).as("_ng"),
      sum(col("_v").cast("decimal(38,12)")).as("_sg"),
      sum((col("_v") * col("_v")).cast("decimal(38,12)")).as("_qg"))
    val tot = g.agg(
      count(lit(1)).as("k"), sum(col("_ng")).as("n"), sum(col("_sg")).as("_st"))
    g.crossJoin(tot)
      .withColumn("_mg", col("_sg").cast("double") / col("_ng"))
      .withColumn("_m", col("_st").cast("double") / col("n"))
      .withColumn("_ssb",
        col("_ng") * (col("_mg") - col("_m")) * (col("_mg") - col("_m")))
      .withColumn("_ssw",
        col("_qg").cast("double") - col("_ng") * col("_mg") * col("_mg"))
      .agg(
        first(col("k")).as("k"), first(col("n")).as("n"),
        sum(col("_ssb").cast("decimal(38,12)")).as("_b"),
        sum(col("_ssw").cast("decimal(38,12)")).as("_w"))
      .withColumn("df1", col("k") - 1L)
      .withColumn("df2", col("n") - col("k"))
      .select(col("k"), col("n"), col("df1"), col("df2"),
        round(when(col("df1") > 0 && col("df2") > 0 && col("_w").cast("double") > 0,
          (col("_b").cast("double") / col("df1")) /
            (col("_w").cast("double") / col("df2"))), scale).as("f_stat"))
  }

  /** Welch's ANOVA — the k-group mean comparison that stays valid under
    * UNEQUAL group variances (classic [[anovaF]] assumes homoskedasticity
    * the way Student's t does; this is [[welch t]]'s k-group form):
    * groups weight by `wᵢ = nᵢ/sᵢ²`, the statistic is
    * `F* = [Σwᵢ(mᵢ−x̄w)²/(k−1)] / [1 + 2(k−2)Λ/(k²−1)]` with
    * `Λ = Σ(1−wᵢ/W)²/(nᵢ−1)` and Satterthwaite `df₂ = (k²−1)/(3Λ)`.
    * Returns one row `(k, n, k_dropped, df1, df2, f_stat)`; groups with
    * fewer than 2 rows or ZERO variance have no defined weight and are
    * EXCLUDED (counted in `k_dropped`); NULL f/df₂ when fewer than two
    * usable groups remain or Λ = 0 (all groups identical). The counts
    * `(k, n, k_dropped)` are populated even then — `(0, 0, #groups)` when
    * no group is usable — because they fold over ALL groups (t1), not the
    * usable-only frame.
    *
    * Scale shape is [[anovaF]]'s: one partial-agg shuffle to per-group
    * exact decimal moments, then two one-row scalar attaches (the
    * documented crossJoin class) — per-group weights and both folds are
    * pinned scalar IEEE summed on the decimal grid, so a re-deriving
    * engine reproduces the statistic and df₂ bit for bit.
    */
  def welchAnova(df: DataFrame, value: Column, groupCol: Column, scale: Int = 6): DataFrame = {
    val d = df.select(value.cast("double").as("_v"), groupCol.as("_g"))
      .where(col("_v").isNotNull && col("_g").isNotNull)
    val g = graft.Caches.track(d.groupBy(col("_g")).agg(
      count(lit(1)).as("_ng"),
      sum(col("_v").cast("decimal(38,12)")).as("_sg"),
      sum((col("_v") * col("_v")).cast("decimal(38,12)")).as("_qg")))
    val g2 = g
      .withColumn("_mg", col("_sg").cast("double") / col("_ng"))
      .withColumn("_s2",
        (col("_qg").cast("double") - col("_ng") * col("_mg") * col("_mg")) /
          (col("_ng") - 1))
      .withColumn("_ok", col("_ng") > 1 && col("_s2") > 0)
      .withColumn("_w", when(col("_ok"), col("_ng").cast("double") / col("_s2")))
    val t1 = g2.agg(
      sum(when(col("_ok"), 1L).otherwise(0L)).as("k"),
      sum(when(!col("_ok"), 1L).otherwise(0L)).as("k_dropped"),
      sum(when(col("_ok"), col("_ng")).otherwise(0L)).as("n"),
      sum(when(col("_ok"), col("_w").cast("decimal(38,12)"))).as("_wsum"),
      sum(when(col("_ok"), (col("_w") * col("_mg")).cast("decimal(38,12)"))).as("_wm"))
    // counts come from t1 (aggregated over ALL groups, so they hold even
    // when zero groups are usable and this frame is empty — first() over
    // the filtered crossJoin would return NULL k/n/k_dropped there)
    val t2 = g2.where(col("_ok")).crossJoin(broadcast(t1))
      .withColumn("_xw", col("_wm").cast("double") / col("_wsum").cast("double"))
      .agg(
        sum((col("_w") * (col("_mg") - col("_xw")) * (col("_mg") - col("_xw")))
          .cast("decimal(38,12)")).as("_a"),
        sum(((lit(1.0) - col("_w") / col("_wsum").cast("double")) *
          (lit(1.0) - col("_w") / col("_wsum").cast("double")) / (col("_ng") - 1))
          .cast("decimal(38,12)")).as("_lam"))
    val kD = col("k").cast("double")
    t1.crossJoin(broadcast(t2))
      .withColumn("df1", col("k") - 1L)
      .select(col("k"), col("n"), col("k_dropped"), col("df1"),
        round(when(col("k") > 1 && col("_lam").cast("double") > 0,
          (kD * kD - 1) / (lit(3.0) * col("_lam").cast("double"))), scale).as("df2"),
        round(when(col("k") > 1 && col("_lam").cast("double") > 0,
          (col("_a").cast("double") / (kD - 1)) /
            (lit(1.0) + lit(2.0) * (kD - 2) * col("_lam").cast("double") / (kD * kD - 1))),
          scale).as("f_stat"))
  }

  /** Cumulative gains / lift table — the "how much better than random is
    * the top decile" classifier report that completes the eval family
    * (AUC = the whole curve's area, calibration = probability quality,
    * THIS = targeting efficiency). Rows are scored into `bins`
    * equal-count buckets from the TOP score down (tie-broken by
    * `tieCol` — the q107 ntile discipline), and each row reports
    * `(bin, n, pos, cum_pos, gain, lift)`: `gain` = share of all
    * positives captured through this bin, `lift` = that share over the
    * share of rows seen. Exact integer counts; two divisions per output
    * row in pinned order.
    *
    * Scale shape: the global (score, tie) ntile is [[globalNtile]]'s
    * range-partition prefix-sum rank — the full labeled frame never
    * collapses into a single-partition window — and rows then reduce to
    * `bins` aggregates before the (≤ bins)-row cumulative window (bounded
    * by construction: the one window class that is allowed to stay
    * unpartitioned).
    */
  def gainsTable(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int = 10,
      tieCol: Column,
      scale: Int = 6): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // narrow + tracked for the same multi-job reason as calibrationCurve
    val slim = graft.Caches.track(df.where(label.isNotNull)
      .select(score.as("_g_s"), label.as("_g_y"), tieCol.as("_g_t")))
    val binned = globalNtile(slim, bins, Seq(col("_g_s").desc, col("_g_t")), "_bin")
      .groupBy(col("_bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_g_y"), 1L).otherwise(0L)).as("pos"))
    val wc = org.apache.spark.sql.expressions.Window.orderBy(col("_bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    binned
      .withColumn("_cn", sum(col("n")).over(wc))
      .withColumn("cum_pos", sum(col("pos")).over(wc))
      .withColumn("_tp", sum(col("pos")).over(wAll))
      .withColumn("_tn", sum(col("n")).over(wAll))
      .withColumn("gain",
        when(col("_tp") > 0, col("cum_pos").cast("double") / col("_tp")))
      .select(col("_bin").as("bin"), col("n"), col("pos"), col("cum_pos"),
        round(col("gain"), scale).as("gain"),
        round(col("gain") / (col("_cn").cast("double") / col("_tn")), scale).as("lift"))
  }

  /** Benford first-digit deviation — the synthetic-data / fraud screen:
    * naturally-occurring magnitudes follow `P(d) = log₁₀(1 + 1/d)`, and
    * fabricated or templated numbers don't. Returns one row per leading
    * digit `(digit, n, share, expected, deviation)` for values ≥ 1 (the
    * law's domain), `deviation = share − expected`.
    *
    * The digit is extracted from the STRING of the integer part
    * (`floor` is exact, integer→text is engine-identical) — never via
    * `log₁₀`, whose ulp at an exact power of ten could flip the floor in
    * one engine and not the other. Shares are exact-integer ratios with
    * one division; expected values are the nine closed-form constants.
    */
  def benford(df: DataFrame, value: Column, scale: Int = 6): DataFrame = {
    val expectedMap = map((1 to 9).flatMap(d =>
      Seq(lit(d.toString), lit(math.log10(1.0 + 1.0 / d)))): _*)
    val d = df.select(value.cast("double").as("_v"))
      .where(col("_v").isNotNull && col("_v") >= 1.0)
      .select(substring(floor(col("_v")).cast("long").cast("string"), 1, 1).as("digit"))
    val tot = d.agg(count(lit(1)).as("_n"))
    d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .withColumn("share", col("n").cast("double") / col("_n"))
      .withColumn("expected", element_at(expectedMap, col("digit")))
      .select(col("digit"), col("n"), round(col("share"), scale).as("share"),
        round(col("expected"), scale).as("expected"),
        round(col("share") - col("expected"), scale).as("deviation"))
  }

  /** Cramér's V association between two categorical columns — "are
    * language and source independent, and how far from it?" on a 0..1
    * scale (the normalized χ² the drift monitors' cousin answers for a
    * PAIR of dimensions rather than one dimension across time). Returns
    * one row `(n, r, c, chi2, cramers_v)`; V is NULL when either side is
    * constant (association undefined).
    *
    * Exact integer contingency counts (one partial-agg shuffle to
    * |r|·|c| cells, margins re-aggregated from the cells); expected
    * counts and χ² contributions are pinned-order IEEE scalars per cell,
    * decimal-cast before the sum so partitioning cannot move the total;
    * the one-row totals ride the documented scalar-attach crossJoin.
    */
  /** Mutual information between two categorical columns, with both
    * marginal entropies and the normalized score — the information-
    * theoretic face of the [[cramersV]] association question ("how many
    * BITS does knowing the source tell you about the language?" — χ²
    * answers significance, MI answers magnitude in nats):
    * `MI = Σ_xy p_xy · ln(p_xy·n² / (n_x·n_y·n))`, entropies
    * `H = −Σ p·ln p`, `NMI = MI / √(H_a·H_b)` (NULL when either side is
    * constant — nothing to inform about). Returns one row
    * `(n, h_a, h_b, mi, nmi)`.
    *
    * Exact integer contingency counts (one partial-agg shuffle, margins
    * re-aggregated from the cells — the cramersV plumbing); each cell's
    * ln argument is formed from DECIMAL count products (corpus-sized
    * `n_xy·n` would overflow a long exactly at the scale this runs at),
    * the p factors are single exact-integer divisions, and all three sums
    * are decimal-cast before folding so partitioning cannot move them.
    * Only PRESENT cells contribute (0·ln 0 = 0), so no grid completion is
    * needed — the frame is ≤|a|·|b| cells end to end.
    */
  def mutualInformation(df: DataFrame, a: Column, b: Column, scale: Int = 6): DataFrame = {
    val cells = df.where(a.isNotNull && b.isNotNull)
      .groupBy(a.as("_a"), b.as("_b")).agg(count(lit(1)).as("_o"))
    val rowT = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val colT = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val tot  = cells.agg(sum(col("_o")).as("n"))
    val joined = cells
      .join(rowT, Seq("_a"))
      .join(colT, Seq("_b"))
      .crossJoin(tot)
    val pxy = col("_o").cast("double") / col("n")
    val miTerm = pxy * log(
      (col("_o").cast("decimal(38,0)") * col("n")).cast("double") /
        (col("_ra").cast("decimal(38,0)") * col("_cb")).cast("double"))
    val mi = joined
      .agg(first(col("n")).as("n"), sum(miTerm.cast("decimal(38,12)")).as("_mi"))
    def entropy(margin: DataFrame, c: String): DataFrame = margin
      .crossJoin(tot)
      .agg(sum((-(col(c).cast("double") / col("n")) *
        log(col(c).cast("double") / col("n"))).cast("decimal(38,12)")).as(s"_h$c"))
    mi.crossJoin(entropy(rowT, "_ra")).crossJoin(entropy(colT, "_cb"))
      .select(
        col("n"),
        round(col("_h_ra").cast("double"), scale).as("h_a"),
        round(col("_h_cb").cast("double"), scale).as("h_b"),
        round(col("_mi").cast("double"), scale).as("mi"),
        round(when(col("_h_ra") > 0 && col("_h_cb") > 0,
          col("_mi").cast("double") /
            sqrt(col("_h_ra").cast("double") * col("_h_cb").cast("double"))), scale)
          .as("nmi"))
  }

  /** Information-gain screen over CANDIDATE FEATURES: one row per named
    * feature column with the label's entropy, the feature's entropy, their
    * mutual information, and Theil's uncertainty coefficient
    * `U(label|feature) = MI / H(label)` — the fraction of label entropy
    * the feature explains (0 = useless, 1 = the feature determines the
    * label). The feature-selection AND leakage screen in one sweep: a
    * metadata column with U ≈ 1 against a train/eval split label is a
    * leak; against a quality label it's your best cheap classifier input.
    *
    * Each feature is one independent [[mutualInformation]] pass (a
    * cells-shuffle each, no barrier between them — Spark schedules the
    * union's legs concurrently), so the sweep costs |features| scans and
    * the result is |features| rows. `u` divides the ALREADY-ROUNDED mi and
    * h_label (so an engine re-deriving it from this frame's columns gets
    * bit-identical values) and is NULL when the label is constant.
    */
  def infoGainProfile(df: DataFrame, label: Column,
      features: Seq[(String, Column)], scale: Int = 6): DataFrame = {
    require(features.nonEmpty, "features must be non-empty")
    features.map { case (name, f) =>
      mutualInformation(df, label, f, scale)
        .select(lit(name).as("feature"), col("n"),
          col("h_a").as("h_label"), col("h_b").as("h_feature"), col("mi"),
          round(when(col("h_a") > 0, col("mi") / col("h_a")), scale).as("u"))
    }.reduce(_ union _)
  }

  def cramersV(df: DataFrame, a: Column, b: Column, scale: Int = 6): DataFrame = {
    val cells = df.where(a.isNotNull && b.isNotNull)
      .groupBy(a.as("_a"), b.as("_b")).agg(count(lit(1)).as("_o"))
    val rowT = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val colT = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val tot = cells.agg(sum(col("_o")).as("n"),
      countDistinct(col("_a")).as("r"), countDistinct(col("_b")).as("c"))
    // complete the r×c grid: EMPTY cells still expect e > 0 and contribute
    // (0−e)²/e — a present-cells-only sum understates χ² (the margin
    // cross is |r|·|c| rows, bounded by design for categorical dims)
    rowT.crossJoin(colT)
      .join(cells, Seq("_a", "_b"), "left")
      .withColumn("_o", coalesce(col("_o"), lit(0L)))
      .crossJoin(tot)
      .withColumn("_e", col("_ra").cast("double") * col("_cb") / col("n"))
      .withColumn("_d", col("_o").cast("double") - col("_e"))
      .withColumn("_contrib", col("_d") * col("_d") / col("_e"))
      .agg(first(col("n")).as("n"), first(col("r")).as("r"), first(col("c")).as("c"),
        sum(col("_contrib").cast("decimal(38,12)")).as("_s"))
      .select(col("n"), col("r"), col("c"),
        round(col("_s").cast("double"), scale).as("chi2"),
        round(when(least(col("r"), col("c")) >= 2,
          sqrt(col("_s").cast("double") /
            (col("n") * least(col("r") - 1, col("c") - 1)).cast("double"))), scale)
          .as("cramers_v"))
  }

  /** Spearman rank correlation per stratum — the monotone-association
    * monitor robust to outliers and nonlinearity (Pearson on length vs
    * quality is wrecked by one 10 MB document; Spearman is not). Ties get
    * the conventional AVERAGE rank, computed exactly as
    * `rank() + (|tie group| − 1)/2` — half-integers are exact in both
    * doubles and decimals, so the rank frame is engine-identical — and
    * the correlation is then the Pearson closed form over decimal-cast
    * rank moments in pinned IEEE order (the linearFit discipline). NULL
    * where either side's ranks are constant. Returns
    * `(strataCols…, n, spearman)`.
    *
    * Scale shape: two partitioned rank windows + one moments aggregate;
    * nothing wider than the stratum ever sorts together.
    */
  def spearmanCorr(
      df: DataFrame,
      x: Column,
      y: Column,
      strataCols: Seq[String] = Nil,
      scale: Int = 6): DataFrame = {
    val strata = strataCols.map(col)
    def avgRank(c: Column): Column = {
      val wr = org.apache.spark.sql.expressions.Window.partitionBy(strata: _*).orderBy(c)
      val wt = org.apache.spark.sql.expressions.Window.partitionBy((strata :+ c): _*)
      rank().over(wr).cast("double") +
        (count(lit(1)).over(wt) - lit(1L)).cast("double") / lit(2.0)
    }
    val ranked = df.where(x.isNotNull && y.isNotNull)
      .withColumn("_rx", avgRank(x))
      .withColumn("_ry", avgRank(y))
    val agg = ranked.groupBy(strata: _*).agg(
      count(lit(1)).as("n"),
      sum(col("_rx").cast("decimal(38,12)")).as("_sx"),
      sum(col("_ry").cast("decimal(38,12)")).as("_sy"),
      sum((col("_rx") * col("_ry")).cast("decimal(38,12)")).as("_sxy"),
      sum((col("_rx") * col("_rx")).cast("decimal(38,12)")).as("_sxx"),
      sum((col("_ry") * col("_ry")).cast("decimal(38,12)")).as("_syy"))
    agg
      .withColumn("_num",
        col("n") * col("_sxy").cast("double") -
          col("_sx").cast("double") * col("_sy").cast("double"))
      .withColumn("_dx",
        col("n") * col("_sxx").cast("double") -
          col("_sx").cast("double") * col("_sx").cast("double"))
      .withColumn("_dy",
        col("n") * col("_syy").cast("double") -
          col("_sy").cast("double") * col("_sy").cast("double"))
      .select((strata :+ col("n") :+
        round(when(col("_dx") > 0 && col("_dy") > 0,
          col("_num") / (sqrt(col("_dx")) * sqrt(col("_dy")))), scale).as("spearman")): _*)
  }

  /** Welch's unequal-variance two-sample t-test — the A/B significance
    * check run before trusting a metric delta (did the new mix change mean
    * document length? did the experiment arm move conversion latency?).
    * `label` splits rows into group A (true) and B (false); returns one
    * row `(n_a, n_b, mean_a, mean_b, t_stat, dof)` with the
    * Welch–Satterthwaite degrees of freedom. The caller maps `t`/`dof` to
    * a p-value with their table of choice — the incomplete beta does not
    * belong in a data engine.
    *
    * ONE aggregate scan (the Validate one-pass discipline): conditional
    * sums collect per-group `n`, `Σx`, `Σx²` with the moment sums
    * decimal-cast term-by-term — exact and order-free, so partitioning
    * cannot move the moments — and every derived statistic is then scalar
    * IEEE arithmetic in a pinned textual order off those exact aggregates.
    * Groups with fewer than 2 rows yield NULL statistics (undefined
    * variance), not a sentinel.
    */
  def welchTtest(df: DataFrame, value: Column, label: Column, scale: Int = 6): DataFrame = {
    val d = df.select(value.cast("double").as("_v"), label.as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    val m = d.agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_y"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("_y"), col("_v").cast("decimal(38,12)"))).as("_sa"),
      sum(when(!col("_y"), col("_v").cast("decimal(38,12)"))).as("_sb"),
      sum(when(col("_y"), (col("_v") * col("_v")).cast("decimal(38,12)"))).as("_qa"),
      sum(when(!col("_y"), (col("_v") * col("_v")).cast("decimal(38,12)"))).as("_qb"))
    // pinned evaluation order — the oracle mirrors these formulas text-for-text
    m.withColumn("_ma", col("_sa").cast("double") / col("n_a"))
      .withColumn("_mb", col("_sb").cast("double") / col("n_b"))
      .withColumn("_va",
        when(col("n_a") >= 2,
          (col("_qa").cast("double") - col("n_a") * col("_ma") * col("_ma")) / (col("n_a") - 1)))
      .withColumn("_vb",
        when(col("n_b") >= 2,
          (col("_qb").cast("double") - col("n_b") * col("_mb") * col("_mb")) / (col("n_b") - 1)))
      .withColumn("_ea", col("_va") / col("n_a"))
      .withColumn("_eb", col("_vb") / col("n_b"))
      .withColumn("_se2", col("_ea") + col("_eb"))
      .select(
        col("n_a"), col("n_b"),
        round(col("_ma"), scale).as("mean_a"),
        round(col("_mb"), scale).as("mean_b"),
        round((col("_ma") - col("_mb")) / sqrt(col("_se2")), scale).as("t_stat"),
        round(col("_se2") * col("_se2") /
          (col("_ea") * col("_ea") / (col("n_a") - 1) +
            col("_eb") * col("_eb") / (col("n_b") - 1)), scale).as("dof"))
  }

  /** Mann–Whitney U rank-sum test — the NONPARAMETRIC complement of
    * [[welchTtest]] (trust it when the metric is heavy-tailed or ordinal
    * and a mean-based t is the wrong question: "did the new mix shift the
    * length DISTRIBUTION?"). `label` splits rows into group A (true) and
    * B (false); returns one row
    * `(n_a, n_b, u_stat, z_stat, r_rb)` where `u_stat` is group A's U,
    * `z_stat` the tie-corrected normal approximation
    * `z = (U − n_a·n_b/2) / σ`, `σ² = n_a·n_b/12·((n+1) − Σ(t³−t)/(n(n−1)))`,
    * and `r_rb = 2U/(n_a·n_b) − 1` the rank-biserial effect size (≡
    * 2·AUC−1). The caller maps `z` to a p-value with their table of
    * choice (the [[welchTtest]] contract).
    *
    * Rank algebra is [[auc]]'s exact integer midrank form: rows collapse
    * to per-distinct-value `(cnt, n_a)` groups FIRST, the prior-count
    * cumulative runs over that collapsed frame via the [[runningTotal]]
    * range-partition prefix-sum (never a single-partition window — a
    * continuous value column keeps |distinct| ≈ |rows|), and
    * `2·ΣR_A = Σ n_a·(2·prior + cnt + 1)` plus the tie sum `Σ(t³−t)` are
    * folded as DECIMAL products (a corpus-scale `n_a·n` exceeds a long
    * exactly where this runs). Every derived statistic is then scalar
    * IEEE arithmetic in a pinned textual order. NULL statistics when
    * either group is empty or the variance degenerates (all values tied),
    * not a sentinel.
    */
  def mannWhitney(df: DataFrame, value: Column, label: Column, scale: Int = 6): DataFrame = {
    val base = df.select(value.as("_v"), label.as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    // tracked: the collapsed frame feeds the prefix-sum's sample + sums +
    // consumer jobs (the NOTES no-cross-job-CSE discipline)
    val groups = graft.Caches.track(base.groupBy(col("_v"))
      .agg(count(lit(1)).as("_cnt"), sum(when(col("_y"), 1L).otherwise(0L)).as("_na")))
    val ranked = runningTotal(groups, Seq(col("_v")), col("_cnt"), "_cum")
      .withColumn("_prior", col("_cum") - col("_cnt"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = ranked.agg(
      sum(col("_na")).as("n_a"),
      sum(col("_cnt") - col("_na")).as("n_b"),
      sum(dec(col("_na")) * dec(lit(2L) * col("_prior") + col("_cnt") + lit(1L))).as("_m2"),
      coalesce(
        sum(when(col("_cnt") > 1L,
          dec(col("_cnt")) * dec(col("_cnt")) * dec(col("_cnt")) - dec(col("_cnt")))),
        lit(0L).cast("decimal(38,0)")).as("_tie"))
    // pinned evaluation order — the oracle mirrors these formulas text-for-text
    m.withColumn("_u", (col("_m2") - dec(col("n_a")) * dec(col("n_a") + lit(1L))).cast("double") / 2)
      .withColumn("_nab", (dec(col("n_a")) * dec(col("n_b"))).cast("double"))
      .withColumn("_n", (col("n_a") + col("n_b")).cast("double"))
      .withColumn("_var",
        col("_nab") / 12.0 *
          ((col("_n") + 1) - col("_tie").cast("double") / (col("_n") * (col("_n") - 1))))
      .select(
        col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, round(col("_u"), scale)).as("u_stat"),
        when(col("n_a") > 0 && col("n_b") > 0 && col("_var") > 0,
          round((col("_u") - col("_nab") / 2) / sqrt(col("_var")), scale)).as("z_stat"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(lit(2.0) * col("_u") / col("_nab") - 1, scale)).as("r_rb"))
  }

  /** Cliff's delta — the ordinal effect size behind [[mannWhitney]]'s
    * p-value: `δ = P(a > b) − P(a < b)` over all cross-group pairs, the
    * robust "how often does A beat B" reading that survives any monotone
    * transform (where [[cohensD]] needs interval scale). Returns one row
    * `(n_a, n_b, gt_pairs, lt_pairs, tie_pairs, delta)`; NULL delta when
    * either group is empty. |δ| ≥ 0.474 is the conventional "large".
    *
    * NOT the quadratic pair fold: values collapse to cells, and the
    * pair masses come from prefix sums over the value order —
    * `gt = Σ_v cntB(v)·(n_a − cumA(≤v))` etc. — so the whole statistic is
    * one cell collapse + the range-partition prefix sum + one fold, exact
    * DECIMAL integers end to end. Corpus-scale safe where a cells² join
    * would not be.
    */
  def cliffsDelta(df: DataFrame, value: Column, label: Column, scale: Int = 6): DataFrame = {
    val base = df.select(value.as("_v"), label.as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    val groups = graft.Caches.track(base.groupBy(col("_v"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("_ca"),
        sum(when(!col("_y"), 1L).otherwise(0L)).as("_cb")))
    val ranked = runningTotal(groups, Seq(col("_v")), col("_ca"), "_cumA")
      .withColumn("_priorA", col("_cumA") - col("_ca"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = ranked.agg(
      sum(col("_ca")).as("n_a"),
      sum(col("_cb")).as("n_b"),
      coalesce(sum(dec(col("_cb")) * dec(col("_priorA"))), dec(lit(0L))).as("_ltAcc"),
      coalesce(sum(dec(col("_cb")) * dec(col("_cumA"))), dec(lit(0L))).as("_leAcc"),
      coalesce(sum(dec(col("_cb")) * dec(col("_ca"))), dec(lit(0L))).as("_tie"))
    // a < v pairs use the exclusive prefix; a > v pairs are the complement
    m.withColumn("_lt", col("_ltAcc"))
      .withColumn("_gt", dec(col("n_a")) * dec(col("n_b")) - col("_leAcc"))
      .select(
        col("n_a"), col("n_b"),
        col("_gt").cast("long").as("gt_pairs"),
        col("_lt").cast("long").as("lt_pairs"),
        col("_tie").cast("long").as("tie_pairs"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round((col("_gt") - col("_lt")).cast("double") /
            (dec(col("n_a")) * dec(col("n_b"))).cast("double"), scale)).as("delta"))
  }

  /** Hodges–Lehmann two-sample shift estimator — the MEDIAN of all
    * cross-group pairwise differences `a − b`: the robust "how much does
    * A exceed B" companion to [[cliffsDelta]]'s "how often" (it inverts
    * the Mann–Whitney test; breakdown point 29%, where the mean
    * difference breaks at one outlier). Returns one row
    * `(n_a, n_b, n_pairs, hl_shift)` with the type-1 (lower) weighted
    * median of the difference distribution — exact integer rank
    * arithmetic over the pair MASSES, no interpolation, so any engine
    * lands on the same pair difference. NULL when either group is empty.
    *
    * Value grid: integral inputs (int/long/exact decimal) ride a long
    * grid; fractional inputs keep their double values — differences are
    * then exact IEEE subtractions, identical in any IEEE engine, and the
    * rank arithmetic is unaffected because ranks accumulate pair COUNTS
    * (always integers), never the values. (Earlier rounds cast every
    * input to long, silently truncating fractional metrics toward zero —
    * the estimator looked exact while answering a coarsened question.)
    *
    * Scale shape: both sides collapse to value cells FIRST, the
    * difference frame is |cellsA|·|cellsB| rows (the q252/kendallTauB
    * bounded-matrix class — bounded by the value grid, not the corpus),
    * each difference carrying its exact pair mass `ca·cb`; the median
    * pick is one cumulative over the collapsed difference axis.
    */
  def hodgesLehmann(df: DataFrame, value: Column, label: Column, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types._
    val vType = df.select(value.as("_v")).schema.head.dataType
    val isIntegral = vType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType if d.scale == 0                => true
      case _                                             => false
    }
    val gridded = if (isIntegral) value.cast("long") else value.cast("double")
    val base = df.select(gridded.as("_v"), label.as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    val cells = graft.Caches.track(base.groupBy(col("_v"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("_ca"),
        sum(when(!col("_y"), 1L).otherwise(0L)).as("_cb")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val a = cells.where(col("_ca") > 0).select(col("_v").as("_va"), col("_ca"))
    val b = cells.where(col("_cb") > 0).select(col("_v").as("_vb"), col("_cb"))
    val diffs = graft.Caches.track(
      a.crossJoin(b)
        .groupBy((col("_va") - col("_vb")).as("_d"))
        .agg(sum(dec(col("_ca")) * dec(col("_cb"))).as("_w")))
    val ranked = runningTotal(diffs, Seq(col("_d")), col("_w").cast("long"), "_cum")
    val tot = cells.agg(
      sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"),
      (dec(sum(col("_ca"))) * dec(sum(col("_cb")))).cast("long").as("n_pairs"))
    // type-1 lower median: the smallest difference whose cumulative pair
    // mass reaches half the total (2·cum ≥ N — exact integers)
    val pick = ranked.crossJoin(broadcast(tot))
      .where(col("_cum") * 2 >= col("n_pairs"))
      .agg(min(col("_d")).as("_hl"))
    tot.crossJoin(broadcast(pick))
      .select(col("n_a"), col("n_b"), col("n_pairs"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("_hl").cast("double")).as("hl_shift"))
  }

  /** Ansari–Bradley test — the rank test for a SCALE (dispersion)
    * difference between two groups with equal medians: scores grow from
    * both ends toward the middle (`s(r) = min(r, N+1−r)`), so a group
    * whose values crowd the extremes collects LOW scores ⇔ wider spread.
    * The dispersion complement of [[mannWhitney]]'s location test (run
    * both: location shift moves MW, scale shift moves AB). Returns one
    * row `(n_a, n_b, w_ab, z)` — `w_ab` is group A's score sum (midrank
    * ties), z off the exact finite-sample moments of the linear rank
    * statistic. NULL z when the score variance is 0.
    *
    * Exactness: midrank scores ride the DOUBLED integer grid
    * (`2·midrank = 2·prior + cnt + 1`, so `2·s = min(2r, 2(N+1)−2r)` is
    * an exact integer), the three score moments fold as DECIMAL, and the
    * variance numerator `N·Σc·s² − (Σc·s)²` stays exact inside 38
    * digits; the z quotient is pinned scalar IEEE. Scale shape is
    * [[mannWhitney]]'s: one cell collapse + the prefix-sum rank + one
    * fold.
    */
  def ansariBradley(df: DataFrame, value: Column, label: Column, scale: Int = 6): DataFrame = {
    val base = df.select(value.as("_v"), label.as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    val groups = graft.Caches.track(base.groupBy(col("_v"))
      .agg(count(lit(1)).as("_cnt"), sum(when(col("_y"), 1L).otherwise(0L)).as("_na")))
    val ranked = runningTotal(groups, Seq(col("_v")), col("_cnt"), "_cum")
      .withColumn("_prior", col("_cum") - col("_cnt"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // N attaches as the documented one-row scalar crossJoin — never an
    // unpartitioned window over the (corpus-sized for continuous values)
    // cell frame
    val nTot = groups.agg(sum(col("_cnt")).as("_N"))
    val withN = ranked.crossJoin(broadcast(nTot))
    // doubled AB score: 2r = 2·prior+cnt+1; 2(N+1−r) = 2N+1−2·prior−cnt
    val s2 = least(
      lit(2L) * col("_prior") + col("_cnt") + lit(1L),
      lit(2L) * col("_N") + lit(1L) - lit(2L) * col("_prior") - col("_cnt"))
    val m = withN
      .withColumn("_s2", s2)
      .agg(
        sum(col("_na")).as("n_a"),
        sum(col("_cnt") - col("_na")).as("n_b"),
        sum(dec(col("_na")) * dec(col("_s2"))).as("_w2"),
        sum(dec(col("_cnt")) * dec(col("_s2"))).as("_t1"),
        sum(dec(col("_cnt")) * dec(col("_s2")) * dec(col("_s2"))).as("_t2"))
    // doubled-space moments: E[W2] = nA·T1/N; Var[W2] = nA·nB·(N·T2 − T1²)/(N²(N−1))
    val n = (col("n_a") + col("n_b")).cast("double")
    m.withColumn("_e2", col("n_a").cast("double") * col("_t1").cast("double") / n)
      .withColumn("_var2",
        col("n_a").cast("double") * col("n_b").cast("double") *
          (n * col("_t2").cast("double") - col("_t1").cast("double") * col("_t1").cast("double")) /
          (n * n * (n - 1)))
      .select(
        col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("_w2").cast("double") / 2, scale)).as("w_ab"),
        when(col("n_a") > 0 && col("n_b") > 0 && col("_var2") > 0,
          round((col("_w2").cast("double") - col("_e2")) / sqrt(col("_var2")), scale)).as("z"))
  }

  /** Two-sample Cramér–von Mises from (merged) [[histPartials]] STATES —
    * the whole-curve companion of [[ksFromHists]]: where KS reads the
    * single worst CDF gap, CvM integrates the SQUARED gap over the
    * combined distribution (`T = (n·m/N²)·Σ_b w_b·(F_A − F_B)²`, w = the
    * combined bin mass), catching broad mild drift a one-point statistic
    * dilutes. Same state contract: each side folds batches by
    * [[histMerge]], the statistic reads ≤bins rows.
    *
    * Determinism: each bin's CDF gap is the exact integer cross-product
    * `cumA·n_b − cumB·n_a` (the ksFromHists discipline) divided once;
    * per-bin terms are pinned scalar IEEE summed on the decimal grid
    * (order-free), and the final scaling is three pinned ops — a
    * re-deriving engine reproduces T bit for bit.
    */
  def cvmFromHists(histA: DataFrame, histB: DataFrame, scale: Int = 6): DataFrame = {
    val g = histA.select(col("bin"), col("n").as("_c1"))
      .join(histB.select(col("bin"), col("n").as("_c2")), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("_c1"), lit(0L)).as("_c1"),
        coalesce(col("_c2"), lit(0L)).as("_c2"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = g.select(col("bin"), col("_c1"), col("_c2"),
      sum(col("_c1")).over(w).as("_f1"), sum(col("_c2")).over(w).as("_f2"))
    val tot = g.agg(sum(col("_c1")).as("n_a"), sum(col("_c2")).as("n_b"))
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val dGap = (dec38(col("_f1")) * col("n_b") - dec38(col("_f2")) * col("n_a")).cast("double") /
      (col("n_a").cast("double") * col("n_b"))
    val term = (col("_c1") + col("_c2")).cast("double") * dGap * dGap
    cum.crossJoin(tot)
      .agg(
        coalesce(sum(term.cast("decimal(38,12)")), lit(0).cast("decimal(38,12)")).as("_s"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("n_a").cast("double") * col("n_b") /
            ((col("n_a") + col("n_b")).cast("double") * (col("n_a") + col("n_b"))) *
            col("_s").cast("double"), scale)).as("t_stat"))
  }

  /** Brunner–Munzel test — the heteroskedasticity-honest two-sample rank
    * test: like [[mannWhitney]] it asks whether `P(a < b) + ½P(a = b)`
    * deviates from ½, but its variance comes from the PLACEMENTS of each
    * group (Brunner & Munzel 2000), so unequal spreads/shapes don't
    * invalidate the test the way they do the classic rank-sum (the
    * Behrens–Fisher problem in rank form). Returns one row
    * `(n_a, n_b, p_hat, w_stat, df)` — `p_hat` the relative effect
    * `P(a < b) + ½P(a = b)` (0.5 ⇔ stochastic equality), `w_stat` the
    * studentized statistic, `df` the Welch–Satterthwaite degrees of
    * freedom. NULL w/df when either placement variance is 0 (e.g. a
    * constant sample).
    *
    * Exactness: combined and within-group midranks ride the DOUBLED
    * integer grid (`2·midrank = 2·prior + cnt + 1`), so every
    * placement `2(R − R^{(i)})` is an exact integer; the six aggregates
    * (rank sums, placement sums, placement squares) fold as DECIMAL,
    * and p̂/W/df assemble in pinned scalar IEEE an oracle mirrors
    * text-for-text. Scale shape is [[mannWhitney]]'s: one cell
    * collapse + the range-partition prefix sum + one fold — no window
    * over observations, no quadratic term.
    */
  def brunnerMunzel(df: DataFrame, value: Column, label: Column, scale: Int = 6): DataFrame = {
    val base = df.select(value.as("_v"), label.as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    val groups = graft.Caches.track(base.groupBy(col("_v"))
      .agg(count(lit(1)).as("_cnt"), sum(when(col("_y"), 1L).otherwise(0L)).as("_na")))
    val ranked = runningTotals(groups, Seq(col("_v")),
        Seq(col("_cnt") -> "_cum", col("_na") -> "_cumA"))
      .withColumn("_prior", col("_cum") - col("_cnt"))
      .withColumn("_priorA", col("_cumA") - col("_na"))
      .withColumn("_priorB", (col("_cum") - col("_cumA")) - (col("_cnt") - col("_na")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val u  = lit(2L) * col("_prior") + col("_cnt") + lit(1L)   // doubled combined midrank
    val uA = lit(2L) * col("_priorA") + col("_na") + lit(1L)   // doubled within-A midrank
    val nb = col("_cnt") - col("_na")
    val uB = lit(2L) * col("_priorB") + nb + lit(1L)           // doubled within-B midrank
    val dA = u - uA                                            // doubled A-placement
    val dB = u - uB
    val m = ranked.agg(
      sum(col("_na")).as("n_a"),
      sum(nb).as("n_b"),
      sum(dec(col("_na")) * dec(u)).as("_u1"),
      sum(dec(nb) * dec(u)).as("_u2"),
      sum(dec(col("_na")) * dec(dA)).as("_t1"),
      sum(dec(nb) * dec(dB)).as("_t2"),
      sum(dec(col("_na")) * dec(dA) * dec(dA)).as("_sd1"),
      sum(dec(nb) * dec(dB) * dec(dB)).as("_sd2"))
    // pinned assembly — the oracle mirrors these formulas text-for-text
    val n1 = col("n_a").cast("double"); val n2 = col("n_b").cast("double")
    val nT = (col("n_a") + col("n_b")).cast("double")
    m.withColumn("_s1sq",
        (n1 * col("_sd1").cast("double") - col("_t1").cast("double") * col("_t1").cast("double")) /
          (lit(4.0) * n1 * (n1 - 1)))
      .withColumn("_s2sq",
        (n2 * col("_sd2").cast("double") - col("_t2").cast("double") * col("_t2").cast("double")) /
          (lit(4.0) * n2 * (n2 - 1)))
      .withColumn("_rdiff",
        col("_u2").cast("double") / (lit(2.0) * n2) - col("_u1").cast("double") / (lit(2.0) * n1))
      .withColumn("_vsum", n1 * col("_s1sq") + n2 * col("_s2sq"))
      .select(
        col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("_rdiff") / nT + lit(0.5), scale)).as("p_hat"),
        when(col("n_a") > 1 && col("n_b") > 1 && col("_vsum") > 0,
          round(n1 * n2 * col("_rdiff") / (nT * sqrt(col("_vsum"))), scale)).as("w_stat"),
        when(col("n_a") > 1 && col("n_b") > 1 && col("_vsum") > 0,
          round(col("_vsum") * col("_vsum") /
            ((n1 * col("_s1sq")) * (n1 * col("_s1sq")) / (n1 - 1) +
             (n2 * col("_s2sq")) * (n2 * col("_s2sq")) / (n2 - 1)), scale)).as("df"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * labelings of the same rows (classifier vs metadata truth, two
    * annotators, two model versions): one row
    * `(n, po, pe, kappa)` with `po` the observed agreement `Σdiag/n`,
    * `pe` the chance agreement `Σ_k rowMarg_k·colMarg_k / n²`, and
    * `kappa = (po − pe)/(1 − pe)` computed from the ROUNDED po/pe (the
    * q235 Theil's-U discipline — a re-deriving engine lands on the
    * identical quotient). NULL kappa when `pe` rounds to 1 (degenerate:
    * both raters constant).
    *
    * Rows collapse to the contingency cells FIRST (one partial-agg
    * shuffle bounded by |categories|²); margins and the diagonal fold
    * from the cell frame; the margin products are DECIMAL (corpus-scale
    * `rowMarg·colMarg` exceeds a long exactly where this runs). The two
    * one-row scalar attaches are broadcastable by size.
    */
  def cohenKappa(df: DataFrame, a: Column, b: Column, scale: Int = 6): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = graft.Caches.track(
      df.select(a.as("_a"), b.as("_b"))
        .where(col("_a").isNotNull && col("_b").isNotNull)
        .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o")))
    val tot = cells.agg(
      sum(col("_o")).as("n"),
      sum(when(col("_a") === col("_b"), col("_o")).otherwise(0L)).as("_diag"))
    val ra = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val cb = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    // pe pairs category k's row margin with the SAME k's column margin —
    // categories absent on either side contribute 0 (inner join)
    val pe = ra.join(cb, col("_a") === col("_b"))
      .agg(coalesce(sum(dec(col("_ra")) * dec(col("_cb"))), dec(lit(0L))).as("_px"))
    tot.crossJoin(pe)
      .withColumn("_po", round(col("_diag").cast("double") / col("n"), scale))
      .withColumn("_pe",
        round(col("_px").cast("double") / (dec(col("n")) * dec(col("n"))).cast("double"), scale))
      .select(
        col("n"), col("_po").as("po"), col("_pe").as("pe"),
        when(col("_pe") < 1,
          round((col("_po") - col("_pe")) / (lit(1) - col("_pe")), scale)).as("kappa"))
  }

  /** Decision-stump split finder — the single most informative threshold
    * of a numeric feature against a binary label ("below how many chars
    * does non-English concentrate?"): evaluates every candidate split
    * `x ≤ v` at the distinct feature values, scores each by the
    * class-weighted GINI impurity
    * `(n_L/n)·g_L + (n_R/n)·g_R`, `g = 1 − p² − (1−p)²`, and returns the
    * single best row
    * `(threshold, n_left, n_right, gini_split, gini_parent, gain)` —
    * ranked on the ROUNDED score with the threshold as tie-break (the
    * engine-portable cut), `gain` the rounded-difference quotient
    * discipline. Splits that empty one side are not candidates; fewer
    * than two distinct values → empty result (no split exists).
    *
    * Scale shape: rows collapse to the |distinct value| frame first, the
    * left-side cumulative (count, positives) pair rides ONE
    * [[runningTotals]] range-partition prefix-sum pass (never a single-
    * partition window), totals are a one-row scalar attach, each score
    * is pinned scalar IEEE off exact integers, and the arg-min is a
    * TakeOrdered limit 1.
    */
  def bestSplit(df: DataFrame, feature: Column, label: Column, scale: Int = 6): DataFrame = {
    val base = df.select(feature.as("_v"), label.cast("int").cast("long").as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    // tracked: feeds the prefix-sum's sample + sums + consumer jobs
    val groups = graft.Caches.track(base.groupBy(col("_v"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_y")).as("_np")))
    val ranked = runningTotals(groups, Seq(col("_v")),
      Seq(col("_cnt") -> "_cn", col("_np") -> "_cp"))
    val tot = ranked.agg(sum(col("_cnt")).as("_n"), sum(col("_np")).as("_p"))
    val one = lit(1)
    def gini(p: Column): Column = one - p * p - (one - p) * (one - p)
    val scored = ranked.crossJoin(tot)
      .where(col("_cn") < col("_n"))
      .withColumn("_pl", col("_cp").cast("double") / col("_cn"))
      .withColumn("_pr", (col("_p") - col("_cp")).cast("double") / (col("_n") - col("_cn")))
      .withColumn("score",
        round((col("_cn").cast("double") / col("_n")) * gini(col("_pl"))
          + ((col("_n") - col("_cn")).cast("double") / col("_n")) * gini(col("_pr")), scale))
    scored.orderBy(col("score"), col("_v")).limit(1)
      .withColumn("_p0", col("_p").cast("double") / col("_n"))
      .withColumn("_g0", round(gini(col("_p0")), scale))
      .select(col("_v").as("threshold"),
        col("_cn").as("n_left"), (col("_n") - col("_cn")).as("n_right"),
        col("score").as("gini_split"), col("_g0").as("gini_parent"),
        round(col("_g0") - col("score"), scale).as("gain"))
  }

  /** Theil–Sen robust line fit — the median-of-pairwise-slopes estimator
    * ([[linearFit]]'s outlier-proof sibling: one corrupted bucket drags a
    * least-squares slope arbitrarily far, but moves this one only past
    * the 29% breakdown point). Per stratum:
    * `slope = median{ (y_j − y_i)/(x_j − x_i) : x_j > x_i }`,
    * `intercept = median{ y_i − slope·x_i }`. Returns
    * `(strata…, n_pairs, slope, intercept)`.
    *
    * Both medians are the rank-based TYPE-1 pick (`rn = (m+1) div 2` in
    * the value order) — an ACTUAL computed value, no float averaging, so
    * the result is engine-exact: every pairwise slope is one double
    * subtraction and division off exact inputs, and an engine ordering
    * the same values picks the same median. Pairs with equal x are
    * excluded (vertical — standard Theil–Sen).
    *
    * The pair fold is quadratic in the PER-STRATUM row count — the
    * contract is pre-aggregated bounded series (per-bucket counts, daily
    * rollups: the [[kendallTauB]] discipline), never raw events; the
    * median windows are PARTITIONED by the strata. With empty
    * `strataCols` the windows degrade to single-partition — bounded
    * input is then doubly the contract.
    *
    * `x` rides as a double (exact for any integral time axis below 2⁵³
    * and correct for a fractional one) — never a silent `cast("long")`,
    * which would truncate fractional x before the pair slopes and
    * orderings are computed.
    */
  def theilSenFit(
      df: DataFrame,
      x: Column,
      y: Column,
      strataCols: Seq[String] = Nil,
      scale: Int = 6
  ): DataFrame = {
    val ss = strataCols.map(col)
    val base = graft.Caches.track(
      df.select(ss ++ Seq(x.cast("double").as("_x"), y.cast("double").as("_y")): _*)
        .where(col("_x").isNotNull && col("_y").isNotNull))
    val right = base.select(ss ++ Seq(col("_x").as("_x2"), col("_y").as("_y2")): _*)
    val paired =
      if (strataCols.isEmpty) base.crossJoin(right)
      else base.join(right, strataCols)
    val sp = paired.where(col("_x2") > col("_x"))
      .select(ss :+ ((col("_y2") - col("_y")) / (col("_x2") - col("_x")).cast("double"))
        .as("_sl"): _*)
    val wOrd = org.apache.spark.sql.expressions.Window.partitionBy(ss: _*).orderBy(col("_sl"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(ss: _*)
    val med = graft.Caches.track(
      sp.withColumn("_rn", row_number().over(wOrd))
        .withColumn("_m", count(lit(1)).over(wAll))
        .where(col("_rn") === expr("(_m + 1) div 2"))
        .select(ss ++ Seq(col("_m").as("n_pairs"), col("_sl").as("_slope")): _*))
    val resid = (if (strataCols.isEmpty) base.crossJoin(med) else base.join(med, strataCols))
      .withColumn("_r", col("_y") - col("_slope") * col("_x").cast("double"))
    val wrOrd = org.apache.spark.sql.expressions.Window.partitionBy(ss: _*).orderBy(col("_r"))
    val mi = resid
      .withColumn("_rn", row_number().over(wrOrd))
      .withColumn("_mr", count(lit(1)).over(wAll))
      .where(col("_rn") === expr("(_mr + 1) div 2"))
      .select(ss :+ col("_r").as("_icept"): _*)
    val joined = if (strataCols.isEmpty) med.crossJoin(mi) else med.join(mi, strataCols)
    joined.select(ss ++ Seq(col("n_pairs"),
      round(col("_slope"), scale).as("slope"),
      round(col("_icept"), scale).as("intercept")): _*)
  }

  /** Kendall's τ-b — rank correlation by pair CONCORDANCE with the
    * tie-corrected denominator (the [[spearmanCorr]] companion: Spearman
    * measures monotone fit of the rank values, Kendall the probability a
    * random pair sorts the same way on both axes):
    * `τ_b = (C − D) / √((n₀ − n₁)(n₀ − n₂))` with `n₀ = n(n−1)/2` and
    * `n₁/n₂` the per-axis tie-pair counts. One row `(n, tau_b)`; NULL
    * when either axis is constant.
    *
    * Rows collapse to the CONTINGENCY CELLS first; C and D then fold
    * over cell PAIRS (strict upper triangle on x), so the quadratic is
    * in |distinct x|·|distinct y| — never in rows. That makes bounded /
    * binned inputs the contract (categories, integer grades, pre-binned
    * continuous values — the [[aucFromHist]] discipline); a raw
    * continuous column keeps |cells| ≈ |rows| and belongs in
    * [[spearmanCorr]] instead. All pair products are DECIMAL (corpus
    * cell masses multiply past a long); the final quotient is pinned
    * scalar IEEE arithmetic.
    */
  def kendallTauB(df: DataFrame, x: Column, y: Column, scale: Int = 6): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = graft.Caches.track(
      df.select(x.as("_x"), y.as("_y"))
        .where(col("_x").isNotNull && col("_y").isNotNull)
        .groupBy(col("_x"), col("_y")).agg(count(lit(1)).as("_o")))
    val b = cells.select(col("_x").as("_x2"), col("_y").as("_y2"), col("_o").as("_o2"))
    val cd = cells.join(b, col("_x2") > col("_x")).agg(
      coalesce(sum(when(col("_y2") > col("_y"), dec(col("_o")) * dec(col("_o2")))),
        dec(lit(0L))).as("_c"),
      coalesce(sum(when(col("_y2") < col("_y"), dec(col("_o")) * dec(col("_o2")))),
        dec(lit(0L))).as("_d"))
    val n = cells.agg(sum(col("_o")).as("n"))
    val tx = cells.groupBy(col("_x")).agg(sum(col("_o")).as("_t"))
      .agg(coalesce(sum(dec(col("_t")) * dec(col("_t") - 1)), dec(lit(0L))).as("_tx2"))
    val ty = cells.groupBy(col("_y")).agg(sum(col("_o")).as("_t"))
      .agg(coalesce(sum(dec(col("_t")) * dec(col("_t") - 1)), dec(lit(0L))).as("_ty2"))
    // pinned evaluation order — the oracle mirrors these formulas text-for-text
    cd.crossJoin(n).crossJoin(tx).crossJoin(ty)
      .withColumn("_n0", (dec(col("n")) * dec(col("n") - 1)).cast("double") / 2)
      .withColumn("_n1", col("_tx2").cast("double") / 2)
      .withColumn("_n2", col("_ty2").cast("double") / 2)
      .select(col("n"),
        when((col("_n0") - col("_n1")) > 0 && (col("_n0") - col("_n2")) > 0,
          round((col("_c").cast("double") - col("_d").cast("double"))
            / sqrt((col("_n0") - col("_n1")) * (col("_n0") - col("_n2"))), scale))
          .as("tau_b"))
  }

  /** Matthews correlation coefficient — the single-number binary
    * confusion summary that stays honest under class imbalance (a 99%-
    * negative corpus gives accuracy 0.99 to the constant classifier; MCC
    * gives it 0): one row `(tp, fp, tn, fn, mcc)` with
    * `mcc = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn))`, NULL
    * when any marginal is empty (undefined, not a sentinel).
    *
    * ONE conditional-sum scan (the [[welchTtest]] discipline); the four
    * counts are exact longs, the cross products DECIMAL (corpus-scale
    * `tp·tn` exceeds a long), and the final quotient is scalar IEEE
    * arithmetic in a pinned textual order.
    */
  def matthewsCorr(df: DataFrame, pred: Column, label: Column, scale: Int = 6): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = df.select(pred.as("_p"), label.as("_y"))
      .where(col("_p").isNotNull && col("_y").isNotNull)
    val m = d.agg(
      sum(when(col("_p") && col("_y"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("_p") && !col("_y"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("_p") && !col("_y"), 1L).otherwise(0L)).as("tn"),
      sum(when(!col("_p") && col("_y"), 1L).otherwise(0L)).as("fn"))
    m.select(
      col("tp"), col("fp"), col("tn"), col("fn"),
      when((col("tp") + col("fp")) > 0 && (col("tp") + col("fn")) > 0 &&
          (col("tn") + col("fp")) > 0 && (col("tn") + col("fn")) > 0,
        round((dec(col("tp")) * dec(col("tn")) - dec(col("fp")) * dec(col("fn"))).cast("double")
          / sqrt((dec(col("tp") + col("fp")) * dec(col("tp") + col("fn"))).cast("double")
            * (dec(col("tn") + col("fp")) * dec(col("tn") + col("fn"))).cast("double")),
          scale)).as("mcc"))
  }

  /** Per-class precision / recall / F1 — the multiclass scoreboard that
    * [[cohenKappa]] (agreement) and [[matthewsCorr]] (binary quality)
    * don't give: WHERE the classifier fails, class by class. Returns one
    * row per class in the union of predicted and true label spaces:
    * `(class, tp, fp, fn, support, precision, recall, f1)` — classes the
    * model never predicts still appear (precision NULL, recall 0), and
    * hallucinated classes it predicts but that never occur appear too
    * (support 0, recall NULL).
    *
    * Scale shape: rows collapse to the |P|×|Y| contingency cells in one
    * partial-aggregated shuffle; every per-class count is a margin of
    * that bounded frame (two |cells|-row aggregates + one outer join on
    * the class key), so the report costs one scan at any corpus size.
    * tp/fp/fn are exact integers; the three metrics are scalar IEEE
    * quotients off those integers, rounded — engine-portable. F1 divides
    * the ROUNDED precision/recall (the quotient discipline), guarded to
    * the rows where both exist and don't sum to zero.
    */
  def classificationReport(
      df: DataFrame, pred: Column, label: Column, scale: Int = 6): DataFrame = {
    val cells = graft.Caches.track(
      df.select(pred.as("_p"), label.as("_y"))
        .where(col("_p").isNotNull && col("_y").isNotNull)
        .groupBy(col("_p"), col("_y")).agg(count(lit(1)).as("_o")))
    // predicted-side margin: tp + fp per predicted class
    val pm = cells.groupBy(col("_p").as("clazz")).agg(
      sum(when(col("_p") === col("_y"), col("_o")).otherwise(0L)).as("_tpp"),
      sum(when(col("_p") =!= col("_y"), col("_o")).otherwise(0L)).as("fp"))
    // true-side margin: tp + fn per true class
    val ym = cells.groupBy(col("_y").as("clazz")).agg(
      sum(col("_o")).as("support"),
      sum(when(col("_p") =!= col("_y"), col("_o")).otherwise(0L)).as("fn"))
    val joined = pm.join(ym, Seq("clazz"), "full_outer")
      .select(col("clazz"),
        coalesce(col("_tpp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"),
        coalesce(col("support"), lit(0L)).as("support"))
    val prec = when(col("tp") + col("fp") > 0,
      round(col("tp").cast("double") / (col("tp") + col("fp")), scale))
    val rec = when(col("support") > 0,
      round(col("tp").cast("double") / col("support"), scale))
    joined
      .withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
            (col("precision") + col("recall")) > 0,
          round(lit(2) * col("precision") * col("recall")
            / (col("precision") + col("recall")), scale)))
  }

  /** McNemar's paired-classifier test — "is model A actually better than
    * model B, or did they just disagree randomly?" on the SAME examples
    * (an unpaired two-proportion test wastes the pairing and answers a
    * weaker question). Counts the discordant pairs
    * `b` (A right, B wrong) and `c` (A wrong, B right) and returns one
    * row `(n, n_both_right, n_both_wrong, b, c, chi2)` with the
    * continuity-corrected statistic `χ² = (|b−c|−1)² / (b+c)` (df=1;
    * NULL when b+c = 0 — the models never disagree, nothing to test).
    *
    * One scan, one 4-cell aggregate: every count is an exact integer and
    * the statistic is three scalar IEEE ops off them — engine-portable,
    * partition-free.
    */
  def mcnemarTest(
      df: DataFrame, predA: Column, predB: Column, label: Column,
      scale: Int = 6): DataFrame = {
    val d = df.select((predA === label).as("_ra"), (predB === label).as("_rb"))
      .where(col("_ra").isNotNull && col("_rb").isNotNull)
    val m = d.agg(
      count(lit(1)).as("n"),
      sum(when(col("_ra") && col("_rb"), 1L).otherwise(0L)).as("n_both_right"),
      sum(when(!col("_ra") && !col("_rb"), 1L).otherwise(0L)).as("n_both_wrong"),
      sum(when(col("_ra") && !col("_rb"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("_ra") && col("_rb"), 1L).otherwise(0L)).as("c"))
    m.select(col("n"), col("n_both_right"), col("n_both_wrong"), col("b"), col("c"),
      when(col("b") + col("c") > 0,
        round(((abs(col("b") - col("c")) - lit(1)) * (abs(col("b") - col("c")) - lit(1)))
          .cast("double") / (col("b") + col("c")), scale)).as("chi2"))
  }

  /** Probability-quality scoreboard — Brier score, log-loss and expected
    * calibration error of a [0,1] probability against a binary label, in
    * ONE row `(n, brier, log_loss, ece)`. [[calibrationCurve]] draws the
    * reliability diagram; this is the scalar summary you gate a model
    * promotion on.
    *
    * Determinism: the probability is rounded to `scale` digits FIRST and
    * every per-row term is decimal-cast before summation (the token-
    * entropy discipline), so totals are partitioning- and engine-exact:
    *   - brier    = Σ (p−y)² / n        — exact decimal squares;
    *   - log_loss = Σ −ln(p̂ᵢ) / n       — p̂ clamped into
    *     [10⁻⁶, 1−10⁻⁶] so a confident miss costs ln 10⁶, not ∞; each ln
    *     is one libm call on an identical double, decimal-cast at scale
    *     12;
    *   - ece      = Σ_b |Σy − Σp| / n   — over `bins` equal-width
    *     probability bins (p = 1.0 clamps into the top bin); the inner
    *     difference is exact (integer minus scale-6 decimal).
    * One scan, one bounded-bin aggregate, one scalar fold.
    */
  def probEvalReport(
      df: DataFrame, prob: Column, label: Column, bins: Int = 10,
      scale: Int = 6): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // decimal(7,6) holds any [0,1] probability at display scale EXACTLY and
    // keeps the (p−y)² product inside precision 38 (a wider type would trip
    // Spark's precision-loss scale reduction and silently round the squares)
    val p = round(prob.cast("double"), 6).cast("decimal(7,6)")
    val d = df.select(p.as("_p"), label.cast("int").cast("long").as("_y"))
      .where(col("_p").isNotNull && col("_y").isNotNull)
    val eps = 1e-6
    val pc = least(greatest(col("_p").cast("double"), lit(eps)), lit(1 - eps))
    val llTerm = -(col("_y") * log(pc) + (lit(1L) - col("_y")) * log(lit(1.0) - pc))
    val diff = col("_p") - col("_y").cast("decimal(1,0)") // decimal(8,6), exact
    val binned = d
      .withColumn("_bin", least(floor(col("_p").cast("double") * bins), lit((bins - 1).toDouble))
        .cast("long"))
      .withColumn("_sq", (diff * diff).cast("decimal(38,12)"))
      .withColumn("_ll", llTerm.cast("decimal(38,12)"))
      .groupBy(col("_bin")).agg(
        count(lit(1)).as("_n"), sum(col("_y")).as("_sy"),
        sum(col("_p")).as("_sp"), sum(col("_sq")).as("_ssq"), sum(col("_ll")).as("_sll"))
    binned.agg(
      sum(col("_n")).as("n"),
      sum(col("_ssq")).as("_tsq"),
      sum(col("_sll")).as("_tll"),
      sum(abs(col("_sy").cast("decimal(20,6)") - col("_sp"))).as("_tce"))
      .select(col("n"),
        round(col("_tsq").cast("double") / col("n"), scale).as("brier"),
        round(col("_tll").cast("double") / col("n"), scale).as("log_loss"),
        round(col("_tce").cast("double") / col("n"), scale).as("ece"))
  }

  /** Two-proportion z-test — the A/B-test read: did variant B convert
    * better than variant A, beyond what chance explains? Input: one row
    * per SUBJECT with a variant key and a boolean success. Returns one
    * row `(variant_a, variant_b, n_a, x_a, n_b, x_b, rate_a, rate_b,
    * lift, z, lo_a, hi_a, lo_b, hi_b)` — the pooled-variance z statistic
    * plus each variant's Wilson 95% score interval (the interval that
    * stays sane at extreme rates, unlike the Wald ±1.96·√(p̂q̂/n)).
    * Variant A is the lexicographically smaller key (deterministic
    * orientation); requires EXACTLY two variants.
    *
    * One scan, one tracked-cached 1-row aggregate shared by the eager
    * variant-cardinality guard and the result plan, scalar IEEE
    * arithmetic off exact integer counts — engine-portable,
    * partition-free. z is NULL when the pooled rate is degenerate
    * (0 or 1: no variance, nothing to test).
    */
  def twoProportionTest(
      df: DataFrame, variant: Column, success: Column, scale: Int = 6): DataFrame = {
    val per = df.select(variant.as("_v"), success.cast("boolean").as("_s"))
      .where(col("_v").isNotNull && col("_s").isNotNull)
      .groupBy(col("_v")).agg(count(lit(1)).as("_n"),
        sum(when(col("_s"), 1L).otherwise(0L)).as("_x"))
    // tracked-cached 1-row aggregate: the exactly-two-variants guard below
    // is an eager action (the one deliberate one in this module — a wrong
    // variant cardinality should fail loudly at call time, not emit an
    // empty frame downstream), and the cache makes guard + result share
    // ONE scan+aggregate instead of executing the lineage twice
    val two = graft.Caches.track(per.agg(
      count(lit(1)).as("_k"),
      min(col("_v")).as("variant_a"), max(col("_v")).as("variant_b"),
      min_by(col("_n"), col("_v")).as("n_a"), min_by(col("_x"), col("_v")).as("x_a"),
      max_by(col("_n"), col("_v")).as("n_b"), max_by(col("_x"), col("_v")).as("x_b")))
    val z196 = 1.959963984540054 // Φ⁻¹(0.975)
    def wilson(x: Column, n: Column): (Column, Column) = {
      val ph = x.cast("double") / n
      val z2 = lit(z196 * z196)
      val denom = lit(1.0) + z2 / n
      val center = ph + z2 / (lit(2.0) * n)
      val half = lit(z196) * sqrt(ph * (lit(1.0) - ph) / n + z2 / (lit(4.0) * n * n))
      (round((center - half) / denom, scale), round((center + half) / denom, scale))
    }
    val pPool = (col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b"))
    val se = sqrt(pPool * (lit(1.0) - pPool)
      * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    val rateA = col("x_a").cast("double") / col("n_a")
    val rateB = col("x_b").cast("double") / col("n_b")
    val (loA, hiA) = wilson(col("x_a"), col("n_a"))
    val (loB, hiB) = wilson(col("x_b"), col("n_b"))
    val sized = two.where(col("_k") === 2)
    if (sized.isEmpty) {
      throw new IllegalArgumentException(
        "twoProportionTest needs exactly two variants in the variant column")
    }
    sized.select(
      col("variant_a"), col("variant_b"),
      col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round(rateA, scale).as("rate_a"), round(rateB, scale).as("rate_b"),
      round(rateB - rateA, scale).as("lift"),
      when(pPool > 0 && pPool < 1, round((rateB - rateA) / se, scale)).as("z"),
      loA.as("lo_a"), hiA.as("hi_a"), loB.as("lo_b"), hiB.as("hi_b"))
  }

  /** Brown–Forsythe homogeneity-of-variance test — [[anovaF]] asks "do
    * the group MEANS differ?"; this asks the prerequisite question "do
    * the group SPREADS differ?" (classic Levene with the median center —
    * the robust form that survives heavy tails). Per group the center is
    * the TYPE-1 median (an actual data value picked by rank, the
    * [[theilSenFit]] discipline — engine-exact, no interpolation);
    * each row becomes its absolute deviation |x − med_g|, and the
    * returned row is [[anovaF]]'s `(k, n, f_stat)` computed on those
    * deviations: F = [Σnᵢ(z̄ᵢ−z̄)²/(k−1)] / [ΣΣ(z−z̄ᵢ)²/(n−k)].
    *
    * Scale shape: the median pick is one rank window PARTITIONED by the
    * group + one slim |groups|-row broadcast-back; deviations are a
    * projection; the F is [[anovaF]]'s exact-decimal moment fold. Two
    * shuffles total, both on the group key.
    */
  def brownForsythe(
      df: DataFrame, value: Column, groupCol: Column, scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(groupCol.as("_g"), value.cast("double").as("_x"))
      .where(col("_g").isNotNull && col("_x").isNotNull)
    val w = Window.partitionBy(col("_g")).orderBy(col("_x"))
    val meds = base
      .withColumn("_rn", row_number().over(w))
      .withColumn("_m", count(lit(1)).over(Window.partitionBy(col("_g"))))
      .where(col("_rn") === expr("(_m + 1) div 2"))
      .select(col("_g"), col("_x").as("_med"))
    val dev = base.join(broadcast(meds), Seq("_g"))
      .select(col("_g"), abs(col("_x") - col("_med")).as("_z"))
    anovaF(dev, col("_z"), col("_g"), scale)
  }

  /** Split-conformal calibration — the distribution-free prediction-band
    * recipe: given a CALIBRATION sample of nonconformity scores, the
    * threshold `q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration score`
    * guarantees ≥ 1−α coverage on exchangeable future points, no model
    * assumptions. Input: one row per example with a score, a group key
    * and an `isCal` flag (the caller's leakage-safe split — q131's
    * hash folds are the house source). Returns one row per group:
    * `(group…, n_cal, n_eval, qhat, coverage)` where `coverage` is the
    * realized fraction of EVAL scores ≤ q̂ — the empirical check that
    * should land at ≥ 1−α up to sampling noise.
    *
    * q̂ is a TYPE-1 rank pick (an actual calibration score — the
    * [[theilSenFit]] median discipline), with the rank computed in exact
    * integer arithmetic (`⌈(n+1)(1−α)⌉` via integer ceil-division on the
    * rational α = aNum/aDen). A calibration group too small for the rank
    * (⌈(n+1)(1−α)⌉ > n) has an INFINITE conformal band: q̂ is NULL and
    * coverage 1.0 by convention.
    *
    * Scale shape: the rank pick is one row_number window PARTITIONED by
    * the group; eval rows join the slim |groups|-row q̂ frame broadcast;
    * coverage is one partial-aggregated fold. Never a global window.
    */
  def conformalQuantile(
      df: DataFrame,
      score: Column,
      isCal: Column,
      groupCols: Seq[String],
      alphaNum: Int = 1,
      alphaDen: Int = 10,
      scale: Int = 6): DataFrame = {
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"alpha must be in (0,1): got $alphaNum/$alphaDen")
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val base = df.select(gs :+ score.cast("double").as("_s") :+
      isCal.cast("boolean").as("_cal"): _*)
      .where(col("_s").isNotNull && col("_cal").isNotNull)
    val cal = base.where(col("_cal"))
    val w = Window.partitionBy(gs: _*).orderBy(col("_s"))
    // rank = ceil((n+1)·(1−α)) = ((n+1)·(aDen−aNum) + aDen − 1) div aDen
    val need = expr(s"((_n + 1) * ${alphaDen - alphaNum} + ${alphaDen - 1}) div $alphaDen")
    val qhat = cal
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(gs: _*)))
      .withColumn("_need", need)
      .groupBy(gs: _*)
      .agg(
        first(col("_n")).as("n_cal"),
        max(when(col("_rn") === col("_need"), col("_s"))).as("qhat"))
    val cov = base.where(!col("_cal"))
      .join(broadcast(qhat), groupCols)
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_eval"),
        sum(when(col("qhat").isNull || col("_s") <= col("qhat"), 1L).otherwise(0L)).as("_cov"))
    qhat.join(cov, groupCols, "left")
      .select(gs ++ Seq(col("n_cal"), coalesce(col("n_eval"), lit(0L)).as("n_eval"),
        round(col("qhat"), scale).as("qhat"),
        round(when(col("n_eval").isNotNull,
          col("_cov").cast("double") / col("n_eval")), scale).as("coverage")): _*)
  }

  /** Hill tail-index estimator — "how heavy is the tail?" for corpus
    * length / frequency distributions ([[zipfFit]] reads the RANK law;
    * this reads the TAIL law, and the two disagree exactly when the
    * distribution isn't a clean power law). Per stratum, over the top
    * `k+1` order statistics `x₍₁₎ ≥ … ≥ x₍ₖ₊₁₎`:
    * `hill = (1/k)·Σᵢ₌₁..ₖ ln(x₍ᵢ₎/x₍ₖ₊₁₎)` and `alpha = 1/hill` (the
    * Pareto exponent; larger alpha = lighter tail). Returns
    * `(strata…, k, x_tail, hill, alpha)`; strata with fewer than `k+1`
    * positive values are dropped (the estimator needs the full window),
    * and an all-ties window (hill = 0) yields NULL alpha.
    *
    * Determinism: the top-(k+1) VALUE multiset is order-unique (ties at
    * the boundary pick identical values whichever rows rank), each
    * `ln(x/x_tail)` is one libm call decimal-cast before the sum (the
    * token-entropy discipline) — engine-exact.
    *
    * Scale shape: one rank window PARTITIONED by the stratum prunes to
    * ≤(k+1)·|strata| rows before anything else; the fold is one
    * partial-aggregated shuffle on the stratum key.
    */
  /** Standardized-mean-difference covariate balance check — is the A/B
    * split actually balanced on what matters? Per covariate,
    * `SMD = (x̄_t − x̄_c) / √((s²_t + s²_c)/2)` — the unit-free imbalance
    * score (|SMD| > 0.1 is the conventional re-randomize/stratify
    * trigger). Returns one row per covariate:
    * `(covariate, n_t, n_c, mean_t, mean_c, smd, balanced)`.
    *
    * Scale shape: covariates ride ONE struct explode (map-side), so the
    * whole check is a single partial-aggregated shuffle on the covariate
    * key with |covariates| output rows — never one scan per covariate.
    * Exact decimal moments per arm (the [[linearFit]] discipline);
    * pinned scalar SMD; NULL where an arm is degenerate (n < 2 or zero
    * pooled variance).
    */
  def smdBalance(
      df: DataFrame,
      treated: Column,
      covariates: Seq[(String, Column)],
      threshold: Double = 0.1,
      scale: Int = 6): DataFrame = {
    require(covariates.nonEmpty, "smdBalance needs at least one covariate")
    val exploded = df.select(treated.cast("boolean").as("_t"),
      explode(array(covariates.map { case (n, c) =>
        struct(lit(n).as("k"), c.cast("double").as("v"))
      }: _*)).as("_s"))
      .select(col("_t"), col("_s.k").as("_k"), col("_s.v").as("_v"))
      .where(col("_t").isNotNull && col("_v").isNotNull)
    val agg = exploded.groupBy(col("_k")).agg(
      sum(when(col("_t"), 1L).otherwise(0L)).as("n_t"),
      sum(when(!col("_t"), 1L).otherwise(0L)).as("n_c"),
      sum(when(col("_t"), col("_v")).otherwise(0.0).cast("decimal(38,12)")).as("_sxt"),
      sum(when(!col("_t"), col("_v")).otherwise(0.0).cast("decimal(38,12)")).as("_sxc"),
      sum(when(col("_t"), col("_v") * col("_v")).otherwise(0.0)
        .cast("decimal(38,12)")).as("_qxt"),
      sum(when(!col("_t"), col("_v") * col("_v")).otherwise(0.0)
        .cast("decimal(38,12)")).as("_qxc"))
    def mean(s: Column, n: Column) = s.cast("double") / n
    def svar(q: Column, s: Column, n: Column) = {
      val nd = n.cast("double")
      (nd * q.cast("double") - s.cast("double") * s.cast("double")) / (nd * (nd - 1))
    }
    val mt = mean(col("_sxt"), col("n_t")); val mc = mean(col("_sxc"), col("n_c"))
    val vt = svar(col("_qxt"), col("_sxt"), col("n_t"))
    val vc = svar(col("_qxc"), col("_sxc"), col("n_c"))
    val pooled = sqrt((vt + vc) / 2.0)
    val smd = when(col("n_t") > 1 && col("n_c") > 1 && pooled > 0, (mt - mc) / pooled)
    agg.select(col("_k").as("covariate"), col("n_t"), col("n_c"),
      round(mt, scale).as("mean_t"), round(mc, scale).as("mean_c"),
      round(smd, scale).as("smd"),
      (abs(round(smd, scale)) <= threshold).as("balanced"))
  }

  /** CUPED variance reduction (Deng et al. 2013) — shrink an experiment
    * metric's variance with a PRE-period covariate: adjusting
    * `y' = y − θ(x − x̄)` with `θ = cov(x,y)/var(x)` removes exactly the
    * variance the covariate explains (`var(y') = var(y)·(1 − ρ²)`), so
    * the same experiment detects effects √(1−ρ²) smaller — the cheapest
    * sensitivity win in A/B practice. Returns one row
    * `(n, theta, var_y, var_adj, reduction)` — `reduction` is ρ², the
    * fraction of metric variance the pre-period explains.
    *
    * One pass, five exact decimal moment sums, pinned scalar closed
    * forms (`θ = (n·Σxy − ΣxΣy)/(n·Σxx − (Σx)²)`,
    * `var_adj = var_y − θ·cov`); NULL when the covariate is constant.
    */
  def cuped(
      df: DataFrame,
      metric: Column,
      covariate: Column,
      scale: Int = 6): DataFrame = {
    val d = df.select(metric.cast("double").as("_y"), covariate.cast("double").as("_x"))
      .where(col("_x").isNotNull && col("_y").isNotNull)
    val agg = d.agg(
      count(lit(1)).as("n"),
      sum(col("_x").cast("decimal(38,12)")).as("_sx"),
      sum(col("_y").cast("decimal(38,12)")).as("_sy"),
      sum((col("_x") * col("_x")).cast("decimal(38,12)")).as("_sxx"),
      sum((col("_y") * col("_y")).cast("decimal(38,12)")).as("_syy"),
      sum((col("_x") * col("_y")).cast("decimal(38,12)")).as("_sxy"))
    val n = col("n").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val sxx = col("_sxx").cast("double"); val syy = col("_syy").cast("double")
    val sxy = col("_sxy").cast("double")
    val covN = n * sxy - sx * sy   // n²·cov
    val varXN = n * sxx - sx * sx  // n²·var_x
    val varYN = n * syy - sy * sy  // n²·var_y
    val theta = covN / varXN
    val varY = varYN / (n * (n - 1))
    val varAdj = (varYN - covN * covN / varXN) / (n * (n - 1))
    agg.select(col("n"),
      round(when(varXN > 0, theta), scale).as("theta"),
      round(when(col("n") > 1, varY), scale).as("var_y"),
      round(when(col("n") > 1 && varXN > 0, varAdj), scale).as("var_adj"),
      round(when(col("n") > 1 && varXN > 0 && varYN > 0,
        covN * covN / (varXN * varYN)), scale).as("reduction"))
  }

  /** Mantel–Haenszel pooled odds ratio — the Simpson's-paradox-safe way
    * to combine a 2×2 (treated × outcome) question ACROSS strata: the
    * crude pooled table can reverse direction when strata differ in mix
    * ([[twoProportionTest]] reads one table; this reads many honestly):
    * `OR_MH = Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ)` over per-stratum cells
    * `(a=t∧y, b=t∧¬y, c=¬t∧y, d=¬t∧¬y)`. Returns one row
    * `(n_strata, n, sum_ad, sum_bc, or_mh)` — NULL when the denominator
    * is 0 (no discordant control-side evidence).
    *
    * One cells shuffle on the stratum key (output |strata| rows), each
    * rational term decimal-cast before the sums (order-free), one scalar
    * quotient.
    */
  def mantelHaenszel(
      df: DataFrame,
      stratum: Column,
      treated: Column,
      outcome: Column,
      scale: Int = 6): DataFrame = {
    val base = df.select(stratum.as("_s"),
      treated.cast("boolean").as("_t"), outcome.cast("boolean").as("_y"))
      .where(col("_s").isNotNull && col("_t").isNotNull && col("_y").isNotNull)
    val cells = base.groupBy(col("_s")).agg(
      sum(when(col("_t") && col("_y"), 1L).otherwise(0L)).as("_a"),
      sum(when(col("_t") && !col("_y"), 1L).otherwise(0L)).as("_b"),
      sum(when(!col("_t") && col("_y"), 1L).otherwise(0L)).as("_c"),
      sum(when(!col("_t") && !col("_y"), 1L).otherwise(0L)).as("_d"),
      count(lit(1)).as("_n"))
    cells.agg(
      count(lit(1)).as("n_strata"),
      sum(col("_n")).as("n"),
      sum(((col("_a") * col("_d")).cast("double") / col("_n"))
        .cast("decimal(38,12)")).as("_ad"),
      sum(((col("_b") * col("_c")).cast("double") / col("_n"))
        .cast("decimal(38,12)")).as("_bc"))
      .select(col("n_strata"), col("n"),
        round(col("_ad").cast("double"), scale).as("sum_ad"),
        round(col("_bc").cast("double"), scale).as("sum_bc"),
        round(when(col("_bc").cast("double") > 0,
          col("_ad").cast("double") / col("_bc").cast("double")), scale).as("or_mh"))
  }

  /** Benjamini–Hochberg FDR correction — which of m simultaneous
    * hypothesis tests survive at false-discovery rate α? The multiple-
    * comparisons gate every metric sweep needs (a 1000-metric experiment
    * read at per-test p<0.05 "finds" ~50 false effects; BH caps the
    * EXPECTED false fraction among rejections at α). Standard step-up
    * rule: sort p ascending, find the largest k with `p_(k) ≤ k·α/m`,
    * reject ranks 1..k. Appends `(p_rank, m, reject)` to the input rows
    * (null-p rows are excluded — an untested hypothesis can't be
    * rejected).
    *
    * The threshold comparison runs in EXACT rational arithmetic —
    * `p·m·αDen ≤ rank·αNum` on the decimal grid — so no float rounding
    * can flip a boundary rank, and both engines agree bit-for-bit.
    * `tie` must make (p, tie) a total order; ties in p are handled by
    * the step-up rule itself (equal p share the outcome of the highest
    * rank among them reaching the bound ⇒ using each row's own rank
    * then rejecting rank ≤ k* is exactly the textbook rule).
    *
    * Scale shape: the global p-rank rides [[runningTotal]]'s range-
    * partition prefix-sum (never a single-partition window); k* and m
    * are ONE 1-row aggregate attached back as the documented scalar
    * crossJoin. Works on a p table of any size.
    */
  def bhFdr(
      df: DataFrame,
      p: Column,
      tie: Column,
      alphaNum: Int = 1,
      alphaDen: Int = 20,
      scale: Int = 6): DataFrame = {
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"alpha must be in (0,1): got $alphaNum/$alphaDen")
    // decimal(13,12): p ∈ [0,1] needs one integer digit, so the product
    // with the decimal(20,0) scalar m·αDen is decimal(34,12) — inside the
    // 38-digit cap, hence EXACT. A wider cast (e.g. 20,12) would push the
    // product to precision 41 and Spark would silently round it to scale 9,
    // flipping boundary ranks on p grids finer than ~9 decimals.
    val base = df.where(p.isNotNull)
      .withColumn("_bh_p", p.cast("decimal(13,12)"))
    val (ranked0, grand) = prefixSumsCore(
      base, Seq(col("_bh_p"), tie), Seq(lit(1L) -> "p_rank"))
    val m = grand("p_rank")
    val ranked = graft.Caches.track(ranked0)
    // exact rational step-up bound: p·(m·αDen) ≤ rank·αNum — the scalar
    // m·αDen multiplies as ONE literal so the decimal product stays one
    // widening away from the input grid
    val pass = col("_bh_p") * lit(m * alphaDen) <=
      (col("p_rank") * lit(alphaNum.toLong)).cast("decimal(38,12)")
    val kStar = ranked.agg(
      coalesce(max(when(pass, col("p_rank"))), lit(0L)).as("_k"))
    ranked.crossJoin(broadcast(kStar))
      .withColumn("m", lit(m))
      .withColumn("reject", col("p_rank") <= col("_k"))
      .drop("_k", "_bh_p")
  }

  /** Holm–Bonferroni step-down correction — the FWER-controlling
    * complement of [[bhFdr]] ("NO false rejection at all with probability
    * ≥ 1−α", vs BH's bounded false FRACTION): sort p ascending, reject
    * while `p_(k) ≤ α/(m−k+1)`, and STOP at the first failure — every
    * later rank is accepted regardless (the step-down rule; uniformly
    * more powerful than plain Bonferroni, no independence assumption).
    * Appends `(p_rank, m, reject)`; null-p rows are excluded.
    *
    * The bound comparison runs in EXACT rational arithmetic on the
    * decimal grid — `p·((m−k+1)·αDen) ≤ αNum` with p at decimal(13,12)
    * so the product is decimal(34,12), inside the 38-digit cap (the
    * [[bhFdr]] precision discipline). Scale shape is [[bhFdr]]'s: the
    * global p-rank rides the range-partition prefix-sum, k* is ONE 1-row
    * aggregate attached back as the documented scalar crossJoin.
    */
  def holmBonferroni(
      df: DataFrame,
      p: Column,
      tie: Column,
      alphaNum: Int = 1,
      alphaDen: Int = 20,
      scale: Int = 6): DataFrame = {
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"alpha must be in (0,1): got $alphaNum/$alphaDen")
    val base = df.where(p.isNotNull)
      .withColumn("_hb_p", p.cast("decimal(13,12)"))
    val (ranked0, grand) = prefixSumsCore(
      base, Seq(col("_hb_p"), tie), Seq(lit(1L) -> "p_rank"))
    val m = grand("p_rank")
    val ranked = graft.Caches.track(ranked0)
    // step-down: the FIRST failing rank caps every rejection below it
    val fail = col("_hb_p") *
      ((lit(m) - col("p_rank") + 1) * lit(alphaDen.toLong)).cast("decimal(20,0)") >
      lit(alphaNum.toLong).cast("decimal(38,12)")
    val kStar = ranked.agg(
      coalesce(min(when(fail, col("p_rank"))), lit(m + 1L)).as("_k"))
    ranked.crossJoin(broadcast(kStar))
      .withColumn("m", lit(m))
      .withColumn("reject", col("p_rank") < col("_k"))
      .drop("_k", "_hb_p")
  }

  /** Benjamini–Yekutieli step-up correction — [[bhFdr]] under ARBITRARY
    * dependence: the same step-up rule with the bound deflated by the
    * harmonic constant `c(m) = Σ_{i=1..m} 1/i` (BH's FDR guarantee needs
    * independence/PRDS; BY pays a log(m) power tax and holds always).
    * Rejects ranks `k ≤ k* = max{k : p_(k) ≤ k·α/(m·c(m))}`. Appends
    * `(p_rank, m, c_m, reject)`; null-p rows are excluded.
    *
    * Determinism: c(m) has no exact rational form a decimal grid can
    * carry, so unlike [[bhFdr]] the bound is IEEE — but REPRODUCIBLY so:
    * c(m) is folded in ascending-i order (each 1/i correctly rounded,
    * each add sequential), and the comparison is evaluated in one pinned
    * shape `(p·(m·αDen))·c(m) ≤ rank·αNum`, so any engine that folds the
    * same ascending series and the same expression shape (the oracle's
    * recursive CTE) makes the bit-identical decision. Scale shape is
    * [[bhFdr]]'s verbatim: range-partition prefix-sum rank, one 1-row k*
    * aggregate, scalar crossJoin; c(m) is one driver-side O(m) fold of
    * the already-collected count — no extra distributed pass.
    */
  def byFdr(
      df: DataFrame,
      p: Column,
      tie: Column,
      alphaNum: Int = 1,
      alphaDen: Int = 20,
      scale: Int = 6): DataFrame = {
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"alpha must be in (0,1): got $alphaNum/$alphaDen")
    val base = df.where(p.isNotNull)
      .withColumn("_by_p", p.cast("decimal(13,12)"))
    val (ranked0, grand) = prefixSumsCore(
      base, Seq(col("_by_p"), tie), Seq(lit(1L) -> "p_rank"))
    val m = grand("p_rank")
    var cM = 0.0
    var i = 1L
    while (i <= m) { cM += 1.0 / i; i += 1 }
    val ranked = graft.Caches.track(ranked0)
    val pass = (col("_by_p").cast("double") * lit((m * alphaDen).toDouble)) * lit(cM) <=
      col("p_rank").cast("double") * lit(alphaNum.toDouble)
    val kStar = ranked.agg(
      coalesce(max(when(pass, col("p_rank"))), lit(0L)).as("_k"))
    ranked.crossJoin(broadcast(kStar))
      .withColumn("m", lit(m))
      .withColumn("c_m", round(lit(cM), scale))
      .withColumn("reject", col("p_rank") <= col("_k"))
      .drop("_k", "_by_p")
  }

  /** Kish effective sample size / design effect of a weighted sample —
    * "my importance-weighted corpus has 10M rows; how many UNWEIGHTED
    * rows is it actually worth?" `ESS = (Σw)²/Σw²` and
    * `deff = n/ESS ≥ 1` (1 ⇔ uniform weights; a handful of huge weights
    * drives ESS toward the count of those rows — the standard diagnostic
    * before trusting weighted estimates from [[Sampling]]'s temperature /
    * target-mix outputs). Per stratum:
    * `(strata…, n, sum_w, ess, deff)`; NULL ess/deff when Σw² = 0
    * (all-zero weights carry no sample). Null/negative weights are
    * excluded — a negative Kish weight has no sampling interpretation.
    *
    * One partial-aggregated shuffle on the strata key; both moments fold
    * on the exact decimal grid, the two quotients are pinned scalar IEEE.
    */
  def effectiveSampleSize(
      df: DataFrame,
      weight: Column,
      strataCols: Seq[String] = Nil,
      scale: Int = 6): DataFrame = {
    val gs = strataCols.map(col)
    val base = df.select(gs :+ weight.cast("double").as("_w"): _*)
      .where(col("_w").isNotNull && col("_w") >= 0)
    val agg = base.groupBy(gs: _*).agg(
      count(lit(1)).as("n"),
      sum(col("_w").cast("decimal(38,12)")).as("_sw"),
      sum((col("_w") * col("_w")).cast("decimal(38,12)")).as("_sq"))
    val sw = col("_sw").cast("double"); val sq = col("_sq").cast("double")
    agg.select(gs ++ Seq(col("n"),
      round(sw, scale).as("sum_w"),
      round(when(col("_sq") > 0, sw * sw / sq), scale).as("ess"),
      round(when(col("_sq") > 0, col("n") * sq / (sw * sw)), scale).as("deff")): _*)
  }

  /** Cohen's d / Hedges' g standardized effect size — [[welchTtest]]
    * says whether the difference is REAL; this says whether it is BIG
    * (a significant t on 10M rows can be a practically-zero 0.001·σ
    * shift). Pooled-SD form:
    * `d = (x̄_a − x̄_b) / s_p`, `s_p² = ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2)`,
    * and the small-sample-debiased `g = d·(1 − 3/(4(n_a+n_b) − 9))`.
    * `label` splits rows into group A (true) and B (false); returns one
    * row `(n_a, n_b, mean_a, mean_b, sd_pooled, d, g)` — NULL d/g when
    * either group has n < 2 or the pooled variance is 0.
    *
    * [[welchTtest]]'s exact-decimal moment fold (one scan, one 1-row
    * aggregate, pinned scalar evaluation order the oracle mirrors
    * text-for-text) — engine-portable, partition-free.
    */
  def cohensD(df: DataFrame, value: Column, label: Column, scale: Int = 6): DataFrame = {
    val d = df.select(value.cast("double").as("_v"), label.cast("boolean").as("_y"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    val m = d.agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_y"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("_y"), col("_v").cast("decimal(38,12)"))).as("_sa"),
      sum(when(!col("_y"), col("_v").cast("decimal(38,12)"))).as("_sb"),
      sum(when(col("_y"), (col("_v") * col("_v")).cast("decimal(38,12)"))).as("_qa"),
      sum(when(!col("_y"), (col("_v") * col("_v")).cast("decimal(38,12)"))).as("_qb"))
    m.withColumn("_ma", col("_sa").cast("double") / col("n_a"))
      .withColumn("_mb", col("_sb").cast("double") / col("n_b"))
      .withColumn("_ssa",
        when(col("n_a") >= 2, col("_qa").cast("double") - col("n_a") * col("_ma") * col("_ma")))
      .withColumn("_ssb",
        when(col("n_b") >= 2, col("_qb").cast("double") - col("n_b") * col("_mb") * col("_mb")))
      .withColumn("_sp2", (col("_ssa") + col("_ssb")) / (col("n_a") + col("n_b") - 2))
      .withColumn("_d",
        when(col("_sp2") > 0, (col("_ma") - col("_mb")) / sqrt(col("_sp2"))))
      .select(
        col("n_a"), col("n_b"),
        round(col("_ma"), scale).as("mean_a"),
        round(col("_mb"), scale).as("mean_b"),
        round(sqrt(col("_sp2")), scale).as("sd_pooled"),
        round(col("_d"), scale).as("d"),
        round(col("_d") * (lit(1.0) -
          lit(3.0) / (lit(4.0) * (col("n_a") + col("n_b")) - 9)), scale).as("g"))
  }

  /** Exact global trimmed + winsorized mean — the outlier-robust center
    * the plain mean isn't ("mean doc length" where 0.1% of docs are 100×
    * the median drags the mean; trimming drops the tails, winsorizing
    * clamps them). This is the textbook COUNT-cut statistic — exactly
    * `⌊n·trim⌋` rows off each tail of a TOTAL order — where
    * [[Sampling.rankTrim]] / [[winsorize]] are the value-BAND forms
    * (percent-rank bands keep tie groups atomically, so their cut counts
    * drift on tied data; here ties are split by `tieCols` and the count
    * is exact). Cuts `⌊n·trim⌋` rows off EACH tail of the (value, tie)
    * order and returns one row
    * `(n, n_kept, cut, mean, mean_trimmed, mean_winsorized)` — NULL
    * robust means when the trim swallows everything (n − 2·cut ≤ 0).
    *
    * The global rank rides [[runningTotal]]'s range-partition prefix-sum
    * (never a single-partition window); the kept range's min/max ARE the
    * winsorization clamps (the kept slice starts exactly at rank cut+1),
    * so no extra boundary lookups. All three sums fold on the exact
    * decimal grid; `tieCols` must make (value, tie…) a total order.
    */
  def trimmedStats(
      df: DataFrame,
      value: Column,
      tieCols: Seq[Column],
      trimNum: Int = 1,
      trimDen: Int = 20,
      scale: Int = 6): DataFrame = {
    require(trimNum >= 0 && trimDen > 2 * trimNum,
      s"trim fraction must be in [0, 0.5): got $trimNum/$trimDen")
    val base = df.select((value.cast("double").as("_tv") +: tieCols): _*)
      .where(col("_tv").isNotNull)
    val (ranked, grand) = prefixSumsCore(
      base, col("_tv") +: tieCols, Seq(lit(1L) -> "_tr"))
    val n = grand("_tr")
    val cut = n * trimNum / trimDen
    val tracked = graft.Caches.track(ranked)
    val dec = col("_tv").cast("decimal(38,12)")
    val kept = when(col("_tr") > cut && col("_tr") <= n - cut, lit(true))
      .otherwise(lit(false))
    tracked.agg(
        sum(dec).as("_s"),
        sum(when(kept, dec)).as("_st"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        min(when(kept, col("_tv"))).as("_vlo"),
        max(when(kept, col("_tv"))).as("_vhi"))
      .select(
        lit(n).as("n"), col("n_kept"), lit(cut).as("cut"),
        round(col("_s").cast("double") / lit(n), scale).as("mean"),
        round(when(col("n_kept") > 0,
          col("_st").cast("double") / col("n_kept")), scale).as("mean_trimmed"),
        round(when(col("n_kept") > 0,
          (col("_st") + (lit(cut) * (col("_vlo") + col("_vhi"))).cast("decimal(38,12)"))
            .cast("double") / lit(n)), scale).as("mean_winsorized"))
  }

  /** Exact GLOBAL weighted quantile (type-1: the smallest value whose
    * cumulative weight reaches q·W) — "the doc length below which half
    * the TOKEN mass sits" is a weighted median, not a row median.
    * [[weightedQuantileProfile]] is the per-STRATUM form (a partitioned
    * window — bounded per stratum, but its empty-strata degenerate runs
    * the whole corpus through ONE partition); this is the global form on
    * the range-partition prefix-sum core, safe at any corpus size.
    * Weights ride the prefix-sum LONG grid: fractional weights are scaled by
    * `10^weightScale` and rounded (exact for money/quantity-grained
    * weights at the right scale; 0 = integral weights pass through).
    * Returns one row `(total_w, q)` — `total_w` in the scaled units —
    * or an empty frame when the total weight is 0.
    *
    * One range-partition prefix-sum in (value, tie…) order; the pick is
    * a filter + TakeOrdered limit 1, never a global sort. `tieCols` must
    * complete a total order so the pick is engine-deterministic.
    */
  def weightedQuantile(
      df: DataFrame,
      value: Column,
      weight: Column,
      tieCols: Seq[Column],
      qNum: Int,
      qDen: Int,
      weightScale: Int = 0): DataFrame = {
    require(qNum > 0 && qDen >= qNum, s"quantile must be in (0,1]: got $qNum/$qDen")
    require(weightScale >= 0 && weightScale <= 9,
      s"weightScale must be in [0,9]: got $weightScale")
    val mult = math.pow(10, weightScale)
    val wLong = round(weight.cast("double") * lit(mult), 0).cast("long")
    val base = df.select((value.cast("double").as("_qv") +: tieCols :+
      wLong.as("_qw")): _*)
      .where(col("_qv").isNotNull && col("_qw").isNotNull && col("_qw") >= 0)
    val (ranked, grand) = prefixSumsCore(
      base, col("_qv") +: tieCols, Seq(col("_qw") -> "_cw"))
    val sw = grand("_cw")
    if (sw == 0L)
      ranked.limit(0).select(lit(0L).as("total_w"), col("_qv").as("q"))
    else
      ranked
        .where(col("_cw") * qDen >= lit(sw) * qNum)
        .orderBy((col("_qv") +: tieCols): _*)
        .limit(1)
        .select(lit(sw).as("total_w"), col("_qv").as("q"))
  }

  /** Qini coefficient / AUUC — the uplift-model eval ("does the model
    * rank users by INCREMENTAL treatment effect?") that classification
    * metrics cannot see: ranking everyone by score descending, the Qini
    * value at prefix i is `Q(i) = Yᵀ(i) − Yᶜ(i)·Nᵀ(i)/Nᶜ(i)` (treated
    * positives minus the control positives scaled to the treated
    * exposure; 0 while the prefix has no controls), `AUUC = Σᵢ Q(i)/N`
    * and `qini = AUUC − Q(N)·(N+1)/(2N)` — the area between the model
    * curve and the random-targeting diagonal. Returns one row
    * `(n, n_treated, n_control, q_final, auuc, qini)`; NULL summaries
    * when either arm is empty.
    *
    * Scale shape: ONE [[runningTotals]] range-partition prefix-sum
    * carries all four cumulative arms plus the rank in (score, tie)
    * ascending order; the descending prefixes every Qini definition
    * needs are `total − cum + self` off the grand totals (a TOTAL order
    * reverses exactly — no second sort, no descending window). Per-row
    * Q values are pinned scalar IEEE off exact longs, decimal-summed
    * order-free; the two final scalars are literal arithmetic the oracle
    * mirrors text-for-text.
    */
  def qini(
      df: DataFrame,
      score: Column,
      treated: Column,
      outcome: Column,
      tie: Column,
      scale: Int = 6): DataFrame = {
    val base = df.select(score.as("_s"), treated.cast("boolean").as("_t"),
        outcome.cast("boolean").as("_y"), tie)
      .where(col("_s").isNotNull && col("_t").isNotNull && col("_y").isNotNull)
      .withColumn("_wt", when(col("_t"), 1L).otherwise(0L))
      .withColumn("_yt", when(col("_t") && col("_y"), 1L).otherwise(0L))
      .withColumn("_wc", when(!col("_t"), 1L).otherwise(0L))
      .withColumn("_yc", when(!col("_t") && col("_y"), 1L).otherwise(0L))
    val (ranked, grand) = prefixSumsCore(base, Seq(col("_s"), tie),
      Seq(col("_wt") -> "_cwt", col("_yt") -> "_cyt",
        col("_wc") -> "_cwc", col("_yc") -> "_cyc", lit(1L) -> "_crn"))
    val (nT, yT, nC, yC) =
      (grand("_cwt"), grand("_cyt"), grand("_cwc"), grand("_cyc"))
    val n = grand("_crn")
    def desc(cum: String, self: String, total: Long): Column =
      lit(total) - col(cum) + col(self)
    val ntD = desc("_cwt", "_wt", nT); val ytD = desc("_cyt", "_yt", yT)
    val ncD = desc("_cwc", "_wc", nC); val ycD = desc("_cyc", "_yc", yC)
    val qRow = ytD.cast("double") -
      when(ncD > 0, (ycD.cast("double") * ntD) / ncD)
        .otherwise(lit(0.0).cast("double"))
    val agg = ranked.agg(sum(qRow.cast("decimal(38,12)")).as("_sq"))
    if (nT == 0L || nC == 0L || n == 0L)
      agg.select(lit(n).as("n"), lit(nT).as("n_treated"), lit(nC).as("n_control"),
        lit(null).cast("double").as("q_final"),
        lit(null).cast("double").as("auuc"),
        lit(null).cast("double").as("qini"))
    else {
      val qFinal = lit(yT.toDouble) - (lit(yC.toDouble) * lit(nT)) / lit(nC)
      val auuc = col("_sq").cast("double") / lit(n)
      val random = qFinal * (lit(n) + lit(1L)) / (lit(2L) * lit(n))
      agg.select(lit(n).as("n"), lit(nT).as("n_treated"), lit(nC).as("n_control"),
        round(qFinal, scale).as("q_final"),
        round(auuc, scale).as("auuc"),
        round(auuc - random, scale).as("qini"))
    }
  }

  /** Cochran–Armitage trend test — "does the success rate TREND with an
    * ordered dose?" ([[chiSquareDrift]]-style tests ask only whether
    * rates differ somewhere; this asks the one-degree-of-freedom ordered
    * question — purchase rate by hour, quality rate by size bucket —
    * and has far more power when the order is real):
    * `z = Σwᵢ(kᵢ − nᵢ·p̄) / √(p̄(1−p̄)·(Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N))` over dose
    * groups with weights wᵢ = the dose values. Returns one row
    * `(n_doses, n, k, z)`; NULL z when the variance is degenerate (one
    * dose, or p̄ ∈ {0, 1}).
    *
    * One partial-agg shuffle to |doses| rows; the weighted sums fold
    * decimal-cast per-group products (order-free), the final z is pinned
    * scalar IEEE — engine-portable.
    */
  def cochranArmitage(
      df: DataFrame,
      dose: Column,
      success: Column,
      scale: Int = 6): DataFrame = {
    val base = df.select(dose.cast("double").as("_w"), success.cast("boolean").as("_s"))
      .where(col("_w").isNotNull && col("_s").isNotNull)
    val g = base.groupBy(col("_w")).agg(
      count(lit(1)).as("_n"), sum(when(col("_s"), 1L).otherwise(0L)).as("_k"))
    val agg = g.agg(
      count(lit(1)).as("n_doses"),
      sum(col("_n")).as("n"), sum(col("_k")).as("k"),
      sum((col("_w") * col("_k")).cast("decimal(38,12)")).as("_wk"),
      sum((col("_w") * col("_n")).cast("decimal(38,12)")).as("_wn"),
      sum((col("_w") * col("_w") * col("_n")).cast("decimal(38,12)")).as("_wwn"))
    val n = col("n").cast("double")
    val pbar = col("k").cast("double") / n
    val num = col("_wk").cast("double") - pbar * col("_wn").cast("double")
    val vr = pbar * (lit(1.0) - pbar) *
      (col("_wwn").cast("double") -
        col("_wn").cast("double") * col("_wn").cast("double") / n)
    agg.select(col("n_doses"), col("n"), col("k"),
      round(when(vr > 0, num / sqrt(vr)), scale).as("z"))
  }

  /** Empirical-Bayes beta-binomial rate shrinkage — the per-key rate
    * table every serving system actually wants ("this user's purchase
    * rate", "this source's long-doc rate") with the small-sample keys
    * pulled toward the population instead of screaming 0% or 100% off
    * three observations: a Beta(α, β) prior is fitted by method of
    * moments to the per-key raw rates (`α+β = μ(1−μ)/v − 1`,
    * `α = μ·(α+β)`), and every key reports
    * `rate_shrunk = (k + α)/(n + α + β)` — high-n keys keep their data,
    * low-n keys borrow the prior. Returns
    * `(key…, n, k, rate, rate_shrunk, alpha, beta)`; when the moment fit
    * is degenerate (v = 0 or v ≥ μ(1−μ) — rates identical, or wilder
    * than any beta) α/β are NULL and `rate_shrunk` falls back to the raw
    * rate, the honest no-prior read.
    *
    * Portability: raw rates are rounded to `scale` BEFORE the decimal
    * moment sums (both engines then fold identical values, order-free);
    * μ, v, α, β are pinned scalar IEEE; the prior rides the documented
    * one-row crossJoin attach — the per-key table never reshuffles.
    */
  def ebShrinkRates(
      df: DataFrame,
      keyCols: Seq[String],
      success: Column,
      scale: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "ebShrinkRates needs at least one key column")
    val ks = keyCols.map(col)
    val per = graft.Caches.track(
      df.select(ks :+ success.cast("boolean").as("_s"): _*)
        .where(col("_s").isNotNull)
        .groupBy(ks: _*)
        .agg(count(lit(1)).as("n"), sum(when(col("_s"), 1L).otherwise(0L)).as("k"))
        .withColumn("rate", round(col("k").cast("double") / col("n"), scale)))
    val mom = per.agg(
      count(lit(1)).as("_m"),
      sum(col("rate").cast("decimal(38,12)")).as("_sp"),
      sum((col("rate") * col("rate")).cast("decimal(38,12)")).as("_sq"))
    val mu = col("_sp").cast("double") / col("_m")
    val v = col("_sq").cast("double") / col("_m") - mu * mu
    val ab = when(v > 0 && v < mu * (lit(1.0) - mu),
      mu * (lit(1.0) - mu) / v - lit(1.0))
    val prior = mom.select(
      round(mu * ab, scale).as("alpha"),
      round((lit(1.0) - mu) * ab, scale).as("beta"))
    per.crossJoin(broadcast(prior))
      .select(ks ++ Seq(col("n"), col("k"), col("rate"),
        round(coalesce(
          (col("k") + col("alpha")) / (col("n") + col("alpha") + col("beta")),
          col("rate")), scale).as("rate_shrunk"),
        col("alpha"), col("beta")): _*)
  }

  /** Near-zero-variance feature screen (the caret `nearZeroVar` rule) —
    * which columns carry no usable signal? Per listed column:
    * `(column, n, n_distinct, freq_ratio, pct_unique, nzv)` where
    * `freq_ratio` = most-common count over second-most-common (ties at
    * the top give exactly 1; single-valued columns give NULL) and
    * `nzv = freq_ratio > 19 ∧ pct_unique < 0.1` — a dominant mode plus a
    * tiny vocabulary means the feature is a constant in disguise.
    *
    * One partial-aggregated shuffle per column (a bounded union of
    * |cols| legs), each leg's top-2 via TakeOrdered on the collapsed
    * value-counts frame — the top-2 COUNT VALUES are order-unique even
    * when the keys tie. Exact integers; two scalar quotients per row.
    */
  def nzvScreen(
      df: DataFrame,
      cols: Seq[String],
      scale: Int = 6): DataFrame = {
    require(cols.nonEmpty, "nzvScreen needs at least one column")
    val legs = cols.map { c =>
      val counts = graft.Caches.track(
        df.select(col(c).as("_v")).groupBy(col("_v")).agg(count(lit(1)).as("_n")))
      val tot = counts.agg(
        sum(col("_n")).as("n"), count(lit(1)).as("n_distinct"))
      val top2 = counts.orderBy(col("_n").desc).limit(2)
        .agg(max(col("_n")).as("_t1"),
          when(count(lit(1)) === 2, min(col("_n"))).as("_t2"))
      tot.crossJoin(top2).select(
        lit(c).as("column"), col("n"), col("n_distinct"),
        round(col("_t1").cast("double") / col("_t2"), scale).as("freq_ratio"),
        round(col("n_distinct").cast("double") / col("n"), scale).as("pct_unique"))
    }
    legs.reduce(_ unionByName _)
      .withColumn("nzv",
        col("freq_ratio").isNotNull && col("freq_ratio") > 19.0
          && col("pct_unique") < 0.1)
  }

  /** Index of dispersion — is a count series Poisson-ish (variance ≈
    * mean), or does it burst (variance ≫ mean — the overdispersion that
    * invalidates Poisson rate assumptions and argues for negative-
    * binomial modeling / wider alert bands)? Per stratum over a bucketed
    * count series: `(strata…, n, mean, variance, vmr, d)` with the
    * sample variance, `vmr = s²/x̄` (≈1 Poisson, >1 bursty, <1 regular)
    * and `d = (n−1)·s²/x̄` (the χ²_{n−1} dispersion statistic). NULL
    * ratios on a zero-mean or singleton stratum.
    *
    * Exact decimal moments (the [[linearFit]] discipline: Σx, Σx² exact,
    * only the closed-form ratios drop to pinned doubles); one
    * partial-aggregated |strata|-row shuffle.
    */
  def dispersionIndex(
      df: DataFrame,
      value: Column,
      strataCols: Seq[String] = Nil,
      scale: Int = 6): DataFrame = {
    val gs = strataCols.map(col)
    val base = df.select(gs :+ value.cast("double").as("_x"): _*)
      .where(col("_x").isNotNull)
    val agg = base.groupBy(gs: _*).agg(
      count(lit(1)).as("n"),
      sum(col("_x").cast("decimal(38,12)")).as("_sx"),
      sum((col("_x") * col("_x")).cast("decimal(38,12)")).as("_sxx"))
    val n = col("n").cast("double")
    val sx = col("_sx").cast("double"); val sxx = col("_sxx").cast("double")
    val mean = sx / n
    val variance = (n * sxx - sx * sx) / (n * (n - 1))
    agg.select(gs ++ Seq(col("n"),
      round(mean, scale).as("mean"),
      round(when(col("n") > 1, variance), scale).as("variance"),
      round(when(col("n") > 1 && mean > 0, variance / mean), scale).as("vmr"),
      round(when(col("n") > 1 && mean > 0, (n - 1) * variance / mean), scale)
        .as("d")): _*)
  }

  /** Chapman capture–recapture estimate — "how big is the universe, from
    * two overlapping samples?" (`N̂ = (n_A+1)(n_B+1)/(m+1) − 1` with the
    * small-sample bias correction): the mark-recapture estimator the
    * ecology literature built, applied here to corpus unknowns — feed it
    * two INDEPENDENT hash samples of distinct keys (different seeds!)
    * and it estimates the distinct-key total without a full-scan
    * countDistinct; the third family next to Good–Turing (frequency
    * smoothing) and HLL (sketch cardinality). Returns one row
    * `(n_a, n_b, m, n_hat, lo, hi)` with the 95% normal interval off
    * Chapman's variance. NULL estimate when the samples don't overlap
    * (m = 0 still yields the finite Chapman value; the VARIANCE guards
    * itself).
    *
    * Inputs are key frames (one column); counts and the overlap are
    * exact (two distinct-collapses + one equi-join), the estimator is
    * pinned scalar IEEE off exact integers.
    */
  def captureRecapture(
      sampleA: DataFrame,
      sampleB: DataFrame,
      scale: Int = 6): DataFrame = {
    val a = sampleA.toDF("_k").distinct()
    val b = sampleB.toDF("_k").distinct()
    val ca = a.agg(count(lit(1)).as("n_a"))
    val cb = b.agg(count(lit(1)).as("n_b"))
    val cm = a.join(b, Seq("_k"), "left_semi").agg(count(lit(1)).as("m"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val nhat = (dec(col("n_a") + 1) * dec(col("n_b") + 1)).cast("double")
      ./((col("m") + 1).cast("double")) - lit(1.0)
    val varN = (dec(col("n_a") + 1) * dec(col("n_b") + 1)).cast("double")
      .*((dec(col("n_a") - col("m")) * dec(col("n_b") - col("m"))).cast("double"))
      ./(((dec(col("m") + 1) * dec(col("m") + 1)).cast("double")
        * (col("m") + 2).cast("double")))
    val z = 1.959963984540054
    ca.crossJoin(cb).crossJoin(cm)
      .select(col("n_a"), col("n_b"), col("m"),
        round(nhat, scale).as("n_hat"),
        round(nhat - lit(z) * sqrt(varN), scale).as("lo"),
        round(nhat + lit(z) * sqrt(varN), scale).as("hi"))
  }

  /** Cochran's Q — [[mcnemarTest]] generalized to k paired classifiers:
    * "do these k models have the same accuracy on the SAME examples?"
    * (running k² pairwise McNemars inflates the false-positive rate; Q is
    * the one-shot omnibus). Input is LONG form — one row per
    * (subject, treatment) with a boolean success; every subject must
    * carry all k treatments (`balanced` flags violations and Q is NULL
    * on an unbalanced panel rather than silently wrong).
    * `Q = (k−1)·[k·ΣCⱼ² − (ΣCⱼ)²] / [k·ΣRᵢ − ΣRᵢ²]` (χ², df = k−1).
    *
    * Scale shape: one shuffle per margin (subjects / treatments), both
    * partial-aggregated; every term is an exact integer (decimal-held
    * squares), the final Q one scalar IEEE quotient. Returns one row
    * `(k, n, q, balanced)`.
    */
  def cochranQ(
      df: DataFrame,
      subject: Column,
      treatment: Column,
      success: Column,
      scale: Int = 6): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = graft.Caches.track(
      df.select(subject.as("_i"), treatment.as("_j"),
        success.cast("boolean").cast("int").cast("long").as("_x"))
        .where(col("_i").isNotNull && col("_j").isNotNull && col("_x").isNotNull))
    val rows = base.groupBy(col("_i")).agg(sum(col("_x")).as("_r"), count(lit(1)).as("_kk"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_r")).as("_sr"),
        sum(dec(col("_r")) * dec(col("_r"))).as("_sr2"),
        min(col("_kk")).as("_kmin"), max(col("_kk")).as("_kmax"))
    val colsAgg = base.groupBy(col("_j")).agg(sum(col("_x")).as("_c"))
      .agg(
        count(lit(1)).as("k"),
        sum(col("_c")).as("_sc"),
        sum(dec(col("_c")) * dec(col("_c"))).as("_sc2"))
    val j = rows.crossJoin(colsAgg)
      .withColumn("balanced", col("_kmin") === col("k") && col("_kmax") === col("k"))
    val num = (dec(col("k")) * col("_sc2") - dec(col("_sc")) * dec(col("_sc"))).cast("double")
    val den = (dec(col("k")) * dec(col("_sr")) - col("_sr2")).cast("double")
    j.select(col("k"), col("n"),
      when(col("balanced") && den > 0,
        round((col("k") - 1).cast("double") * num / den, scale)).as("q"),
      col("balanced"))
  }

  /** Wald–Wolfowitz runs test — "is this sequence random, or does it
    * streak?" over a BOUNDED ordered series (per-bucket counts — the
    * [[mannKendall]] contract): values are cut at the TYPE-1 median
    * (rank pick — engine-exact), median-equal points are excluded (the
    * standard treatment), and the run count
    * `R = 1 + Σ[bₜ ≠ bₜ₋₁]` compares against
    * `μ = 2n₁n₂/(n₁+n₂) + 1`,
    * `σ² = 2n₁n₂(2n₁n₂−n₁−n₂) / [(n₁+n₂)²(n₁+n₂−1)]`. Too few points on
    * either side (n₁·n₂ = 0) or σ² = 0 → NULL z. Returns one row
    * `(n1, n2, runs, mu, z)`.
    *
    * The rank pick and the lag ride single-partition windows over the
    * COLLAPSED series — the bounded-frame allowlist class (this is a
    * |buckets|-row diagnostic, never a per-event scan).
    */
  def runsTest(
      series: DataFrame,
      tCol: Column,
      xCol: Column,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = series.select(tCol.cast("long").as("_t"), xCol.cast("double").as("_x"))
      .where(col("_t").isNotNull && col("_x").isNotNull)
    val wOrd = Window.orderBy(col("_x"))
    val wAll = Window.partitionBy()
    val med = base
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("_m", count(lit(1)).over(wAll))
      .where(col("_rn") === expr("(_m + 1) div 2"))
      .select(col("_x").as("_med"))
    val kept = graft.Caches.track(
      base.crossJoin(broadcast(med))
        .where(col("_x") =!= col("_med"))
        .withColumn("_b", col("_x") > col("_med")))
    val wT = Window.orderBy(col("_t"))
    val runs = kept
      .withColumn("_prev", lag(col("_b"), 1).over(wT))
      .agg(
        sum(when(col("_b"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("_b"), 1L).otherwise(0L)).as("n2"),
        (sum(when(col("_prev").isNotNull && col("_prev") =!= col("_b"), 1L)
          .otherwise(0L)) + 1L).as("runs"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val nn = n1 + n2
    val mu = lit(2.0) * n1 * n2 / nn + lit(1.0)
    val sig2 = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2) / (nn * nn * (nn - 1))
    runs.select(col("n1"), col("n2"), col("runs"),
      round(when(col("n1") > 0 && col("n2") > 0, mu), scale).as("mu"),
      when(col("n1") > 0 && col("n2") > 0 && sig2 > 0,
        round((col("runs").cast("double") - mu) / sqrt(sig2), scale)).as("z"))
  }

  /** Single changepoint by binary segmentation — WHERE did the level of a
    * series shift? ([[graft.ops.EventAnalytics.cusum]] monitors drift
    * online; this finds the best retrospective split.) For every cut
    * after position i the between-segment sum of squares reduction has
    * the closed CUSUM form
    * `G(i) = (n·Sᵢ − i·Sₙ)² / (n·i·(n−i))` — maximizing G is exactly
    * minimizing the two-segment squared error. Returns the single best
    * row `(t_split, i, n, score, mean_left, mean_right)`: the LAST index
    * of the left segment, ranked on the ROUNDED score with t as
    * tie-break (the [[bestSplit]] arg-max discipline).
    *
    * Scale shape: the prefix sums Sᵢ and the index i ride ONE
    * [[runningTotals]] range-partition pass — this works on a series of
    * ANY length, never a single-partition window; the totals are a
    * one-row scalar attach and the arg-max a TakeOrdered limit 1. Every
    * input to G is an exact decimal; G itself is pinned scalar IEEE.
    */
  def changepoint(
      series: DataFrame,
      tCol: Column,
      xCol: Column,
      scale: Int = 6): DataFrame = {
    val base = series.select(tCol.cast("long").as("_t"),
      xCol.cast("double").as("_x"))
      .where(col("_t").isNotNull && col("_x").isNotNull)
      .withColumn("_xd", round(col("_x"), 6).cast("decimal(18,6)"))
    val ranked = graft.Caches.track(runningTotals(base, Seq(col("_t")),
      Seq(col("_xd") -> "_s", lit(1L) -> "_i")))
    val tot = ranked.agg(sum(col("_xd")).as("_sn"), count(lit(1)).as("_n"))
    val n = col("_n").cast("double")
    val i = col("_i").cast("double")
    val num = n * col("_s").cast("double") - i * col("_sn").cast("double")
    val g = (num * num) / (n * i * (n - i))
    ranked.crossJoin(broadcast(tot))
      .where(col("_i") < col("_n"))
      .withColumn("_g", round(g, scale))
      .orderBy(col("_g").desc, col("_t"))
      .limit(1)
      .select(col("_t").as("t_split"), col("_i").cast("long").as("i"),
        col("_n").cast("long").as("n"), col("_g").as("score"),
        round(col("_s").cast("double") / i, scale).as("mean_left"),
        round((col("_sn") - col("_s")).cast("double") / (n - i), scale).as("mean_right"))
  }

  /** Mann–Kendall trend test — the significance companion of
    * [[theilSenFit]]: Theil–Sen says HOW steep the robust trend is, this
    * says whether a monotone trend EXISTS beyond chance, using only pair
    * orderings (no linearity or distribution assumption — the standard
    * test for "is this metric actually drifting?"). Per stratum over a
    * bounded series `(x=time, y=value)`:
    * `S = Σ_{xᵢ<xⱼ} sign(yⱼ − yᵢ)`,
    * `Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18` (y-tie
    * corrected), and the continuity-corrected
    * `z = (S∓1)/√Var` (0 at S=0, NULL when Var = 0 — a constant series
    * has no trend to test). Returns `(strata…, n, s, var_s, z)`.
    *
    * Everything up to the final two scalar ops is exact integer
    * arithmetic (decimal-held), so the row is engine-portable. The pair
    * fold is quadratic in the PER-STRATUM row count — the
    * [[kendallTauB]]/[[theilSenFit]] bounded pre-aggregated-series
    * contract (per-bucket counts, never raw events); pairs with equal x
    * are excluded (no time order — standard MK). `x` rides as a double
    * (exact for any integral time axis below 2⁵³, correct for a
    * fractional one) — never a silent `cast("long")`, which would
    * truncate fractional x before the pair orderings are computed.
    */
  def mannKendall(
      df: DataFrame,
      x: Column,
      y: Column,
      strataCols: Seq[String] = Nil,
      scale: Int = 6): DataFrame = {
    val gs = strataCols.map(col)
    val base = graft.Caches.track(
      df.select(gs :+ x.cast("double").as("_x") :+ y.cast("double").as("_y"): _*)
        .where(col("_x").isNotNull && col("_y").isNotNull))
    // aliased sides sidestep self-join column ambiguity
    val l = base.select(strataCols.map(k => col(k).as(s"_gl_$k")) :+
      col("_x").as("_xi") :+ col("_y").as("_yi"): _*)
    val r = base.select(strataCols.map(k => col(k).as(s"_gr_$k")) :+
      col("_x").as("_xj") :+ col("_y").as("_yj"): _*)
    val pairCond = (strataCols.map(k => col(s"_gl_$k") === col(s"_gr_$k")) :+
      (col("_xi") < col("_xj"))).reduce(_ && _)
    val sgn = when(col("_yj") > col("_yi"), 1L)
      .when(col("_yj") < col("_yi"), -1L).otherwise(0L)
    val sAgg =
      if (strataCols.nonEmpty)
        l.join(r, pairCond).groupBy(strataCols.map(k => col(s"_gl_$k")): _*)
          .agg(sum(sgn).as("s"))
          .select(strataCols.map(k => col(s"_gl_$k").as(k)) :+ col("s"): _*)
      else l.join(r, col("_xi") < col("_xj")).agg(sum(sgn).as("s"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val ties = base.groupBy(gs :+ col("_y"): _*).agg(count(lit(1)).as("_t"))
      .groupBy(gs: _*)
      .agg(
        sum(col("_t")).as("n"),
        sum(dec(col("_t")) * dec(col("_t") - 1) * dec(col("_t") * 2 + 5)).as("_tc"))
      .withColumn("_vnum",
        dec(col("n")) * dec(col("n") - 1) * dec(col("n") * 2 + 5) - col("_tc"))
    val joined =
      if (strataCols.nonEmpty) ties.join(sAgg, strataCols)
      else ties.crossJoin(sAgg)
    val varS = col("_vnum").cast("double") / 18.0
    joined.select(gs ++ Seq(col("n"), col("s"),
      round(varS, scale).as("var_s"),
      when(varS > 0,
        round(
          when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(varS))
            .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(varS))
            .otherwise(lit(0.0)), scale)).as("z")): _*)
  }

  def hillEstimator(
      df: DataFrame,
      value: Column,
      k: Int,
      strataCols: Seq[String] = Nil,
      scale: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val gs = strataCols.map(col)
    val keyed = if (strataCols.nonEmpty) df.select(gs :+ value.cast("double").as("_x"): _*)
      else df.select(lit(1).as("_k0"), value.cast("double").as("_x"))
    val keys = if (strataCols.nonEmpty) strataCols else Seq("_k0")
    val base = keyed.where(col("_x").isNotNull && col("_x") > 0)
    // per-stratum: a PARTITIONED rank window cuts to k+1 rows per group;
    // global: a TakeOrdered limit cuts FIRST, then the rank runs on the
    // (k+1)-row frame (the bounded single-partition allowlist class —
    // never a whole-corpus global sort)
    val top = graft.Caches.track(
      if (strataCols.nonEmpty) {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_x").desc)
        base.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k + 1)
      } else {
        val cut = base.orderBy(col("_x").desc).limit(k + 1)
        cut.withColumn("_rn",
          row_number().over(Window.partitionBy(col("_k0")).orderBy(col("_x").desc)))
      })
    val tail = top.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_m"), min(col("_x")).as("x_tail"))
      .where(col("_m") === k + 1)
    top.join(broadcast(tail), keys)
      .where(col("_rn") <= k)
      .groupBy(keys.map(col) :+ col("x_tail"): _*)
      .agg(sum(log(col("_x") / col("x_tail")).cast("decimal(38,12)")).as("_sl"))
      .withColumn("hill", round(col("_sl").cast("double") / k, scale))
      .select(gs ++ Seq(lit(k).as("k"), col("x_tail"), col("hill"),
        round(when(col("hill") > 0, lit(1.0) / col("hill")), scale).as("alpha")): _*)
  }

  /** Kruskal–Wallis H test — the k-group generalization of
    * [[mannWhitney]] ("did ANY of the k arms shift the metric's
    * distribution?"), the nonparametric complement of [[anovaF]] for
    * heavy-tailed or ordinal metrics. One row
    * `(k_groups, n, h, h_adj, epsilon_sq)`: `H = 12/(N(N+1))·ΣR_g²/n_g −
    * 3(N+1)` on midranks, `h_adj = H/(1 − Σ(t³−t)/(N³−N))` the standard
    * tie correction (NULL when every value is tied — the statistic is
    * undefined), and `epsilon_sq = (h_adj − k + 1)/(n − k)` the ε²
    * effect size. The caller maps `h_adj` to a p-value against
    * χ²(k−1) with their table of choice (the [[welchTtest]] contract).
    *
    * Rank algebra is [[mannWhitney]]'s exact integer midrank form, one
    * group wider: rows collapse to per-(value, group) cells FIRST, the
    * value-level totals ride the [[runningTotal]] range-partition
    * prefix-sum (never a single-partition window), and the per-group
    * doubled rank sum `2·R_g = Σ c_vg·(2·prior_v + cnt_v + 1)` plus the
    * tie sum fold as exact DECIMAL integers (corpus-scale `(2R_g)²`
    * exceeds a long exactly where this runs; each group's `R_g²/n_g`
    * term is pinned scalar IEEE, re-summed on the decimal grid so the
    * k-term fold has one canonical order in both engines).
    */
  def kruskalWallis(
      df: DataFrame,
      value: Column,
      group: Column,
      scale: Int = 6): DataFrame = {
    val base = df.select(value.as("_v"), group.as("_g"))
      .where(col("_v").isNotNull && col("_g").isNotNull)
    // tracked: cells feed both the value-level axis and the per-group fold
    val cells = graft.Caches.track(
      base.groupBy(col("_v"), col("_g")).agg(count(lit(1)).as("_cg")))
    val vc = graft.Caches.track(
      cells.groupBy(col("_v")).agg(sum(col("_cg")).as("_cnt")))
    val ranked = runningTotal(vc, Seq(col("_v")), col("_cnt"), "_cum")
      .withColumn("_prior", col("_cum") - col("_cnt"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // both sides of the join are keyed on the value — co-partitioned
    val perGroup = cells
      .join(ranked.select(col("_v"), col("_prior"), col("_cnt")), Seq("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_cg")).as("_ng"),
        sum(dec(col("_cg")) * dec(lit(2L) * col("_prior") + col("_cnt") + lit(1L))).as("_r2"))
    val m = perGroup.agg(
      count(lit(1)).as("k_groups"),
      sum(col("_ng")).as("n"),
      sum(((dec(col("_r2")) * dec(col("_r2"))).cast("double") / (col("_ng") * lit(4L)))
        .cast("decimal(38,12)")).as("_sr"))
    val tie = ranked.agg(
      coalesce(
        sum(when(col("_cnt") > 1L,
          dec(col("_cnt")) * dec(col("_cnt")) * dec(col("_cnt")) - dec(col("_cnt")))),
        lit(0L).cast("decimal(38,0)")).as("_tie"))
    // pinned evaluation order — the oracle mirrors these formulas text-for-text
    m.crossJoin(broadcast(tie))
      .withColumn("_nd", col("n").cast("double"))
      .withColumn("_h",
        lit(12.0) / (col("_nd") * (col("_nd") + 1)) * col("_sr").cast("double") -
          lit(3.0) * (col("_nd") + 1))
      .withColumn("_c",
        // guarded: n = 1 zeroes the denominator, and ANSI double division
        // by zero THROWS rather than yielding Infinity
        when(col("_nd") > 1,
          lit(1.0) - col("_tie").cast("double") /
            (col("_nd") * col("_nd") * col("_nd") - col("_nd"))))
      .select(
        col("k_groups"), col("n"),
        round(col("_h"), scale).as("h"),
        when(col("_c") > 0, round(col("_h") / col("_c"), scale)).as("h_adj"),
        when(col("_c") > 0 && col("n") > col("k_groups"),
          round((col("_h") / col("_c") - col("k_groups") + 1) /
            (col("n") - col("k_groups")).cast("double"), scale)).as("epsilon_sq"))
  }

  /** Dunn's test — the post-hoc pairwise companion of [[kruskalWallis]]
    * ("KW said SOME arm shifted; WHICH pairs differ?"): all N
    * observations rank jointly (midranks), and each group pair gets
    * `z_ij = (R̄_i − R̄_j) / √(S²·(1/n_i + 1/n_j))` with the tie-corrected
    * pooled variance `S² = N(N+1)/12 − Σ(t³−t)/(12(N−1))`. Returns one
    * row per unordered pair (group_a < group_b by the group's natural
    * order): `(group_a, group_b, n_a, n_b, mean_rank_a, mean_rank_b, z)`.
    * The caller maps z to p-values with their normal table and their
    * multiplicity correction of choice — Bonferroni over k(k−1)/2 is
    * Dunn's original, [[bhFdr]] the modern default (the [[welchTtest]]
    * p-value contract). NULL z when S² degenerates (all values tied).
    *
    * Scale shape: [[kruskalWallis]]'s exact integer midrank machinery
    * verbatim — per-(value, group) cell collapse, [[runningTotal]]
    * range-partition prefix-sum, doubled rank sums as DECIMAL — then the
    * pair frame is the k-row per-group summary self-joined (k groups,
    * k² pairs — broadcast-sized by construction; group cardinality is a
    * dimension, not the corpus). Mean ranks and z are pinned scalar
    * IEEE off the exact integer folds.
    */
  def dunnTest(
      df: DataFrame,
      value: Column,
      group: Column,
      scale: Int = 6): DataFrame = {
    val base = df.select(value.as("_v"), group.as("_g"))
      .where(col("_v").isNotNull && col("_g").isNotNull)
    val cells = graft.Caches.track(
      base.groupBy(col("_v"), col("_g")).agg(count(lit(1)).as("_cg")))
    val vc = graft.Caches.track(
      cells.groupBy(col("_v")).agg(sum(col("_cg")).as("_cnt")))
    val ranked = runningTotal(vc, Seq(col("_v")), col("_cnt"), "_cum")
      .withColumn("_prior", col("_cum") - col("_cnt"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val perGroup = graft.Caches.track(cells
      .join(ranked.select(col("_v"), col("_prior"), col("_cnt")), Seq("_v"))
      .groupBy(col("_g"))
      .agg(sum(col("_cg")).as("_ng"),
        sum(dec(col("_cg")) * dec(lit(2L) * col("_prior") + col("_cnt") + lit(1L))).as("_r2")))
    val tot = ranked.agg(
      coalesce(sum(col("_cnt")), lit(0L)).as("_n"),
      coalesce(
        sum(when(col("_cnt") > 1L,
          dec(col("_cnt")) * dec(col("_cnt")) * dec(col("_cnt")) - dec(col("_cnt")))),
        lit(0L).cast("decimal(38,0)")).as("_tie"))
    // pinned evaluation order — the oracle mirrors these formulas text-for-text
    val a = perGroup.select(col("_g").as("group_a"), col("_ng").as("n_a"), col("_r2").as("_r2a"))
    val b = perGroup.select(col("_g").as("group_b"), col("_ng").as("n_b"), col("_r2").as("_r2b"))
    a.join(broadcast(b), col("group_a") < col("group_b"))
      .crossJoin(broadcast(tot))
      .withColumn("_nd", col("_n").cast("double"))
      .withColumn("_s2",
        when(col("_n") > 1,
          col("_nd") * (col("_nd") + 1) / 12 -
            col("_tie").cast("double") / (lit(12.0) * (col("_nd") - 1))))
      .withColumn("_ma", col("_r2a").cast("double") / (col("n_a") * lit(2L)))
      .withColumn("_mb", col("_r2b").cast("double") / (col("n_b") * lit(2L)))
      .select(
        col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        round(col("_ma"), scale).as("mean_rank_a"),
        round(col("_mb"), scale).as("mean_rank_b"),
        when(col("_s2") > 0,
          round((col("_ma") - col("_mb")) /
            sqrt(col("_s2") * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), scale))
          .as("z"))
  }

  /** Wilcoxon signed-rank test — the PAIRED nonparametric location test
    * ("did each user's activity shift after the change?"), the
    * within-subject complement of [[mannWhitney]] (which compares two
    * independent samples) and the rank-based alternative to a paired t.
    * `x`/`y` are the paired measurements per row; zero differences are
    * excluded (the standard Wilcoxon treatment — a no-change pair carries
    * no direction evidence). One row `(n, w_plus, z_stat, r_rb)`:
    * `W+` = sum of |d|-midranks over positive differences,
    * `z = (W+ − n(n+1)/4)/σ` with the tie-corrected
    * `σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48`, and
    * `r_rb = (2W+ − S)/S` (S = n(n+1)/2) the matched rank-biserial
    * effect size. NULL z when the variance degenerates.
    *
    * Rank algebra is [[mannWhitney]]'s exact integer midrank form on
    * |d|: rows collapse to per-distinct-|d| `(cnt, n_pos)` cells FIRST,
    * the prior-count cumulative rides the [[runningTotal]] prefix-sum,
    * and `2·W+ = Σ n_pos·(2·prior + cnt + 1)` plus the tie sum fold as
    * DECIMAL integers. Derived statistics are pinned scalar IEEE.
    */
  def wilcoxonSignedRank(
      df: DataFrame,
      x: Column,
      y: Column,
      scale: Int = 6): DataFrame = {
    val base = df
      .select((x.cast("double") - y.cast("double")).as("_d"))
      .where(col("_d").isNotNull && col("_d") =!= 0.0)
    val cells = graft.Caches.track(
      base.groupBy(abs(col("_d")).as("_a"))
        .agg(count(lit(1)).as("_cnt"),
          sum(when(col("_d") > 0, 1L).otherwise(0L)).as("_np")))
    val ranked = runningTotal(cells, Seq(col("_a")), col("_cnt"), "_cum")
      .withColumn("_prior", col("_cum") - col("_cnt"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = ranked.agg(
      // n coalesces to 0: an all-zero-difference input leaves the collapsed
      // frame empty, and the count must read 0, not NULL
      coalesce(sum(col("_cnt")), lit(0L)).as("n"),
      sum(dec(col("_np")) * dec(lit(2L) * col("_prior") + col("_cnt") + lit(1L))).as("_w2"),
      coalesce(
        sum(when(col("_cnt") > 1L,
          dec(col("_cnt")) * dec(col("_cnt")) * dec(col("_cnt")) - dec(col("_cnt")))),
        lit(0L).cast("decimal(38,0)")).as("_tie"))
    // pinned evaluation order — the oracle mirrors these formulas text-for-text
    m.withColumn("_wp", col("_w2").cast("double") / 2)
      .withColumn("_nd", col("n").cast("double"))
      .withColumn("_mu", col("_nd") * (col("_nd") + 1) / 4)
      .withColumn("_var",
        col("_nd") * (col("_nd") + 1) * (col("_nd") * 2 + 1) / 24 -
          col("_tie").cast("double") / 48)
      .withColumn("_s", col("_nd") * (col("_nd") + 1) / 2)
      .select(
        col("n"),
        when(col("n") > 0, round(col("_wp"), scale)).as("w_plus"),
        when(col("n") > 0 && col("_var") > 0,
          round((col("_wp") - col("_mu")) / sqrt(col("_var")), scale)).as("z_stat"),
        when(col("n") > 0,
          round((col("_wp") * 2 - col("_s")) / col("_s"), scale)).as("r_rb"))
  }

  /** Friedman test — the BLOCKED nonparametric k-treatment test ("across
    * users, do the k event types rank consistently by volume?"): rank the
    * k treatments WITHIN each block (midranks on ties), then test whether
    * the per-treatment rank sums could be a random shuffle. Uses the
    * tie-corrected form (Conover):
    * `χ²_F = (k−1)·Σ_j(R_j − b(k+1)/2)² / (A − C)` with
    * `A = Σ r_ij²`, `C = bk(k+1)²/4`; `kendall_w = χ²_F/(b(k−1))` is
    * Kendall's coefficient of concordance (0 = no agreement across
    * blocks, 1 = identical rankings). One row
    * `(b_blocks, k_treatments, chi2_f, kendall_w)`; NULL statistics when
    * A = C (every block internally tied — the test is undefined). The
    * caller maps `chi2_f` to a p-value against χ²(k−1).
    *
    * Contract: ONE observation per (block, treatment) cell; blocks
    * missing a treatment (or carrying duplicate cells) are dropped whole
    * — the classical test requires a complete design, and silently
    * zero-filling would invent data. k is learned from the data (global
    * distinct treatments, one broadcast scalar).
    *
    * Scale shape: ranks come from windows PARTITIONED BY BLOCK (each
    * partition holds k rows — bounded by construction, distributed across
    * blocks); doubled midranks `2r = 2·rank + t − 1` keep the algebra on
    * exact integers, so the numerator `Σ_j(2R_j − b(k+1))²` and
    * denominator `4A − 4C = Σ(2r)² − bk(k+1)²` fold as DECIMALS and the
    * single quotient is pinned scalar IEEE (the /4 cancels exactly).
    */
  def friedmanTest(
      df: DataFrame,
      block: Column,
      treatment: Column,
      value: Column,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(block.as("_b"), treatment.as("_t"), value.as("_v"))
      .where(col("_b").isNotNull && col("_t").isNotNull && col("_v").isNotNull)
    val kRow = base.agg(countDistinct(col("_t")).as("_k"))
    // complete blocks only: exactly k distinct treatments AND k rows
    val blockOk = base.groupBy(col("_b"))
      .agg(count(lit(1)).as("_rows"), countDistinct(col("_t")).as("_kt"))
      .crossJoin(broadcast(kRow))
      .where(col("_rows") === col("_k") && col("_kt") === col("_k"))
      .select(col("_b"), col("_k"))
    val kept = base.join(blockOk, Seq("_b"))
    // within-block midranks, doubled to stay integer: 2r = 2·rank + t − 1
    val wRank = Window.partitionBy(col("_b")).orderBy(col("_v"))
    val wTie = Window.partitionBy(col("_b"), col("_v"))
    val ranked = graft.Caches.track(
      kept.withColumn("_r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - lit(1L)))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val perTreat = ranked.groupBy(col("_t"))
      .agg(sum(dec(col("_r2"))).as("_rj2"), first(col("_k")).as("_k"),
        count(lit(1)).as("_b_cnt"))
    val tot = ranked.agg(
      sum(dec(col("_r2")) * dec(col("_r2"))).as("_a2"),
      countDistinct(col("_b")).as("b_blocks"),
      first(col("_k")).as("k_treatments"))
    // Σ_j (2R_j − b(k+1))² folds on the decimal grid; b and k ride along
    val num = perTreat.crossJoin(broadcast(
        tot.select(col("b_blocks").as("_bb"), col("k_treatments").as("_kk"))))
      .agg(sum(
        (col("_rj2") - dec(col("_bb")) * dec(col("_kk") + lit(1L))) *
        (col("_rj2") - dec(col("_bb")) * dec(col("_kk") + lit(1L)))).as("_n4"))
    // pinned evaluation order — the oracle mirrors these formulas
    // text-for-text. The divisions live INSIDE the when guards: ANSI mode
    // throws DIVIDE_BY_ZERO even for doubles, and CaseWhen branches are
    // the only lazily-evaluated construct.
    val chi = (col("k_treatments") - 1).cast("double") * col("_n4").cast("double") /
      col("_d4").cast("double")
    tot.crossJoin(broadcast(num))
      .withColumn("_d4",
        col("_a2") - dec(col("b_blocks")) * dec(col("k_treatments")) *
          dec((col("k_treatments") + 1) * (col("k_treatments") + 1)))
      .select(
        col("b_blocks"), col("k_treatments"),
        when(col("_d4") > 0, round(chi, scale)).as("chi2_f"),
        when(col("_d4") > 0 && col("b_blocks") > 0 && col("k_treatments") > 1,
          round(chi /
            (col("b_blocks") * (col("k_treatments") - 1)).cast("double"),
            scale)).as("kendall_w"))
  }

  /** Jarque–Bera normality test — "is this distribution even CLOSE to
    * normal?" asked through the two moments a Gaussian pins to zero:
    * `JB = n/6·(g₁² + g₂²/4)` with skewness `g₁ = m₃/m₂^{3/2}` and excess
    * kurtosis `g₂ = m₄/m₂² − 3`. The pre-flight for every test in this
    * file that ASSUMES normality (t, ANOVA, control charts): a heavy
    * tail or lopsided distribution shows up here before it silently
    * inflates a downstream p-value. Returns one row
    * `(n, skewness, kurt_excess, jb)`; NULL where variance is 0.
    *
    * Determinism: values land on the integer grid `round(x·10^s)` and
    * the four power sums S₁..S₄ accumulate as decimal(38,0) — EXACT in
    * any summation order (the [[kendallTauB]] integer-decimal
    * discipline; the caller picks `valueScale` so the grid is faithful —
    * 0 for integer columns, 2 for cents). The central-moment clearing
    * `A = n·S₂ − S₁²`, `B = n²·S₃ − 3n·S₁·S₂ + 2S₁³`,
    * `C = n³·S₄ − 4n²·S₁·S₃ + 6n·S₁²·S₂ − 3S₁⁴` evaluates as ONE pinned
    * IEEE scalar expression off those exact sums (skewness and kurtosis
    * are scale-invariant, so the 10^s grid factor cancels and never
    * needs de-scaling); `A^{3/2}` is written `A·√A` because `sqrt` is
    * correctly rounded IEEE everywhere while `pow` is not.
    *
    * Scale shape: ONE conditional-sum scan (the [[welchTtest]]
    * discipline), one 1-row result — no shuffle beyond the partial-agg
    * fold. Magnitude contract: |x·10^s| ≲ 1e9 keeps S₄ inside 38 digits
    * at 10¹² rows.
    */
  def jarqueBera(
      df: DataFrame,
      value: Column,
      valueScale: Int = 0,
      scale: Int = 6): DataFrame = {
    require(valueScale >= 0 && valueScale <= 6,
      s"valueScale must be in [0, 6], got $valueScale")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val g = dec(round(value.cast("double") * math.pow(10, valueScale).toLong, 0)
      .cast("long"))
    val sums = df.where(value.isNotNull).agg(
      count(lit(1)).as("n"),
      sum(g).as("_s1"),
      sum(g * g).as("_s2"),
      sum(g * g * g).as("_s3"),
      sum(g * g * g * g).as("_s4"))
    val n = col("n").cast("double")
    val s1 = col("_s1").cast("double"); val s2 = col("_s2").cast("double")
    val s3 = col("_s3").cast("double"); val s4 = col("_s4").cast("double")
    val a = n * s2 - s1 * s1                                   // n²·m₂
    val b = n * n * s3 - lit(3.0) * n * s1 * s2 + lit(2.0) * s1 * s1 * s1
    val c = n * n * n * s4 - lit(4.0) * n * n * s1 * s3 +
      lit(6.0) * n * s1 * s1 * s2 - lit(3.0) * s1 * s1 * s1 * s1
    val skew = b / (a * sqrt(a))
    val kurt = c / (a * a) - lit(3.0)
    sums.select(col("n"),
      round(when(a > 0, skew), scale).as("skewness"),
      round(when(a > 0, kurt), scale).as("kurt_excess"),
      round(when(a > 0, n / 6.0 * (skew * skew + kurt * kurt / 4.0)), scale)
        .as("jb"))
  }

  /** Durbin–Watson statistic — "are the residuals of this trend fit
    * serially correlated?" The stat every least-squares-over-time fit
    * owes its reader: `DW = Σ(e_t − e_{t−1})² / Σe_t²` over the
    * residuals of the OLS line of x on t, ≈ 2(1 − ρ₁) — near 2 means
    * independent errors, toward 0 positive autocorrelation (the usual
    * failure: a trend fit on a seasonal series), toward 4 negative.
    * Input: a collapsed series `(t, x)` on a contiguous integer axis
    * (the [[graft.ops.EventAnalytics.autocorrelation]] contract — fill
    * gaps BEFORE calling or consecutive pairs silently skip them).
    * Returns one row `(n, slope, intercept, dw)`.
    *
    * Determinism: the fit rides an exact decimal moment fold (t, x at
    * decimal(18,6); the [[linearFit]] discipline) with slope/intercept
    * as pinned IEEE scalars; each residual is then the SAME IEEE
    * expression per row in any engine, the numerator pairs consecutive
    * t by equi-join (no window), and both quadratic sums are
    * decimal(38,12)-cast before summing — order-free.
    *
    * Scale shape: one moment fold + one self equi-join on `t+1` over
    * the ALREADY-COLLAPSED series (|buckets| rows, never raw events) +
    * one 1-row fold. The scalar fit attaches via broadcast crossJoin.
    */
  def durbinWatson(series: DataFrame, scale: Int = 6): DataFrame = {
    val s = graft.Caches.track(series.select(
      col("t").cast("long").as("t"),
      col("x").cast("double").as("_x"))
      .where(col("t").isNotNull && col("_x").isNotNull))
    val td = col("t").cast("decimal(18,6)")
    val xd = col("_x").cast("decimal(18,6)")
    val mom = s.agg(
      count(lit(1)).as("n"),
      sum(td).as("_st"), sum(xd).as("_sx"),
      sum(td * td).as("_stt"), sum(td * xd).as("_stx"))
    val n = col("n").cast("double")
    val st = col("_st").cast("double"); val sx = col("_sx").cast("double")
    val stt = col("_stt").cast("double"); val stx = col("_stx").cast("double")
    val varT = n * stt - st * st
    val fit = mom.select(col("n"),
      when(varT > 0, (n * stx - st * sx) / varT).as("_b"),
      when(varT > 0, (sx - (n * stx - st * sx) / varT * st) / n).as("_a"))
    val e = col("_x") - (col("_a") + col("_b") * col("t").cast("double"))
    val withE = s.crossJoin(broadcast(fit)).select(
      col("t"), col("n"), col("_a"), col("_b"), e.as("_e"))
    val nxt = withE.select((col("t") - 1L).as("t"), col("_e").as("_e2"))
    val den = withE.agg(
      first(col("n")).as("n"),
      round(first(col("_b")), scale).as("slope"),
      round(first(col("_a")), scale).as("intercept"),
      sum((col("_e") * col("_e")).cast("decimal(38,12)")).as("_den"))
    val num = withE.join(nxt, Seq("t")).agg(
      coalesce(sum(((col("_e2") - col("_e")) * (col("_e2") - col("_e")))
        .cast("decimal(38,12)")), lit(0.0).cast("decimal(38,12)")).as("_num"))
    den.crossJoin(broadcast(num)).select(
      col("n"), col("slope"), col("intercept"),
      round(when(col("_den").cast("double") > 0,
        col("_num").cast("double") / col("_den").cast("double")), scale).as("dw"))
  }

  /** Ljung–Box portmanteau test — "is this series white noise, or is
    * there structure across the first m lags JOINTLY?"
    * `Q = n(n+2)·Σ_{k=1..m} r_k²/(n−k)`, χ²(m) under the null — the
    * one-number companion to reading an ACF plot lag by lag (twenty
    * |r_k| < 0.1 lags can still be jointly damning). Input: collapsed
    * contiguous series `(t, x)` (the
    * [[graft.ops.EventAnalytics.autocorrelation]] contract). Returns one
    * row `(n, max_lag, q_stat)`.
    *
    * Determinism: the per-lag r_k reuse the autocorrelation estimator's
    * exact-decimal machinery UNROUNDED (x at decimal(18,6); per-lag C_k,
    * P_k and global S₁, S₂ exact; each r_k one pinned IEEE scalar —
    * rounding r_k first, as reading q265's output would, loses the
    * boundary digits Q then amplifies by n). The m per-lag terms
    * decimal-cast before the final fold — order-free.
    *
    * Scale shape: identical to the ACF — one lag-exploded self
    * equi-join over the collapsed series, one |lags|-row fold, one
    * scalar attach, one ≤m-row reduction.
    */
  def ljungBox(series: DataFrame, maxLag: Int, scale: Int = 6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val x = graft.Caches.track(
      series.select(col("t").cast("long").as("t"),
        col("x").cast("decimal(18,6)").as("_xd")))
    val tot = x.agg(
      count(lit(1)).as("_n"),
      sum(col("_xd")).as("_s1"),
      sum(col("_xd") * col("_xd")).as("_s2"))
    val lags = explode(array((1 to maxLag).map(l => lit(l.toLong)): _*)).as("lag")
    val paired = x.select(col("t"), col("_xd"), lags)
      .withColumn("_tk", col("t") + col("lag"))
      .join(x.select(col("t").as("_tk"), col("_xd").as("_xk")), Seq("_tk"))
    val perLag = paired.groupBy(col("lag")).agg(
      count(lit(1)).as("_m"),
      sum(col("_xd") * col("_xk")).as("_ck"),
      sum(col("_xd") + col("_xk")).as("_pk"))
    val n = col("_n").cast("double")
    val s1 = col("_s1").cast("double"); val s2 = col("_s2").cast("double")
    val ck = col("_ck").cast("double"); val pk = col("_pk").cast("double")
    val m = col("_m").cast("double")
    val r = (n * n * ck - n * s1 * pk + m * s1 * s1) /
      (n * n * s2 - n * s1 * s1)
    val den = n * n * s2 - n * s1 * s1
    perLag.crossJoin(broadcast(tot))
      .select(col("_n"),
        when(den > 0 && (col("_n") - col("lag")) > 0,
          r * r / (n - col("lag").cast("double"))).as("_term"))
      .agg(first(col("_n")).as("n"), lit(maxLag).as("max_lag"),
        sum(col("_term").cast("decimal(38,12)")).as("_sum"))
      .select(col("n"), col("max_lag"),
        round(col("n").cast("double") * (col("n") + 2).cast("double") *
          col("_sum").cast("double"), scale).as("q_stat"))
  }

  /** Breusch–Pagan / Koenker heteroscedasticity test — "does the error
    * VARIANCE grow with x?" (OLS stays unbiased under heteroscedasticity
    * but every stderr it reports is wrong — this is the check that says
    * whether to trust them). Auxiliary regression of the squared
    * residuals e² on x: Koenker's studentized `LM = n·R²_aux` (χ²(1),
    * the robust default) plus the classic normality-assuming
    * `BP = R²_aux·(n²·S_zz/S_z² − n)/2`. Returns one row
    * `(n, slope, intercept, r2_aux, lm, bp)`.
    *
    * Determinism: pass 1 is [[linearFit]]'s exact decimal moment fold
    * (slope/intercept pinned IEEE scalars); pass 2 attaches them via
    * broadcast and computes per-row `z = e²` as the SAME IEEE expression
    * everywhere, with Σz, Σz², Σzx decimal(38,12)-cast before summing —
    * order-free — alongside pass 1's exact Σx, Σx². R²_aux is one
    * pinned scalar ratio off those.
    *
    * Scale shape: two scans of the (x, y) projection + two 1-row
    * folds; no shuffle wider than the partial-agg. The pass-1 scalars
    * ride the documented broadcast crossJoin.
    */
  def breuschPagan(
      df: DataFrame,
      x: Column,
      y: Column,
      scale: Int = 6): DataFrame = {
    val base = graft.Caches.track(
      df.select(x.cast("double").as("_x"), y.cast("double").as("_y"))
        .where(col("_x").isNotNull && col("_y").isNotNull))
    val xd = col("_x").cast("decimal(18,6)")
    val yd = col("_y").cast("decimal(18,6)")
    val mom = base.agg(
      count(lit(1)).as("n"),
      sum(xd).as("_sx"), sum(yd).as("_sy"),
      sum(xd * xd).as("_sxx"), sum(xd * yd).as("_sxy"))
    val n0 = col("n").cast("double")
    val sx0 = col("_sx").cast("double"); val sy0 = col("_sy").cast("double")
    val sxx0 = col("_sxx").cast("double"); val sxy0 = col("_sxy").cast("double")
    val varX0 = n0 * sxx0 - sx0 * sx0
    val b0 = (n0 * sxy0 - sx0 * sy0) / varX0
    val fit = mom.where(varX0 > 0).select(
      col("n"), col("_sx"), col("_sxx"),
      b0.as("_b"), ((sy0 - b0 * sx0) / n0).as("_a"))
    val z = (col("_y") - (col("_a") + col("_b") * col("_x"))) *
      (col("_y") - (col("_a") + col("_b") * col("_x")))
    val p2 = base.crossJoin(broadcast(fit)).agg(
      first(col("n")).as("n"),
      round(first(col("_b")), scale).as("slope"),
      round(first(col("_a")), scale).as("intercept"),
      first(col("_sx")).as("_sx"), first(col("_sxx")).as("_sxx"),
      sum(z.cast("decimal(38,12)")).as("_sz"),
      sum((z * z).cast("decimal(38,12)")).as("_szz"),
      sum((z * col("_x")).cast("decimal(38,12)")).as("_szx"))
    val n = col("n").cast("double")
    val sx = col("_sx").cast("double"); val sxx = col("_sxx").cast("double")
    val sz = col("_sz").cast("double"); val szz = col("_szz").cast("double")
    val szx = col("_szx").cast("double")
    val covNum = n * szx - sz * sx
    val varZ = n * szz - sz * sz
    val varX = n * sxx - sx * sx
    val r2 = covNum * covNum / (varZ * varX)
    p2.select(col("n"), col("slope"), col("intercept"),
      round(when(varZ > 0 && varX > 0, r2), scale).as("r2_aux"),
      round(when(varZ > 0 && varX > 0, n * r2), scale).as("lm"),
      round(when(varZ > 0 && varX > 0 && sz > 0,
        r2 * (n * n * szz / (sz * sz) - n) / 2.0), scale).as("bp"))
  }

  /** Cook's distance — WHICH points own this regression? Per-point
    * influence for the simple OLS fit of y on x:
    * `D_i = e_i²·h_i / (p·s²·(1−h_i)²)` with leverage
    * `h_i = 1/n + (x_i−x̄)²/S_xx`, p = 2, `s² = SSE/(n−2)` — the
    * diagnostic that separates "the trend is real" from "three weird
    * rows drew the line". Returns the `topK` most influential rows
    * `(id, x, y, resid, leverage, cooks_d)` ordered by
    * (rounded D desc, id asc) — rounded-first so the cross-engine order
    * is decided on the comparison grid, never on a ulp.
    *
    * Determinism: ONE exact decimal moment fold (n, Σx, Σy, Σx², Σxy,
    * Σy² — the [[linearFit]] discipline) pins slope, intercept, x̄,
    * S_xx and the moment-form SSE as IEEE scalars; every per-row value
    * is then the same pinned expression in any engine.
    *
    * Scale shape: one fold + one broadcast-attached scan + a global
    * top-K (TakeOrdered — never a full sort) of the scored frame.
    */
  def cooksDistance(
      df: DataFrame,
      x: Column,
      y: Column,
      id: Column,
      topK: Int = 20,
      scale: Int = 6): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val base = graft.Caches.track(
      df.select(id.as("id"), x.cast("double").as("_x"), y.cast("double").as("_y"))
        .where(col("_x").isNotNull && col("_y").isNotNull))
    val xd = col("_x").cast("decimal(18,6)")
    val yd = col("_y").cast("decimal(18,6)")
    val mom = base.agg(
      count(lit(1)).as("_n"),
      sum(xd).as("_sx"), sum(yd).as("_sy"),
      sum(xd * xd).as("_sxx"), sum(xd * yd).as("_sxy"),
      sum(yd * yd).as("_syy"))
    val n = col("_n").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val sxx = col("_sxx").cast("double"); val sxy = col("_sxy").cast("double")
    val syy = col("_syy").cast("double")
    val varX = n * sxx - sx * sx
    val b = (n * sxy - sx * sy) / varX
    val a = (sy - b * sx) / n
    // moment-form SSE: Σ(y − a − bx)² expanded so no second y-pass is needed
    val sse = syy - lit(2.0) * a * sy - lit(2.0) * b * sxy +
      n * a * a + lit(2.0) * a * b * sx + b * b * sxx
    val fit = mom.where(varX > 0 && col("_n") > 2).select(
      col("_n"), b.as("_b"), a.as("_a"), (sx / n).as("_xbar"),
      (varX / n).as("_sxxc"), (sse / (n - 2.0)).as("_s2"))
    val e = col("_y") - (col("_a") + col("_b") * col("_x"))
    val h = lit(1.0) / col("_n").cast("double") +
      (col("_x") - col("_xbar")) * (col("_x") - col("_xbar")) / col("_sxxc")
    val d = e * e * h / (lit(2.0) * col("_s2") * (lit(1.0) - h) * (lit(1.0) - h))
    base.crossJoin(broadcast(fit))
      .select(col("id"), col("_x").as("x"), col("_y").as("y"),
        round(e, scale).as("resid"),
        round(h, scale).as("leverage"),
        round(when(col("_s2") > 0, d), scale).as("cooks_d"))
      .orderBy(col("cooks_d").desc, col("id"))
      .limit(topK)
  }

  /** Mood's median test — the blunt-but-assumption-free k-group location
    * test: classify every value as above / not-above the GRAND median and
    * χ²-test the resulting 2×k table (where [[kruskalWallis]] compares
    * full rank distributions, this only asks "do the groups straddle the
    * common middle equally?" — coarser, but immune to any tail shape and
    * honest under heavy censoring-style rounding). Returns one row
    * `(k_groups, n, grand_median, chi2, df1)`; χ² NULL when a margin is
    * empty (all values on one side — e.g. > 50% of the data AT the
    * median).
    *
    * Determinism: the grand median is [[quantileProfile]]'s exact type-1
    * rank pick (an ACTUAL data value at rank ⌈n/2⌉ off the range-
    * partition prefix-sum — engines agree exactly, no interpolation);
    * the 2×k counts are exact longs, expectations and the χ² fold are
    * pinned IEEE with the per-cell terms decimal-cast before the k-row
    * sum.
    *
    * Scale shape: one prefix-sum pass for the median, one broadcast of
    * the 1-row median, one partial-agg shuffle to the 2×k table, one
    * k-row fold.
    */
  def moodsMedianTest(
      df: DataFrame,
      value: Column,
      group: Column,
      scale: Int = 6): DataFrame = {
    val base = graft.Caches.track(
      df.select(value.as("_v"), group.as("_g"))
        .where(col("_v").isNotNull && col("_g").isNotNull))
    val med = quantileProfile(base, col("_v"), Nil, Seq(0.5))
      .select(col("q").cast("double").as("_med"))
    val cells = base.crossJoin(broadcast(med))
      .groupBy(col("_g"))
      .agg(
        sum(when(col("_v").cast("double") > col("_med"), 1L).otherwise(0L)).as("_ab"),
        sum(when(col("_v").cast("double") <= col("_med"), 1L).otherwise(0L)).as("_be"),
        first(col("_med")).as("_med"))
    val tot = cells.agg(
      count(lit(1)).as("k_groups"),
      sum(col("_ab")).as("_ta"), sum(col("_be")).as("_tb"))
    val n = (col("_ta") + col("_tb")).cast("double")
    val ng = (col("_ab") + col("_be")).cast("double")
    val ea = ng * col("_ta").cast("double") / n
    val eb = ng * col("_tb").cast("double") / n
    val term =
      when(ea > 0, (col("_ab").cast("double") - ea) * (col("_ab").cast("double") - ea) / ea)
        .otherwise(lit(0.0)) +
      when(eb > 0, (col("_be").cast("double") - eb) * (col("_be").cast("double") - eb) / eb)
        .otherwise(lit(0.0))
    cells.crossJoin(broadcast(tot))
      .agg(
        first(col("k_groups")).as("k_groups"),
        (first(col("_ta")) + first(col("_tb"))).as("n"),
        round(first(col("_med")), scale).as("grand_median"),
        sum(term.cast("decimal(38,12)")).as("_chi"),
        (first(col("k_groups")) - 1L).as("df1"),
        max(when(col("_ta") === 0 || col("_tb") === 0, true).otherwise(false))
          .as("_degenerate"))
      .select(col("k_groups"), col("n"), col("grand_median"),
        round(when(!col("_degenerate"), col("_chi").cast("double")), scale).as("chi2"),
        col("df1"))
  }

  /** Goodman–Kruskal γ + Somers' D — ordinal association with the tie
    * policy made explicit, completing [[kendallTauB]]'s family: γ throws
    * ALL tied pairs away ((C−D)/(C+D) — the optimist, biased high on
    * coarse grids), Somers' D charges ties on the DEPENDENT axis only
    * (`D_yx = (C−D)/(n₀−n₁)` for y given x, `D_xy` the transpose) —
    * the directional effect size for an ordinal predictor. One row
    * `(n, gamma, somers_d_yx, somers_d_xy)`; NULL where the denominator
    * is empty (an axis fully tied).
    *
    * Scale shape and determinism are [[kendallTauB]]'s verbatim: rows
    * collapse to contingency cells first, C/D fold over the strict
    * upper-triangle cell pairs (quadratic in |cells|, never rows — the
    * bounded/binned-input contract), pair products in decimal, final
    * quotients pinned IEEE.
    */
  def gkGamma(df: DataFrame, x: Column, y: Column, scale: Int = 6): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = graft.Caches.track(
      df.select(x.as("_x"), y.as("_y"))
        .where(col("_x").isNotNull && col("_y").isNotNull)
        .groupBy(col("_x"), col("_y")).agg(count(lit(1)).as("_o")))
    val b = cells.select(col("_x").as("_x2"), col("_y").as("_y2"), col("_o").as("_o2"))
    val cd = cells.join(b, col("_x2") > col("_x")).agg(
      coalesce(sum(when(col("_y2") > col("_y"), dec(col("_o")) * dec(col("_o2")))),
        dec(lit(0L))).as("_c"),
      coalesce(sum(when(col("_y2") < col("_y"), dec(col("_o")) * dec(col("_o2")))),
        dec(lit(0L))).as("_d"))
    val n = cells.agg(sum(col("_o")).as("n"))
    val tx = cells.groupBy(col("_x")).agg(sum(col("_o")).as("_t"))
      .agg(coalesce(sum(dec(col("_t")) * dec(col("_t") - 1)), dec(lit(0L))).as("_tx2"))
    val ty = cells.groupBy(col("_y")).agg(sum(col("_o")).as("_t"))
      .agg(coalesce(sum(dec(col("_t")) * dec(col("_t") - 1)), dec(lit(0L))).as("_ty2"))
    val cMd = col("_c").cast("double") - col("_d").cast("double")
    cd.crossJoin(n).crossJoin(tx).crossJoin(ty)
      .withColumn("_n0", (dec(col("n")) * dec(col("n") - 1)).cast("double") / 2)
      .withColumn("_n1", col("_tx2").cast("double") / 2)
      .withColumn("_n2", col("_ty2").cast("double") / 2)
      .select(col("n"),
        round(when((col("_c").cast("double") + col("_d").cast("double")) > 0,
          cMd / (col("_c").cast("double") + col("_d").cast("double"))), scale)
          .as("gamma"),
        round(when((col("_n0") - col("_n1")) > 0, cMd / (col("_n0") - col("_n1"))),
          scale).as("somers_d_yx"),
        round(when((col("_n0") - col("_n2")) > 0, cMd / (col("_n0") - col("_n2"))),
          scale).as("somers_d_xy"))
  }

  /** Goodman–Kruskal λ — categorical association as PROPORTIONAL
    * REDUCTION IN ERROR of the modal guess: knowing X, how much better
    * than "always predict Y's overall mode" does "predict the mode of Y
    * within this X" get?
    * `λ(Y|X) = (Σ_x max_y c_xy − max_y c_•y) / (n − max_y c_•y)`.
    * The mode-based complement of the entropy-based uncertainty
    * coefficient (infoGainScreen's `u`): λ = 0 says X never CHANGES the
    * best single guess (possible even under real dependence — its known
    * bluntness, which is also its interpretability). One row
    * `(n, lambda_yx, lambda_xy)`; NULL when the majority class is
    * everything (n = max).
    *
    * Exact longs end to end (cell counts, per-margin maxima, the two
    * sums); one final pinned division each way. Scale shape: one cells
    * shuffle, two |margin|-row max-folds per direction.
    */
  def gkLambda(df: DataFrame, x: Column, y: Column, scale: Int = 6): DataFrame = {
    val cells = graft.Caches.track(
      df.select(x.as("_x"), y.as("_y"))
        .where(col("_x").isNotNull && col("_y").isNotNull)
        .groupBy(col("_x"), col("_y")).agg(count(lit(1)).as("_o")))
    val n = cells.agg(sum(col("_o")).as("n"))
    // Σ_x max_y and the overall max of the y margin (direction Y|X)
    val sumMaxY = cells.groupBy(col("_x")).agg(max(col("_o")).as("_m"))
      .agg(sum(col("_m")).as("_smy"))
    val maxColY = cells.groupBy(col("_y")).agg(sum(col("_o")).as("_t"))
      .agg(max(col("_t")).as("_mcy"))
    val sumMaxX = cells.groupBy(col("_y")).agg(max(col("_o")).as("_m"))
      .agg(sum(col("_m")).as("_smx"))
    val maxColX = cells.groupBy(col("_x")).agg(sum(col("_o")).as("_t"))
      .agg(max(col("_t")).as("_mcx"))
    n.crossJoin(sumMaxY).crossJoin(maxColY).crossJoin(sumMaxX).crossJoin(maxColX)
      .select(col("n"),
        round(when((col("n") - col("_mcy")) > 0,
          (col("_smy") - col("_mcy")).cast("double") /
            (col("n") - col("_mcy")).cast("double")), scale).as("lambda_yx"),
        round(when((col("n") - col("_mcx")) > 0,
          (col("_smx") - col("_mcx")).cast("double") /
            (col("n") - col("_mcx")).cast("double")), scale).as("lambda_xy"))
  }

  /** Point-biserial correlation — the effect size behind [[welchTtest]]:
    * Pearson r between a BINARY arm flag and a continuous outcome,
    * `r_pb = (M₁−M₀)·√(n₁n₀) / √(n·Σx² − (Σx)²)`, plus its t
    * `t = r·√((n−2)/(1−r²))` — same null as the pooled t-test, but the
    * magnitude is readable (share of variance = r²) where a bare t
    * grows with n. One row `(n, n1, n0, mean1, mean0, r_pb, t_stat)`;
    * NULL r where either arm is empty or the outcome is constant.
    *
    * ONE conditional-sum scan (the [[welchTtest]] discipline): per-arm
    * counts and exact decimal sums, the global Σx² on the same pass;
    * means and the closed form are pinned IEEE scalars.
    */
  def pointBiserial(
      df: DataFrame,
      value: Column,
      flag: Column,
      scale: Int = 6): DataFrame = {
    val d = df.select(value.cast("double").as("_v"), flag.cast("boolean").as("_f"))
      .where(col("_v").isNotNull && col("_f").isNotNull)
    val vd = col("_v").cast("decimal(18,6)")
    val m = d.agg(
      sum(when(col("_f"), 1L).otherwise(0L)).as("n1"),
      sum(when(!col("_f"), 1L).otherwise(0L)).as("n0"),
      sum(when(col("_f"), vd)).as("_s1"),
      sum(when(!col("_f"), vd)).as("_s0"),
      sum(vd * vd).as("_sxx"))
    val n = (col("n1") + col("n0")).cast("double")
    val m1 = col("_s1").cast("double") / col("n1")
    val m0 = col("_s0").cast("double") / col("n0")
    val sx = col("_s1").cast("double") + col("_s0").cast("double")
    val varN = n * col("_sxx").cast("double") - sx * sx
    val r = (m1 - m0) * sqrt((col("n1") * col("n0")).cast("double")) / sqrt(varN)
    m.select(
      (col("n1") + col("n0")).as("n"), col("n1"), col("n0"),
      round(when(col("n1") > 0, m1), scale).as("mean1"),
      round(when(col("n0") > 0, m0), scale).as("mean0"),
      round(when(col("n1") > 0 && col("n0") > 0 && varN > 0, r), scale).as("r_pb"),
      round(when(col("n1") > 0 && col("n0") > 0 && varN > 0 &&
          (col("n1") + col("n0")) > 2 && r * r < 1,
        r * sqrt((n - 2.0) / (lit(1.0) - r * r))), scale).as("t_stat"))
  }

  /** First-order partial correlation — "does x still track y once z is
    * held fixed?" — the 3-variable confounder check:
    * `r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²))`. Returns one
    * row `(n, r_xy, r_xz, r_yz, r_xy_z)` with all three pairwise r's
    * shown (the partial without its parts invites misreading); rows with
    * ANY null coordinate are excluded (complete-case — the three r's
    * must come from the same n). NULL where any input r is undefined or
    * a guard correlation is ±1.
    *
    * ONE exact decimal moment fold (3 sums + 6 product sums — the
    * [[linearFit]] discipline widened a column); every r and the partial
    * are pinned IEEE scalars off it.
    */
  def partialCorr(
      df: DataFrame,
      x: Column,
      y: Column,
      z: Column,
      scale: Int = 6): DataFrame = {
    val d = df.select(x.cast("double").as("_x"), y.cast("double").as("_y"),
      z.cast("double").as("_z"))
      .where(col("_x").isNotNull && col("_y").isNotNull && col("_z").isNotNull)
    val xd = col("_x").cast("decimal(18,6)")
    val yd = col("_y").cast("decimal(18,6)")
    val zd = col("_z").cast("decimal(18,6)")
    val mom = d.agg(
      count(lit(1)).as("n"),
      sum(xd).as("_sx"), sum(yd).as("_sy"), sum(zd).as("_sz"),
      sum(xd * xd).as("_sxx"), sum(yd * yd).as("_syy"), sum(zd * zd).as("_szz"),
      sum(xd * yd).as("_sxy"), sum(xd * zd).as("_sxz"), sum(yd * zd).as("_syz"))
    val n = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    def corr2(sab: String, sa: String, sb: String, saa: String, sbb: String) = {
      val num = n * dd(sab) - dd(sa) * dd(sb)
      val d1 = n * dd(saa) - dd(sa) * dd(sa)
      val d2 = n * dd(sbb) - dd(sb) * dd(sb)
      when(d1 > 0 && d2 > 0, num / (sqrt(d1) * sqrt(d2)))
    }
    val rxy = corr2("_sxy", "_sx", "_sy", "_sxx", "_syy")
    val rxz = corr2("_sxz", "_sx", "_sz", "_sxx", "_szz")
    val ryz = corr2("_syz", "_sy", "_sz", "_syy", "_szz")
    mom.select(col("n"),
      round(rxy, scale).as("r_xy"),
      round(rxz, scale).as("r_xz"),
      round(ryz, scale).as("r_yz"),
      round(when(rxz * rxz < 1 && ryz * ryz < 1,
        (rxy - rxz * ryz) /
          sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))), scale)
        .as("r_xy_z"))
  }

  /** One-way intraclass correlation ICC(1,1) — "how much of this
    * measure's variance lives BETWEEN groups?" — the clustered-data
    * pre-flight every per-user/per-shard metric needs (an ICC of 0.2
    * with 1000-row groups silently inflates a naive t-test's effective n
    * by ~200×: the design-effect input):
    * `ICC = (MSB − MSW) / (MSB + (n₀−1)·MSW)` with ANOVA mean squares
    * and the unbalanced-design group size `n₀ = (N − Σnᵢ²/N)/(k−1)`.
    * One row `(k, n, msb, msw, n0, icc1)`; NULL where undefined.
    *
    * [[anovaF]]'s exact per-group decimal moments extended with the
    * Σnᵢ² term; mean squares and the closed form are pinned IEEE.
    * One partial-agg shuffle + a k-row fold.
    */
  def iccOneWay(
      df: DataFrame,
      value: Column,
      group: Column,
      scale: Int = 6): DataFrame = {
    val d = df.select(value.cast("double").as("_v"), group.as("_g"))
      .where(col("_v").isNotNull && col("_g").isNotNull)
    val g = d.groupBy(col("_g")).agg(
      count(lit(1)).as("_ng"),
      sum(col("_v").cast("decimal(38,12)")).as("_sg"),
      sum((col("_v") * col("_v")).cast("decimal(38,12)")).as("_qg"))
    val tot = g.agg(
      count(lit(1)).as("k"), sum(col("_ng")).as("n"), sum(col("_sg")).as("_st"),
      sum((col("_ng") * col("_ng")).cast("decimal(38,0)")).as("_sq"))
    val folded = g.crossJoin(broadcast(tot))
      .withColumn("_mg", col("_sg").cast("double") / col("_ng"))
      .withColumn("_m", col("_st").cast("double") / col("n"))
      .withColumn("_ssb",
        col("_ng") * (col("_mg") - col("_m")) * (col("_mg") - col("_m")))
      .withColumn("_ssw",
        col("_qg").cast("double") - col("_ng") * col("_mg") * col("_mg"))
      .agg(
        first(col("k")).as("k"), first(col("n")).as("n"),
        first(col("_sq")).as("_sq"),
        sum(col("_ssb").cast("decimal(38,12)")).as("_b"),
        sum(col("_ssw").cast("decimal(38,12)")).as("_w"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val msb = col("_b").cast("double") / (kD - 1.0)
    val msw = col("_w").cast("double") / (nD - kD)
    val n0 = (nD - col("_sq").cast("double") / nD) / (kD - 1.0)
    folded.select(col("k"), col("n"),
      round(when(col("k") > 1, msb), scale).as("msb"),
      round(when(col("n") > col("k"), msw), scale).as("msw"),
      round(when(col("k") > 1, n0), scale).as("n0"),
      round(when(col("k") > 1 && col("n") > col("k") &&
          (msb + (n0 - 1.0) * msw) > 0,
        (msb - msw) / (msb + (n0 - 1.0) * msw)), scale).as("icc1"))
  }

  /** Fleiss' κ — inter-rater agreement for n raters × k categories (the
    * multi-rater generalization [[cohenKappa]]'s two-column contract
    * can't reach): each ITEM carries exactly `nRaters` categorical
    * ratings (items with any other count are excluded — Fleiss assumes a
    * constant panel size; the excluded mass is reported as
    * n_items_dropped, never silently eaten),
    * `P̄ = (Σ_i Σ_c x_ic² − I·n) / (I·n·(n−1))`, `P_e = Σ_c p_c²`,
    * `κ = (P̄−P_e)/(1−P_e)`. One row
    * `(n_items, n_items_dropped, n_raters, p_bar, p_e, kappa)`.
    *
    * Exact integers everywhere that matters: cell counts x_ic, the
    * global Σx², and the per-category column totals (whose squares fold
    * in decimal), so P̄ and P_e are single pinned divisions; κ NULL at
    * P_e = 1 (one category used — agreement is vacuous).
    *
    * Scale shape: one (item, category) cells shuffle, one per-item
    * count for the panel filter (no row explosion), |categories|-row and
    * 1-row folds.
    */
  def fleissKappa(
      df: DataFrame,
      item: Column,
      category: Column,
      nRaters: Int,
      scale: Int = 6): DataFrame = {
    require(nRaters >= 2, s"nRaters must be >= 2, got $nRaters")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(item.as("_i"), category.as("_c"))
      .where(col("_i").isNotNull && col("_c").isNotNull)
    val perItem = base.groupBy(col("_i")).agg(count(lit(1)).as("_cnt"))
    val dropped = perItem.agg(
      coalesce(sum(when(col("_cnt") =!= nRaters.toLong, 1L)), lit(0L))
        .as("n_items_dropped"))
    val kept = graft.Caches.track(
      base.join(perItem.where(col("_cnt") === nRaters.toLong).select(col("_i")),
        Seq("_i")))
    val cells = graft.Caches.track(
      kept.groupBy(col("_i"), col("_c")).agg(count(lit(1)).as("_x")))
    val q = cells.agg(
      countDistinct(col("_i")).as("n_items"),
      sum(dec(col("_x")) * dec(col("_x"))).as("_q"))
    val colT = cells.groupBy(col("_c")).agg(sum(col("_x")).as("_t"))
      .agg(coalesce(sum(dec(col("_t")) * dec(col("_t"))), dec(lit(0L))).as("_ct2"))
    val iD = col("n_items").cast("double")
    val nD = lit(nRaters.toDouble)
    val pBar = (col("_q").cast("double") - iD * nD) / (iD * nD * (nD - 1.0))
    val pe = col("_ct2").cast("double") / (iD * nD * (iD * nD))
    q.crossJoin(broadcast(colT)).crossJoin(broadcast(dropped))
      .select(col("n_items"), col("n_items_dropped"),
        lit(nRaters).as("n_raters"),
        round(when(col("n_items") > 0, pBar), scale).as("p_bar"),
        round(when(col("n_items") > 0, pe), scale).as("p_e"),
        round(when(col("n_items") > 0 && pe < 1.0, (pBar - pe) / (lit(1.0) - pe)),
          scale).as("kappa"))
  }

  /** Chao1 species-richness estimate — "how many DISTINCT keys does the
    * population hold, given what this sample showed?" — the vocabulary /
    * entity budgeting question goodTuring's mass estimates don't answer
    * (they re-rate seen frequencies; Chao1 extrapolates the UNSEEN
    * count from how ragged the bottom of the frequency table is):
    * `Ŝ = S_obs + f₁(f₁−1)/(2(f₂+1))` (the bias-corrected form — defined
    * even at f₂ = 0, where the classic f₁²/2f₂ breaks) with an
    * observation-coverage side stat `Ĉ = 1 − f₁/n` (Good's estimator —
    * the probability the NEXT token is a seen one). One row
    * `(n, s_obs, f1, f2, chao1, coverage)`.
    *
    * Exact integers end to end (key counts, the frequency-of-frequency
    * margins); two pinned divisions. Scale shape: one key-counts shuffle
    * (bounded by |distinct keys|), one 1-row fold over it.
    */
  def chao1(df: DataFrame, key: Column, scale: Int = 6): DataFrame = {
    val counts = df.select(key.as("_k")).where(col("_k").isNotNull)
      .groupBy(col("_k")).agg(count(lit(1)).as("_c"))
    val m = counts.agg(
      sum(col("_c")).as("n"),
      count(lit(1)).as("s_obs"),
      sum(when(col("_c") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("_c") === 2L, 1L).otherwise(0L)).as("f2"))
    val f1 = col("f1").cast("double")
    val f2 = col("f2").cast("double")
    m.select(col("n"), col("s_obs"), col("f1"), col("f2"),
      round(col("s_obs").cast("double") +
        f1 * (f1 - 1.0) / (lit(2.0) * (f2 + 1.0)), scale).as("chao1"),
      round(when(col("n") > 0, lit(1.0) - f1 / col("n").cast("double")), scale)
        .as("coverage"))
  }

  /** Per-stratum diversity profile — the full index card ecology and
    * corpus curation share: richness S, Shannon H (nats), Pielou
    * evenness `J = H/ln S`, Simpson concentration `D = Σp²`, its
    * Gini–Simpson (1−D) and inverse (1/D = Hill N₂) faces, and
    * Berger–Parker dominance (max p). One row per stratum
    * `(strataCols…, n, richness, shannon, pielou, simpson,
    * gini_simpson, inv_simpson, berger_parker)` — H alone hides whether
    * low diversity means few keys or one dominant key; the profile
    * separates them.
    *
    * Determinism: per-(stratum, key) counts are exact longs; each
    * entropy/concentration term is the same IEEE expression off those
    * integers, decimal-cast before the per-stratum sums (order-free —
    * the [[mutualInformation]] discipline); max p is exact-count max
    * over the stratum divided once.
    *
    * Scale shape: one cells shuffle, one |cells|→|strata| partial-agg
    * fold, one broadcast-joined totals frame. Output is |strata| rows.
    */
  def diversityProfile(
      df: DataFrame,
      key: Column,
      strataCols: Seq[String],
      scale: Int = 6): DataFrame = {
    require(strataCols.nonEmpty, "diversityProfile needs at least one stratum column")
    val strata = strataCols.map(col)
    val cells = graft.Caches.track(
      df.select((strata :+ key.as("_k")): _*)
        .where(col("_k").isNotNull)
        .groupBy((strata :+ col("_k")): _*).agg(count(lit(1)).as("_c")))
    val totals = cells.groupBy(strata: _*).agg(sum(col("_c")).as("_n"))
    val p = col("_c").cast("double") / col("_n").cast("double")
    val folded = cells.join(totals, strataCols)
      .groupBy(strata: _*)
      .agg(
        first(col("_n")).as("n"),
        count(lit(1)).as("richness"),
        sum((-p * log(p)).cast("decimal(38,12)")).as("_h"),
        sum((p * p).cast("decimal(38,12)")).as("_d"),
        max(col("_c")).as("_maxc"))
    val h = col("_h").cast("double")
    val d = col("_d").cast("double")
    folded.select(strata ++ Seq(
      col("n"), col("richness"),
      round(h, scale).as("shannon"),
      round(when(col("richness") > 1, h / log(col("richness").cast("double"))),
        scale).as("pielou"),
      round(d, scale).as("simpson"),
      round(lit(1.0) - d, scale).as("gini_simpson"),
      round(when(d > 0, lit(1.0) / d), scale).as("inv_simpson"),
      round(col("_maxc").cast("double") / col("n").cast("double"), scale)
        .as("berger_parker")): _*)
  }

  /** Yule–Walker AR(2) fit — the closed-form autoregression off the
    * first two autocorrelations: `φ₁ = ρ₁(1−ρ₂)/(1−ρ₁²)`,
    * `φ₂ = (ρ₂−ρ₁²)/(1−ρ₁²)` — and φ₂ IS the lag-2 partial
    * autocorrelation (the "is there structure BEYOND what lag 1
    * explains?" number an ACF plot can't show, because ρ₂ ≈ ρ₁² is
    * exactly what a pure AR(1) produces). `var_ratio = 1 − φ₁ρ₁ − φ₂ρ₂`
    * is the innovation-variance share left after the fit. Input:
    * collapsed contiguous series `(t, x)` (the
    * [[graft.ops.EventAnalytics.autocorrelation]] contract). One row
    * `(n, rho1, rho2, phi1, phi2, var_ratio)`.
    *
    * ρ₁/ρ₂ reuse the ACF estimator's exact-decimal machinery UNROUNDED
    * (the [[ljungBox]] discipline); the Yule–Walker clearing is pinned
    * scalar IEEE. Same scale shape as the ACF: one 2-lag self equi-join
    * over the collapsed series + scalar folds.
    */
  def yuleWalkerAr2(series: DataFrame, scale: Int = 6): DataFrame = {
    val x = graft.Caches.track(
      series.select(col("t").cast("long").as("t"),
        col("x").cast("decimal(18,6)").as("_xd")))
    val tot = x.agg(
      count(lit(1)).as("n"),
      sum(col("_xd")).as("_s1"),
      sum(col("_xd") * col("_xd")).as("_s2"))
    val lags = explode(array(lit(1L), lit(2L))).as("lag")
    val paired = x.select(col("t"), col("_xd"), lags)
      .withColumn("_tk", col("t") + col("lag"))
      .join(x.select(col("t").as("_tk"), col("_xd").as("_xk")), Seq("_tk"))
    val perLag = paired.groupBy(col("lag")).agg(
      count(lit(1)).as("_m"),
      sum(col("_xd") * col("_xk")).as("_ck"),
      sum(col("_xd") + col("_xk")).as("_pk"))
    val n = col("n").cast("double")
    val s1 = col("_s1").cast("double"); val s2 = col("_s2").cast("double")
    def r(ck: Column, pk: Column, m: Column) =
      (n * n * ck.cast("double") - n * s1 * pk.cast("double") +
        m.cast("double") * s1 * s1) / (n * n * s2 - n * s1 * s1)
    // conditional 1-row widening (NOT pivot: literal-typed, no value
    // matching to silently miss)
    val wide = perLag.agg(
      sum(when(col("lag") === 1L, col("_ck"))).as("ck1"),
      sum(when(col("lag") === 1L, col("_pk"))).as("pk1"),
      sum(when(col("lag") === 1L, col("_m"))).as("m1"),
      sum(when(col("lag") === 2L, col("_ck"))).as("ck2"),
      sum(when(col("lag") === 2L, col("_pk"))).as("pk2"),
      sum(when(col("lag") === 2L, col("_m"))).as("m2"))
    val den = n * n * s2 - n * s1 * s1
    val rho1 = r(col("ck1"), col("pk1"), col("m1"))
    val rho2 = r(col("ck2"), col("pk2"), col("m2"))
    val oneMr2 = lit(1.0) - rho1 * rho1
    val phi1 = rho1 * (lit(1.0) - rho2) / oneMr2
    val phi2 = (rho2 - rho1 * rho1) / oneMr2
    // the oneMr2 guard itself divides by den, so it must live INSIDE the
    // den > 0 branch: ANSI mode evaluates a conjunct's operands eagerly
    // and a flat `den > 0 && oneMr2 > 0` throws DIVIDE_BY_ZERO on a
    // constant series
    wide.crossJoin(broadcast(tot))
      .select(col("n"),
        round(when(den > 0, rho1), scale).as("rho1"),
        round(when(den > 0, rho2), scale).as("rho2"),
        round(when(den > 0, when(oneMr2 > 0, phi1)), scale).as("phi1"),
        round(when(den > 0, when(oneMr2 > 0, phi2)), scale).as("phi2"),
        round(when(den > 0, when(oneMr2 > 0,
          lit(1.0) - phi1 * rho1 - phi2 * rho2)), scale).as("var_ratio"))
  }

  /** Wald SPRT over an ordered binary stream — "at which event could
    * this A/B have STOPPED?" Sequential probability ratio test for a
    * Bernoulli rate, H₀: p = p₀ vs H₁: p = p₁: after t trials with k
    * successes `LLR_t = k·ln(p₁/p₀) + (t−k)·ln((1−p₁)/(1−p₀))`; accept
    * H₁ at the first `LLR ≥ logA`, H₀ at the first `LLR ≤ logB`
    * (Wald's `logA = ln((1−β)/α)`, `logB = ln(β/(1−α))`). One row
    * `(n, k_total, decision, t_stop, k_stop, llr_stop)` — decision
    * `continue` with the final state when no boundary was hit. The
    * honest post-hoc replay: peeking at a fixed-horizon test inflates
    * α; SPRT's boundaries are what licensed stopping WOULD have been.
    *
    * Determinism: the cumulative (t, k) ride the [[runningTotal]]
    * range-partition prefix-sum in the caller-supplied total order
    * (`orderCols` must include a unique tie-break); the two log
    * coefficients are caller-fixed DOUBLE constants (computed once,
    * embedded as literals — both engines parse the same decimal
    * string), so every LLR is the same two-term IEEE expression off
    * exact integers, and the first crossing is an integer argmin.
    *
    * Scale shape: one prefix-sum pass + one 1-row crossing fold + an
    * equi-join back on the (unique) crossing rank. No window.
    */
  def sprtBinomial(
      df: DataFrame,
      success: Column,
      orderCols: Seq[Column],
      l1: Double,
      l0: Double,
      logA: Double,
      logB: Double,
      scale: Int = 6): DataFrame = {
    require(logA > 0 && logB < 0, s"need logB < 0 < logA, got [$logB, $logA]")
    val base = df.select((orderCols :+ success.cast("boolean").as("_s")): _*)
      .where(col("_s").isNotNull)
    val (ranked0, grand) = prefixSumsCore(base, orderCols,
      Seq(lit(1L) -> "_t", when(col("_s"), 1L).otherwise(0L) -> "_k"))
    val ranked = graft.Caches.track(ranked0)
    val llr = col("_k").cast("double") * lit(l1) +
      (col("_t") - col("_k")).cast("double") * lit(l0)
    val scored = ranked.select(col("_t"), col("_k"), llr.as("_llr"))
    val firstCross = scored
      .where(col("_llr") >= lit(logA) || col("_llr") <= lit(logB))
      .agg(min(col("_t")).as("_tc"))
    val n = grand("_t"); val k = grand("_k")
    val finalLlr = k.toDouble * l1 + (n - k).toDouble * l0
    scored.crossJoin(broadcast(firstCross))
      .where(col("_t") === col("_tc"))
      .select(lit(n).as("n"), lit(k).as("k_total"),
        when(col("_llr") >= lit(logA), lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"),
        col("_t").as("t_stop"), col("_k").as("k_stop"),
        round(col("_llr"), scale).as("llr_stop"))
      .union(
        firstCross.where(col("_tc").isNull)
          .select(lit(n).as("n"), lit(k).as("k_total"),
            lit("continue").as("decision"),
            lit(n).as("t_stop"), lit(k).as("k_stop"),
            round(lit(finalLlr), scale).as("llr_stop")))
  }

  /** Moran's I — network autocorrelation: "do connected nodes carry
    * similar values?" — homophily measured on the VALUE (where
    * assortativity's degree-correlation asks it of the topology):
    * `I = (n/W)·(Σ_{(u,v)∈E} z_u z_v) / (Σ_u z_u²)` with `z = x − x̄`
    * over the nodes and W the DIRECTED edge count (pass both
    * orientations for an undirected graph — the standard symmetric
    * weight matrix). Under the null E[I] = −1/(n−1), returned alongside
    * for reading. One row `(n_nodes, n_edges, morans_i, e_i)`; edges
    * whose endpoint has no value row drop via the inner joins (and
    * shrink W with them — document the node frame as the universe).
    *
    * Determinism: x̄ from one exact decimal fold; every z is the same
    * IEEE subtraction; the cross-product and square sums decimal-cast
    * before summing — order-free; the final ratio pinned.
    *
    * Scale shape: one 1-row mean broadcast, two hash joins of edges
    * against the |nodes| value frame, two 1-row folds. The node values
    * frame is narrowed + tracked so its scan is shared.
    */
  def moransI(
      edges: DataFrame,
      values: DataFrame,
      id: Column,
      value: Column,
      scale: Int = 6): DataFrame = {
    val vals = graft.Caches.track(
      values.select(id.as("_id"), value.cast("double").as("_v"))
        .where(col("_id").isNotNull && col("_v").isNotNull))
    val mean = vals.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("_v").cast("decimal(38,12)")).cast("double") / count(lit(1)))
        .as("_mu"))
    val z = vals.crossJoin(broadcast(mean))
      .select(col("_id"), (col("_v") - col("_mu")).as("_z"))
    val zTracked = graft.Caches.track(z)
    val den = zTracked.agg(
      sum((col("_z") * col("_z")).cast("decimal(38,12)")).as("_den"))
    val num = edges.select(col("src").as("_su"), col("dst").as("_sv"))
      .join(zTracked.select(col("_id").as("_su"), col("_z").as("_zu")), Seq("_su"))
      .join(zTracked.select(col("_id").as("_sv"), col("_z").as("_zv")), Seq("_sv"))
      .agg(count(lit(1)).as("n_edges"),
        coalesce(sum((col("_zu") * col("_zv")).cast("decimal(38,12)")),
          lit(0.0).cast("decimal(38,12)")).as("_num"))
    mean.crossJoin(broadcast(num)).crossJoin(broadcast(den))
      .select(col("n_nodes"), col("n_edges"),
        round(when(col("n_edges") > 0 && col("_den").cast("double") > 0,
          col("n_nodes").cast("double") / col("n_edges").cast("double") *
            (col("_num").cast("double") / col("_den").cast("double"))), scale)
          .as("morans_i"),
        round(when(col("n_nodes") > 1,
          lit(-1.0) / (col("n_nodes").cast("double") - 1.0)), scale).as("e_i"))
  }

  /** Geary's C — [[moransI]]'s local-contrast sibling: where Moran's I
    * cross-multiplies deviations (global similarity), Geary squares the
    * DIFFERENCE along each edge, so it is dominated by local contrast and
    * more sensitive to small-neighborhood heterogeneity:
    * `C = ((n−1)/(2W)) · Σ_{(u,v)∈E}(x_u − x_v)² / Σ_u z_u²` with
    * `z = x − x̄` and W the directed edge count (pass both orientations
    * for an undirected graph). Under the null E[C] = 1; C < 1 ⇔ positive
    * autocorrelation (neighbors alike), C > 1 ⇔ negative. One row
    * `(n_nodes, n_edges, gearys_c, e_c)`; edges with an unvalued endpoint
    * drop via the inner joins, as in [[moransI]].
    *
    * Determinism and scale shape are [[moransI]]'s verbatim: one 1-row
    * mean broadcast, two hash joins of edges against the tracked |nodes|
    * value frame, decimal-cast folds, pinned final ratio.
    */
  def gearysC(
      edges: DataFrame,
      values: DataFrame,
      id: Column,
      value: Column,
      scale: Int = 6): DataFrame = {
    val vals = graft.Caches.track(
      values.select(id.as("_id"), value.cast("double").as("_v"))
        .where(col("_id").isNotNull && col("_v").isNotNull))
    val mean = vals.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("_v").cast("decimal(38,12)")).cast("double") / count(lit(1)))
        .as("_mu"))
    val z = graft.Caches.track(
      vals.crossJoin(broadcast(mean))
        .select(col("_id"), col("_v"), (col("_v") - col("_mu")).as("_z")))
    val den = z.agg(
      sum((col("_z") * col("_z")).cast("decimal(38,12)")).as("_den"))
    val num = edges.select(col("src").as("_su"), col("dst").as("_sv"))
      .join(z.select(col("_id").as("_su"), col("_v").as("_vu")), Seq("_su"))
      .join(z.select(col("_id").as("_sv"), col("_v").as("_vv")), Seq("_sv"))
      .agg(count(lit(1)).as("n_edges"),
        coalesce(sum(((col("_vu") - col("_vv")) * (col("_vu") - col("_vv")))
          .cast("decimal(38,12)")), lit(0.0).cast("decimal(38,12)")).as("_num"))
    mean.crossJoin(broadcast(num)).crossJoin(broadcast(den))
      .select(col("n_nodes"), col("n_edges"),
        round(when(col("n_edges") > 0 && col("_den").cast("double") > 0 && col("n_nodes") > 1,
          (col("n_nodes").cast("double") - 1.0) / (lit(2.0) * col("n_edges").cast("double")) *
            (col("_num").cast("double") / col("_den").cast("double"))), scale)
          .as("gearys_c"),
        lit(1.0).as("e_c"))
  }

  /** Expected / maximum calibration error — [[calibrationCurve]]'s
    * per-bin gaps collapsed to the two headline numbers:
    * `ECE = Σ_b (n_b/n)·|conf_b − acc_b|` (the count-weighted average
    * gap — what "the model is 3 points overconfident" means) and
    * `MCE = max_b |conf_b − acc_b|` (the worst bin — what the risk
    * reviewer asks for). Same equal-count `(score, tie)` ntile bins as
    * the curve. One row `(bins_used, n, ece, mce)`.
    *
    * Determinism: per-bin sums are exact (decimal score mass, integer
    * positives); conf/acc and each gap are pinned IEEE; the weighted
    * terms are decimal-re-summed (order-free) and MCE is a max (order-
    * free by construction). Uses the UNROUNDED bin stats — reading the
    * curve's rounded outputs would shift ECE by up to 5e-7·bins.
    *
    * Scale shape: [[globalNtile]]'s prefix-sum rank, one ≤bins
    * partial-agg fold, one 1-row reduction.
    */
  def expectedCalibrationError(
      df: DataFrame,
      score: Column,
      label: Column,
      bins: Int,
      tieCol: Column,
      scale: Int = 6): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val slim = graft.Caches.track(
      df.select(score.as("_s"), label.cast("int").as("_y"), tieCol.as("_t"))
        .where(col("_s").isNotNull && col("_y").isNotNull))
    val binned = ntileBins(slim, bins, Seq(col("_s"), col("_t")))
    val perBin = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("_nb"),
      sum(col("_s").cast("decimal(38,12)")).as("_ss"),
      sum(col("_y")).as("_sy"))
    val conf = col("_ss").cast("double") / col("_nb")
    val acc = col("_sy").cast("double") / col("_nb")
    val gap = abs(conf - acc)
    perBin
      .agg(
        count(lit(1)).as("bins_used"),
        sum(col("_nb")).as("n"),
        sum((col("_nb").cast("double") * gap).cast("decimal(38,12)")).as("_w"),
        max(gap).as("_mce"))
      .select(col("bins_used"), col("n"),
        round(when(col("n") > 0, col("_w").cast("double") / col("n").cast("double")),
          scale).as("ece"),
        round(col("_mce"), scale).as("mce"))
  }

  /** Two-proportion power card — "could this A/B even SEE the lift we
    * care about?" From the observed arm sizes and pooled rate:
    * `MDE = (z_α + z_β)·√(2p̄(1−p̄)/n_harm)` (the smallest absolute lift
    * detectable at the given α/power, with `n_harm` the harmonic
    * per-arm n — exact under unequal arms) and the required per-arm n
    * for the caller's `targetLift`:
    * `n_req = 2p̄(1−p̄)·((z_α+z_β)/Δ)²` (rounded UP). The pre-test
    * honesty check every underpowered "no significant difference"
    * readout needs. One row
    * `(n_a, n_b, p_pool, mde_abs, mde_rel, n_req_per_arm)`.
    *
    * The z quantiles are CALLER-FIXED double literals (no Φ⁻¹ in either
    * engine — both parse the same decimal strings; defaults are
    * two-sided α = 0.05, power = 0.80). One conditional-sum scan;
    * all closed forms pinned IEEE off exact integers.
    */
  def powerTwoProportions(
      df: DataFrame,
      arm: Column,
      success: Column,
      targetLift: Double,
      zAlpha: Double = 1.959963984540054,
      zBeta: Double = 0.8416212335729143,
      scale: Int = 6): DataFrame = {
    require(targetLift > 0, s"targetLift must be > 0, got $targetLift")
    val d = df.select(arm.cast("boolean").as("_a"), success.cast("boolean").as("_y"))
      .where(col("_a").isNotNull && col("_y").isNotNull)
    val m = d.agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("_y"), 1L).otherwise(0L)).as("_k"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val p = col("_k").cast("double") / (na + nb)
    val nHarm = lit(2.0) * na * nb / (na + nb)
    val z = lit(zAlpha + zBeta)
    val mde = z * sqrt(lit(2.0) * p * (lit(1.0) - p) / nHarm)
    m.select(col("n_a"), col("n_b"),
      round(when(col("n_a") + col("n_b") > 0, p), scale).as("p_pool"),
      round(when(col("n_a") > 0 && col("n_b") > 0, mde), scale).as("mde_abs"),
      round(when(col("n_a") > 0 && col("n_b") > 0, when(p > 0, mde / p)), scale)
        .as("mde_rel"),
      when(col("n_a") + col("n_b") > 0,
        ceil(lit(2.0) * p * (lit(1.0) - p) *
          (z / lit(targetLift)) * (z / lit(targetLift))).cast("long"))
        .as("n_req_per_arm"))
  }

  /** Page's trend test — the ORDERED alternative in the
    * [[friedmanTest]] design: with treatments carrying a pre-specified
    * dose order (period 1 < period 2 < …), `L = Σ_j c_j·R_j` (c_j the
    * dose rank, R_j the within-block rank sums) is maximal when every
    * block sorts the same way — strictly more powerful than Friedman's
    * any-difference χ² when the hypothesis IS monotone (activity decays,
    * dose escalates). Normal approximation
    * `z = (L − b·k(k+1)²/4) / √(b·k²(k+1)(k²−1)/144)` (the classic
    * no-tie variance; midrank ties make it mildly conservative —
    * documented, standard practice). Complete blocks only (the Friedman
    * contract). One row `(b_blocks, k_treatments, l_stat, z)`.
    *
    * Determinism: doubled midranks keep every rank integer
    * ([[friedmanTest]]'s trick), the dose ranks are exact integers from
    * the ≤k-row treatment frame, L folds on the decimal grid, and only
    * the final z is IEEE in pinned order.
    */
  def pageTrend(
      df: DataFrame,
      block: Column,
      dose: Column,
      value: Column,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(block.as("_b"), dose.cast("double").as("_t"), value.as("_v"))
      .where(col("_b").isNotNull && col("_t").isNotNull && col("_v").isNotNull)
    val kRow = base.agg(countDistinct(col("_t")).as("_k"))
    val blockOk = base.groupBy(col("_b"))
      .agg(count(lit(1)).as("_rows"), countDistinct(col("_t")).as("_kt"))
      .crossJoin(broadcast(kRow))
      .where(col("_rows") === col("_k") && col("_kt") === col("_k"))
      .select(col("_b"), col("_k"))
    val kept = base.join(blockOk, Seq("_b"))
    val wRank = Window.partitionBy(col("_b")).orderBy(col("_v"))
    val wTie = Window.partitionBy(col("_b"), col("_v"))
    val ranked = graft.Caches.track(
      kept.withColumn("_r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - lit(1L)))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val perTreat = ranked.groupBy(col("_t")).agg(sum(dec(col("_r2"))).as("_rj2"))
    // dose rank 1..k over the ≤k-row treatment frame — the one window
    // class allowed to stay unpartitioned (bounded by construction)
    val wDose = Window.orderBy(col("_t"))
    val withC = perTreat.withColumn("_c", row_number().over(wDose).cast("long"))
    val tot = ranked.agg(
      countDistinct(col("_b")).as("b_blocks"),
      first(col("_k")).as("k_treatments"))
    val l2 = withC.agg(
      coalesce(sum(dec(col("_c")) * col("_rj2")), dec(lit(0L))).as("_l2"))
    val b = col("b_blocks").cast("double")
    val k = col("k_treatments").cast("double")
    val lStat = col("_l2").cast("double") / 2.0
    val e = b * k * (k + 1.0) * (k + 1.0) / 4.0
    val v = b * k * k * (k + 1.0) * (k * k - 1.0) / 144.0
    tot.crossJoin(broadcast(l2))
      .select(col("b_blocks"), col("k_treatments"),
        round(lStat, scale).as("l_stat"),
        round(when(col("b_blocks") > 0 && col("k_treatments") > 1,
          when(v > 0, (lStat - e) / sqrt(v))), scale).as("z"))
  }

  /** Jonckheere–Terpstra ordered-alternatives test — [[kruskalWallis]]
    * asks "do the k groups differ AT ALL?"; this asks the sharper
    * question the dose design earned: "do values RISE with the group
    * order?" `JT = Σ_{i<j} U_ij` (pairwise Mann–Whitney counts, ties ½)
    * against `E = (N² − Σnᵢ²)/4` with the full tie-corrected variance
    * (the three-term Kendall form over group sizes nᵢ and value-tie
    * masses tⱼ). One row `(k_groups, n, jt, z)`.
    *
    * Determinism: rows collapse to the (group, value) CELLS first and
    * JT folds over cell pairs DOUBLED (`2·c₁c₂` per strict win, `c₁c₂`
    * per tie — integers end to end, the [[friedmanTest]] midrank trick
    * one level up); every variance ingredient is an exact decimal sum
    * of integer products; only the final z is IEEE in pinned order.
    *
    * Scale shape: one cells shuffle, then the pair fold runs over the
    * strict upper triangle of the |cells| grid — quadratic in CELLS,
    * never rows (the [[kendallTauB]] bounded/binned-input contract).
    */
  def jonckheereTerpstra(
      df: DataFrame,
      group: Column,
      value: Column,
      scale: Int = 6): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = graft.Caches.track(
      df.select(group.cast("double").as("_g"), value.cast("double").as("_v"))
        .where(col("_g").isNotNull && col("_v").isNotNull)
        .groupBy(col("_g"), col("_v")).agg(count(lit(1)).as("_c")))
    val b = cells.select(col("_g").as("_g2"), col("_v").as("_v2"), col("_c").as("_c2"))
    val jt2 = cells.join(b, col("_g2") > col("_g")).agg(
      coalesce(sum(
        when(col("_v2") > col("_v"), lit(2L) * dec(col("_c")) * dec(col("_c2")))
          .when(col("_v2") === col("_v"), dec(col("_c")) * dec(col("_c2")))),
        dec(lit(0L))).as("_jt2"))
    val gM = cells.groupBy(col("_g")).agg(sum(col("_c")).as("_n"))
      .agg(
        count(lit(1)).as("k_groups"), sum(col("_n")).as("n"),
        sum(dec(col("_n")) * dec(col("_n"))).as("_sn2"),
        sum(dec(col("_n")) * dec(col("_n") - 1) * dec(lit(2L) * col("_n") + 5))
          .as("_sn25"),
        sum(dec(col("_n")) * dec(col("_n") - 1)).as("_sn1"),
        sum(dec(col("_n")) * dec(col("_n") - 1) * dec(col("_n") - 2)).as("_sn12"))
    val vM = cells.groupBy(col("_v")).agg(sum(col("_c")).as("_t"))
      .agg(
        sum(dec(col("_t")) * dec(col("_t") - 1) * dec(lit(2L) * col("_t") + 5))
          .as("_st25"),
        sum(dec(col("_t")) * dec(col("_t") - 1)).as("_st1"),
        sum(dec(col("_t")) * dec(col("_t") - 1) * dec(col("_t") - 2)).as("_st12"))
    val n = col("n").cast("double")
    val jt = col("_jt2").cast("double") / 2.0
    val e = (n * n - col("_sn2").cast("double")) / 4.0
    val a = (n * (n - 1.0) * (lit(2.0) * n + 5.0) - col("_sn25").cast("double") -
      col("_st25").cast("double")) / 72.0
    val bTerm = col("_sn12").cast("double") * col("_st12").cast("double") /
      (lit(36.0) * n * (n - 1.0) * (n - 2.0))
    val cTerm = col("_sn1").cast("double") * col("_st1").cast("double") /
      (lit(8.0) * n * (n - 1.0))
    val v = a + bTerm + cTerm
    gM.crossJoin(broadcast(vM)).crossJoin(broadcast(jt2))
      .select(col("k_groups"), col("n"),
        round(jt, scale).as("jt"),
        round(when(col("n") > 2, when(v > 0, (jt - e) / sqrt(v))), scale).as("z"))
  }

  /** Forecast-error card vs the seasonal-naive baseline — the honest
    * scoreboard for ANY forecast conversation: bias `ME`, `MAE`, `RMSE`,
    * symmetric `sMAPE`, and Theil's `U₂ = RMSE_seasonal / RMSE_naive-1`
    * (> 1 means the fancy seasonal lag loses to "same as yesterday" —
    * the embarrassment check [[graft.ops.EventAnalytics.maseBacktest]]'s
    * single MASE ratio hints at but doesn't itemize). Forecast = the
    * lag-`season` value. Input: collapsed contiguous series `(t, x)`.
    * One row `(n, me, mae, rmse, smape, smape_n, u2)` — `smape_n`
    * counts the terms whose `|x|+|f| > 0` (zero/zero periods carry no
    * sMAPE evidence; they are EXCLUDED and counted, never imputed).
    *
    * Determinism: lags pair by equi-join on `t−season` / `t−1` (no
    * window); every per-row error is the same IEEE expression; all
    * sums decimal-cast (order-free); final ratios pinned.
    */
  def forecastErrors(
      series: DataFrame,
      season: Int,
      scale: Int = 6): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val s = graft.Caches.track(series.select(
      col("t").cast("long").as("t"), col("x").cast("double").as("_x"))
      .where(col("t").isNotNull && col("_x").isNotNull))
    val joined = s
      .join(s.select((col("t") + season).as("t"), col("_x").as("_xs")), Seq("t"))
      .join(s.select((col("t") + 1).as("t"), col("_x").as("_x1")), Seq("t"))
    val e = col("_x") - col("_xs")
    val e1 = col("_x") - col("_x1")
    val sm = abs(col("_x")) + abs(col("_xs"))
    val agg = joined.agg(
      count(lit(1)).as("n"),
      sum(e.cast("decimal(38,12)")).as("_se"),
      sum(abs(e).cast("decimal(38,12)")).as("_sae"),
      sum((e * e).cast("decimal(38,12)")).as("_sse"),
      sum((e1 * e1).cast("decimal(38,12)")).as("_sse1"),
      sum(when(sm > 0, (lit(2.0) * abs(e) / sm).cast("decimal(38,12)"))).as("_ssm"),
      sum(when(sm > 0, 1L).otherwise(0L)).as("smape_n"))
    val n = col("n").cast("double")
    agg.select(col("n"),
      round(when(col("n") > 0, col("_se").cast("double") / n), scale).as("me"),
      round(when(col("n") > 0, col("_sae").cast("double") / n), scale).as("mae"),
      round(when(col("n") > 0, sqrt(col("_sse").cast("double") / n)), scale)
        .as("rmse"),
      round(when(col("smape_n") > 0,
        col("_ssm").cast("double") / col("smape_n").cast("double")), scale)
        .as("smape"),
      col("smape_n"),
      round(when(col("_sse1").cast("double") > 0,
        sqrt(col("_sse").cast("double")) / sqrt(col("_sse1").cast("double"))),
        scale).as("u2"))
  }

  /** Bland–Altman agreement analysis — do two MEASUREMENT METHODS agree
    * well enough to swap? (correlation is the WRONG tool here: r = 0.99
    * with a consistent +10% bias still breaks every downstream
    * threshold). Mean difference (the bias), its SD, the limits of
    * agreement `bias ± z·sd`, and the share of pairs OUTSIDE those
    * limits (≈ 5% by construction at z = 1.96 under normality — more
    * means heavy-tailed disagreement). One row
    * `(n, bias, sd_diff, loa_lo, loa_hi, n_outside, pct_outside)`.
    *
    * Two scans: one exact decimal moment fold over d = x−y pins bias
    * and sd (pinned IEEE), then a broadcast-attached pass counts the
    * outside mass by comparing the same per-row doubles. The z is a
    * caller-fixed double literal (no Φ⁻¹ in either engine).
    */
  def blandAltman(
      df: DataFrame,
      x: Column,
      y: Column,
      zLoa: Double = 1.959963984540054,
      scale: Int = 6): DataFrame = {
    val base = graft.Caches.track(
      df.select((x.cast("double") - y.cast("double")).as("_d"))
        .where(x.isNotNull && y.isNotNull))
    val dd = col("_d").cast("decimal(18,6)")
    val mom = base.agg(
      count(lit(1)).as("n"), sum(dd).as("_s"), sum(dd * dd).as("_q"))
    val n = col("n").cast("double")
    val s1 = col("_s").cast("double"); val s2 = col("_q").cast("double")
    val mu = s1 / n
    val varS = (n * s2 - s1 * s1) / (n * (n - 1.0))
    val fit = mom.where(col("n") > 1 && varS > 0).select(
      col("n"), mu.as("_mu"), sqrt(varS).as("_sd"),
      (mu - lit(zLoa) * sqrt(varS)).as("_lo"),
      (mu + lit(zLoa) * sqrt(varS)).as("_hi"))
    base.crossJoin(broadcast(fit))
      .agg(
        first(col("n")).as("n"),
        round(first(col("_mu")), scale).as("bias"),
        round(first(col("_sd")), scale).as("sd_diff"),
        round(first(col("_lo")), scale).as("loa_lo"),
        round(first(col("_hi")), scale).as("loa_hi"),
        sum(when(col("_d") < col("_lo") || col("_d") > col("_hi"), 1L)
          .otherwise(0L)).as("n_outside"))
      .withColumn("pct_outside",
        round(col("n_outside").cast("double") / col("n").cast("double"), scale))
  }

  /** Lin's concordance correlation coefficient — "how far do these
    * paired measurements fall from the y = x line?" in one number:
    * `ρ_c = 2·cov / (σ_x² + σ_y² + (x̄−ȳ)²)` — Pearson r times the bias
    * factor `C_b`, so r = 0.99 with a level shift scores LOW here (the
    * [[blandAltman]] question as a coefficient instead of limits). One
    * row `(n, pearson_r, c_b, ccc)`.
    *
    * ONE exact decimal moment fold; the population-variance n² factors
    * cancel algebraically, so the closed form reads the raw sums
    * directly: `ρ_c = 2(nS_xy − S_xS_y) /
    * ((nS_xx − S_x²) + (nS_yy − S_y²) + (S_x − S_y)²)` — pinned IEEE.
    */
  def linCcc(df: DataFrame, x: Column, y: Column, scale: Int = 6): DataFrame = {
    val d = df.select(x.cast("double").as("_x"), y.cast("double").as("_y"))
      .where(col("_x").isNotNull && col("_y").isNotNull)
    val xd = col("_x").cast("decimal(18,6)")
    val yd = col("_y").cast("decimal(18,6)")
    val mom = d.agg(
      count(lit(1)).as("n"),
      sum(xd).as("_sx"), sum(yd).as("_sy"),
      sum(xd * xd).as("_sxx"), sum(yd * yd).as("_syy"), sum(xd * yd).as("_sxy"))
    val n = col("n").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val sxx = col("_sxx").cast("double"); val syy = col("_syy").cast("double")
    val sxy = col("_sxy").cast("double")
    val covN = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val r = covN / (sqrt(vx) * sqrt(vy))
    val ccc = lit(2.0) * covN / (vx + vy + (sx - sy) * (sx - sy))
    mom.select(col("n"),
      round(when(vx > 0 && vy > 0, r), scale).as("pearson_r"),
      round(when(vx > 0 && vy > 0, when(covN =!= 0, ccc / r)), scale).as("c_b"),
      round(when(vx + vy + (sx - sy) * (sx - sy) > 0, ccc), scale).as("ccc"))
  }

  /** Deming regression — the errors-in-BOTH-variables line OLS can't
    * give (OLS attenuates the slope toward 0 when x carries noise; the
    * method-comparison literature's standard fit). With error-variance
    * ratio λ (= 1 for equal noise — orthogonal regression):
    * `β = (S_yy − λS_xx + √((S_yy − λS_xx)² + 4λS_xy²)) / (2S_xy)` over
    * CENTERED sums, `α = ȳ − βx̄`. Completes the regression family:
    * [[linearFit]] (y-noise only), [[theilSenFit]] (outlier-robust),
    * THIS (noise in both). One row `(n, slope, intercept)`; NULL where
    * S_xy = 0 (no linear information).
    *
    * One exact decimal moment fold; the centered sums are cleared by n²
    * consistently so the closed form reads `nS_xx − S_x²` etc. — all
    * pinned IEEE, `√` not `pow`.
    */
  def demingFit(
      df: DataFrame,
      x: Column,
      y: Column,
      lambda: Double = 1.0,
      scale: Int = 6): DataFrame = {
    require(lambda > 0, s"lambda must be > 0, got $lambda")
    val d = df.select(x.cast("double").as("_x"), y.cast("double").as("_y"))
      .where(col("_x").isNotNull && col("_y").isNotNull)
    val xd = col("_x").cast("decimal(18,6)")
    val yd = col("_y").cast("decimal(18,6)")
    val mom = d.agg(
      count(lit(1)).as("n"),
      sum(xd).as("_sx"), sum(yd).as("_sy"),
      sum(xd * xd).as("_sxx"), sum(yd * yd).as("_syy"), sum(xd * yd).as("_sxy"))
    val n = col("n").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val sxx = col("_sxx").cast("double"); val syy = col("_syy").cast("double")
    val sxy = col("_sxy").cast("double")
    val cxx = n * sxx - sx * sx
    val cyy = n * syy - sy * sy
    val cxy = n * sxy - sx * sy
    val disc = cyy - lit(lambda) * cxx
    val slope = (disc + sqrt(disc * disc + lit(4.0 * lambda) * cxy * cxy)) /
      (lit(2.0) * cxy)
    mom.select(col("n"),
      round(when(cxy =!= 0, slope), scale).as("slope"),
      round(when(cxy =!= 0, (sy - slope * sx) / n), scale).as("intercept"))
  }

  /** Quade test — [[friedmanTest]] weighted by how much each block can
    * actually TELL you: blocks are ranked by their value RANGE (a user
    * whose counts barely move carries little evidence about treatment
    * order; Quade lets the wide blocks speak louder, which beats
    * Friedman's one-block-one-vote at small k). With within-block
    * midranks r_ij and block-range midranks Q_i,
    * `S_ij = Q_i·(r_ij − (k+1)/2)`, `F = (b−1)·B/(A−B)` with
    * `A = ΣS²`, `B = Σ_j T_j²/b` — read against F(k−1, (b−1)(k−1)).
    * One row `(b_blocks, k_treatments, f_stat, df1, df2)`; NULL when
    * A = B (every block sorts identically — the statistic is its own
    * infinity, reported as NULL not a sentinel).
    *
    * Determinism: BOTH rank layers ride the doubled-midrank integer
    * trick (within-block ranks via the friedman windows; block-range
    * ranks via the kruskal-style value-cell prefix counts — never a
    * global row window), so S is exactly 4·S_textbook on the integer
    * grid, A and ΣT² are exact decimal sums, and the 4s cancel in F:
    * `F = (b−1)·ΣT₄² / (b·ΣS₄² − ΣT₄²)` — one pinned IEEE ratio.
    *
    * Scale shape: one complete-block filter, one |blocks|-row range
    * frame collapsed to range CELLS for the global midrank (the
    * [[kruskalWallis]] discipline), partitioned within-block windows,
    * k-row and 1-row folds.
    */
  def quadeTest(
      df: DataFrame,
      block: Column,
      treatment: Column,
      value: Column,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(block.as("_b"), treatment.as("_t"),
      value.cast("double").as("_v"))
      .where(col("_b").isNotNull && col("_t").isNotNull && col("_v").isNotNull)
    val kRow = base.agg(countDistinct(col("_t")).as("_k"))
    val blockOk = base.groupBy(col("_b"))
      .agg(count(lit(1)).as("_rows"), countDistinct(col("_t")).as("_kt"))
      .crossJoin(broadcast(kRow))
      .where(col("_rows") === col("_k") && col("_kt") === col("_k"))
      .select(col("_b"), col("_k"))
    val kept = graft.Caches.track(base.join(blockOk, Seq("_b")))
    // block ranges → range CELLS → global midranks (2Q = 2·prior+cnt+1)
    val ranges = graft.Caches.track(
      kept.groupBy(col("_b")).agg((max(col("_v")) - min(col("_v"))).as("_rg")))
    val rgCells = ranges.groupBy(col("_rg")).agg(count(lit(1)).as("_cnt"))
    val (rgRanked, _) = prefixSumsCore(rgCells, Seq(col("_rg")),
      Seq(col("_cnt") -> "_cum"))
    val q2 = rgRanked.select(col("_rg"),
      (lit(2L) * (col("_cum") - col("_cnt")) + col("_cnt") + 1L).as("_q2"))
    val withQ = ranges.join(q2, Seq("_rg")).select(col("_b"), col("_q2"))
    // within-block doubled midranks
    val wRank = Window.partitionBy(col("_b")).orderBy(col("_v"))
    val wTie = Window.partitionBy(col("_b"), col("_v"))
    val ranked = kept
      .withColumn("_r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - lit(1L))
      .join(withQ, Seq("_b"))
    // S₄ = q₂·(r₂ − (k+1)) = 4·Q·(r − (k+1)/2) — exact integers
    val s4 = (dec(col("_q2")) * dec(col("_r2") - (col("_k") + 1)))
    val folded = graft.Caches.track(
      ranked.select(col("_b"), col("_t"), col("_k"), s4.as("_s4")))
    val a4 = folded.agg(
      sum(col("_s4") * col("_s4")).as("_a4"),
      countDistinct(col("_b")).as("b_blocks"),
      first(col("_k")).as("k_treatments"))
    val t4 = folded.groupBy(col("_t")).agg(sum(col("_s4")).as("_t4"))
      .agg(coalesce(sum(col("_t4") * col("_t4")), dec(lit(0L)) * dec(lit(0L)))
        .as("_b4"))
    val b = col("b_blocks").cast("double")
    val k = col("k_treatments").cast("double")
    val a4d = col("_a4").cast("double")
    val b4d = col("_b4").cast("double")
    val den = b * a4d - b4d
    a4.crossJoin(broadcast(t4))
      .select(col("b_blocks"), col("k_treatments"),
        round(when(col("b_blocks") > 1 && col("k_treatments") > 1,
          when(den > 0, (b - 1.0) * b4d / den)), scale).as("f_stat"),
        (col("k_treatments") - 1L).as("df1"),
        ((col("b_blocks") - 1L) * (col("k_treatments") - 1L)).as("df2"))
  }

  /** Two-regressor least squares — `y ~ b0 + b1·x1 + b2·x2` in closed
    * form off one moment fold (Cramer on the 2×2 centered normal
    * equations), with R² and the regressors' mutual VIF
    * `1/(1−r₁₂²)` — the "is x2 just x1 again?" collinearity light that
    * decides whether b1/b2 are readable at all. The multiple-regression
    * step [[linearFit]] (one x) and [[partialCorr]] (association only)
    * stop short of. One row `(n, b0, b1, b2, r2, vif)`; NULL
    * coefficients where the centered determinant is 0 (perfectly
    * collinear regressors).
    *
    * ONE exact decimal moment fold (3 sums + 6 product sums); the
    * centered second moments, determinant, and coefficients are pinned
    * IEEE scalars in textual order.
    */
  def olsTwo(
      df: DataFrame,
      x1: Column,
      x2: Column,
      y: Column,
      scale: Int = 6): DataFrame = {
    val d = df.select(x1.cast("double").as("_a"), x2.cast("double").as("_b"),
      y.cast("double").as("_y"))
      .where(col("_a").isNotNull && col("_b").isNotNull && col("_y").isNotNull)
    val ad = col("_a").cast("decimal(18,6)")
    val bd = col("_b").cast("decimal(18,6)")
    val yd = col("_y").cast("decimal(18,6)")
    val mom = d.agg(
      count(lit(1)).as("n"),
      sum(ad).as("_s1"), sum(bd).as("_s2"), sum(yd).as("_sy"),
      sum(ad * ad).as("_s11"), sum(bd * bd).as("_s22"), sum(ad * bd).as("_s12"),
      sum(ad * yd).as("_s1y"), sum(bd * yd).as("_s2y"),
      sum(yd * yd).as("_syy"))
    val n = col("n").cast("double")
    def g(c: String) = col(c).cast("double")
    val c11 = n * g("_s11") - g("_s1") * g("_s1")
    val c22 = n * g("_s22") - g("_s2") * g("_s2")
    val c12 = n * g("_s12") - g("_s1") * g("_s2")
    val c1y = n * g("_s1y") - g("_s1") * g("_sy")
    val c2y = n * g("_s2y") - g("_s2") * g("_sy")
    val cyy = n * g("_syy") - g("_sy") * g("_sy")
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    mom.select(col("n"),
      round(when(det > 0, (g("_sy") - b1 * g("_s1") - b2 * g("_s2")) / n), scale)
        .as("b0"),
      round(when(det > 0, b1), scale).as("b1"),
      round(when(det > 0, b2), scale).as("b2"),
      round(when(det > 0, when(cyy > 0, (b1 * c1y + b2 * c2y) / cyy)), scale)
        .as("r2"),
      round(when(c11 > 0 && c22 > 0,
        when(lit(1.0) - c12 * c12 / (c11 * c22) > 0,
          lit(1.0) / (lit(1.0) - c12 * c12 / (c11 * c22)))), scale).as("vif"))
  }

  /** Winsorized Pearson correlation — [[linearFit]]'s corr with both
    * margins clamped at their own type-1 quantiles `[t, 1−t]` before
    * the moment fold: one wild (x, y) pair can hold plain r hostage;
    * clamping caps any single row's leverage while keeping every row's
    * vote (the correlation-shaped cousin of [[winsorize]] /
    * trimmedStats). Returns one row
    * `(n, lo_x, hi_x, lo_y, hi_y, corr_w)` — the clamps are shown
    * because a winsorized r without its clamps can't be audited.
    *
    * Determinism: the four clamps are [[quantileProfile]]'s exact
    * type-1 rank picks (ACTUAL data values — no interpolation);
    * clamping is least/greatest on the same doubles; the fold is
    * [[linearFit]]'s exact decimal discipline.
    *
    * Scale shape: two prefix-sum quantile passes (one per margin) +
    * one broadcast clamp attach + one moment fold.
    */
  def winsorizedCorr(
      df: DataFrame,
      x: Column,
      y: Column,
      trim: Double = 0.05,
      scale: Int = 6): DataFrame = {
    require(trim > 0 && trim < 0.5, s"trim must be in (0, 0.5), got $trim")
    val base = graft.Caches.track(
      df.select(x.cast("double").as("_x"), y.cast("double").as("_y"))
        .where(col("_x").isNotNull && col("_y").isNotNull))
    def clamps(c: String, lo: String, hi: String) =
      quantileProfile(base.select(col(c)), col(c), Nil, Seq(trim, 1 - trim))
        .groupBy()
        .agg(min(when(col("p") === trim, col("q"))).as(lo),
          min(when(col("p") === lit(1 - trim), col("q"))).as(hi))
    val cx = clamps("_x", "_lox", "_hix")
    val cy = clamps("_y", "_loy", "_hiy")
    val clamped = base.crossJoin(broadcast(cx)).crossJoin(broadcast(cy))
      .select(
        least(greatest(col("_x"), col("_lox")), col("_hix")).as("_cx"),
        least(greatest(col("_y"), col("_loy")), col("_hiy")).as("_cy"),
        col("_lox"), col("_hix"), col("_loy"), col("_hiy"))
    val xd = col("_cx").cast("decimal(18,6)")
    val yd = col("_cy").cast("decimal(18,6)")
    val mom = clamped.agg(
      count(lit(1)).as("n"),
      first(col("_lox")).as("_lo_x"), first(col("_hix")).as("_hi_x"),
      first(col("_loy")).as("_lo_y"), first(col("_hiy")).as("_hi_y"),
      sum(xd).as("_sx"), sum(yd).as("_sy"),
      sum(xd * xd).as("_sxx"), sum(yd * yd).as("_syy"), sum(xd * yd).as("_sxy"))
    val n = col("n").cast("double")
    val sx = col("_sx").cast("double"); val sy = col("_sy").cast("double")
    val vx = n * col("_sxx").cast("double") - sx * sx
    val vy = n * col("_syy").cast("double") - sy * sy
    val covN = n * col("_sxy").cast("double") - sx * sy
    mom.select(col("n"),
      round(col("_lo_x"), scale).as("lo_x"), round(col("_hi_x"), scale).as("hi_x"),
      round(col("_lo_y"), scale).as("lo_y"), round(col("_hi_y"), scale).as("hi_y"),
      round(when(vx > 0 && vy > 0, covN / (sqrt(vx) * sqrt(vy))), scale)
        .as("corr_w"))
  }

  /** Inequality index card — the decomposable complements of [[gini]] /
    * [[lorenzCurve]], each answering a question Gini folds away:
    * Theil T `Σ(x/X)·ln(x/(X/n))` (top-sensitive, subgroup-decomposable
    * — THE index for "how much inequality lives between vs within
    * sources"), Theil L / mean-log-deviation `ln(X/n) − (1/n)Σln x`
    * (bottom-sensitive), Atkinson(ε=1) `1 − geomean/mean` (the welfare
    * reading: the share of total you could discard under perfect
    * equality for equal welfare), and Hoover `Σ|x−μ|/(2X)` (the share
    * that would have to MOVE). One row
    * `(n, mean, theil_t, theil_l, atkinson_1, hoover)`. Contract:
    * strictly positive values — non-positive rows are EXCLUDED (the
    * logs are undefined there; n counts what entered).
    *
    * Determinism: one exact decimal fold (n, Σx, and the per-row
    * `x·ln x` / `ln x` terms decimal-re-summed — the
    * [[mutualInformation]] log discipline), then ONE broadcast-attached
    * second pass for Hoover's Σ|x−μ| against the pinned mean; every
    * closed form is scalar IEEE in textual order.
    */
  def inequalityIndices(
      df: DataFrame,
      value: Column,
      scale: Int = 6): DataFrame = {
    val base = graft.Caches.track(
      df.select(value.cast("double").as("_x")).where(col("_x") > 0))
    val m = base.agg(
      count(lit(1)).as("n"),
      sum(col("_x").cast("decimal(19,6)")).as("_sx"),
      sum((col("_x") * log(col("_x"))).cast("decimal(38,12)")).as("_sxlnx"),
      sum(log(col("_x")).cast("decimal(38,12)")).as("_slnx"))
    val n = col("n").cast("double")
    val x = col("_sx").cast("double")
    val mu = x / n
    val fit = m.where(col("n") > 0).select(col("n"), col("_sx"),
      col("_sxlnx"), col("_slnx"), mu.as("_mu"))
    val second = base.crossJoin(broadcast(fit))
      .agg(
        first(col("n")).as("n"),
        first(col("_sx")).as("_sx"), first(col("_sxlnx")).as("_sxlnx"),
        first(col("_slnx")).as("_slnx"), first(col("_mu")).as("_mu"),
        sum(abs(col("_x") - col("_mu")).cast("decimal(38,12)")).as("_sad"))
    val theilT = col("_sxlnx").cast("double") / x - log(x / n)
    val theilL = log(x / n) - col("_slnx").cast("double") / n
    val atk = lit(1.0) - exp(col("_slnx").cast("double") / n) / col("_mu")
    val hoover = col("_sad").cast("double") / (lit(2.0) * x)
    second.select(col("n"),
      round(col("_mu"), scale).as("mean"),
      round(theilT, scale).as("theil_t"),
      round(theilL, scale).as("theil_l"),
      round(atk, scale).as("atkinson_1"),
      round(hoover, scale).as("hoover"))
  }

  /** Newey–West long-run variance of a series mean — the
    * autocorrelation-robust standard error a time-series mean owes its
    * reader (the naive `s/√n` understates a positively-autocorrelated
    * series' uncertainty by the inflation factor this op reports):
    * `LRV = γ₀ + 2·Σ_{k=1..m} (1 − k/(m+1))·γ_k` (Bartlett kernel —
    * positive semi-definite by construction). Input: collapsed
    * contiguous series `(t, x)` (the ACF contract). One row
    * `(n, max_lag, gamma0, lrv, se_mean, se_naive, inflation)`;
    * LRV is floored at 0 (a deep negative-correlation series can push
    * the truncated sum below zero — reported as 0, never √negative).
    *
    * The per-lag autocovariances reuse the ACF estimator's exact
    * machinery UNROUNDED (`γ_k·n³ = n²C_k − n·S₁·P_k + m_k·S₁²` off
    * exact decimal sums — the [[ljungBox]] discipline); the m kernel
    * terms decimal-re-sum; every final ratio is pinned IEEE.
    */
  def neweyWest(series: DataFrame, maxLag: Int, scale: Int = 6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val x = graft.Caches.track(
      series.select(col("t").cast("long").as("t"),
        col("x").cast("decimal(18,6)").as("_xd")))
    val tot = x.agg(
      count(lit(1)).as("n"),
      sum(col("_xd")).as("_s1"),
      sum(col("_xd") * col("_xd")).as("_s2"))
    val lags = explode(array((1 to maxLag).map(l => lit(l.toLong)): _*)).as("lag")
    val paired = x.select(col("t"), col("_xd"), lags)
      .withColumn("_tk", col("t") + col("lag"))
      .join(x.select(col("t").as("_tk"), col("_xd").as("_xk")), Seq("_tk"))
    val perLag = paired.groupBy(col("lag")).agg(
      count(lit(1)).as("_m"),
      sum(col("_xd") * col("_xk")).as("_ck"),
      sum(col("_xd") + col("_xk")).as("_pk"))
    val n = col("n").cast("double")
    val s1 = col("_s1").cast("double"); val s2 = col("_s2").cast("double")
    val gk = (n * n * col("_ck").cast("double") -
      n * s1 * col("_pk").cast("double") +
      col("_m").cast("double") * s1 * s1) / (n * n * n)
    val w = lit(1.0) - col("lag").cast("double") / lit((maxLag + 1).toDouble)
    val kernelSum = perLag.crossJoin(broadcast(tot))
      .select((w * gk).cast("decimal(38,12)").as("_term"))
      .agg(coalesce(sum(col("_term")), lit(0.0).cast("decimal(38,12)")).as("_ks"))
    val gamma0 = (n * s2 - s1 * s1) / (n * n)
    val lrv = greatest(gamma0 + lit(2.0) * col("_ks").cast("double"), lit(0.0))
    tot.crossJoin(broadcast(kernelSum))
      .select(col("n"), lit(maxLag).as("max_lag"),
        round(when(col("n") > 0, gamma0), scale).as("gamma0"),
        round(when(col("n") > 0, lrv), scale).as("lrv"),
        round(when(col("n") > 0, sqrt(lrv / n)), scale).as("se_mean"),
        round(when(col("n") > 0, when(gamma0 >= 0, sqrt(gamma0 / n))), scale)
          .as("se_naive"),
        round(when(col("n") > 0, when(gamma0 > 0, lrv / gamma0)), scale)
          .as("inflation"))
  }

  /** Grubbs' test statistic — "is the single most extreme value an
    * outlier?" `G = max|x − x̄| / s` (sample s, n−1) plus WHICH value it
    * was — the one-outlier-at-a-time formal complement of
    * robustOutliers' MAD screen (G has a known null distribution; the
    * MAD screen is a filter). One row
    * `(n, mean, sd, g_stat, outlier)`; NULL G where s = 0.
    *
    * Determinism: one exact decimal moment fold pins x̄ and s; per-row
    * |x−x̄| is the same IEEE expression; the witness value is selected
    * by EQUALITY on the max deviation (same doubles both engines) with
    * max(value) breaks the symmetric two-sided tie.
    */
  def grubbs(df: DataFrame, value: Column, scale: Int = 6): DataFrame = {
    val base = graft.Caches.track(
      df.select(value.cast("double").as("_v")).where(col("_v").isNotNull))
    val vd = col("_v").cast("decimal(18,6)")
    val mom = base.agg(
      count(lit(1)).as("n"), sum(vd).as("_s"), sum(vd * vd).as("_q"))
    val n = col("n").cast("double")
    val s1 = col("_s").cast("double"); val s2 = col("_q").cast("double")
    val mu = s1 / n
    val varS = (n * s2 - s1 * s1) / (n * (n - 1.0))
    val fit = mom.where(col("n") > 1).select(
      col("n"), mu.as("_mu"),
      when(varS > 0, sqrt(varS)).as("_sd"))
    val dev = base.crossJoin(broadcast(fit))
      .select(col("n"), col("_mu"), col("_sd"),
        col("_v"), abs(col("_v") - col("_mu")).as("_ad"))
    val mx = dev.agg(max(col("_ad")).as("_mx"))
    dev.crossJoin(broadcast(mx))
      .where(col("_ad") === col("_mx"))
      .agg(
        first(col("n")).as("n"),
        round(first(col("_mu")), scale).as("mean"),
        round(first(col("_sd")), scale).as("sd"),
        round(when(first(col("_sd")).isNotNull,
          first(col("_mx")) / first(col("_sd"))), scale).as("g_stat"),
        max(col("_v")).as("outlier"))
  }
}
