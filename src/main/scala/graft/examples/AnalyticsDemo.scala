package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{EventAnalytics, Sampling, Stats, Validate}

/** End-to-end analytics/monitoring story over the synthetic star schema —
  * the composition narrative behind the statistics operators, the way the
  * CorpusPipelineDemo is the narrative behind the corpus ones: integrity
  * gate → cohort split → significance tests → drift monitors → change-point
  * watch → attribution → segmentation → distribution dashboard, each stage
  * one library operator.
  *
  * Run: `sbt "runMain graft.examples.AnalyticsDemo"` — prints one
  * `[analytics]` line per stage and ends with `ANALYTICS-DONE`.
  */
object AnalyticsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    def obs(stage: String, detail: String): Unit =
      println(f"[analytics] $stage%-26s $detail")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val eventsRaw = spark.read.parquet(s"$dir/events.parquet")
    val events = eventsRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => eventsRaw
      case _ => eventsRaw.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }

    // 1. referential-integrity gate: a broken FK poisons every join below
    val fk = Validate.fkOrphans(orders, col("o_custkey"), customer, col("c_custkey"),
        "orders>customer")
      .unionByName(Validate.fkOrphans(lineitem, col("l_orderkey"), orders,
        col("o_orderkey"), "lineitem>orders"))
    val orphanTotal = fk.agg(sum(col("n_orphans"))).head.getLong(0)
    require(orphanTotal == 0L, s"integrity gate failed: $orphanTotal orphans")
    obs("integrity gate", "PASS (2 FKs, 0 orphans)")

    // 2. cohort split: a deterministic user-grain A/B assignment that keeps
    // every user's events together (the join-preserving sampler's rule)
    val assigned = Sampling.trainTestSplit(events, col("user_id"), testFraction = 0.5)
      .withColumnRenamed("split", "cohort")
    val cohorts = assigned.groupBy("cohort").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    obs("cohort split", cohorts)

    // 3. engagement significance: does per-user event count differ between
    // cohorts? Mean-level (Welch) and distribution-level (KS) side by side
    val perUser = assigned.groupBy(col("cohort"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
    val labeled = perUser.withColumn("_y", col("cohort") === "test")
    val w = Stats.welchTtest(labeled, col("n_ev"), col("_y")).head
    obs("welch t-test", f"t=${w.getDouble(4)}%.3f dof=${w.getDouble(5)}%.1f")
    val ks = Stats.ksTest(labeled, col("n_ev"), col("_y")).head
    obs("ks test", f"D=${ks.getDouble(2)}%.4f ks_stat=${ks.getDouble(3)}%.3f")

    // 4. drift monitor: PSI of the activity distribution between cohorts —
    // a random split should sit far below the 0.1 watch threshold
    val psi = Stats.psi(labeled, col("n_ev"), col("_y"), lo = 0.0, hi = 120.0, bins = 12).head
    obs("psi drift", f"psi=${psi.getDouble(4)}%.4f bins=${psi.getLong(2)}")
    require(psi.getDouble(4) < 0.1, "random cohorts should not drift")

    // 5. change-point watch on the daily click series
    val series = events.where(col("event_type") === "click")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val alarms = EventAnalytics.cusum(series, col("day"), col("x"), k = 5.0, h = 15.0)
      .where(col("alarm")).count()
    obs("cusum watch", s"$alarms alarm days")

    // 6. funnel + linear attribution over the same stream
    val funnel = EventAnalytics.funnel(
      events.withColumn("tsu", expr("ts div 1000")),
      steps = Seq("view", "click", "purchase"), windowTs = 604800000000L, tsCol = "tsu")
    val conv = funnel.agg(
      count(lit(1)).as("n"),
      sum(when(col("steps_completed") === 3, 1L).otherwise(0L)).as("c")).head
    obs("funnel", s"${conv.getLong(1)}/${conv.getLong(0)} users convert")
    val attr = EventAnalytics.linearAttribution(events, Seq("view", "click"),
        "purchase", windowTs = 604800000000000L)
      .collect().map(r => f"${r.getString(0)}=${r.getDouble(2)}%.1f").sorted.mkString(" ")
    obs("attribution", attr)

    // 7. customer value segmentation (RFM quartiles off orders)
    val rfm = EventAnalytics.rfm(orders, col("o_custkey"),
      unix_micros(col("o_orderdate").cast("timestamp")), col("o_totalprice"))
    val topSegment = rfm.where(col("r_bin") === 3 && col("f_bin") === 3 && col("m_bin") === 3)
      .count()
    obs("rfm segmentation", s"$topSegment customers in the 3/3/3 cell")

    // 8. distribution dashboard: mergeable histogram state (two "batches")
    // served as grid quantiles + a bootstrap CI on the mean
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hist = Stats.histMerge(Seq(
      Stats.histPartials(docs.where(col("doc_id") % 2 === 0), col("n_chars"), 0.0, 600.0, 12),
      Stats.histPartials(docs.where(col("doc_id") % 2 =!= 0), col("n_chars"), 0.0, 600.0, 12)))
    val med = Stats.quantilesFromHist(hist, 0.0, 600.0, 12, Seq(0.5)).head
    obs("hist-state median", s"[${med.getDouble(2)}, ${med.getDouble(3)})")
    val ci = Stats.bootstrapMeanCI(docs, col("n_chars"), col("doc_id"), b = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    obs("bootstrap mean CI", f"[${ci(0.025)}%.1f, ${ci(0.975)}%.1f]")

    // 9. k-group significance + lead/lag structure
    val f = Stats.anovaF(docs, col("n_chars"), col("lang")).head
    obs("anova across langs", f"F=${f.getDouble(4)}%.2f df=(${f.getLong(2)},${f.getLong(3)})")
    def daily(t: String, cName: String) = events.where(col("event_type") === t)
      .groupBy(expr("ts div 86400000000000").as("t")).agg(count(lit(1)).as(cName))
    val xc = EventAnalytics.crossCorrelation(daily("view", "x"), daily("purchase", "y"), 3)
      .collect().filter(!_.isNullAt(2)).maxBy(_.getDouble(2))
    obs("view→purchase xcorr", f"peak lag=${xc.getLong(0)} corr=${xc.getDouble(2)}%.3f")

    // 10. retention survival + targeting efficiency
    val days = events.select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val u = days.groupBy(col("user_id")).agg(min(col("day")).as("_fd"), max(col("day")).as("_ld"))
    val surv = EventAnalytics.kaplanMeier(
      u.crossJoin(broadcast(u.agg(max(col("_ld")).as("_md"))))
        .select((col("_ld") - col("_fd")).as("dur"), (col("_ld") <= col("_md") - 10).as("ev")),
      col("dur"), col("ev"))
    val tail = surv.orderBy(col("t").desc).head
    obs("km survival tail", f"S(${tail.getLong(0)})=${tail.getDouble(4)}%.3f")

    // 11. information structure: which metadata column predicts lang, and
    // which words mark each language
    val ig = Stats.infoGainProfile(docs, col("lang"),
      Seq("source" -> col("source"), "len_band" -> floor(col("n_chars") / lit(400)).cast("long")))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    obs("info gain (Theil U)", ig.map { case (k, v) => f"$k=$v%.4f" }.mkString(" "))
    val marker = graft.ops.TextAnalysis.termLabelChi2(docs, topK = 1)
      .orderBy(col("chi2").desc).head
    obs("top marker term", f"'${marker.getString(1)}' for ${marker.getString(0)} " +
      f"chi2=${marker.getDouble(4)}%.1f")

    // 12. temporal structure: daily seasonality + the journeys' long-run mass
    val seas = EventAnalytics.seasonalDecompose(
      events.withColumn("tsu", expr("ts div 1000")), bucketTs = 3600000000L,
      period = 24, tsCol = "tsu")
    val peak = seas.where(col("seasonal").isNotNull)
      .groupBy(pmod(col("bucket"), lit(24L)).as("hour"))
      .agg(round(avg(col("seasonal")), 3).as("s")).orderBy(col("s").desc).head
    obs("seasonal peak hour", s"hour=${peak.getLong(0)} avg seasonal=${peak.getDouble(1)}")
    val stat = EventAnalytics.markovStationary(
      EventAnalytics.transitionCounts(events.withColumn("tsu", expr("ts div 1000")),
        tsCol = "tsu"), iterations = 10)
      .orderBy(col("p").desc).head
    obs("journey attractor", s"${stat.getString(0)} p=${stat.getDouble(1)}")

    // 13. trend watch on the hourly volume: is there a monotone drift,
    // and where did the level shift?
    val hours = events.select(expr("ts div 3600000000000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
    val axis = hours.agg(min(col("h")).as("_lo"), max(col("h")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("t"))
    val dense = axis.join(hours.withColumnRenamed("h", "t"), Seq("t"), "left")
      .select(col("t"), coalesce(col("x"), lit(0L)).as("x"))
    val mk = Stats.mannKendall(dense, col("t"), col("x")).head
    obs("mann-kendall trend", f"S=${mk.getLong(1)} " +
      (if (mk.isNullAt(3)) "z=n/a" else f"z=${mk.getDouble(3)}%.2f"))
    val cp = Stats.changepoint(dense, col("t"), col("x")).head
    obs("changepoint", f"after t=${cp.getLong(0)} " +
      f"level ${cp.getDouble(4)}%.1f→${cp.getDouble(5)}%.1f score=${cp.getDouble(3)}%.1f")

    // 14. experiment + cheap dashboard: the A/B read and the 10%-scan
    // approximate revenue rollup with honest error bars
    val per = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("_cv"))
      .select(when(col("user_id") % 2 === 0, "even").otherwise("odd").as("v"),
        (col("_cv") === 1L).as("s"))
    val ab = Stats.twoProportionTest(per, col("v"), col("s")).head
    obs("a/b purchase", f"rates ${ab.getDouble(6)}%.3f vs ${ab.getDouble(7)}%.3f " +
      (if (ab.isNullAt(9)) "z=n/a" else f"z=${ab.getDouble(9)}%.2f"))
    val aqp = Sampling.approxAggregate(orders, col("o_orderkey"), col("o_totalprice"),
      Seq("o_orderpriority"), fraction = 0.1).orderBy(col("est_sum").desc).head
    obs("aqp revenue (10% scan)", f"${aqp.getString(0)} " +
      f"est=${aqp.getDouble(5)}%.0f ci=[${aqp.getDouble(6)}%.0f, ${aqp.getDouble(7)}%.0f]")

    // 15. forecastability + mix repair: does the 24h pattern beat
    // momentum, and what weights balance source × language?
    val typedHours = events.select(col("event_type"), expr("ts div 3600000000000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("x"))
    val typedDense = typedHours.select(col("event_type")).distinct()
      .crossJoin(broadcast(axis))
      .join(typedHours.withColumnRenamed("h", "t"), Seq("event_type", "t"), "left")
      .select(col("event_type"), col("t"), coalesce(col("x"), lit(0L)).as("x"))
    val bestMase = EventAnalytics.maseBacktest(typedDense, season = 24,
      strataCols = Seq("event_type")).where(col("mase").isNotNull)
      .orderBy(col("mase")).head
    obs("most seasonal stream", f"${bestMase.getString(0)} mase=${bestMase.getDouble(4)}%.3f")
    val rak = Sampling.ipfWeights(docs, col("source"), col("lang"), rounds = 3)
      .agg(round(min(col("factor")), 3).as("mn"), round(max(col("factor")), 3).as("mx")).head
    obs("raking factor range", s"[${rak.getDouble(0)}, ${rak.getDouble(1)}] to uniform margins")

    // 16. round-11 eval drawer: size the A/B effect instead of just
    // significance-testing it, robust-center the revenue column, and
    // FDR-gate a per-type metric sweep so 16 simultaneous tests don't
    // manufacture discoveries
    val eff = Stats.cohensD(lineitem, col("l_extendedprice"),
      col("l_returnflag") === "R").head
    obs("effect size R-vs-rest", (if (eff.isNullAt(5)) "d=n/a"
      else f"d=${eff.getDouble(5)}%.4f g=${eff.getDouble(6)}%.4f") + " (price in σ units)")
    val trm = Stats.trimmedStats(lineitem, col("l_extendedprice"),
      Seq(col("l_orderkey"), col("l_linenumber"))).head
    obs("robust price center", f"mean=${trm.getDouble(3)}%.0f " +
      f"trimmed=${trm.getDouble(4)}%.0f winsorized=${trm.getDouble(5)}%.0f")
    val wmed = Stats.weightedQuantile(lineitem, col("l_extendedprice"),
      col("l_quantity"), Seq(col("l_orderkey"), col("l_linenumber")), 1, 2).head
    obs("quantity-weighted median", f"half the quantity mass sits under ${wmed.getDouble(1)}%.0f")
    // per-type purchase-rate z-tests vs the global rate → BH at α=0.05
    val tot = events.agg(
      count(lit(1)).cast("double").as("_n"),
      sum(when(col("event_type") === "purchase", 1.0).otherwise(0.0)).as("_k")).head
    val p0 = tot.getDouble(1) / tot.getDouble(0)
    val perType = events
      .select(col("user_id") % 16 as "slice",
        when(col("event_type") === "purchase", 1.0).otherwise(0.0).as("_y"))
      .groupBy(col("slice")).agg(count(lit(1)).as("n"), sum(col("_y")).as("k"))
      .select(col("slice"),
        abs(col("k") / col("n") - p0)
          .divide(sqrt(lit(p0 * (1 - p0)) / col("n"))).as("z"))
      // two-sided normal p via the χ²₁ tail bound ≈ erfc — keep it simple:
      // p = exp(−z²/2) is a monotone stand-in adequate for an FDR DEMO rank
      .select(col("slice"), exp(col("z") * col("z") / -2.0).as("p"))
    val fdr = Stats.bhFdr(perType, col("p"), col("slice"))
    val nRej = fdr.where(col("reject")).count()
    obs("fdr-gated slice sweep", s"$nRej of 16 user-slices deviate at FDR 0.05")

    graft.Caches.clear()
    println("ANALYTICS-DONE")
    spark.stop()
  }
}
