package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{EventAnalytics, Stats}

/** End-to-end A/B experiment readout over the synthetic events/documents —
  * the composition narrative behind the round-12 continuation operators,
  * the way DiagnosticsDemo narrates the regression family: robust
  * two-sample battery (location, scale, heteroskedastic, effect size,
  * shift magnitude) → k-group honesty check → censoring-aware survival
  * battery off ONE mergeable state (curve, hazard, three tests, hazard
  * ratio, restricted mean), each stage one library operator and the
  * survival stages all reading the SAME [[EventAnalytics.survivalPartials]]
  * tables a streaming monitor would maintain.
  *
  * Run: `sbt "runMain graft.examples.ExperimentDemo"` — prints one
  * `[experiment]` line per stage and ends with `EXPERIMENT-DONE`.
  */
object ExperimentDemo {
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
      println(f"[experiment] $stage%-24s $detail")

    // the "experiment": even/odd user ids as arms; the metric battery
    // runs on document length en-vs-de as a stand-in treatment contrast
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("lang").isin("en", "de"))
    val metric = col("n_chars"); val arm = col("lang") === "en"

    // 1. location: did the mean rank move? (the workhorse)
    val mw = Stats.mannWhitney(docs, metric, arm).head
    obs("location (MW)", s"U=${mw.get(2)} z=${mw.get(3)}")

    // 2. scale: same medians can hide a variance change — the AB test
    // reads dispersion where MW reads location
    val ab = Stats.ansariBradley(docs, metric, arm).head
    obs("scale (Ansari-Bradley)", s"W=${ab.get(2)} z=${ab.get(3)}")

    // 3. the heteroskedasticity-honest re-ask: if arms differ in spread,
    // Brunner-Munzel is the rank test whose variance stays valid
    val bm = Stats.brunnerMunzel(docs, metric, arm).head
    obs("BM (hetero-honest)", s"p_hat=${bm.get(2)} W=${bm.get(3)} df=${bm.get(4)}")

    // 4. effect size + magnitude: significance says "real", these say
    // "how often" and "by how much"
    val cd = Stats.cliffsDelta(docs, metric, arm).head
    val hl = Stats.hodgesLehmann(docs, metric, arm).head
    obs("effect size", s"cliffs_delta=${cd.get(5)} hl_shift=${hl.get(3)}")

    // 5. the k-group honesty check across ALL languages: Welch's ANOVA
    // doesn't borrow the equal-variance assumption the contrast above
    // just questioned
    val wa = Stats.welchAnova(spark.read.parquet(s"$dir/documents.parquet"),
      col("n_chars"), col("lang")).head
    obs("k-group (Welch ANOVA)", s"F=${wa.get(5)} df2=${wa.get(4)} k=${wa.get(0)}")

    // --- survival leg: time-to-first-purchase by arm, everything served
    // from ONE pair of mergeable binned states ---
    val eventsRaw = spark.read.parquet(s"$dir/events.parquet")
    // ts unit is driver-owned (nanos or µs timestamps) — normalize to the
    // nano axis the way SparkEntry.E() does
    val events = eventsRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => eventsRaw
      case _ => eventsRaw.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
    val days = events
      .select(col("user_id"), expr("ts div 86400000000000").as("day"), col("event_type"))
    val u = days.groupBy(col("user_id")).agg(
      min(col("day")).as("fd"), max(col("day")).as("ld"),
      min(when(col("event_type") === "purchase", col("day"))).as("pd"),
      min(when(col("event_type") === "signup", col("day"))).as("sd"))
    val obsSpans = u.select(
      col("user_id"),
      (coalesce(col("pd"), col("ld")) - col("fd")).as("dur"),
      col("pd").isNotNull.as("ev"),
      (col("user_id") % 2 === 0).as("arm")).cache()
    val stA = EventAnalytics.survivalPartials(
      obsSpans.where(col("arm")), col("dur"), col("ev"), binWidth = 3L).cache()
    val stB = EventAnalytics.survivalPartials(
      obsSpans.where(!col("arm")), col("dur"), col("ev"), binWidth = 3L).cache()
    obs("survival states", s"binned life tables: A=${stA.count()} bins, B=${stB.count()} bins")

    // 6. the curves both arms' stakeholders look at
    val kmA = EventAnalytics.kaplanMeierFromState(stA)
      .orderBy(col("t")).collect()
    obs("KM (arm A)", kmA.take(4).map(r => s"t=${r.getLong(0)} S=${r.getDouble(4)}").mkString(" "))
    val na = EventAnalytics.nelsonAalenFromState(
      EventAnalytics.survivalMerge(Seq(stA, stB))).orderBy(col("t")).collect()
    obs("NA (pooled hazard)", na.take(4).map(r => s"t=${r.getLong(0)} H=${r.getDouble(5)}").mkString(" "))

    // 7. the three tests, one question each: any difference (log-rank),
    // early difference (Gehan), and the size of it (Cox hazard ratio)
    val lr = EventAnalytics.logRankFromStates(stA, stB).head
    val gw = EventAnalytics.gehanWilcoxonFromStates(stA, stB).head
    val cox = EventAnalytics.coxFromStates(stA, stB).head
    obs("log-rank vs Gehan", s"z_lr=${lr.get(6)} z_gehan=${gw.get(6)} " +
      "(Gehan up-weights EARLY gaps; a large split between the two flags crossing curves)")
    obs("Cox hazard ratio", s"HR=${cox.get(5)} beta=${cox.get(4)} z=${cox.get(7)} " +
      s"converged=${cox.get(9)}")
    val fh = EventAnalytics.flemingHarringtonFromStates(stA, stB, rho = 0.0, gamma = 1.0).head
    obs("FH(0,1) late-weight", s"z=${fh.get(8)} " +
      "(up-weights LATE gaps — compare against z_lr when the effect is delayed)")

    // 8. the effect-size reading a stakeholder can price: mean purchase-
    // free days within the first 30, per arm
    val rmstA = EventAnalytics.rmst(obsSpans.where(col("arm")), col("dur"), col("ev"), tau = 30L).head
    val rmstB = EventAnalytics.rmst(obsSpans.where(!col("arm")), col("dur"), col("ev"), tau = 30L).head
    obs("RMST@30", s"A=${rmstA.get(2)} B=${rmstB.get(2)} days purchase-free")

    // 9. the adjusted fit once one covariate isn't enough: arm + a
    // heavy-user flag, segment baselines stratified out (free per-segment
    // hazard, one shared beta) — Efron ties, the package default
    val adj = obsSpans.withColumn("heavy", (col("user_id") % 5 < 2).cast("double"))
      .withColumn("segment", (col("user_id") % 3).cast("string"))
    val fit = EventAnalytics.coxStratified(
      adj, (col("dur") / 3L).cast("long"), col("ev"),
      Seq("arm" -> col("arm").cast("double"), "heavy" -> col("heavy")),
      strata = col("segment"), ties = "efron").collect()
    obs("stratified Cox", fit.map(r =>
      s"${r.getString(0)}: HR=${r.get(2)} z=${r.get(4)}").mkString(" ") +
      s" converged=${fit.head.getBoolean(8)}")

    // 10. what the fit is FOR: the baseline survival curve, served at a
    // covariate profile (S(t|x) = S0(t)^exp(beta.x)) — plus the check
    // that should precede every Cox number anyone ships: is the
    // proportional-hazards assumption even true?
    val baseRows = EventAnalytics.coxBaselineFromStates(stA, stB).orderBy(col("t")).collect()
    obs("Cox baseline", baseRows.takeRight(2).map(r =>
      s"t=${r.getLong(0)} H0=${r.getDouble(2)} S0=${r.getDouble(3)}").mkString(" "))
    val ph = EventAnalytics.coxSchoenfeld(
      adj, (col("dur") / 3L).cast("long"), col("ev"),
      Seq("arm" -> col("arm").cast("double"), "heavy" -> col("heavy"))).collect()
    obs("PH diagnostic", ph.map(r =>
      s"${r.getString(0)}: chi2=${r.get(1)} violated=${r.get(3)}").mkString(" "))

    // 10. when purchase COMPETES with signup for "first conversion", 1-KM
    // of either alone overstates it — the CIF decomposes the risk honestly
    val firstOf = u.select(
      (coalesce(least(coalesce(col("pd"), col("sd")), coalesce(col("sd"), col("pd"))),
        col("ld")) - col("fd")).as("dur"),
      when(col("pd").isNotNull && (col("sd").isNull || col("pd") <= col("sd")), "purchase")
        .when(col("sd").isNotNull, "signup").otherwise(lit(null)).as("cause"))
    val cif = EventAnalytics.cumulativeIncidence(firstOf, col("dur"), col("cause"), binWidth = 3L)
      .orderBy(col("t"), col("cause")).collect()
    obs("competing-risks CIF", cif.takeRight(2).map(r =>
      s"${r.getString(1)}@t=${r.getLong(0)}: ${r.getDouble(4)}").mkString(" "))

    println("EXPERIMENT-DONE")
    spark.stop()
  }
}
