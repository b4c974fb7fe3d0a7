package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Stats

/** End-to-end model-diagnostics story over the synthetic star schema —
  * the composition narrative behind the round-12 regression/test-family
  * operators, the way AnalyticsDemo is the narrative behind the
  * monitoring ones: distribution pre-flight → fit → residual autopsy →
  * robust/orthogonal cross-checks → ordered-alternative tests → power
  * honesty check, each stage one library operator reading the previous
  * stage's verdict.
  *
  * Run: `sbt "runMain graft.examples.DiagnosticsDemo"` — prints one
  * `[diagnostics]` line per stage and ends with `DIAGNOSTICS-DONE`.
  */
object DiagnosticsDemo {
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
      println(f"[diagnostics] $stage%-24s $detail")

    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val part = spark.read.parquet(s"$dir/part.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")

    // 1. distribution pre-flight: is the response even CLOSE to normal?
    // (every t/F below assumes it — check before trusting them)
    val jb = Stats.jarqueBera(lineitem, col("l_quantity")).head
    obs("normality pre-flight",
      s"JB=${jb.getDouble(3)} skew=${jb.getDouble(1)} kurt=${jb.getDouble(2)} " +
        "(uniform grid: platykurtic, as expected)")

    // 2. the fit under test: extended price on quantity
    val fit = Stats.linearFit(lineitem, col("l_quantity"), col("l_extendedprice")).head
    obs("OLS fit", s"slope=${fit.getDouble(2)} corr=${fit.getDouble(1)}")

    // 3. residual autopsy I: does the error VARIANCE grow with x?
    // (read against chi2(1); this synthetic grid draws price independent
    // of quantity, so a LOW LM here is itself the correct verdict)
    val bp = Stats.breuschPagan(lineitem, col("l_quantity"), col("l_extendedprice")).head
    obs("heteroscedasticity", s"Koenker LM=${bp.getDouble(4)} vs chi2(1)")

    // 4. residual autopsy II: who OWNS the fit? (one influential point
    // can draw the whole line)
    val cook = Stats.cooksDistance(part, col("p_size"), col("p_retailprice"),
      col("p_partkey"), topK = 3).collect()
    obs("influence top-3",
      cook.map(r => s"part=${r.getLong(0)} D=${r.getDouble(5)}").mkString(" "))

    // 5. robust cross-checks: clamp the tails, fit under noise-in-both
    val wc = Stats.winsorizedCorr(lineitem, col("l_quantity"),
      col("l_extendedprice"), trim = 0.05).head
    val dem = Stats.demingFit(part, col("p_size"), col("p_retailprice")).head
    obs("robust cross-check",
      s"winsorized r=${wc.getDouble(5)} vs plain ${fit.getDouble(1)}; " +
        s"Deming slope=${if (dem.isNullAt(1)) "n/a" else dem.getDouble(1)}")

    // 6. collinearity light: is a second regressor just the first again?
    val li = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("x1"), sum(col("l_quantity")).cast("double").as("x2"))
    val joined = orders.select(col("o_orderkey"), col("o_totalprice"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
    val ols2 = Stats.olsTwo(joined, col("x1"), col("x2"), col("o_totalprice")).head
    obs("two-regressor fit",
      s"R2=${ols2.getDouble(4)} VIF=${ols2.getDouble(5)} " +
        "(the VIF says the regressors overlap even where R2 is small)")

    // 7. ordered alternative: do quantities RISE with the line number?
    val jt = Stats.jonckheereTerpstra(lineitem, col("l_linenumber"),
      col("l_quantity")).head
    obs("ordered trend (JT)",
      s"z=${if (jt.isNullAt(3)) "n/a" else jt.getDouble(3)} " +
        "(no dose effect: line numbers are arbitrary)")

    // 8. power honesty: could the even/odd order-key split even SEE a
    // 2-point shift in high-value-order rate?
    val power = Stats.powerTwoProportions(
      orders.select((col("o_orderkey") % 2 === 0).as("arm"),
        (col("o_totalprice") >= 200000.0).as("y")),
      col("arm"), col("y"), targetLift = 0.02).head
    obs("power card",
      s"MDE=${power.getDouble(3)} n_req/arm=${power.getLong(5)} " +
        s"at p=${power.getDouble(2)}")

    println("DIAGNOSTICS-DONE")
    spark.stop()
  }
}
