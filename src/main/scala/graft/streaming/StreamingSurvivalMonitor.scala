package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.EventAnalytics

/** Incremental survival A/B monitoring over a stream of COMPLETED
  * observation spans — the streaming face of the binned survival family
  * ([[EventAnalytics.survivalPartials]] → KM / Nelson–Aalen / log-rank /
  * Gehan / Fleming–Harrington / Cox, and [[EventAnalytics.competingPartials]]
  * → the Aalen–Johansen CIF).
  *
  * The whole family's insight is that every estimator reads ONLY the
  * additive per-`(arm, bin[, cause])` life-table counts, and sums are
  * mergeable. So the monitor maintains exactly that table per
  * micro-batch (each batch's contribution written to its own
  * `ingest_batch=<id>` partition — dynamic-partition overwrite makes a
  * replayed batch rewrite itself, not double-count: the
  * [[StreamingDedupIngest]] / [[StreamingRateMonitor]] recovery
  * contract), and every serving face merges ≤|arms|·|bins|·|causes|
  * partial rows. Spans are never rescanned: at 100 TB of history the
  * retention dashboard's log-rank reads a few hundred life-table rows.
  *
  * Input rows are completed spans `(durCol, eventCol, armCol[, causeCol])`
  * — one per subject, emitted when the subject converts/churns or is
  * censored at snapshot time. A bin straddling micro-batches merges its
  * partials; arms are monitored jointly so one ingest pass feeds every
  * two-sample face.
  */
case class StreamingSurvivalMonitor(
    spark: SparkSession,
    statePath: String,
    binWidth: Long,
    durCol: String = "dur",
    eventCol: String = "ev",
    armCol: String = "arm",
    causeCol: Option[String] = None) {

  require(binWidth > 0, s"binWidth must be positive, got $binWidth")

  /** Adds one micro-batch's per-arm life-table partials under its own
    * batch partition (replay-idempotent). With `causeCol` set the state
    * also carries per-cause event counts, so the CIF face is servable
    * from the same table (`cause` NULL ⇔ censored, the
    * [[EventAnalytics.competingPartials]] contract; the plain survival
    * faces read `n_events` = any-cause).
    */
  def ingestBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val causeExpr = causeCol match {
      case Some(c) => when(col(eventCol).cast("boolean"), col(c).cast("string"))
        .otherwise(lit(null))
      case None => when(col(eventCol).cast("boolean"), lit("event"))
        .otherwise(lit(null))
    }
    batch
      // null ev is dropped, not censored (the survivalPartials contract)
      .where(col(eventCol).cast("boolean").isNotNull)
      .select(col(armCol).cast("boolean").as("arm"),
        (col(durCol).cast("long") / lit(binWidth)).cast("long").as("bin"),
        causeExpr.as("cause"))
      .where(col("bin").isNotNull && col("arm").isNotNull)
      .groupBy(col("arm"), col("bin"), col("cause"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ingest_batch", lit(batchId))
      .write
      .partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(statePath)
  }

  /** Starts the monitor over a file-source stream of completed spans. */
  def start(schema: StructType, basePath: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(basePath)
      .writeStream
      .foreachBatch(ingestBatch _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The merged life table — an EMPTY same-schema frame before the first
    * non-empty ingest (a monitor dashboard must render an empty curve,
    * not crash on a store the stream hasn't created yet). Tracked-
    * persisted: every two-sample face reads it twice (one arm each).
    */
  private def merged(): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.startsWith("ingest_batch="))
    val raw =
      if (hasData) spark.read.parquet(statePath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("arm", org.apache.spark.sql.types.BooleanType),
          org.apache.spark.sql.types.StructField("bin", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cause", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType))))
    graft.Caches.track(
      raw.groupBy(col("arm"), col("bin"), col("cause")).agg(sum(col("n")).as("n")))
  }

  /** Rewrites the batch-partitioned store as ONE compacted partition
    * (`ingest_batch=-1`) — the [[graft.ops.Dedup.LshIndex.compact]]
    * small-files discipline: a minutely-triggered monitor accumulates one
    * tiny partition dir per micro-batch forever, and every face pays the
    * listing. CONTRACT: run only when no replay of already-ingested batch
    * ids is possible (the stream's checkpoint has committed past them) —
    * a post-compaction replay of an absorbed batch would double-count.
    */
  def compact(): Unit = {
    val m = merged()
    val rows = m.collect() // ≤ arms·bins·causes rows — the state is bounded
    if (rows.isEmpty) return
    val compacted = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), m.schema)
    compacted
      .withColumn("ingest_batch", lit(-1L))
      .write
      // Pinned, not inherited: under a session-wide
      // spark.sql.sources.partitionOverwriteMode=dynamic (the mode every
      // ingestBatch explicitly requests), a bare Overwrite+partitionBy
      // would rewrite ONLY ingest_batch=-1 and leave every old batch
      // partition in place — all faces then double-count the history.
      .option("partitionOverwriteMode", "static")
      .partitionBy("ingest_batch")
      .mode(SaveMode.Overwrite) // static overwrite: replaces the whole store
      .parquet(statePath)
  }

  private def stateFrom(m: DataFrame, arm: Boolean): DataFrame =
    m.where(col("arm") === arm)
      .groupBy(col("bin")).agg(
        sum(when(col("cause").isNotNull, col("n")).otherwise(0L)).as("n_events"),
        sum(when(col("cause").isNull, col("n")).otherwise(0L)).as("n_censored"))

  /** One arm's merged [[EventAnalytics.survivalPartials]] state
    * `(bin, n_events, n_censored)` — events = any cause. */
  def stateOf(arm: Boolean): DataFrame = stateFrom(merged(), arm)

  /** One arm's merged [[EventAnalytics.competingPartials]] state
    * `(bin, cause, n)` (requires `causeCol`). */
  def competingStateOf(arm: Boolean): DataFrame = {
    require(causeCol.isDefined, "competingStateOf needs causeCol at construction")
    merged().where(col("arm") === arm).select(col("bin"), col("cause"), col("n"))
  }

  def kaplanMeier(arm: Boolean): DataFrame =
    EventAnalytics.kaplanMeierFromState(stateOf(arm))

  def nelsonAalen(arm: Boolean): DataFrame =
    EventAnalytics.nelsonAalenFromState(stateOf(arm))

  private def twoSample(f: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val m = merged() // one tracked scan feeds both arms
    f(stateFrom(m, arm = true), stateFrom(m, arm = false))
  }

  def logRank(): DataFrame = twoSample(EventAnalytics.logRankFromStates(_, _))

  def gehanWilcoxon(): DataFrame =
    twoSample(EventAnalytics.gehanWilcoxonFromStates(_, _))

  def flemingHarrington(rho: Double, gamma: Double): DataFrame =
    twoSample(EventAnalytics.flemingHarringtonFromStates(_, _, rho, gamma))

  def cox(ties: String = "breslow"): DataFrame =
    twoSample(EventAnalytics.coxFromStates(_, _, ties = ties))

  /** Cumulative baseline hazard / baseline survival of the two-arm Cox
    * fit served off the merged streamed partials (arm = true is the
    * x = 1 covariate) — `(t, h0, cum_h0, baseline_surv)` per bin. */
  def coxBaseline(ties: String = "breslow"): DataFrame =
    twoSample(EventAnalytics.coxBaselineFromStates(_, _, ties = ties))

  /** Per-arm Aalen–Johansen cumulative incidence (requires `causeCol`). */
  def cumulativeIncidence(arm: Boolean): DataFrame =
    EventAnalytics.cumulativeIncidenceFromState(competingStateOf(arm))
}
