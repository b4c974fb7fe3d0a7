package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * Every operator keys off `hash("<seed>:" || key) mod Granularity` — a pure
  * map-side filter: no shuffle, no RNG state, no per-partition sampler
  * re-seeding. The properties that matter at 100 TB:
  *
  *  - '''reproducible''': the selected row set depends only on row keys, so
  *    it is identical across runs, cluster sizes, and input partitionings —
  *    unlike `df.sample`, whose Bernoulli draw follows partition iteration
  *    order (a repartition changes the sample under the same seed);
  *  - '''consistent across tables''': membership is a function of the key,
  *    so sampling several tables by the same entity key (user_id, doc_id)
  *    keeps their join structure intact — the sampled fact rows still find
  *    their sampled dimension partners;
  *  - '''nesting''': the kept sets are nested by threshold — a p-sample of
  *    a q-sample is exactly the min(p,q)-sample, so growing a 0.1% pilot to
  *    a 1% run keeps every pilot row;
  *  - '''stratified rates are per-group exact-in-expectation''' with zero
  *    coordination: no per-stratum count pass, no driver state.
  *
  * The hash family is pluggable like the sketch operators': [[XxHash]] for
  * production, [[Md5Hash]] when an external engine must reproduce the
  * selection row-for-row (the driver oracle does).
  */
object Sampling {

  /** Sampling resolution: rates are quantized to 1/Granularity steps. */
  val Granularity: Long = 1000000L

  /** The row's sampling bucket in [0, Granularity): uniform, deterministic
    * in (seed, key). `pmod` because XxHash is signed.
    */
  def bucket(key: Column, seed: Int, hash: HashFamily = XxHash): Column =
    pmod(hash.seeded(seed, key), lit(Granularity))

  private def thresholdOf(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    math.round(fraction * Granularity)
  }

  /** Bernoulli sample at `fraction`, keyed on `key`. Map-side only — at any
    * scale this is a filter over the scan, never a shuffle.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double, seed: Int = 42,
      hash: HashFamily = XxHash): DataFrame =
    df.where(bucket(key, seed, hash) < lit(thresholdOf(fraction)))

  /** Stratified sample: per-stratum rate from `rates`, `defaultRate` for
    * unlisted strata. The rate lookup is a broadcast-free literal map
    * (`element_at` on a map literal — constant-folded per row, no join).
    * This is also the domain-mixing primitive: weights-by-source IS a
    * stratified sample on the source column.
    */
  def stratifiedHashSample(df: DataFrame, strataCol: String, rates: Map[String, Double],
      defaultRate: Double, key: Column, seed: Int = 42, hash: HashFamily = XxHash): DataFrame = {
    val rateMap = map(rates.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(thresholdOf(v)))
    }: _*)
    val threshold = coalesce(element_at(rateMap, col(strataCol)), lit(thresholdOf(defaultRate)))
    df.where(bucket(key, seed, hash) < threshold)
  }

  /** Deterministic train/test split: adds a `split` column (`"train"` /
    * `"test"`) instead of filtering, so one pass feeds both sinks. Keyed —
    * all rows of one entity land on the same side (no leakage across the
    * split for grouped data).
    */
  def trainTestSplit(df: DataFrame, key: Column, testFraction: Double, seed: Int = 42,
      hash: HashFamily = XxHash): DataFrame =
    df.withColumn(
      "split",
      when(bucket(key, seed, hash) < lit(thresholdOf(testFraction)), "test").otherwise("train"))

  /** Deterministic fixed-SIZE per-stratum sample ("hash reservoir"): keeps
    * exactly min(k, |stratum|) rows per stratum, the ones ranking first in
    * hash order of `rowKey` (ties broken by the key itself). The
    * fixed-count complement of [[stratifiedHashSample]]'s fixed-rate
    * sampling — use it when every stratum must contribute the same number
    * of rows regardless of its size (balanced eval sets, per-domain
    * pilots).
    *
    * Reproducible like the rate samplers (selection is a function of keys
    * only) and nested in k: the top-j (j < k) of a stratum is a prefix of
    * its top-k. Cost: one shuffle on the stratum columns + a per-partition
    * sort — rank state is O(1) per stream; no stratum's rows are ever
    * collected to one row.
    */
  def topKPerKey(df: DataFrame, strataCols: Seq[String], k: Int, rowKey: Column,
      seed: Int = 42, hash: HashFamily = XxHash): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(bucket(rowKey, seed, hash), rowKey)
    df.withColumn("_hash_rank", row_number().over(w))
      .where(col("_hash_rank") <= k)
      .drop("_hash_rank")
  }
}
