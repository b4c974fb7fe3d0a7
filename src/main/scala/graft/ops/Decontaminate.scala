package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination — the pre-training hygiene step: flag training
  * documents that share at least `minShared` word n-grams with any document
  * of a benchmark/eval corpus, so they can be dropped (or quarantined)
  * before the eval is trusted. Published LM pipelines do exactly this
  * n-gram-overlap screen (the GPT-3/PaLM reports describe 8–13-gram
  * collision checks between training shards and eval sets).
  *
  * Scale shape (the asymmetric probe, same discipline as
  * [[Dedup.incrementalFromSketches]]): the eval corpus is small (thousands
  * of documents) and the training corpus is the 100-TB side, so
  *  1. eval n-gram postings are built once and tracked-persisted — they are
  *     the probe target, never the shuffled bulk;
  *  2. training postings are pruned MAP-SIDE by a bloom filter over the
  *     eval grams ([[org.apache.spark.sql.graft.BloomFilterOps]], no false
  *     negatives) before their shuffle — only training grams that might
  *     occur in the eval corpus ever leave the scan stage;
  *  3. the surviving postings equi-join on the gram and count matches per
  *     (train doc, eval doc) pair — skew is bounded by the eval side's
  *     per-gram document frequency, which is eval-corpus-sized.
  * No all-pairs comparison anywhere; hot grams are never windowed.
  */
object Decontaminate {

  /** Distinct word n-gram postings (id, gram) per document — the codegen
    * explode(sequence) + slice/array_join shape shared with
    * [[Dedup.ngramJaccardPairs]] (HOF shingles are interpreted; this stays
    * inside whole-stage codegen). Documents shorter than `n` tokens
    * contribute their full token sequence as a single (short) gram.
    */
  def gramPostings(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 8
  ): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    df.select(col(idCol).as("id"), toks.as("_toks"))
      .select(
        col("id"),
        col("_toks"),
        explode(sequence(lit(0), greatest(size(col("_toks")) - n, lit(0)))).as("_i"))
      .select(col("id"), array_join(slice(col("_toks"), col("_i") + 1, lit(n)), " ").as("gram"))
      .distinct()
  }

  /** Contamination evidence pairs: (doc_id, eval_id, shared) — training
    * document × eval document sharing `shared >= minShared` distinct
    * n-grams. This is the audit-trail form: which eval item leaked, with
    * how much overlap.
    */
  /** Shared probe core: training postings (doc_id, key) vs eval postings
    * (eval_id, key). Eval postings are tracked-persisted (they feed the
    * bloom build AND the join); training postings are bloom-pruned
    * MAP-SIDE before their shuffle (no false negatives).
    */
  private def probeCount(
      trainPost: DataFrame,
      evalPost: DataFrame,
      keyCol: String,
      minShared: Long,
      bloomItems: Long
  ): DataFrame = {
    import org.apache.spark.sql.graft.BloomFilterOps
    val evalKeys = graft.Caches.track(evalPost)
    val pruned = BloomFilterOps.build(evalKeys, Seq(col(keyCol)), expectedItems = bloomItems) match {
      case Some(bloom) => trainPost.where(BloomFilterOps.mightContain(bloom, Seq(col(keyCol))))
      case None        => trainPost.limit(0) // empty eval set: nothing can leak
    }
    pruned
      .join(evalKeys, Seq(keyCol))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Folds evidence pairs into the per-training-document verdict over the
    * full `train` universe (see [[overlap]] for the column contract).
    */
  private def toVerdict(train: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val agg = pairs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("_n_matches"), max(col("shared")).as("_max_shared"))
    train.select(col(idCol).as("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("_n_matches"), lit(0L)).as("n_eval_matches"),
        coalesce(col("_max_shared"), lit(0L)).as("max_shared"),
        col("_n_matches").isNotNull.as("contaminated"))
  }

  def overlapPairs(
      train: DataFrame,
      evalSet: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 8,
      minShared: Long = 1L,
      bloomItems: Long = 1000000L
  ): DataFrame =
    probeCount(
      gramPostings(train, textCol, idCol, n).select(col("id").as("doc_id"), col("gram")),
      gramPostings(evalSet, textCol, idCol, n).select(col("id").as("eval_id"), col("gram")),
      "gram", minShared, bloomItems)

  /** Per-training-document verdict over the full training universe:
    * (doc_id, n_eval_matches, max_shared, contaminated). `contaminated`
    * is true iff some eval document shares >= `minShared` n-grams;
    * untouched documents report (0, 0, false), so `where(!contaminated)`
    * is the cleaned corpus.
    */
  def overlap(
      train: DataFrame,
      evalSet: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 8,
      minShared: Long = 1L,
      bloomItems: Long = 1000000L
  ): DataFrame =
    toVerdict(train, idCol,
      overlapPairs(train, evalSet, textCol, idCol, n, minShared, bloomItems))

  /** [[overlap]] with the TRAINING side served from a persisted
    * MinHash-LSH index ([[graft.ops.Dedup.LshIndex]]): the stored `sh`
    * column is exactly the corpus's distinct `shingleWidth`-token gram
    * set (the same slice/join construction as [[gramPostings]], short
    * docs included), so every eval sweep probes the ON-DISK postings and
    * the training corpus is never re-tokenized — the decontamination
    * twin of the index-served incremental-clusters consumer. The
    * training universe for the verdict is the index's id set. Same
    * output contract as [[overlap]]; same bloom-pruned probe shape.
    */
  def overlapFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      index: graft.ops.Dedup.LshIndex,
      path: String,
      evalSet: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minShared: Long = 1L,
      bloomItems: Long = 1000000L
  ): DataFrame = {
    val stored = graft.Caches.track(index.load(spark, path))
    val trainPost = stored.select(col("id").as("doc_id"), explode(col("sh")).as("gram"))
    val evalPost = gramPostings(evalSet, textCol, idCol, index.shingleWidth)
      .select(col("id").as("eval_id"), col("gram"))
    toVerdict(stored.select(col("id")), "id",
      probeCount(trainPost, evalPost, "gram", minShared, bloomItems))
  }

  /** Exact-substring contamination evidence: (doc_id, eval_id, shared) —
    * `shared` counts distinct `window`-token spans appearing VERBATIM in
    * both documents (rolling md5 fingerprints,
    * [[TextAnalysis.rollingFingerprintsExploded]]). Complements
    * [[overlapPairs]]: one shared window is a position-free exact
    * `window`-token quotation, stronger evidence than distributed n-gram
    * overlap, and the shuffled key is a fixed-width digest instead of the
    * gram text — cheaper postings at 100-TB scale.
    */
  def substringOverlapPairs(
      train: DataFrame,
      evalSet: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      window: Int = 8,
      minShared: Long = 1L,
      bloomItems: Long = 1000000L
  ): DataFrame =
    probeCount(
      TextAnalysis.rollingFingerprintsExploded(train, textCol, idCol, window)
        .select(col(idCol).as("doc_id"), col("fp")).distinct(),
      TextAnalysis.rollingFingerprintsExploded(evalSet, textCol, idCol, window)
        .select(col(idCol).as("eval_id"), col("fp")).distinct(),
      "fp", minShared, bloomItems)

  /** [[overlap]]-shaped verdict for [[substringOverlapPairs]]: flags
    * training documents quoting >= `minShared` exact `window`-token spans
    * of any eval document.
    */
  def substringOverlap(
      train: DataFrame,
      evalSet: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      window: Int = 8,
      minShared: Long = 1L,
      bloomItems: Long = 1000000L
  ): DataFrame =
    toVerdict(train, idCol,
      substringOverlapPairs(train, evalSet, textCol, idCol, window, minShared, bloomItems))

  /** Embedding-space decontamination — the third screen after n-gram
    * ([[overlap]]) and exact-substring ([[substringOverlap]]): flag
    * training items whose embedding is COSINE-near any eval item, catching
    * paraphrases and translations that share no surface n-grams. Returns
    * one row per train item: `(idCol, n_matches, max_sim, contaminated)`
    * with `max_sim` the maximum cosine against the whole eval set
    * (rounded to 6) and `contaminated ⇔ any cosine ≥ threshold`.
    *
    * Scale shape — deliberately NOT a bucketed candidate join: LSH/IVF
    * candidate generation trades recall for speed, and decontamination is
    * the one place a missed pair poisons an eval. Eval sets are small by
    * nature (thousands of rows), so the eval side BROADCASTS and the
    * |train| × |eval| cosine loop runs map-side over the scan — a
    * BroadcastNestedLoopJoin on purpose (the similarity predicate is not
    * an equi-join), with the native codegen cosine inside, zero shuffles
    * of train data, and one partial-aggregated per-id reduction. Exactness
    * is the point; for a cheaper approximate pre-screen, compose
    * [[SimilaritySearch]]'s bucketed paths and verify survivors here.
    */
  def semanticOverlap(
      train: DataFrame,
      evalSet: DataFrame,
      threshold: Double,
      vecCol: String = "embedding",
      idCol: String = "vec_id"
  ): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"cosine threshold must be in [-1, 1], got $threshold")
    val t = train.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
    val e = broadcast(evalSet.select(col(vecCol).cast("array<double>").as("_e")))
    t.crossJoin(e)
      .select(col(idCol), VectorOps.cosine(col("_v"), col("_e")).as("_sim"))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("_sim") >= threshold, 1L).otherwise(0L)).as("n_matches"),
        round(max(col("_sim")), 6).as("max_sim"))
      .select(col(idCol), col("n_matches"), col("max_sim"),
        (col("n_matches") > 0).as("contaminated"))
  }
}
