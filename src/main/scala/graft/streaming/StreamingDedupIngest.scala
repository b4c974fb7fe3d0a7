package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.{Dedup, HashFamily, TextAnalysis, XxHash}

/** Streaming dedup-on-ingest: every micro-batch of documents is deduped
  * against itself and against the accumulated corpus; only novel documents
  * enter the corpus, and each detected duplicate is recorded with the
  * document it duplicates.
  *
  * The streaming face of [[graft.ops.Dedup.incrementalFromSketches]] — the
  * shape a training-data pipeline actually runs ("dedup today's crawl
  * against everything ever kept"):
  *
  *  1. '''intra-batch exact dedup''': one representative (min id) per
  *     content fingerprint — a batch-local groupBy;
  *  2. '''cross-corpus near-dup''': the batch is MinHash-sketched ONCE and
  *     probed against incrementally-maintained corpus sketch tables — a
  *     slim band table (id, band, bucket) and a shingle-set table (id, sh),
  *     both appended per batch with the novel documents' rows. Per-batch
  *     sketch work is O(batch); the corpus is never re-sketched, only its
  *     (bloom-pruned, see `incrementalFromSketches`) sketch tables are
  *     scanned;
  *  3. '''idempotent writes''': all four outputs (corpus, dups, bands, sh)
  *     are partitioned by `ingest_batch` and written with dynamic partition
  *     overwrite, so a replayed batch (checkpoint recovery) overwrites its
  *     own partitions instead of double-appending. On replay the batch's
  *     own `ingest_batch=<batchId>` partition from the prior attempt is
  *     EXCLUDED from the corpus-side reads — otherwise every previously
  *     written novel document would match its prior-attempt self at
  *     jaccard 1.0 and the replay would flip all novel docs to dups
  *     (spec-asserted: replay produces no self-pairs).
  *
  * State is the corpus + sketch tables themselves (like
  * [[StreamingIngest]]'s vertex table), so the query is restart-safe with
  * no custom state store.
  *
  * With `labelsPath` supplied, a (doc_id, cluster_id) CLUSTER LABEL table
  * is maintained incrementally alongside the sketches: each batch runs
  * [[graft.ops.Dedup.incrementalClusters]] over (prior labels ∪ this
  * batch's dup pairs — both the cross-corpus near-dups and the intra-batch
  * exact dups) and writes only the DELTA (new or changed labels) to its own
  * `ingest_batch` partition. Per-batch component work is O(label table +
  * batch pairs), never O(all historical pairs) — historical pairs are not
  * even stored; [[labels]] resolves the current labeling as
  * latest-batch-wins per doc. A replayed batch recomputes its delta from
  * the prior batches' labels (its own partition excluded), so the output
  * is replay-idempotent like every other sink here.
  *
  * With `statsPath` supplied, one mergeable partial-stats row per stratum
  * per batch ([[graft.ops.TextAnalysis.corpusPartialStats]]) is maintained
  * over the NOVEL documents; [[corpusStats]] folds them into the data-card
  * report reading |strata|×|batches| rows — the dashboard query never
  * rescans corpus text.
  *
  * With `embeddingCol` supplied, a SEMANTIC near-dup screen runs alongside
  * the MinHash one: the batch's vectors are hyperplane-LSH-bucketed once
  * and probed against an incrementally-maintained `(id, bucket, vec)`
  * table (the same O(batch) probe-and-append discipline as the band /
  * shingle tables — the corpus is never re-bucketed), within-bucket exact
  * cosine at `semanticThreshold` verifying. Semantic dups divert from the
  * corpus like minhash dups, land in their own batch-partitioned
  * `semanticDupsPath` record, and feed the incremental cluster labels as
  * pair evidence; replay follows the same own-partition-excluded rule, so
  * the screen is replay-idempotent like everything else here.
  *
  * With `evalSet` supplied, each batch's novel documents are additionally
  * screened for eval-set contamination ([[graft.ops.Decontaminate]],
  * n-gram overlap at `decontaminateN`/`decontaminateMinShared`) BEFORE
  * entering the corpus: contaminated documents are diverted to
  * `quarantinePath` (batch-partitioned, replay-idempotent like every
  * other output) instead of the corpus, so the accumulated corpus is
  * decontaminated BY CONSTRUCTION rather than by a later sweep. The eval
  * corpus is benchmark-sized and static; its postings rebuild per batch
  * is one small job against an unchanging frame.
  */
class StreamingDedupIngest(
    spark: SparkSession,
    corpusPath: String,
    dupsPath: String,
    sketchPath: String,
    textCol: String = "text",
    idCol: String = "doc_id",
    numHashes: Int = 16,
    bands: Int = 4,
    shingleWidth: Int = 3,
    verifyThreshold: Double = 0.7,
    hash: HashFamily = XxHash,
    evalSet: Option[DataFrame] = None,
    quarantinePath: Option[String] = None,
    decontaminateN: Int = 8,
    decontaminateMinShared: Long = 1L,
    vocabPath: Option[String] = None,
    labelsPath: Option[String] = None,
    statsPath: Option[String] = None,
    statsStrataCol: String = "lang",
    embeddingCol: Option[String] = None,
    semanticDupsPath: Option[String] = None,
    semanticThreshold: Double = 0.9,
    semanticBits: Int = 4,
    semanticDim: Int = 64
) {

  require(embeddingCol.isEmpty || semanticDupsPath.isDefined,
    "embeddingCol requires a semanticDupsPath for the semantic dup records")

  private val bandsPath    = s"$sketchPath/bands"
  private val shPath       = s"$sketchPath/sh"
  private val embPath      = s"$sketchPath/emb"
  private val embStatsPath = s"$sketchPath/embstats"

  /** A corpus-side sketch table, with the current batch's own partition
    * excluded (replay safety — see class doc), or an empty same-schema
    * frame before the first batch lands (the reference's empty-with-id
    * fallback pattern, IdManager.scala).
    */
  private def readSketch(path: String, excludeBatch: Long, like: DataFrame): DataFrame =
    try spark.read.parquet(path)
      .where(col("ingest_batch") =!= excludeBatch)
      .drop("ingest_batch")
    catch { case _: org.apache.spark.sql.AnalysisException => like.limit(0) }

  /** The latest (idCol, cluster_id) row per doc across the label deltas —
    * a doc relabeled by a later batch (cluster merge) resolves to the later
    * row. `excludeBatch` drops the current batch's own prior-attempt
    * partition (replay safety, same rule as [[readSketch]]).
    */
  private def readLatestLabels(path: String, excludeBatch: Long): DataFrame =
    try {
      val raw = spark.read.parquet(path).where(col("ingest_batch") =!= excludeBatch)
      val w = Window.partitionBy(col(idCol)).orderBy(col("ingest_batch").desc)
      raw.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col(idCol), col("cluster_id"))
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.range(0).select(col("id").as(idCol), col("id").as("cluster_id"))
    }

  /** Current cluster labeling (idCol, cluster_id) over every doc that has
    * ever participated in a dup pair; docs absent from the table are
    * implicit singletons. Latest-batch-wins per doc, so a cluster merge in
    * batch n overrides labels written by batches < n.
    */
  def labels(): DataFrame = {
    val lp = labelsPath.getOrElse(
      throw new IllegalStateException("ingest was built without a labelsPath"))
    readLatestLabels(lp, excludeBatch = Long.MinValue) // excludes nothing
  }

  /** Folds every state partition with `ingest_batch <= throughBatch` into
    * one baseline partition `ingest_batch = -1` across all of the ingest's
    * tables — the small-files / many-partitions maintenance for
    * long-running ingests (thousands of batches = thousands of partition
    * dirs per table otherwise). Row tables (corpus, dups, bands, sh,
    * quarantine) fold as plain unions; the vocabulary folds as summed
    * counts (exact — addition is associative); labels fold RESOLVED
    * (latest-batch-wins as of `throughBatch`). The baseline id −1 sorts
    * below every real batch, so latest-wins resolution and the
    * `=!= batchId` replay exclusion both keep working unchanged.
    *
    * REPLAY CONTRACT: checkpoint recovery can only replay the latest
    * batch, so `throughBatch` MUST be strictly below it — a replayed
    * batch folded into the baseline would match its own prior-attempt
    * rows (the self-match the per-batch partitions exist to prevent).
    * Enforced against max(ingest_batch) over the corpus table; call
    * between micro-batches (single writer, like every maintenance op).
    * Each table rewrite rides [[graft.io.AtomicSwap]], so a crash leaves
    * that table either fully old or fully new — and since every table is
    * internally consistent under the replay rule regardless of which
    * batches are folded, a crash between tables is also safe.
    */
  def compactState(throughBatch: Long): Unit = {
    require(throughBatch >= 0, s"throughBatch must be >= 0, got $throughBatch")
    // latest batch = the max over EVERY state table: a batch of pure dups
    // writes no corpus partition (zero-row partitioned writes leave
    // nothing), but its dups/labels partitions still mark it replayable
    val allPaths = Seq(corpusPath, dupsPath, bandsPath, shPath) ++
      embeddingCol.map(_ => embPath) ++ embeddingCol.map(_ => embStatsPath) ++
      semanticDupsPath ++ quarantinePath ++ vocabPath ++ statsPath ++ labelsPath
    val maxes = allPaths.flatMap { p =>
      try Option(spark.read.parquet(p).agg(max(col("ingest_batch").cast("long"))).head())
        .filterNot(_.isNullAt(0)).map(_.getLong(0))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    if (maxes.isEmpty) return // nothing ingested
    val maxBatch = maxes.max
    require(throughBatch < maxBatch,
      s"throughBatch=$throughBatch must be strictly below the latest batch $maxBatch — " +
        "the latest batch can still be replayed by checkpoint recovery and must keep " +
        "its own partition")

    def snapshotTable(path: String)(resolve: DataFrame => DataFrame): Unit = {
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) return
      graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
        graft.io.AtomicSwap.heal(fs, dir)
        val all  = spark.read.parquet(path)
        val base = resolve(all.where(col("ingest_batch") <= throughBatch))
          .withColumn("ingest_batch", lit(-1L))
        val rest = all.where(col("ingest_batch") > throughBatch)
          .select(base.columns.map(col): _*)
        base.unionByName(rest)
          .write.partitionBy("ingest_batch")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(graft.io.AtomicSwap.scratch(dir).toString)
        graft.io.AtomicSwap.swapIn(fs, dir)
      }
    }
    val plainUnion: DataFrame => DataFrame = _.drop("ingest_batch")
    snapshotTable(corpusPath)(plainUnion)
    snapshotTable(dupsPath)(plainUnion)
    snapshotTable(bandsPath)(plainUnion)
    snapshotTable(shPath)(plainUnion)
    embeddingCol.foreach(_ => snapshotTable(embPath)(plainUnion))
    // gram partials fold by summation (decimal — exact); cast back to the
    // per-batch precision so parquet partitions agree on schema
    embeddingCol.foreach(_ => snapshotTable(embStatsPath)(
      _.groupBy("i", "j").agg(
          sum("n").as("n"), sum("sum_prod").as("sum_prod"))
        .select(col("i"), col("j"), col("n"),
          col("sum_prod").cast("decimal(30,10)").as("sum_prod"))))
    semanticDupsPath.foreach(p => snapshotTable(p)(plainUnion))
    quarantinePath.foreach(p => snapshotTable(p)(plainUnion))
    vocabPath.foreach(p => snapshotTable(p)(
      _.groupBy("token").agg(sum("tf").as("tf"), sum("df").as("df"))))
    // stats partials fold mergeably (sums + HLL union); the quality sum is
    // cast back to its per-batch type so the folded file's schema matches
    // later batch partitions (parquet reads don't merge schemas by default)
    statsPath.foreach(p => snapshotTable(p)(
      _.groupBy("stratum").agg(
          sum("n_docs").as("n_docs"),
          sum("total_tokens").as("total_tokens"),
          sum("quality_sum").as("quality_sum"),
          sum("n_low_quality").as("n_low_quality"),
          hll_union_agg(col("fp_sketch"), lit(true)).as("fp_sketch"))
        .select(col("stratum"), col("n_docs"), col("total_tokens"),
          col("quality_sum").cast("decimal(28,6)").as("quality_sum"),
          col("n_low_quality"), col("fp_sketch"))))
    labelsPath.foreach(p => snapshotTable(p) { folded =>
      val w = Window.partitionBy(col(idCol)).orderBy(col("ingest_batch").desc)
      folded.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col(idCol), col("cluster_id"))
    })
  }

  /** Runs one micro-batch through dedup; usable directly in tests and from
    * batch jobs (same contract as [[StreamingIngest.ingestBatch]]).
    */
  def ingestBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return

    // 1. intra-batch exact dedup: min-id representative per fingerprint
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol))
    val reps = batch
      .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_fp", "_rn")

    // 2. sketch the batch once; near-dups vs the maintained corpus sketch
    // tables (slim bands + shingle sets), this batch's prior-attempt
    // partition excluded
    val newSigs   = Dedup.minhashSignatures(reps, textCol, idCol, numHashes, shingleWidth, hash)
    val histBands = readSketch(bandsPath, batchId, Dedup.bandBuckets(newSigs, numHashes, bands, hash))
    val histSh    = readSketch(shPath, batchId, newSigs.select(col("id"), col("sh")))
    val dupPairs  = graft.Caches.track(Dedup.incrementalFromSketches(
      newSigs, histBands, histSh, numHashes, bands, verifyThreshold, hash))

    // 2a. semantic near-dup screen (when the stream carries embeddings):
    // the batch's vectors are LSH-bucketed ONCE and probed against the
    // incrementally-maintained (id, bucket, vec) table — the minhash
    // incremental probe shape applied to embedding space; within-bucket
    // exact native cosine verifies. Directional old→new vs history plus
    // min-id-kept intra-batch pairs, exactly the minhash pair contract.
    val semState: Option[(DataFrame, DataFrame)] = embeddingCol.map { ec =>
      val lsh = graft.ops.SimilaritySearch
        .RandomHyperplaneLsh(semanticBits, semanticDim, hash)
      val newEmb = graft.Caches.track(reps.select(
        col(idCol).as("id"),
        lsh.bucketExpr(col(ec).cast("array<double>")).as("bucket"),
        col(ec).cast("array<double>").as("_v")))
      val histEmb = readSketch(embPath, batchId, newEmb)
      val newSide = newEmb.select(col("bucket"), col("id").as("new_id"), col("_v").as("v_b"))
      val cross = histEmb
        .select(col("bucket"), col("id").as("old_id"), col("_v").as("v_a"))
        .join(newSide, Seq("bucket"))
      val intra = newEmb
        .select(col("bucket"), col("id").as("old_id"), col("_v").as("v_a"))
        .join(newSide, Seq("bucket"))
        .where(col("old_id") < col("new_id"))
      val pairs = cross.union(intra)
        .withColumn("_cos", graft.ops.VectorOps.cosine(col("v_a"), col("v_b")))
        .where(col("_cos") >= semanticThreshold)
        .select(col("old_id"), col("new_id"), round(col("_cos"), 6).as("cosine"))
        .distinct()
      (graft.Caches.track(pairs), newEmb)
    }

    val dupNewIds = semState match {
      case Some((sp, _)) =>
        dupPairs.select(col("new_id")).union(sp.select(col("new_id"))).distinct()
      case None => dupPairs.select(col("new_id")).distinct()
    }
    val dedupNovel = reps.join(dupNewIds, reps(idCol) === col("new_id"), "left_anti")

    // 2b. eval-set decontamination gate: contaminated novel docs divert to
    // quarantine and never enter the corpus or its sketch tables
    val (novel, contaminated) = evalSet match {
      case Some(ev) =>
        val flaggedIds = graft.ops.Decontaminate
          .overlapPairs(dedupNovel, ev, textCol, idCol, decontaminateN, decontaminateMinShared)
          .select(col("doc_id")).distinct()
        (dedupNovel.join(flaggedIds, dedupNovel(idCol) === flaggedIds("doc_id"), "left_anti"),
          dedupNovel.join(flaggedIds, dedupNovel(idCol) === flaggedIds("doc_id"), "left_semi"))
      case None => (dedupNovel, dedupNovel.limit(0))
    }
    // novel documents' sketch rows extend the corpus sketch tables
    // (newSigs is persisted inside incrementalFromSketches — no re-sketch)
    val novelSigs = newSigs.join(novel.select(col(idCol).as("id")), Seq("id"), "left_semi")

    // 3. idempotent batch-partitioned writes (dynamic overwrite: a replayed
    // batch rewrites only partition ingest_batch=<batchId>)
    def writeBatchPartition(df: DataFrame, path: String): Unit =
      df.withColumn("ingest_batch", lit(batchId))
        .write
        .partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)

    writeBatchPartition(novel, corpusPath)
    writeBatchPartition(dupPairs, dupsPath)
    writeBatchPartition(Dedup.bandBuckets(novelSigs, numHashes, bands, hash), bandsPath)
    writeBatchPartition(novelSigs.select(col("id"), col("sh")), shPath)
    // novel documents' bucketed vectors extend the embedding table (the
    // same O(batch) append discipline as the band/shingle tables); the
    // semantic dup pairs get their own batch-partitioned record
    semState.foreach { case (sp, newEmb) =>
      writeBatchPartition(sp, semanticDupsPath.get)
      val novelEmb = newEmb.join(novel.select(col(idCol).as("id")), Seq("id"), "left_semi")
      writeBatchPartition(novelEmb, embPath)
      // mergeable second moments of the novel vectors: the PCA /
      // correlation refresh reads d(d+1)/2 rows per batch, never vectors
      writeBatchPartition(
        graft.ops.SimilaritySearch.gramPartials(novelEmb, semanticDim, vecCol = "_v"),
        embStatsPath)
    }
    quarantinePath.foreach(p => writeBatchPartition(contaminated, p))
    // incremental cluster labels: prior labels (pre-collapsed history) +
    // this batch's pair evidence (cross-corpus near-dups and intra-batch
    // exact dups) → only the DELTA rows land in this batch's partition
    labelsPath.foreach { lp =>
      val wfp = Window.partitionBy(col("_fp"))
      val exactPairs = batch
        .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
        .withColumn("_rep", min(col(idCol)).over(wfp))
        .where(col(idCol) =!= col("_rep"))
        .select(col("_rep").as("id_a"), col(idCol).as("id_b"))
      val pairFrame = dupPairs.select(col("old_id").as("id_a"), col("new_id").as("id_b"))
        .union(exactPairs)
        .union(semState.map { case (sp, _) =>
          sp.select(col("old_id").as("id_a"), col("new_id").as("id_b"))
        }.getOrElse(exactPairs.limit(0)))
      val prior = readLatestLabels(lp, excludeBatch = batchId)
      val updated = graft.ops.Dedup
        .incrementalClusters(spark, prior, pairFrame, idCol = idCol)
      val delta = updated
        .join(prior.select(col(idCol), col("cluster_id").as("_prev")), Seq(idCol), "left")
        .where(col("_prev").isNull || col("_prev") =!= col("cluster_id"))
        .select(col(idCol), col("cluster_id"))
      writeBatchPartition(delta, lp)
    }
    // incremental vocabulary: the batch's NOVEL (deduped, decontaminated)
    // documents' token counts — per-batch work is O(batch tokens)
    vocabPath.foreach(p =>
      writeBatchPartition(TextAnalysis.vocabulary(novel, textCol, idCol), p))
    // incremental corpus statistics: one mergeable partial-stats row per
    // stratum per batch (counts / token sums / decimal quality sums / HLL
    // fingerprint sketch) — the data-card dashboard then merges
    // |strata|×|batches| rows ([[corpusStats]]) instead of rescanning text
    statsPath.foreach(p =>
      writeBatchPartition(
        TextAnalysis.corpusPartialStats(novel, textCol, statsStrataCol), p))
    graft.Caches.clear() // drop the operator's tracked sketch persists
  }

  /** The corpus data-card report assembled from the per-batch partial
    * stats — reads |strata|×|batches| partial rows, never corpus text.
    * The exact columns (docs, tokens, quality) are exactly the report a
    * full rescan would produce (a novel doc contributes in exactly one
    * batch; decimal sums merge exactly); the distinct count is the HLL
    * union's estimate. Replay-idempotent like every state table here.
    */
  def corpusStats(): DataFrame = {
    val p = statsPath.getOrElse(
      throw new IllegalStateException("ingest was built without a statsPath"))
    TextAnalysis.corpusReportFromPartials(spark.read.parquet(p).drop("ingest_batch"))
  }

  /** The corpus embedding Gram matrix merged from the per-batch partials
    * ([[graft.ops.SimilaritySearch.gramFromPartials]]) — feed its
    * collected rows to PCA / correlation analysis without ever rescanning
    * stored vectors. Requires `embeddingCol`.
    */
  def embeddingGram(scale: Int = 6): DataFrame = {
    require(embeddingCol.isDefined, "ingest was built without an embeddingCol")
    graft.ops.SimilaritySearch.gramFromPartials(
      spark.read.parquet(embStatsPath).drop("ingest_batch"), scale)
  }

  /** Per-batch ingest observability: one row per `ingest_batch` with
    * novel / dup (/semantic-dup /quarantined, where configured) counts —
    * the monitoring face of the pipeline (a novelty-rate collapse or a
    * quarantine spike is the first sign of a bad crawl or a poisoned
    * source). Aggregates only partition-pruned COUNTS of the state
    * tables, never text; batches whose every write was empty (all-dup
    * batches leave no corpus partition) appear with the counts they do
    * have, zeros elsewhere.
    */
  def ingestReport(): DataFrame = {
    def counts(path: String, name: String): DataFrame =
      try spark.read.parquet(path)
        .groupBy(col("ingest_batch").cast("long").as("ingest_batch"))
        .agg(count(lit(1)).as(name))
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.range(0).select(col("id").as("ingest_batch"), col("id").as(name))
      }
    val frames = Seq(
      counts(corpusPath, "n_novel"),
      counts(dupsPath, "n_dups")) ++
      semanticDupsPath.map(counts(_, "n_semantic_dups")) ++
      quarantinePath.map(counts(_, "n_quarantined"))
    frames.reduce((a, b) => a.join(b, Seq("ingest_batch"), "full_outer"))
      .na.fill(0L)
      .orderBy("ingest_batch")
  }

  /** Accumulated corpus vocabulary (token, tf, df) across every ingested
    * batch. Summing per-batch counts is EXACT, not approximate: a novel
    * document enters the corpus in exactly one batch, so its token and
    * document contributions are counted exactly once — and a replayed
    * batch overwrites its own partition rather than double-counting.
    */
  def vocabulary(): DataFrame = {
    val p = vocabPath.getOrElse(
      throw new IllegalStateException("ingest was built without a vocabPath"))
    spark.read.parquet(p)
      .groupBy("token")
      .agg(sum("tf").as("tf"), sum("df").as("df"))
  }

  /** Starts the streaming ingest over a file-source directory. */
  def start(schema: StructType, inputPath: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(inputPath)
      .writeStream
      .foreachBatch(ingestBatch _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
