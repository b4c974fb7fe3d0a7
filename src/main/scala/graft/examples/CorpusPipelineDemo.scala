package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Decontaminate, Sampling, TextAnalysis}

/** End-to-end training-corpus assembly over the synthetic documents table —
  * the composition story behind the individual `SparkEntry` queries: every
  * stage below is one library operator, chained the way a production
  * pipeline chains them, with stage-by-stage observation lines.
  *
  *   normalize → paragraph dedup → near-dup clusters (keep best copy) →
  *   containment screen (snippet suppression) → eval-set decontamination →
  *   quality floor → temperature mix → deterministic shuffle → sequence
  *   packing → data-card report → tokenizer (BPE merges) + keywords
  *
  * Run: `sbt "runMain graft.examples.CorpusPipelineDemo"` — prints one
  * `[pipeline]` line per stage and ends with `PIPELINE-DONE`.
  */
object CorpusPipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    def obs(stage: String, n: Long): Unit = println(f"[pipeline] $stage%-28s $n%7d docs")

    val rawFull = spark.read.parquet(s"$dir/documents.parquet")
    val raw = rawFull.select(col("doc_id"), col("lang"), col("text"))
    obs("raw", raw.count())

    // 0. admission gate: the batch must pass the declarative quality suite
    // before anything downstream runs (fail-closed on an empty/broken drop)
    val gate = graft.ops.Validate.report(rawFull, Seq(
      graft.ops.Validate.NotNull("text"),
      graft.ops.Validate.NotNull("lang"),
      graft.ops.Validate.Unique("doc_id"),
      graft.ops.Validate.RowCountBetween(1L, 100000000L)))
    require(graft.ops.Validate.allPass(gate), "admission gate failed — aborting ingest")
    println("[pipeline] admission gate            PASS (4 checks)")

    // 1. canonical normalization (control-strip, case-fold, ws-collapse)
    val normed = raw.withColumn("text", TextAnalysis.normalizeText(col("text")))

    // 2. paragraph-level boilerplate removal (first occurrence wins)
    val paraDeduped = TextAnalysis.dedupParagraphs(normed)
      .join(normed.select("doc_id", "lang"), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("clean_text").as("text"))
      .where(length(col("text")) > 0)
    obs("paragraph-dedup", paraDeduped.count())

    // 3. near-dup clusters; keep the highest-quality copy per cluster
    val pairs = Dedup.minhashLsh(paraDeduped, numHashes = 16, bands = 4,
      verifyThreshold = 0.5)
    val verdict = Dedup.clustersBy(spark, pairs, paraDeduped,
      score = TextAnalysis.qualityScore(col("text")))
    val deduped = paraDeduped.join(
      verdict.where(col("keep")).select("doc_id"), Seq("doc_id"))
    obs("near-dup-clusters", deduped.count())

    // 3b. asymmetric containment screen: drop documents ≥ 90% contained in
    // ANOTHER surviving doc (snippet suppression — the directional relation
    // the symmetric near-dup step cannot see; mutual ≥0.9 containment is
    // already collapsed by that step, so this only removes true subsumees)
    val snippetIds = Dedup.containmentPairs(deduped, threshold = 0.9)
      .select(col("src_id").as("doc_id")).distinct()
    val unconTained = deduped.join(snippetIds, Seq("doc_id"), "left_anti")
    obs("containment-screen", unconTained.count())

    // 4. eval-set decontamination (synthetic eval split: every 20th doc)
    val evalSet = unconTained.where(col("doc_id") % 20 === 0)
    val train   = unconTained.where(col("doc_id") % 20 =!= 0)
    val clean = train.join(
      Decontaminate.overlap(train, evalSet, n = 8, minShared = 5)
        .where(!col("contaminated")).select("doc_id"),
      Seq("doc_id"))
    obs("decontaminated", clean.count())

    // 5. quality floor
    val quality = clean.where(TextAnalysis.qualityScore(col("text")) >= 0.3)
    obs("quality-floor", quality.count())

    // 6. temperature-flattened language mix (α = 0.5, keep ~80%)
    val mixed = Sampling.temperatureMix(quality, "lang",
      alpha = 0.5, targetFraction = 0.8, key = col("doc_id"))
    obs("temperature-mix", mixed.count())

    // 7. deterministic training-order shuffle + context packing
    val shuffled = Sampling.deterministicShuffle(mixed, key = col("doc_id"))
    val packed = graft.ops.Packing.packSequences(
      shuffled, tokens = TextAnalysis.bpeishTokenCount(col("text")),
      budget = 2048, streams = 8)
    val bins = graft.ops.Packing.binStats(packed).count()
    println(f"[pipeline] packed                  ${packed.count()}%7d docs into $bins%5d bins")

    // 8. data card of the released corpus
    println("[pipeline] data card:")
    TextAnalysis.corpusReport(mixed).orderBy("stratum").collect().foreach { r =>
      println(f"[pipeline]   ${r.getString(0)}%-4s docs=${r.getLong(1)}%5d " +
        f"tokens=${r.getLong(2)}%7d avgQ=${r.getDouble(3)}%.4f dupRate=${r.getDouble(6)}%.4f")
    }

    // 8b. release screens: privacy (quasi-identifier combinations below k
    // must be suppressed or generalized before shipping) and drift (did
    // the pipeline's filtering skew the language mix vs the raw corpus?)
    val risky = graft.ops.Privacy.kAnonymity(rawFull, Seq("lang", "source"), k = 3)
      .where(!col("k_anonymous")).count()
    println(f"[pipeline] privacy screen           $risky%7d sub-k (lang,source) combos")
    val drift = graft.ops.Stats.chiSquareDrift(
        raw, mixed.select("doc_id", "lang"), "lang")
      .agg(sum(col("contrib"))).head.getDouble(0)
    val ediv = graft.ops.Stats.diversityIndex(mixed, "lang").head
    println(f"[pipeline] release drift/diversity  chi2=$drift%.3f " +
      f"effective-langs=${ediv.getDouble(3)}%.2f")

    // 9. tokenizer + corpus signature of the release: BPE merges learned
    // on the released corpus, and its highest-TF-IDF terms
    val bpe = TextAnalysis.bpeMerges(mixed, numMerges = 8)
      .orderBy("step").collect().map(_.getString(3))
    println("[pipeline] bpe merges: " + bpe.mkString(" "))
    val kw = TextAnalysis.tfidfTopTerms(mixed, topK = 1)
      .orderBy(col("tfidf").desc, col("token")).limit(5)
      .collect().map(r => s"${r.getString(1)}(${r.getDouble(3)})")
    println("[pipeline] top doc keywords: " + kw.mkString(" "))

    // 10. evaluation folds + contrastive pairs over the release: 5-fold
    // assignment (leakage already handled upstream), near-dup pairs as
    // positives, hash-drawn negatives excluding them
    val folds = Sampling.kFold(mixed.select("doc_id"), col("doc_id"), k = 5)
      .groupBy("fold").count().orderBy("fold")
      .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}")
    println("[pipeline] fold sizes: " + folds.mkString(" "))
    val negs = Sampling.negativePairs(mixed, "doc_id", m = 1,
      positives = Some(pairs.select("id_a", "id_b")))
    println(f"[pipeline] contrastive negatives    ${negs.count()}%7d pairs")

    // 10b. quality-model evaluation loop: score the release with the
    // hashed-ngram classifier, check ranking (AUC), calibration and an
    // operating point against the lang='en' proxy label — then cut the
    // final corpus to a token budget, best quality first
    val scored = TextAnalysis.hashedNgramScore(mixed)
      .join(mixed.select(col("doc_id"), (col("lang") === "en").as("y")), Seq("doc_id"))
    val aucRow = graft.ops.Stats.auc(scored, col("score"), col("y")).head()
    println(f"[pipeline] quality model             auc=${aucRow.getDouble(2)}%.4f " +
      s"(pos=${aucRow.getLong(0)} neg=${aucRow.getLong(1)})")
    val cal = graft.ops.Stats.calibrationCurve(scored, col("score"), col("y"),
        bins = 4, tieCol = col("doc_id"))
      .orderBy("bin").collect()
      .map(r => f"${r.getDouble(2)}%.2f→${r.getDouble(3)}%.2f")
    println("[pipeline] calibration (score→rate): " + cal.mkString(" "))
    val budgeted = Sampling.tokenBudget(
      scored.join(mixed.select("doc_id", "text"), Seq("doc_id"))
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text"))),
      tokens = col("n_tok"), budget = 20000L,
      sortCols = Seq(col("score").desc, col("doc_id")))
    println(f"[pipeline] token-budget cut          ${budgeted.count()}%7d docs " +
      "(best-quality-first, 20k tokens)")

    // 11. serve the release's embeddings through the IVFADC index (the
    // vectors ship separately in the embeddings table)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val ivfpq = graft.ops.ProductQuant.IvfPq(k = 8, nprobe = 4, m = 8, ksub = 16)
    val (enc, centroids, model) = ivfpq.index(emb, dim = 64)
    val q = graft.SparkEntry.benchQueryVec
    val serve = ivfpq.query(enc, centroids, model, q, topK = 3,
      rerankWith = Some("embedding")).collect()
      .map(r => s"${r.getLong(0)}@${r.getDouble(1)}")
    println("[pipeline] ann top-3: " + serve.mkString(" "))

    graft.Caches.clear()
    println("PIPELINE-DONE")
    spark.stop()
  }
}
