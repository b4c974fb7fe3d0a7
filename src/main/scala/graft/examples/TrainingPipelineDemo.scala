package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._

/** End-to-end training-data pipeline over the documents + embeddings
  * tables: text analysis → quality filter (rule signals + corpus-LM
  * perplexity proxy) → exact dedup → near-dup (minhash) removal →
  * eval-set decontamination → PII scrubbing → temperature-flattened
  * language mix → token accounting → train/test split → sequence
  * packing / context-window chunking, plus ANN retrieval on the
  * embedding side.
  * Runnable: `sbt "runMain graft.examples.TrainingPipelineDemo [sfDir]"`.
  *
  * Every stage is one of the library operators; the demo shows how they
  * chain (each stage's output is the next stage's input — one lineage, no
  * intermediate materialization except the operator-internal persists).
  */
object TrainingPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"corpus: ${docs.count()} documents")

    // 1. analyze + quality filter: rule signals plus the corpus-LM
    // perplexity proxy (drop the least-probable 5% of documents)
    val analyzed = TextAnalysis.analyze(docs)
    val lm = TextAnalysis.bigramLmScore(docs, docs)
    val lmCut = lm.stat.approxQuantile("avg_logprob", Array(0.05), 0.001).head
    val quality = analyzed
      .where(col("quality_score") >= 0.5 && col("token_count") >= 10)
      .join(lm.where(col("avg_logprob") >= lmCut).select("doc_id"), Seq("doc_id"))
    println(s"after quality filter (incl. LM cut at ${math.rint(lmCut * 1e4) / 1e4}): ${quality.count()}")

    // 2. exact dedup by content hash (keep the min doc_id per fingerprint)
    val keep    = Dedup.exactByHash(quality).select(col("keep_id").as("doc_id"))
    val deduped = quality.join(keep, "doc_id")
    println(s"after exact dedup: ${deduped.count()}")

    // 3. near-dup removal, closed loop: minhash-LSH pairs → connected-
    // component clusters → keep the highest-token-count copy per cluster
    val pairs   = Dedup.minhashLsh(deduped, verifyThreshold = 0.5)
    val verdict = Dedup.clustersBy(spark, pairs, deduped, score = col("token_count"))
    val clean   = deduped.join(verdict.where(col("keep")).select("doc_id"), Seq("doc_id"))
    println(s"after near-dup removal: ${clean.count()}")

    // 3b. eval-set decontamination: every-20th doc stands in for the
    // benchmark corpus; drop training docs quoting 8-token spans of it
    val evalSet = docs.where(col("doc_id") % 20 === 0)
    val trainU  = clean.where(col("doc_id") % 20 =!= 0)
    val decon = Decontaminate.substringOverlap(trainU, evalSet, window = 8)
    val cleanDecon = trainU.join(
      decon.where(!col("contaminated")).select("doc_id"), Seq("doc_id"))
    println(s"after decontamination: ${cleanDecon.count()} " +
      s"(flagged ${decon.where(col("contaminated")).count()})")

    // 3c. PII scrubbing: redact emails / IPs / long digit runs before
    // anything is packed (this corpus is synthetic and PII-free — counts
    // confirm it)
    val scrubbed = TextAnalysis.redactPii(cleanDecon)
    val pii = scrubbed.agg(
      sum("n_emails"), sum("n_ips"), sum("n_long_numbers")).head()
    println(s"pii scrub: emails=${pii.getLong(0)} ips=${pii.getLong(1)} nums=${pii.getLong(2)}")

    // 3d. temperature-flattened language mix (p ∝ c^0.5): upweight the
    // small languages relative to their natural share
    val mixed = Sampling.temperatureMix(
      scrubbed, "lang", alpha = 0.5, targetFraction = 0.8, key = col("doc_id"))
    println(s"after temperature mix: ${mixed.count()}")

    // 4. token accounting for the training budget
    val budget = mixed.agg(
      sum("token_count").as("whitespace_tokens"),
      sum("bpeish_tokens").as("bpeish_tokens")).head()
    println(s"token budget: whitespace=${budget.getLong(0)} bpeish=${budget.getLong(1)}")

    // 4b. deterministic train/test split + concat-and-chunk packing of the
    // train side into 2048-token bins
    val split  = Sampling.trainTestSplit(mixed, col("doc_id"), testFraction = 0.1)
    val train  = split.where(col("split") === "train")
    val packed = Packing.packSequences(train, col("token_count"), budget = 2048, streams = 8)
    val bins   = Packing.binStats(packed).count()
    println(s"train/test: ${train.count()}/${split.where(col("split") === "test").count()}"
      + s" packed into $bins bins of 2048 tokens")

    // 4c. alternative to packing whole docs: context-window chunking
    // (128-token windows, 64-token stride) — the long-doc split step
    val chunks = TextAnalysis.chunk(train, maxTokens = 128, stride = 64)
    println(s"chunked: ${chunks.count()} windows from ${train.count()} docs")

    // 5. ANN retrieval on the embedding side (brute force + IVF agree on scores)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q   = graft.SparkEntry.benchQueryVec
    val top = SimilaritySearch.bruteForceTopK(emb, q, k = 5).collect()
    println("top-5 neighbors: " + top.map(r => s"${r.getLong(0)}@${r.getDouble(1)}").mkString(" "))

    println("PIPELINE-DONE")
    spark.stop()
  }
}
