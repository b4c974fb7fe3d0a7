package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {

  private def batch1 = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "pack my box with five dozen liquor jugs before the party"),
      (2L, "sphinx of black quartz judge my vow said the librarian"),
      (3L, "the quick brown fox jumps over the lazy dog again and again") // exact dup of 0
    ).toDF("doc_id", "text")
  }

  private def batch2 = {
    import spark.implicits._
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and AGAIN"), // near-dup of 0
      (11L, "sphinx of black quartz judge my vow said the librarian twice"), // near-dup of 2
      (12L, "completely novel content that matches nothing in the corpus")
    ).toDF("doc_id", "text")
  }

  test("streaming ingest dedups within batch and against the corpus") {
    val work = tempDir("graft-sdedup")
    val ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.5)

    batch1.write.parquet(s"$work/in")
    val q1 = ingest.start(batch1.schema, s"$work/in", s"$work/ckpt")
    q1.awaitTermination(60000)

    val corpus1 = spark.read.parquet(s"$work/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(corpus1 == Set(0L, 1L, 2L), s"exact dup 3 must not enter the corpus: $corpus1")

    batch2.write.mode("append").parquet(s"$work/in")
    val q2 = ingest.start(batch2.schema, s"$work/in", s"$work/ckpt")
    q2.awaitTermination(60000)

    val corpus2 = spark.read.parquet(s"$work/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(corpus2 == Set(0L, 1L, 2L, 12L), s"near-dups 10/11 must be diverted: $corpus2")
    val dups = spark.read.parquet(s"$work/dups")
      .select("new_id", "old_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups == Set((10L, 0L), (11L, 2L)), s"got $dups")

    // the sketch tables are maintained incrementally: exactly one slim
    // (id, band, bucket) row per corpus document per band, and one
    // shingle-set row per corpus document — dups never enter them
    val bandIds = spark.read.parquet(s"$work/sketch/bands").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(bandIds == corpus2, s"band table must track the corpus exactly: $bandIds")
    val bandCount = spark.read.parquet(s"$work/sketch/bands").count()
    assert(bandCount == corpus2.size * 4L, s"expected 4 band rows per corpus doc, got $bandCount")
    val shIds = spark.read.parquet(s"$work/sketch/sh").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(shIds == corpus2, s"shingle-set table must track the corpus exactly: $shIds")
    // batch 2 appended only its own novel doc's sketch rows (O(batch) work)
    val batch2Bands = spark.read.parquet(s"$work/sketch/bands")
      .where(col("ingest_batch") === 1).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(batch2Bands == Set(12L), s"batch 2 must append only novel sketch rows: $batch2Bands")
  }

  test("replaying a batch id is idempotent (dynamic partition overwrite)") {
    val work = tempDir("graft-sdedup-replay")
    val ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.5)
    // a zero-row partitioned write leaves no readable footer — same as absent
    def readDups(): Set[(Long, Long)] =
      try spark.read.parquet(s"$work/dups")
        .select("new_id", "old_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }
    ingest.ingestBatch(batch1, batchId = 0)
    val once = spark.read.parquet(s"$work/corpus").count()
    val dupsOnce = readDups()
    assert(dupsOnce.isEmpty, s"batch 1 vs an empty corpus has no dups: $dupsOnce")
    ingest.ingestBatch(batch1, batchId = 0) // checkpoint-recovery replay
    val twice = spark.read.parquet(s"$work/corpus").count()
    assert(once == twice, s"replay must not double-append: $once vs $twice")
    // the replay must not match documents against their own prior-attempt
    // rows: no self-pairs, and the dups output is byte-for-byte stable
    val dupsTwice = readDups()
    assert(dupsTwice == dupsOnce, s"replay changed the dups output: $dupsTwice vs $dupsOnce")
    assert(!dupsTwice.exists(p => p._1 == p._2), s"replay produced self-pairs: $dupsTwice")
    // a NEW batch id appends alongside, untouched
    ingest.ingestBatch(batch2, batchId = 1)
    assert(spark.read.parquet(s"$work/corpus").where(col("ingest_batch") === 0).count() == once)
    // and the new batch's near-dups ARE still detected against batch 0
    val dupsAfter = readDups()
    assert(dupsAfter == Set((10L, 0L), (11L, 2L)), s"got $dupsAfter")
  }

  test("incremental vocabulary accumulates exactly over novel docs and survives replay") {
    import spark.implicits._
    val work = tempDir("graft-sdedup-vocab")
    val ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.5, vocabPath = Some(s"$work/vocab"))
    ingest.ingestBatch(batch1, batchId = 0)
    ingest.ingestBatch(batch2, batchId = 1)
    val vocab = ingest.vocabulary()
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // novel docs = {0,1,2} ∪ {12}: dup 3 and near-dups 10/11 contribute nothing
    // "the": docs 0 (×2), 1 (×1), 2 (×1), 12 (×1) → tf 5, df 4
    assert(vocab("the") === ((5L, 4L)), s"got ${vocab.get("the")}")
    assert(vocab("novel") === ((1L, 1L)))
    assert(!vocab.contains("twice"), "near-dup 11's unique token must not enter")
    // batch replay leaves the accumulated counts unchanged
    ingest.ingestBatch(batch2, batchId = 1)
    val again = ingest.vocabulary()
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again === vocab)
    // exactness against the batch-mode operator over the final corpus
    val fromCorpus = graft.ops.TextAnalysis
      .vocabulary(spark.read.parquet(s"$work/corpus"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fromCorpus === vocab, "incremental sums must equal the batch recount")
    intercept[IllegalStateException] {
      new StreamingDedupIngest(spark, s"$work/c2", s"$work/d2", s"$work/s2").vocabulary()
    }
  }

  test("incremental cluster labels: delta writes, latest-wins relabeling, replay idempotency") {
    import spark.implicits._
    val work = tempDir("graft-sdedup-labels")
    val ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.5, labelsPath = Some(s"$work/labels"))
    def labelMap() = ingest.labels().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch 1: exact dup 3 → cluster {0, 3}
    ingest.ingestBatch(batch1, batchId = 0)
    assert(labelMap() == Map(0L -> 0L, 3L -> 0L), s"got ${labelMap()}")

    // batch 2: near-dups 10 (of 0) and 11 (of 2) join/extend clusters
    ingest.ingestBatch(batch2, batchId = 1)
    assert(labelMap() == Map(0L -> 0L, 3L -> 0L, 10L -> 0L, 2L -> 2L, 11L -> 2L))
    // the batch-2 partition holds only its DELTA (batch-1 labels not rewritten)
    val b2rows = spark.read.parquet(s"$work/labels").where(col("ingest_batch") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(b2rows == Set(2L, 10L, 11L), s"batch-2 delta must be only new/changed rows: $b2rows")

    // batch 3: a doc with a SMALLER id than cluster 2's min near-dups it —
    // the component minimum drops, and latest-batch-wins relabels 2 and 11
    val batch3 = Seq((-5L, "sphinx of black quartz judge my vow said the librarian !!"))
      .toDF("doc_id", "text")
    ingest.ingestBatch(batch3, batchId = 2)
    val expect3 = Map(0L -> 0L, 3L -> 0L, 10L -> 0L, 2L -> -5L, 11L -> -5L, -5L -> -5L)
    assert(labelMap() == expect3, s"got ${labelMap()}")

    // checkpoint-recovery replay recomputes the same delta from the prior
    // batches' labels (own partition excluded) — output unchanged
    ingest.ingestBatch(batch3, batchId = 2)
    assert(labelMap() == expect3)

    // incremental labeling ≡ full recompute over every pair ever recorded
    val allPairs = spark.read.parquet(s"$work/dups")
      .select(col("old_id").as("id_a"), col("new_id").as("id_b"))
      .union(Seq((0L, 3L)).toDF("id_a", "id_b")) // batch 1's intra-batch exact pair
    val full = graft.ops.Dedup.clusters(spark, allPairs)
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == labelMap(), s"full recompute diverged: $full")

    intercept[IllegalStateException] {
      new StreamingDedupIngest(spark, s"$work/c2", s"$work/d2", s"$work/s2").labels()
    }
  }

  test("compactState folds completed batches into one baseline partition, state-preserving") {
    import spark.implicits._
    val work = tempDir("graft-sdedup-compact")
    val ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.5,
      vocabPath = Some(s"$work/vocab"), labelsPath = Some(s"$work/labels"))
    ingest.ingestBatch(batch1, batchId = 0)
    ingest.ingestBatch(batch2, batchId = 1)
    val batch3 = Seq((-5L, "sphinx of black quartz judge my vow said the librarian !!"))
      .toDF("doc_id", "text")
    ingest.ingestBatch(batch3, batchId = 2)

    def corpusIds() = spark.read.parquet(s"$work/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    def dups() = spark.read.parquet(s"$work/dups").select("new_id", "old_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def labelMap() = ingest.labels().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def vocab() = ingest.vocabulary().collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def bandIds() = spark.read.parquet(s"$work/sketch/bands").select("id")
      .collect().map(_.getLong(0)).toSet
    val (c0, d0, l0, v0, b0) = (corpusIds(), dups(), labelMap(), vocab(), bandIds())

    // folding batches 0-1 must be invisible to every reader
    ingest.compactState(throughBatch = 1)
    assert(corpusIds() == c0 && dups() == d0 && bandIds() == b0)
    assert(labelMap() == l0, s"labels diverged: ${labelMap()} vs $l0")
    assert(vocab() == v0)
    // partitions 0 and 1 are gone; the baseline and the latest batch remain
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def parts(tbl: String) = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$work/$tbl"))
      .map(_.getPath.getName).filter(_.startsWith("ingest_batch=")).toSet
    // batch 2 was pure dups → it wrote no corpus partition at all; its
    // delta still holds the labels partition open
    assert(parts("corpus") == Set("ingest_batch=-1"), parts("corpus"))
    assert(parts("labels") == Set("ingest_batch=-1", "ingest_batch=2"), parts("labels"))

    // the latest batch (the only one checkpoint recovery can replay) still
    // replays idempotently against the folded state
    ingest.ingestBatch(batch3, batchId = 2)
    assert(corpusIds() == c0 && labelMap() == l0 && vocab() == v0)

    // ingest continues on top of the baseline: near-dups still detected
    val batch4 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog AGAIN and again"), // near-dup of 0 (batch 0, folded)
      (21L, "entirely fresh content appearing after the state compaction")
    ).toDF("doc_id", "text")
    ingest.ingestBatch(batch4, batchId = 3)
    assert(corpusIds() == c0 + 21L, s"got ${corpusIds()}")
    assert(dups().contains((20L, 0L)), s"folded sketches must still catch near-dups: ${dups()}")

    // folding the latest batch is refused (it is still replayable)
    intercept[IllegalArgumentException](ingest.compactState(throughBatch = 3))
  }

  test("decontamination gate: contaminated novel docs divert to quarantine, never the corpus") {
    import spark.implicits._
    val work = tempDir("graft-sdedup-decon")
    // eval doc 900; batch doc 1 quotes an 8-token span of it verbatim
    val ev = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val batch = Seq(
      (0L, "pack my box with five dozen liquor jugs before the party"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta plus trailing novel words"),
      (2L, "pack my box with five dozen liquor jugs before the party") // exact dup of 0
    ).toDF("doc_id", "text")
    val ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.5,
      evalSet = Some(ev), quarantinePath = Some(s"$work/quarantine"))

    ingest.ingestBatch(batch, batchId = 0)
    val corpus = spark.read.parquet(s"$work/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(corpus == Set(0L), s"contaminated doc 1 and dup 2 must not enter: $corpus")
    val quarantined = spark.read.parquet(s"$work/quarantine").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(quarantined == Set(1L), s"got $quarantined")
    // sketch tables track the decontaminated corpus only
    val bandIds = spark.read.parquet(s"$work/sketch/bands").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(bandIds == Set(0L), s"sketches must exclude quarantined docs: $bandIds")

    // replay idempotency holds for the quarantine output too
    ingest.ingestBatch(batch, batchId = 0)
    assert(spark.read.parquet(s"$work/quarantine").count() == 1L)
    assert(spark.read.parquet(s"$work/corpus").count() == 1L)
  }

  test("ingestReport: per-batch novelty/dup counts from partition-pruned state reads") {
    val work = tempDir("graft-sdedup-report")
    val ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.5)
    ingest.ingestBatch(batch1, batchId = 0) // 3 novel (0,1,2; 3 = intra-batch exact dup)
    ingest.ingestBatch(batch2, batchId = 1) // 1 novel (12), 2 cross-corpus dups
    val got = ingest.ingestReport().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // intra-batch exact dups never reach the dups table (they are dropped
    // at the representative step) — batch 0 reports 0 dups
    assert(got == Map(0L -> ((3L, 0L)), 1L -> ((1L, 2L))), s"got $got")
  }

  test("incremental corpus stats: merged report ≡ recompute over the accumulated corpus, replay-safe") {
    import spark.implicits._
    val work = tempDir("graft-sdedup-stats")
    val ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.5, statsPath = Some(s"$work/stats"))
    // batches need a lang column for the default stratum
    def withLang(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
    ingest.ingestBatch(withLang(batch1), batchId = 0)
    ingest.ingestBatch(withLang(batch2), batchId = 1)
    def exactOf(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.corpusReport(df)
        .select("stratum", "n_docs", "total_tokens", "avg_quality", "n_low_quality")
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val merged = ingest.corpusStats()
      .select("stratum", "n_docs", "total_tokens", "avg_quality", "n_low_quality")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    // the report over the batch-partial tables equals a full recompute
    // over the accumulated (novel-only) corpus — exact fields exactly
    assert(merged == exactOf(spark.read.parquet(s"$work/corpus")), s"got $merged")
    // replaying the last batch leaves the report unchanged
    ingest.ingestBatch(withLang(batch2), batchId = 1)
    val replayed = ingest.corpusStats()
      .select("stratum", "n_docs", "total_tokens", "avg_quality", "n_low_quality")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(replayed == merged, "replay changed the stats report")
    // folding completed batches into the baseline preserves the report
    ingest.compactState(throughBatch = 0)
    val folded = ingest.corpusStats()
      .select("stratum", "n_docs", "total_tokens", "avg_quality", "n_low_quality")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(folded == merged, "compactState changed the stats report")
  }

  // two orthogonal base vectors + tiny perturbations: cosine(e0, e0') ≈ 1,
  // cosine(e0, e1) = 0 — text deliberately unique per doc so only the
  // SEMANTIC screen can catch these dups
  private def vec(axis: Int, eps: Double): Seq[Double] =
    (0 until 8).map(j => (if (j == axis) 1.0 else 0.0) + (if (j == 7) eps else 0.0))

  private def embBatch(rows: Seq[(Long, String, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "embedding")
  }

  test("semantic screen: embedding near-dups divert, vectors probe incrementally, replay-idempotent") {
    val work = tempDir("graft-sdedup-sem")
    def ingest = new StreamingDedupIngest(spark, s"$work/corpus", s"$work/dups",
      s"$work/sketch", verifyThreshold = 0.99, // text screen effectively off
      labelsPath = Some(s"$work/labels"),
      embeddingCol = Some("embedding"), semanticDupsPath = Some(s"$work/semdups"),
      semanticThreshold = 0.9, semanticBits = 2, semanticDim = 8)
    val b1 = embBatch(Seq(
      (0L, "alpha bravo charlie delta echo foxtrot", vec(0, 0.0)),
      (1L, "golf hotel india juliet kilo lima mike", vec(1, 0.0)),
      (2L, "november oscar papa quebec romeo sierra", vec(0, 0.01)))) // sem-dup of 0
    ingest.ingestBatch(b1, batchId = 0)
    val corpus1 = spark.read.parquet(s"$work/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(corpus1 == Set(0L, 1L), s"intra-batch semantic dup 2 must divert: $corpus1")
    val sem1 = spark.read.parquet(s"$work/semdups").select("old_id", "new_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem1 == Set((0L, 2L)), s"got $sem1")
    // the embedding table tracks the corpus exactly (dups never enter)
    val embIds = spark.read.parquet(s"$work/sketch/emb").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(embIds == Set(0L, 1L), s"got $embIds")

    // batch 2: a near-copy of corpus doc 1 (cross-batch probe) + novel axis
    val b2 = embBatch(Seq(
      (10L, "tango uniform victor whiskey xray yankee", vec(1, 0.02)), // sem-dup of 1
      (11L, "zulu one two three four five six seven", vec(2, 0.0))))
    ingest.ingestBatch(b2, batchId = 1)
    val corpus2 = spark.read.parquet(s"$work/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(corpus2 == Set(0L, 1L, 11L), s"cross-batch semantic dup 10 must divert: $corpus2")
    // batch 2 appended only its own novel vector (O(batch) append)
    val b2Emb = spark.read.parquet(s"$work/sketch/emb")
      .where(col("ingest_batch") === 1).select("id").collect().map(_.getLong(0)).toSet
    assert(b2Emb == Set(11L), s"got $b2Emb")
    // semantic pairs feed the incremental cluster labels
    val labels = ingest.labels().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.get(2L) == labels.get(0L) && labels.get(10L) == labels.get(1L),
      s"semantic dups must share their source's cluster: $labels")

    // the mergeable gram partials track the corpus vectors: the merged
    // matrix equals a direct gram over the stored embedding table
    val mergedGram = ingest.embeddingGram().collect().map(_.toSeq).toSet
    val directGram = graft.ops.SimilaritySearch.gramMatrix(
        spark.read.parquet(s"$work/sketch/emb").select(col("_v").as("embedding")), dim = 8)
      .collect().map(_.toSeq).toSet
    assert(mergedGram == directGram, "per-batch gram partials must merge to the corpus gram")

    // checkpoint-recovery replay of batch 2: byte-stable outputs, no
    // self-matching against the prior attempt's own partition
    ingest.ingestBatch(b2, batchId = 1)
    val corpusR = spark.read.parquet(s"$work/corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(corpusR == corpus2, s"replay changed the corpus: $corpusR")
    val semR = spark.read.parquet(s"$work/semdups").select("old_id", "new_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(semR == Set((0L, 2L), (1L, 10L)), s"replay changed semantic dups: $semR")
    assert(!semR.exists(p => p._1 == p._2), s"replay produced self-pairs: $semR")
  }
}
