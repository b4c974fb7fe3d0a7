package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design notes (the point of each variant):
  *  - exact: one hash-shuffle on the key; map-side partial agg makes the
  *    shuffle linear in #distinct keys, not #rows.
  *  - minhash/simhash LSH: candidate generation is an equi-join on band
  *    buckets — never a cartesian. Signature computation is pure Column
  *    expressions (codegen'd), so the only shuffles are the bucket join and
  *    the final pair dedup.
  *  - ngram-Jaccard: inverted-index join (explode shingles → co-occurrence
  *    counts) — the standard linear-in-postings approach; a hot shingle is
  *    the skew risk, capped via document-frequency pruning.
  *  - embedding cosine: blocked by a coarse key to avoid O(n²); brute force
  *    within blocks only.
  */
object Dedup {

  /** The externally-reproducible hash family ([[Md5Hash]]) — used by the
    * driver-contract queries so sketch results are oracle-checkable.
    */
  val portableHash: HashFamily = Md5Hash

  /** Exact dedup on `keyCols`: one representative row id (min) per group +
    * duplicate count. `SameValueClassifier` is the edge-producing cousin;
    * this is the linear-output variant (star topology, no clique blowup).
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String = "doc_id"): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup via content hash (md5 of normalized text) — equivalent
    * semantics to `exact` on the text itself but shuffles a 128-bit key
    * instead of full document bodies: at 100 TB this is the difference
    * between shuffling terabytes and gigabytes.
    */
  def exactByHash(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact-duplicate family labels over a SLIM key projection — the shared
    * engine behind every collapse-before-pairwise scale lever
    * ([[prefixJaccardPairs]], [[containmentPairs]], [[semanticPairs]],
    * [[graft.ops.SimilaritySearch.mutualKnnClusters]]).
    *
    * `slim` must carry a `_fid` column (the member id) plus the family-key
    * columns `keys` — hashes or fingerprints, never the payload itself, so
    * the family shuffle ships tens of bytes per row where the payload is
    * kilobytes. Labeling is `groupBy(keys).agg(min(_fid), count)` — an
    * aggregate with map-side partials, NOT a window sort — and the result
    * is adaptive:
    *
    *  - `None` when every row is its own family (the duplicate-free
    *    corpus): callers skip the collapse AND the member-expansion joins
    *    entirely, so the lever's fixed cost on clean data is one slim
    *    aggregate plus one limit-1 action.
    *  - `Some(dupMembers)` otherwise: all `slim` columns plus `_rep`
    *    (family representative = minimum member id) and `_k` (family
    *    size), restricted to members of families with `_k > 1` and
    *    persisted (tracked).
    *
    * The `_k > 1` restriction is the second half of the adaptivity: the
    * frame's size is the corpus's DUPLICATE MASS, not its row count, so on
    * a nearly-clean corpus (a handful of dup families in millions of rows)
    * it is tiny and every downstream use — the rep filter as a left-anti
    * join, expansions as left joins with `coalesce(member, rep)` — rides a
    * runtime broadcast instead of reshuffling the corpus. On the raw-crawl
    * corpus the lever exists for (30%+ duplicates BY DESIGN), the same
    * joins AQE-plan as shuffles, which is then the right plan.
    */
  private[graft] def slimFamilies(slim: DataFrame, keys: Seq[String]): Option[DataFrame] = {
    val fams = graft.Caches.track(
      slim.groupBy(keys.map(col): _*)
        .agg(min(col("_fid")).as("_rep"), count(lit(1)).as("_k"))
        .where(col("_k") > 1L))
    if (fams.isEmpty) None
    else Some(graft.Caches.track(slim.join(fams, keys)))
  }

  /** Word w-shingles of the normalized text, as a distinct array. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val n    = size(toks)
    array_distinct(
      transform(
        sequence(lit(0), greatest(n - w, lit(0))),
        i => array_join(slice(toks, i + 1, lit(w)), " ")
      )
    )
  }

  /** MinHash signature as an aggregation: shingles are exploded to postings
    * and each of the `numHashes` seeded minima is a `min()` aggregate — one
    * shuffle on the doc id, fully codegen'd hash aggregation.
    *
    * Why not `array_min(transform(sh, xxhash64(...)))` per hash: higher-order
    * functions are interpreted (no whole-stage codegen), and downstream
    * projection collapse re-inlines the whole signature expression into every
    * consumer (e.g. each LSH band), multiplying the 32-hash computation by
    * the band count. Measured 8× slower than this shape at sf0.1.
    *
    * Returns (id, sh: array<string>, sig: array<long>).
    */
  def minhashSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      shingleWidth: Int,
      hash: HashFamily = XxHash
  ): DataFrame = {
    // Postings via explode(sequence) + slice/array_join: top-level codegen
    // expressions, no interpreted lambda. Per-doc shingle dedup is skipped
    // on purpose — min() is unaffected by duplicates and collect_set
    // dedupes the verification set, so results are identical to the
    // array_distinct formulation with zero extra shuffles.
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val postings = df
      .select(col(idCol).as("id"), toks.as("_toks"))
      .select(
        col("id"),
        col("_toks"),
        explode(sequence(lit(0), greatest(size(col("_toks")) - shingleWidth, lit(0)))).as("_i"))
      .select(col("id"), array_join(slice(col("_toks"), col("_i") + 1, lit(shingleWidth)), " ").as("shingle"))
    val minCols = (0 until numHashes).map(seed => min(hash.seeded(seed, col("shingle"))).as(s"h$seed"))
    postings
      .groupBy("id")
      .agg(collect_set(col("shingle")).as("sh"), minCols: _*)
      .select(col("id"), col("sh"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Per-KEY minhash signature of the key's item SET — group-level
    * similarity sketches (source↔source shingle overlap, shard↔shard
    * vocabulary overlap, day↔day content drift) from `(key, item)` rows.
    * Each of the `numHashes` seeded minima is a plain `min()` aggregate,
    * so signatures are MERGEABLE: per-batch signature frames min-merge
    * into the corpus signature (duplicates never matter to a min), the
    * same incremental contract as the corpus sketch tables. Returns
    * `(key, sig: array<long>)`.
    */
  def keySetSignatures(
      items: DataFrame,
      numHashes: Int = 16,
      keyCol: String = "key",
      itemCol: String = "item",
      hash: HashFamily = XxHash
  ): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val minCols = (0 until numHashes).map(s => min(hash.seeded(s, col(itemCol))).as(s"_h$s"))
    items.groupBy(col(keyCol).as("key"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("key"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("sig"))
  }

  /** Pairwise estimated Jaccard between keys' item sets from
    * [[keySetSignatures]] alone — the cross-corpus overlap MATRIX without
    * ever joining the item sets (the q86 exact overlap's sketch face, and
    * the q140 "size it before you run it" story for overlap): agreement
    * counts matching signature positions, `est_jaccard = agreement / k`.
    * The pair join is deliberately all-pairs over KEYS — keys are groups
    * (sources/shards/days), so |keys|² IS the requested output, bounded
    * by design, not a corpus blowup. One unrolled codegen sum per pair.
    */
  def signatureOverlapEstimates(sigs: DataFrame, numHashes: Int = 16): DataFrame = {
    val a = sigs.select(col("key").as("key_a"), col("sig").as("_sa"))
    val b = sigs.select(col("key").as("key_b"), col("sig").as("_sb"))
    val agree = (0 until numHashes)
      .map(i => when(element_at(col("_sa"), i + 1) === element_at(col("_sb"), i + 1), 1)
        .otherwise(0))
      .reduce(_ + _)
    a.join(b, col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), agree.as("agreement"))
      .withColumn("est_jaccard",
        round(col("agreement").cast("double") / numHashes, 6))
  }

  /** LSH band buckets of a [[minhashSignatures]] frame: (id, band, bucket),
    * one row per document per band (bucket = hash of the band's signature
    * slice). Deliberately SLIM — no shingle payload rides along, so the
    * candidate join shuffles 3 fixed-width columns per band row instead of
    * duplicating every document's shingle array into all `bands` rows;
    * shingle sets are re-attached by id-equi-join only for the candidate
    * pairs that survive banding (see [[minhashLsh]] /
    * [[incrementalFromSketches]]). At corpus scale this is the difference
    * between shuffling/persisting ~bands× the corpus's shingle bytes and
    * shuffling them once, for verified candidates only.
    */
  def bandBuckets(sigs: DataFrame, numHashes: Int, bands: Int, hash: HashFamily): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    sigs.select(
        col("id"),
        explode(
          array((0 until bands).map { b =>
            struct(
              lit(b).as("band"),
              hash.plain(array_join(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), ",")).as("bucket")
            )
          }: _*)
        ).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Slim (id, band, bucket) band rows straight from documents: sketch +
    * [[bandBuckets]] in one call. The candidate key of every minhash
    * variant — self-join it for intra-corpus pairs ([[minhashLsh]]) or
    * equi-join two frames for incremental dedup ([[incrementalMinhash]]).
    * This is also the schema of a persisted corpus band table (the
    * deployment shape: maintain it incrementally, probe it per ingest).
    */
  def bandedMinhash(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 32,
      bands: Int = 8,
      shingleWidth: Int = 3,
      hash: HashFamily = XxHash
  ): DataFrame =
    bandBuckets(minhashSignatures(df, textCol, idCol, numHashes, shingleWidth, hash), numHashes, bands, hash)

  /** MinHash + LSH banding: documents whose signatures collide in ≥1 band
    * become candidate pairs; pairs are then verified with exact Jaccard over
    * shingle sets when `verifyThreshold` > 0.
    *
    * bands × rowsPerBand must equal numHashes. Candidate generation is an
    * equi-join on (band index, band hash) — linear shuffle, no cartesian —
    * over SLIM (id, band, bucket) rows; the shingle sets needed for
    * verification are re-attached to the surviving candidate pairs by
    * id-join against the (persisted-once) signatures frame, so shingle
    * bytes are shuffled once per candidate side, never bands× per corpus.
    */
  def minhashLsh(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 32,
      bands: Int = 8,
      shingleWidth: Int = 3,
      verifyThreshold: Double = 0.0,
      hash: HashFamily = XxHash
  ): DataFrame = {
    // Persisted (tracked — see graft.Caches): the signatures feed both
    // sides of the candidate join AND both verify re-attach joins, and
    // Spark does not share common subplans across join branches — without
    // this the signature aggregation runs four times. The persisted bytes
    // carry each document's shingles ONCE (vs bands× in a fat band frame).
    val sigs   = graft.Caches.track(
      minhashSignatures(df, textCol, idCol, numHashes, shingleWidth, hash))
    val banded = bandBuckets(sigs, numHashes, bands, hash)

    val pairs = banded
      .select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    val sh = sigs.select(col("id"), col("sh"))
    val withJaccard = pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")
      )

    val filtered =
      if (verifyThreshold > 0) withJaccard.where(col("jaccard") >= verifyThreshold) else withJaccard
    filtered.select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Corpus snapshot diff — the dataset-versioning governance report:
    * given two snapshots of a document table, classify every id as
    * `added` / `removed` / `changed` / `unchanged` by comparing content
    * fingerprints ([[TextAnalysis.fingerprint]] — whitespace/case
    * normalized, so cosmetic edits don't count as changes). The release
    * audit between crawls: what moved, before any expensive re-dedup.
    *
    * Scale shape: each side collapses to slim `(id, fp)` rows map-side,
    * then ONE full-outer equi-join on the id — no text shuffles, no
    * pairwise anything. Returns `(idCol, status)`.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    def fps(df: DataFrame, fpName: String): DataFrame =
      df.select(col(idCol).cast("long").as("_id"),
        TextAnalysis.fingerprint(col(textCol)).as(fpName))
    fps(oldSnap, "_fp_old").join(fps(newSnap, "_fp_new"), Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_fp_old").isNull, "added")
          .when(col("_fp_new").isNull, "removed")
          .when(col("_fp_old") === col("_fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Sketch-quality diagnostic over the LSH candidate pairs: the
    * signature-agreement ESTIMATE of Jaccard (matching minhash components
    * / numHashes — the unbiased estimator every banding threshold is
    * implicitly trusting, Broder 1997) side by side with the EXACT shingle
    * Jaccard and the absolute error. This is how `numHashes` is tuned
    * before a 100-TB run: if `est_err` runs hot at the dedup threshold,
    * the sketch is too small for the corpus's similarity profile — found
    * out here on candidate pairs, not downstream in leaked duplicates.
    *
    * Same scale shape as [[minhashLsh]] (slim band self-join, signatures
    * persisted once, re-attached by id for survivors only); the agreement
    * count is an unrolled numHashes-term codegen sum, not an interpreted
    * HOF. Both scores are rounded to 6 before the error so the triple is
    * engine-portable under the md5 family.
    */
  def minhashEstimates(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 32,
      bands: Int = 8,
      shingleWidth: Int = 3,
      hash: HashFamily = XxHash
  ): DataFrame = {
    val sigs = graft.Caches.track(
      minhashSignatures(df, textCol, idCol, numHashes, shingleWidth, hash))
    val banded = bandBuckets(sigs, numHashes, bands, hash)
    val pairs = banded
      .select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")), Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val side = sigs.select(col("id"), col("sh"), col("sig"))
    val agree = (0 until numHashes)
      .map(i => when(element_at(col("sig_a"), i + 1) === element_at(col("sig_b"), i + 1), 1)
        .otherwise(0))
      .reduce(_ + _)
    pairs
      .join(side.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(side.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard", round(agree.cast("double") / numHashes, 6))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"),
        round(abs(col("est_jaccard") - col("jaccard")), 6).as("est_err"))
  }

  /** Incremental near-dup detection: which documents of a (small) new batch
    * near-duplicate a (huge) accumulated history — the every-ingest question
    * of a training-data pipeline, answered WITHOUT re-pairing the history
    * against itself.
    *
    * Candidate generation is the MinHash band equi-join of [[minhashLsh]],
    * but across the two frames — linear in each side, never history².
    * Before the join, the history side is pruned '''map-side''' with a bloom
    * filter built from the new batch's band buckets
    * ([[org.apache.spark.sql.graft.BloomFilterOps]]): history rows whose
    * bucket cannot match any new-batch bucket are dropped at the scan, so
    * the history shuffle carries ~|matching buckets| rows instead of
    * |history × bands|. At 100 TB of history and a daily-crawl-sized batch,
    * that prune IS the operator: the full history is read (one pass,
    * unavoidable without a persisted bucket index) but never shuffled.
    * Bloom false positives only let extra rows into the exact verify step —
    * the result is identical to the unfiltered join (spec-asserted).
    *
    * Returns (new_id, old_id, jaccard) with exact Jaccard ≥ verifyThreshold.
    */
  def incrementalMinhash(
      newDf: DataFrame,
      historyDf: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 16,
      bands: Int = 4,
      shingleWidth: Int = 3,
      verifyThreshold: Double = 0.7,
      hash: HashFamily = XxHash,
      bloomItems: Long = 1000000L,
      historyBanded: Option[DataFrame] = None,
      historySh: Option[DataFrame] = None
  ): DataFrame = {
    val newSigs = minhashSignatures(newDf, textCol, idCol, numHashes, shingleWidth, hash)
    // The history sketch recomputes from historyDf unless the caller passes
    // prebuilt frames — the deployment shape: a corpus's band table (id,
    // band, bucket) and shingle-set table (id, sh) are computed once (or
    // maintained incrementally as batches land) and every ingest probes
    // them, instead of re-sketching 100 TB per run. When derived here the
    // signatures are sketched ONCE (tracked persist) and feed both frames.
    lazy val histSigs = graft.Caches.track(
      minhashSignatures(historyDf, textCol, idCol, numHashes, shingleWidth, hash))
    val hb = historyBanded.getOrElse(bandBuckets(histSigs, numHashes, bands, hash))
    val hs = historySh.getOrElse(histSigs.select(col("id"), col("sh")))
    incrementalFromSketches(newSigs, hb, hs, numHashes, bands, verifyThreshold, hash, bloomItems)
  }

  /** Sketch-level core of [[incrementalMinhash]]: new-batch signatures vs a
    * history band table (id, band, bucket) + shingle-set table (id, sh) —
    * the exact frames a deployed pipeline maintains on disk.
    *
    * Two prunes keep the history sides scan-heavy but shuffle-light:
    *  1. history BANDS are pruned map-side by a bloom over the new batch's
    *     buckets (rows whose bucket cannot match never shuffle);
    *  2. history SHINGLE SETS are pruned by a broadcast left-semi join on
    *     the surviving candidates' old ids — the candidate id set is
    *     bounded by the new batch's collisions, so it broadcasts, and the
    *     semi join drops non-candidate corpus rows at the scan. Exact (no
    *     false positives), and unlike a second bloom it costs no extra
    *     driver action: it executes inside the final job.
    * Both prunes are no-false-negative (result identical to the unfiltered
    * joins — spec-asserted).
    */
  def incrementalFromSketches(
      newSigs: DataFrame,
      histBanded: DataFrame,
      histSh: DataFrame,
      numHashes: Int = 16,
      bands: Int = 4,
      verifyThreshold: Double = 0.7,
      hash: HashFamily = XxHash,
      bloomItems: Long = 1000000L
  ): DataFrame = {
    import org.apache.spark.sql.graft.BloomFilterOps
    // tracked persist: the new-side signatures feed the band join AND the
    // verify re-attach
    val sigs      = graft.Caches.track(newSigs)
    val newBanded = bandBuckets(sigs, numHashes, bands, hash)

    val keys = Seq(col("band"), col("bucket"))
    val histPruned = BloomFilterOps.build(newBanded, keys, expectedItems = bloomItems) match {
      case Some(bloom) => histBanded.where(BloomFilterOps.mightContain(bloom, keys))
      case None        => histBanded.limit(0) // empty new batch: nothing can match
    }

    // tracked persist: candidates feed the semi-join prune and the verify
    val cand = graft.Caches.track(
      newBanded
        .select(col("band"), col("bucket"), col("id").as("new_id"))
        .join(histPruned.select(col("band"), col("bucket"), col("id").as("old_id")), Seq("band", "bucket"))
        .select(col("new_id"), col("old_id"))
        .dropDuplicates("new_id", "old_id"))

    val histShPruned = histSh.join(
      broadcast(cand.select(col("old_id")).distinct()),
      col("id") === col("old_id"), "left_semi")
    cand
      .join(sigs.select(col("id").as("new_id"), col("sh").as("sh_new")), Seq("new_id"))
      .join(histShPruned.select(col("id").as("old_id"), col("sh").as("sh_old")), Seq("old_id"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_new"), col("sh_old"))).cast("double") /
          size(array_union(col("sh_new"), col("sh_old"))).cast("double"))
      .where(col("jaccard") >= verifyThreshold)
      .select(col("new_id"), col("old_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Persisted MinHash-LSH index — the ON-DISK face of
    * [[incrementalFromSketches]], completing the daily-crawl story the
    * same way [[graft.ops.SimilaritySearch.IvfIndex]] does for ANN: the
    * corpus is sketched ONCE into a signature table `(id, sh, sig)`,
    * every ingest batch [[probe]]s it (bloom-pruned band join + exact
    * verify — nobody re-tokenizes 100 TB per run), and accepted batches
    * [[append]] their sketches. Band rows derive from the stored `sig`
    * map-side at probe time (bands/rows-per-band are serving knobs of the
    * same signature, like IVF's nprobe), so the store stays one table.
    *
    * Durability discipline is IvfIndex's verbatim: [[save]]/[[compact]]
    * write into a scratch dir and atomically swap the WHOLE index in
    * (readers never observe a half-written store; a crash leaves the
    * previous index intact); [[append]] adds parquet files under the same
    * single-writer maintenance lock — file-atomic, batch-replayable by a
    * pipeline that keys appends on its own batch ids. The `_meta` sidecar
    * pins (numHashes, shingleWidth, hash family): a probe with mismatched
    * sketch geometry would silently find nothing, so [[load]] fails fast
    * instead.
    */
  case class LshIndex(
      numHashes: Int = 16,
      shingleWidth: Int = 3,
      hash: HashFamily = XxHash) {
    import org.apache.hadoop.fs.{FileSystem, Path}

    private def metaLine: String = s"$numHashes $shingleWidth $hash"

    private def writeScratch(fs: FileSystem, dir: Path, sigs: DataFrame): Unit = {
      val scratch = graft.io.AtomicSwap.scratch(dir)
      sigs.write.mode("overwrite").parquet(s"$scratch/sigs")
      val out = fs.create(new Path(s"$scratch/_meta"), true)
      try out.write((metaLine + "\n").getBytes("UTF-8")) finally out.close()
    }

    /** Sketch `df` and atomically (re)write the index at `path`. */
    def save(df: DataFrame, path: String, textCol: String = "text",
        idCol: String = "doc_id"): Unit = {
      val spark = df.sparkSession
      val dir = new Path(path)
      val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sigs = minhashSignatures(df, textCol, idCol, numHashes, shingleWidth, hash)
      graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
        graft.io.AtomicSwap.heal(fs, dir)
        writeScratch(fs, dir, sigs)
        graft.io.AtomicSwap.swapIn(fs, dir)
      }
      spark.catalog.refreshByPath(path) // raw renames bypass Spark's write-path cache refresh
    }

    // --- append commit protocol: dot-prefixed siblings of sigs/ (invisible
    // to Spark's file discovery, the GraphStore restricted-delete pattern) ---
    private def appendScratch(sigsDir: Path) =
      new Path(sigsDir.getParent, s".${sigsDir.getName}.appendrows")
    private def appendMarker(sigsDir: Path) =
      new Path(sigsDir.getParent, s".${sigsDir.getName}.appendcommit")

    /** Finishes (or rolls back) an [[append]] that died mid-flight.
      * Before the commit marker exists the live sigs/ dir is untouched →
      * roll BACK (drop the scratch). Once the marker exists the batch's
      * part-files are complete in scratch-or-moved → roll FORWARD (rename
      * the stragglers in, clear marker + scratch). Idempotent; runs under
      * the maintenance lock at the start of every append/compact. */
    private def healAppend(fs: FileSystem, sigsDir: Path): Unit = {
      val scr = appendScratch(sigsDir)
      val mark = appendMarker(sigsDir)
      if (fs.exists(mark)) {
        if (fs.exists(scr))
          fs.listStatus(scr).filter(_.getPath.getName.startsWith("part-"))
            .foreach(s => fs.rename(s.getPath, new Path(sigsDir, s.getPath.getName)))
        fs.delete(mark, false); fs.delete(scr, true)
      } else if (fs.exists(scr)) fs.delete(scr, true)
      ()
    }

    /** Load the signature table, failing fast on geometry mismatch.
      *
      * Lock-free snapshot consistency vs [[append]]: a batch is visible
      * if and only if its commit marker exists. Uncommitted scratch files
      * are dot-prefixed (invisible to discovery) and torn post-commit
      * states are completed in-plan — when a marker is present, the
      * not-yet-renamed scratch part-files are unioned in (rename is
      * per-file atomic, so each file is in scratch XOR in sigs/, never
      * both). Readers therefore always see the whole batch or none of
      * it, even concurrent with an append or after a mid-append crash. */
    def load(spark: SparkSession, path: String): DataFrame = {
      val p  = new Path(s"$path/_meta")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
                     .nextOption().getOrElse(
                       sys.error(s"index at $path has no readable _meta"))
                   finally in.close()
      require(stored == metaLine,
        s"index at $path was built with ($stored), this handle is ($metaLine)")
      val base = spark.read.parquet(s"$path/sigs")
      val sigsDir = new Path(s"$path/sigs")
      val scr = appendScratch(sigsDir)
      if (fs.exists(appendMarker(sigsDir)) && fs.exists(scr)) {
        val parts = fs.listStatus(scr)
          .filter(_.getPath.getName.startsWith("part-")).map(_.getPath.toString)
        if (parts.isEmpty) base
        else base.unionByName(spark.read.parquet(parts.toIndexedSeq: _*))
      } else base
    }

    /** Candidate-and-verify a NEW batch against the stored corpus:
      * `(new_id, old_id, jaccard ≥ verifyThreshold)` — exactly
      * [[incrementalFromSketches]] with the history frames served from
      * disk. `bands` must divide `numHashes` (the serving-time recall
      * knob); `bloomItems` sizes the band-prune bloom.
      */
    def probe(
        spark: SparkSession,
        path: String,
        newDf: DataFrame,
        textCol: String = "text",
        idCol: String = "doc_id",
        bands: Int = 4,
        verifyThreshold: Double = 0.7,
        bloomItems: Long = 1000000L): DataFrame = {
      val stored = graft.Caches.track(load(spark, path))
      val newSigs = minhashSignatures(newDf, textCol, idCol, numHashes, shingleWidth, hash)
      incrementalFromSketches(
        newSigs,
        bandBuckets(stored, numHashes, bands, hash),
        stored.select(col("id"), col("sh")),
        numHashes, bands, verifyThreshold, hash, bloomItems)
    }

    /** Sketch and append a batch's signatures into the store (no rewrite
      * of standing files; callers own id uniqueness across batches).
      *
      * CRASH-PROVABLE (the GraphStore restricted-delete marker protocol):
      * the batch is first written whole to a dot-prefixed scratch dir,
      * then a commit MARKER is created, then the part-files are renamed
      * into the live `sigs/` dir. A crash before the marker rolls back
      * (the live store never saw a byte — [[healAppend]] drops the
      * scratch); after it, the batch is durable and the next
      * append/compact rolls forward. [[load]]/[[probe]] key visibility on
      * the marker and union in any not-yet-renamed scratch files, so a
      * torn append is NEVER observable — readers see the whole batch or
      * none of it, without taking the lock. The store stays atomic under
      * exactly one writer ([[graft.io.AtomicSwap.withMaintenanceLock]]);
      * callers own id uniqueness across batches.
      *
      * Hook mapping for crash-injection specs: `beforeAside` fires before
      * the commit marker (rolls back), `beforeSwapIn` after the marker
      * with every part-file still in scratch (rolls forward),
      * `beforeCleanup` after the renames with the protocol files still
      * present (rolls forward, idempotent). */
    def append(spark: SparkSession, path: String, df: DataFrame,
        textCol: String = "text", idCol: String = "doc_id",
        hooks: graft.io.AtomicSwap.Hooks = graft.io.AtomicSwap.NoHooks): Unit = {
      val dir = new Path(path)
      val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sigsDir = new Path(s"$path/sigs")
      graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
        healAppend(fs, sigsDir)
        spark.catalog.refreshByPath(path) // heal may have renamed files in
        load(spark, path) // geometry gate before any bytes land
        val scr = appendScratch(sigsDir)
        minhashSignatures(df, textCol, idCol, numHashes, shingleWidth, hash)
          .write.mode("overwrite").parquet(scr.toString)
        hooks.beforeAside()
        fs.createNewFile(appendMarker(sigsDir)) // commit point
        hooks.beforeSwapIn()
        fs.listStatus(scr).filter(_.getPath.getName.startsWith("part-"))
          .foreach(s => fs.rename(s.getPath, new Path(sigsDir, s.getPath.getName)))
        hooks.beforeCleanup()
        fs.delete(appendMarker(sigsDir), false)
        fs.delete(scr, true)
        ()
      }
      // the commit lands via raw fs.rename, which (unlike a Spark SQL
      // append) never refreshes the path's cached scans/listings — a
      // prior tracked probe of this store would otherwise shadow the
      // batch forever (the q378 cache-barrier trap, write side)
      spark.catalog.refreshByPath(path)
    }

    /** Rewrite an append-grown store into few files (the IvfIndex.compact
      * small-files discipline), atomically. */
    def compact(spark: SparkSession, path: String): Unit = {
      val dir = new Path(path)
      val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
        graft.io.AtomicSwap.heal(fs, dir)
        healAppend(fs, new Path(s"$path/sigs"))
        spark.catalog.refreshByPath(path) // heal may have renamed files in
        val sigs = load(spark, path).coalesce(
          spark.sparkContext.defaultParallelism)
        writeScratch(fs, dir, sigs)
        graft.io.AtomicSwap.swapIn(fs, dir)
      }
      spark.catalog.refreshByPath(path) // raw renames bypass Spark's write-path cache refresh
    }
  }

  /** 64-bit SimHash over tokens: per-bit majority vote of token hashes.
    * One shuffle on the doc id; the vote accumulation is the custom
    * [[org.apache.spark.sql.graft.SimHashAgg]] sketch aggregate (single
    * 64-int buffer per group with map-side partial aggregation — the
    * 64-conditional-sum Column formulation, kept below as [[simhashWide]],
    * compiles a very wide aggregate and shuffles 64 longs per group).
    */
  def simhash(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      hash: HashFamily = XxHash
  ): DataFrame =
    df.select(
        col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .groupBy("id")
      .agg(org.apache.spark.sql.graft.SimHashAgg.simhashAgg(hash.plain(col("tok"))).as("simhash"))

  /** Pure-built-in formulation of [[simhash]] (64 conditional sums) — the
    * executable semantic contract, cross-checked by spec for bit equality.
    */
  def simhashWide(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      hash: HashFamily = XxHash
  ): DataFrame = {
    val toks = df.select(
      col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok")
    )
    val hashed = toks.withColumn("h", hash.plain(col("tok")))
    val bitSums: Seq[Column] = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = hashed.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64)
      .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, blocked by
    * 16-bit chunks (pigeonhole: distance ≤3 ⇒ at least one of 4 chunks
    * equal), so candidate generation is an equi-join on chunks, not O(n²).
    */
  def simhashPairs(
      sigs: DataFrame,
      maxHamming: Int = 3
  ): DataFrame = {
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"), shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL).as("key"))
    }
    // persisted (tracked): feeds both sides of the chunk-bucket join
    val blocked = graft.Caches.track(
      sigs.select(col("id"), col("simhash"), explode(array(chunks: _*)).as("ck")))
    val l = blocked.select(col("ck").as("ck"), col("id").as("id_a"), col("simhash").as("sig_a"))
    val r = blocked.select(col("ck").as("ck"), col("id").as("id_b"), col("simhash").as("sig_b"))
    l.join(r, l("ck") === r("ck") && col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** n-gram Jaccard similarity via inverted-index join: explode shingles to
    * postings, count co-occurrences per pair, Jaccard from set sizes.
    * `maxDocFreq` prunes ubiquitous shingles (skew + noise control): a
    * shingle appearing in k docs contributes k² pair rows, so a single hot
    * shingle dominates the join — the cap bounds that term.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleWidth: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = 1000
  ): DataFrame = {
    // Postings via the codegen explode(sequence) + slice/array_join shape
    // (same as minhashSignatures) instead of the shingles() higher-order
    // function: HOFs are interpreted, and at sf0.1 the HOF materialization
    // was 4.6 s of q19's 5.1 s — 10× the actual co-occurrence join.
    // `distinct` restores the per-doc shingle dedup array_distinct provided
    // (one linear shuffle), and sizes derive from the deduped postings.
    // Persisted (tracked): postings fan out to the hot-set scan, both join
    // sides, and the size aggregate, and Spark does not CSE common subplans
    // across join branches.
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val postings = graft.Caches.track(
      df.select(col(idCol).as("id"), toks.as("_toks"))
        .select(
          col("id"),
          col("_toks"),
          explode(sequence(lit(0), greatest(size(col("_toks")) - shingleWidth, lit(0)))).as("_i"))
        .select(col("id"), array_join(slice(col("_toks"), col("_i") + 1, lit(shingleWidth)), " ").as("shingle"))
        .distinct())
    val sizes = postings.groupBy("id").agg(count(lit(1)).as("sz"))
    // Document-frequency pruning via groupBy + broadcast anti-join, NOT a
    // window: `count().over(partitionBy(shingle))` sorts ALL postings of the
    // hottest shingle into one task *before* the cap can drop it — the exact
    // skew the cap exists to prevent. groupBy gets map-side partial
    // aggregation (each task contributes one count per local shingle), and
    // the resulting hot-set is tiny by construction (≤ |postings|/maxDocFreq,
    // Zipf-small in practice), so the anti-join broadcasts and the postings
    // themselves never shuffle before the co-occurrence join.
    val hot = postings.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDocFreq)
      .select("shingle")
    val pruned = graft.Caches.track(
      postings.join(broadcast(hot), Seq("shingle"), "left_anti"))

    val co = pruned.as("a")
      .join(pruned.as("b"), col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))

    co.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Asymmetric CONTAINMENT near-dup pairs: ordered pairs where
    * `|sh(src) ∩ sh(dst)| / |sh(src)| ≥ threshold` — "src is (mostly)
    * inside dst". This is the quote/snippet/boilerplate detector that
    * symmetric Jaccard structurally misses: a 10-token snippet embedded
    * verbatim in a 1000-token page has containment 1.0 but Jaccard ≈ 0.01,
    * so no Jaccard threshold can catch it without drowning in noise.
    * Complements [[graft.ops.TextAnalysis.dedupSpans]] (which removes
    * duplicated spans in place): containment reports the document-level
    * subsumption relation, the input to "drop the snippet, keep the page"
    * keep-policies.
    *
    * Same inverted-index shape as [[ngramJaccardPairs]] (codegen explode
    * postings, groupBy+broadcast-anti df-prune — never a window over the
    * hottest shingle, co-occurrence equi-join on the shingle key), with two
    * differences: the join keeps BOTH orientations (`a.id =!= b.id` — the
    * relation is directional), and the denominator is the SOURCE size only.
    * Sizes come from unpruned postings; pruning (like q19's) only drops
    * co-occurrence evidence of corpus-hot shingles. Returns
    * (src_id, dst_id, containment).
    */
  def containmentPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleWidth: Int = 3,
      threshold: Double = 0.8,
      maxDocFreq: Long = 1000
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    // EXACT-duplicate collapse (the prefixJaccardPairs discipline): the
    // co-occurrence join runs over one representative per identical-
    // normalized-text family, member pairs expand afterward. Two parity
    // subtleties the jaccard path doesn't have: (1) the hot-shingle prune
    // compares DOCUMENT frequency, so df must count members (family size
    // k), not families — otherwise collapsing changes the prune set and
    // with it the containment values; (2) within-family ordered pairs have
    // containment = |pruned shingles| / sz, a pure function of the family
    // set, emitted without any join work. Families are labeled on a slim
    // (fingerprint, id) projection ([[slimFamilies]] — family = equal md5
    // fingerprint, exactly the key the tokenizer normalizes by), so
    // document bodies never enter the family shuffle; the rep filter is a
    // left-anti join against non-representative duplicate members and _k
    // attaches via a left join (both broadcast-sized when duplicates are
    // rare); a duplicate-free corpus skips collapse and expansion outright.
    val base = df.select(col(idCol).as("id"), col(textCol).as("_txt"))
    val famOpt = slimFamilies(
      base.select(col("id").as("_fid"),
        graft.ops.TextAnalysis.fingerprint(col("_txt")).as("_fp")),
      Seq("_fp"))
    val reps = famOpt match {
      case Some(dupMembers) =>
        base
          .join(dupMembers.where(col("_fid") =!= col("_rep")).select(col("_fid").as("id")),
            Seq("id"), "left_anti")
          .join(dupMembers.where(col("_fid") === col("_rep"))
              .select(col("_fid").as("id"), col("_k")),
            Seq("id"), "left")
          .select(col("id"), col("_txt"), coalesce(col("_k"), lit(1L)).as("_k"))
      case None => base.withColumn("_k", lit(1L))
    }

    val toks = split(lower(trim(col("_txt"))), "\\s+")
    val postings = graft.Caches.track(
      reps.select(col("id"), col("_k"), toks.as("_toks"))
        .select(
          col("id"), col("_k"),
          col("_toks"),
          explode(sequence(lit(0), greatest(size(col("_toks")) - shingleWidth, lit(0)))).as("_i"))
        .select(col("id"), col("_k"),
          array_join(slice(col("_toks"), col("_i") + 1, lit(shingleWidth)), " ").as("shingle"))
        .distinct())
    val sizes = postings.groupBy("id").agg(count(lit(1)).as("sz"))
    // member-weighted df: a family of k copies contributes k documents
    val hot = postings.groupBy("shingle").agg(sum(col("_k")).as("df"))
      .where(col("df") > maxDocFreq)
      .select("shingle")
    val pruned = graft.Caches.track(
      postings.select(col("id"), col("shingle"))
        .join(broadcast(hot), Seq("shingle"), "left_anti"))

    val co = pruned.as("a")
      .join(pruned.as("b"), col("a.shingle") === col("b.shingle") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("_rsrc"), col("b.id").as("_rdst"))
      .agg(count(lit(1)).as("inter"))

    val repPairs = co
      .join(sizes.select(col("id").as("_rsrc"), col("sz").as("sz_src")), "_rsrc")
      .withColumn("containment", round(col("inter") / col("sz_src"), 6))
      .where(col("containment") >= threshold)
      .select("_rsrc", "_rdst", "containment")

    famOpt match {
      case None =>
        repPairs.select(
          col("_rsrc").as("src_id"), col("_rdst").as("dst_id"), col("containment"))
      case Some(dupMembers) =>
        // left-join + coalesce expansion: pairs with no duplicate-family
        // endpoint pass through untouched, so cost tracks duplicate mass
        val cross = repPairs
          .join(dupMembers.select(col("_rep").as("_rsrc"), col("_fid").as("_xs")),
            Seq("_rsrc"), "left")
          .join(dupMembers.select(col("_rep").as("_rdst"), col("_fid").as("_xd")),
            Seq("_rdst"), "left")
          .select(coalesce(col("_xs"), col("_rsrc")).as("src_id"),
            coalesce(col("_xd"), col("_rdst")).as("dst_id"), col("containment"))
        // within-family: copies contain each other at |pruned|/sz (1.0 unless
        // the prune removed family shingles), both orientations — the inner
        // joins against dupMembers restrict famVal to multi-member families
        val prunedSz = pruned.groupBy(col("id")).agg(count(lit(1)).as("_psz"))
        val famVal = sizes.join(prunedSz, Seq("id"), "left")
          .withColumn("containment", round(coalesce(col("_psz"), lit(0L)) / col("sz"), 6))
          .where(col("containment") >= threshold)
          .select(col("id").as("_rep"), col("containment"))
        val within = famVal
          .join(dupMembers.select(col("_rep"), col("_fid").as("src_id")), Seq("_rep"))
          .join(dupMembers.select(col("_rep"), col("_fid").as("dst_id")), Seq("_rep"))
          .where(col("src_id") =!= col("dst_id"))
          .select(col("src_id"), col("dst_id"), col("containment"))
        cross.unionAll(within)
    }
  }

  /** High-threshold n-gram Jaccard via prefix filtering (the All-Pairs /
    * PPJoin family): exact pairs with Jaccard ≥ `threshold`, joining only on
    * each document's '''prefix''' shingles instead of all of them.
    *
    * Shingles get a global canonical order (ascending document frequency,
    * ties by value); a document of `sz` shingles exposes only its first
    * `sz - ⌈t·sz⌉ + 1` to the join. Prefix-filter lemma: two sets with
    * Jaccard ≥ t overlap in ≥ ⌈t·max(|a|,|b|)⌉ elements, and sets
    * overlapping that much MUST share a prefix element — so pruning the
    * rest loses no qualifying pair (spec-asserted against brute force).
    *
    * Why this exists next to [[ngramJaccardPairs]]: the inverted-index join
    * there is linear in postings², summed per shingle — right for
    * exploratory thresholds (0.2–0.5) where most postings participate
    * anyway. At dedup-grade thresholds (≥ 0.7) the prefix is the (1−t)
    * fraction of each document, so the join fans out from ~30% of postings
    * — and because hot (high-df) shingles sort to the END of the canonical
    * order, they are exactly the ones prefixes exclude: the skew cap falls
    * out of the ordering instead of needing a `maxDocFreq` tuning knob.
    *
    * Returns (id_a, id_b, jaccard), id_a < id_b.
    */
  def prefixJaccardPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleWidth: Int = 3,
      threshold: Double = 0.7
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    // EXACT-duplicate collapse before the candidate join: k verbatim copies
    // of a document otherwise multiply every prefix posting list by k and
    // the within-family candidate pairs by k² — and the duplicate-heavy
    // corpus is the EXPECTED input of a dedup pipeline. Identical
    // normalized texts ([[TextAnalysis.fingerprint]] — the same
    // lower/trim/whitespace normalization the tokenizer below applies)
    // have identical shingle sets, so the family is interchangeable: the
    // machinery runs over one representative per family, cross-family
    // member pairs expand with the family pair's jaccard (a pure function
    // of the two shingle sets), and within-family pairs are jaccard 1.0
    // by construction (≥ any legal threshold). Output is identical to the
    // uncollapsed compare; candidate work drops from k² to 1 per family.
    // Families are labeled on a slim (fingerprint, id) projection
    // ([[slimFamilies]]) — document bodies never enter the family shuffle;
    // the rep filter is a left-anti join against the NON-representative
    // duplicate members (broadcast-sized when duplicates are rare); on a
    // duplicate-free corpus the collapse and expansion skip entirely.
    val base = df.select(col(idCol).as("id"), col(textCol).as("_txt"))
    val famOpt = slimFamilies(
      base.select(col("id").as("_fid"),
        graft.ops.TextAnalysis.fingerprint(col("_txt")).as("_fp")),
      Seq("_fp"))
    val reps = famOpt match {
      case Some(dupMembers) =>
        base.join(
          dupMembers.where(col("_fid") =!= col("_rep")).select(col("_fid").as("id")),
          Seq("id"), "left_anti")
      case None => base
    }

    // postings: the codegen explode shape (see ngramJaccardPairs).
    // NOT persisted: the frame feeds both the document-frequency count
    // and the per-document assembly join, but both consumers live in ONE
    // executed plan whose identical distinct-Exchanges AQE stage-reuse
    // dedupes at runtime — an r15 persist experiment here measured
    // SLOWER across the q47/q48/q50/q86 chain (cache write + columnar
    // encode for a reuse that was already free; the pageRankDF lesson).
    val toks = split(lower(trim(col("_txt"))), "\\s+")
    val postings = reps
      .select(col("id"), toks.as("_toks"))
      .select(
        col("id"),
        col("_toks"),
        explode(sequence(lit(0), greatest(size(col("_toks")) - shingleWidth, lit(0)))).as("_i"))
      .select(col("id"), array_join(slice(col("_toks"), col("_i") + 1, lit(shingleWidth)), " ").as("shingle"))
      .distinct()

    // canonical order = (df asc, shingle asc), realized by sorting each
    // document's (df, shingle) structs; one groupBy re-assembles documents.
    // Tracked persist: docs feeds the prefix explode AND both verify joins.
    val dfreq = postings.groupBy("shingle").agg(count(lit(1)).as("df"))
    val docs = graft.Caches.track(
      postings
        .join(dfreq, Seq("shingle"))
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("ordered"))
        .select(
          col("id"),
          transform(col("ordered"), x => x.getField("shingle")).as("sh"),
          size(col("ordered")).as("sz")))

    val prefLen = (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    val pref = docs.select(col("id"), col("sz"), explode(slice(col("sh"), lit(1), prefLen)).as("shingle"))

    // candidate join on prefix shingles only + length filter (J ≥ t ⇒
    // min(sz) ≥ t·max(sz); the 1e-9 slack keeps boundary pairs when
    // t·max rounds up in floating point)
    val cand = pref
      .select(col("shingle"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(pref.select(col("shingle"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("shingle"))
      .where(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")).cast("double") >=
          greatest(col("sz_a"), col("sz_b")) * threshold - 1e-9)
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val repPairs = cand
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a").as("_ra"), col("id_b").as("_rb"), round(col("jaccard"), 6).as("jaccard"))

    // expansion: members inherit their families' pair verdicts. Pairs whose
    // endpoint is NOT in a duplicate family (the common case on a nearly-
    // clean corpus) pass through the left joins untouched — coalesce keeps
    // the rep itself — so expansion cost is proportional to duplicate mass.
    famOpt match {
      case None =>
        repPairs.select(col("_ra").as("id_a"), col("_rb").as("id_b"), col("jaccard"))
      case Some(dupMembers) =>
        val cross = repPairs
          .join(dupMembers.select(col("_rep").as("_ra"), col("_fid").as("_xa")),
            Seq("_ra"), "left")
          .join(dupMembers.select(col("_rep").as("_rb"), col("_fid").as("_xb")),
            Seq("_rb"), "left")
          .withColumn("_ida", coalesce(col("_xa"), col("_ra")))
          .withColumn("_idb", coalesce(col("_xb"), col("_rb")))
          .select(least(col("_ida"), col("_idb")).as("id_a"),
            greatest(col("_ida"), col("_idb")).as("id_b"), col("jaccard"))
        val within = dupMembers.select(col("_rep"), col("_fid").as("id_a"))
          .join(dupMembers.select(col("_rep"), col("_fid").as("id_b")), Seq("_rep"))
          .where(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), lit(1.0).as("jaccard"))
        cross.unionAll(within)
    }
  }

  /** Near-dup cluster formation — the keep/drop step that closes every dedup
    * story. Pair outputs ([[minhashLsh]], [[simhashPairs]],
    * [[ngramJaccardPairs]], [[prefixJaccardPairs]],
    * [[embeddingCosinePairs]]) say which documents duplicate each other;
    * this turns them into a decision: connected components over the pair
    * graph, one representative (the smallest doc id) per component.
    *
    * Returns (doc_id, cluster_id, keep): `cluster_id` = smallest doc id in
    * the component, `keep` = (doc_id == cluster_id). Dropping every
    * keep=false row retains exactly one document per near-dup cluster.
    * With `docs` supplied, documents in no pair appear as their own
    * singleton cluster with keep=true, so the output is a total keep/drop
    * verdict over the corpus.
    *
    * Scale shape: only pair-PARTICIPATING documents enter the component
    * computation, and that computation is the alternating-star DataFrame
    * loop ([[graft.graph.GraphQueries.connectedComponentsDF]]) — spillable
    * shuffles over a slim (long, long) edge list, AQE-planned, O(log n)
    * rounds. Real crawls at dedup-grade thresholds are 30%+ near-dup, so
    * the pair graph is a constant fraction of the corpus: a GraphX-style
    * in-memory cached graph would be an OOM risk at 100×, while the DF
    * loop's per-round state spills. Untouched documents join back as
    * singletons with one plain left join, never riding the iteration.
    */
  def clusters(
      spark: SparkSession,
      pairs: DataFrame,
      docs: Option[DataFrame] = None,
      idCol: String = "doc_id",
      aCol: String = "id_a",
      bCol: String = "id_b"
  ): DataFrame = {
    import graft.rules.EdgeColumns
    // tracked persist: the pair frame feeds the vertex set (twice, via the
    // union branches) AND the edge set, and upstream pair generation is
    // the expensive part — without this a prefix-Jaccard input would be
    // recomputed three times (measured 2.5× slower at sf0.1)
    val p = graft.Caches.track(
      pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b")))
    val edges = p.select(col("a").as(EdgeColumns.Src), col("b").as(EdgeColumns.Dst))
    docs match {
      case None =>
        // no universe supplied → label exactly the pair members
        val members = p.select(col("a").as("id"))
          .union(p.select(col("b").as("id")))
          .distinct()
        graft.graph.GraphQueries.connectedComponentsDF(spark, members, edges)
          .select(col("id").as(idCol), col("component").as("cluster_id"))
          .withColumn("keep", col(idCol) === col("cluster_id"))
      case Some(d) =>
        // every pair member is an edge endpoint, so the label frame already
        // covers them — skip the members distinct + universe join and go
        // straight from labels to the docs universe (one left join;
        // singletons coalesce to themselves)
        val labels = graft.graph.GraphQueries.componentLabels(spark, edges)
          .select(col("vid").as(idCol), col("component").as("cluster_id"))
        d.select(col(idCol).cast("long").as(idCol))
          .join(labels, Seq(idCol), "left")
          .select(
            col(idCol),
            coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
            (coalesce(col("cluster_id"), col(idCol)) === col(idCol)).as("keep"))
    }
  }

  /** [[clusters]] with a representative POLICY: the kept document per
    * cluster maximizes `score` (ties → smallest id) instead of being the
    * smallest id — the production rule is "keep the highest-quality copy"
    * (longest text, best quality score, newest crawl), not "keep the
    * oldest id". `docs` must carry `idCol`; `score` is evaluated against
    * it. Returns (doc_id, cluster_id, keep) over the full universe.
    *
    * Cost over [[clusters]]: one extra shuffle on cluster_id for the
    * per-cluster rank — state is one running rank per stream, no cluster's
    * rows are ever collected together.
    */
  def clustersBy(
      spark: SparkSession,
      pairs: DataFrame,
      docs: DataFrame,
      score: Column,
      idCol: String = "doc_id",
      aCol: String = "id_a",
      bCol: String = "id_b"
  ): DataFrame = {
    val base = clusters(spark, pairs, Some(docs.select(col(idCol))), idCol, aCol, bCol)
      .select(col(idCol), col("cluster_id"))
    applyKeepPolicy(base, docs, score, idCol)
  }

  /** The representative POLICY of [[clustersBy]] applied to ANY label frame
    * (idCol, cluster_id) — in particular to incrementally-maintained labels
    * ([[incrementalClusters]], [[graft.streaming.StreamingDedupIngest.labels]]),
    * so the "keep the best copy" verdict composes with the incremental
    * path without re-running components: docs absent from `labels` are
    * treated as their own singleton cluster, then the highest-`score` doc
    * per cluster (ties → smallest id) is kept. Returns (idCol, cluster_id,
    * keep) over the `docs` universe. One shuffle on cluster_id; rank state
    * is O(1) per stream.
    */
  def applyKeepPolicy(
      labels: DataFrame,
      docs: DataFrame,
      score: Column,
      idCol: String = "doc_id"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = labels.select(col(idCol).cast("long").as(idCol), col("cluster_id").cast("long").as("cluster_id"))
    val withScore = docs.select(col(idCol).cast("long").as(idCol), score.as("_score"))
      .join(l, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"), col("_score"))
    val w = Window.partitionBy(col("cluster_id")).orderBy(col("_score").desc, col(idCol))
    withScore
      .withColumn("_rn", row_number().over(w))
      .select(col(idCol), col("cluster_id"), (col("_rn") === 1).as("keep"))
  }

  /** Incremental cluster-label maintenance — update a persisted
    * (doc_id, cluster_id) label table with a new batch's pair frame WITHOUT
    * re-running components over every historical pair.
    *
    * Key fact: a min-label component labeling is itself a lossless,
    * pre-collapsed encoding of historical connectivity — each cluster is a
    * star around its minimum id. So the union of (prior labels as doc →
    * cluster_id edges, self-labels dropped) with the new batch's pairs has
    * exactly the same components as (all historical pairs ∪ new pairs),
    * and min-merge falls out of [[graft.graph.GraphQueries.componentLabels]]'s
    * min-label contract: a batch that bridges two historical clusters
    * relabels both to the smaller cluster_id (spec-asserted ≡ full
    * recompute, including merge batches).
    *
    * Scale shape: the component input is |label table| + |new pairs| rows —
    * one slim (long, long) row per historically-clustered doc, NOT one per
    * historical pair (a near-dup-dense crawl has many more pairs than
    * clustered docs, and old pairs need never be stored at all). This is
    * the cluster-formation analogue of the maintained sketch tables that
    * [[incrementalFromSketches]] probes; [[graft.streaming.StreamingDedupIngest]]
    * wires both together so the streaming story is incremental end-to-end.
    *
    * Returns (idCol, cluster_id, keep) like [[clusters]]: with `docs`
    * supplied the verdict is total over that universe; otherwise it covers
    * prior-label docs ∪ new-pair members (absent docs are implicit
    * singletons).
    */
  def incrementalClusters(
      spark: SparkSession,
      priorLabels: DataFrame,
      newPairs: DataFrame,
      docs: Option[DataFrame] = None,
      idCol: String = "doc_id",
      aCol: String = "id_a",
      bCol: String = "id_b"
  ): DataFrame = {
    import graft.rules.EdgeColumns
    // tracked persists: both frames feed the edge union AND the universe
    val prior = graft.Caches.track(
      priorLabels.select(col(idCol).cast("long").as("a"), col("cluster_id").cast("long").as("b")))
    val p = graft.Caches.track(
      newPairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b")))
    val edges = prior.where(col("a") =!= col("b")).union(p)
      .select(col("a").as(EdgeColumns.Src), col("b").as(EdgeColumns.Dst))
    val labels = graft.graph.GraphQueries.componentLabels(spark, edges)
      .select(col("vid").as(idCol), col("component").as("cluster_id"))
    val universe = docs
      .map(_.select(col(idCol).cast("long").as(idCol)))
      .getOrElse(
        prior.select(col("a").as(idCol))
          .union(p.select(col("a").as(idCol)))
          .union(p.select(col("b").as(idCol)))
          .distinct())
    universe.join(labels, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
        (coalesce(col("cluster_id"), col(idCol)) === col(idCol)).as("keep"))
  }

  /** Embedding-cosine near-dup pairs, blocked by a coarse key (default: a
    * provided label/cluster column) so the pairwise compare is within-block
    * only. Cosine is computed with zip_with + aggregate — native expressions.
    */
  def embeddingCosinePairs(
      df: DataFrame,
      blockCol: String,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      threshold: Double = 0.95
  ): DataFrame = {
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosine(col("v_a"), col("v_b")))
      // NaN guard: zero-vector cosine is NaN and Spark orders NaN above all
      // doubles — undefined similarity must not pass the threshold.
      .where(col("cos") >= threshold && !isnan(col("cos")))
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }

  /** SemDeDup-style semantic dedup decision over an embedding corpus:
    * block by a coarse bucket (callers pass an LSH sign-projection bucket —
    * the deterministic, oracle-replicable analogue of the SemDeDup paper's
    * k-means cells — or any cluster/label column), compute within-bucket
    * cosine pairs at or above `threshold`, and DROP every vector that has a
    * smaller-id in-bucket neighbor at that similarity (min-id
    * representative — same deterministic orientation rule as the reference
    * similarity join's `id1 > id2`, SimilarityClassifer.scala:59). Returns
    * one row per input vector: (idCol, bucket, n_smaller_dups, keep).
    *
    * Scale shape: the pairwise compare is confined to bucket-equi-join
    * partitions (no all-pairs); the drop decision is one groupBy on the
    * pair frame plus one left join back to the corpus — both shuffles
    * map-side combined. Bucket width controls the quadratic term exactly
    * like the band/blocking keys of the text-dedup family.
    */
  def semanticDedup(
      df: DataFrame,
      bucketCol: Column,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      threshold: Double = 0.9
  ): DataFrame = {
    val base = graft.Caches.track(
      df.select(col(idCol), bucketCol.as("bucket"), col(vecCol).cast("array<double>").as("_v")))
    val dropped = semanticPairsOf(base, idCol, threshold)
      .groupBy(col("id_b").as(idCol))
      .agg(count(lit(1)).as("n_smaller_dups"))
    base.join(dropped, Seq(idCol), "left")
      .select(
        col(idCol),
        col("bucket"),
        coalesce(col("n_smaller_dups"), lit(0L)).as("n_smaller_dups"),
        col("n_smaller_dups").isNull.as("keep"))
  }

  /** The semantic near-dup PAIR frame (id_a < id_b, within-bucket cosine at
    * or above `threshold`) behind [[semanticDedup]] — feed it to
    * [[clusters]]/[[clustersBy]] for transitive semantic groups with a
    * quality-policy representative ("keep the best copy", not the smallest
    * id), exactly like the text-dedup pair frames. Recall scales the same
    * way as multi-table LSH: union the pair frames of several independent
    * bucketings (different hyperplane families) before clustering.
    */
  def semanticPairs(
      df: DataFrame,
      bucketCol: Column,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      threshold: Double = 0.9
  ): DataFrame = {
    val base = graft.Caches.track(
      df.select(col(idCol), bucketCol.as("bucket"), col(vecCol).cast("array<double>").as("_v")))
    semanticPairsOf(base, idCol, threshold)
      .select(col("id_a"), col("id_b"), round(col("_cos"), 6).as("cosine"))
  }

  /** Multi-family [[semanticPairs]]: the union of the pair frames of k
    * INDEPENDENT bucketings (e.g. [[graft.ops.SimilaritySearch.RandomHyperplaneLsh]]
    * handles with distinct `family` values), deduplicated. The recall
    * mechanism of multi-table LSH applied to semantic dedup: a true
    * near-dup pair that one family's planes split across buckets has an
    * independent chance of cobucketing under each other family, so missed
    * pairs decay exponentially in the family count while cost grows
    * linearly (each family is its own bucket-equi-join pass over the
    * corpus; the quadratic within-bucket term is unchanged per family).
    * The cosine column is a deterministic function of the pair, so the
    * union dedups exactly. Feed the result to [[clusters]]/[[clustersBy]]
    * like any other pair frame.
    */
  def semanticPairsMulti(
      df: DataFrame,
      bucketCols: Seq[Column],
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      threshold: Double = 0.9
  ): DataFrame = {
    require(bucketCols.nonEmpty, "at least one bucketing family is required")
    bucketCols.map(b => semanticPairs(df, b, vecCol, idCol, threshold))
      .reduce(_ union _)
      .distinct()
  }

  /** Within-bucket qualifying pairs — EXACT-duplicate vectors collapse to
    * one representative per (bucket, vector) family before the quadratic
    * stage, and member pairs expand afterward. The output is identical to
    * the naive all-pairs compare (cosine is a pure function of the two
    * vectors, ids and filters are untouched; zero-vector pairs drop via
    * the explicit NaN guard below), but k verbatim
    * copies inside one bucket now cost 1 family-pair cosine instead of
    * k², and the duplicate-heavy corpus is the EXPECTED corpus at scale.
    * Expansion joins ride the slim (bucket, rep) key; the quadratic term
    * is |families-per-bucket|², bounded by bucket width as before. On a
    * duplicate-free corpus ([[slimFamilies]] → None) the collapse and the
    * expansion joins are skipped outright.
    */
  private def semanticPairsOf(base: DataFrame, idCol: String, threshold: Double): DataFrame = {
    // Families are labeled on a slim (bucket, vector-hash, id) projection
    // ([[slimFamilies]]) — two independent 64/32-bit hashes of the vector
    // (96 combined bits: a false family merge needs a simultaneous
    // collision in both, ~2⁻⁹⁶ per candidate pair — negligible against
    // float-level cosine jitter) — so embedding payloads never enter the
    // family shuffle. On a duplicate-free corpus the collapse and the
    // expansion joins skip entirely (the round-12 unconditional collapse
    // cost two payload-keyed window sorts + two expansion joins even when
    // no family had two members).
    val famOpt = slimFamilies(
      base.select(col(idCol).as("_fid"), col("bucket"),
        xxhash64(col("_v")).as("_h1"), hash(col("_v")).as("_h2")),
      Seq("bucket", "_h1", "_h2"))
    famOpt match {
      case None =>
        val fa = base.select(col("bucket"), col(idCol).as("id_a"), col("_v").as("v_a"))
        val fb = base.select(col("bucket"), col(idCol).as("id_b"), col("_v").as("v_b"))
        fa.join(fb, Seq("bucket"))
          .where(col("id_a") < col("id_b"))
          .withColumn("_cos", VectorOps.cosine(col("v_a"), col("v_b")))
          // NaN guard: cosine of a zero vector is NaN, and Spark ORDERS NaN
          // above every double, so a bare >= would declare zero vectors
          // similar to everything — undefined similarity is not similarity.
          .where(col("_cos") >= threshold && !isnan(col("_cos")))
          .select(col("id_a"), col("id_b"), col("_cos"))
      case Some(dupMembers) =>
        // rep filter = left-anti join against non-representative duplicate
        // members (broadcast-sized when duplicates are rare); famReps feeds
        // both sides of the pair self-join — persist, or it recomputes
        val famReps = graft.Caches.track(
          base.join(
            dupMembers.where(col("_fid") =!= col("_rep")).select(col("_fid").as(idCol)),
            Seq(idCol), "left_anti"))
        val fa = famReps.select(col("bucket"), col(idCol).as("_ra"), col("_v").as("v_a"))
        val fb = famReps.select(col("bucket"), col(idCol).as("_rb"), col("_v").as("v_b"))
        val famPairs = fa.join(fb, Seq("bucket"))
          .where(col("_ra") <= col("_rb")) // self-pair carries within-family expansion
          .withColumn("_cos", VectorOps.cosine(col("v_a"), col("v_b")))
          // NaN guard: see the duplicate-free branch. Identical zero
          // vectors CAN form a duplicate family here (nothing in this
          // function singles them out), but the family's entire output
          // flows through its rep's pairs, and every pair touching a zero
          // vector — including the self-pair that carries within-family
          // expansion — has NaN cosine and dies on this filter. That NaN
          // guard alone is what keeps zero-vector copies from being
          // declared similar; do not weaken it without re-deriving this.
          .where(col("_cos") >= threshold && !isnan(col("_cos")))
          .select(col("_ra"), col("_rb"), col("_cos"))
        // left-join + coalesce expansion (family members share the rep's
        // bucket, so the rep id alone is the join key): pairs with no
        // duplicate-family endpoint pass through untouched; a singleton
        // rep's self-pair expands to (id, id) and dies on _ida < _idb
        famPairs
          .join(dupMembers.select(col("_rep").as("_ra"), col("_fid").as("_xa")),
            Seq("_ra"), "left")
          .join(dupMembers.select(col("_rep").as("_rb"), col("_fid").as("_xb")),
            Seq("_rb"), "left")
          .withColumn("_ida", coalesce(col("_xa"), col("_ra")))
          .withColumn("_idb", coalesce(col("_xb"), col("_rb")))
          .where(col("_ra") =!= col("_rb") || col("_ida") < col("_idb"))
          .select(
            least(col("_ida"), col("_idb")).as("id_a"),
            greatest(col("_ida"), col("_idb")).as("id_b"),
            col("_cos"))
    }
  }

  /** Blocking-quality evaluation — the two numbers every candidate
    * generator (LSH bands, length buckets, prefix filters, IVF cells) is
    * judged by in entity resolution: '''pairs completeness''' (what
    * fraction of the TRUE pairs does the blocking still propose — recall
    * at the candidate stage; a pair lost here is unrecoverable) and
    * '''reduction ratio''' (what fraction of the n(n−1)/2 all-pairs
    * work does it avoid). Inputs: the corpus (for n), a candidate pair
    * frame, and a ground-truth pair frame — both canonicalized
    * internally to unordered distinct pairs, so either orientation and
    * duplicates are fine. Returns one row `(n_records, total_possible,
    * n_candidates, n_truth, n_hit, pairs_completeness,
    * reduction_ratio)`; NULL completeness when truth is empty.
    *
    * Scale shape: two distinct-collapses + one slim equi-join on the
    * canonical pair key + three one-row aggregates. `total_possible` is
    * a DOUBLE: n(n−1)/2 overflows a long past n ≈ 4.3e9, and at that
    * scale it is a magnitude readout, not a countable — exact below 2⁵³
    * pairs.
    */
  def blockingEval(
      corpus: DataFrame,
      candidates: DataFrame,
      truth: DataFrame,
      idCol: String = "doc_id",
      aCol: String = "id_a",
      bCol: String = "id_b",
      scale: Int = 6): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(least(col(aCol), col(bCol)).as("_pa"), greatest(col(aCol), col(bCol)).as("_pb"))
      .where(col("_pa") =!= col("_pb"))
      .distinct()
    val nRec = corpus.select(col(idCol)).distinct().count()
    // ONE fused pass over both pair sets instead of three sequential count
    // jobs (|cand|, |truth|, |cand ∩ truth| via a semi join): canon sides
    // are distinct, so the full-outer join on the whole key is 1:1 and one
    // row survives per pair of either side — the three counts are sums of
    // presence flags. Fewer passes AND fewer shuffled bytes at any scale
    // (each side is shuffled exactly once, where the count-then-semi-join
    // shape shuffled the candidate side twice), and the sides no longer
    // need persisting — each is consumed exactly once (r16; measured
    // q367 −0.7 s at sf0.1, identical outputs).
    val hits = canon(candidates).withColumn("_c", lit(1))
      .join(canon(truth).withColumn("_t", lit(1)), Seq("_pa", "_pb"), "full")
      .agg(
        coalesce(sum(col("_c")), lit(0L)).as("_nc"),
        coalesce(sum(col("_t")), lit(0L)).as("_nt"),
        coalesce(sum(when(col("_c").isNotNull && col("_t").isNotNull, 1L)), lit(0L)).as("_nh"))
      .first()
    val nCand  = hits.getLong(0)
    val nTruth = hits.getLong(1)
    val nHit   = hits.getLong(2)
    val spark = corpus.sparkSession
    import spark.implicits._
    val total = (BigDecimal(nRec) * BigDecimal(nRec - 1) / 2).toDouble
    Seq((nRec, total, nCand, nTruth, nHit)).toDF(
        "n_records", "total_possible", "n_candidates", "n_truth", "n_hit")
      .select(col("*"),
        when(col("n_truth") > 0,
          round(col("n_hit").cast("double") / col("n_truth"), scale)).as("pairs_completeness"),
        when(col("total_possible") > 0,
          round(lit(1.0) - col("n_candidates").cast("double") / col("total_possible"), scale))
          .as("reduction_ratio"))
  }

  /** MinHash-LSH operating curve — the tuning table behind every
    * bands/rows choice: for a signature of `numHashes` hashes split as
    * `b` bands × `r` rows, a pair at Jaccard `j` becomes a candidate
    * with `p = 1 − (1 − jʳ)ᵇ`. One row per (valid split, probe j) —
    * scan the table, pick the split whose S-curve knee sits at your
    * dedup threshold. Pure literal arithmetic (|splits|·|probes| rows,
    * no data touched); the same closed form the [[minhashLsh]]
    * candidate generator realizes physically.
    */
  def lshOperatingCurve(
      numHashes: Int,
      probes: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.8, 0.9),
      scale: Int = 6): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    require(probes.nonEmpty && probes.forall(p => p > 0.0 && p < 1.0),
      s"probes must be in (0,1), got $probes")
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val splits = (1 to numHashes).filter(numHashes % _ == 0)
      .map(b => (b.toLong, (numHashes / b).toLong))
    splits.toDF("bands", "rows_per_band")
      .select(col("bands"), col("rows_per_band"),
        explode(array(probes.map(lit(_)): _*)).as("j"))
      .withColumn("p_candidate",
        round(lit(1.0) - pow(lit(1.0) - pow(col("j"), col("rows_per_band")), col("bands")),
          scale))
  }

  /** Golden-record assembly — the survivorship step of entity resolution:
    * collapse each cluster of matched records into ONE canonical record,
    * field by field. `modeCols` elect the majority value per cluster
    * (ties toward the greatest — [[graft.ops.Stats.modeBy]]'s
    * deterministic contract), `maxCols`/`minCols` take the extreme
    * (freshest timestamp, longest text, smallest id), and `n_members`
    * records the evidence count. Pair with [[clusters]] /
    * [[incrementalClusters]] for the labels and the pair generators for
    * the matches — this is the last joint of the match → cluster → merge
    * chain.
    *
    * Scale shape: `labeled` is consumed EXACTLY ONCE — one joint
    * partial-aggregated shuffle collapses it to `(cluster, modeCols…)`
    * cells carrying the count and per-cell extremes (never more rows than
    * the input; bounded by cluster count × value combinations on the
    * categorical survivorship fields this exists for), and the extremes
    * re-aggregation plus every mode election derive from that tracked
    * cell frame. The naive alternative — one aggregate per field family
    * straight off `labeled` — re-evaluates the whole upstream match →
    * cluster → join chain once per family (the groupBy keys differ, so
    * exchange reuse never fires); measured 1.7× slower end-to-end at
    * sf0.1 and linearly worse the more mode columns a caller asks for.
    * Every join is on the cluster key against frames of at most
    * |clusters| rows. No window, no data-sized state.
    *
    * Mode election = [[graft.ops.Stats.modeBy]]'s contract verbatim:
    * greatest count, ties toward the greatest value — summing joint cells
    * over the other mode columns yields exactly modeBy's `(cluster,
    * value)` count table.
    */
  def goldenRecords(
      labeled: DataFrame,
      clusterCol: String,
      modeCols: Seq[String],
      maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil
  ): DataFrame = {
    val st = goldenPartials(labeled, clusterCol, modeCols, maxCols, minCols)
    goldenFromPartials(st, clusterCol)
  }

  /** Mergeable survivorship state for [[goldenRecords]]: per-batch partial
    * aggregates whose merge is exact — counts and extremes are sums/max/min,
    * and the mode election distributes over summed `(cluster, value)`
    * count tables. At 100 TB the golden-record table maintains itself from
    * per-batch partials (each bounded by |clusters seen in the batch| ×
    * |distinct field values|), never by rescanning members — the
    * MaterializedAgg discipline applied to entity resolution.
    */
  case class GoldenState(extremes: DataFrame, modeCounts: Seq[(String, DataFrame)])

  /** One batch's [[GoldenState]] — same field semantics as
    * [[goldenRecords]] (`modeCols` majority with ties to greatest,
    * `maxCols`/`minCols` extremes, `n_members` evidence count).
    */
  def goldenPartials(
      labeled: DataFrame,
      clusterCol: String,
      modeCols: Seq[String],
      maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil
  ): GoldenState = {
    require(modeCols.nonEmpty || maxCols.nonEmpty || minCols.nonEmpty,
      "goldenPartials needs at least one field-election column")
    // ONE pass over `labeled`: the joint (cluster, modeCols…) cell frame
    // carries the count and per-cell extremes; extremes and every
    // per-field mode table re-aggregate the (tracked, |cells|-sized)
    // frame instead of re-evaluating the upstream chain once per field
    // family — see [[goldenRecords]]'s scale-shape note.
    val cellAggs = (count(lit(1)).as("_cn") +:
      (maxCols.map(c => max(col(c)).as(s"max_$c")) ++
        minCols.map(c => min(col(c)).as(s"min_$c")))).toList
    val cells = graft.Caches.track(
      labeled.groupBy((clusterCol +: modeCols).map(col): _*)
        .agg(cellAggs.head, cellAggs.tail: _*))
    val extAggs = (sum(col("_cn")).as("n_members") +:
      (maxCols.map(c => max(col(s"max_$c")).as(s"max_$c")) ++
        minCols.map(c => min(col(s"min_$c")).as(s"min_$c")))).toList
    val ext = cells.groupBy(col(clusterCol)).agg(extAggs.head, extAggs.tail: _*)
    val modes = modeCols.map(c =>
      c -> cells.groupBy(col(clusterCol), col(c)).agg(sum(col("_cn")).as("_n")))
    GoldenState(ext, modes)
  }

  /** Exact merge of per-batch states: `n_members` sums, `max_*`/`min_*`
    * re-extremize (the column-name prefix IS the merge function — partial
    * max of maxes is the max), mode count tables sum per
    * `(cluster, value)`. Associative and batch-split-invariant
    * (spec-pinned: merge ≡ whole).
    */
  def goldenMerge(parts: Seq[GoldenState], clusterCol: String): GoldenState = {
    require(parts.nonEmpty, "goldenMerge needs at least one partial state")
    val extAll = parts.map(_.extremes).reduce(_ unionByName _)
    val aggs = extAll.columns.filterNot(_ == clusterCol).map {
      case c @ "n_members" => sum(col(c)).as(c)
      case c if c.startsWith("max_") => max(col(c)).as(c)
      case c if c.startsWith("min_") => min(col(c)).as(c)
      case c => throw new IllegalArgumentException(s"unmergeable extremes column $c")
    }.toList
    val ext = extAll.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
    val fields = parts.head.modeCounts.map(_._1)
    val modes = fields.map { f =>
      val tables = parts.map(p => p.modeCounts.collectFirst { case (`f`, t) => t }
        .getOrElse(throw new IllegalArgumentException(s"state missing mode field $f")))
      f -> tables.reduce(_ unionByName _)
        .groupBy(col(clusterCol), col(f)).agg(sum(col("_n")).as("_n"))
    }
    GoldenState(ext, modes)
  }

  /** Serves the golden-record table from (merged) partials — identical
    * output, column for column, to [[goldenRecords]] over the union of the
    * contributing batches (the q201 oracle is q196's verbatim).
    */
  def goldenFromPartials(st: GoldenState, clusterCol: String): DataFrame =
    st.modeCounts.foldLeft(st.extremes) { case (acc, (f, counts)) =>
      val elected = counts.groupBy(col(clusterCol))
        .agg(max(struct(col("_n"), col(f))).as("_m"))
        .select(col(clusterCol), col(s"_m.$f").as(s"mode_$f"))
      acc.join(elected, Seq(clusterCol))
    }
}
