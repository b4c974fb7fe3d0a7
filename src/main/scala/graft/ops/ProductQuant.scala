package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the MEMORY scale path
  * for ANN beyond [[SimilaritySearch.ScalarQuant]]'s int8: a d-dim vector
  * is split into `m` subvectors, each subspace gets its own `ksub`-entry
  * codebook (seeded KMeans), and a vector is stored as `m` small codes —
  * one byte per subspace at ksub ≤ 256, a 32× shrink over float32 at
  * (m=8, d=64). At 100 TB of embeddings that is the difference between a
  * RAM-resident candidate store and none. Public method: Jégou, Douze,
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI 2011.
  *
  * Query-time ADC (asymmetric distance computation): the query stays
  * float; per subspace a ksub-entry table of partial dot products between
  * the query slice and every codeword is computed ONCE on the driver
  * (m·ksub·subdim flops total) and enters the plan as literal arrays, so
  * each row's approximate similarity is `m` array lookups and a sum —
  * zero per-row float math in d dimensions. The standard serving shape is
  * ADC shortlist → exact rerank of the survivors, which [[adcTopK]]'s
  * `rerankWith` provides.
  *
  * Codebooks are trained with the same pinned-layout seeded spark.ml
  * KMeans as IVF ([[SimilaritySearch.IvfIndex.index]]) so a model is a
  * deterministic function of the data, not of the session's parallelism.
  * Like the IVF index, everything clusters L2-NORMALIZED vectors: cosine
  * ranking then agrees with dot-product ADC, and Euclidean KMeans cells
  * in each subspace minimize exactly the dot-product reconstruction error
  * that ADC incurs.
  */
object ProductQuant {

  import org.apache.spark.ml.clustering.KMeans
  import org.apache.spark.ml.functions.array_to_vector

  /** `codebooks(j)(c)` = subdim-length codeword `c` of subspace `j`. */
  final case class PqModel(
      m: Int,
      ksub: Int,
      subdim: Int,
      codebooks: Array[Array[Array[Double]]]
  ) {
    def dim: Int = m * subdim
    require(codebooks.length == m, s"expected $m codebooks, got ${codebooks.length}")
    require(codebooks.forall(_.length == ksub),
      s"every codebook must have $ksub codewords")
    require(codebooks.forall(_.forall(_.length == subdim)),
      s"every codeword must have $subdim components")
  }

  /** L2-normalized copy of an array<double> column (zero vectors pass
    * through; the norm binds once via the aggregate finish lambda — see
    * the IVF note on the O(d²) transform trap).
    */
  private def l2normalize(v: Column): Column =
    aggregate(v, lit(0.0d), (acc, x) => acc + x * x,
      sumsq => transform(v, x => when(sumsq > 0, x / sqrt(sumsq)).otherwise(x)))

  private def normSlice(vecCol: Column, j: Int, subdim: Int): Column =
    slice(l2normalize(vecCol.cast("array<double>")), j * subdim + 1, subdim)

  /** Train the `m` subspace codebooks. One small seeded KMeans fit per
    * subspace over the pinned-layout frame (hash-repartition on the vector
    * + intra-partition sort, the IVF determinism rule) — the fits share
    * one persisted slice pass, and the model they produce is
    * partition-invariant.
    */
  def fit(
      df: DataFrame,
      dim: Int,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L,
      vecCol: String = "embedding"
  ): PqModel = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val subdim = dim / m
    val pinned = df.repartition(8, col(vecCol)).sortWithinPartitions(col(vecCol))
    val sliced = pinned.select(
      (0 until m).map(j => array_to_vector(normSlice(col(vecCol), j, subdim)).as(s"_s$j")): _*)
    sliced.persist()
    try {
      val codebooks = (0 until m).map { j =>
        val model = new KMeans().setK(ksub).setSeed(seed + j).setFeaturesCol(s"_s$j")
          .fit(sliced)
        model.clusterCenters.map(_.toArray)
      }.toArray
      PqModel(m, ksub, subdim, codebooks)
    } finally { sliced.unpersist(blocking = false); () }
  }

  /** Nearest codeword of subspace `j` for the (normalized) vector slice:
    * argmin over ksub codewords of ‖c‖² − 2·v_j·c (the per-row ‖v_j‖²
    * term is rank-constant), ties to the smallest code — the
    * [[SimilaritySearch.IvfIndex.assign]] rule per subspace.
    */
  private def codeExpr(model: PqModel, vecCol: Column, j: Int): Column = {
    val vj = normSlice(vecCol, j, model.subdim)
    val scored = model.codebooks(j).zipWithIndex.map { case (c, i) =>
      val c2 = c.map(x => x * x).sum
      struct(
        (lit(c2) - lit(2.0) * graft.ops.VectorOps.dot(vj, graft.ops.VectorOps.vecLit(c.toSeq))).as("d"),
        lit(i).as("c"))
    }
    array_min(array(scored: _*)).getField("c")
  }

  /** Attach `pq_code` (array<int> of length m): the stored representation.
    * Pure map-side projection — m·ksub codegen dot products per row, no
    * shuffle.
    */
  def encode(df: DataFrame, model: PqModel, vecCol: String = "embedding"): DataFrame =
    df.withColumn("pq_code",
      array((0 until model.m).map(j => codeExpr(model, col(vecCol), j)): _*))

  /** Reconstructed (normalized-space) vector from a code column — the
    * concatenation of the selected codewords. For diagnostics and
    * re-ranking tests; serving never needs it (ADC works on codes).
    */
  def decode(codeCol: Column, model: PqModel): Column = {
    val parts = (0 until model.m).map { j =>
      val words = model.codebooks(j).map(c => graft.ops.VectorOps.vecLit(c.toSeq))
      element_at(array(words: _*), element_at(codeCol, j + 1) + 1)
    }
    concat(parts: _*)
  }

  /** ADC top-k: approximate cosine = Σ_j lut_j[code_j] where lut_j holds
    * the dot products of the NORMALIZED query slice against subspace j's
    * codewords — m element_at lookups per row. With `rerankWith =
    * Some(vecCol)`, an ADC shortlist of `shortlist` rows is re-scored
    * EXACTLY against the original vectors (the standard refine step; the
    * shortlist is driver-bounded like the IVF query path, so the exact
    * pass touches `shortlist`, not |corpus|, vectors).
    */
  def adcTopK(
      encoded: DataFrame,
      model: PqModel,
      queryVec: Seq[Double],
      topK: Int,
      idCol: String = "vec_id",
      rerankWith: Option[String] = None,
      shortlist: Int = 100
  ): DataFrame = {
    require(queryVec.length == model.dim,
      s"query dim ${queryVec.length} != model dim ${model.dim}")
    val qn = {
      val n = math.sqrt(queryVec.map(x => x * x).sum)
      if (n > 0) queryVec.map(_ / n) else queryVec
    }
    val luts = (0 until model.m).map { j =>
      val qj = qn.slice(j * model.subdim, (j + 1) * model.subdim)
      model.codebooks(j).map(c => c.zip(qj).map { case (a, b) => a * b }.sum)
    }
    val approx = (0 until model.m)
      .map(j => element_at(graft.ops.VectorOps.vecLit(luts(j).toIndexedSeq),
        element_at(col("pq_code"), j + 1) + 1))
      .reduce(_ + _)
    val scored = encoded
      .select(col(idCol), rerankWith.map(col).getOrElse(lit(null)).as("_vec"),
        approx.as("adc_score"))
    rerankWith match {
      case None =>
        scored.select(col(idCol), round(col("adc_score"), 6).as("score"))
          .orderBy(col("score").desc, col(idCol)).limit(topK)
      case Some(_) =>
        val q = graft.ops.VectorOps.vecLit(queryVec)
        scored
          .orderBy(col("adc_score").desc, col(idCol)).limit(shortlist)
          .select(col(idCol),
            round(graft.ops.VectorOps.cosine(col("_vec").cast("array<double>"), q), 6).as("score"))
          .orderBy(col("score").desc, col(idCol)).limit(topK)
    }
  }

  /** IVF ∘ PQ (the IVFADC system of Jégou et al. 2011 §V): the whole-stack
    * 100-TB ANN serving composition. The coarse IVF quantizer prunes the
    * scan to `nprobe/k` of the corpus ROWS (directory-level with a
    * cell-partitioned store, [[graft.ops.SimilaritySearch.IvfIndex.save]]),
    * PQ codes make the scanned BYTES `m` per vector, ADC scores them with
    * broadcast literal tables, and the driver-bounded shortlist reranks
    * exactly. Non-residual variant: codebooks quantize the full normalized
    * vectors rather than cell residuals — one codebook set serves every
    * cell (residual PQ would buy accuracy at the cost of coupling each
    * code to its cell's centroid; the exact rerank step recovers most of
    * that accuracy here, which the recall gate pins).
    */
  case class IvfPq(
      k: Int = 8,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L
  ) {

    /** Build: IVF cell assignment + PQ codes on one frame. Returns the
      * encoded corpus (`cell`, `pq_code` added), the cell centroids, and
      * the PQ model — everything [[query]] needs.
      */
    def index(
        df: DataFrame,
        dim: Int,
        vecCol: String = "embedding"
    ): (DataFrame, Array[Array[Double]], PqModel) = {
      val ivf = graft.ops.SimilaritySearch.IvfIndex(k, nprobe, seed)
      val (cells, centroids) = ivf.index(df)
      val model = fit(df, dim, m, ksub, seed, vecCol)
      (encode(cells, model, vecCol), centroids, model)
    }

    /** Probe the query's `nprobe` nearest cells (Euclidean rank of the
      * normalized query against the centroids — cosine rank on the
      * sphere), then [[adcTopK]] within them. `filter` is the
      * filtered-ANN predicate (see
      * [[graft.ops.SimilaritySearch.IvfIndex.query]]): applied inside the
      * probed cells BEFORE the shortlist, so the returned k all satisfy
      * it.
      */
    def query(
        encoded: DataFrame,
        centroids: Array[Array[Double]],
        model: PqModel,
        queryVec: Seq[Double],
        topK: Int,
        idCol: String = "vec_id",
        rerankWith: Option[String] = None,
        shortlist: Int = 100,
        filter: Option[Column] = None
    ): DataFrame = {
      val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
      val qn    = if (qNorm > 0) queryVec.map(_ / qNorm) else queryVec
      def dist(c: Array[Double]): Double =
        math.sqrt(c.zip(qn).map { case (a, b) => (a - b) * (a - b) }.sum)
      val probed = centroids.zipWithIndex.sortBy(p => dist(p._1)).take(nprobe).map(_._2)
      val scoped = filter.foldLeft(encoded)((df, f) => df.where(f))
      adcTopK(scoped.where(col("cell").isin(probed.toSeq: _*)), model, queryVec,
        topK, idCol, rerankWith, shortlist)
    }

    /** Batch k-NN join through the IVFADC index — for every query vector,
      * its approximate top-k neighbors, at index cost instead of
      * [[graft.ops.SimilaritySearch.knnJoin]]'s full corpus × queries
      * scoring. Per query: the nprobe nearest cells are selected MAP-SIDE
      * (a k-entry literal struct array sorted and sliced per query row —
      * no shuffle, no driver round-trip), the corpus joins on the cell
      * key so only probed cells' rows are scored, approximate scores are
      * dot products against the PQ-DECODED codes, and the per-query
      * shortlist is the bounded partial aggregate
      * [[org.apache.spark.sql.graft.TopKAgg]]. With `rerankWith`, the
      * (|queries| × shortlist)-row candidate frame — broadcast-side by
      * construction — re-scores EXACTLY against the original vectors.
      *
      * Returns (query_id, neighbor_id, score, rank) like the exact
      * knnJoin; scores rounded to 6 before ranking, ties to smaller id.
      */
    def knnJoin(
        encoded: DataFrame,
        centroids: Array[Array[Double]],
        model: PqModel,
        queries: DataFrame,
        k: Int,
        vecCol: String = "embedding",
        corpusIdCol: String = "vec_id",
        queryIdCol: String = "vec_id",
        rerankWith: Option[String] = None,
        shortlist: Int = 50
    ): DataFrame = {
      require(k > 0, s"k must be positive, got $k")
      val cellStructs = centroids.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x * x).sum
        struct(
          (lit(c2) - lit(2.0) * graft.ops.VectorOps.dot(col("_qn"), graft.ops.VectorOps.vecLit(c.toSeq))).as("d"),
          lit(i).as("cell"))
      }
      val sortedCells = array_sort(array(cellStructs: _*))
      val probedCells = array(
        (0 until math.min(nprobe, centroids.length))
          .map(i => element_at(sortedCells, i + 1).getField("cell")): _*)
      val q = queries.select(
          col(queryIdCol).cast("long").as("query_id"),
          col(vecCol).cast("array<double>").as("_qv"))
        .withColumn("_qn", l2normalize(col("_qv")))
        .withColumn("cell", explode(probedCells))
      val approxScore = round(
        graft.ops.VectorOps.dot(col("_qn"), decode(col("pq_code"), model)), 6)
      val short = encoded
        .join(broadcast(q), Seq("cell"))
        .select(col("query_id"),
          col(corpusIdCol).cast("long").as("_nid"), approxScore.as("_s"))
        .groupBy("query_id")
        .agg(org.apache.spark.sql.graft.TopKAgg.topKAgg(
          col("_s"), col("_nid"), if (rerankWith.isDefined) shortlist else k).as("_top"))
      def ranked(scored: DataFrame): DataFrame = scored
        .groupBy("query_id")
        .agg(org.apache.spark.sql.graft.TopKAgg.topKAgg(col("_s"), col("_nid"), k).as("_top"))
        .select(col("query_id"), posexplode(col("_top")).as(Seq("_r", "_e")))
        .select(col("query_id"), col("_e.neighbor_id").as("neighbor_id"),
          col("_e.score").as("score"), (col("_r") + 1).cast("int").as("rank"))
      rerankWith match {
        case None =>
          short.select(col("query_id"), posexplode(col("_top")).as(Seq("_r", "_e")))
            .select(col("query_id"), col("_e.neighbor_id").as("neighbor_id"),
              col("_e.score").as("score"), (col("_r") + 1).cast("int").as("rank"))
        case Some(vc) =>
          val cand = short
            .select(col("query_id"), explode(col("_top")).as("_e"))
            .select(col("query_id"), col("_e.neighbor_id").as("_nid"))
          val cv = encoded.select(
            col(corpusIdCol).cast("long").as("_nid"),
            col(vc).cast("array<double>").as("_cv"))
          ranked(
            cv.join(broadcast(cand), Seq("_nid"))
              .join(broadcast(q.select(col("query_id"), col("_qv")).dropDuplicates("query_id")),
                Seq("query_id"))
              .select(col("query_id"), col("_nid"),
                round(graft.ops.VectorOps.cosine(col("_cv"), col("_qv")), 6).as("_s")))
      }
    }

    /** Persist a built IVFADC index: the encoded corpus written PARTITIONED
      * BY cell (a query's nprobe restriction prunes at the directory
      * level) plus `_centroids` and `_codebooks` text sidecars
      * (`Double.toString` round-trips exactly). Whole-index atomic swap
      * under the maintenance lock, exactly like
      * [[graft.ops.SimilaritySearch.IvfIndex.save]] — a reader can never
      * observe new cells under stale models, and a crash mid-save leaves
      * the previous index intact.
      */
    def save(
        encoded: DataFrame,
        centroids: Array[Array[Double]],
        model: PqModel,
        path: String
    ): Unit = {
      require(centroids.length == k, s"expected $k centroids, got ${centroids.length}")
      require(model.m == m && model.ksub == ksub,
        s"model geometry (m=${model.m}, ksub=${model.ksub}) != handle (m=$m, ksub=$ksub)")
      val spark = encoded.sparkSession
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
        graft.io.AtomicSwap.heal(fs, dir)
        val scratch = graft.io.AtomicSwap.scratch(dir)
        encoded.write.partitionBy("cell").mode("overwrite").parquet(s"$scratch/cells")
        val cOut = fs.create(new org.apache.hadoop.fs.Path(s"$scratch/_centroids"), true)
        try {
          val dim = centroids.headOption.map(_.length).getOrElse(0)
          val sb  = new StringBuilder(s"$k $seed $dim\n")
          centroids.foreach(c => sb.append(c.mkString(" ")).append('\n'))
          cOut.write(sb.toString.getBytes("UTF-8"))
        } finally cOut.close()
        val bOut = fs.create(new org.apache.hadoop.fs.Path(s"$scratch/_codebooks"), true)
        try {
          val sb = new StringBuilder(s"$m $ksub ${model.subdim} $seed\n")
          for (j <- 0 until m; c <- 0 until ksub)
            sb.append(model.codebooks(j)(c).mkString(" ")).append('\n')
          bOut.write(sb.toString.getBytes("UTF-8"))
        } finally bOut.close()
        graft.io.AtomicSwap.swapIn(fs, dir)
      }
    }

    /** Append a batch of new vectors to a [[save]]d IVFADC index: cells
      * come from the stored centroids (the [[graft.ops.SimilaritySearch.IvfIndex.assign]]
      * rule), codes from the stored codebooks — NOTHING refits, so a
      * query immediately serves old ∪ new through the same cell pruning
      * and ADC tables. Same lock and append-atomicity contract as the
      * IVF store's append; interleave with [[IvfIndex.compact]]-style
      * maintenance via the shared maintenance lock.
      */
    def append(
        spark: org.apache.spark.sql.SparkSession,
        path: String,
        df: DataFrame,
        vecCol: String = "embedding"
    ): Unit = {
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs  = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.io.AtomicSwap.withMaintenanceLock(fs, dir) {
        val (_, centroids, model) = load(spark, path)
        val ivf = graft.ops.SimilaritySearch.IvfIndex(k, nprobe, seed)
        encode(ivf.assign(df, centroids, vecCol), model, vecCol)
          .write.partitionBy("cell").mode("append").parquet(s"$path/cells")
      }
    }

    /** Load a [[save]]d index; fails fast on any geometry or seed mismatch
      * with this handle, and on truncated sidecars (a silently short
      * codebook would score every query wrong, not error).
      */
    def load(
        spark: org.apache.spark.sql.SparkSession,
        path: String
    ): (DataFrame, Array[Array[Double]], PqModel) = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def readLines(name: String): Vector[String] = {
        val in = fs.open(new org.apache.hadoop.fs.Path(s"$path/$name"))
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      }
      val cLines  = readLines("_centroids")
      val cHeader = cLines.head.split(" ")
      require(cHeader(0).toInt == k,
        s"index at $path was built with k=${cHeader(0)}, this handle has k=$k")
      require(cHeader(1).toLong == seed,
        s"index at $path was built with seed=${cHeader(1)}, this handle has seed=$seed")
      val centroids = cLines.tail.filter(_.nonEmpty)
        .map(_.split(" ").map(java.lang.Double.parseDouble)).toArray
      require(centroids.length == k,
        s"corrupt index at $path: ${centroids.length} centroid lines, header records k=$k")
      val bLines  = readLines("_codebooks")
      val bHeader = bLines.head.split(" ")
      require(bHeader(0).toInt == m && bHeader(1).toInt == ksub,
        s"index at $path has PQ geometry m=${bHeader(0)} ksub=${bHeader(1)}, " +
          s"this handle has m=$m ksub=$ksub")
      val subdim = bHeader(2).toInt
      val words = bLines.tail.filter(_.nonEmpty)
        .map(_.split(" ").map(java.lang.Double.parseDouble))
      require(words.length == m * ksub,
        s"corrupt index at $path: ${words.length} codeword lines, expected ${m * ksub}")
      require(words.forall(_.length == subdim),
        s"corrupt index at $path: codeword dims ${words.map(_.length).distinct.mkString(",")} " +
          s"vs recorded subdim $subdim")
      val codebooks = words.grouped(ksub).map(_.toArray).toArray
      (spark.read.parquet(s"$path/cells"), centroids, PqModel(m, ksub, subdim, codebooks))
    }
  }
}
