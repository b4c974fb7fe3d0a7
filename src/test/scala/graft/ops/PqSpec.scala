package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("fit is deterministic and partition-invariant; model has the declared shape") {
    val m1 = ProductQuant.fit(emb, dim = 64, m = 8, ksub = 16)
    val m2 = ProductQuant.fit(emb.repartition(13), dim = 64, m = 8, ksub = 16)
    assert(m1.codebooks.length == 8)
    assert(m1.codebooks.forall(_.length == 16))
    assert(m1.codebooks.forall(_.forall(_.length == 8)))
    assert(m1.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq,
      "codebooks must not depend on input partitioning")
  }

  test("encode: codes bounded by ksub, one per subspace, partition-invariant") {
    val model = ProductQuant.fit(emb, dim = 64, m = 8, ksub = 16)
    val c1 = ProductQuant.encode(emb, model)
      .select(col("vec_id"), col("pq_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(c1.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val c2 = ProductQuant.encode(emb.repartition(7), model)
      .select(col("vec_id"), col("pq_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(c1 == c2, "codes must not depend on input partitioning")
  }

  test("decode reconstructs close to the normalized vector (better than a 1-codeword book)") {
    val model = ProductQuant.fit(emb, dim = 64, m = 8, ksub = 16)
    val enc = ProductQuant.encode(emb, model)
    val meanCos = enc.select(
      avg(VectorOps.cosine(col("embedding").cast("array<double>"),
        ProductQuant.decode(col("pq_code"), model)))).head().getDouble(0)
    // uniform-random 64-dim vectors: a trivial quantizer reconstructs near
    // cosine 0; 8 subspaces x 16 codewords must land far above that
    assert(meanCos > 0.5, s"mean reconstruction cosine too low: $meanCos")
  }

  test("ADC+rerank recall@10 vs brute force; reranked scores ARE the exact scores") {
    val q = graft.SparkEntry.benchQueryVec
    val model = ProductQuant.fit(emb, dim = 64, m = 8, ksub = 16)
    val enc = ProductQuant.encode(emb, model).cache()
    val truth = SimilaritySearch.bruteForceTopK(emb, q, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = ProductQuant.adcTopK(enc, model, q, topK = 10,
      rerankWith = Some("embedding"), shortlist = 100).collect()
    val recall = got.map(_.getLong(0)).count(truth.keySet) / 10.0
    assert(recall >= 0.8, s"PQ ADC+rerank recall@10 too low: $recall")
    // refine step scores with the original floats: any returned id that is
    // in the exact top-10 carries the identical rounded cosine
    got.foreach(r => truth.get(r.getLong(0)).foreach(exact =>
      assert(r.getDouble(1) == exact)))
    enc.unpersist()
  }

  test("IvfPq: results come only from probed cells; recall@10 with rerank holds up") {
    val q = graft.SparkEntry.benchQueryVec
    val ivfpq = ProductQuant.IvfPq(k = 8, nprobe = 4, m = 8, ksub = 16)
    val (enc, centroids, model) = ivfpq.index(emb, dim = 64)
    val encC = enc.cache()
    val got = ivfpq.query(encC, centroids, model, q, topK = 10,
      rerankWith = Some("embedding"), shortlist = 100).collect()
    assert(got.nonEmpty && got.length <= 10)
    // every returned id must live in one of the nprobe probed cells — the
    // query can never have touched an unprobed cell's rows
    val qn = { val n = math.sqrt(q.map(x => x * x).sum); q.map(_ / n) }
    val probed = centroids.zipWithIndex
      .sortBy { case (c, _) => math.sqrt(c.zip(qn).map { case (a, b) => (a - b) * (a - b) }.sum) }
      .take(4).map(_._2).toSet
    val cellsOf = encC.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach(r => assert(probed.contains(cellsOf(r.getLong(0)))))
    // composed recall: IVF pruning caps it (q27's gate is 5/10), PQ+rerank
    // must not lose more than IVF already does
    val truth = SimilaritySearch.bruteForceTopK(emb, q, k = 10).collect().map(_.getLong(0)).toSet
    val recall = got.map(_.getLong(0)).count(truth) / 10.0
    assert(recall >= 0.5, s"IVFADC recall@10 too low: $recall")
    encC.unpersist()
  }

  test("IvfPq save/load: exact model roundtrip, identical query results, geometry mismatch fails fast") {
    val q = graft.SparkEntry.benchQueryVec
    val ivfpq = ProductQuant.IvfPq(k = 4, nprobe = 2, m = 8, ksub = 8)
    val (enc, centroids, model) = ivfpq.index(emb.limit(500), dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/idx"
    ivfpq.save(enc, centroids, model, dir)
    val (encL, centroidsL, modelL) = ivfpq.load(spark, dir)
    // Double.toString sidecars round-trip bit-exactly
    assert(centroidsL.flatten.toSeq == centroids.flatten.toSeq)
    assert(modelL.codebooks.flatten.flatten.toSeq == model.codebooks.flatten.flatten.toSeq)
    assert(modelL.subdim == model.subdim)
    val before = ivfpq.query(enc, centroids, model, q, topK = 5,
      rerankWith = Some("embedding")).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val after = ivfpq.query(encL, centroidsL, modelL, q, topK = 5,
      rerankWith = Some("embedding")).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(before == after)
    // a handle with different geometry must refuse the stored index
    intercept[IllegalArgumentException] {
      ProductQuant.IvfPq(k = 4, nprobe = 2, m = 4, ksub = 8).load(spark, dir)
    }
    intercept[IllegalArgumentException] {
      ProductQuant.IvfPq(k = 8, nprobe = 2, m = 8, ksub = 8).load(spark, dir)
    }
  }

  test("IvfPq.knnJoin: self-match at rank 1 with score 1.0; recall vs exact knnJoin holds") {
    val ivfpq = ProductQuant.IvfPq(k = 8, nprobe = 4, m = 8, ksub = 16)
    val (enc, centroids, model) = ivfpq.index(emb, dim = 64)
    val encC = enc.cache()
    val queries = emb.where(col("vec_id") < 5)
    val got = ivfpq.knnJoin(encC, centroids, model, queries, k = 10,
      rerankWith = Some("embedding")).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // a query vector's own cell is always its top probe, so the self-match
    // must surface at rank 1 with exact rerank score 1.0
    byQ.foreach { case (qid, rows) =>
      val r1 = rows.find(_.getInt(3) == 1).get
      assert(r1.getLong(1) == qid && r1.getDouble(2) == 1.0,
        s"query $qid rank-1 is ${r1.getLong(1)} @ ${r1.getDouble(2)}")
    }
    val exact = SimilaritySearch.knnJoin(queries, emb, k = 10).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val totalHits = byQ.map { case (q, rs) => rs.map(_.getLong(1)).count(exact(q)) }.sum
    assert(totalHits >= 25, s"IVFADC batch recall too low: $totalHits/50")
    encC.unpersist()
  }

  test("filtered ANN: predicate applies BEFORE the top-k on both IVF and IVFADC paths") {
    val q = graft.SparkEntry.benchQueryVec
    // IVF path
    val ivf = SimilaritySearch.IvfIndex(k = 8, nprobe = 8) // all cells: isolate the filter
    val (indexed, centroids) = ivf.index(emb)
    val lbl = indexed.where(col("vec_id") === SimilaritySearch
      .bruteForceTopK(emb, q, k = 1).head().getLong(0)).head().getAs[Int]("label")
    val got = ivf.query(indexed, centroids, q, topK = 10, filter = Some(col("label") === lbl))
      .collect()
    assert(got.length == 10, "filtered query must still return k survivors")
    val labelOf = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach(r => assert(labelOf(r.getLong(0)) == lbl))
    // with nprobe = k (no cell pruning) the filtered result IS brute force
    // over the label-restricted corpus
    val brute = SimilaritySearch.bruteForceTopK(emb.where(col("label") === lbl), q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq == brute)
    // IVFADC path: every survivor satisfies the predicate too
    val ivfpq = ProductQuant.IvfPq(k = 8, nprobe = 8, m = 8, ksub = 16)
    val (enc, cts, model) = ivfpq.index(emb, dim = 64)
    val gotPq = ivfpq.query(enc, cts, model, q, topK = 10,
      rerankWith = Some("embedding"), filter = Some(col("label") === lbl)).collect()
    assert(gotPq.nonEmpty)
    gotPq.foreach(r => assert(labelOf(r.getLong(0)) == lbl))
  }

  test("IvfPq append: new vectors join stored cells with stored codebooks and are served") {
    val ivfpq = ProductQuant.IvfPq(k = 4, nprobe = 4, m = 8, ksub = 8)
    val base  = emb.where(col("vec_id") < 400)
    val batch = emb.where(col("vec_id") >= 400)
    val (enc, centroids, model) = ivfpq.index(base, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-append").toString + "/idx"
    ivfpq.save(enc, centroids, model, dir)
    ivfpq.append(spark, dir, batch)
    val (loaded, c1, m1) = ivfpq.load(spark, dir)
    assert(loaded.count() == 500L)
    // an appended vector queried with its own embedding surfaces at rank 1
    // with exact rerank score 1.0
    val probeRow = emb.where(col("vec_id") === 499).head()
    val probe = probeRow.getSeq[Float](probeRow.fieldIndex("embedding")).map(_.toDouble)
    val top = ivfpq.query(loaded, c1, m1, probe, topK = 3,
      rerankWith = Some("embedding")).collect()
    assert(top.head.getLong(0) == 499L && top.head.getDouble(1) == 1.0,
      s"appended vector must be served first: ${top.toSeq}")
    // appended codes use the STORED codebooks: re-encoding the batch with
    // the loaded model reproduces the stored codes exactly
    val stored = loaded.where(col("vec_id") >= 400)
      .select(col("vec_id"), col("pq_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val re = ProductQuant.encode(batch, m1)
      .select(col("vec_id"), col("pq_code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(stored == re)
  }

  test("pure-ADC ordering is sane: the exact nearest neighbor ranks in the ADC shortlist") {
    val q = graft.SparkEntry.benchQueryVec
    val model = ProductQuant.fit(emb, dim = 64, m = 8, ksub = 16)
    val enc = ProductQuant.encode(emb, model)
    val top1 = SimilaritySearch.bruteForceTopK(emb, q, k = 1).head().getLong(0)
    val adc100 = ProductQuant.adcTopK(enc, model, q, topK = 100).collect().map(_.getLong(0)).toSet
    assert(adc100.contains(top1), "exact NN fell outside the ADC top-100")
  }
}
