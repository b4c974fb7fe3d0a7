package graft.rules

import graft.{Alert, SparkSpec}

/** Cross-classifier invariants from the reference's rule contract
  * (VertexClassifierRule.scala:25-33): output columns are (src, dst,
  * propVal); `src` comes from the current batch; similarity edges satisfy
  * src > dst (the id1 > id2 dedup); no self-edges. Randomized over several
  * alert batches (seeded).
  */
class InvariantSpec extends SparkSpec {

  private def randomAlerts(seed: Int, ids: Range): Seq[Alert] = {
    val rng = new scala.util.Random(seed)
    val objects = Vector("objA", "objB", "objC", "objD")
    val cds     = Vector("Unknown", "C*", "AGN", "WD*")
    ids.map { i =>
      Alert.gen(
        i.toLong,
        objects(rng.nextInt(objects.size)),
        rng.nextDouble(),
        rng.nextDouble(),
        rng.nextInt(4),
        rng.nextFloat(),
        cds(rng.nextInt(cds.size)),
        if (rng.nextBoolean()) Some("ML") else None,
        if (rng.nextBoolean()) Some("ML") else None
      )
    }
  }

  test("similarity edges: src from current, src > dst, no self edges, value >= 1") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val loaded  = randomAlerts(seed, 1 to 20).toDF()
      val current = randomAlerts(seed + 100, 21 to 40).toDF()
      val rule = new SimilarityClassifier(
        SimilarityConfig("objectId OR cdsxmatch OR rfscore OR roid"))
      val edges = rule.classify(loaded, current).collect()
      val currentIds = (21L to 40L).toSet
      edges.foreach { r =>
        val (src, dst, v) = (r.getLong(0), r.getLong(1), r.getInt(2))
        assert(currentIds(src), s"src $src not from current batch (seed $seed)")
        assert(src > dst, s"src $src <= dst $dst")
        assert(v >= 1, s"edge with similarity $v")
      }
    }
  }

  test("same-value edges: src from current, no self edges, propVal names the column") {
    import spark.implicits._
    val loaded  = randomAlerts(7, 1 to 15).toDF()
    val current = randomAlerts(8, 16 to 30).toDF()
    val rule  = new SameValueClassifier(SameValueSimilarityConfig(List("cdsxmatch")))
    val edges = rule.classify(loaded, current).collect()
    assert(edges.nonEmpty)
    val currentIds = (16L to 30L).toSet
    edges.foreach { r =>
      assert(currentIds(r.getLong(0)))
      assert(r.getLong(0) != r.getLong(1))
      assert(r.getString(2) == "cdsxmatch")
    }
  }

  test("two-mode edges: src from current, dst only fixed-vertex ids") {
    import spark.implicits._
    val current = randomAlerts(9, 1 to 25).toDF()
    val fixed = List(
      FixedVertex(1L, "s", List(FixedVertexProperty("recipe", "string", "microlensing"))),
      FixedVertex(2L, "s", List(FixedVertexProperty("recipe", "string", "asteroids"))),
      FixedVertex(3L, "s", List(FixedVertexProperty("recipe", "string", "catalog"),
        FixedVertexProperty("equals", "string", "AGN"))))
    val rule = new TwoModeClassifier(
      TwoModeSimilarityConfig(List("microlensing", "asteroids", "catalog")), fixed)
    val edges = rule.classify(current.limit(0), current).collect()
    assert(edges.nonEmpty)
    edges.foreach { r =>
      assert((1L to 25L).contains(r.getLong(0)))
      assert(Set(1L, 2L, 3L)(r.getLong(1)))
    }
  }
}
