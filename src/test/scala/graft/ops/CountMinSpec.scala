package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {

  private def tokens(n: Int) = {
    import spark.implicits._
    // zipfy-ish synthetic stream: token i repeated (n / i) times
    (1 to n).flatMap(i => Seq.fill(n / i)(s"tok$i")).toDF("token")
  }

  test("estimates never undercount and equal the bucket-sum closed form") {
    import spark.implicits._
    val df = tokens(40)
    val exact = df.groupBy("token").agg(count(lit(1)).as("n"))
    val sk = CountMin.sketch(df, col("token"), depth = 4, width = 64, hash = Md5Hash)
    val got = exact.crossJoin(broadcast(sk))
      .select(col("token"), col("n"),
        CountMin.estimate(col("cms"), col("token"), depth = 4, width = 64, hash = Md5Hash)
          .as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.forall { case (_, n, est) => est >= n })
    // closed form: counter(r,b) = Σ n over tokens hashing to b in row r
    val counts = exact.collect().map(r => r.getString(0) -> r.getLong(1))
    def md5bucket(seed: Int, s: String, w: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$s".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % w).toInt
    }
    val expected = counts.map { case (t, n) =>
      t -> (0 until 4).map { r =>
        counts.filter { case (u, _) => md5bucket(100 + r, u, 64) == md5bucket(100 + r, t, 64) }
          .map(_._2).sum
      }.min
    }.toMap
    got.foreach { case (t, _, est) => assert(est == expected(t), s"token $t") }
  }

  test("sketch is partitioning-invariant (linear merge)") {
    import spark.implicits._
    val df = tokens(30)
    val a = CountMin.sketch(df, col("token"), hash = Md5Hash)
      .collect().head.getSeq[Long](0)
    val b = CountMin.sketch(df.repartition(13), col("token"), hash = Md5Hash)
      .collect().head.getSeq[Long](0)
    assert(a == b)
    // total mass per sketch row = number of input rows
    val rows = df.count()
    (0 until 4).foreach(r => assert(a.slice(r * 256, (r + 1) * 256).sum == rows))
  }

  test("join-size estimate: one-sided bound, exact when collision-free") {
    import spark.implicits._
    val a = (1 to 20).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i")).toDF("k")
    val b = (5 to 30).flatMap(i => Seq.fill(i % 2 + 1)(s"k$i")).toDF("k")
    val exact = a.join(b, Seq("k")).count()
    // tight sketch (few keys, wide rows): collision-free → est == exact
    val wide = CountMin.joinSizeEstimate(
      CountMin.sketch(a, col("k"), depth = 4, width = 1024, hash = Md5Hash),
      CountMin.sketch(b, col("k"), depth = 4, width = 1024, hash = Md5Hash),
      depth = 4, width = 1024).collect().head.getLong(0)
    assert(wide == exact, s"collision-free sketch must be exact: $wide vs $exact")
    // cramped sketch: collisions only ADD mass — still >= exact
    val narrow = CountMin.joinSizeEstimate(
      CountMin.sketch(a, col("k"), depth = 2, width = 4, hash = Md5Hash),
      CountMin.sketch(b, col("k"), depth = 2, width = 4, hash = Md5Hash),
      depth = 2, width = 4).collect().head.getLong(0)
    assert(narrow >= exact)
  }

  test("join-size estimate: disjoint key sets estimate low (usually zero)") {
    import spark.implicits._
    val a = (1 to 10).map(i => s"a$i").toDF("k")
    val b = (1 to 10).map(i => s"b$i").toDF("k")
    val est = CountMin.joinSizeEstimate(
      CountMin.sketch(a, col("k"), depth = 4, width = 256, hash = Md5Hash),
      CountMin.sketch(b, col("k"), depth = 4, width = 256, hash = Md5Hash))
      .collect().head.getLong(0)
    // 10×10 keys in 256 buckets: a cross-collision in all 4 rows is vanishingly
    // unlikely; the deterministic md5 family makes this a fixed fact, not flake
    assert(est == 0L, s"disjoint sides should estimate 0, got $est")
  }

  test("countmin_agg is registered for SQL with literal depth/width") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    tokens(10).createOrReplaceTempView("cms_toks")
    val arr = spark.sql(
      """SELECT countmin_agg(array(pmod(xxhash64('100:' || token), 32),
        |                          pmod(xxhash64('101:' || token), 32)), 2, 32) AS cms
        |FROM cms_toks""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(arr.length == 64 && arr.sum == tokens(10).count() * 2)
  }
}
