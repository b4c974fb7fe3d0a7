package graft.meta

import java.net.{HttpURLConnection, URI}

import graft.SparkSpec

/** Loopback-port spec for the metadata HTTP face — parity with the
  * reference's MgmtApi `/info` (schema + error envelope).
  */
class MetaServerSpec extends SparkSpec {

  private def httpGet(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try (conn.getResponseCode, new String(conn.getInputStream.readAllBytes(), "UTF-8"))
    finally conn.disconnect()
  }

  private def httpPost(url: String, body: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    try {
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      (conn.getResponseCode, new String(conn.getInputStream.readAllBytes(), "UTF-8"))
    } finally conn.disconnect()
  }

  test("GET /info serves the store schema; /health answers; errors are enveloped") {
    import spark.implicits._
    val work = tempDir("meta-http")
    Seq((101L, "objA", 2019, 2, 1)).toDF("id", "objectId", "year", "month", "day")
      .write.parquet(s"$work/ids/vertices")
    Seq((101L, 102L, 3)).toDF("src", "dst", "propVal")
      .write.parquet(s"$work/edges/label=similarity")

    val other = tempDir("meta-http-2")
    Seq((7L, 8L, "x")).toDF("src", "dst", "propVal")
      .write.parquet(s"$other/edges/label=exactmatch")

    val srv = new MetaServer(spark, s"$work/ids/vertices", s"$work/edges",
      allowedPathRoots = Seq(other))
    val port = srv.start()
    try {
      val (st, body) = httpGet(s"http://127.0.0.1:$port/info")
      assert(st == 200)
      assert(body.contains(""""edgeLabels":["similarity"]"""), body)
      assert(body.contains(""""name":"id","dataType":"bigint""""), body)
      assert(body.contains(""""error":""""), body)

      // POST body overrides the stores per request (reference: tableName),
      // confined to the allowed roots
      val (st2, body2) = httpPost(
        s"http://127.0.0.1:$port/info",
        s"""{"vertexPath": "$other/none", "edgePath": "$other/edges"}""")
      assert(st2 == 200)
      assert(body2.contains(""""edgeLabels":["exactmatch"]"""), body2)
      assert(body2.contains(""""vertexLabels":[]"""), body2) // missing vertex table -> empty, no error

      val (st3, health) = httpGet(s"http://127.0.0.1:$port/health")
      assert(st3 == 200 && health.contains("ok"))

      // malformed body: enveloped error, not a 500
      val (st4, body4) = httpPost(s"http://127.0.0.1:$port/info", "{ not json !")
      assert(st4 == 200 && body4.contains(""""error":"graft.config"""), body4)
    } finally srv.stop()
  }

  test("/info dataType strings cover every schema type: binary/bool/ts/date/float pin exactly") {
    import org.apache.spark.sql.functions._
    val work = tempDir("meta-http-types")
    // one vertex table exercising the full §1.2 type surface the
    // reference's InfoService reports (InfoServiceSpec's schema contract)
    spark.range(1).select(
      col("id"),
      lit(7).cast("int").as("i"),
      lit("s").as("name"),
      lit(1.5).as("d"),
      lit(2.5f).as("f"),
      lit(true).as("flag"),
      lit(Array[Byte](1, 2)).as("payload"),
      lit("2020-01-02 03:04:05").cast("timestamp").as("ts"),
      lit("2020-01-02").cast("date").as("day")
    ).write.parquet(s"$work/ids/vertices")

    val info = SchemaInfo.describe(spark, s"$work/ids/vertices", s"$work/edges")
    val types = info.vertexPropertyKeys.map(p => p.name -> p.dataType).toMap
    assert(types == Map(
      "id" -> "bigint", "i" -> "int", "name" -> "string", "d" -> "double",
      "f" -> "float", "flag" -> "boolean", "payload" -> "binary",
      "ts" -> "timestamp", "day" -> "date"), types.toString)

    // the HTTP face serves the same pairs verbatim
    val srv = new MetaServer(spark, s"$work/ids/vertices", s"$work/edges")
    val port = srv.start()
    try {
      val (st, body) = httpGet(s"http://127.0.0.1:$port/info")
      assert(st == 200)
      types.foreach { case (n, t) =>
        assert(body.contains(s""""name":"$n","dataType":"$t""""), s"missing $n:$t in $body")
      }
      assert(body.contains(""""vertexLabels":["alert"]"""), body)
    } finally srv.stop()
  }

  test("path overrides outside the allowed roots are refused (403 + envelope)") {
    import spark.implicits._
    val work = tempDir("meta-http-sec")
    Seq((101L, 102L, 3)).toDF("src", "dst", "propVal")
      .write.parquet(s"$work/edges/label=similarity")
    val srv = new MetaServer(spark, s"$work/ids/vertices", s"$work/edges")
    val port = srv.start()
    try {
      def errOf(url: String, body: Option[String]): Int = {
        val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
        body.foreach { b =>
          conn.setRequestMethod("POST"); conn.setDoOutput(true)
          conn.getOutputStream.write(b.getBytes("UTF-8"))
        }
        try conn.getResponseCode finally conn.disconnect()
      }
      // arbitrary filesystem paths (GET and POST), traversal out of a root,
      // and path-shaped labels are all refused
      assert(errOf(s"http://127.0.0.1:$port/info?vertexPath=/etc", None) == 403)
      assert(errOf(s"http://127.0.0.1:$port/info",
        Some("""{"edgePath": "/etc"}""")) == 403)
      assert(errOf(s"http://127.0.0.1:$port/info",
        Some(s"""{"vertexPath": "$work/edges/../../.."}""")) == 403)
      assert(errOf(s"http://127.0.0.1:$port/info",
        Some("""{"vertexLabel": "../../../etc"}""")) == 403)
      // in-root overrides still work
      val (stOk, _) = httpGet(s"http://127.0.0.1:$port/info?edgePath=$work/edges")
      assert(stOk == 200)

      // a symlink PLANTED UNDER an allowed root must not alias targets
      // outside it: the compare is on the resolved (real) path, not the
      // lexical one
      val link = java.nio.file.Paths.get(work, "edges", "sneaky")
      java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get("/etc"))
      try {
        assert(errOf(s"http://127.0.0.1:$port/info?edgePath=$work/edges/sneaky", None) == 403)
        // ...including non-existent suffixes below the link
        assert(errOf(s"http://127.0.0.1:$port/info?edgePath=$work/edges/sneaky/sub", None) == 403)
      } finally java.nio.file.Files.delete(link)

      // scheme-qualified spellings of an in-root path are the SAME path,
      // not a literal mismatch: file:// must neither bypass confinement
      // nor 403 a legitimate root
      val (stQ, _) = httpGet(s"http://127.0.0.1:$port/info?edgePath=file://$work/edges")
      assert(stQ == 200, "scheme-qualified in-root override must pass")
      assert(errOf(s"http://127.0.0.1:$port/info?edgePath=file:///etc", None) == 403)
    } finally srv.stop()
  }
}
