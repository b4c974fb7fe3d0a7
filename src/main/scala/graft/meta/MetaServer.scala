package graft.meta

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** Thin HTTP face over [[SchemaInfo]] — parity with the reference's
  * management API (api/.../MgmtApi.scala:35-50, `POST /info` returning
  * `InfoResponse(schema, error)`), built on the JDK's
  * `com.sun.net.httpserver` so it adds zero dependencies.
  *
  * Routes:
  *  - `GET /info` — schema of the configured vertex/edge stores
  *  - `POST /info` — JSON body may override the store paths, the analogue
  *    of the reference's per-request `tableName`:
  *    `{"vertexPath": "...", "edgePath": "...", "vertexLabel": "alert"}`
  *  - `GET /health` — liveness probe
  *
  * Response: `{"schema": <SchemaInfo JSON>, "error": ""}`; failures return
  * an empty schema plus the error message, mirroring the reference's
  * catchAll (MgmtApi.scala:47-48).
  *
  * Security: per-request path overrides are confined to the configured
  * store paths plus `allowedPathRoots` — otherwise any HTTP client could
  * read the Parquet schema/partition metadata of ANY path the server
  * process can reach (a local-file/SSRF disclosure vector). Out-of-root
  * overrides get a 403 with the error envelope. The default bind is
  * loopback; binding a non-loopback `host` exposes the metadata of
  * everything under the allowed roots to the network.
  *
  * Scale notes: requests read Parquet footers and directory listings only —
  * no data scan, no Spark job (safe to point at a 100 TB store).
  */
class MetaServer(
    spark: SparkSession,
    vertexTablePath: String,
    edgeBasePath: String,
    vertexLabel: String = "alert",
    host: String = "127.0.0.1",
    port: Int = 0,
    allowedPathRoots: Seq[String] = Nil
) {

  /** Canonical form used for the confinement compare: Hadoop-qualified
    * (scheme + authority resolved against the server's filesystem config,
    * so `file:///x`, `/x`, and `file:/x` all compare equal) and, for local
    * paths, symlink-resolved via `toRealPath` — a symlink planted under an
    * allowed root cannot alias a target outside it. Non-existent suffixes
    * are resolved against their deepest existing ancestor (the root itself
    * may not exist yet; the attack needs an existing link to follow).
    */
  private def canonical(p: String): String = {
    val hPath     = new org.apache.hadoop.fs.Path(p)
    val fs        = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(hPath)
    if (qualified.toUri.getScheme == "file") {
      import java.nio.file.{Files, Paths => JPaths}
      val nio = JPaths.get(qualified.toUri.getPath).normalize
      val real =
        try nio.toRealPath()
        catch {
          case _: java.io.IOException =>
            var base = nio.getParent
            while (base != null && !Files.exists(base)) base = base.getParent
            if (base == null) nio
            else
              try base.toRealPath().resolve(base.relativize(nio)).normalize
              catch { case _: java.io.IOException => nio }
        }
      "file:" + real.toString
    } else qualified.toUri.toString
  }

  // roots a per-request override may point under; the configured stores
  // are always allowed
  private val pathRoots: Seq[String] =
    (Seq(vertexTablePath, edgeBasePath) ++ allowedPathRoots).map(canonical)

  private def underAllowedRoot(p: String): Boolean = {
    val canon = canonical(p)
    pathRoots.exists(r => canon == r || canon.startsWith(r + "/"))
  }

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(host, port), 0)

  private val emptySchema =
    SchemaInfo(Nil, Nil, Nil, Map.empty)

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case '\n'           => "\\n"
      case '\r'           => "\\r"
      case '\t'           => "\\t"
      case c if c < ' '   => f"\\u${c.toInt}%04x"
      case c              => c.toString
    }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes)
    finally os.close()
  }

  private def handleInfo(ex: HttpExchange): Unit = {
    // request-level path overrides: GET query params or POST JSON body
    // (Hocon.parse accepts JSON — it's a subset of the config grammar)
    val overrides: Map[String, String] =
      if (ex.getRequestMethod == "POST") {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        if (body.trim.isEmpty) Map.empty
        else
          graft.config.Hocon.parse(body).collect { case (k, v: String) => k -> v }
      } else
        Option(ex.getRequestURI.getQuery).toList
          .flatMap(_.split('&').toList)
          .flatMap { kv =>
            kv.split("=", 2) match {
              case Array(k, v) =>
                Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
              case _ => None
            }
          }
          .toMap
    // confine overrides to the allowed roots (see class doc); labels must
    // be plain names, not path fragments
    val badPaths = Seq("vertexPath", "edgePath")
      .flatMap(k => overrides.get(k).filterNot(underAllowedRoot).map(k -> _))
    val badLabel = overrides.get("vertexLabel")
      .filter(l => l.contains('/') || l.contains('\\') || l.contains(".."))
      .map("vertexLabel" -> _)
    (badPaths ++ badLabel) match {
      case (k, v) :: _ =>
        respond(ex, 403,
          s"""{"schema":${SchemaInfo.toJson(emptySchema)},"error":"${jsonEscape(
            s"$k override '$v' is outside the allowed store roots")}"}""")
      case Nil =>
        val info = SchemaInfo.describe(
          spark,
          overrides.getOrElse("vertexPath", vertexTablePath),
          overrides.getOrElse("edgePath", edgeBasePath),
          overrides.getOrElse("vertexLabel", vertexLabel)
        )
        respond(ex, 200, s"""{"schema":${SchemaInfo.toJson(info)},"error":""}""")
    }
  }

  server.createContext(
    "/info",
    (ex: HttpExchange) =>
      try handleInfo(ex)
      catch {
        case t: Throwable => // mirror the reference: empty schema + error text
          respond(
            ex,
            200,
            s"""{"schema":${SchemaInfo.toJson(emptySchema)},"error":"${jsonEscape(t.toString)}"}""")
      }
  )
  server.createContext(
    "/health",
    (ex: HttpExchange) => respond(ex, 200, """{"status":"ok"}"""))

  /** Starts the server; returns the bound port (useful with `port = 0`). */
  def start(): Int = {
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)
}
