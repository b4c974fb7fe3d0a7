package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.io.DataFormat

/** Mirrors the reference's ConfigSpec (common/src/test/.../ConfigSpec.scala:
  * 12-90): the full application.conf round-trips into typed config, and an
  * invalid file fails loudly — plus parser-level specs for the HOCON subset.
  */
class ConfigSpec extends AnyFunSuite {

  // the reference's test application.conf shape, adapted to the Parquet
  // edge store (JanusGraph storage blocks are accepted and ignored)
  private val conf = """
    |reader {
    |  basePath = "/test/base/path"
    |  format = "parquet"
    |  keepCols = ["objectId", "schemavsn"]
    |  keepColsRenamed =
    |    [ { "f": "mulens.class_1", "t": "mulens_class_1" },
    |      { "f": "mulens.class_2", "t": "mulens_class_2" }
    |    ]
    |  newCols = [ { name = "rowkey", expr = "objectId || '_' || candid" } ]
    |}
    |
    |idManager {
    |  spark {
    |    reservedIdSpace = 10
    |    dataPath = "/test/intermediate/base/path"
    |    clearOnDelete = false
    |  }
    |  hbase {  # ignored block (S10 conscious omission)
    |    tableName = "IDManagement"
    |    cf = "cf1"
    |    qualifier = "id"
    |  }
    |}
    |
    |edgeStore {
    |  basePath = "/test/edges"
    |  bidirectional = true
    |}
    |
    |janusgraph {
    |  vertexLoader {
    |    batchSize = 10
    |    label = "alert"
    |    fixedVertices = "fixedvertices.csv"
    |  }
    |  edgeLoader = {
    |    batchSize = 100
    |    parallelism = 10
    |    taskSize = 25000
    |    loadedDays = 7
    |    rulesToApply = ["similarityClassifer", "sameValueClassifier"]
    |    rules {
    |      similarityClassifer {   // reference config-key typo, must parse
    |        similarityExp = "rfscore OR objectId"
    |      }
    |      sameValueClassifier {
    |        colsToConnect = ["objectId"]
    |        maxGroupSize = 1000
    |      }
    |      twoModeClassifier {
    |        recipes = ["supernova", "asteroids"]
    |      }
    |    }
    |  }
    |  storage {
    |    host: "127.0.0.1"
    |    port: 8182
    |    tableName = "TestJanusGraph"
    |    extraConf = ["zookeeper.recovery.retry=3"]
    |  }
    |}
    |
    |hbase {
    |  zookeeper {
    |    quoram = "localhost"
    |  }
    |}
    |""".stripMargin

  test("full reference-shaped config round-trips into GraftConfig") {
    val cfg = ConfigLoader.fromTree(Hocon.parse(conf))
    assert(cfg.reader.basePath == "/test/base/path")
    assert(cfg.reader.format == DataFormat.Parquet)
    assert(cfg.reader.keepCols == List("objectId", "schemavsn"))
    assert(cfg.reader.keepColsRenamed == List(
      ("mulens.class_1", "mulens_class_1"), ("mulens.class_2", "mulens_class_2")))
    assert(cfg.reader.newCols == List(("rowkey", "objectId || '_' || candid")))
    assert(cfg.idManager.dataPath == "/test/intermediate/base/path")
    assert(cfg.idManager.reservedIdSpace == 10L)
    assert(cfg.idManager.tableName == "vertices")
    assert(cfg.edgeBasePath == "/test/edges")
    assert(cfg.bidirectionalEdges)
    assert(cfg.rules.rulesToApply == List("similarityClassifer", "sameValueClassifier"))
    assert(cfg.rules.similarity.map(_.similarityExp).contains("rfscore OR objectId"))
    assert(cfg.rules.sameValue.exists(c =>
      c.colsToConnect == List("objectId") && c.maxGroupSize.contains(1000)))
    assert(cfg.rules.twoMode.map(_.recipes).contains(List("supernova", "asteroids")))
    assert(cfg.rules.fixedVertexCsvPath.contains("fixedvertices.csv"))
    assert(cfg.loadedDays.contains(7))
  }

  test("config file loads from disk and builds runnable rules") {
    val f = java.nio.file.Files.createTempFile("graft", ".conf")
    java.nio.file.Files.writeString(f, conf)
    val cfg = ConfigLoader.load(f.toString)
    assert(cfg.reader.basePath == "/test/base/path")
    // the typo'd rule key must still construct a live classifier
    val rules = new graft.job.GraftJob(graft.SparkTestEnv.spark, cfg).buildRules()
    assert(rules.size == 2)
  }

  test("invalid config fails loudly: missing sections, bad types, bad format") {
    // missing required reader.basePath
    assertThrows[ConfigLoader.ConfigError](
      ConfigLoader.fromTree(Hocon.parse("reader { format = parquet }")))
    // missing required sections entirely
    assertThrows[ConfigLoader.ConfigError](ConfigLoader.fromTree(Hocon.parse("a = 1")))
    // wrong type
    assertThrows[ConfigLoader.ConfigError](ConfigLoader.fromTree(Hocon.parse(
      """reader { basePath = ["not", "a", "string"] }""")))
    // unknown format value
    assertThrows[ConfigLoader.ConfigError](ConfigLoader.fromTree(Hocon.parse(
      """reader { basePath = "/x", format = "orc" }
        |idManager { spark { dataPath = "/y" } }
        |edgeStore { basePath = "/z" }""".stripMargin)))
    // unreadable file
    assertThrows[Hocon.HoconParseException](ConfigLoader.load("/no/such/file.conf"))
  }

  test("HOCON subset: separators, comments, dotted keys, merge, typing") {
    val m = Hocon.parse("""
      |# hash comment
      |a.b.c = 1          // slash comment
      |a.b.d = "x"
      |a { b { e = true } }
      |list = [1, 2.5, "three"
      |        four]
      |neg = -7
      |nul = null
      |""".stripMargin)
    val ab = m("a").asInstanceOf[Map[String, Any]]("b").asInstanceOf[Map[String, Any]]
    assert(ab("c") == 1L && ab("d") == "x" && ab("e") == true) // dotted + braced merge
    assert(m("list") == List(1L, 2.5, "three", "four"))        // comma AND newline separation
    assert(m("neg") == -7L && m("nul") == null)
  }

  test("HOCON subset: malformed input fails with a parse error") {
    assertThrows[Hocon.HoconParseException](Hocon.parse("a = { b = 1"))    // unclosed object
    assertThrows[Hocon.HoconParseException](Hocon.parse("a = [1, 2"))      // unclosed array
    assertThrows[Hocon.HoconParseException](Hocon.parse("""a = "unterm""")) // unterminated string
    assertThrows[Hocon.HoconParseException](Hocon.parse("= 1"))            // missing key
    assertThrows[Hocon.HoconParseException](Hocon.parse("a b"))            // key without separator
    assertThrows[Hocon.HoconParseException](Hocon.parse("a = 1 }"))        // unbalanced brace
  }
}
