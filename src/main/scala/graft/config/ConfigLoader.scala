package graft.config

import graft.ids.IdManagerConfig
import graft.io.{DataFormat, ReaderConfig}
import graft.job.{GraftConfig, RulesConfig}
import graft.rules.{SameValueSimilarityConfig, SimilarityConfig, TwoModeSimilarityConfig}

/** Maps a parsed HOCON tree onto [[graft.job.GraftConfig]] — the config-file
  * UX of the reference (README.md:33-57; pureconfig load at
  * common/.../models/Config.scala:116-136), re-expressed for the Parquet
  * vertex/edge stores.
  *
  * Accepted surface (reference names preserved; JanusGraph-specific blocks
  * are ignored if present):
  * {{{
  * reader {
  *   basePath = "/data/alerts"        # required
  *   format = parquet                  # parquet | csv | json
  *   keepCols = ["objectId", ...]
  *   keepColsRenamed = [ { f = "mulens.class_1", t = "mulens_class_1" } ]
  *   newCols = [ { name = "rowkey", expr = "objectId || '_' || candid" } ]
  *   options = { header = "true" }     # format options (graft extension)
  * }
  * idManager { spark {
  *   dataPath = "/data/ids"            # required
  *   tableName = "vertices"            # graft extension, default "vertices"
  *   reservedIdSpace = 200
  * } }
  * edgeStore {                          # graft: Parquet edge sink (the
  *   basePath = "/data/edges"          # reference's "Option 4" storage)
  *   bidirectional = true
  * }
  * edgeLoader {                         # top-level, or under job/janusgraph
  *   loadedDays = 7                     # graft: loaded-side date horizon
  *   rulesToApply = ["similarityClassifier", ...]
  *   rules {
  *     similarityClassifier { similarityExp = "rfscore OR objectId" }
  *     similarityClassifer { ... }     # reference config-key typo accepted
  *     sameValueClassifier { colsToConnect = ["objectId"], maxGroupSize = 1000 }
  *     twoModeClassifier { recipes = ["supernova"] }
  *   }
  * }
  * vertexLoader { fixedVertices = "/path/fixed.csv" }
  * }}}
  */
object ConfigLoader {

  final case class ConfigError(path: String, msg: String)
      extends IllegalArgumentException(s"config error at '$path': $msg")

  def load(path: String): GraftConfig = fromTree(Hocon.parseFile(path))

  def fromTree(root: Map[String, Any]): GraftConfig = {
    val reader = obj(root, "reader")

    val format = optStr(reader, "reader", "format").getOrElse("parquet") match {
      case "parquet" => DataFormat.Parquet
      case "csv"     => DataFormat.Csv
      case "json"    => DataFormat.Json
      case other     => throw ConfigError("reader.format", s"unknown format '$other'")
    }

    val readerConfig = ReaderConfig(
      basePath = str(reader, "reader", "basePath"),
      format = format,
      keepCols = strList(reader, "reader", "keepCols"),
      keepColsRenamed = objList(reader, "reader", "keepColsRenamed").map { o =>
        (str(o, "reader.keepColsRenamed", "f"), str(o, "reader.keepColsRenamed", "t"))
      },
      newCols = objList(reader, "reader", "newCols").map { o =>
        (str(o, "reader.newCols", "name"), str(o, "reader.newCols", "expr"))
      },
      options = optObj(reader, "options").getOrElse(Map.empty).map {
        case (k, v) => k -> String.valueOf(v)
      }
    )

    // reference nesting: idManager.spark.dataPath (Config.scala IDManagerConfig)
    val idmSpark = obj(obj(root, "idManager"), "idManager.spark")
    val idManagerConfig = IdManagerConfig(
      dataPath = str(idmSpark, "idManager.spark", "dataPath"),
      tableName = optStr(idmSpark, "idManager.spark", "tableName").getOrElse("vertices"),
      reservedIdSpace = optLong(idmSpark, "idManager.spark", "reservedIdSpace").getOrElse(200L)
    )

    val edgeStore = obj(root, "edgeStore")
    val edgeBasePath = str(edgeStore, "edgeStore", "basePath")
    val bidirectional = optBool(edgeStore, "edgeStore", "bidirectional").getOrElse(true)

    // the reference moves edgeLoader/vertexLoader between job and janusgraph
    // blocks across versions — accept all three nestings
    def section(name: String): Map[String, Any] =
      List(root, optObj(root, "job").getOrElse(Map.empty), optObj(root, "janusgraph").getOrElse(Map.empty))
        .flatMap(m => optObj(m, name))
        .foldLeft(Map.empty[String, Any])(_ ++ _)

    val edgeLoader = section("edgeLoader")
    val rules      = optObj(edgeLoader, "rules").getOrElse(Map.empty)

    // reference quirk: the similarity rule's config key is misspelled
    // 'similarityClassifer' (Config.scala:70); accept both spellings
    val similarity = optObj(rules, "similarityClassifier")
      .orElse(optObj(rules, "similarityClassifer"))
      .map(o => SimilarityConfig(str(o, "edgeLoader.rules.similarityClassifier", "similarityExp")))

    val sameValue = optObj(rules, "sameValueClassifier").map { o =>
      SameValueSimilarityConfig(
        colsToConnect = strList(o, "edgeLoader.rules.sameValueClassifier", "colsToConnect"),
        maxGroupSize = optLong(o, "edgeLoader.rules.sameValueClassifier", "maxGroupSize").map(_.toInt)
      )
    }

    val twoMode = optObj(rules, "twoModeClassifier").map { o =>
      TwoModeSimilarityConfig(strList(o, "edgeLoader.rules.twoModeClassifier", "recipes"))
    }

    val rulesConfig = RulesConfig(
      rulesToApply = strList(edgeLoader, "edgeLoader", "rulesToApply"),
      similarity = similarity,
      sameValue = sameValue,
      twoMode = twoMode,
      fixedVertexCsvPath = optStr(section("vertexLoader"), "vertexLoader", "fixedVertices")
    )

    GraftConfig(
      reader = readerConfig,
      idManager = idManagerConfig,
      edgeBasePath = edgeBasePath,
      rules = rulesConfig,
      bidirectionalEdges = bidirectional,
      loadedDays = optLong(edgeLoader, "edgeLoader", "loadedDays").map(_.toInt)
    )
  }

  // ------------------------------------------------------ typed accessors

  private def obj(m: Map[String, Any], path: String): Map[String, Any] =
    m.get(path.split('.').last) match {
      case Some(o: Map[String, Any] @unchecked) => o
      case Some(other)                          => throw ConfigError(path, s"expected an object, got $other")
      case None                                 => throw ConfigError(path, "missing required section")
    }

  private def optObj(m: Map[String, Any], key: String): Option[Map[String, Any]] =
    m.get(key).collect { case o: Map[String, Any] @unchecked => o }

  private def str(m: Map[String, Any], section: String, key: String): String =
    optStr(m, section, key).getOrElse(throw ConfigError(s"$section.$key", "missing required value"))

  private def optStr(m: Map[String, Any], section: String, key: String): Option[String] =
    m.get(key).map {
      case s: String => s
      case other     => throw ConfigError(s"$section.$key", s"expected a string, got $other")
    }

  private def optLong(m: Map[String, Any], section: String, key: String): Option[Long] =
    m.get(key).map {
      case l: Long => l
      case other   => throw ConfigError(s"$section.$key", s"expected an integer, got $other")
    }

  private def optBool(m: Map[String, Any], section: String, key: String): Option[Boolean] =
    m.get(key).map {
      case b: Boolean => b
      case other      => throw ConfigError(s"$section.$key", s"expected a boolean, got $other")
    }

  private def strList(m: Map[String, Any], section: String, key: String): List[String] =
    m.get(key) match {
      case None => Nil
      case Some(l: List[Any] @unchecked) =>
        l.map {
          case s: String => s
          case other     => throw ConfigError(s"$section.$key", s"expected string elements, got $other")
        }
      case Some(other) => throw ConfigError(s"$section.$key", s"expected a list, got $other")
    }

  private def objList(m: Map[String, Any], section: String, key: String): List[Map[String, Any]] =
    m.get(key) match {
      case None => Nil
      case Some(l: List[Any] @unchecked) =>
        l.map {
          case o: Map[String, Any] @unchecked => o
          case other => throw ConfigError(s"$section.$key", s"expected object elements, got $other")
        }
      case Some(other) => throw ConfigError(s"$section.$key", s"expected a list, got $other")
    }
}
