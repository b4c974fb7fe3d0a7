package graft.io

import scala.io.Source
import scala.util.Using

import graft.rules.{FixedVertex, FixedVertexProperty}

/** Parses the fixed-vertex CSV: `id,label,(propName,propType,propValue)*`
  * with per-cell type coercion.
  *
  * Ref: core/.../processor/vertex/FixedVertexDataReader.scala:41-61; value
  * coercion core/.../common/Utils.scala:55-66. Driver-side by design — the
  * dimension is tiny (ids < reservedIdSpace) and is closure-broadcast or
  * `broadcast()`-joined downstream.
  */
object FixedVertexSource {

  /** String-named type → typed value. Ref: Utils.scala:55-66; unknown types
    * degrade to String (Utils.scala:31-53).
    */
  def coerce(propType: String, value: String): Any = propType match {
    case "int"    => value.toInt
    case "long"   => value.toLong
    case "float"  => value.toFloat
    case "double" => value.toDouble
    case "bool"   => value.toBoolean
    case "byte"   => value.toByte
    case _        => value
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\"")) t.substring(1, t.length - 1)
    else t
  }

  def parseLine(line: String): FixedVertex = {
    val cells = line.split(",").map(unquote)
    require(cells.length >= 2 && (cells.length - 2) % 3 == 0, s"Malformed fixed-vertex row: $line")
    val props = cells.drop(2).grouped(3).map { g =>
      FixedVertexProperty(g(0), g(1), coerce(g(1), g(2)))
    }.toList
    FixedVertex(cells(0).toLong, cells(1), props)
  }

  def read(path: String): List[FixedVertex] =
    Using.resource(Source.fromFile(path)) { src =>
      src.getLines().filter(_.trim.nonEmpty).map(parseLine).toList
    }

  def readString(csv: String): List[FixedVertex] =
    csv.linesIterator.filter(_.trim.nonEmpty).map(parseLine).toList
}
