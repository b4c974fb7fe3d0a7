package graft.ops

import graft.SparkSpec

class SemiStructuredSpec extends SparkSpec {

  test("extractJson promotes typed fields; malformed rows yield NULLs, not failures") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 7, "tag": "x"}"""),
      (2L, """{"k": "not-an-int"}"""),
      (3L, "garbage{{{"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "props")
    val got = SemiStructured.extractJson(df, "props", "k INT, tag STRING")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) == ((Some(7), Some("x"))))
    assert(got(2L) == ((None, None)))
    assert(got(3L) == ((None, None)))
    assert(got(4L) == ((None, None)))
  }

  test("withParseStatus flags only non-null unparseable payloads") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 1}"""),
      (2L, "nope"),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "props")
    val got = SemiStructured.withParseStatus(df, "props", "k INT")
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("parse_ok"))).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true))
  }
}
