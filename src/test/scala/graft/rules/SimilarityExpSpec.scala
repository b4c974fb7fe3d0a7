package graft.rules

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Mirrors the reference's SimilarityExpParserSpec (parsed Column equality
  * incl. parens / precedence-by-fold) plus property tests (raw ScalaCheck
  * Gen sampling — scalatestplus bridge unavailable offline).
  */
class SimilarityExpSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("single known column compiles to its match condition") {
    val r = SimilarityExp.parse("rfscore")
    assert(r.columns == List("rfscore"))
    assert(r.condition.toString == (((col("rfscore1") > 0.9) && (col("rfscore2") > 0.9))).toString)
  }

  test("unknown column defaults to null-safe equality") {
    val r = SimilarityExp.parse("objectId")
    assert(r.condition.toString == ((col("objectId1") <=> col("objectId2"))).toString)
  }

  test("mulens expands to the 4-column condition") {
    val r = SimilarityExp.parse("mulens")
    val expected = (col("mulens_class_11") === "ML" && col("mulens_class_21") === "ML") &&
      (col("mulens_class_12") === "ML" && col("mulens_class_22") === "ML")
    assert(r.columns == List("mulens"))
    assert(r.condition.toString == (expected).toString)
  }

  test("AND/OR fold left-associatively (a OR b AND c == (a||b)&&c)") {
    val r = SimilarityExp.parse("objectId OR candid AND jd")
    val a = col("objectId1") <=> col("objectId2")
    val b = col("candid1") <=> col("candid2")
    val c = col("jd1") <=> col("jd2")
    assert(r.condition.toString == (((a || b) && c)).toString)
    assert(r.columns == List("objectId", "candid", "jd"))
  }

  test("parens override the fold") {
    val r = SimilarityExp.parse("objectId OR (candid AND jd)")
    val a = col("objectId1") <=> col("objectId2")
    val b = col("candid1") <=> col("candid2")
    val c = col("jd1") <=> col("jd2")
    assert(r.condition.toString == ((a || (b && c))).toString)
  }

  test("reference example expression parses with all leaves in order") {
    val r = SimilarityExp.parse(
      "(rfscore AND snn_snia_vs_nonia) OR mulens OR classtar OR cdsxmatch OR objectId OR roid"
    )
    assert(
      r.columns == List("rfscore", "snn_snia_vs_nonia", "mulens", "classtar", "cdsxmatch", "objectId", "roid")
    )
  }

  test("malformed expressions throw BadSimilarityExpression") {
    assertThrows[BadSimilarityExpression](SimilarityExp.parse("a AND"))
    assertThrows[BadSimilarityExpression](SimilarityExp.parse("(a OR b"))
    assertThrows[BadSimilarityExpression](SimilarityExp.parse(""))
    assertThrows[BadSimilarityExpression](SimilarityExp.parse("a ANDb"))
    assertThrows[BadSimilarityExpression](SimilarityExp.parse("a b"))
  }

  private val nameGen = Gen.nonEmptyListOf(Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') :+ '_')).map(_.mkString)
  private val exprGen: Gen[String] = {
    def leaf = nameGen
    def node(depth: Int): Gen[String] =
      if (depth <= 0) leaf
      else
        Gen.oneOf(
          leaf,
          for {
            l <- node(depth - 1); op <- Gen.oneOf("AND", "OR"); r <- node(depth - 1)
          } yield s"$l $op $r",
          node(depth - 1).map(e => s"($e)")
        )
    node(3)
  }

  test("property: every generated well-formed expression parses") {
    samples(exprGen).foreach { e =>
      val r = SimilarityExp.parse(e)
      assert(r.columns.nonEmpty, s"no leaves for: $e")
    }
  }

  test("property: leaf list preserves source order and multiplicity") {
    samples(Gen.nonEmptyListOf(nameGen)).foreach { names =>
      // avoid names that collide with the operator keywords
      val clean = names.filterNot(n => n == "AND" || n == "OR")
      if (clean.nonEmpty) {
        val e = clean.mkString(" OR ")
        assert(SimilarityExp.parse(e).columns == clean)
      }
    }
  }

  // ------------------------------------------------------- AST round-trip

  private val astNameGen: Gen[String] =
    Gen.oneOf("rfscore", "objectId", "cdsxmatch", "roid", "classtar", "mulens", "foo_bar")

  private def exprGen(depth: Int): Gen[SimilarityExp.Expr] =
    if (depth <= 0) astNameGen.map(SimilarityExp.Leaf)
    else
      Gen.frequency(
        2 -> astNameGen.map(SimilarityExp.Leaf),
        1 -> (for { l <- exprGen(depth - 1); r <- exprGen(depth - 1) } yield SimilarityExp.And(l, r)),
        1 -> (for { l <- exprGen(depth - 1); r <- exprGen(depth - 1) } yield SimilarityExp.Or(l, r))
      )

  /** Fully-parenthesized rendering: parsing it must rebuild the same tree. */
  private def render(e: SimilarityExp.Expr): String = e match {
    case SimilarityExp.Leaf(n)   => n
    case SimilarityExp.And(l, r) => s"(${render(l)} AND ${render(r)})"
    case SimilarityExp.Or(l, r)  => s"(${render(l)} OR ${render(r)})"
  }

  test("property: render -> parse round-trips the AST") {
    samples(exprGen(4), 300).foreach { ast =>
      val parsed = SimilarityExp.parse(render(ast))
      assert(parsed.ast == ast, s"round-trip failed for ${render(ast)}")
      assert(parsed.columns == SimilarityExp.leaves(ast))
    }
  }

  test("property: disjuncts flatten exactly the top-level OR chain") {
    samples(exprGen(4), 300).foreach { ast =>
      val ds = SimilarityExp.disjuncts(ast)
      // no disjunct is itself an Or, and flattening preserves leaf order
      assert(ds.forall(d => !d.isInstanceOf[SimilarityExp.Or]))
      assert(ds.flatMap(SimilarityExp.leaves) == SimilarityExp.leaves(ast))
    }
  }

  test("left-associative fold: a OR b AND c parses as And(Or(a,b),c)") {
    import SimilarityExp._
    assert(parse("roid OR rfscore AND classtar").ast ==
      And(Or(Leaf("roid"), Leaf("rfscore")), Leaf("classtar")))
  }
}
