package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class JsonValueSplitterSpec extends AnyFunSuite with Matchers {

  test("FIXTURES §3: concatenated values split into individual records") {
    val in = """{"a":1} 17 "s" [1,2] null {"b":2}"""
    JsonValueSplitter.split(in) shouldBe Seq(
      """{"a":1}""", "17", "\"s\"", "[1,2]", "null", """{"b":2}""")
  }

  test("nested structures and strings with braces stay whole") {
    val in = """{"a":{"b":[1,{"c":2}]},"s":"} ] \" esc"} [[1],[2]]"""
    JsonValueSplitter.split(in) shouldBe Seq(
      """{"a":{"b":[1,{"c":2}]},"s":"} ] \" esc"}""", "[[1],[2]]")
  }

  test("malformed tail is surfaced as the trailing element (E2 hook)") {
    val in = """{"a":1} {bad"""
    val out = JsonValueSplitter.split(in)
    out.head shouldBe """{"a":1}"""
    out.last shouldBe "{bad"
  }

  test("whitespace-only input yields nothing") {
    JsonValueSplitter.split("  \n\t ") shouldBe Seq.empty
  }

  test("property: random concatenations split back to their parts") {
    // seeded generator — 200 random sequences of scalars/objects/arrays
    val rnd = new scala.util.Random(1234)
    def scalar(): String = rnd.nextInt(4) match {
      case 0 => (rnd.nextInt(2000) - 1000).toString
      case 1 => "\"s" + rnd.alphanumeric.take(rnd.nextInt(6)).mkString + "\""
      case 2 => if (rnd.nextBoolean()) "true" else "false"
      case _ => "null"
    }
    def value(depth: Int): String = {
      if (depth >= 2 || rnd.nextInt(3) == 0) scalar()
      else if (rnd.nextBoolean())
        (0 until rnd.nextInt(3)).map(i => s""""k$i":${value(depth + 1)}""")
          .mkString("{", ",", "}")
      else (0 until rnd.nextInt(3)).map(_ => value(depth + 1))
        .mkString("[", ",", "]")
    }
    (1 to 200).foreach { _ =>
      val vals = Seq.fill(rnd.nextInt(6))(value(0))
      val sep = if (rnd.nextBoolean()) " " else "\n\t "
      JsonValueSplitter.split(vals.mkString(sep)) shouldBe vals
    }
  }
}
