package graft

import org.apache.spark.sql.graft.JsonGet
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check of the hand-written JSON scanner: generate
  * arbitrary well-formed documents from a known tree, render with random
  * whitespace and escape choices, and assert the scanner recovers exactly
  * the generated truth. Complements JsonExpressionsSpec (which pins
  * from_json parity on a fixed corpus) — this explores the input space:
  * nested containers, strings full of quotes/braces, \uXXXX and
  * surrogate-pair escapes, signed/overflowing numbers, absent keys.
  * Pure JVM (static JsonGet calls), no SparkSession needed.
  */
class JsonGetPropertySpec extends AnyFunSuite {

  // ---- JSON tree -----------------------------------------------------
  sealed trait JVal
  case object JNull extends JVal
  final case class JBool(v: Boolean) extends JVal
  final case class JLong(v: Long) extends JVal
  final case class JDouble(lit: String) extends JVal // rendered verbatim
  final case class JStr(v: String) extends JVal
  final case class JArr(vs: List[JVal]) extends JVal
  final case class JObj(fields: List[(String, JVal)]) extends JVal

  private val genKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(8))

  // strings stress the escaper: quotes, backslashes, braces that look
  // structural, control chars, multibyte + astral-plane characters
  private val genStr: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    1 -> Gen.oneOf("\"", "\\", "{", "}", "[", "]", ",", ":", " "),
    1 -> Gen.oneOf("\n", "\t", "\r", "\b", "\f"),
    1 -> Gen.oneOf("é", "ß", "中", "😀", " "))).map(_.mkString)

  private val genDoubleLit: Gen[String] = for {
    m <- Gen.chooseNum(-9999999L, 9999999L)
    frac <- Gen.chooseNum(0, 999)
    e <- Gen.oneOf("", "e2", "E-3", "e+10")
  } yield s"$m.$frac$e"

  private def genVal(depth: Int): Gen[JVal] = {
    val scalars = Gen.frequency(
      2 -> Gen.const(JNull),
      2 -> Gen.oneOf(JBool(true), JBool(false)),
      5 -> Gen.chooseNum(Long.MinValue + 1, Long.MaxValue).map(JLong(_)),
      3 -> genDoubleLit.map(JDouble(_)),
      5 -> genStr.map(JStr(_)))
    if (depth <= 0) scalars
    else Gen.frequency(
      6 -> scalars,
      1 -> Gen.listOfN(3, genVal(depth - 1)).map(l => JArr(l.take(3))),
      1 -> (for {
        ks <- Gen.listOfN(3, genKey)
        vs <- Gen.listOfN(3, genVal(depth - 1))
      } yield JObj(ks.distinct.zip(vs))))
  }

  private val genDoc: Gen[(JObj, String)] = for {
    keys <- Gen.listOfN(6, genKey).map(_.distinct)
    vals <- Gen.listOfN(6, genVal(2))
    target <- genKey
  } yield (JObj(keys.zip(vals)), target)

  // ---- renderer (escape + whitespace choices are part of the input) ---
  private def escape(s: String, uEscape: Boolean): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || (uEscape && c > 126) =>
        sb.append(f"\\u${c.toInt}%04x") // surrogates render as pairs
      case c => sb.append(c)
    }
    sb.toString
  }

  private def render(v: JVal, ws: String, uEscape: Boolean): String =
    v match {
      case JNull => "null"
      case JBool(b) => b.toString
      case JLong(n) => n.toString
      case JDouble(lit) => lit
      case JStr(s) => "\"" + escape(s, uEscape) + "\""
      case JArr(vs) =>
        vs.map(render(_, ws, uEscape)).mkString(s"[$ws", s",$ws", s"$ws]")
      case JObj(fs) =>
        fs.map { case (k, fv) =>
          s""""$k"$ws:$ws${render(fv, ws, uEscape)}"""
        }.mkString(s"{$ws", s",$ws", s"$ws}")
    }

  // ---- expected semantics (the documented contract) --------------------
  private def expectLong(o: JObj, key: String): Option[Long] =
    o.fields.collectFirst { case (`key`, v) => v }.flatMap {
      case JLong(n) => Some(n)
      case _ => None // floats, strings, bools, null, containers
    }

  private def expectString(o: JObj, key: String): Option[String] =
    o.fields.collectFirst { case (`key`, v) => v }.flatMap {
      case JStr(s) => Some(s)
      case JLong(n) => Some(n.toString)
      case JDouble(lit) => Some(lit)
      case JBool(b) => Some(b.toString)
      case _ => None // null, containers
    }

  private def runProp(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val genCase = for {
    (obj, extraKey) <- genDoc
    // target an existing key 3/4 of the time, a (likely) absent one else
    target <- Gen.frequency(
      3 -> Gen.oneOf(extraKey :: obj.fields.map(_._1)).suchThat(_ => true),
      1 -> Gen.const(extraKey))
    ws <- Gen.oneOf("", " ", "\n ", "\t")
    uEscape <- Gen.oneOf(true, false)
  } yield (obj, target, render(obj, ws, uEscape))

  test("json_get_long recovers exactly the generated truth") {
    runProp("getLong", Prop.forAllNoShrink(genCase) {
      case (obj, target, doc) =>
        val got = Option(
          JsonGet.getLong(UTF8String.fromString(doc),
            target.getBytes("UTF-8"))).map(_.longValue)
        got == expectLong(obj, target)
    })
  }

  test("json_get_string recovers exactly the generated truth") {
    runProp("getString", Prop.forAllNoShrink(genCase) {
      case (obj, target, doc) =>
        val got = Option(
          JsonGet.getString(UTF8String.fromString(doc),
            target.getBytes("UTF-8"))).map(_.toString)
        got == expectString(obj, target)
    })
  }
}
