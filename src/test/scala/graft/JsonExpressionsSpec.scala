package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, JsonExpressions}
import org.apache.spark.sql.types.StructType

/** The native single-key JSON scanner: parity with `from_json` on
  * well-formed documents (the class it replaces in `s2_json_extract`),
  * plus the documented edge semantics.
  */
class JsonExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def longOf(json: String, key: String = "k"): Option[Long] =
    Seq(json).toDF("j")
      .select(JsonExpressions.jsonGetLong(col("j"), key).as("v"))
      .collect()(0) match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getLong(0))
      }

  private def strOf(json: String, key: String = "k"): Option[String] =
    Seq(json).toDF("j")
      .select(JsonExpressions.jsonGetString(col("j"), key).as("v"))
      .as[Option[String]].collect()(0)

  test("json_get_long matches from_json on a well-formed corpus") {
    val docs = Seq(
      """{"k": 69}""",
      """{"k":42}""",
      """{ "k" : -7 }""",
      """{"a": 1, "k": 2, "z": 3}""",
      """{"kk": 1, "k": 2}""",            // prefix key must not match
      """{"a": {"k": 99}, "k": 5}""",     // nested k must be skipped
      """{"a": [1, {"k": 9}], "k": 6}""", // k inside array element skipped
      """{"a": "has \"k\": 7 inside", "k": 8}""", // k inside string skipped
      """{"a": 1}""",                     // missing
      """{"k": null}""",
      """{"k": 1.5}""",                   // non-integral → null
      """{"k": 2e3}""",                   // exponent → null
      """{"k": "12"}""",                  // string-typed → null
      """{"k": true}""",
      """{"k": [1]}""",
      """{"k": {"x": 1}}""",
      """{"k": 9223372036854775807}""",   // Long.MaxValue
      """{"k": 99999999999999999999}""",  // overflow → null
      """{}""",
      """[1, 2]""",                       // not an object
      "7")
    val df = docs.toDF("j")
    val native = df.select(
      JsonExpressions.jsonGetLong(col("j"), "k").as("v"))
      .as[Option[Long]].collect().toSeq
    val jackson = df.select(
      from_json(col("j"), StructType.fromDDL("k LONG"))
        .getField("k").as("v"))
      .as[Option[Long]].collect().toSeq
    assert(native == jackson)
    assert(native.take(8) ==
      Seq(Some(69L), Some(42L), Some(-7L), Some(2L), Some(2L), Some(5L),
        Some(6L), Some(8L)))
  }

  test("json_get_long on malformed input is lenient (documented drift)") {
    // value found before the malformed tail is returned — json-path-get
    // behavior; from_json nulls the row instead. Pin both.
    val doc = """{"k": 3, "bad"""
    assert(longOf(doc) == Some(3L))
    val viaFromJson = Seq(doc).toDF("j")
      .select(from_json(col("j"), StructType.fromDDL("k LONG"))
        .getField("k").as("v"))
      .as[Option[Long]].collect()(0)
    assert(viaFromJson.isEmpty)
  }

  test("duplicate keys: first occurrence wins (documented drift)") {
    // duplicate-key objects are well-formed JSON (RFC 8259 leaves the
    // behavior undefined); the scanner stops at the FIRST match while
    // Jackson-based from_json keeps the LAST. Pin both sides.
    val doc = """{"k": 1, "k": 2}"""
    assert(longOf(doc) == Some(1L))
    val viaFromJson = Seq(doc).toDF("j")
      .select(from_json(col("j"), StructType.fromDDL("k LONG"))
        .getField("k").as("v"))
      .as[Option[Long]].collect()(0)
    assert(viaFromJson == Some(2L))
    assert(strOf("""{"k": "a", "k": "b"}""") == Some("a"))
  }

  test("json_get_string: strings unescape, scalars keep text, rest null") {
    assert(strOf("""{"k": "plain"}""") == Some("plain"))
    assert(strOf("""{"k": "a\"b\\c\/d\ne\tf"}""") == Some("a\"b\\c/d\ne\tf"))
    assert(strOf("""{"k": "café 😀"}""") == Some("café 😀"))
    assert(strOf("""{"k": -1.5e3}""") == Some("-1.5e3"))
    assert(strOf("""{"k": true}""") == Some("true"))
    assert(strOf("""{"k": null}""") == None)
    assert(strOf("""{"k": [1]}""") == None)
    assert(strOf("""{"k": {"a": 1}}""") == None)
    assert(strOf("""{"a": 1}""") == None)
  }

  test("SQL surface matches the Column API and requires a literal key") {
    graft.sources.Tables.events(spark, sf001).limit(200)
      .createOrReplaceTempView("ev_json")
    val sqlOut = spark.sql(
      "SELECT event_id, json_get_long(props, 'k') AS v FROM ev_json")
      .as[(Long, Option[Long])].collect().toMap
    val colOut = graft.sources.Tables.events(spark, sf001).limit(200)
      .select(col("event_id"),
        JsonExpressions.jsonGetLong(col("props"), "k").as("v"))
      .as[(Long, Option[Long])].collect().toMap
    assert(sqlOut.nonEmpty && sqlOut == colOut)
    val e = intercept[Exception] {
      spark.sql("SELECT json_get_long('{}', concat('k', ''))").collect()
    }
    assert(e.getMessage.contains("string literal") || e.getCause != null)
  }

  test("s2 query path: native scanner equals from_json over real data") {
    val ev = graft.sources.Tables.events(spark, sf001)
    val native = ev.select(col("event_id"),
      JsonExpressions.jsonGetLong(col("props"), "k").as("k_val"))
    val jackson = ev.select(col("event_id"),
      from_json(col("props"), StructType.fromDDL("k LONG"))
        .getField("k").as("k_val"))
    assert(native.exceptAll(jackson).isEmpty &&
      jackson.exceptAll(native).isEmpty)
  }
}
