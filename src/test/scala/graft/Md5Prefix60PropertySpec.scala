package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Md5Prefix60Expr
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Value-equality of the native single-digest 60-bit hash against its
  * composed-Catalyst spec (`conv(substring(md5(c), 1, 15), 16, 10)`),
  * which every DuckDB oracle also replicates in SQL. Two layers:
  * a pure-JVM property sweep over arbitrary unicode strings (static
  * compute calls, fast), and one Spark end-to-end column comparison so
  * the codegen path itself is exercised.
  */
class Md5Prefix60PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val genStr: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    1 -> Gen.oneOf(":", " ", "\"", "\\", "\n", "\t"),
    1 -> Gen.oneOf("é", "ß", "中", "😀"))).map(_.mkString)

  /** Reference: the literal hex-substring formula (driverHash60's body,
    * inlined so this test doesn't depend on the code under test's
    * siblings).
    */
  private def reference(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("native md5 prefix == hex-substring reference (property sweep)") {
    val prop = Prop.forAll(genStr) { s =>
      Md5Prefix60Expr.compute(UTF8String.fromString(s)) == reference(s)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("native column == composed-Catalyst spec over a real dataset") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val diff = docs.select(
      graft.operators.TextOps.md5Prefix60(col("text")).as("native"),
      graft.operators.TextOps.md5Prefix60Spec(col("text")).as("spec"))
      .filter(col("native") =!= col("spec"))
    assert(diff.isEmpty, "codegen'd native hash must equal the spec")
  }
}
