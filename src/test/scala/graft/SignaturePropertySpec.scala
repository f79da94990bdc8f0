package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.DedupOps

/** Property-based equality of the native codegen'd signature expressions
  * against their composed-Catalyst executable specs, over generated token
  * arrays. DedupOpsSpec pins the equality on real corpus docs; this
  * explores the input space — empty docs, single tokens, heavy repeats,
  * multibyte tokens, k larger than the doc — where an off-by-one in the
  * native window/bit loops would hide. Cases are materialized from seeded
  * ScalaCheck generators into ONE DataFrame per property (a Spark job per
  * ScalaCheck trial would take minutes; the properties are per-row, so
  * batch evaluation checks them all at once).
  */
class SignaturePropertySpec extends SparkTestBase {
  import spark.implicits._

  // tokens as TextOps.tokens produces them: non-empty, no whitespace
  private val genToken: Gen[String] = Gen.frequency(
    5 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12)),
    1 -> Gen.oneOf("é", "中文", "😀", "a-b_c", "'quote'", "x" * 40),
    1 -> Gen.oneOf("the", "a", "of")) // force cross-doc repeats
  private val genDoc: Gen[List[String]] = Gen.frequency(
    8 -> Gen.listOf(genToken),
    1 -> Gen.listOfN(1, genToken), // single-token docs
    1 -> genToken.flatMap(t => Gen.chooseNum(2, 30)
      .map(n => List.fill(n)(t)))) // all-identical tokens

  /** 300 generated docs + pinned edge cases, one row each. */
  private lazy val docs = {
    val p = Gen.Parameters.default
    val generated = (1 to 300).flatMap(i =>
      genDoc.apply(p, Seed(i.toLong)))
    val pinned = Seq(Nil, List("solo"), List("a", "a", "a"),
      List("a", "b"), List("😀", "😀", "中"))
    (pinned ++ generated).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
      .toDF("id", "toks")
  }

  test("property: native shingle hashes equal the composed spec for " +
    "k in 1..5") {
    for (k <- 1 to 5) {
      val bad = docs.select(
        DedupOps.shingleHashes(col("toks"), k).as("native"),
        transform(DedupOps.shingles(col("toks"), k),
          s => DedupOps.hash60(lit("sh"), s)).as("spec"))
        .filter(not(col("native") <=> col("spec")))
        .count()
      assert(bad == 0, s"k=$k: $bad docs where native != spec")
    }
  }

  test("property: native minhash signature equals the exploded spec") {
    val hashed = docs.select(col("id"),
      DedupOps.shingleHashes(col("toks"), 2).as("sh"))
    val native = DedupOps.minhashSigs(hashed, "id", "sh", 8)
      .withColumnRenamed("sig", "native")
    val strings = docs.select(col("id"),
      DedupOps.shingles(col("toks"), 2).as("sh"))
    val spec = DedupOps.minhashSigs(strings, "id", "sh", 8)
      .withColumnRenamed("sig", "spec")
    // native path drops shingle-less docs at its filter, spec at its
    // explode — both must keep exactly the same id set
    val joined = native.join(spec, Seq("id"), "full")
    val bad = joined.filter(not(col("native") <=> col("spec"))).count()
    assert(bad == 0, s"$bad docs where native minhash != spec")
  }

  test("property: native simhash equals the bit-vote spec") {
    val withToks = docs.filter(size(col("toks")) > 0)
    val native = DedupOps.simhash(withToks, "id", col("toks"))
      .withColumnRenamed("simhash", "native")
    val spec = DedupOps.simhashSpec(withToks, "id", col("toks"))
      .withColumnRenamed("simhash", "spec")
    val bad = native.join(spec, Seq("id"), "full")
      .filter(not(col("native") <=> col("spec"))).count()
    assert(bad == 0, s"$bad docs where native simhash != spec")
  }
}
