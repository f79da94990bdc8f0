package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions
import graft.operators.{DedupOps, TextOps}

/** The SQL registration surface: every native expression callable from
  * `spark.sql`, with values identical to the Column API.
  */
class GraftFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("dot_product is callable from SQL") {
    val d = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .as[Double].collect()(0)
    assert(d == 32.0)
  }

  test("hll_estimate is callable from SQL as an aggregate") {
    // 20k distinct on 4096 buckets: comfortably above the 2.5m
    // small-range boundary where the RAW estimator (documented scope —
    // no linear-counting branch) is unbiased
    spark.range(1, 20001).toDF("k").createOrReplaceTempView("hll_sql_t")
    val est = spark.sql(
      """SELECT hll_estimate(concat('hll:', CAST(k AS STRING)))
        |FROM hll_sql_t""".stripMargin).as[Double].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05,
      s"SQL-surface HLL estimate $est too far from 20000")
  }

  test("md5_prefix60 from SQL matches the Column API and the hex formula") {
    val got = spark.sql("SELECT md5_prefix60('split:42')")
      .as[Long].collect()(0)
    assert(got == DedupOps.driverHash60("split:42"))
    assert(spark.sql(
      """SELECT md5_prefix60(s) = CAST(conv(substring(md5(s), 1, 15),
        |  16, 10) AS BIGINT) AS eq
        |FROM VALUES ('a'), (''), ('中文 😀'), ('kmv:123') t(s)"""
        .stripMargin).as[Boolean].collect().forall(identity))
  }

  test("shingle_hash60 / simhash60 from SQL match the Column API") {
    spark.read.parquet(s"$sf001/documents.parquet").limit(50)
      .createOrReplaceTempView("docs_gf")
    val sqlOut = spark.sql(
      """SELECT doc_id,
        |  shingle_hash60(filter(split(text, '\\s+'), t -> t != ''), 3) AS sh,
        |  simhash60(filter(split(text, '\\s+'), t -> t != '')) AS fp
        |FROM docs_gf""".stripMargin)
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    val colOut = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
      .select(col("doc_id"),
        DedupOps.shingleHashes(TextOps.tokens(col("text")), 3).as("sh"),
        org.apache.spark.sql.graft.SignatureExpressions
          .simhashFromTokens(TextOps.tokens(col("text"))).as("fp"))
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(sqlOut.nonEmpty)
    assert(sqlOut == colOut)
  }

  test("minhash_sig from SQL matches the Column API") {
    val sqlOut = spark.sql(
      """SELECT minhash_sig(
        |  shingle_hash60(array('a','b','c','d','e'), 3), 8) AS sig"""
        .stripMargin).as[Seq[Long]].collect()(0)
    val colOut = Seq(Seq("a", "b", "c", "d", "e")).toDF("toks")
      .select(org.apache.spark.sql.graft.SignatureExpressions
        .minhashSig(DedupOps.shingleHashes(col("toks"), 3), 8).as("sig"))
      .as[Seq[Long]].collect()(0)
    assert(sqlOut == colOut && sqlOut.length == 8)
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hash60(array('a'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null)
  }
}
