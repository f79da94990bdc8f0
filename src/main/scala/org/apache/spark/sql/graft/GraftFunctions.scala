package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the engine's native expressions: registers
  * `dot_product`, `shingle_hash60`, `minhash_sig`, and `simhash60` so
  * `spark.sql("SELECT dot_product(a, b) ...")` works — the standard
  * extension-registration pattern, available two ways:
  *
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (or `builder.withExtensions(new GraftExtensions)`) at session
  *    build time;
  *  - [[GraftFunctions.register]] on an already-running session (e.g. a
  *    shared test/notebook session).
  */
object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(getClass.getCanonicalName, "", name, usage, "", "",
      "", "", "", "", "built-in")

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def strLit(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got $other")
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      info("dot_product",
        "_FUNC_(a, b) - strict left-fold dot product of two double arrays"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "dot_product(a, b) takes 2 arguments")
        DotProductDouble(es.head, es(1))
      }),
    (FunctionIdentifier("shingle_hash60"),
      info("shingle_hash60",
        "_FUNC_(toks, k) - 60-bit md5 hashes of the distinct word k-shingles"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "shingle_hash60(toks, k) takes 2 arguments")
        ShingleHash60Expr(es.head, intLit(es(1), "shingle_hash60", "k"))
      }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "_FUNC_(shingle_hashes, n) - n-seed MinHash signature"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "minhash_sig(hashes, n) takes 2 arguments")
        MinHashSigExpr(es.head, intLit(es(1), "minhash_sig", "n"))
      }),
    (FunctionIdentifier("simhash60"),
      info("simhash60",
        "_FUNC_(toks) - 60-bit SimHash fingerprint of the distinct tokens"),
      (es: Seq[Expression]) => {
        require(es.length == 1, "simhash60(toks) takes 1 argument")
        SimHashFromTokensExpr(es.head)
      }),
    (FunctionIdentifier("md5_prefix60"),
      info("md5_prefix60",
        "_FUNC_(str) - first 60 bits of md5(str) as BIGINT (the " +
          "engine's portable seeded hash)"),
      (es: Seq[Expression]) => {
        require(es.length == 1, "md5_prefix60(str) takes 1 argument")
        Md5Prefix60Expr(es.head)
      }),
    (FunctionIdentifier("hll_estimate"),
      info("hll_estimate",
        "_FUNC_(str) - raw-HLL distinct estimate (native aggregate; " +
          "pass the seeded key string)"),
      (es: Seq[Expression]) => {
        require(es.length == 1, "hll_estimate(str) takes 1 argument")
        HllSketchAgg(es.head)
      }),
    (FunctionIdentifier("kmv_estimate"),
      info("kmv_estimate",
        "_FUNC_(str, k) - KMV bottom-k distinct estimate (native " +
          "aggregate; exact under k distinct)"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "kmv_estimate(str, k) takes 2 arguments")
        KmvSketchAgg(es.head, intLit(es(1), "kmv_estimate", "k"))
      }),
    (FunctionIdentifier("gram_fx"),
      info("gram_fx",
        "_FUNC_(vec, dim, scale) - fixed-point upper-triangle Gram " +
          "matrix (native aggregate; single-pass X'X)"),
      (es: Seq[Expression]) => {
        require(es.length == 3, "gram_fx(vec, dim, scale) takes 3 arguments")
        GramMatrixAgg(es.head, intLit(es(1), "gram_fx", "dim"),
          intLit(es(2), "gram_fx", "scale").toDouble)
      }),
    (FunctionIdentifier("top_k"),
      info("top_k",
        "_FUNC_(v, k) - the k largest values, sorted descending " +
          "(native bounded-heap aggregate)"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "top_k(v, k) takes 2 arguments")
        TopKAgg(es.head, intLit(es(1), "top_k", "k"))
      }),
    (FunctionIdentifier("json_get_long"),
      info("json_get_long",
        "_FUNC_(json, key) - top-level key as long, null if " +
          "missing/non-integral"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "json_get_long(json, key) takes 2 arguments")
        JsonGetLongExpr(es.head, strLit(es(1), "json_get_long", "key"))
      }),
    (FunctionIdentifier("json_get_string"),
      info("json_get_string",
        "_FUNC_(json, key) - top-level scalar key as text, null if " +
          "missing/non-scalar"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "json_get_string(json, key) takes 2 arguments")
        JsonGetStringExpr(es.head, strLit(es(1), "json_get_string", "key"))
      }))

  /** Register on a live session (idempotent — re-registration replaces). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (id, inf, builder) =>
      registry.registerFunction(id, inf, builder)
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
