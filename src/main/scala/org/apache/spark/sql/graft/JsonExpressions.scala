package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-key JSON extraction: pull one top-level key's value out
  * of a JSON object column without materializing a parse tree.
  *
  * Why native: `from_json` (and `get_json_object`) run a full Jackson
  * parse per row — tokenizer, per-token dispatch, struct row allocation —
  * to recover a single scalar. Profiling showed that parse as the
  * dominant constant of the `s2_json_extract` query (~7 s at sf0.1, >100×
  * a native engine's per-row cost, 24% of the whole bench). This
  * expression is a single forward byte scan over the `UTF8String` that
  * builds no parse tree or token objects (the long getter still boxes
  * its return — a `java.lang.Long` per matched row — and `getBytes` may
  * copy when the UTF8String isn't exactly array-backed; switch to a
  * sentinel-plus-found-flag codegen variant if that ever shows in a
  * profile), and it participates in whole-stage codegen (the scan is
  * opaque to Catalyst but the surrounding projection stays fused).
  *
  * Semantics (documented scope, asserted against `from_json` in
  * `JsonExpressionsSpec`):
  *  - the input must be a JSON *object* at top level; anything else → null;
  *  - key matching is on the raw (unescaped) key bytes — keys that use
  *    `\uXXXX`/backslash escapes in the document never match (the corpus
  *    this engine targets has plain ASCII keys; `from_json` is the
  *    general-shape fallback);
  *  - duplicate keys: the FIRST occurrence wins (the scan stops at the
  *    first match), whereas Jackson-based `from_json` keeps the LAST —
  *    duplicate-key objects are well-formed JSON, so this is a real
  *    (pinned) divergence; RFC 8259 leaves the behavior undefined;
  *  - `json_get_long`: integral JSON numbers in `Long` range → the value;
  *    floats, exponents, strings, `null`, objects, arrays, overflow,
  *    missing key → null. Matches `from_json('k LONG')` on well-formed
  *    single-occurrence documents (both reject non-integral and
  *    non-numeric values);
  *  - `json_get_string`: string values → the unescaped text (full
  *    `\" \\ \/ \b \f \n \r \t \uXXXX` + surrogate-pair handling);
  *    numbers and booleans → their literal text; `null`, objects,
  *    arrays, missing → null;
  *  - malformed input: the scan is lenient — a value found before the
  *    malformed region is still returned (json-path-get behavior, like
  *    `get_json_object`), whereas `from_json` nulls the whole row. The
  *    spec pins both behaviors.
  *
  * Shim-package placement: `AbstractDataType` and the Column↔Expression
  * bridge are `private[sql]` (see [[VectorExpressions]]).
  */
@ExpressionDescription(
  usage = "_FUNC_(json, key) - value of a top-level key as a long, " +
    "null if missing/non-integral")
case class JsonGetLongExpr(child: Expression, key: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  // Missing key / wrong-typed value → null regardless of child nullability.
  override def nullable: Boolean = true

  @transient private lazy val keyBytes = key.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    JsonGet.getLong(input.asInstanceOf[UTF8String], keyBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonKey", keyBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("jsonLong")
      s"""
         |java.lang.Long $v =
         |  org.apache.spark.sql.graft.JsonGet.getLong($c, $keyRef);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $v.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

@ExpressionDescription(
  usage = "_FUNC_(json, key) - scalar value of a top-level key as text, " +
    "null if missing/non-scalar")
case class JsonGetStringExpr(child: Expression, key: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val keyBytes = key.getBytes("UTF-8")

  override protected def nullSafeEval(input: Any): Any =
    JsonGet.getString(input.asInstanceOf[UTF8String], keyBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonKey", keyBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("jsonStr")
      s"""
         |UTF8String $v =
         |  org.apache.spark.sql.graft.JsonGet.getString($c, $keyRef);
         |if ($v == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** The scanner — static forwarders called from generated code. */
object JsonGet {

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  private def skipWs(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start
    while (i < n && isWs(b(i))) i += 1
    i
  }

  /** Index just past a string's closing quote (`start` at the opening
    * quote), or -1 if unterminated.
    */
  private def skipString(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start + 1
    while (i < n && b(i) != '"') {
      if (b(i) == '\\') i += 2 else i += 1
    }
    if (i >= n) -1 else i + 1
  }

  /** Index just past any JSON value starting at `start`, or -1 if
    * malformed. String-aware for nested containers.
    */
  private def skipValue(b: Array[Byte], start: Int, n: Int): Int = {
    var i = start
    val c0 = b(i)
    if (c0 == '"') {
      skipString(b, i, n)
    } else if (c0 == '{' || c0 == '[') {
      var depth = 0
      while (i < n) {
        val c = b(i)
        if (c == '"') {
          i = skipString(b, i, n)
          if (i < 0) return -1
        } else {
          if (c == '{' || c == '[') depth += 1
          else if (c == '}' || c == ']') {
            depth -= 1
            if (depth == 0) return i + 1
          }
          i += 1
        }
      }
      -1
    } else {
      // number / true / false / null: scan to a structural boundary
      while (i < n && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
        !isWs(b(i))) i += 1
      i
    }
  }

  /** Start index of the value for `key` in the top-level object, or -1
    * if absent / not an object / malformed before the key.
    */
  private def findValue(b: Array[Byte], key: Array[Byte]): Int = {
    val n = b.length
    var i = skipWs(b, 0, n)
    if (i >= n || b(i) != '{') return -1
    i += 1
    while (i < n) {
      i = skipWs(b, i, n)
      if (i >= n || b(i) != '"') return -1 // '}' (empty/end) or garbage
      i += 1
      val ks = i
      var escaped = false
      while (i < n && b(i) != '"') {
        if (b(i) == '\\') { escaped = true; i += 1 }
        i += 1
      }
      if (i >= n) return -1
      val ke = i
      i = skipWs(b, i + 1, n)
      if (i >= n || b(i) != ':') return -1
      i = skipWs(b, i + 1, n)
      if (i >= n) return -1
      var matches = !escaped && ke - ks == key.length
      if (matches) {
        var j = 0
        while (matches && j < key.length) {
          matches = b(ks + j) == key(j); j += 1
        }
      }
      if (matches) return i
      i = skipValue(b, i, n)
      if (i < 0) return -1
      i = skipWs(b, i, n)
      if (i >= n || b(i) != ',') return -1 // '}' ends the object: absent
      i += 1
    }
    -1
  }

  /** Called from generated code. Boxed so null means missing/non-integral. */
  def getLong(json: UTF8String, key: Array[Byte]): java.lang.Long = {
    val b = json.getBytes
    val n = b.length
    var i = findValue(b, key)
    if (i < 0) return null
    var neg = false
    if (b(i) == '-') { neg = true; i += 1 }
    if (i >= n || b(i) < '0' || b(i) > '9') return null
    var acc = 0L
    while (i < n && b(i) >= '0' && b(i) <= '9') {
      val d = b(i) - '0'
      // overflow → null (Long.MinValue itself also nulls; documented edge)
      if (acc > (Long.MaxValue - d) / 10) return null
      acc = acc * 10 + d
      i += 1
    }
    if (i < n && (b(i) == '.' || b(i) == 'e' || b(i) == 'E')) return null
    if (i < n && b(i) != ',' && b(i) != '}' && !isWs(b(i))) return null
    java.lang.Long.valueOf(if (neg) -acc else acc)
  }

  /** Called from generated code. Null means missing/non-scalar/JSON null. */
  def getString(json: UTF8String, key: Array[Byte]): UTF8String = {
    val b = json.getBytes
    val n = b.length
    val i = findValue(b, key)
    if (i < 0) return null
    val c0 = b(i)
    if (c0 == '"') {
      val end = skipString(b, i, n)
      if (end < 0) return null
      unescape(b, i + 1, end - 1)
    } else if (c0 == '{' || c0 == '[') {
      null
    } else {
      val end = skipValue(b, i, n)
      if (end < 0 || end == i) return null
      // JSON null → SQL null; numbers and booleans keep their text
      if (end - i == 4 && b(i) == 'n' && b(i + 1) == 'u' &&
        b(i + 2) == 'l' && b(i + 3) == 'l') null
      else UTF8String.fromBytes(b, i, end - i)
    }
  }

  /** Unescape a JSON string body `[from, until)`; fast path when no
    * backslash is present.
    */
  private def unescape(b: Array[Byte], from: Int, until: Int): UTF8String = {
    var i = from
    var hasEscape = false
    while (i < until && !hasEscape) {
      if (b(i) == '\\') hasEscape = true
      i += 1
    }
    if (!hasEscape) return UTF8String.fromBytes(b, from, until - from)
    val sb = new java.lang.StringBuilder(until - from)
    // escapes are ASCII-positional, so building via String is safe: the
    // raw bytes between escapes are valid UTF-8 already
    val raw = new String(b, from, until - from, "UTF-8")
    var j = 0
    while (j < raw.length) {
      val c = raw.charAt(j)
      if (c == '\\' && j + 1 < raw.length) {
        raw.charAt(j + 1) match {
          case '"' => sb.append('"'); j += 2
          case '\\' => sb.append('\\'); j += 2
          case '/' => sb.append('/'); j += 2
          case 'b' => sb.append('\b'); j += 2
          case 'f' => sb.append('\f'); j += 2
          case 'n' => sb.append('\n'); j += 2
          case 'r' => sb.append('\r'); j += 2
          case 't' => sb.append('\t'); j += 2
          case 'u' if j + 5 < raw.length =>
            try {
              val cp = Integer.parseInt(raw.substring(j + 2, j + 6), 16)
              sb.append(cp.toChar) // surrogate pairs arrive as two \u escapes
              j += 6
            } catch {
              case _: NumberFormatException => sb.append(c); j += 1
            }
          case other => sb.append(other); j += 2
        }
      } else {
        sb.append(c)
        j += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

object JsonExpressions {
  /** Column API: top-level key as long (null if missing/non-integral). */
  def jsonGetLong(json: Column, key: String): Column =
    ExpressionUtils.column(
      JsonGetLongExpr(ExpressionUtils.expression(json), key))

  /** Column API: top-level scalar key as text (null if missing/non-scalar). */
  def jsonGetString(json: Column, key: String): Column =
    ExpressionUtils.column(
      JsonGetStringExpr(ExpressionUtils.expression(json), key))
}
