package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SearchExpressions
import org.scalatest.prop.TableDrivenPropertyChecks

/** The native sorted-lower-bound (bucket-id) expression: exact
  * upper_bound semantics against the interpreted HOF fold it replaced
  * in RelationalOps.withRangeBuckets, on both the codegen and
  * interpreted paths, for long AND string keys. */
class SearchExpressionsSpec extends SparkTestBase
    with TableDrivenPropertyChecks {
  import spark.implicits._

  private def foldCount(bounds: Seq[Long], k: Long): Long =
    bounds.count(_ <= k).toLong

  test("matches the HOF fold for long keys across edge positions") {
    val bounds = Seq(10L, 20L, 20L, 30L, 45L, 100L)
    val keys = Seq(Long.MinValue, 5L, 10L, 11L, 20L, 29L, 30L, 99L,
      100L, 101L, Long.MaxValue)
    val df = keys.toDF("k")
      .withColumn("bs", typedLit(bounds))
      .withColumn("native",
        SearchExpressions.sortedLowerBoundCount(col("bs"), col("k")))
      .withColumn("fold", aggregate(col("bs"), lit(0L),
        (acc, b) => acc + when(col("k") >= b, 1L).otherwise(0L)))
    val bad = df.filter(col("native") =!= col("fold")).collect()
    assert(bad.isEmpty, s"diverged: ${bad.mkString("; ")}")
    // spot-check absolute values too (the fold could be wrong the
    // same way)
    val got = df.orderBy("k").select("native").as[Long].collect().toSeq
    assert(got == keys.sorted.map(foldCount(bounds, _)),
      s"got $got")
  }

  test("string keys: byte-lexicographic upper_bound") {
    val bounds = Seq("apple", "cherry", "mango")
    val df = Seq("", "aardvark", "apple", "banana", "cherry", "zebra")
      .toDF("k")
      .withColumn("bs", typedLit(bounds))
      .withColumn("n",
        SearchExpressions.sortedLowerBoundCount(col("bs"), col("k")))
    val got = df.orderBy("k").select("n").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 1L, 2L, 3L), s"got $got")
  }

  test("null key and null/empty bounds follow the fold's coalesce shape") {
    val df = Seq((Some(5L), true), (None, true), (Some(5L), false))
      .toDF("k", "hasBounds")
      .withColumn("bs", when(col("hasBounds"),
        typedLit(Seq(1L, 9L))))
      .withColumn("n", coalesce(
        SearchExpressions.sortedLowerBoundCount(col("bs"), col("k")),
        lit(0L)))
    val got = df.select("n").as[Long].collect().toSeq
    assert(got == Seq(1L, 0L, 0L), s"got $got")
  }

  test("interpreted eval equals codegen (property over random arrays)") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 50).map { _ =>
      val bounds = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextLong() % 1000)
        .sorted
      val k = rnd.nextLong() % 1200
      (bounds, k)
    }
    // codegen path: through a DataFrame projection
    val df = cases.toDF("bs", "k")
      .withColumn("n",
        SearchExpressions.sortedLowerBoundCount(col("bs"), col("k")))
    val got = df.select("n").as[Long].collect().toSeq
    val want = cases.map { case (bs, k) => bs.count(_ <= k).toLong }
    assert(got == want)
    // interpreted path: eval directly on the expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    for (((bs, k), w) <- cases.zip(want)) {
      val e = org.apache.spark.sql.graft.SortedLowerBoundCount(
        Literal(new GenericArrayData(bs.toArray), ArrayType(LongType)),
        Literal(k))
      assert(e.eval(null) == w, s"interpreted diverged for ($bs, $k)")
    }
  }
}
