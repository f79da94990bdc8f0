package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AnalyticsAggregates, GraftFunctions}

/** The native Gram-matrix and bounded top-k aggregates: value
  * correctness against hand-computed fixtures, partial/merge behavior
  * across forced repartitions, edge cases (ragged input, NaN, empty
  * groups), and the SQL surface.
  */
class AnalyticsAggregatesSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  // --- gram_fx ---

  test("gramFx matches the hand-computed upper triangle") {
    // rows (1, 2, 3), (4, 5, 6) at scale 10 -> fx rows (10,20,30),
    // (40,50,60). G[0][0]=100+1600, G[0][1]=200+2000, G[0][2]=300+2400,
    // G[1][1]=400+2500, G[1][2]=600+3000, G[2][2]=900+3600
    val df = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)).toDF("v")
    val g = df.groupBy()
      .agg(AnalyticsAggregates.gramFx(col("v"), 3, 10.0).as("g"))
      .as[Seq[Long]].head()
    assert(g == Seq(1700L, 2200L, 2700L, 2900L, 3600L, 4500L))
  }

  test("gramFx partials merge exactly across partitions") {
    val df = spark.range(0, 1000).select(
      array(col("id").cast("double") / 100.0,
        (col("id") % 7).cast("double") / 7.0).as("v"))
    val one = df.coalesce(1).groupBy()
      .agg(AnalyticsAggregates.gramFx(col("v"), 2, 1e6).as("g"))
      .as[Seq[Long]].head()
    val many = df.repartition(16).groupBy()
      .agg(AnalyticsAggregates.gramFx(col("v"), 2, 1e6).as("g"))
      .as[Seq[Long]].head()
    assert(one == many, "fixed-point Gram must be partition-invariant")
  }

  test("gramFx is loud on ragged input and exact-zero on empty input") {
    val ragged = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v")
    val e = intercept[Exception] {
      ragged.groupBy()
        .agg(AnalyticsAggregates.gramFx(col("v"), 2, 10.0)).collect()
    }
    assert(e.getMessage != null)
    val empty = Seq.empty[Seq[Double]].toDF("v")
    val g = empty.groupBy()
      .agg(AnalyticsAggregates.gramFx(col("v"), 2, 10.0).as("g"))
      .as[Seq[Long]].head()
    assert(g == Seq(0L, 0L, 0L), "empty input is the all-zero matrix")
  }

  test("gramFx overflow throws instead of wrapping") {
    // fx components ~2^31 each -> one pair-product ~2^62; two rows
    // overflow the Long cell
    val big = Seq(Seq(2.0e9), Seq(2.0e9), Seq(2.0e9)).toDF("v")
    val e = intercept[Exception] {
      big.groupBy()
        .agg(AnalyticsAggregates.gramFx(col("v"), 1, 1.0)).collect()
    }
    assert((e.getMessage + e.getClass.getName).toLowerCase
      .contains("overflow"), s"expected loud overflow, got $e")
  }

  test("gram_fx SQL surface matches the Column API") {
    Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v")
      .createOrReplaceTempView("gram_sql_t")
    val sqlOut = spark.sql(
      "SELECT gram_fx(v, 2, 10) AS g FROM gram_sql_t")
      .as[Seq[Long]].head()
    assert(sqlOut == Seq(100L + 900L, 200L + 1200L, 400L + 1600L))
  }

  // --- top_k ---

  test("topK keeps the k largest with duplicates, sorted descending") {
    val df = Seq(("a", 5.0), ("a", 1.0), ("a", 5.0), ("a", 3.0),
      ("a", 2.0), ("b", 7.0)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(AnalyticsAggregates.topK(col("v"), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(5.0, 5.0, 3.0), "duplicates are retained")
    assert(out("b") == Seq(7.0), "under-full groups return what exists")
  }

  test("topK partials merge across partitions to the exact global top") {
    val df = spark.range(0, 10000)
      .select((col("id") % 4).cast("string").as("g"),
        col("id").cast("double").as("v"))
      .repartition(16)
    val out = df.groupBy("g")
      .agg(AnalyticsAggregates.topK(col("v"), 4).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // group g holds values {g, g+4, ...}; top-4 of group "3" is
    // 9999, 9995, 9991, 9987
    assert(out("3") == Seq(9999.0, 9995.0, 9991.0, 9987.0))
    assert(out("0") == Seq(9996.0, 9992.0, 9988.0, 9984.0))
  }

  test("topK skips NULL and NaN; all-null group yields empty array") {
    val df = Seq(("a", Some(1.0)), ("a", None),
      ("a", Some(Double.NaN)), ("a", Some(2.0)),
      ("b", None)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(AnalyticsAggregates.topK(col("v"), 5).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(out("a") == Seq(2.0, 1.0))
    assert(out("b") == Seq.empty[Double])
  }

  test("top_k SQL surface matches the window-form top-k on lineitem") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    li.createOrReplaceTempView("li_topk_t")
    val native = spark.sql(
      """SELECT l_returnflag, top_k(l_extendedprice, 5) AS top5
        |FROM li_topk_t GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val window = li.select(col("l_returnflag"), col("l_extendedprice"),
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("l_returnflag")
            .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
              col("l_linenumber"))).as("rn"))
      .filter(col("rn") <= 5)
      .groupBy("l_returnflag")
      .agg(sort_array(collect_list("l_extendedprice"), asc = false)
        .as("top5"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(native == window,
      "native heap top-k must equal the window-sort top-k values")
  }
}
