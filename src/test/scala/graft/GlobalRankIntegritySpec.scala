package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalOps
import graft.sources.Tables

/** Regression pins for the deterministic range-bucket rank
  * (RelationalOps.withRangeBuckets): the round-12 incident class —
  * spark_partition_id after a range exchange diverging between two
  * consumers of one lineage under AQE — corrupted stor4's rank ONLY
  * at sf0.1 with 32 shuffle partitions, so these pins run at exactly
  * that shape.
  */
class GlobalRankIntegritySpec extends SparkTestBase {
  test("stor4 file assignment yields exactly 64 files at sf0.1/32 parts") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val df = SparkEntry.queries("stor4_zorder_skip")(spark,
        "/root/testdata/sf0.1")
      val rows = df.orderBy("layout").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("linear", 64L), ("zorder", 64L)),
        s"got ${rows.mkString("; ")}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("globalRowNumber is a bijection onto 1..n at sf0.1") {
    val d = "/root/testdata/sf0.1"
    val base = Tables.lineitem(spark, d).select(
      datediff(col("l_shipdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long")
        .bitwiseAND(lit(4095L)).as("dm"),
      col("l_partkey").bitwiseAND(lit(4095L)).as("pk"),
      col("l_orderkey"), col("l_linenumber"))
      .withColumn("k", col("dm") * 4096 + col("pk"))
    val ranked = RelationalOps.globalRowNumber(base,
      Seq(col("k").asc, col("l_orderkey").asc,
        col("l_linenumber").asc), col("k"), "rk")
    val stats = ranked.agg(count(lit(1)).as("n"),
      countDistinct(col("rk")).as("nd"),
      min(col("rk")).as("mn"), max(col("rk")).as("mx")).collect()(0)
    val (n, nd, mn, mx) = (stats.getLong(0), stats.getLong(1),
      stats.getLong(2), stats.getLong(3))
    assert(nd == n && mn == 1L && mx == n,
      s"rank broken: n=$n distinct=$nd min=$mn max=$mx")
  }
}
