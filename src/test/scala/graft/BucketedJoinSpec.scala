package graft

import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join technique the 100 TB design leans
  * on: write both join sides bucketed by the join key, and every
  * subsequent join on that key needs NO exchange on either side (the
  * bucket layout IS the hash partitioning). This spec proves the claim
  * on this engine rather than asserting it: a plain parquet join plans
  * two Exchanges; the identical join over bucketed tables plans zero.
  *
  * At 100 TB this is the difference between re-shuffling ~the whole
  * fact table on every lineitem⋈orders query and paying the shuffle
  * ONCE at write time — the standard layout for a fact table that is
  * joined on the same key by most of the workload.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed tables join with zero exchanges; plain parquet needs two") {
    // (tables land in the session's default warehouse dir and are
    // dropped in the finally — warehouse.dir is a static conf)
    // AQE off so the initial plan is the executed plan shape; broadcast
    // off so the comparison is shuffle-join vs bucket-join, not a
    // broadcast short-circuit at this toy scale
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.sources.Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_quantity")
      val ord = graft.sources.Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_orderpriority")

      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val plainExchanges = "Exchange hashpartitioning".r
        .findAllIn(plain.queryExecution.executedPlan.toString).size
      assert(plainExchanges == 2,
        s"plain parquet join should shuffle both sides, " +
          s"got $plainExchanges exchanges")

      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_b")
      val bucketed = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      val p = bucketed.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucket-aligned join must need NO exchange on either side:\n$p")
      // and it computes the same result
      assert(bucketed.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
