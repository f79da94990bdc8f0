package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.RelationalOps
import graft.sources.Tables
import graft.storage.StatsCatalog

/** The ANALYZE catalog's contract: exact decision stats, roundtrip
  * persistence, fingerprint-guarded staleness with the measured
  * fallback, and decision parity between the catalog-driven and the
  * per-invocation-measured join planners.
  */
class CatalogStatsSpec extends SparkTestBase {

  private def ord = Tables.orders(spark, sf0001)
    .select("o_custkey", "o_totalprice")
  private def cust = Tables.customer(spark, sf0001)
    .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))

  test("analyze computes exact rows/max/skew and roundtrips") {
    val st = StatsCatalog.analyze(spark, sf0001, "orders", ord, "o_custkey")
    val expected = ord.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .agg(max(col("n")), count(lit(1)), sum(col("n"))).collect()(0)
    val (mx, groups, tot) =
      (expected.getLong(0), expected.getLong(1), expected.getLong(2))
    assert(st.rows === tot)
    assert(st.maxKeyRows === mx)
    assert(st.skew === (mx * groups + tot - 1) / tot)
    // KMV is exact under k=4096 — sf0.001's key space is far smaller
    assert(st.ndv === groups)
    assert(StatsCatalog.read(sf0001, "orders", "o_custkey") === Some(st))
  }

  test("a torn/foreign entry reads as stale, not an exception") {
    StatsCatalog.analyze(spark, sf0001, "orders", ord, "o_custkey")
    val f = StatsCatalog.entryFile(sf0001, "orders", "o_custkey")
    // simulate a crash mid-write: a prefix of the entry survives
    Files.write(f.toPath,
      "fp=deadbeef\nrows=42\n".getBytes(StandardCharsets.UTF_8))
    assert(StatsCatalog.read(sf0001, "orders", "o_custkey") === None,
      "unparseable entries must fall back to re-ANALYZE, not throw")
    // the fallback self-heals the entry
    val r = StatsCatalog.readOrAnalyze(spark, sf0001, "orders", ord,
      "o_custkey")
    assert(r.source === "analyzed")
    assert(StatsCatalog.read(sf0001, "orders", "o_custkey")
      === Some(r.stats))
  }

  test("stale fingerprint is detected and re-analyzed, then cached") {
    StatsCatalog.analyze(spark, sf0001, "customer", cust, "o_custkey")
    val f = StatsCatalog.entryFile(sf0001, "customer", "o_custkey")
    val body = new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8)
      .replaceFirst("fp=\\S+", "fp=deadbeef")
    Files.write(f.toPath, body.getBytes(StandardCharsets.UTF_8))
    assert(StatsCatalog.read(sf0001, "customer", "o_custkey").isEmpty,
      "a stale fingerprint must not serve stats")
    val r1 = StatsCatalog.readOrAnalyze(spark, sf0001, "customer", cust,
      "o_custkey")
    assert(r1.source === "analyzed") // the fallback arm re-measured
    val r2 = StatsCatalog.readOrAnalyze(spark, sf0001, "customer", cust,
      "o_custkey")
    assert(r2.source === "catalog" && r2.stats === r1.stats)
  }

  test("decision parity: catalog planner agrees with the measured one") {
    val (measured, _) =
      RelationalOps.costGuardedJoin(ord, cust, Seq("o_custkey"))
    val (fromCatalog, src, (rightRows, skew), joined) =
      RelationalOps.costGuardedJoinFromCatalog(spark, sf0001,
        ord, "orders", "o_custkey", cust, "customer", "o_custkey",
        Seq("o_custkey"))
    assert(fromCatalog === measured)
    assert(src === "catalog") // warm from the tests above
    assert(rightRows === cust.count())
    assert(skew >= 1L)
    // strategy-invariant result: same as the plain join
    assert(joined.count() === ord.join(cust, "o_custkey").count())
  }

  test("catalog decision flips with the estimates (policy, not data)") {
    // thresholds are parameters — tighten them to force each arm
    val (s1, _, _, _) = RelationalOps.costGuardedJoinFromCatalog(spark,
      sf0001, ord, "orders", "o_custkey", cust, "customer", "o_custkey",
      Seq("o_custkey"), broadcastMaxRows = 1L, skewThreshold = 1000000L)
    assert(s1 === "shuffle")
    val (s2, _, _, joined) = RelationalOps.costGuardedJoinFromCatalog(
      spark, sf0001, ord, "orders", "o_custkey", cust, "customer",
      "o_custkey", Seq("o_custkey"), broadcastMaxRows = 1L,
      skewThreshold = 1L)
    assert(s2 === "salted")
    assert(joined.count() === ord.join(cust, "o_custkey").count())
  }
}
