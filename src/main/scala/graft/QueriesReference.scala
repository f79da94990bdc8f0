package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.WeatherOps
import graft.sources.Tables

/** Oracle-verified queries exercising the reference's operator surface
  * (SURVEY.md §2.1–2.4: S2/S5, P1–P11, A1–A2, J1) over the driver-provided
  * test tables. Each entry has matching ANSI SQL in [[oracle]] — column
  * names and types are aligned on both sides (driver hash-compares after
  * sorting columns by name).
  */
object QueriesReference {

  private val periodStart = "2024-01-10 00:00:00"
  private val periodEnd = "2024-01-20 00:00:00"
  private val splitTs = "2024-01-25 00:00:00"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+P2+P4+P5+P6 (FULL:67-81): arithmetic derive + round + project.
    "p1_p6_unit_convert" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        col("event_type"),
        round(WeatherOps.kelvinToCelsius(col("value")), 2)
          .as("value_celsius"),
        round(WeatherOps.msToKmh(col("value")), 2).as("value_kmh"))
    }),

    // P7 (FULL:101): end-exclusive period filter, pushed to the parquet scan.
    "p7_period_filter" -> ((s, d) => {
      WeatherOps.periodFilter(Tables.events(s, d), "ts",
        lit(periodStart).cast("timestamp"), lit(periodEnd).cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    }),

    // P8–P10 (INC:85-99): recency gate against a deterministic "now" (the
    // table max — broadcast 1-row join, no driver round-trip).
    "p8_p10_recency_filter" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val now = ev.agg(max(col("ts")).as("now_ts"))
      WeatherOps.recencyFilter(ev.crossJoin(broadcast(now)), "ts",
        col("now_ts"), 86400L)
        .select("event_id", "ts", "user_id", "event_type", "value")
    }),

    // A1 (FULL:86-94): group by (key, ISO week), round(avg, 2).
    "a1_weekly_avg" -> ((s, d) => {
      WeatherOps.weeklyAvg(Tables.events(s, d), Seq("event_type"), "ts",
        "value", "average_value")
        .withColumn("week", col("week").cast("long"))
    }),

    // A2 (FULL:97-115): period filter → grouped avg → P11 literal columns.
    "a2_period_avg" -> ((s, d) => {
      WeatherOps.periodAvg(Tables.events(s, d), Seq("event_type"), "ts",
        "value", "average_value",
        lit(periodStart).cast("timestamp"), lit(periodEnd).cast("timestamp"))
        .withColumn("start_date", lit("2024-01-10"))
        .withColumn("end_date", lit("2024-01-20"))
    }),

    // J1 (FULL:160-171): left-anti dedup of a "new batch" against the
    // "existing" store on a composite key.
    "j1_anti_join_dedup" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cut = lit(splitTs).cast("timestamp")
      val newBatch = ev.filter(col("ts") >= cut)
      val existing = ev.filter(col("ts") < cut)
      WeatherOps.antiJoinNewRows(newBatch, existing,
        Seq("user_id", "event_type", "value"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    }),

    // S2 analog (FULL:24-37): JSON field extraction on executors. Uses the
    // native single-key scanner (JsonExpressions) rather than `from_json` —
    // a full Jackson parse per row to recover one scalar was the bench's
    // dominant constant (~7 s at sf0.1); the scanner is semantically
    // identical here (JsonExpressionsSpec asserts from_json parity).
    "s2_json_extract" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        org.apache.spark.sql.graft.JsonExpressions
          .jsonGetLong(col("props"), "k").as("k_val"))
    }),

    // TPC-H Q1-shaped pricing summary — the classic partial-agg headline
    // (map-side combine shrinks the shuffle to #groups).
    "q1_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    })
  )

  def oracle: Map[String, String] = Map(
    "p1_p6_unit_convert" ->
      """SELECT event_id, event_type,
        |  round(value - 273.15, 2) AS value_celsius,
        |  round(value * 3.6, 2) AS value_kmh
        |FROM events""".stripMargin,
    "p7_period_filter" ->
      s"""SELECT event_id, ts, user_id, event_type, value FROM events
         |WHERE ts >= TIMESTAMP '$periodStart'
         |  AND ts < TIMESTAMP '$periodEnd'""".stripMargin,
    "p8_p10_recency_filter" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events, (SELECT max(ts) AS now_ts FROM events) m
        |WHERE date_diff('second', ts, now_ts) BETWEEN 0 AND 86400"""
        .stripMargin,
    "a1_weekly_avg" ->
      """SELECT event_type, weekofyear(ts) AS week,
        |  round(avg(value), 2) AS average_value
        |FROM events GROUP BY event_type, weekofyear(ts)""".stripMargin,
    "a2_period_avg" ->
      s"""SELECT event_type, round(avg(value), 2) AS average_value,
         |  '2024-01-10' AS start_date, '2024-01-20' AS end_date
         |FROM events
         |WHERE ts >= TIMESTAMP '$periodStart'
         |  AND ts < TIMESTAMP '$periodEnd'
         |GROUP BY event_type""".stripMargin,
    "j1_anti_join_dedup" ->
      s"""SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value
         |FROM events e
         |WHERE e.ts >= TIMESTAMP '$splitTs'
         |  AND NOT EXISTS (SELECT 1 FROM events x
         |    WHERE x.ts < TIMESTAMP '$splitTs'
         |      AND x.user_id = e.user_id
         |      AND x.event_type = e.event_type
         |      AND x.value = e.value)""".stripMargin,
    "s2_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
