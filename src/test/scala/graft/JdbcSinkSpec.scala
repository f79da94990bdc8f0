package graft

import java.util.Properties

import org.apache.spark.sql.functions._
import graft.pipeline.{WeatherPipeline, WeatherSinks}
import graft.sinks.JdbcSink

/** K1–K3/S5-JDBC parity, exercised for real against embedded Derby (the
  * JDBC engine shipping in Spark's jar dir) — the reference's durable
  * store is MySQL over the same `DataFrameWriter.jdbc` API
  * (FULL:146-171), so this drives the exact write/read/bootstrap paths a
  * MySQL user hits: schema-on-write first append (K4 replacement),
  * append-mode accumulation, read-back, and the E1 fullLoad anti-join
  * over JDBC-backed sinks.
  */
class JdbcSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def batch = Seq(
    ("US", "Houston", 29.76, -95.36, ts("2023-11-17 00:00:00"), 300.0, 70, 5.0, "clear"),
    ("US", "Houston", 29.76, -95.36, ts("2023-11-17 03:00:00"), 290.0, 55, 2.0, "rain"),
    ("US", "Austin", 30.27, -97.74, ts("2023-11-17 00:00:00"), 295.0, 61, 1.0, "mist")
  ).toDF("country", "city", "latitude", "longitude", "weatherDate",
    "Temperature", "Humidity", "WindSpeed", "WeatherDescription")

  test("isEmpty on a missing table reports empty instead of crashing") {
    val sink = JdbcSink(url("graft_missing"), "no_such_table", props)
    assert(sink.isEmpty(spark))
  }

  test("schema-on-write bootstrap, append accumulation, read-back") {
    val sink = JdbcSink(url("graft_rw"), "observations", props)
    assert(sink.isEmpty(spark))
    sink.append(batch)
    assert(!sink.isEmpty(spark))
    assert(sink.read(spark).count() == 3)
    sink.append(batch.limit(1))
    assert(sink.read(spark).count() == 4)
    val cities = sink.read(spark).select("city")
      .as[String].collect().toSet
    assert(cities == Set("Houston", "Austin"))
  }

  test("E1 fullLoad over JDBC sinks: fact deduped across reruns") {
    val sinks = WeatherSinks(
      JdbcSink(url("graft_e1"), "weather_fact", props),
      JdbcSink(url("graft_e1"), "weekly_report", props),
      JdbcSink(url("graft_e1"), "humidity_report", props))
    val start = lit("2023-11-17 00:00:00").cast("timestamp")
    val end = lit("2023-11-18 00:00:00").cast("timestamp")
    val clock = lit("2023-11-25 12:00:00").cast("timestamp")
    WeatherPipeline.fullLoad(spark, batch, sinks, start, end, clock)
    assert(sinks.fact.read(spark).count() == 3)
    assert(sinks.weekly.read(spark).count() == 2)
    assert(sinks.humidity.read(spark).count() == 2)
    // rerun: J1 anti-join against the JDBC-backed fact table
    WeatherPipeline.fullLoad(spark, batch, sinks, start, end, clock)
    assert(sinks.fact.read(spark).count() == 3)
    assert(sinks.weekly.read(spark).count() == 4)
  }
}
