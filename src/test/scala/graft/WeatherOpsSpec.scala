package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.WeatherOps
import graft.schema.Schemas

class WeatherOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Raw observation rows as produced by the source layer (pre-conversion).
  private def rawObs(city: String, t: String, tempK: Double, hum: Int,
      windMs: Double) =
    ("US", city, 29.76, -95.36, ts(t), tempK, hum, windMs, "clear sky")

  private lazy val raw = Seq(
    rawObs("Houston", "2023-11-17 00:00:00", 300.0, 70, 5.0),
    rawObs("Houston", "2023-11-17 03:00:00", 290.456, 55, 2.345),
    rawObs("Houston", "2023-11-24 00:00:00", 280.0, 40, 10.0),
    rawObs("Austin", "2023-11-17 00:00:00", 295.15, 61, 0.0)
  ).toDF("country", "city", "latitude", "longitude", "weatherDate",
    "Temperature", "Humidity", "WindSpeed", "WeatherDescription")

  private val clock = lit("2023-11-25 12:00:00").cast("timestamp")

  test("P1-P6 processObservations: conversions, rounding, column order") {
    val out = WeatherOps.processObservations(raw, clock)
    assert(out.columns.toSeq == Schemas.weatherObservation.fieldNames.toSeq
      .map(c => if (c == "jobdate") "jobdate" else c))
    val h = out.filter($"city" === "Houston" &&
      $"weatherDate" === ts("2023-11-17 03:00:00")).head()
    // 290.456 - 273.15 = 17.306 -> 17.31 (HALF_UP); 2.345*3.6 = 8.442 -> 8.44
    assert(h.getAs[Double]("Temperature_in_Celsius") == 17.31)
    assert(h.getAs[Double]("WindSpeed_km_per_hour") == 8.44)
    assert(h.getAs[Int]("Humidity") == 55)
  }

  test("P7 periodFilter: end bound exclusive (SURVEY §1.2 cleanup)") {
    val out = WeatherOps.periodFilter(raw, "weatherDate",
      lit("2023-11-17 00:00:00").cast("timestamp"),
      lit("2023-11-17 03:00:00").cast("timestamp"))
    assert(out.count() == 2) // both 00:00 rows; 03:00 excluded
  }

  test("P8-P10 recencyFilter: age window, scratch column dropped") {
    val now = lit("2023-11-24 00:30:00").cast("timestamp")
    val out = WeatherOps.recencyFilter(raw, "weatherDate", now, 3600L)
    assert(out.count() == 1)
    assert(!out.columns.contains("time_diff"))
    // future rows (negative age) excluded:
    val past = WeatherOps.recencyFilter(raw, "weatherDate",
      lit("2023-11-16 23:00:00").cast("timestamp"), 3600L)
    assert(past.count() == 0)
  }

  test("A1 weeklyAvg: ISO week grouping + round(avg,2)") {
    val processed = WeatherOps.processObservations(raw, clock)
    val out = WeatherOps.weeklyAvg(processed, Seq("country", "city"),
      "weatherDate", "Temperature_in_Celsius", "average_temperature")
    // Houston 2023-11-17 (ISO week 46): (26.85 + 17.31)/2 = 22.08
    val w46 = out.filter($"city" === "Houston" && $"week" === 46).head()
    assert(w46.getAs[Double]("average_temperature") == 22.08)
    assert(out.count() == 3) // Houston w46, Houston w47, Austin w46
  }

  test("A2 periodAvg + P11 literals") {
    val processed = WeatherOps.processObservations(raw, clock)
    val out = WeatherOps.periodAvg(processed, Seq("country", "city"),
      "weatherDate", "Humidity", "average_humidity",
      lit("2023-11-17 00:00:00").cast("timestamp"),
      lit("2023-11-18 00:00:00").cast("timestamp"))
    val h = out.filter($"city" === "Houston").head()
    assert(h.getAs[Double]("average_humidity") == 62.5)
  }

  test("J1 antiJoinNewRows: composite-key dedup + idempotence") {
    val existing = raw.limit(2)
    val out = WeatherOps.antiJoinNewRows(raw, existing,
      Seq("country", "city", "weatherDate"))
    assert(out.count() == 2)
    // idempotence: re-applying against (existing ∪ out) yields nothing new
    val out2 = WeatherOps.antiJoinNewRows(raw,
      existing.unionByName(out.select(existing.columns.map(col): _*)),
      Seq("country", "city", "weatherDate"))
    assert(out2.count() == 0)
  }
}
