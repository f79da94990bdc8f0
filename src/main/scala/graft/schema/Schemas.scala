package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas at every boundary (SURVEY.md §1.3 — the reference infers
  * schema twice, pandas then Spark; we declare it once).
  *
  * Weather schemas mirror the reference's processed 10-column frame
  * (`weather_report_data_full_load_pipeline.py:73-81`) and the MySQL DDL
  * (`db_scripts/weather_table_creation.py:24-58`), with the deliberate
  * cleanup of SURVEY.md §1.2: `weatherDate` is a real TimestampType, not a
  * formatted string.
  */
object Schemas {

  // ---- reference-shaped weather schemas -----------------------------------

  /** Processed fact row — `weather_report_data` (DDL:24-36). */
  val weatherObservation: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("city", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("weatherDate", TimestampType),
    StructField("Temperature_in_Celsius", DoubleType),
    StructField("WindSpeed_km_per_hour", DoubleType),
    StructField("Humidity", IntegerType),
    StructField("WeatherDescription", StringType),
    StructField("jobdate", TimestampType)
  ))

  /** Weekly report — `weekly_avg_temp_report_data` (DDL:38-46). */
  val weeklyAvgTemp: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("city", StringType),
    StructField("week", IntegerType),
    StructField("average_temperature", DoubleType)
  ))

  /** Period humidity report — `weather_avg_humidity_report_data` (DDL:49-58). */
  val avgHumidityPeriod: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("city", StringType),
    StructField("average_humidity", DoubleType),
    StructField("start_date", DateType),
    StructField("end_date", DateType)
  ))

  /** Raw OpenWeatherMap 5-day/3-hour forecast payload shape — the nested
    * source the reference flattens in Python
    * (`weather_report_data_full_load_pipeline.py:19-45`). Declared so the
    * JSON source can parse with `from_json` instead of driver-side loops.
    */
  val forecastJson: StructType = StructType(Seq(
    StructField("list", ArrayType(StructType(Seq(
      StructField("dt", LongType),                       // epoch seconds (py:25)
      StructField("main", StructType(Seq(
        StructField("temp", DoubleType),                 // Kelvin (py:27)
        StructField("humidity", LongType)                // (py:28)
      ))),
      StructField("wind", StructType(Seq(
        StructField("speed", DoubleType)                 // m/s (py:29)
      ))),
      StructField("weather", ArrayType(StructType(Seq(
        StructField("description", StringType)           // (py:30)
      ))))
    )))),
    StructField("city", StructType(Seq(
      StructField("name", StringType),                   // (py:40)
      StructField("country", StringType),                // (py:41)
      StructField("coord", StructType(Seq(
        StructField("lat", DoubleType),                  // (py:44)
        StructField("lon", DoubleType)                   // (py:45)
      )))
    )))
  ))

  // ---- typed record classes ----------------------------------------------

  case class WeatherObservation(
      country: String,
      city: String,
      latitude: Double,
      longitude: Double,
      weatherDate: java.sql.Timestamp,
      Temperature_in_Celsius: Double,
      WindSpeed_km_per_hour: Double,
      Humidity: Int,
      WeatherDescription: String,
      jobdate: java.sql.Timestamp)

  case class WeeklyAvgTemp(
      country: String, city: String, week: Int, average_temperature: Double)

  case class AvgHumidityPeriod(
      country: String, city: String, average_humidity: Double,
      start_date: java.sql.Date, end_date: java.sql.Date)

  // ---- driver-provided test tables (FIXTURES.md §A) ----------------------

  case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
}
