package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.WeatherOps
import graft.sinks.Sink

/** End-to-end pipelines (SURVEY.md §3, entry points E1/E2).
  *
  * E1 `FULL:main()` (FULL:118-178): observations → weekly temp report →
  * period humidity report → anti-join dedup → fact append.
  *
  * E2 `INC:main()` (INC:134-198): E1 plus the recency gate P8–P10.
  *
  * Deliberate fixes over the reference (each documented in SURVEY.md §7):
  *  - the source frame feeding three actions is `.persist()`ed — the
  *    reference recomputes the whole upstream plan per action (FULL:146,
  *    155,170 with no cache);
  *  - period end bound is exclusive (§1.2 string-date gotcha);
  *  - the INC:5 `from pyspark import F` crash-bug is "fixed" by
  *    implementing the documented intent;
  *  - all writes go through the [[graft.sinks.Sink]] trait, so MySQL/JDBC
  *    and parquet are interchangeable.
  */
final case class WeatherSinks(fact: Sink, weekly: Sink, humidity: Sink)

object WeatherPipeline {

  val dedupKeys: Seq[String] = Seq("country", "city", "weatherDate")

  /** E1. `observations` carries the raw columns (country, city, latitude,
    * longitude, weatherDate, Temperature[K], Humidity, WindSpeed[m/s],
    * WeatherDescription) — i.e. the output of
    * [[graft.sources.ForecastJsonSource.parse]].
    */
  def fullLoad(spark: SparkSession, observations: DataFrame,
      sinks: WeatherSinks, periodStart: Column, periodEndExclusive: Column,
      clock: Column = current_timestamp()): Unit = {
    val processed = WeatherOps.processObservations(observations, clock)
      .persist()
    try {
      val weekly = WeatherOps.weeklyAvg(processed, Seq("country", "city"),
        "weatherDate", "Temperature_in_Celsius", "average_temperature")
      sinks.weekly.append(weekly)

      val humidity = WeatherOps.periodAvg(processed, Seq("country", "city"),
        "weatherDate", "Humidity", "average_humidity",
        periodStart, periodEndExclusive)
        .withColumn("start_date", periodStart.cast("date"))
        .withColumn("end_date", periodEndExclusive.cast("date"))
      sinks.humidity.append(humidity)

      val newRows =
        if (sinks.fact.isEmpty(spark)) processed
        else WeatherOps.antiJoinNewRows(processed,
          sinks.fact.read(spark), dedupKeys)
      sinks.fact.append(newRows)
    } finally processed.unpersist()
  }

  /** E2: E1 with the "last one hour" recency gate applied first
    * (INC:85-99). `now` defaults to the batch's own max timestamp so the
    * gate is deterministic and executor-clock-independent.
    */
  def incrementalLoad(spark: SparkSession, observations: DataFrame,
      sinks: WeatherSinks, periodStart: Column, periodEndExclusive: Column,
      clock: Column = current_timestamp(),
      recencySeconds: Long = 3600L): Unit = {
    // The persist still matters: three sink actions fan out downstream,
    // and without it each would recompute the whole upstream plan (e.g.
    // an HTTP fetch + JSON parse).
    val obs = observations.persist()
    try {
      // max-timestamp probe as a broadcast 1-row cross join (the same
      // shape as the p8_p10 query path) — no driver-side action, so the
      // probe fuses into the job instead of forcing an extra round-trip
      val maxTs = obs.agg(max(col("weatherDate")).as("__graft_now"))
      val recent = WeatherOps.recencyFilter(
        obs.crossJoin(broadcast(maxTs)), "weatherDate",
        col("__graft_now"), recencySeconds)
        .drop("__graft_now")
      fullLoad(spark, recent, sinks, periodStart, periodEndExclusive, clock)
    } finally obs.unpersist()
  }
}
