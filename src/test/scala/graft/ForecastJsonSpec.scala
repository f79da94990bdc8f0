package graft

import graft.sources.ForecastJsonSource

/** S1–S4 parity (FIXTURES.md §B forecast_json): flatten + defaults,
  * including the variants the reference handles (`.get(...,'')` city
  * defaults) and the one it doesn't (empty `weather` array — unguarded
  * `['weather'][0]` at FULL:30 would throw; we default to "").
  */
class ForecastJsonSpec extends SparkTestBase {
  import spark.implicits._

  private val full =
    """{"list":[
      |{"dt":1700179200,"main":{"temp":300.0,"humidity":70},
      | "wind":{"speed":5.0},"weather":[{"description":"clear sky"}]},
      |{"dt":1700190000,"main":{"temp":290.5,"humidity":55},
      | "wind":{"speed":2.0},"weather":[{"description":"rain"},{"description":"x"}]}
      |],"city":{"name":"Houston","country":"US",
      | "coord":{"lat":29.76,"lon":-95.36}}}""".stripMargin.replace("\n", "")

  private val noCity = """{"list":[{"dt":1700179200,
    |"main":{"temp":280.0,"humidity":40},"wind":{"speed":1.0},
    |"weather":[]}]}""".stripMargin.replace("\n", "")

  test("flattens list elements with city metadata replicated") {
    val out = ForecastJsonSource.parse(Seq(full).toDF("payload"))
    assert(out.count() == 2)
    val r = out.orderBy($"weatherDate").head()
    assert(r.getAs[String]("country") == "US")
    assert(r.getAs[String]("city") == "Houston")
    assert(r.getAs[Double]("latitude") == 29.76)
    assert(r.getAs[Double]("Temperature") == 300.0)
    assert(r.getAs[Int]("Humidity") == 70)
    assert(r.getAs[Double]("WindSpeed") == 5.0)
    assert(r.getAs[String]("WeatherDescription") == "clear sky")
    // 1700179200 = 2023-11-17 00:00:00 UTC
    assert(r.getAs[java.sql.Timestamp]("weatherDate").toString
      == "2023-11-17 00:00:00.0")
  }

  test("weather[0] of multi-element array wins (FULL:30 semantics)") {
    val out = ForecastJsonSource.parse(Seq(full).toDF("payload"))
    val r = out.orderBy($"weatherDate".desc).head()
    assert(r.getAs[String]("WeatherDescription") == "rain")
  }

  test("missing city/coord and empty weather default, not crash") {
    val out = ForecastJsonSource.parse(Seq(noCity).toDF("payload"))
    val r = out.head()
    assert(r.getAs[String]("country") == "")
    assert(r.getAs[String]("city") == "")
    assert(r.isNullAt(r.fieldIndex("latitude")))
    assert(r.getAs[String]("WeatherDescription") == "")
  }

  test("empty forecast list produces zero rows") {
    val empty = """{"list":[],"city":{"name":"X","country":"Y",
      |"coord":{"lat":0.0,"lon":0.0}}}""".stripMargin.replace("\n", "")
    assert(ForecastJsonSource.parse(Seq(empty).toDF("payload")).count() == 0)
  }
}
