package graft

import org.apache.spark.SparkConf
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** O4 conf passthrough (the reference's retry budget): the defaults
  * object must carry the reference's exact Spark-level values and
  * actually apply them through both entry paths. */
class SparkConfDefaultsSpec extends AnyFunSuite {

  test("retryConf mirrors the reference's Spark retry budget") {
    assert(SparkConfDefaults.retryConf ==
      Map("spark.task.maxFailures" -> "12",
        "spark.stage.maxConsecutiveAttempts" -> "12"))
  }

  test("apply(SparkConf) sets every default") {
    val c = SparkConfDefaults(new SparkConf(loadDefaults = false))
    for ((k, v) <- SparkConfDefaults.retryConf)
      assert(c.get(k) == v, s"$k must be set on the SparkConf")
  }

  test("withDefaults(builder) is the Verify/Bench wiring") {
    // Builder internals are private; assert through the same fold the
    // builder path uses — a builder accepts each config key without
    // throwing and returns the builder for chaining.
    val b = SparkSession.builder()
    assert(SparkConfDefaults.withDefaults(b) eq b)
  }
}
