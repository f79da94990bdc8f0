package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators: hourly resampling with
  * gap-filling, and linear interpolation over the filled gaps — the
  * "make the series regular before modeling" step every metrics /
  * sensor / training-telemetry pipeline runs.
  *
  * Determinism (the house toolkit): per-hour values are summed in
  * integer micro-units (`floor(value·10^6)` cast to long — long sums
  * are order-independent where double sums are not), per-hour averages
  * and interpolation weights use integral `div` on positive operands
  * (truncation == floor there, and both engines agree), and the single
  * division back to a double happens once, on the OUTPUT column,
  * rounded. The interpolation is exact integer arithmetic until that
  * last step, so a SQL oracle hash-matches it.
  *
  * Scale: the aggregate is one hash-agg with map-side partials over the
  * raw stream; everything after runs on the SPINE (groups × hours),
  * whose size is set by the time window and group count, not the event
  * count — at 100 TB the spine for a month of hours × 10^5 series is
  * ~7×10^7 rows, orders of magnitude below the input. The per-group
  * interpolation windows partition by series key, so state per task is
  * one group's hours.
  */
object TimeseriesOps {

  /** Micro-unit fixed-point scale for value sums. */
  val Fx = 1000000L

  /** Hourly resample of (group, ts, value) with a COMPLETE hour spine
    * per group from the global min hour to the global max hour: absent
    * hours appear with `n = 0` and a null `v_fx`. Returns
    * (group, hour, n, v_fx) where `v_fx` is the micro-unit value sum.
    */
  def gapFillHourly(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(groupCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col(valueCol) * lit(Fx)).cast("long")).as("v_fx"))
    val bounds = df.agg(
      date_trunc("hour", min(col(tsCol))).as("h0"),
      date_trunc("hour", max(col(tsCol))).as("h1"))
    val spine = df.select(col(groupCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(groupCol),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    spine.join(hourly, Seq(groupCol, "hour"), "left")
      .select(col(groupCol), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"), col("v_fx"))
  }

  /** Median-absolute-deviation anomaly flags over a gap-filled hourly
    * count series, ENTIRELY in integers: medians are carried in
    * doubled units (`med2` = the sum of the two middle order
    * statistics — equal to 2·median for odd counts, the two-middle sum
    * for even), deviations in doubled units (`dev2 = |2n − med2|`),
    * the MAD in quadrupled units (`mad4`), and the classic
    * `dev > 3·MAD` robust threshold becomes `2·dev2 > 3·mad4` after
    * clearing denominators — no division, no rounding, anywhere. That
    * is what lets an outlier DETECTOR (usually a float-threshold
    * affair) hash-match a cross-engine oracle exactly.
    *
    * Shape: one exchange by series key, then two in-partition
    * sort+window passes over the SPINE (the gap-filled frame, sized by
    * time window × groups, not event count). Every row comes back with
    * its diagnostics and an integer flag — the caller filters or
    * alerts downstream.
    */
  def madAnomalies(gapFilled: DataFrame, groupCol: String): DataFrame = {
    val wRank = Window.partitionBy(groupCol)
      .orderBy(col("n").asc, col("hour").asc)
    val wAll = Window.partitionBy(groupCol)
    val ranked = gapFilled.select(col(groupCol), col("hour"), col("n"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("cnt", count(lit(1)).over(wAll))
    val med = ranked
      .withColumn("med2",
        sum(when(col("rn") === expr("(cnt + 1) div 2"), col("n")))
          .over(wAll) +
        sum(when(col("rn") === expr("(cnt + 2) div 2"), col("n")))
          .over(wAll))
      .withColumn("dev2", abs(lit(2) * col("n") - col("med2")))
    val wRank2 = Window.partitionBy(groupCol)
      .orderBy(col("dev2").asc, col("hour").asc)
    med.withColumn("rn2", row_number().over(wRank2))
      .withColumn("mad4",
        sum(when(col("rn2") === expr("(cnt + 1) div 2"), col("dev2")))
          .over(wAll) +
        sum(when(col("rn2") === expr("(cnt + 2) div 2"), col("dev2")))
          .over(wAll))
      .select(col(groupCol), col("hour"), col("n"), col("dev2"),
        col("mad4"),
        when(lit(2) * col("dev2") > lit(3) * col("mad4"), 1L)
          .otherwise(0L).as("is_anomaly"))
  }

  /** Linear interpolation over a gap-filled hourly frame (the
    * [[gapFillHourly]] output contract): observed hours carry their
    * per-hour fixed-point mean (`v_fx div n`), gap hours get the
    * integer linear blend of the nearest observed neighbors
    * (`(pv·(nh−he) + nv·(he−ph)) div (nh−ph)` — positive weights, so
    * truncating div == floor div in both engines), and hours before the
    * first / after the last observation carry the nearest value. Output
    * (group, hour, val) with the single rounded double division.
    */
  def interpolateLinear(gapFilled: DataFrame, groupCol: String): DataFrame = {
    val wPrev = Window.partitionBy(groupCol).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(groupCol).orderBy(col("hour"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withAvg = gapFilled
      .withColumn("he",
        expr("timestampdiff(HOUR, TIMESTAMP '1970-01-01 00:00:00', hour)"))
      .withColumn("avg_fx", expr("CASE WHEN n > 0 THEN v_fx div n END"))
    val flagged = withAvg
      .withColumn("ph",
        last(when(col("avg_fx").isNotNull, col("he")), ignoreNulls = true)
          .over(wPrev))
      .withColumn("pv",
        last(when(col("avg_fx").isNotNull, col("avg_fx")), ignoreNulls = true)
          .over(wPrev))
      .withColumn("nh",
        first(when(col("avg_fx").isNotNull, col("he")), ignoreNulls = true)
          .over(wNext))
      .withColumn("nv",
        first(when(col("avg_fx").isNotNull, col("avg_fx")), ignoreNulls = true)
          .over(wNext))
    flagged.select(col(groupCol), col("hour"),
      round(expr(
        """CASE WHEN avg_fx IS NOT NULL THEN avg_fx
          |     WHEN ph IS NULL THEN nv
          |     WHEN nh IS NULL THEN pv
          |     ELSE (pv * (nh - he) + nv * (he - ph)) div (nh - ph)
          |END""".stripMargin).cast("double") / lit(Fx.toDouble), 6)
        .as("val"))
  }

  /** Exponentially-weighted moving average with DYADIC weights — the
    * integer-exact EWMA. A float EWMA (`v_t = α·x_t + (1−α)·v_{t−1}`)
    * can never hash-match across engines: its state is a running
    * product of doubles whose rounding depends on evaluation order.
    * Truncating α = 1/2 at `depth` lags makes every weight a power of
    * two — weight of lag k is 2^(depth−1−k) — so numerator and
    * denominator are exact Longs and the ONE output division is the
    * only rounding anywhere. The truncation error vs the infinite tail
    * is ≤ 2^−depth of the oldest mass (depth 8 ⇒ < 0.4%), and series
    * heads shorter than `depth` renormalize over the weights actually
    * present rather than silently averaging in zeros.
    *
    * Shape: `depth` lags over ONE window pass — a single shuffle on
    * the group key, O(depth) state per stream, no self-join of the
    * series with itself. Runs on the gap-filled spine (time window ×
    * groups), not the raw event count, so cost is scale-independent
    * once the first hash-agg is done.
    */
  def ewmaDyadic(gapFilled: DataFrame, groupCol: String,
      valueCol: String = "n", depth: Int = 8): DataFrame = {
    require(depth >= 1 && depth <= 62, s"depth must be in [1,62]: $depth")
    val w = Window.partitionBy(groupCol).orderBy(col("hour"))
    val terms = (0 until depth).map { k =>
      (lag(col(valueCol), k).over(w), lit(1L << (depth - 1 - k)))
    }
    val num = terms.map { case (v, wt) => coalesce(v * wt, lit(0L)) }
      .reduce(_ + _)
    val den = terms.map { case (v, wt) =>
      when(v.isNotNull, wt).otherwise(lit(0L)) }.reduce(_ + _)
    gapFilled
      .withColumn("num", num)
      .withColumn("den", den)
      .select(col(groupCol), col("hour"), col(valueCol),
        col("num"), col("den"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("ewma"))
  }
}
