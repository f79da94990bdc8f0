package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchAggregates

/** Data-quality profiling operators — the "expectations" layer a
  * production pipeline runs before trusting a table: per-column
  * completeness / cardinality / range profiles, and referential
  * integrity between fact and dimension keys.
  *
  * Scale design: [[profile]] computes EVERY column's stats in ONE scan
  * and ONE aggregate — each column contributes a count, a null count,
  * a native KMV sketch buffer (≤8 KB partial per partition, no
  * per-column job, and critically no count-distinct Expand: c exact
  * distinct aggregates would multiply the scanned rows c-fold before
  * the shuffle), and optional min/max. KMV rather than HLL because a
  * profile's distinct counts are often TINY (status/priority enums),
  * where KMV is exact under k while the log-free raw HLL estimator
  * saturates at ≈2954. The per-column results travel as one
  * array-of-struct row and explode AFTER aggregation — profiling
  * output is O(columns), the data pass is O(1) scans regardless of how
  * many columns are profiled.
  */
object ProfileOps {

  /** One column's profiling spec: `hashInput` must be a STRING column
    * canonicalized identically to the verifying oracle (integers cast
    * to string are portable; doubles/timestamps must be canonicalized
    * to integers first — cross-engine string formatting of those types
    * is not stable). `range` supplies an optional numeric (double)
    * column for min/max.
    */
  final case class ProfileCol(name: String, hashInput: Column,
      range: Option[Column])

  /** Bottom-k size for the per-column distinct sketches: exact below
    * 1024 distinct, ~3% relative error above. */
  val ProfileK = 1024

  def profile(df: DataFrame, specs: Seq[ProfileCol]): DataFrame = {
    val entries = specs.map { s =>
      val est = round(SketchAggregates.kmvEstimate(
        concat(lit("kmv:"), s.hashInput), ProfileK), 2)
      val (mn, mx) = s.range match {
        case Some(c) => (round(min(c.cast("double")), 6),
          round(max(c.cast("double")), 6))
        case None => (lit(null).cast("double"), lit(null).cast("double"))
      }
      struct(lit(s.name).as("col_name"),
        count(lit(1)).as("n"),
        sum(when(s.hashInput.isNull, 1L).otherwise(0L)).as("n_null"),
        est.as("distinct_est"),
        mn.as("min_v"), mx.as("max_v"))
    }
    df.agg(array(entries: _*).as("p"))
      .select(explode(col("p")).as("e"))
      .select(col("e.col_name"), col("e.n"), col("e.n_null"),
        col("e.distinct_est"), col("e.min_v"), col("e.max_v"))
  }

  /** Referential-integrity check: for each (fact key, dim key) pair,
    * the count of fact rows whose key has no dimension match (orphans)
    * next to the fact row count. One anti-join per pair — the dim side
    * is its distinct key set, so the join broadcasts when the
    * dimension is small and hash-joins otherwise; no collects.
    */
  def refIntegrity(pairs: Seq[(String, DataFrame, Column, DataFrame,
      Column)]): DataFrame = {
    pairs.map { case (label, fact, fk, dim, pk) =>
      fact.select(fk.as("k"))
        .join(dim.select(pk.as("k")).distinct(), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(broadcast(
          fact.agg(count(lit(1)).as("n_rows"))))
        .select(lit(label).as("fk"), col("n_orphans"), col("n_rows"))
    }.reduce(_ union _)
  }

  /** Equi-width histogram over a fixed-point (Long) value — integer-
    * exact end to end. Bucket of a value v is `((v−min)·buckets) div
    * (max−min+1)`: all operands non-negative, so truncating div ==
    * floor div in both engines, and the result lands in [0, buckets−1]
    * with no clamp (`(v−min)·b < b·(max−min+1)` always). Callers
    * quantize doubles to fixed point FIRST (e.g. `floor(price·100)`
    * cents) — bucketing raw doubles would hash-split ties differently
    * per engine. Each bucket reports its count and the exact min/max
    * actually observed inside it.
    *
    * Shape: one 1-row min/max aggregate broadcast to a second scan +
    * hash agg to `buckets` rows (map-side partials) — two scans, no
    * driver-side min/max collect, the p8 broadcast-probe pattern.
    */
  def histogramFx(df: DataFrame, value: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val v = df.select(value.cast("long").as("fx")).filter(col("fx").isNotNull)
    val b = v.agg(min(col("fx")).as("mn"), max(col("fx")).as("mx"))
    v.crossJoin(broadcast(b))
      .select(expr(s"((fx - mn) * $buckets) div (mx - mn + 1)")
        .as("bucket"), col("fx"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("fx")).as("min_fx"), max(col("fx")).as("max_fx"))
  }
}
