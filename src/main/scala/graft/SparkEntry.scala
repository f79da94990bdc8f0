package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registries live in QueriesReference / QueriesRelational /
  * QueriesText / QueriesVector / QueriesStreaming; this object is the union.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_weekly_avg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesReference.queries ++ QueriesRelational.queries ++
      QueriesText.queries ++ QueriesDedup.queries ++
      QueriesVector.queries ++ QueriesStreaming.queries ++
      QueriesFunctions.queries ++ QueriesSketch.queries ++
      QueriesCuration.queries ++ QueriesEvents.queries ++
      QueriesGraph.queries ++ QueriesTimeseries.queries ++
      QueriesProfile.queries ++ QueriesSql.queries ++
      QueriesStorage.queries ++ QueriesMl.queries

  /** Every family's shared persisted caches (name → builder), in
    * dependency order — dedup.tokens first because the text caches
    * read it. Bench forces these BEFORE its timed passes and reports
    * each build on its own `[bench-cache]` line, so per-query bench
    * times are net of cache and stop moving when a family gains
    * members (the r13 d14/x-family attribution-drift class). Families
    * without cross-query persisted frames are absent by construction.
    */
  private[graft] def sharedCaches
      : Seq[(String, (SparkSession, String) => DataFrame)] =
    QueriesDedup.sharedCaches ++ QueriesText.sharedCaches ++
      QueriesVector.sharedCaches ++ QueriesEvents.sharedCaches ++
      QueriesGraph.sharedCaches

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesReference.oracle ++ QueriesRelational.oracle ++
      QueriesText.oracle ++ QueriesDedup.oracle ++
      QueriesVector.oracle ++ QueriesStreaming.oracle ++
      QueriesFunctions.oracle ++ QueriesSketch.oracle ++
      QueriesCuration.oracle ++ QueriesEvents.oracle ++
      QueriesGraph.oracle ++ QueriesTimeseries.oracle ++
      QueriesProfile.oracle ++ QueriesSql.oracle ++
      QueriesStorage.oracle ++ QueriesMl.oracle
}
