package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sinks (SURVEY.md §2.5, K1–K4). The reference appends to three MySQL
  * tables over JDBC (`FULL:146-171`) after a client-side DDL bootstrap
  * (`db_scripts/weather_table_creation.py`). Behind one trait we provide:
  *
  *  - [[ParquetSink]] — the engine-native store: append-mode parquet,
  *    optionally partitioned. At 100 TB a date/country partitioning makes
  *    the J1 anti-join's "existing" scan partition-prunable.
  *  - [[JdbcSink]] — K1–K3 parity for users who keep MySQL; schema-on-write
  *    replaces K4's DDL script (`createTableOptions` honored on first write).
  */
trait Sink {
  /** Append `df`; returns a reader for the sink's current contents (used by
    * the J1 anti-join to fetch "existing"). */
  def append(df: DataFrame): Unit
  def read(spark: SparkSession): DataFrame
  def isEmpty(spark: SparkSession): Boolean
}

final case class ParquetSink(path: String,
    partitionCols: Seq[String] = Nil) extends Sink {
  def append(df: DataFrame): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
  def isEmpty(spark: SparkSession): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    !fs.exists(new org.apache.hadoop.fs.Path(path)) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(path)).isEmpty
  }
}

/** JDBC parity sink (K1–K3: `FULL:146-148,155-157,170-171`; connection
  * properties `FULL:127-132`). Not exercised by tests (no DB in the test
  * environment) but kept API-complete.
  */
final case class JdbcSink(url: String, table: String,
    properties: java.util.Properties) extends Sink {
  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, properties)
  def read(spark: SparkSession): DataFrame =
    spark.read.jdbc(url, table, properties)
  def isEmpty(spark: SparkSession): Boolean = read(spark).isEmpty
}
