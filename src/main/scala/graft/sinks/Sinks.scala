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
    // Resolve the filesystem FROM the path (s3a://, hdfs://, file:, …) —
    // FileSystem.get(conf) returns the *default* FS and silently probes
    // the wrong store for any non-default scheme.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !fs.exists(p) || fs.listStatus(p).isEmpty
  }
}

/** JDBC parity sink (K1–K3: `FULL:146-148,155-157,170-171`; connection
  * properties `FULL:127-132`). Exercised in `JdbcSinkSpec` against
  * embedded Derby (the JDBC driver that ships with Spark).
  */
final case class JdbcSink(url: String, table: String,
    properties: java.util.Properties) extends Sink {
  def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, properties)
  def read(spark: SparkSession): DataFrame =
    spark.read.jdbc(url, table, properties)
  /** A sink whose table doesn't exist yet IS empty — the first
    * schema-on-write append creates it, so `read` failing to resolve the
    * table must report empty, not crash the bootstrap run.
    */
  def isEmpty(spark: SparkSession): Boolean =
    try read(spark).isEmpty
    catch { case _: Exception => true }
}
