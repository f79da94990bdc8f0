package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types.StructType

/** The DDL string Spark's schema-on-write JDBC path would issue for a
  * schema under a given connection URL's dialect — exposed so the K4
  * story can be pinned for the reference's ACTUAL target (MySQL)
  * without a MySQL server: `JdbcSink.append` on a missing table calls
  * exactly this mapping (JdbcUtils.createTable → schemaString) before
  * the INSERTs, so asserting the generated column types against the
  * reference's hand-written `weather_table_creation.py` DDL proves
  * wire-compatibility of the CREATE TABLE we'd send. Lives in the
  * spark.sql.graft shim package for the private[sql] JdbcUtils access
  * (the SignatureExpressions pattern).
  */
object JdbcDdl {

  def dialectFor(url: String): JdbcDialect = JdbcDialects.get(url)

  /** Column-definition list (no CREATE TABLE wrapper), e.g.
    * `"country" TEXT , "city" TEXT , "humidity" INTEGER`.
    */
  def schemaString(schema: StructType, url: String): String =
    JdbcUtils.schemaString(dialectFor(url), schema,
      caseSensitive = false, None)
}
