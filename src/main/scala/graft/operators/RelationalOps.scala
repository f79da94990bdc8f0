package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / top-k / set-op operators — the SURVEY.md §2.7 capability gaps
  * (absent from the reference, mandated by the north-star extension).
  *
  * Scale notes (100 TB discipline):
  *  - Per-group top-k is a window + filter: one shuffle on the partition
  *    keys, no global sort. Rank state is O(1) per partition stream.
  *  - Global top-k is `orderBy(...).limit(k)` which Spark plans as
  *    TakeOrderedAndProject: per-partition bounded heaps + driver merge of
  *    k·numPartitions rows — never a full sort of the table.
  *  - Running totals use an explicit ROWS frame: RANGE (the default when an
  *    ORDER BY is present) buffers peer groups and is both slower and
  *    ambiguous under ties.
  */
object RelationalOps {

  /** Top-k rows per group, deterministically tie-broken by `tiebreak`. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String],
      orderBy: Seq[Column], k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Running aggregate with an explicit ROWS UNBOUNDED PRECEDING frame. */
  def runningAgg(df: DataFrame, partitionCols: Seq[String],
      orderBy: Seq[Column], aggExpr: Column, outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, aggExpr.over(w))
  }

  /** Sliding aggregate over the last `nRows` rows (inclusive of current). */
  def slidingAgg(df: DataFrame, partitionCols: Seq[String],
      orderBy: Seq[Column], aggExpr: Column, nRows: Int,
      outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    df.withColumn(outCol, aggExpr.over(w))
  }

  /** Global top-k — plans as TakeOrderedAndProject (no full sort). */
  def topKGlobal(df: DataFrame, orderBy: Seq[Column], k: Int): DataFrame =
    df.orderBy(orderBy: _*).limit(k)
}
