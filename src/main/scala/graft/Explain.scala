package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of named queries
  * (all of them when none are named) at SPARK_GRAFT_SF_DIR. Used to
  * check the shapes that matter at 100 TB — broadcasts on the dim/probe
  * sides, PushedFilters/ReadSchema on scans, no duplicated subplans, no
  * cartesian products, WholeStageCodegen spans over the hot
  * projections.
  *
  *   sbt "runMain graft.Explain d2_jaccard_pairs v4_ivf_topk"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(q) =>
          println(s"===== $name =====")
          println(q(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case None => System.err.println(s"[explain] unknown query: $name")
      }
    }
    spark.stop()
  }
}
