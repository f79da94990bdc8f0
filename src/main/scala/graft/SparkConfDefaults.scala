package graft

import org.apache.spark.SparkConf
import org.apache.spark.sql.SparkSession

/** O4 — the reference's fault-tolerance conf surface, as a reusable
  * default set (the last reference-surface operator row; VERDICT r11
  * item 10).
  *
  * The reference provisions its cluster with aggressive retry budgets
  * so a transient executor loss never kills the nightly load:
  * `spark.task.maxFailures=12` and
  * `spark.stage.maxConsecutiveAttempts=12`
  * (reference `src/airflow_dags/weather_report_data_full_load_dag.py:70-71`,
  * alongside the YARN AM max-attempts=6 and MapReduce maxattempts=12
  * rows that have no Spark-side equivalent here), plus task-level
  * orchestrator retries (5 × 1 min, `:90-91`) which belong to the
  * scheduler wrapping the job, not the engine.
  *
  * These are STATIC confs (read once at SparkContext creation), so the
  * entry points apply them on the session BUILDER before getOrCreate —
  * `Verify` and `Bench` both route through [[withDefaults]]. In
  * `local[n]` mode Spark ignores task retries unless the master string
  * carries them (`local[n, maxFailures]`); the conf still documents and
  * ships the cluster-mode contract, which is where it matters.
  */
object SparkConfDefaults {

  /** The reference's Spark-level retry budget, verbatim. */
  val retryConf: Map[String, String] = Map(
    "spark.task.maxFailures" -> "12",
    "spark.stage.maxConsecutiveAttempts" -> "12")

  /** Apply the defaults to a session builder (pre-getOrCreate). */
  def withDefaults(b: SparkSession.Builder): SparkSession.Builder =
    retryConf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Apply the defaults to a bare SparkConf (cluster-submit path). */
  def apply(conf: SparkConf): SparkConf =
    retryConf.foldLeft(conf) { case (c, (k, v)) => c.set(k, v) }
}
