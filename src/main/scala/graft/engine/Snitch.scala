package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Debug observer for intermediate step results — the reference's
  * SnitchOperator (SnitchOperator.scala:13-41, a pass-through logger on
  * every step's changelog stream), realized Spark-first: `df.observe`
  * attaches a CollectMetrics node (zero extra jobs, metrics ride the
  * action that executes the step) and a QueryExecutionListener reports
  * them. Off by default; enable with `spark.graft.debugSnitch=true`.
  */
object Snitch {

  val EnabledKey = "spark.graft.debugSnitch"

  private val logger = org.slf4j.LoggerFactory.getLogger("graft.snitch")

  /** Most recent observed (label, rowCount) metrics, newest last. */
  val observed = new ConcurrentLinkedQueue[(String, Long)]()

  @volatile private var installed = false

  /** Attach a row-count observation to a step DataFrame when snitching is
    * enabled; otherwise return the frame untouched.
    */
  def tap(df: DataFrame, label: String): DataFrame =
    if (!df.sparkSession.conf.get(EnabledKey, "false").toBoolean) df
    else {
      install(df.sparkSession)
      // observation names must be unique per Dataset; suffix with nanoTime
      df.observe(s"graft/$label/${System.nanoTime()}", count(lit(1)).as("rows"))
    }

  /** Register the reporting listener once per session. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!installed) {
      spark.listenerManager.register(new QueryExecutionListener {
        private def report(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
          qe.observedMetrics.foreach {
            case (name, row) if name.startsWith("graft/") =>
              val label = name.split('/')(1)
              val rows = row.getAs[Long]("rows")
              observed.add(label -> rows)
              logger.info(s"[snitch] step '$label': $rows rows")
            case _ => ()
          }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = report(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
      installed = true
    }
  }
}
