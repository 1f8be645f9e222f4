package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Prints the FINAL (post-execution, AQE-resolved) physical plan of every
  * SQL execution a query runs — the counts/collects its operators issue
  * while the DataFrame is being built as well as the terminal noop save.
  * PlanAudit shows the pre-execution plan of the final frame only; when a
  * query's cost hides in its intermediate actions (eager materializes,
  * edge counts, driver union-find collects), this is the view that shows
  * which subtrees each action actually re-ran and what AQE turned them
  * into (ReusedExchange, join strategy, stage shapes).
  *
  * Usage: tools/run_main.sh graft.tools.ExecPlans <sfDir> <q1> [q2 ...]
  */
object ExecPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q31_clean_corpus")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var n = 0
    var emit = false
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit = {
        if (!emit) return
        n += 1
        println(s"\n----- execution $n ($f, ${ns / 1000000} ms) -----")
        println(qe.explainString(org.apache.spark.sql.execution.SimpleMode))
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    names.foreach { name =>
      println(s"\n========== $name ==========")
      n = 0
      emit = true
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      // let the (async) listener drain before switching queries
      Thread.sleep(1500)
      emit = false
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
