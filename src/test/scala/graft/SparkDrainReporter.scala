package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Reporter
import org.scalatest.events.{Event, RunAborted, RunCompleted, RunStopped}

/** Shuts the shared test SparkSession down *gracefully* once the whole
  * ScalaTest run finishes, instead of leaving it to Spark's JVM shutdown
  * hook.
  *
  * Why: every suite shares one JVM-wide SparkContext (`getOrCreate`), and
  * nothing stops it — the context dies in Spark's shutdown hook at JVM
  * exit. An async SQLExecution thread (AQE stage materialization /
  * broadcast relation futures run on `SQLExecution.withThreadLocalCaptured`
  * pools and can outlive the action that spawned them) may still be
  * delivering task results at that point; the scheduler's TaskResultGetter
  * pool is already terminated and throws
  * `RejectedExecutionException` inside `TaskSchedulerImpl.statusUpdate` —
  * a shutdown race that turned a green 309/309 run into a red exit
  * (VERIFY_r12 `tests_ok: false`). Registered via build.sbt
  * (`Tests.Argument(..., "-C", "graft.SparkDrainReporter")`), so it is
  * constructed inside the forked test JVM and sees every run end —
  * completed, stopped or aborted.
  *
  * The drain: stop active streaming queries, cancel stragglers, wait
  * (bounded) until the scheduler reports no active jobs, give the last
  * in-flight status updates a beat to land, then stop the session on the
  * main thread — making Spark's own shutdown hook a no-op.
  */
class SparkDrainReporter extends Reporter {

  override def apply(event: Event): Unit = event match {
    case _: RunCompleted | _: RunStopped | _: RunAborted =>
      SparkDrainReporter.drainAndStop()
    case _ => ()
  }
}

object SparkDrainReporter {

  private[graft] def drainAndStop(): Unit = synchronized {
    val session = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    session.foreach { spark =>
      val sc = spark.sparkContext
      if (!sc.isStopped) {
        // streaming queries own their own execution threads — stop them
        // first so they stop submitting new jobs
        try spark.streams.active.foreach { q =>
          try q.stop() catch { case _: Throwable => () }
        } catch { case _: Throwable => () }
        try {
          sc.cancelAllJobs()
          val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
          while (sc.statusTracker.getActiveJobIds.nonEmpty &&
            System.nanoTime() < deadline) Thread.sleep(50)
          // the last statusUpdate for a just-finished/killed task can trail
          // the job's removal from the status tracker by a beat
          Thread.sleep(300)
        } catch { case _: Throwable => () }
        try spark.stop() catch { case _: Throwable => () }
      }
    }
  }
}
