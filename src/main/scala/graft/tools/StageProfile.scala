package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Empirical per-stage profile of one or more SparkEntry queries (guide §1:
  * measure first). Runs each query through the same noop-sink protocol as
  * Bench (pass 1 warms codegen/JIT, pass 2 is reported) and prints, per
  * stage of the measured pass: wall time, summed executor run/CPU time,
  * input/shuffle volumes and task count — plus the driver-side gap (total
  * wall minus the union of stage windows), which is planning/collect/commit
  * overhead no stage accounts for.
  *
  * Usage: tools/run_main.sh graft.tools.StageProfile <sfDir> <q1> [q2 ...]
  */
object StageProfile {

  private final class Rec {
    var name = ""
    var submitted = 0L
    var completed = 0L
    var tasks = 0
    var runMs = 0L
    var cpuNs = 0L
    var gcMs = 0L
    var inputBytes = 0L
    var shufReadB = 0L
    var shufWriteB = 0L
    var rows = 0L
  }

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
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.Map.empty[Int, Rec]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        if (!collecting) return
        val si = e.stageInfo
        val r = stages.getOrElseUpdate(si.stageId, new Rec)
        // AQE stages all report `withThreadLocalCaptured` as their call
        // site; the first graft frame in the long-form details pins the
        // stage to the operator that submitted its execution.
        val graftFrame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("StageProfile"))
          .map(_.trim.stripPrefix("at ").takeWhile(_ != ')') + ")")
        r.name = graftFrame.getOrElse(si.name)
        r.submitted = si.submissionTime.getOrElse(0L)
        r.completed = si.completionTime.getOrElse(0L)
        r.tasks = si.numTasks
        val m = si.taskMetrics
        r.runMs = m.executorRunTime
        r.cpuNs = m.executorCpuTime
        r.gcMs = m.jvmGCTime
        r.inputBytes = m.inputMetrics.bytesRead
        r.shufReadB = m.shuffleReadMetrics.totalBytesRead
        r.shufWriteB = m.shuffleWriteMetrics.bytesWritten
        r.rows = m.outputMetrics.recordsWritten
      }
    })

    // same warmup as Bench
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try graft.core.Tables.t(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // pass 1: warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      // pass 2: measured
      stages.clear()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      collecting = false
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()

      println(s"\n===== $n: wall=${wallMs.round} ms =====")
      // driver gap: wall minus union of stage [submitted, completed] windows
      val windows = stages.values.filter(_.submitted > 0)
        .map(r => (r.submitted, r.completed)).toSeq.sortBy(_._1)
      val covered = windows.foldLeft((0L, 0L)) { case ((cov, hi), (s, c)) =>
        val lo = math.max(s, hi)
        (cov + math.max(0L, c - lo), math.max(hi, c))
      }._1
      println(f"driver/plan gap ≈ ${wallMs - covered}%.0f ms (stages cover $covered ms)")
      println(f"${"stage"}%-7s ${"wall"}%6s ${"runMs"}%7s ${"cpuMs"}%7s ${"gc"}%5s " +
        f"${"tasks"}%5s ${"input"}%9s ${"shRead"}%9s ${"shWrite"}%9s  name")
      stages.toSeq.sortBy(-_._2.runMs).foreach { case (id, r) =>
        val wall = r.completed - r.submitted
        println(f"$id%-7d $wall%6d ${r.runMs}%7d ${r.cpuNs / 1000000}%7d ${r.gcMs}%5d " +
          f"${r.tasks}%5d ${r.inputBytes}%9d ${r.shufReadB}%9d ${r.shufWriteB}%9d  ${r.name.take(60)}")
      }
    }
    spark.stop()
  }
}
