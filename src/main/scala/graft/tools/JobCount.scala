package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool (guide §1.1 empirical loop, headless stand-in for the Spark
  * UI): run catalog queries once warm and report where the wall clock
  * goes — jobs launched, stages, tasks, summed task time vs wall — so a
  * query whose wall is 10× its task time is diagnosed as
  * scheduling/driver-bound (fixed per-job overhead) rather than
  * compute-bound, BEFORE any optimization is attempted.
  *
  *   tools/run.sh graft.tools.JobCount <sfDir> <name>[,name...] [iters]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val iters = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    @volatile var gcMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var inputB = 0L
    // per-stage task time keyed by the stage's call-site description —
    // the headless stand-in for the UI's per-stage breakdown.
    // ONE shared lock guards the counters and the map from both the
    // listener-bus thread and main()'s reset (separate monitors would
    // let a straggler stage event race byStage.clear()).
    val lock = new Object
    val byStage = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        lock.synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          stages += 1
          val key = s.stageInfo.name.take(120)
          val t = Option(s.stageInfo.taskMetrics)
            .map(_.executorRunTime).getOrElse(0L)
          val (pt, pn) = byStage.getOrElse(key, (0L, 0L))
          byStage(key) = (pt + t, pn + 1)
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = lock.synchronized {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          gcMs += m.jvmGCTime
          shuffleReadB += m.shuffleReadMetrics.totalBytesRead
          shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
          inputB += m.inputMetrics.bytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup (codegen, caches)
      (1 to iters).foreach { it =>
        // listener bus is async (and private); a short settle keeps event
        // attribution honest enough for a dev diagnostic
        Thread.sleep(500)
        lock.synchronized {
          jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; gcMs = 0
          shuffleReadB = 0; shuffleWriteB = 0; inputB = 0; byStage.clear()
        }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wallS = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        // snapshot every counter inside ONE lock hold: the listener bus is
        // async, and reading the volatiles piecemeal let a straggler event
        // land between reads and skew one line's attribution (r15 advice)
        val (sJobs, sStages, sTasks, sTaskMs, sGcMs, sShufR, sShufW, sInB) =
          lock.synchronized {
            (jobs, stages, tasks, taskTimeMs, gcMs, shuffleReadB,
              shuffleWriteB, inputB)
          }
        println(f"[jobcount] $name it=$it wall=$wallS%.3fs jobs=$sJobs " +
          f"stages=$sStages tasks=$sTasks taskTime=${sTaskMs / 1e3}%.3fs " +
          f"gc=${sGcMs / 1e3}%.3fs shufR=${sShufR / 1e6}%.1fMB " +
          f"shufW=${sShufW / 1e6}%.1fMB input=${sInB / 1e6}%.1fMB " +
          f"par=${sTaskMs / 1e3 / math.max(wallS, 1e-9)}%.2fx")
        if (it == iters)
          lock.synchronized(byStage.toSeq).sortBy(-_._2._1).take(8)
            .foreach { case (k, (t, n)) =>
              println(f"[jobcount]   stage ${t / 1e3}%7.2fs x$n%-3d $k")
            }
      }
    }
    spark.stop()
  }
}
