package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r15): characterize WITHIN-JVM decay of the streaming exec
  * gates. The full-catalog JobCount sweep measured the same gate at 2-3×
  * its fresh-JVM task time late in a long session (stream_hourly_exec
  * 7.3 s → 16.2 s task time; stream_bm25_exec wall 3.5 → 22.5 s), and the
  * Bench JVM runs ~700 query executions — so whatever accumulates is
  * billed to every late/streaming entry. Suspects: memory-sink temp
  * tables (one per gate invocation, rows pinned in the block manager),
  * terminated StreamingQuery bookkeeping, loaded state-store providers
  * (HDFS providers retain their in-memory map; the maintenance thread
  * iterates every loaded provider), accumulated /tmp checkpoints.
  *
  * Protocol: run `name` `n1` times, snapshot session health, APPLY the
  * cleanups (drop sink temp views, resetTerminated, StateStore.stop,
  * GC), run `n2` more. Flat-after-cleanup ⟹ the cleaned state was the
  * cause; still-degraded ⟹ look elsewhere (JIT code cache, host).
  *
  *   tools/run.sh graft.tools.SessionDecayProbe <sfDir> <name> [n1] [n2]
  */
object SessionDecayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n1 = if (args.length > 2) args(2).toInt else 8
    val n2 = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)

    def health(tag: String): Unit = {
      val rt = Runtime.getRuntime
      val usedMb = (rt.totalMemory - rt.freeMemory) / 1e6
      val nTables = spark.catalog.listTables().count()
      val loadedCount =
        try {
          val ss = org.apache.spark.sql.execution.streaming.state.StateStore
          val m = ss.getClass.getDeclaredMethods
            .find(_.getName.contains("loadedProviders"))
          m.map { mm => mm.setAccessible(true)
            mm.invoke(ss) match {
              case map: scala.collection.Map[_, _] => map.size
              case map: java.util.Map[_, _] => map.size
              case _ => -1
            }
          }.getOrElse(-1)
        } catch { case _: Throwable => -1 }
      println(f"[decay] $tag heapUsed=$usedMb%.0fMB tempTables=$nTables " +
        s"loadedStateProviders=$loadedCount")
    }

    def run(tag: String, n: Int): Unit = (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[decay] $tag it=$i wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    run("pre", n1)
    health("pre-cleanup")
    // cleanup 1: drop every memory-sink temp view (frees sink row buffers)
    spark.catalog.listTables().collect().foreach { t =>
      if (t.tableType == "TEMPORARY" && t.name.contains("_sink_"))
        spark.catalog.dropTempView(t.name)
    }
    // cleanup 2: clear terminated streaming query bookkeeping
    spark.streams.resetTerminated()
    // cleanup 3: unload every state-store provider (kills their maps +
    // maintenance work); terminated queries never unload them in-process
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case e: Throwable => println(s"[decay] StateStore.stop: $e") }
    System.gc()
    health("post-cleanup")
    run("post", n2)
    health("end")
    spark.stop()
  }
}
