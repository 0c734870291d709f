package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Runtime guard for the BOUNDED-AGGREGATE-FRAME contract.
  *
  * Several operators run an UNPARTITIONED window — a prefix sum over a
  * bucket histogram, a strata table, a decile grid — over frames that are
  * small BY CONSTRUCTION (bucket counts, not corpus rows). Spark happily
  * single-partition-sorts whatever such a window receives, so a future
  * caller handing one of these code paths a corpus-sized frame would get
  * a silent one-task sort of the whole input. This helper makes the
  * contract explicit and loud: the frame is persisted (it is consumed by
  * the window next, so the materialization is not wasted work), counted,
  * and the count is `require`d within `max`. The persist also means the
  * window reads the materialized rows instead of recomputing the
  * upstream aggregate for the count and again for the window.
  *
  * `max` should be generous for the legitimate frame (a 10-row decile
  * grid gets 16; a bucket histogram gets 1<<16) — the guard exists to
  * reject corpus-sized inputs, not to tune the bound.
  */
object Bounded {

  /** Persisted guarded frames, oldest first. A long-lived session calling
    * the guarded operators repeatedly would otherwise accumulate cached
    * entries in the block manager indefinitely (each frame is small, but
    * "small × unbounded calls" still leaks): beyond `MaxLive` frames the
    * oldest is unpersisted. Every caller consumes its frame immediately
    * after the guard, so an evicted old frame can at worst recompute its
    * (aggregate-sized) input if something re-reads it much later. */
  private val MaxLive = 32
  private val liveFrames = new java.util.ArrayDeque[DataFrame]()

  def frame(df: DataFrame, max: Long, what: String): DataFrame = {
    val mat = df.persist(StorageLevel.MEMORY_AND_DISK)
    liveFrames.synchronized {
      liveFrames.addLast(mat)
      while (liveFrames.size() > MaxLive)
        liveFrames.removeFirst().unpersist(blocking = false)
    }
    val n = mat.count()
    require(n <= max,
      s"$what: bounded-frame contract violated — $n rows > $max; this " +
        "frame feeds an unpartitioned window and must stay aggregate-sized")
    mat
  }
}
