package graft.catalog

import org.apache.spark.sql.Dataset

/** Driver-side feed collection for the MemoryStream exec gates.
  *
  * Every streaming exec gate replays a fixture table through a
  * MemoryStream to exercise the REAL micro-batch engine — which means
  * collecting the fixture to the driver first. That collect is inherent
  * to the gate pattern and driver-bounded at fixture scale (≤600k rows
  * at sf0.1), but it must never silently ride along if a gate is ever
  * pointed at a corpus-sized table: this helper caps the collect (the
  * `limit(max+1)` keeps even the failure path bounded — the driver pulls
  * at most one row past the cap, not the corpus) and fails loudly.
  *
  * Production streams read from a real source (`readStream`); nothing in
  * this file is part of any production operator.
  */
object StreamFeed {

  /** ~6× the largest sf0.1 fixture feed (600k basket pairs); far below
    * any corpus-sized frame. */
  val MaxFeedRows: Int = 4000000

  def collectCapped[T](ds: Dataset[T], what: String,
      max: Int = MaxFeedRows): Array[T] = {
    val rows = ds.limit(max + 1).collect()
    require(rows.length <= max,
      s"$what: exec-gate feed exceeds $max rows — these harness feeds are " +
        "fixture-scale only; a corpus-sized stream belongs on a real " +
        "readStream source, not a driver-collected MemoryStream")
    rows
  }
}
