package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import org.apache.spark.util.LongAccumulator

/** One live prior in a near-dup bucket: (vec_id, embedding, event-time ms).
  * `emb` is a primitive float array — the state encoder writes it as a
  * packed binary column, dim·4 B per entry. */
final case class LiveVec(id: Long, emb: Array[Float], ts: Long)

/** Arbitrary-state processor behind [[StreamOps.embNearDupStream]] —
  * keyed by (tree, leaf, sub) bucket, emitting (vec_a, vec_b, cos_1e4)
  * for every within-horizon prior that cosine-matches a new arrival.
  *
  * STATE LAYOUT (the round-10→11 fix): the bucket's live set is a
  * `ListState[LiveVec]`, and the hot write path is `appendList` of just
  * the batch's NEW arrivals — an O(new) RocksDB merge — instead of the
  * flatMapGroupsWithState value rewrite, which serialized the WHOLE live
  * list back through the changelog on every touch. That rewrite was the
  * measured growth term under an unbounded horizon (DedupScaleProbe
  * `streamembdedup`: per-batch walls 3.7 → 11–17 s at dim 64, and flat
  * at dim 8 where the same rewrite is 8× cheaper — the cost is value
  * BYTES, not key count). With append-only writes the per-batch
  * changelog is arrival-bound, horizon-independent.
  *
  * The full list is still READ once per touched bucket (the compare
  * against every live prior is the operator's semantics), but reads are
  * memtable/block-cache hits, not commit-path serialization.
  *
  * PHYSICAL EXPIRY, without the per-batch full-state timeout scan of
  * flatMapGroupsWithState: the bucket carries exactly ONE registered
  * event-time timer at (bucket max ts + 2 ms) — it fires exactly when
  * the watermark passes the last entry's liveness bound (`ts >= wm - 1`,
  * the same in-call prune rule as the batch compare), and the
  * expired-timer handler drops dead entries (clearing the key when none
  * survive). The registered expiry lives in a `ValueState[Long]` next to
  * the list: a touch that advances the bucket's max ts DELETES the prior
  * timer and registers the new one (round-12 discipline — previously
  * every touched batch stacked a fresh timer, so a bucket touched in k
  * batches carried up to k live timers, each early one firing as a
  * partial prune). A hot bucket compacts opportunistically instead:
  * when expired entries outnumber live ones at read time, the write
  * path switches from append to a single compacting `put` — amortized
  * O(1) per arrival.
  *
  * RING CAP: `occupancyCap` bounds the live set at the newest `cap`
  * entries by (ts, id) — and since round 12 the ring is enforced
  * PER ARRIVAL, not per batch write, so the compare set an arrival sees
  * is the newest-cap live priors regardless of how the stream was
  * chunked into micro-batches: identical in-order streams framed
  * differently emit identical pair sets (previously same-batch arrivals
  * compared against the full untrimmed buffer while later-batch arrivals
  * saw only the newest cap). This is the streaming enforcement of the
  * SAME occupancy contract the batch path's `refineBuckets` median-split
  * cuts establish (≈16 per sub-bucket at build time; the default cap is
  * 4× that as drift headroom): occupancy past the frozen cuts is
  * retrain-trigger territory by the documented hand-off, so beyond-cap
  * priors age out oldest-first rather than growing the bucket without
  * bound. The cap is what makes the 365-day-horizon probe leg flat —
  * per-touch compare and trim work can never exceed cap·dim.
  *
  * DROP OBSERVABILITY: every live prior the ring evicts increments
  * `dropCounter` (when wired) — the signal a production stream watches
  * to see the cap biting (a silent drop is a recall loss invisible
  * until the batch pass runs). Organic streams assert it stays ZERO;
  * the boilerplate hot-bucket probe asserts it goes nonzero. */
final class EmbNearDupProcessor(thr1e4: Long, occupancyCap: Int,
    dropCounter: Option[LongAccumulator] = None)
    extends StatefulProcessor[
      String, (String, java.sql.Timestamp, Long, Seq[Float]),
      (Long, Long, Long)] {

  @transient private var live: ListState[LiveVec] = _
  @transient private var timerTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    live = getHandle.getListState[LiveVec](
      "live", Encoders.product[LiveVec], TTLConfig.NONE)
    timerTs = getHandle.getValueState[Long](
      "timerTs", Encoders.scalaLong, TTLConfig.NONE)
  }

  /** Keep the bucket's single registered timer at `target` — delete the
    * previously registered one first (never stack timers per touch). */
  private def ensureTimer(target: Long): Unit = {
    val prev = if (timerTs.exists()) timerTs.get() else Long.MinValue
    if (target > prev) {
      if (prev != Long.MinValue) getHandle.deleteTimer(prev)
      getHandle.registerTimer(target)
      timerTs.update(target)
    }
  }

  private def clearTimer(): Unit =
    if (timerTs.exists()) {
      getHandle.deleteTimer(timerTs.get())
      timerTs.clear()
    }

  private def cos1e4(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0L
    else math.round(dot / math.sqrt(na * nb) * 10000)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, java.sql.Timestamp, Long, Seq[Float])],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val wm = math.max(timerValues.getCurrentWatermarkInMs(), 0L)
    var nPrior = 0
    val buf = scala.collection.mutable.ArrayBuffer.empty[LiveVec]
    live.get().foreach { v =>
      nPrior += 1
      if (v.ts >= wm - 1) buf += v // in-call prune of expired priors
    }
    val nExpired = nPrior - buf.length
    buf.sortInPlace()(Ordering.by((v: LiveVec) => (v.ts, v.id)))
    var dropped = 0L
    while (buf.length > occupancyCap) { buf.remove(0); dropped += 1 }
    val out = Seq.newBuilder[(Long, Long, Long)]
    val fresh = scala.collection.mutable.ArrayBuffer.empty[LiveVec]
    rows.toSeq.sortBy(r => (r._2.getTime, r._3)).foreach {
      case (_, ts, id, emb) =>
        val e = new Array[Float](emb.length)
        var i = 0
        while (i < emb.length) { e(i) = emb(i); i += 1 }
        var j = 0
        while (j < buf.length) {
          val p = buf(j)
          val c = cos1e4(p.emb, e)
          if (c >= thr1e4 && p.id != id) out += ((p.id, id, c))
          j += 1
        }
        val lv = LiveVec(id, e, ts.getTime)
        // sorted insert (arrivals are (ts, id)-ordered, so this is an
        // append unless a live prior from an earlier batch is newer)
        var at = buf.length
        while (at > 0 && Ordering.Tuple2[Long, Long]
            .gt((buf(at - 1).ts, buf(at - 1).id), (lv.ts, lv.id))) at -= 1
        buf.insert(at, lv)
        fresh += lv
        if (buf.length > occupancyCap) { // per-arrival ring trim
          buf.remove(0)
          dropped += 1
        }
    }
    if (dropped > 0) dropCounter.foreach(_.add(dropped))
    if (buf.nonEmpty) {
      if (dropped > 0 || nExpired > buf.length) {
        // ring evictions / an expired majority rewrite the list; the
        // hot path below stays an O(new) append
        live.put(buf.toArray)
      } else if (fresh.nonEmpty) {
        live.appendList(fresh.toArray)
      }
      ensureTimer(buf(buf.length - 1).ts + 2L)
    } else if (nPrior > 0) {
      live.clear() // every prior expired and nothing arrived live
      clearTimer()
    }
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
    val wm = math.max(timerValues.getCurrentWatermarkInMs(), 0L)
    if (timerTs.exists() && timerTs.get() == expiredTimerInfo.getExpiryTimeInMs)
      timerTs.clear() // the single registered timer just fired
    val kept = live.get().filter(_.ts >= wm - 1).toArray
    if (kept.isEmpty) live.clear()
    else {
      // stale-timer partial prune (restored checkpoints can carry
      // pre-discipline stacked timers): keep state + re-arm the bound
      live.put(kept)
      var maxTs = Long.MinValue
      kept.foreach(v => if (v.ts > maxTs) maxTs = v.ts)
      ensureTimer(maxTs + 2L)
    }
    Iterator.empty
  }
}

/** One live prior in a TEXT near-dup band bucket: (doc_id, minhash
  * signature as ONE flat binary cell of fixed-width entries — family-
  * blind modulo the entry width, see [[SigNearDupProcessor]] — and
  * event-time ms). r16 state layout: the r15 form held the signature as
  * `Array[String]` (16 hex/decimal strings, one array cell each); the
  * flat cell carries the identical information in 256 B (md5) / 64 B
  * (affine) with a single offset, halving-or-better the RocksDB value
  * bytes and the changelog traffic per appended prior. */
final case class LiveSig(id: Long, sig: Array[Byte], ts: Long)

/** [[EmbNearDupProcessor]]'s text sibling — the state operator behind
  * [[StreamOps.nearDupPairsStream]], keyed by (band_id, band_hash)
  * bucket, emitting (doc_a, doc_b, n_agree) for every live prior whose
  * signature agrees with a new arrival in ≥ `minAgree` positions.
  * Signatures arrive as flat binary cells of `entryWidth`-byte entries
  * (16 = raw md5 digests, 4 = big-endian affine values — both injective
  * encodings, so slice equality ≡ the old string-entry equality and the
  * agreement count is unchanged by construction).
  *
  * STATE-SCHEMA NOTE (the r15→r16 upgrade): `sig` changed from
  * ARRAY<STRING> to BINARY, which transformWithState's state-schema
  * compatibility check rejects on a checkpoint restore — a production
  * stream upgrades by draining to a new checkpoint and rebuilding state
  * from the watermark horizon (pairs older than `lateness` are the
  * batch pass's job anyway — the documented hand-off), exactly like any
  * stateful-operator schema change. The catalog gates start a fresh
  * checkpoint per invocation, so the bench and oracle replay are
  * unaffected.
  *
  * Same layout, same rationale (see the vector processor's scaladoc):
  * append-only ListState writes, ONE registered event-time timer per
  * key (ValueState-tracked, deleted/re-armed only when the bucket max
  * ts advances), in-call prune + opportunistic compaction, a
  * newest-`occupancyCap` ring enforced PER ARRIVAL (batch-framing-
  * invariant output), and ring evictions counted into `dropCounter`.
  * Band buckets are near-unique for organic text (occupancy ~1), but a
  * BOILERPLATE-heavy stream puts every copy of a template in ONE bucket
  * — the streaming form of the batch side's hot-bucket trap (SURVEY
  * §8.2 boilerplate leg). The ring bounds that bucket's state and
  * per-arrival compare cost at the cap; the batch pass (which runs
  * exact dedup BEFORE banding — the measured mitigation) remains the
  * documented hand-off for beyond-cap duplication mass. */
final class SigNearDupProcessor(minAgree: Int, entryWidth: Int,
    occupancyCap: Int, dropCounter: Option[LongAccumulator] = None)
    extends StatefulProcessor[
      String, (String, java.sql.Timestamp, Long, Array[Byte]),
      (Long, Long, Long)] {

  @transient private var live: ListState[LiveSig] = _
  @transient private var timerTs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    live = getHandle.getListState[LiveSig](
      "live", Encoders.product[LiveSig], TTLConfig.NONE)
    timerTs = getHandle.getValueState[Long](
      "timerTs", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def ensureTimer(target: Long): Unit = {
    val prev = if (timerTs.exists()) timerTs.get() else Long.MinValue
    if (target > prev) {
      if (prev != Long.MinValue) getHandle.deleteTimer(prev)
      getHandle.registerTimer(target)
      timerTs.update(target)
    }
  }

  private def clearTimer(): Unit =
    if (timerTs.exists()) {
      getHandle.deleteTimer(timerTs.get())
      timerTs.clear()
    }

  /** Positional agreement of two flat signatures: the count of equal
    * `entryWidth`-byte slices (entries past the shorter cell don't
    * count — same truncation rule as the string form's min-length). */
  private def agreement(a: Array[Byte], b: Array[Byte]): Int = {
    var agree = 0
    var k = 0
    val n = math.min(a.length, b.length) / entryWidth
    while (k < n) {
      val off = k * entryWidth
      if (java.util.Arrays.equals(
          a, off, off + entryWidth, b, off, off + entryWidth)) agree += 1
      k += 1
    }
    agree
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, java.sql.Timestamp, Long, Array[Byte])],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val wm = math.max(timerValues.getCurrentWatermarkInMs(), 0L)
    var nPrior = 0
    val buf = scala.collection.mutable.ArrayBuffer.empty[LiveSig]
    live.get().foreach { v =>
      nPrior += 1
      if (v.ts >= wm - 1) buf += v // in-call prune of expired priors
    }
    val nExpired = nPrior - buf.length
    buf.sortInPlace()(Ordering.by((v: LiveSig) => (v.ts, v.id)))
    var dropped = 0L
    while (buf.length > occupancyCap) { buf.remove(0); dropped += 1 }
    val out = Seq.newBuilder[(Long, Long, Long)]
    val fresh = scala.collection.mutable.ArrayBuffer.empty[LiveSig]
    rows.toSeq.sortBy(r => (r._2.getTime, r._3)).foreach {
      case (_, ts, id, sa) =>
        var j = 0
        while (j < buf.length) {
          val p = buf(j)
          val agree = agreement(p.sig, sa)
          if (agree >= minAgree && p.id != id) out += ((p.id, id, agree.toLong))
          j += 1
        }
        val lv = LiveSig(id, sa, ts.getTime)
        var at = buf.length
        while (at > 0 && Ordering.Tuple2[Long, Long]
            .gt((buf(at - 1).ts, buf(at - 1).id), (lv.ts, lv.id))) at -= 1
        buf.insert(at, lv)
        fresh += lv
        if (buf.length > occupancyCap) { // per-arrival ring trim
          buf.remove(0)
          dropped += 1
        }
    }
    if (dropped > 0) dropCounter.foreach(_.add(dropped))
    if (buf.nonEmpty) {
      if (dropped > 0 || nExpired > buf.length) {
        live.put(buf.toArray)
      } else if (fresh.nonEmpty) {
        live.appendList(fresh.toArray)
      }
      ensureTimer(buf(buf.length - 1).ts + 2L)
    } else if (nPrior > 0) {
      live.clear()
      clearTimer()
    }
    out.result().iterator
  }

  override def handleExpiredTimer(
      key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
    val wm = math.max(timerValues.getCurrentWatermarkInMs(), 0L)
    if (timerTs.exists() && timerTs.get() == expiredTimerInfo.getExpiryTimeInMs)
      timerTs.clear()
    val kept = live.get().filter(_.ts >= wm - 1).toArray
    if (kept.isEmpty) live.clear()
    else {
      live.put(kept)
      var maxTs = Long.MinValue
      kept.foreach(v => if (v.ts > maxTs) maxTs = v.ts)
      ensureTimer(maxTs + 2L)
    }
    Iterator.empty
  }
}
