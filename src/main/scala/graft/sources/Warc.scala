package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Html

/** Record-framed crawl-archive source — the "raw bytes → page rows" stage
  * a real pipeline runs BEFORE url dedup and extraction (reference
  * analogue: the CLI's file ingestion, main.rs:331-334, which meets
  * documents as raw files; a web-scale pipeline meets them as WARC
  * archives). The format here is the WARC SHAPE without needing real WARC
  * fixtures: concatenated records per file, each
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Target-URI: <url>\r\n
  * WARC-Date: <iso-8601>\r\n
  * Content-Length: <payload bytes>\r\n
  * \r\n
  * <payload>\r\n\r\n
  * }}}
  *
  * Framing is by `Content-Length` ONLY — a payload containing `WARC/1.0`
  * or header-looking lines must not desynchronize the parser (the
  * archive-format property that makes HTML payloads safe to embed).
  * Unparseable garbage between records is skipped by scanning to the next
  * record magic, and a record whose declared length overruns the file is
  * dropped (truncated tail fetch) — both lenient paths a crawl demands.
  *
  * 100 TB shape: archives arrive as many ~1 GB files and the FILE is the
  * parallelism unit (`binaryFile` scan → per-file record parse in a
  * flatMap), exactly how production WARC readers split work; record
  * parsing is linear in file bytes, markup never shuffles, and everything
  * downstream (canonical-url dedup, extraction) stays map-side. The
  * whole-file read model matches the format: WARC members are not
  * mid-file splittable without an index.
  */
object Warc {

  val Magic = "WARC/1.0"

  final case class Record(url: String, fetchTs: java.sql.Timestamp, html: String)

  /** Parse one archive's bytes into records (lenient, Content-Length
    * framed). Header names are case-insensitive; unknown headers are
    * ignored; a record missing Content-Length or a parseable date is
    * skipped (scan resumes at the next magic). Real-crawl compatibility
    * (the Common Crawl layout, VERDICT r13 ask 5):
    *
    *  - gzip archives (`.warc.gz` — one gzip MEMBER per record,
    *    members concatenated) are detected by magic and parsed STREAMING
    *    from the `GZIPInputStream` (which reads concatenated members
    *    natively) — the archive is never materialized decompressed, so
    *    a ~1 GB compressed member that expands past the JVM's 2 GiB
    *    array ceiling parses fine; a corrupt/truncated tail keeps every
    *    record already decompressed (the truncated-fetch leniency, now
    *    at the compression layer), and a corrupt HEAD yields zero
    *    records instead of an exception;
    *  - records carrying a `WARC-Type` other than `response` (request,
    *    warcinfo, metadata, …) are skipped — their payload boundary is
    *    still honored, so skipping can never desync the framing;
    *  - a payload that is an HTTP RESPONSE (starts with `HTTP/`) is
    *    split at its first blank line and only the BODY becomes the
    *    html — real response records store status line + headers before
    *    the entity. */
  def parseRecords(bytes: Array[Byte]): Iterator[Record] = {
    val raw = new java.io.ByteArrayInputStream(bytes)
    parseFramed(if (isGzip(bytes)) lenientGunzip(raw) else raw)
  }

  /** Stream-parse an archive of UNKNOWN compression: peeks the gzip magic,
    * then parses records incrementally — per-record memory is O(record),
    * never O(archive). This is the entry point for production-sized
    * archives (a ~1 GB compressed Common Crawl member expands to ~4 GB,
    * past the JVM's 2 GiB array ceiling that the former
    * materialize-then-parse path hit). */
  def parseArchive(in: java.io.InputStream): Iterator[Record] = {
    val pb = new java.io.PushbackInputStream(in, 2)
    val head = new Array[Byte](2)
    var n = 0
    var r = 0
    while (n < 2 && r >= 0) { // loop: a stream may return 1 byte per read
      r = try pb.read(head, n, 2 - n) catch { case _: java.io.IOException => -1 }
      if (r > 0) n += r
    }
    if (n > 0) pb.unread(head, 0, n)
    val gz = n == 2 && (head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b
    parseFramed(if (gz) lenientGunzip(pb) else pb)
  }

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Decompression stream over concatenated gzip members, lenient at BOTH
    * ends: a corrupt gzip HEAD (fetch cut off right after the magic bytes)
    * yields an empty stream instead of an uncaught ZipException — the
    * constructor eagerly reads the first member's header — and a corrupt
    * or truncated TAIL surfaces as an IOException mid-read, which the
    * parser's fill loop treats as end-of-stream (keeping every record
    * already decompressed, like the record-framing leniency). */
  private def lenientGunzip(in: java.io.InputStream): java.io.InputStream =
    try new java.util.zip.GZIPInputStream(in, 64 * 1024)
    catch { case _: java.io.IOException => java.io.InputStream.nullInputStream() }

  /** (offset, length) of the html within a payload at [off, off+len):
    * the whole payload unless it is an HTTP response, in which case the
    * entity body after the first blank line (CRLFCRLF or LFLF); a
    * headers-only response yields an empty body. */
  private def httpBodyRange(bytes: Array[Byte], off: Int, len: Int): (Int, Int) = {
    val http = "HTTP/".getBytes(StandardCharsets.US_ASCII)
    if (len < http.length ||
        !http.indices.forall(i => bytes(off + i) == http(i))) (off, len)
    else {
      var i = off
      val end = off + len
      while (i < end) {
        if (bytes(i) == '\n') {
          val after =
            if (i + 2 < end && bytes(i + 1) == '\r' && bytes(i + 2) == '\n') i + 3
            else if (i + 1 < end && bytes(i + 1) == '\n') i + 2
            else -1
          if (after >= 0) return (after, end - after)
        }
        i += 1
      }
      (end, 0) // headers only, no blank line: empty body
    }
  }

  /** One header BLOCK's scan bound: past this without a blank line the
    * "record" is junk and rescans past its magic (real WARC headers run
    * well under 1 KiB). This is what keeps an adversarial
    * no-blank-line-ever stream from buffering unboundedly — the window
    * never holds more than max(HeaderCap, one payload). */
  private val HeaderCap = 4 * 1024 * 1024

  /** Largest payload the parser will MATERIALIZE as a record (1 GiB). A
    * framed record past this is skipped (its boundary is still honored —
    * skipping streams the bytes through, no allocation) rather than built
    * into a >1 GiB String; the former whole-archive parser could never
    * even reach such a record (its input array capped at 2 GiB total). */
  private val MaxRecordBytes = 1L << 30

  /** Sliding byte window over the archive stream — the incremental
    * replacement for the whole-array parse: bytes are buffered only from
    * the current scan position to the farthest byte the parser has looked
    * at (≤ one header block or one payload), so memory is O(record) even
    * on a multi-GB decompressed archive. An IOException from the
    * underlying stream (corrupt gzip tail, truncated fetch) reads as
    * end-of-stream: the leniency contract, now at the fill loop. */
  private final class ByteWindow(in: java.io.InputStream) {
    private var buf = new Array[Byte](64 * 1024)
    private var lo = 0
    private var hi = 0
    private var eof = false

    /** Buffer at least `n` bytes past the scan position (or to EOF);
      * returns the buffered count. */
    def ensure(n: Int): Int = {
      if (hi - lo < n && !eof) {
        if (lo > 0) { System.arraycopy(buf, lo, buf, 0, hi - lo); hi -= lo; lo = 0 }
        if (n > buf.length) {
          // power-of-two growth, overflow-proof: doubling past 2^30 wraps
          // Int negative and a naive `while (cap < n)` spins forever for
          // n just over 1 GiB (records at the MaxRecordBytes boundary) —
          // clamp the doubled capacity to exactly n when it overshoots
          var cap = buf.length
          while (cap < n && cap < (1 << 30)) cap *= 2 // cap stays <= 2^30
          buf = java.util.Arrays.copyOf(buf, math.max(cap, n))
        }
        while (!eof && hi < n) {
          val r = try in.read(buf, hi, buf.length - hi)
                  catch { case _: java.io.IOException => -1 }
          if (r < 0) eof = true else hi += r
        }
      }
      hi - lo
    }

    /** Byte at window offset `i` (caller `ensure`d availability). */
    def get(i: Int): Byte = buf(lo + i)

    /** Backing array + base offset for zero-copy range reads. Valid only
      * until the next `ensure`/`skip` (both may compact or regrow). */
    def array: Array[Byte] = buf
    def offset: Int = lo

    /** Advance the scan position by `n` already-buffered bytes. */
    def consume(n: Int): Unit = lo += n

    /** Advance by `n` bytes, streaming past the buffer if needed (no
      * allocation — this is how skipped payloads flow through). False if
      * the stream ended first (truncated tail). */
    def skip(n: Long): Boolean = {
      val buffered = math.min(n, (hi - lo).toLong).toInt
      lo += buffered
      var left = n - buffered
      if (left > 0) { lo = 0; hi = 0 } // buffer fully drained: reuse as scratch
      while (left > 0) {
        val r = try in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
                catch { case _: java.io.IOException => -1 }
        if (r < 0) { eof = true; return false }
        left -= r
      }
      true
    }
  }

  private def parseFramed(in: java.io.InputStream): Iterator[Record] = new Iterator[Record] {
    private val magic = Magic.getBytes(StandardCharsets.US_ASCII)
    private val w = new ByteWindow(in)
    private var nextRec: Record = _
    private var stopped = false // truncated tail: the scan stops for good
    advance()

    /** Discard stream bytes up to the next record magic (window offset 0
      * = magic start afterwards); false at stream end. */
    private def seekMagic(): Boolean = {
      while (true) {
        val avail = w.ensure(64 * 1024)
        if (avail < magic.length) return false
        var i = 0
        val last = avail - magic.length
        while (i <= last) {
          var j = 0
          while (j < magic.length && w.get(i + j) == magic(j)) j += 1
          if (j == magic.length) { w.consume(i); return true }
          i += 1
        }
        // keep magic.length-1 bytes so a buffer-boundary-straddling magic
        // still matches on the next pass
        w.consume(avail - magic.length + 1)
      }
      false
    }

    /** The next CRLF (or lone LF) at/after window offset `from`, buffering
      * incrementally; (lineEnd, nextLineStart) window offsets, or null at
      * stream end / the HeaderCap bound. */
    private def lineEnd(from: Int): (Int, Int) = {
      var i = from
      while (i < HeaderCap) {
        if (w.ensure(i + 1) < i + 1) return null
        if (w.get(i) == '\n') {
          val e = if (i > from && w.get(i - 1) == '\r') i - 1 else i
          return (e, i + 1)
        }
        i += 1
      }
      null
    }

    private def advance(): Unit = {
      nextRec = null
      while (nextRec == null && !stopped) {
        if (!seekMagic()) return
        // Header block: scanned WITHOUT consuming, so an unframed header
        // rescans from just past the magic with every byte it looked at
        // still buffered — the same rescan the whole-array parser did.
        var cur = lineEnd(0) match { case null => -1 case (_, n) => n }
        var url: String = null
        var date: String = null
        var wtype: String = null
        var len = -1L
        var ok = cur >= 0 && w.ensure(cur + 1) >= cur + 1
        var done = false
        while (ok && !done) {
          lineEnd(cur) match {
            case null => ok = false
            case (e, n) =>
              if (e == cur) { done = true; cur = n } // empty line: headers end
              else {
                val line =
                  new String(w.array, w.offset + cur, e - cur, StandardCharsets.UTF_8)
                val c = line.indexOf(':')
                if (c > 0) {
                  // Locale.ROOT: a tr_TR-default JVM lowercases the I in
                  // "WARC-Target-URI" to dotless ı and every record would
                  // silently disqualify
                  val k = line.substring(0, c).trim
                    .toLowerCase(java.util.Locale.ROOT)
                  val v = line.substring(c + 1).trim
                  k match {
                    case "warc-target-uri" => url = v
                    case "warc-date" => date = v
                    case "warc-type" => wtype = v
                    case "content-length" =>
                      len = try v.toLong catch { case _: NumberFormatException => -1L }
                    case _ => () // unknown headers flow through
                  }
                }
                cur = n
              }
          }
        }
        // A header is FRAMED when its length parsed AND at least one real
        // WARC header identifies it (type, uri, or date) — warcinfo
        // records carry no Target-URI, so requiring the uri here would
        // route every real archive's leading warcinfo to the rescan path
        // and let its payload resurrect embedded bait as ghost records.
        // Length-only junk that happens to follow a magic is NOT framed
        // and rescans.
        val framed = ok && len >= 0 &&
          (wtype != null || url != null || date != null)
        if (!framed) {
          w.consume(magic.length) // unframed: rescan past this magic
        } else {
          val isResponse = wtype == null || wtype.equalsIgnoreCase("response")
          val ts =
            if (isResponse && url != null && date != null)
              try java.sql.Timestamp.from(java.time.Instant.parse(date))
              catch { case _: Throwable => null }
            else null
          if (ts == null || len > MaxRecordBytes) {
            // The payload boundary is KNOWN (valid Content-Length framing),
            // so whatever disqualifies the record — non-response type,
            // missing uri/date, unparseable date, an unmaterializable
            // size — drops it but still streams past the framed payload;
            // rescanning from the magic would walk INTO the payload (the
            // ghost-record desync). A skip the stream cannot complete is
            // a truncated tail: the scan STOPS (rescanning the partial
            // payload could resurrect embedded bait).
            w.consume(cur)
            if (!w.skip(len)) { stopped = true; return }
          } else {
            // Qualified record: buffer exactly this payload.
            val lenI = len.toInt
            if (w.ensure(cur + lenI) < cur + lenI) { stopped = true; return }
            val (bodyOff, bodyLen) =
              httpBodyRange(w.array, w.offset + cur, lenI)
            nextRec = Record(url, ts,
              new String(w.array, bodyOff, bodyLen, StandardCharsets.UTF_8))
            w.consume(cur + lenI)
          }
        }
      }
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): Record = {
      val r = nextRec; advance(); r
    }
  }

  /** Archive files under `path` → (url, fetch_ts, html) rows. One task
    * per archive file (the WARC parallelism unit). `binaryFile` holds the
    * COMPRESSED file bytes (Spark's own 2 GB content cap — the real-world
    * member size, ~1 GB, fits); the record parse streams from those
    * bytes, so the DECOMPRESSED size (~4x) never materializes. Plain
    * `.warc` and gzipped `.warc.gz` archives both match; the parser
    * detects the compression by magic per file. */
  def readWarc(s: SparkSession, path: String): DataFrame =
    bytesToRows(s.read.format("binaryFile")
      .option("pathGlobFilter", ArchiveGlob).load(path))

  /** Both real-world archive extensions; NOT `*.warc*`, which would match
    * [[landArchive]]'s in-flight `.tmp` names and break the streaming
    * source's atomic-landing contract. */
  private val ArchiveGlob = "*.{warc,warc.gz}"

  /** Archive bytes → (url, fetch_ts, html) rows — the ONE bytes-to-rows
    * contract, shared by the batch and streaming readers so they cannot
    * diverge. */
  private def bytesToRows(loaded: DataFrame): DataFrame = {
    val s = loaded.sparkSession
    import s.implicits._
    loaded.select(col("content")).as[Array[Byte]]
      .flatMap(b => parseRecords(b).map(r => (r.url, r.fetchTs, r.html)))
      .toDF("url", "fetch_ts", "html")
  }

  /** STREAMING archive ingestion — the production shape: a crawler keeps
    * dropping finished archive files into a landing directory and the
    * pipeline discovers them continuously (Structured Streaming file
    * source over the same `binaryFile` format as [[readWarc]] — the file
    * remains the parallelism unit, each newly-discovered archive is
    * parsed once in the micro-batch that picks it up, and the source's
    * checkpointed file log makes discovery exactly-once across
    * restarts). Emits the same (url, fetch_ts, html) rows as the batch
    * reader, ready for [[graft.streaming.StreamOps.crawlIngestStream]]. */
  def readWarcStream(s: SparkSession, path: String): DataFrame = {
    val binaryFileSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
    bytesToRows(s.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", ArchiveGlob).load(path))
  }

  /** Land an archive's bytes in a watched directory ATOMICALLY: the file
    * source's contract requires files to appear in place whole (a listing
    * that races a plain write would read a truncated archive, and the
    * lenient parser would silently drop its tail records into the
    * exactly-once file log). Written under a `.tmp` name the `*.warc`
    * glob ignores, then renamed into place. */
  def landArchive(landingDir: String, name: String, bytes: Array[Byte]): Unit = {
    val tmp = new java.io.File(landingDir, s"$name.tmp").toPath
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(tmp, new java.io.File(landingDir, name).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** doc_id from a fixture url (`…/doc/<id>`), NULL for anything else —
    * `nullif` before the cast because under ANSI mode a junk url's empty
    * regex match would otherwise kill the query instead of yielding an
    * unidentifiable row (junk urls are a normal crawl condition). */
  def docIdFromUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // {1,18}: 18 digits always fit a Long — an absurdly long digit run
    // (junk again) must yield NULL, not an ANSI CAST_OVERFLOW
    nullif(regexp_extract(url, "/doc/(\\d{1,18})$", 1), lit("")).cast("long")

  /** One record's bytes (fixture writer side of [[parseRecords]]). */
  def recordBytes(url: String, isoDate: String, payload: Array[Byte]): Array[Byte] =
    recordBytesTyped("response", url, isoDate, payload)

  /** [[recordBytes]] with an explicit `WARC-Type` — the writer side for
    * the non-response record kinds a real archive interleaves (request,
    * warcinfo, metadata) that the parser must skip without desync. */
  def recordBytesTyped(
      wtype: String, url: String, isoDate: String,
      payload: Array[Byte]): Array[Byte] = {
    val header = (s"$Magic\r\nWARC-Type: $wtype\r\n" +
      s"WARC-Target-URI: $url\r\nWARC-Date: $isoDate\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](header.length + payload.length + 4)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Deterministic HTTP response envelope (writer side of
    * [[httpBodyRange]]): status line + two headers + blank line + body —
    * what a real crawl archive stores as a response record's payload. */
  def httpWrap(body: Array[Byte]): Array[Byte] = {
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out
  }

  /** One gzip MEMBER holding `record` — the `.warc.gz` layout gzips each
    * record independently and concatenates the members, which is what
    * makes per-record random access possible with an offset index. */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  private val cache = scala.collection.concurrent.TrieMap[String, String]()

  /** Per-JVM archive fixture: the documents corpus as 8 concatenated
    * archive files under /tmp — url `https://www.example.com/doc/<id>`,
    * date epoch `1000000 + doc_id` seconds, payload the deterministic
    * [[Html.wrapDocument]] page — so the DuckDB oracle can reconstruct
    * every record field generatively from the original parquet (no frozen
    * fixture). Task-side local-file writes: test scaffolding, not the
    * production write path (a crawler writes archives, engines read them). */
  def warcFixture(s: SparkSession, dir: String): String =
    cache.getOrElseUpdate(s"warc|$dir", {
      val p = "/tmp/graft_sources/warc_" + graft.core.FixtureStamp.key(s, dir)
      val f = new java.io.File(p)
      org.apache.commons.io.FileUtils.deleteQuietly(f)
      f.mkdirs()
      Tables.documents(s, dir)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .repartition(8, col("doc_id"))
        .foreachPartition { (it: Iterator[Row]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(s"$p/part-$pid.warc"))
          try it.foreach { r =>
            val id = r.getLong(0)
            val iso = java.time.Instant.ofEpochSecond(1000000L + id).toString
            out.write(recordBytes(
              s"https://www.example.com/doc/$id", iso,
              Html.wrapDocument(r.getString(1))
                .getBytes(StandardCharsets.UTF_8)))
          } finally out.close()
        }
      p
    })

  /** Per-JVM REAL-LAYOUT archive fixture (`q_source_warc_gz`): the same
    * corpus as [[warcFixture]] but in the Common Crawl shape — 8
    * `.warc.gz` files, one gzip member per record, every response payload
    * wrapped in a deterministic HTTP envelope ([[httpWrap]]), and every
    * 5th document FOLLOWED by a `WARC-Type: request` record (the
    * interleaved non-response kind the parser must skip). The content
    * that survives parsing is byte-identical to the plain fixture's, so
    * the gate reuses `q_source_warc`'s generative DuckDB oracle verbatim
    * — compression, HTTP stripping and type filtering must all be exact
    * inverses of this writer. */
  def warcGzFixture(s: SparkSession, dir: String): String =
    cache.getOrElseUpdate(s"warcgz|$dir", {
      val p = "/tmp/graft_sources/warcgz_" + graft.core.FixtureStamp.key(s, dir)
      val f = new java.io.File(p)
      org.apache.commons.io.FileUtils.deleteQuietly(f)
      f.mkdirs()
      Tables.documents(s, dir)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .repartition(8, col("doc_id"))
        .foreachPartition { (it: Iterator[Row]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(s"$p/part-$pid.warc.gz"))
          try it.foreach { r =>
            val id = r.getLong(0)
            val url = s"https://www.example.com/doc/$id"
            val iso = java.time.Instant.ofEpochSecond(1000000L + id).toString
            out.write(gzipMember(recordBytes(url, iso,
              httpWrap(Html.wrapDocument(r.getString(1))
                .getBytes(StandardCharsets.UTF_8)))))
            if (id % 5 == 0)
              out.write(gzipMember(recordBytesTyped("request", url, iso,
                s"GET /doc/$id HTTP/1.1\r\nHost: www.example.com\r\n\r\n"
                  .getBytes(StandardCharsets.US_ASCII))))
          } finally out.close()
        }
      p
    })
}
