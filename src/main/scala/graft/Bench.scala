package graft
import org.apache.spark.sql.SparkSession

/** Bench harness (driver contract): run every catalog query against
  * SPARK_GRAFT_SF_DIR and print ONE JSON line with per-query seconds.
  * A full warmup pass runs first so session startup / codegen compilation
  * is not billed to the first timed query; failures are reported per-query
  * instead of silently timed. */
object Bench {

  /** Box-condition evidence captured at run start: /proc/loadavg (1/5/15
    * min) and the count of OTHER live java processes. Past rounds twice
    * attributed per-query drift to "box load during the run" by
    * inference; recording the load in the artifact makes that explanation
    * checkable instead of argued (a breach with loadavg 0.2 and n_java 0
    * is a plan regression; the same breach at loadavg 8 is the box). */
  private[graft] def boxCondition(): (Seq[Double], Int) = {
    val load =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq.empty[Double] }
    // Exclude self AND every ancestor process: a Bench forked by sbt has
    // the sbt launcher JVM as its parent, and counting it made every
    // driver-run artifact read box_loaded:true — a brand that always
    // fires distinguishes nothing (and pre-excuses real regressions as
    // box noise).
    val excluded = {
      var pids = Set.empty[Long]
      var cur = java.util.Optional.of(ProcessHandle.current())
      while (cur.isPresent) { pids += cur.get.pid(); cur = cur.get.parent() }
      pids
    }
    val nJava =
      try new java.io.File("/proc").listFiles()
        .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
        .count { f =>
          !excluded.contains(f.getName.toLong) && {
            try java.nio.file.Files.readString(
              java.nio.file.Paths.get(s"/proc/${f.getName}/comm")).trim == "java"
            catch { case _: Throwable => false }
          }
        }
      catch { case _: Throwable => -1 }
    (load, nJava)
  }

  /** Per-query mins from the OPERATIVE baseline — the highest-versioned
    * BENCH_BASELINE_v*.json in the working directory (the file the judge
    * reads). Parsed with a flat regex over the balanced `"queries"` object
    * (the map is flat name→seconds; no JSON lib on the classpath). */
  private[graft] def operativeBaseline(): Option[(String, Map[String, Double])] = {
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("BENCH_BASELINE_v\\d+\\.json"))
    if (files.isEmpty) return None
    val best = files.maxBy(_.getName.stripPrefix("BENCH_BASELINE_v")
      .stripSuffix(".json").toInt)
    try {
      val txt = java.nio.file.Files.readString(best.toPath)
      val at = txt.indexOf("\"queries\"")
      if (at < 0) return None
      val open = txt.indexOf('{', at)
      if (open < 0) return None
      // Brace-depth scan to the MATCHING close: a first-'}' scan silently
      // truncates the map at the first nested object if a future baseline
      // writer ever nests per-query entries, and the over_2x self-check
      // would then compare against a partial baseline with no error.
      var depth = 0
      var i = open
      var close = -1
      while (close < 0 && i < txt.length) {
        txt.charAt(i) match {
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) close = i
          case _ => ()
        }
        i += 1
      }
      if (close < 0) return None
      val pair = """"([A-Za-z0-9_.]+)"\s*:\s*([0-9.eE+-]+)""".r
      val m = pair.findAllMatchIn(txt.substring(open, close))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      // Cross-check against the artifact's own n_queries count when
      // present: a parse that dropped entries must fail loudly (None →
      // no self-check) rather than silently compare a subset.
      val declared = """"n_queries"\s*:\s*(\d+)""".r
        .findFirstMatchIn(txt).map(_.group(1).toInt)
      if (m.isEmpty || declared.exists(_ != m.size)) None
      else Some(best.getName -> m)
    } catch { case _: Throwable => None }
  }

  /** Pre-flight quiesce wait: spin (10 s polls) until the 1-min loadavg
    * drops below 1.0 AND no other non-ancestor JVM is live, capped at
    * `maxWaitSec`. Returns seconds waited. Rationale: the round-12/13/14
    * driver artifacts were all taken on a box still draining the verify
    * sweep's load tail (loadavg 3-8 at start), and each read as a 2x
    * "breach" that evaporated on a quiesced re-run — branding a loaded
    * run (box_loaded) explains the artifact after the fact, but waiting
    * out the tail makes the artifact clean BY CONSTRUCTION. The cap keeps
    * a genuinely-busy box from stalling the driver forever; a run that
    * exhausts the cap still starts (and is branded loaded as before). */
  private[graft] def quiesceWait(maxWaitSec: Double): Double = {
    val t0 = System.nanoTime()
    def elapsed = (System.nanoTime() - t0) / 1e9
    var (load, nJava) = boxCondition()
    var logged = 0.0
    while ((load.headOption.exists(_ >= 1.0) || nJava > 0) && elapsed < maxWaitSec) {
      if (elapsed - logged >= 30 || logged == 0.0) {
        System.err.println(
          f"[Bench] quiesce wait: loadavg=${load.mkString(",")} other_java=$nJava elapsed=$elapsed%.0fs (cap $maxWaitSec%.0fs)")
        logged = elapsed
      }
      Thread.sleep(10000)
      val c = boxCondition(); load = c._1; nJava = c._2
    }
    elapsed
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Quiesce BEFORE capturing box condition: the recorded condition must
    // describe the box at timing start, not at process start. Overridable
    // (SPARK_GRAFT_QUIESCE_MAX_S=0 disables) for local iteration runs.
    val waitedS = quiesceWait(
      sys.env.get("SPARK_GRAFT_QUIESCE_MAX_S").map(_.toDouble).getOrElse(600.0))
    val (loadavg, nJava) = boxCondition()
    // Pre-flight: a loaded box cannot produce a regression signal. The
    // round-12 and round-13 artifacts were both taken at loadavg ~3-8 with
    // other JVMs live and read as 2x "breaches" that evaporated quiesced —
    // so a run that starts loaded is BRANDED in the artifact (box_loaded)
    // and loudly on stderr, and its over_2x list must be read as box
    // noise, not plan drift. Branding rather than refusing: the driver's
    // automated run must still produce an artifact.
    val boxLoaded = loadavg.headOption.exists(_ > 1.0) || nJava > 0
    if (boxLoaded)
      System.err.println(
        s"[Bench] WARNING: box loaded at start (loadavg=${loadavg.mkString(",")}, " +
          s"other_java=$nJava) — timings unreliable, artifact branded box_loaded:true")
    // Default to the box's cores (same rationale as Verify: an unset env
    // var must not silently run the sweep at local[4]).
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // The default 100-entry codegen class cache is smaller than one
      // catalog pass (101 queries x several codegen units each), so every
      // timed round recompiled every plan from scratch — measured at
      // +0.3-1.5 s of pure Janino time per query (the round-4
      // knn_exact_* "regression" reproduces exactly by shrinking this
      // cache). Static conf: must be set before the session exists.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warmup: exercise every plan once (codegen + file-footer caches warm).
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Two timed ROUNDS over the whole catalog, min per query across
    // rounds: a single sample is at the mercy of transient box load, and
    // back-to-back per-query repeats sit inside the same multi-second
    // stall window (observed: one random query at 10-30x its normal time,
    // both consecutive samples affected). Interleaving puts minutes
    // between a query's two samples, so a stall corrupts at most one.
    val sampled = (1 to 2).map { _ =>
      names.map { name =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(200)
        }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    val results = names.map(n => n -> sampled.map(_(n)).min)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // 4-decimal seconds: a full-precision Double repr nearly doubles the
    // line length, and the round-4 artifact proved the driver's tail
    // capture has a byte budget (BENCH_r04.json was cut mid-line, losing
    // the total). 0.1 ms resolution is far below run-to-run noise.
    // Locale.ROOT: the f-interpolator uses the JVM default locale, which
    // on a comma-decimal host would emit "1,2345" and corrupt the JSON.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => s"${jstr(k)}:${sec(v)}" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The FULL per-query map goes to BENCH_LOCAL.json (committed at round
    // close) — at 130 queries it is ~3.6 KB and the driver's artifact is a
    // 2000-byte stdout tail with sbt's "[success] ..." line (~80 bytes)
    // captured AFTER ours, so a full-map line can never parse there
    // (BENCH_r04/r05 both ended up `parsed: null`, cut mid-line).
    // dist_hamming reads a frozen sf0.01 bit fixture on BOTH sides (its
    // oracle is only expressible over that table), so its time does not
    // scale with SF — flagged here so cross-SF comparisons skip it.
    //
    // Self-check vs the operative baseline (the per-query bar, machine-
    // checked in the artifact instead of judge-recomputed): a query is
    // flagged when its time exceeds 2x its baseline min AND the absolute
    // excess over that min clears a 0.3 s noise floor — sub-second
    // entries jitter across that ratio without meaning anything.
    val baseline = operativeBaseline()
    val over2x = baseline.map { case (_, mins) =>
      results.filter { case (k, v) =>
        mins.get(k).exists(b => v > 2 * b && v - b > 0.3)
      }.map { case (k, v) =>
        s"""{"q":${jstr(k)},"sec":${sec(v)},"base":${sec(mins(k))}}"""
      }
    }.getOrElse(Seq.empty)
    val loadJson = loadavg.map(sec).mkString("[", ",", "]")
    val baseJson = baseline.map(b => jstr(b._1)).getOrElse("null")
    val waitJson = sec(waitedS)
    val condJson =
      s""""loadavg":$loadJson,"n_other_java":$nJava,"box_loaded":$boxLoaded,"waited_s":$waitJson,"baseline":$baseJson,"over_2x":${over2x.mkString("[", ",", "]")}"""
    val fullLine =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec",$condJson,"queries":$qs,"errors":$errJson,"fixture_pinned":["dist_hamming"],"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), fullLine + "\n")
    catch { case _: Throwable => () }
    // stdout gets a line CAPPED at 1800 bytes so it always survives the
    // tail capture and parses: total + errors + as many per-query entries
    // as fit, most expensive first (the perf-relevant tail of the
    // distribution), plus a pointer to the complete map.
    val MaxLine = 1800
    // over_2x on stdout is capped like errors (full list in BENCH_LOCAL):
    // the counts are always present, so a clean run shows n_over_2x:0.
    // The head itself must fit the budget: a bad run with escape-heavy
    // error messages PLUS many breach entries could push an uncapped head
    // past MaxLine and reproduce the mid-line truncation the cap exists
    // to prevent — so the head degrades (drop the over_2x list, then
    // shrink errors) until it fits; the full detail is in BENCH_LOCAL.
    val tailPart = "}}"
    def buildHead(nOver: Int, nErr: Int, errChars: Int): String = {
      val errStdout = errors.take(nErr)
        .map { case (k, v) => s"${jstr(k)}:${jstr(v.take(errChars))}" }
        .mkString("{", ",", "}")
      val over2xStdout = over2x.take(nOver).mkString("[", ",", "]")
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"queries_full":"BENCH_LOCAL.json","loadavg":$loadJson,"n_other_java":$nJava,"box_loaded":$boxLoaded,"waited_s":$waitJson,"baseline":$baseJson,"n_over_2x":${over2x.size},"over_2x":$over2xStdout,"n_errors":${errors.size},"errors":$errStdout,"sf":"$sfDir","queries":{"""
    }
    val head = Seq((8, 5, 100), (0, 5, 100), (0, 3, 60), (0, 0, 0))
      .map((buildHead _).tupled)
      .find(_.length + tailPart.length <= MaxLine)
      .getOrElse(buildHead(0, 0, 0))
    val entries = results.sortBy(-_._2).map { case (k, v) => s"${jstr(k)}:${sec(v)}" }
    val sb = new StringBuilder(head)
    var first = true
    entries.foreach { e =>
      val add = (if (first) 0 else 1) + e.length
      if (sb.length + add + tailPart.length <= MaxLine) {
        if (!first) sb.append(',')
        sb.append(e); first = false
      }
    }
    sb.append(tailPart)
    spark.stop()
    println(sb.toString)
  }
}
