package graft
import org.apache.spark.sql.SparkSession

/** Bench harness (driver contract): run every catalog query against
  * SPARK_GRAFT_SF_DIR and print ONE JSON line with per-query seconds.
  * A full warmup pass runs first so session startup / codegen compilation
  * is not billed to the first timed query; failures are reported per-query
  * instead of silently timed. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val fullLine =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"errors":$errJson,"fixture_pinned":["dist_hamming"],"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LOCAL.json"), fullLine + "\n")
    catch { case _: Throwable => () }
    // stdout gets a line CAPPED at 1800 bytes so it always survives the
    // tail capture and parses: total + errors + as many per-query entries
    // as fit, most expensive first (the perf-relevant tail of the
    // distribution), plus a pointer to the complete map.
    val MaxLine = 1800
    // The head counts against MaxLine too: a run with many/long errors
    // would otherwise blow the budget through the uncapped errJson and
    // reproduce the very truncation this cap exists to prevent — exactly
    // the runs where the artifact matters most. Stdout gets at most 5
    // errors at 100 chars each plus the full count; the complete messages
    // are in BENCH_LOCAL.json.
    val errStdout = errors.take(5)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v.take(100))}" }
      .mkString("{", ",", "}")
    val head = s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"queries_full":"BENCH_LOCAL.json","n_errors":${errors.size},"errors":$errStdout,"sf":"$sfDir","queries":{"""
    val tailPart = "}}"
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
