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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
