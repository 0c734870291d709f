package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke for the `spark.sql.extensions=graft.GraftExtensions` install
  * path: a fresh session configured with the extension must resolve every
  * registered vector function in plain SQL with NO GraftFunctions.register
  * call. (Unit suites share one session, so injection-at-construction can
  * only be proven in its own JVM.) */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql("""
      SELECT vector_dot(array(1D,2D), array(3D,4D))        AS dot,
             vector_l2sq(array(1D,0D), array(0D,1D))       AS l2sq,
             vector_manhattan(array(1D,0D), array(0D,1D))  AS manhattan,
             vector_cosine(array(1D,0D), array(0D,1D))     AS cosine,
             vector_cosine_sim(array(1D,0D), array(1D,0D)) AS cos_sim,
             vector_chebyshev(array(1D,0D), array(0D,2D))  AS chebyshev,
             vector_canberra(array(1D,0D), array(0D,1D))   AS canberra,
             vector_braycurtis(array(1D,0D), array(0D,1D)) AS braycurtis,
             vector_pnorm(array(1D,0D), array(0D,1D), 2.5) AS pnorm
    """).head()
    assert(row.getDouble(0) == 11.0, s"dot: $row")
    assert(row.getDouble(1) == 2.0, s"l2sq: $row")
    assert(row.getDouble(2) == 2.0, s"manhattan: $row")
    assert(row.getDouble(3) == 1.0, s"cosine: $row")
    assert(row.getDouble(4) == 1.0, s"cos_sim: $row")
    assert(row.getDouble(5) == 2.0, s"chebyshev: $row")
    assert(row.getDouble(6) == 2.0, s"canberra: $row")
    assert(row.getDouble(7) == 1.0, s"braycurtis: $row")
    assert(math.abs(row.getDouble(8) - 2.0) < 1e-12, s"pnorm: $row")
    println("extensions_ok: all 9 SQL functions resolved via injection")
    spark.stop()
  }
}
