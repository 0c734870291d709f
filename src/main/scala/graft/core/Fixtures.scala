package graft.core

import java.io.File

/** Locates the repo's committed oracle-fixture parquets (`fixtures/`):
  * frozen expected outputs for paths whose arithmetic is deterministic but
  * not SQL-expressible from the source tables (f32 bit reinterpretation,
  * image/audio decode). The DuckDB oracle reads them with `read_parquet`,
  * turning those catalog entries from rows-only into hash-checked.
  *
  * Staleness is gated twice: `FixtureOracleSpec` recomputes every fixture
  * in-process and fails `sbt test` on drift, and
  * `graft.tools.GenOracleFixtures` regenerates the files after an
  * intentional change (new testdata, changed decode path).
  */
object Fixtures {
  /** Absolute fixtures dir: `-Dgraft.fixtures.dir` / `GRAFT_FIXTURES_DIR`
    * when set, else the working directory's `fixtures/` (Verify/Bench run
    * from the repo root). Fails loudly when neither resolves — a silent
    * fallback to a hardcoded checkout path would read stale or missing
    * fixtures on any other checkout location. */
  lazy val dir: String = {
    val fromProp = sys.props.get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
    fromProp match {
      case Some(p) =>
        val f = new File(p)
        if (f.isDirectory) f.getAbsolutePath
        else sys.error(
          s"fixtures dir ${f.getAbsolutePath} does not exist " +
            "(from -Dgraft.fixtures.dir / GRAFT_FIXTURES_DIR)")
      case None =>
        Seq(new File("fixtures"), new File("/root/repo/fixtures"))
          .find(_.isDirectory)
          .map(_.getAbsolutePath)
          .getOrElse(sys.error(
            "no fixtures/ found under the working directory or the " +
              "canonical checkout; set -Dgraft.fixtures.dir or " +
              "GRAFT_FIXTURES_DIR"))
    }
  }

  def path(name: String): String = s"$dir/$name"
}
