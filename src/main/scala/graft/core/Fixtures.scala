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
  /** Absolute fixtures dir: the working directory's `fixtures/` when
    * present (Verify/Bench run from the repo root), else the canonical
    * repo checkout location. */
  lazy val dir: String = {
    val local = new File("fixtures")
    if (local.isDirectory) local.getAbsolutePath
    else "/root/repo/fixtures"
  }

  def path(name: String): String = s"$dir/$name"
}
