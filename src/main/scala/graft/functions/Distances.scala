package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference engine's 12 distance metrics (reference:
  * src/distance.rs:15-190) re-expressed as Catalyst column functions over
  * `ARRAY<DOUBLE>` (or `ARRAY<FLOAT>`, cast via [[asDouble]]).
  *
  * Everything here stays inside whole-stage codegen: the folds are SQL
  * higher-order functions (`zip_with` / `aggregate` / `transform`), not Scala
  * UDFs, so a distance inside a join or window never breaks the codegen span.
  * The reference's `DistanceUnit = u64` bit trick (distance.rs:13) is
  * unnecessary on Spark — DOUBLE sorts natively.
  *
  * Deviation (documented in SURVEY.md §7.5): [[hamming]] uses the full 32-bit
  * pattern of each float, not the reference's low-byte truncation
  * (distance.rs:147-148), which silently discards 24 bits per component.
  */
object Distances {

  /** Cast ARRAY<FLOAT> → ARRAY<DOUBLE> so folds accumulate in double
    * precision (matches a DuckDB oracle casting `embedding::DOUBLE[]`). */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Cross-engine-deterministic 4-decimal quantization: floor(x·1e4)/1e4.
    * Unlike `round(x, 4)` — whose handling of doubles near a 0.00005
    * half-boundary differs between engines (Spark rounds the exact decimal
    * expansion via BigDecimal; DuckDB scales-and-rounds in binary) — floor
    * and IEEE multiply/divide are exactly specified, so bit-identical inputs
    * quantize identically. Same pattern as `q_events_sessions`
    * (RelationalQueries). DuckDB twin: `floor(x * 1e4) / 1e4`. */
  def trunc4(c: Column): Column = floor(c * lit(1e4)) / lit(1e4)

  /** [[trunc4]] clamped below at 0 — for metrics that are mathematically
    * non-negative but can dip a few ulps under 0 in FP (cosine self-distance
    * = 1 − dot/‖a‖‖b‖ ≈ −1e-16), where floor would snap to −0.0001.
    * `greatest` is exact on both engines. DuckDB twin:
    * `floor(greatest(0, x) * 1e4) / 1e4`. */
  def trunc4NonNeg(c: Column): Column = trunc4(greatest(lit(0.0), c))

  /** Inner product Σ aᵢ·bᵢ — the primitive under cosine and the hyperplane
    * routing predicate (reference: src/database/index/lsh.rs:39-43).
    * Hot path → native codegen expression (same fold order as the HOF
    * form, bit-identical results). */
  def dot(a: Column, b: Column): Column = VectorDistance(a, b, VectorDistance.Dot)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** M2 `L2SquaredDistance` (distance.rs:34-49) — default text metric. */
  def l2sq(a: Column, b: Column): Column = VectorDistance(a, b, VectorDistance.L2Sq)

  /** M7 `L2Distance` (distance.rs:99-114). */
  def l2(a: Column, b: Column): Column = sqrt(l2sq(a, b))

  /** M1 `CosineDistance` = 1 − cos(a,b) (distance.rs:15-32) — default
    * image/audio metric. Zero-norm inputs yield distance 1.0 rather than
    * NaN (engine choice; the fixture has no zero vectors). */
  def cosine(a: Column, b: Column): Column =
    VectorDistance(a, b, VectorDistance.Cosine)

  /** Cosine similarity (not distance) — convenience for near-dup ops. */
  def cosineSim(a: Column, b: Column): Column =
    VectorDistance(a, b, VectorDistance.CosineSim)

  /** M6 `ManhattanDistance` Σ|aᵢ−bᵢ| (distance.rs:87-97). */
  def manhattan(a: Column, b: Column): Column =
    VectorDistance(a, b, VectorDistance.Manhattan)

  /** M3 `ChebyshevDistance` max|aᵢ−bᵢ| (distance.rs:51-61). */
  def chebyshev(a: Column, b: Column): Column =
    VectorDistance(a, b, VectorDistance.Chebyshev)

  /** M4 `CanberraDistance` Σ|aᵢ−bᵢ|/(|aᵢ|+|bᵢ|) (distance.rs:63-73);
    * 0/0 terms contribute 0. */
  def canberra(a: Column, b: Column): Column =
    VectorDistance(a, b, VectorDistance.Canberra)

  /** M5 `BrayCurtisDistance` Σ|aᵢ−bᵢ| / Σ|aᵢ+bᵢ| (distance.rs:75-85). */
  def brayCurtis(a: Column, b: Column): Column =
    VectorDistance(a, b, VectorDistance.BrayCurtis)

  /** M11 `MinkowskiDistance{p}` (Σ|aᵢ−bᵢ|^p)^(1/p) (distance.rs:160-174). */
  def minkowski(a: Column, b: Column, p: Double): Column =
    pow(pnorm(a, b, p), lit(1.0 / p))

  /** M12 `PNormDistance{p}` Σ|aᵢ−bᵢ|^p, no root (distance.rs:176-190). */
  def pnorm(a: Column, b: Column, p: Double): Column =
    VectorDistance(a, b, VectorDistance.PNorm(p))

  /** M8 `L3Distance` (distance.rs:116-126). */
  def l3(a: Column, b: Column): Column = minkowski(a, b, 3.0)

  /** M9 `L4Distance` (distance.rs:128-138). */
  def l4(a: Column, b: Column): Column = minkowski(a, b, 4.0)

  /** M10 `HammingDistance` (distance.rs:140-158): popcount of XOR over the
    * component bit patterns. Full 32 bits per float (reference keeps only
    * the low byte — documented quirk we do not reproduce). Operates on the
    * raw FLOAT array; a native codegen kernel like the other hot metrics
    * (round 4 replaced the round-2 Scala UDF — bit reinterpretation has no
    * SQL builtin, but a Catalyst expression does it inside whole-stage
    * codegen with no serialization boundary). */
  def hamming(a: Column, b: Column): Column =
    VectorDistance(a, b, VectorDistance.Hamming)

  /** Metric ADT — the engine-facing equivalent of the reference's
    * `Metric<Embedding<N>>` trait (space::Metric): pluggable by name, so a
    * user metric is one `case object` + one Column function away. */
  sealed trait Metric { def name: String; def apply(a: Column, b: Column): Column }
  case object Cosine extends Metric { val name = "cosine"; def apply(a: Column, b: Column) = cosine(a, b) }
  case object L2Squared extends Metric { val name = "l2sq"; def apply(a: Column, b: Column) = l2sq(a, b) }
  case object L2 extends Metric { val name = "l2"; def apply(a: Column, b: Column) = l2(a, b) }
  case object L3 extends Metric { val name = "l3"; def apply(a: Column, b: Column) = l3(a, b) }
  case object L4 extends Metric { val name = "l4"; def apply(a: Column, b: Column) = l4(a, b) }
  case object Manhattan extends Metric { val name = "manhattan"; def apply(a: Column, b: Column) = manhattan(a, b) }
  case object Chebyshev extends Metric { val name = "chebyshev"; def apply(a: Column, b: Column) = chebyshev(a, b) }
  case object Canberra extends Metric { val name = "canberra"; def apply(a: Column, b: Column) = canberra(a, b) }
  case object BrayCurtis extends Metric { val name = "braycurtis"; def apply(a: Column, b: Column) = brayCurtis(a, b) }
  case object Hamming extends Metric { val name = "hamming"; def apply(a: Column, b: Column) = hamming(a, b) }
  final case class Minkowski(p: Double) extends Metric { val name = s"minkowski_$p"; def apply(a: Column, b: Column) = minkowski(a, b, p) }
  final case class PNorm(p: Double) extends Metric { val name = s"pnorm_$p"; def apply(a: Column, b: Column) = pnorm(a, b, p) }

  val all: Seq[Metric] = Seq(
    Cosine, L2Squared, L2, L3, L4, Manhattan, Chebyshev, Canberra,
    BrayCurtis, Hamming, Minkowski(2.5), PNorm(2.5))

  def byName(name: String): Metric = all.find(_.name == name).getOrElse(
    throw new IllegalArgumentException(s"unknown metric: $name"))
}
