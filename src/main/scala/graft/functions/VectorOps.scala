package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Elementwise vector algebra used by the LSH index build/route path
  * (reference: src/database/index/lsh.rs:20-43,174-190). All are SQL
  * higher-order functions — codegen'd, never UDFs. */
object VectorOps {

  /** I2 `LSHIndex::subtract` (lsh.rs:174-181). */
  def subtract(a: Column, b: Column): Column = zip_with(a, b, _ - _)

  /** I3 `LSHIndex::average` — elementwise midpoint (lsh.rs:183-190). */
  def average(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => (x + y) / 2.0)

  /** Scale a vector by a scalar column. */
  def scale(a: Column, k: Column): Column = transform(a, _ * k)

  /** I1 `Hyperplane::point_is_above` (lsh.rs:39-43):
    * dot(coefficients, point) + constant >= 0. */
  def pointIsAbove(coefficients: Column, constant: Column, point: Column): Column =
    Distances.dot(coefficients, point) + constant >= 0.0

  /** Unit-normalize; zero vector stays zero. */
  def normalize(a: Column): Column = {
    val n = Distances.l2Norm(a)
    when(n === 0.0, a).otherwise(transform(a, _ / n))
  }
}
