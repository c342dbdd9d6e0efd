package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` columns, composed from built-in
  * higher-order functions so the whole expression stays inside Catalyst
  * (codegen'd, no UDF serialization) and is SQL-expressible for the DuckDB
  * oracle.
  *
  * Semantics mirror the reference distance kernel: squared Euclidean, no
  * sqrt (/root/reference/index/vamana.h:694-702). We deliberately compute in
  * DOUBLE with a left-to-right fold: float32 inputs promote to double
  * exactly, each (x-y)^2 rounds identically in any IEEE engine, and a
  * sequential sum gives bit-identical results in Spark's `aggregate` and
  * DuckDB's `list_sum` — which is what makes the cross-engine oracle
  * comparison stable (SURVEY.md §7 risk b).
  */
object VectorFunctions {

  private def asDouble(a: Column): Column = a.cast("array<double>")

  /** Σ (a_i − b_i)² — squared L2, the reference's one distance metric. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Σ a_i · b_i */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b) = a·b / (‖a‖‖b‖). No zero-norm guard: test vectors are dense. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB SQL fragment for l2sq over two list columns — the oracle twin of
    * [[l2sq]]. Keep the arithmetic shape in sync with the Column version. */
  def l2sqSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"(($a[i]::DOUBLE) - ($b[i]::DOUBLE)) * (($a[i]::DOUBLE) - ($b[i]::DOUBLE))))"

  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> ($a[i]::DOUBLE) * ($b[i]::DOUBLE)))"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
}
