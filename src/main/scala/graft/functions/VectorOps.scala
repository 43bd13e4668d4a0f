package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `array<double>` columns.
  *
  * `dot` was originally the higher-order composition
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`; round 12 swapped in the
  * native [[DotProduct]] expression after the PQ fit profiled ~26 s of
  * executor CPU in HOF lambda dispatch + per-call array allocation
  * (8×16 dots per row). Same left-to-right IEEE sum from 0.0, so every
  * oracle-checked score is bit-identical — see DotProduct's scaladoc.
  * The HOF form survives as [[dotUnfused]] for the differential spec. */
object VectorOps {

  /** Elementwise cast to double (embeddings are stored float). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ, accumulated left-to-right in double (native, zero-alloc). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** The original higher-order composition — test-only differential
    * oracle for [[dot]] (identical IEEE fold, interpreted lambdas). */
  private[graft] def dotUnfused(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** dot against a plan-constant vector starting at element `off` —
    * fuses the subvector `slice` the PQ paths previously paid per
    * evaluation. */
  def dotLit(v: Column, w: Seq[Double], off: Int = 0): Column =
    DotProductConst(v, w, off)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; formula mirrored exactly (op-for-op) by the DuckDB
    * oracles so both engines produce identical IEEE results. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
