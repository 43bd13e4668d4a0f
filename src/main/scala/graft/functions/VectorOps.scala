package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `array<float|double>` columns,
  * built from codegen'd higher-order functions (`zip_with`/`aggregate`) —
  * no UDF boxing, fully whole-stage-codegen compatible. */
object VectorOps {

  /** Elementwise cast to double (embeddings are stored float). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ, accumulated left-to-right in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; formula mirrored exactly (op-for-op) by the DuckDB
    * oracles so both engines produce identical IEEE results. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
