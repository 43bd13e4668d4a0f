package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot products over `array<double>` columns — drop-in
  * replacements for the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * higher-order composition VectorOps started with.
  *
  * WHY: Spark evaluates higher-order functions through interpreted
  * lambda variables — per element, a boxed NamedLambdaVariable store +
  * closure invocation, plus a fresh result array per `zip_with` call.
  * Benign in isolation, but the ANN family evaluates THOUSANDS of dots
  * per row (PQ assignment: 8 subspaces × 16 codewords; IVF scoring: 16
  * cosines), which profiled as ~26 s of executor CPU per PQ fit pass
  * over a 6k-vector corpus — all allocation and dispatch, no math.
  *
  * BIT-PARITY: the loop accumulates s += a[i]·b[i] starting from 0.0,
  * left-to-right — the IDENTICAL IEEE operation sequence as the HOF
  * fold (0.0 + a₀b₀) + a₁b₁ + … and as the DuckDB oracles'
  * list_dot_product / unrolled sums, so every hash-checked score is
  * unchanged (the whole Similarity oracle family depends on this —
  * see simAnnIvfOn's BIT-PARITY note).
  *
  * Null handling: the dedup/similarity arrays are non-null with
  * non-null elements by construction; like the other graft expressions
  * these stay `nullIntolerant = false` so inferred isnotnull
  * constraints cannot de-canonicalize exchange-sharing branches
  * (SetJaccardSorted's measured pathology). Null INPUTS yield null via
  * nullSafeEval; element nulls are not checked (impossible here by
  * construction, garbage-in-garbage-out otherwise, same stance as the
  * merge-walk family on unsorted input). */
object DotProductImpl {
  /** Equal lengths only — the callers guard and null out mismatches
    * (zip_with PADS the shorter array with nulls, so the HOF fold is
    * NULL on any dim mismatch; the native form must preserve that, a
    * truncating dot would silently score malformed vectors). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Σ v[off+d]·w[d] — the literal-side form with the slice FUSED into
    * the index arithmetic (the HOF composition paid a `slice` array
    * copy per evaluation on top of the lambda overhead). Caller guards
    * off + |w| ≤ |v|. */
  def dotConst(v: ArrayData, w: Array[Double], off: Int): Double = {
    var s = 0.0
    var d = 0
    while (d < w.length) { s += v.getDouble(off + d) * w(d); d += 1 }
    s
  }
}

/** `dot_product(array<double>, array<double>) -> double` — codegen'd
  * static call; truncates to the shorter length (the zip_with rule). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got (${l.sql}, ${r.sql})")
    }
  override def nullIntolerant: Boolean = false
  // null on dim mismatch (the zip_with padding contract), even when
  // both inputs are non-null
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null else DotProductImpl.dot(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotProductImpl.dot($a, $b);
         |}""".stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))
}

/** `dot_const(array<double>; w, off) -> double` — dot against a plan
  * constant, starting at element `off` (fuses the subvector slice). */
case class DotProductConst(child: Expression, weights: Seq[Double], off: Int)
    extends UnaryExpression {
  require(off >= 0, s"offset must be >= 0, got $off")
  @transient private lazy val w: Array[Double] = weights.toArray
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dot_const requires ARRAY<DOUBLE>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = false
  // null when the slice would run past the vector (the slice+zip_with
  // composition padded and nulled there too)
  override def nullable: Boolean = true
  override def prettyName: String = "dot_const"
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < off + w.length) null
    else DotProductImpl.dotConst(v, w, off)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("dotConstW", w, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c.numElements() < ${off + weights.length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotProductImpl.dotConst($c, $wRef, $off);
         |}""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): DotProductConst =
    copy(child = newChild)
}

object DotProductConst {
  def apply(v: Column, weights: Seq[Double], off: Int = 0): Column =
    Shim.column(DotProductConst(Shim.expression(v), weights, off))
}
