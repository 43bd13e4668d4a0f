package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused centroid-scoring expressions (r22) — the [[PqEncode]] treatment
  * applied to the IVF-family score arrays.
  *
  * WHY: every IVF/semantic query builds its per-row centroid score
  * vector as `array(cents.map(cv => cosine(v, typedLit(cv))))` — a
  * 16-branch expression tree, each branch a DotProduct against a
  * 64-double literal plus two Sqrts and a division, and most plans
  * embed SEVERAL copies (assignment + probe routing + incremental
  * slices: `sim_ann_ivf_incremental` carries three). The analyzer,
  * optimizer and AQE re-walk those trees on every pass and codegen
  * compiles ~1k expression nodes per copy; r22 profiling showed the
  * queries' walls tracking the copy count at equal stage counts
  * (sim_ann_ivf 1.16 s vs sim_ann_ivf_incremental 1.77 s, both
  * 10 stages, executor run ≈ 0.2 s). These expressions collapse each
  * copy to ONE node over a digest-equality payload ([[CentroidsRef]],
  * the [[CodebookRef]] pattern), with the same tight-loop math.
  *
  * BIT-PARITY with the literal tree (and so with the DuckDB mirrors):
  *  - dot products accumulate s += a·b left-to-right from 0.0 —
  *    [[DotProductImpl.dot]]'s loop verbatim;
  *  - the centroid norms ‖c‖ = Math.sqrt(Σc·c) are precomputed with the
  *    same fold the constant-folded `sqrt(dot_product(lit, lit))`
  *    evaluates;
  *  - cosine = dot / (Math.sqrt(Σv·v) · ‖c‖) — the exact Multiply /
  *    Divide order of `dot / (norm(v) * norm(c))`;
  *  - the quantized form is (long) Math.floor(cos · scale), ≡
  *    `floor(cosine * lit(scale)).cast("long")`.
  * CentroidOpsSpec pins fused ≡ literal-tree bit-for-bit on the real
  * embeddings at both output types.
  *
  * Null stance: whole-result null when the vector is null or shorter
  * than the centroid dimension (the PqEncode convention; the literal
  * tree nulls per-element instead, a difference only a malformed vector
  * could observe — embeddings are fixed-dimension by construction, and
  * the spec pins the well-formed equivalence). Element nulls are not
  * checked, matching [[DotProductImpl]]'s documented stance. */
final class CentroidsRef(val cents: Seq[Seq[Double]]) extends Serializable {
  require(cents.nonEmpty, "empty centroid list")
  val dim: Int = cents.head.length
  require(cents.forall(_.length == dim), "ragged centroids")
  /** Flattened centroids + precomputed norms (the constant-folded
    * sqrt(dot(c, c)) of the literal tree, same fold). */
  @transient lazy val cw: Array[Double] = cents.flatten.toArray
  @transient lazy val norms: Array[Double] = cents.map { cv =>
    var s = 0.0
    var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    Math.sqrt(s)
  }.toArray
  private val digest: Long = {
    var h = 0xcbf29ce484222325L
    cents.foreach(_.foreach { x =>
      h = (h ^ java.lang.Double.doubleToLongBits(x)) * 0x100000001B3L
    })
    h
  }
  override def hashCode: Int = (digest ^ (digest >>> 32)).toInt
  override def equals(o: Any): Boolean = o match {
    case r: CentroidsRef => (this eq r) || (digest == r.digest && cents == r.cents)
    case _ => false
  }
  override def toString: String = s"centroids(${cents.length}x$dim)"
}

object CentroidOpsImpl {
  /** out(c) = dot(v, cent_c) / (sqrt(dot(v, v)) · ‖cent_c‖) — the
    * literal tree's IEEE sequence element-for-element. */
  def cosines(v: ArrayData, r: CentroidsRef): ArrayData = {
    val dim = r.dim
    val cw = r.cw
    val norms = r.norms
    var vv = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); vv += x * x; i += 1 }
    val nv = Math.sqrt(vv)
    val out = new Array[Double](norms.length)
    var c = 0
    while (c < norms.length) {
      var s = 0.0
      val base = c * dim
      var d = 0
      while (d < dim) { s += v.getDouble(d) * cw(base + d); d += 1 }
      out(c) = s / (nv * norms(c))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** out(c) = (long) Math.floor(cosine_c · scale) — ≡
    * floor(cos * lit(scale)).cast("long"). */
  def quant(v: ArrayData, r: CentroidsRef, scale: Double): ArrayData = {
    val cos = cosines(v, r).asInstanceOf[GenericArrayData]
    val k = r.norms.length
    val out = new Array[Long](k)
    var c = 0
    while (c < k) { out(c) = Math.floor(cos.getDouble(c) * scale).toLong; c += 1 }
    new GenericArrayData(out)
  }
}

/** `centroid_cosines(array<double>) -> array<double>` — all-centroid
  * cosine scores in one codegen'd call. */
case class CentroidCosines(child: Expression, ref: CentroidsRef)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_cosines requires ARRAY<DOUBLE>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_cosines"
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != ref.dim) null
    else CentroidOpsImpl.cosines(v, ref)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("centroids", ref, classOf[CentroidsRef].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c.numElements() != $rRef.dim()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CentroidOpsImpl.cosines($c, $rRef);
         |}""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): CentroidCosines =
    copy(child = newChild)
}

object CentroidCosines {
  def apply(v: Column, cents: Seq[Seq[Double]]): Column =
    Shim.column(CentroidCosines(Shim.expression(v), new CentroidsRef(cents)))
}

/** `centroid_quant_scores(array<double>; scale) -> array<long>` — the
  * floor(cosine·scale) LONG scores of the Lloyd-fitted search paths. */
case class CentroidQuantScores(child: Expression, scale: Double, ref: CentroidsRef)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_quant_scores requires ARRAY<DOUBLE>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_quant_scores"
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != ref.dim) null
    else CentroidOpsImpl.quant(v, ref, scale)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("centroids", ref, classOf[CentroidsRef].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c.numElements() != $rRef.dim()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CentroidOpsImpl.quant($c, $rRef, $scale);
         |}""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): CentroidQuantScores =
    copy(child = newChild)
}

object CentroidQuantScores {
  def apply(v: Column, cents: Seq[Seq[Double]], scale: Double): Column =
    Shim.column(CentroidQuantScores(Shim.expression(v), scale, new CentroidsRef(cents)))
}
