package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native product-quantization encode + ADC-table expressions.
  *
  * WHY: the original PQ paths bake every codeword into the plan as
  * literals — assignment is an `array(k dists) → array_min →
  * array_position` tree of k `dot_const` expressions PER SUBSPACE.
  * At the 4-bit default (k = 16, 8 subspaces = 128 dots/row) that is
  * tolerable; at the FAISS-default 8-bit codebooks (k = 256, 2048
  * dots/row) the expression tree blows past what codegen handles
  * gracefully and the r14 experiment measured a 10× wall on the encode
  * (SCALING.md:195-201) — which is what kept the raw IVF-PQ tier at
  * 4-bit codes and recall@5 = 0.14. These expressions replace the
  * whole per-row tree with ONE codegen'd static call looping over a
  * plan-constant codebook array: O(k·d) tight double math per
  * subspace, no per-codeword expression nodes, no intermediate arrays.
  *
  * BIT-PARITY with the literal tree (and the DuckDB mirrors):
  *  - dots accumulate s += v[off+d]·c[d] left-to-right from 0.0 — the
  *    identical IEEE sequence as DotProductImpl.dotConst and DuckDB's
  *    list_dot_product;
  *  - codeword norms ‖c‖² are the same left-to-right Scala fold as
  *    Similarity.normSq (computed once at model construction);
  *  - assignment compares dq = (long) floor((‖c‖² − 2·v_m·c)·scale)
  *    exactly as floor(...).cast("long"), FIRST index wins ties — ≡
  *    array_position(dists, array_min(dists)) and the oracles'
  *    ORDER BY dq ASC, c ASC;
  *  - table entries are (long) floor(q_m·c·scale) ≡ the literal form.
  * PqOpsSpec pins expression ≡ literal-tree equality on fitted
  * codebooks at both k = 16 and k = 256.
  *
  * The codebooks live in the EXPRESSION as Seq[Seq[Seq[Double]]] (so
  * case-class equality stays structural and exchange reuse between
  * identical subtrees keeps working); the flattened primitive arrays
  * the hot loop reads are a transient lazy model rebuilt on each
  * executor. Null handling follows the graft expression stance
  * (nullIntolerant = false, null input ⇒ null, a too-short vector ⇒
  * null like the dot_const padding rule). */
object PqOpsImpl {

  /** Flattened, loop-friendly view of the codebooks: cw(m) holds
    * subspace m's k codewords concatenated; norms(m)(c) = ‖c‖² by the
    * normSq fold. Rebuilt lazily per executor from the Seq form. */
  final class Model(val cw: Array[Array[Double]], val norms: Array[Array[Double]],
      val subDim: Int, val scale: Double) extends Serializable {
    val subspaces: Int = cw.length
    val totalDim: Int = subspaces * subDim
  }

  /** True iff any element of v in [from, until) is NULL. Embeddings
    * never carry null elements today, but the input type is
    * ARRAY<DOUBLE> with containsNull from whatever plan produced it
    * (a parquet round-trip flips it true): reading a null slot through
    * getDouble would silently yield 0.0 (UnsafeArrayData) or NPE
    * (GenericArrayData), so a null in the read span nulls the whole
    * result instead — the conservative whole-expression form of the
    * literal tree's null propagation. */
  def anyNullIn(v: ArrayData, from: Int, until: Int): Boolean = {
    var i = from
    var found = false
    while (!found && i < until) { found = v.isNullAt(i); i += 1 }
    found
  }

  def model(codebooks: Seq[Seq[Seq[Double]]], scale: Double): Model = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty))
    val subDim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subDim)),
      "ragged PQ codebooks")
    val cw = codebooks.map(cb => cb.flatten.toArray).toArray
    val norms = codebooks.map(_.map { cv =>
      var s = 0.0
      cv.foreach(x => s += x * x) // the Similarity.normSq fold, verbatim
      s
    }.toArray).toArray
    new Model(cw, norms, subDim, scale)
  }

  /** All-subspace codeword assignment: out(m) = argmin_c
    * (long) floor((‖c‖² − 2·v_m·c)·scale), first index on ties. */
  def encode(v: ArrayData, m: Model): ArrayData = {
    val out = new Array[Int](m.subspaces)
    var s = 0
    while (s < m.subspaces) {
      val cw = m.cw(s)
      val ns = m.norms(s)
      val off = s * m.subDim
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < ns.length) {
        var dot = 0.0
        val base = c * m.subDim
        var d = 0
        while (d < m.subDim) { dot += v.getDouble(off + d) * cw(base + d); d += 1 }
        val dq = Math.floor((ns(c) - 2.0 * dot) * m.scale).toLong
        if (dq < best) { best = dq; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Subspace `sub`'s ADC lookup table for query vector q:
    * tab(c) = (long) floor(q_m·c·scale). */
  def table(q: ArrayData, m: Model, sub: Int): ArrayData = {
    val cw = m.cw(sub)
    val k = m.norms(sub).length
    val off = sub * m.subDim
    val out = new Array[Long](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      val base = c * m.subDim
      var d = 0
      while (d < m.subDim) { dot += q.getDouble(off + d) * cw(base + d); d += 1 }
      out(c) = Math.floor(dot * m.scale).toLong
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Content-digested codebook payload for the PQ expressions (r21).
  *
  * The codebooks USED to live in the expression case classes as bare
  * Seq[Seq[Seq[Double]]] fields. Case-class equality/hashCode over that
  * is a 16k-double walk at the 32×256 geometry — and the driver runs
  * expression equality constantly: every optimizer rule batch, every
  * AQE re-optimization between stages, every exchange-reuse probe. The
  * sim_ann_ivfpq_32x8 profile showed ~2.5 s of its 4.5 s wall as
  * BETWEEN-stage driver gaps (32 PqAdcTable columns × 16k doubles
  * hashed per re-planning pass). This wrapper digests the content once
  * at construction: hashCode is O(1), equals short-circuits on
  * reference or digest, and deep-compares only on a digest match —
  * equality stays STRUCTURAL (exchange reuse between identical
  * subtrees keeps working), just no longer O(model size) per call. */
final class CodebookRef(val codebooks: Seq[Seq[Seq[Double]]], val scale: Double)
    extends Serializable {
  @transient lazy val model: PqOpsImpl.Model = PqOpsImpl.model(codebooks, scale)
  private val digest: Long = {
    var h = java.lang.Double.doubleToLongBits(scale) * 0x9E3779B97F4A7C15L
    codebooks.foreach(_.foreach(_.foreach { x =>
      h = (h ^ java.lang.Double.doubleToLongBits(x)) * 0x100000001B3L
    }))
    h
  }
  override def hashCode: Int = (digest ^ (digest >>> 32)).toInt
  override def equals(o: Any): Boolean = o match {
    case r: CodebookRef => (this eq r) ||
      (digest == r.digest && scale == r.scale && codebooks == r.codebooks)
    case _ => false
  }
  override def toString: String =
    s"codebooks(${codebooks.length}x${codebooks.headOption.fold(0)(_.length)}, scale=$scale)"
}

/** `pq_encode(array<double>) -> array<int>` — all-subspace codeword
  * assignment against plan-constant codebooks in one codegen'd call. */
case class PqEncode(child: Expression, ref: CodebookRef)
    extends UnaryExpression {
  @transient private lazy val m: PqOpsImpl.Model = ref.model
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<DOUBLE>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = false
  // null when the vector is shorter than the subspace span (the
  // dot_const padding rule applied whole-vector)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m.totalDim ||
      PqOpsImpl.anyNullIn(v, 0, m.totalDim)) null
    else PqOpsImpl.encode(v, m)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pqModel", m, classOf[PqOpsImpl.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c.numElements() < $mRef.totalDim() || graft.functions.PqOpsImpl.anyNullIn($c, 0, $mRef.totalDim())) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PqOpsImpl.encode($c, $mRef);
         |}""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(v: Column, codebooks: Seq[Seq[Seq[Double]]], scale: Double): Column =
    Shim.column(PqEncode(Shim.expression(v), new CodebookRef(codebooks, scale)))
}

/** `pq_adc_table(array<double>; m) -> array<long>` — subspace m's
  * per-query ADC lookup table against plan-constant codebooks.
  *
  * Field order matters (ADVICE r21): the generated case-class equals
  * compares fields in declaration order, and a query carries up to 32
  * of these columns differing ONLY in `sub` over the same digest-equal
  * codebooks — with `ref` declared before `sub`, every cross-column
  * equality probe deep-compared the 16k-double codebooks before
  * reaching the int that differs. `sub` first makes those probes O(1). */
case class PqAdcTable(child: Expression, sub: Int, ref: CodebookRef)
    extends UnaryExpression {
  require(sub >= 0 && sub < ref.codebooks.length, s"subspace $sub out of range")
  @transient private lazy val m: PqOpsImpl.Model = ref.model
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table requires ARRAY<DOUBLE>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_table"
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m.totalDim ||
      PqOpsImpl.anyNullIn(v, sub * m.subDim, (sub + 1) * m.subDim)) null
    else PqOpsImpl.table(v, m, sub)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pqModel", m, classOf[PqOpsImpl.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c.numElements() < $mRef.totalDim() || graft.functions.PqOpsImpl.anyNullIn($c, $sub * $mRef.subDim(), ($sub + 1) * $mRef.subDim())) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PqOpsImpl.table($c, $mRef, $sub);
         |}""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

object PqAdcTable {
  def apply(v: Column, codebooks: Seq[Seq[Seq[Double]]], scale: Double,
      sub: Int): Column =
    Shim.column(PqAdcTable(Shim.expression(v), sub, new CodebookRef(codebooks, scale)))

  /** Shared-ref form: one [[CodebookRef]] across a query's 32 table
    * columns keeps every cross-expression equality a reference hit. */
  def apply(v: Column, ref: CodebookRef, sub: Int): Column =
    Shim.column(PqAdcTable(Shim.expression(v), sub, ref))
}
