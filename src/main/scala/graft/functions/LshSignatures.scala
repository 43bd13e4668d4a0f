package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All random-hyperplane LSH table signatures in one pass over the
  * vector: sig[t] = Σ_b (v·r_{t,b} >= 0) << b. Hyperplane components are
  * FNV-derived deterministic values precomputed once per JVM; an
  * independent reimplementation of the formula lives in SimilaritySpec's
  * differential test, so a constant/loop change here fails CI rather
  * than silently shifting every signature. Replaces `tables × bits`
  * aggregate∘zip_with column projections with primitive double loops. */
object LshImpl {
  final val Tables = 16
  final val Bits = 4
  final val Dims = 64

  def component(table: Int, bit: Int, d: Int): Double = {
    val h = SimHashImpl.fnv1a64(s"graft-lsh-$table-$bit-$d".getBytes("UTF-8"))
    (java.lang.Math.floorMod(h, 2000000L).toDouble / 1000000.0) - 1.0
  }

  // [table*Bits + bit][dim]
  private val planes: Array[Array[Double]] =
    Array.tabulate(Tables * Bits)(i => Array.tabulate(Dims)(d => component(i / Bits, i % Bits, d)))

  /** Null-propagates on dimension mismatch or null elements (the unsafe
    * getDouble on a null slot would otherwise read garbage and produce a
    * plausible-looking wrong signature). */
  def signatures(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n != Dims) return null
    val vec = new Array[Double](n)
    var d = 0
    while (d < n) {
      if (v.isNullAt(d)) return null
      vec(d) = v.getDouble(d)
      d += 1
    }
    val sigs = new Array[Long](Tables)
    var t = 0
    while (t < Tables) {
      var sig = 0L
      var b = 0
      while (b < Bits) {
        val plane = planes(t * Bits + b)
        var proj = 0.0
        var i = 0
        while (i < n) { proj += vec(i) * plane(i); i += 1 }
        if (proj >= 0) sig |= (1L << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }
}

case class LshSignatures(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null on dim mismatch / null elements
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signatures requires ARRAY<DOUBLE>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_signatures"

  override def nullSafeEval(input: Any): Any =
    LshImpl.signatures(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshImpl.signatures($c)")

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

object LshSignatures {
  def apply(c: Column): Column = Shim.column(LshSignatures(Shim.expression(c)))
}
