package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting"): hash
  * every GramLen-character gram with a Karp–Rabin polynomial, then take
  * the minimum per sliding window of Window gram hashes. The distinct
  * window minima form the fingerprint sketch — any shared substring of
  * length ≥ GramLen + Window − 1 between two documents yields a shared
  * selected hash (the winnowing guarantee).
  *
  * The gram hash is plain modular arithmetic (base 257, mod 2³¹−1) so
  * the DuckDB oracle rebuilds it term-for-term with generated constants
  * (ascii(text[i+j:i+j])·257^(7−j) mod M); parity holds on ASCII text,
  * where DuckDB's per-character codepoint equals the byte the engine
  * reads (the documents corpus is verified ASCII — same contract as the
  * word-count oracles). Unlike the exhaustive min-md5 fingerprint
  * (MinMd5Grams, kept as the oracle-parity showcase), there is no
  * cryptographic digest anywhere — this is the benched, 100 TB-sane
  * path: ~8 multiply-adds per input byte, codegen'd, shuffle-free. */
object WinnowImpl {
  final val GramLen = 8
  final val Window = 8
  final val Base = 257L
  final val Mod = 2147483647L

  /** coef(j) = Base^(GramLen−1−j) mod Mod — the same constants the
    * oracle SQL embeds (exposed for the generator). */
  val coef: Array[Long] = {
    val c = new Array[Long](GramLen)
    c(GramLen - 1) = 1L
    var j = GramLen - 2
    while (j >= 0) { c(j) = c(j + 1) * Base % Mod; j -= 1 }
    c
  }

  private val empty = new GenericArrayData(Array.empty[Long])

  /** Per-window gram-hash minima, document order (callers wrap in
    * array_distinct/array_sort). Empty when fewer than Window grams. */
  def windowMins(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val g = n - GramLen + 1
    if (g < Window) return empty
    val h = new Array[Long](g)
    var i = 0
    while (i < g) {
      var acc = 0L
      var j = 0
      while (j < GramLen) {
        acc += (bytes(i + j) & 0xffL) * coef(j)
        j += 1
      }
      h(i) = acc % Mod
      i += 1
    }
    val w = g - Window + 1
    val out = new Array[Long](w)
    i = 0
    while (i < w) {
      var m = h(i)
      var j = 1
      while (j < Window) {
        if (h(i + j) < m) m = h(i + j)
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `gram_window_mins(string) -> array<bigint>`, codegen'd via static
  * call. */
case class GramWindowMins(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_window_mins requires STRING, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_window_mins"

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.windowMins(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.windowMins($c)")

  override protected def withNewChildInternal(newChild: Expression): GramWindowMins =
    copy(child = newChild)
}

object GramWindowMins {
  def apply(c: Column): Column = Shim.column(GramWindowMins(Shim.expression(c)))
}
