package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style fingerprint: minimum md5 (hex) over all 8-character
  * substrings — semantically identical to
  * `array_min(transform(sequence(1, greatest(len-7, 1)), i -> md5(substr(text, i, 8))))`
  * and to the DuckDB list-comprehension oracle, but computed with a
  * thread-local digest, byte-wise min tracking (hex encoding is monotone
  * in digest bytes, so comparing raw digests is equivalent), and a
  * single hex conversion at the end — no per-window string allocations. */
object MinMd5Impl {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  def minMd5Grams(s: UTF8String): UTF8String = {
    val n = s.numChars()
    val windows = math.max(n - 7, 1)
    val digest = md5.get()
    var best: Array[Byte] = null
    var i = 0
    while (i < windows) {
      // codepoint-based window, matching substr/text[i:i+7] semantics
      val win = s.substringSQL(i + 1, 8)
      digest.reset()
      val d = digest.digest(win.getBytes)
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexChars((best(j) >> 4) & 0xf).toByte
      hex(2 * j + 1) = HexChars(best(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

case class MinMd5Grams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_md5_grams requires STRING, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "min_md5_grams"

  override def nullSafeEval(input: Any): Any =
    MinMd5Impl.minMd5Grams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinMd5Impl.minMd5Grams($c)")

  override protected def withNewChildInternal(newChild: Expression): MinMd5Grams =
    copy(child = newChild)
}

object MinMd5Grams {
  def apply(c: Column): Column = Shim.column(MinMd5Grams(Shim.expression(c)))
}
