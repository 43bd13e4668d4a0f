package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Low 64 bits of the MD5 digest, bit-for-bit equal to DuckDB's
  * `md5_number_lower(s)` (verified: little-endian interpretation of
  * digest bytes 8..15). DuckDB returns UBIGINT; this expression returns
  * the same 64-bit pattern reinterpreted as a signed long — equality
  * joins, grouping, XOR and popcount are all bit-pattern operations, so
  * oracle parity holds wherever the raw value itself never surfaces in
  * query output.
  *
  * This is the feature-hash family used wherever a fingerprint must be
  * recomputable by the DuckDB oracle; xxhash64 stays the choice for
  * engine-internal keys (cheaper, but not expressible in the oracle).
  */
object Md5Lower64Impl {
  private val md5: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def md5Lower64(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    // bytes 8..15, little-endian → the value DuckDB calls md5_number_lower
    var out = 0L
    var i = 15
    while (i >= 8) {
      out = (out << 8) | (digest(i) & 0xffL)
      i -= 1
    }
    out
  }
}

/** `md5_lower64(string) -> long`, codegen'd via static call. */
case class Md5Lower64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_lower64 requires STRING, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_lower64"

  override def nullSafeEval(input: Any): Any =
    Md5Lower64Impl.md5Lower64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Lower64Impl.md5Lower64($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lower64 =
    copy(child = newChild)
}

object Md5Lower64 {
  def apply(c: Column): Column = Shim.column(Md5Lower64(Shim.expression(c)))
}
