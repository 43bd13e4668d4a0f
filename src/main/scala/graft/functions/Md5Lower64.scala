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
  /** Digest + 16-byte output buffer, one pair per thread: `digest(buf,
    * 0, 16)` writes in place where the no-arg `digest()` allocates a
    * fresh array per call — at ~3M shingle hashes per dedup query those
    * throwaway arrays were the dominant allocation source (round-4
    * driver bench: 42 s GC on this path). */
  private final class State {
    val md: MessageDigest = MessageDigest.getInstance("MD5")
    val buf: Array[Byte] = new Array[Byte](16)
  }
  private val local: ThreadLocal[State] = new ThreadLocal[State] {
    override def initialValue(): State = new State
  }

  /** md5 low-64 of `bytes[off, off+len)`, zero per-call allocation.
    * Shared by the per-word path below and ShingleHashImpl's window
    * slices. */
  def md5Lower64Range(bytes: Array[Byte], off: Int, len: Int): Long = {
    val st = local.get()
    st.md.update(bytes, off, len)
    st.md.digest(st.buf, 0, 16) // writes in place and resets the digest
    val digest = st.buf
    // bytes 8..15, little-endian → the value DuckDB calls md5_number_lower
    var out = 0L
    var i = 15
    while (i >= 8) {
      out = (out << 8) | (digest(i) & 0xffL)
      i -= 1
    }
    out
  }

  /** Called from both interpreted eval and generated code. */
  def md5Lower64(s: UTF8String): Long = {
    val bytes = s.getBytes
    md5Lower64Range(bytes, 0, bytes.length)
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
