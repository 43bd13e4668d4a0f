package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar 2002, "Similarity
  * estimation techniques from rounding algorithms"): hash each token to
  * 64 bits, sum ±1 per bit position across tokens, emit the sign vector.
  * Near-duplicate documents land within small Hamming distance.
  *
  * Token hash = FNV-1a 64 (public-domain constants) — chosen over
  * Spark's xxhash64 internals because those helpers are private[sql];
  * determinism and dispersion are what matter here, not the exact family.
  */
object SimHashImpl {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Called from both interpreted eval and generated code. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** SimHash over features that are ALREADY 64-bit hashes (e.g. the
    * xxhash64 shingle keys the dedup pipeline shuffles): same bit-vote,
    * no string in sight. The feature hash family differs from [[simhash]]
    * (xxhash64 upstream vs FNV-1a here) but Charikar's construction only
    * needs a well-dispersed per-feature hash, so the Hamming-distance
    * geometry is statistically identical. */
  def simhashOfHashes(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash64(array<string>) -> long`, codegen'd via static call (stays
  * inside WholeStageCodegen, no boxing). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column = Shim.column(SimHash64(Shim.expression(c)))
}

/** `simhash64_hashed(array<bigint>) -> long` — SimHash over pre-hashed
  * features (see [[SimHashImpl.simhashOfHashes]]). */
case class SimHash64FromHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64_hashed requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64_hashed"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhashOfHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhashOfHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64FromHashes =
    copy(child = newChild)
}

object SimHash64FromHashes {
  def apply(c: Column): Column = Shim.column(SimHash64FromHashes(Shim.expression(c)))
}
