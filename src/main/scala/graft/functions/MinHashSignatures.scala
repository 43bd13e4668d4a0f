package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All-k MinHash signature in ONE pass over the shingle-hash array:
  * sig[i] = min over h of mix_i(h), with mix_i a SplitMix64-style
  * finalizer parameterized by per-i constants (wrapping 64-bit multiply —
  * fine in JVM code, where ANSI overflow checking doesn't apply; that's
  * exactly why this is an expression and not a column formula).
  *
  * Replaces 64 separate `array_min(transform(hv, h => xxhash64(h, i)))`
  * projections — 64 array traversals with per-element function-call
  * overhead — with a single traversal doing two multiplies + shifts per
  * (element, i). Output: array<long> of NumHashes minima. */
object MinHashImpl {
  final val NumHashes = 64

  // per-i odd multipliers + xor constants, derived once from SplitMix64
  private val mulA: Array[Long] = Array.tabulate(NumHashes)(i => splitmix(0x9e3779b97f4a7c15L * (i + 1)) | 1L)
  private val xorC: Array[Long] = Array.tabulate(NumHashes)(i => splitmix(0xbf58476d1ce4e5b9L * (i + 1)))

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Returns null for an empty input: an all-MaxValue signature would
    * make every empty document an LSH candidate of every other one (all
    * bands collide) — null band hashes group separately instead. */
  def signatures(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!hashes.isNullAt(j)) {
        val h = hashes.getLong(j)
        var i = 0
        while (i < NumHashes) {
          var z = (h ^ xorC(i)) * mulA(i)
          z ^= (z >>> 29)
          if (z < mins(i)) mins(i) = z
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSignatures(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null for empty input arrays
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signatures requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signatures"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.signatures(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.signatures($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatures =
    copy(child = newChild)
}

object MinHashSignatures {
  def apply(c: Column): Column = Shim.column(MinHashSignatures(Shim.expression(c)))
}
