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
  final val NumBands = 16
  final val RowsPerBand: Int = NumHashes / NumBands

  // per-i odd multipliers + xor constants, derived once from SplitMix64
  private val mulA: Array[Long] = Array.tabulate(NumHashes)(i => splitmix(0x9e3779b97f4a7c15L * (i + 1)) | 1L)
  private val xorC: Array[Long] = Array.tabulate(NumHashes)(i => splitmix(0xbf58476d1ce4e5b9L * (i + 1)))

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def minima(hashes: ArrayData): Array[Long] = {
    val n = hashes.numElements()
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
    mins
  }

  /** Returns null for an empty input: an all-MaxValue signature would
    * make every empty document an LSH candidate of every other one (all
    * bands collide) — null band hashes group separately instead. */
  def signatures(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    new GenericArrayData(minima(hashes))
  }

  /** Mix RowsPerBand consecutive minima into one band hash (splitmix
    * fold). Kept here, next to the constants, so [[bandHashes]] and the
    * spec-side reimplementation over [[signatures]] cannot drift. */
  def foldBand(mins: Array[Long], band: Int): Long = {
    var h = 0L
    var r = 0
    while (r < RowsPerBand) { h = splitmix(h ^ mins(band * RowsPerBand + r)); r += 1 }
    h
  }

  /** The LSH banding step fused into the signature pass: NumBands band
    * hashes emitted DIRECTLY from the shingle-hash array. Replaces the
    * round-2 chain (64-long signature array → 64 projected columns → 16
    * structs → explode), whose per-document allocations made the minhash
    * query GC-bound under memory pressure (BENCH_r02: 131 s of GC). One
    * input traversal, two short-lived arrays per document, 16 longs out. */
  def bandHashes(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val mins = minima(hashes)
    val bands = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      bands(b) = foldBand(mins, b)
      b += 1
    }
    new GenericArrayData(bands)
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

/** `minhash_band_hashes(array<bigint>) -> array<bigint>[NumBands]` — the
  * fused signature+banding expression (see [[MinHashImpl.bandHashes]]). */
case class MinHashBandHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null for empty input arrays
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_hashes requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_band_hashes"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.bandHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.bandHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandHashes =
    copy(child = newChild)
}

object MinHashBandHashes {
  def apply(c: Column): Column = Shim.column(MinHashBandHashes(Shim.expression(c)))
}
