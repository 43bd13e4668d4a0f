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

  /** Flip masks of Hamming weight ≤ radius over `bits` positions,
    * ascending — the same enumeration order the former literal arrays
    * used. Cached per (bits, radius); tiny (≤ ~1k ints here). */
  private val ballMasks = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Int]]()
  private def masksFor(bits: Int, radius: Int): Array[Int] =
    ballMasks.computeIfAbsent((bits, radius), { case (b, r) =>
      (0 until (1 << b)).filter(Integer.bitCount(_) <= r).toArray
    })

  /** All (chunk << bits) | (chunkValue ^ flip) combined ball keys of a
    * fingerprint — see [[SimHashBallKeys]]. */
  def ballKeys(f: Long, chunks: Int, bits: Int, radius: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val masks = masksFor(bits, radius)
    val valueMask = (1L << bits) - 1
    val out = new Array[Long](chunks * masks.length)
    var c = 0
    var i = 0
    while (c < chunks) {
      val v = (f >>> (c * bits)) & valueMask
      val base = c.toLong << bits
      var m = 0
      while (m < masks.length) { out(i) = base | (v ^ masks(m)); m += 1; i += 1 }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

/** `simhash_ball_keys(bigint; chunks, bits, radius) -> array<bigint>` —
  * the banded-SimHash probe/index ball as ONE generator input (r22).
  *
  * For each of the fingerprint's `chunks` aligned `bits`-bit chunks it
  * emits every Hamming-radius-≤`radius` perturbation of the chunk
  * value, combined with the chunk index into a single join key
  * `(c << bits) | (v ^ flip)`. The (c, v) → key mapping is a bijection
  * (v < 2^bits by construction), so an equi-join on the combined key is
  * EXACTLY the former `a.c = b.c AND a.v = b.v` two-column join, and
  * the ball sets are the former posexplode(chunkVals) × explode(flips)
  * cross — DedupSpec's b16 ≡ 8-bit differential and the banded-capture
  * property test pin the searches' outputs unchanged.
  *
  * WHY: the b16 probe side generates 548 rows per document through TWO
  * chained Generate operators (4-way chunk posexplode, then a 137-mask
  * literal-array explode + XOR projection) — every intermediate and
  * final row a full UnsafeRow copy, ~2.7M rows at sf0.1, the GC center
  * of the query's profile. One expression computing the final key array
  * halves the copies (one Generate) and narrows the join key to one
  * long. The flip masks are derived from `radius` inside the expression
  * (lazily, per evaluator) so the task binary carries three ints, not a
  * 137-element array literal. */
case class SimHashBallKeys(child: Expression, chunks: Int, bits: Int, radius: Int)
    extends UnaryExpression {
  require(chunks > 0 && bits > 0 && chunks * bits <= 64, s"bad geometry $chunks x $bits")
  require(radius >= 0 && radius <= bits, s"bad radius $radius")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_ball_keys requires BIGINT, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_ball_keys"
  override def nullSafeEval(input: Any): Any =
    SimHashImpl.ballKeys(input.asInstanceOf[Long], chunks, bits, radius)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashImpl.ballKeys($c, $chunks, $bits, $radius)")
  override protected def withNewChildInternal(newChild: Expression): SimHashBallKeys =
    copy(child = newChild)
}

object SimHashBallKeys {
  def apply(f: Column, chunks: Int, bits: Int, radius: Int): Column =
    Shim.column(SimHashBallKeys(Shim.expression(f), chunks, bits, radius))
}
