package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused 3-token shingle hashing: the sorted-distinct hashes of every
  * 3-token window of `split(text, " ")`, emitted straight from the text
  * bytes in one pass — no token array, no per-shingle string, no
  * `array_distinct` over strings.
  *
  * Key fact making zero-copy slicing correct: joining CONSECUTIVE
  * split-on-' ' tokens with ' ' reproduces the original byte range, so
  * the shingle `tok(i) + " " + tok(i+1) + " " + tok(i+2)` IS the
  * contiguous slice from tok(i)'s start to tok(i+2)'s end — including
  * every empty-token edge case (consecutive separators). Each window is
  * hashed directly over that slice.
  *
  * Both hash families are bit-compatible with their composition twins
  * (differential-tested in DedupSpec):
  *  - [[ShingleXxh64]]     ≡ sorted array_distinct(transform(shingles, xxhash64))
  *  - [[ShingleMd5Low64]]  ≡ the same with Md5Lower64 (≡ DuckDB md5_number_lower)
  *
  * Output order is ASCENDING (callers previously array_sort'ed anyway:
  * the merge-walk verify wants sorted sets, MinHash minima and SimHash
  * bit-votes are order-insensitive). Documents with fewer than 3 tokens
  * yield an EMPTY array — the `filter(size(toks) >= 3)` of the unfused
  * path folded into the expression. */
object ShingleHashImpl {
  private val XxhSeed = 42L // Spark's xxhash64 default seed

  def hashes(s: UTF8String, useMd5: Boolean): ArrayData =
    hashesN(s, useMd5, 3)

  /** Width-generalized form: sorted-distinct hashes of every
    * `width`-token window. The 3-token family above is `width = 3`;
    * decontamination uses 13 (the published training-set overlap
    * window). Same zero-copy slice correctness argument — consecutive
    * tokens joined by ' ' ARE the contiguous byte range. */
  def hashesN(s: UTF8String, useMd5: Boolean, width: Int): ArrayData = {
    val bytes = s.getBytes // one copy per document, reused by every window
    val n = bytes.length
    // token starts/ends under split-on-single-space semantics
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val tokens = spaces + 1
    if (tokens < width) return ShingleHashImpl.empty
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(tokens - 1) = n
    val w = tokens - width + 1
    val out = new Array[Long](w)
    i = 0
    while (i < w) {
      val off = starts(i)
      val len = ends(i + width - 1) - off
      out(i) =
        if (useMd5) Md5Lower64Impl.md5Lower64Range(bytes, off, len)
        else XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off, len, XxhSeed)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted run
    var d = 1
    i = 1
    while (i < w) {
      if (out(i) != out(i - 1)) { out(d) = out(i); d += 1 }
      i += 1
    }
    new GenericArrayData(if (d == w) out else java.util.Arrays.copyOf(out, d))
  }

  private val empty = new GenericArrayData(Array.empty[Long])

  /** The learned-model feature expansion, FUSED: md5-low64 & mask of
    * every unigram followed by every space-joined bigram, one byte
    * walk, duplicates preserved (the model counts occurrences). The
    * unfused form — `transform(split(text,' '), w => md5&mask)` ++ the
    * element_at bigram transform — pays the higher-order-function
    * interpreter per ELEMENT (ArrayTransform has no codegen; measured
    * 3.2 warm / 19 cold CPU-s for 176k grams in the dsir target fit,
    * ~18 µs per 0.5 µs hash); this walk is a static call inside
    * whole-stage codegen like the shingle family above. Bigram bytes =
    * the contiguous range from token i's start to token i+1's end —
    * identical to `concat(tok_i, ' ', tok_i1)` under split-on-single-
    * space semantics (the hashesN argument; differential-pinned in
    * TextAnalysisSpec). */
  def qmBuckets(s: UTF8String, mask: Long): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val tokens = spaces + 1
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(tokens - 1) = n
    val nb = if (tokens >= 2) tokens - 1 else 0
    val out = new Array[Long](tokens + nb)
    i = 0
    while (i < tokens) {
      out(i) = Md5Lower64Impl.md5Lower64Range(
        bytes, starts(i), ends(i) - starts(i)) & mask
      i += 1
    }
    i = 0
    while (i < nb) {
      out(tokens + i) = Md5Lower64Impl.md5Lower64Range(
        bytes, starts(i), ends(i + 1) - starts(i)) & mask
      i += 1
    }
    new GenericArrayData(out)
  }

  def xxh64(s: UTF8String): ArrayData = hashes(s, useMd5 = false)
  def md5Low64(s: UTF8String): ArrayData = hashes(s, useMd5 = true)
  def xxh64N(s: UTF8String, width: Int): ArrayData =
    hashesN(s, useMd5 = false, width)

  /** POSITIONAL width-token gram hashes: element i is the hash of the
    * window starting at token i — NO sort, NO dedupe, so `posexplode`
    * recovers (token offset, gram hash) pairs. The exact-substring
    * family needs offsets (a shared span IS a run of consecutive shared
    * gram positions); every other gram consumer wants the set form
    * above. Same zero-copy slice machinery. */
  def xxh64NPos(s: UTF8String, width: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val tokens = spaces + 1
    if (tokens < width) return empty
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(tokens - 1) = n
    val w = tokens - width + 1
    val out = new Array[Long](w)
    i = 0
    while (i < w) {
      val off = starts(i)
      val len = ends(i + width - 1) - off
      out(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off, len, XxhSeed)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `ngram_xxh64(string, n) -> array<bigint>` — the width-generalized
  * engine-internal family (sorted-distinct xxh64 of every n-token
  * window). Distinct grams ↦ distinct hashes up to ~n²/2⁶⁴ collision
  * odds, so gram-COUNT comparisons against a string-gram oracle are
  * exact in practice (same argument as the Jaccard families). */
case class NGramXxh64(child: Expression, n: Int) extends ShingleHashBase {
  require(n >= 1, s"ngram width must be >= 1, got $n")
  override protected def implName: String = "xxh64"
  override def prettyName: String = s"ngram${n}_xxh64"
  override def nullSafeEval(input: Any): Any =
    ShingleHashImpl.xxh64N(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashImpl.xxh64N($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NGramXxh64 =
    copy(child = newChild)
}

object NGramXxh64 {
  def apply(c: Column, n: Int): Column = Shim.column(NGramXxh64(Shim.expression(c), n))
}

/** `ngram_xxh64_pos(string, n) -> array<bigint>` — POSITIONAL twin of
  * [[NGramXxh64]]: element i hashes the n-token window at token offset
  * i (no sort, no dedupe). `posexplode` over it is the (doc, offset,
  * gram) expansion the exact-substring dedup's run-merge consumes. */
case class NGramXxh64Pos(child: Expression, n: Int) extends ShingleHashBase {
  require(n >= 1, s"ngram width must be >= 1, got $n")
  override protected def implName: String = "xxh64"
  override def prettyName: String = s"ngram${n}_xxh64_pos"
  override def nullSafeEval(input: Any): Any =
    ShingleHashImpl.xxh64NPos(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashImpl.xxh64NPos($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NGramXxh64Pos =
    copy(child = newChild)
}

object NGramXxh64Pos {
  def apply(c: Column, n: Int): Column =
    Shim.column(NGramXxh64Pos(Shim.expression(c), n))
}

sealed abstract class ShingleHashBase extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }
  // not nullIntolerant — see SetJaccardSorted on inferred-isnotnull
  // constraints de-canonicalizing exchange-sharing branches
  protected def implName: String
  override def nullSafeEval(input: Any): Any = implName match {
    case "xxh64" => ShingleHashImpl.xxh64(input.asInstanceOf[UTF8String])
    case _ => ShingleHashImpl.md5Low64(input.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashImpl.$implName($c)")
}

/** `qm_feature_buckets(string, mask) -> array<bigint>` — the fused
  * unigram+bigram md5-bucket expansion of the learned-model family
  * (quality model, LM score, DSIR); see [[ShingleHashImpl.qmBuckets]]. */
case class QmFeatureBuckets(child: Expression, mask: Long)
    extends ShingleHashBase {
  override protected def implName: String = "qmBuckets"
  override def prettyName: String = "qm_feature_buckets"
  override def nullSafeEval(input: Any): Any =
    ShingleHashImpl.qmBuckets(input.asInstanceOf[UTF8String], mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashImpl.qmBuckets($c, ${mask}L)")
  override protected def withNewChildInternal(newChild: Expression): QmFeatureBuckets =
    copy(child = newChild)
}

object QmFeatureBuckets {
  def apply(c: Column, mask: Long): Column =
    Shim.column(QmFeatureBuckets(Shim.expression(c), mask))
}

/** `shingle_xxh64(string) -> array<bigint>` — engine-internal key family. */
case class ShingleXxh64(child: Expression) extends ShingleHashBase {
  override protected def implName: String = "xxh64"
  override def prettyName: String = "shingle_xxh64"
  override protected def withNewChildInternal(newChild: Expression): ShingleXxh64 =
    copy(child = newChild)
}

object ShingleXxh64 {
  def apply(c: Column): Column = Shim.column(ShingleXxh64(Shim.expression(c)))
}

/** `shingle_md5_low64(string) -> array<bigint>` — oracle-recomputable
  * family (≡ DuckDB md5_number_lower per shingle). */
case class ShingleMd5Low64(child: Expression) extends ShingleHashBase {
  override protected def implName: String = "md5Low64"
  override def prettyName: String = "shingle_md5_low64"
  override protected def withNewChildInternal(newChild: Expression): ShingleMd5Low64 =
    copy(child = newChild)
}

object ShingleMd5Low64 {
  def apply(c: Column): Column = Shim.column(ShingleMd5Low64(Shim.expression(c)))
}
