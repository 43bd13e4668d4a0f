package graft.functions

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenizer: one byte-level pass over a text line that splits on
  * C-locale whitespace (the `istream >>` set: 0x20, 0x09–0x0D —
  * identical to Java regex `\s`), applies the reference's normalize
  * (WordNorm, byte-exact `process_word`), drops empties, and emits one
  * `word` row per surviving token.
  *
  * Replaces `Generate(explode(split(text, "\\s+"))) → Project(normalize)
  * → Filter(length > 0)` with a single Generate and no regex engine, no
  * intermediate token array, and zero-copy token slices when a token
  * needs no rewrite (the common case). The reference does this fusion
  * implicitly in its read loop (`sequential.cpp:65-72`).
  */
case class TokenizeNormalize(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("word", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokenize_normalize requires STRING, got ${other.sql}")
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // lazy iterator: no per-line buffer; rows are copied downstream by
    // the consuming operator (hash agg / unsafe projection)
    new Iterator[InternalRow] {
      private var i = 0
      private var nextWord: UTF8String = advance()

      private def advance(): UTF8String = {
        while (i < n) {
          while (i < n && isSpace(bytes(i))) i += 1
          var e = i
          while (e < n && !isSpace(bytes(e))) e += 1
          var s = i
          i = e // consume the token span
          while (s < e && WordNorm.isStrip(bytes(s))) s += 1
          var t = e
          while (t > s && WordNorm.isStrip(bytes(t - 1))) t -= 1
          if (t > s) {
            var hasUpper = false
            var j = s
            while (j < t && !hasUpper) {
              val b = bytes(j)
              if (b >= 'A' && b <= 'Z') hasUpper = true
              j += 1
            }
            if (!hasUpper) return UTF8String.fromBytes(bytes, s, t - s) // zero-copy
            val copy = java.util.Arrays.copyOfRange(bytes, s, t)
            var k = 0
            while (k < copy.length) {
              val b = copy(k)
              if (b >= 'A' && b <= 'Z') copy(k) = (b + 32).toByte
              k += 1
            }
            return UTF8String.fromBytes(copy)
          }
        }
        null
      }

      override def hasNext: Boolean = nextWord != null
      override def next(): InternalRow = {
        val row = new GenericInternalRow(Array[Any](nextWord))
        nextWord = advance()
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeNormalize =
    copy(child = newChild)

  override def prettyName: String = "tokenize_normalize"
}

object TokenizeNormalize {
  /** Column API: emits a generated column named `word`. */
  def apply(c: Column): Column = Shim.column(TokenizeNormalize(Shim.expression(c)))
}
