package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword (BPE-style) token counting by DETERMINISTIC greedy
  * longest-match over a fixed vocabulary — the unit a context-window
  * packer actually budgets (whitespace tokens undercount by 1.3–1.5×
  * on English; a char/4 estimate ignores morphology entirely).
  *
  * Algorithm (the WordPiece/greedy segmentation that production
  * tokenizers use as their fast path): within each space-separated
  * word, repeatedly take the LONGEST vocabulary piece that prefixes the
  * remaining word; a code point matching no piece counts as one token
  * (byte/char fallback — the <unk>-free BPE convention). Greedy
  * longest-match is a pure per-word function of (word, vocab), which is
  * what keeps it oracle-expressible (a recursive CTE walks the same
  * positions) — a true merge-rank BPE loop would need the pair-merge
  * order and is not SQL-mirrorable; greedy over the merged vocab is the
  * standard deterministic approximation.
  *
  * The committed [[BpeImpl.Vocab]] is a FIXTURE: ~50 high-frequency
  * English merges + ASCII singles, standing in for a real model's
  * merges table (which at scale is a ~50k-entry broadcast artifact
  * loaded from the tokenizer release; the walk below is unchanged —
  * only MaxPieceLen and the set contents move).
  */
object BpeImpl {

  /** Multi-char merges first (longest 3), then the ASCII single-char
    * base vocabulary. Order is irrelevant to the walk (matching is by
    * length); it is fixed here so the oracle splice is stable. */
  /** The single-char base vocabulary (always present — the <unk>-free
    * fallback layer a fitted merge table sits on top of). */
  val Singles: Seq[String] =
    ('a' to 'z').map(_.toString) ++
      ('A' to 'Z').map(_.toString) ++
      ('0' to '9').map(_.toString) ++
      ".,;:!?'\"()-_/".map(_.toString)

  val Vocab: Seq[String] = Seq(
    "the", "ing", "ion", "and", "ent", "ter", "ers", "est",
    "ly", "ed", "er", "es", "en", "an", "in", "on", "at", "or", "re",
    "he", "nd", "ou", "ar", "st", "te", "al", "it", "is", "to", "of",
    "le", "se", "ve", "me", "de", "ri", "ro", "ic", "ne", "ra", "ce",
    "li", "ch", "ll", "be", "ma", "si", "om", "ur", "un", "co", "ab",
    "il") ++ Singles

  /** Length-indexed lookup tables for one vocabulary. */
  private[graft] def tables(
      vocab: Seq[String]): (Array[java.util.HashSet[String]], Int) = {
    val maxLen = vocab.map(_.length).max
    val a = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    vocab.foreach(p => a(p.length).add(p))
    (a, maxLen)
  }

  private val (byLen, maxLen) = tables(Vocab)

  /** The vocabulary a fitted merge table induces for the greedy
    * counter: each merge's concatenation with the `</w>` end-of-word
    * marker dropped (a full-word piece matches the bare word), plus
    * the single-char base — how a `text_bpe_fit` result plugs into
    * [[countWith]] (CurationSpec pins the composition). */
  def vocabFromMerges(merges: Seq[(String, String)]): Seq[String] =
    (merges.map { case (l, r) => (l + r).stripSuffix("</w>") }
      .filter(_.nonEmpty) ++ Singles).distinct

  /** [[count]] over an ARBITRARY vocabulary (the fitted-table form);
    * same walk, tables built per call — callers cache for bulk use. */
  def countWith(s: String, vocab: Seq[String]): Long = {
    val (b, m) = tables(vocab)
    walk(s, b, m)
  }

  /** Total subword tokens across all space-separated words of `s`.
    * Code-point semantics match the DuckDB oracle's len/substr: every
    * vocab piece is ASCII (k chars = k code points), and the unknown
    * fallback advances one full code point (surrogate pairs count 1,
    * as DuckDB counts them). Spaces delimit words and are never
    * counted; pieces cannot span a space (none contains one). */
  def count(s: UTF8String): Long = walk(s.toString, byLen, maxLen)

  private def walk(w: String,
      byLen: Array[java.util.HashSet[String]], maxLen: Int): Long = {
    val n = w.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      if (w.charAt(i) == ' ') { i += 1 }
      else {
        var l = math.min(maxLen, n - i)
        var matched = 0
        while (matched == 0 && l >= 1) {
          if (byLen(l).contains(w.substring(i, i + l))) matched = l
          else l -= 1
        }
        if (matched > 0) i += matched
        else i += Character.charCount(w.codePointAt(i))
        cnt += 1L
      }
    }
    cnt
  }
}

/** `bpe_token_count(string) -> bigint` — greedy longest-match subword
  * count over [[BpeImpl.Vocab]]; one pass per row, codegen-friendly. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }
  override def prettyName: String = "bpe_token_count"
  override def nullSafeEval(input: Any): Any =
    BpeImpl.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeImpl.count($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  def apply(c: Column): Column = Shim.column(BpeTokenCount(Shim.expression(c)))
}
