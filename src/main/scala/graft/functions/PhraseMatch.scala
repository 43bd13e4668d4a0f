package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-level Aho-Corasick multi-phrase matching.
  *
  * WHY: the C4 badwords page filter is "drop the page if any blocklist
  * entry occurs", where the published list is ~2k entries INCLUDING
  * multi-word phrases. The 3-word `cur_badwords` form is an IN-literal
  * inside a higher-order filter — fine at 3 single tokens, but an
  * IN over 2k entries re-scans the list per token and cannot express
  * phrases at all, and 2k per-phrase `array_contains`-style scans
  * would be O(tokens × phrases). Aho-Corasick (1975) matches ALL
  * phrases in ONE pass over the token stream: O(tokens + matches),
  * independent of list size — the standard production shape
  * (reference behavior: C4 §2.2's line-level bad-word page drop).
  *
  * SEMANTICS (mirrored exactly by the DuckDB oracle's gram join):
  * count of (position, phrase) pairs where the token subsequence
  * starting at the position equals the phrase, token-exact —
  * overlapping matches and multiple phrases ending at one position
  * all count. For single-token phrases this is exactly the IN-filter
  * count of `cur_badwords` (CurationSpec pins the differential).
  *
  * The automaton is built ONCE per plan from the phrase list (a
  * plan-constant, like the PQ codebooks) and shipped via reference
  * object; the match loop is a codegen'd static-shaped call. Tokens
  * are matched as whole symbols (UTF8String equality) — no substring
  * semantics, which keeps the oracle a plain string-equality join. */
object PhraseMatchImpl {

  /** Immutable flattened automaton: per-node transition maps over
    * UTF8String symbols, fail links, and cumulative output counts
    * (own terminal count + the fail chain's, precomputed). */
  final class Automaton(
      val trans: Array[java.util.HashMap[UTF8String, Integer]],
      val fail: Array[Int],
      val out: Array[Int]) extends Serializable {

    def count(tokens: ArrayData): Long = {
      val n = tokens.numElements()
      var state = 0
      var hits = 0L
      var i = 0
      while (i < n) {
        val tok = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
        var next: Integer = if (tok == null) null else trans(state).get(tok)
        while (next == null && state != 0) {
          state = fail(state)
          next = if (tok == null) null else trans(state).get(tok)
        }
        state = if (next == null) 0 else next.intValue()
        hits += out(state)
        i += 1
      }
      hits
    }
  }

  /** Standard AC construction: trie insert, BFS fail links, output
    * counts accumulated along fail chains. Duplicate phrases each
    * count (callers keep lists distinct). */
  def build(phrases: Seq[Seq[String]]): Automaton = {
    val trans = mutable.ArrayBuffer(new java.util.HashMap[UTF8String, Integer]())
    val ownOut = mutable.ArrayBuffer(0)
    phrases.foreach { p =>
      require(p.nonEmpty, "empty phrase")
      var node = 0
      p.foreach { tok =>
        val sym = UTF8String.fromString(tok)
        val nxt = trans(node).get(sym)
        node = if (nxt != null) nxt.intValue() else {
          trans += new java.util.HashMap[UTF8String, Integer]()
          ownOut += 0
          trans(node).put(sym, trans.size - 1)
          trans.size - 1
        }
      }
      ownOut(node) += 1
    }
    val fail = new Array[Int](trans.size)
    val out = ownOut.toArray
    val queue = mutable.Queue[Int]()
    trans(0).forEach((_, child) => queue.enqueue(child.intValue()))
    while (queue.nonEmpty) {
      val node = queue.dequeue()
      out(node) += out(fail(node))
      trans(node).forEach { (sym, child) =>
        var f = fail(node)
        var nxt = trans(f).get(sym)
        while (nxt == null && f != 0) { f = fail(f); nxt = trans(f).get(sym) }
        fail(child.intValue()) =
          if (nxt != null && nxt.intValue() != child.intValue()) nxt.intValue() else 0
        queue.enqueue(child.intValue())
      }
    }
    new Automaton(trans.toArray, fail, out)
  }
}

/** `phrase_count(array<string>) -> long` — total (position, phrase)
  * matches of a plan-constant phrase list in one automaton pass. */
case class PhraseCount(child: Expression, phrases: Seq[Seq[String]])
    extends UnaryExpression {
  @transient private lazy val ac: PhraseMatchImpl.Automaton =
    PhraseMatchImpl.build(phrases)
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phrase_count requires ARRAY<STRING>, got ${other.sql}")
  }
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "phrase_count"
  override def nullSafeEval(input: Any): Any =
    ac.count(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("phraseAutomaton", ac,
      classOf[PhraseMatchImpl.Automaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.count($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): PhraseCount =
    copy(child = newChild)
}

object PhraseCount {
  def apply(tokens: Column, phrases: Seq[Seq[String]]): Column =
    Shim.column(PhraseCount(Shim.expression(tokens), phrases))
}
