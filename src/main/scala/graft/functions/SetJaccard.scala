package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Set Jaccard of two NUMERICALLY SORTED long arrays by merge walk —
  * bit-identical to `size(array_intersect(a,b)) / size(array_union(a,b))`
  * (duplicates are skipped, the division is the same double-by-int
  * quotient), but with zero per-row allocation: the built-in pair
  * materializes an OpenHashSet plus two result arrays per candidate
  * pair, which was the dominant CPU line of the dedup verify stages
  * (each doc's array is re-walked once per candidate pair it appears
  * in). Callers sort once per document (`array_sort`), not per pair.
  *
  * Precondition: inputs sorted ascending, no null elements (the dedup
  * arrays are hashes of non-null shingles; sortedness is asserted in
  * DedupSpec's differential test). Unsorted input degrades to a wrong
  * count, never a crash. */
object SetJaccardImpl {
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      union += 1
      if (x == y) {
        inter += 1
        while (i < na && a.getLong(i) == x) i += 1
        while (j < nb && b.getLong(j) == y) j += 1
      } else if (x < y) {
        while (i < na && a.getLong(i) == x) i += 1
      } else {
        while (j < nb && b.getLong(j) == y) j += 1
      }
    }
    while (i < na) {
      val x = a.getLong(i)
      union += 1
      while (i < na && a.getLong(i) == x) i += 1
    }
    while (j < nb) {
      val y = b.getLong(j)
      union += 1
      while (j < nb && b.getLong(j) == y) j += 1
    }
    // total where the ANSI built-in composition throws: empty∩empty ⇒
    // NaN (unreachable from candidate pairs, which share an element by
    // construction; NaN fails any >= threshold cut regardless)
    inter.toDouble / union
  }

  /** The same merge walk over plain long arrays — the form the
    * streaming near-dup state verifier uses (state rows are decoded
    * Scala arrays, not ArrayData). Same precondition: sorted
    * ascending. */
  def jaccardSortedArrays(a: Array[Long], b: Array[Long]): Double = {
    val na = a.length
    val nb = b.length
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    while (i < na && j < nb) {
      val x = a(i)
      val y = b(j)
      union += 1
      if (x == y) {
        inter += 1
        while (i < na && a(i) == x) i += 1
        while (j < nb && b(j) == y) j += 1
      } else if (x < y) {
        while (i < na && a(i) == x) i += 1
      } else {
        while (j < nb && b(j) == y) j += 1
      }
    }
    while (i < na) {
      val x = a(i)
      union += 1
      while (i < na && a(i) == x) i += 1
    }
    while (j < nb) {
      val y = b(j)
      union += 1
      while (j < nb && b(j) == y) j += 1
    }
    inter.toDouble / union
  }
}

/** `set_jaccard_sorted(array<bigint>, array<bigint>) -> double`,
  * codegen'd via static call. */
case class SetJaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"set_jaccard_sorted requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got (${l.sql}, ${r.sql})")
    }
  // Deliberately NOT nullIntolerant: the marker lets the optimizer infer
  // an `isnotnull(<whole array expr>)` constraint and push it into one
  // join branch's scan, which de-canonicalizes that branch from its
  // exchange-sharing twin — measured as a second full scan + shuffle in
  // dedupMinHashLsh (stages 7→8, input 2×). Null inputs still return
  // null via nullSafeEval; the arrays are provably non-null anyway.
  override def nullIntolerant: Boolean = false
  override def prettyName: String = "set_jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetJaccardImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetJaccardImpl.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SetJaccardSorted =
    copy(left = newLeft, right = newRight)
}

object SetJaccardSorted {
  def apply(a: Column, b: Column): Column =
    Shim.column(SetJaccardSorted(Shim.expression(a), Shim.expression(b)))
}

/** Distinct-intersection COUNT of two numerically sorted long arrays by
  * the same zero-alloc merge walk — bit-identical to
  * `size(array_intersect(a, b))` (duplicate runs count once), minus the
  * per-pair OpenHashSet + result-array allocation the built-in pays.
  * Used by the containment verify, where overlap relative to the
  * smaller set is the score and the jaccard denominator is wrong.
  * Same precondition as [[SetJaccardImpl]]: sorted ascending, no null
  * elements. */
object SetOverlapImpl {
  def overlapSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        inter += 1
        while (i < na && a.getLong(i) == x) i += 1
        while (j < nb && b.getLong(j) == y) j += 1
      } else if (x < y) {
        while (i < na && a.getLong(i) == x) i += 1
      } else {
        while (j < nb && b.getLong(j) == y) j += 1
      }
    }
    inter
  }
}

/** `set_overlap_sorted(array<bigint>, array<bigint>) -> int`,
  * codegen'd via static call. */
case class SetOverlapSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"set_overlap_sorted requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got (${l.sql}, ${r.sql})")
    }
  // same exchange-reuse rationale as SetJaccardSorted: the nullIntolerant
  // marker would let inferred isnotnull constraints de-canonicalize one
  // join branch from its exchange-sharing twin
  override def nullIntolerant: Boolean = false
  override def prettyName: String = "set_overlap_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOverlapImpl.overlapSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetOverlapImpl.overlapSorted($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SetOverlapSorted =
    copy(left = newLeft, right = newRight)
}

object SetOverlapSorted {
  def apply(a: Column, b: Column): Column =
    Shim.column(SetOverlapSorted(Shim.expression(a), Shim.expression(b)))
}
