package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper marked NON-DETERMINISTIC — the optimizer-barrier
  * idiom of guide §4.4, for JVM expressions: the optimizer may not
  * constant-fold, duplicate, or push predicates/joins past a
  * non-deterministic projection, so wrapping an EXPENSIVE per-row
  * expression (the PII redact regex stack) pins its evaluation exactly
  * where the plan author placed it.
  *
  * Why it exists (r21, measured): `PushPredicateThroughNonJoin`
  * substitutes projected aliases into filters and keeps pushing —
  * the samples pipelines' quality gate (6 references to the redacted
  * text) ended up INSIDE the parquet scan stage with the redact chain
  * inlined per reference. The bench corpus is one single-row-group
  * file, so that scan stage is structurally ONE task: 0.45 s of regex
  * per pipeline tail ran serialized while 31 cores idled. With the
  * barrier, the redact evaluates once, above the upfront doc_id
  * exchange, 32-way.
  *
  * The wrapped expression must be PURE (the redact chain is): the
  * non-determinism flag is a statement to the optimizer, not a fact
  * about the value. Task retries therefore reproduce identical data;
  * Spark's indeterminate-stage rollback machinery is a no-op risk
  * here. Evaluation and codegen delegate to the child unchanged. */
case class Opaque(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the barrier: never foldable, never deterministic
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}

object Opaque {
  import org.apache.spark.sql.graftshim.Shim
  def apply(c: Column): Column = Shim.column(Opaque(Shim.expression(c)))
}
