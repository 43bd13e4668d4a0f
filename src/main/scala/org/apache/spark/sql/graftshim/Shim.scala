package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark internals (the standard pattern for
  * Spark extension libraries: a shim object living under
  * `org.apache.spark.sql` to satisfy the package-private access).
  *
  * Kept to the minimum surface: Column↔Expression conversion and catalyst
  * function registration, needed so graft's custom codegen'd Expressions
  * (e.g. `normalize_word`) can be used as ordinary `Column`s without the
  * boxing cost of a Scala UDF.
  */
object Shim {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the analyzed catalyst Expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a catalyst expression builder as a SQL temp function on this
    * session (so `spark.sql("... normalize_word(x) ...")` also works). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
