package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `col.expr` bridge (Connect
  * refactor); the classic converters are `private[sql]`. This shim lives in
  * the spark.sql namespace solely to expose that bridge to graft's custom
  * Catalyst expressions. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a logical plan (`Dataset.ofRows` is private[sql]). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame over an RDD of INTERNAL rows (`internalCreateDataFrame` is
    * private[sql]): lets the sanctioned RDD drop-downs (the prefix-sum
    * sites in [[graft.ops.Positions]]) stay on InternalRow instead of
    * paying the external-Row converter in BOTH directions per row. */
  def ofInternalRows(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow])
      : DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Parse SQL text to the UNRESOLVED logical plan (pre-analysis, so
    * operator nodes like `IntegralDivide` appear with their original
    * children, before coercion casts) — `sessionState` lives on the
    * classic session. */
  def parsePlan(spark: SparkSession,
      sql: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parsePlan(sql)

  /** Register a NATIVE Catalyst expression builder under a SQL-callable
    * name (`FunctionRegistry` is behind private[sql] session state). Not a
    * UDF: the built expression keeps codegen and Catalyst optimization. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
