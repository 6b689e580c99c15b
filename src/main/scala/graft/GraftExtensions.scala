package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.collation.CollationKey
import graft.functions.DotProduct

/** Registers graft's native expressions in the SQL function registry, so
  * plain SQL can use them:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT * FROM v ORDER BY collation_key(key)")
  * spark.sql("SELECT dot_product(a, b) FROM pairs")
  * }}}
  */
object GraftExtensions {
  /** Register the same functions into an ALREADY-BUILT session — for
    * callers that cannot control the builder (notebooks, harnesses
    * handed a session). Same builders as the extension path. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(new FunctionIdentifier("collation_key"),
      new ExpressionInfo(classOf[CollationKey].getName, "collation_key"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "collation_key(value) takes one argument")
        CollationKey(args.head)
      })
    reg.registerFunction(new FunctionIdentifier("collation_key_locale"),
      new ExpressionInfo(classOf[CollationKey].getName,
        "collation_key_locale"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "collation_key_locale(value) takes one argument")
        CollationKey(args.head, locale = true)
      })
    reg.registerFunction(new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args(0), args(1))
      })
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("collation_key"),
      new ExpressionInfo(classOf[CollationKey].getName, "collation_key"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "collation_key(value) takes one argument")
        CollationKey(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("collation_key_locale"),
      new ExpressionInfo(classOf[CollationKey].getName, "collation_key_locale"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "collation_key_locale(value) takes one argument")
        CollationKey(args.head, locale = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args(0), args(1))
      }))
  }
}
