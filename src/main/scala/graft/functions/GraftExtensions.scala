package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY.md §2 custom-operator
  * preference order item (c)): registers the engine's native
  * expressions into the session function registry so plain SQL can
  * call them. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  *
  * Only the native expressions (`float_dot`, `rolling_hash`,
  * `nfc_normalize`) need this — everything else in the engine is
  * built-in composition; injecting a Rule/Strategy was evaluated and
  * rejected (SURVEY.md §4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(
        classOf[FloatDotProduct].getName, "float_dot",
        "float_dot(a, b) - codegen'd dot product of two float arrays in double"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(
        classOf[StringRollingHash].getName, "rolling_hash",
        "rolling_hash(s) - base-31 polynomial hash over UTF-8 bytes (order-sensitive)"),
      (exprs: Seq[Expression]) => StringRollingHash(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[NfcNormalize].getName, "nfc_normalize",
        "nfc_normalize(s) - Unicode NFC normalization (same name/semantics as DuckDB's)"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
  }
}
