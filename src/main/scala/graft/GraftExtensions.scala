package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: the idiomatic way to ship the engine's
  * native functions to a cluster —
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Injects `cosine_sim` and `simhash64` (codegen Catalyst expressions,
  * functions/CosineSim and functions/SimHash64Expr) into every session
  * built with the extension, no per-session register call needed. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      exprs => graft.functions.CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64Expr].getName, "simhash64"),
      exprs => graft.functions.SimHash64Expr(exprs.head)))
  }
}
