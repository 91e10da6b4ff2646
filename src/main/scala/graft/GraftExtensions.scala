package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: the idiomatic way to ship the engine's
  * native functions to a cluster —
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Injects `cosine_sim`, `simhash64` and `nfc_normalize` (codegen
  * Catalyst expressions, functions/CosineSim, functions/SimHash64Expr
  * and functions/NfcNormalize) into every session built with the
  * extension, no per-session register call needed. */
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
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      exprs => graft.functions.NfcNormalize(exprs.head)))
    // plan-level surface: range-containment theta joins become
    // bucket-expansion equi-joins (plans/RangeJoinRewrite). Inert until
    // the session opts in with spark.graft.rangejoin.bucketWidth — the
    // bin size must be chosen against the data's interval widths.
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
