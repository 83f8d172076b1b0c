package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions (SURVEY.md §7.6): registers the engine's native
  * expressions with the SQL function registry, so `spark.sql` queries can
  * call them directly. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `GraftExtensions.install(builder)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    // Opt-in ANN rewrite: cosine-top-k over an LSH-indexed relation →
    // bucket-pruned scan (spark.graft.ann.autoRewrite=true to enable).
    ext.injectOptimizerRule(_ => graft.plans.AnnTopKRewrite)
  }
}
