package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DecimalSignDotProduct, MinHashSignature}

/** SparkSessionExtensions installer: exposes the engine's custom
  * Catalyst expressions to the SQL surface (`SELECT cosine_sim(a, b)`,
  * `SELECT minhash_signature(sh, 64)`), the registration route the
  * Spark docs prescribe for third-party expressions. Wired into
  * [[Engine.session]]; also usable via
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a real
  * cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator extension (tier (c)): as-of join planner strategy
    // + its filter-pushdown optimizer rule
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsofJoin)
    e.injectOptimizerRule(_ => graft.plans.PruneAsofJoinColumns)
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("decimal_sign_dot"),
      new ExpressionInfo(classOf[DecimalSignDotProduct].getName,
        "decimal_sign_dot"),
      (exprs: Seq[Expression]) => DecimalSignDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_signature numHashes must be a literal int, got $other")
        }
        MinHashSignature(exprs.head, k).toAggregateExpression()
      }))
  }
}
