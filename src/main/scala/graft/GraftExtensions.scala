package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions` entry point: installs every custom Catalyst
  * expression ([[graft.functions.GraftFunctions.builders]]) at session
  * BUILD time, so a deployment enables the engine's SQL surface with
  * configuration alone —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or programmatically:
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * — no code call required (the runtime alternative,
  * `GraftFunctions.registerAll`, registers the same builders into an
  * already-built session and remains for library use;
  * `Tables.createViews` calls it). Extension-injected functions are
  * session-wide and survive `newSession()`, which temp functions do
  * not — the right registration for a multi-tenant Spark deployment
  * where the engine is one library among several.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getCanonicalName, name),
        builder))
    }
    // the custom whole-operator plan nodes: the as-of join strategy and
    // its filter-pushdown rule (graft.plans) — conf-time form of
    // GraftPlans.install
    ext.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsofJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsofPayload)
    // the as-of family's SQL surface: the asof_join table-valued
    // function plus the analyzer rule that lowers its placeholder to
    // the native plan node once the relations resolve. Both are
    // session-BUILD hooks — SQL users need the extension; DataFrame
    // users keep the runtime GraftPlans.install path.
    ext.injectTableFunction(graft.plans.AsofSqlJoin.description)
    ext.injectResolutionRule(_ => graft.plans.ResolveAsofJoin)
  }
}
