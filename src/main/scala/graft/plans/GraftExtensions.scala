package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Literal, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * The substring-truncation collapse rule SURVEY.md §4 lists as optional
 * Catalyst polish: layered width limits (e.g. an ingest-time string limit
 * followed by a stricter query-time limit) stack as
 * `substring(substring(c, 1, a), 1, b)`; one pass suffices —
 * `substring(c, 1, min(a, b))`. Cuts a per-row UTF8String copy in the
 * projection, which is real money on wide text columns at corpus scale.
 */
object CollapseTruncation extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Substring(Substring(c, Literal(1, IntegerType), Literal(a: Integer, IntegerType)),
          Literal(1, IntegerType), Literal(b: Integer, IntegerType))
          if a > 0 && b > 0 =>
        Substring(c, Literal(1, IntegerType),
          Literal(math.min(a.intValue, b.intValue), IntegerType))
    }
}

/**
 * SparkSessionExtensions entry point — activate with
 * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`, or
 * per-session via `spark.experimental.extraOptimizations`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => CollapseTruncation)
    extensions.injectPlannerStrategy(_ => TopKStrategy)
  }
}
