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
 *
 * Besides the optimizer rule and the TopK planner strategy, the custom
 * codegen expressions register as SQL functions, so `spark.sql` users
 * get the same kernels the DataFrame operators use:
 * `dot_f(a, b)`, `norm_f(a)`, `minhash_sig(shingles, k)`, `kgrams(text, k)`, `shingles(text, k)`,
 * `simhash_sig(tokens, bits)`, `text_features(text)`,
 * `normalize_text(text)`, `callstack_debug_cmd(stack, len, cmd)`.
 * Int/string parameters must be literals (they are codegen'd constants,
 * like the reference's fixed frame length).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Integer, IntegerType) => v.intValue
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT parameter, got $other")
  }

  private def litStr(e: Expression, fn: String): String = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal STRING parameter, got $other")
  }

  /** Wraps each builder with an arity gate: a wrong-argument-count SQL call
    * surfaces as an IllegalArgumentException naming the function and the
    * expected count, not a bare scala.MatchError from the partial function. */
  private def fn(name: String, arity: Int, usage: String)
      (builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val checked: Seq[Expression] => Expression = { args =>
      if (args.length != arity) throw new IllegalArgumentException(
        s"$name expects $arity argument${if (arity == 1) "" else "s"}, got ${args.length}")
      builder(args)
    }
    (FunctionIdentifier(name), new ExpressionInfo("graft", name, usage), checked)
  }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => CollapseTruncation)
    extensions.injectPlannerStrategy(_ => TopKStrategy)

    extensions.injectFunction(fn("dot_f", 2,
      "dot_f(a, b) - exact sequential-fold dot product of two float vectors") {
      case Seq(a, b) => graft.corpus.DotProductF(a, b)
    })
    extensions.injectFunction(fn("norm_f", 1,
      "norm_f(a) - sqrt of the sequential-fold self dot product") {
      case Seq(a) => graft.corpus.NormF(a)
    })
    extensions.injectFunction(fn("minhash_sig", 2,
      "minhash_sig(shingles, k) - k salted portable minhashes in one pass") {
      case Seq(a, k) => graft.corpus.MinHashSig(a, litInt(k, "minhash_sig"))
    })
    extensions.injectFunction(fn("simhash_sig", 2,
      "simhash_sig(tokens, bits) - tf-weighted simhash signature") {
      case Seq(a, b) => graft.corpus.SimHashSig(a, litInt(b, "simhash_sig"))
    })
    extensions.injectFunction(fn("kgrams", 2,
      "kgrams(text, k) - word k-grams (one row per window occurrence)") {
      case Seq(t, k) => graft.corpus.KGrams(t, litInt(k, "kgrams"),
        distinct = false)
    })
    extensions.injectFunction(fn("shingles", 2,
      "shingles(text, k) - distinct word k-shingles in first-occurrence order") {
      case Seq(t, k) => graft.corpus.KGrams(t, litInt(k, "shingles"),
        distinct = true)
    })
    extensions.injectFunction(fn("text_features", 1,
      "text_features(text) - single-pass (n_tokens, stop_en/de/fr/es, " +
        "n_nonalnum, n_cjk, n_chars) struct") {
      case Seq(t) => graft.corpus.TextFeatures(t)
    })
    extensions.injectFunction(fn("normalize_text", 1,
      "normalize_text(text) - dedup normalization (lower, strip " +
        "punctuation, collapse whitespace) in one char scan") {
      case Seq(t) => graft.corpus.NormalizeText(t)
    })
    extensions.injectFunction(fn("callstack_debug_cmd", 3,
      "callstack_debug_cmd(stack, frame_len, cmd) - F6 debugger command formatter") {
      case Seq(a, l, c) => graft.xel.CallstackDebugCmd(a,
        litInt(l, "callstack_debug_cmd"), litStr(c, "callstack_debug_cmd"))
    })
  }
}
