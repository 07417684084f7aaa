package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Contains, Expression, GreaterThan, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MultiMatchCount

/** Opt-in optimizer rewrite: an OR-chain of `contains(text, lit)` over
  * ONE text expression becomes a single Aho-Corasick pass —
  * `multi_match_count(text, array(lits)) > 0` — when
  * `spark.graft.multiContains.enabled` is true.  A blocklist screen
  * written naively as P disjuncts scans the text P times (Spark plans
  * each `Contains` separately); the rewrite makes it one pass
  * regardless of P, which at a C4-style 400-term list is the
  * difference between 400 string scans per document and one.
  *
  * Rewrite conditions, all load-bearing for semantics:
  *  - every disjunct is `Contains(text, literal)` with the SAME
  *    (semantically equal, deterministic) text child — mixed-column or
  *    computed-pattern chains keep their exact form;
  *  - every literal is non-null and non-empty (`contains(t, '')` is
  *    TRUE for any non-null t — folding it into the automaton would
  *    change results; such chains are left alone);
  *  - at least [[MultiContainsRewrite.MinTerms]] disjuncts (below that
  *    the automaton buys nothing).
  * NULL parity: on a NULL text every `Contains` is NULL so the OR is
  * NULL; the rewritten `multi_match_count` is NULL so `> 0` is NULL —
  * identical three-valued logic.
  *
  * Same extension surface as [[ApproxDistinctRewrite]]: a
  * `Rule[LogicalPlan]` injected via [[GraftExtensions]] — the hook the
  * reference could only reach by patching its Optimizer batch list
  * (reference `catalyst/optimizer/Optimizer.scala:47`).
  */
object MultiContainsRewrite extends Rule[LogicalPlan] {
  val Flag = "spark.graft.multiContains.enabled"
  val MinTerms = 3

  private def disjuncts(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => disjuncts(l) ++ disjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case or: Or =>
        val parts = disjuncts(or).map {
          case Contains(t, Literal(s: UTF8String, StringType))
              if s != null && s.numBytes > 0 => Some((t, s))
          case _ => None
        }
        if (parts.size >= MinTerms && parts.forall(_.isDefined)) {
          val pairs = parts.flatten
          val text = pairs.head._1
          if (text.deterministic && pairs.forall(_._1.semanticEquals(text)))
            GreaterThan(
              MultiMatchCount(text, Literal.create(
                pairs.map(_._2.toString),
                ArrayType(StringType, containsNull = false))),
              Literal(0))
          else or
        } else or
    }
}
