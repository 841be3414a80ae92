package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarity, DotProduct, L2Norm}

/** Optimizer rule: rewrite the three-pass cosine formulation
  * `dot_product(a, b) / (l2_norm(a) * l2_norm(b))` into the fused one-pass
  * `cosine_sim(a, b)` kernel.
  *
  * Users writing the textbook formula get three traversals of each vector
  * per row; the fused kernel does one. On a brute-force 100 TB similarity
  * scan the vector traversals ARE the query cost, so this rewrite is a
  * straight ~3× on the hot path. Injected via
  * `SparkSessionExtensions.injectOptimizerRule` (extension path) and
  * `spark.experimental.extraOptimizations` (prepare() path for externally
  * built sessions).
  *
  * Semantics note: the rewrite fires only when both norms are over exactly
  * the (semantically) same children as the dot product. For zero vectors
  * the formula yields NULL/NaN while the kernel defines 0.0 — the engine's
  * documented cosine_sim convention.
  */
object FuseCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotProduct(a, b), Multiply(L2Norm(na), L2Norm(nb), _), _)
          if (a.semanticEquals(na) && b.semanticEquals(nb)) ||
            (a.semanticEquals(nb) && b.semanticEquals(na)) =>
        CosineSimilarity(a, b)
    }
}
