package graft.plans

import graft.functions.CosineSimilarity
import graft.operators.Ann
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Optimizer rule (SURVEY.md §7.6): rewrite exact cosine-top-k over an
  * LSH-indexed relation into a bucket-pruned scan —
  *
  * {{{
  *   GlobalLimit k
  *    +- Sort [cosine_sim(v, <literal query>) DESC, ...]
  *        +- Project [..., cosine_sim(...) AS score, ...]
  *            +- <child with `bucket` column carrying graft.lsh.* metadata>
  * }}}
  *
  * becomes the same plan with `Filter(bucket IN probeBuckets(query))`
  * pushed above the child: only the query's own LSH bucket (plus 1-bit
  * multiprobe neighbors) is scanned, re-scored exactly, and top-k'd.
  *
  * FILTERED KNN (the q90 `searchFiltered` pattern) composes for free:
  * when the child under the Project is itself a `Filter(pred, …)` —
  * where Catalyst's pushdown leaves any user metadata predicate — the
  * prune stacks ON TOP of it (`Filter(bucket IN …, Filter(pred, …))`),
  * so the executed scan is probe-set ∩ predicate; q142 certifies the
  * composed plan (both predicates present) against a DuckDB replay.
  *
  * This is an APPROXIMATE rewrite — it trades recall for a sub-linear
  * scan, exactly like querying through the ANN index by hand (the
  * reference's sqlite-vec analogue, `VectorStoreCommands.cs:113`) — so it
  * is OFF unless `spark.graft.ann.autoRewrite=true`. The index parameters
  * travel as column metadata written by
  * [[graft.operators.Ann.RandomHyperplaneLsh.index]], surviving parquet
  * round-trips, so a pre-indexed table rewrites with no session state.
  */
object AnnTopKRewrite extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.ann.autoRewrite"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_,
          sort @ Sort(SortOrder(scoreAttr: Attribute, Descending, _, _) +: _,
            true, proj @ Project(projList, child), _))) =>
        rewrite(scoreAttr, projList, child) match {
          case Some(filtered) =>
            gl.copy(child = ll.copy(child =
              sort.copy(child = proj.copy(child = filtered))))
          case None => gl
        }
    }
  }

  /** If scoreAttr aliases cosine_sim(vec, literal) and the child exposes a
    * graft-LSH bucket column, build the pruning filter.
    */
  private def rewrite(scoreAttr: Attribute, projList: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val cosOpt = projList.collectFirst {
      case a @ Alias(c: CosineSimilarity, _) if a.exprId == scoreAttr.exprId =>
        c
      // round(cosine_sim(...), n) AS score — the common formulation
      case a @ Alias(Round(c: CosineSimilarity, _, _), _)
          if a.exprId == scoreAttr.exprId => c
    }
    // The bucket column is either an attribute of the child (e.g. read
    // back from parquet) or — after projection collapse — an Alias defined
    // in this very Project; filter on whichever form is present.
    val bucketExpr: Option[(Expression, org.apache.spark.sql.types.Metadata)] =
      child.output.collectFirst {
        case a if a.name == "bucket" && a.metadata.contains("graft.lsh.nbits") =>
          (a: Expression, a.metadata)
      }.orElse(projList.collectFirst {
        case a: Alias if a.name == "bucket" &&
            a.metadata.contains("graft.lsh.nbits") =>
          (a.child, a.metadata)
      })
    for {
      cos <- cosOpt
      qLit <- literalQuery(cos)
      (bucket, m) <- bucketExpr
      // Idempotence guard: the optimizer re-runs the batch to fixed point
      // and would otherwise re-match our own output, stacking an identical
      // IN filter per pass. Bail if the child already carries a bucket
      // IN-prune (possibly merged into a conjunction by CombineFilters).
      if !alreadyPruned(child, bucket)
    } yield {
      val lsh = new Ann.RandomHyperplaneLsh(
        nBits = m.getLong("graft.lsh.nbits").toInt,
        dim = m.getLong("graft.lsh.dim").toInt,
        seed = m.getLong("graft.lsh.seed"))
      val probes = lsh.probeBuckets(qLit, probes = 1)
      Filter(In(bucket, probes.map(b => Literal(b))), child)
    }
  }

  /** True if `child` is already our pruning Filter: any IN — or the InSet
    * form OptimizeIn rewrites it to once the literal list exceeds
    * `spark.sql.optimizer.inSetConversionThreshold` (10; any index with
    * nBits ≥ 10 produces ≥ 11 probes) — whose value is the same bucket
    * expression (semantically) or a graft-LSH-tagged `bucket` attribute,
    * anywhere in the filter's condition tree. Matching only In would let
    * this rule re-fire every fixed-point pass after OptimizeIn converts
    * our filter, stacking duplicate prunes and keeping the batch from
    * converging.
    */
  private def alreadyPruned(child: LogicalPlan, bucket: Expression): Boolean = {
    def isBucket(v: Expression): Boolean =
      v.semanticEquals(bucket) || (v match {
        case a: Attribute =>
          a.name == "bucket" && a.metadata.contains("graft.lsh.nbits")
        case _ => false
      })
    child match {
      case Filter(cond, _) =>
        cond.exists {
          case In(v, _) => isBucket(v)
          case InSet(v, _) => isBucket(v)
          case _ => false
        }
      case _ => false
    }
  }

  private def literalQuery(c: CosineSimilarity): Option[Array[Float]] =
    Seq(c.left, c.right).collectFirst {
      case Literal(v: ArrayData, ArrayType(FloatType, _)) => v.toFloatArray()
    }
}
