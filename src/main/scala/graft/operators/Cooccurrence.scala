package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ITEM CO-OCCURRENCE / association-rule support+lift — "which items
  * appear in the same user's basket more often than chance": the
  * counting core of co-visitation recommenders and of corpus
  * co-occurrence analyses (q160's PMI is the token-window sibling;
  * this is the per-USER-basket one). For each unordered item pair:
  * n_both (users holding both), each item's support, and
  * lift = P(ab)/(P(a)·P(b)) = n_both·N/(supA·supB) at e4.
  *
  * Scale shape: baskets collapse to DISTINCT (user, item) map-side and
  * are checkpointed ONCE (three consumers — Catalyst shares no
  * subtrees); the pair join is keyed on the user, and users with more
  * than `maxBasket` distinct items are dropped BEFORE it — the skew
  * guard: one 10⁵-item power user would otherwise emit 10¹⁰ pairs
  * (and is bot traffic, not preference signal — dropping is also the
  * right semantics). Supports broadcast into the pair aggregate.
  *
  * Lift overflow budget (enforced): n_both·N·10⁴ ≤ Long.Max needs
  * N ≤ ~3·10⁷ kept users for the exact single-division form; past
  * that, `require` fails loudly — switch to a two-step trunc-div and
  * re-derive the oracle with it.
  *
  * Output: (item_a, item_b, n_both, sup_a, sup_b, lift_e4) for pairs
  * with n_both ≥ `minSupport`, ordered by (n_both desc, item_a,
  * item_b).
  */
object Cooccurrence {

  def pairs(df: DataFrame, userCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasket: Int = 64): DataFrame = {
    val baskets = graft.SparkUtil.ensureParallelism(df)
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .filter(col("__u").isNotNull && col("__i").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val keptUsers = baskets.groupBy(col("__u"))
      .agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") <= maxBasket)
      .select(col("__u"))
    val keptU = keptUsers.localCheckpoint(true)
    val kept = baskets.join(keptU, Seq("__u")).localCheckpoint(true)
    // keptU is already one row per user — no second distinct pass.
    val nUsers = keptU.count()
    require(nUsers <= 30000000L,
      s"Cooccurrence.pairs: $nUsers kept users exceeds the exact-lift " +
        "overflow cap (3e7); use a two-step trunc-div lift form")
    val sup = kept.groupBy(col("__i")).agg(count(lit(1)).as("__sup"))
    val a = kept.select(col("__u"), col("__i").as("item_a"))
    val b = kept.select(col("__u"), col("__i").as("item_b"))
    a.join(b, Seq("__u"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
      .join(broadcast(sup.select(col("__i").as("item_a"),
        col("__sup").as("sup_a"))), Seq("item_a"))
      .join(broadcast(sup.select(col("__i").as("item_b"),
        col("__sup").as("sup_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_both"),
        col("sup_a"), col("sup_b"),
        expr(s"n_both * ${nUsers}L * 10000 div (sup_a * sup_b)")
          .as("lift_e4"))
      .orderBy(col("n_both").desc, col("item_a"), col("item_b"))
  }
}
