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
    // Baskets as per-user SORTED item arrays in ONE aggregate (r21,
    // guide §2.3): `collect_set` dedups inside the aggregate buffer,
    // so the former standalone `distinct()` pass — a full shuffle of
    // the raw (user, item) stream — is gone; the basket-size cap is a
    // post-aggregation filter on `size(...)` (same kept set: the cap
    // counted DISTINCT items per user), so the separate kept-users
    // aggregate + keep join are gone too. Ordered pairs then unnest
    // from each array map-side (posexplode × slice — every emitted
    // pair has item_a < item_b by the sort, exactly the old self-join
    // predicate) instead of re-shuffling the basket table against
    // itself on the user key. Pair work stays bounded: ≤ maxBasket²/2
    // rows per user. Shuffles: 4 → 2 (basket aggregate + pair
    // aggregate); the user census rides in-plan as a broadcast 1-row
    // aggregate instead of a separate count action.
    val arrs = graft.SparkUtil.ensureParallelism(df)
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .filter(col("__u").isNotNull && col("__i").isNotNull)
      .groupBy(col("__u"))
      .agg(sort_array(collect_set(col("__i"))).as("__items"))
      .filter(size(col("__items")) <= maxBasket)
      .localCheckpoint(true)
    // In-plan census + overflow guard (the q176/q232 discipline): the
    // exact-lift arithmetic needs N ≤ 3e7 or the product overflows a
    // long; raise_error keeps the guard in the value expression, zero
    // extra actions. Scope caveat (ADVICE r21): embedded in lift_e4,
    // the guard fires only when at least one pair survives minSupport
    // AND the lift column is evaluated — an over-cap census with ZERO
    // surviving pairs passes silently, which is sound (no pairs means
    // no overflowing product is ever formed), and a consumer pruning
    // lift_e4 prunes the guard with the arithmetic it guards.
    val census = arrs.agg(count(lit(1)).as("__nu"))
    val nuOk = when(col("__nu") <= 30000000L, col("__nu"))
      .otherwise(raise_error(concat(lit("Cooccurrence.pairs: "),
        col("__nu").cast("string"),
        lit(" kept users exceeds the exact-lift overflow cap (3e7); " +
          "use a two-step trunc-div lift form"))))
    val sup = arrs.select(explode(col("__items")).as("__i"))
      .groupBy(col("__i")).agg(count(lit(1)).as("__sup"))
    arrs
      .select(col("__items"),
        posexplode(col("__items")).as(Seq("__p", "item_a")))
      .select(col("item_a"),
        explode(slice(col("__items"), col("__p") + 2,
          size(col("__items")) - col("__p") - 1)).as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
      .join(broadcast(sup.select(col("__i").as("item_a"),
        col("__sup").as("sup_a"))), Seq("item_a"))
      .join(broadcast(sup.select(col("__i").as("item_b"),
        col("__sup").as("sup_b"))), Seq("item_b"))
      .crossJoin(broadcast(census))
      .withColumn("__nuok", nuOk)
      .select(col("item_a"), col("item_b"), col("n_both"),
        col("sup_a"), col("sup_b"),
        expr("n_both * __nuok * 10000 div (sup_a * sup_b)")
          .as("lift_e4"))
      .orderBy(col("n_both").desc, col("item_a"), col("item_b"))
  }
}
