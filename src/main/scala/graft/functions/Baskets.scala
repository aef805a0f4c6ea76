package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket / co-occurrence mining over (basket, item) pairs —
  * the "what co-occurs with what" report behind curriculum mixing,
  * topic co-occurrence, and query-log analysis. The scale contract is
  * the classic Apriori pruning: items are support-filtered BEFORE any
  * pair is formed, so the per-basket pair fan-out is bounded by the
  * basket's FREQUENT-item count squared (a hot basket of rare items
  * costs nothing; a basket that is mostly frequent items is the
  * signal, and its size is the domain's bound — document baskets
  * belong in the jaccard/minhash family instead).
  */
object Baskets {

  /** Pairwise association rules with exact support / confidence /
    * lift: items are deduped per basket, support-filtered at
    * `minSupport` (fraction of baskets), pairs formed per basket
    * between surviving items only (canonical item1 < item2), filtered
    * again at `minSupport`, and scored:
    *   support = c(ab)/N, conf(a→b) = c(ab)/c(a),
    *   lift = N·c(ab)/(c(a)·c(b))
    * — all counts exact longs, each ratio one pinned double chain.
    * Output: top `topN` rules by (lift desc, item1, item2) —
    * deterministic under ties — with columns (item1, item2, n_baskets,
    * c1, c2, c_pair, support, conf_1_2, conf_2_1, lift). */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Double, topN: Int): DataFrame = {
    require(minSupport > 0 && minSupport <= 1,
      s"minSupport must be in (0, 1], got $minSupport")
    require(topN > 0, s"topN must be positive, got $topN")
    def d(c: Column) = c.cast("double")
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nb = items.agg(countDistinct(col("__b")).as("__nb"))
    val ic = items.groupBy(col("__i")).agg(count(lit(1)).as("__ci"))
    // support threshold in basket counts: c ≥ ceil(minSupport·N)
    val freq = ic.crossJoin(broadcast(nb))
      .filter(col("__ci") >= ceil(lit(minSupport) * col("__nb")))
      .select(col("__i"), col("__ci"), col("__nb"))
    val fi = items.join(freq.select(col("__i")), "__i")
    val pairs = fi.select(col("__b"), col("__i").as("__i1"))
      .join(fi.select(col("__b").as("__b2"), col("__i").as("__i2")),
        col("__b") === col("__b2") && col("__i1") < col("__i2"))
      .groupBy(col("__i1"), col("__i2")).agg(count(lit(1)).as("__cp"))
    pairs
      .join(freq.select(col("__i").as("__i1"), col("__ci").as("__c1"),
        col("__nb")), "__i1")
      .join(freq.select(col("__i").as("__i2"), col("__ci").as("__c2")),
        "__i2")
      .filter(col("__cp") >= ceil(lit(minSupport) * col("__nb")))
      .select(col("__i1").as("item1"), col("__i2").as("item2"),
        col("__nb").as("n_baskets"), col("__c1").as("c1"),
        col("__c2").as("c2"), col("__cp").as("c_pair"),
        (d(col("__cp")) / d(col("__nb"))).as("support"),
        (d(col("__cp")) / d(col("__c1"))).as("conf_1_2"),
        (d(col("__cp")) / d(col("__c2"))).as("conf_2_1"),
        (d(col("__cp")) * d(col("__nb")) /
          (d(col("__c1")) * d(col("__c2")))).as("lift"))
      .orderBy(col("lift").desc, col("item1"), col("item2"))
      .limit(topN)
  }
}
