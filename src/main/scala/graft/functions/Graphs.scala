package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables — the companion of
  * [[Dedup.connectedComponents]] (min-label propagation) for WEIGHTED
  * importance: PageRank, the standard quality/importance signal for
  * web-scale corpus curation (link-graph page importance feeding crawl
  * prioritization and quality weighting).
  */
object Graphs {

  /** Fixed-iteration PageRank with exact-reproducible arithmetic:
    *   rank₀(v) = 1.0;  rankᵢ₊₁(v) = (1−d) + d·Σ_{u→v} rankᵢ(u)/out(u)
    * over DISTINCT directed edges (the classic un-normalized-total
    * convention; dangling-node rank leaks each iteration — the simplest
    * standard variant, documented as the contract). Per-edge
    * contributions are one double division then an exact decimal(28,15)
    * cast, so the per-node sum is order-independent and the whole
    * fixed-iteration computation is re-derivable by any engine (the
    * q160 gate re-runs every iteration in SQL).
    *
    * Scale shape: each iteration is one shuffle join (ranks ⋈ edges on
    * src — at 100 TB the dominant exchange; pre-partitioning/bucketing
    * both on src makes it co-located across ALL iterations) plus one
    * map-side-combined aggregate on dst. Iterations are localCheckpoint-
    * bounded (the connectedComponents pattern) so plan depth stays flat
    * at any iteration count. Hot DESTINATION nodes are absorbed by the
    * partial aggregate; a hot SOURCE node is a broadcast-sized problem
    * by definition (one row replicated to its out-edges by the join). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var rank = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = e.join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("outdeg")).cast("decimal(28,15)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__s"))
      rank = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          ((lit(1.0) - lit(damping)) +
            lit(damping) * coalesce(col("__s").cast("double"), lit(0.0))).as("rank"))
        .localCheckpoint(false)
    }
    rank
  }
}
