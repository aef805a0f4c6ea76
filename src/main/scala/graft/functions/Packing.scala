package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy contiguous sequence packing — the step of an LLM training
  * pipeline that concatenates documents into fixed-token-budget training
  * sequences. Docs are walked in a deterministic order within each group
  * (e.g. language or source) and appended to the current bin until the
  * next doc would overflow `budget`, which opens a new bin; a doc larger
  * than the budget gets a bin of its own.
  */
object Packing {

  /** Assign each row a `bin` id under greedy contiguous packing.
    *
    * Output columns: (groupCol, shard, orderCol, n_tokens, bin); `bin`
    * numbers from 0 within each (group, shard).
    *
    * Scale shape: ONE hash exchange on (group, shard) + an in-partition
    * (spillable) sort; the greedy walk itself is a streaming pass over
    * each run inside a task — no group is ever materialized in memory.
    * The walk is inherently sequential per run (bin i's start depends on
    * every doc before it), so a group CANNOT parallelize beyond its
    * shards: at 100 TB pass `shards` large enough that one shard's rows
    * fit a task comfortably. Bins never cross shards — the only cost is
    * ≤ one partially-filled bin per (group, shard), negligible against
    * shard sizes in the millions of tokens.
    *
    * Contract: `orderCol` must be integral and unique within its group
    * (it is the deterministic packing order); rows with a null group,
    * order, or token count are dropped (same null policy as
    * `Sketches.partitionSketch`).
    */
  def packGreedy(df: DataFrame, groupCol: String, orderCol: String,
                 tokens: Column, budget: Long, shards: Int = 1): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(shards >= 1, s"shards $shards must be ≥ 1")
    val spark = df.sparkSession
    import spark.implicits._
    val shardOf: Column =
      if (shards > 1) pmod(xxhash64(col(orderCol)), lit(shards.toLong)) else lit(0L)
    val base = df.select(
        col(groupCol).cast("string").as("g"),
        shardOf.as("shard"),
        col(orderCol).cast("long").as("ord"),
        tokens.cast("long").as("ntok"))
      .na.drop(Seq("g", "shard", "ord", "ntok"))
    val walked = base
      .repartition(col("g"), col("shard"))
      .sortWithinPartitions(col("g"), col("shard"), col("ord"))
      .as[(String, Long, Long, Long)]
      .mapPartitions { it =>
        // runs of (g, shard) are contiguous after the sort; reset the
        // greedy state at each run boundary
        var cur: (String, Long) = null
        var bin = 0L
        var acc = 0L
        it.map { case (g, sh, ord, ntok) =>
          if (cur == null || cur._1 != g || cur._2 != sh) {
            cur = (g, sh); bin = 0L; acc = ntok
          } else if (acc + ntok > budget) {
            bin += 1; acc = ntok
          } else acc += ntok
          (g, sh, ord, ntok, bin)
        }
      }
    walked.toDF(groupCol, "shard", orderCol, "n_tokens", "bin")
  }

  /** Materialize the packed training sequences themselves: one output row
    * per bin, with the member texts concatenated by `sep` in packing
    * order. Same greedy walk (and bin numbering) as [[packGreedy]], but
    * bins are emitted as they CLOSE — the task holds one bin's text at a
    * time (≤ budget tokens + one doc), never a group, so memory is bounded
    * by the sequence length regardless of group size.
    *
    * Output: (groupCol, shard, bin, n_docs, tok_total, text). */
  def packTexts(df: DataFrame, groupCol: String, orderCol: String,
                tokens: Column, textCol: String, budget: Long,
                sep: String = "\n\n", shards: Int = 1): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(shards >= 1, s"shards $shards must be ≥ 1")
    val spark = df.sparkSession
    import spark.implicits._
    val shardOf: Column =
      if (shards > 1) pmod(xxhash64(col(orderCol)), lit(shards.toLong)) else lit(0L)
    val base = df.select(
        col(groupCol).cast("string").as("g"),
        shardOf.as("shard"),
        col(orderCol).cast("long").as("ord"),
        tokens.cast("long").as("ntok"),
        col(textCol).cast("string").as("txt"))
      .na.drop(Seq("g", "shard", "ord", "ntok", "txt"))
    val packed = base
      .repartition(col("g"), col("shard"))
      .sortWithinPartitions(col("g"), col("shard"), col("ord"))
      .as[(String, Long, Long, Long, String)]
      .mapPartitions { it =>
        var cur: (String, Long) = null
        var bin = 0L; var acc = 0L; var nDocs = 0L
        val sb = new java.lang.StringBuilder()
        def closed(): (String, Long, Long, Long, Long, String) =
          (cur._1, cur._2, bin, nDocs, acc, sb.toString)
        val main = it.flatMap { case (g, sh, ord @ _, ntok, txt) =>
          val emit: Option[(String, Long, Long, Long, Long, String)] =
            if (cur == null || cur._1 != g || cur._2 != sh) {
              val e = if (cur == null) None else Some(closed())
              cur = (g, sh); bin = 0L; acc = 0L; nDocs = 0L; sb.setLength(0)
              e
            } else if (acc + ntok > budget) {
              val e = Some(closed())
              bin += 1; acc = 0L; nDocs = 0L; sb.setLength(0)
              e
            } else None
          if (nDocs > 0) sb.append(sep)
          sb.append(txt); acc += ntok; nDocs += 1
          emit
        }
        // `++`'s operand is by-name: the final flush reads the walk state
        // only after `main` is exhausted
        main ++ (if (cur != null) Iterator.single(closed()) else Iterator.empty)
      }
    packed.toDF(groupCol, "shard", "bin", "n_docs", "tok_total", "text")
  }

  /** Per-bin summary of a [[packGreedy]] assignment: docs and token total
    * per bin, plus the budget-fill ratio — the packing-efficiency numbers
    * a pipeline reports. One map-side-combined aggregate. */
  def binStats(packed: DataFrame, groupCol: String, budget: Long): DataFrame =
    packed.groupBy(col(groupCol), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_total"))
      .withColumn("fill", col("tok_total").cast("double") / lit(budget.toDouble))
}
