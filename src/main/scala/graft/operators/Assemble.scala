package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus assembly — the production shape of the LLM-pipeline
  * operators composed in ONE plan: quality gate → incremental dedup against
  * the existing corpus → decontamination against an eval/benchmark set →
  * deterministic train/val/test split. Each stage is the engine's own
  * operator ([[Quality.filterFunnel]]'s rule semantics, [[Dedup.dedupIncrement]],
  * [[Decontaminate.overlaps]], the content-hash split rule), so the
  * composition can't drift from the individually-oracled pieces.
  */
object Assemble {

  /** Assemble an accepted-increment table: from `incoming`, keep docs that
    * pass every quality `rule` (the same cumulative-AND semantics
    * [[Quality.filterFunnel]] accounts for — run the funnel on the same rule
    * list for the per-rule drop report), survive [[Dedup.dedupIncrement]]
    * against `existing`, and share no word `decontamN`-gram with `evalSet`;
    * each surviving doc is assigned its deterministic content-hash split
    * (`trainPct`/`valPct`/rest, the q70 rule — reproducible on any engine,
    * no RNG state). Returns `(idCol, split)`.
    *
    * Scale design: the gated increment is materialized ONCE and feeds the
    * dedup signature build, the decontamination gram explode, and the final
    * split projection (three consumers — no DataFrame CSE); the
    * dedup-survivor increment is materialized once for the same reason
    * (decontamination consumes its corpus side twice). `existing` is
    * consumed exactly once (inside the dedup union's own barrier), and
    * `evalSet` once (its distinct gram hashes broadcast). Nothing in the
    * composition re-scans a side an operator already materialized — the
    * plan-level proof is in PlanSpec.
    */
  def assembleCorpus(
      existing: DataFrame,
      incoming: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      rules: Seq[(String, Column)],
      dedupThreshold: Double = 0.8,
      decontamN: Int = 3,
      trainPct: Int = 80,
      valPct: Int = 10,
      checkDisjointIds: Boolean = true,
  ): DataFrame = {
    require(rules.nonEmpty, "assembleCorpus: need at least one quality rule")
    require(
      trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"assembleCorpus: train/val percentages must fit in 100: $trainPct/$valPct",
    )
    val gate = rules.map(_._2).reduce(_ && _)
    val gated = Lineage.truncate(
      incoming.select(col(idCol), col(textCol)).filter(gate)
    )
    val keptIds = Dedup.dedupIncrement(
      existing.select(col(idCol), col(textCol)),
      gated,
      idCol,
      textCol,
      threshold = dedupThreshold,
      checkDisjointIds = checkDisjointIds,
    )
    val kept = Lineage.truncate(gated.join(keptIds, Seq(idCol), "left_semi"))
    val clean = Decontaminate
      .overlaps(kept, evalSet, idCol, textCol, decontamN)
      .filter(col("is_contaminated") === 0)
      .select(col(idCol))
    val bucket = Hashing.hash64(col(textCol)) % 100
    kept
      .join(clean, Seq(idCol), "left_semi")
      .select(
        col(idCol),
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test")
          .as("split"),
      )
  }

  /** Training-sequence materialization — the stage AFTER [[assembleCorpus]]:
    * split-tag each document (the q70 content-hash rule), cut it into
    * stride chunks ([[Quality.chunkDocuments]] with zero overlap), pack
    * chunks into `capacityTokens`-budget sequences greedily per
    * (split, shard) in (doc, chunk) order (the [[Quality.packSequences]]
    * rule at chunk granularity — packs never span splits or shards), and
    * return the PACK MANIFEST: per (split, shard, pack_id) the chunk
    * count, token total, distinct-doc count, and first doc — what a
    * training loader consumes to schedule shards.
    *
    * Scale design: the (id, text) projection is materialized ONCE and
    * feeds both the chunker and the split projection (no second corpus
    * scan); the chunk⋈split join keys on the doc id; the packing window
    * and the manifest groupBy share one (split, shard)-keyed exchange
    * (the groupBy key is a superset). `shards` is the packing-parallelism
    * knob exactly as in [[Quality.packSequences]].
    */
  def materializeSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 32,
      capacityTokens: Int = 64,
      shards: Int = 8,
      trainPct: Int = 80,
      valPct: Int = 10,
  ): DataFrame = {
    require(chunkTokens >= 1 && capacityTokens >= 1 && shards >= 1, "materializeSequences: sizes must be positive")
    val base = Lineage.truncate(docs.select(col(idCol), col(textCol)))
    val bucket = Hashing.hash64(col(textCol)) % 100
    val splitTab = base.select(
      col(idCol),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test")
        .as("split"),
    )
    val chunks = Quality
      .chunkDocuments(base, idCol, textCol, chunkTokens, overlap = 0)
      .select(col(idCol), col("chunk_id"), col("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split"), col("shard"))
      .orderBy(col(idCol), col("chunk_id"))
    chunks
      .join(splitTab, idCol)
      .withColumn("shard", col(idCol) % shards)
      .withColumn(
        "cum_before",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)),
      )
      .withColumn("pack_id", floor(col("cum_before") / capacityTokens.toDouble).cast("long"))
      .groupBy(col("split"), col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col(idCol)).as("n_docs"),
        min(col(idCol)).as("first_doc"),
      )
  }

  /** Capstone 3 — retrieval-index build: quality gate → overlapping chunks
    * ([[Quality.chunkDocuments]]) → sharded posting lists over the chunks
    * ([[Retrieval.postingListsSharded]], broadcast-df, Zipf-head bounded) →
    * the INDEX CARD a serving layer validates before swap-in: doc/chunk/
    * token/term/posting counts, how many terms needed sharding, and the
    * deepest posting list. Every stage is the engine's own oracled
    * operator, materialized ONCE behind a [[Lineage.truncate]] barrier —
    * the gate output feeds the chunker, the chunk table feeds both posting
    * passes and the card, nothing re-scans the corpus.
    *
    * Chunk ids pack as `doc_id · 2^20 + chunk_id` (a doc may hold up to
    * 2^20 chunks before colliding — ~32 M tokens at 32-token stride).
    * Output: (stat, value) long pairs, one row per card stat.
    */
  def buildSearchIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gate: Column,
      chunkTokens: Int,
      overlap: Int,
      minDf: Int,
      maxPostings: Long,
  ): DataFrame = {
    val gated = Lineage.truncate(docs.filter(gate).select(col(idCol), col(textCol)))
    val chunks = Lineage.truncate(
      Quality
        .chunkDocuments(gated, idCol, textCol, chunkTokens, overlap)
        .withColumn("ckey", col(idCol) * (1L << 20) + col("chunk_id"))
    )
    val postings = Lineage.truncate(
      Retrieval.postingListsSharded(chunks, "ckey", "chunk", minDf, maxPostings, broadcastDf = true)
    )
    val docStats = docs
      .groupBy()
      .agg(count(lit(1)).as("v"))
      .select(lit("docs_in").as("stat"), col("v").cast("long").as("value"))
    val gateStats = gated
      .groupBy()
      .agg(count(lit(1)).as("v"))
      .select(lit("docs_gated").as("stat"), col("v").cast("long").as("value"))
    val chunkStats = chunks
      .groupBy()
      .agg(count(lit(1)).as("c"), sum(col("n_tokens")).as("t"))
      .selectExpr("stack(2, 'chunks', cast(c as long), 'chunk_tokens', cast(t as long)) as (stat, value)")
    val postStats = postings
      .groupBy()
      .agg(
        countDistinct(col("token")).as("terms"),
        sum(col("shard_df")).as("np"),
        countDistinct(when(col("shard") > 0, col("token"))).as("sharded"),
        max(col("df")).as("maxdf"),
      )
      .selectExpr(
        "stack(4, 'terms', cast(terms as long), 'postings', cast(np as long), " +
          "'sharded_terms', cast(sharded as long), 'max_df', cast(maxdf as long)) as (stat, value)"
      )
    docStats.unionAll(gateStats).unionAll(chunkStats).unionAll(postStats)
  }

  /** Snapshot diff between two corpus versions — the dataset-versioning
    * primitive ("what changed between crawl N and crawl N+1"): per doc id,
    * `added` (new only) / `removed` (old only) / `changed` (both, content
    * hash differs) / `unchanged`. Content compared by the 60-bit
    * [[graft.functions.Hashing.hash64]], so the join carries two longs per
    * id, never document text.
    *
    * Returns the per-status rollup (n_docs, min/max id — the audit range).
    * Scale: one id-keyed full-outer join of (id, hash) projections + a
    * 4-row aggregate; both sides partial-project at the scan.
    */
  def corpusDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String,
  ): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"), Hashing.hash64(col(textCol)).as("__ho"))
    val n = newDf.select(col(idCol).as("id"), Hashing.hash64(col(textCol)).as("__hn"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn(
        "status",
        when(col("__ho").isNull, "added")
          .when(col("__hn").isNull, "removed")
          .when(col("__ho") === col("__hn"), "unchanged")
          .otherwise("changed"),
      )
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
      )
  }

  /** ANN-index build capstone — the [[buildSearchIndex]] shape for the
    * vector side: coarse IVF quantizer ([[IvfIndex.train]] seed codebook) →
    * full-corpus cell assignment ([[IvfIndex.assign]], a zero-shuffle
    * codebook-literal argmax) → per-subspace PQ fine codes
    * ([[IvfIndex.pqCodes]]) → the index CARD a serving layer validates
    * before swapping the index in: corpus size, non-empty cell count,
    * occupancy skew (max cell), PQ code-row count and distinct-code usage —
    * the numbers that catch a collapsed quantizer (all mass in one cell,
    * dead PQ codes) before it serves garbage.
    *
    * Scale: assignments and codes are each materialized ONCE
    * ([[Lineage.truncate]]) and feed only tiny scalar aggregates; the
    * corpus is scanned by the assign pass and the `m` PQ slice passes, all
    * map-only projections. The card itself never rescans the corpus.
    */
  def buildAnnIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      m: Int,
      subDim: Int,
      pqNlist: Int,
      pqIters: Int,
  ): DataFrame = {
    val centroids = IvfIndex.train(corpus, idCol, vecCol, nlist, iters = 0)
    val assigned = Lineage.truncate(
      IvfIndex.assign(corpus, centroids, idCol, vecCol).select(col(idCol), col("centroid_id"))
    )
    val codes = Lineage.truncate(IvfIndex.pqCodes(corpus, idCol, vecCol, m, subDim, pqNlist, pqIters))
    val cells = assigned.groupBy(col("centroid_id")).agg(count(lit(1)).as("__n"))
    val corpusStats = assigned
      .groupBy()
      .agg(count(lit(1)).as("v"))
      .select(lit("vectors").as("stat"), col("v").cast("long").as("value"))
    val cellStats = cells
      .groupBy()
      .agg(count(lit(1)).as("nc"), max(col("__n")).as("mx"))
      .selectExpr("stack(2, 'cells_nonempty', cast(nc as long), 'max_cell_rows', cast(mx as long)) as (stat, value)")
    val codeStats = codes
      .groupBy()
      .agg(
        count(lit(1)).as("cr"),
        countDistinct(col("subspace"), col("code")).as("dc"),
      )
      .selectExpr(
        "stack(2, 'pq_code_rows', cast(cr as long), 'pq_codes_used', cast(dc as long)) as (stat, value)"
      )
    corpusStats.unionAll(cellStats).unionAll(codeStats)
  }
}
