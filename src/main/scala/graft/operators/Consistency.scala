package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-ARTIFACT consistency — the census and the loud gate for the
  * pipeline shape where ONE ingest batch feeds TWO artifacts of record:
  * the dedup signature index (manifest chain under `_manifest/`) and the
  * ANN codes index (manifest chain under `manifest/`). Each chain commits
  * its own generation per batch, so a crash BETWEEN the two commits leaves
  * the artifacts silently divergent — the batch's documents dedup against
  * the corpus but are unfindable by similarity search, or vice versa — and
  * no single-chain audit can see it ([[Dedup.dedupChainDiff]],
  * [[IvfIndex.adcChainDiff]], [[Dedup.dedupServeDiff]] each audit ONE
  * chain, which stays internally consistent on both sides of the crash).
  * [[crossArtifactCoverage]] makes the divergence a first-class
  * observable; [[requireCoverage]] makes it a loud stop; the standing
  * composition lives in
  * [[graft.streaming.EventStream.dualIngestOneShotManifest]], which
  * verifies its own batches' coverage after every run.
  *
  * WINDOWED BY DESIGN: coverage is read from the batch ids the head
  * generations' file refs still carry (the `batch<id>-…` landing names,
  * [[IvfIndex.batchIdOfLanding]]). A manifest COMPACTION folds landings
  * at or below its watermark into `m<gen>bin-…` / bin files, making their
  * batch ids unobservable from refs — so the census applies to the window
  * ABOVE both artifacts' compaction watermarks (`sinceBatchId`), which is
  * exactly the window replay-based remediation targets: a batch the
  * checkpoint has committed past and compaction has folded is durable by
  * the chains' own spec'd invariants, not this census's subject. Run the
  * census on the maintenance cadence BEFORE advancing either compaction
  * watermark past the batches being audited.
  *
  * Scale shape: pure metadata — two head-ref reads (one row per live
  * file, the chains' own design point), set algebra on the driver, a
  * batches-scale result. The same cost class as the chain diffs it runs
  * next to; corpus size never enters.
  */
object Consistency {

  /** Per-batch coverage at both chain heads: one row per batch id either
    * head still references at or above `sinceBatchId`, with
    * `status ∈ both | dedup_only | ann_only`. Empty means the window is
    * covered identically (including the trivially-consistent case where
    * neither chain carries a windowed batch). Any `*_only` row is a
    * divergence: a dual ingest crashed between its two commits, or an
    * operator landed a batch into one artifact only.
    */
  def crossArtifactCoverage(
      spark: SparkSession,
      dedupIndexPath: String,
      annIndexDir: String,
      sinceBatchId: Long = 0L,
  ): DataFrame = {
    import spark.implicits._
    val dedupB = dedupCoveredBatches(spark, dedupIndexPath, sinceBatchId)
    val annB = annCoveredBatches(spark, annIndexDir, sinceBatchId)
    (dedupB ++ annB).toSeq.sorted
      .map { b =>
        val status =
          if (dedupB(b) && annB(b)) "both" else if (dedupB(b)) "dedup_only" else "ann_only"
        (b, dedupB(b), annB(b), status)
      }
      .toDF("batch_id", "in_dedup", "in_ann", "status")
  }

  /** The batch ids the dedup chain HEAD still references in the window. */
  private[graft] def dedupCoveredBatches(
      spark: SparkSession,
      dedupIndexPath: String,
      sinceBatchId: Long,
  ): Set[Long] = {
    val fs = new org.apache.hadoop.fs.Path(dedupIndexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = Dedup.listDedupGens(fs, dedupIndexPath)
    require(
      gens.nonEmpty,
      s"crossArtifactCoverage: no dedup manifest at $dedupIndexPath - bootstrap with writeDedupManifest")
    Dedup
      .readDedupManifestRefs(spark, dedupIndexPath, gens.max)
      .collect { case ("sig", name, _) => name }
      .flatMap(IvfIndex.batchIdOfLanding)
      .filter(_ >= sinceBatchId)
      .toSet
  }

  /** The batch ids the ANN chain HEAD still references in the window. */
  private[graft] def annCoveredBatches(
      spark: SparkSession,
      annIndexDir: String,
      sinceBatchId: Long,
  ): Set[Long] = {
    val fs = new org.apache.hadoop.fs.Path(annIndexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = IvfIndex.listAdcGens(fs, annIndexDir)
    require(
      gens.nonEmpty,
      s"crossArtifactCoverage: no ANN manifest at $annIndexDir - bootstrap with writeAdcManifest")
    IvfIndex
      .readAdcManifestRefs(spark, annIndexDir, gens.max)
      .collect { case IvfIndex.AdcRef("codes", _, name, _) => name }
      .flatMap(IvfIndex.batchIdOfLanding)
      .filter(_ >= sinceBatchId)
      .toSet
  }

  /** The loud gate: every batch in `batchIds` must be covered by BOTH
    * heads. The refusal names the missing side(s) and the remediation,
    * which the batch-keyed landing protocol already makes idempotent:
    * re-land the batch into the missing artifact under the SAME batch id
    * ([[Dedup.appendDedupIndex]] / [[IvfIndex.appendToAdcIndex]]) and
    * re-commit ([[Dedup.commitDedupBatchToManifest]] /
    * [[IvfIndex.commitAdcBatchToManifest]]) — a replay of an
    * already-covered side sweeps its own prior landing and heals its
    * refs, so remediation is safe to run on both sides blindly.
    */
  def requireCoverage(
      spark: SparkSession,
      dedupIndexPath: String,
      annIndexDir: String,
      batchIds: Seq[Long],
  ): Unit = {
    if (batchIds.isEmpty) return
    val since = batchIds.min
    val dedupB = dedupCoveredBatches(spark, dedupIndexPath, since)
    val annB = annCoveredBatches(spark, annIndexDir, since)
    val missingDedup = batchIds.filterNot(dedupB).sorted
    val missingAnn = batchIds.filterNot(annB).sorted
    require(
      missingDedup.isEmpty && missingAnn.isEmpty,
      s"cross-artifact divergence: batch(es) ${missingDedup.mkString(",")} missing from the dedup chain " +
        s"head ($dedupIndexPath) and ${missingAnn.mkString(",")} missing from the ANN chain head " +
        s"($annIndexDir) - a dual ingest crashed between its two commits, or a batch was landed into " +
        "one artifact only. Remediation: re-land the batch into the missing artifact under the SAME " +
        "batch id and re-commit its generation; the batch-keyed landing protocol makes the re-land " +
        "idempotent (an already-covered side replays safely).",
    )
  }
}
