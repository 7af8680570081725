package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: times representative operators at 1×/2×/4×/8× the input
  * scale factor and prints one JSON line per (operator, factor) — the
  * measured counterpart to ARCHITECTURE.md's per-operator scale rationale.
  * Replication is workload-preserving, not degenerate:
  *
  *  - events tile with OFFSET user/event ids → k× independent users, so
  *    sessionization/funnel state and shuffle grow linearly (a naive copy
  *    would multiply per-user event counts instead — a different workload);
  *  - documents tile with a per-copy CHARACTER ROTATION (`translate` over
  *    the lowercase alphabet) → copies are mutually dissimilar while each
  *    copy preserves the base corpus's internal near-dup structure, so the
  *    TRUE pair count grows linearly and an output-sensitive LSH must
  *    scale with it (an appended-token perturbation was measured to leave
  *    copies ~identical: candidates grew quadratically because the true
  *    answer did);
  *  - embeddings tile with offset ids → the IVF assign pass (map-only) must
  *    scale embarrassingly.
  *
  * The pair/CC family additionally probes 16×/32× (override with
  * SPARK_GRAFT_SCALE_CC_FACTORS): the LSH pair build must stay linear in
  * the true pair count, and the two connected-components variants
  * (min-label propagation vs alternating star contraction) are compared on
  * wall time AND rounds-to-converge over the same physical pair set, with
  * a component-census equality tripwire.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ScaleBench
  */
object ScaleBench {

  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r  = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val factors = Seq(1, 2, 4, 8)
    // The pair/CC family probes deeper (16×/32×): component structure —
    // rounds-to-converge, not per-round cost — is its scale risk, and that
    // only shows at factors where the pair graph is properly large.
    val ccFactors = sys.env
      .get("SPARK_GRAFT_SCALE_CC_FACTORS")
      .map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16, 32))
    // Family subset for targeted re-runs (full run is ~45 min):
    // comma-separated from {ops, media, cc, stream, rocksdb, ann, dedupidx};
    // default all.
    val families = sys.env
      .get("SPARK_GRAFT_SCALE_FAMILIES")
      .map(_.split(',').map(_.trim).toSet)
      .getOrElse(Set("ops", "media", "cc", "stream", "rocksdb", "ann", "dedupidx"))
    val tmp     = java.nio.file.Files.createTempDirectory("graft_scale").toString

    // OPT-IN per-stage profile (SPARK_GRAFT_SCALE_PROFILE=1): one JSON
    // line per completed stage — stage id, task count, summed run/cpu
    // time, shuffle bytes, spill. The attribution tool for tier-shaped
    // anomalies: the r19 16× pair-build inversion could not be explained
    // from black-box op timings alone; this makes the stage where the
    // time goes a printed fact. Off by default — the listener's println
    // interleaves with the op rows, so clean timing takes keep it off.
    if (sys.env.contains("SPARK_GRAFT_SCALE_PROFILE"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            done: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = done.stageInfo
          val m = si.taskMetrics
          val name = si.name.takeWhile(_ != '\n').replace("\"", "'")
          println(
            s"""{"stage":${si.stageId},"name":"$name","tasks":${si.numTasks},""" +
              s""""run_ms":${m.executorRunTime},"cpu_ms":${m.executorCpuTime / 1000000L},""" +
              s""""input_mb":${m.inputMetrics.bytesRead >> 20},""" +
              s""""shuffle_read_mb":${m.shuffleReadMetrics.totalBytesRead >> 20},""" +
              s""""shuffle_write_mb":${m.shuffleWriteMetrics.bytesWritten >> 20},""" +
              s""""spill_mb":${(m.memoryBytesSpilled + m.diskBytesSpilled) >> 20}}"""
          )
        }
      })

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(k: Int): String = alpha.drop(k % 26) + alpha.take(k % 26)
    def tile(base: DataFrame, factor: Int, shift: Seq[(String, Long)], rotCol: Option[String]): DataFrame =
      (0 until factor)
        .map { k =>
          val shifted = shift.foldLeft(base) { case (df, (c, unit)) =>
            df.withColumn(c, col(c) + lit(k * unit))
          }
          rotCol.fold(shifted)(tc => shifted.withColumn(tc, translate(col(tc), alpha, rot(k))))
        }
        .reduce(_ unionAll _)

    // Materialize each factor's inputs as parquet so the timed operator
    // reads real files (scan + shuffle), not an in-memory union plan.
    for (f <- factors) {
      tile(Tables.events(spark, sfDir), f, Seq("event_id" -> 1000000000L, "user_id" -> 1000000L), None)
        .write.mode("overwrite").parquet(s"$tmp/events_$f")
      tile(Tables.t(spark, sfDir, "embeddings"), f, Seq("vec_id" -> 1000000L), None)
        .write.mode("overwrite").parquet(s"$tmp/embeddings_$f")
    }
    for (f <- (factors ++ ccFactors).distinct.sorted)
      tile(Tables.t(spark, sfDir, "documents"), f, Seq("doc_id" -> 1000000L), Some("text"))
        .write.mode("overwrite").parquet(s"$tmp/documents_$f")

    def report(op: String, factor: Int, sec: Double, rows: Long): Unit =
      println(s"""{"op":"$op","factor":$factor,"sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}""")

    // Between-ops state release — the single-JVM envelope fix (the r18
    // suite OOMed a 48 g heap at the cc family's 32× tier and needed a
    // 3-process split; the cause was CUMULATIVE block-manager retention
    // across ops, not any one op's working set): every iterative operator
    // truncates lineage via localCheckpoint, and those blocks stay in the
    // block manager until their RDD is GC'd — which a big heap may never
    // bother to do mid-run. Every timed block here ENDS with a terminal
    // materialization (parquet write or count) and the next op re-reads
    // its inputs from parquet, so no released block is ever recomputed;
    // this only returns memory a finished op was hoarding. ONLY legal
    // between terminal ops: unpersisting a localCheckpoint a still-live
    // plan references loses data outright (lineage is severed by design).
    // BLOCKING by design: an async unpersist leaves the freed blocks as
    // a removal backlog that is still LIVE heap while the next op's
    // allocation spike arrives — measured this round as a GCLocker
    // allocation-failure crash at the 32× cc tier once the family gained
    // one more full pair-build era; the synchronous wait costs seconds
    // and makes the envelope deterministic.
    def releaseRetainedState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    for (f <- factors if families("ops")) {
      val ev   = spark.read.parquet(s"$tmp/events_$f")
      val docs = spark.read.parquet(s"$tmp/documents_$f")
      val emb  = spark.read.parquet(s"$tmp/embeddings_$f")

      val (t1, r1) = time(
        operators.EventAnalytics
          .eventsOpsCard(ev, "user_id", "ts", "event_type", "event_id", 30,
            Seq("view", "click", "purchase"), Seq("view", "click"), "purchase", 7L * 86400L * 1000000L)
          .count()
      )
      report("events_ops_card", f, t1, r1)

      val (t2, r2) = time(
        operators.EventAnalytics.sessionFunnel(ev, "user_id", "ts", "event_type", "event_id", 30,
          Seq("view", "click", "purchase")).count()
      )
      report("session_funnel", f, t2, r2)

      val (t3, r3) = time(
        operators.Dedup.exactDedup(docs, col("text"), col("doc_id")).count()
      )
      report("exact_dedup", f, t3, r3)

      val (t4, r4) = time(
        operators.Dedup.minhashCandidates(docs, "doc_id", "text", 8, 4).count()
      )
      report("lsh_candidates", f, t4, r4)

      val (t5, r5) = time {
        val cents = operators.IvfIndex.train(emb, "vec_id", "embedding", nlist = 16, iters = 0)
        operators.IvfIndex.assign(emb, cents, "vec_id", "embedding").count()
      }
      report("ivf_assign", f, t5, r5)

      // as-of enrich (ONE sort-shuffle on (key, time)): must scale with the
      // event volume, never with pairs of events
      val (t6, r6) = time {
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        operators.AsOfJoin
          .asOf(clicks, purchases, Seq("user_id"), "ts", "ts", Seq("purchase_value"))
          .count()
      }
      report("asof_join", f, t6, r6)

      // BM25 top-k (integer-exact posting path): corpus stats + postings
      // for 3 query terms — linear in docs, bounded by the top-k heap
      val (t7, r7) = time(
        operators.Retrieval
          .bm25TopK(docs, "doc_id", "text", Seq("spark", "join", "shuffle"), k = 20)
          .count()
      )
      report("bm25_topk", f, t7, r7)
      releaseRetainedState()
    }

    // --- content-level media family: REAL encode→decode→feature per
    //     payload (ImageIO rasterize + aHash; javax.sound PCM read) —
    //     embarrassingly parallel mapPartitions, zero shuffle before the
    //     census, so wall time must scale ~linearly in documents and the
    //     distinct-hash census must scale with CONTENT diversity, not rows.
    for (f <- factors if families("media")) {
      val docs = spark.read.parquet(s"$tmp/documents_$f")
      val (t8, r8) = time {
        val media = operators.Multimodal.synthesizePng(docs, "doc_id")
        operators.Multimodal
          .imageAHash(media)
          .toDF()
          .groupBy("ahash_hi", "ahash_lo")
          .count()
          .count()
      }
      report("image_ahash_census", f, t8, r8)
      val (t9, r9) = time {
        val media = operators.Multimodal.synthesizeWav(docs, "doc_id")
        operators.Multimodal.audioFeatures(media).count()
      }
      report("audio_features", f, t9, r9)
      releaseRetainedState()
    }

    // --- ANN serving family (q248/q258-shaped): per embeddings tiling,
    //     (1) single-pass PQ training (pqTrainAll — iters+1 corpus scans
    //     regardless of m; the cost must scale linearly in corpus rows),
    //     (2) full index build + persist (train + encode + partitioned
    //     write — the once-per-corpus cost), and (3) serving a FIXED query
    //     sample against the growing persisted index (dynamic partition
    //     pruning reads the probed cells only; expected slope ≈
    //     nprobe/nlist of a full scan, not 1.0).
    for (f <- factors if families("ann")) {
      val emb = spark.read.parquet(s"$tmp/embeddings_$f")
      val nEmb = emb.count()
      val (tTrain, _) = time {
        operators.IvfIndex.pqTrainAll(emb, "vec_id", "embedding", m = 4, subDim = 16, nlist = 8, iters = 2)
      }
      report("ann_pq_train_single_pass", f, tTrain, nEmb)
      // The PRODUCTION quantizer (q263/q270 operating point): sampled
      // Lloyd, iters = 2 on a 50% hash sample — the index the lifecycle
      // rows below build/serve/append/compact/repair is the one a user
      // deploys, not the degenerate first-16 seed. Training is its own
      // row: (iters + 1) sampled scans whose cost must stay linear in
      // corpus rows.
      val (tLloyd, centroids) = time {
        val c = operators.Lineage.truncate(
          operators.IvfIndex.train(emb, "vec_id", "embedding", nlist = 16, iters = 2, sampleFraction = 0.5))
        c.count()
        c
      }
      report("ann_coarse_train_lloyd", f, tLloyd, nEmb)
      val idxDir = s"$tmp/annidx_$f"
      val (tBuild, _) = time {
        operators.IvfIndex.saveAdcIndex(emb, "vec_id", "embedding", centroids,
          m = 4, subDim = 16, pqNlist = 8, pqIters = 2, dir = idxDir)
      }
      report("ann_index_build_persist", f, tBuild, nEmb)
      val queries = spark.read
        .parquet(s"$tmp/embeddings_1")
        .filter(col("vec_id") % 100 === 0)
      val (tServe, r3) = time(
        operators.IvfIndex
          .adcTopKFromIndex(spark, idxDir, emb, queries, "vec_id", "embedding",
            m = 4, nprobe = 2, candK = 8, k = 3)
          .count()
      )
      report("ann_index_serve_pruned", f, tServe, r3)
      // (4) the increment lifecycle: two fixed-size frozen appends splinter
      // the posting-list directories (>= 1 file per touched cell per
      // append), then compaction rewrites the victim cells to one file per
      // bin. files_before/files_after IS the measurement — the serving
      // read pays one parquet footer per file per probed cell.
      val inc = spark.read
        .parquet(s"$tmp/embeddings_1")
        .withColumn("vec_id", col("vec_id") + lit(10000000L))
      // The increment row count is observability for the report lines, not
      // part of any lifecycle op — counted once OUTSIDE every timed block
      // so the append/commit rows measure only the op they claim to.
      val incRows = inc.count()
      val (tApp, _) = time {
        operators.IvfIndex.appendToAdcIndex(spark, idxDir, inc, "vec_id", "embedding", m = 4)
        operators.IvfIndex.appendToAdcIndex(
          spark, idxDir, inc.withColumn("vec_id", col("vec_id") + lit(10000000L)), "vec_id", "embedding", m = 4)
      }
      report("ann_index_append_x2", f, tApp, incRows * 2)
      val (tComp, filesBA) = time {
        val c = operators.IvfIndex
          .compactAdcIndexCodes(spark, idxDir, targetBytes = 128L << 20)
          .agg(sum(col("files_before")), sum(col("files_after")))
          .head()
        (c.getLong(0), c.getLong(1))
      }
      println(
        s"""{"op":"ann_codes_compact","factor":$f,"sec":${math.round(tComp * 1000) / 1000.0},""" +
          s""""files_before":${filesBA._1},"files_after":${filesBA._2}}"""
      )
      // (4b) the MANIFEST lifecycle (q275/q276): the same trained index
      // under the object-store commit protocol — per-batch generation
      // commit (bounded to touched cells), manifest-census compaction
      // (one generation object, nothing deleted), pinned-snapshot serve.
      // The slopes to watch: commit cost tracks the BATCH (not the
      // corpus), compaction tracks the victim refs, serve matches the
      // rename-mode pruned serve.
      val mDir = s"$tmp/annidxm_$f"
      operators.IvfIndex.saveAdcIndex(emb, "vec_id", "embedding", centroids,
        m = 4, subDim = 16, pqNlist = 8, pqIters = 2, dir = mDir)
      operators.IvfIndex.writeAdcManifest(spark, mDir)
      val (tCommit, _) = time {
        val cells = operators.IvfIndex.appendToAdcIndex(spark, mDir, inc, "vec_id", "embedding",
          m = 4, batchId = Some(0L))
        operators.IvfIndex.commitAdcBatchToManifest(spark, mDir, 0L, Some(cells))
      }
      report("ann_manifest_batch_commit", f, tCommit, incRows)
      val (tMComp, mFilesBA) = time {
        val c = operators.IvfIndex
          .compactAdcIndexCodesManifest(spark, mDir, targetBytes = 128L << 20, minRetainedBatchId = Some(1L))
          .agg(sum(col("files_before")), sum(col("files_after")))
          .head()
        (c.getLong(0), c.getLong(1))
      }
      println(
        s"""{"op":"ann_manifest_compact","factor":$f,"sec":${math.round(tMComp * 1000) / 1000.0},""" +
          s""""files_before":${mFilesBA._1},"files_after":${mFilesBA._2}}"""
      )
      val (tSnap, rSnap) = time(
        operators.IvfIndex
          .adcTopKFromSnapshot(spark, mDir, emb.unionAll(inc), queries, "vec_id", "embedding",
            m = 4, nprobe = 2, candK = 8, k = 3)
          .count()
      )
      report("ann_manifest_snapshot_serve", f, tSnap, rSnap)
      // (4c) the standing-maintenance ADMISSION (q289's idle tick): the
      // census read + the no-lever decision + the cleanup listing. The
      // claim the row pins: an idle tick is METADATA — flat in corpus
      // size, and it never grows the chain.
      val (tTick, tick) = time {
        operators.IvfIndex.maintainAdcIndexManifest(spark, mDir, emb.unionAll(inc),
          "vec_id", "embedding", m = 4, minRetainedBatchId = Some(1L), maxFilesPerCell = 100000)
      }
      require(!tick.compacted, s"ann_maintenance_idle_tick: below-bound tick must not compact at factor $f")
      println(
        s"""{"op":"ann_maintenance_idle_tick","factor":$f,"sec":${math.round(tTick * 1000) / 1000.0},""" +
          s""""max_cell_files":${tick.maxCellFilesBefore},"swept":${tick.sweptFiles}}"""
      )

      // (5) the drift-repair lifecycle (q267 -> q271): a SHIFTED increment
      // lands in a frozen RESIDUAL index, the OOD gate flags the stale
      // cells in one pass over base ∪ increment, and the repair re-centers
      // + re-encodes ONLY those cells. The increment scales WITH the
      // factor (unlike the append rows' fixed-size increments): a
      // fixed-size drift dilutes below the 150-milli gate as the base
      // grows — correct gate behavior, but it would null the measurement;
      // proportional drift keeps the gate firing so the row measures
      // repair cost tracking the flagged members at every factor.
      val resDir = s"$tmp/annidxres_$f"
      // The repair row keeps the DEGENERATE (iters = 0) quantizer on
      // purpose: the trained quantizer averages the tiled fixture well
      // enough that the +0.5 drift dilutes under the 150-milli gate at
      // >= 4x — correct gate behavior that would null the measurement
      // (flagged = 0 means nothing to time). What this row measures —
      // per-flagged-member rewrite cost tracking the flagged membership —
      // is independent of how the coarse quantizer was trained.
      val repairCents = operators.IvfIndex.train(emb, "vec_id", "embedding", nlist = 16, iters = 0)
      operators.IvfIndex.saveAdcIndex(emb, "vec_id", "embedding", repairCents,
        m = 4, subDim = 16, pqNlist = 8, pqIters = 2, dir = resDir, variant = "residual")
      val drifted = emb
        .withColumn("vec_id", col("vec_id") + lit(10000000L))
        .withColumn("embedding", transform(col("embedding"), x => x + lit(0.5f)))
      operators.IvfIndex.appendToAdcIndex(spark, resDir, drifted, "vec_id", "embedding", m = 4)
      val (tRepair, flaggedN) = time {
        val flagged = operators.IvfIndex
          .oodDriftGate(emb, drifted, "vec_id", "embedding", repairCents,
            thresholdQ = 200000L, gateMilli = 150L)
          .filter(col("reencode"))
          .select("centroid_id")
          .collect()
          .map(_.getInt(0))
          .toSeq
        if (flagged.nonEmpty)
          operators.IvfIndex.repairDriftedIndexCells(
            spark, resDir,
            emb.select(col("vec_id"), col("embedding"))
              .unionAll(drifted.select(col("vec_id"), col("embedding"))),
            "vec_id", "embedding", m = 4, flaggedCells = flagged,
          ).count()
        flagged.size.toLong
      }
      println(
        s"""{"op":"ann_drift_gate_repair","factor":$f,"sec":${math.round(tRepair * 1000) / 1000.0},""" +
          s""""flagged_cells":$flaggedN}"""
      )
      releaseRetainedState()
    }

    // --- dedup-index lifecycle family (q279–q282-shaped): the repo's
    //     OTHER durable artifact under the same replay/commit protocol the
    //     ann rows pin. Per documents tiling: (1) corpus signature build +
    //     persist (the once-per-corpus cost — must stay linear in docs);
    //     (2) two FIXED-SIZE batch-keyed appends (cost must track the
    //     batch, not the corpus — the index is one flat dir, so a landing
    //     is one scratch write + one dir listing); (3) the watermarked
    //     rename-mode compaction (batch 0 binned, batch 1 retained under
    //     its replay name — one linear rewrite of the eligible rows);
    //     (4) the manifest twin: batch commit (one generation object —
    //     cost tracks the batch), manifest compaction (census from refs,
    //     pure metadata), reference-set cleanup; (5) the steady-state
    //     SERVE: a fixed-size increment deduped against the growing
    //     snapshot (signature work is the increment's own; the banding
    //     join shuffles corpus+increment sig rows — 8-long fixed-width —
    //     so the slope is shuffle-bandwidth linear in corpus, the
    //     documented design point, NOT pairwise).
    for (f <- factors if families("dedupidx")) {
      val docs = spark.read.parquet(s"$tmp/documents_$f")
      val nDocs = docs.count()
      // Fixed-size increment: base docs, ids disjoint from every tiling
      // shift, text rotated PAST every copy in the index so the increment
      // is mostly novel (the realistic standing-pipeline batch).
      val incDocs = Tables
        .t(spark, sfDir, "documents")
        .withColumn("doc_id", col("doc_id") + lit(100000000L))
        .withColumn("text", translate(col("text"), alpha, rot(13)))
      val incRows = incDocs.count()
      val dIdxDir = s"$tmp/dedupidx_$f"
      val (tBuild, _) = time {
        operators.Dedup.saveDedupIndex(operators.Dedup.buildDedupIndex(docs, "doc_id", "text", 8), dIdxDir)
      }
      report("dedup_index_build_persist", f, tBuild, nDocs)
      val incIdx = operators.Dedup.buildDedupIndex(incDocs, "doc_id", "text", 8)
      val (tApp, _) = time {
        operators.Dedup.appendDedupIndex(incIdx, dIdxDir, batchId = Some(0L))
        operators.Dedup.appendDedupIndex(
          incIdx.withColumn("id", col("id") + lit(100000000L)), dIdxDir, batchId = Some(1L))
      }
      report("dedup_index_batch_append_x2", f, tApp, incRows * 2)
      def liveFiles(dir: String): Long = {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
      }
      val dFilesBefore = liveFiles(dIdxDir)
      val (tComp, _) = time {
        operators.Dedup.compactDedupIndex(spark, dIdxDir, k = 8, targetFiles = 8,
          minRetainedBatchId = Some(1L))
      }
      println(
        s"""{"op":"dedup_index_compact","factor":$f,"sec":${math.round(tComp * 1000) / 1000.0},""" +
          s""""files_before":$dFilesBefore,"files_after":${liveFiles(dIdxDir)}}"""
      )
      // The manifest twin on its own dir: bootstrap census, one batch
      // commit, manifest compaction, reference-set cleanup.
      val dmDir = s"$tmp/dedupidxm_$f"
      operators.Dedup.saveDedupIndex(operators.Dedup.buildDedupIndex(docs, "doc_id", "text", 8), dmDir)
      operators.Dedup.writeDedupManifest(spark, dmDir)
      val (tCommit, _) = time {
        operators.Dedup.appendDedupIndex(incIdx, dmDir, batchId = Some(0L))
        operators.Dedup.commitDedupBatchToManifest(spark, dmDir, 0L)
      }
      report("dedup_manifest_batch_commit", f, tCommit, incRows)
      // The chain diff, gen 0 (corpus census) -> gen 1 (the fixed batch
      // commit), BEFORE the cleanup below retires gen 0. The claim the
      // row pins: the diff reads ONLY the files referenced by exactly
      // one side — the batch's — so its cost must stay FLAT as the
      // corpus grows.
      val (tDiff, rDiff) = time {
        operators.Dedup.dedupChainDiff(spark, dmDir, 0L, 1L).count()
      }
      report("dedup_chain_diff", f, tDiff, rDiff)
      val (tMComp, mFilesBA) = time {
        operators.Dedup.compactDedupIndexManifest(spark, dmDir, k = 8, targetFiles = 8,
          minRetainedBatchId = Some(1L))
      }
      // files_before == files_after marks a legal no-op commit (not
      // enough eligible files to bin) — the row must not read as a
      // measured rewrite when nothing ran.
      println(
        s"""{"op":"dedup_manifest_compact","factor":$f,"sec":${math.round(tMComp * 1000) / 1000.0},""" +
          s""""files_before":${mFilesBA._1},"files_after":${mFilesBA._2}}"""
      )
      val (tClean, swept) = time {
        operators.Dedup.cleanupDedupGenerations(spark, dmDir, keepGens = 1)
      }
      println(
        s"""{"op":"dedup_manifest_cleanup","factor":$f,"sec":${math.round(tClean * 1000) / 1000.0},""" +
          s""""deleted_files":$swept,"live_files":${liveFiles(dmDir)}}"""
      )
      // Serve-side batch: its own rotation (14) — mostly novel against
      // every index resident (copies rot 0..7, batch 0 rot 13), the
      // realistic standing-pipeline batch whose survivors ≈ its size.
      val serveDocs = Tables
        .t(spark, sfDir, "documents")
        .withColumn("doc_id", col("doc_id") + lit(200000000L))
        .withColumn("text", translate(col("text"), alpha, rot(14)))
      val (tServe, rServe) = time {
        operators.Dedup
          .dedupIncrementWithIndex(
            operators.Dedup.loadDedupIndexSnapshot(spark, dmDir, 8),
            serveDocs, "doc_id", "text", 8)
          .count()
      }
      report("dedup_index_snapshot_increment", f, tServe, rServe)
      // (6) the BUCKETED serve twin: publish once (one deterministic
      // rewrite of the snapshot — the row must stay linear in corpus),
      // then the same batch served exchange-free on the corpus side. The
      // slope to compare against (5): the plain serve re-shuffles corpus
      // sig rows per batch, the bucketed one only scans them.
      val (tPub, _) = time {
        operators.Dedup.saveDedupServeTables(
          operators.Dedup.loadDedupIndexSnapshot(spark, dmDir, 8), "graft_scale_serve", buckets = 32)
      }
      report("dedup_serve_publish", f, tPub, nDocs + incRows)
      val (tBServe, rBServe) = time {
        operators.Dedup
          .dedupIncrementBucketed(spark, "graft_scale_serve", serveDocs, "doc_id", "text", 8)
          .count()
      }
      report("dedup_serve_bucketed", f, tBServe, rBServe)
      // (7) the ATOMIC publish twin: versioned tables + stamps + the
      // head swap + vacuum. The claim the row pins against (6): the
      // pointer-swap protocol's overhead is METADATA (three ALTERs, one
      // tiny head object, a listing) — publish cost must track
      // dedup_serve_publish, same linear-in-corpus slope.
      val (tAPub, _) = time {
        operators.Dedup.publishDedupServeTables(spark, dmDir, "graft_scale_apub", buckets = 32)
      }
      report("dedup_serve_publish_atomic", f, tAPub, nDocs + incRows)
      // (8) the serve-layout audit: full-content compare of the three
      // published tables against their stamped snapshot — the same cost
      // class as the publish it audits (linear, no pairwise blowup).
      val (tSDiff, rSDiff) = time {
        operators.Dedup.dedupServeDiff(spark, dmDir, "graft_scale_apub").count()
      }
      println(
        s"""{"op":"dedup_serve_diff","factor":$f,"sec":${math.round(tSDiff * 1000) / 1000.0},""" +
          s""""diff_rows":$rSDiff}"""
      )
      require(rSDiff == 0L, s"dedup_serve_diff: a clean publish must diff empty, got $rSDiff rows at factor $f")
      // (9) the standing-maintenance ADMISSION (q290's idle tick): the
      // refs census + the no-lever decision + the cleanup listing —
      // metadata-flat in corpus size, never growing the chain.
      val (tDTick, dTick) = time {
        operators.Dedup.maintainDedupIndexManifest(spark, dmDir, maxFiles = 100000,
          minRetainedBatchId = Some(1000000L))
      }
      require(!dTick.compacted, s"dedup_maintenance_idle_tick: below-bound tick must not compact at factor $f")
      println(
        s"""{"op":"dedup_maintenance_idle_tick","factor":$f,"sec":${math.round(tDTick * 1000) / 1000.0},""" +
          s""""files":${dTick.filesBefore},"swept":${dTick.sweptFiles}}"""
      )
      // (10) the CROSS-ARTIFACT census (q291/q293's audit primitive): two
      // head-ref reads + driver set algebra — the claim this row measures
      // is FLAT in corpus size (the dedup chain above grows with the
      // factor; the ANN side is a fixed-size manifest chain sharing batch
      // 0's id). The dedup compaction above FOLDED batch 0, so the row
      // also pins the fold-aware path: coverage comes from the persisted
      // fold watermark, not name observability.
      val xaDir = s"$tmp/dedupidx_ann_$f"
      val xaEmb = spark.read.parquet(s"$tmp/embeddings_1")
      val xaCents = operators.IvfIndex.train(xaEmb, "vec_id", "embedding", nlist = 16, iters = 0)
      operators.IvfIndex.saveAdcIndex(xaEmb, "vec_id", "embedding", xaCents,
        m = 4, subDim = 16, pqNlist = 8, pqIters = 0, dir = xaDir)
      operators.IvfIndex.writeAdcManifest(spark, xaDir)
      val xaInc = xaEmb.withColumn("vec_id", col("vec_id") + lit(500000000L))
      val xaCells = operators.IvfIndex.appendToAdcIndex(
        spark, xaDir, xaInc, "vec_id", "embedding", m = 4, batchId = Some(0L))
      operators.IvfIndex.commitAdcBatchToManifest(spark, xaDir, 0L, Some(xaCells))
      val (tCensus, rCensus) = time {
        operators.Consistency.requireCoverage(spark, dmDir, xaDir, Seq(0L))
        operators.Consistency.crossArtifactCoverage(spark, dmDir, xaDir).count()
      }
      println(
        s"""{"op":"cross_artifact_census","factor":$f,"sec":${math.round(tCensus * 1000) / 1000.0},""" +
          s""""batches":$rCensus}"""
      )
      releaseRetainedState()
    }

    // --- pair/CC family (q218-shaped): pairs once, then BOTH CC variants
    //     on the same physical pair set. Reported per factor: pair build
    //     time, each variant's wall time AND rounds-to-converge, and the
    //     component census (must agree between variants — a cheap
    //     correctness tripwire riding the probe).
    def reportCc(op: String, factor: Int, sec: Double, rows: Long, rounds: Int): Unit =
      println(
        s"""{"op":"$op","factor":$factor,"sec":${math.round(sec * 1000) / 1000.0},"rows":$rows,"rounds":$rounds}"""
      )
    for (f <- ccFactors if families("cc")) {
      val docs = spark.read.parquet(s"$tmp/documents_$f")
      // BUILD measured separately from BUILD+WRITE (two runs of the same
      // plan): the r19 16× inversion sat in a row that confounded the
      // pair computation with its parquet write — `build_sec` is the
      // count-only run, `sec` stays the full materialization (the
      // cross-round comparable), and their gap bounds the write's share.
      val (tb, _) = time {
        operators.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 8, 4, 0.8).count()
      }
      releaseRetainedState()
      val (tp, _) = time {
        operators.Dedup
          .minhashNearDupPairs(docs, "doc_id", "text", 8, 4, 0.8)
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .write.mode("overwrite").parquet(s"$tmp/pairs_$f")
      }
      val pairs = spark.read.parquet(s"$tmp/pairs_$f")
      println(
        s"""{"op":"lsh_pairs_t08","factor":$f,"sec":${math.round(tp * 1000) / 1000.0},""" +
          s""""build_sec":${math.round(tb * 1000) / 1000.0},"rows":${pairs.count()}}"""
      )
      releaseRetainedState()
      // The EXECUTABLE pick rule, run once per round at the family's
      // smallest tier (the bounded calibration probe the scaladoc
      // promises): both policies measured on the same sample, labeling
      // equality verified inside, the winner-first threshold returned.
      // Compare its verdict against the 16×/32× rows below — if the
      // small-tier winner also wins large, the probe is a sufficient
      // re-tune; if not, that divergence is the round's finding.
      if (f == ccFactors.min) {
        val cal = operators.Dedup.ccCalibrate(pairs)
        println(
          s"""{"op":"cc_calibrate","factor":$f,"edges":${cal.sampleEdges},""" +
            s""""lp_sec":${math.round(cal.lpSeconds * 1000) / 1000.0},"lp_rounds":${cal.lpRounds},""" +
            s""""lp_escaped":${cal.lpEscaped},"star_sec":${math.round(cal.starSeconds * 1000) / 1000.0},""" +
            s""""star_rounds":${cal.starRounds},"winner":"${cal.winner}","star_threshold":${cal.starThreshold},""" +
            s""""margin":${math.round(cal.margin * 1000) / 1000.0},""" +
            s""""recommended_threshold":${cal.recommendedThreshold()}}"""
        )
        releaseRetainedState()
      }
      // Each variant's timed block MATERIALIZES its labeling (parquet write
      // — the same terminal-action cost shape as the old groupBy-count) so
      // the tripwire below can compare full labelings without re-running
      // either iteration.
      val (tl, lr) = time {
        val (df, r) = operators.Dedup.connectedComponentsCounted(pairs)
        df.write.mode("overwrite").parquet(s"$tmp/cc_lp_$f"); r
      }
      val lpLab = spark.read.parquet(s"$tmp/cc_lp_$f")
      reportCc("cc_labelprop", f, tl, lpLab.select(col("comp")).distinct().count(), lr)
      releaseRetainedState()
      val (ts, sr) = time {
        val (df, r) = operators.Dedup.connectedComponentsStarCounted(pairs)
        df.write.mode("overwrite").parquet(s"$tmp/cc_star_$f"); r
      }
      val spLab = spark.read.parquet(s"$tmp/cc_star_$f")
      reportCc("cc_star", f, ts, spLab.select(col("comp")).distinct().count(), sr)
      releaseRetainedState()
      // Tripwire on the LABELINGS, not the component count: equal counts
      // can hide membership disagreement. Both variants contract to
      // (id, comp = min id of component), so at fixpoint the (id, comp)
      // sets must be identical — any symmetric difference is a bug in one
      // of them (including a non-minimal star root, which a census or even
      // a (comp, size)-multiset compare would miss).
      val diff = lpLab.except(spLab).count() + spLab.except(lpLab).count()
      require(
        diff == 0,
        s"CC variants disagree at factor $f: $diff (id, comp) rows differ between label-prop and star",
      )
      // The dispatch path users actually hit: connectedComponentsAdaptive
      // (raw pairs in, the exact call-site shape) must choose the branch
      // its materialized edge count dictates AND reproduce the label-prop
      // labeling bit-for-bit. Probed at every factor with the production
      // 20M default so the report records which branch real corpora take —
      // at 16×/32× tiling (≥47M pairs) this exercises the star branch
      // through the dispatcher itself, not just via an explicit pin.
      val nPairs = pairs.count()
      val branch = if (nPairs >= 20000000L) "star" else "labelprop"
      val (ta, aLab) = time {
        val df = operators.Dedup.connectedComponentsAdaptive(pairs)
        df.write.mode("overwrite").parquet(s"$tmp/cc_adaptive_$f")
        spark.read.parquet(s"$tmp/cc_adaptive_$f")
      }
      val adiff = aLab.except(lpLab).count() + lpLab.except(aLab).count()
      require(
        adiff == 0,
        s"adaptive CC labeling diverged from label-prop at factor $f: $adiff rows differ (branch=$branch)",
      )
      // "escaped" = the label-prop branch blew its rounds budget and the
      // dispatch fell through to star (the structure-not-size bound the
      // cc family exists to watch) — expected false at every factor here;
      // a true is the report that a tiling's diameter outgrew the budget.
      println(
        s"""{"op":"cc_adaptive","factor":$f,"sec":${math.round(ta * 1000) / 1000.0},"edges":$nPairs,""" +
          s""""branch":"$branch","escaped":${operators.Dedup.lastAdaptiveEscaped}}"""
      )
      releaseRetainedState()
      // The OTHER dispatch policy, measured every round so the
      // machine-era-unstable crossover is re-tunable from DATA instead
      // of scaladoc archaeology: label-prop-first (starThreshold raised
      // past the edge count) under the same rounds budget. The budget
      // bounds label-prop's long-diameter downside (escape -> star), so
      // running it first is SAFE everywhere; this row says whether it
      // is FAST here — compare against cc_adaptive's default-dispatch
      // seconds at 16×/32×, where the default pays for star if
      // label-prop solo is winning in this era.
      val (tLpf, lpfLab) = time {
        val df = operators.Dedup.connectedComponentsAdaptive(pairs, starThreshold = Long.MaxValue)
        df.write.mode("overwrite").parquet(s"$tmp/cc_lpfirst_$f")
        spark.read.parquet(s"$tmp/cc_lpfirst_$f")
      }
      val lpfDiff = lpfLab.except(lpLab).count() + lpLab.except(lpfLab).count()
      require(
        lpfDiff == 0,
        s"label-prop-first CC labeling diverged from label-prop at factor $f: $lpfDiff rows differ",
      )
      println(
        s"""{"op":"cc_adaptive_lpfirst","factor":$f,"sec":${math.round(tLpf * 1000) / 1000.0},""" +
          s""""edges":$nPairs,"escaped":${operators.Dedup.lastAdaptiveEscaped}}"""
      )
      releaseRetainedState()
    }

    // --- streaming family: the stateful operators (sessionizeExact's
    //     multi-fragment state, the interval join's two-sided state store)
    //     at 1×..8× events tiling. Tiling offsets user ids, so state must
    //     grow LINEARLY in the factor (k× independent users, same per-user
    //     horizon) — superlinear state_rows here means watermark eviction
    //     broke. Peaks are read from StreamingQueryProgress via a listener
    //     (max over microbatches of Σ stateOperators.numRowsTotal/
    //     memoryUsedBytes), which is exactly what an operator would report
    //     on a real cluster's metrics sink.
    val streamFactors = sys.env
      .get("SPARK_GRAFT_SCALE_STREAM_FACTORS")
      .map(_.split(',').map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4, 8))
    val statePeaks = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.name != null) {
          val rows  = p.stateOperators.map(_.numRowsTotal).sum
          val bytes = p.stateOperators.map(_.memoryUsedBytes).sum
          val prev  = statePeaks.getOrElse(p.name, (0L, 0L))
          statePeaks(p.name) = (math.max(prev._1, rows), math.max(prev._2, bytes))
        }
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    def reportStream(op: String, factor: Int, sec: Double, rows: Long, qn: String): Unit = {
      val (sr, sb) = statePeaks.getOrElse(qn, (0L, 0L))
      println(
        s"""{"op":"$op","factor":$factor,"sec":${math.round(sec * 1000) / 1000.0},"rows":$rows,"state_rows":$sr,"state_bytes":$sb}"""
      )
    }
    for (f <- streamFactors if families("stream")) {
      val ev = spark.read.parquet(s"$tmp/events_$f")
      val (t1, r1) =
        time(streaming.EventStream.sessionizeExactOneShot(spark, ev, s"scale_sess_$f").count())
      reportStream("stream_sessionize_exact", f, t1, r1, s"scale_sess_$f")
      val (t2, r2) =
        time(streaming.EventStream.intervalJoinOneShot(spark, ev, s"scale_ij_$f").count())
      reportStream("stream_interval_join", f, t2, r2, s"scale_ij_$f")
      spark.sql(s"DROP TABLE IF EXISTS scale_sess_$f")
      spark.sql(s"DROP TABLE IF EXISTS scale_ij_$f")
      releaseRetainedState()
    }

    // --- rocksdb family: the SAME two stateful operators on the RocksDB
    //     state store — the 100 TB state configuration (state off-heap/
    //     on-disk, heap-free scaling). state_rows must reproduce the heap
    //     provider's bit-exact linearity (same watermark, same eviction);
    //     state_bytes is the provider's own memory accounting (RocksDB
    //     reports its working set, the heap provider reports row bytes),
    //     so compare it WITHIN the family, not across providers.
    for (f <- streamFactors if families("rocksdb")) {
      val ev = spark.read.parquet(s"$tmp/events_$f")
      streaming.EventStream.withRocksDbStateStore(spark) {
        val (t1, r1) =
          time(streaming.EventStream.sessionizeExactOneShot(spark, ev, s"scale_sess_rdb_$f").count())
        reportStream("stream_sessionize_exact_rocksdb", f, t1, r1, s"scale_sess_rdb_$f")
        val (t2, r2) =
          time(streaming.EventStream.intervalJoinOneShot(spark, ev, s"scale_ij_rdb_$f").count())
        reportStream("stream_interval_join_rocksdb", f, t2, r2, s"scale_ij_rdb_$f")
      }
      spark.sql(s"DROP TABLE IF EXISTS scale_sess_rdb_$f")
      spark.sql(s"DROP TABLE IF EXISTS scale_ij_rdb_$f")
      releaseRetainedState()
    }
    spark.stop()
  }
}
