package graft

import graft.functions.{CosineSimilarity, Hashing, TextAnalysis}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Tests for the extension operators: custom-expression correctness, LSH
  * recall vs the exact baseline, dedup semantics.
  */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")

  test("CosineSimilarity custom expression matches the builtin composition") {
    val pairs = emb
      .limit(50)
      .as("a")
      .crossJoin(emb.limit(50).as("b"))
      .select(
        CosineSimilarity.cosine(col("a.embedding"), col("b.embedding")).as("fast"),
        Similarity.cosineBuiltin(col("a.embedding"), col("b.embedding")).as("slow"),
      )
      .collect()
    assert(pairs.length == 2500)
    pairs.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"fast=${r.getDouble(0)} slow=${r.getDouble(1)}")
    }
  }

  test("CosineSimilarity: self-similarity is 1.0 (within fp), null propagates") {
    val self = emb
      .select(CosineSimilarity.cosine(col("embedding"), col("embedding")).as("s"))
      .agg(min("s"), max("s"))
      .head()
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-9)
    val n = emb
      .select(CosineSimilarity.cosine(lit(null).cast("array<float>"), col("embedding")).as("s"))
      .filter(col("s").isNull)
      .count()
    assert(n == emb.count())
  }

  test("LSH top-k: subset of brute force with measurable recall") {
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    // Default-documented dial (planes=2, tables=8): measured recall@3 0.93
    // at sf0.01, 0.77 at 2x4 on this sf0.001 corpus — 2x8 is the cheapest
    // config above the 0.8 bar everywhere (planes=4/tables=8 only 0.67).
    val approx = Similarity
      .lshTopK(emb, queries, "vec_id", "embedding", dim = 64, planes = 2, k = 3, tables = 8)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"LSH recall@3 (2 planes x 8 tables): $recall%.2f over ${exact.size} exact pairs")
    assert(recall >= 0.8, s"recall $recall below the pinned 0.8 floor")
    // every approx hit must be a real neighbor pair scored identically
    assert(approx.nonEmpty)
  }

  test("IVF: train/assign/search — recall vs brute force, work bounded by nprobe") {
    import graft.operators.IvfIndex
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    assert(centroids.count() == 8)
    // every vector lands in exactly one posting list
    val assigned = IvfIndex.assign(emb, centroids, "vec_id", "embedding")
    assert(assigned.count() == emb.count())
    assert(assigned.select("centroid_id").distinct().count() <= 8)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex
      .topK(emb, queries, "vec_id", "embedding", centroids, nprobe = 4, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(f"IVF recall@3 (nlist=8, nprobe=4): $recall%.2f over ${exact.size} exact pairs")
    // same floor the LSH path pins — nprobe=4 of nlist=8 measured 0.83 here
    // (nprobe=3 measured 0.73: half the lists probed is the honest dial for
    // this corpus; work per query is still nprobe/nlist of the posting lists)
    assert(recall >= 0.8, s"recall $recall below the pinned 0.8 floor")
  }

  test("IVF: hash-sampled training is deterministic and yields full codebooks") {
    import graft.operators.IvfIndex
    def trained() =
      IvfIndex
        .train(emb, "vec_id", "embedding", nlist = 4, iters = 1, sampleFraction = 0.5)
        .as[(Int, Seq[Float])]
        .collect()
        .sortBy(_._1)
        .toSeq
    val c1 = trained()
    assert(c1.length == 4)
    // md5-based sampling: same result on every run/partitioning (df.sample
    // would not be), and genuinely different from full-corpus training
    assert(c1 == trained())
    val full = IvfIndex
      .train(emb, "vec_id", "embedding", nlist = 4, iters = 1)
      .as[(Int, Seq[Float])]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(c1 != full, "0.5 sample should train a (slightly) different codebook")
  }

  test("oodDriftGate: newly-occupied cells compare against 0; quiet cells stay ungated") {
    import graft.operators.IvfIndex
    // three explicit centroids; base occupies cells 0 and 1 tightly, the
    // increment lands in cell 2 (which has NO base members — the
    // n_base = 0 division guard) far from its centroid (OOD), plus one
    // well-aligned vector into cell 0 (must NOT gate it)
    def v(x: Double, y: Double, z: Double) = Seq(x.toFloat, y.toFloat, z.toFloat)
    val centroids = Seq((0, v(1, 0, 0)), (1, v(0, 1, 0)), (2, v(0, 0, 1)))
      .toDF("centroid_id", "centroid")
    val base = Seq((1L, v(1, 0.01, 0)), (2L, v(0.99, 0, 0.01)), (3L, v(0.01, 1, 0))).toDF("id", "vec")
    // (0.2, 0.2, 1) is cell 2's closest but only cos ≈ 0.962 — the
    // 990000 threshold marks it OOD
    val inc = Seq((10L, v(0.2, 0.2, 1.0)), (11L, v(1, 0, 0.005))).toDF("id", "vec")
    val gate = IvfIndex
      .oodDriftGate(base, inc, "id", "vec", centroids, thresholdQ = 990000L, gateMilli = 150L)
      .orderBy("centroid_id")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSeq
    val byCell = gate.map(t => t._1 -> t).toMap
    // cell 2: no base members → base milli 0; its one (OOD) increment
    // member → merged 1000 → gated
    assert(byCell(2) == (2, 0L, 0L, 1L, 1000L, true), s"new-cell staleness must gate: $gate")
    // cell 0: base 2 members, one aligned increment — no rise, no gate
    val c0 = byCell(0)
    assert(c0._2 == 2L && c0._4 == 3L && !c0._6, s"a quiet cell must not gate: $gate")
    assert(!byCell(1)._6, s"untouched cell must not gate: $gate")
  }

  test("compactAdcIndexCodes: appends splinter cells, compaction repairs files, serving content unchanged") {
    import graft.operators.IvfIndex
    val centroids = IvfIndex.train(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", nlist = 4, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_compact").toString
    IvfIndex.saveAdcIndex(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    IvfIndex.appendToAdcIndex(spark, dir, emb.filter(col("vec_id") % 4 === 1), "vec_id", "embedding", m = 4)
    IvfIndex.appendToAdcIndex(spark, dir, emb.filter(col("vec_id") % 4 === 3), "vec_id", "embedding", m = 4)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def serve() = IvfIndex
      .adcTopKFromIndex(spark, dir, emb, queries, "vec_id", "embedding", m = 4, nprobe = 2, candK = 8, k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    val beforeServe = serve()
    val census = IvfIndex
      .compactAdcIndexCodes(spark, dir, targetBytes = 128L << 20)
      .as[(Int, Long, Long, Long, Long)]
      .collect()
      .toSeq
    // two appends over a base write → at least one cell holds >= 3 files;
    // a 128 MB target bins every tiny cell to ONE file
    assert(census.map(_._2).max >= 3, s"appends must splinter some cell: $census")
    assert(census.forall(_._3 == 1L), s"every cell must compact to one file: $census")
    assert(census.forall(c => c._5 > 0), "compacted cells keep their bytes")
    assert(serve() == beforeServe, "compaction must not change served content")
    // idempotence: a second pass finds nothing to do (no cell re-written)
    val again = IvfIndex.compactAdcIndexCodes(spark, dir, targetBytes = 128L << 20)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(again.forall(c => c._2 == 1L && c._3 == 1L && c._4 == c._5),
      s"an already-compacted layout must be left untouched: $again")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("appendToAdcIndex: a batch-keyed append replayed twice lands the identical final state") {
    import graft.operators.IvfIndex
    // the crash-between-append-and-checkpoint scenario: the SAME microbatch
    // (same batchId) lands twice; the batch-named files make the second
    // landing replace the first instead of doubling the posting lists
    val base = emb.filter(col("vec_id") % 2 === 0)
    val inc  = emb.filter(col("vec_id") % 2 === 1)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 4, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_replay").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4, batchId = Some(7L))
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def serve() = IvfIndex
      .adcTopKFromIndex(spark, dir, emb, queries, "vec_id", "embedding", m = 4, nprobe = 2, candK = 8, k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    val rowsOnce  = spark.read.parquet(s"$dir/codes").count()
    val serveOnce = serve()
    assert(rowsOnce == emb.count(), "base + increment rows present after the first landing")
    IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4, batchId = Some(7L))
    assert(spark.read.parquet(s"$dir/codes").count() == rowsOnce,
      "a replayed microbatch must not double its rows in the posting lists")
    assert(serve() == serveOnce, "the replay must be serving-invisible")
    // the landing is batch-named — that is the mechanism the delete keys on
    val cellDirs = new java.io.File(s"$dir/codes").listFiles().filter(_.getName.startsWith("centroid_id="))
    val batchFiles = cellDirs.flatMap(_.listFiles()).filter(_.getName.startsWith("batch7-"))
    assert(batchFiles.nonEmpty, "batch-keyed landings must carry their batch id in the file name")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("repairDriftedIndexCells: flagged cells re-center + re-encode, quiet cells byte-identical, recall recovers") {
    import graft.operators.{IvfIndex, Similarity}
    // the q267 drift fixture at spec scale: the increment is the base
    // shifted +0.5/dim (binary32-exact) under fresh ids — it piles into a
    // few cells of the frozen quantizer with residuals far outside the
    // ball the base-trained codebooks cover
    val base = emb.select(col("vec_id"), col("embedding"))
    val inc = base.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.5f)).as("embedding"),
    )
    val merged = base.unionAll(inc)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 8, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_repair").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir, variant = "residual")
    IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4)
    // grade in the drifted regime: queries drawn from the increment
    val queries = inc.filter(col("vec_id") % 50 === 0)
    def recall(): Double = {
      val exact = Similarity.bruteForceTopK(merged, queries, "vec_id", "embedding", 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val approx = IvfIndex
        .adcTopKFromIndex(spark, dir, merged, queries, "vec_id", "embedding",
          m = 4, nprobe = 2, candK = 8, k = 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    def snapshot(): Map[Int, Map[String, String]] =
      new java.io.File(s"$dir/codes").listFiles().toSeq
        .filter(_.getName.startsWith("centroid_id="))
        .map { d =>
          val cell = d.getName.stripPrefix("centroid_id=").toInt
          cell -> d.listFiles().toSeq.filter(_.getName.endsWith(".parquet")).map { f =>
            val bytes = java.nio.file.Files.readAllBytes(f.toPath)
            f.getName -> java.util.Base64.getEncoder.encodeToString(
              java.security.MessageDigest.getInstance("MD5").digest(bytes))
          }.toMap
        }.toMap
    val recallBefore = recall()
    val gate = IvfIndex
      .oodDriftGate(base, inc, "vec_id", "embedding", centroids, thresholdQ = 200000L, gateMilli = 150L)
    val flagged = gate.filter(col("reencode")).select("centroid_id").as[Int].collect().toSeq.sorted
    assert(flagged.nonEmpty, "the drift fixture must fire the gate")
    assert(flagged.size < 8, "the gate must not flag every cell — drift is a delta, not a fence")
    val filesBefore = snapshot()
    val census = IvfIndex
      .repairDriftedIndexCells(spark, dir, merged, "vec_id", "embedding", m = 4, flaggedCells = flagged)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(census.map(_._1).toSeq == flagged, s"one census row per flagged cell: ${census.toSeq}")
    assert(census.forall(_._2 > 0), "every flagged cell had members to repair")
    assert(census.forall(_._3 < 1000000L), s"a repaired centroid must have MOVED: ${census.toSeq}")
    val filesAfter = snapshot()
    val quiet = filesBefore.keySet -- flagged.toSet
    quiet.foreach { cell =>
      assert(filesAfter(cell) == filesBefore(cell),
        s"quiet cell $cell files must be byte-identical after a repair of $flagged")
    }
    flagged.foreach { cell =>
      assert(filesAfter(cell) != filesBefore(cell), s"flagged cell $cell must have been rewritten")
    }
    val recallAfter = recall()
    info(f"drifted-query recall: before=$recallBefore%.3f after=$recallAfter%.3f (flagged ${flagged.size}/8 cells)")
    assert(recallAfter > recallBefore,
      f"per-cell repair must recover recall in the drifted regime: $recallBefore%.3f -> $recallAfter%.3f")
    // idempotent no-op: an empty flagged set repairs nothing
    assert(IvfIndex.repairDriftedIndexCells(spark, dir, merged, "vec_id", "embedding", m = 4, Nil).count() == 0)
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("repairDriftedIndexCells composes: sequential disjoint repairs equal one repair of the union") {
    import graft.operators.IvfIndex
    // the contract the nightly cadence rests on: membership is read from
    // the STORED posting lists, so a second repair after the first moved
    // centroids still rewrites exactly the frozen members — two disjoint
    // repairs commit byte-for-value the same centroids and codes as one
    // repair of the union (re-assigning against the live centroids would
    // migrate boundary rows on the second pass)
    val base = emb.select(col("vec_id"), col("embedding"))
    val inc = base.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.5f)).as("embedding"),
    )
    val merged = base.unionAll(inc)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 8, iters = 0)
    def build(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_spec_repair2").toString
      IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
        m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir, variant = "residual")
      IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4)
      graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
      dir
    }
    val flagged = IvfIndex
      .oodDriftGate(base, inc, "vec_id", "embedding", centroids, thresholdQ = 200000L, gateMilli = 150L)
      .filter(col("reencode"))
      .select("centroid_id")
      .as[Int]
      .collect()
      .toSeq
      .sorted
    assert(flagged.size >= 2, s"the composability fixture needs >= 2 flagged cells: $flagged")
    val (half1, half2) = flagged.splitAt(flagged.size / 2)
    val dirSeq = build()
    val dirUnion = build()
    IvfIndex.repairDriftedIndexCells(spark, dirSeq, merged, "vec_id", "embedding", m = 4, half1)
    IvfIndex.repairDriftedIndexCells(spark, dirSeq, merged, "vec_id", "embedding", m = 4, half2)
    IvfIndex.repairDriftedIndexCells(spark, dirUnion, merged, "vec_id", "embedding", m = 4, flagged)
    def cents(d: String) = spark.read
      .parquet(s"$d/centroids")
      .orderBy("centroid_id")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .toSeq
    assert(cents(dirSeq) == cents(dirUnion),
      "sequential repairs must commit the same centroids as the union repair")
    def codes(d: String) = spark.read
      .parquet(s"$d/codes")
      .orderBy("neighbor_id")
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(codes(dirSeq) == codes(dirUnion),
      "sequential repairs must encode the same codes as the union repair")
    assert(spark.read.parquet(s"$dirSeq/codes").count() == merged.count(),
      "the second repair must neither lose nor duplicate posting-list rows")
  }

  test("compactAdcIndexCodes: watermark retains replayable landings; replay after compaction is serving-invisible") {
    import graft.operators.IvfIndex
    val base = emb.filter(col("vec_id") % 2 === 0)
    val inc0 = emb.filter(col("vec_id") % 4 === 1)
    val inc1 = emb.filter(col("vec_id") % 4 === 3)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 4, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_wm").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    IvfIndex.appendToAdcIndex(spark, dir, inc0, "vec_id", "embedding", m = 4, batchId = Some(0L))
    IvfIndex.appendToAdcIndex(spark, dir, inc1, "vec_id", "embedding", m = 4, batchId = Some(1L))
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def serve() = IvfIndex
      .adcTopKFromIndex(spark, dir, emb, queries, "vec_id", "embedding", m = 4, nprobe = 2, candK = 8, k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    def files() = new java.io.File(s"$dir/codes")
      .listFiles()
      .filter(_.getName.startsWith("centroid_id="))
      .flatMap(_.listFiles())
      .map(_.getName)
      .toSeq
    val serveBefore = serve()
    // compacting a replayable landing with NO watermark is a loud refusal
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.compactAdcIndexCodes(spark, dir, targetBytes = 128L << 20)
    }
    assert(ex.getMessage.contains("minRetainedBatchId"), ex.getMessage)
    assert(files().exists(_.startsWith("batch0-")), "a refused compaction must leave the layout untouched")
    // watermark 1: batch 0 is fenced (compacts), batch 1 is retained by NAME
    IvfIndex.compactAdcIndexCodes(spark, dir, targetBytes = 128L << 20, minRetainedBatchId = Some(1L))
    val afterWm = files()
    assert(!afterWm.exists(_.startsWith("batch0-")), "the fenced batch 0 landing must have been binned")
    assert(afterWm.exists(_.startsWith("batch1-")), "the retained batch 1 landing must keep its replay names")
    assert(serve() == serveBefore, "watermarked compaction must not change served content")
    // the retained batch replays AFTER compaction — still idempotent
    val rowsBefore = spark.read.parquet(s"$dir/codes").count()
    IvfIndex.appendToAdcIndex(spark, dir, inc1, "vec_id", "embedding", m = 4, batchId = Some(1L))
    assert(spark.read.parquet(s"$dir/codes").count() == rowsBefore,
      "a batch replayed after watermarked compaction must not double its rows")
    assert(serve() == serveBefore, "a batch replayed after watermarked compaction must be serving-invisible")
    // watermark above every batch: everything compacts, names normalize
    IvfIndex.compactAdcIndexCodes(spark, dir, targetBytes = 128L << 20, minRetainedBatchId = Some(2L))
    assert(!files().exists(_.startsWith("batch")), "a watermark above every batch compacts all landings")
    assert(serve() == serveBefore)
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("appendToAdcIndex: landing sweep is bounded by touched cells; replay falls back to the full sweep") {
    import graft.operators.IvfIndex
    val base = emb.filter(col("vec_id") % 2 === 0)
    val inc = emb.filter(col("vec_id") % 2 === 1)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 8, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_sweep").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    val nCells = new java.io.File(s"$dir/codes").listFiles().count(_.getName.startsWith("centroid_id="))
    assert(nCells > 1, "the bound is only visible with more than one occupied cell")
    // a one-cell increment: the landing must list exactly ONE cell, not nlist
    val someCell = IvfIndex
      .assign(inc, centroids, "vec_id", "embedding")
      .groupBy("centroid_id")
      .count()
      .orderBy("centroid_id")
      .head()
      .getInt(0)
    val slice = IvfIndex
      .assign(inc, centroids, "vec_id", "embedding")
      .filter(col("centroid_id") === someCell)
      .select(col("vec_id"), col("embedding"))
    IvfIndex.appendToAdcIndex(spark, dir, slice, "vec_id", "embedding", m = 4, batchId = Some(3L))
    assert(!IvfIndex.lastLandingSweepFull, "a first landing must not trigger the full sweep")
    assert(IvfIndex.lastLandingSweepCells == 1,
      s"a one-cell landing must sweep one cell, swept ${IvfIndex.lastLandingSweepCells} of $nCells")
    // replay: a prior file is detected in a touched cell -> full sweep
    IvfIndex.appendToAdcIndex(spark, dir, slice, "vec_id", "embedding", m = 4, batchId = Some(3L))
    assert(IvfIndex.lastLandingSweepFull, "a replay must fall back to the full sweep")
    assert(IvfIndex.lastLandingSweepCells == nCells,
      s"the replay sweep must cover all $nCells cells, swept ${IvfIndex.lastLandingSweepCells}")
    assert(spark.read.parquet(s"$dir/codes").count() == base.count() + slice.count(),
      "the replay must land the identical final state")
    // a crashed landing's scratch dir is swept by the next maintenance entry
    val stale = new java.io.File(s"$dir/codes_append_tmp_b9")
    assert(stale.mkdirs())
    IvfIndex.compactAdcIndexCodes(spark, dir, targetBytes = 128L << 20, minRetainedBatchId = Some(4L))
    assert(!stale.exists(), "a maintenance entry must sweep crashed landings' scratch dirs")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("maintainAdcIndexManifest: idle tick commits nothing; over-bound tick compacts content-invisibly") {
    import graft.operators.IvfIndex
    val base = emb.filter(col("vec_id") % 2 === 0)
    val inc = emb.filter(col("vec_id") % 2 === 1)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 4, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_maint").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    IvfIndex.writeAdcManifest(spark, dir) // gen 0
    val cells = IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4, batchId = Some(0L))
    IvfIndex.commitAdcBatchToManifest(spark, dir, 0L, Some(cells)) // gen 1
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def serve() = IvfIndex
      .adcTopKFromSnapshot(spark, dir, emb, queries, "vec_id", "embedding",
        m = 4, nprobe = 2, candK = 8, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val before = serve()
    // IDLE tick: census below the bound, nothing flagged -> no lever
    // pulled, the chain does not grow, content untouched
    val idle = IvfIndex.maintainAdcIndexManifest(spark, dir, emb, "vec_id", "embedding", m = 4,
      minRetainedBatchId = Some(1L), maxFilesPerCell = 1000)
    assert(!idle.compacted && idle.repairedCells.isEmpty)
    assert(IvfIndex.listAdcGens(fs, dir) == Seq(0L, 1L), "an idle tick must not grow the chain")
    assert(serve() == before)
    // OVER-BOUND tick (no drift flagged): compaction runs and commits,
    // but the tick's own sweep SPARES the pre-tick head - retention
    // widens by the tick's own commits, so a concurrent snapshot reader
    // on gen 1 survives the tick that supersedes it. Serving stays
    // hash-identical - maintenance moves bytes, never content.
    val tick = IvfIndex.maintainAdcIndexManifest(spark, dir, emb, "vec_id", "embedding", m = 4,
      minRetainedBatchId = Some(1L), maxFilesPerCell = 2, keepGens = 1)
    assert(tick.compacted && tick.repairedCells.isEmpty)
    assert(tick.maxCellFilesBefore >= 2L)
    assert(IvfIndex.listAdcGens(fs, dir) == Seq(1L, 2L),
      "a committing tick must keep the pre-tick head readable (keepGens counts beyond its own commits)")
    assert(serve() == before, "a no-drift maintenance tick must be content-invisible")
    // The NEXT tick (idle) retires the superseded world: grace consumed,
    // de-referenced pre-bin files reclaimed, content still identical.
    val next = IvfIndex.maintainAdcIndexManifest(spark, dir, emb, "vec_id", "embedding", m = 4,
      minRetainedBatchId = Some(1L), maxFilesPerCell = 1000, keepGens = 1)
    assert(!next.compacted && next.sweptFiles > 0L, s"the next tick reclaims the superseded files: $next")
    assert(IvfIndex.listAdcGens(fs, dir) == Seq(2L))
    assert(serve() == before)
  }

  test("manifest commit: snapshot isolation, replay healing, cleanup spares in-flight landings") {
    import graft.operators.IvfIndex
    val base = emb.filter(col("vec_id") % 2 === 0)
    val inc4 = emb.filter(col("vec_id") % 4 === 1)
    val inc9 = emb.filter(col("vec_id") % 4 === 3)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 4, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_manifest").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    assert(IvfIndex.writeAdcManifest(spark, dir) == 0L)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def serveSnap(gen: Option[Long]) = IvfIndex
      .adcTopKFromSnapshot(spark, dir, emb, queries, "vec_id", "embedding",
        m = 4, nprobe = 2, candK = 8, k = 3, gen = gen)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    def codeFiles(prefix: String): Int =
      new java.io.File(s"$dir/codes").listFiles().toSeq
        .filter(_.getName.startsWith("centroid_id="))
        .flatMap(_.listFiles().toSeq)
        .count(_.getName.startsWith(prefix))
    val serveBase = serveSnap(Some(0L))
    // a LANDED but uncommitted batch is invisible to every snapshot
    IvfIndex.appendToAdcIndex(spark, dir, inc4, "vec_id", "embedding", m = 4, batchId = Some(4L))
    assert(serveSnap(None) == serveBase, "an uncommitted landing must be snapshot-invisible")
    assert(IvfIndex.commitAdcBatchToManifest(spark, dir, 4L) == 1L)
    val serveG1 = serveSnap(None)
    assert(serveG1 != serveBase, "the committed landing must change the served content")
    // snapshot == rename-mode serving over the same content (a TWIN
    // index: live-tree reads on the manifest dir itself are refused —
    // between a manifest compaction and cleanup the tree double-counts)
    val twin = java.nio.file.Files.createTempDirectory("graft_spec_manifest_twin").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = twin)
    IvfIndex.appendToAdcIndex(spark, twin, inc4, "vec_id", "embedding", m = 4)
    val live = IvfIndex
      .adcTopKFromIndex(spark, twin, emb.filter(col("vec_id") % 4 =!= 3), queries, "vec_id", "embedding",
        m = 4, nprobe = 2, candK = 8, k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    assert(serveG1 == live, "snapshot serving must be hash-identical to the rename-mode path")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(twin))
    val exLive = intercept[IllegalArgumentException] {
      IvfIndex.adcTopKFromIndex(spark, dir, emb, queries, "vec_id", "embedding",
        m = 4, nprobe = 2, candK = 8, k = 3)
    }
    assert(exLive.getMessage.contains("MANIFEST"), exLive.getMessage)
    // manifest compaction: commits a new gen, deletes NOTHING
    val census = IvfIndex
      .compactAdcIndexCodesManifest(spark, dir, targetBytes = 128L << 20, minRetainedBatchId = Some(5L))
      .as[(Int, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(census.exists(c => c._2 > c._3), s"some cell must have fewer refs after binning: $census")
    assert(codeFiles("batch4-") > 0, "manifest compaction must not delete the superseded files")
    assert(serveSnap(Some(2L)) == serveG1, "the compacted generation must serve identical content")
    assert(serveSnap(Some(1L)) == serveG1, "the PRE-compaction generation must still serve (isolation)")
    // rename-mode compaction refuses a manifest index
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.compactAdcIndexCodes(spark, dir, targetBytes = 128L << 20, minRetainedBatchId = Some(5L))
    }
    assert(ex.getMessage.contains("MANIFEST"), ex.getMessage)
    // cleanup: de-referenced files die, never-referenced (in-flight) survive,
    // and a crashed landing's scratch dir is swept (manifest mode's mirror
    // of the rename-mode maintenance-entry self-heal)
    IvfIndex.appendToAdcIndex(spark, dir, inc9, "vec_id", "embedding", m = 4, batchId = Some(9L))
    val staleScratch = new java.io.File(s"$dir/codes_append_tmp_b77")
    assert(staleScratch.mkdirs())
    // The scratch sweep is AGE-GATED (an op staging right now is spared;
    // a crashed op's scratch ages past the grace): at the default grace a
    // seconds-old scratch survives, at grace 0 it is reclaimed.
    val youngScratch = new java.io.File(s"$dir/manifest_tmp_inflight-commit")
    assert(youngScratch.mkdirs())
    val deleted = IvfIndex.cleanupAdcGenerations(spark, dir, keepGens = 1)
    assert(youngScratch.exists(), "a scratch younger than the grace (an op staging now) must be spared")
    assert(staleScratch.exists(), "the landing scratch is also seconds old here - spared at default grace")
    IvfIndex.cleanupAdcGenerations(spark, dir, keepGens = 1, scratchGraceMs = 0L)
    assert(!staleScratch.exists(), "cleanup must sweep crashed landings' scratch dirs")
    assert(!youngScratch.exists(), "grace 0 reclaims every crashed-op scratch")
    // The age gate reads the wall-clock stamp the scratch NAME embeds,
    // not mtime: old-stamped + fresh mtime dies at the default grace;
    // fresh-stamped + epoch-0 mtime (the object-store directory-entry
    // case that voids an mtime gate) is spared.
    val fsH = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldStamped = new org.apache.hadoop.fs.Path(s"$dir/manifest_tmp_ts1000_crashed")
    fsH.mkdirs(oldStamped)
    val freshStamped = new org.apache.hadoop.fs.Path(s"$dir/${IvfIndex.scratchName("manifest_tmp", "staging-now")}")
    fsH.mkdirs(freshStamped)
    fsH.setTimes(freshStamped, 0L, 0L)
    IvfIndex.cleanupAdcGenerations(spark, dir, keepGens = 1)
    assert(!fsH.exists(oldStamped), "old-stamped scratch dies at default grace despite fresh mtime")
    assert(fsH.exists(freshStamped), "fresh-stamped scratch survives an epoch-0 mtime")
    fsH.delete(freshStamped, true)
    // The stamp parse reads the FIRST `_ts<digits>_` token, not the last:
    // no suffix contains one today, but a future suffix that did would —
    // under a greedy parse — misdate a live staging dir and let the sweep
    // reclaim it mid-staging.
    assert(IvfIndex.scratchBornAt("manifest_tmp_ts5000_b_ts1_x").contains(5000L),
      "the name stamp is the first _ts token, never a later suffix token")
    val trickySuffix = new org.apache.hadoop.fs.Path(s"$dir/${IvfIndex.scratchName("manifest_tmp", "b_ts1_x")}")
    fsH.mkdirs(trickySuffix)
    IvfIndex.cleanupAdcGenerations(spark, dir, keepGens = 1)
    assert(fsH.exists(trickySuffix), "a fresh scratch with an old-looking _ts token in its SUFFIX is spared")
    fsH.delete(trickySuffix, true)
    assert(deleted > 0, "cleanup must delete the de-referenced pre-bin files")
    assert(codeFiles("batch4-") == 0, "the superseded landing files must be gone after cleanup")
    assert(codeFiles("batch9-") > 0, "a never-referenced in-flight landing must survive cleanup")
    assert(serveSnap(None) == serveG1, "cleanup must not change the retained generation's content")
    // replay healing: the in-flight batch commits, replays (fresh part
    // names), and the re-commit heals the refs to the replayed files
    IvfIndex.commitAdcBatchToManifest(spark, dir, 9L)
    val serveG4 = serveSnap(None)
    assert(serveG4 != serveG1)
    IvfIndex.appendToAdcIndex(spark, dir, inc9, "vec_id", "embedding", m = 4, batchId = Some(9L))
    IvfIndex.commitAdcBatchToManifest(spark, dir, 9L)
    assert(serveSnap(None) == serveG4, "a replayed batch's re-commit must serve the identical state")
    // the snapshot read keeps the dynamically pruned probe join
    val p = IvfIndex
      .adcTopKFromSnapshot(spark, dir, emb, queries, "vec_id", "embedding",
        m = 4, nprobe = 2, candK = 8, k = 3)
      .queryExecution
      .executedPlan
      .toString
    assert(p.contains("dynamicpruning"),
      s"the snapshot codes scan must stay dynamically partition-pruned:\n$p")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("manifest drift repair: one atomic commit, pre-repair generation keeps serving the old index") {
    import graft.operators.IvfIndex
    val base = emb.select(col("vec_id"), col("embedding"))
    val inc = base.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.5f)).as("embedding"),
    )
    val merged = base.unionAll(inc)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 8, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_mrepair").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir, variant = "residual")
    IvfIndex.writeAdcManifest(spark, dir)
    val cells = IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4, batchId = Some(0L))
    IvfIndex.commitAdcBatchToManifest(spark, dir, 0L, Some(cells)) // gen 1
    val queries = inc.filter(col("vec_id") % 50 === 0)
    def serveSnap(gen: Option[Long]) = IvfIndex
      .adcTopKFromSnapshot(spark, dir, merged, queries, "vec_id", "embedding",
        m = 4, nprobe = 2, candK = 8, k = 3, gen = gen)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    val flagged = IvfIndex
      .oodDriftGate(base, inc, "vec_id", "embedding", centroids, thresholdQ = 200000L, gateMilli = 150L)
      .filter(col("reencode"))
      .select("centroid_id")
      .as[Int]
      .collect()
      .toSeq
      .sorted
    assert(flagged.nonEmpty)
    // an unfenced landing in a flagged cell refuses, manifest-style
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.repairDriftedIndexCellsManifest(spark, dir, merged, "vec_id", "embedding", m = 4, flagged)
    }
    assert(ex.getMessage.contains("minRetainedBatchId"), ex.getMessage)
    val serveBefore = serveSnap(None)
    val census = IvfIndex
      .repairDriftedIndexCellsManifest(spark, dir, merged, "vec_id", "embedding", m = 4, flagged,
        minRetainedBatchId = Some(1L)) // gen 2
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(census.map(_._1).toSeq == flagged, s"one census row per flagged cell: ${census.toSeq}")
    assert(census.forall(_._3 < 1000000L), s"a repaired centroid must have MOVED: ${census.toSeq}")
    // snapshot isolation THROUGH the repair: the pre-repair generation
    // still serves the exact pre-repair results (old codes AND old
    // centroids — no mixed world), while the new generation serves the
    // repaired index
    assert(serveSnap(Some(1L)) == serveBefore,
      "the pre-repair generation must keep serving the old codes + old centroids")
    val serveAfter = serveSnap(None)
    assert(serveAfter != serveBefore, "the repair must change drifted-regime serving")
    // the repair re-encodes and may migrate vectors between cells, yet
    // adds/removes NONE: id-invisible to the chain diff — while the batch
    // commit's diff is exactly the batch
    assert(IvfIndex.adcChainDiff(spark, dir, 1L, 2L).isEmpty,
      "a drift repair must be id-invisible to the chain diff")
    val added = IvfIndex.adcChainDiff(spark, dir, 0L, 1L)
      .filter(col("op") === "added").select("id").as[Long].collect().toSet
    assert(added == inc.select("vec_id").as[Long].collect().toSet,
      "the batch commit's added set must be exactly the batch")
    // the repaired world == the rename-mode repair's world: rebuild the
    // same index rename-style and compare served content
    val dir2 = java.nio.file.Files.createTempDirectory("graft_spec_mrepair_ref").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir2, variant = "residual")
    IvfIndex.appendToAdcIndex(spark, dir2, inc, "vec_id", "embedding", m = 4)
    IvfIndex.repairDriftedIndexCells(spark, dir2, merged, "vec_id", "embedding", m = 4, flagged)
    val serveRename = IvfIndex
      .adcTopKFromIndex(spark, dir2, merged, queries, "vec_id", "embedding", m = 4, nprobe = 2, candK = 8, k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    assert(serveAfter == serveRename, "manifest repair must serve exactly what the rename repair serves")
    // cleanup retires the pre-repair world: old codes files AND the
    // superseded centroids version die; the live generation is unaffected
    assert(IvfIndex.cleanupAdcGenerations(spark, dir, keepGens = 1) > 0L)
    assert(!new java.io.File(s"$dir/centroids").exists() ||
      serveSnap(None) == serveAfter, "cleanup must not change the retained generation")
    assert(serveSnap(None) == serveAfter)
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir2))
  }

  test("commitAdcGen: a stale-parent committer refuses loudly; a PUT-overwritten commit is detected") {
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_commitguard").toString
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val refs = Seq(IvfIndex.AdcRef("codes", 0, "part-spec.parquet", 1L))
    IvfIndex.commitAdcGen(spark, fs, dir, 0L, refs, expectedParent = None)
    IvfIndex.commitAdcGen(spark, fs, dir, 1L, refs, expectedParent = Some(0L))
    // the LOST-UPDATE interleaving: maintenance read gen 0's refs, ingest
    // committed gen 1 meanwhile — publishing gen 2 from gen-0 refs would
    // silently drop gen 1's files from the chain, so the commit refuses
    // BEFORE touching the chain
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.commitAdcGen(spark, fs, dir, 2L, refs, expectedParent = Some(0L))
    }
    assert(ex.getMessage.contains("head moved"), ex.getMessage)
    assert(IvfIndex.listAdcGens(fs, dir) == Seq(0L, 1L), "a refused commit must leave the chain untouched")
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(dir)).exists(_.getPath.getName.startsWith("manifest_tmp")),
      "a refused commit must leave no staged scratch behind (the shared head-commit protocol's hygiene rule)")
    // the restarted-driver twin racing for the SAME generation: the loser
    // sees the head moved past its parent — refused, chain untouched
    val ex2 = intercept[IllegalArgumentException] {
      IvfIndex.commitAdcGen(spark, fs, dir, 1L, refs, expectedParent = Some(0L))
    }
    assert(ex2.getMessage.contains("head moved"), ex2.getMessage)
    assert(IvfIndex.listAdcGens(fs, dir) == Seq(0L, 1L))
    // the PUT-overwrite fence (fence 2): on an object store both twins can
    // pass fence 1 and PUT gen-N, last write silently winning — the
    // read-back must then tell the loser its world is NOT what readers
    // resolve (simulated by verifying gen 1 against a token that is not
    // the winner's)
    val ex3 = intercept[IllegalArgumentException] {
      IvfIndex.requireGenCommitWon(spark, dir, 1L, "not-the-winning-token")
    }
    assert(ex3.getMessage.contains("ANOTHER writer"), ex3.getMessage)
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("cross-artifact coverage: a one-side crash is detected loudly; re-landing the missing batch heals it") {
    import graft.operators.{Consistency, IvfIndex}
    val docs = (1L to 60L).map(i => (i, s"document number $i with shared filler words")).toDF("doc_id", "text")
    val dedupPath = java.nio.file.Files.createTempDirectory("graft_xart_spec").resolve("dedup").toString
    Dedup.saveDedupIndex(Dedup.buildDedupIndex(docs.filter($"doc_id" <= 30), "doc_id", "text"), dedupPath)
    Dedup.writeDedupManifest(spark, dedupPath) // dedup gen 0
    val annBase = emb.filter(col("vec_id") % 2 === 0)
    val centroids = IvfIndex.train(annBase, "vec_id", "embedding", nlist = 4, iters = 0)
    val annDir = java.nio.file.Files.createTempDirectory("graft_xart_spec_ann").toString
    IvfIndex.saveAdcIndex(annBase, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = annDir)
    IvfIndex.writeAdcManifest(spark, annDir) // ann gen 0
    // batch 0 lands and commits in BOTH chains — the clean dual hop
    Dedup.appendDedupIndex(
      Dedup.buildDedupIndex(docs.filter($"doc_id" > 30 && $"doc_id" <= 45), "doc_id", "text"),
      dedupPath, batchId = Some(0L))
    Dedup.commitDedupBatchToManifest(spark, dedupPath, 0L)
    val cells0 = IvfIndex.appendToAdcIndex(spark, annDir, emb.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding", m = 4, batchId = Some(0L))
    IvfIndex.commitAdcBatchToManifest(spark, annDir, 0L, Some(cells0))
    Consistency.requireCoverage(spark, dedupPath, annDir, Seq(0L))
    assert(Consistency.crossArtifactCoverage(spark, dedupPath, annDir)
      .filter(col("status") =!= "both").isEmpty, "a clean dual batch censuses 'both'")
    // THE CRASH WINDOW: batch 1 commits into the dedup chain; the ANN
    // side lands its files but the driver dies BEFORE the ANN commit —
    // the landed files are referenced by no generation, so the ANN head
    // does not cover the batch. Both chains are internally consistent;
    // only the cross-artifact census can see the divergence.
    Dedup.appendDedupIndex(
      Dedup.buildDedupIndex(docs.filter($"doc_id" > 45), "doc_id", "text"), dedupPath, batchId = Some(1L))
    Dedup.commitDedupBatchToManifest(spark, dedupPath, 1L)
    IvfIndex.appendToAdcIndex(spark, annDir, emb.filter(col("vec_id") % 4 === 3),
      "vec_id", "embedding", m = 4, batchId = Some(1L)): Unit // crash: no commit
    val census = Consistency.crossArtifactCoverage(spark, dedupPath, annDir).collect()
    assert(census.exists(r => r.getLong(0) == 1L && r.getString(3) == "dedup_only"),
      s"the census must surface the half-committed batch: ${census.mkString(";")}")
    val ex = intercept[IllegalArgumentException] {
      Consistency.requireCoverage(spark, dedupPath, annDir, Seq(0L, 1L))
    }
    assert(ex.getMessage.contains("cross-artifact divergence") && ex.getMessage.contains("re-land"),
      ex.getMessage)
    // REMEDIATION = the replay the landing protocol already makes
    // idempotent: re-land the batch into the missing artifact under the
    // SAME batch id (the fresh landing sweeps the crash residue) and
    // commit its generation. The census is clean afterwards.
    val cells1 = IvfIndex.appendToAdcIndex(spark, annDir, emb.filter(col("vec_id") % 4 === 3),
      "vec_id", "embedding", m = 4, batchId = Some(1L))
    IvfIndex.commitAdcBatchToManifest(spark, annDir, 1L, Some(cells1))
    Consistency.requireCoverage(spark, dedupPath, annDir, Seq(0L, 1L))
    assert(Consistency.crossArtifactCoverage(spark, dedupPath, annDir)
      .filter(col("status") =!= "both").isEmpty, "re-landing the missing side heals the divergence")
    assert(spark.read.parquet(s"$annDir/codes").count() ==
      annBase.count() + emb.filter(col("vec_id") % 4 === 1).count() + emb.filter(col("vec_id") % 4 === 3).count(),
      "the remediation replay must not double the crashed landing's rows")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(annDir))
    graft.streaming.EventStream.registerDeleteOnExit(
      new java.io.File(dedupPath).getParentFile)
  }

  test("coverage-gated compaction: folding a batch the other artifact never covered refuses; fold watermarks keep the census sound") {
    import graft.operators.{Consistency, Dedup, IvfIndex}
    val docs = (1L to 60L).map(i => (i, s"gate document number $i with shared filler words")).toDF("doc_id", "text")
    val dedupPath = java.nio.file.Files.createTempDirectory("graft_foldgate_spec").resolve("dedup").toString
    Dedup.saveDedupIndex(Dedup.buildDedupIndex(docs.filter($"doc_id" <= 30), "doc_id", "text"), dedupPath)
    Dedup.writeDedupManifest(spark, dedupPath) // dedup gen 0
    val annBase = emb.filter(col("vec_id") % 2 === 0)
    val centroids = IvfIndex.train(annBase, "vec_id", "embedding", nlist = 4, iters = 0)
    val annDir = java.nio.file.Files.createTempDirectory("graft_foldgate_spec_ann").toString
    IvfIndex.saveAdcIndex(annBase, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = annDir)
    IvfIndex.writeAdcManifest(spark, annDir) // ann gen 0
    val fs = new org.apache.hadoop.fs.Path(dedupPath).getFileSystem(spark.sessionState.newHadoopConf())
    // THE DIVERGENT STATE: batch 0 committed into the dedup chain only
    // (the between-commits crash window)
    Dedup.appendDedupIndex(
      Dedup.buildDedupIndex(docs.filter($"doc_id" > 30), "doc_id", "text"), dedupPath, batchId = Some(0L))
    Dedup.commitDedupBatchToManifest(spark, dedupPath, 0L)
    val gensBefore = Dedup.listDedupGens(fs, dedupPath)
    // A coverage-GATED compaction whose watermark would fold batch 0
    // refuses loudly: folding would bin the landing's name away and make
    // the divergence permanently unobservable to every census
    val ex = intercept[IllegalArgumentException] {
      Dedup.compactDedupIndexManifest(spark, dedupPath, targetFiles = 1,
        minRetainedBatchId = Some(1L), coverageGuard = Some(annDir))
    }
    assert(ex.getMessage.contains("refusing to fold") && ex.getMessage.contains("batch(es) 0") &&
      ex.getMessage.contains("re-land"), ex.getMessage)
    assert(Dedup.listDedupGens(fs, dedupPath) == gensBefore,
      "the refused compaction must leave the chain untouched")
    assert(Dedup.dedupFoldWatermark(spark, dedupPath).isEmpty,
      "a refused fold must not advance the fold watermark")
    // REMEDIATION (the refusal's own text): re-land batch 0 into the ANN
    // chain under the same id and commit - the gate then passes and the
    // SAME compaction call proceeds
    val cells0 = IvfIndex.appendToAdcIndex(spark, annDir, emb.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding", m = 4, batchId = Some(0L))
    IvfIndex.commitAdcBatchToManifest(spark, annDir, 0L, Some(cells0))
    val (fb, fa) = Dedup.compactDedupIndexManifest(spark, dedupPath, targetFiles = 1,
      minRetainedBatchId = Some(1L), coverageGuard = Some(annDir))
    assert(fa < fb, "the post-remediation compaction must actually rewrite")
    // the fold watermark is PERSISTED: the largest folded batch id,
    // carried by the new head generation
    assert(Dedup.dedupFoldWatermark(spark, dedupPath).contains(0L))
    // ...and the census stays SOUND across the fold: batch 0 is no longer
    // name-observable in the dedup refs, but its id is at the fold
    // watermark, so the fold-aware census reads 'both' (in_dedup=false)
    // and the coverage gate still passes - the concurrent-compaction race
    // that would have manufactured a false divergence is closed
    val row = Consistency.crossArtifactCoverage(spark, dedupPath, annDir)
      .filter(col("batch_id") === 0L).collect()
    assert(row.length == 1 && !row.head.getBoolean(1) && row.head.getBoolean(2) &&
      row.head.getString(3) == "both",
      s"a folded-one-side batch must census covered: ${row.mkString(";")}")
    Consistency.requireCoverage(spark, dedupPath, annDir, Seq(0L))
    // the SYMMETRIC gate on the ANN compactor: batch 1 lands in the ANN
    // chain only - a guarded ANN compaction refuses to fold it
    val cells1 = IvfIndex.appendToAdcIndex(spark, annDir, emb.filter(col("vec_id") % 4 === 3),
      "vec_id", "embedding", m = 4, batchId = Some(1L))
    IvfIndex.commitAdcBatchToManifest(spark, annDir, 1L, Some(cells1))
    val ex2 = intercept[IllegalArgumentException] {
      IvfIndex.compactAdcIndexCodesManifest(spark, annDir, targetBytes = 1L << 30,
        minRetainedBatchId = Some(2L), coverageGuard = Some(dedupPath))
    }
    assert(ex2.getMessage.contains("refusing to fold") && ex2.getMessage.contains("1") &&
      ex2.getMessage.contains("dedup chain"), ex2.getMessage)
    // re-land batch 1 into the dedup chain, then the guarded ANN
    // compaction proceeds and persists ITS fold watermark; batch 0 passes
    // the gate through the dedup chain's fold watermark (it is no longer
    // name-observable there - exactly the inductive case)
    Dedup.appendDedupIndex(
      Dedup.buildDedupIndex(docs.filter($"doc_id" > 30), "doc_id", "text")
        .withColumn("id", col("id") + lit(1000L)), dedupPath, batchId = Some(1L))
    Dedup.commitDedupBatchToManifest(spark, dedupPath, 1L)
    IvfIndex.compactAdcIndexCodesManifest(spark, annDir, targetBytes = 1L << 30,
      minRetainedBatchId = Some(2L), coverageGuard = Some(dedupPath)): Unit
    assert(IvfIndex.adcFoldWatermark(spark, annDir).contains(1L))
    // both batches verify through the two fold watermarks + the live refs
    Consistency.requireCoverage(spark, dedupPath, annDir, Seq(0L, 1L))
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(annDir))
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dedupPath).getParentFile)
  }

  test("fold coverage is an exact id set: a gap under the watermark cannot mask a one-sided batch") {
    // THE r20 VERDICT #1 GAP STATE: batch 2 lands in the ANN chain only
    // (the between-commits crash, checkpoint abandoned), batch 3 later
    // dual-lands cleanly, and the dedup chain's gated compaction folds its
    // own landings {1, 3}. Under max-watermark coverage (`2 <= 3`) the
    // census flipped the REAL ann_only divergence to 'both', requireCoverage
    // passed, and the ANN chain's own gate would fold batch 2 — permanently
    // unobservable with every gate reporting clean. With the folded-id SET,
    // batch 2 stays a loud divergence until it is actually re-landed.
    import graft.operators.{Consistency, Dedup, IvfIndex}
    val docs = (1L to 80L).map(i => (i, s"foldgap document number $i with shared filler words")).toDF("doc_id", "text")
    val dedupPath = java.nio.file.Files.createTempDirectory("graft_foldgap_spec").resolve("dedup").toString
    Dedup.saveDedupIndex(Dedup.buildDedupIndex(docs.filter($"doc_id" <= 20), "doc_id", "text"), dedupPath)
    Dedup.writeDedupManifest(spark, dedupPath)
    val annBase = emb.filter(col("vec_id") % 2 === 0)
    val centroids = IvfIndex.train(annBase, "vec_id", "embedding", nlist = 4, iters = 0)
    val annDir = java.nio.file.Files.createTempDirectory("graft_foldgap_spec_ann").toString
    IvfIndex.saveAdcIndex(annBase, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = annDir)
    IvfIndex.writeAdcManifest(spark, annDir)
    def dedupBatch(lo: Long, hi: Long, b: Long): Unit = {
      Dedup.appendDedupIndex(
        Dedup.buildDedupIndex(docs.filter($"doc_id" > lo && $"doc_id" <= hi), "doc_id", "text"),
        dedupPath, batchId = Some(b))
      Dedup.commitDedupBatchToManifest(spark, dedupPath, b): Unit
    }
    def annBatch(m8: Int, b: Long): Unit = {
      val cells = IvfIndex.appendToAdcIndex(spark, annDir, emb.filter(col("vec_id") % 8 === m8),
        "vec_id", "embedding", m = 4, batchId = Some(b))
      IvfIndex.commitAdcBatchToManifest(spark, annDir, b, Some(cells)): Unit
    }
    dedupBatch(20, 40, 1L); annBatch(1, 1L) // batch 1: clean dual land
    annBatch(3, 2L)                          // batch 2: ANN ONLY — the one-sided crash
    dedupBatch(40, 60, 3L); annBatch(5, 3L)  // batch 3: clean dual land
    // The dedup compaction folds {1, 3} — both covered by the ANN chain, so
    // the gate passes and the persisted fold set is EXACT, with the gap.
    val (fb, fa) = Dedup.compactDedupIndexManifest(spark, dedupPath, targetFiles = 1,
      minRetainedBatchId = Some(4L), coverageGuard = Some(annDir))
    assert(fa < fb, "the gap-state compaction must actually rewrite")
    assert(Dedup.dedupFoldWatermark(spark, dedupPath).contains(3L))
    assert(Dedup.dedupFoldedBatches(spark, dedupPath) == Set(1L, 3L),
      "the folded-id set is exact — no dense-range claim over the gap")
    // The census still reports the REAL divergence for the gap batch...
    val row = Consistency.crossArtifactCoverage(spark, dedupPath, annDir)
      .filter(col("batch_id") === 2L).collect()
    assert(row.length == 1 && row.head.getString(3) == "ann_only",
      s"batch 2 under the watermark but never landed must stay ann_only: ${row.mkString(";")}")
    // ...the coverage gate refuses it...
    intercept[IllegalArgumentException] {
      Consistency.requireCoverage(spark, dedupPath, annDir, Seq(2L))
    }: Unit
    // ...and the ANN chain's own guarded compaction refuses to fold it
    // (under the max form it would have consulted dedup's watermark 3,
    // read 2 <= 3 as covered, and folded the divergence away forever).
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.compactAdcIndexCodesManifest(spark, annDir, targetBytes = 1L << 30,
        minRetainedBatchId = Some(4L), coverageGuard = Some(dedupPath))
    }
    assert(ex.getMessage.contains("refusing to fold") && ex.getMessage.contains("2") &&
      ex.getMessage.contains("folded-id set"), ex.getMessage)
    // Remediation per the refusal text: re-land batch 2 into the dedup
    // chain under the SAME id — the census heals, the gates pass, and the
    // ANN compaction proceeds with batch 2 in ITS exact fold set.
    dedupBatch(60, 80, 2L)
    Consistency.requireCoverage(spark, dedupPath, annDir, Seq(1L, 2L, 3L))
    IvfIndex.compactAdcIndexCodesManifest(spark, annDir, targetBytes = 1L << 30,
      minRetainedBatchId = Some(4L), coverageGuard = Some(dedupPath)): Unit
    assert(IvfIndex.adcFoldedBatches(spark, annDir).contains(2L))
    assert(Consistency.crossArtifactCoverage(spark, dedupPath, annDir)
      .filter(col("status") =!= "both").isEmpty, "post-remediation census is clean")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(annDir))
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dedupPath).getParentFile)
  }

  test("planCodesCompaction: a fully watermark-retained census is a no-op, not a failure") {
    import graft.operators.IvfIndex
    // the nightly-compactor edge: every code file is a batch landing at or
    // above the watermark — nothing eligible to bin must mean "no victims"
    // (both compactors then rewrite/commit NOTHING), never an exception
    val before = Seq((0, "batch5-a.parquet", 10L), (1, "batch6-b.parquet", 10L))
    val (retained, victims) = IvfIndex.planCodesCompaction("spec", before, targetBytes = 1L, Some(5L))
    assert(victims.isEmpty, "all-retained must select no victims")
    assert(retained == before, "every file stays retained under its replay name")
  }

  test("appendToAdcIndex: refuses a plain (non-batch-keyed) append into a manifest index") {
    import graft.operators.IvfIndex
    val base = emb.select(col("vec_id"), col("embedding"))
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 8, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_mplain").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    IvfIndex.writeAdcManifest(spark, dir)
    val inc = base.select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
    // a plain append never observes its touched cells or carries a replay
    // key, so a later manifest commit would silently degrade to the full
    // O(nlist) listing — the composition rule is a fence, not a caveat
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4)
    }
    assert(ex.getMessage.contains("batch-keyed"), ex.getMessage)
    // and the batch-keyed landing is accepted as before
    val cells = IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4, batchId = Some(0L))
    assert(cells.nonEmpty)
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("cleanupAdcGenerations: sweeps crashed-op orphans the chain passed, spares in-flight gens") {
    import graft.operators.IvfIndex
    val base = emb.select(col("vec_id"), col("embedding"))
    val inc = base.select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 8, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_orphans").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    IvfIndex.writeAdcManifest(spark, dir) // gen 0
    val cells = IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4, batchId = Some(0L))
    IvfIndex.commitAdcBatchToManifest(spark, dir, 0L, Some(cells)) // gen 1 = the head
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val cellDir = s"$dir/codes/centroid_id=${cells.head}"
    // a compaction that built gen 1 but LOST the commit race (or crashed
    // before its commit) left bins behind; the head passed gen 1, no
    // generation references them — permanently unreclaimable before the
    // orphan sweep
    fs.create(new org.apache.hadoop.fs.Path(s"$cellDir/m1bin0-orphan.parquet")).close()
    // a maintenance op building gen 2 RIGHT NOW (head is 1): must be spared
    fs.create(new org.apache.hadoop.fs.Path(s"$cellDir/r2-inflight.parquet")).close()
    // same pair for a repair's centroids version
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/centroids_g1"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/centroids_g2"))
    val queries = inc.filter(col("vec_id") % 50 === 0)
    def serve() = IvfIndex
      .adcTopKFromSnapshot(spark, dir, base.unionAll(inc), queries, "vec_id", "embedding",
        m = 4, nprobe = 2, candK = 8, k = 3)
      .orderBy("query_id", "rank")
      .collect()
      .toSeq
    val beforeServe = serve()
    // keepGens covers the whole chain: no generation dies, ONLY orphans do
    val deleted = IvfIndex.cleanupAdcGenerations(spark, dir, keepGens = 2)
    assert(deleted == 2L, s"exactly the two passed-gen orphans die: $deleted")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$cellDir/m1bin0-orphan.parquet")), "passed-gen bin orphan swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$cellDir/r2-inflight.parquet")), "ahead-of-head file spared")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/centroids_g1")), "passed-gen centroids orphan swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/centroids_g2")), "ahead-of-head centroids spared")
    assert(serve() == beforeServe, "the orphan sweep must not change what the head generation serves")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("repairDriftedIndexCells: refuses while any unfenced batch landing exists") {
    import graft.operators.IvfIndex
    val base = emb.select(col("vec_id"), col("embedding"))
    val inc = base.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.5f)).as("embedding"),
    )
    val merged = base.unionAll(inc)
    val centroids = IvfIndex.train(base, "vec_id", "embedding", nlist = 8, iters = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_fence").toString
    IvfIndex.saveAdcIndex(base, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir, variant = "residual")
    IvfIndex.appendToAdcIndex(spark, dir, inc, "vec_id", "embedding", m = 4, batchId = Some(5L))
    val flagged = IvfIndex
      .oodDriftGate(base, inc, "vec_id", "embedding", centroids, thresholdQ = 200000L, gateMilli = 150L)
      .filter(col("reencode"))
      .select("centroid_id")
      .as[Int]
      .collect()
      .toSeq
      .sorted
    assert(flagged.nonEmpty)
    // repair re-encodes whole cells and moves centroids — it can neither
    // retain a landing's files nor leave a replay's re-assignment sound,
    // so ANY unfenced batch landing is a loud refusal...
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.repairDriftedIndexCells(spark, dir, merged, "vec_id", "embedding", m = 4, flagged)
    }
    assert(ex.getMessage.contains("minRetainedBatchId"), ex.getMessage)
    // ...and a watermark above the batch (checkpoint committed) unfences it
    val census = IvfIndex.repairDriftedIndexCells(
      spark, dir, merged, "vec_id", "embedding", m = 4, flagged, minRetainedBatchId = Some(6L))
    assert(census.count() == flagged.size.toLong)
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("cosineNearDupPairsLsh: exactly-once pairs, subset of exhaustive, sims exact") {
    val lsh = Similarity
      .cosineNearDupPairsLsh(emb, "vec_id", "embedding", dim = 64, planes = 4, threshold = 0.35, tables = 2)
      .select("id_a", "id_b", "sim")
      .as[(Long, Long, Double)]
      .collect()
      .toSeq
    val keys = lsh.map(p => (p._1, p._2))
    assert(keys.distinct.length == keys.length, "a pair matching in BOTH tables must be emitted once")
    assert(lsh.nonEmpty)
    // every emitted pair must appear in the exhaustive >= threshold set with
    // the identical cosine (candidates only ever shrink the set)
    val exhaustive = emb
      .as("a")
      .crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id"),
        col("b.vec_id"),
        CosineSimilarity.cosine(col("a.embedding"), col("b.embedding")).as("sim"),
      )
      .filter(col("sim") >= 0.35)
      .as[(Long, Long, Double)]
      .collect()
      .map(p => (p._1, p._2) -> p._3)
      .toMap
    lsh.foreach { case (a, b, s) =>
      assert(exhaustive.get((a, b)).contains(s), s"pair ($a,$b) not an exact >=0.35 pair with sim $s")
    }
  }

  test("exactDedup keeps one survivor per duplicated text") {
    val docs = Seq(
      (1L, "aa bb"), (2L, "aa bb"), (3L, "cc"), (4L, "aa bb"), (5L, "cc"),
    ).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(docs, col("text"), col("doc_id")).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    val groups = Dedup.exactGroups(docs, col("text"), col("doc_id"))
      .select("n_copies", "keep_id").as[(Long, Long)].collect().toSet
    assert(groups == Set((3L, 1L), (2L, 3L)))
  }

  test("hammingPairsRotated: recovers prefix-flipped pairs a single band misses, exactly once") {
    import graft.operators.Dedup
    // sig A and B differ in ONE bit inside the hi-half's 12-bit prefix
    // (bit 62) — the single-band blind spot; C and D differ in one bit
    // inside the SECOND band's window (bit 30, the lo half's prefix);
    // E is far from everything.
    val a = 0x7000000000000001L
    val b = a ^ (1L << 62)
    val c = 0x0123456712345678L
    val d = c ^ (1L << 30)
    val e = -1L ^ a // far in many bits
    val sigs = Seq((1L, a), (2L, b), (3L, c), (4L, d), (5L, e)).toDF("id", "sig")
    def pairs(rotations: Int) = Dedup
      .hammingPairsRotated(sigs, "id", "sig", prefixBits = 12, maxDist = 2, rotations = rotations)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSeq
    // one band: (1,2) lost to the prefix flip, (3,4) found (flip is
    // outside band 0's window)
    assert(pairs(1) == Seq((3L, 4L)), s"single band must miss the prefix-flipped pair: ${pairs(1)}")
    // two bands: both found, each exactly once — (3,4) matches BOTH
    // bands (band 0's window is clean) and must not duplicate
    val two = pairs(2)
    assert(two.sorted == Seq((1L, 2L), (3L, 4L)), s"two bands must recover both, exactly once: $two")
  }

  test("simhashPairs finds identical token sets at distance 0") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "totally different words here"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash LSH candidates catch high-jaccard pairs") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"), // identical -> must be caught
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8"),
    ).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    // disjoint token sets: deterministic hashes make non-collision checkable
    assert(!cands.contains((1L, 3L)) && !cands.contains((2L, 3L)), s"unrelated docs collided: $cands")
    val verified = Dedup.jaccardVerify(Dedup.minhashCandidates(docs, "doc_id", "text"), docs, "doc_id", "text", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(verified == Set((1L, 2L)))
  }

  test("asOf join: latest dim state at fact time, inclusive ties, null before first") {
    import graft.operators.AsOfJoin
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val dim = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 200.0),
      (2L, ts("2024-01-01 11:00:00"), 999.0),
    ).toDF("k", "ts", "state")
    val fact = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")), // before any dim -> null
      (11L, 1L, ts("2024-01-01 10:00:00")), // tie -> inclusive (100.0)
      (12L, 1L, ts("2024-01-01 11:59:00")), // between -> 100.0
      (13L, 1L, ts("2024-01-01 13:00:00")), // after last -> 200.0
      (14L, 3L, ts("2024-01-01 13:00:00")), // key with no dim -> null
    ).toDF("id", "k", "ts")
    val got = AsOfJoin
      .asOf(fact, dim, Seq("k"), "ts", "ts", Seq("state"))
      .select($"id", $"state")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    assert(got == Map(10L -> None, 11L -> Some(100.0), 12L -> Some(100.0), 13L -> Some(200.0), 14L -> None))
  }

  test("asOfForward join: NEXT dim state at/after fact time, inclusive ties, null after last") {
    import graft.operators.AsOfJoin
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val dim = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 200.0),
      (2L, ts("2024-01-01 11:00:00"), 999.0),
    ).toDF("k", "ts", "state")
    val fact = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")), // before any dim -> 100.0 (next)
      (11L, 1L, ts("2024-01-01 12:00:00")), // tie -> inclusive (200.0)
      (12L, 1L, ts("2024-01-01 10:01:00")), // between -> 200.0
      (13L, 1L, ts("2024-01-01 13:00:00")), // after last -> null
      (14L, 3L, ts("2024-01-01 13:00:00")), // key with no dim -> null
    ).toDF("id", "k", "ts")
    val got = AsOfJoin
      .asOfForward(fact, dim, Seq("k"), "ts", "ts", Seq("state"))
      .select($"id", $"state")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    assert(got == Map(10L -> Some(100.0), 11L -> Some(200.0), 12L -> Some(200.0), 13L -> None, 14L -> None))
  }

  test("asOf join: SQL null semantics — null dim values win atomically, null keys/ts never match") {
    import graft.operators.AsOfJoin
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val dim = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), Some(100.0)),
      (Some(1L), Some(ts("2024-01-01 12:00:00")), None), // genuinely NULL state
      (Some(2L), None, Some(42.0)), // NULL dim ts: must never match
      (None, Some(ts("2024-01-01 10:00:00")), Some(7.0)), // NULL key: must never match
    ).toDF("k", "ts", "state")
    val fact = Seq(
      (20L, Some(1L), ts("2024-01-01 13:00:00")), // matches the 12:00 row -> NULL, not stale 100.0
      (21L, Some(2L), ts("2024-01-01 13:00:00")), // only a null-ts dim row -> no match
      (22L, None, ts("2024-01-01 13:00:00")), // null fact key -> no match
    ).toDF("id", "k", "ts")
    val got = AsOfJoin
      .asOf(fact, dim, Seq("k"), "ts", "ts", Seq("state"))
      .select($"id", $"state")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    assert(got == Map(20L -> None, 21L -> None, 22L -> None))
    // name-collision precondition is loud, not a silent AnalysisException
    intercept[IllegalArgumentException](
      AsOfJoin.asOf(fact.withColumnRenamed("id", "state"), dim, Seq("k"), "ts", "ts", Seq("state"))
    )
  }

  test("Curate: removes short docs, repetitive docs, and near-dup non-survivors") {
    import graft.operators.Curate
    val long = (1 to 40).map(i => s"word$i").mkString(" ") // ~280 chars, zero repetition
    val docs = Seq(
      (1L, long, "en", "s1"), // survivor of its dup cluster (min id)
      (2L, long, "en", "s1"), // exact dup of 1 -> removed
      (3L, "short", "en", "s1"), // too short -> removed
      (4L, ("spam " * 60).trim, "en", "s1"), // 300 chars but repetition ~1 -> removed
      (5L, long.replace("word1 ", "omega "), "en", "s2"), // near-dup of 1 (J=39/41) in ANOTHER source
    ).toDF("doc_id", "text", "lang", "source")
    // default (LSH) candidates are global: the cross-source near-dup 5 is
    // caught and removed — exactly what block pairing structurally cannot see
    val kept = Curate.curate(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"got $kept")
    // opt-in block variant scopes pairs within `source`: 5 survives
    val keptBlock =
      Curate.curate(docs, Curate.Config(useLsh = false)).select("doc_id").as[Long].collect().toSet
    assert(keptBlock == Set(1L, 5L), s"got $keptBlock")
  }

  test("Decontaminate: shared word n-grams flag leaked docs; eval side broadcasts") {
    import graft.operators.Decontaminate
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), // shares "beta gamma delta" with eval
      (2L, "foo bar baz qux"), // disjoint
      (3L, "tiny doc"), // shorter than n -> structurally clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "zzz beta gamma delta yyy")).toDF("doc_id", "text")
    val rep = Decontaminate.overlaps(corpus, bench, "doc_id", "text", n = 3)
    val got = rep.as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 1), (2L, 0L, 0), (3L, 0L, 0)), s"got $got")
    // the corpus-side join against eval n-grams must be a broadcast join —
    // the corpus never shuffles for the membership probe
    assert(rep.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val clean = Decontaminate.clean(corpus, bench, "doc_id", "text", n = 3)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("connectedComponents: min-label clusters over a known pair graph") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("langId predicts the language with the most stopword hits") {
    val df = Seq(
      "the cat and the dog is in a tree of it",
      "el gato y la casa de que un dia en los",
      "qqq www eee",
    ).toDF("text")
    val got = df.select(TextAnalysis.langId(TextAnalysis.wsTokens(col("text"))).as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("charShingles: sorted distinct n-grams; short strings degrade to one shingle") {
    val got = Seq("abcdef", "ab", "aaaa").toDF("t")
      .select(TextAnalysis.charShingles(col("t"), 3).as("s")).as[Seq[String]].collect()
    assert(got(0) == Seq("abc", "bcd", "cde", "def"))
    assert(got(1) == Seq("ab"))
    assert(got(2) == Seq("aaa")) // repeated trigrams dedup to one
  }

  test("TopKAggregator == window top-k, but with partial (map-side) aggregation") {
    import graft.functions.TopKAggregator
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val typed = li
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"))
      .as[(String, Double, Long)]
    val viaAgg = typed
      .groupByKey(_._1)
      .mapValues { case (_, price, id) => (price, id) }
      .agg(new TopKAggregator(3).toColumn)
      .collect()
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
    val viaWindow = li
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"))
      .as[(String, Double, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(r => (r._2, r._3)).toSeq }
    assert(viaAgg.keySet == viaWindow.keySet)
    viaAgg.foreach { case (k, topk) => assert(topk == viaWindow(k), s"group $k") }
    // partial aggregation: the plan must show ObjectHashAggregate partial+final
    val plan = typed
      .groupByKey(_._1)
      .mapValues { case (_, price, id) => (price, id) }
      .agg(new TopKAggregator(3).toColumn)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("Aggregate"), plan)
  }

  test("minhash: array-expression form and explode-agg form agree") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(100)
    val viaArray = docs
      .select(col("doc_id") +: Hashing.minhash(TextAnalysis.tokenSet(col("text")), 4).zipWithIndex.map {
        case (c, i) => c.as(s"mh$i")
      }: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong(_)))
      .toMap
    val viaAgg = Dedup
      .withMinhash(docs.select(col("doc_id"), col("text")), Seq("doc_id"), col("text"), 4)
      .collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong(_)))
      .toMap
    assert(viaArray == viaAgg)
  }

  test("fingerprint is stable and order-sensitive") {
    val got = Seq("ab", "ba", "ab").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("f")).as[Long].collect()
    assert(got(0) == got(2))
    assert(got(0) != got(1))
    assert(got(0) == ("ab".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % Hashing.P)))
  }

  /** JVM model of [[Hashing.hash64]] (md5 prefix, 60 bits). */
  private def modelHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Independent JVM winnowing model: gram hashes, window minima with the
    * rightmost-minimal tie rule, distinct (pos, hash) selections.
    */
  private def modelWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val tk = text.trim.split("\\s+").toSeq
    if (tk.size < k + w - 1) Set.empty
    else {
      val gh = (0 to tk.size - k).map(i => modelHash(tk.slice(i, i + k).mkString(" ")))
      (0 to gh.size - w).flatMap { s =>
        val win = (s until s + w).map(p => (gh(p), p))
        val minH = win.map(_._1).min
        val pos = win.filter(_._1 == minH).map(_._2).max // rightmost minimal
        Some((pos + 1, minH)) // operator positions are 1-based
      }.toSet
    }
  }

  test("Winnow.fingerprints == independent JVM model on real corpus docs") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(20).cache()
    val got = graft.operators.Winnow
      .fingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(2), r.getLong(3))).toSet).toMap
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> modelWinnow(r.getString(1), 3, 4))
      .filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("Winnow guarantee: a shared k+w-1 token run yields a shared fingerprint hash") {
    // Distinct surroundings, one shared 6-token run (k=3, w=4).
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve"),
    ).toDF("doc_id", "text")
    val fp = graft.operators.Winnow.fingerprints(docs, "doc_id", "text", k = 3, w = 4)
    val byDoc = fp.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).toSet)
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty)
  }

  test("prefixJaccardJoin == brute-force threshold join on the real corpus (exact recall)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").cache()
    val got = graft.operators.Dedup
      .prefixJaccardJoin(docs, "doc_id", "text", thresholdNum = 1, thresholdDen = 2, shingleN = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // Brute force: every (a < b) pair over the same trigram-shingle sets.
    val toks = docs
      .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("__t"))
      .select(col("doc_id"), sort_array(array_distinct(TextAnalysis.wordNgramHashesFromTokens(col("__t"), 3))).as("toks"))
      .filter(size(col("toks")) > 0)
    val brute = toks
      .as("l")
      .join(toks.as("r"), col("l.doc_id") < col("r.doc_id"))
      .withColumn("jaccard", Dedup.jaccard(col("l.toks"), col("r.toks")))
      .filter(col("jaccard") >= 0.5)
      .select(col("l.doc_id"), col("r.doc_id"), col("jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("prefixJaccardJoin: an over-shared prefix token fails loudly, never goes quadratic") {
    val docs = (1L to 10L).map(i => (i, "same tokens in every doc here")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      graft.operators.Dedup
        .prefixJaccardJoin(docs, "doc_id", "text", thresholdNum = 4, thresholdDen = 5, maxPrefixBucketRows = 5L)
        .count()
    }
    assert(e.getMessage.contains("maxPrefixBucketRows"))
  }

  test("globalRank == single-partition ROW_NUMBER over the same total order") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), substring(trim(col("text")), 1, 16).as("k"))
    val got = graft.operators.Dedup
      .globalRank(docs, Seq(col("k"), col("doc_id")), substring(col("k"), 1, 4))
      .select(col("doc_id"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("doc_id"))
    val want = docs.withColumn("rank", row_number().over(w))
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(got == want)
  }

  test("sortedNeighborhoodPairs: only rank-adjacent qualifying pairs, dist bounded by window") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val out = graft.operators.Dedup
      .sortedNeighborhoodPairs(docs, "doc_id", "text", substring(trim(col("text")), 1, 16), windowSize = 5, threshold = 0.8)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 4))
    // cross-check one model invariant: every emitted pair really clears the
    // threshold on the exact token sets
    assert(out.forall(_.getDouble(3) >= 0.8))
    // and the pair set is a subset of what a width-10 window finds
    val wider = graft.operators.Dedup
      .sortedNeighborhoodPairs(docs, "doc_id", "text", substring(trim(col("text")), 1, 16), windowSize = 10, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(wider))
  }

  test("Resolve.scorePairs: hand-computed weights, null-safe agreement, near-miss band") {
    val rows = Seq(
      (1L, "b", Some(10L), "xyz"),
      (2L, "b", Some(10L), "xyz"), // agrees with 1 on both: 2 + 3 = 5 -> matched
      (3L, "b", Some(10L), "abc"), // band only: 2 -> below minScore, dropped
      (4L, "b", None, "xyz"),      // suffix only: 3 -> near-miss, not matched
      (5L, "b", None, "qqq"),      // null band agrees with 4's null: 2 -> dropped
    ).toDF("id", "blk", "band", "suffix")
    val out = graft.operators.Resolve
      .scorePairs(rows, "id", Seq("blk"), Seq((col("band"), 2), (col("suffix"), 3)), threshold = 5, minScore = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getBoolean(3)))
      .toMap
    assert(out == Map(
      (1L, 2L) -> ((5, true)),
      (1L, 4L) -> ((3, false)),
      (2L, 4L) -> ((3, false)),
    ))
  }

  test("Resolve.scorePairs: oversized block fails loudly before pairing") {
    val rows = (1L to 10L).map(i => (i, "same")).toDF("id", "blk")
    val e = intercept[IllegalStateException] {
      graft.operators.Resolve
        .scorePairs(rows, "id", Seq("blk"), Seq((lit(1), 1)), threshold = 1, minScore = 1, maxBlockRows = 5L)
        .count()
    }
    assert(e.getMessage.contains("maxBlockRows"))
  }

  test("pqCodes: m=1 degenerates to plain train+assign; full m codes every vector in range") {
    import graft.operators.IvfIndex
    val emb = spark.read.parquet(sf() + "/embeddings.parquet").cache()
    val cb = IvfIndex.train(emb, "vec_id", "embedding", nlist = 8, iters = 2)
    val direct = IvfIndex.assign(emb, cb, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pq1 = IvfIndex.pqCodes(emb, "vec_id", "embedding", m = 1, subDim = 64, nlist = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(pq1 == direct)
    val pq4 = IvfIndex.pqCodes(emb, "vec_id", "embedding", m = 4, subDim = 16, nlist = 8, iters = 1).collect()
    val n = emb.count()
    assert(pq4.length == n * 4)
    assert(pq4.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 8))
  }

  test("pqTrainAll: the single-pass trainer is VALUE-identical to per-subspace train") {
    // the refactor contract behind the iters+1 scan bound (q248/q250 pin it
    // through the oracle; this pins it directly, codebook by codebook)
    import graft.operators.IvfIndex
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val single = IvfIndex.pqTrainAll(emb, "vec_id", "embedding", m = 4, subDim = 16, nlist = 8, iters = 2)
    val perSub = (0 until 4).map { sub =>
      IvfIndex
        .train(
          emb.select(col("vec_id"), slice(col("embedding"), sub * 16 + 1, 16).as("__sv")),
          "vec_id", "__sv", nlist = 8, iters = 2,
        )
        .orderBy(col("centroid_id"))
        .as[(Int, Seq[Float])]
        .collect()
        .toSeq
    }
    assert(single == perSub, "single-pass and per-subspace Lloyd must agree exactly")
  }

  test("appendToAdcIndex: two frozen-codebook appends equal one encode of the union") {
    import graft.operators.IvfIndex
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val a = emb.filter(col("vec_id") % 3 === 0)
    val b = emb.filter(col("vec_id") % 3 === 1)
    val c = emb.filter(col("vec_id") % 3 === 2)
    val centroids = IvfIndex.train(a, "vec_id", "embedding", nlist = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_append_spec").toString
    IvfIndex.saveAdcIndex(a, "vec_id", "embedding", centroids,
      m = 4, subDim = 16, pqNlist = 4, pqIters = 1, dir = dir)
    IvfIndex.appendToAdcIndex(spark, dir, b, "vec_id", "embedding", m = 4)
    IvfIndex.appendToAdcIndex(spark, dir, c, "vec_id", "embedding", m = 4)
    val stored = spark.read.parquet(s"$dir/codes")
      .select(col("neighbor_id"), col("centroid_id"), col("codes"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    // expected: one encode pass over the union with the SAME frozen artifacts
    val cbs = IvfIndex.pqTrainAll(a, "vec_id", "embedding", m = 4, subDim = 16, nlist = 4, iters = 1)
    val expected = IvfIndex
      .adcEncode(emb, "vec_id", "embedding", centroids, cbs, m = 4, subDim = 16)
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(stored == expected, "incremental appends must land the exact union encode")
    assert(stored.size == emb.count(), "every vector present exactly once")
    graft.streaming.EventStream.registerDeleteOnExit(new java.io.File(dir))
  }

  test("Winnow.overlapPairs: common-fingerprint drop suppresses ubiquitous grams") {
    // Every doc shares the same text -> every fingerprint is in all 4 docs;
    // with maxDocsPerFp = 3 nothing survives, with 4 all pairs match.
    val docs = (1L to 4L).map(i => (i, "a b c d e f g h i j")).toDF("doc_id", "text")
    val none = graft.operators.Winnow
      .overlapPairs(docs, "doc_id", "text", k = 3, w = 4, minShared = 1, maxDocsPerFp = 3)
    assert(none.count() == 0L)
    val all = graft.operators.Winnow
      .overlapPairs(docs, "doc_id", "text", k = 3, w = 4, minShared = 1, maxDocsPerFp = 4)
    assert(all.count() == 6L) // C(4,2)
  }

  test("recallReport: a cross-cluster true neighbor halves recall at nprobe=1, restored at 2") {
    import graft.operators.IvfIndex
    val corpus = Seq(
      (1L, Seq(1f, 0.1f, 0f, 0f)),
      (2L, Seq(1f, 0.2f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0.1f)),
      (4L, Seq(0f, 0f, 1f, 0.2f)),
    ).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1f, 0f, 0f, 0f)), (1, Seq(0f, 0f, 1f, 0f))).toDF("centroid_id", "centroid")
    val q1 = corpus.filter(col("vec_id") === 1)
    // exact top-2 for query 1 = {2 (same cluster), 3 (sim-0 tie -> lowest id)};
    // nprobe=1 only sees cell 0 -> candidates {2} -> 1 hit of 2.
    val r1 = IvfIndex.recallReport(corpus, q1, "vec_id", "embedding", cents, nprobe = 1, k = 2).head()
    assert(r1.getLong(1) == 1L && r1.getDouble(2) == 0.5)
    val r2 = IvfIndex.recallReport(corpus, q1, "vec_id", "embedding", cents, nprobe = 2, k = 2).head()
    assert(r2.getLong(1) == 2L && r2.getDouble(2) == 1.0)
  }

  test("randomProjection: exact signed integer sums over per-micro quantized vectors") {
    val df = Seq((1L, Seq(0.5f, -0.25f, 0.125f)), (2L, Seq(1f, 1f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, "vec_id", "embedding", dim = 3, outDim = 2)
      .orderBy("vec_id").collect()
    val signs = Similarity.rpSigns(2, 3)
    val quant = Seq(Seq(500000L, -250000L, 125000L), Seq(1000000L, 1000000L, 1000000L))
    for ((row, q) <- out.zip(quant); i <- 0 until 2) {
      val expect = q.zip(signs(i)).map { case (v, s) => v * s }.sum
      assert(row.getLong(i + 1) == expect, s"vec ${row.getLong(0)} p$i")
    }
    // The hash-parity matrix is non-degenerate at production width.
    val wide = Similarity.rpSigns(8, 64).flatten
    assert(wide.contains(1) && wide.contains(-1))
  }

  test("covarianceMatrix: 2-D one-hot closed form (exact +-0.25) and cell count") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val m = Similarity.covarianceMatrix(df, "embedding", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(m.size == 3)
    assert(m((0, 0)) == 0.25 && m((1, 1)) == 0.25 && m((0, 1)) == -0.25)
  }

  test("goldenRecords: transitive cluster, first-non-null survivorship, singleton carry") {
    import graft.operators.Resolve
    val ents = Seq(
      (1L, null.asInstanceOf[String], 10.0),
      (2L, "bob", 30.0),
      (3L, "carl", 20.0),
      (4L, "dora", 5.0),
    ).toDF("id", "name", "bal")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Resolve.goldenRecords(ents, "id", pairs, fuseFirst = Seq("name"), fuseMax = Seq("bal"))
      .orderBy("comp").collect()
    // cluster {1,2,3}: name = first NON-NULL by id = "bob" (id 1 is null), bal = max.
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 3L)
    assert(out(0).getString(2) == "bob" && out(0).getDouble(3) == 30.0)
    // unmatched id 4 survives as its own cluster.
    assert(out(1).getLong(0) == 4L && out(1).getLong(1) == 1L && out(1).getString(2) == "dora")
  }

  test("buildAnnIndex: card invariants on the real corpus") {
    import graft.operators.Assemble
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val n = emb.count()
    val card = Assemble.buildAnnIndex(emb, "vec_id", "embedding",
      nlist = 8, m = 4, subDim = 16, pqNlist = 8, pqIters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("vectors") == n)
    assert(card("pq_code_rows") == n * 4)
    assert(card("cells_nonempty") >= 1 && card("cells_nonempty") <= 8)
    assert(card("max_cell_rows") <= n)
    assert(card("pq_codes_used") >= 4 && card("pq_codes_used") <= 32)
  }

  test("clusterQuality: hand-computed cohesion quantization and zero cross-cluster separation") {
    import graft.operators.IvfIndex
    val corpus = Seq(
      (1L, Seq(1f, 0.1f, 0f, 0f)), (2L, Seq(1f, 0.2f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0.1f)), (4L, Seq(0f, 0f, 1f, 0.2f)),
    ).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1f, 0f, 0f, 0f)), (1, Seq(0f, 0f, 1f, 0f))).toDF("centroid_id", "centroid")
    def q(sim: Double) = math.floor(sim * 1000000.0 + 0.5).toLong
    val s1 = q(1.0 / math.sqrt(1.0 + 0.1f * 0.1f)) // cos((1,.1,0,0),(1,0,0,0))
    val s2 = q(1.0 / math.sqrt(1.0 + 0.2f * 0.2f))
    val out = IvfIndex.clusterQuality(corpus, "vec_id", "embedding", cents)
      .orderBy("centroid_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L && out(0).getLong(3) == math.min(s1, s2))
    assert(out(0).getDouble(2) == (s1 + s2).toDouble / 2)
    // orthogonal centroids: nearest-other-centroid sim quantizes to 0.
    assert(out(0).getLong(4) == 0L && out(1).getLong(4) == 0L)
  }

  test("attributionReport: shared-trigram counts, rank order, boilerplate-gram drop") {
    import graft.operators.Decontaminate
    val evalDf = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma epsilon"),   // shares 1 trigram (alpha beta gamma)
      (2L, "x alpha beta gamma delta y"), // shares 2 trigrams
      (3L, "nothing in common here"),
    ).toDF("doc_id", "text")
    val out = Decontaminate
      .attributionReport(corpus, evalDf, "doc_id", "text", n = 3, k = 3, maxDf = 50L)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1, 2L, 2L), (2, 1L, 1L)))
    // with maxDf = 1 the trigram shared by docs 1 AND 2 is boilerplate:
    // doc 1 loses its only link; doc 2 keeps its unique gram.
    val tight = Decontaminate
      .attributionReport(corpus, evalDf, "doc_id", "text", n = 3, k = 3, maxDf = 1L)
      .collect()
    assert(tight.map(r => (r.getLong(2), r.getLong(3))).toSeq == Seq((2L, 1L)))
  }

  test("thresholdSweep: counts match direct pair materializations at each threshold") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val sweep = Dedup
      .thresholdSweep(docs, "doc_id", "text", k = 8, bands = 4, thresholdPcts = Seq(70, 80, 90))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (t <- Seq(70, 80, 90)) {
      val direct = Dedup
        .minhashNearDupPairs(docs, "doc_id", "text", 8, 4, threshold = t / 100.0, minAgree = 4)
      val nPairs = direct.count()
      val nDocs = direct.select(col("id_a").as("d")).unionAll(direct.select(col("id_b").as("d")))
        .distinct().count()
      assert(sweep(t) == (nPairs, nDocs), s"threshold $t")
    }
    // monotone: raising the threshold never adds pairs.
    assert(sweep(70)._1 >= sweep(80)._1 && sweep(80)._1 >= sweep(90)._1)
  }

  test("pairDiagnostics: identical docs score (1.0, hamming 0, ratio 1000); containment scores low ratio") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"),
    ).toDF("doc_id", "text")
    val out = Dedup.pairDiagnostics(docs, "doc_id", "text", k = 8, bands = 4, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3), r.getLong(4))).toMap
    val dup = out((1L, 2L))
    assert(dup._1 == 1.0 && dup._2 == 0 && dup._3 == 1000L)
    // 1 ⊂ 3: jaccard 8/16 = 0.5, ratio 8*1000 div 16 = 500.
    out.get((1L, 3L)).foreach { c => assert(c._1 == 0.5 && c._3 == 500L) }
  }

  test("oodCensus and normReport: zero vectors and far members are flagged exactly") {
    import graft.operators.IvfIndex
    val corpus = Seq(
      (1L, 0, Seq(1f, 0f, 0f, 0f)),      // on-centroid
      (2L, 0, Seq(1f, 0.1f, 0f, 0f)),    // near
      (3L, 0, Seq(1f, 1f, 1f, 1f)),      // cos to e1 = 0.5 < 0.9 -> OOD
      (4L, 1, Seq(0f, 0f, 0f, 0f)),      // zero vector
    ).toDF("vec_id", "label", "embedding")
    val cents = Seq((0, Seq(1f, 0f, 0f, 0f)), (1, Seq(0f, 0f, 1f, 0f))).toDF("centroid_id", "centroid")
    val ood = IvfIndex.oodCensus(corpus.filter(col("vec_id") =!= 4), "vec_id", "embedding", cents, 900000L)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(ood(0) == (3L, 1L, 333L)) // only vec 3 below the fence
    val norms = graft.operators.Similarity.normReport(corpus, "label", "embedding")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(norms(1) == (1L, 1L, 0L))  // label 1: the zero vector, flagged
    assert(norms(0)._2 == 0L)          // label 0: no zero vectors
  }

  test("bloomFppReport: no false negatives by construction; tiny array forces measurable fpp") {
    import graft.operators.Decontaminate
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val corpus = docs.filter(col("source") =!= "src0")
    val ev = docs.filter(col("source") === "src0")
    val r = Decontaminate.bloomFppReport(corpus, ev, "doc_id", "text", n = 3).head()
    val (nGrams, nPass, nTrue, nFp) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nPass >= nTrue && nFp == nPass - nTrue) // every true member passes
    assert(nGrams > nTrue)
    // a 64-bit array saturates: nearly everything passes -> fpp ~ 1e6.
    val tiny = Decontaminate.bloomFppReport(corpus, ev, "doc_id", "text", n = 3, bits = 64, probes = 3).head()
    assert(tiny.getLong(4) > r.getLong(4))
  }

  test("asOfWithin: fresh state enriches, stale state nulls - and never falls back further") {
    import graft.operators.AsOfJoin
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val fact = Seq((1L, 1L, ts(100)), (2L, 2L, ts(100)), (3L, 3L, ts(100)))
      .toDF("fid", "k", "fts")
    val dim = Seq(
      (1L, ts(90), 9.0),   // 10 s old: fresh at tol 20 s
      (2L, ts(50), 5.0),   // 50 s old: stale
      (2L, ts(40), 4.0),   // even older: must NOT be used as fallback
    ).toDF("k", "dts", "v")
    val out = AsOfJoin
      .asOfWithin(fact, dim, Seq("k"), "fts", "dts", Seq("v"), toleranceMicros = 20L * 1000000L)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L) == Some(9.0))
    assert(out(2L) == None) // the as-of match (t=50) is stale; no fallback search
    assert(out(3L) == None) // no dim at all
  }

  test("clusterTightness: a transitive chain scores loose, exact dups score 1000-tight") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),        // exact dup of 1
      (3L, "a b c d e f g h i k"),        // near 1/2, bridges
      (4L, "completely different text here now one two"),
    ).toDF("doc_id", "text")
    val out = Dedup.clusterTightness(docs, "doc_id", "text", k = 8, bands = 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    val (members, minJ, meanJ) = out(1L)
    assert(members == 3L)
    assert(minJ < 1000L && meanJ < 1000.0) // the bridge pair drags tightness down
    assert(!out.contains(4L))              // singletons have no pairs, no row
  }

  test("bbitCalibration: exact dups estimate 1000; the correction floors chance agreement at 0") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "k l m n o p q r s t u"),
      (4L, "k l m n o p q r s t u"),
    ).toDF("doc_id", "text")
    val out = Dedup.bbitCalibration(docs, "doc_id", "text", k = 8, bands = 4, b = 2, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // exact dups: all 8 two-bit sigs agree -> est = ((8*4-8)*1000) div (8*3) = 1000.
    assert(out((1L, 2L)) == (1000L, 1000L))
    assert(out((3L, 4L)) == (1000L, 1000L))
    assert(out.values.forall { case (_, est) => est >= 0L && est <= 1000L })
  }

  test("hapaxReport: hand-computed vocab, hapax share, totals") {
    import graft.operators.Quality
    val df = Seq(("s1", "a a b c"), ("s1", "c d"), ("s2", "x x x")).toDF("source", "text")
    val out = Quality.hapaxReport(df, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // s1: vocab {a,b,c,d}; hapax {b,d}; 6 tokens; 2*1000 div 4 = 500.
    assert(out("s1") == (4L, 2L, 6L, 500L))
    assert(out("s2") == (1L, 0L, 3L, 0L))
  }

  test("activityGini: equal counts give 0; whale distribution matches the hand-computed rank form") {
    import graft.operators.EventAnalytics
    import java.sql.Timestamp
    def rows(tpe: String, u: Long, n: Int) =
      Seq.fill(n)((tpe, u, Timestamp.valueOf("2024-01-01 00:00:00")))
    // flat: 3 users x 2 events -> gini 0; whale: counts 1/1/98 ->
    // ranks 1,2,3; num = 2*(1+2+294) - 4*100 = 194; 194e6 div 300 = 646666.
    val df = (rows("flat", 1, 2) ++ rows("flat", 2, 2) ++ rows("flat", 3, 2) ++
      rows("whale", 1, 1) ++ rows("whale", 2, 1) ++ rows("whale", 3, 98))
      .toDF("event_type", "user_id", "ts")
    val out = EventAnalytics.activityGini(df, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("flat") == (3L, 6L, 0L))
    assert(out("whale") == (3L, 100L, 646666L))
  }

  test("stickinessReport: hand-computed DAU/WAU on a two-user timeline") {
    import graft.operators.EventAnalytics
    import java.sql.Timestamp
    // u1 active day0 and day3, u2 active day0 only (days are epoch-based;
    // any fixed date works since only day deltas matter).
    def t(day: Int) = Timestamp.valueOf(s"2024-01-0${day + 1} 12:00:00")
    val df = Seq((1L, t(0)), (1L, t(3)), (2L, t(0))).toDF("user_id", "ts")
    val out = EventAnalytics.stickinessReport(df, "user_id", "ts", window = 7)
      .orderBy("day")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // day0: dau 2, wau 2 (both users' day-0 activity covers day 0) -> 1000
    // day3: dau 1, wau 2 (u2's day-0 activity still covers day 3) -> 500
    assert(out.toSeq == Seq((2L, 2L, 1000L), (1L, 2L, 500L)))
  }

  test("pathTrigrams: trigrams read off the (ts, id)-ordered stream per user") {
    import graft.operators.EventAnalytics
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val df = Seq(
      (1L, t(0), 10L, "a"), (1L, t(1), 11L, "b"), (1L, t(2), 12L, "c"), (1L, t(3), 13L, "a"),
      (2L, t(0), 20L, "a"), (2L, t(1), 21L, "b"), (2L, t(2), 22L, "c"),
      (3L, t(0), 30L, "x"), (3L, t(1), 31L, "y"), // too short: no trigram
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = EventAnalytics.pathTrigrams(df, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(out == Map(("a", "b", "c") -> 2L, ("b", "c", "a") -> 1L))
  }

  test("correlationMatrix: one-hot 2-D closed form (off-diagonal exactly -1) and diagonal ~1") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val m = Similarity.correlationMatrix(df, "embedding", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    // var = 0.25 each -> sqrt exact 0.5, product exact 0.25: corr hits -1 exactly
    assert(m((0, 1)) == -1.0)
    assert(math.abs(m((0, 0)) - 1.0) < 1e-12 && math.abs(m((1, 1)) - 1.0) < 1e-12)
  }

  test("keyHashSkewAudit: buckets partition the rows and fair loads read 1000-ish per-mille") {
    import graft.operators.SkewJoin
    val df = (1L to 1000L).map(i => (i, s"u$i")).toDF("id", "k")
    val out = SkewJoin.keyHashSkewAudit(df, col("k"), buckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).sum == 1000L)
    // md5 is uniform: every bucket within 3x of fair on 1000 rows
    assert(out.forall { case (_, _, load) => load > 333 && load < 3000 })
  }

  test("pcaTopComponent: 2-D anti-correlated closed form (eigenvalue 1/2, loadings +-1/sqrt(2))") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.pcaTopComponent(df, "embedding", 2, iters = 12)
      .orderBy("i").collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // C = [[.25,-.25],[-.25,.25]]: top eigenvector (1,-1)/sqrt(2), lambda .5
    assert(out.length == 2)
    val Array((_, l0, ev), (_, l1, _)) = out
    assert(math.abs(math.abs(l0) - 707107L) <= 2 && math.abs(math.abs(l1) - 707107L) <= 2)
    assert(l0.sign == -l1.sign && l0 != 0)
    assert(math.abs(ev - 0.5) < 1e-3)
  }

  test("pcaProjectionCensus: PC1 separates the two one-hot labels with mirrored-sign means") {
    val df = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 1), (3L, Seq(1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.pcaProjectionCensus(df, "embedding", "label", 2, iters = 12)
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.length == 2)
    val (l0, l1) = (out(0), out(1))
    assert(l0._2 == 2 && l1._2 == 1)
    // opposite sides of the dominant axis; per-label min == max (identical vectors)
    assert(l0._5.sign == -l1._5.sign && l0._5 != 0.0)
    assert(l0._3 == l0._4 && l1._3 == l1._4)
  }

  test("connectedComponentsAdaptive: both dispatch arms label identically across the threshold") {
    // two components: a triangle {1,2,3} and an edge {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)).toDF("src", "dst")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold above the edge count -> label propagation; below -> star
    assert(labels(Dedup.connectedComponentsAdaptive(edges, starThreshold = 100L)) == expect)
    assert(labels(Dedup.connectedComponentsAdaptive(edges, starThreshold = 1L)) == expect)
  }

  test("neardupKeepBest: longest member survives, doc-id breaks ties, dropped census") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // longest of cluster
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (10L, "completely different text about unrelated matters entirely here"),
    ).toDF("doc_id", "text")
    val out = Dedup.neardupKeepBest(docs, "doc_id", "text", 8, 4, 0.8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    // one cluster {1,2,3} labeled by min id 1; doc 2 has 9 tokens, wins
    assert(out.keySet == Set(1L))
    assert(out(1L) == (2L, 9, 3L, 2L))
  }
}
