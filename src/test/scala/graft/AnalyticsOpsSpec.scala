package graft

import graft.operators.{EventAnalytics, Quality, Resolve}
import graft.ops.Lake
import org.apache.spark.sql.functions._

/** Unit tests for the round-9 batch-analytics additions: LOCF gap fill,
  * compaction planning, Z-order keys, equi-depth histograms, blocked
  * edit-distance pairing, and the two-proportion z-test.
  */
class AnalyticsOpsSpec extends SparkSpec {

  import spark.implicits._

  private def tsUs(day: Long, offUs: Long = 0L): java.sql.Timestamp =
    new java.sql.Timestamp((day * 86400000000L + offUs) / 1000L)

  test("gapFillDaily: generated LOCF rows carry the last observed value") {
    // user 1: days 10 (v=1.0, then later-event v=2.0 wins), 13 (v=5.0)
    // user 2: single day 20 (v=9.0) — no gap rows
    val ev = Seq(
      (1L, tsUs(10L), 1.0, 100L),
      (1L, tsUs(10L, 5L), 2.0, 101L), // same µs? no: +5µs, later → carrier
      (1L, tsUs(13L), 5.0, 102L),
      (2L, tsUs(20L), 9.0, 103L),
    ).toDF("user_id", "ts", "value", "event_id")
    val got = EventAnalytics
      .gapFillDaily(ev, "user_id", "ts", "value", "event_id")
      .orderBy("user_id", "day")
      .as[(Long, Long, Double, Boolean)]
      .collect()
      .toSeq
    assert(
      got === Seq(
        (1L, 10L, 2.0, false),
        (1L, 11L, 2.0, true),
        (1L, 12L, 2.0, true),
        (1L, 13L, 5.0, false),
        (2L, 20L, 9.0, false),
      )
    )
  }

  test("gapFillDaily: same-timestamp tie broken by event_id") {
    val ev = Seq(
      (1L, tsUs(10L), 1.0, 200L),
      (1L, tsUs(10L), 7.0, 201L), // same µs, higher event_id → carrier
    ).toDF("user_id", "ts", "value", "event_id")
    val got = EventAnalytics.gapFillDaily(ev, "user_id", "ts", "value", "event_id").collect()
    assert(got.length === 1 && got.head.getDouble(2) === 7.0)
  }

  test("compactionPlan: greedy cumulative bins — every non-final bin starts below target") {
    val items = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L), ("a", 4L, 300L), // cum 300..1200
      ("b", 1L, 950L), ("b", 2L, 100L), // big item then small
    ).toDF("src", "item", "bytes")
    val got = Lake
      .compactionPlan(items, "src", "item", "bytes", targetBytes = 1000L)
      .orderBy("src", "bin")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
    // a: items at bytes-before 0,300,600,900 → bin 0 ×4 (overshoots to 1200
    //    — "target + one item" bound); b: 0→bin0, 950→bin0 (starts below
    //    the line at 950 < 1000).
    assert(got === Seq(("a", 0L, 4L, 1200L, 1L, 4L), ("b", 0L, 2L, 1050L, 1L, 2L)))
    val two = Lake
      .compactionPlan(items.filter(col("src") === "a"), "src", "item", "bytes", targetBytes = 600L)
      .orderBy("bin")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(two === Seq(("a", 0L, 2L, 600L, 1L, 2L), ("a", 1L, 2L, 600L, 3L, 4L)))
  }

  test("zOrderKey: known interleave; range locality beats lexicographic on the minor dim") {
    // x=5 (101b) lands at odd positions → 100010b; y=3 (011b) at even → 101b.
    val got = Seq((5L, 3L))
      .toDF("x", "y")
      .select(Lake.zOrderKey(col("x"), col("y"), 3).as("z"))
      .as[Long]
      .head()
    assert(got === (34L | 5L))
    // Exhaustive inverse check at 3 bits: the key is a bijection on the 8×8 grid.
    val keys = (0 until 8).flatMap(x => (0 until 8).map(y => (x.toLong, y.toLong)))
    val zs = keys
      .toDF("x", "y")
      .select(Lake.zOrderKey(col("x"), col("y"), 3).as("z"))
      .as[Long]
      .collect()
    assert(zs.distinct.length === 64 && zs.min === 0L && zs.max === 63L)
  }

  test("equiDepthHistogram: deciles of a uniform column are exact; ties collapse") {
    val uniform = (1L to 100L).toDF("v")
    val got = Quality
      .equiDepthHistogram(uniform, col("v"), 10)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(got.map(_._2) === Seq.fill(10)(10L)) // 10 rows per decile
    assert(got.map(_._3) === (1L to 100L by 10).toSeq) // lo = 1, 11, ...
    assert(got.map(_._4) === (10L to 100L by 10).toSeq) // hi = 10, 20, ...
    // Tie mass: [1,1,1,2] at B=2 — value 1's cumulative mass (3/4) crosses
    // the 50% line, so the whole run lands in bucket 2 (cume_dist rule).
    val tied = Seq(1L, 1L, 1L, 2L).toDF("v")
    val t = Quality.equiDepthHistogram(tied, col("v"), 2).orderBy("bucket").collect()
    assert(t.length === 1 && t.head.getLong(0) === 2L && t.head.getLong(1) === 4L)
  }

  test("editDistancePairs: typo pair found; differing prefixes blocked out; big block fails loudly") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // 3 edits, same block
      (3L, "a completely different document body here"),
    ).toDF("doc_id", "text")
    val got = Resolve
      .editDistancePairs(docs, "doc_id", "text", blockChars = 16, compareChars = 64,
        maxLenDiff = 8, maxDist = 4)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)]
      .collect()
      .toSeq
    assert(got === Seq((1L, 2L, 3)))
    val clones = (1L to 50L).map(i => (i, "identical prefix shared by every row " + i))
    val e = intercept[IllegalStateException] {
      Resolve.editDistancePairs(clones.toDF("doc_id", "text"), "doc_id", "text",
        blockChars = 16, compareChars = 64, maxLenDiff = 8, maxDist = 4, maxBlockRows = 10L)
    }
    assert(e.getMessage.contains("maxBlockRows"))
  }

  test("corpusDiff: added/removed/changed/unchanged partition the id universe") {
    import graft.operators.Assemble
    val oldDf = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val newDf = Seq((2L, "beta"), (3L, "gamma CHANGED"), (4L, "delta")).toDF("doc_id", "text")
    val got = Assemble
      .corpusDiff(oldDf, newDf, "doc_id", "text")
      .orderBy("status")
      .as[(String, Long, Long, Long)]
      .collect()
      .toSeq
    assert(
      got === Seq(
        ("added", 1L, 4L, 4L),
        ("changed", 1L, 3L, 3L),
        ("removed", 1L, 1L, 1L),
        ("unchanged", 1L, 2L, 2L),
      )
    )
  }

  test("minhashCalibration: exact-duplicate pair reports n_eq = k and permille = 1000") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "zeta eta theta iota kappa"), // disjoint — never a candidate
    ).toDF("doc_id", "text")
    val got = Dedup
      .minhashCalibration(docs, "doc_id", "text", k = 8, bands = 4)
      .orderBy("n_eq")
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getInt(0) === 8 && r.getLong(1) === 1L) // all 8 components equal, one pair
    assert(r.getDouble(2) === 1000.0 && r.getLong(3) === 1000L && r.getLong(4) === 1000L)
  }

  test("quantileNormalize: per-group percentile ranks; singleton group pins to 0.5") {
    import graft.operators.Quality
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L), // ranks 1,3,2 of 3
      ("b", 4L, 99L), // singleton
    ).toDF("source", "doc_id", "n_chars")
    val got = Quality
      .quantileNormalize(df, "source", col("n_chars"), col("doc_id"))
      .orderBy("doc_id")
      .select("pct")
      .as[Double]
      .collect()
      .toSeq
    assert(got === Seq(0.0, 1.0, 0.5, 0.5))
  }

  test("selectUnderBudget: greedy density prefix; overflow doc and everything after excluded") {
    import graft.operators.Quality
    // densities (permille): id1 2000, id2 1000, id3 500, id4 500
    val docs = Seq(
      (1L, 20L, 10L), // d=2000
      (2L, 10L, 10L), // d=1000
      (3L, 10L, 20L), // d=500
      (4L, 5L, 10L),  // d=500, same bucket as 3, later id
    ).toDF("doc_id", "s", "c")
    def run(budget: Long) = Quality
      .selectUnderBudget(docs, "doc_id", col("s"), col("c"), budget)
      .orderBy("cum_cost")
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
    // budget 40: 10 + 10 + 20 = 40 — id4 (cum 50) overflows and is cut.
    assert(run(40L) === Seq((1L, 20L, 10L, 2000L, 10L), (2L, 10L, 10L, 1000L, 20L), (3L, 10L, 20L, 500L, 40L)))
    // budget 35: id3 (cum 40) overflows — the CHEAPER id4 after it is also
    // excluded (strict greedy prefix, not best-fit).
    assert(run(35L).map(_._1) === Seq(1L, 2L))
  }

  test("trendingOneShot: streaming windowed counts + batch rank == batch top-k") {
    import graft.streaming.EventStream
    val ev = Seq(
      // hour 0: a×3, b×2, c×1, d×1 → top3 = a, b, c (c before d alphabetically)
      (tsUs(1L, 0L), "a", 1.0), (tsUs(1L, 1L), "a", 1.0), (tsUs(1L, 2L), "a", 1.0),
      (tsUs(1L, 3L), "b", 1.0), (tsUs(1L, 4L), "b", 1.0),
      (tsUs(1L, 5L), "c", 1.0), (tsUs(1L, 6L), "d", 1.0),
      // hour 1 (3600s later): only two types
      (tsUs(1L, 3600000000L), "x", 1.0), (tsUs(1L, 3600000001L), "y", 1.0),
    ).toDF("ts", "event_type", "value")
    val got = EventStream
      .trendingOneShot(spark, ev, "graft_trend_spec", k = 3)
      .orderBy("hour", "rnk")
      .select("event_type", "n", "rnk")
      .as[(String, Long, Int)]
      .collect()
      .toSeq
    assert(got === Seq(("a", 3L, 1), ("b", 2L, 2), ("c", 1L, 3), ("x", 1L, 1), ("y", 1L, 2)))
  }

  test("rollingMedian: lower-median rule over partial and full 5-frames") {
    import graft.operators.EventAnalytics
    val ev = Seq(5.0, 1.0, 9.0, 3.0, 7.0).zipWithIndex.map { case (v, i) =>
      (1L, tsUs(1L, i.toLong), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")
    val got = EventAnalytics
      .rollingMedian(ev, "user_id", "ts", "event_id", "value", 5)
      .orderBy("event_id")
      .select("roll_med")
      .as[Double]
      .collect()
      .toSeq
    // frames: [5] [1,5] [1,5,9] [1,3,5,9] [1,3,5,7,9]; lower median picks
    // sorted[(len+1) div 2] (1-based) = 5, 1, 5, 3, 5
    assert(got === Seq(5.0, 1.0, 5.0, 3.0, 5.0))
  }

  test("kmvOverlapMatrix: identical groups estimate J=1, disjoint groups J=0 with exact small-set union") {
    import graft.operators.EventAnalytics
    val rows =
      (1 to 20).map(i => ("a", s"tok$i")) ++ (1 to 20).map(i => ("b", s"tok$i")) ++
        (1 to 10).map(i => ("c", s"other$i"))
    val df  = rows.toDF("g", "tok")
    val got = EventAnalytics
      .kmvOverlapMatrix(df, "g", col("tok"), k = 64)
      .orderBy("src_a", "src_b")
      .collect()
    val ab = got.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getDouble(4) === 1.0 && ab.getDouble(3) === 20.0 && ab.getDouble(5) === 20.0)
    val ac = got.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    assert(ac.getDouble(4) === 0.0 && ac.getDouble(3) === 30.0) // exact union below k
  }

  test("buildSearchIndex: hand-computed index card for a 35-token doc (2 chunks, 8 shared terms)") {
    import graft.operators.Assemble
    import graft.functions.TextAnalysis
    // t1=the t2=and (en stopwords), t3..t35 unique fillers → 35 tokens.
    // chunks (32 tokens, overlap 8, stride 24): c0 = t1..t32, c1 = t25..t35;
    // shared distinct tokens t25..t32 → df=2 terms; minDf=2 keeps exactly those.
    val text = (Seq("the", "and") ++ (3 to 35).map(i => s"tok$i")).mkString(" ")
    val docs = Seq((7L, text), (8L, "too short")).toDF("doc_id", "text")
    val toks = TextAnalysis.wsTokens(col("text"))
    val card = Assemble
      .buildSearchIndex(docs, "doc_id", "text",
        gate = size(toks).between(30, 10000) && TextAnalysis.stopwordHits(toks, "en") >= 2,
        chunkTokens = 32, overlap = 8, minDf = 2, maxPostings = 8L)
      .as[(String, Long)]
      .collect()
      .toMap
    assert(card === Map(
      "docs_in" -> 2L, "docs_gated" -> 1L, "chunks" -> 2L, "chunk_tokens" -> 43L,
      "terms" -> 8L, "postings" -> 16L, "sharded_terms" -> 0L, "max_df" -> 2L,
    ))
  }

  test("psiDrift: identically-distributed days score exactly 0; a shifted day scores positive") {
    import graft.operators.EventAnalytics
    // day 0 and day 1: same 3:1 bucket mix → pd == pg per-micro → psi = 0.
    def day(d: Long, vs: Seq[Double]) = vs.zipWithIndex.map { case (v, i) => (tsUs(d, i.toLong), v) }
    val same = (day(0L, Seq(5.0, 5.0, 5.0, 15.0)) ++ day(1L, Seq(5.0, 5.0, 5.0, 15.0)))
      .toDF("ts", "value")
    val psi0 = EventAnalytics.psiDrift(same, "ts", col("value"), 10.0)
      .select("psi").as[Double].collect().toSeq
    assert(psi0 === Seq(0.0, 0.0))
    val shifted = (day(0L, Seq(5.0, 5.0, 5.0, 15.0)) ++ day(1L, Seq(15.0, 15.0, 15.0, 5.0)))
      .toDF("ts", "value")
    val psis = EventAnalytics.psiDrift(shifted, "ts", col("value"), 10.0)
      .orderBy("day").select("psi").as[Double].collect().toSeq
    assert(psis.forall(_ > 0.0)) // both days deviate from the pooled mix
  }

  test("lshBandReport: exact duplicates land in band 0; attribution sums to the candidate count") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"),
    ).toDF("doc_id", "text")
    val rep = Dedup.lshBandReport(docs, "doc_id", "text", k = 8, bands = 4)
      .as[(Int, Long)].collect().toMap
    assert(rep === Map(0 -> 1L)) // the dup pair agrees on every band; first = 0
    val nCand = Dedup.minhashCandidates(docs, "doc_id", "text", 8, 4).count()
    assert(rep.values.sum === nCand)
  }

  test("transitionLatency: hand-computed median and p90 positions") {
    import graft.operators.EventAnalytics
    // one user, gaps for a->b: 10ms, 30ms, 20ms → sorted 10,20,30 (ms):
    // n=3, median idx (3+1)/2=2 → 20ms; p90 idx (27+9)/10=3 → 30ms.
    val ms = 1000L
    val ev = Seq(
      (1L, 0L * ms, "a"), (1L, 10L * ms, "b"),
      (1L, 100L * ms, "a"), (1L, 130L * ms, "b"),
      (1L, 200L * ms, "a"), (1L, 220L * ms, "b"),
    ).zipWithIndex.map { case ((u, off, t), i) => (u, tsUs(1L, off), i.toLong, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics
      .transitionLatency(ev, "user_id", "ts", "event_id", "event_type")
      .filter(col("type_a") === "a" && col("type_b") === "b")
      .as[(String, String, Long, Long, Long)]
      .head()
    assert(got === (("a", "b", 3L, 20000L, 30000L)))
  }

  test("analyzeColumns: exact card with nulls, double money-rendering, per-type min/max") {
    val df = Seq(
      (Some(3L), 1.5, "b"),
      (Some(1L), 2.25, "a"),
      (None, 1.5, "c"),
    ).toDF("k", "v", "s")
    val got = Lake
      .analyzeColumns(df, Seq("k", "v", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)]
      .collect()
      .toSeq
    assert(
      got === Seq(
        ("k", 3L, 1L, 2L, "1", "3"),
        ("s", 3L, 0L, 3L, "a", "c"),
        ("v", 3L, 0L, 2L, "1.5000", "2.2500"),
      )
    )
  }

  test("nucleusVocab: minimal head prefix reaching p — the crossing token is kept, the tail dropped") {
    import graft.operators.Quality
    // counts a:5 b:3 c:1 d:1 (total 10), p=9/10 → keep a, b, c (mass 9);
    // d's before-mass 9 is not < 9, so the tail is cut exactly at p.
    val docs = Seq(("g", ("a " * 5 + "b " * 3 + "c d").trim)).toDF("source", "text")
    val got = Quality
      .nucleusVocab(docs, "source", "text", 9, 10)
      .orderBy("cum")
      .as[(String, String, Long, Long, Long)]
      .collect()
      .toSeq
    assert(got === Seq(("g", "a", 5L, 5L, 10L), ("g", "b", 3L, 8L, 10L), ("g", "c", 1L, 9L, 10L)))
  }

  test("abTestTwoProportion: hand-computed z; degenerate 100% design yields null z") {
    // arm 0: users 2, 4 (one converts); arm 1: users 1, 3 (both convert).
    val ev = Seq(
      (2L, "buy", 10.0), (2L, "view", 0.0),
      (4L, "view", 0.0),
      (1L, "buy", 10.0),
      (3L, "buy", 10.0),
    ).map { case (u, t, v) => (u, tsUs(1L), t, v) }.toDF("user_id", "ts", "event_type", "value")
    val row = EventAnalytics
      .abTestTwoProportion(ev, "user_id", col("user_id") % 2, col("event_type") === "buy")
      .head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) === ((2L, 1L, 2L, 2L)))
    val (p0, p1, pooled) = (0.5, 1.0, 0.75)
    val expectZ = (p1 - p0) / math.sqrt(pooled * (1 - pooled) * (1.0 / 2 + 1.0 / 2))
    assert(math.abs(row.getDouble(6) - expectZ) < 1e-12)
    val allConv = ev.filter(col("event_type") === "buy")
    val degenerate = EventAnalytics
      .abTestTwoProportion(allConv, "user_id", col("user_id") % 2, col("event_type") === "buy")
      .head()
    assert(degenerate.isNullAt(6))
  }

  test("madOutliers: hand-computed median/MAD, the 3x fence, and a zero-MAD constant group") {
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0))).toDF("grp", "v")
    val out = EventAnalytics.madOutliers(df, "grp", "v", 3.0).orderBy("grp").collect()
    // a: median = 3, devs sorted [0,1,1,2,97] -> mad = 1; only 97 > 3*1.
    assert(out(0).getLong(1) == 5L && out(0).getDouble(2) == 3.0)
    assert(out(0).getDouble(3) == 1.0 && out(0).getLong(4) == 1L)
    // b: constant group -> mad = 0 and the strict fence flags nothing.
    assert(out(1).getLong(1) == 3L && out(1).getDouble(2) == 5.0)
    assert(out(1).getDouble(3) == 0.0 && out(1).getLong(4) == 0L)
  }

  test("decayAttribution: power-of-two decay per gap hour, window and order exclusions") {
    val h = 3600000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val ev = Seq(
      (1L, ts(0L), "view"),            // 2h before conversion -> 1e6 >> 2
      (1L, ts(h / 2), "click"),        // 1.5h before -> gap div h = 1 -> 1e6 >> 1
      (1L, ts(2 * h), "purchase"),
      (2L, ts(0L), "view"),            // 8 days before its conversion: outside window
      (2L, ts(8L * 86400L * 1000000L), "purchase"),
      (3L, ts(5 * h), "view"),         // AFTER the conversion: no credit
      (3L, ts(4 * h), "purchase"),
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics
      .decayAttribution(ev, "user_id", "ts", "event_type",
        touchTypes = Seq("view", "click"), convType = "purchase",
        windowMicros = 7L * 86400L * 1000000L, halfLifeMicros = h)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("view" -> (1L, 250000L), "click" -> (1L, 500000L)))
  }

  test("latenessHistogram: hand-computed running-max lateness and bucketing") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val ev = Seq(
      (1L, ts(10000000L), "a"), (2L, ts(5000000L), "a"),
      (3L, ts(20000000L), "a"), (4L, ts(6000000L), "a"),
    ).toDF("event_id", "ts", "event_type")
    // lateness by arrival (id) order: 0, 5s, 0, 14s; 10s buckets -> {0: n=3 max=5s, 1: n=1 max=14s}
    val out = EventAnalytics
      .latenessHistogram(ev, "event_type", "ts", "event_id", bucketMicros = 10000000L)
      .orderBy("bucket").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 3L && out(0).getLong(3) == 5000000L)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 1L && out(1).getLong(3) == 14000000L)
  }

  test("survivalCurve: hand-computed lifetimes, descending survivors, per-mille") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val day = 86400000000L
    val ev = Seq(
      (1L, ts(0L)), (1L, ts(2 * day)),       // lifetime 2
      (2L, ts(0L)), (2L, ts(2 * day + 1L)),  // lifetime 2 (floor)
      (3L, ts(5 * day)),                     // single event: lifetime 0
    ).toDF("user_id", "ts")
    val out = EventAnalytics.survivalCurve(ev, "user_id", "ts").orderBy("lifetime_days").collect()
    // day 0: 1 user, 3 surviving (all live >= 0), 1000; day 2: 2 users, 2 surviving, 666.
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 1L, 3L, 1000L), (2L, 2L, 2L, 666L)))
  }

  test("mergeableStatsCard: the merged card EQUALS the direct global sketch (KMV merge property)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val merged = EventAnalytics
      .mergeableStatsCard(docs, "source", col("text"), col("n_chars"), k = 16)
      .head()
    val direct = EventAnalytics
      .kmvDistinct(docs.withColumn("g", lit("all")), "g", col("text"), k = 16)
      .head()
    // merged (n_sketch, kth_min, est) must equal the one-level global sketch.
    assert(merged.getLong(4) == direct.getLong(1))
    assert(merged.getLong(5) == direct.getLong(2))
    assert(merged.getDouble(6) == direct.getDouble(3))
    // and the basic stats match direct aggregation.
    val b = docs.agg(count(lit(1)), min(col("n_chars")), max(col("n_chars"))).head()
    assert(merged.getLong(1) == b.getLong(0))
  }

  test("concurrentSessions: sweep-line closed form and cross-hour offset carry") {
    val hr = 3600000000L
    val sameHour = Seq((0L, 10L), (5L, 15L), (20L, 30L)).toDF("start_us", "end_us")
    val a = EventAnalytics.concurrentSessions(sameHour, "start_us", "end_us").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 2L)))
    // [0, 2h] overlaps [1.5h, 1.66h]: hour 1's max of 2 needs hour 0's
    // running level carried across the bucket boundary.
    val crossHour = Seq((0L, 2 * hr), (hr + hr / 2, hr + 2 * hr / 3)).toDF("start_us", "end_us")
    val b = EventAnalytics.concurrentSessions(crossHour, "start_us", "end_us")
      .orderBy("hr").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(b == Seq((0L, 1L), (1L, 2L), (2L, 0L)))
  }

  test("eventsOpsCard: every stat equals its standalone operator on real events") {
    val ev = graft.Tables.events(spark, sf())
    val card = EventAnalytics
      .eventsOpsCard(ev, "user_id", "ts", "event_type", "event_id",
        gapMinutes = 30, stages = Seq("view", "click", "purchase"),
        touchTypes = Seq("view", "click"), convType = "purchase",
        windowMicros = 7L * 86400L * 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("n_events") == ev.count())
    assert(card("n_users") == ev.select("user_id").distinct().count())
    val funnel = EventAnalytics
      .funnel(ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(card("funnel_view") == funnel("view"))
    assert(card("funnel_click") == funnel("click"))
    assert(card("funnel_purchase") == funnel("purchase"))
    val attr = EventAnalytics
      .lastTouchAttribution(ev, "user_id", "ts", "event_type", "value", "event_id",
        Seq("view", "click"), "purchase", 7L * 86400L * 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (ch <- Seq("view", "click", "direct"))
      assert(card(s"attr_$ch") == attr.getOrElse(ch, 0L), ch)
  }

  test("sessionFunnel: a journey split across sessions does not convert") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val hour = 3600000000L
    val ev = Seq(
      // user 1, session 1: view -> click (converts stage 2 in-session)
      (1L, 1L, ts(0L), "view", 0.0), (2L, 1L, ts(60000000L), "click", 0.0),
      // user 1, session 2 (2h later): view only
      (3L, 1L, ts(2 * hour), "view", 0.0),
      // user 2: view, then click TWO HOURS later - a NEW session, so the
      // per-user funnel would count it but the session funnel must not.
      (4L, 2L, ts(0L), "view", 0.0), (5L, 2L, ts(2 * hour), "click", 0.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventAnalytics
      .sessionFunnel(ev, "user_id", "ts", "event_type", "event_id", gapMinutes = 30,
        stages = Seq("view", "click"))
      .orderBy("stage").collect()
    // sessions with a view: u1s1, u1s2, u2s1 = 3 (u2's click-only session has none);
    // sessions converting in-session: only u1s1.
    assert(out.map(r => (r.getInt(0), r.getLong(2))).toSeq == Seq((1, 3L), (2, 1L)))
    val userFunnel = EventAnalytics
      .funnel(ev, "user_id", "ts", "event_type", Seq("view", "click"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(userFunnel("click") == 2L) // the per-user funnel counts both users
  }

  test("funnelByCohort: cohorts split the funnel; per-cohort counts match per-user logic") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val wk = 604800000000L
    val ev = Seq(
      // cohort 0 user: full journey
      (1L, ts(0L), "view", 0.0), (1L, ts(1000000L), "click", 0.0), (1L, ts(2000000L), "purchase", 0.0),
      // cohort 1 user: view only (first event in week 1)
      (2L, ts(wk + 5), "view", 0.0),
      // cohort 0 user: view then click
      (3L, ts(10000000L), "view", 0.0), (3L, ts(20000000L), "click", 0.0),
    ).toDF("user_id", "ts", "event_type", "value")
    val out = EventAnalytics
      .funnelByCohort(ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(out((0L, 1)) == 2L && out((0L, 2)) == 2L && out((0L, 3)) == 1L)
    assert(out((1L, 1)) == 1L && out((1L, 2)) == 0L && out((1L, 3)) == 0L)
  }

  test("dailyValueTimeline and weekdayProfile: hand-computed picks and shares") {
    def ts(day: Long, off: Long) = new java.sql.Timestamp(day * 86400000L + off)
    val ev = Seq(
      ("a", ts(0, 1), 1.0), ("a", ts(0, 2), 5.0), ("a", ts(0, 3), 3.0),
      ("a", ts(1, 1), 7.0),
      ("b", ts(0, 1), 2.0),
    ).toDF("event_type", "ts", "value")
    val tl = EventAnalytics.dailyValueTimeline(ev, "event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // a/day0: sorted [1,3,5]: p50 = pos (3+1)/2 = 2 -> 3.0; p90 = pos (27+9)/10 = 3 -> 5.0.
    assert(tl(("a", 0L)) == (3L, 3.0, 5.0))
    assert(tl(("a", 1L)) == (1L, 7.0, 7.0))
    val wp = EventAnalytics.weekdayProfile(ev, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // a: 3 events on dow 0, 1 on dow 1 -> shares 750 / 250.
    assert(wp(("a", 0L)) == (3L, 750L) && wp(("a", 1L)) == (1L, 250L))
    assert(wp(("b", 0L)) == (1L, 1000L))
  }

  test("dailyChangeReport and dayNRetention: deltas (incl. negative) and per-mille KPIs") {
    def ts(day: Long, off: Long) = new java.sql.Timestamp(day * 86400000L + off)
    val ev = (1 to 9).map(i => (100L + i, ts(0, i), "a")) ++ Seq((200L, ts(1, 1), "a"), (201L, ts(1, 2), "a"))
    val chg = EventAnalytics.dailyChangeReport(ev.toDF("user_id", "ts", "event_type"), "event_type", "ts")
      .orderBy("day").collect()
    // day0: 9 events, prev null; day1: 2 events -> (2-9)*1000 div 9 = -777 (truncating).
    assert(chg(0).isNullAt(3) && chg(0).isNullAt(4))
    assert(chg(1).getLong(2) == 2L && chg(1).getLong(3) == 9L && chg(1).getLong(4) == -777L)
    val ret = Seq(
      (1L, ts(0, 1)), (1L, ts(1, 1)),              // D1-retained
      (2L, ts(0, 2)), (2L, ts(7, 1)),              // D7-retained
      (3L, ts(0, 3)),                              // churned
      (4L, ts(1, 1)), (4L, ts(2, 1)), (4L, ts(8, 1)), // cohort day1: D1 and D7
    ).toDF("user_id", "ts")
    val out = EventAnalytics.dayNRetention(ret, "user_id", "ts", Seq(1, 7))
      .orderBy("signup_day").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(0L) == (3L, 1L, 1L, 333L, 333L))
    assert(out(1L) == (1L, 1L, 1L, 1000L, 1000L))
  }
}
