package graft

import graft.functions.MinKAggregator
import graft.operators.{Decontaminate, Dedup, EventAnalytics, Quality, SkewJoin}
import org.apache.spark.sql.functions._

/** Round-9 operators: block-level dedup rewrite, Bloom-prefiltered
  * decontamination, the KMV distinct sketch, and the shuffle-key skew
  * report.
  */
class SketchSpec extends SparkSpec {

  test("blockDedupRewrite: first occurrence survives, later copies drop, text reassembles in order") {
    import spark.implicits._
    // doc 1: blocks [a b | c d | e f]; doc 2 repeats doc 1's middle block
    // and adds its own; doc 3 repeats its own first block (within-doc dup).
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "c d x y"),
      (3L, "p q p q"),
    ).toDF("doc_id", "text")
    val out = Dedup
      .blockDedupRewrite(docs, "doc_id", "text", blockTokens = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 3L, 3L, "a b c d e f")))
    assert(out(1) === ((2L, 2L, 1L, "x y"))) // "c d" already owned by doc 1
    assert(out(2) === ((3L, 2L, 1L, "p q"))) // within-doc copy drops too
  }

  test("blockDedupRewrite: all-duplicate doc rewrites to empty text, short doc forms one block") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "z")).toDF("doc_id", "text")
    val out = Dedup
      .blockDedupRewrite(docs, "doc_id", "text", blockTokens = 2)
      .orderBy("doc_id")
      .collect()
    assert(out(1).getLong(2) === 0L && out(1).getString(3) === "")
    assert(out(2).getLong(1) === 1L && out(2).getString(3) === "z")
  }

  test("overlapsBloom equals overlaps exactly (false positives verified away)") {
    val docs = Tables.t(spark, sf(), "documents")
    val corpus = docs.filter(col("source") =!= "src0")
    val eval = docs.filter(col("source") === "src0")
    // Tiny filter (512 bits) to force a high false-positive rate: the exact
    // join must still remove every FP.
    for (bits <- Seq(512, 1 << 16)) {
      val exact = Decontaminate.overlaps(corpus, eval, "doc_id", "text", n = 3)
      val bloom = Decontaminate.overlapsBloom(corpus, eval, "doc_id", "text", n = 3, bits = bits)
      assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty,
        s"bloom($bits) result differs from exact overlaps")
    }
  }

  test("MinKAggregator: bounded, sorted, distinct; sketches merge losslessly") {
    val k = 8
    val agg = new MinKAggregator(k)
    val xs = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 11L, 5L, 4L, 6L, 1L)
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(whole) === xs.distinct.sorted.take(k))
    // merge(shard A, shard B) == sketch of A ++ B — the mergeability that
    // makes KMV a real distributed sketch.
    val (a, b) = xs.splitAt(5)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) === agg.finish(whole))
  }

  test("kmvDistinct: exact below k, estimate within rigorous bounds above k") {
    import spark.implicits._
    // group "small": 10 distinct values (< k=64) -> exact count, no estimate
    // error; group "big": 5000 distinct -> KMV estimate within ±4/sqrt(k).
    val small = (0 until 10).map(i => ("small", s"v$i"))
    val big = (0 until 5000).map(i => ("big", s"user$i"))
    val df = spark.createDataFrame((small ++ big ++ small)).toDF("g", "v")
    val out = EventAnalytics
      .kmvDistinct(df, "g", col("v"), k = 64)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    assert(out("small")._1 === 10L && out("small")._2 === 10.0)
    val est = out("big")._2
    assert(math.abs(est - 5000) / 5000 < 4.0 / math.sqrt(64),
      s"KMV estimate $est too far from 5000")
  }

  test("binnedRangeJoin: equals the naive BETWEEN join, exactly once per match") {
    import spark.implicits._
    val ev = Tables.events(spark, sf()).select($"event_id", $"event_type", $"ts")
    val hourUs = 3600L * 1000000
    val iv = ev
      .select($"event_type", expr(s"unix_micros(ts) div $hourUs").as("hour"))
      .distinct()
      .withColumn("s", timestamp_micros($"hour" * hourUs - 1800000000L))
      .withColumn("e", timestamp_micros($"hour" * hourUs + 5400000000L))
    val binned = graft.operators.RangeJoin
      .binnedRangeJoin(ev, "ts", iv, "s", "e", Seq("event_type"), binUs = hourUs)
      .select($"event_id", $"hour")
    val naive = ev
      .join(iv, Seq("event_type"))
      .filter($"ts" >= $"s" && $"ts" <= $"e")
      .select($"event_id", $"hour")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    // overlapping windows: matches must exceed events (each event falls in
    // its own hour's window AND at least one neighbour's for most rows)
    assert(binned.count() > ev.count())
  }

  test("binnedRangeJoin: oversize interval fails loudly at the bin guard") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts")
    val right = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
       java.sql.Timestamp.valueOf("2024-03-01 00:00:00")),
    ).toDF("s", "e")
    val e = intercept[Exception] {
      graft.operators.RangeJoin
        .binnedRangeJoin(left, "ts", right, "s", "e", binUs = 1000000, maxBinsPerInterval = 100)
        .count()
    }
    assert(e.getMessage.contains("binnedRangeJoin"))
  }

  test("kmvJoinEstimate: exact when both sides fit the sketch") {
    import spark.implicits._
    // A = {k1..k10}, B = {k6..k15}: union 15 < k=64, so every estimate
    // collapses to the exact value: union 15, jaccard 5/15, join keys 5.
    val a = (1 to 10).map(i => s"k$i").toDF("ka")
    val b = (6 to 15).map(i => s"k$i").toDF("kb")
    val r = EventAnalytics.kmvJoinEstimate(a, col("ka"), b, col("kb"), k = 64).head()
    assert(r.getLong(0) === 15L)
    assert(r.getDouble(2) === 15.0)
    assert(r.getDouble(3) === 5.0 / 15.0)
    assert(r.getDouble(4) === 15.0 * (5.0 / 15.0))
  }

  test("kmvJoinEstimate: sketched estimate lands near truth above k") {
    import spark.implicits._
    // |A| = 3000, |B| = 2000, overlap 1000 -> union 4000, J = 0.25.
    val a = (1 to 3000).map(i => s"x$i").toDF("ka")
    val b = (2001 to 4000).map(i => s"x$i").toDF("kb")
    val r = EventAnalytics.kmvJoinEstimate(a, col("ka"), b, col("kb"), k = 64).head()
    assert(math.abs(r.getDouble(2) - 4000) / 4000 < 0.5, s"union est ${r.getDouble(2)}")
    assert(r.getDouble(3) > 0.05 && r.getDouble(3) < 0.6, s"jaccard est ${r.getDouble(3)}")
  }

  test("rateLimitFirst: earliest (us, id) survives per bucket; counts are per-bucket") {
    import spark.implicits._
    // user 1 bursts 3 events inside one 10-min bucket (ids out of ts order
    // to prove the tiebreak is (us, id), not id); a 4th lands in the next.
    val ev = Seq(
      (10L, 1L, "click", "2024-01-01 00:01:00"),
      (11L, 1L, "click", "2024-01-01 00:01:00"), // same us as id 10 -> id 10 wins
      (9L, 1L, "click", "2024-01-01 00:05:00"),
      (12L, 1L, "click", "2024-01-01 00:11:00"),
    ).toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    val out = EventAnalytics
      .rateLimitFirst(ev, "user_id", "event_type", "ts", "event_id", windowMinutes = 10)
      .orderBy("bucket")
      .collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("event_id") === 10L && out(0).getAs[Long]("n_events") === 3L)
    assert(out(1).getAs[Long]("event_id") === 12L && out(1).getAs[Long]("n_events") === 1L)
  }

  test("ohlcBars: open/close are the (us, id)-ordered endpoints, high/low the extremes") {
    import spark.implicits._
    val ev = Seq(
      (1L, "t", "2024-01-01 00:05:00", 5.0),
      (2L, "t", "2024-01-01 00:10:00", 9.0),
      (3L, "t", "2024-01-01 00:20:00", 1.0),
      (4L, "t", "2024-01-01 00:50:00", 7.0),
    ).toDF("event_id", "event_type", "s", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val r = EventAnalytics.ohlcBars(ev, "event_type", "ts", "event_id", "value").head()
    assert(r.getAs[Double]("open") === 5.0 && r.getAs[Double]("high") === 9.0)
    assert(r.getAs[Double]("low") === 1.0 && r.getAs[Double]("close") === 7.0)
    assert(r.getAs[Long]("n_events") === 4L)
  }

  test("kmvDistinctSlidingDays: window estimate equals the direct sketch of the window's union") {
    import spark.implicits._
    // days 0, 1, 2 with overlapping user sets; window [0..2] on day 2 must
    // equal the DIRECT KMV over the 3 days' union — sketch merge is lossless.
    def u(day: Int, ids: Range) = ids.map(i => (s"2024-01-0${day + 1} 12:00:00", s"u$i"))
    val rows = u(0, 1 to 30) ++ u(1, 20 to 50) ++ u(2, 40 to 60)
    val ev = rows.toDF("s", "uid").withColumn("ts", col("s").cast("timestamp"))
    val slid = EventAnalytics
      .kmvDistinctSlidingDays(ev, "ts", col("uid"), windowDays = 3, k = 16)
      .orderBy("day")
      .collect()
    val direct = EventAnalytics
      .kmvDistinct(ev.withColumn("g", lit("all")), "g", col("uid"), k = 16)
      .head()
    assert(slid.last.getAs[Double]("est_distinct") === direct.getAs[Double]("est_distinct"))
    assert(slid.last.getAs[Long]("kth_min") === direct.getAs[Long]("kth_min"))
    // day 0's window is just day 0: 30 distinct > k=16 -> sketched estimate
    assert(slid.head.getAs[Long]("n_sketch") === 16L)
  }

  test("funnel maxGap: the time box drops slow transitions, 0 keeps the classic semantics") {
    import spark.implicits._
    // user 1 converts view->click in 10 min (in-window), user 2 in 3 hours
    // (outside a 2h box but valid classically).
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:10:00"),
      (3L, 2L, "view", "2024-01-01 10:00:00"),
      (4L, 2L, "click", "2024-01-01 13:00:00"),
    ).toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    def users(gap: Long): Seq[Long] =
      EventAnalytics
        .funnel(ev, "user_id", "ts", "event_type", Seq("view", "click"), maxGapMinutes = gap)
        .orderBy("stage")
        .collect()
        .map(_.getAs[Long]("users"))
        .toSeq
    assert(users(0) === Seq(2L, 2L))
    assert(users(120) === Seq(2L, 1L))
  }

  test("weightedSample: key formula is the quantized-ln rule; higher weight raises the key") {
    import spark.implicits._
    val docs = Seq((1L, 100L), (2L, 100L), (3L, 100L)).toDF("doc_id", "w")
    val out = Quality.weightedSample(docs, "doc_id", col("w"), n = 3).collect()
    out.foreach { r =>
      val h = r.getLong(0) // recompute lq from the id's hash
      val hashed = spark.range(1).select(
        graft.functions.Hashing.hash64(lit(h.toString)).cast("double") / math.pow(2, 60)).head().getDouble(0)
      val lq = math.floor(math.log(hashed) * 1000000 + 0.5).toLong
      assert(r.getAs[Double]("key") === lq.toDouble / 100L)
    }
    // same ids, one weight raised 100x: its key must not decrease
    val boosted = Quality
      .weightedSample(Seq((1L, 10000L), (2L, 100L), (3L, 100L)).toDF("doc_id", "w"), "doc_id", col("w"), 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("key")).toMap
    val base = out.map(r => r.getLong(0) -> r.getAs[Double]("key")).toMap
    assert(boosted(1L) >= base(1L) && boosted(2L) === base(2L))
  }

  test("sourceKlDivergence: hand-computed ln(3/2)/ln(3) closed forms") {
    import spark.implicits._
    // s1 = "a a" (KL = ln(3/2) per token), s2 = "b" (KL = ln(3)).
    val docs = Seq(("s1", "a a"), ("s2", "b")).toDF("source", "text")
    val out = Quality
      .sourceKlDivergence(docs, "source", "text")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out("s1") === ((2L, 810930L, 405465.0)))   // 2·(l(3)−l(2)); /2
    assert(out("s2") === ((1L, 1098612L, 1098612.0))) // l(3)
  }

  test("reciprocalRankFusion: exact integer fusion, overlap outranks single-list wins") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((30L, 1), (40L, 2)).toDF("id", "rank")
    val out = graft.operators.Retrieval
      .reciprocalRankFusion(Seq(a, b), "id", "rank", kRrf = 60, topN = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // id 30: 1e9/63 + 1e9/61 = 15873015 + 16393442
    assert(out(30L) === ((2L, 15873015L + 16393442L)))
    assert(out(10L) === ((1L, 1000000000L / 61)))
    // the doubly-retrieved doc must beat every single-list doc here
    assert(out(30L)._2 > out.filterKeys(_ != 30L).values.map(_._2).max)
  }

  test("weightedSampleByGroup: per-stratum counts and the global key order within each") {
    import spark.implicits._
    val docs = Tables.t(spark, sf(), "documents")
    val out = Quality
      .weightedSampleByGroup(docs, "source", "doc_id", col("n_chars"), nPerGroup = 5)
    val perGroup = out.groupBy("source").count().collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 5L), "every source must contribute exactly 5 docs")
    // rank order within a group must follow (key desc, id)
    val rows = out.filter(col("source") === "src0").orderBy("rank").collect()
    val keys = rows.map(_.getAs[Double]("key"))
    assert(keys.sameElements(keys.sorted.reverse))
  }

  test("skewReport: shares and salt buckets are the closed-form integers") {
    import spark.implicits._
    // key 1: 70 rows, key 2: 20, key 3: 10 -> total 100
    val df = (Seq.fill(70)(1) ++ Seq.fill(20)(2) ++ Seq.fill(10)(3)).toDF("k")
    val out = SkewJoin
      .skewReport(df, "k", targetRowsPerTask = 25, topN = 2)
      .orderBy(col("cnt").desc)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1, 70L, 7000L, 3L), (2, 20L, 2000L, 1L)))
  }

  test("FreqKAggregator: MG summary keeps every item above N/(k+1) regardless of order") {
    // Stream of 100 items: 'a' x40, 'b' x25, noise x35 distinct. k=3:
    // guarantee covers freq > 25 -> 'a' must survive; check two orders.
    val noise = (1 to 35).map(i => s"n$i")
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ noise
    Seq(items, scala.util.Random.shuffle(items)).foreach { stream =>
      val agg = new graft.functions.FreqKAggregator(3)
      val buf = stream.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(buf).contains("a"), s"'a' (40/100 > 100/4) must survive: ${agg.finish(buf)}")
    }
    // merge rule: two disjoint summaries over-capacity cut to <= k keys
    val agg = new graft.functions.FreqKAggregator(3)
    val b1 = Seq("x", "x", "x", "y", "z").foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq("p", "p", "q", "r").foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(b1, b2)
    assert(merged.counts.size <= 3 && merged.counts.contains("x"))
  }

  test("heavyHitters: exact equality with the full census at the same threshold") {
    val toks = spark.read.parquet(sf() + "/documents.parquet")
      .select(explode(graft.functions.TextAnalysis.wsTokens(col("text"))).as("token"))
      .cache()
    val got = graft.operators.Retrieval
      .heavyHitters(toks, col("token"), k = 100, minFreqNum = 1, minFreqDen = 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = toks.count()
    val want = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100 >= n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want && want.nonEmpty)
  }

  test("ContentChunks: spans tile the doc exactly; short and empty docs behave per contract") {
    import spark.implicits._
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
      .unionByName(Seq((90001L, "tiny", "en", "t", 4L), (90002L, "", "en", "t", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val ch = graft.operators.ContentChunks.chunks(docs, "doc_id", "text").collect()
    val byDoc = ch.groupBy(_.getLong(0))
    val lens = docs.select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1).length).toMap
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // chunks abut: off_1 = 1, off_{i+1} = off_i + len_i, and they cover L
      assert(sorted.head.getLong(2) == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(2) == a.getLong(2) + a.getLong(3))
        case _           =>
      }
      assert(sorted.last.getLong(2) + sorted.last.getLong(3) - 1 == lens(id).toLong)
    }
    assert(byDoc(90001L).length == 1 && byDoc(90001L).head.getLong(3) == 4L) // shorter than window: one chunk
    assert(!byDoc.contains(90002L)) // empty doc emits nothing
  }

  test("ContentChunks: boundaries are content-defined — a prefix insertion preserves chunk hashes") {
    import spark.implicits._
    val base = spark.read.parquet(sf() + "/documents.parquet")
      .orderBy("doc_id").limit(1).select("text").as[String].head()
    val docs = Seq((1L, base), (2L, "PREFIXED " + base)).toDF("doc_id", "text")
    def hashes(id: Long) = graft.operators.ContentChunks.chunks(docs, "doc_id", "text")
      .filter(col("doc_id") === id).select("chunk_hash").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val (h1, h2) = (hashes(1L), hashes(2L))
    // all but the first chunk (which absorbs the insertion) re-align
    assert(h1.intersect(h2).size >= h1.size - 2, s"CDC must re-align after an insertion: ${h1.size} vs shared ${h1.intersect(h2).size}")
  }

  test("heavyHitters: a sub-guarantee threshold is rejected loudly") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Retrieval.heavyHitters(df, col("v"), k = 3, minFreqNum = 1, minFreqDen = 100)
    }
    assert(e.getMessage.contains("1/(k+1)"))
  }
}
