package graft

import graft.operators.{EventAnalytics, Retrieval}
import org.apache.spark.sql.functions._

/** Closed-form unit tests for the retrieval (BM25, posting lists, bigram LM)
  * and event-analytics (funnel, retention, latest-wins, IQR outliers)
  * operator families.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bm25TopK: hand-computed integer score on a 3-doc corpus") {
    val docs = Seq(
      (1L, "cat dog"),
      (2L, "cat cat cat"),
      (3L, "bird"),
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 10).collect()
    // N=3, totalLen=6, df(cat)=2 -> idf_s = floor(ln(1 + 1.5/2.5)*1e6 + 0.5)
    val idfS = math.floor(math.log(1.0 + 1.5 / 2.5) * 1e6 + 0.5).toLong
    def score(tf: Long, dl: Long) =
      (idfS * tf * 22 * 6) / (10 * tf * 6 + 3 * 6 + 9 * dl * 3)
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSet ==
      Set((1L, score(1, 2)), (2L, score(3, 3))))
    // doc 2 has higher tf but is longer; both rank above absent doc 3
    assert(out.length == 2)
  }

  test("bm25TopK: terms absent from the corpus contribute nothing") {
    val docs = Seq((1L, "cat dog")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("unicorn", "cat"), k = 5).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L) // n_terms counts only matches
  }

  test("postingLists: df counts and sorted comma-joined postings") {
    val docs = Seq((3L, "b a"), (1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Retrieval.postingLists(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // per-doc DISTINCT tokens: df('a')=3 even though doc 1 repeats it
    assert(out == Set(("a", 3L, "1,2,3"), ("b", 2L, "1,3"), ("c", 1L, "2")))
  }

  test("postingLists: Zipf-head token fails loudly; sharded path reassembles identically") {
    // "the" is in every doc (the stopword head); w1..w5 are hapax
    val docs = (1L to 5L).map(i => (i, s"the w$i")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException](
      Retrieval.postingLists(docs, "doc_id", "text", minDf = 1, maxDf = 3)
    )
    assert(e.getMessage.contains("postingListsSharded") && e.getMessage.contains("'the'"), e.getMessage)
    val sharded = Retrieval.postingListsSharded(docs, "doc_id", "text", minDf = 1, maxPostings = 2).collect()
    val theRows = sharded.filter(_.getString(0) == "the")
    assert(theRows.forall(_.getLong(1) == 5L)) // df rides along unchanged
    assert(theRows.forall(r => r.getLong(2) >= 0L && r.getLong(2) < 3L)) // ceil(5/2) = 3 shards
    assert(theRows.map(_.getLong(3)).sum == 5L) // shard_df partitions df
    // the union of shard postings IS the unsharded posting list
    assert(theRows.flatMap(_.getString(4).split(",")).map(_.toLong).sorted.toSeq == (1L to 5L))
    // tokens under the bound keep exactly one shard: ceil(1/2) = 1 -> shard 0
    val hapax = sharded.filter(_.getString(0) != "the")
    assert(hapax.length == 5 && hapax.forall(r => r.getLong(2) == 0L && r.getLong(3) == 1L))
  }

  test("bigramNextTopK: counts, ranks, and exact scaled conditional probability") {
    val docs = Seq((1L, "a b a b a c"), (2L, "x")).toDF("doc_id", "text")
    val out = Retrieval.bigramNextTopK(docs, "text", topN = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      .toSet
    // bigrams: (a,b)x2 (b,a)x2 (a,c)x1; single-token doc 2 emits nothing
    assert(out == Set(
      ("a", "b", 2L, 1, 2000000L / 3),
      ("a", "c", 1L, 2, 1000000L / 3),
      ("b", "a", 2L, 1, 1000000L),
    ))
  }

  test("lastTouchAttribution: most recent in-window touch wins; stale or missing touch -> direct") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 10.0, 1L),
      (1L, "click", ts("2024-01-01 11:00:00"), 0.0, 2L), // most recent touch before purchase
      (1L, "purchase", ts("2024-01-02 09:00:00"), 50.0, 3L),
      (2L, "view", ts("2024-01-01 10:00:00"), 0.0, 4L),
      (2L, "purchase", ts("2024-01-09 11:00:00"), 20.0, 5L), // touch 8 days old -> direct
      (3L, "purchase", ts("2024-01-01 10:00:00"), 5.0, 6L), // no touch at all -> direct
    ).toDF("user_id", "event_type", "ts", "value", "event_id")
    val got = EventAnalytics
      .lastTouchAttribution(
        ev, "user_id", "ts", "event_type", "value", "event_id",
        touchTypes = Seq("view", "click"), convType = "purchase", windowMicros = 7L * 86400L * 1000000L,
      )
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == Set(("click", 1L, 50.0), ("direct", 2L, 25.0)), got.toString)
  }

  test("funnel: strictly-ordered stages — out-of-order completion doesn't count") {
    val events = Seq(
      // u1 completes the full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // u2 purchases BEFORE clicking: stage 3 must not count
      (2L, ts("2024-01-01 11:00:00"), "view"),
      (2L, ts("2024-01-01 11:01:00"), "purchase"),
      (2L, ts("2024-01-01 11:02:00"), "click"),
      // u3 never views: no stage counts at all
      (3L, ts("2024-01-01 12:00:00"), "click"),
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics
      .funnel(events, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy("stage")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1, "view", 2L, 1000000L)))
    assert(out(1) == ((2, "click", 2L, 1000000L)))   // both viewers clicked after viewing
    assert(out(2) == ((3, "purchase", 1L, 500000L))) // only u1; u2's purchase preceded the click
  }

  test("funnel: equal timestamps are NOT strictly after (boundary pinned)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"), // same micro as the view
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics
      .funnel(events, "user_id", "ts", "event_type", Seq("view", "click"))
      .orderBy("stage")
      .collect()
    assert(out(0).getLong(2) == 1L && out(1).getLong(2) == 0L)
  }

  test("retentionCohorts: epoch-day week buckets from a user's first event") {
    val events = Seq(
      (1L, ts("1970-01-01 00:00:00")), // day 0 -> cohort week 0
      (1L, ts("1970-01-09 00:00:00")), // day 8 -> offset week 1
      (2L, ts("1970-01-08 00:00:00")), // day 7 -> cohort week 1, offset 0
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(events, "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("latestWins: greatest (ts, tiebreak) survives per key") {
    val log = Seq(
      (1L, "a", 10L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, "a", 11L, ts("2024-01-01 10:00:00"), 2.0), // equal ts: higher id wins
      (1L, "a", 5L, ts("2024-01-02 10:00:00"), 3.0),  // later ts beats higher id
      (2L, "a", 7L, ts("2024-01-01 09:00:00"), 4.0),
    ).toDF("user_id", "event_type", "event_id", "ts", "value")
    val out = EventAnalytics
      .latestWins(log, Seq("user_id", "event_type"), "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out == Set((1L, 5L), (2L, 7L)))
  }

  test("statePeriods: runs collapse, periods are dense, intervals abut") {
    val log = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "a", ts("2024-01-01 11:00:00"), 2L), // same run
      (1L, "b", ts("2024-01-01 12:00:00"), 3L), // change
      (1L, "a", ts("2024-01-01 13:00:00"), 4L), // back to a = NEW run
      (2L, "x", ts("2024-01-01 09:00:00"), 5L),
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics
      .statePeriods(log, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "period")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5)))
    def us(s: String) = ts(s).getTime * 1000
    assert(out.toSeq == Seq(
      (1L, 1L, "a", us("2024-01-01 10:00:00"), Some(us("2024-01-01 12:00:00")), 2L),
      (1L, 2L, "b", us("2024-01-01 12:00:00"), Some(us("2024-01-01 13:00:00")), 1L),
      (1L, 3L, "a", us("2024-01-01 13:00:00"), None, 1L),
      (2L, 1L, "x", us("2024-01-01 09:00:00"), None, 1L),
    ))
  }

  test("statePeriods: equal timestamps resolve by the tiebreak column") {
    val t0 = ts("2024-01-01 10:00:00")
    val log = Seq((1L, "b", t0, 2L), (1L, "a", t0, 1L)).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics
      .statePeriods(log, "user_id", "event_type", "ts", "event_id")
      .orderBy("period").collect().map(r => (r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("cdcMerge: whole-row update wins; insert/update/carry provenance") {
    val snap = Seq(
      (1L, "old", 10L, 100L),
      (2L, "keep", 20L, 101L),
    ).toDF("user_id", "state", "us", "event_id")
    val upd = Seq(
      (1L, "new1", 30L, 102L),
      (1L, "new2", 40L, 103L), // later -> wins the compaction
      (3L, "born", 50L, 104L),
    ).toDF("user_id", "state", "us", "event_id")
    val out = EventAnalytics
      .cdcMerge(snap, upd, Seq("user_id"), "us", "event_id")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "update", "new2", 40L),
      (2L, "carry", "keep", 20L),
      (3L, "insert", "born", 50L),
    ))
  }

  test("topSessionPaths: gap rule splits sessions; paths ordered and truncated") {
    val log = Seq(
      // user 1, session 1: view > click > purchase (+2 more beyond maxLen=3)
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:05:00"), 2L),
      (1L, "purchase", ts("2024-01-01 10:10:00"), 3L),
      (1L, "view", ts("2024-01-01 10:11:00"), 4L),
      (1L, "view", ts("2024-01-01 10:12:00"), 5L),
      // user 1, session 2 (gap > 30 min): view > click > purchase again
      (1L, "view", ts("2024-01-01 12:00:00"), 6L),
      (1L, "click", ts("2024-01-01 12:01:00"), 7L),
      (1L, "purchase", ts("2024-01-01 12:02:00"), 8L),
      // user 2: single view
      (2L, "view", ts("2024-01-01 10:00:00"), 9L),
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics
      .topSessionPaths(log, "user_id", "ts", "event_type", "event_id", gapMinutes = 30, maxLen = 3, topN = 10)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq == Seq("view>click>purchase" -> 2L, "view" -> 1L))
  }

  test("cumulativeDistinctUsers: first-day collapse and running total") {
    val log = Seq(
      (1L, ts("1970-01-01 05:00:00")), // day 0
      (1L, ts("1970-01-03 05:00:00")), // later activity doesn't re-count
      (2L, ts("1970-01-02 05:00:00")), // day 1
      (3L, ts("1970-01-02 09:00:00")), // day 1
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cumulativeDistinctUsers(log, "user_id", "ts")
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L, 1L), (1L, 2L, 3L)))
  }

  test("interArrivalStats: telescoping mean, lag min/max, single-event users drop") {
    val log = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:00:10"), 2L), // gap 10s
      (1L, ts("2024-01-01 10:01:00"), 3L), // gap 50s
      (2L, ts("2024-01-01 10:00:00"), 4L), // single event -> dropped
    ).toDF("user_id", "ts", "event_id")
    val out = EventAnalytics.interArrivalStats(log, "user_id", "ts", "event_id").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 30e6 && r.getLong(4) == 10000000L && r.getLong(5) == 50000000L)
  }

  test("zipfFit: negative slope over the vocab; a perfect power law fits exactly") {
    // Real corpus: rank up -> freq down, so the ln-ln slope is negative
    // (the synthetic vocab is nearly uniform, so no strength claim).
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val out = graft.operators.Quality.zipfFit(docs, "text").collect().head
    assert(out.getDouble(2) < 0.0, s"zipf slope must be negative: $out")
    val nVocab = docs
      .select(explode(graft.functions.TextAnalysis.wsTokens(col("text"))).as("t"))
      .select("t").distinct().count()
    assert(out.getLong(1) == nVocab)
    // Synthetic exact power law freq = floor(1024 / rank): slope ~ -1, r2 ~ 1.
    val corpus = (1 to 64).flatMap(r => Seq.fill(1024 / r)(s"w$r")).mkString(" ")
    val one = graft.operators.Quality.zipfFit(Seq(Tuple1(corpus)).toDF("text"), "text").collect().head
    assert(math.abs(one.getDouble(2) + 1.0) < 0.05 && one.getDouble(4) > 0.99, s"power law must fit: $one")
  }

  test("iqrOutliers: discrete quartiles and Tukey fences, integer-exact") {
    // group g: values 1..9 plus outlier 100. disc p25 of 10 values = 3rd
    // (cume_dist 0.3 >= 0.25), p75 = 8th: p25=3, p75=8, IQR=5.
    // fences: [3-7.5, 8+7.5] = [-4.5, 15.5] -> only 100 is out.
    val df = ((1 to 9).map(v => ("g", v.toLong)) :+ (("g", 100L))).toDF("grp", "v")
    val out = EventAnalytics.iqrOutliers(df, "grp", col("v")).collect().head
    assert(out.getLong(1) == 10L && out.getLong(2) == 1L)
    assert(out.getLong(3) == 100L && out.getLong(4) == 100L)
  }

  test("pmiCollocations: hand-computed integer PMI on a tiny corpus") {
    import spark.implicits._
    // docs: "a b a b", "a c" -> bigrams (a,b)x2 (b,a)x1 (a,c)x1, N2=4;
    // unigrams a:3 b:2 c:1, N1=6. pmi(a,b) = ln(2*36/(4*3*2)) = ln(3);
    // in l(x)=floor(ln(x)*1e6+0.5) terms: l(2)+2l(6)-l(4)-l(3)-l(2) = l(3).
    val docs = Seq("a b a b", "a c").toDF("text")
    val out = graft.operators.Retrieval
      .pmiCollocations(docs, "text", minCount = 1, topN = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(("a", "b")) === ((2L, 1098612L)))
    // ln(1*36/(4*3*1)) = ln(3) for (a,c) too; (b,a) = ln(1*36/(4*2*3)) = ln(1.5)
    assert(out(("a", "c"))._2 === 1098612L)
    assert(out(("b", "a"))._2 === 405465L)
  }

  test("index-backed BM25 is bit-identical to the corpus scan on a fresh query") {
    import graft.operators.Retrieval
    import graft.functions.TextAnalysis
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val query = Seq("data", "parquet", "cluster")
    val scan = Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val postings = Retrieval.scoredPostings(docs, "doc_id", "text", maxPostings = 8L)
    val norms = docs.select(col("doc_id"), size(TextAnalysis.wsTokens(col("text"))).as("dl"))
    val idx = Retrieval.bm25FromIndex(postings, norms, query, k = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(idx == scan && scan.nonEmpty)
    // a (doc, token) pair lives in exactly one shard: total payload count
    // equals the distinct (doc, token) count.
    val payloadRows = postings.select(explode(col("postings"))).count()
    val pairRows = docs
      .select(col("doc_id"), explode(TextAnalysis.wsTokens(col("text"))).as("t"))
      .distinct().count()
    assert(payloadRows == pairRows)
  }
}
