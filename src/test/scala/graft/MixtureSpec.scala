package graft

import graft.operators.{Basket, Curate, EventAnalytics, Mixture, Quality}
import org.apache.spark.sql.functions._

/** Unit tests for the dataset-assembly operators added late in round 6:
  * market-basket lift, balanced/mixture sampling, cluster-aware splitting,
  * the domain quality gate, curriculum bucketing, and session Markov
  * transitions (q91–q97).
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("pairLift: known lift on a 4-basket toy; minSupport prunes") {
    val df = Seq(
      (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B"),
    ).toDF("b", "i")
    // n=4 baskets; cnt A=3, B=3, C=1; pair (A,B)=2, (A,C)=1
    val strict = Basket.pairLift(df, "b", "i", minSupport = 2, topK = 10).collect()
    assert(strict.length == 1)
    val r = strict.head
    assert(r.getString(0) == "A" && r.getString(1) == "B" && r.getLong(2) == 2L)
    assert(r.getLong(3) == 2L * 4 * 1000000 / 9) // 888888
    val loose = Basket.pairLift(df, "b", "i", minSupport = 1, topK = 10).collect()
    // (A,C): 1*4e6/3 = 1333333 outranks (A,B)'s 888888
    assert(loose.head.getString(0) == "A" && loose.head.getString(1) == "C")
    assert(loose.head.getLong(3) == 1L * 4 * 1000000 / 3)
  }

  test("balancedSample: minority class kept whole, majority downsampled, deterministic") {
    val docs = ((1 to 100).map(i => (s"maj-$i", "big")) ++ (1 to 10).map(i => (s"min-$i", "small")))
      .toDF("k", "cls")
    val got = Quality.balancedSample(docs, col("k"), col("cls"))
    val byCls = got.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(byCls("small") == 10) // rate 10000 bp: every bucket < 10000
    assert(byCls("big") < 100 && byCls("big") > 0)
    assert(got.collect().toSet == Quality.balancedSample(docs, col("k"), col("cls")).collect().toSet)
  }

  test("clusterSplit: paired docs land in one split; singleton keeps its own cluster") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s"),
      (2L, "alpha beta gamma delta", "s"),
      (3L, "totally different text", "s"),
    ).toDF("doc_id", "text", "source")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = Curate
      .clusterSplit(docs, "doc_id", "text", pairs)
      .as[(Long, Long, String)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got(1L)._1 == got(2L)._1 && got(1L)._2 == got(2L)._2) // same cluster, same split
    assert(got(3L)._1 == 3L) // singleton degenerates to its own id
  }

  test("epochMaterialize: integer-epoch weights give exact copy counts; cap binds") {
    // src a: 4 tokens total; src b: 2 -> weight(b) = 20000 bp = exactly 2 copies
    val docs = Seq(
      (1L, "t1 t2 t3 t4", "a"),
      (2L, "u1 u2", "b"),
    ).toDF("doc_id", "text", "source")
    val copies = Mixture
      .epochMaterialize(docs, "doc_id", "text", "source")
      .groupBy("doc_id")
      .count()
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(copies(1L) == 1L && copies(2L) == 2L)
    // 10:1 imbalance -> uncapped weight 100000 bp, capped to 30000 = 3 copies
    val skewed = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "a"),
      (2L, "u1", "b"),
    ).toDF("doc_id", "text", "source")
    val capped = Mixture
      .epochMaterialize(skewed, "doc_id", "text", "source")
      .groupBy("doc_id")
      .count()
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(capped(2L) == 3L)
  }

  test("sourceQualityGate: stopword-heavy source clears the corpus bar, junk source dropped") {
    val docs = Seq(
      (1L, "the and of to the", "good"),
      (2L, "a in is it that", "good"),
      (3L, "xyzzy qqq zzz brr", "junk"),
      (4L, "mmm nnn ooo ppp", "junk"),
    ).toDF("doc_id", "text", "source")
    val kept = Quality
      .sourceQualityGate(docs, "doc_id", "text", "source")
      .select("source")
      .distinct()
      .as[String]
      .collect()
      .toSet
    assert(kept == Set("good"))
  }

  test("curriculumBuckets: median fence splits 1..8 tokens into buckets 0/1") {
    val docs = (1 to 8).map(n => (n.toLong, (1 to n).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val got = Quality
      .curriculumBuckets(docs, "doc_id", "text", nBuckets = 2)
      .as[(Long, Long, Int)]
      .collect()
      .map(r => r._1 -> r._3)
      .toMap
    // percentile_disc(0.5) over 1..8 = 4 (first value with cume_dist >= 0.5)
    (1 to 4).foreach(n => assert(got(n.toLong) == 0, s"doc $n"))
    (5 to 8).foreach(n => assert(got(n.toLong) == 1, s"doc $n"))
  }

  test("countAnomalies: integer z-test flags the spike hour, not its successor") {
    // type A: hours 0..23 have 1 event, hour 24 has 10, hour 25 has 1.
    // hour 24: baseline n=24, s=24, q=24 -> zero variance, dev != 0 -> flag.
    // hour 25: baseline contains the spike (s=33, q=123) -> 81 < 4*1863 -> quiet.
    val rows = (0 to 23).map(h => (h.toLong, 1)) ++ Seq((24L, 10)) ++ Seq((25L, 1))
    val events = rows
      .flatMap { case (h, n) => (0 until n).map(i => (h * 3600000000L + i, "A")) }
      .toDF("us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = EventAnalytics
      .countAnomalies(events, "event_type", "ts")
      .select("hr", "cnt")
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(got == Seq((24L, 10L)))
  }

  test("bpeMergeCandidates: token-frequency-weighted pair counts; 1-char tokens contribute nothing") {
    val docs = Seq("ab ab cd x", "ab").toDF("text")
    val got = Quality.bpeMergeCandidates(docs, "text", k = 10).as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 3L), ("cd", 1L)))
  }

  test("quantilesByCount == Spark percentile_disc on a duplicate-heavy domain") {
    import graft.operators.EventAnalytics
    val vals = Seq(1L, 1L, 1L, 2L, 3L, 3L, 5L, 8L, 8L, 8L, 8L, 13L, 21L)
    val df = vals.toDF("v")
    val got = EventAnalytics
      .quantilesByCount(df, col("v"), (1 to 7).map(i => (i, 8)))
      .select("q_num", "value")
      .as[(Int, Long)]
      .collect()
      .toMap
    (1 to 7).foreach { i =>
      val want = df
        .agg(expr(s"percentile_disc(${i / 8.0}) WITHIN GROUP (ORDER BY v)").cast("long"))
        .head()
        .getLong(0)
      assert(got(i) == want, s"q=$i/8: got ${got(i)} want $want")
    }
  }

  test("weightedQuantilesByCount == percentile_disc over the weight-expanded multiset") {
    import graft.operators.EventAnalytics
    val rows = Seq((1L, 3L), (2L, 1L), (5L, 4L), (8L, 2L))
    val got = EventAnalytics
      .weightedQuantilesByCount(rows.toDF("v", "w"), col("v"), col("w"), (1 to 7).map(i => (i, 8)))
      .select("q_num", "value")
      .as[(Int, Long)]
      .collect()
      .toMap
    val expanded = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.toDF("v")
    (1 to 7).foreach { i =>
      val want = expanded
        .agg(expr(s"percentile_disc(${i / 8.0}) WITHIN GROUP (ORDER BY v)").cast("long"))
        .head()
        .getLong(0)
      assert(got(i) == want, s"q=$i/8: got ${got(i)} want $want")
    }
  }

  test("dedupIncrement: exact dup, cross near-dup, and unique incoming docs") {
    import graft.operators.Dedup
    val base = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    val existing = Seq((1L, base)).toDF("doc_id", "text")
    val incoming = Seq(
      (2L, base), // exact dup of existing -> drop
      (3L, base + " extra"), // J = 9/10 >= 0.8 near-dup of existing -> drop
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"), // unique -> keep
    ).toDF("doc_id", "text")
    // precondition: the near pair must actually surface through the LSH path
    val pairs = Dedup
      .minhashNearDupPairs(existing.unionAll(incoming), "doc_id", "text")
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((1L, 3L)), s"toy near-pair not surfaced: $pairs")
    val got = Dedup.dedupIncrement(existing, incoming, "doc_id", "text").as[Long].collect().toSeq
    assert(got == Seq(4L), s"got $got")
  }

  test("sessionTransitions: gap rule cuts cross-session pairs; conditionals sum to 1e6") {
    val events = Seq(
      (1L, 1L, "A", "2024-01-01 00:00:00"),
      (2L, 1L, "B", "2024-01-01 00:10:00"),
      (3L, 1L, "C", "2024-01-01 00:50:00"), // 40 min after B: new session, no B->C
      (4L, 2L, "A", "2024-01-01 00:00:00"),
      (5L, 2L, "B", "2024-01-01 00:05:00"),
    ).toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = EventAnalytics
      .sessionTransitions(events, "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)]
      .collect()
    assert(got.toSeq == Seq(("A", "B", 2L, 1000000L)))
  }
}
