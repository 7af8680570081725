package graft

import graft.functions.MinKAggregator
import graft.operators.{Decontaminate, Dedup, EventAnalytics, SkewJoin}
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
}
