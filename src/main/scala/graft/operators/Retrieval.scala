package graft.operators

import graft.functions.{Hashing, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-infrastructure operators over a document corpus: BM25 scoring,
  * inverted-index posting lists, and bigram next-token statistics. These are
  * the index-build / lexical-search half of a training-data pipeline (the
  * embedding half lives in [[Similarity]] / [[IvfIndex]]).
  *
  * Reference scope: the reference engine (jhu-data-parser) exposes keyed
  * lookup+enrich only; lexical retrieval is part of the LLM-pipeline
  * extension surface, not a port.
  */
object Retrieval {

  /** BM25 top-k lexical retrieval for one query (Robertson/Sparck Jones,
    * k1 = 1.2, b = 0.75), integer-exact across engines.
    *
    * Determinism: the classic BM25 term score
    * {{{ idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) }}}
    * mixes doubles (`avgdl`, `idf`) into a per-doc SUM, which is
    * order-dependent in a distributed fold. Instead, with k1 = 6/5 and
    * b = 3/4 the term score multiplies out to the integer rational
    * {{{ idfScaled * tf * 22 * totalLen  /  (10*tf*totalLen + 3*totalLen + 9*dl*nDocs) }}}
    * (numerator and denominator both scaled by `10 * totalLen`), where
    * `idfScaled = floor(ln(1 + (N-df+0.5)/(df+0.5)) * 1e6 + 0.5)` is
    * quantized ONCE per query term (the same cross-engine ln rule as the
    * q69/q75 scaled-long tables). Truncating integer division then gives an
    * exact per-term LONG, so per-doc scores are order-independent integer
    * sums — bit-identical in any engine.
    *
    * Overflow bound: `idfScaled * tf * 22 * totalLen` must fit a signed
    * long, i.e. `totalLen * tf * idfScaled <= ~4.2e17`. With idfScaled
    * <= ~2.1e7 (ln(1+2N) at a trillion docs ~ 28.3 -> 2.9e7) this caps the
    * exact-integer variant around 1e10 corpus tokens per verification
    * partition; beyond that, run it per shard (scores are per-doc, sharding
    * by doc is free) or accept double scoring in production and keep this
    * form for cross-engine verification.
    *
    * Scale design: tokens not in the (tiny, broadcast-literal) query term
    * set are dropped BEFORE the only shuffle, so the aggregation carries
    * `O(matching occurrences)` rows of (id, term) — never text, never the
    * full token stream. Corpus stats (N, totalLen) and per-term df are
    * scalar / |query|-sized aggregates joined back by broadcast. The final
    * top-k is a TakeOrdered, not a full sort.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
  ): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val toks = docs
      .select(col(idCol), TextAnalysis.wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("dl"), explode(col("__toks")).as("token"))
    // Corpus stats are a scalar aggregate over a narrow projection (partial
    // agg -> 1 row/partition) — NOT a groupBy(doc) over the exploded stream,
    // which would shuffle O(N) rows to learn two numbers.
    val totals = docs
      .select(size(TextAnalysis.wsTokens(col(textCol))).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    val tf = toks
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    val idf = tf
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      .select(
        col("token"),
        floor(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) * 1e6 + 0.5
        ).cast("long").as("idf_s"),
        col("n_docs"),
        col("total_len"),
      )
    tf.join(broadcast(idf), Seq("token"))
      .select(
        col(idCol),
        expr("(idf_s * tf * 22 * total_len) div (10 * tf * total_len + 3 * total_len + 9 * dl * n_docs)")
          .as("term_score"),
      )
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Inverted-index posting lists: one row per distinct token with its
    * document frequency and the sorted posting list of doc ids, rendered as
    * a comma-joined string (array outputs don't hash portably across the
    * oracle boundary; the string pins content AND order).
    *
    * Scale design: one explode of DISTINCT tokens per doc, one shuffle keyed
    * by token. A stopword-frequency token's posting list exceeds any single
    * aggregation buffer at web scale, so the head of the Zipf curve is
    * GUARDED: a pre-flight count-only pass (cheap partial aggregation — no
    * lists are materialized) fails loudly when any token's df exceeds
    * `maxDf`, pointing at [[postingListsSharded]]. The guard makes this
    * operator EAGER (one count job at call time). `minDf` is the opposite
    * knob (drop hapax tokens whose postings are useless for retrieval).
    */
  def postingLists(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int = 1,
      maxDf: Long = 10000000L,
  ): DataFrame = {
    val tok = docs.select(explode(TextAnalysis.tokenSet(col(textCol))).as("token"), col(idCol))
    val oversized = tok
      .groupBy(col("token"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxDf)
      .limit(1)
      .collect()
    if (oversized.nonEmpty) {
      val t = oversized.head.getString(0)
      val n = oversized.head.getLong(1)
      throw new IllegalStateException(
        s"postingLists: token '$t' has df=$n (> maxDf=$maxDf): its posting list would not fit one " +
          "aggregation buffer. Use postingListsSharded (bounded per-shard lists), or raise maxDf " +
          "deliberately."
      )
    }
    tok
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sort_array(collect_list(col(idCol))).as("__post"))
      .filter(col("df") >= minDf)
      .select(
        col("token"),
        col("df"),
        concat_ws(",", transform(col("__post"), _.cast("string"))).as("postings"),
      )
  }

  /** Sharded posting lists — the web-scale form of [[postingLists]]: each
    * token's postings are range-sharded over `ceil(df / maxPostings)`
    * deterministic doc-id hash buckets, so every (token, shard) row carries
    * ~`maxPostings` ids regardless of how deep into the Zipf head the token
    * sits. Tokens under the bound keep exactly one shard (shard 0), so the
    * common case degenerates to the unsharded shape plus a constant column.
    *
    * Scale design: pass 1 is a count-only df aggregation (partial-agg,
    * no lists); the df table joins back onto the token stream and the
    * list aggregation is keyed by (token, shard) — the hot token's rows
    * spread over its shard count instead of one reducer. The shard
    * assignment is the engine's md5-derived hash on the doc id:
    * deterministic, partition-independent, and mirrorable in any engine.
    *
    * The df-join-back is keyed by RAW token, so the Zipf-head token skews
    * that shuffle. Two stances, pick by vocab size:
    *  - `broadcastDf = true` (use whenever the distinct vocab fits an
    *    executor — tens of millions of tokens is ~100s of MB of
    *    (token, long)): the join becomes a broadcast hash join, no
    *    shuffle of the token stream at all, skew moot.
    *  - default shuffle join: DEPENDS ON AQE's skew-join split
    *    (`spark.sql.adaptive.skewJoin.enabled`, on by default) to split
    *    the hot token's partition; without AQE the head token's reducer
    *    is the straggler. Reserve for vocabularies too large to ship.
    */
  def postingListsSharded(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int = 1,
      maxPostings: Long = 100000L,
      broadcastDf: Boolean = false,
  ): DataFrame = {
    require(maxPostings >= 1, s"postingListsSharded: maxPostings must be >= 1: $maxPostings")
    val tok = docs.select(explode(TextAnalysis.tokenSet(col(textCol))).as("token"), col(idCol))
    val dfTab = tok
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    tok
      .join(if (broadcastDf) broadcast(dfTab) else dfTab, Seq("token"))
      .withColumn("shard", pmod(Hashing.hash64(col(idCol).cast("string")), expr(s"(df + ${maxPostings - 1}) div $maxPostings")))
      .groupBy(col("token"), col("shard"))
      .agg(
        min(col("df")).as("df"),
        count(lit(1)).as("shard_df"),
        sort_array(collect_list(col(idCol))).as("__post"),
      )
      .select(
        col("token"),
        col("df"),
        col("shard"),
        col("shard_df"),
        concat_ws(",", transform(col("__post"), _.cast("string"))).as("postings"),
      )
  }

  /** Per-token top-`topN` next tokens by bigram frequency, with the
    * conditional probability P(w2 | w1) as a scaled long
    * (`cnt * 1e6 div total(w1)` — exact integer division, so cross-engine
    * identical). The bigram-LM build step (and the data half of n-gram
    * autocomplete / next-token baselines).
    *
    * Scale design: bigrams are a pure projection (two shifted slices of the
    * token array zipped positionally — no positional self-join); the only
    * shuffle is the (w1, w2) count, which map-side combines. The per-w1
    * rank/total window rides the same key.
    */
  def bigramNextTopK(
      docs: DataFrame,
      textCol: String,
      topN: Int = 3,
  ): DataFrame = {
    val grams = docs
      .select(TextAnalysis.wsTokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("__w1s"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("__w2s"),
      )
      .select(explode(arrays_zip(col("__w1s"), col("__w2s"))).as("__g"))
      .select(col("__g.__w1s").as("w1"), col("__g.__w2s").as("w2"))
    val counted = grams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
    val byW1 = Window.partitionBy(col("w1"))
    counted
      .withColumn("rank", row_number().over(byW1.orderBy(col("cnt").desc, col("w2"))))
      .withColumn("total", sum(col("cnt")).over(byW1))
      .filter(col("rank") <= topN)
      .select(
        col("w1"),
        col("w2"),
        col("cnt"),
        col("rank"),
        expr("(cnt * 1000000) div total").as("p_scaled"),
      )
  }

  /** PMI collocations: adjacent token pairs ranked by pointwise mutual
    * information — `ln(p(a,b) / (p(a)·p(b)))` — the "natural phrase"
    * detector (vocabulary merging, tokenizer seeding, stop-phrase lists).
    *
    * Cross-engine exactness: PMI is decomposed into
    * `l(c_ab) + 2·l(N₁) − l(N₂) − l(c_a) − l(c_b)` with
    * `l(x) = floor(ln(x)·10⁶ + 0.5)` — the corpus ln-quantization rule
    * (q69): ln runs only on DISTINCT integer counts and every remaining
    * operation is exact 64-bit arithmetic, so both engines produce the
    * identical scaled-long score (and no product `c_ab·N₁²` ever risks
    * 64-bit overflow, which the direct ratio form would at corpus scale).
    *
    * Shape: one bigram count aggregate + one unigram count aggregate (both
    * map-side combined), two broadcast-scalar totals, and two broadcast
    * joins of the unigram table onto the bigram table (the unigram table is
    * vocabulary-sized). `minCount` drops hapax noise BEFORE the joins;
    * the TakeOrdered top-N never global-sorts.
    */
  def pmiCollocations(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 5,
      topN: Int = 100,
  ): DataFrame = {
    val l: Column => Column = x => floor(log(x.cast("double")) * 1000000 + 0.5).cast("long")
    val toks = graft.operators.Lineage.truncate(
      docs.select(TextAnalysis.wsTokens(col(textCol)).as("__toks"))
    )
    val grams = toks
      .filter(size(col("__toks")) >= 2)
      .select(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("__w1s"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("__w2s"),
      )
      .select(explode(arrays_zip(col("__w1s"), col("__w2s"))).as("__g"))
      .select(col("__g.__w1s").as("w1"), col("__g.__w2s").as("w2"))
    val bigrams = grams
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val unigrams = toks
      .select(explode(col("__toks")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c_w"))
    val n1 = unigrams.agg(sum(col("c_w")).as("__n1"))
    val n2 = grams.groupBy().agg(count(lit(1)).as("__n2"))
    bigrams
      .join(broadcast(unigrams.select(col("w").as("w1"), col("c_w").as("c_a"))), "w1")
      .join(broadcast(unigrams.select(col("w").as("w2"), col("c_w").as("c_b"))), "w2")
      .crossJoin(broadcast(n1))
      .crossJoin(broadcast(n2))
      .select(
        col("w1"),
        col("w2"),
        col("c_ab"),
        (l(col("c_ab")) + lit(2) * l(col("__n1")) - l(col("__n2")) - l(col("c_a")) - l(col("c_b")))
          .as("pmi_s"),
      )
      .orderBy(col("pmi_s").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Reciprocal-rank fusion: merge N ranked retrieval lists into one —
    * THE standard hybrid-search combiner (lexical BM25 ⊕ embedding ANN),
    * robust because it uses only ranks, never the incomparable raw scores.
    *
    * `rrf(d) = Σ_lists 1/(kRrf + rank_d)`, here as the exact integer
    * `10⁹ div (kRrf + rank)` per contribution — cross-engine-identical
    * with no float summation. Inputs are already tiny top-k lists, so the
    * fusion is a toy-sized aggregate; the heavy lifting happened in the
    * per-modality retrievers, which is the point of RRF at scale: each
    * index answers independently, fusion touches k·N rows.
    */
  def reciprocalRankFusion(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      kRrf: Int = 60,
      topN: Int = 10,
  ): DataFrame = {
    require(rankings.size >= 2, "reciprocalRankFusion: need at least two ranked lists")
    require(kRrf >= 1, s"reciprocalRankFusion: kRrf must be positive: $kRrf")
    val u = rankings
      .map(_.select(col(idCol), col(rankCol).cast("long").as("__rank")))
      .reduce(_ unionAll _)
    u.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lists"),
        sum(expr(s"1000000000 div ($kRrf + __rank)")).as("rrf_s"),
      )
      .orderBy(col("rrf_s").desc, col(idCol))
      .limit(topN)
  }

  /** EXACT heavy hitters by sketch-then-verify: phase 1 runs the bounded
    * [[graft.functions.FreqKAggregator]] Misra–Gries summary (one pass,
    * ≤ k counters per partition) to produce a candidate superset of every
    * value with frequency ≥ `minFreqNum/minFreqDen`; phase 2 re-counts
    * ONLY the candidates exactly (broadcast semi-join — the second pass's
    * aggregate touches ≤ k distinct keys) and thresholds with integer
    * cross-multiplication. The MG candidate set is partition-order-
    * sensitive, but it is always a SUPERSET of the true heavy hitters
    * (guaranteed for thresholds ≥ 1/(k+1), enforced below), so the final
    * exact-thresholded output is deterministic — the classic two-pass
    * answer to "exact top frequencies at 100 TB without shuffling the
    * full value census".
    *
    * Output: (value, cnt, n_total) for every value with
    * `cnt/n_total >= minFreqNum/minFreqDen`.
    */
  def heavyHitters(
      df: DataFrame,
      valueCol: Column,
      k: Int,
      minFreqNum: Int,
      minFreqDen: Int,
  ): DataFrame = {
    require(minFreqNum > 0 && minFreqDen > 0, s"threshold must be positive: $minFreqNum/$minFreqDen")
    require(
      minFreqNum.toLong * (k + 1) >= minFreqDen,
      s"heavyHitters: threshold $minFreqNum/$minFreqDen is below the MG guarantee 1/(k+1) for k=$k — " +
        "raise k or the threshold, or the candidate set may miss true heavy hitters",
    )
    val spark = df.sparkSession
    import spark.implicits._
    val vals = Lineage.truncate(df.select(valueCol.cast("string").as("v")))
    val cands = vals
      .as[String]
      .select(new graft.functions.FreqKAggregator(k).toColumn.name("cands"))
      .select(explode(col("cands")).as("v"))
    val total = vals.agg(count(lit(1)).as("n_total"))
    vals
      .join(broadcast(cands), Seq("v"), "left_semi")
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * minFreqDen >= col("n_total") * minFreqNum)
      .select(col("v").as("value"), col("cnt"), col("n_total"))
  }

  /** Scored (payload-carrying) sharded posting lists — the REAL IR index
    * format next to [[postingListsSharded]]'s id-only lists: each posting
    * carries `(doc, tf, dl)`, i.e. the term frequency and the inlined
    * length norm, so query-time BM25 needs NO join back to the corpus.
    * Hot tokens range-shard over `ceil(df / maxPostings)` deterministic
    * doc-hash buckets exactly like the id-only form; a (doc, token) pair
    * lives in exactly one shard.
    *
    * Scale: one (doc, token) aggregation builds the tf table (map-side
    * combined), one count-only pass learns df, and the list aggregation is
    * keyed by (token, shard) so no reducer sees more than ~`maxPostings`
    * payload structs.
    */
  def scoredPostings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPostings: Long,
  ): DataFrame = {
    require(maxPostings >= 1, s"scoredPostings: maxPostings must be >= 1: $maxPostings")
    val tf = Lineage.truncate(
      docs
        .select(col(idCol).as("doc"), TextAnalysis.wsTokens(col(textCol)).as("__toks"))
        .select(col("doc"), size(col("__toks")).as("dl"), explode(col("__toks")).as("token"))
        .groupBy(col("doc"), col("token"))
        .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    )
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(dfT, Seq("token"))
      .withColumn(
        "shard",
        pmod(Hashing.hash64(col("doc").cast("string")), expr(s"(df + ${maxPostings - 1}) div $maxPostings")),
      )
      .groupBy(col("token"), col("shard"))
      .agg(
        min(col("df")).as("df"),
        sort_array(collect_list(struct(col("doc"), col("tf"), col("dl")))).as("postings"),
      )
  }

  /** Query-time BM25 over a [[scoredPostings]] index + a norms table
    * (doc, dl): fetch the query terms' posting rows, explode the payloads,
    * score with the SAME integer-rational formula as [[bm25TopK]] — the
    * index answer is bit-identical to the corpus-scan answer (the
    * shard-transparency invariant q204 pins against q82's oracle). The
    * corpus itself is never touched: totals are a scalar aggregate over
    * the norms table, and everything else is query-term-sized.
    */
  def bm25FromIndex(
      postings: DataFrame,
      norms: DataFrame,
      queryTerms: Seq[String],
      k: Int,
  ): DataFrame = {
    require(queryTerms.nonEmpty, "bm25FromIndex: empty query")
    val totals = norms.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    val sel = postings.filter(col("token").isin(queryTerms: _*))
    val tfRows = sel.select(col("token"), col("df"), explode(col("postings")).as("p"))
      .select(col("token"), col("df"), col("p.doc").as("doc"), col("p.tf").as("tf"), col("p.dl").as("dl"))
    val idf = sel
      .groupBy(col("token"))
      .agg(min(col("df")).as("df"))
      .crossJoin(broadcast(totals))
      .select(
        col("token"),
        floor(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) * 1e6 + 0.5
        ).cast("long").as("idf_s"),
        col("n_docs"),
        col("total_len"),
      )
    tfRows
      .join(broadcast(idf), Seq("token"))
      .select(
        col("doc"),
        expr("(idf_s * tf * 22 * total_len) div (10 * tf * total_len + 3 * total_len + 9 * dl * n_docs)")
          .as("term_score"),
      )
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_terms"), sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
  }
}
