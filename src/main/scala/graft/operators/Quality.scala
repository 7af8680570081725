package graft.operators

import graft.functions.{Hashing, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level quality scoring for a training-data pipeline: the unigram-LM
  * surprisal gate (the perplexity-style filter) and Gopher-shape repetition
  * rules. DataFrame-level operators live here; the per-row quality features
  * are [[graft.functions.TextAnalysis]] projections.
  */
object Quality {

  /** Broadcast-head/shuffle-tail weighted scoring join — the shared Zipf
    * pattern behind [[unigramSurprisal]], [[importanceWeights]], and
    * [[bigramSurprisal]]: join each `(id, key…, __tf)` occurrence row to
    * its key's weight, routing the top-`headK` keys (by `orderCol`)
    * through a broadcast and only the tail occurrences through a shuffle
    * join that has NO skewed keys left by construction (any key more
    * frequent than the head's floor is in the head). Every occurrence
    * takes exactly one path, so the union is the same multiset either way.
    * Returns `(idCol, __s = weight·__tf, __tf)`; `weights` must be
    * materialized by the caller — it feeds the head limit AND the tail
    * join.
    */
  private def headTailScore(
      tf: DataFrame,
      idCol: String,
      keyCols: Seq[String],
      weights: DataFrame,
      orderCol: String,
      wCol: String,
      headK: Int,
  ): DataFrame = {
    val head = broadcast(
      weights
        .orderBy(col(orderCol).desc +: keyCols.map(col): _*)
        .limit(headK)
        .select(keyCols.map(col) :+ col(wCol): _*)
    )
    val tagged = tf.join(head, keyCols, "left_outer")
    val headHits =
      tagged.filter(col(wCol).isNotNull).select(col(idCol), (col(wCol) * col("__tf")).as("__s"), col("__tf"))
    val tailHits = tagged
      .filter(col(wCol).isNull)
      .select(col(idCol) +: keyCols.map(col) :+ col("__tf"): _*)
      .join(weights.select(keyCols.map(col) :+ col(wCol): _*), keyCols)
      .select(col(idCol), (col(wCol) * col("__tf")).as("__s"), col("__tf"))
    headHits.unionAll(tailHits)
  }

  /** Per-doc average surprisal under the corpus unigram distribution — the
    * perplexity-style quality gate (garbage text scores high, boilerplate
    * scores low).
    *
    * Determinism: `ln()` runs once per DISTINCT vocab token and is quantized
    * to a scaled LONG there, so per-doc totals are exact integer sums —
    * order-independent, no double accumulation to mirror cross-engine.
    *
    * Scale design — the vocab is Zipf-distributed and, at web scale, too big
    * to broadcast whole (a multi-billion-token vocab blows the 8 GB
    * broadcast cap). So the per-token log-prob table is split:
    *
    *  - the top-`headK` tokens by count broadcast (bounded by construction,
    *    and they cover the overwhelming mass of token OCCURRENCES — that
    *    join is a map-side lookup for almost every row, and it absorbs
    *    every Zipf hot key);
    *  - only the remaining tail occurrences shuffle-join the full table,
    *    and that shuffle has NO skewed keys left by construction (any
    *    token more frequent than the head's floor is in the head).
    *
    * Every token occurrence takes exactly one of the two paths, so the
    * union is the same multiset of (doc, lps) either way — results are
    * bit-identical to a single whole-vocab broadcast join.
    */
  def unigramSurprisal(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      headK: Int = 100000,
  ): DataFrame = {
    val tok = docs.select(col(idCol), explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
    // ONE corpus tokenization pass: the per-(doc, token) occurrence counts
    // are materialized (Lineage.truncate — no DataFrame CSE otherwise), and
    // the vocab, the head table, and BOTH scoring paths derive from them.
    // Occurrence sums become tf-weighted sums — identical integers.
    val tf = Lineage.truncate(tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__tf")))
    val vocab = tf.groupBy(col("token")).agg(sum(col("__tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    // Materialized once: both the head limit and the tail join read it, and
    // neither may recompute the corpus-wide count.
    val lp = vocab
      .crossJoin(broadcast(total))
      .select(
        col("token"),
        col("cnt"),
        floor(log(col("cnt").cast("double") / col("total")) * 1e6 + 0.5).cast("long").as("lps"),
      )
      .transform(Lineage.truncate(_))
    headTailScore(tf, idCol, Seq("token"), lp, orderCol = "cnt", wCol = "lps", headK = headK)
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"), sum(col("__s")).as("s"))
      .select(
        col(idCol),
        col("n_tokens"),
        (-(col("s").cast("double") / col("n_tokens")) / 1e6).as("avg_neg_logp"),
      )
  }

  /** Per-doc bigram surprisal under the corpus bigram LM — the FLUENCY
    * gate: a doc whose words are real but shuffled has perfect unigram
    * stats and catastrophic bigram stats, so this catches template spam,
    * keyword stuffing, and MT word salad that [[unigramSurprisal]] scores
    * as fine. `p(w2|w1) = c(w1,w2) / c(w1·)` needs no smoothing or backoff
    * here: the model is trained on the corpus it scores, so every scored
    * bigram exists by construction.
    *
    * Determinism: `ln` quantized to a scaled long once per DISTINCT bigram
    * (the q69 rule) — per-doc totals are exact integer sums. Docs with < 2
    * tokens have no bigrams and produce no row (same contract as q69's
    * empty-token docs).
    *
    * Scale design: one (doc, w1, w2, tf) pass materialized once; the
    * bigram log-prob table splits broadcast-head / shuffle-tail exactly
    * like [[unigramSurprisal]] (the head absorbs every Zipf-hot bigram, so
    * the tail shuffle has no skewed keys); the context-count join
    * (`c(w1·)`) runs over the BIGRAM TYPE table, not the corpus stream.
    */
  def bigramSurprisal(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      headK: Int = 100000,
  ): DataFrame = {
    val grams = docs
      .select(col(idCol), TextAnalysis.wsTokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(
        col(idCol),
        explode(
          arrays_zip(
            slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("__w1s"),
            slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("__w2s"),
          )
        ).as("__g"),
      )
      .select(col(idCol), col("__g.__w1s").as("w1"), col("__g.__w2s").as("w2"))
    val bf = Lineage.truncate(grams.groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("__tf")))
    val bt = bf.groupBy(col("w1"), col("w2")).agg(sum(col("__tf")).as("c12"))
    val ut = bt.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val lp = bt
      .join(ut, Seq("w1"))
      .select(
        col("w1"),
        col("w2"),
        col("c12"),
        floor(log(col("c12").cast("double") / col("c1")) * 1e6 + 0.5).cast("long").as("lps"),
      )
      .transform(Lineage.truncate(_))
    headTailScore(bf, idCol, Seq("w1", "w2"), lp, orderCol = "c12", wCol = "lps", headK = headK)
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_bigrams"), (-sum(col("__s"))).as("surprisal_scaled"))
  }

  /** DSIR-style importance weights (Xie et al. 2023's data-selection rule,
    * unigram form): per doc, `score = Σ_t tf(t) · (ln p_target(t) − ln
    * p_raw(t))` — docs that look like the TARGET distribution (the
    * high-quality subset `targetCol` marks) score high, generic corpus
    * boilerplate scores ~0, anti-target garbage scores negative. Rank or
    * threshold on it to resample the corpus toward the target domain.
    *
    * Determinism: both distributions are add-1 smoothed over the SHARED raw
    * vocab (every raw token has a defined target probability — no OOV
    * special case), each `ln` runs once per DISTINCT token and is quantized
    * to a scaled long there (the q69/q101 rule), so per-doc scores are
    * exact integer sums — order-independent, bit-identical cross-engine.
    *
    * Scale design: identical shape to [[unigramSurprisal]] — ONE corpus
    * tokenization pass materialized as (doc, token, tf); the per-token
    * weight table splits into a broadcast top-`headK` head (absorbs every
    * Zipf hot key) and a skew-free shuffle-joined tail; the target subset
    * adds only a conditional sum to the vocab aggregation, not a second
    * pass.
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCol: Column,
      headK: Int = 100000,
  ): DataFrame = {
    val tok = docs.select(col(idCol), targetCol.as("__tgt"), explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
    val tf = Lineage.truncate(
      tok.groupBy(col(idCol), col("__tgt"), col("token")).agg(count(lit(1)).as("__tf"))
    )
    val vocab = tf
      .groupBy(col("token"))
      .agg(
        sum(col("__tf")).as("cnt_r"),
        sum(when(col("__tgt"), col("__tf")).otherwise(0L)).as("cnt_t"),
      )
    val totals = vocab.agg(sum(col("cnt_r")).as("tot_r"), sum(col("cnt_t")).as("tot_t"), count(lit(1)).as("nv"))
    val w = vocab
      .crossJoin(broadcast(totals))
      .select(
        col("token"),
        col("cnt_r"),
        (floor(log((col("cnt_t") + 1).cast("double") / (col("tot_t") + col("nv"))) * 1e6 + 0.5).cast("long")
          - floor(log((col("cnt_r") + 1).cast("double") / (col("tot_r") + col("nv"))) * 1e6 + 0.5).cast("long"))
          .as("w"),
      )
      .transform(Lineage.truncate(_))
    headTailScore(tf, idCol, Seq("token"), w, orderCol = "cnt_r", wCol = "w", headK = headK)
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"), sum(col("__s")).as("score_scaled"))
  }

  /** Gopher-shape per-doc quality metrics (Rae et al. 2021 §A1.1 rule
    * family: word-count bounds, mean word length, stopword presence,
    * alphabetic-word fraction) as named projection columns over a HOISTED
    * raw token array (pass an attribute, not `wsTokens(text)` inline —
    * Catalyst re-inlines shared non-attribute subtrees per use). Integer
    * counts plus one int-sum/int division, so every metric is bit-identical
    * cross-engine; thresholding into pass/fail flags is the caller's policy.
    */
  def gopherMetrics(toks: Column): Seq[(String, Column)] = Seq(
    "n_words" -> size(toks),
    "mean_word_len" ->
      aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _).cast("double") / size(toks),
    "stop_hits" -> TextAnalysis.stopwordHits(toks, "en"),
    "alpha_words" -> size(filter(toks, t => t.rlike("[A-Za-z]"))),
  )

  /** Deterministic per-stratum hash sampling: keep a row iff the salted
    * 60-bit content hash falls under its stratum's rate — `sampleBy` without
    * RNG state, reproducible on any engine and any partitioning (the usual
    * class-rebalancing step before training). Pure projection+filter: no
    * shuffle, prunes at the scan.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "strat:",
  ): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"sampling rate must be in [0, 1]: $r")
    )
    // math.round, not toLong: 0.29 * 10000 is 2899.999...; truncation would
    // put the threshold 1 bp under the documented rate.
    val bucket = Hashing.hash64(concat(lit(salt), keyCol)) % 10000L
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultRate * 10000))) {
      case (acc, (stratum, rate)) => when(strataCol === stratum, lit(math.round(rate * 10000))).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Downsample every class to ≈ the minority class's size — the static
    * mixture-rebalancing step of dataset assembly ([[stratifiedHashSample]]
    * with the rates COMPUTED from the data instead of passed in). Each
    * class's keep-rate is the exact integer basis-points
    * `minCount * 10000 div count(class)`, so the rate table is engine- and
    * order-independent; membership is the same salted content-hash rule as
    * every sampler here (no RNG state, reproducible on any partitioning).
    *
    * Scale design: the per-class counts are one partial-aggregated pass; the
    * rate table is |classes| rows and broadcasts back, so the sampling pass
    * is a map-side join + scan-speed filter.
    */
  def balancedSample(
      df: DataFrame,
      keyCol: Column,
      classCol: Column,
      salt: String = "bal:",
  ): DataFrame = {
    // two consumers (min + rates) — materialize the |classes|-row stats once
    val counts = Lineage.truncate(df.groupBy(classCol.as("__cls")).agg(count(lit(1)).as("__cnt")))
    val minCnt = counts.agg(min(col("__cnt")).as("__mn"))
    val rates = counts
      .crossJoin(broadcast(minCnt))
      .select(col("__cls"), expr("__mn * 10000 div __cnt").as("__rate_bp"))
    val bucket = Hashing.hash64(concat(lit(salt), keyCol)) % 10000L
    df.join(broadcast(rates), classCol === col("__cls"))
      .filter(bucket < col("__rate_bp"))
      .drop("__cls", "__rate_bp")
  }

  /** Per-doc out-of-vocabulary rate against the corpus top-`vocabK` tokens —
    * the tokenizer-coverage check run before committing to a vocab size.
    * The vocab is a TakeOrdered top-k (per-partition heaps, no global
    * sort; ties at the boundary break on the token string so the set is
    * deterministic) and broadcasts by construction (`vocabK` rows); the
    * per-doc side is one partial-aggregated count over the exploded tokens.
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String, vocabK: Int): DataFrame = {
    val tok = docs.select(col(idCol), explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
    // ONE corpus tokenization: the per-(doc, token) counts are materialized
    // and both the vocab top-k and the per-doc coverage derive from them
    // (occurrence counts become tf-weighted sums — identical integers)
    val tf = Lineage.truncate(tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("__tf")))
    val vocab = tf
      .groupBy(col("token"))
      .agg(sum(col("__tf")).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(vocabK)
      .select(col("token"), lit(1).as("__iv"))
    tf
      .join(broadcast(vocab), Seq("token"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        sum(col("__tf")).as("n_tokens"),
        sum(when(col("__iv").isNull, col("__tf")).otherwise(0L)).as("n_oov"),
      )
      .select(
        col(idCol),
        col("n_tokens"),
        col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"),
      )
  }

  /** Split documents into overlapping token-window chunks — the doc→chunk
    * step ahead of embedding/indexing. Chunk `i` covers tokens
    * `[i·stride, i·stride + chunkTokens)` with `stride = chunkTokens -
    * overlap`; every doc yields at least one chunk (short docs → one short
    * chunk). Pure projection (hoisted token array + `sequence`/`transform`/
    * `slice` + explode): zero shuffle, streams at scan speed, and the
    * chunk count per doc is data-derived so no driver-side work. All chunk
    * arithmetic is integer and shared verbatim with the oracle.
    */
  def chunkDocuments(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int,
  ): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens, s"need 0 <= overlap < chunkTokens: $overlap, $chunkTokens")
    val stride = chunkTokens - overlap
    val chunked = docs
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .withColumn(
        "__nchunks",
        floor((greatest(size(col("__toks")) - overlap, lit(1)) + lit(stride - 1).cast("double")) / stride).cast("int"),
      )
      .select(
        col(idCol),
        size(col("__toks")).as("__n"),
        explode(
          transform(
            sequence(lit(0), col("__nchunks") - 1),
            i =>
              struct(
                i.cast("int").as("chunk_id"),
                array_join(slice(col("__toks"), i * stride + 1, lit(chunkTokens)), " ").as("chunk"),
              ),
          )
        ).as("__c"),
      )
    chunked.select(
      col(idCol),
      col("__c.chunk_id").as("chunk_id"),
      greatest(least(col("__n") - col("__c.chunk_id") * stride, lit(chunkTokens)), lit(0)).cast("int").as("n_tokens"),
      col("__c.chunk").as("chunk"),
    )
  }

  /** Quality-filter funnel report: apply `rules` (ordered (name, predicate)
    * pairs) CUMULATIVELY and report, per stage, how many docs enter, pass,
    * and drop — the dataset-card accounting that tells you WHICH rule costs
    * the corpus what (a gate that silently drops 40% to one rule is a bug
    * report, not a filter).
    *
    * Scale design: ONE partial-aggregated scan — every cumulative predicate
    * is a conditional sum in the same aggregate, the single result row
    * explodes into |rules| output rows driver-free. No shuffle carries more
    * than one row.
    */
  def filterFunnel(docs: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "filterFunnel: need at least one rule")
    val cums = rules.scanLeft(lit(true))((acc, r) => acc && r._2).tail
    // coalesce: sum() over zero qualifying rows (empty corpus, or a
    // predicate that is NULL for every row) is NULL in Spark but the
    // CASE-WHEN mirror sums to 0 — pin the 0.
    val aggs = (count(lit(1)).as("__n") +:
      cums.zipWithIndex.map { case (c, i) => coalesce(sum(c.cast("long")), lit(0L)).as(s"__p$i") })
    val one = docs.agg(aggs.head, aggs.tail: _*)
    val stages = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(i + 1).as("stage"),
        lit(name).as("rule"),
        (if (i == 0) col("__n") else col(s"__p${i - 1}")).as("n_in"),
        col(s"__p$i").as("n_pass"),
      )
    }
    one
      .select(explode(array(stages: _*)).as("s"))
      .select(
        col("s.stage"),
        col("s.rule"),
        col("s.n_in"),
        col("s.n_pass"),
        (col("s.n_in") - col("s.n_pass")).as("n_drop"),
      )
  }

  /** Greedy sequence packing: assign docs to fixed-token-budget packs — the
    * training-batch prep op that turns variable-length docs into dense
    * `capacityTokens`-sized training rows. Greedy in id order per SHARD:
    * `pack_id = floor(tokens-before-me / capacity)` under a window
    * partitioned by `shard = id mod shards`.
    *
    * `shards` is a per-call parameter (not engine policy): it is the
    * packing parallelism knob — at 100 TB set it to ~executor-count × a
    * small factor so each shard's running-sum window sorts only its slice
    * and nothing needs a global sort; packs never span shards by
    * construction.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shards: Int,
      capacityTokens: Int,
  ): DataFrame = {
    require(shards >= 1, s"packSequences: shards must be >= 1: $shards")
    require(capacityTokens >= 1, s"packSequences: capacityTokens must be >= 1: $capacityTokens")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .select(
        col(idCol),
        (col(idCol) % shards).as("shard"),
        size(TextAnalysis.wsTokens(col(textCol))).as("n_tokens"),
      )
      .withColumn(
        "cum_before",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)),
      )
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens"),
        floor(col("cum_before") / capacityTokens.toDouble).cast("long").as("pack_id"),
      )
  }

  /** Domain-level quality gate: keep documents whose SOURCE's aggregate
    * stopword ratio is at least the corpus-wide ratio — the spam-domain
    * filter that per-doc scoring misses (a boilerplate farm's individual
    * pages each look plausible; the domain aggregate gives it away). The
    * gate is self-calibrating (source ratio vs corpus ratio, both exact
    * integer basis points over the SAME token counts), so there is no
    * tuned threshold to drift between engines.
    *
    * Scale design: one partial-aggregated pass builds the per-source
    * (stop_hits, n_tokens) table — fixed-width ints keyed by source, never
    * text; the corpus ratio folds over that |sources|-row table on a single
    * partition, and the verdict table broadcasts back, so the keep/drop
    * pass is a map-side join at scan speed.
    */
  def sourceQualityGate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
  ): DataFrame = {
    // two consumers (corpus ratio + verdict) — materialize the
    // |sources|-row stats once instead of scanning the corpus twice
    val perSource = Lineage.truncate(
      docs
        .withColumn("__toks", TextAnalysis.wsTokens(col(textCol))) // hoisted: attribute, not re-inlined per use
        .groupBy(col(sourceCol).as("__src"))
        .agg(
          sum(TextAnalysis.stopwordHits(col("__toks"), "en").cast("long")).as("__sh"),
          sum(size(col("__toks")).cast("long")).as("__nt"),
        )
    )
    val corpus = perSource.agg(sum(col("__sh")).as("__csh"), sum(col("__nt")).as("__cnt"))
    val verdict = perSource
      .crossJoin(broadcast(corpus))
      .select(
        col("__src"),
        expr("__sh * 10000 div __nt").as("src_stop_bp"),
        expr("(__sh * 10000 div __nt) >= (__csh * 10000 div __cnt)").as("__keep"),
      )
    docs
      .join(broadcast(verdict), col(sourceCol) === col("__src"))
      .filter(col("__keep"))
      .select(col(idCol), col(sourceCol), col("src_stop_bp"))
  }

  /** Length-curriculum bucketing: assign every document to one of `nBuckets`
    * corpus-quantile buckets of its whitespace token count — the
    * short-to-long ordering key for curriculum schedules and the
    * length-stratification key for eval sampling. Fences are DISCRETE
    * quantiles (`percentile_disc`: actual data values, the q88 rule), so
    * ties share a bucket and the assignment is engine-exact; bucket i covers
    * counts in (fence_{i-1}, fence_i].
    *
    * Scale design: the fence row is one exact-percentile aggregation — it
    * buffers the token-count COLUMN (a long per doc, not text) on one
    * partition, the documented cost of exact quantiles (q40); at larger
    * scale the same operator takes pre-aggregated (count, n_docs) input.
    * The single fence row broadcasts back and assignment is a pure
    * projection fold over the fence array.
    */
  def curriculumBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int,
  ): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets: $nBuckets")
    // two consumers (fence agg + assignment) — materialize the narrow
    // (id, long) projection once so the corpus tokenizes exactly once
    val counted = Lineage.truncate(
      docs.select(col(idCol), size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("n_tokens"))
    )
    val fenceCols = (1 until nBuckets).map { i =>
      val q = i.toDouble / nBuckets
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY n_tokens)").as(s"__f$i")
    }
    val fences = counted
      .agg(fenceCols.head, fenceCols.tail: _*)
      .select(array((1 until nBuckets).map(i => col(s"__f$i")): _*).as("__fences"))
    counted
      .crossJoin(broadcast(fences))
      .select(
        col(idCol),
        col("n_tokens"),
        aggregate(col("__fences"), lit(0), (acc, f) => acc + when(col("n_tokens") > f, 1).otherwise(0))
          .cast("int")
          .as("bucket"),
      )
  }

  /** The counting step of one BPE merge: adjacent symbol-pair frequencies
    * over the corpus, weighted by word frequency — the primitive a tokenizer
    * trainer iterates (here with characters as the initial symbols, i.e.
    * the first merge's exact candidate table). Returns the top-`k` pairs by
    * weighted count, ties broken on the pair string so the cut is
    * total-ordered.
    *
    * Scale design: pair enumeration runs over the DISTINCT-token count
    * table, not the corpus — the corpus pass is the same map-side-combined
    * token count as vocabulary building (q68), and the pair fan-out is
    * bounded by token length × |vocab|. Top-k is a TakeOrdered (per-
    * partition heaps), no global sort.
    */
  def bpeMergeCandidates(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val tokCnt = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("__cnt"))
    tokCnt
      .select(
        // NB: Spark's sequence(1, 0) counts DOWN (implicit -1 step), so a
        // 1-char token must short-circuit to an empty pair list explicitly.
        explode(
          expr(
            """CASE WHEN length(token) > 1
                 THEN transform(sequence(1, length(token) - 1), i -> substring(token, i, 2))
                 ELSE array() END"""
          )
        ).as("pair"),
        col("__cnt"),
      )
      .groupBy(col("pair"))
      .agg(sum(col("__cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** Top-`k` TF-IDF terms per document. tf = per-(doc, token) count;
    * idf = ln((N+1)/(df+1)) computed once per DISTINCT token and quantized
    * to a scaled LONG there (cross-engine ln rule — scores are then exact
    * integer products); top-k via per-doc row_number.
    *
    * Scale shape: both aggregations are partial (map-side combine) keyed by
    * high-cardinality keys; the idf join keys on token and AQE broadcasts
    * the (distinct-token-sized) idf side when it fits; the window partitions
    * by doc — no global sort anywhere.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tok = docs.select(col(idCol), explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
    // tf feeds BOTH the df-count and the scoring join — materialize once
    // (no DataFrame CSE) so the corpus tokenizes exactly once
    val tf = Lineage.truncate(tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val idf = dfreq
      .crossJoin(broadcast(n))
      .select(
        col("token"),
        floor(log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) * 1e6 + 0.5).cast("long").as("idfs"),
      )
    val scored = tf.join(idf, "token").select(col(idCol), col("token"), (col("tf") * col("idfs")).as("score"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("score"))
  }

  /** Weighted sampling WITHOUT replacement, deterministic (Efraimidis–
    * Spirakis): each row draws a pseudo-uniform `u = hash64(id)/2^60` and is
    * ranked by `u^(1/w)` — taking the n largest keys samples n items with
    * inclusion probability increasing in weight `w`, with no RNG state
    * (replayable, shardable, engine-agnostic — the weighted sibling of the
    * q48/q74 salted-hash samplers).
    *
    * Cross-engine exactness: the rank key is `lq(u) / w` in log space,
    * where `lq(x) = floor(ln(x)·10⁶ + 0.5)` is the corpus ln-quantization
    * rule — ln runs once per distinct hash, the division is one IEEE
    * double op with identical operand shapes in both engines, and the
    * (key DESC, id) order is total. One projection + TakeOrdered top-n:
    * no shuffle carries more than n rows per partition.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      n: Int,
  ): DataFrame = {
    require(n > 0, s"weightedSample: n must be positive: $n")
    val u = Hashing.hash64(col(idCol).cast("string")).cast("double") / lit((1L << 60).toDouble)
    val lq = floor(log(u) * 1000000 + 0.5).cast("long")
    df.select(col(idCol), weightCol.cast("long").as("weight"))
      .withColumn("key", lq.cast("double") / col("weight"))
      .orderBy(col("key").desc, col(idCol))
      .limit(n)
  }

  /** Per-stratum [[weightedSample]]: n items per group, same deterministic
    * Efraimidis–Spirakis rank key — per-domain token-weighted subsampling
    * ("keep the n most sampling-worthy docs of EVERY source").
    *
    * The per-group top-n uses the bounded [[graft.functions.TopKAggregator]]
    * (key as the score, ties to the lower id — exactly the (key DESC, id)
    * order), so the shuffle carries ≤ n rows per (group × partition)
    * instead of sorting every group's rows under a row_number window.
    */
  def weightedSampleByGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: Column,
      nPerGroup: Int,
  ): DataFrame = {
    require(nPerGroup > 0, s"weightedSampleByGroup: nPerGroup must be positive: $nPerGroup")
    val spark = df.sparkSession
    import spark.implicits._
    val u = Hashing.hash64(col(idCol).cast("string")).cast("double") / lit((1L << 60).toDouble)
    val lq = floor(log(u) * 1000000 + 0.5).cast("long")
    df.select(
      col(groupCol),
      (lq.cast("double") / weightCol.cast("long")).as("__key"),
      col(idCol),
    )
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new graft.functions.TopKAggregator(nPerGroup).toColumn)
      .flatMap { case (g, items) =>
        items.zipWithIndex.map { case ((key, id), i) => (g, i + 1, id, key) }
      }
      .toDF(groupCol, "rank", idCol, "key")
  }

  /** Per-group KL divergence of the group's unigram distribution from the
    * whole-corpus distribution — the domain-drift / "how unusual is this
    * source" card metric (large KL = the slice speaks its own dialect).
    *
    * `KL(p_g ‖ p) = Σ_t p_g(t)·ln(p_g(t)/p(t))` decomposed into quantized
    * ln terms of pure integer counts (the q69/q136 rule):
    * `kl_scaled = Σ_t c_gt · (l(c_gt) + l(N) − l(N_g) − l(c_t))` with
    * `l(x) = floor(ln(x)·10⁶ + 0.5)` — ln runs only on distinct integer
    * counts, the weighted sum is exact 64-bit arithmetic, and the final
    * per-token-average `kl_e6 = kl_scaled / N_g` is one IEEE division.
    * Nonnegative up to quantization (±1e-6·ln-unit per term).
    *
    * Shape: ONE tokenization pass materialized, feeding the (group, token)
    * counts, the vocabulary-sized corpus count table (broadcast back), and
    * both totals (broadcast scalars) — the corpus text never shuffles.
    */
  def sourceKlDivergence(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
  ): DataFrame = {
    val l: Column => Column = x => floor(log(x.cast("double")) * 1000000 + 0.5).cast("long")
    val tok = Lineage.truncate(
      docs.select(col(groupCol), explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
    )
    val gt = tok.groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("c_gt"))
    val ct = tok.groupBy(col("token")).agg(count(lit(1)).as("c_t"))
    val ng = tok.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    val n = tok.agg(count(lit(1)).as("n_total"))
    gt.join(broadcast(ct), "token")
      .join(broadcast(ng), groupCol)
      .crossJoin(broadcast(n))
      .groupBy(col(groupCol))
      .agg(
        max(col("n_g")).as("n_tokens"),
        sum(col("c_gt") * (l(col("c_gt")) + l(col("n_total")) - l(col("n_g")) - l(col("c_t"))))
          .as("kl_scaled"),
      )
      .withColumn("kl_e6", col("kl_scaled").cast("double") / col("n_tokens").cast("double"))
  }

  /** Per-group simple linear regression (y on x) in CLOSED FORM from exact
    * integer sums — slope, intercept, and r² with NO order-dependent
    * floating accumulation: the five sufficient statistics (Σx, Σy, Σx²,
    * Σxy, Σy²) accumulate in DECIMAL(38,0) (exact, associative — any
    * partial-aggregation order yields identical sums), and the closed-form
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)` etc. then runs on SCALARS,
    * one fixed IEEE expression per group that any engine reproduces
    * bit-identically (the [[graft.operators.EventAnalytics.kmvJoinEstimate]]
    * stance: exact integer reduction, then mirrored double arithmetic).
    * Degenerate groups (constant x, or constant y for r²) yield NULL, not
    * ±Inf/NaN.
    *
    * Inputs are cast to long; the caller quantizes non-integer features
    * (and keeps |x·y| within long — the per-ROW products are 64-bit, only
    * their SUMS get 128-bit headroom).
    *
    * Scale design: one partial-aggregated groupBy pass — five decimal
    * accumulators per group travel, never rows; the projection after is
    * per-group scalar math.
    */
  /** Zipf power-law fit of the corpus token-frequency distribution:
    * regress quantized `ln(freq)` on quantized `ln(rank)` over the whole
    * vocabulary — the slope is the Zipf exponent (≈ −1 for natural text),
    * a one-number dataset-card diagnostic for degenerate/templated corpora
    * (synthetic boilerplate flattens the curve). Pure composition:
    * frequency ranks come from [[Dedup.globalRank]] (order-aligned
    * negated-frequency buckets — no single-partition sort of the vocab),
    * the ln quantization is the corpus-wide `l(x) = floor(ln(x)·10⁶+0.5)`
    * rule, and the fit is [[regressionStats]]' exact-sum closed form.
    */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val l: Column => Column = x => floor(log(x.cast("double")) * 1000000 + 0.5).cast("long")
    val vocab = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
    val ranked = Dedup.globalRank(
      vocab.withColumn("__nf", -col("freq")),
      sortCols = Seq(col("__nf"), col("token")),
      bucket = expr("__nf div 16"),
    )
    regressionStats(
      ranked.withColumn("corpus", lit("corpus")),
      "corpus",
      x = l(col("rank")),
      y = l(col("freq")),
    )
  }

  def regressionStats(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def dsum38(c: Column) = sum(c.cast(d38)).cast("double")
    val sums = df
      .select(col(groupCol), x.cast("long").as("__x"), y.cast("long").as("__y"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        dsum38(col("__x")).as("__sx"),
        dsum38(col("__y")).as("__sy"),
        dsum38(col("__x") * col("__x")).as("__sxx"),
        dsum38(col("__x") * col("__y")).as("__sxy"),
        dsum38(col("__y") * col("__y")).as("__syy"),
      )
    sums
      .withColumn("__nd", col("n").cast("double"))
      .withColumn("__num", col("__nd") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__denx", col("__nd") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__deny", col("__nd") * col("__syy") - col("__sy") * col("__sy"))
      .select(
        col(groupCol),
        col("n"),
        when(col("__denx") === 0, lit(null)).otherwise(col("__num") / col("__denx")).as("slope"),
        when(col("__denx") === 0, lit(null))
          .otherwise((col("__sy") - (col("__num") / col("__denx")) * col("__sx")) / col("__nd"))
          .as("intercept"),
        when(col("__denx") === 0 || col("__deny") === 0, lit(null))
          .otherwise((col("__num") * col("__num")) / (col("__denx") * col("__deny")))
          .as("r2"),
      )
  }

  /** Per-group nucleus (top-p) vocabulary: the head tokens covering
    * `pNum/pDen` of each group's token mass — the truncation a tokenizer
    * or mixture builder applies before the Zipf tail swamps the budget.
    * Keep rule in exact cross-multiplied integers:
    * `(cum − cnt)·pDen < total·pNum` — a token is kept iff the mass BEFORE
    * it is strictly under the target, so the crossing token is included
    * and the kept set is the minimal prefix reaching p. Head order is
    * (count desc, token) — total and deterministic.
    *
    * Scale: counts partial-aggregate map-side; the rank/total windows share
    * ONE group exchange over the (group, token) COUNT table (vocab-sized,
    * not corpus-sized). Output is the nucleus head only — the Zipf tail
    * never leaves the filter.
    */
  def nucleusVocab(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      pNum: Int,
      pDen: Int,
  ): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val wg = Window.partitionBy(col(groupCol))
    val wr = wg.orderBy(col("cnt").desc, col("token"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("total", sum(col("cnt")).over(wg))
      .withColumn("cum", sum(col("cnt")).over(wr))
      .filter((col("cum") - col("cnt")) * pDen < col("total") * pNum)
      .select(col(groupCol), col("token"), col("cnt"), col("cum"), col("total"))
  }

  /** Greedy token-budget corpus selection: order docs by quality DENSITY
    * (integer per-mille `score·1000 div cost` — quantized so the order is
    * engine-exact), take the prefix whose cumulative cost fits `budget`.
    * The knapsack-greedy that answers "which docs make the best 50 B-token
    * corpus?" — output size is bounded by the BUDGET, not the corpus.
    *
    * Scale design: the global running sum needs a total order but NOT a
    * global sort — the [[Dedup.globalRank]] two-phase trick with SUM
    * instead of COUNT: per-density-bucket cost totals (tiny table) become
    * broadcast cumulative offsets (the one single-partition window runs on
    * |buckets| ≤ 1001 rows), the within-bucket running sum rides a
    * bucket-partitioned exchange, and the global cumulative cost is
    * `offset + local`. Since cost > 0 the cumulative sum is monotone along
    * (density desc, id), so `cum <= budget` IS the greedy prefix.
    */
  def selectUnderBudget(
      df: DataFrame,
      idCol: String,
      score: Column,
      cost: Column,
      budget: Long,
  ): DataFrame = {
    val base = graft.operators.Lineage.truncate(
      df.select(col(idCol).as("id"), score.cast("long").as("__s"), cost.cast("long").as("__c"))
        .withColumn("__d", expr("__s * 1000 div __c"))
    )
    val offs = base
      .groupBy(col("__d"))
      .agg(sum(col("__c")).as("__bc"))
      .withColumn(
        "__off",
        coalesce(
          sum(col("__bc")).over(
            Window.orderBy(col("__d").desc).rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L),
        ),
      )
      .select(col("__d"), col("__off"))
    val w = Window.partitionBy(col("__d")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(offs), "__d")
      .withColumn("__cum", col("__off") + sum(col("__c")).over(w))
      .filter(col("__cum") <= budget)
      .select(
        col("id"),
        col("__s").as("score"),
        col("__c").as("cost"),
        col("__d").as("density_permille"),
        col("__cum").as("cum_cost"),
      )
  }

  /** Per-group quantile (percentile-rank) normalization of a score column —
    * the feature transform that makes quality scores COMPARABLE across
    * heterogeneous sources before mixing (a length-800 doc may be p95 in
    * one crawl and p40 in another). `pct` = (rank − 1)/(n − 1) ∈ [0, 1]
    * with rank = row_number under (value, tiebreak) — the unique tiebreak
    * makes this deterministic and engine-mirrorable where SQL
    * `percent_rank`'s tie-sharing would depend on value collisions.
    * Single-row groups pin to 0.5 (no spread to normalize against).
    *
    * Scale: ONE group-keyed exchange shared by the ranking window and the
    * count window (same partition key); skew is bounded by the largest
    * group, like every per-source operator here.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      tiebreak: Column,
      out: String = "pct",
  ): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(valueCol, tiebreak)
    val n = Window.partitionBy(col(groupCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn(
        out,
        when(col("__n") === 1, lit(0.5))
          .otherwise((col("__rk") - 1).cast("double") / (col("__n") - 1).cast("double")),
      )
      .drop("__rk", "__n")
  }

  /** Exact equi-depth histogram of an integer column — the optimizer-grade
    * column statistic (equal row mass per bucket, not equal value width like
    * q102's equi-width bins). Bucket rule, SQL-standard `cume_dist` in pure
    * integers: a value v with `cum` = #rows <= v lands in bucket
    * `ceil(cum·B / N)` = `(cum·B + N − 1) div N` ∈ [1, B] — tied values
    * collapse into one bucket, so bucket counts deviate from N/B only by
    * tie mass, never by engine float rounding. Output per bucket: row
    * count, value lo/hi, and exact value sum.
    *
    * Scale design: NO global sort of the data. One aggregate collapses the
    * input to its distinct-value histogram (|V| rows — bounded by the
    * column's domain, e.g. ~thousands for a length column at any corpus
    * size); the running-count window runs over THAT tiny relation (the one
    * deliberate single-partition window in the engine, on |V| rows), and
    * the bucket rollup aggregates value-level counts — the raw rows are
    * touched exactly once. For unbounded-domain columns the approx path is
    * [[EventAnalytics.quantilesByCount]] (q106).
    */
  def equiDepthHistogram(df: DataFrame, valueCol: Column, buckets: Int): DataFrame = {
    val hist = df
      .select(valueCol.cast("long").as("__v"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(Window.partitionBy()))
      .withColumn("bucket", expr(s"(__cum * $buckets + __n - 1) div __n"))
      .groupBy(col("bucket"))
      .agg(
        sum(col("__cnt")).as("n_rows"),
        min(col("__v")).as("lo"),
        max(col("__v")).as("hi"),
        sum(col("__v") * col("__cnt")).as("value_sum"),
      )
  }

  /** Flesch–Kincaid-style readability grade per document, in exact scaled
    * integers: `grade_milli = 390·words div sentences + 11800·syll div
    * words − 15590` with a vowel-RUN count standing in for syllables (the
    * standard heuristic) and `[.!?]+` runs for sentences (floored at 1 so
    * fragments don't divide by zero). The per-mille form keeps both engines
    * in integer arithmetic — no float coefficients to mirror — and ranks
    * identically to the real-valued grade.
    *
    * Scale: a pure projection (three regexp counts + integer math), no
    * shuffle; at 100 TB it fuses onto the scan like every other text
    * filter.
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol),
        size(graft.functions.TextAnalysis.wsTokens(col(textCol))).cast("long").as("words"),
        greatest(expr(s"size(regexp_extract_all($textCol, '[.!?]+', 0))"), lit(1)).cast("long").as("sentences"),
        expr(s"size(regexp_extract_all(lower($textCol), '[aeiouy]+', 0))").cast("long").as("syllables"),
      )
      .filter(col("words") >= 1)
      .withColumn(
        "grade_milli",
        expr("390 * words div sentences + 11800 * syllables div words - 15590"),
      )

  /** Exact Gini coefficient of the token-frequency distribution — the
    * one-number corpus-balance diagnostic (0 = every token equally common,
    * →1 = a few tokens own the mass; heavily templated corpora score high
    * before dedup and drop after). Uses [[graft.operators.Dedup.globalRank]]
    * ranks over (freq, token) — exact global positions with NO
    * single-partition sort — and the closed form
    * `G = (2·Σ rank·freq − (n+1)·Σ freq) / (n·Σ freq)` with the two sums
    * exact DECIMAL(38,0) accumulations and ONE final IEEE expression.
    */
  def tokenGini(df: DataFrame, textCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = df
      .select(explode(graft.functions.TextAnalysis.wsTokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
    Dedup
      .globalRank(counts, sortCols = Seq(col("freq"), col("token")), bucket = expr("freq div 16"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("freq").cast(d38)).cast("double").as("__sf"),
        sum((col("rank") * col("freq")).cast(d38)).cast("double").as("__srf"),
      )
      .select(
        col("n_tokens"),
        col("__sf").cast("long").as("total_freq"),
        ((lit(2.0) * col("__srf") - (col("n_tokens").cast("double") + 1.0) * col("__sf"))
          / (col("n_tokens").cast("double") * col("__sf"))).as("gini"),
      )
  }

  /** Hapax-legomena report per group: vocabulary size, hapax count (tokens
    * occurring exactly once in the group), and the hapax share in exact
    * per-mille. A healthy natural-language source sits near half its
    * vocabulary hapax; far above flags OCR noise / random suffixes, far
    * below flags templated or deduplicated-to-death text — a one-row-per-
    * source corpus-health gauge next to [[zipfFit]].
    *
    * One (group, token) partial-aggregating pass, then a group rollup of
    * the vocab-sized count table. All integers.
    */
  def hapaxReport(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol), explode(TextAnalysis.wsTokens(col(textCol))).as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("vocab"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("__n")).as("total_tokens"),
      )
      .withColumn("hapax_milli", expr("n_hapax * 1000 div vocab"))
}
