package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data decontamination: flag corpus documents that share any word
  * n-gram with an evaluation/benchmark set — the standard guard against
  * benchmark leakage into pre-training data (typically n = 13 words; tests
  * use smaller n because the synthetic docs are short).
  *
  * Scale design: the eval set is tiny relative to the corpus (thousands of
  * benchmark items vs billions of documents), so its DISTINCT n-gram hashes
  * are broadcast. The corpus side is then a projection (tokenize → n-gram →
  * hash64) + explode + broadcast hash join + partial-aggregated per-doc
  * count: the corpus never shuffles text — the only corpus shuffle is the
  * (doc_id, hash) pair aggregation, and with map-side combine that carries
  * one row per (doc, distinct matched gram). At 100 TB the plan is scan-speed
  * bound. Hashes are md5-derived ([[graft.functions.Hashing.hash64]]) so the
  * oracle reproduces them exactly.
  */
object Decontaminate {

  /** Per-corpus-document overlap report against `eval`:
    * (idCol, n_hits = distinct shared n-grams, is_contaminated 0/1).
    * Every corpus row appears (zero-filled), so the output is a drop-in
    * filter input: `overlaps(...).filter(col("is_contaminated") === 0)`.
    */
  def overlaps(corpus: DataFrame, eval: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // The token array is hoisted to a named projection on BOTH sides: the
    // n-gram expression references it guard + bound + lambda, and an inline
    // split would be re-evaluated per n-gram position (O(tokens²) splitting —
    // see wordNgramHashesFromTokens' scaladoc).
    val evalGrams = eval
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .distinct()
    val hits = corpus
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(col(idCol).as("__id"), explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .join(broadcast(evalGrams), "h")
      .groupBy(col("__id"))
      .agg(countDistinct(col("h")).as("__n_hits"))
    corpus
      .select(col(idCol).as("__id"))
      .join(hits, Seq("__id"), "left_outer")
      .select(
        col("__id").as(idCol),
        coalesce(col("__n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("__n_hits"), lit(0L)) > 0).cast("int").as("is_contaminated"),
      )
  }

  /** Scored decontamination: per-corpus-document CONTAINMENT of its distinct
    * n-grams in the eval set — `n_hits / n_grams` in [0,1] — the
    * thresholding form used when binary any-overlap ([[overlaps]]) is too
    * brittle (small n, boilerplate n-grams). Same broadcast shape as
    * [[overlaps]]; the one extra step is a (doc, hash) distinct so each
    * shared gram counts once, and that shuffle carries 16-byte rows.
    * Zero-gram docs (shorter than n tokens) report containment 0.0.
    */
  def containment(corpus: DataFrame, eval: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val evalGrams = eval
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .distinct()
      .withColumn("__hit", lit(1L))
    val perDoc = corpus
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(col(idCol).as("__id"), explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .distinct()
      .join(broadcast(evalGrams), Seq("h"), "left_outer")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__n_grams"), sum(coalesce(col("__hit"), lit(0L))).as("__n_hits"))
    corpus
      .select(col(idCol).as("__id"))
      .join(perDoc, Seq("__id"), "left_outer")
      .select(
        col("__id").as(idCol),
        coalesce(col("__n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("__n_hits"), lit(0L)).as("n_hits"),
        when(
          coalesce(col("__n_grams"), lit(0L)) > 0,
          coalesce(col("__n_hits"), lit(0L)).cast("double") / col("__n_grams"),
        ).otherwise(lit(0.0)).as("containment"),
      )
  }

  /** The applied form: corpus rows with no n-gram overlap with `eval`. */
  def clean(corpus: DataFrame, eval: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val contaminated = overlaps(corpus, eval, idCol, textCol, n)
      .filter(col("is_contaminated") === 1)
      .select(col(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** [[overlaps]] with a Bloom pre-filter on the corpus gram stream —
    * IDENTICAL output (false positives are eliminated by the exact join
    * that follows; false negatives are impossible), cheaper at scale.
    *
    * Why: in [[overlaps]] every corpus n-gram row (id, hash) flows into the
    * broadcast hash join. Almost none match — the whole point of
    * decontamination is that overlap is rare — so at 100 TB the join
    * probes billions of rows to keep thousands. A `bits`-bit Bloom filter
    * over the eval grams (k deterministic probes derived from the gram
    * hash itself, all plain integer arithmetic — no extra hashing, no UDF,
    * codegen-intact) rejects the overwhelming majority of corpus grams
    * BEFORE the join, and — unlike the broadcast gram set — its size is a
    * fixed knob independent of the eval set's cardinality, so the same
    * plan works when the eval side outgrows a comfortable broadcast.
    *
    * The filter words are computed distributed (explode probes → bit_or
    * per 64-bit word) and collected as a bounded `bits/64`-long array
    * literal — codebook-sized by construction (default 2^16 bits = 1 KiB
    * word array), the same policy as the stopword-list literals.
    */
  /** Probe j of hash h in a `bits`-wide array: double hashing off the
    * hash's own high bits (odd step ⇒ probes distinct mod 2^b). Shared by
    * [[overlapsBloom]] and [[bloomFppReport]] so the filter under test is
    * the filter in production.
    */
  private def bloomBitIndex(h: Column, j: Column, bits: Int): Column =
    (h + j * (shiftright(h, 29).bitwiseOR(lit(1L)))).bitwiseAND(lit((bits - 1).toLong))

  /** Build the bit array from the eval grams (driver-side, bounded by
    * `bits`) and return the `mightContain` predicate over it.
    */
  private def bloomPredicate(evalGrams: DataFrame, bits: Int, probes: Int): Column => Column = {
    val words: Array[Long] = {
      val built = evalGrams
        .select(explode(sequence(lit(0L), lit(probes - 1L))).as("j"), col("h"))
        .select(bloomBitIndex(col("h"), col("j"), bits).as("bit"))
        .groupBy((col("bit") / 64).cast("long").as("word"))
        .agg(bit_or(call_function("shiftleft", lit(1L), col("bit").cast("int") % 64)).as("mask"))
        .collect()
      val arr = new Array[Long](bits / 64)
      built.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      arr
    }
    val wordsLit = typedlit(words.toSeq)
    (h: Column) =>
      forall(
        sequence(lit(0L), lit(probes - 1L)),
        j => {
          val bit = bloomBitIndex(h, j, bits)
          element_at(wordsLit, (bit / 64).cast("int") + 1)
            .bitwiseAND(call_function("shiftleft", lit(1L), bit.cast("int") % 64)) =!= 0L
        },
      )
  }

  def overlapsBloom(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bits: Int = 1 << 16,
      probes: Int = 3,
  ): DataFrame = {
    require(bits > 0 && (bits & (bits - 1)) == 0, s"bits must be a power of two: $bits")
    require(probes > 0, s"probes must be positive: $probes")
    val evalGrams = eval
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .distinct()
    val mightContain = bloomPredicate(evalGrams, bits, probes)
    val hits = corpus
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(col(idCol).as("__id"), explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .filter(mightContain(col("h")))
      .join(broadcast(evalGrams), "h")
      .groupBy(col("__id"))
      .agg(countDistinct(col("h")).as("__n_hits"))
    corpus
      .select(col(idCol).as("__id"))
      .join(hits, Seq("__id"), "left_outer")
      .select(
        col("__id").as(idCol),
        coalesce(col("__n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("__n_hits"), lit(0L)) > 0).cast("int").as("is_contaminated"),
      )
  }

  /** Contamination ATTRIBUTION — after [[overlaps]] says "these corpus docs
    * touch the eval set", this says WHICH eval items each one leaks and how
    * hard: per (eval item, corpus doc) the count of shared distinct word
    * `n`-grams, top-`k` corpus docs per eval item. The triage artifact a
    * human reads before deciding drop vs. rewrite vs. false-positive.
    *
    * Boilerplate guard = join-fanout guard: a gram present in more than
    * `maxDf` corpus docs (licence headers, templated prefixes) is dropped
    * BEFORE the pair join — the same ubiquitous-gram rule as
    * [[Winnow.overlapPairs]], and the bound that keeps the (gram → docs ×
    * evals) expansion from going quadratic on one hot key. Corpus grams
    * materialize once and feed the df-count and the join.
    */
  def attributionReport(
      corpus: DataFrame,
      evalDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int,
      maxDf: Long,
  ): DataFrame = {
    require(n >= 1 && k >= 1 && maxDf >= 1, "attributionReport: n, k, maxDf must be positive")
    val evalGrams = evalDf
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(col(idCol).as("eval_id"), explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .distinct()
    val corpusGrams = Lineage.truncate(
      corpus
        .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
        .select(col(idCol).as("doc_id"), explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
        .distinct()
    )
    val rare = corpusGrams
      .groupBy(col("h"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("h"))
    val shared = corpusGrams
      .join(rare, Seq("h"), "left_semi")
      .join(broadcast(evalGrams), Seq("h"))
      .groupBy(col("eval_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("eval_id"))
      .orderBy(col("n_shared").desc, col("doc_id"))
    shared
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("eval_id"), col("rank"), col("doc_id"), col("n_shared"))
  }

  /** Bloom sizing report — the empirical answer to "are `bits`/`probes`
    * right for THIS eval set?": build the same filter [[overlapsBloom]]
    * uses, stream the corpus's distinct n-grams through it once, and count
    * bloom passes vs true members. `n_false_pos = n_bloom_pass − n_true`
    * (a Bloom filter has no false negatives, so every true member passes)
    * and `fpp_micro` is the measured false-positive rate over true
    * negatives in exact parts-per-million. A fpp far above the design
    * point means an under-sized array (wasted exact-join work); ~zero
    * false positives means the array could shrink.
    */
  def bloomFppReport(
      corpus: DataFrame,
      evalDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bits: Int = 1 << 16,
      probes: Int = 3,
  ): DataFrame = {
    require(bits > 0 && (bits & (bits - 1)) == 0, s"bits must be a power of two: $bits")
    require(probes > 0, s"probes must be positive: $probes")
    val evalGrams = evalDf
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .distinct()
    val mightContain = bloomPredicate(evalGrams, bits, probes)
    corpus
      .withColumn("__toks", TextAnalysis.wsTokens(col(textCol)))
      .select(explode(TextAnalysis.wordNgramHashesFromTokens(col("__toks"), n)).as("h"))
      .distinct()
      .join(broadcast(evalGrams.withColumn("__t", lit(1L))), Seq("h"), "left")
      .select(mightContain(col("h")).cast("long").as("__pass"), coalesce(col("__t"), lit(0L)).as("__t"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(col("__pass")).as("n_bloom_pass"),
        sum(col("__t")).as("n_true"),
      )
      .select(
        col("n_grams"),
        col("n_bloom_pass"),
        col("n_true"),
        (col("n_bloom_pass") - col("n_true")).as("n_false_pos"),
        // Full-overlap inputs (every distinct corpus n-gram also an eval
        // gram) leave zero negatives to misclassify: fpp is undefined, so
        // return NULL rather than an ANSI divide-by-zero (oracle mirrors
        // with CASE WHEN).
        when(col("n_grams") === col("n_true"), lit(null).cast("long"))
          .otherwise(expr("(n_bloom_pass - n_true) * 1000000 div (n_grams - n_true)"))
          .as("fpp_micro"),
      )
  }
}
