package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
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
}
