package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level quality scoring for a training-data pipeline: the unigram-LM
  * surprisal gate (the perplexity-style filter) and Gopher-shape repetition
  * rules. DataFrame-level operators live here; the per-row quality features
  * are [[graft.functions.TextAnalysis]] projections.
  */
object Quality {

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
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    // Materialized once (localCheckpoint): both the head limit and the tail
    // join read it, and neither may recompute the corpus-wide count.
    val lp = vocab
      .crossJoin(broadcast(total))
      .select(
        col("token"),
        col("cnt"),
        floor(log(col("cnt").cast("double") / col("total")) * 1e6 + 0.5).cast("long").as("lps"),
      )
      .localCheckpoint()
    val head = broadcast(lp.orderBy(col("cnt").desc, col("token")).limit(headK).select(col("token"), col("lps")))
    val tagged = tok.join(head, Seq("token"), "left_outer")
    val headHits = tagged.filter(col("lps").isNotNull).select(col(idCol), col("lps"))
    val tailHits = tagged
      .filter(col("lps").isNull)
      .select(col(idCol), col("token"))
      .join(lp.select(col("token"), col("lps")), Seq("token"))
      .select(col(idCol), col("lps"))
    headHits
      .unionAll(tailHits)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lps")).as("s"))
      .select(
        col(idCol),
        col("n_tokens"),
        (-(col("s").cast("double") / col("n_tokens")) / 1e6).as("avg_neg_logp"),
      )
  }
}
