package graft.operators

import graft.functions.{Hashing, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-mixture assembly: turn per-source weights into a materialized
  * training corpus with deterministic fractional epochs — the step that
  * converts "2.4 epochs of source A, 1.0 of source B" into actual rows.
  */
object Mixture {

  /** Materialize a token-balanced mixture: every source is upsampled toward
    * the LARGEST source's token total, capped at `maxEpochsBp` basis points
    * (30000 = 3 epochs). A doc with weight `w` bp yields `w div 10000` full
    * copies plus one extra copy iff its salted content hash falls under
    * `w mod 10000` — the standard fractional-epoch rule, made deterministic
    * with the repo's content-hash sampler instead of an RNG, so the
    * materialized mixture is identical on any engine and any partitioning.
    * Weights are data-derived integer basis points (`maxTokens * 10000 div
    * srcTokens`), never floats, so the rate table is engine-independent too.
    *
    * Scale design: the per-source token totals are one partial-aggregated
    * pass over `(source, int)`; the weight table is |sources| rows and
    * broadcasts back, so copy assignment is a map-side join; the explode is
    * a narrow fan-out bounded by `maxEpochsBp` (no shuffle of text at all).
    * The output column `copy` is the epoch index a downstream shuffler can
    * salt on so repeated docs don't co-locate.
    */
  def epochMaterialize(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      maxEpochsBp: Long = 30000L,
      salt: String = "ep:",
  ): DataFrame = {
    // a sub-epoch cap would make `__w_bp div 10000` zero and the explode
    // range `sequence(0, -1)` — which counts DOWN in Spark (two spurious
    // copies); the same gotcha is guarded in Quality.bpeMergeCandidates
    require(maxEpochsBp >= 10000L, s"epochMaterialize: maxEpochsBp must be >= 10000 (1 epoch): $maxEpochsBp")
    val nToks = size(TextAnalysis.wsTokens(col(textCol))).cast("long")
    // two consumers (max + weights) — materialize the |sources|-row stats
    // once instead of scanning the corpus twice. Zero-token sources are
    // dropped: their weight is a divide-by-zero (null under non-ANSI,
    // a throw under ANSI) and they contribute no trainable rows anyway.
    val srcTokens = Lineage.truncate(
      docs
        .groupBy(col(sourceCol).as("__src"))
        .agg(sum(nToks).as("__tok"))
        .filter(col("__tok") > 0L)
    )
    val maxTok = srcTokens.agg(max(col("__tok")).as("__mx"))
    val weights = srcTokens
      .crossJoin(broadcast(maxTok))
      .select(col("__src"), least(expr("__mx * 10000 div __tok"), lit(maxEpochsBp)).as("__w_bp"))
    val extra = (Hashing.hash64(concat(lit(salt), col(textCol))) % 10000L < col("__w_bp") % 10000L)
      .cast("long")
    docs
      .join(broadcast(weights), col(sourceCol) === col("__src"))
      .select(
        col(idCol),
        col(sourceCol),
        (expr("__w_bp div 10000") + extra).as("__copies"),
      )
      .select(col(idCol), col(sourceCol), explode(sequence(lit(0L), col("__copies") - 1L)).as("copy"))
  }
}
