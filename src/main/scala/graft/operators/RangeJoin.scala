package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch range (interval-containment) join: `left` point rows against
  * `right` [start, end] interval rows, optionally under extra equi-keys —
  * "which maintenance window / session / campaign does this event fall in".
  *
  * Spark has no native range-join optimization: a raw
  * `l JOIN r ON l.ts BETWEEN r.s AND r.e` plans as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side broadcasts) — every left row
  * probes every right row, O(N·M) at 100 TB. The standard fix is BINNING:
  * quantize time into `binUs`-microsecond bins, explode each interval over
  * the bins it covers, and equi-join on (keys, bin) before applying the
  * exact BETWEEN predicate. Each left point lives in exactly ONE bin and a
  * qualifying interval covers that bin exactly once, so every match is
  * emitted exactly once — no DISTINCT pass. Work becomes
  * O(N + M·span/bin + matches-per-bin), all through the hash-shuffle
  * machinery (AQE handles hot bins).
  *
  * `binUs` tunes the fan-out/selectivity trade: ~the median interval
  * length is a good default. An in-plan `raise_error` guard caps the
  * per-interval fan-out at `maxBinsPerInterval` — a degenerate month-long
  * interval with a second-sized bin fails loudly instead of silently
  * exploding 2.6 M rows.
  */
object RangeJoin {

  def binnedRangeJoin(
      left: DataFrame,
      leftTs: String,
      right: DataFrame,
      startCol: String,
      endCol: String,
      equiKeys: Seq[String] = Nil,
      binUs: Long = 3600L * 1000000,
      maxBinsPerInterval: Long = 10000,
  ): DataFrame = {
    require(binUs > 0, s"binUs must be positive: $binUs")
    // `div` (integer) rather than `/` (double): exact at any magnitude.
    // Truncation == floor for the post-epoch timestamps this targets.
    val lBin = expr(s"unix_micros($leftTs) div $binUs").as("__bin")
    val sBin = expr(s"unix_micros($startCol) div $binUs")
    val eBin = expr(s"unix_micros($endCol) div $binUs")
    val nBins = eBin - sBin + 1
    val guarded = right.withColumn(
      "__bins",
      when(
        nBins > maxBinsPerInterval,
        raise_error(concat(
          lit(s"binnedRangeJoin: interval spans more than $maxBinsPerInterval bins of $binUs us; "),
          lit("widen binUs or split the interval: start="), col(startCol).cast("string"),
        )),
      ).otherwise(sequence(sBin, eBin)),
    )
    val l = left.withColumn("__bin", lBin)
    val r = guarded.select(
      guarded.columns.filter(_ != "__bins").map(col).toSeq :+ explode(col("__bins")).as("__bin"): _*
    )
    l.join(r, equiKeys :+ "__bin")
      .filter(col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol))
      .drop("__bin")
  }
}
