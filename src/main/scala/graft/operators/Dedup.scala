package graft.operators

import graft.functions.{Hashing, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Designed for 100 TB:
  *
  *  - Exact dedup is a hash-groupBy on a 64-bit content hash — one shuffle on
  *    a high-cardinality key (AQE handles skew), never on the full text.
  *  - MinHash/LSH candidate generation shuffles only (id, band-hash) pairs —
  *    `bands × 8` bytes per doc, not the document text; the verify step joins
  *    token sets only for the candidate pairs (tiny vs N²).
  *  - All signature math is builtin-composed (see [[graft.functions.Hashing]]),
  *    stays in whole-stage codegen, and is engine-agnostic (md5-based), so
  *    results are reproducible anywhere.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per distinct value of `keyCol`.
    * Returns (key-hash, n_copies, survivor id). Group on the md5-derived
    * 64-bit hash, not the raw text — the shuffle carries 8-byte keys.
    * (Collision risk 2^-60-scale; for absolute certainty group on the full
    * md5 hex instead.)
    */
  def exactGroups(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(md5(keyCol).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(idCol).as("keep_id"))

  /** Exact dedup applied: keep only the survivor row per key. */
  def exactDedup(df: DataFrame, keyCol: Column, idCol: Column): DataFrame = {
    val survivors = exactGroups(df, keyCol, idCol).select(col("keep_id"))
    df.join(survivors, idCol === col("keep_id"), "left_semi")
  }

  /** MinHash signature columns (mh0..mh{k-1}) from a text column. */
  def withMinhash(df: DataFrame, textCol: Column, k: Int = 8): DataFrame = {
    val sig = Hashing.minhash(TextAnalysis.tokenSet(textCol), k)
    sig.zipWithIndex.foldLeft(df) { case (acc, (c, i)) => acc.withColumn(s"mh$i", c) }
  }

  /** LSH banding: docs agreeing on ALL rows of any band become candidate
    * pairs. With k=8, bands=4 (2 rows/band), Jaccard-0.8 pairs are caught
    * with p = 1-(1-0.8²)⁴ ≈ 0.98. The self-join is an equi-join on the band
    * key — shuffle is O(N·bands) small rows; within-bucket pairing is the
    * only quadratic step and buckets are tiny by construction.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String, k: Int = 8, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val sig = withMinhash(df.select(col(idCol), col(textCol)), col(textCol), k)
    val banded = (0 until bands)
      .map { b =>
        val bandCols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
        sig.select(
          col(idCol).as("id"),
          lit(b).as("band"),
          concat_ws("_", bandCols: _*).as("band_key"),
        )
      }
      .reduce(_ unionAll _)
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.band_key") === col("r.band_key") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Jaccard similarity of two distinct-token arrays (set semantics — both
    * engines' intersect dedups).
    */
  def jaccard(ta: Column, tb: Column): Column = {
    val inter = size(array_intersect(ta, tb))
    inter.cast("double") / (size(ta) + size(tb) - inter)
  }

  /** Verify candidate pairs: join token sets back, keep pairs with
    * Jaccard >= threshold. Only candidates are joined — the full corpus is
    * never crossed.
    */
  def jaccardVerify(
      candidates: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
  ): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), TextAnalysis.tokenSet(col(textCol)).as("toks"))
    candidates
      .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("jaccard", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: bucket by the top (bits-prefixBits) bits, pair
    * within buckets, keep Hamming distance <= maxDist. Blocking keeps the
    * pairing sub-quadratic; at scale use multiple rotated prefixes for
    * recall.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, bits: Int = 16, prefixBits: Int = 6, maxDist: Int = 3): DataFrame = {
    val sigs = df.select(
      col(idCol).as("id"),
      Hashing.simhash(TextAnalysis.tokenSet(col(textCol)), bits).as("sim"),
    )
    val bucketed = sigs.withColumn("bucket", shiftright(col("sim"), bits - prefixBits))
    val l = bucketed.as("l")
    val r = bucketed.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("dist", Hashing.hammingDistance(col("l.sim"), col("r.sim")))
      .filter(col("dist") <= maxDist)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("dist"))
  }
}
