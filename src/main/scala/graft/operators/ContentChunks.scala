package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (the Rabin/FastCDC family): cut each document
  * into variable-size chunks at positions where the hash of the trailing
  * `window`-char run is ≡ 0 (mod `divisor`) — boundaries are decided by
  * CONTENT, not offsets, so inserting or deleting a character only moves
  * the boundaries inside one chunk and every other chunk's hash survives.
  * This is the shift-resistant storage-dedup primitive (borg/restic/LBFS
  * lineage) that fixed-stride blocks ([[Quality.chunkDocuments]], q80/q121,
  * and [[Dedup.blockDedupRewrite]]'s token blocks) structurally lack: a
  * one-token prefix insertion re-keys every fixed block but leaves CDC
  * chunks intact.
  *
  * Expected chunk length is `divisor` chars (boundary density 1/divisor).
  * Boundary hashes are [[Hashing.hash64]] over each window — an md5 per
  * position (mirrorable in any engine) rather than an O(1)-update rolling
  * polynomial; the per-row cost is L md5s of `window` chars, the price of
  * cross-engine bit-parity. Documents shorter than `window` form one chunk;
  * empty documents emit nothing.
  */
object ContentChunks {

  /** Chunk table: (id, chunk_idx, off, len, chunk_hash), 1-based offsets.
    *
    * Scale design: a PURE PROJECTION — boundaries, chunk spans, and chunk
    * hashes are all computed inside array expressions (`filter`/`zip_with`
    * over `sequence`) BEFORE the explode, so the exploded stream carries
    * only (id, idx, off, len, hash) — the text never duplicates per chunk
    * row and nothing shuffles.
    */
  def chunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8,
      divisor: Int = 64,
  ): DataFrame = {
    require(window >= 1 && divisor >= 1, s"contentChunks: window/divisor must be positive: $window/$divisor")
    val txt = col(textCol)
    val bps = when(
      length(txt) >= window,
      filter(
        sequence(lit(1), length(txt) - (window - 1)),
        p => Hashing.hash64(txt.substr(p, lit(window))) % divisor === 0,
      ),
    ).otherwise(array().cast("array<int>"))
    val spans = docs
      .select(col(idCol), txt.as("__t"), bps.as("__bp"))
      .select(
        col(idCol),
        col("__t"),
        concat(array(lit(1)), transform(col("__bp"), p => p + 1)).as("__starts"),
        concat(col("__bp"), array(length(col("__t")))).as("__ends"),
      )
    spans
      .select(
        col(idCol),
        posexplode(
          filter(
            zip_with(
              col("__starts"),
              col("__ends"),
              (s, e) =>
                struct(
                  s.cast("long").as("off"),
                  (e - s + 1).cast("long").as("len"),
                  Hashing.hash64(col("__t").substr(s, e - s + 1)).as("h"),
                ),
            ),
            c => c.getField("len") > 0,
          )
        ).as(Seq("__i", "__c")),
      )
      .select(
        col(idCol),
        (col("__i") + 1).cast("long").as("chunk_idx"),
        col("__c.off").as("off"),
        col("__c.len").as("len"),
        col("__c.h").as("chunk_hash"),
      )
  }

  /** Shift-resistant duplicate-content pairs: documents sharing at least
    * `minShared` distinct CDC chunk hashes. Chunk hashes present in more
    * than `maxDocsPerChunk` documents are dropped first (ubiquitous
    * boilerplate — and the bound that keeps every pair-join bucket
    * sub-quadratic, the [[Winnow.overlapPairs]] stance).
    */
  def dupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8,
      divisor: Int = 64,
      minShared: Int = 2,
      maxDocsPerChunk: Int = 20,
  ): DataFrame = {
    val ch = chunks(docs, idCol, textCol, window, divisor)
      .select(col(idCol), col("chunk_hash"))
      .distinct()
    val freq = ch.groupBy(col("chunk_hash")).agg(count(lit(1)).as("__ndocs"))
    val keep = ch.join(freq.filter(col("__ndocs") <= maxDocsPerChunk), "chunk_hash")
    val a = keep.select(col("chunk_hash"), col(idCol).as("id_a"))
    val b = keep.select(col("chunk_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("chunk_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
