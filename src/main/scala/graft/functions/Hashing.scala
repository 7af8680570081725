package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine hashing primitives for the dedup/similarity
  * operators (extension surface, SURVEY §7.2 step 6).
  *
  * Everything here is built from md5 + integer arithmetic so the SAME value is
  * computable in any engine (the DuckDB oracle mirrors these formulas
  * verbatim) — deliberately NOT Spark's murmur3 `hash()`, which no other
  * engine reproduces. All ops are codegen'd builtins (md5, conv, transform,
  * aggregate): no UDFs in the hot path, whole-stage codegen stays intact.
  */
object Hashing {

  /** 60-bit positive hash of a string: first 15 hex digits of md5.
    * DuckDB mirror: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side twin of [[hash64]] (same md5-hex-prefix construction) for
    * deriving SMALL deterministic constant tables at plan-build time — e.g.
    * a random-projection sign matrix — that are then inlined as literals on
    * BOTH engines. Never used per-row.
    */
  def hash64Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Prime modulus for the minhash permutation family (2^31 - 1). */
  val P: Long = 2147483647L

  /** Deterministic LCG-style coefficients for the k-th minhash permutation.
    * Seeds are fixed constants (no RNG — resumable, reproducible, and
    * mirrorable in oracle SQL).
    */
  def minhashCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = (1103515245L * (i + 1) + 12345L) % P
      val b = (12345L * (i + 7) + 1103515245L) % P
      (if (a == 0) 1L else a, b)
    }

  /** MinHash signature over a (distinct) token array: for permutation i,
    * `min((a_i * (h(t) % P) + b_i) % P)` across tokens. One `transform` +
    * `array_min` per permutation — pure projection over the token array, no
    * shuffle, no UDF. Empty token array yields null (caller filters).
    */
  def minhash(tokens: Column, k: Int): Seq[Column] =
    minhashCoeffs(k).map { case (a, b) =>
      array_min(transform(tokens, t => (lit(a) * (hash64(t) % P) + lit(b)) % P))
    }

  /** SimHash over a token array, `bits` wide (bit j of h(t) votes ±1; the
    * sign of the vote sum sets bit j). Computed from a single hashed-token
    * array; 2×`bits` builtin ops per row, all codegen'd.
    */
  def simhash(tokens: Column, bits: Int): Column = {
    val hashes = transform(tokens, t => hash64(t))
    (0 until bits)
      .map { j =>
        val votes = aggregate(
          hashes,
          lit(0L),
          (acc, h) => acc + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1),
        )
        when(votes >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Number of differing bits between two simhash values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
