package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Gram-matrix aggregator: one pass over per-micro-quantized vectors
  * accumulating the exact sufficient statistics of the upper-triangle
  * covariance matrix — `n`, `Σx_i` per dimension, `Σx_i·x_j` per (i ≤ j)
  * cell — in 128-bit integer accumulators (hi/lo long pairs, products via
  * `Math.multiplyHigh`), then emits each cell's population covariance in
  * the same IEEE expression order as the explode-based plan it replaces:
  * `((n·Σxy − Σx·Σy) / n²) / 1e12` with every exact sum rounded to double
  * first (the `DECIMAL(38,0) → double` cast rule).
  *
  * Why this over the nested-transform explode
  * ([[graft.operators.Similarity.covarianceMatrix]]'s previous plan): the
  * explode materializes dim·(dim+1)/2 struct rows PER INPUT ROW through the
  * Tungsten pipeline before the partial aggregate collapses them — correct
  * and scale-safe, but at dim=1024 that is 524k rows per vector of pure
  * constant factor. Here the per-row work is a primitive-array loop (no
  * row objects, no per-cell hashing), the buffer is ~dim²/2 longs PER
  * PARTITION (not per row), and partials merge by element-wise 128-bit
  * addition — the exchange still carries one buffer per partition.
  *
  * 128-bit, not long: a per-micro product is up to ~1e12; a long Σxy
  * overflows near 9·10⁶ rows. The hi/lo representation is exact at any
  * corpus size and merges associatively, so partial aggregation stays
  * order-independent (the determinism contract every oracle depends on).
  *
  * Input precondition: non-null vector elements (quantized LONGs); vectors
  * shorter than `dim` contribute only their present indices (the explode
  * plan's null-skipping `sum` rule), while `n` counts every non-null row.
  */
class GramMatrixAggregator(dim: Int)
    extends Aggregator[Array[Long], GramMatrixAggregator.Buf, Seq[GramMatrixAggregator.Cell]] {
  import GramMatrixAggregator._
  require(dim >= 1, s"GramMatrixAggregator: bad dim $dim")

  private val cells = dim * (dim + 1) / 2

  override def zero: Buf =
    Buf(0L, new Array[Long](dim), new Array[Long](dim), new Array[Long](cells), new Array[Long](cells))

  // 128-bit accumulate: (hi(k), lo(k)) += (pHi, pLo), lo unsigned with
  // carry-out into hi (carry = unsigned overflow of the 64-bit lo add).
  @inline private def add128(hi: Array[Long], lo: Array[Long], k: Int, pHi: Long, pLo: Long): Unit = {
    val l = lo(k)
    val s = l + pLo
    val carry = ((l & pLo) | ((l | pLo) & ~s)) >>> 63
    lo(k) = s
    hi(k) = hi(k) + pHi + carry
  }

  override def reduce(b: Buf, q: Array[Long]): Buf = {
    if (q == null) return b
    val len = math.min(dim, q.length)
    var i = 0
    var t = 0
    while (i < len) {
      val qi = q(i)
      add128(b.sxHi, b.sxLo, i, qi >> 63, qi)
      // upper-triangle cells (i, j) for this i start at the triangle offset
      // i·dim − i·(i−1)/2; walk them contiguously.
      t = i * dim - i * (i - 1) / 2
      var j = i
      while (j < len) {
        val qj = q(j)
        add128(b.sxyHi, b.sxyLo, t, Math.multiplyHigh(qi, qj), qi * qj)
        t += 1
        j += 1
      }
      i += 1
    }
    b.copy(n = b.n + 1)
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    var k = 0
    while (k < dim) { add128(b1.sxHi, b1.sxLo, k, b2.sxHi(k), b2.sxLo(k)); k += 1 }
    k = 0
    while (k < cells) { add128(b1.sxyHi, b1.sxyLo, k, b2.sxyHi(k), b2.sxyLo(k)); k += 1 }
    b1.copy(n = b1.n + b2.n)
  }

  private val U64 = (BigInt(1) << 64) - 1
  private def toDouble(hi: Long, lo: Long): Double =
    (((BigInt(hi) << 64) | (BigInt(lo) & U64))).doubleValue

  override def finish(b: Buf): Seq[Cell] = {
    if (b.n == 0L) return Seq.empty
    val nd = b.n.toDouble
    val out = new Array[Cell](cells)
    var i = 0
    var t = 0
    while (i < dim) {
      val sx = toDouble(b.sxHi(i), b.sxLo(i))
      var j = i
      while (j < dim) {
        val sy = toDouble(b.sxHi(j), b.sxLo(j))
        val sxy = toDouble(b.sxyHi(t), b.sxyLo(t))
        // the explode plan's exact IEEE order: (n·Σxy − Σx·Σy) / n² / 1e12
        out(t) = Cell(i, j, b.n, ((nd * sxy - sx * sy) / (nd * nd)) / 1.0e12)
        t += 1
        j += 1
      }
      i += 1
    }
    out.toSeq
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Cell]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object GramMatrixAggregator {
  /** Partial state: row count + hi/lo halves of the exact 128-bit sums. */
  final case class Buf(
      n: Long,
      sxHi: Array[Long],
      sxLo: Array[Long],
      sxyHi: Array[Long],
      sxyLo: Array[Long],
  )

  /** One upper-triangle output cell, matching the explode plan's schema. */
  final case class Cell(i: Int, j: Int, n: Long, cov: Double)
}
