package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DEFLATE compression ratio of a text column —
  * `compressed_bytes / raw_bytes`, lower = more repetitive. The classic
  * corpus-curation signal for boilerplate/spam (highly compressible pages)
  * that n-gram repetition fractions miss when the repetition is long-range.
  *
  * Why a custom Expression (the same preference order as
  * [[CosineSimilarity]]): there is no builtin compressing function, a UDF
  * would break whole-stage codegen on a full-corpus scan, and the compressor
  * state must be reused per thread (a fresh `Deflater` per row allocates
  * native memory). `doGenCode` emits a static call so the scan stays inside
  * codegen.
  *
  * NO DuckDB mirror is expressible (no SQL deflate), so this is one of the
  * spec-verified components: bounds + monotonicity + determinism tests in
  * QualitySpec rather than an oracle row — same stance as the HTTP fetch and
  * writer seams. Fixed compression level 6 for cross-run stability; exact
  * byte counts may differ across zlib builds, so DERIVED THRESHOLDS, not the
  * raw ratio, should cross system boundaries.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  override def nullSafeEval(s: Any): Any =
    CompressionRatio.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.CompressionRatio.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressionRatio {

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6, false)
  }

  /** Invoked from generated code — must stay a simple static method. */
  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Column-API entry point. */
  def compressionRatio(c: Column): Column =
    graftshim.toColumn(CompressionRatio(graftshim.toExpression(c)))
}
