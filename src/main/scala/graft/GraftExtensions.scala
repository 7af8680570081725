package graft

import graft.functions.{CompressionRatio, CosineSimilarity, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions entry point — registers the engine's custom
  * Catalyst expressions as SQL functions so the pure-SQL surface (SURVEY
  * §3.3: the reference's delegated Athena querying) can use them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName,
          "cosine_similarity",
        ),
        (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SortedIntersectCount].getName,
          "sorted_intersect_count",
        ),
        (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1)),
      )
    )
    ext.injectFunction(
      (
        org.apache.spark.sql.catalyst.FunctionIdentifier("compression_ratio"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CompressionRatio].getName,
          "compression_ratio",
        ),
        (children: Seq[Expression]) => CompressionRatio(children(0)),
      )
    )
  }
}
