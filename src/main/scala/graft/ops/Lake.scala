package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-side query surface over the JSON lake (SURVEY §3.3).
  *
  * The reference delegates querying to Glue+Athena over the `type=`
  * partitioned layout (reference `src/README.md:5,11`). Natively:
  * `spark.read.json` with partition discovery recovers `type` as a column,
  * and `PartitioningAwareFileIndex` prunes `type=` directories for free when
  * a query filters on it — the same pruning Athena did. Register as a temp
  * view and the full Spark SQL surface (group-by, windows, top-k, set ops —
  * SURVEY §2.5) is available.
  *
  * Scale note: for a 100 TB lake, pass an explicit `schema` — schema
  * inference reads every file once before the first query. JSON is the
  * reference's interchange format; [[compact]] rewrites to partitioned
  * parquet for a columnar, pushdown-friendly scan.
  */
object Lake {

  /** Read the lake with partition discovery. Pass `schema` at scale — JSON
    * schema inference is a full extra pass over every file before the first
    * query; partition columns (`type=`) are discovered from the layout either
    * way and appended if absent from the given schema.
    */
  def readPartitioned(
      spark: SparkSession,
      path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
  ): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s)).json(path)

  def registerTable(
      spark: SparkSession,
      path: String,
      name: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
  ): DataFrame = {
    val df = readPartitioned(spark, path, schema)
    df.createOrReplaceTempView(name)
    df
  }

  /** Compact the JSON lake to partitioned parquet (the format the bench
    * tables use): columnar scans, predicate pushdown, stats-based pruning.
    */
  def compact(
      spark: SparkSession,
      jsonPath: String,
      parquetPath: String,
      partitionCols: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None,
  ): Unit = {
    val df = readPartitioned(spark, jsonPath, schema)
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(parquetPath)
  }

  /** Bucketed catalog table: co-locates join/agg keys at WRITE time so every
    * subsequent equi-join or groupBy on `bucketCols` between same-bucketed
    * tables runs with NO exchange — the 100 TB answer to "this join shuffles
    * both sides every night". Bucket count should match target parallelism
    * (e.g. executors × cores); sortBy makes the merge side of a sort-merge
    * join sort-free too.
    */
  def bucketize(df: org.apache.spark.sql.DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
