package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** JSON lake sinks (K1–K3; reference `src/parser.py:18-21,71-82`,
  * `src/parser2.py:18-21,68-82`; SURVEY §2.7).
  *
  * Canonical form: `partitionBy("type").json(...)` — reproduces the
  * reference's Hive-style `type=<category>/` layout (what Glue/Athena
  * consume, reference `src/README.md:3-5`) with parallel multipart writes
  * instead of one sequential PUT per record. `Overwrite` + dynamic partition
  * overwrite gives the reference's idempotent daily re-run (K3,
  * `systemd/jhu-data-parser.timer:5`).
  *
  * The reference's per-record data-derived FILENAME
  * (`<country>[-<province>].json`, `src/parser.py:72-75`) is not expressible
  * in the stock writer; [[writePerRecord]] provides layout parity via
  * `foreachPartition` + a pluggable record writer (the S3-client seam). Use
  * it only when byte/layout parity matters — the partitioned form is the one
  * that scales.
  */
object Sink {

  /** K1 — partitioned JSON lake write. Null fields are omitted (writer
    * default `ignoreNullFields=true`), matching the reference's absent-key
    * output on lookup miss (E3).
    */
  def partitionedJson(df: DataFrame, category: String, path: String): Unit =
    df.withColumn("type", lit(category))
      .write
      .partitionBy("type")
      // dynamic: overwrite only the type= partitions present in this write —
      // static mode would truncate the whole lake root, deleting every other
      // category (K3 is per-category idempotent re-PUT, not full truncate)
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .json(path)

  /** K2 — flat (unpartitioned) JSON write (reference `src/parser2.py:20`). */
  def flatJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Pluggable per-record sink — the seam where an S3 client goes in
    * production (`s3.Object(bucket, key).put`, reference `src/parser.py:76-77`).
    */
  trait RecordWriter extends Serializable {
    def put(key: String, body: String): Unit
  }

  /** Local-filesystem RecordWriter (test double for the S3 one). */
  final class LocalFsWriter(root: String) extends RecordWriter {
    def put(key: String, body: String): Unit = {
      val p = Paths.get(root, key)
      Files.createDirectories(p.getParent)
      Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    }
  }

  /** K1 with per-record data-derived filenames, executor-parallel:
    * `type=<category>/<country>[-<province>].json` (reference
    * `src/parser.py:72-75`). `keyCol`/`jsonCol` are computed columns so the
    * key synthesis (P5/P6) stays in codegen; only the final PUT is a closure.
    */
  def writePerRecord(df: DataFrame, keyColName: String, jsonColName: String, writer: RecordWriter): Long = {
    val rows = df.select(col(keyColName).as("k"), col(jsonColName).as("j"))
    val count = rows.sparkSession.sparkContext.longAccumulator("records_written")
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.foreach { r =>
        writer.put(r.getString(0), r.getString(1))
        count.add(1L)
      }
    }
    count.value
  }
}
