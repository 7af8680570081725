package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** CSV ingestion (S1/S2, reference `src/parser.py:43-55,61`; SURVEY §2.1).
  *
  * The reference GETs a whole CSV over HTTPS into one string, then parses
  * with `csv.DictReader` (all cells strings). Spark mapping:
  *
  *  - [[readCsv]] — files already landed (S3/local): header=true,
  *    inferSchema=false so every column is `StringType`, exactly DictReader's
  *    contract. This is the scale path — parallel splittable reads.
  *  - [[fromString]] — the reference's in-memory-string shape: parse a
  *    fetched body via `spark.read.csv(Dataset[String])`. Driver-side fetch
  *    is inherently single-node; only for small dimension files (the ~4k-row
  *    lookup), never the fact path.
  *  - [[Fetcher]] — seam for the HTTP GET (zero-egress here, so production
  *    would plug `urlopen`-equivalent; tests plug a file reader).
  */
object Csv {

  trait Fetcher extends Serializable {
    def fetch(url: String): String
  }

  /** Local-file Fetcher (test double for HTTP; same one-big-string shape). */
  final class FileFetcher extends Fetcher {
    def fetch(url: String): String =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(url)), "UTF-8")
  }

  /** S2 — header'd CSV scan, all columns StringType (DictReader parity). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path)

  /** S2 variant — lenient scan: malformed lines land in `_corrupt_record`
    * instead of failing the job (the 100 TB posture: quarantine, don't
    * crash). The reference's crash-on-bad-input (E1/E4) is [[readCsvStrict]].
    */
  def readCsvLenient(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** S2 variant — FAILFAST scan (reference crash parity, E1). */
  def readCsvStrict(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** S1 — parse an in-memory CSV body (one fetched string). */
  def fromString(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = spark.createDataset(body.split("\n", -1).toIndexedSeq)
    spark.read.option("header", "true").option("inferSchema", "false").csv(lines)
  }

  /** S1+S2 — fetch then parse (the reference's `fetch_data` + DictReader). */
  def fetchCsv(spark: SparkSession, url: String, fetcher: Fetcher): DataFrame =
    fromString(spark, fetcher.fetch(url))

  /** S4 — the reference's fixed multi-URL manifest (one CSV per category,
    * reference `src/parser.py:88-91`) as ONE scan: read all paths together
    * and derive `category` from `input_file_name()`. One job instead of N;
    * at scale the categories parallelize as ordinary file splits.
    * `categoryOf` maps a file name fragment to its category label.
    */
  def readManifest(spark: SparkSession, paths: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(paths.values.toSeq: _*)
    // Match on the DECODED last path segment, exactly — a substring match
    // would misattribute files whose names contain another manifest entry's
    // name (confirmed.csv vs us_confirmed.csv), and input_file_name() is a
    // URL-encoded URI, so raw name comparison breaks on e.g. spaces.
    val lastSegment = url_decode(element_at(split(input_file_name(), "/"), -1))
    val cat = paths.foldLeft(lit(null).cast("string")) { case (acc, (category, path)) =>
      when(lastSegment === new java.io.File(path).getName, lit(category)).otherwise(acc)
    }
    df.withColumn("category", cat)
  }
}
