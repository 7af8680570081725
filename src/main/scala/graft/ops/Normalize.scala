package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Schema-dispatch + scalar normalization (SURVEY §2.2, P1–P4).
  *
  * The reference classifies columns *per row* by regex over dict keys
  * (reference `src/parser.py:31-40`, `src/parser2.py:31-51`); the schema is
  * uniform, so we hoist the classification to the driver: one pass over
  * `df.columns`, then a single projection. At 100 TB this matters — the
  * dispatch cost is O(columns) once, not O(rows × columns), and the resulting
  * plan is a pure `select` that whole-stage-codegen compiles into one pass.
  */
object Normalize {

  /** Date-column regex, verbatim from reference `src/parser.py:32`. */
  val DateColPattern = """^\d{1,2}/\d{1,2}/\d{2}$"""

  /** Lat/Long column names treated as doubles (reference `src/parser.py:37`). */
  val LatLongCols: Set[String] = Set("Lat", "Long", "Long_")

  final case class ColumnClasses(dateCols: Seq[String], latLong: Seq[String], other: Seq[String])

  /** P1 — partition a schema's column names into {date, latlong, other},
    * preserving input (CSV header) order, which downstream is the
    * chronological order of the time series (reference `src/parser.py:32-40`).
    */
  def classify(columns: Seq[String]): ColumnClasses = ColumnClasses(
    dateCols = columns.filter(_.matches(DateColPattern)),
    latLong = columns.filter(c => !c.matches(DateColPattern) && LatLongCols(c)),
    other = columns.filter(c => !c.matches(DateColPattern) && !LatLongCols(c)),
  )

  // Two-digit years follow the reference's Python `%y` pivot (69→1969,
  // 20→2020; reference `src/parser.py:24`), not Java's default 2000-base —
  // see SURVEY §1.2. appendValueReduced(base=1969) reproduces it exactly.
  private val inFmt = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("M/d/")
    .appendValueReduced(java.time.temporal.ChronoField.YEAR, 2, 2, 1969)
    .toFormatter()
  private val outFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** P4 — normalize a `M/d/yy` column NAME to the reference's serialized form
    * `"yyyy-MM-dd 00:00:00"` (reference `src/parser.py:23-26,34`). Computed on
    * the driver, so in the plan each date is a string literal — zero per-row
    * work.
    */
  def normalizeDateName(name: String): String =
    LocalDate.parse(name, inFmt).atStartOfDay().format(outFmt)

  /** P2+P3 — the lowercase-rename + Lat/Long double-cast projection columns
    * for a classified schema (reference `src/parser.py:37-40`), in original
    * attribute order. Shared by [[normalizeAttrs]] and the two
    * [[graft.Pipelines]] entry points.
    */
  def lowercasedAttrs(cls: ColumnClasses): Seq[Column] =
    (cls.other ++ cls.latLong).map {
      case c if LatLongCols(c) => col(c).cast("double").as(c.toLowerCase.stripSuffix("_"))
      case c                   => col(c).as(c.toLowerCase)
    }

  /** P2+P3 applied to a whole frame (attrs normalized, date columns kept).
    * Pure projection; column pruning and pushdown still reach the scan.
    */
  def normalizeAttrs(df: DataFrame): DataFrame = {
    val cls = classify(df.columns.toSeq)
    df.select(lowercasedAttrs(cls) ++ cls.dateCols.map(col): _*)
  }
}
