package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-measure combine — parser2's three-way join + per-date zip with
  * zero-fill (J2 + R2 + E2; reference `src/parser2.py:28-52,101-124`;
  * SURVEY §2.3-R2, §2.4-J2).
  *
  * Reference semantics (pinned by SURVEY §2.3): the CONFIRMED table drives —
  * its (country, province) rows and its date columns define the output; a
  * measure table with no matching row contributes 0 for every date (E2,
  * `src/parser2.py:35-46`); dates absent from a matched deaths/recovered row
  * default to 0; deaths/recovered-only dates are dropped.
  *
  * Spark mapping: left-outer equi-joins of the WIDE tables on the composite
  * key, then a zip-projection over the driving table's date columns with
  * `coalesce(col, 0)`. The reference's O(N²·M) rescan loop becomes one or two
  * broadcast/shuffle hash joins; the per-date merge is a projection (no
  * shuffle, order-exact). At scale: measures partitioned the same way join
  * shuffle-free; AQE downgrades to broadcast when a side is small.
  */
object Combine {

  /** J2+R2: join `measures` (name -> wide table) onto `driver` by `keyCols`,
    * then nest `array<struct<date, <measure1>, <measure2>, …>>` over the
    * driver's date columns, zero-filling missing sides/cells.
    *
    * Precondition: `keyCols` are unique within each measure table (true for
    * the reference's data, SURVEY §2.4-J2). With duplicate keys a left-outer
    * join multiplies driver rows where the reference's `break` takes the
    * first match — dedupe first with [[Enrich.firstMatch]] (plus
    * [[Enrich.withFileOrder]] for file-order parity) if a measure table can
    * carry duplicates.
    */
  def combine(
      driver: DataFrame,
      driverMeasure: String,
      measures: Seq[(String, DataFrame)],
      keyCols: Seq[String],
  ): DataFrame = {
    val cls = Normalize.classify(driver.columns.toSeq)
    val dateCols = cls.dateCols

    // Prefix each measure table's date columns so the join output is unambiguous.
    val measureDates: Map[String, Set[String]] = measures.map { case (name, m) =>
      name -> Normalize.classify(m.columns.toSeq).dateCols.toSet
    }.toMap
    val joined = measures.foldLeft(driver) { case (acc, (name, m)) =>
      val mcls = Normalize.classify(m.columns.toSeq)
      val proj = m.select(
        (keyCols.map(col) ++ mcls.dateCols.map(c => col(c).as(s"__${name}__$c"))): _*
      )
      acc.join(proj, keyCols, "left_outer")
    }

    val elems: Seq[Column] = dateCols.map { d =>
      struct(
        lit(Normalize.normalizeDateName(d)).as("date") +:
          (coalesce(col(d).cast("int"), lit(0)).as(driverMeasure) +:
            measures.map { case (name, _) =>
              // A date column absent from a measure's SCHEMA contributes 0,
              // same as a missing row (reference src/parser2.py:35-46).
              val src =
                if (measureDates(name)(d)) coalesce(col(s"__${name}__$d").cast("int"), lit(0))
                else lit(0)
              src.as(name)
            }): _*
      )
    }

    val keep = (cls.other ++ cls.latLong).filterNot(dateCols.contains).map(col)
    joined.select((array(elems: _*).as("time_series") +: keep.toSeq): _*)
  }
}
