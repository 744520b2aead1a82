package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row explosion over positionally-aligned composite columns — the
  * reference's `transform_split` (national/_1034/transform.py:55-92):
  * a scraped row holding "Name1/Name2" with grade "A/B" becomes two
  * rows, name and grade paired BY POSITION, all other columns
  * duplicated.
  *
  * Spark-first: split each composite column, `arrays_zip` the pieces
  * (positional alignment), one `explode`. A pure narrow projection —
  * no shuffle, no pandas-style stack/reindex round trip — and rows
  * without the delimiter pass through unchanged as their own
  * single-element zip. Ragged splits (one column yields fewer pieces
  * than another) pad with null rather than mis-aligning.
  */
object SplitRows {

  /** Explode `df` so each `splitCols` column is divided on `delim` and
    * re-paired by position; remaining columns replicate per piece. */
  def splitZip(
      df: DataFrame, splitCols: Seq[String], delim: String): DataFrame = {
    require(splitCols.nonEmpty, "splitZip needs at least one column")
    val others = df.columns.filterNot(splitCols.contains).toSeq
    val zipped = arrays_zip(
      splitCols.map(c => split(col(c), java.util.regex.Pattern.quote(delim))
        .as(c)): _*)
    df.select((others.map(col) :+ explode(zipped).as("__z")): _*)
      .select((others.map(col) ++
        splitCols.map(c => col(s"__z.$c").as(c))): _*)
  }
}
