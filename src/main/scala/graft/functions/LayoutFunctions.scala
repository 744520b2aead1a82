package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout math for data-skipping writes.
  *
  * A linear sort gives ONE column tight per-file min/max ranges and
  * leaves every other column spanning the full domain in every file; a
  * Z-order curve interleaves the bits of several columns' quantile
  * buckets so each file covers a small hyper-rectangle of the combined
  * space — parquet footer stats then skip files/row-groups for
  * predicates on ANY of the curve's columns.
  *
  * Everything here is a pure projection: quantile boundaries are a
  * constant-size Greenwald-Khanna sketch collected once
  * ([[quantileBounds]]), bucketing is a broadcast-literal comparison
  * fold, and the interleave is integer bit math — codegen end to end.
  */
object LayoutFunctions {

  /** 2^bits − 1 interior quantile boundaries of a NUMERIC column, from
    * one approx-quantile pass (constant driver memory). */
  def quantileBounds(
      df: DataFrame, colName: String, bits: Int,
      relErr: Double = 0.001): Array[Double] = {
    require(bits >= 1 && bits <= 16, "quantileBounds: bits in 1..16")
    val buckets = 1 << bits
    df.stat.approxQuantile(colName,
      (1 until buckets).map(_.toDouble / buckets).toArray, relErr)
  }

  /** Bucket index in [0, 2^bits): the count of boundaries ≤ value.
    * Nulls land in bucket 0 (the predicate is null → element dropped
    * from the filtered array). */
  def quantileBucket(value: Column, bounds: Array[Double]): Column =
    size(filter(typedlit(bounds.toSeq),
      b => value.cast("double") >= b)).cast("long")

  /** Morton interleave: bit b of bucket i becomes output bit
    * b·n + i, so all columns' low-order bucket bits are adjacent and
    * the sort order cycles through the hyper-grid locally. */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.size >= 2,
      "zValue: needs >= 2 columns (a single column wants a plain sort)")
    require(bits * buckets.size <= 62,
      s"zValue: ${bits} bits x ${buckets.size} columns overflows a long")
    val n = buckets.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }
}
