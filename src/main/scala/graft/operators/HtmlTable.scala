package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML `<table>` string → rows, with no external parser — pure regexp
  * Catalyst expressions, so extraction runs distributed at scan speed
  * on a corpus of scraped pages.
  *
  * Re-expresses the reference's bs4 table walk (ref:
  * billtrack50_table/extract.py:12-24 — find_all('tr') then per-row
  * cell texts) for well-formed tables. (?s) keeps '.' matching
  * newlines inside cells.
  */
object HtmlTable {

  private val RowRe = "(?s)<tr[^>]*>(.*?)</tr>"
  private val CellRe = "(?s)<t[dh][^>]*>(.*?)</t[dh]>"

  /** Basic entity unescape + tag strip + trim for one cell. */
  def cleanCell(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", "")
    val unescaped = Seq(
      "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'"
    ).foldLeft(noTags) { case (acc, (from, to)) =>
      regexp_replace(acc, from, to)
    }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** array<array<string>>: one inner array of cell texts per <tr>. */
  def extractTable(html: Column): Column =
    transform(
      regexp_extract_all(html, lit(RowRe), lit(1)),
      row => transform(
        regexp_extract_all(row, lit(CellRe), lit(1)),
        cleanCell(_)))

  /** Explode a page column into one DataFrame row per table row:
    * (idCols..., row_idx, cells). Header rows (idx 0) included — filter
    * or use as schema downstream. */
  def toRows(df: DataFrame, htmlCol: String, idCols: Seq[String]): DataFrame = {
    val exploded = df.select(
      (idCols.map(col) :+
        posexplode(extractTable(col(htmlCol)))): _*)
    exploded.withColumnRenamed("pos", "row_idx")
      .withColumnRenamed("col", "cells")
  }

  /** Rows as a map keyed by the header row's cell texts — the
    * reference's dict-per-row output shape
    * (billtrack50_table/extract.py:19-24). Pages must carry the header
    * in their first <tr>. */
  def toRecords(df: DataFrame, htmlCol: String, idCols: Seq[String]): DataFrame = {
    val tbl = df.withColumn("__tbl", extractTable(col(htmlCol)))
      .withColumn("__hdr", element_at(col("__tbl"), 1))
    val body = tbl.select(
      (idCols.map(col) :+ col("__hdr") :+
        posexplode(slice(col("__tbl"), lit(2), size(col("__tbl")) - 1))): _*)
    body
      .withColumn("record",
        map_from_arrays(col("__hdr"), col("col")))
      .withColumnRenamed("pos", "row_idx")
      .select((idCols.map(col) :+ col("row_idx") :+ col("record")): _*)
  }
}
