package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.1 K1 + §2.7 F15): the reference writes every output
  * through `writeAsFormattedText(path, OVERWRITE, TextFormatter)` — a custom
  * per-row string rendering to text files (11 sites, e.g.
  * /root/reference/TextRank.java:68-73,300-305). Here: a `Column`-valued
  * renderer (codegen'd string building, no UDF) into `.text`, plus a dual
  * parquet write so typed round-trips (S4, DocumentModel.loadDocumentDataSet)
  * stay columnar instead of re-parsing text.
  */
object Writers {

  /** K1: render each row with `render` and overwrite-write as text. */
  def writeFormattedText(df: DataFrame, render: Column, path: String): Unit =
    df.select(render.cast("string").as("value"))
      .write.mode("overwrite").text(path)

  /** Dual write: canonical parquet (partitioned if asked) + formatted text. */
  def writeDual(df: DataFrame, render: Column, parquetPath: String, textPath: String,
                partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(parquetPath)
    writeFormattedText(df, render, textPath)
  }

  /** F15 renderer for Document rows (frozen text spec for the reference's
    * `DocumentModel.toString`): `id|userId|date|word:value;word:value;...`
    * with keyword weights fixed to 6 decimals.
    */
  def documentRender: Column =
    concat_ws("|",
      coalesce(col("id").cast("string"), lit("")),
      coalesce(col("userId").cast("string"), lit("")),
      coalesce(col("date").cast("string"), lit("")),
      concat_ws(";", transform(col("keywords"),
        k => concat(k("word"), lit(":"), format_number(k("value"), 6)))))

  /** F15 renderer for Recommendation rows: `userId|date|news1,news2,...`. */
  def recommendationRender: Column =
    concat_ws("|",
      col("userId").cast("string"),
      col("date").cast("string"),
      concat_ws(",", transform(col("news"), n => n.cast("string"))))
}
