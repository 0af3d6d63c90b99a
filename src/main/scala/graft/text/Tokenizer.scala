package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic tokenizer — the engine's frozen spec for the reference's
  * absent `Tokenizer.getTokenList/getTokenMap` (called at
  * /root/reference/TextRank.java:146,166): lowercase, split on runs of
  * non-letter characters, drop empties. Kept as Column expressions (codegen'd,
  * no UDF) so tokenize-explode stays inside whole-stage codegen.
  */
object Tokenizer {

  /** Tokens of a text column as array<string> (may contain duplicates). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => length(w) > 0)

  /** Pure-Scala twin of [[tokens]] for the per-document in-UDF algorithms
    * (TextRank graphs) — must stay semantically identical to the Column form.
    */
  def tokenize(text: String): List[String] =
    if (text == null) Nil
    else text.toLowerCase.split("[^a-z]+").iterator.filter(_.nonEmpty).toList

  /** Token → count map (reference `getTokenMap`, TextRank.java:146). */
  def tokenMap(text: String): Map[String, Int] =
    tokenize(text).groupBy(identity).map { case (w, ws) => (w, ws.size) }
}
