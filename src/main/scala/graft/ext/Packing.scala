package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-stream chunk packing — the GPT-style pretraining layout: documents
  * are concatenated in a deterministic global order (doc_id) into one token
  * stream, and the stream is cut into fixed-capacity context windows; a
  * document therefore occupies the half-open token interval
  * [cum − n_tok, cum) and spans chunks floor(start/C) .. floor((cum−1)/C).
  *
  * The core primitive is a GLOBAL prefix sum, which is exactly the thing a
  * naive `Window.orderBy(doc_id)` gets wrong at scale: an un-partitioned
  * window collapses the whole table into ONE task. This implementation is
  * the classic two-phase distributed scan instead:
  *
  *   1. bucket docs by an order-aligned key (doc_id div bucketWidth) and
  *      aggregate per-bucket token totals — a map-side-combined shuffle of
  *      ~N/W rows;
  *   2. prefix-sum the bucket totals (a window over the W×-smaller bucket
  *      table — at 1000-executor scale this level is itself re-bucketable,
  *      the textbook recursive scan) and BROADCAST the offsets back;
  *   3. cumsum WITHIN each bucket (window partitioned by bucket — parallel
  *      across buckets, bounded by W rows per task) plus the bucket offset.
  *
  * Everything stays in whole-stage codegen; no driver-side collect touches
  * doc rows (the offsets frame is N/W rows by construction).
  */
object Packing {

  /** Default order-aligned bucket width (docs per scan bucket). */
  val BucketWidth = 4096L

  /** [[globalRank]] density guard: row count below which the guard is
    * inert (a phase-2 window over <64k tiny rows is never a scale killer,
    * and unit-test/sf0.001 inputs legitimately have near-unique buckets).
    */
  val GuardMinRows = 1L << 16

  /** [[globalRank]] density guard: maximum allowed |bucket table| / N.
    * The production callers sit around 1/40 (n_tok has ~10² distinct
    * values × N/4096 id-blocks); 1/8 leaves wide margin while catching a
    * sparse leading key (near-unique values ⇒ ratio → 1) loudly.
    */
  val MaxBucketFraction = 0.125

  /** Per-doc packing coordinates for a (doc_id, n_tok) frame: adds
    * `tok_start` (0-based position in the concatenated stream),
    * `first_chunk` and `last_chunk` (capacity-`cap` windows touched).
    * Requires n_tok >= 1 rows only (a zero-length doc occupies no chunk;
    * callers filter them out so the span arithmetic stays total).
    */
  def pack(docs: DataFrame, cap: Long, bucketWidth: Long = BucketWidth): DataFrame = {
    require(cap > 0 && bucketWidth > 0)
    val bucketed = docs.withColumn("_bucket", expr(s"doc_id div $bucketWidth"))
    // phase 1: per-bucket totals (tiny: N/W rows)
    val totals = bucketed.groupBy("_bucket").agg(sum("n_tok").as("_btok"))
    // phase 2: bucket-level exclusive prefix sum. The window is over the
    // bucket TABLE, not the doc table — W× smaller by construction.
    val wB = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = totals
      .withColumn("_offset", sum("_btok").over(wB) - col("_btok"))
      .drop("_btok")
    // phase 3: within-bucket scan, shifted by the broadcast bucket offset
    val wD = Window.partitionBy("_bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), "_bucket")
      .withColumn("_cum", col("_offset") + sum("n_tok").over(wD))
      .withColumn("tok_start", col("_cum") - col("n_tok"))
      .withColumn("first_chunk", expr(s"tok_start div $cap"))
      .withColumn("last_chunk", expr(s"(_cum - 1) div $cap"))
      .drop("_bucket", "_offset", "_cum")
  }

  /** Distributed global `row_number` — the ranking face of the same
    * two-phase scan [[pack]] uses for the prefix sum. `buckets` must be
    * order-aligned with `order`: every row of a lexicographically smaller
    * bucket tuple precedes every row of a larger one in the global order
    * (e.g. for ORDER BY n_tok DESC, doc_id: buckets = (−n_tok,
    * doc_id div W)). Phase 1 counts rows per bucket (map-side combined);
    * phase 2 prefix-sums the counts over the bucket table (N/W rows) and
    * broadcasts; phase 3 is a row_number WINDOW PARTITIONED by bucket —
    * parallel across buckets, never the single-task global window a naive
    * `Window.orderBy(...)` plans.
    *
    * DENSITY PRECONDITION (runtime-enforced): the N/W bound on the bucket
    * table holds only when each bucket tuple covers many rows. For
    * composite buckets like (value, id div W) the cardinality is the
    * number of distinct (value, id-block) pairs, which degrades toward N
    * when value groups are sparse across the id space — at that point the
    * phase-2 prefix-sum window (single task) and broadcast(offsets) are
    * corpus-sized, silently reviving exactly the plan this function exists
    * to avoid. Callers choosing bucket columns must ensure the leading
    * bucket key is low-cardinality relative to N/W (q256/q266 use n_tok,
    * whose distinct-value count is bounded by document length) or coarsen
    * the id-block width.
    *
    * The guard is a one-row probe job over the phase-1 counts frame at
    * plan-construction time (both production callers feed a
    * `Stage.scopedPersist`-cached 16-byte/row frame, so the extra pass
    * reads cache, and the returned plan — hence its digest — is
    * unchanged). It fails loudly when the bucket table exceeds
    * `maxBucketFraction`·N; frames under `guardMinRows` rows are exempt —
    * a window that small is never a scale killer, and tiny inputs (unit
    * tests, sf0.001) legitimately have near-unique buckets.
    */
  def globalRank(df: DataFrame, buckets: Seq[Column], order: Seq[Column],
                 rankCol: String,
                 guardMinRows: Long = GuardMinRows,
                 maxBucketFraction: Double = MaxBucketFraction): DataFrame = {
    require(buckets.nonEmpty && order.nonEmpty)
    val bCols = buckets.indices.map(i => s"_gb$i")
    val b = buckets.zip(bCols).foldLeft(df) { case (acc, (c, n)) => acc.withColumn(n, c) }
    val counts = b.groupBy(bCols.map(col): _*).agg(count(lit(1)).as("_bn"))
    val probe = counts
      .agg(coalesce(sum("_bn"), lit(0L)).as("_n"), count(lit(1)).as("_nb"))
      .head()
    val (n, nb) = (probe.getLong(0), probe.getLong(1))
    if (n >= guardMinRows && nb.toDouble > n.toDouble * maxBucketFraction)
      throw new IllegalStateException(
        s"Packing.globalRank density precondition violated: $nb distinct " +
          s"bucket tuples over $n rows (> ${maxBucketFraction * 100}%% of N) " +
          "— the phase-2 prefix-sum window and broadcast(offsets) would be " +
          "corpus-sized. Use a lower-cardinality leading bucket key or a " +
          "coarser id-block width (doc_id div W with larger W).")
    val wB = Window.orderBy(bCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("_goff", sum("_bn").over(wB) - col("_bn")).drop("_bn")
    val wD = Window.partitionBy(bCols.map(col): _*).orderBy(order: _*)
    b.join(broadcast(offsets), bCols)
      .withColumn(rankCol, col("_goff") + row_number().over(wD))
      .drop("_goff").drop(bCols: _*)
  }

  /** Per-chunk occupancy: how many documents touch each capacity-`cap`
    * window and how many of the chunk's token slots they fill (`n_tokens`
    * = cap for every chunk but the last — the invariant that makes the
    * lane oracle-checkable end-to-end). A doc spanning k chunks emits k
    * rows via sequence-explode — bounded by ceil(n_tok/cap)+1 per doc.
    */
  def chunkSummary(docs: DataFrame, cap: Long,
                   bucketWidth: Long = BucketWidth): DataFrame =
    pack(docs, cap, bucketWidth)
      .withColumn("chunk_id",
        explode(sequence(col("first_chunk"), col("last_chunk"))))
      .withColumn("_tok_end", col("tok_start") + col("n_tok"))
      .withColumn("_overlap",
        least(col("_tok_end"), (col("chunk_id") + 1) * cap)
          - greatest(col("tok_start"), col("chunk_id") * cap))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("_overlap").as("n_tokens"))
}
