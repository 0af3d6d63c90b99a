package graft.queries

import graft.io.Tables
import graft.model.{Scene, SimilarityAlgorithm}
import graft.pipelines.{PrecisionEval, RecommendPipeline, TextRankKeywords}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Date

/** The TextRank pipeline (reference E2, /root/reference/TextRank.java) over
  * the testdata mapping: per-document window-graph keyword extraction
  * (P1/F2/F4) and the full recommend run with clique-graph user profiles
  * (A2/F3). Power-iteration output is not ANSI-SQL-expressible, so these are
  * rows-only queries — the algorithm itself is pinned by the hand-computed
  * TextRankSpec unit tests (including the right=0 tail-clamp quirk).
  */
object TextRankQueries {
  type Q = (SparkSession, String) => DataFrame

  private val scene = Scene(
    windowSize = 5,
    numNewsKeywords = 5,
    numUserKeywords = 8,
    numDays = 7,
    fromDate = Date.valueOf("2024-01-05"),
    toDate = Date.valueOf("2024-01-25"),
    friction = 0.85,
    maxIterates = 30,
    minDifference = 1e-4,
    numRecommendations = 5,
    similarityAlgorithm = SimilarityAlgorithm.EuclideanDistance)

  /** Per-document TextRank keyword table, shared by q39 (direct output) and
    * q40 (scoring input) — one run of the power-iteration UDF over the
    * corpus per session+dataset (the reference writes this exact table to
    * files once, TextRank.java:68-73, and re-reads it at :224).
    */
  private def sharedNewsKw(s: SparkSession, d: String): DataFrame =
    graft.runtime.Stage.shared(s, s"textrank-news-kw:$d") {
      graft.runtime.Stage.persistShared(
        TextRankKeywords.newsKeywords(graft.ops.Ops.fanOut(Tables.news(s, d)), scene))
    }

  val queries: Map[String, Q] = Map(
    // E2 keyword stage: per-document TextRank over the window co-occurrence
    // graph (the graph never crosses a row — a UDF, not GraphX).
    "q39_textrank_kw" -> ((s, d) =>
      sharedNewsKw(s, d).withColumn("value", round(col("value"), 6))),

    // E2 end-to-end: clique-graph user profiles from clicked documents'
    // texts, dot-product scoring, per-(day,user) ranked lists.
    "q40_textrank_rec" -> ((s, d) =>
      // comma-joined list: the external comparator sorts the output frame
      // and can't lexsort raw array columns
      sharedTextrankRecs(s, d).withColumn("news", concat_ws(",", col("news")))),

    // J3/eval for the TextRank recommender — the third leg of the
    // precision matrix (q24 hot topics, q46 TF-IDF dot, q117 TextRank),
    // evaluating the SAME materialized run q40 emits.
    "q117_precision_textrank" -> ((s, d) =>
      PrecisionEval.precisions(sharedTextrankRecs(s, d), Tables.clicks(s, d)))
  )

  /** The q40 recommendation run (user clique profiles → dot scoring →
    * ranked lists, news as array), built once per (session, dataset) and
    * shared with its q117 precision evaluation.
    */
  private def sharedTextrankRecs(s: SparkSession, d: String): DataFrame =
    graft.runtime.Stage.shared(s, s"textrank-recs:$d") {
      val news = Tables.news(s, d)
      val clicks = Tables.clicks(s, d)
      // scoped persist: the keyword profiles feed multiple plan branches, and
      // the TextRank UDF over every document must not re-run per branch
      val newsKw = graft.runtime.Stage.scopedPersist(
        sharedNewsKw(s, d).join(news.select(col("id"), col("date")), "id"))
      val userTweets = clicks.select(col("userId"), col("newsId"))
        .join(news.select(col("id"), col("content")), col("newsId") === col("id"))
        .select(col("userId"), col("content"))
      val userKw = graft.runtime.Stage.scopedPersist(
        TextRankKeywords.userKeywords(userTweets, scene))
      // lineage-cut (not persistShared): the build rides the two scoped
      // keyword caches above, so a plan-cache persist would lose its
      // buffers at the next query scope and re-run the whole TextRank
      // chain (~130 s at sf1) for q117 — see Stage.persistShared scaladoc.
      graft.runtime.Stage.sharedCut(
        RecommendPipeline.recommendAll(userKw, newsKw, clicks, scene,
          limit = Some(scene.numRecommendations), scoreRound = Some(6),
          serving = graft.model.RecServing.Exact))
    }

  /** Recursive-CTE oracles: the per-document window graph (WITH the
    * backward-only walk and right=0 tail clamp — the loop condition
    * `cursor <= right && cursor != index` TERMINATES at the index, so only
    * positions before it are collected) and the power iteration are
    * reproduced in DuckDB with ordered list_reduce folds — the same
    * sorted-word summation order the Scala vote freezes — making the
    * scores BIT-EXACT, not approximately equal. q40 adds the clique user
    * graphs and the full recommend chain on top.
    */
  val oracle: Map[String, String] = Map(
    "q39_textrank_kw" ->
      s"""WITH RECURSIVE
      |toklist AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0) AS tl
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, unnest(range(len(tl))) AS i, unnest(tl) AS tok, len(tl) AS n
      |  FROM toklist),
      |-- window-graph edges with the reference right=0 tail clamp:
      |-- left = max(i-5, 0); right = i+5, clamped to 0 when i+5 >= n
      |nbr AS (
      |  SELECT DISTINCT p1.doc_id, p1.tok AS a, p2.tok AS b
      |  FROM pos p1 JOIN pos p2
      |    ON p2.doc_id = p1.doc_id
      |   AND p2.i >= greatest(p1.i - 5, 0)
      |   AND p2.i <= (CASE WHEN p1.i + 5 >= p1.n THEN 0 ELSE p1.i - 1 END)
      |   AND p2.i != p1.i),
      |nodes AS (
      |  SELECT doc_id, tok AS word,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tok) - 1 AS idx
      |  FROM (SELECT DISTINCT doc_id, tok FROM pos)),
      |degn AS (SELECT doc_id, a AS word, count(*) AS deg FROM nbr GROUP BY 1, 2),
      |degs AS (
      |  SELECT n.doc_id, n.word, n.idx, coalesce(d.deg, 0) AS deg
      |  FROM nodes n LEFT JOIN degn d ON d.doc_id = n.doc_id AND d.word = n.word),
      |-- adjacency as neighbor indices, self-loops and zero-degree neighbors removed
      |adjidx AS (
      |  SELECT e.doc_id, na.idx AS ai, nb.idx AS bi
      |  FROM nbr e
      |  JOIN degs na ON na.doc_id = e.doc_id AND na.word = e.a
      |  JOIN degs nb ON nb.doc_id = e.doc_id AND nb.word = e.b
      |  WHERE e.b != e.a AND nb.deg != 0),
      |adjl AS (SELECT doc_id, ai, list(bi ORDER BY bi) AS nbrs FROM adjidx GROUP BY 1, 2),
      |docarr AS (
      |  SELECT d.doc_id,
      |    list(d.word ORDER BY d.idx) AS words,
      |    list(CAST(d.deg AS DOUBLE) ORDER BY d.idx) AS degl,
      |    list(coalesce(a.nbrs, CAST([] AS BIGINT[])) ORDER BY d.idx) AS adj
      |  FROM degs d LEFT JOIN adjl a ON a.doc_id = d.doc_id AND a.ai = d.idx
      |  GROUP BY d.doc_id),
      |pow AS (
      |  SELECT doc_id, words, degl, adj,
      |    list_transform(range(len(words)), x -> CAST(0.0 AS DOUBLE)) AS scores,
      |    0 AS iter, false AS done
      |  FROM docarr
      |  UNION ALL
      |  SELECT doc_id, words, degl, adj, ns AS scores, iter + 1,
      |    list_max(list_transform(range(len(words)),
      |      i -> abs(ns[CAST(i AS INT)+1] - scores[CAST(i AS INT)+1]))) <= CAST(0.0001 AS DOUBLE) AS done
      |  FROM (
      |    SELECT *,
      |      list_transform(range(len(words)), i ->
      |        list_reduce(
      |          list_prepend(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE),
      |            list_transform(adj[CAST(i AS INT)+1],
      |              ni -> CAST(0.85 AS DOUBLE) / degl[CAST(ni AS INT)+1] * scores[CAST(ni AS INT)+1])),
      |          (x, y) -> x + y)) AS ns
      |    FROM pow WHERE NOT done AND iter < 30) t),
      |fin AS (
      |  SELECT doc_id, words, scores FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY iter DESC) AS rr
      |    FROM pow) WHERE rr = 1),
      |scored AS (SELECT doc_id AS id, unnest(words) AS word, unnest(scores) AS value FROM fin)
      |SELECT id, word, round(value, 6) AS value FROM (
      |  SELECT id, word, value,
      |    row_number() OVER (PARTITION BY id ORDER BY value DESC, word) AS rn
      |  FROM scored) t WHERE rn <= 5
      |""".stripMargin,

    "q40_textrank_rec" -> (textrankRecChain +
      """
      |SELECT userId, day AS date,
      |  array_to_string(list(newsId ORDER BY rn), ',') AS news
      |FROM ranked WHERE rn <= 5 GROUP BY userId, day
      |""".stripMargin),

    "q117_precision_textrank" -> (textrankRecChain +
      """,
      |clicked AS (SELECT DISTINCT userId, date, newsId FROM clicks),
      |joined AS (
      |  SELECT r.day AS date,
      |    CASE WHEN c.newsId IS NULL THEN 0 ELSE 1 END AS hit
      |  FROM ranked r LEFT JOIN clicked c
      |    ON r.userId = c.userId AND r.day = c.date AND r.newsId = c.newsId
      |  WHERE r.rn <= 5)
      |SELECT date, CAST(sum(hit) AS BIGINT) AS n_hits, count(*) AS n_recommended,
      |  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS precision
      |FROM joined GROUP BY date
      |""".stripMargin)
  )

  /** q40's full SQL twin up to the `ranked` CTE (keyword extraction on both
    * sides, scoring, per-(day,user) ranking) — shared with the q117
    * precision tail.
    */
  private lazy val textrankRecChain: String =
      s"""WITH RECURSIVE
      |clicks AS (
      |  SELECT user_id AS userId, event_id % 500 AS newsId,
      |         CAST(ts AS DATE) AS date, 1 AS count
      |  FROM events WHERE event_type = 'click'),
      |toklist AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), w -> len(w) > 0) AS tl
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, unnest(range(len(tl))) AS i, unnest(tl) AS tok, len(tl) AS n
      |  FROM toklist),
      |-- ===== news keywords: backward-window graph + power iteration (q39) =====
      |nbr AS (
      |  SELECT DISTINCT p1.doc_id, p1.tok AS a, p2.tok AS b
      |  FROM pos p1 JOIN pos p2
      |    ON p2.doc_id = p1.doc_id
      |   AND p2.i >= greatest(p1.i - 5, 0)
      |   AND p2.i <= (CASE WHEN p1.i + 5 >= p1.n THEN 0 ELSE p1.i - 1 END)
      |   AND p2.i != p1.i),
      |nodes AS (
      |  SELECT doc_id, tok AS word,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tok) - 1 AS idx
      |  FROM (SELECT DISTINCT doc_id, tok FROM pos)),
      |degn AS (SELECT doc_id, a AS word, count(*) AS deg FROM nbr GROUP BY 1, 2),
      |degs AS (
      |  SELECT n.doc_id, n.word, n.idx, coalesce(d.deg, 0) AS deg
      |  FROM nodes n LEFT JOIN degn d ON d.doc_id = n.doc_id AND d.word = n.word),
      |adjidx AS (
      |  SELECT e.doc_id, na.idx AS ai, nb.idx AS bi
      |  FROM nbr e
      |  JOIN degs na ON na.doc_id = e.doc_id AND na.word = e.a
      |  JOIN degs nb ON nb.doc_id = e.doc_id AND nb.word = e.b
      |  WHERE e.b != e.a AND nb.deg != 0),
      |adjl AS (SELECT doc_id, ai, list(bi ORDER BY bi) AS nbrs FROM adjidx GROUP BY 1, 2),
      |docarr AS (
      |  SELECT d.doc_id,
      |    list(d.word ORDER BY d.idx) AS words,
      |    list(CAST(d.deg AS DOUBLE) ORDER BY d.idx) AS degl,
      |    list(coalesce(a.nbrs, CAST([] AS BIGINT[])) ORDER BY d.idx) AS adj
      |  FROM degs d LEFT JOIN adjl a ON a.doc_id = d.doc_id AND a.ai = d.idx
      |  GROUP BY d.doc_id),
      |pow AS (
      |  SELECT doc_id, words, degl, adj,
      |    list_transform(range(len(words)), x -> CAST(0.0 AS DOUBLE)) AS scores,
      |    0 AS iter, false AS done
      |  FROM docarr
      |  UNION ALL
      |  SELECT doc_id, words, degl, adj, ns AS scores, iter + 1,
      |    list_max(list_transform(range(len(words)),
      |      i -> abs(ns[CAST(i AS INT)+1] - scores[CAST(i AS INT)+1]))) <= CAST(0.0001 AS DOUBLE) AS done
      |  FROM (
      |    SELECT *,
      |      list_transform(range(len(words)), i ->
      |        list_reduce(
      |          list_prepend(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE),
      |            list_transform(adj[CAST(i AS INT)+1],
      |              ni -> CAST(0.85 AS DOUBLE) / degl[CAST(ni AS INT)+1] * scores[CAST(ni AS INT)+1])),
      |          (x, y) -> x + y)) AS ns
      |    FROM pow WHERE NOT done AND iter < 30) t),
      |fin AS (
      |  SELECT doc_id, words, scores FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY iter DESC) AS rr
      |    FROM pow) WHERE rr = 1),
      |news_scored AS (SELECT doc_id AS id, unnest(words) AS word, unnest(scores) AS value FROM fin),
      |news_kw AS (
      |  SELECT id, word, value FROM (
      |    SELECT id, word, value,
      |      row_number() OVER (PARTITION BY id ORDER BY value DESC, word) AS rn
      |    FROM news_scored) t WHERE rn <= 5),
      |news_date AS (SELECT doc_id AS id,
      |  DATE '2024-01-01' + CAST(doc_id % 30 AS INT) AS date FROM documents),
      |-- ===== user keywords: clique graphs over clicked docs + power iteration =====
      |uclick AS (SELECT DISTINCT userId, newsId AS doc_id FROM clicks),
      |doc_toks AS (SELECT DISTINCT doc_id, tok FROM pos),
      |dedge AS (
      |  SELECT a.doc_id, a.tok AS a, b.tok AS b
      |  FROM doc_toks a JOIN doc_toks b ON b.doc_id = a.doc_id AND b.tok != a.tok),
      |uedge AS (
      |  SELECT DISTINCT u.userId, e.a, e.b
      |  FROM uclick u JOIN dedge e ON e.doc_id = u.doc_id),
      |unodes AS (
      |  SELECT userId, tok AS word,
      |    row_number() OVER (PARTITION BY userId ORDER BY tok) - 1 AS idx
      |  FROM (SELECT DISTINCT u.userId, t.tok FROM uclick u JOIN doc_toks t ON t.doc_id = u.doc_id)),
      |udegn AS (SELECT userId, a AS word, count(*) AS deg FROM uedge GROUP BY 1, 2),
      |udegs AS (
      |  SELECT n.userId, n.word, n.idx, coalesce(d.deg, 0) AS deg
      |  FROM unodes n LEFT JOIN udegn d ON d.userId = n.userId AND d.word = n.word),
      |uadjidx AS (
      |  SELECT e.userId, na.idx AS ai, nb.idx AS bi
      |  FROM uedge e
      |  JOIN udegs na ON na.userId = e.userId AND na.word = e.a
      |  JOIN udegs nb ON nb.userId = e.userId AND nb.word = e.b
      |  WHERE nb.deg != 0),
      |uadjl AS (SELECT userId, ai, list(bi ORDER BY bi) AS nbrs FROM uadjidx GROUP BY 1, 2),
      |uarr AS (
      |  SELECT d.userId,
      |    list(d.word ORDER BY d.idx) AS words,
      |    list(CAST(d.deg AS DOUBLE) ORDER BY d.idx) AS degl,
      |    list(coalesce(a.nbrs, CAST([] AS BIGINT[])) ORDER BY d.idx) AS adj
      |  FROM udegs d LEFT JOIN uadjl a ON a.userId = d.userId AND a.ai = d.idx
      |  GROUP BY d.userId),
      |upow AS (
      |  SELECT userId, words, degl, adj,
      |    list_transform(range(len(words)), x -> CAST(0.0 AS DOUBLE)) AS scores,
      |    0 AS iter, false AS done
      |  FROM uarr
      |  UNION ALL
      |  SELECT userId, words, degl, adj, ns AS scores, iter + 1,
      |    list_max(list_transform(range(len(words)),
      |      i -> abs(ns[CAST(i AS INT)+1] - scores[CAST(i AS INT)+1]))) <= CAST(0.0001 AS DOUBLE) AS done
      |  FROM (
      |    SELECT *,
      |      list_transform(range(len(words)), i ->
      |        list_reduce(
      |          list_prepend(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE),
      |            list_transform(adj[CAST(i AS INT)+1],
      |              ni -> CAST(0.85 AS DOUBLE) / degl[CAST(ni AS INT)+1] * scores[CAST(ni AS INT)+1])),
      |          (x, y) -> x + y)) AS ns
      |    FROM upow WHERE NOT done AND iter < 30) t),
      |ufin AS (
      |  SELECT userId, words, scores FROM (
      |    SELECT *, row_number() OVER (PARTITION BY userId ORDER BY iter DESC) AS rr
      |    FROM upow) WHERE rr = 1),
      |user_scored AS (SELECT userId, unnest(words) AS word, unnest(scores) AS value FROM ufin),
      |user_kw AS (
      |  SELECT userId, word, value FROM (
      |    SELECT userId, word, value,
      |      row_number() OVER (PARTITION BY userId ORDER BY value DESC, word) AS rn
      |    FROM user_scored) t WHERE rn <= 8),
      |-- ===== recommend chain (q23 shape, score rounded 6) =====
      |days AS (SELECT unnest(generate_series(DATE '2024-01-05', DATE '2024-01-25',
      |  INTERVAL 1 DAY))::DATE AS day),
      |active AS (SELECT DISTINCT date AS day, userId FROM clicks
      |  WHERE date BETWEEN DATE '2024-01-05' AND DATE '2024-01-25'),
      |cands AS (
      |  SELECT d.day, nk.id, nk.word, nk.value
      |  FROM news_kw nk JOIN news_date nd USING (id) JOIN days d
      |    ON nd.date BETWEEN d.day AND d.day + 7),
      |scores AS (
      |  SELECT a.day, u.userId, c.id AS newsId, round(sum(u.value * c.value), 6) AS score
      |  FROM user_kw u JOIN active a USING (userId)
      |  JOIN cands c ON c.day = a.day AND c.word = u.word
      |  GROUP BY a.day, u.userId, c.id),
      |ranked AS (
      |  SELECT day, userId, newsId,
      |    row_number() OVER (PARTITION BY day, userId ORDER BY score DESC, newsId) AS rn
      |  FROM scores WHERE score > 0)""".stripMargin
}
