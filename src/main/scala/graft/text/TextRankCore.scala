package graft.text

import graft.model.Keyword
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import scala.collection.mutable

/** TextRank keyword extraction (reference F2/F3/F4, SURVEY.md §2.7).
  *
  * The co-occurrence graph never crosses a document boundary
  * (/root/reference/TextRank.java:57-75: graph build + power iteration live
  * inside one `map` call), so in Spark this is a per-row pure function wrapped
  * in a UDF — *not* GraphX/Pregel; distributing a ≤few-hundred-node graph
  * would be pure overhead at any scale.
  */
object TextRankCore {

  /** F2 — sliding-window co-occurrence graph (TextRank.java:164-192).
    *
    * Faithfully replicates TWO reference quirks, both guarded by unit tests
    * so nobody "fixes" them silently:
    *  - the cursor loop's condition is `cursor <= right && cursor != index`,
    *    so it TERMINATES at the token's own position rather than skipping
    *    it — only the LEFT half-window `[index-windowSize, index)` is ever
    *    collected, never the tokens to the right (they add the reverse edge
    *    when their own turn comes);
    *  - when `index + windowSize` runs past the end, `right` clamps to
    *    **0** (not `size-1`; TextRank.java:184), so tail tokens collect
    *    either just the sentence-initial token (when `left == 0`) or
    *    nothing.
    */
  def windowGraph(tokens: Seq[String], windowSize: Int): Map[String, Set[String]] = {
    val words = mutable.LinkedHashMap[String, mutable.LinkedHashSet[String]]()
    val n = tokens.size
    for (index <- 0 until n) {
      val token = tokens(index)
      val set = words.getOrElseUpdate(token, mutable.LinkedHashSet[String]())
      var left = index - windowSize
      if (left < 0) left = 0
      var right = index + windowSize
      if (right >= n) right = 0 // matches reference TextRank.java:184
      var cursor = left
      while (cursor <= right && cursor != index) {
        set += tokens(cursor)
        cursor += 1
      }
    }
    words.iterator.map { case (k, v) => (k, v.toSet) }.toMap
  }

  /** F3 — clique accumulator variant (TextRank.java:144-162): every distinct
    * token of a text becomes a neighbor of every other; accumulates across
    * calls (used to merge all of a user's tweets into one graph,
    * TextRank.java:118-123).
    */
  def cliqueGraph(text: String, words: mutable.Map[String, mutable.Set[String]]): mutable.Map[String, mutable.Set[String]] = {
    val keySet = Tokenizer.tokenMap(text).keySet
    if (keySet.nonEmpty) {
      for (key <- keySet) {
        val set = words.getOrElseUpdate(key, mutable.LinkedHashSet[String]())
        for (value <- keySet if key != value) set += value
      }
    }
    words
  }

  /** F4 — TextRank power iteration (TextRank.java:194-218).
    *
    * score(w) = (1-d) + d·Σ_{n∈adj(w)} score(n)/deg(n), starting from all-0,
    * iterating ≤ maxIterates or until max|Δ| ≤ minDifference; self-loops and
    * zero-degree neighbors skipped (TextRank.java:208). Iteration order is
    * sorted-by-word here so the floating-point summation is deterministic
    * (the reference's HashMap order is JVM-dependent; this freezes the spec).
    */
  def vote(words: Map[String, Set[String]], numKeywords: Int, friction: Double,
           maxIterates: Int, minDifference: Double): List[Keyword] = {
    // Index the graph once: sorted keys, int-indexed sorted adjacency with
    // the reference's guards (self-loops and zero-degree neighbors skipped,
    // TextRank.java:208) pre-applied — the per-iteration loop is then pure
    // array arithmetic. Same summation order as the naive sorted loop:
    // `index` ranks words ALPHABETICALLY, so sorting neighbor indices as
    // ints yields exactly the sorted-by-word order the spec freezes —
    // without the per-node string sort that dominated dense user graphs
    // (measured: 1.4 s of the 2.8 s per heavy sf1 user profile).
    val keys = words.keys.toArray.sorted
    val index = keys.zipWithIndex.toMap
    val degree = keys.map(k => words(k).size)
    val adj: Array[Array[Int]] = keys.zipWithIndex.map { case (k, ki) =>
      val a = words(k).iterator
        .flatMap(n => index.get(n))
        .filter(ni => ni != ki && degree(ni) != 0)
        .toArray
      java.util.Arrays.sort(a)
      a
    }
    voteIndexed(keys, adj, degree, numKeywords, friction, maxIterates, minDifference)
  }

  /** The shared power-iteration core over an int-indexed graph whose `keys`
    * are alphabetically sorted and whose adjacency arrays are ascending
    * (= sorted-by-word — the frozen summation order). Guards (no self, no
    * zero-degree neighbor) must already be applied by the caller.
    */
  private def voteIndexed(keys: Array[String], adj: Array[Array[Int]], degree: Array[Int],
                          numKeywords: Int, friction: Double,
                          maxIterates: Int, minDifference: Double): List[Keyword] = {
    val d = friction
    val n = keys.length
    // degree is iteration-invariant, so hoist `d / degree(ni)` out of the
    // edge loop: `invDeg(ni) * score(ni)` is the SAME expression tree as
    // `d / degree(ni) * score(ni)` ((d/deg)·score, left-to-right), so every
    // partial sum is bit-identical to the frozen spec the DuckDB oracles
    // reproduce — this only removes a hardware division from the innermost
    // loop (dense clique graphs: |edges| ≈ |nodes|² per user, the q40 sf1
    // hot stage).
    val invDeg = degree.map(deg => if (deg != 0) d / deg else 0.0)
    var score = new Array[Double](n)
    var it = 0
    var done = false
    while (it < maxIterates && !done) {
      var maxDiff = 0.0
      val m = new Array[Double](n)
      var i = 0
      while (i < n) {
        var v = 1 - d
        val neighbors = adj(i)
        var j = 0
        while (j < neighbors.length) {
          val ni = neighbors(j)
          v += invDeg(ni) * score(ni)
          j += 1
        }
        m(i) = v
        maxDiff = math.max(maxDiff, math.abs(v - score(i)))
        i += 1
      }
      score = m
      it += 1
      if (maxDiff <= minDifference) done = true
    }
    firstN(keys.indices.map(i => keys(i) -> score(i)).toMap, numKeywords)
  }

  /** `Utils.firstN` (impl absent; called TextRank.java:217) — frozen spec:
    * top-n by (value desc, word asc).
    */
  def firstN(score: Map[String, Double], n: Int): List[Keyword] =
    score.toList.sortBy { case (w, v) => (-v, w) }.take(n)
      .map { case (w, v) => Keyword(w, v) }

  /** End-to-end per-document extraction (reference P1,
    * TextRank.java:59-68): text → window graph → vote → top-k keywords.
    */
  def keywords(text: String, windowSize: Int, numKeywords: Int, friction: Double,
               maxIterates: Int, minDifference: Double): List[Keyword] =
    vote(windowGraph(Tokenizer.tokenize(text), windowSize), numKeywords,
      friction, maxIterates, minDifference)

  /** UDF form returning array<struct<word:string,value:double>>. */
  def keywordsUdf(windowSize: Int, numKeywords: Int, friction: Double,
                  maxIterates: Int, minDifference: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) =>
      keywords(text, windowSize, numKeywords, friction, maxIterates, minDifference))

  def keywordsCol(text: Column, windowSize: Int, numKeywords: Int, friction: Double,
                  maxIterates: Int, minDifference: Double): Column =
    keywordsUdf(windowSize, numKeywords, friction, maxIterates, minDifference)(text)

  /** Merged-tweets user-profile keywords (reference A2, TextRank.java:111-128):
    * clique graphs accumulated over all of a user's texts, then one vote.
    *
    * Implementation: int-interned tokens + per-node BitSet adjacency instead
    * of the string-set [[cliqueGraph]] accumulator — a heavy sf1 user merges
    * hundreds of tweets into a graph with millions of clique edges, and the
    * per-tweet `|tokens|²` string-set inserts were half the q40 stage's CPU
    * (the BitSet union is one word-OR per 64 neighbors). The graph CONTENT
    * is identical: same node set, same undirected clique union, no
    * self-loops (`b.remove(id)` below — a token never cliques with itself
    * within a tweet, and bits only ever come from tweet unions). The vote
    * runs over the alphabetically-ranked remap, so scores are bit-identical
    * to the [[cliqueGraph]]+[[vote]] path (pinned by TextRankSpec).
    */
  def userKeywords(texts: Seq[String], numKeywords: Int, friction: Double,
                   maxIterates: Int, minDifference: Double): List[Keyword] = {
    val dict = mutable.HashMap[String, Int]()
    val idWords = mutable.ArrayBuffer[String]()
    val bits = mutable.ArrayBuffer[mutable.BitSet]()
    texts.foreach { t =>
      val ks = Tokenizer.tokenMap(t).keySet
      if (ks.nonEmpty) {
        val ids = ks.iterator.map { w =>
          dict.getOrElseUpdate(w, { idWords += w; bits += mutable.BitSet(); idWords.size - 1 })
        }.toArray
        val tweetBits = mutable.BitSet(ids: _*)
        var i = 0
        while (i < ids.length) {
          val id = ids(i)
          val b = bits(id)
          b |= tweetBits
          b.remove(id)
          i += 1
        }
      }
    }
    // Alphabetical remap: rank(oldId) = position of its word in sorted
    // order, so int-sorted adjacency == sorted-by-word (the frozen
    // summation order). A zero-degree node can only be a token that always
    // appeared alone; such a node is never inside another node's bit set
    // (membership implies co-occurrence implies both degrees ≥ 1), so the
    // reference's zero-degree-neighbor guard is vacuous here.
    val order = idWords.zipWithIndex.sortBy(_._1)
    val keys = order.map(_._1).toArray
    val rank = new Array[Int](idWords.length)
    order.zipWithIndex.foreach { case ((_, old), r) => rank(old) = r }
    val degree = order.map { case (_, old) => bits(old).size }.toArray
    val adj: Array[Array[Int]] = order.map { case (_, old) =>
      val a = bits(old).iterator.map(rank).toArray
      java.util.Arrays.sort(a)
      a
    }.toArray
    voteIndexed(keys, adj, degree, numKeywords, friction, maxIterates, minDifference)
  }
}
