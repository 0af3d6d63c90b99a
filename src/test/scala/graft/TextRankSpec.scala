package graft

import graft.model.Keyword
import graft.text.{TextRankCore, Tokenizer}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

class TextRankSpec extends AnyFunSuite {

  test("tokenizer: lowercase, non-letter split, empties dropped") {
    assert(Tokenizer.tokenize("Hello, World! 123 foo") === List("hello", "world", "foo"))
    assert(Tokenizer.tokenize("") === Nil)
    assert(Tokenizer.tokenize(null) === Nil)
    assert(Tokenizer.tokenMap("a b a") === Map("a" -> 2, "b" -> 1))
  }

  test("F2 windowGraph: backward-looking adjacency with the right=0 tail clamp (TextRank.java:184)") {
    // [a,b,c,d], window 1: loop runs cursor=left..right, stopping at index —
    // index 0 never collects; d's window (right=4>=4 -> 0) collects nothing.
    val g = TextRankCore.windowGraph(Seq("a", "b", "c", "d"), 1)
    assert(g === Map("a" -> Set(), "b" -> Set("a"), "c" -> Set("b"), "d" -> Set()))
  }

  test("F2 windowGraph: tail clamp truncates at the clamped right bound") {
    // [a,b,c], window 2: c has right=4>=3 -> 0, so only cursor=0 (token a)
    // is collected — NOT the symmetric {a,b}.
    val g = TextRankCore.windowGraph(Seq("a", "b", "c"), 2)
    assert(g === Map("a" -> Set(), "b" -> Set("a"), "c" -> Set("a")))
  }

  test("F2 windowGraph: duplicate tokens share one node") {
    val g = TextRankCore.windowGraph(Seq("a", "b", "a"), 1)
    // index0 a: none; index1 b: {a}; index2 a: right=3>=3->0, left=1 -> loop
    // cursor=1 <= 0 false -> nothing
    assert(g === Map("a" -> Set(), "b" -> Set("a")))
  }

  test("F3 cliqueGraph: all-pairs neighbors, accumulates across texts (TextRank.java:144-162)") {
    val acc = mutable.LinkedHashMap[String, mutable.Set[String]]()
    TextRankCore.cliqueGraph("a b", acc)
    TextRankCore.cliqueGraph("b c", acc)
    assert(acc.view.mapValues(_.toSet).toMap ===
      Map("a" -> Set("b"), "b" -> Set("a", "c"), "c" -> Set("b")))
  }

  test("F4 vote: single iteration yields 1-d everywhere (TextRank.java:205)") {
    val g = Map("a" -> Set("b"), "b" -> Set("a"))
    val ks = TextRankCore.vote(g, 2, friction = 0.85, maxIterates = 1, minDifference = 0.0)
    assert(ks.map(_.word) === List("a", "b")) // tie broken word-asc
    ks.foreach(k => assert(math.abs(k.value - 0.15) < 1e-12))
  }

  test("F4 vote: symmetric 2-cycle converges to ~1.0") {
    val g = Map("a" -> Set("b"), "b" -> Set("a"))
    val ks = TextRankCore.vote(g, 2, 0.85, 200, 1e-9)
    ks.foreach(k => assert(math.abs(k.value - 1.0) < 1e-6))
  }

  test("F4 vote: hub scores above leaves; top-k cut respected") {
    // star: hub adjacent to 3 leaves; leaves adjacent to hub only
    val g = Map(
      "hub" -> Set("l1", "l2", "l3"),
      "l1" -> Set("hub"), "l2" -> Set("hub"), "l3" -> Set("hub"))
    val all = TextRankCore.vote(g, 4, 0.85, 200, 1e-9)
    val byWord = all.map(k => k.word -> k.value).toMap
    assert(byWord("hub") > byWord("l1"))
    assert(TextRankCore.vote(g, 1, 0.85, 200, 1e-9).map(_.word) === List("hub"))
  }

  test("firstN: value desc then word asc") {
    val top = TextRankCore.firstN(Map("b" -> 1.0, "a" -> 1.0, "c" -> 2.0), 2)
    assert(top === List(Keyword("c", 2.0), Keyword("a", 1.0)))
  }

  test("end-to-end keywords: deterministic on fixed text") {
    val k1 = TextRankCore.keywords("spark flink spark batch stream batch", 2, 3, 0.85, 100, 1e-4)
    val k2 = TextRankCore.keywords("spark flink spark batch stream batch", 2, 3, 0.85, 100, 1e-4)
    assert(k1 === k2)
    assert(k1.size === 3)
  }

  test("A2 userKeywords merges tweet cliques") {
    val ks = TextRankCore.userKeywords(Seq("a b", "b c", "c d"), 4, 0.85, 100, 1e-6)
    assert(ks.map(_.word).toSet === Set("a", "b", "c", "d"))
    val byWord = ks.map(k => k.word -> k.value).toMap
    assert(byWord("b") > byWord("a")) // b has degree 2, a degree 1
  }

  test("A2 bitset path is bit-identical to the cliqueGraph+vote path") {
    // userKeywords runs an int-interned BitSet clique accumulator (the q40
    // hot path); its scores must be BIT-equal to the reference-shaped
    // string-set accumulation — same graph content, same alphabetical
    // summation order. Randomized over seeds so the pin covers repeated
    // tokens, single-token tweets, and cross-tweet overlaps.
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array("ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx")
      val texts = Seq.fill(12)(
        Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      val fast = TextRankCore.userKeywords(texts, 8, 0.85, 100, 1e-6)
      val words = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.Set[String]]()
      texts.foreach(t => TextRankCore.cliqueGraph(t, words))
      val slow = TextRankCore.vote(
        words.iterator.map { case (k, v) => (k, v.toSet) }.toMap, 8, 0.85, 100, 1e-6)
      assert(fast === slow, s"seed $seed")
    }
  }
}
