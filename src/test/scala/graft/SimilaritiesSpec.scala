package graft

import graft.model.Keyword
import graft.sim.Similarities._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

/** Unit specs for the reference similarity library F5-F12, asserting the
  * *quirky* reference values (SURVEY.md §7 "hard parts") so an accidental
  * "fix" to textbook formulas fails loudly.
  */
class SimilaritiesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(result.passed, result.status.toString)
  }

  private def kw(pairs: (String, Double)*): Seq[Keyword] =
    pairs.map { case (w, v) => Keyword(w, v) }

  test("F5 calculateX: product denominator + k2 duplicates kept (CosineSimilarity.java:92-126)") {
    // common = [a] ++ [b, c, b]; numerator counts dup b twice => 2/(3*3)
    val v = calculateX(kw("a" -> 1, "b" -> 2), kw("b" -> 3, "c" -> 4, "b" -> 5))
    assert(v === 2.0 / 9.0)
  }

  test("F5 calculateX: identical singletons give 1/(1*1), empty gives NaN") {
    assert(calculateX(kw("x" -> 1), kw("x" -> 9)) === 1.0)
    assert(calculateX(Nil, Nil).isNaN) // 0/(0*0) as in Java
  }

  test("F5 calculateX: NOT the textbook cosine") {
    // textbook overlap cosine of {a,b} vs {b,c} = 1/sqrt(4) = 0.5; reference = 1/4
    assert(calculateX(kw("a" -> 1, "b" -> 1), kw("b" -> 1, "c" -> 1)) === 0.25)
  }

  test("F6 compute: sum min^2 / sum max^2 (CosineSimilarity.java:52-86)") {
    // inter {b:1}, union {a:1, b:2, c:3} => 1/14
    val v = compute(kw("a" -> 1, "b" -> 2), kw("b" -> 1, "c" -> 3))
    assert(v === 1.0 / 14.0)
  }

  test("F7 computeBoolean mirrors F5 on raw strings") {
    assert(computeBoolean(Seq("a", "b"), Seq("b", "c")) === 0.25)
    assert(computeBoolean(Seq("a", "", null), Seq("a")) === 1.0) // empties dropped
  }

  test("F8 dot: sparse dot product, k1 dup last-wins, k2 dup adds (EuclideanDistance.java:29-43)") {
    val v = dot(kw("a" -> 2, "b" -> 3, "a" -> 5), kw("a" -> 1, "b" -> 2, "a" -> 3))
    assert(v === 26.0) // 5*1 + 3*2 + 5*3
  }

  test("F9 rankDistance exact bookkeeping (EuclideanDistance.java:52-83)") {
    assert(rankDistance(Seq("x", "y"), Seq("y", "z")) === 24)
    assert(rankDistance(Nil, Nil) === 0)
  }

  test("F10 rankMatchScore (EuclideanDistance.java:94-112)") {
    assert(rankMatchScore(Seq("x", "y"), Seq("y", "z"), 2, 2) === 8)
  }

  test("F11 tuple-list variant equals F9 on words (EuclideanDistance.java:121-152)") {
    assert(rankDistanceKw(kw("x" -> 1, "y" -> 2), kw("y" -> 9, "z" -> 8)) === 24)
  }

  test("F12 calculateMax (EuclideanDistance.java:154-164)") {
    assert(rankDistanceMax(2, 2) === 40)
    assert(rankDistanceMax(0, 5) === 0)
  }

  private val kwListGen: Gen[Seq[Keyword]] = for {
    n <- Gen.choose(0, 6)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
    vs <- Gen.listOfN(n, Gen.choose(0.0, 10.0))
  } yield ws.zip(vs).map { case (w, v) => Keyword(w, v) }

  test("property: calculateX symmetric for duplicate-free lists") {
    check(Prop.forAll(kwListGen, kwListGen) { (a, b) =>
      val a1 = a.distinctBy(_.word)
      val b1 = b.distinctBy(_.word)
      val x = calculateX(a1, b1)
      val y = calculateX(b1, a1)
      (x.isNaN && y.isNaN) || x == y
    })
  }

  test("property: dot matches naive sparse dot for duplicate-free lists") {
    check(Prop.forAll(kwListGen, kwListGen) { (a, b) =>
      val a1 = a.distinctBy(_.word)
      val b1 = b.distinctBy(_.word)
      val m = a1.map(k => k.word -> k.value).toMap
      val expected = b1.collect { case k if m.contains(k.word) => m(k.word) * k.value }.sum
      math.abs(dot(a1, b1) - expected) < 1e-12
    })
  }

  test("property: F6 compute is within [0,1] for nonempty inputs and ~1 on self") {
    check(Prop.forAll(kwListGen, kwListGen) { (a, b) =>
      val d = a.distinctBy(_.word).map(k => Keyword(k.word, k.value + 0.001))
      val e = b.distinctBy(_.word)
      val selfOk = d.isEmpty || {
        val s = compute(d, d); s >= 0.999999 && s <= 1.000001
      }
      val crossOk = d.isEmpty || e.isEmpty || {
        val v = compute(d, e); v >= 0.0 && v <= 1.0
      }
      selfOk && crossOk
    })
  }
}
