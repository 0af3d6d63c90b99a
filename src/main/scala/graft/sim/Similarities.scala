package graft.sim

import graft.model.Keyword
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import scala.collection.mutable

/** The reference's similarity library (SURVEY.md §2.7 F5-F12), re-expressed as
  * pure Scala functions with **bit-faithful quirk preservation**:
  *
  *  - F5/F7: the "cosine" denominator is the *product* |k1|·|k2|, not
  *    √(|k1|·|k2|) (/root/reference/CosineSimilarity.java:48,126), and the
  *    union list keeps k2's duplicates (CosineSimilarity.java:92-113), so
  *    duplicate words in k2 are counted twice in both numerator positions and
  *    denominator2. Empty inputs yield 0/0 = NaN exactly as Java does.
  *  - F8: "EuclideanDistance.compute" is actually a sparse dot product
  *    (/root/reference/EuclideanDistance.java:35-40).
  *  - F9-F12: rank-position-weighted quadratic "distances" with the exact
  *    multiple bookkeeping of EuclideanDistance.java:52-164 (integer
  *    arithmetic — order-independent, so faithful bit-for-bit).
  *
  * The `udf`-wrapped forms are for the faithful cross-join scorer and for
  * spot queries; the scale path decomposes F5/F8 into inverted-index
  * equi-joins (graft.sim.Scoring) with identical semantics.
  */
object Similarities extends Serializable {

  /** F5 — CosineSimilarity.calculateX (CosineSimilarity.java:88-127).
    * Used by both recommenders (TextRank.java:268, TF_IDF.java:196).
    */
  def calculateX(k1: Seq[Keyword], k2: Seq[Keyword]): Double = {
    val common = mutable.ArrayBuffer[String]()
    for (key1 <- k1 if key1 != null) {
      val unique = !k2.exists(key2 => key2 != null && key1.word == key2.word)
      if (unique) common += key1.word
    }
    for (key2 <- k2 if key2 != null) common += key2.word

    var numerator, d1, d2 = 0
    for (c <- common) {
      val in1 = k1.exists(kw => kw != null && kw.word == c)
      val in2 = k2.exists(kw => kw != null && kw.word == c)
      if (in1 && in2) numerator += 1
      if (in1) d1 += 1
      if (in2) d2 += 1
    }
    numerator.toDouble / (d1 * d2) // product denominator, matches :126 (0/0 => NaN)
  }

  /** F6 — CosineSimilarity.compute (CosineSimilarity.java:52-86): weighted
    * fuzzy overlap Σ min² / Σ max². Insertion-ordered maps freeze the
    * reference's order-dependent duplicate handling into a deterministic spec.
    */
  def compute(k1: Seq[Keyword], k2: Seq[Keyword]): Double = {
    val union = mutable.LinkedHashMap[String, Double]()
    val intersection = mutable.LinkedHashMap[String, Double]()
    for (kw <- k1) union(kw.word) = kw.value
    for (kw <- k2) union.get(kw.word) match {
      case Some(v1) =>
        val (mn, mx) = if (v1 > kw.value) (kw.value, v1) else (v1, kw.value)
        intersection(kw.word) = mn
        union(kw.word) = mx
      case None => union(kw.word) = kw.value
    }
    var num, den = 0.0
    for (d <- intersection.values) num += d * d
    for (d <- union.values) den += d * d
    num / den
  }

  /** F7 — CosineSimilarity.computeBoolean (CosineSimilarity.java:10-49):
    * string-list variant of F5 with null/empty filtering on the union build.
    */
  def computeBoolean(k1: Seq[String], k2: Seq[String]): Double = {
    val union = mutable.ArrayBuffer[String]()
    for (key1 <- k1 if key1 != null && key1.nonEmpty) {
      val unique = !k2.exists(key2 => key2 != null && key2.nonEmpty && key1 == key2)
      if (unique) union += key1
    }
    for (key2 <- k2 if key2 != null && key2.nonEmpty) union += key2

    var numerator, d1, d2 = 0
    for (c <- union) {
      val in1 = k1.contains(c)
      val in2 = k2.contains(c)
      if (in1 && in2) numerator += 1
      if (in1) d1 += 1
      if (in2) d2 += 1
    }
    numerator.toDouble / (d1 * d2)
  }

  /** F8 — EuclideanDistance.compute (EuclideanDistance.java:29-43): a sparse
    * dot product over shared words (k1 duplicates: last value wins via map
    * overwrite; k2 duplicates each add a term, in k2 order).
    */
  def dot(k1: Seq[Keyword], k2: Seq[Keyword]): Double = {
    val map = mutable.HashMap[String, Double]()
    for (kw <- k1) map(kw.word) = kw.value
    var acc = 0.0
    for (kw <- k2; v <- map.get(kw.word)) acc += v * kw.value
    acc
  }

  /** F9 — EuclideanDistance.calculate(String[],String[])
    * (EuclideanDistance.java:52-83): rank-encoded squared distance.
    * Integer arithmetic — exact.
    */
  def rankDistance(k1: Seq[String], k2: Seq[String]): Int = {
    val length1 = k1.size
    val length2 = k2.size
    val map2 = mutable.LinkedHashMap[String, Int]()
    var multiple = length1 * length2
    for (s2 <- k2) { map2(s2) = multiple; multiple -= length1 }

    multiple = length1 * length2
    var distance = 0
    for (s1 <- k1) {
      val temp = map2.get(s1) match {
        case Some(m) => map2(s1) = 0; multiple - m
        case None    => multiple
      }
      distance += temp * temp
      multiple -= length2
    }
    for (v <- map2.values) distance += v * v
    distance
  }

  /** F10 — EuclideanDistance.calculate(String[],String[],int,int)
    * (EuclideanDistance.java:94-112): positive-match rank product sum.
    */
  def rankMatchScore(k1: Seq[String], k2: Seq[String], length1: Int, length2: Int): Int = {
    var distance = 0
    var multiple1 = length1 * length2
    for (key1 <- k1) {
      if (key1 != null) {
        var multiple2 = length1 * length2
        for (key2 <- k2) {
          if (key1 == key2) distance += multiple1 * multiple2
          multiple2 -= length1
        }
      }
      multiple1 -= length2
    }
    distance
  }

  /** F11 — EuclideanDistance.calculate(LinkedList,LinkedList)
    * (EuclideanDistance.java:121-152): (word,weight)-tuple variant of F9;
    * weights are ignored, identical arithmetic.
    */
  def rankDistanceKw(k1: Seq[Keyword], k2: Seq[Keyword]): Int =
    rankDistance(k1.map(_.word), k2.map(_.word))

  /** F12 — EuclideanDistance.calculateMax (EuclideanDistance.java:154-164):
    * normalization constant for F9-F11.
    */
  def rankDistanceMax(length1: Int, length2: Int): Int = {
    var value = 0
    var multiple = length1 * length2
    while (multiple > 0) { value += multiple * multiple; multiple -= length1 }
    multiple = length1 * length2
    while (multiple > 0) { value += multiple * multiple; multiple -= length2 }
    value
  }

  // ---- Column/UDF forms (for the faithful cross-join scorer & spot queries).
  // Keyword lists travel as array<struct<word:string,value:double>>.

  private def toKw(s: Seq[org.apache.spark.sql.Row]): Seq[Keyword] =
    if (s == null) null else s.map(r => Keyword(r.getString(0), r.getDouble(1)))

  val calculateXUdf = udf((a: Seq[org.apache.spark.sql.Row], b: Seq[org.apache.spark.sql.Row]) =>
    calculateX(toKw(a), toKw(b)))
  val computeUdf = udf((a: Seq[org.apache.spark.sql.Row], b: Seq[org.apache.spark.sql.Row]) =>
    compute(toKw(a), toKw(b)))
  val computeBooleanUdf = udf((a: Seq[String], b: Seq[String]) => computeBoolean(a, b))
  val dotUdf = udf((a: Seq[org.apache.spark.sql.Row], b: Seq[org.apache.spark.sql.Row]) =>
    dot(toKw(a), toKw(b)))
  val rankDistanceUdf = udf((a: Seq[String], b: Seq[String]) => rankDistance(a, b))
  val rankDistanceKwUdf = udf((a: Seq[org.apache.spark.sql.Row], b: Seq[org.apache.spark.sql.Row]) =>
    rankDistanceKw(toKw(a), toKw(b)))

  def calculateXCol(a: Column, b: Column): Column = calculateXUdf(a, b)
  def dotCol(a: Column, b: Column): Column = dotUdf(a, b)
}
