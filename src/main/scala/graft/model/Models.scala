package graft.model

import java.sql.Date

/** Entity model of the reference system (SURVEY.md §1, FIXTURES.md §a).
  * Case classes double as Dataset[T] element types and as the frozen spec for
  * the reference's absent model classes.
  */

/** NewsModel — /root/reference/TextRank.java:63-65, TF_IDF.java:58-65. */
case class News(id: Long, date: Date, title: String, description: String, content: String)

/** TweetModel — /root/reference/TextRank.java:107,120,122. */
case class Tweet(userId: Long, creation_time: Date, content: String)

/** ClickModel — /root/reference/HotTopics.java:83-86, TextRank.java:332-334. */
case class Click(userId: Long, newsId: Long, date: Date, count: Int)

/** Keyword — /root/reference/CosineSimilarity.java:57 (word, value). */
case class Keyword(word: String, value: Double)

/** DocumentModel — news doc (id set) or user profile (userId set);
  * /root/reference/TextRank.java:62-65,114-125.
  */
case class Document(id: Option[Long], userId: Option[Long], date: Option[Date],
                    keywords: Seq[Keyword])

/** RecommendationModel — /root/reference/TextRank.java:283-299. */
case class Recommendation(userId: Long, date: Date, news: Seq[Long])

/** The two similarity modes — /root/reference/SimilarityAlgorithm.java:6-9. */
object SimilarityAlgorithm extends Enumeration {
  val CosineSimilarity, EuclideanDistance = Value
}

/** Scene — run configuration (field uses cited in SURVEY.md §1;
  * constructor /root/reference/TextRank.java:53-55).
  */
case class Scene(
    windowSize: Int = 5,
    numNewsKeywords: Int = 10,
    numUserKeywords: Int = 10,
    numDays: Int = 7,
    fromDate: Date = Date.valueOf("2024-01-01"),
    toDate: Date = Date.valueOf("2024-01-30"),
    friction: Double = 0.85,
    maxIterates: Int = 100,
    minDifference: Double = 0.001,
    numRecommendations: Int = 10,
    similarityAlgorithm: SimilarityAlgorithm.Value = SimilarityAlgorithm.CosineSimilarity)
