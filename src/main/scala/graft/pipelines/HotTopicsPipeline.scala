package graft.pipelines

import graft.model.Scene
import graft.ops.Ops
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The popularity recommender (reference E3, /root/reference/HotTopics.java).
  *
  * Reference shape: per loop-day, filter clicks to the ±numDays past window,
  * `groupBy(date,newsId)` sum counts, sort by count desc, take top
  * numRecommendations (HotTopics.java:33-57,67-93). The snapshot's
  * `RecommendationModel.fromClickList` is absent; frozen spec: counts are
  * summed **per newsId across the whole window** and ties break newsId-asc.
  *
  * Spark-first: the driver day-loop is replaced by a single job. Each click
  * contributes to the loop-days `day ∈ [date, date+numDays] ∩ [from, to]` —
  * that membership is *exploded map-side* (≤ numDays+1 rows per click, no
  * range join, no cross), then one hash aggregation on (day, newsId) and a
  * per-day window top-k. At 100 TB: explode factor is a small constant, both
  * shuffles are on well-distributed keys, and AQE handles hot-day skew.
  */
object HotTopicsPipeline {

  /** Per-day hot-topic counts: (day, newsId, clicks, rn), rn ≤ numRecommendations. */
  def topicsPerDay(clicks: DataFrame, scene: Scene): DataFrame = {
    val contributesTo = explode(sequence(
      greatest(col("date"), lit(scene.fromDate)),
      least(date_add(col("date"), scene.numDays), lit(scene.toDate)),
      expr("interval 1 day")))
    val counts = clicks
      .filter(col("date").between(date_sub(lit(scene.fromDate), scene.numDays), lit(scene.toDate)))
      .withColumn("day", contributesTo)
      .groupBy(col("day"), col("newsId"))
      .agg(sum(col("count")).as("clicks"))
    Ops.topKPerGroup(counts, Seq("day"),
      Seq(col("clicks").desc, col("newsId").asc), scene.numRecommendations)
  }

  /** Reference-shaped output: one row per day with the ranked news list
    * (RecommendationModel, HotTopics.java:44,48-53).
    */
  def recommendAll(clicks: DataFrame, scene: Scene): DataFrame =
    topicsPerDay(clicks, scene)
      .groupBy(col("day").as("date"))
      .agg(transform(
        array_sort(collect_list(struct(col("rn"), col("newsId")))),
        x => x("newsId")).as("news"))
}
