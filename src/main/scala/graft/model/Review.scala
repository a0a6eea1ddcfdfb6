package graft.model

import org.apache.spark.sql.types._

/** Review-stream record: the reference's 24-column input schema.
  *
  * Mirrors the explicit schema declared in the reference at
  * `summarizer.py:24-49` (column order fixed by the producer header list,
  * `stream_generator.py:15-40`). First four fields are non-nullable there;
  * the rest nullable.
  */
final case class Review(
    index: Long,
    app_id: Long,
    app_name: String,
    review_id: Long,
    language: Option[String],
    review: Option[String],
    timestamp_created: Option[Long],
    timestamp_updated: Option[Long],
    recommended: Option[String],
    votes_helpful: Option[Int],
    votes_funny: Option[Int],
    weighted_vote_score: Option[Float],
    comment_count: Option[Int],
    steam_purchase: Option[Boolean],
    received_for_free: Option[Boolean],
    written_during_early_access: Option[Boolean],
    author_steamid: Option[String],
    author_num_games_owned: Option[Int],
    author_num_reviews: Option[Int],
    author_playtime_forever: Option[Double],
    author_playtime_last_two_weeks: Option[Double],
    author_playtime_at_review: Option[Double],
    author_last_played: Option[Float],
    sentiment: Option[Float]
)

object Review {

  /** The declared input schema (reference `summarizer.py:24-49`). */
  val schema: StructType = StructType(Seq(
    StructField("index", LongType, nullable = false),
    StructField("app_id", LongType, nullable = false),
    StructField("app_name", StringType, nullable = false),
    StructField("review_id", LongType, nullable = false),
    StructField("language", StringType),
    StructField("review", StringType),
    StructField("timestamp_created", LongType),
    StructField("timestamp_updated", LongType),
    StructField("recommended", StringType),
    StructField("votes_helpful", IntegerType),
    StructField("votes_funny", IntegerType),
    StructField("weighted_vote_score", FloatType),
    StructField("comment_count", IntegerType),
    StructField("steam_purchase", BooleanType),
    StructField("received_for_free", BooleanType),
    StructField("written_during_early_access", BooleanType),
    StructField("author_steamid", StringType),
    StructField("author_num_games_owned", IntegerType),
    StructField("author_num_reviews", IntegerType),
    StructField("author_playtime_forever", DoubleType),
    StructField("author_playtime_last_two_weeks", DoubleType),
    StructField("author_playtime_at_review", DoubleType),
    StructField("author_last_played", FloatType),
    StructField("sentiment", FloatType)
  ))

  /** Output (summary) schema: reference `summarizer.py:90-100`. `time` is
    * the tumbling window END (exclusive day boundary, `summarizer.py:93`).
    */
  val summarySchema: StructType = StructType(Seq(
    StructField("app_id", LongType),
    StructField("app_name", StringType),
    StructField("time", TimestampType),
    StructField("A_playtime", DoubleType),
    StructField("A_sentiment", DoubleType),
    StructField("T_reviews", LongType),
    StructField("T_recommendations", LongType),
    StructField("T_pos_reviews", LongType),
    StructField("T_neg_reviews", LongType)
  ))
}
