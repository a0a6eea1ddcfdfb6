package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL schema-drift profiling — the first question against a new
  * raw corpus drop: which top-level keys exist, with which types, in
  * how many documents, and where does the SAME key carry two types
  * (the drift that silently breaks a fixed-schema `from_json` read)?
  * `spark.read.json`'s inferred schema answers "what union type
  * covers everything"; this operator answers the distributional
  * question a curation decision needs.
  *
  * Types are normalized to the six JSON classes (number / string /
  * boolean / object / array / null) so the DuckDB oracle — DuckDB's
  * OWN JSON parser via `json_keys` + `json_type`, an independent
  * implementation — must agree exactly. Malformed lines drop (they're
  * a separate count in a real ingest report; here the gate property
  * is that they can never poison the profile). Keys are profiled at
  * the top level only — nesting recurses in the obvious way but the
  * drift signal that matters for a reader schema is per column. */
object JsonProfile {

  /** One (key, type) observation count. */
  final case class KeyType(key: String, jtype: String, n: Long)

  /** Profile top-level key/type frequencies over `(doc_id, json)`. */
  def keyTypes(spark: SparkSession, docs: DataFrame): Dataset[KeyType] = {
    import spark.implicits._
    docs.select(col("json")).as[String]
      .mapPartitions { rows =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        rows.flatMap { line =>
          try {
            val node = mapper.readTree(line)
            if (node == null || !node.isObject) Iterator.empty
            else {
              val it = node.fields()
              val out = scala.collection.mutable.ArrayBuffer
                .empty[(String, String)]
              while (it.hasNext) {
                val e = it.next()
                val t = e.getValue.getNodeType match {
                  case com.fasterxml.jackson.databind.node.JsonNodeType
                    .NUMBER => "number"
                  case com.fasterxml.jackson.databind.node.JsonNodeType
                    .STRING => "string"
                  case com.fasterxml.jackson.databind.node.JsonNodeType
                    .BOOLEAN => "boolean"
                  case com.fasterxml.jackson.databind.node.JsonNodeType
                    .OBJECT => "object"
                  case com.fasterxml.jackson.databind.node.JsonNodeType
                    .ARRAY => "array"
                  case _ => "null"
                }
                out += ((e.getKey, t))
              }
              out.iterator
            }
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
        }
      }
      .toDF("key", "jtype")
      .groupBy("key", "jtype").agg(count(lit(1)).as("n"))
      .as[KeyType]
  }

  /** Keys whose type is NOT constant across the corpus — the drift
    * report: one row per key with >1 observed type, types
    * comma-joined in sorted order with their counts. */
  def drift(spark: SparkSession, docs: DataFrame): DataFrame = {
    keyTypes(spark, docs).toDF()
      .groupBy("key")
      .agg(count(lit(1)).as("n_types"),
        array_join(sort_array(collect_list(
          concat(col("jtype"), lit(":"), col("n")))), ",")
          .as("types"))
      .filter(col("n_types") > 1)
  }
}
