package graft.codec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The Kafka JSON envelope (reference wire format, SURVEY §1.3).
  *
  * Decode reproduces `summarizer.py:61-63`: `CAST(value AS STRING)` →
  * `from_json(schema)` → struct flatten (F1, F2, P1, P2). Encode reproduces
  * `summarizer.py:104`: key = stringified id, value = `to_json(struct(*))`
  * (F9, F10). Both are built-in, codegen'd expressions — the JSON parse
  * happens in the executor scan stage, never on the driver.
  *
  * Schema discipline: `from_json` with a DECLARED schema (never inferred),
  * matching the reference (`summarizer.py:24-49`). Malformed JSON yields a
  * null struct → null columns, which the downstream `otherwise(false)` /
  * null-skipping aggregates absorb, mirroring the reference's tolerance.
  */
object JsonCodec {

  /** Kafka frame (`value: binary`) → typed rows via the declared schema. */
  def decode(kafka: DataFrame, schema: StructType): DataFrame = kafka
    .selectExpr("CAST(value AS STRING) AS value")
    .select(from_json(col("value"), schema).as("data"))
    .select("data.*")

  /** Typed rows → Kafka frame: (key, value) JSON envelope. */
  def encode(df: DataFrame, key: Column): DataFrame = df
    .select(key.cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))
}
