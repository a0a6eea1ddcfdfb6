package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: split each document into
  * overlapping token windows (context-length-sized training examples).
  *
  * Chunk i covers tokens [i·stride, i·stride + size); a document with n
  * tokens yields max(⌈(n − size)/stride⌉, 0) + 1 chunks (always ≥ 1, so
  * short documents survive as a single chunk). `stride = size − overlap`.
  *
  * Plan shape: tokenize → `explode(sequence(...))` → per-chunk `slice` +
  * `array_join`, all narrow operations fused into the scan stage — zero
  * shuffles, output rows ≈ Σ tokens/stride. At 100 TB this is the shape
  * you want: chunking is embarrassingly parallel and the expensive part
  * (the explode fan-out) never leaves the input partition.
  */
object Chunking {

  /** Chunk `textCol` into windows of `size` tokens every `stride` tokens.
    * Output: one row per (doc, chunk_id) with `n_tokens` (actual tokens in
    * this chunk — the tail chunk may be short) and the re-joined
    * `chunk_text`. Tokenization = [[Dedup.tokens]] (lowercased [a-z0-9]
    * runs), shared with the dedup/decontam tier so chunk boundaries and
    * n-gram semantics agree across operators. */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    df.withColumn("__toks", Dedup.tokens(col(textCol)))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      .withColumn("chunk_id", explode(sequence(lit(0),
        greatest(((col("__n") - size + stride - 1) / stride).cast("int"),
          lit(0)))))
      .select(col(idCol),
        col("chunk_id"),
        least(lit(size), col("__n") - col("chunk_id") * stride).cast("int")
          .as("n_tokens"),
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1,
          lit(size)), " ").as("chunk_text"))
  }
}
