package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared dense-vector expression kernels for the embedding operators.
  *
  * All math is built-in higher-order functions over `array` columns,
  * computed in double precision with deterministic left folds — no UDFs,
  * no driver round-trips; evaluates inside the scan/project stage.
  *
  * Literal matrices (LSH hyperplanes, centroids) enter the plan as ARRAY
  * LITERALS folded with `aggregate`/`zip_with`, NOT as unrolled
  * per-component arithmetic: an unrolled `planes × dim` sum compiles to
  * tens of thousands of generated-Java lines, fails janino, and falls back
  * to per-expression interpretation (observed 100× slowdown). The compact
  * fold keeps the generated code size O(1) in `dim`.
  */
object Vectors {

  /** Deterministic left-fold dot product in double precision. */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(x: Column): Column = sqrt(dot(x, x))

  /** Cosine similarity; NaN-free for zero vectors is the caller's concern
    * (fixture embeddings are non-zero). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Native codegen'd cosine ([[graft.functions.CosineSimilarityExpr]]):
    * bit-identical to [[cosine]], one fused loop instead of interpreted
    * HOF folds. Needs a session to self-register the function. */
  def cosineNative(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function(graft.functions.GraftFunctions.CosineName, a, b)
  }

  /** Per-vector symmetric quantization scale: max |component| in double.
    * Zero for the all-zero vector (see [[quantizeInt8]]). */
  def maxAbs(e: Column): Column =
    coalesce(array_max(transform(e, x => abs(x.cast("double")))), lit(0.0))

  /** Symmetric int8 quantization of a float/double vector under `scale`
    * (= [[maxAbs]] of the vector): q_i = round_half_up(x_i / scale · 127),
    * so q ∈ [-127, 127]. 4× smaller than float32 — the standard storage /
    * ANN-candidate format at corpus scale; exact re-ranking dequantizes
    * only the top candidates. Pure arithmetic (floor(v + 0.5) half-up, no
    * engine `round`), so any engine reproduces it bit-for-bit. */
  def quantizeInt8(e: Column, scale: Column): Column =
    transform(e, x => when(scale === 0, lit(0))
      .otherwise(floor(x.cast("double") / scale * 127 + lit(0.5)).cast("int")))

  /** Inverse of [[quantizeInt8]]: x̂_i = q_i · scale / 127. Max abs error
    * ≤ scale/254 per component (half a quantization step). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale / 127)

  /** `tables × planes × dim` Gaussian hyperplane components, derived
    * deterministically from `seed` — the LSH "random" projection basis is
    * part of the plan, so runs are reproducible and the query side can
    * recompute the identical buckets. */
  def hyperplanes(seed: Long, tables: Int, planes: Int,
      dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, planes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit sketch bucket of `vec` for hyperplane table `t`: bit p set
    * iff <vec, plane_p> > 0. A `planes`-bit integer bucket key.
    * (Portable fold form — prefer [[signBucketNative]] on hot paths.) */
  def signBucket(vec: Column, hyper: Array[Array[Array[Double]]],
      t: Int): Column = {
    val planes = hyper(t).length
    val planesLit: Column = typedLit(hyper(t).map(_.toSeq).toSeq)
    aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
      (acc, p) => acc + when(dot(vec, element_at(planesLit, p + 1)) > 0,
        call_function("shiftleft", lit(1L), p)).otherwise(lit(0L)))
  }

  /** Native codegen'd sign bucket ([[graft.functions.SignBucketExpr]]):
    * bit-identical to [[signBucket]], a fused two-level loop instead of
    * planes×dim interpreted lambda calls (the difference between ~1 s and
    * minutes on a corpus scan). */
  def signBucketNative(spark: org.apache.spark.sql.SparkSession, vec: Column,
      hyper: Array[Array[Array[Double]]], t: Int): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function(graft.functions.GraftFunctions.SignBucketName,
      vec, typedLit(hyper(t).map(_.toSeq).toSeq))
  }
}
