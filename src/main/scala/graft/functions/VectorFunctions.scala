package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns, built
  * from Spark's higher-order array functions (`zip_with`, `aggregate`,
  * `transform`) — executes inside the JVM row pipeline with no UDF
  * serialization and no driver involvement, so it scales linearly with
  * partitions (the embedding similarity path of the north-star extension,
  * SURVEY.md §7.2 step 6).
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> (exact — every float is a
    * representable double), so all accumulation happens in f64. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product; left-to-right f64 accumulation. Native expression
    * ([[DotProductExpr]]) — one compiled loop per row; bit-identical to
    * [[dotHof]], the declarative spec it is cross-checked against. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Declarative formulation of [[dot]] (higher-order functions only). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in f64; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column =
    cosineGivenNorms(a, b, norm(a), norm(b))

  /** Cosine with precomputed norms — identical arithmetic to [[cosine]]
    * (dot/(na·nb)), but lets pair-join operators compute each row's norm
    * once instead of once per candidate pair. */
  def cosineGivenNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val denom = na * nb
    when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / denom)
  }

  /** Euclidean (L2) distance in f64. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Sign-random-projection bucket id: the sketch behind hyperplane LSH.
    * Projects onto `planes` fixed hyperplanes and packs the signs into a
    * Long. Vectors in the same bucket are likely cosine-close; used by the
    * approximate similarity-search path where a 100 TB corpus cannot be
    * brute-forced. `planes` are deterministic (seeded) per model.
    */
  def signBucket(v: Column, planes: Seq[Array[Double]]): Column =
    element_at(VectorExpressions.signBuckets(v, Seq(planes)), 1)

  /** All hyperplane tables' bucket ids in one compiled pass (array<long>,
    * one element per table) — the scan-side cost of OR-amplified LSH. */
  def signBuckets(v: Column, tables: Seq[Seq[Array[Double]]]): Column =
    VectorExpressions.signBuckets(v, tables)

  /** Deterministic pseudo-random hyperplanes from a fixed seed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }
}
