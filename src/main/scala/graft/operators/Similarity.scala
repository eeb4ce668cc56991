package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - `cosineTopK`: brute-force — correctness baseline. The query set is
  *    broadcast (it is small by construction); each partition of the
  *    corpus computes dot products locally; a single top-k per query via
  *    window. Zero corpus shuffle.
  *  - `lshBuckets` / `lshTopK`: scale path — random-hyperplane (sign) LSH.
  *    Each vector maps to a small bit-bucket; candidates = same bucket,
  *    so the join degenerates to an equi-join on the bucket key and the
  *    per-query candidate set is bounded.
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd higher-order
  * functions), not UDFs.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double
    * (left-to-right, so the DuckDB oracle reproduces the values) via the
    * primitive kernel in [[graft.functions.Vec]]. */
  def dot(a: Column, b: Column): Column = graft.functions.Vec.dotF(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k: for each query row, the k most similar
    * corpus rows (excluding self-matches on id equality).
    *
    * `queries` should be small (it is broadcast). Result: (query_id,
    * corpus_id, rank, cos_sim rounded to 6 dp for engine parity).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms once per row, not once per pair: cuts the higher-order-function
    // evaluations per pair from 3 dot products to 1, with bit-identical
    // results (dot/(|q|·|c|) in the same double ops).
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm")))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val nn = col("q_norm") * col("c_norm")
    val scored = c.crossJoin(q)
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(when(nn > 0, dot(col("q_vec"), col("c_vec")) / nn).otherwise(0.0), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane i, dim j):
    * md5-derived value in [-0.5, 0.5). Reproducible in any engine. */
  private def planeComponent(i: Int, j: Column): Column =
    conv(substring(md5(concat(lit(s"p$i-"), j.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0) - 0.5

  /** Sign-LSH bucket id from `numPlanes` deterministic hyperplanes. */
  def lshBucket(vec: Column, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { i =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(i, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Corpus annotated with its LSH bucket. */
  def lshBuckets(corpus: DataFrame, idCol: String, vecCol: String,
                 numPlanes: Int = 8): DataFrame =
    corpus.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), numPlanes).as("bucket"))

  /** Bucketed ANN: exact cosine only within matching buckets. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = lshBuckets(corpus, idCol, vecCol, numPlanes)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"), col("bucket"),
        norm(col(vecCol)).as("c_norm"))
    val q = broadcast(lshBuckets(queries, idCol, vecCol, numPlanes)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("bucket"),
        norm(col(vecCol)).as("q_norm")))
    val nn = col("q_norm") * col("c_norm")
    val scored = c.join(q, "bucket")
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(when(nn > 0, dot(col("q_vec"), col("c_vec")) / nn).otherwise(0.0), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
