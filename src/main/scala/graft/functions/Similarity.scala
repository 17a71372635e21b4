package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._

import graft.functions.expr.{SrpBucket, VectorDot}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exactness baseline and
  * a signed-random-projection LSH bucketed variant as the scale path.
  * Vector math runs through native codegen'd Catalyst expressions
  * ([[graft.functions.expr.VectorDot]] / [[graft.functions.expr.SrpBucket]])
  * — Spark's higher-order functions evaluate lambdas interpreted, which
  * made the HOF column-algebra forms ~10× slower (see VectorExpressions).
  */
object Similarity {

  /** Dot product of two float-array columns (as double); summation order is
    * left-to-right (stable across engines for the oracle compare). */
  def dot(a: Column, b: Column): Column =
    GraftShims.column(VectorDot(GraftShims.expression(a), GraftShims.expression(b)))

  /** L2 norm of a float-array column. */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity (0 if either vector is all-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2norm(a) * l2norm(b)
    when(n > 0, d / n).otherwise(0.0)
  }

  /** Exact brute-force cosine top-k: for every query vector, the k nearest
    * corpus vectors. Queries are broadcast (they're the small side by
    * construction); ranking is a per-query window. Output:
    * (queryId, rank, neighborId, cosine). Cosine is rounded to 6 dp before
    * ranking so the ordering is reproducible across float-sum orders;
    * residual ties break by neighbor id.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("queryId"), col(qVec).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val c = corpus.select(col(cId).as("neighborId"), col(cVec).as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    val scored = broadcast(q).join(c, col("queryId") =!= col("neighborId"))
      .withColumn("cosine",
        round(when(col("qn") * col("cn") > 0, dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .otherwise(0.0), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("queryId").orderBy(col("cosine").desc, col("neighborId"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("queryId", "rank", "neighborId", "cosine")
  }

  private val bitMasks: Array[Long] = Array.tabulate(63)(i => 1L << i)

  /** Signed-random-projection LSH bucket id over `numPlanes` hyperplanes:
    * bit p = sign(v · r_p) with r_p a deterministic ±1 vector (xxhash64
    * stream keyed by seed/plane/dim). Same-bucket vectors are cosine-close
    * with high probability. `seedCol` selects an independent hyperplane
    * family (for multi-table LSH).
    */
  def srpBucket(v: Column, numPlanes: Int, seedCol: Column = lit(0L)): Column =
    GraftShims.column(SrpBucket(
      GraftShims.expression(v), GraftShims.expression(seedCol), numPlanes))

  /** LSH candidate pairs for [[lshTopK]]: per query, the corpus vectors
    * sharing an SRP bucket under multiprobe (own bucket + single-bit flips
    * of the first `probes` planes). Deduped (queryId, neighborId) pairs —
    * ids only, BEFORE any scoring, so a pair colliding in several probed
    * buckets is scored exactly once downstream (the same candidates-first
    * shape as [[Dedup.minhashDuplicates]]). Exposed separately so the
    * driver oracle can verify the exact-rerank stage over the dumped
    * candidate set (Verify.auxAnnCandidatesPath).
    */
  def lshCandidates(
      queries: DataFrame, corpus: DataFrame,
      numPlanes: Int = 8, probes: Int = 4,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val c = corpus.select(col(cId).as("neighborId"),
      srpBucket(col(cVec), numPlanes).as("bucket"))
    val q0 = queries.select(col(qId).as("queryId"),
      srpBucket(col(qVec), numPlanes).as("b0"))
    val q = q0.select(
      col("queryId"),
      explode(concat(array(col("b0")),
        transform(sequence(lit(0), lit(probes - 1)),
          p => col("b0").bitwiseXOR(element_at(typedLit(bitMasks), p + 1))))).as("bucket"))
    // queries are the small side by contract: broadcast them so the corpus's
    // bucket column streams through the join with no exchange (guide §3.1;
    // size estimates for a filtered parquet scan routinely overshoot the
    // 10 MB auto threshold and fell back to shuffling the corpus)
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("queryId") =!= col("neighborId"))
      .select("queryId", "neighborId")
      .distinct()
  }

  /** Every LSH candidate scored by exact cosine at FULL precision — the
    * rerank input of [[lshTopK]], exposed so the driver oracle can hand off
    * (queryId, neighborId, cosine): DuckDB then verifies the cosine with
    * its own arithmetic within an epsilon and ranks on the verified value —
    * no cross-engine float-rounding-boundary sensitivity in the gate
    * (ADVICE r3).
    */
  def lshScored(
      queries: DataFrame, corpus: DataFrame,
      numPlanes: Int = 8, probes: Int = 4,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cand = lshCandidates(queries, corpus, numPlanes, probes, qId, qVec, cId, cVec)
    val q = queries.select(col(qId).as("queryId"), col(qVec).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val c = corpus.select(col(cId).as("neighborId"), col(cVec).as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    // (candidates × queries) is small by construction — broadcast it so the
    // corpus side never shuffles by neighborId (the old plan sort-merged the
    // full corpus against a few hundred candidate rows)
    c.join(broadcast(cand.join(broadcast(q), Seq("queryId"))), Seq("neighborId"))
      .withColumn("cosine",
        when(col("qn") * col("cn") > 0, dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .otherwise(0.0))
      .select("queryId", "neighborId", "cosine")
  }

  /** ANN top-k via SRP-LSH bucketing with multiprobe, re-ranked by exact
    * cosine within candidates. Same output shape as [[bruteForceTopK]];
    * recall < 1 by design — measured in tests.
    * Scale: candidates per query ≈ corpus/2^planes × (1+probes); the join
    * is an equi-join on bucket id, never a cross join, and each surviving
    * pair is scored exactly once (candidates deduped before the vectors
    * join back — multi-bucket collisions never repeat the dot product).
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      numPlanes: Int = 8, probes: Int = 4,
      qId: String = "vec_id", qVec: String = "embedding",
      cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    // rank on the 6dp-quantized cosine with neighborId ties so equal-score
    // candidates order identically in any engine computing the same quanta
    val scored = lshScored(queries, corpus, numPlanes, probes, qId, qVec, cId, cVec)
      .withColumn("cosine", round(col("cosine"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("queryId").orderBy(col("cosine").desc, col("neighborId"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("queryId", "rank", "neighborId", "cosine")
  }
}
