package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Fixed location of the Spark-generated code table dumped for the
    * q_import_edges oracle (the table is synthesized, so DuckDB can only
    * see it via a parquet hand-off; the path must be absolute and stable
    * because it is baked into the oracle SQL string).
    */
  val auxCodeTablePath = "/root/repo/target/verify_aux/code_files.parquet"

  /** Signature hand-offs closing the last `no_oracle` rows (the
    * q_import_edges pattern): the engine-specific hash family (xxhash64
    * simhash bits, SRP buckets) is dumped to parquet and DuckDB verifies the
    * DOWNSTREAM logic exactly — the pairing/bucketing/ranking stage that can
    * regress. Reference analog: misc/verify.py:42-53 (independent
    * recomputation over the same input).
    */
  val auxSimhashSigsPath = "/root/repo/target/verify_aux/simhash_sigs.parquet"
  val auxAnnCandidatesPath = "/root/repo/target/verify_aux/ann_candidates.parquet"
  val auxFingerprintsPath = "/root/repo/target/verify_aux/text_fingerprints.parquet"

  /** TableCatalog table written by q_catalog_scan itself (rebuilt fresh per
    * call → snap-0 deterministic); the oracle reads the same snapshot's
    * data files directly. */
  val auxCatalogTablePath = "/root/repo/target/verify_aux/catalog_table"

  /** TableCatalog table written by q_catalog_stats (range-partitioned input
    * so each data file carries tight per-file fileId bounds); the query
    * scans through stats-based file pruning, the oracle reads ALL the
    * snapshot's data files with the same WHERE — pruning + residual must
    * return exactly the matching rows. */
  val auxStatsTablePath = "/root/repo/target/verify_aux/catalog_stats_table"

  /** TableCatalog table written by q_catalog_evolve: base commit under
    * schema 0, rename+add evolution, second append under the evolved
    * schema; the scan reconciles both file generations by field id, the
    * oracle reads ALL data files union_by_name and mirrors the mapping
    * with coalesce(new, old). */
  val auxEvolveTablePath = "/root/repo/target/verify_aux/catalog_evolve_table"

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // the shared factory, NOT a hand-rolled builder: correctness must be
    // verified under the SAME configs (AQE, skew-join, broadcast threshold)
    // the bench and tests run with, or a plan-dependent bug in the benched
    // configuration could pass verification under different physical plans
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Hand the q_import_edges oracle the exact code table the query reads
    // (same GraphSpec as the query fn; coalesce(1) for a single stable file).
    graft.sources.CodeTable
      .generate(spark, graft.sources.GraphSpec(
        numCycles = 64, maxCycleLen = 8, extraArcsPerVertex = 0.4, seed = 42L))
      .coalesce(1).write.mode("overwrite").parquet(auxCodeTablePath)
    // q_simhash_dups hand-off: the per-document 64-bit signatures (same
    // native SimHash64 expression the query evaluates). The oracle
    // brute-forces hamming over them — recall-1 bucketing must reproduce
    // the all-pairs answer exactly.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.Dedup.simhash(org.apache.spark.sql.functions.col("text")).as("sig"))
      .coalesce(1).write.mode("overwrite").parquet(auxSimhashSigsPath)
    // q_ann_lsh hand-off: the deduped LSH candidate pairs (same parameters
    // as the query) WITH the engine's full-precision cosine. The oracle
    // recomputes every cosine with its own arithmetic, gates the whole
    // result on max|duck − engine| < 1e-9 (any disagreement empties the
    // oracle side → row-count fail), and ranks on the verified value — so
    // scoring is still independently checked, while the ranking key is
    // identical on both sides (no float-boundary flake; ADVICE r3).
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    graft.functions.Similarity.lshScored(
        embs.filter(org.apache.spark.sql.functions.col("vec_id") < 10), embs,
        numPlanes = 6, probes = 6)
      .select(org.apache.spark.sql.functions.col("queryId").as("query_id"),
        org.apache.spark.sql.functions.col("neighborId").as("neighbor_id"),
        org.apache.spark.sql.functions.col("cosine").as("engine_cosine"))
      .coalesce(1).write.mode("overwrite").parquet(auxAnnCandidatesPath)
    // q_text_fingerprint hand-off: the fingerprints themselves. The oracle
    // recomputes the equivalence structure independently (md5 of the
    // canonical token bag / sequence) and only passes rows whose
    // fingerprint-equality groups match it — a regression in either hash's
    // order-(in)sensitivity drops rows and fails the compare.
    SparkEntry.queries("q_text_fingerprint")(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(auxFingerprintsPath)
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
