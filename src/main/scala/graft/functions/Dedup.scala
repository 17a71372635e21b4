package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpus cleaning — the standard
  * ladder: exact (hash groupBy), MinHash + LSH banding, SimHash, n-gram
  * Jaccard verification, embedding-cosine near-dup. All column algebra +
  * aggregations; the only shuffles are the dedup groupBys and the LSH
  * bucket join, which is the design that scales: candidate generation is
  * O(docs × bands) rows, never O(docs²) comparisons.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact duplicate groups by full-content hash. Input needs (id, text);
    * returns (id, groupId, groupSize, isCanonical): groupId = min id of the
    * identical-text group, canonical = the kept copy.
    */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val keyed = docs.select(id.as("id"), sha2(text, 256).as("key"))
    val groups = keyed.groupBy("key")
      .agg(min("id").as("groupId"), count("*").as("groupSize"))
    keyed.join(groups, Seq("key"))
      .select(col("id"), col("groupId"), col("groupSize"),
        (col("id") === col("groupId")).as("isCanonical"))
  }

  // ---------- shingles / n-grams ----------

  /** k-token shingles of `text` as an array column (distinct). */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(when(size(toks) > 0, array(concat_ws(" ", toks)))
          .otherwise(array())))
  }

  /** Exact Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni > 0, inter.cast("double") / uni).otherwise(lit(1.0))
  }

  // ---------- MinHash + LSH ----------

  /** MinHash signature (array of `numHashes` longs) over a shingle array.
    * Hash family h_i(s) = xxhash64(i, s); min over shingles per i.
    * Empty shingle set → all Long.MaxValue (matches nothing).
    */
  def minhash(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      coalesce(
        array_min(transform(shingleArr, s => xxhash64(i, s))),
        lit(Long.MaxValue)))

  /** Candidate near-duplicate pairs via LSH banding of MinHash signatures,
    * verified with exact n-gram Jaccard. Input (id, text); output
    * (a, b, jaccard) with a < b and jaccard ≥ threshold.
    *
    * bands × rowsPerBand hashes; a pair collides if any band's sub-signature
    * matches — P(candidate) ≈ 1-(1-j^r)^b, the classic S-curve.
    */
  def minhashDuplicates(
      docs: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val sh = docs.select(id.as("id"), shingles(text, shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minhash(col("sh"), bands * rowsPerBand))
    // one row per (doc, band): bucket key = hash of the band's slice
    val bucketed = sig.select(
      col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(b, concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
            .as("bucket")))).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = bucketed.select(col("band"), col("bucket"), col("id").as("a"), col("sh").as("shA"))
    val r = bucketed.select(col("band"), col("bucket"), col("id").as("b"), col("sh").as("shB"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(jaccard(col("shA"), col("shB")), 6).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over the token multiset, as one aggregate fold: for
    * each bit i, sum ±1 over tokens by the token hash's bit i; bit set iff
    * the sum is positive.
    */
  /** Bit masks 2^0..2^63 as a literal array, for Column-indexed bit ops
    * (the Scala shiftleft/shiftright API only takes literal Int shifts). */
  private val bitMasks: Array[Long] = Array.tabulate(64)(i => 1L << i)

  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          i => when(xxhash64(t).bitwiseAND(element_at(typedLit(bitMasks), i + 1)) =!= 0L, 1)
            .otherwise(-1)),
        (a, b) => a + b))
    // pack sign bits into a long: sum of 2^i over positive-count bits
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)), (c, i) => when(c > 0, i).otherwise(-1)),
      lit(0L),
      (acc, i) => when(i >= 0, acc.bitwiseOR(element_at(typedLit(bitMasks), i + 1)))
        .otherwise(acc))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs with hamming distance ≤ maxDistance.
    * Scale path: bucket by each of the four 16-bit chunks — two signatures
    * within hamming ≤ 3 must agree exactly on at least one chunk
    * (pigeonhole), so candidates come from four bucket joins, not O(n²).
    */
  def simhashDuplicates(
      docs: DataFrame, id: Column, text: Column, maxDistance: Int = 3): DataFrame = {
    val sig = docs.select(id.as("id"), simhash(text).as("sig"))
    // key = the chunk's bits in place (sig & (0xFFFF << 16c)): equality of
    // masked values == equality of the chunk, no shifting required (shifting
    // by a Column isn't in the Scala API, and decimal division mis-rounds
    // negative signatures).
    val chunkMasks: Array[Long] = Array.tabulate(4)(c => 0xFFFFL << (16 * c))
    val chunked = sig.select(
      col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)), c =>
        struct(c.as("chunk"),
          col("sig").bitwiseAND(element_at(typedLit(chunkMasks), c + 1)).as("key")))).as("ck"))
      .select(col("id"), col("sig"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val l = chunked.select(col("chunk"), col("key"), col("id").as("a"), col("sig").as("sigA"))
    val r = chunked.select(col("chunk"), col("key"), col("id").as("b"), col("sig").as("sigB"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming(col("sigA"), col("sigB")).as("distance"))
      .distinct()
      .filter(col("distance") <= maxDistance)
  }

  // ---------- embedding cosine ----------

  /** Near-duplicate pairs by embedding cosine ≥ threshold. Brute-force
    * O(n²) self-join — correctness baseline; the scale path is
    * [[Similarity.lshTopK]]'s bucketing. Input (id, embedding).
    */
  def embeddingDuplicates(
      embs: DataFrame, id: Column, vec: Column, threshold: Double): DataFrame = {
    val v = embs.select(id.as("id"), vec.as("v"))
      .withColumn("norm", Similarity.l2norm(col("v")))
    val l = v.select(col("id").as("a"), col("v").as("va"), col("norm").as("na"))
    val r = v.select(col("id").as("b"), col("v").as("vb"), col("norm").as("nb"))
    l.crossJoin(r)
      .filter(col("a") < col("b"))
      .withColumn("cosine",
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
