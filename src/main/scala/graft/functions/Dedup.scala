package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._

import graft.functions.expr.{MinHashSig, ShingleSet, SimHash64}

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

  /** k-token shingles of `text` as an array column (distinct). Native
    * codegen'd expression — the column-algebra form (transform + slice +
    * concat_ws over the token array) paid an interpreter dispatch and two
    * allocations per shingle per row (see
    * [[graft.functions.expr.VectorKernels]]); output strings identical.
    */
  def shingles(text: Column, k: Int): Column =
    GraftShims.column(ShingleSet(GraftShims.expression(text), k))

  /** Exact Jaccard similarity of two shingle-array columns. Two empty sets
    * score 0.0 (not 1.0): a blank document is not a near-duplicate of
    * another blank document for dedup purposes, and this keeps the Spark
    * result aligned with SQL oracles that require a non-empty union.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni > 0, inter.cast("double") / uni).otherwise(lit(0.0))
  }

  // ---------- MinHash + LSH ----------

  /** MinHash signature (array of `numHashes` longs) over a shingle array.
    * Hash family h_i(s) = xxhash64(i, s) (bit-identical to the column
    * form); min over shingles per i. Empty shingle set → all Long.MaxValue
    * (matches nothing). Native codegen'd expression — the HOF fold form
    * paid an interpreter dispatch per shingle per hash index
    * (see [[graft.functions.expr.VectorKernels]]).
    */
  def minhash(shingleArr: Column, numHashes: Int): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(shingleArr), numHashes))

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
    // shingle-set size rides the SAME subtree as the signature: `sh` is an
    // un-persisted view over docs, so every separate subtree referencing it
    // re-runs the shingle kernel over the corpus — carrying nsh here (vs
    // the old separate size-projection joined back by id) removes one full
    // recompute AND its exchange; the only remaining re-evaluations are the
    // two sides of the final verify join, which see only surviving pairs
    val sig = sh.select(col("id"), minhash(col("sh"), bands * rowsPerBand).as("sig"),
      size(col("sh")).as("nsh"))
    // one row per (doc, band): bucket key = hash of the band's slice.
    // The signature is computed BELOW the generator (band ids exploded from
    // a literal array), so the expensive minhash tree evaluates exactly
    // once per document: referencing it inside a per-band lambda instead
    // lets projection collapse inline it into the lambda body, where
    // (higher-order functions being interpreted, not codegen'd) it would
    // re-evaluate once per band per row — measured 16x eval cost.
    // Shingle arrays do NOT ride the bucket join — a candidate pair that
    // collides in several bands would otherwise shuffle two document-sized
    // arrays once per collision; ids are deduped FIRST, then shingles join
    // back exactly once per surviving pair for the exact-Jaccard verify.
    // nsh rides along: jaccard >= t forces min(|A|,|B|) >= t*max(|A|,|B|),
    // so most band-collision noise is discarded as a cheap scalar predicate
    // before any pair survives to the distinct + array-intersect verification
    val bucketed = sig
      .select(col("id"), col("sig"), col("nsh"),
        explode(typedLit((0 until bands).toArray)).as("band"))
      .select(col("id"), col("band"), col("nsh"),
        xxhash64(col("band"),
          concat_ws(",", slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
          .as("bucket"))
    val l = bucketed.select(col("band"), col("bucket"), col("id").as("a"), col("nsh").as("na"))
    val r = bucketed.select(col("band"), col("bucket"), col("id").as("b"), col("nsh").as("nb"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b") &&
        col("na") >= lit(threshold) * col("nb") && col("nb") >= lit(threshold) * col("na"))
      .select("a", "b")
      .distinct()
    // Verify joins attach raw TEXT and shingle AFTER the join: `sh` is an
    // un-persisted view, so joining it directly re-ran the shingle kernel
    // over the whole corpus once per side; post-join shingling computes it
    // only for rows that actually matched a surviving pair (candidate ids
    // all came from `sig`, so their shingle sets are non-empty by
    // construction and the size>0 pre-filter is not needed here).
    val txt = docs.select(id.as("id"), text.as("txt"))
    candidates
      .join(txt.select(col("id").as("a"), col("txt").as("ta")), Seq("a"))
      .join(txt.select(col("id").as("b"), col("txt").as("tb")), Seq("b"))
      .select(col("a"), col("b"),
        round(jaccard(shingles(col("ta"), shingleK), shingles(col("tb"), shingleK)), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over the whitespace token multiset of lower(text): for
    * each bit i, sum ±1 over tokens by the token hash's bit i; bit set iff
    * the sum is positive. Native codegen'd expression (token hash values
    * bit-identical to the xxhash64 column form this replaces).
    */
  def simhash(text: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(text)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs with hamming distance ≤ maxDistance —
    * COMPLETE by construction (recall 1), the Manku/Jain/Sarma WWW'07
    * scheme in its general multi-table form:
    *
    * The 64 signature bits are split into `blocks` (B) nearly-equal
    * contiguous blocks and ONE bucketing table is built per r-combination
    * of blocks, r = B − maxDistance, keyed on those r blocks' bits.
    * Pigeonhole: ≤ maxDistance flipped bits touch ≤ maxDistance blocks,
    * leaving ≥ r blocks untouched — so some table's whole key is clean and
    * the pair collides there exactly. Candidates come from C(B, r)
    * bucket joins, never O(n²) comparisons; the exact hamming filter then
    * removes bucket-lucky false positives. (Manku §3 permutes bits so each
    * table's key occupies the top bits of a sorted array; equality of
    * masked values needs no permutation — the partition into blocks is
    * what the pigeonhole argument uses, contiguity is irrelevant.)
    *
    * `blocks` trades table count against bucket size: key width ≈
    * r·64/B bits, table count C(B, r).
    *   - blocks = maxDistance+1 (r = 1): d+1 tables with 64/(d+1)-bit
    *     keys — the right choice for d ≤ 6 (key ≥ 9 bits).
    *   - d in [7, 15]: keys of the r = 1 scheme degrade below 8 bits
    *     (buckets toward all-pairs); pick B > d+1 so r ≥ 2, e.g. d = 10,
    *     B = 12 → C(12,2) = 66 tables with ~10-bit keys: candidate volume
    *     ≈ 66·n²/2¹⁰ vs r=1's 11·n²/2⁵ — ~5× fewer candidates, and
    *     B = 14 (364 tables, ~18-bit keys) another ~50× down. Recall
    *     stays exactly 1 for every valid (B, r) — only cost varies.
    *
    * `blocks = 0` (the default) AUTO-PICKS via [[simhashAutoBlocks]]: the
    * smallest B whose guaranteed key width clears ~10 bits under the table
    * guard — identical to d+1 for d ≤ 6, and the scale path (r ≥ 2) for
    * d ≥ 7 without the caller reading any of the above.
    */
  def simhashDuplicates(
      docs: DataFrame, id: Column, text: Column, maxDistance: Int = 3,
      blocks: Int = 0): DataFrame = {
    require(maxDistance >= 0 && maxDistance <= 15,
      s"maxDistance must be in [0,15]; got $maxDistance")
    val nBlocks = if (blocks == 0) simhashAutoBlocks(maxDistance) else blocks
    require(nBlocks > maxDistance && nBlocks <= 32,
      s"blocks must be in (maxDistance, 32]; got $nBlocks (d=$maxDistance)")
    val comb = nBlocks - maxDistance
    val sig = docs.select(id.as("id"), simhash(text).as("sig"))
    // key = the selected blocks' bits in place (sig & mask): equality of
    // masked values == equality of those blocks, no shifting required
    // (shifting by a Column isn't in the Scala API, and decimal division
    // mis-rounds negative signatures). Block widths differ by at most one
    // bit. Masks explode from a literal array with the signature kept
    // BELOW the generator, so the expensive simhash tree evaluates once
    // per document (not once per table — see the same note in
    // minhashDuplicates).
    val base = 64 / nBlocks
    val rem = 64 % nBlocks
    val blockMasks: Array[Long] = Array.tabulate(nBlocks) { c =>
      val w = base + (if (c < rem) 1 else 0)
      val start = c * base + math.min(c, rem)
      val widthMask = if (w >= 64) -1L else (1L << w) - 1L
      widthMask << start
    }
    val chunkMasks: Array[Long] =
      blockMasks.indices.combinations(comb).map(_.map(blockMasks).reduce(_ | _)).toArray
    require(chunkMasks.length <= 4096,
      s"C($nBlocks, $comb) = ${chunkMasks.length} tables — pick a smaller `blocks`")
    val chunked = sig
      .select(col("id"), col("sig"),
        posexplode(typedLit(chunkMasks)).as(Seq("chunk", "mask")))
      .select(col("id"), col("sig"), col("chunk"),
        col("sig").bitwiseAND(col("mask")).as("key"))
    val l = chunked.select(col("chunk"), col("key"), col("id").as("a"), col("sig").as("sigA"))
    val r = chunked.select(col("chunk"), col("key"), col("id").as("b"), col("sig").as("sigB"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), hamming(col("sigA"), col("sigB")).as("distance"))
      .distinct()
      .filter(col("distance") <= maxDistance)
  }

  /** Default block count for [[simhashDuplicates]]: the smallest B in
    * (d, 32] whose GUARANTEED key width (r blocks × the narrowest block,
    * r = B − d) is ≥ 9 bits with C(B, r) inside the 4096-table guard —
    * so buckets stay ≤ n/2⁹ in expectation instead of degrading toward
    * all-pairs. Reproduces B = d+1 exactly for d ≤ 6 (where r = 1 already
    * clears 9 bits) and switches to the multi-table scheme above it:
    * d=7→B=9 (36 tables), d=10→B=12 (66), d=15→B=18 (816).
    */
  def simhashAutoBlocks(maxDistance: Int): Int = {
    def choose(n: Int, k: Int): Long =
      (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)
    (maxDistance + 1 to 32).find { b =>
      val r = b - maxDistance
      r * (64 / b) >= 9 && choose(b, r) <= 4096
    }.getOrElse(maxDistance + 1)
  }

  // ---------- embedding cosine ----------

  /** EXACT near-duplicate pairs by embedding cosine ≥ threshold, as a
    * load-balanced blocked self-join. Exact all-pairs similarity over dense
    * vectors is inherently Θ(n²) compute (no sub-quadratic exact method
    * exists for arbitrary dense data), so the scalable form of "exact" is to
    * distribute that work evenly: each vector gets a block id, each side is
    * replicated `blocks`× keyed by the (blockA, blockB) pair, and the join
    * is a plain shuffled EQUI-join on the pair key — every pair meets in
    * exactly one of blocks² uniformly-sized tasks, no Cartesian/nested-loop
    * node, no single task owning the whole corpus. Shuffle volume is
    * 2·n·blocks rows; pick blocks ≈ √(4·parallelism).
    *
    * This is the verification-grade path; at 100-TB corpus sizes use
    * [[embeddingDuplicatesLsh]] (approximate candidates, exact verify).
    */
  def embeddingDuplicates(
      embs: DataFrame, id: Column, vec: Column, threshold: Double,
      blocks: Int = 16): DataFrame = {
    val v = embs.select(id.as("id"), vec.as("v"))
      .withColumn("norm", Similarity.l2norm(col("v")))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(blocks)))
    // The join's COMPUTE is Θ(n²) dot products while its input BYTES are
    // O(n·blocks) — AQE's byte-based partition coalescing therefore folds
    // the whole block grid into one or two post-shuffle partitions and
    // serializes the quadratic work (measured: 5 tasks / 5.3 task-sec ≈
    // wall at sf0.1). An EXPLICIT partition count on the block-pair key is
    // the documented way to pin compute-heavy exchanges: AQE never
    // coalesces user-specified repartitions, and both sides sharing the
    // same (pa, pb) hash partitioning means the join adds no exchange of
    // its own. blocks² pairs spread uniformly over ~cores partitions.
    val parts = math.max(embs.sparkSession.sparkContext.defaultParallelism, blocks)
    val l = v.select(col("id").as("a"), col("v").as("va"), col("norm").as("na"),
        col("blk").as("pa"))
      .withColumn("pb", explode(sequence(lit(0L), lit(blocks - 1L))))
      .repartition(parts, col("pa"), col("pb"))
    val r = v.select(col("id").as("b"), col("v").as("vb"), col("norm").as("nb"),
        col("blk").as("pb"))
      .withColumn("pa", explode(sequence(lit(0L), lit(blocks - 1L))))
      .repartition(parts, col("pa"), col("pb"))
    l.join(r, Seq("pa", "pb"))
      .filter(col("a") < col("b"))
      .withColumn("cosine",
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** APPROXIMATE near-duplicate pairs by embedding cosine ≥ threshold — the
    * 100-TB path: SRP-LSH candidate generation (multiple independent hash
    * tables, 1-bit multiprobe on one side so pairs within hamming 1 of a
    * table's key collide), candidates deduped, then EXACT cosine verify, so
    * precision is 1 and only recall is probabilistic:
    *   P(miss) = (1 − P(hamming(key_a, key_b) ≤ 1))^tables,
    * with per-plane agreement p = 1 − θ/π. For genuinely near-duplicate
    * pairs (cosine ≥ 0.9) the defaults give P(miss) < 1e-5; pairs near the
    * random-cosine regime are NOT reliably found — that is the documented
    * contract difference from [[embeddingDuplicates]].
    */
  def embeddingDuplicatesLsh(
      embs: DataFrame, id: Column, vec: Column, threshold: Double,
      numPlanes: Int = 16, tables: Int = 8): DataFrame = {
    val v = embs.select(id.as("id"), vec.as("v"))
      .withColumn("norm", Similarity.l2norm(col("v")))
    val planeMasks: Array[Long] = Array.tabulate(numPlanes)(i => 1L << i)
    // per (doc, table): the table's SRP key
    val keyed = v.select(
      col("id"),
      explode(transform(sequence(lit(0), lit(tables - 1)), t =>
        struct(t.as("table"),
          Similarity.srpBucket(col("v"), numPlanes, seedCol = t).as("key")))).as("tk"))
      .select(col("id"), col("tk.table").as("table"), col("tk.key").as("key"))
    // multiprobe on the left: own key + every 1-bit flip
    val probed = keyed.select(
      col("id"), col("table"),
      explode(concat(array(col("key")),
        transform(sequence(lit(0), lit(numPlanes - 1)),
          p => col("key").bitwiseXOR(element_at(typedLit(planeMasks), p + 1))))).as("key"))
    val candidates = probed.select(col("table"), col("key"), col("id").as("a"))
      .join(keyed.select(col("table"), col("key"), col("id").as("b")), Seq("table", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
    candidates
      .join(v.select(col("id").as("a"), col("v").as("va"), col("norm").as("na")), Seq("a"))
      .join(v.select(col("id").as("b"), col("v").as("vb"), col("norm").as("nb")), Seq("b"))
      .withColumn("cosine",
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
