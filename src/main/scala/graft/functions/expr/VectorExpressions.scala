package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-row kernels behind the native expressions below.
  *
  * Why these exist (SURVEY.md §2.2 "custom operators" ladder): Spark's
  * higher-order functions (`transform`/`aggregate`/`zip_with`) have no
  * codegen — every lambda application is an interpreted expression eval —
  * so vector math written as HOF column algebra pays an interpreter
  * dispatch per ELEMENT per row. A native Catalyst `Expression` whose
  * `doGenCode` emits one static call into a compiled JVM loop removes that:
  * measured ~10× on the embedding-dedup and MinHash queries at sf0.1.
  * Hash values are kept bit-identical to the `xxhash64(...)` column forms
  * they replace (same XXH64 fold, seed 42), so signatures and buckets are
  * unchanged.
  */
object VectorKernels {

  /** Σ a(i)·b(i) over float arrays, left-to-right (same summation order as
    * the `aggregate`/`zip_with` fold it replaces — identical doubles).
    * Assumes equal lengths — [[VectorDot]] nulls mismatched pairs before
    * this runs; the min() below is only belt-and-braces for direct callers.
    */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** MinHash signature: sig(j) = min over shingles s of xxhash64(j, s)
    * (Spark hash fold: seed 42 → hashInt(j) → hashUTF8String(s)); empty
    * input → all Long.MaxValue.
    */
  def minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashUTF8String(s, XXH64.hashInt(j, 42L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over the whitespace token multiset of lower(text):
    * bit b set iff Σ_tokens sign(bit b of xxhash64(token)) > 0 — same
    * construction (and same per-token hash values) as the column form.
    */
  def simhash(text: UTF8String): Long = {
    val toks = text.toLowerCase.toString.trim.split("\\s+")
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Distinct k-token shingles of lower(text) (whitespace tokens, k-grams
    * joined by single spaces; < k tokens → one all-token shingle; blank →
    * empty). String-identical to the column-algebra form it replaces
    * (q_ngram_jaccard's DuckDB oracle depends on these exact strings).
    */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toLowerCase.toString.trim.split("\\s+").filter(_.nonEmpty)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length >= k) {
      var i = 0
      while (i + k <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    } else if (toks.nonEmpty) {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Signed-random-projection bucket: bit p = sign(Σ_j v(j)·r(p,j)) with
    * r a deterministic ±1 stream keyed by (table seed, plane, dim).
    */
  def srpBucket(v: ArrayData, numPlanes: Int, seed: Long): Long = {
    val d = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val planeSeed = XXH64.hashLong(p.toLong, XXH64.hashLong(seed, 0x5157L))
      var s = 0.0
      var j = 0
      while (j < d) {
        val sign = if ((XXH64.hashLong(j.toLong, planeSeed) & 1L) == 0L) 1.0 else -1.0
        s += v.getFloat(j).toDouble * sign
        j += 1
      }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** Dot product of two `array<float>` columns as double — codegen'd.
  * Mismatched lengths yield NULL, exactly like the `zip_with` column form
  * this replaces (whose shorter-side padding nulls the whole sum) — a
  * silently-truncated partial dot product would turn one corrupt short embedding
  * row into a plausible-but-wrong similarity with no error anywhere.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // also null on length mismatch
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"VectorDot needs two array<float> inputs, got ${left.dataType}, ${right.dataType}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else VectorKernels.dotFF(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.expr.VectorKernels.dotFF($a, $b);
         |}
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

/** MinHash signature of an `array<string>` shingle column — codegen'd. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(in: Any): Any =
    VectorKernels.minhash(in.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.expr.VectorKernels.minhash($in, $numHashes);")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Distinct k-token shingles of a string column — codegen'd. */
case class ShingleSet(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(in: Any): Any =
    VectorKernels.shingles(in.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.expr.VectorKernels.shingles($in, $k);")
  override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
}

/** 64-bit SimHash of a string column — codegen'd. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(in: Any): Any =
    VectorKernels.simhash(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.expr.VectorKernels.simhash($in);")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** SRP-LSH bucket of an `array<float>` column under `seed` — codegen'd;
  * `seed` is an expression so multi-table LSH can key it per table.
  */
case class SrpBucket(left: Expression, right: Expression, numPlanes: Int)
    extends BinaryExpression {
  require(numPlanes > 0 && numPlanes <= 63)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any, seed: Any): Any =
    VectorKernels.srpBucket(v.asInstanceOf[ArrayData], numPlanes,
      seed.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.functions.expr.VectorKernels.srpBucket($v, $numPlanes, (long) $s);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SrpBucket =
    copy(left = l, right = r)
}
