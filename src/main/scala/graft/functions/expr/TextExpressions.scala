package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass compiled text-profiling kernel behind [[TextProfile]].
  *
  * Why (guide §4 / the VectorKernels precedent): the text-quality operators
  * were column algebra over Spark higher-order functions — `filter`,
  * `aggregate`, `transform` lambdas are INTERPRETED per element per row, and
  * q_text_quality alone re-tokenized each document ~6× and re-scanned it
  * with 6 more regexes (measured 3.6 task-sec for 500 sf0.1 docs, ~7 ms per
  * ~10 KB document). This kernel computes every quantity those operators
  * need in one lowercase + two byte scans + one hash per token, exposed as a
  * single codegen'd struct; the public [[graft.functions.TextAnalysis]]
  * columns become field extractions whose double arithmetic is
  * column-identical to the old forms (same ops, same order — the DuckDB
  * oracles depend on exact values).
  *
  * Exactness contract, field by field (vs the column forms replaced):
  *   - tokenization ≡ `filter(split(trim(text), "\\s+"), len > 0)`: the
  *     maximal runs of code points outside Java's `\s` = the six ASCII bytes
  *     {0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20}. These are single-byte in UTF-8
  *     and never occur as continuation bytes, so a byte scan is exact.
  *   - char counts ≡ `length(...)`: code points = non-continuation bytes.
  *   - `alpha`/`punct` count [A-Za-z] / POSIX-punct code points — both ASCII
  *     classes, and the char-class regexes they replace
  *     (`[^A-Za-z]`, `[\p{Punct}]`) match single code points.
  *   - `subwords` replays `[a-z]{1,4}|[0-9]+|[^a-z0-9\s]` over
  *     `lower(text)`: greedy ≤4-letter runs, maximal digit runs, any other
  *     non-whitespace code point as a 1-point match, whitespace skipped.
  *   - lowercase uses the same `UTF8String.toLowerCase` as the `lower()`
  *     column; word lookups compare whole tokens by UTF8 bytes.
  *   - `fingerprint` ≡ `xxhash64(concat_ws(" ", array_sort(array_distinct(
  *     tokens(lower(text))))))`: sorted-distinct via a TreeSet in
  *     UTF8String binary order (array_sort's StringType ordering), joined
  *     with single spaces, hashed with the same seed-42 XXH64 fold.
  *   - `rollingHash` replays the `aggregate` fold
  *     `h' = pmod((h<<5) − h + pmod(xxhash64(tok), 2^30), 2^56)` in order.
  *   - `langBest` reproduces `array_max` over (hits, lang) structs: max
  *     hits, ties to the lexicographically larger language code.
  */
object TextKernels {

  private val WS: Array[Boolean] = {
    val a = new Array[Boolean](128)
    Seq(' ', '\t', '\n', '\u000B', '\f', '\r').foreach(c => a(c) = true)
    a
  }

  private val PUNCT: Array[Boolean] = {
    val a = new Array[Boolean](128)
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => a(c) = true)
    a
  }

  // word-class flags (stopwords + per-language markers), keyed by the exact
  // lowered token; values mirror TextAnalysis.stopwords / langMarkers
  val STOP = 1; val DE = 2; val EN = 4; val ES = 8; val FR = 16; val ZH = 32

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this")
  private val markers: Seq[(Int, Seq[String])] = Seq(
    EN -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    ES -> Seq("el", "la", "los", "las", "de", "que", "y", "es", "una"),
    FR -> Seq("le", "la", "les", "des", "est", "que", "une", "dans"),
    DE -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    ZH -> Seq("的", "是", "了", "在", "我", "有"))

  private val wordFlags: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    def add(w: String, f: Int): Unit = {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, if (prev == null) f else (prev | f))
    }
    stopwords.foreach(add(_, STOP))
    markers.foreach { case (f, ws) => ws.foreach(add(_, f)) }
    m
  }

  private val langNames =
    Array("de", "en", "es", "fr", "zh").map(UTF8String.fromString)
  private val langFlags = Array(DE, EN, ES, FR, ZH)

  private def isCont(b: Byte): Boolean = (b & 0xC0) == 0x80
  private def isWs(b: Byte): Boolean = b >= 0 && WS(b)

  /** All profile fields in one InternalRow; see the object doc for the
    * field-by-field equivalence contract. Field order must match
    * [[TextProfile.structType]].
    */
  def profile(text: UTF8String): InternalRow = {
    // ---- raw-text scan: nChars, nTokens, nonSpace, alpha, punct ----
    val raw = text.getBytes
    var nChars = 0; var nTokens = 0; var nonSpace = 0
    var alpha = 0; var punct = 0
    var inTok = false
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if (!isCont(b)) {
        nChars += 1
        if (isWs(b)) inTok = false
        else {
          nonSpace += 1
          if (!inTok) { nTokens += 1; inTok = true }
          if (b >= 0) {
            if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
            if (PUNCT(b)) punct += 1
          }
        }
      }
      i += 1
    }

    // ---- lowered-text scan: subwords, tokens (lookup + hashes) ----
    val lower = text.toLowerCase
    val lb = lower.getBytes
    var subwords = 0
    var nTokensLower = 0; var stopHits = 0
    var hDe = 0; var hEn = 0; var hEs = 0; var hFr = 0; var hZh = 0
    var rolling = 0L
    val distinct = new java.util.TreeSet[UTF8String]()
    var tokStart = -1
    def endToken(endExcl: Int): Unit = {
      if (tokStart >= 0) {
        val tok = UTF8String.fromBytes(lb, tokStart, endExcl - tokStart)
        nTokensLower += 1
        val f = wordFlags.get(tok)
        if (f != null) {
          val fl = f.intValue()
          if ((fl & STOP) != 0) stopHits += 1
          if ((fl & DE) != 0) hDe += 1
          if ((fl & EN) != 0) hEn += 1
          if ((fl & ES) != 0) hEs += 1
          if ((fl & FR) != 0) hFr += 1
          if ((fl & ZH) != 0) hZh += 1
        }
        // h' = pmod((h<<5) - h + pmod(xxhash64(tok), 2^30), 2^56); both
        // pmod moduli are positive powers of two and (h<<5) - h >= 0, so
        // plain % is exact except for the possibly-negative token hash
        var th = XXH64.hashUTF8String(tok, 42L) % (1L << 30)
        if (th < 0) th += (1L << 30)
        rolling = ((rolling << 5) - rolling + th) % (1L << 56)
        distinct.add(tok)
        tokStart = -1
      }
    }
    i = 0
    while (i < lb.length) {
      val b = lb(i)
      if (isWs(b)) { endToken(i); i += 1 }
      else {
        if (tokStart < 0) tokStart = i
        // subword automaton over code points (whitespace handled above)
        if (b >= 'a' && b <= 'z') {
          var j = i + 1; var run = 1
          while (j < lb.length && run < 4 && lb(j) >= 'a' && lb(j) <= 'z') {
            j += 1; run += 1
          }
          subwords += 1; i = j
        } else if (b >= '0' && b <= '9') {
          var j = i + 1
          while (j < lb.length && lb(j) >= '0' && lb(j) <= '9') j += 1
          subwords += 1; i = j
        } else if (b >= 0) { subwords += 1; i += 1 }
        else {
          subwords += 1
          i += 1
          while (i < lb.length && isCont(lb(i))) i += 1
        }
      }
    }
    endToken(lb.length)

    // fingerprint: hash of the sorted-distinct tokens joined by ' '
    var joinedLen = 0
    val it0 = distinct.iterator()
    while (it0.hasNext) joinedLen += it0.next().numBytes() + 1
    val joined = new Array[Byte](math.max(0, joinedLen - 1))
    var off = 0
    val it1 = distinct.iterator()
    while (it1.hasNext) {
      val t = it1.next()
      if (off > 0) { joined(off) = ' '; off += 1 }
      t.writeToMemory(joined, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
      off += t.numBytes()
    }
    val fingerprint =
      XXH64.hashUTF8String(UTF8String.fromBytes(joined), 42L)

    // langBest = array_max over (hits, lang) structs: max hits, ties to the
    // lexicographically LARGER lang code (langNames is ascending, so >=)
    val hits = Array(hDe, hEn, hEs, hFr, hZh)
    var bi = 0
    var bHits = hits(0)
    i = 1
    while (i < hits.length) {
      if (hits(i) >= bHits) { bi = i; bHits = hits(i) }
      i += 1
    }

    new GenericInternalRow(Array[Any](
      nChars, nTokens, nonSpace, alpha, punct, subwords,
      nTokensLower, stopHits, bHits, langNames(bi), fingerprint, rolling))
  }
}

/** Codegen'd one-pass text profile struct — see [[TextKernels.profile]]. */
case class TextProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextProfile.structType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"TextProfile needs a string input, got $t")
    }
  override protected def nullSafeEval(in: Any): Any =
    TextKernels.profile(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.expr.TextKernels.profile($in);")
  override protected def withNewChildInternal(c: Expression): TextProfile = copy(child = c)
}

object TextProfile {
  val structType: StructType = StructType(Seq(
    StructField("nChars", IntegerType, nullable = false),
    StructField("nTokens", IntegerType, nullable = false),
    StructField("nonSpace", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("subwords", IntegerType, nullable = false),
    StructField("nTokensLower", IntegerType, nullable = false),
    StructField("stopHits", IntegerType, nullable = false),
    StructField("langHits", IntegerType, nullable = false),
    StructField("langBest", StringType, nullable = false),
    StructField("fingerprint", LongType, nullable = false),
    StructField("rollingHash", LongType, nullable = false)))
}
