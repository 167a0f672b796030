package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All of `TextAnalysis`' per-document counters in ONE pass over the
  * raw bytes.
  *
  * `graft_textcounts(text)` returns the struct `(n_tok, n_retok,
  * n_punct, n_stop, n_nonws, c_en, c_es, c_de, c_fr, c_zh)` — the
  * counts behind q15's token/quality signals and q16's language-ID
  * argmax (reference derived-signal projection: IngestionJob.scala's
  * withColumn battery). The composed form runs NINE independent
  * `regexp_extract_all`/`regexp_replace` passes per document — all
  * natively codegen'd, but each one re-scans the full text through
  * java.util.regex and materializes its matches as boxed arrays just
  * to count them. This kernel computes every counter in a single
  * code-point scan with zero allocation.
  *
  * Parity is BIT-EXACT with the regex formulation by construction,
  * not by luck (spec-pinned on the real corpus):
  *  - `\s` is Java's ASCII class `[ \t\n\x0B\f\r]`, so `n_tok`
  *    counts maximal non-ws runs exactly as `\S+` matches them and
  *    `n_nonws` counts the survivors of `regexp_replace(t,'\s+','')`.
  *  - `n_retok` mirrors `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`: regex
  *    alternation over disjoint starter classes scanning left to
  *    right counts exactly (letter runs) + (digit runs) + (other
  *    non-ws code points).
  *  - Stopword/marker patterns are `\b(w1|w2|...)\b` with every
  *    alternative made of word chars only, so a match is precisely a
  *    maximal word-char run equal to an alternative (case-sensitive).
  *    Java quirk, empirically pinned: `\b`'s word class is
  *    Unicode-aware even WITHOUT `UNICODE_CHARACTER_CLASS` (`_` or
  *    `Character.isLetterOrDigit` — Pattern's Bound node), while `\w`
  *    stays ASCII — so "的the是" is ONE run and matches nothing.
  *    Runs of <=4 bytes pack into an int for a branch-free
  *    membership test.
  *  - `c_zh` has no `\b`: it counts occurrences of the three CJK
  *    marker code points anywhere.
  */
case class TextCounts(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_textcounts"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = TextCounts.Schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.counts($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextCounts {

  val Schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_retok", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("c_en", IntegerType, nullable = false),
    StructField("c_es", IntegerType, nullable = false),
    StructField("c_de", IntegerType, nullable = false),
    StructField("c_fr", IntegerType, nullable = false),
    StructField("c_zh", IntegerType, nullable = false)))

  // lowercase-letter words of <=4 bytes packed big-endian, unpadded
  // (injective: every byte is >= 0x61, so length is recoverable from
  // the top byte position) — one int compare per run instead of a
  // string equality ladder
  private def pack(w: String): Int = {
    var v = 0
    var i = 0
    while (i < w.length) { v = (v << 8) | (w.charAt(i) & 0xff); i += 1 }
    v
  }
  // TextAnalysis.StopwordPattern alternatives, in packed form
  private val Stop = Array("the", "a", "of", "and", "to", "in", "is", "for", "on", "with").map(pack).sorted
  private val En = Array("the", "and", "of", "to").map(pack).sorted
  private val Es = Array("el", "la", "de", "que").map(pack).sorted
  private val De = Array("der", "die", "und", "das").map(pack).sorted
  private val Fr = Array("le", "les", "et", "une").map(pack).sorted

  private def has(set: Array[Int], v: Int): Boolean = {
    var lo = 0
    var hi = set.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (set(mid) == v) return true
      else if (set(mid) < v) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || (cp >= '\t' && cp <= '\r') // \t \n \x0B \f \r

  /** Shared kernel for interpreted eval and codegen. */
  def counts(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nTok = 0; var nRetok = 0; var nPunct = 0; var nStop = 0; var nNonws = 0
    var cEn = 0; var cEs = 0; var cDe = 0; var cFr = 0; var cZh = 0
    var prevNonWs = false   // inside a \S+ run
    var prevLetter = false  // inside an [A-Za-z]+ run
    var prevDigit = false   // inside a [0-9]+ run
    var inWord = false      // inside a [A-Za-z0-9_]+ run
    var wordPacked = 0      // packed bytes if run is all [a-z] and <=4 long, else -1
    var wordLen = 0

    @inline def endWord(): Unit = {
      if (inWord && wordPacked > 0) {
        if (has(Stop, wordPacked)) nStop += 1
        if (has(En, wordPacked)) cEn += 1
        if (has(Es, wordPacked)) cEs += 1
        if (has(De, wordPacked)) cDe += 1
        if (has(Fr, wordPacked)) cFr += 1
      }
      inWord = false; wordPacked = 0; wordLen = 0
    }

    var i = 0
    while (i < n) {
      val b = bytes(i)
      var cp = 0
      var w = 1
      if (b >= 0) { cp = b; w = 1 }
      else {
        // decode UTF-8 (UTF8String content is valid by construction)
        val ub = b & 0xff
        if (ub >= 0xf0) { w = 4; cp = ((ub & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) | ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f) }
        else if (ub >= 0xe0) { w = 3; cp = ((ub & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f) }
        else { w = 2; cp = ((ub & 0x1f) << 6) | (bytes(i + 1) & 0x3f) }
      }
      val ws = cp < 0x80 && isWs(cp)
      val letter = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      val digit = cp >= '0' && cp <= '9'
      // \b's word class (see Scaladoc): ASCII fast path, Unicode slow
      val word = letter || digit || cp == '_' ||
        (cp >= 0x80 && Character.isLetterOrDigit(cp))

      if (!ws) {
        nNonws += 1
        if (!prevNonWs) nTok += 1 // \S+ run starts
        if (letter) { if (!prevLetter) nRetok += 1 }
        else if (digit) { if (!prevDigit) nRetok += 1 }
        else nRetok += 1 // single-codepoint alternative
        if (cp == '.' || cp == '!' || cp == '?' || cp == ',' || cp == ';' || cp == ':') nPunct += 1
        if (cp == 0x7684 || cp == 0x662f || cp == 0x4e86) cZh += 1
      }
      if (word) {
        if (!inWord) { inWord = true; wordPacked = 0; wordLen = 0 }
        if (wordPacked >= 0) {
          wordLen += 1
          if (wordLen > 4 || cp < 'a' || cp > 'z') wordPacked = -1
          else wordPacked = (wordPacked << 8) | cp
        }
      } else endWord()
      prevNonWs = !ws
      prevLetter = letter
      prevDigit = digit
      i += w
    }
    endWord()
    new GenericInternalRow(Array[Any](nTok, nRetok, nPunct, nStop, nNonws, cEn, cEs, cDe, cFr, cZh))
  }
}
