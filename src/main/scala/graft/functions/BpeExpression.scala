package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable byte-pair-encoding token counter.
  *
  * `graft_bpe_count(text)` = the number of BPE tokens in `text` under
  * graft's FIXED, VERSIONED merge table ([[Bpe.Merges]]): the document
  * lowercases, splits into words on `[^a-z0-9]+` (exactly
  * `TextAnalysis.wordTokensSql`'s pre-tokenization, so the two
  * tokenizers differ only in the subword step), and each word runs the
  * classic greedy merge loop — repeatedly find the adjacent symbol
  * pair with the LOWEST merge rank and fuse every (necessarily
  * disjoint, see below) occurrence — until no pair is in the table.
  * The count is the number of surviving symbols, summed over words.
  *
  * Why this exists (r19 verdict item): q43 packing and q103 token
  * budgets counted whitespace word tokens, which materially misprices
  * non-space-delimited text at crawl scale where budgets are
  * BPE-denominated. A merge-table tokenizer prices "the" as one token
  * and a random consonant string as many — the cost shape real BPE
  * vocabularies induce.
  *
  * Portability discipline (same rule as graft_minhash_md5_bands):
  * every step is integer/string-exact and the merge table ships as
  * data, so DuckDB replays the identical greedy loop with a recursive
  * CTE and hash-matches the counts bit for bit. To keep "merge all
  * occurrences simultaneously" well-defined and SQL-replayable, the
  * table REQUIRES left != right for every merge: occurrences of a
  * pair (a,b) with a != b can never overlap, so simultaneous fusion
  * equals GPT-2's left-greedy rebuild.
  *
  * Scale shape: one projection inside whole-stage codegen, zero
  * shuffles, zero allocation beyond the per-word symbol buffer; the
  * merge table is a static JVM array (a few hundred bytes), not a
  * broadcast — nothing changes at 100 TB.
  */
case class BpeCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "graft_bpe_count"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Bpe.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.countTokens($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bpe {

  /** The fixed merge table, rank = position. Two tiers: character
    * bigrams first, then chained merges building common English
    * function words and affixes from earlier outputs — enough depth to
    * exercise real multi-level BPE semantics while staying small
    * enough to ship verbatim inside the DuckDB replay SQL. INVARIANT
    * (enforced below): left != right for every entry — the disjoint-
    * occurrence guarantee the portable semantics rest on.
    */
  val Merges: Vector[(String, String)] = Vector(
    // tier 1: character bigrams (frequency-ordered, English-centric)
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("o", "f"),
    ("e", "d"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("t", "o"), ("n", "t"), ("n", "g"), ("s", "e"),
    ("h", "a"), ("a", "s"), ("o", "u"), ("i", "o"), ("l", "e"),
    ("v", "e"), ("c", "o"), ("m", "e"), ("d", "e"), ("h", "i"),
    ("r", "i"), ("r", "o"), ("i", "c"), ("n", "e"), ("e", "a"),
    ("r", "a"), ("c", "e"), ("l", "i"), ("c", "h"), ("b", "e"),
    ("m", "a"), ("s", "i"), ("o", "m"), ("u", "r"), ("w", "h"),
    ("w", "i"), ("u", "s"), ("l", "o"), ("p", "e"), ("f", "o"),
    // tier 2: chained merges over tier-1 outputs
    ("th", "e"),   // the
    ("an", "d"),   // and
    ("in", "g"),   // ing
    ("ti", "on"),  // tion
    ("th", "at"),  // that
    ("th", "is"),  // this
    ("wi", "th"),  // with
    ("f", "or"),   // for (f + or)
    ("w", "as"),   // was (w + as)
    ("ic", "h"),   // ich
    ("wh", "ich"), // which
    ("e", "nt"),   // ent
    ("a", "re"),   // are
    ("o", "ther"), // other (fires once "ther" has formed below)
    ("th", "er"),  // ther
    ("e", "st"),   // est
    ("it", "y"),   // ity
    ("a", "tion"), // ation
    ("in", "ter"), // inter
    ("t", "er")    // ter
  )

  locally {
    Merges.foreach { case (l, r) =>
      require(l != r,
        s"BPE merge table invariant violated: left == right for ('$l','$r') — " +
          "disjoint-occurrence portability depends on l != r")
    }
    require(Merges.distinct.size == Merges.size, "duplicate BPE merge entries")
  }

  /** rank lookup keyed `leftright`. */
  private val Rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](Merges.size * 2)
    Merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + "" + r, i) }
    m
  }

  /** The merge table as a DuckDB VALUES list `(rank, l, r)` — the
    * oracle replay's source of truth is THIS object, never a copy.
    */
  def mergesSqlValues: String =
    Merges.zipWithIndex
      .map { case ((l, r), i) => s"($i, '$l', '$r')" }
      .mkString(", ")

  /** Greedy BPE of one (already lowercase, [a-z0-9]-only) word;
    * returns the surviving symbol count. Package-visible so the spec
    * can fuzz it against an independent reference implementation.
    */
  private[graft] def wordTokens(word: String): Int = {
    val n = word.length
    if (n <= 1) return n
    var syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var len = n
    var done = false
    while (!done && len > 1) {
      // lowest-rank adjacent pair present in the table
      var best = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val r = Rank.get(syms(i) + "" + syms(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = Merges(best)
        val ab = a + b
        // fuse every occurrence — disjoint by the l != r invariant
        val out = new Array[String](len)
        var o = 0
        i = 0
        while (i < len) {
          if (i < len - 1 && syms(i) == a && syms(i + 1) == b) {
            out(o) = ab; o += 1; i += 2
          } else { out(o) = syms(i); o += 1; i += 1 }
        }
        syms = out
        len = o
      }
    }
    len
  }

  /** Shared kernel for interpreted eval and codegen: lowercase, split
    * on `[^a-z0-9]+`, sum per-word greedy-BPE symbol counts.
    */
  def countTokens(s: UTF8String): Long = {
    val lower = s.toLowerCase.toString
    var total = 0L
    var start = -1
    var i = 0
    val n = lower.length
    while (i <= n) {
      val isWordChar = i < n && {
        val c = lower.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (isWordChar) { if (start < 0) start = i }
      else if (start >= 0) {
        total += wordTokens(lower.substring(start, i))
        start = -1
      }
      i += 1
    }
    total
  }
}
