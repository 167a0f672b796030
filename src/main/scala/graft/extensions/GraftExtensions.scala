package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.{BloomAggregate, BloomContains, CosineSimilarity, CosineSimilarityMany, DotProduct, JaccardSorted, LshBands, MinHashFromHashes, MinHashSignature, PortableMinHashBands, RepetitionStats, ShingleHashes, TextCounts, TopKByScore, WinnowFingerprint, WordGramHashes}

/** Session extension injecting graft's native Catalyst expressions.
  *
  * Wire-up (either works):
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
  *
  * This is the same hook the reference uses for Iceberg's extensions
  * (reference: IngestionJob.scala:15 `spark.sql.extensions =
  * IcebergSparkSessionExtensions`) — the public, documented way to add
  * engine capability without forking Spark.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two array<double> vectors"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double> vectors"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_many"),
      info("graft_cosine_many",
        "graft_cosine_many(mat, vec) - cosine of every array<array<double>> row against vec, in row order"),
      (children: Seq[Expression]) => CosineSimilarityMany(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - k-minima MinHash signature of an array<string>"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(k: Int, IntegerType) => MinHashSignature(children(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash k must be an integer literal, got $other")
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(text, n) - sorted distinct xxhash64 of every n-gram"),
      (children: Seq[Expression]) => ShingleHashes(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_wordgram_hashes"),
      info("graft_wordgram_hashes", "graft_wordgram_hashes(loweredText, n) - sorted distinct xxhash64 of every word n-gram"),
      (children: Seq[Expression]) => WordGramHashes(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard_sorted"),
      info("graft_jaccard_sorted", "graft_jaccard_sorted(a, b) - exact Jaccard of two sorted array<long>"),
      (children: Seq[Expression]) => JaccardSorted(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk", "graft_topk(score, id1, id2, k) - bounded per-group top-k by (score DESC, id1 ASC, id2 ASC)"),
      (children: Seq[Expression]) => children(3) match {
        case Literal(k: Int, IntegerType) => TopKByScore(children(0), children(1), children(2), k)
        case other => throw new IllegalArgumentException(
          s"graft_topk k must be an integer literal, got $other")
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_md5_bands"),
      info("graft_minhash_md5_bands", "graft_minhash_md5_bands(shingles, k, bands) - md5-portable banded MinHash signature (r=2)"),
      (children: Seq[Expression]) => (children(1), children(2)) match {
        case (Literal(k: Int, IntegerType), Literal(b: Int, IntegerType)) =>
          PortableMinHashBands(children(0), k, b)
        case other => throw new IllegalArgumentException(
          s"graft_minhash_md5_bands k and bands must be integer literals, got $other")
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_hashed"),
      info("graft_minhash_hashed", "graft_minhash_hashed(hashes, k) - MinHash signature over pre-hashed shingles"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(k: Int, IntegerType) => MinHashFromHashes(children(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash_hashed k must be an integer literal, got $other")
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "graft_winnow(tokens, k, w) - winnowing fingerprint: sorted distinct window-of-w minima over md5-60bit k-gram hashes"),
      (children: Seq[Expression]) => (children(1), children(2)) match {
        case (Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
          WinnowFingerprint(children(0), k, w)
        case other => throw new IllegalArgumentException(
          s"graft_winnow k and w must be integer literals, got $other")
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_repstats"),
      info("graft_repstats", "graft_repstats(tokens) - repetition signals struct: n_tokens, n_types, type_token_ratio, dup_trigram_ratio, top_token_ratio"),
      (children: Seq[Expression]) => RepetitionStats(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(features, bits, useMd5) - SimHash sign-pack; md5-60bit portable or xxhash64 feature hashes"),
      (children: Seq[Expression]) => (children(1), children(2)) match {
        case (Literal(bits: Int, IntegerType), Literal(md5: Boolean, org.apache.spark.sql.types.BooleanType)) =>
          graft.functions.SimHash(children(0), bits, md5)
        case other => throw new IllegalArgumentException(
          s"graft_simhash bits and useMd5 must be literals, got $other")
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_shingled"),
      info("graft_simhash_shingled", "graft_simhash_shingled(text, n, bits) - portable SimHash from text: distinct char n-grams, md5-60bit hashes, sign-pack"),
      (children: Seq[Expression]) => (children(1), children(2)) match {
        case (Literal(n: Int, IntegerType), Literal(bits: Int, IntegerType)) =>
          graft.functions.SimHashShingled(children(0), n, bits)
        case other => throw new IllegalArgumentException(
          s"graft_simhash_shingled n and bits must be integer literals, got $other")
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bands"),
      info("graft_lsh_bands", "graft_lsh_bands(sig, r) - LSH band keys: xxhash64-compatible hash of each r-wide signature slice"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(r: Int, IntegerType) => LshBands(children(0), r)
        case other => throw new IllegalArgumentException(
          s"graft_lsh_bands r must be an integer literal, got $other")
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_textcounts"),
      info("graft_textcounts", "graft_textcounts(text) - one-pass token/punct/stopword/language-marker counters struct"),
      (children: Seq[Expression]) => TextCounts(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_count"),
      info("graft_bpe_count", "graft_bpe_count(text) - portable BPE token count under graft's fixed merge table"),
      (children: Seq[Expression]) => graft.functions.BpeCount(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_pln"),
      info("graft_pln", "graft_pln(n) - portable IEEE-exact natural log of a positive BIGINT"),
      (children: Seq[Expression]) => graft.functions.PortableLn(children(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_lp_nano"),
      info("graft_lp_nano", "graft_lp_nano(num, den) - floor((graft_pln(num) - graft_pln(den)) * 1e9) as BIGINT"),
      (children: Seq[Expression]) => graft.functions.PortableLpNano(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "graft_bloom_contains(bloom, s) - might-contain probe of a serialized bloom filter"),
      (children: Seq[Expression]) => BloomContains(children(0), children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "graft_bloom_agg(s, expectedItems, fpp) - mergeable bloom-filter sketch of a string column"),
      (children: Seq[Expression]) => {
        // SQL numeric literals arrive as int/long/decimal depending on
        // how they were written — accept any foldable numeric
        def num(e: Expression, what: String): Double = e match {
          case l: Literal if l.value != null => l.value match {
            case n: java.lang.Number => n.doubleValue()
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case other => throw new IllegalArgumentException(
              s"graft_bloom_agg $what must be numeric, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg $what must be a literal, got $other")
        }
        BloomAggregate(children(0),
          num(children(1), "expectedItems").toLong, num(children(2), "fpp"))
      }
    ))
    // Iceberg's WRITE ORDERED BY DDL as sugar over the
    // system.set_write_order procedure — a delegating parser (the same
    // pattern Iceberg's extensions use) that rewrites the one custom
    // statement and hands everything else to Spark's parser untouched.
    // The same parser also routes view DDL aimed at a graft catalog to
    // the graft ViewCatalog (GraftViewSupport.rewriteDdl) — Spark 4.1
    // OSS has no analyzer path to a v2 ViewCatalog yet.
    ext.injectParser((session, delegate) => new GraftSqlParser(delegate, Option(session)))
    // Read-side view expansion: `SELECT ... FROM <stored view>`.
    ext.injectResolutionRule(session => ResolveGraftViewRelations(session))
    // Post-analysis guard: stored-view output must still match the
    // captured column names (incompatible base-table change check).
    ext.injectCheckRule(session => GraftViewSchemaCheck(session))
    // Transparent MV query rewrite: a matching GROUP BY aggregate
    // over a base table is answered from its FRESH materialized view
    // (freshness-gated on the scan's pinned snapshot version).
    ext.injectResolutionRule(session => RewriteAggregatesToMv(session))
  }
}

/** Delegating SQL parser adding exactly two statements:
  *   ALTER TABLE <ident> WRITE ORDERED BY (c1, c2, ...)
  *   ALTER TABLE <ident> WRITE UNORDERED
  * rewritten to `CALL [cat.]system.set_write_order(table, cols)` —
  * one code path for the DDL and the procedure spelling. Anything
  * else (including quoted identifiers these regexes don't cover)
  * parses through the delegate, so no existing statement changes
  * meaning.
  */
private[extensions] class GraftSqlParser(
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface,
    session: Option[org.apache.spark.sql.SparkSession] = None
) extends org.apache.spark.sql.catalyst.parser.ParserInterface {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private val WriteOrdered =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+WRITE\s+ORDERED\s+BY\s*\(?\s*([\w.,\s]+?)\s*\)?\s*;?\s*""".r
  private val WriteUnordered =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+WRITE\s+UNORDERED\s*;?\s*""".r
  // SET NOT NULL must bypass Spark's blanket nullable->non-nullable
  // CheckAnalysis refusal — rewritten to the validating procedure
  // (CALL system.set_column_nullability). DROP NOT NULL stays native.
  // Guarded by inGraftCatalog: the statement is valid Spark syntax
  // that another catalog (session catalog, Iceberg) may own — those
  // pass through to the delegate untouched (r19 advice).
  private val SetNotNull =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+NOT\s+NULL\s*;?\s*""".r
  // MATERIALIZED VIEW DDL (graft-only syntax — plain Spark has no
  // MATERIALIZED keyword, so non-graft targets fall through to the
  // delegate's native parse error)
  private val CreateMv =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+(.+?)\s*;?\s*""".r
  private val DropMv =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*""".r
  private val RefreshMv =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*;?\s*""".r

  /** Does `ident` resolve to a graft catalog in this session? (The
    * rewrite guard — statements owned by other catalogs keep their
    * native paths.)
    */
  private def graftTarget(ident: String)
      : Option[(graft.io.GraftCatalog, String, org.apache.spark.sql.connector.catalog.Identifier)] =
    session.flatMap(s => GraftViewSupport.target(s, ident.split('.').toSeq))

  /** Split `cat.ns.t` into the CALL's catalog prefix + table arg: 3+
    * parts name a catalog explicitly; 1-2 parts resolve CALL system.*
    * against the session's current catalog, same as the table
    * reference itself would.
    */
  private def catAndTable(ident: String): (String, String) = {
    val parts = ident.split('.')
    if (parts.length >= 3) (parts.head + ".", parts.tail.mkString("."))
    else ("", parts.mkString("."))
  }

  private def callFor(ident: String, cols: String): String = {
    val (catPrefix, tbl) = catAndTable(ident)
    s"CALL ${catPrefix}system.set_write_order('$tbl', '$cols')"
  }

  private def notNullCallFor(ident: String, column: String): String = {
    val (catPrefix, tbl) = catAndTable(ident)
    s"CALL ${catPrefix}system.set_column_nullability('$tbl', '$column', false)"
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case WriteOrdered(ident, cols) =>
      delegate.parsePlan(callFor(ident, cols.split(',').map(_.trim).filter(_.nonEmpty).mkString(",")))
    case WriteUnordered(ident) => delegate.parsePlan(callFor(ident, ""))
    case SetNotNull(ident, column) if graftTarget(ident).isDefined =>
      delegate.parsePlan(notNullCallFor(ident, column))
    case CreateMv(replace, ifNotExists, ident, query) =>
      require(replace == null || ifNotExists == null,
        "CREATE MATERIALIZED VIEW: OR REPLACE and IF NOT EXISTS cannot be combined")
      graftTarget(ident) match {
        case Some((_, catName, id)) =>
          CreateGraftMvCommand(catName, id, query, replace != null, ifNotExists != null)
        case None => delegate.parsePlan(sqlText)
      }
    case DropMv(ifExists, ident) =>
      graftTarget(ident) match {
        case Some((_, catName, id)) => DropGraftMvCommand(catName, id, ifExists != null)
        case None => delegate.parsePlan(sqlText)
      }
    case RefreshMv(ident) =>
      graftTarget(ident) match {
        case Some((_, catName, id)) =>
          delegate.parsePlan(s"CALL $catName.system.refresh_mv(" +
            s"'${(id.namespace() :+ id.name()).mkString(".")}')")
        case None => delegate.parsePlan(sqlText)
      }
    case _ =>
      val plan = delegate.parsePlan(sqlText)
      // view DDL aimed at a graft catalog routes to the graft
      // ViewCatalog; everything else passes through untouched
      session.fold(plan)(s => GraftViewSupport.rewriteDdl(s, plan))
  }
  override def parseExpression(s: String) = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String) = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String) = delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String) = delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String) = delegate.parseQuery(s)
  override def parseRoutineParam(s: String) = delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String) = delegate.parseTableSchema(s)
  override def parseDataType(s: String) = delegate.parseDataType(s)
}
