package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),  // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),// near dup of 1
    (4L, "completely unrelated text about database systems and query optimization")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under min id") {
    val groups = Dedup.exact(docs).collect()
    assert(groups.length == 3)
    val dup = groups.find(_.getAs[Long]("n_docs") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("dropExactDuplicates keeps min-id representative per content group") {
    val out = Dedup.dropExactDuplicates(docs).select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L, 4L)) // doc 2 is the exact dup of 1
  }

  test("identical texts share identical minhash signatures and band keys") {
    val sigs = Dedup.withLshBands(Dedup.withMinhash(docs), bands = 8, rowsPerBand = 2)
      .select("doc_id", "minhash", "bands").collect().map(r =>
        r.getAs[Long]("doc_id") -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("candidatePairs estimates jaccard 1.0 for identical docs via shared buckets") {
    val cands = Dedup.candidatePairs(
      Dedup.withLshBands(Dedup.withMinhash(docs), bands = 8, rowsPerBand = 2)).collect()
    val exactPair = cands.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(exactPair.isDefined, "identical docs must collide in every band")
    assert(exactPair.get.getAs[Double]("est_jaccard") == 1.0)
  }

  test("nearDuplicates finds exact+near pairs and excludes unrelated docs") {
    val pairs = Dedup.nearDuplicates(docs, threshold = 0.7).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // jaccard of the exact pair is 1.0
    val j = Dedup.nearDuplicates(docs, 0.7).filter($"id_a" === 1L && $"id_b" === 2L)
      .head().getAs[Double]("jaccard")
    assert(math.abs(j - 1.0) < 1e-12)
  }

  test("incrementalNearDups: batch vs stored index only — corpus-corpus and batch-batch pairs excluded") {
    // corpus: docs 1,2 (exact dups of each other) and 4 (unrelated);
    // batch: 10 (near-dup of the 1/2 family), 11 (exact dup of batch
    // 10 — must NOT pair, both are batch), 12 (unrelated)
    val corpus = docs.filter($"doc_id" =!= 3L)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (11L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (12L, "another entirely distinct passage regarding distributed consensus protocols")
    ).toDF("doc_id", "text")
    // index round-trips through the table layer: array<bigint> column
    // through the manifest/commit path
    val wh = java.nio.file.Files.createTempDirectory("graft_sigidx_spec_").toString
    val io = graft.io.TableIO(spark, wh)
    io.overwrite(Dedup.signatureIndex(corpus), "default.sig")
    val out = Dedup.incrementalNearDups(batch, corpus, io.read("default.sig"), threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet
    assert(out.contains((10L, 1L)) && out.contains((10L, 2L)),
      s"batch doc 10 must match both stored dups of its family: $out")
    assert(out.contains((11L, 1L)) && out.contains((11L, 2L)), s"got $out")
    assert(!out.exists(p => p._1 == 12L), s"unrelated batch doc paired: $out")
    assert(!out.exists(p => p._2 == 10L || p._2 == 11L),
      s"batch-batch pair leaked (dup_of must be a corpus doc): $out")
    assert(!out.exists(p => p._1 == 1L || p._1 == 2L || p._1 == 4L),
      s"corpus doc appeared on the batch side: $out")
  }

  test("nearDupClusters collapses transitive chains; singletons keep their own id") {
    // 5~1 is a near-dup of the 1/2/3 family worded so it links through
    // the chain even if some direct pair is below threshold — the
    // cluster must still collapse to min id 1 transitively.
    val five = Seq(
      (5L, "the quick brown fox jumps over the lazy dog near the river bank tonite")
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(docs.unionAll(five), threshold = 0.7)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L && clusters(5L) == 1L)
    assert(clusters(4L) == 4L, "unrelated doc is its own singleton cluster")
    assert(clusters.size == 5, "every document gets a cluster row")
  }

  test("nearDupClusters converges on a diameter-3 chain A~B~C~D (adjacent-only pairs)") {
    // sliding windows over one deterministic random string: adjacent
    // windows overlap 160/180 chars (shingle jaccard ~0.78, above the
    // 0.7 threshold), skip-2 windows ~0.64 (below), so the near-dup
    // graph is exactly the path 10-11-12-13 — min-label propagation
    // needs the full 3-hop chain to collapse it to cluster 10.
    val rnd = new scala.util.Random(7)
    val s = Array.fill(500)(('a' + rnd.nextInt(26)).toChar).mkString
    val chain = Seq(
      (10L, s.substring(0, 180)),
      (11L, s.substring(20, 200)),
      (12L, s.substring(40, 220)),
      (13L, s.substring(60, 240))
    ).toDF("doc_id", "text")
    val pairSet = Dedup.nearDuplicates(chain, threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairSet == Set((10L, 11L), (11L, 12L), (12L, 13L)),
      s"expected the adjacent-only path, got $pairSet")
    val clusters = Dedup.nearDupClusters(chain, threshold = 0.7)
    val byDoc = clusters.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // regression guard for the lineage-truncation fix: a multi-round
    // propagation must NOT compound its plan (it used to double per
    // round — O(2^rounds) analysis/canonicalization on the driver);
    // with per-round localCheckpoints the result's analyzed plan is a
    // bounded join over a leaf, not the unrolled loop
    val planNodes = clusters.queryExecution.analyzed.collect { case n => n }.size
    assert(planNodes < 60,
      s"result plan has $planNodes nodes — propagation lineage is compounding again")
    clusters.unpersist()
    assert(byDoc == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("fuzzyDedupCorpus keeps exactly the min-id representative per near-dup cluster") {
    val five = Seq(
      (5L, "the quick brown fox jumps over the lazy dog near the river bank tonite")
    ).toDF("doc_id", "text")
    val cm = spark.sharedState.cacheManager
    spark.catalog.clearCache()
    val kept = Dedup.fuzzyDedupCorpus(docs.unionAll(five), threshold = 0.7)
    // {1,2,3,5} collapse to cluster 1 (transitively); 4 is a singleton
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(kept.columns.toSeq == Seq("doc_id", "text"), "corpus keeps the input schema")
    // the cluster frame nearDupClusters persists must not outlive the call
    assert(cm.isEmpty, "fuzzyDedupCorpus left a cache entry behind")
  }

  test("releaseOnMaterialize leaves no hidden cache entries; results match the lazy variant") {
    val cm = spark.sharedState.cacheManager
    spark.catalog.clearCache()
    assert(cm.isEmpty)

    // eager variant: the ONLY registered entry is the returned frame
    val mat = Dedup.nearDuplicates(docs, threshold = 0.7, releaseOnMaterialize = true)
    assert(!cm.isEmpty)
    val matPairs = mat.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lazyPairs = Dedup.nearDuplicates(docs, threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(matPairs == lazyPairs)
    spark.catalog.clearCache() // drop the lazy variant's signature cache too
    mat.unpersist()
    assert(cm.isEmpty, "eager nearDuplicates left a hidden cache entry")

    // nearDupClusters uses the eager path: after unpersisting the
    // returned frame the session is cache-clean (no signature cache,
    // no pair set, no label rounds)
    val clusters = Dedup.nearDupClusters(docs, threshold = 0.7)
    clusters.count()
    clusters.unpersist()
    assert(cm.isEmpty, "nearDupClusters left a cache entry behind")
  }

  test("portable minhash: native kernel matches the HOF reference formulation row-for-row") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("band"))
    val native = Dedup.portableMinhashBands(docs).collect().map(r => key(r) -> r.toSeq).toMap
    val ref = Dedup.portableMinhashBandsReference(docs).collect().map(r => key(r) -> r.toSeq).toMap
    assert(native.size == 4 * 8) // 4 docs x 8 bands
    assert(native == ref)
  }

  test("portable minhash: identical docs share every band key; signature values are in-range") {
    val rows = Dedup.portableMinhashBands(docs).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.sortBy(_.getAs[Int]("band")).map(_.getAs[Long]("band_key")).toSeq }
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(1L) != byDoc(4L))
    val P = graft.functions.PortableMinHashBands.P
    assert(rows.forall { r =>
      val a = r.getAs[Long]("sig_a"); val b = r.getAs[Long]("sig_b")
      a >= 0 && a < P && b >= 0 && b < P && r.getAs[Long]("band_key") == a * P + b
    })
  }

  test("simhash: 64-bit packing matches an independent model, on fixtures and real docs") {
    // Independent reimplementation of the bit logic (shares only the
    // xxhash64 primitive with the operator) — pins the per-bit weight
    // sums, the sign rule, and the bit order of the packed long.
    import org.apache.spark.unsafe.types.UTF8String
    def xx(t: String): Long = {
      val u = UTF8String.fromString(t)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    }
    def model(text: String): Long = {
      val bits = new Array[Long](64)
      text.split("\\s+").foreach { t =>
        val h = xx(t)
        var b = 0
        while (b < 64) { bits(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L); b += 1 }
      }
      (0 until 64).map(b => if (bits(b) > 0) 1L << b else 0L).sum
    }
    val fixtures = Seq("a", "a b", "the quick brown fox", "x y z x y z")
    val real = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(20).select("text").as[String].collect().toSeq
    val texts = (fixtures ++ real).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = Dedup.withSimhash(texts.toDF("doc_id", "text"))
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(out(id) == model(t), s"simhash mismatch for doc $id")
    }
  }

  test("portable simhash: 60-bit md5-shingle packing matches an independent model") {
    // Independent reimplementation sharing only java.security md5 with
    // nothing in the operator (which goes through Spark's md5/conv
    // expressions) — pins the 60-bit hash extraction, the per-bit
    // weight sums, the sign rule, and the bit order.
    def md5_60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    def model(text: String): Long = {
      val shingles = (1 to math.max(text.length - 4, 1))
        .map(i => text.slice(i - 1, i - 1 + 5)).distinct
      val bits = new Array[Long](60)
      shingles.foreach { s =>
        val h = md5_60(s)
        var b = 0
        while (b < 60) { bits(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L); b += 1 }
      }
      (0 until 60).map(b => if (bits(b) > 0) 1L << b else 0L).sum
    }
    val fixtures = Seq("abcdef", "a", "the quick brown fox jumps", "x y z x y z")
    val real = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(20).select("text").as[String].collect().toSeq
    val texts = (fixtures ++ real).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = Dedup.portableSimhash(texts.toDF("doc_id", "text"))
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(out(id) == model(t), s"portable simhash mismatch for doc $id")
    }
  }

  test("simhash: identical texts equal; near texts within small hamming distance") {
    val h = Dedup.withSimhash(docs).select("doc_id", "simhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(h(1L) == h(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(3L)) < hamming(h(1L), h(4L)))
    assert(hamming(h(1L), h(3L)) <= 12)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("docKeywords ranks tf DESC, then rarer-in-corpus (df ASC), then token") {
    val docs = Seq(
      (1L, "Apple apple banana kiwi the of to"), // of/to under minLen
      (2L, "banana banana banana the the cat")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.docKeywords(docs, k = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("token"), r.getAs[Long]("tf"), r.getAs[Long]("df"))).toMap
    // doc 1: apple tf=2 wins; tf=1 tie -> kiwi (df 1) beats banana/the
    // (df 2); banana/the tie -> token ASC
    assert(out((1L, 1)) == (("apple", 2L, 1L)), s"${out((1L, 1))}")
    assert(out((1L, 2)) == (("kiwi", 1L, 1L)), s"${out((1L, 2))}")
    assert(out((1L, 3)) == (("banana", 1L, 2L)), s"${out((1L, 3))}")
    assert(out((2L, 1)) == (("banana", 3L, 2L)))
    assert(out((2L, 2)) == (("the", 2L, 2L)))
    assert(out((2L, 3)) == (("cat", 1L, 1L)))
    assert(out.size == 6)
  }

  test("repetitionStats matches hand-computed signals") {
    val docs = Seq(
      (1L, "a a a b"),     // 4 toks, 2 types, trigrams {a a a, a a b} all distinct
      (2L, "x x x x x"),   // 5 toks, 1 type, 3 trigrams all "x x x"
      (3L, "one two")      // too short for trigrams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_types"),
         x.getAs[Double]("type_token_ratio"), x.getAs[Double]("dup_trigram_ratio"),
         x.getAs[Double]("top_token_ratio"))).toMap
    assert(r(1L) == ((4L, 2L, 0.5, 0.0, 0.75)))
    assert(r(2L) == ((5L, 1L, 0.2, 1.0 - 1.0 / 3, 1.0)))
    assert(r(3L) == ((2L, 2L, 1.0, 0.0, 0.5)))
  }

  test("native graft_repstats equals the pure-SQL portable formulation bit for bit (real corpus)") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = TextAnalysis.repetitionStats(docs)
    val portable = docs
      .selectExpr("doc_id", s"${TextAnalysis.repetitionStatsPortableSql("text")} AS s")
      .selectExpr("doc_id", "s.n_tokens AS n_tokens", "s.n_types AS n_types",
        "s.type_token_ratio AS type_token_ratio",
        "s.dup_trigram_ratio AS dup_trigram_ratio",
        "s.top_token_ratio AS top_token_ratio")
    assert(native.exceptAll(portable).isEmpty && portable.exceptAll(native).isEmpty,
      "native and portable repetition signals must agree on every document")
    // empty document edge: no tokens -> all-zero counts, 0.0 ratios
    val empty = Seq((1L, ""), (2L, "   .,; ")).toDF("doc_id", "text")
    val e = TextAnalysis.repetitionStats(empty).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5)))
    assert(e.forall(_ == ((0L, 0L, 0.0, 0.0, 0.0))), e.mkString(","))
    // and the native form stays INSIDE whole-stage codegen, shuffle-free
    native.collect()
    val p = native.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"repstats must stay a shuffle-free projection:\n$p")
    assert(p.linesIterator.exists(l => l.contains("Project") && l.contains("graft_repstats") && l.contains("*(")),
      s"graft_repstats projection must be whole-stage-codegen fused:\n$p")
  }

  test("native graft_simhash equals the HOF formulation in both modes (real corpus)") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    // md5 mode (q14's portable construction, 60 bits): the shingled
    // one-kernel form, the features-array form, and the HOF reference
    // must agree three ways
    val nativeMd5 = Dedup.portableSimhash(docs).select("doc_id", "simhash")
    val arrayMd5 = docs.selectExpr("doc_id",
      s"graft_simhash(${Dedup.shingleSql("text", 5)}, 60, true) AS simhash")
    val hofMd5 = Dedup.simhashHofReference(
      docs.withColumn("hs_", expr(
        s"""transform(${Dedup.shingleSql("text", 5)},
           |  s -> CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT))""".stripMargin)),
      "hs_", 60).select("doc_id", "simhash")
    assert(nativeMd5.exceptAll(hofMd5).isEmpty && hofMd5.exceptAll(nativeMd5).isEmpty,
      "shingled-kernel simhash must equal the HOF reference on every document")
    assert(nativeMd5.exceptAll(arrayMd5).isEmpty && arrayMd5.exceptAll(nativeMd5).isEmpty,
      "shingled-kernel simhash must equal the features-array kernel")
    // xxh mode (whitespace tokens, 64 bits)
    val nativeXxh = Dedup.withSimhash(docs).select("doc_id", "simhash")
    val hofXxh = Dedup.simhashHofReference(
      docs.withColumn("hs_", expr("transform(split(text, '\\\\s+'), t -> xxhash64(t))")),
      "hs_", 64).select("doc_id", "simhash")
    assert(nativeXxh.exceptAll(hofXxh).isEmpty && hofXxh.exceptAll(nativeXxh).isEmpty,
      "xxh-mode simhash must equal the HOF reference on every document")
    // and the native form stays INSIDE whole-stage codegen, shuffle-free
    nativeMd5.collect()
    val p = nativeMd5.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"simhash must stay a shuffle-free projection:\n$p")
    assert(p.linesIterator.exists(l => l.contains("Project") && l.contains("graft_simhash") && l.contains("*(")),
      s"graft_simhash projection must be whole-stage-codegen fused:\n$p")
  }

  test("native graft_textcounts equals the nine-regex-pass formulation bit for bit") {
    // real corpus plus adversarial edges: empty text, whitespace-only,
    // punct-only, marker words at string edges, case sensitivity (\b
    // patterns are case-sensitive: "The" != "the"), digits/underscore
    // gluing (\b word chars: "the1"/"the_x" must NOT match), >4-char
    // words sharing a marker prefix, CJK zh markers with no \b, and
    // every \s class member as a separator
    val corpus = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val edges = Seq(
      (9000001L, ""), (9000002L, " \t\n\f\r "), (9000003L, ".,;:!?"),
      (9000004L, "the"), (9000005L, "the end of the line the"),
      (9000006L, "The THE tHe the1 the_x _the x_the"),
      (9000007L, "theory of and andes to toto und under"),
      (9000008L, "el la de que der die und das le les et une"),
      (9000009L, "的是了 mixed 的the是 ascii"),
      (9000010L, "a1b2 12ab _a_ 9_9 a,b;c:d.e!f?g"),
      (9000011L, "tab\tsep\nnewlinevt\fff\rcr end")
    ).toDF("doc_id", "text")
    val docs = corpus.unionAll(edges)
    val t = col("text")
    val native = docs.select(col("doc_id"), expr("graft_textcounts(text)").as("tc"))
      .select(col("doc_id"), col("tc.n_tok"), col("tc.n_retok"), col("tc.n_punct"),
        col("tc.n_stop"), col("tc.n_nonws"), col("tc.c_en"), col("tc.c_es"),
        col("tc.c_de"), col("tc.c_fr"), col("tc.c_zh"))
    val regex = docs.select(
      col("doc_id"),
      TextAnalysis.tokenCount(t).as("n_tok"),
      TextAnalysis.regexTokenCount(t).as("n_retok"),
      TextAnalysis.punctCount(t).as("n_punct"),
      TextAnalysis.stopwordCount(t).as("n_stop"),
      length(regexp_replace(t, "\\s+", "")).as("n_nonws"),
      TextAnalysis.markerCount(t, TextAnalysis.LangMarkers(0)._2).as("c_en"),
      TextAnalysis.markerCount(t, TextAnalysis.LangMarkers(1)._2).as("c_es"),
      TextAnalysis.markerCount(t, TextAnalysis.LangMarkers(2)._2).as("c_de"),
      TextAnalysis.markerCount(t, TextAnalysis.LangMarkers(3)._2).as("c_fr"),
      TextAnalysis.markerCount(t, TextAnalysis.LangMarkers(4)._2).as("c_zh"))
    assert(native.exceptAll(regex).isEmpty && regex.exceptAll(native).isEmpty,
      "one-pass counters must agree with the regex formulation on every document")
    // and the kernel stays INSIDE whole-stage codegen, shuffle-free
    native.collect()
    val p = native.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"textcounts must stay a shuffle-free projection:\n$p")
    assert(p.linesIterator.exists(l => l.contains("Project") && l.contains("graft_textcounts") && l.contains("*(")),
      s"graft_textcounts projection must be whole-stage-codegen fused:\n$p")
  }

  test("decontaminate drops exactly the corpus docs sharing a word 5-gram with the bench set") {
    // bucket membership is hash-defined — discover a bench id and
    // corpus ids empirically with the same portable bucket
    val ids = spark.range(0, 200).toDF("doc_id")
      .withColumn("b", graft.sampling.Sampling.portableBucket("doc_id", 1000))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("b")).toMap
    val benchId = ids.collectFirst { case (id, b) if b < 50 => id }.get
    val corpusIds = ids.collect { case (id, b) if b >= 50 => id }.toSeq.sorted.take(3)
    val benchText = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (benchId, benchText),                                        // benchmark member
      (corpusIds(0), "beta gamma delta epsilon zeta unrelated"),   // shares the 5-gram -> dirty
      (corpusIds(1), "totally different words with no overlap"),   // clean
      (corpusIds(2), "alpha beta gamma delta unrelated epsilon")   // only 4-gram overlap -> clean
    ).toDF("doc_id", "text")
    val out = graft.text.Contamination.decontaminate(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(corpusIds(1), corpusIds(2)), s"got $out")

    // the bloom pre-filter path is exact by composition — identical
    // result on the same fixture
    val outBloom = graft.text.Contamination.decontaminateBloom(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(outBloom == out, s"bloom path diverged: $outBloom vs $out")
  }

  test("bloom sketch: no false negatives; fpp holds; merge across partitions is sound") {
    import org.apache.spark.sql.functions.{call_function, col, expr, lit}
    val n = 5000
    // many partitions so the aggregate genuinely exercises merge()
    val members = spark.range(0, n).repartition(16)
      .selectExpr("concat('member_', id) AS s")
    val bloomBytes = members
      .select(expr(s"graft_bloom_agg(s, ${n}L, 0.01)")).head().getAs[Array[Byte]](0)
    // every member must probe true — bloom filters cannot false-negative
    val hits = members
      .filter(call_function("graft_bloom_contains", lit(bloomBytes), col("s")))
      .count()
    assert(hits == n, s"false negatives: only $hits of $n members probed true")
    // non-members probe true at ~fpp; allow generous slack over 0.01
    val fp = spark.range(0, n).selectExpr("concat('other_', id) AS s")
      .filter(call_function("graft_bloom_contains", lit(bloomBytes), col("s")))
      .count()
    assert(fp < n * 0.05, s"false-positive rate ${fp.toDouble / n} far above configured 0.01")
  }

  test("sequencePack assigns contiguous per-shard offsets that wrap at seqLen") {
    val docs = Seq(
      (1L, "a b c"),        // 3 tokens
      (2L, "d e"),          // 2 tokens
      (3L, "f g h i")       // 4 tokens
    ).toDF("doc_id", "text")
    // one shard so the running order is just doc_id; tiny seqLen to force a wrap
    val out = graft.text.Packing.sequencePack(docs, seqLen = 4, shards = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))).toMap
    assert(out(1L) == ((3L, 0L, 0L)))
    assert(out(2L) == ((2L, 0L, 3L))) // starts at token 3 of sequence 0
    assert(out(3L) == ((4L, 1L, 1L))) // starts at token 5 -> sequence 1, offset 1
  }

  test("chunk produces overlapping windows covering the whole document") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val chunks = graft.text.Packing.chunk(docs, size = 200, stride = 150).collect()
      .map(r => r.getAs[Long]("chunk_id") -> r.getAs[String]("chunk")).toMap
    // ceil((520-200)/150) = 3 -> ids 0..3
    assert(chunks.keySet == Set(0L, 1L, 2L, 3L))
    assert(chunks(0L) == text.substring(0, 200))
    assert(chunks(1L) == text.substring(150, 350))
    assert(chunks(3L) == text.substring(450)) // 70-char tail kept
    // consecutive windows overlap by size - stride = 50 chars
    assert(chunks(0L).takeRight(50) == chunks(1L).take(50))
  }

  test("token counts") {
    val df = one("  Hello, world! 42 ")
    val r = df.select(
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.regexTokenCount($"text").as("nre"),
      TextAnalysis.punctCount($"text").as("p")
    ).head()
    assert(r.getAs[Int]("n") == 3)      // \S+ runs: "Hello,", "world!", "42"
    assert(r.getAs[Int]("nre") == 5)    // Hello , world ! 42
    assert(r.getAs[Int]("p") == 2)      // , and !
  }

  test("quality score stays in [0,1] and rewards natural text") {
    val natural = "the cat sat on the mat and looked at the dog with a calm face for a while"
    val junk = "!!!! ???? ;;;; @@@@ #### %%%%"
    val q = Seq((1L, natural), (2L, junk)).toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.qualityScore($"text").as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }

  test("gopherRules: each rule trips on its designed offender and passes clean text") {
    val clean = ("the quick brown fox jumps over a lazy dog and then " * 6).trim // 60 words, stopwords present
    val docs = Seq(
      1L -> clean,
      2L -> "the cat and that dog", // too few words
      3L -> (clean + " " + Seq.fill(30)("a").mkString(" ")), // mean word len < 3
      4L -> (clean + " " + Seq.fill(12)("#").mkString(" ")), // symbol ratio > 0.1
      5L -> (clean.split(' ').map("- " + _).mkString("\n")), // every line a bullet
      6L -> (clean.split(' ').map(_ + "...").mkString("\n")), // every line ends ...
      7L -> (clean + " " + (1 to 25).map(_.toString).mkString(" ")), // alpha words < 80%
      8L -> ("zq " * 60).trim // 60 words, no required stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), "clean text must pass every rule")
    def failsOnly(id: Long, rule: String): Unit = {
      val r = out(id)
      assert(!r.getAs[Boolean](rule), s"doc $id should fail $rule")
      assert(!r.getAs[Boolean]("keep"))
    }
    failsOnly(2L, "r_word_count")
    failsOnly(3L, "r_mean_word_len")
    failsOnly(4L, "r_symbol_ratio")
    failsOnly(5L, "r_bullet_lines")
    failsOnly(6L, "r_ellipsis_lines")
    failsOnly(7L, "r_alpha_words")
    failsOnly(8L, "r_stopwords")
    // integer cross-multiplication boundary: exactly 10% symbols passes
    val ten = ("the of and to with that be have " + "w " * 32).trim // 40 words
    val boundary = Seq(9L -> (ten + " # # # #")).toDF("doc_id", "text") // 44 words, 4 syms
    val b = TextAnalysis.gopherRules(boundary).collect().head
    assert(b.getAs[Boolean]("r_symbol_ratio"), "4 symbols in 44 words is under the 10% line")
  }

  test("langId picks the dominant marker language") {
    val samples = Seq(
      (1L, "the cat and the dog went to the park of the town"),
      (2L, "el gato y la casa de que hablamos en la plaza"),
      (3L, "der Hund und die Katze und das Haus"),
      (4L, "le chat et les chiens et une maison"),
      (5L, "这是一个测试 的 文本 是 很好 了")
    ).toDF("doc_id", "text")
    val out = samples.select($"doc_id", TextAnalysis.langId($"text").as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh"))
  }

  test("topTokens ranks by total frequency with deterministic ties") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"), (3L, "apple")).toDF("doc_id", "text")
    val out = TextAnalysis.topTokens(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("apple", 3L, 2L), ("banana", 2L, 2L)))
  }

  test("fingerprint is case- and punctuation-insensitive") {
    val fp = Seq((1L, "Hello, World!"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("f")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}
