package graft

/** Pins the harness contract invariants the driver relies on, so a
  * future query addition can't silently regress them:
  *  - every query has a DuckDB oracle (a missing entry downgrades the
  *    driver's check to rows-only without any local failure), and no
  *    oracle is orphaned;
  *  - qNN prefixes are unique (Bench's tail-safe headline keys query
  *    timings by prefix — a duplicate would silently drop a timing);
  *  - names follow the qNN_snake shape the sweep sorts by.
  */
class ContractSpec extends SparkSpec {

  test("queries and oracles are exactly 1:1") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are well-formed and qNN prefixes are unique") {
    val names = SparkEntry.queries.keySet.toSeq
    names.foreach(n => assert(n.matches("q\\d{2,3}_[a-z0-9_]+"), s"bad query name: $n"))
    // the bench headline keys queries by name.split('_').head — the
    // uniqueness check must mirror that exact rule (q10 vs q100 are
    // distinct keys; a duplicate FULL prefix would collide)
    val prefixes = names.map(_.split('_').head)
    val dupes = prefixes.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate qNN prefixes (bench headline would collide): $dupes")
  }

  test("oracle SQL references only harness tables or pure selects") {
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings",
      // DuckDB table FUNCTIONS legitimately sit in FROM position:
      // q24 reads its CSV sidecar, q28's IVF replay generates ranges
      "read_csv", "range")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val froms = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // names not in the harness set must be CTE/alias-local to the query
      // CTE heads, incl. the column-list form `r(s, d) AS (`
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = froms -- known -- ctes
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
