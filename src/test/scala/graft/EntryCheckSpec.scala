package graft
class EntryCheckSpec extends SparkSpec {
  test("driver smoke: entry returns rows at sf0.001") {
    val n = SparkEntry.entry(spark).count()
    info(s"entry rows: $n")
    assert(n > 0)
  }
}
