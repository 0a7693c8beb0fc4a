package graft

/** The gate-visible bounds checker must agree with the suite's own
  * bound specs: every rowsOnly query passes its documented bound at
  * sf0.001, and the checker covers EXACTLY the rowsOnly registry (a
  * new rows-only query without a bounds check would ship grey at the
  * gate again — the gap this checker exists to close). */
class RowsOnlyBoundsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("bounds checker covers exactly the rowsOnly registry and all pass") {
    val results = RowsOnlyBounds.check(spark, d)
    assert(results.map(_._1).toSet == SparkEntry.rowsOnly.keySet,
      s"checker coverage ${results.map(_._1).toSet} != rowsOnly ${SparkEntry.rowsOnly.keySet}")
    val failed = results.filterNot(_._2)
    assert(failed.isEmpty,
      failed.map { case (n, _, m) => s"$n: $m" }.mkString("; "))
  }
}
