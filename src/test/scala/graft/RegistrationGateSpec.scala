package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registration gate: NO query may ship unchecked-by-omission.
  *
  * Round 6 registered q187-q189 in `SparkEntry.queries` with no oracle
  * entry and no spec — they ran and benched for a full round without a
  * single value ever being checked. This spec makes that state a test
  * failure: every registered query must either have a DuckDB oracle
  * (the driver's rows+schema+hash gate) or an explicit `rowsOnly`
  * annotation naming WHY it is not oracle-expressible and WHICH spec
  * bounds it instead. Pure set algebra — no Spark session needed, so
  * the gate costs nothing and can never be skipped for being slow.
  */
class RegistrationGateSpec extends AnyFunSuite {

  test("every registered query has an oracle or an explicit rows-only annotation") {
    val registered = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val annotated = SparkEntry.rowsOnly.keySet

    val unchecked = registered -- oracled -- annotated
    assert(unchecked.isEmpty,
      s"registered with NEITHER oracle NOR rows-only annotation " +
        s"(the r6 q187-q189 drift): ${unchecked.toSeq.sorted.mkString(", ")}")

    // annotations are claims about the oracle map — keep them honest
    val both = oracled intersect annotated
    assert(both.isEmpty,
      s"annotated rows-only but ALSO oracle-backed (stale annotation): " +
        both.toSeq.sorted.mkString(", "))
    val phantom = (oracled ++ annotated) -- registered
    assert(phantom.isEmpty,
      s"oracle/annotation for unregistered query: " +
        phantom.toSeq.sorted.mkString(", "))
  }

  test("every rows-only reason names the spec that bounds it") {
    SparkEntry.rowsOnly.foreach { case (q, reason) =>
      assert(reason.toLowerCase.contains("spec"),
        s"$q rows-only reason must name its bounding spec: '$reason'")
    }
  }
}
