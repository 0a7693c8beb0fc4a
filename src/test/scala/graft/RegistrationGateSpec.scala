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

  test("every /** qNNN: */ tagged function is registered") {
    // Round 7's drift was the mirror image of round 6's: q211/q212 were
    // IMPLEMENTED (full scaladoc-tagged functions in Queries.scala) but
    // never registered, so the set-algebra gate above could not see
    // them and they sat as dead, unchecked code for a full round. This
    // closes that side: every `/** qNNN:` doc tag in src/main must
    // correspond to a registered query key.
    def scalaFiles(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) scalaFiles(f)
        else if (f.getName.endsWith(".scala")) Seq(f) else Nil
      }
    val tagRe = """/\*\* (q\d+):""".r
    val tagged = scalaFiles(new java.io.File("src/main/scala/graft"))
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try tagRe.findAllMatchIn(src.mkString).map(_.group(1)).toList
        finally src.close()
      }.toSet
    assert(tagged.nonEmpty, "tag scan found nothing — wrong working dir?")
    val registeredNums = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    val orphans = tagged -- registeredNums
    assert(orphans.isEmpty,
      s"implemented-but-unregistered (the r7 q211/q212 drift): " +
        orphans.toSeq.sorted.mkString(", "))
  }

  test("per-family oracle maps are key-disjoint") {
    // oracleSql is a ++ of 8 per-family maps; a duplicate key across
    // files would silently let the later map win. Disjointness holds
    // iff the size of the concatenation equals the sum of the parts.
    val parts = Seq(
      "OracleCore" -> oracles.OracleCore.sql,
      "OracleStats" -> oracles.OracleStats.sql,
      "OracleDedup" -> oracles.OracleDedup.sql,
      "OracleSim" -> oracles.OracleSim.sql,
      "OracleText" -> oracles.OracleText.sql,
      "OracleCuration" -> oracles.OracleCuration.sql,
      "OracleGraph" -> oracles.OracleGraph.sql,
      "OracleMultiOps" -> oracles.OracleMultiOps.sql,
    )
    val sum = parts.map(_._2.size).sum
    if (sum != SparkEntry.oracleSql.size) {
      val dupes = parts.flatMap { case (n, m) => m.keys.map(_ -> n) }
        .groupBy(_._1).filter(_._2.size > 1)
        .map { case (k, fs) => s"$k in ${fs.map(_._2).mkString("+")}" }
      fail(s"oracle key duplicated across family files: ${dupes.mkString(", ")}")
    }
  }

  test("every rows-only reason names the spec that bounds it") {
    SparkEntry.rowsOnly.foreach { case (q, reason) =>
      assert(reason.toLowerCase.contains("spec"),
        s"$q rows-only reason must name its bounding spec: '$reason'")
    }
  }
}
