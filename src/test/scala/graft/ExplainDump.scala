package graft

/** Dev tool: dump formatted plans for eyeball review
  * (`sbt "Test/runMain graft.ExplainDump"`). Not part of the suite. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if args.length < 2 || args(1).r.findFirstIn(name).isDefined) {
      println(s"\n=== $name ===")
      fn(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
