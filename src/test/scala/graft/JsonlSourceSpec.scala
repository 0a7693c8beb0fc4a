package graft

import org.apache.spark.sql.functions._
import graft.sources.JsonlSource

/** JSONL corpus ingest: declared-schema round trip and malformed-line
  * tolerance (the properties that make the reader safe on a crawl). */
class JsonlSourceSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("documents round-trip through gzip JSONL bit-for-bit") {
    val tmp = java.nio.file.Files.createTempDirectory("jsonl").toString
    val docs = Tables.documents(spark, d)
    JsonlSource.writeDocuments(docs, s"$tmp/docs", partitions = 4)
    val back = JsonlSource.readDocuments(spark, s"$tmp/docs")
    assert(back.schema == JsonlSource.documentsSchema)
    val a = docs.collect().map(_.toString).sorted.toSeq
    val b = back.collect().map(_.toString).sorted.toSeq
    assert(b == a && a.nonEmpty)
  }

  test("malformed lines are dropped, valid lines survive") {
    val tmp = java.nio.file.Files.createTempDirectory("jsonl_bad").toString
    val good =
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}"""
    val bad = """{"doc_id": oops not json"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "part-0.json"),
      s"$good\n$bad\n$good\n".getBytes("UTF-8"))
    val got = JsonlSource.readDocuments(spark, tmp)
    assert(got.count() == 2)
    assert(got.select("text").distinct().collect().map(_.getString(0)).toSeq == Seq("hello world"))
  }
}
