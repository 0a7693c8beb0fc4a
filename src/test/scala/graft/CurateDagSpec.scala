package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.{CurateDag, Ctx, PbConf}

/** End-to-end curation DAG on sf0.001: the funnel materializes through
  * salted stages, memoizes on re-run, and each stage's output matches
  * the operator-level truth it composes. */
class CurateDagSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("curation DAG runs, memoizes, and the funnel matches the operators") {
    val work = Files.createTempDirectory("curate").toString
    val ctx = Ctx(spark, PbConf(dataRoot = d, workRoot = work))

    val first = CurateDag.run(ctx)
    assert(first == Seq("QualityGate", "Decontaminate", "DedupCanonical",
      "Redact", "Mixture", "Pack", "ChunkManifest", "CurationReport"), first.toString)
    // memoization: everything but the always-rerun report skips
    assert(CurateDag.run(ctx) == Seq("CurationReport"))

    val raw = CurateDag.RawDocs.read(ctx).count()
    val quality = CurateDag.QualityGate.read(ctx)
    val decon = CurateDag.Decontaminate.read(ctx)
    val canon = CurateDag.DedupCanonical.read(ctx)
    val mix = CurateDag.Mixture.read(ctx)
    val pack = CurateDag.Pack.read(ctx)

    // stage 1 equals the q57 keep-set exactly
    val keepExpected = TextAnalysis.corpusFilter(spark, d)
      .filter(col("verdict") === "keep").count()
    assert(quality.count() == keepExpected && keepExpected > 0)

    // monotone funnel, nothing re-enters
    assert(quality.count() >= decon.count() && decon.count() >= canon.count())
    // eval docs never reach the corpus side
    assert(decon.filter(col("doc_id") % 97 === 0).count() == 0)

    // canonical docs are minima of their own near-dup clusters: no two
    // canonical docs may still band-collide at Jaccard >= 0.5
    val residualPairs = Dedup.minhashNearDupDf(canon).count()
    assert(residualPairs == 0, s"$residualPairs residual near-dup pairs")

    // the packed manifest covers exactly the mixture rows, offsets in budget
    assert(pack.count() == mix.count())
    assert(pack.filter(col("off_in_win") >= Curation.WindowBudget).count() == 0)

    // redaction preserves rows and schema (word-salad corpus: no PII
    // patterns, so text is unchanged too — masking is a no-op here)
    val redact = CurateDag.Redact.read(ctx)
    assert(redact.count() == canon.count())
    assert(redact.columns.toSeq == canon.columns.toSeq)

    // the RAG chunk manifest matches the operator recompute over the
    // same redacted input, and covers every canonical document
    val chunks = CurateDag.ChunkManifest.read(ctx)
    val expected = Curation.chunkTokensDf(redact)
    assert(chunks.except(expected).isEmpty && expected.except(chunks).isEmpty)
    assert(chunks.select("doc_id").distinct().count() == canon.count())
  }
}
