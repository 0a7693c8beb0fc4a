package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Seconds, Span}

/** The scoped-persist contract (CacheScope): every operator-internal
  * cache is released shortly after the caller's terminal action, in a
  * session that NEVER calls clearCache — a long-lived session composing
  * dedup/similarity operators must not pin executor storage memory.
  *
  * The capture hook records exactly the caches THIS thread's operator
  * registered, so the assertions stay precise even though the session
  * is shared with concurrently-running suites. */
class CacheLifecycleSpec extends SparkSpec with Eventually {
  private val dir = "/root/testdata/sf0.001"

  private def releasedAfterAction(name: String, build: () => DataFrame): Unit =
    test(s"$name releases its internal caches after one action, no clearCache") {
      val mine = new java.util.ArrayList[DataFrame]()
      CacheScope.capture.set(mine)
      val df = try build() finally CacheScope.capture.remove()
      df.count() // the caller's terminal action
      assert(mine.size > 0, "operator registered no scoped caches")
      // the release rides the async listener bus — poll briefly
      eventually(timeout(Span(30, Seconds))) {
        import scala.jdk.CollectionConverters._
        mine.asScala.foreach(d =>
          assert(d.storageLevel == StorageLevel.NONE,
            s"$name left an internal cache persisted"))
      }
    }

  test("a cache registered while another action is mid-flight survives that action") {
    import spark.implicits._
    // a deliberately slow action on another thread (sleep rides inside
    // the task, so the action is genuinely running when we register)
    val slow = spark.range(0, 4, 1, 4)
      .mapPartitions { it => Thread.sleep(4000); it }
    val t = new Thread(() => slow.count())
    t.start()
    Thread.sleep(1500) // the slow action is definitely mid-flight now
    val mine = CacheScope.cached(spark.range(64).toDF)
    t.join()
    // let the slow action's completion event drain through the bus: it
    // started BEFORE the registration, so it must NOT claim the cache
    org.apache.spark.sql.GraftShim.drainListenerBus(spark)
    assert(mine.storageLevel != StorageLevel.NONE,
      "an action already running at registration time released the fresh cache")
    mine.count() // the owner's terminal action releases it
    eventually(timeout(Span(30, Seconds))) {
      assert(mine.storageLevel == StorageLevel.NONE)
    }
  }

  releasedAfterAction("ngramJaccard", () => Dedup.ngramJaccard(spark, dir))
  releasedAfterAction("ngramJaccardPrefix", () => Dedup.ngramJaccardPrefix(spark, dir))
  releasedAfterAction("minhashNearDup", () => Dedup.minhashNearDup(spark, dir))
  releasedAfterAction("embeddingNearDup", () => Dedup.embeddingNearDup(spark, dir))
  releasedAfterAction("ingestDedup", () => Dedup.ingestDedup(spark, dir))
  // the corpus entry is a persisted salted stage since round 6 (a warm
  // call reads parquet, no caches) — the cache contract lives in the
  // Df-in variant the build and CurateDag compose
  releasedAfterAction("nearDupClustersDf", () =>
    Dedup.nearDupClustersDf(Tables.documents(spark, dir),
      Dedup.minhashNearDupDf(Tables.documents(spark, dir))))
  releasedAfterAction("lshTopK", () => Similarity.lshTopK(spark, dir))
  releasedAfterAction("bigramFluency", () => TextAnalysis.bigramFluency(spark, dir))
  releasedAfterAction("mixturePlan", () => Curation.mixturePlan(spark, dir))
  releasedAfterAction("verbatimOverlap", () => Dedup.verbatimOverlap(spark, dir))
  releasedAfterAction("semDedup", () => Dedup.semDedup(spark, dir))
  releasedAfterAction("winnowOverlap", () => TextAnalysis.winnowOverlap(spark, dir))
}
