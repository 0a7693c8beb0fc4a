package graft

import org.apache.spark.sql.DataFrame

/** Per-round state handling for the fixed-round graph recurrences
  * (q126 PageRank, q178 personalized PageRank, q131 BFS, q163 label
  * propagation).
  *
  * Default (`Lazy`) keeps each recurrence ONE lazy plan: rounds are
  * registered with CacheScope (released after the caller's terminal
  * action) and no driver barrier exists between rounds — the cheapest
  * shape when executors are stable, and the one the benchmarks run.
  *
  * At real cluster scale a 5+-round recurrence has a reliability cost
  * the lazy shape hides: the lineage is 5 shuffle stages deep, so ONE
  * lost executor late in the job can cascade a re-execution of the
  * whole recurrence prefix (shuffle data for early rounds may already
  * be gone), and lineage depth grows linearly with rounds for
  * convergence-style variants. The knob trades a per-round driver
  * barrier for a truncated lineage:
  *
  *  - `LocalCk`: eager `localCheckpoint` per round — blocks stored on
  *    executors (MEMORY_AND_DISK), lineage cut. Survives stage retry
  *    storms but NOT executor loss (a lost block is unrecoverable, the
  *    job fails fast and cleanly instead of recomputing the world).
  *    The right default on a healthy dedicated cluster.
  *  - `ReliableCk`: eager `checkpoint` per round — state written to
  *    the configured checkpoint directory (HDFS/object store).
  *    Survives executor loss; costs one distributed write per round.
  *    The right mode for spot/preemptible fleets. Requires
  *    `SparkContext.setCheckpointDir`.
  *
  * Engage via `Recurrence.mode`. Results are value-identical in every
  * mode (RecurrenceSpec pins pageRank and labelProp across all three);
  * only fault-tolerance and per-round scheduling change.
  */
object Recurrence {
  sealed trait Mode
  /** One lazy plan, CacheScope-scoped per-round persists (default). */
  case object Lazy extends Mode
  /** Eager localCheckpoint per round: lineage cut, executor-local. */
  case object LocalCk extends Mode
  /** Eager reliable checkpoint per round: lineage cut, survives
    * executor loss. Needs a checkpoint dir.
    *
    * Storage lifecycle: each round writes one checkpoint to the
    * configured directory and Spark does NOT delete it by default —
    * ContextCleaner only reclaims reliable checkpoint files when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` is set
    * (and then only once the round's RDD is garbage-collected), so a
    * long-lived session running many recurrences in this mode MUST
    * either set that conf or point the checkpoint dir at
    * job-scoped/TTL'd storage it deletes afterwards. Without one of
    * those, checkpoint storage grows by rounds × recurrences
    * unboundedly. */
  case object ReliableCk extends Mode

  @volatile var mode: Mode = Lazy

  /** Close one recurrence round over `df` under the active mode.
    * Checkpointed rounds are NOT CacheScope-registered: unpersisting a
    * locally-checkpointed plan would destroy its only copy — their
    * blocks are instead reclaimed by the ContextCleaner once the RDD
    * is unreferenced. */
  def round(df: DataFrame): DataFrame = mode match {
    case Lazy       => CacheScope.cached(df)
    case LocalCk    => df.localCheckpoint(true)
    case ReliableCk => df.checkpoint(true)
  }
}
