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
  /** One PLAIN lazy plan (default): rounds are not persisted at all.
    * For the single-reference recurrences [[round]] serves, the plan
    * grows linearly with rounds, AQE sees each round's real shuffle
    * size and broadcasts node-sized state into the arc joins, and a
    * lost executor recomputes at most the lineage — measured at sf0.1
    * (round 13), the old per-round CacheScope persist cost 1.5-2× the
    * whole recurrence: the InMemoryRelation hid stage sizes from
    * AQE's broadcast switch (forcing sort-merge over the arc relation
    * every round) and the columnar cache build of node-sized state
    * bought nothing back. Multi-reference recurrences use
    * [[roundCached]], which restores the persist under Lazy. */
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
    case Lazy       => df
    case LocalCk    => df.localCheckpoint(true)
    case ReliableCk => df.checkpoint(true)
  }

  /** [[round]] for recurrences whose round output is referenced MORE
    * THAN ONCE by the next round's plan (q131's settled anti-join +
    * union, q311's neighbor-fold + carry join): without a per-round
    * persist the plan tree doubles per round — 2^rounds inlined copies
    * of round 0 — and the duplicated subtrees execute unless exchange
    * reuse happens to dedupe them. Lazy mode therefore persists
    * (CacheScope-scoped, released after the caller's terminal action);
    * checkpointing modes behave exactly like [[round]]. */
  def roundCached(df: DataFrame): DataFrame = mode match {
    case Lazy => CacheScope.cached(df)
    case m    => round(df)
  }
}
