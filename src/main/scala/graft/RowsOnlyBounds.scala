package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gate-visible bounds for the 5 rows-only queries.
  *
  * The driver's DuckDB oracle cannot hash-match another engine's
  * HLL/CMS sketch bytes, a one-sided Bloom pass, or learned logistic
  * weights, so `SparkEntry.rowsOnly` ships those queries rows-only and
  * their error bounds live in specs (SketchSpec/DedupSpec/
  * CurationSpec). That left the gate's CORRECTNESS row reading
  * `no_oracle` forever — bounded in-suite but grey at the gate.
  *
  * This runs the SAME documented bounds against Spark-side EXACT twins
  * at Verify time and reports machine-readable pass/fail per query
  * (`rowsonly_bounds.json` next to the parquet dumps), closing the
  * last grey rows: an estimator drifting outside its bound now fails
  * at the gate, not only in the suite. The exact twins are computed on
  * the same engine/session — the comparison is estimator-vs-exact, not
  * engine-vs-engine, which is precisely the property an oracle cannot
  * check for these five.
  */
object RowsOnlyBounds {

  /** (query, pass, detail) for every rowsOnly entry. Never throws: a
    * crashing check reports pass=false with the exception message. */
  def check(spark: SparkSession, d: String): Seq[(String, Boolean, String)] = {
    def run(name: String)(body: => (Boolean, String)): (String, Boolean, String) =
      try { val (ok, msg) = body; (name, ok, msg) }
      catch { case e: Throwable =>
        (name, false, e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).take(200))
      }
    Seq(
      run("q37_event_sketches") { q37(spark, d) },
      run("q66_heavy_users") { q66(spark, d) },
      run("q74_user_reach_sketch") { q74(spark, d) },
      run("q90_decon_bloom") { q90(spark, d) },
      run("q96_quality_classifier") { q96(spark, d) },
    )
  }

  /** HLL++ distinct within max(2, 10%) of exact; approx median within
    * 20% of the exact percentile (SketchSpec's bound, RSE ≈ 2.3%
    * at default lgK with generous slack for small groups). */
  private def q37(spark: SparkSession, d: String): (Boolean, String) = {
    val approx = Queries.eventSketches(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val exact = Tables.eventsNs(spark, d)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"),
        expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    if (approx.keySet != exact.keySet || approx.isEmpty)
      return (false, s"keyset mismatch: ${approx.size} vs ${exact.size}")
    val bad = exact.flatMap { case (k, (u, m)) =>
      val (au, am, n) = approx(k)
      if (math.abs(au - u) > math.max(2.0, 0.1 * u))
        Some(s"$k hll $au vs $u")
      else if (math.abs(am - m) > 0.2 * math.max(1.0, math.abs(m)))
        Some(s"$k median $am vs $m")
      else if (n <= 0) Some(s"$k n=$n") else None
    }
    (bad.isEmpty,
      if (bad.isEmpty) s"${exact.size} groups within hll 10% / median 20%"
      else bad.mkString("; ").take(200))
  }

  /** Count-Min one-sidedness at the gate: every user with exact count
    * ≥ 75 MUST appear (a heavy hitter lost by the sketch is the
    * failure CMS's guarantee forbids), and no reported estimate may
    * undercut the exact count. */
  private def q66(spark: SparkSession, d: String): (Boolean, String) = {
    val heavy = Queries.heavyUsers(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Tables.eventsNs(spark, d).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val missed = exact.filter(_._2 >= 75L).keySet.diff(heavy.keySet)
    val under = heavy.filter { case (u, est) => est < exact.getOrElse(u, 0L) }
    val ok = missed.isEmpty && under.isEmpty
    (ok,
      if (ok) s"${heavy.size} flagged; 0 false negatives, 0 undercounts"
      else s"missed heavy: ${missed.take(5)}; undercounts: ${under.take(5)}")
  }

  /** Day-partial HLL union must equal the one-pass sketch EXACTLY
    * (register-wise max is associative — the IVM-critical property),
    * and both within max(2, 10%) of exact. */
  private def q74(spark: SparkSession, d: String): (Boolean, String) = {
    val out = Queries.userReachSketch(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = Tables.eventsNs(spark, d)
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (out.keySet != exact.keySet || out.isEmpty)
      return (false, s"keyset mismatch: ${out.size} vs ${exact.size}")
    val bad = exact.flatMap { case (k, u) =>
      val (nDays, merged, direct) = out(k)
      if (merged != direct) Some(s"$k merged $merged != direct $direct")
      else if (nDays <= 0) Some(s"$k n_days=$nDays")
      else if (math.abs(merged - u) > math.max(2.0, 0.1 * u))
        Some(s"$k est $merged vs exact $u")
      else None
    }
    (bad.isEmpty,
      if (bad.isEmpty) s"${exact.size} groups: partial-union ≡ direct, within 10%"
      else bad.mkString("; ").take(200))
  }

  /** Bloom decontamination is ONE-SIDED: every exactly-contaminated
    * doc must be flagged with at least the exact shingle count; false
    * positives only ADD flags, bounded at 10% + 5 absolute (the
    * DedupSpec bound at 8 bits/item). */
  private def q90(spark: SparkSession, d: String): (Boolean, String) = {
    val exact = Dedup.decontaminate(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.deconBloom(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lost = exact.filter { case (id, n) => bloom.getOrElse(id, -1L) < n }
    val bloatOk = bloom.size <= exact.size + math.max(5, exact.size / 10)
    val ok = lost.isEmpty && bloatOk
    (ok,
      if (ok) s"${exact.size} exact docs all flagged; ${bloom.size - exact.size} extra (fp side)"
      else s"lost/undercounted: ${lost.take(5)}; fp bloat ok=$bloatOk (${bloom.size} vs ${exact.size})")
  }

  /** Learned logistic scores: full corpus scored, probabilities
    * well-formed, reproducible to float-merge tolerance across two
    * fits, and the model separates its own weak labels by > 0.2 mean
    * gap (CurationSpec's recompute bound). */
  private def q96(spark: SparkSession, d: String): (Boolean, String) = {
    val a = Curation.qualityClassifier(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = Curation.qualityClassifier(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nDocs = Tables.documents(spark, d).count()
    if (a.isEmpty || a.length != nDocs)
      return (false, s"scored ${a.length} of $nDocs docs")
    if (a.length != b.length ||
        a.map(t => (t._1, t._2)).toSeq != b.map(t => (t._1, t._2)).toSeq)
      return (false, "two fits disagree on keys/labels")
    val drift = a.zip(b).map { case ((_, _, pa), (_, _, pb)) => math.abs(pa - pb) }.max
    if (drift > 2e-6) return (false, s"fit drift $drift > 2e-6")
    if (!a.forall(t => t._3 >= 0.0 && t._3 <= 1.0))
      return (false, "score outside [0,1]")
    val keep = a.filter(_._2 == 1L).map(_._3)
    val fail = a.filter(_._2 == 0L).map(_._3)
    if (keep.isEmpty || fail.isEmpty) return (false, "degenerate label split")
    val gap = keep.sum / keep.length - fail.sum / fail.length
    (gap > 0.2, f"separation gap $gap%.3f (bound 0.2), drift $drift%.1e")
  }
}
