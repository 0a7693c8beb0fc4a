package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the left
  * (fact) side, a plain shuffle join lands that whole key on one task.
  * AQE's skew-join split handles the sort-merge case at runtime, but
  * salting remains the explicit fix when the skewed side must
  * co-partition with downstream keyed work or when AQE can't split (the
  * skewed partition is a single huge key).
  *
  * Mechanics: the left side gets a uniform salt in [0, salts); the
  * right side is replicated `salts`× with every salt value; the join
  * key becomes (key, salt). Row multiplicity is unchanged — each left
  * row matches exactly the one replica carrying its salt — so the
  * result equals the unsalted inner join (asserted in SkewJoinSpec).
  * Cost: right side shuffles salts× its size; use for moderate right
  * sides that are too big to broadcast.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, with the left
    * side's hot keys spread over `salts` buckets. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic uniform salt from a second-level hash of arbitrary
    // per-row columns — monotonically_increasing_id would also do, but a
    // content hash keeps the join reproducible run-to-run
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val r = right.withColumnRenamed(key, "__rkey")
      .withColumn("__rsalt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, col("__salt") === col("__rsalt") && col(key) === col("__rkey"), "inner")
      .drop("__salt", "__rsalt", "__rkey")
  }

  /** Top skewed keys of `df` on `key`: (key value, row count) above
    * `threshold` — the input you'd use to salt only the hot keys. */
  def skewProfile(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .orderBy(col("n").desc, col(key))
}
