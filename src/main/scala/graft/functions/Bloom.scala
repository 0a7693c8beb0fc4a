package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** Column wrappers over Spark's OWN bloom-filter expressions — the
  * exact machinery the optimizer injects for runtime join pruning
  * (InjectRuntimeFilter), exposed here as a first-class operator for
  * membership pre-filters (q90 decontamination). Building on the
  * engine's implementation means the probe is codegen and the
  * aggregate is the same mergeable partial Spark trusts for its own
  * filters — no parallel bloom implementation to maintain.
  */
object Bloom {

  /** Mergeable bloom-filter build over a LongType column: map-side
    * partial filters OR-merge at |filter| cost. `numBits` sizes the
    * false-positive rate: at 8 bits/item with the optimal ~6 hashes,
    * FPP = (1−e^{−6/8})^6 ≈ 2.2%; budget ~10 bits/item for ~1%. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftShim.column(new BloomFilterAggregate(GraftShim.expression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Codegen membership probe. `bf` must be CONSTANT (a collected
    * literal or scalar subquery) — Spark's own analysis rule enforces
    * this, which is why the query collects the one-row filter to the
    * driver first (the same shape as a broadcast variable). */
  def mightContain(bf: Column, v: Column): Column =
    GraftShim.column(BloomFilterMightContain(GraftShim.expression(bf),
      GraftShim.expression(v)))
}
