package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the q245/q246 perceptual hashes (SURVEY §7.3):
  * ONE whole-stage-codegen byte loop per payload instead of the
  * relational formulation's per-pixel explode (split → slice →
  * posexplode → two hash-aggs → join), which shuffles |payload| rows
  * per document just to compute a row-local 64-bit value. The
  * relational path remains the spec's independent model; both are
  * pinned value-identical (PerceptualHashSpec) and the DuckDB oracle
  * (which replays the relational arithmetic) is unchanged — the
  * kernels compute the same exact integers.
  *
  * Pixel/sample source is the virtual-decode contract the multimodal
  * family pins everywhere: code points after the 64-char header ARE
  * the payload bytes (the corpus is ASCII, where byte == code point ==
  * what SQL `ascii()`/`ord()` return; non-ASCII payloads take the same
  * code-point reading). Payloads too short for the grid hash to 0 —
  * callers filter on the length contract FIRST, exactly as the
  * relational formulation filtered before exploding.
  *
  * All threshold comparisons go through a 128-bit cross-multiplied
  * compare (`Math.multiplyHigh`) — `bsum·n` and `e·n` are Θ(v·n²),
  * past Long on large payloads, and a silent wrap would flip hash
  * bits only at scale. */
object PerceptualHash {
  /** a·b ≥ c·d for non-negative longs, exact in 128 bits. */
  private def geProd(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(lo1, lo2) >= 0
  }

  /** Code points after the 64-char virtual header, or null if the
    * payload is shorter than `minTail` virtual units. ASCII fast path
    * reads bytes directly. */
  private def pixels(u: UTF8String): Array[Int] = {
    val nb = u.numBytes
    if (u.numChars == nb) { // ASCII
      if (nb < 64) return null
      val out = new Array[Int](nb - 64)
      var i = 64
      while (i < nb) { out(i - 64) = u.getByte(i) & 0xff; i += 1 }
      out
    } else {
      val s = u.toString
      val cps = new scala.collection.mutable.ArrayBuffer[Int](s.length)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); cps += cp; i += Character.charCount(cp)
      }
      if (cps.length < 64) return null
      cps.drop(64).toArray
    }
  }

  /** q245's 64-bit aHash packed as (hi32 << 32) | lo32; 0 when the
    * grid cannot fill (n_pix < 64). Identical arithmetic to the
    * relational form: cell = (64·p) div n_pix, cross-multiplied mean
    * threshold, bit b set iff bsum_b·n_pix ≥ tot·bcnt_b. */
  def ahash64(u: UTF8String): Long = {
    val px = pixels(u)
    if (px == null || px.length < 64) return 0L
    val n = px.length.toLong
    val bsum = new Array[Long](64); val bcnt = new Array[Long](64)
    var p = 0
    while (p < px.length) {
      val blk = ((64L * p) / n).toInt
      bsum(blk) += px(p); bcnt(blk) += 1
      p += 1
    }
    var tot = 0L
    var b = 0
    while (b < 64) { tot += bsum(b); b += 1 }
    var lo = 0L; var hi = 0L
    b = 0
    while (b < 64) {
      if (geProd(bsum(b), n, tot, bcnt(b))) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    (hi << 32) | lo
  }

  /** q246's 32-bit band-energy hash; 0 when under 32 samples.
    * Identical arithmetic to the relational form: s16le signed decode
    * of code-point pairs, band = (32·k) div n_s, energy threshold
    * e_b·n_s ≥ tot·bcnt_b. Band energies are exact Longs
    * (v² ≤ 2³⁰ · n/32 samples — safe to ~8·10⁹ samples per band);
    * the threshold compare is 128-bit. */
  def energyhash32(u: UTF8String): Long = {
    val px = pixels(u)
    if (px == null) return 0L
    val ns = px.length / 2
    if (ns < 32) return 0L
    val e = new Array[Long](32); val bcnt = new Array[Long](32)
    var k = 0
    while (k < ns) {
      val raw = px(2 * k).toLong + 256L * px(2 * k + 1)
      val v = if (raw >= 32768L) raw - 65536L else raw
      val band = ((32L * k) / ns).toInt
      e(band) += v * v; bcnt(band) += 1
      k += 1
    }
    var tot = 0L
    var b = 0
    while (b < 32) { tot += e(b); b += 1 }
    var s = 0L
    b = 0
    while (b < 32) {
      if (geProd(e(b), ns.toLong, tot, bcnt(b))) s |= 1L << b
      b += 1
    }
    s
  }

  /** q281's clipping bar: |sample| ≥ 30000 (~91.6 % of s16 full
    * scale) counts as clipped — the mastering-audit convention. */
  val ClipThreshold = 30000L

  /** q281's per-payload PCM statistics in ONE byte loop:
    * [n_samples, sum_abs, sum_sq, peak_abs, n_clipped] over the same
    * s16le virtual-PCM decode as [[energyhash32]] (identical signed
    * branch). All exact Longs: sum_sq ≤ 2³⁰·n (safe to ~8·10⁹
    * samples per payload), sum_abs ≤ 2¹⁵·n. Payloads under 1 sample
    * return the zero vector; callers filter on the q246 length
    * contract first. */
  def pcmstats(u: UTF8String): Array[Long] = {
    val out = new Array[Long](5)
    val px = pixels(u)
    if (px == null) return out
    val ns = px.length / 2
    var k = 0
    while (k < ns) {
      val raw = px(2 * k).toLong + 256L * px(2 * k + 1)
      val v = if (raw >= 32768L) raw - 65536L else raw
      val a = if (v < 0L) -v else v
      out(1) += a
      out(2) += v * v
      if (a > out(3)) out(3) = a
      if (a >= ClipThreshold) out(4) += 1L
      k += 1
    }
    out(0) = ns.toLong
    out
  }

  /** Boxed-array entry point for codegen (ArrayData result). */
  def pcmstatsData(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(pcmstats(u))
}

/** graft_ahash64(string) → bigint: packed (hi32 << 32 | lo32) aHash. */
case class AHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ahash64"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ahash64 requires STRING, got ${child.dataType.catalogString}")
  protected override def nullSafeEval(input: Any): Any =
    PerceptualHash.ahash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PerceptualHash.ahash64($c)")
  override protected def withNewChildInternal(newChild: Expression): AHash64Expr =
    copy(child = newChild)
}

/** graft_energyhash32(string) → bigint: 32-bit band-energy hash. */
case class EnergyHash32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_energyhash32"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_energyhash32 requires STRING, got ${child.dataType.catalogString}")
  protected override def nullSafeEval(input: Any): Any =
    PerceptualHash.energyhash32(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PerceptualHash.energyhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): EnergyHash32Expr =
    copy(child = newChild)
}

/** graft_pcmstats(string) → array<bigint>: [n_samples, sum_abs,
  * sum_sq, peak_abs, n_clipped] of the virtual-PCM stream — q281's
  * loudness-audit statistics in one codegen'd byte loop. */
case class PcmStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pcmstats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pcmstats requires STRING, got ${child.dataType.catalogString}")
  protected override def nullSafeEval(input: Any): Any =
    PerceptualHash.pcmstatsData(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PerceptualHash.pcmstatsData($c)")
  override protected def withNewChildInternal(newChild: Expression): PcmStatsExpr =
    copy(child = newChild)
}
