package org.apache.spark.sql.graft

import java.math.{BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Exact 12-decimal HALF_UP rounding of a double — the scaled unscaled
  * value of `BigDecimal.valueOf(p).setScale(12, HALF_UP)` — in primitive
  * arithmetic. BigDecimal.valueOf routes through Double.toString
  * (~200 ns + allocations); at d·(d−1)/2 conversions per input row that
  * dominates the covariance pass. The fast path computes the rounding of
  * the EXACT binary value (mantissa · 10¹² via a 128-bit product, then
  * an exact shift) and proves it equals the shortest-repr convention:
  * the two can only disagree when the value lies within half an ulp
  * (= 5·10¹¹ in fraction-field units, independent of scale) of a
  * ···.5·10⁻¹² rounding boundary — inside that guard band it falls back
  * to BigDecimal. Spec-fuzzed against BigDecimal across magnitudes and
  * adversarial near-tie constructions.
  */
object Dec12 {
  private val Ten12 = 1000000000000L
  // half-ulp in fraction-field units (see scaladoc), plus slack
  private val Guard = 500000000002L

  private def slow(p: Double): Long =
    java.math.BigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Caller contract: |p| < 4.0e6 (so the scaled value fits a long). */
  def scaledLong(p: Double): Long = {
    if (p == 0.0) return 0L
    val ap = Math.abs(p)
    val bits = java.lang.Double.doubleToRawLongBits(ap)
    val e2 = ((bits >>> 52) & 0x7FF).toInt
    if (e2 == 0) return slow(p) // subnormal (rounds to 0; keep the convention)
    val sig = (bits & 0x000FFFFFFFFFFFFFL) | (1L << 52)
    val s = 1075 - e2 // ap = sig · 2^−s exactly
    // s < 41 (|p| ≳ 2048): guard band ≥ the whole fraction range; s ≥ 94:
    // |p| < 5e−16 — both rare for covariance inputs, both exact via slow.
    if (s < 41 || s >= 94) return slow(p)
    // T = sig · 10¹² (≤ 93 bits) held as tHi·2⁶⁴ + tLo
    val tLo = sig * Ten12
    val tHi = Math.multiplyHigh(sig, Ten12)
    var intPart = 0L
    var roundUp = false
    if (s < 64) {
      val frac = tLo & ((1L << s) - 1)
      val half = 1L << (s - 1)
      if (Math.abs(frac - half) <= Guard) return slow(p)
      intPart = (tHi << (64 - s)) | (tLo >>> s)
      roundUp = frac >= half
    } else if (s == 64) {
      val d = tLo - java.lang.Long.MIN_VALUE // signed distance from 2⁶³
      if (Math.abs(d) <= Guard) return slow(p)
      intPart = tHi
      roundUp = d >= 0
    } else {
      val sh = s - 64 // 1..29
      // top 64 fraction bits; dropped low bits are covered by the guard
      val f64 = ((tHi & ((1L << sh) - 1)) << (64 - sh)) | (tLo >>> sh)
      val d = f64 - java.lang.Long.MIN_VALUE
      if (Math.abs(d) <= (Guard >>> sh) + 2) return slow(p)
      intPart = tHi >>> sh
      roundUp = d >= 0
    }
    val r = intPart + (if (roundUp) 1L else 0L)
    if (p < 0) -r else r
  }
}

/** Single-pass upper-triangle pair-product sums for covariance: folds a
  * stream of float[dims] vectors into the d·(d−1)/2 running sums
  * Σ xᵢ·xⱼ (i < j) in ONE aggregate expression.
  *
  * The declarative form (FloatVecPairProducts → posexplode → grouped
  * decimal sum) is semantically identical but materializes d·(d−1)/2
  * rows PER INPUT ROW before the map-side combine collapses them — a
  * 2016× row inflation at d = 64 that dominates the covariance entry's
  * wall clock. This aggregate reads each vector once and updates all
  * pair cells in a tight JVM loop (ObjectHashAggregate path).
  *
  * Summation is EXACT and bit-compatible with the declarative plan's
  * `sum(cast(product as decimal(38,12)))`: each product (itself an
  * exact double — float24×float24 < double53 mantissa) is rounded to 12
  * decimals exactly as Spark's double→decimal cast does
  * (`BigDecimal.valueOf(d).setScale(12, HALF_UP)`), and the scaled
  * integers accumulate in a 128-bit split accumulator (low < 10¹⁸ plus
  * a 10¹⁸-unit carry) — order-independent, no double-sum drift. NaN/∞
  * products and null or wrong-width vectors are skipped, matching the
  * cast-to-null / upstream-filter behavior of the declarative plan.
  *
  * Magnitude contract: the split accumulator represents totals up to
  * ~9.2·10³⁶ (carry word · 10¹⁸), slightly inside decimal(38,12)'s own
  * ~10³⁸ overflow-to-null cliff. A single product with |p| ≥ 9·10²⁴ is
  * SKIPPED (its carry alone would not fit a long) — the declarative
  * twin (`sum(try_cast(p as decimal(38,12)))`; the plain cast THROWS
  * under ANSI mode) nulls such products only from 10²⁶, so the band
  * [9·10²⁴, 10²⁶) diverges: declarative keeps them (until its running
  * sum overflows), this aggregate drops them. Any product that large implies
  * float inputs ≥ ~3·10¹² in magnitude, far outside embedding range;
  * the trade is documented rather than paid for with a 3-word cell —
  * and OBSERVABLE: drops count in a trailing buffer slot, surface as a
  * stderr warning at eval and in [[PairProductSumAgg.droppedProducts]],
  * so a run entering the band is seen, not silent.
  * Carry-word accumulation is CHECKED (Math.addExact): a run that does
  * exceed the representable total fails loudly instead of silently
  * wrapping where the declarative plan would have returned null.
  */
case class PairProductSumAgg(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(dims >= 2, "dims must be >= 2")
  private val nPairs = dims * (dims - 1) / 2
  // total(p) = buf(2p+1) · 10¹⁸ + buf(2p), both at decimal scale 12;
  // one trailing slot counts magnitude-contract drops (|p| ≥ 9e24) so a
  // run entering the documented divergence band is OBSERVABLE — logged
  // at eval and mirrored in [[PairProductSumAgg.droppedProducts]] —
  // rather than silent. The slot rides the existing buffer/serde; the
  // output schema (and so the declarative-twin equality) is unchanged.
  private val Unit18 = 1000000000000000000L

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * nPairs + 1)

  @inline private def addScaled(buf: Array[Long], p: Int, r: Long): Unit = {
    // |low| < 1e18 and |r| < 2^62, so the sum stays within a long;
    // div/mod renormalizes to |low| < 1e18 in one step.
    val s = buf(2 * p) + r
    buf(2 * p) = s % Unit18
    buf(2 * p + 1) = Math.addExact(buf(2 * p + 1), s / Unit18)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      if (x.numElements() == dims) {
        var p = 0
        var i = 0
        while (i < dims) {
          val xi = x.getFloat(i).toDouble
          var j = i + 1
          while (j < dims) {
            val prod = xi * x.getFloat(j).toDouble
            if (!java.lang.Double.isNaN(prod) &&
                !java.lang.Double.isInfinite(prod)) {
              if (prod > -4.0e6 && prod < 4.0e6) {
                addScaled(buf, p, Dec12.scaledLong(prod))
              } else if (prod > -9.0e24 && prod < 9.0e24) {
                // oversized product: split the scaled value across words
                // (carry fits a long below the 9e24 magnitude contract)
                val ub = java.math.BigDecimal.valueOf(prod)
                  .setScale(12, RoundingMode.HALF_UP).unscaledValue()
                val qr = ub.divideAndRemainder(BigInteger.valueOf(Unit18))
                buf(2 * p + 1) = Math.addExact(buf(2 * p + 1), qr(0).longValueExact())
                addScaled(buf, p, qr(1).longValue())
              }
              else buf(2 * nPairs) += 1 // |prod| ≥ 9e24: dropped (contract)
            }
            p += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var p = 0
    while (p < nPairs) {
      b1(2 * p + 1) = Math.addExact(b1(2 * p + 1), b2(2 * p + 1))
      addScaled(b1, p, b2(2 * p))
      p += 1
    }
    b1(2 * nPairs) += b2(2 * nPairs)
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(2 * nPairs) > 0) {
      val total = PairProductSumAgg.dropped.addAndGet(buf(2 * nPairs))
      // Rate-limited: eval fires once per output group, and a run deep in
      // the divergence band would otherwise emit one line per group. One
      // line per JVM per 10 s carries the same signal (the line quotes the
      // running per-JVM total, so no information is lost between lines).
      val now = System.nanoTime()
      val last = PairProductSumAgg.lastWarnNanos.get()
      if (now - last > 10_000_000_000L &&
          PairProductSumAgg.lastWarnNanos.compareAndSet(last, now)) {
        System.err.println(s"[pair_product_sums] WARN: ${buf(2 * nPairs)} " +
          "products with |p| >= 9e24 dropped by the magnitude contract " +
          s"(declarative try_cast twin keeps the [9e24, 1e26) band); " +
          s"JVM running total $total")
      }
    }
    val out = new Array[Any](nPairs)
    var p = 0
    while (p < nPairs) {
      val total = BigInteger.valueOf(buf(2 * p + 1))
        .multiply(BigInteger.valueOf(Unit18))
        .add(BigInteger.valueOf(buf(2 * p)))
      out(p) = Decimal(
        scala.math.BigDecimal(new java.math.BigDecimal(total, 12)), 38, 12)
      p += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(2 * nPairs + 1)(bb.getLong)
  }

  override def dataType: DataType =
    ArrayType(DecimalType(38, 12), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pair_product_sums"

  override def withNewMutableAggBufferOffset(newOffset: Int): PairProductSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PairProductSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PairProductSumAgg =
    copy(child = newChild)
}

object PairProductSumAgg {
  /** Per-JVM running total of magnitude-contract drops, fed at group
    * eval (so on a cluster each executor's count lands in ITS log/total;
    * in local mode — and the spec — it is the global count). Zero on any
    * embedding-range workload. DIAGNOSTIC, not a metric: eval can re-run
    * under task retry/speculation, so the value is a monotone UPPER
    * bound on distinct drops — a nonzero reading means the band was
    * entered, the exact count is the per-group buffer slot. (A Spark
    * accumulator would dedup per successful task but cannot be threaded
    * into a Catalyst expression without carrying a SparkContext into
    * plan serialization; the upper-bound tripwire is the honest trade.)
    */
  private[graft] val dropped = new java.util.concurrent.atomic.AtomicLong(0)
  /** Last warn emission (monotonic nanos) — rate-limits the stderr line
    * to one per JVM per 10 s; the line carries the running total.
    */
  private[graft] val lastWarnNanos =
    new java.util.concurrent.atomic.AtomicLong(Long.MinValue / 2)
  def droppedProducts: Long = dropped.get()
}

object PairProductSumFunctions {
  /** array<decimal(38,12)> of the d·(d−1)/2 upper-triangle Σ xᵢ·xⱼ sums
    * (pair index laid out row-major, identical to FloatVecPairProducts).
    */
  def pairProductSums(vec: Column, dims: Int): Column =
    ExpressionUtils.column(
      PairProductSumAgg(ExpressionUtils.expression(vec), dims)
        .toAggregateExpression())
}
