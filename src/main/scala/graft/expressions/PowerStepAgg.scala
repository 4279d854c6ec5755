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

/** One POWER-ITERATION step z = Xᵀ(Xw) over float[dims] vectors in a
  * single aggregate expression, bit-compatible with the declarative
  * matvec pair (`posexplode` → per-row `sum(cast(x*w as decimal(38,12)))`
  * → join back → per-dim `sum(cast(x*s as decimal(38,12)))`).
  *
  * Why it exists (r15, guide §1.2 step 1): the declarative form needs the
  * exploded (rid, dim, x) relation TWICE per iteration — which forced a
  * `.persist()` of the explode (single-partition at bench scale, so every
  * iteration's map side was one core) plus two joins and three exchanges
  * per iteration. This aggregate reads each VECTOR row once: the row's
  * own s = Σᵢ dec12(xᵢ·wᵢ) needs no join (it is a function of the row),
  * and the per-dim cells zᵢ += dec12(xᵢ·s) accumulate map-side. One
  * iteration = one exchange-free-scan aggregation; no persist, no
  * explode, no join anywhere.
  *
  * Exactness contract (same discipline as [[PairProductSumAgg]]):
  * every product is rounded to 12 decimals exactly as Spark's
  * double→decimal(38,12) cast does ([[Dec12]] fast path, BigDecimal
  * fallback), per-row s is the decimal sum of its products cast to
  * double via BigDecimal.doubleValue (= Decimal.toDouble), and the z
  * cells accumulate scaled longs in a split 128-bit representation —
  * order-independent, no double drift. Null/NaN/∞ products are skipped
  * exactly where the cast-to-null semantics of the declarative twin
  * skip them; rows whose vector is null or not `dims` wide are skipped
  * exactly like the `size(vec) = dims` filter. A w cell may be NaN — the
  * encoding of the declarative twin's NULL w (its products are null
  * there, NaN here, skipped either way).
  *
  * Output: array[dims] of decimal(38,12); cell i is NULL when no product
  * landed on dim i (the declarative per-dim sum over an all-null group),
  * and the TRAILING element (index dims) is a decimal-encoded count of
  * rows that passed the width gate — 0 distinguishes "no input rows"
  * (declarative: zero groups, empty result) from "rows with all-null
  * cells" (declarative: 64 groups with null sums).
  *
  * Magnitude contract, as [[PairProductSumAgg]]: |product| < 9e24
  * accumulates exactly; beyond that the declarative twin's decimal sum
  * would itself be within 2 digits of its overflow-to-null cliff — such
  * products fail loudly (Math.addExact) rather than diverge silently.
  * Embedding-range inputs (|x| ≲ 1e3) sit ten orders of magnitude away.
  */
case class PowerStepAgg(
    child: Expression,
    w: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(w.nonEmpty, "w must be non-empty")
  private val dims = w.length
  @transient private lazy val wArr = w.toArray
  // buffer layout: per dim (lo, carry, nContrib) at decimal scale 12,
  // then one row-count slot
  private val Unit18 = 1000000000000000000L

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](3 * dims + 1)

  @inline private def addScaled(buf: Array[Long], p: Int, r: Long): Unit = {
    val s = buf(3 * p) + r
    buf(3 * p) = s % Unit18
    buf(3 * p + 1) = Math.addExact(buf(3 * p + 1), s / Unit18)
  }

  /** dec12-round `prod` and add it to cell p; caller guarantees finite. */
  @inline private def addProduct(buf: Array[Long], p: Int, prod: Double): Unit = {
    if (prod > -4.0e6 && prod < 4.0e6) addScaled(buf, p, Dec12.scaledLong(prod))
    else {
      // oversized product: split the scaled value across words; beyond
      // 9e24 the carry would not fit — fail loudly (see scaladoc)
      val ub = java.math.BigDecimal.valueOf(prod)
        .setScale(12, RoundingMode.HALF_UP).unscaledValue()
      val qr = ub.divideAndRemainder(BigInteger.valueOf(Unit18))
      buf(3 * p + 1) = Math.addExact(buf(3 * p + 1), qr(0).longValueExact())
      addScaled(buf, p, qr(1).longValue())
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      if (x.numElements() == dims) {
        buf(3 * dims) += 1
        // pass 1: the row's own s = toDouble(Σ dec12(xᵢ·wᵢ)) — a local
        // split accumulator, no buffer cells involved
        var sLo = 0L
        var sCarry = 0L
        var any = false
        var i = 0
        while (i < dims) {
          if (!x.isNullAt(i)) {
            val prod = x.getFloat(i).toDouble * wArr(i)
            if (!java.lang.Double.isNaN(prod) &&
                !java.lang.Double.isInfinite(prod)) {
              val r =
                if (prod > -4.0e6 && prod < 4.0e6) Dec12.scaledLong(prod)
                else java.math.BigDecimal.valueOf(prod)
                  .setScale(12, RoundingMode.HALF_UP).unscaledValue()
                  .longValueExact() // < 9e24·10¹² would overflow: loud
              val t = sLo + r
              sLo = t % Unit18
              sCarry = Math.addExact(sCarry, t / Unit18)
              any = true
            }
          }
          i += 1
        }
        if (any) {
          val s = new java.math.BigDecimal(
            BigInteger.valueOf(sCarry).multiply(BigInteger.valueOf(Unit18))
              .add(BigInteger.valueOf(sLo)), 12).doubleValue()
          // pass 2: zᵢ += dec12(xᵢ·s)
          i = 0
          while (i < dims) {
            if (!x.isNullAt(i)) {
              val prod = x.getFloat(i).toDouble * s
              if (!java.lang.Double.isNaN(prod) &&
                  !java.lang.Double.isInfinite(prod)) {
                addProduct(buf, i, prod)
                buf(3 * i + 2) += 1
              }
            }
            i += 1
          }
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var p = 0
    while (p < dims) {
      b1(3 * p + 1) = Math.addExact(b1(3 * p + 1), b2(3 * p + 1))
      addScaled(b1, p, b2(3 * p))
      b1(3 * p + 2) += b2(3 * p + 2)
      p += 1
    }
    b1(3 * dims) += b2(3 * dims)
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](dims + 1)
    var p = 0
    while (p < dims) {
      out(p) =
        if (buf(3 * p + 2) == 0L) null
        else {
          val total = BigInteger.valueOf(buf(3 * p + 1))
            .multiply(BigInteger.valueOf(Unit18))
            .add(BigInteger.valueOf(buf(3 * p)))
          Decimal(
            scala.math.BigDecimal(new java.math.BigDecimal(total, 12)), 38, 12)
        }
      p += 1
    }
    out(dims) = Decimal(scala.math.BigDecimal(buf(3 * dims)), 38, 12)
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(3 * dims + 1)(bb.getLong)
  }

  override def dataType: DataType =
    ArrayType(DecimalType(38, 12), containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "power_step"

  override def withNewMutableAggBufferOffset(newOffset: Int): PowerStepAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PowerStepAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PowerStepAgg =
    copy(child = newChild)
}

object PowerStepFunctions {
  /** z = Xᵀ(Xw) plus a trailing contributing-row count — see
    * [[PowerStepAgg]].
    */
  def powerStep(vec: Column, w: Seq[Double]): Column =
    ExpressionUtils.column(
      PowerStepAgg(ExpressionUtils.expression(vec), w)
        .toAggregateExpression())
}
