package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** MinHash signature aggregate: folds a stream of 64-bit shingle hashes
  * into `numPerm` permutation minima in ONE aggregate expression.
  *
  * The equivalent declarative form — `numPerm` separate
  * `min(xxhash64(h, i))` aggregate columns — is semantically identical but
  * makes every downstream plan `numPerm` columns wide: analysis, constraint
  * propagation, whole-stage codegen and cache building all pay per-column
  * costs that dominate end-to-end latency for wide signatures (the per-row
  * arithmetic itself is trivial). This typed aggregate keeps one
  * `array<long>` column through the plan and does the same arithmetic in a
  * tight JVM loop (ObjectHashAggregate path, same as collect_list).
  *
  * Hash values replicate Spark's own `xxhash64` exactly:
  * permutation i of shingle hash h = XXH64.hashInt(i, XXH64.hashLong(h, 42))
  * — identical to `xxhash64(col, lit(i))` — so signatures are
  * interchangeable with the declarative formulation (spec-verified).
  *
  * With `bands > 0` the aggregate emits LSH band keys instead: band b =
  * multi-argument-xxhash64 fold over the band's `numPerm / bands`
  * signature rows (seed 42, `hashLong` per row — identical to
  * `xxhash64(m_{b*r}, ..., m_{b*r+r-1})`).
  *
  * Buffer = Array[Long]; absent input (all-null group) yields the
  * Long.MaxValue-filled identity, never null.
  */
case class MinHashAgg(
    child: Expression,
    numPerm: Int,
    bands: Int = 0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numPerm > 0, "numPerm must be positive")
  require(bands == 0 || numPerm % bands == 0,
    s"numPerm ($numPerm) must be a multiple of bands ($bands)")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var i = 0
      while (i < numPerm) {
        val m = XXH64.hashInt(i, h1)
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (bands == 0) new GenericArrayData(buf)
    else {
      val rpb = numPerm / bands
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 42L
        var r = 0
        while (r < rpb) { h = XXH64.hashLong(buf(b * rpb + r), h); r += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (bands == 0) "minhash_sig" else "minhash_band_keys"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAggFunctions {
  /** array<long> MinHash signature of a group of 64-bit shingle hashes. */
  def minhashSig(h: Column, numPerm: Int): Column =
    ExpressionUtils.column(
      MinHashAgg(ExpressionUtils.expression(h), numPerm)
        .toAggregateExpression())

  /** array<long> LSH band keys (one xxhash64 per band) of the signature. */
  def minhashBandKeys(h: Column, numPerm: Int, bands: Int): Column =
    ExpressionUtils.column(
      MinHashAgg(ExpressionUtils.expression(h), numPerm, bands)
        .toAggregateExpression())
}
