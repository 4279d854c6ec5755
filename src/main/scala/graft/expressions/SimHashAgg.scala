package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** SimHash fingerprint aggregate: folds a stream of 64-bit token hashes
  * into the 64 per-bit vote counters and emits the fingerprint long
  * (bit j set iff the +1/-1 votes on bit j sum positive).
  *
  * Replaces the declarative 64-column form — 64 separate
  * `sum(when(bit, 1).otherwise(-1))` aggregates — which, like the wide
  * MinHash signature ([[MinHashAgg]]), makes every plan stage pay
  * per-column planning/codegen costs that dwarf the per-row arithmetic.
  * One `long` column flows through the plan instead of 64.
  *
  * Vote semantics are identical to the declarative form (spec-verified):
  * fingerprints are interchangeable.
  *
  * Buffer = 64 long counters; an all-null group evaluates to fingerprint
  * 0L (every vote sum is 0, no bit set), matching `sum` over empty = null
  * → no bit set in the declarative form.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_fp"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

object SimHashAggFunctions {
  /** 64-bit SimHash fingerprint of a group of 64-bit token hashes. */
  def simhashFp(h: Column): Column =
    ExpressionUtils.column(
      SimHashAgg(ExpressionUtils.expression(h)).toAggregateExpression())
}
