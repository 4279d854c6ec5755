package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Count-min sketch aggregate (Cormode & Muthukrishnan '05) over a stream
  * of 64-bit keys: `depth` hash rows × `width` counters, flattened to one
  * `array<long>` of depth·width cells. State is FIXED-SIZE no matter the
  * key cardinality — the whole corpus folds into one mergeable buffer per
  * partition and one tiny row at the driver, where a full groupBy would
  * shuffle every distinct key.
  *
  * Estimates never underestimate (each cell only ever adds), which is the
  * property the two-pass heavy-hitter plan rides: a candidate filter on
  * the sketch keeps a SUPERSET of the true heavy keys, and an exact count
  * of only those rows reproduces the exact answer.
  *
  * Row i's bucket for key k replicates Spark's own `xxhash64(k, i)`
  * exactly — `XXH64.hashInt(i, XXH64.hashLong(k, 42))`, same discipline
  * as [[MinHashAgg]] — so the per-row estimate is expressible as a plain
  * codegen'd Column (`element_at(sketch, i·width + pmod(xxhash64(k, i),
  * width) + 1)`) against the broadcast sketch.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  // update() reads the key as a raw Long — declare it so a non-bigint
  // argument to SQL count_min_sketch_flat fails at ANALYSIS instead of a
  // ClassCastException on executors mid-job; ImplicitCastInputTypes (not
  // bare ExpectsInputTypes, which only validates) widens int/short keys.
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var i = 0
      while (i < depth) {
        val idx = i * width + java.lang.Math.floorMod(XXH64.hashInt(i, h1), width)
        buf(idx) += 1
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  // matches the registered SQL identifier — Spark's built-in
  // `count_min_sketch` emits a different (binary) format, so plans and
  // error messages must not suggest that name
  override def prettyName: String = "count_min_sketch_flat"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAggFunctions {
  /** depth×width count-min sketch of a long key column, flattened row-major
    * to array<long>.
    */
  def countMinSketch(key: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CountMinAgg(ExpressionUtils.expression(key), depth, width)
        .toAggregateExpression())
}
