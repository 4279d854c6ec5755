package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Signed-random-projection (SRP) signature for cosine LSH: bit j of the
  * 64-bit signature is the sign of the dot product between the vector and
  * the j-th pseudo-random ±1 hyperplane. Two vectors' signature hamming
  * distance estimates their angle (P[bit differs] = θ/π), so banding the
  * signature blocks cosine-near vectors together — the embedding-space
  * analogue of SimHash.
  *
  * Hyperplanes are derived deterministically, one xxhash64 per vector
  * component: bit j of XXH64(i, seed=42) is the sign of component i in
  * hyperplane j. No RNG state, no hyperplane materialization, identical
  * signatures on any executor/partitioning.
  *
  * Exposed as a codegen'd StaticInvoke (like the deflate codec): the loop
  * is a plain JVM method call inside whole-stage codegen, no UDF.
  */
object GraftVecOps {
  def srpSign(v: ArrayData): Long = srpSignSeeded(v, 42L)

  /** Seeded variant: an independent hyperplane set per seed, so stacking
    * `srpSignSeeded(v, seed + w)` for w = 0..words-1 yields a 64·words-bit
    * signature — the lever that lets band width exceed 64/bands bits (see
    * [[graft.operators.Ann.srpPairs]] on why wide bands are what make SRP
    * candidate volume controllable at scale).
    */
  def srpSignSeeded(v: ArrayData, seed: Long): Long = {
    val dim = v.numElements()
    val acc = new Array[Double](64)
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      val h = XXH64.hashLong(i.toLong, seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += x else acc(j) -= x
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

object SrpFunctions {
  /** 64-bit SRP signature of a float-vector column. */
  def srpSign(vec: Column): Column = srpSign(vec, 42L)

  /** 64-bit SRP signature from the hyperplane set derived from `seed`. */
  def srpSign(vec: Column, seed: Long): Column =
    ExpressionUtils.column(StaticInvoke(
      GraftVecOps.getClass, LongType, "srpSignSeeded",
      Seq(ExpressionUtils.expression(vec),
        org.apache.spark.sql.catalyst.expressions.Literal(seed)),
      Seq(ArrayType(FloatType), LongType)))
}
