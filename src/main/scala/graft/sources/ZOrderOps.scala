package graft.sources

/** Morton/Z-order curve arithmetic (plain JVM; called from codegen via
  * StaticInvoke — see GraftExpressions.zInterleave).
  */
object ZOrderOps {

  /** Interleaves the low 32 bits of `a` (even positions) and `b` (odd
    * positions) into one 64-bit z-value. Standard bit-spread via parallel
    * prefix masks.
    */
  def interleave(a: Long, b: Long): Long =
    spread(a & 0xffffffffL) | (spread(b & 0xffffffffL) << 1)

  private def spread(v0: Long): Long = {
    var v = v0
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }
}
