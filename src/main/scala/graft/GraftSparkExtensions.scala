package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{CountMinAgg, FloatVecCosine, FloatVecL2Sq, GraftVecOps, MinHashAgg, SimHashAgg}
import org.apache.spark.sql.types.IntegerType

/** Spark extension entry point: makes graft's native expressions available
  * to pure-SQL users.
  *
  *   spark.sql.extensions=graft.GraftSparkExtensions
  *
  * or at runtime on a live session: `GraftSparkExtensions.register(spark)`.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSparkExtensions.functions.foreach(ext.injectFunction)
}

object GraftSparkExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[FloatVecCosine].getName, null, name, usage, "")

  /** (identifier, info, builder) triples — the shape both
    * SparkSessionExtensions.injectFunction and FunctionRegistry expect.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_vec_cosine"),
      info("float_vec_cosine",
        "float_vec_cosine(a, b) - cosine similarity of two float vectors"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_vec_cosine takes exactly 2 arguments")
        FloatVecCosine(children.head, children(1))
      }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(h, numPerm) - aggregate: MinHash signature (array<long>) over 64-bit shingle hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "minhash_sig takes exactly 2 arguments")
        MinHashAgg(children.head, intArg(children(1), "numPerm"))
      }),
    (FunctionIdentifier("minhash_band_keys"),
      info("minhash_band_keys",
        "minhash_band_keys(h, numPerm, bands) - aggregate: LSH band keys (array<long>) over 64-bit shingle hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "minhash_band_keys takes exactly 3 arguments")
        MinHashAgg(children.head, intArg(children(1), "numPerm"),
          intArg(children(2), "bands"))
      }),
    (FunctionIdentifier("simhash_fp"),
      info("simhash_fp",
        "simhash_fp(h) - aggregate: 64-bit SimHash fingerprint over 64-bit token hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash_fp takes exactly 1 argument")
        SimHashAgg(children.head)
      }),
    (FunctionIdentifier("hash_bucket"),
      info("hash_bucket",
        "hash_bucket(key) - deterministic uniform 16-bit bucket in [0, 65536) from md5(key); the SQL face of Sampling.hashBucket (hash sampling / splits reproducible on any engine)"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "hash_bucket takes exactly 1 argument")
        import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Md5, Substring}
        import org.apache.spark.sql.types.{IntegerType, StringType}
        Cast(Conv(
          Substring(Md5(Cast(children.head, StringType)),
            Literal(1), Literal(4)),
          Literal(16), Literal(10)), IntegerType)
      }),
    (FunctionIdentifier("float_vec_l2sq"),
      info("float_vec_l2sq",
        "float_vec_l2sq(a, b) - squared euclidean distance of two float vectors"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_vec_l2sq takes exactly 2 arguments")
        FloatVecL2Sq(children.head, children(1))
      }),
    (FunctionIdentifier("count_min_sketch_flat"),
      info("count_min_sketch_flat",
        "count_min_sketch_flat(key, depth, width) - aggregate: depth x width count-min sketch of 64-bit keys, flattened row-major to array<long>; per-key estimate = min over i of sketch[i*width + pmod(xxhash64(key, i), width) + 1]"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "count_min_sketch_flat takes exactly 3 arguments")
        CountMinAgg(children.head, intArg(children(1), "depth"),
          intArg(children(2), "width"))
      }),
    (FunctionIdentifier("srp_sign"),
      info("srp_sign",
        "srp_sign(vec[, seed]) - 64-bit signed-random-projection signature of a float vector; seed selects the hyperplane set (default 42)"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 2,
          "srp_sign takes 1 or 2 arguments")
        val seed = if (children.length == 2) children(1)
          else Literal(42L)
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftVecOps.getClass, org.apache.spark.sql.types.LongType,
          "srpSignSeeded", Seq(children.head, seed),
          Seq(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType),
            org.apache.spark.sql.types.LongType))
      }))

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$name must be an integer literal, got $other")
  }

  /** Registers the functions on an already-built session (extensions
    * normally apply only at session construction).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
