package graft

import org.apache.spark.sql.functions._

/** PairProductSumAgg must equal the declarative plan it replaces —
  * FloatVecPairProducts → posexplode → sum(cast(p as decimal(38,12))) —
  * EXACTLY (same decimal values), across magnitudes, signs, partition
  * orders, and the oversized-product slow path.
  */
class GraftPairProductSumSpec extends SparkSpec {

  // try_cast = the ANSI-safe overflow-to-null cast the aggregate mirrors
  // (identical to cast for every in-range product)
  private def declarative(df: org.apache.spark.sql.DataFrame, dims: Int) =
    df.filter(size(col("v")) === dims)
      .select(org.apache.spark.sql.graft.GraftExpressions
        .floatVecPairProducts(col("v")).as("pp"))
      .select(posexplode(col("pp")).as(Seq("pidx", "p")))
      .groupBy("pidx")
      .agg(sum(expr("try_cast(p as decimal(38,12))")).as("sp"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap

  private def agg(df: org.apache.spark.sql.DataFrame, dims: Int) =
    df.filter(size(col("v")) === dims)
      .agg(org.apache.spark.sql.graft.PairProductSumFunctions
        .pairProductSums(col("v"), dims).as("arr"))
      .select(posexplode(col("arr")).as(Seq("pidx", "sp")))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap

  test("matches the declarative decimal sum exactly on random vectors") {
    val spark0 = spark
    import spark0.implicits._
    val rng = new scala.util.Random(11)
    val dims = 8
    val rows = (0 until 4000).map { _ =>
      Tuple1(Array.fill(dims)((rng.nextGaussian() * 10).toFloat))
    }
    val df = rows.toDF("v").repartition(7) // exercise partial merges
    val want = declarative(df, dims)
    val got = agg(df, dims)
    assert(got.keySet === want.keySet && got.keySet.size === dims * (dims - 1) / 2)
    for (k <- want.keySet)
      assert(got(k) === want(k), s"pidx $k: got ${got(k)} want ${want(k)}")
  }

  test("oversized products take the split slow path and stay exact") {
    val spark0 = spark
    import spark0.implicits._
    // products ~1e7..1e8 exceed the 62-bit scaled fast path
    val rows = Seq(
      Tuple1(Array(31623.5f, -9876.25f, 40000.0f)),
      Tuple1(Array(-20000.125f, 30001.75f, 9999.5f)),
      Tuple1(Array(0.000123f, 2.5f, -17.75f)))
    val df = rows.toDF("v")
    assert(agg(df, 3) === declarative(df, 3))
  }

  test("Dec12 fast rounding equals BigDecimal across magnitudes and near-ties") {
    def ref(p: Double): Long =
      java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    val rng = new scala.util.Random(23)
    // magnitude sweep: 1e-18 .. ~4e6, both signs
    for (_ <- 0 until 200000) {
      val p = (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(25) - 18) * 2
      if (math.abs(p) < 4.0e6)
        assert(org.apache.spark.sql.graft.Dec12.scaledLong(p) === ref(p), s"p=$p")
    }
    // adversarial: doubles landing as close as possible to k + 0.5 at
    // scale 12 (the guard band), plus exact-representable ties and zeros
    for (_ <- 0 until 50000) {
      val k = rng.nextLong() % 1000000000000000L
      val base = (k + 0.5) / 1e12
      for (ulps <- Seq(-2, -1, 0, 1, 2)) {
        val p = java.lang.Double.longBitsToDouble(
          java.lang.Double.doubleToLongBits(base) + ulps)
        if (!p.isNaN && !p.isInfinite && math.abs(p) < 4.0e6)
          assert(org.apache.spark.sql.graft.Dec12.scaledLong(p) === ref(p), s"p=$p")
      }
    }
    for (p <- Seq(0.0, -0.0, 5e-13, -5e-13, 4.9999999e-13, 1.5e-12,
                  Double.MinPositiveValue, 2048.000000000125, -3999999.9))
      assert(org.apache.spark.sql.graft.Dec12.scaledLong(p) === ref(p), s"p=$p")
  }

  test("huge-magnitude products skip instead of crashing, matching cast-to-null") {
    val spark0 = spark
    import spark0.implicits._
    // pair (0,1): 3e18·2e18 = 6e36 — beyond decimal(38,12)'s null cliff
    // AND the split accumulator's bound; both engines drop it. Pairs
    // (0,2)/(1,2) stay in the representable slow-path range. Pre-fix the
    // 6e36 product threw ArithmeticException in longValueExact.
    val rows = Seq(
      Tuple1(Array(3.0e18f, 2.0e18f, 1.0f)),
      Tuple1(Array(1.5f, 2.5f, 3.5f)),
      Tuple1(Array(Float.MaxValue, Float.MaxValue, 0.25f)))
    val df = rows.toDF("v")
    assert(agg(df, 3) === declarative(df, 3))
  }

  test("magnitude-contract drops are counted, in-range rows are not") {
    val spark0 = spark
    import spark0.implicits._
    val before = org.apache.spark.sql.graft.PairProductSumAgg.droppedProducts
    // clean run: no drops recorded
    agg(Seq(Tuple1(Array(1.5f, -2.5f, 3.0f))).toDF("v"), 3)
    assert(org.apache.spark.sql.graft.PairProductSumAgg.droppedProducts
      === before)
    // the 6e36 pair from the huge-magnitude test drops exactly once per
    // evaluation (pairs (0,2)/(1,2) stay in range)
    agg(Seq(Tuple1(Array(3.0e18f, 2.0e18f, 1.0f))).toDF("v"), 3)
    assert(org.apache.spark.sql.graft.PairProductSumAgg.droppedProducts
      >= before + 1)
  }

  test("null and wrong-width vectors are skipped like the upstream filter") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      Tuple1(Array(1.0f, 2.0f, 3.0f)),
      Tuple1(null.asInstanceOf[Array[Float]]),
      Tuple1(Array(9.0f, 9.0f)),
      Tuple1(Array(0.5f, -0.5f, 4.0f)))
    val df = rows.toDF("v")
    assert(agg(df, 3) === declarative(df, 3))
  }
}
