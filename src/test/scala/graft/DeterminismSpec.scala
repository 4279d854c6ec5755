package graft

/** Partition-independence: SURVEY §5 claims every inventory result is
  * identical under any partitioning (decimal sums, explicit tie-breaks,
  * fixed fp evaluation order). This spec actually moves the shuffle
  * partition count and compares a representative slice — aggregation,
  * window rank, fp scoring, iterative clustering, percentile, top-k.
  */
class DeterminismSpec extends SparkSpec {

  private val names = Seq("q1_pricing_agg", "percentile_profile",
    "tfidf_top_terms", "corpus_mix", "dedup_clusters", "events_topk_per_user",
    "dedup_embedding_bucketed")

  test("results are identical at 5 and 32 shuffle partitions") {
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Set[String]] =
      names.map { n =>
        n -> SparkEntry.queries(n)(spark, sfDir).collect()
          .map(_.mkString("|")).toSet
      }.toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val at5 = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val at32 = runAll()
      for (n <- names)
        assert(at5(n) == at32(n), s"$n differs across partition counts")
      assert(at5.values.forall(_.nonEmpty))
    } finally spark.conf.set("spark.sql.shuffle.partitions", original)
  }
}
