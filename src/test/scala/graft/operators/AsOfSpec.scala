package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("asofBackward: latest at-or-before match within tolerance, ties to max id") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq(
      (100L, 1L, 1000L),  // matches right id 11 (ts 900)
      (101L, 1L, 500L),   // matches right id 10 exactly at its ts
      (102L, 1L, 5000L),  // right 900 too old at tolerance 1000 -> null
      (103L, 2L, 700L)    // no right rows for key 2 -> null
    ).toDF("event_id", "user_id", "tus")
    val right = Seq(
      (10L, 1L, 500L),
      (9L, 1L, 500L),     // same (key, ts): deduped to max id 10
      (11L, 1L, 900L)
    ).toDF("event_id", "user_id", "tus")
    val out = AsOf.asofBackward(left, right, "user_id", "event_id", "tus", 1000L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4))))).toMap
    assert(out(100L).contains((11L, 100L)))
    assert(out(101L).contains((10L, 0L)))   // equal-ts match, dedup kept id 10
    assert(out(102L).isEmpty)
    assert(out(103L).isEmpty)
  }
}
