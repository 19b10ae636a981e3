package graft.ops

import graft.SparkTestBase

/** Association rules: exact micro metrics, directionality, basket bound. */
class AssociationsSpec extends SparkTestBase {

  test("rules: support/confidence/lift micros, ordered directions, duplicate events collapse") {
    import spark.implicits._
    val ev = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // duplicate (1,x) collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z")
    ).toDF("user_id", "event_type")
    val got = Associations.rules(ev, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // N=3 baskets; n_x=3 n_y=2 n_z=1
    assert(got(("x", "y")) == ((2L, 666666L, 666666L, 1000000L)))
    assert(got(("y", "x")) == ((2L, 666666L, 1000000L, 1000000L)))
    assert(got(("x", "z")) == ((1L, 333333L, 333333L, 1000000L)))
    assert(got(("z", "x")) == ((1L, 333333L, 1000000L, 1000000L)))
    assert(got.size == 4) // y-z never co-occur
  }

  test("rules: minKeys prunes rare pairs; oversized baskets generate no pairs") {
    import spark.implicits._
    val ev = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "p"), (4L, "q"), (4L, "r") // dropped whole at maxBasketSize=2
    ).toDF("user_id", "event_type")
    val pruned = Associations.rules(ev, "user_id", "event_type", minKeys = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned == Set(("x", "y"), ("y", "x")))
    val bounded = Associations.rules(ev, "user_id", "event_type", maxBasketSize = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!bounded.exists { case (a, b) => Set("p", "q", "r")(a) || Set("p", "q", "r")(b) })
    assert(bounded(("x", "y")))
  }
}
