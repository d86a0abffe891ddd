package graft

import org.apache.spark.sql.functions._
import graft.operators.{PathTree, Reconcile}

class ReconcileSpec extends SparkSuite {
  import spark.implicits._

  test("merkleDiff: identical snapshots produce an empty diff") {
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
      .toDF("pk", "s", "v")
    assert(Reconcile.merkleDiff(a, a, "pk", Seq("s", "v"), buckets = 4).count() === 0L)
  }

  test("merkleDiff: finds exactly the deleted, added, and changed rows") {
    val a = (1L to 200L).map(i => (i, s"s$i", i.toDouble)).toDF("pk", "s", "v")
    val b = a.filter(col("pk") % 7 =!= 3) // delete pk%7==3
      .withColumn("v", when(col("pk") % 11 === 5, col("v") + 1.0).otherwise(col("v")))
      .unionByName( // add re-keyed copies of pk%13==1
        a.filter(col("pk") % 13 === 1).withColumn("pk", col("pk") + 1000L))
    val got = Reconcile.merkleDiff(a, b, "pk", Seq("s", "v"), buckets = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected =
      (1L to 200L).filter(_ % 7 == 3).map(i => (i, "deleted")).toSet ++
      (1L to 200L).filter(i => i % 7 != 3 && i % 11 == 5).map(i => (i, "changed")).toSet ++
      (1L to 200L).filter(_ % 13 == 1).map(i => (i + 1000L, "added")).toSet
    assert(got === expected)
  }

  test("merkleDiff: NULL is distinct from the string 'NULL' and from absence") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("NULL"))).toDF("pk", "s")
    val b = Seq((1L, Some("NULL")), (2L, Option.empty[String])).toDF("pk", "s")
    val got = Reconcile.merkleDiff(a, b, "pk", Seq("s"), buckets = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "changed"), (2L, "changed")))
  }

  test("prefixRollup: hand-computed tree with uneven depths") {
    val df = Seq(
      ("/a/b/c", 1L), ("/a/b/d", 2L), ("/a/e", 4L), ("/f", 8L), ("a/b/c", 16L)
    ).toDF("path", "w")
    val got = PathTree.prefixRollup(df, "path", maxDepth = 3, weightCol = "w")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got((1, "/a")) === (4L, 23L))
    assert(got((1, "/f")) === (1L, 8L))
    assert(got((2, "/a/b")) === (3L, 19L))
    assert(got((2, "/a/e")) === (1L, 4L))
    assert(got((3, "/a/b/c")) === (2L, 17L))
    assert(got((3, "/a/b/d")) === (1L, 2L))
    assert(got.size === 6)
  }

  test("shareOfParent: children sum to 1 under each parent; root shares of total") {
    val df = Seq(
      ("/a/b/c", 1L), ("/a/b/d", 2L), ("/a/e", 4L), ("/f", 8L)
    ).toDF("path", "w")
    val roll = PathTree.prefixRollup(df, "path", maxDepth = 3, weightCol = "w")
    val got = PathTree.shareOfParent(roll).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got((1, "/a")) === ((7L, 15L, 7.0 / 15)))
    assert(got((1, "/f")) === ((8L, 15L, 8.0 / 15)))
    assert(got((2, "/a/b")) === ((3L, 7L, 3.0 / 7)))
    assert(got((2, "/a/e")) === ((4L, 7L, 4.0 / 7)))
    assert(got((3, "/a/b/c")) === ((1L, 3L, 1.0 / 3)))
    // each parent's children shares sum to 1 where the subtree is fully covered
    assert(approxEq(got((3, "/a/b/c"))._3 + got((3, "/a/b/d"))._3, 1.0))
  }

  test("trendingRanks: ranks, deltas, and new entries") {
    val df = Seq(
      // week 1: x=3, y=2, z=1 -> ranks x1 y2 z3
      (1L, "x"), (1L, "x"), (1L, "x"), (1L, "y"), (1L, "y"), (1L, "z"),
      // week 2: y=3, x=1, w=2 -> ranks y1 w2 x3; z disappears, w is new
      (2L, "y"), (2L, "y"), (2L, "y"), (2L, "w"), (2L, "w"), (2L, "x")
    ).toDF("week", "k")
    val got = graft.operators.Profile.trendingRanks(df, "k", "week")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got((1L, "x")) === ((1L, None)))
    assert(got((2L, "y")) === ((1L, Some(2L))))
    assert(got((2L, "x")) === ((3L, Some(1L))))
    assert(got((2L, "w")) === ((2L, None))) // new entry
    assert(!got.contains((2L, "z")))
  }

  test("prefixRollup: deeper-than-maxDepth segments truncate into the ancestor") {
    val df = Seq(("/a/b/c/d/e", 1L), ("/a/b/x", 1L)).toDF("path", "w")
    val got = PathTree.prefixRollup(df, "path", maxDepth = 2, weightCol = "w")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got((2, "/a/b")) === 2L)
    assert(!got.keySet.exists(_._1 > 2))
  }
}
