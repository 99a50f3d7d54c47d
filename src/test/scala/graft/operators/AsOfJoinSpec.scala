package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of picks the greatest right time <= left time, with <= visible") {
    val left = Seq((1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 5L, "l5"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 7L, "r7"))
      .toDF("k", "rt", "payload")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "payload")
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("l5") === None)          // nothing at or before 5
    assert(got("l10") === Some("r10"))  // equal timestamp IS visible
    assert(got("l20") === Some("r15"))
  }

  test("equal right timestamps: greatest tie-breaker wins") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 9L, "z"))
      .toDF("k", "rt", "payload")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
      Seq("payload"), "payload").select("payload").collect().head.getString(0)
    assert(got === "b")
  }

  test("keys never mix and unmatched keys yield nulls") {
    val left = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("k", "t")
    val right = Seq((1L, 1L, "one"), (2L, 2L, "two")).toDF("k", "rt", "payload")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "payload")
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(got === Map(1L -> Some("one"), 2L -> Some("two"), 3L -> None))
  }

  test("a NULL right timestamp never matches anything") {
    // SQL semantics: rightTime <= leftTime is NULL for a null
    // timestamp → no match. Unfiltered, the null would sort NULLS
    // FIRST in the window and attach its payload to every left row
    // preceding the first real right row.
    val left = Seq((1L, 3L, "early"), (1L, 20L, "late")).toDF("k", "t", "tag")
    val right = Seq((1L, Option(10L), "real"), (1L, Option.empty[Long], "ghost"))
      .toDF("k", "rt", "payload")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "payload")
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("early") === None, "null-time payload must not leak backward")
    assert(got("late") === Some("real"))
  }

  test("payload fields come atomically from the same right row") {
    // the most recent right row has a NULL in one payload column; that
    // NULL must NOT be back-filled from the older right row
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq(
      (1L, 5L, Option("old_a"), Option("old_b")),
      (1L, 10L, Option("new_a"), Option.empty[String])
    ).toDF("k", "rt", "pa", "pb")
    val row = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
      Seq("pa", "pb"), "rt").select("pa", "pb").collect().head
    assert(row.getString(0) === "new_a")
    assert(row.isNullAt(1), "pb must be the matched row's NULL, not old_b")
  }

  test("tolerance: a stale match nulls out whole, an in-window match survives") {
    val left = Seq((1L, 100L, "fresh"), (1L, 200L, "stale"), (1L, 50L, "none"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 95L, "r95")).toDF("k", "rt", "payload")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "payload", tolerance = Some(10L))
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("fresh") === Some("r95")) // 100 - 95 = 5 <= 10
    assert(got("stale") === None)        // 200 - 95 = 105 > 10
    assert(got("none") === None)         // nothing at or before 50
  }

  test("tolerance at the boundary is inclusive, and payload nulls atomically") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 10L, "p", 7L)).toDF("k", "rt", "payload", "extra")
    // exactly tolerance old: kept
    val kept = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
      Seq("payload", "extra"), "payload", tolerance = Some(10L))
      .select("payload", "extra").collect().head
    assert(kept.getString(0) === "p" && kept.getLong(1) === 7L)
    // one past: BOTH payload fields null together
    val dropped = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
      Seq("payload", "extra"), "payload", tolerance = Some(9L))
      .select("payload", "extra").collect().head
    assert(dropped.isNullAt(0) && dropped.isNullAt(1))
  }

  test("tolerance = None is byte-identical to the unbounded join") {
    val rnd = new scala.util.Random(5)
    val left = (1L to 300L).map(i => (i % 7, rnd.nextInt(1000).toLong, i))
      .toDF("k", "t", "lid")
    val right = (1L to 150L).map(i => (i % 7, rnd.nextInt(1000).toLong, i))
      .toDF("k", "rt", "rid")
    val a = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt", Seq("rid"), "rid")
      .select("lid", "rid")
    val b = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt", Seq("rid"), "rid",
        tolerance = Some(Long.MaxValue))
      .select("lid", "rid")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("forward direction picks the least right time >= left time, >= visible, least tie wins") {
    val left = Seq((1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 16L, "l16"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1L, "r10a"), (1L, 10L, 2L, "r10b"),
        (1L, 15L, 3L, "r15")).toDF("k", "rt", "rid", "payload")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "rid", direction = "forward")
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("l10") === Some("r10a")) // equal timestamp visible; LEAST tie
    assert(got("l16") === None)         // 15 < 16: nothing at or after
    assert(got("l20") === None)
  }

  test("forward matches the naive reversed range-join + top-1 on random data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "rt", "rid")
    val fast = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt", Seq("rid"), "rid",
        direction = "forward")
      .select("lid", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val naive = left.join(right, Seq("k"), "left")
      .filter(col("rt").isNull || col("rt") >= col("t"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lid").orderBy(col("rt").asc_nulls_last, col("rid").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select("lid", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val lids = left.select("lid").collect().map(_.getLong(0))
    assert(fast === lids.map(l => l -> naive.getOrElse(l, None)).toMap)
  }

  test("forward: a NULL left time matches nothing; a NULL tie-breaker loses") {
    // both edges found by the r9 review pass: under __t desc the
    // default NULLS LAST trailed null-time left rows behind every
    // right row (spurious match), and __tie desc_nulls_last let a
    // NULL tie-breaker WIN among equal-timestamp right rows
    val left = Seq((1L, Option(10L), "t10"), (1L, Option.empty[Long], "tnull"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 12L, Option(2L), "r12"), (1L, 12L, Option.empty[Long], "rNull"))
      .toDF("k", "rt", "rid", "payload")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "rid", direction = "forward")
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("tnull") === None)       // NULL >= rt can never hold
    assert(got("t10") === Some("r12"))  // non-null tie-breaker wins
    val nearest = AsOfJoin.nearestAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "rid")
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(nearest("tnull") === None)
    assert(nearest("t10") === Some("r12")) // tie edge holds through nearest too
  }

  test("backward: a NULL tie-breaker loses among equal right timestamps") {
    // the backward twin of the forward null-tie pin: asc_nulls_first
    // scans the null tie FIRST so a real tie is carried over it — a
    // refactor to asc_nulls_last would flip this and diverge from the
    // oracles' NULLS-LAST rank order
    val left = Seq((1L, 15L, "t15")).toDF("k", "t", "tag")
    val right = Seq((1L, 12L, Option(2L), "r12"), (1L, 12L, Option.empty[Long], "rNull"))
      .toDF("k", "rt", "rid", "payload")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "rid")
      .select("tag", "payload").as[(String, String)].collect().toMap
    assert(got("t15") === "r12")
    // a NULL tie-breaker that is the ONLY candidate still matches
    val only = AsOfJoin.leftAsOf(left,
        right.filter($"rid".isNull), Seq("k"), "t", "rt",
        Seq("payload"), "rid")
      .select("tag", "payload").as[(String, String)].collect().toMap
    assert(only("t15") === "rNull")
  }

  test("nearest picks the closest side; an equidistant pair prefers backward") {
    val left = Seq((1L, 10L, "mid"), (1L, 3L, "lo"), (1L, 30L, "hi"))
      .toDF("k", "t", "tag")
    // for t=10: backward at 7 (d=3), forward at 12 (d=2) -> forward;
    // for t=3: nothing behind, forward at 7 (d=4);
    // for t=30: backward at 25 (d=5), forward at 35 (d=5) -> BACKWARD on tie
    val right = Seq((1L, 7L, 1L, "r7"), (1L, 12L, 2L, "r12"),
        (1L, 25L, 3L, "r25"), (1L, 35L, 4L, "r35"))
      .toDF("k", "rt", "rid", "payload")
    val got = AsOfJoin.nearestAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "rid")
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("mid") === Some("r12"))
    assert(got("lo") === Some("r7"))
    assert(got("hi") === Some("r25"))
  }

  test("nearest tolerance nulls a winner farther than the bound") {
    val left = Seq((1L, 10L, "a"), (1L, 100L, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, 13L, 1L, "r13")).toDF("k", "rt", "rid", "payload")
    val got = AsOfJoin.nearestAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "rid", tolerance = Some(5L))
      .select("tag", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("a") === Some("r13")) // d=3 <= 5
    assert(got("b") === None)        // d=87 > 5
  }

  test("nearest matches a naive all-pairs argmin on random data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "rt", "rid")
    val fast = AsOfJoin.nearestAsOf(left, right, Seq("k"), "t", "rt", Seq("rid"), "rid")
      .select("lid", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val naive = left.join(right, Seq("k"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy("lid").orderBy(
          abs(col("rt") - col("t")).asc_nulls_last,
          (col("rt") <= col("t")).desc_nulls_last,
          when(col("rt") <= col("t"), -col("rid")).otherwise(col("rid")).asc_nulls_last)))
      .filter(col("rn") === 1)
      .select("lid", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val lids = left.select("lid").collect().map(_.getLong(0))
    assert(fast === lids.map(l => l -> naive.getOrElse(l, None)).toMap)
  }

  test("nearest plans ONE exchange over the union, not two") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 7L, 1L, "r")).toDF("k", "rt", "rid", "payload")
    val plan = AsOfJoin.nearestAsOf(left, right, Seq("k"), "t", "rt",
        Seq("payload"), "rid").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected one hash exchange, plan:\n$plan")
  }

  test("matches the naive range-join + top-1 on random data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "rt", "rid")
    val fast = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt", Seq("rid"), "rid")
      .select("lid", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val naive = left.join(right, Seq("k"), "left")
      .filter(col("rt").isNull || col("rt") <= col("t"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lid").orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select("lid", "rid").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // naive keeps a left row only when SOME right row for the key passed
    // the filter; rebuild the full map with None for dropped lids
    val lids = left.select("lid").collect().map(_.getLong(0))
    val naiveFull = lids.map(l => l -> naive.getOrElse(l, None)).toMap
    assert(fast === naiveFull)
  }
}
