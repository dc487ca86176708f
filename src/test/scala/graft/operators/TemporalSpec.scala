package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class TemporalSpec extends AnyFunSuite with SparkTestBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")

  test("asofJoin picks the latest right row at-or-before, equals the naive join, plans no join") {
    import spark.implicits._
    val trades = Seq(
      (1L, "a", ts(10)), // quote at 05 applies
      (2L, "a", ts(20)), // tie: quote exactly at 20 applies (inclusive)
      (3L, "a", ts(2)),  // before any quote -> null
      (4L, "b", ts(30)), // key with one quote
      (5L, "c", ts(30))  // key with no quotes at all -> null
    ).toDF("trade_id", "k", "t")
    val quotes = Seq(
      ("a", ts(5), 100L), ("a", ts(20), 200L), ("a", ts(25), 300L),
      ("b", ts(1), 400L)
    ).toDF("k", "t", "px")

    val got = Temporal.asofJoin(trades, quotes, "k", "t", "t", "px")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Timestamp])))).toMap
    assert(got(1L) == ((Some(100L), Some(ts(5)))))
    assert(got(2L) == ((Some(200L), Some(ts(20))))) // inclusive tie
    assert(got(3L) == ((None, None)))
    assert(got(4L) == ((Some(400L), Some(ts(1)))))
    assert(got(5L) == ((None, None)))

    // naive reference: inequality join + per-trade argmax
    val naive = trades.join(quotes.withColumnRenamed("k", "qk")
        .withColumnRenamed("t", "qt"),
        col("k") === col("qk") && col("qt") <= col("t"), "left")
      .groupBy("trade_id")
      .agg(expr("max_by(px, qt)").as("px"), max("qt").as("right_ts"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Timestamp])))).toMap
    assert(got == naive)

    // scale contract: one hash exchange on the key, no join operator
    val plan = Temporal.asofJoin(trades, quotes, "k", "t", "t", "px")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not plan a join:\n$plan")
    assert(plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("asofJoin null semantics match join semantics: null-key/ts right rows match nothing") {
    import spark.implicits._
    val trades = Seq((1L, "a", ts(10)), (2L, null.asInstanceOf[String], ts(10)),
      (3L, "a", null.asInstanceOf[Timestamp])).toDF("trade_id", "k", "t")
    val quotes = Seq(
      ("a", null.asInstanceOf[Timestamp], 666L), // null ts: never matches
      (null.asInstanceOf[String], ts(1), 777L),  // null key: never matches
      ("a", ts(5), 100L)
    ).toDF("k", "t", "px")
    val got = Temporal.asofJoin(trades, quotes, "k", "t", "t", "px")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got(1L) == Some(100L)) // only the valid quote applies
    assert(got(2L) == None)       // null-key trade matches nothing
    assert(got(3L) == None)       // null-ts trade matches nothing
  }

  test("asofJoin: a null-VALUED right row IS the as-of row — value and ts from the same row") {
    import spark.implicits._
    // latest quote before the trade has a NULL px: the result must be
    // (null px, that quote's ts) — never an older row's px paired with
    // the newer row's ts (the r7 two-column carry did exactly that)
    val trades = Seq((1L, "a", ts(30)), (2L, "a", ts(7))).toDF("trade_id", "k", "t")
    val quotes = Seq(
      ("a", ts(5), Some(100L)),
      ("a", ts(20), Option.empty[Long])  // null value, newest before ts(30)
    ).toDF("k", "t", "px")
    val got = Temporal.asofJoin(trades, quotes, "k", "t", "t", "px")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got(1L) == ((None, Some(ts(20)))),
      "null-valued as-of row must yield (null, its own ts)")
    assert(got(2L) == ((Some(100L), Some(ts(5)))))
  }

  test("asofJoinBucketed row-identical to asofJoin on a skewed fixture, any bucket size") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    // skew: 70% of rows land on one hot key
    def key(): String = if (rng.nextInt(10) < 7) "hot" else s"k${rng.nextInt(4)}"
    val right = (1 to 300).map { i =>
      (key(), ts(rng.nextInt(55)),
        if (rng.nextInt(5) == 0) Option.empty[Long] else Some(rng.nextLong().abs % 1000))
    }.toDF("k", "t", "v")
    val left = (1 to 400).map { i =>
      (i.toLong,
        if (i % 97 == 0) null.asInstanceOf[String] else key(),
        if (i % 89 == 0) null.asInstanceOf[Timestamp] else ts(rng.nextInt(58)))
    }.toDF("id", "k", "t")
    val base = Temporal.asofJoin(left, right, "k", "t", "t", "v")
    for (bucket <- Seq(60L, 300L, 900L, 86400L)) {
      val bucketed = Temporal.asofJoinBucketed(left, right, "k", "t", "t", "v",
        bucketSeconds = bucket)
      assert(base.exceptAll(bucketed).count() == 0 &&
        bucketed.exceptAll(base).count() == 0,
        s"bucket=$bucket must be row-identical to the key-window form")
      assert(bucketed.count() == left.count())
    }
  }

  test("property: intervalOverlapPairs equals the naive quadratic form at any bucket size") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val iv = (1L to 40L).map { id =>
      val s = rng.nextInt(48)
      (id, ts(s), ts(s + 1 + rng.nextInt(6)))
    }
    val naive = (for {
      (a, sa, ea) <- iv; (b, sb, eb) <- iv
      if a < b && !sa.after(eb) && !sb.after(ea)
    } yield (a, b)).toSet
    for (bucket <- Seq(60L, 300L, 3600L, 86400L)) {
      val got = Temporal.intervalOverlapPairs(
        iv.toDF("id", "s", "e"), "id", "s", "e", bucketSeconds = bucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucket=$bucket: ${got.size} vs ${naive.size}")
    }
  }

  test("property: asofJoin matches an in-memory reference on random keyed series") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    for (_ <- 1 to 4) {
      val keys = Seq("a", "b", "c", "d")
      // unique (key, minute) on the right by construction
      val right = keys.flatMap { k =>
        rng.shuffle((0 until 50).toList).take(8)
          .map(m => (k, ts(m), rng.nextLong().abs % 1000))
      }
      val left = (1 to 60).map { i =>
        (i.toLong, keys(rng.nextInt(keys.size + 1) min (keys.size - 1)),
          ts(rng.nextInt(55)))
      }
      val got = Temporal.asofJoin(left.toDF("id", "k", "t"),
          right.toDF("k", "t", "v"), "k", "t", "t", "v")
        .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      val byKey = right.groupBy(_._1)
      for ((id, k, t) <- left) {
        val want = byKey.getOrElse(k, Seq.empty)
          .filter(q => !q._2.after(t))
          .sortBy(q => (q._2.getTime, q._3)).lastOption.map(_._3)
        assert(got(id) == want, s"id=$id k=$k t=$t")
      }
    }
  }
}
