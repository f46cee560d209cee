package graft

import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** Semantic sanity for the event-analytics surface (value parity with
  * DuckDB is the driver's oracle gate). */
class EventOpsSpec extends SparkTestBase {

  test("retention: identities hold (retained <= active, new + returning = active on week 1)") {
    val r = EventOps.retention(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.nonEmpty)
    // weeks are aligned and strictly increasing
    assert(r.forall(_._1 % 604800 == 0))
    assert(r.map(_._1).toSeq === r.map(_._1).sorted.toSeq)
    r.foreach { case (_, active, retained, fresh) =>
      assert(retained <= active && fresh <= active)
    }
    // the first week of the corpus: every active user is new, none retained
    val first = r.head
    assert(first._3 === 0L && first._4 === first._2)
    // retained(w) can never exceed the previous week's actives
    r.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._3 <= prev._2, s"retained ${cur._3} > prior active ${prev._2}")
    }
  }

  test("funnel: monotone stage counts, matches a driver-side per-user replay") {
    val f = EventOps.funnel(spark, sf).head()
    val (v, c, s, p) = (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3))
    assert(v >= c && c >= s && s >= p, s"funnel must be monotone: $v $c $s $p")
    assert(v > 0)
    // driver replay over the raw events
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2)))
    val byUser = ev.groupBy(_._1)
    def firstOf(es: Array[(Long, String, java.time.LocalDateTime)], t: String) =
      es.filter(_._2 == t).map(_._3).sortBy(x => x).headOption
    var (rv, rc, rs, rp) = (0L, 0L, 0L, 0L)
    byUser.values.foreach { es =>
      val (tv, tc, ts2, tp) = (firstOf(es, "view"), firstOf(es, "click"),
        firstOf(es, "signup"), firstOf(es, "purchase"))
      val s1 = tv.isDefined
      val s2 = s1 && tc.exists(x => !x.isBefore(tv.get))
      val s3 = s2 && ts2.exists(x => !x.isBefore(tc.get))
      val s4 = s3 && tp.exists(x => !x.isBefore(ts2.get))
      if (s1) rv += 1; if (s2) rc += 1; if (s3) rs += 1; if (s4) rp += 1
    }
    assert((v, c, s, p) === ((rv, rc, rs, rp)))
  }

  test("dau/wau: identities hold and a brute 7-day recount matches") {
    val r = EventOps.dauWau(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.nonEmpty)
    r.foreach { case (_, dau, wau, st) =>
      assert(dau <= wau, "a daily active is weekly active by definition")
      assert(st > 0.0 && st <= 1.0)
    }
    // brute recount: WAU(day) = distinct users over the trailing 7 days
    val ud = Tables.events(spark, sf)
      .select(expr("unix_timestamp(ts) div 86400 * 86400").as("day"), col("user_id"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
    r.take(10).foreach { case (day, dau, wau, _) =>
      val brute = ud.filter { case (d, _) => d >= day - 6 * 86400L && d <= day }
        .map(_._2).distinct.length.toLong
      assert(wau === brute, s"day $day: wau $wau != brute $brute")
      assert(dau === ud.count(_._1 == day).toLong)
    }
  }

  test("pivot: weekly type matrix reconciles with raw counts; single aggregate pass") {
    val p = EventOps.typePivot(spark, sf)
    val rows = p.collect()
    assert(rows.nonEmpty)
    // row sums = total events per week; grand total = corpus size
    val total = rows.map(r => (1 to 5).map(r.getLong(_)).sum).sum
    assert(total === Tables.events(spark, sf).count())
    // explicit value list -> one aggregate pass over one scan, no
    // values-discovery job
    val scans = p.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, "pivot with explicit values must scan once")
    // spot-check one cell against a direct filter count
    val w0 = rows.head.getLong(0)
    val direct = Tables.events(spark, sf)
      .filter(expr(s"unix_timestamp(ts) div 604800 * 604800 = $w0") &&
        col("event_type") === "click").count()
    assert(rows.head.getLong(2) === direct)
  }

  test("props extraction: every event parses, per-type counts reconcile") {
    val g = EventOps.propsStats(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(g.nonEmpty)
    // the generator writes {"k": N} on every event: no parse losses
    g.foreach { case (t, n, withK, kSum, kMin, kMax) =>
      assert(withK === n, s"$t: JSON extraction lost ${n - withK} rows")
      assert(kMin <= kMax && kSum >= kMin * n && kSum <= kMax * n)
    }
    assert(g.map(_._2).sum === Tables.events(spark, sf).count())
  }
}
