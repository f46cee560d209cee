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

  test("dau/wau sketch twin: exact regime matches the exact form bit-for-bit; strict guard throws past 2^lgK (r15)") {
    // strict exact regime: user count << 2^12 at test scale, so every
    // theta estimate (daily and 7-day union) is the exact integer and
    // the twin must equal the exact form including stickiness rounding
    val exact = EventOps.dauWau(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    val sk = EventOps.dauWauSketch(spark, sf, strict = true).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(sk.nonEmpty && sk.toSeq === exact.toSeq)
    // past the exact regime the strict form must refuse, not approximate:
    // lgK=4 (16 entries) against sf0.01's 150 users forces estimation
    // mode (the test-scale corpus has too few users to exceed even 2^4)
    val e = intercept[org.apache.spark.SparkException] {
      EventOps.dauWauSketch(spark, "/root/testdata/sf0.01", lgK = 4,
        strict = true).collect()
    }
    assert(e.getMessage.contains("estimation mode"))
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

  test("transitions: totals reconcile (sum = events - users-with-events) and a planted chain counts (r12)") {
    val t = EventOps.transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(t.nonEmpty)
    t.foreach { case (_, _, n, u) => assert(u <= n && u >= 1) }
    // every user with k events contributes exactly k-1 transitions
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(t.map(_._3).sum === nEvents - nUsers)
    // deterministic output order
    assert(t.map(x => (x._1, x._2)).toSeq === t.map(x => (x._1, x._2)).sorted.toSeq)
  }

  test("time-to-convert: planted signup->purchase deltas summarize exactly (r12)") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ttc").toString
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def at(s: Long) = base.plusSeconds(s)
    Seq(
      // user 1: signup at 0, purchase at 100 -> delta 100
      (1L, at(0), 1L, "signup", 0.0, "{}"),
      (2L, at(100), 1L, "purchase", 1.0, "{}"),
      // user 2: purchase BEFORE signup (ignored), then one at +500
      (3L, at(50), 2L, "purchase", 1.0, "{}"),
      (4L, at(200), 2L, "signup", 0.0, "{}"),
      (5L, at(700), 2L, "purchase", 1.0, "{}"),
      // user 3: signup, never purchases
      (6L, at(0), 3L, "signup", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir2/events.parquet")
    val r = EventOps.timeToConvert(spark, dir2).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      === ((2L, 100L, 500L, 600L, 300.0)))
  }

  test("gap sessions: planted gaps split sessions; totals conserve events (r12)") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_gaps").toString
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def at(s: Long) = base.plusSeconds(s)
    Seq(
      // user 1: events at 0, 60, 120 (one session), then 120+1801.. new session
      (1L, at(0), 1L, "view", 0.0, "{}"),
      (2L, at(60), 1L, "click", 0.0, "{}"),
      (3L, at(120), 1L, "view", 0.0, "{}"),
      (4L, at(1921), 1L, "purchase", 0.0, "{}"), // 120+1801 -> new session
      (5L, at(1950), 1L, "view", 0.0, "{}"),
      // user 2: single event
      (6L, at(500), 2L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir2/events.parquet")
    val out = EventOps.gapSessions(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    val epoch0 = base.toEpochSecond(java.time.ZoneOffset.UTC)
    assert(out.toSeq === Seq(
      (1L, 1L, epoch0, epoch0 + 120, 120L, 3L, 2L),
      (1L, 2L, epoch0 + 1921, epoch0 + 1950, 29L, 2L, 2L),
      (2L, 1L, epoch0 + 500, epoch0 + 500, 0L, 1L, 1L)))
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

  test("last-touch attribution: per-user replay agrees; conversions conserved (r13)") {
    val got = EventOps.lastTouch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // driver replay: sort each user's stream by (ts, event_id), attribute
    // each purchase to the latest preceding non-purchase type
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(floor(value * 1000000) AS BIGINT) AS v", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getAs[java.time.LocalDateTime](4)))
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    ev.groupBy(_._1).values.foreach { es =>
      var touch: String = null
      es.sortBy(e => (e._5, e._2)).foreach { case (_, _, t, v, _) =>
        if (t == "purchase") {
          val key = if (touch == null) "none" else touch
          val (n, s) = acc.getOrElse(key, (0L, 0L))
          acc(key) = (n + 1, s + v)
        } else touch = t
      }
    }
    val want = acc.toSeq.map { case (k, (n, s)) => (k, n, s) }.sortBy(_._1)
    assert(got === want)
    // invariant: total attributed conversions == total purchases
    assert(got.map(_._2).sum ===
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }

  test("rfm: segments conserve users and revenue; NTILE replay agrees per dimension (r13)") {
    val segs = EventOps.rfm(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(segs.nonEmpty)
    segs.foreach { case (rs, fs, ms, n, _, lo, hi) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(n > 0 && lo >= 0 && hi >= lo)
    }
    // driver replay of the per-user base relation
    val ev = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id", "unix_timestamp(ts) div 86400 AS day",
        "CAST(floor(value * 1000000) AS BIGINT) AS v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.map(_._2).max, es.size.toLong, es.map(_._3).sum)
    }.toSeq
    val anchor = perUser.map(_._2).max
    // users and revenue conserve across segments
    assert(segs.map(_._4).sum === perUser.size.toLong)
    assert(segs.map(_._5).sum === perUser.map(_._4).sum)
    // standard SQL NTILE: with n = users, the first (n mod 5) buckets get
    // ceil(n/5) members under the (key, user_id) total order
    def ntile5(order: Seq[Long]): Map[Long, Int] = {
      val n = order.size; val q = n / 5; val r = n % 5
      order.zipWithIndex.map { case (u, i) =>
        val bucket =
          if (i < r * (q + 1)) i / (q + 1) + 1
          else r + (i - r * (q + 1)) / q + 1
        u -> bucket
      }.toMap
    }
    val rT = ntile5(perUser.sortBy(u => (anchor - u._2, u._1)).map(_._1))
    val fT = ntile5(perUser.sortBy(u => (-u._3, u._1)).map(_._1))
    val mT = ntile5(perUser.sortBy(u => (-u._4, u._1)).map(_._1))
    val wantSegs = perUser.groupBy(u => (rT(u._1), fT(u._1), mT(u._1)))
      .map { case ((a, b, c), us) => (a, b, c, us.size.toLong) }.toSeq.sorted
    assert(segs.map(s => (s._1, s._2, s._3, s._4)).toSeq.sorted === wantSegs)
  }

  test("rfm: fact-regime range-partitioned rank equals the dimension-regime NTILE path bit-for-bit (r19)") {
    val dim = EventOps.rfm(spark, sf).collect().map(_.toSeq)
    val fact = EventOps.rfm(spark, sf, 5, rankThreshold = 0L).collect().map(_.toSeq)
    assert(fact.toSeq === dim.toSeq,
      "the adaptive strategies must be observationally identical")
  }

  test("rfm sketch twin: conserves users+revenue; marginal bucket counts within KLL rank error of exact NTILE (r14)") {
    val exact = EventOps.rfm(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val sk = EventOps.rfmSketch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val nUsers = exact.map(_._4).sum
    assert(sk.map(_._4).sum === nUsers, "sketch segmentation must conserve users")
    assert(sk.map(_._5).sum === exact.map(_._5).sum,
      "sketch segmentation must conserve revenue")
    sk.foreach { case (rs, fs, ms, n, _) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5 && n > 0)
    }
    // per-dimension marginals: each score bucket within the sketch's
    // rank-error budget of the exact NTILE bucket (k=200 → ≤3.3%
    // normalized rank error per cut; a bucket has two cuts → 2ε·N,
    // plus O(1) boundary-convention slack). The tie-broken composite is
    // what makes this bound hold under heavy frequency ties.
    val tol = math.max(3.0, 2 * 0.033 * nUsers)
    def marginal(rows: Array[(Int, Int, Int, Long, Long)], dim: Int): Map[Int, Long] =
      rows.groupBy(t => dim match { case 0 => t._1; case 1 => t._2; case _ => t._3 })
        .view.mapValues(_.map(_._4).sum).toMap
    for (dim <- 0 to 2; b <- 1 to 5) {
      val e = marginal(exact, dim).getOrElse(b, 0L)
      val s = marginal(sk, dim).getOrElse(b, 0L)
      assert(math.abs(e - s) <= tol,
        s"dim $dim bucket $b: exact=$e sketch=$s tol=$tol")
    }
  }

  test("cohort LTV: weekly revenue replays driver-side; cumulative is an exact running sum (r13)") {
    val rows = EventOps.cohortLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // driver replay
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_timestamp(ts) div 86400 AS day",
        "CAST(floor(value * 1000000) AS BIGINT) AS v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val d0 = ev.filter(_._2 == "signup").groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val base = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, day, v) =>
        d0.get(u).filter(day >= _).map(s => ((s / 7, (day - s) / 7), (u, v)))
      }
    val want = base.groupBy(_._1).map { case ((cw, wo), xs) =>
      (cw, wo, xs.map(_._2._1).distinct.size.toLong, xs.map(_._2._2).sum)
    }.toSeq.sortBy(x => (x._1, x._2))
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq === want)
    // the cumulative column is the exact per-cohort running sum
    rows.groupBy(_._1).foreach { case (cw, rs) =>
      val ordered = rs.sortBy(_._2)
      val running = ordered.map(_._4).scanLeft(0L)(_ + _).drop(1)
      assert(ordered.map(_._5).toSeq === running.toSeq, s"cohort $cw cumulative")
    }
    // pre-signup purchases are excluded: every offset is non-negative
    assert(rows.forall(_._2 >= 0))
  }

  test("ab test: counts, rates, z and flag replay driver-side from exact integers (r13)") {
    val r = EventOps.abTest(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (na, ca, nb, cb) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // driver replay of the per-user conversion relation
    val per = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "value").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
      .groupBy(_._1).toSeq.map { case (u, xs) =>
        (u % 2, if (xs.exists(e => e._2 == "purchase" && e._3 >= 150.0)) 1L else 0L)
      }
    assert(na === per.count(_._1 == 0).toLong && nb === per.count(_._1 == 1).toLong)
    assert(ca === per.filter(_._1 == 0).map(_._2).sum)
    assert(cb === per.filter(_._1 == 1).map(_._2).sum)
    assert(ca > 0 && ca < na && cb > 0 && cb < nb,
      "corpus must be non-degenerate for the z to be meaningful")
    val (p1, p2) = (ca.toDouble / na, cb.toDouble / nb)
    val pp = (ca + cb).toDouble / (na + nb)
    val z = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(row.getDouble(4) - math.rint(p1 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(row.getDouble(5) - math.rint(p2 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(row.getDouble(6) - math.rint(z * 1e6) / 1e6) < 1e-9, "z statistic")
    assert(row.getBoolean(7) === (z * z >= 3.8416), "significance flag")
  }

  test("user activity distribution: buckets replay driver-side and conserve users + events (r13)") {
    val rows = EventOps.userActivityDist(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    def bits(n: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val want = perUser.groupBy(bits).map { case (b, xs) =>
      (b, xs.length.toLong, xs.min, xs.max, xs.sum)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === want)
    assert(rows.map(_._2).sum === perUser.length.toLong, "every user lands in one bucket")
    assert(rows.map(_._5).sum === perUser.sum, "events conserved")
    rows.foreach { case (b, _, lo, hi, _) =>
      assert(lo >= (1L << (b - 1)) && hi < (1L << b), s"bucket $b bounds")
    }
  }

  test("new vs returning: per-day split sums to DAU; new users conserve the user base (r13)") {
    val rows = EventOps.newVsReturning(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ud = Tables.events(spark, sf)
      .select(expr("(unix_timestamp(ts) div 86400) * 86400").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val dau = ud.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (day, nu, ru) => assert(nu + ru === dau(day), s"day $day") }
    assert(rows.map(_._2).sum === ud.map(_._2).distinct.length.toLong,
      "every user is new exactly once")
    val firstDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val wantNew = firstDay.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (day, nu, _) => assert(nu === wantNew.getOrElse(day, 0L)) }
  }
}
