package graft

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.operators.RelQueries

/** Plan-shape checks for the join surface (value-level parity is the
  * DuckDB oracle's job). */
class RelQueriesSpec extends SparkTestBase {

  test("enrichment joins broadcast the dimension sides") {
    val plan = RelQueries.enrichJoin(spark, sf).queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size === 2, s"expected 2 broadcast joins, plan:\n${plan.toString.take(1500)}")
  }

  test("min-cost supplier: join-against-aggregate shape + winner really is the per-part minimum (r12)") {
    val df = RelQueries.minCostSupplier(spark, sf)
    // plan: the brand filter and the supplier lookup broadcast; the
    // aggregate side joins back WITHOUT a window over the unfiltered fact
    val plan = df.queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, s"part + supplier sides must broadcast:\n${plan.toString.take(1500)}")
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "correlated-min shape must not window the fact table")
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    // semantic re-check straight from the tables: for each reported part,
    // the reported min is the true min and the suppkey the lowest holder
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#13"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = li.groupBy(_._1)
    assert(rows.length === byPart.size, "one winner row per brand part with sales")
    rows.foreach { case (pk, _, minc, sk, sname) =>
      val lines = byPart(pk)
      assert(minc === lines.map(_._3).min, s"part $pk: not the true min")
      assert(sk === lines.filter(_._3 == minc).map(_._2).min,
        s"part $pk: tie must break to the lowest suppkey")
      assert(sname === f"Supplier#$sk%09d")
    }
  }

  test("rollup computes subtotals in one Expand pass; totals reconcile (r11)") {
    val df = RelQueries.rollupAgg(spark, sf)
    // ONE Expand + aggregate — not three scans of the fact table
    val expands = df.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.size === 1, "rollup must plan as a single Expand")
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, "rollup must scan the fact table once")
    val rows = df.collect().map(r =>
      (r.getInt(0), Option(r.getString(1)), Option(r.getString(2)), r.getLong(3), r.getLong(4)))
    val detail = rows.filter(_._1 == 0)
    val subtotal = rows.filter(_._1 == 1)
    val grand = rows.filter(_._1 == 3)
    assert(grand.length === 1)
    assert(grand.head._4 === detail.map(_._4).sum)
    assert(grand.head._5 === detail.map(_._5).sum)
    subtotal.foreach { case (_, flag, _, cents, cnt) =>
      assert(cents === detail.filter(_._2 == flag).map(_._4).sum)
      assert(cnt === detail.filter(_._2 == flag).map(_._5).sum)
    }
  }

  test("shipping priority: NTZ date predicates push to both fact scans; top-10 via TakeOrdered (r11)") {
    val df = RelQueries.shippingPriority(spark, sf)
    val plan = df.queryExecution.sparkPlan
    val pushed = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }
    // the NTZ comparisons must reach the parquet scans (the r10 lesson:
    // a type mismatch silently degrades these to full scans)
    assert(pushed.exists(_.contains("LessThan(o_orderdate")),
      s"order-date bound not pushed: $pushed")
    assert(pushed.exists(_.contains("GreaterThan(l_shipdate")),
      s"ship-date bound not pushed: $pushed")
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, "top-10 must plan as TakeOrderedAndProject, not a global sort")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getLong(3))
    assert(revs.toSeq === revs.sortBy(-_).toSeq)
  }

  test("intersect/except partition the urgent set and plan as semi/anti joins (r11)") {
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val both = RelQueries.urgentAndLowCustomers(spark, sf).collect().map(_.getLong(0)).toSet
    val only = RelQueries.urgentOnlyCustomers(spark, sf).collect().map(_.getLong(0)).toSet
    assert(both.nonEmpty && only.nonEmpty)
    assert((both & only).isEmpty, "intersect and except must be disjoint")
    val urgent = graft.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert((both ++ only) === urgent, "the two set-ops must partition the urgent customers")
    val it = RelQueries.urgentAndLowCustomers(spark, sf).queryExecution.sparkPlan
      .collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType }
    assert(it.contains(LeftSemi), "INTERSECT must plan as a left-semi join")
    val et = RelQueries.urgentOnlyCustomers(spark, sf).queryExecution.sparkPlan
      .collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType }
    assert(et.contains(LeftAnti), "EXCEPT must plan as a left-anti join")
  }

  test("semi and anti joins plan as such (no row explosion)") {
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val semi = RelQueries.ordersWithHeavyLines(spark, sf).queryExecution.sparkPlan
      .collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType }
    assert(semi.contains(LeftSemi))
    val anti = RelQueries.customersWithoutOrders(spark, sf).queryExecution.sparkPlan
      .collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType }
    assert(anti.contains(LeftAnti))
  }

  test("interval join: bucketized plan equals the naive range join; equi-join on the bucket (r12)") {
    import org.apache.spark.sql.functions._
    val got = RelQueries.intervalJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // naive quadratic reference on the small SF
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), expr("unix_timestamp(o_orderdate)").as("os"))
    val l = graft.Tables.lineitem(spark, sf)
      .select(expr("unix_timestamp(l_shipdate)").as("ls"))
    val want = o.crossJoin(l)
      .filter(col("ls") >= col("os") && col("ls") < col("os") + 7 * 86400L)
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (k, n) => assert(n === want.getOrElse(k, 0L), s"order $k") }
    assert(got.length === o.count())
    // the prefix-sum serving form (the registered one) is result-identical
    val prefix = RelQueries.intervalJoinPrefix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(prefix.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq,
      "prefix-sum and pairwise interval joins must agree")
    // the join itself must be an EQUI join on the bucket, not a cartesian
    val plan = RelQueries.intervalJoin(spark, sf).queryExecution.sparkPlan
    val cartesian = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cartesian.isEmpty, "bucketized interval join must not plan a cartesian product")
  }

  test("bloom semi join: scan-side prefilter present, prunes, and is result-invisible (r13)") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    // the Bloom-pruned aggregate equals the plain exact semi join
    val got = RelQueries.bloomSemiJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")).as("rc"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq, "bloom prefilter must be result-invisible")
    // the prefilter is IN the plan, on the fact scan side
    val plan = RelQueries.bloomSemiJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom predicate must survive into the physical plan")
    // and it actually prunes: the filter passes a superset of true matches
    // but (at this fpp) strictly fewer rows than the full table
    val trueMatches = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(trueMatches < li.count(), "fixture sanity: predicate must be selective")
  }

  test("numeric corr: moment-form agrees with Spark's corr to float tolerance (r13)") {
    import org.apache.spark.sql.functions._
    val row = RelQueries.numericCorr(spark, sf).head
    val (n, cqp, cqd) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(n === Tables.lineitem(spark, sf).count())
    assert(cqp >= -1.0 && cqp <= 1.0 && cqd >= -1.0 && cqd <= 1.0)
    // reference: Spark's streaming corr over the SAME integer projections
    // (not bit-stable across partitionings, but well within 1e-6 here)
    val ref = Tables.lineitem(spark, sf).select(
        col("l_quantity").cast("long").cast("double").as("q"),
        floor(col("l_extendedprice")).cast("double").as("p"),
        floor(col("l_discount") * 1000).cast("double").as("d"))
      .agg(corr("q", "p"), corr("q", "d")).head
    assert(math.abs(cqp - ref.getDouble(0)) < 1e-6)
    assert(math.abs(cqd - ref.getDouble(1)) < 1e-6)
  }

  test("table profile: stats match driver recount; single scan of the fact table (r13)") {
    import org.apache.spark.sql.functions._
    val prof = RelQueries.tableProfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    assert(prof.keySet === Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_returnflag", "l_linestatus"))
    prof.values.foreach { case (rows, nn, nd, _, _) =>
      assert(rows === n); assert(nn <= rows); assert(nd <= nn)
    }
    val (_, _, ndFlag, minFlag, maxFlag) = prof("l_returnflag")
    assert(ndFlag === li.select("l_returnflag").distinct().count())
    assert(minFlag === li.agg(min("l_returnflag")).head.getString(0))
    assert(maxFlag === li.agg(max("l_returnflag")).head.getString(0))
    // exactly the two measured branches (distincts / keyless min-max) —
    // not a per-column union of re-scans (AQE off so the tree is
    // traversable; the full shape contract lives in PlanContractsSpec)
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans =
      try RelQueries.tableProfile(spark, sf).queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      finally spark.conf.set("spark.sql.adaptive.enabled", old)
    assert(scans.length === 2, s"profile is two branch scans, saw ${scans.length}")
  }

  test("top supplier: winners are exactly the argmax set of the quarter revenue relation (r13)") {
    import org.apache.spark.sql.functions._
    val got = RelQueries.topSupplier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    // replay the per-supplier quarter revenue driver-side
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
      .groupBy("l_suppkey").agg(sum(cents).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = rev.map(_._2).max
    assert(got.map(_._1).toSet === rev.filter(_._2 == mx).map(_._1).toSet,
      "winner set = argmax suppliers (ties all surface)")
    got.foreach { case (_, name, c) => assert(c === mx); assert(name.nonEmpty) }
  }

  test("market share: slice <= total, grand total equals plain revenue, slice replays driver-side (r13)") {
    import org.apache.spark.sql.functions._
    val rows = RelQueries.marketShare(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, total, nat, share) =>
      assert(nat >= 0L && nat <= total)
      assert(math.abs(share - nat.toDouble / total) < 1e-6)
    }
    // grand total across years == the unconditional revenue sum
    val li = Tables.lineitem(spark, sf); val o = Tables.orders(spark, sf)
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")
    val all = li.join(o, col("l_orderkey") === col("o_orderkey")).agg(sum(cents)).head.getLong(0)
    assert(rows.map(_._2).sum === all)
    // nation slice replays via a filtered aggregate (supplier keys of NATION_3)
    val n3 = Tables.supplier(spark, sf).join(Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3").select("s_suppkey")
    val sliced = li.join(n3, li("l_suppkey") === n3("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("y")).agg(sum(cents).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    rows.foreach { case (y, _, nat, _) => assert(nat === sliced.getOrElse(y, 0L), s"year $y") }
  }

  test("promo share: conditional slice replays; month totals conserve lineitem revenue (r13)") {
    import org.apache.spark.sql.functions._
    val rows = RelQueries.promoShare(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, total, promo, share) =>
      assert(promo >= 0L && promo <= total)
      assert(math.abs(share - promo.toDouble / total) < 1e-6)
    }
    val li = Tables.lineitem(spark, sf)
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")
    assert(rows.map(_._2).sum === li.agg(sum(cents)).head.getLong(0),
      "every lineitem joins exactly one part — totals conserve")
    val promoKeys = Tables.part(spark, sf).filter(col("p_type") === "PROMO").select("p_partkey")
    val promoSum = li.join(promoKeys, li("l_partkey") === promoKeys("p_partkey"))
      .agg(sum(cents)).head.getLong(0)
    assert(rows.map(_._3).sum === promoSum)
  }

  test("customer distribution: buckets partition the customer base; orders aggregate before the join (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.customerDistribution(spark, sf)
    // plan: the outer join's order side must already be the reduced
    // (custkey, cnt) aggregate — never raw order rows through the join
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.size === 1, "one customer⋈counts join")
    assert(joins.head.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }.nonEmpty,
      "the per-customer count must fold below the join")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.customer(spark, sf).count()
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum === nCust, "every customer lands in exactly one bucket")
    assert(rows.map { case (k, d) => k * d }.sum === nOrders,
      "weighted bucket sum recovers the order count")
    // the zero bucket is exactly the anti-join count
    val zero = Tables.customer(spark, sf).join(Tables.orders(spark, sf),
      col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(rows.toMap.getOrElse(0L, 0L) === zero)
  }

  test("small-qty revenue: broadcast join-against-aggregate; exact-integer threshold replays (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.smallQtyRevenue(spark, sf)
    val bhj = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "the per-part aggregate must broadcast back onto lineitem")
    val Array(row) = df.collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = li.groupBy(_._1).map { case (k, v) =>
      k -> (v.map(_._2).sum, v.size.toLong) }
    val small = li.filter { case (p, q, _) =>
      val (qsum, qcnt) = byPart(p); 5L * q * qcnt < qsum }
    assert(row.getLong(0) === small.map(_._3).sum)
    assert(row.getLong(1) === small.size.toLong)
  }

  test("order priority: semi-join lateness counts replay; date window reaches the orders scan (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.orderPriorityLate(spark, sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "")
      .contains("GreaterThanOrEqual(o_orderdate")),
      s"date window must prune the orders scan: ${scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")}")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val orders = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1995-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP_NTZ '1995-04-01 00:00:00'"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getString(2)))
    val lateKeys = Tables.lineitem(spark, sf).select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = orders.filter { case (ok, od, _) =>
      lateKeys.get(ok).exists(_ > od + 90L * 86400 * 1000) }
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    assert(rows === want)
  }

  test("nation traffic: one fact shuffle, dims broadcast; revenue conserves (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.nationTraffic(spark, sf)
    val plan = df.queryExecution.sparkPlan
    val bhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    // 4 dimension sides always broadcast; at test SF the planner may ALSO
    // broadcast the tiny orders side of the fact join (AQE would at scale
    // only if filtered small) — so >= 4, and never 0 shuffled fact joins
    // asserted here (the static scale shape is locked in PLANS.md)
    assert(bhj.size >= 4, s"customer/supplier/nation x2 must broadcast, got ${bhj.size}")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    rows.foreach { case (sn, cn, _, _, _) => assert(sn !== cn) }
    // spot-replay the total against an independent SQL aggregation
    val names = Tables.nation(spark, sf).select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val ordNation = Tables.orders(spark, sf).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), names(cust(r.getLong(1))))).toMap
    val want = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("y"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
      .collect()
      .map(r => ((names(sup(r.getLong(1))), ordNation(r.getLong(0)), r.getInt(2)), r.getLong(3)))
      .filter { case ((sn, cn, _), _) => sn != cn }
      .groupBy(_._1).view.mapValues(xs => (xs.map(_._2).sum, xs.size.toLong)).toMap
    assert(rows.map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap === want)
  }

  test("sales opportunity: integer threshold + anti join replay; the average broadcasts as one row (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.salesOpportunity(spark, sf)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), floor(col("c_acctbal") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pos = cust.map(_._3).filter(_ > 0)
    val (s, n) = (pos.sum, pos.length.toLong)
    val withOrders = Tables.orders(spark, sf).select("o_custkey").collect()
      .map(_.getLong(0)).toSet
    val names = Tables.nation(spark, sf).select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val want = cust.filter(c => c._3 * n > s && !withOrders.contains(c._1))
      .groupBy(c => names(c._2))
      .map { case (k, xs) => k -> ((xs.length.toLong, xs.map(_._3).sum)) }
    assert(rows.map(r => r._1 -> ((r._2, r._3))).toMap === want)
  }

  // ---- round-13 sixth wave: the remaining TPC-H shapes ---------------------

  test("filtered revenue (Q6): all three predicates reach the scan; fold replays (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.filteredRevenue(spark, sf)
    val pushed = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "") }.mkString(";")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    val Array(row) = df.collect()
    val want = Tables.lineitem(spark, sf)
      .select(col("l_shipdate"), col("l_discount"), col("l_quantity"),
        floor(col("l_extendedprice") * col("l_discount") * 100).cast("long"))
      .collect().map(r => (r.getAs[java.time.LocalDateTime](0).getYear,
        r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .filter { case (y, d, q, _) => y == 1997 && d >= 0.05 && d <= 0.07 && q < 24 }
    assert(row.getLong(0) === want.map(_._4).sum)
    assert(row.getLong(1) === want.size.toLong)
  }

  test("profit by nation (Q9): part/supplier/nation broadcast; total profit replays (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.profitByNation(spark, sf)
    val bhj = df.queryExecution.sparkPlan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 3, s"part + supplier + nation must broadcast, got ${bhj.size}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val unitCost = Tables.part(spark, sf)
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), floor(col("p_retailprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => unitCost.contains(x._1))
      .map(x => x._3 - unitCost(x._1) * x._2).sum
    assert(rows.map(_.getLong(2)).sum === want)
  }

  test("returned customers (Q10): revenue aggregates below the customer join; top-20 replays (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.returnedCustomers(spark, sf)
    assert(df.queryExecution.sparkPlan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t }.size === 1)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.size <= 20)
    val inQuarter = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val perCust = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
      .collect().flatMap(r => inQuarter.get(r.getLong(0)).map(_ -> r.getLong(1)))
      .groupBy(_._1).view.mapValues(xs => (xs.map(_._2).sum, xs.size.toLong)).toMap
    val wantTop = perCust.toSeq.map { case (k, (rev, n)) => (k, rev, n) }
      .sortBy(x => (-x._2, x._1)).take(20)
    assert(rows.toSeq === wantTop)
  }

  test("important parts (Q11): global scalar attaches as a broadcast 1-row relation; threshold replays (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.importantParts(spark, sf)
    val nlj = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j }
    assert(nlj.size === 1, "the (tot, np) scalar must attach as a broadcast 1-row cross join")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val pv = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), floor(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val (tot, np) = (pv.values.sum, pv.size.toLong)
    val want = pv.filter { case (_, v) => v * np * 2 > tot * 3 }
      .toSeq.sortBy(x => (-x._2, x._1))
    assert(rows.toSeq === want)
    assert(rows.nonEmpty, "threshold must not degenerate to empty at test SF")
  }

  test("late priority mix (Q12): ship-year window pruned; ONE conditional aggregate; counts replay (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.latePriorityMix(spark, sf)
    val p = df.queryExecution.sparkPlan
    assert(p.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.size === 2,
      "exactly one lineitem scan + one orders scan")
    val rows = df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val prio = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate", "o_orderpriority")
      .collect().map(r => (r.getLong(0),
        (r.getAs[java.time.LocalDateTime](1), r.getString(2)))).toMap
    val want = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getString(2)))
      .filter { case (ok, sd, _) =>
        sd.getYear == 1997 && prio.get(ok).exists(o => sd.isAfter(o._1.plusDays(60))) }
      .groupBy(_._3).view.mapValues { xs =>
        val crit = xs.count(x => Set("1-URGENT", "2-HIGH")(prio(x._1)._2)).toLong
        (crit, xs.size - crit) }.toMap
    assert(rows === want)
  }

  test("supplier part counts (Q16): blocklist anti-joins as broadcast; distinct counts replay (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.supplierPartCounts(spark, sf)
    val anti = df.queryExecution.sparkPlan.collect {
      case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT ANTI" => j }
    assert(anti.size === 1, "the negative-balance blocklist must anti-join as a broadcast")
    val rows = df.collect().map(r =>
      ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(3))).toMap
    val excl = Tables.supplier(spark, sf).filter(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val attrs = Tables.part(spark, sf)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO")
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getInt(3)))).toMap
    val want = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .filter(x => !excl(x._2) && attrs.contains(x._1))
      .groupBy(x => attrs(x._1)).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(rows === want)
  }

  test("large orders (Q18): quantity HAVING filters before the joins; top-100 replays (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.largeOrders(spark, sf)
    assert(df.queryExecution.sparkPlan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t }.size === 1)
    val rows = df.collect().map(r => (r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.size <= 100)
    val qty = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = Tables.orders(spark, sf)
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (ok, tc) =>
        qty.get(ok).filter(_ > 150).map(q => (ok, tc, q)) }
      .sortBy(x => (-x._2, x._1)).take(100)
    assert(rows.toSeq === want.toSeq)
  }

  test("disjunctive revenue (Q19): the common quantity band reaches the lineitem scan (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.disjunctiveRevenue(spark, sf)
    val pushed = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "") }.mkString(";")
    assert(pushed.contains("LessThanOrEqual(l_quantity"),
      s"the branches' common quantity bound must push down: $pushed")
    val Array(row) = df.collect()
    val attrs = Tables.part(spark, sf).select("p_partkey", "p_brand", "p_size").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    val want = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
      .collect().map(r => (attrs(r.getLong(0)), r.getDouble(1), r.getLong(2)))
      .filter { case ((b, s), q, _) =>
        (b == "Brand#12" && s >= 1 && s <= 15 && q >= 1 && q <= 11) ||
        (b == "Brand#23" && s >= 1 && s <= 25 && q >= 10 && q <= 20) ||
        (b == "Brand#34" && s >= 1 && s <= 35 && q >= 20 && q <= 30) }
    assert(row.getLong(0) === want.map(_._3).sum)
    assert(row.getLong(1) === want.size.toLong)
  }

  test("dominant suppliers (Q20): majority test replays exactly (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.dominantSuppliers(spark, sf)
    val rows = df.collect().map(_.getLong(0)).toSet
    val red = Tables.part(spark, sf).filter(col("p_name").startsWith("red"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val ps = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long"),
        col("l_shipdate")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[java.time.LocalDateTime](3).getYear))
      .filter(x => red(x._1) && x._4 == 1997)
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).sum).toMap
    val perPart = ps.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val want = ps.filter { case ((p, _), q) => 2 * q > perPart(p) }.keys.map(_._2).toSet
    assert(rows === want)
    assert(rows.nonEmpty)
  }

  test("yoy growth: integer ppm growth replays; lag runs over the reduced grain (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.yoyGrowth(spark, sf)
    val rows = df.collect().map(r => ((r.getString(0), r.getInt(1)),
      (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))))
    val names = Tables.nation(spark, sf).select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val ordKey = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_orderdate")
      .collect().map(r => (r.getLong(0),
        (names(cust(r.getLong(1))), r.getAs[java.time.LocalDateTime](2).getYear))).toMap
    val byNationYear = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
      .collect().map(r => (ordKey(r.getLong(0)), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(rows.map { case (k, (rev, _, _)) => k -> rev }.toMap === byNationYear)
    rows.groupBy(_._1._1).foreach { case (_, xs) =>
      val sorted = xs.sortBy(_._1._2)
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur._2._2 === Some(prev._2._1), "prev carries the prior year's revenue")
          assert(cur._2._3 === (cur._2._1 - prev._2._1) * 1000000L / prev._2._1)
        case _ => ()
      }
      assert(sorted.head._2._3 === 0L, "first year reports zero growth")
    }
  }

  test("waiting suppliers (Q21): no Expand (no distinct aggregates); numwait replays (r13)") {
    import org.apache.spark.sql.functions._
    val df = RelQueries.waitingSuppliers(spark, sf)
    assert(df.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty,
      "the two-fold rewrite must not plan distinct-aggregate Expands")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(2)))
    val ord = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1))).toMap
    val perSupp = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2)))
      .filter(x => ord.contains(x._1))
      .groupBy(x => (x._1, x._2)).view
      .mapValues(_.exists(x => x._3.isAfter(ord(x._1).plusDays(90)))).toMap
    val byOrder = perSupp.groupBy(_._1._1)
    val waits = byOrder.toSeq.flatMap { case (_, supps) =>
      val late = supps.filter(_._2).keys.map(_._2).toSeq
      if (supps.size > 1 && late.size == 1) late.headOption else None }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wantTop = waits.toSeq.sortBy(x => (-x._2, x._1)).take(20)
    assert(rows.toSeq === wantTop)
  }

  test("customer quartiles sketch twin: conserves customers+cents; bucket counts within KLL rank error of exact NTILE (r14)") {
    val exact = RelQueries.customerQuartiles(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(4)))
    val sk = RelQueries.customerQuartilesSketch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(4)))
    val n = exact.map(_._2).sum
    assert(sk.map(_._2).sum === n, "sketch quartiles must conserve customers")
    assert(sk.map(_._3).sum === exact.map(_._3).sum,
      "sketch quartiles must conserve total cents")
    val tol = math.max(3.0, 2 * 0.033 * n)
    for (b <- 1 to 4) {
      val e = exact.find(_._1 == b).map(_._2).getOrElse(0L)
      val s = sk.find(_._1 == b).map(_._2).getOrElse(0L)
      assert(math.abs(e - s) <= tol, s"bucket $b: exact=$e sketch=$s tol=$tol")
    }
  }
}
