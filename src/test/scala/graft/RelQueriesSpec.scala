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
}
