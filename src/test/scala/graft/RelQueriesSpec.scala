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
