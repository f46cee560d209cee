package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write-once/pre-shuffle layout strategy
  * for repeated equi-joins on a key (SURVEY.md §4 partitioning table). */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    Storage.writeBucketed(Tables.lineitem(spark, sf), "li_bucketed", "l_orderkey", 8)
    Storage.writeBucketed(Tables.orders(spark, sf), "ord_bucketed", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      val exchanges = joined.queryExecution.executedPlan.toString
      // bucket-aware scan: the join needs no exchange; only the final
      // small aggregation may shuffle
      val plan = joined.queryExecution.sparkPlan
      val joinSubtree = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joinSubtree.nonEmpty, s"expected a sort-merge join:\n$exchanges")
      val shufflesBelowJoin = joinSubtree.get.collect { case e: ShuffleExchangeExec => e }
      assert(shufflesBelowJoin.isEmpty,
        s"bucketed join should not shuffle its inputs:\n${joinSubtree.get}")
      // and the result matches the unbucketed computation
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
