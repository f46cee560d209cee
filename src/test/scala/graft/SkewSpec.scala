package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // one pathological key carrying ~99% of the probe side
  private def skewed() = {
    val probe = spark.range(100000)
      .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val build = Seq((7L, "hot"), (100L, "cold"), (200L, "dark")).toDF("k", "name")
    (probe, build)
  }

  test("salted join is row-identical to the plain join (inner and left)") {
    val (probe, build) = skewed()
    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .select("k", "payload", "name").orderBy("k", "payload")
      val salted = Skew.saltedEquiJoin(probe, build, "k", salts = 16, joinType = jt)
        .select("k", "payload", "name").orderBy("k", "payload")
      assert(salted.collect().toSeq === plain.collect().toSeq, s"join type $jt")
    }
  }

  test("the hot key actually scatters: its rows land in many shuffle buckets") {
    val (probe, _) = skewed()
    // reproduce the operator's salted key and measure how the hot key's
    // rows distribute over (k, salt) hash buckets
    val salts = 16
    val spread = probe
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
      .filter(col("k") === 7L)
      .groupBy("__salt").count()
      .agg(count(lit(1)).as("buckets"), (max("count") - min("count")).as("imbalance"),
        sum("count").as("total"))
      .head()
    assert(spread.getLong(0) === salts.toLong, "hot key must occupy every salt bucket")
    val total = spread.getLong(2)
    // near-uniform: worst-vs-best bucket within 20% of the mean
    assert(spread.getLong(1) < total / salts / 5,
      s"salt buckets should be near-uniform, spread=$spread")
  }

  test("salted enrichment: plan hashes on (key, salt); result identical to broadcast path") {
    import graft.flow.{FlowAdapter, FlowEnrich}
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = FlowEnrich.enrichFlowsSalted(
        FlowAdapter.flows(spark, sf), FlowEnrich.asDims(spark, sf), salts = 8)
      // the scatter is in the PLAN: the join exchange hashes on (key, salt),
      // so a hot ASN spreads over 8 reducer sub-keys instead of one
      // (exchanges are inserted by EnsureRequirements → read the executed
      // plan's explain text, which shows them under AQE too)
      val planText = salted.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val saltedExchange = planText.linesIterator.exists(l =>
        l.contains("hashpartitioning") && l.contains("__salt"))
      assert(saltedExchange,
        s"join exchange must include the salt in its hash keys:\n$planText")
      // and the salting is result-invisible vs the broadcast product path
      val got = FlowEnrich.flowEnrichSalted(spark, sf).collect().map(_.toSeq).toSeq
      val want = FlowEnrich.flowEnrich(spark, sf).collect().map(_.toSeq).toSeq
      assert(got.nonEmpty && got === want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("duplicate build rows per key replicate correctly (multiplicity preserved)") {
    val probe = spark.range(1000).select(lit(1L).as("k"), col("id").as("payload"))
    val build = Seq((1L, "a"), (1L, "b")).toDF("k", "name") // two matches per probe row
    val salted = Skew.saltedEquiJoin(probe, build, "k", salts = 4)
    assert(salted.count() === 2000L)
    assert(salted.groupBy("name").count().orderBy("name")
      .as[(String, Long)].collect().toSeq === Seq(("a", 1000L), ("b", 1000L)))
  }
}
