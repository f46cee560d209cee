package graft

import org.apache.spark.sql.functions._
import graft.flow.{FlowEnrich, FlowGen}
import graft.flow.FlowEnrich.FlowMessageExt
import graft.sources.ProtoCodec

/** The enrichment processor surface: extended wire fields 100-103
  * (pb-ext/flow.pb.go:140-143), the broadcast AS-dimension join, and the
  * consume → enrich → re-inject loop (README.md:44-51).
  */
class FlowEnrichSpec extends SparkTestBase {
  import spark.implicits._

  test("extended wire fields 100-103 round-trip; base codec interop both ways") {
    val base = FlowGen.flows(spark, 20, seed = 91).collect().toSeq
    val ext = base.zipWithIndex.map { case (m, i) =>
      FlowMessageExt.from(m,
        srcCountry = if (i % 3 == 0) "" else s"C${i % 5}",
        dstCountry = s"D${i % 4}", srcASDB = i % 2, dstASDB = 7)
    }
    ext.foreach { e =>
      val back = ProtoCodec.decodeExt(ProtoCodec.encodeExt(e))
      assert(back.srcCountry === e.srcCountry)
      assert(back.dstCountry === e.dstCountry)
      assert(back.srcASDB === e.srcASDB && back.dstASDB === e.dstASDB)
      assert(back.srcAS === e.srcAS && back.bytes === e.bytes)
      // the LIGHT consumer skips 100-103 (forward-extensible) and still
      // reads the 17 base fields
      val light = ProtoCodec.decode(ProtoCodec.encodeExt(e))
      assert(light.srcAS === e.srcAS && light.bytes === e.bytes
        && light.timeReceived === e.timeReceived)
    }
    // an unenriched ext record is byte-identical to its base encoding
    val plain = FlowMessageExt.from(base.head, "", "", 0, 0)
    assert(ProtoCodec.encodeExt(plain).toSeq === ProtoCodec.encode(base.head).toSeq)
    // and the ext consumer reads plain base bytes with default ext fields
    val extOfBase = ProtoCodec.decodeExt(ProtoCodec.encode(base.head))
    assert(extOfBase.srcCountry === "" && extOfBase.srcASDB === 0)
  }

  test("enrich processor: decode -> broadcast join -> re-encode carries geo on the wire") {
    val dims = Seq((65000, "AS-ALPHA", "NL"), (65001, "AS-BETA", "US"))
      .toDF("asn", "as_name", "country")
    val flows = FlowGen.flows(spark, 100, seed = 92) // srcAS/dstAS in 65000..65002
    val enriched = FlowEnrich.enrichExt(flows, dims, asdb = 20240101).collect()
    assert(enriched.length === 100)
    enriched.foreach { e =>
      // on the wire, an unmatched endpoint is the proto3 unset default ""
      // (never the display sentinel "--")
      val expected = e.srcAS match {
        case 65000 => "NL"; case 65001 => "US"; case _ => ""
      }
      assert(e.srcCountry === expected, s"srcAS ${e.srcAS}")
      assert((e.srcASDB != 0) === (e.srcCountry != ""))
      // full loop: re-inject to wire, extended consumer sees the geo
      val onWire = ProtoCodec.decodeExt(ProtoCodec.encodeExt(e))
      assert(onWire.srcCountry === e.srcCountry && onWire.dstCountry === e.dstCountry)
    }
    // both dimension ASNs actually occurred (the generator spans all three)
    assert(enriched.map(_.srcCountry).toSet === Set("NL", "US", ""))
    // a fully-unmatched record re-encodes byte-identical to its base form
    enriched.find(e => e.srcCountry == "" && e.dstCountry == "").foreach { e =>
      val base = graft.flow.FlowMessage(e.flowType, e.timeReceived, e.sequenceNum,
        e.samplingRate, e.samplerAddress, e.timeFlowStart, e.timeFlowEnd, e.bytes,
        e.packets, e.srcAddr, e.dstAddr, e.etype, e.proto, e.srcPort, e.dstPort,
        e.srcAS, e.dstAS)
      assert(ProtoCodec.encodeExt(e).toSeq === ProtoCodec.encode(base).toSeq)
    }
  }

  test("enrichment runs inside the streaming MV cascade (processor-in-stream)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dims = Seq((65000, "AS-ALPHA", "NL"), (65001, "AS-BETA", "US"),
      (65002, "AS-GAMMA", "DE")).toDF("asn", "as_name", "country")
    val src = MemoryStream[graft.flow.FlowMessage]
    val out = java.nio.file.Files.createTempDirectory("enrich_mv").toString
    val cp = java.nio.file.Files.createTempDirectory("enrich_cp").toString
    // the README's processor topology, streaming form: decode → enrich →
    // materialize; the broadcast dimension join runs per micro-batch
    val q = src.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.flow.FlowMessage], _: Long) =>
        FlowEnrich.enrichExt(batch, dims, asdb = 20240101).write
          .mode("append").parquet(out)
      }
      .option("checkpointLocation", cp)
      .start()
    src.addData(FlowGen.flows(spark, 120, seed = 93).collect().toSeq)
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() === 120)
    assert(back.filter(col("srcCountry").isin("NL", "US", "DE")).count() === 120)
    assert(back.filter(col("srcASDB") === 20240101).count() === 120)
  }

  test("flow_enrich surface: broadcast-join plan, no shuffle on the fact side") {
    val df = FlowEnrich.enrichFlows(
      graft.flow.FlowAdapter.flows(spark, sf), FlowEnrich.asDims(spark, sf))
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec hides its inner
    // tree from collect until execution
    val plan = df.queryExecution.sparkPlan
    val outerBhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter => j }
    assert(outerBhj.size === 2, s"expected 2 broadcast enrich joins, got:\n$plan")
    val smj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smj.isEmpty, "enrichment must not sort-merge")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, "fact side must not shuffle for the enrichment join")
    // unmatched AS renders the '--' default
    val rows = FlowEnrich.flowEnrich(spark, sf)
    assert(rows.filter(col("src_as_name") === "--").count() === 0) // 65000..02 all match
    assert(rows.count() > 0)
  }

  test("lpm: deepest nested prefix wins; unmatched flows take the default route (r13)") {
    import spark.implicits._
    // hand-built prefix table with nested /8 ⊃ /12 ⊃ /16 and a disjoint /8
    val pfx = Seq(
      (8, 0x0A000000L, "net-a8"),    // 10.0.0.0/8
      (12, 0x0A100000L, "net-a12"),  // 10.16.0.0/12
      (16, 0x0A140000L, "net-a16"),  // 10.20.0.0/16
      (8, 0xC0000000L, "net-c8"))    // 192.0.0.0/8
      .toDF("prefix_len", "prefix_ip", "origin")
    val flows = Seq(
      (1L, 0x0A141E05L), // 10.20.30.5  -> /16 (deepest of all three)
      (2L, 0x0A110105L), // 10.17.1.5   -> /12 (inside /12, outside /16)
      (3L, 0x0A990105L), // 10.153.1.5  -> /8
      (4L, 0xC0A80001L), // 192.168.0.1 -> disjoint /8
      (5L, 0x7F000001L)) // 127.0.0.1   -> no match
      .toDF("seq", "src_ip")
      .withColumn("bytes", lit(100L)).withColumn("sampling_rate", lit(1L))
    val got = FlowEnrich.lpmJoin(flows, pfx)
      .select($"seq", coalesce($"best.origin", lit("--")).as("origin"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "net-a16", 2L -> "net-a12", 3L -> "net-a8",
      4L -> "net-c8", 5L -> "--"))
  }

  test("lpm surface: dimension broadcast, no cartesian, summary reconciles with per-flow (r13)") {
    val plan = FlowEnrich.flowLpmSummary(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "prefix dim must broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "LPM must stay an equi-join on (len, network)")
    val perFlow = FlowEnrich.flowLpmEnrich(spark, sf)
    val summary = FlowEnrich.flowLpmSummary(spark, sf)
    // every flow appears exactly once in the per-flow surface...
    assert(perFlow.count() === graft.flow.FlowAdapter.flows(spark, sf).count())
    // ...and the summary partitions it
    val sumFlows = summary.agg(sum("flow_count")).head.getLong(0)
    assert(sumFlows === perFlow.count())
    // matched origins agree between the two cuts
    val a = perFlow.groupBy("origin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = summary.groupBy("origin").agg(sum("flow_count")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("as balance: egress and ingress both conserve total sampled bytes; shares replay (r13)") {
    import graft.flow.FlowAdapter
    val rows = FlowEnrich.flowAsBalance(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val total = FlowAdapter.flows(spark, sf)
      .agg(sum(col("bytes") * col("sampling_rate"))).collect()(0).getLong(0)
    assert(rows.map(_._3).sum === total, "egress conserves sampled bytes")
    assert(rows.map(_._4).sum === total, "ingress conserves sampled bytes")
    val names = FlowEnrich.asDims(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    rows.foreach { case (asn, name, e, i, share) =>
      assert(name === names.getOrElse(asn, "--"))
      assert(math.abs(share - e.toDouble / (e + i)) < 1e-6)
    }
  }
}
