package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{FlowStreams, PgDialect}

/** The S6 sink's insert tuple verified against the reference Postgres
  * DDL (`compose/postgres/create.sh:5-24`) — as far as the sandbox
  * allows (no PG server / pgjdbc jar exists in the zero-egress image,
  * so the proof is the dialect contract, not a live insert):
  * column-for-column name + type bindability, the generated `bigserial`
  * exclusion, the inet/stringtype coupling, and the exactly-once
  * extension column. */
class PgDialectSpec extends SparkTestBase {

  /** One decoded flow row with the FlowSchema column types — the input
    * shape [[FlowStreams.jdbcFlushProjection]] consumes. */
  private def decodedRow = {
    spark.range(1).select(
      lit(1704067200L).as("timeFlowStart"),
      lit(2).as("flowType"),
      lit(1000L).as("samplingRate"),
      lit(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 10, 0, 0, 1)).as("srcAddr"),
      lit(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 10, 0, 0, 2)).as("dstAddr"),
      lit(1500L).as("bytes"), lit(3L).as("packets"),
      lit(443).as("srcPort"), lit(51234).as("dstPort"),
      lit(0x0800).as("etype"), lit(6).as("proto"),
      lit(64500).as("srcAS"), lit(64501).as("dstAS"))
  }

  test("the 14-column insert tuple binds into the reference flows DDL (r13, S6/PG)") {
    val tuple = FlowStreams.jdbcFlushProjection(decodedRow)
    // exactly the DDL's non-generated columns, nothing else
    assert(tuple.schema.fieldNames.toSet ===
      PgDialect.FlowsDdl.collect { case (n, _) if n != "id" => n }.toSet)
    assert(tuple.schema.fields.length === 14)
    // every column bindable under the recommended connection props
    assert(PgDialect.validateInsertTuple(tuple.schema) === Seq.empty)
    // the exactly-once variant's batch_id discriminator is also legal
    val withBatch = tuple.withColumn("batch_id", lit(7L))
    assert(PgDialect.validateInsertTuple(withBatch.schema) === Seq.empty)
    assert(PgDialect.replayGuardDdl().contains("ADD COLUMN IF NOT EXISTS batch_id bigint"))
  }

  test("inet columns refuse string binds without stringtype=unspecified") {
    val tuple = FlowStreams.jdbcFlushProjection(decodedRow)
    val errs = PgDialect.validateInsertTuple(tuple.schema, stringtypeUnspecified = false)
    assert(errs.size === 2)
    assert(errs.forall(e => e.contains("inet") && e.contains("stringtype=unspecified")))
    assert(errs.exists(_.contains("src_ip")) && errs.exists(_.contains("dst_ip")))
    // ... and pgProps carries the property that makes the bind legal
    val props = PgDialect.pgProps("u", "p")
    assert(props.getProperty("stringtype") === "unspecified")
  }

  test("validator catches projection bugs: generated id, unknown columns, dropped fields, bad types") {
    val tuple = FlowStreams.jdbcFlushProjection(decodedRow)
    // shipping the bigserial surrogate key is refused
    val withId = tuple.withColumn("id", lit(1L))
    assert(PgDialect.validateInsertTuple(withId.schema)
      .exists(_.contains("DB-generated")))
    // a column the DDL does not know is refused
    val extra = tuple.withColumn("flow_direction", lit(0))
    assert(PgDialect.validateInsertTuple(extra.schema)
      .exists(_.contains("does not exist in the flows DDL")))
    // silently dropping a flow field is refused (would land NULL forever)
    val dropped = tuple.drop("sampling_rate")
    assert(PgDialect.validateInsertTuple(dropped.schema)
      .exists(_.contains("'sampling_rate' is absent")))
    // a non-bindable type pair is refused (double into bigint)
    val badType = tuple.withColumn("bytes", col("bytes").cast("double"))
    assert(PgDialect.validateInsertTuple(badType.schema)
      .exists(e => e.contains("'bytes'") && e.contains("cannot bind")))
  }

  test("narrowing long→integer binds (sampling_rate wire uint64 into DDL integer, Go-inserter parity)") {
    val tuple = FlowStreams.jdbcFlushProjection(decodedRow)
    val f = tuple.schema.fields.find(_.name == "sampling_rate").get
    assert(f.dataType === LongType) // wire uint64 decodes wide...
    assert(PgDialect.FlowsDdl.toMap.apply("sampling_rate") === "integer") // ...DDL is int4
    assert(PgDialect.validateInsertTuple(tuple.schema) === Seq.empty) // assignment cast
  }
}
