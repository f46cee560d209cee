package graft.flow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic adapter: driver `events` table → flow records.
  *
  * The reference pipeline's records come from a synthetic generator
  * (`/root/reference/mocker/mocker.go:54-90`); the driver harness instead
  * provides a deterministic `events` parquet (TESTDATA.md). This adapter
  * derives a flow table from `events` using *pure integer arithmetic* so the
  * exact same derivation is expressible in DuckDB SQL ([[FlowAdapter.ducksql]])
  * — which makes every flow-surface query oracle-checkable end-to-end.
  *
  * Field distributions echo the mocker's shapes (bytes bounded by 1500,
  * packets by 100, AS numbers in 65000..65002 — `mocker.go:59-62,78-81`)
  * without copying any code: the mapping here is plain modular arithmetic
  * over event_id/user_id/value.
  *
  * At scale this is a narrow projection over the scan — no shuffle, fully
  * codegen'd, and column pruning still reaches the parquet reader for
  * downstream queries that select a subset.
  */
object FlowAdapter {

  /** Spark-side flows view. Keep in lock-step with [[ducksql]].
    *
    * The driver's events.parquet currently carries parquet
    * `timestamp[us]` with `isAdjustedToUTC=false`, which Spark reads as
    * `TimestampNTZType`; with the session timezone pinned to UTC
    * ([[graft.GraftSession]]) `unix_timestamp` over it is bit-identical to
    * DuckDB's `floor(epoch(ts))`. Earlier driver generations wrote
    * TIMESTAMP(NANOS), which Spark's vectorized reader only accepts under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (epoch-nanos Long) —
    * GraftSession still sets that conf so either generation reads, and the
    * Long branch below keeps the nanos path working. Any OTHER `ts` type is
    * a loud failure, not a silent semantic change (r10 advisory: the NTZ
    * regeneration silently disabled pushdown for a round).
    */
  def flows(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val ev = Tables.events(spark, dir)
    // integer division on the nanos path: nanos exceed double mantissa
    // range, so a float divide could land on the wrong second at boundaries
    val timeReceived = ev.schema("ts").dataType match {
      case LongType                        => expr("ts div 1000000000")
      case TimestampType | TimestampNTZType => unix_timestamp(ev("ts"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; supported: Long " +
          "(TIMESTAMP(NANOS) under spark.sql.legacy.parquet.nanosAsLong), " +
          "Timestamp, TimestampNTZ. Refusing to guess — a wrong epoch " +
          "derivation here corrupts every downstream flow query.")
    }
    ev.select(
      ev("event_id").as("seq"),
      timeReceived.as("time_received"),
      (lit(1L) + ev("user_id") % 4).as("sampling_rate"),
      (lit(65000L) + ev("user_id") % 3).cast("int").as("src_as"),
      (lit(65000L) + expr("user_id div 3") % 3).cast("int").as("dst_as"),
      when(ev("event_id") % 4 < 3, lit(2048)).otherwise(lit(34525)).as("etype"),
      when(ev("user_id") % 2 === 0, lit(6)).otherwise(lit(17)).as("proto"),
      ((ev("event_id") * 7919L) % 65536L).cast("int").as("src_port"),
      ((ev("event_id") * 104729L) % 65536L).cast("int").as("dst_port"),
      (floor(abs(ev("value")) * 1000).cast("long") % 1500L).as("bytes"),
      (lit(1L) + (floor(abs(ev("value")) * 1000).cast("long") % 1500L) % 100L).as("packets"),
      ((ev("user_id") * 2654435761L) % 4294967296L).as("src_ip"),
      (((ev("user_id") + 77L) * 2246822519L) % 4294967296L).as("dst_ip"),
      // the raw scan column, kept so range predicates have a form that
      // reaches parquet row-group stats (see rawTsBound)
      ev("ts").as("__raw_ts"))
  }

  /** Scan-pushable companion of a seconds range predicate: a bound on the
    * DERIVED `time_received` (`ts div 1e9`) never reaches the parquet scan
    * (PushedFilters showed only IsNotNull in the r2 plan dump — a full scan
    * per dashboard query at scale). For non-negative ts,
    * `ts div G >= a  ⟺  ts >= a*G`, so this equivalent raw-column bound
    * pushes down to row-group stats while the derived predicate keeps the
    * exact semantics. */
  def rawTsBound(df: org.apache.spark.sql.DataFrame, fromSec: Long, untilSec: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.find(_.name == "__raw_ts").map(_.dataType) match {
      case Some(LongType) =>
        col("__raw_ts") >= fromSec * 1000000000L && col("__raw_ts") < untilSec * 1000000000L
      case Some(TimestampType) =>
        col("__raw_ts") >= timestamp_seconds(lit(fromSec)) &&
          col("__raw_ts") < timestamp_seconds(lit(untilSec))
      case Some(TimestampNTZType) =>
        // NTZ-typed literals (java.time.LocalDateTime → TimestampNTZType):
        // a TimestampType bound here would insert a cast around the column
        // and the comparison would no longer reach the parquet scan
        col("__raw_ts") >= lit(ntzLocal(fromSec)) &&
          col("__raw_ts") < lit(ntzLocal(untilSec))
      case Some(other) => throw new IllegalStateException(
        s"__raw_ts has unsupported type $other — the scan-pushable time " +
          "bound would be silently dropped (full scan per dashboard query " +
          "at scale). Teach rawTsBound AND rawTsBoundSql this type.")
      // no raw scan column in this relation (e.g. a derived view that
      // dropped it): nothing to push, the derived bound alone is correct
      case None => lit(true)
    }
  }

  /** Epoch seconds → the UTC wall-clock `LocalDateTime` an NTZ column
    * stores (session timezone is pinned to UTC by [[graft.GraftSession]]). */
  private def ntzLocal(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  /** Explicit-seconds render for SQL literals (LocalDateTime.toString drops
    * `:00` seconds, and we want the literal stable for tests/logs). */
  private def ntzText(sec: Long): String =
    ntzLocal(sec).format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** SQL-text twin of [[rawTsBound]], kept ADJACENT so the two renderings
    * of the same bound (Column for the DataFrame surface, text for
    * [[DashboardSql]]'s `$timeFilter`) cannot silently diverge: same type
    * dispatch, same seconds→nanos constant. Empty string when the schema
    * carries no raw scan column. */
  def rawTsBoundSql(schema: org.apache.spark.sql.types.StructType,
      fromSec: Long, untilSec: Long): String = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    schema.find(_.name == "__raw_ts").map(_.dataType) match {
      case Some(LongType) =>
        s" AND __raw_ts >= ${fromSec * 1000000000L} AND __raw_ts < ${untilSec * 1000000000L}"
      case Some(TimestampType) =>
        s" AND __raw_ts >= timestamp_seconds($fromSec) AND __raw_ts < timestamp_seconds($untilSec)"
      case Some(TimestampNTZType) =>
        // TIMESTAMP_NTZ literal keeps the comparison cast-free on the
        // column, same as the lit(LocalDateTime) in rawTsBound
        s" AND __raw_ts >= TIMESTAMP_NTZ '${ntzText(fromSec)}'" +
          s" AND __raw_ts < TIMESTAMP_NTZ '${ntzText(untilSec)}'"
      case Some(other) => throw new IllegalStateException(
        s"__raw_ts has unsupported type $other — the scan-pushable time " +
          "bound would be silently dropped. Teach rawTsBoundSql AND " +
          "rawTsBound this type.")
      // no raw scan column: nothing to push, derived bound alone is correct
      case None => ""
    }
  }

  /** DuckDB CTE computing the identical flows relation from `events`.
    * Prefix for every flow-surface oracle query.
    */
  val ducksql: String =
    """WITH flows AS (
      |  SELECT
      |    event_id AS seq,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS time_received,
      |    1 + user_id % 4 AS sampling_rate,
      |    CAST(65000 + user_id % 3 AS INT) AS src_as,
      |    CAST(65000 + (user_id // 3) % 3 AS INT) AS dst_as,
      |    CAST(CASE WHEN event_id % 4 < 3 THEN 2048 ELSE 34525 END AS INT) AS etype,
      |    CAST(CASE WHEN user_id % 2 = 0 THEN 6 ELSE 17 END AS INT) AS proto,
      |    CAST((event_id * 7919) % 65536 AS INT) AS src_port,
      |    CAST((event_id * 104729) % 65536 AS INT) AS dst_port,
      |    CAST(floor(abs(value) * 1000) AS BIGINT) % 1500 AS bytes,
      |    1 + (CAST(floor(abs(value) * 1000) AS BIGINT) % 1500) % 100 AS packets,
      |    (user_id * 2654435761) % 4294967296 AS src_ip,
      |    ((user_id + 77) * 2246822519) % 4294967296 AS dst_ip,
      |    ts AS __raw_ts
      |  FROM events
      |)
      |""".stripMargin
}
