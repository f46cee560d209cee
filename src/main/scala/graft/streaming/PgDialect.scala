package graft.streaming

import org.apache.spark.sql.types._

/** Postgres-dialect contract for the S6 JDBC sink — the compatibility
  * seam between [[FlowStreams.jdbcFlushProjection]]'s 14-column tuple
  * and the reference deployment's ACTUAL table
  * (`compose/postgres/create.sh:5-24`: `id bigserial PRIMARY KEY`,
  * `inet` address columns, `timestamp` times, int/bigint scalars).
  *
  * The sink itself is dialect-agnostic (`DataFrameWriter.jdbc` + the
  * replay guard already resolve identifier quoting through Spark's
  * `JdbcDialects`); what is Postgres-SPECIFIC is whether the tuple the
  * sink ships can land in that DDL at all:
  *
  *  - `id bigserial` is DB-generated — the insert tuple must NOT carry
  *    it (an INSERT listing `id` would need a value and break the
  *    sequence; the Go inserter likewise omits it,
  *    `inserter.go:142-158`).
  *  - `src_ip`/`dst_ip` are `inet`. The sink renders addresses as
  *    strings ([[graft.GraftFunctions.ip_string]], Go-parity
  *    `net.IP.String()`), and pgjdbc sends `setString` parameters as
  *    VARCHAR — Postgres does NOT implicitly cast varchar→inet, so a
  *    default connection rejects the insert with "column is of type
  *    inet but expression is of type character varying". The standard
  *    fix is the pgjdbc connection property `stringtype=unspecified`,
  *    which sends string parameters as UNKNOWN and lets Postgres infer
  *    `inet` from the target column. [[pgProps]] bakes that in;
  *    [[validateInsertTuple]] refuses a string→inet mapping without it.
  *  - `date_inserted`/`time_flow` are `timestamp` (no tz): Spark
  *    TimestampType binds as JDBC TIMESTAMP — compatible directly
  *    (`NOW()`-style insert time is produced engine-side by the
  *    projection's `current_timestamp()`, F17).
  *  - `type`/`sampling_rate`/`etype`/`proto`/`src_port`/`dst_port` are
  *    `integer`, `src_as`/`dst_as`/`bytes`/`packets` are `bigint`:
  *    Spark Integer/LongType bind as INT4/INT8, and Postgres applies
  *    assignment-context casts in BOTH directions — widening (int4→
  *    bigint) silently, narrowing (int8→integer) with a runtime range
  *    check. The narrowing pair is load-bearing: the wire
  *    `sampling_rate` is uint64 (decoded LongType) landing in an
  *    `integer` column, exactly what the Go inserter relies on too.
  *
  * The exactly-once variant appends a `batch_id` BIGINT discriminator
  * column; against the reference DDL that column must first exist
  * (`ALTER TABLE flows ADD COLUMN batch_id bigint`) — validated as an
  * optional extension column, and [[replayGuardDdl]] prints the exact
  * statement.
  */
object PgDialect {

  /** The reference `flows` table, column → Postgres type, in DDL order
    * (`compose/postgres/create.sh:5-24`). `id` is the DB-generated
    * surrogate key. */
  val FlowsDdl: Seq[(String, String)] = Seq(
    "id" -> "bigserial",
    "date_inserted" -> "timestamp",
    "time_flow" -> "timestamp",
    "type" -> "integer",
    "sampling_rate" -> "integer",
    "src_as" -> "bigint",
    "dst_as" -> "bigint",
    "src_ip" -> "inet",
    "dst_ip" -> "inet",
    "bytes" -> "bigint",
    "packets" -> "bigint",
    "etype" -> "integer",
    "proto" -> "integer",
    "src_port" -> "integer",
    "dst_port" -> "integer")

  private val GeneratedColumns = Set("id")

  /** Recommended pgjdbc connection properties for the sink: without
    * `stringtype=unspecified` the string-rendered addresses cannot land
    * in the `inet` columns (see class doc). `reWriteBatchedInserts`
    * collapses the micro-flush's row-at-a-time batch into multi-row
    * INSERTs server-side — the same wire shape as the Go inserter's
    * hand-built 100-row statement (`inserter.go:90-111`). */
  def pgProps(user: String, password: String): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", "org.postgresql.Driver")
    p.setProperty("stringtype", "unspecified")
    p.setProperty("reWriteBatchedInserts", "true")
    p
  }

  /** `ALTER TABLE` the reference DDL needs before
    * [[FlowStreams.startJdbcSinkExactlyOnce]] can target it (the replay
    * guard's per-batch discriminator). */
  def replayGuardDdl(table: String = "flows"): String =
    s"ALTER TABLE $table ADD COLUMN IF NOT EXISTS batch_id bigint"

  /** Can a Spark column of `dt` bind into a Postgres column of
    * `pgType` through pgjdbc? `stringtypeUnspecified` reflects whether
    * the connection carries the property [[pgProps]] sets. */
  private[streaming] def bindable(dt: DataType, pgType: String,
      stringtypeUnspecified: Boolean): Boolean = (dt, pgType) match {
    case (TimestampType, "timestamp") => true
    case (IntegerType, "integer") => true
    case (IntegerType, "bigint") => true // int4 widens
    case (LongType, "integer") => true // int8→int4 assignment cast (range-checked at runtime)
    case (LongType, "bigint") => true
    case (LongType, "bigserial") => true // sequences are int8-backed
    case (StringType, "inet") => stringtypeUnspecified
    case (StringType, "text" | "varchar") => true
    case _ => false
  }

  /** Validate an insert-tuple schema against the reference DDL. Returns
    * the list of violations (empty = the tuple lands); checks, in the
    * spirit of "the 14-col insert verified against the actual DDL":
    *  - no generated column (`id`) in the tuple;
    *  - every tuple column exists in the DDL (plus the optional
    *    `batch_id` extension, which requires [[replayGuardDdl]]);
    *  - every (SparkType → pg type) pair is pgjdbc-bindable, with the
    *    inet/string coupling tied to `stringtypeUnspecified`;
    *  - every non-generated DDL column is present (the reference table
    *    declares them nullable-with-default, so absence would not fail
    *    the INSERT — but it would silently drop flow fields, which is a
    *    projection bug, not a dialect freedom). */
  def validateInsertTuple(schema: StructType,
      stringtypeUnspecified: Boolean = true): Seq[String] = {
    val ddl = FlowsDdl.toMap
    val fromTuple = schema.fields.toSeq.flatMap { f =>
      if (GeneratedColumns.contains(f.name))
        Some(s"column '${f.name}' is DB-generated (${ddl(f.name)}) and must not be in the insert tuple")
      else if (f.name == "batch_id")
        if (f.dataType == LongType) None
        else Some(s"batch_id must be BIGINT-bindable (LongType), got ${f.dataType.simpleString}")
      else ddl.get(f.name) match {
        case None =>
          Some(s"column '${f.name}' does not exist in the flows DDL")
        case Some(pg) if !bindable(f.dataType, pg, stringtypeUnspecified) =>
          Some(s"column '${f.name}': Spark ${f.dataType.simpleString} cannot bind into Postgres $pg" +
            (if (pg == "inet" && f.dataType == StringType)
              " without stringtype=unspecified on the connection (see PgDialect.pgProps)"
            else ""))
        case _ => None
      }
    }
    val present = schema.fieldNames.toSet
    val missing = FlowsDdl.collect {
      case (name, _) if !GeneratedColumns.contains(name) && !present.contains(name) =>
        s"DDL column '$name' is absent from the insert tuple (field would be silently NULL)"
    }
    fromTuple ++ missing
  }
}
