package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.flow.FlowAdapter

/** AS-OF JOIN: match each fact row to the latest dimension version whose
  * effective time is ≤ the fact's time — enrichment against time-versioned
  * dimensions (the reference's processor roadmap maps IPs/ASNs "to
  * countries, ASN or customer information", `/root/reference/README.md:
  * 44-51`; real AS/geo databases are released in dated versions, so the
  * historically-correct join is as-of, not equality: a flow from March must
  * join March's database, not today's).
  *
  * Spark has no asof-join operator. The scalable composition (preference
  * (a) of the custom-op ladder) is union + ordered forward-fill,
  * SUB-PARTITIONED on (key, coarse time bucket) so a hot key does not
  * serialize through one task:
  *
  *  1. tag dim rows (side 0) and fact rows (side 1) into one relation;
  *  2. derive a bucket width from the fact time range (a broadcast 1-row
  *     min/max aggregate — no driver round-trip) and give every row a
  *     bucket id `(t - tmin) div width`;
  *  3. per (key, bucket) present on the fact side, compute the BOUNDARY
  *     version — the newest dim version effective strictly before the
  *     bucket's start instant — with an equality join on the key (the
  *     range predicate rides as a post-join filter) + `max_by`; it enters
  *     the union as side -1 at the bucket-start instant, so it seeds the
  *     fill but loses ties to a real version effective exactly at start;
  *  4. ONE hash exchange on (key, bucket), sort within partitions by
  *     (time, side) — dim versions sort before facts at the same instant,
  *     so a version effective AT t applies to facts at t;
  *  5. running `last(dim_payload, ignoreNulls)` over the ordered frame
  *     forward-fills each fact row with the newest version at-or-before
  *     it; the payload rides ONE struct column, so the fill is row-atomic
  *     (a later version's null field never inherits an older version's
  *     value);
  *  6. keep side 1, expand the struct: left-join semantics — facts before
  *     the first version carry nulls.
  *
  * Scale shape: the big exchange is keyed on (key, bucket), sized by the
  * fact table — a Zipfian-hot key (one giant ASN carrying most of the
  * traffic) spreads across `timeBuckets` tasks instead of sorting the
  * world in one. The boundary side is tiny: |distinct (key, bucket)| ≤
  * keys × buckets rows probing the dim with an equi-join, and the dim can
  * be arbitrarily large (no broadcast of the version history). The window
  * frame is running-last (O(1) state per row, no buffering). Catalyst
  * plans the spine as Exchange(k,b) → Sort → Window → Filter → Project,
  * all but Window whole-stage-codegen'd; the fact side is scanned twice
  * more (bounds aggregate + distinct (k,b)), both narrow two-column
  * column-pruned scans.
  */
object AsofJoin {

  /** Default sub-partition count per join key. At 1000 executors a hot key
    * fans out to 64 sorts; raise for extreme skew, 1 = legacy single
    * window per key. */
  val DefaultTimeBuckets = 64

  /** Left as-of join. `fact`'s columns pass through; `dim`'s payload
    * columns (everything but `dimKey`/`dimTime`) append, null where no
    * version is effective yet. Payload names must not collide with fact
    * names (rename on the way in). */
  def asofJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      factTime: String, dimTime: String,
      timeBuckets: Int = DefaultTimeBuckets): DataFrame = {
    val factCols = fact.columns.toSeq
    val dimPayload = dim.columns.toSeq.filterNot(c => c == dimKey || c == dimTime)
    require(dimPayload.nonEmpty, "dim must carry payload columns beyond key+time")
    require(timeBuckets >= 1, s"timeBuckets must be >= 1, got $timeBuckets")
    val clash = factCols.intersect(dimPayload)
    require(clash.isEmpty, s"dim payload collides with fact columns: $clash")
    val union = taggedUnion(fact, dim, factKey, dimKey, factTime, dimTime, timeBuckets)
    val w = Window.partitionBy("__k", "__b").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    union
      .withColumn("__v", last("__dim", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(factCols.map(c => col(s"__fact.$c").as(c))
        ++ dimPayload.map(c => col(s"__v.$c").as(c)): _*)
  }

  /** Lossless numeric image of a time column, for bucket arithmetic.
    * Timestamps map to MICROSECONDS — `cast(ts as long)` truncates to
    * whole seconds, which let two versions released in the same second
    * tie in the boundary `max_by` and seed a bucket with the stale one.
    * None for types with no exact numeric image (e.g. strings): the
    * caller falls back to the single-window path, whose ordering works
    * for any orderable type. */
  private def toNum(c: org.apache.spark.sql.Column,
      t: org.apache.spark.sql.types.DataType): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}
    t match {
      case TimestampType => Some(unix_micros(c))
      // NTZ reads its wall-clock in the session timezone (pinned UTC by
      // GraftSession) — a monotone, exact micros image. Without this case
      // an NTZ time column (the driver's current events.ts encoding) would
      // silently fall to the single-window path: correct, but the exact
      // "environment drift quietly degrades the plan" failure mode of the
      // r10 rawTsBound bug.
      case TimestampNTZType => Some(unix_micros(c.cast(TimestampType)))
      case DateType => Some(unix_micros(c.cast(TimestampType)))
      case _: NumericType => Some(c.cast("long"))
      case _ => None
    }
  }

  /** Inverse of [[toNum]] for rendering a boundary-seed instant back in
    * the time column's type. A Date seed truncates to its day — still ≤
    * the bucket start, and the seed's placement rides the explicit `__b`
    * column, so ordering stays correct. */
  private def fromNum(c: org.apache.spark.sql.Column,
      t: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    t match {
      case TimestampType => timestamp_micros(c)
      case TimestampNTZType => timestamp_micros(c).cast(TimestampNTZType)
      case DateType => timestamp_micros(c).cast(DateType)
      case _ => c.cast(t)
    }
  }

  /** The tagged, bucketed union the forward-fill window runs over —
    * exposed for plan/partitioning assertions in AsofJoinSpec. Columns:
    * `__k, __t, __side, __b, __dim, __fact`. */
  private[graft] def taggedUnion(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, factTime: String, dimTime: String,
      timeBuckets: Int): DataFrame = {
    val factCols = fact.columns.toSeq
    val dimPayload = dim.columns.toSeq.filterNot(c => c == dimKey || c == dimTime)
    val keyT = fact.schema(factKey).dataType
    val timeT = fact.schema(factTime).dataType
    // the dim key must cast to the fact key's type WITHOUT loss: a plain
    // down-cast silently wraps/nulls under non-ANSI mode, matching wrong
    // keys (r7 review) — equal types or a widening cast only
    val dimKeyT = dim.schema(dimKey).dataType
    require(dimKeyT == keyT ||
      org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(dimKeyT, keyT),
      s"dim key type $dimKeyT does not widen to fact key type $keyT")
    // null join keys match NOTHING (SQL join semantics, and what the
    // boundary equi-join already does): a null-key dim version must not
    // forward-fill null-key facts via the window's null-grouping
    val dimSide = dim.filter(col(dimKey).isNotNull).select(
      col(dimKey).cast(keyT).as("__k"), col(dimTime).cast(timeT).as("__t"),
      lit(0).as("__side"), struct(dimPayload.map(col): _*).as("__dim"))
    val factSide = fact.select(
      col(factKey).as("__k"), col(factTime).as("__t"),
      lit(1).as("__side"), struct(factCols.map(col): _*).as("__fact"))
    val timeNum = toNum(col("__t"), timeT)
    if (timeBuckets == 1 || timeNum.isEmpty)
      return dimSide.unionByName(factSide, allowMissingColumns = true)
        .withColumn("__b", lit(0L))
    val tn = timeNum.get

    // Bucket width from the fact time range: broadcast 1-row aggregate,
    // integer `div` (a float divide could misplace boundary rows when the
    // numeric time exceeds double's 2^53 mantissa, e.g. epoch nanos).
    val bounds = broadcast(factSide.agg(
        min(tn).as("__tmin"), max(tn).as("__tmax"))
      .select(col("__tmin"),
        expr(s"greatest((__tmax - __tmin) div $timeBuckets + 1, 1L)").as("__w")))

    val factB = factSide.crossJoin(bounds)
      .withColumn("__tn", tn)
      .withColumn("__b", expr("(__tn - __tmin) div __w"))
    // versions effective inside the fact range ride their own bucket;
    // earlier (and later) ones reach facts only via the boundary join
    val dimB = dimSide.crossJoin(bounds)
      .withColumn("__tn", tn)
      .filter(col("__tn") >= col("__tmin") &&
        col("__tn") <= col("__tmin") + col("__w") * lit(timeBuckets.toLong))
      .withColumn("__b", expr("(__tn - __tmin) div __w"))

    // Boundary seed per fact-side (key, bucket): newest version strictly
    // before the bucket start. Equality join on the key — the time bound
    // is a post-join filter, group sizes bounded by versions-per-key.
    val factKB = factB.select("__k", "__b", "__tmin", "__w").distinct()
    val boundary = factKB
      .join(dim.select(col(dimKey).cast(keyT).as("__k"),
        toNum(col(dimTime).cast(timeT), timeT).get.as("__dtn"),
        struct(dimPayload.map(col): _*).as("__dim")), Seq("__k"))
      .filter(col("__dtn") < col("__tmin") + col("__b") * col("__w"))
      .groupBy("__k", "__b", "__tmin", "__w")
      .agg(max_by(col("__dim"), col("__dtn")).as("__dim"))
      .select(col("__k"),
        fromNum(col("__tmin") + col("__b") * col("__w"), timeT).as("__t"),
        lit(-1).as("__side"), col("__dim"), col("__b"))

    factB.select("__k", "__t", "__side", "__fact", "__b")
      .unionByName(dimB.select("__k", "__t", "__side", "__dim", "__b"),
        allowMissingColumns = true)
      .unionByName(boundary, allowMissingColumns = true)
  }

  // --------------------------------------------------------------- registry

  type Q = (SparkSession, String) => DataFrame

  /** Time-versioned AS dimension fixture: three dated releases (v0..v2) of
    * the nation⋈region AS database, effective at the quarter points of the
    * flow time range (computed via a broadcast 1-row bounds aggregate, no
    * driver round-trip). `+1` on the epoch start leaves the earliest
    * flow(s) before ANY version — exercising the left semantics. */
  def versionedAsDims(spark: SparkSession, dir: String): DataFrame = {
    val flows = FlowAdapter.flows(spark, dir)
    val bounds = flows.agg(min("time_received").as("tmin"), max("time_received").as("tmax"))
    val versions = spark.range(3).toDF("v")
    Tables.nation(spark, dir)
      .crossJoin(broadcast(bounds)).crossJoin(broadcast(versions))
      .select((lit(65000) + col("n_nationkey")).cast("int").as("asn"),
        concat(col("n_name"), lit("/v"), col("v")).as("as_name"),
        (col("v") + 1).cast("int").as("asdb"),
        (col("tmin") + lit(1L) + col("v") * expr("(tmax - tmin) div 4")).as("valid_from"))
  }

  /** flow_enrich_asof: every flow annotated with the AS-database release
    * that was current when it was observed. */
  def flowEnrichAsof(spark: SparkSession, dir: String): DataFrame = {
    val flows = FlowAdapter.flows(spark, dir)
      .select("seq", "time_received", "src_as", "bytes")
    asofJoin(flows, versionedAsDims(spark, dir),
      "src_as", "asn", "time_received", "valid_from")
      .select(col("seq"), col("src_as"),
        coalesce(col("as_name"), lit("--")).as("src_as_name"),
        coalesce(col("asdb"), lit(0)).as("asdb"), col("bytes"))
      .orderBy("seq")
  }

  val queries: Map[String, Q] = Map("flow_enrich_asof" -> (flowEnrichAsof _))

  val oracles: Map[String, String] = Map(
    "flow_enrich_asof" ->
      s"""${FlowAdapter.ducksql.trim}, vd AS (
         |  SELECT CAST(65000 + n_nationkey AS INT) AS asn,
         |    n_name || '/v' || CAST(v AS VARCHAR) AS as_name,
         |    CAST(v + 1 AS INT) AS asdb,
         |    (SELECT min(time_received) FROM flows) + 1
         |      + v * (((SELECT max(time_received) FROM flows)
         |              - (SELECT min(time_received) FROM flows)) // 4) AS valid_from
         |  FROM nation, (SELECT unnest([0, 1, 2]) AS v) vs
         |)
         |SELECT f.seq, f.src_as, coalesce(d.as_name, '--') AS src_as_name,
         |  CAST(coalesce(d.asdb, 0) AS INT) AS asdb, f.bytes
         |FROM flows f ASOF LEFT JOIN vd d
         |  ON f.src_as = d.asn AND f.time_received >= d.valid_from
         |ORDER BY seq""".stripMargin.replace('\n', ' '))
}
