package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query surface: the reference's designed-in enrichment join
  * (`/root/reference/README.md:44-51` — a dimension lookup against the flow
  * stream; schema slots at `pb-ext/flow.pb.go:140-143`) realized as broadcast
  * hash joins over the driver's star schema, plus the join/window/set-op
  * surface a Spark user expects (SURVEY.md §2.5 roadmap).
  *
  * Determinism for oracle parity: money aggregates floor each row's value to
  * integer cents *before* summing — per-row double ops are bit-identical on
  * both engines, and integer sums are order-independent. Single final
  * divisions (cents/100.0) are exact-match afterwards.
  *
  * Scale notes: dimension sides (region/nation/customer at any realistic SF)
  * are explicitly `broadcast()` — no shuffle of the fact table; the
  * lineitem⋈orders join shuffles both sides on the join key once, which AQE
  * may convert to broadcast at runtime when the filtered side is small.
  * Window top-N per group shuffles once on the partition key.
  */
object RelQueries {
  type Q = (SparkSession, String) => DataFrame

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100).cast("long")

  /** Enrichment broadcast join: customer → nation → region rollup. */
  def enrichJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    cust
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("customer_count"),
        sum(cents(col("c_acctbal"))).as("acctbal_cents"))
      .orderBy("r_name", "n_name")
  }

  /** Fact⋈fact join: revenue by order priority (lineitem ⋈ orders). */
  def revenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(cents(li("l_extendedprice") * (lit(1.0) - li("l_discount")))).as("revenue_cents"),
        count(lit(1)).as("line_count"))
      .orderBy("o_orderpriority")
  }

  /** Semi join (EXISTS): orders having at least one heavy line. */
  def ordersWithHeavyLines(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val heavy = Tables.lineitem(spark, dir).filter(col("l_quantity") > 45)
    o.join(heavy, o("o_orderkey") === heavy("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** Anti join (NOT EXISTS): customers with no urgent orders. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Window ranking: top-3 orders per customer by total price (the
    * Spark-native upgrade of the dashboards' sort-desc top-N, SURVEY §2.5). */
  def top3OrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("total_cents"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("total_cents").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Distinct aggregation: exact + per-group distinct part counts. */
  def distinctParts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
        count(lit(1)).as("line_count"))
      .orderBy("l_returnflag")

  /** Global top-N: TakeOrderedAndProject, no full sort. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("total_cents"))
      .orderBy(desc("total_cents"), asc("o_orderkey"))
      .limit(25)

  /** Multi-way join + filter: revenue per nation for one region (TPC-H Q5
    * shape — the full enrichment cascade). */
  def revenuePerNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(li("l_extendedprice") * (lit(1.0) - li("l_discount")))).as("revenue_cents"),
        count(lit(1)).as("line_count"))
      .orderBy("n_name")
  }

  /** Grouping-sets aggregate: ROLLUP(l_returnflag, l_linestatus) computes
    * the detail, per-flag subtotal, and grand-total rows in ONE pass —
    * Catalyst expands the grouping sets into a single Expand +
    * partial-combined HashAggregate (3× the agg input rows, ONE shuffle),
    * not three scans of the fact table. `gid` (Spark `grouping_id` =
    * DuckDB `GROUPING`, same bit order: first column is the MSB)
    * disambiguates subtotal rows from genuine NULL group keys. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        sum(cents(col("l_extendedprice"))).as("price_cents"),
        count(lit(1)).as("line_count"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
        col("price_cents"), col("line_count"))
      .orderBy(asc("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))

  /** TPC-H Q3 shape — shipping priority: unshipped-revenue top-10 for one
    * market segment, with date predicates on BOTH fact scans
    * (`o_orderdate < D ∧ l_shipdate > D` reach the parquet scans as
    * pushed filters on the micros-NTZ columns), a broadcast customer
    * filter, one fact⋈fact shuffle join, and TakeOrderedAndProject for
    * the top-10. The canonical "filtered star join + top-N" dashboard
    * shape at any scale. */
  def shippingPriority(spark: SparkSession, dir: String,
      segment: String = "BUILDING", cutoff: String = "1998-01-01 00:00:00"): DataFrame = {
    val cut = expr(s"TIMESTAMP_NTZ '$cutoff'")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === segment).select("c_custkey")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cut)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(cents(l("l_extendedprice") * (lit(1.0) - l("l_discount")))).as("revenue_cents"))
      .orderBy(desc("revenue_cents"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q2 shape — min-cost supplier: for every part of one brand, the
    * supplier behind the CHEAPEST line sold for it (ties → lowest
    * suppkey). The correlated-subquery pattern (`WHERE cost = (SELECT
    * min(cost) ... WHERE same part)`) realized as a JOIN-AGAINST-AGGREGATE:
    * aggregate once per part, join the fact rows back on (part, cost).
    *
    * Scale shape: the brand filter broadcasts into the fact scan FIRST
    * (the part side is a filtered dimension at any SF), so both the
    * aggregate and the join-back run over the reduced fact; the aggregate
    * and the join-back key on the SAME l_partkey hash partitioning (one
    * exchange feeds both sides — no re-shuffle for the self-join); the
    * supplier name lookup broadcasts. Never a window over the unfiltered
    * fact, never a cartesian. */
  def minCostSupplier(spark: SparkSession, dir: String,
      brand: String = "Brand#13"): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === brand).select("p_partkey", "p_name")
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"),
      cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("cost_cents"))
    val lip = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("l_suppkey"), col("cost_cents"))
    val minc = lip.groupBy(col("p_partkey").as("m_partkey"))
      .agg(min("cost_cents").as("min_cost_cents"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    lip.join(minc, col("p_partkey") === col("m_partkey")
        && col("cost_cents") === col("min_cost_cents"))
      .groupBy(col("p_partkey"), col("p_name"), col("min_cost_cents"))
      .agg(min("l_suppkey").as("s_suppkey"))
      .join(broadcast(s), "s_suppkey")
      .select("p_partkey", "p_name", "min_cost_cents", "s_suppkey", "s_name")
      .orderBy("p_partkey")
  }

  /** Set operations (INTERSECT / EXCEPT — the §2.5 set-op roadmap rows):
    * customers holding BOTH an urgent and a low-priority order, and those
    * holding urgent only. Catalyst plans both as distinct-semantics
    * left-semi / left-anti hash joins over the deduplicated sides — no
    * sort, no full materialization of either branch. */
  def urgentAndLowCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .intersect(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
      .orderBy("o_custkey")
  }

  def urgentOnlyCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .except(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** BUCKETIZED INTERVAL JOIN — the scale-safe form of a range join: how
    * many lineitems (of any order) shipped inside each order's first week
    * `[o_orderdate, o_orderdate + 7d)`. A naive range join is a
    * cross-join + filter (quadratic at scale); here both sides bucket to
    * the 7-day grid — each interval covers at most TWO buckets, so the
    * fan-out is a constant ×2 of the orders side — and the join is an
    * EQUI-join on the bucket with the exact range predicate applied to
    * the co-bucketed candidates only. A matching lineitem's bucket is
    * unique, so no pair is produced twice and no dedup pass is needed;
    * zero-match orders are restored by one left join against the
    * order-keyed counts. */
  /** Interval span, shared with the oracle rendering (anti-drift rule). */
  val IntervalSpanDays: Int = 7

  def intervalJoin(spark: SparkSession, dir: String, spanDays: Int = IntervalSpanDays): DataFrame = {
    val day = 86400L
    val span = spanDays * day
    val oo = Tables.orders(spark, dir)
      .select(col("o_orderkey"), expr("unix_timestamp(o_orderdate)").as("o_sec"))
    val ll = Tables.lineitem(spark, dir)
      .select(expr("unix_timestamp(l_shipdate)").as("s_sec"))
      .withColumn("bucket", (col("s_sec") / span).cast("long"))
    val fan = oo.withColumn("bucket",
      explode(array_distinct(array(
        (col("o_sec") / span).cast("long"),
        ((col("o_sec") + span - 1) / span).cast("long")))))
    val counts = fan.join(ll, "bucket")
      .filter(col("s_sec") >= col("o_sec") && col("s_sec") < col("o_sec") + span)
      .groupBy("o_orderkey").agg(count(lit(1)).as("n_shipped"))
    oo.join(counts, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), col("o_sec"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
      .orderBy("o_orderkey")
  }

  /** PREFIX-SUM form of [[intervalJoin]] — the sf0.1 bench measured the
    * bucketized pair join at 58.9 s: the range predicate is NOT selective
    * here (each order's week genuinely matches ~0.3% of all lineitems),
    * so ANY pair-materializing plan — naive or bucketized — pays for
    * ~250M matched rows that the query then immediately counts away.
    * The count-per-order never needs the pairs: with day-grain
    * timestamps, `|{s : o <= s < o+7d}| = F(o_day+6) − F(o_day−1)` where
    * F is the cumulative per-day ship count. F lives on a CALENDAR-sized
    * relation (one row per day in the span — thousands of rows at any
    * corpus size), built with one aggregate + one tiny window and
    * BROADCAST to two equi-joins. Day-grain is load-bearing, so it is
    * GUARDED: any non-midnight timestamp raises instead of silently
    * shifting a boundary (the pairwise [[intervalJoin]] stays for
    * arbitrary-precision inputs). */
  def intervalJoinPrefix(spark: SparkSession, dir: String, spanDays: Int = IntervalSpanDays): DataFrame = {
    val day = 86400L
    def dayOf(sec: Column, what: String): Column =
      when(sec % day === 0, (sec / day).cast("long"))
        .otherwise(raise_error(concat(
          lit(s"rel_interval_join prefix form needs midnight-aligned $what; got epoch "),
          sec, lit(" — use the pairwise intervalJoin for sub-day timestamps"))))
    val oo = Tables.orders(spark, dir)
      .select(col("o_orderkey"), expr("unix_timestamp(o_orderdate)").as("o_sec"))
      .withColumn("o_day", dayOf(col("o_sec"), "o_orderdate"))
    val daily = Tables.lineitem(spark, dir)
      .select(dayOf(expr("unix_timestamp(l_shipdate)"), "l_shipdate").as("s_day"))
      .groupBy("s_day").agg(count(lit(1)).as("c"))
    // calendar span covering every query point: one row per day
    val bounds = daily.agg(min("s_day").as("lo"), max("s_day").as("hi"))
      .crossJoin(oo.agg((min("o_day") - 1).as("olo"), (max("o_day") + spanDays).as("ohi")))
      .select(least(col("lo"), col("olo")).as("lo"), greatest(col("hi"), col("ohi")).as("hi"))
    val calendar = bounds.select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val cum = calendar.join(daily, calendar("day") === daily("s_day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("f", sum("c").over(org.apache.spark.sql.expressions.Window
        .orderBy("day").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select("day", "f")
    val hi = cum.select(col("day").as("hi_day"), col("f").as("f_hi"))
    val lo = cum.select(col("day").as("lo_day"), col("f").as("f_lo"))
    oo.join(broadcast(hi), col("hi_day") === col("o_day") + (spanDays - 1))
      .join(broadcast(lo), col("lo_day") === col("o_day") - 1)
      .select(col("o_orderkey"), col("o_sec"),
        (col("f_hi") - col("f_lo")).as("n_shipped"))
      .orderBy("o_orderkey")
  }

  /** NTILE quartile bucketing of customers by account balance — the
    * exact small-dimension form of quantile segmentation (per-quartile
    * counts and integer-cents bounds). The tie-break on (cents, custkey)
    * makes the bucket assignment a function of the data alone, so the
    * oracle matches row-for-row. NTILE needs a TOTAL order by
    * definition — THIS EXACT FORM IS DIMENSION-ONLY (customers): a
    * fact-sized population funnels through one task's global sort; use
    * [[customerQuartilesSketch]] (`rel_customer_quartiles_sketch`) or the
    * sketch panels (`flow_bytes_quantiles*`) there. */
  def customerQuartiles(spark: SparkSession, dir: String, n: Int = 4): DataFrame = {
    val w = Window.orderBy(col("cents").asc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), cents(col("c_acctbal")).as("cents"))
      .withColumn("quartile", ntile(n).over(w))
      .groupBy("quartile")
      .agg(count(lit(1)).as("customer_count"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        sum("cents").as("sum_cents"))
      .orderBy("quartile")
  }

  /** SKETCH-CUT-POINT quartiles — the fact-scale form of
    * [[customerQuartiles]] (same device as
    * [[graft.operators.EventOps.rfmSketch]]): cut points from the
    * mergeable KLL sketch over the tie-broken composite
    * `cents + (custkey % 2²⁰)/2²⁰` (cents ≤ ~10⁶, so the fraction is
    * exactly representable and the value order IS NTILE's (cents,
    * custkey) total order), then each customer buckets by comparing
    * against the n-1 broadcast cut values — no global sort anywhere;
    * bucket counts stay within KLL rank error (≤3.3% at k=200) of the
    * exact NTILE form (RelQueriesSpec pins it).
    *
    * Oracle form (`strict = true`, k ≥ the customer count at driver
    * scale): exact-regime cut points are the ⌈p·n⌉-th order statistics
    * (`quantile_disc`), making the bucketing deterministic and
    * hash-checkable — the oracle replays the cut-point definition, not
    * NTILE's leftover allocation. Strict throws on regime exit. */
  def customerQuartilesSketch(spark: SparkSession, dir: String, n: Int = 4,
      k: Int = 200, strict: Boolean = false): DataFrame = {
    import graft.functions.QuantileSketch
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), cents(col("c_acctbal")).as("cents"))
      .withColumn("tb",
        col("cents").cast("double") +
          (col("c_custkey") % 1048576).cast("double") / 1048576.0)
    val probs = (1 until n).map(i => i.toDouble / n)
    val cuts = base.agg(QuantileSketch.quantileSketch(col("tb"), k).as("s"))
      .agg(QuantileSketch.quantileMerge(col("s"), k, probs, strict).as("q"))
    base.crossJoin(broadcast(cuts))
      .withColumn("quartile",
        (lit(1) + (1 until n).map(i =>
          when(col("tb") > element_at(col("q"), i), 1).otherwise(0))
          .reduce(_ + _)).cast("int"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("customer_count"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        sum("cents").as("sum_cents"))
      .orderBy("quartile")
  }

  /** Runtime-filter (Bloom) pre-pruned fact⋈dim semi join — the
    * scan-side technique Spark's own `InjectRuntimeFilter` applies when
    * statistics justify it, exposed here as an EXPLICIT operator so the
    * pruning is guaranteed rather than left to the optimizer's
    * cost-model mood: revenue per return flag over lineitems whose
    * order is URGENT.
    *
    * Mechanics: one small job aggregates the filtered dimension's join
    * keys into a `BloomFilterAggregate` sketch (xxhash64-keyed, exactly
    * the pairing Spark's runtime-filter rewrite uses); the serialized
    * filter travels to the fact scan as a LITERAL inside a
    * `BloomFilterMightContain` predicate — evaluated per row DURING the
    * scan, before the shuffle, so at 100 TB the exchange carries only
    * rows whose key might match (FP rate `fpp`, here ≲3%). The exact
    * LEFT SEMI join then removes the false positives, which is why the
    * oracle is the plain semi join: the Bloom stage must be
    * result-invisible. The driver-side filter build is bounded —
    * `numBits/8` bytes (~256 KiB here) regardless of fact size; the
    * same bound holds against a 100 TB fact table because the filter
    * only ever encodes the DIMENSION side. */
  def bloomSemiJoin(spark: SparkSession, dir: String,
      numItems: Long = 100000L, numBits: Long = 2097152L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import org.apache.spark.sql.types.BinaryType
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(col("o_orderkey")))),
      Literal(numItems), Literal(numBits)).toAggregateExpression()
    // bounded driver collect: the serialized filter (numBits/8 bytes), the
    // same seam InjectRuntimeFilter hides inside a scalar subquery
    val bloomBytes = urgent.select(column(bloomAgg).as("bf")).head.getAs[Array[Byte]]("bf")
    val mightContain = column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Literal.create(bloomBytes, BinaryType),
        new XxHash64(Seq(expression(col("l_orderkey"))))))
    Tables.lineitem(spark, dir)
      .filter(mightContain)                       // scan-side prune (may FP)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi") // exact
      .groupBy(col("l_returnflag"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_cents"),
        count(lit(1)).as("line_count"))
      .orderBy("l_returnflag")
  }

  /** One-scan data-quality profile of a table — the pipeline-health
    * primitive every 100 TB ingest runs before training: per column,
    * row count, non-null count, exact distinct count, and min/max
    * (rendered as strings so one relation profiles heterogeneous
    * columns). Restricted to integer/string columns so the string
    * rendering is engine-portable.
    *
    * Scale shape — two branches, both hash-friendly, cross-joined on
    * their 1-row results (MEASURED at sf0.1, r13): the distinct branch
    * plans the multiple DISTINCT aggregates as one Expand (×|columns|
    * rows) feeding two-phase HASH aggregates (all-long buffers); min/max
    * run as a separate keyless fold over a second column-pruned scan —
    * no sort, empty grouping needs no ordering. The one-pass form that
    * put min/max(STRING) into the same aggregate dragged the whole
    * Expand relation through SortAggregate (a sort of |columns|×rows;
    * string buffers are not hash-aggregable) and benched 9.3 s vs
    * 2.2–4.3 s for this shape — the second scan is the cheap side of
    * that trade at any scale. The approximate twin at unbounded
    * cardinality is `approx_count_distinct` (HLL, no Expand) — exact is
    * the right default while the distinct sets fit the exchange, and the
    * profile's consumers (schema drift alarms) want exact counts. */
  /** Columns [[tableProfile]] profiles — int/string only, so the string
    * min/max rendering is engine-portable (shared with the oracle SQL;
    * EditPrefixLen anti-drift rule: ONE definition for both renderings). */
  private val ProfileCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_returnflag", "l_linestatus")

  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = ProfileCols
    val li = Tables.lineitem(spark, dir)
    val dAggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"), countDistinct(col(c)).as(s"${c}__nd"))
    }
    val mAggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = li.agg(dAggs.head, dAggs.tail: _*)
      .crossJoin(broadcast(li.agg(mAggs.head, mAggs.tail: _*)))
    // pivot the single stats row to long form with ONE generator — no
    // union of re-aggregated branches
    val stackArgs = cols.map(c =>
      s"'$c', n_rows, ${c}__nn, ${c}__nd, ${c}__min, ${c}__max").mkString(", ")
    one.selectExpr(s"stack(${cols.length}, $stackArgs) AS " +
        "(column_name, n_rows, n_nonnull, n_distinct, min_value, max_value)")
      .orderBy("column_name")
  }

  /** Pearson correlation between numeric fact columns in ONE scan — the
    * feature-screening primitive (is quantity priced? does discount track
    * volume?) computed to be bit-identical across engines: the six
    * moments (n, Σx, Σy, Σx², Σy², Σxy) are EXACT integer sums over
    * integer-valued projections (quantity is integral; price floors to
    * whole dollars, discount to milli-units), and the correlation
    * combines them in IEEE double arithmetic with a fixed expression
    * tree — every engine computing `(n·Σxy − ΣxΣy)/√(n·Σx²−(Σx)²)/√(…)`
    * from the SAME exact longs lands on the same float, unlike a
    * streaming `corr()` whose per-partition partial means merge in a
    * data-order-dependent way. One map-combined aggregate, no shuffle of
    * the fact table beyond the 1-row partials. */
  def numericCorr(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_quantity").cast("long").as("q"),
      floor(col("l_extendedprice")).cast("long").as("p"),
      floor(col("l_discount") * 1000).cast("long").as("d"))
    val m = li.agg(
      count(lit(1)).as("n"),
      sum("q").as("sq"), sum("p").as("sp"), sum("d").as("sd"),
      sum(col("q") * col("q")).as("sqq"), sum(col("p") * col("p")).as("spp"),
      sum(col("d") * col("d")).as("sdd"), sum(col("q") * col("p")).as("sqp"),
      sum(col("q") * col("d")).as("sqd"))
    def corr(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column,
        sxy: Column): Column = {
      val nd = n.cast("double")
      val num = nd * sxy.cast("double") - sx.cast("double") * sy.cast("double")
      val dx = sqrt(nd * sxx.cast("double") - sx.cast("double") * sx.cast("double"))
      val dy = sqrt(nd * syy.cast("double") - sy.cast("double") * sy.cast("double"))
      round(num / (dx * dy), 6)
    }
    m.select(col("n"),
      corr(col("n"), col("sq"), col("sp"), col("sqq"), col("spp"), col("sqp"))
        .as("corr_qty_price"),
      corr(col("n"), col("sq"), col("sd"), col("sqq"), col("sdd"), col("sqd"))
        .as("corr_qty_discount"))
  }

  /** TOP SUPPLIER (TPC-H Q15 shape): supplier(s) with the maximum revenue
    * over one ship-quarter — the classic "having = max over a derived
    * view" pattern, realized WITHOUT a correlated subquery or a global
    * window: the per-supplier revenue relation is aggregated once, its
    * 1-row max is broadcast back, and the winners fall out of a
    * broadcast equality join (ties all surface, ordered by key).
    *
    * Scale shape: the quarter predicate pushes into the lineitem scan
    * (row-group pruning); the revenue aggregate's exchange is shared by
    * the max branch (identical single-sum subtree → exchange reuse — the
    * plan contract pins ONE lineitem scan); both the max and the supplier
    * name lookup are broadcasts. */
  def topSupplier(spark: SparkSession, dir: String,
      qStart: String = "1996-01-01 00:00:00", qEnd: String = "1996-04-01 00:00:00"): DataFrame = {
    // the explicit null-key filter matters for the PLAN, not the data:
    // the supplier join pushes isnotnull(l_suppkey) into the probe branch
    // only, which de-canonicalizes the two revenue subtrees and defeats
    // exchange reuse (measured: a second full lineitem scan). Stating it
    // once here keeps both branches identical; the oracle carries the
    // same predicate.
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= expr(s"TIMESTAMP_NTZ '$qStart'") &&
        col("l_shipdate") < expr(s"TIMESTAMP_NTZ '$qEnd'") &&
        col("l_suppkey").isNotNull)
    val rev = li.groupBy("l_suppkey")
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
    val mx = rev.agg(max("revenue_cents").as("mx"))
    val sup = Tables.supplier(spark, dir)
    rev.join(broadcast(mx), rev("revenue_cents") === mx("mx"))
      .join(broadcast(sup), rev("l_suppkey") === sup("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
      .orderBy("s_suppkey")
  }

  /** MARKET SHARE (TPC-H Q8 shape): per order-year, the fraction of total
    * revenue delivered by suppliers of one nation. The classic BI rollup
    * exercising the full star: lineitem⋈orders shuffle once on the order
    * key; supplier and nation are broadcast (no fact shuffle on those
    * keys). Both the nation slice and the total come from ONE conditional
    * aggregate over the joined relation — a single fact pass, not two
    * branches — and the share is ONE division of two exact integer cent
    * sums. At SFs where supplier outgrows the broadcast threshold AQE
    * falls back to a shuffle join on `l_suppkey` with no semantic change. */
  def marketShare(spark: SparkSession, dir: String,
      nationName: String = "NATION_3"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val rev = cents(li("l_extendedprice") * (lit(1.0) - li("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(year(o("o_orderdate")).as("o_year"))
      .agg(sum(rev).as("total_cents"),
        sum(when(nat("n_name") === nationName, rev).otherwise(0L)).as("nation_cents"))
      .select(col("o_year"), col("total_cents"), col("nation_cents"),
        round(col("nation_cents").cast("double") / col("total_cents").cast("double"), 6)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** PROMO REVENUE SHARE (TPC-H Q14 shape): per ship-month, the revenue
    * fraction from PROMO-type parts. One lineitem scan ⋈ broadcast part;
    * the promo slice and the total are one conditional aggregate; share is
    * ONE division of exact integer cents. Month key is `year·100 + month`
    * — pure integer, no locale/format functions. */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val rev = cents(li("l_extendedprice") * (lit(1.0) - li("l_discount")))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy((year(li("l_shipdate")) * 100 + month(li("l_shipdate"))).as("ship_month"))
      .agg(sum(rev).as("total_cents"),
        sum(when(p("p_type") === "PROMO", rev).otherwise(0L)).as("promo_cents"))
      .select(col("ship_month"), col("total_cents"), col("promo_cents"),
        round(col("promo_cents").cast("double") / col("total_cents").cast("double"), 6)
          .as("promo_share"))
      .orderBy("ship_month")
  }

  /** CUSTOMER ORDER-COUNT DISTRIBUTION (TPC-H Q13 shape): how many
    * customers placed exactly k orders — including k = 0, the row an
    * inner join silently drops. The canonical "aggregate the fact table
    * FIRST, then outer-join the reduced relation" pattern: orders
    * collapses to |custkeys| (custkey, cnt) rows map-side before any
    * join, so the customer⋈counts join moves pairs, never order rows;
    * the zero bucket comes from coalescing the left-outer miss. The
    * naive form (outer join raw orders, then count) would shuffle the
    * whole fact table on c_custkey — at 100 TB that is the difference
    * between a dimension-sized join and a fact-sized one. */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** SMALL-QUANTITY REVENUE (TPC-H Q17 shape): revenue from lines whose
    * quantity is below 20% of that part's average — the "join a fact
    * table against its own aggregate" pattern. The per-part aggregate
    * reduces lineitem to |parts| (sum, cnt) rows which re-attach via a
    * BROADCAST join, so the fact table is never shuffled; the threshold
    * compare is the exact integer form `5·qty·cnt < sum` (quantities are
    * integer-valued, so no float boundary can disagree between engines —
    * `0.2·avg` would put an IEEE division inside a predicate). */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pq = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("long")).as("qsum"),
        count(lit(1)).as("qcnt"))
    li.join(broadcast(pq), li("l_partkey") === col("pk"))
      .filter(lit(5L) * col("l_quantity").cast("long") * col("qcnt") < col("qsum"))
      .agg(sum(cents(col("l_extendedprice"))).as("small_qty_cents"),
        count(lit(1)).as("small_line_count"))
  }

  /** LATE-ORDER PRIORITY CHECK (TPC-H Q4 shape): per order priority, how
    * many orders in a quarter had at least one line shipped more than 90
    * days after the order date — the EXISTS / left-semi pattern. The date
    * window prunes the orders scan (PushedFilters); lineitem projects to
    * (orderkey, shipdate) only; the one shuffle is the unavoidable
    * fact⋈fact orderkey co-location, and the semi join stops at the
    * FIRST matching line (no distinct, no fan-out — a 1000-line order
    * contributes one probe hit, not 1000 rows). The lateness predicate
    * lives in the join condition, so it filters during the probe. */
  def orderPriorityLate(spark: SparkSession, dir: String,
      qStart: String = "1995-01-01 00:00:00", qEnd: String = "1995-04-01 00:00:00"): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= expr(s"TIMESTAMP_NTZ '$qStart'") &&
        col("o_orderdate") < expr(s"TIMESTAMP_NTZ '$qEnd'"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** NATION-PAIR TRAFFIC (TPC-H Q7 shape): directional revenue between
    * every (supplier nation, customer nation) pair by ship year — the
    * full star exercised in ONE fact pass: lineitem⋈orders is the only
    * fact-sized shuffle (orderkey co-location); customer, supplier, and
    * both nation role-playing slices broadcast. Revenue in exact integer
    * cents (per-row double product is bit-identical cross-engine; the
    * integer sum is order-independent). Output is ≤ |nations|²·|years|
    * rows — dashboard-sized at any SF. */
  def nationTraffic(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val n1 = nat.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = nat.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val rev = cents(li("l_extendedprice") * (lit(1.0) - li("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(cust), o("o_custkey") === cust("c_custkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), cust("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(li("l_shipdate")).as("l_year"))
      .agg(sum(rev).as("revenue_cents"), count(lit(1)).as("line_count"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** SALES OPPORTUNITY (TPC-H Q22 shape): per nation, the count and
    * balance mass of above-average-balance customers who never ordered —
    * the scalar-subquery + anti-join pattern. The positive-balance
    * average attaches as a BROADCAST 1-row (sum, count) relation and the
    * threshold compares in the exact integer form `bal·n > Σbal` (no
    * IEEE division inside a predicate); the anti join shuffles only the
    * threshold-surviving customers against orders projected to ONE
    * column. Balances in exact integer cents throughout. */
  def salesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("bal_cents"))
    val avgPos = c.filter(col("bal_cents") > 0)
      .agg(sum("bal_cents").as("pos_sum"), count(lit(1)).as("pos_n"))
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val nat = Tables.nation(spark, dir)
    c.crossJoin(broadcast(avgPos))
      .filter(col("bal_cents") * col("pos_n") > col("pos_sum"))
      .join(o, col("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("total_bal_cents"))
      .orderBy("nation")
  }

  /** FILTERED REVENUE (TPC-H Q6 shape): forecast-revenue-change — the
    * pure scan-and-fold query: a year window, a discount band, and a
    * quantity cap, ALL pushed into the parquet scan (PushedFilters on
    * the NTZ shipdate plus both numeric bands), then ONE keyless
    * map-combined aggregate to a single row. The canonical "is pushdown
    * working" probe: at 100 TB this query's cost is exactly the row
    * groups the filters fail to prune. Discount compares against the
    * stored double directly (same literal, same stored value on both
    * engines — no arithmetic before the compare). */
  def filteredRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_cents"),
        count(lit(1)).as("line_count"))

  /** PROFIT BY NATION (TPC-H Q9 shape): per (supplier nation, order
    * year), profit on parts matching a name token. The testdata has no
    * partsupp, so unit cost is the part's retail price (broadcast from
    * the filtered part dimension) — the SHAPE is Q9's: a name-filtered
    * part slice broadcast into the fact scan, lineitem⋈orders as the
    * only fact-sized shuffle, supplier and nation broadcast, profit in
    * exact integer cents (`rev_cents − unit_cost_cents·qty`, all Long).
    * Output ≤ |nations|·|years| rows. */
  def profitByNation(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_name").contains("red"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("unit_cost_cents"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"),
      col("l_suppkey"), col("l_quantity").cast("long").as("qty"),
      cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_cents"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("int").as("o_year"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(col("rev_cents") - col("unit_cost_cents") * col("qty")).as("profit_cents"),
        count(lit(1)).as("line_count"))
      .orderBy("nation", "o_year")
  }

  /** RETURNED-ITEM CUSTOMERS (TPC-H Q10 shape): top 20 customers by
    * revenue lost to returned lines for orders placed in one quarter.
    * The quarter prunes the orders scan; the returnflag filter prunes
    * lineitem; revenue aggregates to the per-customer grain FIRST, so
    * the customer join moves |matching customers| rows, never line rows;
    * nation broadcasts; top-20 is TakeOrderedAndProject. */
  def returnedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val c = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val n = Tables.nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum("rev").as("lost_revenue_cents"), count(lit(1)).as("returned_lines"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        col("c_mktsegment"), col("lost_revenue_cents"), col("returned_lines"))
      .orderBy(desc("lost_revenue_cents"), asc("c_custkey"))
      .limit(20)
  }

  /** IMPORTANT PARTS (TPC-H Q11 shape): parts whose total lineitem value
    * exceeds 1.5× the mean part value — the group-by + HAVING-against-a-
    * global-scalar pattern, scale-free by construction (a fixed share
    * threshold empties at higher SF as parts multiply). The per-part
    * aggregate runs once; the global (Σ, n) folds over THAT reduced
    * relation and re-attaches as a broadcast 1-row cross join; the
    * threshold is exact-integer `value·n·2 > 3·total` (no IEEE division
    * in a predicate). */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val pv = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("value_cents"))
    val tot = pv.agg(sum("value_cents").as("tot"), count(lit(1)).as("np"))
    pv.crossJoin(broadcast(tot))
      .filter(col("value_cents") * col("np") * 2 > col("tot") * 3)
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(desc("value_cents"), asc("l_partkey"))
  }

  /** LATE-SHIPMENT PRIORITY MIX (TPC-H Q12 shape): for lines shipped
    * more than 60 days after their order date within one ship year,
    * how many belong to critical-priority orders vs not, per return
    * flag (the testdata carries no shipmode — the flag keys the same
    * conditional-count pattern). The ship-year window prunes the
    * lineitem scan; lineitem⋈orders is the one shuffle; both counts are
    * ONE conditional aggregate (never two passes). */
  def latePriorityMix(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
      .select("l_orderkey", "l_shipdate", "l_returnflag")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    val crit = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** SUPPLIER COUNTS BY PART ATTRIBUTE (TPC-H Q16 shape): distinct
    * suppliers per (brand, type, size), excluding one brand, one type,
    * and a supplier blocklist (negative balances — the complaints
    * stand-in) — the NOT-IN + multi-key distinct-count pattern. The
    * observed part↔supplier relation (lineitem has no partsupp) dedups
    * to (partkey, suppkey) FIRST, so the attribute join and the distinct
    * count run over the reduced relation; the blocklist anti-joins as a
    * broadcast; part attributes broadcast. */
  def supplierPartCounts(spark: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(spark, dir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("excl_key"))
    val ps = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(excl), col("l_suppkey") === col("excl_key"), "left_anti")
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO")
      .select("p_partkey", "p_brand", "p_type", "p_size")
    ps.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  /** LARGE-VOLUME ORDERS (TPC-H Q18 shape): the top-100 biggest orders
    * among those whose total line quantity exceeds a threshold — the
    * HAVING-against-own-aggregate pattern. The per-order quantity sum
    * folds lineitem to the order grain and FILTERS before any join, so
    * the orders join moves only qualifying keys; the customer lookup
    * joins the doubly-reduced relation; top-100 is
    * TakeOrderedAndProject. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val oq = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 150)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name")
    o.join(oq, o("o_orderkey") === oq("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), cents(col("o_totalprice")).as("total_cents"),
        col("total_qty"))
      .orderBy(desc("total_cents"), asc("o_orderkey"))
      .limit(100)
  }

  /** DISJUNCTIVE-PREDICATE REVENUE (TPC-H Q19 shape): revenue matching
    * any of three (brand, size band, quantity band) branches — the
    * OR-of-conjunctions pattern. The branches' common quantity bound is
    * stated as an explicit conjunct so it reaches the lineitem scan as a
    * pushed filter even though the disjunction itself cannot; part
    * attributes broadcast; the final fold is one keyless aggregate. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
    val b1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 11)
    val b2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
      col("l_quantity").between(10, 20)
    val b3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
      col("l_quantity").between(20, 30)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_cents"), count(lit(1)).as("line_count"))
  }

  /** DOMINANT SUPPLIERS (TPC-H Q20 shape): suppliers who shipped more
    * than half of some name-matched part's yearly volume — the
    * nested-aggregate + semi-join pattern. The year window and the
    * broadcast name-filtered part slice reduce the fact FIRST; the
    * (part, supplier) and per-part aggregates both run over that
    * reduced relation; the winner set (distinct suppkeys) joins
    * supplier, nation broadcasts. The majority test is exact-integer
    * `2·sq > tq`. */
  def dominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("red")).select("p_partkey")
    val ps = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"))
    val pt = ps.groupBy(col("l_partkey").as("pk")).agg(sum("sq").as("tq"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name", "s_nationkey")
    val n = Tables.nation(spark, dir)
    ps.join(pt, col("l_partkey") === col("pk"))
      .filter(col("sq") * 2 > col("tq"))
      .select(col("l_suppkey")).distinct()
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation"))
      .orderBy("s_suppkey")
  }

  /** WAITING-ON SUPPLIERS (TPC-H Q21 shape): for finished orders with
    * more than one supplier, the supplier who was the ONLY late shipper
    * — ranked by how many orders they alone held up. Q21's two
    * correlated EXISTS/NOT-EXISTS self-joins of lineitem are replaced by
    * ONE per-(order, supplier) fold (max-late flag) and ONE per-order
    * fold (supplier count, late count, the late key) — two narrow
    * exchanges, no Expand, no self-join, no distinct aggregates. Late =
    * shipped >90 days after order date (the testdata has no
    * receipt/commit dates). */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val perSupp = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
          .otherwise(0L).as("late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max("late").as("late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("ns"), sum("late").as("nl"),
        max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    perOrder.filter(col("ns") > 1 && col("nl") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(s), col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_suppkey"))
      .limit(20)
  }

  /** YEAR-OVER-YEAR GROWTH per nation — the trend view of the Q5-shaped
    * revenue cascade: revenue folds to the (nation, year) grain in one
    * fact pass (lineitem⋈orders the only fact-sized shuffle, customer +
    * nation broadcast), then the lag window runs over that ≤
    * |nations|·|years| relation. Growth is exact integer PPM
    * (`(rev − prev)·10⁶ div prev`) — no float sum anywhere, first
    * observed year reports 0. */
  def yoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_orderkey"),
      year(col("o_orderdate")).cast("int").as("o_year"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir)
    val byYear = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(cents(li("l_extendedprice") * (lit(1.0) - li("l_discount"))))
        .as("revenue_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("nation").orderBy("o_year")
    byYear
      .withColumn("prev_revenue_cents", lag("revenue_cents", 1).over(w))
      .withColumn("growth_ppm",
        when(col("prev_revenue_cents").isNull || col("prev_revenue_cents") === 0, 0L)
          .otherwise(expr(
            "(revenue_cents - prev_revenue_cents) * 1000000 div prev_revenue_cents")))
      .orderBy("nation", "o_year")
  }

  val queries: Map[String, Q] = Map(
    "rel_yoy_growth" -> (yoyGrowth _),
    "rel_filtered_revenue" -> (filteredRevenue _),
    "rel_profit_by_nation" -> (profitByNation _),
    "rel_returned_customers" -> (returnedCustomers _),
    "rel_important_parts" -> (importantParts _),
    "rel_late_priority_mix" -> (latePriorityMix _),
    "rel_supplier_part_counts" -> (supplierPartCounts _),
    "rel_large_orders" -> (largeOrders _),
    "rel_disjunctive_revenue" -> (disjunctiveRevenue _),
    "rel_dominant_suppliers" -> (dominantSuppliers _),
    "rel_waiting_suppliers" -> (waitingSuppliers _),
    "rel_customer_distribution" -> (customerDistribution _),
    "rel_small_qty_revenue" -> (smallQtyRevenue _),
    "rel_order_priority" -> ((s: SparkSession, d: String) => orderPriorityLate(s, d)),
    "rel_nation_traffic" -> (nationTraffic _),
    "rel_sales_opportunity" -> (salesOpportunity _),
    "rel_top_supplier" -> ((s: SparkSession, d: String) => topSupplier(s, d)),
    "rel_market_share" -> ((s: SparkSession, d: String) => marketShare(s, d)),
    "rel_promo_share" -> (promoShare _),
    "rel_bloom_semi" -> ((s: SparkSession, d: String) => bloomSemiJoin(s, d)),
    "rel_table_profile" -> (tableProfile _),
    "rel_numeric_corr" -> (numericCorr _),
    "rel_customer_quartiles" -> ((s: SparkSession, d: String) => customerQuartiles(s, d)),
    // strict exact regime (r14 verdict #3): k ≥ customers at sf0.1 (15 k)
    "rel_customer_quartiles_sketch" -> ((s: SparkSession, d: String) =>
      customerQuartilesSketch(s, d, k = 16384, strict = true)),
    // prefix-sum serving form; the pairwise twin stays for sub-day inputs
    "rel_interval_join" -> ((s: SparkSession, d: String) => intervalJoinPrefix(s, d)),
    "rel_intersect" -> (urgentAndLowCustomers _),
    "rel_except" -> (urgentOnlyCustomers _),
    "rel_shipping_priority" -> ((s: SparkSession, d: String) => shippingPriority(s, d)),
    "rel_enrich_join" -> (enrichJoin _),
    "rel_revenue_by_priority" -> (revenueByPriority _),
    "rel_semi_join" -> (ordersWithHeavyLines _),
    "rel_anti_join" -> (customersWithoutOrders _),
    "rel_window_top3" -> (top3OrdersPerCustomer _),
    "rel_distinct_parts" -> (distinctParts _),
    "rel_top_orders" -> (topOrders _),
    "rel_revenue_per_nation" -> (revenuePerNation _),
    "rel_min_cost_supplier" -> ((s: SparkSession, d: String) => minCostSupplier(s, d)),
    "rel_rollup_agg" -> (rollupAgg _))

  val oracles: Map[String, String] = Map(
    "rel_yoy_growth" ->
      """WITH r AS (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        | l AS (SELECT *, lag(revenue_cents) OVER
        |   (PARTITION BY nation ORDER BY o_year) AS prev_revenue_cents FROM r)
        |SELECT nation, o_year, revenue_cents, prev_revenue_cents,
        |  CAST(CASE WHEN prev_revenue_cents IS NULL OR prev_revenue_cents = 0 THEN 0
        |   ELSE (revenue_cents - prev_revenue_cents) * 1000000 // prev_revenue_cents
        |  END AS BIGINT) AS growth_ppm
        |FROM l ORDER BY nation, o_year""".stripMargin.replace('\n', ' '),
    "rel_filtered_revenue" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS line_count
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin.replace('\n', ' '),
    "rel_profit_by_nation" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |   - CAST(floor(p_retailprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cents,
        | count(*) AS line_count
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | WHERE p_name LIKE '%red%'
        | GROUP BY 1, 2 ORDER BY nation, o_year""".stripMargin.replace('\n', ' '),
    "rel_returned_customers" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS lost_revenue_cents,
        |    count(*) AS returned_lines
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, n_name AS nation, c_mktsegment,
        |  lost_revenue_cents, returned_lines
        |FROM r JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY lost_revenue_cents DESC, c_custkey ASC LIMIT 20""".stripMargin.replace('\n', ' '),
    "rel_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem GROUP BY 1),
        | t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS tot, count(*) AS np FROM pv)
        |SELECT l_partkey, value_cents FROM pv, t
        |WHERE value_cents * np * 2 > tot * 3
        |ORDER BY value_cents DESC, l_partkey ASC""".stripMargin.replace('\n', ' '),
    "rel_late_priority_mix" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        | GROUP BY 1 ORDER BY l_returnflag""".stripMargin.replace('\n', ' '),
    "rel_supplier_part_counts" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin.replace('\n', ' '),
    "rel_large_orders" ->
      """WITH oq AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents, total_qty
        |FROM orders JOIN oq ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_cents DESC, o_orderkey ASC LIMIT 100""".stripMargin.replace('\n', ' '),
    "rel_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS line_count
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_quantity >= 1 AND l_quantity <= 30 AND (
        |   (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin.replace('\n', ' '),
    "rel_dominant_suppliers" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        | pt AS (SELECT l_partkey AS pk, CAST(sum(sq) AS BIGINT) AS tq FROM ps GROUP BY 1),
        | win AS (SELECT DISTINCT l_suppkey FROM ps JOIN pt ON l_partkey = pk WHERE sq * 2 > tq)
        |SELECT s_suppkey, s_name, n_name AS nation
        |FROM win JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin.replace('\n', ' '),
    "rel_waiting_suppliers" ->
      """WITH per_supp AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        | per_order AS (
        |  SELECT l_orderkey, count(*) AS ns, sum(late) AS nl,
        |    max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
        |  FROM per_supp GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM per_order JOIN supplier ON late_supp = s_suppkey
        |WHERE ns > 1 AND nl = 1
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey ASC LIMIT 20""".stripMargin.replace('\n', ' '),
    "rel_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin.replace('\n', ' '),
    "rel_nation_traffic" ->
      """WITH j AS (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name <> n2.n_name)
        |SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(c) AS BIGINT) AS revenue_cents, count(*) AS line_count
        |FROM j GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin.replace('\n', ' '),
    "rel_sales_opportunity" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        | a AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS pos_sum,
        |   count(*) AS pos_n FROM c WHERE bal_cents > 0)
        |SELECT n_name AS nation, count(*) AS numcust,
        |  CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
        |FROM c CROSS JOIN a JOIN nation ON c_nationkey = n_nationkey
        |WHERE bal_cents * pos_n > pos_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY nation""".stripMargin.replace('\n', ' '),
    "rel_customer_distribution" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT coalesce(cnt, 0) AS c_count
        |  FROM customer LEFT JOIN pc ON c_custkey = o_custkey)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin.replace('\n', ' '),
    "rel_small_qty_revenue" ->
      """WITH pq AS (
        |  SELECT l_partkey AS pk,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qsum,
        |    count(*) AS qcnt
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS small_qty_cents,
        |  count(*) AS small_line_count
        |FROM lineitem JOIN pq ON l_partkey = pk
        |WHERE 5 * CAST(l_quantity AS BIGINT) * qcnt < qsum""".stripMargin.replace('\n', ' '),
    "rel_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |    AND l_suppkey IS NOT NULL
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, revenue_cents
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE revenue_cents = (SELECT max(revenue_cents) FROM r)
        |ORDER BY s_suppkey""".stripMargin.replace('\n', ' '),
    "rel_market_share" ->
      """WITH j AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n_name,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey)
        |SELECT o_year, CAST(sum(c) AS BIGINT) AS total_cents,
        |  CAST(sum(CASE WHEN n_name = 'NATION_3' THEN c ELSE 0 END) AS BIGINT) AS nation_cents,
        |  round(CAST(sum(CASE WHEN n_name = 'NATION_3' THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE), 6) AS mkt_share
        |FROM j GROUP BY 1 ORDER BY o_year""".stripMargin.replace('\n', ' '),
    "rel_promo_share" ->
      """WITH j AS (
        |  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ship_month, p_type,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT ship_month, CAST(sum(c) AS BIGINT) AS total_cents,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN c ELSE 0 END) AS BIGINT) AS promo_cents,
        |  round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE), 6) AS promo_share
        |FROM j GROUP BY 1 ORDER BY ship_month""".stripMargin.replace('\n', ' '),
    // the Bloom stage must be result-invisible: the oracle is the PLAIN
    // urgent-orders semi join — any surviving false positive fails the hash
    "rel_bloom_semi" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS line_count
        | FROM lineitem WHERE EXISTS (SELECT 1 FROM orders
        |   WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
        | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace('\n', ' '),
    "rel_numeric_corr" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q,
        |   CAST(floor(l_extendedprice) AS BIGINT) AS p,
        |   CAST(floor(l_discount * 1000) AS BIGINT) AS d FROM lineitem),
        | m AS (SELECT count(*) AS n,
        |   CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
        |   CAST(sum(d) AS BIGINT) AS sd,
        |   CAST(sum(q * q) AS BIGINT) AS sqq, CAST(sum(p * p) AS BIGINT) AS spp,
        |   CAST(sum(d * d) AS BIGINT) AS sdd, CAST(sum(q * p) AS BIGINT) AS sqp,
        |   CAST(sum(q * d) AS BIGINT) AS sqd FROM li)
        | SELECT n,
        |  round((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
        |   / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |    * sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 6)
        |   AS corr_qty_price,
        |  round((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
        |   / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |    * sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
        |   AS corr_qty_discount
        | FROM m""".stripMargin.replace('\n', ' '),
    "rel_table_profile" ->
      ProfileCols.map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows, count($c) AS n_nonnull,
           | count(DISTINCT $c) AS n_distinct, min($c)::VARCHAR AS min_value,
           | max($c)::VARCHAR AS max_value FROM lineitem""".stripMargin.replace('\n', ' '))
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY column_name"),
    "rel_customer_quartiles" ->
      """WITH c AS (SELECT c_custkey,
        |   CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        | q AS (SELECT *, ntile(4) OVER (ORDER BY cents ASC, c_custkey ASC) AS quartile FROM c)
        | SELECT CAST(quartile AS INT) AS quartile, count(*) AS customer_count,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        | FROM q GROUP BY 1 ORDER BY quartile""".stripMargin.replace('\n', ' '),
    // exact-regime sketch twin: ⌈p·n⌉ cut points (quantile_disc) over the
    // tie-broken composite, bucket = 1 + #cuts strictly below the value
    "rel_customer_quartiles_sketch" ->
      """WITH c AS (SELECT c_custkey,
        |   CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        | b AS (SELECT *, CAST(cents AS DOUBLE)
        |   + CAST(c_custkey % 1048576 AS DOUBLE) / 1048576.0 AS tb FROM c),
        | q AS (SELECT quantile_disc(tb, 0.25) AS q1, quantile_disc(tb, 0.5) AS q2,
        |   quantile_disc(tb, 0.75) AS q3 FROM b)
        | SELECT CAST(1 + CAST(tb > q1 AS INT) + CAST(tb > q2 AS INT)
        |   + CAST(tb > q3 AS INT) AS INT) AS quartile,
        |  count(*) AS customer_count,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        | FROM b, q GROUP BY 1 ORDER BY quartile""".stripMargin.replace('\n', ' '),
    // the oracle is the NAIVE range join — the bucketized plan must be
    // result-identical to the quadratic reference
    "rel_interval_join" ->
      s"""SELECT o.o_orderkey, CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS o_sec,
        | CAST(count(l.l_shipdate) AS BIGINT) AS n_shipped
        | FROM orders o LEFT JOIN lineitem l
        |   ON l.l_shipdate >= o.o_orderdate
        |  AND l.l_shipdate < o.o_orderdate + INTERVAL $IntervalSpanDays DAY
        | GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin.replace('\n', ' '),
    "rel_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        | GROUP BY l_orderkey, o_orderdate, o_orderpriority
        | ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10""".stripMargin.replace('\n', ' '),
    "rel_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        | ORDER BY o_custkey""".stripMargin.replace('\n', ' '),
    "rel_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        | EXCEPT
        | SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        | ORDER BY o_custkey""".stripMargin.replace('\n', ' '),
    "rel_enrich_join" ->
      """SELECT r_name, n_name, count(*) AS customer_count,
        | CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        | FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin.replace('\n', ' '),
    "rel_revenue_by_priority" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS line_count
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace('\n', ' '),
    "rel_semi_join" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        | WHERE EXISTS (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        | ORDER BY o_orderkey""".stripMargin.replace('\n', ' '),
    "rel_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        | ORDER BY c_custkey""".stripMargin.replace('\n', ' '),
    "rel_window_top3" ->
      """SELECT o_custkey, o_orderkey, total_cents, CAST(rn AS INT) AS rn FROM (
        |   SELECT o_custkey, o_orderkey,
        |     CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
        |     row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC, o_orderkey ASC) AS rn
        |   FROM orders)
        | WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin.replace('\n', ' '),
    "rel_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
        | count(*) AS line_count FROM lineitem
        | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace('\n', ' '),
    "rel_top_orders" ->
      """SELECT o_orderkey, o_custkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents
        | FROM orders ORDER BY total_cents DESC, o_orderkey ASC LIMIT 25""".stripMargin.replace('\n', ' '),
    "rel_revenue_per_nation" ->
      """SELECT n_name,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS line_count
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | WHERE r_name = 'AMERICA'
        | GROUP BY n_name ORDER BY n_name""".stripMargin.replace('\n', ' '),
    "rel_min_cost_supplier" ->
      """WITH lip AS (
        |  SELECT p_partkey, p_name, l_suppkey,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS cost_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'
        |), mins AS (
        |  SELECT p_partkey, any_value(p_name) AS p_name,
        |    min(cost_cents) AS min_cost_cents
        |  FROM lip GROUP BY 1
        |), win AS (
        |  SELECT m.p_partkey, m.p_name, m.min_cost_cents,
        |    min(l.l_suppkey) AS s_suppkey
        |  FROM mins m JOIN lip l
        |    ON l.p_partkey = m.p_partkey AND l.cost_cents = m.min_cost_cents
        |  GROUP BY m.p_partkey, m.p_name, m.min_cost_cents)
        |SELECT w.p_partkey, w.p_name, w.min_cost_cents, w.s_suppkey, s.s_name
        |FROM win w JOIN supplier s ON s.s_suppkey = w.s_suppkey
        |ORDER BY w.p_partkey""".stripMargin.replace('\n', ' '),
    "rel_rollup_agg" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        | l_returnflag, l_linestatus,
        | CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        | count(*) AS line_count
        | FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        | ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin.replace('\n', ' '))
}
