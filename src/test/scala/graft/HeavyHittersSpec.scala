package graft

import org.apache.spark.sql.functions._
import graft.functions.{HeavyHitters, SpaceSavingState}

/** The custom mergeable SpaceSaving aggregate: exact-regime equality,
  * eviction-regime guarantees, merge correctness, partitioning
  * independence of the guarantee. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // Zipf-ish stream over a known item set: item i appears weight(i) times
  private def stream(nItems: Int): Seq[Long] =
    (0 until nItems).flatMap(i => Seq.fill(1 + (nItems - i) * (nItems - i) / 4)(i.toLong))

  private def trueCounts(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("exact regime: capacity above cardinality reproduces plain counts, err 0") {
    val xs = stream(40)
    val got = xs.toDF("v").repartition(7)
      .agg(HeavyHitters.heavyHitters(col("v"), capacity = 64, k = 10).as("hh"))
      .select(explode(col("hh"))).select("col.item", "col.est", "col.err")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = trueCounts(xs)
    val want = truth.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(got.map(r => (r._1, r._2)).toSeq === want)
    assert(got.forall(_._3 === 0L), "no eviction -> zero error terms")
  }

  test("eviction regime: per-item bounds hold and true heavy items are never lost") {
    val xs = stream(200) // 200 distinct >> capacity 32
    val truth = trueCounts(xs)
    val n = xs.length.toLong
    for (parts <- Seq(1, 13)) {
      val got = xs.toDF("v").repartition(parts)
        .agg(HeavyHitters.heavyHitters(col("v"), capacity = 32, k = 32).as("hh"))
        .select(explode(col("hh"))).select("col.item", "col.est", "col.err")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length === 32)
      got.foreach { case (item, est, err) =>
        val t = truth.getOrElse(item, 0L)
        assert(t <= est, s"parts=$parts item $item: true $t > est $est")
        assert(est - err <= t, s"parts=$parts item $item: est-err ${est - err} > true $t")
      }
      // SpaceSaving guarantee: anything with freq > n/capacity is present
      val reported = got.map(_._1).toSet
      truth.filter(_._2 > n / 32).keys.foreach { hh =>
        assert(reported.contains(hh), s"parts=$parts lost heavy item $hh")
      }
    }
  }

  test("state merge: absent items charge the other side's minimum; serialization round-trips") {
    val a = new SpaceSavingState(4)
    Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L).foreach(a.update) // full, min est 1
    val b = new SpaceSavingState(4)
    Seq(5L, 5L, 5L, 5L, 6L, 7L, 8L).foreach(b.update) // full, min est 1
    val aMin = a.minEst
    val bMin = b.minEst
    val aItems = a.items.toMap
    a.merge(b)
    assert(a.items.size === 4, "merge must trim back to capacity")
    // item 5 was absent from a: merged est = 4 (from b) + a's min charge
    val (est5, err5) = a.items(5L)
    assert(est5 === 4L + aMin && err5 === 0L + aMin)
    // item 1 was absent from b: est = 3 + bMin, and survives the trim
    val (est1, err1) = a.items(1L)
    assert(est1 === aItems(1L)._1 + bMin && err1 === aItems(1L)._2 + bMin)
    val rt = SpaceSavingState.deserialize(a.serialize())
    assert(rt.capacity === a.capacity && rt.items.toMap === a.items.toMap)
  }

  test("SQL surface: heavy_hitters(item, capacity, k) equals the Column API; non-literal knobs fail loudly") {
    GraftFunctions.register(spark)
    val xs = stream(40)
    xs.toDF("v").createOrReplaceTempView("hh_sql_input")
    val viaSql = spark.sql(
      "SELECT explode(heavy_hitters(v, 64, 10)) AS e FROM hh_sql_input")
      .select("e.item", "e.est", "e.err")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaCol = xs.toDF("v")
      .agg(HeavyHitters.heavyHitters(col("v"), 64, 10).as("hh"))
      .select(explode(col("hh"))).select("col.item", "col.est", "col.err")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql === viaCol)
    val err = intercept[Exception](
      spark.sql("SELECT heavy_hitters(v, v, 10) FROM hh_sql_input").collect())
    assert(err.getMessage.contains("INT literal") ||
      Option(err.getCause).exists(_.getMessage.contains("INT literal")))
  }

  test("flow_heavy_hitters registry query: exact regime at this SF matches the windowed top-10") {
    val sk = graft.flow.FlowQueries.heavyHitters(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sk.nonEmpty && sk.forall(_._5 == 0L), "sub-capacity cardinality must be exact")
    val exact = graft.flow.FlowAdapter.flows(spark, sf)
      .groupBy("proto", "src_ip").agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("proto")
          .orderBy(desc("c"), asc("src_ip"))))
      .filter(col("rank") <= 10)
      .select("proto", "rank", "src_ip", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(sk.map(r => (r._1, r._2, r._3, r._4)).sortBy(x => (x._1, x._2)).toSeq ===
      exact.sortBy(x => (x._1, x._2)).toSeq)
  }
}
