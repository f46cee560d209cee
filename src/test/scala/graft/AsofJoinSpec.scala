package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("planted version boundaries: each fact picks the newest version at-or-before it") {
    val dim = Seq(
      (1, 100L, "a-v0"), (1, 200L, "a-v1"), (1, 300L, "a-v2"),
      (2, 150L, "b-v0")).toDF("k", "valid_from", "name")
    val fact = Seq(
      (1, 99L), // before any version → null
      (1, 100L), // exactly at v0 → v0
      (1, 199L), (1, 200L), (1, 250L), (1, 300L), (1, 9999L),
      (2, 149L), (2, 150L),
      (3, 500L) // key with no versions at all → null
    ).toDF("k", "t")
    val got = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from")
      .orderBy("k", "t").select("k", "t", "name").as[(Int, Long, Option[String])]
      .collect().toSeq
    assert(got === Seq(
      (1, 99L, None), (1, 100L, Some("a-v0")), (1, 199L, Some("a-v0")),
      (1, 200L, Some("a-v1")), (1, 250L, Some("a-v1")), (1, 300L, Some("a-v2")),
      (1, 9999L, Some("a-v2")), (2, 149L, None), (2, 150L, Some("b-v0")),
      (3, 500L, None)))
  }

  test("null join keys match nothing: null-key facts get null enrichment") {
    // SQL join semantics — the old window null-grouping forward-filled a
    // null-key dim version into null-key facts (r7 review)
    val dim = Seq((Some(1), 100L, "v0"), (None, 50L, "ghost")).toDF("k", "valid_from", "name")
    val fact = Seq((Some(1), 200L), (None, 200L)).toDF("k", "t")
    for (buckets <- Seq(1, 8)) {
      val got = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", buckets)
        .orderBy("t", "k").select("k", "name").as[(Option[Int], Option[String])]
        .collect().toSeq.sortBy(_._1)
      assert(got === Seq((None, None), (Some(1), Some("v0"))),
        s"buckets=$buckets: null keys must not enrich")
    }
  }

  test("sub-second timestamp versions: the boundary seed keeps full precision") {
    // two releases 500ms apart in the SAME second: a seconds-truncating
    // boundary (cast ts to long) ties in max_by and can seed later
    // buckets with the stale version (r7 review finding) — micros must
    // disambiguate, and the bucketed path must equal the single-window one
    val dim = Seq(
      (1, java.sql.Timestamp.valueOf("2024-03-01 00:00:10.2"), "old"),
      (1, java.sql.Timestamp.valueOf("2024-03-01 00:00:10.7"), "new"))
      .toDF("k", "valid_from", "name")
    val fact = (0 until 400).map(i =>
        (1, new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-03-01 00:00:20.0").getTime + i * 1000L)))
      .toDF("k", "t")
    val bucketed = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", timeBuckets = 8)
      .select("name").distinct().as[String].collect().toSeq
    assert(bucketed === Seq("new"),
      "every post-release fact must carry the NEWER same-second version")
    val legacy = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", timeBuckets = 1)
      .orderBy("t").select("t", "name").collect().toSeq
    val got = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", timeBuckets = 8)
      .orderBy("t").select("t", "name").collect().toSeq
    assert(got === legacy)
  }

  test("TimestampNTZ time columns take the bucketed path with sub-second precision (r11)") {
    // the driver's events.ts is now micros-NTZ; without an NTZ case in
    // toNum the join would silently fall to the single-window path — the
    // same environment-drift degradation class as the r10 rawTsBound bug
    import java.time.LocalDateTime
    val base = LocalDateTime.of(2024, 3, 1, 0, 0, 10)
    val dim = Seq(
      (1, base.plusNanos(200000000L), "old"),
      (1, base.plusNanos(700000000L), "new")).toDF("k", "valid_from", "name")
    val fact = (0 until 400).map(i => (1, base.plusSeconds(10L + i))).toDF("k", "t")
    assert(fact.schema("t").dataType === org.apache.spark.sql.types.TimestampNTZType)
    // bucketing actually engages: the no-numeric-image fallback pins __b=0
    val buckets = AsofJoin.taggedUnion(fact, dim, "k", "k", "t", "valid_from", 8)
      .select("__b").distinct().count()
    assert(buckets > 1, "NTZ time must bucket, not fall back to one window")
    // same-second releases stay ordered (micros image, not seconds)
    val names = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", timeBuckets = 8)
      .select("name").distinct().as[String].collect().toSeq
    assert(names === Seq("new"))
    val legacy = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", timeBuckets = 1)
      .orderBy("t").select("t", "name").collect().toSeq
    val got = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", timeBuckets = 8)
      .orderBy("t").select("t", "name").collect().toSeq
    assert(got === legacy)
  }

  test("string-typed time columns fall back to the single-window path, still correct") {
    // ISO-8601 strings order lexicographically = chronologically; they
    // have no exact numeric image, so bucketing must quietly step aside
    // instead of nulling every enrichment (r7 review finding)
    val dim = Seq((1, "2024-03-01T00:00:10", "v0"), (1, "2024-03-05T00:00:00", "v1"))
      .toDF("k", "valid_from", "name")
    val fact = Seq((1, "2024-03-01T00:00:09"), (1, "2024-03-02T12:00:00"),
      (1, "2024-03-06T00:00:00")).toDF("k", "t")
    val got = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", timeBuckets = 64)
      .orderBy("t").select("t", "name").as[(String, Option[String])].collect().toSeq
    assert(got === Seq(
      ("2024-03-01T00:00:09", None),
      ("2024-03-02T12:00:00", Some("v0")),
      ("2024-03-06T00:00:00", Some("v1"))))
  }

  test("row-atomic fill: a newer version's null field does not inherit the older version's value") {
    val dim = Seq(
      (1, 100L, Some("x"), Some(10)), (1, 200L, None, Some(20))
    ).toDF("k", "valid_from", "label", "weight")
    val fact = Seq((1, 250L)).toDF("k", "t")
    val row = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from")
      .select("label", "weight").as[(Option[String], Option[Int])].collect().head
    // the effective version at t=250 is v(200): label NULL, weight 20 —
    // a per-column fill would wrongly resurrect label "x" from v(100)
    assert(row === ((None, Some(20))))
  }

  test("property: asof equals the quadratic inequality-join reference (seeded)") {
    val rnd = new scala.util.Random(1337)
    val dim = (1 to 6).flatMap(k => (0 until rnd.nextInt(4)).map(v =>
      (k, 100L * (v + 1) + k, s"k$k-v$v"))).toDF("k", "valid_from", "name")
    val fact = (1 to 300).map(i => (1 + rnd.nextInt(7), rnd.nextInt(600).toLong))
      .toDF("k", "t")
    val got = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from")
    fact.createOrReplaceTempView("f"); dim.createOrReplaceTempView("d")
    val ref = spark.sql(
      """SELECT f.k, f.t, (SELECT max_by(d.name, d.valid_from) FROM d
        |   WHERE d.k = f.k AND d.valid_from <= f.t) AS name
        |FROM f""".stripMargin)
    assert(got.select("k", "t", "name").orderBy("k", "t", "name").collect().toSeq
      === ref.select("k", "t", "name").orderBy("k", "t", "name").collect().toSeq)
  }

  test("flow_enrich_asof: early flows unversioned, later flows step through releases") {
    val dir = "/root/testdata/sf0.001"
    val out = AsofJoin.flowEnrichAsof(spark, dir).cache()
    val n = out.count()
    assert(n > 0)
    // the +1 start leaves at least the earliest flow before any release
    assert(out.filter(col("src_as_name") === "--").count() > 0)
    // all three releases appear (quarter-point effective times over the range)
    val seen = out.filter(col("asdb") > 0).select("asdb").distinct()
      .as[Int].collect().toSet
    assert(seen === Set(1, 2, 3))
    out.unpersist()
  }

  test("streaming: dimension releases committed mid-stream enrich by event time, exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{FlowStreams, ManifestTable}
    implicit val sqlCtx = spark.sqlContext
    def tmp(): String = java.nio.file.Files.createTempDirectory("graft_asof").toString
    val dimTable = tmp(); val outTable = tmp(); val cp = tmp()

    // release v1 of the dimension, effective from t=100
    ManifestTable.append(Seq((1, 100L, 1)).toDF("asn", "valid_from", "asdb"),
      dimTable, None, batchId = 0L)

    val src = MemoryStream[(Int, Long)]
    val q = FlowStreams.startAsofEnrich(src.toDF().toDF("src_as", "t"),
      dimTable, outTable, cp, factKey = "src_as", factTime = "t",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      src.addData((1, 50L), (1, 150L)) // before/after v1's effective time
      q.processAllAvailable()
      // release v2 mid-stream: one manifest append, no restart
      ManifestTable.append(Seq((1, 200L, 2)).toDF("asn", "valid_from", "asdb"),
        dimTable, None, batchId = 1L)
      src.addData((1, 180L), (1, 250L)) // late row keeps v1; current row gets v2
      q.processAllAvailable()
    } finally q.stop()

    val got = ManifestTable.read(spark, outTable)
      .select("src_as", "t", "asdb").as[(Int, Long, Option[Int])]
      .collect().toSeq.sortBy(_._2)
    assert(got === Seq(
      (1, 50L, None), // predates every release
      (1, 150L, Some(1)),
      (1, 180L, Some(1)), // v2 already committed, but event time is v1-era
      (1, 250L, Some(2))))
  }

  test("plan: the fill window exchanges on (key, bucket), no broadcast of the version history") {
    val plan = AsofJoin.flowEnrichAsof(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the spine exchange hashes on BOTH the join key and the time bucket —
    // this is the line that keeps a hot key off a single task
    assert("hashpartitioning\\(__k#\\d+L?, __b#\\d+L?".r.findFirstIn(plan).isDefined,
      s"expected a hashpartitioning(__k, __b) exchange:\n$plan")
    // "no broadcast of the version history": with size-based broadcasts
    // OFF, the only BroadcastExchange left in the plan must be the one
    // explicit 1-row bounds aggregate — a second one means the dim (or
    // the fact side) got broadcast, the regression this guards against.
    // (The node's toString never prints output columns, so grepping the
    // line for __dim — the r7 review caught this — asserts nothing.)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = Seq((1, 100L, "v0"), (1, 5000L, "v1")).toDF("k", "valid_from", "name")
      val fact = (0 until 100).map(i => (1, i.toLong * 3)).toDF("k", "t")
      val p = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", 8)
        .queryExecution.executedPlan.toString
      // the 1-row bounds rides IdentityBroadcastMode cross-joins (one per
      // use site); a broadcast of the dim or fact side would appear as a
      // HashedRelationBroadcastMode build of a BroadcastHashJoin
      assert(!p.contains("HashedRelationBroadcastMode"),
        s"no relation may be broadcast as an equi-join build side:\n$p")
      val broadcasts = "BroadcastExchange".r.findAllIn(p).size
      val identityBroadcasts = "BroadcastExchange IdentityBroadcastMode".r.findAllIn(p).size
      assert(broadcasts >= 1 && identityBroadcasts === broadcasts,
        s"every broadcast must be the 1-row bounds (IdentityBroadcastMode):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
  }

  test("hot key parallelism: one key's rows spread across >1 partition and many buckets") {
    val dim = Seq((1, 100L, "v0"), (1, 5000L, "v1")).toDF("k", "valid_from", "name")
    val fact = (0 until 4000).map(i => (1, i.toLong * 3)).toDF("k", "t") // ONE key
    val tagged = AsofJoin.taggedUnion(fact, dim, "k", "k", "t", "valid_from", 8)
    val buckets = tagged.filter(col("__side") === 1)
      .select("__b").distinct().as[Long].collect().toSet
    assert(buckets.size === 8, s"expected the hot key split into 8 buckets, got $buckets")
    // the window's exchange hash-partitions on (k, b) — the same murmur3
    // slot assignment must place the single hot key on more than one of the
    // 32 reducers (AQE may later coalesce EMPTY slots, never split busy ones)
    val slots = tagged.filter(col("__side") === 1)
      .select(pmod(hash(col("__k"), col("__b")), lit(32)).as("slot"))
      .distinct().count()
    assert(slots > 1, s"hot key still hashes to one reducer slot (slots=$slots)")
    // and the bucketed result is identical to the single-window legacy path
    val got = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", 8)
      .orderBy("t").select("t", "name").collect().toSeq
    val legacy = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", 1)
      .orderBy("t").select("t", "name").collect().toSeq
    assert(got === legacy)
  }

  test("bucket-boundary seeding: facts in later buckets see versions from earlier buckets") {
    // versions all land in bucket 0; facts span every bucket — each later
    // bucket's fill must be seeded by the max-join boundary row
    val dim = Seq((7, 0L, "old"), (7, 10L, "new")).toDF("k", "valid_from", "name")
    val fact = (0 until 800).map(i => (7, i.toLong)).toDF("k", "t")
    val got = AsofJoin.asofJoin(fact, dim, "k", "k", "t", "valid_from", 16)
      .filter(col("t") >= 10).select("name").distinct().as[String].collect().toSeq
    assert(got === Seq("new"))
  }
}
