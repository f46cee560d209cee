package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the full query registry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line for the driver.
  *
  * Each query is forced through a full materialization (noop-style
  * `foreachPartition` consume) rather than `count()`, so column pruning
  * cannot skip computed columns and the timing reflects the real work.
  *
  * Measurement protocol (the r6 same-code A/B showed ±3-4x per-query
  * swings under a single-pass harness, so single samples are not
  * evidence): queries run in PINNED alphabetical order for
  * `SPARK_GRAFT_REPS` (default 3) full passes — pass-level interleaving
  * keeps a transient system stall from contaminating every sample of one
  * query — and the reported per-query number is the MEDIAN across passes,
  * with min/max spread alongside in `"spread"`. `"value"` is the sum of
  * medians.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // r18: the default whole-stage-codegen class cache holds 100
      // entries — a 211-query × 3-pass run generates thousands of
      // distinct stages, so every pass recompiled every stage (Janino,
      // ~10-50 ms each). Size the cache for the workload's stage
      // diversity; this is a driver/executor memory knob (cached
      // GeneratedClass objects), not a scale-dependent tunable —
      // parameterized anyway, same default everywhere
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      // session requirement for the TIMESTAMP(NANOS) events table
      // (FlowAdapter.flows asserts it instead of mutating shared conf)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM + parquet footers once so per-query numbers measure the
    // query, not first-touch JIT/IO
    try SparkEntry.entry(spark).foreachPartition { (_: Iterator[org.apache.spark.sql.Row]) => () }
    catch { case _: Throwable => () }
    // dev aid: SPARK_GRAFT_ONLY=q1,q2 restricts the run while iterating
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // SERVING forms for queries whose registry entry carries oracle-only
    // plumbing: flow_heavy_hitters' registry form embeds the exact-regime
    // guard (countDistinct + raise_error) that protects the sf0.01 DuckDB
    // gate — at bench SF (sf0.1, 750 distinct/proto > capacity) that guard
    // correctly FIRES, so the bench measures the production (unguarded)
    // sketch instead: the eviction regime is precisely what the sketch is
    // for, and what a panel would run
    val servingOverrides: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("flow_heavy_hitters" -> ((s, d) => graft.flow.FlowQueries.heavyHitters(s, d)))
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .map { case (name, fn) => name -> servingOverrides.getOrElse(name, fn) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // a failed run must NOT masquerade as a (fast) sample: record the
    // error, keep the name out of queries/total, and surface it in the
    // JSON so downstream comparisons can't mistake a crash for a speedup
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // r17 verdict #3: stamp every sample with its wall-clock offset from
    // bench start so a contended system window (the driver box's 127 s
    // outliers on alphabetically-late rows) is LOCATABLE in the artifact —
    // "which wall-clock window was contended" becomes readable from
    // BENCH_full.json instead of inferred from which rows look inflated.
    val benchT0 = System.nanoTime()
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[(Double, Double)] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).foreachPartition { (_: Iterator[org.apache.spark.sql.Row]) => () }
        Some(((System.nanoTime() - t0) / 1e9, (t0 - benchT0) / 1e9))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        None
      }
    }
    // pass-level round-robin (rep 1 of ALL queries, then rep 2, …): a
    // transient stall poisons at most one sample per query, and the
    // median across passes rejects it
    val passes: Seq[Seq[(String, Option[(Double, Double)])]] =
      (1 to reps).map(_ => picked.map { case (name, fn) => name -> timeOne(name, fn) })
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = picked.flatMap { case (name, _) =>
      val samples = passes.flatMap(_.find(_._1 == name).get._2).map(_._1)
      if (samples.size < reps) None // any failed pass disqualifies the number
      else Some((name, median(samples), samples.min, samples.max))
    }
    val qs = results.map { case (k, med, _, _) => "\"" + k + f"""":$med%.3f""" }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, lo, hi) => "\"" + k + f"""":[$lo%.3f,$hi%.3f]""" }
      .mkString("{", ",", "}")
    // per-rep [wall_offset_sec, dur_sec] pairs in pass order (file-only
    // detail — the stdout summary stays short): an inflated sample is
    // attributable to its wall-clock window, and a contended window shows
    // up as a contiguous offset range with inflated durations
    val samplesJson = picked.flatMap { case (name, _) =>
      val ss = passes.flatMap(_.find(_._1 == name).get._2)
      if (ss.isEmpty) None
      else Some("\"" + name + "\":" + ss.map { case (dur, off) =>
        f"[$off%.1f,$dur%.3f]" }.mkString("[", ",", "]"))
    }.mkString("{", ",", "}")
    val passWall = passes.map { p =>
      val offs = p.flatMap(_._2)
      if (offs.isEmpty) "[0,0]"
      else f"[${offs.map(_._2).min}%.1f,${offs.map(x => x._2 + x._1).max}%.1f]"
    }.mkString("[", ",", "]")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", " ") + "\""
      }.mkString(""","errors":{""", ",", "}")
    val total = results.map(_._2).sum
    // ingestion throughput vs the reference's only published number
    // (>100k flows/s, /root/reference/README.md:91-92): full wire path —
    // framed-protobuf decode -> raw projection + 5-minute partial rollup —
    // over generated records, measured end-to-end in batch shape
    var ingestRate = 0L
    val ingest = try {
      import spark.implicits._
      val n = 1000000L
      val payloads = graft.flow.FlowGen.flows(spark, n, seed = 99L)
        .mapPartitions(_.grouped(64).map(g =>
          g.flatMap(graft.sources.ProtoCodec.encodeDelimited).toArray))
        .toDF("value").localCheckpoint(true) // pre-materialize the wire bytes
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val decoded = graft.sources.ProtoCodec.fromWire(payloads, "value").toDF()
        val out = graft.streaming.FlowStreams.rollupPartials(decoded)
          .agg(org.apache.spark.sql.functions.sum("flow_count")).head().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        require(out == n, s"ingest lost rows: $out of $n")
        sec
      }
      val sec = median(samples)
      ingestRate = (n / sec).toLong
      f""","ingest":{"rows":$n,"sec":$sec%.3f,"rows_per_sec":$ingestRate,"spread":[${samples.min}%.3f,${samples.max}%.3f]}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ingest failed: ${e.getMessage}"); ""
    }
    // r19 (verdict #2): stamp the core count into BOTH json lines — the
    // driver's scaling pass re-runs this main at a lower SPARK_GRAFT_CPUS
    // and its per-query comparator needs to know which artifact is which
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":$reps,"cpus":$cpus,"queries":$qs,"spread":$spread,"samples":$samplesJson,"pass_wall":$passWall$errJson$ingest,"sf":"$sfDir"}"""
    println(line)
    // The driver's BENCH_r{N}.json keeps only a ~2 kB stdout TAIL; the full
    // line above is >10 kB, so its head (including the opening brace) is cut
    // and the driver records "parsed": null (r15 verdict #2). Emit a compact
    // summary as the FINAL stdout line — short enough that any tail ≥200
    // bytes contains it whole. Per-query detail stays in the full line and
    // in BENCH_full.json.
    val summary = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"cpus":$cpus,"ingest_rows_per_sec":$ingestRate,"sf":"$sfDir","detail":"BENCH_full_c$cpus.json"}"""
    println(summary)
    // ALSO persist the full line in-repo: the driver's BENCH_r{N}.json
    // keeps only the tail of stdout, which truncates per-query medians
    // for roughly the first half of the alphabet (r13 verdict #4) — the
    // file makes regressions diffable without re-running. Name is
    // overridable so A/B runs don't clobber the round artifact.
    // repo-relative default (resolved against the working dir) so a
    // checkout anywhere still gets the diffable artifact; the env var
    // stays the A/B override
    // r19 (verdict #2): the default filename is now PER CORE COUNT — the
    // driver's scaling run (same main, lower SPARK_GRAFT_CPUS) used to
    // clobber the 32-core per-query artifact because both wrote
    // BENCH_full.json. BENCH_full.json is still written for back-compat
    // readers, but it is now a copy of the LAST run, while
    // BENCH_full_c{cpus}.json is the stable per-configuration artifact.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      new java.io.File(s"BENCH_full_c$cpus.json").getAbsolutePath)
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
      if (!sys.env.contains("SPARK_GRAFT_BENCH_OUT")) {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(new java.io.File("BENCH_full.json").getAbsolutePath),
          line + "\n")
        ()
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
