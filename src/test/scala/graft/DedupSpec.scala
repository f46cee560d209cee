package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkTestBase {

  // shared streaming-fixture helpers (one copy — the four tests using them
  // drifted into local redefinitions; r7 test review)
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dedup_spec").toString
  private def words(prefix: String): Seq[String] = (0 until 30).map(i => s"$prefix$i")

  test("containment catches doc-in-doc duplication that Jaccard misses (r12)") {
    import spark.implicits._
    // A is pasted whole into B behind 100 words of boilerplate: J(A,B) =
    // |A|/|B| ≈ 0.22 (below even the 0.5 gate halved), but C(A→B) = 1.0.
    // C and D share nothing; E is a verbatim copy of A (both containments 1).
    val a = (0 until 30).map(i => s"core$i")
    val b = (0 until 100).map(i => s"boiler$i") ++ a
    val docs = Seq(
      (1L, a.mkString(" ")), (2L, b.mkString(" ")),
      (3L, (0 until 40).map(i => s"other$i").mkString(" ")),
      (4L, (0 until 40).map(i => s"unrelated$i").mkString(" ")),
      (5L, a.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.containmentPairsOver(docs, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4))).toSeq
    // (1,2): A fully inside B — asymmetric (containment_a 1.0, b small);
    // (1,5)/(2,5): the copy pairs; nothing pairs C or D
    val byPair = got.map { case (x, y, ca, cb) => (x, y) -> (ca, cb) }.toMap
    assert(byPair.keySet === Set((1L, 2L), (1L, 5L), (2L, 5L)))
    assert(byPair((1L, 2L))._1 === 1.0 && byPair((1L, 2L))._2 < 0.25,
      s"doc-in-doc must be caught by the A-side containment alone: $byPair")
    assert(byPair((1L, 5L)) === ((1.0, 1.0)))
    // ... and the equal-threshold Jaccard screen does NOT see the (1,2)
    // doc-in-doc pair — the exact blindness containment exists to cure
    val jac = Dedup.ngramJaccardPairsOver(docs, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)) && jac.contains((1L, 5L)),
      s"Jaccard at the same 0.9 bar should miss doc-in-doc, got $jac")
  }

  test("exact dedup keeps one row per distinct text") {
    val n = Tables.documents(spark, sf).select("text").distinct().count()
    assert(Dedup.exactDedup(spark, sf).count() === n)
    val summary = Dedup.exactSummary(spark, sf)
    assert(summary.agg(sum("dup_count")).head().getLong(0)
      === Tables.documents(spark, sf).count())
  }

  test("exact dedup never shuffles document bodies (digest-only below the exchange)") {
    import org.apache.spark.sql.execution.window.WindowExec
    // EnsureRequirements puts the hash exchange directly below WindowExec,
    // so the window child's output is exactly what crosses the shuffle
    val plan = Dedup.exactDedup(spark, sf).queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(!w.child.output.map(_.name).contains("text"),
        s"document bodies cross the shuffle: ${w.child.output.map(_.name)}")
    }
  }

  test("minhash+LSH finds exactly the exact-jaccard ground-truth pairs") {
    val truth = Dedup.ngramJaccardPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDupPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh === truth)
  }

  test("split leakage = near-dup pairs crossing the deterministic split boundary") {
    val pairs = Dedup.minhashDupPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val leaks = Dedup.splitContamination(spark, sf).collect()
    // every leak is a genuine near-dup pair with genuinely different splits
    leaks.foreach { r =>
      assert(pairs.contains((r.getLong(0), r.getLong(2))))
      assert(r.getString(1) !== r.getString(3))
      assert(Set("train", "val", "test").contains(r.getString(1)))
    }
    // and pairs NOT reported are genuinely same-split (the filter is
    // exact, not lossy) — split recomputed independently here
    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val b = java.lang.Long.parseLong(hex, 16) % 10000
      if (b < 500) "val" else if (b < 1000) "test" else "train"
    }
    val leakSet = leaks.map(r => (r.getLong(0), r.getLong(2))).toSet
    (pairs -- leakSet).foreach { case (a, b) => assert(split(a) === split(b)) }
    leakSet.foreach { case (a, b) => assert(split(a) !== split(b)) }
  }

  test("decontamination: a train doc quoting an eval n-gram is flagged, clean docs are not (r11)") {
    import spark.implicits._
    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val b = java.lang.Long.parseLong(hex, 16) % 10000
      if (b < 500) "val" else if (b < 1000) "test" else "train"
    }
    val ids = (0L until 400L)
    val evalId = ids.find(split(_) != "train").get
    val trainIds = ids.filter(split(_) == "train").take(2)
    val (quoter, clean) = (trainIds(0), trainIds(1))
    // a 4-token phrase shared verbatim → exactly 2 common 3-gram shingles
    // (the boundary shingles differ because the surrounding tokens do)
    val phrase = "alpha beta gamma delta"
    val dir2 = java.nio.file.Files.createTempDirectory("graft_decontam").toString
    Seq(
      (evalId, s"unique evaluation context $phrase closing evaluation words", "en", "t", 60L),
      (quoter, s"entirely separate training prose quoting $phrase within longer body", "en", "t", 70L),
      (clean, "spotless training document sharing no trigram with anything else", "en", "t", 64L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val out = Dedup.decontaminate(spark, dir2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set(quoter),
      s"only the quoting TRAIN doc is flagged (eval docs never are): ${out.keySet}")
    val (nSh, matched, evalDocs, frac) = out(quoter)
    assert(matched === 2L, s"the 4-token quote shares exactly 2 shingles, got $matched")
    assert(evalDocs === 1L)
    assert(nSh > matched && frac > 0.0 && frac < 1.0)
    // the engine-side result equals the spec's own string-keyed recount
    val quoterShingles = Seq("entirely separate training", "separate training prose",
      "training prose quoting", "prose quoting alpha", "quoting alpha beta",
      "alpha beta gamma", "beta gamma delta", "gamma delta within",
      "delta within longer", "within longer body")
    assert(nSh === quoterShingles.length.toLong)
  }

  test("streaming exact dedup: in-horizon duplicates dropped, bodies stay out of state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Long, String)]
    val deduped = graft.operators.Dedup.streamingExactDedup(
      src.toDF().toDF("doc_id", "ts", "text"), "text", "ts", lateness = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup").start()
    val t0 = 1704067200L
    // batch 1: three distinct texts, one in-batch duplicate
    src.addData((1L, t0, "alpha body"), (2L, t0 + 10, "beta body"),
      (3L, t0 + 20, "alpha body"), (4L, t0 + 30, "gamma body"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate inside the horizon + one new text
    src.addData((5L, t0 + 60, "beta body"), (6L, t0 + 70, "delta body"))
    q.processAllAvailable()
    // doc 7 rides the batch that ADVANCES the watermark past the horizon:
    // eviction happens after that batch, so the original's state is still
    // live when 7 arrives — dropped. Doc 8, in the NEXT batch, sees the
    // evicted state and counts as a new document.
    src.addData((7L, t0 + 7200, "alpha body"))
    q.processAllAvailable()
    src.addData((8L, t0 + 7300, "alpha body"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("stream_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(Set(1L, 2L, 4L, 6L)).size === 4) // originals kept
    assert(!kept.contains(3L) && !kept.contains(5L))       // in-horizon dups dropped
    assert(!kept.contains(7L))                             // dup while state still live
    assert(kept.contains(8L))                              // post-eviction re-appearance = new
  }

  test("streaming near-dup dedup: cross-batch variants drop in-flight; equals the batch keep set") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.ManifestTable
    implicit val sqlCtx = spark.sqlContext
    // one substituted word: jaccard ≈ 25/31 ≈ 0.81, so the 16×4 banding
    // catches the pair with probability 1 - (1-0.81⁴)¹⁶ ≈ 0.9998 (and the
    // draw is deterministic — xxhash64 — so the test cannot flake)
    def variantOf(ws: Seq[String], tag: String): Seq[String] =
      ws.updated(10, tag + "x")
    def t(ws: Seq[String]): String = ws.mkString(" ")
    val b1 = Seq(1L -> t(words("alpha")), 2L -> t(words("beta")), 3L -> t(words("gamma")))
    val b2 = Seq(4L -> t(words("delta")),
      5L -> t(variantOf(words("alpha"), "v5")),   // cross-batch near-dup of 1
      6L -> t(variantOf(words("delta"), "v6")))   // batch-local near-dup of 4
    val b3 = Seq(7L -> t(words("beta")),          // exact cross-batch dup of 2
      8L -> t(words("eps")),
      9L -> t(variantOf(words("eps"), "v9")))     // batch-local near-dup of 8

    val idx = tmp(); val out = tmp(); val cp = tmp()
    val src = MemoryStream[(Long, String)]
    val q = Dedup.startStreamingNearDup(
      src.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, out, cp)
    Seq(b1, b2, b3).foreach { b => src.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val kept = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // batch reference: the same pair set, derived by the edge rule
    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val pairs = Dedup.minhashDupPairsOver(all)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.map(_._2).toSet
    assert(dropped === Set(5L, 6L, 7L, 9L), "planted dups should all be caught")
    assert(kept === (b1 ++ b2 ++ b3).map(_._1).toSet -- dropped)
    // a crash replay of the last micro-batch must be a no-op on all three tables
    val vOut = ManifestTable.snapshot(out)
    val vSh = ManifestTable.snapshot(s"$idx/shingles")
    Dedup.nearDupBatch(b3.toDF("doc_id", "text"), 2L, "text", "doc_id",
      idx, out, 0.2, 64, 16)
    assert(ManifestTable.snapshot(out) === vOut)
    assert(ManifestTable.snapshot(s"$idx/shingles") === vSh)
  }

  test("streaming near-dup probe reads a bounded bucket subset, not the corpus index") {
    import spark.implicits._
    import graft.streaming.ManifestTable
    val idx = tmp(); val out = tmp()
    // seed batch: 12 distinct docs → band index spread over many bh buckets
    val corpus = (1L to 12L).map(i => (i, words(s"p${i}x").mkString(" ")))
    Dedup.nearDupBatch(corpus.toDF("doc_id", "text"), 0L, "text", "doc_id",
      idx, out, 0.2, 64, 16)
    // probe batch: ONE doc, a near-dup variant of doc 3 (jaccard ≈ 0.81)
    val probe = Seq((100L, words("p3x").updated(10, "subst").mkString(" ")))
    Dedup.nearDupBatch(probe.toDF("doc_id", "text"), 1L, "text", "doc_id",
      idx, out, 0.2, 64, 16)
    // a 1-doc batch has ≤16 distinct band hashes → probes ≤16 of the 64
    // bh buckets; the manifest prune must hand Spark only those files
    val (bSel, bTot) = ManifestTable.lastPruneStats(s"$idx/bands").get
    assert(bSel <= 16, s"1-doc batch should probe ≤16 band buckets, read $bSel")
    assert(bSel < bTot, s"bands probe should prune files: read $bSel of $bTot")
    // shingle verify probes only the candidate ids' buckets (here: doc 3's)
    val (sSel, sTot) = ManifestTable.lastPruneStats(s"$idx/shingles").get
    assert(sSel < sTot, s"shingles probe should prune files: read $sSel of $sTot")
    // and the pruned probe still catches the planted cross-batch near-dup
    val kept = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(100L), "cross-batch near-dup must drop through the pruned probe")
    assert(kept === (1L to 12L).toSet)
  }

  test("streaming near-dup: async off-trigger vacuum reclaims expired bytes (r11)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.ManifestTable
    implicit val sqlCtx = spark.sqlContext
    val idx = tmp(); val out = tmp(); val cp = tmp()
    def t(ws: Seq[String]): String = ws.mkString(" ")
    val src = MemoryStream[(Long, String)]
    // horizon 1 + vacuum every batch, grace 0: each processed batch
    // expires the prior one's index files and schedules their byte
    // reclamation on the daemon thread — never on the trigger path
    val q = Dedup.startStreamingNearDup(
      src.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, out, cp,
      compactEvery = 0, probeHorizon = 1L, vacuumEvery = 1,
      vacuumGraceSeconds = 0L)
    (0 until 3).foreach { b =>
      src.addData((1 to 3).map(i => ((b * 10 + i).toLong, t(words(s"av${b}d${i}x")))): _*)
      q.processAllAvailable()
      // grace 0 is a TEST setting: serialize hygiene against the next
      // batch's staging (deployment keeps the default grace, which
      // protects in-flight staged files from a concurrent vacuum)
      Dedup.awaitVacuum(idx)
    }
    q.stop()
    // manifest: only the in-horizon batch survives expiry
    val minBatch = ManifestTable.read(spark, s"$idx/bands")
      .agg(org.apache.spark.sql.functions.min("src_batch")).head().getLong(0)
    assert(minBatch >= 2L, s"expiry must retire beyond-horizon batches, min=$minBatch")
    // disk: the async vacuum reclaimed the retired files' bytes — on-disk
    // parquet count equals the manifest's live file count
    def diskParquet(tbl: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(tbl))
      try s.filter(p => p.toString.endsWith(".parquet")).count() finally s.close()
    }
    for (tbl <- Seq(s"$idx/bands", s"$idx/shingles")) {
      val live = ManifestTable.snapshotEntries(tbl)._2.size
      assert(diskParquet(tbl) === live.toLong,
        s"$tbl: async vacuum must leave exactly the live manifest files on disk")
    }
    // the kept output is untouched by hygiene: all 9 distinct docs survive
    val kept = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.size === 9)
  }

  test("probe horizon: beyond-horizon dup kept in-stream + caught by batch sweep; files skip and expire (r9)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{min => fmin}
    import graft.streaming.ManifestTable
    val idx = tmp(); val out = tmp()
    val H = 2L
    // batch 0: the old corpus; batches 1-2: fresh docs that advance the
    // horizon until batch 0 falls outside it
    val corpus = (1L to 6L).map(i => (i, words(s"p${i}x").mkString(" ")))
    Dedup.nearDupBatch(corpus.toDF("doc_id", "text"), 0L, "text", "doc_id",
      idx, out, 0.2, 64, 16, 64, H)
    (1 to 2).foreach { b =>
      val docs = (1L to 3L).map(i => (b * 10 + i, words(s"hb${b}d${i}x").mkString(" ")))
      Dedup.nearDupBatch(docs.toDF("doc_id", "text"), b.toLong, "text", "doc_id",
        idx, out, 0.2, 64, 16, 64, H)
    }
    // batch 3 with horizon 2 probes batches [1, 3) only:
    //   100 near-dups batch-0 doc 3 (beyond horizon) — KEPT in-stream;
    //   101 near-dups batch-2 doc 21 (in-horizon) — still drops
    val probe = Seq(
      (100L, words("p3x").updated(10, "subst").mkString(" ")),
      (101L, words("hb2d1x").updated(10, "subst2").mkString(" ")))
    Dedup.nearDupBatch(probe.toDF("doc_id", "text"), 3L, "text", "doc_id",
      idx, out, 0.2, 64, 16, 64, H)
    val kept = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(100L), "beyond-horizon dup must be kept in-stream (horizon contract)")
    assert(!kept.contains(101L), "in-horizon dup must still drop")
    // the manifest range prune reads strictly fewer index files under the
    // horizon than the unbounded probe of the SAME batch (nearDupKeep
    // commits nothing, so both probes see the identical index)
    Dedup.nearDupKeep(probe.toDF("doc_id", "text"), 3L, "text", "doc_id",
      idx, 0.2, 64, 16, 64, 0L)
    val (selFull, totFull) = ManifestTable.lastPruneStats(s"$idx/bands").get
    Dedup.nearDupKeep(probe.toDF("doc_id", "text"), 3L, "text", "doc_id",
      idx, 0.2, 64, 16, 64, H)
    val (selH, totH) = ManifestTable.lastPruneStats(s"$idx/bands").get
    assert(totH === totFull)
    assert(selH < selFull,
      s"horizon must skip beyond-horizon files at the manifest: $selH vs $selFull of $totFull")
    // the batch corpusKeep sweep catches the horizon escapee retrospectively
    val sweepDir = tmp()
    ManifestTable.read(spark, out).select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$sweepDir/documents.parquet")
    val sweep = Dedup.corpusKeep(spark, sweepDir).collect().map(_.getLong(0)).toSet
    assert(!sweep.contains(100L), "batch sweep must catch the beyond-horizon dup")
    assert(sweep.contains(3L), "the canonical (lowest-id) copy survives the sweep")
    // r11: the SINCE-BOUNDED incremental sweep makes that backstop
    // O(window), not O(corpus): only the batch-3 output window is read
    // (manifest file bound, prune-stats-proven) and probed against the
    // index restricted to pre-window batches — which includes the
    // beyond-horizon history the stream never probed
    val esc = Dedup.sweepHorizonEscapees(spark, idx, out, sinceBatch = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(esc === Set(100L), s"bounded sweep must catch exactly the escapee: $esc")
    val (wSel, wTot) = ManifestTable.lastPruneStats(out).get
    assert(wSel < wTot,
      s"sweep left side must be bounded to the since-window: $wSel of $wTot")
    // apply: the escapee leaves the table in one atomic swap of only the
    // window's files; everything else survives
    val removed = Dedup.purgeHorizonEscapees(spark, idx, out, sinceBatch = 3L)
    assert(removed === 1L, s"purge must remove the one escapee, removed=$removed")
    val afterPurge = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!afterPurge.contains(100L) && afterPurge === kept - 100L,
      "purge must drop exactly the escapee and keep everything else")
    // storage-side horizon: files wholly below beforeBatch leave the
    // manifest; the remaining index still reads (and min src_batch proves
    // only in-horizon batches remain)
    val retired = Dedup.expireNearDupIndex(idx, 2L)
    assert(retired > 0, "expiry must retire batch-0/1 index files")
    val remaining = ManifestTable.read(spark, s"$idx/bands")
      .agg(fmin("src_batch")).head().getLong(0)
    assert(remaining >= 2L, s"expired batches must leave the index, min src_batch=$remaining")
    // ... and the lease-guarded vacuum (wired into startStreamingNearDup
    // as an async daemon-thread step on its own cadence since r11)
    // reclaims the retired BYTES — without it the directory grows
    // O(corpus lifetime) in dead files while the manifest stays O(horizon)
    def diskParquet(t: String): Long = {
      val root = java.nio.file.Paths.get(t)
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val before = diskParquet(s"$idx/bands")
    val reclaimed = ManifestTable.vacuum(s"$idx/bands", graceSeconds = 0L)
    assert(reclaimed >= retired / 2,
      s"vacuum must reclaim the expired files' bytes, got $reclaimed of $retired")
    assert(diskParquet(s"$idx/bands") < before, "dead parquet files must leave the disk")
    assert(ManifestTable.read(spark, s"$idx/bands")
      .agg(fmin("src_batch")).head().getLong(0) >= 2L,
      "vacuum must not touch live in-horizon files")
  }

  test("sweep cadence: the STREAM alone purges a beyond-horizon escapee; frontier persists across restart (r12)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{min => fmin}
    import graft.streaming.ManifestTable
    implicit val sqlCtx = spark.sqlContext
    def t(ws: Seq[String]): String = ws.mkString(" ")
    val idx = tmp(); val out = tmp(); val cp = tmp()
    val H = 2L
    val src = MemoryStream[(Long, String)]
    val q = Dedup.startStreamingNearDup(
      src.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, out, cp,
      probeHorizon = H, sweepEvery = 4)
    // batch 0: the old corpus; batches 1-2 push it beyond the horizon
    src.addData((1L to 6L).map(i => (i, t(words(s"p${i}x")))): _*); q.processAllAvailable()
    (1 to 2).foreach { b =>
      src.addData((1L to 3L).map(i => (b * 10 + i, t(words(s"hb${b}d${i}x")))): _*)
      q.processAllAvailable()
    }
    // batch 3: doc 100 near-dups batch-0 doc 3 — beyond horizon, so the
    // in-stream probe keeps it; batch 3 also completes the sweepEvery=4
    // cadence, so the stream schedules its own retrospective sweep
    src.addData((100L, t(words("p3x").updated(10, "subst")))); q.processAllAvailable()
    Dedup.awaitSweep(out)
    val kept = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(100L), "the STREAM's own sweep must purge the escapee")
    assert(kept.contains(3L), "the canonical survives the sweep")
    assert(Dedup.sweepFrontier(out) === 4L, "completed sweep must persist its frontier")
    q.stop()

    // restart on the same checkpoint + SAME source: the persisted frontier
    // bounds both the next sweep's window and the index expiry
    val q2 = Dedup.startStreamingNearDup(
      src.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, out, cp,
      probeHorizon = H, sweepEvery = 1)
    src.addData((200L, t(words("fresh200")))); q2.processAllAvailable()
    Dedup.awaitSweep(out)
    q2.stop()
    assert(Dedup.sweepFrontier(out) === 5L, "restarted stream advances, never rewinds")
    // the restart-triggered sweep read ONLY the post-frontier window: the
    // purged fold carries the old window's batch identity, so the manifest
    // excludes it — no double-sweep of already-adjudicated batches
    val (wSel, wTot) = ManifestTable.lastPruneStats(out).get
    assert(wSel === 1 && wTot >= 2,
      s"restart sweep must read only batch-4's file, read $wSel of $wTot")
    // expiry under the sweep cadence is frontier-bounded (retention ~2H):
    // at batch 4 the frontier was 4, so index batches < 4 - H = 2 retired
    val minSrc = ManifestTable.read(spark, s"$idx/bands")
      .agg(fmin("src_batch")).head().getLong(0)
    assert(minSrc >= 2L && minSrc < 4L,
      s"frontier-bounded expiry must keep [frontier-H, ...) for the sweep, min=$minSrc")
    val after = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after === kept + 200L, "restart must not re-purge or lose anything")
  }

  test("persistent sweep failure trips the horizon-expiry fallback seam (r13 advice)") {
    // a stuck frontier silently disables frontier-bounded index expiry, so
    // the expiry path consults this counter: after MaxSweepFailures
    // consecutive failures it falls back to live-horizon expiry, and one
    // success re-arms frontier-bounded retention
    val out = tmp()
    assert(Dedup.consecutiveSweepFailures(out) === 0)
    (1 to Dedup.MaxSweepFailures - 1).foreach(i =>
      assert(Dedup.recordSweepFailure(out) === i))
    assert(Dedup.consecutiveSweepFailures(out) < Dedup.MaxSweepFailures,
      "below the threshold the frontier is still trusted")
    assert(Dedup.recordSweepFailure(out) === Dedup.MaxSweepFailures)
    assert(Dedup.consecutiveSweepFailures(out) >= Dedup.MaxSweepFailures,
      "at the threshold expiry must stop trusting the stuck frontier")
    // counters are per output table — another stream is unaffected
    val other = tmp()
    assert(Dedup.consecutiveSweepFailures(other) === 0)
    // a completed sweep resets the count (resetSweepFailures is what the
    // success path calls) and frontier-bounded expiry resumes
    Dedup.resetSweepFailures(out)
    assert(Dedup.consecutiveSweepFailures(out) === 0)
  }

  test("era-scoped compaction keeps the horizon file-skip effective after folding (r9)") {
    import spark.implicits._
    import graft.streaming.ManifestTable
    val idx = tmp(); val out = tmp()
    val H = 2L
    (0 to 3).foreach { b =>
      val docs = (1L to 4L).map(i => (b * 10 + i, words(s"e${b}d${i}x").mkString(" ")))
      Dedup.nearDupBatch(docs.toDF("doc_id", "text"), b.toLong, "text", "doc_id",
        idx, out, 0.2, 64, 16, 64, H)
    }
    // eraSpan = H: batches {0,1} fold separately from {2,3}, so no folded
    // file straddles a future horizon boundary
    assert(Dedup.compactNearDupIndex(spark, idx, 1, eraSpan = H))
    // folded files must carry re-recorded src_batch stats spanning ≤ 1 era
    val spans = ManifestTable.snapshotEntries(s"$idx/bands")._2.flatMap(_.stats)
    assert(spans.nonEmpty, "compacted files must re-record src_batch stats")
    spans.foreach { case (c, mn, mx) =>
      assert(c === "src_batch" && mn / H === mx / H,
        s"fold spans eras: [$mn,$mx] with eraSpan $H") }
    // probe at batch 4, horizon [2,4): era-0 folds are skipped at the
    // manifest; an in-horizon dup still drops through the folded index
    val probe = Seq(
      (900L, words("e3d1x").updated(10, "subst").mkString(" ")),   // in-horizon dup
      (901L, words("e0d1x").updated(10, "subst2").mkString(" ")))  // beyond-horizon dup
    Dedup.nearDupKeep(probe.toDF("doc_id", "text"), 4L, "text", "doc_id",
      idx, 0.2, 64, 16, 64, 0L)
    val (selFull, _) = ManifestTable.lastPruneStats(s"$idx/bands").get
    Dedup.nearDupKeep(probe.toDF("doc_id", "text"), 4L, "text", "doc_id",
      idx, 0.2, 64, 16, 64, H)
    val (selH, _) = ManifestTable.lastPruneStats(s"$idx/bands").get
    assert(selH < selFull,
      s"horizon must keep skipping folded era files: $selH vs $selFull")
    Dedup.nearDupBatch(probe.toDF("doc_id", "text"), 4L, "text", "doc_id",
      idx, out, 0.2, 64, 16, 64, H)
    val kept = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(900L), "in-horizon dup must drop against the folded index")
    assert(kept.contains(901L), "beyond-horizon dup stays in-stream after folding")
  }

  test("streaming near-dup runs object-store posture end-to-end: probe, drop, compact") {
    import spark.implicits._
    import graft.streaming.ManifestTable
    val idx = tmp(); val out = tmp()
    // the WHOLE component — both index tables and the output table — on
    // the rename-free storage emulation: proves the managed-table stack a
    // deployment inherits (appends, pruned probes, online compaction
    // swaps) needs nothing rename-shaped
    ObjectStoreTestIO.withObjectStore(s"$idx/bands", s"$idx/shingles", out) { _ =>
      val corpus = (1L to 12L).map(i => (i, words(s"p${i}x").mkString(" ")))
      Dedup.nearDupBatch(corpus.toDF("doc_id", "text"), 0L, "text", "doc_id",
        idx, out, 0.2, 64, 16)
      val probe = Seq((100L, words("p3x").updated(10, "subst").mkString(" ")))
      Dedup.nearDupBatch(probe.toDF("doc_id", "text"), 1L, "text", "doc_id",
        idx, out, 0.2, 64, 16)
      val (bSel, bTot) = ManifestTable.lastPruneStats(s"$idx/bands").get
      assert(bSel < bTot, s"bands probe must still prune: $bSel of $bTot")
      // replay of an already-committed batch stays a no-op on this posture
      val v = ManifestTable.snapshot(out)._1
      Dedup.nearDupBatch(probe.toDF("doc_id", "text"), 1L, "text", "doc_id",
        idx, out, 0.2, 64, 16)
      assert(ManifestTable.snapshot(out)._1 === v)
      // online compaction's swap commits through the conditional PUT
      assert(Dedup.compactNearDupIndex(spark, idx))
      val kept = ManifestTable.read(spark, out).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(!kept.contains(100L), "cross-batch near-dup must drop")
      assert(kept === (1L to 12L).toSet)
    }
  }

  test("streaming near-dup: an EMPTY micro-batch absorbs its id without hanging") {
    import spark.implicits._
    import graft.streaming.ManifestTable
    val idx = tmp(); val out = tmp()
    val corpus = (1L to 4L).map(i => (i, words(s"p${i}x").mkString(" ")))
    Dedup.nearDupBatch(corpus.toDF("doc_id", "text"), 0L, "text", "doc_id",
      idx, out, 0.2, 64, 16)
    // an empty trigger batch: the observed-metric probe collects must
    // deliver (empty sets) rather than block, and the batch id must be
    // absorbed so a replay is a no-op
    Dedup.nearDupBatch(Seq.empty[(Long, String)].toDF("doc_id", "text"), 1L,
      "text", "doc_id", idx, out, 0.2, 64, 16)
    assert(ManifestTable.maxBatchId(out) === 1L)
    assert(ManifestTable.read(spark, out).count() === 4)
  }

  test("near-dup index compaction bounds file growth; probe stays correct after folding") {
    import spark.implicits._
    import graft.streaming.ManifestTable
    val idx = tmp(); val out = tmp()
    // 5 batches of distinct docs: every batch appends a file per touched
    // bucket, so bucket dirs accumulate one fragment per batch
    (0 until 5).foreach { b =>
      val docs = (1L to 6L).map(i => (b * 10 + i, words(s"b${b}d${i}x").mkString(" ")))
      Dedup.nearDupBatch(docs.toDF("doc_id", "text"), b.toLong, "text", "doc_id",
        idx, out, 0.2, 64, 16)
    }
    def filesPerBucket(table: String): Map[String, Int] =
      ManifestTable.snapshot(table)._2
        .groupBy(f => f.take(f.lastIndexOf('/').max(0))).map { case (k, v) => (k, v.size) }
    val before = filesPerBucket(s"$idx/bands")
    assert(before.values.max > 1, "fixture must actually fragment buckets")
    val preMax = ManifestTable.maxBatchId(s"$idx/bands")
    assert(Dedup.compactNearDupIndex(spark, idx), "compaction swap must commit")
    val after = filesPerBucket(s"$idx/bands")
    assert(after.values.max === 1, s"every bucket folds to one file: $after")
    assert(filesPerBucket(s"$idx/shingles").values.max === 1)
    // the replay guard survives folding (swap preserves the manifest header)
    assert(ManifestTable.maxBatchId(s"$idx/bands") === preMax)
    // a post-compaction batch still probes pruned AND catches a planted
    // cross-batch near-dup of a batch-0 document
    val probe = Seq((999L, words("b0d3x").updated(10, "subst").mkString(" ")))
    Dedup.nearDupBatch(probe.toDF("doc_id", "text"), 5L, "text", "doc_id",
      idx, out, 0.2, 64, 16)
    val (bSel, bTot) = ManifestTable.lastPruneStats(s"$idx/bands").get
    assert(bSel < bTot, s"probe must stay pruned after compaction: $bSel of $bTot")
    val kept = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(999L), "planted near-dup must drop against the folded index")
    assert(kept.size === 30)
  }

  test("index compaction RACES the streaming near-dup query: drops unchanged, no loss") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.ManifestTable
    implicit val sqlCtx = spark.sqlContext
    def variantOf(ws: Seq[String], tag: String): Seq[String] = ws.updated(10, tag + "x")
    def t(ws: Seq[String]): String = ws.mkString(" ")
    // same planted fixture as the sequential streaming test: expected
    // drops are {5 (cross-batch near-dup of 1), 6 (local near-dup of 4),
    // 7 (exact dup of 2), 9 (local near-dup of 8)}
    val b1 = Seq(1L -> t(words("alpha")), 2L -> t(words("beta")), 3L -> t(words("gamma")))
    val b2 = Seq(4L -> t(words("delta")), 5L -> t(variantOf(words("alpha"), "v5")),
      6L -> t(variantOf(words("delta"), "v6")))
    val b3 = Seq(7L -> t(words("beta")), 8L -> t(words("eps")),
      9L -> t(variantOf(words("eps"), "v9")))
    val idx = tmp(); val out = tmp(); val cp = tmp()
    val src = MemoryStream[(Long, String)]
    val q = Dedup.startStreamingNearDup(
      src.toDF().toDF("doc_id", "text"), "text", "doc_id", idx, out, cp)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val compactor = new Thread(() => {
      try while (!stop.get()) {
        Dedup.compactNearDupIndex(spark, idx)
        Thread.sleep(20)
      } catch { case e: Throwable => failure.set(e) }
    })
    compactor.setDaemon(true)
    compactor.start()
    try Seq(b1, b2, b3).foreach { b => src.addData(b: _*); q.processAllAvailable() }
    finally { q.stop(); stop.set(true); compactor.join(60000) }
    // bounded join: a deadlocked compactor must FAIL the test, not hang
    // the suite until a CI-level kill
    assert(!compactor.isAlive, "compactor thread wedged (possible lock inversion)")
    assert(failure.get() === null, s"compactor must not fail: ${failure.get()}")
    val kept = ManifestTable.read(spark, out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 8L), "drops must be exactly the planted dups")
    // the index is intact after the race: batch header preserved, every
    // signature row present exactly once
    assert(ManifestTable.maxBatchId(s"$idx/bands") === 2L)
    val bd = ManifestTable.read(spark, s"$idx/bands")
    assert(bd.count() === bd.distinct().count(), "no duplicated index rows")
    assert(bd.select("doc_id").distinct().count() === 9L, "all 9 docs indexed")
  }

  test("substring spans: shared literal spans flagged across dissimilar docs; unique text is 0") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ") // a 10-token literal span
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, uniq("alpha", 20)),                  // fully unique → dup_frac 0
      (2L, boiler + " " + uniq("beta", 15)),    // span at the head
      (3L, uniq("gamma", 15) + " " + boiler),   // same span at the tail — docs 2,3
                                                // are NOT near-dups (jaccard ~0.2 of
                                                // 3-grams), but share the literal span
      (4L, uniq("delta", 6)),                   // < 8 tokens: no window, excluded
      (5L, boiler.replace("boiler", "only") + " filler " +
        boiler.replace("boiler", "only"))       // WITHIN-doc repetition counts too
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupOver(docs, w = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!got.contains(4L), "sub-window docs are excluded")
    assert(got(1L) === ((13L, 0L)), "unique doc: 20-8+1 windows, none duplicated")
    // the 10-token span yields 3 fully-contained 8-windows in each carrier
    assert(got(2L)._2 === 3L, s"head-span doc must flag 3 windows, got ${got(2L)}")
    assert(got(3L)._2 === 3L, s"tail-span doc must flag 3 windows, got ${got(3L)}")
    // within-doc repeat: both copies' windows are duplicated (6 of 14)
    assert(got(5L)._1 === 14L && got(5L)._2 >= 6L, s"in-doc repeat: ${got(5L)}")
    // and the registry query runs on the real table with sane bounds
    val reg = Dedup.substringDupStats(spark, sf).collect()
    assert(reg.nonEmpty)
    assert(reg.forall { r =>
      val (nw, dw) = (r.getLong(1), r.getLong(2)); dw >= 0 && dw <= nw })
  }

  test("substring window digests: two-level narrow-scan build equals the direct wide-scan build bit-for-bit (r19)") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val rows = Seq(
      (1L, uniq("alpha", 20)),
      (2L, boiler + " " + uniq("beta", 15)),
      (3L, uniq("gamma", 15) + " " + boiler),
      (5L, boiler.replace("boiler", "only") + " filler " +
        boiler.replace("boiler", "only")),
      (9L, (1 to 20).map(_ => "tok").mkString(" ")))
    // 1 input partition < defaultParallelism/2 → the token-digest spread
    // path; defaultParallelism partitions → the direct md5-of-window path
    val narrowDocs = rows.toDF("doc_id", "text").coalesce(1)
    val wideDocs = rows.toDF("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    assert(Dedup.substringDupOver(narrowDocs, 8).collect().toSeq ===
      Dedup.substringDupOver(wideDocs, 8).collect().toSeq,
      "dup stats must not depend on which digest build ran")
    assert(Dedup.substringTrimOver(narrowDocs, 8).collect().toSeq ===
      Dedup.substringTrimOver(wideDocs, 8).collect().toSeq,
      "trim output must not depend on which digest build ran")
  }

  test("substring trim: one canonical copy survives corpus-wide; clean docs untouched") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, uniq("alpha", 20)),                // clean: passes through (normalized)
      (2L, boiler + " " + uniq("beta", 15)),  // canonical carrier (lowest doc_id)
      (3L, uniq("gamma", 15) + " " + boiler)  // later carrier: span removed
    ).toDF("doc_id", "text")
    val got = Dedup.substringTrimOver(docs, w = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((uniq("alpha", 20), 20L, 0L)), "clean doc must be untouched")
    // doc 2 holds the FIRST occurrence: kept whole
    assert(got(2L)._1 === boiler + " " + uniq("beta", 15))
    assert(got(2L)._3 === 0L)
    // doc 3: the 3 fully-contained duplicated windows cover tokens 16..25
    // (positions 16,17,18 + w-1) → exactly the 10 boilerplate tokens go
    assert(got(3L)._1 === uniq("gamma", 15), s"boilerplate must be trimmed: ${got(3L)}")
    assert(got(3L) === ((uniq("gamma", 15), 25L, 10L)))
    // trimming is idempotent: a second pass removes nothing
    val again = Dedup.substringTrimOver(
      Dedup.substringTrimOver(docs, w = 8)
        .select(col("doc_id"), col("text_clean").as("text")), w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again.values.forall(_ === 0L), s"second pass must be a no-op, got $again")
    // self-overlapping periodic repeat: a doc of ONE token × 20 — every
    // window shares one hash and overlaps the canonical copy; protection
    // must leave exactly one intact w-window (r8 review: the unprotected
    // union shredded the canonical copy down to a single token)
    val periodic = Seq((9L, (1 to 20).map(_ => "tok").mkString(" ")))
      .toDF("doc_id", "text")
    val p = Dedup.substringTrimOver(periodic, w = 8).collect().head
    assert(p.getString(1) === (1 to 8).map(_ => "tok").mkString(" "),
      s"one intact canonical window must survive, got '${p.getString(1)}'")
    assert(p.getLong(3) === 12L)
    // pathological scale case (r9 verdict #4): a 20k-token doc that is
    // ~all one repeated token → |removal set| ≈ n. The r8 per-token
    // array_contains rebuild paid O(n·|ps|) ≈ 4×10⁸ comparisons in one
    // task here; the array_except set-difference rebuild is O(n + |ps|)
    // and must finish promptly with identical semantics.
    val big = Seq((10L, (1 to 20000).map(_ => "tok").mkString(" ")))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val bp = Dedup.substringTrimOver(big, w = 8).collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    assert(bp.getString(1) === (1 to 8).map(_ => "tok").mkString(" "))
    assert(bp.getLong(2) === 20000L && bp.getLong(3) === 19992L)
    assert(sec < 30.0, f"pathological doc must rebuild in bounded time, took $sec%.1f s")
  }

  test("null-text docs are DISTINCT in batch dedup and pair with nobody in simhash (r8 review)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    Seq(
      (1L, "same body here", "en", "web", 14L),
      (2L, "same body here", "en", "web", 14L), // true exact dup of 1
      (3L, null.asInstanceOf[String], "en", "web", 0L),
      (4L, null.asInstanceOf[String], "en", "web", 0L) // NOT a dup of 3
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // exact dedup: md5(null) grouped docs 3+4 into one before the
    // sentinel digest — both must survive; the real dup still collapses
    val kept = Dedup.exactDedup(spark, dir).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L))
    val summary = Dedup.exactSummary(spark, dir).collect()
    assert(summary.length === 3)
    assert(summary.map(_.getLong(2)).sum === 4L)
    // simhash: a 0L fingerprint for null text paired 3-4 at hamming 0;
    // null fingerprints must pair with nobody
    val pairs = Dedup.simhashDupPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)), s"only the true dup pair, got $pairs")
    // degenerate banding parameters fail fast instead of all-pairs
    intercept[IllegalArgumentException](Dedup.simhashDupPairs(spark, dir, maxDist = 64))
    intercept[IllegalArgumentException](Dedup.simhashDupPairs(spark, dir, maxDist = 4))
  }

  test("clean corpus (zero near-dup pairs): clusters is empty, keep list is everyone") {
    // threshold > 1 makes the verified pair set provably empty — the old
    // labelSum hit getLong on a null sum and NPE'd (r7 review)
    val clusters = Dedup.nearDupClusters(spark, sf, threshold = 1.01)
    assert(clusters.count() === 0L)
    val keep = Dedup.corpusKeep(spark, sf, threshold = 1.01)
    assert(keep.count() === Tables.documents(spark, sf).count())
  }

  test("streaming exact dedup: null-text records pass through, not deduped against each other") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Long, String)]
    val q = Dedup.streamingExactDedup(
        src.toDF().toDF("doc_id", "ts", "text"), "text", "ts")
      .writeStream.outputMode("append").format("memory").queryName("null_dedup").start()
    val t0 = 1704067200L
    src.addData((1L, t0, "alpha"), (2L, t0 + 1, null), (3L, t0 + 2, null),
      (4L, t0 + 3, "alpha"))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("null_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // the md5(null)=null grouping used to keep only doc 2 of the two
    // null-text records; the real duplicate (4) still drops
    assert(kept === Set(1L, 2L, 3L))
  }

  test("minhash+LSH on planted synthetic duplicates") {
    import spark.implicits._
    // two near-identical docs + unrelated ones
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (1 to 60).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, base), (1L, nearDup), (2L, other))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("planted")
    val sh = Dedup.withMinhashSignature(
      docs.select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(split(trim(text),'\\\\s+'))-3), " +
          "i -> concat_ws(' ', split(trim(text),'\\\\s+')[i], split(trim(text),'\\\\s+')[i+1], split(trim(text),'\\\\s+')[i+2])))").as("sh")),
      "sh", 64)
    val cands = Dedup.minhashCandidates(
      sh.select(col("doc_id") +: (0 until 64).map(i => col(s"mh_$i")): _*), "doc_id", 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)))
    assert(!cands.contains((0L, 2L)) && !cands.contains((1L, 2L)))
  }

  test("df-capped ngram equals exact ground truth when no shingle is hot") {
    // the test corpus's hottest shingle df is far below the cap, so the
    // skew-safe variant must reproduce the exact result; on a skewed corpus
    // it bounds every join group at maxDf²
    val exact = Dedup.ngramJaccardPairs(spark, sf).collect().map(_.toSeq).toSeq
    val capped = Dedup.ngramJaccardPairsCapped(spark, sf).collect().map(_.toSeq).toSeq
    assert(capped === exact)
    // a cap of 1 removes every shared shingle -> no pairs survive
    assert(Dedup.ngramJaccardPairsCapped(spark, sf, maxDf = 1).count() === 0)
  }

  test("near-dup clusters: labels are component minima; keep-list = canonicals + singletons") {
    val cl = Dedup.nearDupClusters(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cl.nonEmpty)
    cl.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid, s"cluster $cid label is not its min member")
    }
    // every near-dup pair ends up inside one cluster
    val lbl = cl.toMap
    Dedup.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .foreach { case (a, b) => assert(lbl(a) === lbl(b)) }
    val keep = Dedup.corpusKeep(spark, sf).count()
    val total = Tables.documents(spark, sf).count()
    assert(keep === total - cl.count(x => x._1 != x._2))
    // reliable-checkpoint mode (durable rounds for executor-loss-prone
    // clusters): identical output through a filesystem checkpoint dir
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val reliable = Dedup.nearDupClusters(spark, sf, checkpointDir = Some(ckpt))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(reliable.sorted.toSeq === cl.sorted.toSeq,
      "reliable-checkpoint clusters must equal the localCheckpoint fast path")
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(ckpt)).count() > 0,
      "rounds should have checkpointed to the durable dir")
    // r9: checkpointDir now also pins the PAIR-GENERATION shingle-hash
    // relation (the stage the r8 verdict flagged as still riding executor
    // storage) — the end-to-end keep list is unchanged in reliable mode
    val keepReliable = Dedup.corpusKeep(spark, sf, checkpointDir = Some(ckpt)).count()
    assert(keepReliable === keep,
      "corpusKeep in durable-materialization mode must match the default path")
  }

  test("simhash pairs near-identical docs, not unrelated ones") {
    val pairs = Dedup.simhashDupPairs(spark, sf, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash at hamming<=3 should recover most >=0.8-jaccard planted dups
    val recall = if (truth.isEmpty) 1.0 else truth.count(pairs.contains).toDouble / truth.size
    assert(recall >= 0.6, s"simhash recall $recall over ${truth.size} planted pairs")
  }

  test("dup rate by source: totals reconcile with exact dedup; null texts never collapse (r11)") {
    val rep = Dedup.dupRateBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rep.nonEmpty)
    val docs = Tables.documents(spark, sf)
    assert(rep.map(_._2).sum === docs.count())
    rep.foreach { case (_, d, distinct, _, dupDocs, rate) =>
      assert(distinct <= d && dupDocs === d - distinct)
      assert(rate >= 0.0 && rate < 1.0)
    }
    // corpus-wide survivor count from the per-source report can't be less
    // than exactDedup's corpus-wide survivors (equal texts across sources
    // dedup corpus-wide but count once per source here)
    val survivors = Dedup.exactDedup(spark, sf).count()
    assert(rep.map(_._3).sum >= survivors)
  }

  test("edit-verified pairs: subset of LSH pairs, gate drops distant prefixes, distances exact (r11)") {
    val lsh = Dedup.minhashDupPairs(spark, sf).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val edit = Dedup.editVerifiedPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(edit.nonEmpty, "corpus has planted near-identical docs")
    assert(edit.forall { case (a, b, _) => lsh.contains((a, b)) },
      "edit pairs must come from the LSH candidate set, no all-pairs leak")
    assert(edit.forall(_._3 <= 3))
    // distances match a driver-side DP recompute on the same prefixes
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .na.drop().collect().map(r => r.getLong(0) -> r.getString(1).take(200)).toMap
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(t.length + 1)(identity)
      for (i <- 1 to s.length) {
        var prev = d(0); d(0) = i
        for (j <- 1 to t.length) {
          val cur = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (s(i - 1) == t(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(t.length)
    }
    edit.take(10).foreach { case (a, b, dist) =>
      assert(lev(texts(a), texts(b)) === dist, s"distance mismatch for ($a,$b)")
    }
    // the gate does real work when the corpus has distant-prefix near-dups
    val ungated = Dedup.editVerifiedPairs(spark, sf, maxDist = Int.MaxValue).count()
    assert(ungated >= edit.length)
  }

  test("cross-source duplication: pair counts replay driver-side; null texts never cross-match (r13)") {
    val got = Dedup.crossSourceDup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.foreach { case (a, b, shared, da, db) =>
      assert(a < b, "pairs must be canonically ordered")
      assert(shared > 0 && da >= shared && db >= shared,
        "each side has at least one doc per shared text")
    }
    // driver replay over (source, text)
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    val bySource = docs.filter(_._3.isDefined)
      .groupBy(_._2).map { case (s, ds) =>
        s -> ds.groupBy(_._3.get).map { case (t, xs) => t -> xs.size.toLong }
      }
    val sources = bySource.keys.toSeq.sorted
    val want = (for {
      i <- sources.indices; j <- i + 1 until sources.size
      a = sources(i); b = sources(j)
      shared = bySource(a).keySet.intersect(bySource(b).keySet)
      if shared.nonEmpty
    } yield (a, b, shared.size.toLong,
        shared.toSeq.map(bySource(a)).sum, shared.toSeq.map(bySource(b)).sum)).toSeq
    assert(got.toSeq.sortBy(x => (x._1, x._2)) === want.sortBy(x => (x._1, x._2)))
  }

  test("lsh eval: tp/fp/fn reconcile with the two pair sets; P/R/F1 are the one-division forms (r13)") {
    val r = Dedup.lshEval(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (nT, nA, tp, fp, fn) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    // identities that hold for ANY two pair sets
    assert(tp + fn === nT, "truth splits into hits + misses")
    assert(tp + fp === nA, "approx splits into hits + false alarms")
    // replay against the two pipelines directly
    val truth = Dedup.ngramJaccardPairs(spark, sf).select("doc_a", "doc_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val approx = Dedup.minhashDupPairs(spark, sf).select("doc_a", "doc_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nT === truth.size.toLong && nA === approx.size.toLong)
    assert(tp === truth.intersect(approx).size.toLong)
    assert(truth.nonEmpty, "corpus must contain near-dup pairs for the eval to exercise")
    def one(n: Long, d: Long) = if (d == 0) 0.0 else math.rint(n.toDouble / d * 1e6) / 1e6
    assert(math.abs(row.getDouble(5) - one(tp, nA)) < 1e-9, "precision")
    assert(math.abs(row.getDouble(6) - one(tp, nT)) < 1e-9, "recall")
    assert(math.abs(row.getDouble(7) - one(2 * tp, nT + nA)) < 1e-9, "harmonic F1")
  }

  test("threshold curve: cumulative counts replay from the pair relation; monotone; planted dup at 100 (r13)") {
    import spark.implicits._
    val rows = Dedup.thresholdCurve(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === (0 to 100 by 10).toSeq, "full spine, no missing buckets")
    // monotone non-increasing in the threshold, both series
    rows.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1)
    case _ => ()
    }
    // replay: integer-percent sims of every capped co-shingle pair
    val pairs = Dedup.ngramJaccardPairsCapped(spark, sf, threshold = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (r.getLong(2) * 100) / (math.round(r.getLong(2) / r.getDouble(3)))))
    // jaccard = common/union -> union = round(common/jaccard); integer pct = common*100 div union
    rows.foreach { case (t, np, nd) =>
      assert(np === pairs.count(_._3 >= t).toLong, s"pairs >= $t")
      val docs = (pairs.filter(_._3 >= t).map(_._1) ++ pairs.filter(_._3 >= t).map(_._2)).distinct
      assert(nd === docs.length.toLong, s"docs >= $t")
    }
    // planted exact duplicates surface in the top bucket
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val curve = Dedup.thresholdCurveOver(spark, planted, maxDf = 100).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(curve(100) === ((1L, 2L)),
      "the planted identical pair lands in the 100-percent bucket")
  }

  test("native shingles3 equals the UDF twin on the corpus and on whitespace/unicode edges (r13)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = Tables.documents(spark, sf).select("doc_id", "text")
    val nat = Dedup.withShingles(corpus, "text")
      .select("doc_id", "sh").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val hof = Dedup.withShinglesUdf(corpus, "text")
      .select("doc_id", "sh").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(nat.size === hof.size && nat.nonEmpty)
    nat.foreach { case (id, sh) => assert(sh === hof(id), s"doc $id") }
    // edges: leading/trailing/multi whitespace, tabs/newlines/CR, < 3
    // tokens, repeated shingles (distinct, first-occurrence order),
    // multi-byte UTF-8 tokens, empty and null text
    val edges = Seq(
      "  a b c  ", "a\t\tb\nc\rd", "one two", "", "x y z x y z x y z",
      "héllo wörld ünïcode ångström", "a  b   c    d", null,
      // sub-0x20 control chars: String.trim strips ALL chars <= U+0020
      // at the edges (not just the 6 \s bytes) — the r13 advice gap;
      // interior controls are NON-whitespace for the \s+ split
      "\u0001a b c\u001f", "\u0000\u0007 x y z \u0002", "a\u0001b c d",
      "\u001fone two three\u0008"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val edf = edges.toDF("doc_id", "text")
    val natE = Dedup.withShingles(edf, "text").select("doc_id", "sh").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val hofE = Dedup.withShinglesUdf(edf, "text").select("doc_id", "sh").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    natE.foreach { case (id, sh) => assert(sh === hofE(id), s"edge $id") }
  }

  test("cluster size spectrum: conserves docs; redundant = docs - clusters; bands replay (r13)") {
    val rows = Dedup.clusterSizeDist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum === nDocs, "bands conserve the corpus")
    rows.foreach { case (_, nc, nd, nr) => assert(nr === nd - nc) }
    val sizes = Dedup.exactSummary(spark, sf).collect().map(_.getLong(2))
    val want = sizes.groupBy(java.lang.Long.highestOneBit)
      .view.mapValues(xs => (xs.length.toLong, xs.sum, xs.sum - xs.length)).toMap
    assert(rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap === want)
  }

  test("df profile: bands replay from a driver shingle recount; pair mass is the quadratic cost (r13)") {
    val rows = Dedup.dfProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver recount with the operator's own shingle definition:
    // whitespace 3-grams, DISTINCT within document
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0)).filter(_ != null)
    val dfByShingle = docs.flatMap { t =>
      val w = t.trim.split("\\s+").toSeq
      (if (w.length < 3) Seq.empty[String]
       else w.sliding(3).map(_.mkString(" ")).toSeq).distinct
    }.groupBy(identity).map { case (_, xs) => xs.length.toLong }
    def band(df: Long): Long = java.lang.Long.highestOneBit(df)
    val want = dfByShingle.groupBy(band).map { case (b, dfs) =>
      b -> ((dfs.size.toLong, dfs.sum, dfs.map(d => d * (d - 1) / 2).sum)) }
    assert(rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap === want)
    rows.foreach { case (b, _, _, _) =>
      assert(java.lang.Long.bitCount(b) === 1, s"band $b must be a power of two") }
  }
}
