package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("media table: payload bytes + typed metadata, one row per document") {
    val m = Multimodal.mediaTable(spark, sf).collect()
    assert(m.length === Tables.documents(spark, sf).count())
    m.foreach { r =>
      assert(Set("image", "audio", "video").contains(r.getString(1)))
      assert(r.getAs[Array[Byte]]("payload").nonEmpty)
      assert(r.getInt(3) >= 16) // width
    }
  }

  test("modality-partitioned layout: per-kind reads prune to their partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.writeMediaTable(Multimodal.mediaTable(spark, sf), out)
    val audio = Multimodal.readModality(spark, out, "audio")
    // the kind predicate must land in PartitionFilters, not a post-scan
    // Filter over all payloads
    val planText = audio.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val partLine = planText.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(partLine.contains("kind"), s"kind filter must prune partitions:\n$planText")
    // correctness: exactly the audio rows, nothing else
    val want = Multimodal.mediaTable(spark, sf)
      .filter(org.apache.spark.sql.functions.col("kind") === "audio")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val got = audio.select("media_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got === want)
  }

  test("batched feature extraction: schema, determinism, normalized histogram") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaDataset(spark, sf)).collect()
    val f2 = Multimodal.extractFeatures(Multimodal.mediaDataset(spark, sf), batchSize = 7).collect()
    assert(f1.length === f2.length)
    // batch size must not affect results (plumbing-only knob)
    val m1 = f1.map(f => f.media_id -> f.features.toSeq).toMap
    val m2 = f2.map(f => f.media_id -> f.features.toSeq).toMap
    assert(m1 === m2)
    f1.foreach { f =>
      assert(f.features.length === 8)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram normalized")
      assert(f.byte_len > 0)
    }
  }

  test("resize and frame-sample stubs preserve shape invariants") {
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val resized = Multimodal.resizeStub(payload, 10, 20)
    assert(resized.length === 200)
    val frames = Multimodal.frameSampleStub(payload, frameSize = 100, everyNth = 2)
    assert(frames.length === 5)
    assert(frames.forall(_.length === 100))
  }

  test("near-dup pairs: bucket candidates replay against a brute-force hamming+cosine sweep (r15)") {
    import org.apache.spark.sql.functions.col
    val bits = 16; val probeDist = 1; val threshold = 0.995
    val got = Multimodal.nearDupPairs(spark, sf, bits, probeDist, threshold)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty, "sf0.001 must surface at least one near-dup pair")
    // brute replay: signatures + cosines recomputed driver-side from the
    // extracted features; expected = same-kind pairs within the hamming
    // radius at/above the threshold (no bucket tops the cap at this SF)
    val feats = Multimodal.extractFeatures(
        Multimodal.mediaDataset(spark, sf), dims = 64).collect()
      .map(f => (f.media_id, f.kind, f.features))
    val sigs = graft.operators.Similarity
      .withSignature(Multimodal.extractFeatures(
          Multimodal.mediaDataset(spark, sf), dims = 64).toDF(), "features", bits)
      .select(col("media_id"), col("lsh_sig")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = (for {
      (ia, ka, fa) <- feats; (ib, kb, fb) <- feats
      if ka == kb && ia < ib
      if Integer.bitCount(sigs(ia) ^ sigs(ib)) <= probeDist
      c = cos(fa, fb) if c >= threshold
    } yield (ka, ia, ib, c)).sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq === want.toSeq)
  }

  test("media knn: indexed serving equals the inline IVF at the same build parameters, per modality (r15)") {
    import org.apache.spark.sql.functions.col
    val got = Multimodal.mediaKnn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(got.nonEmpty)
    // per-kind inline twin over the same feature relation: knnIvfOver with
    // identical nCentroids/iters/probes must reproduce the served rows
    val want = Seq("image", "audio", "video").flatMap { kind =>
      graft.operators.Similarity.knnIvfOver(
          Multimodal.featureVecs(spark, sf, kind), col("vec_id") < 6L,
          k = 3, nCentroids = 8, nProbe = 3, kmeansIters = 2)
        .collect()
        .map(r => (kind, r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    }
    assert(got.sortBy(t => (t._1, t._2, t._5)).toSeq ===
      want.sortBy(t => (t._1, t._2, t._5)).toSeq)
  }

  test("media dedup: identities hold, replay matches a payload groupBy, digests-only exchange (r13)") {
    val rows = Multimodal.mediaDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet === Set("image", "audio", "video"))
    rows.foreach { case (_, nd, np, dup, mx) =>
      assert(np - nd === dup, "drop count = payloads - distinct")
      assert(mx >= 1L && mx <= np)
      assert(nd <= np)
    }
    // replay: group by the payload bytes themselves
    val media = Multimodal.mediaTable(spark, sf)
      .select("kind", "payload").collect()
      .map(r => (r.getString(0), Option(r.getAs[Array[Byte]]("payload")).map(_.toSeq)))
    val want = media.groupBy(_._1).map { case (k, xs) =>
      val groups = xs.groupBy(_._2).map(_._2.size.toLong)
      (k, groups.size.toLong, xs.size.toLong, xs.size.toLong - groups.size, groups.max)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === want)
    // the exchange must carry digests, never payload blobs
    val p = Multimodal.mediaDedup(spark, sf).queryExecution.executedPlan
    p.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      .foreach(e => e.output.foreach(a =>
        assert(a.name != "payload", "payload blob crossed an exchange")))
  }

  test("decode batches: greedy budget assignment replays; batches tile each kind; no payload in exchanges (r13)") {
    import org.apache.spark.sql.functions.{col, length}
    val budget = 4096L
    val rows = Multimodal.decodeBatches(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val items = Multimodal.mediaTable(spark, sf)
      .select(col("kind"), col("media_id"), length(col("payload")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = items.groupBy(_._1).flatMap { case (kind, xs) =>
      var cum = 0L
      xs.sortBy(_._2).map { case (_, id, len) =>
        val b = cum / budget; cum += len; (kind, b, id, len) }
        .groupBy(x => (x._1, x._2)).map { case (k, ys) =>
          k -> ((ys.size.toLong, ys.map(_._4).sum, ys.map(_._3).min, ys.map(_._3).max)) }
    }
    assert(rows.toMap === want)
    // batch ids are contiguous from 0 per kind; item counts conserve
    rows.groupBy(_._1._1).foreach { case (_, xs) =>
      val ids = xs.map(_._1._2).sorted
      assert(ids === (0L until ids.length.toLong))
    }
    assert(rows.map(_._2._1).sum === items.length.toLong)
    val p = Multimodal.decodeBatches(spark, sf).queryExecution.executedPlan
    p.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      .foreach(e => e.output.foreach(a =>
        assert(a.name != "payload", "payload blob crossed an exchange")))
  }

  test("cross-modal align: scores replay from a driver-side decode+cosine; corpus conserved; no payload in exchanges (r15)") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.alignScores(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2), r.getInt(3))))
      .toMap
    val media = Multimodal.mediaTable(spark, sf)
      .select("media_id", "kind", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    // every media item with a paired embedding scores exactly once
    assert(rows.size === media.count { case (id, _, _) => embs.contains(id) })
    media.filter { case (id, _, _) => embs.contains(id) }.foreach {
      case (id, kind, payload) =>
        val f = Multimodal.decodeStub(payload, 64)
        val e = embs(id)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < 64) {
          dot += f(i).toDouble * e(i).toDouble
          na += f(i).toDouble * f(i).toDouble
          nb += e(i).toDouble * e(i).toDouble
          i += 1
        }
        val want = BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (k, score, keep) = rows(id)
        assert(k === kind)
        assert(math.abs(score - want) < 2e-6, s"media $id score diverged")
        assert(keep === (if (score >= 0.0) 1 else 0))
    }
    val p = Multimodal.alignScores(spark, sf).queryExecution.executedPlan
    p.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      .foreach(e => e.output.foreach(a =>
        assert(a.name != "payload" && a.name != "text",
          "payload/text crossed the pairing exchange")))
  }

  test("phash near-dup: banded pairs equal the brute all-pairs hamming sweep of the integer aHash; no payload in exchanges (r16)") {
    import org.apache.spark.sql.functions.col
    val maxDist = 3
    val got = Multimodal.phashDupPairs(spark, sf, maxDist).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.nonEmpty, "sf0.001 must surface at least one phash pair")
    // brute replay: the integer average-hash recomputed driver-side from
    // the raw payload bytes, then an exact all-pairs hamming sweep —
    // pigeonhole banding is candidate generation only, so the two sets
    // must be IDENTICAL
    val media = Multimodal.mediaDataset(spark, sf).collect()
      .filter(_.payload != null)
    def ahash(payload: Array[Byte]): Long = {
      val counts = new Array[Int](64)
      payload.foreach(b => counts((b & 0xFF) % 64) += 1)
      (0 until 64).foldLeft(0L) { (fp, d) =>
        if (64L * counts(d) > payload.length) fp | (1L << d) else fp
      }
    }
    val hashes = media.map(m => (m.media_id, m.kind, ahash(m.payload)))
    val want = (for {
      (ia, ka, ha) <- hashes; (ib, kb, hb) <- hashes
      if ka == kb && ia < ib
      h = java.lang.Long.bitCount(ha ^ hb) if h <= maxDist
    } yield (ka, ia, ib, h)).sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq === want.toSeq)
    // resize/re-encode dup class: a truncated re-encode of the same
    // payload stays within the hamming radius (the class cosine-LSH's
    // float thresholds can miss)
    val big = media.maxBy(_.payload.length)
    val resized = Multimodal.resizeStub(big.payload,
      targetW = big.payload.length * 9 / 10, targetH = 1)
    assert(java.lang.Long.bitCount(ahash(big.payload) ^ ahash(resized)) <= maxDist,
      "a 10% truncation re-encode must stay within the phash radius")
    // plan contract: only (kind, id, hash) cross the exchanges
    val p = Multimodal.phashDupPairs(spark, sf, maxDist)
      .queryExecution.executedPlan
    p.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      .foreach(e => e.output.foreach(a =>
        assert(a.name != "payload", "payload blob crossed an exchange")))
  }

  test("phash frames: banded+capped pairs equal a driver replay; frame-aligned trim shares frames; no payload in exchanges (r17)") {
    import org.apache.spark.sql.functions.col
    val (frameSize, everyNth, maxDist, minFrames, maxBucket) = (64, 2, 3, 2, 1024)
    val got = Multimodal.phashFramePairs(spark, sf, frameSize, everyNth,
        maxDist, minFrames, maxBucket).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "sf0.001 must surface at least one frame-dup pair")
    // driver replay of the WHOLE capped pipeline: sampled-frame aHashes,
    // pigeonhole band chunks, df-capped buckets, shared-sane-bucket
    // candidates, exact hamming, >= minFrames matching frame pairs
    def frameHashes(payload: Array[Byte]): Seq[(Int, Long)] =
      payload.grouped(frameSize).zipWithIndex
        .collect { case (fb, f) if f % everyNth == 0 =>
          val counts = new Array[Int](64)
          fb.foreach(b => counts((b & 0xFF) % 64) += 1)
          (f, (0 until 64).foldLeft(0L) { (fp, d) =>
            if (64L * counts(d) > fb.length) fp | (1L << d) else fp
          })
        }.toSeq
    val media = Multimodal.mediaDataset(spark, sf).collect()
      .filter(m => m.kind == "video" && m.payload != null)
    val frames = media.flatMap(m =>
      frameHashes(m.payload).map { case (f, h) => (m.media_id, f, h) })
    val chunks = maxDist + 1
    val bits = 64 / chunks
    val bandRows = for {
      (id, f, h) <- frames.toSeq
      c <- 0 until chunks
    } yield ((c, (h >>> (c * bits)) & ((1L << bits) - 1)), (id, f, h))
    val sane = bandRows.groupBy(_._1).filter(_._2.size <= maxBucket)
    val cand = sane.values.flatMap { bucket =>
      for {
        (_, (ia, fa, ha)) <- bucket; (_, (ib, fb, hb)) <- bucket
        if ia < ib
      } yield (ia, fa, ha, ib, fb, hb)
    }.toSet
    val want = cand.toSeq
      .filter { case (_, _, ha, _, _, hb) =>
        java.lang.Long.bitCount(ha ^ hb) <= maxDist }
      .groupBy { case (ia, _, _, ib, _, _) => (ia, ib) }
      .collect { case ((ia, ib), ms) if ms.size >= minFrames =>
        (ia, ib, ms.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
    // the dup class this row exists for: a FRAME-ALIGNED trim (cut a
    // multiple of everyNth*frameSize bytes — a re-cut at sampled-frame
    // granularity) keeps every surviving sampled frame bit-identical
    val big = media.maxBy(_.payload.length)
    val trimmed = big.payload.drop(everyNth * frameSize)
    val origHashes = frameHashes(big.payload).map(_._2)
    val trimHashes = frameHashes(trimmed).map(_._2)
    assert(trimHashes.forall(origHashes.contains),
      "frame-aligned trim must reproduce surviving sampled-frame hashes")
    assert(trimHashes.size >= minFrames,
      "planted trim pair must clear the minFrames gate")
    // plan contract: the payload blob never crosses an exchange
    val p = Multimodal.phashFramePairs(spark, sf, frameSize, everyNth,
      maxDist, minFrames, maxBucket).queryExecution.executedPlan
    p.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      .foreach(e => e.output.foreach(a =>
        assert(a.name != "payload", "payload blob crossed an exchange")))
    // ADVICE r17: degenerate framing params must fail fast at plan time,
    // not spin/divide-by-zero on executors
    intercept[IllegalArgumentException] {
      Multimodal.phashFramePairs(spark, sf, frameSize = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.phashFramePairs(spark, sf, everyNth = 0)
    }
  }
}
