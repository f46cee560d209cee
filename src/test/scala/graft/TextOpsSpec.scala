package graft

import graft.operators.TextOps

class TextOpsSpec extends SparkTestBase {

  private def bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(6)
    java.lang.Long.parseLong(hex, 16) % 10000
  }

  test("ngram top-k: counts match an independent driver-side recount; order deterministic (r11)") {
    import org.apache.spark.sql.functions._
    val top = TextOps.ngramTopK(spark, sf, k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.length === 20)
    // non-increasing counts with (count desc, bigram asc) tie-break
    top.sliding(2).foreach { case Array((g1, c1), (g2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && g1 < g2), s"order violated at $g1/$g2")
    }
    // brute-force recount of the winners on the driver (sf0.001 is small)
    val texts = Tables.documents(spark, sf).select("text")
      .na.drop().collect().map(_.getString(0))
    val brute = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val w = t.trim.split("\\s+")
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val g = p.mkString(" "); brute(g) = brute.getOrElse(g, 0L) + 1L
      }
    }
    top.foreach { case (g, c) => assert(brute(g) === c, s"count mismatch for '$g'") }
    // nothing outside the top-20 beats the 20th
    val floor20 = top.last._2
    val better = brute.count { case (_, c) => c > floor20 }
    assert(better <= 19)
    // plan shape: map-side partial count before the exchange (the
    // exploded corpus never crosses a shuffle), and the global top-K is
    // TakeOrderedAndProject, not a full sort
    val plan = TextOps.ngramTopK(spark, sf).queryExecution.sparkPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.size >= 2, "expected partial+final aggregate around one exchange")
    val topk = plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(topk.nonEmpty, "global top-K must plan as TakeOrderedAndProject")
  }

  test("shard manifest: totals reconcile, shards bounded, layout-independent (r11)") {
    import org.apache.spark.sql.functions._
    val m = TextOps.shardManifest(spark, sf, shards = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = Tables.documents(spark, sf)
    assert(m.map(_._1).forall(s => s >= 0 && s < 16))
    assert(m.map(_._2).sum === docs.count())
    assert(m.map(_._3).sum === docs.agg(sum("n_chars")).head().getLong(0))
    m.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
    // key spans are hash-major per shard: each shard's doc assignment is a
    // pure function of doc_id, so a second evaluation is bit-identical
    val again = TextOps.shardManifest(spark, sf, shards = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(m.toSeq === again.toSeq)
    // spot-check shard assignment against the driver-side md5 bucket rule
    val someIds = docs.select("doc_id").limit(20).collect().map(_.getLong(0))
    val byShard = m.map(r => r._1 -> r).toMap
    someIds.foreach { id => assert(byShard.contains(this.bucket(id) % 16)) }
  }

  test("prep pipeline: chunk -> dedup -> pack composes and conserves the survivor set") {
    import org.apache.spark.sql.functions._
    val packs = TextOps.prepPipeline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(packs.nonEmpty)
    // the pipeline's survivor count equals independent chunk + distinct-text
    // accounting: one survivor per distinct chunk text
    val chunks = TextOps.chunkDocs(spark, sf)
    val distinctTexts = chunks.select("chunk_text").distinct().count()
    assert(packs.map(_._3).sum === distinctTexts)
    // survivors' char mass: sum over distinct texts of their length, each
    // counted once (first occurrence kept — equal texts have equal length)
    val survivorChars = chunks.select(col("chunk_text")).distinct()
      .agg(sum(length(col("chunk_text")))).head().getLong(0)
    assert(packs.map(_._4).sum === survivorChars)
    // bins respect the greedy bound within each source
    packs.groupBy(_._1).foreach { case (_, bins) =>
      bins.foreach { case (_, _, _, sumChars, _, _) =>
        assert(sumChars < 2048L + 512L) // budget + one max-size chunk
      }
    }
  }

  test("mixing: sqrt temperature flattens source skew; weights form a distribution") {
    import org.apache.spark.sql.functions._
    val mix = TextOps.mixWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(mix.nonEmpty)
    // weights ~sum to 1 (4dp rounding slack per source), shares to 1e6
    assert(math.abs(mix.map(_._4).sum - 1.0) <= 0.0001 * mix.length)
    val shareSum = mix.map(_._5).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - mix.length)
    // α=0.5 flattens: every source's weight sits BETWEEN uniform and its
    // natural token-mass share (inclusive at the uniform point)
    val totTok = mix.map(_._3).sum.toDouble
    val uniform = 1.0 / mix.length
    mix.foreach { case (src, _, tok, w, _) =>
      val natural = tok / totTok
      val lo = math.min(natural, uniform) - 0.001
      val hi = math.max(natural, uniform) + 0.001
      assert(w >= lo && w <= hi, s"$src: weight $w outside [$lo, $hi]")
    }
  }

  test("chunking: windows tile each document; overlap-trimmed concat reconstructs it") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TextOps.chunkDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      val text = docs(id)
      val sorted = cs.sortBy(_._2)
      // dense indices, stride-aligned starts, window-bounded lengths
      assert(sorted.map(_._2).toSeq === (0L until sorted.length.toLong))
      sorted.foreach { case (_, i, start, t, len) =>
        assert(start === i * 384 && len === t.length && len <= 512)
      }
      // the chunk count formula, and full reconstruction: chunk 0 plus
      // each later chunk minus its 128-char overlap re-yields the doc
      assert(sorted.length === math.max(1L, (text.length - 128 + 383) / 384))
      val rebuilt = sorted.head._4 + sorted.tail.map(_._4.drop(128)).mkString
      assert(rebuilt === text, s"doc $id not covered by its chunks")
    }
  }

  test("packing: per-source greedy bins conserve docs/tokens with disjoint ordered ranges") {
    import org.apache.spark.sql.functions._
    val budget = 4096L
    val toks = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tc")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val packs = TextOps.packDocs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // conservation: every doc in exactly one bin, token totals match
    assert(packs.map(_._3).sum === toks.length)
    assert(packs.map(_._4).sum === toks.map(_._3).sum)
    packs.groupBy(_._1).foreach { case (src, bins) =>
      val ordered = bins.sortBy(_._2)
      val maxDoc = toks.filter(_._1 == src).map(_._3).max
      // doc-id ranges are disjoint and ordered with the pack ids —
      // packing preserved the deterministic shard order
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5 && a._2 < b._2)
        case _ =>
      }
      // greedy bound: a bin overflows its budget by at most one document
      ordered.foreach { case (_, _, _, sumTok, _, _) =>
        assert(sumTok < budget + maxDoc)
      }
    }
  }

  test("repetition stats flag keyword stuffing; varied text scores low") {
    val rep = TextOps.repetitionStats(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(rep.nonEmpty)
    // true operator invariants (NOT fixture-coupled: a 1-token doc
    // legitimately has zero bigrams): top counts bounded by totals
    rep.values.foreach { case (n, tt, tb, ttf, tbf) =>
      assert(tt >= 1 && tt <= n)
      assert(tb >= 0 && tb <= math.max(0L, n - 1))
      assert(ttf > 0 && ttf <= 1.0 && tbf >= 0 && tbf <= 1.0)
      assert(n < 2 || tb >= 1, "a multi-token doc has at least one bigram")
    }
    // planted extremes through the same expressions (local relation)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val planted = Seq(
      (1L, "spam spam spam spam spam"),                    // degenerate: all one token
      (2L, "alpha beta gamma delta epsilon zeta"),         // fully varied
      (3L, "buy now buy now buy now limited offer"),       // stuffed bigram
      (4L, null.asInstanceOf[String])                      // null text: row kept, NULL stats
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.repetitionStats(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 4L),
      "null-text doc must not be dropped from the output frame (r9 advisory)")
    val p = rows.filter(_.getLong(0) <= 3L)
      .map(r => r.getLong(0) -> ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(p(1L) === ((1.0, 1.0)), "all-one-token doc maxes both signals")
    assert(p(2L)._1 === (1.0 / 6 * 1e6).round / 1e6.toDouble)
    assert(p(2L)._2 === 0.2, "varied text: every bigram unique (1 of 5)")
    assert(p(3L)._2 > 0.4, s"stuffed bigram must dominate: ${p(3L)}")
    // null-text row matches the oracle's shape: NULL token_count + fracs
    // are NULL/0 exactly as DuckDB's len(NULL)-anchored frame emits them
    val nr = rows.find(_.getLong(0) == 4L).get
    assert(nr.isNullAt(1), "token_count is NULL for null text")
    assert(nr.getLong(2) === 0L && nr.getLong(3) === 0L)
    assert(nr.isNullAt(4), "top_token_frac is NULL for null text")
    assert(nr.getDouble(5) === 0.0)
  }

  test("vocab/OOV stats reconcile with token stats; degenerate knobs bound the rates (r11)") {
    val s = TextOps.vocabOovStats(spark, sf).collect()
    assert(s.nonEmpty)
    val tc = TextOps.tokenStats(spark, sf).collect()
      .filter(!_.isNullAt(3)).map(r => r.getLong(0) -> r.getLong(3)).toMap
    s.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getLong(1) === tc(r.getLong(0)),
        s"doc ${r.getLong(0)}: token_count must equal tokenStats'")
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // the signal is real: with a deliberately tiny vocabulary some
    // occurrences fall outside it (this sf's corpus has < 1000 distinct
    // tokens, so the default vocab covers everything)
    val tiny = TextOps.vocabOovStats(spark, sf, vocabSize = 10).collect()
    assert(tiny.exists(r => !r.isNullAt(2) && r.getLong(2) > 0L), "expected some OOV mass")
    // planted mini-corpus pins the exact semantics (the sf corpus has no
    // hapax tokens — every generated token repeats): vocab of size 1 is
    // {common} by (count desc, token asc); "rareword" is the one hapax
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_vocab").toString
    Seq((1L, "common common common rareword", "en", "t", 29L),
        (2L, "common common other other", "en", "t", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val planted = TextOps.vocabOovStats(spark, dir2, vocabSize = 1, rareMax = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // doc 1: 4 tokens, OOV = {rareword}=1, rare = {rareword}=1
    assert(planted(1L) === ((4L, 1L, 1L, 0.25, 0.25)), s"doc1: ${planted(1L)}")
    // doc 2: 4 tokens, OOV = {other,other}=2 (repeats count occurrences),
    // rare = 0 ("other" appears twice > rareMax)
    assert(planted(2L) === ((4L, 2L, 0L, 0.5, 0.0)), s"doc2: ${planted(2L)}")
    // a vocabulary covering every distinct token → zero OOV everywhere
    val allIn = TextOps.vocabOovStats(spark, sf, vocabSize = 1000000).collect()
    assert(allIn.forall(r => r.isNullAt(2) || r.getLong(2) === 0L))
    // rareMax 0 → nothing is rare; rareMax unbounded → every token is
    val none = TextOps.vocabOovStats(spark, sf, rareMax = 0L).collect()
    assert(none.forall(r => r.isNullAt(3) || r.getLong(3) === 0L))
    val all = TextOps.vocabOovStats(spark, sf, rareMax = Long.MaxValue).collect()
    assert(all.forall(r => r.isNullAt(3) || r.getLong(3) === r.getLong(1)))
  }

  test("pii scrub: planted emails/IPs/phones counted and redacted; clean text untouched (r11)") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_pii").toString
    Seq(
      (1L, "contact alice.smith@example.com or bob@mail.co today", "en", "t", 52L),
      (2L, "server at 192.168.1.100 and 10.0.0.1 responded", "en", "t", 46L),
      (3L, "call 555-123-4567 or 555.9876.4321 now", "en", "t", 38L),
      (4L, "no identifiers here at all", "en", "t", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val out = TextOps.piiScrub(spark, dir2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) === ((2L, 0L, 0L, 2L, md5hex("contact <EMAIL> or <EMAIL> today"))))
    assert(out(2L) === ((0L, 2L, 0L, 2L, md5hex("server at <IP> and <IP> responded"))))
    assert(out(3L) === ((0L, 0L, 2L, 2L, md5hex("call <PHONE> or <PHONE> now"))))
    // a clean document is bit-untouched: its fingerprint is the original's
    assert(out(4L) === ((0L, 0L, 0L, 0L, md5hex("no identifiers here at all"))))
  }

  test("stratified sample applies the per-language rate exactly and deterministically") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = TextOps.stratifiedSample(spark, sf,
        rates = Map("en" -> 0.05), defaultRate = 0.3)
      .collect().map(_.getLong(0)).toSet
    val want = docs.filter { case (id, lang) =>
      bucket(id) < (if (lang == "en") 500 else 3000)
    }.map(_._1).toSet
    assert(got === want)
    assert(want.nonEmpty)
    // the draw is a strict sub-sample of the uniform-rate draw at the
    // higher rate, and disjoint languages get independent fates
    val uniform = TextOps.sampleDocs(spark, sf, rate = 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(uniform))
    // determinism: a second evaluation is identical
    val again = TextOps.stratifiedSample(spark, sf,
        rates = Map("en" -> 0.05), defaultRate = 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(again === got)
  }

  test("gopher quality rules fire on planted violations; clean doc keeps (r12)") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_gopher").toString
    val clean = (Seq("the") ++ (1 to 30).map(i => s"word$i") ++ Seq("of", "and")).mkString(" ")
    Seq(
      (1L, clean, "en", "t", clean.length.toLong), // passes all rules
      (2L, "the of and tiny", "en", "t", 15L), // word-count rule fails
      (3L, (1 to 25).map(_ => "supercalifragilistic").mkString(" ") + " the of",
        "en", "t", 500L), // mean word len > 10 AND >50% dups
      (4L, (1 to 30).map(i => s"w$i").mkString(" "), "en", "t", 120L)) // no stopwords
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val out = TextOps.gopherQuality(spark, dir2).collect()
      .map(r => r.getLong(0) -> ((r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8),
        r.getInt(9)))).toMap
    assert(out(1L) === ((1, 1, 1, 1, 1)))
    assert(out(2L)._1 === 0); assert(out(2L)._5 === 0)
    assert(out(3L)._2 === 0); assert(out(3L)._4 === 0)
    assert(out(4L)._3 === 0); assert(out(4L)._5 === 0)
  }

  test("bow dedup collapses reordered copies to the lowest doc_id (r12)") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_bow").toString
    Seq(
      (1L, "alpha beta gamma", "en", "t", 16L),
      (2L, "gamma alpha beta", "en", "t", 16L), // reordered copy of 1
      (3L, "alpha beta beta", "en", "t", 15L), // different multiset
      (4L, "alpha beta gamma", "en", "t", 16L), // byte-identical copy of 1
      // null texts must get per-doc sentinels (r12 review: concat_ws
      // never returns NULL, so a post-hash coalesce silently merged them)
      (5L, null, "en", "t", 0L),
      (6L, null, "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val out = TextOps.bowDedup(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(out.toSet === Set((1L, 3L), (3L, 1L), (5L, 1L), (6L, 1L)))
  }

  test("tfidf top-k ranks rare-document terms above ubiquitous ones (r12)") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    Seq(
      (1L, "shared shared rare1 rare1 rare1", "en", "t", 31L),
      (2L, "shared shared shared unique2", "en", "t", 28L),
      (3L, "shared other3", "en", "t", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val out = TextOps.tfidfTopK(spark, dir2, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // doc 1: rare1 tf=3 df=1 (score 3) beats shared tf=2 df=3 (score 2/3)
    assert(out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq === Seq("rare1", "shared"))
    // doc 2: unique2 tf=1 df=1 (score 1) beats shared tf=3 df=3 (score 1)?
    // equal scores -> lexicographic tie-break: "shared" < "unique2"
    assert(out.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq === Seq("shared", "unique2"))
  }

  test("pmi top-k surfaces the planted collocation above chance pairs (r12)") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_pmi").toString
    // "strong pair" always adjacent (16x); every other adjacency is
    // document-unique, so min support 5 leaves exactly the collocation
    val rows = (0 until 8).map { i =>
      (i.toLong, s"filler$i strong pair mid$i strong pair end$i", "en", "t", 60L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    val out = TextOps.pmiTopK(spark, dir2, k = 5, minCount = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(("strong", "pair", 16L, 16L, 16L)))
  }

  test("weighted sample: matches a driver-side priority replay; heavier docs overrepresented (r13)") {
    val k = 50
    val got = TextOps.weightedSample(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // replay: priority = n_chars * full 24-bit md5 hash, top-k by (priority desc, doc_id)
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def h24(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = docs.map { case (id, nc) => (id, nc * h24(id)) }
      .sortBy { case (id, p) => (-p, id) }.take(k)
    assert(got.toSeq === want.toSeq)
    // size bias: the sampled mean length should exceed the corpus mean
    val sampleIds = got.map(_._1).toSet
    val byId = docs.toMap
    val sampleMean = sampleIds.toSeq.map(byId).sum.toDouble / sampleIds.size
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      f"weighted draw must skew long: sample $sampleMean%.1f vs corpus $corpusMean%.1f")
  }

  test("frequency spectrum: bands replay driver-side and conserve vocabulary + occurrence mass (r13)") {
    val rows = TextOps.freqSpectrum(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val counts = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => Option(r.getString(0)).toSeq)
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map(_._2.length.toLong).toSeq
    def bits(n: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val want = counts.groupBy(bits).map { case (b, xs) =>
      (b, xs.length.toLong, xs.sum, xs.min, xs.max)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === want)
    assert(rows.map(_._2).sum === counts.length.toLong, "every term in one band")
    assert(rows.map(_._3).sum === counts.sum, "occurrence mass conserved")
  }

  test("length percentiles: rank picks replay driver-side per language (r13)") {
    val rows = TextOps.lenPctiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("lang", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(_._1).map { case (lang, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2)).map(_._3)
      val n = sorted.length.toLong
      def pick(p: Int) = sorted(((n * p + 99) / 100).toInt - 1)
      (lang, n, pick(50), pick(90), pick(99))
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === want)
    rows.foreach { case (_, _, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99, "percentiles are monotone")
    }
  }

  test("stopword df: document frequencies replay; per-doc dedup happens before the explode (r13)") {
    import org.apache.spark.sql.functions._
    val df = TextOps.stopwordDf(spark, sf, k = 20)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.size <= 20)
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("text").collect().map(_.getString(0))
    val dfs = docs.flatMap(_.trim.split("\\s+").distinct.filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val want = dfs.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    assert(rows.map(r => (r._1, r._2)).toSeq === want)
    rows.foreach { case (_, d, n, ratio) =>
      assert(n === docs.length.toLong)
      assert(d <= n)
      assert(math.abs(ratio - d.toDouble / n) < 1e-6)
    }
  }

  test("ttr by source: integer token sums replay; ratio divides once (r13)") {
    import org.apache.spark.sql.functions._
    val rows = TextOps.ttrBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).map { case (s, xs) =>
      val toks = xs.map(_._2.trim.split("\\s+").toSeq)
      s -> ((xs.length.toLong, toks.map(_.size.toLong).sum, toks.map(_.distinct.size.toLong).sum))
    }
    rows.foreach { case (s, nd, tc, dt, ttr) =>
      assert((nd, tc, dt) === want(s), s"source $s")
      assert(dt <= tc)
      assert(math.abs(ttr - dt.toDouble / tc) < 1e-6)
    }
  }

  test("bigram coverage: top-list membership replays; the top list broadcasts (r13)") {
    import org.apache.spark.sql.functions._
    val df = TextOps.bigramCoverage(spark, sf, topK = 100)
    assert(df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }.nonEmpty,
      "the 100-row top list must broadcast onto the scoring pass")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    def bigrams(t: String): Seq[String] = {
      val w = t.trim.split("\\s+").toSeq
      if (w.size < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val all = docs.flatMap { case (s, t) => bigrams(t).map(s -> _) }
    val top = all.map(_._2).groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (g, c) => (-c, g) }.take(100).map(_._1).toSet
    val want = all.groupBy(_._1).map { case (s, xs) =>
      s -> ((xs.length.toLong, xs.count(x => top.contains(x._2)).toLong)) }
    assert(rows.map(r => r._1 -> ((r._2, r._3))).toMap === want)
    rows.foreach { case (_, tot, cov, ratio) =>
      assert(math.abs(ratio - cov.toDouble / tot) < 1e-6) }
  }

  test("tokenizer: greedy longest-match parity with a driver-side String replay; multibyte-safe unknowns (r15)") {
    import graft.functions.Tokenize
    import org.apache.spark.sql.functions.col
    val vocab = TextOps.TokenVocabDefault
    // driver-side replay in plain String ops (character semantics — the
    // kernel's byte walk must coincide because it only advances by whole
    // tokens or whole UTF-8 characters)
    def replay(s: String): (Long, Long, Seq[Int]) = {
      val byLenDesc = vocab.zipWithIndex.sortBy(-_._1.length)
      var pos = 0; var n = 0L; var unk = 0L
      val ids = Seq.newBuilder[Int]
      while (pos < s.length) {
        byLenDesc.find { case (t, _) => s.regionMatches(pos, t, 0, t.length) } match {
          case Some((t, i)) => ids += i; pos += t.length
          case None =>
            ids += -1; unk += 1
            pos += (if (s.codePointAt(pos) > 0xFFFF) 2 else 1) // whole code point
        }
        n += 1L
      }
      (n, unk, ids.result())
    }
    // corpus parity: every document's counts AND id sequence
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Tables.documents(spark, sf)
      .select(col("doc_id"), Tokenize.tokenCounts(col("text"), vocab).as("tc"),
        Tokenize.tokenIds(col("text"), vocab).as("ids"))
      .collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](1), r.getSeq[Int](2))))
    assert(got.nonEmpty)
    got.foreach { case (id, (tc, ids)) =>
      val (n, unk, wantIds) = replay(docs(id))
      assert(tc === Seq(n, unk), s"doc $id: counts diverged from the replay")
      assert(ids === wantIds, s"doc $id: id sequence diverged from the replay")
    }
    // targeted greedy/boundary cases, incl. multibyte unknowns: "é" and
    // "𝄞" (astral, 4 UTF-8 bytes) must each be ONE unknown token, and
    // "table" must win over "tab"+"a"-ish splits ("scan" over "an")
    import spark.implicits._
    val probes = Seq("tablescan", "tab", "the", "é", "a𝄞b", "", "zzz")
    val pr = probes.toDF("text")
      .select(col("text"), Tokenize.tokenCounts(col("text"), vocab).as("tc"),
        Tokenize.tokenIds(col("text"), vocab).as("ids"))
      .collect().map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getSeq[Int](2)))).toMap
    val iTable = vocab.indexOf("table"); val iScan = vocab.indexOf("scan")
    val iTab = vocab.indexOf("tab"); val iThe = vocab.indexOf("the")
    val iA = vocab.indexOf("a"); val iB = -1
    assert(pr("tablescan")._2 === Seq(iTable, iScan), "longest match must pick table+scan")
    assert(pr("tab")._2 === Seq(iTab))
    assert(pr("the")._2 === Seq(iThe))
    assert(pr("é") === ((Seq(1L, 1L), Seq(-1))), "one unknown token for a 2-byte char")
    assert(pr("a𝄞b")._1 === Seq(3L, 2L), "astral char is ONE unknown, not four bytes")
    assert(pr("a𝄞b")._2 === Seq(iA, -1, -1))
    assert(pr("") === ((Seq(0L, 0L), Seq.empty[Int])))
    assert(pr("zzz") === ((Seq(3L, 3L), Seq(-1, -1, -1))))
    assert(iB === -1) // (documents the unknown-id convention)
    // the kernel must be INSIDE the generated code (the r13 HOF lesson):
    // a codegen-compile failure would silently fall back to interpreted.
    // Execute first so AQE materializes its final stages.
    val tok = TextOps.tokenize(spark, sf)
    tok.collect()
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      tok.queryExecution.executedPlan)
    assert(gen.contains("greedyCounts"),
      "token_counts must codegen to the static kernel call")
  }

  test("token packing: packs conserve docs and tokens; budget boundaries replay (r15)") {
    val budget = 512L
    val packs = TextOps.packDocsTokens(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val perDoc = TextOps.tokenize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySource = Tables.documents(spark, sf).select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(packs.map(_._3).sum === perDoc.length.toLong, "packs conserve docs")
    assert(packs.map(_._4).sum === perDoc.map(_._2).sum, "packs conserve tokens")
    // per-source replay of the greedy cumulative packing
    val counts = perDoc.toMap
    bySource.groupBy(_._1).foreach { case (src, ds) =>
      var cum = 0L
      val want = ds.map(_._2).sorted.map { d =>
        val p = cum / budget; cum += counts(d); (d, p)
      }.groupBy(_._2).view.mapValues(g => (g.length.toLong, g.map(x => counts(x._1)).sum)).toMap
      val got = packs.filter(_._1 == src)
        .map(p => p._2 -> ((p._3, p._4))).toMap
      assert(got === want, s"source $src: pack boundaries diverged from the replay")
    }
  }

  test("langid eval: confusion cells replay from the per-doc operator and conserve the corpus (r13)") {
    val rows = TextOps.langIdEval(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    val perDoc = TextOps.langId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(6)))
    val want = perDoc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map { case (k, (n, _)) => k -> n }.toMap === want)
    assert(rows.map(_._2._1).sum === perDoc.length.toLong, "cells conserve the corpus")
    val labelTotals = perDoc.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    rows.foreach { case ((l, _), (n, share)) =>
      assert(math.abs(share - n.toDouble / labelTotals(l)) < 1e-6)
    }
  }

  test("quality model: integer training formula holds; fused serving kernel matches a driver-side retrain+rescore (r15)") {
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = TextOps.TokenVocabDefault
    val weights = TextOps.qualityModelWeights(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the add-one-smoothed integer formula, and weight bounds
    weights.foreach { case (tid, tok, np, nn, wm) =>
      assert(wm === (np + 1) * 1000 / (np + nn + 2), s"formula broken at tid=$tid")
      assert(wm >= 0 && wm <= 1000)
      if (tid >= 0) assert(tok === vocab(tid)) else assert(tok === "<unk>")
    }
    // driver-side independent retrain: greedy walk via TokenVocab, gopher
    // labels via the (hash-checked) heuristic's definition
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    def walk(t: String): Seq[Int] = {
      val v = new graft.functions.TokenVocab(vocab.toArray)
      val u = UTF8String.fromString(t)
      val ids = Seq.newBuilder[Int]
      var pos = 0
      while (pos < u.numBytes()) {
        val m = v.longestMatchAt(u, pos)
        if (m >= 0L) { ids += m.toInt; pos += (m >>> 32).toInt }
        else { ids += -1; pos += UTF8String.numBytesForFirstByte(u.getByte(pos)) }
      }
      ids.result()
    }
    val stop = Seq("the", "a", "of", "and", "to", "in")
    def label(t: String): Boolean = {
      if (t == null) return false
      val w = t.trim.split("\\s+").toSeq
      val wc = w.length
      val nonspace = t.replaceAll("\\s", "").length
      val dups = wc - w.distinct.length
      val stopKinds = stop.count(w.contains)
      wc >= 20 && wc <= 500 && nonspace >= wc * 3 && nonspace <= wc * 10 &&
        stopKinds >= 2 && dups * 2 < wc
    }
    val occ = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    docs.foreach { case (_, t) =>
      val pos = label(t)
      walk(if (t == null) "" else t).foreach { tid =>
        val (p, n) = occ.getOrElse(tid, (0L, 0L))
        occ(tid) = (p + (if (pos) 1L else 0L), n + 1L)
      }
    }
    val wantW = occ.map { case (tid, (p, n)) => tid -> (p + 1) * 1000 / (n + 2) }
    assert(weights.map(w => w._1 -> w._5).toMap === wantW.toMap,
      "learned weights diverged from the driver-side retrain")
    // serving: every per-doc score is the sum of learned weights along the walk
    val scores = TextOps.qualityModelScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val wMap = wantW.toMap
    docs.foreach { case (id, t) =>
      val ids = walk(if (t == null) "" else t)
      val sum = ids.map(tid => wMap.getOrElse(tid, 500L)).sum
      val (_, n, s, mean, keep) = scores.find(_._1 == id).get
      assert(n === ids.length.toLong && s === sum, s"doc $id score diverged")
      assert(mean === (if (n > 0) s / n else 0L))
      assert(keep === (if (mean >= 500) 1 else 0))
    }
    // agreement cells conserve the corpus and its token mass
    val cells = TextOps.qualityModelAgreement(spark, sf).collect()
    assert(cells.map(_.getLong(2)).sum === docs.length.toLong)
    assert(cells.map(_.getLong(3)).sum === scores.map(_._2).sum)
  }

  test("streaming quality filter: in-flight keeps equal the batch rescore of the same records; stateless plan (r15)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // train offline on the corpus, filter a fresh stream with it
    val model = TextOps.trainQualityModel(spark, sf)
    val batch1 = Seq(
      1L -> "the table scan the table scan the value row fast data key agg join small big query line sort window",
      2L -> "zzz qqq xxx",
      3L -> ("the a an in or " * 8).trim)
    val batch2 = Seq(
      4L -> "the customer order part merge spark hash stream group vector filter column line sort window table value row data key",
      5L -> "")
    val src = MemoryStream[(Long, String)]
    val flt = TextOps.streamingQualityFilter(
      src.toDF().toDF("doc_id", "text"), "text", model, keepOnly = true)
    val q = flt.writeStream.outputMode("append")
      .format("memory").queryName("stream_quality").start()
    src.addData(batch1: _*); q.processAllAvailable()
    src.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_quality")
      .select("doc_id", "q_mean_milli", "q_keep").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2)))).toMap
    // batch rescore of the SAME records through the same model
    val want = TextOps.streamingQualityFilter(
        (batch1 ++ batch2).toDF("doc_id", "text"), "text", model,
        keepOnly = false)
      .collect().map(r => (r.getLong(0),
        (r.getAs[Long]("q_mean_milli"), r.getAs[Int]("q_keep")))).toMap
    assert(got.keySet === want.filter(_._2._2 == 1).keySet,
      "stream kept a different doc set than the batch rescore")
    got.foreach { case (id, v) => assert(want(id) === v, s"doc $id diverged") }
    // every kept doc is above threshold; empty doc scores 0 and drops
    got.values.foreach { case (mean, keep) =>
      assert(keep === 1 && mean >= model.threshold)
    }
    assert(!got.contains(5L))
    // stateless: the streaming plan has no state store operator
    val prog = flt.queryExecution.analyzed.collect {
      case n if n.nodeName.toLowerCase.contains("state") ||
        n.nodeName.toLowerCase.contains("dedup") => n
    }
    assert(prog.isEmpty, "quality filter must not introduce streaming state")
  }

  test("bm25: full top-k replays driver-side over the sf corpus (r15)") {
    def half(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toksOf(t: String): Seq[String] =
      t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val tfm: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      toksOf(t).groupBy(identity).map { case (w, xs) => ((id, w), xs.size.toLong) }
    }.toMap
    val dfm = tfm.keys.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val dlm = tfm.groupBy(_._1._1).map { case (id, m) => id -> m.values.sum }
    val nDocs = dlm.size.toLong
    val sumDl = dlm.values.sum
    val qterms = dfm.toSeq.sortBy { case (w, df) => (-df, w) }.take(8)
    val idf = qterms.map { case (w, df) =>
      w -> half(math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5)) * 1000000.0)
    }.toMap
    val wantScores = dlm.keys.toSeq.flatMap { id =>
      val contribs = qterms.flatMap { case (w, _) =>
        tfm.get((id, w)).map { tfv =>
          // the exact float chain of the operator, in the same order
          half((idf(w).toDouble * (tfv * 2.2)) /
            (tfv + 1.2 * (0.25 + 0.75 * (dlm(id) / (sumDl.toDouble / nDocs)))))
        }
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.size.toLong, contribs.sum))
    }
    val wantTop = wantScores.sortBy { case (id, _, s) => (-s, id) }.take(20)
    val got = graft.operators.TextOps.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.length === wantTop.length)
    got.zip(wantTop).zipWithIndex.foreach {
      case (((gId, gN, gS, gR), (wId, wN, wS)), i) =>
        assert(gR === i + 1)
        assert((gId, gN, gS) === ((wId, wN, wS)), s"rank ${i + 1} diverged")
    }
  }

  test("lm nll: bigram NLL replays driver-side; repetitive text scores more predictable than novel text (r15)") {
    import spark.implicits._
    def half(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val dir2 = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // doc 1 repeats one bigram; doc 2 is all corpus-unique bigrams; the
    // fillers give the model a background distribution
    val rows = Seq(
      (1L, "a b a b a b a b a b", "en", "t", 19L),
      (2L, "q w e r t y u i o p", "en", "t", 19L)) ++
      (3 until 10).map(i => (i.toLong, s"a b c$i a b d$i", "en", "t", 15L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir2/documents.parquet")
    // driver replay
    def toksOf(t: String): Seq[String] =
      t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    def bgOf(t: String): Seq[(String, String)] = {
      val w = toksOf(t); w.zip(w.drop(1))
    }
    val cXY = rows.flatMap { case (_, t, _, _, _) => bgOf(t) }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val cX = cXY.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
    val v = rows.flatMap { case (_, t, _, _, _) => toksOf(t) }.distinct.size.toLong
    val want = rows.map { case (id, t, _, _, _) =>
      val bgs = bgOf(t)
      val nlls = bgs.map { p =>
        half(math.log((cX(p._1) + v).toDouble / (cXY(p) + 1)) * 1000000.0)
      }
      id -> ((bgs.size.toLong, nlls.sum,
        half(nlls.sum.toDouble / bgs.size)))
    }.toMap
    val got = graft.operators.TextOps.lmNll(spark, dir2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === want)
    // the repeated-bigram doc is more predictable than the novel one
    assert(got(1L)._3 < got(2L)._3,
      "repetitive text must score lower NLL than corpus-novel text")
  }

  test("quality drift loop: planted distribution shift flips the retrain flag; a replay re-emits a lost line (r15 #8)") {
    import spark.implicits._
    // synthetic model with known weights so the planted shift is exact:
    // "good"-only docs score 900, "bad"-heavy docs 420 < 850 tolerance cut
    val model = TextOps.TokenWeightModel(
      Seq("good", "bad", " "), Seq(900L, 100L, 900L), unkWeight = 500L)
    val out = java.nio.file.Files.createTempDirectory("graft_qdrift").toString
    def score(df: org.apache.spark.sql.DataFrame) =
      TextOps.streamingQualityFilter(df, "text", model, keepOnly = false)
    val good = Seq.tabulate(50)(i => (i.toLong, "good good good"))
      .toDF("doc_id", "text")
    TextOps.qualityDriftBaseline(good, "text", model, out)
    // a live batch from the training distribution: no retrain
    TextOps.qualityLegBatch(score(good), out, streamBatchId = 0L)
    assert(!TextOps.qualityNeedsRetrain(spark, out),
      "same-distribution batch must not trip the flag")
    // planted shift: the stream turns low-quality
    val bad = Seq.tabulate(200)(i => (1000L + i, "bad bad bad"))
      .toDF("doc_id", "text")
    TextOps.qualityLegBatch(score(bad), out, streamBatchId = 1L)
    assert(TextOps.qualityNeedsRetrain(spark, out),
      "shifted batches must trip the retrain flag")
    val stats = TextOps.qualityDriftStats(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stats(0L) === ((50L, 900.0)) && stats(1L) === ((50L, 900.0)))
    assert(stats(2L) === ((200L, 420.0)))
    // crash window replay: line lost after a durable commit → the
    // replayed id re-derives the line with NO second manifest write
    val line = java.nio.file.Paths.get(out, "drift", "b2")
    java.nio.file.Files.delete(line)
    TextOps.qualityLegBatch(score(bad), out, streamBatchId = 1L)
    assert(java.nio.file.Files.exists(line), "replay must re-emit the lost line")
    assert(graft.streaming.ManifestTable.read(spark, out).count() === 250L,
      "replay must not double-append")
    assert(TextOps.qualityNeedsRetrain(spark, out))
  }
}
