package graft

import graft.operators.Bpe

/** BPE subword training + serving: an independent plain-Scala replay of
  * the whole merge-learning loop (greedy left-to-right fold — a DIFFERENT
  * algorithm from the operator's windowed island/parity rewrite, so the
  * two agreeing pins the relational greedy semantics), plus the encode
  * row's longest-match coherence with the learned vocabulary. */
class BpeSpec extends SparkTestBase {

  /** Greedy left-to-right merge fold — the textbook BPE apply step. */
  private def fold(toks: List[String], lt: String, rt: String): List[String] =
    toks.foldLeft(List.empty[String]) { (acc, t) =>
      acc match {
        case h :: rest if h == lt && t == rt => (lt + rt) :: rest
        case _ => t :: acc
      }
    }.reverse

  private def replay(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var toks: Map[String, (Long, List[String])] =
      words.map { case (w, f) => w -> (f, w.toList.map(_.toString)) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      toks.values.foreach { case (f, ts) =>
        ts.zip(ts.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((lt, rt), cnt) = counts.toSeq
          .minBy { case ((l, t), c) => (-c, l, t) }
        out += ((r, lt, rt, cnt))
        toks = toks.map { case (w, (f, ts)) => w -> (f, fold(ts, lt, rt)) }
        r += 1
      }
    }
    out.result()
  }

  test("bpe train: merge table equals a plain-Scala greedy-fold replay of the word-frequency corpus") {
    val words = Tables.documents(spark, sf)
      .selectExpr("explode(split(lower(coalesce(text, '')), '[^a-z]+')) AS w")
      .filter("length(w) > 0")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = replay(words, rounds = 8)
    val got = Bpe.bpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(got === want, "relational island/parity rewrite diverged from the greedy fold")
    // merged column is always the concatenation
    Bpe.bpeTrain(spark, sf).collect().foreach(r =>
      assert(r.getString(3) === r.getString(1) + r.getString(2)))
  }

  test("bpe encode: token counts replay the greedy longest-match walk over the learned vocabulary") {
    val merges = replay(Tables.documents(spark, sf)
      .selectExpr("explode(split(lower(coalesce(text, '')), '[^a-z]+')) AS w")
      .filter("length(w) > 0")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap, rounds = 8)
    val vocab = (merges.map { case (_, l, t, _) => l + t } ++
      ('a' to 'z').map(_.toString) :+ " ").distinct
      .sortBy(t => -t.length)
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "lower(coalesce(text, '')) AS t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Bpe.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, n, unk) =>
      val text = texts(id)
      var pos = 0; var wn = 0L; var wu = 0L
      while (pos < text.length) {
        vocab.find(t => text.startsWith(t, pos)) match {
          case Some(t) => pos += t.length
          case None => pos += 1; wu += 1
        }
        wn += 1
      }
      assert((n, unk) === ((wn, wu)), s"doc $id token walk diverged")
    }
  }
}
