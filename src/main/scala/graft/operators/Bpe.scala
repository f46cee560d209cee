package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-trained subword tokenization: BPE merge learning + serving.
  *
  * The fixed-vocabulary tokenizer family ([[TextOps.tokenize]],
  * [[TextOps.packDocsTokens]]) serves a hand-written vocabulary; real
  * training pipelines LEARN the subword vocabulary from the corpus
  * (Sennrich et al. 2016, the reference-capability analog being the
  * mocker→pipeline determinism: seeded, replayable, r15 verdict #5).
  * Two rows close the loop:
  *
  *  - `text_bpe_train` — `rounds` byte-pair merges learned from the
  *    word-frequency relation, each round ONE bigram aggregate + ONE
  *    windowed merge application; fully deterministic (integer counts,
  *    lexicographic tie-break) so DuckDB replays it bit-for-bit.
  *  - `text_bpe_encode` — the corpus re-tokenized through the LEARNED
  *    vocabulary via the existing native greedy longest-match kernel
  *    ([[graft.functions.Tokenize.tokenCounts]], whole-stage codegen).
  *
  * Scale shape: the ONLY corpus-sized job is the initial word-count
  * aggregate (words are short — nothing wider than a word crosses that
  * exchange) and the final encode scan (map-side kernel, no shuffle).
  * Training iterates on the vocabCap-BOUNDED word-frequency relation:
  * per round, one lead-window bigram count over ≤ vocabCap·maxWordLen
  * rows, a 1-row driver argmax, and one windowed merge rewrite — the
  * k-bounded-driver-state pattern of the ANN tier. At 100 TB the word
  * relation may hold billions of distinct words; the deterministic
  * `freq DESC, word ASC` cap keeps every training round's input fixed
  * regardless of corpus size.
  *
  * Greedy merge semantics (both engines, provably identical): a round
  * merges the chosen pair left-to-right non-overlapping. Relationally:
  * adjacent matches can only abut when left == right (a run of the same
  * token), and the greedy walk merges the run's 1st, 3rd, 5th… match —
  * exactly "matches at even offset within each consecutive-match
  * island", which is three window functions. No recursion, no UDF. */
object Bpe {

  /** Lowercase word-frequency relation with the deterministic size cap —
    * the one corpus-sized aggregate, shared by train and encode. */
  private def wordFreq(spark: SparkSession, dir: String,
      vocabCap: Int): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(lower(coalesce(col("text"), lit(""))),
        "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("w"))
      .limit(vocabCap)

  /** One merge round applied relationally: mark matches, island
    * consecutive matches, merge even-offset matches, drop the absorbed
    * right tokens, re-number positions. */
  private def applyMerge(toks: DataFrame, lt: String, rt: String): DataFrame = {
    val byPos = Window.partitionBy("w").orderBy("pos")
    val marked = toks
      .withColumn("nxt", lead("tok", 1).over(byPos))
      .withColumn("matched", col("tok") === lit(lt) && col("nxt") === lit(rt))
    val islanded = marked
      .withColumn("mrn", row_number().over(
        Window.partitionBy("w", "matched").orderBy("pos")))
      .withColumn("island", col("pos") - col("mrn"))
      .withColumn("isl_min", min("pos").over(
        Window.partitionBy("w", "matched", "island")))
      .withColumn("do_merge",
        col("matched") && (col("pos") - col("isl_min")) % 2 === 0)
    islanded
      .withColumn("drop_row",
        coalesce(lag("do_merge", 1).over(byPos), lit(false)))
      .filter(!col("drop_row"))
      .select(col("w"), col("freq"),
        (row_number().over(byPos) - 1).as("pos"),
        when(col("do_merge"), lit(lt + rt)).otherwise(col("tok")).as("tok"))
  }

  /** The learned merge table, driver-side: (round, left, right, count).
    * Bounded work per round (see object scaladoc); the loop stops early
    * if a round finds no adjacent pair left to merge. */
  private[graft] def trainMerges(spark: SparkSession, dir: String,
      rounds: Int, vocabCap: Int): Seq[(Int, String, String, Long)] = {
    val chars = wordFreq(spark, dir, vocabCap)
      .select(col("w"), col("freq"),
        posexplode(split(col("w"), "")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    var toks = graft.Storage.materializeOnce(chars)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val byPos = Window.partitionBy("w").orderBy("pos")
      val best = toks
        .withColumn("rt", lead("tok", 1).over(byPos))
        .filter(col("rt").isNotNull)
        .groupBy(col("tok").as("lt"), col("rt"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("lt"), asc("rt"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (lt, rt, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, lt, rt, cnt))
        // release the superseded round's executor blocks AFTER the new
        // round materializes (ADVICE r16: without this the loop pins
        // rounds × vocabCap·maxWordLen rows of storage until session end)
        val prev = toks
        toks = graft.Storage.materializeOnce(applyMerge(toks, lt, rt))
        graft.Storage.unpersistMaterialized(prev)
        r += 1
      }
    }
    // the final round's relation has served its last aggregate too
    graft.Storage.unpersistMaterialized(toks)
    merges.result()
  }

  /** Train-once cache keyed on (corpus stamp, rounds, vocabCap) — the
    * [[Similarity.cachedIndex]] build-once-serve-many pattern (ADVICE
    * r16): a run that executes both registry rows (`text_bpe_train` and
    * `text_bpe_encode`) pays the corpus word-count and the merge loop
    * ONCE; the stamp invalidates on corpus change, so a refreshed
    * `documents.parquet` retrains. */
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int), (String, Seq[(Int, String, String, Long)])]()

  private[graft] def trainedMergesFor(spark: SparkSession, dir: String,
      rounds: Int, vocabCap: Int): Seq[(Int, String, String, Long)] = {
    // ADVICE r17: key on (dir, rounds, vocabCap) and store (stamp, merges)
    // so a refreshed corpus REPLACES the superseded entry instead of
    // accumulating stale stamps for the session's lifetime (the
    // cachedIndex delete-old-build pattern).
    val stamp = Similarity.corpusStamp(dir, "documents.parquet")
    mergeCache.compute((dir, rounds, vocabCap), (_, prev) =>
      if (prev != null && prev._1 == stamp) prev
      else (stamp, trainMerges(spark, dir, rounds, vocabCap)))._2
  }

  /** `text_bpe_train` — the learned merge table as a relation. */
  def bpeTrain(spark: SparkSession, dir: String, rounds: Int = 8,
      vocabCap: Int = 1000): DataFrame = {
    import spark.implicits._
    trainedMergesFor(spark, dir, rounds, vocabCap)
      .map { case (r, lt, rt, cnt) => (r, lt, rt, lt + rt, cnt) }
      .toDF("round", "left_tok", "right_tok", "merged", "pair_count")
      .orderBy("round")
  }

  /** `text_bpe_encode` — per-document token metering through the LEARNED
    * vocabulary (merged tokens + the 26 letters + space), served by the
    * native greedy longest-match kernel — one map-side codegen'd pass,
    * no shuffle beyond the output sort ([[TextOps.tokenize]]'s shape).
    * Distinct because two merge paths can produce the same string
    * ("ab"+"c" and "a"+"bc" both yield "abc"). */
  def bpeEncode(spark: SparkSession, dir: String, rounds: Int = 8,
      vocabCap: Int = 1000): DataFrame =
    bpeEncodeOver(spark, dir, trainedMergesFor(spark, dir, rounds, vocabCap))

  /** The SERVING body of [[bpeEncode]] — encode through an
    * already-trained merge table (the [[Pq]] `knnPqOver` split, ADVICE
    * r16): a deployment trains once, persists the merges, and re-encodes
    * any corpus slice without retraining. */
  def bpeEncodeOver(spark: SparkSession, dir: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val learned = merges.map { case (_, lt, rt, _) => lt + rt }
    val vocab = (learned ++ ('a' to 'z').map(_.toString) :+ " ").distinct
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.Tokenize.tokenCounts(
          lower(coalesce(col("text"), lit(""))), vocab).as("tc"))
      .select(col("doc_id"),
        element_at(col("tc"), 1).as("n_tokens"),
        element_at(col("tc"), 2).as("n_unknown"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_train" -> ((s: SparkSession, d: String) => bpeTrain(s, d)),
    "text_bpe_encode" -> ((s: SparkSession, d: String) => bpeEncode(s, d)))

  // --------------------------------------------------------- oracles

  /** Training replay: word-freq cap, char split, then per round a
    * bigram count, a 1-row ORDER BY/LIMIT argmax, and the same windowed
    * merge rewrite. Every round's token relation and best-pair row are
    * MATERIALIZED — inlined CTEs re-evaluate per reference and each
    * round references its predecessor several times (the r15
    * oracle-budget lesson). Ends with tok$rounds and best1..best$rounds
    * available. */
  private def duckBpeCtes(rounds: Int, vocabCap: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""wf AS MATERIALIZED (
      |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(string_split_regex(lower(coalesce(text, '')), '[^a-z]+')) AS w
      |    FROM documents) s
      |  WHERE w <> '' GROUP BY w
      |  ORDER BY freq DESC, w ASC LIMIT $vocabCap),
      | tok0 AS MATERIALIZED (
      |  SELECT w, freq, CAST(i - 1 AS INT) AS pos, substring(w, i, 1) AS tok
      |  FROM wf, UNNEST(generate_series(1, length(w))) AS t(i))""".stripMargin
    for (r <- 1 to rounds) {
      val p = r - 1
      sb ++= s""", pair$r AS (SELECT l.tok AS lt, l.rt, CAST(sum(l.freq) AS BIGINT) AS cnt
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY w ORDER BY pos) AS rt
        |        FROM tok$p) l
        |  WHERE l.rt IS NOT NULL GROUP BY 1, 2),
        | best$r AS MATERIALIZED (SELECT lt, rt, cnt FROM pair$r
        |  ORDER BY cnt DESC, lt ASC, rt ASC LIMIT 1),
        | mk$r AS (SELECT t.w, t.freq, t.pos, t.tok, b.lt, b.rt,
        |    (t.tok = b.lt AND lead(t.tok) OVER (PARTITION BY t.w ORDER BY t.pos) = b.rt) AS matched
        |  FROM tok$p t, best$r b),
        | isl$r AS (SELECT *, pos - row_number() OVER (PARTITION BY w, matched ORDER BY pos) AS island
        |  FROM mk$r),
        | mg$r AS (SELECT *,
        |    (matched AND (pos - min(pos) OVER (PARTITION BY w, matched, island)) % 2 = 0) AS do_merge
        |  FROM isl$r),
        | tok$r AS MATERIALIZED (SELECT w, freq,
        |    CAST(row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS INT) AS pos,
        |    CASE WHEN do_merge THEN lt || rt ELSE tok END AS tok
        |  FROM (SELECT *, coalesce(lag(do_merge) OVER (PARTITION BY w ORDER BY pos), false) AS drop_row
        |        FROM mg$r) WHERE NOT drop_row)""".stripMargin
    }
    sb.toString
  }

  private[graft] def duckBpeTrainSql(rounds: Int = 8,
      vocabCap: Int = 1000): String = {
    val arms = (1 to rounds).map { r =>
      s"SELECT CAST($r AS INT) AS round, lt AS left_tok, rt AS right_tok, " +
        s"lt || rt AS merged, cnt AS pair_count FROM best$r"
    }.mkString(" UNION ALL ")
    (s"WITH ${duckBpeCtes(rounds, vocabCap)} " +
      s"SELECT * FROM ($arms) ORDER BY round").replace('\n', ' ')
  }

  /** Encode replay: the training CTEs feed the vocabulary relation
    * (merged tokens ∪ letters ∪ space); the greedy longest-match walk
    * probes a PRE-JOINED per-(doc, pos) longest-match table instead of a
    * LATERAL subquery — DuckDB 1.0 returns wrong lateral-max results
    * when the recursion's probe target is a CTE chain with MATERIALIZED
    * members (isolated empirically: off-by-one token counts). The `lm`
    * build joins positions to vocabulary candidates on FIRST CHARACTER
    * (a tok matching at pos must start with text[pos]), not a full
    * pos × |v| cross product — the r16 oracle-budget ask: |v| candidate
    * probes per position drop to ~1 (the per-letter vocab bucket), and a
    * position whose character heads no vocab entry is simply absent
    * (LEFT JOIN NULL in the walk = unknown, advance 1 — identical
    * semantics). */
  private[graft] def duckBpeEncodeSql(rounds: Int = 8,
      vocabCap: Int = 1000): String =
    (s"""WITH RECURSIVE ${duckBpeCtes(rounds, vocabCap)},
      | v AS (
      |  SELECT DISTINCT tok, length(tok) AS clen, substring(tok, 1, 1) AS c0 FROM (
      |    ${(1 to rounds).map(r => s"SELECT lt || rt AS tok FROM best$r")
          .mkString(" UNION ALL ")}
      |    UNION ALL SELECT chr(CAST(96 + i AS INT)) FROM UNNEST(generate_series(1, 26)) AS t(i)
      |    UNION ALL SELECT ' ') s),
      | d AS (SELECT doc_id, lower(coalesce(text, '')) AS text,
      |   length(lower(coalesce(text, ''))) AS nc FROM documents),
      | posn AS (SELECT d.doc_id, CAST(p.i AS INT) AS pos,
      |   substring(d.text, CAST(p.i AS INT), 1) AS c0
      |   FROM d, UNNEST(generate_series(1, d.nc)) AS p(i)),
      | lm AS MATERIALIZED (
      |   SELECT p.doc_id, p.pos,
      |     max(CASE WHEN substring(d.text, p.pos, v.clen) = v.tok
      |       THEN v.clen END) AS clen
      |   FROM posn p JOIN v USING (c0) JOIN d ON d.doc_id = p.doc_id
      |   GROUP BY 1, 2),
      | walk(doc_id, pos, n_tokens, n_unknown) AS (
      |   SELECT doc_id, 1, 0, 0 FROM d
      |   UNION ALL
      |   SELECT w.doc_id, w.pos + coalesce(m.clen, 1), w.n_tokens + 1,
      |     w.n_unknown + CASE WHEN m.clen IS NULL THEN 1 ELSE 0 END
      |   FROM walk w JOIN d ON d.doc_id = w.doc_id
      |   LEFT JOIN lm m ON m.doc_id = w.doc_id AND m.pos = w.pos
      |   WHERE w.pos <= d.nc)
      |SELECT doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(max(n_unknown) AS BIGINT) AS n_unknown
      |FROM walk GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      .replace('\n', ' ')

  val oracles: Map[String, String] = Map(
    "text_bpe_train" -> duckBpeTrainSql(),
    "text_bpe_encode" -> duckBpeEncodeSql())
}
