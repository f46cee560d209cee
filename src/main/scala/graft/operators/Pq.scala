package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.PqCodec

/** Product quantization for the ANN tier — the memory story that makes
  * embedding search survive 100 TB: each vector compresses to `m`
  * per-subspace codeword indexes (here 4 × 1 B in spirit; 4 B stored),
  * a ~64× reduction over the raw 64-float embedding, and serving scores
  * candidates from per-subspace LOOKUP TABLES (ADC — asymmetric distance
  * computation) without ever touching raw vectors. The codes relation
  * for a 100-TB float corpus fits in cluster RAM; the raw corpus never
  * could. Composes with the IVF tier (coarse cells prune candidates,
  * PQ scores the survivors) — registered standalone here so the
  * quantization itself is oracle-checked end to end.
  *
  * Reference scope: the reference delegates analytics to ClickHouse/
  * Postgres (`/root/reference/compose/clickhouse/create.sh:5-34`) and
  * has no vector tier; this family extends the engine for the
  * training-data-pipeline workloads the brief adds.
  *
  * EXACTNESS — everything in the quantized integer domain: components
  * quantize to `round(v · 2^20)` longs ([[graft.functions.QuantLongs]]),
  * so codeword training (integer L2 argmin, floor-div means), encoding,
  * and ADC dot products are EXACT integer arithmetic, bit-reproducible
  * against the DuckDB oracle with no float-summation-order caveats.
  * The only float ops anywhere are the final `dot/(|q||x̂|)` division
  * (single correctly-rounded sqrt/mul/div over exactly-representable
  * integers) and its round-to-6 — the established parity contract.
  *
  * TRAINING (deterministic, Lloyd-style, per subspace): seeds are the
  * `k` vectors with the lowest `(md5(vec_id), vec_id)` — the
  * [[Similarity.kmeansCentroids]] hash-spread draw — sliced into `m`
  * sub-vectors; each of `iters` fixed iterations assigns every
  * sub-vector to its nearest codeword by INTEGER L2 (ties to the lowest
  * code id) and re-centers codewords at the floor-div integer mean of
  * their members (empty codewords keep their previous entry).
  *
  * Scale shape: one encode pass per iteration (fused
  * [[graft.functions.PqEncode]] kernel, whole-stage codegen; the
  * codebook rides the plan as an m×k×dsub reference object) plus one
  * (sub, code, pos)-grain aggregate — the exchange carries
  * m·k·dsub ≈ 512 partial rows per task, never vectors. The codebook
  * collects to the driver (m×k rows — the ANN centroid pattern).
  * Serving: encode is ONE map-side kernel pass; ADC scoring per query
  * is two array loads per subspace above the codes relation.
  */
object Pq {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed-point scale, shared with the kmeans machinery: float · 2^20
    * is exactly representable in double, so both engines round the same
    * halves the same way. */
  private val Scale = 1048576L

  /** Driver-resident trained model: `codebook(sub)(j)(pos)` quantized
    * codeword components with `codeIds(sub)(j)` the seed vec_id labels,
    * ascending within each sub (the kernel tie-break order). */
  final case class PqModel(codebook: Seq[Seq[Seq[Long]]], codeIds: Seq[Long],
      m: Int, dsub: Int)

  /** Train the per-subspace codebooks. `emb` needs (vec_id, embedding). */
  def train(emb: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 2,
      dims: Int = 64): PqModel = {
    val dsub = dims / m
    require(m * dsub == dims, s"dims $dims not divisible by m $m")
    val qv = emb.select(col("vec_id"),
      PqCodec.quantLongs(col("embedding"), Scale).as("qv"))
    // seeds: k lowest (md5(vec_id), vec_id) quantized vectors, sliced
    val seedRows = qv
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1) // ascending code-id order inside each sub
    val codeIds = seedRows.map(_._1).toSeq
    var cb: Array[Array[Array[Long]]] = Array.tabulate(m) { s =>
      seedRows.map { case (_, q) => q.slice(s * dsub, (s + 1) * dsub) }
    }
    for (_ <- 0 until iters) {
      // encode BELOW the explode (its own projection — a shared select
      // would hoist the kernel above the Generate and re-run it per
      // component row, the r15 gopher-label lesson), then fold the
      // (sub, code, pos) sums
      val sums = qv
        .select(col("qv"),
          PqCodec.pqEncode(col("qv"), cb.map(_.map(_.toSeq).toSeq).toSeq, dsub)
            .as("codes"))
        .select(col("codes"), posexplode(col("qv")))
        .select(expr(s"pos div $dsub").cast("int").as("sub"),
          expr(s"pos % $dsub").cast("int").as("spos"), col("col").as("q"),
          element_at(col("codes"), (col("pos") / lit(dsub)).cast("int") + 1)
            .as("j"))
        .groupBy("sub", "j", "spos")
        .agg(sum("q").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      sums.foreach { r =>
        val (sub, j, spos) = (r.getInt(0), r.getInt(1), r.getInt(2))
        val (s, n) = (r.getLong(3), r.getLong(4))
        // floor-div integer mean: exact in double (|s| ≪ 2^52), FLOOR on
        // both engines (Spark `div` truncates toward zero on negatives —
        // not the same thing)
        next(sub)(j)(spos) = math.floor(s.toDouble / n).toLong
      }
      cb = next
    }
    PqModel(cb.map(_.map(_.toSeq).toSeq).toSeq, codeIds, m, dsub)
  }

  /** The learned codebook as a relation: (sub, code, pos, c_q) — the
    * model artifact a serving fleet loads. m·k·dsub rows. */
  def codebook(spark: SparkSession, dir: String, m: Int = 4, k: Int = 8,
      iters: Int = 2): DataFrame = {
    import spark.implicits._
    val model = train(Tables.embeddings(spark, dir), m, k, iters)
    val rows = for {
      s <- 0 until model.m
      j <- model.codebook(s).indices
      p <- 0 until model.dsub
    } yield (s, model.codeIds(j), p, model.codebook(s)(j)(p))
    rows.toDF("sub", "code", "pos", "c_q").orderBy("sub", "code", "pos")
  }

  /** Encode the corpus: (vec_id, codes) with codes the per-subspace
    * codeword indexes — the compressed form. One fused kernel pass. */
  def encoded(emb: DataFrame, model: PqModel): DataFrame =
    emb.select(col("vec_id"),
        PqCodec.quantLongs(col("embedding"), Scale).as("qv"))
      .select(col("vec_id"),
        PqCodec.pqEncode(col("qv"), model.codebook, model.dsub).as("codes"))

  /** Top-k by ADC: per query, the integer dot/norm lookup tables are
    * computed on the driver from the collected model + quantized query
    * (all integer), folded into ONE [[graft.functions.PqAdcParts]]
    * kernel per query, and the scan emits every (query, candidate)
    * score from the codes relation alone — raw vectors are read ONCE
    * (to quantize queries), never at scoring time. */
  def knnPq(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 5,
      m: Int = 4, nCodes: Int = 8, iters: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    knnPqOver(emb, train(emb, m, nCodes, iters), nQueries, k)
  }

  /** Serving against an already-trained model — the deployment shape
    * (train once, serve many; the bench's PQ rows split the two). */
  def knnPqOver(emb: DataFrame, model: PqModel, nQueries: Int,
      k: Int): DataFrame = {
    val m = model.m
    val dsub = model.dsub
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), PqCodec.quantLongs(col("embedding"), Scale).as("qq"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val normLut: Seq[Seq[Long]] = model.codebook.map(_.map(c => c.map(x => x * x).sum))
    val perQuery = queries.map { case (qid, qq) =>
      val dotLut: Seq[Seq[Long]] = (0 until m).map { s =>
        model.codebook(s).map { c =>
          var d = 0L; var p = 0
          while (p < dsub) { d += qq(s * dsub + p) * c(p); p += 1 }
          d
        }
      }
      val qnorm = qq.map(x => x * x).sum
      struct(lit(qid).as("query_id"), lit(qnorm).as("qnorm"),
        PqCodec.pqAdcParts(col("codes"), dotLut, normLut).as("parts"))
    }
    val scored = encoded(emb, model)
      // per-query struct array in its own projection BELOW the explode
      .select(col("vec_id"), array(perQuery.toIndexedSeq: _*).as("qs"))
      .select(col("vec_id"), explode(col("qs")).as("qe"))
      .filter(col("vec_id") =!= col("qe.query_id"))
      .select(col("vec_id"), col("qe.query_id").as("query_id"),
        round(element_at(col("qe.parts"), 1).cast("double") /
          (sqrt(col("qe.qnorm").cast("double")) *
            sqrt(element_at(col("qe.parts"), 2).cast("double"))), 6)
          .as("adc_cos"))
    rankTopK(scored, k)
  }

  /** Per-query top-k of a scored (query_id, vec_id, adc_cos) relation
    * through the custom [[graft.plans.GroupTopK]] operator — bounded
    * per-group heaps, the exchange carries ≤ k rows per query per input
    * partition. The r15 first cut ranked with a row_number window
    * partitioned by query_id: at 2 M vectors × 100 queries that is a
    * 200 M-row sort funneled into 100 partitions — measured 233 s; the
    * heap form never materializes the sort. The rank window that remains
    * runs over the k·|queries|-row survivor relation. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import graft.plans.{GroupTopK, GroupTopKStrategy}
    val spark = scored.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    // composite heap key: higher adc_cos wins, ties to the LOWER vec_id
    // (larger -vec_id) — the oracle's ORDER BY adc_cos DESC, vec_id ASC
    val top = GroupTopK.topK(scored, Seq(col("query_id")),
      struct(col("adc_cos"), (-col("vec_id")).as("nv")), k)
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("query_id")
      .orderBy(col("adc_cos").desc, col("vec_id").asc)
    top.withColumn("rank", row_number().over(win))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adc_cos"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF + PQ — the full production ANN stack in one serving path:
    * coarse centroids prune candidates to the probed cells' members
    * (the [[Similarity.knnIvfOver]] probe contract) and PQ ADC scores
    * the survivors from the codes relation — raw vectors are touched
    * only by the one fused assign+encode corpus pass. At 100 TB this is
    * THE deployable shape: candidates bounded by nProbe/nCentroids of
    * the corpus, each scored by 2·m array loads against an 8-byte code
    * word instead of a 256-byte float vector. The candidate join
    * broadcasts the (nQueries·nProbe)-row probe relation; the kernel
    * picks the query's lookup table by the probe row's query INDEX, so
    * one plan serves the whole query batch. */
  def knnIvfPq(spark: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5, nCentroids: Int = 8, kmIters: Int = 2, nProbe: Int = 3,
      m: Int = 4, nCodes: Int = 8, iters: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val model = train(emb, m, nCodes, iters)
    val cents = Similarity.kmeansCentroids(emb, nCentroids, kmIters)
    // ONE corpus pass: coarse cell + PQ codes
    val asgCodes = Similarity.withNearestCid(emb, cents)
      .select(col("vec_id"), col("cid"),
        PqCodec.quantLongs(col("embedding"), Scale).as("qv"))
      .select(col("vec_id"), col("cid"),
        PqCodec.pqEncode(col("qv"), model.codebook, model.dsub).as("codes"))
    // query-batch LUTs (driver, bounded by nQueries × m × nCodes longs)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), PqCodec.quantLongs(col("embedding"), Scale).as("qq"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val qIdx = queries.map(_._1).zipWithIndex.toMap
    val normLut: Seq[Seq[Long]] = model.codebook.map(_.map(c => c.map(x => x * x).sum))
    val dotLuts: Seq[Seq[Seq[Long]]] = queries.toIndexedSeq.map { case (_, qq) =>
      (0 until m).map { s =>
        model.codebook(s).map { c =>
          var d = 0L; var p = 0
          while (p < model.dsub) { d += qq(s * model.dsub + p) * c(p); p += 1 }
          d
        }
      }
    }
    val qnorms = queries.map { case (_, qq) => qq.map(x => x * x).sum }
    // probe set: top-nProbe cells per query by the same rounded-cosine
    // ranking the IVF serving path uses; collected (nQueries·nProbe rows)
    import org.apache.spark.sql.expressions.Window
    val probeRows = emb.filter(col("vec_id") < nQueries)
      .join(broadcast(cents))
      .withColumn("cos_c", round(Similarity.cosine(col("embedding"), col("c_emb")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(desc("cos_c"), asc("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    import spark.implicits._
    val probes = probeRows.toSeq
      .map { case (q, c) => (q, qIdx(q), qnorms(qIdx(q)), c) }
      .toDF("query_id", "qidx", "qnorm", "cid")
    val scored = asgCodes.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qnorm"),
        PqCodec.pqAdcPartsAt(col("codes"), col("qidx"), dotLuts, normLut)
          .as("parts"))
      .withColumn("adc_cos",
        round(element_at(col("parts"), 1).cast("double") /
          (sqrt(col("qnorm").cast("double")) *
            sqrt(element_at(col("parts"), 2).cast("double"))), 6))
      .select("query_id", "vec_id", "adc_cos")
    rankTopK(scored, k)
  }

  /** Recall@k of the ADC ranking against exact brute-force cosine — the
    * compression-quality eval read before trusting 64× smaller vectors. */
  def pqRecall(spark: SparkSession, dir: String, nQueries: Int = 5,
      k: Int = 5): DataFrame = {
    val truth = Similarity.knnBrute(spark, dir, nQueries, k)
      .select("query_id", "neighbor_id")
    val approx = knnPq(spark, dir, nQueries, k)
      .select("query_id", "neighbor_id")
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    truth.groupBy("query_id").agg(count(lit(1)).as("k_eff"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("k_eff"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / col("k_eff"), 6)
          .as("recall"))
      .orderBy("query_id")
  }

  /** COMPRESSION/RECALL TUNING CURVE — recall@k as a function of the
    * subspace count `m` (2/4/8 codeword indexes per vector ≈ 128×/64×/
    * 32× compression of the 64-float embedding): the report that turns
    * "pick m" into a measured trade-off, the PQ sibling of
    * `sim_ivf_probe_curve`/`sim_lsh_probe_curve`. One brute-truth pass
    * is shared; each m trains its own codebooks (vocabulary-sized jobs)
    * and full-scan ADC-ranks the same query batch. Output per m: truth
    * size, hits, recall (ONE final division, rounded). */
  def pqMCurve(spark: SparkSession, dir: String,
      ms: Seq[Int] = Seq(2, 4, 8, 16, 32),
      nQueries: Int = 5, k: Int = 5, nCodes: Int = 8,
      iters: Int = 2): DataFrame = {
    val truth = Similarity.knnBrute(spark, dir, nQueries, k)
      .select("query_id", "neighbor_id")
    ms.map { m =>
      val approx = knnPq(spark, dir, nQueries, k, m, nCodes, iters)
        .select("query_id", "neighbor_id")
      val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      truth.agg(count(lit(1)).as("n_truth")).crossJoin(hits)
        .select(lit(m).as("m"), col("n_truth"), col("hits"),
          round(col("hits").cast("double") / col("n_truth"), 6).as("recall"))
    }.reduce(_.unionByName(_)).orderBy("m")
  }

  val queries: Map[String, Q] = Map(
    "sim_pq_codebook" -> ((s: SparkSession, d: String) => codebook(s, d)),
    "sim_knn_pq" -> ((s: SparkSession, d: String) => knnPq(s, d)),
    "sim_knn_ivfpq" -> ((s: SparkSession, d: String) => knnIvfPq(s, d)),
    "sim_pq_recall" -> ((s: SparkSession, d: String) => pqRecall(s, d)),
    "sim_pq_m_curve" -> ((s: SparkSession, d: String) => pqMCurve(s, d)))

  // --------------------------------------------------------- oracles

  /** DuckDB replay of the integer-domain training: quantize, hash-spread
    * seeds, `iters` unrolled (integer-L2 assign, floor-div re-center)
    * rounds. Ends at `cb$sfx(sub, code, spos, cq)` and the component
    * relation `qd$sfx(vec_id, sub, spos, q)`. The shared relations `e`,
    * `ed0`, `sd` (seeds depend only on `k`) come from [[duckPqShared]];
    * `sfx` namespaces the m-dependent chain so the tuning-curve oracle
    * can train several code sizes in one query. */
  private def duckPqShared(k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       | ed0 AS (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i, embedding FROM e),
       | sd AS (SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k)""".stripMargin

  private def duckPqTrainBody(m: Int, k: Int, iters: Int, dims: Int,
      sfx: String): String = {
    val dsub = dims / m
    val sb = new StringBuilder
    sb ++= s", qd$sfx AS (SELECT vec_id, CAST((i - 1) // $dsub AS INT) AS sub, "
    sb ++= s"CAST((i - 1) % $dsub AS INT) AS spos, "
    sb ++= s"CAST(round(embedding[i]::DOUBLE * $Scale) AS BIGINT) AS q FROM ed0), "
    sb ++= s"cb${sfx}0 AS (SELECT qd.sub, qd.vec_id AS code, qd.spos, qd.q AS cq FROM qd$sfx qd JOIN sd ON sd.vec_id = qd.vec_id)"
    for (t <- 0 until iters) {
      sb ++= s", dist$sfx$t AS (SELECT qd.vec_id, qd.sub, c.code, "
      sb ++= "sum((qd.q - c.cq) * (qd.q - c.cq)) AS d "
      sb ++= s"FROM qd$sfx qd JOIN cb$sfx$t c ON c.sub = qd.sub AND c.spos = qd.spos GROUP BY 1, 2, 3)"
      sb ++= s", asg$sfx$t AS (SELECT vec_id, sub, code FROM (SELECT *, "
      sb ++= "row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS rn "
      sb ++= s"FROM dist$sfx$t) WHERE rn = 1)"
      sb ++= s", sm$sfx$t AS (SELECT a.sub, a.code, qd.spos, "
      sb ++= "CAST(sum(qd.q) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n "
      sb ++= s"FROM asg$sfx$t a JOIN qd$sfx qd ON qd.vec_id = a.vec_id AND qd.sub = a.sub GROUP BY 1, 2, 3)"
      sb ++= s", cb$sfx${t + 1} AS (SELECT c.sub, c.code, c.spos, "
      sb ++= "CAST(coalesce(CAST(floor(CAST(n.s AS DOUBLE) / n.n) AS BIGINT), c.cq) AS BIGINT) AS cq "
      sb ++= s"FROM cb$sfx$t c LEFT JOIN sm$sfx$t n ON n.sub = c.sub AND n.code = c.code AND n.spos = c.spos)"
    }
    sb ++= s", cb$sfx AS (SELECT sub, code, spos, cq FROM cb$sfx$iters)"
    sb.toString
  }

  private def duckPqCtes(m: Int, k: Int, iters: Int, dims: Int): String = {
    // single-m form: shared prelude + unsuffixed body, aliased to the
    // names the serve/codebook tails expect (qd, cb)
    duckPqShared(k).replace('\n', ' ') + duckPqTrainBody(m, k, iters, dims, "")
  }

  /** Final full-corpus PQ assignment + per-query lookup relations —
    * `asgF$sfx(vec_id, sub, code)`, `qdot$sfx`, `cnorm$sfx`,
    * `qnorm$sfx`. */
  private def duckPqAsgBody(nQueries: Int, sfx: String): String =
    s""", distF$sfx AS (SELECT qd.vec_id, qd.sub, c.code,
       |   sum((qd.q - c.cq) * (qd.q - c.cq)) AS d
       |   FROM qd$sfx qd JOIN cb$sfx c ON c.sub = qd.sub AND c.spos = qd.spos GROUP BY 1, 2, 3),
       | asgF$sfx AS (SELECT vec_id, sub, code FROM (SELECT *,
       |   row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS rn
       |   FROM distF$sfx) WHERE rn = 1),
       | qdot$sfx AS (SELECT qq.vec_id AS query_id, c.sub, c.code,
       |   CAST(sum(qq.q * c.cq) AS BIGINT) AS dot
       |   FROM qd$sfx qq JOIN cb$sfx c ON c.sub = qq.sub AND c.spos = qq.spos
       |   WHERE qq.vec_id < $nQueries GROUP BY 1, 2, 3),
       | cnorm$sfx AS (SELECT sub, code, CAST(sum(cq * cq) AS BIGINT) AS nrm FROM cb$sfx GROUP BY 1, 2),
       | qnorm$sfx AS (SELECT vec_id AS query_id, CAST(sum(q * q) AS BIGINT) AS qn
       |   FROM qd$sfx WHERE vec_id < $nQueries GROUP BY 1)""".stripMargin

  private def duckPqAsgCtes(m: Int, k: Int, iters: Int, dims: Int,
      nQueries: Int): String =
    duckPqCtes(m, k, iters, dims) + duckPqAsgBody(nQueries, "")

  /** Full-scan per-query ADC ranking ending at
    * `ranked$sfx(query_id, neighbor_id, adc_cos, rank)`. */
  private def duckPqRankBody(sfx: String): String =
    s""", adc$sfx AS (SELECT d.query_id, a.vec_id AS neighbor_id,
       |   CAST(sum(d.dot) AS BIGINT) AS dot, CAST(sum(n.nrm) AS BIGINT) AS rnorm
       |   FROM asgF$sfx a JOIN qdot$sfx d ON d.sub = a.sub AND d.code = a.code
       |   JOIN cnorm$sfx n ON n.sub = a.sub AND n.code = a.code
       |   WHERE a.vec_id <> d.query_id GROUP BY 1, 2),
       | sc$sfx AS (SELECT adc.query_id, adc.neighbor_id,
       |   round(CAST(adc.dot AS DOUBLE) /
       |     (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(adc.rnorm AS DOUBLE))), 6) AS adc_cos
       |   FROM adc$sfx adc JOIN qnorm$sfx q USING (query_id)),
       | ranked$sfx AS (SELECT query_id, neighbor_id, adc_cos, rank FROM (SELECT *,
       |   row_number() OVER (PARTITION BY query_id ORDER BY adc_cos DESC, neighbor_id ASC) AS rank
       |   FROM sc$sfx))""".stripMargin

  private def duckPqServeCtes(m: Int, k: Int, iters: Int, dims: Int,
      nQueries: Int): String =
    duckPqAsgCtes(m, k, iters, dims, nQueries) + duckPqRankBody("")

  /** Coarse-centroid Lloyd replay over the SAME `e`/`ed0` relations (the
    * [[Similarity]] kmeans oracle pattern: rounded-cosine assign, ties to
    * the lowest cid, fixed-point REAL sums), ending at `kc(cid, c_emb)`. */
  private def duckCoarseKmeansCtes(nCentroids: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s", kc0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM e "
    sb ++= s"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCentroids)"
    for (t <- 0 until iters) {
      sb ++= s", kasg$t AS (SELECT vec_id, cid FROM ("
      sb ++= s"SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id "
      sb ++= s"ORDER BY round(${Similarity.duckCos("e.embedding", "c.c_emb")}, 6) DESC, c.cid ASC) AS rn "
      sb ++= s"FROM e, kc$t c) WHERE rn = 1)"
      sb ++= s", ksm$t AS (SELECT a.cid, d.i - 1 AS pos, "
      sb ++= s"sum(CAST(round((d.embedding[d.i])::DOUBLE * $Scale) AS BIGINT)) AS s "
      sb ++= s"FROM kasg$t a JOIN ed0 d ON d.vec_id = a.vec_id GROUP BY 1, 2)"
      sb ++= s", kc${t + 1} AS (SELECT c.cid, coalesce(n.c_emb, c.c_emb) AS c_emb "
      sb ++= s"FROM kc$t c LEFT JOIN (SELECT cid, list(CAST(s AS REAL) ORDER BY pos) AS c_emb "
      sb ++= s"FROM ksm$t GROUP BY cid) n ON n.cid = c.cid)"
    }
    sb ++= s", kc AS (SELECT cid, c_emb FROM kc$iters)"
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "sim_pq_codebook" ->
      s"""${duckPqCtes(4, 8, 2, 64)}
         |SELECT sub, code, spos AS pos, cq AS c_q FROM cb
         |ORDER BY sub, code, pos""".stripMargin.replace('\n', ' '),
    "sim_knn_pq" ->
      s"""${duckPqServeCtes(4, 8, 2, 64, 5)}
         |SELECT query_id, neighbor_id, adc_cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.replace('\n', ' '),
    "sim_knn_ivfpq" ->
      s"""${duckPqAsgCtes(4, 8, 2, 64, 5)}
         |${duckCoarseKmeansCtes(8, 2)},
         | kasgF AS (SELECT vec_id, cid FROM (
         |   SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
         |     ORDER BY round(${Similarity.duckCos("e.embedding", "c.c_emb")}, 6) DESC, c.cid ASC) AS rn
         |   FROM e, kc c) WHERE rn = 1),
         | probes AS (SELECT query_id, cid FROM (
         |   SELECT q.vec_id AS query_id, c.cid, row_number() OVER (PARTITION BY q.vec_id
         |     ORDER BY round(${Similarity.duckCos("q.embedding", "c.c_emb")}, 6) DESC, c.cid ASC) AS rn
         |   FROM e q, kc c WHERE q.vec_id < 5) WHERE rn <= 3),
         | adcp AS (SELECT p.query_id, ka.vec_id AS neighbor_id,
         |   CAST(sum(d.dot) AS BIGINT) AS dot, CAST(sum(n.nrm) AS BIGINT) AS rnorm
         |   FROM probes p JOIN kasgF ka ON ka.cid = p.cid
         |   JOIN asgF a ON a.vec_id = ka.vec_id
         |   JOIN qdot d ON d.query_id = p.query_id AND d.sub = a.sub AND d.code = a.code
         |   JOIN cnorm n ON n.sub = a.sub AND n.code = a.code
         |   WHERE ka.vec_id <> p.query_id GROUP BY 1, 2),
         | scp AS (SELECT adcp.query_id, adcp.neighbor_id,
         |   round(CAST(adcp.dot AS DOUBLE) /
         |     (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(adcp.rnorm AS DOUBLE))), 6) AS adc_cos
         |   FROM adcp JOIN qnorm q USING (query_id))
         |SELECT query_id, neighbor_id, adc_cos, CAST(rank AS INT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_cos DESC, neighbor_id ASC) AS rank FROM scp)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.replace('\n', ' '),
    "sim_pq_m_curve" -> {
      val chains = Seq(2, 4, 8, 16, 32).map { m =>
        duckPqTrainBody(m, 8, 2, 64, s"_m$m") +
          duckPqAsgBody(5, s"_m$m") + duckPqRankBody(s"_m$m")
      }.mkString
      val sels = Seq(2, 4, 8, 16, 32).map { m =>
        s"""SELECT CAST($m AS INT) AS m,
           | CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           | CAST((SELECT count(*) FROM truth t JOIN ranked_m$m p
           |   ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
           |   WHERE p.rank <= 5) AS BIGINT) AS hits""".stripMargin
      }.mkString(" UNION ALL ")
      s"""${duckPqShared(8)}
         |$chains,
         | truth AS (SELECT query_id, neighbor_id FROM (
         |   SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |     row_number() OVER (PARTITION BY q.vec_id
         |       ORDER BY round(${Similarity.duckCos("q.embedding", "c.embedding")}, 6) DESC, c.vec_id ASC) AS rank
         |   FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id) WHERE rank <= 5)
         |SELECT m, n_truth, hits,
         |  round(CAST(hits AS DOUBLE) / n_truth, 6) AS recall
         |FROM ($sels) ORDER BY m""".stripMargin.replace('\n', ' ')
    },
    "sim_pq_recall" ->
      s"""${duckPqServeCtes(4, 8, 2, 64, 5)},
         | pq AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
         | truth AS (SELECT query_id, neighbor_id FROM (
         |   SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |     row_number() OVER (PARTITION BY q.vec_id
         |       ORDER BY round(${Similarity.duckCos("q.embedding", "c.embedding")}, 6) DESC, c.vec_id ASC) AS rank
         |   FROM e q JOIN e c ON q.vec_id < 5 AND c.vec_id <> q.vec_id) WHERE rank <= 5)
         |SELECT t.query_id, count(*) AS k_eff,
         |  CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  round(CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS recall
         |FROM truth t LEFT JOIN pq p
         |  ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
         |GROUP BY 1 ORDER BY t.query_id""".stripMargin.replace('\n', ' '))
}
