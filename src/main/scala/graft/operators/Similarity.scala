package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *  - Brute-force cosine top-k: the correctness baseline. The query side is
  *    tiny and explicitly `broadcast()` — the big side streams through a
  *    single codegen'd projection, no shuffle of the corpus; per-query top-k
  *    is a windowed rank over (query, candidate) rows.
  *  - LSH-bucketed ANN: the scale path. Random-hyperplane signatures bucket
  *    the corpus once (linear scan, deterministic seeded planes); queries
  *    probe only their bucket + hamming-1 neighbors, turning O(N·Q) into
  *    O(N + Q·bucket). At 100 TB the bucketed corpus would be written
  *    partitioned by bucket so probes are partition-pruned reads.
  *
  * Cosine math is done in double after an explicit float→double cast, as a
  * left fold in array order — bit-reproducible and matching the DuckDB
  * oracle's list arithmetic; comparisons happen on round(·, 6).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** dot(a,b) as an order-fixed left fold in double. */
  private def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** cosine(a,b) over float arrays, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    dotCol(ad, bd) / (sqrt(dotCol(ad, ad)) * sqrt(dotCol(bd, bd)))
  }

  /** Brute-force cosine top-k for a set of query vectors (vec_id < nQueries),
    * excluding self. Deterministic: rank on (round(cos,6) desc, vec_id asc). */
  def knnBrute(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("q_emb"), col("c_emb")), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), asc("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold over all pairs.
    * (On random corpora this is empty; planted-dup behavior is covered in
    * SimilaritySpec.) */
  def cosineDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
      .orderBy("id_a", "id_b")
  }

  // ------------------------------------------------------------------ ANN

  /** Deterministic ±1 hyperplane weights: plane p, dim d → sign of a
    * splitmix64-style avalanche of (p, d). */
  private def planeSign(p: Int, d: Int): Double = {
    var z = (p.toLong << 32 | d.toLong) * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** `bits`-bit random-hyperplane signature of a float vector. */
  private def signatureUdf(bits: Int) = udf { (v: Seq[Float]) =>
    var sig = 0
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var d = 0
      while (d < v.length) { dot += v(d) * planeSign(p, d); d += 1 }
      if (dot > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  def withSignature(df: DataFrame, embCol: String, bits: Int = 8): DataFrame =
    df.withColumn("lsh_sig", signatureUdf(bits)(col(embCol)))

  /** All XOR masks of hamming weight <= dist over `bits` bits (multi-probe
    * set). For bits=8, dist=2 that is 37 probes of 256 buckets — the
    * recall/throughput dial of the bucketed ANN. */
  private def probeMasks(bits: Int, dist: Int): Seq[Int] = {
    val single = (0 until bits).map(1 << _)
    val m0 = Seq(0)
    val m1 = if (dist >= 1) single else Nil
    val m2 = if (dist >= 2)
      for { i <- 0 until bits; j <- i + 1 until bits } yield (1 << i) | (1 << j)
    else Nil
    m0 ++ m1 ++ m2
  }

  /** LSH-bucketed approximate top-k: candidates share the signature bucket up
    * to `probeDist` flipped bits (multi-probe), then exact cosine re-rank.
    * Tuning: fewer bits / larger probeDist → higher recall, more candidates. */
  def knnLsh(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 5,
      bits: Int = 8, probeDist: Int = 2): DataFrame = {
    val emb = withSignature(Tables.embeddings(spark, dir), "embedding", bits)
    val probes = probeMasks(bits, probeDist).map(m => col("lsh_sig").bitwiseXOR(lit(m)))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(array(probes: _*)).as("probe"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      col("lsh_sig").as("probe"))
    val scored = c.join(broadcast(q), Seq("probe"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_emb"), col("c_emb"))
      .distinct()
      .withColumn("cos_sim", round(cosine(col("q_emb"), col("c_emb")), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cos_sim"), asc("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  // -------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "sim_knn_brute" -> ((s: SparkSession, d: String) => knnBrute(s, d)),
    "sim_cosine_dup_pairs" -> ((s: SparkSession, d: String) => cosineDupPairs(s, d)),
    "sim_knn_lsh" -> ((s: SparkSession, d: String) => knnLsh(s, d)))

  /** DuckDB cosine mirroring the Spark fold: explicit double cast, ordered
    * element-wise products, list_sum. */
  private def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(generate_series(1, len($a)),
       | i -> ($a::DOUBLE[])[i] * ($b::DOUBLE[])[i]))
       | / (sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> ($a::DOUBLE[])[i] * ($a::DOUBLE[])[i])))
       |  * sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> ($b::DOUBLE[])[i] * ($b::DOUBLE[])[i])))))""".stripMargin.replace('\n', ' ')

  val oracles: Map[String, String] = Map(
    "sim_knn_brute" ->
      s"""SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${duckCos("q.embedding", "c.embedding")}, 6) DESC, c.vec_id ASC) AS rank
         |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
         | WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.replace('\n', ' '),
    "sim_cosine_dup_pairs" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos_sim
         | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         | WHERE round(${duckCos("a.embedding", "b.embedding")}, 6) >= 0.9
         | ORDER BY id_a, id_b""".stripMargin.replace('\n', ' '))
}
