package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {

  test("brute-force knn: k rows per query, ranks contiguous, sims descending") {
    val rows = Similarity.knnBrute(spark, sf, nQueries = 5, k = 5).collect()
    assert(rows.length === 25)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq === (1 to 5))
      val sims = byRank.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("cosine is 1.0 for identical vectors, computed in double") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val res = df.select(round(Similarity.cosine(col("a"), col("b")), 9)).collect()
    assert(res(0).getDouble(0) === 1.0)
    assert(res(1).getDouble(0) === 0.0)
  }

  test("IVF ANN: k rows per query cap, candidates only from probed clusters, sane recall") {
    val brute = Similarity.knnBrute(spark, sf, nQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvf(spark, sf, nQueries = 5, k = 5)
      .collect()
    assert(ivf.length <= 25)
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to rs.length))
    }
    val recall = brute.count(ivf.map(r => (r.getLong(0), r.getLong(1))).toSet.contains).toDouble / brute.size
    // 4 of 16 probed clusters on a random corpus: recall is approximate
    assert(recall >= 0.1, s"IVF recall $recall vs brute")
  }

  test("LSH ANN recall vs brute force") {
    val brute = Similarity.knnBrute(spark, sf, nQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.knnLsh(spark, sf, nQueries = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ann.contains).toDouble / brute.size
    // random corpus, 16-bit buckets + multiprobe: recall is approximate by design
    assert(recall >= 0.2, s"ANN recall $recall vs brute")
    assert(ann.size <= 25)
  }
}
