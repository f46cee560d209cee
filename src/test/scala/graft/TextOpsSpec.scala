package graft

import graft.operators.TextOps

class TextOpsSpec extends SparkTestBase {

  private def bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(6)
    java.lang.Long.parseLong(hex, 16) % 10000
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
}
