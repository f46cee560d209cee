package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-layout helpers for the 100 TB posture.
  *
  * Bucketing pre-shuffles a fact table ONCE at write time: every later
  * equi-join or aggregation on the bucket key reads co-located buckets and
  * plans with zero exchanges (`PruneFileSourcePartitions` + bucket-aware
  * scan). For the flow tables the analog is `partitionBy(event_date)` (time
  * pruning) + bucketing by the frequent join/group key; for TPC-H-shaped
  * facts it is the join key, as BucketingSpec demonstrates with
  * lineitem ⋈ orders.
  */
object Storage {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
