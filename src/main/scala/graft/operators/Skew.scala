package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for the joins AQE cannot fix.
  *
  * AQE's skew-join handles a skewed SORT-MERGE join by splitting oversized
  * partitions — the right default, and the bench session enables it. But
  * AQE cannot split when the skewed side must stay co-partitioned with
  * downstream state (streaming stateful ops), when the join is planned
  * broadcast-ineligible-but-hashed, or when a single hot key's rows exceed
  * one task's memory regardless of splitting (every row of the hot key
  * still meets every build row of it). Salting is the plan-level fix: the
  * probe side scatters each hot key across `salts` synthetic sub-keys, the
  * build side replicates its rows to ALL sub-keys, and the join key
  * becomes (key, salt) — the hot key's row set now spreads over `salts`
  * tasks instead of one. Output is row-identical to the unsalted join:
  * every probe row still meets exactly the build rows of its key (build
  * replication is per-salt complete, and a probe row carries exactly one
  * salt).
  *
  * Cost model: build-side size × `salts` extra rows shuffled/hashed —
  * use for a SMALL-but-not-broadcastable build side against a skewed
  * probe side. The salt is assigned by hashing a per-row physical id, so
  * it needs no data column, is uniform regardless of key distribution,
  * and a task retry that lands on a different salt still joins correctly
  * (all salts are complete on the build side).
  */
object Skew {

  /** Salt expression: uniform in [0, salts). Derived from the row's
    * physical id, not its data — uniform even when every row shares one
    * key value (the exact case salting exists for). */
  private def saltCol(salts: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int")

  /** Inner/left equi-join of skewed `probe` against small `build` on
    * `key`, spread over `salts` sub-keys. Row-identical to
    * `probe.join(build, Seq(key), joinType)`. */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting supports inner/left probe-side joins, not $joinType")
    val p = probe.withColumn("__salt", saltCol(salts))
    val b = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    p.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
