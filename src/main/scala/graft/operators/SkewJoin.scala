package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for EXTREME key skew — the manual escape hatch when
  * AQE's skew-split can't help:
  *
  *  - AQE splits oversized SORT-MERGE partitions after the shuffle, but a
  *    single hot key still lands in one partition per split boundary and
  *    the matching build rows must be replicated to every split anyway;
  *  - broadcast solves skew only when the build side FITS in memory.
  *
  * Salting moves the replication into the plan explicitly: the probe
  * (large, skewed) side gets a deterministic per-row salt in [0, salts),
  * the build side is exploded × salts, and the join key becomes
  * (key, salt) — a hot key's rows spread over `salts` tasks, each holding
  * a full copy of that key's build rows. Build-side cost: ×salts rows
  * (choose salts ≈ hot-key partitions needed, not 100s).
  *
  * The salt is a hash of the probe row's columns, not `rand()`: any salt
  * value yields the same JOIN OUTPUT (correctness never depends on which
  * salt a row gets), but a deterministic salt keeps task retries and
  * re-runs byte-identical — same rule as Sampling's hash-split.
  *
  * Inner equi-join on one key column; output ≡ `large.join(small, key)`
  * column-for-column (differentially tested).
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt column name is reserved by saltedJoin")
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
