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
  * The salt hashes the CALLER-DESIGNATED `saltOn` columns, not `rand()`
  * and not the whole row: any salt value yields the same JOIN OUTPUT
  * (correctness never depends on which salt a row gets), a deterministic
  * salt keeps task retries and re-runs byte-identical (same rule as
  * Sampling's hash-split), and requiring an explicit high-entropy column
  * (an event id, an offset) prevents the silent failure where duplicate
  * or low-entropy probe rows of the hot key all hash to ONE salt bucket —
  * paying the build-side ×salts replication for zero skew relief. It also
  * keeps unhashable payload columns (MapType) and wide blobs out of the
  * per-row hash.
  *
  * Inner equi-join on one key column; output ≡ `large.join(small, key)`
  * column-for-column (differentially tested).
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltOn: Seq[String]): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(saltOn.nonEmpty,
      "saltOn must name at least one high-entropy probe column (an id/offset): " +
        "salting on a constant or duplicated value concentrates the hot key in one bucket")
    require(saltOn.forall(large.columns.contains),
      s"saltOn columns ${saltOn.filterNot(large.columns.contains)} not in probe side")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt column name is reserved by saltedJoin")
    val salted = large.withColumn("__salt",
      pmod(hash(saltOn.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
