package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-salting for joins whose hot keys overwhelm even AQE's
  * skew-split (AQE splits oversized partitions, but a single monster key
  * still lands every row of that key on whatever tasks the split assigns
  * while the other side's matching rows must be replicated anyway — salting
  * makes that replication explicit and bounded).
  *
  * `fact` rows get a deterministic salt in [0, buckets) derived from a
  * uniformizing column (e.g. a row id) — no `rand()`, so plans stay
  * deterministic and retry-safe. `dim` is exploded `buckets`× so every
  * (key, salt) pair finds its match. Join fans out on (key, salt):
  * a key with f rows spreads across `buckets` tasks at the cost of
  * replicating the dim side `buckets`×; choose buckets ≈ skew factor.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: String, buckets: Int): DataFrame = {
    // buckets = 0 would make pmod NULL-out every salt and silently return
    // an empty join instead of failing
    require(buckets > 0, s"saltedJoin requires buckets > 0, got $buckets")
    val salted = fact.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(buckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<bigint>")))
    salted.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
