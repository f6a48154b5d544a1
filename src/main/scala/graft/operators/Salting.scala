package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation by key salting.
  *
  * When one join key dominates (a hot user, a null-heavy foreign key), the
  * shuffle partition holding it becomes the straggler. Salting fans the hot
  * key's rows across `salts` sub-partitions deterministically, and
  * replicates the other (smaller) side once per salt so every sub-partition
  * can still match. AQE's skew-join handles moderate skew automatically;
  * salting is the explicit tool for the pathological keys AQE can't split
  * (single-key partitions).
  */
object Salting {

  /** Equi-join `large` (skewed) with `small` on `key`, salting `large` into
    * `salts` buckets. `saltBy` must be deterministic per row (e.g. a unique
    * id column) so results are stable across retries.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
