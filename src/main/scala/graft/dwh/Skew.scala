package graft.dwh

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for the joins AQE can't fully rescue (SURVEY §4:
  * "salting for skew"). At 100 TB a handful of hot keys — one company
  * posting half the jobs, the 'Unknown' location — can pin a join to a
  * single straggler task; salting fans each hot key out over
  * `saltBuckets` shuffle partitions by replicating the (small) build
  * side once per bucket.
  */
object Skew {

  /** Salted inner equi-join: `big` gets a random-but-deterministic salt
    * (hash of all columns mod buckets), `small` is replicated across
    * every salt value. Semantically identical to
    * `big.join(small, keys)`; physically the hot keys spread over
    * `saltBuckets` tasks.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(saltBuckets)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(explodedSmall, keys :+ "__salt")
      .drop("__salt")
  }
}
