package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketches over unbounded token streams — the heavy-hitter
  * machinery a 100 TB corpus profile needs when exact per-token counts
  * are too wide to keep (vocabulary in the billions once you count
  * typos, URLs, and code identifiers).
  *
  * Count-Min here is DETERMINISTIC and SQL-replayable: row r hashes a
  * token to bucket md5(r ":" token)[0:8] mod width — the same
  * md5-derivation trick the LSH planes and IVF centroids use — so the
  * DuckDB oracle rebuilds the identical sketch and the estimates are
  * value-exact, not just statistically characterized.
  *
  * Scale shape: the build is explode(tokens) × depth followed by ONE
  * partial-aggregated groupBy onto depth·width cells — map-side
  * combine collapses every partition to ≤ depth·width rows, so the
  * shuffle is constant-size no matter the corpus; estimates broadcast
  * the finished cells. The classic CM guarantee holds: estimates
  * never undercount, and overcount ≤ 2N/width with prob ≥ 1−2^-depth.
  */
object Sketches {

  val Depth = 4
  val Width = 1024

  /** Bucket of `tok` in sketch row `r` (native expressions only). */
  private def bucket(r: Int, tok: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"$r:"), tok)), 1, 8), 16, 10).cast("long"),
      lit(Width))

  /** Build the (r, bucket) → count cells for a token column (one row
    * per token OCCURRENCE in `keyed`).
    */
  def buildTokenSketch(tokens: DataFrame, tokCol: String): DataFrame =
    tokens
      .select(explode(array((0 until Depth).map(r =>
        struct(lit(r).as("r"), bucket(r, col(tokCol)).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  val LinearCountBits = 4096

  /** Linear-counting cardinality sketch state per group: the number of
    * set bits in an `LinearCountBits`-wide bitmap where each value
    * sets bit md5(value)[0:8] mod m. The state is two integers per
    * group (bits set, and the classic estimate is m·ln(m/(m−b)) —
    * left to the consumer so the operator's outputs stay integer-exact
    * and engine-portable). Build is one partial-aggregated
    * groupBy(group, bit): ≤ m rows per group survive the map side, so
    * the shuffle is bounded by groups × m however big the corpus —
    * the same distributive shape a 100 TB daily cardinality profile
    * needs. (Spark's native approx_count_distinct/HLL++ covers the
    * generic case; this variant exists where the sketch itself must
    * be deterministic and replayable across engines.)
    */
  def linearCountBits(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.select(col(groupCol),
        pmod(conv(substring(md5(col(valCol)), 1, 8), 16, 10).cast("long"),
          lit(LinearCountBits)).as("__bit"))
      .groupBy(groupCol, "__bit")
      .agg(count(lit(1)).as("__c"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("bits_set"))

  /** Count-Min estimate for each probe token: min over rows of its
    * bucket's count. `cells` is `buildTokenSketch`'s output
    * (depth·width rows — broadcastable by construction).
    */
  def estimate(probes: DataFrame, tokCol: String, cells: DataFrame): DataFrame = {
    val probed = probes.select(col("*"),
      explode(array((0 until Depth).map(r =>
        struct(lit(r).as("r"), bucket(r, col(tokCol)).as("b"))): _*)).as("rb"))
      .select(col("*"), col("rb.r").as("r"), col("rb.b").as("b")).drop("rb")
    probed
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy(probes.columns.map(col): _*)
      .agg(min(col("c")).as("cm_est"))
  }
}
