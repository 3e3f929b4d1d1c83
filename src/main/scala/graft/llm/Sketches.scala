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

  /** HyperLogLog registers over the 32-bit md5 hash: 64 registers
    * (top 6 hash bits), rho = leading-zero rank of the low 26 bits
    * (via bin()-string length — pure integer/string ops, replayable
    * in SQL). The state per group is a 64-int MAX — partial-
    * aggregated, mergeable across partitions/days/streams, and legal
    * in a streaming aggregation (max is a streaming-supported agg, so
    * the same expression tree runs over readStream unchanged).
    * Returns sparse (groupCols*, idx, m) rows.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valCol: String): DataFrame = {
    val h = conv(substring(md5(col(valCol).cast("string")), 1, 8), 16, 10).cast("long")
    df.select(groupCols.map(col) ++ Seq(
        shiftright(h, 26).cast("int").as("idx"),
        h.bitwiseAND(lit(67108863L)).as("__rem")): _*)
      .withColumn("rho",
        when(col("__rem") === 0, lit(27)).otherwise(lit(27) - length(bin(col("__rem")))))
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max("rho").as("m"))
  }

  /** Finalize HLL registers (sparse or dense) into a raw estimate per
    * group (column `est_raw`). The harmonic sum adds 64 dyadic
    * rationals 2^-m (m ≤ 27) whose double sum is EXACT and
    * order-independent; the small-range correction branch compares
    * deterministic doubles, so the whole finalize replays in SQL.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grid = registers.select(groupCols.map(col): _*).distinct()
      .select(groupCols.map(col) :+ explode(sequence(lit(0), lit(63))).as("idx"): _*)
    // the grid derives FROM `registers`, so a self-join shares attribute
    // ids (a memory-sink source does not self-dedupe them); renaming
    // the right side through aliases mints fresh ids and sidesteps it
    val regR = registers.select(
      (groupCols :+ "idx" :+ "m").map(c => col(c).as(s"__r_$c")): _*)
    val cond = (groupCols :+ "idx")
      .map(c => col(c) === col(s"__r_$c")).reduce(_ && _)
    val z = grid.join(regR, cond, "left")
      .select(groupCols.map(col) :+ coalesce(col("__r_m"), lit(0)).as("m"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(lit(1.0) / expr("CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE)"))
        .as("z"),
        sum(when(col("m") === 0, 1L).otherwise(0L)).as("v"))
    z.withColumn("e_raw",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0)) * lit(4096.0) / col("z"))
      .withColumn("est_raw",
        when(col("e_raw") <= 160.0 && col("v") > 0,
          lit(64.0) * log(lit(64.0) / col("v"))).otherwise(col("e_raw")))
      .select(groupCols.map(col) :+ col("est_raw"): _*)
  }

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

  // ---------------------------------- mergeable histogram quantile sketch
  /** Equi-width histogram sketch over a FIXED value range — the
    * mergeable quantile summary that completes the sketch family
    * (HLL = distincts, Count-Min = frequencies, this = quantiles).
    * State is ≤ `buckets` counts per group; merging two sketches is
    * count addition (associative + commutative), which is what makes
    * it legal bounded streaming-aggregation state (q_st14) and a
    * rollup-able partial aggregate — where the EXACT path
    * (operators/GroupedQuantiles) must re-scan data per query, the
    * sketch answers any quantile later from the standing counts, with
    * error bounded by one bucket width. Out-of-range values clamp to
    * the edge buckets (visible as mass at the extremes, never
    * dropped); the fixed [lo, hi) contract is the standard production
    * trade (pick bounds from schema/domain knowledge).
    */
  private def bucketOf(v: Column, lo: Double, hi: Double, buckets: Int): Column =
    least(lit(buckets - 1), greatest(lit(0),
      floor((v - lit(lo)) / lit(hi - lo) * lit(buckets)).cast("int")))

  /** Sketch build: one row per (group, non-empty bucket). */
  def histogramSketch(df: DataFrame, groupCols: Seq[String], valCol: String,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets > 1 && hi > lo, "histogramSketch: need buckets > 1 and hi > lo")
    df.filter(col(valCol).isNotNull)
      .groupBy(groupCols.map(col) :+
        bucketOf(col(valCol).cast("double"), lo, hi, buckets).as("__hb"): _*)
      .agg(count(lit(1)).as("__hc"))
  }

  /** Finalize quantiles from a (merged) sketch: for each (name, q)
    * the FIRST bucket whose cumulative count reaches rank ceil(q·n),
    * reported as the bucket midpoint. The cumulative window runs over
    * ≤ `buckets` rows per group — bounded by construction, never by
    * data. Long output: (groupCols*, q_name, est).
    */
  def sketchQuantiles(sketch: DataFrame, groupCols: Seq[String],
      qs: Seq[(String, Double)], lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 })
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy("__hb")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val cum = sketch
      .withColumn("__cum", sum("__hc").over(w))
      .withColumn("__n", sum("__hc").over(wAll))
    val qlit = qs.map { case (nm, q) => struct(lit(nm).as("__q"), lit(q).as("__qf")) }
    cum.select(col("*"), explode(array(qlit: _*)).as("__qs"))
      .filter(col("__cum") >= ceil(col("__qs.__qf") * col("__n")))
      .groupBy(groupCols.map(col) :+ col("__qs.__q").as("q_name"): _*)
      .agg(min("__hb").as("__b"), min("__n").cast("long").as("n"))
      .select(groupCols.map(col) :+ col("q_name") :+
        (lit(lo) + (col("__b") + lit(0.5)) * lit((hi - lo)) / lit(buckets)).as("est") :+
        col("n"): _*)
  }
}
