package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi-join: the scale pattern for
  * "filter a huge fact by membership in a dim slice" when the slice is
  * small enough to summarize but the fact is far too big to shuffle.
  *
  * The filter is built ENTIRELY as a DataFrame aggregation (explode k
  * probe positions → bit_or per 64-bit word → one map row), broadcast
  * to the fact scan as a single-row cross join, and applied as a
  * codegen'd bit test — no driver-side sketch object, no UDF, nothing
  * leaves the executors except m/64 longs. False positives are then
  * removed by an exact semi-join whose probe side has already been cut
  * to ~(|match| + fp·|fact|) rows, so the shuffle the semi-join needs
  * moves a small fraction of the fact. Bloom filters have NO false
  * negatives, so the composition is exactly the plain semi-join —
  * which is what the oracle asserts.
  *
  * At 100 TB: Spark's own runtime row-group filtering
  * (InjectRuntimeFilter) does a version of this automatically for
  * shuffle joins; this operator is the explicit form for when the
  * pruning must survive a checkpoint, feed a different engine, or use
  * a persisted filter built on a previous day's dim.
  */
object BloomJoin {

  /** Bloom bitmap of `keys.keyCol` as ONE row: map<word:int, bits:long>
    * with mBits/64 entries. Deterministic: xxhash64(bigint key, seed=i)
    * mod m for i in [0, k). Keys hash AS BIGINT — xxhash64 is
    * type-dependent (an INT and a BIGINT holding the same value hash
    * differently), so both the build and probe sides must coerce to
    * one type or probes silently miss set bits (false negatives, the
    * one thing a Bloom filter must never produce).
    */
  def bloomBitmap(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val keyAsLong = col(keyCol).cast("long")
    val probes = (0 until k).map(i =>
      pmod(xxhash64(keyAsLong, lit(i)), lit(mBits.toLong)))
    keys
      .select(explode(array(probes: _*)).as("pos"))
      // shiftleft with a COLUMN shift amount only exists as the SQL
      // function (the Scala helper takes a literal Int)
      .groupBy((col("pos") / 64).cast("int").as("word"))
      .agg(bit_or(expr("shiftleft(1L, cast(pos % 64 as int))")).as("bits"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("word"), col("bits")))))
        .as("__bloom"))
  }

  /** `fact` rows whose `factKey` is in `dimKeys.dimKey`, pre-filtered by
    * the Bloom bitmap before the exact left_semi join. Keys must be
    * integral (both sides are hashed as BIGINT — see bloomBitmap).
    */
  def semiJoin(
      fact: DataFrame, factKey: String,
      dimKeys: DataFrame, dimKey: String,
      mBits: Int = 1 << 16, k: Int = 3): DataFrame = {
    def integral(df: DataFrame, c: String): Boolean =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
    require(integral(fact, factKey) && integral(dimKeys, dimKey),
      s"BloomJoin keys must be integral types; got " +
        s"${fact.schema(factKey).dataType.sql} / ${dimKeys.schema(dimKey).dataType.sql}")
    require(!fact.columns.contains("__bloom"),
      "fact already has a '__bloom' column")
    val bloom = bloomBitmap(dimKeys.select(col(dimKey)), dimKey, mBits, k)
    val mightContain: Column = (0 until k)
      .map { i =>
        // probe hashes CAST(key AS BIGINT) — must match the build side
        val pos = s"pmod(xxhash64(cast(`$factKey` as bigint), $i), ${mBits}L)"
        expr(s"""(shiftright(coalesce(element_at(__bloom, cast($pos div 64 as int)), 0L),
                 |           cast($pos % 64 as int)) & 1L) = 1L""".stripMargin)
      }
      .reduce(_ && _)
    fact
      .crossJoin(broadcast(bloom)) // 1 row: the bitmap rides the broadcast
      .filter(mightContain)
      .drop("__bloom")
      .join(broadcast(dimKeys.select(col(dimKey).cast(fact.schema(factKey).dataType)
          .as(factKey)).distinct()),
        Seq(factKey), "left_semi")
  }
}
