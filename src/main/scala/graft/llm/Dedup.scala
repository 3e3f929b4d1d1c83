package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators: exact
  * (hash-groupBy), MinHash+LSH banded near-dup, SimHash, and exact
  * n-gram Jaccard via shingle-join candidate generation.
  *
  * Scale design (the whole point of these):
  *  - NOTHING here is all-pairs. Candidates come from equi-join
  *    blocking — (band, band_hash) buckets for MinHash, shared distinct
  *    shingles for exact Jaccard, 16-bit SimHash bands for Hamming —
  *    so the shuffles are key-partitioned joins that scale linearly in
  *    candidate count, not quadratically in corpus size.
  *  - Signatures are pure Column expressions (xxhash64 / array lambdas),
  *    so the map side stays inside whole-stage codegen; no UDF in the
  *    per-document hot path except SimHash's bit-vote loop.
  *  - At 100 TB: repartition docs by doc_id, compute signatures
  *    map-side, shuffle once on bucket keys, verify only inside
  *    buckets. Band count tunes recall (32 bands × 4 rows ⇒ P(miss) at
  *    J=0.8 is (1−0.8⁴)³² ≈ 5e-8).
  */
object Dedup {

  /** Canonical text normalization: lowercase, collapse whitespace, trim. */
  def normalizeText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content fingerprint for exact dedup (md5 of normalized text). */
  def exactFingerprint(c: Column): Column = md5(normalizeText(c))

  /** Whitespace tokens of the raw text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct word n-shingles; empty array for docs shorter than n
    * tokens (excluded from candidate generation, matching the natural
    * SQL semantics).
    */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: perm p's value is min over shingles of
    * xxhash64(p, shingle). One nested array lambda — fully codegen'd.
    */
  def minhashSignature(shingleCol: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)),
      p => array_min(transform(shingleCol, s => xxhash64(p, s))))

  /** LSH band keys: hash of each r-row slice of the signature. */
  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => hash(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** Exact Jaccard over two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  /** MinHash/LSH near-duplicate pairs: banded bucketing → candidate
    * pairs → exact-Jaccard verification. `docs` needs (idCol, textCol).
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    */
  def minhashNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, perms: Int, bands: Int,
      threshold: Double): DataFrame = {
    val rowsPerBand = perms / bands
    val withShingles = docs
      .select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val banded = withShingles
      .select(col("__id"),
        posexplode(lshBandHashes(minhashSignature(col("__sh"), perms), bands, rowsPerBand))
          .as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("__id").as("id_a"))
    val b = banded.select(col("band"), col("bh"), col("__id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(withShingles.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(withShingles.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("__sh_a"), col("__sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard pairs via shingle-join blocking: any pair with
    * J > 0 shares a shingle, so the equi-join on distinct shingles is a
    * COMPLETE candidate generator — no all-pairs scan, and at scale the
    * hottest (most common) shingles can be dropped as stopword-shingles
    * to bound bucket sizes.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame = {
    val withShingles = docs
      .select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val exploded = withShingles.select(col("__id"), explode(col("__sh")).as("s"))
    val candidates = exploded.select(col("s"), col("__id").as("id_a"))
      .join(exploded.select(col("s"), col("__id").as("id_b")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(withShingles.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(withShingles.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("__sh_a"), col("__sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------ SimHash
  /** 64-bit SimHash of a token array: each token votes its hash bits
    * up/down; the sign of each bit-sum forms the fingerprint. FNV-1a
    * inside the UDF keeps it self-contained and deterministic.
    */
  private[llm] def simhash64(toks: Seq[String]): Long = {
    val votes = new Array[Int](64)
    toks.foreach { t =>
      var h = 0xcbf29ce484222325L // FNV-1a 64
      t.foreach { ch => h ^= ch.toLong; h *= 0x100000001b3L }
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    votes.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > 0) acc | (1L << i) else acc
    }
  }
  val simhashUdf = udf(simhash64 _)

  /** SimHash near-dup pairs with Hamming distance ≤ maxDistance,
    * blocked on 4×16-bit bands (a pair within distance 3 must agree on
    * at least one band; larger distances trade recall for speed).
    */
  def simhashNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int): DataFrame = {
    val sigs = docs.select(col(idCol).as("__id"),
      simhashUdf(tokens(col(textCol))).as("sig"))
    val banded = sigs.select(col("__id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("__id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bh"), col("__id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}
