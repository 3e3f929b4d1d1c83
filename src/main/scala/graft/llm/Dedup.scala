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

  /** Distinct word n-shingles (single-pass UDF; nested array-lambda
    * expressions evaluate interpreted and were the bench bottleneck —
    * a primitive-loop UDF is ~50× faster here). Empty for docs shorter
    * than n tokens.
    */
  private[llm] def shinglesImpl(text: String, n: Int): Seq[String] = {
    if (text == null) return Seq.empty
    val toks = text.trim.split("\\s+")
    if (toks.length < n) return Seq.empty
    val out = scala.collection.mutable.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out += sb.result()
      i += 1
    }
    out.toSeq
  }
  private val shinglesUdf = udf(shinglesImpl _)
  def shingles(c: Column, n: Int): Column = shinglesUdf(c, lit(n))

  /** FNV-1a base hash, then one multiply-xor mix per permutation —
    * standard a·h+b universal-hash family for MinHash.
    */
  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** MinHash signature + banded keys in one pass: returns the `bands`
    * band hashes (each summarizing rowsPerBand signature minima).
    */
  private[llm] def minhashBandsImpl(
      shingleSeq: Seq[String], perms: Int, bands: Int): Seq[Long] = {
    if (shingleSeq == null || shingleSeq.isEmpty) return Seq.empty
    val rowsPerBand = perms / bands
    val sig = Array.fill(perms)(Long.MaxValue)
    shingleSeq.foreach { s =>
      val base = fnv1a(s)
      var p = 0
      while (p < perms) {
        // xorshift-multiply mix keyed by permutation index
        var h = base ^ (0x9e3779b97f4a7c15L * (p + 1))
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        if (h < sig(p)) sig(p) = h
        p += 1
      }
    }
    (0 until bands).map { b =>
      var h = 0xcbf29ce484222325L ^ b.toLong
      var r = 0
      while (r < rowsPerBand) { h ^= sig(b * rowsPerBand + r); h *= 0x100000001b3L; r += 1 }
      h
    }
  }
  private val minhashBandsUdf = udf(minhashBandsImpl _)

  /** LSH band keys for a document's shingle set. */
  def lshBands(shingleCol: Column, perms: Int, bands: Int): Column =
    minhashBandsUdf(shingleCol, lit(perms), lit(bands))

  /** Exact Jaccard over two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  /** Ensure enough input partitions that per-document UDF work (winnow,
    * shingling) spreads across the cluster: a single small parquet file
    * arrives as 1-2 partitions, serializing the map stage. No-op when
    * the scan is already parallel (the real-scale case).
    */
  private def spread(docs: DataFrame): DataFrame = {
    val want = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions < want) docs.repartition(want) else docs
  }

  /** Exact Jaccard pairs from a (doc, key) exploded frame via
    * blocking-join candidate generation with a stopword-key cap.
    *
    * The cap: keys present in more than `maxDocFreq` documents are
    * dropped before pairing, and Jaccard is computed over the kept
    * (informative) key sets on both sides. A key shared by thousands
    * of documents is template boilerplate — it cannot make a pair
    * near-duplicate on its own (J ≥ t needs the pair to share ~t of
    * EACH side's keys) but it would make its bucket's pair work
    * quadratic in frequency. With the cap, per-bucket pair work is
    * ≤ maxDocFreq²/2 however templated the corpus, which is what keeps
    * this linear at 100 TB. Key frequencies come from an aggregation
    * joined back (AQE broadcasts the frequency side when the
    * vocabulary is small; at real scale it degrades to a shuffle join,
    * never a sort).
    *
    * Intersection sizes come from counting each bucket's emitted
    * pairs — one count-shuffle keyed by the pair, no array re-join.
    *
    * `keyed` must be one row per (doc, key) with columns
    * (__id: long, `keyCol`).
    */
  private def jaccardPairsViaBlocking(
      keyed: DataFrame, keyCol: String,
      threshold: Double, maxDocFreq: Int): DataFrame = {
    // Cap via a count window on the key: one shuffle computes the
    // explosion (UDF once), frequencies, and the filter, and the
    // result is materialized once (localCheckpoint, GC-dropped) for
    // the three downstream consumers.
    val kept = keyed
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCol)))
      .filter(col("__df") <= maxDocFreq)
      .drop("__df")
      .localCheckpoint()
    val sizes = kept.groupBy("__id").agg(count(lit(1)).as("n"))
    // The candidate join's grouping keys are nearly unique per input
    // partition (pairs repeat across keys, which live elsewhere), so a
    // partial aggregate would hash ~all rows for no reduction — an
    // explicit repartition on the pair makes Catalyst plan a single
    // final aggregate instead.
    val inter = kept.select(col(keyCol), col("__id").as("id_a"))
      .join(kept.select(col(keyCol), col("__id").as("id_b")), Seq(keyCol))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .repartition(col("id_a"), col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Profiling hook: the winnow → cap → checkpoint stage on its own. */
  private[graft] def winnowExplodedForProfile(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, maxDocFreq: Int): DataFrame =
    spread(docs)
      .select(col(idCol).as("__id"),
        explode(TextAnalysis.winnowUdf(normalizeText(col(textCol)), lit(k), lit(w))).as("fp"))
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("__df") <= maxDocFreq)
      .drop("__df")
      .localCheckpoint()

  /** MinHash/LSH near-duplicate pairs: banded bucketing → candidate
    * pairs → exact-Jaccard verification. `docs` needs (idCol, textCol).
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    */
  def minhashNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, perms: Int, bands: Int,
      threshold: Double): DataFrame = {
    // checkpointed: both sides of the band self-join and the
    // verification joins reuse the materialization instead of
    // recomputing signatures per branch; unlike persist() the cached
    // blocks are dropped automatically once the frame is GC'd (the
    // round-2 unpersist leak)
    val withShingles = docs
      .select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .localCheckpoint()
    val banded = withShingles
      .select(col("__id"), posexplode(lshBands(col("__sh"), perms, bands)).as(Seq("band", "bh")))
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

  /** Exact n-gram Jaccard pairs via shingle-join blocking: any pair
    * sharing an informative shingle meets in the equi-join; shingles in
    * more than `maxDocFreq` docs are dropped as stopword-shingles
    * (capDocFreq) so bucket sizes — and the join's pair work — stay
    * bounded however templated the corpus is. Jaccard is over the kept
    * shingle sets.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double, maxDocFreq: Int = 500): DataFrame =
    jaccardPairsViaBlocking(
      spread(docs)
        .select(col(idCol).as("__id"), explode(shingles(col(textCol), shingleN)).as("s")),
      "s", threshold, maxDocFreq)

  /** Winnowing-fingerprint near-dup pairs: each doc's winnow set
    * (TextAnalysis.winnow over normalized text) plays the shingle role
    * — fingerprint equi-join candidate generation, Jaccard over the
    * fingerprint sets. Character-level, so it catches near-dups that
    * word-shingle methods miss (reformatted whitespace, joined words),
    * with ~|text|/w fingerprints per doc instead of one per token
    * shingle. Same blocking-join scale shape as ngramJaccardPairs,
    * including the stopword-fingerprint cap: char-k-gram fingerprints
    * of templated text have hot keys (ubiquitous substrings) whose
    * join buckets would otherwise grow quadratically, so fingerprints
    * in more than `maxDocFreq` docs are dropped before the pair join
    * and Jaccard is computed over the kept sets.
    */
  def winnowNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, threshold: Double, maxDocFreq: Int = 500): DataFrame =
    jaccardPairsViaBlocking(
      spread(docs)
        .select(col(idCol).as("__id"),
          explode(TextAnalysis.winnowUdf(normalizeText(col(textCol)), lit(k), lit(w))).as("fp")),
      "fp", threshold, maxDocFreq)

  // ------------------------------------------------------------ SimHash
  /** 64-bit SimHash of a token array: each token votes its hash bits
    * up/down; the sign of each bit-sum forms the fingerprint. The token
    * hash is the first 64 bits of md5 — chosen over FNV because it is
    * REPLAYABLE IN SQL (DuckDB `md5` + hex cast), which turns the
    * banded SimHash query into a fully oracle-checked one (q_l4): the
    * oracle recomputes identical signatures, bands, and Hamming
    * distances instead of settling for a rows-only check.
    */
  private[llm] def simhash64(toks: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    toks.foreach { t =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      // first 8 digest bytes, big-endian — same bits as the first 16
      // hex chars of the md5 string
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
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
