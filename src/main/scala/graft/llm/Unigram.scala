package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer training over
  * the corpus word-frequency table — the other tokenizer an LLM data
  * pipeline meets besides BPE ([[Bpe]]). Seed a piece inventory from
  * substring frequencies, then alternate Viterbi (hard-EM) expectation
  * over the word table with count re-estimation and vocabulary pruning.
  *
  * Determinism contract (so an independent SQL engine replays the run
  * bit-identically):
  *  - piece costs are integer micro-nats:
  *    `round(-ln((cnt+1)/(T+V)) * 1e6)` with Laplace smoothing — DP
  *    sums are exact Long arithmetic; the only float op is one `ln`
  *    per piece per round, quantized at a grid ~1e9 coarser than the
  *    cross-engine libm disagreement;
  *  - Viterbi ties break on the lexicographically smallest delimited
  *    segmentation string (training words are filtered to printable
  *    ASCII, where UTF-16, UTF-8 and byte orders coincide);
  *  - pruning keeps the top ceil(3/4) of multi-char pieces by
  *    (count desc, piece asc), computed as the integer (3n+3)/4 — no
  *    float. Single-char pieces are never pruned (segmentation must
  *    stay total).
  *
  * Scale shape: the corpus-sized work happens once (token explode →
  * word-frequency groupBy); each EM round is one map-side Viterbi pass
  * over the DISTINCT-WORD table (vocabulary-sized, never corpus-sized)
  * plus a piece-keyed aggregation whose key cardinality is the bounded
  * piece inventory (≤ alphabet + seedMultis). The only driver traffic
  * per round is that bounded inventory — the same control-flow shape
  * as [[Bpe]]'s winning-pair collect and the k-means centroid loop.
  */
object Unigram {

  /** Train `rounds` hard-EM rounds; returns the final vocabulary
    * (piece, cnt, cost) — Viterbi-expected counts and integer
    * micro-nat costs — ordered by (cnt desc, piece asc).
    *
    * Words longer than `maxWordLen`, containing the reserved `|`
    * delimiter, or with non-printable-ASCII characters are excluded
    * from training (the SentencePiece sentence-length cap analogue;
    * keeps the segmentation-string tie order engine-independent).
    */
  def train(docs: DataFrame, textCol: String,
      maxWordLen: Int = 8, maxPieceLen: Int = 4,
      seedMultis: Int = 24, rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (_, vocab) =
      trainState(docs, textCol, maxWordLen, maxPieceLen, seedMultis, rounds)
    val cost = costs(vocab)
    vocab.toSeq
      .map { case (p, c) => (p, c, cost(p)) }
      .toDF("piece", "cnt", "cost")
      .orderBy(col("cnt").desc, col("piece"))
  }

  /** Tokenize the corpus with the just-trained vocabulary: per group,
    * whitespace tokens vs unigram pieces — the compression the
    * tokenizer achieves on its own training data ([[Bpe.tokenCounts]]'
    * sibling). The final-cost Viterbi runs once per DISTINCT word;
    * the corpus-sized token stream joins that vocabulary-sized frame
    * by word (one key-partitioned join + one aggregation). Tokens
    * excluded from training (too long / non-ASCII / reserved
    * delimiter) drop from both counts via the inner join.
    */
  def tokenCounts(docs: DataFrame, textCol: String, groupCol: String,
      maxWordLen: Int = 8, maxPieceLen: Int = 4,
      seedMultis: Int = 24, rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (words, vocab) =
      trainState(docs, textCol, maxWordLen, maxPieceLen, seedMultis, rounds)
    val bc = spark.sparkContext.broadcast(costs(vocab))
    val nUni = words
      .map { case (w, _) => (w, viterbi(w, bc.value, maxPieceLen).length.toLong) }
      .toDF("word", "n_uni")
    docs
      .select(col(groupCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .join(nUni, "word")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("ws_tokens"), sum(col("n_uni")).as("uni_tokens"))
  }

  private def costs(v: Array[(String, Long)]): Map[String, Long] = {
    val t = v.map(_._2).sum
    val n = v.length.toLong
    v.map { case (p, c) =>
      p -> Math.round(-Math.log((c + 1).toDouble / (t + n).toDouble) * 1e6)
    }.toMap
  }

  /** The shared training loop: returns the distinct-word table and the
    * final (piece, expected-count) inventory after `rounds` hard-EM
    * rounds.
    */
  private def trainState(docs: DataFrame, textCol: String,
      maxWordLen: Int, maxPieceLen: Int,
      seedMultis: Int, rounds: Int)
      : (org.apache.spark.sql.Dataset[(String, Long)], Array[(String, Long)]) = {
    val spark = docs.sparkSession
    import spark.implicits._

    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")).between(1, maxWordLen) &&
        col("word").rlike("^[!-~]+$") && !col("word").contains("|"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .localCheckpoint(false) // re-segmented every EM round

    // freq-weighted substring occurrence counts at one piece length
    // (all positions, overlaps counted — the standard seed heuristic)
    def substrCounts(l: Int): DataFrame = words.toDF("word", "freq")
      .filter(length(col("word")) >= l)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - lit(l - 1)),
        i => col("word").substr(i, lit(l)))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

    val chars = substrCounts(1).as[(String, Long)].collect() // bounded: the observed alphabet
      .sortBy(_._1)
    val multis = (2 to maxPieceLen).map(substrCounts).reduce(_ unionAll _)
      .orderBy(col("cnt").desc, col("piece")).limit(seedMultis)
      .as[(String, Long)].collect() // bounded: ≤ seedMultis rows

    var charV = chars
    var multiV = multis
    for (_ <- 1 to rounds) {
      val cost = costs(charV ++ multiV)
      val bc = spark.sparkContext.broadcast(cost)
      // E-step: map-side Viterbi over the distinct-word table, then a
      // piece-keyed agg (key cardinality = the bounded inventory) —
      // the collect below is that bounded inventory, not corpus data
      val ecnt = words
        .flatMap { case (w, f) => viterbi(w, bc.value, maxPieceLen).map(_ -> f) }
        .toDF("piece", "freq")
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .as[(String, Long)].collect().toMap // bounded: the ≤ |vocab| piece inventory
      bc.unpersist()
      charV = charV.map { case (p, _) => p -> ecnt.getOrElse(p, 0L) }
      val rescored = multiV.map { case (p, _) => p -> ecnt.getOrElse(p, 0L) }
        .sortBy { case (p, c) => (-c, p) }
      multiV = rescored.take((3 * rescored.length + 3) / 4)
    }
    (words, charV ++ multiV)
  }

  /** Min-cost segmentation of one word under integer piece costs; ties
    * break on the lexicographically smallest delimited segmentation.
    * Total as long as every character of `word` is a priced piece.
    */
  private[llm] def viterbi(
      word: String, cost: Map[String, Long], maxPieceLen: Int): Seq[String] = {
    val n = word.length
    val dpCost = new Array[Long](n + 1)
    val dpSeg = new Array[String](n + 1)
    dpSeg(0) = ""
    var i = 1
    while (i <= n) {
      var bestC = Long.MaxValue
      var bestS: String = null
      var j = 1
      while (j <= maxPieceLen && j <= i) {
        if (dpSeg(i - j) != null) {
          val piece = word.substring(i - j, i)
          cost.get(piece) match {
            case Some(c) =>
              val cc = dpCost(i - j) + c
              if (cc < bestC ||
                  (cc == bestC && { // same position ⇒ neither seg is a
                    // prefix of the other, so the order survives any
                    // common suffix — prefix-DP tie-break is sound
                    val ss = dpSeg(i - j) + "|" + piece
                    bestS == null || ss.compareTo(bestS) < 0
                  })) {
                bestC = cc
                bestS = dpSeg(i - j) + "|" + piece
              }
            case None =>
          }
        }
        j += 1
      }
      dpCost(i) = bestC
      dpSeg(i) = bestS
      i += 1
    }
    require(dpSeg(n) != null,
      s"unsegmentable word '$word': a character is missing from the piece inventory")
    dpSeg(n).substring(1).split("\\|").toSeq
  }
}
