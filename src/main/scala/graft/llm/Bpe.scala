package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) over the
  * corpus word-frequency table — the "train the tokenizer on the data"
  * step of an LLM pipeline, distributed: each round counts adjacent
  * symbol pairs across the vocabulary (weighted by word frequency,
  * overlapping pairs counted as in the reference implementation),
  * picks the most frequent pair (ties: lexicographically smallest),
  * and merges it everywhere leftmost-greedily.
  *
  * Scale shape: the corpus-sized work happens ONCE (token explode →
  * word-frequency groupBy); every training round then runs over the
  * distinct-word table (vocabulary-sized, millions of rows at 100 TB,
  * never corpus-sized) as one pair-explode aggregation plus one
  * column rewrite. The only driver traffic per round is the single
  * winning pair and two counters — the same bounded control-flow
  * shape as the k-means centroid loop (Similarity.lloydCents).
  *
  * Sequences are kept in the delimited form `|s1||s2||…|`, so a merge
  * is one non-overlapping left-to-right `replace` of `|a||b|` with
  * `|ab|` — identical greedy semantics in any engine, and symbol
  * boundaries stay unambiguous however many characters a learned
  * symbol spans.
  */
object Bpe {

  /** Train `merges` rounds; returns the merge table
    * (step, sym_a, sym_b, pair_count, n_sym) where pair_count is the
    * winning pair's weighted count at selection time and n_sym the
    * total weighted symbol count AFTER applying the merge — the
    * corpus-compression curve of the tokenizer.
    */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame =
    trainLoop(docs, textCol, merges)._2

  /** Apply the `merges`-round tokenizer corpus-wide: per source, the
    * whitespace token count vs the BPE token count (the compression
    * the tokenizer actually achieves on the data it was trained on).
    * The vocabulary (word → merged symbol count) joins back onto the
    * token stream by word — vocabulary-sized build, corpus-sized
    * stream, one key-partitioned join + one aggregation.
    */
  def tokenCounts(docs: DataFrame, textCol: String, groupCol: String, merges: Int): DataFrame = {
    val seqs = trainLoop(docs, textCol, merges)._1
    val syms = split(expr("trim(BOTH '|' FROM seq)"), "\\|\\|")
    val vocab = seqs.select(col("word"), size(syms).cast("long").as("n_bpe"))
    docs
      .select(col(groupCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .join(vocab, "word")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("ws_tokens"), sum(col("n_bpe")).as("bpe_tokens"))
  }

  private def trainLoop(
      docs: DataFrame, textCol: String, merges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // the delimited form reserves '|'; a token containing it would
    // parse as phantom symbols and silently corrupt every merge, so
    // fail eagerly instead (vocabulary-sized probe, one bounded job)
    require(words.filter(col("word").contains("|")).limit(1).count() == 0,
      "BPE training requires '|'-free tokens: the delimited-sequence " +
        "encoding reserves '|' as the symbol separator")
    // '|a||b||c|' — one regex pass builds the delimited char sequence
    var seqs = words
      .select(col("word"), col("freq"),
        regexp_replace(col("word"), "(.)", "|$1|").as("seq"))
      .localCheckpoint(false) // two actions per round read this frame
    val syms = split(expr("trim(BOTH '|' FROM seq)"), "\\|\\|")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Long)]
    var step = 1
    while (step <= merges) {
      val best = seqs
        .select(col("freq"), explode(arrays_zip(
          slice(syms, lit(1), size(syms) - 1).as("a"),
          slice(syms, lit(2), size(syms) - 1).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect() // 1 row: the winning pair (bounded driver traffic)
      require(best.nonEmpty, s"no adjacent pairs left before merge $step")
      val (a, b, cnt) =
        (best(0).getAs[String]("a"), best(0).getAs[String]("b"), best(0).getAs[Long]("cnt"))
      seqs = seqs
        .withColumn("seq",
          replace(col("seq"), lit(s"|$a||$b|"), lit(s"|$a$b|")))
        .localCheckpoint(false)
      val nSym = seqs
        .agg(sum(col("freq") * size(syms)).as("n"))
        .collect()(0).getAs[Long]("n") // 1 value: compression counter
      out += ((step.toLong, a, b, cnt, nSym))
      step += 1
    }
    import spark.implicits._
    // the merge table IS the trained model — materializing the
    // `merges`-row artifact on the driver is the point of training
    (seqs, out.toSeq.toDF("step", "sym_a", "sym_b", "pair_count", "n_sym"))
  }
}
