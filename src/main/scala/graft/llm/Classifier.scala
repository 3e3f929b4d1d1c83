package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seed-labeled quality classifier over hashed token buckets — the
  * "train a small classifier on curated seed sources, score the whole
  * corpus" step every large curation pipeline runs (the fastText-style
  * quality filter of LLaMA-class data recipes, the linear model of
  * CCNet): a multinomial Naive Bayes whose features are md5-hashed
  * unigram buckets, trained from WEAK labels (membership in a curated
  * positive source set vs a known-bad negative set) and applied to
  * every document, labeled or not.
  *
  * Scale shape: training is token-explode → groupBy (bucket, label) —
  * the model is AT MOST `buckets` rows regardless of corpus size — and
  * scoring is one broadcast join of that model onto the token stream
  * followed by a single groupBy(doc) sum, so the only fact-sized
  * shuffle is the per-doc aggregation. Nothing is collected to the
  * driver; the model rides a broadcast.
  *
  * Cross-engine determinism: bucket ids come from md5 (identical hex
  * in any engine); log-odds weights are computed from EXACT integer
  * counts, rounded to 12 decimals, and cast to DECIMAL(28,12), so the
  * per-doc score is an exact decimal sum — no float accumulation
  * order anywhere in the scoring path.
  */
object Classifier {

  /** md5-derived feature bucket in [0, buckets) for a term column. */
  def tokenBucket(term: Column, buckets: Int): Column =
    conv(substring(md5(term), 1, 6), 16, 10).cast("long") % buckets

  /** Per-bucket log-odds weights from seed-labeled docs.
    *
    * `label` must be 1 (positive seed) / 0 (negative seed); unlabeled
    * docs are excluded by the caller. Returns `buckets` rows at most:
    * (bucket, w DECIMAL(28,12)) with Laplace(1) smoothing —
    * w(b) = ln((n_pos_b+1)/(n_pos+B)) − ln((n_neg_b+1)/(n_neg+B)).
    */
  def nbTrain(
      seedDocs: DataFrame,
      textCol: String,
      labelCol: String,
      buckets: Int): DataFrame = {
    val tok = seedDocs
      .select(col(labelCol).cast("int").as("label"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .select(col("label"), tokenBucket(col("term"), buckets).as("bucket"))
    val counts = tok
      .groupBy("bucket")
      .agg(
        sum(col("label")).as("n_pos_b"),
        sum(lit(1) - col("label")).as("n_neg_b"))
    val totals = counts.agg(
      sum("n_pos_b").as("n_pos"), sum("n_neg_b").as("n_neg"))
    counts
      .crossJoin(broadcast(totals)) // 1 row: class token totals
      .select(
        col("bucket"),
        round(
          log((col("n_pos_b") + 1.0) / (col("n_pos") + buckets.toDouble)) -
            log((col("n_neg_b") + 1.0) / (col("n_neg") + buckets.toDouble)),
          12).cast("decimal(28,12)").as("w"))
  }

  /** Score EVERY doc: prior + Σ_tokens w(bucket(token)), all decimal.
    *
    * Docs with no tokens — or whose every token hashes to a bucket the
    * seed never produced — fall back to the prior alone (left join +
    * coalesce), so the output has exactly one row per input doc and
    * the accept column is usable as-is. `prior` is a 1-row
    * (prior DECIMAL) frame (class-balance log-odds from the seed doc
    * counts) so the whole model stays in the plan — returns
    * (idCol, score DECIMAL, accept BOOLEAN).
    */
  def nbScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      prior: DataFrame,
      buckets: Int): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .select(col(idCol), tokenBucket(col("term"), buckets).as("bucket"))
    val tokenScores = tok
      .join(broadcast(model), "bucket")
      .groupBy(idCol)
      .agg(sum(col("w")).as("token_score"))
    docs.select(col(idCol))
      .join(tokenScores, Seq(idCol), "left")
      .crossJoin(broadcast(prior)) // 1 row: class prior
      .select(
        col(idCol),
        (col("prior") +
          coalesce(col("token_score"), lit(0).cast("decimal(28,12)"))).as("score"))
      .withColumn("accept", col("score") > 0)
  }

  /** K-fold cross-validation of the NB filter with the FOLD AS A DATA
    * DIMENSION: one token pass computes per-(fold, bucket) counts;
    * each fold's train-set model is then total-minus-fold SUBTRACTION
    * (exact integers), so all K models materialize in one aggregation
    * instead of K separate train/score plan branches. Bit-identical
    * to looping [[nbTrain]]/[[nbScore]] per fold: the train counts,
    * the bucket-present-in-train filter (scoring inner-joins the
    * model, so unseen buckets drop), the 12dp log-odds rounding and
    * the decimal score sums are all the same arithmetic — only the
    * plan shape changes (measured 62 → ~15 jobs on q_l69).
    *
    * `labeled` carries (idCol, textCol, foldCol in [0, nFolds),
    * truthCol 1/0). Returns one row per fold:
    * (fold, n_eval, n_correct).
    */
  def nbCrossVal(
      labeled: DataFrame, idCol: String, textCol: String,
      foldCol: String, truthCol: String, nFolds: Int, buckets: Int): DataFrame = {
    val tok = labeled
      .select(col(idCol), col(foldCol).as("fold"), col(truthCol).as("truth"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .select(col(idCol), col("fold"), col("truth"),
        tokenBucket(col("term"), buckets).as("bucket"))
      .localCheckpoint(false) // read by the count pass AND the scoring join
    // one aggregation: token label counts per (fold, bucket)
    val cnt = tok.groupBy("fold", "bucket")
      .agg(sum(col("truth")).cast("long").as("p"),
        sum(lit(1L) - col("truth")).cast("long").as("n"))
      .localCheckpoint(false) // tiny (nFolds·buckets), read by 3 rollups
    val btot = cnt.groupBy("bucket").agg(sum("p").as("tp"), sum("n").as("tn"))
    val ftot = cnt.groupBy("fold").agg(sum("p").as("fp"), sum("n").as("fn"))
    val folds = labeled.sparkSession.range(nFolds).select(col("id").as("fold"))
    // train counts for fold f = global minus fold f (exact integers);
    // a bucket models for f only when the TRAIN set saw it
    val model = btot.crossJoin(folds)
      .join(cnt, Seq("fold", "bucket"), "left")
      .join(broadcast(ftot), Seq("fold"))
      .select(col("fold"), col("bucket"),
        (col("tp") - coalesce(col("p"), lit(0L))).as("n_pos_b"),
        (col("tn") - coalesce(col("n"), lit(0L))).as("n_neg_b"),
        col("fp"), col("fn"))
      .crossJoin(broadcast(cnt.agg(sum("p").as("gp"), sum("n").as("gn"))))
      .filter(col("n_pos_b") + col("n_neg_b") > 0)
      .select(col("fold"), col("bucket"),
        round(
          log((col("n_pos_b") + 1.0) /
            (col("gp") - col("fp") + buckets.toDouble)) -
            log((col("n_neg_b") + 1.0) /
              (col("gn") - col("fn") + buckets.toDouble)),
          12).cast("decimal(28,12)").as("w"))
    // per-fold class-balance prior from train DOC counts (same
    // subtraction trick over the doc table)
    val dcnt = labeled.groupBy(col(foldCol).as("fold"))
      .agg(sum(col(truthCol).cast("long")).as("dp"),
        sum(lit(1L) - col(truthCol).cast("long")).as("dn"))
    val prior = dcnt
      .crossJoin(broadcast(dcnt.agg(sum("dp").as("gdp"), sum("dn").as("gdn"))))
      .select(col("fold"),
        round(log((col("gdp") - col("dp") + 1.0) / (col("gdn") - col("dn") + 1.0)), 12)
          .cast("decimal(28,12)").as("prior"))
    // score each held-out doc against ITS OWN fold's model
    val tokenScores = tok
      .join(model, Seq("fold", "bucket"))
      .groupBy(col(idCol)).agg(sum(col("w")).as("token_score"))
    labeled.select(col(idCol), col(foldCol).as("fold"), col(truthCol).as("truth"))
      .join(tokenScores, Seq(idCol), "left")
      .join(broadcast(prior), Seq("fold"))
      .select(col("fold"), col("truth"),
        ((col("prior") +
          coalesce(col("token_score"), lit(0).cast("decimal(28,12)"))) > 0)
          .as("accept"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_eval"),
        sum((col("accept") === (col("truth") === 1)).cast("long")).as("n_correct"))
  }

  /** Laplace(1) class-balance prior from seed doc counts, as a 1-row
    * broadcastable frame: ln((n_pos_docs+1)/(n_neg_docs+1)).
    */
  def nbPrior(seedDocs: DataFrame, labelCol: String): DataFrame =
    seedDocs
      .agg(
        sum(col(labelCol).cast("long")).as("n_pos"),
        sum(lit(1L) - col(labelCol).cast("long")).as("n_neg"))
      .select(
        round(log((col("n_pos") + 1.0) / (col("n_neg") + 1.0)), 12)
          .cast("decimal(28,12)").as("prior"))
}
