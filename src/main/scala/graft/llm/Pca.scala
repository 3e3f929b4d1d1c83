package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PCA of the embedding column: one corpus pass builds the
  * d×d covariance matrix (the n·d² kernel every whitening / SemDeDup-
  * preprocessing step needs), then fixed-count power iterations extract
  * the top principal component against the BROADCAST matrix — nothing
  * corpus-sized moves after the covariance aggregation.
  *
  * Scale shape: the covariance self-join explodes each row into its d²
  * centered products and partial-aggregates map-side into at most d²
  * cells, so the only fact-sized shuffle carries d² partial sums per
  * map task; every iteration is vocabulary-free d²-row work. The mean
  * vector and each iterate ride broadcasts.
  *
  * Cross-engine determinism (the q_l26 exact-decimal recipe): per-dim
  * means sum DECIMAL(25,10) casts; every float-accumulation point
  * (covariance cells, matrix·vector products, the squared norm) rounds
  * its per-element double product to a fixed scale and sums DECIMAL —
  * order-independent — so both engines walk bit-identical iterates.
  * The iteration count is FIXED (semantics = "t power steps from the
  * md5 seed", not "converged"): production would loop to tolerance,
  * the oracle-checkable contract pins t.
  */
object Pca {

  /** md5-seeded start vector component in [-1, 1) — the repo's one
    * SQL-replayable seeding recipe (Similarity.md5Weight), namespaced
    * "pc:j" so the PCA seed can never collide with the
    * hyperplane/centroid/PQ codebooks.
    */
  private[llm] def pcInit(j: Int): Double = Similarity.md5Weight(s"pc:$j")

  /** Top principal component after `iters` power steps:
    * (j 1-based, loading, lambda) with the sign fixed so loading(1) ≥ 0
    * and lambda = ‖C·v‖ of the final step (the Rayleigh estimate of
    * the top eigenvalue once iterates align).
    */
  /** d×d covariance cells (ci, cj, cov), one corpus pass.
    *
    * A single parquet file arrives as ONE partition and every op here
    * is narrow or vec_id-keyed, so parallelism must be set explicitly
    * or the whole n·d² pass serializes into one task (measured: 9.3 s
    * wall ≈ 9.5 cpu-sec, parallelism 1). The explicit vec_id exchange
    * both spreads the scan 32-way and co-partitions the self-join —
    * no further exchange follows it (PlanSpec pins this shape).
    */
  def covariance(
      emb: DataFrame, idCol: String, embCol: String,
      // pin=false keeps the centered frame's lineage visible so
      // PlanSpec can assert the exchange shape; production callers
      // leave the checkpoint on (the frame feeds both join sides)
      pin: Boolean = true): DataFrame = {
    val x1 = emb
      .select(col(idCol).as("vec_id"),
        posexplode(Similarity.asDouble(col(embCol))).as(Seq("j0", "x")))
      .select(col("vec_id"), (col("j0") + 1).as("j"), col("x"))
      // defaultParallelism, not a literal 32: the driver ALSO benches
      // at a lower core count to measure scaling (r14 optimization)
      .repartition(emb.sparkSession.sparkContext.defaultParallelism, col("vec_id"))
    val m = x1.groupBy("j")
      .agg((sum(col("x").cast(DecimalType(25, 10))).cast("double") / count(lit(1))).as("m"))
    val nFrame = emb.agg(count(lit(1)).as("n"))
    val cx0 = x1
      .join(broadcast(m), "j")
      .select(col("vec_id"), col("j"), (col("x") - col("m")).as("cx"))
    val cx = if (pin) cx0.localCheckpoint(false) else cx0
    cx.as("a")
      .join(cx.as("b"), "vec_id") // co-partitioned: d scalar pairs per key side
      .select(col("a.j").as("ci"), col("b.j").as("cj"),
        round(col("a.cx") * col("b.cx"), 10).cast(DecimalType(28, 10)).as("p"))
      .groupBy("ci", "cj")
      .agg(sum(col("p")).as("sp"))
      .crossJoin(broadcast(nFrame)) // 1 row: corpus size
      .select(col("ci"), col("cj"),
        (col("sp").cast("double") / (col("n") - 1)).as("cov"))
  }

  def topComponent(
      emb: DataFrame, idCol: String, embCol: String, dim: Int, iters: Int): DataFrame = {
    require(iters >= 1)
    val spark = emb.sparkSession
    val cov = covariance(emb, idCol, embCol)
      .localCheckpoint(false) // read once per power step
    import spark.implicits._
    var v = (1 to dim).map(j => (j.toLong, pcInit(j))).toDF("j", "v")
    var lambda: DataFrame = null
    var it = 0
    while (it < iters) {
      // pin the d²-row kernel's OUTPUT: the norm aggregate, the
      // normalized iterate, and (last step) the final select all read
      // u — without the checkpoint each consumer re-runs the cov join
      val u = cov
        .join(broadcast(v), col("cj") === col("j"))
        .select(col("ci"),
          round(col("cov") * col("v"), 12).cast(DecimalType(28, 12)).as("p"))
        .groupBy("ci")
        .agg(sum(col("p")).cast("double").as("u"))
        .localCheckpoint(false)
      lambda = u.agg(
        sqrt(sum(round(col("u") * col("u"), 12).cast(DecimalType(28, 12)))
          .cast("double")).as("nrm"))
      v = u.crossJoin(broadcast(lambda)) // 1 row: the norm
        .select(col("ci").as("j"), (col("u") / col("nrm")).as("v"))
      it += 1
    }
    val sgn = v.filter(col("j") === 1)
      .select(when(col("v") < 0, -1.0).otherwise(1.0).as("sgn"))
    v.crossJoin(broadcast(sgn)) // 1 row: sign convention
      .crossJoin(broadcast(lambda)) // 1 row: top-eigenvalue estimate
      .select(col("j").cast("long").as("j"),
        round(col("v") * col("sgn"), 6).as("loading"),
        round(col("nrm"), 6).as("lambda"))
      .orderBy("j")
  }
}
