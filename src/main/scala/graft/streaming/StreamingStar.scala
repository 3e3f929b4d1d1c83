package graft.streaming

import graft.app.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous ingestion of the SAME daily pipeline (SURVEY §2.9's
  * stretch goal, made concrete): each micro-batch of staging-shaped
  * rows is applied onto the running star via
  * `Pipeline.incrementalBatch` — so streaming and batch share one code
  * path and one set of semantics (SCD2 routing, identity-preserving
  * fact merge, touched-only bridge rebuild), instead of a parallel
  * streaming implementation that could drift.
  *
  * State = the star itself. Each applied batch is materialized
  * (localCheckpoint) so the lineage does not grow across batches —
  * the streaming analogue of the reference's per-run warehouse commit.
  * `asOfForBatch` pins event-time per micro-batch (deterministic
  * replay in tests; wall-clock in production).
  *
  * At scale this runs with foreachBatch writing dynamic-overwrite
  * parquet partitions instead of holding frames — the composition is
  * identical, only the sink changes.
  */
final class StreamingStar(initial: Pipeline.Dwh, asOfForBatch: Long => String) {

  @volatile private var current: Pipeline.Dwh = initial

  /** The star as of the last completed micro-batch. */
  def dwh: Pipeline.Dwh = current

  private def materialize(d: Pipeline.Dwh): Pipeline.Dwh =
    Pipeline.Dwh(
      d.dimJob.localCheckpoint(), d.dimCompany.localCheckpoint(),
      d.dimLocation.localCheckpoint(), d.dimDate.localCheckpoint(),
      d.fact.localCheckpoint(), d.bridge.localCheckpoint())

  /** Apply one micro-batch (also usable directly in tests). */
  def applyBatch(batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      current = materialize(
        Pipeline.incrementalBatch(current, batch, asOfForBatch(batchId)))
    }

  /** Start consuming a staging-shaped stream. */
  def start(stagingStream: DataFrame): StreamingQuery =
    stagingStream.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) => applyBatch(batch, id))
      .start()
}
