package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One closed user session emitted by CdcStream.sessionize. */
final case class UserSession(
    user_id: Long, n_events: Long, first_ts: java.sql.Timestamp,
    last_ts: java.sql.Timestamp, total_value: Double)

/** Internal per-user session accumulator (public: Catalyst generates
  * encoder code for it, which can't see non-public classes).
  */
final case class SessionState(
    n: Long, first: java.sql.Timestamp, last: java.sql.Timestamp, value: Double)

/** Structured-Streaming face of the engine (SURVEY §2.9).
  *
  * The reference is daily batch with an append-only CDC JSONL side
  * channel; the streaming analogue exposes the same events/CDC data as
  * an unbounded source: file-source reads, event-time windowed
  * aggregation with a watermark, and streaming dedup — the operators a
  * continuous ingestion of the same pipeline would need.
  */
object CdcStream {

  /** Run `body` (which starts AND finishes a streaming query) with
    * `spark.sql.shuffle.partitions` set to the streaming value (see
    * SparkUtil.streamShufflePartitions), restoring the session conf
    * after. Structured streaming pins stateful-operator partitioning
    * from the session conf at the FIRST batch and has no AQE
    * coalescing, so this is the only way to right-size state-store
    * parallelism; batch work inside foreachBatch bodies keeps AQE and
    * is unaffected semantically (all keyed, order-insensitive ops).
    *
    * ASSUMPTION (ADVICE r14): the override mutates the SESSION-global
    * shuffle-partition conf for the stream's duration, so a CONCURRENT
    * query on the same SparkSession would silently plan under the
    * temporary value. Bench/Verify run queries strictly sequentially;
    * a deployment running concurrent streams should scope the
    * override with a cloned session (spark.newSession) per stream.
    */
  def withStreamShuffle[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, graft.SparkUtil.streamShufflePartitions(spark).toString)
    try body finally spark.conf.set(key, prev)
  }

  /** events.parquet's physical schema, probed from the files actually
    * present: the generator has shipped `ts` both as INT64 nanos
    * (surfaced as long via nanosAsLong, see SparkUtil) and as
    * TIMESTAMP(MICROS) NTZ across rounds. A file-source stream needs an
    * explicit schema, and forcing the wrong one silently reinterprets
    * the integers — so probe the batch reader's view of the same path.
    */
  def eventsSchema(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema

  /** One-time idempotent staging of the events table into a watch
    * directory (the file source watches a directory — that's the
    * production shape, new files arriving). Staging is SETUP, not query
    * work: it runs once per (source dir) per filesystem state and is
    * skipped when the marker matches, so repeated/benchmarked queries
    * don't re-pay the copy (round-2 verdict: the copy inside the query
    * body inflated q_st1 by seconds).
    */
  /** Marker-guarded staging guard shared by EVERY stager here: runs
    * `write(stagedDir)` only when the source's (mtime, length) stamp
    * changed — the marker stores that stamp, so a rewritten source
    * invalidates the staged copy instead of being silently ignored —
    * and writes the marker only after a successful (re)build. One
    * definition of the guard; each stager is just its write closure.
    */
  private def ensureStagedDir(
      spark: SparkSession, stagedDir: String, srcPath: String, version: String)(
      write: String => Unit): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val dstDir = new org.apache.hadoop.fs.Path(stagedDir)
    val fs = dstDir.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(dstDir, "_STAGED")
    val st = src.getFileSystem(conf).getFileStatus(src)
    val stamp = s"$version:${st.getModificationTime}:${st.getLen}"
    val current =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
        finally in.close()
      }
    if (!current.contains(stamp)) {
      if (fs.exists(dstDir)) fs.delete(dstDir, true)
      write(stagedDir)
      val out = fs.create(marker, true)
      try out.write(stamp.getBytes("UTF-8")) finally out.close()
    }
    stagedDir
  }

  /** Copy `srcPath` into `stagedDir` as a single file named `name`. */
  private def copyFileInto(
      spark: SparkSession, stagedDir: String, srcPath: String, name: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val dstDir = new org.apache.hadoop.fs.Path(stagedDir)
    val fs = dstDir.getFileSystem(conf)
    fs.mkdirs(dstDir)
    org.apache.hadoop.fs.FileUtil.copy(
      src.getFileSystem(conf), src, fs,
      new org.apache.hadoop.fs.Path(dstDir, name), false, conf)
  }

  def ensureStaged(spark: SparkSession, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]+", "_")
    ensureStagedDir(spark, s"/root/repo/target/tmp/stream_events_watch/$key",
        s"$dir/events.parquet", "v2") { staged =>
      copyFileInto(spark, staged, s"$dir/events.parquet", "events.parquet")
    }
  }

  /** Stage the ARRIVING slice of the documents table (doc_id % 5 = 0,
    * q_l22's batch convention) into a watch dir as `nFiles` separate
    * parquet files — with `maxFilesPerTrigger = 1` the file source
    * then delivers them as nFiles genuine micro-batches, which is the
    * continuous-ingest shape q_st15 exists to pin. Range-partitioned
    * by doc_id so the file split is deterministic. Idempotent and
    * marker-guarded like every staging helper here.
    */
  def ensureStagedDocBatches(spark: SparkSession, dir: String, nFiles: Int = 4): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]+", "_")
    ensureStagedDir(spark, s"/root/repo/target/tmp/stream_docs_watch/$key",
        s"$dir/documents.parquet", s"v1:$nFiles") { staged =>
      graft.Tables.documents(spark, dir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
        .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("doc_id"))
        .write.mode("overwrite").parquet(staged)
    }
  }

  /** Watch dir for the streaming pack-append twin (q_st19): the
    * arriving slice (doc_id % 5 = 0) split into `nFiles` EXPLICIT
    * micro-batches by (doc_id div 5) % nFiles. Unlike the range split
    * of [[ensureStagedDocBatches]] (sampled boundaries), this
    * assignment is a pure function of doc_id that the SQL oracle can
    * replay — and shard numbering continuity across micro-batches
    * depends on arrival ORDER, so each batch is written as one file
    * with BOTH name and mtime ascending in batch index: the file
    * source's (timestamp, path) ordering then delivers batch 0..n-1
    * deterministically under maxFilesPerTrigger=1.
    */
  def ensureStagedDocBatchesIndexed(
      spark: SparkSession, dir: String, nFiles: Int = 4): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]+", "_")
    ensureStagedDir(spark, s"/root/repo/target/tmp/stream_docs_idx_watch/$key",
        s"$dir/documents.parquet", s"v1:$nFiles") { staged =>
      import org.apache.spark.sql.functions._
      val docs = graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 5 === 0)
      val conf = spark.sparkContext.hadoopConfiguration
      val dst = new org.apache.hadoop.fs.Path(staged)
      val fs = dst.getFileSystem(conf)
      (0 until nFiles).foreach { b =>
        val tmp = s"$staged/__tmp_b$b"
        docs.filter(expr(s"pmod(doc_id div 5, $nFiles)") === b)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).filter(_.getName.endsWith(".parquet"))
          .sortBy(_.getName).headOption
          .getOrElse(sys.error(s"no part file written for batch $b"))
        val out = new org.apache.hadoop.fs.Path(dst, f"batch_$b%02d.parquet")
        if (fs.exists(out)) fs.delete(out, false)
        fs.rename(part, out)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
        // fixed epoch base keeps the staged dir byte-identical across
        // runs (the marker guard skips re-staging); 60 s spacing keeps
        // every file inside the source's maxFileAge window
        fs.setTimes(out, 1000000000000L + b * 60000L, -1)
      }
    }
  }

  /** Watch dir carrying the FULL embeddings table as `nFiles`
    * range-partitioned files — the arrival stream for sketch-state
    * convergence checks over the vector column (q_st17). Marker-
    * guarded like `ensureStagedDocBatches`.
    */
  def ensureStagedEmbBatches(spark: SparkSession, dir: String, nFiles: Int = 4): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]+", "_")
    ensureStagedDir(spark, s"/root/repo/target/tmp/stream_emb_watch/$key",
        s"$dir/embeddings.parquet", s"v1:$nFiles") { staged =>
      graft.Tables.embeddings(spark, dir)
        .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("vec_id"))
        .write.mode("overwrite").parquet(staged)
    }
  }

  /** Watch dir with a sentinel event appended 10 days past max(ts)
    * (user −1): append-mode session_window only emits sessions the
    * watermark has passed, and a bounded stream's watermark stops at
    * max(ts) − delay — the sentinel advances it past every real
    * session while its own open session is never emitted. Idempotent
    * and marker-guarded like `ensureStaged`, so benchmarked queries
    * don't re-pay the copy per pass.
    */
  def ensureStagedWithSentinel(spark: SparkSession, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9]+", "_")
    ensureStagedDir(spark, s"/root/repo/target/tmp/stream_events_sentinel/$key",
        s"$dir/events.parquet", "v2") { staged =>
      copyFileInto(spark, staged, s"$dir/events.parquet", "events.parquet")
      sentinelDf(spark, dir).write.mode("append").parquet(staged)
    }
  }

  /** The three-act late-data fixture, staged once (marker-guarded) per
    * source dir: act 1 = the even-event_id half of events (delivered
    * on time), act 2 = one sentinel event 10 days past the end (its
    * only job is to drag the watermark beyond every real window), act
    * 3 = the odd half — which, delivered after the sentinel's batch,
    * is entirely beyond-watermark late and must be DROPPED by an
    * append-mode windowed aggregation. Each act is its own directory;
    * `runActs` feeds them to a running query one micro-batch at a
    * time.
    */
  def ensureStagedLateActs(spark: SparkSession, dir: String): Seq[String] = {
    val key = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val baseDir = ensureStagedDir(spark,
        s"/root/repo/target/tmp/stream_late_acts/$key",
        s"$dir/events.parquet", "v1") { staged =>
      val events = spark.read.parquet(s"$dir/events.parquet")
      events.filter(col("event_id") % 2 === 0).write.parquet(s"$staged/act1")
      sentinelDf(spark, dir).write.parquet(s"$staged/act2")
      events.filter(col("event_id") % 2 =!= 0).write.parquet(s"$staged/act3")
    }
    Seq(s"$baseDir/act1", s"$baseDir/act2", s"$baseDir/act3")
  }

  /** Drive a streaming aggregation over the acts IN ORDER, one
    * micro-batch boundary between acts (copy files in, then
    * processAllAvailable — the watermark advances at each batch end,
    * which is exactly the contract under test). The per-run watch dir
    * is deleted afterwards.
    */
  def runActs(spark: SparkSession, acts: Seq[String],
      makeAgg: DataFrame => DataFrame, name: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val watchDir = s"/root/repo/target/tmp/stream_late_run/${java.util.UUID.randomUUID()}"
    val watch = new org.apache.hadoop.fs.Path(watchDir)
    val fs = watch.getFileSystem(conf)
    fs.mkdirs(watch)
    try withStreamShuffle(spark) {
      val stream = graft.Tables.normalizeTs(
        spark.readStream.schema(eventsSchema(spark, acts.head)).parquet(watchDir))
      val q = makeAgg(stream).writeStream
        .outputMode("append").format("memory").queryName(name).start()
      try {
        acts.zipWithIndex.foreach { case (act, i) =>
          val actPath = new org.apache.hadoop.fs.Path(act)
          fs.listStatus(actPath).filter(_.getPath.getName.endsWith(".parquet")).foreach { f =>
            org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath, fs,
              new org.apache.hadoop.fs.Path(watch, s"act${i}_${f.getPath.getName}"),
              false, conf)
          }
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name)
    } finally fs.delete(watch, true)
  }

  /** One far-future row (user/event −1, ts = max + 10 days) in the
    * SAME physical ts type as the source files — a long row next to
    * micros rows (or vice versa) would corrupt a forced schema read.
    */
  private def sentinelDf(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/events.parquet")
    val tsType = base.schema("ts").dataType
    val sentinelTs = tsType match {
      case LongType => col("m") + lit(864000L * 1000000000L) // +10 days in nanos
      case t        => (col("m") + expr("INTERVAL 10 DAYS")).cast(t)
    }
    base.agg(max(col("ts")).as("m")).select(
      lit(-1L).as("event_id"),
      sentinelTs.as("ts"),
      lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
      lit(0.0).as("value"), lit(null).cast("string").as("props"))
  }

  /** Unbounded read of a staged watch directory (see `ensureStaged`):
    * schema probed from the staged files, ts normalized to a UTC
    * timestamp whichever encoding the generator used.
    */
  def readEvents(spark: SparkSession, watchDir: String): DataFrame =
    graft.Tables.normalizeTs(
      spark.readStream.schema(eventsSchema(spark, watchDir)).parquet(watchDir))

  /** Event-time daily windowed aggregation with a watermark. */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Streaming dedup: first event per event_id within the watermark
    * horizon survives (the crawler's ON CONFLICT DO NOTHING, unbounded).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day").dropDuplicates("event_id")

  /** Bounded-state streaming dedup: `dropDuplicatesWithinWatermark`
    * EVICTS a key's dedup state once the watermark passes its event
    * time + delay — the 100 TB shape (plain dropDuplicates keeps every
    * key forever; over an unbounded CDC feed that state only grows).
    * The contract weakens accordingly: only redeliveries arriving
    * within the watermark delay collapse, which is exactly the
    * at-least-once-source guarantee it exists to absorb.
    */
  def dedupStreamBounded(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 days").dropDuplicatesWithinWatermark("event_id")

  /** Exactly-once file sink via foreachBatch: each micro-batch lands as
    * its own `batch_id=<n>` subdirectory with mode("overwrite"), so a
    * RETRIED batch (failure between write and commit) overwrites its
    * own partition instead of duplicating rows — the standard
    * idempotent-writeback pattern for sinks without transactions.
    * Returns the sink path; the finished table is the union of the
    * batch partitions.
    */
  def runForeachBatchToDir(spark: SparkSession, events: DataFrame, outDir: String): String =
    runForeachBatchTransform(spark, events, outDir)(identity)

  /** foreachBatch with a per-micro-batch BATCH transform — the
    * production enrichment shape: inside foreachBatch the frame is a
    * plain DataFrame, so the full batch operator library (including
    * the custom Catalyst as-of exec, q_st12) applies per batch, with
    * the same overwrite-own-partition idempotence as the plain sink
    * (a retried batch id rewrites its own directory, never doubles).
    */
  def runForeachBatchTransform(
      spark: SparkSession, events: DataFrame, outDir: String)(
      transform: DataFrame => DataFrame): String =
    runForeachBatchTransformWithId(spark, events, outDir)((b, _) => transform(b))

  /** [[runForeachBatchTransform]] variant handing the transform the
    * micro-batch id — for operators whose per-batch work must be
    * keyed by batch identity (e.g. q_st19's append-offset ledger,
    * where a RETRIED batch must not advance the token base twice).
    */
  /** foreachBatch runner for maintenance sinks whose per-batch output
    * is not ONE dataframe (multi-sidecar table upkeep like q_st21's
    * DV-append + conditional compaction): the body receives the batch
    * and its id and performs its own overwrite-own-batch-dir writes,
    * which is what makes a replayed batch land value-identical.
    */
  def runForeachBatchEffect(spark: SparkSession, events: DataFrame)(
      body: (DataFrame, Long) => Unit): Unit = withStreamShuffle(spark) {
    val q = events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        body(batch, batchId)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  def runForeachBatchTransformWithId(
      spark: SparkSession, events: DataFrame, outDir: String)(
      transform: (DataFrame, Long) => DataFrame): String = withStreamShuffle(spark) {
    val conf = spark.sparkContext.hadoopConfiguration
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = out.getFileSystem(conf)
    if (fs.exists(out)) fs.delete(out, true) // fresh run, stale batches poison the union
    val q = events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        transform(batch, batchId).write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    outDir
  }


  /** Batch-id-keyed append-offset ledger for streaming pack-append
    * (q_st19): each micro-batch packs shards at the cumulative token
    * base and then advances it. Replay safety is double-sided —
    * [[baseFor]] hands a RETRIED batch the base it ORIGINALLY packed
    * at (not the since-advanced cum), so its overwrite-own-partition
    * output rewrites value-identical, and [[advance]] is a no-op on
    * a batch id it has already applied, so the base never advances
    * twice. Restart-safe deployments persist both maps next to the
    * streaming checkpoint.
    */
  final class AppendBaseLedger(initial: Long) {
    private val packBase =
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
    private val applied =
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
    private val cum = new java.util.concurrent.atomic.AtomicLong(initial)

    /** The token base this batch packs at — first call pins the
      * current cum; every later call (a replay) returns that pin.
      */
    def baseFor(batchId: Long): Long = {
      packBase.putIfAbsent(batchId, cum.get)
      packBase.get(batchId)
    }

    /** Advance the base by this batch's token total — no-op if the
      * batch id was already applied (retry).
      */
    def advance(batchId: Long, tokens: Long): Unit =
      if (applied.putIfAbsent(batchId, tokens) == null) { cum.addAndGet(tokens); () }

    /** The standing cumulative token base. */
    def current: Long = cum.get
  }

  /** Distributed sessionization via the built-in `session_window`
    * aggregation — the PRODUCTION-SCALE path: no per-user in-memory
    * materialization (state is the window store, merged incrementally),
    * works identically over batch and streaming frames (streaming
    * callers add `withWatermark` before, batch callers don't).
    * `sessionize` below keeps the custom flatMapGroupsWithState
    * surface for state machines session_window can't express; its
    * per-(user, micro-batch) sort is the documented heavy-key bound.
    */
  def sessionizeNative(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        sum(col("value")).as("total_value"))
      .select("user_id", "n_events", "first_ts", "last_ts", "total_value")

  /** Custom streaming state via flatMapGroupsWithState: per-user
    * sessions that close after `gapMinutes` of event-time silence —
    * the stateful-operator surface (mapGroupsWithState family) a
    * continuous CDC ingest of the pipeline would use. NB: scale users
    * should prefer `sessionizeNative`; this variant buffers and sorts
    * one user's micro-batch slice in memory (bounded by batch size ×
    * per-user volume — the round-2 verdict's heavy-key caveat).
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val typed = events
      .withWatermark("ts", "1 day")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(user, s.n, s.first, s.last, s.value))
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v) =>
              cur match {
                case Some(s) if ts.getTime - s.last.getTime <= gapMs =>
                  cur = Some(SessionState(s.n + 1, s.first, ts, s.value + v))
                case Some(s) =>
                  closed ::= UserSession(user, s.n, s.first, s.last, s.value)
                  cur = Some(SessionState(1, ts, ts, v))
                case None =>
                  cur = Some(SessionState(1, ts, ts, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapMs)
            }
            closed.reverseIterator
          }
      }
      .toDF()
  }

  /** Stream-stream interval join: each purchase pairs with the same
    * user's views in the preceding `windowMinutes` — the canonical
    * "attribute conversions to recent impressions" shape. Both sides
    * carry watermarks so the join STATE is bounded (a view older than
    * watermark + window can never match again and is evicted); the
    * match emission itself is exactly-once in append mode, so the
    * complete output over a bounded source equals the batch interval
    * join — which is what the q_st5 oracle checks.
    */
  def purchaseViewJoin(events: DataFrame, windowMinutes: Int): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 day")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val v = events.filter(col("event_type") === "view")
      .withWatermark("ts", "1 day")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"),
      "inner")
  }

  /** Streaming UPSERT into a keyed state table via foreachBatch: each
    * micro-batch's per-key LAST event (by ts, event_id) merges
    * last-wins into a parquet snapshot — the reference's daily fact
    * upsert running continuously against a serving store.
    *
    * Crash-safety is VERSIONED, not delete-then-rename (which has a
    * window where a crash loses every prior batch): each merge writes
    * an immutable `v<batchId>` directory, then commits by renaming a
    * freshly-written pointer file over `_LATEST`. Versions are never
    * mutated, so a crash at ANY point leaves either the old pointer
    * (state = previous version, the uncommitted merge re-runs
    * idempotently — last-wins over identical input is a no-op) or the
    * new pointer (batch already durable). A missing/half-written
    * pointer recovers by listing the highest version. Readers always
    * resolve through the pointer, so they never observe a
    * half-written table. Over a bounded source the final state equals
    * the batch last-wins query — the q_st9 oracle. Returns the
    * committed snapshot dir.
    */
  def runMergeToStateTable(spark: SparkSession, events: DataFrame, baseDir: String): String = withStreamShuffle(spark) {
    import org.apache.spark.sql.expressions.Window
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(baseDir)
    val fs = base.getFileSystem(conf)
    if (fs.exists(base)) fs.delete(base, true)
    fs.mkdirs(base)
    val pointer = new org.apache.hadoop.fs.Path(base, "_LATEST")
    def committedVersion(): Option[String] = {
      if (fs.exists(pointer)) {
        val in = fs.open(pointer)
        try {
          val v = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          if (v.nonEmpty) return Some(v)
        } finally in.close()
      }
      // pointer lost mid-commit: recover from the immutable version list
      if (!fs.exists(base)) None
      else fs.listStatus(base).map(_.getPath.getName)
        .filter(_.startsWith("v")).sortBy(n => n.drop(1).toLong).lastOption
    }
    val q = events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val delta = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .select(col("user_id"), col("ts").as("last_ts"),
            col("event_type").as("last_type"), col("event_id").as("last_id"))
        val merged = committedVersion() match {
          case Some(v) =>
            val old = spark.read.parquet(new org.apache.hadoop.fs.Path(base, v).toString)
            val wAll = Window.partitionBy("user_id")
              .orderBy(col("last_ts").desc, col("last_id").desc)
            old.unionByName(delta)
              .withColumn("__rn", row_number().over(wAll))
              .filter(col("__rn") === 1).drop("__rn")
          case None => delta
        }
        merged.write.mode("overwrite").parquet(
          new org.apache.hadoop.fs.Path(base, s"v$batchId").toString)
        // commit: tmp pointer + rename (atomic on HDFS-like stores)
        val tmp = new org.apache.hadoop.fs.Path(base, s"_LATEST.v$batchId.tmp")
        val out = fs.create(tmp, true)
        try out.write(s"v$batchId".getBytes("UTF-8")) finally out.close()
        if (fs.exists(pointer)) fs.delete(pointer, false)
        fs.rename(tmp, pointer)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val v = committedVersion().getOrElse(
      throw new IllegalStateException(s"no committed state version under $baseDir"))
    new org.apache.hadoop.fs.Path(base, v).toString
  }

  /** CDC delete handling over the last-wins state table: a designated
    * event type is a TOMBSTONE (account deletion). Tombstones must be
    * RETAINED in the state across batches — physically dropping one
    * would let a later-arriving OLDER event resurrect the user, so
    * last-wins stays associative only with the tombstone in place.
    * Physical removal (compaction) is safe exactly when the watermark
    * has passed the tombstone's timestamp (no older data can still
    * arrive); with a bounded source that is stream end, which is when
    * this runs. Tombstones newer than `horizonUs` survive compaction
    * and keep masking their user; visible readers filter the type out
    * regardless.
    */
  def compactTombstones(
      state: DataFrame, tombstoneType: String, horizonUs: Long): DataFrame =
    state.filter(col("last_type") =!= tombstoneType ||
      unix_micros(col("last_ts")) >= horizonUs)

  /** Run a streaming aggregation to completion over the (bounded) file
    * source via a memory sink and return the result table — lets batch
    * oracles check streaming semantics.
    */
  def runToMemory(spark: SparkSession, agg: DataFrame, name: String,
      mode: String = "complete"): DataFrame = withStreamShuffle(spark) {
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
