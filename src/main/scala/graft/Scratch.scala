package graft

import java.nio.file.{Files, Paths}

/** Dev scratch main: with no args, environment smoke checks; with
  * `<sfDir> <outDir> name...`, a filtered Verify (only the named
  * queries) for fast oracle iteration via tools/selfcheck.py.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    // dump-oracles <outFile>: write the full registry's oracle_sql.json
    // WITHOUT running any query — feeds tools/oracle_walls.py, which
    // times each oracle in DuckDB for BENCH_DETAIL's per-query ratios.
    if (args.headOption.contains("dump-oracles")) {
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(args(1)), json)
      println(s"[scratch] wrote ${SparkEntry.oracleSql.size} oracles to ${args(1)}")
      return
    }
    val spark = SparkUtil.local()
    if (args.length >= 3 && !args(0).startsWith("profile-") &&
        !args(0).startsWith("dump-")) {
      val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
      new java.io.File(outDir).mkdirs()
      SparkEntry.queries.filter(kv => names.contains(kv._1)).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          println(f"[scratch] $name ok in ${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch { case e: Throwable =>
          println(s"[scratch] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
        }
      }
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    } else if (args.headOption.contains("profile-recall")) {
      // Measured recall of the approximate family vs exact ground
      // truth, at the given SF (the driver ships sf0.1 as its largest).
      //  - ANN (q_l6 LSH / q_l12 IVF): recall@5 against the exact
      //    brute-force top-5 (q_l5's operator) over the full corpus
      //    and the registered query set.
      //  - near-dup pairs (q_l2 MinHash / q_l13 winnow sketch): the
      //    operator runs on the FULL corpus (so its corpus-dependent
      //    doc-frequency cap and rare-key sketch behave exactly as
      //    registered); ground truth is uncapped complete-blocking
      //    exact Jaccard on a deterministic ~5% sample, and recall is
      //    counted over truth pairs with BOTH ends in the sample.
      import org.apache.spark.sql.functions._
      import graft.llm.{Dedup, Similarity}
      val dir = args(1)
      val emb = Tables.embeddings(spark, dir)
      val annQueries = emb.filter(col("vec_id") < 20)
      val exact = Similarity
        .bruteForceTopK(annQueries, emb, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id").localCheckpoint(false)
      val exactN = exact.count()
      def annRecall(name: String, ann: org.apache.spark.sql.DataFrame): Unit = {
        val hit = exact.join(ann.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count()
        println(f"[recall] $name%-24s hits=$hit/$exactN recall@5=${hit.toDouble / exactN}%.3f")
      }
      annRecall("q_l6_ann_lsh",
        Similarity.lshTopK(annQueries, emb, "vec_id", "embedding", k = 5, nPlanes = 4))
      annRecall("q_l6b_ann_lsh_multiprobe",
        Similarity.lshTopKMultiProbe(annQueries, emb, "vec_id", "embedding", k = 5, nPlanes = 4))
      annRecall("q_l12_ann_ivf",
        Similarity.ivfTopK(annQueries, emb, "vec_id", "embedding", k = 5, nCells = 8, nProbe = 2))

      val docs = Tables.documents(spark, dir)
      // arg(2) = sample modulus (1 = full-corpus ground truth)
      val mod = if (args.length > 2) args(2).toInt else 1
      val sample = docs.filter(pmod(xxhash64(col("doc_id")), lit(mod)) === 0)
        .localCheckpoint(false)
      println(s"[recall] sample docs = ${sample.count()} of ${docs.count()}")
      val ids = sample.select(col("doc_id"))
      def pairRecall(name: String, truth: org.apache.spark.sql.DataFrame,
          found: org.apache.spark.sql.DataFrame): Unit = {
        val t = truth.select("id_a", "id_b").localCheckpoint(false)
        val f = found.select("id_a", "id_b")
          .join(ids.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
          .join(ids.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
        val nT = t.count(); val hit = t.join(f, Seq("id_a", "id_b")).count()
        println(f"[recall] $name%-24s hits=$hit/$nT recall=${
          if (nT == 0) Double.NaN else hit.toDouble / nT}%.3f")
      }
      pairRecall("q_l2_minhash",
        Dedup.exactPairsUncapped(
          sample.select(col("doc_id").as("__id"),
            explode(Dedup.shingles(col("text"), 3)).as("s")), "s", 0.8),
        Dedup.minhashNearDupPairs(docs, "doc_id", "text",
          shingleN = 3, perms = 128, bands = 32, threshold = 0.8))
      pairRecall("q_l13_winnow",
        Dedup.exactPairsUncapped(
          Dedup.winnowExplodedForProfile(sample, "doc_id", "text", 7, 4, Int.MaxValue)
            .select(col("fp"), col("__id")), "fp", 0.5),
        Dedup.winnowNearDupPairs(docs, "doc_id", "text",
          k = 7, w = 4, threshold = 0.5, maxDocFreq = 500))
    } else if (args.headOption.contains("profile-winnow")) {
      import org.apache.spark.sql.functions._
      val dir = args(1)
      def t[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val docs = Tables.documents(spark, dir)
      t("docs warm")(docs.write.format("noop").mode("overwrite").save())
      val exploded = t("winnow UDF + cap + checkpoint") {
        val e = graft.llm.Dedup.winnowExplodedForProfile(docs, "doc_id", "text", 7, 4, 500)
        e.count(); e
      }
      t("full query (2nd run)")(graft.llm.Dedup.winnowNearDupPairs(docs, "doc_id", "text", 7, 4, 0.5, 500)
        .write.format("noop").mode("overwrite").save())
      t("full query")(graft.llm.Dedup.winnowNearDupPairs(docs, "doc_id", "text", 7, 4, 0.5, 500)
        .write.format("noop").mode("overwrite").save())
    } else if (args.headOption.contains("profile-e2e")) {
      // phase timing for the e2e star build at the given sf dir
      import org.apache.spark.sql.functions._
      val dir = args(1)
      def t[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val q = SparkEntry.queries
      t("warm lineitem")(graft.Tables.lineitem(spark, dir).write.format("noop").mode("overwrite").save())
      val raw = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(spark.read.parquet(s"$dir/nation.parquet")), col("c_nationkey") === col("n_nationkey"))
        .select(col("o_orderkey").cast("string").as("job_id"),
          concat(lit("Engineer "), col("o_orderpriority"), lit(" - Urgent")).as("title"),
          col("c_name").as("company_name"),
          concat(lit("từ "), (col("o_orderkey") % 20 + 5), lit(" triệu")).as("salary"),
          col("n_name").as("location"), lit(null).cast("string").as("location_detail"),
          (col("o_orderkey") % 30 + 1).cast("string").as("deadline"),
          lit("1 ngày trước").as("last_update"), col("o_orderdate").as("crawled_at"),
          concat(lit("https://jobs/"), col("o_orderkey")).as("job_url"),
          lit("[\"Spark\"]").as("skills"), lit(null).cast("string").as("logo_url"),
          concat(lit("https://co/"), col("c_custkey")).as("company_url"),
          (col("c_custkey") % 2 === 0).as("verified_employer"))
      // per-function cost attribution over the same repartitioned input
      val now = to_timestamp(lit("2026-08-12 00:00:00"))
      val base = raw.repartition(32).localCheckpoint()
      t("noop pass")(base.write.format("noop").mode("overwrite").save())
      t("F6/F7 location UDFs")(base
        .withColumn("lp", graft.functions.LocationFns.extractLocationInfo(col("location_detail")))
        .withColumn("loc2", graft.functions.LocationFns.refineLocation(col("location"), col("lp")))
        .write.format("noop").mode("overwrite").save())
      t("F4 clean_title")(base
        .withColumn("tc", graft.functions.TextFns.cleanTitle(col("title")))
        .write.format("noop").mode("overwrite").save())
      t("F5 clean_company")(base
        .withColumn("cn", graft.functions.TextFns.cleanCompanyName(col("company_name")))
        .write.format("noop").mode("overwrite").save())
      t("F1 salary x3 fields")(
        { val s = graft.functions.SalaryFns.normalizeSalary(col("salary"))
          base.withColumn("a", s.getField("salary_min")).withColumn("b", s.getField("salary_max"))
            .withColumn("c", s.getField("salary_type"))
            .write.format("noop").mode("overwrite").save() })
      t("F2/F3/F11-F13 time fns")(base
        .withColumn("dd", graft.functions.TimeFns.dueDate(lit(null).cast("timestamp"), col("crawled_at"), col("deadline")))
        .withColumn("tr", graft.functions.TimeFns.timeRemaining(col("dd"), now))
        .withColumn("pt", graft.functions.TextFns.postedTime(graft.functions.TextFns.parseLastUpdate(col("last_update")), now))
        .withColumn("lm", graft.functions.TimeFns.loadMonth(col("crawled_at"), now))
        .write.format("noop").mode("overwrite").save())
      val staging = t("rawToStaging build+checkpoint") {
        val s0 = graft.app.Pipeline.rawToStaging(raw, "2026-08-12 00:00:00")
        val c = s0.localCheckpoint(); c.count(); c
      }
      val dwh = t("stagingToDwh plan (incl staging ckpt again)")(
        graft.app.Pipeline.stagingToDwh(staging, "2026-08-12"))
      t("dims count")(println((dwh.dimJob.count(), dwh.dimCompany.count(), dwh.dimLocation.count())))
      t("fact count")(println(dwh.fact.count()))
      t("fact agg")(println(dwh.fact.groupBy("load_month").count().count()))
      t("bridge count")(println(dwh.bridge.count()))
    } else if (args.headOption.contains("profile-repeat")) {
      // repeat the incremental apply N times in one JVM; telemetry per
      // iteration + optional unpersist-sweep to isolate what accumulates
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.Column
      val dir = args(1)
      val sweep = args.contains("sweep")
      val iters = 4
      val sc = spark.sparkContext
      // the EXACT scenario q_e2e_incremental benches — reuse its batch
      // definitions so profile numbers stay attributable to the query
      val b2 = graft.queries.DwhQueries.incStagingBatches(spark, dir)._2
      val dwh1 = graft.queries.DwhQueries.prevDwh(spark, dir)
      val protectedIds = sc.getPersistentRDDs.keySet
      // per-iteration job/stage/task counters to split "more work" from
      // "same work, slower"
      val nJobs = new java.util.concurrent.atomic.AtomicLong
      val nStages = new java.util.concurrent.atomic.AtomicLong
      val nTasks = new java.util.concurrent.atomic.AtomicLong
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          nStages.incrementAndGet()
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          nTasks.incrementAndGet()
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        }
      })
      for (i <- 1 to iters) {
        val j0 = nJobs.get; val s0 = nStages.get; val k0 = nTasks.get; val m0 = taskMs.get
        val t0 = System.nanoTime()
        graft.app.Pipeline.incrementalBatch(dwh1, b2, "2026-08-03")
          .fact.groupBy("load_month", "date_id").agg(count(lit(1)).as("n_facts"))
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val rt = Runtime.getRuntime
        println(f"[repeat] iter=$i t=$sec%.1f s heapMB=${(rt.totalMemory - rt.freeMemory) / (1 << 20)} " +
          f"cachedRdds=${sc.getPersistentRDDs.size} " +
          f"storageMB=${sc.getRDDStorageInfo.map(_.memSize).sum / (1 << 20)} " +
          f"jobs=${nJobs.get - j0} stages=${nStages.get - s0} tasks=${nTasks.get - k0} " +
          f"taskSec=${(taskMs.get - m0) / 1000.0}%.1f")
        if (sweep) {
          sc.getPersistentRDDs.filterNot(kv => protectedIds(kv._1)).values
            .foreach(_.unpersist(false))
          System.gc()
        }
      }
    } else if (args.headOption.contains("explain-inc")) {
      // does the executed incremental plan reuse the routing-join
      // subtrees (ReusedExchange/ReusedSubquery), or pay them per
      // consumer? (code-review finding: applyBatch has 3 consumers of
      // the routed frame, mergeFactsAssigning 2 of the merge join)
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val b2 = graft.queries.DwhQueries.incStagingBatches(spark, dir)._2
      val dwh1 = graft.queries.DwhQueries.prevDwh(spark, dir)
      val fact = graft.app.Pipeline.incrementalBatch(dwh1, b2, "2026-08-03").fact
      fact.write.format("noop").mode("overwrite").save()
      val plan = fact.queryExecution.executedPlan.toString
      def count(pat: String) = pat.r.findAllIn(plan).size
      println(s"[explain-inc] ReusedExchange=${count("ReusedExchange")} " +
        s"Exchange=${count("Exchange")} BroadcastExchange=${count("BroadcastExchange")} " +
        s"SortMergeJoin=${count("SortMergeJoin")} BroadcastHashJoin=${count("BroadcastHashJoin")} " +
        s"TableCacheQueryStage=${count("TableCacheQueryStage")}")
    } else if (args.headOption.contains("bench-md5")) {
      // isolate the per-gram MessageDigest cost that dominates winnow
      val text = ("the quick brown fox jumps over the lazy dog " * 8).take(297)
      val bytes = text.getBytes("UTF-8")
      val md = java.security.MessageDigest.getInstance("MD5")
      val buf = new Array[Byte](16)
      val n = 1500000
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        var i = 0
        var acc = 0L
        while (i < n) {
          md.reset()
          md.update(bytes, i % 290, 7)
          md.digest(buf, 0, 16)
          acc += buf(0)
          i += 1
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[md5] round $round: $n digests in $sec%.2f s (${sec / n * 1e9}%.0f ns each, acc=$acc)")
      }
    } else if (args.headOption.contains("profile-l3")) {
      // isolate q_l3's cost components, warm (2nd run of each)
      import org.apache.spark.sql.functions._
      val dir = args(1)
      def t[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val docs = Tables.documents(spark, dir)
      t("docs warm")(docs.write.format("noop").mode("overwrite").save())
      val keyed = graft.SparkUtil.widenByFiles(docs)
        .select(col("doc_id").as("__id"),
          explode(graft.llm.Dedup.shingles(col("text"), 3)).as("s"))
      for (i <- 1 to 2)
        t(s"explode+count #$i")(keyed.agg(count(lit(1))).collect())
      for (i <- 1 to 2) {
        val ck = t(s"explode+localCheckpoint #$i") {
          val c = keyed.localCheckpoint(false); c.count(); c }
        t(s"freq agg over ckpt #$i")(
          ck.groupBy("s").agg(count(lit(1)).as("__df"))
            .filter(col("__df") <= 500).agg(count(lit(1))).collect())
        ck.unpersist(false)
      }
      for (i <- 1 to 2)
        t(s"full q_l3 #$i")(
          graft.llm.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, 500)
            .write.format("noop").mode("overwrite").save())
    } else if (args.headOption.contains("dump-plans")) {
      // dump-plans <sfDir> <outDir> name... : write each named query's
      // .explain("formatted") physical plan to <outDir>/<name>.txt —
      // the judge-checkable plan artifacts (plans/r14/*_before|after).
      // Note: QueryDef fns with setup side effects (staging writes)
      // run them here too, exactly as Verify/Bench would.
      val dir = args(1); val out = args(2)
      new java.io.File(out).mkdirs()
      args.drop(3).foreach { n =>
        val df = SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$out/$n.txt"), txt)
        println(s"[plans] wrote $out/$n.txt (${txt.length} chars)")
      }
    } else if (args.headOption.contains("profile-stages")) {
      // one run of the named query (default q_e2e_pipeline) with
      // per-stage task-second attribution and a job count
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val qname = if (args.length > 2) args(2) else "q_e2e_pipeline"
      val sc = spark.sparkContext
      // runTime is task-thread WALL (inflated by host CPU starvation);
      // cpuTime is actual CPU — a wide gap means throttle, not compute
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Double, Double)]
      val nJobs = new java.util.concurrent.atomic.AtomicLong
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          stages.add((i.stageId, i.name.take(80), i.numTasks,
            i.taskMetrics.executorRunTime / 1000.0,
            i.taskMetrics.executorCpuTime / 1e9))
        }
      })
      Tables.lineitem(spark, dir).write.format("noop").mode("overwrite").save()
      Tables.documents(spark, dir).write.format("noop").mode("overwrite").save()
      stages.clear(); nJobs.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[stages] $qname wall=${(System.nanoTime() - t0) / 1e9}%.1f s jobs=${nJobs.get}")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._4).take(25).foreach { case (id, name, n, run, cpu) =>
        println(f"[stages] $run%8.1f runSec $cpu%8.1f cpuSec  $n%4d tasks  stage $id%4d  $name")
      }
    } else if (args.headOption.contains("profile-aqe")) {
      // wall + job count for a named query, repeated, with AQE on then
      // off — separates per-job scheduling/planning overhead (scales
      // with AQE's sequential stage-jobs) from task work
      val dir = args(1)
      val qname = args(2)
      val sc = spark.sparkContext
      val nJobs = new java.util.concurrent.atomic.AtomicLong
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
      })
      Tables.lineitem(spark, dir).write.format("noop").mode("overwrite").save()
      for (aqe <- Seq("true", "false"); i <- 1 to 3) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        val j0 = nJobs.get
        val t0 = System.nanoTime()
        SparkEntry.queries(qname)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[aqe=$aqe] $qname run$i wall=${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${nJobs.get - j0}")
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    } else if (args.headOption.contains("profile-scaling")) {
      // empirical scale curve: the same queries at sf0.01 and sf0.1
      // (10x rows) in one JVM, third-run-of-three per (query, sf) so
      // codegen warmup is out of the numbers. ratio ~<= 10 means the
      // plan scales at worst linearly in data with the fixed per-stage
      // floor amortizing; >> 10 flags a super-linear stage (the thing
      // that kills the 100 TB story). Data-heavy picks only — floor-
      // dominated sub-second queries would just measure noise.
      val names = Seq(
        "q_l1_exact_dedup", "q_l2_minhash_neardup", "q_l3_ngram_jaccard",
        "q_l13_winnow_neardup", "q_l14_dedup_clusters", "q_l22_incremental_dedup",
        "q_l7_cosine_neardup", "q_w4_asof_join", "q_a1_monthly_agg",
        "q_s1_html_ingest",
        // round-9 final-wave additions
        "q_l45_sorted_neighborhood", "q_l47_prefix_filter_pairs",
        "q_l46_chunk_overlap", "q_l49_quality_gate", "q_w4d_asof_native",
        // round-10 additions: substring dedup, contamination matrix,
        // the codec family's heaviest (video walk + JPEG decode),
        // compaction, matryoshka
        "q_l51_dup_spans", "q_l55_contamination_matrix",
        "q_m10_video_sample", "q_s23_compaction", "q_l54_matryoshka",
        // round-10 wave 2: classifier, hybrid retrieval, BPE train +
        // apply, perplexity terciles, PCA, perceptual image dedup
        "q_l59_quality_classifier", "q_l60_rrf_fusion", "q_l61_bpe_train",
        "q_l61b_bpe_apply", "q_l62_ppl_buckets", "q_l63_pca_power",
        "q_m11_phash_dedup",
        // wave-3: LPA, winsorize, PSI, streaming covariance
        "q_a44_label_propagation", "q_a46_winsorized_stats",
        "q_a47_psi_drift", "q_st17_stream_covariance")
      val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
      Tables.lineitem(spark, sfs.last).write.format("noop").mode("overwrite").save()
      val results = names.map { name =>
        name -> sfs.map { sf =>
          val t = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.min
          sf -> t
        }
      }
      println(f"${"query"}%-26s ${"sf0.01"}%8s ${"sf0.1"}%8s ${"ratio"}%6s")
      results.foreach { case (name, rs) =>
        val s = rs.map(_._2)
        println(f"$name%-26s ${s(0)}%8.2f ${s(1)}%8.2f ${s(1) / s(0)}%6.1f")
      }
    } else if (args.headOption.contains("profile-incremental")) {
      // phase timing for q_e2e_incremental's bench body: day-1 build,
      // incremental apply, final aggregate
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.Column
      val dir = args(1)
      def t[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      t("warm orders")(Tables.orders(spark, dir).write.format("noop").mode("overwrite").save())
      // the EXACT scenario q_e2e_incremental benches — reuse its batch
      // definitions so profile numbers stay attributable to the query
      val b2 = graft.queries.DwhQueries.incStagingBatches(spark, dir)._2
      val dwh1 = t("day-1 build + eager checkpoints (prevDwh)")(
        graft.queries.DwhQueries.prevDwh(spark, dir))
      val dwh2 = t("incrementalBatch (plan)")(
        graft.app.Pipeline.incrementalBatch(dwh1, b2, "2026-08-03"))
      t("final fact agg noop")(
        dwh2.fact.groupBy("load_month", "date_id")
          .agg(count(lit(1)).as("n_facts"))
          .write.format("noop").mode("overwrite").save())
      t("apply again (cached prev)")(
        graft.app.Pipeline.incrementalBatch(dwh1, b2, "2026-08-03")
          .fact.groupBy("load_month", "date_id").agg(count(lit(1)).as("n_facts"))
          .write.format("noop").mode("overwrite").save())
    } else if (args.headOption.contains("profile-asof")) {
      // composed union+window vs native sort-merge vs native broadcast
      // as-of on PLANTED data larger than the testdata: `nLeft` left
      // rows over `nKeys` keys, `nRight` right history rows. All three
      // must return identical match counts; wall times show where each
      // physical form wins.
      import org.apache.spark.sql.functions._
      val nLeft = args.lift(1).map(_.toLong).getOrElse(4000000L)
      val nRight = args.lift(2).map(_.toLong).getOrElse(200000L)
      val nKeys = args.lift(3).map(_.toLong).getOrElse(100000L)
      val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      def mk(n: Long, salt: Int) = spark.range(n).select(
        pmod(xxhash64(col("id") + salt), lit(nKeys)).as("user_id"),
        timestamp_millis(lit(base) +
          pmod(xxhash64(col("id") * 7 + salt), lit(86400000L * 30))).as("ts"))
      val left = mk(nLeft, 1).localCheckpoint()
      val right = mk(nRight, 2).withColumn("payload", col("user_id") * 10)
        .localCheckpoint()
      def t(what: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        for (pass <- 1 to 3) {
          val t0 = System.nanoTime()
          val n = df.agg(count(col("asof_payload")).as("n")).collect()(0).getLong(0)
          println(f"[profile] $what pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2f s (matched=$n)")
        }
      }
      def conf(k: String, v: String) = spark.conf.set(k, v)
      t("composed union+window")(graft.operators.AsOfJoin.joinAsOfBackward(
        left, right, Seq("user_id"), "ts", "ts", Seq("payload")))
      conf("spark.sql.autoBroadcastJoinThreshold", "-1")
      t("native sort-merge")(graft.plans.NativeAsOfJoin.joinAsOfBackward(
        left, right, Seq("user_id"), "ts", "ts", Seq("payload")))
      conf("spark.sql.autoBroadcastJoinThreshold", "512MB")
      t("native broadcast")(graft.plans.NativeAsOfJoin.joinAsOfBackward(
        left, right, Seq("user_id"), "ts", "ts", Seq("payload")))
      conf("spark.sql.autoBroadcastJoinThreshold", "10MB")
    } else if (args.headOption.contains("profile-asof-skew")) {
      // the r9 profile-asof used UNIFORM keys; this is the hot-key
      // layout the sort-merge form's caveat warns about. Keys follow a
      // power law (key = ⌊nKeys·u⁴⌋ for u ~ U[0,1)): ~5-6% of all left
      // rows land on key 0, so the co-partitioned sort-merge serializes
      // that key's merge in one task, while the broadcast form (left
      // side never exchanged) and the salted composed form spread it.
      // Max per-pass task time is printed alongside wall — the skew
      // signature is one straggler task owning the wall clock.
      import org.apache.spark.sql.functions._
      val nLeft = args.lift(1).map(_.toLong).getOrElse(4000000L)
      val nRight = args.lift(2).map(_.toLong).getOrElse(200000L)
      val nKeys = args.lift(3).map(_.toLong).getOrElse(100000L)
      val sc = spark.sparkContext
      val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null)
            maxTaskMs.getAndUpdate(m => math.max(m, t.taskInfo.duration))
      })
      val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      def mk(n: Long, salt: Int, skewed: Boolean) = {
        val u = pmod(xxhash64(col("id") + salt), lit(1000000L)) / lit(1000000.0)
        val key =
          if (skewed) floor(lit(nKeys.toDouble) * pow(u, lit(4.0))).cast("long")
          else pmod(xxhash64(col("id") + salt), lit(nKeys))
        spark.range(n).select(key.as("user_id"),
          timestamp_millis(lit(base) +
            pmod(xxhash64(col("id") * 7 + salt), lit(86400000L * 30))).as("ts"))
      }
      val left = mk(nLeft, 1, skewed = true).localCheckpoint()
      val right = mk(nRight, 2, skewed = true)
        .withColumn("payload", col("user_id") * 10).localCheckpoint()
      println(s"[profile] hot-key mass: " + left.groupBy("user_id").count()
        .orderBy(col("count").desc).limit(3).collect().mkString(", "))
      def t(what: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        for (pass <- 1 to 3) {
          maxTaskMs.set(0)
          val t0 = System.nanoTime()
          val n = df.agg(count(col("asof_payload")).as("n")).collect()(0).getLong(0)
          println(f"[profile] $what pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
            f"maxTask=${maxTaskMs.get / 1000.0}%.2f s (matched=$n)")
        }
      }
      def conf(k: String, v: String) = spark.conf.set(k, v)
      conf("spark.sql.autoBroadcastJoinThreshold", "-1")
      t("native sort-merge (skewed)")(graft.plans.NativeAsOfJoin.joinAsOfBackward(
        left, right, Seq("user_id"), "ts", "ts", Seq("payload")))
      conf("spark.sql.autoBroadcastJoinThreshold", "512MB")
      t("native broadcast (skewed)")(graft.plans.NativeAsOfJoin.joinAsOfBackward(
        left, right, Seq("user_id"), "ts", "ts", Seq("payload")))
      conf("spark.sql.autoBroadcastJoinThreshold", "-1")
      t("composed salted (skewed)")(graft.operators.AsOfJoin.joinAsOfBackwardSalted(
        left, right, Seq("user_id"), "ts", "ts", Seq("payload"), saltBuckets = 16))
      conf("spark.sql.autoBroadcastJoinThreshold", "10MB")
    } else {
      val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
      for (t <- Tables.all) {
        try {
          val df = Tables.load(spark, dir, t)
          println(s"== $t: ${df.count()} rows")
        } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
      }
    }
    spark.stop()
  }
}
