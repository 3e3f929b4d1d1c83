package graft.app

import graft.dwh.{Dimensions, Facts, ScdType2, StableId}
import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline's entry points (SURVEY §3), jobs-schema in,
  * star-schema out — what a JobInsight user calls after switching.
  *
  * E2 raw→staging (raw_to_staging.py:412-530): one linear DataFrame
  * pipeline — the reference's SQL-proc + pandas split collapses into a
  * single codegen'd projection.
  *
  * E3 staging→DWH (etl_main.py:341-597): SCD2 dims, ×5-day fact
  * explosion, location bridge, DimDate fill — one lazy DAG, shuffling
  * only at the SCD2 natural-key joins and the fact dedup. All
  * wall-clock inputs are the explicit `asOf` (SURVEY §7.4(3)).
  */
object Pipeline {

  /** E2: raw_jobs → staging_jobs. Expects the crawler's 15-field shape
    * (job_id, title, company_name, salary, location, location_detail,
    * deadline, last_update, crawled_at, ... — absent optional columns
    * may simply be omitted downstream).
    */
  def rawToStaging(raw0: DataFrame, asOf: String): DataFrame = {
    // The cleaning chain is UDF/regex-heavy and narrow: its parallelism
    // is whatever the scan gave us. A small-file input (one parquet
    // file → 1-2 partitions) would run the whole chain on 1-2 cores,
    // so widen only when the input is narrower than the cluster — a
    // metadata-only file-count check (see SparkUtil.widenByFiles: the
    // old getNumPartitions check EXECUTED the upstream plan under AQE).
    // At real scale the scan has plenty of files and nothing changes.
    val raw = graft.SparkUtil.widenByFiles(raw0)
    val now = to_timestamp(lit(asOf))
    val withPairs = raw
      .withColumn("location_pairs", LocationFns.extractLocationInfo(col("location_detail")))
      .withColumn("location",
        LocationFns.refineLocation(col("location"), col("location_pairs")))
    val sal = SalaryFns.normalizeSalary(col("salary"))
    withPairs
      .withColumn("title_clean", TextFns.cleanTitle(col("title")))
      .withColumn("company_name_standardized", TextFns.cleanCompanyName(col("company_name")))
      .withColumn("salary_min", sal.getField("salary_min"))
      .withColumn("salary_max", sal.getField("salary_max"))
      .withColumn("salary_type", sal.getField("salary_type"))
      .withColumn("due_date",
        TimeFns.dueDate(lit(null).cast("timestamp"), col("crawled_at"), col("deadline")))
      .withColumn("time_remaining", TimeFns.timeRemaining(col("due_date"), now))
      .withColumn("posted_time",
        TextFns.postedTime(TextFns.parseLastUpdate(col("last_update")), now))
      .withColumn("load_month", TimeFns.loadMonth(col("crawled_at"), now))
  }

  /** The DWH star produced by one E3 batch. */
  final case class Dwh(
      dimJob: DataFrame, dimCompany: DataFrame, dimLocation: DataFrame,
      dimDate: DataFrame, fact: DataFrame, bridge: DataFrame)

  /** SCD2 tracked columns per dimension (the DAG-authoritative sets,
    * etl_main.py:442,805; SURVEY D5).
    */
  val JobTrackedCols: Seq[String] =
    Seq("title_clean", "job_url", "skills", "last_update", "logo_url")
  val CompanyTrackedCols: Seq[String] = Seq("company_url", "verified_employer")

  /** Fact measure/attribute columns, mirroring FactJobPostingDaily
    * (schema_dwh.sql:52-70) minus keys and load_month.
    */
  val FactMeasureCols: Seq[String] = Seq(
    "salary_min", "salary_max", "salary_type", "due_date", "time_remaining",
    "verified_employer", "posted_time", "crawled_at")

  /** Location source for dim/bridge parsing: the structured pairs when
    * present (as a JSON list, the shape parse_job_location expects),
    * else the freeform location string (fact_handler.py:489-525).
    */
  private def withLocationSrc(staging: DataFrame): DataFrame =
    staging.withColumn("location_src",
      when(col("location_pairs").isNotNull && size(col("location_pairs")) > 0,
        to_json(col("location_pairs")))
        .otherwise(col("location")))

  /** Loud contract check: the E3 entry points need exactly these
    * staging columns (a subset of Schemas.stagingJobs — synthesized
    * test batches may omit raw-only passthrough fields).
    */
  private def requireStagingCols(df: DataFrame): Unit = {
    val needed = (("job_id" +: JobTrackedCols) ++
      ("company_name_standardized" +: CompanyTrackedCols) ++
      FactMeasureCols ++ Seq("load_month", "location", "location_pairs")).distinct
    val missing = needed.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"staging input is missing required columns: ${missing.mkString(", ")}")
  }

  /** Checkpoint staging once for its four consumers (3 dims + facts),
    * then widen AFTER the checkpoint if the materialized frame came out
    * narrow: the partition check on a checkpointed frame is free (the
    * RDD already exists — no plan execution), whereas checking the
    * un-checkpointed plan via `.rdd` executed the whole staging chain a
    * second time under AQE (the round-5 e2e numbers paid the E2 parse
    * chain TWICE per build). The repartition, when it fires, re-shuffles
    * only cached checkpoint blocks — bounded by the narrow-input premise.
    */
  private def checkpointWide(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(false)
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (ck.rdd.getNumPartitions < target) ck.repartition(target) else ck
  }

  /** E3: staging → full star-schema snapshot (initial build; the daily
    * incremental mode is `incrementalBatch` below).
    */
  def stagingToDwh(staging0: DataFrame, asOf: String): Dwh = {
    requireStagingCols(staging0)
    val spark = staging0.sparkSession
    // staging feeds four consumers (3 dims + facts); checkpoint once so
    // the E2 parse/normalize chain isn't recomputed per consumer (the
    // round-2 bench's dominant cost). Lazy: materializes inside the
    // first consuming job instead of a separate eager one at plan
    // time; blocks are auto-dropped when the frame is GC'd.
    val staging = checkpointWide(withLocationSrc(staging0))

    // -------- dims (D1/D2): dedup keep-latest-crawl + SCD stamp + SK
    // assignment fused into ONE range exchange per dimension (see
    // Dimensions.prepareDimAssigning); SKs are dense in natural-key
    // order with no single-partition window stage anywhere
    val dimJob = Dimensions.prepareDimAssigning(
      staging.select(("job_id" +: JobTrackedCols :+ "crawled_at").map(col): _*),
      "job_id", "job_sk", 10000L, asOf)

    val dimCompany = Dimensions.prepareDimAssigning(
      staging.select(
        ("company_name_standardized" +: CompanyTrackedCols :+ "crawled_at").map(col): _*),
      "company_name_standardized", "company_sk", 10000L, asOf)

    // Unknown row seeded before bridge resolution (SURVEY §7.4(6))
    val unknownLoc = spark.range(1).select(
      lit(null).cast("string").as("province"), lit("Unknown").as("city"),
      lit(null).cast("string").as("district"))
    // full-triple order: city alone ties for multi-district cities,
    // which would leave equal-city SKs to sort-order luck across runs
    val dimLocation = StableId.assign(
      Dimensions.appendNewLocations(unknownLoc,
        Dimensions.prepareDimLocation(staging, "location_src")),
      Seq(col("city"), col("province"), col("district")), "location_sk", 10000L)

    // -------- DimDate (D8): asOf−30d .. asOf+270d (etl_main.py:460-484)
    val dimDate = TimeFns.dimDateRange(spark,
      java.time.LocalDate.parse(asOf).minusDays(30).toString,
      java.time.LocalDate.parse(asOf).plusDays(270).toString)

    // -------- facts (D9/D10): SK resolution → ×5-day explode → dedup.
    // Measure set mirrors FactJobPostingDaily (schema_dwh.sql:52-70).
    val resolved = Facts.resolveSks(
      staging.select(("job_id" +: "company_name_standardized" +: FactMeasureCols) ++
        Seq("load_month", "location_src") map col: _*),
      dimJob, dimCompany, "job_id", "company_name_standardized")
    // dedup and id assignment fused into one range exchange (see
    // Facts.dedupAssigningIds); survivors follow the latest-crawl rule
    val fact = Facts.dedupAssigningIds(
        Facts.explodeDailyGrain(resolved, asOf), "fact_id", 10000L)
      .select(("fact_id" +: "job_sk" +: "company_sk" +: "date_id" +: FactMeasureCols) ++
        Seq("load_month", "location_src") map col: _*)

    // -------- bridge (D11)
    val bridge = Facts.buildBridge(
      fact.select(col("fact_id"), col("location_src").as("location")), dimLocation)

    Dwh(dimJob, dimCompany, dimLocation, dimDate, fact.drop("location_src"), bridge)
  }

  /** E3 incremental — the reference's ACTUAL daily production mode
    * (etl_main.py:341-597: a 7-day-lookback staging batch applied onto
    * the existing warehouse). Composes the snapshot-rewrite primitives:
    *
    *  - SCD2 `applyBatch` on DimJob/DimCompany (changed rows close the
    *    old version and append a new one with a fresh SK; unchanged
    *    rows pass through untouched);
    *  - insert-only DimLocation append keeping existing SKs;
    *  - idempotent DimDate fill for the new asOf window;
    *  - fact merge: matched (job_sk, date_id) keys keep their fact_id
    *    and load_month and take the incoming measures (the ON CONFLICT
    *    DO UPDATE of fact_handler.py:237-255); new keys get dense ids
    *    after max(fact_id);
    *  - bridge rebuild for touched facts only (the reference deletes
    *    and re-inserts bridges per touched fact, fact_handler.py:443-539).
    *
    * Idempotent: re-applying the same batch returns an identical star
    * (asserted in PipelineSpec). Scale shape: dims ride broadcasts, the
    * fact merge shuffles once on (job_sk, date_id), untouched bridge
    * rows move only through one anti-join.
    */
  def incrementalBatch(prev: Dwh, staging0: DataFrame, asOf: String): Dwh = {
    requireStagingCols(staging0)
    val spark = staging0.sparkSession
    val staging = checkpointWide(withLocationSrc(staging0))

    // within-batch dedup per natural key: the reference's upsert loop
    // processes rows in crawl order, so for conflicting duplicates the
    // LAST crawl wins — order by crawled_at desc (ordering by the
    // partition key itself would tie every row and leave the survivor
    // to partition layout); exact-timestamp ties break on a
    // deterministic payload hash, same rule as prepareDimAssigning
    def dedupBy(df: DataFrame, key: String): DataFrame = {
      val tie = Facts.tieHash(df, Seq(key, "crawled_at"))
      val w = Window.partitionBy(key).orderBy(col("crawled_at").desc, tie)
      df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__rn", "crawled_at")
    }

    val dimJob = ScdType2.applyBatch(
      prev.dimJob,
      dedupBy(staging.select(("job_id" +: JobTrackedCols :+ "crawled_at").map(col): _*),
        "job_id"),
      "job_id", JobTrackedCols, "job_sk", asOf)
    val dimCompany = ScdType2.applyBatch(
      prev.dimCompany,
      dedupBy(staging.select(
        ("company_name_standardized" +: CompanyTrackedCols :+ "crawled_at").map(col): _*),
        "company_name_standardized"),
      "company_name_standardized", CompanyTrackedCols, "company_sk", asOf)
    val dimLocation = Dimensions.appendNewLocationsKeepSk(
      prev.dimLocation, Dimensions.prepareDimLocation(staging, "location_src"))

    val day = java.time.LocalDate.parse(asOf)
    val freshDates = TimeFns.dimDateRange(spark,
      day.minusDays(30).toString, day.plusDays(270).toString)
      .join(prev.dimDate.select("date_id"), Seq("date_id"), "left_anti")
    val dimDate = prev.dimDate.unionByName(freshDates)

    val resolved = Facts.resolveSks(
      staging.select(("job_id" +: "company_name_standardized" +: FactMeasureCols) ++
        Seq("load_month", "location_src") map col: _*),
      dimJob, dimCompany, "job_id", "company_name_standardized")
    val incoming = Facts.explodeDailyGrain(resolved, asOf)
      .select(("job_sk" +: "company_sk" +: "date_id" +: FactMeasureCols) ++
        Seq("load_month", "location_src") map col: _*)
    val prevFact =
      if (prev.fact.columns.contains("location_src")) prev.fact
      else prev.fact.withColumn("location_src", lit(null).cast("string"))
    // company_sk rides preserveCols (default): the reference's DO
    // UPDATE list omits it, so matched facts keep their original
    // company assignment even if the incoming batch re-resolved it
    val fact = Facts.mergeFactsAssigning(prevFact, incoming,
      FactMeasureCols :+ "location_src")

    // bridge: rebuild exactly the touched facts, keep the rest
    val touched = fact.join(incoming.select("job_sk", "date_id").distinct(),
      Seq("job_sk", "date_id"), "left_semi")
    val untouched = prev.bridge.join(touched.select("fact_id"), Seq("fact_id"), "left_anti")
    val bridge = untouched.unionByName(Facts.buildBridge(
      touched.select(col("fact_id"), col("location_src").as("location")), dimLocation))

    Dwh(dimJob, dimCompany, dimLocation, dimDate, fact.drop("location_src"), bridge)
  }
}
