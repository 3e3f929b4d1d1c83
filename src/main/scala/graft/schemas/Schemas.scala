package graft.schemas

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Explicit StructType constants for every table of the system
  * (SURVEY §1.3: the reference declares fixed DDL, so the Spark side
  * declares fixed StructTypes — no inference). Type mapping per
  * SURVEY §1.2: JSONB array columns are native ArrayType(String),
  * NUMERIC money is double at the API boundary (DECIMAL inside
  * computations), TIMESTAMPTZ is TimestampType under the session's
  * pinned UTC.
  */
object Schemas {

  private def f(n: String, t: DataType, nullable: Boolean = true) =
    StructField(n, t, nullable)

  /** raw_jobs — /root/reference/sql/schema_raw_jobs.sql:2-18; the
    * crawler's fixed 15-field record in parser column order
    * (parser.py:458-466).
    */
  val rawJobs: StructType = StructType(Seq(
    f("job_id", StringType, nullable = false),
    f("title", StringType),
    f("job_url", StringType),
    f("company_name", StringType),
    f("company_url", StringType),
    f("salary", StringType),
    f("skills", StringType), // JSON-encoded array at the storage boundary (F17)
    f("location", StringType),
    f("location_detail", StringType),
    f("deadline", StringType),
    f("verified_employer", BooleanType),
    f("last_update", StringType),
    f("logo_url", StringType),
    f("posted_time", TimestampType),
    f("crawled_at", TimestampType)))

  /** staging_jobs — /root/reference/sql/schema_staging.sql:3-27. */
  val stagingJobs: StructType = StructType(
    rawJobs.fields.toSeq.flatMap { fd =>
      fd.name match {
        case "title" => Seq(fd, f("title_clean", StringType))
        case "company_name" => Seq(fd, f("company_name_standardized", StringType))
        case "salary" => Seq(fd, f("salary_min", DoubleType), f("salary_max", DoubleType),
          f("salary_type", StringType))
        case "location_detail" => Seq(fd, f("location_pairs", ArrayType(StringType)))
        case _ => Seq(fd)
      }
    } ++ Seq(f("due_date", TimestampType), f("time_remaining", StringType)))

  /** DimJob — schema_dwh.sql:9-20. */
  val dimJob: StructType = StructType(Seq(
    f("job_sk", LongType, nullable = false),
    f("job_id", StringType, nullable = false),
    f("title_clean", StringType),
    f("job_url", StringType),
    f("skills", StringType),
    f("last_update", StringType),
    f("logo_url", StringType),
    f("effective_date", DateType, nullable = false),
    f("expiry_date", DateType),
    f("is_current", BooleanType, nullable = false)))

  /** DimCompany — schema_dwh.sql:22-30. */
  val dimCompany: StructType = StructType(Seq(
    f("company_sk", LongType, nullable = false),
    f("company_name_standardized", StringType, nullable = false),
    f("company_url", StringType),
    f("verified_employer", BooleanType),
    f("effective_date", DateType, nullable = false),
    f("expiry_date", DateType),
    f("is_current", BooleanType, nullable = false)))

  /** DimLocation — schema_dwh.sql:32-40 (insert-only; SCD stamps exist
    * in the DDL but the reference never closes location rows).
    */
  val dimLocation: StructType = StructType(Seq(
    f("location_sk", LongType, nullable = false),
    f("province", StringType),
    f("city", StringType, nullable = false),
    f("district", StringType)))

  /** DimDate — schema_dwh.sql:42-49. */
  val dimDate: StructType = StructType(Seq(
    f("date_id", DateType, nullable = false),
    f("day", IntegerType),
    f("month", IntegerType),
    f("quarter", IntegerType),
    f("year", IntegerType),
    f("weekday", StringType)))

  /** FactJobPostingDaily — schema_dwh.sql:52-70. */
  val factJobPostingDaily: StructType = StructType(Seq(
    f("fact_id", LongType, nullable = false),
    f("job_sk", LongType, nullable = false),
    f("company_sk", LongType, nullable = false),
    f("date_id", DateType, nullable = false),
    f("salary_min", DoubleType),
    f("salary_max", DoubleType),
    f("salary_type", StringType),
    f("due_date", TimestampType),
    f("time_remaining", StringType),
    f("verified_employer", BooleanType),
    f("posted_time", TimestampType),
    f("crawled_at", TimestampType),
    f("load_month", StringType, nullable = false)))

  /** FactJobLocationBridge — schema_dwh.sql:73-77. */
  val factJobLocationBridge: StructType = StructType(Seq(
    f("fact_id", LongType, nullable = false),
    f("location_sk", LongType, nullable = false)))

  /** Column-set conformance check: every declared field present (extra
    * derived columns are allowed — the declared schema is the
    * contract's lower bound, as with the reference's
    * ADD COLUMN IF NOT EXISTS evolution).
    */
  def requireColumns(df: DataFrame, schema: StructType, what: String): Unit = {
    val missing = schema.fieldNames.filterNot(df.columns.contains)
    require(missing.isEmpty, s"$what is missing declared columns: ${missing.mkString(", ")}")
  }
}
