package graft.io

import graft.app.Pipeline.Dwh
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S12: denormalized analytics exports
  * (ref /root/reference/src/etl/staging_to_dwh.py:652-796).
  *
  * For each load_month, three join-projections (queries :687-713) are
  * written as parquet under `dir/<month>/job_<type>_<month>.parquet`,
  * with a `metadata_<month>.json` per month (record counts + files)
  * and a top-level `index.json` — the reference's export contract.
  * `asOf` stands in for the reference's datetime.now() so metadata is
  * deterministic (SURVEY §7.4(3)).
  *
  * Scale shape: each export is fact ⋈ broadcast dims, filtered to one
  * partition-pruned month — no shuffle beyond the fact scan; the
  * per-month loop is over months (dozens), not rows.
  */
object Exports {

  val Types: Seq[String] = Seq("analytics", "facts", "locations")

  /** `SELECT f.*, j.title_clean, j.job_id, c.company_name_standardized`
    * (staging_to_dwh.py:688-694).
    */
  def factsExport(dwh: Dwh, month: String): DataFrame =
    dwh.fact.filter(col("load_month") === month)
      .join(broadcast(dwh.dimJob.select("job_sk", "job_id", "title_clean")), "job_sk")
      .join(broadcast(dwh.dimCompany.select("company_sk", "company_name_standardized")),
        "company_sk")

  /** fact ⋈ bridge ⋈ DimLocation leg (staging_to_dwh.py:696-703). */
  def locationsExport(dwh: Dwh, month: String): DataFrame =
    dwh.fact.filter(col("load_month") === month)
      .select("fact_id", "job_sk", "date_id")
      .join(broadcast(dwh.dimJob.select("job_sk", "job_id", "title_clean")), "job_sk")
      .join(dwh.bridge, "fact_id")
      .join(broadcast(dwh.dimLocation.select("location_sk", "province", "city", "district")),
        "location_sk")
      .select("fact_id", "job_sk", "date_id", "job_id", "title_clean",
        "province", "city", "district")

  /** BI projection (staging_to_dwh.py:705-713). */
  def analyticsExport(dwh: Dwh, month: String): DataFrame =
    dwh.fact.filter(col("load_month") === month)
      .join(broadcast(dwh.dimJob.select("job_sk", "job_id", "title_clean")), "job_sk")
      .join(broadcast(dwh.dimCompany.select("company_sk", "company_name_standardized")),
        "company_sk")
      .select("title_clean", "job_id", "company_name_standardized", "date_id",
        "salary_min", "salary_max", "salary_type", "due_date", "posted_time",
        "verified_employer")

  def exportOf(dwh: Dwh, tpe: String, month: String): DataFrame = tpe match {
    case "analytics" => analyticsExport(dwh, month)
    case "facts"     => factsExport(dwh, month)
    case "locations" => locationsExport(dwh, month)
  }

  /** Months present in the fact table (staging_to_dwh.py:669-672). */
  def loadMonths(dwh: Dwh): Seq[String] =
    dwh.fact.select("load_month").distinct().orderBy("load_month")
      .collect().map(_.getString(0)).toSeq

  private def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  /** Run the full export: data parquet + metadata JSON per month +
    * index JSON. Returns (load_month, export_type, file, n_records)
    * for verification.
    */
  def exportMonths(
      dwh: Dwh, months: Seq[String], dir: String, asOf: String): Seq[(String, String, String, Long)] = {
    val spark = dwh.fact.sparkSession
    val stats = months.flatMap { m =>
      val rows = Types.map { t =>
        val file = s"job_${t}_$m.parquet"
        val df = exportOf(dwh, t, m)
        df.write.mode("overwrite").parquet(s"$dir/$m/$file")
        val n = spark.read.parquet(s"$dir/$m/$file").count()
        (m, t, file, n)
      }
      val counts = rows.map { case (_, t, _, n) => s""""$t": $n""" }.mkString(", ")
      val files = rows.map { case (_, _, f, _) => s""""$f"""" }.mkString(", ")
      writeString(spark, s"$dir/$m/metadata_$m.json",
        s"""{"load_month": "$m", "export_time": "$asOf", "record_counts": {$counts}, "files": [$files]}""")
      rows
    }
    val total = stats.map(_._4).sum
    val monthsJson = months.map(m => s""""$m"""").mkString(", ")
    writeString(spark, s"$dir/index.json",
      s"""{"load_months": [$monthsJson], "export_time": "$asOf", "export_count": ${months.size}, "total_records": $total}""")
    stats
  }
}
