package graft.queries

import graft.Tables
import graft.functions.SalaryFns
import graft.io.Snapshots
import graft.streaming.CdcStream
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** IO / lifecycle queries (SURVEY S-family + streaming): partitioned
  * parquet export→pruned-reload round trip, CDC JSONL sink/replay,
  * snapshot versioning restore, text-file ingest+parse, and a
  * Structured-Streaming windowed aggregation checked against a batch
  * oracle.
  *
  * Side-effecting queries write under target/tmp/<query> (inside the
  * repo), delete-first, so Verify re-runs are idempotent.
  */
object IoQueries {

  private val TmpBase = "/root/repo/target/tmp"

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- S10/S11/S12 partition round trip
    QueryDef(
      "q_s10_partition_roundtrip", "S10 S11 S12",
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS load_month, count(*) AS n,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders WHERE strftime(o_orderdate, '%Y-%m') IN ('1997-03', '1998-11')
             |GROUP BY 1 ORDER BY load_month""".stripMargin),
      (s, dir) => {
        val tmp = s"$TmpBase/q_s10_partitions"
        val withMonth = Tables.orders(s, dir)
          .withColumn("load_month", date_format(col("o_orderdate"), "yyyy-MM"))
        Snapshots.writePartitioned(withMonth, tmp)
        Snapshots.readPartitions(s, tmp, Seq("1997-03", "1998-11"))
          .groupBy("load_month")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("load_month")
      }),

    // ---------------------------------------------------------------- S13/S14 CDC JSONL sink + replay
    QueryDef(
      "q_s13_cdc_roundtrip", "S13 S14 F17",
      Some("""SELECT CASE WHEN event_type IN ('signup', 'view') THEN 'insert'
             |            ELSE 'update' END AS action,
             |count(*) AS n, count(DISTINCT event_id) AS n_jobs,
             |min(strftime(ts, '%Y-%m-%dT%H:%M:%S')) AS min_ts,
             |max(strftime(ts, '%Y-%m-%dT%H:%M:%S')) AS max_ts
             |FROM events WHERE ts >= TIMESTAMP '2024-01-28 00:00:00'
             |GROUP BY 1 ORDER BY action""".stripMargin),
      (s, dir) => {
        val tmp = s"$TmpBase/q_s13_cdc"
        Snapshots.deleteDir(s, tmp)
        val records = Snapshots.toCdcRecords(
          Tables.events(s, dir).filter(col("ts") >= expr("timestamp'2024-01-28 00:00:00'")))
        Snapshots.cdcAppend(records, tmp)
        Snapshots.cdcReplay(s, tmp)
          .groupBy("action")
          .agg(count(lit(1)).as("n"), countDistinct(col("job_id")).as("n_jobs"),
            min(col("timestamp")).as("min_ts"), max(col("timestamp")).as("max_ts"))
          .orderBy("action")
      }),

    // ---------------------------------------------------------------- S15/S7 snapshot versioning + restore
    QueryDef(
      "q_s15_snapshot_restore", "S15 S7 S4",
      Some("""SELECT c_mktsegment AS segment, count(*) AS n,
             |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
             |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin),
      (s, dir) => {
        val tmp = s"$TmpBase/q_s15_snapshots"
        val v1 = Tables.customer(s, dir)
        Snapshots.writeSnapshot(v1, tmp, "1")
        // a "corrupting" v2 write; restore must see v1 untouched
        Snapshots.writeSnapshot(
          v1.withColumn("c_acctbal", col("c_acctbal") * -1), tmp, "2")
        Snapshots.readSnapshot(s, tmp, "1")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy("segment")
      }),

    // ---------------------------------------------------------------- S1/S2 file ingest + parse + dedup
    QueryDef(
      "q_s1_html_ingest", "S1 S2 S4 F1",
      Some("""WITH src AS (SELECT DISTINCT p_name, p_brand, p_size FROM part)
             |SELECT p_brand, count(*) AS n, count(DISTINCT p_name) AS n_titles,
             |CAST(sum(CAST(p_size AS DECIMAL(18,2))) AS DOUBLE) AS sum_salary_min
             |FROM src GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      (s, dir) => {
        // render part rows as job-card HTML lines, write to text files,
        // re-scan + regex-parse + dedup — the crawler contract (S1/S2)
        val tmp = s"$TmpBase/q_s1_html"
        val html = Tables.part(s, dir).select(concat(
          lit("<div class=\"job-item-2\"><h3>"), col("p_name"),
          lit("</h3><span class=\"salary\">"), col("p_size"),
          lit(" triệu</span><span class=\"company\">"), col("p_brand"),
          lit("</span></div>")).as("value"))
        html.write.mode("overwrite").text(tmp)
        val parsed = s.read.text(tmp).select(
          regexp_extract(col("value"), "<h3>([^<]*)</h3>", 1).as("p_name"),
          regexp_extract(col("value"), "<span class=\"company\">([^<]*)</span>", 1).as("p_brand"),
          regexp_extract(col("value"), "<span class=\"salary\">([^<]*)</span>", 1).as("salary"))
        parsed
          .withColumn("salary_min",
            SalaryFns.normalizeSalary(col("salary")).getField("salary_min"))
          .dropDuplicates("p_name", "p_brand", "salary_min")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), countDistinct(col("p_name")).as("n_titles"),
            dsum(col("salary_min")).as("sum_salary_min"))
          .orderBy("p_brand")
      }),

    // ---------------------------------------------------------------- Structured Streaming windowed agg
    QueryDef(
      "q_st1_stream_window_agg", "ST1 P2",
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
             |count(*) AS n,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin),
      (s, dir) => {
        val name = "q_st1_mem"
        val agg = CdcStream.dailyTypeCounts(CdcStream.readEvents(s, dir))
        CdcStream.runToMemory(s, agg, name)
          .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("day", "event_type")
      })
  )
}
