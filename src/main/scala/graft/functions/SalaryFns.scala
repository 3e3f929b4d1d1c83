package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** F1: Vietnamese salary normalizer — `normalize_salary(text)` →
  * (salary_min, salary_max, salary_type), re-expressed as a single
  * codegen-friendly `when`/`regexp_extract` chain (no UDF, so the whole
  * staging transform stays inside whole-stage codegen).
  *
  * Semantics follow /root/reference/sql/stored_procedures.sql:6-105
  * branch-for-branch, including evaluation order:
  *   1. null/''/'thoả thuận'        → (0, 0, negotiable)
  *   2. "x - y USD"                 → (x, y)×24000/1e6, range
  *   3. "x - y triệu"               → (x, y), range       (comma→decimal point)
  *   4. "tới x USD" / "tới x triệu" → (0, x), upto
  *   5. "từ x triệu"                → (x, x), from
  *   6. single "x USD"/"x triệu" with no dash → (x, x), range
  *   7. literal "0.0 - 0.0 triệu"   → UNREACHABLE in the reference too:
  *      branch 3's regex matches it first, so the observable result is
  *      (0, 0, 'range') — we preserve the executed behavior, not the
  *      dead branch (the reference's own FIXTURES table is wrong here).
  *   8. anything else               → (0, 0, negotiable)
  * Post-guard (stored_procedures.sql:100-101):
  *   min = coalesce(min, 0); max = coalesce(nullif(max, 0), min).
  *
  * USD amounts strip thousands-commas; "triệu" amounts treat comma as a
  * decimal point ("10,5 triệu" → 10.5). All arithmetic is DECIMAL so
  * ×24000/1e6 is exact (1,500 USD → 36.0, bit-for-bit in any engine);
  * the struct exposes doubles.
  */
object SalaryFns {

  private val RangeUsd   = "(?iu)([0-9,.]+)\\s*-\\s*([0-9,.]+)\\s*usd"
  private val RangeTrieu = "(?iu)([0-9,.]+)\\s*-\\s*([0-9,.]+)\\s*triệu"
  private val UptoUsd    = "(?iu)tới\\s+([0-9,.]+)\\s*usd"
  private val UptoTrieu  = "(?iu)tới\\s+([0-9,.]+)\\s*triệu"
  private val FromTrieu  = "(?iu)từ\\s+([0-9,.]+)\\s*triệu"
  private val OneUsd     = "(?iu)([0-9,.]+)\\s*usd"
  private val OneTrieu   = "(?iu)([0-9,.]+)\\s*triệu"

  private val Dec = DecimalType(18, 6)
  private def usdNum(s: Column): Column =
    regexp_replace(s, ",", "").cast(Dec) * 24000 / 1000000
  private def trieuNum(s: Column): Column =
    regexp_replace(s, ",", ".").cast(Dec)
  private def zero: Column = lit(0).cast(Dec)

  /** Returns struct(salary_min: double, salary_max: double, salary_type: string).
    *
    * Backed by the custom Catalyst expression `NormalizeSalaryExpr`
    * (single evaluation per row, precompiled patterns, codegen) — the
    * `when`/`regexp_extract` chain below is kept as the executable
    * specification and exercised by SalaryFnsSpec's parity test.
    */
  def normalizeSalary(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NormalizeSalaryExpr(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** The same semantics as pure column expressions (the original
    * formulation): each struct-field access re-inlines the whole branch
    * chain, which measured ~10× slower than the custom expression at
    * sf0.1 — kept for documentation and differential testing.
    */
  def normalizeSalaryColumns(c: Column): Column = {
    val pre = when(c.isNull || c === "" || lower(c) === "thoả thuận",
        struct(zero.as("mn"), zero.as("mx"), lit("negotiable").as("ty")))
      .when(c.rlike(RangeUsd),
        struct(usdNum(regexp_extract(c, RangeUsd, 1)).as("mn"),
          usdNum(regexp_extract(c, RangeUsd, 2)).as("mx"), lit("range").as("ty")))
      .when(c.rlike(RangeTrieu),
        struct(trieuNum(regexp_extract(c, RangeTrieu, 1)).as("mn"),
          trieuNum(regexp_extract(c, RangeTrieu, 2)).as("mx"), lit("range").as("ty")))
      .when(c.rlike(UptoUsd),
        struct(zero.as("mn"), usdNum(regexp_extract(c, UptoUsd, 1)).as("mx"),
          lit("upto").as("ty")))
      .when(c.rlike(UptoTrieu),
        struct(zero.as("mn"), trieuNum(regexp_extract(c, UptoTrieu, 1)).as("mx"),
          lit("upto").as("ty")))
      .when(c.rlike(FromTrieu),
        struct(trieuNum(regexp_extract(c, FromTrieu, 1)).as("mn"),
          trieuNum(regexp_extract(c, FromTrieu, 1)).as("mx"), lit("from").as("ty")))
      .when(c.rlike(OneUsd) && !c.contains("-"),
        struct(usdNum(regexp_extract(c, OneUsd, 1)).as("mn"),
          usdNum(regexp_extract(c, OneUsd, 1)).as("mx"), lit("range").as("ty")))
      .when(c.rlike(OneTrieu) && !c.contains("-"),
        struct(trieuNum(regexp_extract(c, OneTrieu, 1)).as("mn"),
          trieuNum(regexp_extract(c, OneTrieu, 1)).as("mx"), lit("range").as("ty")))
      .otherwise(
        struct(zero.as("mn"), zero.as("mx"), lit("negotiable").as("ty")))

    val mn = coalesce(pre.getField("mn"), zero)
    val mx = coalesce(nullif(pre.getField("mx"), zero), mn)
    struct(
      mn.cast("double").as("salary_min"),
      mx.cast("double").as("salary_max"),
      pre.getField("ty").as("salary_type"))
  }
}
