package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate entry: a Spark DataFrame builder plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query run
  * by the driver over the same parquet tables.
  *
  * Oracle-parity rules applied throughout (so value hashes match):
  *  - money/measure sums are computed on DECIMAL(18,2) casts (exact in
  *    both engines), final cast to DOUBLE;
  *  - ratios/averages are double divisions of exact ints/decimals,
  *    rounded to a fixed scale;
  *  - every result has a total deterministic ORDER BY in both dialects;
  *  - column names/aliases are identical on both sides.
  */
final case class QueryDef(
    name: String,
    survey: String, // SURVEY.md §2 operator ids this query exercises
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
