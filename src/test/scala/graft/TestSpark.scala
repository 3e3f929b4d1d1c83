package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sessions are expensive;
  * suites must not stop() it).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkUtil.local(4)
}
