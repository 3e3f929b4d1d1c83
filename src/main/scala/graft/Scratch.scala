package graft

import java.nio.file.{Files, Paths}

/** Dev scratch main: with no args, environment smoke checks; with
  * `<sfDir> <outDir> name...`, a filtered Verify (only the named
  * queries) for fast oracle iteration via tools/selfcheck.py.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkUtil.local()
    if (args.length >= 3) {
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
