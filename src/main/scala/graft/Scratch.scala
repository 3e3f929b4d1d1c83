package graft

/** Dev scratch main — quick environment smoke checks. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkUtil.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (t <- Tables.all) {
      try {
        val df = Tables.load(spark, dir, t)
        println(s"== $t: ${df.count()} rows")
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
