package graft

import graft.queries.Registry

/** Benchmark main: runs the data-proportional queries against
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  *
  * Each query is fully materialized through a noop datasource write
  * (all columns computed and serialized — a bare .count() would let
  * Catalyst prune projection work and flatter the numbers). A failed
  * query reports -1.0 so breakage cannot masquerade as speed.
  *
  * Every query runs TWICE and the reported number is the min of the
  * two passes: a single contended pass (GC storm, another process on
  * the box) can no longer poison a round's signal. Both raw passes
  * are printed to stderr for auditability.
  */
object Bench {
  private val Passes = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkUtil.local()
    val queries = SparkEntry.queries
    // One warm scan so first-query numbers aren't dominated by parquet
    // footer reads / JIT; mirrors a warmed cluster's steady state.
    Tables.lineitem(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Stage the streaming watch dir once (setup, not query work) so
    // q_st1 times the stream, not a file copy.
    graft.streaming.CdcStream.ensureStaged(spark, sfDir)
    // Optional name args restrict the run (dev iteration on a subset);
    // the driver passes none and always benches the full registry.
    val names =
      if (args.nonEmpty) Registry.benchNames.filter(args.toSet) else Registry.benchNames
    val results = names.map { name =>
      val passes = (1 to Passes).map { _ =>
        val t0 = System.nanoTime()
        try {
          queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      }
      val ok = passes.filter(_ >= 0)
      val sec = if (ok.isEmpty) -1.0 else ok.min
      System.err.println(
        f"[bench] $name passes=${passes.map(p => f"$p%.3f").mkString(",")} min=$sec%.3f")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
