package graft.io

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("a fresh catalog re-registers existing bucket files instead of rewriting") {
    val (tOrders, tLineitem) = Bucketing.ensureOrdersLineitemBucketed(spark, sf)
    val warehouse = new Path(spark.sessionState.conf.warehousePath)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataMtimes(t: String): Map[String, Long] =
      fs.listStatus(new Path(warehouse, t)).map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = (dataMtimes(tOrders), dataMtimes(tLineitem))
    val nOrders = spark.table(tOrders).count()

    // simulate a fresh JVM: lose the catalog entries but keep the
    // files (move them aside so the managed-table drop can't delete
    // them, then restore)
    Seq(tOrders, tLineitem).foreach { t =>
      val loc = new Path(warehouse, t)
      val tmp = new Path(warehouse, s"__bktspec_stash_$t")
      assert(fs.rename(loc, tmp))
      spark.sql(s"DROP TABLE IF EXISTS $t")
      assert(fs.rename(tmp, loc))
    }
    assert(!spark.catalog.tableExists(tOrders))

    val (t2o, t2l) = Bucketing.ensureOrdersLineitemBucketed(spark, sf)
    assert((t2o, t2l) == ((tOrders, tLineitem)))
    assert(spark.catalog.tableExists(tOrders) && spark.catalog.tableExists(tLineitem))
    // not rewritten: every data file untouched
    assert((dataMtimes(tOrders), dataMtimes(tLineitem)) == before)
    assert(spark.table(tOrders).count() == nOrders)

    // and the re-registered pair still co-locates: SMJ with no exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(tOrders)
        .join(spark.table(tLineitem).withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"re-registered bucketed join still shuffles:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
