package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the stats/mining family on hand-computed
  * micro-cases (the value-exact DuckDB oracle runs at sf0.01 via
  * Verify; these pin the algebra on inputs small enough to verify by
  * hand).
  */
class StatQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) = Registry.all.find(_.name == name).get

  test("decayed score: weight halves per elapsed week") {
    // three events, 0/1/2 weeks before the max ts, value 8 each:
    // 8/1 + 8/2 + 8/4 = 14
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), 1L, "view", 8.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-08 00:00:00"), 1L, "view", 8.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("stat_ev").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q("q_a31_decayed_score").fn(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_events") == 3L)
    assert(math.abs(out.head.getAs[Double]("decayed_score") - 14.0) < 1e-9)
  }

  test("MAD outliers: a planted far point is flagged, the bulk is not") {
    // values 10,11,12,13,14 + outlier 1000: med=12 (rank ceil(3)=3rd),
    // adev={2,1,0,1,2,988}, mad = 3rd smallest = 1; threshold 4.4478
    val rows = Seq(10.0, 11.0, 12.0, 13.0, 14.0, 1000.0).zipWithIndex.map {
      case (v, i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "t", v, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("stat_mad").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q("q_a32_mad_outliers").fn(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("med") == 12.0 && r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("chi-square: independent 2x2 table scores ~0, dof 1") {
    // counts proportional across segments => expected == observed
    val cust = Seq((1L, "n", 0, 0.0, "A"), (2L, "n", 0, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = (Seq.fill(10)((1L, "P")) ++ Seq.fill(30)((1L, "Q")) ++
      Seq.fill(20)((2L, "P")) ++ Seq.fill(60)((2L, "Q"))).zipWithIndex.map {
      case ((ck, pri), i) =>
        (i.toLong, ck, "O", 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("stat_chi").toString
    cust.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = q("q_a33_chisq").fn(spark, dir).collect().head
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-9)
    assert(r.getAs[Long]("dof") == 1L && r.getAs[Long]("n_cells") == 4L)
  }

  test("frequent pairs: support counts baskets, lift uses item frequencies") {
    // baskets: {1,2} x3, {1,3} x2, {2,3} x1 over 6 orders
    // => pair (1,2) support 3, f1=5, f2=4, lift=3*6/20=0.9
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L), (5L, 1L), (5L, 3L), (6L, 2L), (6L, 3L))
    val li = baskets.zipWithIndex.map { case ((o, p), i) =>
      (o, p, 1L, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")
    val dir = java.nio.file.Files.createTempDirectory("stat_fp").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = q("q_a34_frequent_pairs").fn(spark, dir).collect()
    val top = out.head
    assert(top.getAs[Long]("item_a") == 1L && top.getAs[Long]("item_b") == 2L)
    assert(top.getAs[Long]("support") == 3L)
    assert(math.abs(top.getAs[Double]("lift") - 0.9) < 1e-9)
  }

  private def purchases(pairs: Seq[(Long, Long)]): Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] =
    pairs.zipWithIndex.map { case ((u, k), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, "purchase",
        1.0, s"""{"k":$k}""")
    }

  test("BFS hops: chain 7->1->2->3 labels by distance, isolated pair is -1") {
    // edges need >=6 shared props.k; 7%7==0 seeds the BFS
    def share(a: Long, b: Long, k0: Long) =
      (0L until 6L).flatMap(d => Seq((a, k0 + d), (b, k0 + d)))
    val ev = purchases(
      share(7, 1, 100) ++ share(1, 2, 200) ++ share(2, 3, 300) ++ share(4, 5, 400))
    val dir = java.nio.file.Files.createTempDirectory("stat_bfs").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q("q_a35_bfs_hops").fn(spark, dir).collect()
      .map(r => r.getAs[Int]("hop") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(-1 -> 2L, 0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("skyline keeps exactly the non-dominated (price, size) points") {
    val parts = Seq((1L, 1.0, 5), (2L, 2.0, 10), (3L, 3.0, 3), (4L, 1.5, 5))
      .map { case (k, pr, sz) => (k, s"p$k", "B", "T", sz, pr) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val dir = java.nio.file.Files.createTempDirectory("stat_sky").toString
    parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = q("q_a36_skyline").fn(spark, dir).collect()
      .map(r => (r.getAs[Double]("price"), r.getAs[Int]("size"))).toSeq
    assert(out == Seq((1.0, 5), (2.0, 10)))
  }

  test("OLS trend recovers an exact linear signal: slope 2, intercept 5, r2 1") {
    val ev = (0 until 10).map { d =>
      (d.toLong, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00"), 1L,
        "t", 2.0 * d + 5.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("stat_ols").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = q("q_a38_ols_trend").fn(spark, dir).collect().head
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("range planner splits a uniform column into 8 near-equal partitions") {
    val li = (1 to 800).map { i =>
      (i.toLong, 1L, 1L, i, 1.0, i.toDouble, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")
    val dir = java.nio.file.Files.createTempDirectory("stat_rp").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = q("q_a40_range_planner").fn(spark, dir).collect()
    assert(out.length == 8)
    assert(out.map(_.getAs[Long]("n_rows")).forall(_ == 100L))
    assert(out.map(_.getAs[Int]("pid")).toSeq == (0 to 7))
  }

  test("cumulative HLL estimate is monotone and tracks exact cumulative counts") {
    val ev = (1L to 300L).map { u =>
      // 3 days: users 1-100 on day 1, 101-200 on day 2, 201-300 on day 3
      val day = ((u - 1) / 100 + 1).toInt
      (u, java.sql.Timestamp.valueOf(f"2024-02-0$day%d 00:00:00"), u, "view", 1.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("stat_hllc").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q("q_a41_hll_cumulative").fn(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_exact_cum")).toSeq == Seq(100L, 200L, 300L))
    val ests = out.map(_.getAs[Double]("est")).toSeq
    assert(ests == ests.sorted, "merged-register estimate must be monotone")
    assert(math.abs(ests.last - 300.0) / 300.0 < 0.35)
  }

  test("join-size profiler predicts exact join cardinality and top key") {
    // orders {1, 2, 2} x lineitem {1x2, 2x3}: est = 1*2 + 2*3 = 8,
    // top key 2 contributes 6 (share 0.75)
    val ord = Seq((1L, 1L), (2L, 2L), (3L, 2L)).map { case (ok, _) =>
      (ok, 1L, "O", 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .withColumn("o_orderkey", when(col("o_orderkey") === 3L, 2L)
        .otherwise(col("o_orderkey")))
    val li = (Seq.fill(2)(1L) ++ Seq.fill(3)(2L)).zipWithIndex.map { case (ok, i) =>
      (ok, 1L, 1L, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate")
    val dir = java.nio.file.Files.createTempDirectory("stat_js").toString
    ord.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = q("q_d18_join_size_profile").fn(spark, dir).collect().head
    assert(r.getAs[Long]("est_rows") == 8L)
    assert(r.getAs[Long]("top_key") == 2L && r.getAs[Long]("top_contrib") == 6L)
    assert(math.abs(r.getAs[Double]("top_share") - 0.75) < 1e-9)
  }

  test("entity resolution merges blocked name variants and elects the biggest") {
    // "alpha bolt"x3 and its typo "alphq bolt"x1 share the noun block and
    // are 1 edit apart; "gamma nut"x2 is its own entity
    val parts = (Seq.fill(3)("alpha bolt") ++ Seq("alphq bolt") ++
      Seq.fill(2)("gamma nut")).zipWithIndex.map { case (nm, i) =>
      (i.toLong, nm, "B", "T", 1, 1.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val dir = java.nio.file.Files.createTempDirectory("stat_er").toString
    parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = q("q_l44_entity_resolution").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("entity"), r.getAs[String]("canonical"),
        r.getAs[Long]("n_members"), r.getAs[Long]("total_parts"))).toSet
    assert(out == Set(("alpha bolt", "alpha bolt", 2L, 4L),
      ("gamma nut", "gamma nut", 1L, 2L)))
  }

  test("HLL sketch estimates 200 distinct users within 30%") {
    val ev = (1L to 200L).map(u =>
      (u, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("stat_hll").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = q("q_a37_hll_distinct").fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") == 200L)
    assert(math.abs(r.getAs[Double]("est") - 200.0) / 200.0 < 0.3)
  }

  test("k-core peeling: pendant drops round 1, K4 core is a fixpoint") {
    import spark.implicits._
    // users 1-4 share ks {1..6} pairwise (K4); user 5 shares {7..12}
    // with user 1 only (a pendant). k=3 peeling: round 1 drops 5
    // (degree 1), rounds 2-4 hold the K4 (degree 3 each).
    val rows = ((1L to 4L).flatMap(u => (1L to 6L).map(k => (u, k))) ++
      (7L to 12L).map(k => (1L, k)) ++ (7L to 12L).map(k => (5L, k)))
      .zipWithIndex.map { case ((u, k), i) =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u,
          "purchase", 1.0, s"""{"k": $k}""")
      }
    val dir = java.nio.file.Files.createTempDirectory("stat_kcore").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = q("q_a50_kcore").fn(spark, dir).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("active_edges"), r.getAs[Long]("sum_u")))
    // round 1 counts edges over ALL 5 nodes: K4 = 12 directed + the
    // pendant pair = 2 more; survivors = the K4, checksum 1+2+3+4
    assert(out.toSeq == Seq((1, 4L, 14L, 10L), (2, 4L, 12L, 10L),
      (3, 4L, 12L, 10L), (4, 4L, 12L, 10L)), out.toSeq.toString)
  }
}
