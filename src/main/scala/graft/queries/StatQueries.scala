package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical / mining operators over the events+orders tables: the
  * analytics a large-scale data platform layers on top of the
  * relational core — time-decayed scoring, robust outlier detection,
  * independence testing, association mining, sketch-based distinct
  * counting, BFS reachability, skyline.
  *
  * Oracle-parity follows the established discipline (QueryDef header):
  * every floating-point reduction either sums exactly-representable
  * values (dyadic rationals, exact-int products) or rounds each term
  * to 12dp and sums as DECIMAL(28,12), so the reduction order cannot
  * leak engine differences; every scalar chain is built from single
  * IEEE ops on identical operands, which both engines round
  * identically.
  *
  * ref: sql/views.sql analytic views + etl_validator.py outlier checks
  * motivate the family; the operators themselves extend the engine
  * beyond the reference per the round brief.
  */
object StatQueries {

  private def d28(c: Column): Column = c.cast(DecimalType(28, 12))

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- A31 (time-decayed engagement score)
    QueryDef(
      "q_a31_decayed_score", "A31 time-decay weighted aggregate",
      // per-type engagement with a one-week half-life relative to the
      // corpus max timestamp. The weight is value / 2^weeks — a shift
      // and one IEEE division, both exactly reproducible (no libm pow
      // whose last-ulp could differ between engines); weeks is capped
      // at 40 because 2^-40 vanishes at the 12dp term rounding anyway.
      // Shape at scale: one scalar max (broadcast) + one map-side
      // partial-aggregated groupBy — a single shuffle of G rows.
      Some("""WITH m AS (SELECT max(epoch_us(ts)) AS mx FROM events),
             |w AS (SELECT event_type,
             |    LEAST(CAST(floor((m.mx - epoch_us(ts)) / 604800000000.0) AS INT), 40) AS wk,
             |    value FROM events CROSS JOIN m)
             |SELECT event_type, count(*) AS n_events,
             |round(CAST(sum(CAST(round(value / CAST(CAST(1 AS BIGINT) << wk AS DOUBLE), 12)
             |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS decayed_score
             |FROM w GROUP BY 1 ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val mx = ev.agg(max(unix_micros(col("ts"))).as("mx"))
        ev.crossJoin(broadcast(mx))
          .withColumn("wk",
            least(floor((col("mx") - unix_micros(col("ts"))) / lit(604800000000.0))
              .cast("int"), lit(40)))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            round(sum(d28(round(col("value") /
                expr("CAST(shiftleft(CAST(1 AS BIGINT), wk) AS DOUBLE)"), 12)))
              .cast("double"), 6).as("decayed_score"))
          .orderBy("event_type")
      }),

    // ---------------------------------------------------------------- A32 (robust outliers: median / MAD)
    QueryDef(
      "q_a32_mad_outliers", "A32 robust outlier detection (median/MAD)",
      // per-type robust z-score outlier count: |x − med| > 3·1.4826·MAD.
      // BOTH medians are exact nearest-rank order statistics computed
      // by the scale-safe two-level histogram selection
      // (operators/GroupedQuantiles — no parallelism collapse to the
      // group count, unlike a raw rank window). Every comparison chain
      // is single IEEE ops on identical operands (parquet doubles, the
      // exact median value, one literal), so the outlier set is
      // bit-identical across engines — no rounding needed before the
      // threshold compare; rounding is display-only.
      Some("""WITH e AS (SELECT event_type, value FROM events),
             |n AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1),
             |r AS (SELECT event_type, value,
             |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn FROM e),
             |med AS (SELECT r.event_type, r.value AS med FROM r JOIN n USING (event_type)
             |        WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
             |d AS (SELECT e.event_type, med.med, abs(e.value - med.med) AS adev
             |      FROM e JOIN med USING (event_type)),
             |r2 AS (SELECT event_type, adev,
             |    row_number() OVER (PARTITION BY event_type ORDER BY adev) AS rn FROM d),
             |mad AS (SELECT r2.event_type, r2.adev AS mad FROM r2 JOIN n USING (event_type)
             |        WHERE rn = CAST(ceil(0.5 * n) AS BIGINT))
             |SELECT d.event_type, min(n.n) AS n, round(min(d.med), 6) AS med,
             |round(min(mad.mad), 6) AS mad,
             |count(*) FILTER (WHERE d.adev > 4.4478 * mad.mad) AS n_outliers
             |FROM d JOIN mad USING (event_type) JOIN n USING (event_type)
             |GROUP BY 1 ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val e = Tables.events(s, dir).select("event_type", "value")
        val med = graft.operators.GroupedQuantiles
          .exactQuantiles(e, "event_type", "value", Seq(("med", 0.5)))
        val d = e.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = graft.operators.GroupedQuantiles
          .exactQuantiles(d.select("event_type", "adev"), "event_type", "adev",
            Seq(("mad", 0.5)))
        d.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(min(col("med")), 6).as("med"),
            round(min(col("mad")), 6).as("mad"),
            sum(when(col("adev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy("event_type")
      }),

    // ---------------------------------------------------------------- A33 (chi-square independence test)
    QueryDef(
      "q_a33_chisq", "A33 chi-square independence test",
      // is order priority independent of customer market segment?
      // Contingency counts are exact ints; each cell's expected value
      // is an exact-int product over one double division; the square
      // is a multiply, not libm pow; terms round to 12dp and sum as
      // DECIMAL so the 25-term reduction order cannot leak. Shape at
      // scale: fact⋈broadcast-dim, one groupBy to R·C cells, then
      // cell-count-sized math — marginals broadcast back.
      Some("""WITH j AS (SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             |obs AS (SELECT seg, pri, count(*) AS o FROM j GROUP BY 1, 2),
             |rt AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
             |ct AS (SELECT pri, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
             |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
             |terms AS (SELECT obs.seg, obs.pri,
             |    round((obs.o - (rt.r * ct.c) / nn.n) * (obs.o - (rt.r * ct.c) / nn.n)
             |          / ((rt.r * ct.c) / nn.n), 12) AS t
             |  FROM obs JOIN rt USING (seg) JOIN ct USING (pri) CROSS JOIN nn)
             |SELECT round(CAST(sum(CAST(t AS DECIMAL(28,12))) AS DOUBLE), 6) AS chi2,
             |(count(DISTINCT seg) - 1) * (count(DISTINCT pri) - 1) AS dof,
             |count(*) AS n_cells FROM terms""".stripMargin),
      (s, dir) => {
        val j = Tables.orders(s, dir)
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
        val obs = j.groupBy("seg", "pri").agg(count(lit(1)).as("o"))
        val rt = obs.groupBy("seg").agg(sum("o").as("r"))
        val ct = obs.groupBy("pri").agg(sum("o").as("c"))
        val nn = obs.agg(sum("o").as("n"))
        val ex = (col("r") * col("c")) / col("n")
        obs.join(broadcast(rt), "seg").join(broadcast(ct), "pri")
          .crossJoin(broadcast(nn))
          .withColumn("t", round((col("o") - ex) * (col("o") - ex) / ex, 12))
          .agg(round(sum(d28(col("t"))).cast("double"), 6).as("chi2"),
            ((countDistinct("seg") - 1) * (countDistinct("pri") - 1)).as("dof"),
            count(lit(1)).as("n_cells"))
      }),

    // ---------------------------------------------------------------- A34 (frequent itemset pairs / market basket)
    QueryDef(
      "q_a34_frequent_pairs", "A34 association mining (frequent pairs + lift)",
      // top co-occurring part pairs across order baskets with lift.
      // Apriori pruning is applied BEFORE pairing: only items whose
      // own support ≥ minsup can appear in a frequent pair, so the
      // quadratic within-basket self-join runs over the pruned item
      // stream (at 100 TB you additionally cap basket width — the
      // max basket here is 13, the cap is documented not needed).
      // Lift = sup·N / (f_a·f_b): exact-int products over one double
      // division — deterministic, tie-broken by ids.
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
             |freq AS (SELECT i, count(*) AS f FROM items GROUP BY 1 HAVING count(*) >= 2),
             |it2 AS (SELECT items.o, items.i, freq.f FROM items JOIN freq USING (i)),
             |pairs AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS support,
             |    min(a.f) AS fa, min(b.f) AS fb
             |  FROM it2 a JOIN it2 b ON a.o = b.o AND a.i < b.i GROUP BY 1, 2),
             |nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM items)
             |SELECT item_a, item_b, support,
             |round((support * nn.n) / (fa * fb), 6) AS lift
             |FROM pairs CROSS JOIN nn WHERE support >= 2
             |ORDER BY support DESC, lift DESC, item_a, item_b LIMIT 20""".stripMargin),
      (s, dir) => {
        val items = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("i")).distinct()
        val freq = items.groupBy("i").agg(count(lit(1)).as("f"))
          .filter(col("f") >= 2)
        val it2 = items.join(freq, "i")
        val pairs = it2.select(col("o"), col("i").as("item_a"), col("f").as("fa0"))
          .join(it2.select(col("o"), col("i").as("item_b"), col("f").as("fb0")), "o")
          .filter(col("item_a") < col("item_b"))
          .groupBy("item_a", "item_b")
          .agg(count(lit(1)).as("support"), min("fa0").as("fa"), min("fb0").as("fb"))
          .filter(col("support") >= 2)
        val nn = items.agg(countDistinct("o").as("n"))
        pairs.crossJoin(broadcast(nn))
          .select(col("item_a"), col("item_b"), col("support"),
            round((col("support") * col("n")) / (col("fa") * col("fb")), 6).as("lift"))
          .orderBy(col("support").desc, col("lift").desc, col("item_a"), col("item_b"))
          .limit(20)
      })
  )
}
