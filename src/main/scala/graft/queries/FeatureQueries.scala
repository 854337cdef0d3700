package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 wave 4: ML feature engineering (the training-data shapes a
  * feature store computes at corpus scale) plus the remaining feasible
  * TPC-H decision-support shapes and triangle counting.
  *
  * Conventions (COVERAGE.md determinism rules): money/values go through
  * exact cents-longs or decimal(18,4) and reach the output as DOUBLE/BIGINT
  * only; per-row doubles use one identical IEEE formula in both engines;
  * every output is totally ordered by a unique key; no NULL output columns
  * (sentinels instead).
  */
object FeatureQueries {

  private def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,4)")

  private val BIG_QTY = 300        // Q18 large-order quantity threshold
  private val Q17_BRAND = "Brand#23" // Q17 target brand
  private val TRI_MINW = 30        // co-occurrence weight floor for the triangle graph
  private val ENC_M = 100          // target-encoding smoothing pseudo-count
  private val SCALE6 = 1000000L    // embedding fixed-point scale (1e6 units)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q18 shape (large-volume orders): HAVING on the fact aggregate,
    // then the qualifying keyset drives the detail join — the aggregate is
    // one l_orderkey shuffle, the survivors are a tiny frame that BROADCASTS
    // back onto orders, so the detail side never re-shuffles. Quantities sum
    // in decimal (order-independent) and reach the edge as DOUBLE.
    "q_tpch_bigorders" -> { (s, dir) =>
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > BIG_QTY)
      Tables.orders(s, dir)
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("o_orderkey"))
    },

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // per-part average rewritten as a grouped aggregate joined back; the
    // threshold test `qty < 0.2 * avg` is the integer cross-multiplication
    // `5*q*n < sum_q` over cents-longs — no float boundary. Brand-filtered
    // part is broadcast; the per-part aggregate covers only that brand's
    // lineitems (semi-join before the agg), so both join inputs are
    // brand-sized, not corpus-sized.
    "q_tpch_smallqty" -> { (s, dir) =>
      val p = Tables.part(s, dir).filter(col("p_brand") === Q17_BRAND)
        .select(col("p_partkey"))
      val l = Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_extendedprice"),
          round(col("l_quantity") * 100).cast("long").as("q100"))
      val avgq = l.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("q100")).as("sum_q"), count(lit(1)).as("n_q"))
      l.join(broadcast(avgq), col("l_partkey") === col("pk"))
        .filter(col("q100") * 5 * col("n_q") < col("sum_q"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    },

    // triangle counting over the supplier co-occurrence graph (suppliers
    // sharing an order, co-occurrence weight >= TRI_MINW): the classic
    // oriented forward algorithm — every edge is stored once as src<dst, so
    // each triangle is enumerated exactly once by the path join
    // e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c). Edge generation is bounded per order
    // (lineitems per order are few), never an all-pairs product; the weight
    // floor is the density lever — at crawl scale co-occurrence graphs go
    // near-complete without it and the floor is what keeps the path join
    // candidate set linear in real triangles. Output: per-supplier triangle
    // membership counts.
    "q_graph_triangles" -> { (s, dir) =>
      val so = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("sk")).distinct()
      val edges = so.as("a").join(so.as("b"),
          col("a.o") === col("b.o") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("src"), col("b.sk").as("dst"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= TRI_MINW)
        .select(col("src"), col("dst"))
      val tri = edges.select(col("src").as("ta"), col("dst").as("tb"))
        .join(edges.select(col("src").as("tb"), col("dst").as("tc")), Seq("tb"))
        .join(edges.select(col("src").as("ta"), col("dst").as("tc")), Seq("ta", "tc"))
      tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("supp"))
        .groupBy(col("supp")).agg(count(lit(1)).as("n_triangles"))
        .orderBy(col("supp"))
    },

    // smoothed target encoding — the leakage-safe categorical feature:
    // enc(cat) = (sum + m·prior) / (n + m) with the global mean as prior.
    // Category stats are one groupBy; the global row is a broadcast; the
    // encoding math is ONE identical IEEE expression over exact cents-longs
    // in both engines, rounded at the edge.
    "q_feature_target_enc" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
        .select(col("c_mktsegment").as("segment"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      val per = c.groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      val glob = c.agg(count(lit(1)).as("n_all"), sum(col("cents")).as("sum_all"))
      per.crossJoin(broadcast(glob))
        .withColumn("prior",
          col("sum_all").cast("double") / col("n_all"))
        .select(col("segment"), col("n"),
          round(col("sum_cents").cast("double") / col("n"), 6).as("mean_cents"),
          round(col("prior"), 6).as("prior_cents"),
          round((col("sum_cents").cast("double") + lit(ENC_M.toDouble) * col("prior"))
            / (col("n") + ENC_M).cast("double"), 6).as("enc_cents"))
        .orderBy(col("segment"))
    },

    // per-user lag/rolling feature generation — the sequence-model feature
    // shape: previous values, trailing 3-row mean, seconds since the
    // previous event, all inside ONE user_id shuffle (every window shares
    // the same partitioning + ordering, so Catalyst plans a single Window
    // over a single Exchange). Missing-history rows carry -1 sentinels, not
    // NULLs; the rolling mean is a long-sum / count division rounded at the
    // edge.
    "q_lag_features" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val w3 = w.rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("lag1", coalesce(lag(col("cents"), 1).over(w), lit(-1L)))
        .withColumn("lag2", coalesce(lag(col("cents"), 2).over(w), lit(-1L)))
        .withColumn("roll3_mean",
          round(sum(col("cents")).over(w3).cast("double") /
            count(lit(1)).over(w3), 6))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap_s", coalesce(
          expr("(unix_micros(ts) - unix_micros(prev_ts)) div 1000000"), lit(-1L)))
        .select(col("event_id"), col("user_id"), col("cents"),
          col("lag1"), col("lag2"), col("roll3_mean"), col("gap_s"))
        .orderBy(col("event_id"))
    },

    // per-dimension embedding scaling stats — the normalization artifact a
    // feature pipeline freezes before training: mean/sd/min/max per
    // dimension. Floats enter exact fixed-point (1e6 units, float→double is
    // exact) so the sums are order-independent longs and the APPROXIMATE-
    // looking moments have an exact oracle; one explode + one dim-keyed
    // aggregate, no shuffle wider than 64 groups.
    "q_feature_scale" -> { (s, dir) =>
      val x = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("dim").cast("long").as("dim"),
          round(col("xf").cast("double") * SCALE6).cast("long").as("xl"))
      x.groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("xl")).as("s1"),
          sum(col("xl") * col("xl")).as("s2"),
          min(col("xl")).as("lo6"), max(col("xl")).as("hi6"))
        .select(col("dim"), col("n"),
          round(col("s1").cast("double") / col("n") / SCALE6, 6).as("mean"),
          round(sqrt(col("s2").cast("double") / col("n") -
            (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n")))
            / SCALE6, 6).as("sd"),
          round(col("lo6").cast("double") / SCALE6, 6).as("lo"),
          round(col("hi6").cast("double") / SCALE6, 6).as("hi"))
        .orderBy(col("dim"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q_tpch_bigorders" -> s"""
      WITH big AS (
        SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > $BIG_QTY)
      SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
             CAST(b.sum_qty AS DOUBLE) AS sum_qty
      FROM orders o
      JOIN big b ON o.o_orderkey = b.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      ORDER BY o.o_orderkey""",
    "q_tpch_smallqty" -> s"""
      WITH l AS (
        SELECT l_partkey, l_extendedprice,
               CAST(round(l_quantity * 100) AS BIGINT) AS q100
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = '$Q17_BRAND'),
      a AS (SELECT l_partkey AS pk, CAST(sum(q100) AS BIGINT) AS sum_q,
                   count(*) AS n_q
            FROM l GROUP BY 1)
      SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
               AS avg_yearly,
             count(*) AS n_small
      FROM l JOIN a ON l.l_partkey = a.pk
      WHERE l.q100 * 5 * a.n_q < a.sum_q""",
    "q_graph_triangles" -> s"""
      WITH so AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk FROM lineitem),
      e AS (SELECT a.sk AS src, b.sk AS dst
            FROM so a JOIN so b ON a.o = b.o AND a.sk < b.sk
            GROUP BY 1, 2 HAVING count(*) >= $TRI_MINW),
      tri AS (SELECT e1.src AS ta, e1.dst AS tb, e2.dst AS tc
              FROM e e1
              JOIN e e2 ON e2.src = e1.dst
              JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
      m AS (SELECT unnest([ta, tb, tc]) AS supp FROM tri)
      SELECT supp, count(*) AS n_triangles FROM m GROUP BY 1 ORDER BY supp""",
    "q_feature_target_enc" -> s"""
      WITH c AS (SELECT c_mktsegment AS segment,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer),
      per AS (SELECT segment, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
              FROM c GROUP BY 1),
      g AS (SELECT count(*) AS n_all, CAST(sum(cents) AS BIGINT) AS sum_all FROM c)
      SELECT per.segment, per.n,
             round(CAST(per.sum_cents AS DOUBLE) / per.n, 6) AS mean_cents,
             round(CAST(g.sum_all AS DOUBLE) / g.n_all, 6) AS prior_cents,
             round((CAST(per.sum_cents AS DOUBLE)
                 + $ENC_M.0 * (CAST(g.sum_all AS DOUBLE) / g.n_all))
               / CAST(per.n + $ENC_M AS DOUBLE), 6) AS enc_cents
      FROM per CROSS JOIN g
      ORDER BY per.segment""",
    "q_lag_features" -> """
      WITH e AS (SELECT event_id, user_id, ts,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events)
      SELECT event_id, user_id, cents,
             coalesce(lag(cents, 1) OVER w, -1) AS lag1,
             coalesce(lag(cents, 2) OVER w, -1) AS lag2,
             round(CAST(sum(cents) OVER w3 AS DOUBLE) / count(*) OVER w3, 6)
               AS roll3_mean,
             coalesce((epoch_us(ts) - epoch_us(lag(ts, 1) OVER w)) // 1000000, -1)
               AS gap_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",
    "q_feature_scale" -> s"""
      WITH x AS (
        SELECT CAST(unnest(range(1, len(embedding)+1)) - 1 AS BIGINT) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * $SCALE6) AS BIGINT) AS xl
        FROM embeddings),
      a AS (SELECT dim, count(*) AS n, CAST(sum(xl) AS BIGINT) AS s1,
                   CAST(sum(xl * xl) AS BIGINT) AS s2,
                   min(xl) AS lo6, max(xl) AS hi6
            FROM x GROUP BY 1)
      SELECT dim, n,
             round(CAST(s1 AS DOUBLE) / n / $SCALE6, 6) AS mean,
             round(sqrt(CAST(s2 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / $SCALE6, 6)
               AS sd,
             round(CAST(lo6 AS DOUBLE) / $SCALE6, 6) AS lo,
             round(CAST(hi6 AS DOUBLE) / $SCALE6, 6) AS hi
      FROM a ORDER BY dim""")
}
