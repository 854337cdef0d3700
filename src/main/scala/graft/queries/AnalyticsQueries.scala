package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 analytics breadth: classic multi-join decision-support shapes
  * (TPC-H Q3/Q15 analogs — the reference's event-loop cuts generalized to
  * the relational star schema), time-range rolling windows, cumulative
  * distinct, and exact equi-depth histograms.
  *
  * Conventions (COVERAGE.md determinism rules): money sums are
  * decimal(18,4) internally and cast to DOUBLE only at the output edge;
  * every output is totally ordered by a unique key; no NULL/decimal
  * output columns.
  */
object AnalyticsQueries {

  private def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,4)")

  /** Revenue expression shared by the TPC-H shapes (exact decimal). */
  private def revenue: org.apache.spark.sql.Column =
    dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 shape (shipping priority): both fact-side filters reach the
    // parquet scans (PushedFilters), the customer dim is broadcast, and the
    // orders↔lineitem join shuffles only the date-filtered remainder. Top-10
    // by exact revenue with a key tiebreak, so the limit is deterministic.
    "q_tpch_shipping" -> { (s, dir) =>
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-03-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-03-15"))
        .select(col("l_orderkey"), revenue.as("rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q15 shape (top supplier): quarter revenue per supplier, then the
    // argmax via a broadcast 1-row max — equality on revenue is exact because
    // both sides fold the identical decimal sum before the double cast.
    "q_tpch_topsupp" -> { (s, dir) =>
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue).as("total_rev"))
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_rev"))
        .orderBy(col("s_suppkey"))
    },

    // time-RANGE rolling window: per-priority daily revenue with a trailing
    // 7-day sum/count. The window ranges over a day NUMBER (datediff from
    // epoch) so Spark's rangeBetween(-6, 0) is exactly DuckDB's
    // RANGE INTERVAL 6 DAY PRECEDING; frames are days-sized per priority
    // (metric scale), so the sort inside each partition is trivial at any
    // fact volume — the facts collapse to daily rows before any window runs.
    "q_window_rolling" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("rev"))
        .withColumn("day_num", datediff(col("day"), lit("1970-01-01")).cast("long"))
      val w = Window.partitionBy(col("pri")).orderBy(col("day_num")).rangeBetween(-6, 0)
      daily
        .withColumn("n_7d", sum(col("n")).over(w))
        .withColumn("rev_7d", sum(col("rev")).over(w).cast("double"))
        .select(col("pri"), col("day"), col("n"), col("n_7d"), col("rev_7d"))
        .orderBy(col("pri"), col("day"))
    },

    // cumulative distinct users by day WITHOUT a running distinct-state
    // window (which would be quadratic): a user contributes to every day ≥
    // their first-seen day, so cum distinct = running sum of first-seen
    // counts — two days-sized aggregates and one days-sized running window.
    "q_cum_distinct" -> { (s, dir) =>
      val dated = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val daily = dated.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
      val firsts = dated.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(firsts, Seq("day"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        // global window over a days-sized frame — metric scale, one task by design
        .withColumn("cum_users", sum(col("n_new")).over(w))
        .select(col("day"), col("n_active"), col("n_new"), col("cum_users"))
        .orderBy(col("day"))
    },

    // exact equi-depth histogram: ntile over a TOTAL order (value + unique
    // key tiebreak) so bucket membership is deterministic in both engines.
    // The global sort is the exact form's inherent cost — at 100 TB the
    // approximate path is approx_percentile cutpoints (q_percentile /
    // q_approx_sketch family); this gate is the exact anchor those
    // estimates are judged against.
    "q_histo_equidepth" -> { (s, dir) =>
      val b = 10
      val w = Window.orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir)
        .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("bucket", ntile(b).over(w).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy(col("bucket"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q_tpch_shipping" -> """
      SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
             CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15'
        AND l.l_shipdate > TIMESTAMP '1998-03-15'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, l.l_orderkey
      LIMIT 10""",
    "q_tpch_topsupp" -> """
      WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
      FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
      WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
      ORDER BY s.s_suppkey""",
    "q_window_rolling" -> """
      WITH daily AS (
        SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
               count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY 1, 2)
      SELECT pri, day, n,
             CAST(sum(n) OVER w AS BIGINT) AS n_7d,
             CAST(sum(rev) OVER w AS DOUBLE) AS rev_7d
      FROM daily
      WINDOW w AS (PARTITION BY pri ORDER BY day
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      ORDER BY pri, day""",
    "q_cum_distinct" -> """
      WITH dated AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      daily AS (SELECT day, count(*) AS n_active FROM dated GROUP BY 1),
      firsts AS (SELECT day, count(*) AS n_new
                 FROM (SELECT user_id, min(day) AS day FROM dated GROUP BY 1)
                 GROUP BY 1)
      SELECT d.day, d.n_active, coalesce(f.n_new, 0) AS n_new,
             CAST(sum(coalesce(f.n_new, 0)) OVER (ORDER BY d.day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM daily d LEFT JOIN firsts f USING (day)
      ORDER BY d.day""",
    "q_histo_equidepth" -> """
      WITH t AS (
        SELECT l_extendedprice,
               CAST(ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
                 AS BIGINT) AS bucket
        FROM lineitem)
      SELECT bucket, count(*) AS n, min(l_extendedprice) AS lo,
             max(l_extendedprice) AS hi,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM t GROUP BY bucket ORDER BY bucket"""
  )
}
