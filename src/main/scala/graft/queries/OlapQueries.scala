package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 wave: the remaining classic TPC-H decision-support shapes the
  * gate did not yet carry — each one a distinct PLAN shape, not just another
  * aggregate (reference analog: the event-loop cut/aggregate chains of
  * h1analysisDataFrame.C generalized to the star schema):
  *
  *  - Q5  local supplier volume: the cyclic join graph (customer and
  *    supplier must share a nation) — the join-ORDER benchmark query.
  *  - Q6  forecast revenue: pure scan-side filter conjunction, the
  *    PushedFilters showcase (zero joins, zero shuffles beyond one agg).
  *  - Q8  market share: conditional-numerator / total-denominator within
  *    one aggregate pass.
  *  - Q13 customer distribution: outer-join + two-level aggregation
  *    (count-of-counts), including the zero group.
  *  - Q14 promo revenue share: two decimal sums in one pass, one division.
  *  - Q16 supplier-count by part attrs: count-distinct under an anti-joined
  *    exclusion list (lineitem stands in for partsupp — TESTDATA.md has no
  *    partsupp table).
  *  - Q11-analog important stock: group value vs a fraction-of-total gate,
  *    exact via cents-long cross-multiplication (no float threshold).
  *  - Q20-analog excess share: two aggregates at different granularities
  *    joined, integer cross-multiplied share test, semi-join out.
  *
  * Determinism rules as everywhere (COVERAGE.md): money folds in
  * decimal(18,4) (order-independent), integer counts/cents-longs for every
  * threshold compare, doubles only at the output edge or in ONE final IEEE
  * division both engines perform identically; every output totally ordered.
  */
object OlapQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,4)")
  private def revenue: Column = dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q5 (local supplier volume): the CYCLIC join graph — lineitem
    // joins supplier on suppkey AND the customer's nation must equal the
    // supplier's nation, so the plan must carry c_nationkey across the
    // orders join rather than re-joining customers at the end. All four
    // dims broadcast; the only big shuffle is orders⋈lineitem on orderkey.
    "q_tpch_localvol" -> { (s, dir) =>
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q6 (forecast revenue change): the pure-pushdown query — all
    // three predicates land as PushedFilters on the parquet scan, no join,
    // a single global aggregate. The double literals compare against the
    // same stored doubles in both engines, so the filter set is identical.
    "q_tpch_forecast" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24.0))
        .agg(sum(dec(col("l_extendedprice") * col("l_discount"))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // TPC-H Q1 (pricing summary report), the FULL form — q_groupby_agg
    // carries the lite version; this adds the tax-compounded charge and the
    // three averages. Sum discipline: quantities are integral doubles
    // (exact in any order), money folds in decimal(18,4), discounts fold as
    // exact percent-longs (0.01 steps are NOT exactly representable — a
    // float sum would be order-dependent); every average is the explicit
    // exact-sum / count division both engines evaluate identically. The
    // CHARGE is special: the triple double product lands near enough to
    // 4-decimal cast boundaries that engines' double→decimal paths diverge
    // (seen live: 43 boundary rows over 6M) — but price has ≤ 2 decimals
    // and discount/tax are exact hundredths, so cents·(100−d)·(100+t) is
    // an EXACT integer in micro-money units; fold that in decimal(38,0)
    // and divide once at the edge.
    "q_tpch_pricing" -> { (s, dir) =>
      val chargeMicro = (round(col("l_extendedprice") * 100).cast("long")
        * (lit(100L) - round(col("l_discount") * 100).cast("long"))
        * (lit(100L) + round(col("l_tax") * 100).cast("long")))
        .cast("decimal(38,0)")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).as("sbp"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sdp"),
          sum(chargeMicro).as("sch_micro"),
          sum(round(col("l_discount") * 100).cast("long")).as("sd100"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sbp").cast("double").as("sum_base_price"),
          col("sdp").cast("double").as("sum_disc_price"),
          (col("sch_micro").cast("double") / 1e6).as("sum_charge"),
          round(col("sum_qty") / col("count_order"), 6).as("avg_qty"),
          round(col("sbp").cast("double") / col("count_order"), 6).as("avg_price"),
          round(col("sd100").cast("double") / 100.0 / col("count_order"), 6)
            .as("avg_disc"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q9 analog (product-type profit): the DEEPEST join chain in the
    // suite — lineitem ⋈ orders ⋈ supplier ⋈ nation ⋈ part — grouped by
    // supplier nation × order year. No partsupp table exists, so cost is
    // the 0.6·retailprice·qty proxy; profit folds as one decimal sum of
    // the per-row difference. Dims broadcast; the fact shuffles once for
    // the orders join and once for the 2-key agg.
    "q_tpch_profit" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
            .filter(col("p_name").contains("widget"))
            .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            - lit(0.6) * col("p_retailprice") * col("l_quantity")))
          .cast("double").as("profit"),
          count(lit(1)).as("n_items"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q12 analog (shipping-delay priority audit): late lineitems
    // (shipped > 60 days after order) classified by linestatus, counting
    // critical (1-URGENT / 2-HIGH) vs lower priorities — the two
    // conditional counts ride ONE pass over the late join (the fixture has
    // no shipmode column; linestatus takes its grouping role).
    "q_tpch_shipmode" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // TPC-H Q8 (national market share): numerator (one nation's revenue)
    // and denominator (all-nation revenue) fold in the SAME aggregate pass
    // over the region-filtered join — never two scans; one IEEE division at
    // the edge. Share of NATION_2 suppliers in ASIA-customer order volume.
    "q_tpch_mktshare" -> { (s, dir) =>
      val asiaCust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1997-01-01"))
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_2", revenue).otherwise(dec(lit(0.0))))
            .as("nation_rev"),
          sum(revenue).as("total_rev"))
        .select(col("o_year"),
          col("nation_rev").cast("double").as("nation_rev"),
          col("total_rev").cast("double").as("total_rev"),
          (col("nation_rev").cast("double") / col("total_rev").cast("double"))
            .as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q13 (customer order distribution): LEFT OUTER join so
    // order-less customers keep a zero count, then the count-of-counts —
    // the first agg shuffles on custkey, the second is #distinct-counts
    // rows. The per-customer count never materializes wide rows: orders
    // pre-aggregates to (custkey, n) BEFORE meeting customers.
    "q_tpch_orderdist" -> { (s, dir) =>
      val perCust = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      Tables.customer(s, dir).select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q14 (promo revenue share): conditional and total decimal sums
    // in ONE scan of the month's lineitems (part dim broadcast), share via
    // a single division — the two-sums-one-pass sibling of Q8.
    "q_tpch_promo" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01") && col("l_shipdate") < lit("1996-04-01"))
        .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revenue).otherwise(dec(lit(0.0))))
            .as("promo_rev"),
          sum(revenue).as("total_rev"))
        .select(col("promo_rev").cast("double").as("promo_rev"),
          col("total_rev").cast("double").as("total_rev"),
          (lit(100.0) * col("promo_rev").cast("double") / col("total_rev").cast("double"))
            .as("promo_share"))
    },

    // TPC-H Q16 (supplier count by part attributes): how many distinct
    // suppliers serve each (brand, type) group — lineitem stands in for
    // partsupp as the part↔supplier association. The exclusion list
    // (complaint suppliers: suppkey % 10 == 0 here) anti-joins out BEFORE
    // the distinct agg; the association first dedups to (partkey, suppkey)
    // so the count-distinct shuffle moves pair-sized rows, not lineitems.
    "q_tpch_suppcount" -> { (s, dir) =>
      val assoc = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val excluded = Tables.supplier(s, dir)
        .filter(col("s_suppkey") % 10 === 0).select(col("s_suppkey"))
      assoc.join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, dir).filter(col("p_brand") =!= "Brand#1")
          .select(col("p_partkey"), col("p_brand"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
    },

    // TPC-H Q11 analog (important stock): parts whose total order value
    // exceeds 1/1300 of ALL order value (Q11's 0.0001·SF knob re-sized so
    // the gate is selective yet non-empty at the fixture's 2000 parts).
    // Value folds as exact cents-longs (extendedprice has ≤ 2 decimals),
    // the global total broadcasts as one row, and the fraction gate is the
    // integer cross-multiplication value_cents·1300 > total_cents — no
    // float threshold anywhere.
    "q_tpch_valueparts" -> { (s, dir) =>
      // part-sized pin: feeds the total aggregate AND the threshold filter
      val perPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("value_cents"))
        .localCheckpoint(false)
      val total = perPart.agg(sum(col("value_cents")).as("total_cents"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_cents") * 1300L > col("total_cents"))
        .select(col("l_partkey"),
          (col("value_cents").cast("double") / 100.0).as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // TPC-H Q21 analog (suppliers who kept orders waiting): suppliers with
    // a LATE lineitem (shipped > 90 days after the order date) in a
    // multi-supplier order where every OTHER supplier shipped on time —
    // the EXISTS + NOT-EXISTS double-correlation shape: one semi-join and
    // one anti-join, both riding the orderkey equi-key with the s ≠ s2
    // residual, over the deduped (orderkey, suppkey[, late]) association.
    // No date column beyond shipdate exists in the fixture, so "late" is
    // ship-vs-order lag (the reference predicate uses receipt vs commit).
    "q_tpch_waiting" -> { (s, dir) =>
      val assoc = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("sk"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
        .groupBy(col("o"), col("sk"))
        .agg(max(col("late")).as("late"))
        // three consumers (the late side, the semi, the anti) — pin ONE
        // computation of the fact join + pair aggregate
        .localCheckpoint(false)
      val mine = assoc.filter(col("late"))
        .select(col("o"), col("sk"))
      val others = assoc.select(col("o").as("o2"), col("sk").as("sk2"), col("late"))
      mine
        .join(others.select(col("o2"), col("sk2")),
          col("o") === col("o2") && col("sk") =!= col("sk2"), "left_semi")
        .join(others.filter(col("late")).select(col("o2"), col("sk2")),
          col("o") === col("o2") && col("sk") =!= col("sk2"), "left_anti")
        .groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, dir)), col("sk") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    },

    // TPC-H Q2 analog (min-cost supplier per part): the per-part argmin
    // join-back — cheapest observed unit price is an INTEGER min (cents),
    // so the argmin is exact; ties break on suppkey via the (cost, supp)
    // struct-min, one aggregate + one broadcast-dim join, restricted to
    // ASIA suppliers and large parts
    "q_tpch_mincost" -> { (s, dir) =>
      // supplier-sized pin: feeds the semi-join build, the final attach,
      // and its own projection — three broadcast builds of the same dims
      val asiaSupp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .localCheckpoint(false)
      val offers = Tables.lineitem(s, dir)
        .join(broadcast(asiaSupp.select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("cost_cents"))
      val best = offers
        .groupBy(col("l_partkey"))
        .agg(min(struct(col("cost_cents"), col("l_suppkey"))).as("b"))
        .select(col("l_partkey"), col("b.cost_cents").as("cost_cents"),
          col("b.l_suppkey").as("l_suppkey"))
      best
        .join(broadcast(Tables.part(s, dir).filter(col("p_size") >= 45)
          .select(col("p_partkey"), col("p_name"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
          col("n_name"),
          (col("cost_cents").cast("double") / 100.0).as("min_cost"))
        .orderBy(col("p_partkey"))
    },

    // TPC-H Q20 analog (excess share suppliers): suppliers that shipped
    // MORE THAN HALF of some part's 1996 volume. (part,supp) and part
    // aggregates join back part-keyed; the share test is the exact integer
    // cross-multiplication 2·supp_qty > part_qty (quantities are
    // integer-valued); the winners semi-join the supplier dim.
    "q_tpch_excess" -> { (s, dir) =>
      val shipped = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
      val perPair = shipped.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("supp_qty"))
      val perPart = shipped.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("part_qty"))
      val winners = perPair
        .join(perPart, Seq("l_partkey"))
        .filter(col("supp_qty") * 2L > col("part_qty"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(winners, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q_tpch_localvol" -> """
      SELECT n.n_name,
             CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
               AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
      ORDER BY revenue DESC, n.n_name""",
    "q_tpch_forecast" -> """
      SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24.0""",
    "q_tpch_mktshare" -> """
      WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               sum(CASE WHEN ns.n_name = 'NATION_2'
                   THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))
                   ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS nation_rev,
               sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)))
                 AS total_rev
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        JOIN region r ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1)
      SELECT o_year, CAST(nation_rev AS DOUBLE) AS nation_rev,
             CAST(total_rev AS DOUBLE) AS total_rev,
             CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS mkt_share
      FROM vol ORDER BY o_year""",
    "q_tpch_orderdist" -> """
      WITH per_cust AS (
        SELECT o_custkey, count(*) AS n FROM orders
        WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
      SELECT coalesce(p.n, 0) AS c_count, count(*) AS custdist
      FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
      GROUP BY 1
      ORDER BY custdist DESC, c_count DESC""",
    "q_tpch_promo" -> """
      WITH t AS (
        SELECT sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS promo_rev,
               sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)))
                 AS total_rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate < TIMESTAMP '1996-04-01')
      SELECT CAST(promo_rev AS DOUBLE) AS promo_rev,
             CAST(total_rev AS DOUBLE) AS total_rev,
             100.0 * CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS promo_share
      FROM t""",
    "q_tpch_suppcount" -> """
      WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT p.p_brand, p.p_type, count(DISTINCT a.l_suppkey) AS supplier_cnt
      FROM assoc a
      JOIN part p ON a.l_partkey = p.p_partkey
      WHERE p.p_brand <> 'Brand#1'
        AND a.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
      GROUP BY 1, 2
      ORDER BY supplier_cnt DESC, p.p_brand, p.p_type""",
    "q_tpch_valueparts" -> """
      WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
        FROM lineitem GROUP BY 1),
      total AS (SELECT sum(value_cents) AS total_cents FROM per_part)
      SELECT p.l_partkey, CAST(p.value_cents AS DOUBLE) / 100.0 AS part_value
      FROM per_part p, total t
      WHERE p.value_cents * 1300 > t.total_cents
      ORDER BY part_value DESC, p.l_partkey""",
    "q_tpch_pricing" -> """
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1e6
               AS sum_charge,
             round(sum(l_quantity) / count(*), 6) AS avg_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               / count(*), 6) AS avg_price,
             round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_tpch_profit" -> """
      SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18,4)))
               AS DOUBLE) AS profit,
             count(*) AS n_items
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC""",
    "q_tpch_shipmode" -> """
      SELECT l.l_linestatus,
             CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      GROUP BY 1 ORDER BY 1""",
    "q_tpch_waiting" -> """
      WITH assoc AS (
        SELECT l.l_orderkey AS o, l.l_suppkey AS sk,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                   THEN 1 ELSE 0 END) = 1 AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2)
      SELECT s.s_suppkey, s.s_name, count(*) AS numwait
      FROM assoc a
      JOIN supplier s ON a.sk = s.s_suppkey
      WHERE a.late
        AND EXISTS (SELECT 1 FROM assoc b WHERE b.o = a.o AND b.sk <> a.sk)
        AND NOT EXISTS (SELECT 1 FROM assoc c
                        WHERE c.o = a.o AND c.sk <> a.sk AND c.late)
      GROUP BY 1, 2
      ORDER BY numwait DESC, s.s_suppkey""",
    "q_tpch_mincost" -> """
      WITH asia_supp AS (
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'),
      offers AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM asia_supp)
        GROUP BY 1, 2),
      best AS (
        SELECT l_partkey, cost_cents, l_suppkey
        FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
                ORDER BY cost_cents, l_suppkey) AS rn FROM offers)
        WHERE rn = 1)
      SELECT p.p_partkey, p.p_name, a.s_suppkey, a.s_name, a.n_name,
             CAST(b.cost_cents AS DOUBLE) / 100.0 AS min_cost
      FROM best b
      JOIN part p ON b.l_partkey = p.p_partkey
      JOIN asia_supp a ON b.l_suppkey = a.s_suppkey
      WHERE p.p_size >= 45
      ORDER BY p.p_partkey""",
    "q_tpch_excess" -> """
      WITH shipped AS (
        SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'),
      per_pair AS (SELECT l_partkey, l_suppkey, sum(qty) AS supp_qty
                   FROM shipped GROUP BY 1, 2),
      per_part AS (SELECT l_partkey, sum(qty) AS part_qty FROM shipped GROUP BY 1)
      SELECT s.s_suppkey, s.s_name
      FROM supplier s
      WHERE s.s_suppkey IN (
        SELECT a.l_suppkey FROM per_pair a JOIN per_part b USING (l_partkey)
        WHERE a.supp_qty * 2 > b.part_qty)
      ORDER BY s.s_suppkey"""
  )
}
