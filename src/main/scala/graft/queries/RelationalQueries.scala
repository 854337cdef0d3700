package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.Streams

/** Relational extensions beyond the reference surface (SURVEY.md §2.5):
  * joins, grouped aggregation, windows, rollup, set ops, as-of join.
  *
  * Scale notes (100 TB design intent, verified on .explain):
  * - dimension joins (nation/region/customer at TPC-H ratios) are broadcast —
  *   no shuffle of the fact table;
  * - fact-fact joins shuffle on the join key once, with AQE left on;
  * - decimal(18,4) casts make revenue sums order-independent (exact), so
  *   results are stable under any partitioning/merge order — a correctness
  *   property that also removes the need for any single-threaded reduce.
  */
object RelationalQueries {

  private def dec(c: String): org.apache.spark.sql.Column =
    col(c).cast("decimal(18,4)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: single shuffle on 6-ish groups, partial aggregation
    // map-side; all sums exact (integral doubles or decimal).
    "q_groupby_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .withColumn("disc_price",
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          // decimal internally (order-independent exact sum); final output cast
          // to double — decimal output columns never hash-match the oracle
          // because the two readers represent decimals differently.
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(col("disc_price")).cast("double").as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // star join: lineitem PRE-AGGREGATED by orderkey before the join (shuffles
    // ~10× fewer, compact rows — the shape that matters at 100 TB), dimensions
    // broadcast; revenue per nation. Decimal sums decompose exactly, so the
    // result is identical to the direct join.
    "q_join_bcast" -> { (s, dir) =>
      val liAgg = Tables.lineitem(s, dir)
        .withColumn("rev", (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n"))
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"), sum(col("n")).as("n_items"))
        .orderBy(col("n_name"))
    },

    // the same star query over a BUCKETED layout of both big sides
    // ([[graft.tdf.TDF.SnapshotBucketed]], external tables under /tmp): the
    // pre-aggregate rides the buckets' hash partitioning and the orders join
    // runs bucket-to-bucket, so the fact table is never shuffled — the
    // layout lever a deployment pre-pays for its hottest join key.
    // Standalone BucketedJoinExperiment runs measured 0.63-0.80s vs 1.25s
    // plain at sf0.1; the bench's layout row now measures both plans
    // interleaved with task telemetry, which is the artifact of record.
    // Same oracle as q_join_bcast: layout must never change answers.
    "q_join_bucketed" -> { (s, dir) =>
      val li = graft.tdf.TDF(Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")))
        .SnapshotBucketed("graft_q_li_bucketed", "l_orderkey", 32,
          Some(s"${Tables.scratchRoot}/graft_q_li_bucketed")).toDF
      val o = graft.tdf.TDF(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey")))
        .SnapshotBucketed("graft_q_o_bucketed", "o_orderkey", 32,
          Some(s"${Tables.scratchRoot}/graft_q_o_bucketed")).toDF
      val liAgg = li
        .withColumn("rev", (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n"))
      liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"), sum(col("n")).as("n_items"))
        .orderBy(col("n_name"))
    },

    // semi + anti join in one result row
    "q_semi_anti" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
      val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti").count()
      import s.implicits._
      Seq((withOrders, withoutOrders)).toDF("n_with_orders", "n_without_orders")
    },

    // window: top-3 orders per customer by totalprice (deterministic tiebreak)
    "q_window_topk" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
        .orderBy(col("o_custkey"), col("rk"))
    },

    // running window aggregation: cumulative quantity per supplier by shipdate
    "q_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .filter(col("l_suppkey") <= 10)
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },

    // rollup with sentinel labels (no NULLs in output — sort-stable everywhere)
    "q_rollup" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("rflag"), col("lstatus"))
    },

    // set operations over distinct key sets
    "q_setops" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      // part-sized pins: intersect and except are two SEPARATE count
      // actions — no within-plan exchange reuse is possible across them,
      // so unpinned each side's filter+distinct ran twice
      val a = li.filter(col("l_returnflag") === "A").select(col("l_partkey")).distinct()
        .localCheckpoint(false)
      val r = li.filter(col("l_returnflag") === "R").select(col("l_partkey")).distinct()
        .localCheckpoint(false)
      import s.implicits._
      Seq((a.intersect(r).count(), a.except(r).count())).toDF("n_intersect", "n_except")
    },

    "q_distinct" -> { (s, dir) =>
      Tables.lineitem(s, dir).agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_supps"),
        count_distinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"))
    },

    // window-function breadth: lag/lead/ntile/percent_rank/first/last
    "q_window_funcs" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .filter(col("o_custkey") <= 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0)).as("prev_price"),
          coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)).as("next_price"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          first(col("o_orderkey")).over(wf).as("first_key"),
          last(col("o_orderkey")).over(wf).as("last_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // window NAVIGATION completeness (the q_window_funcs sibling):
    // cume_dist and dense_rank over a TIE-PRONE order (priority — both are
    // tie-deterministic, they depend only on key values), nth_value over
    // the unique total order (frame order among ties is nondeterministic,
    // so navigation functions never ride the tie-prone window). One
    // custkey exchange serves all three.
    "q_window_navigation" -> { (s, dir) =>
      val wp = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderpriority"))
      val wu = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = wu.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .filter(col("o_custkey") <= 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(cume_dist().over(wp), 9).as("prio_cume"),
          dense_rank().over(wp).cast("long").as("prio_drank"),
          coalesce(nth_value(col("o_orderkey"), 2).over(wf), lit(-1L))
            .as("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // outer-join family with sentinel-filled nulls
    "q_join_outer" -> { (s, dir) =>
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      n.join(c, col("n_nationkey") === col("c_nationkey"), "full_outer")
        .select(
          coalesce(col("n_name"), lit("NO_NATION")).as("nation"),
          coalesce(col("n_cust"), lit(0L)).as("n_customers"))
        .orderBy(col("nation"))
    },

    // cogroup: per-key imperative processing of two datasets (typed API) —
    // customers with their orders, computing stats in one pass per key
    "q_cogroup" -> { (s, dir) =>
      import org.apache.spark.sql.Encoders
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal"))
        .as[(Long, Double)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_totalprice"))
        .as[(Long, Double)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      val out = c.groupByKey(_._1)(Encoders.scalaLong)
        .cogroup(o.groupByKey(_._1)(Encoders.scalaLong)) { (key, cs, os) =>
          val cust = cs.toSeq
          if (cust.isEmpty) Iterator.empty
          else {
            var n = 0L
            var cents = 0L
            os.foreach { case (_, p) => n += 1; cents += math.round(p * 100) }
            Iterator((key, cust.head._2, n, cents))
          }
        }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.scalaLong, Encoders.scalaLong))
        .toDF("c_custkey", "acctbal", "n_orders", "total_cents")
      out.orderBy(col("c_custkey"))
    },

    // as-of join via the CUSTOM OPERATOR (LogicalPlan + Strategy + SparkPlan,
    // graft.plans.AsOfJoin): co-partitioned streaming merge, O(1) task state
    "q_asof_custom" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      graft.plans.AsOfJoin.join(clicks, views, "c_user", "v_user", "c_ts", "v_ts")
        .select(col("click_id").as("event_id"), col("c_user").as("user_id"),
          col("c_ts").as("ts"), col("v_ts").as("prev_view_ts"))
        .orderBy(col("event_id"))
    },

    // as-of with a match tolerance (pandas merge_asof parity): same custom
    // operator, matches farther than 1 day back drop — the best candidate is
    // the only possible in-tolerance match, so this is exactly ASOF + filter
    "q_asof_tolerance" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      graft.plans.AsOfJoin.join(clicks, views, "c_user", "v_user", "c_ts", "v_ts",
        toleranceMicros = Some(86400000000L))
        .select(col("click_id").as("event_id"), col("c_user").as("user_id"),
          col("c_ts").as("ts"), col("v_ts").as("prev_view_ts"))
        .orderBy(col("event_id"))
    },

    // FORWARD as-of: for each click, the EARLIEST strictly-later view — the
    // mirror direction through the same streaming merge (both sides sorted
    // ts-descending; identical O(1) state machine over the flipped comparator)
    "q_asof_forward" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      graft.plans.AsOfJoin.join(clicks, views, "c_user", "v_user", "c_ts", "v_ts",
        forward = true)
        .select(col("click_id").as("event_id"), col("c_user").as("user_id"),
          col("c_ts").as("ts"), col("v_ts").as("next_view_ts"))
        .orderBy(col("event_id"))
    },

    // as-of join: for each click, the most recent strictly-earlier view by the
    // same user. Implemented shuffle-once: tag + union + prefix-max window —
    // the sort-merge as-of pattern that scales (no per-row probe, no range
    // cross join). Clicks sort before views at equal ts → strict inequality.
    "q_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("k"),
          col("event_id"), lit(null).cast("timestamp").as("view_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), lit(1).as("k"),
          lit(null).cast("long").as("event_id"), col("ts").as("view_ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(views)
        .withColumn("prev_view_ts", max(col("view_ts")).over(w))
        .filter(col("k") === 0 && col("prev_view_ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"), col("prev_view_ts"))
        .orderBy(col("event_id"))
    },

    // NEAREST-direction as-of: the closest view on EITHER side of each
    // click, composed from the custom operator's backward and forward
    // passes (each is the one-candidate-per-row sort-merge — the
    // composition stays two merges, never a per-user range product;
    // backward wins exact-distance ties). The gap and side ride along as
    // audit columns.
    "q_asof_nearest" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val back = graft.plans.AsOfJoin.join(clicks, views,
          "c_user", "v_user", "c_ts", "v_ts")
        .select(col("click_id"), col("v_ts").as("prev_ts"))
      val fwd = graft.plans.AsOfJoin.join(clicks, views,
          "c_user", "v_user", "c_ts", "v_ts", forward = true)
        .select(col("click_id"), col("v_ts").as("next_ts"))
      val gapPrev = unix_micros(col("c_ts")) - unix_micros(col("prev_ts"))
      val gapNext = unix_micros(col("next_ts")) - unix_micros(col("c_ts"))
      clicks.join(back, Seq("click_id"), "left")
        .join(fwd, Seq("click_id"), "left")
        .filter(col("prev_ts").isNotNull || col("next_ts").isNotNull)
        .withColumn("use_prev",
          col("next_ts").isNull || (col("prev_ts").isNotNull && gapPrev <= gapNext))
        .select(col("click_id").as("event_id"), col("c_user").as("user_id"),
          col("c_ts").as("ts"),
          when(col("use_prev"), col("prev_ts")).otherwise(col("next_ts"))
            .as("nearest_view_ts"),
          when(col("use_prev"), gapPrev).otherwise(gapNext).as("gap_us"),
          when(col("use_prev"), lit("prev")).otherwise(lit("next")).as("side"))
        .orderBy(col("event_id"))
    },

    // POINT-IN-TIME feature join — the feature-store primitive: for each
    // prediction point (click at time t), the last-3-purchase aggregate of
    // the SAME user as of strictly before t (no leakage). Rolling features
    // are precomputed ON THE HISTORY side with a user-partitioned window
    // (cumsum minus lag(cumsum, k) — never a per-point range product),
    // collapsed to one row per (user, ts) instant for determinism, then the
    // custom as-of operator attaches the latest feature row below each t:
    // two key shuffles total, O(1) merge state, the shape that serves a
    // 100 TB feature store. Clicks with no prior purchase drop (inner
    // as-of, the operator's contract).
    "q_asof_features" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_eid"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Features.attachLast3(
          clicks, graft.ops.Features.lastK(purchases, 3))
        .orderBy(col("event_id"))
    },

    // AS-OF LAST-K — the sequence-model serving shape: for each click, the
    // user's 3 most recent strictly-earlier purchases AS ROWS (rank 1 =
    // most recent), through the k-deque variant of the custom merge
    // operator — one shuffle per side, O(k) retained rows per task, never
    // a per-point range product. p_eid tiebreaks same-timestamp purchases
    // so ranks are deterministic in both engines.
    "q_asof_lastk" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_eid"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.plans.AsOfJoin.joinLastK(clicks, purchases,
          "c_user", "p_user", "c_ts", "p_ts", 3, Some("p_eid"))
        .select(col("click_id").as("event_id"), col("c_user").as("user_id"),
          col("c_ts").as("ts"), col("asof_rank").as("rnk"),
          col("p_ts"), col("cents"))
        .orderBy(col("event_id"), col("rnk"))
    },

    // the STREAMING point-in-time serving twin: the last-3 feature frame is
    // PERSISTED as a parquet artifact (the feature-registry shape), clicks
    // arrive on a stream and each micro-batch as-of-attaches against it —
    // stateless stream-static (each click needs only its own batch + the
    // frozen artifact), so the streamed union equals the batch join exactly
    // (shared oracle). Retry-idempotent `batch=<id>` sink.
    "q_stream_features" -> { (s, dir) =>
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val artifact = s"${Tables.scratchRoot}/graft_feat_artifact_$tag"
      val purchases = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_eid"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Features.lastK(purchases, 3)
        .write.mode("overwrite").parquet(artifact)
      Streams.streamingPointInTime(s, dir, artifact,
          s"${Tables.scratchRoot}/graft_stream_feat_$tag")
        .orderBy(col("event_id"))
    },

    // MULTI-KEY as-of through the custom operator: for each order, the SAME
    // customer's most recent strictly-earlier order of the SAME priority —
    // the composite (custkey, priority) key rides as one derived column
    // through the single-key merge (key equality is exact, so concat with a
    // separator loses nothing), dates lift to timestamps for the ordered
    // comparator, and same-day ties collapse instant-style (max orderkey
    // wins) so the as-of candidate is deterministic in both engines.
    "q_asof_multikey" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val left = o.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority"), col("o_orderdate"),
        concat_ws("|", col("o_custkey"), col("o_orderpriority")).as("lk"),
        col("o_orderdate").cast("timestamp").as("lts"))
      val right = o.withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey"), col("o_orderpriority"),
            col("o_orderdate")).orderBy(col("o_orderkey").desc)))
        .filter(col("rn") === 1)
        .select(concat_ws("|", col("o_custkey"), col("o_orderpriority")).as("rk"),
          col("o_orderdate").cast("timestamp").as("rts"),
          col("o_orderdate").as("prev_date"), col("cents").as("prev_cents"))
      graft.plans.AsOfJoin.join(left, right, "lk", "rk", "lts", "rts")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate"), col("prev_date"), col("prev_cents"),
          datediff(col("o_orderdate"), col("prev_date")).cast("long").as("gap_days"))
        .orderBy(col("o_orderkey"))
    },

    // TIME-windowed point-in-time features — [[q_asof_features]]'s range
    // sibling: per click, count/sum/mean of the user's purchases in
    // [t−7d, t). The range aggregate is a DIFFERENCE OF TWO AS-OF LOOKUPS
    // against the per-user cumulative purchase series (cum through the last
    // purchase strictly below t, minus cum through the last strictly below
    // t−7d) — two sort-merge as-ofs with O(1) state instead of a range join
    // whose per-point candidate set is unbounded. The oracle computes the
    // range aggregate directly, so it independently proves the subtraction
    // identity. Clicks with no purchase in the window drop (inner range
    // semantics, mirroring the oracle's join).
    "q_asof_features_window" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"), (col("ts") - expr("INTERVAL 7 DAYS")).as("c_ts_lo"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_eid"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Features.attachWindow(
          clicks, graft.ops.Features.cumulative(purchases))
        .orderBy(col("event_id"))
    },

    // the STREAMING window-feature serving twin: the cumulative series is
    // the persisted artifact, each click micro-batch runs its TWO as-of
    // lookups against it statelessly ⇒ equals the batch windowed join
    // exactly (shared oracle)
    "q_stream_features_window" -> { (s, dir) =>
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val artifact = s"${Tables.scratchRoot}/graft_cum_artifact_$tag"
      val purchases = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_eid"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Features.cumulative(purchases)
        .write.mode("overwrite").parquet(artifact)
      Streams.streamingWindowFeatures(s, dir, artifact,
          s"${Tables.scratchRoot}/graft_stream_featw_$tag")
        .orderBy(col("event_id"))
    }
  )

  def oracles: Map[String, String] = {
    // rolling last-3 purchase features, instant-deduped, as-of-attached per
    // click — shared by the batch gate and the stateless streaming serve
    val pitFeaturesSql = """
      WITH p AS (SELECT user_id, ts, event_id, round(value*100)::BIGINT AS cents
                 FROM events WHERE event_type = 'purchase'),
      f AS (SELECT user_id, ts, event_id,
              CAST(sum(cents) OVER w3 AS BIGINT) AS cents3,
              CAST(count(*) OVER w3 AS BIGINT) AS n3
            FROM p WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)),
      d AS (SELECT user_id, ts, n3, cents3 FROM f
            QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                       ORDER BY event_id DESC) = 1)
      SELECT c.event_id, c.user_id, c.ts, d.ts AS last_purchase_ts,
             d.n3, d.cents3,
             round(CAST(d.cents3 AS DOUBLE) / d.n3, 6) AS mean_cents3
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN d ON c.user_id = d.user_id AND c.ts > d.ts
      ORDER BY c.event_id"""
    // the DIRECT [t−7d, t) range aggregate — independently proves the
    // engine's two-as-of cumulative-subtraction identity; shared by the
    // batch gate and the stateless streaming serve
    val pitWindowSql = """
      WITH p AS (SELECT user_id, ts, round(value*100)::BIGINT AS cents
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click')
      SELECT c.event_id, c.user_id, c.ts,
             CAST(count(*) AS BIGINT) AS n7,
             CAST(sum(p.cents) AS BIGINT) AS cents7,
             round(CAST(sum(p.cents) AS DOUBLE) / count(*), 6) AS mean7
      FROM c JOIN p ON p.user_id = c.user_id
        AND p.ts >= c.ts - INTERVAL 7 DAY AND p.ts < c.ts
      GROUP BY 1, 2, 3 ORDER BY c.event_id"""
    Map(
    "q_groupby_agg" -> """
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             avg(l_quantity) AS avg_qty,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_join_bcast" -> """
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "q_join_bucketed" -> """
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "q_semi_anti" -> """
      SELECT (SELECT count(*) FROM customer WHERE EXISTS
               (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
             (SELECT count(*) FROM customer WHERE NOT EXISTS
               (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders""",
    "q_window_topk" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q_window_running" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber,
             sum(l_quantity) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      FROM lineitem WHERE l_suppkey <= 10
      ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "q_rollup" -> """
      SELECT coalesce(l_returnflag, 'ALL') AS rflag,
             coalesce(l_linestatus, 'ALL') AS lstatus,
             count(*) AS n, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY rflag, lstatus""",
    "q_setops" -> """
      WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
           r AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R')
      SELECT (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM r)) AS n_intersect,
             (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM r)) AS n_except""",
    "q_distinct" -> """
      SELECT count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
      FROM lineitem""",
    "q_window_navigation" -> """
      SELECT o_custkey, o_orderkey,
             round(cume_dist() OVER wp, 9) AS prio_cume,
             CAST(dense_rank() OVER wp AS BIGINT) AS prio_drank,
             coalesce(nth_value(o_orderkey, 2) OVER wf, -1) AS second_key
      FROM orders
      WHERE o_custkey <= 50
      WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority),
             wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",
    "q_window_funcs" -> """
      SELECT o_custkey, o_orderkey,
             coalesce(lag(o_totalprice, 1) OVER w, -1.0) AS prev_price,
             coalesce(lead(o_totalprice, 1) OVER w, -1.0) AS next_price,
             ntile(4) OVER w AS quartile,
             round(percent_rank() OVER w, 9) AS pct_rank,
             first_value(o_orderkey) OVER wf AS first_key,
             last_value(o_orderkey) OVER wf AS last_key
      FROM orders WHERE o_custkey <= 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",
    "q_join_outer" -> """
      SELECT coalesce(n_name, 'NO_NATION') AS nation,
             coalesce(n_cust, 0) AS n_customers
      FROM nation FULL OUTER JOIN
           (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
        ON n_nationkey = c_nationkey
      ORDER BY nation""",
    "q_asof_join" -> """
      SELECT c.event_id, c.user_id, c.ts, v.ts AS prev_view_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND c.ts > v.ts
      ORDER BY c.event_id""",
    "q_cogroup" -> """
      SELECT c_custkey, c_acctbal AS acctbal,
             count(o_orderkey)::BIGINT AS n_orders,
             CAST(coalesce(sum(round(o_totalprice*100)::BIGINT), 0) AS BIGINT) AS total_cents
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_acctbal ORDER BY c_custkey""",
    "q_asof_custom" -> """
      SELECT c.event_id, c.user_id, c.ts, v.ts AS prev_view_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND c.ts > v.ts
      ORDER BY c.event_id""",
    // the streaming enrichment is stateless per batch against the same
    // static view side, so its union equals the batch as-of exactly
    "q_stream_asof" -> """
      SELECT c.event_id, c.user_id, c.ts, v.ts AS prev_view_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND c.ts > v.ts
      ORDER BY c.event_id""",
    // the asof candidate is the latest earlier view, so bounding the gap is
    // exactly a post-filter (any other view is farther away)
    "q_asof_tolerance" -> """
      SELECT c.event_id, c.user_id, c.ts, v.ts AS prev_view_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND c.ts > v.ts
      WHERE epoch_us(c.ts) - epoch_us(v.ts) <= 86400000000
      ORDER BY c.event_id""",
    "q_asof_forward" -> """
      SELECT c.event_id, c.user_id, c.ts, v.ts AS next_view_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND c.ts < v.ts
      ORDER BY c.event_id""",
    "q_asof_features" -> pitFeaturesSql,
    // streamed attach against the persisted artifact is stateless per
    // batch ⇒ equals the batch join exactly (shared oracle)
    "q_stream_features" -> pitFeaturesSql,
    // last-k as rows: the oracle ranks ALL earlier purchases per click
    // (ts desc, event_id desc tiebreak — mirroring the engine's p_eid
    // tiebreak) and keeps rank <= 3; the k-deque merge must equal it
    "q_asof_lastk" -> """
      WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
      p AS (SELECT user_id, ts, event_id, round(value*100)::BIGINT AS cents
            FROM events WHERE event_type = 'purchase'),
      r AS (SELECT c.event_id, c.user_id, c.ts, p.ts AS p_ts, p.cents,
                   row_number() OVER (PARTITION BY c.event_id
                     ORDER BY p.ts DESC, p.event_id DESC) AS rnk
            FROM c JOIN p ON p.user_id = c.user_id AND p.ts < c.ts)
      SELECT event_id, user_id, ts, rnk, p_ts, cents
      FROM r WHERE rnk <= 3 ORDER BY event_id, rnk""",
    // multi-equality ASOF: DuckDB takes the composite key as plain extra
    // equality conditions — same relation as the engine's concat key
    "q_asof_multikey" -> """
      WITH o AS (SELECT o_orderkey, o_custkey, o_orderpriority, o_orderdate,
                   round(o_totalprice*100)::BIGINT AS cents FROM orders),
      d AS (SELECT o_custkey, o_orderpriority, o_orderdate, cents FROM o
            QUALIFY row_number() OVER (PARTITION BY o_custkey,
                o_orderpriority, o_orderdate ORDER BY o_orderkey DESC) = 1)
      SELECT l.o_orderkey, l.o_custkey, l.o_orderpriority, l.o_orderdate,
             r.o_orderdate AS prev_date, r.cents AS prev_cents,
             CAST(datediff('day', r.o_orderdate, l.o_orderdate) AS BIGINT)
               AS gap_days
      FROM o l ASOF JOIN d r
        ON l.o_custkey = r.o_custkey
       AND l.o_orderpriority = r.o_orderpriority
       AND l.o_orderdate > r.o_orderdate
      ORDER BY l.o_orderkey""",
    "q_asof_features_window" -> pitWindowSql,
    // stateless per batch vs the persisted cumulative artifact
    "q_stream_features_window" -> pitWindowSql,
    // per-click argmin over the user's views (gap, then backward-first);
    // the reference semantics the two-merge composition must reproduce
    "q_asof_nearest" -> """
      WITH j AS (
        SELECT c.event_id, c.user_id, c.ts, v.ts AS v_ts,
               abs(epoch_us(c.ts) - epoch_us(v.ts)) AS gap_us,
               CASE WHEN v.ts < c.ts THEN 'prev' ELSE 'next' END AS side,
               row_number() OVER (PARTITION BY c.event_id
                 ORDER BY abs(epoch_us(c.ts) - epoch_us(v.ts)),
                          CASE WHEN v.ts < c.ts THEN 0 ELSE 1 END) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts <> v.ts)
      SELECT event_id, user_id, ts, v_ts AS nearest_view_ts, gap_us, side
      FROM j WHERE rn = 1 ORDER BY event_id"""
    )
  }
}
