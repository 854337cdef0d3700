package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Graph, TextOps}
import graft.streaming.Streams

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

  /** Exact decimal revenue expression (DOUBLE only at the output edge). */
  private def revenueD: org.apache.spark.sql.Column =
    dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  private val BIG_QTY = 300        // Q18 large-order quantity threshold
  private val Q17_BRAND = "Brand#23" // Q17 target brand
  private val TRI_MINW = 30        // co-occurrence weight floor for the triangle graph
  private val ENC_M = 100          // target-encoding smoothing pseudo-count
  private val SCALE6 = 1000000L    // embedding fixed-point scale (1e6 units)
  private val CC_MINW = 35         // weight floor for the components graph (fragments it)
  private val KCORE_K = 3          // k-core density threshold
  private val KCORE_ROUNDS = 6     // peel rounds unrolled in the oracle
  private val KANON_K = 8          // k-anonymity suppression threshold
  private val PSI_BINS = 10        // PSI bucket count
  private val PSI_CUTOFF = "2024-01-16" // reference/current period split
  private val BASKET_MIN = 3       // association-rule min co-occurrence
  private val IDLE_CUTOFF = "2000-01-01" // Q22 shape: "no orders since" cutoff

  /** (event_type, cents, is_ref) projection shared by the PSI monitors. */
  private def psiEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("event_type"),
      round(col("value") * 100).cast("long").as("c"),
      (col("ts") < lit(PSI_CUTOFF).cast("timestamp")).as("is_ref"))

  /** Frozen reference bounds: (lo, hi, width) as one row. */
  private def psiBounds(ev: DataFrame): DataFrame =
    ev.filter(col("is_ref"))
      .agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
      .withColumn("width",
        ceil((col("hi") - col("lo") + 1).cast("double") / PSI_BINS).cast("long"))

  /** Edge-clamped bucket id from (c, lo, width) columns. */
  private def psiBucket: org.apache.spark.sql.Column =
    least(greatest(expr("(c - lo) div width"), lit(0L)), lit((PSI_BINS - 1).toLong))

  /** From sparse (event_type, bucket, nr, nc) counts to the PSI report:
    * complete the grid, Laplace-smooth, sum 1e9-scaled integer terms,
    * alarm on the exact scaled long.
    */
  private def psiAssemble(ev: DataFrame, cnt: DataFrame): DataFrame = {
    val b = PSI_BINS
    val grid = ev.select(col("event_type")).distinct()
      .withColumn("bucket", explode(sequence(lit(0L), lit((b - 1).toLong))))
    val full = grid.join(cnt, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("nr"), lit(0L)).as("nr"), coalesce(col("nc"), lit(0L)).as("nc"))
    val tot = full.groupBy(col("event_type"))
      .agg(sum(col("nr")).as("tr"), sum(col("nc")).as("tc"))
    val p = (col("nr") + 1).cast("double") / (col("tr") + b)
    val q = (col("nc") + 1).cast("double") / (col("tc") + b)
    full.join(broadcast(tot), Seq("event_type"))
      .withColumn("t9", round((p - q) * log(p / q) * 1e9).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("tr")).as("n_ref"), max(col("tc")).as("n_cur"),
        sum(col("t9")).as("s9"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round(col("s9").cast("double") / 1e9, 6).as("psi"),
        when(col("s9") > 100000000L, 1L).otherwise(0L).as("drifted"))
      .orderBy(col("event_type"))
  }

  /** Weekday seasonal-index assembly from a (day, n) daily-count frame —
    * shared by the batch profile and its streaming twin.
    */
  private def seasonalityFrom(daily: DataFrame): DataFrame = {
    val per = daily.withColumn("dow", dayofweek(col("day")).cast("long"))
      .groupBy(col("dow")).agg(count(lit(1)).as("n_days"), sum(col("n")).as("total"))
    val overall = per.agg(sum(col("total")).as("tot"), sum(col("n_days")).as("td"))
    per.crossJoin(broadcast(overall))
      .select(col("dow"), col("n_days"), col("total"),
        round(col("total").cast("double") / col("n_days"), 6).as("mean_n"),
        round((col("total").cast("double") / col("n_days"))
          / (col("tot").cast("double") / col("td")), 6).as("seasonal_index"))
      .orderBy(col("dow"))
  }

  /** Exact per-category p05/p95 winsorization cut points via rank over a
    * total order — the frozen artifact shared by the batch gate and the
    * streaming maintenance twin. Input: (event_type, c, event_id).
    */
  private def winsorBounds(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("c"), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("lo_rk", greatest(ceil(col("n") * 0.05).cast("long"), lit(1L)))
      .withColumn("hi_rk", ceil(col("n") * 0.95).cast("long"))
      .filter(col("rn") === col("lo_rk") || col("rn") === col("hi_rk"))
      .groupBy(col("event_type"))
      .agg(min(col("c")).as("lo_c"), max(col("c")).as("hi_c"))
  }

  /** The weight-floored supplier co-occurrence edge list shared by the
    * graph gates (src < dst, one row per undirected edge).
    */
  private def coEdges(s: SparkSession, dir: String, minW: Int): DataFrame = {
    val so = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("sk")).distinct()
    so.as("a").join(so.as("b"),
        col("a.o") === col("b.o") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("src"), col("b.sk").as("dst"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minW)
      .select(col("src"), col("dst"))
  }

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
      // three references into the path/closure joins — pin one computation
      val edges = coEdges(s, dir, TRI_MINW).localCheckpoint(false)
      val tri = edges.select(col("src").as("ta"), col("dst").as("tb"))
        .join(edges.select(col("src").as("tb"), col("dst").as("tc")), Seq("tb"))
        .join(edges.select(col("src").as("ta"), col("dst").as("tc")), Seq("ta", "tc"))
      tri.select(explode(array(col("ta"), col("tb"), col("tc"))).as("supp"))
        .groupBy(col("supp")).agg(count(lit(1)).as("n_triangles"))
        .orderBy(col("supp"))
    },

    // connected components as a first-class graph op: the pairs→labels
    // star-contraction machinery (O(log n) rounds, pairs-only frames —
    // graft.ops.Dedup.connectedComponents) applied to a general weighted
    // graph instead of a dedup candidate set. Each node labels with its
    // component's MINIMUM node id — the same fixpoint the oracle's
    // recursive reachability CTE computes; component sizes ride a
    // components-sized window.
    "q_graph_components" -> { (s, dir) =>
      val pairs = coEdges(s, dir, CC_MINW)
        .select(col("src").as("id_a"), col("dst").as("id_b"))
      val labels = Dedup.connectedComponents(pairs)
        .select(col("id").as("node"), col("label").as("component"))
      val sizes = labels.groupBy(col("component")).agg(count(lit(1)).as("comp_size"))
      labels.join(broadcast(sizes), Seq("component"))
        .select(col("node"), col("component"), col("comp_size"))
        .orderBy(col("node"))
    },

    // the STREAMING funnel twin: per-user stage mins maintained live on the
    // event stream (min is commutative/associative ⇒ batch-boundary-
    // invariant), the strict-order funnel logic applied to the DRAINED
    // mins — lands exactly on the batch funnel (shared oracle shape).
    "q_stream_funnel" -> { (s, dir) =>
      Streams.streamingFunnelStages(s, dir)
        .withColumn("reached_click",
          (col("t_view").isNotNull && col("t_click") > col("t_view")).cast("int"))
        .withColumn("reached_purchase",
          (col("reached_click") === 1 && col("t_purchase") > col("t_click")).cast("int"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(when(col("t_view").isNotNull, 1).otherwise(0)).cast("long").as("n_view"),
          sum(col("reached_click")).cast("long").as("n_view_click"),
          sum(col("reached_purchase")).cast("long").as("n_full_funnel"))
    },

    // PSI drift monitoring — the production feature-drift alarm: the value
    // distribution of the CURRENT period vs the REFERENCE period, per
    // event_type, over a bucket grid FROZEN from the reference (the
    // monitoring discipline: bins are part of the stored artifact, so a
    // drifted current period can never move its own goalposts). Counts are
    // Laplace-smoothed over the complete grid; each bucket's
    // (p−q)·ln(p/q) term is rounded into 1e9-scaled longs so the PSI sum
    // is order-independent, and the alarm threshold compares the exact
    // scaled long — no float boundary.
    "q_psi_drift" -> { (s, dir) =>
      val ev = psiEvents(s, dir)
      val cnt = ev.crossJoin(broadcast(psiBounds(ev)))
        .withColumn("bucket", psiBucket)
        .groupBy(col("event_type"), col("bucket"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("nr"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("nc"))
      psiAssemble(ev, cnt)
    },

    // the STREAMING drift twin: the reference side (counts + frozen bucket
    // bounds) is the batch-built artifact; the CURRENT period's bucket
    // counts are maintained live on the stream (long-additive complete-mode
    // state, (event_type × bucket)-sized). Assembly and alarm are identical
    // to the batch monitor — shared oracle.
    "q_stream_psi" -> { (s, dir) =>
      val ev = psiEvents(s, dir)
      val bounds = psiBounds(ev).localCheckpoint()
      val ref = ev.filter(col("is_ref")).crossJoin(broadcast(bounds))
        .withColumn("bucket", psiBucket)
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("nr"))
      val cur = Streams.streamingPsiCounts(s, dir, bounds, PSI_CUTOFF, PSI_BINS)
      val cnt = ref.join(cur, Seq("event_type", "bucket"), "full_outer")
        .select(col("event_type"), col("bucket"),
          coalesce(col("nr"), lit(0L)).as("nr"), coalesce(col("nc"), lit(0L)).as("nc"))
      psiAssemble(ev, cnt)
    },

    // TPC-H Q19 shape (disjunctive predicate groups): the brand/size/qty
    // OR-of-ANDs that naive planners evaluate post-join. The hand-derived
    // IMPLIED conjuncts (brand ∈ {…}, size ≤ 15, qty ≤ 30) are stated
    // explicitly so they reach the scans as PushedFilters — the classic
    // manual rewrite when the optimizer can't extract common predicates
    // from a cross-side disjunction; the exact disjunction then prunes the
    // survivors post-join.
    "q_tpch_disjunct" -> { (s, dir) =>
      val p = Tables.part(s, dir)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
          col("p_size").between(1, 15))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_quantity") <= 30)
        .select(col("l_partkey"), col("l_quantity"),
          revenueD.as("rev"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // neighbor-set Jaccard — the link-prediction feature matrix: candidate
    // pairs are nodes sharing a neighbor (the two-path join — Σ C(deg, 2)
    // rows, bounded because the co-occurrence weight floor bounds degree),
    // similarity from exact integer neighbor counts, existing edges
    // flagged (a link predictor trains on is_edge=0 rows, validates on 1s).
    "q_graph_linkpred" -> { (s, dir) =>
      // the edge list feeds FIVE consumers (adj twice via the two-path
      // self-join, deg, is_edge) — pin ONE computation of the
      // lineitem-distinct + self-join + groupBy subtree (the
      // q_tpch_waiting idiom)
      val e = coEdges(s, dir, TRI_MINW).localCheckpoint(false)
      val adj = e.select(col("src").as("node"), col("dst").as("nbr"))
        .union(e.select(col("dst").as("node"), col("src").as("nbr")))
      val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val cn = adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), Seq("nbr"))
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
      cn
        .join(broadcast(deg.select(col("node").as("a"), col("deg").as("deg_a"))), Seq("a"))
        .join(broadcast(deg.select(col("node").as("b"), col("deg").as("deg_b"))), Seq("b"))
        .join(e.select(col("src").as("a"), col("dst").as("b"), lit(1L).as("is_edge")),
          Seq("a", "b"), "left")
        .select(col("a").as("node_a"), col("b").as("node_b"), col("cn"),
          col("deg_a"), col("deg_b"),
          round(col("cn").cast("double") / (col("deg_a") + col("deg_b") - col("cn")), 6)
            .as("jaccard"),
          coalesce(col("is_edge"), lit(0L)).as("is_edge"))
        .orderBy(col("node_a"), col("node_b"))
    },

    // Kolmogorov–Smirnov drift — PSI's nonparametric sibling: the max CDF
    // gap between reference and current periods per event_type, computed
    // EXACTLY by integer cross-multiplication (|cum_ref·tot_cur −
    // cum_cur·tot_ref| over the merged value points — no float CDF
    // anywhere, so the max and the alarm are engine-exact; the single
    // division to the reported KS happens once at the edge). Frames are
    // distinct-value-sized inside one event_type partitioning.
    "q_ks_drift" -> { (s, dir) =>
      val ev = psiEvents(s, dir)
      val pts = ev.groupBy(col("event_type"), col("c"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("nr"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("nc"))
        // value-point-sized pin: feeds the CDF window AND the totals
        .localCheckpoint(false)
      val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = pts
        .withColumn("cr", sum(col("nr")).over(w))
        .withColumn("cc", sum(col("nc")).over(w))
      val tot = pts.groupBy(col("event_type"))
        .agg(sum(col("nr")).as("tr"), sum(col("nc")).as("tc"))
      cum.join(broadcast(tot), Seq("event_type"))
        .withColumn("d", abs(col("cr") * col("tc") - col("cc") * col("tr")))
        .groupBy(col("event_type"), col("tr"), col("tc"))
        .agg(max(col("d")).as("max_d"))
        .select(col("event_type"), col("tr").as("n_ref"), col("tc").as("n_cur"),
          round(col("max_d").cast("double") / (col("tr") * col("tc")).cast("double"), 6)
            .as("ks"),
          when(col("max_d") * 100 > col("tr") * col("tc") * 5, 1L).otherwise(0L)
            .as("drifted"))
        .orderBy(col("event_type"))
    },

    // label-centroid similarity matrix — the embedding-space eval that
    // shows which classes collide: per-label per-dim centroids as
    // xl-unit integer longs (round(s1/n) — exact inputs, one deterministic
    // division each), then pairwise cosine from EXACT integer dot/norm
    // sums; only the final sqrt/divide is float, one identical formula
    // both engines. Label-pair-sized output.
    "q_embed_centroid_sim" -> { (s, dir) =>
      val x = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("label"), col("dim").cast("long").as("dim"),
          round(col("xf").cast("double") * SCALE6).cast("long").as("xl"))
      val cent = x.groupBy(col("label"), col("dim"))
        .agg(round(sum(col("xl")).cast("double") / count(lit(1))).cast("long").as("cm"))
        // (label, dim)-sized pin: feeds both sides of the pair self-join —
        // unpinned the posexplode + mean aggregate ran twice
        .localCheckpoint(false)
      val pair = cent.select(col("label").as("label_a"), col("dim"), col("cm").as("ca"))
        .join(cent.select(col("label").as("label_b"), col("dim"), col("cm").as("cb")),
          Seq("dim"))
        .filter(col("label_a") < col("label_b"))
      pair.groupBy(col("label_a"), col("label_b"))
        .agg(sum(col("ca") * col("cb")).as("dot"),
          sum(col("ca") * col("ca")).as("na2"),
          sum(col("cb") * col("cb")).as("nb2"))
        .select(col("label_a"), col("label_b"),
          round(col("dot").cast("double")
            / (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))), 6)
            .as("cos_sim"))
        .orderBy(col("label_a"), col("label_b"))
    },

    // market-basket association rules — the co-purchase recommender prep:
    // item pairs from per-order distinct part sets (pair generation bounded
    // by lineitems/order, never an item×item product), support/confidence/
    // lift from exact counts with ONE identical IEEE division chain per
    // metric; min-co-occurrence floor keeps the rule set to genuinely
    // repeated pairs.
    "q_basket_rules" -> { (s, dir) =>
      // the deduped (order, part) association feeds FOUR consumers (total,
      // per-item counts, both sides of the pair self-join) — pin one
      // computation of the distinct
      val op = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        .localCheckpoint(false)
      val tot = op.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
      val ni = op.groupBy(col("p")).agg(count(lit(1)).as("n_i"))
      val pairs = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("item_a"), col("b.p").as("item_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= BASKET_MIN)
      pairs
        .join(broadcast(ni.select(col("p").as("item_a"), col("n_i").as("n_a"))), Seq("item_a"))
        .join(broadcast(ni.select(col("p").as("item_b"), col("n_i").as("n_b"))), Seq("item_b"))
        .crossJoin(broadcast(tot))
        .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
          round(col("n_ab").cast("double") / col("n_orders"), 6).as("support"),
          round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_ab"),
          round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_ba"),
          round(col("n_ab").cast("double") * col("n_orders")
            / (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
        .orderBy(col("item_a"), col("item_b"))
    },

    // percentile winsorization — the outlier-clipping feature prep: exact
    // per-category p05/p95 cut points via rank over a total order (the
    // exact anchor; approx_percentile is the documented 100 TB path), values
    // clipped to the cut points, clipped-mean + clip-count audit per
    // category. Boundary picks are rank-exact, so both engines choose the
    // identical row.
    "q_feature_winsorize" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"), col("event_id"))
      val bnd = winsorBounds(e)
      e.join(broadcast(bnd), Seq("event_type"))
        .withColumn("clip", least(greatest(col("c"), col("lo_c")), col("hi_c")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c") < col("lo_c"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("c") > col("hi_c"), 1L).otherwise(0L)).as("n_clip_hi"),
          min(col("lo_c")).as("lo_c"), min(col("hi_c")).as("hi_c"),
          round(sum(col("clip")).cast("double") / count(lit(1)), 6).as("clipped_mean"))
        .orderBy(col("event_type"))
    },

    // the STREAMING winsorization twin: cut points are the FROZEN batch
    // artifact, the stream maintains clipped aggregates (all long-additive,
    // category-sized complete-mode state) — the feature-store serving path
    // for outlier clipping; lands exactly on the batch gate (shared oracle)
    "q_stream_winsorize" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"), col("event_id"))
      val bnd = winsorBounds(e).localCheckpoint()
      Streams.streamingWinsorize(s, dir, bnd)
        .select(col("event_type"), col("n"), col("n_clip_lo"), col("n_clip_hi"),
          col("lo_c"), col("hi_c"),
          round(col("s_clip").cast("double") / col("n"), 6).as("clipped_mean"))
        .orderBy(col("event_type"))
    },

    // day-of-week seasonality profile — the seasonal-index table a
    // forecasting pipeline freezes: mean daily volume per weekday over the
    // overall daily mean; facts collapse to daily rows first, so every
    // frame after the first aggregate is days- or weekday-sized
    "q_seasonality_profile" -> { (s, dir) =>
      seasonalityFrom(Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n")))
    },

    // the STREAMING twin: the days-sized daily-count table is maintained
    // live (the same complete-mode state q_stream_anomaly reads) and the
    // weekday profile assembles from the drained snapshot — counts are
    // long-additive, so it lands exactly on the batch profile (shared
    // oracle)
    "q_stream_seasonality" -> { (s, dir) =>
      seasonalityFrom(Streams.streamingDailyCounts(s, dir))
    },

    // TPC-H Q22 shape (lapsed high-balance customers): scalar average via a
    // broadcast 1-row aggregate, membership tested by integer
    // cross-multiplication (cents·n > Σcents — no float average anywhere),
    // recently-order-less customers via LEFT ANTI join (the NOT EXISTS
    // plan; the date filter reaches the orders scan before the anti join);
    // segment-sized output
    "q_tpch_idle_customers" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_custkey"),
        col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val pos = c.filter(col("cents") > 0)
        .agg(sum(col("cents")).as("sc"), count(lit(1)).as("np"))
      c.join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit(IDLE_CUTOFF)).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(pos))
        .filter(col("cents") * col("np") > col("sc"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("sum_cents"))
        .select(col("segment"), col("n_cust"),
          round(col("sum_cents").cast("double") / 100.0, 6).as("total_bal"))
        .orderBy(col("segment"))
    },

    // cohort LTV curve — cumulative purchase value per acquisition cohort:
    // cohorts from each user's first ACTIVE week (any event, the retention
    // gate's anchor), revenue from purchase cents, cumulated over a
    // cohort×week-sized window. The curve a growth team reads
    // per-cohort-per-age; exact cents end to end.
    "q_cohort_ltv" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val anchor = ev.agg(min(to_date(col("ts"))).as("d0"))
      val wk = ev.crossJoin(broadcast(anchor))
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")), col("d0")) / 7).cast("long").as("week"),
          col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      // NOTE r20: a localCheckpoint pin of `cohort` was MEASURED and
      // REJECTED here (A/B probe 0.80 → 0.88 s; unlike the retention twin,
      // wk is scan-level here so the re-derive is cheap)
      val cohort = wk.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      val sizes = cohort.groupBy(col("cohort_week")).agg(count(lit(1)).as("n_cohort"))
      val purch = wk.filter(col("event_type") === "purchase")
        .join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_since"))
        .agg(count(lit(1)).as("n_purch"), sum(col("cents")).as("cents_sum"))
      val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_since"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purch
        .withColumn("cum_cents", sum(col("cents_sum")).over(w))
        .join(broadcast(sizes), Seq("cohort_week"))
        .select(col("cohort_week"), col("week_since"), col("n_purch"),
          col("cents_sum"), col("cum_cents"), col("n_cohort"),
          round(col("cum_cents").cast("double") / col("n_cohort"), 6).as("ltv_cents"))
        .orderBy(col("cohort_week"), col("week_since"))
    },

    // chi-square independence monitor — is event_type independent of
    // weekday? Each cell's (o·N − r·c)²/(r·c·N) term is an exact-integer
    // numerator and denominator (one deterministic division), rounded into
    // 1e9-scaled longs before summing; the alarm compares the exact scaled
    // long. The complete r×c grid (absent cells count 0) is what makes the
    // statistic right — a sparse-only sum understates the divergence.
    "q_chisq_independence" -> { (s, dir) =>
      // cell-sized pin: the contingency counts feed FOUR differently-keyed
      // consumers (row sums, column sums, total, grid attach) — different
      // pruning per consumer defeats exchange reuse, so unpinned the event
      // scan + pair aggregate ran once per consumer
      val o = Tables.events(s, dir)
        .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
        .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("o"))
        .localCheckpoint(false)
      val r = o.groupBy(col("event_type")).agg(sum(col("o")).as("rn"))
      val c = o.groupBy(col("dow")).agg(sum(col("o")).as("cn"))
      val tot = o.agg(sum(col("o")).as("nn"), count(lit(1)).as("n_cells_obs"))
      val grid = r.crossJoin(c).join(o, Seq("event_type", "dow"), "left")
        .select(col("event_type"), col("dow"), col("rn"), col("cn"),
          coalesce(col("o"), lit(0L)).as("o"))
      val diff = col("o") * col("nn") - col("rn") * col("cn")
      grid.crossJoin(broadcast(tot))
        .withColumn("t9", round((diff * diff).cast("double")
          / (col("rn") * col("cn") * col("nn")).cast("double") * 1e9).cast("long"))
        .agg(countDistinct(col("event_type")).as("n_rows_dim"),
          countDistinct(col("dow")).as("n_cols_dim"),
          sum(col("t9")).as("s9"))
        .select(
          ((col("n_rows_dim") - 1) * (col("n_cols_dim") - 1)).as("dof"),
          round(col("s9").cast("double") / 1e9, 6).as("chi2"),
          when(col("s9") > 50000000000L, 1L).otherwise(0L).as("dependent"))
    },

    // join-key skew audit — the ops-side profiling that decides salting:
    // per-key frequencies → key-count, max, mean, max/mean skew ratio, and
    // the heaviest key (min-id tiebreak); key-sized frames after the first
    // aggregate.
    // robust daily-volume anomaly monitor — median/MAD instead of mean/σ
    // (q_anomaly_days' z-score breaks when the anomaly itself inflates σ;
    // the median absolute deviation doesn't): lower-median by row_number
    // over the (value, day) total order, MAD the same way over the
    // absolute deviations, flag = |n − med| > 3·MAD in pure longs. All
    // frames are days-sized; the global order windows are the exact
    // anchor (approx_percentile is the 100 TB path).
    "q_anomaly_mad" -> { (s, dir) =>
      // days-sized pin: feeds the count, the median window, and the
      // deviation attach — unpinned the daily aggregate ran per consumer
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val nd = daily.agg(count(lit(1)).as("nd"))
      def lowerMedian(df: DataFrame, vCol: String, out: String): DataFrame = {
        val w = Window.orderBy(col(vCol), col("day"))
        df.withColumn("__rn", row_number().over(w))
          .crossJoin(broadcast(nd))
          .filter(col("__rn") === expr("(nd + 1) div 2"))
          .select(col(vCol).as(out))
      }
      val med = lowerMedian(daily, "n", "med")
      val dev = daily.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("n") - col("med")))
      val mad = lowerMedian(dev, "dev", "mad")
      dev.crossJoin(broadcast(mad))
        .select(col("day"), col("n"), col("med"), col("dev"), col("mad"),
          when(col("dev") > lit(3L) * col("mad"), 1L).otherwise(0L).as("anomaly"))
        .orderBy(col("day"))
    },

    // k-ANONYMITY audit — the re-identification risk table a governed
    // dataset publishes before release: equivalence-class sizes over the
    // quasi-identifier tuple (nation × market segment), classes below k
    // flagged for suppression/generalization. One class-sized aggregate;
    // at 100 TB the QI grid is still dimension-sized.
    "q_privacy_kanon" -> { (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("k"))
        .select(col("n_name"), col("c_mktsegment"), col("k"),
          when(col("k") < KANON_K, 1L).otherwise(0L).as("risky"))
        .orderBy(col("n_name"), col("c_mktsegment"))
    },

    // k-CORE of the co-occurrence graph — the density filter that keeps
    // tight communities and peels tendrils: iterative sub-k removal to the
    // fixpoint (edge-sized rounds, per-round lineage truncation). The
    // oracle unrolls 6 peel rounds as CTEs; min(core_deg) ≥ k in the
    // result proves the fixpoint landed inside the unroll.
    "q_graph_kcore" -> { (s, dir) =>
      Graph.kCore(coEdges(s, dir, TRI_MINW), KCORE_K)
        .orderBy(col("node"))
    },

    // exponential time-decay activity score — the feature-store classic
    // (recent actions weigh more): half-life decay with EXACT integer
    // weights (weight_ppm = 10⁶ div 2^weeks — the power-of-two half-life
    // makes the weight table exact, the ppm floor makes it integral), so
    // the per-user sum is an order-independent long and the only float op
    // is the final display division.
    "q_feature_decay" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val anchor = ev.agg(max(to_date(col("ts"))).as("maxd"))
      ev.crossJoin(broadcast(anchor))
        .select(col("user_id"),
          (round(col("value") * 100).cast("long") *
            expr("1000000L div shiftleft(1L, cast(least(" +
              "datediff(maxd, to_date(ts)) div 7, 20) as int))")).as("term"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("term")).as("s"))
        .select(col("user_id"), col("n_events"),
          round(col("s").cast("double") / 1e8, 6).as("decay_score"))
        .orderBy(col("user_id"))
    },

    // degree assortativity of the co-occurrence graph — do hubs link to
    // hubs? (Newman's r: Pearson correlation of endpoint degrees over the
    // directed edge list, both orientations so the statistic is
    // symmetric.) Degrees are one edge-sized aggregate joined back onto
    // the edges; the five moment sums are exact longs and r is ONE final
    // IEEE division — the graph-health twin of q_trend_fit's integer-OLS
    // discipline. Output also carries n/mean-degree so the single r value
    // rides with its support.
    "q_graph_assortativity" -> { (s, dir) =>
      // ee feeds the deg aggregate AND the two deg joins — pin the edge
      // subtree once instead of re-deriving it per consumer
      val e0 = coEdges(s, dir, TRI_MINW).localCheckpoint(false)
      val ee = e0.select(col("src"), col("dst"))
        .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val deg = ee.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val m = ee
        .join(deg.select(col("node").as("src"), col("deg").as("dx")), Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("dy")), Seq("dst"))
        .agg(count(lit(1)).as("n_edges"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"))
      val num = col("n_edges") * col("sxy") - col("sx") * col("sy")
      val denx = col("n_edges") * col("sxx") - col("sx") * col("sx")
      val deny = col("n_edges") * col("syy") - col("sy") * col("sy")
      // degenerate graphs guard (found by the sf0.001 bench smoke, which
      // threw DIVIDE_BY_ZERO): an empty edge list or an all-equal degree
      // sequence has no defined r — emit NULL, never a crash. The oracle
      // carries the same CASE so the two engines agree on the boundary.
      m.select(col("n_edges"),
        when(col("n_edges") > 0,
          round(col("sx").cast("double") / col("n_edges"), 6)).as("mean_deg"),
        when(denx > 0 && deny > 0,
          round(num.cast("double") / sqrt(denx.cast("double") * deny.cast("double")), 6))
          .as("assortativity"))
    },

    // per-column data profile — the ingestion-time health table (row count,
    // null count, exact distinct cardinality per column) a pipeline
    // publishes with every new partition. ONE pass over the table: the
    // multi-column count-distinct plans as a single Expand (×4 rows, then
    // map-side-combined), conditional null counts fuse into the same
    // aggregate, and stack() unpivots the 1-row result into the
    // (column, stats) shape downstream monitors join against. At 100 TB the
    // exact distincts swap for approx_count_distinct (same plan minus the
    // Expand) — this gate is the exact anchor.
    "q_profile_events" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      ev.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_user"),
        countDistinct(col("user_id")).as("dist_user"),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("null_type"),
        countDistinct(col("event_type")).as("dist_type"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_value"),
        countDistinct(col("value")).as("dist_value"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"),
        countDistinct(col("props")).as("dist_props"))
        .select(col("n_rows"), expr(
          """stack(4,
               'event_type', null_type, dist_type,
               'props',      null_props, dist_props,
               'user_id',    null_user, dist_user,
               'value',      null_value, dist_value)
             AS (col_name, n_null, n_distinct)"""))
        .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
        .orderBy(col("col_name"))
    },

    "q_profile_skew" -> { (s, dir) =>
      // NOTE r20: a localCheckpoint pin of `cnts` was MEASURED and REJECTED
      // (A/B probe 0.27 → 0.33 s — the per-user frame's checkpoint copy
      // costs more than the second aggregate recompute)
      val cnts = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
      val stats = cnts.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        max(col("n")).as("max_cnt"))
      val heavy = cnts.orderBy(col("n").desc, col("user_id")).limit(1)
        .select(col("user_id").as("heaviest_key"))
      stats.crossJoin(broadcast(heavy))
        .select(col("n_keys"), col("n_rows"), col("max_cnt"),
          round(col("n_rows").cast("double") / col("n_keys"), 6).as("mean_cnt"),
          round(col("max_cnt").cast("double")
            / (col("n_rows").cast("double") / col("n_keys")), 6).as("skew_ratio"),
          col("heaviest_key"))
    },

    // HLL set operations — audience overlap from mergeable sketches:
    // |A∪B| via hll_union, |A∩B| via inclusion–exclusion over the
    // estimates. The sketches are the bounded artifacts (union is exact on
    // sketches; intersection inherits both sketches' error, hence the wider
    // envelope); the gate outputs the EXACT set sizes plus in-envelope
    // flags the oracle asserts — the sketch path's answer never rides the
    // compare directly.
    "q_sketch_hll_setops" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      def sk(t: String) = ev.filter(col("event_type") === t)
        .agg(expr("hll_sketch_agg(user_id, 12)").as(s"sk_$t"))
      val ests = sk("view").crossJoin(sk("purchase"))
        .select(
          expr("hll_sketch_estimate(sk_view)").as("est_a"),
          expr("hll_sketch_estimate(sk_purchase)").as("est_b"),
          expr("hll_sketch_estimate(hll_union(sk_view, sk_purchase))").as("est_u"))
        .withColumn("est_i", col("est_a") + col("est_b") - col("est_u"))
      // user-sized pins: each exact side feeds the union, its own count,
      // and the semi-join — three differently-shaped consumers
      val a = ev.filter(col("event_type") === "view").select(col("user_id")).distinct()
        .localCheckpoint(false)
      val bb = ev.filter(col("event_type") === "purchase").select(col("user_id")).distinct()
        .localCheckpoint(false)
      val exact = a.union(bb).distinct().agg(count(lit(1)).as("n_union_exact"))
        .crossJoin(a.agg(count(lit(1)).as("n_a_exact")))
        .crossJoin(bb.agg(count(lit(1)).as("n_b_exact")))
        .crossJoin(a.join(bb, Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("n_inter_exact")))
      def ok(est: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column,
          pct: Double, slack: Double) =
        when(abs(est - n) <= greatest(n * pct, lit(slack)), 1L).otherwise(0L)
      ests.crossJoin(exact)
        .select(col("n_a_exact"), col("n_b_exact"),
          col("n_union_exact"), col("n_inter_exact"),
          ok(col("est_a"), col("n_a_exact"), 0.02, 2.0).as("a_within_2pct"),
          ok(col("est_b"), col("n_b_exact"), 0.02, 2.0).as("b_within_2pct"),
          ok(col("est_u"), col("n_union_exact"), 0.02, 2.0).as("union_within_2pct"),
          ok(col("est_i"), col("n_inter_exact"), 0.05, 5.0).as("inter_within_5pct"))
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
    "q_feature_scale" -> { (s, dir) => scaleStatsFrame(s, dir).orderBy(col("dim")) },

    // the normalization artifact APPLIED at ingest — z-scoring each
    // embedding component against the FROZEN per-dim stats (the serving
    // path of q_feature_scale): the 64-row stats broadcast into a pure
    // scan-level join, each z one subtraction + one division over values
    // both engines hold bit-identically (the stats gate is exact-green).
    "q_feature_apply_scale" -> { (s, dir) =>
      val stats = scaleStatsFrame(s, dir).select(col("dim"), col("mean"), col("sd"))
      Tables.embeddings(s, dir).filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          col("xf").cast("double").as("xd"))
        .join(broadcast(stats), Seq("dim"))
        .select(col("vec_id"), col("dim"),
          round((col("xd") - col("mean")) / col("sd"), 6).as("z"))
        .orderBy(col("vec_id"), col("dim"))
    },

    // the corpus report card — the one-row health summary a curation
    // pipeline publishes per snapshot: doc/unique counts (exact md5-digest
    // dedup rate), token mass, mean length, English share and the language
    // entropy (each −p·log2 p term rounds into a 1e9-scaled long, so the
    // order-dependent float sum never exists). All inputs are tiny
    // aggregates crossed as 1-row broadcasts.
    "q_corpus_health" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      val ent = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("nt"))))
        .select(round(-(col("nl").cast("double") / col("nt"))
          * log2(col("nl").cast("double") / col("nt")) * 1e9).cast("long").as("t9"))
        .agg(sum(col("t9")).as("ent9"))
      base.crossJoin(broadcast(ent))
        .select(col("n_docs"), col("n_unique"),
          round(lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 6)
            .as("dup_rate"),
          col("n_tokens"),
          round(col("n_chars").cast("double") / col("n_docs"), 6).as("mean_chars"),
          round(col("n_en").cast("double") / col("n_docs"), 6).as("en_share"),
          round(col("ent9").cast("double") / 1e9, 6).as("lang_entropy"))
    }
  )

  /** Per-dim embedding moments through exact 1e6 fixed-point longs — the
    * frozen normalization artifact (q_feature_scale) and its apply twin
    * (q_feature_apply_scale) share this one builder.
    */
  private def scaleStatsFrame(s: SparkSession, dir: String): DataFrame = {
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
  }

  def oracles: Map[String, String] = Map(
    "q_graph_components" -> s"""
      WITH RECURSIVE so AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk
                            FROM lineitem),
      e AS (SELECT a.sk AS src, b.sk AS dst
            FROM so a JOIN so b ON a.o = b.o AND a.sk < b.sk
            GROUP BY 1, 2 HAVING count(*) >= $CC_MINW),
      ee AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      r AS (
        SELECT src AS node, src AS lbl FROM ee
        UNION
        SELECT e2.dst AS node, r.lbl FROM r JOIN ee e2 ON e2.src = r.node),
      comp AS (SELECT node, min(lbl) AS component FROM r GROUP BY 1),
      sz AS (SELECT component, count(*) AS comp_size FROM comp GROUP BY 1)
      SELECT c.node, c.component, s.comp_size
      FROM comp c JOIN sz s USING (component)
      ORDER BY c.node""",
    "q_stream_funnel" -> """
      WITH stages AS (
        SELECT user_id,
               min(ts) FILTER (event_type = 'view') AS t_view,
               min(ts) FILTER (event_type = 'click') AS t_click,
               min(ts) FILTER (event_type = 'purchase') AS t_purchase
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY user_id),
      r AS (SELECT *,
              CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS rc,
              CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    AND t_purchase > t_click THEN 1 ELSE 0 END AS rp
            FROM stages)
      SELECT count(*) AS n_users,
             sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_view,
             sum(rc)::BIGINT AS n_view_click,
             sum(rp)::BIGINT AS n_full_funnel
      FROM r""",
    "q_psi_drift" -> psiSql,
    // the stream maintains the same additive counts the batch monitor
    // derives, so the assembled report is identical — shared oracle
    "q_stream_psi" -> psiSql,
    "q_tpch_disjunct" -> """
      SELECT CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
               AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
         OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
         OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)""",
    "q_graph_linkpred" -> s"""
      WITH so AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk FROM lineitem),
      e AS (SELECT a.sk AS src, b.sk AS dst
            FROM so a JOIN so b ON a.o = b.o AND a.sk < b.sk
            GROUP BY 1, 2 HAVING count(*) >= $TRI_MINW),
      adj AS (SELECT src AS node, dst AS nbr FROM e
              UNION ALL SELECT dst, src FROM e),
      deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
      cn AS (SELECT x.node AS node_a, y.node AS node_b, count(*) AS cn
             FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
             GROUP BY 1, 2)
      SELECT cn.node_a, cn.node_b, cn.cn, da.deg AS deg_a, db.deg AS deg_b,
             round(CAST(cn.cn AS DOUBLE) / (da.deg + db.deg - cn.cn), 6) AS jaccard,
             CAST(CASE WHEN ex.src IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_edge
      FROM cn JOIN deg da ON da.node = cn.node_a
              JOIN deg db ON db.node = cn.node_b
              LEFT JOIN e ex ON ex.src = cn.node_a AND ex.dst = cn.node_b
      ORDER BY cn.node_a, cn.node_b""",
    "q_ks_drift" -> s"""
      WITH ev AS (SELECT event_type,
                         CAST(round(value * 100) AS BIGINT) AS c,
                         (ts < TIMESTAMP '$PSI_CUTOFF') AS is_ref
                  FROM events),
      pts AS (SELECT event_type, c,
                     CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS nr,
                     CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS nc
              FROM ev GROUP BY 1, 2),
      cum AS (SELECT event_type, c, nr, nc,
                     CAST(sum(nr) OVER w AS BIGINT) AS cr,
                     CAST(sum(nc) OVER w AS BIGINT) AS cc
              FROM pts
              WINDOW w AS (PARTITION BY event_type ORDER BY c
                           ROWS UNBOUNDED PRECEDING)),
      tot AS (SELECT event_type, CAST(sum(nr) AS BIGINT) AS tr,
                     CAST(sum(nc) AS BIGINT) AS tc
              FROM pts GROUP BY 1),
      d AS (SELECT cum.event_type, tot.tr, tot.tc,
                   max(abs(cum.cr * tot.tc - cum.cc * tot.tr)) AS max_d
            FROM cum JOIN tot USING (event_type)
            GROUP BY 1, 2, 3)
      SELECT event_type, tr AS n_ref, tc AS n_cur,
             round(CAST(max_d AS DOUBLE) / CAST(tr * tc AS DOUBLE), 6) AS ks,
             CASE WHEN max_d * 100 > tr * tc * 5 THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS drifted
      FROM d ORDER BY event_type""",
    "q_embed_centroid_sim" -> s"""
      WITH x AS (
        SELECT label,
               CAST(unnest(range(1, len(embedding)+1)) - 1 AS BIGINT) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * $SCALE6) AS BIGINT) AS xl
        FROM embeddings),
      cent AS (SELECT label, dim,
                      CAST(round(CAST(sum(xl) AS DOUBLE) / count(*)) AS BIGINT) AS cm
               FROM x GROUP BY 1, 2),
      pair AS (SELECT a.label AS label_a, b.label AS label_b,
                      CAST(sum(a.cm * b.cm) AS BIGINT) AS dot,
                      CAST(sum(a.cm * a.cm) AS BIGINT) AS na2,
                      CAST(sum(b.cm * b.cm) AS BIGINT) AS nb2
               FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
               GROUP BY 1, 2)
      SELECT label_a, label_b,
             round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))), 6)
               AS cos_sim
      FROM pair ORDER BY label_a, label_b""",
    "q_basket_rules" -> s"""
      WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      tot AS (SELECT count(DISTINCT o) AS n_orders FROM op),
      ni AS (SELECT p, count(*) AS n_i FROM op GROUP BY 1),
      pr AS (SELECT a.p AS item_a, b.p AS item_b, count(*) AS n_ab
             FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
             GROUP BY 1, 2 HAVING count(*) >= $BASKET_MIN)
      SELECT pr.item_a, pr.item_b, pr.n_ab,
             na.n_i AS n_a, nb.n_i AS n_b,
             round(CAST(pr.n_ab AS DOUBLE) / tot.n_orders, 6) AS support,
             round(CAST(pr.n_ab AS DOUBLE) / na.n_i, 6) AS conf_ab,
             round(CAST(pr.n_ab AS DOUBLE) / nb.n_i, 6) AS conf_ba,
             round(CAST(pr.n_ab AS DOUBLE) * tot.n_orders
               / (CAST(na.n_i AS DOUBLE) * nb.n_i), 6) AS lift
      FROM pr JOIN ni na ON na.p = pr.item_a
              JOIN ni nb ON nb.p = pr.item_b
              CROSS JOIN tot
      ORDER BY pr.item_a, pr.item_b""",
    "q_feature_winsorize" -> winsorizeSql,
    // the stream maintains the same additive clipped aggregates the batch
    // gate derives, against the same frozen cut points — shared oracle
    "q_stream_winsorize" -> winsorizeSql,
    "q_seasonality_profile" -> seasonalitySql,
    // additive daily counts → identical weekday profile; shared oracle
    "q_stream_seasonality" -> seasonalitySql,
    "q_tpch_idle_customers" -> s"""
      WITH c AS (SELECT c_custkey, c_mktsegment AS segment,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer),
      pos AS (SELECT CAST(sum(cents) AS BIGINT) AS sc, count(*) AS np
              FROM c WHERE cents > 0),
      idle AS (SELECT c.* FROM c
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderdate >= TIMESTAMP '$IDLE_CUTOFF'))
      SELECT i.segment, count(*) AS n_cust,
             round(CAST(sum(i.cents) AS DOUBLE) / 100.0, 6) AS total_bal
      FROM idle i CROSS JOIN pos p
      WHERE i.cents * p.np > p.sc
      GROUP BY 1 ORDER BY 1""",
    "q_cohort_ltv" -> """
      WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
      wk AS (SELECT user_id,
                    CAST(floor(datediff('day', d0.d0, CAST(ts AS DATE)) / 7)
                      AS BIGINT) AS week,
                    event_type,
                    CAST(round(value * 100) AS BIGINT) AS cents
             FROM events CROSS JOIN d0),
      cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1),
      sizes AS (SELECT cohort_week, count(*) AS n_cohort FROM cohort GROUP BY 1),
      purch AS (SELECT c.cohort_week, w.week - c.cohort_week AS week_since,
                       count(*) AS n_purch, CAST(sum(w.cents) AS BIGINT) AS cents_sum
                FROM wk w JOIN cohort c USING (user_id)
                WHERE w.event_type = 'purchase'
                GROUP BY 1, 2),
      cum AS (SELECT *, CAST(sum(cents_sum) OVER (PARTITION BY cohort_week
                ORDER BY week_since ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS cum_cents
              FROM purch)
      SELECT cum.cohort_week, cum.week_since, cum.n_purch, cum.cents_sum,
             cum.cum_cents, s.n_cohort,
             round(CAST(cum.cum_cents AS DOUBLE) / s.n_cohort, 6) AS ltv_cents
      FROM cum JOIN sizes s USING (cohort_week)
      ORDER BY cum.cohort_week, cum.week_since""",
    "q_chisq_independence" -> """
      WITH obs AS (SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                          count(*) AS o
                   FROM events GROUP BY 1, 2),
      r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rn FROM obs GROUP BY 1),
      c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS cn FROM obs GROUP BY 1),
      t AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM obs),
      grid AS (SELECT r.event_type, c.dow, r.rn, c.cn,
                      coalesce(obs.o, 0) AS o
               FROM r CROSS JOIN c
               LEFT JOIN obs ON obs.event_type = r.event_type AND obs.dow = c.dow),
      terms AS (SELECT g.event_type, g.dow,
                       CAST(round(CAST((g.o * t.nn - g.rn * g.cn)
                             * (g.o * t.nn - g.rn * g.cn) AS DOUBLE)
                           / CAST(g.rn * g.cn * t.nn AS DOUBLE) * 1e9)
                         AS BIGINT) AS t9
                FROM grid g CROSS JOIN t),
      agg AS (SELECT count(DISTINCT event_type) AS nr, count(DISTINCT dow) AS nc,
                     CAST(sum(t9) AS BIGINT) AS s9
              FROM terms)
      SELECT CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
             round(CAST(s9 AS DOUBLE) / 1e9, 6) AS chi2,
             CASE WHEN s9 > 50000000000 THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS dependent
      FROM agg""",
    "q_privacy_kanon" -> s"""
      SELECT n.n_name, c.c_mktsegment, count(*) AS k,
             CAST(CASE WHEN count(*) < $KANON_K THEN 1 ELSE 0 END AS BIGINT) AS risky
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
      ORDER BY 1, 2""",
    "q_anomaly_mad" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
                     FROM events GROUP BY 1),
      nd AS (SELECT count(*) AS nd FROM daily),
      med AS (SELECT n AS med FROM
               (SELECT n, row_number() OVER (ORDER BY n, day) AS rn FROM daily), nd
              WHERE rn = (nd + 1) // 2),
      dev AS (SELECT d.day, d.n, m.med, abs(d.n - m.med) AS dev
              FROM daily d, med m),
      mad AS (SELECT dev AS mad FROM
               (SELECT dev, row_number() OVER (ORDER BY dev, day) AS rn FROM dev), nd
              WHERE rn = (nd + 1) // 2)
      SELECT d.day, d.n, d.med, d.dev, m.mad,
             CAST(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END AS BIGINT) AS anomaly
      FROM dev d, mad m
      ORDER BY d.day""",
    "q_graph_kcore" -> {
      val rounds = (0 until KCORE_ROUNDS).map { r =>
        s""",
        d$r AS (SELECT src, count(*) AS deg FROM e$r GROUP BY 1),
        k$r AS (SELECT src FROM d$r WHERE deg >= $KCORE_K),
        e${r + 1} AS (SELECT e.src, e.dst FROM e$r e
                      JOIN k$r a ON e.src = a.src
                      JOIN k$r b ON e.dst = b.src)"""
      }.mkString
      s"""
      WITH so AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk FROM lineitem),
      ew AS (SELECT a.sk AS s1, b.sk AS s2
             FROM so a JOIN so b ON a.o = b.o AND a.sk < b.sk
             GROUP BY 1, 2 HAVING count(*) >= $TRI_MINW),
      e0 AS (SELECT s1 AS src, s2 AS dst FROM ew
             UNION ALL SELECT s2, s1 FROM ew)$rounds
      SELECT src AS node, count(*) AS core_deg FROM e$KCORE_ROUNDS
      GROUP BY 1 ORDER BY node"""
    },
    "q_feature_decay" -> """
      WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
      t AS (SELECT user_id,
              CAST(round(value * 100) AS BIGINT)
                * (1000000 // (CAST(1 AS BIGINT) <<
                    CAST(least(date_diff('day', CAST(ts AS DATE), maxd) // 7, 20)
                      AS INTEGER))) AS term
            FROM events, anchor)
      SELECT user_id, count(*) AS n_events,
             round(CAST(sum(term) AS DOUBLE) / 1e8, 6) AS decay_score
      FROM t GROUP BY 1 ORDER BY user_id""",
    "q_graph_assortativity" -> s"""
      WITH so AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk FROM lineitem),
      e0 AS (SELECT a.sk AS src, b.sk AS dst
             FROM so a JOIN so b ON a.o = b.o AND a.sk < b.sk
             GROUP BY 1, 2 HAVING count(*) >= $TRI_MINW),
      ee AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      deg AS (SELECT src AS node, count(*) AS deg FROM ee GROUP BY 1),
      m AS (SELECT count(*) AS n_edges,
              CAST(sum(dx.deg) AS BIGINT) AS sx, CAST(sum(dy.deg) AS BIGINT) AS sy,
              CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sxy,
              CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sxx,
              CAST(sum(dy.deg * dy.deg) AS BIGINT) AS syy
            FROM ee JOIN deg dx ON ee.src = dx.node
            JOIN deg dy ON ee.dst = dy.node)
      SELECT n_edges,
             CASE WHEN n_edges > 0
                  THEN round(CAST(sx AS DOUBLE) / n_edges, 6) END AS mean_deg,
             CASE WHEN (n_edges * sxx - sx * sx) > 0
                   AND (n_edges * syy - sy * sy) > 0
                  THEN round(CAST(n_edges * sxy - sx * sy AS DOUBLE)
                    / sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)
                           * CAST(n_edges * syy - sy * sy AS DOUBLE)), 6)
             END AS assortativity
      FROM m""",
    "q_profile_events" -> """
      WITH s AS (SELECT count(*) AS n_rows,
        CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu,
        count(DISTINCT user_id) AS du,
        CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ne,
        count(DISTINCT event_type) AS de,
        CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nv,
        count(DISTINCT value) AS dv,
        CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS np,
        count(DISTINCT props) AS dp
        FROM events)
      SELECT 'event_type' AS col_name, n_rows, ne AS n_null, de AS n_distinct FROM s
      UNION ALL
      SELECT 'props', n_rows, np, dp FROM s
      UNION ALL
      SELECT 'user_id', n_rows, nu, du FROM s
      UNION ALL
      SELECT 'value', n_rows, nv, dv FROM s
      ORDER BY col_name""",
    "q_profile_skew" -> """
      WITH cnts AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
      stats AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
                       max(n) AS max_cnt
                FROM cnts),
      heavy AS (SELECT user_id AS heaviest_key FROM cnts
                ORDER BY n DESC, user_id LIMIT 1)
      SELECT s.n_keys, s.n_rows, s.max_cnt,
             round(CAST(s.n_rows AS DOUBLE) / s.n_keys, 6) AS mean_cnt,
             round(CAST(s.max_cnt AS DOUBLE)
               / (CAST(s.n_rows AS DOUBLE) / s.n_keys), 6) AS skew_ratio,
             h.heaviest_key
      FROM stats s CROSS JOIN heavy h""",
    "q_tpch_bigorders" -> bigOrdersSql,
    "q_tpch_smallqty" -> smallQtySql,
    "q_graph_triangles" -> trianglesSql,
    "q_feature_target_enc" -> targetEncSql,
    "q_lag_features" -> lagFeaturesSql,
    "q_feature_scale" -> featureScaleSql,
    // the stats chain spliced as a subquery, applied per component
    "q_feature_apply_scale" -> s"""
      WITH stats AS ($featureScaleSql),
      v AS (SELECT vec_id,
              CAST(unnest(range(1, len(embedding)+1)) - 1 AS BIGINT) AS dim,
              CAST(unnest(embedding) AS DOUBLE) AS xd
            FROM embeddings WHERE vec_id < 50)
      SELECT v.vec_id, v.dim, round((v.xd - s.mean) / s.sd, 6) AS z
      FROM v JOIN stats s USING (dim)
      ORDER BY v.vec_id, v.dim""",
    "q_corpus_health" -> """
      WITH base AS (
        SELECT count(*) AS n_docs,
               count(DISTINCT md5(text)) AS n_unique,
               CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                 AS n_tokens,
               CAST(sum(length(text)) AS BIGINT) AS n_chars,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
        FROM documents),
      lt AS (SELECT lang, count(*) AS nl FROM documents GROUP BY 1),
      nt AS (SELECT count(*) AS nt FROM documents),
      ent AS (SELECT CAST(sum(CAST(round(-(CAST(nl AS DOUBLE) / nt)
                 * log2(CAST(nl AS DOUBLE) / nt) * 1e9) AS BIGINT)) AS BIGINT) AS ent9
              FROM lt, nt)
      SELECT b.n_docs, b.n_unique,
             round(1.0 - CAST(b.n_unique AS DOUBLE) / b.n_docs, 6) AS dup_rate,
             b.n_tokens,
             round(CAST(b.n_chars AS DOUBLE) / b.n_docs, 6) AS mean_chars,
             round(CAST(b.n_en AS DOUBLE) / b.n_docs, 6) AS en_share,
             round(CAST(e.ent9 AS DOUBLE) / 1e9, 6) AS lang_entropy
      FROM base b, ent e""",
    "q_sketch_hll_setops" -> hllSetopsSql)

  // shared by the batch weekday profile and its streaming twin
  private val seasonalitySql = """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
                     FROM events GROUP BY 1),
      per AS (SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
                     count(*) AS n_days, CAST(sum(n) AS BIGINT) AS total
              FROM daily GROUP BY 1),
      o AS (SELECT CAST(sum(total) AS BIGINT) AS tot,
                   CAST(sum(n_days) AS BIGINT) AS td
            FROM per)
      SELECT per.dow, per.n_days, per.total,
             round(CAST(per.total AS DOUBLE) / per.n_days, 6) AS mean_n,
             round((CAST(per.total AS DOUBLE) / per.n_days)
               / (CAST(o.tot AS DOUBLE) / o.td), 6) AS seasonal_index
      FROM per CROSS JOIN o
      ORDER BY per.dow"""

  // shared by the batch winsorization gate and its streaming twin (the
  // stream's additive clipped aggregates land exactly on the batch result)
  private val winsorizeSql = """
      WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                        event_id
                 FROM events),
      ranked AS (SELECT *,
                   row_number() OVER (PARTITION BY event_type ORDER BY c, event_id)
                     AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
                 FROM e),
      bnd AS (SELECT event_type, min(c) AS lo_c, max(c) AS hi_c
              FROM ranked
              WHERE rn = greatest(CAST(ceil(n * 0.05) AS BIGINT), 1)
                 OR rn = CAST(ceil(n * 0.95) AS BIGINT)
              GROUP BY 1)
      SELECT e.event_type, count(*) AS n,
             sum(CASE WHEN e.c < b.lo_c THEN 1 ELSE 0 END)::BIGINT AS n_clip_lo,
             sum(CASE WHEN e.c > b.hi_c THEN 1 ELSE 0 END)::BIGINT AS n_clip_hi,
             min(b.lo_c) AS lo_c, min(b.hi_c) AS hi_c,
             round(CAST(sum(least(greatest(e.c, b.lo_c), b.hi_c)) AS DOUBLE)
               / count(*), 6) AS clipped_mean
      FROM e JOIN bnd b USING (event_type)
      GROUP BY 1 ORDER BY 1"""

  private val psiSql = s"""
      WITH ev AS (SELECT event_type,
                         CAST(round(value * 100) AS BIGINT) AS c,
                         (ts < TIMESTAMP '$PSI_CUTOFF') AS is_ref
                  FROM events),
      bounds AS (SELECT min(c) AS lo, max(c) AS hi,
                        CAST(ceil(CAST(max(c) - min(c) + 1 AS DOUBLE) / $PSI_BINS)
                          AS BIGINT) AS width
                 FROM ev WHERE is_ref),
      cnt AS (SELECT event_type,
                     least(greatest((c - lo) // width, 0), ${PSI_BINS - 1}) AS bucket,
                     sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nr,
                     sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS nc
              FROM ev CROSS JOIN bounds GROUP BY 1, 2),
      grid AS (SELECT t.event_type, CAST(b.b AS BIGINT) AS bucket
               FROM (SELECT DISTINCT event_type FROM ev) t
               CROSS JOIN (SELECT unnest(range(0, $PSI_BINS)) AS b) b),
      full_g AS (SELECT g.event_type, g.bucket,
                        coalesce(cnt.nr, 0) AS nr, coalesce(cnt.nc, 0) AS nc
                 FROM grid g LEFT JOIN cnt
                   ON cnt.event_type = g.event_type AND cnt.bucket = g.bucket),
      tot AS (SELECT event_type, CAST(sum(nr) AS BIGINT) AS tr,
                     CAST(sum(nc) AS BIGINT) AS tc
              FROM full_g GROUP BY 1),
      terms AS (SELECT f.event_type, t.tr, t.tc,
                       CAST(round((CAST(f.nr + 1 AS DOUBLE) / (t.tr + $PSI_BINS)
                           - CAST(f.nc + 1 AS DOUBLE) / (t.tc + $PSI_BINS))
                         * ln((CAST(f.nr + 1 AS DOUBLE) / (t.tr + $PSI_BINS))
                           / (CAST(f.nc + 1 AS DOUBLE) / (t.tc + $PSI_BINS)))
                         * 1e9) AS BIGINT) AS t9
                FROM full_g f JOIN tot t USING (event_type)),
      agg AS (SELECT event_type, max(tr) AS n_ref, max(tc) AS n_cur,
                     CAST(sum(t9) AS BIGINT) AS s9
              FROM terms GROUP BY 1)
      SELECT event_type, n_ref, n_cur,
             round(CAST(s9 AS DOUBLE) / 1e9, 6) AS psi,
             CASE WHEN s9 > 100000000 THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS drifted
      FROM agg ORDER BY event_type"""

  private val hllSetopsSql = """
      WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      SELECT (SELECT count(*) FROM a) AS n_a_exact,
             (SELECT count(*) FROM b) AS n_b_exact,
             (SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b))
               AS n_union_exact,
             (SELECT count(*) FROM a WHERE user_id IN (SELECT user_id FROM b))
               AS n_inter_exact,
             CAST(1 AS BIGINT) AS a_within_2pct,
             CAST(1 AS BIGINT) AS b_within_2pct,
             CAST(1 AS BIGINT) AS union_within_2pct,
             CAST(1 AS BIGINT) AS inter_within_5pct"""

  private val bigOrdersSql = s"""
      WITH big AS (
        SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > $BIG_QTY)
      SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
             CAST(b.sum_qty AS DOUBLE) AS sum_qty
      FROM orders o
      JOIN big b ON o.o_orderkey = b.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      ORDER BY o.o_orderkey"""

  private val smallQtySql = s"""
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
      WHERE l.q100 * 5 * a.n_q < a.sum_q"""

  private val trianglesSql = s"""
      WITH so AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk FROM lineitem),
      e AS (SELECT a.sk AS src, b.sk AS dst
            FROM so a JOIN so b ON a.o = b.o AND a.sk < b.sk
            GROUP BY 1, 2 HAVING count(*) >= $TRI_MINW),
      tri AS (SELECT e1.src AS ta, e1.dst AS tb, e2.dst AS tc
              FROM e e1
              JOIN e e2 ON e2.src = e1.dst
              JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
      m AS (SELECT unnest([ta, tb, tc]) AS supp FROM tri)
      SELECT supp, count(*) AS n_triangles FROM m GROUP BY 1 ORDER BY supp"""

  private val targetEncSql = s"""
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
      ORDER BY per.segment"""

  private val lagFeaturesSql = """
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
      ORDER BY event_id"""

  private val featureScaleSql = s"""
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
      FROM a ORDER BY dim"""
}
