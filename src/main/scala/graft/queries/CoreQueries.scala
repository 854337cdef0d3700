package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Histogram
import graft.tdf.TDF

/** Reference-parity operator queries (SURVEY.md §2), each exercised through
  * the graft.tdf facade and paired with an exact DuckDB oracle. Numeric design
  * rule: every aggregate is either integral-valued (counts, sums of integral
  * doubles — exact in IEEE double regardless of order) or derived from
  * identical per-row double expressions in both engines, so results hash-match
  * bit-for-bit.
  */
object CoreQueries {

  /** the reference benchmark's derived column, on lineitem */
  private def zCol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val zSql = "l_extendedprice*(1.0-l_discount)"

  private def oneRow(spark: SparkSession, schema: StructType, values: Any*): DataFrame =
    spark.createDataFrame(
      java.util.Collections.singletonList(Row(values: _*)), schema)

  private def histToDF(spark: SparkSession, h: Histogram): DataFrame = {
    // non-empty bins only (SQL GROUP BY has no empty groups); underflow = -1,
    // overflow = nbins
    val rows = (Seq((-1, h.underflow), (h.nbins, h.overflow)) ++
      h.counts.toIndexedSeq.zipWithIndex.map { case (c, i) => (i, c) })
      .filter(_._2 > 0L).sortBy(_._1)
      .map { case (b, c) => Row(b, c) }
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      StructType(Seq(StructField("bin", IntegerType, false), StructField("n", LongType, false))))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_count" -> { (s, dir) =>
      val n = TDF(Tables.lineitem(s, dir)).Filter(col("l_quantity") > 25.0).Count()()
      oneRow(s, StructType(Seq(StructField("n", LongType, false))), n)
    },

    "q_sum" -> { (s, dir) =>
      val v = TDF(Tables.lineitem(s, dir)).Filter(col("l_returnflag") === "A").Sum("l_quantity")()
      oneRow(s, StructType(Seq(StructField("sum_qty", DoubleType, false))), v)
    },

    // fused multi-action batch: one shared run serves five results
    "q_stats_fused" -> { (s, dir) =>
      val d = TDF(Tables.lineitem(s, dir)).Define("z", zCol)
      val f = d.Filter(col("z") > 1000.0)
      val (n, sq, mn, mx, mq) =
        (f.Count(), f.Sum("l_quantity"), f.Min("z"), f.Max("z"), f.Mean("l_quantity"))
      oneRow(s, StructType(Seq(
        StructField("n", LongType, false), StructField("sum_qty", DoubleType, false),
        StructField("min_z", DoubleType, false), StructField("max_z", DoubleType, false),
        StructField("mean_qty", DoubleType, false))),
        n(), sq(), mn(), mx(), mq())
    },

    "q_min_max" -> { (s, dir) =>
      val d = TDF(Tables.lineitem(s, dir)).Define("z", zCol)
      oneRow(s, StructType(Seq(
        StructField("min_z", DoubleType, false), StructField("max_z", DoubleType, false))),
        d.Min("z")(), d.Max("z")())
    },

    "q_mean" -> { (s, dir) =>
      val m = TDF(Tables.lineitem(s, dir))
        .Filter(col("l_linestatus") === "F").Mean("l_quantity")()
      oneRow(s, StructType(Seq(StructField("mean_qty", DoubleType, false))), m)
    },

    // Take: ordered deterministic collect, returned as a real column
    "q_take" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") === 50.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // Head (reference planned op): ordered limit
    "q_head" -> { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")).limit(20)
    },

    "q_histo_fixed" -> { (s, dir) =>
      val h = TDF(Tables.lineitem(s, dir)).Define("z", zCol)
        .Histo("z", 11, 0.0, 110000.0)()
      histToDF(s, h)
    },

    "q_histo_auto" -> { (s, dir) =>
      val h = TDF(Tables.lineitem(s, dir)).Define("z", zCol).Histo("z", 10)()
      histToDF(s, h)
    },

    // Foreach: distributed side effect via accumulator, proving the rows were
    // visited; result = visited count + sum
    "q_foreach" -> { (s, dir) =>
      val acc = s.sparkContext.longAccumulator("rows")
      val qty = s.sparkContext.doubleAccumulator("qty")
      TDF(Tables.lineitem(s, dir)).Filter(col("l_quantity") > 45.0)
        .Foreach(Seq("l_quantity")) { r => acc.add(1); qty.add(r.getDouble(0)) }
      oneRow(s, StructType(Seq(
        StructField("n", LongType, false), StructField("sum_qty", DoubleType, false))),
        acc.value.longValue, qty.value.doubleValue)
    },

    "q_reduce" -> { (s, dir) =>
      val v = TDF(Tables.lineitem(s, dir)).Filter(col("l_quantity") <= 10.0)
        .Reduce("l_quantity")(_ + _)
      oneRow(s, StructType(Seq(StructField("sum_qty", DoubleType, false))), v)
    },

    "q_report" -> { (s, dir) =>
      val rep = TDF(Tables.lineitem(s, dir)).Define("z", zCol)
        .Filter("z_cut", col("z") > 1000.0)
        .Filter("qty_cut", col("l_quantity") >= 25.0)
        .Filter("flag_cut", col("l_returnflag") =!= "A")
        .Report()()
      val rows = rep.map(c => Row(c.name, c.pass, c.all))
      s.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
        StructType(Seq(StructField("cut", StringType, false),
          StructField("pass", LongType, false), StructField("entering", LongType, false))))
    },

    "q_snapshot" -> { (s, dir) =>
      val tmp = s"${Tables.scratchRoot}/graft_snapshot_skim"
      TDF(Tables.lineitem(s, dir)).Filter(col("l_returnflag") === "R")
        .Snapshot(tmp, Seq("l_orderkey", "l_linenumber", "l_quantity"))
        .toDF.orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // elementwise actions over an array column (reference container overloads)
    "q_array_stats" -> { (s, dir) =>
      val d = TDF(Tables.embeddings(s, dir))
      oneRow(s, StructType(Seq(
        StructField("min_e", DoubleType, false), StructField("max_e", DoubleType, false),
        StructField("mean_e", DoubleType, false))),
        d.Min("embedding")(), d.Max("embedding")(),
        // rounded: elementwise mean accumulates 32k floats whose sum order
        // differs between engines; 6 decimals is far above the 1e-12 noise
        math.rint(d.Mean("embedding")() * 1e6) / 1e6)
    },

    // weighted histogram: Fill(z, w=l_quantity) — TH1-style weighted fills
    "q_histo_weighted" -> { (s, dir) =>
      val h = TDF(Tables.lineitem(s, dir)).Define("z", zCol)
        .HistoWeighted("z", "l_quantity", 11, 0.0, 110000.0)()
      histToDF(s, h)
    },

    // DOUBLE-weighted histogram: Fill(z, w=l_extendedprice) with real-valued
    // weights, decimal-summed (cents-exact at wScale=2) — the twin that lifts
    // q_histo_weighted's deliberate integer restriction
    "q_histo_weighted_d" -> { (s, dir) =>
      TDF(Tables.lineitem(s, dir)).Define("z", zCol)
        .HistoWeightedD("z", "l_extendedprice", 11, 0.0, 110000.0, wScale = 2)
        .orderBy(col("bin"))
    },

    // weighted 2-D histogram: TH2 Fill(z, qty, w=l_extendedprice), cells
    // decimal-summed (cents-exact at wScale=2)
    "q_histo2d_weighted" -> { (s, dir) =>
      TDF(Tables.lineitem(s, dir)).Define("z", zCol)
        .Histo2DWeighted("z", "l_quantity", "l_extendedprice",
          10, 0.0, 100000.0, 5, 0.0, 50.0, wScale = 2)
        .orderBy(col("bx"), col("by"))
    },

    // z-order curve value (the SnapshotZOrdered layout key): exact integer
    // bit-interleave, oracle mirrors the arithmetic term by term
    "q_zorder" -> { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        graft.functions.ZOrder.zorder2(col("l_partkey"), col("l_suppkey")).as("z"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // the N-dimensional curve (3 columns, stride-3 interleave) — the key
    // SnapshotZOrderedN sorts by; oracle mirrors the arithmetic term by term
    "q_zorder3" -> { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        graft.functions.ZOrder.zorderN(
          Seq(col("l_partkey"), col("l_suppkey"), col("l_linenumber")), 16).as("z"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // profile histogram: mean/rms of l_quantity in bins of z (TProfile),
    // decimal-summed sums, mean/rms from exact integers
    "q_histo_profile" -> { (s, dir) =>
      TDF(Tables.lineitem(s, dir)).Define("z", zCol)
        .HistoProfile("z", "l_quantity", 10, 0.0, 100000.0, yScale = 2)
        .orderBy(col("bin"))
    },

    // 2-D histogram over (z, quantity) — distributed grid, non-empty cells
    "q_histo2d" -> { (s, dir) =>
      TDF(Tables.lineitem(s, dir)).Define("z", zCol)
        .Histo2D("z", "l_quantity", 10, 0.0, 100000.0, 5, 0.0, 50.0)
        .orderBy(col("bx"), col("by"))
    },

    // typed-lambda surface (reference TFunctionTraits): Define and Filter
    // routed through Scala function values lowered to UDFs — the reference's
    // primary API shape (`d.Filter(isNeg, {"theta"})`), exact against the
    // same oracle formula as the native-Column path
    "q_typed_lambda" -> { (s, dir) =>
      val d = TDF(Tables.lineitem(s, dir))
        .Define("z", (p: Double, disc: Double) => p * (1.0 - disc),
          Seq("l_extendedprice", "l_discount"))
        .Filter((z: Double) => z > 1000.0, Seq("z"))
      val (n, sq, mq) = (d.Count(), d.Sum("l_quantity"), d.Mean("l_quantity"))
      oneRow(s, StructType(Seq(
        StructField("n", LongType, false), StructField("sum_qty", DoubleType, false),
        StructField("mean_qty", DoubleType, false))),
        n(), sq(), mq())
    },

    // JSON-lines source round-trip: the §2.1 text-format sibling of the
    // parquet reader (Avro is the one sandbox-absent format) — write the
    // table as JSON lines, read it back with the EXPLICIT schema (schema
    // inference on a 100 TB JSON corpus is a full extra pass; production
    // always declares), aggregate. The oracle reads the original parquet,
    // so the gate proves the round-trip is lossless.
    "q_source_json" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val path = s"${Tables.scratchRoot}/graft_json_src_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      docs.write.mode("overwrite").json(path)
      s.read.schema(docs.schema).json(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("lang"))
    },

    // CSV source round-trip (quoted/escaped text column included): same
    // lossless-round-trip proof for the other ubiquitous text format
    "q_source_csv" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val path = s"${Tables.scratchRoot}/graft_csv_src_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      docs.write.mode("overwrite").option("header", "true").csv(path)
      s.read.schema(docs.schema).option("header", "true").csv(path)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast("long").as("sum_text_chars"))
        .orderBy(col("source"))
    },

    // ORC source/sink round-trip — the OTHER pushdown-capable columnar
    // format (TDF.readOrc/SnapshotOrc's gate): write ORC, read back, and
    // prove content-exactness with per-lang counts PLUS a distinct-digest
    // count over the text payload (a dropped/garbled row can't hide in a
    // sum). Oracle reads the ORIGINAL parquet.
    "q_source_orc" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val path = s"${Tables.scratchRoot}/graft_orc_src_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      docs.write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_digests"))
        .orderBy(col("lang"))
    },

    // schema-EVOLVED multi-file source: old files written before a column
    // existed read together with new files under mergeSchema — the
    // append-only data-lake reality (TChain across schema versions). The
    // gate proves union semantics AND the null-fill contract: missing
    // column → NULL, audited per group, never silently zero.
    "q_source_merge_schema" -> { (s, dir) =>
      val base = s"${Tables.scratchRoot}/graft_merge_src_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = Tables.documents(s, dir)
      docs.filter(col("doc_id") < 250).select(col("doc_id"), col("lang"))
        .write.parquet(s"$base/p1")
      docs.filter(col("doc_id") >= 250).select(col("doc_id"), col("lang"), col("n_chars"))
        .write.parquet(s"$base/p2")
      s.read.option("mergeSchema", "true").parquet(s"$base/p1", s"$base/p2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("n_missing"),
          sum(coalesce(col("n_chars"), lit(0L))).cast("long").as("sum_chars"))
        .orderBy(col("lang"))
    },

    // union-of-chains: the TChain analog — multi-path read of the same table
    "q_union_chain" -> { (s, dir) =>
      val a = Tables.lineitem(s, dir).filter(col("l_returnflag") === "A")
      val b = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      oneRow(s, StructType(Seq(StructField("n", LongType, false))),
        TDF(a.union(b)).Count()())
    }
  )

  def oracles: Map[String, String] = Map(
    "q_count" -> "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 25",
    "q_sum" -> "SELECT sum(l_quantity) AS sum_qty FROM lineitem WHERE l_returnflag = 'A'",
    "q_stats_fused" -> s"""
      SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
             min(z) AS min_z, max(z) AS max_z, avg(l_quantity) AS mean_qty
      FROM (SELECT l_quantity, $zSql AS z FROM lineitem) WHERE z > 1000.0""",
    "q_min_max" -> s"SELECT min(z) AS min_z, max(z) AS max_z FROM (SELECT $zSql AS z FROM lineitem)",
    "q_mean" -> "SELECT avg(l_quantity) AS mean_qty FROM lineitem WHERE l_linestatus = 'F'",
    "q_take" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      WHERE l_quantity = 50.0 ORDER BY l_orderkey, l_linenumber LIMIT 100""",
    "q_head" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 20""",
    "q_histo_fixed" -> s"""
      SELECT CASE WHEN z < 0.0 THEN -1 WHEN z >= 110000.0 THEN 11
                  ELSE CAST(floor((z - 0.0) / ((110000.0 - 0.0) / 11)) AS INT) END AS bin,
             count(*) AS n
      FROM (SELECT $zSql AS z FROM lineitem) GROUP BY 1 ORDER BY 1""",
    "q_histo_auto" -> s"""
      WITH src AS (SELECT $zSql AS z FROM lineitem),
      rng AS (SELECT min(z) AS mn, max(z) + (max(z) - min(z)) * 1e-9 AS hi, min(z) AS lo FROM src)
      SELECT CASE WHEN z < lo THEN -1 WHEN z >= hi THEN 10
                  ELSE CAST(floor((z - lo) / ((hi - lo) / 10)) AS INT) END AS bin,
             count(*) AS n
      FROM src, rng GROUP BY 1 ORDER BY 1""",
    "q_foreach" -> """
      SELECT count(*) AS n, sum(l_quantity) AS sum_qty FROM lineitem WHERE l_quantity > 45.0""",
    "q_reduce" -> "SELECT sum(l_quantity) AS sum_qty FROM lineitem WHERE l_quantity <= 10.0",
    "q_report" -> s"""
      WITH src AS (SELECT *, $zSql AS z FROM lineitem)
      SELECT 'z_cut' AS cut, count(*) FILTER (z > 1000.0) AS pass, count(*) AS entering FROM src
      UNION ALL
      SELECT 'qty_cut', count(*) FILTER (z > 1000.0 AND l_quantity >= 25.0),
             count(*) FILTER (z > 1000.0) FROM src
      UNION ALL
      SELECT 'flag_cut',
             count(*) FILTER (z > 1000.0 AND l_quantity >= 25.0 AND l_returnflag <> 'A'),
             count(*) FILTER (z > 1000.0 AND l_quantity >= 25.0) FROM src""",
    "q_snapshot" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber""",
    "q_array_stats" -> """
      SELECT min(e) AS min_e, max(e) AS max_e, round(avg(e), 6) AS mean_e
      FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS e FROM embeddings)""",
    "q_typed_lambda" -> s"""
      SELECT count(*) AS n, sum(l_quantity) AS sum_qty, avg(l_quantity) AS mean_qty
      FROM (SELECT l_quantity, $zSql AS z FROM lineitem) WHERE z > 1000.0""",
    "q_union_chain" -> """
      SELECT count(*) AS n FROM (
        SELECT * FROM lineitem WHERE l_returnflag = 'A'
        UNION ALL SELECT * FROM lineitem WHERE l_returnflag = 'R')""",
    // oracles read the ORIGINAL parquet: equality proves the format
    // round-trip lost nothing
    "q_source_json" -> """
      SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang ORDER BY lang""",
    "q_source_csv" -> """
      SELECT source, count(*) AS n,
             CAST(sum(length(text)) AS BIGINT) AS sum_text_chars
      FROM documents GROUP BY source ORDER BY source""",
    "q_source_orc" -> """
      SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT md5(text)) AS n_digests
      FROM documents GROUP BY lang ORDER BY lang""",
    "q_source_merge_schema" -> """
      SELECT lang, count(*) AS n,
             CAST(sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing,
             CAST(sum(CASE WHEN doc_id >= 250 THEN n_chars ELSE 0 END) AS BIGINT)
               AS sum_chars
      FROM documents GROUP BY lang ORDER BY lang""",
    "q_histo_weighted" -> s"""
      SELECT CASE WHEN z < 0.0 THEN -1 WHEN z >= 110000.0 THEN 11
                  ELSE CAST(floor((z - 0.0) / ((110000.0 - 0.0) / 11)) AS INT) END AS bin,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS n
      FROM (SELECT $zSql AS z, l_quantity FROM lineitem) GROUP BY 1 ORDER BY 1""",
    "q_histo_weighted_d" -> s"""
      WITH src AS (SELECT $zSql AS z,
                          CAST(round(l_extendedprice*100) AS BIGINT) AS wu
                   FROM lineitem)
      SELECT CASE WHEN z < 0.0 THEN -1 WHEN z >= 110000.0 THEN 11
                  ELSE LEAST(CAST(floor((z - 0.0) / ((110000.0 - 0.0) / 11)) AS INT), 10) END AS bin,
             CAST(CAST(sum(wu) AS BIGINT) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS w,
             count(*) AS n_fills
      FROM src GROUP BY 1 ORDER BY 1""",
    "q_histo2d" -> s"""
      WITH src AS (SELECT $zSql AS z, l_quantity AS q FROM lineitem)
      SELECT CASE WHEN z < 0.0 THEN -1 WHEN z >= 100000.0 THEN 10
                  ELSE LEAST(CAST(floor((z - 0.0) / ((100000.0 - 0.0) / 10)) AS INT), 9) END AS bx,
             CASE WHEN q < 0.0 THEN -1 WHEN q >= 50.0 THEN 5
                  ELSE LEAST(CAST(floor((q - 0.0) / ((50.0 - 0.0) / 5)) AS INT), 4) END AS by,
             count(*) AS n
      FROM src GROUP BY 1, 2 ORDER BY bx, by""",
    "q_zorder" -> ("""
      SELECT l_orderkey, l_linenumber, """ +
      (0 until 16).map(b =>
        s"(((CAST(l_partkey AS BIGINT) >> $b) & 1) << ${2 * b}) | " +
          s"(((CAST(l_suppkey AS BIGINT) >> $b) & 1) << ${2 * b + 1})")
        .mkString(" | ") + """ AS z
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    "q_zorder3" -> ("""
      SELECT l_orderkey, l_linenumber, """ +
      (0 until 16).map { b =>
        Seq("l_partkey", "l_suppkey", "l_linenumber").zipWithIndex.map {
          case (c, i) => s"(((CAST($c AS BIGINT) >> $b) & 1) << ${3 * b + i})"
        }.mkString(" | ")
      }.mkString(" | ") + """ AS z
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    "q_histo_profile" -> s"""
      WITH src AS (SELECT $zSql AS z,
                          CAST(round(l_quantity*100) AS BIGINT) AS yu
                   FROM lineitem),
      agg AS (SELECT CASE WHEN z < 0.0 THEN -1 WHEN z >= 100000.0 THEN 10
                          ELSE LEAST(CAST(floor((z - 0.0) / ((100000.0 - 0.0) / 10)) AS INT), 9) END AS bin,
                     count(*) AS n_fills,
                     CAST(sum(yu) AS BIGINT) AS sy,
                     CAST(sum(yu*yu) AS DOUBLE) AS syy
              FROM src GROUP BY 1)
      SELECT bin, n_fills,
             CAST(sy AS DOUBLE) / CAST(n_fills AS DOUBLE) / CAST(100.0 AS DOUBLE) AS y_mean,
             sqrt(greatest(
               syy / CAST(n_fills AS DOUBLE) / CAST(100.0 AS DOUBLE) / CAST(100.0 AS DOUBLE)
                 - (CAST(sy AS DOUBLE) / CAST(n_fills AS DOUBLE) / CAST(100.0 AS DOUBLE))
                   * (CAST(sy AS DOUBLE) / CAST(n_fills AS DOUBLE) / CAST(100.0 AS DOUBLE)),
               CAST(0.0 AS DOUBLE))) AS y_rms
      FROM agg ORDER BY bin""",
    "q_histo2d_weighted" -> s"""
      WITH src AS (SELECT $zSql AS z, l_quantity AS q,
                          CAST(round(l_extendedprice*100) AS BIGINT) AS wu
                   FROM lineitem)
      SELECT CASE WHEN z < 0.0 THEN -1 WHEN z >= 100000.0 THEN 10
                  ELSE LEAST(CAST(floor((z - 0.0) / ((100000.0 - 0.0) / 10)) AS INT), 9) END AS bx,
             CASE WHEN q < 0.0 THEN -1 WHEN q >= 50.0 THEN 5
                  ELSE LEAST(CAST(floor((q - 0.0) / ((50.0 - 0.0) / 5)) AS INT), 4) END AS by,
             CAST(CAST(sum(wu) AS BIGINT) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS w,
             count(*) AS n_fills
      FROM src GROUP BY 1, 2 ORDER BY bx, by"""
  )
}
