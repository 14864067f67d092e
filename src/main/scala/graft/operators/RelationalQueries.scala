package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator suite.
  *
  * The reference (evidence-dev/duckdb_gsheets) implements no relational
  * operators itself — joins/aggregations/windows/sorts/set-ops are all
  * supplied by the host engine (DuckDB) over the scanned rows (see
  * reference `src/gsheets_extension.cpp:55-59`: no pushdown hooks, plain
  * table-function scan; its SQL tests, e.g. `test/sql/read_gsheet.test`,
  * run DuckDB operators like `limit 10` over the scan). In this engine the
  * same categories are supplied by Spark SQL. Each query here is one
  * operator-category witness with a DuckDB-oracle SQL twin in
  * [[RelationalQueries.oracleSql]].
  *
  * Conventions for oracle hash-parity:
  *   - every computed column is aliased identically on both sides;
  *   - every query ends in a deterministic total order (unique key last);
  *   - floating aggregates are `round(…, 2)` on both sides (summation
  *     order differs between engines — rounding absorbs the ULP drift);
  *   - integer sums are cast to BIGINT in the oracle (DuckDB widens
  *     integer SUM to HUGEINT, Spark to LongType);
  *   - event timestamps are truncated to second granularity (the parquet
  *     column is ns-precision; Spark reads µs, DuckDB ns).
  *
  * Scale notes (100 TB design point): dimension tables (region, nation,
  * supplier, part, customer at ratio) are broadcast; fact-fact joins
  * shuffle on their join key only after filter pushdown; every aggregate
  * is a hash aggregate with map-side partial aggregation; top-k uses
  * TakeOrderedAndProject (no global sort materialization).
  */
object RelationalQueries {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** Queries keyed by name; each takes (spark, sfDir). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- aggregation: hash agg, partial+final, multiple aggregates -----
    "q01_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .filter($"l_shipdate" <= ts("1998-09-02 00:00:00"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          CrossRound.sumMoney($"l_extendedprice" * (lit(1) - $"l_discount"), 4, 2).as("sum_disc_price"),
          CrossRound.sumMoney($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 6, 2).as("sum_charge"),
          CrossRound.avgMoney($"l_quantity", 4).as("avg_qty"),
          CrossRound.avgMoney($"l_extendedprice", 4).as("avg_price"),
          CrossRound.avgMoney($"l_discount", 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ----- selective filter + scalar-only aggregate (filter pushdown) -----
    "q02_filtered_revenue" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .filter($"l_shipdate" >= ts("1996-01-01 00:00:00") &&
                $"l_shipdate" <  ts("1997-01-01 00:00:00") &&
                $"l_discount".between(0.03, 0.07) &&
                $"l_quantity" < 24)
        .agg(CrossRound.sumMoney($"l_extendedprice" * $"l_discount", 4, 2).as("revenue"),
             count(lit(1)).as("n_rows"))
    },

    // ----- 3-way join + agg + top-k (TakeOrderedAndProject) -----
    "q03_top_orders" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.customer.filter($"c_mktsegment" === "BUILDING")
        .join(t.orders, $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" < ts("1998-03-15 00:00:00"))
        .join(t.lineitem, $"o_orderkey" === $"l_orderkey")
        .filter($"l_shipdate" > ts("1998-03-15 00:00:00"))
        .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(CrossRound.sumMoney($"l_extendedprice" * (lit(1) - $"l_discount"), 4, 2).as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },

    // ----- star join through broadcast dims (region→nation→supplier) -----
    "q04_region_revenue" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .join(broadcast(t.supplier), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(CrossRound.sumMoney($"l_extendedprice" * (lit(1) - $"l_discount"), 4, 2).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy($"r_name")
    },

    // ----- left-semi join (EXISTS) -----
    "q05_semi_join" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val bigLines = t.lineitem.filter($"l_quantity" >= 49)
      t.orders
        .join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
             round(sum($"o_totalprice"), 2).as("sum_price"))
        .orderBy($"o_orderpriority")
    },

    // ----- left-anti join (NOT EXISTS) -----
    "q06_anti_join" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val recent = t.orders.filter($"o_orderdate" >= ts("2001-01-01 00:00:00"))
      t.customer
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
             CrossRound.avgMoney($"c_acctbal", 4).as("avg_bal"))
        .orderBy($"c_mktsegment")
    },

    // ----- outer join preserving unmatched rows -----
    "q07_outer_join_agg" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey", $"c_mktsegment")
        .agg(count($"o_orderkey").as("n_orders"),
             round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spend"))
        .groupBy($"c_mktsegment", $"n_orders")
        .agg(count(lit(1)).as("n_customers"),
             round(sum($"total_spend"), 2).as("segment_spend"))
        .orderBy($"c_mktsegment", $"n_orders")
    },

    // ----- window: rank within partition -----
    "q08_window_rank" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc, $"s_suppkey")
      t.supplier
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
        .select($"n_name", $"rk", $"s_name", round($"s_acctbal", 2).as("acctbal"))
        .orderBy($"n_name", $"rk")
    },

    // ----- window: running frame aggregate -----
    // The global (partitionBy-less) window is deliberate and safe ONLY
    // because its input is the post-aggregation monthly series — row
    // count is bounded by calendar months, not data volume, so the
    // single-partition window never sees more than ~100 rows at any
    // scale. Keep the reduction-before-global-window shape. Were the
    // input ever unbounded, the rewrite is the distributed prefix-sum
    // PROVEN for q79 (`PipelineQueries.budgetSelectPrefixSum` +
    // `PrefixSumWitnessSpec`): band the order key, intra-band running
    // sums, broadcast per-band offsets.
    "q09_window_running" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val byDay = t.orders
        .groupBy(date_trunc("month", $"o_orderdate").as("o_month"))
        .agg(round(sum($"o_totalprice"), 2).as("month_total"))
      val w = Window.orderBy($"o_month").rowsBetween(Window.unboundedPreceding, 0)
      byDay
        .withColumn("running_total", round(sum($"month_total").over(w), 2))
        .select($"o_month".cast("date").as("month_start"), $"month_total", $"running_total")
        .orderBy($"month_start")
    },

    // ----- window: lag across event stream (second granularity) -----
    "q10_event_gaps" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      t.events
        .withColumn("sec", unix_timestamp(date_trunc("second", $"ts")))
        .withColumn("gap_s", $"sec" - lag($"sec", 1).over(w))
        .filter($"gap_s".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_gaps"),
             CrossRound.r(avg($"gap_s"), 2).as("avg_gap_s"),
             max($"gap_s").as("max_gap_s"))
        .orderBy($"event_type")
    },

    // ----- distinct aggregate: the exact witness of q44's HLL sketch -----
    // Single distinct column-set, so the plan is partial-distinct on
    // (flag, orderkey) then final count — NO Expand node. (The earlier
    // three-countDistinct formulation compiled to an Expand that tripled
    // the lineitem shuffle; multiple exact distincts at 100 TB is the
    // wrong tool — q44 answers that with one mergeable HLL sketch per
    // column, and this query is its exact n_orders witness.)
    "q11_distinct_agg" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("n_orders"),
             count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },

    // ----- rollup (hierarchical grouping sets) -----
    "q12_rollup" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
             count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // ----- cube (full grouping-set lattice) -----
    "q13_cube" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.orders
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
             round(sum($"o_totalprice"), 2).as("sum_price"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },

    // ----- set operations: INTERSECT / EXCEPT / UNION ALL semantics -----
    // Single-pass plan: one scan of orders (both year filters pushed as
    // one range predicate), one shuffle to per-custkey year flags, then a
    // scalar aggregate — instead of materializing each distinct set and
    // re-scanning the fact table per set operator (8 scans at 100 TB).
    // Output (and CORRECTNESS hash) identical to the set-op formulation.
    "q14_setops" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val in95 = $"o_orderdate" >= ts("1995-01-01 00:00:00") &&
                 $"o_orderdate" <  ts("1996-01-01 00:00:00")
      val in96 = $"o_orderdate" >= ts("1996-01-01 00:00:00") &&
                 $"o_orderdate" <  ts("1997-01-01 00:00:00")
      val flags = t.orders
        .filter(in95 || in96)
        .groupBy($"o_custkey")
        .agg(max(when(in95, 1).otherwise(0)).as("in95"),
             max(when(in96, 1).otherwise(0)).as("in96"))
      val summary = flags.agg(
        sum(when($"in95" === 1 && $"in96" === 1, 1L).otherwise(0L)).as("both"),
        sum(when($"in95" === 1 && $"in96" === 0, 1L).otherwise(0L)).as("only95"),
        sum(when($"in95" === 0 && $"in96" === 1, 1L).otherwise(0L)).as("only96"),
        (sum($"in95".cast("long")) + sum($"in96".cast("long"))).as("union_all"))
      summary.select(explode(array(
          struct(lit("both_years").as("bucket"), $"both".as("n")),
          struct(lit("only_1995").as("bucket"), $"only95".as("n")),
          struct(lit("only_1996").as("bucket"), $"only96".as("n")),
          struct(lit("union_all_rows").as("bucket"), $"union_all".as("n")))))
        .select($"col.bucket", $"col.n")
        .orderBy($"bucket")
    },

    // ----- scalar functions: string/math/date kitchen sink -----
    "q15_scalar_funcs" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.part
        .filter($"p_partkey" % 97 === 0)
        .select(
          $"p_partkey",
          upper($"p_name").as("name_upper"),
          lower($"p_brand").as("brand_lower"),
          length($"p_name").as("name_len"),
          substring($"p_type", 1, 3).as("type_pfx"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
          ($"p_size" % 7).as("size_mod"),
          round(abs($"p_retailprice" - 1000.0), 2).as("price_dist"),
          CrossRound.r(sqrt($"p_retailprice"), 4).as("price_sqrt"),
          when($"p_size" > 25, "L").when($"p_size" > 10, "M").otherwise("S").as("size_class"),
          replace($"p_name", lit(" "), lit("_")).as("name_snake"))
        .orderBy($"p_partkey")
    },

    // ----- conditional aggregation (CASE WHEN pivot) + JSON extraction -----
    "q16_conditional_agg" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.events
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .groupBy($"user_id" % 100 as "user_bucket")
        .agg(
          sum(when($"event_type" === "click", 1).otherwise(0)).as("n_click"),
          sum(when($"event_type" === "purchase", 1).otherwise(0)).as("n_purchase"),
          sum(when($"event_type" === "error", 1).otherwise(0)).as("n_error"),
          round(sum(when($"event_type" === "purchase", $"value").otherwise(0.0)), 2).as("purchase_value"),
          max($"k").as("max_k"))
        .orderBy($"user_bucket")
    },

    // ----- ordered-set aggregates: exact percentiles / median -----
    // Small-sf ORACLE WITNESS ONLY: exact `percentile` buffers every
    // group value in one aggregation buffer — with 3 order-status groups
    // that is 3 reducers holding the whole column at 100 TB. The scale
    // paths are q17b (approx_percentile sketch, mergeable map-side) and
    // q17c (two-pass discrete rank selection).
    "q17_percentiles" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.orders
        .groupBy($"o_orderstatus")
        .agg(
          CrossRound.r(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          CrossRound.r(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          CrossRound.r(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"),
          round(min($"o_totalprice"), 2).as("min_price"),
          round(max($"o_totalprice"), 2).as("max_price"))
        .orderBy($"o_orderstatus")
    },

    // ----- percentiles, scale path A: mergeable sketch -----
    // approx_percentile's buffer is a bounded sketch merged map-side, so
    // group skew never OOMs a reducer. Sketch algorithms differ across
    // engines, so this query has no DuckDB oracle (driver rows-only
    // check); q17/q17c carry the value-level CORRECTNESS.
    "q17b_percentiles_approx" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.orders
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 2).as("p50"),
          round(expr("approx_percentile(o_totalprice, 0.9, 10000)"), 2).as("p90"),
          round(expr("approx_percentile(o_totalprice, 0.99, 10000)"), 2).as("p99"))
        .orderBy($"o_orderstatus")
    },

    // ----- percentiles, scale path B: two-pass exact (discrete) -----
    // Pass 1: per-group counts; pass 2: rank rows and keep only the three
    // target ranks (floor((n-1)*p), lower-rank discrete percentile). No
    // per-group value buffering; memory is O(1) per row beyond the sort.
    "q17c_percentiles_twopass" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val counts = t.orders.groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice")
      t.orders
        .withColumn("rn", row_number().over(w))
        .join(broadcast(counts), "o_orderstatus")
        .withColumn("k50", floor(($"n" - 1) * 0.5) + 1)
        .withColumn("k90", floor(($"n" - 1) * 0.9) + 1)
        .withColumn("k99", floor(($"n" - 1) * 0.99) + 1)
        .filter($"rn" === $"k50" || $"rn" === $"k90" || $"rn" === $"k99")
        .groupBy($"o_orderstatus")
        .agg(
          round(max(when($"rn" === $"k50", $"o_totalprice")), 2).as("p50_disc"),
          round(max(when($"rn" === $"k90", $"o_totalprice")), 2).as("p90_disc"),
          round(max(when($"rn" === $"k99", $"o_totalprice")), 2).as("p99_disc"))
        .orderBy($"o_orderstatus")
    },

    // ----- collect + sort + string-join aggregate -----
    "q18_collect_sorted" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.nation
        .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(array_join(array_sort(collect_list($"n_name")), ",").as("nations"),
             count(lit(1)).as("n_nations"))
        .orderBy($"r_name")
    },

    // ----- time bucketing (hourly tumbling windows, batch form) -----
    "q19_time_bucket" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.events
        .groupBy(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
             round(sum($"value"), 2).as("sum_value"))
        .filter($"n_events" >= 5)
        .orderBy($"hour_start", $"event_type")
    },

    // ----- grouping sets (SQL surface) + grouping() marker -----
    "q20_grouping_sets" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.orders.createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(1) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
      """)
    },

    // ----- subqueries: correlated EXISTS / NOT IN / scalar -----
    // Catalyst de-correlates all three into joins (EXISTS → left-semi,
    // NOT IN → null-aware anti, scalar → aggregate + left outer) — no
    // per-row re-execution, so the shapes survive scale. The SQL surface
    // is the point; the plans are the same join operators as q03-q07.
    "q37_subqueries" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.customer.createOrReplaceTempView("customer_sq")
      t.orders.createOrReplaceTempView("orders_sq")
      s.sql("""
        SELECT c.c_custkey, c.c_name,
               (SELECT count(1) FROM orders_sq o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F') AS n_finished
        FROM customer_sq c
        WHERE EXISTS (SELECT 1 FROM orders_sq o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND c.c_custkey NOT IN (SELECT o_custkey FROM orders_sq
                                  WHERE o_orderpriority = '1-URGENT'
                                    AND o_totalprice < 1000)
        ORDER BY c.c_custkey
      """)
    },

    // ----- map functions: build → lookup → size over per-user counts -----
    // Exercises MapType end-to-end: map_from_entries over collected
    // (type, count) structs, element_at lookups, map_keys/size. The
    // oracle computes the same RESULT with conditional aggregation — the
    // map is the Spark-side representation under test, not a semantic
    // the oracle must mirror (same stance as q34's salting).
    "q45_map_ops" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.events
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"user_id")
        .agg(map_from_entries(
          collect_list(struct($"event_type", $"cnt"))).as("m"))
        .select($"user_id",
          coalesce(element_at($"m", "click"), lit(0L)).as("n_click"),
          coalesce(element_at($"m", "view"), lit(0L)).as("n_view"),
          size(map_keys($"m")).cast("long").as("n_types"))
        .orderBy($"user_id")
    },

    // ----- approximate distinct: HLL sketch vs exact witness -----
    // approx_count_distinct is the 100 TB path for distinct counting
    // (constant-size sketch, map-side mergeable — countDistinct's expand
    // doubles the shuffle). HLL sketches are engine-specific, so there
    // is no DuckDB hash oracle; the exact count rides along as the
    // in-row witness, ApproxDistinctSpec pins the relative error, and
    // q11 is the oracle-checked exact twin of the same (flag, orderkey)
    // distinct count.
    "q44_approx_distinct" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      // The sketch and its exact witness run as SEPARATE aggregations
      // joined on the (3-row) group keys: mixing a distinct agg with a
      // non-distinct agg in one `agg()` makes the distinct rewrite
      // evaluate the non-distinct side in the per-(group, value) first
      // aggregate — here one 2²-rsd HLL buffer per DISTINCT ORDERKEY
      // (measured 8.5 s vs 1.6 s for the two aggs run apart). At scale
      // only the sketch runs at all; the witness exists to grade it.
      val approx = t.lineitem.groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_orderkey", rsd = 0.02).as("approx_orders"))
      val exact = t.lineitem.groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("exact_orders"))
      approx.join(exact, "l_returnflag")
        .select($"l_returnflag", $"approx_orders", $"exact_orders")
        .orderBy($"l_returnflag")
    },

    // ----- theta join: pure-inequality band join -----
    // Orders land in 10 equal-width price bands via a genuine non-equi
    // join (p >= lo AND p < hi) against the 10-row band table. The build
    // side is tiny and broadcast, so the BroadcastNestedLoopJoin this
    // plans to is the CORRECT shape — per-row work is 10 comparisons.
    // (Big×big theta joins instead get banded into equality keys first —
    // q33/q22b are that pattern.)
    "q43_theta_join" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val bounds = t.orders.agg(
        min($"o_totalprice").as("mn"), max($"o_totalprice").as("mx"))
      // Band edges use the exact association of the oracle SQL
      // (band*(mx-mn) then /10) so boundary doubles are bit-identical.
      val bands = bounds.select(
          explode(expr("sequence(CAST(0 AS BIGINT), 9)")).as("band"),
          $"mn", $"mx")
        .select($"band",
          ($"mn" + $"band" * ($"mx" - $"mn") / 10.0).as("lo"),
          when($"band" === 9, $"mx" + 1.0)
            .otherwise($"mn" + ($"band" + 1) * ($"mx" - $"mn") / 10.0).as("hi"))
      t.orders.join(broadcast(bands),
          $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
        .groupBy($"band")
        .agg(count(lit(1)).as("n_orders"),
          CrossRound.avgMoney($"o_totalprice", 2).as("avg_price"))
        .orderBy($"band")
    },

    // ----- JSON scalar functions over the events.props payload -----
    // get_json_object path extraction feeding a numeric bucket aggregate
    // — the JSON slice of §2.2's scalar-function row. Extraction is a
    // map-side projection; one shuffle for the group-by.
    "q39_json_extract" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.events
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .withColumn("bucket", expr("k DIV 10"))
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("n"), CrossRound.r(avg($"k"), 4).as("avg_k"))
        .orderBy($"event_type", $"bucket")
    },

    // ----- range join: shipments inside each order's 31-day window -----
    // Point-in-interval join (l_shipdate ∈ [o_orderdate, o_orderdate+30d])
    // — the non-equi join class Spark would otherwise execute as a
    // broadcast-nested-loop over every (order, lineitem) pair. The
    // scale plan BINS the time axis: points pre-aggregate to per-day
    // counts (one shuffle, output calendar-bounded — days × 1 row)
    // that compact into a ONE-ROW broadcast dense PREFIX-SUM array
    // over the observed day span (p[k+1] = shipments on the first k
    // days), and each order answers its own 31-day window IN-ROW with
    // TWO O(1) array reads: p[hi+2] − p[lo+1] on datediff offsets,
    // clamped to the span (days outside it count 0 — the LEFT-join
    // contract). The r18 form exploded every order into 31
    // (o_orderkey, day) rows, probed a broadcast hash join, and
    // re-aggregated by o_orderkey — a 31× row fanout plus a full
    // orders-sized Exchange just to sum longs each order can read
    // locally (guide §2.4/§3.3: explode-before-join multiplies the
    // shuffle). A day→count MAP fold was tried first and REVERTED
    // in-round: Spark's element_at on a map is a LINEAR SCAN
    // (GetMapValueUtil), so 31 lookups × span-sized map per order ran
    // minutes — guide §1.1's "ideal plan, then the gotcha" loop; the
    // dense prefix array is the O(1) form. Integer sums, so
    // n_shipped_in_window is order-insensitive and oracle-identical.
    // The prefix array stays broadcast-able FOREVER (calendar-
    // bounded); at 100 TB the plan is one per-day count shuffle + one
    // map-only orders pass — no pairwise comparison anywhere.
    "q61_range_join" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      // p has size span+1, 1-based in SQL: p[1] = 0,
      // p[k+1] = Σ_{i<k} count(d0 + i days). Built once on one row
      // (the span-squared map probes below run ~ms on the 1-row agg;
      // the per-ORDER path never touches the map).
      // NULL l_shipdate rows can never land in any window (the oracle's
      // LEFT-JOIN BETWEEN predicate excludes them), and an all-NULL
      // column would otherwise feed map_from_entries a NULL key.
      val dayPrefix = t.lineitem
        .where($"l_shipdate".isNotNull)
        .groupBy(to_date($"l_shipdate").as("ship_day"))
        .agg(count(lit(1)).as("n_ship"))
        .agg(min($"ship_day").as("d0"), max($"ship_day").as("d1"),
          map_from_entries(collect_list(struct($"ship_day", $"n_ship")))
            .as("m"))
        .select($"d0", expr(
          """aggregate(sequence(0, datediff(d1, d0)),
               array(CAST(0 AS BIGINT)),
               (p, i) -> array_append(p, element_at(p, -1) +
                 coalesce(element_at(m, date_add(d0, i)),
                          CAST(0 AS BIGINT))))""").as("p"))
      t.orders
        .select($"o_orderkey", to_date($"o_orderdate").as("od"))
        .crossJoin(broadcast(dayPrefix))
        .select($"o_orderkey", expr(
          // `d0 IS NULL` = EMPTY shipments corpus (the degenerate case
          // ADVICE r19 flagged): the LEFT-join contract says every
          // order counts 0, where the bare ELSE would evaluate
          // element_at(p, NULL) and emit NULL for every order.
          """CASE WHEN d0 IS NULL
                    OR datediff(od, d0) + 30 < 0
                    OR datediff(od, d0) > size(p) - 2
                  THEN CAST(0 AS BIGINT)
                  ELSE element_at(p, least(datediff(od, d0) + 30,
                                           size(p) - 2) + 2)
                     - element_at(p, greatest(datediff(od, d0), 0) + 1)
             END""").as("n_shipped_in_window"))
        .orderBy($"o_orderkey")
    },

    // ----- pivot: orderpriority columns per orderstatus row -----
    // Fixed pivot values keep the output schema static (required for a
    // deterministic oracle); absent combinations fill 0 like the
    // oracle's conditional counts.
    "q40_pivot" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      t.orders
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
        .na.fill(0L, prios)
        .orderBy($"o_orderstatus")
    },

    // ----- unpivot: wide → long, the inverse of q40's pivot -----
    // The pivot⇄unpivot round trip: q40's wide frame (one column per
    // priority) melts back to long form with `stack`, zeros preserved —
    // so the contract is the FULL status×priority grid, which the
    // oracle builds relationally (distinct statuses × priority list,
    // left join, coalesce 0). stack() is a map-side generator: the only
    // shuffles are the pivot's own aggregation.
    "q83_unpivot" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val wide = t.orders
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
        .na.fill(0L, prios)
      wide.select($"o_orderstatus", expr(
        "stack(5, '1-URGENT', `1-URGENT`, '2-HIGH', `2-HIGH`, " +
          "'3-MEDIUM', `3-MEDIUM`, '4-NOT SPECIFIED', `4-NOT SPECIFIED`, " +
          "'5-LOW', `5-LOW`) AS (o_orderpriority, n_orders)"))
        .orderBy($"o_orderstatus", $"o_orderpriority")
    },

    // ----- time-series gap-fill: daily grid + last-observation-carried-forward -----
    // The resample step a telemetry/metrics pipeline needs before any
    // model sees the series: each user's purchase history becomes a
    // DENSE daily series over the user's own [first, last] purchase day,
    // missing days carried forward from the last observed value (LOCF).
    // Scale plan: per-day last-value is ONE map-side-combining max_by
    // aggregate (no window over raw events); the grid explodes each
    // user's bounded day span (calendar-bounded fanout, like q61's
    // bins); the LOCF window partitions by user, so no global sort and
    // no skew beyond a user's own span. Determinism: the day's last
    // purchase is picked by (ts, event_id) — total order even if two
    // events share a timestamp.
    "q76_gapfill" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val p = t.events.filter($"event_type" === "purchase")
        .select($"user_id", date_trunc("day", $"ts").as("day"),
          $"ts", $"event_id", $"value")
      val perDay = p.groupBy($"user_id", $"day")
        .agg(max_by($"value", struct($"ts", $"event_id")).as("day_val"),
             count(lit(1)).as("n_purch"))
      val span = p.groupBy($"user_id")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
      val grid = span.select($"user_id",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(perDay, Seq("user_id", "day"), "left")
        .withColumn("n_purch", coalesce($"n_purch", lit(0L)))
        .withColumn("filled_val", last($"day_val", ignoreNulls = true).over(w))
        .select($"user_id", $"day", $"n_purch", $"filled_val")
        .orderBy($"user_id", $"day")
    },

    // ----- batch sessionization: 2-hour inactivity gap -----
    // The batch twin of q32's streaming session_window, for backfill
    // over historical data: a session breaks where the gap since the
    // user's previous event exceeds 2 h; the session id is the running
    // count of breaks. Two windows over the SAME (user_id, ts, event_id)
    // ordering — one partitioning shuffle, both windows reuse it.
    // Timestamps go through the q10-proven second-floor contract
    // (unix_timestamp ∘ date_trunc second ↔ epoch ∘ date_trunc) so the
    // gap compare and the session bounds are engine-exact.
    "q77_sessionize" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.events
        .withColumn("sec", unix_timestamp(date_trunc("second", $"ts")))
        .withColumn("gap_s", $"sec" - lag($"sec", 1).over(w))
        .withColumn("brk",
          when($"gap_s".isNull || $"gap_s" > 7200, 1L).otherwise(0L))
        .withColumn("session_id", sum($"brk").over(run))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
             min($"sec").as("start_sec"),
             max($"sec").as("end_sec"),
             round(sum($"value"), 2).as("sum_value"))
        .orderBy($"user_id", $"session_id")
    },

    // ----- skew-split join: hot keys broadcast, cold keys shuffled -----
    // The manual skew mitigation for a fact⋈dim join when one fact key
    // dominates (q34 is the aggregate flavor; the AQE witness spec is
    // the automatic flavor): the hottest keys' dim rows join
    // broadcast-side (no shuffle of the hot rows AT ALL — the skewed
    // partition never forms), the long tail joins on the normal shuffled
    // path, and a union restores the full result — bit-identical to the
    // plain join the oracle runs. Hot-key DETECTION is a bounded-state
    // sketch, not an exact pass: `stat.freqItems` runs one Misra–Gries-
    // style scan whose state is an O(1/support) map merged at the
    // driver — no per-key shuffle, no sort, no full aggregation of the
    // fact table before the join it protects. Any key above the support
    // share is guaranteed in the list; false positives only route a few
    // extra (key, dim-row) pairs down the broadcast path — the unioned
    // RESULT is identical either way, which is why a sketch is safe
    // here. The driver materializes only that bounded candidate list.
    "q78_salted_join" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val ev = t.events.select($"user_id", $"value")
      val dim = t.customer
        .select($"c_custkey".as("user_id"), $"c_mktsegment")
      val hotIds = ev.stat.freqItems(Seq("user_id"), 0.002)
        .head.getSeq[Long](0).sorted
      val hotJoin = ev.filter($"user_id".isin(hotIds: _*))
        .join(broadcast(dim.filter($"user_id".isin(hotIds: _*))), "user_id")
      val coldJoin = ev.filter(!$"user_id".isin(hotIds: _*))
        .join(dim, "user_id")
      hotJoin.unionByName(coldJoin)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
             round(sum($"value"), 2).as("sum_value"))
        .orderBy($"c_mktsegment")
    },

    // ----- ordered event funnel: signup → view → click → purchase -----
    // The product-analytics staple q77's sessions don't answer: of the
    // users who signed up, how many then VIEWED (strictly after the
    // signup), then CLICKED after that, then PURCHASED? Each stage is a
    // per-user min-aggregation over a filtered scan joined back on
    // user_id — user-keyed equality shuffles end to end (AQE can
    // co-locate them), never a window over the event stream, so the
    // shape is flat in corpus size and skew-free in users. The summary
    // is a union of four 1-row aggregates; conversions are single
    // int/int divisions — exact and tie-safe cross-engine.
    "q108_event_funnel" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.events.select($"user_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("sec"),
        $"event_id")
      def stage(prev: DataFrame, tcol: String, typ: String,
          out: String): DataFrame =
        e.filter($"event_type" === typ)
          .join(prev, "user_id")
          .filter($"sec" > col(tcol))
          .groupBy($"user_id").agg(min($"sec").as(out))
      val s1 = e.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"sec").as("t1"))
      val s2 = stage(s1, "t1", "view", "t2")
      val s3 = stage(s2, "t2", "click", "t3")
      val s4 = stage(s3, "t3", "purchase", "t4")
      val n1 = s1.agg(count(lit(1)).as("n_users"))
        .select(lit(1).as("step"), lit("signup").as("event_type"), $"n_users")
      val n2 = s2.agg(count(lit(1)).as("n_users"))
        .select(lit(2).as("step"), lit("view").as("event_type"), $"n_users")
      val n3 = s3.agg(count(lit(1)).as("n_users"))
        .select(lit(3).as("step"), lit("click").as("event_type"), $"n_users")
      val n4 = s4.agg(count(lit(1)).as("n_users"))
        .select(lit(4).as("step"), lit("purchase").as("event_type"),
          $"n_users")
      val steps = n1.unionByName(n2).unionByName(n3).unionByName(n4)
      val w = Window.orderBy($"step") // 4 rows — bounded by construction
      steps
        .withColumn("first_n", first($"n_users").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_n", lag($"n_users", 1).over(w))
        .select($"step", $"event_type", $"n_users",
          when(coalesce($"prev_n", $"n_users") === 0, lit(0.0))
            .otherwise(CrossRound.r($"n_users".cast("double") /
              coalesce($"prev_n", $"n_users"), 4)).as("conv_prev"),
          when($"first_n" === 0, lit(0.0))
            .otherwise(CrossRound.r($"n_users".cast("double") / $"first_n",
              4)).as("conv_first"))
        .orderBy($"step")
    },

    // ----- event-type transition matrix (first-order Markov) -----
    // The behavior model over q77's same ordered stream: for each
    // consecutive (prev → next) event pair within a user's timeline,
    // count transitions and row-normalize into P(next | prev). The lag
    // window partitions by user (per-user state, parallel in users —
    // q10's shape); the matrix itself is |types|² rows, so the
    // normalizing join broadcasts. Probabilities are single int/int
    // divisions on exact counts.
    "q110_type_transitions" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val pairs = t.events
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy($"prev_type").agg(sum($"n").as("tot"))
      pairs.join(broadcast(totals), "prev_type")
        .select($"prev_type", $"next_type", $"n",
          CrossRound.r($"n".cast("double") / $"tot", 6).as("p"))
        .orderBy($"prev_type", $"next_type")
    },

    // ----- cohort retention matrix -----
    // The growth-analytics companion to q108's funnel and q110's
    // transitions: users cohort by the ISO-agnostic integer week of
    // their FIRST activity (epoch-day div 7 — pure integer arithmetic,
    // no engine-specific week-truncation rules), and each later active
    // week counts into (cohort_week, offset). Retention = active/cohort
    // size, a single int/int division. Scale: the active-week relation
    // is DISTINCT (user, week) — one user-keyed shuffle — the cohort is
    // a per-user min-agg on the same key (exchange reuse), and the
    // matrix is at most #weeks² rows, so the cohort-size join
    // broadcasts. No windows anywhere: every step is a key-equality
    // aggregate, parallel in users.
    "q111_cohort_retention" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val wk = t.events
        .select($"user_id",
          expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7")
            .as("week"))
        .distinct()
      val cohort = wk.groupBy($"user_id").agg(min($"week").as("cohort_week"))
      val base = cohort.groupBy($"cohort_week")
        .agg(count(lit(1)).as("n_cohort"))
      wk.join(cohort, "user_id")
        .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(base), "cohort_week")
        .select($"cohort_week", $"week_offset", $"n_active", $"n_cohort",
          CrossRound.r($"n_active".cast("double") / $"n_cohort", 4)
            .as("retention"))
        .orderBy($"cohort_week", $"week_offset")
    },

    // ----- DAU/WAU stickiness ratio -----
    // The engagement metric next to q111's retention: per integer week
    // (q111's epoch-day div 7 — no engine week-truncation rules),
    // stickiness = mean daily active users over the FIXED 7-day
    // denominator / weekly active users. Distinct-user counts are two
    // key-equality aggregates (day grain and week grain) joined on
    // week; empty days contribute 0 through the fixed ·7 denominator
    // rather than a fragile day-grid join. Integer counts, one
    // division per output row.
    "q128_stickiness" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val e = t.events
        .select($"user_id",
          expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')")
            .cast("long").as("dayn"))
      val d = e.groupBy(expr("dayn div 7").as("week"), $"dayn")
        .agg(countDistinct($"user_id").as("dau"))
      val w = e.groupBy(expr("dayn div 7").as("week"))
        .agg(countDistinct($"user_id").as("wau"))
      d.groupBy($"week").agg(sum($"dau").as("sum_dau"))
        .join(w, "week")
        .select($"week", $"wau", $"sum_dau",
          CrossRound.r(
            $"sum_dau".cast("double") / ($"wau" * 7), 4).as("stickiness"))
        .orderBy($"week")
    }
  )

  /** DuckDB-oracle twins. Table names are bare (driver registers views
    * over the same parquet). Column aliases and ordering match the Spark
    * side exactly.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000) * 100 + 0.5) / 100 AS sum_disc_price,
             floor((sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000 + 0.5) AS BIGINT)) / 1000000) * 100 + 0.5) / 100 AS sum_charge,
             floor((sum(CAST(floor((l_quantity) * 100 + 0.5) AS BIGINT)) / (count(l_quantity) * 100.0)) * 10000 + 0.5) / 10000 AS avg_qty,
             floor((sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT)) / (count(l_extendedprice) * 100.0)) * 10000 + 0.5) / 10000 AS avg_price,
             floor((sum(CAST(floor((l_discount) * 100 + 0.5) AS BIGINT)) / (count(l_discount) * 100.0)) * 10000 + 0.5) / 10000 AS avg_disc,
             count(1) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filtered_revenue" -> """
      SELECT floor((sum(CAST(floor((l_extendedprice * l_discount) * 10000 + 0.5) AS BIGINT)) / 10000) * 100 + 0.5) / 100 AS revenue,
             count(1) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24""",

    "q03_top_orders" -> """
      SELECT o_orderkey, o_orderdate, o_orderpriority,
             floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000) * 100 + 0.5) / 100 AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10""",

    "q04_region_revenue" -> """
      SELECT r_name,
             floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000) * 100 + 0.5) / 100 AS revenue,
             count(1) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",

    "q05_semi_join" -> """
      SELECT o_orderpriority,
             count(1) AS n_orders,
             round(sum(o_totalprice), 2) AS sum_price
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q06_anti_join" -> """
      SELECT c_mktsegment,
             count(1) AS n_customers,
             floor((sum(CAST(floor((c_acctbal) * 100 + 0.5) AS BIGINT)) / (count(c_acctbal) * 100.0)) * 10000 + 0.5) / 10000 AS avg_bal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q07_outer_join_agg" -> """
      WITH per_cust AS (
        SELECT c_custkey, c_mktsegment,
               count(o_orderkey) AS n_orders,
               round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment)
      SELECT c_mktsegment, n_orders,
             count(1) AS n_customers,
             round(sum(total_spend), 2) AS segment_spend
      FROM per_cust
      GROUP BY c_mktsegment, n_orders
      ORDER BY c_mktsegment, n_orders""",

    "q08_window_rank" -> """
      WITH ranked AS (
        SELECT s_nationkey, s_name, s_acctbal,
               row_number() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rk
        FROM supplier)
      SELECT n_name, CAST(rk AS INT) AS rk, s_name,
             round(s_acctbal, 2) AS acctbal
      FROM ranked JOIN nation ON s_nationkey = n_nationkey
      WHERE rk <= 3
      ORDER BY n_name, rk""",

    "q09_window_running" -> """
      WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS o_month,
               round(sum(o_totalprice), 2) AS month_total
        FROM orders GROUP BY 1)
      SELECT CAST(o_month AS DATE) AS month_start, month_total,
             round(sum(month_total) OVER (ORDER BY o_month
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      FROM monthly
      ORDER BY month_start""",

    "q10_event_gaps" -> """
      WITH w AS (
        SELECT event_type,
               epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS sec,
               lag(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))) OVER
                 (PARTITION BY user_id ORDER BY event_id) AS prev_sec
        FROM events)
      SELECT event_type,
             count(1) AS n_gaps,
             floor(avg(sec - prev_sec) * 100 + 0.5) / 100 AS avg_gap_s,
             CAST(max(sec - prev_sec) AS BIGINT) AS max_gap_s
      FROM w
      WHERE prev_sec IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type""",

    "q11_distinct_agg" -> """
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS n_orders,
             count(1) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q12_rollup" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             count(1) AS n_rows
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q13_cube" -> """
      SELECT o_orderstatus, o_orderpriority,
             count(1) AS n_orders,
             round(sum(o_totalprice), 2) AS sum_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q14_setops" -> """
      WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
           c96 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
      SELECT 'both_years' AS bucket, count(1) AS n FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
      UNION ALL
      SELECT 'only_1995' AS bucket, count(1) AS n FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
      UNION ALL
      SELECT 'only_1996' AS bucket, count(1) AS n FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c95)
      UNION ALL
      SELECT 'union_all_rows' AS bucket, count(1) AS n FROM (SELECT * FROM c95 UNION ALL SELECT * FROM c96)
      ORDER BY bucket""",

    "q15_scalar_funcs" -> """
      SELECT p_partkey,
             upper(p_name) AS name_upper,
             lower(p_brand) AS brand_lower,
             CAST(length(p_name) AS INT) AS name_len,
             substring(p_type, 1, 3) AS type_pfx,
             concat_ws('|', p_brand, p_type) AS brand_type,
             CAST(p_size % 7 AS INT) AS size_mod,
             round(abs(p_retailprice - 1000.0), 2) AS price_dist,
             floor(sqrt(p_retailprice) * 10000 + 0.5) / 10000 AS price_sqrt,
             CASE WHEN p_size > 25 THEN 'L' WHEN p_size > 10 THEN 'M' ELSE 'S' END AS size_class,
             replace(p_name, ' ', '_') AS name_snake
      FROM part
      WHERE p_partkey % 97 = 0
      ORDER BY p_partkey""",

    "q16_conditional_agg" -> """
      SELECT user_id % 100 AS user_bucket,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
             round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value,
             CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
      FROM events
      GROUP BY user_id % 100
      ORDER BY user_bucket""",

    "q17_percentiles" -> """
      SELECT o_orderstatus,
             floor(quantile_cont(o_totalprice, 0.5) * 100 + 0.5) / 100 AS p50,
             floor(quantile_cont(o_totalprice, 0.9) * 100 + 0.5) / 100 AS p90,
             floor(quantile_cont(o_totalprice, 0.99) * 100 + 0.5) / 100 AS p99,
             round(min(o_totalprice), 2) AS min_price,
             round(max(o_totalprice), 2) AS max_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q17c_percentiles_twopass" -> """
      WITH counts AS (SELECT o_orderstatus, count(1) n FROM orders GROUP BY 1),
           r AS (SELECT o_orderstatus, o_totalprice,
                        row_number() OVER (PARTITION BY o_orderstatus
                                           ORDER BY o_totalprice) rn
                 FROM orders)
      SELECT r.o_orderstatus,
             round(max(CASE WHEN rn = floor((n-1)*0.5)+1 THEN o_totalprice END), 2) AS p50_disc,
             round(max(CASE WHEN rn = floor((n-1)*0.9)+1 THEN o_totalprice END), 2) AS p90_disc,
             round(max(CASE WHEN rn = floor((n-1)*0.99)+1 THEN o_totalprice END), 2) AS p99_disc
      FROM r JOIN counts USING (o_orderstatus)
      GROUP BY 1
      ORDER BY 1""",

    "q18_collect_sorted" -> """
      SELECT r_name,
             string_agg(n_name, ',' ORDER BY n_name) AS nations,
             count(1) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",

    "q19_time_bucket" -> """
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
             event_type,
             count(1) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
      HAVING count(1) >= 5
      ORDER BY hour_start, event_type""",

    "q20_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS INT) AS g_status,
             CAST(grouping(o_orderpriority) AS INT) AS g_prio,
             count(1) AS n_orders
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
      ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "q37_subqueries" -> """
      SELECT c.c_custkey, c.c_name,
             (SELECT count(1) FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F') AS n_finished
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 300000)
        AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT'
                                  AND o_totalprice < 1000)
      ORDER BY c.c_custkey""",

    "q45_map_ops" -> """
      SELECT user_id,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
             count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
             count(DISTINCT event_type) AS n_types
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",

    // Naive range-predicate form of the binned q61 plan: identical
    // per-order counts, the engine (DuckDB IEJoin) does the interval
    // matching the Spark side avoids by binning. LEFT join so zero-match
    // orders count 0 instead of vanishing, like the Spark side.
    "q61_range_join" -> """
      SELECT o.o_orderkey,
             count(l.l_orderkey) AS n_shipped_in_window
      FROM orders o
      LEFT JOIN lineitem l
        ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
       AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY
      GROUP BY o.o_orderkey
      ORDER BY o.o_orderkey""",

    "q43_theta_join" -> """
      WITH bounds AS (
        SELECT min(o_totalprice) mn, max(o_totalprice) mx FROM orders),
      bands AS (
        SELECT band, mn + band * (mx - mn) / 10.0 AS lo,
               CASE WHEN band = 9 THEN mx + 1.0
                    ELSE mn + (band + 1) * (mx - mn) / 10.0 END AS hi
        FROM bounds CROSS JOIN (SELECT unnest(generate_series(0, 9)) band) b)
      SELECT band,
             count(1) AS n_orders,
             floor((sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)) / (count(o_totalprice) * 100.0)) * 100 + 0.5) / 100 AS avg_price
      FROM orders JOIN bands
        ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band
      ORDER BY band""",

    "q39_json_extract" -> """
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS bucket,
             count(1) AS n,
             floor(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 10000 + 0.5) / 10000 AS avg_k
      FROM events
      GROUP BY 1, 2
      ORDER BY event_type, bucket""",

    "q40_pivot" -> """
      SELECT o_orderstatus,
             count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
             count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
             count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
             count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
             count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "q83_unpivot" -> """
      WITH s AS (SELECT DISTINCT o_orderstatus FROM orders),
      p AS (SELECT unnest(['1-URGENT', '2-HIGH', '3-MEDIUM',
                           '4-NOT SPECIFIED', '5-LOW']) AS o_orderpriority),
      c AS (SELECT o_orderstatus, o_orderpriority, count(1) n
            FROM orders GROUP BY 1, 2)
      SELECT s.o_orderstatus, p.o_orderpriority,
             CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
      FROM s CROSS JOIN p
      LEFT JOIN c ON c.o_orderstatus = s.o_orderstatus
                 AND c.o_orderpriority = p.o_orderpriority
      ORDER BY s.o_orderstatus, p.o_orderpriority""",

    "q76_gapfill" -> """
      WITH p AS (
        SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               CAST(ts AS TIMESTAMP) AS ts, event_id, value
        FROM events WHERE event_type = 'purchase'),
      per_day AS (
        SELECT user_id, day, day_val, n_purch FROM (
          SELECT user_id, day, value AS day_val,
                 row_number() OVER (PARTITION BY user_id, day
                                    ORDER BY ts DESC, event_id DESC) AS rn,
                 count(1) OVER (PARTITION BY user_id, day) AS n_purch
          FROM p) WHERE rn = 1),
      span AS (SELECT user_id, min(day) d0, max(day) d1 FROM p GROUP BY 1),
      grid AS (SELECT user_id,
                      unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
               FROM span),
      j AS (SELECT g.user_id, g.day, pd.day_val,
                   coalesce(pd.n_purch, 0) AS n_purch
            FROM grid g LEFT JOIN per_day pd
              ON g.user_id = pd.user_id AND g.day = pd.day)
      SELECT user_id, day, CAST(n_purch AS BIGINT) AS n_purch,
             last_value(day_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_val
      FROM j
      ORDER BY user_id, day""",

    "q77_sessionize" -> """
      WITH w AS (
        SELECT user_id, value, ts, event_id,
               epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS sec,
               lag(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
        FROM events),
      b AS (SELECT user_id, value, ts, event_id, sec,
                   CASE WHEN prev_sec IS NULL OR sec - prev_sec > 7200
                        THEN 1 ELSE 0 END AS brk
            FROM w),
      sess AS (SELECT user_id, value, sec,
                      sum(brk) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS session_id
               FROM b)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             count(1) AS n_events,
             CAST(min(sec) AS BIGINT) AS start_sec,
             CAST(max(sec) AS BIGINT) AS end_sec,
             round(sum(value), 2) AS sum_value
      FROM sess
      GROUP BY 1, 2
      ORDER BY user_id, session_id""",

    "q78_salted_join" -> """
      SELECT c.c_mktsegment,
             count(1) AS n_events,
             round(sum(e.value), 2) AS sum_value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1
      ORDER BY c_mktsegment""",

    // Funnel twin: identical per-user min-agg stages with strict-after
    // joins; conversions are the same guarded int/int divisions.
    "q108_event_funnel" -> """
      WITH e AS (SELECT user_id, event_type,
                        epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
                          AS sec
                 FROM events),
      s1 AS (SELECT user_id, min(sec) t1 FROM e
             WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(sec) t2 FROM e JOIN s1 USING (user_id)
             WHERE event_type = 'view' AND sec > t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(sec) t3 FROM e JOIN s2 USING (user_id)
             WHERE event_type = 'click' AND sec > t2 GROUP BY 1),
      s4 AS (SELECT e.user_id, min(sec) t4 FROM e JOIN s3 USING (user_id)
             WHERE event_type = 'purchase' AND sec > t3 GROUP BY 1),
      steps AS (
        SELECT 1 AS step, 'signup' AS event_type,
               (SELECT count(1) FROM s1) AS n_users
        UNION ALL SELECT 2, 'view', (SELECT count(1) FROM s2)
        UNION ALL SELECT 3, 'click', (SELECT count(1) FROM s3)
        UNION ALL SELECT 4, 'purchase', (SELECT count(1) FROM s4)),
      x AS (SELECT step, event_type, CAST(n_users AS BIGINT) n_users,
                   lag(n_users) OVER (ORDER BY step) prev_n,
                   first_value(n_users) OVER (ORDER BY step) first_n
            FROM steps)
      SELECT step, event_type, n_users,
             CASE WHEN coalesce(prev_n, n_users) = 0 THEN 0.0
                  ELSE floor((n_users::DOUBLE / coalesce(prev_n, n_users))
                             * 10000 + 0.5) / 10000 END AS conv_prev,
             CASE WHEN first_n = 0 THEN 0.0
                  ELSE floor((n_users::DOUBLE / first_n) * 10000 + 0.5)
                       / 10000 END AS conv_first
      FROM x
      ORDER BY step""",

    // Transition twin: identical lag ordering (ts, event_id) and the
    // same single int/int division per cell.
    "q110_type_transitions" -> """
      WITH p AS (SELECT user_id, event_type,
                        lag(event_type) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)
                          AS prev_type
                 FROM events),
      c AS (SELECT prev_type, event_type AS next_type,
                   CAST(count(1) AS BIGINT) n
            FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) tot
            FROM c GROUP BY 1)
      SELECT c.prev_type, c.next_type, c.n,
             floor((c.n::DOUBLE / t.tot) * 1000000 + 0.5) / 1000000 AS p
      FROM c JOIN t USING (prev_type)
      ORDER BY prev_type, next_type""",

    // Integer week index = epoch-day // 7 in both engines (DuckDB's //
    // and Spark's div both truncate; days are non-negative here), so no
    // calendar/week-start rule ever crosses the engine boundary.
    "q111_cohort_retention" -> """
      WITH wk AS (SELECT DISTINCT user_id,
                         date_diff('day', DATE '1970-01-01',
                                   CAST(ts AS DATE)) // 7 AS week
                  FROM events),
      co AS (SELECT user_id, min(week) cohort_week FROM wk GROUP BY 1),
      base AS (SELECT cohort_week, CAST(count(1) AS BIGINT) n_cohort
               FROM co GROUP BY 1),
      act AS (SELECT cohort_week, week - cohort_week AS week_offset,
                     CAST(count(1) AS BIGINT) n_active
              FROM wk JOIN co USING (user_id) GROUP BY 1, 2)
      SELECT cohort_week, week_offset, n_active, n_cohort,
             floor((n_active::DOUBLE / n_cohort) * 10000 + 0.5) / 10000
               AS retention
      FROM act JOIN base USING (cohort_week)
      ORDER BY cohort_week, week_offset""",

    // Stickiness twin: same integer week index; the ·7 denominator is
    // fixed, so empty days need no grid join in either engine.
    "q128_stickiness" -> """
      WITH e AS (SELECT user_id,
                        CAST(date_diff('day', DATE '1970-01-01',
                                       CAST(ts AS DATE)) AS BIGINT) dayn
                 FROM events),
      d AS (SELECT dayn // 7 wk, dayn,
                   CAST(count(DISTINCT user_id) AS BIGINT) dau
            FROM e GROUP BY 1, 2),
      w AS (SELECT dayn // 7 wk,
                   CAST(count(DISTINCT user_id) AS BIGINT) wau
            FROM e GROUP BY 1)
      SELECT w.wk AS week, w.wau, CAST(sum(d.dau) AS BIGINT) AS sum_dau,
             floor((sum(d.dau)::DOUBLE / (w.wau * 7)) * 10000 + 0.5) / 10000
               AS stickiness
      FROM w JOIN d ON w.wk = d.wk
      GROUP BY w.wk, w.wau
      ORDER BY week"""
  )
}
