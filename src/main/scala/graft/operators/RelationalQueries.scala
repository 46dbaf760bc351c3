package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator surface (SURVEY.md §2.3-§2.7) as declarative
  * DataFrame queries over the driver's TPC-H-ish tables. Every query:
  *  - lets Catalyst do pruning/pushdown (no collects, no UDFs),
  *  - ends in a deterministic ORDER BY,
  *  - rounds derived doubles so the DuckDB oracle hash-matches,
  *  - has its DuckDB-equivalent SQL in `oracles` (same column names).
  *
  * Scale notes are inline per query: which side broadcasts, where the
  * shuffle lands, and why the plan survives 1000 executors.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** events with integer μs/ms columns derived from the raw nano ts — the
    * same truncation DuckDB applies reading TIMESTAMP(NANOS), so oracle
    * comparisons are integer-exact.
    */
  private[graft] def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts div 1000"))

  val defs: Map[String, Q] = Map(

    // A5/A6/A7 composite: hash-agg with partial aggregation; one shuffle on
    // the (returnflag, linestatus) grouping key — low cardinality, so at
    // 100 TB AQE coalesces the tiny post-shuffle stage.
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(38,4)")).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P2/P3-style predicate + projection: filter and both projected columns
    // push to the parquet scan (PushedFilters + 5-column ReadSchema).
    "q02_filter_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("R", "A") &&
          col("l_quantity").between(5, 45) &&
          col("l_discount").between(0.02, 0.08))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1 3-way join: customer and orders are dims vs lineitem facts;
    // customer broadcasts at any realistic scale, orders⋈lineitem shuffles
    // on orderkey once and the groupBy reuses nothing further (different
    // key) — classic star join, AQE handles skew.
    "q03_segment_revenue" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      // aggregate lineitem to per-order revenue BEFORE the join: lineitem
      // is clustered by orderkey in the files, so the groupBy reduces ~4×
      // map-side before its shuffle, and the join then moves order-count
      // rows instead of lineitem-count rows. Also replaces countDistinct
      // (which would plan an Expand, 2× rows through the shuffle): after
      // the per-order rollup each order is one row, so n_orders is a plain
      // count. Two shuffles total (reduced lineitem + orders) vs three in
      // the join-first form — at 100 TB the difference is a full pass of
      // the fact table through the wire.
      l.groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(38,4)")).as("rev_part"))
        .join(o.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        // decimal→double AFTER the exact decimal sum: the oracle driver
        // hashes the rendered value, and double bits are engine-identical
        // while DECIMAL(38,4) renderings are not (round-1 q03 hash-red).
        .agg(sum(col("rev_part")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // J2 left join vs dimension (reference: leftJoinWithCassandraTable) —
    // dim side broadcasts; nulls from the left join are coalesced.
    "q04_priority_acctbal" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(coalesce(col("c_acctbal"), lit(0.0))), 2).as("total_acctbal"))
        .orderBy("o_orderpriority")
    }),

    // J3 semi-join: replaces the reference's driver-collect + IN-pushdown
    // (GeoTagOptimizedService.scala:157-162) — the key set stays
    // distributed; Catalyst broadcasts the filtered side.
    "q05_big_spender_semi" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // J5 anti-join (existence check, reference consistency checker).
    "q06_no_big_order_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          round(avg(col("c_acctbal")), 4).as("avg_acctbal"))
        .orderBy("c_mktsegment")
    }),

    // J6 full-outer merge of two aggregates + ratio (reference does this
    // with driver-side keySet union — here it stays distributed).
    "q07_click_purchase_ratio" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_clicks"))
      val buys = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
      clicks.join(buys, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          round(coalesce(col("n_purchases"), lit(0L)) /
            greatest(coalesce(col("n_clicks"), lit(0L)), lit(1L)), 4).as("buy_ratio"))
        .orderBy("user_id")
    }),

    // A4 latest-record-per-key (reference reduceByKey argmax on parsed
    // time). Window rank=1 with a total order (ts, event_id) so ties are
    // deterministic on both engines.
    "q08_latest_event" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts_us", "value")
        .orderBy("user_id", "event_type")
    }),

    // A2 top-K per group (reference tail-100 cap → window row_number).
    "q09_top3_orders" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_custkey", "rk")
    }),

    // A7 exact percentiles + moments per group (reference AccuracyAnalysis
    // sort-based percentile → built-in `percentile`, spillable agg).
    "q10_value_percentiles" -> ((s, dir) => {
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"),
          round(avg("value"), 4).as("mean_value"),
          round(stddev_pop(col("value")), 4).as("stddev_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // A6 conditional-count histogram (reference accuracy buckets).
    "q11_value_histogram" -> ((s, dir) => {
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          sum(when(col("value") < 50, 1).otherwise(0)).as("b0_50"),
          sum(when(col("value") >= 50 && col("value") < 100, 1).otherwise(0)).as("b50_100"),
          sum(when(col("value") >= 100 && col("value") < 500, 1).otherwise(0)).as("b100_500"),
          sum(when(col("value") >= 500, 1).otherwise(0)).as("b500_plus"))
        .orderBy("event_type")
    }),

    // A5 count per key.
    "q12_user_type_counts" -> ((s, dir) => {
      ev(s, dir).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("user_id", "event_type")
    }),

    // A9 distinct.
    "q13_distinct_types" -> ((s, dir) =>
      ev(s, dir).select("event_type").distinct().orderBy("event_type")),

    // A14 consecutive-session filter (reference GoodData.filterBad:26-47):
    // drop a row when it is ≤120 s after its predecessor AND the
    // "address" (event_type here) changed; then business-hour + value +
    // type filters. lag() replaces the reference's sort-and-scan.
    "q14_good_sessions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      ev(s, dir)
        .withColumn("prev_us", lag("ts_us", 1).over(w))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_us").isNull ||
          !(col("ts_us") - col("prev_us") <= 120000000L &&
            col("event_type") =!= col("prev_type")))
        .filter(hour(col("event_ts")).between(7, 20) &&
          col("event_type") === "purchase" && col("value") < 50)
        .select("user_id", "event_id", "ts_us")
        .orderBy("user_id", "event_id")
    }),

    // §2.6 running aggregate window.
    "q15_running_value" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_us"),
          round(sum("value").over(w), 2).as("running_value"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // P1 JSON path extraction (reference json4s `\\` → get_json_object).
    "q16_json_extract" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("k_val"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("k_val")
    }),

    // P5/P6/P7 KV-attribute bag: build a map column, extract by key,
    // whitelist-filter, existence-check (MapType + element_at/map_filter).
    "q17_attr_map" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("attrs", map(
          lit("lang"), col("lang"),
          lit("source"), col("source"),
          lit("nc"), col("n_chars").cast("string")))
        .withColumn("attrs_kept",
          map_filter(col("attrs"), (k, _) => k.isin("lang", "nc")))
        .select(col("doc_id"),
          element_at(col("attrs"), "lang").as("lang_attr"),
          map_contains_key(col("attrs"), "source").as("has_source"),
          size(map_keys(col("attrs_kept"))).as("n_kept"))
        .orderBy("doc_id")
    }),

    // P8 future/past timestamp audit (reference FuturePastEvents):
    // received := device ts shifted by value-derived ms; classify skew.
    "q18_future_past" -> ((s, dir) => {
      // skew stays double-typed: a double→int cast here would truncate in
      // Spark but round in DuckDB, breaking oracle parity.
      ev(s, dir)
        .withColumn("skew_ms", col("value") * 1000 - 100000.0)
        .withColumn("clazz",
          when(col("skew_ms") > 0, "future")
            .when(col("skew_ms") < -50000.0, "past")
            .otherwise("ok"))
        .groupBy(col("clazz"))
        .agg(count(lit(1)).as("n"))
        .orderBy("clazz")
    }),

    // J4 union-merge (reference union + reduceByKey(:::)) — here
    // unionByName + one hash-agg.
    "q19_union_merge" -> ((s, dir) => {
      val e = ev(s, dir)
      val a = e.filter(col("event_type") === "click")
      val b = e.filter(col("event_type") === "purchase")
      a.unionByName(b)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"),
          max(col("ts_us")).as("last_ts_us"))
        .orderBy("user_id")
    }),

    // A1 group-into-list (reference combineByKey building List[record] per
    // key, GeoTagOptimizedService.scala:175-191). collect_list runs as
    // ObjectHashAggregate with map-side partial merge; sort_array makes the
    // result order-deterministic (collect order is not).
    "q42_event_history" -> ((s, dir) => {
      ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        // the list itself is the operator; the verified output serializes it
        // to a canonical string (values are 2-decimal doubles) because the
        // oracle harness cannot hash array columns (round-1 q42 err).
        .agg(array_join(
            transform(
              sort_array(collect_list(col("value").cast("decimal(18,2)"))),
              v => v.cast("string")),
            ",").as("history"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    }),

    // §2.8 time/encoding scalar surface: IST shift + formatting (reference
    // TimeFormatTransformation.convertTime / get_ist_timestamp), duration
    // decomposition (FuturePastEvents.formatTime), base64 round-trip
    // (SignaturePayload.convertToBlob), JSON serialize (JsonUtility).
    "q43_time_encoding" -> ((s, dir) => {
      ev(s, dir)
        .filter(col("event_id") < 100)
        .withColumn("ist_time", date_format(
          timestamp_millis(col("ts_ms") + 19800000L), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("dur_s", floor(col("value")).cast("long"))
        .select(col("event_id"), col("ist_time"),
          (col("dur_s") / 86400).cast("long").as("days"),
          ((col("dur_s") % 86400) / 3600).cast("long").as("hours"),
          ((col("dur_s") % 3600) / 60).cast("long").as("mins"),
          (col("dur_s") % 60).as("secs"),
          base64(encode(col("event_type"), "UTF-8")).as("b64"),
          unbase64(base64(encode(col("event_type"), "UTF-8"))).cast("string").as("roundtrip"),
          to_json(struct(col("user_id"), col("event_type"))).as("j"))
        .orderBy("event_id")
    }),

    // As-of join (time-series point-in-time lookup — the operator Spark
    // lacks natively, composed per the preference order from existing
    // ops): for each purchase, the latest click by the same user at or
    // before it. Stated as union + carry-forward, NOT as a range join:
    // one scan, one shuffle on user_id, one window pass in which every
    // click row updates a running "last click" and every purchase row
    // reads it (clicks sort before purchases at equal ts — the `<=`
    // semantics). The obvious equi-join with the range predicate inside
    // materializes clicks×purchases per user before its rank=1 window —
    // a skewed key (bot user: 10⁶ clicks × 10³ purchases) makes that 10⁹
    // rows in one partition; this form's window state is one row, and a
    // hot user costs exactly its own row count.
    "q47_asof_latest_click" -> ((s, dir) => {
      val e = ev(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("kind"))
        // NULL-key parity with the join form: an equi-join on user_id never
        // matches NULL users and a NULL click ts never satisfies c_ts <=
        // p_ts, but Window.partitionBy groups NULLs into one partition
        // (where a NULL-user click would wrongly carry into a NULL-user
        // purchase) and a NULL ts sorts first (where a NULL-ts click would
        // wrongly carry forward). Dropping exactly the un-matchable CLICK
        // rows restores join semantics: purchases with NULL keys survive
        // and get the -1 no-match sentinels, as the left join gave them.
        // (Scan-pushed; free on the current testdata, which has no NULLs.)
        .filter(col("kind") === 1 ||
          (col("user_id").isNotNull && col("ts_us").isNotNull))
      // (ts_us, kind, event_id) is a unique total order per user; among
      // same-ts clicks the LAST in this order is the max event_id — the
      // same (c_ts desc, c_id desc) tie-break the join form used
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e
        .withColumn("last_click_id", last(
          when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("last_click_ts", last(
          when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts_us").as("p_ts"),
          // no-match → -1 sentinels: deterministic sorting for the oracle
          // hash compare (null orderings differ across engines/tools)
          coalesce(col("last_click_id"), lit(-1L)).as("last_click_id"),
          coalesce(col("last_click_ts"), lit(-1L)).as("last_click_ts"))
        .orderBy("user_id", "p_id")
    }),

    // Approximate statistics — the 100 TB scale path for q10/q13-style
    // exact stats: HLL++ distinct counts and t-digest-style quantiles are
    // mergeable sketches (one shuffle of fixed-size state instead of all
    // values). Rows-only oracle (sketch internals differ per engine);
    // ApproxSpec pins error vs the exact answers.
    "q48_approx_stats" -> ((s, dir) => {
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          round(element_at(percentile_approx(col("value"),
            array(lit(0.5), lit(0.95)), lit(10000)), 1), 4).as("p50_approx"),
          round(element_at(percentile_approx(col("value"),
            array(lit(0.5), lit(0.95)), lit(10000)), 2), 4).as("p95_approx"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // q48's EXACT twin, as its own oracle-green entry: the same grouping
    // with exact distinct counts and interpolated percentiles (what the
    // sketches approximate). QueriesSpec pins q48's sketch-vs-exact error
    // against THIS query, so the sketch's target is itself oracle-verified;
    // at 100 TB you run q48, and q80 is the audit you run on a sample.
    "q80_exact_stats_twin" -> ((s, dir) => {
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("users"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // PORTABLE deterministic HyperLogLog — the missing third leg of the
    // sketch family: q48 is Spark's native sketch surface (rows-only by
    // nature, its internals are implementation-defined), q80 is the exact
    // audit, and THIS is a sketch whose every bit is engine-independent
    // and therefore hash-green against a full DuckDB replay. Classic HLL
    // (Flajolet et al. 2007) with m=256 registers over md5: register =
    // first hex byte, rank = 57 − bit-length of the next 56 bits (so the
    // register max-rank table is pure string/integer arithmetic, identical
    // in any engine), harmonic estimate with the m=256 alpha, and the
    // small-range linear-counting branch (fires at sf0.001 where
    // users≈75 < 2.5m; the raw branch fires at larger SFs — both paths
    // oracle-covered across the SF sweep). All estimate arithmetic is
    // either exact dyadic sums (2^-rank terms — ≤48 mantissa bits at any
    // reachable rank) or single IEEE ops in a fixed order, so the double
    // is bit-identical across engines; the one libm call (ln, linear-
    // counting only) sits under round(·,4) with ~3e-14 ulp exposure.
    // At 100 TB this is the sketch you can ship between engines and
    // audit byte-for-byte — the per-register partial aggregate is 256
    // shorts per group, same shuffle shape as approx_count_distinct.
    "q82_portable_hll" -> ((s, dir) => {
      def hll(salt: String, key: Column): (Column, Column) = {
        val h = md5(concat(lit(salt), key.cast("string")))
        val reg = conv(substring(h, 1, 2), 16, 10).cast("long")
        val w = conv(substring(h, 3, 14), 16, 10).cast("long")
        val rank = when(w === 0, lit(57))
          .otherwise(lit(57) - length(conv(w.cast("string"), 10, 2)))
        (reg, rank)
      }
      val e = ev(s, dir)
      val (regU, rankU) = hll("hllu:", col("user_id"))
      def estimate(perReg: DataFrame): DataFrame = {
        // S = Σ 2^-maxrank over filled registers + 1 per empty register
        perReg.groupBy(col("event_type"))
          .agg(sum(pow(lit(2.0), -col("mr"))).as("s_filled"),
            count(lit(1)).as("filled"))
          .withColumn("s", col("s_filled") + (lit(256) - col("filled")))
          .withColumn("zeros", lit(256) - col("filled"))
          .withColumn("raw",
            (lit(0.7213) / (lit(1) + lit(1.079) / lit(256))) * lit(65536) / col("s"))
          .withColumn("est",
            when(col("raw") <= 640.0 && col("zeros") > 0,
              lit(256) * log(lit(256) / col("zeros")))
              .otherwise(col("raw")))
      }
      val estU = estimate(
        e.select(col("event_type"), regU.as("reg"), rankU.as("rank"))
          .groupBy(col("event_type"), col("reg")).agg(max(col("rank")).as("mr")))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))
      exact.join(estU.select(col("event_type"), round(col("est"), 4).as("hll_users")),
          "event_type")
        .select(col("event_type"), col("exact_users"), col("hll_users"), col("n"))
        .orderBy("event_type")
    }),

    // The SQL-text API surface: the same Catalyst pipeline driven through
    // spark.sql over registered views — a 5-table star join (fact lineitem
    // → orders → customer → nation → region, all dims broadcastable) with
    // per-region revenue ranking. Proves a reference user can keep writing
    // SQL; also the only query family exercising nation/region.
    "q49_sql_pipeline" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"graft_$t"))
      // lineitem pre-aggregates to per-order revenue BEFORE meeting
      // orders (the q03 trick, in SQL): the files cluster by orderkey so
      // the rollup reduces ~4× map-side before its shuffle, and the
      // orderkey join then moves order-count rows instead of
      // lineitem-count rows. sum-of-per-order-sums over DECIMAL(38,4) is
      // exact, so revenue (and the window ordered by it) is bit-identical
      // to the flat form.
      s.sql(
        """SELECT r_name, n_name, revenue, CAST(rk AS INT) AS rk FROM (
          |  SELECT r.r_name, n.n_name,
          |    sum(l.rev) AS revenue,
          |    row_number() OVER (PARTITION BY r.r_name
          |      ORDER BY sum(l.rev) DESC,
          |               n.n_name) AS rk
          |  FROM (SELECT l_orderkey,
          |          sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS rev
          |        FROM graft_lineitem GROUP BY l_orderkey) l
          |  JOIN graft_orders o ON l.l_orderkey = o.o_orderkey
          |  JOIN graft_customer c ON o.o_custkey = c.c_custkey
          |  JOIN graft_nation n ON c.c_nationkey = n.n_nationkey
          |  JOIN graft_region r ON n.n_regionkey = r.r_regionkey
          |  GROUP BY r.r_name, n.n_name) t
          |WHERE rk <= 3 ORDER BY r_name, rk""".stripMargin)
    }),

    // Part/supplier dimensional rollup: lineitem facts against three
    // broadcast dims (part filtered on p_size — the predicate pushes into
    // the dim scan BEFORE the broadcast, shrinking the hash relation),
    // grouped by brand × supplier nation. One fact scan, zero fact
    // shuffles before the final low-cardinality agg.
    "q51_brand_nation_rollup" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).filter(col("p_size") <= 25)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("p_brand"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_quantity"), 2).as("total_qty"),
          // exact decimal sum, rendered as double for engine-stable hashing
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(38,4)"))
            .cast("double").as("revenue"))
        .orderBy("p_brand", "n_name")
    }),

    // P11 epoch split good/bad: single scan, one `when`, two aggregates —
    // Catalyst reuses the exchange instead of two passes.
    "q20_epoch_split" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("epoch_flag",
          when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"), "good")
            .otherwise("bad"))
        .groupBy(col("epoch_flag"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price"))
        .orderBy("epoch_flag")
    }),

    // Wide-reshape PIVOT: the source × language token matrix every
    // multilingual mixture recipe starts from (one row per source, one
    // column per language). Pivot values are EXPLICIT, which matters
    // twice at 100 TB: Spark skips the extra distinct-values job a
    // value-less pivot runs on the driver, and the plan is a single-pass
    // conditional aggregation (each pivot cell a filtered partial sum) —
    // one scan, one shuffle of 20×5 partial cells, never a per-language
    // pass. Empty cells surface as 0 on both engines.
    "q83_lang_source_pivot" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
        .groupBy(col("source")).pivot("lang", langs)
        .agg(sum(col("n_tok")))
        .select(col("source") +:
          langs.map(l => coalesce(col(l), lit(0L)).as(s"tok_$l")): _*)
        .orderBy("source")
    }),

    // Grouping-sets ROLLUP over the same matrix: detail, per-source
    // subtotal, grand total in ONE pass — the report shape subtotaled
    // dashboards ask for. Spark plans rollup as an Expand (×3 grouping
    // sets) feeding one partial+final aggregate: the shuffle carries 3×
    // the input rows but map-side partials collapse them to ≤3×group
    // cardinality before the exchange, so at 100 TB the cost is one scan
    // + a tiny shuffle, not three queries. Subtotal rows are tagged with
    // grouping_id() (bit order: grouping(source)<<1 | grouping(lang)),
    // and the oracle recomputes the same id from the rollup NULLs —
    // source/lang are never null in the data, so the mapping is exact.
    "q84_mixture_rollup" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          grouping_id().cast("int").as("gid"))
        .select(coalesce(col("source"), lit("ALL")).as("source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          col("gid"), col("n_docs"), col("total_tokens"))
        .orderBy("gid", "source", "lang")
    }),

    // UNPIVOT (melt) — the inverse reshape of q83: the wide matrix back
    // to tidy (source, lang, n_tok) rows, zero cells included (which is
    // what distinguishes melt from re-aggregating the corpus: the empty
    // (source, lang) combinations survive as explicit 0 rows). unpivot is
    // a per-row Expand projection — no shuffle beyond q83's own plan, and
    // row count grows only by the (tiny) number of melted columns.
    "q86_token_matrix_unpivot" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      defs("q83_lang_source_pivot")(s, dir)
        .unpivot(Array(col("source")),
          langs.map(l => col(s"tok_$l")).toArray, "lang", "n_tok")
        .withColumn("lang", regexp_replace(col("lang"), "^tok_", ""))
        .orderBy("source", "lang")
    }),

    // Sequence-funnel analysis (the ClickHouse windowFunnel workload):
    // how deep does each user get through signup → view → click →
    // purchase, where each step must happen strictly AFTER the previous
    // one and the whole chain within 3 days of the first signup.
    // DELIBERATE divergence from windowFunnel: this funnel anchors
    // exclusively at each user's FIRST signup and walks greedy minima
    // from there, while windowFunnel evaluates chains from ANY
    // qualifying first-step event — a user whose first signup stalls but
    // whose later signup converts reports shallower here. First-anchor
    // is the common product-analytics definition ("did the user convert
    // from their initial signup"), keeps O(1)/user state (any-anchor
    // needs per-anchor chain state), and the oracle and spec replay the
    // same definition end-to-end. Stated
    // as FOUR conditional-min aggregations chained by user_id equi-joins
    // — each pass keeps O(1) state per user and aggregates with map-side
    // partials, where the collect-the-user's-events form (what a
    // windowFunnel UDAF does internally) would buffer unbounded per-user
    // event lists through the shuffle. All comparisons are integer
    // microseconds, so step membership is engine-exact; the only double
    // is the reported avg conversion minutes (integer-derived, round-2).
    // At 100 TB: the event log is scanned once per step (4 scans of the
    // type-pruned stream), the step tables are per-USER minima (tiny),
    // and no window or cartesian appears anywhere.
    "q111_event_funnel" -> ((s, dir) => {
      val W = 3L * 86400L * 1000000L // 3 days in micros
      // NOTE (r18): pre-partitioning this checkpoint on user_id was
      // tried — localCheckpoint's LogicalRDD does NOT carry the physical
      // partitioning in this Spark version (plan-verified: every
      // consumer kept its user_id exchange and the repartition only
      // added one more), so the idea is a dead end, not an oversight.
      val e = ev(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us").as("t"))
        .localCheckpoint() // 5 consumers: the user universe + 4 steps
      val u = e.select(col("user_id")).distinct()
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("t")).as("t1"))
      val s2 = e.filter(col("event_type") === "view")
        .join(s1, "user_id")
        .filter(col("t") > col("t1") && col("t") <= col("t1") + W)
        .groupBy(col("user_id"), col("t1")).agg(min(col("t")).as("t2"))
      val s3 = e.filter(col("event_type") === "click")
        .join(s2, "user_id")
        .filter(col("t") > col("t2") && col("t") <= col("t1") + W)
        .groupBy(col("user_id"), col("t1")).agg(min(col("t")).as("t3"))
      val s4 = e.filter(col("event_type") === "purchase")
        .join(s3, "user_id")
        .filter(col("t") > col("t3") && col("t") <= col("t1") + W)
        .groupBy(col("user_id"), col("t1")).agg(min(col("t")).as("t4"))
      u.join(s1.select(col("user_id")).withColumn("d1", lit(1)), Seq("user_id"), "left")
        .join(s2.select(col("user_id")).withColumn("d2", lit(1)), Seq("user_id"), "left")
        .join(s3.select(col("user_id")).withColumn("d3", lit(1)), Seq("user_id"), "left")
        .join(s4.select(col("user_id"), (col("t4") - col("t1")).as("dur")),
          Seq("user_id"), "left")
        .withColumn("depth",
          when(col("dur").isNotNull, 4).when(col("d3") === 1, 3)
            .when(col("d2") === 1, 2).when(col("d1") === 1, 1).otherwise(0))
        .groupBy(col("depth"))
        // exact sum THEN one double division: the decimal sum is exact on
        // both engines regardless of partial-merge order (DuckDB sums into
        // HUGEINT), so the round-2 value is bit-deterministic — avg(double)
        // would sum in engine-private order and could graze a rounding
        // boundary. Decimal, not long: at ~1e8 converting users a long sum
        // of 3-day-micros durations overflows 2^63
        .agg(count(lit(1)).as("n_users"),
          coalesce(round((sum(col("dur").cast("decimal(20,0)")).cast("double") /
            count(col("dur"))) / lit(60000000.0), 2), lit(0.0)).as("avg_minutes"))
        .orderBy("depth")
    }),

    // Cohort retention (q111's companion product-analytics report): users
    // cohorted by the DAY of their first signup; a cohort member counts
    // as retained on day-offset k (1..7) if they made a purchase that
    // day. All keys are integer day indices (epoch-micros div day), so
    // cohort and cell membership are engine-exact; retention is an
    // integer ratio rounded only for display. Scale shape: the cohort
    // table is a per-user min (partial agg); the activity join is
    // user_id-keyed; the distinct is (user, cohort, offset) — bounded by
    // users × 8; the matrix agg is partial and the day-bounded cohort
    // size table broadcasts. No window, no cartesian.
    "q112_cohort_retention" -> ((s, dir) => {
      val e = ev(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us").as("t"))
        .localCheckpoint() // 2 consumers: cohort assignment + activity
      val c = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("t")).as("t1"))
        .select(col("user_id"), expr("t1 div 86400000000").as("cd"))
      val sz = c.groupBy(col("cd")).agg(count(lit(1)).as("cohort_users"))
      e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .withColumn("k", expr("(t div 86400000000) - cd"))
        .filter(col("k").between(1, 7))
        .select(col("user_id"), col("cd"), col("k")).distinct()
        .groupBy(col("cd"), col("k"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sz), "cd")
        .select(col("cd").as("cohort_day"), col("k").cast("int").as("day_offset"),
          col("cohort_users"), col("n_active"),
          round(col("n_active") / col("cohort_users").cast("double"), 4)
            .as("retention"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Time-series resample: hourly event counts per type on a DENSE
    // calendar (missing hours zero-filled — the gap-fill every BI layer
    // needs before charting or window math), smoothed with a trailing
    // 24-hour moving average. The dense frame is calendar × types —
    // bounded by the reporting period, NOT the corpus, so at 100 TB the
    // only corpus-sized stage is the (type, hour) count partial agg; the
    // calendar spine explodes from a 1-row min/max aggregate, the
    // bounded type list broadcasts onto it, and the moving-average
    // window runs over the bounded dense series. All keys are integer
    // hour indices; the MA averages <= 24 exact longs, so round-4 is
    // engine-deterministic.
    "q113_timeseries_gapfill" -> ((s, dir) => {
      // ONE corpus scan: the (type, hour) census; the calendar bounds and
      // the type list derive from the BOUNDED census itself, so only the
      // types × hours table is checkpointed — never the event stream
      val cnt = ev(s, dir)
        .select(col("event_type"), expr("ts_us div 3600000000").as("h"))
        .groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // 3 consumers: bounds, type list, zero-fill join
      val hours = cnt.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      val types = cnt.select(col("event_type")).distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(-23, Window.currentRow)
      hours.crossJoin(broadcast(types)) // bounded calendar x bounded types
        .join(cnt, Seq("event_type", "h"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .withColumn("ma24", round(avg(col("n")).over(w), 4))
        .select(col("event_type"), col("h").as("hour_index"),
          col("n").as("n_events"), col("ma24"))
        .orderBy("event_type", "hour_index")
    }),

    // CUBE report — the last of the grouping-analytics family (GROUP BY
    // q01, ROLLUP q51, PIVOT q83, UNPIVOT q86): every combination of
    // (returnflag, linestatus) subtotal plus both margins and the grand
    // total in ONE pass. Spark plans cube as a single Expand + partial
    // hash agg (each input row fans out to its 4 grouping sets
    // map-side), so the shuffle carries only aggregate buffers — at
    // 100 TB this is one scan, never 4 queries. Decimal sums are exact;
    // NULL grouping keys render as 'ALL' so the margin rows are
    // engine-identical strings.
    "q114_sales_cube" -> ((s, dir) => {
      // margin rows are identified by GROUPING(), not coalesce: a
      // genuine NULL grouping value stays distinguishable from the
      // 'ALL' margin (coalesce would conflate them into duplicate keys
      // with engine-nondeterministic relative order)
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).as("g1"),
          grouping(col("l_linestatus")).as("g2"),
          count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .select(
          when(col("g1") === 1, lit("ALL"))
            .otherwise(col("l_returnflag")).as("returnflag"),
          when(col("g2") === 1, lit("ALL"))
            .otherwise(col("l_linestatus")).as("linestatus"),
          col("n_items"), col("sum_qty"), col("sum_price"))
        .orderBy("returnflag", "linestatus")
    }),

    // Referential-integrity audit — the data-quality pass (dbt tests /
    // Deequ constraints) a pipeline runs before trusting its joins:
    // orphan counts for every declared foreign key, reported alongside
    // the child row count (an all-zero orphan column on this corpus IS
    // the result — the audit proves integrity; the spec proves the
    // DETECTOR fires by driving the shared helper with planted
    // orphans). Each rule is one left-anti count: the orphan side
    // aggregates map-side to per-partition counts and the parent key
    // set joins hash-keyed (broadcast when the parent is a dim). No
    // window, no cartesian.
    "q115_integrity_audit" -> ((s, dir) => {
      // fused per CHILD table (orphanAuditFused): lineitem is scanned
      // once for all three of its FK rules instead of twice per rule,
      // and each rule's anti-probe runs over a per-(rule, key) census
      // (distinct keys survive the map-side partial agg, not rows) —
      // at 100 TB that is 1 corpus scan + a distinct-key join in place
      // of 6 corpus scans + 3 row-level anti-join shuffles. The
      // detector-parity and planted-orphan/null-FK behavior is pinned
      // against the single-rule orphanAudit form in QueriesSpec.
      val ords = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      orphanAuditFused(Tables(s, dir, "lineitem"), Seq(
        ("lineitem_without_order", "l_orderkey", ords, "o_orderkey"),
        ("lineitem_without_part", "l_partkey",
          Tables(s, dir, "part"), "p_partkey"),
        ("lineitem_without_supplier", "l_suppkey",
          Tables(s, dir, "supplier"), "s_suppkey")))
        .unionByName(orphanAuditFused(ords, Seq(
          ("orders_without_customer", "o_custkey", cust, "c_custkey"))))
        .unionByName(orphanAuditFused(Tables.events(s, dir), Seq(
          ("events_without_customer", "user_id", cust, "c_custkey"))))
        .orderBy("relation")
    }),

    // Market-basket co-occurrence — frequent itemset mining at k=2 (the
    // retail-analytics classic): the 20 part pairs most often bought in
    // the same order, with their support. The self-join fans out per
    // ORDER by basket-size², and that bound is STRUCTURAL, not an
    // observation: baskets above MaxBasketItems are excluded by the
    // cheap per-order census before the self-join, so one pathological
    // 10⁵-item basket at 100 TB costs one filtered census row instead
    // of 10¹⁰ pairs (and a co-occurrence census over such a basket is
    // statistically meaningless anyway — the standard market-basket
    // adjudication). On the driver corpora every basket sits far below
    // MaxBasketItems (measured maxima: 11 at sf0.001, 13 at sf0.01, 17
    // at sf0.1), so the cap is invisible to the oracle hash; the
    // planted-basket spec in QueriesSpec proves the guard fires. The pair census aggregates
    // with map-side partials, the top-20 is a TakeOrdered (no global
    // sort), and Catalyst's ReusedExchange dedups the identical capped
    // basket subplan on both join sides (PlanSpec pins it). Every
    // column is an integer and the (n desc, p1, p2) order is total, so
    // top-20 membership is engine-exact even inside count-tie bands.
    "q116_basket_pairs" -> ((s, dir) => {
      // lazy 1-row total, not a driver-side count(): building the query
      // must cost nothing until it executes
      val nOrders = Tables(s, dir, "orders").agg(count(lit(1)).as("total"))
      val items = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      basketPairs(items, nOrders, MaxBasketItems)
    })
  )

  /** Items-per-order cap for q116's self-join fan-out (see the query's
    * comment). Mirrored in the oracle SQL's HAVING clause. */
  private[graft] val MaxBasketItems = 100

  /** q116's pair census over a (l_orderkey, l_partkey) basket table,
    * with the basket-size cap applied to BOTH self-join sides. Shared
    * with the planted-pathological-basket spec so the guard is tested
    * independently of the (well-behaved) corpus.
    */
  private[graft] def basketPairs(items: DataFrame, nOrders: DataFrame,
      maxBasket: Int): DataFrame = {
    // guard as a count window over the SAME l_orderkey partitioning the
    // self-join shuffles to anyway: Catalyst computes the capped basket
    // table once (ReusedExchange on both join sides, PlanSpec-pinned),
    // so the guard's only cost is a per-basket count inside a sort the
    // SMJ needs regardless. The census-plus-anti-join form paid a
    // SEPARATE corpus shuffle for the census (~25% of q116 at sf0.1);
    // this window's partitions are basket-sized — the count itself runs
    // over UNCAPPED baskets (a pathological basket pays its row count
    // once, linearly, before the filter drops it), which is safe at
    // 100 TB because a linear count per basket is exactly the cost the
    // guard exists to cap the QUADRATIC self-join at — never the
    // corpus-window anti-pattern.
    val wb = Window.partitionBy(col("l_orderkey"))
    val capped = items
      .withColumn("bsz", count(lit(1)).over(wb))
      .filter(col("bsz") <= maxBasket)
      .drop("bsz")
    // MERGE hint: the self-join's two sides are the identical capped
    // subplan, and exchange reuse (the PlanSpec pin) only happens when
    // both sides plan the same shuffle — without the hint, size stats
    // at some SFs flip the join to broadcast, whose build side is a
    // BroadcastExchange that shares nothing with the probe side, so the
    // whole distinct+window subplan (the expensive part) runs TWICE.
    // Sort-merge also needs no basket-table-sized hash relation held in
    // memory at 100 TB, and the window's (l_orderkey) sort already
    // satisfies the merge's ordering requirement.
    capped.as("a").hint("shuffle_merge")
      .join(capped.as("b").hint("shuffle_merge"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(20)
      .crossJoin(broadcast(nOrders))
      .withColumn("support",
        round(col("n_orders") / col("total").cast("double"), 6))
      .drop("total")
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
  }

  /** One referential rule as a LAZY 1-row frame (relation, n_rows,
    * n_orphans) — the counts are subplans, not driver-side actions, so
    * building q115 costs nothing until it executes and the left-anti
    * shape stays visible in the physical plan. Shared by q115 and its
    * planted-orphan spec so the detector logic is tested independently
    * of the (clean) corpus. NULL child keys count as orphans — a FK
    * that is null references nothing.
    */
  private[graft] def orphanAudit(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val rows = child.agg(count(lit(1)).as("n_rows"))
    val orphans = child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")).distinct(),
        Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    rows.crossJoin(orphans) // two 1-row aggregates
      .select(lit(name).as("relation"), col("n_rows"), col("n_orphans"))
  }

  /** Every FK rule of ONE child table in a single pass — the fused form
    * q115 runs (orphanAudit above is the single-rule reference the spec
    * pins it against). Each child row fans into its (rule, key) pairs
    * row-locally; a partial-aggregated census collapses occurrences to
    * distinct keys per rule BEFORE any join; one left join against the
    * tagged union of parent key sets yields both counts per rule:
    * n_rows = Σ cnt over the rule's census (every child row lands in
    * exactly one census cell per rule) and n_orphans = Σ cnt over
    * unmatched cells (a NULL child key joins nothing, exactly like the
    * NOT EXISTS / left_anti it replaces). Rules whose child is empty
    * still report 0/0 via the seed row. Child is scanned ONCE for all
    * its rules; the join probes distinct keys, never rows.
    */
  private[graft] def orphanAuditFused(child: DataFrame,
      rules: Seq[(String, String, DataFrame, String)]): DataFrame = {
    // rules ride as BYTE ids so the census shuffle carries (byte, long)
    // cells, not repeated rule-name strings; names re-attach on the
    // rules-sized seed at the end (broadcast — no exchange)
    val pairs = rules match {
      case Seq((_, ck, _, _)) => // single rule: no fan-out to generate
        child.select(lit(0.toByte).as("rid"), col(ck).as("k"))
      case _ => child
        .select(explode(array(rules.zipWithIndex.map { case ((_, ck, _, _), i) =>
          struct(lit(i.toByte).as("rid"), col(ck).as("k")) }: _*)).as("rk"))
        .select(col("rk.rid").as("rid"), col("rk.k").as("k"))
    }
    val census = pairs
      .groupBy(col("rid"), col("k")).agg(count(lit(1)).as("cnt"))
    val parents = rules.zipWithIndex.map { case ((_, _, parent, pk), i) =>
      parent.select(lit(i.toByte).as("rid"), col(pk).as("k")).distinct()
    }.reduce(_ unionByName _)
    val agg = census
      .join(parents.withColumn("hit", lit(1)), Seq("rid", "k"), "left")
      .groupBy(col("rid"))
      .agg(sum(col("cnt")).as("n_rows"),
        sum(when(col("hit").isNull, col("cnt")).otherwise(0L)).as("n_orphans"))
    val seed = child.sparkSession.createDataFrame(
      java.util.Arrays.asList(rules.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i.toByte, r._1) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rid",
          org.apache.spark.sql.types.ByteType, nullable = false),
        org.apache.spark.sql.types.StructField("relation",
          org.apache.spark.sql.types.StringType, nullable = false))))
    seed.join(broadcast(agg), Seq("rid"), "left")
      .select(col("relation"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_orphans"), lit(0L)).as("n_orphans"))
  }

  val oracles: Map[String, String] = Map(
    // the 4-step conditional-min funnel chain replayed
    "q111_event_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, t1, min(t) AS t2 FROM e JOIN s1 USING(user_id)
        |       WHERE event_type = 'view' AND t > t1 AND t <= t1 + 259200000000
        |       GROUP BY 1, 2),
        |s3 AS (SELECT e.user_id, t1, min(t) AS t3 FROM e JOIN s2 USING(user_id)
        |       WHERE event_type = 'click' AND t > t2 AND t <= t1 + 259200000000
        |       GROUP BY 1, 2),
        |s4 AS (SELECT e.user_id, t1, min(t) AS t4 FROM e JOIN s3 USING(user_id)
        |       WHERE event_type = 'purchase' AND t > t3 AND t <= t1 + 259200000000
        |       GROUP BY 1, 2),
        |d AS (SELECT u.user_id,
        |        CASE WHEN s4.user_id IS NOT NULL THEN 4
        |             WHEN s3.user_id IS NOT NULL THEN 3
        |             WHEN s2.user_id IS NOT NULL THEN 2
        |             WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS depth,
        |        s4.t4 - s4.t1 AS dur
        |      FROM u LEFT JOIN s1 USING(user_id) LEFT JOIN s2 USING(user_id)
        |      LEFT JOIN s3 USING(user_id) LEFT JOIN s4 USING(user_id))
        |SELECT depth, count(*) AS n_users,
        |  coalesce(round((CAST(sum(dur) AS DOUBLE) / count(dur)) / 60000000.0, 2),
        |    0.0) AS avg_minutes
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // the daily cohort assignment + purchase-activity matrix replayed
    "q112_cohort_retention" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |c AS (SELECT user_id, min(t) // 86400000000 AS cd FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |sz AS (SELECT cd, count(*) AS cohort_users FROM c GROUP BY 1),
        |act AS (SELECT DISTINCT c.user_id, c.cd, (e.t // 86400000000) - c.cd AS k
        |        FROM e JOIN c USING(user_id)
        |        WHERE e.event_type = 'purchase'
        |          AND (e.t // 86400000000) - c.cd BETWEEN 1 AND 7),
        |m AS (SELECT cd, k, count(*) AS n_active FROM act GROUP BY 1, 2)
        |SELECT m.cd AS cohort_day, CAST(m.k AS INT) AS day_offset,
        |  sz.cohort_users, m.n_active,
        |  round(m.n_active / CAST(sz.cohort_users AS DOUBLE), 4) AS retention
        |FROM m JOIN sz USING(cd) ORDER BY 1, 2""".stripMargin,

    // the distinct-items self-join + pair census + total-order top-20;
    // the HAVING interpolates MaxBasketItems (a no-op on the driver
    // corpora, whose baskets top out well below it, but part of the
    // declared semantics — and it can never drift from the Spark guard)
    "q116_basket_pairs" ->
      s"""WITH items0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ok AS (SELECT l_orderkey FROM items0 GROUP BY 1
        |       HAVING count(*) <= $MaxBasketItems),
        |items AS (SELECT items0.* FROM items0 JOIN ok USING (l_orderkey)),
        |pairs AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |c AS (SELECT p1, p2, count(*) AS n_orders FROM pairs GROUP BY 1, 2),
        |n AS (SELECT count(*) AS total FROM orders)
        |SELECT p1, p2, n_orders,
        |  round(n_orders / CAST(total AS DOUBLE), 6) AS support
        |FROM c, n
        |ORDER BY n_orders DESC, p1, p2 LIMIT 20""".stripMargin,

    // one-pass CUBE replayed (DuckDB plans GROUP BY CUBE natively)
    "q114_sales_cube" ->
      """SELECT
        |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
        |       ELSE l_returnflag END AS returnflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
        |       ELSE l_linestatus END AS linestatus,
        |  count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,

    // every declared FK rule replayed as a left-anti count
    "q115_integrity_audit" ->
      """WITH r AS (
        |  SELECT 'lineitem_without_order' AS relation,
        |    (SELECT count(*) FROM lineitem) AS n_rows,
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem_without_part',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM part p
        |                       WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL
        |  SELECT 'lineitem_without_supplier',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier s
        |                       WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL
        |  SELECT 'orders_without_customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'events_without_customer',
        |    (SELECT count(*) FROM events),
        |    (SELECT count(*) FROM events e
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = e.user_id)))
        |SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_orphans AS BIGINT) AS n_orphans
        |FROM r ORDER BY 1""".stripMargin,

    // the dense calendar spine + zero-fill + trailing-24h MA replayed
    "q113_timeseries_gapfill" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
        |hours AS (SELECT unnest(generate_series(h0, h1)) AS h FROM b),
        |types AS (SELECT DISTINCT event_type FROM e),
        |cnt AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
        |dense AS (
        |  SELECT t.event_type, hours.h, coalesce(cnt.n, 0) AS n
        |  FROM hours CROSS JOIN types t
        |  LEFT JOIN cnt ON cnt.event_type = t.event_type AND cnt.h = hours.h)
        |SELECT event_type, h AS hour_index, CAST(n AS BIGINT) AS n_events,
        |  round(avg(n) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW), 4) AS ma24
        |FROM dense ORDER BY 1, 2""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount), 4) AS net_price
        |FROM lineitem
        |WHERE l_returnflag IN ('R','A') AND l_quantity BETWEEN 5 AND 45
        |  AND l_discount BETWEEN 0.02 AND 0.08
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_segment_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q04_priority_acctbal" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(coalesce(c_acctbal, 0.0)), 2) AS total_acctbal
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_big_spender_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q06_no_big_order_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  round(avg(c_acctbal), 4) AS avg_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q07_click_purchase_ratio" ->
      """WITH clicks AS (
        |  SELECT user_id, count(*) AS n_clicks FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |buys AS (
        |  SELECT user_id, count(*) AS n_purchases FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(c.user_id, b.user_id) AS user_id,
        |  coalesce(n_clicks, 0) AS n_clicks,
        |  coalesce(n_purchases, 0) AS n_purchases,
        |  round(coalesce(n_purchases, 0) /
        |    greatest(coalesce(n_clicks, 0), 1), 4) AS buy_ratio
        |FROM clicks c FULL OUTER JOIN buys b ON c.user_id = b.user_id
        |ORDER BY user_id""".stripMargin,

    "q08_latest_event" ->
      """SELECT user_id, event_type, event_id, ts_us, value FROM (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q09_top3_orders" ->
      """SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey,
        |  round(o_totalprice, 2) AS o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q10_value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.95), 4) AS p95,
        |  round(quantile_cont(value, 0.99), 4) AS p99,
        |  round(avg(value), 4) AS mean_value,
        |  round(stddev_pop(value), 4) AS stddev_value,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q80_exact_stats_twin" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS users,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // the portable HLL replayed bit-for-bit: md5 hex → register/rank via
    // the strpos polynomial (DuckDB v1.0 has no from_hex), bit-length via
    // bin(), and the same fixed-order estimate arithmetic as the Column
    // expression (dyadic 2^-rank sums are exact; the lone ln sits under
    // round 4).
    "q82_portable_hll" -> {
      val hexDigit = (pos: Int) =>
        s"(strpos('0123456789abcdef', substring(hx, $pos, 1)) - 1)"
      val w = (0 until 14)
        .map(k => s"${hexDigit(3 + k)} * ${1L << (4 * (13 - k))}")
        .mkString(" + ")
      s"""WITH h AS (
         |  SELECT event_type,
         |    md5('hllu:' || CAST(user_id AS VARCHAR)) AS hx
         |  FROM events),
         |hr AS (
         |  SELECT event_type,
         |    ${hexDigit(1)} * 16 + ${hexDigit(2)} AS reg,
         |    $w AS w
         |  FROM h),
         |hk AS (
         |  SELECT event_type, reg,
         |    CASE WHEN w = 0 THEN 57 ELSE 57 - length(bin(w)) END AS rank
         |  FROM hr),
         |regs AS (SELECT event_type, reg, max(rank) AS mr FROM hk GROUP BY 1, 2),
         |agg AS (
         |  SELECT event_type, sum(pow(2.0::DOUBLE, -mr)) AS s_filled,
         |    count(*) AS filled
         |  FROM regs GROUP BY 1),
         |est AS (
         |  SELECT event_type, 256 - filled AS zeros,
         |    ((0.7213::DOUBLE / (1 + 1.079::DOUBLE / 256)) * 65536)
         |      / (s_filled + (256 - filled)) AS raw
         |  FROM agg),
         |ex AS (
         |  SELECT event_type, count(DISTINCT user_id) AS exact_users,
         |    count(*) AS n
         |  FROM events GROUP BY 1)
         |SELECT ex.event_type, ex.exact_users,
         |  round(CASE WHEN est.raw <= 640.0 AND est.zeros > 0
         |             THEN 256 * ln(256 / est.zeros) ELSE est.raw END, 4) AS hll_users,
         |  ex.n
         |FROM ex JOIN est ON est.event_type = ex.event_type
         |ORDER BY ex.event_type""".stripMargin
    },

    "q11_value_histogram" ->
      """SELECT event_type,
        |  CAST(sum(CASE WHEN value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS b0_50,
        |  CAST(sum(CASE WHEN value >= 50 AND value < 100 THEN 1 ELSE 0 END) AS BIGINT) AS b50_100,
        |  CAST(sum(CASE WHEN value >= 100 AND value < 500 THEN 1 ELSE 0 END) AS BIGINT) AS b100_500,
        |  CAST(sum(CASE WHEN value >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS b500_plus
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q12_user_type_counts" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q13_distinct_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q14_good_sessions" ->
      """SELECT user_id, event_id, ts_us FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value, ts,
        |    lag(epoch_us(ts)) OVER w AS prev_us,
        |    lag(event_type) OVER w AS prev_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) t
        |WHERE (prev_us IS NULL OR
        |       NOT (ts_us - prev_us <= 120000000 AND event_type <> prev_type))
        |  AND hour(ts) BETWEEN 7 AND 20
        |  AND event_type = 'purchase' AND value < 50
        |ORDER BY user_id, event_id""".stripMargin,

    "q15_running_value" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q16_json_extract" ->
      """SELECT CAST(props->>'$.k' AS INT) AS k_val, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q17_attr_map" ->
      """SELECT doc_id, lang AS lang_attr, TRUE AS has_source, 2 AS n_kept
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q18_future_past" ->
      """SELECT clazz, count(*) AS n FROM (
        |  SELECT CASE
        |    WHEN value * 1000 - 100000.0 > 0 THEN 'future'
        |    WHEN value * 1000 - 100000.0 < -50000.0 THEN 'past'
        |    ELSE 'ok' END AS clazz
        |  FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_union_merge" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  max(epoch_us(ts)) AS last_ts_us
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q43_time_encoding" ->
      """SELECT event_id,
        |  strftime(epoch_ms(epoch_ms(ts) + 19800000), '%Y-%m-%d %H:%M:%S') AS ist_time,
        |  CAST(floor(value) AS BIGINT) // 86400 AS days,
        |  (CAST(floor(value) AS BIGINT) % 86400) // 3600 AS hours,
        |  (CAST(floor(value) AS BIGINT) % 3600) // 60 AS mins,
        |  CAST(floor(value) AS BIGINT) % 60 AS secs,
        |  to_base64(encode(event_type)) AS b64,
        |  event_type AS roundtrip,
        |  to_json(struct_pack(user_id := user_id, event_type := event_type)) AS j
        |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin,

    "q42_event_history" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(CAST(value AS DECIMAL(18,2)))), ',') AS history,
        |  count(*) AS n
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q47_asof_latest_click" ->
      """SELECT user_id, p_id, p_ts, last_click_id, last_click_ts FROM (
        |  SELECT p.user_id, p.p_id, p.p_ts,
        |    coalesce(c.c_id, -1) AS last_click_id,
        |    coalesce(c.c_ts, -1) AS last_click_ts,
        |    row_number() OVER (PARTITION BY p.p_id
        |      ORDER BY c.c_ts DESC NULLS LAST, c.c_id DESC NULLS LAST) AS rn
        |  FROM (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts
        |        FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN
        |       (SELECT user_id AS c_user, event_id AS c_id, epoch_us(ts) AS c_ts
        |        FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.c_user AND c.c_ts <= p.p_ts) t
        |WHERE rn = 1 ORDER BY user_id, p_id""".stripMargin,

    "q49_sql_pipeline" ->
      """SELECT r_name, n_name, revenue, CAST(rk AS INT) AS rk FROM (
        |  SELECT r.r_name, n.n_name,
        |    sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,4))) AS revenue,
        |    row_number() OVER (PARTITION BY r.r_name
        |      ORDER BY sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,4))) DESC,
        |               n.n_name) AS rk
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY r.r_name, n.n_name) t
        |WHERE rk <= 3 ORDER BY r_name, rk""".stripMargin,

    "q51_brand_nation_rollup" ->
      """SELECT p_brand, n_name, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS total_qty,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_size <= 25
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q20_epoch_split" ->
      """SELECT CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |  THEN 'good' ELSE 'bad' END AS epoch_flag,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q83_lang_source_pivot" ->
      """WITH t AS (
        |  SELECT source, lang,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok
        |  FROM documents)
        |SELECT source,
        |  CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'de'), 0) AS BIGINT) AS tok_de,
        |  CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'en'), 0) AS BIGINT) AS tok_en,
        |  CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'es'), 0) AS BIGINT) AS tok_es,
        |  CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'fr'), 0) AS BIGINT) AS tok_fr,
        |  CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'zh'), 0) AS BIGINT) AS tok_zh
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "q84_mixture_rollup" ->
      """WITH t AS (
        |  SELECT source, lang,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok
        |  FROM documents)
        |SELECT coalesce(source, 'ALL') AS source,
        |  coalesce(lang, 'ALL') AS lang,
        |  CAST(CASE WHEN source IS NULL THEN 3
        |            WHEN lang IS NULL THEN 1 ELSE 0 END AS INT) AS gid,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
        |FROM t GROUP BY ROLLUP(source, lang)
        |ORDER BY gid, source, lang""".stripMargin,

    "q86_token_matrix_unpivot" ->
      """WITH t AS (
        |  SELECT source, lang,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok
        |  FROM documents),
        |wide AS (
        |  SELECT source,
        |    CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'de'), 0) AS BIGINT) AS tok_de,
        |    CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'en'), 0) AS BIGINT) AS tok_en,
        |    CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'es'), 0) AS BIGINT) AS tok_es,
        |    CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'fr'), 0) AS BIGINT) AS tok_fr,
        |    CAST(coalesce(sum(n_tok) FILTER (WHERE lang = 'zh'), 0) AS BIGINT) AS tok_zh
        |  FROM t GROUP BY source)
        |SELECT source, 'de' AS lang, tok_de AS n_tok FROM wide
        |UNION ALL SELECT source, 'en', tok_en FROM wide
        |UNION ALL SELECT source, 'es', tok_es FROM wide
        |UNION ALL SELECT source, 'fr', tok_fr FROM wide
        |UNION ALL SELECT source, 'zh', tok_zh FROM wide
        |ORDER BY source, lang""".stripMargin
  )
}
