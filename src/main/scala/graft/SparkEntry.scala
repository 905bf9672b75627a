package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.merge.Merge
import graft.ops.Medallion

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Each entry in `queries` exercises one operator family from SURVEY.md §2
  * (or a training-data-pipeline extension) through the graft library, over
  * the driver test tables at `sfDir`. `oracleSql` holds the equivalent
  * DuckDB SQL; column names and value arithmetic are kept bit-compatible
  * (decimal casts for money math, double promotion before float math,
  * deterministic ORDER BY everywhere).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A-family + decimal-exact aggregation (TPC-H Q1 shape; SURVEY §2.5).
    "q_agg_pricing" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // P5 — status equality filter, pushed to the parquet scan.
    "q_filter_status" -> { (s, d) =>
      Medallion.filterStatus(
        Tables.orders(s, d).withColumnRenamed("o_orderstatus", "status"), "O")
        .select(col("o_orderkey"), col("status"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // P6 — clean/quarantine split; this query returns the quarantined side.
    "q_quarantine_split" -> { (s, d) =>
      val (_, quarantined) = Medallion.cleanQuarantineSplit(
        Tables.lineitem(s, d), col("l_quantity") >= 25)
      quarantined.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // A1 — distinct projection (hash aggregate; the pipeline's only shuffle).
    "q_distinct_proj" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // O1 — global sort (range partition + per-partition sort).
    "q_orderby" -> { (s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_name"))
    },

    // P4 — conditional floor rewrite (budget-floor analog).
    "q_when_floor" -> { (s, d) =>
      Medallion.withFloor(Tables.orders(s, d), "o_totalprice", 50000L)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // P10 — abs repair.
    "q_abs_repair" -> { (s, d) =>
      Medallion.repairAbs(
        Tables.events(s, d).withColumn("value", col("value") - lit(100.0)),
        "value")
        .select(col("event_id"), col("value"))
        .orderBy(col("event_id"))
    },

    // P1/P9/P11 — metadata enrichment with deterministic literals.
    "q_enrich" -> { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          lit("documents.parquet").as("datasource"),
          lit("new").as("status"),
          to_date(lit("2026-01-01")).as("p_ingestdate"))
        .orderBy(col("doc_id"))
    },

    // J2 — left-anti "when not matched" (customers with no big orders).
    "q_left_anti" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 150000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // J1 — merge whenMatchedUpdate emulation (status writeback shape).
    "q_status_writeback" -> { (s, d) =>
      val target = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val source = Tables.orders(s, d)
        .filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey"), lit("flagged").as("o_orderstatus"))
      Merge.whenMatchedUpdate(target, source,
          Seq("o_orderkey"), Seq("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // A2 — count(*) grouped by status.
    "q_count_by_status" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    // Join + aggregate across the star schema; dims broadcast.
    "q_join_agg" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    },

    // G1 — explode an array column (one row per vector element).
    "q_explode_array" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), explode(col("embedding")).as("component"))
        .orderBy(col("vec_id"), col("component"))
    },

    // P2 — struct build + star-expansion flatten.
    "q_struct_flatten" -> { (s, d) =>
      val nested = Tables.orders(s, d)
        .select(struct(col("o_orderkey"), col("o_totalprice")).as("value"))
      Medallion.flattenStruct(nested, "value")
        .drop("value")
        .orderBy(col("o_orderkey"))
    },

    // Window function — top-3 orders per customer (generalized engine op).
    "q_window_topn" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_filter_status" ->
      """SELECT o_orderkey, o_orderstatus AS status, o_totalprice
         FROM orders WHERE o_orderstatus = 'O' ORDER BY o_orderkey""",
    "q_quarantine_split" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE NOT (l_quantity >= 25) ORDER BY l_orderkey, l_linenumber""",
    "q_distinct_proj" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q_orderby" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_name""",
    "q_when_floor" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice < 50000 THEN 50000 ELSE o_totalprice END AS o_totalprice
         FROM orders ORDER BY o_orderkey""",
    "q_abs_repair" ->
      """SELECT event_id, ABS("value" - 100.0) AS "value"
         FROM events ORDER BY event_id""",
    "q_enrich" ->
      """SELECT doc_id, 'documents.parquet' AS datasource, 'new' AS status,
         DATE '2026-01-01' AS p_ingestdate
         FROM documents ORDER BY doc_id""",
    "q_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
         ORDER BY c_custkey""",
    "q_status_writeback" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 200000 THEN 'flagged' ELSE o_orderstatus END AS o_orderstatus
         FROM orders ORDER BY o_orderkey""",
    "q_count_by_status" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_join_agg" ->
      """SELECT n_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q_explode_array" ->
      """SELECT vec_id, UNNEST(embedding) AS component FROM embeddings
         ORDER BY vec_id, component""",
    "q_struct_flatten" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey""",
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
  )
}
