package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.GeoFunctions._
import graft.operators.{Derived, SpatialJoins}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2
  * re-expressed Spark-first; [[oracleSql]] carries the DuckDB-runnable
  * ANSI SQL equivalent over the same parquet tables. Geospatial inputs
  * are derived deterministically from the TPC-H-ish tables
  * (graft.operators.Derived) so both sides compute from identical
  * data. Aggregate outputs use integer (cents) arithmetic wherever
  * possible so comparisons are exact rather than float-rounded.
  */
object SparkEntry {

  import Derived.{customerPointsSql => PTS, supplierPointsSql => SPTS}

  private val RES = 14 // ~1.2 km cells (H3-res-7-like)

  /** lat bin at res 14 in SQL (mirrors CellIndex.latBin). */
  private val latBin14Sql =
    "LEAST(GREATEST(CAST(floor((y + 90.0) / 180.0 * 16384) AS BIGINT), 0), 16383)"
  private val lonBin14Sql =
    "((CAST(floor((x + 180.0) / 360.0 * 32768) AS BIGINT) % 32768) + 32768) % 32768"

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Pages (documents) -> extracted geo-entity points -> cell index ->
    * PIP zone join -> per-zone page counts (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("geo_pip_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational baseline (scan/filter/agg/join sanity) ----

    "q1_agg" -> ((s, dir) => {
      val li = Derived.table(s, dir, "lineitem")
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(li("l_quantity")).cast("long").as("sum_qty"),
        sum(round(li("l_extendedprice") * 100).cast("long"))
          .as("sum_price_cents"),
        sum(round(li("l_discount") * 100).cast("long"))
          .as("sum_disc_cents"),
        count(lit(1)).as("n"))
    }),

    "q2_filter" -> ((s, dir) => {
      val li = Derived.table(s, dir, "lineitem")
      li.where(li("l_quantity") > 45 && li("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }),

    "q3_join" -> ((s, dir) => {
      val o = Derived.table(s, dir, "orders")
      val li = Derived.table(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderkey"))
        .agg(sum(round(li("l_extendedprice") * (lit(1.0) - li("l_discount")) * 100)
          .cast("long")).as("rev_cents"))
        .orderBy(col("rev_cents").desc, o("o_orderkey").asc)
        .limit(10)
    }),

    // ---- cell index: tile assignment (north-rule core) ----

    "geo_cell_assign" -> ((s, dir) => {
      val pts = Derived.customerPoints(s, dir)
      val cell = latlng_to_cell(pts("y"), pts("x"), lit(RES))
      pts.select(pts("id"),
        cell_lat_bin(cell).as("lat_bin"),
        cell_lon_bin(cell).as("lon_bin"))
    }),

    "geo_tile_histogram" -> ((s, dir) => {
      val pts = Derived.customerPoints(s, dir)
      val parent = cell_to_parent(
        latlng_to_cell(pts("y"), pts("x"), lit(RES)), lit(6))
      pts.select(cell_lat_bin(parent).as("lat_bin6"),
          cell_lon_bin(parent).as("lon_bin6"))
        .groupBy("lat_bin6", "lon_bin6").agg(count(lit(1)).as("n"))
    }),

    // ---- spatial joins ----

    "geo_pip_join" -> ((s, dir) => {
      val pts = Derived.customerPoints(s, dir)
      SpatialJoins.pipJoin(pts, Derived.zones(s), res = 7)
        .select(col("zone_id"), col("id"))
    }),

    "geo_knn" -> ((s, dir) => {
      val probe = Derived.supplierPoints(s, dir)
        .select(col("s_id"), col("sx"), col("sy"))
      val build = Derived.customerPoints(s, dir)
        .select(col("id").as("c_id"), col("x").as("cx"),
          col("y").as("cy"))
      SpatialJoins.knnJoin(probe, build, 3, res = 6,
          probeId = "s_id", buildId = "c_id",
          px = "sx", py = "sy", bx = "cx", by = "cy")
        .select("s_id", "c_id", "rnk")
    }),

    "geo_nn_alloc" -> ((s, dir) => {
      val probe = Derived.customerPoints(s, dir)
        .select(col("id").as("c_id"), col("x"), col("y"))
      val build = Derived.supplierPoints(s, dir)
        .select(col("s_id"), col("sx"), col("sy"))
      SpatialJoins.knnJoin(probe, build, 1, res = 4,
          probeId = "c_id", buildId = "s_id",
          px = "x", py = "y", bx = "sx", by = "sy")
        .select("c_id", "s_id")
    }),

    "geo_distance_join" -> ((s, dir) => {
      val l = Derived.customerPoints(s, dir)
      val r = Derived.supplierPoints(s, dir)
        .select(col("s_id"), col("sx"), col("sy"))
      SpatialJoins.distanceJoin(l, r, radius = 1.5,
          lx = "x", ly = "y", rx = "sx", ry = "sy")
        .select(col("id").as("c_id"), col("s_id"))
    }),

    // ---- streaming-analog tumbling window over events ----

    "events_window" -> ((s, dir) => {
      val e = Derived.table(s, dir, "events")
      e.groupBy(
          expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) DIV 3600 * 3600")
            .as("bucket"),
          e("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(e("value") * 100).cast("long")).as("sum_value_cents"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_price_cents,
        |  sum(CAST(round(l_discount * 100) AS BIGINT)) AS sum_disc_cents,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin,

    "q3_join" ->
      """SELECT o.o_orderkey,
        |  sum(CAST(round(l.l_extendedprice * (CAST(1.0 AS DOUBLE) - l.l_discount) * 100) AS BIGINT)) AS rev_cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderkey
        |ORDER BY rev_cents DESC, o.o_orderkey ASC LIMIT 10""".stripMargin,

    "geo_cell_assign" ->
      s"""WITH pts AS ($PTS)
         |SELECT id, $latBin14Sql AS lat_bin, $lonBin14Sql AS lon_bin
         |FROM pts""".stripMargin,

    "geo_tile_histogram" ->
      s"""WITH pts AS ($PTS),
         |bins AS (SELECT $latBin14Sql // 256 AS lat_bin6,
         |  $lonBin14Sql // 256 AS lon_bin6 FROM pts)
         |SELECT lat_bin6, lon_bin6, count(*) AS n
         |FROM bins GROUP BY lat_bin6, lon_bin6""".stripMargin,

    "geo_pip_join" -> {
      val arms = Derived.zonePredicatesSql.map { case (zid, pred) =>
        s"SELECT $zid AS zone_id, id FROM pts WHERE $pred"
      }.mkString("\n", "\nUNION ALL\n", "")
      s"WITH pts AS ($PTS)$arms"
    },

    "geo_knn" ->
      s"""WITH pts AS ($PTS), spts AS ($SPTS),
         |ranked AS (
         |  SELECT s.s_id, p.id AS c_id,
         |    ROW_NUMBER() OVER (PARTITION BY s.s_id
         |      ORDER BY (p.x-s.sx)*(p.x-s.sx)+(p.y-s.sy)*(p.y-s.sy), p.id) AS rnk
         |  FROM spts s CROSS JOIN pts p)
         |SELECT s_id, c_id, rnk FROM ranked WHERE rnk <= 3""".stripMargin,

    "geo_nn_alloc" ->
      s"""WITH pts AS ($PTS), spts AS ($SPTS),
         |ranked AS (
         |  SELECT p.id AS c_id, s.s_id,
         |    ROW_NUMBER() OVER (PARTITION BY p.id
         |      ORDER BY (p.x-s.sx)*(p.x-s.sx)+(p.y-s.sy)*(p.y-s.sy), s.s_id) AS rnk
         |  FROM pts p CROSS JOIN spts s)
         |SELECT c_id, s_id FROM ranked WHERE rnk = 1""".stripMargin,

    "geo_distance_join" ->
      s"""WITH pts AS ($PTS), spts AS ($SPTS)
         |SELECT p.id AS c_id, s.s_id
         |FROM pts p CROSS JOIN spts s
         |WHERE (p.x-s.sx)*(p.x-s.sx)+(p.y-s.sy)*(p.y-s.sy) <= CAST(2.25 AS DOUBLE)""".stripMargin,

    "events_window" ->
      """SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket,
        |  event_type, count(*) AS n,
        |  sum(CAST(round(value * 100) AS BIGINT)) AS sum_value_cents
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}
