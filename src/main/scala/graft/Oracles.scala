package graft

/** DuckDB oracle SQL — the textual twin of every verified Spark query.
  *
  * Formula parity rules (see [[graft.engine.Num]] for the rationale):
  *  - ROUND(x,k)  →  FLOOR(x * 1eK + 0.5) / 1eK           (both engines)
  *  - SUM(double) →  CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE)
  *  - fractional literals written in e-notation (1e2, 4e-1) so DuckDB parses
  *    them as DOUBLE, not DECIMAL — keeps both engines in pure IEEE math
  *  - Spark datediff(end, start) → DuckDB date_diff('day', start, end),
  *    cast to INTEGER to match Spark's int32
  *  - NTILE/RANK/DENSE_RANK cast to INTEGER (DuckDB returns BIGINT);
  *    SUMs of ints cast to BIGINT (DuckDB returns HUGEINT)
  *  - pinned reference date 2002-01-01 replaces current_date()
  */
object Oracles {
  private def R(e: String, k: Int): String = s"FLOOR(($e) * 1e$k + 0.5) / 1e$k"
  // audit/lineage literal twins of graft.engine.Lineage
  private val ingestCols =
    "TIMESTAMP '2001-12-31 12:00:00' AS _ingested_at, " +
      "'tpch' AS _source_system, 'batch_20011231_120000' AS _batch_id"
  private val refineCols =
    "TIMESTAMP '2001-12-31 18:00:00' AS _refined_at, " +
      "'batch_20011231_120000' AS _batch_id"
  private def DS(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(38,10))) AS DOUBLE)"
  private def DSOVER(e: String, w: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(38,10))) OVER ($w) AS DOUBLE)"

  // ---------------------------------------------------------------- bronze
  val bronzeOrders: String =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |       CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       |       $ingestCols
       |FROM orders
       |WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL""".stripMargin

  val bronzeLineitem: String =
    s"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
       |       CAST(l_shipdate AS DATE) AS l_shipdate,
       |       $ingestCols
       |FROM lineitem
      |WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
      |  AND l_quantity > 0 AND l_extendedprice > 0
      |QUALIFY ROW_NUMBER() OVER (
      |  PARTITION BY l_orderkey, l_linenumber
      |  ORDER BY CAST(l_shipdate AS DATE) DESC, l_partkey DESC, l_suppkey DESC,
      |           l_quantity DESC, l_extendedprice DESC, l_discount DESC,
      |           l_tax DESC, l_returnflag DESC, l_linestatus DESC) = 1""".stripMargin

  val bronzeCustomer = s"SELECT *, $ingestCols FROM customer WHERE c_custkey IS NOT NULL"
  val bronzeSupplier = s"SELECT *, $ingestCols FROM supplier WHERE s_suppkey IS NOT NULL"
  val bronzePart     = s"SELECT *, $ingestCols FROM part WHERE p_partkey IS NOT NULL"
  val bronzeNation   = s"SELECT *, $ingestCols FROM nation WHERE n_nationkey IS NOT NULL"
  val bronzeRegion   = s"SELECT *, $ingestCols FROM region WHERE r_regionkey IS NOT NULL"

  private val bronzeCtes =
    s"""orders_b AS ($bronzeOrders),
       |lineitem_b AS ($bronzeLineitem),
       |customer_b AS ($bronzeCustomer),
       |supplier_b AS ($bronzeSupplier),
       |part_b AS ($bronzePart),
       |nation_b AS ($bronzeNation),
       |region_b AS ($bronzeRegion)""".stripMargin

  // ---------------------------------------------------- silver order_details
  private val net = "l.l_extendedprice * (1 - l.l_discount)"
  val silverOrderDetailsBody: String =
    s"""SELECT
       |  o.o_orderkey AS order_key, l.l_linenumber AS line_number,
       |  o.o_custkey AS customer_key, l.l_partkey AS part_key,
       |  l.l_suppkey AS supplier_key, o.o_orderdate AS order_date,
       |  o.o_orderstatus AS order_status, o.o_orderpriority AS order_priority,
       |  p.p_name AS part_name, p.p_brand AS part_brand, p.p_type AS part_type,
       |  l.l_quantity AS quantity, l.l_extendedprice AS extended_price,
       |  l.l_discount AS discount_pct, l.l_tax AS tax_pct,
       |  l.l_shipdate AS ship_date, l.l_returnflag AS return_flag,
       |  ${R("l.l_extendedprice / NULLIF(l.l_quantity, 0)", 2)} AS unit_price,
       |  ${R(net, 2)} AS net_revenue,
       |  ${R(s"$net * l.l_tax", 2)} AS tax_amount,
       |  ${R(s"$net * (1 + l.l_tax)", 2)} AS total_charge,
       |  CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INTEGER) AS shipping_delay_days,
       |  date_diff('day', o.o_orderdate, l.l_shipdate) > 90 AS is_late_shipment,
       |  CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
       |  CAST(MONTH(o.o_orderdate) AS INTEGER) AS order_month,
       |  CAST(QUARTER(o.o_orderdate) AS INTEGER) AS order_quarter,
       |  $refineCols
       |FROM orders_b o
       |JOIN lineitem_b l ON o.o_orderkey = l.l_orderkey
       |LEFT JOIN part_b p ON l.l_partkey = p.p_partkey
       |WHERE l.l_quantity > 0 AND l.l_extendedprice > 0 AND ${R(net, 2)} >= 0""".stripMargin

  // -------------------------------------------------- silver customer_orders
  private val geoCte =
    """geo AS (
      |  SELECT c.c_custkey AS customer_key, c.c_name AS customer_name,
      |         c.c_mktsegment AS market_segment, c.c_acctbal AS account_balance,
      |         n.n_name AS nation_name, r.r_name AS region_name
      |  FROM customer_b c
      |  LEFT JOIN nation_b n ON c.c_nationkey = n.n_nationkey
      |  LEFT JOIN region_b r ON n.n_regionkey = r.r_regionkey)""".stripMargin

  private val customerOrdersCtes: String =
    s"""$geoCte,
       |oagg AS (
       |  SELECT o_custkey AS customer_key,
       |    COUNT(o_orderkey) AS total_orders,
       |    COALESCE(${DS("o_totalprice")}, 0e0) AS total_revenue,
       |    COALESCE(${R(s"${DS("o_totalprice")} / COUNT(o_orderkey)", 2)}, 0e0) AS avg_order_value,
       |    MIN(o_orderdate) AS first_order_date,
       |    MAX(o_orderdate) AS last_order_date,
       |    CAST(date_diff('day', MAX(o_orderdate), DATE '2002-01-01') AS INTEGER) AS days_since_last_order,
       |    CASE WHEN COUNT(o_orderkey) > 1
       |      THEN ${R("date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) / (COUNT(o_orderkey) - 1e0)", 2)}
       |      ELSE NULL END AS order_frequency_days,
       |    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS fulfilled_orders,
       |    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_orders,
       |    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS partial_orders,
       |    CASE WHEN COUNT(o_orderkey) > 0
       |      THEN ${R("1e2 * COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) / COUNT(o_orderkey)", 2)}
       |      ELSE 0e0 END AS fulfillment_rate,
       |    CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS INTEGER) AS customer_tenure_days
       |  FROM orders_b GROUP BY o_custkey),
       |rfm AS (
       |  SELECT geo.customer_key, customer_name, market_segment, nation_name,
       |         region_name, account_balance, total_orders, total_revenue,
       |         avg_order_value, first_order_date, last_order_date,
       |         days_since_last_order, order_frequency_days, fulfilled_orders,
       |         open_orders, partial_orders, fulfillment_rate, customer_tenure_days,
       |    CAST(NTILE(5) OVER (ORDER BY days_since_last_order ASC, geo.customer_key ASC) AS INTEGER) AS rfm_recency_score,
       |    CAST(NTILE(5) OVER (ORDER BY total_orders DESC, geo.customer_key ASC) AS INTEGER) AS rfm_frequency_score,
       |    CAST(NTILE(5) OVER (ORDER BY total_revenue DESC, geo.customer_key ASC) AS INTEGER) AS rfm_monetary_score
       |  FROM geo JOIN oagg ON geo.customer_key = oagg.customer_key)""".stripMargin

  val silverCustomerOrdersBody: String =
    s"""SELECT *,
      |  CASE
      |    WHEN rfm_recency_score <= 2 AND rfm_frequency_score <= 2 AND rfm_monetary_score <= 2
      |      THEN 'Champions'
      |    WHEN rfm_recency_score <= 2 AND rfm_frequency_score <= 3 THEN 'Loyal Customers'
      |    WHEN rfm_recency_score <= 2 AND rfm_monetary_score <= 2 THEN 'Big Spenders'
      |    WHEN rfm_recency_score <= 3 AND rfm_frequency_score <= 3 THEN 'Potential Loyalists'
      |    WHEN rfm_recency_score >= 4 AND rfm_frequency_score >= 4 THEN 'At Risk'
      |    WHEN rfm_recency_score >= 4 AND rfm_frequency_score <= 2 THEN 'Cannot Lose Them'
       |    ELSE 'Others'
       |  END AS customer_segment,
       |  $refineCols
       |FROM rfm""".stripMargin

  // --------------------------------------------------- silver supplier_parts
  private val supplierPartsCtes: String =
    s"""bridge AS (
       |  SELECT l_partkey AS part_key, l_suppkey AS supplier_key,
       |    ${R("MIN(l_extendedprice / l_quantity)", 2)} AS supply_cost,
       |    ${DS("l_quantity")} AS available_qty
       |  FROM lineitem_b GROUP BY l_partkey, l_suppkey),
       |supp_geo AS (
       |  SELECT s.s_suppkey AS supplier_key, s.s_name AS supplier_name,
       |         n.n_name AS supplier_nation, r.r_name AS supplier_region,
       |         s.s_acctbal AS supplier_acct_balance
       |  FROM supplier_b s
       |  LEFT JOIN nation_b n ON s.s_nationkey = n.n_nationkey
       |  LEFT JOIN region_b r ON n.n_regionkey = r.r_regionkey),
       |sp_margin AS (
       |  SELECT b.supplier_key, sg.supplier_name, sg.supplier_nation,
       |         sg.supplier_region, sg.supplier_acct_balance,
       |         b.part_key, p.p_name AS part_name, p.p_brand AS part_brand,
       |         p.p_type AS part_type, p.p_size AS part_size,
       |         p.p_retailprice AS retail_price, b.supply_cost, b.available_qty,
       |    ${R("p.p_retailprice - b.supply_cost", 2)} AS cost_margin,
       |    ${R("(p.p_retailprice - b.supply_cost) / NULLIF(p.p_retailprice, 0)", 4)} AS margin_pct
       |  FROM bridge b
       |  JOIN supp_geo sg ON b.supplier_key = sg.supplier_key
       |  JOIN part_b p ON b.part_key = p.p_partkey)""".stripMargin

  private val regionAvgExpr =
    s"""(${DSOVER("supply_cost", "PARTITION BY supplier_region, part_type")}
       | / COUNT(*) OVER (PARTITION BY supplier_region, part_type))""".stripMargin

  val silverSupplierPartsBody: String =
    s"""SELECT supplier_key, supplier_name, supplier_nation, supplier_region,
       |  supplier_acct_balance, part_key, part_name, part_brand, part_type,
       |  part_size, retail_price, supply_cost, available_qty, cost_margin, margin_pct,
       |  CAST(DENSE_RANK() OVER (PARTITION BY supplier_region, part_type
       |       ORDER BY supply_cost ASC) AS INTEGER) AS cost_rank_in_region,
       |  DENSE_RANK() OVER (PARTITION BY supplier_region, part_type
       |       ORDER BY supply_cost ASC) = 1 AS is_cheapest_in_region,
       |  ${R(regionAvgExpr, 2)} AS avg_region_cost,
       |  ${R(s"supply_cost / NULLIF($regionAvgExpr, 0)", 4)} AS cost_vs_region_avg,
       |  $refineCols
       |FROM sp_margin""".stripMargin

  // full-silver CTE bundle reused by gold + quality oracles
  val silverCtes: String =
    s"""$bronzeCtes,
       |od AS ($silverOrderDetailsBody),
       |$customerOrdersCtes,
       |co AS ($silverCustomerOrdersBody),
       |$supplierPartsCtes,
       |sp AS ($silverSupplierPartsBody)""".stripMargin

  // ------------------------------------------------------------------- gold
  val goldRevenueByRegion: String =
    s"""WITH $silverCtes,
       |m AS (
       |  SELECT g.region_name, g.nation_name, g.market_segment,
       |    od.order_year, od.order_quarter, od.order_month,
       |    COUNT(DISTINCT od.order_key) AS order_count,
       |    ${DS("od.quantity")} AS total_quantity,
       |    ${R(DS("od.net_revenue"), 2)} AS total_revenue,
       |    ${R(DS("od.total_charge"), 2)} AS total_charge_with_tax,
       |    ${R(s"${DS("od.net_revenue")} / COUNT(*)", 2)} AS avg_line_revenue,
       |    ${R(s"${DS("od.discount_pct")} / COUNT(*)", 4)} AS avg_discount_rate,
       |    COUNT(CASE WHEN od.is_late_shipment THEN 1 END) AS late_shipments,
       |    COUNT(*) AS total_lines,
       |    ${R("1e2 * COUNT(CASE WHEN od.is_late_shipment THEN 1 END) / COUNT(*)", 2)} AS late_shipment_pct
       |  FROM od JOIN geo g ON od.customer_key = g.customer_key
       |  GROUP BY g.region_name, g.nation_name, g.market_segment,
       |           od.order_year, od.order_quarter, od.order_month)
       |SELECT *,
       |  ${R("(total_revenue - prev_year_revenue) / NULLIF(prev_year_revenue, 0) * 100", 2)}
       |    AS yoy_revenue_growth_pct,
       |  ${R(s"total_revenue / NULLIF(${DSOVER("total_revenue", "PARTITION BY region_name, order_year, order_quarter")}, 0) * 100", 2)}
       |    AS revenue_share_in_region_pct
       |FROM (SELECT *,
       |        LAG(total_revenue) OVER (
       |          PARTITION BY region_name, nation_name, market_segment, order_month
       |          ORDER BY order_year) AS prev_year_revenue
       |      FROM m)
       |ORDER BY region_name, nation_name, market_segment, order_year, order_month""".stripMargin

  val goldCustomerLifetimeValue: String =
    s"""WITH $silverCtes,
       |odm AS (
       |  SELECT customer_key,
       |    COUNT(DISTINCT part_brand) AS distinct_brands_purchased,
       |    COUNT(DISTINCT part_type) AS distinct_part_types,
       |    ${R("CAST(SUM(shipping_delay_days) AS BIGINT) / COUNT(shipping_delay_days)", 1)} AS avg_shipping_delay,
       |    ${R(s"${DS("discount_pct")} / COUNT(*)", 4)} AS avg_discount_received,
       |    CAST(SUM(CASE WHEN return_flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines,
       |    COUNT(*) AS total_lines,
       |    ${R("1e2 * SUM(CASE WHEN return_flag = 'R' THEN 1 ELSE 0 END) / COUNT(*)", 2)} AS return_rate_pct,
       |    ${R(DS("net_revenue"), 2)} AS detailed_total_revenue,
       |    ${R(DS("tax_amount"), 2)} AS total_tax_paid
       |  FROM od GROUP BY customer_key),
       |ca AS (
       |  SELECT customer_key,
       |    CAST(YEAR(first_order_date) AS VARCHAR) || '-Q' ||
       |      CAST(QUARTER(first_order_date) AS VARCHAR) AS acquisition_cohort,
       |    ${R("avg_order_value * (CASE WHEN order_frequency_days > 0 THEN 365e0 / order_frequency_days ELSE 1e0 END) * 3", 2)}
       |      AS estimated_3yr_clv,
       |    CASE WHEN customer_tenure_days > 0
       |      THEN ${R("total_revenue / customer_tenure_days", 2)}
       |      ELSE total_revenue END AS revenue_per_tenure_day
       |  FROM co)
       |SELECT co.customer_key, co.customer_name, co.market_segment, co.nation_name,
       |  co.region_name, co.account_balance, co.total_orders, co.total_revenue,
       |  co.avg_order_value, co.first_order_date, co.last_order_date,
       |  co.days_since_last_order, co.order_frequency_days, co.fulfillment_rate,
       |  co.customer_tenure_days, co.customer_segment,
       |  co.rfm_recency_score, co.rfm_frequency_score, co.rfm_monetary_score,
       |  odm.distinct_brands_purchased, odm.distinct_part_types,
       |  odm.avg_shipping_delay, odm.avg_discount_received, odm.returned_lines,
       |  odm.total_lines, odm.return_rate_pct, odm.detailed_total_revenue, odm.total_tax_paid,
       |  ca.acquisition_cohort, ca.estimated_3yr_clv, ca.revenue_per_tenure_day,
       |  PERCENT_RANK() OVER (ORDER BY co.total_revenue) AS revenue_percentile,
       |  PERCENT_RANK() OVER (ORDER BY co.total_orders) AS order_frequency_percentile,
       |  CASE
       |    WHEN PERCENT_RANK() OVER (ORDER BY co.total_revenue) >= 0.9 THEN 'Platinum'
       |    WHEN PERCENT_RANK() OVER (ORDER BY co.total_revenue) >= 0.7 THEN 'Gold'
       |    WHEN PERCENT_RANK() OVER (ORDER BY co.total_revenue) >= 0.4 THEN 'Silver'
       |    ELSE 'Bronze'
       |  END AS value_tier
       |FROM co
       |LEFT JOIN odm ON co.customer_key = odm.customer_key
       |LEFT JOIN ca ON co.customer_key = ca.customer_key
       |ORDER BY co.customer_key""".stripMargin

  val goldSupplierPerformance: String =
    s"""WITH $silverCtes,
       |scm AS (
       |  SELECT supplier_key, supplier_name, supplier_nation, supplier_region,
       |         supplier_acct_balance,
       |    COUNT(DISTINCT part_key) AS parts_in_catalog,
       |    COUNT(DISTINCT part_type) AS distinct_part_types,
       |    COUNT(DISTINCT part_brand) AS distinct_brands,
       |    ${DS("available_qty")} AS total_available_qty,
       |    ${R(s"${DS("supply_cost")} / COUNT(*)", 2)} AS avg_supply_cost,
       |    ${R(s"${DS("margin_pct")} / COUNT(*) * 100", 2)} AS avg_margin_pct,
       |    ${R(s"${DS("cost_vs_region_avg")} / COUNT(*)", 4)} AS avg_cost_vs_region,
       |    CAST(SUM(CASE WHEN is_cheapest_in_region THEN 1 ELSE 0 END) AS BIGINT) AS cheapest_count,
       |    COUNT(*) AS total_combos,
       |    ${R("1e2 * SUM(CASE WHEN is_cheapest_in_region THEN 1 ELSE 0 END) / COUNT(*)", 2)} AS cheapest_pct
       |  FROM sp
       |  GROUP BY supplier_key, supplier_name, supplier_nation, supplier_region,
       |           supplier_acct_balance),
       |sdm AS (
       |  SELECT supplier_key,
       |    COUNT(DISTINCT order_key) AS orders_fulfilled,
       |    ${DS("quantity")} AS total_qty_shipped,
       |    ${R(DS("net_revenue"), 2)} AS total_revenue_generated,
       |    ${R("CAST(SUM(shipping_delay_days) AS BIGINT) / COUNT(shipping_delay_days)", 1)} AS avg_ship_delay_days,
       |    COUNT(CASE WHEN is_late_shipment THEN 1 END) AS late_shipments,
       |    COUNT(*) AS total_shipments,
       |    ${R("1e2 * COUNT(CASE WHEN is_late_shipment THEN 1 END) / COUNT(*)", 2)} AS late_shipment_rate,
       |    ${R("1e2 * (1 - COUNT(CASE WHEN is_late_shipment THEN 1 END) * 1e0 / COUNT(*))", 2)} AS on_time_delivery_rate,
       |    COUNT(CASE WHEN return_flag = 'R' THEN 1 END) AS returned_items,
       |    ${R("1e2 * COUNT(CASE WHEN return_flag = 'R' THEN 1 END) / COUNT(*)", 2)} AS return_rate_pct
       |  FROM od GROUP BY supplier_key),
       |composite AS (
       |  SELECT scm.*, sdm.orders_fulfilled, sdm.total_qty_shipped,
       |    sdm.total_revenue_generated, sdm.avg_ship_delay_days, sdm.late_shipments,
       |    sdm.total_shipments, sdm.late_shipment_rate, sdm.on_time_delivery_rate,
       |    sdm.returned_items, sdm.return_rate_pct,
       |    ${R("COALESCE(sdm.on_time_delivery_rate, 5e1) * 4e-1" +
            " + LEAST(scm.cheapest_pct, 1e2) * 3e-1" +
            " + CAST(LEAST(scm.distinct_part_types * 5, 100) AS DOUBLE) * 2e-1" +
            " + (1e2 - COALESCE(sdm.return_rate_pct, 5e1)) * 1e-1", 2)} AS performance_score
       |  FROM scm LEFT JOIN sdm ON scm.supplier_key = sdm.supplier_key)
       |SELECT *,
       |  CASE
       |    WHEN performance_score >= 80 THEN 'Tier 1 - Strategic'
       |    WHEN performance_score >= 60 THEN 'Tier 2 - Preferred'
       |    WHEN performance_score >= 40 THEN 'Tier 3 - Approved'
       |    ELSE 'Tier 4 - Under Review'
       |  END AS supplier_tier,
       |  CAST(RANK() OVER (PARTITION BY supplier_region
       |       ORDER BY performance_score DESC) AS INTEGER) AS rank_in_region,
       |  CAST(RANK() OVER (ORDER BY performance_score DESC) AS INTEGER) AS overall_rank
       |FROM composite
       |ORDER BY supplier_key""".stripMargin

  val goldMonthlySalesTrends: String = {
    // twin of Gold's integer-cents window device: total_revenue is 2-decimal
    // money, floor(d·100+0.5) recovers the exact cent count from the shared
    // double, and the moving averages / YTD run on BIGINT cents — no
    // double→decimal cast whose sub-cent digits differ across engines
    val cents = "CAST(floor(total_revenue * 100 + 0.5) AS BIGINT)"
    def mavg(nPrev: Int): String = {
      val w = s"ORDER BY order_year, order_month ROWS BETWEEN $nPrev PRECEDING AND CURRENT ROW"
      s"CAST((2 * SUM($cents) OVER ($w) + COUNT(*) OVER ($w)) " +
        s"// (2 * COUNT(*) OVER ($w)) AS DOUBLE) / 100"
    }
    s"""WITH $silverCtes,
       |base AS (
       |  SELECT order_year, order_month, order_quarter,
       |    COUNT(DISTINCT order_key) AS total_orders,
       |    COUNT(*) AS total_line_items,
       |    ${DS("quantity")} AS total_quantity,
       |    ${R(DS("net_revenue"), 2)} AS total_revenue,
       |    ${R(DS("total_charge"), 2)} AS total_revenue_with_tax,
       |    ${R(s"${DS("net_revenue")} / COUNT(*)", 2)} AS avg_line_revenue,
       |    ${R(s"${DS("discount_pct")} / COUNT(*)", 4)} AS avg_discount_rate,
       |    COUNT(DISTINCT customer_key) AS unique_customers,
       |    COUNT(DISTINCT supplier_key) AS unique_suppliers,
       |    COUNT(DISTINCT part_key) AS unique_products,
       |    COUNT(CASE WHEN is_late_shipment THEN 1 END) AS late_shipments,
       |    COUNT(CASE WHEN return_flag = 'R' THEN 1 END) AS returns,
       |    ${R("CAST(SUM(shipping_delay_days) AS BIGINT) / COUNT(*)", 1)} AS avg_ship_delay
       |  FROM od GROUP BY order_year, order_month, order_quarter),
       |trends AS (
       |  SELECT *,
       |    LAG(total_revenue) OVER (ORDER BY order_year, order_month) AS prev_month_revenue,
       |    ${R("(total_revenue - LAG(total_revenue) OVER (ORDER BY order_year, order_month)) / NULLIF(LAG(total_revenue) OVER (ORDER BY order_year, order_month), 0) * 100", 2)}
       |      AS mom_revenue_growth_pct,
       |    LAG(total_revenue, 12) OVER (ORDER BY order_year, order_month) AS same_month_prev_year_revenue,
       |    ${R("(total_revenue - LAG(total_revenue, 12) OVER (ORDER BY order_year, order_month)) / NULLIF(LAG(total_revenue, 12) OVER (ORDER BY order_year, order_month), 0) * 100", 2)}
       |      AS yoy_revenue_growth_pct,
       |    ${mavg(2)} AS revenue_3mo_moving_avg,
       |    ${mavg(5)} AS revenue_6mo_moving_avg,
       |    ${mavg(11)} AS revenue_12mo_moving_avg,
       |    CAST(SUM($cents) OVER (PARTITION BY order_year ORDER BY order_month
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
       |      AS ytd_cumulative_revenue,
       |    CAST(RANK() OVER (PARTITION BY order_year ORDER BY total_revenue DESC) AS INTEGER)
       |      AS revenue_rank_in_year,
       |    ${R("total_revenue / NULLIF(total_orders, 0)", 2)} AS avg_order_value,
       |    ${R("total_revenue / NULLIF(unique_customers, 0)", 2)} AS revenue_per_customer
       |  FROM base)
       |SELECT *,
       |  ${R("total_revenue / NULLIF(revenue_12mo_moving_avg, 0)", 4)} AS seasonal_index,
       |  ${R("mom_revenue_growth_pct - LAG(mom_revenue_growth_pct) OVER (ORDER BY order_year, order_month)", 2)}
       |    AS growth_acceleration
       |FROM trends
       |ORDER BY order_year, order_month""".stripMargin
  }

  // ------------------------------------------------------- wrapped (ordered)
  val silverOrderDetails: String =
    s"WITH $bronzeCtes\nSELECT * FROM ($silverOrderDetailsBody)\nORDER BY order_key, line_number"

  val silverCustomerOrders: String =
    s"WITH $bronzeCtes,\n$customerOrdersCtes\n$silverCustomerOrdersBody\nORDER BY customer_key"

  val silverSupplierParts: String =
    s"WITH $bronzeCtes,\n$supplierPartsCtes\nSELECT * FROM ($silverSupplierPartsBody)\nORDER BY supplier_key, part_key"

  // ---------------------------------------------------------------- quality
  /** Row-count > 0 gate (reference: src/tests/data_quality_checks.py:27-44). */
  val qualityRowCounts: String = {
    val tables = Seq(
      "orders" -> "orders_b", "customer" -> "customer_b", "lineitem" -> "lineitem_b",
      "supplier" -> "supplier_b", "part" -> "part_b", "nation" -> "nation_b",
      "region" -> "region_b", "order_details" -> "od", "customer_orders" -> "co",
      "supplier_parts" -> "sp")
    val arms = tables.map { case (name, cte) =>
      s"""SELECT '$name' AS table_name, COUNT(*) AS row_count,
         |  CASE WHEN COUNT(*) > 0 THEN 'PASS' ELSE 'FAIL' END AS status FROM $cte""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $silverCtes\n$arms\nORDER BY table_name"
  }

  /** Null checks (reference: src/tests/data_quality_checks.py:53-64). */
  val qualityNullChecks: String = {
    val checks = Seq(
      ("order_details.customer_key", "od", "customer_key"),
      ("order_details.order_date", "od", "order_date"),
      ("customer_orders.customer_segment", "co", "customer_segment"),
      ("supplier_parts.supply_cost", "sp", "supply_cost"),
      ("orders.o_orderdate", "orders_b", "o_orderdate"))
    val arms = checks.map { case (name, cte, c) =>
      s"""SELECT '$name' AS check_name,
         |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS null_count,
         |  CASE WHEN COUNT(CASE WHEN $c IS NULL THEN 1 END) = 0 THEN 'PASS' ELSE 'FAIL' END AS status
         |FROM $cte""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $silverCtes\n$arms\nORDER BY check_name"
  }

  /** Referential-integrity orphan probes via anti-join
    * (reference: src/tests/data_quality_checks.py:73-93). */
  val qualityReferentialIntegrity: String = {
    val arms = Seq(
      ("orders->customer", "orders_b l", "customer_b r", "l.o_custkey = r.c_custkey"),
      ("lineitem->orders", "lineitem_b l", "orders_b r", "l.l_orderkey = r.o_orderkey"),
      ("lineitem->part", "lineitem_b l", "part_b r", "l.l_partkey = r.p_partkey"),
      ("lineitem->supplier", "lineitem_b l", "supplier_b r", "l.l_suppkey = r.s_suppkey")
    ).map { case (name, lt, rt, cond) =>
      s"""SELECT '$name' AS check_name, COUNT(*) AS orphan_count,
         |  CASE WHEN COUNT(*) = 0 THEN 'PASS' ELSE 'FAIL' END AS status
         |FROM $lt ANTI JOIN $rt ON $cond""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $bronzeCtes\n$arms\nORDER BY check_name"
  }

  /** Business-rule range checks
    * (reference: src/tests/data_quality_checks.py:102-114). */
  val qualityBusinessRules: String = {
    val arms = Seq(
      ("od_net_revenue_non_negative", "od", "net_revenue < 0"),
      ("od_quantity_positive", "od", "quantity <= 0"),
      ("od_discount_range", "od", "discount_pct < 0 OR discount_pct > 1"),
      ("od_tax_range", "od", "tax_pct < 0 OR tax_pct > 1"),
      ("co_fulfillment_rate_range", "co", "fulfillment_rate < 0 OR fulfillment_rate > 100"),
      ("co_segment_not_null", "co", "customer_segment IS NULL")
    ).map { case (name, cte, viol) =>
      s"""SELECT '$name' AS rule_name,
         |  COUNT(CASE WHEN $viol THEN 1 END) AS violation_count,
         |  CASE WHEN COUNT(CASE WHEN $viol THEN 1 END) = 0 THEN 'PASS' ELSE 'FAIL' END AS status
         |FROM $cte""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $silverCtes\n$arms\nORDER BY rule_name"
  }

  /** Freshness vs the pinned reference instant
    * (reference: src/tests/data_quality_checks.py:123-140): hours since
    * max(_ingested_at)/max(_refined_at) on bronze.orders + both silver tables,
    * rounded to 1 decimal, PASS under 25 h; plus the events arm on the event
    * stream's own data clock. Pinned "now" = 2002-01-01 00:00:00 UTC. */
  val qualityFreshness: String = {
    def arm(name: String, cte: String, maxTs: String, epochSecs: String): String = {
      val hrs = R(s"(1009843200 - ($epochSecs)) / 3600e0", 1)
      s"""SELECT 'Freshness' AS check_type, '$name' AS table_name,
         |  $maxTs AS last_refresh, $hrs AS hours_since,
         |  CASE WHEN $hrs <= 25 THEN 'PASS' ELSE 'STALE' END AS status
         |FROM $cte""".stripMargin
    }
    def lit(c: String) = (s"MAX($c)", s"epoch_us(MAX($c)) // 1000000")
    val (bts, bes) = lit("_ingested_at")
    val (rts, res) = lit("_refined_at")
    val arms = Seq(
      arm("bronze.orders", "orders_b", bts, bes),
      arm("silver.order_details", "od", rts, res),
      arm("silver.customer_orders", "co", rts, res),
      // events.ts is TIMESTAMP_NS in the fixture: route through epoch_us like
      // every other events oracle so the value matches Spark's µs truncation
      arm("events", "events", "make_timestamp(MAX(epoch_us(ts)))",
        "MAX(epoch_us(ts)) // 1000000")
    ).mkString("\nUNION ALL\n")
    s"WITH $silverCtes\n$arms\nORDER BY table_name"
  }

  // ----------------------------------------------------------------- bundle
  val all: Map[String, String] = Map(
    "bronze_orders" -> s"$bronzeOrders ORDER BY o_orderkey",
    "bronze_lineitem" -> s"SELECT * FROM ($bronzeLineitem) ORDER BY l_orderkey, l_linenumber",
    "bronze_customer" -> s"$bronzeCustomer ORDER BY c_custkey",
    "bronze_supplier" -> s"$bronzeSupplier ORDER BY s_suppkey",
    "bronze_part" -> s"$bronzePart ORDER BY p_partkey",
    "bronze_nation" -> s"$bronzeNation ORDER BY n_nationkey",
    "bronze_region" -> s"$bronzeRegion ORDER BY r_regionkey",
    "silver_order_details" -> silverOrderDetails,
    "silver_customer_orders" -> silverCustomerOrders,
    "silver_supplier_parts" -> silverSupplierParts,
    "gold_revenue_by_region" -> goldRevenueByRegion,
    "gold_customer_lifetime_value" -> goldCustomerLifetimeValue,
    "gold_supplier_performance" -> goldSupplierPerformance,
    "gold_monthly_sales_trends" -> goldMonthlySalesTrends,
    "quality_row_counts" -> qualityRowCounts,
    "quality_null_checks" -> qualityNullChecks,
    "quality_referential_integrity" -> qualityReferentialIntegrity,
    "quality_business_rules" -> qualityBusinessRules,
    "quality_freshness" -> qualityFreshness
  )
}
