"""DuckDB oracle SQL — one ANSI-SQL statement per `queries()` entry.

The driver registers the parquet files as views named
``region nation customer supplier part orders lineitem events documents
embeddings`` and compares row-count + schema + order-insensitive value hash
against the Spark result. Every computed column is aliased identically to the
Spark plan, and every float aggregate is rounded the same way on both sides.
"""

ORACLES: dict[str, str] = {}


def oracle(name: str, sql: str) -> None:
    ORACLES[name] = sql


oracle("pricing_summary", """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                          AS sum_qty,
  round(sum(l_extendedprice), 2)                                     AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  round(avg(l_quantity), 4)                                          AS avg_qty,
  round(avg(l_extendedprice), 4)                                     AS avg_price,
  round(avg(l_discount), 4)                                          AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")

oracle("top_orders", """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""")

oracle("revenue_by_region", """
SELECT
  r_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*)                                          AS line_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
""")

oracle("big_spender_customers", """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0
)
""")

oracle("customers_without_orders", """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0
)
""")

oracle("segment_stats", """
SELECT
  c_mktsegment,
  count(*)                      AS customer_count,
  count(DISTINCT c_nationkey)   AS nation_count,
  round(avg(c_acctbal), 4)      AS avg_acctbal
FROM customer
GROUP BY c_mktsegment
""")

oracle("first_event_per_user", """
SELECT user_id, event_id, ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
)
WHERE rn = 1
""")

oracle("daily_event_rollup", """
SELECT
  CAST(ts AS DATE)              AS day,
  event_type,
  count(*)                      AS event_count,
  round(sum(value), 4)          AS sum_value,
  count(DISTINCT user_id)       AS unique_users
FROM events
GROUP BY 1, 2
""")
