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

# --- lexical leg (documents table) ---------------------------------------

_TOKS_CTE = """
toks AS (
  SELECT doc_id, t.term
  FROM documents,
       unnest(string_split_regex(lower(text), '[^a-z0-9_؀-ۿ]+')) AS t(term)
  WHERE length(t.term) >= 2
)
"""

oracle("term_doc_frequency", f"""
WITH {_TOKS_CTE},
postings AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2)
SELECT term, count(*) AS df, sum(tf)::BIGINT AS total_tf
FROM postings
GROUP BY term
ORDER BY df DESC, total_tf DESC, term ASC
LIMIT 20
""")

oracle("phrase_match", """
SELECT doc_id,
       strpos(lower(text), 'window data') AS pos,
       substr(text, greatest(1, strpos(lower(text), 'window data') - 30), 60) AS snip
FROM documents
WHERE strpos(lower(text), 'window data') > 0
""")

_COV_TERMS = ("data", "query", "stream", "window", "batch")
_COV_EXPR = " + ".join(
    f"(CASE WHEN strpos(lower(text), '{t}') > 0 THEN 1 ELSE 0 END)" for t in _COV_TERMS
)
oracle("coverage_scores", f"""
SELECT doc_id,
       round(({_COV_EXPR})::DOUBLE / {len(_COV_TERMS)}, 6) AS coverage
FROM documents
WHERE round(({_COV_EXPR})::DOUBLE / {len(_COV_TERMS)}, 6) >= 0.6
""")

oracle("token_stats", """
SELECT lang,
       count(*) AS doc_count,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 4) AS avg_tokens
FROM (
  SELECT lang,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9_؀-ۿ]+'),
                         x -> length(x) >= 2)) AS n_tokens
  FROM documents
)
GROUP BY lang
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


oracle("event_attribution", """
WITH ev AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
),
errors AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error'),
clicks AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'click')
  WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts,
       c.event_id AS click_event_id, c.ts AS click_ts,
       round(date_diff('microsecond', c.ts, e.ts) / 1000000.0, 6)
         AS seconds_since_click
FROM errors e ASOF JOIN clicks c ON e.user_id = c.user_id AND c.ts <= e.ts
""")

oracle("salted_user_rollup", """
SELECT user_id,
       count(*)             AS event_count,
       round(sum(value), 4) AS sum_value,
       min(value)           AS min_value,
       max(value)           AS max_value
FROM events
GROUP BY user_id
""")

oracle("salted_segment_revenue", """
SELECT c.c_mktsegment,
       count(*)                    AS order_count,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""")

oracle("event_props_rollup", """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       count(*)             AS event_count,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1
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
