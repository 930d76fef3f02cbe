"""DuckDB oracle SQL paired with pipelines/relational.py (and the text/
similarity queries). Table names are the driver's pre-registered views.

Cross-system exactness rules (mirrored in the Ray code):
- money → FLOOR(x * 100) cents as BIGINT (floor of the *same* IEEE
  double product is bit-identical in DuckDB and numpy; ROUND is not —
  half-even vs half-away);
- SUM(BIGINT) is HUGEINT in DuckDB → always CAST back to BIGINT;
- the one float output (PageRank) is ROUND(r, 9) on values ~1e-4 with
  ~1e-16 relative arithmetic noise — 7 orders of magnitude of margin.
"""

from __future__ import annotations

SUPP_OFFSET = 10_000_000
ORDER_OFFSET = 100_000_000

_PARTSUPP_EDGES = f"""e AS (
    SELECT DISTINCT l_partkey AS src, l_suppkey + {SUPP_OFFSET} AS dst FROM lineitem
),
v AS (SELECT src AS vid FROM e UNION SELECT dst AS vid FROM e)"""


DEGREE_PARTSUPP = f"""WITH {_PARTSUPP_EDGES},
o AS (SELECT src AS vid, COUNT(*) AS n FROM e GROUP BY 1),
i AS (SELECT dst AS vid, COUNT(*) AS n FROM e GROUP BY 1)
SELECT v.vid AS vid, COALESCE(o.n, 0) AS out_deg, COALESCE(i.n, 0) AS in_deg
FROM v LEFT JOIN o ON v.vid = o.vid LEFT JOIN i ON v.vid = i.vid"""


def pagerank_partsupp_sql(k: int = 4, damping: float = 0.85) -> str:
    """k unrolled power-iteration steps with uniform dangling
    redistribution — the exact engine/oracle recurrence."""
    parts = [
        f"WITH {_PARTSUPP_EDGES},",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM v),",
        "od AS (SELECT src AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY 1),",
        "r0 AS (SELECT vid, 1.0 / (SELECT c FROM nn) AS r FROM v)",
    ]
    for i in range(1, k + 1):
        p = f"r{i-1}"
        parts.append(
            f""",
m{i} AS (
  SELECT e.dst AS vid, SUM({p}.r / od.d) AS s
  FROM e JOIN {p} ON e.src = {p}.vid JOIN od ON e.src = od.vid
  GROUP BY e.dst
),
dang{i} AS (
  SELECT COALESCE(SUM({p}.r), 0) AS dm
  FROM {p} LEFT JOIN od ON {p}.vid = od.vid WHERE od.vid IS NULL
),
r{i} AS (
  SELECT v.vid,
         (1 - {damping}) / (SELECT c FROM nn)
         + {damping} * (COALESCE(m{i}.s, 0) + (SELECT dm FROM dang{i}) / (SELECT c FROM nn)) AS r
  FROM v LEFT JOIN m{i} ON v.vid = m{i}.vid
)"""
        )
    parts.append(f"\nSELECT vid, ROUND(r, 9) AS rank_r9 FROM r{k}")
    return "".join(parts)


CC_CUSTOMER_ORDERS = f"""WITH e AS (
    SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst FROM orders
)
SELECT dst AS vid, src AS component FROM e
UNION ALL
SELECT DISTINCT src AS vid, src AS component FROM e"""


TRIANGLES_COOCC = """WITH pr AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS (SELECT u, v FROM pr UNION ALL SELECT v AS u, u AS v FROM pr),
verts AS (SELECT DISTINCT u AS vid FROM und),
t AS (
  SELECT e1.u AS vid, COUNT(*) AS c2
  FROM und e1
  JOIN und e2 ON e1.v = e2.u
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
  GROUP BY e1.u
)
SELECT verts.vid AS vid, CAST(COALESCE(t.c2, 0) // 2 AS BIGINT) AS triangles
FROM verts LEFT JOIN t ON verts.vid = t.vid"""


PRICING_SUMMARY = """SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus"""


TOP_CUSTOMERS = """SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY o_custkey
ORDER BY n_orders DESC, custkey ASC
LIMIT 10"""


EVENTS_HOURLY = """SELECT event_type, date_trunc('hour', ts) AS hour,
  COUNT(*) AS n,
  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY event_type, date_trunc('hour', ts)"""


DOC_STATS = """SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_text,
  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha
FROM documents"""


LANG_DISTRIBUTION = """SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang"""


TOP_DOCS_BY_LENGTH = """SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 10"""


EXACT_DEDUP_DOCS = """SELECT MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text"""


KNN_VEC0 = """WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], (SELECT e FROM q)), 5) AS cosine_r5
FROM embeddings e
WHERE e.vec_id <> 0
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], (SELECT e FROM q)) DESC, e.vec_id ASC
LIMIT 5"""


EMBEDDING_NORMS = """SELECT vec_id,
  ROUND(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 5) AS norm_r5
FROM embeddings"""


_COOCC_UND = """pr AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS (SELECT u, v FROM pr UNION ALL SELECT v AS u, u AS v FROM pr)"""


WALK2_COOCC = f"""WITH {_COOCC_UND},
deg AS (SELECT u AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM und GROUP BY 1),
verts AS (SELECT DISTINCT u AS vid FROM und),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM verts),
r0 AS (SELECT vid, 1.0 / (SELECT c FROM nn) AS r FROM verts),
r1 AS (
  SELECT und.v AS vid, SUM(r0.r / deg.d) AS r
  FROM und JOIN r0 ON und.u = r0.vid JOIN deg ON und.u = deg.vid
  GROUP BY und.v
),
r2 AS (
  SELECT und.v AS vid, SUM(r1.r / deg.d) AS r
  FROM und JOIN r1 ON und.u = r1.vid JOIN deg ON und.u = deg.vid
  GROUP BY und.v
)
SELECT verts.vid AS vid, ROUND(COALESCE(r2.r, 0), 9) AS mass_r9
FROM verts LEFT JOIN r2 ON verts.vid = r2.vid"""


DOC_LEN_STATS_BY_LANG = """SELECT lang, COUNT(*) AS n,
  ROUND(AVG(n_chars), 6) AS mean_r6,
  ROUND(stddev_pop(n_chars), 6) AS std_r6
FROM documents GROUP BY lang"""


def heat_smooth_coocc_sql(t: float = 0.01, steps: int = 4) -> str:
    """Unrolled explicit-Euler heat recurrence x ← x − dt·(deg·x − Σnbr x)."""
    dt = t / steps
    parts = [
        f"WITH {_COOCC_UND},",
        "deg AS (SELECT u AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM und GROUP BY 1),",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        """x0 AS (SELECT verts.vid, CAST(p.p_retailprice AS DOUBLE) AS x
       FROM verts JOIN part p ON p.p_partkey = verts.vid)""",
    ]
    for i in range(1, steps + 1):
        prev = f"x{i-1}"
        parts.append(
            f""",
nb{i} AS (SELECT und.v AS vid, SUM({prev}.x) AS s
          FROM und JOIN {prev} ON und.u = {prev}.vid GROUP BY und.v),
x{i} AS (SELECT v.vid, v.x - {dt!r} * (deg.d * v.x - COALESCE(nb{i}.s, 0)) AS x
         FROM {prev} v JOIN deg ON v.vid = deg.vid
         LEFT JOIN nb{i} ON nb{i}.vid = v.vid)"""
        )
    parts.append(f"\nSELECT vid, ROUND(x, 4) AS value_r4 FROM x{steps}")
    return "".join(parts)


EVENTS_PREV_GAP = """SELECT event_id,
  CAST(COALESCE(date_diff('microsecond',
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), -1) AS BIGINT) AS gap_us
FROM events"""


EVENTS_SESSIONS = """WITH g AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('microsecond', lag(ts) OVER w, ts) > 3600000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM s GROUP BY user_id, session_id"""


EVENTS_ASOF_LAST_ORDER = """SELECT e.event_id,
  COALESCE(o.o_orderdate, TIMESTAMP '1970-01-01') AS last_order_ts
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"""


TOP3_ORDERS_PER_SEGMENT = """WITH j AS (
  SELECT c.c_mktsegment AS segment, o.o_orderkey,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY FLOOR(o.o_totalprice * 100) DESC, o.o_orderkey ASC) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT segment, o_orderkey, cents FROM j WHERE rn <= 3"""


CUSTOMERS_WITHOUT_ORDERS = """SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""


def avg_rank_small_parts_sql(k: int = 4, damping: float = 0.85, max_size: int = 10) -> str:
    """get_average_projection parity: AVG of the unrolled-PageRank rank
    over the part vertices with p_size <= max_size."""
    base = pagerank_partsupp_sql(k, damping)
    final = f"\nSELECT vid, ROUND(r, 9) AS rank_r9 FROM r{k}"
    assert base.endswith(final)
    return base[: -len(final)] + (
        f"\nSELECT ROUND(AVG(r{k}.r), 9) AS avg_rank_r9,"
        f" CAST(COUNT(*) AS BIGINT) AS n_vertices"
        f" FROM r{k} JOIN part ON r{k}.vid = part.p_partkey"
        f" WHERE part.p_size <= {max_size}"
    )


DOCLEN_PERCENTILES = """SELECT CAST(0.25 AS DOUBLE) AS q, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS value FROM documents
UNION ALL SELECT CAST(0.5 AS DOUBLE), CAST(quantile_disc(n_chars, 0.5) AS BIGINT) FROM documents
UNION ALL SELECT CAST(0.9 AS DOUBLE), CAST(quantile_disc(n_chars, 0.9) AS BIGINT) FROM documents
UNION ALL SELECT CAST(0.99 AS DOUBLE), CAST(quantile_disc(n_chars, 0.99) AS BIGINT) FROM documents"""


CLUSTERING_COEFF_COOCC = """WITH pr AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS (SELECT u, v FROM pr UNION ALL SELECT v AS u, u AS v FROM pr),
verts AS (SELECT DISTINCT u AS vid FROM und),
t AS (
  SELECT e1.u AS vid, COUNT(*) AS c2
  FROM und e1
  JOIN und e2 ON e1.v = e2.u
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
  GROUP BY e1.u
),
d AS (SELECT u AS vid, COUNT(*) AS deg FROM und GROUP BY u)
SELECT verts.vid AS vid,
  CAST(COALESCE(t.c2, 0) // 2 AS BIGINT) AS triangles,
  CAST(d.deg AS BIGINT) AS deg,
  CAST(CASE WHEN d.deg >= 2
       THEN FLOOR(2000000.0 * CAST(COALESCE(t.c2, 0) // 2 AS DOUBLE) / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0)))
       ELSE 0 END AS BIGINT) AS cc_ppm
FROM verts LEFT JOIN t ON verts.vid = t.vid JOIN d ON verts.vid = d.vid"""
