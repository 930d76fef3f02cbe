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


def spam_mass_partsupp_sql(
    k: int = 4, damping: float = 0.85, seeds=(1, 2, 3, 4, 5)
) -> str:
    """TrustRank relative spam mass: both the global and the seeded
    PageRank recurrences unrolled k steps over the part→supplier edge
    table, joined per vertex — sm = (pr − tr)/pr."""
    seed_list = ", ".join(str(s) for s in seeds)
    tw = 1.0 / len(seeds)
    edges_mat = _PARTSUPP_EDGES.replace("e AS (", "e AS MATERIALIZED (", 1)
    parts = [
        f"WITH {edges_mat},",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM v),",
        "od AS MATERIALIZED (SELECT src AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY 1),",
        f"tp AS MATERIALIZED (SELECT vid, CASE WHEN vid IN ({seed_list}) THEN {tw!r} ELSE 0.0 END AS t FROM v),",
        "r0 AS (SELECT vid, 1.0 / (SELECT c FROM nn) AS r FROM v),",
        "t0 AS (SELECT vid, t AS r FROM tp)",
    ]
    for i in range(1, k + 1):
        p, q = f"r{i-1}", f"t{i-1}"
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
r{i} AS MATERIALIZED (
  SELECT v.vid,
         (1 - {damping}) / (SELECT c FROM nn)
         + {damping} * (COALESCE(m{i}.s, 0) + (SELECT dm FROM dang{i}) / (SELECT c FROM nn)) AS r
  FROM v LEFT JOIN m{i} ON v.vid = m{i}.vid
),
tm{i} AS (
  SELECT e.dst AS vid, SUM({q}.r / od.d) AS s
  FROM e JOIN {q} ON e.src = {q}.vid JOIN od ON e.src = od.vid
  GROUP BY e.dst
),
tdang{i} AS (
  SELECT COALESCE(SUM({q}.r), 0) AS dm
  FROM {q} LEFT JOIN od ON {q}.vid = od.vid WHERE od.vid IS NULL
),
t{i} AS MATERIALIZED (
  SELECT tp.vid,
         (1 - {damping}) * tp.t
         + {damping} * (COALESCE(tm{i}.s, 0) + tp.t * (SELECT dm FROM tdang{i})) AS r
  FROM tp LEFT JOIN tm{i} ON tp.vid = tm{i}.vid
)"""
        )
    parts.append(
        f"""
SELECT r.vid, ROUND(r.r, 9) AS rank_r9, ROUND(t.r, 9) AS trust_r9,
  ROUND((r.r - t.r) / r.r, 6) AS spam_mass_r6
FROM r{k} r JOIN t{k} t ON r.vid = t.vid"""
    )
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


EVENTS_PROPS_STATS = """WITH x AS (
  SELECT event_type,
    CAST(COALESCE(NULLIF(regexp_extract(props, '"k":\\s*(-?\\d+)', 1), ''), '0') AS BIGINT) AS k
  FROM events
)
SELECT event_type, COUNT(*)::BIGINT AS n, SUM(k)::BIGINT AS sum_k,
  MIN(k)::BIGINT AS min_k, MAX(k)::BIGINT AS max_k
FROM x GROUP BY event_type"""


EVENTS_COHORT_RETENTION = """WITH w AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
),
f AS (SELECT user_id, MIN(wk) AS cw FROM w GROUP BY user_id)
SELECT f.cw::BIGINT AS cohort_week, (w.wk - f.cw)::BIGINT AS week_offset,
  COUNT(DISTINCT w.user_id)::BIGINT AS n_users
FROM w JOIN f USING (user_id) GROUP BY 1, 2"""


EVENTS_FUNNEL = """WITH fs AS (
  SELECT user_id, MIN(ts) AS sts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
cv AS (
  SELECT fs.user_id, fs.sts,
    COALESCE(MAX(CASE WHEN e.ts > fs.sts
                       AND e.ts <= fs.sts + INTERVAL 24 HOUR
                      THEN 1 ELSE 0 END), 0) AS c
  FROM fs LEFT JOIN events e
    ON e.user_id = fs.user_id AND e.event_type = 'purchase'
  GROUP BY fs.user_id, fs.sts
)
SELECT EXTRACT(hour FROM sts)::BIGINT AS hour,
  COUNT(*)::BIGINT AS n_signups, SUM(c)::BIGINT AS n_converted,
  ROUND(SUM(c)::DOUBLE / COUNT(*)::DOUBLE, 6) AS conv_rate_r6
FROM cv GROUP BY 1"""


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


EVENT_TRANSITIONS = """WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
tr AS (
  SELECT prev AS src_type, event_type AS dst_type, count(*)::BIGINT AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT src_type, SUM(n)::BIGINT AS t FROM tr GROUP BY 1)
SELECT tr.src_type, tr.dst_type, tr.n,
  CAST(tr.n AS DOUBLE) / CAST(tot.t AS DOUBLE) AS prob
FROM tr JOIN tot USING (src_type)"""


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


# --------------------------------------------------------------------------
# round-2 oracles: text heuristics, sketches, seeded walks
# --------------------------------------------------------------------------

_U64 = 18446744073709551616  # 2^64
_SM_C1 = 0x9E3779B97F4A7C15
_SM_C2 = 0xBF58476D1CE4E5B9
_SM_C3 = 0x94D049BB133111EB


def u64_to_i64(expr: str) -> str:
    """Signed reinterpretation of a UBIGINT expression (numpy
    ``.view(int64)`` equivalent) so outputs stay BIGINT-comparable."""
    return (
        f"CAST(CAST({expr} AS HUGEINT) - CASE WHEN {expr} >= 9223372036854775808::UBIGINT"
        f" THEN {_U64}::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"
    )


def _mulmod64(expr: str, const: int) -> str:
    """(expr * const) mod 2^64 without INT128 overflow: split the
    constant into 32-bit halves — a·C = a·C_lo + (a·C_hi mod 2^32)·2^32
    (mod 2^64); every intermediate stays below 2^97 < HUGEINT max."""
    c_hi, c_lo = const >> 32, const & 0xFFFFFFFF
    a = f"CAST({expr} AS HUGEINT)"
    return (
        f"CAST((({a} * {c_lo}) % {_U64}"
        f" + (({a} * {c_hi}) % {1 << 32}) * {1 << 32}) % {_U64} AS UBIGINT)"
    )


def sm64_stages(cte_in: str, col_in: str, prefix: str, carry: list[str]) -> tuple[str, str, str]:
    """CTE chain computing splitmix64 of UBIGINT column ``col_in``.

    Returns (sql_fragment, final_cte_name, hash_col_name); ``carry``
    columns are passed through every stage."""
    ks = ", ".join(carry) + (", " if carry else "")
    a, b, c, d, e, f = (f"{prefix}_s{i}" for i in range(6))
    frag = f""",
{a} AS (SELECT {ks}CAST((CAST({col_in} AS HUGEINT) + {_SM_C1}) % {_U64} AS UBIGINT) AS h FROM {cte_in}),
{b} AS (SELECT {ks}xor(h, h >> 30) AS h FROM {a}),
{c} AS (SELECT {ks}{_mulmod64('h', _SM_C2)} AS h FROM {b}),
{d} AS (SELECT {ks}xor(h, h >> 27) AS h FROM {c}),
{e} AS (SELECT {ks}{_mulmod64('h', _SM_C3)} AS h FROM {d}),
{f} AS (SELECT {ks}xor(h, h >> 31) AS h FROM {e})"""
    return frag, f, "h"


def sm64_py(x: int) -> int:
    """Python splitmix64 (for inlining constants into generated SQL)."""
    M = _U64 - 1
    x = (x + _SM_C1) & M
    x ^= x >> 30
    x = (x * _SM_C2) & M
    x ^= x >> 27
    x = (x * _SM_C3) & M
    x ^= x >> 31
    return x


_STOPLIST = (
    "'the','and','of','to','a','in','is','that','for','it','with','as',"
    "'der','die','und','das','ist','nicht','ein','mit','den','von','zu','für',"
    "'le','la','et','les','des','est','un','une','du','que','pour','dans'"
)

_QUALITY_RATIOS = f"""c AS (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tokens,
    CAST(len(regexp_extract_all(text, '\\S')) AS DOUBLE) AS tok_chars,
    CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
         t -> lower(t) IN ({_STOPLIST}))) AS DOUBLE) AS stop_cnt,
    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha_cnt,
    CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS digit_cnt,
    CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct_cnt,
    CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS upper_cnt
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
    (CASE WHEN n_tokens > 0 THEN tok_chars ELSE 0 END) / GREATEST(n_tokens, 1.0) AS mean_tok_len,
    alpha_cnt / GREATEST(n_chars, 1.0) AS alpha_ratio,
    digit_cnt / GREATEST(n_chars, 1.0) AS digit_ratio,
    punct_cnt / GREATEST(n_chars, 1.0) AS punct_ratio,
    upper_cnt / GREATEST(n_chars, 1.0) AS upper_ratio,
    stop_cnt / GREATEST(n_tokens, 1.0) AS stop_ratio,
    LEAST(GREATEST(n_chars / 500.0, 0.0), 1.0) AS length_score
  FROM c
),
q AS (
  SELECT doc_id, n_tokens, mean_tok_len, alpha_ratio, digit_ratio, punct_ratio,
         upper_ratio, stop_ratio,
         (((0.35 * length_score) + (0.25 * alpha_ratio))
          + (0.25 * LEAST(GREATEST(stop_ratio * 4.0, 0.0), 1.0)))
          + (0.15 * (1.0 - LEAST(GREATEST(punct_ratio * 4.0, 0.0), 1.0))) AS quality
  FROM r
)"""

QUALITY_SCORES = f"""WITH {_QUALITY_RATIOS}
SELECT doc_id,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(FLOOR(mean_tok_len * 1000000.0) AS BIGINT) AS mean_tok_len_ppm,
  CAST(FLOOR(alpha_ratio * 1000000.0) AS BIGINT) AS alpha_ppm,
  CAST(FLOOR(digit_ratio * 1000000.0) AS BIGINT) AS digit_ppm,
  CAST(FLOOR(punct_ratio * 1000000.0) AS BIGINT) AS punct_ppm,
  CAST(FLOOR(upper_ratio * 1000000.0) AS BIGINT) AS upper_ppm,
  CAST(FLOOR(stop_ratio * 1000000.0) AS BIGINT) AS stop_ppm,
  CAST(FLOOR(quality * 1000000.0) AS BIGINT) AS quality_ppm
FROM q"""

QUALITY_ZSCORES = f"""WITH {_QUALITY_RATIOS},
s AS (SELECT AVG(quality) AS m, stddev_pop(quality) AS sd FROM q)
SELECT doc_id,
  ROUND(CASE WHEN s.sd > 0 THEN (q.quality - s.m) / s.sd ELSE 0.0 END, 6) AS quality_z_r6
FROM q, s"""

LANGID = f"""WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-zäöüßéèêàçûî]+') AS ws FROM documents
),
c AS (
  SELECT doc_id,
    len(list_filter(ws, x -> x IN ('the','and','of','to','a','in','is','that','for','it','with','as'))) AS en,
    len(list_filter(ws, x -> x IN ('der','die','und','das','ist','nicht','ein','mit','den','von','zu','für'))) AS de,
    len(list_filter(ws, x -> x IN ('le','la','et','les','des','est','un','une','du','que','pour','dans'))) AS fr
  FROM w
)
SELECT doc_id,
  CASE WHEN en = 0 AND de = 0 AND fr = 0 THEN 'und'
       WHEN en >= de AND en >= fr THEN 'en'
       WHEN de >= fr THEN 'de'
       ELSE 'fr' END AS pred_lang
FROM c"""

def bottomk_sample_sql(k: int = 64, seed: int | None = None) -> str:
    """Bottom-k uniform sample replay: the k smallest
    splitmix64(doc_id ⊕ seed) hashes, emitted as (rk, doc_id)."""
    from ..config import HASH_SEED

    if seed is None:
        seed = HASH_SEED
    frag, cte, hcol = sm64_stages("bk_in", "x", "bk", ["doc_id"])
    return f"""WITH bk_in AS (
  SELECT doc_id, xor(CAST(doc_id AS UBIGINT), {seed}::UBIGINT) AS x FROM documents
){frag}
SELECT ROW_NUMBER() OVER (ORDER BY {hcol}, doc_id)::BIGINT AS rk,
  doc_id::BIGINT AS doc_id
FROM {cte} ORDER BY {hcol}, doc_id LIMIT {k}"""


LANGID_CONFUSION = f"""SELECT d.lang, p.pred_lang, COUNT(*)::BIGINT AS n
FROM documents d JOIN ({LANGID}) p ON d.doc_id = p.doc_id
GROUP BY 1, 2"""


# FNV-1a per token folded over UTF-8 bytes (ASCII fixture: ascii(ch) ==
# byte), then the polynomial rolling hash over the token-hash stream —
# both folds exactly mirror functions/text.py (mod-2^64 wraparound via
# HUGEINT). Output is the signed int64 reinterpretation on both sides.
_FNV_TOKEN = (
    "tok -> list_reduce("
    "list_prepend(14695981039346656037::UBIGINT,"
    " list_transform(string_split(tok, ''), ch -> ascii(ch)::UBIGINT)),"
    " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
    f" % {_U64} AS UBIGINT))"
)

DOC_FINGERPRINTS = f"""WITH fp AS (
  SELECT doc_id, list_reduce(
    list_prepend(14695981039346656037::UBIGINT,
      list_transform(regexp_extract_all(text, '\\S+'), {_FNV_TOKEN})),
    (h, th) -> CAST((CAST(h AS HUGEINT) * 1099511628211 + CAST(th AS HUGEINT)) % {_U64} AS UBIGINT)
  ) AS f
  FROM documents
)
SELECT doc_id, {u64_to_i64('f')} AS fingerprint FROM fp"""


def approx_distinct_users_sql(p: int = 12) -> str:
    """HLL (splitmix64 hash, 2^p registers) re-implemented in SQL —
    register-exact vs functions/sketches.py, including the branchless
    CLZ cascade and the linear-counting small-range correction."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    frag, last, hcol = sm64_stages("u", "x", "sm", ["event_type"])
    # rest = (h << p) | (2^p - 1), computed without shift overflow:
    # (h mod 2^(64-p)) * 2^p + (2^p - 1)
    clz = []
    prev = "z0"
    clz.append(
        f"z0 AS (SELECT event_type, idx, ((h % {1 << (64 - p)}::UBIGINT) * {m}::UBIGINT"
        f" + {m - 1}::UBIGINT) AS probe, 0 AS rank FROM hh)"
    )
    for shift in (32, 16, 8, 4, 2, 1):
        nxt = f"z{shift}"
        lim = 1 << (64 - shift)
        clz.append(
            f"{nxt} AS (SELECT event_type, idx,"
            f" CASE WHEN probe < {lim}::UBIGINT THEN probe * {1 << shift}::UBIGINT ELSE probe END AS probe,"
            f" rank + CASE WHEN probe < {lim}::UBIGINT THEN {shift} ELSE 0 END AS rank FROM {prev})"
        )
        prev = nxt
    return f"""WITH u AS (
  SELECT DISTINCT event_type, CAST(user_id AS UBIGINT) AS x FROM events
){frag},
hh AS (SELECT event_type, (h >> {64 - p}) AS idx, h FROM {last}),
{", ".join(clz)},
regs AS (SELECT event_type, idx, MAX(rank + 1) AS r FROM {prev} GROUP BY 1, 2),
est AS (
  SELECT event_type,
    {alpha * m * m!r} / (SUM(pow(2.0, -r)) + CAST({m} - COUNT(*) AS DOUBLE)) AS raw,
    {m} - COUNT(*) AS zeros
  FROM regs GROUP BY event_type
)
SELECT event_type,
  CAST(ROUND(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
       THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / zeros) ELSE raw END) AS BIGINT) AS approx_distinct
FROM est"""


def ppr_parts_sql(k: int = 20, damping: float = 0.85, seeds=(1, 2, 3, 4, 5), top: int = 20) -> str:
    """Seeded (personalized) PageRank, k unrolled steps — the engine's
    exact update new = (1-d)·T + d·(M·r + T·dang), T uniform on seeds."""
    seed_list = ", ".join(str(s) for s in seeds)
    tw = 1.0 / len(seeds)
    # MATERIALIZED: k unrolled steps reference the edge CTE ~3k times;
    # without it DuckDB re-inlines the parquet scan per reference and
    # exhausts file handles
    edges_mat = _PARTSUPP_EDGES.replace("e AS (", "e AS MATERIALIZED (", 1)
    parts = [
        f"WITH {edges_mat},",
        "od AS (SELECT src AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY 1),",
        f"tp AS (SELECT vid, CASE WHEN vid IN ({seed_list}) THEN {tw!r} ELSE 0.0 END AS t FROM v),",
        "r0 AS (SELECT vid, t AS r FROM tp)",
    ]
    for i in range(1, k + 1):
        p = f"r{i-1}"
        # MATERIALIZED r{i}: each round references the previous one 3×,
        # so default CTE inlining expands 3^k plans — k=20 never finishes
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
r{i} AS MATERIALIZED (
  SELECT tp.vid,
         (1 - {damping}) * tp.t
         + {damping} * (COALESCE(m{i}.s, 0) + tp.t * (SELECT dm FROM dang{i})) AS r
  FROM tp LEFT JOIN m{i} ON tp.vid = m{i}.vid
)"""
        )
    parts.append(
        f"\nSELECT vid, ROUND(r, 9) AS score_r9 FROM r{k}"
        f" ORDER BY ROUND(r, 9) DESC, vid ASC LIMIT {top}"
    )
    return "".join(parts)


def ann_ivf_knn_sql(query_ids=(0, 7, 42), k: int = 5) -> str:
    """nprobe == n_clusters IVF ≡ exact cosine top-k per query."""
    blocks = []
    for q in query_ids:
        blocks.append(
            f"""(
WITH qq AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = {q})
SELECT {q}::BIGINT AS query_id, e.vec_id AS vec_id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], (SELECT e FROM qq)), 5) AS cosine_r5
FROM embeddings e
WHERE e.vec_id <> {q}
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], (SELECT e FROM qq)) DESC, e.vec_id ASC
LIMIT {k})"""
        )
    return "\nUNION ALL\n".join(blocks)


def truncated_overlap_sql(query_ids=(0, 7, 42), k: int = 5, dims: int = 16) -> str:
    """Replays functions/similarity.truncated_dim_overlap: exact
    cosine top-k under the full embedding vs under the first ``dims``
    dims; overlap of the two vec_id sets per query."""
    blocks = []
    for q in query_ids:
        blocks.append(f"""(
WITH qq AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = {q}),
f AS (
  SELECT e.vec_id FROM embeddings e WHERE e.vec_id <> {q}
  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], (SELECT e FROM qq)) DESC,
           e.vec_id ASC
  LIMIT {k}
),
t AS (
  SELECT e.vec_id FROM embeddings e WHERE e.vec_id <> {q}
  ORDER BY list_cosine_similarity(
             list_slice(e.embedding::DOUBLE[], 1, {dims}),
             list_slice((SELECT e FROM qq), 1, {dims})) DESC,
           e.vec_id ASC
  LIMIT {k}
)
SELECT {q}::BIGINT AS query_id,
  (SELECT count(*) FROM (SELECT vec_id FROM f INTERSECT SELECT vec_id FROM t))::BIGINT
    AS overlap_at_k
)""")
    return "\nUNION ALL\n".join(blocks)


INT8_QUANTIZE = """WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
dim AS (SELECT len(e) AS d FROM base LIMIT 1),
idx AS (SELECT unnest(generate_series(1, (SELECT d FROM dim))) AS j),
expd AS (SELECT vec_id, j, e[j] AS x FROM base CROSS JOIN idx),
scale AS MATERIALIZED (SELECT j, MAX(ABS(x)) AS s FROM expd GROUP BY j),
q AS (
  SELECT e.vec_id, e.x, sc.s,
    LEAST(GREATEST(ROUND(e.x / sc.s * 127), -127), 127) AS q
  FROM expd e JOIN scale sc ON sc.j = e.j
)
SELECT vec_id::BIGINT AS vec_id,
  ROUND(sqrt(SUM((x - q * s / 127) * (x - q * s / 127))), 6) AS err_r6,
  SUM(ABS(q))::BIGINT AS q_norm1
FROM q GROUP BY vec_id"""


def semantic_dedup_sql(n_clusters: int = 16, threshold: float = 0.4) -> str:
    """Replays functions/similarity.semantic_dedup with anchor
    centroids: anchors = the n_clusters corpus vectors with the
    smallest splitmix64(vec_id ⊕ mix), hash-ordered (cluster index =
    hash rank − 1); assignment = argmax cosine (ties → smaller
    cluster); a vector is a duplicate iff a smaller-vec_id member of
    its cluster has cosine ≥ threshold, dup_of = the smallest such
    id."""
    from ..config import HASH_SEED

    mix = HASH_SEED * 0x9E3779B97F4A7C15 % (1 << 64)
    frag, cte, _ = sm64_stages("sd0", "hx", "sd_h", ["vec_id"])
    return f"""WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e0 FROM embeddings
),
nrm AS MATERIALIZED (
  SELECT vec_id,
         list_transform(e0, x -> x / sqrt(list_inner_product(e0, e0))) AS e
  FROM base
),
sd0 AS (SELECT vec_id, xor(CAST(vec_id AS UBIGINT), {mix}::UBIGINT) AS hx FROM base){frag},
anch AS MATERIALIZED (
  SELECT n.vec_id, n.e, ROW_NUMBER() OVER (ORDER BY s.h) - 1 AS c
  FROM {cte} s JOIN nrm n ON n.vec_id = s.vec_id
  QUALIFY c < {n_clusters}
),
asg AS MATERIALIZED (
  SELECT vec_id, c, e FROM (
    SELECT n.vec_id, a.c, n.e,
      ROW_NUMBER() OVER (
        PARTITION BY n.vec_id
        ORDER BY list_inner_product(n.e, a.e) DESC, a.c
      ) AS rk
    FROM nrm n CROSS JOIN anch a
  ) WHERE rk = 1
),
dup AS (
  SELECT x.vec_id, MIN(y.vec_id) AS dup_of
  FROM asg x JOIN asg y ON y.c = x.c AND y.vec_id < x.vec_id
  WHERE list_inner_product(x.e, y.e) >= {threshold}
  GROUP BY x.vec_id
)
SELECT a.vec_id::BIGINT AS vec_id, a.c::BIGINT AS cluster,
  (d.dup_of IS NULL) AS keep, COALESCE(d.dup_of, -1)::BIGINT AS dup_of
FROM asg a LEFT JOIN dup d ON d.vec_id = a.vec_id"""


def ann_pq_adc_sql(
    query_ids=(0, 7, 42), k: int = 5, m: int = 8, n_codes: int = 16
) -> str:
    """Replays functions/similarity.py's SQL-replayable PQ path
    (iters=0) exactly: anchors = the n_codes corpus vectors with the
    smallest splitmix64(vec_id ⊕ mix), hash-ordered (code index =
    hash rank); vectors L2-normalize, split into m subspaces; code =
    argmin L2 distance to the subspace anchors (ties → smaller code);
    ADC score = Σ_j ⟨query_sub_j, anchor[code_j]_sub_j⟩, top-k by
    (score DESC, vec_id), self excluded, ROUND 5."""
    from ..config import HASH_SEED

    mix = HASH_SEED * 0x9E3779B97F4A7C15 % (1 << 64)
    frag, cte, _ = sm64_stages("hh0", "hx", "pq_h", ["vec_id"])
    blocks = []
    for q in query_ids:
        blocks.append(
            f"""(
  SELECT {q}::BIGINT AS query_id, sc.vec_id::BIGINT AS vec_id,
         ROUND(sc.score, 5) AS adc_r5
  FROM (
    SELECT cd.vec_id, SUM(list_inner_product(qs.s, a.s)) AS score
    FROM code1 cd
    JOIN asub a ON a.j = cd.j AND a.c = cd.c
    JOIN vsub qs ON qs.vec_id = {q} AND qs.j = cd.j
    GROUP BY cd.vec_id
  ) sc
  WHERE sc.vec_id <> {q}
  ORDER BY sc.score DESC, sc.vec_id LIMIT {k}
)"""
        )
    return f"""WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e0 FROM embeddings
),
nrm AS MATERIALIZED (
  SELECT vec_id,
         list_transform(e0, x -> x / sqrt(list_inner_product(e0, e0))) AS e
  FROM base
),
hh0 AS (SELECT vec_id, xor(CAST(vec_id AS UBIGINT), {mix}::UBIGINT) AS hx FROM base){frag},
anch AS MATERIALIZED (
  SELECT n.vec_id, n.e, ROW_NUMBER() OVER (ORDER BY s.h) AS c
  FROM {cte} s JOIN nrm n ON n.vec_id = s.vec_id
  QUALIFY c <= {n_codes}
),
subs AS (SELECT j FROM generate_series(0, {m - 1}) AS t(j)),
dim AS (SELECT len(e) // {m} AS w FROM nrm LIMIT 1),
asub AS MATERIALIZED (
  SELECT a.c, t.j,
         list_slice(a.e, t.j * (SELECT w FROM dim) + 1, (t.j + 1) * (SELECT w FROM dim)) AS s
  FROM anch a CROSS JOIN subs t
),
vsub AS MATERIALIZED (
  SELECT n.vec_id, t.j,
         list_slice(n.e, t.j * (SELECT w FROM dim) + 1, (t.j + 1) * (SELECT w FROM dim)) AS s
  FROM nrm n CROSS JOIN subs t
),
code1 AS MATERIALIZED (
  SELECT vec_id, j, c FROM (
    SELECT v.vec_id, v.j, a.c,
      ROW_NUMBER() OVER (
        PARTITION BY v.vec_id, v.j
        ORDER BY list_distance(v.s, a.s), a.c
      ) AS rn
    FROM vsub v JOIN asub a ON a.j = v.j
  ) WHERE rn = 1
)
{"UNION ALL".join(blocks)}"""


GAUSSIAN_DOCLEN = """SELECT doc_id,
  ROUND(exp(-0.01 * CAST(n_chars AS DOUBLE)), 9) AS gk_r9
FROM documents"""


_COOCC_UND_MAT = """pr AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS MATERIALIZED (SELECT u, v FROM pr UNION ALL SELECT v AS u, u AS v FROM pr)"""


def label_prop_coocc_sql(rounds: int = 8, seeds=((1, 100), (2, 200), (3, 300))) -> str:
    """Unrolled seeded min-label propagation over the co-occurrence
    graph; unreached keeps the sentinel → −1."""
    sent = 1 << 62
    seed_case = " ".join(f"WHEN vid = {v} THEN {lab}" for v, lab in seeds)
    body = []
    for i in range(1, rounds + 1):
        p = f"l{i-1}"
        body.append(
            f""",
mn{i} AS (SELECT und.v AS vid, MIN(x.lab) AS m FROM und JOIN {p} x ON und.u = x.vid GROUP BY und.v),
l{i} AS MATERIALIZED (
  SELECT l.vid, LEAST(l.lab, COALESCE(m.m, l.lab)) AS lab
  FROM {p} l LEFT JOIN mn{i} m ON l.vid = m.vid
)"""
        )
    return f"""WITH {_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und),
l0 AS MATERIALIZED (SELECT vid, CASE {seed_case} ELSE {sent} END AS lab FROM verts){"".join(body)}
SELECT CAST(vid AS BIGINT) AS vid,
  CAST(CASE WHEN lab >= {sent} THEN -1 ELSE lab END AS BIGINT) AS label
FROM l{rounds}"""


INTERPOLATE_COOCC = f"""WITH {_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und),
deg AS (SELECT u AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM und GROUP BY u),
f AS (
  SELECT v.vid,
    CASE WHEN p.p_size <= 25 THEN CAST(p.p_retailprice AS DOUBLE) ELSE 0.0 END AS x,
    CASE WHEN p.p_size <= 25 THEN 1.0 ELSE 0.0 END AS m
  FROM verts v JOIN part p ON p.p_partkey = v.vid
),
acc AS (
  SELECT und.v AS vid, SUM(f.x / deg.d) AS num, SUM(f.m / deg.d) AS den
  FROM und JOIN f ON und.u = f.vid JOIN deg ON und.u = deg.vid
  GROUP BY und.v
)
SELECT CAST(v.vid AS BIGINT) AS vid,
  ROUND(CASE WHEN COALESCE(a.den, 0) > 0 THEN a.num / a.den ELSE 0.0 END, 6) AS value_r6
FROM verts v LEFT JOIN acc a ON v.vid = a.vid"""



def distance_buckets_partsupp_sql(
    rounds: int = 8, unit_q: int = 1 << 14, scale: int = 1 << 16, sources=(1, 2, 3)
) -> str:
    """Distance-bucket histogram over the same unrolled Bellman–Ford
    metric as ``sssp_partsupp_sql`` — bucket = dist_q // unit_q
    (integer-exact), unreached → −1."""
    base = sssp_partsupp_sql(rounds=rounds, scale=scale, sources=sources)
    cut = base.rindex("\nSELECT CAST(d.vid AS BIGINT)")
    sent = 1 << 40
    return base[:cut] + f"""
SELECT CASE WHEN d.dist >= {sent} THEN -1 ELSE d.dist // {unit_q} END AS bucket,
       COUNT(*) AS n
FROM d{rounds} d GROUP BY 1"""


def pagerank_weighted_coocc_sql(k: int = 4, damping: float = 0.85) -> str:
    """k unrolled WEIGHTED power-iteration steps on the part
    co-occurrence graph: w(u,v) = number of orders the pair shares,
    message = r / wdeg(u) * w(u,v) — written in that association order
    to mirror the engine's (state / wdeg) normalize-then-scatter-by-w
    arithmetic bit-for-bit (before the r9 round absorbs summation-order
    drift). No dangling term: every vertex has wdeg > 0."""
    parts = [
        """WITH pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, a.l_orderkey AS o
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2, 3
),
ew AS (SELECT u, v, CAST(COUNT(*) AS DOUBLE) AS w FROM pairs GROUP BY 1, 2),
e AS (
  SELECT u AS src, v AS dst, w FROM ew
  UNION ALL SELECT v AS src, u AS dst, w FROM ew
),
v AS (SELECT DISTINCT src AS vid FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM v),
wd AS (SELECT src AS vid, SUM(w) AS d FROM e GROUP BY 1),
r0 AS (SELECT vid, 1.0 / (SELECT c FROM nn) AS r FROM v)"""
    ]
    for i in range(1, k + 1):
        p = f"r{i-1}"
        parts.append(
            f""",
m{i} AS (
  SELECT e.dst AS vid, SUM({p}.r / wd.d * e.w) AS s
  FROM e JOIN {p} ON e.src = {p}.vid JOIN wd ON e.src = wd.vid
  GROUP BY e.dst
),
r{i} AS (
  SELECT v.vid,
         (1 - {damping}) / (SELECT c FROM nn)
         + {damping} * COALESCE(m{i}.s, 0) AS r
  FROM v LEFT JOIN m{i} ON v.vid = m{i}.vid
)"""
        )
    parts.append(f"\nSELECT vid, ROUND(r, 9) AS rank_r9 FROM r{k}")
    return "".join(parts)


def hits_partsupp_sql(k: int = 1) -> str:
    """HITS on the symmetrized part–supplier bipartite graph as the
    engine computes it: one symmetric power chain x ← A_sym·x from
    x₀ = 1, read at supersteps 2k (hub side = h_k) and 2k+1
    (authority side = a_{k+1}), each side divided by its L2 norm.
    All pre-normalization values are integer-valued (neighbor-count
    sums ≪ 2^53), so SUM(x*x), SQRT and the quotient are bit-identical
    between DuckDB and numpy; ROUND(…, 9) mirrors the engine."""
    parts = [
        f"""WITH e0 AS (
    SELECT DISTINCT l_partkey AS src, l_suppkey + {SUPP_OFFSET} AS dst FROM lineitem
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
v AS (SELECT DISTINCT src AS vid FROM e),
x0 AS (SELECT vid, 1.0 AS x FROM v)"""
    ]
    for i in range(1, 2 * k + 2):
        parts.append(
            f""",
x{i} AS (
  SELECT v.vid, COALESCE(SUM(xp.x), 0) AS x
  FROM v LEFT JOIN e ON e.dst = v.vid LEFT JOIN x{i-1} xp ON xp.vid = e.src
  GROUP BY v.vid
)"""
        )
    parts.append(
        f""",
hub AS (SELECT vid, x FROM x{2*k} WHERE vid < {SUPP_OFFSET}),
auth AS (SELECT vid, x FROM x{2*k+1} WHERE vid >= {SUPP_OFFSET}),
hn AS (SELECT SQRT(SUM(x * x)) AS n FROM hub),
an AS (SELECT SQRT(SUM(x * x)) AS n FROM auth)
SELECT vid, 'hub' AS kind, ROUND(x / (SELECT n FROM hn), 9) AS score_r9 FROM hub
UNION ALL
SELECT vid, 'auth' AS kind, ROUND(x / (SELECT n FROM an), 9) AS score_r9 FROM auth"""
    )
    return "".join(parts)


def salsa_partsupp_sql(k: int = 2) -> str:
    """SALSA on the symmetrized part–supplier graph as the engine
    computes it (pipelines/hits.salsa): x₀ = 1 on the supplier side,
    then the degree-normalized walk x ← Σ x(src)/deg(src), read at
    supersteps 2k−1 (hub side) and 2k (authority side); raw walk mass
    ROUND 9 (walk2's sum-monoid convention)."""
    parts = [
        f"""WITH e0 AS (
    SELECT DISTINCT l_partkey AS src, l_suppkey + {SUPP_OFFSET} AS dst FROM lineitem
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
v AS (SELECT DISTINCT src AS vid FROM e),
deg AS (SELECT src AS vid, COUNT(*) AS d FROM e GROUP BY src),
x0 AS (SELECT vid, CASE WHEN vid >= {SUPP_OFFSET} THEN 1.0 ELSE 0.0 END AS x FROM v)"""
    ]
    for i in range(1, 2 * k + 1):
        parts.append(
            f""",
x{i} AS (
  SELECT v.vid, COALESCE(SUM(xp.x / dg.d), 0) AS x
  FROM v LEFT JOIN e ON e.dst = v.vid
  LEFT JOIN x{i-1} xp ON xp.vid = e.src
  LEFT JOIN deg dg ON dg.vid = e.src
  GROUP BY v.vid
)"""
        )
    parts.append(
        f"""
SELECT vid, 'hub' AS kind, ROUND(x, 9) AS score_r9 FROM x{2*k-1} WHERE vid < {SUPP_OFFSET}
UNION ALL
SELECT vid, 'auth' AS kind, ROUND(x, 9) AS score_r9 FROM x{2*k} WHERE vid >= {SUPP_OFFSET}"""
    )
    return "".join(parts)


def sssp_partsupp_sql(rounds: int = 8, scale: int = 1 << 16, sources=(1, 2, 3), P: int = 16) -> str:
    """Unrolled Bellman–Ford over the weighted part–supplier graph,
    quantized edge lengths q = max(round_even(w·scale), 1) — the exact
    integer metric of pipelines/paths.py. Parent = lexicographic argmin
    (dist(u)+q, own_id(u)) over the FINAL distances (the min-monoid's
    converged encoding). own_id mirrors the engine's dense-id layout:
    rank over (vid % P, vid)."""
    sent = 1 << 40  # > any reachable quantized distance, < BIGINT overflow
    inf_q = 1 << 30  # engine's _INF (unreached sentinel in keyhi units)
    seeds = ", ".join(str(s) for s in sources)
    rounds_sql = []
    for i in range(1, rounds + 1):
        p = f"d{i-1}"
        rounds_sql.append(
            f""",
rx{i} AS (
  SELECT wq.v AS vid, MIN(dp.dist + wq.q) AS m
  FROM wq JOIN {p} dp ON wq.u = dp.vid WHERE dp.dist < {sent}
  GROUP BY wq.v
),
d{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.dist, COALESCE(r.m, {sent})) AS dist
  FROM {p} d LEFT JOIN rx{i} r ON d.vid = r.vid
)"""
        )
    return f"""WITH el AS MATERIALIZED (
  SELECT l_partkey AS a, l_suppkey + {SUPP_OFFSET} AS b,
         SUM(1.0 / GREATEST(CAST(l_quantity AS DOUBLE), 1.0)) AS w
  FROM lineitem GROUP BY 1, 2
),
und AS MATERIALIZED (SELECT a AS u, b AS v, w FROM el UNION ALL SELECT b AS u, a AS v, w FROM el),
verts AS (SELECT DISTINCT u AS vid FROM und),
ids AS MATERIALIZED (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid % {P}, vid) - 1 AS own_id FROM verts),
wq AS MATERIALIZED (
  SELECT u, v, CAST(GREATEST(round_even(w * {float(scale)!r}, 0), 1) AS BIGINT) AS q FROM und
),
d0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid IN ({seeds}) THEN 0 ELSE {sent} END AS dist FROM verts
){"".join(rounds_sql)},
par AS (
  SELECT wq.v AS vid, iu.own_id AS pid,
         ROW_NUMBER() OVER (PARTITION BY wq.v
                            ORDER BY dp.dist + wq.q ASC, iu.own_id ASC) AS rn
  FROM wq JOIN d{rounds} dp ON wq.u = dp.vid JOIN ids iu ON wq.u = iu.vid
  WHERE dp.dist < {sent}
)
SELECT CAST(d.vid AS BIGINT) AS vid,
  CAST(CASE WHEN d.dist >= {sent} OR d.vid IN ({seeds}) THEN ids.own_id ELSE par.pid END AS BIGINT) AS parent_id,
  CAST(CASE WHEN d.dist >= {sent} THEN -1 ELSE d.dist END AS BIGINT) AS dist_q,
  d.dist < {inf_q} AS reached
FROM d{rounds} d
JOIN ids ON d.vid = ids.vid
LEFT JOIN par ON d.vid = par.vid AND par.rn = 1"""


def densest_coocc_sql(rounds: int = 16, num: int = 5, den: int = 2) -> str:
    """Unrolled Bahmani 2(1+ε) densest-subgraph peeling (replays
    pipelines/densest.densest_subgraph bit-for-bit): per round, the
    alive-subgraph stats row (round, n_alive, edges2) is emitted while
    n_alive > 0, then every vertex with 2·den·deg_S·n_alive ≤
    num·Σdeg_S is peeled — all-BIGINT threshold, no float in control
    flow. ``rounds`` only needs to exceed the engine's measured
    exhaustion (3 at sf0.001, 5 at sf0.01; O(log_{1+ε} n) bound) —
    extra rounds emit no rows (empty alive set)."""
    body = []
    for i in range(1, rounds + 1):
        p = f"al{i-1}"
        body.append(
            f""",
dg{i} AS (
  SELECT a.vid, COALESCE(n.d, 0) AS d
  FROM {p} a LEFT JOIN (
    SELECT u.u AS vid, COUNT(*) AS d
    FROM und u JOIN {p} x ON u.v = x.vid JOIN {p} y ON u.u = y.vid
    GROUP BY u.u
  ) n ON n.vid = a.vid
),
st{i} AS (SELECT COUNT(*)::BIGINT AS n_alive, COALESCE(SUM(d), 0)::BIGINT AS edges2 FROM dg{i}),
al{i} AS MATERIALIZED (
  SELECT d.vid FROM dg{i} d, st{i} s
  WHERE NOT (2 * {int(den)} * d.d * s.n_alive <= {int(num)} * s.edges2)
)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i}::BIGINT AS round, n_alive, edges2 FROM st{i} WHERE n_alive > 0"
        for i in range(1, rounds + 1)
    )
    return f"""WITH {_COOCC_UND_MAT},
al0 AS MATERIALIZED (SELECT DISTINCT u AS vid FROM und){"".join(body)}
{selects}
ORDER BY round"""


def coreness_coocc_sql(rounds: int = 24, cap: int = 256) -> str:
    """Unrolled distributed h-index iteration (Montresor et al.) over
    the part co-occurrence graph — extra rounds past the fixpoint are
    no-ops (monotone non-increasing update), so ``rounds`` just needs
    to exceed the engine's measured convergence (19 at sf0.01)."""
    body = []
    for i in range(1, rounds + 1):
        p = f"e{i-1}"
        body.append(
            f""",
nb{i} AS (SELECT und.v AS vid, e.est FROM und JOIN {p} e ON und.u = e.vid),
rk{i} AS (SELECT vid, est, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY est DESC) AS rn FROM nb{i}),
h{i} AS (SELECT vid, COALESCE(MAX(CASE WHEN est >= rn THEN rn END), 0) AS h FROM rk{i} GROUP BY vid),
e{i} AS MATERIALIZED (
  SELECT e.vid, LEAST(e.est, COALESCE(h.h, 0)) AS est
  FROM {p} e LEFT JOIN h{i} h ON e.vid = h.vid
)"""
        )
    return f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, COUNT(*) AS d FROM und GROUP BY u),
e0 AS MATERIALIZED (SELECT vid, LEAST(d, {cap - 1}) AS est FROM deg){"".join(body)}
SELECT CAST(vid AS BIGINT) AS vid, CAST(est AS BIGINT) AS coreness FROM e{rounds}"""


def ldd_coocc_sql(rounds: int = 5, beta: float = 4.0, seed: int = 42, P: int = 16) -> str:
    """Unrolled Miller–Peng–Xu random-shift decomposition: quantized
    exponential shifts from splitmix64 (integer-exact after the single
    round_even), then min-propagation of (CAP − shift) << 32 | own_id
    with a SCALE<<32 hop increment — all BIGINT arithmetic, mirroring
    pipelines/decomposition.py bit-for-bit."""
    SCALE = 1024
    CAP = 1 << 24
    STEP = SCALE << 32
    frag, last, _ = sm64_stages("vx", "x", "ldd", ["vid"])
    body = []
    for i in range(1, rounds + 1):
        p = f"k{i-1}"
        body.append(
            f""",
mn{i} AS (
  SELECT und.v AS vid, MIN(k.enc + {STEP}) AS m
  FROM und JOIN {p} k ON und.u = k.vid GROUP BY und.v
),
k{i} AS MATERIALIZED (
  SELECT k.vid, LEAST(k.enc, COALESCE(m.m, k.enc)) AS enc
  FROM {p} k LEFT JOIN mn{i} m ON k.vid = m.vid
)"""
        )
    return f"""WITH {_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und),
ids AS MATERIALIZED (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid % {P}, vid) - 1 AS own_id FROM verts),
vx AS (SELECT vid, xor(CAST(vid AS UBIGINT), {seed}::UBIGINT) AS x FROM verts){frag},
shq AS (
  SELECT vid,
    LEAST(CAST(round_even((-ln(1.0 - (CAST(h >> 11 AS DOUBLE) / {float(1 << 53)!r})) / {beta!r})
         * {SCALE}.0, 0) AS BIGINT), {CAP - 1}) AS q
  FROM {last}
),
k0 AS MATERIALIZED (
  SELECT s.vid, ({CAP} - s.q) * {1 << 32} + i.own_id AS enc
  FROM shq s JOIN ids i ON s.vid = i.vid
){"".join(body)}
SELECT CAST(k.vid AS BIGINT) AS vid,
  CAST(k.enc % {1 << 32} AS BIGINT) AS cluster,
  (k.enc % {1 << 32}) = i.own_id AS is_center
FROM k{rounds} k JOIN ids i ON k.vid = i.vid"""


def cluster_field_integrate_coocc_sql(
    rounds: int = 5, beta: float = 4.0, seed: int = 42, P: int = 16, unit: int = 1
) -> str:
    """Replays pipelines/decomposition.cluster_sliced_integrate: the
    cluster_slices chain (per-vertex hop band sv, per-(cluster, band)
    degree sums F_s), then value(v) = (Σ_s ⌊F_s·2^20 / (1 + |sv −
    s|·unit)⌋) / 2^20, round_even 6. Each kernel term is floor-
    quantized at 2^20 and summed as int64 on BOTH sides (the repo's
    quantization convention), so the sum is associative and blocking-
    independent — no reliance on rounding to absorb reassociation."""
    inner = cluster_slices_coocc_sql(rounds=rounds, beta=beta, seed=seed, P=P, unit=unit)
    # reuse the chain up to `fin`/`base`/`deg`: drop the final SELECT,
    # append two more CTEs (note the comma splice) + the new final SELECT
    head, _sep, _tail = inner.rpartition("SELECT f.cluster,")
    return f"""{head.rstrip()},
bands AS (
  SELECT f.cluster,
    ((f.keyhi - b.kmin) // 1024) // {int(unit)} AS s,
    SUM(d.d)::DOUBLE AS fsum
  FROM fin f JOIN base b USING (cluster) JOIN deg d ON d.vid = f.vid
  GROUP BY 1, 2
),
vslice AS (
  SELECT f.vid, f.cluster,
    ((f.keyhi - b.kmin) // 1024) // {int(unit)} AS sv
  FROM fin f JOIN base b USING (cluster)
)
SELECT v.vid,
  round_even(SUM(CAST(FLOOR(bd.fsum * 1048576.0 / (1.0 + abs(v.sv - bd.s) * {float(unit)!r})) AS BIGINT))::DOUBLE / 1048576.0, 6) AS value_r6
FROM vslice v JOIN bands bd ON bd.cluster = v.cluster
GROUP BY v.vid"""


def cluster_cross_integrate_coocc_sql(
    rounds: int = 5, beta: float = 4.0, seed: int = 42, P: int = 16, unit: int = 1
) -> str:
    """Replays pipelines/decomposition.cluster_cross_integrate: the
    cluster_slices chain (per-vertex hop band sv, per-(cluster, band)
    field sums F), clusters split into two sides by cluster-id parity,
    geometric kernel f(d) = 2^-d with Hankel collapse
    K_c = Σ_j F_{c,j} / 2^(j·u) (exact dyadic sums), then per vertex

      value(v) = (Σ_{cr opposite} ⌊K_cr·2^20 / 2^((sv+shift(cl,cr))·u)⌋) / 2^20

    with shift(cl,cr) = 1 + (3·cl + 5·cr) mod 4, round_even 6. The
    per-pair floor-quantization + BIGINT sum matches the engine term
    for term, so the many-cluster sum is order-independent."""
    u = int(unit)
    inner = cluster_slices_coocc_sql(rounds=rounds, beta=beta, seed=seed, P=P, unit=unit)
    head, _sep, _tail = inner.rpartition("SELECT f.cluster,")
    return f"""{head.rstrip()},
bands AS (
  SELECT f.cluster,
    ((f.keyhi - b.kmin) // 1024) // {u} AS s,
    SUM(d.d)::DOUBLE AS fsum
  FROM fin f JOIN base b USING (cluster) JOIN deg d ON d.vid = f.vid
  GROUP BY 1, 2
),
kc AS (
  SELECT cluster, SUM(fsum / CAST(1 << (s * {u}) AS DOUBLE)) AS kval
  FROM bands GROUP BY cluster
),
vslice AS (
  SELECT f.vid, f.cluster,
    ((f.keyhi - b.kmin) // 1024) // {u} AS sv
  FROM fin f JOIN base b USING (cluster)
)
SELECT v.vid,
  round_even(SUM(CAST(FLOOR(k.kval * 1048576.0 /
      CAST(1 << ((v.sv + 1 + ((3 * v.cluster + 5 * k.cluster) % 4)) * {u}) AS DOUBLE))
    AS BIGINT))::DOUBLE / 1048576.0, 6) AS value_r6
FROM vslice v JOIN kc k ON (k.cluster % 2) <> (v.cluster % 2)
GROUP BY v.vid"""


def cluster_slices_coocc_sql(
    rounds: int = 5, beta: float = 4.0, seed: int = 42, P: int = 16, unit: int = 1
) -> str:
    """Replays pipelines/decomposition.cluster_distance_slices: the
    ldd_coocc_sql random-shift chain, then per-cluster distance bands
    hops = (keyhi − MIN(keyhi) over cluster) / SCALE, slice =
    hops / unit (all BIGINT — bit-exact), aggregated to per-(cluster,
    slice) vertex counts and degree sums."""
    SCALE = 1024
    CAP = 1 << 24
    STEP = SCALE << 32
    frag, last, _ = sm64_stages("vx", "x", "ldd", ["vid"])
    body = []
    for i in range(1, rounds + 1):
        p = f"k{i-1}"
        body.append(
            f""",
mn{i} AS (
  SELECT und.v AS vid, MIN(k.enc + {STEP}) AS m
  FROM und JOIN {p} k ON und.u = k.vid GROUP BY und.v
),
k{i} AS MATERIALIZED (
  SELECT k.vid, LEAST(k.enc, COALESCE(m.m, k.enc)) AS enc
  FROM {p} k LEFT JOIN mn{i} m ON k.vid = m.vid
)"""
        )
    return f"""WITH {_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und),
ids AS MATERIALIZED (SELECT vid, ROW_NUMBER() OVER (ORDER BY vid % {P}, vid) - 1 AS own_id FROM verts),
vx AS (SELECT vid, xor(CAST(vid AS UBIGINT), {seed}::UBIGINT) AS x FROM verts){frag},
shq AS (
  SELECT vid,
    LEAST(CAST(round_even((-ln(1.0 - (CAST(h >> 11 AS DOUBLE) / {float(1 << 53)!r})) / {beta!r})
         * {SCALE}.0, 0) AS BIGINT), {CAP - 1}) AS q
  FROM {last}
),
k0 AS MATERIALIZED (
  SELECT s.vid, ({CAP} - s.q) * {1 << 32} + i.own_id AS enc
  FROM shq s JOIN ids i ON s.vid = i.vid
){"".join(body)},
fin AS (
  SELECT CAST(k.vid AS BIGINT) AS vid,
         CAST(k.enc % {1 << 32} AS BIGINT) AS cluster,
         CAST(k.enc // {1 << 32} AS BIGINT) AS keyhi
  FROM k{rounds} k
),
base AS (SELECT cluster, MIN(keyhi) AS kmin FROM fin GROUP BY cluster),
deg AS (SELECT u AS vid, COUNT(*)::BIGINT AS d FROM und GROUP BY u)
SELECT f.cluster,
  ((f.keyhi - b.kmin) // {SCALE}) // {int(unit)} AS slice,
  COUNT(*)::BIGINT AS n_vertices,
  SUM(d.d)::BIGINT AS deg_sum
FROM fin f JOIN base b USING (cluster) JOIN deg d ON d.vid = f.vid
GROUP BY 1, 2"""


def _walk_chain(walk_len: int, seed: int) -> list[str]:
    """Shared CTE chain for the DeepWalk replays: uniform hops, final
    table ``w{walk_len-1}`` with columns (start, wid, cur, v1..v{L-1})."""
    sm0 = sm64_py(0)
    # w0: start vertex + walk id
    frag0, last0, _ = sm64_stages("vx", "x", "wid", ["start"])
    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        "deg AS MATERIALIZED (SELECT u AS vid, COUNT(*) AS d FROM und GROUP BY u),",
        "adj AS MATERIALIZED (SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS idx FROM und),",
        f"vx AS (SELECT vid AS start, xor(CAST(vid AS UBIGINT), {sm0}::UBIGINT) AS x FROM verts)",
        frag0,
        f",\nw0 AS MATERIALIZED (SELECT start, h AS wid, CAST(start AS UBIGINT) AS cur FROM {last0})",
    ]
    carry = ["start", "wid"]
    hops: list[str] = []
    for t in range(1, walk_len):
        smt = sm64_py(t)
        hop_cols = ", ".join(hops)
        hc = (hop_cols + ", ") if hops else ""
        parts.append(
            f""",
sx{t} AS (SELECT {hc}start, wid, cur, xor(xor(wid, {smt}::UBIGINT), {seed}::UBIGINT) AS x FROM w{t-1})"""
        )
        frag, last, _ = sm64_stages(f"sx{t}", "x", f"st{t}", carry + hops + ["cur"])
        parts.append(frag)
        parts.append(
            f""",
w{t} AS MATERIALIZED (
  SELECT {hc}t.start, t.wid, CAST(adj.v AS UBIGINT) AS cur, adj.v AS v{t}
  FROM {last} t
  JOIN deg ON deg.vid = CAST(t.cur AS BIGINT)
  JOIN adj ON adj.u = CAST(t.cur AS BIGINT)
         AND adj.idx = CAST(t.h % CAST(deg.d AS UBIGINT) AS BIGINT)
)"""
        )
        hops.append(f"v{t}")
    return parts


def walk_corpus_coocc_sql(walk_len: int = 8, seed: int = 7) -> str:
    """Deterministic DeepWalk sequences over the part co-occurrence
    graph, replayed in SQL: hop t takes neighbor index
    splitmix64(walk_id ⊕ splitmix64(t) ⊕ seed) mod degree, neighbors
    ranked ascending (the CSR order). walk_id = splitmix64(vid ⊕
    splitmix64(0)); all splitmix constants are inlined from Python."""
    parts = _walk_chain(walk_len, seed)
    sel = ", ".join(f"CAST(v{t} AS BIGINT) AS v{t}" for t in range(1, walk_len))
    parts.append(f"\nSELECT CAST(start AS BIGINT) AS start, {sel} FROM w{walk_len-1}")
    return "".join(parts)


def skipgram_coocc_sql(walk_len: int = 8, seed: int = 7, window: int = 2) -> str:
    """Skip-gram pair counts from the replayed DeepWalk corpus: every
    ordered (center, context) at walk distance ≤ window, counted over
    all walks — the UNION ALL enumerates the fixed (i, j) offset
    pairs of the L-position sequence (position 0 = start)."""
    parts = _walk_chain(walk_len, seed)

    def col(i: int) -> str:
        return "start" if i == 0 else f"v{i}"

    selects = []
    for i in range(walk_len):
        for j in range(walk_len):
            if i != j and abs(i - j) <= window:
                selects.append(
                    f"SELECT CAST({col(i)} AS BIGINT) AS center, "
                    f"CAST({col(j)} AS BIGINT) AS context FROM w{walk_len-1}"
                )
    union = "\nUNION ALL\n".join(selects)
    parts.append(
        f""",
pairs AS ({union})
SELECT center, context, COUNT(*)::BIGINT AS n FROM pairs GROUP BY 1, 2"""
    )
    return "".join(parts)


# min-neighbor forest over the co-occurrence graph: parent(v) = the
# smallest neighbor u < v — chains strictly decrease, so this is a
# forest whose roots are the vertices with no smaller neighbor.
_FOREST = f"""{_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und),
pe AS MATERIALIZED (SELECT u AS child, MIN(v) AS parent FROM und WHERE v < u GROUP BY u)"""

SUBTREE_SIZES_FOREST = f"""WITH RECURSIVE {_FOREST},
roots AS (SELECT vid FROM verts WHERE vid NOT IN (SELECT child FROM pe)),
dep AS (
  SELECT vid, 0 AS depth FROM roots
  UNION ALL
  SELECT pe.child, dep.depth + 1 FROM pe JOIN dep ON pe.parent = dep.vid
),
anc AS (
  SELECT vid AS node, vid AS anc FROM verts
  UNION ALL
  SELECT a.node, pe.parent FROM anc a JOIN pe ON a.anc = pe.child
)
SELECT CAST(d.vid AS BIGINT) AS vid,
  CAST(s.n AS BIGINT) AS subtree_size,
  CAST(d.depth AS BIGINT) AS depth
FROM dep d JOIN (SELECT anc, COUNT(*) AS n FROM anc GROUP BY anc) s ON d.vid = s.anc"""


def tree_kernel_forest_sql(a: float = -0.5) -> str:
    """exp(a·dist_T)·p_retailprice over the min-neighbor forest via the
    LCA identity dist(u,v) = depth(u) + depth(v) − 2·depth(lca) on
    recursive ancestor closures (same-tree pairs only — cross-tree
    kernel weight is 0, matching the engine's two-pass integrator)."""
    import math

    lam = math.exp(a)
    return f"""WITH RECURSIVE {_FOREST},
roots AS (SELECT vid FROM verts WHERE vid NOT IN (SELECT child FROM pe)),
dep AS (
  SELECT vid, 0 AS depth FROM roots
  UNION ALL
  SELECT pe.child, dep.depth + 1 FROM pe JOIN dep ON pe.parent = dep.vid
),
anc AS (
  SELECT vid AS node, vid AS anc FROM verts
  UNION ALL
  SELECT a.node, pe.parent FROM anc a JOIN pe ON a.anc = pe.child
),
lca AS (
  SELECT a1.node AS s, a2.node AS t, MAX(d.depth) AS ld
  FROM anc a1 JOIN anc a2 ON a1.anc = a2.anc JOIN dep d ON a1.anc = d.vid
  GROUP BY a1.node, a2.node
),
y AS (
  SELECT l.s AS vid,
    SUM(pow({lam!r}, ds.depth + dt.depth - 2 * l.ld) * CAST(p.p_retailprice AS DOUBLE)) AS val
  FROM lca l
  JOIN dep ds ON l.s = ds.vid
  JOIN dep dt ON l.t = dt.vid
  JOIN part p ON p.p_partkey = l.t
  GROUP BY l.s
)
SELECT CAST(vid AS BIGINT) AS vid, ROUND(val, 4) AS integral_r4 FROM y"""


def tree_ensemble_coocc_sql(
    a: float = -0.5, seeds=(42, 42 + 1000003), rounds: int = 8
) -> str:
    """Random-spanning-tree ensemble kernel over the co-occurrence
    graph: per seed, edge weights = splitmix64(u ⊕ v ⊕ seed) >> 11
    (exact 53-bit float64 on both sides), the unique MSF under the
    (w, a, b) total order via unrolled Borůvka, orientation from the
    per-tree min vid by a back-edge-excluding recursion (parent is
    unique in a tree), then the LCA-identity exp-kernel; averaged over
    the seeds. Replays pipelines/tree_ensemble.py exactly."""
    import math

    lam = math.exp(a)
    chunks = []
    y_names = []
    for i, seed in enumerate(seeds):
        sm_frag, sm_cte, hcol = sm64_stages(f"s{i}ein", "x", f"s{i}e", ["u", "v"])
        boruvka = []
        for r in range(1, rounds + 1):
            p = f"s{i}c{r-1}"
            boruvka.append(
                f""",
s{i}cand{r} AS (
  SELECT cu.c AS comp, undw.w,
    LEAST(undw.u, undw.v) AS ea, GREATEST(undw.u, undw.v) AS eb,
    ROW_NUMBER() OVER (PARTITION BY cu.c
      ORDER BY undw.w, LEAST(undw.u, undw.v), GREATEST(undw.u, undw.v)) AS rn
  FROM s{i}undw undw JOIN {p} cu ON undw.u = cu.vid JOIN {p} cv ON undw.v = cv.vid
  WHERE cu.c <> cv.c
),
s{i}chosen{r} AS MATERIALIZED (SELECT DISTINCT ea, eb FROM s{i}cand{r} WHERE rn = 1),
s{i}ceb{r} AS MATERIALIZED (
  SELECT ca.c AS x, cb.c AS y
  FROM s{i}chosen{r} ch JOIN {p} ca ON ch.ea = ca.vid JOIN {p} cb ON ch.eb = cb.vid
  UNION ALL
  SELECT cb.c, ca.c
  FROM s{i}chosen{r} ch JOIN {p} ca ON ch.ea = ca.vid JOIN {p} cb ON ch.eb = cb.vid
),
s{i}reach{r} AS (
  SELECT x AS node, x AS lab FROM s{i}ceb{r}
  UNION
  SELECT ceb.y AS node, rc.lab FROM s{i}reach{r} rc JOIN s{i}ceb{r} ceb ON rc.node = ceb.x
),
s{i}newlab{r} AS (SELECT node, MIN(lab) AS lab FROM s{i}reach{r} GROUP BY node),
s{i}c{r} AS MATERIALIZED (
  SELECT c.vid, COALESCE(n.lab, c.c) AS c FROM {p} c LEFT JOIN s{i}newlab{r} n ON c.c = n.node
)"""
            )
        tree_union = "\nUNION ALL\n".join(
            f"SELECT ea, eb FROM s{i}chosen{r}" for r in range(1, rounds + 1)
        )
        chunks.append(
            f""",
s{i}ein AS (SELECT u, v,
  xor(xor(CAST(u AS UBIGINT), CAST(v AS UBIGINT)), {seed}::UBIGINT) AS x FROM pr){sm_frag},
s{i}we AS MATERIALIZED (SELECT u, v, CAST({hcol} >> 11 AS DOUBLE) AS w FROM {sm_cte}),
s{i}undw AS MATERIALIZED (
  SELECT u, v, w FROM s{i}we UNION ALL SELECT v AS u, u AS v, w FROM s{i}we
),
s{i}c0 AS MATERIALIZED (SELECT vid, vid AS c FROM verts){"".join(boruvka)},
s{i}tree AS MATERIALIZED ({tree_union}),
s{i}te AS MATERIALIZED (
  SELECT ea AS x, eb AS y FROM s{i}tree UNION ALL SELECT eb, ea FROM s{i}tree
),
s{i}treach AS (
  SELECT vid AS node, vid AS lab FROM verts
  UNION
  SELECT te.y AS node, t.lab FROM s{i}treach t JOIN s{i}te te ON t.node = te.x
),
s{i}comp AS (SELECT node, MIN(lab) AS c FROM s{i}treach GROUP BY node),
s{i}roots AS (SELECT node AS vid FROM s{i}comp WHERE node = c),
s{i}ori AS (
  SELECT vid, vid AS parent, 0 AS depth FROM s{i}roots
  UNION ALL
  SELECT te.y, o.vid, o.depth + 1
  FROM s{i}ori o JOIN s{i}te te ON te.x = o.vid AND te.y <> o.parent
),
s{i}pe AS MATERIALIZED (SELECT vid AS child, parent FROM s{i}ori WHERE vid <> parent),
s{i}dep AS MATERIALIZED (SELECT vid, depth FROM s{i}ori),
s{i}anc2 AS (
  -- ancestor closure CARRYING the child-toward-node: lets the kernel
  -- sum run in O(n·depth) via per-ancestor subtree sums instead of
  -- the O(Σ|desc|²) lca self-join. λ powers are depth-RELATIVE
  -- (exponents ≥ 0) so nothing overflows on deep trees.
  SELECT vid AS node, vid AS anc, CAST(NULL AS BIGINT) AS child FROM verts
  UNION ALL
  SELECT a.node, pe.parent, pe.child FROM s{i}anc2 a JOIN s{i}pe pe ON a.anc = pe.child
),
s{i}sub AS MATERIALIZED (
  SELECT a.anc, SUM(pow({lam!r}, dn.depth - da.depth) * CAST(p.p_retailprice AS DOUBLE)) AS sp
  FROM s{i}anc2 a
  JOIN s{i}dep dn ON a.node = dn.vid
  JOIN s{i}dep da ON a.anc = da.vid
  JOIN part p ON p.p_partkey = a.node
  GROUP BY a.anc
),
s{i}y AS MATERIALIZED (
  -- y(s) = Σ_{{a ∈ anc(s)}} λ^(d(s)−d(a))·S'(a) − λ^(d(s)−d(a)+1)·S'(child_a(s))
  -- where S'(a) = Σ_{{t ∈ subtree(a)}} λ^(d(t)−d(a))·x(t): exactly the
  -- lca identity with t grouped by lca(s,t) = a
  SELECT a.node AS vid,
    SUM(pow({lam!r}, ds.depth - da.depth) * sub_a.sp
        - CASE WHEN a.child IS NULL THEN 0.0
               ELSE pow({lam!r}, ds.depth - da.depth + 1) * sub_c.sp END) AS val
  FROM s{i}anc2 a
  JOIN s{i}dep ds ON a.node = ds.vid
  JOIN s{i}dep da ON a.anc = da.vid
  JOIN s{i}sub sub_a ON sub_a.anc = a.anc
  LEFT JOIN s{i}sub sub_c ON sub_c.anc = a.child
  GROUP BY a.node
)"""
        )
        y_names.append(f"s{i}y")
    k = len(seeds)
    avg = " + ".join(f"{y}.val" for y in y_names)
    joins = y_names[0] + "".join(
        f" JOIN {y} ON {y}.vid = {y_names[0]}.vid" for y in y_names[1:]
    )
    return f"""WITH RECURSIVE {_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und){"".join(chunks)}
SELECT CAST({y_names[0]}.vid AS BIGINT) AS vid,
  ROUND(({avg}) / {k}, 4) AS integral_r4
FROM {joins}"""


# --- MinHash / SimHash / embedding-LSH oracles ----------------------------
# The permutation constants are the engine's own module-level arrays —
# inlined as literals at SQL-generation time, so the Philox seeding never
# needs to be reproduced inside DuckDB.

_M61 = (1 << 61) - 1


def _minhash_frag(threshold: float, source: str = "documents") -> str:
    """Shared CTE chain: shingles → 128-perm signatures → banded buckets
    → candidate pairs with exact est = matches/128 (an exact binary
    fraction — emitted raw on both sides). Mirrors functions/dedup.py
    including the uint64 wraparound in (s·a + b) and the band hash.
    ``source`` is the (doc_id, text) relation to run over — a filtered
    CTE for composed pipelines."""
    from ..functions.dedup import _PERM_A, _PERM_B, LSH_ROWS, MAX_BUCKET

    perms = ", ".join(
        f"({k}, {int(a)}::UBIGINT, {int(b)}::UBIGINT)"
        for k, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    rperm = ", ".join(f"({r}, {int(_PERM_A[r])}::UBIGINT)" for r in range(LSH_ROWS))
    return f"""toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM {source}),
shs AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 2),
         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
  FROM toks
),
shr AS MATERIALIZED (
  SELECT DISTINCT doc_id, list_reduce(
    list_prepend(14695981039346656037::UBIGINT,
      list_transform(string_split(s, ''), ch -> ascii(ch)::UBIGINT)),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % {_U64} AS UBIGINT)
  ) AS sh
  FROM shs
),
perms(k, a, b) AS (VALUES {perms}),
rperm(r, a2) AS (VALUES {rperm}),
sigt AS MATERIALIZED (
  SELECT doc_id, k,
    MIN(CAST((CAST(CAST((CAST(sh % {_M61}::UBIGINT AS HUGEINT) * a) % {_U64} AS UBIGINT) AS HUGEINT)
        + b) % {_U64} AS UBIGINT) % {_M61}::UBIGINT) AS v
  FROM shr, perms GROUP BY doc_id, k
),
bandt AS MATERIALIZED (
  SELECT s.doc_id, s.k // 8 AS band,
    CAST(SUM(CAST((CAST(s.v AS HUGEINT) * r.a2) % {_U64} AS HUGEINT)) % {_U64}::HUGEINT AS UBIGINT) AS bh
  FROM sigt s JOIN rperm r ON s.k % 8 = r.r
  GROUP BY s.doc_id, s.k // 8
),
bsz AS (SELECT band, bh, COUNT(DISTINCT doc_id) AS n FROM bandt GROUP BY 1, 2),
cand AS MATERIALIZED (
  SELECT DISTINCT b1.doc_id AS da, b2.doc_id AS db
  FROM bandt b1
  JOIN bandt b2 ON b1.band = b2.band AND b1.bh = b2.bh AND b1.doc_id < b2.doc_id
  JOIN bsz ON bsz.band = b1.band AND bsz.bh = b1.bh AND bsz.n <= {MAX_BUCKET}
),
estt AS MATERIALIZED (
  SELECT c.da, c.db,
    SUM(CASE WHEN s1.v = s2.v THEN 1 ELSE 0 END) / 128.0 AS est
  FROM cand c
  JOIN sigt s1 ON s1.doc_id = c.da
  JOIN sigt s2 ON s2.doc_id = c.db AND s1.k = s2.k
  GROUP BY c.da, c.db
),
hits AS (SELECT da, db, est FROM estt WHERE est >= {threshold!r})"""


def minhash_pairs_sql(threshold: float = 0.5) -> str:
    return f"""WITH {_minhash_frag(threshold)}
SELECT da AS doc_a, db AS doc_b, est AS est_jaccard FROM hits"""


def ngram_jaccard_pairs_sql(threshold: float = 0.3) -> str:
    return f"""WITH {_minhash_frag(threshold)},
szs AS (SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY doc_id),
inter AS (
  SELECT h.da, h.db, COUNT(*) AS i
  FROM hits h JOIN shr s1 ON s1.doc_id = h.da JOIN shr s2 ON s2.doc_id = h.db AND s1.sh = s2.sh
  GROUP BY h.da, h.db
)
SELECT h.da AS doc_a, h.db AS doc_b,
  CASE WHEN (sa.n + sb.n - COALESCE(i.i, 0)) = 0 THEN 1.0
       ELSE CAST(COALESCE(i.i, 0) AS DOUBLE) / CAST(sa.n + sb.n - COALESCE(i.i, 0) AS DOUBLE)
  END AS jaccard
FROM hits h
JOIN szs sa ON h.da = sa.doc_id JOIN szs sb ON h.db = sb.doc_id
LEFT JOIN inter i ON h.da = i.da AND h.db = i.db"""


def neardup_clusters_sql(threshold: float = 0.5) -> str:
    """Connected components (min doc_id label) over the MinHash near-dup
    pair graph via a recursive reachability closure — tiny edge set, so
    the closure stays small; singletons label themselves."""
    return f"""WITH RECURSIVE {_minhash_frag(threshold)},
pe AS (SELECT da AS x, db AS y FROM hits UNION ALL SELECT db, da FROM hits),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT pe.x AS node, reach.r FROM reach JOIN pe ON reach.node = pe.y
)
SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node"""


SPECTRAL_MOMENTS_COOCC = f"""WITH {_COOCC_UND_MAT},
deg AS MATERIALIZED (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
cn AS (
  SELECT e1.u AS x, e2.u AS y, count(*)::BIGINT AS c
  FROM und e1 JOIN und e2 ON e1.v = e2.v AND e1.u < e2.u
  GROUP BY e1.u, e2.u
),
cns AS (SELECT COALESCE(SUM(c), 0)::BIGINT AS wedges,
               COALESCE(SUM(c * c), 0)::BIGINT AS cn_sq FROM cn),
ds AS (SELECT SUM(d)::BIGINT AS sd, SUM(d * d)::BIGINT AS sdsq FROM deg)
SELECT (ds.sd // 2)::BIGINT AS m, ds.sdsq AS sum_deg_sq, cns.wedges AS wedges,
  cns.cn_sq AS sum_cn_sq, (ds.sdsq + 2 * cns.cn_sq)::BIGINT AS closed_4walks,
  ((ds.sdsq + 2 * cns.cn_sq - 2 * ds.sdsq + ds.sd) // 8)::BIGINT AS c4
FROM ds, cns"""


def neardup_keep_canonical_sql(threshold: float = 0.5) -> str:
    """Retention policy replay: per near-dup cluster keep the longest
    doc, ties to the smallest doc_id — the cluster labels come from the
    same reachability closure as ``neardup_clusters_sql``."""
    return f"""WITH RECURSIVE {_minhash_frag(threshold)},
pe AS (SELECT da AS x, db AS y FROM hits UNION ALL SELECT db, da FROM hits),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT pe.x AS node, reach.r FROM reach JOIN pe ON reach.node = pe.y
),
clus AS (SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node),
rk AS (
  SELECT c.doc_id, c.cluster, d.n_chars,
    row_number() OVER (PARTITION BY c.cluster ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM clus c JOIN documents d USING (doc_id)
)
SELECT doc_id::BIGINT AS doc_id, cluster::BIGINT AS cluster,
  n_chars::BIGINT AS n_chars
FROM rk WHERE rn = 1"""


def corpus_prep_sql(threshold: float = 0.5, qmin_ppm: int = 550_000) -> str:
    """The full corpus-prep chain in one statement: quality filter →
    exact dedup (min doc_id per text) → MinHash near-dup clusters over
    the representatives → keep the min-doc_id cluster rep. The MinHash
    fragment runs over the DEDUPED relation (``docs_r``), mirroring
    the engine's band-row restriction, so bucket caps agree."""
    return f"""WITH RECURSIVE {_QUALITY_RATIOS},
keepq AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
  FROM q WHERE CAST(FLOOR(quality * 1000000.0) AS BIGINT) >= {qmin_ppm}
),
docs_f AS (SELECT d.doc_id, d.text FROM documents d JOIN keepq USING (doc_id)),
reps AS (SELECT MIN(doc_id) AS doc_id FROM docs_f GROUP BY text),
docs_r AS (SELECT f.doc_id, f.text FROM docs_f f JOIN reps USING (doc_id)),
{_minhash_frag(threshold, source="docs_r")},
pe AS (SELECT da AS x, db AS y FROM hits UNION ALL SELECT db, da FROM hits),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM docs_r
  UNION
  SELECT pe.x AS node, reach.r FROM reach JOIN pe ON reach.node = pe.y
),
clus AS (SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node)
SELECT c.doc_id, k.n_tokens
FROM clus c JOIN keepq k USING (doc_id)
WHERE c.doc_id = c.cluster"""


def simhash_pairs_sql(max_hamming: int = 12) -> str:
    """64-bit SimHash over FNV token hashes, 4×16-bit band buckets,
    exact Hamming verify — register-exact vs functions/text.py +
    functions/dedup.py."""
    from ..functions.dedup import MAX_BUCKET

    return f"""WITH tkt AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
),
tht AS MATERIALIZED (
  SELECT doc_id, list_reduce(
    list_prepend(14695981039346656037::UBIGINT,
      list_transform(string_split(tok, ''), ch -> ascii(ch)::UBIGINT)),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % {_U64} AS UBIGINT)
  ) AS th
  FROM tkt
),
bits(i) AS (SELECT unnest(generate_series(0, 63))),
votes AS (
  SELECT doc_id, i, SUM(CASE WHEN (th >> i) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE -1 END) AS vote
  FROM tht, bits GROUP BY doc_id, i
),
fp AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN vote > 0 THEN CAST(1::UBIGINT << i AS HUGEINT) ELSE 0::HUGEINT END) AS UBIGINT) AS f
  FROM votes GROUP BY doc_id
),
bandk AS MATERIALIZED (
  SELECT doc_id, b.b AS band, CAST((f >> (16 * b.b)) & 65535::UBIGINT AS BIGINT) AS key, f
  FROM fp, (SELECT unnest(generate_series(0, 3)) AS b) b
),
bsz AS (SELECT band, key, COUNT(DISTINCT doc_id) AS n FROM bandk GROUP BY 1, 2)
SELECT DISTINCT b1.doc_id AS doc_a, b2.doc_id AS doc_b,
  CAST(bit_count(xor(b1.f, b2.f)) AS BIGINT) AS hamming
FROM bandk b1
JOIN bandk b2 ON b1.band = b2.band AND b1.key = b2.key AND b1.doc_id < b2.doc_id
JOIN bsz ON bsz.band = b1.band AND bsz.key = b1.key AND bsz.n <= {MAX_BUCKET}
WHERE bit_count(xor(b1.f, b2.f)) <= {max_hamming}"""


def ann_lsh_pairs_sql(threshold: float = 0.25, n_bits: int = 6, d: int = 64) -> str:
    """±1-hyperplane LSH buckets + exact cosine verify — the planes are
    the engine's own splitmix64-derived signs, inlined as literals."""
    from ..functions.dedup import MAX_BUCKET
    from ..functions.similarity import lsh_sign_planes

    planes = lsh_sign_planes(d, n_bits)
    vals = ", ".join(
        f"({j}, {i}, {planes[j, i]!r})" for j in range(d) for i in range(n_bits)
    )
    return f"""WITH planes(j, i, s) AS (VALUES {vals}),
dots AS (
  SELECT e.vec_id, p.i, SUM(CAST(e.embedding[p.j + 1] AS DOUBLE) * p.s) AS dot
  FROM embeddings e, planes p GROUP BY e.vec_id, p.i
),
buck AS MATERIALIZED (
  SELECT vec_id, CAST(SUM(CASE WHEN dot > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
),
bsz AS (SELECT bucket, COUNT(*) AS n FROM buck GROUP BY bucket)
SELECT b1.vec_id AS vec_a, b2.vec_id AS vec_b,
  ROUND(list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 6) AS cosine
FROM buck b1
JOIN buck b2 ON b1.bucket = b2.bucket AND b1.vec_id < b2.vec_id
JOIN bsz ON bsz.bucket = b1.bucket AND bsz.n <= {MAX_BUCKET}
JOIN embeddings e1 ON e1.vec_id = b1.vec_id
JOIN embeddings e2 ON e2.vec_id = b2.vec_id
WHERE list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) >= {threshold!r}"""


def sinkhorn_coocc_sql(blur_t: float = 0.01, blur_steps: int = 3, n_iters: int = 4) -> str:
    """Unrolled convolutional Sinkhorn (Gauss–Seidel v/w fixed point
    with explicit-Euler heat blurs) over the part co-occurrence graph —
    the exact recurrence of pipelines/diffusion.py::sinkhorn_distance
    with both targets carried as two columns. ~2·n_iters·blur_steps
    matvec CTEs, all MATERIALIZED."""
    dt = blur_t / blur_steps
    eps = 1e-300

    def euler(tag: str, src: str) -> tuple[str, str]:
        out, prev = [], src
        for k in range(1, blur_steps + 1):
            cur = f"{tag}e{k}"
            out.append(
                f""",
nb_{cur} AS (
  SELECT und.v AS vid, SUM(x.a) AS sa, SUM(x.b) AS sb
  FROM und JOIN {prev} x ON und.u = x.vid GROUP BY und.v
),
{cur} AS MATERIALIZED (
  SELECT x.vid,
    x.a - {dt!r} * (deg.d * x.a - COALESCE(nb.sa, 0)) AS a,
    x.b - {dt!r} * (deg.d * x.b - COALESCE(nb.sb, 0)) AS b
  FROM {prev} x JOIN deg ON x.vid = deg.vid
  LEFT JOIN nb_{cur} nb ON x.vid = nb.vid
)"""
            )
            prev = cur
        return "".join(out), prev

    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        "deg AS MATERIALIZED (SELECT u AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM und GROUP BY u),",
        "tot AS (SELECT SUM(CAST(p_retailprice AS DOUBLE)) AS sp, SUM(CAST(p_size AS DOUBLE)) AS ss FROM part),",
        """mu AS MATERIALIZED (
  SELECT v.vid,
    CAST(p.p_retailprice AS DOUBLE) / (SELECT sp FROM tot) AS m,
    CAST(p.p_size AS DOUBLE) / (SELECT ss FROM tot) AS nu1
  FROM verts v JOIN part p ON p.p_partkey = v.vid
)""",
        ",\nw0 AS MATERIALIZED (SELECT vid, 1.0 AS a, 1.0 AS b FROM verts)",
    ]
    w_cur, v_cur = "w0", None
    for it in range(n_iters):
        frag, hw = euler(f"hw{it}", w_cur)
        parts.append(frag)
        v_cur = f"v{it}"
        parts.append(
            f""",
{v_cur} AS MATERIALIZED (
  SELECT mu.vid,
    mu.m / GREATEST(h.a, {eps!r}) AS a,
    mu.m / GREATEST(h.b, {eps!r}) AS b
  FROM mu JOIN {hw} h ON mu.vid = h.vid
)"""
        )
        frag, hv = euler(f"hv{it}", v_cur)
        parts.append(frag)
        w_cur = f"w{it + 1}"
        parts.append(
            f""",
{w_cur} AS MATERIALIZED (
  SELECT mu.vid,
    mu.m / GREATEST(h.a, {eps!r}) AS a,
    mu.nu1 / GREATEST(h.b, {eps!r}) AS b
  FROM mu JOIN {hv} h ON mu.vid = h.vid
)"""
        )
    parts.append(
        f"""
SELECT 0::BIGINT AS target,
  ROUND(SUM(mu.m * ln(GREATEST(v.a, {eps!r})) + mu.m * ln(GREATEST(w.a, {eps!r}))) * {blur_t!r}, 6) AS dist_r6
FROM mu JOIN {v_cur} v ON mu.vid = v.vid JOIN {w_cur} w ON mu.vid = w.vid
UNION ALL
SELECT 1::BIGINT AS target,
  ROUND(SUM(mu.m * ln(GREATEST(v.b, {eps!r})) + mu.nu1 * ln(GREATEST(w.b, {eps!r}))) * {blur_t!r}, 6) AS dist_r6
FROM mu JOIN {v_cur} v ON mu.vid = v.vid JOIN {w_cur} w ON mu.vid = w.vid"""
    )
    return "".join(parts)


def anf_coocc_sql(p: int = 6, rounds: int = 8, quantile: float = 0.9) -> str:
    """HyperANF replayed in SQL: per-vertex singleton HLL registers
    (splitmix64, integer CLZ cascade), ``rounds`` unrolled sparse
    max-merge propagations, per-round register-exact estimates, closure
    detection via the monotone (count, sum) signature, and the same
    interpolated effective diameter. Mirrors pipelines/anf.py."""
    m = 1 << p
    alpha_m = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    amm = alpha_m * m * m
    frag, last, _ = sm64_stages("vx", "x", "anf", ["vid"])
    clz = [
        f"z0 AS (SELECT vid, idx, ((h % {1 << (64 - p)}::UBIGINT) * {m}::UBIGINT"
        f" + {m - 1}::UBIGINT) AS probe, 0 AS rank FROM hh)"
    ]
    prev = "z0"
    for shift in (32, 16, 8, 4, 2, 1):
        nxt = f"z{shift}"
        lim = 1 << (64 - shift)
        clz.append(
            f"{nxt} AS (SELECT vid, idx,"
            f" CASE WHEN probe < {lim}::UBIGINT THEN probe * {1 << shift}::UBIGINT ELSE probe END AS probe,"
            f" rank + CASE WHEN probe < {lim}::UBIGINT THEN {shift} ELSE 0 END AS rank FROM {prev})"
        )
        prev = nxt
    rounds_sql, est_sql, sig_sql = [], [], []
    for t in range(rounds + 1):
        if t > 0:
            rounds_sql.append(
                f""",
rg{t} AS MATERIALIZED (
  SELECT vid, idx, MAX(r) AS r FROM (
    SELECT vid, idx, r FROM rg{t-1}
    UNION ALL
    SELECT und.v AS vid, q.idx, q.r FROM und JOIN rg{t-1} q ON und.u = q.vid
  ) GROUP BY vid, idx
)"""
            )
        est_sql.append(
            f""",
ev{t} AS (
  SELECT vid,
    {amm!r} / (SUM(pow(2.0, -r)) + CAST({m} - COUNT(*) AS DOUBLE)) AS est,
    {m} - COUNT(*) AS zeros
  FROM rg{t} GROUP BY vid
),
nt{t} AS (
  SELECT {t} AS t, SUM(
    CASE WHEN est <= {2.5 * m!r} AND zeros > 0
         THEN CAST({m} AS DOUBLE) * ln(GREATEST(CAST({m} AS DOUBLE) / GREATEST(zeros, 1), 1.0))
         ELSE est END) AS val
  FROM ev{t}
)"""
        )
        sig_sql.append(
            f"SELECT {t} AS t, COUNT(*) AS c, SUM(r) AS s FROM rg{t}"
        )
    nt_union = "\nUNION ALL\n".join(f"SELECT t, val FROM nt{t}" for t in range(rounds + 1))
    sig_union = "\nUNION ALL\n".join(sig_sql)
    return f"""WITH {_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und),
vx AS (SELECT vid, CAST(vid AS UBIGINT) AS x FROM verts){frag},
hh AS (SELECT vid, (h >> {64 - p}) AS idx, h FROM {last}),
{", ".join(clz)},
rg0 AS MATERIALIZED (SELECT vid, CAST(idx AS BIGINT) AS idx, rank + 1 AS r FROM {prev})
{"".join(rounds_sql)}{"".join(est_sql)},
sig AS ({sig_union}),
tmax AS (
  SELECT MIN(a.t) AS tm FROM sig a JOIN sig b ON a.t = b.t + 1
  WHERE a.c = b.c AND a.s = b.s
),
ntv AS (SELECT t, val FROM ({nt_union}) u, tmax WHERE t <= tm),
lastv AS (SELECT val AS vlast FROM ntv, tmax WHERE t = tm),
tgt AS (SELECT {quantile!r} * vlast AS target FROM lastv),
hit AS (SELECT MIN(t) AS th FROM ntv, tgt WHERE val >= target),
eff AS (
  SELECT CASE WHEN h.th = 0 THEN 0.0
    ELSE h.th - 1 + ((SELECT target FROM tgt) - pv.val) / GREATEST(cv.val - pv.val, 1e-30)
  END AS e
  FROM hit h
  JOIN ntv cv ON cv.t = h.th
  LEFT JOIN ntv pv ON pv.t = h.th - 1
)
SELECT CAST(n.t AS BIGINT) AS t, ROUND(n.val, 2) AS n_t_r2,
  ROUND((SELECT e FROM eff), 3) AS effective_diameter_r3
FROM ntv n"""


def msf_coocc_sql(rounds: int = 6) -> str:
    """Minimum spanning forest via unrolled Borůvka: per round each
    component's lexicographic-min crossing edge (w, a, b) is chosen,
    components merge to their min label through a recursive closure
    over the contracted chosen-edge graph. Under the total edge order
    the MSF is unique, so this replays pipelines/mst.py exactly; extra
    rounds past convergence choose nothing."""
    body = []
    for r in range(1, rounds + 1):
        p = f"c{r-1}"
        body.append(
            f""",
cand{r} AS (
  SELECT cu.c AS comp, undw.w,
    LEAST(undw.u, undw.v) AS a, GREATEST(undw.u, undw.v) AS b,
    ROW_NUMBER() OVER (PARTITION BY cu.c
      ORDER BY undw.w, LEAST(undw.u, undw.v), GREATEST(undw.u, undw.v)) AS rn
  FROM undw JOIN {p} cu ON undw.u = cu.vid JOIN {p} cv ON undw.v = cv.vid
  WHERE cu.c <> cv.c
),
chosen{r} AS MATERIALIZED (SELECT DISTINCT w, a, b FROM cand{r} WHERE rn = 1),
ceb{r} AS MATERIALIZED (
  SELECT ca.c AS x, cb.c AS y
  FROM chosen{r} ch JOIN {p} ca ON ch.a = ca.vid JOIN {p} cb ON ch.b = cb.vid
  UNION ALL
  SELECT cb.c, ca.c
  FROM chosen{r} ch JOIN {p} ca ON ch.a = ca.vid JOIN {p} cb ON ch.b = cb.vid
),
reach{r} AS (
  SELECT x AS node, x AS lab FROM ceb{r}
  UNION
  SELECT ceb.y AS node, rc.lab FROM reach{r} rc JOIN ceb{r} ceb ON rc.node = ceb.x
),
newlab{r} AS (SELECT node, MIN(lab) AS lab FROM reach{r} GROUP BY node),
c{r} AS MATERIALIZED (
  SELECT c.vid, COALESCE(n.lab, c.c) AS c FROM {p} c LEFT JOIN newlab{r} n ON c.c = n.node
)"""
        )
    allch = "\nUNION ALL\n".join(f"SELECT a, b, w FROM chosen{r}" for r in range(1, rounds + 1))
    return f"""WITH RECURSIVE prw AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         CAST(COUNT(DISTINCT a.l_orderkey) AS DOUBLE) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
undw AS MATERIALIZED (SELECT u, v, w FROM prw UNION ALL SELECT v AS u, u AS v, w FROM prw),
c0 AS MATERIALIZED (SELECT DISTINCT u AS vid, u AS c FROM undw){"".join(body)}
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, w FROM ({allch})"""


def multi_ppr_coocc_sql(seed_sets=((1, 2), (3, 4, 5), (6,)), k: int = 6, damping: float = 0.85) -> str:
    """d seeded PageRank recurrences over the co-occurrence graph,
    unrolled and UNION ALL'd with a set_id — the SQL view of the
    engine's single [n, d] vector-field run (no dangling terms: every
    co-occurrence vertex has degree ≥ 1)."""
    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        "deg AS MATERIALIZED (SELECT u AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM und GROUP BY u)",
    ]
    finals = []
    for j, seeds in enumerate(seed_sets):
        tw = 1.0 / len(seeds)
        seed_list = ", ".join(str(s) for s in seeds)
        parts.append(
            f",\ntp{j} AS (SELECT vid, CASE WHEN vid IN ({seed_list}) THEN {tw!r} ELSE 0.0 END AS t FROM verts)"
        )
        parts.append(f",\ns{j}r0 AS MATERIALIZED (SELECT vid, t AS r FROM tp{j})")
        for i in range(1, k + 1):
            p = f"s{j}r{i-1}"
            parts.append(
                f""",
s{j}m{i} AS (
  SELECT und.v AS vid, SUM(x.r / deg.d) AS m
  FROM und JOIN {p} x ON und.u = x.vid JOIN deg ON und.u = deg.vid
  GROUP BY und.v
),
s{j}r{i} AS MATERIALIZED (
  SELECT tp.vid, (1 - {damping}) * tp.t + {damping} * COALESCE(m.m, 0) AS r
  FROM tp{j} tp LEFT JOIN s{j}m{i} m ON tp.vid = m.vid
)"""
            )
        finals.append(
            f"SELECT CAST(vid AS BIGINT) AS vid, {j}::BIGINT AS set_id,"
            f" ROUND(r, 9) AS score_r9 FROM s{j}r{k}"
        )
    parts.append("\n" + "\nUNION ALL\n".join(finals))
    return "".join(parts)


MATVEC_COOCC = f"""WITH {_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und),
acc AS (
  SELECT und.v AS vid, SUM(CAST(p.p_retailprice AS DOUBLE)) AS s
  FROM und JOIN part p ON p.p_partkey = und.u
  GROUP BY und.v
)
SELECT CAST(v.vid AS BIGINT) AS vid, ROUND(COALESCE(a.s, 0), 6) AS value_r6
FROM verts v LEFT JOIN acc a ON v.vid = a.vid"""


def barycenter_coocc_sql(blur_t: float = 0.01, blur_steps: int = 3, n_iters: int = 3) -> str:
    """Unrolled convolutional barycenter (2 marginals, α = ½½): the
    exact Bregman loop of pipelines/diffusion.py, heat blurs as Euler
    CTE chains, bary = exp(½·ln hv_a + ½·ln hv_b)."""
    dt = blur_t / blur_steps
    eps = 1e-300

    def euler(tag: str, src: str) -> tuple[str, str]:
        out, prev = [], src
        for kk in range(1, blur_steps + 1):
            cur = f"{tag}e{kk}"
            out.append(
                f""",
nb_{cur} AS (
  SELECT und.v AS vid, SUM(x.a) AS sa, SUM(x.b) AS sb
  FROM und JOIN {prev} x ON und.u = x.vid GROUP BY und.v
),
{cur} AS MATERIALIZED (
  SELECT x.vid,
    x.a - {dt!r} * (deg.d * x.a - COALESCE(nb.sa, 0)) AS a,
    x.b - {dt!r} * (deg.d * x.b - COALESCE(nb.sb, 0)) AS b
  FROM {prev} x JOIN deg ON x.vid = deg.vid
  LEFT JOIN nb_{cur} nb ON x.vid = nb.vid
)"""
            )
            prev = cur
        return "".join(out), prev

    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        "deg AS MATERIALIZED (SELECT u AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM und GROUP BY u),",
        "tot AS (SELECT SUM(CAST(p_retailprice AS DOUBLE)) AS sp, SUM(CAST(p_size AS DOUBLE)) AS ss FROM part),",
        """mu AS MATERIALIZED (
  SELECT v.vid,
    CAST(p.p_retailprice AS DOUBLE) / (SELECT sp FROM tot) AS ma,
    CAST(p.p_size AS DOUBLE) / (SELECT ss FROM tot) AS mb
  FROM verts v JOIN part p ON p.p_partkey = v.vid
)""",
        ",\nw0 AS MATERIALIZED (SELECT vid, 1.0 AS a, 1.0 AS b FROM verts)",
    ]
    w_cur = "w0"
    bary_cur = None
    for it in range(n_iters):
        frag, hw = euler(f"bhw{it}", w_cur)
        parts.append(frag)
        v_cur = f"bv{it}"
        parts.append(
            f""",
{v_cur} AS MATERIALIZED (
  SELECT mu.vid, mu.ma / GREATEST(h.a, {eps!r}) AS a, mu.mb / GREATEST(h.b, {eps!r}) AS b
  FROM mu JOIN {hw} h ON mu.vid = h.vid
)"""
        )
        frag, hv = euler(f"bhv{it}", v_cur)
        parts.append(frag)
        bary_cur = f"bb{it}"
        parts.append(
            f""",
{bary_cur} AS MATERIALIZED (
  SELECT h.vid,
    exp(ln(GREATEST(h.a, {eps!r})) * 0.5 + ln(GREATEST(h.b, {eps!r})) * 0.5) AS bary,
    h.a AS hva, h.b AS hvb
  FROM {hv} h
)"""
        )
        w_next = f"w{it + 1}"
        parts.append(
            f""",
{w_next} AS MATERIALIZED (
  SELECT w.vid,
    w.a * bb.bary / GREATEST(bb.hva, {eps!r}) AS a,
    w.b * bb.bary / GREATEST(bb.hvb, {eps!r}) AS b
  FROM {w_cur} w JOIN {bary_cur} bb ON w.vid = bb.vid
)"""
        )
        w_cur = w_next
    parts.append(
        f"""
SELECT CAST(bb.vid AS BIGINT) AS vid,
  ROUND(bb.bary * (SELECT COUNT(*) FROM verts), 6) AS barycenter_r6
FROM {bary_cur} bb"""
    )
    return "".join(parts)


def dsd_pairs_coocc_sql(queries=(1, 2, 3, 4), n_rw: int = 3) -> str:
    """Diffusion State Distance for a bounded query set: unrolled walk
    powers c_q = Σ_{i=0..nRw} e_qᵀPⁱ per query, then pairwise L1 —
    mirrors pipelines/walks.diffusion_state_distance_pairs."""
    qs = list(queries)
    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        "deg AS MATERIALIZED (SELECT u AS vid, CAST(COUNT(*) AS DOUBLE) AS d FROM und GROUP BY u)",
    ]
    for q in qs:
        parts.append(
            f",\nr{q}_0 AS MATERIALIZED (SELECT vid, CASE WHEN vid = {q} THEN 1.0 ELSE 0.0 END AS r FROM verts)"
        )
        for i in range(1, n_rw + 1):
            p = f"r{q}_{i-1}"
            parts.append(
                f""",
r{q}_{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.r, 0) AS r FROM verts v LEFT JOIN (
    SELECT und.v AS vid, SUM(x.r / deg.d) AS r
    FROM und JOIN {p} x ON und.u = x.vid JOIN deg ON und.u = deg.vid
    GROUP BY und.v
  ) s ON v.vid = s.vid
)"""
            )
        acc_terms = " + ".join(f"t{i}.r" for i in range(n_rw + 1))
        joins = " ".join(
            f"JOIN r{q}_{i} t{i} ON t0.vid = t{i}.vid" for i in range(1, n_rw + 1)
        )
        parts.append(
            f",\nacc{q} AS MATERIALIZED (SELECT t0.vid, {acc_terms} AS c FROM r{q}_0 t0 {joins})"
        )
    pair_sql = []
    for x in range(len(qs)):
        for y in range(x + 1, len(qs)):
            a, b = qs[x], qs[y]
            pair_sql.append(
                f"""SELECT {a}::BIGINT AS qa, {b}::BIGINT AS qb,
  ROUND(SUM(ABS(pa.c - pb.c)), 9) AS dsd_r9
FROM acc{a} pa JOIN acc{b} pb ON pa.vid = pb.vid"""
            )
    parts.append("\n" + "\nUNION ALL\n".join(pair_sql))
    return "".join(parts)


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


def corpus_splits_sql(seed: int = 42) -> str:
    """Replays functions/splits.py exactly: splitmix64(doc_id ⊕ seed)
    compared against the SAME Python-computed integer thresholds
    (inlined as literals — no float boundary recomputation in SQL)."""
    from ..functions.splits import DEFAULT_FRACTIONS, split_thresholds

    thresholds = split_thresholds(DEFAULT_FRACTIONS)
    frag, cte, hcol = sm64_stages("spl_in", "x", "spl", ["doc_id"])
    cases = " ".join(
        f"WHEN {hcol} < {t}::UBIGINT THEN '{name}'"
        for name, t in thresholds[:-1]
    )
    return f"""WITH spl_in AS (
  SELECT doc_id, xor(CAST(doc_id AS UBIGINT), {seed}::UBIGINT) AS x FROM documents
){frag}
SELECT doc_id, CASE {cases} ELSE '{thresholds[-1][0]}' END AS split FROM {cte}"""


TOKEN_SHARDS = """SELECT doc_id,
  CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 50000 AS BIGINT) AS bin
FROM documents"""


# ---- corpus term statistics (round 3) -----------------------------------

def tfidf_topk_sql(k: int = 5) -> str:
    """TF-IDF top-k terms per document; same \\S+ tokenizer as the
    fingerprint oracle, score = tf · ln(n_docs/df) on IEEE doubles
    (the proven exp/ln parity pattern), ROUND r6, ties (score desc,
    tok asc) — equal (tf, df) pairs are bit-equal on both sides."""
    return f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * ln((SELECT n FROM n) / CAST(df.df AS DOUBLE)) AS score
  FROM tf JOIN df USING (tok)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rk
  FROM scored
)
SELECT doc_id, tok, tf, df, ROUND(score, 6) AS tfidf_r6 FROM ranked WHERE rk <= {k}"""


def bigram_pmi_sql(min_count: int = 3, top_n: int = 50) -> str:
    """Adjacent-token bigram PMI collocations; selection and ordering
    on the ROUNDED pmi (r6) so the engine's sort+limit matches."""
    return f"""WITH tk AS (
  SELECT regexp_extract_all(text, '\\S+') AS toks FROM documents
), bg AS (
  SELECT split_part(p, chr(1), 1) AS a, split_part(p, chr(1), 2) AS b
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                  i -> toks[i] || chr(1) || toks[i + 1])) AS p
    FROM tk
  )
), pairs AS (
  SELECT a, b, count(*)::BIGINT AS c_ab FROM bg GROUP BY a, b
), tot AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS bt FROM pairs),
ca AS (SELECT a, SUM(c_ab)::BIGINT AS c_a FROM pairs GROUP BY a),
cb AS (SELECT b, SUM(c_ab)::BIGINT AS c_b FROM pairs GROUP BY b),
scored AS (
  SELECT p.a, p.b, p.c_ab,
         ROUND(ln(CAST(p.c_ab AS DOUBLE) * (SELECT bt FROM tot)
                  / (CAST(ca.c_a AS DOUBLE) * CAST(cb.c_b AS DOUBLE))), 6) AS pmi_r6
  FROM pairs p JOIN ca USING (a) JOIN cb USING (b)
  WHERE p.c_ab >= {min_count}
)
SELECT a, b, c_ab, pmi_r6 FROM scored
ORDER BY pmi_r6 DESC, a ASC, b ASC LIMIT {top_n}"""


# ---- graph summary statistics (round 3) ---------------------------------

ASSORTATIVITY_COOCC = f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
slots AS (SELECT CAST(du.d AS DOUBLE) AS x, CAST(dv.d AS DOUBLE) AS y
          FROM und JOIN deg du ON und.u = du.vid JOIN deg dv ON und.v = dv.vid),
s AS (SELECT CAST(count(*) AS DOUBLE) AS m, SUM(x) AS sx, SUM(x*x) AS sxx, SUM(x*y) AS sxy FROM slots)
SELECT CAST(m AS BIGINT) AS m_slots, CAST(sx AS BIGINT) AS s_x,
  CAST(sxx AS BIGINT) AS s_xx, CAST(sxy AS BIGINT) AS s_xy,
  ROUND((sxy/m - (sx/m)*(sx/m)) / (sxx/m - (sx/m)*(sx/m)), 6) AS assortativity_r6
FROM s"""


def modularity_coocc_sql(rounds: int = 8) -> str:
    """Per-community Newman modularity over the SAME unrolled seeded
    label propagation the label_prop_coocc oracle replays."""
    lp = label_prop_coocc_sql(rounds=rounds)
    # outer CTE names must not collide with the nested label-prop
    # statement's pr/und (DuckDB rejects duplicate aliases)
    return f"""WITH labels AS MATERIALIZED (SELECT * FROM ({lp}) t),
mpr AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
mund AS MATERIALIZED (SELECT u, v FROM mpr UNION ALL SELECT v AS u, u AS v FROM mpr),
m2 AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM mund),
ds AS (SELECT l.label AS label, count(*)::BIGINT AS deg_sum
       FROM mund JOIN labels l ON mund.u = l.vid GROUP BY 1),
intra AS (SELECT lu.label AS label, count(*)::BIGINT AS intra_slots
          FROM mund JOIN labels lu ON mund.u = lu.vid JOIN labels lv ON mund.v = lv.vid
          WHERE lu.label = lv.label GROUP BY 1)
SELECT ds.label, COALESCE(intra.intra_slots, 0) AS intra_slots, ds.deg_sum,
  ROUND(CAST(COALESCE(intra.intra_slots, 0) AS DOUBLE) / (SELECT m FROM m2)
        - (CAST(ds.deg_sum AS DOUBLE) / (SELECT m FROM m2))
          * (CAST(ds.deg_sum AS DOUBLE) / (SELECT m FROM m2)), 6) AS q_r6
FROM ds LEFT JOIN intra ON ds.label = intra.label"""


def adamic_adar_coocc_sql(k: int = 100) -> str:
    """Top-k non-adjacent pairs by Adamic-Adar via the wedge self-join;
    selection/order on the rounded aa_r6 with (u, v) tie-break."""
    return f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
wedge AS (
  SELECT e1.v AS u, e2.v AS w, e1.u AS a
  FROM und e1 JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
),
aa AS (
  SELECT u, w, count(*)::BIGINT AS cn, SUM(1.0 / ln(CAST(d.d AS DOUBLE))) AS s
  FROM wedge JOIN deg d ON wedge.a = d.vid
  GROUP BY u, w
),
cand AS (
  SELECT aa.u, aa.w, aa.cn, ROUND(aa.s, 6) AS aa_r6 FROM aa
  WHERE NOT EXISTS (SELECT 1 FROM pr WHERE pr.u = aa.u AND pr.v = aa.w)
)
SELECT CAST(u AS BIGINT) AS u, CAST(w AS BIGINT) AS v, cn, aa_r6
FROM cand ORDER BY aa_r6 DESC, u, v LIMIT {k}"""


ORDERS_EVENTS_RANGE_JOIN = """SELECT o.o_orderkey,
  count(e.user_id)::BIGINT AS n_events,
  COALESCE(SUM(CAST(floor(e.value * 100) AS BIGINT)), 0)::BIGINT AS cents_sum
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey"""


def ktruss_coocc_sql(k: int = 4, rounds: int = 2) -> str:
    """Unrolled fixed-round k-truss peeling over the co-occurrence
    graph (mirrors pipelines/truss.py: per-round per-edge triangle
    support on the current edge set, drop support < k-2, report the
    last round's support for survivors)."""
    min_sup = k - 2
    parts = [f"WITH {_COOCC_UND_MAT},\ne0 AS MATERIALIZED (SELECT u, v FROM pr)"]
    for r in range(rounds):
        parts.append(f""",
tri{r} AS MATERIALIZED (
  SELECT x1.u AS a, x1.v AS b, x2.v AS c
  FROM e{r} x1 JOIN e{r} x2 ON x2.u = x1.u AND x1.v < x2.v
  JOIN e{r} x3 ON x3.u = x1.v AND x3.v = x2.v
),
s{r} AS MATERIALIZED (
  SELECT e.u, e.v, COALESCE(t.cnt, 0) AS support FROM e{r} e LEFT JOIN (
    SELECT u, v, count(*)::BIGINT AS cnt FROM (
      SELECT a AS u, b AS v FROM tri{r} UNION ALL
      SELECT a, c FROM tri{r} UNION ALL
      SELECT b, c FROM tri{r}
    ) GROUP BY u, v) t ON t.u = e.u AND t.v = e.v
),
e{r + 1} AS MATERIALIZED (SELECT u, v FROM s{r} WHERE support >= {min_sup})""")
    parts.append(
        f"\nSELECT u::BIGINT AS u, v::BIGINT AS v, support::BIGINT AS support\n"
        f"FROM s{rounds - 1} WHERE support >= {min_sup}"
    )
    return "".join(parts)


BUTTERFLIES_PARTSUPP = """WITH e AS MATERIALIZED (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
),
w AS (
  SELECT a.p AS p1, b.p AS p2, count(*)::BIGINT AS c
  FROM e a JOIN e b ON a.s = b.s AND a.p < b.p GROUP BY a.p, b.p
),
bf AS (SELECT p1, p2, CAST(c*(c-1)/2 AS BIGINT) AS b FROM w WHERE c >= 2)
SELECT p::BIGINT AS l_partkey, SUM(b)::BIGINT AS butterflies FROM (
  SELECT p1 AS p, b FROM bf UNION ALL SELECT p2, b FROM bf) GROUP BY p"""


REPETITION_SCORES = """WITH tk AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
tok_counts AS (
  SELECT doc_id, t, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(toks) AS t FROM tk) GROUP BY doc_id, t
),
tok_stats AS (
  SELECT doc_id, SUM(c)::BIGINT AS tot, COUNT(*)::BIGINT AS dt, MAX(c)::BIGINT AS mc
  FROM tok_counts GROUP BY doc_id
),
bg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> toks[i] || chr(1) || toks[i + 1])) AS p
  FROM tk
),
bg_counts AS (SELECT doc_id, p, count(*)::BIGINT AS c FROM bg GROUP BY doc_id, p),
bg_stats AS (SELECT doc_id, SUM(c)::BIGINT AS bt, MAX(c)::BIGINT AS bm FROM bg_counts GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(ts.tot, 0)::BIGINT AS n_tokens,
  CASE WHEN COALESCE(ts.tot, 0) = 0 THEN 0.0
       ELSE 1.0 - CAST(ts.dt AS DOUBLE) / CAST(ts.tot AS DOUBLE) END AS dup_token_frac,
  CASE WHEN COALESCE(ts.tot, 0) = 0 THEN 0.0
       ELSE CAST(ts.mc AS DOUBLE) / CAST(ts.tot AS DOUBLE) END AS top_token_frac,
  CASE WHEN COALESCE(bs.bt, 0) = 0 THEN 0.0
       ELSE CAST(bs.bm AS DOUBLE) / CAST(bs.bt AS DOUBLE) END AS top_bigram_frac
FROM documents d LEFT JOIN tok_stats ts USING (doc_id) LEFT JOIN bg_stats bs USING (doc_id)"""


def stratified_sample_sql(seed: int | None = None) -> str:
    """Replays functions/splits.py:stratified_sample_summary — the SAME
    Python-computed integer thresholds inlined as literals."""
    from ..config import HASH_SEED
    from ..functions.splits import strata_thresholds

    if seed is None:
        seed = HASH_SEED
    thr_map, thr_other = strata_thresholds()
    frag, cte, hcol = sm64_stages("ss_in", "x", "ss", ["doc_id", "lang"])
    cases = " ".join(
        f"WHEN lang = '{name}' THEN {t}::UBIGINT" for name, t in thr_map.items()
    )
    return f"""WITH ss_in AS (
  SELECT doc_id, lang, xor(CAST(doc_id AS UBIGINT), {seed}::UBIGINT) AS x FROM documents
){frag},
kept AS (
  SELECT lang, doc_id,
    CASE WHEN {hcol} < (CASE {cases} ELSE {thr_other}::UBIGINT END) THEN 1 ELSE 0 END AS k
  FROM {cte}
)
SELECT lang, count(*)::BIGINT AS n_total, SUM(k)::BIGINT AS n_sampled,
  SUM(doc_id * k)::BIGINT AS id_checksum
FROM kept GROUP BY lang"""


def node2vec_coocc_sql(
    walk_len: int = 6,
    seed: int = 7,
    wb: int = 2,
    wc: int = 4,
    wf: int = 1,
) -> str:
    """node2vec biased walks replayed in SQL: hop 1 is the uniform
    index hop; hops ≥2 weight each candidate (back {wb} : common {wc} :
    far {wf}, integer), take r = h mod Σw and pick the first candidate
    whose cumulative weight (ordered by neighbor id — the CSR order)
    exceeds r."""
    sm0 = sm64_py(0)
    frag0, last0, _ = sm64_stages("vx", "x", "wid", ["start"])
    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        "deg AS MATERIALIZED (SELECT u AS vid, COUNT(*) AS d FROM und GROUP BY u),",
        "adj AS MATERIALIZED (SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS idx FROM und),",
        f"vx AS (SELECT vid AS start, xor(CAST(vid AS UBIGINT), {sm0}::UBIGINT) AS x FROM verts)",
        frag0,
        f",\nw0 AS MATERIALIZED (SELECT start, h AS wid, CAST(start AS UBIGINT) AS prev, CAST(start AS UBIGINT) AS cur FROM {last0})",
    ]
    hops: list[str] = []
    for t in range(1, walk_len):
        smt = sm64_py(t)
        hc = (", ".join(hops) + ", ") if hops else ""
        parts.append(
            f""",
sx{t} AS (SELECT {hc}start, wid, prev, cur, xor(xor(wid, {smt}::UBIGINT), {seed}::UBIGINT) AS x FROM w{t-1})"""
        )
        frag, last, _ = sm64_stages(f"sx{t}", "x", f"st{t}", ["start", "wid", "prev", "cur"] + hops)
        parts.append(frag)
        if t == 1:
            parts.append(
                f""",
w{t} AS MATERIALIZED (
  SELECT t.start, t.wid, t.cur AS prev, CAST(adj.v AS UBIGINT) AS cur, adj.v AS v{t}
  FROM {last} t
  JOIN deg ON deg.vid = CAST(t.cur AS BIGINT)
  JOIN adj ON adj.u = CAST(t.cur AS BIGINT)
         AND adj.idx = CAST(t.h % CAST(deg.d AS UBIGINT) AS BIGINT)
)"""
            )
        else:
            parts.append(
                f""",
cand{t} AS (
  SELECT {hc}t.start, t.wid, t.prev, t.cur, t.h, adj.v AS cand,
    CASE WHEN CAST(adj.v AS UBIGINT) = t.prev THEN {wb}
         WHEN e2.u IS NOT NULL THEN {wc} ELSE {wf} END AS w
  FROM {last} t
  JOIN adj ON adj.u = CAST(t.cur AS BIGINT)
  LEFT JOIN adj e2 ON e2.u = CAST(t.prev AS BIGINT) AND e2.v = adj.v
),
cw{t} AS (
  SELECT *, SUM(w) OVER (PARTITION BY wid ORDER BY cand
                          ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY wid) AS tot
  FROM cand{t}
),
w{t} AS MATERIALIZED (
  SELECT {hc}start, wid, cur AS prev, CAST(cand AS UBIGINT) AS cur, cand AS v{t}
  FROM cw{t}
  WHERE cw > CAST(h % CAST(tot AS UBIGINT) AS BIGINT)
    AND cw - w <= CAST(h % CAST(tot AS UBIGINT) AS BIGINT)
)"""
            )
        hops.append(f"v{t}")
    sel = ", ".join(f"CAST(v{t} AS BIGINT) AS v{t}" for t in range(1, walk_len))
    parts.append(f"\nSELECT CAST(start AS BIGINT) AS start, {sel} FROM w{walk_len-1}")
    return "".join(parts)


def weighted_walk_coocc_sql(walk_len: int = 6, seed: int = 7) -> str:
    """Weighted DeepWalk replay: hop t picks the first CSR-ordered
    neighbor whose cumulative integer edge weight exceeds
    splitmix64(walk_id ⊕ mix(t) ⊕ seed) mod Σw."""
    sm0 = sm64_py(0)
    frag0, last0, _ = sm64_stages("vx", "x", "wid", ["start"])
    parts = [
        """WITH pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, a.l_orderkey AS o
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2, 3
),
ew AS (SELECT u, v, COUNT(*)::BIGINT AS wi FROM pairs GROUP BY 1, 2),
adjw AS MATERIALIZED (
  SELECT u, v, wi FROM ew UNION ALL SELECT v AS u, u AS v, wi FROM ew
),
verts AS (SELECT DISTINCT u AS vid FROM adjw),""",
        f"vx AS (SELECT vid AS start, xor(CAST(vid AS UBIGINT), {sm0}::UBIGINT) AS x FROM verts)",
        frag0,
        f",\nw0 AS MATERIALIZED (SELECT start, h AS wid, CAST(start AS UBIGINT) AS cur FROM {last0})",
    ]
    hops: list[str] = []
    for t in range(1, walk_len):
        smt = sm64_py(t)
        hc = (", ".join(hops) + ", ") if hops else ""
        parts.append(
            f""",
sx{t} AS (SELECT {hc}start, wid, cur, xor(xor(wid, {smt}::UBIGINT), {seed}::UBIGINT) AS x FROM w{t-1})"""
        )
        frag, last, _ = sm64_stages(f"sx{t}", "x", f"st{t}", ["start", "wid", "cur"] + hops)
        parts.append(frag)
        parts.append(
            f""",
cw{t} AS (
  SELECT {hc}t.start, t.wid, t.h, adjw.v AS cand, adjw.wi,
    SUM(adjw.wi) OVER (PARTITION BY t.wid ORDER BY adjw.v
                       ROWS UNBOUNDED PRECEDING) AS cw,
    SUM(adjw.wi) OVER (PARTITION BY t.wid) AS tot
  FROM {last} t JOIN adjw ON adjw.u = CAST(t.cur AS BIGINT)
),
w{t} AS MATERIALIZED (
  SELECT {hc}start, wid, CAST(cand AS UBIGINT) AS cur, cand AS v{t}
  FROM cw{t}
  WHERE cw > CAST(h % CAST(tot AS UBIGINT) AS BIGINT)
    AND cw - wi <= CAST(h % CAST(tot AS UBIGINT) AS BIGINT)
)"""
        )
        hops.append(f"v{t}")
    sel = ", ".join(f"CAST(v{t} AS BIGINT) AS v{t}" for t in range(1, walk_len))
    parts.append(f"\nSELECT CAST(start AS BIGINT) AS start, {sel} FROM w{walk_len-1}")
    return "".join(parts)


def basket_lift_sql(min_support: int = 3, k: int = 50) -> str:
    """Market-basket lift replay: n_uv·N / (n_u·n_v) over distinct
    (order, part) incidences, same float association order as the
    engine, ROUND r6, ties (u, v)."""
    return f"""WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
n AS (SELECT COUNT(DISTINCT o)::BIGINT AS n FROM op),
iu AS MATERIALIZED (SELECT p, COUNT(*)::BIGINT AS c FROM op GROUP BY p),
pv AS (
  SELECT a.p AS u, b.p AS v, COUNT(*)::BIGINT AS n_uv
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
)
SELECT pv.u::BIGINT AS u, pv.v::BIGINT AS v, pv.n_uv,
  ROUND((CAST(pv.n_uv AS DOUBLE) * (SELECT n FROM n))
        / (CAST(cu.c AS DOUBLE) * CAST(cv.c AS DOUBLE)), 6) AS lift_r6
FROM pv JOIN iu cu ON cu.p = pv.u JOIN iu cv ON cv.p = pv.v
WHERE pv.n_uv >= {min_support}
ORDER BY lift_r6 DESC, u, v LIMIT {k}"""


SHIP_LATENCY_PERCENTILES = """WITH j AS MATERIALIZED (
  SELECT o.o_orderpriority,
    (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, CAST(0.5 AS DOUBLE) AS q,
  CAST(quantile_disc(d, 0.5) AS BIGINT) AS value FROM j GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, CAST(0.9 AS DOUBLE) AS q,
  CAST(quantile_disc(d, 0.9) AS BIGINT) AS value FROM j GROUP BY o_orderpriority
UNION ALL
SELECT o_orderpriority, CAST(0.99 AS DOUBLE) AS q,
  CAST(quantile_disc(d, 0.99) AS BIGINT) AS value FROM j GROUP BY o_orderpriority"""


def frequent_triples_sql(k: int = 30) -> str:
    """Top-k 3-itemsets by shared-order support, ties (a, b, c)."""
    return f"""WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
)
SELECT a.p::BIGINT AS a, b.p::BIGINT AS b, c.p::BIGINT AS c,
  COUNT(*)::BIGINT AS support
FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          JOIN op c ON b.o = c.o AND b.p < c.p
GROUP BY 1, 2, 3
ORDER BY support DESC, a, b, c LIMIT {k}"""


LOCAL_BRIDGES_COOCC = f"""WITH {_COOCC_UND_MAT}
SELECT pr.u::BIGINT AS u, pr.v::BIGINT AS v
FROM pr
WHERE NOT EXISTS (
  SELECT 1 FROM und e1 JOIN und e2 ON e1.v = e2.v
  WHERE e1.u = pr.u AND e2.u = pr.v
)"""


def richclub_coocc_sql(ks=(2, 4, 8, 16)) -> str:
    """Rich-club φ(k): rich-vertex count, rich-edge count (u < v pairs
    with both degrees > k) and the single rounded density division."""
    kvals = ", ".join(f"({k})" for k in ks)
    return f"""WITH {_COOCC_UND_MAT},
deg AS MATERIALIZED (SELECT u AS vid, COUNT(*)::BIGINT AS d FROM und GROUP BY u),
ks(k) AS (VALUES {kvals}),
nk AS (SELECT ks.k, COUNT(deg.vid)::BIGINT AS n_k
       FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY ks.k),
ek AS (
  SELECT ks.k, COUNT(*)::BIGINT AS e_k
  FROM pr JOIN deg du ON du.vid = pr.u JOIN deg dv ON dv.vid = pr.v, ks
  WHERE du.d > ks.k AND dv.d > ks.k
  GROUP BY ks.k
)
SELECT nk.k::BIGINT AS k, nk.n_k, COALESCE(ek.e_k, 0)::BIGINT AS e_k,
  ROUND(CASE WHEN nk.n_k > 1
    THEN 2.0 * COALESCE(ek.e_k, 0) / (CAST(nk.n_k AS DOUBLE) * (nk.n_k - 1.0))
    ELSE 0.0 END, 9) AS phi_r9
FROM nk LEFT JOIN ek ON nk.k = ek.k"""


def negative_sample_coocc_sql(m: int = 1024, seed: int = 13, P: int = 16) -> str:
    """Replays pipelines/walk_corpus.negative_sample_table: draw i →
    vertex owning position splitmix64(i ⊕ seed) mod Σdeg in the
    (part = vid mod P, vid) cumulative-degree order."""
    frag, cte, hcol = sm64_stages("dr_in", "x", "ns", ["i"])
    return f"""WITH {_COOCC_UND_MAT},
deg AS MATERIALIZED (SELECT u AS vid, COUNT(*)::BIGINT AS d FROM und GROUP BY u),
cum AS MATERIALIZED (
  SELECT vid, d, SUM(d) OVER (ORDER BY CAST(vid AS UBIGINT) % {P}, vid
                              ROWS UNBOUNDED PRECEDING) AS cw
  FROM deg
),
tot AS (SELECT CAST(SUM(d) AS UBIGINT) AS t FROM deg),
dr_in AS (
  SELECT i, xor(CAST(i AS UBIGINT), {seed}::UBIGINT) AS x
  FROM (SELECT unnest(generate_series(0, {m - 1})) AS i)
){frag},
draws AS (SELECT i, CAST({hcol} % (SELECT t FROM tot) AS BIGINT) AS r FROM {cte})
SELECT d.i::BIGINT AS i, c.vid::BIGINT AS vid
FROM draws d JOIN cum c ON c.cw > d.r AND c.cw - c.d <= d.r"""


def katz_coocc_sql(k: int = 4) -> str:
    """Truncated Katz with α = 1/64: the unrolled recurrence
    x_i = 1 + (Σ_in x_{i-1}) / 64 — dyadic-exact, no rounding."""
    parts = [
        f"""WITH {_COOCC_UND_MAT},
verts AS (SELECT DISTINCT u AS vid FROM und),
x0 AS (SELECT vid, 1.0 AS x FROM verts)"""
    ]
    for i in range(1, k + 1):
        p = f"x{i-1}"
        parts.append(
            f""",
s{i} AS (SELECT und.v AS vid, SUM({p}.x) AS m FROM und JOIN {p} ON und.u = {p}.vid GROUP BY und.v),
x{i} AS MATERIALIZED (
  SELECT v.vid, 1.0 + COALESCE(s{i}.m, 0) / 64 AS x
  FROM verts v LEFT JOIN s{i} ON v.vid = s{i}.vid
)"""
        )
    parts.append(f"\nSELECT vid::BIGINT AS vid, x AS katz FROM x{k}")
    return "".join(parts)


def quality_resample_sql(temperature: int = 3, seed: int | None = None) -> str:
    """Replays functions/splits.quality_temperature_resample: copies =
    tot//10^6 + [h < (tot%10^6 · 2^64)//10^6], tot = ⌊quality·10^6⌋·T,
    h = splitmix64(doc_id ⊕ seed) — exact integers on both sides."""
    from ..config import HASH_SEED

    if seed is None:
        seed = HASH_SEED
    T = int(temperature)
    frag, cte, hcol = sm64_stages("rs_in", "x", "rs", ["doc_id"])
    return f"""WITH {_QUALITY_RATIOS},
rs_in AS (
  SELECT doc_id, xor(CAST(doc_id AS UBIGINT), {seed}::UBIGINT) AS x FROM documents
){frag},
qp AS (
  SELECT doc_id, CAST(FLOOR(quality * 1000000.0) AS BIGINT) * {T} AS tot FROM q
),
cp AS (
  SELECT qp.doc_id, d.lang,
    tot // 1000000 + CASE WHEN CAST(h.{hcol} AS HUGEINT) <
      (CAST(tot % 1000000 AS HUGEINT) * 18446744073709551616::HUGEINT) // 1000000
      THEN 1 ELSE 0 END AS copies
  FROM qp JOIN {cte} h USING (doc_id) JOIN documents d USING (doc_id)
)
SELECT lang, COUNT(*)::BIGINT AS n_docs, SUM(copies)::BIGINT AS n_copies,
  SUM(doc_id * copies)::BIGINT AS id_checksum
FROM cp GROUP BY lang"""


def closeness_coocc_sql(rounds: int = 8, seeds=(1, 2, 3, 4)) -> str:
    """Unrolled BFS per seed over the co-occurrence graph; closeness =
    n_reached / sum_hops as the same single IEEE division the engine
    emits."""
    sent = 1 << 40
    chains = []
    selects = []
    for s in seeds:
        chains.append(f""",
c{s}_d0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = {s} THEN 0 ELSE {sent} END AS dist
  FROM (SELECT DISTINCT u AS vid FROM und)
)""")
        for i in range(1, rounds + 1):
            p = f"c{s}_d{i-1}"
            chains.append(f""",
c{s}_rx{i} AS (
  SELECT und.v AS vid, MIN(dp.dist + 1) AS m
  FROM und JOIN {p} dp ON und.u = dp.vid WHERE dp.dist < {sent}
  GROUP BY und.v
),
c{s}_d{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.dist, COALESCE(r.m, {sent})) AS dist
  FROM {p} d LEFT JOIN c{s}_rx{i} r ON d.vid = r.vid
)""")
        selects.append(
            f"""SELECT {s}::BIGINT AS seed, count(*)::BIGINT AS n_reached,
  SUM(dist)::BIGINT AS sum_hops,
  CAST(count(*) AS DOUBLE) / CAST(SUM(dist) AS DOUBLE) AS closeness
FROM c{s}_d{rounds} WHERE dist < {sent} AND vid <> {s}"""
        )
    return (
        f"WITH {_COOCC_UND_MAT}" + "".join(chains) + "\n"
        + "\nUNION ALL\n".join(selects)
    )


def landmark_dist_coocc_sql(
    rounds: int = 8,
    landmarks=(1, 2, 3, 4),
    pairs=((5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16), (5, 16), (6, 15)),
) -> str:
    """Replays relational.q_landmark_dist_coocc: unrolled BFS per
    landmark (the closeness chains), then per query pair the
    triangle-inequality bounds over landmarks reaching both ends —
    pure integer MIN/MAX/ABS, bit-exact. Pairs no landmark covers emit
    −1 (COALESCE of an empty group)."""
    sent = 1 << 40
    chains = []
    dl_selects = []
    for s in landmarks:
        chains.append(f""",
c{s}_d0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = {s} THEN 0 ELSE {sent} END AS dist
  FROM (SELECT DISTINCT u AS vid FROM und)
)""")
        for i in range(1, rounds + 1):
            p = f"c{s}_d{i-1}"
            chains.append(f""",
c{s}_rx{i} AS (
  SELECT und.v AS vid, MIN(dp.dist + 1) AS m
  FROM und JOIN {p} dp ON und.u = dp.vid WHERE dp.dist < {sent}
  GROUP BY und.v
),
c{s}_d{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.dist, COALESCE(r.m, {sent})) AS dist
  FROM {p} d LEFT JOIN c{s}_rx{i} r ON d.vid = r.vid
)""")
        dl_selects.append(
            f"SELECT {s} AS lm, vid, dist FROM c{s}_d{rounds} WHERE dist < {sent}"
        )
    pair_rows = ", ".join(f"({u}, {v})" for u, v in pairs)
    return (
        f"WITH {_COOCC_UND_MAT}"
        + "".join(chains)
        + f""",
dl AS MATERIALIZED ({' UNION ALL '.join(dl_selects)}),
qp(u, v) AS (VALUES {pair_rows}),
est AS (
  SELECT qp.u, qp.v,
    MAX(ABS(du.dist - dv.dist))::BIGINT AS lb,
    MIN(du.dist + dv.dist)::BIGINT AS ub
  FROM qp
  JOIN dl du ON du.vid = qp.u
  JOIN dl dv ON dv.vid = qp.v AND dv.lm = du.lm
  GROUP BY qp.u, qp.v
)
SELECT qp.u::BIGINT AS u, qp.v::BIGINT AS v,
  COALESCE(e.lb, -1)::BIGINT AS d_lb, COALESCE(e.ub, -1)::BIGINT AS d_ub
FROM qp LEFT JOIN est e ON e.u = qp.u AND e.v = qp.v"""
    )


DEGREE_HISTOGRAM_COOCC = f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u)
SELECT (length(printf('%b', d)) - 1)::BIGINT AS bin,
  count(*)::BIGINT AS n_vertices, MIN(d)::BIGINT AS min_deg,
  MAX(d)::BIGINT AS max_deg, SUM(d)::BIGINT AS sum_deg
FROM deg GROUP BY 1"""


def jaccard_coocc_sql(k: int = 100) -> str:
    """Top-k non-adjacent pairs by neighborhood Jaccard via the wedge
    self-join; the score is the raw integer-quotient double, so no
    rounding is involved anywhere."""
    return f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
wedge AS (
  SELECT e1.v AS u, e2.v AS w
  FROM und e1 JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
),
cnq AS (SELECT u, w, count(*)::BIGINT AS cn FROM wedge GROUP BY u, w),
cand AS (
  SELECT c.u, c.w, c.cn,
    CAST(c.cn AS DOUBLE) / CAST(du.d + dw.d - c.cn AS DOUBLE) AS jaccard
  FROM cnq c JOIN deg du ON c.u = du.vid JOIN deg dw ON c.w = dw.vid
  WHERE NOT EXISTS (SELECT 1 FROM pr WHERE pr.u = c.u AND pr.v = c.w)
)
SELECT CAST(u AS BIGINT) AS u, CAST(w AS BIGINT) AS v, cn, jaccard
FROM cand ORDER BY jaccard DESC, u, v LIMIT {k}"""


def _coocc_dir_edges() -> str:
    """CTE prefix building the hash-oriented directed co-occurrence
    edge set ``dir`` (s, d) and its vertex universe ``verts`` (mirrors
    relational.directed_coocc_edges exactly)."""
    frag1, cte1, _ = sm64_stages("prc", "v", "scc_hb", ["u", "v"])
    frag2, cte2, _ = sm64_stages("scc_x", "x", "scc_hf", ["u", "v"])
    return f"""pr AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
prc AS (SELECT CAST(u AS UBIGINT) AS u, CAST(v AS UBIGINT) AS v FROM pr){frag1},
scc_x AS (SELECT u, v, xor(u, h) AS x FROM {cte1}){frag2},
dir AS MATERIALIZED (
  SELECT u AS s, v AS d FROM {cte2} WHERE h % 4 = 0 OR h % 2 = 1
  UNION ALL
  SELECT v AS s, u AS d FROM {cte2} WHERE h % 2 = 0
),
verts AS (SELECT DISTINCT s AS vid FROM (SELECT s FROM dir UNION ALL SELECT d AS s FROM dir))"""


def percolation_coocc_sql(thresholds=(1, 2, 3), rounds: int = 16) -> str:
    """Replays relational.q_percolation_coocc: per threshold t, the
    co-occurrence graph restricted to pairs sharing ≥ t orders,
    min-label propagation unrolled ``rounds`` times, then component
    stats. Integer-exact."""
    parts = [
        """WITH cw AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         count(DISTINCT a.l_orderkey)::BIGINT AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)"""
    ]
    selects = []
    for t in thresholds:
        parts.append(f""",
u{t} AS MATERIALIZED (
  SELECT u, v FROM cw WHERE w >= {t}
  UNION ALL
  SELECT v AS u, u AS v FROM cw WHERE w >= {t}
),
p{t}_l0 AS MATERIALIZED (SELECT DISTINCT u AS vid, u AS lab FROM u{t})""")
        for i in range(1, rounds + 1):
            p = f"p{t}_l{i-1}"
            parts.append(f""",
p{t}_rx{i} AS (
  SELECT e.v AS vid, MIN(l.lab) AS m
  FROM u{t} e JOIN {p} l ON l.vid = e.u GROUP BY e.v
),
p{t}_l{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.lab, COALESCE(r.m, d.lab)) AS lab
  FROM {p} d LEFT JOIN p{t}_rx{i} r ON r.vid = d.vid
)""")
        selects.append(f"""SELECT {t}::BIGINT AS threshold,
  SUM(n)::BIGINT AS n_vertices,
  count(*)::BIGINT AS n_components,
  MAX(n)::BIGINT AS largest_size
FROM (SELECT lab, count(*)::BIGINT AS n FROM p{t}_l{rounds} GROUP BY lab)""")
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def powerlaw_coocc_sql(dmin: int = 2) -> str:
    """Replays relational.q_powerlaw_coocc: α̂ = 1 + n/Σ ln(d/dmin)
    over co-occurrence degrees ≥ dmin, ROUND 6."""
    return f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
tail AS (SELECT d FROM deg WHERE d >= {dmin})
SELECT count(*)::BIGINT AS n_tail,
  ROUND(1.0 + count(*) / SUM(ln(CAST(d AS DOUBLE) / {dmin})), 6) AS alpha_r6
FROM tail"""


def sweepcut_coocc_sql(
    k: int = 8, damping: float = 0.85, seed: int = 1, T: int = 16
) -> str:
    """Replays relational.q_sweepcut_coocc: k unrolled PPR steps over
    the undirected co-occurrence graph (identical update to the
    engine, dangling mass is 0 on an undirected graph but the term is
    kept), candidates = top-T by ROUND(score/deg, 9) (ties → vid),
    prefix conductance with exact integer cut/vol and one final
    division."""
    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        "od AS MATERIALIZED (SELECT u AS vid, CAST(count(*) AS DOUBLE) AS d,"
        " count(*)::BIGINT AS deg FROM und GROUP BY u),",
        f"tp AS (SELECT vid, CASE WHEN vid = {seed} THEN 1.0 ELSE 0.0 END AS t FROM verts),",
        "r0 AS (SELECT vid, t AS r FROM tp)",
    ]
    for i in range(1, k + 1):
        p = f"r{i-1}"
        parts.append(
            f""",
m{i} AS (
  SELECT und.v AS vid, SUM({p}.r / od.d) AS s
  FROM und JOIN {p} ON und.u = {p}.vid JOIN od ON und.u = od.vid
  GROUP BY und.v
),
r{i} AS MATERIALIZED (
  SELECT tp.vid,
         (1 - {damping}) * tp.t + {damping} * COALESCE(m{i}.s, 0) AS r
  FROM tp LEFT JOIN m{i} ON tp.vid = m{i}.vid
)"""
        )
    parts.append(
        f""",
cand AS MATERIALIZED (
  SELECT vid, deg, i FROM (
    SELECT r.vid, od.deg,
      ROW_NUMBER() OVER (ORDER BY ROUND(r.r / od.d, 9) DESC, r.vid ASC) AS i
    FROM r{k} r JOIN od ON od.vid = r.vid
  ) WHERE i <= {T}
),
mm2 AS (SELECT count(*)::BIGINT AS m2 FROM und),
cutrows AS (
  SELECT LEAST(COALESCE(cu.i, 99), COALESCE(cv.i, 99)) AS a,
         GREATEST(COALESCE(cu.i, 99), COALESCE(cv.i, 99)) AS z
  FROM pr
  LEFT JOIN cand cu ON cu.vid = pr.u
  LEFT JOIN cand cv ON cv.vid = pr.v
),
cuts AS (
  SELECT t.i, COUNT(e.a)::BIGINT AS cut
  FROM generate_series(1, {T}) t(i)
  LEFT JOIN cutrows e ON e.a <= t.i AND e.z > t.i
  GROUP BY t.i
),
vols AS (
  SELECT i, vid, SUM(deg) OVER (ORDER BY i)::BIGINT AS vol FROM cand
)
SELECT v.i::BIGINT AS i, v.vid::BIGINT AS vid, c.cut, v.vol,
  CAST(c.cut AS DOUBLE) / CAST(LEAST(v.vol, (SELECT m2 FROM mm2) - v.vol) AS DOUBLE) AS phi
FROM vols v JOIN cuts c ON c.i = v.i"""
    )
    return "".join(parts)


def backbone_coocc_sql(k: int = 5) -> str:
    """Replays relational.q_backbone_coocc: per-pair shared-order
    counts, both directions, per-u rank by (w DESC, v ASC), keep ≤
    k."""
    return f"""WITH cw AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         count(DISTINCT a.l_orderkey)::BIGINT AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
bd AS (
  SELECT u, v, w FROM cw UNION ALL SELECT v AS u, u AS v, w FROM cw
),
rk AS (
  SELECT u, v, w,
    ROW_NUMBER() OVER (PARTITION BY u ORDER BY w DESC, v ASC) AS rk
  FROM bd
)
SELECT u::BIGINT AS u, v::BIGINT AS v, w, rk::BIGINT AS rk
FROM rk WHERE rk <= {k}"""


def _louvain_chain(rounds: int) -> list[str]:
    """Shared CTE chain for the Louvain replays (final labels in
    ``l{rounds}``)."""
    parts = [
        f"""WITH {_COOCC_UND_MAT},
deg AS MATERIALIZED (SELECT u AS vid, count(*)::BIGINT AS deg FROM und GROUP BY u),
m2 AS (SELECT count(*)::BIGINT AS m2 FROM und),
l0 AS MATERIALIZED (SELECT vid, vid AS lab FROM deg)"""
    ]
    for r in range(1, rounds + 1):
        p = f"l{r-1}"
        parts.append(f""",
tot{r} AS MATERIALIZED (
  SELECT l.lab, SUM(d.deg)::BIGINT AS tot
  FROM {p} l JOIN deg d ON d.vid = l.vid GROUP BY l.lab
),
k{r} AS MATERIALIZED (
  SELECT e.u AS vid, l.lab AS c, count(*)::BIGINT AS k
  FROM und e JOIN {p} l ON l.vid = e.v GROUP BY e.u, l.lab
),
own{r} AS MATERIALIZED (
  SELECT l.vid, l.lab, d.deg, t.tot, COALESCE(k.k, 0) AS k_own
  FROM {p} l
  JOIN deg d ON d.vid = l.vid
  JOIN tot{r} t ON t.lab = l.lab
  LEFT JOIN k{r} k ON k.vid = l.vid AND k.c = l.lab
),
best{r} AS (
  SELECT vid, c, s FROM (
    SELECT k.vid, k.c,
      (SELECT m2 FROM m2) * k.k - o.deg * t.tot AS s,
      ROW_NUMBER() OVER (
        PARTITION BY k.vid
        ORDER BY (SELECT m2 FROM m2) * k.k - o.deg * t.tot DESC, k.c ASC
      ) AS rk
    FROM k{r} k
    JOIN own{r} o ON o.vid = k.vid
    JOIN tot{r} t ON t.lab = k.c
    WHERE k.c <> o.lab
  ) WHERE rk = 1
),
l{r} AS MATERIALIZED (
  SELECT o.vid,
    CASE WHEN b.s IS NOT NULL
          AND b.s > (SELECT m2 FROM m2) * o.k_own - o.deg * (o.tot - o.deg)
         THEN b.c ELSE o.lab END AS lab
  FROM own{r} o LEFT JOIN best{r} b ON b.vid = o.vid
)""")
    return parts


def louvain_coocc_sql(rounds: int = 2) -> str:
    """Replays pipelines/louvain.louvain_moves over the co-occurrence
    graph: per round, community degree totals, neighbor-community edge
    counts, exact integer gain scores s = m2·k − deg·tot (candidate)
    vs s_stay = m2·k_own − deg·(tot_own − deg), move iff max s >
    s_stay with ties to the smallest community label. Pure integer
    arithmetic — bit-exact."""
    parts = _louvain_chain(rounds)
    parts.append(
        f"\nSELECT vid::BIGINT AS vid, lab::BIGINT AS community FROM l{rounds}"
    )
    return "".join(parts)


def louvain_modularity_sql(rounds: int = 2) -> str:
    """Newman modularity of the Louvain communities with exact integer
    numerators: Q = (2·m2·A − B) / m2² where A = intra-community
    directed-slot count (Σ over und edges with equal labels), B =
    Σ_c tot_c², m2 = Σ deg — a single IEEE division at the end."""
    parts = _louvain_chain(rounds)
    parts.append(f""",
fin AS (SELECT vid, lab FROM l{rounds}),
intra AS (
  SELECT count(*)::BIGINT AS a
  FROM und e JOIN fin lu ON lu.vid = e.u JOIN fin lv ON lv.vid = e.v
  WHERE lu.lab = lv.lab
),
tots AS (
  SELECT SUM(t * t)::BIGINT AS b, count(*)::BIGINT AS nc FROM (
    SELECT l.lab, SUM(d.deg)::BIGINT AS t
    FROM fin l JOIN deg d ON d.vid = l.vid GROUP BY l.lab
  )
)
SELECT tots.nc AS n_communities, intra.a AS intra_slots, tots.b AS sq_tot,
  CAST((SELECT m2 FROM m2) * intra.a - tots.b AS DOUBLE)
    / CAST((SELECT m2 FROM m2) * (SELECT m2 FROM m2) AS DOUBLE) AS q
FROM intra, tots""")
    return "".join(parts)


def louvain_quotient_sql(rounds: int = 2) -> str:
    """Community quotient graph: und directed slots grouped by the
    (lab(u), lab(v)) pair from the replayed move rounds."""
    parts = _louvain_chain(rounds)
    parts.append(
        f"""
SELECT lu.lab::BIGINT AS cu, lv.lab::BIGINT AS cv, COUNT(*)::BIGINT AS w
FROM und e JOIN l{rounds} lu ON lu.vid = e.u JOIN l{rounds} lv ON lv.vid = e.v
GROUP BY 1, 2"""
    )
    return "".join(parts)


RECIPROCITY_COOCC = f"""WITH {_coocc_dir_edges()},
cp AS (
  SELECT LEAST(s, d) AS lo, GREATEST(s, d) AS hi, count(*)::BIGINT AS n
  FROM dir GROUP BY 1, 2
)
SELECT SUM(n)::BIGINT AS n_edges,
  SUM(CASE WHEN n = 2 THEN 2 ELSE 0 END)::BIGINT AS n_reciprocal,
  CAST(SUM(CASE WHEN n = 2 THEN 2 ELSE 0 END) AS DOUBLE)
    / CAST(SUM(n) AS DOUBLE) AS reciprocity
FROM cp"""


def _reach_sql_chain(prefix: str, edges: str, rounds: int) -> str:
    """``rounds`` unrolled directed-reachability steps: forward
    ``{prefix}f{rounds}`` and backward ``{prefix}b{rounds}`` (vid, j)
    sets over edge CTE ``edges`` (s, d); the caller defines
    ``{prefix}f0`` / ``{prefix}b0``."""
    chains = []
    for t in range(1, rounds + 1):
        chains.append(f""",
{prefix}f{t} AS MATERIALIZED (
  SELECT DISTINCT vid, j FROM (
    SELECT vid, j FROM {prefix}f{t - 1}
    UNION ALL
    SELECT e.d AS vid, f.j FROM {edges} e JOIN {prefix}f{t - 1} f ON f.vid = e.s
  )
),
{prefix}b{t} AS MATERIALIZED (
  SELECT DISTINCT vid, j FROM (
    SELECT vid, j FROM {prefix}b{t - 1}
    UNION ALL
    SELECT e.s AS vid, f.j FROM {edges} e JOIN {prefix}b{t - 1} f ON f.vid = e.d
  )
)""")
    return "".join(chains)


def _trim_sql_chain(prefix: str, edges: str, rounds: int) -> tuple[str, list[str], str]:
    """``rounds`` unrolled trim-peel steps over edge CTE ``edges``;
    the caller defines ``{prefix}al0`` (alive vids). Returns
    (fragment, die CTE names, final alive CTE name)."""
    body, dies = [], []
    for r in range(1, rounds + 1):
        p = f"{prefix}al{r - 1}"
        body.append(f""",
{prefix}di{r} AS (SELECT e.d AS vid, COUNT(*) AS c FROM {edges} e
                  JOIN {p} u ON u.vid = e.s GROUP BY e.d),
{prefix}do{r} AS (SELECT e.s AS vid, COUNT(*) AS c FROM {edges} e
                  JOIN {p} u ON u.vid = e.d GROUP BY e.s),
{prefix}dd{r} AS MATERIALIZED (
  SELECT a.vid FROM {p} a
  LEFT JOIN {prefix}di{r} i ON i.vid = a.vid
  LEFT JOIN {prefix}do{r} o ON o.vid = a.vid
  WHERE COALESCE(i.c, 0) = 0 OR COALESCE(o.c, 0) = 0
),
{prefix}al{r} AS MATERIALIZED (
  SELECT a.vid FROM {p} a LEFT JOIN {prefix}dd{r} x ON x.vid = a.vid
  WHERE x.vid IS NULL
)""")
        dies.append(f"{prefix}dd{r}")
    return "".join(body), dies, f"{prefix}al{rounds}"


def _coocc_dir_base(k: int, rounds: int) -> str:
    """Shared CTE prefix for the directed-coocc reachability oracles
    (mirrors relational.directed_coocc_edges + pipelines/scc.py):
    hash-oriented edges ``dir``, pivot set ``piv`` (k smallest vids,
    j = 1-based rank), and ``rounds`` unrolled reachability steps —
    forward ``f{rounds}`` and backward ``b{rounds}`` (vid, j) sets."""
    return f"""{_coocc_dir_edges()},
piv AS MATERIALIZED (
  SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) AS j
  FROM (SELECT vid FROM verts ORDER BY vid LIMIT {k})
),
f0 AS (SELECT vid, j FROM piv),
b0 AS (SELECT vid, j FROM piv){_reach_sql_chain("", "dir", rounds)}"""


def scc_coocc_sql(rounds: int = 8, k: int = 4) -> str:
    """Unrolled pivot FW-BW SCC over the hash-oriented directed
    co-occurrence graph (mirrors pipelines/scc.py +
    relational.directed_coocc_edges exactly): each pair (a < b) is
    oriented by h = splitmix64(a ⊕ splitmix64(b)) — h % 4 = 0 → both
    directions, else h odd → a→b, h even → b→a; pivots = the k
    smallest vertex ids; ``rounds`` unrolled directed reachability
    steps each way; vertex → smallest pivot whose forward and backward
    reach sets both contain it."""
    return f"""WITH {_coocc_dir_base(k, rounds)}
SELECT CAST(f.vid AS BIGINT) AS vid, CAST(MIN(p.vid) AS BIGINT) AS scc
FROM f{rounds} f JOIN b{rounds} b ON b.vid = f.vid AND b.j = f.j
JOIN piv p ON p.j = f.j
GROUP BY f.vid"""


def trim_coocc_sql(rounds: int = 6) -> str:
    """Replays pipelines/scc.directed_trim_rounds: per round, alive
    vertices with zero alive in-neighbors OR zero alive out-neighbors
    die; trim_round = 1-based death round, 0 = survives all rounds.
    (Edge multiplicity is irrelevant — only the zero-ness of the
    alive-neighbor counts decides, so DISTINCT dir edges match the
    engine's duplicate-summed CSR weights.)"""
    body, die_names, _ = _trim_sql_chain("", "dir", rounds)
    dies = "\nUNION ALL\n".join(
        f"SELECT vid, {r} AS trim_round FROM {name}"
        for r, name in enumerate(die_names, start=1)
    )
    return f"""WITH {_coocc_dir_edges()},
al0 AS (SELECT vid FROM verts){body},
dead AS ({dies})
SELECT CAST(v.vid AS BIGINT) AS vid,
       COALESCE(d.trim_round, 0)::BIGINT AS trim_round
FROM verts v LEFT JOIN dead d ON d.vid = v.vid"""


def khop_sample_coocc_sql(seeds=(1, 2, 3), fanouts=(3, 2), seed: int = 7) -> str:
    """Replays pipelines/walk_corpus.khop_neighbor_sample: per hop h,
    candidate rank = splitmix64(root ⊕ splitmix64(v ⊕ splitmix64(nbr ⊕
    (seed + h)))), ROW_NUMBER per (root, v) ordered by (rank, nbr),
    keep fanouts[h-1]; next frontier = DISTINCT (root, dst)."""
    seed_rows = ", ".join(f"({s})" for s in seeds)
    parts = [
        f"""WITH {_COOCC_UND_MAT},
undc AS MATERIALIZED (SELECT CAST(u AS UBIGINT) AS u, CAST(v AS UBIGINT) AS v FROM und),
fr0 AS (SELECT CAST(x AS UBIGINT) AS root, CAST(x AS UBIGINT) AS v
        FROM (VALUES {seed_rows}) t(x))"""
    ]
    selects = []
    for h, fan in enumerate(fanouts, start=1):
        key = (seed + h) & 0xFFFFFFFFFFFFFFFF
        f1, c1, _ = sm64_stages(f"cd{h}", "x1", f"kh{h}a", ["root", "s", "d"])
        f2, c2, _ = sm64_stages(f"x2{h}", "x2", f"kh{h}b", ["root", "s", "d"])
        f3, c3, _ = sm64_stages(f"x3{h}", "x3", f"kh{h}c", ["root", "s", "d"])
        parts.append(f""",
cd{h} AS (SELECT f.root, f.v AS s, e.v AS d, xor(e.v, {key}::UBIGINT) AS x1
          FROM fr{h - 1} f JOIN undc e ON e.u = f.v){f1},
x2{h} AS (SELECT root, s, d, xor(s, h) AS x2 FROM {c1}){f2},
x3{h} AS (SELECT root, s, d, xor(root, h) AS x3 FROM {c2}){f3},
pk{h} AS MATERIALIZED (
  SELECT root, s, d FROM (
    SELECT root, s, d,
      ROW_NUMBER() OVER (PARTITION BY root, s ORDER BY h, d) AS rn
    FROM {c3}
  ) WHERE rn <= {fan}
),
fr{h} AS (SELECT DISTINCT root, d AS v FROM pk{h})""")
        selects.append(
            f"SELECT CAST(root AS BIGINT) AS root, {h}::BIGINT AS hop, "
            f"CAST(s AS BIGINT) AS src, CAST(d AS BIGINT) AS dst FROM pk{h}"
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def scc_decompose_coocc_sql(
    peels: int = 2, trim_rounds: int = 2, k: int = 4, reach_rounds: int = 4
) -> str:
    """Replays pipelines/scc.scc_decompose over the hash-oriented
    directed co-occurrence graph: per peel, trim (die sets → singleton
    SCCs, kind 0), core-filtered edges, pivot FW-BW over the k
    smallest surviving endpoint vids (kind 1), then survivor-filtered
    edges for the next peel."""
    parts = [f"WITH {_coocc_dir_edges()}"]
    selects = []
    prev_edges = "dir"
    for p in range(peels):
        pe = f"p{p}"
        parts.append(f""",
{pe}v AS MATERIALIZED (SELECT DISTINCT s AS vid FROM
  (SELECT s FROM {prev_edges} UNION ALL SELECT d AS s FROM {prev_edges})),
{pe}al0 AS (SELECT vid FROM {pe}v)""")
        frag, die_names, core = _trim_sql_chain(pe, prev_edges, trim_rounds)
        parts.append(frag)
        for r, name in enumerate(die_names, start=1):
            selects.append(
                f"SELECT CAST(vid AS BIGINT) AS vid, CAST(vid AS BIGINT) AS scc, 0::BIGINT AS kind FROM {name}"
            )
        parts.append(f""",
{pe}ed AS MATERIALIZED (
  SELECT e.s, e.d FROM {prev_edges} e
  JOIN {core} a ON a.vid = e.s JOIN {core} b ON b.vid = e.d
),
{pe}ev AS (SELECT DISTINCT s AS vid FROM
  (SELECT s FROM {pe}ed UNION ALL SELECT d AS s FROM {pe}ed)),
{pe}piv AS MATERIALIZED (
  SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) AS j
  FROM (SELECT vid FROM {pe}ev ORDER BY vid LIMIT {k})
),
{pe}f0 AS (SELECT vid, j FROM {pe}piv),
{pe}b0 AS (SELECT vid, j FROM {pe}piv)""")
        parts.append(_reach_sql_chain(pe, f"{pe}ed", reach_rounds))
        parts.append(f""",
{pe}asg AS MATERIALIZED (
  SELECT f.vid, MIN(pv.vid) AS scc
  FROM {pe}f{reach_rounds} f
  JOIN {pe}b{reach_rounds} b ON b.vid = f.vid AND b.j = f.j
  JOIN {pe}piv pv ON pv.j = f.j
  GROUP BY f.vid
)""")
        selects.append(
            f"SELECT CAST(vid AS BIGINT) AS vid, CAST(scc AS BIGINT) AS scc, 1::BIGINT AS kind FROM {pe}asg"
        )
        if p < peels - 1:
            parts.append(f""",
{pe}sv AS MATERIALIZED (
  SELECT a.vid FROM {core} a LEFT JOIN {pe}asg x ON x.vid = a.vid
  WHERE x.vid IS NULL
),
{pe}nx AS MATERIALIZED (
  SELECT e.s, e.d FROM {pe}ed e
  JOIN {pe}sv a ON a.vid = e.s JOIN {pe}sv b ON b.vid = e.d
)""")
            prev_edges = f"{pe}nx"
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def bowtie_coocc_sql(rounds: int = 8) -> str:
    """Bowtie decomposition around the smallest-vid pivot (mirrors
    pipelines/scc.bowtie_classes): cls 0 = core (fwd ∩ bwd reach of
    the pivot), 1 = in (bwd only), 2 = out (fwd only), 3 = other."""
    return f"""WITH {_coocc_dir_base(1, rounds)},
fr AS (SELECT DISTINCT vid FROM f{rounds}),
br AS (SELECT DISTINCT vid FROM b{rounds})
SELECT CAST(v.vid AS BIGINT) AS vid,
  CAST(CASE WHEN f.vid IS NOT NULL AND b.vid IS NOT NULL THEN 0
       WHEN b.vid IS NOT NULL THEN 1
       WHEN f.vid IS NOT NULL THEN 2
       ELSE 3 END AS BIGINT) AS cls
FROM verts v
LEFT JOIN fr f ON f.vid = v.vid
LEFT JOIN br b ON b.vid = v.vid"""


def mis_coocc_sql(rounds: int = 3, seed: int = 7) -> str:
    """Unrolled Luby MIS over the co-occurrence graph (mirrors
    pipelines/mis.py exactly): per round, undecided vertex v wins iff
    pri_r(v) < MIN(pri_r of undecided neighbors) (empty min → wins);
    winners' undecided neighbors are excluded; live edges shrink to
    undecided–undecided. pri_r(v) = ((v + RC_r)·C mod 2^64) ⊕ (·>>29),
    RC_r inlined from Python — bijective, so no ties."""
    from ..pipelines.mis import PRI_C, round_constants

    rcs = round_constants(seed, rounds)
    body = []
    for r, rc in enumerate(rcs):
        t = _mulmod64(f"CAST((CAST(vid AS HUGEINT) + {rc}) % {_U64} AS UBIGINT)", PRI_C)
        body.append(f""",
pm{r} AS (SELECT vid, {t} AS t FROM verts),
pp{r} AS MATERIALIZED (SELECT vid, xor(t, t >> 29) AS pri FROM pm{r}),
mn{r} AS (SELECT e.u AS vid, MIN(p.pri) AS m
          FROM ed{r} e JOIN pp{r} p ON p.vid = e.v GROUP BY e.u),
win{r} AS MATERIALIZED (
  SELECT s.vid FROM st{r} s JOIN pp{r} p ON p.vid = s.vid
  LEFT JOIN mn{r} m ON m.vid = s.vid
  WHERE s.status = 0 AND (m.m IS NULL OR p.pri < m.m)
),
ex{r} AS (SELECT DISTINCT e.v AS vid
          FROM ed{r} e JOIN win{r} w ON w.vid = e.u),
st{r + 1} AS MATERIALIZED (
  SELECT s.vid, CASE WHEN s.status <> 0 THEN s.status
                     WHEN w.vid IS NOT NULL THEN 1
                     WHEN x.vid IS NOT NULL THEN 2
                     ELSE 0 END AS status
  FROM st{r} s LEFT JOIN win{r} w ON w.vid = s.vid
  LEFT JOIN ex{r} x ON x.vid = s.vid
),
ed{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM ed{r} e
  JOIN st{r + 1} a ON a.vid = e.u AND a.status = 0
  JOIN st{r + 1} b ON b.vid = e.v AND b.status = 0
)""")
    return f"""WITH {_COOCC_UND_MAT},
verts AS MATERIALIZED (SELECT DISTINCT u AS vid FROM und),
st0 AS MATERIALIZED (SELECT vid, 0 AS status FROM verts),
ed0 AS MATERIALIZED (SELECT u, v FROM und){"".join(body)}
SELECT CAST(vid AS BIGINT) AS vid, CAST(status AS BIGINT) AS status FROM st{rounds}"""


def coloring_coocc_sql(rounds: int = 4, seed: int = 13) -> str:
    """Unrolled Jones–Plassmann coloring over the co-occurrence graph
    (mirrors pipelines/mis.greedy_coloring exactly): per round r, an
    uncolored vertex with pri_r below every uncolored live neighbor
    (empty min → wins) takes color r; live edges shrink to
    uncolored–uncolored; uncolored after ``rounds`` → −1."""
    from ..pipelines.mis import PRI_C, round_constants

    rcs = round_constants(seed, rounds)
    body = []
    for r, rc in enumerate(rcs):
        t = _mulmod64(f"CAST((CAST(vid AS HUGEINT) + {rc}) % {_U64} AS UBIGINT)", PRI_C)
        body.append(f""",
cpm{r} AS (SELECT vid, {t} AS t FROM verts),
cpp{r} AS MATERIALIZED (SELECT vid, xor(t, t >> 29) AS pri FROM cpm{r}),
cmn{r} AS (SELECT e.u AS vid, MIN(p.pri) AS m
           FROM ced{r} e JOIN cpp{r} p ON p.vid = e.v GROUP BY e.u),
cwin{r} AS MATERIALIZED (
  SELECT s.vid FROM cst{r} s JOIN cpp{r} p ON p.vid = s.vid
  LEFT JOIN cmn{r} m ON m.vid = s.vid
  WHERE s.col = 0 AND (m.m IS NULL OR p.pri < m.m)
),
cst{r + 1} AS MATERIALIZED (
  SELECT s.vid, CASE WHEN s.col <> 0 THEN s.col
                     WHEN w.vid IS NOT NULL THEN {r + 1}
                     ELSE 0 END AS col
  FROM cst{r} s LEFT JOIN cwin{r} w ON w.vid = s.vid
),
ced{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM ced{r} e
  JOIN cst{r + 1} a ON a.vid = e.u AND a.col = 0
  JOIN cst{r + 1} b ON b.vid = e.v AND b.col = 0
)""")
    return f"""WITH {_COOCC_UND_MAT},
verts AS MATERIALIZED (SELECT DISTINCT u AS vid FROM und),
cst0 AS MATERIALIZED (SELECT vid, 0 AS col FROM verts),
ced0 AS MATERIALIZED (SELECT u, v FROM und){"".join(body)}
SELECT CAST(vid AS BIGINT) AS vid,
  CAST(CASE WHEN col = 0 THEN -1 ELSE col END AS BIGINT) AS color
FROM cst{rounds}"""


UNIGRAM_FAMILIARITY = """WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
),
tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tk GROUP BY doc_id, t),
cf AS (SELECT t, SUM(tf)::BIGINT AS cf FROM tf GROUP BY t)
SELECT f.doc_id::BIGINT AS doc_id,
  SUM(f.tf)::BIGINT AS n_tokens,
  SUM(f.tf * c.cf)::BIGINT AS fam_num,
  CAST(SUM(f.tf * c.cf) AS DOUBLE) / CAST(SUM(f.tf) AS DOUBLE) AS familiarity
FROM tf f JOIN cf c ON f.t = c.t GROUP BY f.doc_id"""


def dup_ngram_sql(w: int = 5) -> str:
    """Replays functions/dedup.dup_ngram_stats: positional w-token
    shingle FNV-1a hashes, per-doc occurrence counts per distinct
    hash, a shingle is duplicated iff ≥ 2 docs carry it; dup_frac is
    the single IEEE division n_dup / n_shingles."""
    shingle = " || ' ' || ".join(
        "tk[i]" if j == 0 else f"tk[i+{j}]" for j in range(w)
    )
    fnv = (
        "list_reduce(list_prepend(14695981039346656037::UBIGINT, "
        f"list_transform(string_split({shingle}, ''), ch -> ascii(ch)::UBIGINT)), "
        f"(h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % {_U64} AS UBIGINT))"
    )
    return f"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
shs AS MATERIALIZED (
  SELECT doc_id,
    list_transform(generate_series(1, len(tk) - {w - 1}), i -> {fnv}) AS hs
  FROM toks WHERE len(tk) >= {w}
),
occ AS (
  SELECT doc_id, h, count(*)::BIGINT AS occ
  FROM (SELECT doc_id, unnest(hs) AS h FROM shs)
  GROUP BY doc_id, h
),
nd AS (SELECT h, count(*)::BIGINT AS ndocs FROM occ GROUP BY h)
SELECT o.doc_id::BIGINT AS doc_id,
       sum(o.occ)::BIGINT AS n_shingles,
       sum(CASE WHEN nd.ndocs >= 2 THEN o.occ ELSE 0 END)::BIGINT AS n_dup,
       CAST(sum(CASE WHEN nd.ndocs >= 2 THEN o.occ ELSE 0 END) AS DOUBLE)
         / CAST(sum(o.occ) AS DOUBLE) AS dup_frac
FROM occ o JOIN nd USING (h) GROUP BY o.doc_id"""


def winnow_docs_sql(w: int = 3, window: int = 4) -> str:
    """Replays functions/dedup.winnow_fingerprints: positional w-token
    shingle FNV-1a hashes (over the space-joined shingle string, the
    contamination reduce), minimum per sliding window of ``window``
    shingles (single global min when a doc has 1..window-1 shingles),
    DISTINCT per doc, int64-reinterpreted."""
    shingle = " || ' ' || ".join(
        "tk[i]" if j == 0 else f"tk[i+{j}]" for j in range(w)
    )
    fnv = (
        "list_reduce(list_prepend(14695981039346656037::UBIGINT, "
        f"list_transform(string_split({shingle}, ''), ch -> ascii(ch)::UBIGINT)), "
        f"(h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % {_U64} AS UBIGINT))"
    )
    return f"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
shs AS MATERIALIZED (
  SELECT doc_id,
    list_transform(generate_series(1, len(tk) - {w - 1}), i -> {fnv}) AS hs
  FROM toks WHERE len(tk) >= {w}
),
wins AS (
  SELECT doc_id,
    CASE WHEN len(hs) < {window} THEN [list_min(hs)]
         ELSE list_transform(generate_series(1, len(hs) - {window - 1}),
                             j -> list_min(list_slice(hs, j, j + {window - 1})))
    END AS fpl
  FROM shs
)
SELECT DISTINCT doc_id, {u64_to_i64('f')} AS fp
FROM (SELECT doc_id, unnest(fpl) AS f FROM wins)"""


def heavy_hitters_sql(top: int = 10) -> str:
    """Exact global top tokens — the engine's MG-candidate + exact
    recount pipeline must equal the plain count/limit answer whenever
    the MG containment guarantee holds (top ≪ k_sketch)."""
    return f"""SELECT t AS tok, count(*)::BIGINT AS n
FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents)
GROUP BY t ORDER BY n DESC, tok LIMIT {top}"""


def zipf_fit_sql(top_k: int = 256) -> str:
    """Replays functions/terms.zipf_fit: corpus token frequencies,
    top-k by (cf DESC, tok), OLS of ln(cf) ~ ln(rank) via the same
    5-sum closed form, ROUND 6 (summation order differs; the residual
    is ~1e-14, far inside the rounding band)."""
    return f"""WITH tf AS (
  SELECT t AS tok, count(*)::BIGINT AS cf
  FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents)
  GROUP BY t
),
top AS (
  SELECT cf, ROW_NUMBER() OVER (ORDER BY cf DESC, tok) AS rk
  FROM tf ORDER BY cf DESC, tok LIMIT {top_k}
),
pts AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(cf AS DOUBLE)) AS y FROM top),
s AS (
  SELECT count(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pts
)
SELECT (SELECT count(*) FROM top)::BIGINT AS n_tokens,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_r6,
  ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept_r6,
  (SELECT cf FROM top WHERE rk = 1)::BIGINT AS cf_top1
FROM s"""


def vocab_growth_sql(step: int = 64) -> str:
    """Replays functions/terms.vocab_growth: bucket = doc_id // step,
    n_tokens = token occurrences per bucket, new_types = tokens whose
    corpus-wide MIN doc_id falls in the bucket (\\S+ tokenizer)."""
    return f"""WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
),
tot AS (SELECT doc_id // {step} AS bucket, COUNT(*)::BIGINT AS n_tokens FROM tk GROUP BY 1),
fs AS (SELECT t, MIN(doc_id) AS fd FROM tk GROUP BY t),
nt AS (SELECT fd // {step} AS bucket, COUNT(*)::BIGINT AS new_types FROM fs GROUP BY 1)
SELECT tot.bucket::BIGINT AS bucket, tot.n_tokens,
       COALESCE(nt.new_types, 0)::BIGINT AS new_types
FROM tot LEFT JOIN nt ON nt.bucket = tot.bucket"""


def contamination_sql(eval_mod: int = 20, w: int = 8) -> str:
    """Replays functions/dedup.py:contamination_counts — distinct
    w-token shingles (FNV-1a over the space-joined tokens, the same
    reduce as the minhash fragment), eval slice = doc_id % eval_mod
    == 0, per-corpus-doc count of shared shingles."""
    terms = " || ' ' || ".join("tk[i]" if j == 0 else f"tk[i+{j}]" for j in range(w))
    return f"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
shs AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - {w - 1}),
         i -> {terms})) AS s
  FROM toks
),
shrw AS MATERIALIZED (
  SELECT DISTINCT doc_id, list_reduce(
    list_prepend(14695981039346656037::UBIGINT,
      list_transform(string_split(s, ''), ch -> ascii(ch)::UBIGINT)),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % {_U64} AS UBIGINT)
  ) AS sh
  FROM shs
),
ev AS (SELECT DISTINCT sh FROM shrw WHERE doc_id % {eval_mod} = 0)
SELECT s.doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_hits
FROM shrw s JOIN ev USING (sh)
WHERE s.doc_id % {eval_mod} <> 0 GROUP BY s.doc_id"""


def betweenness_coocc_sql(rounds: int = 6, seeds=(1, 2, 3, 4)) -> str:
    """Unrolled two-phase Brandes over the co-occurrence graph
    (mirrors pipelines/betweenness.py): per seed, ``rounds`` forward
    BFS steps accumulating shortest-path counts σ (senders at
    dist = t−1, integer-exact float sums), then ``rounds`` backward
    steps over descending levels accumulating
    δ(v) += σ(v)·Σ (1+δ(w))/σ(w); C_B(v) = Σ_seeds δ with the seed's
    own column zeroed, ROUND 6 (the repo's sum-monoid convention)."""
    R = rounds
    body = []
    finals = []
    for s in seeds:
        body.append(f""",
d{s}_0 AS (SELECT {s} AS vid, 1.0 AS sig, 0 AS dist)""")
        for t in range(1, R + 1):
            body.append(f""",
nx{s}_{t} AS (
  SELECT und.v AS vid, SUM(p.sig) AS sig
  FROM und JOIN d{s}_{t - 1} p ON und.u = p.vid AND p.dist = {t - 1}
  GROUP BY und.v
),
d{s}_{t} AS MATERIALIZED (
  SELECT vid, sig, dist FROM d{s}_{t - 1}
  UNION ALL
  SELECT n.vid, n.sig, {t} AS dist FROM nx{s}_{t} n
  WHERE NOT EXISTS (SELECT 1 FROM d{s}_{t - 1} o WHERE o.vid = n.vid)
)""")
        body.append(f""",
dl{s}_0 AS (SELECT vid, sig, dist, 0.0 AS delta FROM d{s}_{R})""")
        for t in range(1, R + 1):
            lvl = R - t + 1
            body.append(f""",
m{s}_{t} AS (
  SELECT und.v AS vid, SUM((1.0 + w.delta) / w.sig) AS a
  FROM und JOIN dl{s}_{t - 1} w ON und.u = w.vid AND w.dist = {lvl}
  GROUP BY und.v
),
dl{s}_{t} AS MATERIALIZED (
  SELECT d.vid, d.sig, d.dist,
    d.delta + CASE WHEN d.dist = {lvl - 1} THEN d.sig * COALESCE(m.a, 0) ELSE 0 END AS delta
  FROM dl{s}_{t - 1} d LEFT JOIN m{s}_{t} m ON m.vid = d.vid
)""")
        finals.append(
            f"SELECT vid, delta FROM dl{s}_{R} WHERE vid <> {s}"
        )
    allsql = " UNION ALL ".join(finals)
    return f"""WITH {_COOCC_UND_MAT},
verts AS MATERIALIZED (SELECT DISTINCT u AS vid FROM und){"".join(body)},
alls AS ({allsql})
SELECT CAST(v.vid AS BIGINT) AS vid,
  ROUND(COALESCE(SUM(a.delta), 0), 6) AS bc_r6
FROM verts v LEFT JOIN alls a ON a.vid = v.vid GROUP BY v.vid"""


def maxmatch_coocc_sql(rounds: int = 3, seed: int = 11) -> str:
    """Unrolled fixed-round greedy maximal matching over the
    co-occurrence graph (mirrors pipelines/maxmatch.py): per round,
    edge priorities are splitmix64(u ⊕ v ⊕ RC_r); an edge matches iff
    its priority is the UNIQUE strict minimum at BOTH endpoints; ties
    produce no winner; edges touching matched vertices die."""
    from ..pipelines.maxmatch import round_constants

    rcs = round_constants(seed, rounds)
    body = []
    outs = []
    for r, rc in enumerate(rcs):
        frag, fin, hcol = sm64_stages(
            f"xin{r}", "hx", f"pri{r}", ["u", "v"]
        )
        body.append(f""",
xin{r} AS (SELECT u, v,
  xor(xor(CAST(u AS UBIGINT), CAST(v AS UBIGINT)), {rc}::UBIGINT) AS hx
  FROM le{r}){frag},
pe{r} AS MATERIALIZED (SELECT u, v, {hcol} AS pri FROM {fin}),
bo{r} AS (SELECT u AS x, pri FROM pe{r} UNION ALL SELECT v AS x, pri FROM pe{r}),
mnm{r} AS (SELECT x, MIN(pri) AS mp FROM bo{r} GROUP BY x),
cntm{r} AS (
  SELECT b.x, COUNT(*) AS c FROM bo{r} b JOIN mnm{r} m ON b.x = m.x AND b.pri = m.mp
  GROUP BY b.x
),
wins{r} AS MATERIALIZED (
  SELECT p.u, p.v FROM pe{r} p
  JOIN mnm{r} mu ON mu.x = p.u AND p.pri = mu.mp
  JOIN cntm{r} cu ON cu.x = p.u AND cu.c = 1
  JOIN mnm{r} mv ON mv.x = p.v AND p.pri = mv.mp
  JOIN cntm{r} cv ON cv.x = p.v AND cv.c = 1
),
mverts{r} AS (SELECT u AS x FROM wins{r} UNION SELECT v FROM wins{r}
              {f"UNION SELECT x FROM mverts{r - 1}" if r > 0 else ""}),
le{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM le{r} e
  WHERE e.u NOT IN (SELECT x FROM mverts{r})
    AND e.v NOT IN (SELECT x FROM mverts{r})
)""")
        outs.append(f"SELECT u, v, {r + 1} AS rnd FROM wins{r}")
    return f"""WITH {_COOCC_UND_MAT},
le0 AS MATERIALIZED (SELECT u, v FROM pr){"".join(body)}
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, CAST(rnd AS BIGINT) AS round
FROM ({" UNION ALL ".join(outs)})"""


def diameter_coocc_sql(rounds: int = 8, seed: int = 1) -> str:
    """Double-sweep diameter lower bound (mirrors
    relational.q_diameter_coocc): BFS from ``seed`` → farthest vertex a
    (max dist, tie-break min vid) → BFS from a → ecc(a) = diameter
    lower bound and its witness b. Both BFS chains unrolled."""
    sent = 1 << 40
    chains = [f""",
a_d0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = {seed} THEN 0 ELSE {sent} END AS dist
  FROM verts
)"""]
    for i in range(1, rounds + 1):
        chains.append(f""",
a_rx{i} AS (
  SELECT und.v AS vid, MIN(dp.dist + 1) AS m
  FROM und JOIN a_d{i - 1} dp ON und.u = dp.vid WHERE dp.dist < {sent}
  GROUP BY und.v
),
a_d{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.dist, COALESCE(r.m, {sent})) AS dist
  FROM a_d{i - 1} d LEFT JOIN a_rx{i} r ON d.vid = r.vid
)""")
    chains.append(f""",
f1 AS MATERIALIZED (
  SELECT MAX(dist) AS ecc, MIN(vid) FILTER (dist = (
    SELECT MAX(dist) FROM a_d{rounds} WHERE dist < {sent})) AS far
  FROM a_d{rounds} WHERE dist < {sent}
),
b_d0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = (SELECT far FROM f1) THEN 0 ELSE {sent} END AS dist
  FROM verts
)""")
    for i in range(1, rounds + 1):
        chains.append(f""",
b_rx{i} AS (
  SELECT und.v AS vid, MIN(dp.dist + 1) AS m
  FROM und JOIN b_d{i - 1} dp ON und.u = dp.vid WHERE dp.dist < {sent}
  GROUP BY und.v
),
b_d{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.dist, COALESCE(r.m, {sent})) AS dist
  FROM b_d{i - 1} d LEFT JOIN b_rx{i} r ON d.vid = r.vid
)""")
    return f"""WITH {_COOCC_UND_MAT},
verts AS MATERIALIZED (SELECT DISTINCT u AS vid FROM und){"".join(chains)},
f2 AS (
  SELECT MAX(dist) AS ecc, MIN(vid) FILTER (dist = (
    SELECT MAX(dist) FROM b_d{rounds} WHERE dist < {sent})) AS far
  FROM b_d{rounds} WHERE dist < {sent}
)
SELECT {seed}::BIGINT AS seed,
  (SELECT ecc FROM f1)::BIGINT AS ecc_seed,
  (SELECT far FROM f1)::BIGINT AS far1,
  (SELECT ecc FROM f2)::BIGINT AS diam_lb,
  (SELECT far FROM f2)::BIGINT AS far2"""


EIGENCENTRALITY_COOCC = f"""WITH {_COOCC_UND_MAT},
verts AS MATERIALIZED (SELECT DISTINCT u AS vid FROM und),
x0 AS (SELECT vid, 1.0 AS x FROM verts),
x1 AS MATERIALIZED (SELECT und.v AS vid, SUM(p.x) AS x FROM und JOIN x0 p ON und.u = p.vid GROUP BY und.v),
x2 AS MATERIALIZED (SELECT und.v AS vid, SUM(p.x) AS x FROM und JOIN x1 p ON und.u = p.vid GROUP BY und.v),
x3 AS MATERIALIZED (SELECT und.v AS vid, SUM(p.x) AS x FROM und JOIN x2 p ON und.u = p.vid GROUP BY und.v),
x4 AS MATERIALIZED (SELECT und.v AS vid, SUM(p.x) AS x FROM und JOIN x3 p ON und.u = p.vid GROUP BY und.v),
nrm AS (SELECT SUM(x) AS s FROM x4)
SELECT CAST(v.vid AS BIGINT) AS vid,
  ROUND(COALESCE(x.x, 0) / (SELECT s FROM nrm), 6) AS ec_r6
FROM verts v LEFT JOIN x4 x ON x.vid = v.vid"""


def harmonic_coocc_sql(rounds: int = 8, seeds=(1, 2, 3, 4)) -> str:
    """Unrolled BFS per seed (the closeness chain) reduced to a
    distance histogram; harmonic = c1/1 + c2/2 + … + cR/R written as
    one literal left-associated expression — the exact fixed-order sum
    the engine computes."""
    sent = 1 << 40
    chains = []
    selects = []
    for s in seeds:
        chains.append(f""",
h{s}_d0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = {s} THEN 0 ELSE {sent} END AS dist
  FROM (SELECT DISTINCT u AS vid FROM und)
)""")
        for i in range(1, rounds + 1):
            p = f"h{s}_d{i-1}"
            chains.append(f""",
h{s}_rx{i} AS (
  SELECT und.v AS vid, MIN(dp.dist + 1) AS m
  FROM und JOIN {p} dp ON und.u = dp.vid WHERE dp.dist < {sent}
  GROUP BY und.v
),
h{s}_d{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.dist, COALESCE(r.m, {sent})) AS dist
  FROM {p} d LEFT JOIN h{s}_rx{i} r ON d.vid = r.vid
)""")
        cnt = lambda d, s=s: (
            f"(SELECT count(*) FROM h{s}_d{rounds} WHERE dist = {d} AND vid <> {s})"
        )
        expr = " + ".join(f"CAST({cnt(d)} AS DOUBLE) / {d}.0" for d in range(1, rounds + 1))
        ntot = f"(SELECT count(*) FROM h{s}_d{rounds} WHERE dist < {sent} AND vid <> {s})"
        selects.append(
            f"SELECT {s}::BIGINT AS seed, {ntot}::BIGINT AS n_reached, ({expr}) AS harmonic"
        )
    return (
        f"WITH {_COOCC_UND_MAT}" + "".join(chains) + "\n"
        + "\nUNION ALL\n".join(selects)
    )


DOCLEN_PERCENTILES_BY_LANG = """SELECT lang, CAST(0.25 AS DOUBLE) AS q, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS value FROM documents GROUP BY lang
UNION ALL SELECT lang, CAST(0.5 AS DOUBLE), CAST(quantile_disc(n_chars, 0.5) AS BIGINT) FROM documents GROUP BY lang
UNION ALL SELECT lang, CAST(0.9 AS DOUBLE), CAST(quantile_disc(n_chars, 0.9) AS BIGINT) FROM documents GROUP BY lang"""


def oddcycle_coocc_sql(rounds: int = 8, seed: int = 1) -> str:
    """Frustrated-edge counts per BFS level from ``seed`` (mirrors
    q_oddcycle_coocc): unrolled BFS, then canonical edges whose two
    endpoints share a (finite) distance, counted per level."""
    sent = 1 << 40
    chains = [f""",
o_d0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = {seed} THEN 0 ELSE {sent} END AS dist
  FROM (SELECT DISTINCT u AS vid FROM und)
)"""]
    for i in range(1, rounds + 1):
        chains.append(f""",
o_rx{i} AS (
  SELECT und.v AS vid, MIN(dp.dist + 1) AS m
  FROM und JOIN o_d{i - 1} dp ON und.u = dp.vid WHERE dp.dist < {sent}
  GROUP BY und.v
),
o_d{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.dist, COALESCE(r.m, {sent})) AS dist
  FROM o_d{i - 1} d LEFT JOIN o_rx{i} r ON d.vid = r.vid
)""")
    return f"""WITH {_COOCC_UND_MAT}{"".join(chains)}
SELECT CAST(du.dist AS BIGINT) AS dist, count(*)::BIGINT AS n_frustrated
FROM pr e
JOIN o_d{rounds} du ON du.vid = e.u AND du.dist < {sent}
JOIN o_d{rounds} dv ON dv.vid = e.v AND dv.dist = du.dist
GROUP BY du.dist"""


COMPONENT_SIZES = f"""WITH e AS (
    SELECT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst FROM orders
),
lab AS (
  SELECT dst AS vid, src AS component FROM e
  UNION ALL
  SELECT DISTINCT src AS vid, src AS component FROM e
),
sz AS (SELECT component, count(*)::BIGINT AS size FROM lab GROUP BY component)
SELECT size, count(*)::BIGINT AS n_components FROM sz GROUP BY size"""


def widest_partsupp_sql(rounds: int = 8, sources=(1, 2, 3), source_cap: float = 1e18) -> str:
    """Unrolled max-min (widest-path) recurrence over the
    Σquantity-capacity part–supplier graph (mirrors
    pipelines/paths.py:widest_path_forest): w(v) ← GREATEST(w(v),
    MAX over nbrs of LEAST(w(u), cap(u,v))) — selection arithmetic
    only, exact with no rounding."""
    src_list = ", ".join(str(s) for s in sources)
    body = []
    for i in range(1, rounds + 1):
        body.append(f""",
wm{i} AS (
  SELECT e.v AS vid, MAX(LEAST(p.w, e.cap)) AS m
  FROM ce e JOIN w{i - 1} p ON e.u = p.vid WHERE p.w > 0
  GROUP BY e.v
),
w{i} AS MATERIALIZED (
  SELECT s.vid, GREATEST(s.w, COALESCE(m.m, 0)) AS w
  FROM w{i - 1} s LEFT JOIN wm{i} m ON m.vid = s.vid
)""")
    return f"""WITH cap AS MATERIALIZED (
  SELECT l_partkey AS u, l_suppkey + {SUPP_OFFSET} AS v,
         SUM(CAST(l_quantity AS DOUBLE)) AS cap
  FROM lineitem GROUP BY 1, 2
),
ce AS MATERIALIZED (
  SELECT u, v, cap FROM cap UNION ALL SELECT v, u, cap FROM cap
),
verts AS (SELECT DISTINCT u AS vid FROM ce),
w0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid IN ({src_list}) THEN {source_cap} ELSE 0 END AS w
  FROM verts
){"".join(body)}
SELECT CAST(vid AS BIGINT) AS vid, CAST(w AS DOUBLE) AS width
FROM w{rounds} WHERE vid NOT IN ({src_list})"""


EVENTS_ROLLING_SPEND = """WITH ev AS (
  SELECT event_id, user_id, ts, CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id::BIGINT AS event_id,
  COUNT(cents) OVER w::BIGINT AS n_prev,
  COALESCE(SUM(cents) OVER w, 0)::BIGINT AS prev_cents
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)"""


ORDERS_BY_REGION = """SELECT r_name,
  count(*)::BIGINT AS n_orders,
  SUM(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT AS cents_sum
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name"""


BIGRAM_CE_DOCS = """WITH tk AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
bg AS MATERIALIZED (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1])) AS bg
  FROM tk WHERE len(tk) >= 2
),
vocab AS (
  SELECT count(DISTINCT split_part(bg, ' ', 2))::BIGINT AS V FROM bg
),
cf2 AS (
  SELECT bg, CAST(floor(ln(CAST(count(*) + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS q2
  FROM bg GROUP BY bg
),
cf1 AS (
  SELECT split_part(bg, ' ', 1) AS head,
    CAST(floor(ln(CAST(count(*) + (SELECT V FROM vocab) AS DOUBLE)) * 1000000) AS BIGINT) AS q1
  FROM bg GROUP BY head
),
s2 AS (
  SELECT doc_id, count(*)::BIGINT AS n, SUM(q2)::BIGINT AS s2
  FROM bg JOIN cf2 USING (bg) GROUP BY doc_id
),
s1 AS (
  SELECT doc_id, SUM(q1)::BIGINT AS s1
  FROM bg JOIN cf1 ON split_part(bg.bg, ' ', 1) = cf1.head GROUP BY doc_id
)
SELECT s2.doc_id::BIGINT AS doc_id, n AS n_bigrams,
  (s1.s1 - s2.s2)::BIGINT AS ce_num,
  CAST(s1.s1 - s2.s2 AS DOUBLE) / (1000000.0 * n) AS ce
FROM s2 JOIN s1 ON s2.doc_id = s1.doc_id"""


def dsir_select_sql(
    target_lang: str = "en", n_buckets: int = 4096, top_k: int = 256
) -> str:
    """Replays functions/dsir.dsir_importance_topk: FNV-1a unigram
    hash buckets, Laplace-smoothed target-vs-raw log ratio quantized
    to int64 micro-nats per bucket, exact per-doc integer sums, one
    IEEE division, top-k by (logratio DESC, doc_id)."""
    B = n_buckets
    fnv = (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT,"
        " list_transform(string_split(t, ''), ch -> ascii(ch)::UBIGINT)),"
        " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
        f" % {_U64} AS UBIGINT))"
    )
    return f"""WITH tk AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(text, '\\S+')) AS t
  FROM documents
),
ht AS MATERIALIZED (
  SELECT doc_id, lang, CAST({fnv} % {B} AS BIGINT) AS b FROM tk
),
rc AS (SELECT b, count(*)::BIGINT AS rc FROM ht GROUP BY b),
tc AS (
  SELECT b, count(*)::BIGINT AS tc FROM ht
  WHERE lang = '{target_lang}' GROUP BY b
),
tot AS (
  SELECT (SELECT count(*) FROM ht) AS R,
         (SELECT count(*) FROM ht WHERE lang = '{target_lang}') AS T
),
lam AS (
  SELECT rc.b,
    CAST(floor((ln(CAST(COALESCE(tc.tc, 0) + 1 AS DOUBLE)
                   / CAST(tot.T + {B} AS DOUBLE))
              - ln(CAST(rc.rc + 1 AS DOUBLE)
                   / CAST(tot.R + {B} AS DOUBLE))) * 1000000) AS BIGINT) AS lam
  FROM rc LEFT JOIN tc USING (b), tot
),
doc AS (
  SELECT ht.doc_id, count(*)::BIGINT AS n_tokens, SUM(lam.lam)::BIGINT AS w_num
  FROM ht JOIN lam ON ht.b = lam.b GROUP BY ht.doc_id
)
SELECT doc_id::BIGINT AS doc_id, n_tokens, w_num,
  CAST(w_num AS DOUBLE) / (1000000.0 * n_tokens) AS logratio
FROM doc ORDER BY logratio DESC, doc_id LIMIT {top_k}"""


def cms_probe_sql(width: int = 1024, depth: int = 4, top: int = 10) -> str:
    """Replays functions/sketches.count_min_token_probe: FNV-1a token
    hashes, per-row bucket = splitmix64(h XOR splitmix64(r+1)) mod
    width, bucket count sums, probe at the exact top tokens, estimate
    = min over rows. All-integer output → exact hash parity."""
    parts = [
        f"""WITH tf AS MATERIALIZED (
  SELECT t AS tok, count(*)::BIGINT AS cnt,
    list_reduce(
      list_prepend(14695981039346656037::UBIGINT,
        list_transform(string_split(t, ''), ch -> ascii(ch)::UBIGINT)),
      (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)
                     % {_U64} AS UBIGINT)) AS h0
  FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents)
  GROUP BY t
)"""
    ]
    est_cols = []
    for r in range(depth):
        salt = sm64_py(r + 1)
        seed_cte = f"x{r}_in"
        parts.append(
            f""",
{seed_cte} AS (SELECT tok, cnt, xor(h0, {salt}::UBIGINT) AS hx FROM tf)"""
        )
        frag, last, hcol = sm64_stages(seed_cte, "hx", f"x{r}", ["tok", "cnt"])
        parts.append(frag)
        parts.append(
            f""",
bk{r} AS MATERIALIZED (SELECT tok, cnt, CAST({hcol} % {width} AS BIGINT) AS b FROM {last}),
cms{r} AS (SELECT b, SUM(cnt)::BIGINT AS c FROM bk{r} GROUP BY b)"""
        )
        est_cols.append(f"(SELECT c FROM cms{r} JOIN bk{r} USING (b) WHERE bk{r}.tok = pr.tok)")
    least = "LEAST(" + ", ".join(est_cols) + ")"
    parts.append(
        f""",
pr AS (SELECT tok, cnt FROM tf ORDER BY cnt DESC, tok LIMIT {top})
SELECT pr.tok, pr.cnt AS exact_n,
  {least}::BIGINT AS cms_n,
  ({least} - pr.cnt)::BIGINT AS overestimate
FROM pr"""
    )
    return "".join(parts)


def weighted_sample_sql(k: int = 64, seed: int | None = None) -> str:
    """A-ES weighted order-sample replay: key = floor(−ln((h+1)/2^64)
    / n_chars · 1e12) over splitmix64(doc_id ⊕ seed), k smallest with
    doc_id tie-break (mirrors corpus.q_weighted_sample_docs)."""
    from ..config import HASH_SEED

    if seed is None:
        seed = HASH_SEED
    frag, cte, hcol = sm64_stages("ws_in", "x", "ws", ["doc_id", "n_chars"])
    return f"""WITH ws_in AS (
  SELECT doc_id, n_chars,
    xor(CAST(doc_id AS UBIGINT), {seed}::UBIGINT) AS x
  FROM documents WHERE n_chars > 0
){frag}
SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
  CAST(floor(-ln((CAST({hcol} AS DOUBLE) + 1) / 18446744073709551616.0)
             / n_chars * 1000000000000) AS BIGINT) AS key_q
FROM {cte} ORDER BY key_q, doc_id LIMIT {k}"""


def suffix_array_sql(max_prefix: int = 128) -> str:
    """Replays corpus.q_suffix_array_docs: Manber–Myers prefix
    doubling as fixed unrolled rounds — rank_1 = DENSE_RANK(token),
    rank_2s = DENSE_RANK(rank_s[p], COALESCE(rank_s[p+s], 0)). The
    engine may stop at the refinement fixed point; extra SQL rounds
    are then identities, so the fixed-round replay matches exactly.
    All-integer ranks → exact hash parity."""
    parts = [
        r"""WITH tkl AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents
),
toks AS (
  SELECT doc_id, unnest(generate_series(0, len(tk) - 1)) AS pos, tk
  FROM tkl WHERE len(tk) > 0
),
t2 AS (SELECT doc_id, pos, tk[pos + 1] AS tok FROM toks),
r1 AS MATERIALIZED (
  SELECT doc_id, pos, DENSE_RANK() OVER (ORDER BY tok) AS r FROM t2)"""
    ]
    step = 1
    while step < max_prefix:
        prev, nxt = f"r{step}", f"r{step * 2}"
        parts.append(
            f""",
{nxt} AS MATERIALIZED (
  SELECT a.doc_id, a.pos,
         DENSE_RANK() OVER (ORDER BY a.r, COALESCE(b.r, 0)) AS r
  FROM {prev} a LEFT JOIN {prev} b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + {step})"""
        )
        step *= 2
    parts.append(
        f"""
SELECT doc_id::BIGINT AS doc_id, pos::BIGINT AS pos, r::BIGINT AS srank
FROM r{step}"""
    )
    return "".join(parts)


def _dup_levels_sql_parts(max_prefix: int = 128) -> tuple[list, str]:
    """Shared CTE chain for the per-position duplicate-window levels
    (functions/suffix._dup_levels): prefix-doubling DENSE_RANK rounds,
    each level flagging rank groups of size ≥ 2 (COUNT OVER PARTITION)
    gated to FULL windows (dlen - pos >= level), the running max level
    carried through the chain. Returns (parts, final_cte_name) where
    the final CTE has (doc_id, pos, dlen, r, dmax)."""
    parts = [
        r"""WITH tkl AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents
),
toks AS (
  SELECT doc_id, unnest(generate_series(0, len(tk) - 1)) AS pos,
         tk, len(tk) AS dlen
  FROM tkl WHERE len(tk) > 0
),
t2 AS (SELECT doc_id, pos, tk[pos + 1] AS tok, dlen FROM toks),
r1 AS MATERIALIZED (
  SELECT doc_id, pos, dlen, DENSE_RANK() OVER (ORDER BY tok) AS r FROM t2),
f1 AS MATERIALIZED (
  SELECT doc_id, pos, dlen, r,
         CASE WHEN COUNT(*) OVER (PARTITION BY r) >= 2 THEN 1 ELSE 0 END AS dmax
  FROM r1)"""
    ]
    step = 1
    while step < max_prefix:
        prev, w = f"f{step}", step * 2
        parts.append(
            f""",
r{w} AS MATERIALIZED (
  SELECT a.doc_id, a.pos, a.dlen,
         DENSE_RANK() OVER (ORDER BY a.r, COALESCE(b.r, 0)) AS r, a.dmax
  FROM {prev} a LEFT JOIN {prev} b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + {step}),
f{w} AS MATERIALIZED (
  SELECT doc_id, pos, dlen, r,
         GREATEST(dmax, CASE WHEN COUNT(*) OVER (PARTITION BY r) >= 2
                              AND dlen - pos >= {w}
                             THEN {w} ELSE 0 END) AS dmax
  FROM r{w})"""
        )
        step *= 2
    return parts, f"f{step}"


def dup_window_profile_sql(max_prefix: int = 128, dup_thresh: int = 8) -> str:
    """Replays functions/suffix.dup_window_profile over the shared
    duplicate-window level chain; per-doc integer aggregate."""
    parts, last = _dup_levels_sql_parts(max_prefix)
    parts.append(
        f"""
SELECT doc_id::BIGINT AS doc_id,
  CAST(MAX(dmax) AS BIGINT) AS max_dup,
  CAST(SUM(CASE WHEN dmax >= {dup_thresh} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_thresh,
  COUNT(*)::BIGINT AS n_pos
FROM {last} GROUP BY doc_id"""
    )
    return "".join(parts)


def exactsubstr_prune_sql(max_prefix: int = 128, dup_thresh: int = 8) -> str:
    """Replays functions/suffix.exactsubstr_prune: interval-union
    coverage of duplicated windows ≥ dup_thresh via a running window
    MAX of (pos + dmax), then per-doc kept-token FNV-1a fingerprint
    (0 when nothing is kept)."""
    parts, last = _dup_levels_sql_parts(max_prefix)
    fnv = (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT,"
        " list_transform(string_split(s, ''), ch -> ascii(ch)::UBIGINT)),"
        " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
        f" % {_U64} AS UBIGINT))"
    )
    parts.append(
        f""",
cov AS (
  SELECT doc_id, pos,
    COALESCE(MAX(CASE WHEN dmax >= {dup_thresh} THEN pos + dmax END)
      OVER (PARTITION BY doc_id ORDER BY pos
            ROWS UNBOUNDED PRECEDING), -1) > pos AS covered
  FROM {last}),
kept AS (
  SELECT c.doc_id, c.pos, c.covered, t.tok
  FROM cov c JOIN t2 t ON t.doc_id = c.doc_id AND t.pos = c.pos),
agg AS (
  SELECT doc_id,
    COUNT(*) AS n_pos,
    SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS n_removed,
    string_agg(CASE WHEN NOT covered THEN tok END, ' ' ORDER BY pos) AS s
  FROM kept GROUP BY doc_id)
SELECT doc_id::BIGINT AS doc_id, n_pos::BIGINT AS n_pos,
  CAST(n_removed AS BIGINT) AS n_removed,
  CASE WHEN n_pos = n_removed THEN 0::BIGINT
       ELSE {u64_to_i64(fnv)} END AS kept_fp
FROM agg"""
    )
    return "".join(parts)


def chunk_docs_sql(size: int = 64, stride: int = 48) -> str:
    """Replays corpus.q_chunk_docs: token windows of ``size`` every
    ``stride`` tokens, FNV-1a fingerprint of the space-joined chunk."""
    fnv = (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT,"
        " list_transform(string_split(s, ''), ch -> ascii(ch)::UBIGINT)),"
        " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
        f" % {_U64} AS UBIGINT))"
    )
    return f"""WITH tk AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
ck AS (
  SELECT doc_id, unnest(generate_series(0, (len(tk) - 1) // {stride})) AS i, tk
  FROM tk WHERE len(tk) > 0
),
ch AS (
  SELECT doc_id, i AS chunk_id, i * {stride} AS start,
    LEAST(i * {stride} + {size}, len(tk)) - i * {stride} AS n_tokens,
    array_to_string(list_slice(tk, i * {stride} + 1, i * {stride} + {size}), ' ') AS s
  FROM ck
)
SELECT doc_id::BIGINT AS doc_id, chunk_id::BIGINT AS chunk_id,
  start::BIGINT AS start, n_tokens::BIGINT AS n_tokens,
  {u64_to_i64(fnv)} AS chunk_fp
FROM ch"""


def hrw_shards_sql(n_shards: int = 16) -> str:
    """Replays corpus.q_hrw_shards: S chained splitmix64 hashes per
    doc (salt_s = splitmix64(s+1)), shard = first argmax (numpy
    argmax tie semantics — first max wins)."""
    parts = ["WITH h_in AS (SELECT doc_id FROM documents)"]
    prev = "h_in"
    carry = ["doc_id"]
    hcols = []
    for s in range(n_shards):
        salt = sm64_py(s + 1)
        seed = f"hr{s}_in"
        parts.append(
            f""",
{seed} AS (SELECT {', '.join(carry)}, xor(CAST(doc_id AS UBIGINT), {salt}::UBIGINT) AS hx FROM {prev})"""
        )
        frag, last, hcol = sm64_stages(seed, "hx", f"hr{s}", carry)
        parts.append(frag)
        named = f"h{s}"
        parts.append(
            f""",
hr{s}_out AS (SELECT {', '.join(carry)}, {hcol} AS {named} FROM {last})"""
        )
        carry = carry + [named]
        hcols.append(named)
        prev = f"hr{s}_out"
    greatest = "GREATEST(" + ", ".join(hcols) + ")"
    case = "CASE " + " ".join(
        f"WHEN {c} = g THEN {i}" for i, c in enumerate(hcols)
    ) + " END"
    parts.append(
        f"""
SELECT doc_id::BIGINT AS doc_id, CAST({case} AS BIGINT) AS shard
FROM (SELECT *, {greatest} AS g FROM {prev})"""
    )
    return "".join(parts)


def bloom_probe_sql(
    m_bits: int = 65536, k_hashes: int = 4, eval_mod: int = 5
) -> str:
    """Replays functions/sketches.bloom_membership_probe: FNV-1a text
    fingerprints, k splitmix64 bit positions, filter built on the
    train slice (doc_id % eval_mod != 0), probe on the eval slice,
    exact membership alongside."""
    fnv = (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT,"
        " list_transform(string_split(COALESCE(text, ''), ''), ch -> ascii(ch)::UBIGINT)),"
        " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
        f" % {_U64} AS UBIGINT))"
    )
    parts = [
        f"""WITH fp AS MATERIALIZED (
  SELECT doc_id, doc_id % {eval_mod} = 0 AS is_eval, {fnv} AS fph FROM documents
)"""
    ]
    prev = "fp"
    # NOTE: the carried fingerprint column must NOT be named "h" —
    # sm64_stages uses "h" internally and the duplicate name silently
    # shadows the carried value.
    carry = ["doc_id", "is_eval", "fph"]
    pcols = []
    for j in range(k_hashes):
        salt = sm64_py(j + 1)
        seed = f"bl{j}_in"
        parts.append(
            f""",
{seed} AS (SELECT {', '.join(carry)}, xor(fph, {salt}::UBIGINT) AS hx FROM {prev})"""
        )
        frag, last, hcol = sm64_stages(seed, "hx", f"bl{j}", carry)
        parts.append(frag)
        named = f"p{j}"
        parts.append(
            f""",
bl{j}_out AS (SELECT {', '.join(carry)}, CAST({hcol} % {m_bits} AS BIGINT) AS {named} FROM {last})"""
        )
        carry = carry + [named]
        pcols.append(named)
        prev = f"bl{j}_out"
    union_pos = " UNION ALL ".join(
        f"SELECT {c} AS p FROM {prev} WHERE NOT is_eval" for c in pcols
    )
    bloom_and = " AND ".join(f"{c} IN (SELECT p FROM bits)" for c in pcols)
    parts.append(
        f""",
bits AS MATERIALIZED (SELECT DISTINCT p FROM ({union_pos})),
train_h AS MATERIALIZED (SELECT DISTINCT fph FROM fp WHERE NOT is_eval)
SELECT doc_id::BIGINT AS doc_id,
  CAST(CASE WHEN {bloom_and} THEN 1 ELSE 0 END AS BIGINT) AS bloom_hit,
  CAST(CASE WHEN fph IN (SELECT fph FROM train_h) THEN 1 ELSE 0 END AS BIGINT) AS exact_hit
FROM {prev} WHERE is_eval"""
    )
    return "".join(parts)


def epoch_shuffle_sql(n_epochs: int = 2) -> str:
    """Replays corpus.q_epoch_shuffle: per-epoch hash-sort keys
    splitmix64(doc_id ⊕ splitmix64(epoch+1)), int64-reinterpreted."""
    selects = []
    parts = ["WITH d AS (SELECT doc_id FROM documents)"]
    for e in range(n_epochs):
        salt = sm64_py(e + 1)
        seed = f"ep{e}_in"
        parts.append(
            f""",
{seed} AS (SELECT doc_id, xor(CAST(doc_id AS UBIGINT), {salt}::UBIGINT) AS hx FROM d)"""
        )
        frag, last, hcol = sm64_stages(seed, "hx", f"ep{e}", ["doc_id"])
        parts.append(frag)
        selects.append(
            f"SELECT {e}::BIGINT AS epoch, doc_id::BIGINT AS doc_id, "
            f"{u64_to_i64(hcol)} AS sort_key FROM {last}"
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def cocitation_partsupp_sql(k: int = 100) -> str:
    """Replays relational.q_cocitation_partsupp: supplier pairs by
    shared citing parts, top-k by (n_shared DESC, u, v)."""
    return f"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT a.l_suppkey::BIGINT AS u, b.l_suppkey::BIGINT AS v,
  count(*)::BIGINT AS n_shared
FROM ps a JOIN ps b
  ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
GROUP BY u, v ORDER BY n_shared DESC, u, v LIMIT {k}"""


def wl_colors_sql(rounds: int = 2) -> str:
    """1-WL color refinement over the distinct co-occurrence pairs,
    replayed exactly: init color = degree; per round

        S(v)  = Σ_u splitmix64(c(u))                    (mod 2^64)
        c'(v) = splitmix64((3·splitmix64(c(v)) + S(v))  (mod 2^64))

    — mirrors pipelines/wl.wl_colors bit-for-bit (numpy uint64
    wraparound ≡ HUGEINT % 2^64)."""
    sql = """WITH pr AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT u, v FROM pr UNION ALL SELECT v AS u, u AS v FROM pr),
c0 AS (SELECT u AS vid, CAST(COUNT(*) AS UBIGINT) AS h FROM e GROUP BY u)"""
    cur = "c0"
    for i in range(rounds):
        frag, hcte, _ = sm64_stages(cur, "h", f"wh{i}", ["vid"])
        sql += frag
        sql += f""",
ws{i} AS (
  SELECT e.v AS vid,
         CAST(SUM(CAST(t.h AS HUGEINT)) % {_U64} AS UBIGINT) AS s
  FROM e JOIN {hcte} t ON e.u = t.vid
  GROUP BY e.v
),
wm{i} AS (
  SELECT t.vid,
         CAST(((CAST(t.h AS HUGEINT) * 3) % {_U64}
               + CAST(COALESCE(ws{i}.s, 0::UBIGINT) AS HUGEINT)) % {_U64} AS UBIGINT) AS h
  FROM {hcte} t LEFT JOIN ws{i} ON t.vid = ws{i}.vid
)"""
        frag2, ccte, _ = sm64_stages(f"wm{i}", "h", f"wc{i + 1}", ["vid"])
        sql += frag2
        cur = ccte
    sql += f"\nSELECT vid::BIGINT AS vid, h AS color FROM {cur}"
    return sql


def kmeans_embeddings_sql(n_clusters: int = 8, iters: int = 2, d: int = 64) -> str:
    """Replays functions/similarity.kmeans_quantized bit-for-bit:
    coordinates quantized by floor(x·2^20) (power-of-two scale → the
    multiply is exact), anchors = the n_clusters vectors with the
    smallest splitmix64(vec_id ⊕ mix) hash-ordered, then ``iters``
    exact-integer Lloyd rounds (argmin Σ(q−c)², tie → smaller cluster;
    centroid update = per-coordinate floor(Σq / n), floor-division
    written as (s − ((s%n)+n)%n)/n so DuckDB's truncating % matches
    numpy's flooring //)."""
    from ..config import HASH_SEED

    mix = HASH_SEED * 0x9E3779B97F4A7C15 % (1 << 64)
    frag, cte, _ = sm64_stages("km0", "hx", "km_h", ["vec_id"])
    dist = (
        f"list_sum(list_transform(generate_series(1, {d}), "
        "j -> (qq.qv[j] - ct.qv[j]) * (qq.qv[j] - ct.qv[j])))"
    )
    sql = f"""WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qv
  FROM embeddings
),
km0 AS (SELECT vec_id, xor(CAST(vec_id AS UBIGINT), {mix}::UBIGINT) AS hx FROM q){frag},
cent0 AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY s.h) - 1 AS c, qq.qv
  FROM {cte} s JOIN q qq ON qq.vec_id = s.vec_id
  QUALIFY c < {n_clusters}
)"""
    cur = "cent0"
    for i in range(iters):
        sql += f""",
asg{i} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT qq.vec_id, ct.c,
      ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY {dist}, ct.c) AS rk
    FROM q qq CROSS JOIN {cur} ct
  ) WHERE rk = 1
),
upd{i} AS MATERIALIZED (
  SELECT a.c, t.j, SUM(qq.qv[t.j]) AS s, COUNT(*) AS n
  FROM asg{i} a JOIN q qq USING (vec_id)
       CROSS JOIN generate_series(1, {d}) t(j)
  GROUP BY a.c, t.j
),
cent{i + 1} AS MATERIALIZED (
  SELECT c, list(CAST((s - ((s % n) + n) % n) / n AS BIGINT) ORDER BY j) AS qv
  FROM upd{i} GROUP BY c
  UNION ALL
  SELECT c, qv FROM {cur} WHERE c NOT IN (SELECT c FROM upd{i})
)"""
        cur = f"cent{i + 1}"
    sql += f"""
SELECT vec_id::BIGINT AS vec_id, c::BIGINT AS cluster, CAST(d2 AS BIGINT) AS d2 FROM (
  SELECT qq.vec_id, ct.c, {dist} AS d2,
    ROW_NUMBER() OVER (PARTITION BY qq.vec_id ORDER BY {dist}, ct.c) AS rk
  FROM q qq CROSS JOIN {cur} ct
) WHERE rk = 1"""
    return sql


def coarsen_coocc_sql(rounds: int = 3, seed: int = 11) -> str:
    """Multilevel coarsening step replayed exactly: contract the
    ``rounds``-round greedy maximal matching (``maxmatch_coocc_sql``)
    over the weighted co-occurrence graph (w = shared-order count),
    supervertex id = min endpoint, self-loops dropped, parallel-edge
    weights summed — mirrors pipelines/coarsen.coarsen_by_matching."""
    base = maxmatch_coocc_sql(rounds=rounds, seed=seed)
    return f"""WITH match AS MATERIALIZED (
{base}
),
cpairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, a.l_orderkey AS o
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2, 3
),
cew AS (SELECT u, v, COUNT(*)::BIGINT AS w FROM cpairs GROUP BY 1, 2),
smap AS (SELECT u AS x, u AS s FROM match UNION ALL SELECT v AS x, u AS s FROM match),
re AS (
  SELECT COALESCE(su.s, e.u) AS cu, COALESCE(sv.s, e.v) AS cv, e.w
  FROM cew e
  LEFT JOIN smap su ON e.u = su.x
  LEFT JOIN smap sv ON e.v = sv.x
)
SELECT LEAST(cu, cv)::BIGINT AS u, GREATEST(cu, cv)::BIGINT AS v,
       SUM(w)::BIGINT AS w
FROM re WHERE cu != cv GROUP BY 1, 2"""


def degree_gini_coocc_sql() -> str:
    """Replays relational.q_degree_gini_coocc: ascending window rank
    over co-occurrence degrees (tie order irrelevant — tied rows share
    d), exact integer rank/degree sums, one final DOUBLE division."""
    return f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
r AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d, vid) AS rk FROM deg)
SELECT count(*)::BIGINT AS n_vertices,
  CAST(SUM(d) AS BIGINT) AS sum_deg,
  CAST(2 * SUM(rk * d) - (count(*) + 1) * SUM(d) AS DOUBLE)
    / CAST(count(*) * SUM(d) AS DOUBLE) AS gini
FROM r"""


ROLLUP_SALES = """WITH j AS (
  SELECT r.r_name AS r_name, n.n_name AS n_name,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT (GROUPING(r_name) + GROUPING(n_name))::BIGINT AS lvl,
       COALESCE(r_name, 'ALL') AS r_name,
       COALESCE(n_name, 'ALL') AS n_name,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       count(*)::BIGINT AS n_orders
FROM j GROUP BY ROLLUP (r_name, n_name)"""


REGRESSION_QTY_DISCOUNT = """WITH b AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
),
s AS (
  SELECT flag, count(*)::HUGEINT AS n,
         SUM(x)::HUGEINT AS sx, SUM(y)::HUGEINT AS sy,
         SUM(x*x)::HUGEINT AS sxx, SUM(y*y)::HUGEINT AS syy,
         SUM(x*y)::HUGEINT AS sxy
  FROM b GROUP BY flag
)
SELECT flag, n::BIGINT AS n,
  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
  CAST(sy*sxx - sx*sxy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS intercept,
  CAST(n*sxy - sx*sy AS DOUBLE)
    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
FROM s"""


MODE_EVENT_TYPE = """WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
  FROM c
)
SELECT user_id::BIGINT AS user_id, event_type AS top_type, n AS n_events
FROM r WHERE rk = 1"""


STOPWORD_NORMALIZED_DEDUP = """WITH canon AS (
  SELECT doc_id,
         array_to_string(
           list_filter(string_split(text, ' '), x -> x NOT IN ('the', 'a')),
           ' ') AS ctext
  FROM documents
)
SELECT MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
FROM canon GROUP BY ctext"""


DOC_ENTROPY = """WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
c AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM t GROUP BY doc_id, tok),
s AS (
  SELECT doc_id, SUM(c)::BIGINT AS n, SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
  FROM c GROUP BY doc_id
)
SELECT doc_id::BIGINT AS doc_id, n AS n_tokens,
  ROUND(ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE), 9) AS entropy_r9
FROM s"""


def approx_quantiles_sample_sql(k: int = 256) -> str:
    """Replays relational.q_approx_quantiles_sample: splitmix64 bottom-k
    row sample, then exact order statistics of the sample."""
    frag, last, hcol = sm64_stages("keyed", "hx", "aq", ["cents"])
    return f"""WITH keyed AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         xor(xor(CAST(l_orderkey AS UBIGINT) * 16, CAST(l_linenumber AS UBIGINT)),
             42::UBIGINT) AS hx
  FROM lineitem
){frag},
samp AS (SELECT cents FROM {last} ORDER BY {hcol}, cents LIMIT {k}),
r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk,
             count(*) OVER () AS m
      FROM samp)
SELECT q.bp::BIGINT AS q_bp, r.cents AS cents
FROM (VALUES (5000), (9000), (9900)) AS q(bp)
JOIN r ON r.rk = CAST(ceil(q.bp * r.m / 10000.0) AS BIGINT)"""


MEDIAN_PRICE_BISECT = """WITH c AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
),
r AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk,
         count(*) OVER () AS n
  FROM c
)
SELECT n::BIGINT AS n, cents AS median_cents
FROM r WHERE rk = (n + 1) // 2"""


def triangles_doulion_sql() -> str:
    """Replays relational.q_triangles_doulion: deterministic p=1/4
    splitmix64 edge thinning of the distinct co-occurrence pairs,
    exact triangle count on the sample, integer 1/p³ scale-up."""
    frag, last, hcol = sm64_stages("k2", "hx", "dl", ["u", "v"])
    return f"""WITH {_COOCC_UND_MAT},
k2 AS (
  SELECT u, v,
         xor(CAST((CAST(u AS HUGEINT) * 4294967296) % {_U64} AS UBIGINT),
             CAST(v AS UBIGINT)) AS hx
  FROM pr
){frag},
sp AS (SELECT u, v FROM {last} WHERE {hcol} < 4611686018427387904::UBIGINT),
tri AS (
  SELECT count(*)::BIGINT AS t
  FROM sp e1
  JOIN sp e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN sp e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT t AS sampled_triangles, (t * 64)::BIGINT AS estimate_x64 FROM tri"""


def dag_levels_coocc_sql(rounds: int = 32) -> str:
    """Replays relational.q_dag_levels_coocc: splitmix64 total-order
    orientation of the distinct co-occurrence pairs, then ``rounds``
    unrolled max-plus rounds — level = min(longest-path, rounds)."""
    f1, c1, _ = sm64_stages("base", "ux", "dhu", ["u", "v"])
    f2, c2, _ = sm64_stages("hu1", "vx", "dhv", ["u", "v", "hu"])
    sql = f"""WITH {_COOCC_UND_MAT},
base AS (SELECT u, v, CAST(u AS UBIGINT) AS ux FROM pr){f1},
hu1 AS (SELECT u, v, h AS hu, CAST(v AS UBIGINT) AS vx FROM {c1}){f2},
hh AS (SELECT u, v, hu, h AS hv FROM {c2}),
de AS MATERIALIZED (
  SELECT CASE WHEN (hu < hv) OR (hu = hv AND u < v) THEN u ELSE v END AS u,
         CASE WHEN (hu < hv) OR (hu = hv AND u < v) THEN v ELSE u END AS v
  FROM hh
),
l0 AS (SELECT u AS vid, 0::BIGINT AS l FROM de UNION SELECT v AS vid, 0::BIGINT AS l FROM de)"""
    cur = "l0"
    for r in range(1, rounds + 1):
        sql += f""",
m{r} AS (SELECT de.v AS vid, MAX({cur}.l) + 1 AS ml
         FROM {cur} JOIN de ON de.u = {cur}.vid GROUP BY de.v),
l{r} AS MATERIALIZED (SELECT {cur}.vid,
                CASE WHEN m{r}.ml IS NULL OR m{r}.ml < {cur}.l
                     THEN {cur}.l ELSE m{r}.ml END AS l
         FROM {cur} LEFT JOIN m{r} ON {cur}.vid = m{r}.vid)"""
        cur = f"l{r}"
    sql += f"\nSELECT vid::BIGINT AS vid, l::BIGINT AS level FROM {cur}"
    return sql


DOCLEN_RANK_IN_LANG = """SELECT doc_id,
  lang,
  RANK() OVER (PARTITION BY lang ORDER BY n_chars)::BIGINT AS rk,
  COUNT(*) OVER (PARTITION BY lang)::BIGINT AS n_lang
FROM documents"""


TRIANGLES_INCREMENTAL = """WITH lb AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 10 <> 0
),
bp AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lb a JOIN lb b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
fp AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
bt AS (
  SELECT count(*)::BIGINT AS t
  FROM bp e1 JOIN bp e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN bp e3 ON e3.u = e1.v AND e3.v = e2.v
),
ft AS (
  SELECT count(*)::BIGINT AS t
  FROM fp e1 JOIN fp e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN fp e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT bt.t AS base_triangles, (ft.t - bt.t)::BIGINT AS delta_added,
       ft.t AS full_triangles
FROM bt, ft"""


def hitting_time_coocc_sql(k: int = 8) -> str:
    """Replays relational.q_hitting_time_coocc: k unrolled Jacobi
    sweeps of h ← 1 + D⁻¹A·h with h(1) = 0, ROUND 9."""
    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "deg AS MATERIALIZED (SELECT u AS vid, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY u),",
        "h0 AS (SELECT vid, 0.0 AS h FROM deg)",
    ]
    for i in range(1, k + 1):
        p = f"h{i-1}"
        parts.append(
            f""",
m{i} AS (
  SELECT und.v AS vid, SUM({p}.h) AS s
  FROM und JOIN {p} ON und.u = {p}.vid GROUP BY und.v
),
h{i} AS MATERIALIZED (
  SELECT deg.vid,
         CASE WHEN deg.vid = 1 THEN 0.0
              ELSE 1.0 + COALESCE(m{i}.s, 0) / deg.d END AS h
  FROM deg LEFT JOIN m{i} ON deg.vid = m{i}.vid
)"""
        )
    parts.append(f"\nSELECT vid::BIGINT AS vid, ROUND(h, 9) AS hit_r9 FROM h{k}")
    return "".join(parts)


def split_leakage_sql(threshold: float = 0.5, seed: int = 42) -> str:
    """Replays corpus.q_split_leakage: the MinHash near-dup pair set
    joined (as a pure hash re-derivation, mirroring the engine) with
    each endpoint's split label, counted per (split_a, split_b,
    crosses) cell."""
    from ..functions.splits import DEFAULT_FRACTIONS, split_thresholds

    thresholds = split_thresholds(DEFAULT_FRACTIONS)
    cases = " ".join(
        f"WHEN h < {t}::UBIGINT THEN '{name}'" for name, t in thresholds[:-1]
    )
    frag, cte, hcol = sm64_stages("lk_in", "x", "lk", ["doc_id"])
    return f"""WITH {_minhash_frag(threshold)},
pairs AS MATERIALIZED (SELECT da AS doc_a, db AS doc_b FROM hits),
lk_in AS (
  SELECT doc_id, xor(CAST(doc_id AS UBIGINT), {seed}::UBIGINT) AS x FROM documents
){frag},
sp AS MATERIALIZED (
  SELECT doc_id,
         CASE {cases.replace('h <', hcol + ' <')} ELSE '{thresholds[-1][0]}' END AS split
  FROM {cte}
)
SELECT sa.split AS split_a, sb.split AS split_b,
       (sa.split <> sb.split) AS crosses, count(*)::BIGINT AS n_pairs
FROM pairs p
JOIN sp sa ON sa.doc_id = p.doc_a
JOIN sp sb ON sb.doc_id = p.doc_b
GROUP BY 1, 2, 3"""


DECAYED_ACTIVITY = """WITH mx AS (SELECT max(ts) AS T FROM events)
SELECT user_id::BIGINT AS user_id,
  ROUND(SUM(exp(CAST(epoch_us(ts) - epoch_us((SELECT T FROM mx)) AS DOUBLE)
                / 86400000000.0)), 6) AS score_r6,
  count(*)::BIGINT AS n_events
FROM events GROUP BY user_id"""


WEEKLY_ACTIVE_USERS = """WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
),
fan AS (
  SELECT du.day + o.off AS day, du.user_id
  FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off) o
)
SELECT day::BIGINT AS day, COUNT(DISTINCT user_id)::BIGINT AS wau
FROM fan GROUP BY day"""


def rbo_pagerank_vs_degree_sql(k: int = 100, p: float = 0.9) -> str:
    """Replays relational.q_rbo_pagerank_vs_degree: top-k lists by
    (rank_r9 DESC, vid) and (in-degree DESC, vid), truncated RBO."""
    pr_sql = pagerank_partsupp_sql(4)
    return f"""WITH pr AS MATERIALIZED (
{pr_sql}
),
{_PARTSUPP_EDGES},
dg AS (SELECT dst AS vid, count(*)::BIGINT AS d FROM e GROUP BY dst),
A AS (SELECT vid, ROW_NUMBER() OVER (ORDER BY rank_r9 DESC, vid) AS pa
      FROM pr QUALIFY pa <= {k}),
B AS (SELECT v.vid, ROW_NUMBER() OVER (ORDER BY COALESCE(dg.d, 0) DESC, v.vid) AS pb
      FROM v LEFT JOIN dg ON v.vid = dg.vid QUALIFY pb <= {k}),
J AS MATERIALIZED (SELECT GREATEST(pa, pb) AS m FROM A JOIN B USING (vid)),
D AS (SELECT unnest(generate_series(1, {k})) AS d),
X AS (SELECT d.d, (SELECT count(*) FROM J WHERE m <= d.d) AS x FROM D d)
SELECT (SELECT count(*) FROM J)::BIGINT AS overlap_at_k,
  ROUND(SUM({1.0 - p} * power({p}, d - 1) * x / d), 9) AS rbo_r9
FROM X"""


TRANSITIVITY_COOCC = f"""WITH {_COOCC_UND_MAT},
tri AS (
  SELECT count(*)::BIGINT AS t
  FROM pr e1 JOIN pr e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN pr e3 ON e3.u = e1.v AND e3.v = e2.v
),
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
wdg AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w FROM deg)
SELECT tri.t AS triangles, wdg.w AS wedges,
  CAST(3 * tri.t AS DOUBLE) / CAST(wdg.w AS DOUBLE) AS transitivity
FROM tri, wdg"""


LAPLACIAN_QUADFORM_COOCC = f"""WITH {_COOCC_UND_MAT},
px AS (SELECT p_partkey AS k,
              CAST(ROUND(p_retailprice * 100) AS BIGINT) AS x FROM part)
SELECT count(*)::BIGINT AS n_edges,
  CAST(SUM((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS quad_form,
  (SELECT CAST(SUM(x * x) AS BIGINT) FROM px) AS sum_x2
FROM pr JOIN px a ON pr.u = a.k JOIN px b ON pr.v = b.k"""


def partition_cut_fraction_sql(P: int = 16) -> str:
    return f"""WITH {_COOCC_UND_MAT}
SELECT count(*)::BIGINT AS n_edges,
  CAST(SUM(CASE WHEN u % {P} <> v % {P} THEN 1 ELSE 0 END) AS BIGINT) AS cut_edges,
  CAST(SUM(CASE WHEN u % {P} <> v % {P} THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS cut_fraction
FROM pr"""


DEDUP_SURVIVOR_MASS = """WITH g AS (
  SELECT count(*)::BIGINT AS n, MIN(n_chars)::BIGINT AS chars
  FROM documents GROUP BY text
)
SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
       count(*)::BIGINT AS n_distinct,
       CAST(SUM(n * chars) AS BIGINT) AS chars_total,
       CAST(SUM(chars) AS BIGINT) AS chars_distinct
FROM g"""


def ams_f2_tokens_sql(m: int = 16) -> str:
    """Replays corpus.q_ams_f2_tokens: FNV token hashes, m splitmix64
    sign chains, exact integer estimator sums."""
    fnv_expr = _FNV_TOKEN.split("tok -> ", 1)[1]
    parts = [
        """WITH toks AS (SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents),
th AS (SELECT """
        + fnv_expr
        + """ AS h FROM toks),
cnt AS MATERIALIZED (SELECT h, count(*)::BIGINT AS c FROM th GROUP BY h)"""
    ]
    sels = []
    for k in range(m):
        parts.append(
            f""",
kx{k} AS (SELECT c, xor(h, {k}::UBIGINT) AS x FROM cnt)"""
        )
        frag, cte, hcol = sm64_stages(f"kx{k}", "x", f"ks{k}", ["c"])
        parts.append(frag)
        sels.append(
            f"SELECT {k} AS k, CAST(SUM((1 - 2 * CAST({hcol} % 2::UBIGINT AS BIGINT)) * c) AS BIGINT) AS s FROM {cte}"
        )
    parts.append(
        ",\nsk AS MATERIALIZED (" + "\nUNION ALL\n".join(sels) + ")"
    )
    parts.append(
        f"""
SELECT CAST(SUM(s * s) AS BIGINT) AS sum_sk2,
  (SELECT CAST(SUM(c * c) AS BIGINT) FROM cnt) AS exact_f2,
  CAST(SUM(s * s) AS DOUBLE) / {float(m)} AS est_f2
FROM sk"""
    )
    return "".join(parts)


CONFIG_MODEL_TRIANGLES = f"""WITH {_COOCC_UND_MAT},
tri AS (
  SELECT count(*)::BIGINT AS t
  FROM pr e1 JOIN pr e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN pr e3 ON e3.u = e1.v AND e3.v = e2.v
),
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
mo AS (SELECT CAST(SUM(d) AS BIGINT) AS sd,
              CAST(SUM(d * (d - 1)) AS BIGINT) AS sd2 FROM deg)
SELECT tri.t AS triangles, mo.sd AS sum_d, mo.sd2 AS sum_d2m,
  ROUND(pow(CAST(mo.sd2 AS DOUBLE) / CAST(mo.sd AS DOUBLE), 3) / 6.0, 6) AS expected_r6,
  ROUND(CAST(tri.t AS DOUBLE) / (pow(CAST(mo.sd2 AS DOUBLE) / CAST(mo.sd AS DOUBLE), 3) / 6.0), 6) AS ratio_r6
FROM tri, mo"""


REVENUE_MOM = """WITH m AS (
  SELECT (date_part('year', o_orderdate) - 1970) * 12
         + date_part('month', o_orderdate) - 1 AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT a.month::BIGINT AS month, a.revenue_cents,
  COALESCE(b.revenue_cents, 0)::BIGINT AS prev_cents,
  (a.revenue_cents - COALESCE(b.revenue_cents, 0))::BIGINT AS delta_cents
FROM m a LEFT JOIN m b ON b.month = a.month - 1"""


def bm25_topk_sql(
    terms: tuple = ("hash", "merge", "dup"),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """BM25 top-k over documents with the shared \\S+ tokenizer.

    Same exactness discipline as the tfidf oracle: all sufficient
    statistics (dl, tf, df, Σdl, N) are exact BIGINTs; avgdl and each
    idf come from single IEEE divisions / ln on those ints; the score
    mirrors the engine's expression tree term-by-term (left-assoc
    adds), so the doubles are bit-equal before ROUND r6. Selection and
    ordering on the rounded score."""
    T = len(terms)
    tf_cols = ",\n    ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::BIGINT AS tf{j}"
        for j, t in enumerate(terms)
    )
    df_cols = ",\n    ".join(
        f"SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{j}" for j in range(T)
    )
    idf_cols = ",\n    ".join(
        f"ln((n - df{j} + 0.5) / (df{j} + 0.5) + 1.0) AS idf{j}" for j in range(T)
    )
    one_minus_b, k1p1 = repr(1.0 - b), repr(k1 + 1.0)
    score_terms = "\n      + ".join(
        f"c.idf{j} * (CAST(st.tf{j} AS DOUBLE) * {k1p1} / (CAST(st.tf{j} AS DOUBLE)"
        f" + {repr(k1)} * ({one_minus_b} + {repr(b)} * (CAST(st.dl AS DOUBLE) / c.avgdl))))"
        for j in range(T)
    )
    return f"""WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
), st AS (
  SELECT doc_id, len(toks)::BIGINT AS dl,
    {tf_cols}
  FROM tok
), g AS (
  SELECT count(*)::BIGINT AS n, SUM(dl)::BIGINT AS sum_dl,
    {df_cols}
  FROM st
), c AS (
  SELECT CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl,
    {idf_cols}
  FROM g
)
SELECT st.doc_id, st.dl,
  ROUND({score_terms}, 6) AS bm25_r6
FROM st, c
ORDER BY bm25_r6 DESC, st.doc_id ASC LIMIT {k}"""


CLIQUES4_COOCC = """WITH pr AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
t4 AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c, e3.v AS d
  FROM pr e1
  JOIN pr e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN pr e3 ON e3.u = e1.u AND e3.v > e2.v
  JOIN pr e4 ON e4.u = e1.v AND e4.v = e2.v
  JOIN pr e5 ON e5.u = e1.v AND e5.v = e3.v
  JOIN pr e6 ON e6.u = e2.v AND e6.v = e3.v
),
corners AS (
  SELECT a AS vid FROM t4 UNION ALL SELECT b FROM t4
  UNION ALL SELECT c FROM t4 UNION ALL SELECT d FROM t4
),
verts AS (SELECT DISTINCT vid FROM (SELECT u AS vid FROM pr UNION ALL SELECT v FROM pr)),
cnt AS (SELECT vid, count(*)::BIGINT AS cliques4 FROM corners GROUP BY vid)
SELECT verts.vid AS vid, COALESCE(cnt.cliques4, 0)::BIGINT AS cliques4
FROM verts LEFT JOIN cnt ON verts.vid = cnt.vid"""


AVG_NBR_DEG_COOCC = f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
s AS (SELECT und.u AS vid, SUM(dv.d)::BIGINT AS nbr_deg_sum
      FROM und JOIN deg dv ON und.v = dv.vid GROUP BY und.u)
SELECT s.vid AS vid, du.d AS deg, s.nbr_deg_sum,
  CAST(FLOOR(1000000.0 * CAST(s.nbr_deg_sum AS DOUBLE) / CAST(du.d AS DOUBLE)) AS BIGINT) AS and_ppm
FROM s JOIN deg du ON s.vid = du.vid"""


LANG_JS_DIVERGENCE = """WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
c AS (SELECT lang, tok, count(*)::BIGINT AS c FROM t GROUP BY lang, tok),
tot AS (SELECT lang, SUM(c)::BIGINT AS n FROM c GROUP BY lang),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, a.n AS n_a, b.n AS n_b
  FROM tot a JOIN tot b ON a.lang < b.lang
),
v AS (SELECT DISTINCT tok FROM c),
joined AS (
  SELECT p.lang_a, p.lang_b, p.n_a, p.n_b,
         COALESCE(ca.c, 0)::BIGINT AS ca, COALESCE(cb.c, 0)::BIGINT AS cb
  FROM pairs p
  CROSS JOIN v
  LEFT JOIN c ca ON ca.lang = p.lang_a AND ca.tok = v.tok
  LEFT JOIN c cb ON cb.lang = p.lang_b AND cb.tok = v.tok
),
terms AS (
  SELECT lang_a, lang_b, n_a, n_b,
    CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE))
      * ln(2.0 * (CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE))
           / ((CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)) + (CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE))))
      ELSE 0.0 END AS ta,
    CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE))
      * ln(2.0 * (CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE))
           / ((CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE)) + (CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE))))
      ELSE 0.0 END AS tb
  FROM joined
)
SELECT lang_a, lang_b, n_a, n_b, ROUND(0.5 * SUM(ta) + 0.5 * SUM(tb), 9) AS js_r9
FROM terms GROUP BY lang_a, lang_b, n_a, n_b"""


def posting_samples_sql(k: int = 8) -> str:
    """Inverted-index posting sample: df per token plus the k lowest
    doc_ids, exact ints; same \\S+ tokenizer as the engine."""
    return f"""WITH tok AS (
  SELECT DISTINCT doc_id::BIGINT AS doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
  FROM documents
),
df AS (SELECT tok, count(*)::BIGINT AS df FROM tok GROUP BY tok),
rk AS (
  SELECT tok, doc_id,
         row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rk
  FROM tok
)
SELECT r.tok, d.df, r.rk::BIGINT AS rk, r.doc_id
FROM rk r JOIN df d USING (tok) WHERE r.rk <= {k}"""


def triad_census_sql() -> str:
    """Triangle triad census over the hash-oriented directed
    co-occurrence graph (mirrors pipelines/triangles.triad_census):
    triangles a<b<c from the undirected pair set, each dyad's state
    from the identical splitmix chain (2 = mutual, 1 = low→high,
    0 = high→low), Holland–Leinhardt classification on exact ints."""
    frag1, cte1, _ = sm64_stages("tc_prc", "v", "tc_hb", ["u", "v"])
    frag2, cte2, _ = sm64_stages("tc_x", "x", "tc_hf", ["u", "v"])
    return f"""WITH pr AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tc_prc AS (SELECT CAST(u AS UBIGINT) AS u, CAST(v AS UBIGINT) AS v FROM pr){frag1},
tc_x AS (SELECT u, v, xor(u, h) AS x FROM {cte1}){frag2},
dy AS MATERIALIZED (
  SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
         CASE WHEN h % 4 = 0 THEN 2 WHEN h % 2 = 1 THEN 1 ELSE 0 END AS st
  FROM {cte2}
),
tri AS (
  SELECT CAST(e1.u AS BIGINT) AS a, CAST(e1.v AS BIGINT) AS b, CAST(e2.v AS BIGINT) AS c
  FROM pr e1
  JOIN pr e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN pr e3 ON e3.u = e1.v AND e3.v = e2.v
),
st3 AS (
  SELECT dab.st AS sab, dac.st AS sac, dbc.st AS sbc
  FROM tri
  JOIN dy dab ON dab.u = tri.a AND dab.v = tri.b
  JOIN dy dac ON dac.u = tri.a AND dac.v = tri.c
  JOIN dy dbc ON dbc.u = tri.b AND dbc.v = tri.c
),
feat AS (
  SELECT
    (CASE WHEN sab = 2 THEN 1 ELSE 0 END + CASE WHEN sac = 2 THEN 1 ELSE 0 END
     + CASE WHEN sbc = 2 THEN 1 ELSE 0 END) AS m,
    CASE WHEN sab = 2 THEN (CASE WHEN sac = 0 THEN 1 ELSE 0 END + CASE WHEN sbc = 0 THEN 1 ELSE 0 END)
         WHEN sac = 2 THEN (CASE WHEN sab = 0 THEN 1 ELSE 0 END + CASE WHEN sbc = 1 THEN 1 ELSE 0 END)
         ELSE (CASE WHEN sab = 1 THEN 1 ELSE 0 END + CASE WHEN sac = 1 THEN 1 ELSE 0 END) END AS zout,
    GREATEST(
      CASE WHEN sab = 1 THEN 1 ELSE 0 END + CASE WHEN sac = 1 THEN 1 ELSE 0 END,
      CASE WHEN sab = 0 THEN 1 ELSE 0 END + CASE WHEN sbc = 1 THEN 1 ELSE 0 END,
      CASE WHEN sac = 0 THEN 1 ELSE 0 END + CASE WHEN sbc = 0 THEN 1 ELSE 0 END) AS mx
  FROM st3
),
cls AS (
  SELECT CASE
    WHEN m = 3 THEN '300'
    WHEN m = 2 THEN '210'
    WHEN m = 1 THEN CASE WHEN zout = 2 THEN '120D'
                         WHEN zout = 0 THEN '120U' ELSE '120C' END
    ELSE CASE WHEN mx = 2 THEN '030T' ELSE '030C' END END AS triad
  FROM feat
),
classes(triad) AS (
  VALUES ('030C'), ('030T'), ('120C'), ('120D'), ('120U'), ('210'), ('300')
),
cnt AS (SELECT triad, count(*)::BIGINT AS n FROM cls GROUP BY triad)
SELECT classes.triad, COALESCE(cnt.n, 0)::BIGINT AS n
FROM classes LEFT JOIN cnt USING (triad)"""


REVENUE_GINI = """WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk FROM o)
SELECT count(*)::BIGINT AS n_orders,
  CAST(SUM(cents) AS BIGINT) AS sum_cents,
  CAST(2 * SUM(rk * cents) - (count(*) + 1) * SUM(cents) AS DOUBLE)
    / CAST(count(*) * SUM(cents) AS DOUBLE) AS gini
FROM r"""


CC_BY_DEGREE_COOCC = """WITH pr AS MATERIALIZED (
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
d AS (SELECT u AS vid, COUNT(*) AS deg FROM und GROUP BY u),
pv AS (
  SELECT verts.vid,
    CAST(COALESCE(t.c2, 0) // 2 AS BIGINT) AS triangles,
    CAST(d.deg AS BIGINT) AS deg,
    CAST(CASE WHEN d.deg >= 2
         THEN FLOOR(2000000.0 * CAST(COALESCE(t.c2, 0) // 2 AS DOUBLE) / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0)))
         ELSE 0 END AS BIGINT) AS cc_ppm
  FROM verts LEFT JOIN t ON verts.vid = t.vid JOIN d ON verts.vid = d.vid
)
SELECT deg, count(*)::BIGINT AS n_vertices,
  SUM(triangles)::BIGINT AS sum_triangles,
  SUM(cc_ppm)::BIGINT AS sum_cc_ppm
FROM pv GROUP BY deg"""



def cross_source_neardups_sql(threshold: float = 0.5) -> str:
    """Near-dup provenance matrix: MinHash candidate pairs (identical
    CTE chain as minhash_pairs_sql) classified by their documents'
    source pair, with deterministic zero fill over all source pairs."""
    return f"""WITH {_minhash_frag(threshold)},
ds AS (SELECT doc_id, source FROM documents),
pairsrc AS (
  SELECT LEAST(sa.source, sb.source) AS src_a,
         GREATEST(sa.source, sb.source) AS src_b
  FROM hits JOIN ds sa ON sa.doc_id = hits.da JOIN ds sb ON sb.doc_id = hits.db
),
srcs AS (SELECT DISTINCT source FROM documents),
allp AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM srcs a JOIN srcs b ON a.source <= b.source
),
cnt AS (SELECT src_a, src_b, count(*)::BIGINT AS n FROM pairsrc GROUP BY src_a, src_b)
SELECT allp.src_a, allp.src_b, COALESCE(cnt.n, 0)::BIGINT AS neardup_pairs
FROM allp LEFT JOIN cnt ON cnt.src_a = allp.src_a AND cnt.src_b = allp.src_b"""


def mmr_topk_sql(query_id: int = 0, m: int = 20, k: int = 5, lam: float = 0.75) -> str:
    """Unrolled maximal-marginal-relevance greedy (k selection steps as
    CTEs). Every similarity is ROUND r5 of the same explicit
    inner/(sqrt*sqrt) expression the engine evaluates, every step score
    FLOOR(1e6 * (lambda-combination)) — floor of identical doubles is
    bit-identical where ROUND's decimal half-ties are not — ordered by
    (score desc, vec_id asc), so the greedy picks identical ids."""
    lam_s, om_s = repr(lam), repr(1.0 - lam)
    parts = [f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = {query_id}),
cosq AS (
  SELECT vec_id,
    ROUND(list_inner_product(v, (SELECT v FROM q))
      / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product((SELECT v FROM q), (SELECT v FROM q)))), 5) AS cq
  FROM e WHERE vec_id <> {query_id}
),
cand AS MATERIALIZED (
  SELECT c.vec_id, c.cq, e.v FROM cosq c JOIN e USING (vec_id)
  ORDER BY c.cq DESC, c.vec_id ASC LIMIT {m}
),
sim AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
    ROUND(list_inner_product(a.v, b.v)
      / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 5) AS s
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
),
p1 AS (
  SELECT vec_id, CAST(FLOOR(1000000.0 * ({lam_s} * cq)) AS BIGINT) AS score FROM cand
  ORDER BY score DESC, vec_id ASC LIMIT 1
)"""]
    for i in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT vec_id FROM p{j}" for j in range(1, i))
        parts.append(f""",
sel{i - 1} AS (SELECT vec_id FROM ({prev})),
r{i} AS (
  SELECT c.vec_id, CAST(FLOOR(1000000.0 * ({lam_s} * c.cq - {om_s} * MAX(s.s))) AS BIGINT) AS score
  FROM cand c JOIN sim s ON s.ia = c.vec_id AND s.ib IN (SELECT vec_id FROM sel{i - 1})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  GROUP BY c.vec_id, c.cq
),
p{i} AS (SELECT vec_id, score FROM r{i} ORDER BY score DESC, vec_id ASC LIMIT 1)""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, vec_id, score AS score_u6 FROM p{i}" for i in range(1, k + 1)
    )
    parts.append(f"\n{union}\nORDER BY rank")
    return "".join(parts)


SOURCE_MIXING_WEIGHTS = """WITH t AS (
  SELECT source, len(string_split(text, ' '))::BIGINT AS n FROM documents
),
g AS (SELECT source, SUM(n)::BIGINT AS n_tokens FROM t GROUP BY source),
s AS (SELECT SUM(sqrt(CAST(n_tokens AS DOUBLE))) AS tot FROM g)
SELECT source, n_tokens,
  ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / (SELECT tot FROM s), 9) AS weight_r9
FROM g"""


def quality_ce_calibration_sql() -> str:
    """Quality-band vs pooled bigram-CE calibration: fixed integer
    decile bands of quality_ppm, exact integer CE sums, one IEEE
    division per band (composes the quality-ratio and bigram-CE
    oracles verbatim)."""
    return f"""WITH {_QUALITY_RATIOS},
qb AS (
  SELECT doc_id, CAST(FLOOR(quality * 1000000.0) AS BIGINT) // 100000 AS band FROM q
),
ce AS (SELECT * FROM ({BIGRAM_CE_DOCS}) t),
j AS (SELECT qb.band, ce.ce_num, ce.n_bigrams FROM qb JOIN ce USING (doc_id))
SELECT band, count(*)::BIGINT AS n_docs,
  SUM(ce_num)::BIGINT AS ce_num_sum,
  SUM(n_bigrams)::BIGINT AS n_bigrams_sum,
  CAST(SUM(ce_num) AS DOUBLE) / (1000000.0 * CAST(SUM(n_bigrams) AS DOUBLE)) AS pooled_ce
FROM j GROUP BY band"""


def event_stationary_sql(iters: int = 32) -> str:
    """Unrolled power iteration of the event-type transition chain
    (identical transition probabilities as EVENT_TRANSITIONS; uniform
    start; types with no incoming mass COALESCE to 0)."""
    parts = [
        """WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
tr AS (
  SELECT prev AS src_type, event_type AS dst_type, count(*)::BIGINT AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT src_type, SUM(n)::BIGINT AS t FROM tr GROUP BY 1),
p AS MATERIALIZED (
  SELECT tr.src_type AS s, tr.dst_type AS d,
         CAST(tr.n AS DOUBLE) / CAST(tot.t AS DOUBLE) AS w
  FROM tr JOIN tot USING (src_type)
),
types AS MATERIALIZED (SELECT DISTINCT event_type AS t FROM events),
x0 AS (SELECT t, 1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM types) AS x FROM types)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
x{i} AS MATERIALIZED (
  SELECT p.d AS t, SUM(x{i - 1}.x * p.w) AS x
  FROM x{i - 1} JOIN p ON p.s = x{i - 1}.t
  GROUP BY p.d
)""")
    parts.append(f"""
SELECT types.t AS event_type, ROUND(COALESCE(x{iters}.x, 0.0), 9) AS stat_r9
FROM types LEFT JOIN x{iters} ON x{iters}.t = types.t""")
    return "".join(parts)


def ra_linkpred_coocc_sql(k: int = 100) -> str:
    """Top-k non-adjacent pairs by resource-allocation index (Σ 1/deg
    over common neighbors) + preferential-attachment product; same
    wedge self-join as the Adamic-Adar oracle."""
    return f"""WITH {_COOCC_UND_MAT},
deg AS (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u),
wedge AS (
  SELECT e1.v AS u, e2.v AS w, e1.u AS a
  FROM und e1 JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
),
ra AS (
  SELECT u, w, count(*)::BIGINT AS cn, SUM(1.0 / CAST(d.d AS DOUBLE)) AS s
  FROM wedge JOIN deg d ON wedge.a = d.vid
  GROUP BY u, w
),
cand AS (
  SELECT ra.u, ra.w, ra.cn, ROUND(ra.s, 6) AS ra_r6,
         (du.d * dw.d)::BIGINT AS pa
  FROM ra JOIN deg du ON ra.u = du.vid JOIN deg dw ON ra.w = dw.vid
  WHERE NOT EXISTS (SELECT 1 FROM pr WHERE pr.u = ra.u AND pr.v = ra.w)
)
SELECT CAST(u AS BIGINT) AS u, CAST(w AS BIGINT) AS v, cn, ra_r6, pa
FROM cand ORDER BY ra_r6 DESC, u, v LIMIT {k}"""


ORDER_COUNT_DISTRIBUTION = """WITH per AS (
  SELECT o_custkey, COUNT(*)::BIGINT AS n_orders FROM orders GROUP BY o_custkey
),
hist AS (
  SELECT n_orders, COUNT(*)::BIGINT AS n_customers FROM per GROUP BY n_orders
),
zero AS (
  SELECT CAST(0 AS BIGINT) AS n_orders,
         (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM per) AS n_customers
)
SELECT n_orders, n_customers FROM hist
UNION ALL
SELECT n_orders, n_customers FROM zero WHERE n_customers > 0"""


def large_orders_sql(min_qty: int = 250) -> str:
    """TPC-H Q18 shape: orders with Σ l_quantity ≥ min_qty, exact
    integer qty sums and floor-cents total price."""
    return f"""WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS qty_sum
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) >= {int(min_qty)}
)
SELECT o.o_orderkey, o.o_custkey, CAST(big.qty_sum AS BIGINT) AS qty_sum,
       CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey"""


SMALL_QTY_REVENUE = """WITH per AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS BIGINT)) AS sq,
         COUNT(*)::BIGINT AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*)::BIGINT AS n_items,
       COALESCE(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)), 0)::BIGINT
         AS revenue_cents
FROM lineitem l JOIN per ON l.l_partkey = per.l_partkey
WHERE l.l_quantity <
      CAST(0.2 AS DOUBLE) * (CAST(per.sq AS DOUBLE) / CAST(per.n AS DOUBLE))"""


def priority_late_orders_sql(late_days: int = 60) -> str:
    """TPC-H Q4 shape: per priority, order count + count of orders whose
    max lineitem shipdate exceeds o_orderdate + late_days."""
    return f"""WITH m AS (
  SELECT l_orderkey, MAX(l_shipdate) AS max_ship FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority,
       COUNT(*)::BIGINT AS n_orders,
       COALESCE(SUM(CASE WHEN m.max_ship > o.o_orderdate + INTERVAL {int(late_days)} DAY
                         THEN 1 ELSE 0 END), 0)::BIGINT AS n_late
FROM orders o LEFT JOIN m ON o.o_orderkey = m.l_orderkey
GROUP BY o.o_orderpriority"""


GLOBAL_SALES_OPPORTUNITY = """WITH avg_bal AS (
  SELECT CAST(SUM(CASE WHEN c_acctbal > 0
                       THEN CAST(FLOOR(c_acctbal * 100) AS BIGINT) END) AS DOUBLE)
         / COUNT(*) FILTER (c_acctbal > 0) AS a
  FROM customer
),
have AS (SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '2000-01-01')
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       COUNT(*)::BIGINT AS n_custs,
       SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT))::BIGINT AS bal_cents
FROM customer c, avg_bal
WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT) > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM have WHERE have.o_custkey = c.c_custkey)
GROUP BY c_nationkey"""


def returned_items_topk_sql(k: int = 20) -> str:
    """TPC-H Q10 shape: top-k customers by exact-cents revenue on
    returned ('R') lineitems; ties broken by custkey ascending."""
    return f"""WITH r AS (
  SELECT l_orderkey, SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
),
per AS (
  SELECT o.o_custkey AS c_custkey, SUM(r.cents)::BIGINT AS revenue_cents
  FROM r JOIN orders o ON r.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
)
SELECT c_custkey, revenue_cents FROM per
ORDER BY revenue_cents DESC, c_custkey LIMIT {int(k)}"""


def market_share_by_year_sql(target_region: str = "ASIA") -> str:
    """TPC-H Q8 shape: per ship year, exact-cents revenue from
    target-region suppliers and total revenue."""
    return f"""WITH sr AS (
  SELECT s.s_suppkey, r.r_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT CAST(year(l.l_shipdate) AS BIGINT) AS year,
       SUM(CASE WHEN sr.r_name = '{target_region}'
                THEN CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)
                ELSE 0 END)::BIGINT AS region_cents,
       SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT))::BIGINT AS total_cents
FROM lineitem l JOIN sr ON l.l_suppkey = sr.s_suppkey
GROUP BY year(l.l_shipdate)"""


def shipping_priority_sql(
    segment: str = "BUILDING", cutoff: str = "1998-06-01", k: int = 10
) -> str:
    """TPC-H Q3 shape: top-k unshipped orders of one segment by exact
    integer net revenue (cents x (100 - disc_pct))."""
    return f"""WITH bc AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{segment}'
), o AS (
  SELECT o_orderkey,
         CAST(DATEDIFF('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS odate_days
  FROM orders JOIN bc ON o_custkey = bc.c_custkey
  WHERE o_orderdate < DATE '{cutoff}'
), l AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS net_micents
  FROM lineitem WHERE l_shipdate > DATE '{cutoff}' GROUP BY l_orderkey
)
SELECT o.o_orderkey, o.odate_days, l.net_micents
FROM o JOIN l ON o.o_orderkey = l.l_orderkey
ORDER BY l.net_micents DESC, o.o_orderkey LIMIT {int(k)}"""


def forecast_revenue_sql(year: int = 1997) -> str:
    """TPC-H Q6 shape: one-row filtered scan aggregate on exact
    integer cents x pct."""
    return f"""SELECT COUNT(*)::BIGINT AS n_items,
       COALESCE(SUM(cents * pct), 0)::BIGINT AS disc_revenue_micents
FROM (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS pct
      FROM lineitem
      WHERE l_shipdate >= DATE '{year}-01-01' AND l_shipdate < DATE '{year + 1}-01-01'
        AND l_quantity < 24)
WHERE pct BETWEEN 5 AND 7"""


def linestatus_priority_sql(year: int = 1997) -> str:
    """TPC-H Q12 shape (l_linestatus as the mode column): per status,
    year-shipped lineitems split by order priority class."""
    return f"""WITH li AS (
  SELECT l_orderkey, l_linestatus FROM lineitem
  WHERE l_shipdate >= DATE '{year}-01-01' AND l_shipdate < DATE '{year + 1}-01-01'
)
SELECT li.l_linestatus,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_items,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_items
FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
GROUP BY li.l_linestatus"""


def promo_revenue_sql(year: int = 1997) -> str:
    """TPC-H Q14 shape: per ship month, PROMO-part and total exact
    integer net revenue."""
    return f"""SELECT CAST(YEAR(l.l_shipdate) * 100 + MONTH(l.l_shipdate) AS BIGINT)
         AS month_id,
       COALESCE(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN l.cents * (100 - l.pct) END), 0)::BIGINT
         AS promo_micents,
       CAST(SUM(l.cents * (100 - l.pct)) AS BIGINT) AS total_micents
FROM (SELECT l_partkey, l_shipdate,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS pct
      FROM lineitem
      WHERE l_shipdate >= DATE '{year}-01-01'
        AND l_shipdate < DATE '{year + 1}-01-01') l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY month_id"""


def local_supplier_volume_sql(year: int = 1997) -> str:
    """TPC-H Q5 shape: per-nation revenue where customer and supplier
    share the nation, orders placed in ``year``."""
    return f"""WITH l AS (
  SELECT l_orderkey, l_suppkey,
         CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS net
  FROM lineitem)
SELECT n.n_name, CAST(SUM(l.net) AS BIGINT) AS revenue_micents
FROM l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= DATE '{year}-01-01'
  AND o.o_orderdate < DATE '{year + 1}-01-01'
GROUP BY n.n_name"""


def nation_volume_shipping_sql(y0: int = 1997, y1: int = 1998) -> str:
    """TPC-H Q7 shape: cross-nation ordered-pair revenue per ship year."""
    return f"""WITH l AS (
  SELECT l_orderkey, l_suppkey, CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
         CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS net
  FROM lineitem
  WHERE l_shipdate >= DATE '{y0}-01-01' AND l_shipdate < DATE '{y1 + 1}-01-01')
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, l.l_year,
       CAST(SUM(l.net) AS BIGINT) AS revenue_micents
FROM l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE nc.n_name <> ns.n_name
GROUP BY supp_nation, cust_nation, l.l_year"""


def profit_by_nation_year_sql(p_type: str = "STANDARD") -> str:
    """TPC-H Q9 shape (adapted: net revenue as profit): per supplier
    nation and ship year over ``p_type`` parts."""
    return f"""SELECT n.n_name, CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         AS profit_micents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_type = '{p_type}'
GROUP BY n.n_name, l_year"""


def top_supplier_sql(q_start: str = "1997-01-01", q_end: str = "1997-04-01") -> str:
    """TPC-H Q15 shape: max-revenue supplier(s) over one quarter."""
    return f"""WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS total_micents
  FROM lineitem
  WHERE l_shipdate >= DATE '{q_start}' AND l_shipdate < DATE '{q_end}'
  GROUP BY l_suppkey)
SELECT l_suppkey AS s_suppkey, total_micents FROM rev
WHERE total_micents = (SELECT MAX(total_micents) FROM rev)"""


IMPORTANT_PARTS = """WITH v AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT CAST(SUM(value_cents) AS BIGINT) AS t, COUNT(*)::BIGINT AS n FROM v
)
SELECT v.l_partkey, v.value_cents FROM v, tot
WHERE v.value_cents * tot.n > 2 * tot.t"""


PARTS_SUPPLIER_COUNT = """WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), ok AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
SELECT p.p_brand, p.p_type, COUNT(DISTINCT pr.l_suppkey)::BIGINT AS supplier_cnt
FROM pairs pr
JOIN part p ON pr.l_partkey = p.p_partkey
JOIN ok ON pr.l_suppkey = ok.s_suppkey
GROUP BY p.p_brand, p.p_type"""


DISCOUNTED_REVENUE = """SELECT COUNT(*)::BIGINT AS n_items,
  COALESCE(CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT), 0)
    AS revenue_micents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)"""


MIN_COST_SUPPLIER = """WITH u AS (
  SELECT l_partkey, l_suppkey,
         MIN((CAST(FLOOR(l_extendedprice * 100) AS BIGINT) * 1000)
             // CAST(l_quantity AS BIGINT)) AS unit_millicents
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, l_suppkey, unit_millicents,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY unit_millicents, l_suppkey) AS rn
  FROM u)
SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
       CAST(unit_millicents AS BIGINT) AS unit_millicents
FROM best WHERE rn = 1"""


def promo_part_suppliers_sql(year: int = 1997, min_qty: int = 50) -> str:
    """TPC-H Q20 shape: suppliers shipping > min_qty PROMO units in
    ``year``."""
    return f"""WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
SELECT l_suppkey AS s_suppkey,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem JOIN promo ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '{year}-01-01' AND l_shipdate < DATE '{year + 1}-01-01'
GROUP BY l_suppkey HAVING SUM(CAST(l_quantity AS BIGINT)) > {int(min_qty)}"""


def hashed_classifier_sql(seed: int = 0x5EED_FA57) -> str:
    """Replays functions/text.py:hashed_classifier_batch: FNV-1a token
    hash XOR seed → splitmix64 → centered weight in [-1000, 1000],
    exact int64 per-doc sum, one IEEE division, sign label."""
    fnv = (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT,"
        " list_transform(string_split(t, ''), ch -> ascii(ch)::UBIGINT)),"
        " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
        f" % {_U64} AS UBIGINT))"
    )
    frag, last, hcol = sm64_stages("ht", "h0", "clf", ["doc_id"])
    return f"""WITH tk AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
),
ht AS MATERIALIZED (
  SELECT doc_id, xor({fnv}, {seed}::UBIGINT) AS h0 FROM tk
){frag},
wt AS (SELECT doc_id, CAST({hcol} % 2001 AS BIGINT) - 1000 AS w FROM {last})
SELECT doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_tokens,
  CAST(SUM(w) AS BIGINT) AS score_num,
  CAST(SUM(w) AS DOUBLE) / COUNT(*) AS score,
  (CASE WHEN SUM(w) > 0 THEN 1 ELSE 0 END)::BIGINT AS label
FROM wt GROUP BY doc_id"""


def ce_buckets_by_lang_sql() -> str:
    """Replays q_ce_buckets_by_lang: integer micro-nats-per-bigram
    quotient, per-lang quantile_disc terciles, head/middle/tail."""
    return f"""WITH ce AS MATERIALIZED (SELECT * FROM ({BIGRAM_CE_DOCS}) t),
j AS MATERIALIZED (
  SELECT ce.doc_id::BIGINT AS doc_id, d.lang,
         CAST(ce.ce_num // ce.n_bigrams AS BIGINT) AS ceq
  FROM ce JOIN documents d ON ce.doc_id = d.doc_id
),
t AS (
  SELECT lang, CAST(quantile_disc(ceq, 0.33) AS BIGINT) AS t33,
         CAST(quantile_disc(ceq, 0.66) AS BIGINT) AS t66
  FROM j GROUP BY lang
)
SELECT j.doc_id, j.lang, j.ceq,
  (CASE WHEN j.ceq <= t.t33 THEN 0
        WHEN j.ceq <= t.t66 THEN 1 ELSE 2 END)::BIGINT AS bucket
FROM j JOIN t USING (lang)"""


KNN_LABEL_ACCURACY = """WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), j AS (
  SELECT a.vec_id, a.label AS label, b.label AS nb_label,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY CAST(FLOOR(list_cosine_similarity(b.v, a.v) * 16777216.0)
                    AS BIGINT) DESC, b.vec_id) AS rn
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
)
SELECT label::BIGINT AS label, COUNT(*)::BIGINT AS n,
       SUM(CASE WHEN nb_label = label THEN 1 ELSE 0 END)::BIGINT AS correct
FROM j WHERE rn = 1 GROUP BY label"""


def attack_curve_coocc_sql(ks=(0, 16, 64), rounds: int = 24) -> str:
    """Replays relational.q_attack_curve_coocc: per k, remove the
    top-k degree hubs (degree DESC, vid ASC), min-label propagation
    unrolled ``rounds`` times, component stats. Integer-exact."""
    parts = [
        """WITH pr AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS MATERIALIZED (SELECT u, v FROM pr UNION ALL SELECT v AS u, u AS v FROM pr),
deg AS MATERIALIZED (SELECT u AS vid, count(*)::BIGINT AS d FROM und GROUP BY u)"""
    ]
    selects = []
    for k in ks:
        parts.append(f""",
hub{k} AS MATERIALIZED (SELECT vid FROM deg ORDER BY d DESC, vid LIMIT {int(k)}),
e{k} AS MATERIALIZED (
  SELECT u, v FROM und
  WHERE u NOT IN (SELECT vid FROM hub{k})
    AND v NOT IN (SELECT vid FROM hub{k})
),
a{k}_l0 AS MATERIALIZED (SELECT DISTINCT u AS vid, u AS lab FROM e{k})""")
        for i in range(1, rounds + 1):
            p = f"a{k}_l{i-1}"
            parts.append(f""",
a{k}_rx{i} AS (
  SELECT e.v AS vid, MIN(l.lab) AS m
  FROM e{k} e JOIN {p} l ON l.vid = e.u GROUP BY e.v
),
a{k}_l{i} AS MATERIALIZED (
  SELECT d.vid, LEAST(d.lab, COALESCE(r.m, d.lab)) AS lab
  FROM {p} d LEFT JOIN a{k}_rx{i} r ON r.vid = d.vid
)""")
        selects.append(f"""SELECT {int(k)}::BIGINT AS k,
  SUM(n)::BIGINT AS n_vertices,
  count(*)::BIGINT AS n_components,
  MAX(n)::BIGINT AS largest_size
FROM (SELECT lab, count(*)::BIGINT AS n FROM a{k}_l{rounds} GROUP BY lab)""")
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


MARKOV_PREDICTION_ACCURACY = """WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
tr AS (
  SELECT prev AS src_type, event_type AS dst_type, count(*)::BIGINT AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
),
pred AS (
  SELECT src_type, dst_type FROM (
    SELECT src_type, dst_type,
           ROW_NUMBER() OVER (PARTITION BY src_type
                              ORDER BY n DESC, dst_type) AS rn
    FROM tr) WHERE rn = 1
)
SELECT CAST(SUM(tr.n) AS BIGINT) AS n_transitions,
       CAST(SUM(CASE WHEN tr.dst_type = pred.dst_type
                     THEN tr.n ELSE 0 END) AS BIGINT) AS correct,
       CAST(SUM(CASE WHEN tr.dst_type = pred.dst_type
                     THEN tr.n ELSE 0 END) AS DOUBLE)
         / CAST(SUM(tr.n) AS DOUBLE) AS accuracy
FROM tr JOIN pred USING (src_type)"""


RFM_SEGMENTS = """WITH per AS MATERIALIZED (
  SELECT o_custkey AS c_custkey,
         CAST(MAX(DATEDIFF('day', DATE '1970-01-01', o_orderdate)) AS BIGINT)
           AS last_odate_days,
         COUNT(*)::BIGINT AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders GROUP BY o_custkey
),
t AS (
  SELECT quantile_disc(last_odate_days, 0.25) AS r1,
         quantile_disc(last_odate_days, 0.5) AS r2,
         quantile_disc(last_odate_days, 0.75) AS r3,
         quantile_disc(n_orders, 0.25) AS f1,
         quantile_disc(n_orders, 0.5) AS f2,
         quantile_disc(n_orders, 0.75) AS f3,
         quantile_disc(total_cents, 0.25) AS m1,
         quantile_disc(total_cents, 0.5) AS m2,
         quantile_disc(total_cents, 0.75) AS m3
  FROM per
)
SELECT per.c_custkey, per.last_odate_days, per.n_orders, per.total_cents,
  CAST(((per.last_odate_days > t.r1)::INT + (per.last_odate_days > t.r2)::INT
        + (per.last_odate_days > t.r3)::INT) * 100
     + ((per.n_orders > t.f1)::INT + (per.n_orders > t.f2)::INT
        + (per.n_orders > t.f3)::INT) * 10
     + ((per.total_cents > t.m1)::INT + (per.total_cents > t.m2)::INT
        + (per.total_cents > t.m3)::INT) AS BIGINT) AS rfm_code
FROM per, t"""


def neardup_threshold_sweep_sql(thresholds=(0.3, 0.5, 0.7)) -> str:
    """Replays q_neardup_threshold_sweep: per threshold, the MinHash
    pair count and the size-≥2 cluster stats from the reachability
    closure (each point is an independent WITH RECURSIVE subquery)."""
    subs = []
    for t in thresholds:
        pct = int(round(t * 100))
        subs.append(f"""SELECT * FROM (
WITH RECURSIVE {_minhash_frag(t)},
pe AS (SELECT da AS x, db AS y FROM hits UNION ALL SELECT db, da FROM hits),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT pe.x AS node, reach.r FROM reach JOIN pe ON reach.node = pe.y
),
clus AS (SELECT node AS doc_id, MIN(r) AS cluster FROM reach GROUP BY node),
sz AS (SELECT cluster, count(*)::BIGINT AS n FROM clus GROUP BY cluster),
nz AS (
  SELECT count(*)::BIGINT AS n_clusters,
         COALESCE(MAX(n), 0)::BIGINT AS largest_cluster,
         COALESCE(SUM(n), 0)::BIGINT AS n_dup_docs
  FROM sz WHERE n >= 2
),
np AS (SELECT count(*)::BIGINT AS n_pairs FROM hits)
SELECT {pct}::BIGINT AS threshold_pct, np.n_pairs, nz.n_clusters,
       nz.largest_cluster, nz.n_dup_docs
FROM np, nz) s{pct}""")
    return "\nUNION ALL\n".join(subs)


def sole_late_supplier_sql(late_days: int = 90) -> str:
    """Replays q_sole_late_supplier (TPC-H Q21 shape): per supplier,
    finished multi-supplier orders where it was the sole supplier to
    ship > late_days after the order date."""
    late_us = late_days * 86_400 * 1_000_000
    return f"""WITH li AS (
  SELECT l_orderkey AS okey, l_suppkey AS skey,
         MAX(epoch_us(l_shipdate)) AS max_ts
  FROM lineitem GROUP BY 1, 2
),
j AS (
  SELECT li.okey, li.skey,
         (li.max_ts > epoch_us(o.o_orderdate) + {late_us})::INT AS late
  FROM li JOIN orders o ON li.okey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
),
per AS (
  SELECT okey, count(*) AS n_supp, SUM(late) AS n_late,
         SUM(skey * late) AS late_skey
  FROM j GROUP BY okey
),
w AS (
  SELECT late_skey AS s_suppkey, count(*)::BIGINT AS numwait
  FROM per WHERE n_supp >= 2 AND n_late = 1 GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, w.numwait
FROM w JOIN supplier s ON w.s_suppkey = s.s_suppkey"""


def contamination_13gram_sql(w: int = 13, bench_source: str = "src0") -> str:
    """Replays q_contamination_13gram: FNV-1a hashes of w-token
    shingles; a non-benchmark doc is contaminated iff any of its
    distinct shingle hashes appears among the benchmark source's
    distinct shingle hashes (exact distinct counts both sides)."""
    shingle = " || ' ' || ".join(
        "tk[i]" if j == 0 else f"tk[i+{j}]" for j in range(w)
    )
    fnv = (
        "list_reduce(list_prepend(14695981039346656037::UBIGINT, "
        f"list_transform(string_split({shingle}, ''), ch -> ascii(ch)::UBIGINT)), "
        f"(h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % {_U64} AS UBIGINT))"
    )
    return f"""WITH toks AS (
  SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
shs AS MATERIALIZED (
  SELECT doc_id, source, h FROM (
    SELECT doc_id, source,
      unnest(list_transform(generate_series(1, len(tk) - {w - 1}), i -> {fnv})) AS h
    FROM toks WHERE len(tk) >= {w}
  ) GROUP BY doc_id, source, h
),
bench AS (SELECT DISTINCT h FROM shs WHERE source = '{bench_source}'),
corpus AS (SELECT doc_id, h FROM shs WHERE source <> '{bench_source}'),
per AS (
  SELECT c.doc_id, count(*)::BIGINT AS n_grams,
         SUM((b.h IS NOT NULL)::INT)::BIGINT AS n_hit
  FROM corpus c LEFT JOIN bench b ON c.h = b.h
  GROUP BY c.doc_id
)
SELECT doc_id, n_grams, n_hit FROM per WHERE n_hit >= 1"""


def katz_coocc_sql(alpha: float = 0.005, k: int = 6) -> str:
    """Replays q_katz_coocc bit-exactly: integer path counts
    p_j = A^j·1 (SUM over BIGINT — exact), Horner accumulation
    acc += (α^j)·p_j with the SAME precomputed double constants in the
    SAME left-to-right order as the engine, so every FP op matches."""
    parts = [
        f"WITH {_COOCC_UND},",
        "verts AS (SELECT DISTINCT u AS vid FROM und),",
        "x0 AS MATERIALIZED (SELECT vid, 1::BIGINT AS p, 1.0::DOUBLE AS acc FROM verts)",
    ]
    for i in range(1, k + 1):
        prev = f"x{i-1}"
        parts.append(
            f""",
nb{i} AS (SELECT und.v AS vid, CAST(SUM({prev}.p) AS BIGINT) AS s
          FROM und JOIN {prev} ON und.u = {prev}.vid GROUP BY und.v),
x{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(nb{i}.s, 0) AS p,
         v.acc + {alpha**i!r} * COALESCE(nb{i}.s, 0) AS acc
  FROM {prev} v LEFT JOIN nb{i} ON nb{i}.vid = v.vid)"""
        )
    parts.append(f"\nSELECT vid, ROUND(acc, 9) AS katz_r9 FROM x{k}")
    return "".join(parts)


def dup_span_census_sql(w: int = 8, top: int = 64) -> str:
    """Replays functions/terms.dup_span_census: FNV-1a fingerprints of
    every w-token window, per-(doc, window) pre-counts, global merge,
    top-k by (count DESC, signed fingerprint ASC)."""
    fnv = (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT,"
        " list_transform(string_split(s, ''), ch -> ascii(ch)::UBIGINT)),"
        " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
        f" % {_U64} AS UBIGINT))"
    )
    return f"""WITH tkl AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
wins AS (
  SELECT doc_id,
         array_to_string(list_slice(tk, i, i + {w - 1}), ' ') AS s
  FROM tkl, unnest(generate_series(1, len(tk) - {w - 1})) AS t(i)
  WHERE len(tk) >= {w}
),
fp AS (SELECT doc_id, {u64_to_i64(fnv)} AS w_fp FROM wins),
per_doc AS (
  SELECT doc_id, w_fp, COUNT(*) AS n FROM fp GROUP BY doc_id, w_fp),
agg AS (
  SELECT w_fp, CAST(SUM(n) AS BIGINT) AS n_occurrences,
         COUNT(*)::BIGINT AS n_docs
  FROM per_doc GROUP BY w_fp)
SELECT w_fp, n_occurrences, n_docs
FROM agg ORDER BY n_occurrences DESC, w_fp LIMIT {top}"""


def cross_dup_window_profile_sql(
    bench_source: str = "src0", max_prefix: int = 128, dup_thresh: int = 8
) -> str:
    """Replays functions/suffix.cross_dup_window_profile: the same
    prefix-doubling chain over corpus+benchmark tokens, each level's
    flag = MAX(bench) OVER (PARTITION BY rank) gated to full windows,
    per-NON-benchmark-doc integer aggregate."""
    parts = [
        f"""WITH tkl AS (
  SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
toks AS (
  SELECT doc_id, unnest(generate_series(0, len(tk) - 1)) AS pos,
         tk, len(tk) AS dlen,
         CASE WHEN source = '{bench_source}' THEN 1 ELSE 0 END AS bench
  FROM tkl WHERE len(tk) > 0
),
t2 AS (SELECT doc_id, pos, tk[pos + 1] AS tok, dlen, bench FROM toks),
r1 AS MATERIALIZED (
  SELECT doc_id, pos, dlen, bench, DENSE_RANK() OVER (ORDER BY tok) AS r
  FROM t2),
f1 AS MATERIALIZED (
  SELECT doc_id, pos, dlen, bench, r,
         CASE WHEN MAX(bench) OVER (PARTITION BY r) = 1 THEN 1 ELSE 0 END
           AS xmax
  FROM r1)"""
    ]
    step = 1
    while step < max_prefix:
        prev, w = f"f{step}", step * 2
        parts.append(
            f""",
r{w} AS MATERIALIZED (
  SELECT a.doc_id, a.pos, a.dlen, a.bench,
         DENSE_RANK() OVER (ORDER BY a.r, COALESCE(b.r, 0)) AS r, a.xmax
  FROM {prev} a LEFT JOIN {prev} b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + {step}),
f{w} AS MATERIALIZED (
  SELECT doc_id, pos, dlen, bench, r,
         GREATEST(xmax, CASE WHEN MAX(bench) OVER (PARTITION BY r) = 1
                              AND dlen - pos >= {w}
                             THEN {w} ELSE 0 END) AS xmax
  FROM r{w})"""
        )
        step *= 2
    parts.append(
        f"""
SELECT doc_id::BIGINT AS doc_id,
  CAST(MAX(xmax) AS BIGINT) AS max_shared,
  CAST(SUM(CASE WHEN xmax >= {dup_thresh} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_shared_thresh,
  COUNT(*)::BIGINT AS n_pos
FROM f{step} WHERE bench = 0 GROUP BY doc_id"""
    )
    return "".join(parts)


def effective_resistance_coocc_sql(k: int = 12, src: int = 2, ground: int = 1) -> str:
    """Replays relational.q_effective_resistance_coocc: k unrolled
    Jacobi sweeps of x ← (b + A·x)/d with x(ground) = 0 and b = e_src,
    ROUND 9."""
    parts = [
        f"WITH {_COOCC_UND_MAT},",
        "deg AS MATERIALIZED (SELECT u AS vid, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY u),",
        "x0 AS (SELECT vid, 0.0 AS x FROM deg)",
    ]
    for i in range(1, k + 1):
        p = f"x{i-1}"
        parts.append(
            f""",
m{i} AS (
  SELECT und.v AS vid, SUM({p}.x) AS s
  FROM und JOIN {p} ON und.u = {p}.vid GROUP BY und.v
),
x{i} AS MATERIALIZED (
  SELECT deg.vid,
         CASE WHEN deg.vid = {ground} THEN 0.0
              ELSE (CASE WHEN deg.vid = {src} THEN 1.0 ELSE 0.0 END
                    + COALESCE(m{i}.s, 0)) / deg.d END AS x
  FROM deg LEFT JOIN m{i} ON deg.vid = m{i}.vid
)"""
        )
    parts.append(f"\nSELECT vid::BIGINT AS vid, round_even(x, 9) AS pot_r9 FROM x{k}")
    return "".join(parts)


def clique_percolation_coocc_sql(rounds: int = 16) -> str:
    """Replays relational.q_clique_percolation_coocc: vid-ordered
    triangle enumeration (the same triangle SET the engine's
    degree-ordered orientation emits), edge-graph pack u·2³² + v,
    min-label propagation unrolled ``rounds`` times (extra rounds past
    the engine's fixpoint are no-ops)."""
    S = 1 << 32
    body = []
    for i in range(1, rounds + 1):
        p = f"l{i-1}"
        body.append(
            f""",
mn{i} AS (SELECT de.v AS vid, MIN(x.lab) AS m FROM de JOIN {p} x ON de.u = x.vid GROUP BY de.v),
l{i} AS MATERIALIZED (
  SELECT l.vid, LEAST(l.lab, COALESCE(m.m, l.lab)) AS lab
  FROM {p} l LEFT JOIN mn{i} m ON l.vid = m.vid
)"""
        )
    return f"""WITH pr AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS MATERIALIZED (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM pr e1 JOIN pr e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN pr e3 ON e3.u = e1.v AND e3.v = e2.v
),
ed0 AS (
  SELECT x * {S} + y AS a, x * {S} + z AS b FROM tri
  UNION ALL SELECT x * {S} + y, y * {S} + z FROM tri
  UNION ALL SELECT x * {S} + z, y * {S} + z FROM tri
),
de AS MATERIALIZED (SELECT a AS u, b AS v FROM ed0 UNION ALL SELECT b AS u, a AS v FROM ed0),
verts AS (SELECT DISTINCT u AS vid FROM de),
l0 AS MATERIALIZED (SELECT vid, vid AS lab FROM verts){"".join(body)}
SELECT CAST(vid // {S} AS BIGINT) AS u, CAST(vid % {S} AS BIGINT) AS v,
       CAST(lab AS BIGINT) AS community
FROM l{rounds}"""


def ngram_novelty_sql(w: int = 8) -> str:
    """Replays functions/dedup.ngram_novelty: distinct w-token FNV
    shingles per doc, first-seen = min doc_id per shingle, per-doc
    novelty ratio (round_even — the ratio is an exact dyadic rational
    whenever the shingle count is a power of two, so the tie rule
    matters; the engine's pc.round is half-to-even)."""
    terms = " || ' ' || ".join("tk[i]" if j == 0 else f"tk[i+{j}]" for j in range(w))
    return f"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk FROM documents
),
shs AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - {w - 1}),
         i -> {terms})) AS s
  FROM toks
),
shrw AS MATERIALIZED (
  SELECT DISTINCT doc_id, list_reduce(
    list_prepend(14695981039346656037::UBIGINT,
      list_transform(string_split(s, ''), ch -> ascii(ch)::UBIGINT)),
    (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % {_U64} AS UBIGINT)
  ) AS sh
  FROM shs
),
fs AS MATERIALIZED (SELECT sh, MIN(doc_id) AS fd FROM shrw GROUP BY sh)
SELECT s.doc_id::BIGINT AS doc_id,
  COUNT(*)::BIGINT AS n_shingles,
  SUM(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_first_seen,
  round_even(SUM(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END)::DOUBLE
             / COUNT(*)::DOUBLE, 6) AS novelty_r6
FROM shrw s JOIN fs f USING (sh)
GROUP BY s.doc_id"""


def label_centroid_drift_sql(d: int = 64) -> str:
    """Replays functions/similarity.label_centroid_drift: floor(x·2²⁰)
    quantized per-(label, dim) integer sums (exact), centroid = s/n,
    cosine of each label centroid vs the global centroid, ROUND 6
    (the 64-term float dot is the only order-sensitive step)."""
    return f"""WITH q AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qv
  FROM embeddings
),
s AS MATERIALIZED (
  SELECT label, t.j AS dim, SUM(qv[t.j]) AS s, COUNT(*) AS n
  FROM q CROSS JOIN generate_series(1, {d}) t(j)
  GROUP BY label, t.j
),
g AS (SELECT dim, SUM(s)::DOUBLE / SUM(n)::DOUBLE AS gc FROM s GROUP BY dim),
c AS (SELECT label, dim, s::DOUBLE / n::DOUBLE AS cc, n FROM s),
agg AS (
  SELECT c.label, MAX(c.n) AS n,
         SUM(c.cc * g.gc) AS dp, SUM(c.cc * c.cc) AS na, SUM(g.gc * g.gc) AS nb
  FROM c JOIN g USING (dim) GROUP BY c.label
)
SELECT label::BIGINT AS label, n::BIGINT AS n_vecs,
       round_even(dp / (sqrt(na) * sqrt(nb)), 6) AS cos_r6
FROM agg"""


def onion_layers_coocc_sql(rounds: int = 16) -> str:
    """Replays pipelines/densest.onion_layers over the co-occurrence
    graph: per round, alive-subgraph degrees (isolated survivors count
    0), k = running max of the surviving min degree, peel d ≤ k;
    survivors after ``rounds`` → (−1, −1)."""
    body = []
    for i in range(1, rounds + 1):
        p = i - 1
        body.append(
            f""",
dg{i} AS (
  SELECT und.u AS vid, COUNT(*) AS d
  FROM und JOIN a{p} au ON und.u = au.vid JOIN a{p} av ON und.v = av.vid
  GROUP BY und.u
),
dd{i} AS MATERIALIZED (
  SELECT a.vid, COALESCE(d.d, 0) AS d FROM a{p} a LEFT JOIN dg{i} d USING (vid)
),
kc{i} AS MATERIALIZED (
  SELECT GREATEST((SELECT k FROM kc{p}),
                  COALESCE((SELECT MIN(d) FROM dd{i}), (SELECT k FROM kc{p}))) AS k
),
rem{i} AS (
  SELECT vid, {i} AS layer, (SELECT k FROM kc{i}) AS k
  FROM dd{i} WHERE d <= (SELECT k FROM kc{i})
),
a{i} AS MATERIALIZED (
  SELECT vid FROM dd{i} WHERE d > (SELECT k FROM kc{i})
)"""
        )
    unions = "\nUNION ALL ".join(
        f"SELECT vid::BIGINT AS vid, layer::BIGINT AS layer, k::BIGINT AS k FROM rem{i}"
        for i in range(1, rounds + 1)
    )
    return f"""WITH {_COOCC_UND_MAT},
a0 AS MATERIALIZED (SELECT DISTINCT u AS vid FROM und),
kc0 AS (SELECT 0 AS k){"".join(body)}
{unions}
UNION ALL SELECT vid::BIGINT, -1::BIGINT, -1::BIGINT FROM a{rounds}"""


def ann_recall_at_k_sql(
    query_ids=(0, 7, 42), k: int = 5, n_clusters: int = 16, nprobe: int = 2
) -> str:
    """Replays functions/similarity.ann_recall_at_k: anchor codebook
    (splitmix bottom-k, hash-ordered), argmax-cosine assignment, top-
    ``nprobe`` probed anchors per query, IVF top-k among candidates vs
    exact brute top-k, per-query intersection count and recall@k."""
    from ..config import HASH_SEED

    mix = HASH_SEED * 0x9E3779B97F4A7C15 % (1 << 64)
    frag, cte, _ = sm64_stages("rc0", "hx", "rc_h", ["vec_id"])
    qlist = ", ".join(str(q) for q in query_ids)
    return f"""WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e0 FROM embeddings
),
nrm AS MATERIALIZED (
  SELECT vec_id, list_transform(e0, x -> x / sqrt(list_inner_product(e0, e0))) AS e
  FROM base
),
rc0 AS (SELECT vec_id, xor(CAST(vec_id AS UBIGINT), {mix}::UBIGINT) AS hx FROM base){frag},
anch AS MATERIALIZED (
  SELECT n.vec_id, n.e, ROW_NUMBER() OVER (ORDER BY s.h) - 1 AS c
  FROM {cte} s JOIN nrm n ON n.vec_id = s.vec_id
  QUALIFY c < {n_clusters}
),
asg AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT n.vec_id, a.c,
      ROW_NUMBER() OVER (PARTITION BY n.vec_id
                         ORDER BY list_inner_product(n.e, a.e) DESC, a.c) AS rk
    FROM nrm n CROSS JOIN anch a
  ) WHERE rk = 1
),
qv AS MATERIALIZED (SELECT vec_id AS query_id, e FROM nrm WHERE vec_id IN ({qlist})),
probe AS MATERIALIZED (
  SELECT query_id, c FROM (
    SELECT q.query_id, a.c,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
                         ORDER BY list_inner_product(q.e, a.e) DESC, a.c) AS rk
    FROM qv q CROSS JOIN anch a
  ) WHERE rk <= {nprobe}
),
ivf AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, g.vec_id,
      ROW_NUMBER() OVER (PARTITION BY p.query_id
        ORDER BY list_inner_product(n.e, q.e) DESC, g.vec_id) AS rk
    FROM probe p JOIN asg g ON g.c = p.c
    JOIN nrm n ON n.vec_id = g.vec_id
    JOIN qv q ON q.query_id = p.query_id
    WHERE g.vec_id <> p.query_id
  ) WHERE rk <= {k}
),
brute AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, n.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
        ORDER BY list_inner_product(n.e, q.e) DESC, n.vec_id) AS rk
    FROM qv q JOIN nrm n ON n.vec_id <> q.query_id
  ) WHERE rk <= {k}
)
SELECT q.query_id::BIGINT AS query_id,
  COALESCE(h.n, 0)::BIGINT AS n_hits,
  ROUND(COALESCE(h.n, 0)::DOUBLE / {k}.0, 6) AS recall_r6
FROM (SELECT DISTINCT query_id FROM qv) q
LEFT JOIN (
  SELECT i.query_id, COUNT(*) AS n
  FROM ivf i JOIN brute b ON b.query_id = i.query_id AND b.vec_id = i.vec_id
  GROUP BY i.query_id
) h ON h.query_id = q.query_id"""


def pii_scrub_sql() -> str:
    """Replays pipelines/corpus.q_pii_scrub: deterministic doc_id-keyed
    PII augmentation, staged count+redact (emails, then phones on the
    email-scrubbed text, then IPs), char-level FNV-1a fingerprint of
    the final scrubbed string. Patterns are the RE2 ∩ Python-re common
    dialect used by functions/text.pii_scrub_batch."""
    em = "'[a-z0-9]+@[a-z0-9]+\\.[a-z]+'"
    ph = "'\\b555-[0-9]{4}\\b'"
    ip = "'\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'"
    fnv = (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT,"
        " list_transform(string_split(s, ''), ch -> ascii(ch)::UBIGINT)),"
        " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
        f" % {_U64} AS UBIGINT))"
    )
    return f"""WITH aug AS (
  SELECT doc_id,
    COALESCE(text, '') || ' contact user' || doc_id::VARCHAR || '@example' || (doc_id % 7)::VARCHAR || '.org'
      || CASE WHEN doc_id % 5 = 0
              THEN ' or admin' || doc_id::VARCHAR || '@mail' || (doc_id % 11)::VARCHAR || '.net'
              ELSE '' END
      || CASE WHEN doc_id % 3 = 0
              THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
              ELSE '' END
      || CASE WHEN doc_id % 4 = 0
              THEN ' ip 10.' || (doc_id % 256)::VARCHAR || '.' || ((7 * doc_id) % 256)::VARCHAR
                   || '.' || ((13 * doc_id) % 256)::VARCHAR
              ELSE '' END AS t
  FROM documents),
st1 AS (
  SELECT doc_id, len(regexp_extract_all(t, {em}))::BIGINT AS n_emails,
         regexp_replace(t, {em}, '<EMAIL>', 'g') AS s1
  FROM aug),
st2 AS (
  SELECT doc_id, n_emails, len(regexp_extract_all(s1, {ph}))::BIGINT AS n_phones,
         regexp_replace(s1, {ph}, '<PHONE>', 'g') AS s2
  FROM st1),
st3 AS (
  SELECT doc_id, n_emails, n_phones,
         len(regexp_extract_all(s2, {ip}))::BIGINT AS n_ips,
         regexp_replace(s2, {ip}, '<IP>', 'g') AS s
  FROM st2)
SELECT doc_id, n_emails, n_phones, n_ips, {u64_to_i64(fnv)} AS scrub_fp
FROM st3"""


def rich_club_sql(ks=(64, 90, 105, 120, 150)) -> str:
    """Replays relational.q_rich_club_coocc: degree of the distinct
    a<b co-occurrence pair graph, then per-k counts of above-k vertices
    and above-k/above-k edges, φ = 2e/(n(n−1)) rounded at 6."""
    klist = ", ".join(str(int(k)) for k in sorted(ks))
    return f"""WITH pr AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
und AS (SELECT u, v FROM pr UNION ALL SELECT v AS u, u AS v FROM pr),
deg AS (SELECT u AS vid, COUNT(*)::BIGINT AS d FROM und GROUP BY u),
ks AS (SELECT UNNEST([{klist}]) AS k)
SELECT ks.k::BIGINT AS k,
  (SELECT COUNT(*) FROM deg WHERE d > ks.k)::BIGINT AS n_k,
  (SELECT COUNT(*) FROM pr
     JOIN deg du ON du.vid = pr.u
     JOIN deg dv ON dv.vid = pr.v
   WHERE du.d > ks.k AND dv.d > ks.k)::BIGINT AS e_k,
  CASE WHEN (SELECT COUNT(*) FROM deg WHERE d > ks.k) < 2 THEN 0.0
       ELSE round_even(2.0 * (SELECT COUNT(*) FROM pr
                           JOIN deg du ON du.vid = pr.u
                           JOIN deg dv ON dv.vid = pr.v
                         WHERE du.d > ks.k AND dv.d > ks.k)
                  / ((SELECT COUNT(*) FROM deg WHERE d > ks.k)
                     * ((SELECT COUNT(*) FROM deg WHERE d > ks.k) - 1.0)), 6)
  END AS phi_r6
FROM ks"""


def grid_conv_wass_sql(
    h: int = 8, w: int = 8, reg: float = 0.05, n_iters: int = 4, eps: float = 1e-12
) -> str:
    """Replays pipelines/diffusion.grid_conv_wasserstein_barycenter:
    embeddings reshaped to h×w grids, shift-normalized, then
    ``n_iters`` unrolled Sinkhorn rounds with the separable Gaussian
    kernel K[i,j] = exp(−((i−j)/(n−1))²/reg); the cross-image
    geometric-mean reduce uses the engine's quantized-integer log sums
    (floor(ln(ku + eps)·2³⁰) — order-independent), final barycenter
    round_even 6."""
    Q = float(1 << 30)
    d = h * w
    body = []
    prev_u = "u0"
    prev_bar = "bar0"
    for it in range(1, n_iters + 1):
        body.append(f""",
t{it}a AS (  -- row blur of U: T[img,r,c] = sum_r' K1[r,r']*U[img,r',c]
  SELECT u.img, k.i AS r, u.cell % {w} AS c, SUM(k.v * u.u) AS t
  FROM {prev_u} u JOIN k1 k ON k.j = u.cell // {w}
  GROUP BY 1, 2, 3
),
ku{it} AS MATERIALIZED (  -- col blur: KU[img,r,c] = sum_c' K2[c,c']*T[img,r,c']
  SELECT t.img, t.r * {w} + k.i AS cell, SUM(k.v * t.t) AS ku
  FROM t{it}a t JOIN k2 k ON k.j = t.c
  GROUP BY 1, 2
),
v{it}a AS (
  SELECT ku.img, ku.cell, b.bar / (ku.ku + {eps!r}) AS v
  FROM ku{it} ku JOIN {prev_bar} b ON b.cell = ku.cell
),
t{it}b AS (
  SELECT v.img, k.i AS r, v.cell % {w} AS c, SUM(k.v * v.v) AS t
  FROM v{it}a v JOIN k1 k ON k.j = v.cell // {w}
  GROUP BY 1, 2, 3
),
kv{it} AS (
  SELECT t.img, t.r * {w} + k.i AS cell, SUM(k.v * t.t) AS kv
  FROM t{it}b t JOIN k2 k ON k.j = t.c
  GROUP BY 1, 2
),
u{it} AS MATERIALIZED (
  SELECT p.img, p.cell, p.p / (kv.kv + {eps!r}) AS u
  FROM p JOIN kv{it} kv ON kv.img = p.img AND kv.cell = p.cell
),
t{it}c AS (
  SELECT u.img, k.i AS r, u.cell % {w} AS c, SUM(k.v * u.u) AS t
  FROM u{it} u JOIN k1 k ON k.j = u.cell // {w}
  GROUP BY 1, 2, 3
),
ku{it}n AS (
  SELECT t.img, t.r * {w} + k.i AS cell, SUM(k.v * t.t) AS ku
  FROM t{it}c t JOIN k2 k ON k.j = t.c
  GROUP BY 1, 2
),
bar{it} AS MATERIALIZED (
  SELECT cell,
    exp(SUM(CAST(floor(ln(ku + {eps!r}) * {Q!r}) AS BIGINT))::DOUBLE
        / ({Q!r} * (SELECT COUNT(DISTINCT img) FROM p))) AS bar
  FROM ku{it}n GROUP BY cell
)""")
        prev_u = f"u{it}"
        prev_bar = f"bar{it}"
    return f"""WITH k1 AS MATERIALIZED (
  SELECT a.i, b.j, exp(-pow((a.i - b.j) / {float(h - 1)!r}, 2) / {reg!r}) AS v
  FROM generate_series(0, {h - 1}) a(i) CROSS JOIN generate_series(0, {h - 1}) b(j)
),
k2 AS MATERIALIZED (
  SELECT a.i, b.j, exp(-pow((a.i - b.j) / {float(w - 1)!r}, 2) / {reg!r}) AS v
  FROM generate_series(0, {w - 1}) a(i) CROSS JOIN generate_series(0, {w - 1}) b(j)
),
raw AS (
  SELECT vec_id AS img, t.j - 1 AS cell, CAST(embedding[t.j] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, {d}) t(j)
),
mn AS (SELECT img, MIN(x) AS m, COUNT(*) AS nc FROM raw GROUP BY img),
shifted AS (
  SELECT r.img, r.cell, r.x - mn.m + 0.1 AS a
  FROM raw r JOIN mn ON mn.img = r.img
),
sm AS (SELECT img, SUM(a) AS s FROM shifted GROUP BY img),
p AS MATERIALIZED (
  SELECT sh.img, sh.cell, sh.a / sm.s AS p
  FROM shifted sh JOIN sm ON sm.img = sh.img
),
u0 AS MATERIALIZED (SELECT img, cell, 1.0 AS u FROM p),
bar0 AS (SELECT cell, 1.0 / {d} AS bar FROM (SELECT DISTINCT cell FROM p)){"".join(body)}
SELECT cell::BIGINT AS cell, round_even(bar, 6) AS bary_r6 FROM bar{n_iters}"""


def train_logreg_sql(
    dim: int = 64,
    iters: int = 4,
    lr: float = 0.5,
    seed: int = 0x5EED_FA57,
    pos_lang: str = "en",
) -> str:
    """Replays functions/text.train_hashed_logreg: hashed
    bag-of-tokens features x_j = cnt_j/n_tokens (bucket =
    splitmix64(fnv1a(tok) ⊕ seed) mod dim), y = [lang = pos_lang],
    ``iters`` unrolled full-batch GD rounds with the engine's
    three-level quantization: z_q = ⌊z·2²⁴⌋, p_q = ⌊2²⁰·σ(z_q/2²⁴)⌋,
    per-(doc, j) gradient ⌊(p_q/2²⁰ − y)·x·2³⁰⌋ summed as BIGINT
    (order-independent); w update in DOUBLE. Final weights
    round_even 6."""
    Q = float(1 << 30)
    ZQ = float(1 << 24)
    PQ = float(1 << 20)
    fnv = (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT,"
        " list_transform(string_split(t, ''), ch -> ascii(ch)::UBIGINT)),"
        " (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211)"
        f" % {_U64} AS UBIGINT))"
    )
    frag, last, hcol = sm64_stages("ht", "h0", "lrg", ["doc_id"])
    body = []
    prev_w = "w0"
    for it in range(1, iters + 1):
        body.append(f""",
z{it} AS (
  SELECT f.doc_id, f.y, floor(SUM(f.x * w.w) * {ZQ!r}) AS zq
  FROM feat f JOIN {prev_w} w ON w.j = f.j
  GROUP BY f.doc_id, f.y
),
p{it} AS (
  SELECT doc_id, y, floor({PQ!r} / (1.0 + exp(-(zq / {ZQ!r})))) AS pq FROM z{it}
),
g{it} AS (
  SELECT f.j,
    SUM(CAST(floor((p.pq / {PQ!r} - p.y) * f.x * {Q!r}) AS BIGINT)) AS g
  FROM feat f JOIN p{it} p ON p.doc_id = f.doc_id
  GROUP BY f.j
),
w{it} AS MATERIALIZED (
  SELECT w.j,
    w.w - {lr!r} * ((COALESCE(g.g, 0)::DOUBLE / {Q!r}) / (SELECT n FROM nd)) AS w
  FROM {prev_w} w LEFT JOIN g{it} g ON g.j = w.j
)"""
        )
        prev_w = f"w{it}"
    return f"""WITH tk AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
),
ht AS MATERIALIZED (
  SELECT doc_id, xor({fnv}, {seed}::UBIGINT) AS h0 FROM tk
){frag},
bk AS (SELECT doc_id, CAST({hcol} % {dim} AS BIGINT) AS j FROM {last}),
ntok AS (SELECT doc_id, COUNT(*)::DOUBLE AS n_tokens FROM bk GROUP BY doc_id),
ylab AS (
  SELECT doc_id, MAX(CASE WHEN lang = '{pos_lang}' THEN 1 ELSE 0 END) AS y
  FROM tk GROUP BY doc_id
),
cnt AS (SELECT doc_id, j, COUNT(*)::DOUBLE AS c FROM bk GROUP BY doc_id, j),
feat AS MATERIALIZED (
  SELECT c.doc_id, y.y, c.j, c.c / nt.n_tokens AS x
  FROM cnt c JOIN ntok nt ON nt.doc_id = c.doc_id
  JOIN ylab y ON y.doc_id = c.doc_id
),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM feat),
w0 AS (SELECT t.j - 1 AS j, 0.0 AS w FROM generate_series(1, {dim}) t(j)){"".join(body)}
SELECT j::BIGINT AS j, round_even(w, 6) AS w_r6 FROM w{iters}"""
