"""DuckDB oracle SQL builders for the driver's correctness gate.

Every Ray pipeline exposed in ``__ray_entry__.queries()`` has an equivalent
ANSI-SQL formulation here, runnable by DuckDB over the SAME generated
transcript parquet (iterative algorithms are expressed as programmatically
unrolled iteration CTEs — fixed supersteps exactly like the engine).

The shared prelude derives the node dictionary and edge table relationally:
``dense_rank() OVER (ORDER BY kind, key) - 1`` reproduces the engine's
sorted-dictionary id assignment bit-for-bit (ASCII binary collation both
sides). See ``asterixdb_analytics_ray/graph.py``.

Floating-point note: PageRank sums in a different order than numpy, so both
sides round to 9 decimals (abs FP noise is ≲1e-15 here; the correctness gate
itself is allclose 1e-6).
"""

from __future__ import annotations

PR_SUPERSTEPS = 10  # reference default ITERATIONS=10 ⇒ 9 applies
CC_MAX_ITERS = 30  # ≥ graph diameter (turn chains ≤ 16 hops; conv-tool core ~8)
LP_ROUNDS = 5
SSSP_ITERS = 30
ROUND_DECIMALS = 9


def prelude(transcripts_path: str) -> str:
    """CTEs: transcripts → pairs → node dictionary → int64 edge table."""
    return f"""
WITH t AS MATERIALIZED (SELECT * FROM read_parquet('{transcripts_path}')),
conv_tool AS MATERIALIZED (SELECT DISTINCT conv_id, tool FROM t WHERE tool IS NOT NULL),
reply AS MATERIALIZED (
  SELECT conv_id,
         conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 4, '0') AS src_key,
         conv_id || ':' || lpad(CAST(nxt AS VARCHAR), 4, '0') AS dst_key
  FROM (SELECT conv_id, turn_idx,
               lead(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt
        FROM t)
  WHERE nxt IS NOT NULL
),
tool_cooc AS MATERIALIZED (
  SELECT DISTINCT x.tool AS tool_a, y.tool AS tool_b
  FROM conv_tool x JOIN conv_tool y
    ON x.conv_id = y.conv_id AND x.tool < y.tool
),
node_keys AS MATERIALIZED (
  SELECT 'conv' AS kind, conv_id AS key FROM conv_tool
  UNION
  SELECT 'tool', tool FROM conv_tool
  UNION
  SELECT 'turn', src_key FROM reply
  UNION
  SELECT 'turn', dst_key FROM reply
  UNION
  SELECT 'tool', tool_a FROM tool_cooc
  UNION
  SELECT 'tool', tool_b FROM tool_cooc
),
nodes AS MATERIALIZED (
  SELECT CAST(dense_rank() OVER (ORDER BY kind, key) - 1 AS BIGINT) AS node_id,
         kind, key
  FROM node_keys
),
edges AS MATERIALIZED (
  SELECT ns.node_id AS src, nd.node_id AS dst, 'conv_tool' AS kind
  FROM conv_tool ct
  JOIN nodes ns ON ns.kind = 'conv' AND ns.key = ct.conv_id
  JOIN nodes nd ON nd.kind = 'tool' AND nd.key = ct.tool
  UNION ALL
  SELECT ns.node_id, nd.node_id, 'reply'
  FROM reply r
  JOIN nodes ns ON ns.kind = 'turn' AND ns.key = r.src_key
  JOIN nodes nd ON nd.kind = 'turn' AND nd.key = r.dst_key
  UNION ALL
  SELECT ns.node_id, nd.node_id, 'tool_cooc'
  FROM tool_cooc tc
  JOIN nodes ns ON ns.kind = 'tool' AND ns.key = tc.tool_a
  JOIN nodes nd ON nd.kind = 'tool' AND nd.key = tc.tool_b
),
und AS MATERIALIZED (
  SELECT src, dst FROM edges WHERE src <> dst
  UNION
  SELECT dst, src FROM edges WHERE src <> dst
),
ori AS MATERIALIZED (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
  GROUP BY 1, 2
),
verts AS MATERIALIZED (SELECT node_id AS v FROM nodes),
nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src)
"""


def nodes_sql(p: str) -> str:
    return prelude(p) + "SELECT node_id, kind, key FROM nodes"


def edge_counts_sql(p: str) -> str:
    return prelude(p) + "SELECT kind, count(*) AS n_edges FROM edges GROUP BY kind"


def out_degrees_sql(p: str) -> str:
    return (
        prelude(p)
        + "SELECT src AS v, count(*) AS out_degree FROM edges GROUP BY src"
    )


def top_degree_sql(p: str, k: int = 10) -> str:
    return (
        prelude(p)
        + "SELECT src AS v, count(*) AS out_degree FROM edges GROUP BY src "
        f"ORDER BY out_degree DESC, v ASC LIMIT {k}"
    )


def pagerank_sql(p: str, supersteps: int = PR_SUPERSTEPS) -> str:
    parts = [prelude(p)]
    parts.append(", r0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nv) AS rank FROM verts)\n")
    for i in range(1, supersteps):
        prev = f"r{i - 1}"
        parts.append(
            f""", r{i} AS MATERIALIZED (
  SELECT verts.v,
         0.15/(SELECT n FROM nv) + 0.85*coalesce(m.s, 0.0) AS rank
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, sum(r.rank / d.outdeg) AS s
    FROM edges e JOIN {prev} r ON e.src = r.v JOIN deg d ON d.src = e.src
    GROUP BY e.dst) m ON m.v = verts.v)
"""
        )
    parts.append(
        f"SELECT v, round(rank, {ROUND_DECIMALS}) AS rank FROM r{supersteps - 1}"
    )
    return "".join(parts)


def connected_components_sql(p: str, iters: int = CC_MAX_ITERS) -> str:
    parts = [prelude(p)]
    parts.append(", c0 AS MATERIALIZED (SELECT v, v AS label FROM verts)\n")
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        parts.append(
            f""", c{i} AS MATERIALIZED (
  SELECT s.v, least(s.label, coalesce(m.ml, s.label)) AS label
  FROM {prev} s LEFT JOIN (
    SELECT u.dst AS v, min(s2.label) AS ml
    FROM und u JOIN {prev} s2 ON u.src = s2.v
    GROUP BY u.dst) m ON m.v = s.v)
"""
        )
    parts.append(f"SELECT v, label AS component FROM c{iters}")
    return "".join(parts)


def modularity_sql(p: str, iters: int = CC_MAX_ITERS, decimals: int = 6) -> str:
    """Newman modularity of the CC partition: reuse the unrolled min-label
    CTEs, then Q = Σ_c [e_c/m − (deg_c/2m)²] over the deduped oriented
    edge set (each edge credits both endpoints' communities)."""
    cc = connected_components_sql(p, iters)
    cc_ctes = cc[: cc.rindex("SELECT v, label AS component")]
    return (
        cc_ctes
        + f""", lab AS MATERIALIZED (SELECT v, label FROM c{iters}),
mm AS (SELECT CAST(count(*) AS DOUBLE) AS m, count(*) AS mi FROM ori),
endp AS (
  SELECT la.label FROM ori o JOIN lab la ON la.v = o.a
  UNION ALL
  SELECT lb.label FROM ori o JOIN lab lb ON lb.v = o.b),
degc AS (SELECT label, CAST(count(*) AS DOUBLE) AS deg FROM endp GROUP BY label),
einc AS (
  SELECT la.label, CAST(count(*) AS DOUBLE) AS ein
  FROM ori o JOIN lab la ON la.v = o.a JOIN lab lb ON lb.v = o.b
  WHERE la.label = lb.label GROUP BY la.label)
SELECT round(sum(coalesce(e.ein, 0) / mm.m - (d.deg / (2 * mm.m)) * (d.deg / (2 * mm.m))),
             {decimals}) AS modularity,
       (SELECT count(DISTINCT label) FROM lab) AS n_communities,
       (SELECT mi FROM mm) AS m_edges
FROM degc d LEFT JOIN einc e ON e.label = d.label CROSS JOIN mm"""
    )


def label_propagation_sql(p: str, rounds: int = LP_ROUNDS) -> str:
    parts = [prelude(p)]
    parts.append(", l0 AS MATERIALIZED (SELECT v, v AS label FROM verts)\n")
    for i in range(1, rounds + 1):
        prev = f"l{i - 1}"
        parts.append(
            f""", l{i} AS MATERIALIZED (
  SELECT s.v, coalesce(w.lbl, s.label) AS label
  FROM {prev} s LEFT JOIN (
    SELECT v, lbl FROM (
      SELECT u.dst AS v, s2.label AS lbl, count(*) AS c,
             row_number() OVER (PARTITION BY u.dst
                                ORDER BY count(*) DESC, s2.label ASC) AS rn
      FROM und u JOIN {prev} s2 ON u.src = s2.v
      GROUP BY u.dst, s2.label)
    WHERE rn = 1) w ON w.v = s.v)
"""
        )
    parts.append(f"SELECT v, label FROM l{rounds}")
    return "".join(parts)


def triangles_sql(p: str) -> str:
    return (
        prelude(p)
        + """SELECT e1.a AS v, count(*) AS triangles
FROM ori e1
JOIN ori e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN ori e3 ON e3.a = e1.b AND e3.b = e2.b
GROUP BY e1.a"""
    )


def triangle_total_sql(p: str) -> str:
    return (
        prelude(p)
        + """SELECT count(*) AS total_triangles
FROM ori e1
JOIN ori e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN ori e3 ON e3.a = e1.b AND e3.b = e2.b"""
    )


def sssp_sql(p: str, source: int = 0, iters: int = SSSP_ITERS) -> str:
    parts = [prelude(p)]
    parts.append(
        f", d0 AS MATERIALIZED (SELECT v, CASE WHEN v = {source} THEN 0.0 ELSE 1e300 END AS dist FROM verts)\n"
    )
    for i in range(1, iters + 1):
        prev = f"d{i - 1}"
        parts.append(
            f""", d{i} AS MATERIALIZED (
  SELECT s.v, least(s.dist, coalesce(m.md, s.dist)) AS dist
  FROM {prev} s LEFT JOIN (
    SELECT e.dst AS v, min(s2.dist + 1.0) AS md
    FROM edges e JOIN {prev} s2 ON e.src = s2.v
    GROUP BY e.dst) m ON m.v = s.v)
"""
        )
    parts.append(
        f"SELECT v, CAST(dist AS BIGINT) AS dist FROM d{iters} WHERE dist < 1e299"
    )
    return "".join(parts)


def tool_paths_sql(p: str, k: int = 20) -> str:
    """Top-k tool-invocation paths per conversation (pipelines/convs.py
    tool_paths): ordered string_agg per conv, counted, (count desc, path)."""
    return f"""
WITH tu AS MATERIALIZED (
  SELECT conv_id, turn_idx, tool FROM read_parquet('{p}') WHERE tool IS NOT NULL
),
paths AS (
  SELECT conv_id, string_agg(tool, '>' ORDER BY turn_idx) AS path
  FROM tu GROUP BY conv_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_convs
FROM paths GROUP BY path
ORDER BY n_convs DESC, path ASC LIMIT {k}
"""


def tool_scc_sql(p: str, squarings: int = 8) -> str:
    """SCC over the directed tool-precedence graph (pipelines/convs.py
    tool_scc): ordered-pair edge derivation, reachability closure by
    ``squarings`` unrolled DISTINCT self-joins (paths ≤ 2^squarings — both
    sides compute the same fixpoint), mutual-reach min-name labeling."""
    parts = [
        f"""
WITH tu AS MATERIALIZED (
  SELECT conv_id, turn_idx, tool FROM read_parquet('{p}') WHERE tool IS NOT NULL
),
e AS MATERIALIZED (
  SELECT DISTINCT a.tool AS src, b.tool AS dst
  FROM tu a JOIN tu b
    ON a.conv_id = b.conv_id AND a.turn_idx < b.turn_idx AND a.tool <> b.tool
),
tools AS MATERIALIZED (SELECT DISTINCT tool FROM tu),
r0 AS MATERIALIZED (
  SELECT tool AS src, tool AS dst FROM tools
  UNION
  SELECT src, dst FROM e
)
"""
    ]
    for i in range(1, squarings + 1):
        prev = f"r{i - 1}"
        parts.append(
            f""", r{i} AS MATERIALIZED (
  SELECT DISTINCT a.src, b.dst FROM {prev} a JOIN {prev} b ON a.dst = b.src)
"""
        )
    parts.append(
        f""", scc AS (
  SELECT a.src AS tool, min(a.dst) AS scc_id
  FROM r{squarings} a JOIN r{squarings} b
    ON b.src = a.dst AND b.dst = a.src
  GROUP BY a.src
),
sizes AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
          FROM scc GROUP BY scc_id)
SELECT s.tool, s.scc_id, z.scc_size FROM scc s JOIN sizes z USING (scc_id)
"""
    )
    return "".join(parts)


def role_stats_sql(p: str) -> str:
    """Per-role rollup (pipelines/convs.py role_stats)."""
    return f"""
SELECT role,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(tool) AS BIGINT) AS n_tool_calls,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       round(CAST(sum(length(text)) AS DOUBLE) / count(*), 6) AS mean_chars
FROM read_parquet('{p}')
GROUP BY role
"""


def conv_stats_sql(p: str) -> str:
    """Per-conversation rollup (pipelines/convs.py conv_stats)."""
    return f"""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(tool) AS BIGINT) AS n_tool_calls,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) AS end_us,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM read_parquet('{p}')
GROUP BY conv_id
"""


DAG_LEVEL_ITERS = 24  # > longest directed path (reply chains ≤ ~16 hops);
# the engine raises past this bound (pipelines/dagdepth.py dag_levels_dense)


def dag_levels_sql(p: str, iters: int = DAG_LEVEL_ITERS) -> str:
    """Longest-path topological level per vertex: unrolled max-propagation
    (monotone, so relaxing from ALL vertices each round reaches the same
    fixpoint as the engine's active-frontier run)."""
    parts = [prelude(p)]
    parts.append(
        ", l0 AS MATERIALIZED (SELECT v, CAST(0 AS BIGINT) AS lvl FROM verts)\n"
    )
    for i in range(1, iters + 1):
        prev = f"l{i - 1}"
        parts.append(
            f""", l{i} AS MATERIALIZED (
  SELECT s.v, greatest(s.lvl, coalesce(m.ml, s.lvl)) AS lvl
  FROM {prev} s LEFT JOIN (
    SELECT e.dst AS v, max(s2.lvl + 1) AS ml
    FROM edges e JOIN {prev} s2 ON e.src = s2.v
    GROUP BY e.dst) m ON m.v = s.v)
"""
        )
    parts.append(f"SELECT v, lvl AS level FROM l{iters}")
    return "".join(parts)


_WEDGES_CTE = """, wedges AS MATERIALIZED (
  SELECT ns.node_id AS src, nd.node_id AS dst, CAST(ctw.cnt AS DOUBLE) AS w
  FROM (SELECT conv_id, tool, count(*) AS cnt FROM t
        WHERE tool IS NOT NULL GROUP BY 1, 2) ctw
  JOIN nodes ns ON ns.kind = 'conv' AND ns.key = ctw.conv_id
  JOIN nodes nd ON nd.kind = 'tool' AND nd.key = ctw.tool
  UNION ALL
  SELECT ns.node_id, nd.node_id, 1.0
  FROM reply r
  JOIN nodes ns ON ns.kind = 'turn' AND ns.key = r.src_key
  JOIN nodes nd ON nd.kind = 'turn' AND nd.key = r.dst_key
  UNION ALL
  SELECT ns.node_id, nd.node_id, CAST(tcw.cnt AS DOUBLE)
  FROM (SELECT x.tool AS tool_a, y.tool AS tool_b, count(*) AS cnt
        FROM conv_tool x JOIN conv_tool y
          ON x.conv_id = y.conv_id AND x.tool < y.tool
        GROUP BY 1, 2) tcw
  JOIN nodes ns ON ns.kind = 'tool' AND ns.key = tcw.tool_a
  JOIN nodes nd ON nd.kind = 'tool' AND nd.key = tcw.tool_b
)
"""


def sssp_weighted_sql(p: str, source: int = 0, iters: int = SSSP_ITERS) -> str:
    """Weighted SSSP over the weighted edge derivation (conv_tool w = usage
    count, reply w = 1, tool_cooc w = shared-conv count) — mirrors
    ``build_link_graph(weighted=True)``. Distances are integral float64 on
    both sides (sums of counts), so the value hash is exact."""
    parts = [prelude(p)]
    parts.append(_WEDGES_CTE)
    parts.append(
        f", w0 AS MATERIALIZED (SELECT v, CASE WHEN v = {source} THEN 0.0 ELSE 1e300 END AS dist FROM verts)\n"
    )
    for i in range(1, iters + 1):
        prev = f"w{i - 1}"
        parts.append(
            f""", w{i} AS MATERIALIZED (
  SELECT s.v, least(s.dist, coalesce(m.md, s.dist)) AS dist
  FROM {prev} s LEFT JOIN (
    SELECT e.dst AS v, min(s2.dist + e.w) AS md
    FROM wedges e JOIN {prev} s2 ON e.src = s2.v
    GROUP BY e.dst) m ON m.v = s.v)
"""
        )
    parts.append(f"SELECT v, dist FROM w{iters} WHERE dist < 1e299")
    return "".join(parts)


def reachability_sql(p: str, source: int = 0, iters: int = CC_MAX_ITERS) -> str:
    """Bidirectional reachability (ReachabilityVertex semantics): bit 1
    propagates source→ along forward edges, bit 2 dest→ along reverse edges;
    reachable ⟺ some vertex holds both bits. Dest = max node id."""
    parts = [prelude(p)]
    parts.append(
        f", q AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS s, "
        "(SELECT max(v) FROM verts) AS d)\n"
    )
    parts.append(
        ", b0 AS MATERIALIZED (SELECT v, v = (SELECT s FROM q) AS r1, "
        "v = (SELECT d FROM q) AS r2 FROM verts)\n"
    )
    for i in range(1, iters + 1):
        prev = f"b{i - 1}"
        parts.append(
            f""", b{i} AS MATERIALIZED (
  SELECT s.v,
         s.r1 OR coalesce(f.hit, FALSE) AS r1,
         s.r2 OR coalesce(bk.hit, FALSE) AS r2
  FROM {prev} s
  LEFT JOIN (SELECT e.dst AS v, bool_or(s2.r1) AS hit
             FROM edges e JOIN {prev} s2 ON e.src = s2.v GROUP BY e.dst) f
    ON f.v = s.v
  LEFT JOIN (SELECT e.src AS v, bool_or(s2.r2) AS hit
             FROM edges e JOIN {prev} s2 ON e.dst = s2.v GROUP BY e.src) bk
    ON bk.v = s.v)
"""
        )
    parts.append(
        "SELECT (SELECT s FROM q) AS source, (SELECT d FROM q) AS dest, "
        "CAST(max(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS reachable FROM b{iters}"
    )
    return "".join(parts)


def transcript_roundtrip_sql(p: str) -> str:
    return f"SELECT conv_id, turn_idx, text FROM read_parquet('{p}')"


def events_bipartite_degree_sql() -> str:
    """Uses the driver's pre-registered ``events`` view (no /tmp dependency)."""
    return (
        "SELECT user_id, count(*) AS n_event_types FROM "
        "(SELECT DISTINCT user_id, event_type FROM events) GROUP BY user_id"
    )


# ---------------------------------------------------------------------------
# documents / embeddings oracles (pre-registered driver views, no /tmp path)
# ---------------------------------------------------------------------------

_STOPWORD_SQL = "('the', 'a', 'and', 'of', 'to', 'in', 'is')"


def token_counts_sql() -> str:
    return (
        "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
        "len(string_split_regex(trim(text), '\\s+')) END AS n_tokens FROM documents"
    )


def fingerprints_sql() -> str:
    return "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def scrub_terms_sql(
    terms: tuple[str, ...] = ("spark", "slow", "dup"), replacement: str = "<TERM>"
) -> str:
    """Blocklist term scrubbing (``pipelines/textops.py scrub_terms``): both
    sides run the SAME word-boundary RE2 pattern (pyarrow and DuckDB share
    the RE2 engine), so the rewritten text hashes identically."""
    pat = r"\b(?:" + "|".join(terms) + r")\b"
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{pat}')) AS n_hits,
       regexp_replace(text, '{pat}', '{replacement}', 'g') AS clean_text,
       length(regexp_replace(text, '{pat}', '{replacement}', 'g')) AS clean_len
FROM documents
"""


def exact_dedup_sql() -> str:
    return "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"


def quality_scores_sql() -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN [] 
              ELSE string_split_regex(trim(text), '\\s+') END AS ws
  FROM documents
),
feats AS (
  SELECT doc_id,
         len(ws) AS n_words,
         CAST(len(list_filter(ws, x -> x IN {_STOPWORD_SQL})) AS DOUBLE) AS stops,
         CAST(len(replace(list_aggregate(ws, 'string_agg', ''), ' ', '')) AS DOUBLE)
           AS total_len
  FROM toks
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(total_len / greatest(n_words, 1), 6) AS avg_word_len,
       round(stops / greatest(n_words, 1), 6) AS stopword_ratio,
       round(n_words * (1 - round(stops / greatest(n_words, 1), 6)), 6) AS score
FROM feats
"""


_TOKS_CTE = (
    "toks AS MATERIALIZED (\n"
    "  SELECT doc_id,\n"
    "         CASE WHEN trim(text) = '' THEN []\n"
    "              ELSE string_split_regex(trim(text), '\\s+') END AS ws\n"
    "  FROM documents\n"
    ")"
)


def repetition_scores_sql(k: int = 3) -> str:
    """Within-doc duplicate-k-gram stats — independent formulation of
    ``textops.repetition_scores``: the engine runs run-length stats over
    64-bit shingle hashes, the oracle groups the k-gram STRINGS (multiset
    identity is hash-independent)."""
    return f"""
WITH {_TOKS_CTE},
sh_lists AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM toks
),
g AS (SELECT doc_id, unnest(shingles) AS s FROM sh_lists),
per_gram AS (SELECT doc_id, s, count(*) AS c FROM g GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(max(c) AS BIGINT) AS max_gram_count,
       round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 6) AS dup_fraction
FROM per_gram
GROUP BY doc_id
"""


def ngram_jaccard_sql(threshold: float = 0.4, k: int = 3) -> str:
    """Exact word-k-gram Jaccard pairs — an INDEPENDENT formulation of
    ``textops.ngram_jaccard_pairs``: the engine dedups/joins on 64-bit
    shingle hashes, the oracle on the shingle STRINGS themselves (set
    identity is hash-independent), so agreement validates the whole
    shingle → inverted-index → intersect/union pipeline."""
    return f"""
WITH {_TOKS_CTE},
sh_lists AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM toks
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh_lists)
),
sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= {threshold}
"""


def _minhash_pair_ctes(
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    src: str = "documents",
) -> str:
    """The MinHash-LSH candidate+verify chain as a composable CTE fragment
    (no leading WITH, no final SELECT): defines ``toks → sh_lists → shh →
    sig → band → cand → sizes → inter`` over source relation ``src``
    (any relation with (doc_id, text)). ``minhash_lsh_sql`` and
    ``corpus_pipeline_sql`` both build on it."""
    from .pipelines.textops import _minhash_params

    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands
    assert rows_per_band == 4, "band fold below is unrolled for 4 rows/band"
    params = ", ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)"
        for p in range(num_perm)
    )
    W = 1 << 64  # uint64 wrap modulus
    M = (1 << 61) - 1
    F = 1099511628211  # FNV prime (band fold)

    def fold(s0, s1, s2, s3):
        h = s0
        for s in (s1, s2, s3):
            h = f"((({h}) * {F}) % {W} + {s}) % {W}"
        return h

    return f"""
toks AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS ws
  FROM {src}
),
sh_lists AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM toks
),
shh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(s), 1, 16))::UBIGINT::HUGEINT AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh_lists)
),
params(p, a, b) AS (VALUES {params}),
sig AS MATERIALIZED (
  SELECT doc_id, p,
         min(((a * h) % {W} + b) % {W} % {M}) AS s
  FROM shh CROSS JOIN params
  GROUP BY doc_id, p
),
band_cols AS MATERIALIZED (
  SELECT doc_id, p // {rows_per_band} AS band_id,
         max(CASE WHEN p % {rows_per_band} = 0 THEN s END) AS s0,
         max(CASE WHEN p % {rows_per_band} = 1 THEN s END) AS s1,
         max(CASE WHEN p % {rows_per_band} = 2 THEN s END) AS s2,
         max(CASE WHEN p % {rows_per_band} = 3 THEN s END) AS s3
  FROM sig GROUP BY doc_id, p // {rows_per_band}
),
band AS MATERIALIZED (
  SELECT doc_id, band_id, {fold('s0', 's1', 's2', 's3')} AS bh
  FROM band_cols
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM band x JOIN band y
    ON x.band_id = y.band_id AND x.bh = y.bh AND x.doc_id < y.doc_id
),
sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN shh x ON x.doc_id = c.doc_a
  JOIN shh y ON y.doc_id = c.doc_b AND y.h = x.h
  GROUP BY 1, 2
)"""


def minhash_lsh_sql(
    threshold: float = 0.4,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
) -> str:
    """The ENTIRE MinHash-LSH near-dup pipeline recomputed in SQL: shingle
    hashes (md5 first 8 bytes, matching ``textops._shingle_hashes``), MinHash
    signatures under the engine's exact uint64 WRAP arithmetic
    ((a·x mod 2^64 + b) mod 2^64 mod (2^61−1), emulated with HUGEINT and an
    explicit 2^64 modulus), FNV band folding with the same wrap, bucket
    self-join for candidates, and exact-Jaccard verification on the hash
    sets. Permutation constants come from the same seeded generator the
    engine uses, inlined as a VALUES table."""
    return f"""
WITH {_minhash_pair_ctes(num_perm, bands, k)}
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= {threshold}
"""


def corpus_pipeline_sql(
    near_threshold: float = 0.5,
    eval_max_doc_id: int = 5,
    contam_threshold: float = 0.5,
    min_quality: float = 12.0,
    sample_rate: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
) -> str:
    """The COMPOSED training-data pipeline (corpus.corpus_pipeline) in one
    SQL statement: exact dedup (min doc_id per text) → MinHash-LSH pairs
    over the survivors (the full `_minhash_pair_ctes` chain with src=dd) →
    drop every pair's larger id → eval decontamination against the ORIGINAL
    corpus's eval shingles → quality-score filter → deterministic md5
    hash sample. Each fragment is the already-green per-stage oracle;
    composition validates the chaining itself (stage ordering, survivor
    threading)."""
    W = float(1 << 64)
    return f"""
WITH dd AS MATERIALIZED (
  SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
),
{_minhash_pair_ctes(num_perm, bands, k, src="dd")},
mh AS MATERIALIZED (
  SELECT doc_b FROM inter
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= {near_threshold}
),
keep1 AS MATERIALIZED (
  SELECT doc_id, text FROM dd
  WHERE doc_id NOT IN (SELECT doc_b FROM mh)
    AND doc_id >= {eval_max_doc_id}
),
ev_lists AS MATERIALIZED (
  SELECT CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM (SELECT CASE WHEN trim(text) = '' THEN []
                    ELSE string_split_regex(trim(text), '\\s+') END AS ws
        FROM documents WHERE doc_id < {eval_max_doc_id})
),
ev AS MATERIALIZED (SELECT DISTINCT unnest(shingles) AS s FROM ev_lists),
trs AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh_lists
  WHERE doc_id IN (SELECT doc_id FROM keep1)
),
contam AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT doc_id, count(*) AS n_sh,
           sum(CASE WHEN s IN (SELECT s FROM ev) THEN 1 ELSE 0 END) AS n_hit
    FROM trs GROUP BY doc_id
  ) WHERE CAST(n_hit AS DOUBLE) / n_sh >= {contam_threshold!r}
),
feats AS (
  SELECT doc_id,
         len(ws) AS n_words,
         CAST(len(list_filter(ws, x -> x IN {_STOPWORD_SQL})) AS DOUBLE)
           AS stops
  FROM toks WHERE doc_id IN (SELECT doc_id FROM keep1)
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_tokens,
       round(n_words * (1 - round(stops / greatest(n_words, 1), 6)), 6)
         AS score
FROM feats
WHERE round(n_words * (1 - round(stops / greatest(n_words, 1), 6)), 6)
        >= {min_quality!r}
  AND doc_id NOT IN (SELECT doc_id FROM contam)
  AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
           AS DOUBLE) < {sample_rate * W!r}
"""


def _simhash_vals_ctes() -> str:
    """Shared CTE chain ending in ``sv(doc_id, v UBIGINT)`` — the engine's
    64-bit SimHash recomputed independently: per-word hash = first 8 bytes of
    md5 (matches ``hashlib.md5(w).digest()[:8]``), per-bit ±1 votes, positive
    bits summed via a powers-of-two table (DuckDB ``<<`` overflows at 63)."""
    pows = ", ".join(f"({i}, {1 << i}::HUGEINT)" for i in range(64))
    return f"""{_TOKS_CTE},
words AS MATERIALIZED (
  SELECT doc_id, unnest(ws) AS w FROM toks
),
hw AS MATERIALIZED (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM words
),
pow2(i, p) AS (VALUES {pows}),
bits AS MATERIALIZED (
  SELECT doc_id, i, p,
         sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM hw CROSS JOIN pow2
  GROUP BY doc_id, i, p
),
vals AS MATERIALIZED (
  SELECT doc_id,
         sum(CASE WHEN vote > 0 THEN p ELSE 0::HUGEINT END) AS v
  FROM bits GROUP BY doc_id
),
sv AS MATERIALIZED (
  SELECT d.doc_id, coalesce(v.v, 0::HUGEINT)::UBIGINT AS v
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN vals v ON v.doc_id = d.doc_id
)"""


def simhash_sql() -> str:
    """SimHash values as 16-char hex (see ``_simhash_vals_ctes``)."""
    return f"""
WITH {_simhash_vals_ctes()}
SELECT doc_id, lpad(lower(hex(v)), 16, '0') AS simhash FROM sv
"""


def simhash_pairs_sql(max_dist: int = 3) -> str:
    """All-pairs Hamming ≤ max_dist over the recomputed SimHash values — the
    oracle for the engine's banded (pigeonhole-exact) bucketing, which must
    find exactly the pairs the quadratic scan finds."""
    return f"""
WITH {_simhash_vals_ctes()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.v, b.v)) AS BIGINT) AS hamming
FROM sv a JOIN sv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.v, b.v)) <= {max_dist}
"""


def language_id_sql(top: int = 300, n: int = 3) -> str:
    """Char-trigram nearest-profile classifier recomputed in SQL: per-lang
    profiles = top-``top`` trigram frequencies (count desc, gram asc — the
    engine's deterministic tie-break), score = Σ prof(g)·count_doc(g) /
    total_doc, argmax with min-lang tie-break."""
    return f"""
WITH t3 AS MATERIALIZED (
  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t FROM documents
),
grams AS MATERIALIZED (
  SELECT doc_id, lang, substr(t, CAST(i AS INTEGER), {n}) AS g
  FROM t3, LATERAL (SELECT unnest(range(1, greatest(len(t) - {n - 2}, 1))) AS i)
),
lang_counts AS MATERIALIZED (
  SELECT lang, g, count(*) AS c FROM grams GROUP BY 1, 2
),
lang_tot AS MATERIALIZED (
  SELECT lang, sum(c) AS tot FROM lang_counts GROUP BY 1
),
prof AS MATERIALIZED (
  SELECT lc.lang, lc.g, CAST(lc.c AS DOUBLE) / lt.tot AS f,
         row_number() OVER (PARTITION BY lc.lang ORDER BY lc.c DESC, lc.g) AS rn
  FROM lang_counts lc JOIN lang_tot lt ON lt.lang = lc.lang
),
prof_top AS MATERIALIZED (SELECT lang, g, f FROM prof WHERE rn <= {top}),
doc_counts AS MATERIALIZED (
  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
),
doc_tot AS MATERIALIZED (
  SELECT doc_id, sum(c) AS tot FROM doc_counts GROUP BY 1
),
raw_scores AS MATERIALIZED (
  SELECT dc.doc_id, p.lang, sum(p.f * dc.c) AS s
  FROM doc_counts dc JOIN prof_top p ON p.g = dc.g
  GROUP BY 1, 2
),
all_scores AS MATERIALIZED (
  SELECT d.doc_id, l.lang,
         coalesce(rs.s, 0.0) / greatest(coalesce(dt.tot, 0), 1) AS score
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT DISTINCT lang FROM documents) l
  LEFT JOIN raw_scores rs ON rs.doc_id = d.doc_id AND rs.lang = l.lang
  LEFT JOIN doc_tot dt ON dt.doc_id = d.doc_id
)
SELECT doc_id, lang AS pred_lang
FROM (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang ASC) AS rn
      FROM all_scores)
WHERE rn = 1
"""


def knn_sql(query_ids: tuple = (0, 1, 2), k: int = 10) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN ({ids})
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS s
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(s, 6) AS sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY s DESC, vec_id ASC) AS rn
      FROM sims)
WHERE rn <= {k}
"""


def cosine_dup_pairs_sql(threshold: float = 0.95) -> str:
    return f"""
WITH n AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
"""


def lsh_dup_pairs_sql(
    threshold: float = 0.4, n_bands: int = 8, band_bits: int = 4
) -> str:
    """Oracle for ``cosine_dup_pairs_lsh`` with AXIS hyperplanes: band j's
    bucket packs the sign bits of coordinates j·band_bits+1 … (1-indexed),
    bit i weighted 2^i — exactly the engine's ``(m @ I[:nbits].T >= 0)``
    packing, so the *approximate* candidate set itself is reproduced in SQL.
    Survivors are pairs sharing ≥1 band bucket with exact cosine ≥ threshold
    (DISTINCT = the engine's cross-band dedup)."""
    bucket = " + ".join(
        f"(CASE WHEN e[j.range*{band_bits} + {i + 1}] >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(band_bits)
    )
    return f"""
WITH n AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
b AS MATERIALIZED (
  SELECT vec_id, e, j.range AS band, {bucket} AS bucket
  FROM n, range({n_bands}) j
)
SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       round(list_cosine_similarity(a.e, b2.e), 6) AS sim
FROM b a JOIN b b2
  ON a.band = b2.band AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE list_cosine_similarity(a.e, b2.e) >= {threshold}
"""


def media_features_sql(media_path: str) -> str:
    """Media feature extraction recomputed independently from the persisted
    media parquet: width/height parsed from the JSON metadata, features from
    the md5 chain over the payload's lowercase hex — exactly
    ``multimodal._decode_payload``'s fake path (DuckDB's ``md5`` is
    VARCHAR-only, which is why both sides hash the hex string): block j =
    md5(hex(payload) || chr(49+j)), each block = 4 little-endian uint32s
    scaled by 2^-32.  feat_mean is exact both sides (32 values with ≤32-bit
    significands sum exactly in float64); feat_norm rounds at 9 decimals."""
    blocks = 8  # FEATURE_DIM * 4 bytes / 16-byte md5 blocks
    return f"""
WITH m AS MATERIALIZED (SELECT * FROM read_parquet('{media_path}')),
h AS MATERIALIZED (
  SELECT item_id, md5(lower(hex(payload)) || chr(49 + CAST(j.range AS INT))) AS h
  FROM m, range({blocks}) j
),
vals AS MATERIALIZED (
  SELECT item_id,
         (('0x' || substr(h, k.range*8 + 1, 2))::BIGINT
        + ('0x' || substr(h, k.range*8 + 3, 2))::BIGINT * 256
        + ('0x' || substr(h, k.range*8 + 5, 2))::BIGINT * 65536
        + ('0x' || substr(h, k.range*8 + 7, 2))::BIGINT * 16777216)
        / 4294967296.0 AS v
  FROM h, range(4) k
),
wh AS MATERIALIZED (
  SELECT item_id,
         CAST(meta->>'$.width' AS INTEGER) AS width,
         CAST(meta->>'$.height' AS INTEGER) AS height
  FROM m
)
SELECT vals.item_id,
       any_value(wh.width) AS width,
       any_value(wh.height) AS height,
       round(avg(v), 9) AS feat_mean,
       round(sqrt(sum(v * v)), 9) AS feat_norm
FROM vals JOIN wh USING (item_id)
GROUP BY vals.item_id
"""


def graph_sample_sql(p: str, target: float = 0.3, rounds: int = 40) -> str:
    """Seeded-BFS graph sampling unrolled (``GraphSampleVertex`` semantics,
    matching ``pipelines/sampling.graph_sample_dense`` exactly): per round,
    newly reached = undirected neighbors of the frontier minus selected,
    truncated to the remaining quota by ascending vertex id; once the quota
    is met or the frontier empties every later round is a no-op, so a fixed
    unroll ≥ the reached component's diameter is exact."""
    parts = [prelude(p)]
    parts.append(
        f""", quota AS MATERIALIZED (
  SELECT CAST(ceil({target} * n) AS BIGINT) AS q FROM nv),
s0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS v),
f0 AS MATERIALIZED (SELECT v FROM s0)
"""
    )
    for i in range(1, rounds + 1):
        parts.append(
            f""", n{i} AS MATERIALIZED (
  SELECT u.dst AS v FROM und u JOIN f{i - 1} f ON u.src = f.v
  EXCEPT SELECT v FROM s{i - 1}),
t{i} AS MATERIALIZED (
  SELECT v FROM (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM n{i})
  WHERE rn <= (SELECT q FROM quota) - (SELECT count(*) FROM s{i - 1})),
s{i} AS MATERIALIZED (SELECT v FROM s{i - 1} UNION ALL SELECT v FROM t{i}),
f{i} AS MATERIALIZED (SELECT v FROM t{i})
"""
        )
    parts.append(f"SELECT v FROM s{rounds}")
    return "".join(parts)


def max_clique_sql(p: str, max_k: int = 12) -> str:
    """All MAXIMUM cliques via k-clique join unrolling (independent of the
    engine's Bron-Kerbosch): c_k extends each ascending (k-1)-clique with a
    vertex adjacent to all members (edges are src<dst oriented, so every
    required edge appears exactly once), the answer is every clique at the
    largest non-empty k.  Transcript graphs keep cliques small (tool
    co-usage; measured max 8 at sf0.01), so a fixed ``max_k`` unroll is
    exact — levels past the true maximum are empty and cost nothing.  A
    graph whose maximum clique exceeded ``max_k`` would surface as a row
    mismatch, never a silent pass."""
    parts = [prelude(p)]
    parts.append(", c2 AS MATERIALIZED (SELECT a AS v1, b AS v2 FROM ori)\n")
    for k in range(3, max_k + 1):
        prev_cols = ", ".join(f"c.v{i}" for i in range(1, k))
        join_edges = " ".join(
            f"JOIN ori o{i} ON o{i}.a = c.v{i} AND o{i}.b = nv.b"
            for i in range(1, k - 1)
        )
        parts.append(
            f""", c{k} AS MATERIALIZED (
  SELECT {prev_cols}, nv.b AS v{k}
  FROM c{k - 1} c JOIN ori nv ON nv.a = c.v{k - 1} {join_edges})
"""
        )
    exists_union = "\n    UNION ALL ".join(
        f"SELECT {k} AS k FROM (SELECT 1) WHERE EXISTS (SELECT 1 FROM c{k})"
        for k in range(2, max_k + 1)
    )
    parts.append(
        f", best AS MATERIALIZED (SELECT max(k) AS k FROM ({exists_union}))\n"
    )
    selects = []
    for k in range(2, max_k + 1):
        cols = ", ".join(f"v{i}" for i in range(1, k + 1))
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS size, concat_ws(',', {cols}) "
            f"AS members FROM c{k} WHERE (SELECT k FROM best) = {k}"
        )
    parts.append("\nUNION ALL\n".join(selects))
    return "".join(parts)


def kmeans_cells_sql(
    emb_path: str,
    n_clusters: int = 8,
    iters: int = 10,
    seed: int = 3,
    tol: float = 1e-6,
) -> str:
    """IVF coarse k-means assignment recomputed independently: the engine's
    IMRU Lloyd's loop (``imru.KMeansJob`` — euclidean argmin with
    lowest-index tie-break, per-cluster means, empty cells keep their
    centroid, STOP when max |new − old| < tol) unrolled as SQL iterations
    with a sticky converged flag, then the final cosine argmax assignment
    over normalized centroids (``embeddings.train_kmeans_centroids`` /
    ``_q_emb_kmeans_cells``).  The ONLY inputs taken from the engine's
    formulation are the seed-derived init row ids (which rows of the first
    64 the rng picked — identification, not computation); every distance,
    mean and assignment is DuckDB's own arithmetic.  Output (vec_id, cell)
    is integer, so the comparison is exact."""
    import numpy as np
    import pyarrow.parquet as pq

    first = pq.read_table(emb_path, columns=["vec_id"])["vec_id"].to_numpy()
    pool = first[: max(n_clusters * 8, 64)]
    rng = np.random.default_rng(seed)
    init_ids = pool[rng.choice(len(pool), size=n_clusters, replace=False)]
    init_vals = ", ".join(
        f"({cpos}, {int(vid)})" for cpos, vid in enumerate(init_ids)
    )
    parts = [
        f"""
WITH emb AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
el AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(e, 1) AS i, unnest(e) AS x FROM emb
),
initmap(cpos, vid) AS (VALUES {init_vals}),
c0 AS MATERIALIZED (
  SELECT m.cpos, el.i, el.x AS v FROM initmap m JOIN el ON el.vec_id = m.vid
),
s0 AS MATERIALIZED (SELECT FALSE AS stopped)
"""
    ]
    for t in range(1, iters + 1):
        p, c = t - 1, t
        parts.append(
            f""", d{c} AS MATERIALIZED (
  SELECT el.vec_id, cc.cpos, sum((el.x - cc.v) * (el.x - cc.v)) AS d2
  FROM el JOIN c{p} cc USING (i) GROUP BY el.vec_id, cc.cpos),
a{c} AS MATERIALIZED (
  SELECT vec_id, cpos FROM (
    SELECT vec_id, cpos,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cpos ASC) AS rn
    FROM d{c}) WHERE rn = 1),
n{c} AS MATERIALIZED (
  SELECT cc.cpos, cc.i, coalesce(m.v, cc.v) AS v
  FROM c{p} cc LEFT JOIN (
    SELECT a.cpos, el.i, avg(el.x) AS v
    FROM a{c} a JOIN el USING (vec_id) GROUP BY a.cpos, el.i
  ) m ON m.cpos = cc.cpos AND m.i = cc.i),
s{c} AS MATERIALIZED (
  SELECT (SELECT stopped FROM s{p}) OR
         (SELECT max(abs(n.v - o.v)) FROM n{c} n
          JOIN c{p} o ON o.cpos = n.cpos AND o.i = n.i) < {tol} AS stopped),
c{c} AS MATERIALIZED (
  SELECT o.cpos, o.i,
         CASE WHEN (SELECT stopped FROM s{p}) THEN o.v ELSE n.v END AS v
  FROM c{p} o JOIN n{c} n ON n.cpos = o.cpos AND n.i = o.i)
"""
        )
    parts.append(
        f""", cnrm AS MATERIALIZED (
  SELECT cpos, CASE WHEN sqrt(sum(v * v)) > 0 THEN sqrt(sum(v * v)) ELSE 1 END AS nrm
  FROM c{iters} GROUP BY cpos),
cn AS MATERIALIZED (
  SELECT c.cpos, c.i, c.v / cnrm.nrm AS v FROM c{iters} c JOIN cnrm USING (cpos)),
pnrm AS MATERIALIZED (
  SELECT vec_id, CASE WHEN sqrt(sum(x * x)) > 0 THEN sqrt(sum(x * x)) ELSE 1 END AS nrm
  FROM el GROUP BY vec_id),
sims AS MATERIALIZED (
  SELECT el.vec_id, cn.cpos, sum((el.x / pnrm.nrm) * cn.v) AS sim
  FROM el JOIN pnrm USING (vec_id) JOIN cn USING (i)
  GROUP BY el.vec_id, cn.cpos)
SELECT vec_id, CAST(cpos AS BIGINT) AS cell FROM (
  SELECT vec_id, cpos,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cpos ASC) AS rn
  FROM sims) WHERE rn = 1
"""
    )
    return "".join(parts)


def windowed_counts_sql(window_us: int = 3_600_000_000) -> str:
    """Tumbling-window per-type aggregate (``pipelines/events.py``)."""
    return f"""
SELECT (epoch_us(ts) // {window_us}) * {window_us} AS window_us,
       event_type,
       count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def asof_last_event_sql(
    left_type: str = "error", right_type: str = "click"
) -> str:
    """As-of join recomputed with DuckDB's NATIVE ``ASOF LEFT JOIN`` — the
    independent formulation of ``events.asof_last_event`` (>= match; the
    generator emits unique (user, ts) per type, so ties cannot arise)."""
    return f"""
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = '{left_type}'),
r AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = '{right_type}')
SELECT l.event_id,
       coalesce(r.event_id, -1) AS prev_event_id,
       coalesce(round((epoch_us(l.ts) - epoch_us(r.ts)) / 1e6, 6), -1.0)
         AS lag_sec
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def range_join_counts_sql(
    left_type: str = "error",
    right_type: str = "click",
    window_us: int = 3_600_000_000,
) -> str:
    """Banded range join recomputed as a plain inequality join."""
    return f"""
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = '{left_type}'),
r AS (SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = '{right_type}')
SELECT l.event_id,
       count(r.t) AS n_prior
FROM l LEFT JOIN r
  ON r.user_id = l.user_id AND r.t >= l.t - {window_us} AND r.t <= l.t
GROUP BY l.event_id
"""


def hll_registers_sql(b: int = 10, k: int = 3) -> str:
    """The HLL sketch's registers recomputed independently over the SAME
    word-k-gram shingle hashes the MinHash oracle uses (DuckDB md5 prefix
    as UBIGINT): register = top-b bits, rho = 64−b − bit_length(remainder)
    + 1 — ``bin()`` gives the exact bit length, no float log2.
    Integer-exact vs ``textops.hll_registers``."""
    shift = 64 - b
    mask = (1 << shift) - 1
    return f"""
WITH {_TOKS_CTE},
sh_lists AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM toks
),
shh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh_lists)
),
rr AS (
  SELECT CAST(h >> {shift} AS INTEGER) AS reg,
         CAST(CASE WHEN (h & {mask}) = 0 THEN {shift + 1}
              ELSE {shift + 1} - length(bin(h & {mask})) END AS INTEGER)
           AS rho
  FROM shh
)
SELECT reg, max(rho) AS rho FROM rr GROUP BY reg
"""


def top_tokens_sql(k: int = 20) -> str:
    """Global token heavy hitters (corpus.top_tokens): exact counts over
    the same whitespace tokenization, ties at the k-boundary broken by
    token ascending on both sides."""
    return f"""
WITH {_TOKS_CTE},
tok AS (SELECT unnest(ws) AS token FROM toks)
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM tok GROUP BY token
ORDER BY n DESC, token ASC
LIMIT {k}
"""


def tfidf_top_terms_sql(top: int = 3) -> str:
    """Per-doc TF-IDF top terms (corpus.tfidf_top_terms). The row set is
    ranked by the INTEGER key (tf DESC, df ASC, token ASC) — identical to
    the engine by construction — and the float score is ln-based
    (DuckDB ln = libm = engine's math.log), rounded to 9 decimals."""
    return f"""
WITH {_TOKS_CTE},
ex AS MATERIALIZED (SELECT doc_id, unnest(ws) AS token FROM toks),
tf AS MATERIALIZED (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY doc_id, token),
dfq AS MATERIALIZED (SELECT token, count(*) AS df FROM tf GROUP BY token),
nq AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfq.df ASC, tf.token ASC
         ) AS r
  FROM tf JOIN dfq USING (token)
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
       round(CAST(tf AS DOUBLE) * ln((SELECT n FROM nq) / df), 9) AS tfidf
FROM ranked WHERE r <= {top}
"""


def hash_sample_sql(
    rate: float = 0.25, rates_by_lang: "dict[str, float] | None" = None
) -> str:
    """Deterministic hash sample (corpus.hash_sample): the identical
    md5-prefix uint64 hash of the decimal doc_id, compared in float64
    against rate·2^64 — thresholds are inlined with full-precision Python
    repr so both sides compare against the same double."""
    W = float(1 << 64)
    if rates_by_lang:
        cases = " ".join(
            f"WHEN lang = '{lang}' THEN {r * W!r}"
            for lang, r in sorted(rates_by_lang.items())
        )
        thr = f"CASE {cases} ELSE {rate * W!r} END"
    else:
        thr = repr(rate * W)
    return f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
           AS DOUBLE) < {thr}
"""


def length_quantiles_sql(qs: tuple = (0.25, 0.5, 0.75, 0.95)) -> str:
    """Per-language exact token-length quantiles (corpus.length_quantiles):
    the same discrete lower-quantile — smallest n_tokens whose cumulative
    histogram count reaches ceil(q·n) — recomputed via window cumsum."""
    picks = ",\n       ".join(
        f"CAST(min(CASE WHEN cum >= ceil({q!r} * total) THEN n_tokens END) "
        f"AS BIGINT) AS p{int(round(q * 100))}"
        for q in qs
    )
    return f"""
WITH lt AS MATERIALIZED (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents
),
hist AS (SELECT lang, n_tokens, count(*) AS n FROM lt GROUP BY 1, 2),
cum AS (
  SELECT lang, n_tokens,
         sum(n) OVER (PARTITION BY lang ORDER BY n_tokens) AS cum,
         sum(n) OVER (PARTITION BY lang) AS total
  FROM hist
)
SELECT lang,
       {picks}
FROM cum GROUP BY lang
"""


def sessionize_sql(gap_us: int = 1_800_000_000) -> str:
    """Gap-based sessionization (events.sessionize): same (ts, event_id)
    ordering, lag-diff session breaks, cumulative-sum session ids —
    integer-exact."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tsu FROM events
),
flags AS (
  SELECT user_id, event_id, tsu,
         CASE WHEN lag(tsu) OVER w IS NULL
                   OR tsu - lag(tsu) OVER w > {gap_us} THEN 1 ELSE 0 END AS new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
sess AS (
  SELECT user_id, tsu,
         sum(new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM flags
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(tsu) AS BIGINT) AS start_us,
       CAST(max(tsu) AS BIGINT) AS end_us
FROM sess GROUP BY user_id, session_id
"""


def session_ids_sql(gap_us: int = 1_800_000_000) -> str:
    """Per-event session assignment (events.session_ids): the same
    lag-diff/cumsum windows as ``sessionize_sql`` but emitting the
    (event_id → session_id) map instead of session aggregates —
    integer-exact."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tsu FROM events
),
flags AS (
  SELECT user_id, event_id, tsu,
         CASE WHEN lag(tsu) OVER w IS NULL
                   OR tsu - lag(tsu) OVER w > {gap_us} THEN 1 ELSE 0 END AS new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
)
SELECT user_id, event_id,
       CAST(sum(new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
         AS session_id
FROM flags
"""


def decontaminate_sql(
    eval_max_doc_id: int = 5, k: int = 3, threshold: float = 0.5
) -> str:
    """Eval-set contamination (corpus.decontaminate) recomputed on the
    shingle STRINGS (set identity is hash-independent, as in the n-gram
    Jaccard oracle); empty-text docs kept with zero counts via the left
    join."""
    return f"""
WITH {_TOKS_CTE},
sh_lists AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM toks
),
ev AS MATERIALIZED (
  SELECT DISTINCT unnest(shingles) AS s FROM sh_lists
  WHERE doc_id < {eval_max_doc_id}
),
trs AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh_lists
  WHERE doc_id >= {eval_max_doc_id}
),
agg AS (
  SELECT doc_id, count(*) AS n_shingles,
         sum(CASE WHEN s IN (SELECT s FROM ev) THEN 1 ELSE 0 END) AS n_hit
  FROM trs GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(a.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(CASE WHEN coalesce(a.n_shingles, 0) > 0
                  AND CAST(a.n_hit AS DOUBLE) / a.n_shingles >= {threshold!r}
            THEN 1 ELSE 0 END AS INTEGER) AS contaminated
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id >= {eval_max_doc_id}
"""


def best_per_source_sql() -> str:
    """Group-wise argmax dedup (corpus.best_per_source): longest doc per
    source, ties to the smallest doc_id — integer keys only."""
    return """
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
"""


def cms_registers_sql(depth: int = 4, width: int = 1024) -> str:
    """Count-Min registers (textops.cms_registers) recomputed over the
    same token stream: row hash = md5-prefix uint64 of '{r} {token}' mod
    width — integer-exact."""
    return f"""
WITH {_TOKS_CTE},
tok AS MATERIALIZED (SELECT unnest(ws) AS token FROM toks),
rr AS (SELECT unnest(range({depth})) AS r),
folds AS (
  SELECT r,
         CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ' ' || token), 1, 16))
                ::UBIGINT % {width} AS INTEGER) AS c
  FROM tok CROSS JOIN rr
)
SELECT CAST(r AS INTEGER) AS r, c, CAST(count(*) AS BIGINT) AS n
FROM folds GROUP BY r, c
"""


def label_centroids_sql() -> str:
    """Per-label centroid/dispersion stats (embeddings.label_centroids):
    positional unnest of the vector column, the same sufficient-statistic
    expressions (‖mean‖, E‖v‖² − ‖mean‖²), rounded to 6 (summation-order tolerant)."""
    return """
WITH ex AS MATERIALIZED (
  SELECT label, unnest(embedding) AS x, unnest(range(len(embedding))) AS i
  FROM embeddings
),
pern AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
dims AS (SELECT label, i, sum(x) AS sx FROM ex GROUP BY label, i),
c2 AS (
  SELECT d.label, sum((sx / n) * (sx / n)) AS c2
  FROM dims d JOIN pern USING (label) GROUP BY d.label
),
msq AS (SELECT label, sum(x * x) AS ssq FROM ex GROUP BY label)
SELECT p.label, CAST(p.n AS BIGINT) AS n,
       round(sqrt(c2.c2), 6) AS centroid_norm,
       round(msq.ssq / p.n - c2.c2, 6) AS dispersion
FROM pern p JOIN c2 USING (label) JOIN msq USING (label)
"""


def covariance_sql() -> str:
    """Embedding covariance upper triangle (embeddings.covariance_stats):
    positional unnest, per-dimension-pair Σxy via a vec_id self-join, both
    operands cast to DOUBLE before multiplying (the engine's float64
    matmul), population covariance, rounded to 6."""
    return """
WITH ex AS MATERIALIZED (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS i
  FROM embeddings
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
sums AS (SELECT i, sum(x) AS sx FROM ex GROUP BY i),
pairs AS (
  SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT p.i, p.j,
       round(p.sxy / nn.n - (sa.sx / nn.n) * (sb.sx / nn.n), 6) AS cov
FROM pairs p, nn
JOIN sums sa ON sa.i = p.i
JOIN sums sb ON sb.i = p.j
"""


def top_direction_sql(iters: int = 30) -> str:
    """Top principal direction (embeddings.top_direction): the covariance
    CTE (full matrix, cast-to-double products) + ``iters`` unrolled
    matvec→normalize steps from the all-ones/√d start — the engine's exact
    fixed-step power iteration, no eigensolver either side."""
    parts = [
        """
WITH ex AS MATERIALIZED (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS i
  FROM embeddings
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
sums AS (SELECT i, sum(x) AS sx FROM ex GROUP BY i),
pairs AS (
  SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i
),
cov AS MATERIALIZED (
  SELECT p.i, p.j, p.sxy / nn.n - (sa.sx / nn.n) * (sb.sx / nn.n) AS c
  FROM pairs p, nn
  JOIN sums sa ON sa.i = p.i
  JOIN sums sb ON sb.i = p.j
),
dd AS (SELECT CAST(count(*) AS DOUBLE) AS d FROM sums),
v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(dd.d) AS x FROM sums, dd)
"""
    ]
    for t in range(1, iters + 1):
        prev = f"v{t - 1}"
        parts.append(
            f""", w{t} AS MATERIALIZED (
  SELECT c.i, sum(c.c * v.x) AS y FROM cov c JOIN {prev} v ON c.j = v.i
  GROUP BY c.i),
v{t} AS MATERIALIZED (
  SELECT w.i, w.y / q.nrm AS x
  FROM w{t} w, (SELECT sqrt(sum(y * y)) AS nrm FROM w{t}) q)
"""
        )
    parts.append(
        f""", lam AS (
  SELECT sum(va.x * c.c * vb.x) AS l
  FROM cov c JOIN v{iters} va ON va.i = c.i JOIN v{iters} vb ON vb.i = c.j
)
SELECT v.i, round(v.x, 6) AS loading, round(lam.l, 6) AS eigenvalue
FROM v{iters} v, lam
"""
    )
    return "".join(parts)


def lm_score_sql() -> str:
    """Unigram LM score (corpus.lm_score): mean ln(count/T) per doc,
    empty docs 0, rounded to 6 (per-doc summation-order tolerance)."""
    return f"""
WITH {_TOKS_CTE},
ex AS MATERIALIZED (SELECT doc_id, unnest(ws) AS token FROM toks),
cnt AS MATERIALIZED (SELECT token, count(*) AS n FROM ex GROUP BY token),
tt AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM cnt),
per AS (
  SELECT e.doc_id, avg(ln(c.n / (SELECT t FROM tt))) AS s, count(*) AS n_tok
  FROM ex e JOIN cnt c USING (token) GROUP BY e.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tok, 0) AS BIGINT) AS n_tokens,
       round(coalesce(p.s, 0.0), 6) AS lm_score
FROM documents d LEFT JOIN per p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# round-5 operators
# ---------------------------------------------------------------------------

HITS_ITERS = 10
HITS_DECIMALS = 7
KCORE_K = 3
KCORE_ROUNDS = 40
AA_CAP = 256
AA_TOP_K = 50


def hits_sql(p: str, iters: int = HITS_ITERS, decimals: int = HITS_DECIMALS) -> str:
    """HITS unrolled, UN-normalized power iteration (pipelines/hits.py: the
    per-iteration L2 norm is deferred so no global FP reduction threads
    through the recurrence); both scores max-scaled once at the end."""
    parts = [prelude(p)]
    parts.append(", h0 AS MATERIALIZED (SELECT v, 1.0 AS h FROM verts)\n")
    for i in range(1, iters + 1):
        parts.append(
            f""", a{i} AS MATERIALIZED (
  SELECT verts.v, coalesce(m.s, 0.0) AS a
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, sum(h.h) AS s
    FROM edges e JOIN h{i - 1} h ON e.src = h.v GROUP BY e.dst) m
  ON m.v = verts.v)
, h{i} AS MATERIALIZED (
  SELECT verts.v, coalesce(m.s, 0.0) AS h
  FROM verts LEFT JOIN (
    SELECT e.src AS v, sum(a.a) AS s
    FROM edges e JOIN a{i} a ON e.dst = a.v GROUP BY e.src) m
  ON m.v = verts.v)
"""
        )
    parts.append(
        f"""SELECT h.v,
       round(h.h / (SELECT max(h) FROM h{iters}), {decimals}) AS hub,
       round(a.a / (SELECT max(a) FROM a{iters}), {decimals}) AS auth
FROM h{iters} h JOIN a{iters} a ON a.v = h.v"""
    )
    return "".join(parts)


def ppr_sql(p: str, source: int = 0, supersteps: int = PR_SUPERSTEPS) -> str:
    """Personalized PageRank: pagerank_sql with the teleport mass landing
    only on ``source`` (pipelines/pagerank.py ``teleport``)."""
    parts = [prelude(p)]
    parts.append(
        ", r0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nv) AS rank FROM verts)\n"
    )
    for i in range(1, supersteps):
        prev = f"r{i - 1}"
        parts.append(
            f""", r{i} AS MATERIALIZED (
  SELECT verts.v,
         CASE WHEN verts.v = {source} THEN 0.15 ELSE 0.0 END
           + 0.85*coalesce(m.s, 0.0) AS rank
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, sum(r.rank / d.outdeg) AS s
    FROM edges e JOIN {prev} r ON e.src = r.v JOIN deg d ON d.src = e.src
    GROUP BY e.dst) m ON m.v = verts.v)
"""
        )
    parts.append(
        f"SELECT v, round(rank, {ROUND_DECIMALS}) AS rank FROM r{supersteps - 1}"
    )
    return "".join(parts)


def kcore_sql(p: str, k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """k-core membership by unrolled Jacobi peeling (pipelines/kcore.py);
    ``rounds`` must cover the engine's fixpoint (pytest-asserted margin)."""
    parts = [prelude(p)]
    parts.append(", k0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)\n")
    for i in range(1, rounds + 1):
        prev = f"k{i - 1}"
        parts.append(
            f""", k{i} AS MATERIALIZED (
  SELECT u.src AS v FROM und u
  JOIN {prev} a ON u.src = a.v JOIN {prev} b ON u.dst = b.v
  GROUP BY u.src HAVING count(*) >= {k})
"""
        )
    parts.append(
        f"""SELECT u.src AS v, CAST(count(*) AS BIGINT) AS core_deg
FROM und u
JOIN k{rounds} a ON u.src = a.v JOIN k{rounds} b ON u.dst = b.v
GROUP BY u.src"""
    )
    return "".join(parts)


def clustering_coefficient_sql(p: str) -> str:
    """Per-vertex local clustering coefficient (pipelines/triangles.py
    ``clustering_coefficient``): triangle PARTICIPATION (each triangle
    credits all three corners) over simple undirected degree."""
    return (
        prelude(p)
        + """, tri3 AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ori e1
  JOIN ori e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ori e3 ON e3.a = e1.b AND e3.b = e2.b),
parti AS MATERIALIZED (
  SELECT v, count(*) AS tri FROM (
    SELECT x AS v FROM tri3
    UNION ALL SELECT y FROM tri3
    UNION ALL SELECT z FROM tri3)
  GROUP BY v),
udeg AS MATERIALIZED (
  SELECT v, count(*) AS deg FROM (
    SELECT a AS v FROM ori UNION ALL SELECT b AS v FROM ori)
  GROUP BY v)
SELECT d.v, CAST(d.deg AS BIGINT) AS deg,
       CAST(coalesce(p2.tri, 0) AS BIGINT) AS triangles,
       round(CASE WHEN d.deg >= 2
                  THEN (2.0*coalesce(p2.tri, 0))/(CAST(d.deg AS DOUBLE)*(d.deg - 1.0))
                  ELSE 0.0 END, 9) AS lcc
FROM udeg d LEFT JOIN parti p2 ON p2.v = d.v"""
    )


def adamic_adar_sql(p: str, k: int = AA_TOP_K, cap: int = AA_CAP) -> str:
    """Top-k Adamic–Adar pairs (pipelines/linkpred.py): common-neighbor
    wedges over und, centers capped at ``cap`` degree (identical
    deterministic cap on both sides), existing edges anti-joined out."""
    return (
        prelude(p)
        + f""", udeg AS MATERIALIZED (
  SELECT src AS v, count(*) AS dg FROM und GROUP BY src),
wedge AS MATERIALIZED (
  SELECT u1.dst AS a, u2.dst AS b, u1.src AS z
  FROM und u1 JOIN und u2 ON u1.src = u2.src AND u1.dst < u2.dst
  JOIN udeg dz ON dz.v = u1.src AND dz.dg <= {cap}),
cand AS MATERIALIZED (
  SELECT w.a, w.b, CAST(count(*) AS BIGINT) AS common,
         round(sum(1.0/ln(CAST(dz.dg AS DOUBLE))), 9) AS score
  FROM wedge w JOIN udeg dz ON dz.v = w.z
  GROUP BY w.a, w.b)
SELECT c.a, c.b, c.common, c.score
FROM cand c LEFT JOIN ori o ON o.a = c.a AND o.b = c.b
WHERE o.a IS NULL
ORDER BY c.score DESC, c.a ASC, c.b ASC
LIMIT {k}"""
    )


def bigram_pmi_sql(k: int = 50, min_count: int = 5) -> str:
    """Top-k PMI collocations (corpus.bigram_pmi): adjacent whitespace-token
    pairs zipped via aligned unnests; the float expression uses the exact
    double-op order of the engine (ln((c12/B)/((c1/U)*(c2/U))))."""
    return f"""
WITH {_TOKS_CTE},
tok AS MATERIALIZED (SELECT unnest(ws) AS token FROM toks),
uni AS MATERIALIZED (
  SELECT token, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY token),
uu AS (SELECT CAST(count(*) AS DOUBLE) AS u FROM tok),
big AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c12 FROM (
    SELECT unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
    FROM toks WHERE len(ws) >= 2)
  GROUP BY w1, w2),
bb AS (SELECT CAST(sum(c12) AS DOUBLE) AS b FROM big)
SELECT w1, w2, CAST(c12 AS BIGINT) AS cnt,
       round(ln((CAST(c12 AS DOUBLE) / (SELECT b FROM bb))
                / ((u1.c / (SELECT u FROM uu)) * (u2.c / (SELECT u FROM uu)))),
             9) AS pmi
FROM big
JOIN uni u1 ON u1.token = big.w1
JOIN uni u2 ON u2.token = big.w2
WHERE c12 >= {min_count}
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT {k}
"""


def quantize_int8_sql() -> str:
    """Symmetric per-dim int8 quantization (embeddings.quantize_int8):
    code = round(127·x/maxabs_dim), round half away from zero — DuckDB
    ``round`` and the engine's sign·floor(|y|+0.5) agree by construction."""
    return """
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
  FROM embeddings),
s AS MATERIALIZED (SELECT dim, max(abs(x)) AS mx FROM e GROUP BY dim)
SELECT e.vec_id, e.dim,
       CAST(CASE WHEN s.mx = 0 THEN 0
                 ELSE round(127.0 * e.x / s.mx) END AS BIGINT) AS code
FROM e JOIN s ON s.dim = e.dim
"""


def degree_histogram_sql(p: str) -> str:
    """Out-degree distribution incl. the degree-0 row (degrees.degree_histogram)."""
    return (
        prelude(p)
        + """SELECT out_degree, CAST(count(*) AS BIGINT) AS n_vertices FROM (
  SELECT verts.v, coalesce(CAST(d.outdeg AS BIGINT), 0) AS out_degree
  FROM verts LEFT JOIN deg d ON d.src = verts.v)
GROUP BY out_degree"""
    )


WALK_LEN = 4


def random_walks_sql(p: str, walk_len: int = WALK_LEN) -> str:
    """Deterministic uniform random walks (pipelines/walks.py): next hop =
    ascending-sorted neighbor at index md5_u64('{walk_id}:{t}:{v}') mod deg
    — the engine's exact hash, replayed per step as a rank-join."""
    parts = [prelude(p)]
    parts.append(
        """, adj AS MATERIALIZED (
  SELECT src, dst,
         CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS rnk,
         CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS dg
  FROM und),
w0 AS MATERIALIZED (SELECT DISTINCT src AS walk_id, src AS v FROM und)
"""
    )
    for t in range(1, walk_len + 1):
        parts.append(
            f""", w{t} AS MATERIALIZED (
  SELECT w.walk_id, a.dst AS v
  FROM w{t - 1} w JOIN adj a ON a.src = w.v AND a.rnk = CAST(
    ('0x' || substr(md5(CAST(w.walk_id AS VARCHAR) || ':{t}:' || CAST(w.v AS VARCHAR)), 1, 16))::UBIGINT
    % CAST(a.dg AS UBIGINT) AS BIGINT))
"""
        )
    selects = ["SELECT walk_id, CAST(0 AS BIGINT) AS step, v FROM w0"]
    for t in range(1, walk_len + 1):
        selects.append(f"SELECT walk_id, CAST({t} AS BIGINT) AS step, v FROM w{t}")
    parts.append("\nUNION ALL\n".join(selects))
    return "".join(parts)


def pagerank_weighted_sql(p: str, supersteps: int = PR_SUPERSTEPS) -> str:
    """Weighted PageRank over the weighted edge derivation (the
    sssp_weighted wedges): contributions rank·w/Σ_out w, uniform teleport —
    ``pagerank_dense(weight_col='w')`` with the weighted out-sum vector."""
    parts = [prelude(p)]
    parts.append(_WEDGES_CTE)
    parts.append(
        ", wdeg AS MATERIALIZED (SELECT src, sum(w) AS wsum FROM wedges GROUP BY src)\n"
    )
    parts.append(
        ", p0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nv) AS rank FROM verts)\n"
    )
    for i in range(1, supersteps):
        prev = f"p{i - 1}"
        parts.append(
            f""", p{i} AS MATERIALIZED (
  SELECT verts.v,
         0.15/(SELECT n FROM nv) + 0.85*coalesce(m.s, 0.0) AS rank
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, sum(r.rank * e.w / d.wsum) AS s
    FROM wedges e JOIN {prev} r ON e.src = r.v JOIN wdeg d ON d.src = e.src
    GROUP BY e.dst) m ON m.v = verts.v)
"""
        )
    parts.append(
        f"SELECT v, round(rank, {ROUND_DECIMALS}) AS rank FROM p{supersteps - 1}"
    )
    return "".join(parts)


MIS_ROUNDS = 40


def mis_sql(p: str, rounds: int = MIS_ROUNDS) -> str:
    """Greedy-by-priority maximal independent set (pipelines/mis.py):
    priority = md5_u64(str(v)) >> 11; each unrolled round picks live
    vertices beating every live neighbor, then removes winners' neighbors."""
    parts = [prelude(p)]
    parts.append(
        """, pri AS MATERIALIZED (
  SELECT v, CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 16))::UBIGINT >> 11 AS BIGINT) AS h
  FROM verts),
s0 AS MATERIALIZED (SELECT v, true AS live, false AS mis FROM verts)
"""
    )
    for i in range(1, rounds + 1):
        prev = f"s{i - 1}"
        parts.append(
            f""", mx{i} AS (
  SELECT u.dst AS v, max(ph.h) AS mh
  FROM und u
  JOIN {prev} a ON u.src = a.v AND a.live
  JOIN {prev} b ON u.dst = b.v AND b.live
  JOIN pri ph ON ph.v = u.src
  GROUP BY u.dst),
win{i} AS (
  SELECT s.v FROM {prev} s
  JOIN pri p2 ON p2.v = s.v
  LEFT JOIN mx{i} m ON m.v = s.v
  WHERE s.live AND p2.h > coalesce(m.mh, -1)),
rem{i} AS (
  SELECT DISTINCT u.dst AS v FROM und u JOIN win{i} w ON u.src = w.v),
s{i} AS MATERIALIZED (
  SELECT s.v,
         s.live AND w.v IS NULL AND r.v IS NULL AS live,
         s.mis OR w.v IS NOT NULL AS mis
  FROM {prev} s
  LEFT JOIN win{i} w ON w.v = s.v
  LEFT JOIN rem{i} r ON r.v = s.v)
"""
        )
    parts.append(f"SELECT v FROM s{rounds} WHERE mis")
    return "".join(parts)


KTRUSS_K = 4
KTRUSS_ROUNDS = 20


def ktruss_sql(p: str, k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS) -> str:
    """k-truss by unrolled Jacobi edge-peeling (pipelines/truss.py): each
    round recomputes per-edge triangle support over the survivors and
    deletes every edge below k-2; idempotent past the fixpoint."""
    parts = [prelude(p)]
    parts.append(", e0 AS MATERIALIZED (SELECT a, b FROM ori)\n")
    for i in range(1, rounds + 1):
        prev = f"e{i - 1}"
        parts.append(
            f""", tri{i} AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM {prev} e1
  JOIN {prev} e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN {prev} e3 ON e3.a = e1.b AND e3.b = e2.b),
sup{i} AS MATERIALIZED (
  SELECT ea, eb, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT x AS ea, y AS eb FROM tri{i}
    UNION ALL SELECT x, z FROM tri{i}
    UNION ALL SELECT y, z FROM tri{i})
  GROUP BY ea, eb),
e{i} AS MATERIALIZED (
  SELECT ea AS a, eb AS b FROM sup{i} WHERE support >= {k - 2})
"""
        )
    parts.append(
        f"SELECT ea AS a, eb AS b, support FROM sup{rounds} WHERE support >= {k - 2}"
    )
    return "".join(parts)


def token_entropy_sql() -> str:
    """Per-doc lexical diversity (corpus.token_entropy): TTR is one
    exact-int double division (bit-identical); entropy is a float sum
    rounded at 6 decimals so engine-vs-SQL accumulation-order noise
    (~1e-15) cannot reach a rounding boundary; +0.0 clears −0.0 from
    single-token docs on both sides."""
    return """
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''),
tf AS MATERIALIZED (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok),
nt AS MATERIALIZED (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS dt
  FROM tf GROUP BY doc_id),
ent AS (
  SELECT t.doc_id,
         round(sum(-(CAST(t.tf AS DOUBLE) / CAST(nt.n AS DOUBLE))
                   * log2(CAST(t.tf AS DOUBLE) / CAST(nt.n AS DOUBLE))), 6)
         + 0.0 AS entropy
  FROM tf t JOIN nt ON nt.doc_id = t.doc_id
  GROUP BY t.doc_id)
SELECT d.doc_id,
       COALESCE(nt.n, 0) AS n_tokens,
       COALESCE(nt.dt, 0) AS distinct_tokens,
       COALESCE(round(CAST(nt.dt AS DOUBLE) / CAST(nt.n AS DOUBLE), 9), 0.0)
         AS ttr,
       COALESCE(ent.entropy, 0.0) AS entropy
FROM documents d
LEFT JOIN nt ON nt.doc_id = d.doc_id
LEFT JOIN ent ON ent.doc_id = d.doc_id"""


def transitivity_sql(p: str) -> str:
    """Global clustering coefficient (triangles.transitivity):
    3·|triangles| / Σ_v C(deg v, 2) — both operands exact integers in
    double, single closing division + round(9)."""
    return (
        prelude(p)
        + """, udeg AS MATERIALIZED (
  SELECT src AS v, count(*) AS dg FROM und GROUP BY src),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS t
  FROM ori e1
  JOIN ori e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN ori e3 ON e3.a = e1.b AND e3.b = e2.b),
wed AS (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT) AS w FROM udeg)
SELECT tri.t AS triangles, wed.w AS wedges,
       round(3.0 * CAST(tri.t AS DOUBLE) / CAST(wed.w AS DOUBLE), 9)
       AS transitivity
FROM tri, wed"""
    )


def jaccard_linkpred_sql(p: str, k: int = AA_TOP_K, cap: int = AA_CAP) -> str:
    """Top-k Jaccard-coefficient pairs (linkpred.jaccard_topk): capped
    common-neighbor wedges (identical deterministic cap on both sides),
    FULL endpoint degrees for the union denominator, existing edges
    anti-joined out — one exact-integer double division closes the score."""
    return (
        prelude(p)
        + f""", udeg AS MATERIALIZED (
  SELECT src AS v, count(*) AS dg FROM und GROUP BY src),
wedge AS MATERIALIZED (
  SELECT u1.dst AS a, u2.dst AS b
  FROM und u1 JOIN und u2 ON u1.src = u2.src AND u1.dst < u2.dst
  JOIN udeg dz ON dz.v = u1.src AND dz.dg <= {cap}),
cand AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS common FROM wedge GROUP BY a, b),
sc AS (
  SELECT c.a, c.b, c.common,
         CAST(da.dg + db.dg - c.common AS BIGINT) AS union_size,
         round(CAST(c.common AS DOUBLE)
               / CAST(da.dg + db.dg - c.common AS DOUBLE), 9) AS score
  FROM cand c JOIN udeg da ON da.v = c.a JOIN udeg db ON db.v = c.b)
SELECT s.a, s.b, s.common, s.union_size, s.score
FROM sc s LEFT JOIN ori o ON o.a = s.a AND o.b = s.b
WHERE o.a IS NULL
ORDER BY s.score DESC, s.a ASC, s.b ASC
LIMIT {k}"""
    )


def assortativity_sql(p: str) -> str:
    """Degree assortativity (degrees.degree_assortativity): Pearson corr of
    endpoint degrees over und — all sufficient-statistic sums are exact
    integers in double, so the closing formula is bit-identical."""
    return (
        prelude(p)
        + """, udeg AS MATERIALIZED (
  SELECT src AS v, count(*) AS deg FROM und GROUP BY src),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS m,
         sum(CAST(du.deg AS DOUBLE)) AS sx,
         sum(CAST(dv.deg AS DOUBLE)) AS sy,
         sum(CAST(du.deg AS DOUBLE) * CAST(dv.deg AS DOUBLE)) AS sxy,
         sum(CAST(du.deg AS DOUBLE) * CAST(du.deg AS DOUBLE)) AS sxx,
         sum(CAST(dv.deg AS DOUBLE) * CAST(dv.deg AS DOUBLE)) AS syy
  FROM und u JOIN udeg du ON du.v = u.src JOIN udeg dv ON dv.v = u.dst)
SELECT round((m*sxy - sx*sy) / (sqrt(m*sxx - sx*sx) * sqrt(m*syy - sy*sy)), 9)
       AS assortativity
FROM st"""
    )


def katz_sql(
    p: str, alpha: float = 0.01, iters: int = 10, decimals: int = 7
) -> str:
    """Katz centrality unrolled (pipelines/katz.py): x_{k+1} = 1 + alpha *
    sum of in-neighbor x_k, no per-round normalization; max-scaled once at
    the end exactly like the HITS oracle."""
    parts = [prelude(p)]
    parts.append(", x0 AS MATERIALIZED (SELECT v, 1.0 AS x FROM verts)\n")
    for i in range(1, iters + 1):
        parts.append(
            f""", x{i} AS MATERIALIZED (
  SELECT verts.v, 1.0 + {alpha} * coalesce(m.s, 0.0) AS x
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, sum(x.x) AS s
    FROM edges e JOIN x{i - 1} x ON e.src = x.v GROUP BY e.dst) m
  ON m.v = verts.v)
"""
        )
    parts.append(
        f"SELECT v, round(x / (SELECT max(x) FROM x{iters}), {decimals}) "
        f"AS katz FROM x{iters}"
    )
    return "".join(parts)


def avg_neighbor_degree_sql(p: str) -> str:
    """Per-vertex mean neighbor degree (degrees.avg_neighbor_degree): the
    numerator sum is an exact integer in double and count(*) equals the
    vertex's undirected degree, so the single closing division matches the
    engine bit-for-bit before the half-away round."""
    return (
        prelude(p)
        + """, udeg AS MATERIALIZED (
  SELECT src AS v, count(*) AS deg FROM und GROUP BY src)
SELECT u.src AS v,
       round(CAST(sum(d.deg) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
         AS avg_nbr_deg
FROM und u JOIN udeg d ON d.v = u.dst
GROUP BY u.src"""
    )


def funnel_stages_sql(
    stages: tuple = ("view", "click", "purchase"),
) -> str:
    """Ordered conversion funnel (events.funnel_stages) recomputed as a
    chain of first-touch min-joins: t1 = first stage-0 event per user,
    t2 = first stage-1 event STRICTLY after t1, t3 = first stage-2 event
    strictly after t2 — integer-exact (microsecond timestamps)."""
    s0, s1, s2 = stages
    return f"""
WITH e AS MATERIALIZED (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu, event_type
  FROM events WHERE event_type IN ('{s0}', '{s1}', '{s2}')
),
t1 AS (SELECT user_id, min(tsu) AS t FROM e
       WHERE event_type = '{s0}' GROUP BY user_id),
t2 AS (SELECT e.user_id, min(e.tsu) AS t FROM e JOIN t1 USING (user_id)
       WHERE e.event_type = '{s1}' AND e.tsu > t1.t GROUP BY e.user_id),
t3 AS (SELECT e.user_id, min(e.tsu) AS t FROM e JOIN t2 USING (user_id)
       WHERE e.event_type = '{s2}' AND e.tsu > t2.t GROUP BY e.user_id)
SELECT t1.user_id AS user_id,
       CAST(1 + CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN t3.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS funnel_stage
FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id
"""


def retention_counts_sql(day_us: int = 86_400_000_000) -> str:
    """Cohort retention (events.retention_counts): distinct active
    (user, epoch-day) pairs, cohort = each user's min day, then distinct
    users per (cohort_day, day_offset) cell — integer-exact."""
    return f"""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // {day_us} AS BIGINT) AS day
  FROM events
),
f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id)
SELECT f.cohort AS cohort_day,
       ud.day - f.cohort AS day_offset,
       count(*) AS n_users
FROM ud JOIN f USING (user_id)
GROUP BY 1, 2
"""


def resource_allocation_sql(p: str, k: int = AA_TOP_K, cap: int = AA_CAP) -> str:
    """Top-k resource-allocation pairs (linkpred.resource_allocation_topk):
    the adamic_adar_sql plan with center weight 1.0/CAST(deg AS DOUBLE)."""
    return (
        prelude(p)
        + f""", udeg AS MATERIALIZED (
  SELECT src AS v, count(*) AS dg FROM und GROUP BY src),
wedge AS MATERIALIZED (
  SELECT u1.dst AS a, u2.dst AS b, u1.src AS z
  FROM und u1 JOIN und u2 ON u1.src = u2.src AND u1.dst < u2.dst
  JOIN udeg dz ON dz.v = u1.src AND dz.dg <= {cap}),
cand AS MATERIALIZED (
  SELECT w.a, w.b, CAST(count(*) AS BIGINT) AS common,
         round(sum(1.0/CAST(dz.dg AS DOUBLE)), 9) AS score
  FROM wedge w JOIN udeg dz ON dz.v = w.z
  GROUP BY w.a, w.b)
SELECT c.a, c.b, c.common, c.score
FROM cand c LEFT JOIN ori o ON o.a = c.a AND o.b = c.b
WHERE o.a IS NULL
ORDER BY c.score DESC, c.a ASC, c.b ASC
LIMIT {k}"""
    )


def top_events_per_user_sql(k: int = 3) -> str:
    """Per-user top-k events by value (events.top_events_per_user): a
    row_number window with the identical (value DESC, event_id ASC)
    deterministic tie-break."""
    return f"""
WITH r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events)
SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= {k}
"""


def dup_clusters_sql(threshold: float = 0.4, rounds: int = 12) -> str:
    """Near-dup cluster canonicalization (textops.dup_clusters): the full
    minhash_lsh_sql pair pipeline as a subquery, then ``rounds`` unrolled
    Jacobi min-label-propagation steps over the symmetrized pair graph
    (label0 = own id; label_{i+1}(v) = min(label_i(v), min_u label_i(u))).
    Exact iff the engine's CC converges within ``rounds`` — asserted in
    tests/test_dedup_pipeline.py style unroll-bound checks."""
    inner = minhash_lsh_sql(threshold)
    steps = []
    prev = "l0"
    for i in range(1, rounds + 1):
        steps.append(
            f"""l{i} AS (
  SELECT v, min(label) AS label FROM (
    SELECT v, label FROM {prev}
    UNION ALL
    SELECT e.v AS v, l.label AS label FROM e JOIN {prev} l ON l.v = e.u
  ) GROUP BY v)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(steps)
    return f"""
WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({inner})),
e AS MATERIALIZED (
  SELECT doc_a AS v, doc_b AS u FROM pairs
  UNION ALL SELECT doc_b AS v, doc_a AS u FROM pairs),
l0 AS (SELECT DISTINCT v, v AS label FROM e),
{chain}
SELECT v AS doc_id, label AS cluster_id,
       CAST(v = label AS BIGINT) AS keep
FROM {prev}
"""


def nearest_to_centroids_sql(k: int = 5) -> str:
    """Per-label centroid exemplars (embeddings.nearest_to_centroids):
    centroid = positional mean via aligned unnests, then the knn_sql plan
    with centroids as the query side (list_cosine_similarity, identical
    DESC/vec_id tie-break, 1e-6 sim grid)."""
    return f"""
WITH ex AS MATERIALIZED (
  SELECT label, unnest(embedding) AS x, unnest(range(len(embedding))) AS i
  FROM embeddings),
pern AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
dims AS (SELECT label, i, sum(CAST(x AS DOUBLE)) AS sx
         FROM ex GROUP BY label, i),
cent AS (SELECT d.label, list(sx / p.n ORDER BY i) AS c
         FROM dims d JOIN pern p USING (label) GROUP BY d.label),
sims AS (
  SELECT CAST(cent.label AS BIGINT) AS query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cent.c) AS s
  FROM embeddings e CROSS JOIN cent)
SELECT query_id, vec_id, round(s, 6) AS sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY s DESC, vec_id ASC) AS rn
      FROM sims)
WHERE rn <= {k}
"""


def bfs_multi_sql(p: str, sources: tuple = (0, 1, 2, 3)) -> str:
    """Multi-source BFS distances (one unrolled sssp_sql per source,
    unioned with a source tag) — the oracle for the shared-bulk-load
    multi-job chain in ``_q_bfs_multi_source``."""
    legs = [
        f"SELECT CAST({s} AS BIGINT) AS source, v, dist FROM ({sssp_sql(p, s)})"
        for s in sources
    ]
    return "\nUNION ALL\n".join(legs)


def event_value_quantiles_sql(qs: tuple = (0.25, 0.5, 0.75, 0.95)) -> str:
    """Per-type exact value quantiles (events.event_value_quantiles): the
    length_quantiles_sql cumulative-histogram plan over (event_type,
    value) — picks return stored doubles bit-identically."""
    picks = ",\n       ".join(
        f"min(CASE WHEN cum >= ceil({q!r} * total) THEN value END) "
        f"AS p{int(round(q * 100))}"
        for q in qs
    )
    return f"""
WITH hist AS MATERIALIZED (
  SELECT event_type, value, count(*) AS n FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, value,
         sum(n) OVER (PARTITION BY event_type ORDER BY value) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM hist
)
SELECT event_type,
       {picks}
FROM cum GROUP BY event_type
"""


def centroid_separation_sql() -> str:
    """Label-centroid cosine separation matrix
    (embeddings.centroid_separation): centroids via aligned unnests +
    list(), pairwise list_cosine_similarity on the label_a < label_b
    triangle, 1e-6 sim grid."""
    return """
WITH ex AS MATERIALIZED (
  SELECT label, unnest(embedding) AS x, unnest(range(len(embedding))) AS i
  FROM embeddings),
pern AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
dims AS (SELECT label, i, sum(CAST(x AS DOUBLE)) AS sx
         FROM ex GROUP BY label, i),
cent AS (SELECT d.label, list(sx / p.n ORDER BY i) AS c
         FROM dims d JOIN pern p USING (label) GROUP BY d.label)
SELECT CAST(a.label AS BIGINT) AS label_a,
       CAST(b.label AS BIGINT) AS label_b,
       round(list_cosine_similarity(a.c, b.c), 6) AS sim
FROM cent a JOIN cent b ON a.label < b.label
"""


def sliding_counts_sql(
    window_us: int = 3_600_000_000, hop_us: int = 900_000_000
) -> str:
    """Sliding-window per-type aggregate (events.sliding_counts): each
    event unnested onto its ceil(width/hop) covering hop-grid starts."""
    k = int((window_us + hop_us - 1) // hop_us)
    return f"""
WITH ev AS MATERIALIZED (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS tsu, event_type, value FROM events
),
exp AS (
  SELECT (tsu // {hop_us}) * {hop_us} - unnest(range({k})) * {hop_us}
           AS window_us,
         tsu, event_type, value
  FROM ev
)
SELECT window_us, event_type,
       count(*) AS n, round(sum(value), 6) AS sum_value
FROM exp
WHERE tsu < window_us + {window_us} AND window_us >= 0
GROUP BY 1, 2
"""


def user_profiles_sql() -> str:
    """Per-user activity profile (events.user_profiles)."""
    return """
SELECT user_id,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_types,
       round(sum(value), 6) AS sum_value,
       min(CAST(epoch_us(ts) AS BIGINT)) AS first_us,
       max(CAST(epoch_us(ts) AS BIGINT)) AS last_us
FROM events GROUP BY user_id
"""


def source_stats_sql() -> str:
    """Per-source corpus rollup (corpus.source_stats): Σchars exact in
    double, one closing division, half-away round."""
    return """
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars
FROM documents GROUP BY source
"""


BETW_SOURCES = (0, 1, 2, 3)
BETW_DEPTH = 12
BETW_DECIMALS = 6


def betweenness_sql(
    p: str,
    sources: tuple = BETW_SOURCES,
    depth: int = BETW_DEPTH,
    decimals: int = BETW_DECIMALS,
) -> str:
    """Source-sampled Brandes betweenness (pipelines/betweenness.py):
    per source an unrolled forward BFS accumulating path counts σ (levels
    n0..nD with a growing visited set), then unrolled backward dependency
    CTEs d{l} evaluating the engine's exact per-edge double expression
    σ_u/σ_v · (1+δ_v); contributions unioned across sources, summed per
    vertex, rounded half-away. Engine raises if a BFS exceeds ``depth``,
    so the two unrolls can never silently desynchronize."""
    ctes = []
    finals = []
    for s in sources:
        sx = f"s{s}"
        ctes.append(
            f"n0_{sx} AS MATERIALIZED (SELECT CAST({s} AS BIGINT) AS v, "
            f"CAST(1 AS DOUBLE) AS sig)"
        )
        ctes.append(f"vis0_{sx} AS MATERIALIZED (SELECT v FROM n0_{sx})")
        for l in range(1, depth + 1):
            ctes.append(
                f"""n{l}_{sx} AS MATERIALIZED (
  SELECT e.dst AS v, sum(pr.sig) AS sig
  FROM und e JOIN n{l - 1}_{sx} pr ON e.src = pr.v
  LEFT JOIN vis{l - 1}_{sx} x ON x.v = e.dst
  WHERE x.v IS NULL GROUP BY e.dst)"""
            )
            ctes.append(
                f"vis{l}_{sx} AS MATERIALIZED (SELECT v FROM vis{l - 1}_{sx} "
                f"UNION ALL SELECT v FROM n{l}_{sx})"
            )
        ctes.append(
            f"d{depth}_{sx} AS MATERIALIZED (SELECT v, CAST(0.0 AS DOUBLE) AS delta "
            f"FROM n{depth}_{sx})"
        )
        for l in range(depth - 1, 0, -1):
            ctes.append(
                f"""d{l}_{sx} AS MATERIALIZED (
  SELECT pr.v, coalesce(sum(pr.sig / c.sig * (1 + c.delta)), 0.0) AS delta
  FROM n{l}_{sx} pr
  LEFT JOIN und e ON e.src = pr.v
  LEFT JOIN (SELECT q.v, q.sig, dd.delta
             FROM n{l + 1}_{sx} q JOIN d{l + 1}_{sx} dd ON dd.v = q.v) c
    ON c.v = e.dst
  GROUP BY pr.v)"""
            )
        finals.extend(
            f"SELECT v, delta FROM d{l}_{sx}" for l in range(1, depth + 1)
        )
    contrib = "\nUNION ALL\n".join(finals)
    return (
        prelude(p)
        + ", "
        + ",\n".join(ctes)
        + f"""
SELECT v, round(sum(delta), {decimals}) AS bc
FROM ({contrib})
GROUP BY v HAVING sum(delta) > 0"""
    )


def bfs_eccentricity_sql(p: str, sources: tuple = (0, 1, 2, 3)) -> str:
    """Seed eccentricities (max finite BFS distance, diameter lower bound)
    — closes over the bfs_multi_sql union like harmonic centrality."""
    return f"""
SELECT source, CAST(max(dist) AS BIGINT) AS eccentricity,
       CAST(count(*) AS BIGINT) AS n_reached
FROM ({bfs_multi_sql(p, sources)})
WHERE dist > 0 GROUP BY source
"""


def bfs_harmonic_sql(p: str, sources: tuple = (0, 1, 2, 3)) -> str:
    """Harmonic centrality of the BFS seeds (Σ 1/dist over reached
    vertices) — closes over the bfs_multi_sql union."""
    return f"""
SELECT source, round(sum(1.0 / dist), 6) AS harmonic,
       CAST(count(*) AS BIGINT) AS n_reached
FROM ({bfs_multi_sql(p, sources)})
WHERE dist > 0 GROUP BY source
"""


def random_projection_sql(k: int = 8, dim: int = 64) -> str:
    """md5-Rademacher JL projection (embeddings.random_projection): the
    sign matrix recomputed from the SAME md5 parity, aligned unnests, one
    sum per (vec, j) divided by √k — 1e-6 grid for summation order."""
    return f"""
WITH ex AS MATERIALIZED (
  SELECT vec_id, unnest(embedding) AS x, unnest(range(len(embedding))) AS i
  FROM embeddings),
sgn AS MATERIALIZED (
  SELECT ii.range AS i, jj.range AS j,
         CASE WHEN (('0x' || substr(md5('rp:' || ii.range || ':' || jj.range),
                     1, 16))::UBIGINT % 2) = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM range({dim}) ii, range({k}) jj)
SELECT e.vec_id, s.j,
       round(sum(CAST(e.x AS DOUBLE) * s.s) / sqrt({float(k)!r}), 6) AS value
FROM ex e JOIN sgn s ON s.i = e.i
GROUP BY 1, 2
"""


def window_anomalies_sql(
    window_us: int = 3_600_000_000, z_threshold: float = 2.0
) -> str:
    """Window volume anomalies (events.window_anomalies): the identical
    two-pass population z-score (explicit Σ(n−μ)²/c, NOT var_pop's online
    accumulator, so the FP path matches the engine's)."""
    return f"""
WITH wc AS MATERIALIZED (
  SELECT (epoch_us(ts) // {window_us}) * {window_us} AS window_us,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
st AS MATERIALIZED (
  SELECT event_type, CAST(sum(n) AS DOUBLE) / count(*) AS mu,
         count(*) AS c
  FROM wc GROUP BY 1),
sd AS MATERIALIZED (
  SELECT w.event_type, sqrt(sum((w.n - s.mu) * (w.n - s.mu)) / s.c) AS sd
  FROM wc w JOIN st s USING (event_type) GROUP BY w.event_type, s.c)
SELECT w.window_us, w.event_type, w.n,
       round((w.n - s.mu) / d.sd, 6) AS z
FROM wc w JOIN st s USING (event_type) JOIN sd d USING (event_type)
WHERE abs((w.n - s.mu) / d.sd) >= {z_threshold!r}
"""


def gap_stats_sql() -> str:
    """Per-user inter-arrival stats (events.gap_stats): lag-diff gaps,
    exact-int Σ/count mean, half-away round."""
    return """
WITH e AS MATERIALIZED (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu FROM events),
g AS (
  SELECT user_id,
         tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS gap
  FROM e)
SELECT user_id,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       round(CAST(sum(gap) AS DOUBLE) / count(gap), 6) AS mean_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g WHERE gap IS NOT NULL
GROUP BY user_id
"""


def vocab_stats_sql() -> str:
    """Corpus vocabulary stats (corpus.vocab_stats)."""
    return f"""
WITH {_TOKS_CTE},
tok AS MATERIALIZED (SELECT unnest(ws) AS token FROM toks),
tc AS MATERIALIZED (SELECT token, count(*) AS n FROM tok GROUP BY token)
SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(count(*) AS BIGINT) AS distinct_tokens,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       round(CAST(count(*) AS DOUBLE) / sum(n), 9) AS ttr
FROM tc
"""


def transition_counts_sql() -> str:
    """Markov transition counts (events.transition_counts): lead() window
    with the identical (ts, event_id) in-user ordering."""
    return """
WITH e AS MATERIALIZED (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsu, event_id, event_type
  FROM events),
nx AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY tsu, event_id) AS to_type
  FROM e)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2
"""


def rolling_active_users_sql(window_days: int = 7) -> str:
    """Rolling WAU (events.rolling_active_users) recomputed as a direct
    band join — an independent formulation of the engine's expand +
    distinct plan."""
    return f"""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events),
obs AS (SELECT DISTINCT day FROM ud)
SELECT o.day AS day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
FROM obs o JOIN ud u ON u.day BETWEEN o.day - {window_days - 1} AND o.day
GROUP BY o.day
"""


def cluster_cohesion_sql() -> str:
    """Per-label cohesion (embeddings.cluster_cohesion): the
    nearest_to_centroids_sql centroid CTEs, members joined to their OWN
    label centroid, Σsim/count on the 1e-6 grid."""
    return """
WITH ex AS MATERIALIZED (
  SELECT label, unnest(embedding) AS x, unnest(range(len(embedding))) AS i
  FROM embeddings),
pern AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
dims AS (SELECT label, i, sum(CAST(x AS DOUBLE)) AS sx
         FROM ex GROUP BY label, i),
cent AS (SELECT d.label, list(sx / p.n ORDER BY i) AS c
         FROM dims d JOIN pern p USING (label) GROUP BY d.label),
sims AS (
  SELECT e.label,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), cent.c) AS s
  FROM embeddings e JOIN cent ON cent.label = e.label)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
       round(sum(s) / count(*), 6) AS mean_sim
FROM sims GROUP BY label
"""


def session_type_pairs_sql(gap_us: int = 1_800_000_000) -> str:
    """Per-session type co-occurrence (events.session_type_pairs): the
    sessionize_sql windows + a distinct (session, type) self-join."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT user_id, event_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS tsu FROM events
),
flags AS (
  SELECT user_id, event_type, tsu, event_id,
         CASE WHEN lag(tsu) OVER w IS NULL
                   OR tsu - lag(tsu) OVER w > {gap_us} THEN 1 ELSE 0 END AS new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
sess AS (
  SELECT user_id, event_type,
         sum(new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM flags
),
st AS MATERIALIZED (SELECT DISTINCT user_id, session_id, event_type FROM sess)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n
FROM st a JOIN st b
  ON a.user_id = b.user_id AND a.session_id = b.session_id
 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def pricing_summary_sql(cutoff: str = "1998-09-02") -> str:
    """TPC-H Q1-style pricing summary (relational.pricing_summary): every
    aggregate folded in exact integer units (cents / 1e-4 units), closing
    divisions in the engine's exact double-op order."""
    return f"""
WITH li AS MATERIALIZED (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity, 0) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS u
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '{cutoff}'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(q) AS BIGINT) AS sum_qty,
       CAST(sum(c) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(sum(u) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(c) AS DOUBLE) / 100.0 / count(*) AS avg_price
FROM li GROUP BY 1, 2
"""


def inactive_customers_sql(min_totalprice: float = 400_000.0) -> str:
    """Anti join (relational.inactive_customers): NOT EXISTS formulation."""
    return f"""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {min_totalprice}
)
"""


def priority_return_counts_sql() -> str:
    """Semi join (relational.priority_return_counts): EXISTS formulation."""
    return """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o_orderpriority
"""


def nation_revenue_sql() -> str:
    """Per-nation order revenue (relational.nation_revenue): exact cents."""
    return """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


def shipping_priority_sql(
    segment: str = "BUILDING", date: str = "1998-01-01", k: int = 10
) -> str:
    """TPC-H Q3-style shipping priority (relational.shipping_priority):
    exact 1e-4-unit revenue, (revenue desc, orderkey) deterministic
    ordering."""
    return f"""
WITH big AS MATERIALIZED (
  SELECT l.l_orderkey,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS u,
         CAST(epoch_us(o.o_orderdate) AS BIGINT) AS odate
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = '{segment}'
    AND o.o_orderdate < TIMESTAMP '{date}'
    AND l.l_shipdate > TIMESTAMP '{date}'
)
SELECT l_orderkey,
       CAST(sum(u) AS DOUBLE) / 10000.0 AS revenue,
       max(odate) AS o_orderdate_us
FROM big GROUP BY l_orderkey
ORDER BY sum(u) DESC, l_orderkey ASC
LIMIT {k}
"""


def brand_volume_sql() -> str:
    """Per-brand shipped volume (relational.brand_volume): exact cents."""
    return """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
         AS sum_qty,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
            AS DOUBLE) / 100.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
"""


def region_revenue_sql() -> str:
    """Per-region supplier revenue (relational.region_revenue): exact
    1e-4 discounted units."""
    return """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
"""


def quality_by_lang_sql() -> str:
    """Per-language quality rollup (textops.quality_by_lang): the
    quality_scores_sql per-doc expressions summed per language."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS ws
  FROM documents
),
feats AS (
  SELECT doc_id, lang,
         len(ws) AS n_words,
         CAST(len(list_filter(ws, x -> x IN {_STOPWORD_SQL})) AS DOUBLE)
           AS stops
  FROM toks
),
q AS (
  SELECT lang,
         round(n_words * (1 - round(stops / greatest(n_words, 1), 6)), 6)
           AS score,
         round(stops / greatest(n_words, 1), 6) AS ratio
  FROM feats
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(score) / count(*), 6) AS mean_score,
       round(sum(ratio) / count(*), 6) AS mean_stopword_ratio
FROM q GROUP BY lang
"""


def centroid_outliers_sql(z_threshold: float = 2.0) -> str:
    """Centroid outliers (embeddings.centroid_outliers): per-member sims
    rounded to the shared 1e-6 grid FIRST, then the explicit two-moment
    population μ/σ and the z ≤ −threshold filter (σ=0 labels drop via
    NULL division, matching the engine guard)."""
    return f"""
WITH ex AS MATERIALIZED (
  SELECT label, unnest(embedding) AS x, unnest(range(len(embedding))) AS i
  FROM embeddings),
pern AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
dims AS (SELECT label, i, sum(CAST(x AS DOUBLE)) AS sx
         FROM ex GROUP BY label, i),
cent AS (SELECT d.label, list(sx / p.n ORDER BY i) AS c
         FROM dims d JOIN pern p USING (label) GROUP BY d.label),
sims AS MATERIALIZED (
  SELECT e.label, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      cent.c), 6) AS s
  FROM embeddings e JOIN cent ON cent.label = e.label),
st AS (
  SELECT label, CAST(sum(s) AS DOUBLE) / count(*) AS mu,
         sqrt(sum(s * s) / count(*)
              - (CAST(sum(s) AS DOUBLE) / count(*))
                * (CAST(sum(s) AS DOUBLE) / count(*))) AS sd
  FROM sims GROUP BY label)
SELECT CAST(s.label AS BIGINT) AS label, s.vec_id, s.s AS sim,
       round((s.s - t.mu) / t.sd, 6) AS z
FROM sims s JOIN st t USING (label)
WHERE (s.s - t.mu) / t.sd <= -{z_threshold!r}
"""


def pagerank_top_nodes_sql(p: str, k: int = 20) -> str:
    """Top-k PageRank vertices with node metadata: the pagerank_sql and
    nodes_sql results joined, ordered (rounded rank desc, v asc)."""
    return f"""
SELECT r.v, n.kind, n.key, r.rank
FROM ({pagerank_sql(p)}) r
JOIN ({nodes_sql(p)}) n ON n.node_id = r.v
ORDER BY r.rank DESC, r.v ASC
LIMIT {k}
"""


def props_rollup_sql() -> str:
    """JSON props rollup (events.props_rollup): json_extract of the k
    field, integer-exact per-type sufficient stats."""
    return """
WITH p AS MATERIALIZED (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM p WHERE k IS NOT NULL
GROUP BY event_type
"""


def forecast_revenue_sql(
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo_c: int = 3,
    disc_hi_c: int = 5,
    max_qty: float = 24.0,
) -> str:
    """TPC-H Q6 shape (relational.forecast_revenue): revenue folded as
    exact cents·centi-discount units, one closing division."""
    return f"""
WITH li AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round(l_discount * 100, 0) AS BIGINT) AS u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_lo}'
    AND l_shipdate < TIMESTAMP '{date_hi}'
    AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN {disc_lo_c} AND {disc_hi_c}
    AND l_quantity < {max_qty}
)
SELECT CAST(coalesce(sum(u), 0) AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM li
"""


def promo_revenue_share_sql(promo_type: str = "PROMO") -> str:
    """TPC-H Q14 shape (relational.promo_revenue_share): both revenues in
    exact 1e-4 units; share = double(promo)/double(total)."""
    return f"""
WITH j AS (
  SELECT CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS u,
         (p.p_type = '{promo_type}') AS promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT CAST(sum(CASE WHEN promo THEN u ELSE 0 END) AS DOUBLE) / 10000.0
         AS promo_revenue,
       CAST(sum(u) AS DOUBLE) / 10000.0 AS total_revenue,
       CAST(sum(CASE WHEN promo THEN u ELSE 0 END) AS DOUBLE)
         / CAST(sum(u) AS DOUBLE) AS promo_share
FROM j
"""


def top_return_customers_sql(
    date_lo: str = "1996-01-01", date_hi: str = "1997-01-01", k: int = 20
) -> str:
    """TPC-H Q10 shape (relational.top_return_customers): exact-unit
    revenue, ties broken (u desc, custkey asc)."""
    return f"""
WITH rev AS (
  SELECT o.o_custkey AS c_custkey,
         sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS u
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{date_lo}'
    AND o.o_orderdate < TIMESTAMP '{date_hi}'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       CAST(rev.u AS DOUBLE) / 10000.0 AS revenue
FROM rev
JOIN customer c ON c.c_custkey = rev.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY rev.u DESC, c.c_custkey ASC
LIMIT {k}
"""


def order_count_distribution_sql() -> str:
    """TPC-H Q13 shape (relational.order_count_distribution): zero-order
    customers included via the left join's null branch."""
    return """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
"""


def large_orders_sql(qty_threshold: float = 250.0, k: int = 20) -> str:
    """TPC-H Q18 shape (relational.large_orders): HAVING as sum+filter,
    sort on exact totalprice cents."""
    return f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity, 0) AS BIGINT)) > {qty_threshold}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, big.sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY CAST(round(o.o_totalprice * 100, 0) AS BIGINT) DESC,
         o.o_orderkey ASC
LIMIT {k}
"""


def discounted_revenue_sql(specs: tuple | None = None) -> str:
    """TPC-H Q19 shape (relational.discounted_revenue): the OR-of-ANDs
    disjuncts rendered literally; revenue in exact 1e-4 units."""
    if specs is None:
        specs = (
            ("Brand#12", 1.0, 30.0, 1, 25),
            ("Brand#23", 5.0, 35.0, 1, 35),
            ("Brand#34", 10.0, 40.0, 1, 45),
        )
    ors = " OR ".join(
        f"(p.p_brand = '{b}' AND l.l_quantity BETWEEN {qlo} AND {qhi}"
        f" AND p.p_size BETWEEN {slo} AND {shi})"
        for b, qlo, qhi, slo, shi in specs
    )
    return f"""
WITH j AS (
  SELECT CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS u
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE {ors}
)
SELECT CAST(coalesce(sum(u), 0) AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM j
"""


def local_supplier_revenue_sql(
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> str:
    """TPC-H Q5 shape (relational.local_supplier_revenue): same-nation
    customer/supplier revenue per nation of one region; exact 1e-4 units."""
    return f"""
WITH j AS (
  SELECT n.n_name,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS u
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{region}'
    AND s.s_nationkey = c.c_nationkey
    AND o.o_orderdate >= TIMESTAMP '{date_lo}'
    AND o.o_orderdate < TIMESTAMP '{date_hi}'
)
SELECT n_name,
       CAST(sum(u) AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM j GROUP BY n_name
"""


def market_share_sql(
    nation: str = "NATION_2",
    region: str = "ASIA",
    p_type: str = "ECONOMY",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> str:
    """TPC-H Q8 shape (relational.market_share): per-year fraction of one
    region's part-type revenue supplied by one nation; both folds in
    exact 1e-4 units, share = one double division."""
    return f"""
WITH j AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS u,
         (ns.n_name = '{nation}') AS is_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  WHERE r.r_name = '{region}'
    AND p.p_type = '{p_type}'
    AND o.o_orderdate >= TIMESTAMP '{date_lo}'
    AND o.o_orderdate < TIMESTAMP '{date_hi}'
)
SELECT o_year,
       CAST(sum(CASE WHEN is_nation THEN u ELSE 0 END) AS DOUBLE) / 10000.0
         AS nation_revenue,
       CAST(sum(u) AS DOUBLE) / 10000.0 AS total_revenue,
       CAST(sum(CASE WHEN is_nation THEN u ELSE 0 END) AS DOUBLE)
         / CAST(sum(u) AS DOUBLE) AS mkt_share
FROM j GROUP BY o_year
"""


def volume_shipping_sql(
    nation_a: str = "NATION_12",
    nation_b: str = "NATION_13",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> str:
    """TPC-H Q7 shape (relational.volume_shipping): cross-nation shipped
    revenue per (supp_nation, cust_nation, ship year); exact 1e-4 units."""
    return f"""
WITH j AS (
  SELECT ns.n_name AS supp_nation,
         nc.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS u
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  WHERE ((ns.n_name = '{nation_a}' AND nc.n_name = '{nation_b}')
      OR (ns.n_name = '{nation_b}' AND nc.n_name = '{nation_a}'))
    AND l.l_shipdate >= TIMESTAMP '{date_lo}'
    AND l.l_shipdate < TIMESTAMP '{date_hi}'
)
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(u) AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM j GROUP BY supp_nation, cust_nation, l_year
"""


def top_supplier_sql(
    date_lo: str = "1996-01-01", date_hi: str = "1996-04-01"
) -> str:
    """TPC-H Q15 shape (relational.top_supplier): supplier(s) at the max
    quarterly discounted revenue; exact 1e-4 units."""
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_lo}'
    AND l_shipdate < TIMESTAMP '{date_hi}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(rev.u AS DOUBLE) / 10000.0 AS total_revenue
FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.u = (SELECT max(u) FROM rev)
ORDER BY s.s_suppkey
"""


def small_quantity_revenue_sql(
    brand: str = "Brand#13", ratio_num: int = 1, ratio_den: int = 5
) -> str:
    """TPC-H Q17 shape (relational.small_quantity_revenue): below-average
    quantity revenue / 7 for one brand; the average test is the exact
    integer cross-multiply qc·den·cnt < num·Σqc, mirrored from the engine."""
    return f"""
WITH li AS (
  SELECT l.l_partkey,
         CAST(round(l.l_quantity * 100, 0) AS BIGINT) AS qc,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = '{brand}'
),
avgq AS (
  SELECT l_partkey, sum(qc) AS sq, CAST(count(*) AS BIGINT) AS cnt
  FROM li GROUP BY l_partkey
)
SELECT round(CAST(coalesce(sum(li.cents), 0) AS DOUBLE) / 100.0 / 7.0, 6)
         AS avg_yearly,
       CAST(count(li.cents) AS BIGINT) AS n_items
FROM li JOIN avgq a ON a.l_partkey = li.l_partkey
WHERE li.qc * {ratio_den} * a.cnt < {ratio_num} * a.sq
"""


def supplier_part_counts_sql(
    exclude_brand: str = "Brand#1",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
) -> str:
    """TPC-H Q16 shape (relational.supplier_part_counts): distinct
    suppliers per (brand, type, size) via the lineitem bridge."""
    szs = ", ".join(str(int(s)) for s in sizes)
    return f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{exclude_brand}' AND p.p_size IN ({szs})
GROUP BY p.p_brand, p.p_type, p.p_size
"""


def sales_opportunity_sql(since: str = "1999-01-01") -> str:
    """TPC-H Q22 shape (relational.sales_opportunity): above-average
    positive-balance customers with no order since ``since``, per market
    segment (the schema carries no phone column); the average test is the
    exact integer cross-multiply cents·cnt > Σcents."""
    return f"""
WITH bal AS (
  SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) > 0
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(CAST(round(c.c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_acctbal
FROM customer c, bal
WHERE CAST(round(c.c_acctbal * 100, 0) AS BIGINT) * bal.n > bal.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '{since}')
GROUP BY c.c_mktsegment
"""


def ivf_knn_sql(
    emb_path: str,
    query_ids: tuple = (0, 1, 2),
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 3,
    iters: int = 10,
    seed: int = 3,
) -> str:
    """IVF-flat ANN search (embeddings.knn_ivf): reuse the unrolled Lloyd's
    CTEs of ``kmeans_cells_sql`` verbatim for the coarse quantizer, assign
    every corpus vector to its cell, pick each query's ``nprobe`` nearest
    cells (sim DESC, cell ASC — the engine's stable-argsort tie-break),
    and take the within-probed-cells cosine top-k (sim DESC, vec_id ASC).
    Approximate ANN with an EXACT oracle: both sides compute the identical
    deterministic quantization, so the row set matches bit-for-bit."""
    base = kmeans_cells_sql(emb_path, n_clusters, iters, seed)
    marker = "SELECT vec_id, CAST(cpos AS BIGINT) AS cell FROM ("
    ctes = base[: base.index(marker)]
    ids = ", ".join(str(i) for i in query_ids)
    return (
        ctes
        + f""", cells AS MATERIALIZED (
  SELECT vec_id, cpos AS cell FROM (
    SELECT vec_id, cpos,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cpos ASC) AS rn
    FROM sims) WHERE rn = 1),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN ({ids})),
qel AS MATERIALIZED (
  SELECT query_id, generate_subscripts(qe, 1) AS i, unnest(qe) AS x FROM q),
qnrm AS MATERIALIZED (
  SELECT query_id,
         CASE WHEN sqrt(sum(x * x)) > 0 THEN sqrt(sum(x * x)) ELSE 1 END AS nrm
  FROM qel GROUP BY query_id),
qsims AS MATERIALIZED (
  SELECT qel.query_id, cn.cpos, sum((qel.x / qnrm.nrm) * cn.v) AS s
  FROM qel JOIN qnrm USING (query_id) JOIN cn USING (i)
  GROUP BY qel.query_id, cn.cpos),
probe AS MATERIALIZED (
  SELECT query_id, cpos AS cell FROM (
    SELECT query_id, cpos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, cpos ASC) AS rn
    FROM qsims) WHERE rn <= {nprobe}),
csims AS MATERIALIZED (
  SELECT p.query_id, c.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS s
  FROM probe p
  JOIN cells c ON c.cell = p.cell
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q ON q.query_id = p.query_id)
SELECT query_id, vec_id, round(s, 6) AS sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY s DESC, vec_id ASC) AS rn
      FROM csims)
WHERE rn <= {k}
"""
    )


def rich_club_sql(p: str, thresholds: tuple = (2, 4, 8, 16)) -> str:
    """Rich-club coefficient per degree threshold (degrees.rich_club):
    simple undirected degrees from the deduped oriented edge set."""
    vals = ", ".join(f"({int(k)})" for k in sorted(thresholds))
    return (
        prelude(p)
        + f""", degt AS MATERIALIZED (
  SELECT v, count(*) AS deg
  FROM (SELECT a AS v FROM ori UNION ALL SELECT b FROM ori)
  GROUP BY v),
ks(k) AS (VALUES {vals}),
stats AS (
  SELECT ks.k,
         (SELECT CAST(count(*) AS BIGINT) FROM degt WHERE deg > ks.k)
           AS n_nodes,
         (SELECT CAST(count(*) AS BIGINT)
          FROM ori e JOIN degt da ON da.v = e.a JOIN degt db ON db.v = e.b
          WHERE da.deg > ks.k AND db.deg > ks.k) AS n_edges
  FROM ks)
SELECT k, n_nodes, n_edges,
       round(CASE WHEN n_nodes > 1
                  THEN 2.0 * n_edges / (CAST(n_nodes AS DOUBLE) * (n_nodes - 1))
                  ELSE 0.0 END, 9) AS phi
FROM stats
"""
    )


def bfs_closeness_sql(p: str, sources: tuple = (0, 1, 2, 3)) -> str:
    """Closeness centrality of the BFS seeds (n_reached / Σdist over
    reached vertices) — closes over the bfs_multi_sql union."""
    return f"""
SELECT source,
       round(CAST(count(*) AS DOUBLE) / sum(dist), 9) AS closeness,
       CAST(sum(dist) AS BIGINT) AS total_dist,
       CAST(count(*) AS BIGINT) AS n_reached
FROM ({bfs_multi_sql(p, sources)})
WHERE dist > 0 GROUP BY source
"""


def zipf_slope_sql(top_n: int = 200) -> str:
    """Zipf OLS fit (corpus.zipf_slope): ln(count) ~ ln(rank) over the
    top-N tokens; the covar/var ratio written out explicitly so both sides
    compute the identical formula."""
    return f"""
WITH {_TOKS_CTE},
tok AS (SELECT unnest(ws) AS token FROM toks),
topk AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY token
  ORDER BY n DESC, token ASC
  LIMIT {top_n}),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS DOUBLE))
           AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM topk),
m AS (SELECT avg(x) AS mx, avg(y) AS my, count(*) AS nn FROM ranked),
s AS (
  SELECT sum((r.x - m.mx) * (r.y - m.my))
           / sum((r.x - m.mx) * (r.x - m.mx)) AS sl,
         any_value(m.my) AS my, any_value(m.mx) AS mx,
         any_value(m.nn) AS nn
  FROM ranked r, m)
SELECT round(sl, 6) AS slope,
       round(my - sl * mx, 6) AS intercept,
       CAST(nn AS BIGINT) AS n_ranks
FROM s
"""


def pq_codes_sql(
    emb_path: str,
    m: int = 2,
    n_clusters: int = 8,
    iters: int = 10,
    seed: int = 3,
    tol: float = 1e-6,
) -> str:
    """Product-quantization codes (embeddings.pq_codes): one unrolled
    Lloyd's chain PER SUBSPACE over the subspace's coordinate slice (same
    sticky-converged pattern as ``kmeans_cells_sql``), closed by the
    euclidean rn=1 assignment; subspace code tables UNION ALL'd. As with
    kmeans_cells, only the seed-derived init row ids come from the
    engine's formulation — every distance/mean/assignment is DuckDB's own
    arithmetic, so (vec_id, sub, code) compares integer-exact."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    first = tbl["vec_id"].to_numpy()
    d = len(tbl["embedding"][0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    pool = first[: max(n_clusters * 8, 64)]

    parts = [
        """
WITH emb AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
el AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(e, 1) AS i, unnest(e) AS x FROM emb
)"""
    ]
    finals = []
    for s in range(m):
        rng = np.random.default_rng(seed + s)
        init_ids = pool[rng.choice(len(pool), size=n_clusters, replace=False)]
        init_vals = ", ".join(
            f"({cpos}, {int(vid)})" for cpos, vid in enumerate(init_ids)
        )
        lo, hi = s * sub + 1, (s + 1) * sub  # 1-based inclusive range
        P = f"p{s}_"
        parts.append(
            f""", {P}el AS MATERIALIZED (
  SELECT vec_id, i, x FROM el WHERE i BETWEEN {lo} AND {hi}),
{P}initmap(cpos, vid) AS (VALUES {init_vals}),
{P}c0 AS MATERIALIZED (
  SELECT mm.cpos, e2.i, e2.x AS v
  FROM {P}initmap mm JOIN {P}el e2 ON e2.vec_id = mm.vid),
{P}s0 AS MATERIALIZED (SELECT FALSE AS stopped)"""
        )
        for t in range(1, iters + 1):
            p, c = t - 1, t
            parts.append(
                f""", {P}d{c} AS MATERIALIZED (
  SELECT e2.vec_id, cc.cpos, sum((e2.x - cc.v) * (e2.x - cc.v)) AS d2
  FROM {P}el e2 JOIN {P}c{p} cc USING (i) GROUP BY e2.vec_id, cc.cpos),
{P}a{c} AS MATERIALIZED (
  SELECT vec_id, cpos FROM (
    SELECT vec_id, cpos,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, cpos ASC) AS rn
    FROM {P}d{c}) WHERE rn = 1),
{P}n{c} AS MATERIALIZED (
  SELECT cc.cpos, cc.i, coalesce(mm.v, cc.v) AS v
  FROM {P}c{p} cc LEFT JOIN (
    SELECT a.cpos, e2.i, avg(e2.x) AS v
    FROM {P}a{c} a JOIN {P}el e2 USING (vec_id) GROUP BY a.cpos, e2.i
  ) mm ON mm.cpos = cc.cpos AND mm.i = cc.i),
{P}s{c} AS MATERIALIZED (
  SELECT (SELECT stopped FROM {P}s{p}) OR
         (SELECT max(abs(n.v - o.v)) FROM {P}n{c} n
          JOIN {P}c{p} o ON o.cpos = n.cpos AND o.i = n.i) < {tol} AS stopped),
{P}c{c} AS MATERIALIZED (
  SELECT o.cpos, o.i,
         CASE WHEN (SELECT stopped FROM {P}s{p}) THEN o.v ELSE n.v END AS v
  FROM {P}c{p} o JOIN {P}n{c} n ON n.cpos = o.cpos AND n.i = o.i)"""
            )
        parts.append(
            f""", {P}fd AS MATERIALIZED (
  SELECT e2.vec_id, cc.cpos, sum((e2.x - cc.v) * (e2.x - cc.v)) AS d2
  FROM {P}el e2 JOIN {P}c{iters} cc USING (i) GROUP BY e2.vec_id, cc.cpos),
{P}fin AS MATERIALIZED (
  SELECT vec_id, CAST({s} AS BIGINT) AS sub, CAST(cpos AS BIGINT) AS code
  FROM (
    SELECT vec_id, cpos,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, cpos ASC) AS rn
    FROM {P}fd) WHERE rn = 1)"""
        )
        finals.append(f"SELECT vec_id, sub, code FROM {P}fin")
    parts.append("\n" + "\nUNION ALL\n".join(finals))
    return "".join(parts)


def containment_sql(threshold: float = 0.8, k: int = 3) -> str:
    """Overlap-coefficient pairs (textops.containment_pairs): the
    ngram_jaccard formulation with least(|A|, |B|) as the denominator."""
    return f"""
WITH {_TOKS_CTE},
sh_lists AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM toks
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh_lists)
),
sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / least(na.n, nb.n), 6) AS containment
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / least(na.n, nb.n) >= {threshold}
"""


def dup_shingle_stats_sql(k: int = 3) -> str:
    """Corpus-wide duplicated-shingle fraction per doc
    (textops.dup_shingle_stats): a shingle is duplicated iff it occurs in
    ≥ 2 distinct documents. The engine counts 64-bit md5 shingle hashes,
    the oracle counts the shingle strings — hash-independent set
    identity, same methodology as ngram_jaccard_sql."""
    return f"""
WITH {_TOKS_CTE},
sh_lists AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM toks
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh_lists)
),
dfc AS MATERIALIZED (
  SELECT s, count(*) AS ndocs FROM sh GROUP BY s
)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN dfc.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup,
       round(CAST(sum(CASE WHEN dfc.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_frac
FROM sh JOIN dfc ON dfc.s = sh.s
GROUP BY sh.doc_id
"""


def split_leakage_sql(threshold: float = 0.4, val_rate: float = 0.2) -> str:
    """Train/val leakage pairs (corpus.split_leakage): the full MinHash
    pipeline SQL filtered to pairs straddling the md5-prefix hash split."""
    W = float(1 << 64)
    h = (
        "CAST(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 16))::UBIGINT"
        " AS DOUBLE)"
    )
    return f"""
SELECT doc_a, doc_b, jaccard FROM ({minhash_lsh_sql(threshold)})
WHERE ({h.format(c='doc_a')} < {val_rate * W!r})
   <> ({h.format(c='doc_b')} < {val_rate * W!r})
"""


def min_cost_supplier_sql(
    p_type: str = "ECONOMY", max_size: int = 15
) -> str:
    """TPC-H Q2 shape (relational.min_cost_supplier): best supplier per
    name-filtered part — the correlated argmax mirrored as the engine's
    exact combined key ``cents·2^24 − suppkey``."""
    return f"""
WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT supply.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal,
         s.s_nationkey,
         CAST(round(s.s_acctbal*100, 0) AS BIGINT)*16777216 - s.s_suppkey
           AS ck
  FROM supply JOIN supplier s ON s.s_suppkey = supply.l_suppkey
),
best AS (SELECT l_partkey, max(ck) AS best_ck FROM cand GROUP BY l_partkey)
SELECT CAST(c.l_partkey AS BIGINT) AS p_partkey, p.p_brand, p.p_type,
       c.s_name, c.s_acctbal, n.n_name
FROM cand c
JOIN best b ON b.l_partkey = c.l_partkey AND c.ck = b.best_ck
JOIN part p ON p.p_partkey = c.l_partkey
JOIN nation n ON n.n_nationkey = c.s_nationkey
WHERE p.p_type = '{p_type}' AND p.p_size <= {int(max_size)}
"""


def product_type_profit_sql(name_substr: str = "widget") -> str:
    """TPC-H Q9 shape (relational.product_type_profit): revenue per
    (supplier nation, order year) for name-filtered parts, folded in
    exact 1e-4 units."""
    return f"""
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice*100, 0) AS BIGINT)
            * (100 - CAST(round(l.l_discount*100, 0) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%{name_substr}%'
GROUP BY n.n_name, o_year
"""


def important_parts_sql(num: int = 5, den: int = 4) -> str:
    """TPC-H Q11 shape (relational.important_parts): parts above
    ``num/den`` of the mean per-part value — the HAVING-vs-global-scalar
    test as the exact integer cross-multiply."""
    return f"""
WITH pv AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount*100, 0) AS BIGINT))) AS u
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(u) AS t, count(*) AS np FROM pv)
SELECT CAST(pv.l_partkey AS BIGINT) AS l_partkey,
       CAST(pv.u AS DOUBLE) / 10000.0 AS value
FROM pv, tot WHERE pv.u * {int(den)} * tot.np > {int(num)} * tot.t
"""


def late_shipment_counts_sql(late_days: int = 90) -> str:
    """TPC-H Q12 shape (relational.late_shipment_counts): critical vs
    non-critical order priorities among late-shipped lineitems, per
    returnflag."""
    return f"""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE epoch_us(l.l_shipdate)
      > epoch_us(o.o_orderdate) + {int(late_days)} * 86400000000
GROUP BY l.l_returnflag
"""


def part_promotion_suppliers_sql(
    name_substr: str = "bolt", num: int = 1, den: int = 5
) -> str:
    """TPC-H Q20 shape (relational.part_promotion_suppliers): suppliers
    shipping more than ``num/den`` of some name-filtered part's total
    quantity."""
    return f"""
WITH pq AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(CAST(round(l.l_quantity*100, 0) AS BIGINT)) AS qc
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%{name_substr}%'
  GROUP BY l.l_partkey, l.l_suppkey
),
tot AS (SELECT l_partkey, sum(qc) AS tq FROM pq GROUP BY l_partkey)
SELECT DISTINCT CAST(pq.l_suppkey AS BIGINT) AS s_suppkey, s.s_name
FROM pq
JOIN tot ON tot.l_partkey = pq.l_partkey
JOIN supplier s ON s.s_suppkey = pq.l_suppkey
WHERE pq.qc * {int(den)} > {int(num)} * tot.tq
"""


def waiting_suppliers_sql(late_days: int = 60) -> str:
    """TPC-H Q21 shape (relational.waiting_suppliers): per supplier, the
    finalized multi-supplier orders where only that supplier shipped
    late — the EXISTS / NOT-EXISTS pair as per-order distinct counts."""
    return f"""
WITH pairs AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN epoch_us(l.l_shipdate)
                  > epoch_us(o.o_orderdate) + {int(late_days)} * 86400000000
             THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
         sum(late) AS n_late
  FROM pairs GROUP BY l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM pairs p
JOIN per_order po ON po.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.late = 1 AND po.n_supp > 1 AND po.n_late = 1
GROUP BY s.s_name
"""


def segment_dedup_sql(seg_words: int = 10, seg_cap_bits: int = 20) -> str:
    """Segment-level exact dedup (``textops.segment_dedup``): fixed
    ``seg_words``-token windows, first occurrence by min combined key,
    survivors reassembled per doc in order. Tokenization matches the
    engine's ``str.split()`` via ``string_split_regex(trim, '\\s+')``."""
    cap = 1 << seg_cap_bits
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) - 1 AS ord
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents WHERE trim(text) <> '')
),
segs AS (
  SELECT doc_id, CAST(ord // {int(seg_words)} AS BIGINT) AS seg_idx,
         string_agg(tok, ' ' ORDER BY ord) AS seg
  FROM toks GROUP BY doc_id, CAST(ord // {int(seg_words)} AS BIGINT)
),
firsts AS (
  SELECT min(doc_id * {cap} + seg_idx) AS combined FROM segs GROUP BY seg
),
kept AS (
  SELECT s.doc_id, s.seg_idx, s.seg
  FROM segs s JOIN firsts f ON s.doc_id * {cap} + s.seg_idx = f.combined
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total FROM segs
        GROUP BY doc_id)
SELECT k.doc_id, string_agg(k.seg, ' ' ORDER BY k.seg_idx) AS text_dedup,
       CAST(count(*) AS BIGINT) AS n_kept, any_value(t.n_total) AS n_total
FROM kept k JOIN tot t ON t.doc_id = k.doc_id
GROUP BY k.doc_id
"""


def stratified_sample_sql(
    emb_path: str,
    n_clusters: int = 8,
    per_cell: int = 10,
    iters: int = 10,
    seed: int = 3,
) -> str:
    """Deterministic IVF-cell-stratified sample
    (``embeddings.stratified_cell_sample``): the full unrolled-Lloyd's
    quantizer from ``kmeans_cells_sql`` as a subquery, then md5-ranked
    top-``per_cell`` per cell — DuckDB's own ``md5(CAST(vec_id AS
    VARCHAR))`` reproduces the engine's ranking key exactly."""
    inner = kmeans_cells_sql(
        emb_path, n_clusters=n_clusters, iters=iters, seed=seed
    )
    return f"""
SELECT vec_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (
           PARTITION BY cell
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM ({inner}) q
) WHERE rn <= {int(per_cell)}
"""


def source_overlap_sql(k: int = 3) -> str:
    """Cross-source shingle overlap (``textops.source_overlap``): distinct
    word-k-gram shingles shared per source pair + Jaccard. The engine
    counts 64-bit md5 shingle hashes, the oracle counts the shingle
    strings — hash-independent set identity, same methodology as
    ``ngram_jaccard_sql``."""
    return f"""
WITH {_TOKS_CTE},
sh_lists AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(ws) >= {k} THEN
                list_transform(range(1, len(ws) - {k - 2}),
                               i -> array_to_string(ws[i:i+{k - 1}], ' '))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS shingles
  FROM toks
),
sh AS MATERIALIZED (
  SELECT DISTINCT d.source, u.s
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh_lists) u
  JOIN documents d USING (doc_id)
),
sizes AS MATERIALIZED (SELECT source, count(*) AS n FROM sh GROUP BY source),
inter AS MATERIALIZED (
  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS shared
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.shared,
       CAST(i.shared AS DOUBLE) / (na.n + nb.n - i.shared) AS jaccard
FROM inter i
JOIN sizes na ON na.source = i.src_a
JOIN sizes nb ON nb.source = i.src_b
"""


def heavy_hitters_sql(col: str = "user_id", k: int = 200) -> str:
    """Exact φ-heavy hitters (``events.heavy_hitters``): frequency
    strictly above N/k — the two-pass candidate scheme's result equals
    the plain HAVING, which is the oracle."""
    return f"""
SELECT {col}, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY {col}
HAVING count(*) * {int(k)} > (SELECT count(*) FROM events)
"""


def oov_rate_sql(vocab_size: int = 20) -> str:
    """Per-source OOV share vs the top-``vocab_size`` corpus vocabulary
    (``corpus.oov_rate``): same tokenization, same count-desc/token-asc
    boundary tie-break, integer-exact folds, one closing division."""
    return f"""
WITH {_TOKS_CTE},
tok AS MATERIALIZED (
  SELECT d.source, u.tok
  FROM (SELECT doc_id, unnest(ws) AS tok FROM toks) u
  JOIN documents d USING (doc_id)
),
vocab AS MATERIALIZED (
  SELECT tok AS token FROM (
    SELECT tok, count(*) AS n FROM tok GROUP BY tok
    ORDER BY n DESC, tok ASC LIMIT {int(vocab_size)})
),
per_src AS (
  SELECT t.source,
         CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS oov_tokens,
         CAST(count(*) AS BIGINT) AS total_tokens
  FROM tok t LEFT JOIN vocab v ON v.token = t.tok
  GROUP BY t.source
),
nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
       GROUP BY source)
SELECT nd.source, nd.n_docs,
       coalesce(p.oov_tokens, 0) AS oov_tokens,
       coalesce(p.total_tokens, 0) AS total_tokens,
       CAST(coalesce(p.oov_tokens, 0) AS DOUBLE)
         / greatest(coalesce(p.total_tokens, 0), 1) AS oov_share
FROM nd LEFT JOIN per_src p ON p.source = nd.source
"""


def spectral_scores_sql(
    p: str, iters: int = 20, decimals: int = 6
) -> str:
    """Second eigen-direction of Â = D^-1/2 A D^-1/2
    (``pipelines/spectral.py``): the engine's exact fixed-step deflated
    power iteration unrolled — parity start minus its √d-component, per
    step one Â-apply (edge join + sum) and one s-projection, final
    max-|x| scale + round. No eigensolver on either side."""
    parts = [prelude(p)]
    parts.append(
        """, udeg AS MATERIALIZED (
  SELECT src AS v, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY src),
snrm AS (SELECT sqrt(sum(d)) AS z FROM udeg),
svec AS MATERIALIZED (
  SELECT v, sqrt(d) / (SELECT z FROM snrm) AS s, 1.0 / sqrt(d) AS isd
  FROM udeg),
pvec AS MATERIALIZED (
  SELECT verts.v,
         CASE WHEN verts.v % 2 = 0 THEN 1.0 ELSE -1.0 END AS x
  FROM verts),
c0 AS (SELECT sum(p.x * s.s) AS c FROM pvec p JOIN svec s USING (v)),
x0 AS MATERIALIZED (
  SELECT p.v, p.x - (SELECT c FROM c0) * coalesce(s.s, 0.0) AS x
  FROM pvec p LEFT JOIN svec s USING (v))
"""
    )
    for t in range(1, iters + 1):
        prev = t - 1
        parts.append(
            f""", y{t} AS MATERIALIZED (
  SELECT u.dst AS v, sum(x.x * sa.isd * sb.isd) AS y
  FROM und u
  JOIN x{prev} x ON u.src = x.v
  JOIN svec sa ON sa.v = u.src
  JOIN svec sb ON sb.v = u.dst
  GROUP BY u.dst),
c{t} AS (SELECT sum(y.y * s.s) AS c FROM y{t} y JOIN svec s ON s.v = y.v),
x{t} AS MATERIALIZED (
  SELECT verts.v,
         coalesce(y.y, 0.0) - (SELECT c FROM c{t}) * coalesce(s.s, 0.0) AS x
  FROM verts
  LEFT JOIN y{t} y ON y.v = verts.v
  LEFT JOIN svec s ON s.v = verts.v)
"""
        )
    parts.append(
        f""", mx AS (SELECT max(abs(x)) AS m FROM x{iters})
SELECT x.v, round(x.x / (CASE WHEN mx.m > 0 THEN mx.m ELSE 1.0 END),
                  {decimals}) AS score
FROM x{iters} x, mx
"""
    )
    return "".join(parts)


def ivf_recall_sql(
    emb_path: str,
    query_ids: tuple = (0, 1, 2),
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 3,
) -> str:
    """Per-query recall@k of IVF vs brute force
    (``embeddings.ivf_recall``): both existing oracles as subqueries,
    joined on (query_id, vec_id)."""
    exact = knn_sql(query_ids=query_ids, k=k)
    approx = ivf_knn_sql(
        emb_path, query_ids=query_ids, k=k,
        n_clusters=n_clusters, nprobe=nprobe,
    )
    return f"""
WITH exact_knn AS MATERIALIZED ({exact}),
approx_knn AS MATERIALIZED ({approx}),
hits AS (
  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM exact_knn e JOIN approx_knn a
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
  GROUP BY e.query_id
)
SELECT q.query_id, coalesce(h.n_hits, 0) AS n_hits,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / {int(k)} AS recall
FROM (SELECT DISTINCT query_id FROM exact_knn) q
LEFT JOIN hits h ON h.query_id = q.query_id
"""


def coloring_sql(p: str, rounds: int = 40) -> str:
    """Greedy coloring by iterated priority-maxima peeling
    (``pipelines/coloring.py``): each unrolled round colors the uncolored
    vertices beating every uncolored neighbor's priority with the round
    index; −1 marks vertices uncolored within ``rounds`` (never at the
    asserted margin). Priority shared with the MIS oracle."""
    parts = [prelude(p)]
    parts.append(
        """, pri AS MATERIALIZED (
  SELECT v, CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 16))::UBIGINT >> 11 AS BIGINT) AS h
  FROM verts),
k0 AS MATERIALIZED (SELECT v, CAST(-1 AS BIGINT) AS color FROM verts)
"""
    )
    for i in range(1, rounds + 1):
        prev = f"k{i - 1}"
        parts.append(
            f""", mx{i} AS (
  SELECT u.dst AS v, max(ph.h) AS mh
  FROM und u
  JOIN {prev} a ON u.src = a.v AND a.color < 0
  JOIN {prev} b ON u.dst = b.v AND b.color < 0
  JOIN pri ph ON ph.v = u.src
  GROUP BY u.dst),
k{i} AS MATERIALIZED (
  SELECT s.v,
         CASE WHEN s.color < 0 AND p2.h > coalesce(m.mh, -1)
              THEN CAST({i} AS BIGINT) ELSE s.color END AS color
  FROM {prev} s
  JOIN pri p2 ON p2.v = s.v
  LEFT JOIN mx{i} m ON m.v = s.v)
"""
        )
    parts.append(f"SELECT v, color FROM k{rounds}")
    return "".join(parts)


def turn_latency_sql(transcripts_path: str) -> str:
    """Reply-latency per role transition (``convs.turn_latency``): lag
    window over (conv_id, turn_idx), integer-exact µs folds, one closing
    division."""
    return f"""
WITH t AS MATERIALIZED (SELECT * FROM read_parquet('{transcripts_path}')),
seq AS (
  SELECT conv_id, role, epoch_us(ts) AS tsu,
         lag(role) OVER w AS role_from,
         lag(epoch_us(ts)) OVER w AS prev_tsu
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT role_from, role AS role_to,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(tsu - prev_tsu) AS BIGINT) AS total_gap_us,
       CAST(sum(tsu - prev_tsu) AS DOUBLE) / count(*) AS mean_gap_us
FROM seq WHERE role_from IS NOT NULL
GROUP BY role_from, role
"""


def chunk_documents_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """Overlapping RAG chunk windows (``corpus.chunk_documents``): same
    window rule (starts 0, s, 2s, …; W = 1 if n ≤ chunk else
    ⌈(n−chunk)/s⌉+1), token membership by range join on the window list."""
    s = chunk_tokens - overlap
    return f"""
WITH {_TOKS_CTE},
docn AS MATERIALIZED (
  SELECT doc_id, ws, len(ws) AS n,
         CASE WHEN len(ws) <= {chunk_tokens} THEN 1
              ELSE CAST(ceil(CAST(len(ws) - {chunk_tokens} AS DOUBLE)
                        / {s}) AS BIGINT) + 1 END AS w
  FROM toks WHERE len(ws) > 0
),
wins AS MATERIALIZED (
  SELECT doc_id, CAST(unnest(range(0, w)) AS BIGINT) AS chunk_idx
  FROM docn
),
tok AS MATERIALIZED (
  SELECT doc_id, unnest(ws) AS t, generate_subscripts(ws, 1) - 1 AS pos
  FROM docn
)
SELECT w.doc_id, w.chunk_idx,
       string_agg(tok.t, ' ' ORDER BY tok.pos) AS chunk_text,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM wins w JOIN tok
  ON tok.doc_id = w.doc_id
 AND tok.pos >= w.chunk_idx * {s}
 AND tok.pos < w.chunk_idx * {s} + {chunk_tokens}
GROUP BY w.doc_id, w.chunk_idx
"""


def tool_pair_weights_sql(transcripts_path: str) -> str:
    """Weighted tool co-occurrence (``convs.tool_pair_weights``)."""
    return f"""
WITH t AS MATERIALIZED (SELECT * FROM read_parquet('{transcripts_path}')),
ct AS MATERIALIZED (
  SELECT DISTINCT conv_id, tool FROM t WHERE tool IS NOT NULL)
SELECT a.tool AS tool_a, b.tool AS tool_b,
       CAST(count(*) AS BIGINT) AS n_convs
FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
GROUP BY a.tool, b.tool
"""


def maintained_pricing_summary_sql(
    cutoff: str = "1998-09-02",
    delete_mod: int = 10,
    delete_rem: int = 3,
    insert_rem: int = 7,
) -> str:
    """Incrementally maintained Q1 summary
    (``relational.maintained_pricing_summary``): the oracle recomputes
    directly over (base − deletes) ∪ inserts — the maintained signed-fold
    result must equal the recompute exactly (integer folds)."""
    return f"""
WITH src AS MATERIALIZED (
  SELECT * FROM lineitem WHERE l_orderkey % {delete_mod} <> {delete_rem}
  UNION ALL
  SELECT * FROM lineitem WHERE l_orderkey % {delete_mod} = {insert_rem}
),
li AS MATERIALIZED (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity, 0) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS u
  FROM src WHERE l_shipdate <= TIMESTAMP '{cutoff}'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(q) AS BIGINT) AS sum_qty,
       CAST(sum(c) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(sum(u) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(c) AS DOUBLE) / 100.0 / count(*) AS avg_price
FROM li GROUP BY 1, 2
"""


def silhouette_sql() -> str:
    """Exact squared-euclidean silhouette
    (``embeddings.silhouette_scores``): the sufficient-statistic identity
    mean‖x−y‖² = x² − 2·x·S/n + Q/n replayed per (point, label);
    own-cluster mean excludes self via n/(n−1); round-6 grid absorbs
    summation order."""
    return """
WITH e AS MATERIALIZED (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
st AS MATERIALIZED (
  SELECT label, i, sum(x) AS s FROM e GROUP BY label, i
),
nq AS MATERIALIZED (
  SELECT label, CAST(count(DISTINCT vec_id) AS DOUBLE) AS n,
         sum(x * x) AS q
  FROM e GROUP BY label
),
x2 AS MATERIALIZED (SELECT vec_id, sum(x * x) AS x2 FROM e GROUP BY vec_id),
xs AS MATERIALIZED (
  SELECT e.vec_id, st.label, sum(e.x * st.s) AS xs
  FROM e JOIN st ON st.i = e.i
  GROUP BY e.vec_id, st.label
),
md AS MATERIALIZED (
  SELECT xs.vec_id, xs.label,
         x2.x2 - 2 * xs.xs / nq.n + (nq.q / nq.n) AS md
  FROM xs JOIN x2 ON x2.vec_id = xs.vec_id
  JOIN nq ON nq.label = xs.label
),
pt AS MATERIALIZED (SELECT DISTINCT vec_id, label FROM e),
ab AS (
  SELECT p.vec_id, p.label,
         CASE WHEN nq.n > 1
              THEN own.md * nq.n / greatest(nq.n - 1, 1) ELSE 0.0 END AS a,
         coalesce((SELECT min(o.md) FROM md o
                   WHERE o.vec_id = p.vec_id AND o.label <> p.label),
                  0.0) AS b,
         nq.n AS n_own
  FROM pt p
  JOIN md own ON own.vec_id = p.vec_id AND own.label = p.label
  JOIN nq ON nq.label = p.label
)
SELECT vec_id, label, round(a, 6) AS a, round(b, 6) AS b,
       round(CASE WHEN n_own > 1 AND greatest(a, b) > 0
                  THEN (b - a) / greatest(a, b) ELSE 0.0 END, 6) AS s
FROM ab
"""


def source_dup_rates_sql(threshold: float = 0.4) -> str:
    """Per-source near-duplication rates (``textops.source_dup_rates``):
    the full MinHash pipeline SQL as a subquery, involved docs = both
    pair sides distinct, joined back to sources."""
    return f"""
WITH pairs AS MATERIALIZED ({minhash_lsh_sql(threshold)}),
involved AS MATERIALIZED (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL SELECT doc_b FROM pairs)
),
dups AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS dup_docs
  FROM involved i JOIN documents d USING (doc_id)
  GROUP BY d.source
),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
        GROUP BY source)
SELECT t.source, t.n_docs, coalesce(du.dup_docs, 0) AS dup_docs,
       CAST(coalesce(du.dup_docs, 0) AS DOUBLE) / t.n_docs AS dup_rate
FROM tot t LEFT JOIN dups du ON du.source = t.source
"""


def spectral_cut_sql(p: str, iters: int = 20, decimals: int = 6) -> str:
    """Normalized cut of the spectral sign partition
    (``spectral.spectral_cut_quality``): the full spectral CTE chain as a
    subquery, partition by sign of the SAME rounded score, cut/volumes as
    integer folds over und."""
    inner = spectral_scores_sql(p, iters=iters, decimals=decimals)
    return f"""
WITH sc AS MATERIALIZED ({inner}),
side AS MATERIALIZED (
  SELECT v, CASE WHEN score > 0 THEN 1 ELSE 0 END AS s FROM sc),
und2 AS MATERIALIZED (
  SELECT u.src, u.dst, sa.s AS ssrc, sb.s AS sdst
  FROM ({prelude(p)} SELECT src, dst FROM und) u
  JOIN side sa ON sa.v = u.src
  JOIN side sb ON sb.v = u.dst),
agg AS (
  SELECT CAST(sum(CASE WHEN ssrc <> sdst THEN 1 ELSE 0 END) / 2 AS BIGINT)
           AS cut_edges,
         CAST(sum(CASE WHEN ssrc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS vol_a,
         CAST(sum(CASE WHEN ssrc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS vol_b
  FROM und2)
SELECT cut_edges, vol_a, vol_b,
       round(CASE WHEN vol_a > 0 AND vol_b > 0
             THEN CAST(cut_edges AS DOUBLE) / vol_a
                  + CAST(cut_edges AS DOUBLE) / vol_b
             ELSE 0.0 END, 9) AS ncut
FROM agg
"""
