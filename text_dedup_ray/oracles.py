"""DuckDB oracle-SQL builders for the driver's correctness harness.

Each function returns an ANSI-SQL string that recomputes one of the engine's
pipelines FROM FIRST PRINCIPLES over the registered parquet views — including
the near-duplicate pipelines, which are made SQL-expressible by:

- an md5-based base hash (``functions/hashing.md5_hash``: big-endian prefix
  of the md5 digest), reproducible in DuckDB 1.0 as
  ``('0x' || substr(md5(x), 1, w))::UBIGINT`` (DuckDB has no sha1);
- inlining the seeded permutation constants (MinHash (a,b) vectors, SimHash
  block masks) into the SQL text — they are deterministic functions of the
  config, generated here by the same code the pipeline uses;
- connected components via a recursive min-label-propagation CTE (closure is
  bounded because labels only propagate downward: a (node, label) row exists
  only for label <= node reachable from node).

The uint64 wraparound the numpy kernels exhibit (``h*a + b`` wraps at 2^64
before the Mersenne modulo — reference-parity behavior) is replicated with
HUGEINT arithmetic mod 2^64.
"""

from __future__ import annotations

from .functions.minhash import MinHashConfig
from .functions.simhash import SimHashConfig, create_permutations

U64 = 18446744073709551616  # 2^64

# Shared fragment: connected components over a CTE ``edges(hi, lo)`` with
# hi > lo. Defines nodes/sym/walk/cc; cc = (node, cluster_id=min label).
CC_FRAGMENT = """
nodes AS (SELECT hi AS node FROM edges UNION SELECT lo AS node FROM edges),
sym AS (SELECT hi AS a, lo AS b FROM edges UNION ALL SELECT lo AS a, hi AS b FROM edges),
walk(node, label) AS (
    SELECT node, node FROM nodes
  UNION
    SELECT s.a, w.label FROM walk w JOIN sym s ON s.b = w.node WHERE w.label < s.a
),
cc AS (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node)
"""

# Reference-tokenizer tokens of an ASCII document, as a DuckDB list:
# tokenize() splits lower(text) on \W and drops empties == all [a-z0-9_]+ runs.
TOKENS = "regexp_extract_all(lower(text), '[a-z0-9_]+')"


def _grams_cte(
    n: int,
    min_length: int,
    table: str = "documents",
    tk_name: str = "tk",
    grams_name: str = "grams",
    where: str = "",
) -> str:
    """CTE ``grams(doc_id, g)``: the reference shingle set (SURVEY M4) —
    distinct space-joined n-grams, with the two length edge cases
    (< min_length -> none; < n -> one whole-sequence gram). ``where``
    optionally filters the source rows; ``tk_name``/``grams_name`` allow two
    instances in one statement (decontamination's corpus vs benchmark)."""
    w = f" WHERE {where}" if where else ""
    return f"""
{tk_name} AS (SELECT doc_id, {TOKENS} AS ts FROM {table}{w}),
{grams_name} AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - {n - 1}),
                   j -> array_to_string(ts[j:j+{n - 1}], ' '))) AS g
    FROM {tk_name} WHERE len(ts) >= {min_length} AND len(ts) >= {n}
    UNION ALL
    SELECT doc_id, array_to_string(ts, ' ') AS g
    FROM {tk_name} WHERE len(ts) >= {min_length} AND len(ts) < {n}
  )
)"""


def lang_id_sql() -> str:
    """Stopword-voting language id (functions/textstats.detect_language):
    score = stopword hits / tokens; first language in table order wins ties;
    'und' when nothing scores > 0."""
    from .functions.textstats import STOPWORDS

    rows = []
    for pri, (lang, words) in enumerate(STOPWORDS.items()):
        for w in sorted(words):
            rows.append(f"('{lang}', {pri}, '{w}')")
    values = ", ".join(rows)
    return f"""
WITH tok AS (
  SELECT doc_id, lower(unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))) AS t
  FROM documents
),
counts AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
sw(lang, pri, w) AS (VALUES {values}),
hits AS (
  SELECT tok.doc_id, sw.lang, sw.pri, count(*) AS c
  FROM tok JOIN sw ON tok.t = sw.w
  GROUP BY 1, 2, 3
),
best AS (
  SELECT h.doc_id, h.lang
  FROM hits h JOIN counts c ON h.doc_id = c.doc_id
  QUALIFY row_number() OVER (
    PARTITION BY h.doc_id ORDER BY h.c::DOUBLE / c.n DESC, h.pri ASC) = 1
)
SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
"""


def source_overlap_sql(
    ngram_size: int = 3, min_length: int = 1, group_column: str = "source"
) -> str:
    """Pairwise exact cohort shingle-set Jaccard (pipelines/overlap.
    source_overlap): distinct md5-prefix-64 shingle hashes per cohort —
    the IDENTICAL hash the op applies, so the counts agree exactly —
    then |A∩B| / (|A|+|B|-|A∩B|) per unordered pair (1.0 on empty∪empty)."""
    return f"""
WITH {_grams_cte(ngram_size, min_length)},
ss AS (
  SELECT DISTINCT d.{group_column} AS s,
         ('0x' || substr(md5(g.g), 1, 16))::UBIGINT AS h
  FROM grams g JOIN documents d USING (doc_id)
),
sizes AS (SELECT s, count(*) AS n FROM ss GROUP BY s),
inter AS (
  SELECT x.s AS sa, y.s AS sb, count(*) AS c
  FROM ss x JOIN ss y ON x.h = y.h AND x.s < y.s GROUP BY 1, 2
)
SELECT a.s AS source_a, b.s AS source_b, a.n AS n_a, b.n AS n_b,
       coalesce(i.c, 0) AS n_common,
       CASE WHEN a.n + b.n - coalesce(i.c, 0) = 0 THEN 1.0
            ELSE coalesce(i.c, 0)::DOUBLE / (a.n + b.n - coalesce(i.c, 0))
       END AS jaccard
FROM sizes a JOIN sizes b ON a.s < b.s
LEFT JOIN inter i ON i.sa = a.s AND i.sb = b.s
"""


def embedding_outliers_sql(z_threshold: float = 2.0, round_to: int = 6) -> str:
    """Centroid-distance outliers (pipelines/pca.embedding_outliers): the
    SAME moment expressions (sum/n, sumsq/n - mean^2 — never var_pop, whose
    Welford accumulation differs in ulps) and the SAME rounded-vs-rounded
    flag comparison, so the boolean can only flip ON a rounding boundary."""
    z = float(z_threshold)
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
),
el AS (
  SELECT vec_id, unnest(e) AS val, unnest(range(len(e))) AS i FROM v
),
mu AS (SELECT i, sum(val) / (SELECT count(*) FROM v) AS m FROM el GROUP BY i),
d2 AS (
  SELECT el.vec_id, sum((el.val - mu.m) * (el.val - mu.m)) AS dist2
  FROM el JOIN mu USING (i) GROUP BY el.vec_id
),
st AS (
  SELECT sum(dist2) / count(*) AS m2,
         sum(dist2 * dist2) / count(*)
           - (sum(dist2) / count(*)) * (sum(dist2) / count(*)) AS var
  FROM d2
)
SELECT d.vec_id, round(d.dist2, {round_to}) AS dist2,
       round(d.dist2, {round_to}) >
         round(st.m2 + {z} * sqrt(greatest(st.var, 0.0)), {round_to}) AS is_outlier
FROM d2 d CROSS JOIN st
"""


def naive_bayes_sql(
    label_column: str = "lang", alpha: float = 1.0, round_to: int = 6
) -> str:
    """Multinomial Naive Bayes train+score over documents (pipelines/
    nbayes): Laplace-``alpha`` smoothing, vocab-size-normalized denominator,
    prediction = argmax over ``round_to``-rounded scores with label-order
    tie-break — the identical rounded ranking the Ray op computes, so libm
    ulp noise cannot flip a prediction in one engine only."""
    a = float(alpha)
    return f"""
WITH tok AS (
  SELECT doc_id, t AS token, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
        FROM documents)
  GROUP BY doc_id, t
),
lab AS (SELECT DISTINCT {label_column} AS lang FROM documents),
nd AS (SELECT {label_column} AS lang, count(*)::BIGINT AS n FROM documents GROUP BY 1),
total AS (SELECT count(*)::BIGINT AS n FROM documents),
cnts AS (
  SELECT d.{label_column} AS lang, t.token, sum(t.tf)::BIGINT AS c
  FROM tok t JOIN documents d USING (doc_id) GROUP BY 1, 2
),
vocab AS (SELECT count(DISTINCT token)::BIGINT AS v FROM tok),
tot AS (
  SELECT l.lang, coalesce(sum(c.c), 0)::BIGINT AS tot
  FROM lab l LEFT JOIN cnts c ON c.lang = l.lang GROUP BY l.lang
),
contrib AS (
  SELECT t.doc_id, l.lang,
         sum(t.tf * ln((coalesce(c.c, 0) + {a}) / (tt.tot + {a} * v.v))) AS s
  FROM tok t
  CROSS JOIN lab l
  LEFT JOIN cnts c ON c.lang = l.lang AND c.token = t.token
  JOIN tot tt ON tt.lang = l.lang
  CROSS JOIN vocab v
  GROUP BY 1, 2
),
spine AS (SELECT d.doc_id, l.lang FROM documents d CROSS JOIN lab l),
sc AS (
  SELECT sp.doc_id, sp.lang,
         round(ln(nd.n::DOUBLE / total.n) + coalesce(ct.s, 0.0), {round_to}) AS score
  FROM spine sp
  JOIN nd ON nd.lang = sp.lang
  CROSS JOIN total
  LEFT JOIN contrib ct ON ct.doc_id = sp.doc_id AND ct.lang = sp.lang
)
SELECT doc_id, lang AS pred_label FROM sc
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) = 1
"""


def jaccard_dedup_sql(ngram_size: int = 2, threshold: float = 0.6) -> str:
    """Exact n-gram-Jaccard clusters (pipelines/jaccard_dedup.ngram_jaccard_dedup
    with an uncapped df): pair table >= threshold, then CC; output is the
    cluster map (members of any edge, incl. roots -> themselves)."""
    return f"""
WITH RECURSIVE {_grams_cte(ngram_size, 0)},
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS co
  FROM grams a JOIN grams b USING (g) WHERE a.doc_id > b.doc_id GROUP BY 1, 2
),
edges AS (
  SELECT co.i AS hi, co.j AS lo
  FROM co JOIN sizes sa ON sa.doc_id = co.i JOIN sizes sb ON sb.doc_id = co.j
  WHERE co.co::DOUBLE / (sa.sz + sb.sz - co.co) >= {threshold}
),
{CC_FRAGMENT}
SELECT node AS row_id, cluster_id FROM cc
"""


def decontaminate_sql(
    ngram_size: int,
    min_length: int,
    threshold: float,
    mod: int = 97,
    mode: str = "fraction",
) -> str:
    """Benchmark-decontamination stats (pipelines/decontaminate.decontaminate):
    corpus = documents with doc_id % mod <> 0, benchmark = the rest; one row
    per corpus doc with its distinct-shingle count, how many of those
    shingles appear anywhere in the benchmark, and the contamination flag."""
    corpus = _grams_cte(
        ngram_size, min_length, tk_name="ctk", grams_name="cgrams",
        where=f"doc_id % {mod} <> 0",
    )
    bench = _grams_cte(
        ngram_size, min_length, tk_name="btk", grams_name="bgrams_raw",
        where=f"doc_id % {mod} = 0",
    )
    if mode == "any":
        flag = "coalesce(h.n_hit, 0) >= 1"
    else:
        flag = (
            f"(coalesce(ng.n_grams, 0) > 0 AND "
            f"coalesce(h.n_hit, 0)::DOUBLE / ng.n_grams >= {threshold})"
        )
    return f"""
WITH {corpus},
{bench},
bgrams AS (SELECT DISTINCT g FROM bgrams_raw),
ng AS (SELECT doc_id, count(*) AS n_grams FROM cgrams GROUP BY doc_id),
h AS (
  SELECT c.doc_id, count(*) AS n_hit
  FROM cgrams c JOIN bgrams b USING (g) GROUP BY c.doc_id
)
SELECT d.doc_id,
       coalesce(ng.n_grams, 0)::BIGINT AS n_grams,
       coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       {flag} AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {mod} <> 0) d
LEFT JOIN ng USING (doc_id)
LEFT JOIN h USING (doc_id)
"""


def novelty_vs_state_sql(ngram_size: int = 2, cut_frac: float = 0.8) -> str:
    """Novelty-vs-state probe (pipelines/incremental_jaccard.
    jaccard_novelty_vs_state): state = posting index over doc_id <= cut,
    probe batch = the rest; per new doc, distinct shingles, how many appear
    anywhere in the state, and ``novelty = 1 - n_seen / n_distinct``.
    min_length=1 in the grams CTE mirrors the probe's drop-zero-token-docs
    contract exactly (the engine state is built at min_length=0 and the
    probe filters the lone empty-gram posting)."""
    cut = (
        f"(SELECT CAST(floor(max(doc_id) * {cut_frac}) AS BIGINT) "
        "FROM documents)"
    )
    old = _grams_cte(
        ngram_size, 1, tk_name="otk", grams_name="ograms",
        where=f"doc_id <= {cut}",
    )
    new = _grams_cte(
        ngram_size, 1, tk_name="ntk", grams_name="ngrams_",
        where=f"doc_id > {cut}",
    )
    return f"""
WITH {old},
{new},
oset AS (SELECT DISTINCT g FROM ograms)
SELECT n.doc_id AS row_id,
       count(*)::BIGINT AS n_distinct,
       sum(CASE WHEN oset.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_seen,
       1.0 - (sum(CASE WHEN oset.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
              / count(*)) AS novelty
FROM ngrams_ n LEFT JOIN oset USING (g)
GROUP BY n.doc_id
"""


def jaccard_cross_join_sql(
    ngram_size: int, min_length: int, threshold: float, mod: int = 97
) -> str:
    """Cross-table similarity join (pipelines/jaccard_dedup.jaccard_cross_join
    with an uncapped df): left = documents with doc_id % mod <> 0, right =
    the rest; exact shingle-set Jaccard >= threshold pairs, jaccard rounded
    to 4 places to match the Ray query's _round_col."""
    left = _grams_cte(
        ngram_size, min_length, tk_name="ltk", grams_name="lgrams",
        where=f"doc_id % {mod} <> 0",
    )
    right = _grams_cte(
        ngram_size, min_length, tk_name="rtk", grams_name="rgrams",
        where=f"doc_id % {mod} = 0",
    )
    return f"""
WITH {left},
{right},
ls AS (SELECT doc_id, count(*) AS sz FROM lgrams GROUP BY doc_id),
rs AS (SELECT doc_id, count(*) AS sz FROM rgrams GROUP BY doc_id),
co AS (
  SELECT l.doc_id AS left_id, r.doc_id AS right_id, count(*) AS co
  FROM lgrams l JOIN rgrams r USING (g) GROUP BY 1, 2
)
SELECT co.left_id, co.right_id,
       round(co.co::DOUBLE / (ls.sz + rs.sz - co.co), 4) AS jaccard
FROM co JOIN ls ON ls.doc_id = co.left_id JOIN rs ON rs.doc_id = co.right_id
WHERE co.co::DOUBLE / (ls.sz + rs.sz - co.co) >= {threshold}
"""


def repetition_sql(ngram: int = 2) -> str:
    """Gopher-style repetition counters (pipelines/textops.with_repetition):
    token count, distinct tokens, sliding-ngram total and the most frequent
    ngram's count — exact integers, plain windows (no reference edge
    cases)."""
    return f"""
WITH tok AS (SELECT doc_id, {TOKENS} AS ts FROM documents),
base AS (
  SELECT doc_id, len(ts) AS n_tokens_rep,
         len(list_distinct(ts)) AS n_distinct_tokens
  FROM tok
),
ng AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - {ngram - 1}),
                 j -> array_to_string(ts[j:j+{ngram - 1}], ' '))) AS g
  FROM tok WHERE len(ts) >= {ngram}
),
ngc AS (SELECT doc_id, g, count(*) AS c FROM ng GROUP BY 1, 2),
nga AS (
  SELECT doc_id, max(c) AS top_ngram_count, sum(c) AS n_ngrams
  FROM ngc GROUP BY doc_id
)
SELECT b.doc_id,
       b.n_tokens_rep::BIGINT AS n_tokens_rep,
       b.n_distinct_tokens::BIGINT AS n_distinct_tokens,
       coalesce(nga.n_ngrams, 0)::BIGINT AS n_ngrams,
       coalesce(nga.top_ngram_count, 0)::BIGINT AS top_ngram_count
FROM base b LEFT JOIN nga USING (doc_id)
"""


def _minhash_bands_core(
    cfg: MinHashConfig, table: str, value_mask: int | None = None
) -> str:
    """WITH-body prefix (no final SELECT) computing CTEs through ``bands``
    (doc_id, band_idx, band_val) — the LSH bucket identity — plus ``docs``
    (min-length survivors). Shared by the dedup oracles and the cross-join
    oracle. ``value_mask`` truncates every permutation value to its low bits
    (b-bit minwise hashing) — applied OUTSIDE the per-permutation min, like
    the engine (min over full-width values, then truncate)."""
    assert cfg.hash_func == "md5", "SQL oracle needs the md5 base hash"
    assert cfg.hash_bits == 64
    a, b = cfg.permutations()
    # the engine bands the FIRST bands*rows signature values
    # (stages/fingerprint.py: swapped[:, :bands*rows]); when bands*rows <
    # num_perm the remaining permutations must not become extra bands
    n_used = cfg.bands * cfg.rows
    perm_rows = ", ".join(
        f"({p}, {int(av)}, {int(bv)})"
        for p, (av, bv) in enumerate(zip(a[:n_used], b[:n_used]))
    )
    prime = (1 << 61) - 1
    max_hash = (1 << 32) - 1
    # the engine masks AFTER the per-permutation min (min of full-width
    # values, then truncate) — min(x) & m != min(x & m), so the mask must
    # wrap the aggregate, not the operand
    if value_mask is not None:
        assert 0 < value_mask <= max_hash
        outer_mask = f" & {value_mask}"
    else:
        outer_mask = ""
    return f"""{_grams_cte(cfg.ngram_size, cfg.min_length, table)},
docs AS (SELECT doc_id FROM tk WHERE len(ts) >= {cfg.min_length}),
hashes AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM grams
),
perms(p, a, b) AS (VALUES {perm_rows}),
sigs AS (
  SELECT doc_id, p,
         min((((h::HUGEINT * a) % {U64} + b) % {U64} % {prime})::BIGINT & {max_hash}){outer_mask} AS sig
  FROM hashes CROSS JOIN perms GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, p // {cfg.rows} AS band_idx,
         string_agg(sig::TEXT, ',' ORDER BY p) AS band_val
  FROM sigs GROUP BY doc_id, band_idx
)"""


def minhash_probe_sql(cfg: MinHashConfig, cut_frac: float = 0.8) -> str:
    """LSH candidate probe vs a saved MinHash state
    (pipelines/incremental.minhash_probe_vs_state): state = rep index over
    doc_id <= cut, probe = the rest; per new doc, how many of its band keys
    collide with an indexed bucket, whether any collide, and the smallest
    colliding bucket rep (-1 when none). The bands CTE is side-independent,
    so it runs over the whole table and the sides split at the join."""
    cut = (
        f"(SELECT CAST(floor(max(doc_id) * {cut_frac}) AS BIGINT) "
        "FROM documents)"
    )
    return f"""
WITH {_minhash_bands_core(cfg, "documents")},
oldb AS (SELECT band_idx, band_val, min(doc_id) AS rep FROM bands
         WHERE doc_id <= {cut} GROUP BY 1, 2),
newb AS (SELECT doc_id, band_idx, band_val FROM bands WHERE doc_id > {cut})
SELECT n.doc_id AS row_id,
       count(o.rep)::BIGINT AS n_hits,
       (count(o.rep) > 0) AS is_candidate,
       coalesce(min(o.rep), -1)::BIGINT AS candidate_rep
FROM newb n LEFT JOIN oldb o USING (band_idx, band_val)
GROUP BY n.doc_id
"""


def minhash_cross_join_sql(cfg: MinHashConfig, mod: int = 97) -> str:
    """LSH candidate join (pipelines/minhash.minhash_cross_join): distinct
    (left, right) doc pairs whose MinHash signatures collide in >= 1 band,
    left = documents with doc_id % mod <> 0, right = the rest. Fingerprints
    are side-independent, so the bands CTE runs over the whole table and the
    sides split at the join."""
    return f"""
WITH {_minhash_bands_core(cfg, "documents")}
SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id
FROM bands l JOIN bands r
  ON l.band_idx = r.band_idx AND l.band_val = r.band_val
WHERE l.doc_id % {mod} <> 0 AND r.doc_id % {mod} = 0
"""


def fuzzy_cross_join_sql(cfg: MinHashConfig, threshold: float, mod: int = 97) -> str:
    """Verified fuzzy join (pipelines/minhash.fuzzy_cross_join): the
    intersection of the LSH band-collision candidates and the exact
    shingle-Jaccard >= threshold pairs. The bands core's ``grams`` CTE (all
    docs, cfg ngram/min_length) serves both the signatures and the exact
    re-rank; sides split by doc_id % mod at the joins."""
    return f"""
WITH {_minhash_bands_core(cfg, "documents")},
cand AS (
  SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
  WHERE l.doc_id % {mod} <> 0 AND r.doc_id % {mod} = 0
),
gsz AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS co
  FROM grams a JOIN grams b USING (g)
  WHERE a.doc_id % {mod} <> 0 AND b.doc_id % {mod} = 0
  GROUP BY 1, 2
)
SELECT c.left_id, c.right_id,
       round(co.co::DOUBLE / (la.sz + rb.sz - co.co), 4) AS jaccard
FROM cand c
JOIN co USING (left_id, right_id)
JOIN gsz la ON la.doc_id = c.left_id
JOIN gsz rb ON rb.doc_id = c.right_id
WHERE co.co::DOUBLE / (la.sz + rb.sz - co.co) >= {threshold}
"""


def _minhash_core(
    cfg: MinHashConfig, table: str, value_mask: int | None = None
) -> str:
    """WITH-body (no final SELECT) computing CTEs ``docs`` (min-length
    survivors) and ``cc`` for MinHashLSH over ``table(doc_id, text)``."""
    return f"""{_minhash_bands_core(cfg, table, value_mask)},
buckets AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY band_idx, band_val) AS m FROM bands
),
edges AS (SELECT DISTINCT doc_id AS hi, m AS lo FROM buckets WHERE doc_id <> m),
{CC_FRAGMENT}"""


def minhash_dedup_sql(cfg: MinHashConfig) -> str:
    """The full MinHashLSH dedup (pipelines/minhash.minhash_dedup without FP
    check) in SQL: shingles -> md5 base hash -> (h*a+b) wrap-mod-2^64 then
    mod Mersenne-prime & max_hash -> per-band buckets -> star edges -> CC ->
    survivors (cluster root == own id). Requires cfg.hash_func == 'md5'."""
    return f"""
WITH RECURSIVE {_minhash_core(cfg, "documents")}
SELECT d.doc_id, d.doc_id AS cluster_id
FROM docs d LEFT JOIN cc ON cc.node = d.doc_id
WHERE cc.node IS NULL OR cc.cluster_id = d.doc_id
"""


def minhash_bbit_dedup_sql(cfg: MinHashConfig, b_bits: int) -> str:
    """b-bit minwise-hashing dedup (pipelines/minhash.minhash_dedup with
    ``b_bits``, per Li & König WWW'10): identical to :func:`minhash_dedup_sql`
    except every permutation value is truncated to its lowest ``b_bits``
    AFTER the per-shingle min, so bands compare 8/16-bit values."""
    mask = (1 << b_bits) - 1
    return f"""
WITH RECURSIVE {_minhash_core(cfg, "documents", value_mask=mask)}
SELECT d.doc_id, d.doc_id AS cluster_id
FROM docs d LEFT JOIN cc ON cc.node = d.doc_id
WHERE cc.node IS NULL OR cc.cluster_id = d.doc_id
"""


def cluster_cohesion_sql(cfg: MinHashConfig) -> str:
    """Per-cluster cohesion audit (pipelines/eval_cluster.cluster_cohesion
    over the MinHashLSH assignment): for every non-singleton cluster, the
    micro-averaged pairwise shingle Jaccard from exact integer identities —
    each gram shared by k members adds C(k,2) to sum_inter, and
    sum_union = (k-1)*sum(sz) - sum_inter. The one BIGINT/BIGINT division
    is IEEE-identical to the engine's numpy division."""
    return f"""
WITH RECURSIVE {_minhash_core(cfg, "documents")},
gsz AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
mem AS (SELECT cc.node AS doc_id, cc.cluster_id, gsz.sz
        FROM cc JOIN gsz ON gsz.doc_id = cc.node),
kstats AS (SELECT cluster_id, count(*) AS k, sum(sz) AS sumsz
           FROM mem GROUP BY 1),
inter AS (
  SELECT a.cluster_id, count(*) AS sum_inter
  FROM grams ga JOIN mem a ON a.doc_id = ga.doc_id
  JOIN grams gb ON gb.g = ga.g
  JOIN mem b ON b.doc_id = gb.doc_id
  WHERE b.cluster_id = a.cluster_id AND a.doc_id < b.doc_id
  GROUP BY 1
)
SELECT k.cluster_id,
       k.k::BIGINT AS n_members,
       (k.k * (k.k - 1) // 2)::BIGINT AS n_pairs,
       coalesce(i.sum_inter, 0)::BIGINT AS sum_inter,
       ((k.k - 1) * k.sumsz - coalesce(i.sum_inter, 0))::BIGINT AS sum_union,
       (coalesce(i.sum_inter, 0)::DOUBLE
        / ((k.k - 1) * k.sumsz - coalesce(i.sum_inter, 0))) AS cohesion
FROM kstats k LEFT JOIN inter i USING (cluster_id)
WHERE k.k >= 2
"""


def clustering_ari_sql(cfg: MinHashConfig) -> str:
    """ARI between the MinHashLSH clustering and the exact (identical-text)
    clustering over the min-length survivors — the reference's NEWS-COPY
    eval statistic (sklearn adjusted_rand_score, reference
    benchmarks/benchmark_news.py) recomputed purely in SQL via pair
    counting. Label VALUES need not match the engine's (ARI depends only on
    the partitions); the integer component sums and the round-6 ARI mirror
    pipelines/eval_cluster.ari_components expression-for-expression
    (float64 op order included) so the hash compare is exact."""
    return f"""
WITH RECURSIVE {_minhash_core(cfg, "documents")},
la AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS a
  FROM docs d LEFT JOIN cc ON cc.node = d.doc_id
),
lb AS (
  SELECT t.doc_id, min(t.doc_id) OVER (PARTITION BY t.text) AS b
  FROM documents t JOIN docs USING (doc_id)
),
labels AS (SELECT la.a, lb.b FROM la JOIN lb USING (doc_id)),
cont AS (SELECT a, b, count(*)::BIGINT AS nij FROM labels GROUP BY a, b),
asum AS (SELECT a, sum(nij)::BIGINT AS c FROM cont GROUP BY a),
bsum AS (SELECT b, sum(nij)::BIGINT AS c FROM cont GROUP BY b),
comp AS (
  SELECT
    (SELECT coalesce(sum(nij), 0)::BIGINT FROM cont) AS n_items,
    (SELECT coalesce(sum(nij * (nij - 1) // 2), 0)::BIGINT FROM cont) AS sum_pairs_ab,
    (SELECT coalesce(sum(c * (c - 1) // 2), 0)::BIGINT FROM asum) AS sum_pairs_a,
    (SELECT coalesce(sum(c * (c - 1) // 2), 0)::BIGINT FROM bsum) AS sum_pairs_b
)
SELECT n_items, sum_pairs_ab, sum_pairs_a, sum_pairs_b,
  CASE
    WHEN n_items < 2 THEN 1.0::DOUBLE
    WHEN ((sum_pairs_a + sum_pairs_b) / 2.0
          - (sum_pairs_a::DOUBLE / (n_items * (n_items - 1) // 2)) * sum_pairs_b) = 0.0
      THEN 1.0::DOUBLE
    ELSE round(
      (sum_pairs_ab - (sum_pairs_a::DOUBLE / (n_items * (n_items - 1) // 2)) * sum_pairs_b)
      / ((sum_pairs_a + sum_pairs_b) / 2.0
         - (sum_pairs_a::DOUBLE / (n_items * (n_items - 1) // 2)) * sum_pairs_b),
      6)
  END AS ari
FROM comp
"""


def curate_sql(
    cfg: MinHashConfig,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_stopword_hits: int = 2,
    budget: int = 15_000,
    capacity: int = 2048,
) -> str:
    """The COMPOSED curation chain (pipelines/curate.curate_corpus) as one
    statement: exact first-wins dedup -> MinHashLSH CC over the exact
    survivors -> keep the (n_tokens DESC, id ASC) argmax per cluster among
    min-length docs -> Gopher gates -> token-budget window cut ->
    doc-id-order packing offsets/bins. Every fragment is the same SQL its
    standalone oracle uses, so a mismatch isolates to the composition."""
    stop_re = r"\b(the|be|to|of|and|that|have|with|a|in)\b"
    return f"""
WITH RECURSIVE exact AS (
  SELECT doc_id, text FROM documents
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
),
{_minhash_core(cfg, "exact")},
ntok AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
  FROM exact
),
scored AS (
  SELECT n.doc_id, n.text, n.n_tokens,
         coalesce(cc.cluster_id, n.doc_id) AS cluster_id
  FROM ntok n JOIN docs d ON d.doc_id = n.doc_id
  LEFT JOIN cc ON cc.node = n.doc_id
),
best AS (
  SELECT doc_id, text, n_tokens FROM scored
  QUALIFY row_number() OVER (
    PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) = 1
),
g AS (
  SELECT doc_id, n_tokens,
         len(regexp_extract_all(text, '[A-Za-z0-9_]'))::BIGINT AS nwc,
         len(regexp_extract_all(text, '(#|\\.\\.\\.|…)'))::BIGINT AS nsym,
         len(regexp_extract_all(text, '{stop_re}'))::BIGINT AS nstop
  FROM best
),
gop AS (
  SELECT doc_id, n_tokens FROM g
  WHERE n_tokens >= {min_words} AND n_tokens <= {max_words}
    AND (CASE WHEN n_tokens = 0 THEN 0.0 ELSE nwc::DOUBLE / n_tokens END)
        BETWEEN {min_mean_word_len} AND {max_mean_word_len}
    AND (CASE WHEN n_tokens = 0 THEN 0.0 ELSE nsym::DOUBLE / n_tokens END)
        <= {max_symbol_word_ratio}
    AND nstop >= {min_stopword_hits}
),
sel AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS so
  FROM gop
),
kept AS (SELECT doc_id, n_tokens FROM sel WHERE so + n_tokens <= {budget}),
packed AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS "offset"
  FROM kept
)
SELECT doc_id, n_tokens, "offset",
       "offset" // {capacity} AS first_bin,
       CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // {capacity}
            ELSE "offset" // {capacity} END AS last_bin,
       (CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // {capacity}
             ELSE "offset" // {capacity} END) > ("offset" // {capacity}) AS straddles
FROM packed
"""


def minhash_verified_sql(cfg: MinHashConfig) -> str:
    """MinHashLSH dedup WITH the false-positive Jaccard verify pass
    (pipelines/minhash.minhash_dedup with check_false_positive, reference
    minhash.py:101-170 semantics via pipelines/verify.py): candidate members
    = every CC node; per cluster, members appearing in some pair with
    shingle-set Jaccard >= cfg.threshold are "verified" and regroup under
    min(verified); everyone else reverts to their own id. Survivors =
    min-length docs whose final cluster is themselves. Same column contract
    as ``minhash_dedup_sql``."""
    return f"""
WITH RECURSIVE {_minhash_core(cfg, "documents")},
gsz AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
pairco AS (
  SELECT m1.cluster_id AS c, m1.node AS i, m2.node AS j, count(*) AS co
  FROM cc m1 JOIN cc m2 ON m1.cluster_id = m2.cluster_id AND m1.node > m2.node
  JOIN grams ga ON ga.doc_id = m1.node
  JOIN grams gb ON gb.doc_id = m2.node AND ga.g = gb.g
  GROUP BY 1, 2, 3
),
vpairs AS (
  SELECT p.c, p.i, p.j
  FROM pairco p JOIN gsz sa ON sa.doc_id = p.i JOIN gsz sb ON sb.doc_id = p.j
  WHERE p.co::DOUBLE / (sa.sz + sb.sz - p.co) >= {cfg.threshold}
),
verified AS (
  -- explicit DISTINCT: DuckDB resolves a bare UNION against the recursive
  -- WITH machinery here without deduplicating
  SELECT DISTINCT c, node FROM (
    SELECT c, i AS node FROM vpairs UNION ALL SELECT c, j AS node FROM vpairs
  )
),
vmap AS (
  SELECT node, min(node) OVER (PARTITION BY c) AS new_c FROM verified
)
SELECT d.doc_id, d.doc_id AS cluster_id
FROM docs d LEFT JOIN vmap v ON v.node = d.doc_id
WHERE v.node IS NULL OR v.new_c = d.doc_id
"""


def _corpus_docs_cte(corpus_path: str) -> str:
    """The generated image+caption corpus as (doc_id, text): row ids parse
    out of 'img-%012d' keys exactly like pipelines/images.image_ids_to_row_ids."""
    return (
        f"corpus_docs AS (SELECT CAST(substr(image_id, 5) AS BIGINT) AS doc_id, "
        f"caption AS text FROM read_parquet('{corpus_path}'))"
    )


def minhash_images_sql(cfg: MinHashConfig, corpus_path: str) -> str:
    """The flagship image+caption MinHashLSH dedup recomputed in SQL over the
    deterministic corpus parquet: survivors' (image_id, caption, phash)."""
    return f"""
WITH RECURSIVE {_corpus_docs_cte(corpus_path)},
{_minhash_core(cfg, "corpus_docs")},
surv AS (
  SELECT d.doc_id FROM docs d LEFT JOIN cc ON cc.node = d.doc_id
  WHERE cc.node IS NULL OR cc.cluster_id = d.doc_id
)
SELECT c.image_id, c.caption, c.phash
FROM surv s JOIN read_parquet('{corpus_path}') c
  ON CAST(substr(c.image_id, 5) AS BIGINT) = s.doc_id
"""


def _sig_ubigint_to_bigint(col: str) -> str:
    """UBIGINT -> BIGINT with the same 64-bit pattern (two's complement)."""
    return (
        f"CASE WHEN {col} >= 9223372036854775808::UBIGINT "
        f"THEN ({col}::HUGEINT - {U64})::BIGINT ELSE {col}::BIGINT END"
    )


def _simhash_keys_cte(perms) -> str:
    """UNION ALL of per-permutation bucket-key selects over ``all_sigs`` —
    block masks/offsets/search masks inlined as integer constants."""
    key_selects = []
    for j, p in enumerate(perms):
        terms = []
        for mask, off in zip(p.masks, p.offsets):
            base = f"(sig & {mask}::UBIGINT)::HUGEINT"
            if off > 0:
                terms.append(f"(({base} * {1 << off}) % {U64})")
            elif off < 0:
                terms.append(f"({base} // {1 << (-off)})")
            else:
                terms.append(base)
        expr = f"((({' + '.join(terms)}) % {U64})::UBIGINT & {p.search_mask}::UBIGINT)"
        key_selects.append(f"SELECT doc_id, {j} AS perm, {expr} AS key FROM all_sigs")
    return " UNION ALL ".join(key_selects)


def _hamming_edges_cte(bit_diff: int) -> str:
    """CTEs cand/edges: in-bucket pairs Hamming-verified over ``keys`` and
    ``all_sigs``."""
    sig_i = _sig_ubigint_to_bigint("s1.sig")
    sig_j = _sig_ubigint_to_bigint("s2.sig")
    return f"""cand AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM keys a JOIN keys b ON a.perm = b.perm AND a.key = b.key AND a.doc_id > b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT c.i AS hi, c.j AS lo
  FROM cand c JOIN all_sigs s1 ON s1.doc_id = c.i JOIN all_sigs s2 ON s2.doc_id = c.j
  WHERE bit_count(xor({sig_i}, {sig_j})) <= {bit_diff}
)"""


def _simhash_core128(cfg: SimHashConfig, table: str) -> str:
    """f=128 WITH-body for ``cc``: the 128-bit signature rides as TWO
    UBIGINT lanes (sig_hi = bitarray positions 0..63, sig_lo = 64..127 —
    exactly the engine's big-endian byte split of the full md5 digest),
    bit-majority per lane, bucket keys re-derived per permutation from the
    lanes' block bits (left-aligned uint64, matching
    ``permutation_keys_batch_bytes``), Hamming = popcount(hi) + popcount(lo).
    Requires every block to sit inside one lane (true whenever 64 is a
    multiple of the ceil(128/num_bucket) block size, e.g. num_bucket 2/4/8)."""
    assert cfg.hash_func == "md5", "SQL oracle needs the md5 base hash"
    assert cfg.f == 128
    from .functions.simhash import block_masks, create_permutations

    spans = block_masks(128, cfg.num_bucket)
    for s, e in spans:
        if s < 64 < e:
            raise NotImplementedError(
                "oracle: simhash block spans the 64-bit lane boundary"
            )
    perms = create_permutations(128, cfg.bit_diff, cfg.num_bucket)

    def lane_bits(s: int, e: int) -> str:
        # bitarray span [s, e) -> right-aligned block value from its lane
        w = e - s
        if e <= 64:
            lane, rsh = "sig_hi", 64 - e
        else:
            lane, rsh = "sig_lo", 128 - e
        expr = f"{lane}::HUGEINT // {1 << rsh}" if rsh else f"{lane}::HUGEINT"
        return f"(({expr}) & {(1 << w) - 1})"

    key_selects = []
    n_fixed = cfg.num_bucket - cfg.bit_diff
    from itertools import permutations as _iperm

    for j, fixed in enumerate(_iperm(range(len(spans)), n_fixed)):
        cum = 0
        terms = []
        for i in fixed:
            s, e = spans[i]
            w = e - s
            lsh = 64 - cum - w
            terms.append(f"({lane_bits(s, e)} * {1 << lsh})" if lsh else lane_bits(s, e))
            cum += w
        key_selects.append(
            f"SELECT doc_id, {j} AS perm, "
            f"((({' + '.join(terms)}) % {U64})::UBIGINT) AS key FROM all_sigs"
        )
    assert len(key_selects) == len(perms)
    maj = {
        "hh": " + ".join(
            f"CASE WHEN 2 * sum(((hh >> {63 - b}) & 1::UBIGINT)::BIGINT) > count(*) "
            f"THEN {1 << (63 - b)}::HUGEINT ELSE 0::HUGEINT END"
            for b in range(64)
        ),
        "hl": " + ".join(
            f"CASE WHEN 2 * sum(((hl >> {63 - b}) & 1::UBIGINT)::BIGINT) > count(*) "
            f"THEN {1 << (63 - b)}::HUGEINT ELSE 0::HUGEINT END"
            for b in range(64)
        ),
    }
    hi_i, hi_j = _sig_ubigint_to_bigint("s1.sig_hi"), _sig_ubigint_to_bigint("s2.sig_hi")
    lo_i, lo_j = _sig_ubigint_to_bigint("s1.sig_lo"), _sig_ubigint_to_bigint("s2.sig_lo")
    return f"""{_grams_cte(cfg.ngram_size, cfg.min_length, table)},
h128 AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 16))::UBIGINT AS hh,
         ('0x' || substr(md5(g), 17, 16))::UBIGINT AS hl
  FROM grams
),
sigs AS (
  SELECT doc_id, ({maj["hh"]})::UBIGINT AS sig_hi, ({maj["hl"]})::UBIGINT AS sig_lo
  FROM h128 GROUP BY doc_id
),
all_sigs AS (
  SELECT d.doc_id, coalesce(s.sig_hi, 0::UBIGINT) AS sig_hi,
         coalesce(s.sig_lo, 0::UBIGINT) AS sig_lo
  FROM {table} d LEFT JOIN sigs s ON s.doc_id = d.doc_id
),
keys AS ({" UNION ALL ".join(key_selects)}),
cand AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM keys a JOIN keys b ON a.perm = b.perm AND a.key = b.key AND a.doc_id > b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT c.i AS hi, c.j AS lo
  FROM cand c JOIN all_sigs s1 ON s1.doc_id = c.i JOIN all_sigs s2 ON s2.doc_id = c.j
  WHERE bit_count(xor({hi_i}, {hi_j})) + bit_count(xor({lo_i}, {lo_j}))
        <= {cfg.bit_diff}
),
{CC_FRAGMENT}"""


def _simhash_core(cfg: SimHashConfig, table: str) -> str:
    """WITH-body computing ``cc`` for SimHash dedup over ``table(doc_id,
    text)``: md5 f-bit hashes -> bit-majority signature (ties -> 0; empty
    shingle set -> 0) -> block-permutation prefix keys -> in-bucket Hamming
    pairs -> CC. f=128 routes to :func:`_simhash_core128` (two UBIGINT
    lanes)."""
    assert cfg.hash_func == "md5", "SQL oracle needs the md5 base hash"
    if cfg.f == 128:
        return _simhash_core128(cfg, table)
    assert cfg.f == 64
    perms = create_permutations(cfg.f, cfg.bit_diff, cfg.num_bucket)
    # bit-majority as 64 aggregate terms in ONE scan of the hash rows (a
    # 64x row expansion + re-group was ~25x slower at corpus scale)
    majority_terms = " + ".join(
        f"CASE WHEN 2 * sum(((h >> {63 - b}) & 1::UBIGINT)::BIGINT) > count(*) "
        f"THEN {1 << (63 - b)}::HUGEINT ELSE 0::HUGEINT END"
        for b in range(64)
    )
    return f"""{_grams_cte(cfg.ngram_size, cfg.min_length, table)},
h64 AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 16))::UBIGINT AS h FROM grams
),
sigs AS (
  SELECT doc_id, ({majority_terms})::UBIGINT AS sig
  FROM h64 GROUP BY doc_id
),
all_sigs AS (
  SELECT d.doc_id, coalesce(s.sig, 0::UBIGINT) AS sig
  FROM {table} d LEFT JOIN sigs s ON s.doc_id = d.doc_id
),
keys AS ({_simhash_keys_cte(perms)}),
{_hamming_edges_cte(cfg.bit_diff)},
{CC_FRAGMENT}"""


def simhash_dedup_sql(cfg: SimHashConfig) -> str:
    """SimHash dedup (pipelines/simhash.simhash_dedup without FP check) in
    SQL; survivors = docs that are not non-root members (the
    pre-verification __duplicate__ filter semantics). Requires
    cfg.hash_func == 'md5' and f == 64."""
    return f"""
WITH RECURSIVE {_simhash_core(cfg, "documents")}
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM cc WHERE cluster_id <> node)
"""


def simhash_keep_best_sql(cfg: SimHashConfig) -> str:
    """Quality-aware survivor policy (pipelines/select.keep_best_in_cluster
    over simhash_dedup clusters): per cluster keep the member with the most
    ``[A-Za-z0-9_]+`` tokens, ties -> smallest doc_id. Clusters are the same
    SimHash CC as :func:`simhash_dedup_sql`; singletons keep themselves."""
    return f"""
WITH RECURSIVE {_simhash_core(cfg, "documents")},
assign AS (
  SELECT d.doc_id,
         coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
         len(regexp_extract_all(d.text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
)
SELECT doc_id, n_tokens FROM assign
QUALIFY row_number() OVER (PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) = 1
"""


def simhash_images_sql(cfg: SimHashConfig, corpus_path: str) -> str:
    """SimHash dedup of the image+caption corpus captions: survivors'
    (image_id, caption)."""
    return f"""
WITH RECURSIVE {_corpus_docs_cte(corpus_path)},
{_simhash_core(cfg, "corpus_docs")}
SELECT c.image_id, c.caption
FROM read_parquet('{corpus_path}') c
WHERE CAST(substr(c.image_id, 5) AS BIGINT) NOT IN
      (SELECT node FROM cc WHERE cluster_id <> node)
"""


def multimodal_images_sql(
    cfg: MinHashConfig, bit_diff: int, num_bucket: int, corpus_path: str
) -> str:
    """OR-fusion image dedup (pipelines/images.multimodal_dedup): caption
    MinHashLSH star edges UNION phash Hamming edges feed ONE CC; survivors
    = docs that are not non-root members (all docs participate — the
    min-length filter only silences the caption signal). The two edge
    fragments are the same SQL the standalone oracles use, with the phash
    candidate/edge CTEs renamed (pcand/pedges) to avoid colliding with the
    MinHash names."""
    perms = create_permutations(64, bit_diff, num_bucket)
    sig_i = _sig_ubigint_to_bigint("s1.sig")
    sig_j = _sig_ubigint_to_bigint("s2.sig")
    return f"""
WITH RECURSIVE {_corpus_docs_cte(corpus_path)},
{_minhash_bands_core(cfg, "corpus_docs")},
mbuckets AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY band_idx, band_val) AS m FROM bands
),
medges AS (SELECT DISTINCT doc_id AS hi, m AS lo FROM mbuckets WHERE doc_id <> m),
all_sigs AS (
  SELECT CAST(substr(image_id, 5) AS BIGINT) AS doc_id,
         CASE WHEN phash < 0 THEN (phash::HUGEINT + {U64})::UBIGINT
              ELSE phash::UBIGINT END AS sig
  FROM read_parquet('{corpus_path}')
),
keys AS ({_simhash_keys_cte(perms)}),
pcand AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM keys a JOIN keys b ON a.perm = b.perm AND a.key = b.key AND a.doc_id > b.doc_id
  GROUP BY 1, 2
),
pedges AS (
  SELECT c.i AS hi, c.j AS lo
  FROM pcand c JOIN all_sigs s1 ON s1.doc_id = c.i JOIN all_sigs s2 ON s2.doc_id = c.j
  WHERE bit_count(xor({sig_i}, {sig_j})) <= {bit_diff}
),
edges AS (SELECT hi, lo FROM medges UNION SELECT hi, lo FROM pedges),
{CC_FRAGMENT}
SELECT c.image_id, c.caption
FROM read_parquet('{corpus_path}') c
WHERE CAST(substr(c.image_id, 5) AS BIGINT) NOT IN
      (SELECT node FROM cc WHERE cluster_id <> node)
"""


def _cc_fragment_named(edges: str, prefix: str) -> str:
    """CC_FRAGMENT with renamed CTEs so one statement can run CC over two
    independent edge sets (the partition-meet oracle needs both)."""
    return f"""
{prefix}nodes AS (SELECT hi AS node FROM {edges} UNION SELECT lo AS node FROM {edges}),
{prefix}sym AS (SELECT hi AS a, lo AS b FROM {edges} UNION ALL SELECT lo AS a, hi AS b FROM {edges}),
{prefix}walk(node, label) AS (
    SELECT node, node FROM {prefix}nodes
  UNION
    SELECT s.a, w.label FROM {prefix}walk w JOIN {prefix}sym s ON s.b = w.node WHERE w.label < s.a
),
{prefix}cc AS (SELECT node, min(label) AS cluster_id FROM {prefix}walk GROUP BY node)
"""


def multimodal_meet_sql(
    cfg: MinHashConfig, bit_diff: int, num_bucket: int, corpus_path: str
) -> str:
    """AND-fusion image dedup (stages/cc.cluster_map_meet over the caption
    MinHashLSH map and the phash Hamming map): rows share an output cluster
    iff they share a cluster in BOTH modalities — the partition MEET. Same
    edge CTEs as :func:`multimodal_images_sql`, but each edge set gets its
    OWN CC; per doc the (caption root, pixel root) tuple keys the meet and
    classes of size >= 2 survive with min-doc_id cluster ids."""
    perms = create_permutations(64, bit_diff, num_bucket)
    sig_i = _sig_ubigint_to_bigint("s1.sig")
    sig_j = _sig_ubigint_to_bigint("s2.sig")
    return f"""
WITH RECURSIVE {_corpus_docs_cte(corpus_path)},
{_minhash_bands_core(cfg, "corpus_docs")},
mbuckets AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY band_idx, band_val) AS m FROM bands
),
medges AS (SELECT DISTINCT doc_id AS hi, m AS lo FROM mbuckets WHERE doc_id <> m),
all_sigs AS (
  SELECT CAST(substr(image_id, 5) AS BIGINT) AS doc_id,
         CASE WHEN phash < 0 THEN (phash::HUGEINT + {U64})::UBIGINT
              ELSE phash::UBIGINT END AS sig
  FROM read_parquet('{corpus_path}')
),
keys AS ({_simhash_keys_cte(perms)}),
pcand AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM keys a JOIN keys b ON a.perm = b.perm AND a.key = b.key AND a.doc_id > b.doc_id
  GROUP BY 1, 2
),
pedges AS (
  SELECT c.i AS hi, c.j AS lo
  FROM pcand c JOIN all_sigs s1 ON s1.doc_id = c.i JOIN all_sigs s2 ON s2.doc_id = c.j
  WHERE bit_count(xor({sig_i}, {sig_j})) <= {bit_diff}
),
{_cc_fragment_named("medges", "m")},
{_cc_fragment_named("pedges", "p")},
ids AS (
  SELECT CAST(substr(image_id, 5) AS BIGINT) AS row_id
  FROM read_parquet('{corpus_path}')
),
roots AS (
  SELECT i.row_id,
         coalesce(m.cluster_id, i.row_id) AS c1,
         coalesce(p.cluster_id, i.row_id) AS c2
  FROM ids i
  LEFT JOIN mcc m ON m.node = i.row_id
  LEFT JOIN pcc p ON p.node = i.row_id
),
meet AS (
  SELECT row_id, min(row_id) OVER (PARTITION BY c1, c2) AS cluster_id,
         count(*) OVER (PARTITION BY c1, c2) AS sz
  FROM roots
)
SELECT row_id, cluster_id FROM meet WHERE sz > 1
"""


def phash_dedup_sql(bit_diff: int, num_bucket: int, corpus_path: str) -> str:
    """Perceptual-hash near-dup clusters (pipelines/images.
    phash_near_dedup_parents — the SimHash block-permutation machinery
    applied to the 64-bit phash column): (row_id, cluster_id) incl. roots."""
    perms = create_permutations(64, bit_diff, num_bucket)
    return f"""
WITH RECURSIVE all_sigs AS (
  SELECT CAST(substr(image_id, 5) AS BIGINT) AS doc_id,
         CASE WHEN phash < 0 THEN (phash::HUGEINT + {U64})::UBIGINT
              ELSE phash::UBIGINT END AS sig
  FROM read_parquet('{corpus_path}')
),
keys AS ({_simhash_keys_cte(perms)}),
{_hamming_edges_cte(bit_diff)},
{CC_FRAGMENT}
SELECT node AS row_id, cluster_id FROM cc
"""


def winnowing_sql(k: int = 8, window: int = 16) -> str:
    """The 64-bit winnowing fingerprint (functions/textstats.
    winnowing_fingerprint) recomputed in SQL: rolling degree-(k-1) polynomial
    hash mod 2^64 over the lowered bytes, per-window minima (distinct) when
    more than ``window`` grams exist, all grams (with multiplicity) otherwise,
    xor-folded after a golden-ratio multiply. Docs shorter than ``k`` bytes
    use the little-endian md5 prefix. Valid for ASCII documents (the driver
    tables are ASCII; byte == codepoint)."""
    base = 1000003
    pows = [pow(base, k - 1 - j, U64) for j in range(k)]
    gold = 0x9E3779B97F4A7C15
    pow_rows = ", ".join(f"({j + 1}, {p})" for j, p in enumerate(pows))
    le_rows = ", ".join(f"({i + 1}, {256 ** i})" for i in range(8))
    sign = lambda v: (  # noqa: E731 — uint64 -> two's-complement BIGINT
        f"CASE WHEN {v} >= {1 << 63} THEN ({v} - {U64})::BIGINT ELSE ({v})::BIGINT END"
    )
    return f"""
WITH chars AS (
  SELECT doc_id, i, ascii(substr(lower(text), i, 1))::HUGEINT AS b,
         length(text) AS n
  FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i)
),
pows(j, p) AS (VALUES {pow_rows}),
grams AS (
  SELECT c.doc_id, c.i - pw.j + 1 AS gi, (sum(c.b * pw.p) % {U64}) AS g
  FROM chars c JOIN pows pw
    ON c.i - pw.j + 1 >= 1 AND c.i - pw.j + 1 <= c.n - {k - 1}
  GROUP BY c.doc_id, gi
),
gcounts AS (SELECT doc_id, count(*) AS ng FROM grams GROUP BY doc_id),
small AS (
  SELECT g.doc_id, g.g AS m FROM grams g JOIN gcounts c USING (doc_id)
  WHERE c.ng <= {window}
),
winmin AS (
  SELECT g.doc_id,
         min(g.g) OVER (PARTITION BY g.doc_id ORDER BY g.gi
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m,
         g.gi, c.ng
  FROM grams g JOIN gcounts c USING (doc_id) WHERE c.ng > {window}
),
big AS (SELECT DISTINCT doc_id, m FROM winmin WHERE gi <= ng - {window - 1}),
folded AS (
  SELECT doc_id, bit_xor({sign(f"(m * {gold}) % {U64}")}) AS fp64
  FROM (SELECT * FROM small UNION ALL SELECT * FROM big) GROUP BY doc_id
),
le(kpos, mult) AS (VALUES {le_rows}),
tiny AS (
  SELECT d.doc_id,
         {sign(f"(SELECT sum(('0x' || substr(md5(lower(d.text)), 2 * kpos - 1, 2))::HUGEINT * mult) FROM le)")} AS fp64
  FROM documents d WHERE length(d.text) < {k}
)
SELECT doc_id, fp64 FROM folded
UNION ALL
SELECT doc_id, fp64 FROM tiny
"""


def suffix_dedup_sql(length_threshold: int = 100, where: str = "TRUE") -> str:
    """Corpus-wide exact-substring dedup (pipelines/suffix_array.
    suffix_array_dedup over ONE corpus partition) in SQL.

    Equivalence used: a byte is inside some repeated substring of length >=
    L iff it is covered by a span [q, q+L) whose L-gram occurs >= 2 times in
    the doc-id-ordered concatenation (the SA+LCP adjacent-hit union in
    functions/suffixarray.duplicate_byte_ranges equals that byte set, and
    merge_intervals('overlapping') makes runs maximal). Per doc the cut set
    is each maximal covered run clipped to the doc and kept iff still >= L
    (restore_and_merge, intervals.py:86-102); remaining bytes are re-joined
    and empty docs dropped. Valid for ASCII documents (byte == char).
    L-gram identity via md5 (collisions negligible). ``where`` restricts the
    corpus (bare ``doc_id`` references) — the grams scan is O(corpus bytes),
    so gate queries subset with it."""
    return f"""
WITH {_suffix_pipe(length_threshold, "", where, "TRUE")}
SELECT doc_id, text FROM rebuilt WHERE length(text) > 0
"""


def _suffix_pipe(L: int, sfx: str, src_where: str, out_where: str) -> str:
    """One copy of the suffix-dedup CTE pipeline with suffixed names.
    ``src_where`` filters the corpus the grams are counted over (bare
    ``doc_id`` references); ``out_where`` filters which docs receive cuts /
    appear in the output and must reference the alias ``o.doc_id``."""
    return f"""offs{sfx} AS (
  SELECT doc_id, text, length(text) AS n,
         1 + coalesce(sum(length(text)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM documents WHERE {src_where}
),
corpus{sfx} AS (SELECT string_agg(text, '' ORDER BY doc_id) AS c FROM documents WHERE {src_where}),
grams{sfx} AS (
  SELECT i, md5(substr(c, i, {L})) AS g
  FROM corpus{sfx}, LATERAL (SELECT unnest(generate_series(1, length(c) - {L - 1})) AS i)
),
rep{sfx} AS (SELECT i FROM grams{sfx} QUALIFY count(*) OVER (PARTITION BY g) >= 2),
isl{sfx} AS (
  SELECT i, CASE WHEN i - lag(i) OVER (ORDER BY i) <= {L} THEN 0 ELSE 1 END AS brk
  FROM rep{sfx}
),
grp{sfx} AS (SELECT i, sum(brk) OVER (ORDER BY i) AS gid FROM isl{sfx}),
runs{sfx} AS (SELECT min(i) AS s, max(i) + {L} AS e FROM grp{sfx} GROUP BY gid),
cuts{sfx} AS (
  SELECT o.doc_id, greatest(r.s, o.start) AS cs, least(r.e, o.start + o.n) AS ce
  FROM runs{sfx} r JOIN offs{sfx} o ON r.s < o.start + o.n AND r.e > o.start
  WHERE least(r.e, o.start + o.n) - greatest(r.s, o.start) >= {L}
    AND ({out_where})
),
loc{sfx} AS (
  SELECT c.doc_id, c.cs - o.start + 1 AS ls, c.ce - o.start + 1 AS le
  FROM cuts{sfx} c JOIN offs{sfx} o ON o.doc_id = c.doc_id
),
seg{sfx} AS (
  SELECT doc_id, coalesce(lag(le) OVER (PARTITION BY doc_id ORDER BY ls), 1) AS ks,
         ls AS ke
  FROM loc{sfx}
  UNION ALL
  SELECT o.doc_id, coalesce(max(l.le), 1) AS ks, o.n + 1 AS ke
  FROM offs{sfx} o LEFT JOIN loc{sfx} l ON l.doc_id = o.doc_id
  WHERE {out_where}
  GROUP BY o.doc_id, o.n
),
rebuilt{sfx} AS (
  SELECT s.doc_id, string_agg(substr(o.text, s.ks::INT, (s.ke - s.ks)::INT), '' ORDER BY s.ks) AS text
  FROM seg{sfx} s JOIN offs{sfx} o ON o.doc_id = s.doc_id
  WHERE s.ke > s.ks
  GROUP BY s.doc_id
)"""


def substring_decontaminate_sql(length_threshold: int, mod: int) -> str:
    """Cross-corpus substring decontamination (pipelines/decontaminate.
    substring_decontaminate): corpus = doc_id % mod != 0, benchmark = the
    rest; cut every maximal corpus byte run covered by L-byte windows that
    occur anywhere in the benchmark (same island/run/rebuild semantics as
    :func:`suffix_dedup_sql`, per-doc positions, md5-window identity on
    BOTH sides so the match is exact)."""
    L = length_threshold
    return f"""
WITH bw AS (
  SELECT DISTINCT ('0x' || substr(md5(substr(text, i, {L})), 1, 16))::UBIGINT AS h
  FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - {L - 1})) AS i)
  WHERE doc_id % {mod} = 0
),
tw AS (
  SELECT doc_id, i,
         ('0x' || substr(md5(substr(text, i, {L})), 1, 16))::UBIGINT AS h
  FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - {L - 1})) AS i)
  WHERE doc_id % {mod} != 0
),
hits AS (SELECT doc_id, i FROM tw WHERE h IN (SELECT h FROM bw)),
isl AS (
  SELECT doc_id, i,
         CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= {L}
              THEN 0 ELSE 1 END AS brk
  FROM hits
),
grp AS (SELECT doc_id, i, sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS gid FROM isl),
runs AS (SELECT doc_id, min(i) AS s, max(i) + {L} AS e FROM grp GROUP BY doc_id, gid),
seg AS (
  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS ks,
         s AS ke
  FROM runs
  UNION ALL
  SELECT d.doc_id, coalesce(max(r.e), 1) AS ks, length(d.text) + 1 AS ke
  FROM documents d LEFT JOIN runs r ON r.doc_id = d.doc_id
  WHERE d.doc_id % {mod} != 0
  GROUP BY d.doc_id, d.text
),
rebuilt AS (
  SELECT s.doc_id,
         string_agg(substr(d.text, s.ks::INT, (s.ke - s.ks)::INT), '' ORDER BY s.ks) AS text
  FROM seg s JOIN documents d USING (doc_id)
  WHERE s.ke > s.ks
  GROUP BY s.doc_id
)
SELECT doc_id, text FROM rebuilt WHERE length(text) > 0
"""


def suffix_tiered_sql(
    length_threshold: int, cut_expr: str | None = None, where: str = "TRUE"
) -> str:
    """Tiered exact-substring dedup (pipelines/incremental_suffix): OLD docs
    (doc_id <= cut) are cut against the OLD corpus only (they shipped before
    the new batch existed); NEW docs (doc_id > cut) are cut against the FULL
    corpus (old ∪ new). Same L-gram coverage equivalence as
    :func:`suffix_dedup_sql`, applied per tier. ``cut_expr`` defaults to the
    80% doc_id split the driver query uses (floor, matching Python int());
    ``where`` restricts the corpus (both tiers AND the default cut)."""
    if cut_expr is None:
        cut_expr = (
            "(SELECT CAST(floor(max(doc_id) * 0.8) AS BIGINT) "
            f"FROM documents WHERE {where})"
        )
    old = _suffix_pipe(
        length_threshold, "_o", f"doc_id <= {cut_expr} AND ({where})", "TRUE"
    )
    new = _suffix_pipe(length_threshold, "_a", where, f"o.doc_id > {cut_expr}")
    return f"""
WITH {old},
{new}
SELECT doc_id, text FROM rebuilt_o WHERE length(text) > 0
UNION ALL
SELECT doc_id, text FROM rebuilt_a WHERE length(text) > 0
"""


def embedding_dedup_sql(threshold: float, plant_offset: int) -> str:
    """Exact embedding-cosine dedup clusters over the deterministically
    planted table (originals UNION exact copies at vec_id + plant_offset):
    all-pairs cosine >= threshold -> CC -> cluster map incl. roots."""
    return f"""
WITH RECURSIVE base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {plant_offset} AS vec_id, embedding FROM embeddings
),
edges AS (
  SELECT a.vec_id AS hi, b.vec_id AS lo
  FROM base a JOIN base b ON a.vec_id > b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {threshold}
),
{CC_FRAGMENT}
SELECT node AS row_id, cluster_id FROM cc
"""


def semdedup_sql(threshold: float, plant_offset: int) -> str:
    """SemDeDup with the deterministic argmax-coordinate quantizer
    (pipelines/semdedup.semdedup with centroids=np.eye(dim)): vectors
    compare only within their argmax cell; exact cosine >= threshold edges
    -> CC -> cluster map incl. roots. Cell ids differ by the 0/1 base
    between numpy and SQL but only the PARTITION matters."""
    return f"""
WITH RECURSIVE base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {plant_offset} AS vec_id, embedding FROM embeddings
),
cells AS (
  SELECT vec_id, embedding,
         list_position(embedding, list_max(embedding)) AS cell
  FROM base
),
edges AS (
  SELECT a.vec_id AS hi, b.vec_id AS lo
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id > b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {threshold}
),
{CC_FRAGMENT}
SELECT node AS row_id, cluster_id FROM cc
"""


def embedding_pairs_sql(threshold: float, plant_offset: int) -> str:
    """Exact cosine-threshold pair table over the planted union
    (pipelines/ann.embedding_cosine_pairs)."""
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {plant_offset} AS vec_id, embedding FROM embeddings
)
SELECT a.vec_id AS src, b.vec_id AS dst,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
FROM base a JOIN base b ON a.vec_id > b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {threshold}
"""


def video_frame_stats_sql(corpus_path: str, every_n: int = 1) -> str:
    """Per-video frame statistics (pipelines/video.video_frame_stats): the
    pipeline recomputes each sampled frame's phash from the raw bytes; the
    oracle reads the generator's ground-truth ``frame_phashes`` list —
    equality proves the decode+hash path bit-exact."""
    return f"""
WITH f AS (
  SELECT video_id, n_frames,
         unnest(frame_phashes) AS ph,
         generate_subscripts(frame_phashes, 1) - 1 AS fidx
  FROM read_parquet('{corpus_path}')
)
SELECT video_id,
       any_value(n_frames)::BIGINT AS n_frames,
       count(*)::BIGINT AS n_sampled,
       count(DISTINCT ph)::BIGINT AS n_distinct_phash
FROM f WHERE fidx % {every_n} = 0
GROUP BY video_id
"""


def video_near_dedup_sql(
    corpus_path: str, threshold: float = 0.5, every_n: int = 1
) -> str:
    """Video near-dup cluster map (pipelines/video.video_near_dedup): exact
    Jaccard >= threshold over each video's DISTINCT sampled-frame phash set,
    then connected components (min-id roots, members of any edge incl.
    roots). Same shape as jaccard_dedup_sql with frame hashes as the set
    elements."""
    return f"""
WITH RECURSIVE f AS (
  SELECT CAST(substr(video_id, 5) AS BIGINT) AS rid,
         unnest(frame_phashes) AS ph,
         generate_subscripts(frame_phashes, 1) - 1 AS fidx
  FROM read_parquet('{corpus_path}')
),
sets AS (SELECT DISTINCT rid, ph FROM f WHERE fidx % {every_n} = 0),
sizes AS (SELECT rid, count(*) AS sz FROM sets GROUP BY rid),
co AS (
  SELECT a.rid AS i, b.rid AS j, count(*) AS co
  FROM sets a JOIN sets b USING (ph) WHERE a.rid > b.rid GROUP BY 1, 2
),
edges AS (
  SELECT co.i AS hi, co.j AS lo
  FROM co JOIN sizes sa ON sa.rid = co.i JOIN sizes sb ON sb.rid = co.j
  WHERE co.co::DOUBLE / (sa.sz + sb.sz - co.co) >= {threshold}
),
{CC_FRAGMENT}
SELECT node AS row_id, cluster_id FROM cc
"""


def audio_window_stats_sql(corpus_path: str) -> str:
    """Per-track window statistics (pipelines/audio.audio_window_stats):
    the pipeline recomputes each window's fingerprint from the raw PCM
    bytes; the oracle reads the generator's ground-truth ``window_hashes``
    list — equality proves the decode+fingerprint path bit-exact."""
    return f"""
SELECT audio_id,
       any_value(n_samples)::BIGINT AS n_samples,
       count(ph)::BIGINT AS n_windows,
       count(DISTINCT ph)::BIGINT AS n_distinct_fp
FROM (
  SELECT audio_id, n_samples, unnest(window_hashes) AS ph
  FROM read_parquet('{corpus_path}')
)
GROUP BY audio_id
"""


def audio_near_dedup_sql(corpus_path: str, threshold: float = 0.5) -> str:
    """Audio near-dup cluster map (pipelines/audio.audio_near_dedup): exact
    Jaccard >= threshold over each track's DISTINCT window-fingerprint set,
    then connected components (min-id roots, members of any edge incl.
    roots)."""
    return f"""
WITH RECURSIVE sets AS (
  SELECT DISTINCT CAST(substr(audio_id, 5) AS BIGINT) AS rid,
         unnest(window_hashes) AS ph
  FROM read_parquet('{corpus_path}')
),
sizes AS (SELECT rid, count(*) AS sz FROM sets GROUP BY rid),
co AS (
  SELECT a.rid AS i, b.rid AS j, count(*) AS co
  FROM sets a JOIN sets b USING (ph) WHERE a.rid > b.rid GROUP BY 1, 2
),
edges AS (
  SELECT co.i AS hi, co.j AS lo
  FROM co JOIN sizes sa ON sa.rid = co.i JOIN sizes sb ON sb.rid = co.j
  WHERE co.co::DOUBLE / (sa.sz + sb.sz - co.co) >= {threshold}
),
{CC_FRAGMENT}
SELECT node AS row_id, cluster_id FROM cc
"""


def dsir_select_sql(
    target_where: str,
    k: int = 100,
    num_buckets: int = 4096,
    smoothing: float = 1.0,
    ngram_max: int = 2,
    round_to: int = 6,
) -> str:
    """DSIR importance-resampling selection (pipelines/dsir.dsir_select):
    hashed unigram(+bigram) count vectors for the TARGET cohort
    (``documents WHERE target_where``) and the RAW corpus (all documents),
    per-bucket llr with add-``smoothing``, per-doc summed weight rounded to
    ``round_to``, global top-``k`` by (weight DESC, doc_id ASC). Gram
    bucket = md5-prefix-64 mod ``num_buckets`` — bit-identical to the
    Python kernel; the llr expression mirrors dsir_llr's float op order
    (divide THEN ln), and ``+ 0.0`` normalizes any -0.0 on both sides."""
    a = repr(float(smoothing))
    nb = repr(float(num_buckets))
    big = (
        """
big AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS g
        FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM tok)),
grams AS (SELECT doc_id, g FROM uni UNION ALL SELECT doc_id, g FROM big),"""
        if ngram_max >= 2
        else """
grams AS (SELECT doc_id, g FROM uni),"""
    )
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
),
uni AS (SELECT doc_id, unnest(ts) AS g FROM tok),{big}
hb AS (
  SELECT doc_id,
         (('0x' || substr(md5(g), 1, 16))::UBIGINT % {num_buckets})::BIGINT AS b
  FROM grams
),
rawc AS (SELECT b, count(*)::BIGINT AS c FROM hb GROUP BY b),
tgtc AS (
  SELECT b, count(*)::BIGINT AS c
  FROM hb JOIN documents USING (doc_id) WHERE {target_where} GROUP BY b
),
rt AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM rawc),
tt AS (SELECT coalesce(sum(c), 0)::BIGINT AS n FROM tgtc),
llr AS (
  SELECT r.b,
         ln((coalesce(t.c, 0) + {a}) / (tt.n + {a} * {nb}))
           - ln((r.c + {a}) / (rt.n + {a} * {nb})) AS w
  FROM rawc r LEFT JOIN tgtc t USING (b) CROSS JOIN rt CROSS JOIN tt
),
sc AS (
  SELECT d.doc_id, round(coalesce(sum(l.w), 0.0), {round_to}) + 0.0 AS dsir_score
  FROM documents d
  LEFT JOIN hb ON hb.doc_id = d.doc_id
  LEFT JOIN llr l ON l.b = hb.b
  GROUP BY d.doc_id
)
SELECT doc_id, dsir_score FROM sc
ORDER BY dsir_score DESC, doc_id ASC LIMIT {k}
"""


def seeded_shuffle_sql(seed: int = 42, rows_per_shard: int = 64) -> str:
    """Deterministic training-export shuffle (pipelines/sample.seeded_shuffle):
    0-based position under (md5-63('seed:'||id) ASC, id ASC) plus the
    pos // rows_per_shard shard assignment — pure integer semantics, no
    float anywhere."""
    h = (
        f"(('0x' || substr(md5('{seed}:' || doc_id::VARCHAR), 1, 16))::UBIGINT"
        " % 9223372036854775808)::BIGINT"
    )
    return f"""
WITH ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY {h}, doc_id) - 1 AS shuffle_pos
  FROM documents
)
SELECT doc_id, shuffle_pos, shuffle_pos // {rows_per_shard} AS shard
FROM ranked
"""


def containment_pairs_sql(
    ngram_size: int = 3, min_length: int = 0, threshold: float = 0.6
) -> str:
    """Asymmetric containment pairs (pipelines/jaccard_dedup.
    ngram_containment_pairs): co / min(|A|, |B|) over distinct shingle
    sets — same grams fragment as the Jaccard oracles."""
    return f"""
WITH {_grams_cte(ngram_size, min_length)},
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS co
  FROM grams a JOIN grams b USING (g) WHERE a.doc_id > b.doc_id GROUP BY 1, 2
)
SELECT co.i AS src, co.j AS dst,
       round(co.co::DOUBLE / least(sa.sz, sb.sz), 4) AS containment
FROM co JOIN sizes sa ON sa.doc_id = co.i JOIN sizes sb ON sb.doc_id = co.j
WHERE co.co::DOUBLE / least(sa.sz, sb.sz) >= {threshold}
"""


def _ed1_pair_ctes(corpus_path: str) -> str:
    """Shared CTEs for token-edit-distance-1 over the pinned image corpus
    captions: the deletion-neighborhood construction is exact (pipelines/
    editdist.py module docstring) — ed=0 is caption equality, one indel is
    deletion-of-longer = shorter, one substitution is same-position
    deletions equal. NB: array_to_string([], ' ') is NULL in DuckDB and
    str_split('', ' ') is [] — the coalesce and the engine's empty-text =
    zero-tokens tokenizer keep both sides identical on degenerate rows."""
    return f"""
t AS (SELECT CAST(substr(image_id, 5) AS BIGINT) AS rid, caption,
             str_split(caption, ' ') AS ts
      FROM read_parquet('{corpus_path}')),
dels AS (SELECT rid, caption, i AS pos,
                coalesce(array_to_string(
                    list_concat(ts[1:i-1], ts[i+1:]), ' '), '') AS k
         FROM t, UNNEST(generate_series(1, len(ts))) AS u(i)),
p0 AS (SELECT a.rid AS src, b.rid AS dst, 0 AS token_ed
       FROM t a JOIN t b ON a.caption = b.caption AND a.rid < b.rid),
pin AS (SELECT DISTINCT least(a.rid, b.rid) AS src,
               greatest(a.rid, b.rid) AS dst, 1 AS token_ed
        FROM dels a JOIN t b ON a.k = b.caption AND a.rid <> b.rid),
psub AS (SELECT DISTINCT least(a.rid, b.rid) AS src,
                greatest(a.rid, b.rid) AS dst, 1 AS token_ed
         FROM dels a JOIN dels b ON a.pos = b.pos AND a.k = b.k
         AND a.rid < b.rid AND a.caption <> b.caption)
"""


def token_ed1_pairs_sql(corpus_path: str) -> str:
    """Member-level (src < dst, token_ed) pair set, ed in {0, 1}
    (pipelines/editdist.token_ed1_pairs)."""
    return f"""
WITH {_ed1_pair_ctes(corpus_path)}
SELECT * FROM p0 UNION SELECT * FROM pin UNION SELECT * FROM psub
"""


def token_ed1_dedup_sql(corpus_path: str) -> str:
    """Cluster map (row_id, cluster_id) over the token-ed<=1 duplicate
    graph (pipelines/editdist.token_ed1_dedup): min-id roots via the
    shared recursive-CTE CC fragment."""
    return f"""
WITH RECURSIVE {_ed1_pair_ctes(corpus_path)},
edges AS (
  SELECT dst AS hi, src AS lo FROM p0
  UNION SELECT dst, src FROM pin UNION SELECT dst, src FROM psub
),
{CC_FRAGMENT}
SELECT node AS row_id, cluster_id FROM cc
"""


def clustering_bcubed_sql(cfg) -> str:
    """B-cubed precision/recall/F1 of the MinHashLSH clustering vs the
    exact identical-text clustering (pipelines/eval_cluster.
    bcubed_components): same label CTEs as clustering_ari_sql, then the
    per-cell nij^2 / cluster-size ratio sums."""
    return f"""
WITH RECURSIVE {_minhash_core(cfg, "documents")},
la AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS a
  FROM docs d LEFT JOIN cc ON cc.node = d.doc_id
),
lb AS (
  SELECT t.doc_id, min(t.doc_id) OVER (PARTITION BY t.text) AS b
  FROM documents t JOIN docs USING (doc_id)
),
labels AS (SELECT la.a, lb.b FROM la JOIN lb USING (doc_id)),
cont AS (SELECT a, b, count(*)::BIGINT AS nij FROM labels GROUP BY a, b),
asum AS (SELECT a, sum(nij)::BIGINT AS ca FROM cont GROUP BY a),
bsum AS (SELECT b, sum(nij)::BIGINT AS cb FROM cont GROUP BY b),
comp AS (
  SELECT
    (SELECT coalesce(sum(nij), 0)::BIGINT FROM cont) AS n_items,
    (SELECT coalesce(sum(nij * nij::DOUBLE / ca), 0)
     FROM cont JOIN asum USING (a)) AS ps,
    (SELECT coalesce(sum(nij * nij::DOUBLE / cb), 0)
     FROM cont JOIN bsum USING (b)) AS rs
)
SELECT n_items,
  round(ps / n_items, 6) AS bcubed_precision,
  round(rs / n_items, 6) AS bcubed_recall,
  round(2 * (ps / n_items) * (rs / n_items)
        / ((ps / n_items) + (rs / n_items)), 6) AS bcubed_f1
FROM comp
"""
