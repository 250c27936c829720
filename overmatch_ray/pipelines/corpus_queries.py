"""Text / embedding / spatial-formula queries (the training-data-pipeline
operator families), SQL-oracled where DuckDB can express the semantics.

Spatial queries derive lon/lat from integer keys with pure int arithmetic
(`lon = -77.05 + (key % 1000)·1e-4`, `lat = 38.85 + ((key//1000) % 1000)·1e-4`)
so the DuckDB oracle reproduces coordinates bit-exactly, then both sides
apply the same EPSG:3857 formulas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources import read_parquet_clean as _rpq
from ray.data.aggregate import Count

from .queries import ORACLE_SQL, _read

_MERC = "6378137.0"


def _distinct_users(d):
    """Bucketed DISTINCT on user_id: per-user groups are corpus-scale, so
    the native groupby().count() reduce would pay ~30 us of Python per
    group (groupops.bucketed_aggregate note); one vectorized
    drop_duplicates per hash bucket instead."""
    from ..stages.groupops import bucketed_group_apply

    return bucketed_group_apply(
        d, ["user_id"], lambda g: g.drop_duplicates("user_id")
    )


def _formula_coords(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    key = key.astype(np.int64)
    lon = -77.05 + (key % 1000).astype(np.float64) * 1e-4
    lat = 38.85 + ((key // 1000) % 1000).astype(np.float64) * 1e-4
    return lon, lat


_COORD_SQL = (
    "-77.05 + ({k} % 1000) * 1e-4 AS lon, "
    "38.85 + (({k} // 1000) % 1000) * 1e-4 AS lat"
)


# ---------------------------------------------------------------------------
# text stats
# ---------------------------------------------------------------------------


def q_token_counts(sf_dir: str):
    from ..stages.textstats import token_count_batch

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(token_count_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
    )


ORACLE_SQL["token_counts"] = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def q_subword_counts(sf_dir: str):
    """BPE-ish subword-unit counts (stages.textstats.subword_count_batch —
    one RE2 match-count kernel per batch; both engines run RE2 on the
    same pattern, so parity is exact by construction)."""
    from ..stages.textstats import subword_count_batch

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(subword_count_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_subwords"])
    )


def _subword_oracle_sql() -> str:
    from ..stages.textstats import BPE_SPLIT_PATTERN

    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_subwords
FROM documents
"""


ORACLE_SQL["subword_counts"] = _subword_oracle_sql()


def q_doc_quality(sf_dir: str):
    from ..stages.textstats import quality_batch

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(quality_batch, batch_format="pyarrow")
        .select_columns(
            ["doc_id", "n_tokens", "mean_token_len", "stopword_ratio", "quality_keep"]
        )
    )


ORACLE_SQL["doc_quality"] = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         list_sum(list_transform(toks, x -> length(x))) * 1.0
             / greatest(len(toks), 1) AS mlen,
         len(list_filter(toks,
             x -> x IN ('the','a','of','to','and','in','is','it'))) * 1.0
             / greatest(len(toks), 1) AS sratio
  FROM t)
SELECT doc_id, n_tokens,
       round(mlen, 6) AS mean_token_len,
       round(sratio, 6) AS stopword_ratio,
       (n_tokens >= 10 AND mlen >= 2.0 AND mlen <= 12.0 AND sratio <= 0.5)
           AS quality_keep
FROM s
"""


def q_copurchase_lift(sf_dir: str):
    """Market-basket association mining
    (stages.groupops.association_pairs): part pairs co-occurring in ≥ 2
    orders, scored by lift, top-100 — rounded-lift ordering with a pair
    tie-break so both engines sort identical keys."""
    from ..stages.groupops import association_pairs

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return association_pairs(
        li, "l_orderkey", "l_partkey", min_support=2, k=100
    )


ORACLE_SQL["copurchase_lift"] = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS nb FROM li),
m AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY 1),
pairs AS (
  SELECT a.p AS item_a, b.p AS item_b, CAST(count(*) AS BIGINT) AS support
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT item_a, item_b, support,
       round(CAST(nb AS DOUBLE) * support
             / (CAST(ma.c AS DOUBLE) * CAST(mb.c AS DOUBLE)), 6) AS lift
FROM pairs
CROSS JOIN n
JOIN m ma ON ma.p = item_a
JOIN m mb ON mb.p = item_b
ORDER BY lift DESC, item_a, item_b
LIMIT 100
"""


def q_quality_prune(sf_dir: str):
    """Calibrated quality pruning (stages.groupops.filter_by_group_quantile):
    keep documents at or above their OWN language's median token count —
    the per-domain-threshold move that stops a global length cut from
    wiping out short-form languages. Integer scores make the interpolated
    threshold exact in float64, so the boundary compare is bit-stable vs
    quantile_cont."""
    from ..stages.groupops import filter_by_group_quantile
    from ..stages.textstats import token_count_batch

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    with_tok = docs.map_batches(
        lambda b: token_count_batch(b).select(["doc_id", "lang", "n_tokens"]),
        batch_format="pyarrow",
    )
    return filter_by_group_quantile(with_tok, "lang", "n_tokens", 0.5)


ORACLE_SQL["quality_prune"] = """
WITH tok AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
thr AS (SELECT lang, quantile_cont(n_tokens, 0.5) AS q FROM tok GROUP BY 1)
SELECT tok.doc_id, tok.lang, tok.n_tokens
FROM tok JOIN thr USING (lang)
WHERE tok.n_tokens >= thr.q
"""


def q_lang_distribution(sf_dir: str):
    return _read(sf_dir, "documents", ["lang"]).groupby("lang").aggregate(
        Count(alias_name="n")
    )


ORACLE_SQL["lang_distribution"] = """
SELECT lang, count(*) AS n FROM documents GROUP BY 1
"""


def q_prefix_dedup(sf_dir: str):
    """Exact dedup on the first-8-token prefix key (D-family)."""
    from ..stages.dedup import exact_dedup
    from ..stages.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )
    out = exact_dedup(ds, "prefix_key")
    return out.map_batches(
        lambda b: pa.table(
            {
                "prefix_key": b["prefix_key"],
                "keep_id": b["doc_id"],
                "dup_count": b["dup_count"],
            }
        ),
        batch_format="pyarrow",
    )


ORACLE_SQL["prefix_dedup"] = """
SELECT array_to_string(string_split(text, ' ')[1:8], ' ') AS prefix_key,
       min(doc_id) AS keep_id,
       count(*) - 1 AS dup_count
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (EXACT, oracle-checked)
# ---------------------------------------------------------------------------

_NEARDUP_THRESHOLD = 0.6


def _derived_corpus(sf_dir: str):
    """documents ∪ perturbed copies (doc_id+100000, one appended token) —
    a deterministic corpus that actually CONTAINS near-duplicates."""
    base = _read(sf_dir, "documents", ["doc_id", "text"])

    def perturb(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch["doc_id"], pa.scalar(40))
        f = batch.filter(mask)
        return pa.table(
            {
                "doc_id": pc.add(f["doc_id"], pa.scalar(100000, pa.int64())),
                "text": pa.array(
                    [t + " xtra token" for t in f["text"].to_pylist()], pa.string()
                ),
            }
        )

    return base.union(base.map_batches(perturb, batch_format="pyarrow"))


def q_segment_dedup(sf_dir: str):
    """Sub-document exact dedup (stages.dedup.segment_dedup): C4-style
    line dedup adapted to a delimiter-free corpus — non-overlapping
    5-token segments, first occurrence (doc, position) wins, partial
    tails always survive, documents reassembled from survivors. Run over
    the derived corpus (which actually contains duplicates): a perturbed
    copy keeps only the segments its extra token shifted off the
    originals' grid."""
    from ..stages.dedup import segment_dedup

    return segment_dedup(_derived_corpus(sf_dir), "text", "doc_id", window=5)


ORACLE_SQL["segment_dedup"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' xtra token' FROM documents WHERE doc_id < 40),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM corpus),
segs AS (
  SELECT doc_id, pos // 5 AS seg_idx, count(*) AS n,
         string_agg(tok, ' ' ORDER BY pos) AS seg
  FROM toks GROUP BY doc_id, pos // 5),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY seg
                               ORDER BY doc_id, seg_idx) AS rn
  FROM segs WHERE n = 5),
kept AS (
  SELECT doc_id, seg_idx, seg FROM ranked WHERE rn = 1
  UNION ALL
  SELECT doc_id, seg_idx, seg FROM segs WHERE n < 5)
SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
FROM kept GROUP BY doc_id
"""


def q_source_dedup_stats(sf_dir: str):
    """Cross-source duplicate-leakage matrix — the dedup-POLICY readout a
    curator needs before picking a keep rule: for every unordered source
    pair, how many exact near-dup pairs span it (how much of source A is
    already inside source B). Rides the oracled exact pair graph and the
    shared attach_pair_payload scaffold (payload = the 1-column source
    tag, semi-filtered to candidate docs before the attach joins), then
    one bounded-domain groupby (|sources|² cells). The derived corpus's
    perturbed copies inherit their base doc's source."""
    from ray.data.aggregate import Count

    from ..stages.dedup import attach_pair_payload, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _derived_corpus(sf_dir), threshold=_NEARDUP_THRESHOLD, k=3
    ).materialize()
    if pairs.count() == 0:
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "source_lo": pa.array([], pa.string()),
            "source_hi": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
        }))

    base = _read(sf_dir, "documents", ["doc_id", "source"])

    def perturb_src(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.less(batch["doc_id"], pa.scalar(40)))
        return pa.table({
            "doc_id": pc.add(f["doc_id"], pa.scalar(100000, pa.int64())),
            "source": f["source"],
        })

    # materialize the union boundary before the attach scaffold's
    # all-to-alls (the two-branch-union livelock rule)
    src = base.union(
        base.map_batches(perturb_src, batch_format="pyarrow")
    ).materialize()

    withsrc = attach_pair_payload(pairs, src)

    def canon(batch: pa.Table) -> pa.Table:
        sa = np.asarray(batch["source_a"].to_pylist())
        sb = np.asarray(batch["source_b"].to_pylist())
        le = sa <= sb  # np.minimum has no unicode loop; where() does
        return pa.table({
            "source_lo": pa.array(np.where(le, sa, sb)),
            "source_hi": pa.array(np.where(le, sb, sa)),
        })

    return (
        withsrc.map_batches(canon, batch_format="pyarrow")
        .groupby(["source_lo", "source_hi"])
        .aggregate(Count(alias_name="n_pairs"))
        .map_batches(
            lambda b: pa.table({
                "source_lo": b["source_lo"],
                "source_hi": b["source_hi"],
                "n_pairs": b["n_pairs"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


def q_ngram_neardup_pairs(sf_dir: str):
    from ..stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _derived_corpus(sf_dir), threshold=_NEARDUP_THRESHOLD, k=3
    )


def q_ngram_dedup_clusters(sf_dir: str):
    """Near-dup clusters: connected components (min-label propagation) over
    the exact n-gram Jaccard pair graph — the keep-one-per-cluster step."""
    from ..stages.dedup import dedup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _derived_corpus(sf_dir), threshold=_NEARDUP_THRESHOLD, k=3
    )
    return dedup_clusters(pairs)


ORACLE_SQL["ngram_dedup_clusters"] = """
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' xtra token' FROM documents WHERE doc_id < 40),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM corpus),
sh AS (
  SELECT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM shared
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.6),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
reach(id, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, reach.lbl FROM edges e JOIN reach ON reach.id = e.v)
SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id
"""


ORACLE_SQL["ngram_neardup_pairs"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' xtra token' FROM documents WHERE doc_id < 40),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM corpus),
sh AS (
  SELECT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, shared,
       round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.6
"""


def q_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup with EXACT verification — the two-phase
    propose/verify join (banding finds candidates sub-quadratically,
    ``stages.dedup.verify_pairs_exact`` confirms them with the real
    shingle intersection). Banding recall completeness at the threshold
    on this corpus is PINNED by the shared hash oracle: the verified
    output equals the exact ``ngram_neardup_pairs`` result, column for
    column, value for value."""
    from ..stages.dedup import minhash_lsh_verified

    return minhash_lsh_verified(
        _derived_corpus(sf_dir), threshold=_NEARDUP_THRESHOLD, k=3
    )


ORACLE_SQL["minhash_pairs"] = ORACLE_SQL["ngram_neardup_pairs"]

# rows_only.q_video_shot_cuts: the planted-scene-cut structure oracle —
# the detector must recover exactly these positions from decoded pixels
# (the phash_dedup deterministic-synth trick extended to video).
ORACLE_SQL["video_shot_cuts"] = """
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 100)
SELECT 'vid-' || CAST(doc_id AS VARCHAR) AS video_id,
       CAST(3 + doc_id % 4 AS BIGINT) AS cut_frame
FROM ids
UNION ALL
SELECT 'vid-' || CAST(doc_id AS VARCHAR),
       CAST(8 + doc_id % 3 AS BIGINT)
FROM ids
"""


# q_source_dedup_stats: the exact pair oracle reused verbatim, each side
# joined to its source (perturbed copies inherit their base's source),
# counted per unordered source pair.
ORACLE_SQL["source_dedup_stats"] = f"""
WITH pairs AS ({ORACLE_SQL["ngram_neardup_pairs"]}),
src AS (SELECT doc_id, source FROM documents
        UNION ALL
        SELECT doc_id + 100000, source FROM documents WHERE doc_id < 40)
SELECT least(sa.source, sb.source) AS source_lo,
       greatest(sa.source, sb.source) AS source_hi,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN src sa ON sa.doc_id = pairs.id_a
JOIN src sb ON sb.doc_id = pairs.id_b
GROUP BY 1, 2
"""


def q_simhash_dup_pairs(sf_dir: str):
    """Exact token-multiset duplicate pairs via SimHash blocking
    (stages.dedup.simhash_dup_pairs): the order-insensitive 64-bit code
    gives complete recall by construction, the canonical sorted-token
    string verify gives exact precision — so the SimHash machinery gets
    a FULL DuckDB oracle (group docs on their sorted token list). The
    corpus plants 30 EXACT copies (doc_id+200000) next to the 40
    perturbed near-dups, so the dup-pair set is non-trivial and the
    near-dups prove the verify rejects the perturbed texts."""
    from ..stages.dedup import simhash_dup_pairs

    base = _read(sf_dir, "documents", ["doc_id", "text"])

    def exact_copy(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.less(batch["doc_id"], pa.scalar(30)))
        return pa.table({
            "doc_id": pc.add(f["doc_id"], pa.scalar(200000, pa.int64())),
            "text": f["text"],
        })

    corpus = _derived_corpus(sf_dir).union(
        base.map_batches(exact_copy, batch_format="pyarrow")
    )
    return simhash_dup_pairs(corpus)


ORACLE_SQL["simhash_dup_pairs"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' xtra token' FROM documents
  WHERE doc_id < 40
  UNION ALL
  SELECT doc_id + 200000, text FROM documents
  WHERE doc_id < 30),
c AS (
  SELECT doc_id,
         array_to_string(list_sort(string_split(text, ' ')), ' ') AS canon
  FROM corpus)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM c a JOIN c b ON a.canon = b.canon AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# BPE train + apply — full SQL oracle via unrolled MATERIALIZED merge rounds
# ---------------------------------------------------------------------------

_BPE_MERGES = 12
_BPE_MIN_FREQ = 2


def _bpe_oracle_ctes(n_merges: int = _BPE_MERGES,
                     min_freq: int = _BPE_MIN_FREQ) -> str:
    """The WITH-clause body that replays ``stages.textstats.bpe_train``
    in SQL: distinct-word table → char-spaced segmentation → per round a
    weighted adjacent-pair count, the (count desc, pair lex) argmax, and
    a non-overlapping left-to-right merge application. The merge replace
    uses the doubled-space trick (every adjacent pair gets its own
    delimiters) with a PLAIN replace — byte-equivalent to the trainer's
    lookaround regex, with no pattern-escaping hazard. MATERIALIZED CTEs
    throughout (CLAUDE.md DuckDB rule: unrolled iterations explode
    ~4^rounds when inlined)."""
    parts = [f"""words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word),
seg_0 AS MATERIALIZED (
  SELECT array_to_string(string_split(word, ''), ' ') AS seg, freq
  FROM words)"""]
    for i in range(n_merges):
        parts.append(f""",
pairs_{i} AS MATERIALIZED (
  SELECT l, r, CAST(sum(freq) AS BIGINT) AS c
  FROM (
    SELECT sym AS l, lead(sym) OVER (PARTITION BY seg ORDER BY pos) AS r,
           freq
    FROM (SELECT seg, freq,
                 unnest(string_split(seg, ' ')) AS sym,
                 generate_subscripts(string_split(seg, ' '), 1) AS pos
          FROM seg_{i}))
  WHERE r IS NOT NULL GROUP BY l, r),
best_{i} AS MATERIALIZED (
  SELECT CAST({i} AS BIGINT) AS rank, l, r, c FROM pairs_{i}
  WHERE c >= {min_freq} ORDER BY c DESC, l, r LIMIT 1),
seg_{i + 1} AS MATERIALIZED (
  SELECT CASE WHEN (SELECT count(*) FROM best_{i}) = 0 THEN seg
    ELSE trim(regexp_replace(replace(
      ' ' || replace(seg, ' ', '  ') || ' ',
      ' ' || (SELECT l FROM best_{i}) || '  ' || (SELECT r FROM best_{i})
          || ' ',
      ' ' || (SELECT l FROM best_{i}) || (SELECT r FROM best_{i}) || ' '),
      ' +', ' ', 'g')) END AS seg, freq
  FROM seg_{i})""")
    return "".join(parts)


def q_bpe_token_counts(sf_dir: str):
    """Tokenizer APPLY: per-document BPE token counts under the same
    12-merge tokenizer ``bpe_merges`` trains — train once, broadcast the
    rank map, encode each DISTINCT word once (vocabulary-bounded), then
    a bucketed word join + per-doc sum (stages.textstats.bpe_encode).
    SQL-oracled: the oracle replays the full train+apply in unrolled
    MATERIALIZED CTEs (merging ranks in increasing order globally is
    equivalent to the canonical lowest-rank-first apply, because a pair
    learned at rank r can only contain symbols formed before r)."""
    from ..stages.textstats import bpe_encode, bpe_train

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    merges = bpe_train(docs, "text", n_merges=_BPE_MERGES,
                       min_freq=_BPE_MIN_FREQ)
    return bpe_encode(docs, "text", "doc_id", merges)


ORACLE_SQL["bpe_token_counts"] = f"""
WITH {_bpe_oracle_ctes()},
vocab AS MATERIALIZED (
  SELECT replace(seg, ' ', '') AS word,
         CAST(len(string_split(seg, ' ')) AS BIGINT) AS ntok
  FROM seg_{_BPE_MERGES}),
docw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT d.doc_id, CAST(coalesce(sum(v.ntok), 0) AS BIGINT) AS n_bpe_tokens
FROM documents d
LEFT JOIN (SELECT doc_id, word FROM docw WHERE word <> '') w
  ON w.doc_id = d.doc_id
LEFT JOIN vocab v ON v.word = w.word
GROUP BY d.doc_id
"""

ORACLE_SQL["bpe_merges"] = f"""
WITH {_bpe_oracle_ctes()}
SELECT rank, l AS "left", r AS "right", c AS pair_count
FROM ({" UNION ALL ".join(f"SELECT * FROM best_{i}" for i in range(_BPE_MERGES))})
"""


# ---------------------------------------------------------------------------
# deterministic-synth structure oracles (image corpus) + HLL constant pin
# ---------------------------------------------------------------------------


def q_phash_dedup(sf_dir: str):
    """D4: exact perceptual-hash dedup of the image corpus — one row per
    distinct phash (deterministic min-id representative + dup_count),
    projected to the SQL-derivable columns. The oracle replays the
    synth's planted-duplicate structure (every 17th image re-renders its
    predecessor — keep in sync with synth.images_block): identical
    pixels ⇒ identical phash, and a cross-content phash collision would
    fail the hash compare loudly."""
    from ..stages.images import dedup_exact
    from .rows_only import _images_ds

    out = dedup_exact(_images_ds(sf_dir))
    return out.map_batches(
        lambda b: pa.table(
            {"image_id": b["image_id"], "dup_count": b["dup_count"]}
        ),
        batch_format="pyarrow",
    )


ORACLE_SQL["phash_dedup"] = """
WITH g AS (
  SELECT doc_id AS i,
         CASE WHEN doc_id % 17 = 0 AND doc_id > 0 THEN doc_id - 1
              ELSE doc_id END AS content
  FROM documents)
SELECT 'img-' || printf('%012d', min(i)) AS image_id,
       CAST(count(*) - 1 AS BIGINT) AS dup_count
FROM g GROUP BY content
"""


def q_caption_consistency(sf_dir: str):
    """Cross-modal QA: duplicate-pixel image groups (same phash) with
    caption agreement stats (stages.images.caption_consistency),
    projected to the SQL-derivable columns. Oracle = the synth's planted
    structure: dup groups are {i−1, i} for i ≡ 0 (mod 17), and the
    mirror keeps its predecessor's caption only when i ≡ 0 (mod 34)
    (keep in sync with synth.images_block)."""
    from ..stages.images import caption_consistency
    from .rows_only import _images_ds

    out = caption_consistency(_images_ds(sf_dir))
    return out.map_batches(
        lambda b: pa.table({
            "image_id": b["image_id"],
            "n_images": b["n_images"],
            "n_captions": b["n_captions"],
            "consistent": b["consistent"],
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["caption_consistency"] = """
SELECT 'img-' || printf('%012d', doc_id - 1) AS image_id,
       CAST(2 AS BIGINT) AS n_images,
       CAST(CASE WHEN doc_id % 34 = 0 THEN 1 ELSE 2 END AS BIGINT)
         AS n_captions,
       (doc_id % 34 = 0) AS consistent
FROM documents
WHERE doc_id % 17 = 0 AND doc_id > 0
"""


def q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate distinct counts over the events table
    (stages.groupops.approx_distinct — fixed 2^12-register partials per
    batch, registers not rows cross the shuffle; ~1.6% standard error).
    The estimator is a DETERMINISTIC function of the input, so its exact
    outputs are pinned as a constant-compare oracle keyed on the corpus
    size (the r4 VERDICT's suggested form for sketch queries)."""
    from ..stages.groupops import approx_distinct

    rows = []
    for col in ("user_id", "event_id"):
        ds = _rpq(f"{sf_dir}/events.parquet", columns=[col])
        rows.append({"column": col, "n_distinct_est": approx_distinct(ds, col)})
    return pa.Table.from_pylist(rows)


# constant pin: deterministic HLL estimates per corpus size (sf 0.001 /
# 0.01 / 0.1); an unknown corpus size yields zero oracle rows → loud
# row-count mismatch rather than a silent pass
ORACLE_SQL["approx_distinct"] = """
WITH n AS (SELECT count(*) AS c FROM events)
SELECT v.col AS "column", CAST(v.est AS BIGINT) AS n_distinct_est
FROM (VALUES
  (1000,   'user_id', 15),   (1000,   'event_id', 998),
  (10000,  'user_id', 150),  (10000,  'event_id', 10303),
  (100000, 'user_id', 1500), (100000, 'event_id', 98917)
) AS v(rows, col, est), n
WHERE v.rows = n.c
"""


def q_approx_common_users(sf_dir: str):
    """HLL SKETCH ALGEBRA: approximate |clickers ∩ buyers| by
    inclusion-exclusion over three HyperLogLog estimates (|A| + |B| −
    |A∪B|; union = HLL over the concatenated streams — sketch union is
    exact for HLL). The scale path beside the exact shuffled-semi-join
    INTERSECT (`click_purchase_users`): registers, never user ids, cross
    the wire. Deterministic → constant-pin oracle keyed on corpus size
    (same form as `approx_distinct`); the relative-error bound vs the
    exact count is additionally test-pinned."""
    from ..stages.groupops import approx_distinct

    ev = _rpq(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def side(t):
        return ev.filter(expr=f"event_type == '{t}'")

    clicks = side("click")
    buys = side("purchase")
    a = approx_distinct(clicks, "user_id")
    b = approx_distinct(buys, "user_id")
    u = approx_distinct(clicks.union(buys), "user_id")
    est = max(0, a + b - u)
    return pa.table({
        "est_clickers": pa.array([a], pa.int64()),
        "est_buyers": pa.array([b], pa.int64()),
        "est_union": pa.array([u], pa.int64()),
        "est_common_users": pa.array([est], pa.int64()),
    })


ORACLE_SQL["approx_common_users"] = """
WITH n AS (SELECT count(*) AS c FROM events)
SELECT CAST(v.a AS BIGINT) AS est_clickers,
       CAST(v.b AS BIGINT) AS est_buyers,
       CAST(v.u AS BIGINT) AS est_union,
       CAST(v.a + v.b - v.u AS BIGINT) AS est_common_users
FROM (VALUES
  (1000, 15, 15, 15), (10000, 150, 150, 150), (100000, 1500, 1500, 1500)
) AS v(rows, a, b, u), n
WHERE v.rows = n.c
"""


# constant pin for rows_only.q_type_distinct_users (grouped HLL — a
# deterministic function of the corpus): at these cardinalities the
# p=12 estimator is in its linear-counting regime, so each event type's
# estimate lands exactly on the true per-type distinct-user count.
# Keyed on corpus size; an unknown size yields zero oracle rows → loud
# row-count mismatch rather than a silent pass.
ORACLE_SQL["type_distinct_users"] = """
WITH n AS (SELECT count(*) AS c FROM events)
SELECT t.event_type AS event_type,
       CAST(v.est AS BIGINT) AS n_distinct_est
FROM (VALUES (1000, 15), (10000, 150), (100000, 1500)) AS v(rows, est),
     n,
     (SELECT DISTINCT event_type FROM events) AS t
WHERE v.rows = n.c
"""


# constant pin for rows_only.q_embedding_norm_quantiles (deterministic
# histogram-sketch quantiles): the synth embeddings are L2-normalized,
# so every norm is 1.0 and the sketch must return EXACTLY 1.0 at every
# p — a bin-midpoint or edge-interpolation bug would miss it. The pin
# is corpus-size-independent because the value column is constant.
ORACLE_SQL["embedding_norm_quantiles"] = """
SELECT CAST(v.p AS DOUBLE) AS p, CAST(v.q AS DOUBLE) AS q
FROM (VALUES (0.05, 1.0), (0.5, 1.0), (0.95, 1.0)) AS v(p, q)
"""


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------


def q_knn_topk(sf_dir: str):
    from ..stages.knn import brute_force_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = pa.concat_tables(
        [pa.table(b) for b in emb.filter(expr="vec_id < 10").iter_batches(
            batch_format="pyarrow")]
    )
    out = brute_force_topk(emb, queries, k=5)
    return out.select_columns(["query_id", "neighbor_id", "rank", "cos_sim"])


ORACLE_SQL["knn_topk"] = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cs
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.qid)
SELECT query_id, neighbor_id, rank, round(cs, 6) AS cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cs DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


_EXACT_NEARDUP_MAX_ROWS = 200_000


class _ExactNearDupPairs:
    """Actor-pool body for the exact near-dup oracle: assembles the corpus
    (ids, unit matrix) ONCE per worker in __init__ from object-store block
    refs (zero-copy reads of co-located Arrow blocks — the corpus is never
    concatenated on the driver), then scores each batch against it."""

    def __init__(self, refs: list, threshold: float):
        import ray

        from ..stages.knn import _normalize, _to_matrix

        blocks = ray.get(refs)
        t = pa.concat_tables(
            [b if isinstance(b, pa.Table) else pa.table(b) for b in blocks]
        )
        self.ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
        self.m = _normalize(_to_matrix(t["embedding"]))
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.knn import _normalize, _to_matrix

        bm = _normalize(_to_matrix(batch["embedding"]))
        bids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        sims = bm @ self.m.T
        ia, ib = np.nonzero(
            (sims >= self.threshold) & (bids[:, None] < self.ids[None, :])
        )
        return pa.table(
            {
                "id_a": pa.array(bids[ia]),
                "id_b": pa.array(self.ids[ib]),
                "cos_sim": pa.array(np.round(sims[ia, ib], 6)),
            }
        )


def q_embedding_neardup(sf_dir: str):
    """EXACT cosine near-dup pairs ≥ 0.4 (a < b) — the sf0.01 oracle
    counterpart of the LSH scale path ``stages.knn.near_dup_embeddings``.
    Quadratic by definition, so it is hard-bounded: corpora beyond
    ``_EXACT_NEARDUP_MAX_ROWS`` must use ``near_dup_embeddings``. The
    corpus matrix is built inside the actor pool from materialized block
    refs, not on the driver."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    total = emb.count()
    if total > _EXACT_NEARDUP_MAX_ROWS:
        raise ValueError(
            f"q_embedding_neardup is the exact O(N²) oracle path, bounded at "
            f"{_EXACT_NEARDUP_MAX_ROWS} rows (got {total}); use "
            "stages.knn.near_dup_embeddings for real corpora."
        )
    refs = [r for b in emb.iter_internal_ref_bundles() for r in b.block_refs]
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return emb.map_batches(
        _ExactNearDupPairs,
        fn_constructor_kwargs={"refs": refs, "threshold": 0.4},
        batch_format="pyarrow",
        concurrency=(1, max(1, min(8, cpus - 1))),
    )


ORACLE_SQL["embedding_neardup"] = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


# ---------------------------------------------------------------------------
# spatial-formula queries (cell index / distance join / tiling)
# ---------------------------------------------------------------------------


def q_cell_assign(sf_dir: str):
    """Grid-cell occupancy of formula-derived customer points — the cell
    kernel with a pure-SQL oracle."""
    ds = _read(sf_dir, "customer", ["c_custkey"])

    def cells(batch: pa.Table) -> pa.Table:
        from ..geo import mercator_xy

        lon, lat = _formula_coords(
            batch["c_custkey"].to_numpy(zero_copy_only=False)
        )
        x, y = mercator_xy(lon, lat)
        return pa.table(
            {
                "cell_x": pa.array(np.floor(x / 256.0).astype(np.int64)),
                "cell_y": pa.array(np.floor(y / 256.0).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["cell_x", "cell_y"])
        .aggregate(Count(alias_name="n"))
    )


ORACLE_SQL["cell_assign"] = f"""
WITH pts AS (
  SELECT {_COORD_SQL.format(k='c_custkey')} FROM customer),
proj AS (
  SELECT CAST(floor({_MERC} * radians(lon) / 256.0) AS BIGINT) AS cell_x,
         CAST(floor({_MERC} * ln(tan(pi()/4 + radians(lat)/2)) / 256.0) AS BIGINT)
             AS cell_y
  FROM pts)
SELECT cell_x, cell_y, count(*) AS n FROM proj GROUP BY 1, 2
"""


def q_distance_join_100m(sf_dir: str):
    """Bounded-radius spatial join with a SQL oracle: customer points vs
    thinned order points, planar EPSG:3857 distance ≤ 100 m — executed with
    the engine's cell co-shuffle (k-ring replication), checked by DuckDB's
    inequality join."""
    from ..cell import cell_id, kring1_cells
    from ..geo import mercator_xy

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def probe(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy(zero_copy_only=False)
        lon, lat = _formula_coords(key)
        x, y = mercator_xy(lon, lat)
        cell = cell_id(x, y)
        return pa.table(
            {
                "id": pa.array(key.astype(np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
                "cell": pa.array(cell.view(np.int64)),
                "side": pa.array(np.zeros(len(key), np.int8)),
            }
        )

    def index_side(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = key[key % 4 == 0]
        lon, lat = _formula_coords(key)
        x, y = mercator_xy(lon, lat)
        cells = kring1_cells(cell_id(x, y)).ravel()
        rep = np.repeat(np.arange(key.size), 9)
        return pa.table(
            {
                "id": pa.array(key[rep]),
                "x": pa.array(x[rep]),
                "y": pa.array(y[rep]),
                "cell": pa.array(cells.view(np.int64)),
                "side": pa.array(np.ones(rep.size, np.int8)),
            }
        )

    # union→all-to-all boundary materialized (CLAUDE.md livelock rule)
    both = cust.map_batches(probe, batch_format="pyarrow").union(
        orders.map_batches(index_side, batch_format="pyarrow")
    ).materialize()

    def bucketize(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((cell.view(np.uint64) % np.uint64(32)).astype(np.int64))
        )

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow in/out (VERDICT r4 #4): numpy views straight off the
        # Arrow block, no pandas frame per bucket
        from ..stages.groupops import concat_ranges

        side = g["side"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = g["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        a_idx = np.flatnonzero(side == 0)
        b_idx = np.flatnonzero(side != 0)
        # typed empty: untyped [] columns become null-typed Arrow blocks
        # and trip the executor's schema-divergence warning
        empty = pa.table({
            "cust_id": pa.array([], pa.int64()),
            "order_id": pa.array([], pa.int64()),
            "dist_m": pa.array([], pa.float64()),
        })
        if a_idx.size == 0 or b_idx.size == 0:
            return empty
        bo = b_idx[np.argsort(cells[b_idx], kind="mergesort")]
        bc = cells[bo]
        lo = np.searchsorted(bc, cells[a_idx], "left")
        hi = np.searchsorted(bc, cells[a_idx], "right")
        counts = hi - lo
        if not counts.sum():
            return empty
        ai = np.repeat(a_idx, counts)
        bi = bo[concat_ranges(lo, hi)]
        d = np.sqrt((x[ai] - x[bi]) ** 2 + (y[ai] - y[bi]) ** 2)  # SQL form
        m = d <= 100.0
        return pa.table(
            {
                "cust_id": pa.array(ids[ai][m]),
                "order_id": pa.array(ids[bi][m]),
                "dist_m": pa.array(np.round(d[m], 1)),
            }
        )

    return (
        both.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


ORACLE_SQL["distance_join_100m"] = f"""
WITH a AS (
  SELECT c_custkey AS id, {_MERC} * radians(-77.05 + (c_custkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((c_custkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM customer),
b AS (
  SELECT o_orderkey AS id, {_MERC} * radians(-77.05 + (o_orderkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((o_orderkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM orders WHERE o_orderkey % 4 = 0)
SELECT a.id AS cust_id, b.id AS order_id,
       round(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 1) AS dist_m
FROM a JOIN b
  ON b.x BETWEEN a.x - 100 AND a.x + 100
 AND b.y BETWEEN a.y - 100 AND a.y + 100
WHERE sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= 100
"""


def q_track_resample(sf_dir: str):
    """Track temporal resampling (stages.spatial.resample_tracks): each
    user's ping track interpolated onto the daily grid strictly inside
    its span — integer-µs timestamps and integer lattice coordinates make
    the frac/interp chain bit-identical to the SQL oracle (one division,
    one multiply, one add, authored in the same order)."""
    from ..stages.spatial import resample_tracks

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tu = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "user_id": batch["user_id"],
            "tu": tu,
            "event_id": batch["event_id"],
            "x": pa.array((11 * (eid % 1000)).astype(np.float64)),
            "y": pa.array((14 * ((eid // 1000) % 1000)).astype(np.float64)),
        })

    out = resample_tracks(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id", "tu", "x", "y",
        step_us=86_400_000_000, tiebreak_col="event_id",
    )
    return out.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "t": b["t"].cast(pa.int64()),
            "x_i": b["x_i"], "y_i": b["y_i"],
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["track_resample"] = """
WITH pings AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
         CAST(11 * (event_id % 1000) AS DOUBLE) AS x,
         CAST(14 * ((event_id // 1000) % 1000) AS DOUBLE) AS y
  FROM events),
spans AS (
  SELECT user_id, tu AS t0, x AS x0, y AS y0,
         lead(tu) OVER w AS t1, lead(x) OVER w AS x1, lead(y) OVER w AS y1
  FROM pings WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
bounds AS (SELECT user_id, min(tu) AS mn, max(tu) AS mx
           FROM pings GROUP BY 1),
grid AS (
  SELECT user_id,
         unnest(range(((mn + 86399999999) // 86400000000) * 86400000000,
                      mx, 86400000000)) AS t
  FROM bounds WHERE mx > mn),
hit AS (
  SELECT g.user_id, g.t, s.t0, s.t1, s.x0, s.y0, s.x1, s.y1,
         CAST(g.t - s.t0 AS DOUBLE) / CAST(s.t1 - s.t0 AS DOUBLE) AS frac
  FROM grid g JOIN spans s
    ON s.user_id = g.user_id AND g.t >= s.t0 AND g.t < s.t1)
SELECT user_id, t,
       x0 + (x1 - x0) * frac AS x_i,
       y0 + (y1 - y0) * frac AS y_i
FROM hit
"""


def q_idw_interp(sf_dir: str):
    """IDW point interpolation (stages.spatial.idw_interpolate): customer
    lattice points receive Σ value/d² over the part points within 50 m
    (coincident lattice points excluded — IDW-at-a-sample semantics).
    Integer lattice coordinates and integer values make every d² and
    scale·v exact, so the floored terms are bit-identical to SQL."""
    from ..stages.spatial import idw_interpolate

    def lattice(key_col):
        def f(batch: pa.Table) -> pa.Table:
            k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            t = pa.table({
                "id": pa.array(k),
                "x": pa.array((11 * (k % 1000)).astype(np.float64)),
                "y": pa.array((14 * ((k // 1000) % 1000)).astype(np.float64)),
            })
            if key_col == "p_partkey":
                t = t.append_column("val", pa.array(1 + k % 97))
            return t

        return f

    parts = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        lattice("p_partkey"), batch_format="pyarrow"
    )
    custs = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lattice("c_custkey"), batch_format="pyarrow"
    )
    out = idw_interpolate(parts, custs, "val", radius_m=50.0)
    return out.map_batches(
        lambda b: pa.table({
            "cust_id": b["id"].cast(pa.int64()),
            "idw_scaled": b["idw_scaled"].cast(pa.int64()),
            "n_src": b["n_src"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["idw_interp"] = """
WITH a AS (
  SELECT c_custkey AS id,
         CAST(11 * (c_custkey % 1000) AS DOUBLE) AS x,
         CAST(14 * ((c_custkey // 1000) % 1000) AS DOUBLE) AS y
  FROM customer),
b AS (
  SELECT p_partkey AS id, 1 + p_partkey % 97 AS v,
         CAST(11 * (p_partkey % 1000) AS DOUBLE) AS x,
         CAST(14 * ((p_partkey // 1000) % 1000) AS DOUBLE) AS y
  FROM part)
SELECT a.id AS cust_id,
       CAST(sum(CAST(floor(
         1000000.0 * b.v
         / ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
       ) AS BIGINT)) AS BIGINT) AS idw_scaled,
       CAST(count(*) AS BIGINT) AS n_src
FROM a JOIN b
  ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) > 0.0
 AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2500.0
GROUP BY 1
"""


def q_tile_assign(sf_dir: str):
    """z14 tile occupancy of formula-derived customer points (S15 analog)."""
    ds = _read(sf_dir, "customer", ["c_custkey"])

    def tiles(batch: pa.Table) -> pa.Table:
        from ..stages.tiles import tile_xy

        lon, lat = _formula_coords(batch["c_custkey"].to_numpy(zero_copy_only=False))
        tx, ty = tile_xy(lon, lat, 14)
        return pa.table({"tx": pa.array(tx), "ty": pa.array(ty)})

    return (
        ds.map_batches(tiles, batch_format="pyarrow")
        .groupby(["tx", "ty"])
        .aggregate(Count(alias_name="n"))
    )


ORACLE_SQL["tile_assign"] = """
WITH pts AS (
  SELECT -77.05 + (c_custkey % 1000) * 1e-4 AS lon,
         38.85 + ((c_custkey // 1000) % 1000) * 1e-4 AS lat
  FROM customer)
SELECT CAST(floor((lon + 180.0) / 360.0 * 16384) AS BIGINT) AS tx,
       CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi())
                  / 2.0 * 16384) AS BIGINT) AS ty,
       count(*) AS n
FROM pts GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# point-in-polygon residual filter (M23) with a convex-polygon SQL oracle
# ---------------------------------------------------------------------------

# CCW convex quadrilateral straddling the formula-coordinate band
# (lat ∈ {38.85, 38.8501, …}); boundaries at half-steps so no point ever
# lies exactly on an edge (keeps ray-cast and half-plane oracles identical).
_PIP_QUAD = [(-77.03055, 38.8495), (-76.98955, 38.8496), (-76.98955, 38.8526),
             (-77.03055, 38.8525)]


def q_pip_filter(sf_dir: str):
    """Count customer formula-points inside a division polygon — the
    engine-side ST_INTERSECTS residual filter (build_query.py:104):
    PackedPolygon broadcast once via ray.put, probed with the vectorized
    ray-cast inside map_batches."""
    import ray

    from ..geo import PackedPolygon

    poly_ref = ray.put(PackedPolygon([np.array(_PIP_QUAD)]))
    ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def filt(batch: pa.Table) -> pa.Table:
        poly = ray.get(poly_ref)
        lon, lat = _formula_coords(
            batch["c_custkey"].to_numpy(zero_copy_only=False)
        )
        return batch.filter(pa.array(poly.contains(lon, lat)))

    return (
        ds.map_batches(filt, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_inside"))
    )


def _halfplane_sql(x1, y1, x2, y2):
    return (
        f"(({x2} - ({x1})) * (lat - ({y1})) - (({y2}) - ({y1})) * (lon - ({x1}))) > 0"
    )


ORACLE_SQL["pip_filter"] = f"""
WITH pts AS (
  SELECT c_mktsegment,
         -77.05 + (c_custkey % 1000) * 1e-4 AS lon,
         38.85 + ((c_custkey // 1000) % 1000) * 1e-4 AS lat
  FROM customer)
SELECT c_mktsegment, count(*) AS n_inside
FROM pts
WHERE {_halfplane_sql(*_PIP_QUAD[0], *_PIP_QUAD[1])}
  AND {_halfplane_sql(*_PIP_QUAD[1], *_PIP_QUAD[2])}
  AND {_halfplane_sql(*_PIP_QUAD[2], *_PIP_QUAD[3])}
  AND {_halfplane_sql(*_PIP_QUAD[3], *_PIP_QUAD[0])}
GROUP BY c_mktsegment
"""


def q_doc_splits(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment over documents
    (stages.splits — md5-hex-threshold rule, partitioning-invariant)."""
    from ..stages.splits import split_assign

    docs = _rpq(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return split_assign(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )


# thresholds: floor(0.8·16^8) = 0xcccccccc, floor(0.9·16^8) = 0xe6666666;
# fixed-width lowercase hex compares in numeric order on both engines
ORACLE_SQL["doc_splits"] = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
              THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_doc_sample(sf_dir: str):
    """Deterministic 20% sample of documents (stages.splits rule)."""
    from ..stages.splits import sample_deterministic

    docs = _rpq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return sample_deterministic(docs, "doc_id", 0.2)


# floor(0.2·16^8) = 0x33333333
ORACLE_SQL["doc_sample"] = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'
"""


def q_global_shuffle(sf_dir: str):
    """Deterministic global training shuffle: each document's position
    when the corpus is ordered by md5(doc_id)
    (stages.splits.global_shuffle_rank — 256-range distributed scan,
    reproducible at any parallelism unlike random_shuffle)."""
    from ..stages.splits import global_shuffle_rank

    docs = _read(sf_dir, "documents", ["doc_id"])
    return global_shuffle_rank(docs, "doc_id")


ORACLE_SQL["global_shuffle"] = """
SELECT doc_id,
       row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1
         AS shuffle_rank
FROM documents
"""


def q_term_idf(sf_dir: str):
    """Corpus vocabulary statistics: per-word document frequency + IDF
    (stages.textstats.term_doc_freq — per-batch combiner, one
    vocabulary-bounded shuffle)."""
    from ..stages.textstats import term_doc_freq

    n_docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet").count()
    df = term_doc_freq(_read(sf_dir, "documents", ["doc_id", "text"]))

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["sum(df_partial)"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "word": batch["word"],
                "df": pa.array(d),
                "idf": pa.array(np.round(np.log(n_docs / d), 6)),
            }
        )

    return df.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["term_idf"] = """
WITH words AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents),
df AS (SELECT word, count(*) AS df FROM words GROUP BY 1)
SELECT word, CAST(df AS BIGINT) AS df,
       round(ln((SELECT count(*) FROM documents) * 1.0 / df), 6) AS idf
FROM df
"""


def q_decayed_activity(sf_dir: str):
    """Half-life-decayed per-user activity score (the feature-store
    recency feature) in EXACT integer fixed point: age k = whole days
    before the corpus max timestamp (integer µs floor-div), each event
    contributes 2^(30−k) — a dyadic term that needs no float anywhere,
    so the per-user sum is order-free and bit-exact at any parallelism.
    One high-cardinality bucketed aggregate; the corpus max ts is the
    only scalar on the driver."""
    from ..stages.groupops import bucketed_aggregate

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    t_max = int(pa.concat_tables(
        [pa.table(b) for b in ev.map_batches(
            lambda b: pa.table({"m": pa.array(
                [int(b["ts"].cast(pa.int64()).to_numpy().max())]
                if b.num_rows else [np.iinfo(np.int64).min])}),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")]
    )["m"].to_numpy().max())

    US_PER_DAY = 86_400_000_000

    def terms(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = (t_max - ts) // US_PER_DAY
        term = np.where(k <= 30, np.int64(1) << np.minimum(30 - k, 62), 0)
        return pa.table({
            "user_id": batch["user_id"],
            "term": pa.array(term.astype(np.int64)),
        })

    agg = bucketed_aggregate(
        ev.map_batches(terms, batch_format="pyarrow"),
        ["user_id"],
        {"decay_score": ("term", "sum"), "n_events": ("term", "size")},
    )
    return agg.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "decay_score": b["decay_score"].cast(pa.int64()),
            "n_events": b["n_events"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["decayed_activity"] = """
WITH mx AS (SELECT max(ts) AS t FROM events),
t AS (
  SELECT user_id,
         date_diff('microsecond', ts, (SELECT t FROM mx)) // 86400000000
             AS k
  FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN k <= 30
                     THEN (CAST(1 AS BIGINT) << (30 - k)) ELSE 0 END)
            AS BIGINT) AS decay_score,
       CAST(count(*) AS BIGINT) AS n_events
FROM t GROUP BY 1
"""


def q_link_prediction(sf_dir: str):
    """Common-neighbors link prediction over the deterministic order-key
    graph (the triangle_count synth): score every UNCONNECTED vertex pair
    by its common-neighbor count (wedge generation per vertex → bucketed
    pair count → shuffled ANTI semi join against the edge set on a
    domain-bounded packed pair key), top-100 by (count DESC, pair). The
    wedge volume is Σ deg² — the documented bound of every wedge-based
    plan here; vertices are a literal N=500 domain so the packed key
    a·N+b is exact."""
    from ..stages.groupops import (
        bucketed_aggregate,
        bucketed_group_apply,
        group_pair_indices,
    )
    from ..stages.joins import semi_join_shuffled

    N = 500
    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def edges(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ((k % 991) * (k % 997)) % N
        v = ((k % 977) * (k % 983)) % N
        keep = u != v
        lo = np.minimum(u[keep], v[keep])
        hi = np.maximum(u[keep], v[keep])
        return pa.table({"u": pa.array(lo), "v": pa.array(hi)})

    e = bucketed_aggregate(
        ds.map_batches(edges, batch_format="pyarrow"),
        ["u", "v"], {"__one": ("u", "size")},
    ).materialize()

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "w": pa.array(np.concatenate([u, v])),
            "x": pa.array(np.concatenate([v, u])),
        })

    adj = e.map_batches(both_dirs, batch_format="pyarrow")

    def wedge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["w", "x"], kind="mergesort")
        run = (g["w"] != g["w"].shift()).cumsum().to_numpy()
        ia, ib = group_pair_indices(run, np.iinfo(np.int64).max)
        x = g["x"].to_numpy()
        return pd.DataFrame({"ia": x[ia], "ib": x[ib]})  # sorted ⇒ ia < ib

    cn = bucketed_aggregate(
        bucketed_group_apply(adj, ["w"], wedge),
        ["ia", "ib"], {"common_neighbors": ("ia", "size")},
    )

    def pack(ca: str, cb: str):
        def _p(batch: pa.Table) -> pa.Table:
            a = batch[ca].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch[cb].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.append_column("pk", pa.array(a * N + b))

        return _p

    nonedges = semi_join_shuffled(
        cn.map_batches(pack("ia", "ib"), batch_format="pyarrow").materialize(),
        e.map_batches(pack("u", "v"), batch_format="pyarrow").materialize(),
        "pk", "pk", anti=True,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch["ia"].cast(pa.int64()),
            "id_b": batch["ib"].cast(pa.int64()),
            "common_neighbors": batch["common_neighbors"].cast(pa.int64()),
        })

    return (
        nonedges.map_batches(finish, batch_format="pyarrow")
        .sort(["common_neighbors", "id_a", "id_b"],
              descending=[True, False, False])
        .limit(100)
    )


ORACLE_SQL["link_prediction"] = """
WITH raw AS (
  SELECT ((o_orderkey % 991) * (o_orderkey % 997)) % 500 AS u,
         ((o_orderkey % 977) * (o_orderkey % 983)) % 500 AS v
  FROM orders),
e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
      FROM raw WHERE u <> v),
adj AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e),
wedge AS (
  SELECT a.x AS ia, b.x AS ib
  FROM adj a JOIN adj b ON a.w = b.w AND a.x < b.x),
cn AS (
  SELECT ia, ib, CAST(count(*) AS BIGINT) AS c FROM wedge GROUP BY 1, 2)
SELECT cn.ia AS id_a, cn.ib AS id_b, cn.c AS common_neighbors
FROM cn LEFT JOIN e ON e.u = cn.ia AND e.v = cn.ib
WHERE e.u IS NULL
ORDER BY common_neighbors DESC, id_a, id_b
LIMIT 100
"""


def q_brand_lowqty_revenue(sf_dir: str):
    """TPC-H Q17-pattern decorrelated correlated subquery: revenue of
    lineitems whose quantity is below HALF their part's average quantity,
    rolled up per brand. The per-part average is a bucketed aggregate
    (part cardinality ≈ rows/30 — high-cardinality, never the native
    per-group reduce) joined back by a bucketed hash join; the brand roll
    is a per-batch partial combine into the bounded 25-brand groupby.
    Quantities are integer-valued → the avg is the exact
    CAST(sum AS DOUBLE)/n both engines compute; revenue folds in exact
    integer cents."""
    from ray.data.aggregate import Sum

    from ..stages.groupops import bucketed_aggregate
    from ..stages.joins import bucket_hash_join
    from .queries import _cents

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def qint(batch: pa.Table) -> pa.Table:
        return pa.table({
            "pk": batch["l_partkey"],
            "q": pa.array(
                batch["l_quantity"].to_numpy(zero_copy_only=False)
                .astype(np.int64)
            ),
        })

    stats = bucketed_aggregate(
        li.map_batches(qint, batch_format="pyarrow"),
        ["pk"], {"sq": ("q", "sum"), "nq": ("q", "size")},
    )

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": batch["l_partkey"],
            "qty": batch["l_quantity"],
            "cents": pa.array(_cents(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            )),
        })

    j = bucket_hash_join(
        li.map_batches(proj, batch_format="pyarrow").materialize(),
        stats.materialize(), "l_partkey", "pk",
    )

    # part → brand: bounded dimension (|part| = rows/30) as one broadcast
    # of SORTED (key, brand-code) arrays — searchsorted gather, no
    # per-row dict probe (CLAUDE.md broadcast-map rule)
    import ray as _ray

    part = pa.concat_tables(
        [pa.table(b) for b in _read(
            sf_dir, "part", ["p_partkey", "p_brand"]
        ).iter_batches(batch_format="pyarrow")]
    )
    pk_sorted = np.argsort(part["p_partkey"].to_numpy(zero_copy_only=False))
    keys = part["p_partkey"].to_numpy(zero_copy_only=False)[pk_sorted]
    brands = np.asarray(part["p_brand"].to_pylist(), dtype=object)[pk_sorted]
    lut = _ray.put((keys, brands))

    def fold(batch: pa.Table) -> pa.Table:
        k, br = _ray.get(lut)
        q = batch["qty"].to_numpy(zero_copy_only=False)
        sq = batch["sq"].to_numpy(zero_copy_only=False).astype(np.float64)
        nq = batch["nq"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = q < 0.5 * (sq / nq)  # literal-mirrored predicate
        pkv = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        cents = batch["cents"].to_numpy(zero_copy_only=False)[keep]
        pos = np.searchsorted(k, pkv)
        g = pd.DataFrame({"p_brand": br[pos], "c": cents}).groupby(
            "p_brand", as_index=False
        ).agg(rev=("c", "sum"), n=("c", "size"))
        g["rev"] = g["rev"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    agg = (
        j.map_batches(fold, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("rev", alias_name="revenue_cents"),
                   Sum("n", alias_name="n_items"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": batch["p_brand"],
            "revenue_cents": batch["revenue_cents"].cast(pa.int64()),
            "n_items": batch["n_items"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["brand_lowqty_revenue"] = """
WITH stats AS (
  SELECT l_partkey AS pk, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
         CAST(count(*) AS BIGINT) AS nq
  FROM lineitem GROUP BY 1)
SELECT p.p_brand,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN stats s ON s.pk = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < 0.5 * (CAST(s.sq AS DOUBLE) / s.nq)
GROUP BY 1
"""


def q_doc_keywords(sf_dir: str):
    """Per-document TF-IDF keyword extraction (stages.textstats.
    doc_keywords): top-3 tokens per doc by tf·ln(n/df), score rounded
    before the (score DESC, word) ordering — df stays a Dataset and joins
    back by word, nothing vocabulary-scale on the driver."""
    from ..stages.textstats import doc_keywords

    return doc_keywords(_read(sf_dir, "documents", ["doc_id", "text"]), k=3)


ORACLE_SQL["doc_keywords"] = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY 1, 2),
df AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
sc AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / df.df), 6)
             AS score
  FROM tf JOIN df USING (word))
SELECT doc_id, word, tf, score, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word)
         AS rn
  FROM sc)
WHERE rn <= 3
"""


_HH_DENOM = 100  # keep literal in sync with the SQL oracle below


def q_heavy_tokens(sf_dir: str):
    """EXACT frequent tokens: every token with count >= ceil(N/denom)
    via the two-pass Misra-Gries sketch (stages.groupops.heavy_hitters) —
    sketch-sized shuffles only, never a full token groupby. The integer
    ceil-threshold keeps Ray/DuckDB parity exact."""
    from ..stages.groupops import heavy_hitter_tokens

    return heavy_hitter_tokens(
        _read(sf_dir, "documents", ["text"]), "text", denom=_HH_DENOM
    )


ORACLE_SQL["heavy_tokens"] = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS item
  FROM documents WHERE text IS NOT NULL),
n AS (SELECT count(*) AS n FROM tok)
SELECT item, count(*) AS cnt
FROM tok
GROUP BY item
HAVING count(*) >= (SELECT (n + {_HH_DENOM} - 1) // {_HH_DENOM} FROM n)
"""


_GHH_DENOM = 60  # keep literal in sync with the SQL oracle below


def q_lang_heavy_tokens(sf_dir: str):
    """Per-LANGUAGE exact frequent tokens: grouped Misra-Gries
    (stages.groupops.grouped_heavy_hitters) over the token explode with
    the doc's lang carried via list_parent_indices — per-group threshold
    ceil(N_lang/denom), sketch-sized shuffles only."""
    from ..stages.groupops import grouped_heavy_hitters

    def explode(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.and_(pc.is_valid(batch["text"]), pc.is_valid(batch["lang"]))
        )
        txt = t["text"].combine_chunks()
        lst = pc.split_pattern(txt, " ")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        lang = t["lang"].combine_chunks().take(pc.list_parent_indices(lst))
        return pa.table({"lang": lang, "item": lst.values})

    ds = _read(sf_dir, "documents", ["lang", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )
    return grouped_heavy_hitters(ds, "lang", "item", denom=_GHH_DENOM)


ORACLE_SQL["lang_heavy_tokens"] = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS item
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
n AS (SELECT lang, count(*) AS n FROM tok GROUP BY 1)
SELECT t.lang, t.item, count(*) AS cnt
FROM tok t JOIN n USING (lang)
GROUP BY t.lang, t.item, n.n
HAVING count(*) >= (n.n + {_GHH_DENOM} - 1) // {_GHH_DENOM}
"""


def _langid_oracle_sql() -> str:
    """langid_docs oracle generated FROM the engine's marker table
    (stages.textstats.LANG_MARKERS) so the two can never drift: per-doc
    marker counts per language, strict argmax, ties/zero → 'und'."""
    from ..stages.textstats import LANG_MARKERS

    langs = list(LANG_MARKERS)
    counts = ", ".join(
        "sum(CASE WHEN tok IN ({vals}) THEN 1 ELSE 0 END) AS {lang}".format(
            vals=", ".join(f"'{m}'" for m in LANG_MARKERS[lang]), lang=lang
        )
        for lang in langs
    )
    mx = "greatest({})".format(", ".join(langs))
    n_at_max = " + ".join(f"CAST({lg} = mx AS INT)" for lg in langs)
    pick = " ".join(
        f"WHEN {lg} = mx THEN '{lg}'" for lg in langs[:-1]
    ) + f" ELSE '{langs[-1]}'"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
s AS (SELECT doc_id, {counts} FROM toks GROUP BY 1),
m AS (SELECT *, {mx} AS mx FROM s)
SELECT doc_id,
       CASE WHEN mx = 0 THEN 'und'
            WHEN {n_at_max} > 1 THEN 'und'
            {pick} END AS lang_pred
FROM m
"""


ORACLE_SQL["langid_docs"] = _langid_oracle_sql()

# rows_only.q_lang_confusion rides the SAME generated marker-argmax SQL:
# the per-doc prediction CTE joined back to the declared label, counted.
ORACLE_SQL["lang_confusion"] = f"""
WITH det AS ({_langid_oracle_sql()})
SELECT d.lang AS declared_lang, det.lang_pred AS detected_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN det USING (doc_id)
GROUP BY 1, 2
"""


def q_lm_score(sf_dir: str):
    """Unigram-LM document scoring (median token log-probability under the
    corpus unigram model — stages.textstats.lm_score; median selection
    keeps float parity independent of accumulation order)."""
    from ..stages.textstats import lm_score

    return lm_score(_read(sf_dir, "documents", ["doc_id", "text"]))


ORACLE_SQL["lm_score"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
total AS (SELECT sum(c) AS t FROM tf)
SELECT doc_id,
       round(median(ln(tf.c / total.t)), 6) AS median_logprob
FROM toks JOIN tf USING (tok) CROSS JOIN total
GROUP BY doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination over the derived corpus: the 40
    perturbed copies (doc_id ≥ 100000) play the EVAL SET; every original
    document sharing a word 8-gram with them is flagged contaminated
    (stages.decontam.decontaminate — benchmark grams broadcast once,
    corpus side a pure map)."""
    from ..stages.decontam import decontaminate

    corpus = _derived_corpus(sf_dir)
    bench = corpus.filter(expr="doc_id >= 100000")
    train = corpus.filter(expr="doc_id < 100000")
    return decontaminate(train, bench, n=8)


_LEAD8 = " || ' ' || ".join(
    f"lead(tok, {i}) OVER w" for i in range(1, 8)
)
ORACLE_SQL["decontaminate"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' xtra token' FROM documents
  WHERE doc_id < 40),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM corpus),
sh AS (
  SELECT doc_id, tok || ' ' || {_LEAD8} AS g
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok, 7) OVER w IS NOT NULL),
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id >= 100000),
hits AS (SELECT DISTINCT doc_id FROM sh
         WHERE doc_id < 100000 AND g IN (SELECT g FROM bench))
SELECT c.doc_id, c.doc_id IN (SELECT doc_id FROM hits) AS contaminated
FROM corpus c WHERE c.doc_id < 100000
"""


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality signals (top-word fraction,
    duplicated-bigram fraction) — stages.textstats.repetition_stats_batch,
    a pure vectorized map stage."""
    from ..stages.textstats import repetition_stats_batch

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(repetition_stats_batch, batch_format="pyarrow")
        .select_columns(
            [
                "doc_id",
                "n_words",
                "n_unique_words",
                "top_word_frac",
                "dup_2gram_frac",
            ]
        )
    )


ORACLE_SQL["repetition_stats"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents),
wc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
w AS (SELECT doc_id, sum(c) AS n, count(*) AS u, max(c) AS mx
      FROM wc GROUP BY 1),
big AS (SELECT doc_id,
               tok || ' ' || lead(tok) OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS g
        FROM toks QUALIFY g IS NOT NULL),
b AS (SELECT doc_id, count(*) AS t2, count(DISTINCT g) AS u2
      FROM big GROUP BY 1)
SELECT w.doc_id,
       CAST(w.n AS BIGINT) AS n_words,
       CAST(w.u AS BIGINT) AS n_unique_words,
       round(w.mx * 1.0 / w.n, 6) AS top_word_frac,
       round(coalesce(1.0 - b.u2 * 1.0 / b.t2, 0.0), 6) AS dup_2gram_frac
FROM w LEFT JOIN b USING (doc_id)
"""


def _pii_corpus(sf_dir: str):
    """documents with deterministic synthetic PII appended (emails /
    phones / IPv4 by doc_id residue) — SQL-expressible so the redaction
    oracle sees the identical input."""
    base = _read(sf_dir, "documents", ["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = []
        for i, t in zip(ids, texts):
            if i % 7 == 0:
                t += f" contact user{i}@example.com"
            if i % 11 == 0:
                t += f" call +1-555-{i % 10000:04d}"
            if i % 13 == 0:
                t += f" from 10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}"
            out.append(t)
        return pa.table(
            {"doc_id": batch["doc_id"], "text": pa.array(out, pa.string())}
        )

    return base.map_batches(inject, batch_format="pyarrow")


_PII_CORPUS_SQL = """
  SELECT doc_id, text
    || CASE WHEN doc_id % 7 = 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         ELSE '' END
    || CASE WHEN doc_id % 11 = 0
         THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE '' END
    || CASE WHEN doc_id % 13 = 0
         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
              || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
         ELSE '' END AS text
  FROM documents
"""


def q_redact_pii(sf_dir: str):
    """PII scrub over the injected corpus: RE2 kernels count + replace
    emails → IPv4 → phones in pinned order (stages.pii.redact_pii;
    DuckDB's regex engine is also RE2, so the oracle shares the exact
    pattern strings)."""
    from ..stages.pii import redact_pii

    return redact_pii(_pii_corpus(sf_dir)).select_columns(
        ["doc_id", "clean_text", "n_emails", "n_ips", "n_phones"]
    )


# identical RE2 patterns as stages.pii; counts taken against the text as
# each rule sees it (post prior replacements), mirroring the engine
ORACLE_SQL["redact_pii"] = """
WITH pii AS (%s),
s1 AS (SELECT doc_id, text AS t0,
              regexp_replace(text,
                '[A-Za-z0-9._%%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                '<EMAIL>', 'g') AS t1
       FROM pii),
s2 AS (SELECT *, regexp_replace(t1,
                '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                '<IP>', 'g') AS t2
       FROM s1)
SELECT doc_id,
       regexp_replace(t2, '\\+[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}\\b',
                      '<PHONE>', 'g') AS clean_text,
       len(regexp_extract_all(t0,
           '[A-Za-z0-9._%%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(t1,
           '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ips,
       len(regexp_extract_all(t2,
           '\\+[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}\\b')) AS n_phones
FROM s2
""" % _PII_CORPUS_SQL


def q_doc_stratified_sample(sf_dir: str):
    """Class-balanced deterministic sampling: per-LANGUAGE keep fractions
    (downsample the dominant language, keep the rest whole) — the corpus
    re-balancing step of a training-data pipeline
    (stages.splits.stratified_sample)."""
    from ..stages.splits import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.1, "de": 0.5}, default_fraction=1.0
    )


# floor(0.1·16^8) = 0x19999999, floor(0.5·16^8) = 0x80000000; 'g' sorts
# after every hex digit, so ELSE 'g' keeps non-listed groups whole
ORACLE_SQL["doc_stratified_sample"] = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang WHEN 'en' THEN '19999999'
                WHEN 'de' THEN '80000000'
                ELSE 'g' END
"""


_MIX_WEIGHTS = {"en": 0.2, "es": 0.2, "de": 0.2, "fr": 0.2, "zh": 0.2}
_MIX_BUDGET_FRACTION = 0.4


def q_domain_mix(sf_dir: str):
    """Static data-mixture resampling (stages.splits.domain_mix): equalize
    the five languages' TOKEN mass at a 40%-of-corpus budget — per-lang
    keep-rates derived from the measured per-lang token totals (one
    bounded groupby), then the md5-threshold sample. The dominant
    language is down-sampled hard, scarce ones kept whole (rate capped at
    1) — the standard static-mixture step before training export."""
    from ..stages.splits import domain_mix
    from ..stages.textstats import token_count_batch

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    with_tok = docs.map_batches(
        lambda b: token_count_batch(b).select(["doc_id", "lang", "n_tokens"]),
        batch_format="pyarrow",
    )
    return domain_mix(
        with_tok, "doc_id", "lang", "n_tokens",
        target_weights=_MIX_WEIGHTS,
        budget_fraction=_MIX_BUDGET_FRACTION,
    )


def _domain_mix_oracle_sql() -> str:
    """Mirrors splits.domain_mix bit-for-bit: the rate expression is the
    same left-assoc float64 chain (bf * total * w / t), _hex_bound's
    int-truncation is floor-of-positive, and the kept set is the md5
    prefix compare both engines share."""
    vals = ", ".join(f"('{g}', {w})" for g, w in _MIX_WEIGHTS.items())
    bf = _MIX_BUDGET_FRACTION
    return f"""
WITH tok AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
tot AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
        FROM tok GROUP BY 1),
alltot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ta FROM tok),
rate AS (
  SELECT lang, {bf} * ta * w / t AS r
  FROM tot, alltot, (VALUES {vals}) AS v(vl, w)
  WHERE v.vl = tot.lang AND t > 0),
thr AS (
  SELECT lang,
         CASE WHEN r >= 1.0 THEN 'gggggggg'
              ELSE printf('%08x', CAST(floor(r * 4294967296.0) AS BIGINT))
         END AS bound
  FROM rate)
SELECT tok.doc_id, tok.lang, tok.n_tokens
FROM tok JOIN thr USING (lang)
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < bound
"""


ORACLE_SQL["domain_mix"] = _domain_mix_oracle_sql()


def q_pack_sequences(sf_dir: str):
    """Token-budget shard assignment for training export: documents in
    doc_id order fill 2048-token shards; a row's shard is the exclusive
    prefix sum of token counts divided by the budget — computed as a
    distributed two-phase scan (per-range totals → driver prefix of range
    OFFSETS only → in-range cumsum), never a sequential pass
    (stages.splits.pack_sequences)."""
    from ..stages.splits import pack_sequences
    from ..stages.textstats import token_count_batch

    docs = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(token_count_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
    )
    return pack_sequences(docs, "doc_id", "n_tokens", budget=2048, range_size=128)


ORACLE_SQL["pack_sequences"] = """
SELECT doc_id, n_tokens,
       CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / 2048) AS BIGINT) AS shard_id
FROM (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
"""


# ---------------------------------------------------------------------------
# spatial neighborhood operators (stages/spatial.py)
# ---------------------------------------------------------------------------


def _formula_points(ds, key_col: str, thin_sql_mod: tuple[int, int] | None = None,
                    md5_frac: float | None = None):
    """(id, lon, lat) points from integer keys via the shared formula.
    Thinning options (both SQL-reproducible): keep ⇔ (key*2654435761) % m
    < t, or keep ⇔ md5(str(key))[:8] < hex_bound(md5_frac). The md5 form
    is the one to use when the DOWNSTREAM op is density-sensitive — an
    affine map mod m is periodic along the formula lattice (step
    multiplier % m), so it never produces dense runs."""
    import hashlib

    bound = f"{int(md5_frac * 16**8):08x}" if md5_frac is not None else None

    def pts(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if thin_sql_mod is not None:
            m, t = thin_sql_mod
            key = key[(key * 2654435761) % m < t]
        if bound is not None:
            keep = np.fromiter(
                (hashlib.md5(str(k).encode()).hexdigest()[:8] < bound
                 for k in key),
                dtype=bool, count=key.size,
            )
            key = key[keep]
        lon, lat = _formula_coords(key)
        return pa.table(
            {"id": pa.array(key), "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    return ds.map_batches(pts, batch_format="pyarrow")


def q_spatial_knn(sf_dir: str):
    """Bounded-radius k-nearest-neighbor join (stages.spatial.
    spatial_knn_join): each customer point's 3 nearest thinned order
    points within 100 m, rank 1-based, (distance, id) tie-break — the
    oracle is a row_number() window over the inequality join."""
    from ..stages.spatial import spatial_knn_join

    cust = _formula_points(_read(sf_dir, "customer", ["c_custkey"]), "c_custkey")
    orders = _formula_points(
        _read(sf_dir, "orders", ["o_orderkey"]), "o_orderkey", (4, 1)
    )
    out = spatial_knn_join(cust, orders, k=3, radius_m=100.0)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["cust_id", "order_id", "dist_m", "knn_rank"])

    return out.map_batches(rename, batch_format="pyarrow")


ORACLE_SQL["spatial_knn"] = f"""
WITH a AS (
  SELECT c_custkey AS id, {_MERC} * radians(-77.05 + (c_custkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((c_custkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM customer),
b AS (
  SELECT o_orderkey AS id, {_MERC} * radians(-77.05 + (o_orderkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((o_orderkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM orders WHERE (o_orderkey * 2654435761) % 4 < 1),
cand AS (
  SELECT a.id AS cust_id, b.id AS order_id,
         sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d
  FROM a JOIN b
    ON b.x BETWEEN a.x - 100 AND a.x + 100
   AND b.y BETWEEN a.y - 100 AND a.y + 100
  WHERE sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= 100)
SELECT cust_id, order_id, round(d, 1) AS dist_m,
       CAST(row_number() OVER (PARTITION BY cust_id ORDER BY d, order_id)
            AS BIGINT) AS knn_rank
FROM cand
QUALIFY knn_rank <= 3
"""


def q_mutual_nn(sf_dir: str):
    """Iterated mutual-nearest-neighbor 1:1 assignment
    (stages.spatial.mutual_nn_assign): 3 rounds of mutual-best matching
    between customer points and thinned order points within 100 m — the
    one-to-one conflation policy over the reference matcher's multi-match
    candidate graph (scripts/match.py:452-474). Oracle = 3 unrolled
    MATERIALIZED rounds of paired row_number() windows + NOT IN peels."""
    from ..stages.spatial import mutual_nn_assign

    cust = _formula_points(_read(sf_dir, "customer", ["c_custkey"]), "c_custkey")
    orders = _formula_points(
        _read(sf_dir, "orders", ["o_orderkey"]), "o_orderkey", (4, 1)
    )
    return mutual_nn_assign(cust, orders, radius_m=100.0, rounds=3)


_MNN_POINTS = f"""a AS (
  SELECT c_custkey AS id, {_MERC} * radians(-77.05 + (c_custkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((c_custkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM customer),
b AS (
  SELECT o_orderkey AS id, {_MERC} * radians(-77.05 + (o_orderkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((o_orderkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM orders WHERE (o_orderkey * 2654435761) % 4 < 1),
p1 AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b,
         sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d
  FROM a JOIN b
    ON b.x BETWEEN a.x - 100 AND a.x + 100
   AND b.y BETWEEN a.y - 100 AND a.y + 100
  WHERE sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= 100)"""


def _mnn_round(r: int) -> str:
    return f"""m{r} AS MATERIALIZED (
  SELECT id_a, id_b, d FROM (
    SELECT id_a, id_b, d,
           row_number() OVER (PARTITION BY id_a ORDER BY d, id_b) AS ra,
           row_number() OVER (PARTITION BY id_b ORDER BY d, id_a) AS rb
    FROM p{r}) WHERE ra = 1 AND rb = 1)"""


def _mnn_peel(r: int) -> str:
    return f"""p{r + 1} AS MATERIALIZED (
  SELECT * FROM p{r}
  WHERE id_a NOT IN (SELECT id_a FROM m{r})
    AND id_b NOT IN (SELECT id_b FROM m{r}))"""


ORACLE_SQL["mutual_nn_matches"] = f"""
WITH {_MNN_POINTS},
{_mnn_round(1)},
{_mnn_peel(1)},
{_mnn_round(2)},
{_mnn_peel(2)},
{_mnn_round(3)}
SELECT id_a, id_b, round(d, 1) AS dist_m, CAST(r AS BIGINT) AS match_round
FROM (
  SELECT id_a, id_b, d, 1 AS r FROM m1
  UNION ALL SELECT id_a, id_b, d, 2 FROM m2
  UNION ALL SELECT id_a, id_b, d, 3 FROM m3)
"""


def q_ripley_k(sf_dir: str):
    """Ripley-K pair-correlation readout (stages.spatial.ripley_counts):
    ordered within-r pair counts + mean neighbors per point at literal
    radii {25, 50, 100} m over md5-thinned customer points (the
    density-sensitive thinning — an affine mod-m thin is periodic along
    the formula lattice)."""
    from ..stages.spatial import ripley_counts

    pts = _formula_points(
        _read(sf_dir, "customer", ["c_custkey"]), "c_custkey", md5_frac=0.4
    )
    return ripley_counts(pts, [25.0, 50.0, 100.0])


ORACLE_SQL["ripley_k"] = f"""
WITH pts AS (
  SELECT c_custkey AS id, {_MERC} * radians(-77.05 + (c_custkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((c_custkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM customer WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) < '66666666'),
n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM pts),
pr AS MATERIALIZED (
  SELECT sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS d
  FROM pts a JOIN pts b
    ON b.x BETWEEN a.x - 100 AND a.x + 100
   AND b.y BETWEEN a.y - 100 AND a.y + 100 AND a.id <> b.id
  WHERE sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= 100),
rr(rad) AS (VALUES (25.0), (50.0), (100.0)),
cnt AS (
  SELECT rad, CAST(count(*) AS BIGINT) AS n_pairs
  FROM rr JOIN pr ON pr.d <= rr.rad GROUP BY 1)
SELECT rr.rad AS radius_m,
       coalesce(cnt.n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
       round(CAST(coalesce(cnt.n_pairs, 0) AS DOUBLE) / (SELECT c FROM n), 6)
           AS mean_neighbors
FROM rr LEFT JOIN cnt ON cnt.rad = rr.rad
"""


def q_dbscan_clusters(sf_dir: str):
    """Grid DBSCAN over thinned customer formula points (eps 25 m,
    min_pts 4): (id, cluster_id, role) with min-label-deterministic
    border assignment (stages.spatial.dbscan_points); the oracle rebuilds
    core/border/noise with a recursive-CTE min-label propagation."""
    from ..stages.spatial import dbscan_points

    pts = _formula_points(
        _read(sf_dir, "customer", ["c_custkey"]), "c_custkey", md5_frac=0.4
    )
    return dbscan_points(pts, eps_m=25.0, min_pts=4)


ORACLE_SQL["dbscan_clusters"] = f"""
WITH RECURSIVE pts AS (
  SELECT c_custkey AS id, {_MERC} * radians(-77.05 + (c_custkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((c_custkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM customer WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) < '66666666'),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM pts a JOIN pts b
    ON b.x BETWEEN a.x - 25 AND a.x + 25
   AND b.y BETWEEN a.y - 25 AND a.y + 25 AND a.id <> b.id
  WHERE sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= 25),
deg AS (SELECT id_a AS id, count(*) AS n FROM pairs GROUP BY 1),
core AS (SELECT id FROM deg WHERE n + 1 >= 4),
core_edges AS (
  SELECT p.id_a AS u, p.id_b AS v FROM pairs p
  JOIN core ca ON ca.id = p.id_a JOIN core cb ON cb.id = p.id_b),
reach(id, lbl) AS (
  SELECT id, id FROM core
  UNION
  SELECT e.u, reach.lbl FROM core_edges e JOIN reach ON reach.id = e.v),
core_cluster AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
border AS (
  SELECT p.id_a AS id, min(cc.cluster_id) AS cluster_id
  FROM pairs p JOIN core_cluster cc ON cc.id = p.id_b
  WHERE p.id_a NOT IN (SELECT id FROM core)
  GROUP BY 1)
SELECT p.id,
       COALESCE(cc.cluster_id, b.cluster_id, -1) AS cluster_id,
       CASE WHEN cc.id IS NOT NULL THEN 'core'
            WHEN b.id IS NOT NULL THEN 'border' ELSE 'noise' END AS role
FROM pts p
LEFT JOIN core_cluster cc ON cc.id = p.id
LEFT JOIN border b ON b.id = p.id
"""


def q_track_lengths(sf_dir: str):
    """Per-user GPS track length: events as pings (formula coords from
    event_id), ordered by (ts, event_id) within user; leg distances are
    floored to integer DECIMETERS so the per-user sum is an integer —
    exact, summation-order-free oracle parity (same trick as the
    integer-cent money aggregates). One bucketed shuffle
    (stages.groupops.bucketed_group_apply), vectorized across all users
    in a bucket."""
    from ..geo import mercator_xy
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_xy(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        x, y = mercator_xy(lon, lat)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    pts = ds.map_batches(add_xy, batch_format="pyarrow")

    def track_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        d = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
        leg_dm = np.floor(d * 10).astype(np.int64)
        leg_dm = np.where(u[1:] == u[:-1], leg_dm, 0)  # no cross-user legs
        users, starts = np.unique(u, return_index=True)
        ends = np.concatenate([starts[1:], [len(u)]])
        cum = np.concatenate([[0], np.cumsum(leg_dm)])
        dm = cum[ends - 1] - cum[starts]
        return pd.DataFrame(
            {
                "user_id": users,
                "n_pings": (ends - starts).astype(np.int64),
                "track_m": dm / 10.0,
            }
        )

    return bucketed_group_apply(pts, ["user_id"], track_bucket, num_buckets=16)


ORACLE_SQL["track_lengths"] = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {_MERC} * radians(-77.05 + (event_id % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((event_id // 1000) % 1000) * 1e-4)/2)) AS y
  FROM events),
lagd AS (
  SELECT user_id, x, y, lag(x) OVER w AS px, lag(y) OVER w AS py
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
legs AS (
  SELECT user_id,
         CAST(floor(sqrt((x - px) * (x - px) + (y - py) * (y - py)) * 10)
              AS BIGINT) AS leg_dm
  FROM lagd WHERE px IS NOT NULL),
counts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_pings FROM pts GROUP BY 1),
sums AS (SELECT user_id, sum(leg_dm) AS dm FROM legs GROUP BY 1)
SELECT c.user_id, c.n_pings, coalesce(s.dm, 0) / 10.0 AS track_m
FROM counts c LEFT JOIN sums s ON s.user_id = c.user_id
"""


def q_zipf_fit(sf_dir: str):
    """Zipf's-law rank–frequency OLS fit (stages.textstats.zipf_fit):
    exact global ranks via the log2-range two-phase scan, quantized-
    integer moment folds, mirrored float finish."""
    from ..stages.textstats import zipf_fit

    return zipf_fit(_read(sf_dir, "documents", ["text"]))


ORACLE_SQL["zipf_fit"] = """
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
tf AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY 1),
ranked AS (
  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS r
  FROM tf),
q AS (
  SELECT CAST(floor(1000000.0 * ln(CAST(r AS DOUBLE))) AS BIGINT) AS x,
         CAST(floor(1000000.0 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS y
  FROM ranked),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM q)
SELECT n AS n_words,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
FROM m
"""


def q_dp_type_counts(sf_dir: str):
    """Differentially-private-style noisy release counts with
    DETERMINISTIC Laplace(1) noise: the md5-uniform inverse-CDF draw
    (u = hex-prefix/2³², x = −sign(u−½)·ln(1−2|u−½|)) — the engine's
    no-RNG rule applied to a privacy mechanism, so the release is
    reproducible AND partition-invariant. One bounded groupby; noise is
    the branch-for-branch mirrored float chain, rounded at 6 dp."""
    import hashlib

    from ray.data.aggregate import Count

    ev = _read(sf_dir, "events", ["event_type"])
    counts = ev.groupby("event_type").aggregate(Count(alias_name="n"))

    def noise(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.array([
            int(hashlib.md5(("dp:" + t).encode()).hexdigest()[:8], 16)
            for t in et
        ], np.float64) / 4294967296.0
        x = np.where(
            u >= 0.5,
            -1.0 * np.log(1.0 - 2.0 * (u - 0.5)),
            np.log(1.0 - 2.0 * (0.5 - u)),
        )
        return pa.table({
            "event_type": batch["event_type"],
            "n": pa.array(n),
            "noisy_n": pa.array(np.round(n + x, 6), pa.float64()),
        })

    return counts.map_batches(noise, batch_format="pyarrow")


ORACLE_SQL["dp_type_counts"] = """
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
u AS (
  SELECT event_type, n,
         CAST(('0x' || substr(md5('dp:' || event_type), 1, 8)) AS BIGINT)
             / 4294967296.0 AS u
  FROM c)
SELECT event_type, n,
       round(n + CASE WHEN u >= 0.5
                      THEN -1.0 * ln(1.0 - 2.0 * (u - 0.5))
                      ELSE ln(1.0 - 2.0 * (0.5 - u)) END, 6) AS noisy_n
FROM u
"""


def q_blocking_quality(sf_dir: str):
    """Entity-resolution blocking audit over the conflation join's k-ring
    cell scheme: candidate-pair volume (pairs sharing a k-ring-1 cell),
    true-match volume (distance ≤ 100 m), and the reduction ratio
    1 − cand/(nA·nB). The ORACLE computes the true count from an
    INDEPENDENT brute-force distance join — so the hash compare literally
    audits the pair-completeness invariant (k-ring-1 ⊇ the 100 m disk,
    the guarantee every cell-blocked join in this engine rests on): if
    the blocking ever missed a pair, engine and oracle would disagree.
    Counting happens inside the cell buckets — candidate pairs are
    COUNTED, never materialized; one partial row per bucket reaches the
    aggregate."""
    from ..stages.spatial import _auto_buckets, _encode_side

    cust = _formula_points(_read(sf_dir, "customer", ["c_custkey"]), "c_custkey")
    orders = _formula_points(
        _read(sf_dir, "orders", ["o_orderkey"]), "o_orderkey", (4, 1)
    )
    n_a = cust.count()
    n_b = orders.count()
    nb_ = _auto_buckets(None)

    probe = cust.map_batches(
        _encode_side("id", "lon", "lat", nb_, 0, replicate=False),
        batch_format="pyarrow",
    )
    cand = orders.map_batches(
        _encode_side("id", "lon", "lat", nb_, 1, replicate=True),
        batch_format="pyarrow",
    )

    def count_bucket(g: pa.Table) -> pa.Table:
        from ..stages.groupops import concat_ranges

        side = g["side"].to_numpy(zero_copy_only=False)
        am = side == 0
        bm = ~am
        if not am.any() or not bm.any():
            return pa.table({"n_cand": pa.array([0], pa.int64()),
                             "n_caught": pa.array([0], pa.int64())})
        cell = g["cell"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell[bm], kind="mergesort")
        bc = cell[bm][order]
        lo = np.searchsorted(bc, cell[am], "left")
        hi = np.searchsorted(bc, cell[am], "right")
        counts = hi - lo
        n_cand = int(counts.sum())
        if n_cand:
            ai = np.repeat(np.flatnonzero(am), counts)
            bi = np.flatnonzero(bm)[order[concat_ranges(lo, hi)]]
            d = np.sqrt((x[ai] - x[bi]) ** 2 + (y[ai] - y[bi]) ** 2)
            n_caught = int((d <= 100.0).sum())
        else:
            n_caught = 0
        return pa.table({"n_cand": pa.array([n_cand], pa.int64()),
                         "n_caught": pa.array([n_caught], pa.int64())})

    parts = pa.concat_tables([
        pa.table(b) for b in (
            probe.union(cand).materialize()
            .groupby("bucket")
            .map_groups(count_bucket, batch_format="pyarrow")
        ).iter_batches(batch_format="pyarrow")
    ])
    n_cand = int(parts["n_cand"].to_numpy().sum())
    n_caught = int(parts["n_caught"].to_numpy().sum())
    red = round(1.0 - float(n_cand) / (float(n_a) * float(n_b)), 6)
    import ray.data as _rd

    return _rd.from_arrow(pa.table({
        "n_candidates": pa.array([n_cand], pa.int64()),
        "n_matches": pa.array([n_caught], pa.int64()),
        "n_left": pa.array([n_a], pa.int64()),
        "n_right": pa.array([n_b], pa.int64()),
        "reduction_ratio": pa.array([red], pa.float64()),
    }))


ORACLE_SQL["blocking_quality"] = f"""
WITH a AS (
  SELECT c_custkey AS id, {_MERC} * radians(-77.05 + (c_custkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((c_custkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM customer),
b AS (
  SELECT o_orderkey AS id, {_MERC} * radians(-77.05 + (o_orderkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((o_orderkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM orders WHERE (o_orderkey * 2654435761) % 4 < 1),
ac AS (SELECT id, x, y, CAST(floor(x / 256.0) AS BIGINT) AS cx,
              CAST(floor(y / 256.0) AS BIGINT) AS cy FROM a),
bc AS (SELECT id, x, y, CAST(floor(x / 256.0) AS BIGINT) AS cx,
              CAST(floor(y / 256.0) AS BIGINT) AS cy FROM b),
cand AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM ac JOIN bc ON bc.cx BETWEEN ac.cx - 1 AND ac.cx + 1
                 AND bc.cy BETWEEN ac.cy - 1 AND ac.cy + 1),
tru AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM a JOIN b ON b.x BETWEEN a.x - 100 AND a.x + 100
               AND b.y BETWEEN a.y - 100 AND a.y + 100
  WHERE sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= 100)
SELECT (SELECT n FROM cand) AS n_candidates,
       (SELECT n FROM tru) AS n_matches,
       (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_left,
       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_right,
       round(1.0 - CAST((SELECT n FROM cand) AS DOUBLE)
                   / (CAST((SELECT count(*) FROM a) AS DOUBLE)
                      * CAST((SELECT count(*) FROM b) AS DOUBLE)), 6)
           AS reduction_ratio
"""


def q_morans_i(sf_dir: str):
    """Global Moran's I (stages.spatial.morans_i) over the 16 m customer
    cell grid — the spatial-autocorrelation audit next to hotspot_cells:
    integer n-scaled deviations, Python-int folds, one mirrored float at
    the end."""
    from ..stages.groupops import bucketed_aggregate
    from ..stages.spatial import morans_i

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def cells(batch: pa.Table) -> pa.Table:
        from ..geo import mercator_xy

        lon, lat = _formula_coords(
            batch["c_custkey"].to_numpy(zero_copy_only=False)
        )
        x, y = mercator_xy(lon, lat)
        return pa.table({
            "cell_x": pa.array(np.floor(x / 16.0).astype(np.int64)),
            "cell_y": pa.array(np.floor(y / 16.0).astype(np.int64)),
        })

    counts = bucketed_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["cell_x", "cell_y"], {"n": ("cell_x", "size")},
    ).materialize()
    return morans_i(counts)


ORACLE_SQL["morans_i"] = f"""
WITH pts AS (
  SELECT {_COORD_SQL.format(k='c_custkey')} FROM customer),
proj AS (
  SELECT CAST(floor({_MERC} * radians(lon) / 16.0) AS BIGINT) AS cell_x,
         CAST(floor({_MERC} * ln(tan(pi()/4 + radians(lat)/2)) / 16.0) AS BIGINT)
             AS cell_y
  FROM pts),
counts AS (
  SELECT cell_x, cell_y, CAST(count(*) AS BIGINT) AS x
  FROM proj GROUP BY 1, 2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t
        FROM counts),
dev AS (
  SELECT cell_x, cell_y,
         (SELECT n FROM tot) * x - (SELECT t FROM tot) AS d
  FROM counts),
k(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
pairs AS (
  SELECT a.d AS da, b.d AS db
  FROM dev a CROSS JOIN k
  JOIN dev b ON b.cell_x = a.cell_x + k.dx AND b.cell_y = a.cell_y + k.dy),
agg AS (SELECT CAST(count(*) AS BIGINT) AS w, CAST(sum(da * db) AS BIGINT)
            AS num FROM pairs),
dn AS (SELECT CAST(sum(d * d) AS BIGINT) AS den FROM dev)
SELECT (SELECT n FROM tot) AS n_cells,
       (SELECT w FROM agg) AS w_pairs,
       (SELECT num FROM agg) AS num,
       (SELECT den FROM dn) AS den,
       round((CAST((SELECT n FROM tot) AS DOUBLE) / (SELECT w FROM agg))
             * (CAST((SELECT num FROM agg) AS DOUBLE) / (SELECT den FROM dn)),
             6) AS moran_i
"""


def q_revenue_changepoint(sf_dir: str):
    """CUSUM change-point detection on the daily revenue series — the
    regression-monitoring op, fully integer-exact: daily totals fold in
    integer cents (calendar-bounded groupby — per-batch partials, the
    shuffle moves ≤ |days| rows per block), and the CUSUM deviation is
    the n-scaled integer n·cum_i − i·T (no mean division, no float
    anywhere). The |days| series is the one driver materialization
    (calendar-bounded, documented); output is the single argmax-|S| day
    with the earliest-day tie-break."""
    from ray.data.aggregate import Sum

    from .queries import _cents

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    US_PER_DAY = 86_400_000_000

    def daily_partial(batch: pa.Table) -> pa.Table:
        day = (batch["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // US_PER_DAY)
        cents = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        g = pd.DataFrame({"day_id": day, "x": cents}).groupby(
            "day_id", as_index=False
        )["x"].sum()
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    daily = (
        orders.map_batches(daily_partial, batch_format="pyarrow")
        .groupby("day_id")
        .aggregate(Sum("x", alias_name="x"))
    )
    t = pa.concat_tables(
        [pa.table(b) for b in daily.iter_batches(batch_format="pyarrow")]
    )
    day = t["day_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(day)
    day, x = day[order], x[order]
    n = int(day.size)
    total = int(x.sum())
    cum = np.cumsum(x)
    s = n * cum - (np.arange(1, n + 1, dtype=np.int64)) * total  # exact ints
    best = int(np.lexsort((day, -np.abs(s)))[0])
    import ray.data as _rd

    return _rd.from_arrow(pa.table({
        "change_day": pa.array([int(day[best])], pa.int64()),
        "cusum_scaled": pa.array([int(s[best])], pa.int64()),
        "n_days": pa.array([n], pa.int64()),
    }))


ORACLE_SQL["revenue_changepoint"] = """
WITH daily AS (
  SELECT date_diff('microsecond', TIMESTAMP '1970-01-01', o_orderdate)
             // 86400000000 AS day_id,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS c, CAST(sum(x) AS BIGINT) AS t
      FROM daily),
cum AS (
  SELECT day_id,
         CAST(sum(x) OVER (ORDER BY day_id) AS BIGINT) AS cx,
         CAST(row_number() OVER (ORDER BY day_id) AS BIGINT) AS i
  FROM daily)
SELECT day_id AS change_day,
       CAST((SELECT c FROM n) * cx - i * (SELECT t FROM n) AS BIGINT)
           AS cusum_scaled,
       (SELECT c FROM n) AS n_days
FROM cum
ORDER BY abs((SELECT c FROM n) * cx - i * (SELECT t FROM n)) DESC, day_id
LIMIT 1
"""


def q_type_value_mad(sf_dir: str):
    """Per-group MEDIAN ABSOLUTE DEVIATION — the robust-statistics spread
    readout: two chained exact-quantile passes (median of value, then
    median of |value − median|). The per-group medians are UNROUNDED
    doubles broadcast as sorted arrays (group domain is the bounded
    event-type set; searchsorted gather, no per-row dict); |v − m| is the
    identical float chain on both engines, and the quantile interpolation
    is the proven quantile_cont-parity machinery."""
    from ..stages.groupops import exact_quantiles_by

    ev = _read(sf_dir, "events", ["event_type", "value"]).materialize()
    med = exact_quantiles_by(ev, "event_type", "value", [0.5],
                             round_to=None)
    mt = pa.concat_tables(
        [pa.table(b) for b in med.iter_batches(batch_format="pyarrow")]
    )
    keys = np.asarray(mt["event_type"].to_pylist(), dtype=np.str_)
    vals = mt["q"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    keys, vals = keys[order], vals[order]
    import ray as _ray

    lut = _ray.put((keys, vals))

    def dev(batch: pa.Table) -> pa.Table:
        k, m = _ray.get(lut)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=np.str_)
        v = batch["value"].to_numpy(zero_copy_only=False)
        mm = m[np.searchsorted(k, et)]
        return pa.table({
            "event_type": batch["event_type"],
            "d": pa.array(np.abs(v - mm), pa.float64()),
        })

    mad = exact_quantiles_by(
        ev.map_batches(dev, batch_format="pyarrow"), "event_type", "d",
        [0.5], round_to=6,
    )
    return mad.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "mad": b["q"].cast(pa.float64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["type_value_mad"] = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY 1),
dev AS (
  SELECT e.event_type, abs(e.value - med.m) AS d
  FROM events e JOIN med USING (event_type))
SELECT event_type, round(quantile_cont(d, 0.5), 6) AS mad
FROM dev GROUP BY 1
"""


def q_label_centroid_dists(sf_dir: str):
    """Embedding-space label geometry: pairwise squared distances between
    per-label centroid embeddings — the class-separation readout an
    embedding-quality audit wants. Exactness plan: components quantize to
    floor(1e6·v) integers inside the per-batch combiner (one bounded
    (label, component) groupby — |labels|·dim rows cross the shuffle,
    never vectors); centroids are the mirrored CAST(s AS DOUBLE)/n; the
    pair distance folds floor((1e6·d)·d) PER-COMPONENT integer terms, so
    no float summation order exists anywhere. The |labels|·dim sum table
    is the only driver materialization (documented bound)."""
    from ray.data.aggregate import Sum

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.stack(
            batch["embedding"].to_pandas().to_numpy()
        ).astype(np.float64)
        q = np.floor(v * 1000000.0).astype(np.int64)
        labs = np.unique(lab)
        rows_l, rows_c, rows_s, rows_n = [], [], [], []
        dim = q.shape[1]
        for lb in labs:
            m = lab == lb
            rows_l.append(np.full(dim, lb, np.int64))
            rows_c.append(np.arange(1, dim + 1, dtype=np.int64))
            rows_s.append(q[m].sum(axis=0))
            rows_n.append(np.full(dim, int(m.sum()), np.int64))
        return pa.table({
            "label": pa.array(np.concatenate(rows_l)),
            "comp": pa.array(np.concatenate(rows_c)),
            "s": pa.array(np.concatenate(rows_s)),
            "n": pa.array(np.concatenate(rows_n)),
        })

    sums = (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "comp"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )
    # |labels| × dim rows — the bounded driver materialization
    t = pa.concat_tables(
        [pa.table(b) for b in sums.iter_batches(batch_format="pyarrow")]
    )
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    comp = t["comp"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    labs = np.unique(lab)
    dim = int(comp.max())
    cent = np.zeros((labs.size, dim), np.float64)
    pos = {int(lb): i for i, lb in enumerate(labs)}
    for i in range(lab.size):
        cent[pos[int(lab[i])], comp[i] - 1] = s[i] / n[i]  # CAST(s AS DOUBLE)/n
    out_a, out_b, out_d = [], [], []
    for i in range(labs.size):
        for j in range(i + 1, labs.size):
            d = cent[i] - cent[j]
            terms = np.floor((1000000.0 * d) * d).astype(np.int64)
            out_a.append(int(labs[i]))
            out_b.append(int(labs[j]))
            out_d.append(int(terms.sum()))
    import ray.data as _rd

    return _rd.from_arrow(pa.table({
        "label_a": pa.array(out_a, pa.int64()),
        "label_b": pa.array(out_b, pa.int64()),
        "dist2_scaled": pa.array(out_d, pa.int64()),
    }))


ORACLE_SQL["label_centroid_dists"] = """
WITH comp AS (
  SELECT label, generate_subscripts(embedding, 1) AS c,
         unnest(embedding) AS v
  FROM embeddings),
sums AS (
  SELECT label, c,
         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))
              AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM comp GROUP BY 1, 2),
cent AS (SELECT label, c, CAST(s AS DOUBLE) / n AS v FROM sums)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(sum(CAST(floor((1000000.0 * (a.v - b.v)) * (a.v - b.v))
                     AS BIGINT)) AS BIGINT) AS dist2_scaled
FROM cent a JOIN cent b ON a.c = b.c AND a.label < b.label
GROUP BY 1, 2
"""


def q_track_turns(sf_dir: str):
    """Per-track heading-change analysis: count the sharp turns (heading
    change > 90°) along each user's (ts, event_id)-ordered ping track.
    The test is the SIGN of the consecutive-leg dot product — no atan2,
    no angle: both engines evaluate the identical float64 product chain,
    so the comparison is bit-mirrored the same way the sqrt distance
    chains are. One bucketed shuffle, vectorized across a bucket's users;
    users with < 3 pings have no interior vertex and emit nothing (the
    oracle's WHERE lag/lead IS NOT NULL does the same)."""
    from ..geo import mercator_xy
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_xy(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        x, y = mercator_xy(lon, lat)
        return pa.table({
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "event_id": batch["event_id"],
            "x": pa.array(x),
            "y": pa.array(y),
        })

    def turn_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        n = len(g)
        if n < 3:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=u.dtype if n else np.int64),
                "n_turns": pd.Series(dtype=np.int64),
                "n_interior": pd.Series(dtype=np.int64),
            })
        # interior vertex i: legs (i-1→i) and (i→i+1), same user on both
        dot = ((x[1:-1] - x[:-2]) * (x[2:] - x[1:-1])
               + (y[1:-1] - y[:-2]) * (y[2:] - y[1:-1]))
        same = (u[1:-1] == u[:-2]) & (u[2:] == u[1:-1])
        users, starts = np.unique(u, return_index=True)
        ends = np.concatenate([starts[1:], [n]])
        trn = np.zeros(n, np.int64)
        itr = np.zeros(n, np.int64)
        trn[1:-1] = np.where(same & (dot < 0), 1, 0)
        itr[1:-1] = np.where(same, 1, 0)
        cum_t = np.concatenate([[0], np.cumsum(trn)])
        cum_i = np.concatenate([[0], np.cumsum(itr)])
        n_turns = cum_t[ends] - cum_t[starts]
        n_int = cum_i[ends] - cum_i[starts]
        keep = n_int > 0
        return pd.DataFrame({
            "user_id": users[keep],
            "n_turns": n_turns[keep],
            "n_interior": n_int[keep],
        })

    return bucketed_group_apply(
        ds.map_batches(add_xy, batch_format="pyarrow"),
        ["user_id"], turn_bucket, num_buckets=16,
    )


ORACLE_SQL["track_turns"] = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {_MERC} * radians(-77.05 + (event_id % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((event_id // 1000) % 1000) * 1e-4)/2)) AS y
  FROM events),
w3 AS (
  SELECT user_id, x, y,
         lag(x) OVER w AS px, lag(y) OVER w AS py,
         lead(x) OVER w AS nx, lead(y) OVER w AS ny
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
turns AS (
  SELECT user_id,
         CASE WHEN (x - px) * (nx - x) + (y - py) * (ny - y) < 0
              THEN 1 ELSE 0 END AS trn
  FROM w3 WHERE px IS NOT NULL AND nx IS NOT NULL)
SELECT user_id, CAST(sum(trn) AS BIGINT) AS n_turns,
       CAST(count(*) AS BIGINT) AS n_interior
FROM turns GROUP BY 1
"""


def _formula_boxes(ds, key_col: str, wmod: int, hmod: int):
    """(id, xmin, ymin, xmax, ymax) planar boxes from PURE INTEGER
    arithmetic: center (11·(k%1000), 14·((k//1000)%1000)) m — the formula
    lattice's approximate planar pitch — half-extents (1 + k % wmod,
    1 + k % hmod) m. Every edge is an integer-valued double, so engine
    and oracle agree bit-exactly with no trig in the loop (raw mercator
    edges differ from DuckDB's radians/ln/tan by ulps, which a value-hash
    compare of raw doubles would see)."""

    def boxes(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (11 * (key % 1000)).astype(np.float64)
        y = (14 * ((key // 1000) % 1000)).astype(np.float64)
        hw = (1 + key % wmod).astype(np.float64)
        hh = (1 + key % hmod).astype(np.float64)
        return pa.table(
            {
                "id": pa.array(key),
                "xmin": pa.array(x - hw),
                "ymin": pa.array(y - hh),
                "xmax": pa.array(x + hw),
                "ymax": pa.array(y + hh),
            }
        )

    return ds.map_batches(boxes, batch_format="pyarrow")


def q_bbox_join(sf_dir: str):
    """2D box-intersection join (stages.spatial.bbox_intersection_join,
    PBSM canonical-cell dedup): part boxes × customer boxes, closed-
    interval overlap, output (part_id, cust_id, overlap_m2)."""
    from ..stages.spatial import bbox_intersection_join

    parts = _formula_boxes(
        _read(sf_dir, "part", ["p_partkey"]), "p_partkey", 13, 11
    )
    custs = _formula_boxes(
        _read(sf_dir, "customer", ["c_custkey"]), "c_custkey", 13, 11
    )
    out = bbox_intersection_join(parts, custs)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["part_id", "cust_id", "overlap_m2"])

    return out.map_batches(rename, batch_format="pyarrow")


_BOX_SQL = """
  SELECT {k} AS id,
         CAST(11 * ({k} % 1000) - (1 + {k} % 13) AS DOUBLE) AS xmin,
         CAST(14 * (({k} // 1000) % 1000) - (1 + {k} % 11) AS DOUBLE) AS ymin,
         CAST(11 * ({k} % 1000) + (1 + {k} % 13) AS DOUBLE) AS xmax,
         CAST(14 * (({k} // 1000) % 1000) + (1 + {k} % 11) AS DOUBLE) AS ymax
  FROM {t}"""

ORACLE_SQL["bbox_join"] = f"""
WITH a AS ({_BOX_SQL.format(k='p_partkey', t='part')}),
b AS ({_BOX_SQL.format(k='c_custkey', t='customer')})
SELECT a.id AS part_id, b.id AS cust_id,
       (least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin))
     * (least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin)) AS overlap_m2
FROM a JOIN b
  ON a.xmin <= b.xmax AND b.xmin <= a.xmax
 AND a.ymin <= b.ymax AND b.ymin <= a.ymax
"""


def q_areal_interp(sf_dir: str):
    """Areal interpolation (stages.spatial.areal_interpolate): transfer a
    per-part integer measure (1 + k % 97) onto customer boxes by overlap
    fraction of the SOURCE area — the census-tract→grid value-transfer
    workload. Terms floored to a 1e-6 grid and summed as integers, so the
    result is order-free and SQL-mirrorable bit-exactly."""
    from ..stages.spatial import areal_interpolate

    parts = _formula_boxes(
        _read(sf_dir, "part", ["p_partkey"]), "p_partkey", 13, 11
    )

    def addv(batch: pa.Table) -> pa.Table:
        k = batch["id"].to_numpy(zero_copy_only=False)
        return batch.append_column("val", pa.array(1 + k % 97))

    custs = _formula_boxes(
        _read(sf_dir, "customer", ["c_custkey"]), "c_custkey", 13, 11
    )
    out = areal_interpolate(
        parts.map_batches(addv, batch_format="pyarrow"), custs, "val"
    )
    return out.map_batches(
        lambda b: pa.table({
            "cust_id": b["id"].cast(pa.int64()),
            "interp_scaled": b["interp_scaled"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["areal_interp"] = f"""
WITH a AS ({_BOX_SQL.format(k='p_partkey', t='part')}),
b AS ({_BOX_SQL.format(k='c_custkey', t='customer')})
SELECT b.id AS cust_id,
       CAST(sum(CAST(floor(
         1000000.0 * (1 + a.id % 97)
                   * ((least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin))
                    * (least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin)))
                   / ((a.xmax - a.xmin) * (a.ymax - a.ymin))
       ) AS BIGINT)) AS BIGINT) AS interp_scaled
FROM a JOIN b
  ON a.xmin <= b.xmax AND b.xmin <= a.xmax
 AND a.ymin <= b.ymax AND b.ymin <= a.ymax
GROUP BY 1
"""


def q_hotspot_cells(sf_dir: str):
    """Local-maximum hotspot cells (stages.spatial.hotspot_cells): 16 m
    grid over customer formula points, keep cells ≥ 3 points and strictly
    above every 3×3 neighbor — sparse non-max suppression, ≤ 9 splat rows
    per non-empty cell across the shuffle."""
    from ..stages.groupops import bucketed_aggregate
    from ..stages.spatial import hotspot_cells

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def cells(batch: pa.Table) -> pa.Table:
        from ..geo import mercator_xy

        lon, lat = _formula_coords(
            batch["c_custkey"].to_numpy(zero_copy_only=False)
        )
        x, y = mercator_xy(lon, lat)
        return pa.table({
            "cell_x": pa.array(np.floor(x / 16.0).astype(np.int64)),
            "cell_y": pa.array(np.floor(y / 16.0).astype(np.int64)),
        })

    counts = bucketed_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["cell_x", "cell_y"], {"n": ("cell_x", "size")},
    )
    return hotspot_cells(counts, min_count=3)


ORACLE_SQL["hotspot_cells"] = f"""
WITH pts AS (
  SELECT {_COORD_SQL.format(k='c_custkey')} FROM customer),
proj AS (
  SELECT CAST(floor({_MERC} * radians(lon) / 16.0) AS BIGINT) AS cell_x,
         CAST(floor({_MERC} * ln(tan(pi()/4 + radians(lat)/2)) / 16.0) AS BIGINT)
             AS cell_y
  FROM pts),
counts AS (SELECT cell_x, cell_y, count(*) AS n FROM proj GROUP BY 1, 2),
k(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
nb AS (
  SELECT c.cell_x + k.dx AS cell_x, c.cell_y + k.dy AS cell_y,
         max(c.n) AS nbr_max
  FROM counts c CROSS JOIN k GROUP BY 1, 2)
SELECT c.cell_x, c.cell_y, CAST(c.n AS BIGINT) AS n,
       CAST(coalesce(nb.nbr_max, 0) AS BIGINT) AS nbr_max
FROM counts c LEFT JOIN nb USING (cell_x, cell_y)
WHERE c.n >= 3 AND c.n > coalesce(nb.nbr_max, 0)
"""


def q_cell_heatmap(sf_dir: str):
    """Sparse-grid heatmap: per-cell customer counts convolved with a 3×3
    binomial kernel (stages.spatial.kernel_smooth_counts) — 9 rows per
    non-empty cell cross the shuffle, integer weights → exact parity."""
    from ..stages.spatial import kernel_smooth_counts

    return kernel_smooth_counts(q_cell_assign(sf_dir))


ORACLE_SQL["cell_heatmap"] = f"""
WITH pts AS (
  SELECT {_COORD_SQL.format(k='c_custkey')} FROM customer),
proj AS (
  SELECT CAST(floor({_MERC} * radians(lon) / 256.0) AS BIGINT) AS cell_x,
         CAST(floor({_MERC} * ln(tan(pi()/4 + radians(lat)/2)) / 256.0) AS BIGINT)
             AS cell_y
  FROM pts),
counts AS (SELECT cell_x, cell_y, count(*) AS n FROM proj GROUP BY 1, 2),
k(dx, dy, w) AS (VALUES (-1,-1,1),(-1,0,2),(-1,1,1),(0,-1,2),(0,0,4),(0,1,2),
                        (1,-1,1),(1,0,2),(1,1,1))
SELECT c.cell_x + k.dx AS cell_x, c.cell_y + k.dy AS cell_y,
       CAST(sum(k.w * c.n) AS BIGINT) AS heat
FROM counts c CROSS JOIN k GROUP BY 1, 2
"""


# zonal-statistics zones: convex CCW quads in GRID units over the customer
# cell band (x ∈ [-33506, -33461] at every sf; y stays within ~18358-18364
# because the formula latitude spans ≤ 0.1°). .1–.7 fractional vertices
# keep cell centers (.5) off every edge; zones deliberately overlap
# (independent aggregation regions double-count by design).
_ZONES = [
    (1, [(-33506.3, 18358.2), (-33494.7, 18358.4), (-33495.2, 18363.6),
         (-33506.1, 18363.3)]),
    (2, [(-33497.4, 18358.1), (-33484.3, 18358.3), (-33485.6, 18363.4),
         (-33498.1, 18363.2)]),
    (3, [(-33488.2, 18358.3), (-33472.4, 18358.2), (-33473.3, 18363.6),
         (-33489.1, 18363.2)]),
    (4, [(-33476.2, 18358.4), (-33460.3, 18358.3), (-33461.6, 18363.2),
         (-33477.4, 18363.3)]),
]


def q_zonal_stats(sf_dir: str):
    """Raster→vector ZONAL STATISTICS (the inverse of cell_heatmap's
    vector→raster splat): per polygon zone, count/sum/max of the smoothed
    heat raster's cells whose centers fall inside the zone. Zones are a
    broadcast constant; the raster streams through one half-plane filter
    map and a 4-group aggregate — no shuffle beyond the heatmap's own."""
    from ..stages.spatial import kernel_smooth_counts, zonal_stats

    return zonal_stats(kernel_smooth_counts(q_cell_assign(sf_dir)), _ZONES)


def _zone_halfplane_sql(a: str, b: str) -> str:
    # literal-mirrored with stages.spatial.zonal_stats' numpy expression
    return (f"((z.x{b} - z.x{a}) * (c.cy - z.y{a})"
            f" - (z.y{b} - z.y{a}) * (c.cx - z.x{a})) > 0")


ORACLE_SQL["zonal_stats"] = f"""
WITH pts AS (
  SELECT {_COORD_SQL.format(k='c_custkey')} FROM customer),
proj AS (
  SELECT CAST(floor({_MERC} * radians(lon) / 256.0) AS BIGINT) AS cell_x,
         CAST(floor({_MERC} * ln(tan(pi()/4 + radians(lat)/2)) / 256.0) AS BIGINT)
             AS cell_y
  FROM pts),
counts AS (SELECT cell_x, cell_y, count(*) AS n FROM proj GROUP BY 1, 2),
k(dx, dy, w) AS (VALUES (-1,-1,1),(-1,0,2),(-1,1,1),(0,-1,2),(0,0,4),(0,1,2),
                        (1,-1,1),(1,0,2),(1,1,1)),
heat AS (
  SELECT c.cell_x + k.dx AS cell_x, c.cell_y + k.dy AS cell_y,
         sum(k.w * c.n) AS heat
  FROM counts c CROSS JOIN k GROUP BY 1, 2),
cells AS (
  SELECT cell_x + 0.5 AS cx, cell_y + 0.5 AS cy, heat FROM heat),
zones(zone_id, x1, y1, x2, y2, x3, y3, x4, y4) AS (VALUES
  {",".join("(%d, %r, %r, %r, %r, %r, %r, %r, %r)" % (
      (zid,) + tuple(v for p in quad for v in p)) for zid, quad in _ZONES)})
SELECT z.zone_id, count(*) AS n_cells,
       CAST(sum(c.heat) AS BIGINT) AS total_heat,
       CAST(max(c.heat) AS BIGINT) AS max_heat
FROM cells c CROSS JOIN zones z
WHERE {_zone_halfplane_sql('1', '2')}
  AND {_zone_halfplane_sql('2', '3')}
  AND {_zone_halfplane_sql('3', '4')}
  AND {_zone_halfplane_sql('4', '1')}
GROUP BY z.zone_id
"""


def q_speeding_events(sf_dir: str):
    """Movement-anomaly flags: per-user consecutive-ping speed (integer
    decimeter legs / integer microsecond gaps — both exact, so the float
    division is bit-identical cross-engine) above 0.5 m/s. Same bucketed
    single-shuffle plan as track_lengths, keeping per-leg rows."""
    from ..geo import mercator_xy
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_xy(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        x, y = mercator_xy(lon, lat)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    pts = ds.map_batches(add_xy, batch_format="pyarrow")

    def speed_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        t_us = g["ts"].astype("int64").to_numpy()
        d = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
        leg_dm = np.floor(d * 10)
        dt_us = np.diff(t_us)
        same = (u[1:] == u[:-1]) & (dt_us > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            speed = (leg_dm / 10.0) / (dt_us / 1000000.0)
        keep = same & (speed > 0.5)
        return pd.DataFrame(
            {
                "user_id": u[1:][keep],
                "event_id": g["event_id"].to_numpy()[1:][keep],
                "speed_mps": speed[keep],
            }
        )

    return bucketed_group_apply(pts, ["user_id"], speed_bucket, num_buckets=16)


ORACLE_SQL["speeding_events"] = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {_MERC} * radians(-77.05 + (event_id % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((event_id // 1000) % 1000) * 1e-4)/2)) AS y
  FROM events),
lagd AS (
  SELECT user_id, event_id, x, y, ts,
         lag(x) OVER w AS px, lag(y) OVER w AS py, lag(ts) OVER w AS pts_
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
legs AS (
  SELECT user_id, event_id,
         (CAST(floor(sqrt((x - px) * (x - px) + (y - py) * (y - py)) * 10)
               AS BIGINT) / 10.0)
         / (CAST(epoch_us(ts) - epoch_us(pts_) AS BIGINT) / 1000000.0) AS speed_mps
  FROM lagd
  WHERE px IS NOT NULL AND epoch_us(ts) - epoch_us(pts_) > 0)
SELECT user_id, event_id, speed_mps FROM legs WHERE speed_mps > 0.5
"""


def q_linestring_lengths(sf_dir: str):
    """Geometry-payload path: synthesize 4-vertex WKB LINESTRINGs on the
    integer planar lattice (one blob per part key), ship the binary
    column through the object store, then PARSE the WKB back and measure
    polyline length (integer-decimeter legs). The oracle recomputes the
    same vertices arithmetically — parity proves the encode→parse round
    trip, not just the math."""
    from ..geo import parse_wkb_linestring, wkb_linestring

    ds = _read(sf_dir, "part", ["p_partkey"])

    def encode(batch: pa.Table) -> pa.Table:
        key = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for k in key:
            ki = k + 7 * np.arange(4, dtype=np.int64)
            coords = np.stack(
                [(11 * (ki % 1000)).astype(np.float64),
                 (14 * ((ki // 1000) % 1000)).astype(np.float64)], axis=1
            )
            blobs.append(wkb_linestring(coords))
        return pa.table(
            {"id": pa.array(key), "wkb": pa.array(blobs, pa.large_binary())}
        )

    def measure(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        n_v = np.empty(ids.size, np.int64)
        dm = np.empty(ids.size, np.int64)
        for i, blob in enumerate(batch["wkb"].to_pylist()):
            c = parse_wkb_linestring(blob)
            n_v[i] = len(c)
            seg = np.sqrt(np.diff(c[:, 0]) ** 2 + np.diff(c[:, 1]) ** 2)
            dm[i] = int(np.floor(seg * 10).sum())
        return pa.table(
            {
                "id": pa.array(ids),
                "n_vertices": pa.array(n_v),
                "length_m": pa.array(dm / 10.0),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow").map_batches(
        measure, batch_format="pyarrow"
    )


def _linestring_oracle_sql() -> str:
    legs = []
    for i in range(3):
        a, b = 7 * i, 7 * (i + 1)
        dx = f"(11 * ((p_partkey + {b}) % 1000) - 11 * ((p_partkey + {a}) % 1000))"
        dy = (f"(14 * (((p_partkey + {b}) // 1000) % 1000) "
              f"- 14 * (((p_partkey + {a}) // 1000) % 1000))")
        legs.append(
            f"CAST(floor(sqrt(CAST({dx} * {dx} + {dy} * {dy} AS DOUBLE)) * 10) AS BIGINT)"
        )
    total = " + ".join(legs)
    return f"""
SELECT p_partkey AS id, CAST(4 AS BIGINT) AS n_vertices,
       ({total}) / 10.0 AS length_m
FROM part
"""


ORACLE_SQL["linestring_lengths"] = _linestring_oracle_sql()


def q_triangle_pip_join(sf_dir: str):
    """Distributed polygon-containment join (triangle case): part-derived
    lattice triangles × customer lattice points, closed half-plane sign
    tests (stages.spatial.triangle_point_join). All vertex/point coords
    are integer-valued doubles → exact sign parity with the SQL oracle."""
    from ..stages.spatial import triangle_point_join

    part = _read(sf_dir, "part", ["p_partkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def tris(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x0 = (11 * (k % 1000)).astype(np.float64)
        y0 = (14 * ((k // 1000) % 1000)).astype(np.float64)
        return pa.table(
            {
                "id": pa.array(k),
                "ax": pa.array(x0), "ay": pa.array(y0),
                "bx": pa.array(x0 + (5 + k % 41)), "by": pa.array(y0 - (3 + k % 23)),
                "cx": pa.array(x0 - (4 + k % 29)), "cy": pa.array(y0 + (6 + k % 37)),
            }
        )

    def pts(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(k),
                "x": pa.array((11 * (k % 1000)).astype(np.float64)),
                "y": pa.array((14 * ((k // 1000) % 1000)).astype(np.float64)),
            }
        )

    return triangle_point_join(
        part.map_batches(tris, batch_format="pyarrow"),
        cust.map_batches(pts, batch_format="pyarrow"),
    )


ORACLE_SQL["triangle_pip_join"] = """
WITH t AS (
  SELECT p_partkey AS id,
         CAST(11 * (p_partkey % 1000) AS DOUBLE) AS ax,
         CAST(14 * ((p_partkey // 1000) % 1000) AS DOUBLE) AS ay,
         CAST(11 * (p_partkey % 1000) + 5 + p_partkey % 41 AS DOUBLE) AS bx,
         CAST(14 * ((p_partkey // 1000) % 1000) - (3 + p_partkey % 23) AS DOUBLE) AS by,
         CAST(11 * (p_partkey % 1000) - (4 + p_partkey % 29) AS DOUBLE) AS cx,
         CAST(14 * ((p_partkey // 1000) % 1000) + 6 + p_partkey % 37 AS DOUBLE) AS cy
  FROM part),
tb AS (
  SELECT *, least(least(ax, bx), cx) AS xmin, greatest(greatest(ax, bx), cx) AS xmax,
         least(least(ay, by), cy) AS ymin, greatest(greatest(ay, by), cy) AS ymax
  FROM t),
p AS (
  SELECT c_custkey AS id,
         CAST(11 * (c_custkey % 1000) AS DOUBLE) AS x,
         CAST(14 * ((c_custkey // 1000) % 1000) AS DOUBLE) AS y
  FROM customer)
SELECT t.id AS tri_id, p.id AS pt_id
FROM tb t JOIN p
  ON p.x BETWEEN t.xmin AND t.xmax
 AND p.y BETWEEN t.ymin AND t.ymax
WHERE ((((t.bx - t.ax) * (p.y - t.ay) - (t.by - t.ay) * (p.x - t.ax)) >= 0
    AND ((t.cx - t.bx) * (p.y - t.by) - (t.cy - t.by) * (p.x - t.bx)) >= 0
    AND ((t.ax - t.cx) * (p.y - t.cy) - (t.ay - t.cy) * (p.x - t.cx)) >= 0)
   OR (((t.bx - t.ax) * (p.y - t.ay) - (t.by - t.ay) * (p.x - t.ax)) <= 0
    AND ((t.cx - t.bx) * (p.y - t.by) - (t.cy - t.by) * (p.x - t.bx)) <= 0
    AND ((t.ax - t.cx) * (p.y - t.cy) - (t.ay - t.cy) * (p.x - t.cx)) <= 0))
  AND ((t.bx - t.ax) * (t.cy - t.ay) - (t.by - t.ay) * (t.cx - t.ax)) <> 0
"""


def q_tile_pyramid(sf_dir: str):
    """Multi-zoom tile occupancy in TWO shuffles: z14 counts (shuffle #1
    moves ≤ one row per point), then each z14 tile SPLATS up the pyramid
    (z ∈ {8, 10, 12, 14} via integer >> rollup) and a second groupby sums
    — shuffle #2 moves tiles × levels, ≪ points. The S15 '-zg' pyramid
    statistics pass as a standalone operator."""
    from ray.data.aggregate import Sum

    from ..stages.tiles import tile_xy

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def t14(batch: pa.Table) -> pa.Table:
        lon, lat = _formula_coords(
            batch["c_custkey"].to_numpy(zero_copy_only=False)
        )
        tx, ty = tile_xy(lon, lat, 14)
        return pa.table({"tx": pa.array(tx), "ty": pa.array(ty)})

    counts14 = (
        ds.map_batches(t14, batch_format="pyarrow")
        .groupby(["tx", "ty"])
        .aggregate(Count(alias_name="n"))
    )

    levels = [(8, 64), (10, 16), (12, 4), (14, 1)]

    def splat(batch: pa.Table) -> pa.Table:
        tx = batch["tx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch["ty"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        zs, ds_ = (np.array([z for z, _ in levels], np.int64),
                   np.array([d for _, d in levels], np.int64))
        return pa.table(
            {
                "z": pa.array(np.tile(zs, tx.size)),
                "tx": pa.array((tx[:, None] // ds_[None, :]).ravel()),
                "ty": pa.array((ty[:, None] // ds_[None, :]).ravel()),
                "wn": pa.array(np.repeat(n, len(levels))),
            }
        )

    out = (
        counts14.map_batches(splat, batch_format="pyarrow")
        .groupby(["z", "tx", "ty"])
        .aggregate(Sum("wn", alias_name="n"))
    )

    def cast_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "z": batch["z"].cast(pa.int64()),
                "tx": batch["tx"].cast(pa.int64()),
                "ty": batch["ty"].cast(pa.int64()),
                "n": batch["n"].cast(pa.int64()),
            }
        )

    return out.map_batches(cast_out, batch_format="pyarrow")


ORACLE_SQL["tile_pyramid"] = """
WITH pts AS (
  SELECT -77.05 + (c_custkey % 1000) * 1e-4 AS lon,
         38.85 + ((c_custkey // 1000) % 1000) * 1e-4 AS lat
  FROM customer),
t14 AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * 16384) AS BIGINT) AS tx,
         CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi())
                    / 2.0 * 16384) AS BIGINT) AS ty,
         count(*) AS n
  FROM pts GROUP BY 1, 2),
levels(z, d) AS (VALUES (CAST(8 AS BIGINT), CAST(64 AS BIGINT)),
                        (10, 16), (12, 4), (14, 1))
SELECT l.z, t.tx // l.d AS tx, t.ty // l.d AS ty, CAST(sum(t.n) AS BIGINT) AS n
FROM t14 t CROSS JOIN levels l
GROUP BY 1, 2, 3
"""


def q_price_key_corr(sf_dir: str):
    """Distributed EXACT Pearson correlation (stages.groupops.exact_corr):
    order key bucket (o_orderkey % 1000) vs totalprice in integer cents —
    Python-int moment partials, driver combine, HUGEINT-parity float
    finish. One row: (n_orders, corr_key_price)."""
    from ..stages.groupops import exact_corr
    from .queries import _cents

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def to_ints(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "x": pa.array(k % 1000),
                "y": pa.array(
                    _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
                ),
            }
        )

    n, corr = exact_corr(ds.map_batches(to_ints, batch_format="pyarrow"), "x", "y")
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "corr_key_price": pa.array([corr], pa.float64()),
        }
    )


ORACLE_SQL["price_key_corr"] = """
WITH m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(o_orderkey % 1000 AS HUGEINT)) AS sx,
         sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS HUGEINT)) AS sy,
         sum(CAST(o_orderkey % 1000 AS HUGEINT)
             * CAST(o_orderkey % 1000 AS HUGEINT)) AS sxx,
         sum(CAST(o_orderkey % 1000 AS HUGEINT)
             * CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS HUGEINT)) AS sxy,
         sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS HUGEINT)
             * CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS HUGEINT)) AS syy
  FROM orders)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_key_price
FROM m
"""


def q_mm_pack(sf_dir: str):
    """Multimodal sequence packing: documents where every third doc
    carries an image patch-token cost (576, ViT-L/14 @ 336px) on top of
    its text tokens; shards fill a 4096-token budget in doc_id order via
    the distributed two-phase scan (stages.splits.pack_sequences over the
    combined weight)."""
    from ..stages.splits import pack_sequences
    from ..stages.textstats import token_count_batch

    docs = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(token_count_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
    )

    def weight(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(did),
             "mm_tokens": pa.array(nt + 576 * (did % 3 == 0))}
        )

    return pack_sequences(
        docs.map_batches(weight, batch_format="pyarrow"),
        "doc_id", "mm_tokens", budget=4096, range_size=128,
    )


ORACLE_SQL["mm_pack"] = """
SELECT doc_id, mm_tokens,
       CAST(floor(coalesce(sum(mm_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / 4096) AS BIGINT) AS shard_id
FROM (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT)
             + 576 * CAST(doc_id % 3 = 0 AS BIGINT) AS mm_tokens
      FROM documents)
"""


def q_snap_to_segments(sf_dir: str):
    """Map-matching: snap customer lattice points to their nearest
    part-derived lattice segment within 50 m
    (stages.spatial.snap_points_to_segments). Nearest by decimeter-floored
    distance with seg-id tie-break — deterministic and SQL-mirrored; all
    inputs integer-valued doubles, so the clamped-projection math is
    bit-identical cross-engine."""
    from ..stages.spatial import snap_points_to_segments

    part = _read(sf_dir, "part", ["p_partkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def segs(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x0 = (11 * (k % 1000)).astype(np.float64)
        y0 = (14 * ((k // 1000) % 1000)).astype(np.float64)
        return pa.table(
            {
                "id": pa.array(k),
                "ax": pa.array(x0), "ay": pa.array(y0),
                "bx": pa.array(x0 + (10 + k % 53)),
                "by": pa.array(y0 - (5 + k % 31)),
            }
        )

    def pts(batch: pa.Table) -> pa.Table:
        # integer offsets (x: k%9-4, y: k%11-5) push points OFF the
        # segment-start lattice so the snap exercises nontrivial clamped
        # projections (varied t, nonzero floor-decimeter distances) — the
        # original formula placed every point exactly on its own segment's
        # start vertex, so the oracle only ever validated d=0.0 / t=0.0
        k = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(k),
                "x": pa.array((11 * (k % 1000) + k % 9 - 4).astype(np.float64)),
                "y": pa.array(
                    (14 * ((k // 1000) % 1000) + k % 11 - 5).astype(np.float64)
                ),
            }
        )

    return snap_points_to_segments(
        cust.map_batches(pts, batch_format="pyarrow"),
        part.map_batches(segs, batch_format="pyarrow"),
        radius_m=50.0,
    )


ORACLE_SQL["snap_to_segments"] = """
WITH s AS (
  SELECT p_partkey AS id,
         CAST(11 * (p_partkey % 1000) AS DOUBLE) AS ax,
         CAST(14 * ((p_partkey // 1000) % 1000) AS DOUBLE) AS ay,
         CAST(11 * (p_partkey % 1000) + 10 + p_partkey % 53 AS DOUBLE) AS bx,
         CAST(14 * ((p_partkey // 1000) % 1000) - (5 + p_partkey % 31) AS DOUBLE) AS by
  FROM part),
p AS (
  SELECT c_custkey AS id,
         CAST(11 * (c_custkey % 1000) + c_custkey % 9 - 4 AS DOUBLE) AS x,
         CAST(14 * ((c_custkey // 1000) % 1000) + c_custkey % 11 - 5 AS DOUBLE) AS y
  FROM customer),
cand AS (
  SELECT p.id AS pt_id, s.id AS seg_id, p.x, p.y, s.ax, s.ay, s.bx, s.by,
         CASE WHEN (s.bx - s.ax) * (s.bx - s.ax) + (s.by - s.ay) * (s.by - s.ay) > 0
              THEN least(greatest(((p.x - s.ax) * (s.bx - s.ax) + (p.y - s.ay) * (s.by - s.ay))
                                  / ((s.bx - s.ax) * (s.bx - s.ax) + (s.by - s.ay) * (s.by - s.ay)), 0.0), 1.0)
              ELSE 0.0 END AS t
  FROM p JOIN s
    ON p.x BETWEEN least(s.ax, s.bx) - 50 AND greatest(s.ax, s.bx) + 50
   AND p.y BETWEEN least(s.ay, s.by) - 50 AND greatest(s.ay, s.by) + 50),
d AS (
  SELECT pt_id, seg_id, t,
         sqrt((x - (ax + t * (bx - ax))) * (x - (ax + t * (bx - ax)))
            + (y - (ay + t * (by - ay))) * (y - (ay + t * (by - ay)))) AS rawd
  FROM cand),
r AS (
  SELECT pt_id, seg_id, floor(rawd * 10) / 10.0 AS dist_m, t,
         row_number() OVER (PARTITION BY pt_id
                            ORDER BY floor(rawd * 10) / 10.0, seg_id) AS rn
  FROM d WHERE rawd <= 50.0)
SELECT pt_id, seg_id, dist_m, t FROM r WHERE rn = 1
"""


def q_user_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each active day offset. Plan: distinct (user, day) via groupby →
    per-user min day → bucketed hash join (ids only) → (cohort, offset)
    count — every shuffle moves one row per user-day, never raw events."""
    from ..stages.joins import bucket_hash_join

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def user_day(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        return pa.table({"user_id": pa.array(u), "day": pa.array(day)})

    ud = (
        ds.map_batches(user_day, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="nn"))
        .map_batches(
            lambda b: pa.table({"user_id": b["user_id"].cast(pa.int64()),
                                "day": b["day"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    fd = ud.groupby("user_id").min("day").map_batches(
        lambda b: pa.table({"user_id": b["user_id"].cast(pa.int64()),
                            "cohort_day": b["min(day)"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    joined = bucket_hash_join(ud, fd, left_on="user_id", right_on="user_id")

    def offs(batch: pa.Table) -> pa.Table:
        day = batch["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        cd = batch["cohort_day"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"cohort_day": pa.array(cd), "day_offset": pa.array(day - cd)}
        )

    out = (
        joined.map_batches(offs, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Count(alias_name="n_users"))
    )
    return out.map_batches(
        lambda b: pa.table({
            "cohort_day": b["cohort_day"].cast(pa.int64()),
            "day_offset": b["day_offset"].cast(pa.int64()),
            "n_users": b["n_users"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["user_retention"] = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
fd AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
SELECT f.cohort_day, u.day - f.cohort_day AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud u JOIN fd f ON u.user_id = f.user_id
GROUP BY 1, 2
"""


def q_peak_concurrency(sf_dir: str):
    """Global peak session concurrency (interval sweep): sessions are
    [ts, ts + (60 + event_id % 600) s); boundaries (+1 start, −1 end)
    sorted by (t, delta) — ends before starts at the same instant —
    running-sum max, plus the first instant attaining it.

    Distributed two-phase scan (pack_sequences' construction over TIME
    ranges): per-6h-range delta sums → driver prefix of RANGE OFFSETS
    only → per-range sorted cumsum + offset → one (max, first-t) row per
    range → driver picks the global (max, min t). No sequential global
    sort; ranges are independent."""
    from ..stages.groupops import bucketed_group_apply

    RANGE_US = 6 * 3600 * 1_000_000

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def bounds(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t0 = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t1 = t0 + (60 + eid % 600) * 1_000_000
        t = np.concatenate([t0, t1])
        d = np.concatenate(
            [np.ones(eid.size, np.int64), -np.ones(eid.size, np.int64)]
        )
        return pa.table(
            {"rng": pa.array(t // RANGE_US), "t": pa.array(t), "d": pa.array(d)}
        )

    b = ds.map_batches(bounds, batch_format="pyarrow").materialize()

    # phase 1: per-range delta totals → exclusive prefix offsets (driver
    # holds #ranges scalars, never rows)
    totals = {
        r["rng"]: r["sum(d)"]
        for r in b.groupby("rng").sum("d").take_all()
    }
    offsets, acc = {}, 0
    for rng in sorted(totals):
        offsets[rng] = acc
        acc += totals[rng]

    def range_max(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rng, gr in g.groupby("rng"):
            gr = gr.sort_values(["t", "d"], kind="mergesort")
            cum = offsets[int(rng)] + gr["d"].to_numpy().cumsum()
            i = int(np.argmax(cum))
            out.append((int(cum[i]), int(gr["t"].to_numpy()[i])))
        return pd.DataFrame(out, columns=["mx", "t_at"]).astype(np.int64)

    parts = bucketed_group_apply(b, ["rng"], range_max, num_buckets=16).take_all()
    if not parts:  # no sessions at all
        return pa.table({
            "peak_concurrency": pa.array([0], pa.int64()),
            "at_us": pa.array([0], pa.int64()),
        })
    peak, at = max(((p["mx"], -p["t_at"]) for p in parts))
    return pa.table(
        {
            "peak_concurrency": pa.array([int(peak)], pa.int64()),
            "at_us": pa.array([int(-at)], pa.int64()),
        }
    )


ORACLE_SQL["peak_concurrency"] = """
WITH b AS (
  SELECT epoch_us(ts) AS t, 1 AS d FROM events
  UNION ALL
  SELECT epoch_us(ts) + (60 + event_id % 600) * 1000000, -1 FROM events),
r AS (
  SELECT t, sum(d) OVER (ORDER BY t, d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM b)
SELECT CAST(c AS BIGINT) AS peak_concurrency, CAST(t AS BIGINT) AS at_us
FROM r ORDER BY c DESC, t ASC LIMIT 1
"""


def q_snapshot_diff(sf_dir: str):
    """Nightly change-data-capture: diff two deterministic order snapshots
    (old = keys % 89 ≠ 0, new = keys % 97 ≠ 0 with every 7th price bumped
    one cent-hundred) → (o_orderkey, change_type ∈ added/removed/changed).
    One bucketed outer hash join on integer-cent values; unchanged rows
    are filtered in the classify kernel, so output ≪ input."""
    from ..stages.joins import bucket_hash_join
    from .queries import _cents

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def snap(which: str):
        def _s(batch: pa.Table) -> pa.Table:
            k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
            if which == "old":
                keep = k % 89 != 0
                return pa.table({"id_old": pa.array(k[keep]),
                                 "v_old": pa.array(v[keep])})
            keep = k % 97 != 0
            v = v + 100 * (k % 7 == 0)
            return pa.table({"id_new": pa.array(k[keep]),
                             "v_new": pa.array(v[keep])})

        return _s

    old = ds.map_batches(snap("old"), batch_format="pyarrow")
    new = ds.map_batches(snap("new"), batch_format="pyarrow")
    joined = bucket_hash_join(old, new, "id_old", "id_new", how="outer")

    def classify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        has_old = pc.is_valid(batch["id_old"]).to_numpy(zero_copy_only=False)
        has_new = pc.is_valid(batch["id_new"]).to_numpy(zero_copy_only=False)
        vo = pc.fill_null(batch["v_old"], -1).to_numpy(zero_copy_only=False)
        vn = pc.fill_null(batch["v_new"], -1).to_numpy(zero_copy_only=False)
        ko = pc.fill_null(batch["id_old"], 0).to_numpy(zero_copy_only=False)
        kn = pc.fill_null(batch["id_new"], 0).to_numpy(zero_copy_only=False)
        typ = np.where(
            ~has_old, "added", np.where(~has_new, "removed", np.where(
                vo != vn, "changed", ""))
        )
        keep = typ != ""
        return pa.table(
            {
                "o_orderkey": pa.array(
                    np.where(has_old, ko, kn)[keep].astype(np.int64)
                ),
                "change_type": pa.array(typ[keep], pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


ORACLE_SQL["snapshot_diff"] = """
WITH old AS (
  SELECT o_orderkey AS id,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM orders WHERE o_orderkey % 89 <> 0),
new AS (
  SELECT o_orderkey AS id,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         + 100 * CAST(o_orderkey % 7 = 0 AS BIGINT) AS v
  FROM orders WHERE o_orderkey % 97 <> 0)
SELECT COALESCE(o.id, n.id) AS o_orderkey,
       CASE WHEN o.id IS NULL THEN 'added'
            WHEN n.id IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type
FROM old o FULL OUTER JOIN new n ON o.id = n.id
WHERE o.id IS NULL OR n.id IS NULL OR o.v <> n.v
"""


def q_duplicate_spans(sf_dir: str):
    """Span-level exact dedup (stages.dedup.duplicate_spans): documents ∪
    planted partial copies (doc_id+200000 = tokens 40..51 ++ tokens 10..59
    of each doc_id < 15 — the 12-token prefix sits below min_tokens, so
    the emitted span starts at a NONZERO offset in the copy; the original
    all-span copy validated start_b=0 only) → maximal shared token runs
    ≥ 20 tokens with 0-based offsets. The oracle re-derives spans with
    string-exact 8-gram equality + gaps-and-islands — pinning both the
    hashing and the diagonal merge."""
    from ..stages.dedup import duplicate_spans

    base = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch["doc_id"], pa.scalar(15))
        f = batch.filter(mask)
        return pa.table(
            {
                "doc_id": pc.add(f["doc_id"], pa.scalar(200000, pa.int64())),
                "text": pa.array(
                    [" ".join(t.split(" ")[40:52] + t.split(" ")[10:60])
                     for t in f["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    corpus = base.union(base.map_batches(plant, batch_format="pyarrow"))
    return duplicate_spans(corpus, min_tokens=20, k=8)


def _duplicate_spans_oracle_sql() -> str:
    k, min_tokens = 8, 20
    min_run = min_tokens - k + 1
    leads = " || ' ' || ".join(f"lead(tok, {j}) OVER w" for j in range(1, k))
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(
           list_concat(string_split(text, ' ')[41:52],
                       string_split(text, ' ')[11:60]), ' ')
  FROM documents WHERE doc_id < 15),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM corpus),
grams AS (
  SELECT doc_id, pos, tok || ' ' || {leads} AS g
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok, {k - 1}) OVER w IS NOT NULL),
m AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
  FROM grams a JOIN grams b ON a.g = b.g
  WHERE a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.pos < b.pos)),
isl AS (
  SELECT da, db, pa, pb, pa - pb AS diag,
         pa - row_number() OVER (PARTITION BY da, db, pa - pb ORDER BY pa)
             AS grp
  FROM m)
SELECT da AS doc_a, db AS doc_b,
       min(pa) AS start_a, min(pb) AS start_b,
       CAST(count(*) + {k - 1} AS BIGINT) AS length_tokens
FROM isl GROUP BY da, db, diag, grp
HAVING count(*) >= {min_run}
"""


ORACLE_SQL["duplicate_spans"] = _duplicate_spans_oracle_sql()


def q_user_trips(sf_dir: str):
    """Trip segmentation: a user's pings split into trips at >30 min gaps
    (gaps-and-islands), each trip reporting ping count and decimeter-exact
    track length. Single bucketed shuffle; islands labeled by a vectorized
    per-user cumulative break count — windows, geo and sessionization in
    one plan."""
    from ..geo import mercator_xy
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_xy(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        x, y = mercator_xy(lon, lat)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    pts = ds.map_batches(add_xy, batch_format="pyarrow")

    def trips_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t_us = g["ts"].astype("int64").to_numpy()
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        first = np.ones(len(g), bool)
        first[1:] = u[1:] != u[:-1]
        gap = np.zeros(len(g), bool)
        gap[1:] = ~first[1:] & (np.diff(t_us) > 1_800_000_000)
        brk = first | gap
        c = np.cumsum(brk)
        ustart = np.flatnonzero(first)
        per_user_base = np.repeat(c[ustart], np.diff(
            np.concatenate([ustart, [len(g)]])
        ))
        trip = c - per_user_base  # 0-based island index within user
        d = np.zeros(len(g))
        d[1:] = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
        leg_dm = np.where(brk, 0, np.floor(d * 10)).astype(np.int64)
        df = pd.DataFrame({"user_id": u, "trip_id": trip, "leg_dm": leg_dm})
        out = df.groupby(["user_id", "trip_id"], as_index=False).agg(
            n_pings=("leg_dm", "size"), dm=("leg_dm", "sum")
        )
        out["track_m"] = out.pop("dm") / 10.0
        out["n_pings"] = out["n_pings"].astype(np.int64)
        return out

    return bucketed_group_apply(pts, ["user_id"], trips_bucket, num_buckets=16)


ORACLE_SQL["user_trips"] = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {_MERC} * radians(-77.05 + (event_id % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85 + ((event_id // 1000) % 1000) * 1e-4)/2)) AS y
  FROM events),
o AS (
  SELECT user_id, ts, event_id, x, y,
         lag(x) OVER w AS px, lag(y) OVER w AS py,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS trip_id
  FROM o)
SELECT user_id, CAST(trip_id AS BIGINT) AS trip_id,
       CAST(count(*) AS BIGINT) AS n_pings,
       coalesce(sum(CASE WHEN brk = 0 THEN
           CAST(floor(sqrt((x - px) * (x - px) + (y - py) * (y - py)) * 10)
                AS BIGINT) ELSE 0 END), 0) / 10.0 AS track_m
FROM t GROUP BY 1, 2
"""


def q_price_quartiles(sf_dir: str):
    """Global NTILE(4) by (totalprice cents, key) WITHOUT a global sort:
    value-range two-phase scan — per-range counts → driver prefix of
    range OFFSETS → per-range (value, id) sort gives each row its exact
    global 0-based rank; the SQL NTILE closed form (first n%k tiles get
    one extra row) maps rank → quartile. Deterministic total order via
    the id tie-break."""
    from ..stages.groupops import bucketed_group_apply
    from .queries import _cents

    RANGE_C = 1 << 16  # cents per range bucket

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def vals(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"o_orderkey": pa.array(k), "v": pa.array(v),
             "rng": pa.array(v // RANGE_C)}
        )

    t = ds.map_batches(vals, batch_format="pyarrow").materialize()
    counts = {r["rng"]: r["count()"] for r in t.groupby("rng").count().take_all()}
    offsets, acc = {}, 0
    for rng in sorted(counts):
        offsets[rng] = acc
        acc += counts[rng]
    n, k_tiles = acc, 4
    base, rem = divmod(n, k_tiles)

    def tile_of(rank: np.ndarray) -> np.ndarray:
        cut = rem * (base + 1)
        return np.where(
            rank < cut, rank // max(base + 1, 1),
            rem + (rank - cut) // max(base, 1),
        ).astype(np.int64) + 1

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rng, gr in g.groupby("rng"):
            gr = gr.sort_values(["v", "o_orderkey"], kind="mergesort")
            rank = offsets[int(rng)] + np.arange(len(gr), dtype=np.int64)
            out.append(pd.DataFrame({
                "o_orderkey": gr["o_orderkey"].to_numpy(),
                "quartile": tile_of(rank),
            }))
        return (pd.concat(out) if out else
                pd.DataFrame({"o_orderkey": pd.Series(dtype=np.int64),
                              "quartile": pd.Series(dtype=np.int64)}))

    return bucketed_group_apply(t, ["rng"], rank_bucket, num_buckets=16)


ORACLE_SQL["price_quartiles"] = """
SELECT o_orderkey,
       CAST(ntile(4) OVER (
           ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                    o_orderkey) AS BIGINT) AS quartile
FROM orders
"""


def q_bm25_search(sf_dir: str):
    """BM25 top-10 for the fixed query [hash, join, scan]
    (stages.textstats.bm25_topk — streaming corpus stats + per-batch
    local top-k, driver merges k·#batches candidates). Float parity with
    the oracle is by mirrored literal expressions and query-order
    summation."""
    from ..stages.textstats import bm25_topk

    return bm25_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        ["hash", "join", "scan"], k=10,
    )


def _bm25_oracle_sql() -> str:
    terms = ["hash", "join", "scan"]
    tf_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(count(CASE WHEN tf{i} > 0 THEN 1 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1)"
        f" * (tf{i} * 2.2) / (tf{i} + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"
        f" ELSE 0.0 END)"
        for i in range(len(terms))
    )
    return f"""
WITH tf AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl, {tf_cols}
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, {df_cols}
  FROM tf)
SELECT doc_id, ({contribs}) AS score
FROM tf, stats
ORDER BY score DESC, doc_id
LIMIT 10
"""


ORACLE_SQL["bm25_search"] = _bm25_oracle_sql()


def _hybrid_oracle_sql() -> str:
    """Oracle for rows_only.q_hybrid_search: RRF fusion of the two
    independently-oracled retrievers (bm25_search's literal-mirrored BM25
    expression at k=20, knn_topk's list_cosine_similarity at k=20 around
    vec_id 0). Each doc carries at most TWO 1/(60+rank) terms, so the SQL
    sum() is bit-identical to the Ray side's add order (IEEE addition of
    two doubles is commutative); ordering is by the UNROUNDED fused score
    with doc_id tie-break on both sides, rounding only in the projection
    (the knn_topk precedent)."""
    terms = ["hash", "join", "scan"]
    tf_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(count(CASE WHEN tf{i} > 0 THEN 1 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1)"
        f" * (tf{i} * 2.2) / (tf{i} + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"
        f" ELSE 0.0 END)"
        for i in range(len(terms))
    )
    return f"""
WITH tf AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl, {tf_cols}
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, {df_cols}
  FROM tf),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY ({contribs}) DESC, doc_id) AS rnk
  FROM tf, stats
  QUALIFY rnk <= 20),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT e.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) DESC,
                    e.vec_id) AS rnk
  FROM q CROSS JOIN embeddings e WHERE e.vec_id != 0
  QUALIFY rnk <= 20),
fused AS (
  SELECT doc_id, sum(1.0 / (60 + rnk)) AS s
  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
  GROUP BY doc_id)
SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT)
         AS rrf_rank,
       round(s, 6) AS rrf_score
FROM fused
ORDER BY s DESC, doc_id
LIMIT 10
"""


ORACLE_SQL["hybrid_search"] = _hybrid_oracle_sql()

# rows_only.q_contrastive_pairs: the positive half IS the
# ngram_neardup_pairs oracle (same derived corpus, threshold, k) reused
# verbatim as a CTE; the negative half is the hard_negatives form at the
# manifest's parameters (anchors vec_id < 20, k = 3).
ORACLE_SQL["contrastive_pairs"] = f"""
WITH pos AS ({ORACLE_SQL["ngram_neardup_pairs"]}),
q AS (SELECT vec_id AS qid, label AS qlab, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < 20),
scored AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cs
  FROM q CROSS JOIN embeddings e WHERE e.label != q.qlab),
neg AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cs DESC, neighbor_id) AS rank
    FROM scored) WHERE rank <= 3)
SELECT anchor_id, other_id, pair_type FROM (
  SELECT id_a AS anchor_id, id_b AS other_id,
         'positive' AS pair_type FROM pos
  UNION ALL
  SELECT query_id AS anchor_id, neighbor_id AS other_id,
         'hard_negative' AS pair_type FROM neg)
"""


def q_user_rolling_spend(sf_dir: str):
    """Rolling window FRAME aggregate: per user, the 7-row trailing sum of
    event value in integer cents, ordered by (ts, event_id). One bucketed
    shuffle; the frame sum is a vectorized cumsum difference — exact ints,
    so parity holds regardless of how the oracle slides its frame."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "vc": pa.array(np.round(v * 100).astype(np.int64)),
            }
        )

    pts = ds.map_batches(cents, batch_format="pyarrow")

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        vc = g["vc"].to_numpy()
        cum = np.concatenate([[0], np.cumsum(vc)])
        idx = np.arange(len(g))
        ustart = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        base = np.repeat(ustart, np.diff(np.concatenate([ustart, [len(g)]])))
        lo = np.maximum(idx - 6, base)  # frame start, clamped to user start
        roll = cum[idx + 1] - cum[lo]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "rolling_cents": roll.astype(np.int64),
            }
        )

    return bucketed_group_apply(pts, ["user_id"], roll_bucket, num_buckets=16)


ORACLE_SQL["user_rolling_spend"] = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS rolling_cents
FROM events
"""


def q_triangle_count(sf_dir: str):
    """Distributed triangle counting (compact-forward / degree
    orientation): a deterministic synthetic graph from order keys
    (u = (k%991)·(k%997) % 500, v = (k%977)·(k%983) % 500, dedup
    (min, max) — independent residue products, NOT the pagerank
    permutation graph u=k%500→31k%500, which is triangle-FREE and made
    this oracle check vacuous), edges oriented low-(degree, id) → high,
    wedges generated per source, closed by a shuffled semi join against
    the oriented edge set. Every triangle is counted exactly once at its
    lowest-ordered vertex; oriented out-degree is O(√m)-bounded, so the
    wedge explosion is too. Output one row (n_triangles)."""
    from ray.data.aggregate import Count

    from ..stages.joins import bucket_hash_join, semi_join_shuffled

    N = 500
    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def edges(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ((k % 991) * (k % 997)) % N
        v = ((k % 977) * (k % 983)) % N
        keep = u != v
        lo = np.minimum(u[keep], v[keep])
        hi = np.maximum(u[keep], v[keep])
        return pa.table({"u": pa.array(lo), "v": pa.array(hi)})

    # distinct undirected edges
    e = (
        ds.map_batches(edges, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="m"))
        .map_batches(
            lambda b: pa.table({"u": b["u"].cast(pa.int64()),
                                "v": b["v"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # degrees over both endpoints
    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]))})

    deg = (
        e.map_batches(both_dirs, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="d"))
        .map_batches(
            lambda b: pa.table({"node": b["node"].cast(pa.int64()),
                                "d": b["d"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
    )

    # orient by (degree, id): src = lower-ordered endpoint. Degree table
    # is one row per node — broadcast it when it fits (≤ 2M nodes, the
    # dedup_clusters bound); above that, swap in two bucket_hash_joins
    # (same plan the DBSCAN stages use) — the broadcast saves two
    # all-to-alls on every real-world graph whose NODE set fits memory.
    deg_mat = deg.materialize()
    if deg_mat.count() > 2_000_000:
        with_du = bucket_hash_join(e, deg_mat, left_on="u", right_on="node",
                                   num_buckets=64)

        def rename_du(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"u": batch["u"], "v": batch["v"], "du": batch["d"]}
            )

        pre_orient = bucket_hash_join(
            with_du.map_batches(rename_du, batch_format="pyarrow"),
            deg_mat, left_on="v", right_on="node", num_buckets=64,
        )

        def du_dv(batch: pa.Table):
            return (batch["du"].to_numpy(zero_copy_only=False).astype(np.int64),
                    batch["d"].to_numpy(zero_copy_only=False).astype(np.int64))
    else:
        import ray as _ray

        _drows = deg_mat.take_all()
        _dn = np.array([r["node"] for r in _drows], np.int64)
        _dd = np.array([r["d"] for r in _drows], np.int64)
        _do = np.argsort(_dn)
        # sorted lookup arrays: vectorized searchsorted per batch, not a
        # Python dict probe per EDGE row
        dref = _ray.put((_dn[_do], _dd[_do]))
        pre_orient = e

        def du_dv(batch: pa.Table):
            import ray as _ray2

            nodes_s, degs_s = _ray2.get(dref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            return (degs_s[np.searchsorted(nodes_s, u)],
                    degs_s[np.searchsorted(nodes_s, v)])

    def orient(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        du, dv = du_dv(batch)
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "src": pa.array(np.where(u_first, u, v)),
                "dst": pa.array(np.where(u_first, v, u)),
            }
        )

    oriented = pre_orient.map_batches(
        orient, batch_format="pyarrow"
    ).materialize()

    # wedges at each source: all (dst_i < dst_j by orientation order is not
    # needed — (min, max) of the pair matches how the closing edge appears
    # in the UNDIRECTED edge list only after re-orienting; instead close
    # against the oriented list by trying the pair as (a, b) packed both
    # ways is unnecessary: the closing edge's orientation is also by
    # (degree, id), and both wedge endpoints' order under that key is
    # determined by the same comparison the orient kernel used. We pack
    # the pair under the ORIENTED key by joining against oriented edges
    # packed as src * N + dst, emitting both (i, j) and (j, i) candidates
    # — exactly one can exist, so the count stays exact.
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, gr in g.groupby("src"):
            d = np.sort(gr["dst"].to_numpy())
            if d.size < 2:
                continue
            i, j = np.triu_indices(d.size, 1)
            out.append(np.stack([d[i], d[j]], axis=1))
        if not out:
            return pd.DataFrame({"key": pd.Series(dtype=np.int64)})
        ab = np.concatenate(out)
        keys = np.concatenate([ab[:, 0] * N + ab[:, 1],
                               ab[:, 1] * N + ab[:, 0]])
        return pd.DataFrame({"key": keys})

    from ..stages.groupops import bucketed_group_apply

    wedge_keys = bucketed_group_apply(oriented, ["src"], wedges,
                                      num_buckets=16)
    closing = oriented.map_batches(
        lambda b: pa.table({
            "key": pa.array(
                b["src"].to_numpy(zero_copy_only=False) * N
                + b["dst"].to_numpy(zero_copy_only=False)
            )
        }),
        batch_format="pyarrow",
    )
    closed = semi_join_shuffled(wedge_keys, closing, "key", "key",
                                num_buckets=16)
    return pa.table(
        {"n_triangles": pa.array([closed.count()], pa.int64())}
    )


ORACLE_SQL["triangle_count"] = """
WITH raw AS (
  SELECT least(((o_orderkey % 991) * (o_orderkey % 997)) % 500,
               ((o_orderkey % 977) * (o_orderkey % 983)) % 500) AS u,
         greatest(((o_orderkey % 991) * (o_orderkey % 997)) % 500,
                  ((o_orderkey % 977) * (o_orderkey % 983)) % 500) AS v
  FROM orders
  WHERE ((o_orderkey % 991) * (o_orderkey % 997)) % 500
     <> ((o_orderkey % 977) * (o_orderkey % 983)) % 500),
e AS (SELECT DISTINCT u, v FROM raw)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e ab JOIN e bc ON ab.v = bc.u JOIN e ac
  ON ac.u = ab.u AND ac.v = bc.v
"""


def q_funnel_counts(sf_dir: str):
    """Ordered funnel: users who did view → click → purchase in strict
    timestamp order ((ts, event_id) total order). One bucketed shuffle;
    per-user vectorized: first view, first click after it, first purchase
    after that. Output one row (n_view, n_view_click,
    n_view_click_purchase)."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        res = []
        for _, gr in g.groupby("user_id"):
            et = gr["event_type"].to_numpy()
            iv = np.flatnonzero(et == "view")
            if iv.size == 0:
                continue
            s1 = 1
            ic = np.flatnonzero(et == "click")
            ic = ic[ic > iv[0]]
            s2 = 1 if ic.size else 0
            s3 = 0
            if s2:
                ip = np.flatnonzero(et == "purchase")
                s3 = 1 if (ip > ic[0]).any() else 0
            res.append((s1, s2, s3))
        if not res:
            return pd.DataFrame({
                "v": pd.Series(dtype=np.int64),
                "vc": pd.Series(dtype=np.int64),
                "vcp": pd.Series(dtype=np.int64),
            })
        a = np.array(res, np.int64)
        return pd.DataFrame({"v": [a[:, 0].sum()], "vc": [a[:, 1].sum()],
                             "vcp": [a[:, 2].sum()]}).astype(np.int64)

    parts = bucketed_group_apply(ds, ["user_id"], funnel_bucket,
                                 num_buckets=16).take_all()
    v = sum(p["v"] for p in parts)
    vc = sum(p["vc"] for p in parts)
    vcp = sum(p["vcp"] for p in parts)
    return pa.table(
        {
            "n_view": pa.array([int(v)], pa.int64()),
            "n_view_click": pa.array([int(vc)], pa.int64()),
            "n_view_click_purchase": pa.array([int(vcp)], pa.int64()),
        }
    )


ORACLE_SQL["funnel_counts"] = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
fv AS (SELECT user_id, min(rn) AS r1 FROM o WHERE event_type = 'view' GROUP BY 1),
fc AS (
  SELECT o.user_id, min(rn) AS r2 FROM o JOIN fv ON o.user_id = fv.user_id
  WHERE o.event_type = 'click' AND o.rn > fv.r1 GROUP BY 1),
fp AS (
  SELECT o.user_id FROM o JOIN fc ON o.user_id = fc.user_id
  WHERE o.event_type = 'purchase' AND o.rn > fc.r2 GROUP BY o.user_id)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM fv) AS n_view,
       (SELECT CAST(count(*) AS BIGINT) FROM fc) AS n_view_click,
       (SELECT CAST(count(*) AS BIGINT) FROM fp) AS n_view_click_purchase
"""


_PR_SCALE = 1_000_000_000_000
_PR_BASE = 150_000_000_000  # floor(0.15 * SCALE)
_PR_ITERS = 5


def q_pagerank(sf_dir: str):
    """Iterative PageRank with INTEGER-QUANTIZED updates (rank scaled to
    1e12; contribution floor((r·85) / (100·outdeg))) so every iteration
    is exact integer arithmetic — reproducible at any parallelism and
    oracle-checkable (the SQL unrolls the 5 iterations as chained CTEs;
    plain recursive CTEs cannot aggregate over the recursive reference).
    Directed graph from order keys (k%500 → k·31%500, distinct, no self
    loops); dangling mass is dropped by definition on both sides.

    Plan per iteration: broadcast the rank map (node-bounded state, same
    ≤2M-node contract as dedup_clusters' driver path; swap in a
    bucket_hash_join on src above it) → per-batch contributions →
    per-batch partial sums → one groupby(dst) sum — the only shuffle."""
    import ray as _ray
    from ray.data.aggregate import Count, Sum

    N = 500
    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def edges(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = k % N
        v = (k * 31) % N
        keep = u != v
        return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep])})

    e = (
        ds.map_batches(edges, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="m"))
        .map_batches(
            lambda b: pa.table({"u": b["u"].cast(pa.int64()),
                                "v": b["v"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        # node²-bounded edge table: coalesce so the 5 rank iterations pay
        # per-edge work, not per-corpus-block overhead (the hop_distances
        # / bpe_train fix; measured 12.1 s → 5.5 s at sf0.1)
        .repartition(8)
        .materialize()
    )
    from ..stages.groupops import bucketed_aggregate

    # per-NODE groups (corpus-scale in general; ≤2M here by the pagerank
    # contract) — bucketed skips the native reduce's per-group constant
    outdeg = {
        r["u"]: r["count()"]
        for r in bucketed_aggregate(
            e, ["u"], {"count()": ("u", "size")}).take_all()
    }
    nodes = sorted(
        set(outdeg)
        | {r["v"] for r in bucketed_aggregate(
            e, ["v"], {"count()": ("v", "size")}).take_all()}
    )
    ranks = {n: _PR_SCALE for n in nodes}

    for _ in range(_PR_ITERS):
        ref = _ray.put((ranks, outdeg))

        def contrib(batch: pa.Table) -> pa.Table:
            rmap, dmap = _ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            c = np.array(
                [(rmap[x] * 85) // (100 * dmap[x]) for x in u], np.int64
            )
            vv, inv = np.unique(v, return_inverse=True)
            s = np.zeros(vv.size, np.int64)
            np.add.at(s, inv, c)
            return pa.table({"dst": pa.array(vv.astype(np.int64)),
                             "c": pa.array(s)})

        sums = {
            r["dst"]: r["sum(c)"]
            for r in bucketed_aggregate(
                e.map_batches(contrib, batch_format="pyarrow"),
                ["dst"], {"sum(c)": ("c", "sum")},
            ).take_all()
        }
        ranks = {n: _PR_BASE + int(sums.get(n, 0)) for n in nodes}

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "rank_scaled": pa.array([ranks[n] for n in nodes], pa.int64()),
        }
    )


def _pagerank_oracle_sql() -> str:
    prev = "pr0"
    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(f"""
pr{i} AS (
  SELECT n.node, {_PR_BASE} + COALESCE(s.c, 0) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.v AS node, SUM((p.r * 85) // (100 * od.d)) AS c
    FROM e JOIN {prev} p ON p.node = e.u JOIN od ON od.node = e.u
    GROUP BY e.v) s ON s.node = n.node)""")
        prev = f"pr{i}"
    return f"""
WITH raw AS (
  SELECT o_orderkey % 500 AS u, (o_orderkey * 31) % 500 AS v
  FROM orders WHERE o_orderkey % 500 <> (o_orderkey * 31) % 500),
e AS (SELECT DISTINCT u, v FROM raw),
od AS (SELECT u AS node, count(*) AS d FROM e GROUP BY 1),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
pr0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM nodes),
{",".join(iters)}
SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM {prev}
"""


ORACLE_SQL["pagerank"] = _pagerank_oracle_sql()


def q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(priority, status) in ONE shuffle: each row splats
    to its 3 rollup levels — (p, s), (p, NULL), (NULL, NULL) — with a
    per-batch partial combine before the groupby, so the all-to-all moves
    ≤ 3 × distinct-group rows per block, never 3 × input. Integer-cent
    sums → exact parity with DuckDB's ROLLUP."""
    from ray.data.aggregate import Sum

    from .queries import _cents

    ds = _read(
        sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def splat(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        p = batch["o_orderpriority"].to_pylist()
        s = batch["o_orderstatus"].to_pylist()
        v = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        df = pd_.DataFrame({
            "p": np.concatenate([p, p, [None] * len(p)]),
            "s": np.concatenate([s, [None] * len(p), [None] * len(p)]),
            "v": np.concatenate([v, v, v]),
        })
        # NULL rollup keys ride the shuffle as a \x00 sentinel: Ray's
        # sort-based groupby cannot range-partition nullable string keys
        # (np.searchsorted over None); restored to NULL post-aggregate.
        df[["p", "s"]] = df[["p", "s"]].fillna("\x00ALL")
        g = df.groupby(["p", "s"], as_index=False, sort=False)["v"].sum()
        return pa.table({
            "o_orderpriority": pa.array(g["p"], pa.string()),
            "o_orderstatus": pa.array(g["s"], pa.string()),
            "pv": pa.array(g["v"].to_numpy().astype(np.int64)),
        })

    out = (
        ds.map_batches(splat, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Sum("pv", alias_name="cents"))
    )
    def finish(b: pa.Table) -> pa.Table:
        def unsent(col):
            return pa.array(
                [None if x == "\x00ALL" else x for x in col.to_pylist()],
                pa.string(),
            )

        return pa.table({
            "o_orderpriority": unsent(b["o_orderpriority"]),
            "o_orderstatus": unsent(b["o_orderstatus"]),
            "revenue": pa.array(
                b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
                / 100.0
            ),
        })

    return out.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["rollup_revenue"] = """
SELECT o_orderpriority, o_orderstatus,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) / 100.0 AS revenue
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE(priority, status): the ROLLUP splat with the fourth
    (NULL, status) level added — still one shuffle, still ≤ 4 × distinct
    groups per block after the per-batch partial combine."""
    from ray.data.aggregate import Sum

    from .queries import _cents

    ds = _read(
        sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
    )

    def splat(batch: pa.Table) -> pa.Table:
        import pandas as pd_

        p = np.asarray(batch["o_orderpriority"].to_pylist(), object)
        s = np.asarray(batch["o_orderstatus"].to_pylist(), object)
        v = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        sent = np.full(len(p), "\x00ALL", object)
        df = pd_.DataFrame({
            "p": np.concatenate([p, p, sent, sent]),
            "s": np.concatenate([s, sent, s, sent]),
            "v": np.concatenate([v, v, v, v]),
        })
        g = df.groupby(["p", "s"], as_index=False, sort=False)["v"].sum()
        return pa.table({
            "o_orderpriority": pa.array(g["p"], pa.string()),
            "o_orderstatus": pa.array(g["s"], pa.string()),
            "pv": pa.array(g["v"].to_numpy().astype(np.int64)),
        })

    out = (
        ds.map_batches(splat, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Sum("pv", alias_name="cents"))
    )

    def finish(b: pa.Table) -> pa.Table:
        def unsent(col):
            return pa.array(
                [None if x == "\x00ALL" else x for x in col.to_pylist()],
                pa.string(),
            )

        return pa.table({
            "o_orderpriority": unsent(b["o_orderpriority"]),
            "o_orderstatus": unsent(b["o_orderstatus"]),
            "revenue": pa.array(
                b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
                / 100.0
            ),
        })

    return out.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["cube_revenue"] = """
SELECT o_orderpriority, o_orderstatus,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) / 100.0 AS revenue
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


def q_type_value_corr(sf_dir: str):
    """GROUPED exact correlation: per event type, Pearson corr between
    value-cents and hour-of-day — per-batch per-group Python-int moment
    partials (JSON rows, group-cardinality bounded), folded on the
    driver; identical HUGEINT-parity float finish as `exact_corr`."""
    import json as _json
    import math

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ((t_us // 3_600_000_000) % 24).astype(np.int64)
        vc = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rows = {}
        for g, x, y in zip(et, hour.tolist(), vc.tolist()):
            m = rows.setdefault(g, [0, 0, 0, 0, 0, 0])
            m[0] += 1; m[1] += x; m[2] += y
            m[3] += x * x; m[4] += x * y; m[5] += y * y
        return pa.table({
            "g": pa.array(list(rows), pa.string()),
            "m": pa.array([_json.dumps(v) for v in rows.values()], pa.string()),
        })

    acc: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for g, mjson in zip(b["g"].to_pylist(), b["m"].to_pylist()):
            m = _json.loads(mjson)
            a = acc.setdefault(g, [0] * 6)
            for i in range(6):
                a[i] += m[i]
    out_g, out_n, out_c = [], [], []
    for g in sorted(acc):
        n, sx, sy, sxx, sxy, syy = acc[g]
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        out_g.append(g)
        out_n.append(n)
        out_c.append(
            float("nan") if vx == 0 or vy == 0
            else float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
        )
    return pa.table({
        "event_type": pa.array(out_g, pa.string()),
        "n_events": pa.array(out_n, pa.int64()),
        "corr_hour_value": pa.array(out_c, pa.float64()),
    })


ORACLE_SQL["type_value_corr"] = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST((epoch_us(ts) // 3600000000) % 24 AS HUGEINT)) AS sx,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS sy,
         sum(CAST((epoch_us(ts) // 3600000000) % 24 AS HUGEINT)
             * CAST((epoch_us(ts) // 3600000000) % 24 AS HUGEINT)) AS sxx,
         sum(CAST((epoch_us(ts) // 3600000000) % 24 AS HUGEINT)
             * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS sxy,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS syy
  FROM events GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_hour_value
FROM m
"""


def q_click_purchase_users(sf_dir: str):
    """INTERSECT set op: distinct users with BOTH a click and a purchase —
    per-side distinct (groupby) + one shuffled semi join; the set-op
    family's missing member next to union (everywhere), EXCEPT
    (anti joins) and DISTINCT (exact_dedup)."""
    from ..stages.joins import semi_join_shuffled

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def side(which: str):
        def _s(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc_

            f = batch.filter(pc_.equal(batch["event_type"], which))
            u = np.unique(f["user_id"].to_numpy(zero_copy_only=False))
            return pa.table({"user_id": pa.array(u.astype(np.int64))})

        return _s

    clicks = _distinct_users(
        ds.map_batches(side("click"), batch_format="pyarrow")
    )
    purchases = ds.map_batches(side("purchase"), batch_format="pyarrow")
    return semi_join_shuffled(clicks, purchases, "user_id", "user_id")


ORACLE_SQL["click_purchase_users"] = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


_HOP_ITERS = 4


def q_hop_distances(sf_dir: str):
    """Multi-source bounded-hop shortest paths (Bellman-Ford, K=4
    relaxations): dist(s, n) = min total weight over ≤K-hop paths — the
    distributed SSSP building block. Same deterministic order-key graph as
    pagerank, integer edge weights w = 1 + (u·7 + v·13) % 97 so every
    relaxation is exact integer arithmetic at any parallelism; oracle
    unrolls the K iterations as chained CTEs (recursive CTEs cannot
    aggregate over the recursive reference).

    Plan per iteration: broadcast the current dist map (node-bounded
    state — ≤ sources × nodes rows, the same ≤2M driver-state contract as
    pagerank/dedup_clusters; swap to a bucket_hash_join on u above it) →
    per-batch edge relaxations with an in-batch (src, v) min combine →
    one groupby min — the ONLY shuffle per iteration."""
    import ray as _ray
    from ray.data.aggregate import Count

    N = 500
    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def edges(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = k % N
        # v mixes k beyond (k mod N) so nodes get MULTIPLE out-edges — a
        # pure function of (k mod N) would make the graph functional and
        # the ×31 fixed points (all multiples of 100) isolated
        v = (k * 31 + (k // N) * 7) % N
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    e = (
        ds.map_batches(edges, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="m"))
        .map_batches(
            lambda b: pa.table(
                {
                    "u": b["u"].cast(pa.int64()),
                    "v": b["v"].cast(pa.int64()),
                    "w": pa.array(
                        1
                        + (
                            b["u"].cast(pa.int64()).to_numpy() * 7
                            + b["v"].cast(pa.int64()).to_numpy() * 13
                        )
                        % 97
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        # edge table is node²-bounded (≤ N² rows); coalesce so the 4
        # relax iterations pay per-edge work, not per-corpus-block
        # overhead (same fix as bpe_train — measured 12 s → 7.8 s at sf0.1;
        # the rest is the four fixed groupby-min rounds)
        .repartition(8)
        .materialize()
    )

    sources = np.arange(0, N, 100, dtype=np.int64)  # 5 sources
    S = len(sources)
    INF = np.int64(1) << np.int64(62)
    dist = np.full((S, N), INF, dtype=np.int64)
    dist[np.arange(S), sources] = 0

    for _ in range(_HOP_ITERS):
        ref = _ray.put(dist)

        def relax(batch: pa.Table) -> pa.Table:
            dmat = _ray.get(ref)  # (S, N) dense, zero-copy from plasma
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            # in-batch combine: scatter-min into a dense (S, N) partial so
            # the shuffle moves ≤ S·N rows per block, never S·edges
            out = np.full((S, N), INF, dtype=np.int64)
            du = dmat[:, u]  # (S, E)
            for si in range(S):  # S=5 vectorized sweeps, no per-edge loop
                ok = du[si] < INF
                np.minimum.at(out[si], v[ok], du[si][ok] + w[ok])
            si, node = np.nonzero(out < INF)
            return pa.table(
                {
                    "src": pa.array(sources[si]),
                    "node": pa.array(node.astype(np.int64)),
                    "dist": pa.array(out[si, node]),
                }
            )

        improved = (
            e.map_batches(relax, batch_format="pyarrow")
            .groupby(["src", "node"])
            .min("dist")
            .take_all()
        )
        new = dist.copy()
        for r in improved:
            si = int(r["src"]) // 100
            d = int(r["min(dist)"])
            if d < new[si, int(r["node"])]:
                new[si, int(r["node"])] = d
        dist = new

    si, node = np.nonzero(dist < INF)
    return pa.table(
        {
            "src": pa.array(sources[si]),
            "node": pa.array(node.astype(np.int64)),
            "dist": pa.array(dist[si, node]),
        }
    )


def _hop_oracle_sql() -> str:
    prev = "d0"
    iters = []
    for i in range(1, _HOP_ITERS + 1):
        iters.append(f"""
d{i} AS (
  SELECT src, node, MIN(dist) AS dist FROM (
    SELECT src, node, dist FROM {prev}
    UNION ALL
    SELECT p.src, e.v AS node, p.dist + e.w AS dist
    FROM {prev} p JOIN e ON e.u = p.node) GROUP BY src, node)""")
        prev = f"d{i}"
    return f"""
WITH raw AS (
  SELECT o_orderkey % 500 AS u,
         (o_orderkey * 31 + (o_orderkey // 500) * 7) % 500 AS v
  FROM orders
  WHERE o_orderkey % 500 <> (o_orderkey * 31 + (o_orderkey // 500) * 7) % 500),
e AS (SELECT u, v, 1 + (u * 7 + v * 13) % 97 AS w
      FROM (SELECT DISTINCT u, v FROM raw)),
srcs AS (SELECT UNNEST([0, 100, 200, 300, 400]) AS s),
d0 AS (SELECT s AS src, s AS node, 0 AS dist FROM srcs),
{",".join(iters)}
SELECT src, node, CAST(dist AS BIGINT) AS dist FROM {prev}
ORDER BY src, node
"""


ORACLE_SQL["hop_distances"] = _hop_oracle_sql()


def q_pareto_orders(sf_dir: str):
    """2D skyline (Pareto front, both dims maximized) over orders:
    the orders no other order beats on BOTH totalprice and orderdate
    (stages.groupops.skyline_2d). Scale story: per-block fronts are the
    combiner — skyline(A∪B) ⊆ skyline(A) ∪ skyline(B) — so blocks shrink
    to ~O(log n) rows locally and NO groupby shuffle happens at all; the
    single-partition final pass sees only the union of the tiny local
    fronts. Integer cents + µs timestamps → exact oracle parity."""
    from ..stages.groupops import skyline_2d
    from .queries import _cents

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def prep(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": pa.array(k),
                "price_cents": pa.array(p),
                "date_us": pa.array(d.astype("datetime64[us]").view(np.int64)),
                "o_orderdate": batch["o_orderdate"],
            }
        )

    out = skyline_2d(
        ds.map_batches(prep, batch_format="pyarrow"),
        "price_cents",
        "date_us",
        keep_cols=["o_orderkey", "o_orderdate"],
    )
    return out.select_columns(
        ["o_orderkey", "price_cents", "o_orderdate"]
    ).sort(["price_cents", "o_orderkey"])


ORACLE_SQL["pareto_orders"] = """
WITH v AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS price_cents,
         o_orderdate
  FROM orders),
g AS (SELECT price_cents, max(o_orderdate) AS gmax FROM v GROUP BY 1),
s AS (SELECT price_cents, gmax,
             max(gmax) OVER (ORDER BY price_cents DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS pb
      FROM g),
k AS (SELECT price_cents, gmax FROM s WHERE pb IS NULL OR gmax > pb)
SELECT v.o_orderkey, v.price_cents, v.o_orderdate
FROM v JOIN k
  ON v.price_cents = k.price_cents AND v.o_orderdate = k.gmax
ORDER BY v.price_cents, v.o_orderkey
"""


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (A-ES
    Efraimidis–Spirakis: top-k by ln(md5-uniform)/weight —
    stages.splits.weighted_sample_topk): 100 documents sampled with
    probability ∝ n_chars. No RNG, partitioning-invariant; per-block
    top-k is an exact combiner so the corpus never sort-shuffles. The
    oracle mirrors the key expression literally (hex-prefix → BIGINT →
    identical division and ln; np.log/libm parity, the bm25 precedent);
    output carries no float column, so hash parity only requires the
    same k rows to win."""
    from ..stages.splits import weighted_sample_topk

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = weighted_sample_topk(ds, "doc_id", "n_chars", k=100, salt="ws:")
    return out.select_columns(["doc_id", "n_chars"]).sort("doc_id")


ORACLE_SQL["weighted_sample"] = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) + 1) / 4294967296.0) / n_chars AS pri
  FROM documents WHERE n_chars > 0)
SELECT doc_id, n_chars FROM keyed
ORDER BY pri DESC, doc_id LIMIT 100
"""


def q_priority_status_assoc(sf_dir: str):
    """Categorical association (feature-selection primitive): the
    priority × status contingency table with expected counts and
    per-cell chi-square contributions. One groupby shuffle (cell counts,
    pre-combined); the 15-cell table is driver-bounded (cardinality
    product, the quantile value-counts contract). Float finish mirrors
    the SQL literally — the squared deviation is cast to DOUBLE before
    squaring on BOTH sides (obs·n − rt·ct exceeds int64 when squared) and
    outputs are FLOORED to 6 dp (floor, not round: np.round is half-even,
    DuckDB round is half-away)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    cells = (
        ds.groupby(["o_orderpriority", "o_orderstatus"]).count().take_all()
    )
    p = np.array([r["o_orderpriority"] for r in cells])
    s = np.array([r["o_orderstatus"] for r in cells])
    obs = np.array([r["count()"] for r in cells], dtype=np.int64)
    rt = np.zeros(len(cells), np.int64)
    ct = np.zeros(len(cells), np.int64)
    for val in np.unique(p):
        rt[p == val] = obs[p == val].sum()
    for val in np.unique(s):
        ct[s == val] = obs[s == val].sum()
    n = int(obs.sum())
    d = (obs * n - rt * ct).astype(np.float64)
    expected = np.floor((rt * ct).astype(np.float64) / n * 1e6) / 1e6
    chi2_term = np.floor(d * d / (rt * ct * n).astype(np.float64) * 1e6) / 1e6
    order = np.lexsort((s, p))
    return pa.table(
        {
            "o_orderpriority": pa.array(p[order]),
            "o_orderstatus": pa.array(s[order]),
            "obs": pa.array(obs[order]),
            "expected": pa.array(expected[order]),
            "chi2_term": pa.array(chi2_term[order]),
        }
    )


ORACLE_SQL["priority_status_assoc"] = """
WITH c AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS obs
  FROM orders GROUP BY 1, 2),
t AS (
  SELECT o_orderpriority, o_orderstatus, obs,
         sum(obs) OVER (PARTITION BY o_orderpriority) AS rt,
         sum(obs) OVER (PARTITION BY o_orderstatus) AS ct,
         sum(obs) OVER () AS n
  FROM c)
SELECT o_orderpriority, o_orderstatus, CAST(obs AS BIGINT) AS obs,
       floor(CAST(rt * ct AS DOUBLE) / n * 1e6) / 1e6 AS expected,
       floor(CAST(obs * n - rt * ct AS DOUBLE)
             * CAST(obs * n - rt * ct AS DOUBLE)
             / CAST(rt * ct * n AS DOUBLE) * 1e6) / 1e6 AS chi2_term
FROM t ORDER BY 1, 2
"""


def q_purchase_except_click_users(sf_dir: str):
    """EXCEPT set op: users with a high-value (>95) purchase but NO
    high-value click — per-side distinct + one shuffled ANTI semi join
    (the anti=True path of the same plan as the INTERSECT query). The
    value threshold makes the sides genuinely diverge (every user has
    every event TYPE in the synth corpus, so a type-only EXCEPT would be
    vacuously empty)."""
    from ..stages.joins import semi_join_shuffled

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def side(which: str):
        def _s(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc_

            f = batch.filter(
                pc_.and_(
                    pc_.equal(batch["event_type"], which),
                    pc_.greater(batch["value"], 95.0),
                )
            )
            u = np.unique(f["user_id"].to_numpy(zero_copy_only=False))
            return pa.table({"user_id": pa.array(u.astype(np.int64))})

        return _s

    buyers = _distinct_users(
        ds.map_batches(side("purchase"), batch_format="pyarrow")
    )
    clickers = ds.map_batches(side("click"), batch_format="pyarrow")
    return semi_join_shuffled(buyers, clickers, "user_id", "user_id",
                              anti=True)


ORACLE_SQL["purchase_except_click_users"] = """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND value > 95
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'click' AND value > 95
"""


# ---------------------------------------------------------------------------
# trend / resample / k-core
# ---------------------------------------------------------------------------


def q_type_value_trend(sf_dir: str):
    """GROUPED exact OLS trend: per event type, least-squares slope and
    intercept of value-cents against absolute day index — the "is this
    metric drifting" primitive next to `type_value_corr`. Same plan:
    per-batch per-group Python-int moment partials (group-cardinality
    bounded JSON rows, arbitrary precision — sum(day²·n) and sum(day·cents)
    exceed int64 at 1e8+ rows), folded on the driver; the float finish
    mirrors the oracle's HUGEINT→DOUBLE cast order so slope and intercept
    are bit-identical (slope = one division of exact ints; intercept
    reuses slope with the same literal expression shape)."""
    import json as _json

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (t_us // 86_400_000_000).astype(np.int64)
        vc = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rows: dict = {}
        for g, x, y in zip(et, day.tolist(), vc.tolist()):
            m = rows.setdefault(g, [0, 0, 0, 0, 0])
            m[0] += 1; m[1] += x; m[2] += y
            m[3] += x * x; m[4] += x * y
        return pa.table({
            "g": pa.array(list(rows), pa.string()),
            "m": pa.array([_json.dumps(v) for v in rows.values()], pa.string()),
        })

    acc: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for g, mjson in zip(b["g"].to_pylist(), b["m"].to_pylist()):
            m = _json.loads(mjson)
            a = acc.setdefault(g, [0] * 5)
            for i in range(5):
                a[i] += m[i]
    out_g, out_n, out_s, out_i = [], [], [], []
    for g in sorted(acc):
        n, sx, sy, sxx, sxy = acc[g]
        den = n * sxx - sx * sx
        slope = float(n * sxy - sx * sy) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        out_g.append(g); out_n.append(n)
        out_s.append(slope); out_i.append(intercept)
    return pa.table({
        "event_type": pa.array(out_g, pa.string()),
        "n_events": pa.array(out_n, pa.int64()),
        "slope_cents_per_day": pa.array(out_s, pa.float64()),
        "intercept_cents": pa.array(out_i, pa.float64()),
    })


ORACLE_SQL["type_value_trend"] = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(epoch_us(ts) // 86400000000 AS HUGEINT)) AS sx,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS sy,
         sum(CAST(epoch_us(ts) // 86400000000 AS HUGEINT)
             * CAST(epoch_us(ts) // 86400000000 AS HUGEINT)) AS sxx,
         sum(CAST(epoch_us(ts) // 86400000000 AS HUGEINT)
             * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS sxy
  FROM events GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS slope_cents_per_day,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept_cents
FROM m
"""


_FFILL_START_US = 1_704_672_000_000_000  # 2024-01-08T00:00:00Z
_FFILL_HOURS = 169  # hourly grid through 2024-01-15T00:00:00Z inclusive


def q_user_value_ffill(sf_dir: str):
    """Per-key time-series RESAMPLE with forward fill (last observation
    carried forward): each user's event values sampled onto a fixed hourly
    grid — the gap-filling step every feature-store / training-window
    pipeline needs before windowed aggregation. One bucketed shuffle on
    user_id; inside the bucket each user's grid is a single searchsorted
    against their sorted event times (duplicate timestamps pre-reduced to
    max cents so the as-of pick is well-defined — mirrored in the oracle's
    pre-aggregate CTE). LEFT semantics: grid points before a user's first
    event emit NULL. Oracle = DuckDB ASOF LEFT JOIN against a
    generate_series grid."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"]).filter(
        expr="user_id < 50"
    )

    def prep(batch: pa.Table) -> pa.Table:
        vc = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "vc": pa.array(vc),
        })

    grid = (
        _FFILL_START_US + np.arange(_FFILL_HOURS, dtype=np.int64)
        * 3_600_000_000
    )

    def ffill_bucket(g: pd.DataFrame) -> pa.Table:
        # pre-reduce duplicate (user, ts) to max cents, then sort
        g = (
            g.groupby(["user_id", "ts_us"], sort=False)["vc"].max()
            .reset_index()
            .sort_values(["user_id", "ts_us"], kind="mergesort")
        )
        out_u, out_t, out_v = [], [], []
        for uid, rows in g.groupby("user_id", sort=False):
            t = rows["ts_us"].to_numpy()
            v = rows["vc"].to_numpy()
            idx = np.searchsorted(t, grid, side="right") - 1
            vals = np.where(idx >= 0, v[np.maximum(idx, 0)], 0)
            out_u.append(np.full(grid.size, uid, np.int64))
            out_t.append(grid)
            out_v.append(np.ma.masked_array(vals, mask=idx < 0))
        u = np.concatenate(out_u)
        t = np.concatenate(out_t)
        v = np.ma.concatenate(out_v)
        return pa.table({
            "user_id": pa.array(u),
            "grid_ts": pa.array(t).cast(pa.timestamp("us")),
            "value_cents": pa.array(
                np.ascontiguousarray(v.data), pa.int64(),
                mask=np.ascontiguousarray(np.ma.getmaskarray(v)),
            ),
        })

    return bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        ffill_bucket,
        num_buckets=16,
    )


ORACLE_SQL["user_value_ffill"] = """
WITH ev AS (
  SELECT user_id, ts, max(CAST(round(value * 100) AS BIGINT)) AS vc
  FROM events WHERE user_id < 50 GROUP BY 1, 2),
grid AS (
  SELECT u.user_id, g.ts
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 50) u
  CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-08 00:00:00',
       TIMESTAMP '2024-01-15 00:00:00', INTERVAL 1 HOUR)) AS ts) g)
SELECT grid.user_id, grid.ts AS grid_ts, e.vc AS value_cents
FROM grid ASOF LEFT JOIN ev e
  ON grid.user_id = e.user_id AND e.ts <= grid.ts
"""


_KCORE_M = 2500  # node-id space
_KCORE_K = 8  # core order
_KCORE_ROUNDS = 9  # fixed peel bound (converges in 7 on this corpus)
_KCORE_KEY_CAP = 15000  # sf-invariant subgraph: sf0.01's full key range


def q_kcore_nodes(sf_dir: str):
    """K-CORE decomposition (bounded-round peeling): repeatedly remove
    nodes of degree < K until fixed point — the standard graph-cleanup /
    community-seed primitive next to triangle_count and pagerank. Graph:
    Knuth-mix of order keys capped at an SF-invariant literal
    (o_orderkey < 15000 — sf0.01's entire range, a strict subset at
    larger SFs) so the subgraph, the peel trajectory, and the oracle are
    identical at every scale. Contract: a FIXED bound of 9 peel rounds
    (converges in 7 here; extra rounds are no-ops and the engine
    early-exits on an unchanged alive-set — same result, fewer shuffles).
    Oracle unrolls the 9 rounds as chained CTEs.

    Plan per round: degrees from one node-bounded groupby count (the only
    shuffle), alive-set broadcast via ray.put (≤2,500 nodes — the
    documented ≤2M driver-state contract shared with pagerank /
    hop_distances; swap to a shuffled semi join above it), edge filter as
    a pure map. Output: surviving nodes + degree within the core."""
    import ray as _ray
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderkey"]).filter(
        expr=f"o_orderkey < {_KCORE_KEY_CAP}"
    )

    def edges(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761) % (1 << 32)
        u = h % _KCORE_M
        v = (h // _KCORE_M) % _KCORE_M
        keep = u != v
        lo = np.minimum(u[keep], v[keep])
        hi = np.maximum(u[keep], v[keep])
        return pa.table({"u": pa.array(lo), "v": pa.array(hi)})

    e = (
        ds.map_batches(edges, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="m"))
        .map_batches(
            lambda b: pa.table({"u": b["u"].cast(pa.int64()),
                                "v": b["v"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        # node²-bounded: coalesce before the peel iterations (the
        # pagerank/hop_distances block-overhead rule)
        .repartition(4)
        .materialize()
    )

    def splat(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays(
                [batch["u"].combine_chunks(), batch["v"].combine_chunks()]
            )
        })

    alive: frozenset | None = None
    for _ in range(_KCORE_ROUNDS):
        deg = e.map_batches(splat, batch_format="pyarrow").groupby(
            "node"
        ).aggregate(Count(alias_name="deg"))
        new_alive = frozenset(
            r["node"] for r in deg.take_all() if r["deg"] >= _KCORE_K
        )
        if alive is not None and new_alive == alive:
            break  # fixed point: remaining rounds are no-ops
        alive = new_alive
        ref = _ray.put(new_alive)

        def efilter(batch: pa.Table, _ref=ref) -> pa.Table:
            a = np.fromiter(_ray.get(_ref), np.int64)
            a.sort()
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            keep = np.isin(u, a, assume_unique=False) & np.isin(v, a)
            return batch.filter(pa.array(keep))

        e = e.map_batches(efilter, batch_format="pyarrow").materialize()

    if alive is not None and not alive:
        # fully-peeled graph: a groupby over zero rows yields a
        # schemaless zero-batch dataset — return a TYPED empty table
        return pa.table({
            "node": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64()),
        })
    return (
        e.map_batches(splat, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .map_batches(
            lambda b: pa.table({"node": b["node"].cast(pa.int64()),
                                "deg": b["deg"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
    )


def _kcore_sql() -> str:
    # every CTE is MATERIALIZED: each round references the previous one
    # 3-4 times, so inlined CTEs would expand to ~4^rounds parquet scans
    base = f"""
raw AS MATERIALIZED (
  SELECT ((o_orderkey * 2654435761) % 4294967296) % {_KCORE_M} AS u,
         (((o_orderkey * 2654435761) % 4294967296) // {_KCORE_M})
           % {_KCORE_M} AS v
  FROM orders WHERE o_orderkey < {_KCORE_KEY_CAP}),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
  FROM raw WHERE u != v)"""
    parts = ["WITH" + base]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(f""",
a{r} AS MATERIALIZED (
  SELECT node FROM (
    SELECT u AS node FROM e{r-1} UNION ALL SELECT v FROM e{r-1})
  GROUP BY 1 HAVING count(*) >= {_KCORE_K}),
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r-1} e
  JOIN a{r} x ON e.u = x.node JOIN a{r} y ON e.v = y.node)""")
    last = f"e{_KCORE_ROUNDS}"
    parts.append(f"""
SELECT node, count(*) AS deg FROM (
  SELECT u AS node FROM {last} UNION ALL SELECT v FROM {last})
GROUP BY 1""")
    return "".join(parts)


ORACLE_SQL["kcore_nodes"] = _kcore_sql()


def q_track_hausdorff(sf_dir: str):
    """Track-similarity join: unordered user-track pairs with symmetric
    Hausdorff distance ≤ 100 m (stages.spatial.track_hausdorff_pairs) —
    co-travel / trajectory-dedup. Tracks are banded formula points
    (users sharing user_id%8 occupy the same ~440 m lon band, so
    cross-band pairs are impossible by construction and in-band pairs
    genuinely exercise the max-min semantics). Oracle = the literal
    max-of-min SQL over an inequality self-join, mirrored term-for-term."""
    from ..stages.spatial import track_hausdorff_pairs

    ds = _read(sf_dir, "events", ["event_id", "user_id"]).filter(
        expr="user_id < 24"
    )

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (eid * 2654435761) % 2 < 1
        eid, uid = eid[keep], uid[keep]
        lon = -77.05 + (uid % 8) * 0.01 + (eid % 200) * 2e-5
        lat = 38.85 + ((eid // 200) % 200) * 2e-5
        return pa.table({
            "id": pa.array(eid),
            "key": pa.array(uid),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        })

    return track_hausdorff_pairs(
        ds.map_batches(pts, batch_format="pyarrow"), 100.0
    )


ORACLE_SQL["track_hausdorff"] = f"""
WITH pts AS MATERIALIZED (
  SELECT user_id AS key, event_id AS pid,
         {_MERC} * radians(-77.05 + (user_id % 8) * 0.01
                           + (event_id % 200) * 2e-5) AS x,
         {_MERC} * ln(tan(pi()/4 + radians(38.85
                           + ((event_id // 200) % 200) * 2e-5)/2)) AS y
  FROM events
  WHERE user_id < 24 AND (event_id * 2654435761) % 2 < 1),
sizes AS MATERIALIZED (SELECT key, count(*) AS n FROM pts GROUP BY 1),
dmin AS MATERIALIZED (
  SELECT a.key AS ka, b.key AS kb, a.pid,
         min(sqrt((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y))) AS md
  FROM pts a JOIN pts b
    ON a.key != b.key
   AND b.x BETWEEN a.x - 100 AND a.x + 100
   AND b.y BETWEEN a.y - 100 AND a.y + 100
  WHERE sqrt((a.x - b.x) * (a.x - b.x)
             + (a.y - b.y) * (a.y - b.y)) <= 100
  GROUP BY 1, 2, 3),
directed AS MATERIALIZED (
  SELECT d.ka, d.kb, max(d.md) AS h
  FROM dmin d
  GROUP BY 1, 2
  HAVING count(*) = (SELECT s.n FROM sizes s WHERE s.key = d.ka))
SELECT least(ka, kb) AS key_a, greatest(ka, kb) AS key_b,
       round(max(h), 1) AS hausdorff_m
FROM directed
GROUP BY 1, 2
HAVING count(*) = 2
"""


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining (stages.knn.hard_negative_topk): for each of
    the first 10 embeddings, its 5 most-similar DIFFERENT-label vectors —
    the negatives a contrastive trainer would pair with each anchor.
    Exact top-k; label exclusion replaces self exclusion."""
    from ..stages.knn import hard_negative_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    queries = pa.concat_tables(
        [pa.table(b) for b in emb.filter(expr="vec_id < 10").iter_batches(
            batch_format="pyarrow")]
    )
    out = hard_negative_topk(emb, queries, k=5)
    # project/reorder via map_batches, not select_columns: the merge ends
    # in map_groups and Dataset.schema() can go stale (CLAUDE.md rule)
    return out.map_batches(
        lambda b: pa.table({
            "query_id": b["query_id"],
            "neighbor_id": b["neighbor_id"],
            "rank": b["rank"],
            "cos_sim": b["cos_sim"],
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["hard_negatives"] = """
WITH q AS (SELECT vec_id AS qid, label AS qlab, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cs
  FROM q CROSS JOIN embeddings e WHERE e.label != q.qlab)
SELECT query_id, neighbor_id, rank, round(cs, 6) AS cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cs DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


# zone bboxes (lon_min, lon_max, lat_min, lat_max) — boundaries sit on
# x.xx05 half-steps, OFF the 1e-4 formula-coordinate grid (CLAUDE.md rule)
_DWELL_ZONES = [
    (-77.0405, -77.0195, 38.8495, 38.8805),
    (-77.0105, -76.9895, 38.8695, 38.9005),
    (-76.9805, -76.9505, 38.8505, 38.9405),
]
_DWELL_GAP_US = 1_800_000_000  # 30 min visit-splitting gap


def q_zone_dwell(sf_dir: str):
    """Geofence dwell: per (user, zone), number of visits and total dwell
    seconds — spatial containment (3 disjoint literal bboxes) composed
    with per-key sessionization (>30 min gap splits a visit; dwell =
    last−first per visit, integer µs → exact parity). Zone filter is a
    pure map (zones are literals, nothing broadcast); one bucketed
    shuffle on user_id; islands labeled with the same vectorized
    break-cumsum as `user_trips`."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def in_zones(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        zone = np.full(eid.size, -1, np.int64)
        for zi, (x0, x1, y0, y1) in enumerate(_DWELL_ZONES):
            zone[(lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)] = zi
        m = zone >= 0
        return pa.table({
            "user_id": batch["user_id"].filter(pa.array(m)).cast(pa.int64()),
            "zone_id": pa.array(zone[m]),
            "ts_us": batch["ts"].cast(pa.int64()).filter(pa.array(m)),
        })

    pts = ds.map_batches(in_zones, batch_format="pyarrow")

    def dwell_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "zone_id", "ts_us"], kind="mergesort")
        u = g["user_id"].to_numpy()
        z = g["zone_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        first = np.ones(len(g), bool)
        first[1:] = (u[1:] != u[:-1]) | (z[1:] != z[:-1])
        brk = first.copy()
        brk[1:] |= np.diff(t) > _DWELL_GAP_US
        island = np.cumsum(brk) - 1
        # per-island first/last → dwell; then fold islands per (user, zone)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g)) - 1
        dwell = (t[ends] - t[starts]) // 1_000_000
        df = pd.DataFrame({
            "user_id": u[starts],
            "zone_id": z[starts],
            "dwell": dwell,
        })
        out = df.groupby(["user_id", "zone_id"], sort=False).agg(
            n_visits=("dwell", "size"), dwell_s=("dwell", "sum")
        ).reset_index()
        out["n_visits"] = out["n_visits"].astype(np.int64)
        out["dwell_s"] = out["dwell_s"].astype(np.int64)
        return out

    return bucketed_group_apply(pts, ["user_id"], dwell_bucket,
                                num_buckets=32)


def _zone_case_sql() -> str:
    whens = "\n".join(
        f"    WHEN lon >= {x0} AND lon <= {x1} AND lat >= {y0} "
        f"AND lat <= {y1} THEN {zi}"
        for zi, (x0, x1, y0, y1) in enumerate(_DWELL_ZONES)
    )
    return f"CASE\n{whens}\n  END"


ORACLE_SQL["zone_dwell"] = f"""
WITH coords AS (
  SELECT user_id, ts,
         -77.05 + (event_id % 1000) * 1e-4 AS lon,
         38.85 + ((event_id // 1000) % 1000) * 1e-4 AS lat
  FROM events),
pts AS (
  SELECT user_id, ts, {_zone_case_sql()} AS zone_id
  FROM coords),
zoned AS (SELECT * FROM pts WHERE zone_id IS NOT NULL),
marks AS (
  SELECT user_id, zone_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {_DWELL_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM zoned
  WINDOW w AS (PARTITION BY user_id, zone_id ORDER BY ts)),
isl AS (
  SELECT user_id, zone_id, ts,
         sum(brk) OVER (PARTITION BY user_id, zone_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM marks),
per AS (
  SELECT user_id, zone_id, island,
         (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dwell
  FROM isl GROUP BY 1, 2, 3)
SELECT user_id, zone_id, CAST(count(*) AS BIGINT) AS n_visits,
       CAST(sum(dwell) AS BIGINT) AS dwell_s
FROM per GROUP BY 1, 2
"""


def q_ab_ztest(sf_dir: str):
    """A/B experiment readout: per event type, the two-sample z statistic
    for mean value-cents between variant A (even user_id) and B (odd) —
    the metric every experimentation pipeline ends in. Per-batch per-
    (type, variant) Python-int moment partials (exact at any SF), driver
    fold; means/variances/z finish in literal-mirrored float expressions
    against the HUGEINT oracle so the statistic is bit-identical."""
    import json as _json
    import math

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        var = (
            batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            % 2
        )
        vc = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rows: dict = {}
        for g, a, y in zip(et, var.tolist(), vc.tolist()):
            m = rows.setdefault((g, a), [0, 0, 0])
            m[0] += 1; m[1] += y; m[2] += y * y
        return pa.table({
            "g": pa.array([k[0] for k in rows], pa.string()),
            "a": pa.array([k[1] for k in rows], pa.int64()),
            "m": pa.array([_json.dumps(v) for v in rows.values()], pa.string()),
        })

    acc: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for g, a, mjson in zip(
            b["g"].to_pylist(), b["a"].to_pylist(), b["m"].to_pylist()
        ):
            m = _json.loads(mjson)
            t = acc.setdefault((g, a), [0, 0, 0])
            for i in range(3):
                t[i] += m[i]
    types = sorted({g for g, _ in acc})
    out = {"event_type": [], "n_a": [], "n_b": [],
           "mean_a": [], "mean_b": [], "z_stat": []}
    for g in types:
        na, sa, ssa = acc.get((g, 0), [0, 0, 0])
        nb, sb, ssb = acc.get((g, 1), [0, 0, 0])
        if na == 0 or nb == 0:
            # a variant with no rows: the oracle's FILTERed sums are NULL
            # → NULL means/z; emit the row with nulls instead of crashing
            out["event_type"].append(g)
            out["n_a"].append(na); out["n_b"].append(nb)
            out["mean_a"].append(None); out["mean_b"].append(None)
            out["z_stat"].append(None)
            continue
        mean_a = float(sa) / float(na)
        mean_b = float(sb) / float(nb)
        var_a = float(na * ssa - sa * sa) / (float(na) * float(na))
        var_b = float(nb * ssb - sb * sb) / (float(nb) * float(nb))
        z = (mean_a - mean_b) / math.sqrt(
            var_a / float(na) + var_b / float(nb)
        )
        out["event_type"].append(g)
        out["n_a"].append(na); out["n_b"].append(nb)
        out["mean_a"].append(mean_a); out["mean_b"].append(mean_b)
        out["z_stat"].append(z)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_a": pa.array(out["n_a"], pa.int64()),
        "n_b": pa.array(out["n_b"], pa.int64()),
        "mean_a": pa.array(out["mean_a"], pa.float64()),
        "mean_b": pa.array(out["mean_b"], pa.float64()),
        "z_stat": pa.array(out["z_stat"], pa.float64()),
    })


ORACLE_SQL["ab_ztest"] = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) FILTER (user_id % 2 = 0) AS HUGEINT) AS na,
         CAST(count(*) FILTER (user_id % 2 = 1) AS HUGEINT) AS nb,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
           FILTER (user_id % 2 = 0) AS sa,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
           FILTER (user_id % 2 = 1) AS sb,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
           FILTER (user_id % 2 = 0) AS ssa,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
           FILTER (user_id % 2 = 1) AS ssb
  FROM events GROUP BY 1)
SELECT event_type,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_a,
       CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b,
       (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
        - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
       / sqrt(
           (CAST(na * ssa - sa * sa AS DOUBLE)
            / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))) / CAST(na AS DOUBLE)
         + (CAST(nb * ssb - sb * sb AS DOUBLE)
            / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE))) / CAST(nb AS DOUBLE)
       ) AS z_stat
FROM m
"""


_DEBOUNCE_GAP_US = 60_000_000  # 60 s burst window


def q_debounced_events(sf_dir: str):
    """Burst debounce (event-stream cleaning): keep only the FIRST event
    of each burst per (user, event_type) — a burst is a maximal run of
    events each ≤60 s after its predecessor (gaps-and-islands, so the
    comparison chains through the burst, not just to the previous kept
    row). One bucketed shuffle; (ts, event_id) total order mirrors the
    oracle's window ORDER BY."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    def debounce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "event_type", "ts_us", "event_id"], kind="mergesort"
        )
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        t = g["ts_us"].to_numpy()
        first = np.ones(len(g), bool)
        first[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        brk = first.copy()
        brk[1:] |= np.diff(t) > _DEBOUNCE_GAP_US
        return g[brk][["event_id", "user_id", "event_type"]]

    return bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        debounce_bucket,
        num_buckets=32,
    )


ORACLE_SQL["debounced_events"] = f"""
WITH marks AS (
  SELECT event_id, user_id, event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {_DEBOUNCE_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT event_id, user_id, event_type FROM marks WHERE brk = 1
"""


def q_dedup_cascade(sf_dir: str):
    """Cross-table dedup cascade: after exact prefix dedup on documents,
    purge the embeddings of REMOVED docs — the consistency step every
    multi-modal corpus needs (text dedup must cascade to the parallel
    vector table or retrieval re-surfaces the duplicates). Keeper set =
    min doc_id per prefix key (same plan as `prefix_dedup`); embeddings
    side is a shuffled semi join on the id (ids, never vectors, cross
    the shuffle)."""
    from ..stages.dedup import exact_dedup
    from ..stages.joins import semi_join_shuffled
    from ..stages.textstats import fingerprint_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )
    kept = exact_dedup(docs, "prefix_key").map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    emb = _read(sf_dir, "embeddings", ["vec_id", "label"])
    return semi_join_shuffled(emb, kept, "vec_id", "doc_id")


ORACLE_SQL["dedup_cascade"] = """
SELECT e.vec_id, e.label
FROM embeddings e
WHERE e.vec_id IN (
  SELECT min(doc_id)
  FROM documents
  GROUP BY array_to_string(string_split(text, ' ')[1:8], ' '))
"""


def q_wow_revenue(sf_dir: str):
    """Period-over-period metric: weekly revenue per order priority with
    the previous week's value and percent change (LAG analytics — the
    dashboard staple). Revenue folds in exact integer cents (one
    pre-combined groupby); the per-priority lag is a bucketed per-key
    sorted shift; pct change mirrors the oracle's DOUBLE casts."""
    from ray.data.aggregate import Sum

    from ..stages.groupops import bucketed_group_apply
    from .queries import _cents

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate",
                                  "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        week = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ) // 604_800_000_000
        )
        return pa.table({
            "priority": batch["o_orderpriority"],
            "week": pa.array(week.astype(np.int64)),
            "cents": pa.array(_cents(batch["o_totalprice"])),
        })

    weekly = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["priority", "week"])
        .aggregate(Sum("cents", alias_name="revenue_cents"))
    )

    def lag_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["priority", "week"], kind="mergesort")
        p = g["priority"].to_numpy()
        rev = g["revenue_cents"].to_numpy().astype(np.int64)
        prev = np.roll(rev, 1)
        first = np.ones(len(g), bool)
        first[1:] = p[1:] != p[:-1]
        pct = np.where(
            first, np.nan,
            (rev.astype(np.float64) - prev.astype(np.float64))
            / prev.astype(np.float64),
        )
        return pa.table({
            "priority": pa.array(p, pa.string()),
            "week": pa.array(g["week"].to_numpy().astype(np.int64)),
            "revenue_cents": pa.array(rev),
            "prev_cents": pa.array(
                np.where(first, 0, prev), pa.int64(), mask=first
            ),
            "pct_change": pa.array(
                np.where(first, 0.0, pct), pa.float64(), mask=first
            ),
        })

    return bucketed_group_apply(weekly, ["priority"], lag_bucket,
                                num_buckets=8)


ORACLE_SQL["wow_revenue"] = """
WITH weekly AS (
  SELECT o_orderpriority AS priority,
         epoch_us(o_orderdate) // 604800000000 AS week,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1, 2)
SELECT priority, week, revenue_cents,
       lag(revenue_cents) OVER w AS prev_cents,
       (CAST(revenue_cents AS DOUBLE) - CAST(lag(revenue_cents) OVER w
          AS DOUBLE)) / CAST(lag(revenue_cents) OVER w AS DOUBLE)
         AS pct_change
FROM weekly
WINDOW w AS (PARTITION BY priority ORDER BY week)
"""


def q_od_matrix(sf_dir: str):
    """Origin→destination trip matrix: user trips (the `user_trips`
    >30 min gap segmentation) whose first AND last ping fall inside the
    literal geofence zones, counted per (zone_o, zone_d) — the mobility-
    analytics rollup composing sessionization with containment. One
    bucketed shuffle; endpoints picked by the (ts, event_id) total order
    mirrored by the oracle's arg_min/arg_max (HUGEINT key = us*1e12 +
    event_id — documented bound: event_id < 1e12)."""
    from ray.data.aggregate import Count

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        zone = np.full(eid.size, -1, np.int64)
        for zi, (x0, x1, y0, y1) in enumerate(_DWELL_ZONES):
            zone[(lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)] = zi
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "zone": pa.array(zone),
        })

    def trips_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        z = g["zone"].to_numpy()
        first = np.ones(len(g), bool)
        first[1:] = u[1:] != u[:-1]
        brk = first.copy()
        brk[1:] |= np.diff(t) > 1_800_000_000
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g)) - 1
        zo, zd = z[starts], z[ends]
        m = (zo >= 0) & (zd >= 0)
        return pa.table({
            "zone_o": pa.array(zo[m]),
            "zone_d": pa.array(zd[m]),
        })

    trips = bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        trips_bucket,
        num_buckets=32,
    )
    return (
        trips.groupby(["zone_o", "zone_d"])
        .aggregate(Count(alias_name="n_trips"))
        .map_batches(
            lambda b: pa.table({
                "zone_o": b["zone_o"].cast(pa.int64()),
                "zone_d": b["zone_d"].cast(pa.int64()),
                "n_trips": b["n_trips"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


ORACLE_SQL["od_matrix"] = f"""
WITH coords AS (
  SELECT event_id, user_id, ts,
         -77.05 + (event_id % 1000) * 1e-4 AS lon,
         38.85 + ((event_id // 1000) % 1000) * 1e-4 AS lat
  FROM events),
pts AS (
  SELECT event_id, user_id, ts, COALESCE({{zone_case}}, -1) AS zone
  FROM coords),
marks AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
isl AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM marks),
trips AS (
  SELECT user_id, island,
         arg_min(zone, CAST(epoch_us(ts) AS HUGEINT) * 1000000000000
                       + event_id) AS zone_o,
         arg_max(zone, CAST(epoch_us(ts) AS HUGEINT) * 1000000000000
                       + event_id) AS zone_d
  FROM isl GROUP BY 1, 2)
SELECT zone_o, zone_d, CAST(count(*) AS BIGINT) AS n_trips
FROM trips
WHERE zone_o >= 0 AND zone_d >= 0
GROUP BY 1, 2
""".replace("{zone_case}", _zone_case_sql())


_COOC_MIN_COUNT = 100


def q_word_cooccurrence(sf_dir: str):
    """Word co-occurrence counts (GloVe-style corpus statistics): ordered
    token pairs within a ±2 window across all documents, canonicalized
    (min, max), kept at count ≥ 100 — the embedding-training prep step.
    Per-batch vectorized pair extraction (offset-masked shifted zips, the
    BPE pair-count kernel's shape) with an in-batch combiner, then ONE
    pair-bounded groupby sum."""
    from ray.data.aggregate import Sum

    from ..stages.textstats import _split_tokens

    ds = _read(sf_dir, "documents", ["text"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        _, offsets, flat = _split_tokens(batch["text"])
        n = len(flat)
        if n == 0:
            return pa.table({
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            })
        s = flat.to_pandas().to_numpy()
        ends = offsets[1:]
        parts = []
        for d in (1, 2):
            valid = np.ones(max(n - d, 0), dtype=bool)
            # positions whose i+d crosses a document boundary
            for k in range(1, d + 1):
                cross = ends - k
                cross = cross[(cross >= 0) & (cross < n - d)]
                valid[cross] = False
            pos = np.flatnonzero(valid)
            a, b = s[pos], s[pos + d]
            parts.append((np.minimum(a, b), np.maximum(a, b)))
        w1 = np.concatenate([p[0] for p in parts])
        w2 = np.concatenate([p[1] for p in parts])
        df = pd.DataFrame({"w1": w1, "w2": w2})
        vc = df.value_counts(sort=False)
        idx = vc.index.to_frame(index=False)
        return pa.table({
            "w1": pa.array(idx["w1"].astype(str), pa.string()),
            "w2": pa.array(idx["w2"].astype(str), pa.string()),
            "c": pa.array(vc.to_numpy().astype(np.int64)),
        })

    return (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="n_cooc"))
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["n_cooc"], _COOC_MIN_COUNT)
            ).select(["w1", "w2", "n_cooc"]),
            batch_format="pyarrow",
        )
    )


ORACLE_SQL["word_cooccurrence"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
pairs AS (
  SELECT least(a.word, b.word) AS w1, greatest(a.word, b.word) AS w2
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_cooc
FROM pairs GROUP BY 1, 2 HAVING count(*) >= {_COOC_MIN_COUNT}
"""


def q_user_trigrams(sf_dir: str):
    """Sequential pattern mining: the most common event-type TRIGRAMS in
    each user's (ts, event_id)-ordered history, counted corpus-wide and
    kept at count >= 30 — the behavior-path primitive next to
    `funnel_counts`. One bucketed shuffle; trigram extraction is a
    vectorized shifted zip masked at user boundaries; output is bounded
    by |event_type|^3. Oracle = two chained lead() windows."""
    from ray.data.aggregate import Sum

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    def trigram_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(g)
        empty = pa.table({
            "trigram": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
        })
        if n < 3:
            return empty
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        pos = np.flatnonzero(same)
        if pos.size == 0:
            return empty
        tri = pd.Series(
            [f"{et[i]}>{et[i+1]}>{et[i+2]}" for i in pos]
        )
        vc = tri.value_counts()
        return pa.table({
            "trigram": pa.array(vc.index.astype(str), pa.string()),
            "c": pa.array(vc.to_numpy().astype(np.int64)),
        })

    grams = bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        trigram_bucket,
        num_buckets=32,
    )
    return (
        grams.groupby("trigram")
        .aggregate(Sum("c", alias_name="n_occurrences"))
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["n_occurrences"], 30)
            ).select(["trigram", "n_occurrences"]),
            batch_format="pyarrow",
        )
    )


ORACLE_SQL["user_trigrams"] = """
WITH tri AS (
  SELECT user_id,
         event_type || '>' || lead(event_type, 1) OVER w
           || '>' || lead(event_type, 2) OVER w AS trigram,
         lead(user_id, 2) OVER w AS user2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT trigram, CAST(count(*) AS BIGINT) AS n_occurrences
FROM tri
WHERE user2 = user_id
GROUP BY 1 HAVING count(*) >= 30
"""


def q_twa_value(sf_dir: str):
    """Time-weighted average (monitoring/finance staple): per event type,
    each value weighted by how long it was current (gap to the same
    user's next event of that type; the last observation carries zero
    weight) — the correct average for irregularly-sampled series, unlike
    the naive mean. Weights are integer µs × integer cents folded as
    Python ints (exceeds int64 at scale); one bucketed shuffle; the TWA
    float division mirrors the oracle's HUGEINT→DOUBLE casts."""
    import json as _json

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        vc = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "vc": pa.array(vc),
        })

    def twa_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["user_id", "event_type", "ts_us", "event_id"], kind="mergesort"
        )
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        t = g["ts_us"].to_numpy()
        vc = g["vc"].to_numpy()
        samekey = np.zeros(len(g), bool)
        samekey[:-1] = (u[:-1] == u[1:]) & (et[:-1] == et[1:])
        gap = np.zeros(len(g), np.int64)
        if len(t) > 1:
            gap[:-1] = np.where(samekey[:-1], np.diff(t), 0)
        rows: dict = {}
        for k, w, y in zip(et.tolist(), gap.tolist(), vc.tolist()):
            m = rows.setdefault(k, [0, 0])
            m[0] += int(w) * int(y)
            m[1] += int(w)
        return pa.table({
            "g": pa.array(list(rows), pa.string()),
            "m": pa.array([_json.dumps(v) for v in rows.values()],
                          pa.string()),
        })

    acc: dict = {}
    parts = bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        twa_bucket,
        num_buckets=32,
    )
    for b in parts.iter_batches(batch_format="pyarrow"):
        for g, mjson in zip(b["g"].to_pylist(), b["m"].to_pylist()):
            m = _json.loads(mjson)
            a = acc.setdefault(g, [0, 0])
            a[0] += m[0]; a[1] += m[1]
    types = sorted(k for k, v in acc.items() if v[1] > 0)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "twa_cents": pa.array(
            [float(acc[g][0]) / float(acc[g][1]) for g in types],
            pa.float64(),
        ),
    })


ORACLE_SQL["twa_value"] = """
WITH w AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS vc,
         CAST(COALESCE(
           epoch_us(lead(ts) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id))
           - epoch_us(ts), 0) AS BIGINT) AS gap_us
  FROM events)
SELECT event_type,
       CAST(sum(CAST(gap_us AS HUGEINT) * CAST(vc AS HUGEINT)) AS DOUBLE)
       / CAST(sum(CAST(gap_us AS HUGEINT)) AS DOUBLE) AS twa_cents
FROM w GROUP BY 1 HAVING sum(gap_us) > 0
"""


def q_region_revenue_share(sf_dir: str):
    """4-table star-join rollup with ratio-to-total: order revenue per
    REGION (fact ⋈ customer via a bucketed hash join — both sides large —
    then the two tiny dimensions as one broadcast lookup) and each
    region's share of the total. Revenue folds in exact integer cents;
    the share division mirrors the oracle's HUGEINT→DOUBLE casts, so the
    floats are bit-identical."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..stages.joins import bucket_hash_join
    from .queries import _cents

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: pa.table({
            "o_custkey": b["o_custkey"].cast(pa.int64()),
            "cents": pa.array(_cents(b["o_totalprice"].to_numpy(
                zero_copy_only=False))),
        }),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = bucket_hash_join(orders, cust, "o_custkey", "c_custkey")

    nation = pa.concat_tables(
        [pa.table(b) for b in _read(sf_dir, "nation").iter_batches(
            batch_format="pyarrow")]
    )
    region = pa.concat_tables(
        [pa.table(b) for b in _read(sf_dir, "region").iter_batches(
            batch_format="pyarrow")]
    )
    n2r = dict(zip(nation["n_nationkey"].to_pylist(),
                   nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(),
                      region["r_name"].to_pylist()))
    lut = _ray.put({k: r2name[v] for k, v in n2r.items()})

    def add_region(batch: pa.Table) -> pa.Table:
        m = _ray.get(lut)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_name": pa.array([m[int(k)] for k in nk], pa.string()),
            "cents": batch["cents"],
        })

    agg = (
        j.map_batches(add_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("cents", alias_name="revenue_cents"))
    )
    rows = sorted(
        ((r["r_name"], int(r["revenue_cents"])) for r in agg.take_all())
    )
    total = sum(c for _, c in rows)
    return pa.table({
        "r_name": pa.array([r for r, _ in rows], pa.string()),
        "revenue_cents": pa.array([c for _, c in rows], pa.int64()),
        "revenue_share": pa.array(
            [float(c) / float(total) for _, c in rows], pa.float64()
        ),
    })


ORACLE_SQL["region_revenue_share"] = """
WITH rev AS (
  SELECT r_name,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1)
SELECT r_name, revenue_cents,
       CAST(revenue_cents AS DOUBLE)
       / CAST((SELECT sum(revenue_cents) FROM rev) AS DOUBLE)
         AS revenue_share
FROM rev
"""


def q_session_length_quantiles(sf_dir: str):
    """Quantiles over a DERIVED table: exact p25/p50/p75 of session
    LENGTHS (ping counts per >30 min-gap session) — sessionization feeding
    the distributed exact-quantile collapse (`stages.groupops.
    exact_quantiles`), showing the quantile machinery composes with an
    islanded intermediate, not just raw columns."""
    from ..stages.groupops import bucketed_group_apply, exact_quantiles

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    def lengths_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        first = np.ones(len(g), bool)
        first[1:] = u[1:] != u[:-1]
        brk = first.copy()
        brk[1:] |= np.diff(t) > 1_800_000_000
        starts = np.flatnonzero(brk)
        lengths = np.diff(np.append(starts, len(g)))
        return pa.table({"session_len": pa.array(lengths.astype(np.int64))})

    lens = bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        lengths_bucket,
        num_buckets=32,
    )
    return exact_quantiles(lens, "session_len", [0.25, 0.5, 0.75])


ORACLE_SQL["session_length_quantiles"] = """
WITH marks AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
isl AS (
  SELECT user_id, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session
  FROM marks),
lens AS (
  SELECT count(*) AS session_len FROM isl GROUP BY user_id, session)
SELECT 0.25 AS p, round(quantile_cont(session_len, 0.25), 6) AS q FROM lens
UNION ALL
SELECT 0.5 AS p, round(quantile_cont(session_len, 0.5), 6) AS q FROM lens
UNION ALL
SELECT 0.75 AS p, round(quantile_cont(session_len, 0.75), 6) AS q FROM lens
"""


def q_conversion_latency(sf_dir: str):
    """Conversion-latency quantiles: for every view event, minutes until
    the SAME user's next purchase (views with no later purchase drop out —
    the funnel-timing metric next to `funnel_counts`). One bucketed
    shuffle; inside the bucket the next purchase is a position-based scan
    over the (ts, event_id) total order, exactly the oracle's
    min() OVER (... ROWS CURRENT ROW TO UNBOUNDED FOLLOWING) semantics
    including same-microsecond tie handling. Latencies floor to integer
    MINUTES (bounded distinct values — the exact-quantile collapse's
    documented sizing rule) and finish in `exact_quantiles`."""
    from ..stages.groupops import bucketed_group_apply, exact_quantiles

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    def latency_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        t = g["ts_us"].to_numpy()
        out = []
        first = np.ones(len(g), bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(g))
        for s, e in zip(starts, ends):
            types = et[s:e]
            ppos = np.flatnonzero(types == "purchase")
            vpos = np.flatnonzero(types == "view")
            if ppos.size == 0 or vpos.size == 0:
                continue
            nxt = np.searchsorted(ppos, vpos, side="left")
            ok = nxt < ppos.size
            lat = (t[s + ppos[nxt[ok]]] - t[s + vpos[ok]]) // 60_000_000
            out.append(lat.astype(np.int64))
        if not out:
            return pa.table({"latency_min": pa.array([], pa.int64())})
        return pa.table({"latency_min": pa.array(np.concatenate(out))})

    lat = bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        latency_bucket,
        num_buckets=32,
    )
    return exact_quantiles(lat, "latency_min", [0.5, 0.9, 0.99])


ORACLE_SQL["conversion_latency"] = """
WITH nxt AS (
  SELECT event_type, ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_purchase
  FROM events),
lat AS (
  SELECT (epoch_us(next_purchase) - epoch_us(ts)) // 60000000
           AS latency_min
  FROM nxt WHERE event_type = 'view' AND next_purchase IS NOT NULL)
SELECT 0.5 AS p, round(quantile_cont(latency_min, 0.5), 6) AS q FROM lat
UNION ALL
SELECT 0.9 AS p, round(quantile_cont(latency_min, 0.9), 6) AS q FROM lat
UNION ALL
SELECT 0.99 AS p, round(quantile_cont(latency_min, 0.99), 6) AS q FROM lat
"""


def q_nation_parttype_revenue(sf_dir: str):
    """4-way supplier-side star join: lineitem revenue per (supplier
    NATION, part TYPE) — the procurement rollup that finally exercises
    the supplier dimension. Fact side maps once; supplier+nation and
    part are TINY dimensions shipped as two broadcast lookup maps
    (ray.put once, read per batch); revenue folds exactly in 1e-4-dollar
    integers with a per-batch combiner, so the one groupby moves
    ≤ |nations × types| rows per block."""
    import ray as _ray
    from ray.data.aggregate import Count, Sum

    from .queries import _cents

    supplier = pa.concat_tables(
        [pa.table(b) for b in _read(
            sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
        ).iter_batches(batch_format="pyarrow")]
    )
    nation = pa.concat_tables(
        [pa.table(b) for b in _read(
            sf_dir, "nation", ["n_nationkey", "n_name"]
        ).iter_batches(batch_format="pyarrow")]
    )
    part = pa.concat_tables(
        [pa.table(b) for b in _read(
            sf_dir, "part", ["p_partkey", "p_type"]
        ).iter_batches(batch_format="pyarrow")]
    )
    n_name = dict(zip(nation["n_nationkey"].to_pylist(),
                      nation["n_name"].to_pylist()))
    supp2nation = {
        s: n_name[nk]
        for s, nk in zip(supplier["s_suppkey"].to_pylist(),
                         supplier["s_nationkey"].to_pylist())
    }
    part2type = dict(zip(part["p_partkey"].to_pylist(),
                         part["p_type"].to_pylist()))
    lut = _ray.put((supp2nation, part2type))

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        s2n, p2t = _ray.get(lut)
        rev = _cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        ) * (100 - _cents(batch["l_discount"].to_numpy(zero_copy_only=False)))
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "n_name": [s2n[int(s)] for s in sk],
            "p_type": [p2t[int(p)] for p in pk],
            "rev": rev,
        })
        g = df.groupby(["n_name", "p_type"], as_index=False).agg(
            rev=("rev", "sum"), n=("rev", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False
                                    ).replace_schema_metadata(None)

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["n_name", "p_type"])
        .aggregate(Sum("rev", alias_name="rev"), Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        from .queries import _half_away_cents

        rev = batch["rev"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": batch["n_name"],
            "p_type": batch["p_type"],
            # exact 1e-4-dollar ints → half-away-from-zero cents → dollars
            # (DuckDB DECIMAL round parity; numpy round is half-to-even)
            "revenue": pa.array(_half_away_cents(rev) / 100.0),
            "n_items": batch["n"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["nation_parttype_revenue"] = """
SELECT n_name, p_type,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
"""


_PSI_EDGES = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0]


def q_value_drift_psi(sf_dir: str):
    """Distribution-drift monitor (population stability index): the value
    column's week-1 distribution vs week-4, binned at fixed literal edges,
    one row per bin with expected/actual fractions and the PSI term
    (p−q)·ln(p/q) — the ML feature-drift staple. One pre-combined
    groupby (bins × 2 periods); fractions and PSI terms finish in
    literal-mirrored float expressions, emitted PER BIN so no float
    summation order exists to disagree on."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        week = (t_us - 1_704_067_200_000_000) // 604_800_000_000
        v = batch["value"].to_numpy(zero_copy_only=False)
        m = (week == 0) | (week == 3)
        if not m.any():
            return pa.table({
                "bin_id": pa.array([], pa.int64()),
                "period": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        # side="left": v == edge stays in the lower bin (oracle's <=)
        b = np.searchsorted(np.array(_PSI_EDGES), v[m], side="left")
        per = np.where(week[m] == 0, "expected", "actual")
        df = pd.DataFrame({"bin_id": b, "period": per})
        vc = df.value_counts(sort=False)
        idx = vc.index.to_frame(index=False)
        return pa.table({
            "bin_id": pa.array(idx["bin_id"].to_numpy().astype(np.int64)),
            "period": pa.array(idx["period"].astype(str), pa.string()),
            "n": pa.array(vc.to_numpy().astype(np.int64)),
        })

    counts = {
        (r["bin_id"], r["period"]): r["n"]
        for r in ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["bin_id", "period"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    }
    n_exp = sum(v for (b, p), v in counts.items() if p == "expected")
    n_act = sum(v for (b, p), v in counts.items() if p == "actual")
    bins = sorted({b for b, _ in counts})
    out = {"bin_id": [], "expected_frac": [], "actual_frac": [],
           "psi_term": []}
    for b in bins:
        e = counts.get((b, "expected"), 0)
        a = counts.get((b, "actual"), 0)
        if e == 0 or a == 0:
            continue  # mirror the oracle's INNER join of non-empty bins
        p = float(e) / float(n_exp)
        q = float(a) / float(n_act)
        out["bin_id"].append(b)
        out["expected_frac"].append(p)
        out["actual_frac"].append(q)
        out["psi_term"].append((p - q) * math.log(p / q))
    return pa.table({
        "bin_id": pa.array(out["bin_id"], pa.int64()),
        "expected_frac": pa.array(out["expected_frac"], pa.float64()),
        "actual_frac": pa.array(out["actual_frac"], pa.float64()),
        "psi_term": pa.array(out["psi_term"], pa.float64()),
    })


def _psi_bin_sql() -> str:
    conds = []
    for i, e in enumerate(_PSI_EDGES):
        prev = f"value > {_PSI_EDGES[i-1]} AND " if i else ""
        conds.append(f"WHEN {prev}value <= {e} THEN {i}")
    return "CASE " + " ".join(conds) + f" ELSE {len(_PSI_EDGES)} END"


ORACLE_SQL["value_drift_psi"] = f"""
WITH binned AS (
  SELECT {_psi_bin_sql()} AS bin_id,
         CASE WHEN (epoch_us(ts) - 1704067200000000) // 604800000000 = 0
              THEN 'expected'
              WHEN (epoch_us(ts) - 1704067200000000) // 604800000000 = 3
              THEN 'actual' END AS period
  FROM events
  WHERE (epoch_us(ts) - 1704067200000000) // 604800000000 IN (0, 3)),
c AS (
  SELECT bin_id, period, CAST(count(*) AS BIGINT) AS n
  FROM binned GROUP BY 1, 2),
tot AS (
  SELECT period, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1),
frac AS (
  SELECT c.bin_id, c.period,
         CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS f
  FROM c JOIN tot t USING (period))
SELECT e.bin_id,
       e.f AS expected_frac,
       a.f AS actual_frac,
       (e.f - a.f) * ln(e.f / a.f) AS psi_term
FROM (SELECT bin_id, f FROM frac WHERE period = 'expected') e
JOIN (SELECT bin_id, f FROM frac WHERE period = 'actual') a
  USING (bin_id)
"""


def q_customer_rfm(sf_dir: str):
    """RFM customer segmentation: per customer recency (latest order day
    index), frequency (order count) and monetary (total cents), each
    binned into quartiles at exact quantile_cont thresholds (the
    `exact_quantiles` collapse — same interpolation rule as the oracle,
    so thresholds are bit-identical and the <= comparisons agree). One
    order-table groupby (customer-bounded) + three driver-small quantile
    collapses + a pure labeling map; segment = 'r-f-m'."""
    from ray.data.aggregate import Count, Max, Sum

    from ..stages.groupops import exact_quantiles
    from .queries import _cents

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ) // 86_400_000_000
        )
        return pa.table({
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "day": pa.array(day.astype(np.int64)),
            "cents": pa.array(_cents(batch["o_totalprice"].to_numpy(
                zero_copy_only=False))),
        })

    rfm = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Max("day", alias_name="recency_day"),
            Count(alias_name="frequency"),
            Sum("cents", alias_name="monetary_cents"),
        )
        .map_batches(
            lambda b: pa.table({
                "o_custkey": b["o_custkey"].cast(pa.int64()),
                "recency_day": b["recency_day"].cast(pa.int64()),
                "frequency": b["frequency"].cast(pa.int64()),
                "monetary_cents": b["monetary_cents"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .materialize()
    )
    ps = [0.25, 0.5, 0.75]
    thr = {
        col: [r["q"] for r in sorted(
            exact_quantiles(rfm, col, ps, round_to=None).to_pylist(),
            key=lambda r: r["p"],
        )]
        for col in ("recency_day", "frequency", "monetary_cents")
    }

    def label(batch: pa.Table) -> pa.Table:
        def bucket(col):
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            t = thr[col]
            # v <= t1 → 1, ... — identical to the oracle's CASE chain
            return (
                1 + (v > t[0]).astype(np.int64)
                + (v > t[1]).astype(np.int64)
                + (v > t[2]).astype(np.int64)
            )

        rb, fb, mb = (bucket(c) for c in
                      ("recency_day", "frequency", "monetary_cents"))
        seg = pd.Series(rb).astype(str) + "-" + pd.Series(fb).astype(str) \
            + "-" + pd.Series(mb).astype(str)
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "r_bucket": pa.array(rb),
            "f_bucket": pa.array(fb),
            "m_bucket": pa.array(mb),
            "rfm_segment": pa.array(seg.to_numpy(), pa.string()),
        })

    return rfm.map_batches(label, batch_format="pyarrow")


ORACLE_SQL["customer_rfm"] = """
WITH rfm AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // 86400000000) AS recency_day,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY 1),
q AS (
  SELECT quantile_cont(recency_day, 0.25) AS r1,
         quantile_cont(recency_day, 0.5) AS r2,
         quantile_cont(recency_day, 0.75) AS r3,
         quantile_cont(frequency, 0.25) AS f1,
         quantile_cont(frequency, 0.5) AS f2,
         quantile_cont(frequency, 0.75) AS f3,
         quantile_cont(monetary_cents, 0.25) AS m1,
         quantile_cont(monetary_cents, 0.5) AS m2,
         quantile_cont(monetary_cents, 0.75) AS m3
  FROM rfm),
lab AS (
  SELECT o_custkey,
         CASE WHEN recency_day <= r1 THEN 1 WHEN recency_day <= r2 THEN 2
              WHEN recency_day <= r3 THEN 3 ELSE 4 END AS r_bucket,
         CASE WHEN frequency <= f1 THEN 1 WHEN frequency <= f2 THEN 2
              WHEN frequency <= f3 THEN 3 ELSE 4 END AS f_bucket,
         CASE WHEN monetary_cents <= m1 THEN 1 WHEN monetary_cents <= m2
              THEN 2 WHEN monetary_cents <= m3 THEN 3 ELSE 4 END AS m_bucket
  FROM rfm, q)
SELECT o_custkey, r_bucket, f_bucket, m_bucket,
       r_bucket || '-' || f_bucket || '-' || m_bucket AS rfm_segment
FROM lab
"""


def q_spend_gini(sf_dir: str):
    """EXACT distributed Gini coefficient of customer spend (the
    data-balance / inequality audit): G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n
    over the (cents, custkey) total order. No global sort: the
    price_quartiles value-range two-phase scan gives exact global ranks
    (range counts → driver offsets → in-range sort), and Σ(rank·x) folds
    per range in PYTHON ints (rank×cents×n overflows int64 at corpus
    scale). Float finish literally mirrors the HUGEINT oracle."""
    import json as _json

    from ray.data.aggregate import Sum

    from ..stages.groupops import bucketed_group_apply
    from .queries import _cents

    RANGE_C = 1 << 16

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "cents": pa.array(_cents(batch["o_totalprice"].to_numpy(
                zero_copy_only=False))),
        })

    cust = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents"))
        .map_batches(
            lambda b: pa.table({
                "o_custkey": b["o_custkey"].cast(pa.int64()),
                "cents": b["cents"].cast(pa.int64()),
                "rng": pc.divide(b["cents"].cast(pa.int64()),
                                 pa.scalar(RANGE_C, pa.int64())),
            }),
            batch_format="pyarrow",
        )
        .materialize()
    )
    counts = {r["rng"]: r["count()"] for r in
              cust.groupby("rng").count().take_all()}
    offsets, acc = {}, 0
    for rng in sorted(counts):
        offsets[rng] = acc
        acc += counts[rng]
    n = acc

    def rank_partials(g: pd.DataFrame) -> pa.Table:
        s1 = 0
        s = 0
        for rng, gr in g.groupby("rng"):
            gr = gr.sort_values(["cents", "o_custkey"], kind="mergesort")
            base = offsets[int(rng)]
            for i, c in enumerate(gr["cents"].tolist()):
                s1 += (base + i + 1) * int(c)  # 1-based rank
                s += int(c)
        return pa.table({"m": pa.array([_json.dumps([s1, s])], pa.string())})

    s1 = s = 0
    for b in bucketed_group_apply(
        cust, ["rng"], rank_partials, num_buckets=16
    ).iter_batches(batch_format="pyarrow"):
        for mjson in b["m"].to_pylist():
            a, c = _json.loads(mjson)
            s1 += a; s += c
    gini = (
        float(2 * s1) / (float(n) * float(s)) - float(n + 1) / float(n)
    )
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "total_cents": pa.array([s], pa.int64()),
        "gini": pa.array([gini], pa.float64()),
    })


ORACLE_SQL["spend_gini"] = """
WITH m AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS rk
  FROM m),
agg AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(rk AS HUGEINT) * CAST(cents AS HUGEINT)) AS s1,
         sum(CAST(cents AS HUGEINT)) AS s
  FROM r)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(s AS BIGINT) AS total_cents,
       CAST(2 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
         - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
FROM agg
"""


def q_rolling_unique_users(sf_dir: str):
    """Sliding-window DISTINCT (rolling 24 h uniques at hourly marks):
    for each hour mark H, the number of distinct users with an event in
    ((H−24 h)·3600 s, H·3600 s] — the streaming-dashboard metric the
    hopping-window COUNT can't answer (distinct doesn't decompose).
    Plan: each event explodes to its 24 affected hour marks with an
    IN-BATCH (hour, user) dedup combiner, one (hour, user) groupby
    dedups exactly, one hour-bounded groupby counts — bounded ×24
    replication, both shuffles move (hour, user) pairs at most."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def explode(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        he = t_us // 3_600_000_000
        h = (he[:, None] + np.arange(1, 25)).ravel()
        u = np.repeat(uid, 24)
        df = pd.DataFrame({"hour_mark": h, "user_id": u}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False
                                    ).replace_schema_metadata(None)

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["hour_mark", "user_id"])
        .count()
    )
    return (
        pairs.groupby("hour_mark")
        .aggregate(Count(alias_name="n_users"))
        .map_batches(
            lambda b: pa.table({
                "hour_mark": b["hour_mark"].cast(pa.int64()),
                "n_users": b["n_users"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


ORACLE_SQL["rolling_unique_users"] = """
WITH marks AS (
  SELECT user_id,
         unnest(generate_series(epoch_us(ts) // 3600000000 + 1,
                                epoch_us(ts) // 3600000000 + 24))
           AS hour_mark
  FROM events)
SELECT hour_mark, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM marks GROUP BY 1
"""


_SESS_CUTOFF_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z
_SESS_GAP_US = 1_800_000_000


def q_incremental_sessions(sf_dir: str):
    """INCREMENTAL sessionization with state handoff — the streaming-
    resume analog of the nightly batch: period A (before Jan 15) is
    sessionized first; its per-user OPEN tail (last event time + session
    count — the checkpoint a streaming job would persist) crosses a
    materialization boundary as a state table; period B is sessionized
    against that carried state (a first B-event within 30 min CONTINUES
    the open session). Output = per-session rows over A∪B and must equal
    the from-scratch batch islands — which is exactly what the oracle
    computes, so the equivalence IS the check. Two bucketed shuffles on
    user_id (A, then B ∪ state rows); state rows ride the same shuffle
    as sentinel-phase rows, never a driver loop."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
        })

    ev = ds.map_batches(prep, batch_format="pyarrow")
    a = ev.filter(expr=f"ts_us < {_SESS_CUTOFF_US}")
    b = ev.filter(expr=f"ts_us >= {_SESS_CUTOFF_US}")

    def sess_a(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        first = np.ones(len(g), bool)
        first[1:] = u[1:] != u[:-1]
        brk = first.copy()
        brk[1:] |= np.diff(t) > _SESS_GAP_US
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g)) - 1
        # per-user session ordinal for each session start
        ustart = np.flatnonzero(first[starts])  # index into starts
        base = np.zeros(starts.size, np.int64)
        seq = np.arange(starts.size)
        base = seq - seq[np.maximum.accumulate(
            np.where(first[starts], seq, -1))]
        closed = pa.table({
            "user_id": pa.array(u[starts].astype(np.int64)),
            "session_idx": pa.array(base.astype(np.int64)),
            "start_us": pa.array(t[starts].astype(np.int64)),
            "end_us": pa.array(t[ends].astype(np.int64)),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            "phase": pa.array(np.full(starts.size, 0, np.int64)),
        })
        return closed

    sessions_a = bucketed_group_apply(a, ["user_id"], sess_a,
                                      num_buckets=32).materialize()

    # checkpoint: each user's LAST A-session (the open tail) + count
    def tail_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "session_idx"], kind="mergesort")
        last = g.groupby("user_id", sort=False).tail(1)
        return pa.table({
            "event_id": pa.array(np.full(len(last), -1, np.int64)),
            "user_id": pa.array(last["user_id"].to_numpy()),
            # state row carries: ts = open session's last event time
            "ts_us": pa.array(last["end_us"].to_numpy()),
            "state_sessions": pa.array(
                (last["session_idx"] + 1).to_numpy().astype(np.int64)),
            "state_start": pa.array(last["start_us"].to_numpy()),
            "state_n": pa.array(last["n_events"].to_numpy()),
        })

    state = bucketed_group_apply(
        sessions_a, ["user_id"], tail_bucket, num_buckets=32
    )

    def b_with_state(batch: pa.Table) -> pa.Table:
        cols = {
            "event_id": batch["event_id"].cast(pa.int64()),
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts_us"].cast(pa.int64()),
        }
        n = batch.num_rows
        for name, default in (("state_sessions", -1), ("state_start", -1),
                              ("state_n", -1)):
            if name in batch.column_names:
                cols[name] = batch[name].cast(pa.int64())
            else:
                cols[name] = pa.array(np.full(n, default, np.int64))
        return pa.table(cols)

    merged = b.map_batches(b_with_state, batch_format="pyarrow").union(
        state.map_batches(b_with_state, batch_format="pyarrow")
    )

    def sess_b(g: pd.DataFrame) -> pa.Table:
        out = {"user_id": [], "session_idx": [], "start_us": [],
               "end_us": [], "n_events": []}
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        for uid, rows in g.groupby("user_id", sort=False):
            st = rows[rows["event_id"] == -1]
            evs = rows[rows["event_id"] != -1]
            carried_sessions = 0
            open_start = open_end = None
            open_n = 0
            if len(st):
                carried_sessions = int(st["state_sessions"].iloc[0])
                open_start = int(st["state_start"].iloc[0])
                open_end = int(st["ts_us"].iloc[0])
                open_n = int(st["state_n"].iloc[0])
            t = evs["ts_us"].to_numpy()
            if t.size == 0:
                continue  # no B events: A already emitted this user
            brk = np.ones(t.size, bool)
            brk[1:] = np.diff(t) > _SESS_GAP_US
            # does the first B event continue the carried open session?
            continues = (
                open_end is not None and t[0] - open_end <= _SESS_GAP_US
            )
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], t.size) - 1
            for si, (s0, e0) in enumerate(zip(starts, ends)):
                if si == 0 and continues:
                    out["user_id"].append(int(uid))
                    out["session_idx"].append(carried_sessions - 1)
                    out["start_us"].append(open_start)
                    out["end_us"].append(int(t[e0]))
                    out["n_events"].append(open_n + int(e0 - s0 + 1))
                else:
                    out["user_id"].append(int(uid))
                    out["session_idx"].append(
                        carried_sessions + si - (1 if continues else 0))
                    out["start_us"].append(int(t[s0]))
                    out["end_us"].append(int(t[e0]))
                    out["n_events"].append(int(e0 - s0 + 1))
        return pa.table({
            "user_id": pa.array(out["user_id"], pa.int64()),
            "session_idx": pa.array(out["session_idx"], pa.int64()),
            "start_us": pa.array(out["start_us"], pa.int64()),
            "end_us": pa.array(out["end_us"], pa.int64()),
            "n_events": pa.array(out["n_events"], pa.int64()),
            "phase": pa.array(np.full(len(out["user_id"]), 1, np.int64)),
        })

    sessions_b = bucketed_group_apply(merged, ["user_id"], sess_b,
                                      num_buckets=32)

    # final = A sessions except each user's last when B continued it,
    # plus all B-phase sessions. Equivalent filter: drop the A row iff a
    # B row with the same (user, session_idx) exists.
    import ray as _ray

    sessions_b = sessions_b.materialize()
    # no select_columns after map_groups (CLAUDE.md schema-staleness rule).
    # Driver-bounded: B-phase sessions come from the INCREMENTAL batch
    # only (the design premise of incremental processing — the increment
    # is small relative to the snapshot); composite int64 keys so the
    # anti-filter is one vectorized np.isin, not a per-row set probe.
    b_keys = np.array(
        sorted(r["user_id"] * (2**32) + r["session_idx"]
               for r in sessions_b.take_all()),
        np.int64,
    )
    bref = _ray.put(b_keys)

    def drop_superseded(batch: pa.Table) -> pa.Table:
        keys = _ray.get(bref)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        si = batch["session_idx"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(u * (2**32) + si, keys, assume_unique=False)
        return batch.filter(pa.array(keep))

    final_a = sessions_a.map_batches(drop_superseded, batch_format="pyarrow")
    both = final_a.union(sessions_b)
    return both.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"],
            "session_idx": b["session_idx"],
            "start_us": b["start_us"],
            "end_us": b["end_us"],
            "n_events": b["n_events"],
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["incremental_sessions"] = f"""
WITH marks AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {_SESS_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
isl AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS UNBOUNDED PRECEDING) AS session
  FROM marks)
SELECT user_id,
       CAST(session - 1 AS BIGINT) AS session_idx,
       CAST(min(t) AS BIGINT) AS start_us,
       CAST(max(t) AS BIGINT) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM isl GROUP BY user_id, session
"""


def q_skewed_segment_load(sf_dir: str):
    """Skew-aware join demo under a REAL hot key: half of all events hash
    to ONE derived key (k=7), the rest spread over 500 — the classic
    fact-side hot spot. `stages.joins.skew_hash_join` detects the hot key
    with the exact Misra-Gries pass and routes it around the shuffle
    (broadcast map side-path), cold keys take the bucketed hash join;
    output = per-market-segment event count + cents (SF-invariant
    dimension: customers with key < 500 exist at every SF)."""
    from ray.data.aggregate import Sum

    from ..stages.joins import skew_hash_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def keyed(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.where(eid % 2 == 0, 7, uid % 500)
        vc = np.round(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"k": pa.array(k), "vc": pa.array(vc)})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr="c_custkey < 500"
    )
    # materialize the PROJECTED 2-column fact side: the skew join's
    # sketch passes + split scan it several times, and re-running the
    # keying map each time costs more than the narrow table holds
    fact = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    joined = skew_hash_join(fact, cust, "k", "c_custkey",
                            num_buckets=16, hot_denom=20)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_mktsegment": batch["c_mktsegment"].to_pandas(),
            "vc": batch["vc"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("c_mktsegment", as_index=False).agg(
            cents=("vc", "sum"), n=("vc", "size"))
        return pa.Table.from_pandas(g, preserve_index=False
                                    ).replace_schema_metadata(None)

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("cents", alias_name="cents"),
                   Sum("n", alias_name="n_events"))
        .map_batches(
            lambda b: pa.table({
                "c_mktsegment": b["c_mktsegment"],
                "total_cents": b["cents"].cast(pa.int64()),
                "n_events": b["n_events"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


ORACLE_SQL["skewed_segment_load"] = """
WITH keyed AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 7 ELSE user_id % 500 END AS k,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events)
SELECT c_mktsegment,
       CAST(sum(vc) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM keyed JOIN customer ON k = c_custkey
WHERE c_custkey < 500
GROUP BY 1
"""


def q_colocation_pairs(sf_dir: str):
    """Co-location network (mobility/contact analytics): unordered user
    pairs observed in the SAME geofence zone during the SAME hour, with
    the count of distinct co-located (zone, hour) cells — the
    spatio-temporal self-join composing the `_DWELL_ZONES` containment
    with 15-minute co-presence bucketing. Plan: zone+bucket assignment is
    a pure map; per-cell occupancy is distinct-user-deduped in its bucket and
    pairs are emitted there (occupancy² bounded per cell — the salting
    knob documented for hot venues); one pair-bounded groupby counts.
    Output pairs with ≥ 2 shared cells (the 'repeat contact' filter)."""
    from ray.data.aggregate import Count

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def assign(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        zone = np.full(eid.size, -1, np.int64)
        for zi, (x0, x1, y0, y1) in enumerate(_DWELL_ZONES):
            zone[(lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)] = zi
        hour = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 900_000_000  # 15-min co-presence buckets
        )
        m = zone >= 0
        return pa.table({
            "zone": pa.array(zone[m]),
            "hour": pa.array(hour[m].astype(np.int64)),
            "user_id": batch["user_id"].filter(pa.array(m)).cast(pa.int64()),
        })

    def pairs_bucket(g: pd.DataFrame) -> pa.Table:
        out_a, out_b = [], []
        g = g.drop_duplicates(["zone", "hour", "user_id"])
        for (_, _), cell in g.groupby(["zone", "hour"], sort=False):
            u = np.sort(cell["user_id"].to_numpy())
            if u.size < 2:
                continue
            ia, ib = np.triu_indices(u.size, k=1)
            out_a.append(u[ia])
            out_b.append(u[ib])
        if not out_a:
            return pa.table({
                "user_a": pa.array([], pa.int64()),
                "user_b": pa.array([], pa.int64()),
            })
        return pa.table({
            "user_a": pa.array(np.concatenate(out_a)),
            "user_b": pa.array(np.concatenate(out_b)),
        })

    cells = ds.map_batches(assign, batch_format="pyarrow")
    pairs = bucketed_group_apply(
        cells, ["zone", "hour"], pairs_bucket, num_buckets=32
    )
    return (
        pairs.groupby(["user_a", "user_b"])
        .aggregate(Count(alias_name="n_shared_cells"))
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["n_shared_cells"], 2)
            ).select(["user_a", "user_b", "n_shared_cells"]),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda b: pa.table({
                "user_a": b["user_a"].cast(pa.int64()),
                "user_b": b["user_b"].cast(pa.int64()),
                "n_shared_cells": b["n_shared_cells"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


ORACLE_SQL["colocation_pairs"] = f"""
WITH coords AS (
  SELECT user_id, ts,
         -77.05 + (event_id % 1000) * 1e-4 AS lon,
         38.85 + ((event_id // 1000) % 1000) * 1e-4 AS lat
  FROM events),
pts AS (
  SELECT DISTINCT {_zone_case_sql()} AS zone,
         epoch_us(ts) // 900000000 AS hour,
         user_id
  FROM coords),
zoned AS (SELECT * FROM pts WHERE zone IS NOT NULL)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(count(*) AS BIGINT) AS n_shared_cells
FROM zoned a JOIN zoned b
  ON a.zone = b.zone AND a.hour = b.hour AND a.user_id < b.user_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""

# ---------------------------------------------------------------------------
# chunk_documents — RAG-style sliding token windows
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


def q_chunk_documents(sf_dir: str):
    """Sliding-window document chunking (size 64 tokens, stride 48 — the
    fixed-overlap windows a RAG / retrieval index build emits). Tokens are
    single-space splits (``text.split(' ')`` == DuckDB
    ``string_split(text, ' ')``, empty strings preserved) so the oracle
    mirrors byte-exactly. Pure per-document map — streams, no shuffle; the
    per-doc Python split is the same per-blob cost model as the rest of
    the text family (work is per doc, never per corpus)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    S, T = _CHUNK_SIZE, _CHUNK_STRIDE

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id: list[int] = []
        out_idx: list[int] = []
        out_text: list[str] = []
        out_n: list[int] = []
        for did, tx in zip(ids, texts):
            if tx is None:
                continue  # SQL semantics: string_split(NULL) unnests to 0 rows
            toks = tx.split(" ")
            n = len(toks)
            start = 0
            while start < n:
                w = toks[start:start + S]
                out_id.append(did)
                out_idx.append(start // T)
                out_text.append(" ".join(w))
                out_n.append(len(w))
                start += T
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


ORACLE_SQL["chunk_documents"] = f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, len(toks), {_CHUNK_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST(start / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       array_to_string(
         toks[start + 1 : start + {_CHUNK_SIZE}], ' '
       ) AS chunk_text,
       CAST(least({_CHUNK_SIZE}, len(toks) - start) AS BIGINT) AS n_tokens
FROM s
"""


def q_ppjoin_neardup_pairs(sf_dir: str):
    """Prefix-filtered EXACT set-similarity join (AllPairs/PPJoin bound —
    stages.dedup.prefix_jaccard_pairs) over the same derived corpus as
    ngram_neardup_pairs. Shares that query's oracle verbatim: the hash
    check pins that prefix filtering loses no pair."""
    from ..stages.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(
        _derived_corpus(sf_dir), threshold=_NEARDUP_THRESHOLD, k=3
    )


ORACLE_SQL["ppjoin_neardup_pairs"] = ORACLE_SQL["ngram_neardup_pairs"]


def q_join_sample(sf_dir: str):
    """Weighted sampling over a JOIN's output WITHOUT materializing the
    join (the "Streaming Weighted Sampling over Join Queries" family —
    PAPERS.md, EDBT 2023): 100 rows sampled from the events-by-user
    SELF-join, key inclusion ∝ its join multiplicity n_k² (A-ES top-k
    over the count table), then ONE deterministic (i, j) grid position
    per sampled key via md5 — so the engine touches the per-key count
    table and the 100 sampled keys' rows, never the |join| = Σ n_k²
    pairs. Everything md5-keyed and integer-valued: the oracle mirrors
    the expressions literally and the output carries no floats.

    Plan: bucketed count per user (corpus-scale keys) → A-ES top-100
    (per-block exact combiner, no corpus sort) → broadcast the 100
    (user, i, j) picks → filter + one bucketed group apply fetches the
    i-th / j-th event per sampled user (deterministic (ts, event_id)
    order). Driver state: exactly 100 sampled keys — bounded by k."""
    import hashlib as _hl

    import ray as _ray

    from ..stages.groupops import bucketed_aggregate, bucketed_group_apply
    from ..stages.splits import weighted_sample_topk

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    counts = bucketed_aggregate(
        ds.select_columns(["user_id"]), ["user_id"],
        {"n": ("user_id", "size")},
    )

    def wcol(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("w", pa.array(n * n))

    top = weighted_sample_topk(
        counts.map_batches(wcol, batch_format="pyarrow"),
        "user_id", "w", k=100, salt="js:",
    ).take_all()  # bounded: exactly k sampled keys

    picks = {}
    for r in top:
        # weighted_sample_topk preserves the exact n column — never invert
        # w = n² through float sqrt (exact only while n² ≤ 2^53; ADVICE r4)
        uid, n = int(r["user_id"]), int(r["n"])
        i = int(_hl.md5(f"ji:{uid}".encode()).hexdigest()[:8], 16) % n
        j = int(_hl.md5(f"jj:{uid}".encode()).hexdigest()[:8], 16) % n
        picks[uid] = (i, j)
    pref = _ray.put(picks)

    def only_sampled(batch: pa.Table) -> pa.Table:
        p = _ray.get(pref)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.filter(
            pa.array(np.isin(u, np.fromiter(p.keys(), np.int64)))
        )

    def fetch(g: pd.DataFrame) -> pd.DataFrame:
        p = _ray.get(pref)
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        e = g["event_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, u.size])
        out = {"user_id": [], "event_a": [], "event_b": []}
        for s, ln_ in zip(starts, lens):
            i, j = p[int(u[s])]
            out["user_id"].append(int(u[s]))
            out["event_a"].append(int(e[s + i]))
            out["event_b"].append(int(e[s + j]))
        return pd.DataFrame(out).astype(np.int64)

    sampled = bucketed_group_apply(
        ds.map_batches(only_sampled, batch_format="pyarrow"),
        ["user_id"], fetch, num_buckets=8,
    )
    return sampled.sort("user_id")


ORACLE_SQL["join_sample"] = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
keyed AS (
  SELECT user_id, n,
         ln((CAST(('0x' || substr(md5('js:' || CAST(user_id AS VARCHAR)), 1, 8))
             AS BIGINT) + 1) / 4294967296.0) / (n * n) AS pri
  FROM c WHERE n > 0),
top AS (SELECT user_id, n FROM keyed ORDER BY pri DESC, user_id LIMIT 100),
pos AS (
  SELECT user_id, n,
         CAST(('0x' || substr(md5('ji:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % n AS i,
         CAST(('0x' || substr(md5('jj:' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % n AS j
  FROM top),
o AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
             AS rn
  FROM events)
SELECT p.user_id, a.event_id AS event_a, b.event_id AS event_b
FROM pos p
JOIN o a ON a.user_id = p.user_id AND a.rn = p.i
JOIN o b ON b.user_id = p.user_id AND b.rn = p.j
ORDER BY p.user_id
"""


_FOOTRULE_MAX = 2  # similarity threshold θ (max footrule distance)


def q_ranking_simjoin(sf_dir: str):
    """Similarity join over TOP-K RANKINGS (the "Distributed Similarity
    Joins over Top-K Rankings" family — PAPERS.md, EDBT 2020): pairs of
    users whose event-type preference rankings are within Spearman
    footrule distance θ=2. Rankings order the FULL type domain by
    (count DESC, type ASC) — a total order, zero-count types included,
    so every user ranks the same item set and the oracle mirrors it with
    one window function.

    Prefix blocking (the paper's filter, footrule analog of the PPJoin
    prefix): if F(A,B) ≤ θ then A's top item x satisfies rank_B(x) ≤ θ,
    so x is inside BOTH users' top-(θ+1) prefixes — indexing each user
    under its top-(θ+1) types finds every qualifying pair. Each posting
    carries the user's whole ranking PACKED into one int64 (4 bits per
    type, domain ≤ 12 guarded), so candidate verification needs no
    further join: pairs are footrule-checked vectorized inside the
    blocking bucket. Driver state: the type DOMAIN only (bounded)."""
    from ..stages.groupops import (
        bucketed_aggregate,
        bucketed_group_apply,
        dedup_pairs,
        group_pair_indices,
    )

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = bucketed_aggregate(
        ds, ["user_id", "event_type"], {"n": ("user_id", "size")},
    )

    types = sorted(
        r["event_type"]
        for r in counts.groupby("event_type").count().take_all()
    )  # driver-bounded: the event-type DOMAIN
    if len(types) > 12:
        raise ValueError("rank packing supports <= 12 items (4-bit ranks)")
    D = len(types)
    t_idx = {t: i for i, t in enumerate(types)}
    P = _FOOTRULE_MAX + 1  # blocking prefix length

    def rank_pack(g: pd.DataFrame) -> pd.DataFrame:
        out_user: list = []
        out_type: list = []
        out_pack: list = []
        g = g.sort_values(["user_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, u.size])
        et = g["event_type"].to_numpy()
        nn = g["n"].to_numpy()
        for s, ln_ in zip(starts, lens):
            n_full = np.zeros(D, np.int64)
            for j in range(s, s + ln_):
                n_full[t_idx[et[j]]] = nn[j]
            # total order (count DESC, type ASC); types[] is ASC already
            order = np.lexsort((np.arange(D), -n_full))
            rank = np.empty(D, np.int64)
            rank[order] = np.arange(D)
            pack = int(np.sum(rank << (4 * np.arange(D))))
            for b in order[:P]:  # top-(θ+1) blocking postings
                out_user.append(int(u[s]))
                out_type.append(types[b])
                out_pack.append(pack)
        return pd.DataFrame(
            {"user_id": out_user, "btype": out_type, "pack": out_pack}
        )

    postings = bucketed_group_apply(
        counts, ["user_id"], rank_pack, num_buckets=16
    )

    def cand_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["btype", "user_id"], kind="mergesort")
        run = (g["btype"] != g["btype"].shift()).cumsum().to_numpy()
        ia, ib = group_pair_indices(run, max_group=np.iinfo(np.int64).max)
        if ia.size == 0:
            return pd.DataFrame({"user_a": pd.Series(dtype=np.int64),
                                 "user_b": pd.Series(dtype=np.int64),
                                 "footrule": pd.Series(dtype=np.int64)})
        uu = g["user_id"].to_numpy()
        pk = g["pack"].to_numpy()
        a, b = uu[ia], uu[ib]
        pa_, pb_ = pk[ia], pk[ib]
        fr = np.zeros(a.size, np.int64)
        for ti in range(D):
            fr += np.abs(((pa_ >> (4 * ti)) & 15) - ((pb_ >> (4 * ti)) & 15))
        keep = (fr <= _FOOTRULE_MAX) & (a != b)
        swap = a > b
        return pd.DataFrame(
            {
                "user_a": np.where(swap, b, a)[keep],
                "user_b": np.where(swap, a, b)[keep],
                "footrule": fr[keep],
            }
        ).drop_duplicates(["user_a", "user_b"])

    pairs = dedup_pairs(
        bucketed_group_apply(postings, ["btype"], cand_kernel,
                             num_buckets=8),
        "user_a", "user_b", num_buckets=8,
    )
    return pairs.sort(["user_a", "user_b"]).map_batches(
        lambda b: pa.table(
            {
                "user_a": b["user_a"].cast(pa.int64()),
                "user_b": b["user_b"].cast(pa.int64()),
                "footrule": b["footrule"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


ORACLE_SQL["ranking_simjoin"] = f"""
WITH ut AS (
  SELECT u.user_id, t.event_type, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
  LEFT JOIN (
    SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
  ) c ON c.user_id = u.user_id AND c.event_type = t.event_type),
r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) - 1 AS rnk
  FROM ut),
d AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         sum(abs(a.rnk - b.rnk)) AS footrule
  FROM r a JOIN r b
    ON a.event_type = b.event_type AND a.user_id < b.user_id
  GROUP BY 1, 2)
SELECT user_a, user_b, CAST(footrule AS BIGINT) AS footrule
FROM d WHERE footrule <= {_FOOTRULE_MAX}
"""


# ---------------------------------------------------------------------------
# trajectory interaction: segment-crossing join
# ---------------------------------------------------------------------------

_SEG_CAP = 100  # max |dx|,|dy| in grid units — "local move" segments only


def _md5_grid_coords(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Scrambled 1000×1000 grid coordinates from an integer key via md5 —
    chosen over the module's linear `_formula_coords` because sequential
    event_ids make those segments near-collinear (crossings degenerate),
    and over a fast integer mixer because DuckDB's md5() mirrors this
    bit-exactly (`'0x' || substr(md5(CAST(k AS VARCHAR)),1,12)`). One
    md5 per row is oracle-parity glue, not the scale path — a production
    corpus carries real coordinates."""
    import hashlib

    h = np.fromiter(
        (int(hashlib.md5(str(int(k)).encode()).hexdigest()[:12], 16)
         for k in key),
        np.int64, len(key),
    )
    return h % 1000, (h // 1000) % 1000


def q_segment_crossings(sf_dir: str):
    """Which users' movement paths properly CROSS? Consecutive-ping
    segments per user (ordered by ts, event_id; long teleport segments
    > _SEG_CAP grid units dropped), then the PBSM segment-intersection
    join (`stages.spatial.segment_crossing_join`): one bucketed cell
    co-shuffle, exact int64 orientation determinants, canonical-cell
    dedup — no all-pairs anywhere, so the plan survives a 10^9-segment
    fleet corpus (cells bound the quadratic term; the loud
    max_cell_segments guard documents the skew failure mode)."""
    from ..stages.groupops import bucketed_group_apply
    from ..stages.spatial import segment_crossing_join

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_gxy(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx, gy = _md5_grid_coords(eid)
        return pa.table({
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "event_id": batch["event_id"],
            "gx": pa.array(gx),
            "gy": pa.array(gy),
        })

    def seg_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        e = g["event_id"].to_numpy()
        gx = g["gx"].to_numpy()
        gy = g["gy"].to_numpy()
        empty = pd.DataFrame({
            "seg_id": pd.Series(dtype=np.int64),
            "key": pd.Series(dtype=np.int64),
            "x1": pd.Series(dtype=np.int64),
            "y1": pd.Series(dtype=np.int64),
            "x2": pd.Series(dtype=np.int64),
            "y2": pd.Series(dtype=np.int64),
        })
        if len(g) < 2:
            return empty
        same = u[1:] == u[:-1]
        x1, y1, x2, y2 = gx[:-1], gy[:-1], gx[1:], gy[1:]
        m = (same & (np.abs(x2 - x1) <= _SEG_CAP)
             & (np.abs(y2 - y1) <= _SEG_CAP) & ((x1 != x2) | (y1 != y2)))
        if not m.any():
            return empty
        return pd.DataFrame({
            "seg_id": e[:-1][m].astype(np.int64),
            "key": u[:-1][m].astype(np.int64),
            "x1": x1[m].astype(np.int64), "y1": y1[m].astype(np.int64),
            "x2": x2[m].astype(np.int64), "y2": y2[m].astype(np.int64),
        })

    segs = bucketed_group_apply(
        ds.map_batches(add_gxy, batch_format="pyarrow"),
        ["user_id"], seg_kernel,
    ).materialize()
    if segs.count() == 0:  # schemaless-empty guard (CLAUDE.md rule)
        return pa.table({
            "seg_a": pa.array([], pa.int64()),
            "seg_b": pa.array([], pa.int64()),
            "key_a": pa.array([], pa.int64()),
            "key_b": pa.array([], pa.int64()),
        })
    return segment_crossing_join(segs, cell_units=100)


ORACLE_SQL["segment_crossings"] = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
              AS BIGINT) % 1000 AS gx,
         (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
               AS BIGINT) // 1000) % 1000 AS gy
  FROM events
), seg AS (
  SELECT user_id, event_id AS seg_id, gx AS x1, gy AS y1,
         lead(gx) OVER w AS x2, lead(gy) OVER w AS y2
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), segs AS (
  SELECT user_id, seg_id, x1, y1, x2, y2,
         least(x1, x2) AS xlo, greatest(x1, x2) AS xhi,
         least(y1, y2) AS ylo, greatest(y1, y2) AS yhi
  FROM seg
  WHERE x2 IS NOT NULL AND abs(x2 - x1) <= {_SEG_CAP}
    AND abs(y2 - y1) <= {_SEG_CAP} AND (x2 <> x1 OR y2 <> y1)
), cand AS (
  SELECT a.seg_id AS seg_a, b.seg_id AS seg_b,
         a.user_id AS key_a, b.user_id AS key_b,
         (a.x2-a.x1)*(b.y1-a.y1) - (a.y2-a.y1)*(b.x1-a.x1) AS d1,
         (a.x2-a.x1)*(b.y2-a.y1) - (a.y2-a.y1)*(b.x2-a.x1) AS d2,
         (b.x2-b.x1)*(a.y1-b.y1) - (b.y2-b.y1)*(a.x1-b.x1) AS d3,
         (b.x2-b.x1)*(a.y2-b.y1) - (b.y2-b.y1)*(a.x2-b.x1) AS d4
  FROM segs a JOIN segs b
    ON a.user_id < b.user_id
   AND a.xlo <= b.xhi AND b.xlo <= a.xhi
   AND a.ylo <= b.yhi AND b.ylo <= a.yhi
)
SELECT seg_a, seg_b, key_a, key_b FROM cand
WHERE (d1 > 0) <> (d2 > 0) AND d1 <> 0 AND d2 <> 0
  AND (d3 > 0) <> (d4 > 0) AND d3 <> 0 AND d4 <> 0
"""


# ---------------------------------------------------------------------------
# streaming watermark: allowed-lateness drop accounting
# ---------------------------------------------------------------------------

_LATE_ALLOWED_S = 1800   # allowed lateness (Flink watermark semantics)
_LATE_DELAY_MOD = 3600   # synthetic network delay: md5(event_id) % 1h


def q_late_events(sf_dir: str):
    """Streaming watermark semantics over a batch log: events ARRIVE at
    ``ats = ts + md5(event_id) % 1h`` (deterministic network delay —
    md5 so DuckDB mirrors it); the watermark is the running max event-time
    over arrival order; an event is DROPPED-late when its event time is
    more than ``_LATE_ALLOWED_S`` behind the watermark at its arrival.
    Output: per tumbling event-time hour, on-time vs late-dropped counts.

    Scale shape: the global prefix-max over arrival order is the
    incremental-sessions state-handoff plan — (1) per-arrival-hour max
    event time via a native bounded-domain aggregate (group count =
    CALENDAR HOURS, grows with time span, never with rows), (2) the
    hour-level prefix max (≤ thousands of entries for years of log) is
    the ONLY thing the driver touches and is broadcast sorted, (3) one
    bucketed shuffle on arrival hour finishes the scan in-kernel. µs
    integer arithmetic end-to-end — bit-exact vs the SQL window."""
    import hashlib

    import ray as _ray
    from ray.data.aggregate import Count, Max, Sum

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "ts"])
    hour_us = np.int64(3_600_000_000)

    def arrival(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        delay = np.fromiter(
            (int(hashlib.md5(str(int(k)).encode()).hexdigest()[:8], 16)
             % _LATE_DELAY_MOD for k in eid),
            np.int64, len(eid),
        ) * np.int64(1_000_000)
        ats = ts_us + delay
        return pa.table({
            "event_id": pa.array(eid),
            "ts_us": pa.array(ts_us),
            "ats": pa.array(ats),
            "ahour": pa.array(ats // hour_us),
        })

    arr = ds.map_batches(arrival, batch_format="pyarrow").materialize()

    # (1) per-arrival-hour event-time max — bounded key domain → native
    hour_max = arr.groupby("ahour").aggregate(Max("ts_us")).take_all()
    hours = np.array(sorted(r["ahour"] for r in hour_max), np.int64)
    hmax = np.array([r["max(ts_us)"] for r in
                     sorted(hour_max, key=lambda r: r["ahour"])], np.int64)
    # prefix max of STRICTLY EARLIER hours (sentinel: min int64 = "none")
    carry = np.concatenate([[np.iinfo(np.int64).min],
                            np.maximum.accumulate(hmax)[:-1]])
    hours_ref = _ray.put(hours)
    carry_ref = _ray.put(carry)
    allowed_us = np.int64(_LATE_ALLOWED_S) * np.int64(1_000_000)

    def flag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ahour", "ats", "event_id"], kind="mergesort")
        ah = g["ahour"].to_numpy()
        ts_us = g["ts_us"].to_numpy()
        hrs = _ray.get(hours_ref)
        car = _ray.get(carry_ref)
        starts = np.flatnonzero(np.concatenate([[True], ah[1:] != ah[:-1]]))
        ends = np.concatenate([starts[1:], [len(g)]])
        prev = np.empty(len(g), np.int64)
        for s, e in zip(starts, ends):
            c = car[np.searchsorted(hrs, ah[s])]
            run = np.maximum.accumulate(ts_us[s:e])
            prev[s] = c
            prev[s + 1:e] = np.maximum(c, run[:-1])
        late = (prev != np.iinfo(np.int64).min) & (ts_us < prev - allowed_us)
        return pd.DataFrame({
            "win_us": (ts_us // hour_us) * hour_us,
            "late": late.astype(np.int64),
        })

    flagged = bucketed_group_apply(arr, ["ahour"], flag_bucket)

    # (2) tumbling event-time hour readout — bounded domain → native
    out = flagged.groupby("win_us").aggregate(Count(), Sum("late"))

    def shape(batch: pa.Table) -> pa.Table:
        n = batch["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        nl = batch["sum(late)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "win": batch["win_us"].cast(pa.timestamp("us")),
            "n_ontime": pa.array(n - nl),
            "n_late": pa.array(nl),
        })

    return out.map_batches(shape, batch_format="pyarrow")


ORACLE_SQL["late_events"] = f"""
WITH arr AS (
  SELECT ts, event_id,
         ts + INTERVAL 1 SECOND *
              (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_LATE_DELAY_MOD}) AS ats
  FROM events
), w AS (
  SELECT ts, max(ts) OVER (ORDER BY ats, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_src
  FROM arr
)
SELECT date_trunc('hour', ts) AS win,
  CAST(count(*) FILTER (WHERE wm_src IS NULL
       OR ts >= wm_src - INTERVAL {_LATE_ALLOWED_S} SECOND) AS BIGINT)
    AS n_ontime,
  CAST(count(*) FILTER (WHERE wm_src IS NOT NULL
       AND ts < wm_src - INTERVAL {_LATE_ALLOWED_S} SECOND) AS BIGINT)
    AS n_late
FROM w GROUP BY win
"""


# ---------------------------------------------------------------------------
# ML feature prep: K-fold out-of-fold target encoding
# ---------------------------------------------------------------------------

_TE_FOLDS = 5


def q_target_encoding(sf_dir: str):
    """Leakage-free target encoding of the order-priority categorical:
    each order's feature is the mean order value of its category computed
    WITHOUT its own fold (fold = o_orderkey % K), the standard K-fold
    out-of-fold scheme that keeps a row's own target out of its feature.
    Exact integer cents: the encoding ships as (numerator, denominator)
    plus the floor-divided cents so float never enters the compare.

    Scale shape: the (category × fold) table is a BOUNDED domain
    (|categories|·K — 25 cells here), so the native per-block partial
    aggregate is the right tool (CLAUDE.md rule), the complement table is
    computed once from those ≤25 rows, and the attach is a per-batch
    vectorized pandas merge against the tiny broadcast frame — rows never
    shuffle at all."""
    import ray as _ray
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": pa.array(key),
            "cat": batch["o_orderpriority"],
            "fold": pa.array(key % _TE_FOLDS),
            "cents": pa.array(cents),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    agg = prepped.groupby(["cat", "fold"]).aggregate(
        Sum("cents"), Count()
    ).take_all()  # ≤ |categories|·K rows — bounded domain, not data-scale
    per = pd.DataFrame(agg).rename(
        columns={"sum(cents)": "s", "count()": "n"})
    tot = per.groupby("cat", as_index=False).agg(S=("s", "sum"),
                                                 N=("n", "sum"))
    enc = per.merge(tot, on="cat")
    enc["enc_num_cents"] = (enc["S"] - enc["s"]).astype(np.int64)
    enc["enc_den"] = (enc["N"] - enc["n"]).astype(np.int64)
    enc = enc[["cat", "fold", "enc_num_cents", "enc_den"]]
    enc_ref = _ray.put(enc)

    def attach(batch: pa.Table) -> pa.Table:
        df = batch.select(["o_orderkey", "cat", "fold"]).to_pandas()
        j = df.merge(_ray.get(enc_ref), on=["cat", "fold"], how="left")
        num = j["enc_num_cents"].to_numpy(dtype=np.int64)
        den = j["enc_den"].to_numpy(dtype=np.int64)
        return pa.table({
            "o_orderkey": pa.array(j["o_orderkey"].to_numpy(np.int64)),
            "fold": pa.array(j["fold"].to_numpy(np.int64)),
            "enc_num_cents": pa.array(num),
            "enc_den": pa.array(den),
            "enc_cents": pa.array(num // den),
        })

    return prepped.map_batches(attach, batch_format="pyarrow")


ORACLE_SQL["target_encoding"] = f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority AS cat,
         o_orderkey % {_TE_FOLDS} AS fold,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), agg AS (
  SELECT cat, fold, sum(cents) AS s, count(*) AS n FROM o GROUP BY 1, 2
), tot AS (
  SELECT cat, sum(s) AS st, sum(n) AS nt FROM agg GROUP BY 1
), enc AS (
  SELECT a.cat, a.fold,
         CAST(t.st - a.s AS BIGINT) AS enc_num_cents,
         CAST(t.nt - a.n AS BIGINT) AS enc_den
  FROM agg a JOIN tot t ON t.cat = a.cat
)
SELECT o.o_orderkey, o.fold, e.enc_num_cents, e.enc_den,
       e.enc_num_cents // e.enc_den AS enc_cents
FROM o JOIN enc e ON e.cat = o.cat AND e.fold = o.fold
"""


# ---------------------------------------------------------------------------
# ML feature prep: the hashing trick (signed feature hashing)
# ---------------------------------------------------------------------------

_FH_DIM = 64  # hashed vector dimensionality


def q_feature_hashing(sf_dir: str):
    """Signed feature hashing (Weinberger et al.'s hashing trick) over
    the documents table — see `stages.textstats.feature_hash_vectors`
    (the stage form the GRAFT_DOC_SCALE probe drives): fixed-D sparse
    vectors with NO vocabulary table anywhere, md5-mirrored dims/signs,
    in-batch partial combine, one bucketed integer-sum aggregate."""
    from ..stages.textstats import feature_hash_vectors

    return feature_hash_vectors(
        _read(sf_dir, "documents", ["doc_id", "text"]), dim=_FH_DIM)


ORACLE_SQL["feature_hashing"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hv
  FROM toks
)
SELECT doc_id, hv % {_FH_DIM} AS dim,
       CAST(sum(CASE WHEN (hv // {_FH_DIM}) % 2 = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS val
FROM h GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# drift monitoring: exact two-sample Kolmogorov–Smirnov (all type pairs)
# ---------------------------------------------------------------------------

_KS_RANGE_W = 8.0  # value-range bucket width for the two-phase CDF scan


def q_ks_drift(sf_dir: str):
    """EXACT two-sample Kolmogorov–Smirnov distance between every pair of
    event-type value distributions — the drift monitor PSI can't give you
    (PSI needs binning; KS is the sup over ALL thresholds). Entirely in
    integers: D = ks_num / (n_a·n_b) with
    ks_num = max_v |cum_a(v)·n_b − cum_b(v)·n_a| — products of counts, so
    the max is order-free and bit-exact vs the SQL RANGE-frame window.

    Scale shape (the zipf_fit two-phase scan, not a global sort): values
    range-partition by a monotone quantizer; per-(range, type) counts are
    a BOUNDED native aggregate; the driver sees only that bounded table
    and broadcasts per-type prefix counts; one bucketed shuffle on the
    range key finishes every type's CDF in-kernel and emits per-pair
    PARTIAL maxima (|pairs| rows per range bucket); a bounded native max
    folds them. Nothing row-scale ever sorts globally or lands on the
    driver."""
    import ray as _ray
    from ray.data.aggregate import Count, Max

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def vbucket(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "value": batch["value"],
            "vb": pa.array(np.floor(v / _KS_RANGE_W).astype(np.int64)),
        })

    vb = ds.map_batches(vbucket, batch_format="pyarrow").materialize()

    # bounded domain: (range buckets × types)
    marg = vb.groupby(["vb", "event_type"]).aggregate(Count()).take_all()
    mt = pd.DataFrame(marg).rename(columns={"count()": "n"})
    types = sorted(mt["event_type"].unique().tolist())
    k = len(types)
    tidx = {t: i for i, t in enumerate(types)}
    vbs = np.array(sorted(mt["vb"].unique()), np.int64)
    grid = np.zeros((len(vbs), k), np.int64)
    vb_pos = {int(b): i for i, b in enumerate(vbs)}
    for r in mt.itertuples():
        grid[vb_pos[int(r.vb)], tidx[r.event_type]] = r.n
    totals = grid.sum(axis=0)                       # n per type
    carry = np.vstack([np.zeros(k, np.int64),
                       np.cumsum(grid, axis=0)[:-1]])  # counts in earlier vbs
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    types_ref = _ray.put(types)
    vbs_ref = _ray.put(vbs)
    carry_ref = _ray.put(carry)
    totals_ref = _ray.put(totals)

    def ks_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ty = _ray.get(types_ref)
        car = _ray.get(carry_ref)
        tot = _ray.get(totals_ref)
        vbs_all = _ray.get(vbs_ref)
        out = {"type_a": [], "type_b": [], "part_num": []}
        ti = {t: i for i, t in enumerate(ty)}
        for b, sub in g.groupby("vb", sort=True):
            v = sub["value"].to_numpy()
            order = np.argsort(v, kind="mergesort")
            v = v[order]
            tcol = sub["event_type"].to_numpy()[order]
            last = np.concatenate([v[1:] != v[:-1], [True]])
            base = car[np.searchsorted(vbs_all, b)]
            cums = np.empty((last.sum(), len(ty)), np.int64)
            for t, i in ti.items():
                cums[:, i] = base[i] + np.cumsum(tcol == t)[last]
            for i, j in [(a_, b_) for a_ in range(len(ty))
                         for b_ in range(a_ + 1, len(ty))]:
                num = np.abs(cums[:, i] * tot[j] - cums[:, j] * tot[i]).max()
                out["type_a"].append(ty[i])
                out["type_b"].append(ty[j])
                out["part_num"].append(int(num))
        return pd.DataFrame({
            "type_a": pd.Series(out["type_a"], dtype=object),
            "type_b": pd.Series(out["type_b"], dtype=object),
            "part_num": pd.Series(out["part_num"], dtype=np.int64),
        })

    partials = bucketed_group_apply(vb, ["vb"], ks_bucket, num_buckets=16)
    agg = partials.groupby(["type_a", "type_b"]).aggregate(Max("part_num"))
    na = {t: int(n) for t, n in zip(types, totals)}

    def shape(batch: pa.Table) -> pa.Table:
        ta = batch["type_a"].to_pylist()
        tb = batch["type_b"].to_pylist()
        return pa.table({
            "type_a": batch["type_a"],
            "type_b": batch["type_b"],
            "n_a": pa.array([na[t] for t in ta], pa.int64()),
            "n_b": pa.array([na[t] for t in tb], pa.int64()),
            "ks_num": batch["max(part_num)"].cast(pa.int64()),
        })

    return agg.map_batches(shape, batch_format="pyarrow")


ORACLE_SQL["ks_drift"] = """
WITH t AS (SELECT DISTINCT event_type FROM events),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM t a JOIN t b ON a.event_type < b.event_type),
u AS (SELECT p.type_a, p.type_b, e.value, e.event_type
      FROM p JOIN events e ON e.event_type IN (p.type_a, p.type_b)),
c AS (SELECT type_a, type_b, value,
        sum(CASE WHEN event_type = type_a THEN 1 ELSE 0 END)
          OVER (PARTITION BY type_a, type_b ORDER BY value
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        sum(CASE WHEN event_type = type_b THEN 1 ELSE 0 END)
          OVER (PARTITION BY type_a, type_b ORDER BY value
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM u),
n AS (SELECT type_a, type_b, max(ca) AS na, max(cb) AS nb FROM c GROUP BY 1, 2)
SELECT c.type_a, c.type_b,
       CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
       CAST(max(abs(c.ca * n.nb - c.cb * n.na)) AS BIGINT) AS ks_num
FROM c JOIN n ON n.type_a = c.type_a AND n.type_b = c.type_b
GROUP BY c.type_a, c.type_b, n.na, n.nb
"""


# ---------------------------------------------------------------------------
# sketches: Count-Min point-frequency estimates (fully SQL-mirrored)
# ---------------------------------------------------------------------------

_CMS_D = 4     # hash rows
_CMS_W = 256   # counters per row


def q_cms_counts(sf_dir: str):
    """Count-Min sketch (Cormode–Muthukrishnan) over the corpus token
    stream, probed at the tokens of the smallest-doc_id document:
    output (token, exact_n, cms_est) with est = min_i sketch[i][h_i(tok)]
    — always ≥ exact (one-sided error), equality when no collision. The
    whole sketch — hashes included — is mirrored in SQL (md5-row-salted
    column hashes, dense 4×256 register grid with zero registers kept),
    so the driver hash-checks the SKETCH ITSELF, not a pinned constant
    (contrast `approx_distinct`, where HLL's float path forces a pin).

    Scale shape: per-batch token counts collapse into (row, col) partials
    — the shuffle moves ≤ d·w counters per block, NEVER tokens (same
    fixed-size-partial argument as HLL); the register merge is a bounded
    native aggregate; only the 4×256 grid and the probe token list ever
    land on the driver. Probe exact counts ride one bounded aggregate
    over a broadcast-filtered explode."""
    import hashlib

    import ray as _ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    # probe set: tokens of the min-doc_id document (deterministic, tiny)
    min_doc = ds.groupby(None).min("doc_id").to_pandas()["min(doc_id)"][0]
    probe_rows = ds.filter(
        expr=f"doc_id == {int(min_doc)}").take_all()
    probe_tokens = sorted({w for r in probe_rows
                           for w in (r["text"] or "").split(" ")})
    probes = np.array(probe_tokens, dtype=object)
    probes_ref = _ray.put(probes)

    def _col_hash(i: int, toks: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (int(hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:8], 16)
             % _CMS_W for t in toks),
            np.int64, len(toks),
        )

    def sketch_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks = np.array([w for t in texts for w in (t or "").split(" ")],
                        dtype=object)
        if toks.size == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "cnt_partial": pa.array([], pa.int64())})
        uniq, cnt = np.unique(toks, return_counts=True)
        ii, cc, vv = [], [], []
        for i in range(_CMS_D):
            cols = _col_hash(i, uniq)
            order = np.argsort(cols, kind="mergesort")
            cs, ws = cols[order], cnt[order]
            starts = np.flatnonzero(
                np.concatenate([[True], cs[1:] != cs[:-1]]))
            ii.append(np.full(starts.size, i, np.int64))
            cc.append(cs[starts])
            vv.append(np.add.reduceat(ws, starts).astype(np.int64))
        return pa.table({"i": pa.array(np.concatenate(ii)),
                         "col": pa.array(np.concatenate(cc)),
                         "cnt_partial": pa.array(np.concatenate(vv))})

    reg_rows = ds.map_batches(
        sketch_partial, batch_format="pyarrow"
    ).groupby(["i", "col"]).aggregate(Sum("cnt_partial")).take_all()
    sketch = np.zeros((_CMS_D, _CMS_W), np.int64)  # dense: zeros KEPT
    for r in reg_rows:
        sketch[int(r["i"]), int(r["col"])] = int(r["sum(cnt_partial)"])
    est = np.full(len(probes), np.iinfo(np.int64).max, np.int64)
    for i in range(_CMS_D):
        est = np.minimum(est, sketch[i, _col_hash(i, probes)])

    # exact counts for the probe tokens: broadcast-filtered explode
    def probe_counts(batch: pa.Table) -> pa.Table:
        p = _ray.get(probes_ref)
        texts = batch["text"].to_pylist()
        toks = np.array([w for t in texts for w in (t or "").split(" ")],
                        dtype=object)
        if toks.size == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n_partial": pa.array([], pa.int64())})
        pos = np.searchsorted(p, toks)
        pos = np.clip(pos, 0, len(p) - 1)
        m = p[pos] == toks
        if not m.any():
            return pa.table({"token": pa.array([], pa.string()),
                             "n_partial": pa.array([], pa.int64())})
        uniq, cnt = np.unique(toks[m], return_counts=True)
        return pa.table({"token": pa.array(uniq.astype(str)),
                         "n_partial": pa.array(cnt.astype(np.int64))})

    exact = ds.map_batches(probe_counts, batch_format="pyarrow").groupby(
        "token").aggregate(Sum("n_partial")).take_all()
    exact_n = {r["token"]: int(r["sum(n_partial)"]) for r in exact}
    return pa.table({
        "token": pa.array([str(t) for t in probes], pa.string()),
        "exact_n": pa.array([exact_n[t] for t in probes], pa.int64()),
        "cms_est": pa.array(est, pa.int64()),
    })


ORACLE_SQL["cms_counts"] = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), salted AS (
  SELECT tok, i,
         CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 8))
              AS BIGINT) % {_CMS_W} AS col
  FROM toks CROSS JOIN (SELECT unnest(range({_CMS_D})) AS i)
), reg AS (
  SELECT i, col, count(*) AS cnt FROM salted GROUP BY 1, 2
), grid AS (
  SELECT a.i, b.c FROM (SELECT unnest(range({_CMS_D})) AS i) a
  CROSS JOIN (SELECT unnest(range({_CMS_W})) AS c) b
), regd AS (
  SELECT g.i, g.c, COALESCE(r.cnt, 0) AS cnt
  FROM grid g LEFT JOIN reg r ON r.i = g.i AND r.col = g.c
), probes AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id = (SELECT min(doc_id) FROM documents)
), est AS (
  SELECT p.token, min(rd.cnt) AS cms_est
  FROM probes p
  CROSS JOIN (SELECT unnest(range({_CMS_D})) AS i) d
  JOIN regd rd ON rd.i = d.i AND rd.c =
       CAST(('0x' || substr(md5(CAST(d.i AS VARCHAR) || ':' || p.token),
                            1, 8)) AS BIGINT) % {_CMS_W}
  GROUP BY 1
), exact AS (
  SELECT tok AS token, count(*) AS n FROM toks GROUP BY 1
)
SELECT e.token, CAST(x.n AS BIGINT) AS exact_n,
       CAST(e.cms_est AS BIGINT) AS cms_est
FROM est e JOIN exact x ON x.token = e.token
"""


# ---------------------------------------------------------------------------
# text LM: bigram add-one language-model document scoring
# ---------------------------------------------------------------------------

_BG_SEP = "\x1f"  # unit separator — never appears in the token stream


def q_bigram_lm(sf_dir: str):
    """Bigram add-one-smoothed LM document scoring — see
    `stages.textstats.bigram_lm_scores` (the stage form the
    GRAFT_DOC_SCALE probe drives): counts stay Datasets, two bucketed
    string joins (the `bpe_encode` pattern), per-distinct-bigram
    quantized ln terms, exact int64 per-doc folds. The only driver
    scalar is |V|."""
    from ..stages.textstats import bigram_lm_scores

    return bigram_lm_scores(_read(sf_dir, "documents", ["doc_id", "text"]))


ORACLE_SQL["bigram_lm"] = f"""
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), toks AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos FROM s
), big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
), cb AS (
  SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2
), cu AS (
  SELECT w1, count(*) AS c FROM big GROUP BY 1
), v AS (
  SELECT count(DISTINCT w) AS vsz FROM toks
), terms AS (
  SELECT g.doc_id,
         CAST(floor(1e6 * ln((cb.c + 1.0) / (cu.c + v.vsz))) AS BIGINT) AS q
  FROM big g
  JOIN cb ON cb.w1 = g.w1 AND cb.w2 = g.w2
  JOIN cu ON cu.w1 = g.w1
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(q) AS BIGINT) AS score_q
FROM terms GROUP BY 1
"""


# ---------------------------------------------------------------------------
# text quality: per-document token Shannon entropy
# ---------------------------------------------------------------------------


def q_doc_entropy(sf_dir: str):
    """Per-document token Shannon entropy — the repetition/diversity
    quality signal (a doc of one repeated token scores 0; uniform tokens
    score ln n): H = −Σ_w (c_w/n)·ln(c_w/n). Emitted as the exact int64
    ``neg_entropy_q = Σ_w floor(1e6·c_w·ln(c_w/n))`` so the fold is
    order-free; the float work is ONE literal-mirrored expression per
    distinct (doc, word).

    Scale shape: a document is one row, so the whole statistic is a
    ZERO-SHUFFLE map_batches — per-batch tokens explode into a (doc-rank,
    word-rank) integer key array, one lexsort + reduceat recovers every
    doc's word histogram, and the per-doc fold happens in the same
    kernel. Nothing leaves the node but the answer rows."""

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def entropy(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        toks_per = [(t or "").split(" ") for t in texts]
        n_tok = np.array([len(t) for t in toks_per], np.int64)
        flat = np.array([w for ts in toks_per for w in ts], dtype=object)
        if flat.size == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "neg_entropy_q": pa.array([], pa.int64()),
            })
        _, wrank = np.unique(flat, return_inverse=True)
        drank = np.repeat(np.arange(len(ids), dtype=np.int64), n_tok)
        key = drank * np.int64(flat.size + 1) + wrank
        order = np.argsort(key, kind="mergesort")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        c = np.diff(np.concatenate([starts, [ks.size]])).astype(np.int64)
        d_of = ks[starts] // np.int64(flat.size + 1)
        n_of = n_tok[d_of]
        terms = np.floor(
            1e6 * (c * np.log(c * 1.0 / n_of))).astype(np.int64)
        neg_q = np.zeros(len(ids), np.int64)
        np.add.at(neg_q, d_of, terms)
        n_dist = np.zeros(len(ids), np.int64)
        np.add.at(n_dist, d_of, 1)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "n_distinct": pa.array(n_dist),
            "neg_entropy_q": pa.array(neg_q),
        })

    return ds.map_batches(entropy, batch_format="pyarrow")


ORACLE_SQL["doc_entropy"] = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), t AS (
  SELECT doc_id, unnest(ws) AS w, len(ws) AS n FROM s
), c AS (
  SELECT doc_id, w, n, count(*) AS cw FROM t GROUP BY 1, 2, 3
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CAST(floor(1e6 * (cw * ln(cw * 1.0 / n))) AS BIGINT))
            AS BIGINT) AS neg_entropy_q
FROM c GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# retrieval: positional phrase search of the top collocation
# ---------------------------------------------------------------------------


def q_phrase_search(sf_dir: str):
    """Positional phrase search, self-targeted: find the corpus's most
    frequent bigram collocation (ties → lexicographically smallest), then
    emit every positional occurrence (doc_id, pos, w1, w2) — the
    inverted-POSITIONAL-index primitive phrase queries need, composed
    with the `bpe_train`-style distributed argmax.

    Scale shape: bigram counts collapse per batch, one bucketed
    vocabulary-scale aggregate; the global argmax is per-block top-1
    partials (≤ #blocks rows to the driver — the r4 fix pattern, nothing
    vocabulary-scale ever materializes); occurrence listing is a second
    ZERO-SHUFFLE map over the docs with the 2-word phrase broadcast. The
    packed `w1\\x1fw2` key ties EXACTLY like the oracle's (w1, w2) tuple
    because 0x1f sorts below every token character."""
    import ray as _ray

    from ..stages.groupops import bucketed_aggregate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode_bigrams(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        bg = []
        for t in texts:
            ws = (t or "").split(" ")
            bg.extend(ws[i] + _BG_SEP + ws[i + 1] for i in range(len(ws) - 1))
        return pa.table({"bg": pa.array(bg, pa.string())})

    counts = bucketed_aggregate(
        ds.map_batches(explode_bigrams, batch_format="pyarrow"),
        ["bg"], {"n": ("bg", "size")},
    )

    def block_top1(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if n.size == 0:
            return pa.table({"bg": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        bg = np.asarray(batch["bg"].to_pylist(), dtype=object)
        m = n == n.max()
        best = min(bg[m])
        return pa.table({"bg": pa.array([best], pa.string()),
                         "n": pa.array([int(n.max())], pa.int64())})

    partials = counts.map_batches(
        block_top1, batch_format="pyarrow").take_all()
    if not partials:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string())})
    best = min(partials, key=lambda r: (-int(r["n"]), r["bg"]))
    w1, w2 = best["bg"].split(_BG_SEP)
    phrase_ref = _ray.put((w1, w2))

    def occurrences(batch: pa.Table) -> pa.Table:
        p1, p2 = _ray.get(phrase_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        doc, pos = [], []
        for d, t in zip(ids, texts):
            ws = (t or "").split(" ")
            doc.extend(d for i in range(len(ws) - 1)
                       if ws[i] == p1 and ws[i + 1] == p2)
            pos.extend(i + 1 for i in range(len(ws) - 1)
                       if ws[i] == p1 and ws[i + 1] == p2)
        return pa.table({
            "doc_id": pa.array(np.asarray(doc, np.int64)),
            "pos": pa.array(np.asarray(pos, np.int64)),
            "w1": pa.array([p1] * len(doc), pa.string()),
            "w2": pa.array([p2] * len(doc), pa.string()),
        })

    return ds.map_batches(occurrences, batch_format="pyarrow")


ORACLE_SQL["phrase_search"] = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), t AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos FROM s
), big AS (
  SELECT a.doc_id, a.pos, a.w AS w1, b.w AS w2
  FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
), top AS (
  SELECT w1, w2 FROM (
    SELECT w1, w2, count(*) AS n FROM big GROUP BY 1, 2
  ) ORDER BY n DESC, w1, w2 LIMIT 1
)
SELECT g.doc_id, CAST(g.pos AS BIGINT) AS pos, g.w1, g.w2
FROM big g JOIN top ON top.w1 = g.w1 AND top.w2 = g.w2
"""


def q_adamic_adar(sf_dir: str):
    """Adamic–Adar link prediction — `link_prediction`'s common-neighbor
    count upgraded with the classic 1/ln(deg) rarity weighting (a shared
    rare neighbor is stronger evidence than a shared hub). Each wedge
    through hub w contributes floor(1e6/ln(deg(w))) — quantized int64
    BEFORE the per-pair sum, so the fold is order-free; deg(w) is free
    in-kernel (it IS the hub's adjacency run length — no extra join,
    which is the advantage over the oracle's deg CTE). Same wedge →
    bucketed pair sum → ANTI join vs the edge set → bounded top-100
    plan; Σ deg² wedge volume, documented like every wedge plan here."""
    from ..stages.groupops import (
        bucketed_aggregate,
        bucketed_group_apply,
        group_pair_indices,
    )
    from ..stages.joins import semi_join_shuffled

    N = 500
    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def edges(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ((k % 991) * (k % 997)) % N
        v = ((k % 977) * (k % 983)) % N
        keep = u != v
        lo = np.minimum(u[keep], v[keep])
        hi = np.maximum(u[keep], v[keep])
        return pa.table({"u": pa.array(lo), "v": pa.array(hi)})

    e = bucketed_aggregate(
        ds.map_batches(edges, batch_format="pyarrow"),
        ["u", "v"], {"__one": ("u", "size")},
    ).materialize()

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "w": pa.array(np.concatenate([u, v])),
            "x": pa.array(np.concatenate([v, u])),
        })

    adj = e.map_batches(both_dirs, batch_format="pyarrow")

    def wedge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["w", "x"], kind="mergesort")
        run = (g["w"] != g["w"].shift()).cumsum().to_numpy()
        ia, ib = group_pair_indices(run, np.iinfo(np.int64).max)
        if ia.size == 0:
            return pd.DataFrame({"ia": pd.Series(dtype=np.int64),
                                 "ib": pd.Series(dtype=np.int64),
                                 "wq": pd.Series(dtype=np.int64)})
        x = g["x"].to_numpy()
        deg = np.bincount(run)[run]  # hub degree = its run length
        wq = np.floor(1e6 / np.log(deg[ia].astype(np.float64))).astype(
            np.int64)
        return pd.DataFrame({"ia": x[ia], "ib": x[ib], "wq": wq})

    aa = bucketed_aggregate(
        bucketed_group_apply(adj, ["w"], wedge),
        ["ia", "ib"], {"score_q": ("wq", "sum")},
    )

    def pack(ca: str, cb: str):
        def _p(batch: pa.Table) -> pa.Table:
            a = batch[ca].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch[cb].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.append_column("pk", pa.array(a * N + b))
        return _p

    nonedges = semi_join_shuffled(
        aa.map_batches(pack("ia", "ib"), batch_format="pyarrow").materialize(),
        e.map_batches(pack("u", "v"), batch_format="pyarrow").materialize(),
        "pk", "pk", anti=True,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch["ia"].cast(pa.int64()),
            "id_b": batch["ib"].cast(pa.int64()),
            "score_q": batch["score_q"].cast(pa.int64()),
        })

    return (
        nonedges.map_batches(finish, batch_format="pyarrow")
        .sort(["score_q", "id_a", "id_b"], descending=[True, False, False])
        .limit(100)
    )


ORACLE_SQL["adamic_adar"] = """
WITH raw AS (
  SELECT ((o_orderkey % 991) * (o_orderkey % 997)) % 500 AS u,
         ((o_orderkey % 977) * (o_orderkey % 983)) % 500 AS v
  FROM orders),
e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
      FROM raw WHERE u <> v),
adj AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v AS w, u AS x FROM e),
deg AS (SELECT w, count(*) AS d FROM adj GROUP BY 1),
wedge AS (
  SELECT a.x AS ia, b.x AS ib,
         CAST(floor(1e6 / ln(d.d)) AS BIGINT) AS wq
  FROM adj a JOIN adj b ON a.w = b.w AND a.x < b.x
  JOIN deg d ON d.w = a.w),
aa AS (
  SELECT ia, ib, CAST(sum(wq) AS BIGINT) AS score_q FROM wedge GROUP BY 1, 2)
SELECT aa.ia AS id_a, aa.ib AS id_b, aa.score_q
FROM aa LEFT JOIN e ON e.u = aa.ia AND e.v = aa.ib
WHERE e.u IS NULL
ORDER BY score_q DESC, id_a, id_b
LIMIT 100
"""


# ---------------------------------------------------------------------------
# linear algebra: top principal direction by fixed-point power iteration
# ---------------------------------------------------------------------------

_PCA_ROUNDS = 4
_PCA_SCALE = 1_000_000  # embedding-component quantization (a scale knob:
                        # at 10^9+ rows drop to 1e3 so Gram sums stay in
                        # int64 through the distributed partial fold)


def _pca_iterate(G: "list[list[int]]", dim: int,
                 rounds: int = _PCA_ROUNDS) -> "list[int]":
    """Fixed-point power iteration on an integer Gram matrix, in Python
    ints (overflow-free at any magnitude) — the exact chain the DuckDB
    oracle replays in HUGEINT."""
    def tdiv(a: int, b: int) -> int:
        # DuckDB's integer `//` truncates toward zero; Python's floors —
        # mirror DuckDB exactly or negative components drift by 1/step
        return -((-a) // b) if a < 0 else a // b

    v = [_PCA_SCALE] * dim  # all-ones in fixed point
    for _ in range(rounds):
        w = [sum(G[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        v = [tdiv(x * _PCA_SCALE, m) for x in w]
    return v


def q_pca_power(sf_dir: str):
    """Power-iteration toward the top principal direction of the
    embedding table (uncentered second-moment PCA — the
    normalized-embedding convention) in FIXED POINT, bit-exact at any
    parallelism: components quantize to floor(1e6·x) int64, the 64×64
    Gram matrix is an exact integer fold, and each of the 4 unrolled
    iterations renormalizes by truncating division with max|w| — all
    integer ops, so the DuckDB oracle replays the identical chain in
    HUGEINT MATERIALIZED CTEs (the unrolled-iteration authoring rule)
    and hashes match to the last bit. Convergence is spectral-gap-bound
    as always for power iteration (this synth corpus is near-isotropic,
    λ2/λ1 ≈ 0.98, so 4 rounds only START rotating toward the top
    direction — the planted-spike unit test pins that the same kernel
    converges when a dominant direction exists); what the driver checks
    is the exact deterministic ITERATE, which is parallelism-invariant
    by construction.

    Scale shape: per-block Gram partials are FIXED-size (dim² int64 —
    the HLL argument: blocks contribute 32 KB regardless of rows; Q^T Q
    per block is one integer matmul), merged by a bounded native
    aggregate; ONLY the 4096-entry Gram ever reaches the driver, where
    the 64-vector iteration runs in Python ints (no overflow at any
    magnitude). Row count never touches the driver path."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def gram_partial(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        q = np.floor(emb.astype(np.float64) * _PCA_SCALE).astype(np.int64)
        g = q.T @ q  # exact int64 within a block (docstring bound)
        d = g.shape[0]
        i, j = np.divmod(np.arange(d * d, dtype=np.int64), d)
        return pa.table({
            "i": pa.array(i + 1),  # 1-based: generate_subscripts parity
            "j": pa.array(j + 1),
            "g_partial": pa.array(g.ravel()),
        })

    rows = ds.map_batches(gram_partial, batch_format="pyarrow").groupby(
        ["i", "j"]).aggregate(Sum("g_partial")).take_all()
    dim = int(np.sqrt(len(rows)))
    G = [[0] * dim for _ in range(dim)]
    for r in rows:
        G[int(r["i"]) - 1][int(r["j"]) - 1] = int(r["sum(g_partial)"])
    v = _pca_iterate(G, dim)
    return pa.table({
        "i": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
        "v_q": pa.array(np.array(v, dtype=np.int64)),
    })


def _pca_oracle_sql() -> str:
    s = _PCA_SCALE
    sql = f"""
WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), q AS (
  SELECT vec_id, i, CAST(floor({s} * CAST(x AS DOUBLE)) AS BIGINT) AS qv
  FROM e
), g AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, sum(CAST(a.qv AS HUGEINT) * b.qv) AS gij
  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2
), v0 AS (SELECT i, CAST({s} AS HUGEINT) AS v
          FROM (SELECT DISTINCT i FROM g))"""
    prev = "v0"
    for r in range(1, _PCA_ROUNDS + 1):
        sql += f""",
w{r} AS MATERIALIZED (
  SELECT g.i, sum(g.gij * {prev}.v) AS w
  FROM g JOIN {prev} ON {prev}.i = g.j GROUP BY 1
), v{r} AS MATERIALIZED (
  SELECT i, (w * {s}) // (SELECT max(abs(w)) FROM w{r}) AS v FROM w{r}
)"""
        prev = f"v{r}"
    sql += f"""
SELECT CAST(i AS BIGINT) AS i, CAST(v AS BIGINT) AS v_q FROM {prev}
"""
    return sql


ORACLE_SQL["pca_power"] = _pca_oracle_sql()


# ---------------------------------------------------------------------------
# statistics: deterministic subsampling bootstrap + event-type transitions
# ---------------------------------------------------------------------------

_BOOT_REPS = 32


def q_bootstrap_ci(sf_dir: str):
    """Subsampling (m-out-of-n) bootstrap of the mean order value: 32
    deterministic half-replicates, each row's membership in replicate b
    read off the b-th hex digit of ONE md5 per key (top bit set → in),
    so the whole resampling plan costs one hash per row and is
    bit-mirrored by `substr(md5(k), b+1, 1) >= '8'` in SQL. Output one
    row per replicate (n, sum_cents, floor mean) — the driver hashes the
    full replicate table, and a CI is any quantile readout over it.

    Scale shape: replicate membership is evaluated IN-BATCH (32 bits per
    row, no explosion — the per-batch partial is a fixed 32×2 matrix,
    the HLL argument again); one bounded native aggregate merges."""
    import hashlib

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        # bit b of the row = whether hex digit b has its top bit set
        bits = np.zeros((key.size, _BOOT_REPS), bool)
        for r, k in enumerate(key):
            h = hashlib.md5(str(int(k)).encode()).hexdigest()
            bits[r] = [c in "89abcdef" for c in h[:_BOOT_REPS]]
        n_part = bits.sum(axis=0).astype(np.int64)
        s_part = (bits * cents[:, None]).sum(axis=0).astype(np.int64)
        return pa.table({
            "b": pa.array(np.arange(_BOOT_REPS, dtype=np.int64)),
            "n_partial": pa.array(n_part),
            "sum_partial": pa.array(s_part),
        })

    agg = ds.map_batches(partials, batch_format="pyarrow").groupby(
        "b").aggregate(Sum("n_partial"), Sum("sum_partial"))

    def shape(batch: pa.Table) -> pa.Table:
        n = batch["sum(n_partial)"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        s = batch["sum(sum_partial)"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "b": batch["b"].cast(pa.int64()),
            "n": pa.array(n),
            "sum_cents": pa.array(s),
            "mean_cents": pa.array(s // n),
        })

    return agg.map_batches(shape, batch_format="pyarrow")


ORACLE_SQL["bootstrap_ci"] = f"""
WITH reps AS (SELECT unnest(range({_BOOT_REPS})) AS b),
s AS (
  SELECT r.b, CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o CROSS JOIN reps r
  WHERE substr(md5(CAST(o.o_orderkey AS VARCHAR)),
               CAST(r.b AS INTEGER) + 1, 1) >= '8'
)
SELECT b, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
FROM s GROUP BY b
"""


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts of the per-user event-type
    sequence ((ts, event_id)-ordered) — the behavioral transition matrix
    sessionization/funnel features build on. One bucketed shuffle on
    user_id (a user's whole sequence meets in its bucket, vectorized
    shift — no per-user dispatch), finished by the bounded
    |types|²-domain native aggregate."""
    from ray.data.aggregate import Sum

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def trans_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({
                "from_type": pd.Series(dtype=object),
                "to_type": pd.Series(dtype=object),
                "n_partial": pd.Series(dtype=np.int64),
            })
        same = u[1:] == u[:-1]
        sub = pd.DataFrame({"from_type": t[:-1][same],
                            "to_type": t[1:][same]})
        out = sub.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n_partial"})

    agg = bucketed_group_apply(ds, ["user_id"], trans_bucket).groupby(
        ["from_type", "to_type"]).aggregate(Sum("n_partial"))
    return agg.map_batches(
        lambda b: pa.table({
            "from_type": b["from_type"],
            "to_type": b["to_type"],
            "n": b["sum(n_partial)"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["event_transitions"] = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# customer analytics: cohort lifetime-value matrix
# ---------------------------------------------------------------------------


def q_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value matrix: customers cohorted by the calendar
    month of their FIRST order; revenue accumulated per (cohort_month,
    months_since_first) cell in exact integer cents — `user_retention`'s
    money-weighted sibling (retention counts heads, LTV sums spend).
    Month arithmetic is pure integers (year·12+month), so the age
    computation is exact in both engines.

    Scale shape: the per-customer first-order month is a bucketed
    min-aggregate (customer cardinality — never the native per-group
    reduce), joined back by one bucketed hash join; the (cohort × age)
    readout is a bounded calendar-domain native aggregate."""
    from ray.data.aggregate import Sum

    from ..stages.groupops import bucketed_aggregate
    from ..stages.joins import bucket_hash_join

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        d = ts.astype("datetime64[us]").astype("datetime64[M]")
        mon = (d.astype(np.int64)  # 0-based months since 1970-01 →
               + np.int64(1970 * 12 + 1))  # SQL's year·12+month (1-based)
        cents = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "cust": batch["o_custkey"].cast(pa.int64()),
            "mon": pa.array(mon),
            "cents": pa.array(cents),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    first = bucketed_aggregate(
        prepped, ["cust"], {"first_mon": ("mon", "min")})
    joined = bucket_hash_join(prepped, first, "cust", "cust",
                              num_buckets=32)

    def cell(batch: pa.Table) -> pa.Table:
        mon = batch["mon"].to_numpy(zero_copy_only=False).astype(np.int64)
        fm = batch["first_mon"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "cohort_mon": pa.array(fm),
            "age_months": pa.array(mon - fm),
            "cents": batch["cents"],
        })

    agg = joined.map_batches(cell, batch_format="pyarrow").groupby(
        ["cohort_mon", "age_months"]).aggregate(Sum("cents"))
    return agg.map_batches(
        lambda b: pa.table({
            "cohort_mon": b["cohort_mon"].cast(pa.int64()),
            "age_months": b["age_months"].cast(pa.int64()),
            "revenue_cents": b["sum(cents)"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["cohort_ltv"] = """
WITH o AS (
  SELECT o_custkey AS cust,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mon,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), f AS (
  SELECT cust, min(mon) AS first_mon FROM o GROUP BY 1
)
SELECT f.first_mon AS cohort_mon,
       o.mon - f.first_mon AS age_months,
       CAST(sum(o.cents) AS BIGINT) AS revenue_cents
FROM o JOIN f ON f.cust = o.cust
GROUP BY 1, 2
"""


def q_order_width_hist(sf_dir: str):
    """Fan-out distribution: histogram of lineitems-per-order widths —
    the skew diagnostic every join planner wants (a heavy tail here is
    exactly what the skew_hash_join bypass exists for). Two-stage plan:
    per-order width by a bucketed size-aggregate (order cardinality —
    high, so never the native per-group reduce), then the bounded
    width-domain native count; rows cross one shuffle as (key) only."""
    from ray.data.aggregate import Count

    from ..stages.groupops import bucketed_aggregate

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    widths = bucketed_aggregate(
        li, ["l_orderkey"], {"width": ("l_orderkey", "size")})
    agg = widths.groupby("width").aggregate(Count())
    return agg.map_batches(
        lambda b: pa.table({
            "width": b["width"].cast(pa.int64()),
            "n_orders": b["count()"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["order_width_hist"] = """
WITH w AS (
  SELECT l_orderkey, count(*) AS width FROM lineitem GROUP BY 1
)
SELECT CAST(width AS BIGINT) AS width,
       CAST(count(*) AS BIGINT) AS n_orders
FROM w GROUP BY 1
"""


def q_codemand_pairs(sf_dir: str):
    """Temporal co-demand: per part, the number of lineitem pairs from
    DIFFERENT orders shipped within 7 days of each other — the
    interval self-join that feeds demand-correlation features. Counted
    WITHOUT generating pairs: lineitems sort (part, day) inside their
    hash bucket, one searchsorted sweep counts each row's 7-day
    successors (total pairs), a second keyed (part, order, day) sweep
    subtracts same-order pairs — O(n log n) per bucket, output
    cardinality |parts|, never the quadratic pair stream (shipdates are
    day-aligned, so integer day diffs mirror the oracle's µs diffs
    exactly)."""
    from ..stages.groupops import bucketed_group_apply

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_orderkey", "l_shipdate"])

    def prep(batch: pa.Table) -> pa.Table:
        day = (batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        return pa.table({
            "part": batch["l_partkey"].cast(pa.int64()),
            "order_key": batch["l_orderkey"].cast(pa.int64()),
            "day": pa.array(day.astype(np.int64)),
        })

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"part": pd.Series(dtype=np.int64),
                                 "n_pairs": pd.Series(dtype=np.int64)})
        part = g["part"].to_numpy()
        order_key = g["order_key"].to_numpy()
        day = g["day"].to_numpy()

        def window_counts(keys1, keys2, d):
            # rows sorted by (keys…, day): for row i, successors j > i
            # with same keys and day_j − day_i ≤ 7
            order = np.lexsort((d,) + tuple(reversed(keys2)))
            dd = d[order]
            # composite int key: group rank · 2^20 + day-offset (day
            # range ≪ 2^20 and rank · 2^20 ≪ 2^63)
            grp = np.zeros(len(dd), np.int64)
            if keys1:
                stacked = np.stack([k[order] for k in keys1])
                changed = np.zeros(len(dd), bool)
                changed[1:] = (stacked[:, 1:] != stacked[:, :-1]).any(axis=0)
                grp = np.cumsum(changed)
            base = dd - dd.min()
            ck = grp * np.int64(1) * np.int64(1 << 20) + base
            hi = np.searchsorted(ck, ck + 7, "right")
            cnt = hi - np.arange(len(ck)) - 1
            out = np.zeros(len(dd), np.int64)
            out[order] = cnt
            return out

        total = window_counts([part], [part], day)
        same = window_counts([part, order_key], [part, order_key], day)
        per_row = total - same
        res = pd.DataFrame({"part": part, "n_pairs": per_row}).groupby(
            "part", as_index=False)["n_pairs"].sum()
        return res[res["n_pairs"] > 0].astype(np.int64)

    return bucketed_group_apply(
        li.map_batches(prep, batch_format="pyarrow"),
        ["part"], count_bucket,
    )


ORACLE_SQL["codemand_pairs"] = """
SELECT a.l_partkey AS part, CAST(count(*) AS BIGINT) AS n_pairs
FROM lineitem a JOIN lineitem b
  ON a.l_partkey = b.l_partkey AND a.l_orderkey < b.l_orderkey
 AND abs(epoch_us(a.l_shipdate) - epoch_us(b.l_shipdate))
     <= CAST(7 AS BIGINT) * 86400 * 1000000
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# semi-supervised auto-labeling: label propagation on the exact kNN graph
# ---------------------------------------------------------------------------

_LP_K = 8
_LP_ROUNDS = 2


def q_label_propagation(sf_dir: str):
    """Semi-supervised label propagation — the auto-labeling operator a
    training-data pipeline uses to extend a seed label set: vectors with
    vec_id % 3 == 0 are unlabeled; the rest seed their class. The graph
    is the EXACT top-8 neighbor list by INTEGER dot product of
    floor(1e6·x)-quantized embeddings (exact because float dot-product
    accumulation order would make cross-engine top-k ties undecidable),
    ties → smaller dst; 2 unrolled rounds of majority vote (ties →
    smaller label; seeds clamped).

    Scale shape: quantized QUERY matrix broadcast once (the ANN-family
    broadcast-queries convention — shard queries at fleet scale), corpus
    stays distributed; per-batch integer matmul emits per-query
    top-(k+1) PARTIALS, one bucketed merge finishes the graph. Label
    rounds are Dataset-only: bucketed hash join (edges ⋈ labels on dst)
    + bucketed majority per src — nothing corpus-scale on the driver at
    any step."""
    import ray as _ray

    from ..stages.groupops import bucketed_group_apply
    from ..stages.joins import bucket_hash_join

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def quant(batch: pa.Table):
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        q = np.floor(emb.astype(np.float64) * 1e6).astype(np.int64)
        return ids, q

    # query side: the full quantized corpus, broadcast once
    qparts = ds.map_batches(
        lambda b: pa.table({
            "vec_id": b["vec_id"].cast(pa.int64()),
            "qbytes": pa.array(
                [q.tobytes() for q in quant(b)[1]], pa.binary()),
        }),
        batch_format="pyarrow",
    ).take_all()
    qids = np.array([r["vec_id"] for r in qparts], np.int64)
    order = np.argsort(qids, kind="mergesort")
    qids = qids[order]
    qmat = np.stack([
        np.frombuffer(qparts[i]["qbytes"], np.int64) for i in order])
    q_ref = _ray.put((qids, qmat))

    def knn_partial(batch: pa.Table) -> pa.Table:
        ids, q = quant(batch)
        qi, qm = _ray.get(q_ref)
        dots = q @ qm.T  # (batch × corpus) exact int64
        take = min(_LP_K + 1, ids.size)
        out_src, out_dst, out_dot = [], [], []
        # per QUERY column: top candidates among this batch's rows
        part = np.argpartition(-dots, take - 1, axis=0)[:take]
        for c in range(qi.size):
            rows = part[:, c]
            out_src.append(np.full(take, qi[c], np.int64))
            out_dst.append(ids[rows])
            out_dot.append(dots[rows, c])
        return pa.table({
            "src": pa.array(np.concatenate(out_src)),
            "dst": pa.array(np.concatenate(out_dst)),
            "dot": pa.array(np.concatenate(out_dot)),
        })

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["src"] != g["dst"]]
        g = g.sort_values(["src", "dot", "dst"],
                          ascending=[True, False, True], kind="mergesort")
        return g.groupby("src", sort=False).head(_LP_K)[["src", "dst"]]

    edges = bucketed_group_apply(
        ds.map_batches(knn_partial, batch_format="pyarrow"),
        ["src"], topk_bucket,
    ).materialize()

    labels = ds.map_batches(
        lambda b: pa.table({
            "vec_id": b["vec_id"].cast(pa.int64()),
            "lab": pa.array(np.where(
                b["vec_id"].to_numpy(zero_copy_only=False) % 3 != 0,
                b["label"].to_numpy(zero_copy_only=False).astype(np.int64),
                np.int64(-1))),
        }),
        batch_format="pyarrow",
    ).materialize()

    def majority(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["lab"] != -1]
        if not len(g):
            return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                                 "maj": pd.Series(dtype=np.int64)})
        cnt = g.groupby(["src", "lab"], as_index=False).size()
        cnt = cnt.sort_values(["src", "size", "lab"],
                              ascending=[True, False, True],
                              kind="mergesort")
        top = cnt.groupby("src", sort=False).head(1)
        return pd.DataFrame({"vec_id": top["src"].to_numpy(np.int64),
                             "maj": top["lab"].to_numpy(np.int64)})

    for _ in range(_LP_ROUNDS):
        joined = bucket_hash_join(edges, labels, "dst", "vec_id",
                                  num_buckets=16)
        maj = bucketed_group_apply(joined, ["src"], majority)
        upd = bucket_hash_join(labels, maj, "vec_id", "vec_id",
                               num_buckets=16, how="left")

        def apply_update(batch: pa.Table) -> pa.Table:
            lab = batch["lab"].to_numpy(zero_copy_only=False).astype(np.int64)
            mj = batch["maj"].to_numpy(zero_copy_only=False)
            mj = np.where(pd.isna(mj), -1, mj).astype(np.int64)
            return pa.table({
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "lab": pa.array(np.where(lab != -1, lab, mj)),
            })

        labels = upd.map_batches(
            apply_update, batch_format="pyarrow").materialize()

    return labels.map_batches(
        lambda b: pa.table({
            "vec_id": b["vec_id"].cast(pa.int64()),
            "label_out": b["lab"].cast(pa.int64()),
            "was_seed": pa.array(
                (b["vec_id"].to_numpy(zero_copy_only=False) % 3 != 0)
                .astype(np.int64)),
        }),
        batch_format="pyarrow",
    )


def _lp_oracle_sql() -> str:
    sql = f"""
WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), q AS (
  SELECT vec_id, i, CAST(floor(1e6 * CAST(x AS DOUBLE)) AS BIGINT) AS qv
  FROM e
), dots AS MATERIALIZED (
  SELECT a.vec_id AS src, b.vec_id AS dst, sum(a.qv * b.qv) AS dot
  FROM q a JOIN q b ON a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
), knn AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY dot DESC, dst) AS rn
    FROM dots) WHERE rn <= {_LP_K}
), l0 AS MATERIALIZED (
  SELECT vec_id, CASE WHEN vec_id % 3 <> 0 THEN CAST(label AS BIGINT)
                      ELSE -1 END AS lab
  FROM embeddings)"""
    prev = "l0"
    for r in range(1, _LP_ROUNDS + 1):
        sql += f""",
maj{r} AS (
  SELECT src, lab FROM (
    SELECT k.src, l.lab,
           row_number() OVER (PARTITION BY k.src
                              ORDER BY count(*) DESC, l.lab) AS rn
    FROM knn k JOIN {prev} l ON l.vec_id = k.dst AND l.lab <> -1
    GROUP BY k.src, l.lab) WHERE rn = 1
), r{r} AS MATERIALIZED (
  SELECT v.vec_id,
         CASE WHEN v.lab <> -1 THEN v.lab
              ELSE COALESCE(m.lab, -1) END AS lab
  FROM {prev} v LEFT JOIN maj{r} m ON m.src = v.vec_id)"""
        prev = f"r{r}"
    sql += f"""
SELECT vec_id, lab AS label_out,
       CAST(CASE WHEN vec_id % 3 <> 0 THEN 1 ELSE 0 END AS BIGINT)
         AS was_seed
FROM {prev}
"""
    return sql


ORACLE_SQL["label_propagation"] = _lp_oracle_sql()


# ---------------------------------------------------------------------------
# stateful scan: clamped running balance (bounded-counter semantics)
# ---------------------------------------------------------------------------

_INV_CAP = 50_000   # balance ceiling (cents)
_INV_USER_CAP = 30  # oracle cost bound: recursive CTE iterates per step


def q_inventory_scan(sf_dir: str):
    """Clamped running balance per user — bounded-counter semantics
    (inventory/credit ledgers): bal_i = clamp(bal_{i-1} + δ_i, 0, CAP),
    purchases/clicks credit, everything else debits, in exact cents.
    This scan is NON-ASSOCIATIVE as plain addition (the window-function
    family can't express it — the oracle needs a WITH RECURSIVE replay),
    but x ↦ clamp(x+a, l, h) maps COMPOSE closed-form ((a,l,h) triples:
    a'=a₁+a₂, l'=clamp(l₁+a₂,l₂,h₂), h'=clamp(h₁+a₂,l₂,h₂)), which is
    the split-sequence parallel-scan law a fleet-scale deployment would
    use to shard one enormous key; here a user's whole sequence meets in
    its hash bucket and runs as one ordered pass (users are the parallel
    axis, per-user length bounds the sequential term)."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = uid < _INV_USER_CAP
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)[m]
        cents = np.round(
            batch["value"].to_numpy(zero_copy_only=False)[m] * 100
        ).astype(np.int64)
        delta = np.where((et == "purchase") | (et == "click"),
                         cents, -cents)
        return pa.table({
            "user_id": pa.array(uid[m]),
            "ts": batch["ts"].filter(pa.array(m)),
            "event_id": batch["event_id"].filter(pa.array(m)).cast(
                pa.int64()),
            "delta": pa.array(delta),
        })

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "event_id": pd.Series(dtype=np.int64),
                                 "bal": pd.Series(dtype=np.int64)})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        d = g["delta"].to_numpy()
        bal = np.empty(len(g), np.int64)
        b = 0
        prev_u = None
        for i in range(len(g)):  # inherently sequential per key; users
            if u[i] != prev_u:   # are the parallel axis (docstring)
                b = 0
                prev_u = u[i]
            b = min(_INV_CAP, max(0, b + int(d[i])))
            bal[i] = b
        return pd.DataFrame({
            "user_id": u, "event_id": g["event_id"].to_numpy(), "bal": bal})

    return bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], scan_bucket,
    )


ORACLE_SQL["inventory_scan"] = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('purchase', 'click')
              THEN CAST(round(value * 100) AS BIGINT)
              ELSE -CAST(round(value * 100) AS BIGINT) END AS delta,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id < {_INV_USER_CAP}
),
rec AS (
  SELECT user_id, rn, event_id,
         least(CAST({_INV_CAP} AS BIGINT),
               greatest(CAST(0 AS BIGINT), delta)) AS bal
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.event_id,
         least(CAST({_INV_CAP} AS BIGINT),
               greatest(CAST(0 AS BIGINT), r.bal + s.delta))
  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, event_id, bal FROM rec
"""


def q_first_touch(sf_dir: str):
    """FIRST-touch attribution: each purchase credits the EARLIEST click
    in its trailing 7-day window — the complement of
    `purchase_attribution`'s as-of (last-touch) join, and a different
    join shape: as-of wants the nearest predecessor (merge_asof), first
    touch wants the window MINIMUM, which searchsorted delivers directly
    — per user, clicks sort once, each purchase binary-searches its
    window's left edge (O((P+C)·log C) per bucket, no pair stream, no
    per-row Python). µs-integer latency, ties by (ts, event_id)."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    win_us = np.int64(7 * 86400) * np.int64(1_000_000)

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        m = (et == "purchase") | (et == "click")
        sel = pa.array(m)
        return pa.table({
            "user_id": batch["user_id"].filter(sel).cast(pa.int64()),
            "ts_us": batch["ts"].filter(sel).cast(pa.int64()),
            "event_id": batch["event_id"].filter(sel).cast(pa.int64()),
            "is_p": pa.array((et[m] == "purchase").astype(np.int8)),
        })

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "purchase_id": pd.Series(dtype=np.int64),
            "click_id": pd.Series(dtype=np.int64),
            "lat_us": pd.Series(dtype=np.int64),
        })
        out = []
        for _, sub in g.groupby("user_id", sort=False):
            p = sub[sub["is_p"] == 1]
            c = sub[sub["is_p"] == 0].sort_values(
                ["ts_us", "event_id"], kind="mergesort")
            if not len(p) or not len(c):
                continue
            cts = c["ts_us"].to_numpy()
            cid = c["event_id"].to_numpy()
            pts = p["ts_us"].to_numpy()
            pid = p["event_id"].to_numpy()
            lo = np.searchsorted(cts, pts - win_us, "left")
            hi = np.searchsorted(cts, pts, "left")  # strict c.ts < p.ts
            m = hi > lo
            if not m.any():
                continue
            first = lo[m]  # ties: the (ts, event_id) sort makes min exact
            out.append(pd.DataFrame({
                "purchase_id": pid[m],
                "click_id": cid[first],
                "lat_us": pts[m] - cts[first],
            }))
        return pd.concat(out) if out else empty

    return bucketed_group_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], attach,
    )


ORACLE_SQL["first_touch"] = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS lat_us,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts, c.event_id) AS rn
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 7 DAY
)
SELECT purchase_id, click_id, CAST(lat_us AS BIGINT) AS lat_us
FROM j WHERE rn = 1
"""


def q_weekday_seasonality(sf_dir: str):
    """Day-of-week seasonal index of order revenue: per ISO weekday,
    exact revenue/count integers plus the seasonal ratio
    (weekday mean ÷ overall mean) as ONE mirrored float division of
    integer-exact operands — the STL-lite seasonal readout. Bounded
    7-key domain → native per-block partial combine is optimal
    (CLAUDE.md bounded-domain rule)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        d_us = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = d_us // 86_400_000_000
        # 1970-01-01 was a Thursday; ISO weekday 1=Mon..7=Sun
        dow = ((day + 3) % 7) + 1
        cents = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"dow": pa.array(dow.astype(np.int64)),
                         "cents": pa.array(cents)})

    agg = ds.map_batches(prep, batch_format="pyarrow").groupby(
        "dow").aggregate(Count(), Sum("cents"))
    rows = agg.take_all()  # ≤ 7 rows — bounded calendar domain
    tot_n = sum(int(r["count()"]) for r in rows)
    tot_s = sum(int(r["sum(cents)"]) for r in rows)
    rows.sort(key=lambda r: int(r["dow"]))
    n = np.array([int(r["count()"]) for r in rows], np.int64)
    s = np.array([int(r["sum(cents)"]) for r in rows], np.int64)
    # one mirrored float expression over exact integers
    idx = (s.astype(np.float64) / n) / (np.float64(tot_s) / np.float64(tot_n))
    return pa.table({
        "dow": pa.array([int(r["dow"]) for r in rows], pa.int64()),
        "n_orders": pa.array(n),
        "revenue_cents": pa.array(s),
        "seasonal_idx": pa.array(np.round(idx, 6)),
    })


ORACLE_SQL["weekday_seasonality"] = """
WITH o AS (
  SELECT isodow(o_orderdate) AS dow,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), per AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS revenue_cents
  FROM o GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_orders) AS BIGINT) AS tn,
         CAST(sum(revenue_cents) AS BIGINT) AS ts FROM per
)
SELECT p.dow, p.n_orders, p.revenue_cents,
       round((CAST(p.revenue_cents AS DOUBLE) / p.n_orders)
             / (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)), 6)
         AS seasonal_idx
FROM per p CROSS JOIN tot t
"""


def q_fk_integrity(sf_dir: str):
    """Referential-integrity audit across the star schema — the data-
    quality gate a nightly load runs before publishing: for each FK edge
    (lineitem→orders, orders→customer, customer→nation), total rows and
    orphan rows (FK with no parent). Orphan detection is the shuffled
    ANTI semi-join (ids only cross the wire — the Bloom/broadcast
    small-side path auto-selects when the parent side is small);
    output is one bounded row per edge."""
    from ..stages.joins import semi_join_shuffled

    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    rel, total, orphans = [], [], []
    for child, fk, parent, pk in edges:
        c = _read(sf_dir, child, [fk])
        p = _read(sf_dir, parent, [pk])

        def to_key(col):
            def _m(batch: pa.Table) -> pa.Table:
                return pa.table({"k": batch[col].cast(pa.int64())})
            return _m

        ck = c.map_batches(to_key(fk), batch_format="pyarrow").materialize()
        pk_ds = p.map_batches(to_key(pk), batch_format="pyarrow").materialize()
        n_orphan = semi_join_shuffled(ck, pk_ds, "k", "k", anti=True).count()
        rel.append(f"{child}->{parent}")
        total.append(ck.count())
        orphans.append(n_orphan)
    return pa.table({
        "edge": pa.array(rel, pa.string()),
        "n_rows": pa.array(total, pa.int64()),
        "n_orphans": pa.array(orphans, pa.int64()),
    })


ORACLE_SQL["fk_integrity"] = """
SELECT 'lineitem->orders' AS edge,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
         AS n_orphans
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'orders->customer',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
FROM orders r LEFT JOIN customer c ON c.c_custkey = r.o_custkey
UNION ALL
SELECT 'customer->nation',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
FROM customer cu LEFT JOIN nation n ON n.n_nationkey = cu.c_nationkey
"""


# ---------------------------------------------------------------------------
# spatial: great-circle (haversine) radius join
# ---------------------------------------------------------------------------

_HAV_R = "6371000.0"  # mean Earth radius — mirrored literal


def q_haversine_join(sf_dir: str):
    """Great-circle radius join: customer points vs thinned order points
    within 100 m HAVERSINE distance — the geodesic twin of
    `distance_join_100m` (the reference is planar-only; real-Earth
    metric completeness). Plan: candidates come from the SAME one-shuffle
    cell co-join at a 150 m PLANAR radius (at φ≈38.9° a 100 m great
    circle is ≤ ~129 m planar — the cover bound is documented, not
    hoped), then one vectorized haversine evaluation filters exactly;
    the trig chain (radians → sin/cos half-angle form → asin) is
    literal-mirrored so the 1-decimal distances hash-match."""
    from ..stages.spatial import radius_pairs

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def pts(col, thin=None):
        def _m(batch: pa.Table) -> pa.Table:
            key = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            if thin:
                key = key[key % thin == 0]
            lon, lat = _formula_coords(key)
            return pa.table({
                "id": pa.array(key),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            })
        return _m

    a = cust.map_batches(pts("c_custkey"), batch_format="pyarrow")
    b = orders.map_batches(pts("o_orderkey", thin=4), batch_format="pyarrow")
    cand = radius_pairs(a, b, 150.0, emit_dist=False)

    def hav(batch: pa.Table) -> pa.Table:
        ia = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon1, lat1 = _formula_coords(ia)
        lon2, lat2 = _formula_coords(ib)
        R = float(_HAV_R)
        p1 = np.radians(lat1)
        p2 = np.radians(lat2)
        dphi = np.radians(lat2 - lat1)
        dlam = np.radians(lon2 - lon1)
        h = (np.sin(dphi / 2) * np.sin(dphi / 2)
             + np.cos(p1) * np.cos(p2)
             * np.sin(dlam / 2) * np.sin(dlam / 2))
        d = 2.0 * R * np.arcsin(np.sqrt(h))
        m = d <= 100.0
        return pa.table({
            "cust_id": pa.array(ia[m]),
            "order_id": pa.array(ib[m]),
            "hav_m": pa.array(np.round(d[m], 1)),
        })

    return cand.map_batches(hav, batch_format="pyarrow")


ORACLE_SQL["haversine_join"] = f"""
WITH a AS (
  SELECT c_custkey AS id,
         -77.05 + (c_custkey % 1000) * 1e-4 AS lon,
         38.85 + ((c_custkey // 1000) % 1000) * 1e-4 AS lat,
         {_MERC} * radians(-77.05 + (c_custkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 +
             radians(38.85 + ((c_custkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM customer),
b AS (
  SELECT o_orderkey AS id,
         -77.05 + (o_orderkey % 1000) * 1e-4 AS lon,
         38.85 + ((o_orderkey // 1000) % 1000) * 1e-4 AS lat,
         {_MERC} * radians(-77.05 + (o_orderkey % 1000) * 1e-4) AS x,
         {_MERC} * ln(tan(pi()/4 +
             radians(38.85 + ((o_orderkey // 1000) % 1000) * 1e-4)/2)) AS y
  FROM orders WHERE o_orderkey % 4 = 0),
cand AS (
  SELECT a.id AS cust_id, b.id AS order_id,
         a.lat AS lat1, a.lon AS lon1, b.lat AS lat2, b.lon AS lon2
  FROM a JOIN b
    ON b.x BETWEEN a.x - 150 AND a.x + 150
   AND b.y BETWEEN a.y - 150 AND a.y + 150),
h AS (
  SELECT cust_id, order_id,
         2.0 * {_HAV_R} * asin(sqrt(
             sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
             + cos(radians(lat1)) * cos(radians(lat2))
             * sin(radians(lon2 - lon1) / 2)
             * sin(radians(lon2 - lon1) / 2))) AS d
  FROM cand)
SELECT cust_id, order_id, round(d, 1) AS hav_m FROM h WHERE d <= 100.0
"""


def q_fisher_ratio(sf_dir: str):
    """Fisher discriminant ratio per label pair over the embeddings table
    — the class-separability diagnostic (is this label pair linearly
    distinguishable at all?): Σ_d (μ1_d − μ2_d)² / (σ1²_d + σ2²_d),
    computed from integer-quantized per-(label, dim) moment sums
    (floor(1e6·x) and its square — exact int64 folds; the float
    means/variances are ONE mirrored expression chain over exact
    operands, summed in fixed dim order both sides).

    Scale shape: per-block (label × dim)-bounded moment partials (640
    cells) → native aggregate; only that bounded table reaches the
    driver; the |labels|² pair readout is pure arithmetic."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def moments(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        q = np.floor(emb.astype(np.float64) * 1e6).astype(np.int64)
        dim = q.shape[1]
        labs = np.repeat(lab, dim)
        dims = np.tile(np.arange(dim, dtype=np.int64), len(lab))
        return pa.table({
            "label": pa.array(labs),
            "d": pa.array(dims),
            "s": pa.array(q.ravel()),
            "s2": pa.array((q * q).ravel()),
            "one": pa.array(np.ones(labs.size, np.int64)),
        })

    rows = ds.map_batches(moments, batch_format="pyarrow").groupby(
        ["label", "d"]).aggregate(Sum("s"), Sum("s2"), Sum("one")).take_all()
    per: dict[int, dict[int, tuple[int, int, int]]] = {}
    for r in rows:
        per.setdefault(int(r["label"]), {})[int(r["d"])] = (
            int(r["sum(s)"]), int(r["sum(s2)"]), int(r["sum(one)"]))
    labels = sorted(per)
    la_out, lb_out, ratio = [], [], []
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            tot = 0
            for d in sorted(per[la]):  # per-term quantize → order-free sum
                s1, ss1, n1 = per[la][d]
                s2, ss2, n2 = per[lb][d]
                m1 = s1 / n1
                m2 = s2 / n2
                v1 = ss1 / n1 - m1 * m1
                v2 = ss2 / n2 - m2 * m2
                term = (m1 - m2) * (m1 - m2) / (v1 + v2)
                tot += int(np.floor(1e9 * term))
            la_out.append(la)
            lb_out.append(lb)
            ratio.append(tot)
    return pa.table({
        "label_a": pa.array(la_out, pa.int64()),
        "label_b": pa.array(lb_out, pa.int64()),
        "fisher_q": pa.array(ratio, pa.int64()),
    })


ORACLE_SQL["fisher_ratio"] = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings
), q AS (
  SELECT label, d, CAST(floor(1e6 * CAST(x AS DOUBLE)) AS BIGINT) AS qv
  FROM e
), m AS (
  SELECT label, d,
         CAST(sum(qv) AS BIGINT) AS s,
         CAST(sum(qv * qv) AS BIGINT) AS ss,
         CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY 1, 2
), pairs AS (
  SELECT a.label AS label_a, b.label AS label_b, a.d,
         CAST(floor(1e9 * (
           ((a.s / a.n) - (b.s / b.n)) * ((a.s / a.n) - (b.s / b.n))
           / ((a.ss / a.n - (a.s / a.n) * (a.s / a.n))
              + (b.ss / b.n - (b.s / b.n) * (b.s / b.n))))) AS BIGINT)
           AS term_q
  FROM m a JOIN m b ON a.d = b.d AND a.label < b.label
)
SELECT label_a, label_b, CAST(sum(term_q) AS BIGINT) AS fisher_q
FROM pairs GROUP BY 1, 2
"""


def q_scd2_history(sf_dir: str):
    """Type-2 slowly-changing-dimension history build from the event
    stream — the warehouse-CDC operator that turns an update log into
    versioned rows: per user, each observed value becomes a version with
    [valid_from, valid_to) bounds (valid_to = next change's timestamp,
    NULL while current), consecutive DUPLICATE values collapsed (a
    re-assertion of the same value is not a new version). One bucketed
    shuffle on user_id; the per-user pass is a vectorized shift —
    µs-integer timestamps end to end."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype=np.int64),
            "value_cents": pd.Series(dtype=np.int64),
            "valid_from": pd.Series(dtype="datetime64[us]"),
            "valid_to": pd.Series(dtype="datetime64[us]"),
        })
        if not len(g):
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]")
        v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        same_u = np.concatenate([[False], u[1:] == u[:-1]])
        same_v = np.concatenate([[False], v[1:] == v[:-1]])
        keep = ~(same_u & same_v)  # collapse re-asserted values
        u, ts, v = u[keep], ts[keep], v[keep]
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        nxt[-1] = np.datetime64("NaT", "us")
        cont = np.concatenate([u[1:] == u[:-1], [False]])
        valid_to = np.where(cont, nxt, np.datetime64("NaT", "us"))
        return pd.DataFrame({
            "user_id": u.astype(np.int64),
            "value_cents": v,
            "valid_from": ts,
            "valid_to": valid_to.astype("datetime64[us]"),
        })

    return bucketed_group_apply(ds, ["user_id"], versions)


ORACLE_SQL["scd2_history"] = """
WITH o AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         lag(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
  FROM events
), changes AS (
  SELECT user_id, ts, event_id, value_cents FROM o
  WHERE prev_v IS NULL OR prev_v <> value_cents
)
SELECT user_id, value_cents, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to
FROM changes
"""


def q_user_features(sf_dir: str):
    """Feature-store assembly: one wide feature row per user, composed
    from two independently-computed feature families — the RFM buckets
    (orders axis) and the half-life decayed activity score (events
    axis) — joined on the shared user key. This is the multi-pipeline
    composition a training job consumes (and exactly how a feature
    store materializes: each family built by ITS OWN pipeline, assembly
    is one bucketed hash join; adding a family is another join, never a
    rewrite). Inner join: only users present on both axes emit."""
    from ..stages.joins import bucket_hash_join

    rfm = q_customer_rfm(sf_dir).map_batches(
        lambda b: pa.table({
            "user_id": b["o_custkey"].cast(pa.int64()),
            "r_bucket": b["r_bucket"].cast(pa.int64()),
            "f_bucket": b["f_bucket"].cast(pa.int64()),
            "m_bucket": b["m_bucket"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()
    act = q_decayed_activity(sf_dir).materialize()
    joined = bucket_hash_join(rfm, act, "user_id", "user_id",
                              num_buckets=16)
    return joined.map_batches(
        lambda b: pa.table({
            "user_id": b["user_id"].cast(pa.int64()),
            "r_bucket": b["r_bucket"].cast(pa.int64()),
            "f_bucket": b["f_bucket"].cast(pa.int64()),
            "m_bucket": b["m_bucket"].cast(pa.int64()),
            "decay_score": b["decay_score"].cast(pa.int64()),
            "n_events": b["n_events"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def _user_features_oracle_sql() -> str:
    rfm = ORACLE_SQL["customer_rfm"]
    act = ORACLE_SQL["decayed_activity"]
    return f"""
WITH rfm_t AS ({rfm}),
act_t AS ({act})
SELECT CAST(r.o_custkey AS BIGINT) AS user_id,
       r.r_bucket, r.f_bucket, r.m_bucket,
       a.decay_score, a.n_events
FROM rfm_t r JOIN act_t a ON a.user_id = r.o_custkey
"""


ORACLE_SQL["user_features"] = _user_features_oracle_sql()


def q_winsorized_stats(sf_dir: str):
    """Winsorized (clipped) per-type value statistics — the robust mean
    tail outliers can't drag: each event value clamps to its type's
    [p05, p95] band at RANK-BASED integer thresholds (sorted-position
    floor((n−1)·p) — an actual observed cent value, so the whole clamp
    + fold is pure int64; interpolated quantile_cont thresholds would
    put a last-ulp float under a floor() and break the hash, which is
    exactly what happened to this query's first draft).
    Two passes: a (type, value) count collapse gives exact ranks (the
    `exact_quantiles_by` shuffle shape), thresholds broadcast (|types|
    bounded); one clamp map + bounded native aggregate finish."""
    import ray as _ray
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "cents": pa.array(np.round(
                batch["value"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        })

    cents = ds.map_batches(to_cents, batch_format="pyarrow").materialize()
    # (type, value) collapse → exact per-type sorted ranks from counts
    vc = cents.groupby(["event_type", "cents"]).aggregate(Count()).take_all()
    per: dict[str, list[tuple[int, int]]] = {}
    for r in vc:
        per.setdefault(r["event_type"], []).append(
            (int(r["cents"]), int(r["count()"])))
    lo, hi = {}, {}
    for t, pairs in per.items():
        pairs.sort()
        vals = np.array([v for v, _ in pairs], np.int64)
        cum = np.cumsum([c for _, c in pairs])
        n = int(cum[-1])
        for p_, out in ((0.05, lo), (0.95, hi)):
            k = int((n - 1) * p_)  # 0-based rank, mirrored float mult
            out[t] = int(vals[np.searchsorted(cum, k + 1)])
    thr_ref = _ray.put((lo, hi))

    def clamp_fold(batch: pa.Table) -> pa.Table:
        lo_, hi_ = _ray.get(thr_ref)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        v = batch["cents"].to_numpy(zero_copy_only=False)
        lov = np.array([lo_[t] for t in et], np.int64)  # |types| bounded
        hiv = np.array([hi_[t] for t in et], np.int64)
        c = np.minimum(np.maximum(v, lov), hiv)
        return pa.table({
            "event_type": batch["event_type"],
            "wq": pa.array(c.astype(np.int64)),
        })

    agg = cents.map_batches(clamp_fold, batch_format="pyarrow").groupby(
        "event_type").aggregate(Count(), Sum("wq"))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": b["count()"].cast(pa.int64()),
            "winsorized_sum_cents": b["sum(wq)"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["winsorized_stats"] = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
), t AS (
  SELECT event_type,
         max(CASE WHEN rn = CAST(floor((n - 1) * 0.05) AS BIGINT) + 1
                  THEN cents END) AS lo,
         max(CASE WHEN rn = CAST(floor((n - 1) * 0.95) AS BIGINT) + 1
                  THEN cents END) AS hi
  FROM r GROUP BY 1
), w AS (
  SELECT c.event_type,
         least(greatest(c.cents, t.lo), t.hi) AS wq
  FROM c JOIN t ON t.event_type = c.event_type
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(wq) AS BIGINT) AS winsorized_sum_cents
FROM w GROUP BY 1
"""



def q_dedup_keep_best(sf_dir: str):
    """Quality-aware exact dedup: within each 8-token-prefix duplicate
    group keep the BEST copy — longest text (tie → smallest doc_id) —
    instead of `prefix_dedup`'s min-id rule. This is the policy layer
    real corpus dedup wants (the canonical copy is usually the most
    complete one; `best_of_cluster` is the image-side analog). One
    bucketed group apply; the keep rule is a vectorized sort +
    drop_duplicates per bucket."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def keyed(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        keys = [" ".join((t or "").split(" ")[:8]) for t in texts]
        return pa.table({
            "prefix_key": pa.array(keys, pa.string()),
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_chars": batch["n_chars"].cast(pa.int64()),
        })

    def keep_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["prefix_key", "n_chars", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        sizes = g.groupby("prefix_key", sort=False)["doc_id"].transform(
            "size")
        best = g.drop_duplicates("prefix_key", keep="first").copy()
        best["dup_count"] = (
            sizes[best.index].to_numpy(np.int64) - 1)
        return pd.DataFrame({
            "prefix_key": best["prefix_key"],
            "keep_id": best["doc_id"].to_numpy(np.int64),
            "kept_chars": best["n_chars"].to_numpy(np.int64),
            "dup_count": best["dup_count"].to_numpy(np.int64),
        })

    return bucketed_group_apply(
        ds.map_batches(keyed, batch_format="pyarrow"),
        ["prefix_key"], keep_best,
    )


ORACLE_SQL["dedup_keep_best"] = """
WITH k AS (
  SELECT array_to_string(string_split(text, ' ')[1:8], ' ') AS prefix_key,
         doc_id, n_chars,
         row_number() OVER (
           PARTITION BY array_to_string(string_split(text, ' ')[1:8], ' ')
           ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (
           PARTITION BY array_to_string(string_split(text, ' ')[1:8], ' ')
         ) AS grp_n
  FROM documents
)
SELECT prefix_key, doc_id AS keep_id, n_chars AS kept_chars,
       CAST(grp_n - 1 AS BIGINT) AS dup_count
FROM k WHERE rn = 1
"""


def q_transition_pmi(sf_dir: str):
    """Pointwise mutual information of consecutive event-type transitions
    — which behavioral step-pairs co-occur more than chance (the
    collocation statistic applied to the session axis; complements raw
    `event_transitions` counts): pmi_q = floor(1e6·ln(N·c(a,b) /
    (c(a,·)·c(·,b)))) over the transition table. All counts are exact
    integers from one bucketed shuffle; the ln is ONE mirrored
    expression per (a, b) cell of the bounded |types|² domain."""
    from ray.data.aggregate import Sum

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def trans_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({
                "from_type": pd.Series(dtype=object),
                "to_type": pd.Series(dtype=object),
                "n_partial": pd.Series(dtype=np.int64),
            })
        same = u[1:] == u[:-1]
        sub = pd.DataFrame({"from_type": t[:-1][same],
                            "to_type": t[1:][same]})
        out = sub.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n_partial"})

    agg = bucketed_group_apply(ds, ["user_id"], trans_bucket).groupby(
        ["from_type", "to_type"]).aggregate(Sum("n_partial")).take_all()
    cab = {(r["from_type"], r["to_type"]): int(r["sum(n_partial)"])
           for r in agg}  # bounded |types|² domain
    n_tot = sum(cab.values())
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for (a, b), n in cab.items():
        ca[a] = ca.get(a, 0) + n
        cb[b] = cb.get(b, 0) + n
    fr, to, nn, pmi = [], [], [], []
    for (a, b), n in sorted(cab.items()):
        fr.append(a)
        to.append(b)
        nn.append(n)
        pmi.append(int(np.floor(
            1e6 * np.log(n_tot * 1.0 * n / (ca[a] * 1.0 * cb[b])))))
    return pa.table({
        "from_type": pa.array(fr, pa.string()),
        "to_type": pa.array(to, pa.string()),
        "n": pa.array(nn, pa.int64()),
        "pmi_q": pa.array(pmi, pa.int64()),
    })


ORACLE_SQL["transition_pmi"] = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), tr AS (
  SELECT prev AS from_type, event_type AS to_type, count(*) AS n
  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
), tots AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM tr
), ma AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS na FROM tr GROUP BY 1),
mb AS (SELECT to_type, CAST(sum(n) AS BIGINT) AS nb FROM tr GROUP BY 1)
SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
       CAST(floor(1e6 * ln(s.nt * 1.0 * t.n / (a.na * 1.0 * b.nb)))
            AS BIGINT) AS pmi_q
FROM tr t
JOIN ma a ON a.from_type = t.from_type
JOIN mb b ON b.to_type = t.to_type
CROSS JOIN tots s
"""


_QUOTA_N = 20


def q_quota_sample(sf_dir: str):
    """Quota sampling: exactly min(N, group size) docs per language,
    chosen by deterministic md5 order (the fixed-budget-per-stratum
    complement of `doc_stratified_sample`'s fixed-RATE draw — eval-set
    construction wants quotas, not rates). One bucketed shuffle on
    lang; per-group head after an md5-order sort — the md5 ranking is
    the same salt-hash rule every sampler here uses, so DuckDB mirrors
    it with row_number() over md5()."""
    import hashlib

    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def add_h(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = [hashlib.md5(f"quota:{int(i)}".encode()).hexdigest()[:16]
             for i in ids]
        return pa.table({
            "doc_id": pa.array(ids),
            "lang": batch["lang"],
            "h": pa.array(h, pa.string()),
        })

    def head_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return g.groupby("lang", sort=False).head(_QUOTA_N)[
            ["doc_id", "lang"]]

    return bucketed_group_apply(
        ds.map_batches(add_h, batch_format="pyarrow"),
        ["lang"], head_bucket,
    )


ORACLE_SQL["quota_sample"] = f"""
WITH h AS (
  SELECT doc_id, lang,
         substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 16) AS hv
  FROM documents
), r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
  FROM h
)
SELECT doc_id, lang FROM r WHERE rn <= {_QUOTA_N}
"""


# ---------------------------------------------------------------------------
# retrieval: maximal-marginal-relevance diverse top-k selection
# ---------------------------------------------------------------------------

_MMR_K = 5


def q_mmr_select(sf_dir: str):
    """Maximal-marginal-relevance diverse top-k (the RAG reranking
    primitive): greedily pick 5 vectors maximizing
    2·rel(v) − max_{s∈selected} dot(v, s) — relevance vs the min-vec_id
    query vector, penalty vs the already-picked set, ALL in exact
    integer dot products of floor(1e6·x)-quantized embeddings (λ=2/3
    folded into the 2·rel scaling so no float enters the argmax; ties →
    smaller vec_id; round 1 is plain relevance).

    Scale shape: each of the k rounds is one distributed argmax — the
    selected set (≤ k vectors) broadcasts, per-block kernels emit ONE
    top-1 partial row each, the driver picks among ≤ #blocks candidates
    (the `bpe_train` pattern); corpus vectors never leave their blocks.
    The oracle unrolls the identical greedy chain in MATERIALIZED
    CTEs."""
    import ray as _ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(batch: pa.Table):
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        return ids, np.floor(emb.astype(np.float64) * 1e6).astype(np.int64)

    qid = int(ds.groupby(None).min("vec_id").to_pandas()["min(vec_id)"][0])
    qrow = ds.filter(expr=f"vec_id == {qid}").take_all()
    qvec = np.floor(np.asarray(qrow[0]["embedding"], np.float64)
                    * 1e6).astype(np.int64)

    selected: "list[tuple[int, np.ndarray, int]]" = []  # (id, vec, rel)
    for _ in range(_MMR_K):
        sel_ref = _ray.put((qvec, [(i, v) for i, v, _ in selected]))

        def top1(batch: pa.Table) -> pa.Table:
            qv, sel = _ray.get(sel_ref)
            ids, q = quant(batch)
            if ids.size == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.int64()),
                                 "rel": pa.array([], pa.int64())})
            rel = q @ qv
            if sel:
                pen = np.max(
                    np.stack([q @ v for _, v in sel]), axis=0)
                score = 2 * rel - pen
            else:
                score = rel
            taken = np.isin(ids, np.array([i for i, _ in sel], np.int64))
            # sentinel must survive the -score negation below:
            # -int64.min OVERFLOWS back to itself and would sort FIRST
            score = np.where(taken, np.int64(-(2 ** 62)), score)
            # block top-1, ties → smaller id
            best = np.lexsort((ids, -score))[0]
            return pa.table({
                "vec_id": pa.array([ids[best]]),
                "score": pa.array([int(score[best])]),
                "rel": pa.array([int(rel[best])]),
            })

        parts = ds.map_batches(top1, batch_format="pyarrow").take_all()
        win = min(parts, key=lambda r: (-int(r["score"]), int(r["vec_id"])))
        wrow = ds.filter(expr=f"vec_id == {int(win['vec_id'])}").take_all()
        wvec = np.floor(np.asarray(wrow[0]["embedding"], np.float64)
                        * 1e6).astype(np.int64)
        selected.append((int(win["vec_id"]), wvec, int(win["rel"])))

    return pa.table({
        "rank": pa.array(np.arange(1, _MMR_K + 1, dtype=np.int64)),
        "vec_id": pa.array([i for i, _, _ in selected], pa.int64()),
        "rel_q": pa.array([r for _, _, r in selected], pa.int64()),
    })


def _mmr_oracle_sql() -> str:
    sql = """
WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), quant AS MATERIALIZED (
  SELECT vec_id, i, CAST(floor(1e6 * CAST(x AS DOUBLE)) AS BIGINT) AS qv
  FROM e
), qv AS MATERIALIZED (
  SELECT i, qv FROM quant
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
), rel AS MATERIALIZED (
  SELECT e2.vec_id, sum(e2.qv * q.qv) AS rel
  FROM quant e2 JOIN qv q ON q.i = e2.i GROUP BY 1
), s1 AS MATERIALIZED (
  SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id LIMIT 1
)"""
    for r in range(2, _MMR_K + 1):
        prev_sel = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, r))
        dots = []
        for j in range(1, r):
            sql += f""",
d{r}_{j} AS MATERIALIZED (
  SELECT e2.vec_id, sum(e2.qv * s.qv) AS d
  FROM quant e2 JOIN (
    SELECT i, qv FROM quant
    WHERE vec_id = (SELECT vec_id FROM s{j})
  ) s ON s.i = e2.i
  GROUP BY 1
)"""
            dots.append(f"d{r}_{j}.d")
        pen = dots[0] if len(dots) == 1 else f"greatest({', '.join(dots)})"
        joins = " ".join(
            f"JOIN d{r}_{j} ON d{r}_{j}.vec_id = r.vec_id"
            for j in range(1, r))
        sql += f""",
s{r} AS MATERIALIZED (
  SELECT r.vec_id, r.rel FROM rel r {joins}
  WHERE r.vec_id NOT IN ({prev_sel})
  ORDER BY 2 * r.rel - {pen} DESC, r.vec_id LIMIT 1
)"""
    parts = " UNION ALL ".join(
        f"SELECT {j} AS rank, vec_id, CAST(rel AS BIGINT) AS rel_q FROM s{j}"
        for j in range(1, _MMR_K + 1))
    sql += f"\n{parts}\n"
    return sql


ORACLE_SQL["mmr_select"] = _mmr_oracle_sql()


# ---------------------------------------------------------------------------
# temporal graph: time-respecting reachability (contact tracing)
# ---------------------------------------------------------------------------

_REACH_HOPS = 3
_REACH_SEED_MOD = 97


def q_temporal_reachability(sf_dir: str):
    """Time-respecting reachability over the co-presence contact graph —
    contact tracing semantics, NOT static BFS: a contact at hour t
    transmits only if the source was infected STRICTLY BEFORE t, so
    paths must move forward in time (the defining constraint of temporal
    graphs). Seeds: user_id % 97 == 0 at virtual hour 0; 3 unrolled
    rounds; a new case's infection hour is its MINIMUM valid contact
    hour; output (user_id, inf_hour, hop).

    Scale shape: contacts are the co-location cell emission (distinct
    (zone, hour, user) → in-cell pair fan-out, occupancy²-bounded per
    cell); each round is one bucketed hash join (contacts ⋈ infected on
    source) + an in-kernel time filter + a bucketed min per target + an
    ANTI join vs the infected set — Datasets end to end, the infected
    table never lands on the driver."""
    from ..stages.groupops import bucketed_aggregate, bucketed_group_apply
    from ..stages.joins import bucket_hash_join, semi_join_shuffled

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def assign(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = _formula_coords(eid)
        zone = np.full(eid.size, -1, np.int64)
        for zi, (x0, x1, y0, y1) in enumerate(_DWELL_ZONES):
            zone[(lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)] = zi
        hour = (batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 3_600_000_000)
        m = zone >= 0
        return pa.table({
            "zone": pa.array(zone[m]),
            "hour": pa.array(hour[m].astype(np.int64)),
            "user_id": batch["user_id"].filter(pa.array(m)).cast(pa.int64()),
        })

    def contact_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["zone", "hour", "user_id"])
        out_u, out_v, out_h = [], [], []
        for (_, h), cell in g.groupby(["zone", "hour"], sort=False):
            u = np.sort(cell["user_id"].to_numpy())
            if u.size < 2:
                continue
            ia, ib = np.triu_indices(u.size, k=1)
            # symmetric: both directions
            out_u += [u[ia], u[ib]]
            out_v += [u[ib], u[ia]]
            out_h += [np.full(ia.size * 2, h, np.int64)]
        if not out_u:
            return pd.DataFrame({"u": pd.Series(dtype=np.int64),
                                 "v": pd.Series(dtype=np.int64),
                                 "hour": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            "u": np.concatenate(out_u),
            "v": np.concatenate(out_v),
            "hour": np.concatenate(out_h),
        })

    contacts = bucketed_group_apply(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["zone", "hour"], contact_bucket,
    ).materialize()

    def seed_batch(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(u[u % _REACH_SEED_MOD == 0])  # vectorized seed rule
        return pa.table({
            "user_id": pa.array(u),
            "inf_hour": pa.array(np.zeros(u.size, np.int64)),
            "hop": pa.array(np.zeros(u.size, np.int64)),
        })

    infected = _distinct_users(
        ds.map_batches(
            lambda b: pa.table({
                "user_id": b["user_id"].cast(pa.int64())}),
            batch_format="pyarrow")
    ).map_batches(seed_batch, batch_format="pyarrow").materialize()

    for hop in range(1, _REACH_HOPS + 1):
        src = infected.map_batches(
            lambda b: pa.table({
                "u": b["user_id"].cast(pa.int64()),
                "src_inf": b["inf_hour"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        ).materialize()
        j = bucket_hash_join(contacts, src, "u", "u", num_buckets=16)

        def valid(batch: pa.Table) -> pa.Table:
            h = batch["hour"].to_numpy(zero_copy_only=False)
            si = batch["src_inf"].to_numpy(zero_copy_only=False)
            m = pa.array(si < h)  # strictly-forward-in-time rule
            return pa.table({
                "v": batch["v"].filter(m).cast(pa.int64()),
                "hour": batch["hour"].filter(m).cast(pa.int64()),
            })

        cand = j.map_batches(valid, batch_format="pyarrow")
        best = bucketed_aggregate(cand, ["v"], {"inf_hour": ("hour", "min")},
                                  num_buckets=16)
        fresh = semi_join_shuffled(
            best.map_batches(
                lambda b, _h=hop: pa.table({
                    "user_id": b["v"].cast(pa.int64()),
                    "inf_hour": b["inf_hour"].cast(pa.int64()),
                    "hop": pa.array(np.full(b.num_rows, _h, np.int64)),
                }),
                batch_format="pyarrow",
            ).materialize(),
            infected, "user_id", "user_id", anti=True,
        ).materialize()
        if fresh.count() == 0:
            break
        infected = infected.union(fresh).materialize()

    return infected


def _reach_oracle_sql() -> str:
    zone_sql = _zone_case_sql()
    sql = f"""
WITH coords AS (
  SELECT user_id, ts,
         -77.05 + (event_id % 1000) * 1e-4 AS lon,
         38.85 + ((event_id // 1000) % 1000) * 1e-4 AS lat
  FROM events
), pts AS (
  SELECT DISTINCT {zone_sql} AS zone,
         epoch_us(ts) // 3600000000 AS hour, user_id
  FROM coords
), z AS (SELECT * FROM pts WHERE zone IS NOT NULL),
contacts AS MATERIALIZED (
  SELECT a.user_id AS u, b.user_id AS v, a.hour
  FROM z a JOIN z b
    ON a.zone = b.zone AND a.hour = b.hour AND a.user_id <> b.user_id
), inf0 AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(0 AS BIGINT) AS inf_hour,
         CAST(0 AS BIGINT) AS hop
  FROM events WHERE user_id % {_REACH_SEED_MOD} = 0
)"""
    prev = "inf0"
    for r in range(1, _REACH_HOPS + 1):
        sql += f""",
new{r} AS MATERIALIZED (
  SELECT c.v AS user_id, CAST(min(c.hour) AS BIGINT) AS inf_hour,
         CAST({r} AS BIGINT) AS hop
  FROM contacts c JOIN {prev} i ON i.user_id = c.u AND i.inf_hour < c.hour
  WHERE c.v NOT IN (SELECT user_id FROM {prev})
  GROUP BY 1
), inf{r} AS MATERIALIZED (
  SELECT * FROM {prev} UNION ALL SELECT * FROM new{r}
)"""
        prev = f"inf{r}"
    sql += f"\nSELECT user_id, inf_hour, hop FROM {prev}\n"
    return sql


ORACLE_SQL["temporal_reachability"] = _reach_oracle_sql()


def q_late_shipments(sf_dir: str):
    """Late-shipment audit: lineitems shipped more than 30 days after
    their order date, rolled up per order month — the FK join +
    derived-interval filter + calendar rollup chain (order fulfilment
    SLA reporting). One bucketed hash join on orderkey (both sides
    pruned to 2-3 columns at the read), day arithmetic in exact integer
    days, bounded month-domain native finish."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import bucket_hash_join
    from ..stages.groupops import bucketed_aggregate  # noqa: F401

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_extendedprice"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["l_orderkey"].cast(pa.int64()),
            "ship_day": pa.array(
                batch["l_shipdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000),
            "cents": pa.array(np.round(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                * 100).astype(np.int64)),
        })

    def o_prep(batch: pa.Table) -> pa.Table:
        d_us = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = d_us // 86_400_000_000
        mon = (d_us.astype("datetime64[us]").astype("datetime64[M]")
               .astype(np.int64) + np.int64(1970 * 12 + 1))
        return pa.table({
            "k": batch["o_orderkey"].cast(pa.int64()),
            "order_day": pa.array(day.astype(np.int64)),
            "mon": pa.array(mon),
        })

    j = bucket_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow").materialize(),
        orders.map_batches(o_prep, batch_format="pyarrow").materialize(),
        "k", "k", num_buckets=32,
    )

    def late(batch: pa.Table) -> pa.Table:
        sd = batch["ship_day"].to_numpy(zero_copy_only=False)
        od = batch["order_day"].to_numpy(zero_copy_only=False)
        m = pa.array(sd - od > 30)
        return pa.table({
            "mon": batch["mon"].filter(m).cast(pa.int64()),
            "cents": batch["cents"].filter(m).cast(pa.int64()),
        })

    agg = j.map_batches(late, batch_format="pyarrow").groupby(
        "mon").aggregate(Count(), Sum("cents"))
    return agg.map_batches(
        lambda b: pa.table({
            "order_mon": b["mon"].cast(pa.int64()),
            "n_late": b["count()"].cast(pa.int64()),
            "late_cents": b["sum(cents)"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


ORACLE_SQL["late_shipments"] = """
WITH j AS (
  SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
           AS order_mon,
         epoch_us(l.l_shipdate) // 86400000000
           - epoch_us(o.o_orderdate) // 86400000000 AS lag_days,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT order_mon, CAST(count(*) AS BIGINT) AS n_late,
       CAST(sum(cents) AS BIGINT) AS late_cents
FROM j WHERE lag_days > 30 GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ML label generation: churn labels at a cutoff
# ---------------------------------------------------------------------------

_CHURN_CUTOFF = "2024-01-15"
_CHURN_HORIZON_DAYS = 1


def q_churn_labels(sf_dir: str):
    """Churn label generation — the supervised-learning companion of
    `user_features`: for every user active BEFORE the cutoff, label 1 if
    they produced NO event in the [cutoff, cutoff+horizon) window. The
    (features at t, label after t) temporal split is the leakage rule
    this op encodes; history stats (last_seen, n_events) ride along as
    the features-at-cutoff. One bucketed aggregate over the pre-cutoff
    slice + one broadcast-bounded membership flag from the horizon
    slice (distinct active users, corpus-bounded per horizon)."""
    import ray as _ray

    from ..stages.groupops import bucketed_aggregate

    cutoff_us = np.int64(pd.Timestamp(_CHURN_CUTOFF).value // 1000)
    horizon_us = cutoff_us + np.int64(
        _CHURN_HORIZON_DAYS * 86_400_000_000)
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pre(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = pa.array(ts < cutoff_us)
        return pa.table({
            "user_id": batch["user_id"].filter(m).cast(pa.int64()),
            "ts_us": batch["ts"].filter(m).cast(pa.int64()),
        })

    hist = bucketed_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["user_id"],
        {"last_seen_us": ("ts_us", "max"), "n_events": ("ts_us", "size")},
    )

    def post_users(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        act = np.unique(u[(ts >= cutoff_us) & (ts < horizon_us)])
        return pa.table({"user_id": pa.array(act)})

    active = sorted({r["user_id"] for r in ds.map_batches(
        post_users, batch_format="pyarrow").take_all()})
    active_ref = _ray.put(np.array(active, np.int64))

    def label(batch: pa.Table) -> pa.Table:
        act = _ray.get(active_ref)
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(act, u), 0, max(len(act) - 1, 0))
        is_active = (act[pos] == u) if len(act) else np.zeros(u.size, bool)
        return pa.table({
            "user_id": pa.array(u),
            "last_seen_us": batch["last_seen_us"].cast(pa.int64()),
            "n_events": batch["n_events"].cast(pa.int64()),
            "churned": pa.array((~is_active).astype(np.int64)),
        })

    return hist.map_batches(label, batch_format="pyarrow")


ORACLE_SQL["churn_labels"] = f"""
WITH pre AS (
  SELECT user_id, CAST(max(epoch_us(ts)) AS BIGINT) AS last_seen_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE ts < TIMESTAMP '{_CHURN_CUTOFF}'
  GROUP BY 1
), post AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '{_CHURN_CUTOFF}'
    AND ts < TIMESTAMP '{_CHURN_CUTOFF}'
        + INTERVAL {_CHURN_HORIZON_DAYS} DAY
)
SELECT pre.user_id, pre.last_seen_us, pre.n_events,
       CAST(CASE WHEN post.user_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS churned
FROM pre LEFT JOIN post ON post.user_id = pre.user_id
"""


def q_bounce_rate(sf_dir: str):
    """Per-user session bounce accounting: sessions (30-min-gap islands,
    the `user_sessions` rule) that contain exactly ONE event are
    bounces. Output (user_id, n_sessions, n_bounces) — the engagement-
    quality readout sessionization feeds. Same one-bucketed-shuffle plan
    as `user_sessions`, with per-session sizes recovered from the break
    flags by one extra cumsum (no second pass)."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bounce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        s = g["ts"].astype("int64").to_numpy() // 1_000_000
        u = g["user_id"].to_numpy()
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n_sessions": pd.Series(dtype=np.int64),
                                 "n_bounces": pd.Series(dtype=np.int64)})
        new_sess = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (s[1:] - s[:-1] > 1800)])
        sess_id = np.cumsum(new_sess) - 1
        sizes = np.bincount(sess_id)
        sess_user = u[new_sess]
        df = pd.DataFrame({"user_id": sess_user,
                           "one": (sizes == 1).astype(np.int64)})
        out = df.groupby("user_id", as_index=False).agg(
            n_sessions=("one", "size"), n_bounces=("one", "sum"))
        return out.astype(np.int64)

    return bucketed_group_apply(ds, ["user_id"], bounce_bucket)


ORACLE_SQL["bounce_rate"] = """
WITH t AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts) AS p
  FROM events
), flagged AS (
  SELECT user_id, s,
         CASE WHEN p IS NULL OR s - p > 1800 THEN 1 ELSE 0 END AS brk
  FROM t
), sess AS (
  SELECT user_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), sized AS (
  SELECT user_id, sid, count(*) AS n FROM sess GROUP BY 1, 2
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_bounces
FROM sized GROUP BY 1
"""


def q_langid_kappa(sf_dir: str):
    """Cohen's kappa between the heuristic language-ID prediction and
    the labeled language — the chance-corrected upgrade of
    `lang_confusion`'s raw matrix, and the label-QA scalar an annotation
    pipeline gates on. Entirely exact integers:
    kappa = (N·agree − Σᵢ rowᵢ·colᵢ) / (N² − Σᵢ rowᵢ·colᵢ) — emitted as
    (num, den) plus ONE mirrored float division rounded to 6. Bounded
    |langs|² native aggregate; nothing else."""
    from ray.data.aggregate import Count

    from ..stages.textstats import langid_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pred = ds.map_batches(langid_batch, batch_format="pyarrow")
    conf = pred.groupby(["lang", "lang_pred"]).aggregate(Count()).take_all()
    cells = {(r["lang"], r["lang_pred"]): int(r["count()"]) for r in conf}
    n = sum(cells.values())
    agree = sum(v for (a, b), v in cells.items() if a == b)
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    for (a, b), v in cells.items():
        rows[a] = rows.get(a, 0) + v
        cols[b] = cols.get(b, 0) + v
    rc = sum(rows[k] * cols.get(k, 0) for k in rows)
    num = n * agree - rc
    den = n * n - rc
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_agree": pa.array([agree], pa.int64()),
        "kappa_num": pa.array([num], pa.int64()),
        "kappa_den": pa.array([den], pa.int64()),
        "kappa": pa.array([round(num / den, 6)], pa.float64()),
    })


def _langid_kappa_oracle_sql() -> str:
    # reuse the proven marker-argmax prediction CTE from lang_confusion
    base = ORACLE_SQL["lang_confusion"]
    # lang_confusion's final SELECT produces (lang, lang_pred, n) — wrap it
    return f"""
WITH conf AS ({base}),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
               CAST(sum(CASE WHEN declared_lang = detected_lang
                             THEN n_docs ELSE 0 END) AS BIGINT) AS agree
        FROM conf),
r AS (SELECT declared_lang AS k, CAST(sum(n_docs) AS BIGINT) AS rn
      FROM conf GROUP BY 1),
c AS (SELECT detected_lang AS k, CAST(sum(n_docs) AS BIGINT) AS cn
      FROM conf GROUP BY 1),
rc AS (SELECT CAST(sum(r.rn * c.cn) AS BIGINT) AS v
       FROM r JOIN c ON c.k = r.k)
SELECT t.nn AS n_docs, t.agree AS n_agree,
       CAST(t.nn * t.agree - rc.v AS BIGINT) AS kappa_num,
       CAST(t.nn * t.nn - rc.v AS BIGINT) AS kappa_den,
       round((t.nn * t.agree - rc.v) * 1.0 / (t.nn * t.nn - rc.v), 6)
         AS kappa
FROM tot t CROSS JOIN rc
"""


ORACLE_SQL["langid_kappa"] = _langid_kappa_oracle_sql()


def q_davies_bouldin(sf_dir: str):
    """Davies–Bouldin cluster-quality index over the labeled embeddings
    — the compactness/separation diagnostic for a clustering or a label
    set (lower = tighter, better-separated): per label pair,
    similarity = (s_i + s_j) / d(c_i, c_j) with s = mean point-to-
    centroid distance and d = centroid distance; DB = mean over labels
    of the worst pair. Everything derives from the (label × dim)
    integer moment table (quantized floor(1e6·x) sums — the
    `fisher_ratio` fold); the float finish is a FIXED-ORDER chain per
    bounded label pair, with sqrt of exact operands.

    Output: one row per label — (label, worst_other, db_term) — plus
    the index as a mirrored round-6 mean; bounded |labels|² work after
    one fixed-size-partial aggregate."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def moments(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        emb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        q = np.floor(emb.astype(np.float64) * 1e6).astype(np.int64)
        dim = q.shape[1]
        labs = np.repeat(lab, dim)
        dims = np.tile(np.arange(dim, dtype=np.int64), len(lab))
        return pa.table({
            "label": pa.array(labs),
            "d": pa.array(dims),
            "s": pa.array(q.ravel()),
            "s2": pa.array((q * q).ravel()),
            "one": pa.array(np.ones(labs.size, np.int64)),
        })

    rows = ds.map_batches(moments, batch_format="pyarrow").groupby(
        ["label", "d"]).aggregate(Sum("s"), Sum("s2"), Sum("one")).take_all()
    per: dict[int, dict[int, tuple[int, int, int]]] = {}
    for r in rows:
        per.setdefault(int(r["label"]), {})[int(r["d"])] = (
            int(r["sum(s)"]), int(r["sum(s2)"]), int(r["sum(one)"]))
    labels = sorted(per)
    dims = sorted(per[labels[0]])
    # per-label scatter s_i = sqrt(mean ||x - c||²) from exact moments:
    # mean ||x||² − ||c||² per dim, fixed dim order
    scat = {}
    cent = {}
    for la in labels:
        tot = 0.0
        cvec = []
        for d in dims:
            s1, ss, n = per[la][d]
            m = s1 / n
            cvec.append(m)
            tot += ss / n - m * m
        scat[la] = np.sqrt(tot)
        cent[la] = cvec
    lab_out, worst_out, term_out = [], [], []
    for la in labels:
        best = None
        for lb in labels:
            if lb == la:
                continue
            dd = 0.0
            for k in range(len(dims)):
                diff = cent[la][k] - cent[lb][k]
                dd += diff * diff
            sim = (scat[la] + scat[lb]) / np.sqrt(dd)
            if best is None or sim > best[0] or (
                    sim == best[0] and lb < best[1]):
                best = (sim, lb)
        lab_out.append(la)
        worst_out.append(best[1])
        term_out.append(round(float(best[0]), 6))
    return pa.table({
        "label": pa.array(lab_out, pa.int64()),
        "worst_other": pa.array(worst_out, pa.int64()),
        "db_term": pa.array(term_out, pa.float64()),
    })


ORACLE_SQL["davies_bouldin"] = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings
), q AS (
  SELECT label, d, CAST(floor(1e6 * CAST(x AS DOUBLE)) AS BIGINT) AS qv
  FROM e
), m AS (
  SELECT label, d,
         CAST(sum(qv) AS BIGINT) AS s,
         CAST(sum(qv * qv) AS BIGINT) AS ss,
         CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY 1, 2
), scat AS (
  SELECT label, sqrt(sum(ss / n - (s / n) * (s / n))) AS sc
  FROM m GROUP BY 1
), cd AS (
  SELECT a.label AS la, b.label AS lb,
         sqrt(sum((a.s / a.n - b.s / b.n) * (a.s / a.n - b.s / b.n)))
           AS dist
  FROM m a JOIN m b ON a.d = b.d AND a.label <> b.label
  GROUP BY 1, 2
), sim AS (
  SELECT cd.la, cd.lb, (sa.sc + sb.sc) / cd.dist AS sim
  FROM cd JOIN scat sa ON sa.label = cd.la
          JOIN scat sb ON sb.label = cd.lb
), pick AS (
  SELECT la, lb, sim,
         row_number() OVER (PARTITION BY la ORDER BY sim DESC, lb) AS rn
  FROM sim
)
SELECT la AS label, lb AS worst_other, round(sim, 6) AS db_term
FROM pick WHERE rn = 1
"""


def q_score_percentiles(sf_dir: str):
    """Per-source rank normalization (score calibration): each document's
    length score mapped to its percentile WITHIN its source —
    percent_rank semantics ((rank−1)/(n−1), ties share the rank), the
    standard move before mixing heterogeneous source scores. Plan: one
    (source, value) count collapse (shuffle volume = distinct pairs, the
    `exact_quantiles_by` shape), per-source cumulative counts give every
    distinct value its rank, and a bucketed join maps docs to
    percentiles — the per-doc float is ONE mirrored division rounded to
    6."""
    from ray.data.aggregate import Count

    from ..stages.joins import bucket_hash_join

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    vc = ds.groupby(["source", "n_chars"]).aggregate(Count()).take_all()
    per: dict[str, list[tuple[int, int]]] = {}
    for r in vc:
        per.setdefault(r["source"], []).append(
            (int(r["n_chars"]), int(r["count()"])))
    rank_rows = {"source": [], "n_chars": [], "rnk": [], "n_src": []}
    for src, pairs in per.items():  # bounded: distinct (source, value)
        pairs.sort()
        n = sum(c for _, c in pairs)
        cum = 0
        for v, c in pairs:
            rank_rows["source"].append(src)
            rank_rows["n_chars"].append(v)
            rank_rows["rnk"].append(cum + 1)  # rank() tie rule
            rank_rows["n_src"].append(n)
            cum += c
    import ray.data as _rd

    ranks = _rd.from_arrow(pa.table({
        "source": pa.array(rank_rows["source"], pa.string()),
        "nc": pa.array(rank_rows["n_chars"], pa.int64()),
        "rnk": pa.array(rank_rows["rnk"], pa.int64()),
        "n_src": pa.array(rank_rows["n_src"], pa.int64()),
    })).map_batches(
        lambda b: b.append_column(
            "k",
            pa.array([f"{s}\x1f{v}" for s, v in
                      zip(b["source"].to_pylist(), b["nc"].to_pylist())],
                     pa.string())),
        batch_format="pyarrow",
    ).materialize()

    keyed = ds.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "k": pa.array([f"{s}\x1f{v}" for s, v in
                           zip(b["source"].to_pylist(),
                               b["n_chars"].to_pylist())], pa.string()),
        }),
        batch_format="pyarrow",
    ).materialize()
    j = bucket_hash_join(keyed, ranks, "k", "k", num_buckets=16)

    def finish(batch: pa.Table) -> pa.Table:
        r = batch["rnk"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n_src"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "source": batch["source"],
            "pct": pa.array(np.round((r - 1.0) / (n - 1.0), 6)),
        })

    return j.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["score_percentiles"] = """
SELECT doc_id, source,
       round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
         AS pct
FROM documents
"""


def q_survival_km(sf_dir: str):
    """Kaplan–Meier survival of time-to-first-purchase — the survival-
    analysis family: per user, duration = days from first event to first
    purchase, right-censored at the last observed day when no purchase
    happened. Output one row per event day with the EXACT integer KM
    ingredients (n_at_risk, n_deaths) plus the cumulative quantized
    log-survival Σ floor(1e6·ln((n−d)/n)) over days ≤ t — per-day terms
    quantize BEFORE the prefix, so the fold is an order-free int sum and
    the oracle's window SUM matches bit-for-bit (days with n = d would
    put ln(0) in the chain; they terminate the curve and are excluded,
    WHERE-mirrored). Per-user reductions are one bucketed aggregate; the
    day domain is calendar-bounded, so the curve itself is driver-safe."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"dur": pd.Series(dtype=np.int64),
                                 "event": pd.Series(dtype=np.int64)})
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        day = g["ts"].astype("int64").to_numpy() // 86_400_000_000
        u = g["user_id"].to_numpy()
        is_p = (g["event_type"].to_numpy() == "purchase")
        out_dur, out_evt = [], []
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.concatenate([starts[1:], [len(g)]])
        for s, e in zip(starts, ends):
            d0 = day[s]
            p = np.flatnonzero(is_p[s:e])
            if p.size:
                out_dur.append(day[s + p[0]] - d0)
                out_evt.append(1)
            else:
                out_dur.append(day[e - 1] - d0)
                out_evt.append(0)
        return pd.DataFrame({"dur": np.asarray(out_dur, np.int64),
                             "event": np.asarray(out_evt, np.int64)})

    rows = bucketed_group_apply(ds, ["user_id"], per_user).take_all()
    dur = np.array([r["dur"] for r in rows], np.int64)
    evt = np.array([r["event"] for r in rows], np.int64)
    days = np.unique(dur[evt == 1])
    out_day, out_n, out_d, out_log = [], [], [], []
    cum = 0
    for t in days:  # calendar-bounded loop
        n_risk = int((dur >= t).sum())
        d_t = int(((dur == t) & (evt == 1)).sum())
        if n_risk <= d_t:
            break  # curve hits zero — ln(0) undefined, terminate
        cum += int(np.floor(1e6 * np.log((n_risk - d_t) * 1.0 / n_risk)))
        out_day.append(int(t))
        out_n.append(n_risk)
        out_d.append(d_t)
        out_log.append(cum)
    return pa.table({
        "day": pa.array(out_day, pa.int64()),
        "n_at_risk": pa.array(out_n, pa.int64()),
        "n_deaths": pa.array(out_d, pa.int64()),
        "km_logq": pa.array(out_log, pa.int64()),
    })


ORACLE_SQL["survival_km"] = """
WITH per AS (
  SELECT user_id,
         min(epoch_us(ts)) // 86400000000 AS d0,
         max(epoch_us(ts)) // 86400000000 AS dlast,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) // 86400000000 END) AS dp
  FROM events GROUP BY 1
), su AS (
  SELECT CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dlast - d0 END AS dur,
         CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per
), days AS (
  SELECT DISTINCT dur AS day FROM su WHERE event = 1
), km AS (
  SELECT d.day,
         (SELECT count(*) FROM su WHERE su.dur >= d.day) AS n_at_risk,
         (SELECT count(*) FROM su
          WHERE su.dur = d.day AND su.event = 1) AS n_deaths
  FROM days d
), terms AS (
  SELECT day, n_at_risk, n_deaths,
         CAST(floor(1e6 * ln((n_at_risk - n_deaths) * 1.0 / n_at_risk))
              AS BIGINT) AS term
  FROM km WHERE n_at_risk > n_deaths
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(n_deaths AS BIGINT) AS n_deaths,
       CAST(sum(term) OVER (ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS km_logq
FROM terms
"""


def q_stratified_ate(sf_dir: str):
    """Stratified average-treatment-effect readout — the causal-inference
    family: treatment = user produced ≥1 signup event, outcome = the
    user's total purchase value, strata = user_id % 5 (the deterministic
    stand-in for a propensity bucket). Per stratum: exact integer arm
    sums/counts plus ate_q = floor(1e6·(ȳ_t − ȳ_c)) with each arm mean a
    single mirrored division — the within-stratum difference estimator
    (what IPW reduces to under discrete strata). Per-user reductions are
    one bucketed aggregate; strata are a bounded native finish."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "treated": pd.Series(dtype=np.int64),
                                 "y_cents": pd.Series(dtype=np.int64)})
        et = g["event_type"].to_numpy()
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        sub = pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "t": (et == "signup").astype(np.int64),
            "y": np.where(et == "purchase", cents, 0),
        })
        out = sub.groupby("user_id", as_index=False).agg(
            treated=("t", "max"), y_cents=("y", "sum"))
        return out.astype(np.int64)

    users = bucketed_group_apply(ds, ["user_id"], per_user).take_all()
    uid = np.array([r["user_id"] for r in users], np.int64)
    tr = np.array([r["treated"] for r in users], np.int64)
    y = np.array([r["y_cents"] for r in users], np.int64)
    s = uid % 5
    rows = {"stratum": [], "n_treat": [], "n_ctrl": [],
            "y_treat_cents": [], "y_ctrl_cents": [], "ate_q": []}
    for st in sorted(set(s.tolist())):  # bounded strata loop
        m = s == st
        nt = int((tr[m] == 1).sum())
        nc = int((tr[m] == 0).sum())
        yt = int(y[m][tr[m] == 1].sum())
        yc = int(y[m][tr[m] == 0].sum())
        if nt == 0 or nc == 0:
            continue  # stratum without both arms has no contrast
        ate = int(np.floor(1e6 * (yt * 1.0 / nt - yc * 1.0 / nc)))
        rows["stratum"].append(st)
        rows["n_treat"].append(nt)
        rows["n_ctrl"].append(nc)
        rows["y_treat_cents"].append(yt)
        rows["y_ctrl_cents"].append(yc)
        rows["ate_q"].append(ate)
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


ORACLE_SQL["stratified_ate"] = """
WITH per AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS treated,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y_cents
  FROM events GROUP BY 1
), arms AS (
  SELECT user_id % 5 AS stratum, treated,
         count(*) AS n, CAST(sum(y_cents) AS BIGINT) AS ysum
  FROM per GROUP BY 1, 2
), wide AS (
  SELECT t.stratum,
         CAST(t.n AS BIGINT) AS n_treat, CAST(c.n AS BIGINT) AS n_ctrl,
         t.ysum AS y_treat_cents, c.ysum AS y_ctrl_cents
  FROM arms t JOIN arms c
    ON c.stratum = t.stratum AND t.treated = 1 AND c.treated = 0
)
SELECT stratum, n_treat, n_ctrl, y_treat_cents, y_ctrl_cents,
       CAST(floor(1e6 * (y_treat_cents * 1.0 / n_treat
                         - y_ctrl_cents * 1.0 / n_ctrl)) AS BIGINT)
         AS ate_q
FROM wide
"""


def q_burstiness(sf_dir: str):
    """Per-user temporal burstiness B = (σ−μ)/(σ+μ) over inter-event
    gaps (Goh–Barabási): B→−1 periodic, 0 Poisson, →1 bursty — the
    temporal-pattern feature behind bot/anomaly detection. Gap moments
    are EXACT integers (second-quantized gaps, Σg and Σg² folds); σ and
    the final ratio are ONE mirrored float chain per user (sqrt of
    exact operands, round 6). Users with < 5 gaps emit nothing. One
    bucketed shuffle; per-user math is vectorized run arithmetic."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype=np.int64),
            "n_gaps": pd.Series(dtype=np.int64),
            "sum_gap_s": pd.Series(dtype=np.int64),
            "sum_gap2_s": pd.Series(dtype=np.int64),
            "burstiness": pd.Series(dtype=np.float64),
        })
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        s = g["ts"].astype("int64").to_numpy() // 1_000_000
        gap = s[1:] - s[:-1]
        same = u[1:] == u[:-1]
        users, starts = np.unique(u, return_index=True)
        ends = np.concatenate([starts[1:], [len(g)]])
        rows = {"user_id": [], "n_gaps": [], "sum_gap_s": [],
                "sum_gap2_s": [], "burstiness": []}
        for uu, st, en in zip(users, starts, ends):
            m = same[st:en - 1] if en - 1 > st else np.zeros(0, bool)
            gg = gap[st:en - 1][m]
            if gg.size < 5:
                continue
            n = int(gg.size)
            s1 = int(gg.sum())
            s2 = int((gg.astype(object) ** 2).sum())
            mu = s1 / n
            var = s2 / n - mu * mu
            sd = np.sqrt(var)
            rows["user_id"].append(int(uu))
            rows["n_gaps"].append(n)
            rows["sum_gap_s"].append(s1)
            rows["sum_gap2_s"].append(s2)
            rows["burstiness"].append(round((sd - mu) / (sd + mu), 6))
        return pd.DataFrame({
            "user_id": pd.Series(rows["user_id"], dtype=np.int64),
            "n_gaps": pd.Series(rows["n_gaps"], dtype=np.int64),
            "sum_gap_s": pd.Series(rows["sum_gap_s"], dtype=np.int64),
            "sum_gap2_s": pd.Series(rows["sum_gap2_s"], dtype=np.int64),
            "burstiness": pd.Series(rows["burstiness"], dtype=np.float64),
        })

    return bucketed_group_apply(ds, ["user_id"], stats)


ORACLE_SQL["burstiness"] = """
WITH t AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
         lag(CAST(epoch_us(ts) // 1000000 AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
  FROM events
), gaps AS (
  SELECT user_id, s - p AS gap FROM t WHERE p IS NOT NULL
), m AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS sum_gap_s,
         CAST(sum(gap * gap) AS BIGINT) AS sum_gap2_s
  FROM gaps GROUP BY 1 HAVING count(*) >= 5
)
SELECT user_id, n_gaps, sum_gap_s, sum_gap2_s,
       round((sqrt(sum_gap2_s * 1.0 / n_gaps
                   - (sum_gap_s * 1.0 / n_gaps)
                     * (sum_gap_s * 1.0 / n_gaps))
              - sum_gap_s * 1.0 / n_gaps)
             / (sqrt(sum_gap2_s * 1.0 / n_gaps
                     - (sum_gap_s * 1.0 / n_gaps)
                       * (sum_gap_s * 1.0 / n_gaps))
                + sum_gap_s * 1.0 / n_gaps), 6) AS burstiness
FROM m
"""


def q_order_batches(sf_dir: str):
    """Order-consolidation proposal: a customer's orders within 3 days of
    the previous one merge into a shipping batch (gap-island
    sessionization on the ORDERS axis — same island rule as
    `user_sessions`, different table and a money rollup). Output per
    batch: (custkey, batch_start_day, n_orders, total_cents). One
    bucketed shuffle on custkey; islands recovered with vectorized run
    arithmetic; exact integer days/cents."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])

    def batches(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "custkey": pd.Series(dtype=np.int64),
                "batch_start_day": pd.Series(dtype=np.int64),
                "n_orders": pd.Series(dtype=np.int64),
                "total_cents": pd.Series(dtype=np.int64),
            })
        g = g.sort_values(["o_custkey", "o_orderdate"], kind="mergesort")
        u = g["o_custkey"].to_numpy()
        day = g["o_orderdate"].astype("int64").to_numpy() // 86_400_000_000
        cents = np.round(
            g["o_totalprice"].to_numpy() * 100).astype(np.int64)
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (day[1:] - day[:-1] > 3)])
        bid = np.cumsum(brk) - 1
        n = np.bincount(bid)
        tot = np.bincount(bid, weights=cents.astype(np.float64)).astype(
            np.int64)  # cents ≤ 5e7 per order × ≤ batch — float64 exact
        return pd.DataFrame({
            "custkey": u[brk].astype(np.int64),
            "batch_start_day": day[brk].astype(np.int64),
            "n_orders": n.astype(np.int64),
            "total_cents": tot,
        })

    return bucketed_group_apply(ds, ["o_custkey"], batches)


ORACLE_SQL["order_batches"] = """
WITH t AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         lag(epoch_us(o_orderdate) // 86400000000)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS p
  FROM orders
), flagged AS (
  SELECT o_custkey, day, cents,
         CASE WHEN p IS NULL OR day - p > 3 THEN 1 ELSE 0 END AS brk
  FROM t
), isl AS (
  SELECT o_custkey, day, cents,
         sum(brk) OVER (PARTITION BY o_custkey ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS bid
  FROM flagged
)
SELECT o_custkey AS custkey,
       CAST(min(day) AS BIGINT) AS batch_start_day,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM isl GROUP BY o_custkey, bid
"""
