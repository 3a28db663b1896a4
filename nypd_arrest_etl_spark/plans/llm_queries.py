"""LLM-data-pipeline query inventory: dedup, similarity search, text
analysis, multimodal plumbing — each over the driver's ``documents``
and ``embeddings`` tables, with a DuckDB oracle wherever the semantics
are SQL-expressible. The MinHash/SimHash sketches are built on a
portable md5-derived hash and the LSH ANN's hyperplanes come from an
explicit LCG embedded as literals, so even their candidate-recall
behavior is replayed bit-for-bit by generated SQL oracles; the
multimodal fake kernels reduce to byte arithmetic the oracle recomputes
from the ASCII corpus; winnowing fingerprints use the portable gram
hash, so the sliding-window minima replay exactly. Only genuinely
engine-internal ops remain rows-only — IVF (driver k-means), BPE
(iterative), native HLL/KLL sketches — with exactness unit tests in
tests/test_dedup.py / test_text.py against the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators import dedup as D
from nypd_arrest_etl_spark.operators import multimodal as M
from nypd_arrest_etl_spark.operators import similarity as SIM
from nypd_arrest_etl_spark.operators import text as TX
from nypd_arrest_etl_spark.operators import web as WB
from nypd_arrest_etl_spark.plans.queries import t

# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_exact(t(spark, sf_dir, "documents"))


ORACLE_DEDUP_EXACT = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word 4-gram shingles: on short synthetic docs (tiny vocab) the
    standard 4-5 word shingle makes prefix filtering selective (bigram
    shingles leave every posting hot: 264x more candidate pairs for the
    same qualifying pair set)."""
    return D.jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.8, n=4)


# Naive exact oracle (all-pairs via shingle join) — the Spark side uses
# prefix filtering but must return the identical pair set.
ORACLE_JACCARD_PAIRS = """
WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS l FROM documents),
big AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] AS sh
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l)-3)) AS i) t),
sz AS (SELECT doc_id, count(*) AS n FROM big GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
          FROM big a JOIN big b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id1 AS doc_id_1, id2 AS doc_id_2,
       round(i * 1.0 / (x.n + y.n - i), 6) AS jaccard
FROM inter JOIN sz x ON x.doc_id = id1 JOIN sz y ON y.doc_id = id2
WHERE round(i * 1.0 / (x.n + y.n - i), 6) >= 0.8
"""


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(t(spark, sf_dir, "documents"), threshold=0.8, n=4)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(t(spark, sf_dir, "documents"), max_hamming=3, n=4)


# Shared shingle CTEs for the sketch oracles: word 4-gram shingles,
# distinct per doc — the same sets with_shingles(n=4) builds.
_SHINGLE_CTES = """toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS l FROM documents),
sh AS (SELECT DISTINCT doc_id, l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3] AS s
       FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l)-3)) AS i) t)"""


def _minhash_oracle_sql(threshold: float = 0.8, num_perm: int = 64, bands: int = 16) -> str:
    """DuckDB twin of minhash_lsh_pairs: the portable md5-based base
    hash and the SAME affine-permutation coefficients (generated from
    one Python source of truth, dedup.minhash_coeffs) replay the
    signatures bit-for-bit; banding compares the signature slices with
    list equality; candidates verify with exact Jaccard — so the
    oracle reproduces the LSH recall behavior exactly, not just the
    idealized all-pairs answer."""
    rows = num_perm // bands
    mins = ",\n              ".join(
        f"min((x * {a} + {b}) % 4294967296) AS s{i}"
        for i, (a, b) in enumerate(D.minhash_coeffs(num_perm))
    )
    band_lists = ", ".join(
        "[" + ", ".join(f"s{b * rows + j}" for j in range(rows)) + "]"
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLE_CTES},
hx AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 1073741824 AS x FROM sh),
sig AS (SELECT doc_id, {mins} FROM hx GROUP BY doc_id),
bl AS (SELECT doc_id, [{band_lists}] AS bands FROM sig),
bk AS (SELECT doc_id, i AS band_idx, bands[i] AS band
       FROM bl, LATERAL (SELECT unnest(generate_series(1, {bands})) AS i) t),
cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         FROM bk a JOIN bk b
           ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT id1, id2, count(*) AS i
          FROM cand JOIN sh x ON x.doc_id = id1 JOIN sh y ON y.doc_id = id2 AND x.s = y.s
          GROUP BY 1, 2)
SELECT id1 AS doc_id_1, id2 AS doc_id_2,
       round(i * 1.0 / (nx.n + ny.n - i), 6) AS jaccard
FROM inter JOIN sz nx ON nx.doc_id = id1 JOIN sz ny ON ny.doc_id = id2
WHERE round(i * 1.0 / (nx.n + ny.n - i), 6) >= {threshold}
"""


def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB twin of simhash_pairs: per-bit majority votes as 60
    conditional sums over the portable base hash, packed into one
    BIGINT, 4x15-bit band OR-join, bit_count(xor) verify."""
    nbits = D._SIMHASH_BITS
    bbits = D._SIMHASH_BAND_BITS
    mask = D._SIMHASH_BAND_MASK
    csums = ",\n              ".join(
        f"sum(((h >> {k}) & 1) * 2 - 1) AS c{k}" for k in range(nbits)
    )
    pack = "\n         + ".join(
        f"(CASE WHEN c{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(nbits)
    )
    bandcond = " OR ".join(
        f"((a.sig >> {b * bbits}) & {mask}) = ((b.sig >> {b * bbits}) & {mask})"
        for b in range(D._SIMHASH_BANDS)
    )
    return f"""
WITH {_SHINGLE_CTES},
hx AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
cnt AS (SELECT doc_id, {csums} FROM hx GROUP BY doc_id),
sig AS (SELECT doc_id, {pack} AS sig FROM cnt)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       bit_count(xor(a.sig, b.sig))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({bandcond})
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
"""


ORACLE_MINHASH_PAIRS = _minhash_oracle_sql()
ORACLE_SIMHASH_PAIRS = _simhash_oracle_sql()


def q_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_neardup_pairs(t(spark, sf_dir, "embeddings"), threshold=0.4)


ORACLE_EMBEDDING_PAIRS = """
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split of the documents table by doc_id parity; flags
    train docs sharing word 3-grams with the test corpus."""
    docs = t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    return D.ngram_contamination(train, test, n=3)


ORACLE_CONTAMINATION = """
WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS l FROM documents),
grams AS (
  SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 2)) AS i) t
),
tr AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 2 = 0),
te AS (SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 1)
SELECT tr.doc_id, count(*) AS n_grams, count(te.g) AS n_hits,
       round(count(te.g) * 1.0 / count(*), 6) AS contamination
FROM tr LEFT JOIN te USING (g)
GROUP BY tr.doc_id
"""


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact-Jaccard pair graph:
    (doc_id, cluster_rep) for every doc in a near-dup cluster.
    Iterative min-label propagation; oracle replays it with a
    recursive CTE."""
    pairs = D.jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.8, n=4)
    return D.connected_components(pairs)


ORACLE_NEARDUP_CLUSTERS = """
WITH RECURSIVE toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS l FROM documents),
big AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] AS sh
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l)-3)) AS i) t),
sz AS (SELECT doc_id, count(*) AS n FROM big GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
          FROM big a JOIN big b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (
  SELECT id1, id2 FROM inter
  JOIN sz x ON x.doc_id = id1 JOIN sz y ON y.doc_id = id2
  WHERE round(i * 1.0 / (x.n + y.n - i), 6) >= 0.8
),
edges AS (SELECT id1 AS a, id2 AS b FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
)
SELECT node AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


ORACLE_SIMILARITY_TOPK = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 10
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return SIM.ann_lsh_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


def _ann_lsh_oracle_sql(
    k: int = 5, n_planes: int = 8, rotations: int = 4, dim: int = 64
) -> str:
    """DuckDB twin of ann_lsh_topk: the hyperplanes come from the SAME
    explicit-LCG generator (similarity._hyperplanes — every coefficient
    is a dyadic rational, exactly representable), embedded as double
    literals; bucket bits are dot-product signs, candidates share a
    bucket in any rotation, exact cosine (rounded like the engine, so
    the rank order keys match) ranks with neighbor-id tie-break. The
    oracle therefore replays the LSH recall behavior, not an idealized
    exact top-k."""
    from nypd_arrest_etl_spark.operators.similarity import _hyperplanes

    def bucket_expr(r: int) -> str:
        planes = _hyperplanes(dim, n_planes, seed=42 + r)
        terms = []
        for p, row in enumerate(planes):
            lit = "[" + ", ".join(repr(x) for x in row) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(v, {lit}) >= 0 "
                f"THEN {1 << (n_planes - 1 - p)} ELSE 0 END)"
            )
        return " + ".join(terms)

    rot_buckets = ",\n       ".join(
        f"({bucket_expr(r)}) AS b{r}" for r in range(rotations)
    )
    share = " OR ".join(f"q.b{r} = c.b{r}" for r in range(rotations))
    return f"""
WITH vv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bk AS (SELECT vec_id, v,
       {rot_buckets}
       FROM vv),
cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                round(list_cosine_similarity(q.v, c.v), 6) AS cosine
         FROM bk q JOIN bk c
           ON q.vec_id < 10 AND q.vec_id <> c.vec_id AND ({share})),
r AS (SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM cand)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {k}
"""


ORACLE_ANN_LSH = _ann_lsh_oracle_sql()


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN (approximate by design: nprobe of
    n_cells cells scanned per query — rows-only check; exactness at
    full probe and cluster recall are unit-tested in
    tests/test_similarity.py)."""
    emb = t(spark, sf_dir, "embeddings")
    return SIM.ann_ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_cells=16, nprobe=4
    )


def q_similarity_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized brute-force top-k. Fully SQL-expressible (the
    quantizer is floor(x/scale + 0.5), a pure float expression), so
    unlike the LSH/IVF sketches this scale path gets a value-hash
    oracle, not just a rows check."""
    emb = t(spark, sf_dir, "embeddings")
    return SIM.ann_quantized_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


ORACLE_SIMILARITY_QUANTIZED = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS maxabs
  FROM embeddings),
qq AS (
  SELECT vec_id,
         list_transform(v, x -> floor(x / (CASE WHEN maxabs > 0
                 THEN maxabs / 127.0 ELSE 1.0 END) + 0.5)) AS qv
  FROM base),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.qv, b.qv), 6) AS cosine
  FROM qq a JOIN qq b ON a.vec_id != b.vec_id
  WHERE a.vec_id < 10),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC + casefold + whitespace-collapse normalization; the norm
    text is summarized (length + token count) so the oracle hash
    stays value-stable while still covering every output string."""
    n = TX.normalize_text(t(spark, sf_dir, "documents"))
    return n.select(
        "doc_id",
        "norm_text",
        F.length("norm_text").alias("n_chars"),
        F.size(F.split(F.col("norm_text"), " ")).alias("n_tokens"),
    )


ORACLE_TEXT_NORMALIZE = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm_text
  FROM documents)
SELECT doc_id, norm_text,
       CAST(length(norm_text) AS INT) AS n_chars,
       CAST(len(string_split(norm_text, ' ')) AS INT) AS n_tokens
FROM n
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """512-char chunks with 64-char overlap (step 448) — retrieval/
    embedding units with guaranteed coverage."""
    return TX.chunk_documents(
        t(spark, sf_dir, "documents"), chunk_chars=512, overlap=64
    )


ORACLE_CHUNK_DOCUMENTS = """
SELECT doc_id,
       CAST((start - 1) / 448 AS INT) AS chunk_ix,
       substring(text, CAST(start AS INT), 512) AS chunk_text,
       CAST(length(substring(text, CAST(start AS INT), 512)) AS INT) AS chunk_chars
FROM documents,
     LATERAL (SELECT unnest(generate_series(1, greatest(length(text) - 64, 1), 448)) AS start) s
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules repetition signals: duplicated-3-gram fraction and
    modal-3-gram share per document."""
    return TX.repetition_stats(t(spark, sf_dir, "documents"), n=3)


ORACLE_REPETITION_STATS = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     x -> x != '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(list_slice(toks, i, i + 2), ' '))
         ELSE [] END AS grams
  FROM base),
cnt AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
  GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(sum(c) AS INT) AS n_grams, count(*) AS n_uniq,
         max(c) AS top_c
  FROM cnt GROUP BY 1)
SELECT g.doc_id, CAST(n_tokens AS INT) AS n_tokens,
       coalesce(n_grams, 0) AS n_grams,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN round((n_grams - n_uniq) * 1.0 / n_grams, 6) ELSE 0.0 END
         AS dup_gram_frac,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN round(top_c * 1.0 / n_grams, 6) ELSE 0.0 END
         AS top_gram_frac
FROM g LEFT JOIN agg USING (doc_id)
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.text_stats(t(spark, sf_dir, "documents"))


ORACLE_TEXT_STATS = r"""
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks, length(text) AS nc
  FROM documents
)
SELECT doc_id,
       nc AS n_chars,
       len(toks) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       len(list_distinct(toks)) AS n_uniq_tokens,
       round(len(list_filter(toks, x -> list_contains(
             ['the','a','of','and','to','in','is','it'], lower(x)))) * 1.0 / len(toks), 6)
         AS stopword_ratio,
       round((nc - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0 / nc, 6)
         AS alpha_ratio,
       round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / nc, 6)
         AS punct_ratio,
       round(nc * 1.0 / len(toks), 6) AS avg_token_len
FROM base
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.language_id(t(spark, sf_dir, "documents"))


ORACLE_LANGUAGE_ID = r"""
WITH scored AS (
  SELECT doc_id, text,
         len(list_intersect(list_transform(string_split(text,' '), x -> lower(x)),
             ['the','and','of','is','with'])) AS s_en,
         len(list_intersect(list_transform(string_split(text,' '), x -> lower(x)),
             ['der','die','und','ist','nicht'])) AS s_de,
         len(list_intersect(list_transform(string_split(text,' '), x -> lower(x)),
             ['le','la','et','est','les'])) AS s_fr,
         len(list_intersect(list_transform(string_split(text,' '), x -> lower(x)),
             ['el','la','que','es','los'])) AS s_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0 THEN 'zh'
            WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM scored
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.quality_score(t(spark, sf_dir, "documents"))


ORACLE_QUALITY = r"""
WITH s AS (
  SELECT doc_id, length(text) AS nc, len(string_split(text, ' ')) AS nt,
         len(list_distinct(string_split(text, ' '))) AS nu,
         (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0
           / length(text) AS alpha_ratio
  FROM documents
)
SELECT doc_id,
       round(0.4 * (CASE WHEN nt BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END)
           + 0.3 * alpha_ratio
           + 0.3 * least(nu * 1.0 / nt * 2, 1.0), 6) AS quality
FROM s
"""


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint containment pairs, oracle-verified: the
    portable gram hash lets the SQL twin replay the winnowed
    fingerprint sets (sliding-window minima included) exactly.

    k=24/w=12 (guaranteed detection of shared substrings >= 35 chars):
    on short small-vocab docs, k=8 char-grams are so non-selective that
    the postings self-join upper bound is ~110M pairs; k=24 drops it to
    ~16k with an identical result pair set."""
    return TX.containment_pairs(
        t(spark, sf_dir, "documents"), threshold=0.5, k=24, window=12
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint cardinality per doc (portable md5-derived
    gram hash — oracle-verified)."""
    fp = TX.fingerprint_winnow(t(spark, sf_dir, "documents"), k=24, window=12)
    return fp.select("doc_id", F.size("fingerprints").cast("long").alias("n_fingerprints"))


# Winnowing replay (Schleimer et al. 2003) in SQL: hash every k-char
# gram of lower(text) with the portable hash, take the min over each
# sliding window of 12 grams (frame [i, i+11]; positions past n-11 are
# excluded to mirror the engine's window count — except the single
# truncated window a sub-12-gram doc keeps), distinct the kept mins.
_WINNOW_CTES = """g AS (SELECT doc_id, lower(text) AS s FROM documents),
hx AS (SELECT doc_id, i,
              ('0x' || substr(md5(substr(s, CAST(i AS INT), 24)), 1, 15))::BIGINT AS h,
              length(s) - 23 AS n
       FROM g, LATERAL (SELECT unnest(generate_series(1, length(s) - 23)) AS i) t),
w AS (SELECT doc_id, i, n,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 11 FOLLOWING) AS fp
      FROM hx),
kept AS (SELECT DISTINCT doc_id, fp FROM w
         WHERE i <= CASE WHEN n >= 12 THEN n - 11 ELSE 1 END)"""


ORACLE_FINGERPRINTS = f"""
WITH {_WINNOW_CTES},
cnt AS (SELECT doc_id, count(*) AS n_fingerprints FROM kept GROUP BY doc_id)
SELECT d.doc_id, coalesce(cnt.n_fingerprints, 0) AS n_fingerprints
FROM (SELECT doc_id FROM documents) d LEFT JOIN cnt USING (doc_id)
"""


ORACLE_CONTAINMENT_PAIRS = f"""
WITH {_WINNOW_CTES},
sz AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
sh AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
       FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT id1 AS doc_id_1, id2 AS doc_id_2, shared,
       round(shared * 1.0 / least(x.n, y.n), 6) AS containment
FROM sh JOIN sz x ON x.doc_id = id1 JOIN sz y ON y.doc_id = id2
WHERE round(shared * 1.0 / least(x.n, y.n), 6) >= 0.5
"""


def q_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment with the ``max_df=100`` hot-bucket cap — the 100 TB
    configuration. The exact variant's candidate volume is sum over
    fingerprints of df² — quadratic in boilerplate document frequency
    BY DEFINITION (the 100x soak measured 1279x bucket-square mass for
    158x postings once replica-prefix 'boilerplate' appeared; real
    corpora have license headers and templates that do the same). The
    cap bounds per-bucket fan-in before the self-join; containment is
    recomputed consistently on the capped universe (per-doc set sizes
    recounted from surviving postings). At sf0.01/sf0.1 max df is 13,
    so the capped result EQUALS the exact one — the oracle verifies the
    cap plumbing end-to-end, and the cap-semantics unit test drives a
    corpus where the cap actually bites."""
    return TX.containment_pairs(
        t(spark, sf_dir, "documents"), threshold=0.5, k=24, window=12, max_df=100
    )


ORACLE_CONTAINMENT_CAPPED = f"""
WITH {_WINNOW_CTES},
rare AS (SELECT fp FROM kept GROUP BY fp HAVING count(*) <= 100),
kc AS (SELECT kept.doc_id, kept.fp FROM kept JOIN rare USING (fp)),
sz AS (SELECT doc_id, count(*) AS n FROM kc GROUP BY doc_id),
sh AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
       FROM kc a JOIN kc b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT id1 AS doc_id_1, id2 AS doc_id_2, shared,
       round(shared * 1.0 / least(x.n, y.n), 6) AS containment
FROM sh JOIN sz x ON x.doc_id = id1 JOIN sz y ON y.doc_id = id2
WHERE round(shared * 1.0 / least(x.n, y.n), 6) >= 0.5
"""


# ---------------------------------------------------------------------------
# End-to-end curation (the composed LLM-data pipeline)
# ---------------------------------------------------------------------------


def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pipeline as ONE lazy plan: quality-filter, keep
    English, drop exact duplicates (keep the min-id copy). What a
    pretraining data pass actually runs; each stage is narrow or a
    single selective shuffle, so composition adds no extra passes
    over the corpus."""
    # r13: the r12 `.cache()` of the WHOLE documents table is removed —
    # it was bench-regressed on the committed protocol (curate group
    # 0.83x) and is the worst possible 100 TB posture (caching the full
    # corpus per query = spill everything to local disk). The four
    # branches re-read the parquet scan, which is columnar, pruned and
    # OS-page-cached — cheaper than materializing the uncompressed rows
    # through Spark storage memory.
    docs = t(spark, sf_dir, "documents")
    quality = TX.quality_score(docs).filter(F.col("quality") >= 0.55)
    english = TX.language_id(docs).filter(F.col("lang_pred") == "en")
    keepers = D.dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
    return (
        docs.select("doc_id", "source")
        .join(quality.select("doc_id"), "doc_id")
        .join(english.select("doc_id"), "doc_id")
        .join(keepers, "doc_id")
        .select("doc_id", "source")
    )


ORACLE_CURATION = r"""
WITH q AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           round(0.4 * (CASE WHEN len(string_split(text,' ')) BETWEEN 10 AND 100000
                             THEN 1.0 ELSE 0.3 END)
               + 0.3 * ((length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                        * 1.0 / length(text))
               + 0.3 * least(len(list_distinct(string_split(text,' ')))
                             * 1.0 / len(string_split(text,' ')) * 2, 1.0), 6) AS quality
    FROM documents
  ) WHERE quality >= 0.55
),
lang AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           len(list_intersect(list_transform(string_split(text,' '), x -> lower(x)),
               ['the','and','of','is','with'])) AS s_en,
           len(list_intersect(list_transform(string_split(text,' '), x -> lower(x)),
               ['der','die','und','ist','nicht'])) AS s_de,
           len(list_intersect(list_transform(string_split(text,' '), x -> lower(x)),
               ['le','la','et','est','les'])) AS s_fr,
           len(list_intersect(list_transform(string_split(text,' '), x -> lower(x)),
               ['el','la','que','es','los'])) AS s_es,
           length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS n_cjk
    FROM documents
  )
  WHERE n_cjk = 0 AND s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es)
),
keepers AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
)
SELECT doc_id, source FROM documents
WHERE doc_id IN (SELECT doc_id FROM q)
  AND doc_id IN (SELECT doc_id FROM lang)
  AND doc_id IN (SELECT doc_id FROM keepers)
"""


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


def q_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the real mapInPandas decode path (fake decoder) —
    byte lengths, digests, derived dimensions all SQL-checkable."""
    media = M.documents_as_media(t(spark, sf_dir, "documents"))
    return M.decode_media(media, fake=True)


ORACLE_MULTIMODAL_MANIFEST = """
SELECT doc_id AS media_id, 'image' AS media_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256,
       CAST(strlen(text) % 640 + 1 AS INT) AS width,
       CAST((strlen(text) // 640) % 480 + 1 AS INT) AS height,
       CAST(strlen(text) * 10 AS BIGINT) AS duration_ms
FROM documents
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF feature extraction (byte-histogram fake encoder),
    summarized to an INTEGER-EXACT projection so the whole Arrow
    round-trip is oracle-checkable: the dominant histogram bin (argmax
    with first-index tie-break) depends only on byte counts, which the
    oracle recomputes from codepoints (the corpus is ASCII, so
    byte>>4 == unicode(c)//16)."""
    media = M.documents_as_media(t(spark, sf_dir, "documents"))
    feats = M.extract_features(media, fake=True)
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        F.array_position("features", F.array_max("features"))
        .cast("int")
        .alias("dominant_bin"),
    )


ORACLE_MEDIA_FEATURES = """
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
h AS (SELECT doc_id, unicode(c) // 16 AS bin, count(*) AS n FROM ch GROUP BY 1, 2),
r AS (SELECT doc_id, bin,
             row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, bin ASC) AS rk
      FROM h)
SELECT doc_id AS media_id, 16 AS dim, CAST(bin + 1 AS INT) AS dominant_bin
FROM r WHERE rk = 1
"""


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling fan-out (4 frames/payload), summarized as frame
    hashes. Deterministic byte arithmetic over an ASCII corpus, so the
    oracle replays the chunk offsets (floor() where Spark's int cast
    truncates — DuckDB's cast rounds) and hashes the same bytes."""
    media = M.documents_as_media(t(spark, sf_dir, "documents"))
    frames = M.sample_frames(media, n_frames=4)
    return frames.select("media_id", "frame_idx", F.md5("frame_bytes").alias("frame_md5"))


ORACLE_MEDIA_FRAMES = """
SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
       md5(substr(text, CAST(floor(i * (length(text) / 4.0)) AS INT) + 1, 1024)) AS frame_md5
FROM documents, LATERAL (SELECT unnest(generate_series(0, 3)) AS i) t
"""


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-resample resize through the Arrow batch path; payload
    summarized as md5. The numpy gather (arange(256)*len//256 % len)
    is pure integer arithmetic the oracle replays per pixel."""
    media = M.documents_as_media(t(spark, sf_dir, "documents"))
    resized = M.resize_media(media, width=16, height=16)
    return resized.select("media_id", "width", "height", F.md5("payload").alias("payload_md5"))


ORACLE_MEDIA_RESIZE = """
WITH g AS (SELECT doc_id, text, unnest(generate_series(0, 255)) AS i FROM documents),
px AS (SELECT doc_id, i,
              substr(text, CAST(((i * length(text)) // 256) % length(text) AS INT) + 1, 1) AS ch
       FROM g),
s AS (SELECT doc_id, string_agg(ch, '' ORDER BY i) AS resized FROM px GROUP BY doc_id)
SELECT doc_id AS media_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       md5(resized) AS payload_md5
FROM s
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-lang training mix: portable Knuth hash so the
    oracle replays the exact bucket arithmetic; the filter is pushed
    into the scan (pure predicate, no RNG, rerun-stable)."""
    from nypd_arrest_etl_spark.operators import sampling as S

    docs = t(spark, sf_dir, "documents")
    sampled = S.stratified_hash_sample(
        docs,
        key_col="doc_id",
        stratum_col="lang",
        fractions={"en": 0.5, "de": 0.2},
        default_fraction=0.05,
        salt=7,
        portable=True,
    )
    return sampled.select("doc_id", "lang", "source")


ORACLE_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source
FROM documents
WHERE ((doc_id + 7) * 2654435761) % 4294967296 % 1000000 <
      CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 200000 ELSE 50000 END
"""


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded training-order shuffle: the permutation is exposed as
    the shuffle_pos column (the driver's compare is order-insensitive,
    so the position IS the verified artifact). Portable hash so DuckDB
    replays the identical permutation."""
    from nypd_arrest_etl_spark.operators import sampling as S

    docs = t(spark, sf_dir, "documents")
    out = S.shuffle_deterministic(
        docs, key_col="doc_id", seed=11, portable=True, pos_col="shuffle_pos"
    )
    return out.select("doc_id", "shuffle_pos")


ORACLE_CORPUS_SHUFFLE = """
SELECT doc_id, ((doc_id + 11) * 2654435761) % 4294967296 AS shuffle_pos
FROM documents
"""


def q_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit over events: all rules in one
    conditional-aggregation scan; null rule results count as
    violations (explicit 3VL)."""
    from nypd_arrest_etl_spark.operators.sampling import check_constraints

    e = t(spark, sf_dir, "events")
    return check_constraints(
        e,
        {
            "value_nonnegative": F.col("value") >= 0,
            "event_type_in_domain": F.col("event_type").isin(
                "click", "view", "purchase", "scroll"
            ),
            "user_id_present": F.col("user_id").isNotNull(),
            "props_is_json": F.col("props").startswith("{"),
        },
    )


ORACLE_QUALITY_CONSTRAINTS = """
WITH t AS (SELECT count(*) AS n FROM events)
SELECT 'value_nonnegative' AS rule, n AS n_rows,
       (SELECT count(*) FROM events WHERE value >= 0 IS NOT TRUE) AS n_violations,
       round((SELECT count(*) FROM events WHERE value >= 0 IS NOT TRUE) * 1.0 / n, 6)
         AS violation_rate
FROM t
UNION ALL
SELECT 'event_type_in_domain', n,
       (SELECT count(*) FROM events
        WHERE event_type IN ('click','view','purchase','scroll') IS NOT TRUE),
       round((SELECT count(*) FROM events
              WHERE event_type IN ('click','view','purchase','scroll') IS NOT TRUE) * 1.0 / n, 6)
FROM t
UNION ALL
SELECT 'user_id_present', n,
       (SELECT count(*) FROM events WHERE user_id IS NULL),
       round((SELECT count(*) FROM events WHERE user_id IS NULL) * 1.0 / n, 6)
FROM t
UNION ALL
SELECT 'props_is_json', n,
       (SELECT count(*) FROM events WHERE props LIKE '{%' IS NOT TRUE),
       round((SELECT count(*) FROM events WHERE props LIKE '{%' IS NOT TRUE) * 1.0 / n, 6)
FROM t
"""


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset profile of the documents table (row count,
    nulls, exact distincts per column) — the health check a curation
    pipeline runs before and after every transformation."""
    from nypd_arrest_etl_spark.operators import sampling as S

    return S.profile_columns(
        t(spark, sf_dir, "documents"), ["text", "lang", "source", "n_chars"]
    )


ORACLE_PROFILE_DOCUMENTS = """
SELECT 'text' AS column_name, count(*) AS n_rows,
       CAST(count(*) - count(text) AS BIGINT) AS n_nulls,
       count(DISTINCT text) AS n_distinct FROM documents
UNION ALL
SELECT 'lang', count(*), CAST(count(*) - count(lang) AS BIGINT),
       count(DISTINCT lang) FROM documents
UNION ALL
SELECT 'source', count(*), CAST(count(*) - count(source) AS BIGINT),
       count(DISTINCT source) FROM documents
UNION ALL
SELECT 'n_chars', count(*), CAST(count(*) - count(n_chars) AS BIGINT),
       count(DISTINCT n_chars) FROM documents
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents; text returned as an md5 so the
    driver compares content without shipping full bodies."""
    out = TX.pii_scrub(t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_emails", "n_phones", F.md5("text").alias("scrubbed_md5")
    )


ORACLE_PII_SCRUB = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}'))
            AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}', '<PHONE>', 'g'),
             '[0-9]{9,}', '<IDNUM>', 'g')) AS scrubbed_md5
FROM documents
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into 8192-char training
    sequences per source (one window cumsum — one shuffle)."""
    return TX.pack_sequences(
        t(spark, sf_dir, "documents"), budget=8192
    )


ORACLE_PACK_SEQUENCES = """
SELECT doc_id, source AS group_key, CAST(n_chars AS BIGINT) AS size,
       CAST(floor(coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / 8192) AS BIGINT) AS seq_id,
       CAST(coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_offset
FROM documents
"""


def q_histogram_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of document lengths (10 bins; full bin
    spine emitted, zero bins included)."""
    from nypd_arrest_etl_spark.operators import sampling as S

    return S.histogram(t(spark, sf_dir, "documents"), "n_chars", bins=10)


ORACLE_HISTOGRAM_CHARS = """
WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
           WHERE n_chars IS NOT NULL),
r AS (SELECT min(x) AS rlo, max(x) AS rhi FROM v),
b AS (SELECT least(9, CAST(floor((x - rlo) / ((rhi - rlo) / 10)) AS INT)) AS bin
      FROM v, r),
c AS (SELECT bin, count(*) AS n_rows FROM b GROUP BY bin),
spine AS (SELECT CAST(i AS INT) AS bin,
                 round(rlo + i * (rhi - rlo) / 10, 6) AS lo,
                 round(rlo + (i + 1) * (rhi - rlo) / 10, 6) AS hi
          FROM r, (SELECT unnest(generate_series(0, 9)) AS i))
SELECT spine.bin, lo, hi,
       CAST(coalesce(n_rows, 0) AS BIGINT) AS n_rows
FROM spine LEFT JOIN c ON spine.bin = c.bin
ORDER BY spine.bin
"""


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 16-merge BPE vocabulary on the corpus (iterative
    distributed pair counts, driver argmax per merge) and tokenize
    every document with it. Iterative trainer output is not
    SQL-expressible — rows-only check; exact-semantics unit tests in
    tests/test_bpe.py."""
    from nypd_arrest_etl_spark.operators import bpe as B

    docs = t(spark, sf_dir, "documents")
    merges = B.bpe_train(docs, num_merges=16)
    out = B.bpe_tokenize(docs, merges)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_uniq_tokens"),
    )


def q_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture drift between two snapshot halves of the corpus
    (even vs odd doc_id): per-source shares + PSI contributions."""
    from nypd_arrest_etl_spark.operators import sampling as S

    docs = t(spark, sf_dir, "documents")
    return S.drift_report(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "source",
    )


ORACLE_DRIFT = """
WITH r AS (SELECT source AS category, count(*) AS n_ref FROM documents
           WHERE doc_id % 2 = 0 GROUP BY 1),
c AS (SELECT source AS category, count(*) AS n_cur FROM documents
      WHERE doc_id % 2 = 1 GROUP BY 1),
j AS (SELECT coalesce(r.category, c.category) AS category,
             coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur,
             coalesce(n_ref, 0) * 1.0 / (SELECT sum(n_ref) FROM r) AS p_ref,
             coalesce(n_cur, 0) * 1.0 / (SELECT sum(n_cur) FROM c) AS p_cur
      FROM r FULL OUTER JOIN c USING (category))
SELECT category, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
       round((p_cur + 1e-6 - (p_ref + 1e-6))
             * ln((p_cur + 1e-6) / (p_ref + 1e-6)), 6) AS psi
FROM j
ORDER BY category
"""


def q_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted mixture: 2.5x src0, 0.4x src1, 1x the rest —
    deterministic fractional copies via the portable hash."""
    from nypd_arrest_etl_spark.operators import sampling as S

    out = S.oversample_mixture(
        t(spark, sf_dir, "documents"),
        key_col="doc_id",
        stratum_col="source",
        weights={"src0": 2.5, "src1": 0.4},
        salt=11,
        portable=True,
    )
    return out.select("doc_id", "source", "copy_idx")


# Per-stratum (floor, threshold) pairs are INTEGER literals shared
# with operators.sampling.oversample_mixture's int(round(frac*1e6))
# computation — float expressions like (w - floor(w)) * 1e6 round
# differently across engines. 2.5 -> (2, 500000); 0.4 -> (0, 400000).
# The Knuth hash matches operators.sampling._portable_hash bit-for-bit.
ORACLE_OVERSAMPLE = """
WITH h AS (SELECT doc_id, source,
                  ((doc_id + 11) * 2654435761) % 4294967296 % 1000000 AS hh,
                  CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                       ELSE 1 END AS fl,
                  CASE source WHEN 'src0' THEN 500000 WHEN 'src1' THEN 400000
                       ELSE 0 END AS th
           FROM documents),
n AS (SELECT doc_id, source,
             fl + CASE WHEN hh < th THEN 1 ELSE 0 END AS n_copies
      FROM h)
SELECT doc_id, source, CAST(i AS INT) AS copy_idx
FROM n, LATERAL (SELECT unnest(generate_series(0, n_copies - 1)) AS i) t
WHERE n_copies > 0
"""


def q_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 docs per source by portable-hash rank — the
    fixed-budget-per-source form of training-mix construction
    (WindowGroupLimit pushes the top-m before the shuffle)."""
    from nypd_arrest_etl_spark.operators import sampling as S

    return S.fixed_size_per_group(
        t(spark, sf_dir, "documents"),
        key_col="doc_id",
        group_col="source",
        m=20,
        salt=7,
        portable=True,
    ).select("doc_id", "source")


# Knuth multiplicative hash replayed bit-for-bit (operators.sampling):
# ((doc_id + salt) * 2654435761) mod 2^32, ranked ascending with doc_id
# tie-break.
ORACLE_SAMPLE_FIXED = """
WITH h AS (SELECT doc_id, source,
                  ((doc_id + 7) * 2654435761) % 4294967296 AS hh
           FROM documents),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rk
      FROM h)
SELECT doc_id, source FROM r WHERE rk <= 20
"""


def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram LM score per doc (KenLM-perplexity stand-in for
    curation filtering)."""
    return TX.ngram_lm_score(t(spark, sf_dir, "documents"))


ORACLE_TEXT_LM_SCORE = """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(lower(trim(text)), ' '),
                                 t -> t <> '') AS l
              FROM documents),
post AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS g
         FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l)-1)) AS i) t),
big AS (SELECT g, count(*) AS c2 FROM post GROUP BY g),
marg AS (SELECT split_part(g, ' ', 1) AS w1, sum(c2) AS c1 FROM big GROUP BY 1),
probs AS (SELECT g, log2(c2 * 1.0 / c1) AS lp
          FROM big JOIN marg ON split_part(big.g, ' ', 1) = marg.w1)
SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_log2p
FROM post JOIN probs USING (g) GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary / span-level dedup / leakage-safe split
# ---------------------------------------------------------------------------


def q_corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.corpus_vocabulary(t(spark, sf_dir, "documents"), top_k=50)


# DuckDB replays the token pipeline: lowercase whitespace split, per-doc
# distinct for df, global tf, top-50 on the (tf DESC, token ASC) total order.
ORACLE_CORPUS_VOCABULARY = r"""
WITH toks AS (
  SELECT doc_id, lower(tok) AS token
  FROM documents,
       unnest(string_split_regex(trim(text), '\s+')) AS u(tok)
  WHERE tok <> ''
), vocab AS (
  SELECT token,
         count(*)::BIGINT AS tf,
         count(DISTINCT doc_id)::BIGINT AS df
  FROM toks GROUP BY token
), total AS (SELECT count(*)::DOUBLE AS t FROM toks)
SELECT token, tf, df, round(tf / t, 9) AS corpus_share
FROM vocab, total
ORDER BY tf DESC, token ASC
LIMIT 50
"""


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.span_dedup_stats(t(spark, sf_dir, "documents"), span_words=8)


# Tumbling 8-word windows, md5 span hash, cross-doc document frequency.
ORACLE_SPAN_DEDUP = r"""
WITH w AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS words
  FROM documents
), base AS (
  SELECT doc_id, words,
         greatest(1, CAST(ceil(len(words) / 8.0) AS BIGINT)) AS n_spans
  FROM w
), spans AS (
  SELECT doc_id, n_spans,
         md5(array_to_string(words[(i*8+1):(i*8+8)], ' ')) AS h
  FROM base, unnest(generate_series(0, CAST(n_spans AS INT) - 1)) AS u(i)
), freq AS (
  SELECT h, count(DISTINCT doc_id) AS docs_with_span FROM spans GROUP BY h
)
SELECT s.doc_id,
       any_value(s.n_spans) AS n_spans,
       sum(CASE WHEN f.docs_with_span >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
       round(sum(CASE WHEN f.docs_with_span >= 2 THEN 1 ELSE 0 END)
             / any_value(s.n_spans), 9) AS dup_fraction
FROM spans s JOIN freq f USING (h)
GROUP BY s.doc_id
"""


def q_split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.leakage_safe_split(t(spark, sf_dir, "documents"), holdout_permille=100)


# The split hash is the portable md5->60-bit->Knuth chain, replayed here
# bit-for-bit; 30-bit pre-reduction keeps the multiply inside signed-64
# (DuckDB errors on overflow instead of wrapping).
ORACLE_SPLIT_TRAIN_HOLDOUT = r"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint,
       CASE WHEN ((CAST(('0x' || substr(md5(fingerprint), 1, 15)) AS BIGINT)
                   % 1073741824) * 2654435761) % 4294967296 % 1000 < 100
            THEN 'holdout' ELSE 'train' END AS split
FROM fp
"""


_BM25_QUERIES = [
    (1, "spark table join"),
    (2, "fast scan filter"),
    (3, "window agg group"),
]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.bm25_topk(t(spark, sf_dir, "documents"), _BM25_QUERIES, top_k=10)


# The float expressions mirror the Spark column arithmetic TERM FOR
# TERM (e.g. (1.2 + 1.0), not 2.2 — those are different doubles), and
# ranking happens on the 6-digit-rounded score, so ulp-level ln/div
# noise between JVM and DuckDB libm cannot reorder the top-k.
ORACLE_BM25_TOPK = r"""
WITH toks AS (
  SELECT doc_id, lower(tok) AS term
  FROM documents,
       unnest(string_split_regex(trim(text), '\s+')) AS u(tok)
  WHERE tok <> ''
), postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl
), qt(query_id, term) AS (
  VALUES (1, 'spark'), (1, 'table'), (1, 'join'),
         (2, 'fast'), (2, 'scan'), (2, 'filter'),
         (3, 'window'), (3, 'agg'), (3, 'group')
), scored AS (
  SELECT q.query_id, p.doc_id,
         round(sum(
           ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (p.tf * (1.2 + 1.0))
           / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl))
         ), 6) AS score
  FROM postings p
  JOIN qt q USING (term)
  JOIN dfreq f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id ASC
  )::BIGINT AS rank
  FROM scored
) WHERE rank <= 10
"""


def q_quality_top_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-source curation: keep each source's top half by
    quality, rank-based so the kept set is engine-exact."""
    return TX.quality_top_frac(t(spark, sf_dir, "documents"), keep_frac=0.5)


# Quality replay (same formula as ORACLE_QUALITY) + per-source rank
# cutoff at ceil(n * 0.5). Ordering on the ROUNDED quality with doc_id
# tie-break gives both engines the same total order.
ORACLE_QUALITY_TOP_FRAC = r"""
WITH s AS (
  SELECT doc_id, source, length(text) AS nc,
         len(string_split(text, ' ')) AS nt,
         len(list_distinct(string_split(text, ' '))) AS nu,
         (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0
           / length(text) AS alpha_ratio
  FROM documents
), q AS (
  SELECT doc_id, source,
         round(0.4 * (CASE WHEN nt BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END)
             + 0.3 * alpha_ratio
             + 0.3 * least(nu * 1.0 / nt * 2, 1.0), 6) AS quality
  FROM s
), r AS (
  SELECT doc_id, source, quality,
         CAST(row_number() OVER
             (PARTITION BY source ORDER BY quality DESC, doc_id) AS BIGINT)
             AS src_rank,
         count(*) OVER (PARTITION BY source) AS _n
  FROM q
)
SELECT doc_id, source, quality, src_rank
FROM r WHERE src_rank <= ceil(_n * 0.5)
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix on canonical fingerprints
    (dataset-mixing diagnostic)."""
    return D.source_overlap(t(spark, sf_dir, "documents"))


ORACLE_SOURCE_OVERLAP = r"""
WITH fps AS (
  SELECT DISTINCT source AS src,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
), sizes AS (
  SELECT src, count(*)::BIGINT AS n FROM fps GROUP BY 1
), inter AS (
  SELECT a.src AS source_a, b.src AS source_b, count(*)::BIGINT AS n_common
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.src < b.src
  GROUP BY 1, 2
)
SELECT sa.src AS source_a, sb.src AS source_b, sa.n AS n_a, sb.n AS n_b,
       CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
       round(coalesce(i.n_common, 0) * 1.0
             / (sa.n + sb.n - coalesce(i.n_common, 0)), 6) AS jaccard
FROM sizes sa JOIN sizes sb ON sa.src < sb.src
LEFT JOIN inter i ON i.source_a = sa.src AND i.source_b = sb.src
ORDER BY 1, 2
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection — the curation step production
    pipelines run AFTER near-dup clustering: within each cluster keep
    the highest-quality member (ties broken by doc_id), not the
    arbitrary min-id representative; unclustered docs survive as
    their own singletons. Pure composition of existing operators
    (jaccard pairs -> connected components -> quality score -> one
    per-cluster window), so the plan is the candidate-generation
    shuffle + one window shuffle on the (tiny) cluster labels."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    clusters = D.connected_components(D.jaccard_pairs(docs, threshold=0.8, n=4))
    # quality_score is a pure projection carrying every doc_id, so it
    # doubles as the doc universe: one left join against the (tiny)
    # cluster labels instead of a doc-list scan plus two joins.
    labeled = (
        # broadcast hint (r12): the cluster-label table is near-dup
        # pairs only — orders of magnitude smaller than the corpus —
        # but arrives as a local relation with no size estimate, so
        # the planner fell back to a full sort-merge join (both sides
        # exchanged + sorted, plans/r12/dedup_keep_best_before.txt).
        TX.quality_score(docs)
        .join(F.broadcast(clusters), "doc_id", "left")
        .withColumn("cluster_rep", F.coalesce("cluster_rep", F.col("doc_id")))
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        labeled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_rep",
            F.col("doc_id").alias("kept_doc"),
            F.col("quality").alias("kept_quality"),
        )
    )


# Composition of ORACLE_NEARDUP_CLUSTERS (recursive-CTE connected
# components) and ORACLE_QUALITY (score replay), plus the per-cluster
# argmax window.
ORACLE_DEDUP_KEEP_BEST = r"""
WITH RECURSIVE toks AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS l FROM documents),
big AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] AS sh
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l)-3)) AS i) t),
sz AS (SELECT doc_id, count(*) AS n FROM big GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
          FROM big a JOIN big b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (
  SELECT id1, id2 FROM inter
  JOIN sz x ON x.doc_id = id1 JOIN sz y ON y.doc_id = id2
  WHERE round(i * 1.0 / (x.n + y.n - i), 6) >= 0.8
),
edges AS (SELECT id1 AS a, id2 AS b FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
),
clusters AS (SELECT node AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY node),
s AS (
  SELECT doc_id, length(text) AS nc, len(string_split(text, ' ')) AS nt,
         len(list_distinct(string_split(text, ' '))) AS nu,
         (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0
           / length(text) AS alpha_ratio
  FROM documents
),
q AS (
  SELECT doc_id,
         round(0.4 * (CASE WHEN nt BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END)
             + 0.3 * alpha_ratio
             + 0.3 * least(nu * 1.0 / nt * 2, 1.0), 6) AS quality
  FROM s
),
lab AS (
  SELECT d.doc_id, coalesce(c.cluster_rep, d.doc_id) AS cluster_rep, q.quality
  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_rep ORDER BY quality DESC, doc_id) AS rk
  FROM lab
)
SELECT cluster_rep, doc_id AS kept_doc, quality AS kept_quality FROM r WHERE rk = 1
"""


def q_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.span_dedup_trim(t(spark, sf_dir, "documents"), span_words=8)


# Same span pipeline as ORACLE_SPAN_DEDUP, but the keep rule is a
# first-occurrence rank over (doc_id, i) per span hash, and survivors
# are stitched back with an ordered string_agg.
ORACLE_SPAN_TRIM = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
           x -> x <> '') AS words
  FROM documents
), base AS (
  SELECT doc_id, words,
         greatest(1, CAST(ceil(len(words) / 8.0) AS BIGINT)) AS n_spans
  FROM w
), spans AS (
  SELECT doc_id, n_spans, i,
         array_to_string(words[(i*8+1):(i*8+8)], ' ') AS txt
  FROM base, unnest(generate_series(0, CAST(n_spans AS INT) - 1)) AS u(i)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY md5(txt) ORDER BY doc_id, i) AS rk
  FROM spans
)
SELECT doc_id,
       any_value(n_spans) AS n_spans,
       sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END)::BIGINT AS kept_spans,
       coalesce(string_agg(txt, ' ' ORDER BY i) FILTER (WHERE rk = 1), '')
         AS trimmed_text
FROM ranked
GROUP BY doc_id
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster-bounded semantic dedup (rows-only: the cell
    assignment comes from driver k-means, like IVF; the greedy survivor
    rule is unit-tested against a numpy reference)."""
    return SIM.semantic_dedup(
        t(spark, sf_dir, "embeddings"), threshold=0.95, n_cells=16
    ).orderBy("vec_id")


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: src0 is the target domain; keep the
    100 raw docs whose hashed-unigram distribution is closest to it."""
    from nypd_arrest_etl_spark.operators import sampling as S

    docs = t(spark, sf_dir, "documents")
    return S.importance_resample_dsir(
        docs, is_target=F.col("source") == "src0", n_keep=100
    )


# Replays the hashed-unigram model: portable 60-bit md5 hash mod 1024
# buckets, add-one smoothing, integer micro-unit log-ratios, integer
# per-doc sums, (weight DESC, doc_id) top-100.
ORACLE_DSIR_SAMPLE = r"""
WITH toks AS (
  SELECT doc_id, source = 'src0' AS is_t,
         CAST(('0x' || substr(md5(lower(tok)), 1, 15)) AS BIGINT) % 1024 AS b
  FROM documents, unnest(string_split_regex(trim(text), '\s+')) AS u(tok)
  WHERE tok <> ''
), model AS (
  SELECT b,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
  FROM toks GROUP BY b
), tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM model),
contrib AS (
  SELECT b,
         CAST(round(ln(((ct + 1.0) / (nt + 1024.0))
                       / ((cr + 1.0) / (nr + 1024.0))) * 1000000) AS BIGINT) AS w
  FROM model, tot
)
SELECT t.doc_id, count(*) AS n_toks, CAST(sum(c.w) AS BIGINT) AS logw_micro
FROM toks t JOIN contrib c USING (b)
WHERE NOT t.is_t
GROUP BY t.doc_id
ORDER BY logw_micro DESC, doc_id
LIMIT 100
"""


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style temperature-scaled source mixture (alpha=0.3) with
    token allocations under a 1M-token budget."""
    from nypd_arrest_etl_spark.operators import sampling as S

    return S.mixture_temperature_weights(
        t(spark, sf_dir, "documents"), alpha=0.3, token_budget=1_000_000
    )


# Integer token totals -> micro-ized n^alpha -> integer denominator sum;
# weights and allocations replay exactly.
ORACLE_MIXTURE_TEMPERATURE = r"""
WITH per AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), p AS (
  SELECT source, n_tokens,
         CAST(round(pow(n_tokens, 0.3) * 1000000) AS BIGINT) AS pow_micro
  FROM per
), tot AS (SELECT CAST(sum(pow_micro) AS BIGINT) AS t FROM p)
SELECT source, n_tokens,
       round(pow_micro * 1.0 / t, 6) AS weight,
       CAST(round(1000000 * pow_micro * 1.0 / t) AS BIGINT) AS alloc_tokens,
       round(CAST(round(1000000 * pow_micro * 1.0 / t) AS BIGINT) * 1.0 / n_tokens,
             6) AS epochs
FROM p, tot
ORDER BY source
"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity terciles per language."""
    return TX.ccnet_perplexity_buckets(t(spark, sf_dir, "documents"))


# The LM CTE is ORACLE_TEXT_LM_SCORE verbatim; the bucketing is a
# per-lang ntile over the rounded score with doc_id tiebreak.
ORACLE_CCNET_BUCKETS = """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(lower(trim(text)), ' '),
                                 t -> t <> '') AS l
              FROM documents),
post AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS g
         FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l)-1)) AS i) t),
big AS (SELECT g, count(*) AS c2 FROM post GROUP BY g),
marg AS (SELECT split_part(g, ' ', 1) AS w1, sum(c2) AS c1 FROM big GROUP BY 1),
probs AS (SELECT g, log2(c2 * 1.0 / c1) AS lp
          FROM big JOIN marg ON split_part(big.g, ' ', 1) = marg.w1),
scores AS (SELECT doc_id, round(avg(lp), 6) AS avg_log2p
           FROM post JOIN probs USING (g) GROUP BY doc_id),
ranked AS (
  SELECT d.doc_id, d.lang, s.avg_log2p,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY s.avg_log2p DESC, d.doc_id) AS b
  FROM documents d JOIN scores s ON s.doc_id = d.doc_id
)
SELECT doc_id, lang, avg_log2p,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS ppl_bucket
FROM ranked
"""


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank (approximate by
    design: codes select refine*k candidates — rows-only check;
    recall vs the exact baseline is unit-tested in
    tests/test_similarity.py)."""
    emb = t(spark, sf_dir, "embeddings")
    return SIM.ann_pq_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, m_sub=8, n_codes=16
    )


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed sklearn idf)."""
    return TX.tfidf_topk(t(spark, sf_dir, "documents"), k=3)


# Same token pipeline as ORACLE_CORPUS_VOCABULARY; idf is the smoothed
# sklearn form ln((N+1)/(df+1)) + 1 on per-doc-distinct df.
ORACLE_TFIDF_TOPK = r"""
WITH toks AS (
  SELECT doc_id, lower(tok) AS term
  FROM documents,
       unnest(string_split_regex(trim(text), '\s+')) AS u(tok)
  WHERE tok <> ''
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         round(tf.tf * (ln((n.n_docs + 1) / (dfreq.df + 1)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfreq USING (term), n
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term ASC) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 3
"""


def q_corpus_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus profile: token totals, top-1 share, Zipf slope
    (OLS of ln(freq) on ln(rank) over the top-100 tokens)."""
    return TX.corpus_zipf(t(spark, sf_dir, "documents"), top_n=100)


ORACLE_CORPUS_ZIPF = r"""
WITH toks AS (
  SELECT lower(tok) AS token
  FROM documents,
       unnest(string_split_regex(trim(text), '\s+')) AS u(tok)
  WHERE tok <> ''
), counts AS (
  SELECT token, count(*)::BIGINT AS freq FROM toks GROUP BY token
), top AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
  FROM counts
  ORDER BY freq DESC, token ASC
  LIMIT 100
), slope AS (
  SELECT round(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope FROM top
), totals AS (
  SELECT sum(freq)::BIGINT AS total_tokens,
         count(*)::BIGINT AS distinct_tokens,
         max(freq)::BIGINT AS top1_freq
  FROM counts
)
SELECT total_tokens, distinct_tokens,
       round(top1_freq / total_tokens::DOUBLE, 9) AS top1_share,
       zipf_slope
FROM totals, slope
"""


def q_web_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-ingest boilerplate strip: wrap each document in a
    deterministic HTML page (title/style/script/comment/entities/two
    anchors — every feature the extractor handles), then recover the
    display text, harvest + normalize the links. Map-only: one
    codegen'd projection, no shuffle, linear in input splits — the
    shape a 100 TB WARC sweep needs."""
    docs = t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>"), F.col("source"), F.lit(" #"), sid,
        F.lit("</title><style>p{x:1}</style><script>var n="), sid,
        F.lit(";//<p></script></head><body><!-- id "), sid,
        F.lit(" --><h1>"), F.upper(F.col("source")), F.lit("</h1><p>"),
        F.replace(F.col("text"), F.lit("a"), F.lit("&amp;")), F.lit("</p>"),
        F.lit('<a href="HTTPS://'), F.col("source"),
        F.lit(".Example.COM:443/doc/"), sid, F.lit('?v=1#top">self</a> '),
        F.lit("<a href='http://Mirror."), F.col("source"), F.lit(".net:80/d/"),
        sid, F.lit("'>m</a><br></body></html>"),
    )
    links = WB.extract_links(html)
    return docs.select(
        "doc_id",
        WB.html_to_text(html).alias("text"),
        F.size(links).cast("long").alias("n_links"),
        WB.normalize_url(F.element_at(links, 1)).alias("self_url"),
        WB.url_host(F.element_at(links, 2)).alias("mirror_host"),
    )


# Shared oracle fragments: the deterministic per-document HTML page
# (CTE `h`) and the html_to_text regex chain as a SQL expression over
# the `html` column — reused verbatim by ORACLE_WEB_HTML_EXTRACT and
# ORACLE_WEB_QUALITY_SIGNALS so the two specs can never drift.
_SQL_DOC_HTML_CTE = r"""h AS (
  SELECT doc_id,
    '<html><head><title>' || source || ' #' || doc_id ||
    '</title><style>p{x:1}</style><script>var n=' || doc_id ||
    ';//<p></script></head><body><!-- id ' || doc_id ||
    ' --><h1>' || upper(source) || '</h1><p>' ||
    replace(text, 'a', '&amp;') || '</p>' ||
    '<a href="HTTPS://' || source || '.Example.COM:443/doc/' || doc_id ||
    '?v=1#top">self</a> ' ||
    '<a href=''http://Mirror.' || source || '.net:80/d/' || doc_id ||
    '''>m</a><br></body></html>' AS html
  FROM documents
)"""

_SQL_HTML_TO_TEXT = r"""regexp_replace(trim(regexp_replace(regexp_replace(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
          '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
          '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
          '(?s)<!--.*?-->', ' ', 'g'),
          '(?i)<(?:br|hr|/p|/div|/h[1-6]|/li|/tr|/title|/table|/ul|/ol)[^>]*>', chr(10), 'g'),
          '(?s)<[^>]*>', ' ', 'g'),
      '&nbsp;', ' '), '&quot;', '"'), '&#39;', chr(39)),
      '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
      '\r\n?', chr(10), 'g'),
      '[ \t]+', ' ', 'g'),
      '[ \t]*\n[ \t\n]*', chr(10), 'g')),
      '^\n+|\n+$', '', 'g')"""

ORACLE_WEB_HTML_EXTRACT = (
    "\nWITH " + _SQL_DOC_HTML_CTE + ", x AS (\n  SELECT doc_id,\n    "
    + _SQL_HTML_TO_TEXT
    + r""" AS text,
    regexp_extract_all(html, '(?i)<a\s[^>]*href\s*=\s*["'']([^"'']*)["'']', 1) AS links
  FROM h
), n AS (
  SELECT doc_id, text, len(links)::BIGINT AS n_links,
         links[1] AS u, links[2] AS v
  FROM x
), p AS (
  SELECT doc_id, text, n_links, u, v,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
    regexp_replace(lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                   '^[^@]*@', '') AS hp,
    regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1),
                   '\?$', '') AS pq
  FROM n
)
SELECT doc_id, text, n_links,
  CASE WHEN sch = '' THEN u ELSE sch || '://' ||
    CASE WHEN sch = 'http'  AND hp LIKE '%:80'  THEN substr(hp, 1, length(hp) - 3)
         WHEN sch = 'https' AND hp LIKE '%:443' THEN substr(hp, 1, length(hp) - 4)
         ELSE hp END ||
    CASE WHEN pq = '' THEN '/' ELSE pq END
  END AS self_url,
  regexp_replace(regexp_replace(
    lower(regexp_extract(v, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
    '^[^@]*@', ''), ':[0-9]+$', '') AS mirror_host
FROM p
"""
)


def q_web_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-diversity quota: derive a deterministic URL per doc
    (three host shapes per source — www .COM:80, cdn .com, apex .ORG —
    so the registrable-domain key really folds hosts), keep the 10
    longest docs per domain. One shuffle on the domain key; the rank
    filter compiles to WindowGroupLimit so heavy domains arrive
    pre-truncated per map task."""
    from nypd_arrest_etl_spark.operators.web import cap_per_domain, normalize_url

    docs = t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("HTTP://www."), F.col("source"), F.lit(".COM:80/p/"), sid))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("https://cdn."), F.col("source"), F.lit(".com/x/"), sid, F.lit("#frag")))
        .otherwise(F.concat(F.lit("https://"), F.col("source"), F.lit(".ORG/y/"), sid, F.lit("?")))
    )
    base = docs.select("doc_id", "n_chars", url.alias("url"))
    capped = cap_per_domain(base, "url", 10,
                            order_by=[F.desc("n_chars"), F.asc("doc_id")])
    return capped.select("doc_id", "domain", normalize_url("url").alias("norm_url"))


ORACLE_WEB_DOMAIN_CAP = r"""
WITH u AS (
  SELECT doc_id, n_chars,
    CASE doc_id % 3
      WHEN 0 THEN 'HTTP://www.' || source || '.COM:80/p/' || doc_id
      WHEN 1 THEN 'https://cdn.' || source || '.com/x/' || doc_id || '#frag'
      ELSE 'https://' || source || '.ORG/y/' || doc_id || '?' END AS url
  FROM documents
), h AS (
  SELECT doc_id, n_chars, url,
    regexp_replace(regexp_replace(
      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
      '^[^@]*@', ''), ':[0-9]+$', '') AS host
  FROM u
), d AS (
  SELECT doc_id, n_chars, url,
    CASE WHEN regexp_extract(host, '([^.]+\.[^.]+)$', 1) = '' THEN host
         ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1) END AS domain
  FROM h
), r AS (
  SELECT doc_id, domain, url,
    row_number() OVER (PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rk
  FROM d
), kept AS (
  SELECT doc_id, domain, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
    regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                   '^[^@]*@', '') AS hp,
    regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1),
                   '\?$', '') AS pq
  FROM r WHERE rk <= 10
)
SELECT doc_id, domain,
  CASE WHEN sch = '' THEN url ELSE sch || '://' ||
    CASE WHEN sch = 'http'  AND hp LIKE '%:80'  THEN substr(hp, 1, length(hp) - 3)
         WHEN sch = 'https' AND hp LIKE '%:443' THEN substr(hp, 1, length(hp) - 4)
         ELSE hp END ||
    CASE WHEN pq = '' THEN '/' ELSE pq END
  END AS norm_url
FROM kept
"""


def _link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic directed link graph derived from lineitem:
    part-bucket -> supplier-bucket. The asymmetric moduli (97 vs 211
    over suppkeys 1..100) leave nodes 97..100 destination-only, so the
    dangling-mass redistribution path is really exercised."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_partkey") % 97).alias("src"),
            (F.col("l_suppkey") % 211).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 3-iteration PageRank over the derived link graph — the
    oracle replays the three join+agg rounds as chained CTEs. Ranks
    sum to 1 (dangling mass redistributed)."""
    from nypd_arrest_etl_spark.operators.graph import pagerank

    return pagerank(_link_edges(spark, sf_dir), iterations=3, damping=0.85)


# The teleport-parameterized step (operators/graph.py:_step) computes
# (1-d)*t + d*(c + dm*t) with uniform t = 1.0/n, so the oracle uses the
# SAME multiplication form — (1-d)/n and dm/n are division twins that
# can differ by 1 ulp, and bit-identical arithmetic keeps the hash
# compare exact rather than leaning on the round-8 tolerance.
_PR_ITER = """
c{i} AS (SELECT e.dst AS node, sum(r.rank / d.odeg) AS c
     FROM e JOIN r{p} r ON r.node = e.src JOIN deg d ON d.src = e.src
     GROUP BY e.dst),
m{i} AS (SELECT coalesce(sum(r.rank), 0.0) AS dm
     FROM r{p} r LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL),
r{i} AS (SELECT nodes.node,
        (1.0 - 0.85) * (SELECT t FROM tn)
        + 0.85 * (coalesce(c{i}.c, 0.0) + (SELECT dm FROM m{i}) * (SELECT t FROM tn)) AS rank
     FROM nodes LEFT JOIN c{i} ON c{i}.node = nodes.node)"""

ORACLE_GRAPH_PAGERANK = (
    """
WITH e AS (SELECT DISTINCT l_partkey % 97 AS src, l_suppkey % 211 AS dst
           FROM lineitem WHERE l_partkey % 97 <> l_suppkey % 211),
nodes AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, count(*)::DOUBLE AS odeg FROM e GROUP BY src),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
tn AS (SELECT 1.0 / (SELECT n FROM nn) AS t),
r0 AS (SELECT node, (SELECT t FROM tn) AS rank FROM nodes),"""
    + ",".join(_PR_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
SELECT node, round(rank, 8) AS rank FROM r3
"""
)


def q_graph_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power iteration to an L1 fixed point (rows-only: the data-
    dependent iteration count is not SQL-expressible; convergence-vs-
    fixed-iteration agreement is unit-tested in tests/test_graph.py).
    Bounded at 25 rounds for the bench registry — power iteration
    contracts by the damping factor per round (0.85^25 ≈ 2e-2 of the
    initial error), audit-grade for rank ORDERING; production runs
    pick their own tol/cap."""
    from nypd_arrest_etl_spark.operators.graph import pagerank_converged

    ranks, _its, _converged = pagerank_converged(
        _link_edges(spark, sf_dir), tol=1e-7, max_iterations=25
    )
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def q_graph_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a deterministic seed set (every
    10th node): rank measures proximity to the seeds — the crawl-
    curation trust-propagation shape. 2 iterations, oracle-replayed
    with the teleport folded into both the restart and the dangling
    re-entry."""
    from nypd_arrest_etl_spark.operators.graph import pagerank_personalized

    edges = _link_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 10 == 0)
        .select("node", F.lit(1.0).alias("weight"))
    )
    return pagerank_personalized(edges, seeds, iterations=2, damping=0.85)


_PPR_ITER = """
c{i} AS (SELECT e.dst AS node, sum(r.rank / d.odeg) AS c
     FROM e JOIN r{p} r ON r.node = e.src JOIN deg d ON d.src = e.src
     GROUP BY e.dst),
m{i} AS (SELECT coalesce(sum(r.rank), 0.0) AS dm
     FROM r{p} r LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL),
r{i} AS (SELECT tele.node,
        (1.0 - 0.85) * tele.t
        + 0.85 * (coalesce(c{i}.c, 0.0) + (SELECT dm FROM m{i}) * tele.t) AS rank
     FROM tele LEFT JOIN c{i} ON c{i}.node = tele.node)"""

ORACLE_GRAPH_PPR_SEEDED = (
    """
WITH e AS (SELECT DISTINCT l_partkey % 97 AS src, l_suppkey % 211 AS dst
           FROM lineitem WHERE l_partkey % 97 <> l_suppkey % 211),
nodes AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, count(*)::DOUBLE AS odeg FROM e GROUP BY src),
w AS (SELECT node, CASE WHEN node % 10 = 0 THEN 1.0 ELSE 0.0 END AS w FROM nodes),
tw AS (SELECT sum(w)::DOUBLE AS total FROM w),
tele AS (SELECT node, w / (SELECT total FROM tw) AS t FROM w),
r0 AS (SELECT node, t AS rank FROM tele),"""
    + ",".join(_PPR_ITER.format(i=i, p=i - 1) for i in (1, 2))
    + """
SELECT node, round(rank, 8) AS rank FROM r2
"""
)


def q_web_psl_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact public-suffix-list registrable domains over deterministic
    hosts exercising every rule kind (multi-label suffix, wildcard,
    exception, implicit '*'). The oracle replays the full PSL
    algorithm — suffix-candidate explode, kind-split rule joins,
    exception-over-longest resolution — from the same parsed demo
    rule set. The DEMO rules are pinned explicitly (the operator now
    defaults to the bundled real ~9.5k-rule list, r10): the committed
    oracle embeds its rules as literal VALUES, so the query must keep
    using exactly those; the real list is exercised by the PSL
    project's official test vectors in tests/test_web.py."""
    from nypd_arrest_etl_spark.operators.web import (
        PSL_DEMO_RULES,
        parse_psl_rules,
        registrable_domain_psl,
    )

    docs = t(spark, sf_dir, "documents")
    host = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("www."), F.col("source"), F.lit(".co.uk")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.col("source"), F.lit(".com")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("a."), F.col("source"), F.lit(".ck")))
        .when(F.col("doc_id") % 5 == 3, F.lit("www.ck"))
        .otherwise(F.concat(F.col("source"), F.lit(".zz")))
    )
    base = docs.select("doc_id", host.alias("site_host"))
    return registrable_domain_psl(
        base, "site_host", rules=parse_psl_rules(PSL_DEMO_RULES)
    ).select("doc_id", "site_host", "registrable")


def _psl_rules_values() -> str:
    from nypd_arrest_etl_spark.operators.web import PSL_DEMO_RULES, parse_psl_rules

    return ", ".join(
        f"('{k}', {kind}, {sfx})" for k, kind, sfx in parse_psl_rules(PSL_DEMO_RULES)
    )


ORACLE_WEB_PSL_DOMAINS = rf"""
WITH rules(match_key, kind, sfx) AS (VALUES {_psl_rules_values()}),
h AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN 'www.' || source || '.co.uk'
      WHEN 1 THEN source || '.com'
      WHEN 2 THEN 'a.' || source || '.ck'
      WHEN 3 THEN 'www.ck'
      ELSE source || '.zz' END AS site_host
  FROM documents
), dh AS (SELECT DISTINCT site_host AS host FROM h),
parts AS (SELECT host, string_split(host, '.') AS p FROM dh),
cand AS (
  SELECT host, len(p)::INT AS n_labels,
         array_to_string(p[CAST(i AS INT):CAST(len(p) AS INT)], '.') AS suffix
  FROM parts, unnest(generate_series(1, len(p))) AS t(i)
),
direct AS (
  SELECT c.host, CASE WHEN r.kind = 2 THEN 1 ELSE 0 END AS is_exc, r.sfx
  FROM cand c JOIN rules r ON c.suffix = r.match_key AND r.kind <> 1
),
wild AS (
  SELECT c.host, 0 AS is_exc, r.sfx
  FROM cand c JOIN rules r
    ON regexp_replace(c.suffix, '^[^.]+\.', '') = r.match_key AND r.kind = 1
  WHERE instr(c.suffix, '.') > 0
    AND len(string_split(c.suffix, '.')) = r.sfx
),
best AS (
  SELECT host, max(is_exc * 1000000 + sfx) AS b
  FROM (SELECT * FROM direct UNION ALL SELECT * FROM wild)
  GROUP BY host
),
mapping AS (
  SELECT dh.host,
         coalesce(best.b % 1000000, 1) AS sfx,
         len(string_split(dh.host, '.'))::INT AS n_labels
  FROM dh LEFT JOIN best ON best.host = dh.host
)
SELECT h.doc_id, h.site_host,
  CASE WHEN m.n_labels > m.sfx THEN
    array_to_string(
      string_split(h.site_host, '.')[CAST(m.n_labels - m.sfx AS INT):CAST(m.n_labels AS INT)],
      '.')
  END AS registrable
FROM h JOIN mapping m ON m.host = h.site_host
"""


def q_sketch_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-text overlap between every source pair from mergeable
    KMV sketches — ONE pass over the corpus, O(sources²·k) sketch
    arithmetic after. The sketch twin of the exact
    ``dedup_source_overlap``."""
    from nypd_arrest_etl_spark.operators.scale import kmv_overlap

    docs = t(spark, sf_dir, "documents")
    return kmv_overlap(docs, "text", "source", k=128).orderBy("group_a", "group_b")


ORACLE_SKETCH_OVERLAP_SOURCES = r"""
WITH sk0 AS (
  SELECT DISTINCT source AS g,
         ('0x' || substr(md5(text), 1, 15))::BIGINT % 4294967296 AS h
  FROM documents WHERE text IS NOT NULL
), skk AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM sk0
  ) WHERE rk <= 128
), gs AS (SELECT DISTINCT g FROM skk),
tagged AS (
  SELECT least(s.g, p.g) AS ga, greatest(s.g, p.g) AS gb, s.g AS src_g, s.h AS h
  FROM skk s JOIN gs p ON s.g <> p.g
), ph AS (
  SELECT ga, gb, h, count(DISTINCT src_g) AS nsrc FROM tagged GROUP BY ga, gb, h
), rk AS (
  SELECT ga, gb, h, nsrc, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
  FROM ph
), ag AS (
  SELECT ga, gb, count(*) AS m,
         max(CASE WHEN rk = 128 THEN h END) AS kth,
         sum(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) AS ik
  FROM rk WHERE rk <= 128 GROUP BY ga, gb
)
SELECT ga AS group_a, gb AS group_b,
  CASE WHEN m < 128 THEN m::DOUBLE
       ELSE round(127 * 4294967296.0 / kth, 2) END AS union_est,
  round(ik / m::DOUBLE, 6) AS jaccard_est,
  round((ik / m::DOUBLE) *
        CASE WHEN m < 128 THEN m::DOUBLE
             ELSE 127 * 4294967296.0 / kth END, 2) AS inter_est
FROM ag
ORDER BY group_a, group_b
"""


def q_web_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-quality signals over the extractor output (same
    deterministic HTML wrap as q_web_html_extract): line-shape
    fractions + text-to-markup ratio — the FineWeb/Gopher-recipe
    signals that complete ingest -> quota -> QUALITY -> dedup. One
    map-only projection; every signal is a codegen'd higher-order
    function over a single split of the text."""
    docs = t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>"), F.col("source"), F.lit(" #"), sid,
        F.lit("</title><style>p{x:1}</style><script>var n="), sid,
        F.lit(";//<p></script></head><body><!-- id "), sid,
        F.lit(" --><h1>"), F.upper(F.col("source")), F.lit("</h1><p>"),
        F.replace(F.col("text"), F.lit("a"), F.lit("&amp;")), F.lit("</p>"),
        F.lit('<a href="HTTPS://'), F.col("source"),
        F.lit(".Example.COM:443/doc/"), sid, F.lit('?v=1#top">self</a> '),
        F.lit("<a href='http://Mirror."), F.col("source"), F.lit(".net:80/d/"),
        sid, F.lit("'>m</a><br></body></html>"),
    )
    base = docs.select(
        "doc_id",
        html.alias("page_html"),
        WB.html_to_text(html).alias("page_text"),
    )
    return WB.quality_signals(base, "page_text", html_col="page_html").drop(
        "page_html", "page_text"
    )


ORACLE_WEB_QUALITY_SIGNALS = (
    "\nWITH " + _SQL_DOC_HTML_CTE + ", x AS (\n  SELECT doc_id, html,\n    "
    + _SQL_HTML_TO_TEXT
    + r""" AS text
  FROM h
), l AS (
  SELECT doc_id, html, text,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
  FROM x
), s AS (
  SELECT doc_id,
         len(lines)::BIGINT AS n_lines,
         len(list_filter(lines, x -> length(x) < 30)) AS short_n,
         len(list_filter(lines, x -> left(x, 1) IN ('-', '*', '•'))) AS bullet_n,
         len(list_filter(lines, x -> x LIKE '%...' OR x LIKE '%…')) AS ell_n,
         len(list_filter(lines, x -> right(x, 1) IN ('.', '!', '?', '"', ''''))) AS term_n,
         len(list_distinct(lines)) AS dist_n,
         length(text) AS tl, length(html) AS hl
  FROM l
)
SELECT doc_id, n_lines,
  CASE WHEN n_lines > 0 THEN round(short_n / n_lines::DOUBLE, 8) END AS short_line_frac,
  CASE WHEN n_lines > 0 THEN round(bullet_n / n_lines::DOUBLE, 8) END AS bullet_line_frac,
  CASE WHEN n_lines > 0 THEN round(ell_n / n_lines::DOUBLE, 8) END AS ellipsis_line_frac,
  CASE WHEN n_lines > 0 THEN round(term_n / n_lines::DOUBLE, 8) END AS terminal_punct_frac,
  CASE WHEN n_lines > 0 THEN round(1.0 - dist_n / n_lines::DOUBLE, 8) END AS dup_line_frac,
  CASE WHEN hl > 0 THEN round(tl / hl::DOUBLE, 8) ELSE 0.0 END AS text_markup_ratio
FROM s
"""
)


def _cc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MULTI-component link graph from lineitem: dst is
    forced into src's residue class mod 4, so the four classes are
    mutually disconnected and component discovery has real work to do
    (>= 4 components instead of one giant blob)."""
    li = t(spark, sf_dir, "lineitem")
    src = F.col("l_partkey") % 97
    d0 = F.col("l_suppkey") % 97
    dst = d0 - (d0 % 4) + (src % 4)
    return li.select(src.alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )


def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 3-round hash-min connected components — the oracle
    replays the three propagate+fold rounds as chained CTEs (the CC
    twin of ORACLE_GRAPH_PAGERANK's shape)."""
    from nypd_arrest_etl_spark.operators.graph import connected_components

    return connected_components(_cc_edges(spark, sf_dir), rounds=3)


_CC_ITER = """
n{i} AS (SELECT u.dst AS node, min(c.comp) AS nm
     FROM und u JOIN c{p} c ON c.node = u.src GROUP BY u.dst),
c{i} AS (SELECT c.node, least(c.comp, coalesce(n{i}.nm, c.comp)) AS comp
     FROM c{p} c LEFT JOIN n{i} ON n{i}.node = c.node)"""

ORACLE_GRAPH_COMPONENTS = (
    """
WITH raw AS (
  SELECT l_partkey % 97 AS src,
         (l_suppkey % 97) - ((l_suppkey % 97) % 4) + ((l_partkey % 97) % 4) AS dst
  FROM lineitem
), f AS (SELECT src, dst FROM raw WHERE src <> dst),
und AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
nodes AS (SELECT DISTINCT src AS node FROM und),
c0 AS (SELECT node, node AS comp FROM nodes),"""
    + ",".join(_CC_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
SELECT node, comp FROM c3
"""
)


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the derived link graph — the
    local-clustering signal that separates organic link communities
    from near-bipartite spam rings. Spark side runs the
    degree-oriented compact-forward join (O(m^1.5) bound); the oracle
    replays the node-id-oriented formulation, which provably counts
    the identical triangle set."""
    from nypd_arrest_etl_spark.operators.graph import triangle_count

    return triangle_count(_link_edges(spark, sf_dir))


ORACLE_GRAPH_TRIANGLES = """
WITH e0 AS (SELECT DISTINCT l_partkey % 97 AS src, l_suppkey % 211 AS dst
            FROM lineitem WHERE l_partkey % 97 <> l_suppkey % 211),
und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
nodes AS (SELECT DISTINCT src AS node FROM und),
fwd AS (SELECT src, dst FROM und WHERE src < dst),
tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
        FROM fwd a
        JOIN fwd b ON b.src = a.dst
        JOIN fwd c ON c.src = a.src AND c.dst = b.dst),
corners AS (SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri),
cc AS (SELECT node, count(*)::BIGINT AS t FROM corners GROUP BY node)
SELECT n.node, coalesce(cc.t, 0)::BIGINT AS triangles
FROM nodes n LEFT JOIN cc ON cc.node = n.node
"""


def q_graph_components_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-min + pointer-jumping to the label fixed point (rows-only:
    the data-dependent round count is not SQL-expressible; fixed-vs-
    converged agreement and the convergence flag are unit-tested in
    tests/test_graph.py). On this graph the min labels are the true
    component ids, so the output is the final host-cluster grouping a
    crawl-dedup pass keys on."""
    from nypd_arrest_etl_spark.operators.graph import (
        connected_components_converged,
    )

    comp, _rounds, _converged = connected_components_converged(
        _cc_edges(spark, sf_dir), max_rounds=20
    )
    return comp


def q_web_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt admission over deterministic per-source robots
    bodies exercising the full RFC 9309 surface: multi-group files,
    exact-agent-over-star selection, merged rules, comments,
    empty-value rules, the §2.2.3 special characters (``/*.pdf$``
    wildcard+anchor, ``/*?session=`` mid-pattern wildcard with a
    regex-metachar to escape), §2.2.2 percent normalization (rule
    ``/doc/%70ub/`` admitting path ``/doc/p%75b/``), longest-match in
    normalized octets with the Allow tie-break, and rule-less hosts
    defaulting to allowed. Parse runs once per DISTINCT host,
    matching once per DISTINCT (host, path) — corpus rows only pay
    the final map-back join."""
    from nypd_arrest_etl_spark.operators.web import (
        robots_allowed,
        robots_rules,
    )

    docs = t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".com"),
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit("/tmp/x"), sid))
        .when(F.col("doc_id") % 7 == 1, F.concat(F.lit("/doc/9"), sid))
        .when(F.col("doc_id") % 7 == 2, F.concat(F.lit("/doc/"), sid))
        .when(F.col("doc_id") % 7 == 3, F.concat(F.lit("/about/"), sid))
        .when(F.col("doc_id") % 7 == 4, F.concat(F.lit("/doc/"), sid, F.lit(".pdf")))
        .when(F.col("doc_id") % 7 == 5, F.concat(F.lit("/doc/p%75b/"), sid))
        .otherwise(F.concat(F.lit("/doc/"), sid, F.lit("x?session="), sid)),
    )
    base = docs.select("doc_id", url.alias("url"))
    robots = (
        docs.select(F.concat(F.col("source"), F.lit(".com")).alias("host"))
        .distinct()
        .select(
            "host",
            F.lit(
                "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
                "\nUser-agent: trainbot\nUser-agent: auditbot\n"
                "Disallow: /doc/9\nAllow: /doc/\nDisallow: /tmp/\n"
                "Disallow: /*.pdf$\nAllow: /doc/%70ub/\n"
                "Disallow: /*?session=\n"
                "# comment line\nDisallow:\n"
                "\nUser-agent: otherbot\nDisallow: /\n"
            ).alias("txt"),
        )
    )
    rules = robots_rules(robots, "host", "txt", agent="trainbot")
    return robots_allowed(base, "url", rules).select("doc_id", "url", "allowed")


ORACLE_WEB_ROBOTS = r"""
WITH hosts AS (SELECT DISTINCT source || '.com' AS host FROM documents),
robots AS (
  SELECT host,
    'User-agent: *' || chr(10) || 'Disallow: /private/' || chr(10) ||
    'Allow: /private/ok' || chr(10) || chr(10) ||
    'User-agent: trainbot' || chr(10) || 'User-agent: auditbot' || chr(10) ||
    'Disallow: /doc/9' || chr(10) || 'Allow: /doc/' || chr(10) ||
    'Disallow: /tmp/' || chr(10) ||
    'Disallow: /*.pdf$' || chr(10) || 'Allow: /doc/%70ub/' || chr(10) ||
    'Disallow: /*?session=' || chr(10) ||
    '# comment line' || chr(10) ||
    'Disallow:' || chr(10) || chr(10) ||
    'User-agent: otherbot' || chr(10) || 'Disallow: /' || chr(10) AS txt
  FROM hosts
),
lines AS (
  SELECT host, i AS pos,
         trim(regexp_replace(regexp_replace(l[CAST(i AS INT)], '#.*$', ''), '\r$', '')) AS line
  FROM (SELECT host, string_split(txt, chr(10)) AS l FROM robots),
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) t
),
parsed AS (
  SELECT host, pos,
         lower(regexp_extract(line, '^([A-Za-z-]+)\s*:', 1)) AS key,
         trim(regexp_extract(line, '^[A-Za-z-]+\s*:\s*(.*)$', 1)) AS val
  FROM lines
  WHERE lower(regexp_extract(line, '^([A-Za-z-]+)\s*:', 1))
        IN ('user-agent', 'allow', 'disallow')
),
g AS (
  SELECT *, CASE WHEN key = 'user-agent' THEN 1 ELSE 0 END AS is_ua,
         coalesce(lag(CASE WHEN key = 'user-agent' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY host ORDER BY pos), 0) AS prev_ua
  FROM parsed
),
g2 AS (
  SELECT *, sum(is_ua * (1 - prev_ua))
            OVER (PARTITION BY host ORDER BY pos) AS grp
  FROM g
),
agents AS (
  SELECT host, grp,
         max(CASE WHEN lower(val) = 'trainbot' THEN 1 ELSE 0 END) AS has_agent,
         max(CASE WHEN val = '*' THEN 1 ELSE 0 END) AS has_star
  FROM g2 WHERE is_ua = 1 GROUP BY host, grp
),
hx AS (SELECT host, max(has_agent) AS any_exact FROM agents GROUP BY host),
chosen AS (
  SELECT a.host, a.grp FROM agents a JOIN hx ON hx.host = a.host
  WHERE (hx.any_exact = 1 AND a.has_agent = 1)
     OR (hx.any_exact = 0 AND a.has_star = 1)
),
rules AS (
  SELECT g2.host, g2.val AS prefix, (g2.key = 'allow') AS allow
  FROM g2 JOIN chosen ON chosen.host = g2.host AND chosen.grp = g2.grp
  WHERE g2.is_ua = 0 AND g2.val <> ''
),
rulesx AS (
  SELECT host, prefix, allow,
    l[1] || coalesce(array_to_string(
      list_transform(l[2:], seg ->
        CASE WHEN NOT regexp_matches(seg, '^[0-9A-Fa-f]{2}') THEN '%' || seg
             WHEN regexp_matches(upper(seg[1:2]),
                  '^(2[DE]|3[0-9]|4[1-9A-F]|5[0-9A]|5F|6[1-9A-F]|7[0-9A]|7E)$')
               THEN decode(from_hex(upper(seg[1:2]))) || seg[3:]
             ELSE '%' || upper(seg[1:2]) || seg[3:] END), ''), '') AS prefn
  FROM (SELECT host, prefix, allow, str_split(prefix, '%') AS l FROM rules)
),
rulesrx AS (
  SELECT host, prefix, allow, prefn,
    '^' || replace(regexp_replace(
      CASE WHEN prefn LIKE '%$' THEN prefn[1:length(prefn)-1] ELSE prefn END,
      '([.^$|?+\[\]{}()\\])', '\\\1', 'g'), '*', '.*')
    || CASE WHEN prefn LIKE '%$' THEN '$' ELSE '' END AS rx
  FROM rulesx
),
urls AS (
  SELECT doc_id,
    'http://' || source || '.com' ||
    CASE doc_id % 7
      WHEN 0 THEN '/tmp/x' || doc_id
      WHEN 1 THEN '/doc/9' || doc_id
      WHEN 2 THEN '/doc/' || doc_id
      WHEN 3 THEN '/about/' || doc_id
      WHEN 4 THEN '/doc/' || doc_id || '.pdf'
      WHEN 5 THEN '/doc/p%75b/' || doc_id
      ELSE '/doc/' || doc_id || 'x?session=' || doc_id END AS url
  FROM documents
),
up AS (
  SELECT doc_id, url,
    regexp_replace(regexp_replace(
      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
      '^[^@]*@', ''), ':[0-9]+$', '') AS host,
    CASE WHEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) = ''
         THEN '/' ELSE regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)
    END AS path
  FROM urls
),
upn AS (
  SELECT doc_id, url, host,
    l[1] || coalesce(array_to_string(
      list_transform(l[2:], seg ->
        CASE WHEN NOT regexp_matches(seg, '^[0-9A-Fa-f]{2}') THEN '%' || seg
             WHEN regexp_matches(upper(seg[1:2]),
                  '^(2[DE]|3[0-9]|4[1-9A-F]|5[0-9A]|5F|6[1-9A-F]|7[0-9A]|7E)$')
               THEN decode(from_hex(upper(seg[1:2]))) || seg[3:]
             ELSE '%' || upper(seg[1:2]) || seg[3:] END), ''), '') AS pn
  FROM (SELECT doc_id, url, host, str_split(path, '%') AS l FROM up)
),
best AS (
  SELECT u.doc_id, u.url,
         max(CASE WHEN r.prefix IS NOT NULL AND regexp_matches(u.pn, r.rx)
                  THEN strlen(r.prefn) * 2
                       + CASE WHEN r.allow THEN 1 ELSE 0 END END) AS b
  FROM upn u LEFT JOIN rulesrx r ON r.host = u.host
  GROUP BY u.doc_id, u.url
)
SELECT doc_id, url,
       CASE WHEN b IS NULL THEN TRUE ELSE b % 2 = 1 END AS allowed
FROM best
"""


def q_probe_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form linear probe (the FineWeb-Edu-style quality-scorer
    shape): fit n_chars ~ whitespace-token count in ONE aggregation
    pass (normal equations, map-side partial sums), then score every
    document with the broadcast coefficients — per-doc prediction and
    residual plus the fitted slope/intercept, all rounded so the
    engines' float-summation orders agree. The oracle re-derives the
    2x2 closed form from the same five sums."""
    from nypd_arrest_etl_spark.operators.probe import (
        fit_linear_probe,
        score_linear,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    )
    b0, b1 = fit_linear_probe(base, ["x"], "y")
    pred = score_linear(["x"], [b0, b1])
    return base.select(
        "doc_id",
        F.round(F.lit(b1), 6).alias("slope"),
        F.round(F.lit(b0), 6).alias("intercept"),
        F.round(pred, 6).alias("pred"),
        F.round(F.col("y") - pred, 6).alias("resid"),
    )


ORACLE_PROBE_LINEAR_FIT = r"""
WITH f AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+'))::DOUBLE AS x,
         n_chars::DOUBLE AS y
  FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM f
),
b AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b0
  FROM s
)
SELECT f.doc_id,
       round(b.b1, 6) AS slope,
       round(b.b0, 6) AS intercept,
       round(b.b0 + b.b1 * f.x, 6) AS pred,
       round(f.y - (b.b0 + b.b1 * f.x), 6) AS resid
FROM f CROSS JOIN b
"""


def q_probe_logistic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IRLS logistic probe (the FineWeb-Edu quality-classifier shape:
    a logistic head over a cheap engine-computed feature): 2 Newton
    steps of ``(n_chars > 250) ~ whitespace-token count``, one
    aggregation pass per step, then a map-only sigmoid scoring pass.
    Cross-engine bit-determinism comes from the fixed-point IRLS in
    operators/probe.py — per-row probabilities quantize to 1e-6 and
    every aggregated term is an exact integer summed as decimal, so
    the sums match DuckDB's regardless of summation order; the oracle
    replays both Newton steps as chained CTEs with the same 2x2
    closed form."""
    from nypd_arrest_etl_spark.operators.probe import (
        fit_logistic_probe,
        score_logistic,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("x"),
        F.when(F.col("n_chars") > 250, 1.0).otherwise(0.0).alias("y"),
    )
    b0, b1 = fit_logistic_probe(base, ["x"], "y", iterations=2)
    p = score_logistic(["x"], [b0, b1])
    return base.select(
        "doc_id",
        F.round(F.lit(b0), 6).alias("intercept"),
        F.round(F.lit(b1), 6).alias("slope"),
        F.round(p, 6).alias("p_hat"),
        (p >= 0.5).alias("pred"),
    )


def q_probe_logistic_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit-to-tolerance IRLS logistic probe (rows-only: the data-
    dependent iteration count is not SQL-expressible — the same
    registry posture as graph_*_converged; exact convergence
    semantics are unit-tested against the numpy twin in
    tests/test_probe.py). The label mixes a deterministic doc_id hash
    into the n_chars threshold — ``(n_chars + doc_id*37 % 300) > 400``
    — because the fixed-step entry's clean threshold is near-separable
    against the token count, and the logistic MLE on separable data
    DIVERGES (the converged fit would honestly cap out at 25 steps
    with converged=False; measured before choosing this target). The
    noisy band creates real class overlap, so the fit converges in
    7-8 Newton steps at every test scale. iterations_run and the
    converged flag ride every row so the contract is visible in the
    output, not swallowed driver-side."""
    from nypd_arrest_etl_spark.operators.probe import (
        fit_logistic_probe_converged,
        score_logistic,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("x"),
        F.when(
            (F.col("n_chars") + (F.col("doc_id") * 37) % 300) > 400, 1.0
        ).otherwise(0.0).alias("y"),
    )
    betas, its, converged = fit_logistic_probe_converged(base, ["x"], "y")
    p = score_logistic(["x"], betas)
    return base.select(
        "doc_id",
        F.round(F.lit(betas[0]), 6).alias("intercept"),
        F.round(F.lit(betas[1]), 6).alias("slope"),
        F.lit(its).alias("iterations_run"),
        F.lit(converged).alias("converged"),
        F.round(p, 6).alias("p_hat"),
        (p >= 0.5).alias("pred"),
    )


# One IRLS Newton step as SQL: quantize p to 1e-6 fixed point, sum the
# exact integer terms as HUGEINT, rebuild X'Wz from X'WX.beta + X'(y-p),
# solve the 2x2 with the SAME formula text as fit_logistic_probe's
# k=1 branch. {b0}/{b1} are "0" for the first step, scalar subqueries
# against the previous step's b{p} CTE after.
_LOGIT_ITER = """
i{i} AS (
  SELECT x, y6,
    CAST(least(greatest(round((1/(1+exp(-({b0} + {b1} * x)))) * 1000000, 0),
               1), 999999) AS HUGEINT) AS P
  FROM f
),
s{i} AS (
  SELECT CAST(sum(P * (1000000 - P)) AS DOUBLE) AS s0,
         CAST(sum(P * (1000000 - P) * CAST(x AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(sum(P * (1000000 - P) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS s2,
         CAST(sum(CAST(y6 AS HUGEINT) - P) AS DOUBLE) AS c0,
         CAST(sum(CAST(x AS HUGEINT) * (CAST(y6 AS HUGEINT) - P)) AS DOUBLE) AS c1
  FROM i{i}
),
b{i} AS (
  SELECT round(((s2 * t0 - s1 * t1) / det) * 1e12, 10) AS b0,
         round(((s0 * t1 - s1 * t0) / det) * 1e12, 10) AS b1
  FROM (SELECT s0, s1, s2,
               (s0 * ({b0}) + s1 * ({b1})) * 1e-12 + c0 * 1e-6 AS t0,
               (s1 * ({b0}) + s2 * ({b1})) * 1e-12 + c1 * 1e-6 AS t1,
               s0 * s2 - s1 * s1 AS det
        FROM s{i})
)"""

ORACLE_PROBE_LOGISTIC_FIT = (
    r"""
WITH f AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+'))::DOUBLE AS x,
         CASE WHEN n_chars > 250 THEN 1000000 ELSE 0 END::BIGINT AS y6
  FROM documents WHERE text IS NOT NULL
),
"""
    + ",".join(
        _LOGIT_ITER.format(
            i=i,
            b0="0" if i == 0 else f"(SELECT b0 FROM b{i - 1})",
            b1="0" if i == 0 else f"(SELECT b1 FROM b{i - 1})",
        )
        for i in (0, 1)
    )
    + """
SELECT f.doc_id,
       round(b.b0, 6) AS intercept,
       round(b.b1, 6) AS slope,
       round(1/(1+exp(-(b.b0 + b.b1 * f.x))), 6) AS p_hat,
       (1/(1+exp(-(b.b0 + b.b1 * f.x))) >= 0.5) AS pred
FROM f CROSS JOIN b1 b
"""
)


def _kcore_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-core-plus-sparse-periphery graph, stable at EVERY scale:
    a complete 25-clique over the constant nation table (internal
    degree 24 regardless of SF) overlaps a bounded-degree lineitem
    periphery (each src links to <= 7 line-number-offset neighbors,
    degree <= ~15). k=20 peeling must dissolve the periphery cascade
    and isolate exactly the clique — the spam-ring-extraction shape."""
    li = t(spark, sf_dir, "lineitem")
    srcc = F.col("l_orderkey") % 300
    dstc = (srcc * 2 + F.col("l_linenumber")) % 300
    periphery = li.select(srcc.alias("src"), dstc.alias("dst"))
    na = t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    clique = na.select(F.col("k").alias("src")).crossJoin(
        na.select(F.col("k").alias("dst"))
    )
    return periphery.union(clique).filter(F.col("src") != F.col("dst"))


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 3-round k-core peel (k=20: above the periphery's max
    degree, below the clique's internal 24) — the dense-cluster
    extractor crawl curation points at spam rings; oracle replays the
    degree-filter/edge-filter rounds as chained CTEs."""
    from nypd_arrest_etl_spark.operators.graph import k_core

    return k_core(_kcore_edges(spark, sf_dir), k=20, rounds=3)


_KCORE_ITER = """
d{i} AS (SELECT src, count(*) AS d FROM e{p} GROUP BY src),
k{i} AS (SELECT src AS node FROM d{i} WHERE d >= 20),
e{i} AS (SELECT e.src, e.dst FROM e{p} e
         JOIN k{i} a ON a.node = e.src JOIN k{i} b ON b.node = e.dst)"""

ORACLE_GRAPH_KCORE = (
    """
WITH raw AS (
  SELECT l_orderkey % 300 AS src,
         ((l_orderkey % 300) * 2 + l_linenumber) % 300 AS dst
  FROM lineitem
  UNION ALL
  SELECT a.n_nationkey AS src, b.n_nationkey AS dst FROM nation a, nation b
), f AS (SELECT src, dst FROM raw WHERE src <> dst),
e0 AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),"""
    + ",".join(_KCORE_ITER.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
SELECT node FROM k3
"""
)


def q_graph_kcore_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peel to the exact k-core fixed point (rows-only: data-dependent
    round count; fixed-vs-converged containment and the converged flag
    are unit-tested in tests/test_graph.py)."""
    from nypd_arrest_etl_spark.operators.graph import k_core_converged

    nodes, _rounds, _converged = k_core_converged(
        _kcore_edges(spark, sf_dir), k=20, max_rounds=20
    )
    return nodes


def q_web_html_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fidelity HTML extraction through the stdlib-parser mapInPandas
    path on pages that DEFEAT the regex chain: numeric character
    references (&#233; / &#xE9;) and an attribute value containing
    '>'. Rows-only (no SQL engine can replay html.parser); regex-path
    agreement on well-formed markup is property-tested in
    tests/test_web.py."""
    from nypd_arrest_etl_spark.operators.web import html_to_text_parsed

    docs = t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<div data-note="a > b"><p>caf&#233; r&#xE9;sum&#xE9; #'),
        sid, F.lit("</p><p>"), F.col("text"), F.lit("</p></div>"),
    )
    base = docs.select("doc_id", html.alias("page_html"))
    return html_to_text_parsed(base, "page_html").select("doc_id", "text")


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end drive of the WARC ingestion DataSource
    (sources/warc.py) — the crawl chain's first link: a capture
    deterministically derived from the documents table is written as
    multi-member .warc.gz files (one per task), read back through the
    registered ``warc`` source (one partition per file, Arrow-batched
    rows, streaming O(record)-memory decode), filtered to ``response``
    records past the interleaved warcinfo/request records, and reduced
    to fields the oracle recomputes from documents directly: URL,
    capture time, HTTP status, payload byte length, payload md5, and
    the parsed X-Doc HTTP header. A hash match proves record framing,
    gzip member handling, HTTP envelope parsing, and header mapping
    all byte-exact."""
    import os as _os

    from nypd_arrest_etl_spark.sources.warc import (
        build_warc_fixture,
        register_warc,
    )

    repo = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    out = _os.path.join(
        repo,
        "spark-warehouse",
        f"warc_{_os.path.basename(sf_dir.rstrip('/'))}",
    )
    build_warc_fixture(spark, sf_dir, out)
    register_warc(spark)
    # types=response: the interleaved warcinfo/request records are
    # dropped AT DECODE (reader option), never materializing as rows;
    # the residual filter is a no-op belt-and-braces.
    df = (
        spark.read.format("warc")
        .option("path", out)
        .option("types", "response")
        .load()
    )
    return df.filter(F.col("warc_type") == "response").select(
        "url",
        F.date_format("fetch_ts", "yyyy-MM-dd HH:mm:ss").alias("fetch_ts"),
        F.col("http_status").cast("int").alias("http_status"),
        F.length("body").cast("bigint").alias("content_length"),
        F.md5("body").alias("md5_body"),
        F.element_at("http_headers", F.lit("x-doc"))
        .cast("bigint")
        .alias("x_doc"),
    )


def q_web_robots_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level crawl policy from robots.txt: the group-scoped
    Crawl-delay under exact-beats-star agent selection (exact group's
    2.5 beating the star group's 10 on even hosts; a non-numeric delay
    dropped on odd hosts) and the group-independent sitemaps.org
    Sitemap records (one BEFORE any group — ignored by the rule parse,
    kept by the policy parse — one inside). Parses once per DISTINCT
    host like the rule/admission operators."""
    from nypd_arrest_etl_spark.operators.web import robots_policy

    docs = t(spark, sf_dir, "documents")
    hosts = (
        docs.select(F.concat(F.col("source"), F.lit(".com")).alias("host"))
        .distinct()
    )
    parity = (
        F.regexp_extract(F.col("host"), r"([0-9]+)\.com$", 1).cast("int") % 2
    )
    body_even = F.concat(
        F.lit("Sitemap: https://"), F.col("host"), F.lit("/top.xml\n"),
        F.lit("User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"),
        F.lit("Sitemap: https://"), F.col("host"), F.lit("/a.xml\n"),
        F.lit("\nUser-agent: trainbot\nCrawl-delay: 2.5\nAllow: /\n"),
    )
    body_odd = F.lit(
        "User-agent: *\nDisallow: /y\nCrawl-delay: bogus\n# comment\n"
    )
    robots = hosts.select(
        "host", F.when(parity == 0, body_even).otherwise(body_odd).alias("txt")
    )
    return robots_policy(robots, "host", "txt", agent="trainbot")


ORACLE_WEB_ROBOTS_POLICY = r"""
WITH hosts AS (SELECT DISTINCT source || '.com' AS host FROM documents),
par AS (
  SELECT host,
         CAST(regexp_extract(host, '([0-9]+)\.com$', 1) AS INT) % 2 AS p
  FROM hosts
)
SELECT host,
       CASE WHEN p = 0 THEN CAST(2.5 AS DOUBLE) ELSE NULL END AS crawl_delay,
       CASE WHEN p = 0
            THEN 'https://' || host || '/a.xml,https://' || host || '/top.xml'
            ELSE '' END AS sitemaps,
       CASE WHEN p = 0 THEN 2 ELSE 0 END AS n_sitemaps
FROM par
"""


def q_crawl_batch_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin of streaming/curation.py's crawl_curate_pipeline
    as ONE declarative plan: WARC capture (decode-filtered to
    ``response`` records via the reader option) -> RFC 9309 robots
    admission (with a ``/doc/*7$`` wildcard-anchor rule doing real
    work: it outranks ``Allow: /doc/`` on octet length) -> token-count
    quality gate -> per-host admission/quality accounting. Everything
    after the Python-source scan is codegen'd relational algebra; the
    oracle recomputes the whole chain from the documents table."""
    import os as _os

    from nypd_arrest_etl_spark.operators.web import (
        robots_allowed,
        robots_rules,
    )
    from nypd_arrest_etl_spark.sources.warc import (
        build_warc_fixture,
        register_warc,
    )

    repo = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    out = _os.path.join(
        repo,
        "spark-warehouse",
        f"warc_{_os.path.basename(sf_dir.rstrip('/'))}",
    )
    build_warc_fixture(spark, sf_dir, out)
    register_warc(spark)
    docs = t(spark, sf_dir, "documents")
    robots = (
        docs.select(F.concat(F.col("source"), F.lit(".example")).alias("host"))
        .distinct()
        .select(
            "host",
            F.lit(
                "User-agent: *\nDisallow: /doc/9\nAllow: /doc/\n"
                "Disallow: /doc/*7$\n"
            ).alias("txt"),
        )
    )
    rules = robots_rules(robots, "host", "txt", agent="trainbot")
    cap = (
        spark.read.format("warc")
        .option("path", out)
        .option("types", "response")
        .load()
        .select(
            "url",
            F.decode(F.col("body"), "UTF-8").alias("text"),
        )
    )
    gated = robots_allowed(cap, "url", rules)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    scored = gated.select(
        F.regexp_extract("url", r"^http://([^/]*)/", 1).alias("host"),
        F.col("allowed"),
        toks.alias("tokens"),
    ).withColumn("kept", F.col("allowed") & (F.col("tokens") >= 30))
    return scored.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.col("allowed").cast("int")).alias("n_allowed"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.round(
            F.when(
                F.sum(F.col("kept").cast("int")) > 0,
                F.sum(F.when(F.col("kept"), F.col("tokens")).otherwise(0))
                / F.sum(F.col("kept").cast("int")),
            ),
            6,
        ).alias("avg_kept_tokens"),
    )


ORACLE_CRAWL_BATCH_CHAIN = r"""
WITH f AS (
  SELECT source || '.example' AS host,
         CAST(doc_id AS VARCHAR) AS id,
         len(string_split_regex(trim(text), '\s+')) AS tokens
  FROM documents
),
g AS (
  SELECT host, tokens,
         -- longest-match in octets over the normalized rules:
         -- /doc/9 (6, disallow) > /doc/ (5, allow); /doc/*7$ (8,
         -- disallow) > /doc/ — so ids starting '9' OR ending '7'
         -- are blocked, everything else rides Allow: /doc/.
         NOT (starts_with(id, '9') OR id LIKE '%7') AS allowed
  FROM f
),
k AS (
  SELECT host, allowed, tokens,
         (allowed AND tokens >= 30) AS kept
  FROM g
)
SELECT host,
       count(*)::BIGINT AS n_records,
       sum(CASE WHEN allowed THEN 1 ELSE 0 END)::BIGINT AS n_allowed,
       sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       round(CASE WHEN sum(CASE WHEN kept THEN 1 ELSE 0 END) > 0
                  THEN sum(CASE WHEN kept THEN tokens ELSE 0 END)::DOUBLE
                       / sum(CASE WHEN kept THEN 1 ELSE 0 END)
             END, 6) AS avg_kept_tokens
FROM k
GROUP BY host
"""


ORACLE_WARC_INGEST = r"""
SELECT 'http://' || source || '.example/doc/' || doc_id AS url,
       strftime(TIMESTAMP '2020-01-01 00:00:00' + to_seconds(doc_id),
                '%Y-%m-%d %H:%M:%S') AS fetch_ts,
       200::INTEGER AS http_status,
       strlen(text)::BIGINT AS content_length,
       md5(text) AS md5_body,
       doc_id AS x_doc
FROM documents
"""


def q_warc_decode_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP body decoding proof over the four real-capture shapes
    (round 12): the fixture capture frames each document's response
    body by ``doc_id % 4`` — plain / Content-Encoding: gzip /
    Transfer-Encoding: chunked / chunked AROUND gzip — and the reader
    (sources/warc.py:decode_http_body) must undo exactly what each
    record declares. The query reconstructs the shape label from the
    surviving HTTP headers, so the grouping itself proves the headers
    were parsed, and the per-shape md5 extremes + byte totals against
    the documents table prove the payloads came back byte-exact
    through gzip member decode, chunk de-framing, and both stacked.
    ``all_decoded`` asserts the body_decoded flag end-to-end."""
    import os as _os

    from nypd_arrest_etl_spark.sources.warc import (
        build_warc_fixture,
        register_warc,
    )

    repo = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    out = _os.path.join(
        repo,
        "spark-warehouse",
        f"warc_{_os.path.basename(sf_dir.rstrip('/'))}",
    )
    build_warc_fixture(spark, sf_dir, out)
    register_warc(spark)
    cap = (
        spark.read.format("warc")
        .option("path", out)
        .option("types", "response")
        .load()
    )
    te = F.element_at("http_headers", F.lit("transfer-encoding"))
    ce = F.element_at("http_headers", F.lit("content-encoding"))
    shape = (
        F.when(te.isNotNull() & ce.isNotNull(), "chunked+gzip")
        .when(te.isNotNull(), "chunked")
        .when(ce.isNotNull(), "gzip")
        .otherwise("plain")
    )
    return (
        cap.select(
            shape.alias("shape"),
            F.length("body").cast("bigint").alias("nbytes"),
            F.md5("body").alias("m"),
            F.col("body_decoded"),
        )
        .groupBy("shape")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nbytes").alias("sum_bytes"),
            F.min("m").alias("md5_min"),
            F.max("m").alias("md5_max"),
            F.count_distinct(F.col("m")).alias("n_md5"),
            F.bool_and("body_decoded").alias("all_decoded"),
        )
    )


ORACLE_WARC_DECODE_MIX = r"""
SELECT CASE CAST(doc_id % 4 AS INT)
         WHEN 0 THEN 'plain'
         WHEN 1 THEN 'gzip'
         WHEN 2 THEN 'chunked'
         ELSE 'chunked+gzip' END AS shape,
       count(*)::BIGINT AS n_docs,
       sum(octet_length(encode(text)))::BIGINT AS sum_bytes,
       min(md5(text)) AS md5_min,
       max(md5(text)) AS md5_max,
       count(DISTINCT md5(text))::BIGINT AS n_md5,
       TRUE AS all_decoded
FROM documents
GROUP BY 1
"""


LLM_OPS: dict[str, tuple] = {
    "dedup_exact_docs": (q_dedup_exact, ORACLE_DEDUP_EXACT),
    "dedup_jaccard_pairs": (q_jaccard_pairs, ORACLE_JACCARD_PAIRS),
    "dedup_minhash_pairs": (q_minhash_pairs, ORACLE_MINHASH_PAIRS),
    "dedup_simhash_pairs": (q_simhash_pairs, ORACLE_SIMHASH_PAIRS),
    "dedup_embedding_pairs": (q_embedding_pairs, ORACLE_EMBEDDING_PAIRS),
    "dedup_contamination": (q_contamination, ORACLE_CONTAMINATION),
    "dedup_neardup_clusters": (q_neardup_clusters, ORACLE_NEARDUP_CLUSTERS),
    "similarity_topk": (q_similarity_topk, ORACLE_SIMILARITY_TOPK),
    "similarity_ann_lsh": (q_ann_lsh, ORACLE_ANN_LSH),
    "similarity_ann_ivf": (q_ann_ivf, None),
    "similarity_quantized": (q_similarity_quantized, ORACLE_SIMILARITY_QUANTIZED),
    "text_stats_docs": (q_text_stats, ORACLE_TEXT_STATS),
    "text_normalize": (q_text_normalize, ORACLE_TEXT_NORMALIZE),
    "text_chunks": (q_chunk_documents, ORACLE_CHUNK_DOCUMENTS),
    "text_repetition": (q_repetition_stats, ORACLE_REPETITION_STATS),
    "text_language_id": (q_language_id, ORACLE_LANGUAGE_ID),
    "text_quality_score": (q_quality, ORACLE_QUALITY),
    "text_fingerprints": (q_fingerprints, ORACLE_FINGERPRINTS),
    "text_containment_pairs": (q_containment, ORACLE_CONTAINMENT_PAIRS),
    "curate_corpus": (q_curation, ORACLE_CURATION),
    "multimodal_manifest": (q_multimodal_manifest, ORACLE_MULTIMODAL_MANIFEST),
    "multimodal_features": (q_media_features, ORACLE_MEDIA_FEATURES),
    "sample_stratified": (q_stratified_sample, ORACLE_STRATIFIED_SAMPLE),
    "corpus_shuffle": (q_corpus_shuffle, ORACLE_CORPUS_SHUFFLE),
    "profile_documents": (q_profile_documents, ORACLE_PROFILE_DOCUMENTS),
    "quality_constraints": (q_quality_constraints, ORACLE_QUALITY_CONSTRAINTS),
    "pii_scrub": (q_pii_scrub, ORACLE_PII_SCRUB),
    "pack_sequences": (q_pack_sequences, ORACLE_PACK_SEQUENCES),
    "sample_fixed_per_source": (q_sample_fixed, ORACLE_SAMPLE_FIXED),
    "sample_oversample_mixture": (q_oversample, ORACLE_OVERSAMPLE),
    "drift_sources": (q_drift, ORACLE_DRIFT),
    "text_lm_score": (q_text_lm_score, ORACLE_TEXT_LM_SCORE),
    "text_bpe_tokens": (q_bpe_tokens, None),
    "histogram_chars": (q_histogram_chars, ORACLE_HISTOGRAM_CHARS),
    "multimodal_frames": (q_media_frames, ORACLE_MEDIA_FRAMES),
    "multimodal_resize": (q_media_resize, ORACLE_MEDIA_RESIZE),
    "corpus_vocabulary": (q_corpus_vocabulary, ORACLE_CORPUS_VOCABULARY),
    "dedup_span_stats": (q_span_dedup, ORACLE_SPAN_DEDUP),
    "split_train_holdout": (q_split_train_holdout, ORACLE_SPLIT_TRAIN_HOLDOUT),
    "text_bm25_topk": (q_bm25_topk, ORACLE_BM25_TOPK),
    "curate_quality_top_frac": (q_quality_top_frac, ORACLE_QUALITY_TOP_FRAC),
    "dedup_source_overlap": (q_source_overlap, ORACLE_SOURCE_OVERLAP),
    "text_containment_capped": (q_containment_capped, ORACLE_CONTAINMENT_CAPPED),
    "dedup_keep_best": (q_dedup_keep_best, ORACLE_DEDUP_KEEP_BEST),
    "dedup_span_trim": (q_span_trim, ORACLE_SPAN_TRIM),
    "sample_importance_dsir": (q_dsir_sample, ORACLE_DSIR_SAMPLE),
    "dedup_semantic": (q_semantic_dedup, None),
    "mixture_temperature": (q_mixture_temperature, ORACLE_MIXTURE_TEMPERATURE),
    "ccnet_buckets": (q_ccnet_buckets, ORACLE_CCNET_BUCKETS),
    "similarity_ann_pq": (q_ann_pq, None),
    "text_tfidf_topk": (q_tfidf_topk, ORACLE_TFIDF_TOPK),
    "corpus_zipf": (q_corpus_zipf, ORACLE_CORPUS_ZIPF),
    "web_html_extract": (q_web_html_extract, ORACLE_WEB_HTML_EXTRACT),
    "web_domain_cap": (q_web_domain_cap, ORACLE_WEB_DOMAIN_CAP),
    "graph_pagerank": (q_graph_pagerank, ORACLE_GRAPH_PAGERANK),
    "graph_pagerank_converged": (q_graph_pagerank_converged, None),
    "graph_ppr_seeded": (q_graph_ppr_seeded, ORACLE_GRAPH_PPR_SEEDED),
    "web_psl_domains": (q_web_psl_domains, ORACLE_WEB_PSL_DOMAINS),
    "sketch_overlap_sources": (q_sketch_overlap_sources, ORACLE_SKETCH_OVERLAP_SOURCES),
    "web_quality_signals": (q_web_quality_signals, ORACLE_WEB_QUALITY_SIGNALS),
    "graph_components": (q_graph_components, ORACLE_GRAPH_COMPONENTS),
    "graph_components_converged": (q_graph_components_converged, None),
    "graph_triangles": (q_graph_triangles, ORACLE_GRAPH_TRIANGLES),
    "web_robots": (q_web_robots, ORACLE_WEB_ROBOTS),
    "probe_linear_fit": (q_probe_linear_fit, ORACLE_PROBE_LINEAR_FIT),
    "graph_kcore": (q_graph_kcore, ORACLE_GRAPH_KCORE),
    "graph_kcore_converged": (q_graph_kcore_converged, None),
    "web_html_parsed": (q_web_html_parsed, None),
    "warc_ingest": (q_warc_ingest, ORACLE_WARC_INGEST),
    "web_robots_policy": (q_web_robots_policy, ORACLE_WEB_ROBOTS_POLICY),
    "probe_logistic_fit": (q_probe_logistic_fit, ORACLE_PROBE_LOGISTIC_FIT),
    "crawl_batch_chain": (q_crawl_batch_chain, ORACLE_CRAWL_BATCH_CHAIN),
    "warc_decode_mix": (q_warc_decode_mix, ORACLE_WARC_DECODE_MIX),
    "probe_logistic_converged": (q_probe_logistic_converged, None),
}
