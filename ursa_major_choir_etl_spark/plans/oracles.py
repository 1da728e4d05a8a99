"""DuckDB oracle SQL codegen.

Each helper emits ANSI-ish SQL that recomputes EXACTLY what the
corresponding Spark expression computes (same regex classes — \\p{L}
works in both Java regex and RE2 — same md5-based hashing, same
rounding), so the driver's value-hash comparison is meaningful.

DuckDB specifics honored here:
- regexp_replace needs the 'g' flag to replace all (Spark always does);
- lists are 1-indexed;
- string_split_regex mirrors Spark's split().
"""

from __future__ import annotations

from ursa_major_choir_etl_spark.operators.text import LANG_MARKERS, STOPWORDS_EN

WORDY = r"[\p{L}\p{N}_]"


def norm_text_sql(col: str = "text") -> str:
    """Mirror of operators.text.normalized_text."""
    return (
        "trim(regexp_replace(regexp_replace(lower("
        + col
        + "), '[^" + WORDY[1:-1] + r"\s]', '', 'g'), '\\s+', ' ', 'g'))"
    )


def tokens_sql(col: str) -> str:
    """Mirror of operators.text.tokens (call on non-empty text)."""
    return f"string_split_regex(trim({col}), '\\s+')"


def token_count_sql(col: str = "text") -> str:
    return f"len({tokens_sql(col)})"


def pieces_sql(col: str = "text") -> str:
    wordy = WORDY[1:-1]
    return (
        f"len(regexp_extract_all({col}, '([{wordy}]+|[^{wordy}\\s])'))"
    )


def punct_ratio_sql(col: str = "text") -> str:
    wordy = WORDY[1:-1]
    stripped = f"regexp_replace({col}, '[^{wordy}\\s]', '', 'g')"
    return (
        f"CASE WHEN length({col}) > 0 THEN "
        f"(length({col}) - length({stripped})) * 1.0 / length({col}) "
        f"ELSE 0.0 END"
    )


def _list_lit(words: list[str]) -> str:
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"[{inner}]"


def stopword_ratio_sql(col: str = "text") -> str:
    toks = tokens_sql(f"lower({col})")
    sw = _list_lit(STOPWORDS_EN)
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, x -> list_contains({sw}, x))) * 1.0 / len({toks}) "
        f"ELSE 0.0 END"
    )


def quality_score_sql(col: str = "text") -> str:
    n_tok = f"({token_count_sql(col)} * 1.0)"
    len_comp = f"least({n_tok} / 100.0, 1.0)"
    sw_comp = f"least(({stopword_ratio_sql(col)}) * 4.0, 1.0)"
    punct_pen = f"least(({punct_ratio_sql(col)}) * 4.0, 1.0)"
    return f"round(0.5 * {len_comp} + 0.3 * {sw_comp} + 0.2 * (1.0 - {punct_pen}), 6)"


def language_id_sql(col: str = "text") -> str:
    """Mirror of operators.text.language_id's fold (strictly-greater
    update, langs visited in sorted order)."""
    toks = tokens_sql(f"lower({col})")
    best_lang, best_hits = "'und'", "0"
    for lang in sorted(LANG_MARKERS):
        markers = _list_lit(LANG_MARKERS[lang])
        hits = f"len(list_filter({toks}, x -> list_contains({markers}, x)))"
        best_lang = f"(CASE WHEN {hits} > {best_hits} THEN '{lang}' ELSE {best_lang} END)"
        best_hits = f"greatest({hits}, {best_hits})"
    return best_lang


def fingerprint_sql(col: str = "text") -> str:
    return f"md5({norm_text_sql(col)})"


def shingles_cte_sql(n: int = 3, table: str = "documents") -> str:
    """CTE producing distinct (doc_id, shingle) word-n-grams over the
    normalized text. Mirror of operators.dedup.word_shingles."""
    norm = norm_text_sql("text")
    join_words = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
shingled AS (
  SELECT doc_id, t, len(t) AS L
  FROM (SELECT doc_id, {tokens_sql(norm)} AS t FROM {table})
),
doc_shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(L - {n - 2}, 1)),
                                 i -> {join_words})) AS shingle
    FROM shingled
    WHERE L >= {n}
  )
)"""


def minhash_select_sql(num_hashes: int = 8) -> str:
    """SELECT list computing mh_0..mh_{k-1} from doc_shingles."""
    cols = ", ".join(
        f"min(md5('{k}' || ':' || shingle)) AS mh_{k}" for k in range(num_hashes)
    )
    return f"SELECT doc_id, {cols} FROM doc_shingles GROUP BY doc_id"


def lsh_bands_sql(num_hashes: int = 8, bands: int = 4) -> str:
    """From a `sigs` CTE, produce candidate pairs via banded buckets."""
    rows = num_hashes // bands
    band_exprs = ", ".join(
        "('"
        + str(b)
        + "' || '|' || "
        + " || '|' || ".join(f"mh_{b * rows + r}" for r in range(rows))
        + ")"
        for b in range(bands)
    )
    return f"""
banded AS (
  SELECT doc_id, unnest([{band_exprs}]) AS band_key FROM sigs
)
SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
FROM banded l JOIN banded r
  ON l.band_key = r.band_key AND l.doc_id < r.doc_id"""


def sign_lsh_keys_cte_sql(
    planes_per_band: int = 4,
    n_bands: int = 16,
    seed: int = 42,
    dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cte_name: str = "lsh_keys",
) -> str:
    """CTEs producing ``{cte_name}(vec_id, band, bkey)`` — the exact
    band signatures of operators.similarity.banded_signatures.

    The plane constants are the SAME md5-derived int64s the Spark
    operator regenerates per task (similarity.deterministic_planes),
    embedded as literals; vectors are trunc-quantized to int64 micros.
    Every projection is a sum of 64 integer products < 2^42, exact in
    float64 regardless of summation order — so the bucket keys match
    Spark's bit-for-bit and banded-LSH results become value-hashable.
    """
    from ursa_major_choir_etl_spark.operators.similarity import (
        deterministic_planes,
    )

    planes = deterministic_planes(planes_per_band * n_bands, dims, seed)
    rows = []
    for p_global in range(planes.shape[0]):
        band, p = divmod(p_global, planes_per_band)
        coefs = ", ".join(f"{c}.0" for c in planes[p_global])
        rows.append(f"({band}, {p}, [{coefs}])")
    values = ",\n    ".join(rows)
    return f"""
planes(band, p, coefs) AS (
  SELECT * FROM (VALUES
    {values}
  ) AS t(band, p, coefs)
),
qvec AS (
  SELECT {id_col} AS vec_id,
         list_transform({vec_col}::DOUBLE[],
                        x -> trunc(x * 1000000.0)) AS qv
  FROM {table}
),
{cte_name} AS (
  SELECT vec_id, band,
         CAST(sum(CASE WHEN list_dot_product(qv, coefs) > 0
                       THEN (1 << p) ELSE 0 END) AS BIGINT) AS bkey
  FROM qvec CROSS JOIN planes
  GROUP BY vec_id, band
)"""


def simhash_select_sql(bits: int = 32, table: str = "documents") -> str:
    """Full query computing the 32-bit md5-nibble SimHash per doc.
    Mirror of operators.dedup.simhash32."""
    norm = norm_text_sql("text")
    votes = ", ".join(
        f"sum(CASE WHEN instr('89abcdef', substr(h, {j + 1}, 1)) > 0 "
        f"THEN 1 ELSE -1 END) AS v_{j}"
        for j in range(bits)
    )
    bit_concat = " || ".join(
        f"(CASE WHEN v_{j} > 0 THEN '1' ELSE '0' END)" for j in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql(norm)}) AS token FROM {table}
),
hashed AS (SELECT doc_id, md5(token) AS h FROM toks),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, {bit_concat} AS simhash FROM votes"""


def simhash64_select_sql(table: str = "documents") -> str:
    """Full query computing the 64-bit double-md5 SimHash per doc.
    Mirror of operators.dedup.simhash64: bits 0-31 vote on
    md5(token) nibbles, bits 32-63 on md5('#' || token)."""
    norm = norm_text_sql("text")
    votes = ", ".join(
        f"sum(CASE WHEN instr('89abcdef', "
        f"substr({'h0' if j < 32 else 'h1'}, {(j % 32) + 1}, 1)) > 0 "
        f"THEN 1 ELSE -1 END) AS v_{j}"
        for j in range(64)
    )
    bit_concat = " || ".join(
        f"(CASE WHEN v_{j} > 0 THEN '1' ELSE '0' END)" for j in range(64)
    )
    return f"""
WITH toks64 AS (
  SELECT doc_id, unnest({tokens_sql(norm)}) AS token FROM {table}
),
hashed64 AS (
  SELECT doc_id, md5(token) AS h0, md5('#' || token) AS h1 FROM toks64
),
votes64 AS (SELECT doc_id, {votes} FROM hashed64 GROUP BY doc_id)
SELECT doc_id, {bit_concat} AS simhash FROM votes64"""
