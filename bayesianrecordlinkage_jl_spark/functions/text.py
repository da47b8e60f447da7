"""Text-analysis column functions for web-scale training-data pipelines.

All functions are pure Catalyst expressions (JVM-side, codegen-friendly;
zero Python UDFs) and each has a DuckDB-SQL twin generated from the same
constants so the driver's oracle check can verify them value-for-value.

Cross-engine portable hash: the first 15 hex chars of md5 parsed as a
60-bit non-negative bigint — identical in Spark (conv) and DuckDB (0x cast).

Covers: tokenization/token counts, k-word shingles, MinHash signatures,
SimHash fingerprints, n-gram language-ID heuristic, quality scoring,
document fingerprinting (sorted-token md5).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# portable 60-bit hash
# ---------------------------------------------------------------------------


def phash(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def phash_sql(c: str) -> str:
    return f"CAST(('0x' || substr(md5({c}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# tokens & shingles
# ---------------------------------------------------------------------------

TOKEN_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """Whitespace/punct tokenization of lowercased text (BPE-ish regex split)."""
    return F.filter(F.split(F.lower(text), TOKEN_RE), lambda t: t != "")


def tokens_sql(text: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({text}), '{TOKEN_RE}'), t -> t != '')"
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def token_count_sql(text: str) -> str:
    return f"CAST(len({tokens_sql(text)}) AS BIGINT)"


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles: array of space-joined token windows."""
    toks = tokens(text)
    n = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )


def word_shingles_sql(text: str, k: int = 3) -> str:
    toks = tokens_sql(text)
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {k - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' '))"
    )


# ---------------------------------------------------------------------------
# MinHash: signature value j = min over shingles s of phash('mh{j}:' || s).
# One column per hash function keeps everything codegen'd (no explode).
# ---------------------------------------------------------------------------


def minhash_col(text: Column, seed: int, k: int = 3) -> Column:
    sh = word_shingles(text, k)
    return F.array_min(F.transform(sh, lambda s: phash(F.concat(F.lit(f"mh{seed}:"), s))))


def minhash_col_sql(text: str, seed: int, k: int = 3) -> str:
    sh = word_shingles_sql(text, k)
    inner = phash_sql(f"'mh{seed}:' || s")
    return f"list_min(list_transform({sh}, s -> {inner}))"


def minhash_band(text: Column, band: int, rows_per_band: int = 2, k: int = 3) -> Column:
    """LSH band key: concat of `rows_per_band` minhash values for this band."""
    parts = [
        minhash_col(text, band * rows_per_band + r, k).cast("string")
        for r in range(rows_per_band)
    ]
    return F.concat_ws("_", F.lit(str(band)), *parts)


def minhash_band_sql(text: str, band: int, rows_per_band: int = 2, k: int = 3) -> str:
    parts = [
        f"CAST({minhash_col_sql(text, band * rows_per_band + r, k)} AS VARCHAR)"
        for r in range(rows_per_band)
    ]
    return f"concat_ws('_', '{band}', " + ", ".join(parts) + ")"


# ---------------------------------------------------------------------------
# SimHash (nbits-wide) over distinct tokens.
# bit b set  <=>  sum over distinct tokens of (+1 if bit b of phash(tok) else -1) > 0
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(text: Column, nbits: int = SIMHASH_BITS) -> Column:
    toks = F.array_distinct(tokens(text))
    hashes = F.transform(toks, lambda t: phash(t))

    def bit_vote(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    out = F.lit(0).cast("long")
    for b in range(nbits):
        out = out + F.when(bit_vote(b) > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_sql(text: str, nbits: int = SIMHASH_BITS) -> str:
    toks = f"list_distinct({tokens_sql(text)})"
    hashes = f"list_transform({toks}, t -> {phash_sql('t')})"
    terms = []
    for b in range(nbits):
        vote = (
            f"list_sum(list_transform({hashes}, "
            f"h -> CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two bigint fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def hamming64_sql(a: str, b: str) -> str:
    return f"bit_count(xor({a}, {b}))"


# ---------------------------------------------------------------------------
# language-ID heuristic: stopword-hit ratio per language, argmax with
# deterministic tie-break on language code.
# ---------------------------------------------------------------------------

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "como"],
}


def lang_id(text: Column) -> Column:
    toks = F.array_distinct(tokens(text))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    langs = sorted(STOPWORDS)  # deterministic tie-break: first in code order wins
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):
        s = scores[lang]
        best = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, s)
    return best


def lang_id_sql(text: str) -> str:
    toks = f"list_distinct({tokens_sql(text)})"
    langs = sorted(STOPWORDS)
    score = {
        lang: f"len(list_intersect({toks}, {STOPWORDS[lang]!r}))" for lang in langs
    }
    # Mirror the Spark fold exactly: iterate langs reversed, prefer s >= max(best,1).
    best = "'und'"
    best_score = "0"
    for lang in reversed(langs):
        s = score[lang]
        best = f"(CASE WHEN {s} >= greatest({best_score}, 1) THEN '{lang}' ELSE {best} END)"
        best_score = f"greatest({best_score}, {s})"
    return best


# ---------------------------------------------------------------------------
# quality score: deterministic 0..1-ish composite (integer ratios scaled).
# Uses only integer counts and one final division so doubles match.
# ---------------------------------------------------------------------------


def quality_score(text: Column) -> Column:
    n_chars = F.length(text)
    toks = tokens(text)
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # length component (0..40) + diversity component (0..60), /100
    len_pts = F.least(n_chars, F.lit(400)) / F.lit(10.0)
    div_pts = (n_distinct * F.lit(60.0)) / F.greatest(n_tok, F.lit(1))
    return (len_pts + div_pts) / F.lit(100.0)


def quality_score_sql(text: str) -> str:
    toks = tokens_sql(text)
    len_pts = f"(least(length({text}), 400) / 10.0)"
    div_pts = f"(len(list_distinct({toks})) * 60.0 / greatest(len({toks}), 1))"
    return f"(({len_pts} + {div_pts}) / 100.0)"


# ---------------------------------------------------------------------------
# document fingerprint: md5 of space-joined sorted distinct tokens
# (rolling-hash-style content identity robust to token order).
# ---------------------------------------------------------------------------


def doc_fingerprint(text: Column) -> Column:
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def doc_fingerprint_sql(text: str) -> str:
    return f"md5(array_to_string(list_sort(list_distinct({tokens_sql(text)})), ' '))"
