"""Phonetic (simplified-Soundex) key + blocking tests.

The key is the documented engine-portable variant: H/W code to 0 like
vowels (separators), everything else standard Soundex. Tests pin known
answers, cross-engine bit parity, a pure-Python replica on random
strings, and the pairs operator against a brute-force replica.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.functions import text as T
from bayesianrecordlinkage_jl_spark.operators import blocking

KNOWN = {
    "Robert": "R163",
    "Rupert": "R163",
    "Tymczak": "T522",
    "Adam": "A350",
    "Pfister": "P236",
    "Jackson": "J250",
    "Washington": "W252",
    "aeiou": "A000",
    "123": "000",
    "": "000",
    "  spaces  only ": "S122",
}


def _replica(s: str) -> str:
    """Pure-Python simplified Soundex (H/W = separators like vowels)."""
    u = "".join(ch for ch in s.upper() if "A" <= ch <= "Z")
    m = "01230120022455012623010202"
    d = "".join(m[ord(ch) - 65] for ch in u)
    out = []
    for ch in d:
        if not out or out[-1] != ch:
            out.append(ch)
    c = "".join(out)
    rest = c[1:].replace("0", "")
    return (u[:1] + (rest[:3] + "000")[:3])[:4].ljust(3, "0") if u else "000"


def test_replica_known_answers():
    for s, want in KNOWN.items():
        assert _replica(s) == want, s


def test_spark_key_known_answers(spark):
    rows = [(i, s) for i, (s, _) in enumerate(KNOWN.items())]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {
        r["s"]: r["k"]
        for r in df.select("s", T.phonetic_key("s").alias("k")).collect()
    }
    assert got == KNOWN


def test_spark_column_path_matches_name_path(spark):
    rows = [(i, s) for i, s in enumerate(KNOWN)]
    df = spark.createDataFrame(rows, "i long, s string")
    both = df.select(
        T.phonetic_key("s").alias("a"),
        T.phonetic_key(F.col("s")).alias("b"),
    ).collect()
    for r in both:
        assert r["a"] == r["b"]


@pytest.mark.parametrize("seed", range(4))
def test_cross_engine_and_replica_random(spark, seed):
    import random

    rng = random.Random(4400 + seed)
    alphabet = "abcdefghijklmnopqrstuvwxyzAEIOUHW '-.019é"
    strs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 14)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "i long, s string"
    )
    got = {
        r["i"]: r["k"]
        for r in df.select("i", T.phonetic_key("s").alias("k")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(strs):
        want = _replica(s)
        assert got[i] == want, (s, got[i], want)
        lit = "'" + s.replace("'", "''") + "'"
        dd = con.execute(f"SELECT {T.phonetic_key_sql(lit)}").fetchone()[0]
        assert dd == want, (s, dd, want)


def test_phonetic_key_null_is_null(spark):
    df = spark.createDataFrame([(1, None)], "i long, s string")
    assert df.select(T.phonetic_key("s").alias("k")).collect()[0]["k"] is None


def _brute_pairs(rows, bcols_of, key_of):
    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            if bcols_of(a) == bcols_of(b) and key_of(a) == key_of(b):
                x, y = sorted((a[0], b[0]))
                out.add((x, y))
    return out


def test_phonetic_blocking_pairs_brute(spark):
    rows = [
        (1, "robert smith", "en"),
        (2, "rupert jones", "en"),
        (3, "robert smith", "de"),
        (4, "adam x", "en"),
        (5, "rupprecht y", "en"),  # R162 — near-collision, not in R163
        (6, "", "en"),
        (7, "42", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["id_a"], r["id_b"])
        for r in blocking.phonetic_blocking_pairs(
            df, "doc_id", F.regexp_extract(F.col("text"), "^[^ ]+", 0),
            ["lang"],
        ).collect()
    }
    want = _brute_pairs(
        rows,
        lambda r: r[2],
        lambda r: _replica(r[1].split(" ")[0] if r[1] else ""),
    )
    assert got == want
    assert (1, 2) in got          # Robert/Rupert phonetic collision
    assert (1, 3) not in got      # lang block separates
    assert (6, 7) in got          # letterless '000' bucket


def test_phonetic_blocking_salt_caps_bucket(spark):
    rows = [(i, "robert", "en") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    full = blocking.phonetic_blocking_pairs(
        df, "doc_id", F.col("text"), ["lang"], max_bucket_rows=None
    ).count()
    capped = blocking.phonetic_blocking_pairs(
        df, "doc_id", F.col("text"), ["lang"], max_bucket_rows=4
    ).count()
    assert full == 66
    assert 0 < capped < full
