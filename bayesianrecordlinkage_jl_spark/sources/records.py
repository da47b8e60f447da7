"""Vignette-equivalent synthetic person-record fixture (FIXTURES.md §3).

Analog of the reference's two-file fixture (/root/reference/vignette/data/
dataA.txt, dataB.txt: 600 records each, first 300 of A match first 300 of B,
dataB perturbed with typos and NA injection — e.g. dataA.txt:2 "mccarthy"
vs dataB.txt:2 "mccartxhy"). Generated deterministically from Catalyst
expressions; no external data copied.

Schema: (rec_id string, gender string, gname string, fname string,
postcode string, age string, occup string) — strings throughout, "NA" for
missing, matching the reference's tab-file conventions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.text import phash
from .pages import VOCAB


def _h(*parts) -> Column:
    cols = [p if isinstance(p, Column) else F.lit(p) for p in parts]
    return phash(F.concat_ws(":", *[c.cast("string") for c in cols]))


def _pick(arr: list[str], h: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(x) for x in arr]), (F.pmod(h, len(arr)) + 1).cast("int")
    )


def _name(prefix: str, i: Column, seed: str) -> Column:
    """Deterministic pseudo-name: two vocab syllables + id-derived suffix."""
    return F.concat(
        _pick(VOCAB, _h(seed, prefix, "n1", i)),
        _pick(VOCAB, _h(seed, prefix, "n2", i)),
    )


def _typo(s: Column) -> Column:
    """Insert 'x' after the 3rd char (the vignette's corruption style)."""
    return F.concat(
        s.substr(F.lit(1), F.lit(3)), F.lit("x"), s.substr(F.lit(4), F.length(s))
    )


def generate_records(
    spark: SparkSession, n: int = 600, n_match: int = 300, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """-> (records_a, records_b); record i of A matches record i of B for
    i < n_match (rec_id carries the ground truth: 'r{i}')."""
    s = str(seed)
    base = spark.range(n).withColumnRenamed("id", "i")

    def fields(src: str) -> DataFrame:
        # B's non-matching tail draws from a disjoint hash stream
        key = F.when(
            (F.lit(src) == "B") & (F.col("i") >= n_match), F.col("i") + 1_000_000
        ).otherwise(F.col("i"))
        df = base.withColumn(
            "rec_id", F.concat(F.lit(f"{src.lower()}"), F.col("i").cast("string"))
        )
        df = df.withColumn("gender", _pick(["m", "f"], _h(s, "g", key)))
        df = df.withColumn("gname", _name("gname", key, s))
        df = df.withColumn("fname", _name("fname", key, s))
        df = df.withColumn(
            "postcode",
            F.lpad(F.pmod(_h(s, "pc", key), 10000).cast("string"), 4, "0"),
        )
        df = df.withColumn("age", F.pmod(_h(s, "age", key), 80).cast("string"))
        df = df.withColumn("occup", _pick(VOCAB[:10], _h(s, "oc", key)))
        if src == "B":
            # perturb matched rows: typo gname with prob ~1/3, NA-out age/occup
            df = df.withColumn(
                "gname",
                F.when(
                    (F.col("i") < n_match) & (F.pmod(_h(s, "tg", key), 3) == 0),
                    _typo(F.col("gname")),
                ).otherwise(F.col("gname")),
            )
            df = df.withColumn(
                "age",
                F.when(F.pmod(_h(s, "na", key), 10) == 0, F.lit("NA")).otherwise(
                    F.col("age")
                ),
            )
            df = df.withColumn(
                "occup",
                F.when(F.pmod(_h(s, "no", key), 10) == 1, F.lit("NA")).otherwise(
                    F.col("occup")
                ),
            )
        return df.select(
            "rec_id", "i", "gender", "gname", "fname", "postcode", "age", "occup"
        )

    return fields("A"), fields("B")


def read_tab_records(spark: SparkSession, path: str) -> DataFrame:
    """Tab-delimited record-table scan — the reference's literal input path
    (readdlm(path, '\\t', String, header=true),
    /root/reference/vignette/example.jl:10-11): header row, every column
    read as string, "NA" preserved verbatim (missingness is handled by the
    comparators' NULL/NA conventions, not the scan)."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("inferSchema", "false")
        .csv(path)
    )


def write_tab_records(df: DataFrame, path: str) -> None:
    """Tab-delimited writer (round-trip twin of read_tab_records)."""
    df.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(path)
