"""CLK Bloom-filter PPRL vs a pure-Python replica (bit-exact encodings,
integer Dice), plus similarity-semantics sanity (typo robustness)."""

import hashlib

from pyspark.sql import functions as F

from bayesianrecordlinkage_jl_spark.functions.text import MH_PRIME
from bayesianrecordlinkage_jl_spark.operators import pprl


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _clk_bits(key: str) -> set:
    grams = [key[i : i + 2] for i in range(max(len(key) - 1, 1))]
    bits = set()
    for i in range(pprl.K_HASH):
        h = hashlib.md5(f"clk{i}".encode()).hexdigest()
        a = int(h[:8], 16) % (MH_PRIME - 1) + 1
        b = int(h[8:16], 16) % MH_PRIME
        for g in grams:
            bits.add((a * (_ph(g) % MH_PRIME) + b) % MH_PRIME % pprl.L_BITS)
    return bits


def _brute_dice(rows, min_dice_micro):
    out = {}
    enc = {i: _clk_bits(k) for i, k, _ in rows}
    blocks: dict = {}
    for i, _, blk in rows:
        blocks.setdefault(blk, []).append(i)
    for members in blocks.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = sorted((members[ai], members[bi]))
                na, nb = len(enc[a]), len(enc[b])
                inter = len(enc[a] & enc[b])
                dice = (
                    (2 * inter * pprl.DICE_SCALE) // (na + nb)
                    if na + nb else 0
                )
                if dice >= min_dice_micro:
                    out[(a, b)] = (na, nb, inter, dice)
    return out


def test_clk_encode_matches_replica(spark):
    rows = [(1, "john smith", "x"), (2, "jon smith", "x"),
            (3, "zzz qqq vvv", "x")]
    df = spark.createDataFrame(rows, "doc_id long, key string, blk string")
    enc = {
        r["doc_id"]: r.asDict()
        for r in pprl.clk_encode(df, "doc_id", F.col("key"), ("blk",)).collect()
    }
    for i, k, _ in rows:
        bits = _clk_bits(k)
        assert enc[i]["nbits"] == len(bits)
        words = [0] * pprl.N_WORDS
        for p in bits:
            words[p // pprl.BITS_PER_WORD] |= 1 << (p % pprl.BITS_PER_WORD)
        assert [enc[i][f"w{w}"] for w in range(pprl.N_WORDS)] == words


def test_clk_dice_matches_replica_and_ranks_typos(spark):
    rows = [
        (1, "john smith", "x"),
        (2, "jon smith", "x"),     # one-char typo: high Dice
        (3, "john smyth", "x"),
        (4, "completely other", "x"),
        (5, "john smith", "y"),    # other block: never paired with 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string, blk string")
    got = {
        (r["id_a"], r["id_b"]): (
            r["nbits_a"], r["nbits_b"], r["inter_bits"], r["dice_micro"]
        )
        for r in pprl.clk_dice_pairs(
            df, "doc_id", F.col("key"), block_cols=("blk",),
            min_dice_micro=0,
        ).collect()
    }
    assert got == _brute_dice(rows, 0)
    assert (1, 5) not in got
    # typo pairs beat the unrelated pair and clear the default threshold
    assert got[(1, 2)][3] > got[(1, 4)][3]
    assert got[(1, 2)][3] >= 500_000 and got[(1, 3)][3] >= 500_000
    assert got[(1, 4)][3] < 500_000


def test_clk_band_pairs_recall_and_precision(spark):
    # mixed fixture: typo families + unrelated keys; no blocking column
    rows = [
        (1, "john smith"), (2, "jon smith"), (3, "john smyth"),
        (4, "maria garcia"), (5, "maria garcya"),
        (6, "completely other words"), (7, "zzz qqq"),
        (8, "john smith"),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    got = {
        (r["id_a"], r["id_b"]): r["dice_micro"]
        for r in pprl.clk_band_pairs(
            df, "doc_id", F.col("key"), min_dice_micro=500_000
        ).collect()
    }
    # brute force over ALL pairs (the banded join has no blocking key)
    brute = _brute_dice([(i, k, "all") for i, k in rows], 500_000)
    # precision 1: every emitted pair is a true >=threshold pair
    for p, dice in got.items():
        assert p in brute and brute[p][3] == dice
    # pigeonhole recall: every true pair with Hamming < N_BANDS is found
    for p, (na, nb, inter, dice) in brute.items():
        if na + nb - 2 * inter < pprl.N_BANDS:
            assert p in got, p
    # the exact dup scores 1.0
    assert got[(1, 8)] == pprl.DICE_SCALE
