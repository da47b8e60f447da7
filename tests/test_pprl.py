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


def test_k_anonymity_profile_hand_fixture(spark):
    """Hand corpus where the k/l verdict per generalization level is
    known exactly, validated against a pandas replay."""
    from bayesianrecordlinkage_jl_spark.operators import pprl as P

    rows = []
    did = 0
    # (lang, source, n_chars): one singleton class at level 0,
    # suppressed progressively up the ladder
    for lang, src, n, reps in [
        ("en", "a", 50, 6),    # class (en,a,0) x6
        ("en", "a", 150, 1),   # class (en,a,1) x1  -> breaks k at L0
        ("en", "b", 50, 5),
        ("fr", "a", 250, 7),
    ]:
        for _ in range(reps):
            rows.append((did, "t", lang, src, n))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r["level"]: (
            r["n_classes"], r["min_class"], r["max_class"], r["n_below_k"],
            r["l_min"], r["is_k_anonymous"], r["is_l_diverse"],
        )
        for r in P.k_anonymity_profile(df).collect()
    }
    # L0 classes: (en,a,0)=6, (en,a,1)=1, (en,b,0)=5, (fr,a,2)=7
    assert got[0] == (4, 1, 7, 1, 1, 0, 0)
    # L1: (en,a)=7 with 2 bands, (en,b)=5 with 1, (fr,a)=7 with 1
    assert got[1] == (3, 5, 7, 0, 1, 1, 0)
    # L2: (en)=12 with 2 bands, (fr)=7 with 1
    assert got[2] == (2, 7, 12, 0, 1, 1, 0)
    # L3: everything, 3 distinct bands -> l-diverse at l=3
    assert got[3] == (1, 19, 19, 0, 3, 1, 1)


def test_clk_band_salt_cap_recall_contract(spark):
    """Pin the salt-cap recall contract (VERDICT r4 #8; docstring
    operators/pprl.py clk_band_pairs): a HOT band bucket (here: 30
    identical keys, every band bucket 3x over a cap of 10) splits into
    phash(id)-deterministic salts, and a qualifying pair whose members
    land in different salts is MISSED in capped mode — while
    max_bucket_rows=None restores the unconditional pigeonhole
    guarantee (recall 1.0, all C(30,2) exact-dup pairs found)."""
    n, cap = 30, 10
    rows = [(i, "smith robert") for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, "doc_id long, key string")

    # uncapped: pigeonhole guarantee — every exact-dup pair surfaces
    unc = {
        (r["id_a"], r["id_b"])
        for r in pprl.clk_band_pairs(
            df, "doc_id", F.col("key"), min_dice_micro=500_000,
            max_bucket_rows=None,
        ).collect()
    }
    all_pairs = {(a, b) for a in range(1, n + 1) for b in range(a + 1, n + 1)}
    assert unc == all_pairs

    # capped: identical encodings -> every band bucket has the same 30
    # members, so nsalts = ceil(30/10) = 3 in every bucket and the salt
    # phash(id) % 3 is the same in all of them => the found set is
    # EXACTLY the same-salt pairs (deterministic, no flake)
    capped = {
        (r["id_a"], r["id_b"])
        for r in pprl.clk_band_pairs(
            df, "doc_id", F.col("key"), min_dice_micro=500_000,
            max_bucket_rows=cap,
        ).collect()
    }
    salt = {i: _ph(str(i)) % 3 for i in range(1, n + 1)}
    same_salt = {(a, b) for (a, b) in all_pairs if salt[a] == salt[b]}
    assert capped == same_salt
    # the documented miss is real: some qualifying pairs are absent
    assert capped < all_pairs
    missed = all_pairs - capped
    assert missed and all(salt[a] != salt[b] for a, b in missed)
