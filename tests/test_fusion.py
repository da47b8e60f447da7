"""record_fusion survivorship semantics on a hand-built fixture: champion
argmax (len desc, id asc), categorical mode (count desc, value asc), and
singleton/isolated-cluster passthrough."""

from bayesianrecordlinkage_jl_spark.operators.fusion import record_fusion


def _fixture(spark):
    # cluster 1: ids 1,2,3 — len tie 10/10 between ids 1,2 (champ -> id 1);
    #   lang mode tie en/fr 1-1-... actually en x2 vs fr x1 -> en;
    #   source tie a/b 1:1 within ids {1,2} plus c on id 3 -> lexicographic 'a'
    # cluster 2: singleton id 7
    docs = spark.createDataFrame(
        [
            (1, 10, "en", "a"),
            (2, 10, "en", "b"),
            (3, 4, "fr", "c"),
            (7, 99, "de", "z"),
        ],
        "doc_id long, n_chars long, lang string, source string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)],
        "node long, component long",
    )
    return docs, clusters


def test_record_fusion_rules(spark):
    docs, clusters = _fixture(spark)
    out = record_fusion(
        docs, clusters, "doc_id", "n_chars", ["lang", "source"]
    )
    rows = {r["cluster_id"]: r.asDict() for r in out.collect()}
    assert set(rows) == {1, 7}
    c1 = rows[1]
    assert c1["n_docs"] == 3 and c1["rep_id"] == 1
    # len tie 10/10 -> smaller id wins
    assert c1["best_len_id"] == 1 and c1["best_len"] == 10
    # lang: en x2 beats fr x1
    assert c1["top_lang"] == "en" and c1["lang_support"] == 2
    # source: a/b/c all x1 -> lexicographically smallest
    assert c1["top_source"] == "a" and c1["source_support"] == 1
    c7 = rows[7]
    assert c7["n_docs"] == 1 and c7["rep_id"] == 7
    assert c7["best_len_id"] == 7 and c7["best_len"] == 99
    assert c7["top_lang"] == "de" and c7["lang_support"] == 1


def test_record_fusion_no_cat_cols(spark):
    docs, clusters = _fixture(spark)
    out = record_fusion(docs, clusters, "doc_id", "n_chars", [])
    assert set(out.columns) == {
        "cluster_id", "n_docs", "rep_id", "best_len_id", "best_len"
    }
    assert out.count() == 2
