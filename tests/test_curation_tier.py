"""Round-4 curation tier: budgeted selection, chunking, boilerplate
mining, shard assignment, semantic dedup clusters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep.boilerplate import (
    mine_boilerplate,
    strip_boilerplate,
)
from raise_featurestore_spark.dataprep.chunking import chunk_documents
from raise_featurestore_spark.dataprep.selection import select_token_budget
from raise_featurestore_spark.dataprep.shards import (
    assign_shards,
    shard_manifest,
    write_shards,
)
from raise_featurestore_spark.dataprep.similarity import (
    embedding_near_dup_pairs,
    semantic_dedup_clusters,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta " * 10 + "THE LICENSE HEADER TEXT HERE"),
        (1, "one two three four five six seven eight nine ten"),
        (2, "THE LICENSE HEADER TEXT HERE plus unique content aa bb cc"),
        (3, "short doc"),
        (4, "THE LICENSE HEADER TEXT HERE THE LICENSE HEADER TEXT HERE"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ------------------------------------------------------------- selection


def test_token_budget_greedy_boundary(spark):
    # quality proxy via real corpus text; use a tiny frame with known
    # token counts and verify the greedy prefix property directly
    rows = [(i, "word " * (10 * (i + 1))) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = select_token_budget(df, budget=120).orderBy("cum_tokens").collect()
    assert out, "budget should admit at least one doc"
    assert out[-1].cum_tokens <= 120
    # inclusive running total is consistent
    total = 0
    for r in out:
        total += r.n_tokens
        assert r.cum_tokens == total


def test_token_budget_orders_by_quality_desc(spark, docs):
    out = select_token_budget(docs, budget=10**9).orderBy("cum_tokens").collect()
    qualities = [r.quality_score for r in out]
    assert qualities == sorted(qualities, reverse=True)
    # with an unbounded budget every doc is kept
    assert len(out) == docs.count()


# -------------------------------------------------------------- chunking


def test_chunks_cover_every_token_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100)))], ["doc_id", "text"]
    )
    out = chunk_documents(df, window=64, stride=48).orderBy("chunk_idx").collect()
    assert [r.chunk_start for r in out] == [1, 49]
    assert [r.n_chunk_tokens for r in out] == [64, 52]  # tail chunk short
    # coverage: last chunk reaches token 100
    assert out[-1].chunk_start + out[-1].n_chunk_tokens - 1 == 100


def test_short_doc_single_chunk_and_disjoint_mode(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = chunk_documents(df, window=64, stride=48).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 3
    dis = chunk_documents(
        spark.createDataFrame([(1, " ".join("x" * 1 for _ in range(10)))],
                              ["doc_id", "text"]),
        window=4, stride=4,
    ).collect()
    assert sum(r.n_chunk_tokens for r in dis) == 10  # disjoint covers exactly


def test_chunk_rejects_bad_stride(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=0)


def test_chunking_is_shuffle_free(spark, docs):
    plan = chunk_documents(docs)._jdf.queryExecution().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------ boilerplate


def test_mined_boilerplate_counts_docs_not_occurrences(spark, docs):
    out = mine_boilerplate(docs, n=5, min_df=2, top_k=10).collect()
    by_gram = {r.gram: r.df for r in out}
    # doc 4 contains the header twice but counts once -> df == 3 (docs 0,2,4)
    assert by_gram.get("the license header text here") == 3


def test_strip_boilerplate_removes_all_occurrences(spark, docs):
    grams = ["the license header text here"]
    out = strip_boilerplate(docs, grams).collect()
    for r in out:
        assert "license" not in r.text.lower()
    # non-boilerplate content survives untouched
    kept = {r.doc_id: r.text for r in out}
    assert "unique content" in kept[2]
    assert kept[4] == ""  # doc 4 was nothing but boilerplate


def test_strip_boilerplate_preserves_original_casing(spark):
    """Mined grams are lowercased, but stripping must not normalize the
    rest of the document (an exported corpus was silently lowercased by an
    earlier in-place _norm_text; ADVICE r4). Punctuation-edged grams must
    match too — \\b anchors silently skipped them."""
    df = spark.createDataFrame(
        [
            (1, "Dear Reader,\nAll Rights Reserved. Inc.\nKind Regards"),
            (2, "no chrome Here — Mixed CASE kept\tand tabs too"),
            (3, "def f():\n    return 1  # two  spaces survive "),
            (4, "Über uns Alle Rechte Vorbehalten danke"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate(
            df, ["all rights reserved. inc.", "über uns alle rechte vorbehalten"]
        ).collect()
    }
    # interior seam collapses to the FIRST original separator (a newline
    # stays a newline); surrounding casing kept
    assert out[1] == "Dear Reader,\nKind Regards"
    # documents with no match are byte-identical: tabs, double spaces,
    # indentation and trailing whitespace all survive
    assert out[2] == "no chrome Here — Mixed CASE kept\tand tabs too"
    assert out[3] == "def f():\n    return 1  # two  spaces survive "
    # (?iu): Unicode case folding — ASCII-only (?i) would skip Über↔über
    assert out[4] == "danke"


# ----------------------------------------------------------------- shards


def test_shard_assignment_deterministic_and_in_range(spark, docs):
    a = {r.doc_id: r.shard for r in assign_shards(docs, 8).collect()}
    b = {
        r.doc_id: r.shard
        for r in assign_shards(docs.repartition(13), 8).collect()
    }
    assert a == b
    assert all(0 <= s < 8 for s in a.values())
    with pytest.raises(ValueError):
        assign_shards(docs, 0)


def test_shard_manifest_accounts_every_row(spark, docs):
    m = shard_manifest(docs, 4)
    agg = m.agg(F.sum("n_rows").alias("n"), F.sum("total_chars").alias("c")).first()
    assert agg.n == docs.count()
    assert agg.c == docs.agg(F.sum(F.length("text"))).first()[0]


def test_write_shards_layout(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_shards(docs, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # partition column round-trips and matches the deterministic assignment
    want = {r.doc_id: r.shard for r in assign_shards(docs, 4).collect()}
    got = {r.doc_id: r.shard for r in back.collect()}
    assert got == want


# --------------------------------------------------------- semantic dedup


def test_semantic_clusters_are_consistent_with_pairs(spark):
    import random

    rng = random.Random(5)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(6)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v))
        # near-duplicate: tiny perturbation keeps cosine ~1
        rows.append((100 + i, [x * 1.001 for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    labels = semantic_dedup_clusters(emb, threshold=0.999, dim=8)
    got = {r.vec_id: r.cluster for r in labels.collect()}
    # every planted pair lands in one cluster labeled by its min id
    for i in range(6):
        if i in got or (100 + i) in got:
            assert got.get(i) == i and got.get(100 + i) == i
    # labels only exist for nodes that appear in some qualifying pair
    pairs = embedding_near_dup_pairs(emb, threshold=0.999, dim=8).collect()
    nodes = {p.id_a for p in pairs} | {p.id_b for p in pairs}
    assert set(got) == nodes


@pytest.mark.parametrize("window,stride", [(8, 8), (8, 5), (16, 1), (5, 2)])
def test_chunk_coverage_property(spark, window, stride):
    """Every token position of every doc is inside >= 1 chunk; starts
    follow the stride grid; the final chunk reaches the last token."""
    docs = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(0, 40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = chunk_documents(df, window=window, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_start for c in chunks] == [
            1 + i * stride for i in range(len(chunks))
        ]
        covered = set()
        for c in chunks:
            assert c.n_chunk_tokens <= window
            covered.update(range(c.chunk_start, c.chunk_start + c.n_chunk_tokens))
        assert covered == set(range(1, n + 1)), f"n={n}"
        if n > 0:
            last = chunks[-1]
            assert last.chunk_start + last.n_chunk_tokens - 1 == n


def test_token_budget_ignores_null_text_cross_engine(spark, ddb):
    """Null-text docs must not poison the selection order: Spark sorts
    NULLS FIRST, DuckDB NULLS LAST, so the operator excludes them."""
    import duckdb

    from raise_featurestore_spark.dataprep.selection import (
        select_token_budget_sql,
    )
    from tests.conftest import assert_frames_match

    rows = [(i, f"doc number {i} " * (i + 1)) for i in range(8)]
    rows += [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("t_nulls", df.toPandas())
    out = select_token_budget(df, budget=60)
    want = con.sql(select_token_budget_sql("t_nulls", budget=60)).df()
    assert_frames_match(out, want)
    assert out.where(F.col("doc_id") >= 100).count() == 0


def test_chunking_drops_null_text_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    out = chunk_documents(df, window=4, stride=4).collect()
    assert [r.doc_id for r in out] == [1]  # no phantom NULL chunk for doc 2


def test_strip_boilerplate_is_token_anchored(spark):
    # 'tuba b c d e f g' contains the raw substring 'a b c d e f' starting
    # mid-word; token-granular removal must leave the text alone
    df = spark.createDataFrame(
        [(1, "tuba b c d e f g"), (2, "x a b c d e f y")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.text for r in strip_boilerplate(df, ["a b c d e f"]).collect()}
    assert out[1] == "tuba b c d e f g"  # untouched
    assert out[2] == "x y"  # true token-boundary occurrence removed


def test_write_shards_refuses_to_clobber_by_default(spark, docs, tmp_path):
    path = str(tmp_path / "no_clobber")
    write_shards(docs, path, n_shards=2)
    with pytest.raises(Exception):
        write_shards(docs, path, n_shards=2)  # errorifexists default
    write_shards(docs, path, n_shards=2, mode="overwrite")  # explicit opt-in
