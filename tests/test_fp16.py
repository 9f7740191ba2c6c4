"""Packed-binary fp16 embedding codec (reference float16[N] dtype,
raise_/models/types.py:124-148): round-trip exactness on fp16-representable
data, documented quantization otherwise, halved storage, and composition
with the vector/ANN operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_fp16_roundtrip_exact_for_fp16_grid(spark):
    from raise_featurestore_spark.functions.fp16 import (
        fp16_dim,
        pack_fp16,
        unpack_fp16,
    )

    rng = np.random.default_rng(4)
    # values ALREADY on the fp16 grid: unpack(pack(x)) must be identity
    base = rng.normal(size=(200, 16)).astype(np.float16).astype(np.float32)
    rows = [(i, [float(v) for v in base[i]]) for i in range(len(base))] + [
        (999, None)
    ]
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    out = df.select(
        "id",
        unpack_fp16(pack_fp16(F.col("emb"))).alias("back"),
        fp16_dim(pack_fp16(F.col("emb"))).alias("dim"),
    ).collect()
    got = {r.id: r.back for r in out}
    assert got[999] is None
    for i in range(len(base)):
        assert got[i] == pytest.approx(list(base[i]), abs=0.0)  # exact
    assert all(r.dim == 16 for r in out if r.id != 999)

    # off-grid values quantize to the NEAREST half (ties-to-even)
    df2 = spark.createDataFrame([([1.0 + 2**-12],)], "emb array<float>")
    back = df2.select(unpack_fp16(pack_fp16("emb")).alias("b")).first().b[0]
    assert back in (1.0, 1.0 + 2**-10)  # snapped to an adjacent fp16 point
    assert back == float(np.float32(np.float16(1.0 + 2**-12)))


def test_fp16_storage_is_half_of_float32(spark, tmp_path):
    from raise_featurestore_spark.functions.fp16 import pack_fp16

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(400)
    emb_col = [c for c in emb.columns if "emb" in c.lower()][0]
    f32 = str(tmp_path / "f32")
    f16 = str(tmp_path / "f16")
    # uncompressed so we measure representation width, not codec luck
    emb.select(F.col(emb_col).cast("array<float>").alias("e")).coalesce(1)\
        .write.option("compression", "none").parquet(f32)
    emb.select(pack_fp16(F.col(emb_col).cast("array<float>")).alias("e"))\
        .coalesce(1).write.option("compression", "none").parquet(f16)
    import glob
    import os

    size = lambda d: sum(os.path.getsize(p) for p in glob.glob(f"{d}/*.parquet"))
    ratio = size(f16) / size(f32)
    assert ratio < 0.62, ratio  # ~0.5 + framing overhead


def test_fp16_composes_with_cosine_topk(spark):
    """Decode-on-read feeds the vector ops: brute-force cosine top-k over
    unpacked fp16 equals top-k over the pre-quantized float32 vectors."""
    from raise_featurestore_spark.dataprep.similarity import brute_force_topk
    from raise_featurestore_spark.functions.fp16 import pack_fp16, unpack_fp16

    rng = np.random.default_rng(12)
    vecs = rng.normal(size=(300, 8)).astype(np.float16).astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "id long, emb array<float>")
    packed = df.select("id", pack_fp16("emb").alias("blob"))
    decoded = packed.select("id", unpack_fp16("blob").alias("emb"))
    q = [float(v) for v in vecs[0]]
    a = [tuple(r) for r in brute_force_topk(
        df, q, k=5, id_col="id", emb_col="emb").collect()]
    b = [tuple(r) for r in brute_force_topk(
        decoded, q, k=5, id_col="id", emb_col="emb").collect()]
    assert a == b and a[0][0] == 0  # the query vector itself ranks first


def test_sql_fp16_quantizer_matches_numpy_rne():
    """The oracle-side pure-SQL quantizer must reproduce numpy's
    astype(float16) (IEEE round-to-nearest-even) bit-for-bit: normals,
    subnormals, exact midpoint ties, and the 2^-14 / 2^-24 / 2^-25
    boundaries."""
    import random

    import duckdb
    import numpy as np

    from raise_featurestore_spark.functions.fp16 import fp16_quantize_stages_sql

    rng = random.Random(3)
    vals = [rng.uniform(-8, 8) for _ in range(1500)] + [
        rng.uniform(-6e-5, 6e-5) for _ in range(1000)
    ]
    h = np.arange(-2048, 2048, dtype=np.float64) * 2.0**-13
    vals += (((h[:-1] + h[1:]) / 2)).tolist()  # exact fp16 midpoints
    vals += [0.0, -0.0, 65504.0, 2.0**-14, 2.0**-24, -(2.0**-25), 2.0**-25]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, CAST('{v!r}' AS DOUBLE))" for i, v in enumerate(vals))
        + ") AS v(i, x)"
    )
    q, prev = "WITH __e AS (SELECT i, x FROM t), ", "__e"
    for n, (alias, expr) in enumerate(fp16_quantize_stages_sql("x")):
        q += f"__s{n} AS (SELECT *, {expr} AS {alias} FROM {prev}), "
        prev = f"__s{n}"
    q = q.rstrip(", ") + f" SELECT __qx FROM {prev} ORDER BY i"
    got = [r[0] for r in con.sql(q).fetchall()]
    want = np.array(vals, dtype=np.float64).astype("<f2").astype(np.float64)
    for v, g, w in zip(vals, got, want):
        if g == 0 and w == 0:
            continue  # signed zero washes out in the decimal pipeline
        assert g == w, (v, g, w)


def test_fp16_cosine_topk_nonfinite_guard(spark):
    """r8 ADVICE medium: NaN/Inf elements — or |x|>65504, which the fp16
    codec turns into ±Inf — must not reach the ANSI decimal cast (crash)
    or the oracle's BIGINT cast (DuckDB ConversionException). Vectors
    containing them are excluded identically on both engines."""
    import duckdb

    from raise_featurestore_spark.functions.fp16 import (
        fp16_cosine_topk,
        fp16_cosine_topk_sql,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 8)).astype(np.float16).astype(np.float32)
    rows = [(i, [float(v) for v in base[i]]) for i in range(len(base))]
    rows.append((100, [float("nan")] + [0.5] * 7))      # NaN element
    rows.append((101, [float("inf")] + [0.5] * 7))      # Inf element
    rows.append((102, [70000.0] + [0.5] * 7))           # fp16 overflow
    rows.append((103, None))                            # NULL vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = fp16_cosine_topk(df, query_id=0, k=40).toPandas()
    assert set(got.vec_id) == set(range(30))  # guarded vectors excluded
    assert not got.cos_sim.isna().any()

    con = duckdb.connect()
    con.register(
        "t",
        df.toPandas(),
    )
    oracle = con.sql(fp16_cosine_topk_sql("t", query_id=0, k=40)).df()
    assert set(oracle.vec_id) == set(range(30))
    s = got.sort_values("vec_id").reset_index(drop=True)
    o = oracle.sort_values("vec_id").reset_index(drop=True)
    assert (s.vec_id.values == o.vec_id.values).all()
    assert np.allclose(s.cos_sim.values, o.cos_sim.values, atol=0, rtol=0)
