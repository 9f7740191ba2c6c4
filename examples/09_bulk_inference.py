"""Example: bulk inference transformations — ModelSpec, accelerator and
batch configs, warm-up, dynamic batching, error degradation, decorator
form. (parity with reference examples/09_bulk_inference.py:1-592, written
against this engine's API; run: python examples/09_bulk_inference.py)

Real model frameworks aren't in this container, so loaders are injected
deterministic models; the Spark-side execution — per-worker model cache,
Arrow batches, mapInPandas — is the real article.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table
    from raise_featurestore_spark.transforms.inference import (
        AcceleratorConfig,
        BatchConfig,
        InferenceTransform,
        ModelSpec,
        RuntimeConfig,
        alternating_sign_model,
        inference_transform,
        linear_model,
    )

    spark = get_spark("example-09")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # --- model specs (framework fields are plan metadata here) -----------
    scorer = ModelSpec(uri="mem://linear-v1", framework="custom",
                       precision="fp32",
                       loader=lambda uri: alternating_sign_model(0.5))

    # --- accelerator configs map to Spark resource confs ------------------
    single_gpu = AcceleratorConfig.gpu(gpu_type="nvidia-t4", count=1.0)
    multi_gpu = AcceleratorConfig.multi_gpu(gpu_type="nvidia-a100", count=4,
                                            strategy="data_parallel")
    tensor_par = AcceleratorConfig.multi_gpu(count=8, strategy="tensor_parallel")
    assert single_gpu.spark_confs()["spark.task.resource.gpu.amount"] == "1.0"
    assert multi_gpu.count_per_task == 1.0  # data-parallel: one GPU per task
    assert tensor_par.count_per_task == 8.0  # tensor-parallel: task owns all

    # --- batch configs: static and dynamic (bytes-per-row sized) ----------
    standard = BatchConfig(batch_size=64)
    dynamic = BatchConfig(dynamic=True, min_batch_size=32, max_batch_size=512,
                          target_batch_mb=4.0)

    # --- run: warm-up + dynamic batching ----------------------------------
    t = InferenceTransform(
        model=scorer,
        input_columns=["embedding"],
        output_column="score",
        batch=dynamic,
        accelerator=single_gpu,
        runtime=RuntimeConfig(warmup=True, warmup_rows=4),
    )
    scored = t.apply(emb)
    n_scored = scored.count()
    sample = scored.orderBy("vec_id").limit(1).collect()[0]
    print(f"scored {n_scored} rows; first score={sample.score:.4f}")

    # --- error degradation: fail_on_error=False → null predictions --------
    class _Broken:
        def predict(self, mat):
            raise RuntimeError("model blew up")

    degraded = InferenceTransform(
        model=ModelSpec(uri="mem://broken", loader=lambda uri: _Broken()),
        input_columns=["embedding"],
        output_column="score",
        runtime=RuntimeConfig(fail_on_error=False),
    ).apply(emb)
    n_null = degraded.where(F.col("score").isNull()).count()
    assert n_null == n_scored  # every batch degraded, none failed the job

    # --- pre/postprocess hooks ride the same batch UDF ---------------------
    normed = InferenceTransform(
        model=ModelSpec(uri="mem://linear-unit",
                        loader=lambda uri: alternating_sign_model(0.0)),
        input_columns=["embedding"],
        output_column="score",
        preprocess=lambda m: m / np.maximum(
            np.linalg.norm(m, axis=1, keepdims=True), 1e-12
        ),
        postprocess=lambda p: np.clip(p, -1.0, 1.0),
    ).apply(emb)
    max_abs = normed.agg(F.max(F.abs("score"))).collect()[0][0]
    assert max_abs <= 1.0 + 1e-9

    # --- decorator form ----------------------------------------------------
    @inference_transform(model_uri="mem://decorated", input_columns=["embedding"],
                         output_column="decorated_score")
    def my_model(uri: str):
        return linear_model([0.25] * 64)  # testdata embeddings are 64-dim

    decorated = my_model.apply(emb)
    n_decorated = decorated.count()

    return {
        "scored": n_scored,
        "degraded_nulls": n_null,
        "max_abs_normed": float(max_abs),
        "decorated": n_decorated,
        "gpu_confs": single_gpu.spark_confs(),
    }


if __name__ == "__main__":
    print(main())
