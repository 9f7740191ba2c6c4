"""Batch model inference over DataFrames: ModelSpec + batched Arrow UDF.

(reference: raise_/transforms/inference.py — InferenceTransform :406-531,
ModelSpec :93-197, AcceleratorConfig :205-299, BatchConfig :307-348,
RuntimeConfig :356-398, result metrics :539-595, convenience constructors
embedding/classification/image/llm :647-785, @inference_transform :602-640)

Execution model (SURVEY §2.10): the model loads ONCE PER PYTHON WORKER
(lazy global inside the UDF), then Arrow-batched pandas Series flow through
``predict`` — the pattern behind ``pyspark.ml.functions.predict_batch_udf``.
Never per-row model calls, never a driver-side loop. GPU placement on a
real cluster is ``spark.task.resource.gpu.amount`` + one task per GPU;
``batch_size`` maps to Arrow batch sizing
(``spark.sql.execution.arrow.maxRecordsPerBatch``).

Real frameworks (torch/onnx/tf) aren't in this container, so ModelSpec's
``loader`` is pluggable and tests use a deterministic linear model — the
Spark-side plumbing (schema, batching, per-worker caching, pre/post hooks)
is the real article.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-Python-worker model cache: loaded once, reused across batches/tasks
_MODEL_CACHE: dict[str, Any] = {}


@dataclass
class ModelSpec:
    """reference: raise_/transforms/inference.py:93-197."""

    uri: str
    framework: str = "custom"  # pytorch|tensorflow|onnx|custom
    precision: str = "fp32"  # fp32|fp16|bf16|int8
    loader: Callable[[str], Any] | None = None  # uri → model with .predict(np.ndarray)

    def load(self) -> Any:
        if self.loader is None:
            raise NotImplementedError(
                f"no loader for framework {self.framework!r}; real frameworks are "
                "not in this container — inject ModelSpec.loader"
            )
        if self.uri not in _MODEL_CACHE:
            _MODEL_CACHE[self.uri] = self.loader(self.uri)
        return _MODEL_CACHE[self.uri]


@dataclass
class AcceleratorConfig:
    """reference: raise_/transforms/inference.py:205-299. On a cluster these
    become ``spark.task.resource.gpu.amount`` / executor-conf settings;
    recorded here so plans are portable."""

    accelerator: str = "cpu"  # cpu|gpu|tpu
    count_per_task: float = 0.0
    gpu_type: str | None = None  # e.g. nvidia-t4, nvidia-a100
    multi_gpu_strategy: str | None = None  # data_parallel | tensor_parallel

    @classmethod
    def cpu(cls, cores: int = 4) -> "AcceleratorConfig":
        """CPU-only placement (reference: :248) — on Spark this is
        ``spark.task.cpus``, recorded for plan portability."""
        return cls(accelerator="cpu", count_per_task=float(cores))

    @classmethod
    def gpu(cls, gpu_type: str = "nvidia-t4", count: float = 1.0) -> "AcceleratorConfig":
        """Single-GPU task placement (reference: :232-252)."""
        return cls(accelerator="gpu", count_per_task=count, gpu_type=gpu_type)

    @classmethod
    def tpu(cls, tpu_type: str = "v4-8", count: int = 1) -> "AcceleratorConfig":
        """TPU placement (reference: :283) — Spark has no first-class TPU
        resource type; recorded as a custom resource name for the
        scheduler config layer."""
        return cls(accelerator="tpu", count_per_task=float(count), gpu_type=tpu_type)

    @classmethod
    def multi_gpu(cls, gpu_type: str = "nvidia-a100", count: int = 4,
                  strategy: str = "data_parallel") -> "AcceleratorConfig":
        """Multi-GPU placement (reference: :254-276). With data_parallel each
        Spark task pins one GPU and parallelism comes from tasks; with
        tensor_parallel one task owns all ``count`` GPUs."""
        per_task = 1.0 if strategy == "data_parallel" else float(count)
        return cls(accelerator="gpu", count_per_task=per_task, gpu_type=gpu_type,
                   multi_gpu_strategy=strategy)

    def spark_confs(self) -> dict[str, str]:
        if self.accelerator == "gpu" and self.count_per_task > 0:
            return {
                "spark.task.resource.gpu.amount": str(self.count_per_task),
                "spark.executor.resource.gpu.amount": str(
                    max(int(self.count_per_task), 1)
                ),
            }
        return {}


@dataclass
class BatchConfig:
    """reference: raise_/transforms/inference.py:307-348.

    ``dynamic=True`` sizes chunks from measured bytes/row so wide rows
    (embeddings, blobs) get small batches and narrow rows get big ones —
    bounded memory per predict() call regardless of schema."""

    batch_size: int = 1024
    max_concurrency: int = 1  # per-worker; Spark tasks already parallelize
    dynamic: bool = False
    min_batch_size: int = 32
    max_batch_size: int = 4096
    target_batch_mb: float = 16.0

    def effective_batch_size(self, sample: "pd.DataFrame") -> int:
        if not self.dynamic or sample.empty:
            return self.batch_size
        row_bytes = max(
            int(sample.memory_usage(deep=True).sum()) // max(len(sample), 1), 1
        )
        n = int(self.target_batch_mb * 1024 * 1024) // row_bytes
        return max(self.min_batch_size, min(self.max_batch_size, n))


@dataclass
class RuntimeConfig:
    """reference: raise_/transforms/inference.py:356-398. ``warmup`` runs one
    throwaway predict per worker before the timed stream (JIT/CUDA-context
    priming); ``fail_on_error=False`` degrades failed batches to null
    predictions instead of failing the task."""

    warmup: bool = False
    warmup_rows: int = 8
    fail_on_error: bool = True


@dataclass
class InferenceResultMetrics:
    """reference: raise_/transforms/inference.py:539-595."""

    rows: int = 0
    batches: int = 0
    seconds: float = 0.0


@dataclass
class InferenceTransform:
    """reference: raise_/transforms/inference.py:406-531.

    input_columns → model input matrix; output gets ``output_column``.
    ``preprocess``/``postprocess`` are numpy-level hooks composed into the
    same batch UDF (no extra pass) — reference :448-449.
    """

    model: ModelSpec
    input_columns: list[str]
    output_column: str = "prediction"
    output_type: str = "double"  # Spark DDL type of the prediction
    batch: BatchConfig = field(default_factory=BatchConfig)
    accelerator: AcceleratorConfig = field(default_factory=AcceleratorConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    preprocess: Callable[[np.ndarray], np.ndarray] | None = None
    postprocess: Callable[[np.ndarray], np.ndarray] | None = None

    def with_gpu(self, gpu_type: str = "nvidia-a100", count: int = 1) -> "InferenceTransform":
        """Copy with GPU placement (reference: :496-510) — chainable."""
        import dataclasses

        return dataclasses.replace(
            self, accelerator=AcceleratorConfig.gpu(gpu_type, float(count))
        )

    def with_batch_size(self, batch_size: int) -> "InferenceTransform":
        """Copy with a fixed batch size (reference: :512-520) — chainable."""
        import dataclasses

        return dataclasses.replace(
            self, batch=dataclasses.replace(self.batch, batch_size=batch_size, dynamic=False)
        )

    def apply(self, df: DataFrame) -> DataFrame:
        """Append predictions via mapInPandas (all original columns kept)."""
        spec = self.model
        in_cols = list(self.input_columns)
        out_col = self.output_column
        out_type = self.output_type
        batch_cfg = self.batch
        runtime = self.runtime
        pre, post = self.preprocess, self.postprocess

        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        ) + f", {out_col} {out_type}"

        def predict_chunk(model, chunk: pd.DataFrame) -> pd.DataFrame:
            # only the float64 conversion decides the raw-frame fallback; a
            # bug INSIDE the preprocess hook must propagate, not be masked
            # by re-invoking pre (possibly side-effecting) on the raw frame
            try:
                mat = _to_matrix(chunk, in_cols)
            except (ValueError, TypeError):
                if pre is None:
                    raise
                # non-numeric inputs (text prompts, raw bytes): float64
                # conversion can't work, so the preprocess hook IS the
                # featurizer — hand it the raw column frame instead of
                # failing before it ever runs (embedding/llm_inference)
                mat = chunk[in_cols]
            if pre is not None:
                mat = pre(mat)
            preds = np.asarray(model.predict(mat))
            if post is not None:
                preds = post(preds)
            out = chunk.copy()
            out[out_col] = list(preds) if preds.ndim > 1 else preds
            return out

        def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            model = spec.load()  # once per worker (module-level cache)
            warmed = not runtime.warmup
            batch_size = batch_cfg.batch_size
            for pdf in batches:
                if not warmed and len(pdf):
                    # throwaway predict primes JIT/CUDA before the real stream
                    predict_chunk(model, pdf.iloc[: runtime.warmup_rows])
                    warmed = True
                if batch_cfg.dynamic:
                    batch_size = batch_cfg.effective_batch_size(pdf)
                for lo in range(0, len(pdf), batch_size):
                    chunk = pdf.iloc[lo : lo + batch_size]
                    try:
                        yield predict_chunk(model, chunk)
                    except Exception:
                        if runtime.fail_on_error:
                            raise
                        out = chunk.copy()
                        out[out_col] = None
                        yield out

        return df.mapInPandas(infer, schema=schema)


def _to_matrix(pdf: pd.DataFrame, cols: list[str]) -> np.ndarray:
    if len(cols) == 1 and len(pdf) and isinstance(pdf[cols[0]].iloc[0], (list, np.ndarray)):
        return np.stack(pdf[cols[0]].to_numpy())  # one array column → matrix
    return pdf[cols].to_numpy(dtype=np.float64)


def inference_transform(
    *, model_uri: str, input_columns: list[str], output_column: str = "prediction", **kw
):
    """Decorator: the function IS the model loader
    (reference: raise_/transforms/inference.py:602-640)."""

    def wrap(loader: Callable[[str], Any]) -> InferenceTransform:
        return InferenceTransform(
            model=ModelSpec(uri=model_uri, loader=loader),
            input_columns=input_columns,
            output_column=output_column,
            **kw,
        )

    return wrap


# convenience constructors (reference: raise_/transforms/inference.py:647-785)

def embedding_inference(model_uri: str, text_column: str, dim: int,
                        loader: Callable[[str], Any] | None = None) -> InferenceTransform:
    return InferenceTransform(
        model=ModelSpec(uri=model_uri, loader=loader),
        input_columns=[text_column],
        output_column="embedding",
        output_type=f"array<float>",
        batch=BatchConfig(batch_size=256),
    )


def classification_inference(model_uri: str, input_columns: list[str],
                             loader: Callable[[str], Any] | None = None) -> InferenceTransform:
    return InferenceTransform(
        model=ModelSpec(uri=model_uri, loader=loader),
        input_columns=input_columns,
        output_column="label_score",
        output_type="double",
    )


def image_inference(model_uri: str, blob_column: str = "content",
                    loader: Callable[[str], Any] | None = None) -> InferenceTransform:
    return InferenceTransform(
        model=ModelSpec(uri=model_uri, loader=loader),
        input_columns=[blob_column],
        output_column="image_features",
        output_type="array<float>",
        accelerator=AcceleratorConfig("gpu", 1.0),
        batch=BatchConfig(batch_size=64),
    )


def llm_inference(model_uri: str, prompt_column: str,
                  loader: Callable[[str], Any] | None = None) -> InferenceTransform:
    return InferenceTransform(
        model=ModelSpec(uri=model_uri, loader=loader),
        input_columns=[prompt_column],
        output_column="completion",
        output_type="string",
        accelerator=AcceleratorConfig("gpu", 1.0),
        batch=BatchConfig(batch_size=8, dynamic=True),
    )


def linear_model(weights: list[float], bias: float = 0.0):
    """Deterministic reference model for tests/oracles: ŷ = Xw + b."""

    class _Linear:
        def predict(self, mat: np.ndarray) -> np.ndarray:
            w = np.asarray(weights, dtype=np.float64)
            return mat.astype(np.float64) @ w + bias

    return _Linear()


def alternating_sign_model(bias: float = 0.0):
    """Linear model with ±1 alternating weights derived from each batch's
    vector width — dim-agnostic, so callers never need a driver-side action
    (``.first()``) to discover the embedding dimension at plan time."""

    class _AltLinear:
        def predict(self, mat: np.ndarray) -> np.ndarray:
            m = mat.astype(np.float64)
            w = np.where(np.arange(m.shape[1]) % 2 == 0, 1.0, -1.0)
            return m @ w + bias

    return _AltLinear()
