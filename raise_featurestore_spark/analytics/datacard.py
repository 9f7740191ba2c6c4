"""Data card generation: one JSON-able datasheet per corpus snapshot.

Standard release practice for training datasets (datasheets/data cards):
a single document recording size, per-source composition, quality-rule
rejection accounting, mixing rates, and column-level statistics — exactly
the artifacts the engine already computes (corpus health, quality filter
report, temperature-mix report, whole-table profile), composed into one
driver-side dict. Every number comes from a distributed plan; only the
small summaries reach the driver. The reference has no data-card surface;
engine addition per the task brief.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def build_data_card(
    docs: DataFrame,
    name: str = "corpus",
    quality_rules=None,
    mix_spec=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> dict[str, Any]:
    """Datasheet dict for a (doc_id, text, source, ...) corpus frame.

    Sections: identity, size, per-source composition, quality-rule
    rejections, mixing rates (when a spec is given), and text-length
    stats. ~4 Spark jobs total, each a single aggregate."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import grid_snap
    from raise_featurestore_spark.dataprep.filters import (
        QualityRules,
        quality_filter_report,
    )
    from raise_featurestore_spark.dataprep.mixing import MixSpec, source_rates

    quality_rules = quality_rules or QualityRules()

    size = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("total_chars"),
        grid_snap(F.avg(F.length(text_col)), 2).alias("avg_chars"),
        F.min(F.length(text_col)).alias("min_chars"),
        F.max(F.length(text_col)).alias("max_chars"),
    ).collect()[0]

    sources = [
        r.asDict()
        for r in docs.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            grid_snap(F.avg(F.length(text_col)), 2).alias("avg_chars"),
        )
        .orderBy(source_col)
        .collect()
    ]

    quality = quality_filter_report(docs, quality_rules, id_col, text_col).collect()[0].asDict()

    card: dict[str, Any] = {
        "name": name,
        "schema": [{"name": f.name, "type": f.dataType.simpleString()} for f in docs.schema],
        "size": size.asDict(),
        "sources": sources,
        "quality": {
            "rules": {
                "min_tokens": quality_rules.min_tokens,
                "max_tokens": quality_rules.max_tokens,
                "max_dup_token_frac": quality_rules.max_dup_token_frac,
                "max_top_bigram_count": quality_rules.max_top_bigram_count,
                "min_quality_score": quality_rules.min_quality_score,
                "allowed_langs": list(quality_rules.allowed_langs),
            },
            "report": quality,
        },
    }
    if mix_spec is not None:
        spec = mix_spec if isinstance(mix_spec, MixSpec) else MixSpec(**mix_spec)
        card["mixing"] = {
            "alpha": spec.alpha,
            "target_rows": spec.target_rows,
            # order by the SPEC's source column — it may differ from this
            # function's source_col when the mix groups by another key
            "rates": [
                r.asDict()
                for r in source_rates(docs, spec).orderBy(spec.source_col).collect()
            ],
        }
    return card
