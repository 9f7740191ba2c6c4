"""Example: tabular feature engineering — the materialization pass that
turns raw event/order tables into a model-ready training frame.

(engine capstone #3: examples 10/12 build the CORPUS; this builds the
FEATURES. One pipeline, all map-side or single-shuffle plans:
time-decay behavior features per entity (one window pass), leave-one-out
target encoding (category aggregate + AQE-broadcast join), quantile
binning (one fused percentile array), z-score scaling (one-fit
aggregate), last-n sequence history (bounded window frame), and a
deterministic hash split so the train/val assignment survives retries
and engine swaps.
run: python examples/14_feature_engineering.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.feature_eng import (
        decay_features,
        discretize_quantile,
        sequence_features,
        standardize,
        target_encode_loo,
    )
    from raise_featurestore_spark.dataprep.sampling import hash_split
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table

    spark = get_spark("example-14")
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    # 1. per-event behavioral features: decayed spend + last-5 history
    decay = decay_features(events, half_life_days=7.0)
    seq = sequence_features(events, n=5)
    event_feats = decay.join(seq, ["user_id", "event_id"])

    # 2. per-order features: encoded priority, binned + scaled price
    enc = target_encode_loo(
        orders, "o_orderpriority", "o_totalprice", "o_orderkey"
    ).withColumnRenamed("o_orderkey", "order_id")
    bins = discretize_quantile(
        orders, "o_totalprice", "o_orderkey", n_bins=10
    ).withColumnRenamed("o_orderkey", "order_id")
    scaled = standardize(orders, ["o_totalprice"], "o_orderkey").withColumnRenamed(
        "o_orderkey", "order_id"
    )
    order_feats = (
        enc.join(bins.select("order_id", "bin"), "order_id")
        .join(scaled, "order_id")
    )

    # 3. deterministic split: membership is a pure function of the id
    table = hash_split(
        order_feats, "order_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    split_counts = {
        r.split: r.n
        for r in table.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    n_events = event_feats.count()
    row = (
        table.where("split = 'train'")
        .agg(
            F.avg("target_enc").alias("enc_avg"),
            F.avg("o_totalprice_scaled").alias("scaled_avg"),
            F.countDistinct("bin").alias("bins"),
        )
        .collect()[0]
    )
    assert n_events > 0 and row.bins >= 8
    # z-scored over the FULL table, so the train mean sits near 0
    assert abs(row.scaled_avg) < 0.2

    return {
        "event_rows": int(n_events),
        "splits": split_counts,
        "train_bins": int(row.bins),
        "train_enc_avg": round(float(row.enc_avg), 2),
    }


if __name__ == "__main__":
    print(main())
