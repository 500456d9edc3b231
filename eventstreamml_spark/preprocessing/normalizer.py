"""Per-key normalizers — SURVEY §2.4 A13 (fit on train values,
transform everywhere).

Two models, mirroring the reference's METADATA_MODELS registry shape
(event_stream_dataset.py:48-54):

- ``standard_scaler``: (x − μ)/σ; model state = (key, mean, std);
  transform is a pure broadcast-join expression.
- ``quantile_transformer``: sklearn-style uniform-output CDF mapping;
  model state = (key, quantiles array<double>); transform interpolates
  the empirical CDF — vectorized ``mapInPandas`` against the
  broadcast quantile table (Python is unavoidable for interp, so it's
  Arrow-batched).

Fit never mutates shared state: both fits are pure aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fit_standard_scaler(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Model state (key, mean, std) — population std (ddof=0), matching
    sklearn's StandardScaler."""
    v = F.col(value_col)
    return df.filter(v.isNotNull()).groupBy(key_col).agg(
        F.avg(v).alias("mean"), F.stddev_pop(v).alias("std")
    )


def apply_standard_scaler(
    df: DataFrame,
    model: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """(x − μ)/σ with σ=0 → 0 (constant keys); missing keys pass
    through unscaled."""
    out_col = out_col or value_col
    m = model.select(key_col, F.col("mean").alias("_mu"), F.col("std").alias("_sd"))
    joined = df.join(F.broadcast(m), key_col, "left")
    v = F.col(value_col)
    scaled = (
        F.when(F.col("_mu").isNull(), v)
        .when(F.col("_sd") == 0, F.lit(0.0))
        .otherwise((v - F.col("_mu")) / F.col("_sd"))
    )
    return joined.withColumn(out_col, scaled).drop("_mu", "_sd")


def fit_quantile_transformer(
    df: DataFrame, key_col: str, value_col: str, n_quantiles: int = 101
) -> DataFrame:
    """Model state (key, quantiles array<double>): the per-key empirical
    quantiles at n evenly spaced probabilities. Uses exact ``percentile``
    (test scale) — swap to ``approx_percentile`` at 100 TB, where the
    sketch's rank error is far below any downstream sensitivity."""
    probs = F.array(*[F.lit(i / (n_quantiles - 1)) for i in range(n_quantiles)])
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .groupBy(key_col)
        .agg(F.percentile(v, probs).alias("quantiles"))
    )


def apply_quantile_transformer(
    df: DataFrame,
    model: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Map each value to its empirical CDF position in [0,1] by linear
    interpolation between fitted quantiles (sklearn QuantileTransformer
    with uniform output, averaged-tie behavior approximated by the
    forward interpolation).

    Vectorized via ``mapInPandas`` (np.interp per Arrow batch); the
    quantile table arrives through the join, so batches are
    self-contained — no driver-side broadcast variable plumbing.
    """
    import numpy as np

    out_col = out_col or value_col
    m = model.select(key_col, F.col("quantiles").alias("_q"))
    joined = df.join(F.broadcast(m), key_col, "left")

    fields = []
    for f in joined.schema.fields:
        if f.name == "_q":
            continue
        name = out_col if f.name == value_col else f.name
        fields.append((name, f))
    out_schema = ", ".join(
        f"`{name}` {f.dataType.simpleString()}" if f.name != value_col else f"`{name}` double"
        for name, f in fields
    )
    in_cols = [f.name for _, f in fields]
    value_idx = in_cols.index(value_col)

    out_names = [n for n, _ in fields]

    def interp(batches):
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            vals = pdf[value_col].to_numpy(dtype=float)
            res = vals.copy()  # default: pass through (no model / null)
            has_model = pdf["_q"].notna().to_numpy()
            # vectorize per key group within the batch (few keys, many rows)
            for _, grp in pdf[has_model].groupby(key_col, sort=False):
                idx = grp.index.to_numpy()
                q = np.asarray(grp["_q"].iloc[0], dtype=float)
                res[idx] = np.interp(vals[idx], q, np.linspace(0.0, 1.0, len(q)))
            out = pdf[in_cols].copy()
            out.columns = out_names
            out[out_names[value_idx]] = res
            yield out

    mapped = joined.mapInPandas(interp, schema=out_schema)
    # Arrow round-trips missing doubles as NaN; restore them to null so
    # downstream null-safe predicates keep working (valid interpolation
    # output is never NaN)
    oc = F.col(out_col)
    return mapped.withColumn(out_col, F.when(F.isnan(oc), F.lit(None)).otherwise(oc))
