"""Pointwise geostatistical learning (reference: PointwiseLearn,
``/root/reference/src/learning/pointwise.jl:28-44``).

Train a model on the source table, predict on the target table, re-attach
the target domain.  The reference delegates the model to StatsLearnModels
(its test uses a decision tree, ``test/learning/pointwise.jl:22-26``); this
engine ships a from-scratch numpy CART (no sklearn in the runtime) plus the
same driver-fit → broadcast → ``mapInPandas`` inference pattern for any
pluggable model exposing fit/predict on ndarrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class DecisionTreeClassifier:
    """Depth-limited CART with gini impurity, numpy-only."""

    max_depth: int = 8
    min_samples_leaf: int = 2
    _tree: list = field(default_factory=list)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "DecisionTreeClassifier":
        self.classes_, yi = np.unique(y, return_inverse=True)
        self._tree = []
        self._build(X, yi, 0)
        return self

    def _leaf(self, yi) -> int:
        counts = np.bincount(yi, minlength=len(self.classes_))
        self._tree.append(("leaf", int(np.argmax(counts))))
        return len(self._tree) - 1

    def _build(self, X, yi, depth) -> int:
        n = len(yi)
        if depth >= self.max_depth or n < 2 * self.min_samples_leaf or len(np.unique(yi)) == 1:
            return self._leaf(yi)
        best = None
        parent_gini = _gini(yi, len(self.classes_))
        for f in range(X.shape[1]):
            order = np.argsort(X[:, f], kind="stable")
            xs, ys = X[order, f], yi[order]
            # candidate thresholds: quantile subsample for speed
            qs = np.unique(xs[:: max(1, n // 64)])
            for t in qs[:-1]:
                left = ys[xs <= t]
                right = ys[xs > t]
                if len(left) < self.min_samples_leaf or len(right) < self.min_samples_leaf:
                    continue
                g = (
                    len(left) * _gini(left, len(self.classes_))
                    + len(right) * _gini(right, len(self.classes_))
                ) / n
                if best is None or g < best[0]:
                    best = (g, f, t)
        if best is None or best[0] >= parent_gini - 1e-12:
            return self._leaf(yi)
        _, f, t = best
        node_id = len(self._tree)
        self._tree.append(None)  # placeholder
        mask = X[:, f] <= t
        left = self._build(X[mask], yi[mask], depth + 1)
        right = self._build(X[~mask], yi[~mask], depth + 1)
        self._tree[node_id] = ("split", f, t, left, right)
        return node_id

    def _node_arrays(self):
        """Array form of the tree for vectorized descent: leaves have
        feat = −1 and carry their class in ``left``."""
        feat = np.array(
            [nd[1] if nd[0] == "split" else -1 for nd in self._tree],
            dtype=np.int64,
        )
        thr = np.array(
            [nd[2] if nd[0] == "split" else 0.0 for nd in self._tree]
        )
        left = np.array(
            [nd[3] if nd[0] == "split" else nd[1] for nd in self._tree],
            dtype=np.int64,
        )
        right = np.array(
            [nd[4] if nd[0] == "split" else 0 for nd in self._tree],
            dtype=np.int64,
        )
        return feat, thr, left, right

    def predict(self, X: np.ndarray) -> np.ndarray:
        """Vectorized level-order descent — ≤ max_depth np.where rounds over
        the whole batch, no per-row Python."""
        feat, thr, left, right = self._node_arrays()
        cur = np.zeros(len(X), dtype=np.int64)
        active = feat[cur] >= 0
        while active.any():
            a = np.nonzero(active)[0]
            nodes = cur[a]
            go_left = X[a, feat[nodes]] <= thr[nodes]
            cur[a] = np.where(go_left, left[nodes], right[nodes])
            active = feat[cur] >= 0
        return self.classes_[left[cur]]


def _gini(yi: np.ndarray, ncls: int) -> float:
    p = np.bincount(yi, minlength=ncls) / max(len(yi), 1)
    return float(1.0 - (p * p).sum())


def pointwise_learn(
    source: DataFrame,
    target: DataFrame,
    features: list[str],
    label: str,
    model=None,
    out_col: str | None = None,
    fit_row_cap: int = 1_000_000,
) -> DataFrame:
    """Fit on source (driver), broadcast, predict target via mapInPandas.

    The driver-side fit mirrors the reference's semantics
    (``src/learning/pointwise.jl:39`` fits on the whole source), but a
    100 TB source cannot land on the driver: above ``fit_row_cap`` rows the
    fit uses a seeded uniform SAMPLE of ~cap rows (documented deviation —
    statistically equivalent for the CART/pluggable models this protocol
    carries, and the cap is a caller knob)."""
    from pyspark import cloudpickle

    model = model or DecisionTreeClassifier()
    out_col = out_col or label
    # persist: count + the fit read would otherwise execute the (possibly
    # expensive) source plan twice
    cached = source.select(*features, label).persist()
    try:
        n_src = cached.count()
        sel = cached
        if n_src > fit_row_cap:
            # seeded uniform sample with the EXACT fraction — no limit()
            # truncation, which takes rows in partition order and would
            # systematically drop the tail partitions (a biased fit on
            # time/region-sorted sources); expected size = cap ± O(√cap)
            sel = cached.sample(
                fraction=min(1.0, fit_row_cap / n_src), seed=42
            )
        src = sel.toPandas()
    finally:
        cached.unpersist()
    X = src[features].to_numpy(np.float64)
    y = src[label].to_numpy()
    model.fit(X, y)

    spark = target.sparkSession
    bc = spark.sparkContext.broadcast(cloudpickle.dumps((model, features)))
    keep = [c for c in target.columns if c != label]

    def run(batches):
        mdl, feats = cloudpickle.loads(bc.value)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yhat = mdl.predict(pdf[feats].to_numpy(np.float64))
            out = pdf[keep].copy()
            out[out_col] = yhat
            yield out

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in target.schema.fields if f.name != label
    )
    label_type = "bigint"
    for f in source.schema.fields:
        if f.name == label:
            label_type = f.dataType.simpleString()
    return target.mapInPandas(run, schema=f"{fields}, {out_col} {label_type}")
