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


def _gini_counts(counts: np.ndarray) -> float:
    """_gini from a class-count vector — same arithmetic (counts/n then
    1 − Σp²) so the distributed fit reproduces the driver fit's floats
    bit-for-bit."""
    p = counts / max(int(counts.sum()), 1)
    return float(1.0 - (p * p).sum())


def fit_tree_spark(
    source: DataFrame,
    features: list[str],
    label: str,
    max_depth: int = 8,
    min_samples_leaf: int = 2,
) -> DecisionTreeClassifier:
    """EXACT distributed fit of `DecisionTreeClassifier` — histogram-based
    split search via Spark aggregations (the public MLlib-style
    technique), replicating the driver fit decision-for-decision:

    * per-node candidate thresholds are the same stride-rank order
      statistics ``np.unique(xs[::max(1, n//64)])[:-1]`` (window
      ``row_number`` per (node, feature), stride filter, unique);
    * left/right class counts per candidate come from bucket histograms
      (``searchsorted`` bucketization inside ``mapInPandas``, count
      aggregation in Spark) and feed the identical gini expressions in
      the identical feature-then-threshold scan order with the identical
      first-seen-wins tie-break and ``parent_gini − 1e-12`` gain test;
    * the final tree array is emitted in the driver fit's DFS order.

    Result: `fit_tree_spark(df, ...)` equals
    `DecisionTreeClassifier().fit(df.toPandas(), ...)` on the same rows
    (pinned by tests/test_learn.py) while never collecting the source —
    per level it runs one class-count aggregation, one candidate window,
    and one histogram aggregation, all keyed on (node, feature) and
    AQE-splittable.  Reference semantics: src/learning/pointwise.jl:39
    fits on the whole source; this is the path that honours it above
    ``fit_row_cap``."""
    from pyspark.sql import functions as F

    spark = source.sparkSession
    nf = len(features)
    # keep the persisted handle: `df` is rebound every level (routing
    # column + localCheckpoint), so unpersisting the rebound frame in
    # the finally block would be a no-op on a derived plan and leak the
    # pinned base relation
    base = source.select(
        *[F.col(c).cast("double").alias(f"_f{i}")
          for i, c in enumerate(features)],
        F.col(label).alias("_y"),
    ).withColumn("_node", F.lit(0)).persist()
    df = base
    try:
        # fail loud on NULL features: SQL NULL ordering (NULLS FIRST in
        # the candidate window) has no counterpart in the driver fit's
        # NaN semantics, so a NULL would silently break the
        # identical-tree contract — and float(None) crashes later with
        # an opaque TypeError anyway.  The 'sample' strategy inherits
        # pandas' NULL→NaN coercion; this path refuses instead.
        null_pred = " OR ".join(
            [f"_f{i} IS NULL" for i in range(nf)] + ["_y IS NULL"]
        )
        if df.filter(null_pred).limit(1).count() > 0:
            raise ValueError(
                "fit_strategy='distributed' requires non-NULL feature "
                "and label values; filter or impute them first"
            )
        classes = np.unique(
            np.array([r["_y"] for r in df.select("_y").distinct().collect()])
        )
        cls_idx = {v: i for i, v in enumerate(classes)}
        ncls = len(classes)
        cls_map = F.create_map(
            *[x for kv in cls_idx.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        )
        df = df.withColumn("_yi", cls_map[F.col("_y")].cast("long"))

        # per heap-id node: class-count vector (leaf decisions + ginis)
        node_counts: dict[int, np.ndarray] = {}
        # heap-id → ("leaf",) or ("split", f, thr)
        decision: dict[int, tuple] = {}
        active = [0]
        for depth in range(max_depth + 1):
            if not active:
                break
            stats = (
                df.filter(F.col("_node").isin(active))
                .groupBy("_node", "_yi").count().collect()
            )
            for nid in active:
                cc = np.zeros(ncls, dtype=np.int64)
                for r in stats:
                    if r["_node"] == nid:
                        cc[int(r["_yi"])] = int(r["count"])
                node_counts[nid] = cc
            attempting = []
            for nid in active:
                n = int(node_counts[nid].sum())
                if (depth >= max_depth or n < 2 * min_samples_leaf
                        or int((node_counts[nid] > 0).sum()) == 1):
                    decision[nid] = ("leaf",)
                else:
                    attempting.append(nid)
            if not attempting:
                break
            sub = df.filter(F.col("_node").isin(attempting))
            stride = {
                nid: max(1, int(node_counts[nid].sum()) // 64)
                for nid in attempting
            }
            # long form (node, fidx, value) for the candidate windows
            stack_args = ", ".join(
                f"{i}, _f{i}" for i in range(nf)
            )
            long = sub.selectExpr(
                "_node", f"stack({nf}, {stack_args}) AS (_fi, _v)"
            )
            stride_expr = "CASE " + " ".join(
                f"WHEN _node = {nid} THEN {s}"
                for nid, s in stride.items()
            ) + " END"
            cand_rows = (
                long.withColumn(
                    "_rn",
                    F.expr(
                        "row_number() OVER "
                        "(PARTITION BY _node, _fi ORDER BY _v)"
                    ),
                )
                .filter(F.expr(f"(_rn - 1) % ({stride_expr}) = 0"))
                .select("_node", "_fi", "_v").distinct().collect()
            )
            cands: dict[tuple[int, int], np.ndarray] = {}
            for r in cand_rows:
                cands.setdefault((int(r["_node"]), int(r["_fi"])), []) \
                    .append(float(r["_v"]))
            cands = {k: np.unique(np.array(v)) for k, v in cands.items()}
            bc_c = spark.sparkContext.broadcast(cands)

            def bucketize(batches):
                cd = bc_c.value
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    outs = []
                    nodes = pdf["_node"].to_numpy(np.int64)
                    yi = pdf["_yi"].to_numpy(np.int64)
                    for nid in np.unique(nodes):
                        m = nodes == nid
                        for fi in range(nf):
                            c = cd.get((int(nid), fi))
                            if c is None or len(c) == 0:
                                continue
                            b = np.searchsorted(
                                c, pdf[f"_f{fi}"].to_numpy(np.float64)[m],
                                side="left",
                            )
                            outs.append(pd.DataFrame({
                                "_node": nid, "_fi": fi, "_b": b,
                                "_yi": yi[m], "_n": 1,
                            }))
                    if outs:
                        allb = pd.concat(outs)
                        yield (
                            allb.groupby(["_node", "_fi", "_b", "_yi"],
                                         as_index=False)["_n"].sum()
                        )

            hist = (
                sub.mapInPandas(
                    bucketize,
                    schema="_node long, _fi long, _b long, _yi long, _n long",
                )
                .groupBy("_node", "_fi", "_b", "_yi")
                .agg(F.sum("_n").alias("_n")).collect()
            )
            H: dict[tuple[int, int], np.ndarray] = {}
            for r in hist:
                key = (int(r["_node"]), int(r["_fi"]))
                arr = H.get(key)
                if arr is None:
                    arr = np.zeros(
                        (len(cands[key]) + 1, ncls), dtype=np.int64
                    )
                    H[key] = arr
                arr[int(r["_b"]), int(r["_yi"])] += int(r["_n"])
            bc_c.destroy()

            # driver-side best-split scan, replicating _build's loop
            # order, comparisons, and floats exactly
            split_nodes = {}
            for nid in attempting:
                n = int(node_counts[nid].sum())
                parent_gini = _gini_counts(node_counts[nid])
                best = None
                for fi in range(nf):
                    c = cands.get((nid, fi))
                    if c is None:
                        continue
                    h = H.get((nid, fi))
                    if h is None:
                        continue
                    cum = np.cumsum(h, axis=0)
                    total = node_counts[nid]
                    for j in range(len(c) - 1):  # qs[:-1]
                        lc = cum[j]
                        rc = total - lc
                        nl, nr = int(lc.sum()), int(rc.sum())
                        if nl < min_samples_leaf or nr < min_samples_leaf:
                            continue
                        g = (
                            nl * _gini_counts(lc) + nr * _gini_counts(rc)
                        ) / n
                        if best is None or g < best[0]:
                            best = (g, fi, float(c[j]))
                if best is None or best[0] >= parent_gini - 1e-12:
                    decision[nid] = ("leaf",)
                else:
                    _, fi, thr = best
                    decision[nid] = ("split", fi, thr)
                    split_nodes[nid] = (fi, thr)
            if not split_nodes:
                break
            # route rows of split nodes to heap children 2k+1 / 2k+2
            expr = F.col("_node")
            for nid, (fi, thr) in split_nodes.items():
                expr = (
                    F.when(
                        (F.col("_node") == nid)
                        & (F.col(f"_f{fi}") <= F.lit(thr)),
                        F.lit(2 * nid + 1),
                    )
                    .when(F.col("_node") == nid, F.lit(2 * nid + 2))
                    .otherwise(expr)
                )
            df = df.withColumn("_node", expr)
            # cut the per-level plan growth (the when-chain nests one
            # level per sweep) and re-materialize the routing
            df = df.localCheckpoint()
            active = [
                c for nid in split_nodes
                for c in (2 * nid + 1, 2 * nid + 2)
            ]

        # emit the driver fit's DFS array layout
        model = DecisionTreeClassifier(
            max_depth=max_depth, min_samples_leaf=min_samples_leaf
        )
        model.classes_ = classes
        tree: list = []

        def emit(nid: int) -> int:
            d = decision.get(nid, ("leaf",))
            if d[0] == "leaf":
                tree.append(("leaf", int(np.argmax(node_counts[nid]))))
                return len(tree) - 1
            _, fi, thr = d
            node_id = len(tree)
            tree.append(None)
            left = emit(2 * nid + 1)
            right = emit(2 * nid + 2)
            tree[node_id] = ("split", fi, thr, left, right)
            return node_id

        emit(0)
        model._tree = tree
        return model
    finally:
        base.unpersist()


def pointwise_learn(
    source: DataFrame,
    target: DataFrame,
    features: list[str],
    label: str,
    model=None,
    out_col: str | None = None,
    fit_row_cap: int = 1_000_000,
    fit_strategy: str = "sample",
) -> DataFrame:
    """Fit on source, broadcast the model, predict target via mapInPandas.

    The driver-side fit mirrors the reference's semantics
    (``src/learning/pointwise.jl:39`` fits on the whole source), but a
    100 TB source cannot land on the driver.  ``fit_strategy``:

    * ``'sample'`` (default): above ``fit_row_cap`` rows the fit uses a
      seeded uniform SAMPLE of ~cap rows — no ``limit()`` truncation,
      which takes rows in partition order and would systematically drop
      the tail partitions (a biased fit on time/region-sorted sources);
      expected size = cap ± O(√cap).  Statistically equivalent for the
      CART/pluggable models this protocol carries.
    * ``'distributed'``: EXACT full-source fit via `fit_tree_spark`
      (histogram split search, never collects the source) — available
      for the built-in `DecisionTreeClassifier` only; produces the
      identical tree the driver fit would on the full rows.
    """
    from pyspark import cloudpickle

    model = model or DecisionTreeClassifier()
    out_col = out_col or label
    if fit_strategy == "distributed":
        if not isinstance(model, DecisionTreeClassifier):
            raise ValueError(
                "fit_strategy='distributed' supports the built-in "
                "DecisionTreeClassifier; pluggable models fit driver-side"
            )
        model = fit_tree_spark(
            source, features, label,
            max_depth=model.max_depth,
            min_samples_leaf=model.min_samples_leaf,
        )
    elif fit_strategy == "sample":
        # persist: count + the fit read would otherwise execute the
        # (possibly expensive) source plan twice
        cached = source.select(*features, label).persist()
        try:
            n_src = cached.count()
            sel = cached
            if n_src > fit_row_cap:
                sel = cached.sample(
                    fraction=min(1.0, fit_row_cap / n_src), seed=42
                )
            src = sel.toPandas()
        finally:
            cached.unpersist()
        X = src[features].to_numpy(np.float64)
        y = src[label].to_numpy()
        model.fit(X, y)
    else:
        raise ValueError(f"unknown fit_strategy: {fit_strategy}")

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
