"""Mergeable t-digest — the reference's TDigest surface
(core/trino-main/.../operator/scalar/TDigestFunctions.java value_at_quantile /
values_at_quantiles; aggregation/TDigestAggregationFunction.java tdigest_agg;
io.airlift.stats.TDigest merging implementation) rebuilt as a numpy
merging-digest with a Spark two-phase aggregation path.

Algorithm: the "merging t-digest" (Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests", arXiv:1902.04023) with the k1 scale
function k(q) = (delta / 2pi) * asin(2q - 1): buffered points are sorted and
greedily merged into centroids whose k-size never exceeds 1, giving
O(delta) centroids with relative accuracy concentrated at the tails.

Scale posture (how this runs at 100 TB):
  partial per partition -> tiny binary state -> merge per group.
`tdigest_agg(df, value, groups)` builds one digest per input partition with
mapInPandas (map-side combine: each executor emits ONE ~KB row per group it
saw, never raw values), then shuffles only those digests and merges with
applyInPandas.  That is exactly the partial/final split of the reference's
TDigestAggregationFunction state, and the shuffle volume is
O(groups x partitions x delta), independent of row count.

Serialization: little-endian float64 header [delta, min, max, n_centroids]
followed by n pairs (mean, weight) — engine-portable, so the sketch column
can be stored in parquet and re-merged later (the reference's tdigest type
round-trips the same way).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, DoubleType

__all__ = ["TDigest", "tdigest_agg", "value_at_quantile", "values_at_quantiles"]


class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function."""

    __slots__ = ("delta", "means", "weights", "_buf", "vmin", "vmax")

    def __init__(self, delta: float = 100.0):
        self.delta = float(delta)
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self._buf: list[float] = []
        self.vmin = math.inf
        self.vmax = -math.inf

    # -- build -------------------------------------------------------------

    def add(self, values) -> "TDigest":
        arr = np.asarray(values, dtype=float)
        arr = arr[~np.isnan(arr)]
        if arr.size:
            self._buf.extend(arr.tolist())
            self.vmin = min(self.vmin, float(arr.min()))
            self.vmax = max(self.vmax, float(arr.max()))
            if len(self._buf) >= 4 * int(self.delta):
                self._compress()
        return self

    def add_weighted(self, values, weights) -> "TDigest":
        """Weighted insert — the reference's approx_percentile(x, w, p) /
        tdigest_agg(x, w) weight argument (TDigestAggregationFunction
        weighted input function): weight w is the multiplicity of x.
        Centroids already carry weights, so the values enter directly."""
        v = np.asarray(values, dtype=float)
        w = np.asarray(weights, dtype=float)
        keep = ~np.isnan(v) & ~np.isnan(w) & (w > 0)
        v, w = v[keep], w[keep]
        if v.size:
            self._compress()
            self.means = np.concatenate([self.means, v])
            self.weights = np.concatenate([self.weights, w])
            self.vmin = min(self.vmin, float(v.min()))
            self.vmax = max(self.vmax, float(v.max()))
            self._merge_centroids()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self._compress()
        other._compress()
        if other.means.size:
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
            self.vmin = min(self.vmin, other.vmin)
            self.vmax = max(self.vmax, other.vmax)
            self._merge_centroids()
        return self

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2.0 * math.pi)) * np.arcsin(2.0 * q - 1.0)

    def _compress(self) -> None:
        if self._buf:
            self.means = np.concatenate([self.means, np.array(self._buf)])
            self.weights = np.concatenate(
                [self.weights, np.ones(len(self._buf))]
            )
            self._buf = []
            self._merge_centroids()

    def _merge_centroids(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        out_m: list[float] = [means[0]]
        out_w: list[float] = [weights[0]]
        w_so_far = 0.0
        k_lo = self._k(np.array([0.0]))[0]
        for m, w in zip(means[1:], weights[1:]):
            q_hi = (w_so_far + out_w[-1] + w) / total
            if self._k(np.array([min(q_hi, 1.0)]))[0] - k_lo <= 1.0:
                # absorb into the current centroid (weighted mean)
                nw = out_w[-1] + w
                out_m[-1] += (m - out_m[-1]) * (w / nw)
                out_w[-1] = nw
            else:
                w_so_far += out_w[-1]
                k_lo = self._k(np.array([w_so_far / total]))[0]
                out_m.append(float(m))
                out_w.append(float(w))
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    # -- query -------------------------------------------------------------

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum()) + len(self._buf)

    def value_at_quantile(self, q: float) -> float:
        """TDigestFunctions.java:39 value_at_quantile(tdigest, q)."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("quantile must be in [0, 1]")
        self._compress()
        n = self.weights.sum()
        if n == 0:
            return math.nan
        if self.means.size == 1:
            return float(self.means[0])
        target = q * n
        # centroid cumulative midpoints; linear interpolation between them,
        # clamped to observed min/max at the tails
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            lo, hi = self.vmin, float(self.means[0])
            frac = target / cum[0] if cum[0] > 0 else 1.0
            return lo + (hi - lo) * frac
        if target >= cum[-1]:
            lo, hi = float(self.means[-1]), self.vmax
            span = n - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 1.0
            return lo + (hi - lo) * frac
        idx = int(np.searchsorted(cum, target))
        c0, c1 = cum[idx - 1], cum[idx]
        m0, m1 = self.means[idx - 1], self.means[idx]
        frac = (target - c0) / (c1 - c0)
        return float(m0 + (m1 - m0) * frac)

    def values_at_quantiles(self, qs) -> list[float]:
        return [self.value_at_quantile(q) for q in qs]

    def quantile_at_value(self, v: float) -> float:
        """Inverse query: estimated rank of v in [0, 1]
        (TDigestFunctions.java quantile_at_value)."""
        self._compress()
        n = self.weights.sum()
        if n == 0:
            return math.nan
        if v <= self.vmin:
            return 0.0
        if v >= self.vmax:
            return 1.0
        cum = np.cumsum(self.weights) - self.weights / 2.0
        idx = int(np.searchsorted(self.means, v))
        if idx == 0:
            lo, hi = self.vmin, float(self.means[0])
            frac = (v - lo) / (hi - lo) if hi > lo else 0.5
            return float(frac * cum[0] / n)
        if idx >= self.means.size:
            lo, hi = float(self.means[-1]), self.vmax
            frac = (v - lo) / (hi - lo) if hi > lo else 0.5
            return float((cum[-1] + frac * (n - cum[-1])) / n)
        m0, m1 = float(self.means[idx - 1]), float(self.means[idx])
        frac = (v - m0) / (m1 - m0) if m1 > m0 else 0.5
        return float((cum[idx - 1] + frac * (cum[idx] - cum[idx - 1])) / n)

    # -- serde -------------------------------------------------------------

    def serialize(self) -> bytes:
        self._compress()
        head = struct.pack(
            "<ddd q", self.delta, self.vmin, self.vmax, self.means.size
        )
        body = np.column_stack([self.means, self.weights]).astype("<f8").tobytes()
        return head + body

    @staticmethod
    def deserialize(b: bytes) -> "TDigest":
        delta, vmin, vmax, n = struct.unpack_from("<ddd q", b)
        td = TDigest(delta)
        td.vmin, td.vmax = vmin, vmax
        if n:
            pairs = np.frombuffer(b, dtype="<f8", offset=32).reshape(int(n), 2)
            td.means = pairs[:, 0].copy()
            td.weights = pairs[:, 1].copy()
        return td


# --------------------------------------------------------------------------
# Spark two-phase aggregation path
# --------------------------------------------------------------------------


def tdigest_agg(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    delta: float = 100.0,
    weight_col: str | None = None,
) -> DataFrame:
    """Distributed tdigest_agg: one binary `tdigest` column per group.

    Phase 1 (map-side combine, no shuffle): mapInPandas folds each input
    partition into one digest per group seen in that partition.
    Phase 2: shuffle only the ~KB digests, applyInPandas merges per group.
    Mirrors TDigestAggregationFunction's partial/final state split.
    ``weight_col`` selects the weighted variant (approx_percentile(x, w, p)
    semantics: weight = multiplicity).
    """
    group_cols = group_cols or []
    gschema = (
        df.select(*group_cols).schema if group_cols else None
    )
    gfields = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in gschema.fields) + ", "
        if group_cols
        else ""
    )
    out_schema = f"{gfields}tdigest binary"

    def _feed(td: TDigest, grp: pd.DataFrame) -> None:
        if weight_col is None:
            td.add(grp[value_col].to_numpy())
        else:
            td.add_weighted(grp[value_col].to_numpy(), grp[weight_col].to_numpy())

    def partial(batches):
        acc: dict[tuple, TDigest] = {}
        for pdf in batches:
            if group_cols:
                for key, grp in pdf.groupby(group_cols, sort=False, dropna=False):
                    k = key if isinstance(key, tuple) else (key,)
                    _feed(acc.setdefault(k, TDigest(delta)), grp)
            else:
                _feed(acc.setdefault((), TDigest(delta)), pdf)
        rows = [
            dict(zip(group_cols, k)) | {"tdigest": td.serialize()}
            for k, td in acc.items()
        ]
        if rows:
            yield pd.DataFrame(rows)

    cols = [*group_cols, value_col] + ([weight_col] if weight_col else [])
    partials = df.select(*cols).mapInPandas(partial, out_schema)

    if not group_cols:
        # single global digest: merge the per-partition states on one task
        def merge_all(batches):
            td = TDigest(delta)
            for pdf in batches:
                for b in pdf["tdigest"]:
                    td.merge(TDigest.deserialize(bytes(b)))
            yield pd.DataFrame({"tdigest": [td.serialize()]})

        return partials.coalesce(1).mapInPandas(merge_all, "tdigest binary")

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        td = TDigest(delta)
        for b in pdf["tdigest"]:
            td.merge(TDigest.deserialize(bytes(b)))
        out = pdf.iloc[:1][group_cols].copy()
        out["tdigest"] = [td.serialize()]
        return out

    return partials.groupBy(*group_cols).applyInPandas(final, out_schema)


def value_at_quantile(sketch_col, q: float):
    """Scalar over a binary tdigest column (TDigestFunctions.java:39)."""

    @pandas_udf(DoubleType())
    def _vaq(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None
            if b is None
            else TDigest.deserialize(bytes(b)).value_at_quantile(q)
        )

    return _vaq(sketch_col)


def values_at_quantiles(sketch_col, qs: list[float]):
    """Array-returning form (TDigestFunctions.java:47)."""

    @pandas_udf(ArrayType(DoubleType()))
    def _vaqs(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None
            if b is None
            else TDigest.deserialize(bytes(b)).values_at_quantiles(qs)
        )

    return _vaqs(sketch_col)


@pandas_udf(DoubleType())
def value_at_quantile_sql(sk: pd.Series, q: pd.Series) -> pd.Series:
    """SQL-registrable 2-arg form: value_at_quantile(tdigest, q)."""
    return pd.Series(
        [
            None
            if b is None
            else TDigest.deserialize(bytes(b)).value_at_quantile(float(x))
            for b, x in zip(sk, q)
        ]
    )


@pandas_udf(DoubleType())
def quantile_at_value_sql(sk: pd.Series, v: pd.Series) -> pd.Series:
    """SQL-registrable inverse form: quantile_at_value(tdigest, v)."""
    return pd.Series(
        [
            None
            if b is None
            else TDigest.deserialize(bytes(b)).quantile_at_value(float(x))
            for b, x in zip(sk, v)
        ]
    )


def quantile_at_value(sketch_col, v: float):
    """Column form of the inverse query (TDigestFunctions.java)."""

    @pandas_udf(DoubleType())
    def _qav(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None
            if b is None
            else TDigest.deserialize(bytes(b)).quantile_at_value(v)
        )

    return _qav(sketch_col)


def merge_tdigests(df: DataFrame, sketch_col: str, group_cols: list[str]) -> DataFrame:
    """merge(tdigest) aggregate over stored sketch columns."""
    gschema = df.select(*group_cols).schema
    gfields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in gschema.fields
    )

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        td: TDigest | None = None
        for b in pdf[sketch_col]:
            d = TDigest.deserialize(bytes(b))
            td = d if td is None else td.merge(d)
        out = pdf.iloc[:1][group_cols].copy()
        out[sketch_col] = [td.serialize()]
        return out

    return df.groupBy(*group_cols).applyInPandas(final, f"{gfields}, {sketch_col} binary")
