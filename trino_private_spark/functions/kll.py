"""KLL quantile sketch — the real mergeable ``qdigest``-family aggregate.

Reference: Trino's ``qdigest`` type and aggregates
(``core/trino-spi/.../type/QuantileDigestType.java``,
``operator/aggregation/QuantileDigestAggregationFunction.java``,
``QuantileDigestFunctions.java:499`` — ``value_at_quantile`` /
``values_at_quantiles`` / ``quantile_at_value``).  The reference backs
these with a q-digest over scaled longs; here the sketch is KLL
(Karnin–Lang–Liberty, FOCS'16 — the algorithm behind Apache DataSketches'
quantile sketch), which gives the same capability contract — bounded-size,
fully mergeable, additive over partitions — with a better size/error
trade-off (O((1/eps)·sqrt(log 1/eps)) items, ~1% rank error at k=200).

Structure: levels of items where level ``h`` items carry weight ``2^h``.
Inserts append to level 0; when a level exceeds its capacity
(``max(8, ceil(k·(2/3)^(L-1-h)))``) it is sorted and every other item is
promoted to level ``h+1`` (random offset), halving the retained count.
The compaction coin is drawn from a seeded per-sketch LCG, so the whole
pipeline is deterministic for the driver's repeated runs while keeping the
KLL error analysis's coin-flip structure.

Spark integration mirrors functions/tdigest.py (the reference's
partial/final aggregation split): mapInPandas folds each input partition
into one KB-sized sketch per group — a map-side combine with NO data
shuffle — then applyInPandas merges the per-partition sketches per group.
At 100 TB only the sketches move.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["KLL", "kll_agg", "kll_value_at_quantile", "kll_quantile_at_value"]

_LCG_MULT = 6364136223846793005
_LCG_INC = 1442695040888963407
_MASK = (1 << 64) - 1


class KLL:
    """Karnin–Lang–Liberty quantile sketch over doubles."""

    __slots__ = ("k", "levels", "n", "_coin")

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._coin = 0x9E3779B97F4A7C15 ^ (self.k * 0xBF58476D1CE4E5B9 & _MASK)

    # -- internals ---------------------------------------------------------

    def _cap(self, h: int, num_levels: int) -> int:
        return max(8, int(math.ceil(self.k * (2.0 / 3.0) ** (num_levels - 1 - h))))

    def _flip(self) -> int:
        self._coin = (self._coin * _LCG_MULT + _LCG_INC) & _MASK
        return (self._coin >> 63) & 1

    def _compress(self) -> None:
        while True:
            L = len(self.levels)
            over = None
            for h in range(L):
                if len(self.levels[h]) > self._cap(h, L):
                    over = h
                    break
            if over is None:
                return
            lv = sorted(self.levels[over])
            keep: list[float] = []
            if len(lv) % 2 == 1:
                keep = [lv[-1]]
                lv = lv[:-1]
            promoted = lv[self._flip() :: 2]
            if over + 1 == len(self.levels):
                self.levels.append([])
            self.levels[over + 1].extend(promoted)
            self.levels[over] = keep

    # -- updates -----------------------------------------------------------

    def add(self, values) -> "KLL":
        vals = np.asarray(values, dtype=float)
        vals = vals[~np.isnan(vals)]
        if len(vals):
            self.levels[0].extend(vals.tolist())
            self.n += len(vals)
            self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        for h, lv in enumerate(other.levels):
            while h >= len(self.levels):
                self.levels.append([])
            self.levels[h].extend(lv)
        self.n += other.n
        # mix the coins so merged sketches don't replay the same flips
        self._coin = (self._coin ^ other._coin) & _MASK
        self._compress()
        return self

    # -- queries -----------------------------------------------------------

    def _weighted(self):
        items = []
        for h, lv in enumerate(self.levels):
            w = 1 << h
            items.extend((v, w) for v in lv)
        items.sort()
        return items

    def value_at_quantile(self, q: float) -> float | None:
        if self.n == 0:
            return None
        q = min(max(float(q), 0.0), 1.0)
        items = self._weighted()
        total = sum(w for _, w in items)
        target = q * total
        cum = 0.0
        for v, w in items:
            cum += w
            if cum >= target:
                return float(v)
        return float(items[-1][0])

    def values_at_quantiles(self, qs) -> list[float | None]:
        return [self.value_at_quantile(q) for q in qs]

    def quantile_at_value(self, x: float) -> float | None:
        """Estimated rank of ``x`` in [0, 1] (QuantileDigestFunctions
        quantile_at_value)."""
        if self.n == 0:
            return None
        items = self._weighted()
        total = sum(w for _, w in items)
        below = sum(w for v, w in items if v < x)
        return below / total

    def retained(self) -> int:
        return sum(len(lv) for lv in self.levels)

    # -- serialization -----------------------------------------------------

    def serialize(self) -> bytes:
        return pickle.dumps(
            {"k": self.k, "n": self.n, "coin": self._coin, "levels": self.levels},
            protocol=4,
        )

    @staticmethod
    def deserialize(b: bytes) -> "KLL":
        d = pickle.loads(bytes(b))
        sk = KLL(d["k"])
        sk.n = d["n"]
        sk._coin = d["coin"]
        sk.levels = d["levels"]
        return sk


# --------------------------------------------------------------------------
# Spark two-phase aggregation (QuantileDigestAggregationFunction shape)
# --------------------------------------------------------------------------


def kll_agg(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 200,
) -> DataFrame:
    """Distributed qdigest_agg: one binary ``kll`` column per group.

    Phase 1 (map-side, no shuffle): mapInPandas folds each input partition
    into one sketch per group seen there.  Phase 2: shuffle only the
    KB-sized sketches; applyInPandas merges per group."""
    group_cols = group_cols or []
    if group_cols:
        gschema = df.select(*group_cols).schema
        gfields = (
            ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in gschema.fields)
            + ", "
        )
    else:
        gfields = ""
    out_schema = f"{gfields}kll binary"

    def partial(batches):
        acc: dict[tuple, KLL] = {}
        for pdf in batches:
            if group_cols:
                for key, grp in pdf.groupby(group_cols, sort=False, dropna=False):
                    kk = key if isinstance(key, tuple) else (key,)
                    acc.setdefault(kk, KLL(k)).add(grp[value_col].to_numpy())
            else:
                acc.setdefault((), KLL(k)).add(pdf[value_col].to_numpy())
        rows = [
            dict(zip(group_cols, kk)) | {"kll": sk.serialize()}
            for kk, sk in acc.items()
        ]
        if rows:
            yield pd.DataFrame(rows)

    partials = df.select(*group_cols, value_col).mapInPandas(partial, out_schema)

    if not group_cols:

        def merge_all(batches):
            sk = KLL(k)
            for pdf in batches:
                for b in pdf["kll"]:
                    sk.merge(KLL.deserialize(b))
            yield pd.DataFrame({"kll": [sk.serialize()]})

        return partials.coalesce(1).mapInPandas(merge_all, "kll binary")

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLL(k)
        for b in pdf["kll"]:
            sk.merge(KLL.deserialize(b))
        out = {c: [pdf.iloc[0][c]] for c in group_cols}
        out["kll"] = [sk.serialize()]
        return pd.DataFrame(out)

    return partials.groupBy(*group_cols).applyInPandas(final, out_schema)


def kll_value_at_quantile(sketch_col, q: float):
    """Extract a quantile from a KLL binary column (value_at_quantile)."""

    @pandas_udf("double")
    def _vaq(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else KLL.deserialize(b).value_at_quantile(q)
        )

    return _vaq(sketch_col)


def kll_quantile_at_value(sketch_col, x: float):
    """Estimated rank of ``x`` from a KLL binary column (quantile_at_value)."""

    @pandas_udf("double")
    def _qav(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else KLL.deserialize(b).quantile_at_value(x)
        )

    return _qav(sketch_col)
