"""User-defined function surface (SURVEY.md §2.11): the four extension
points Spark offers beyond built-in expressions, each used where it is
the RIGHT tool and oracle-checkable:

- scalar ``pandas_udf``   — Arrow-vectorized per-row compute (token
  entropy: a real quality signal whose log-sum shape has no clean
  Catalyst form);
- plain ``F.udf``          — row-at-a-time; kept OUT of hot paths by
  policy (10-100x slower than Arrow), included as the surface demo on
  integer checksum math where cost is irrelevant;
- grouped-agg ``pandas_udf`` — a true UDAF (median absolute deviation:
  order statistics that built-in aggregates cannot compose);
- Python UDTF              — one row in, many rows out with computed
  columns (keyword-context extraction), the table-function member.

The reference has no user-extensible functions at all (Python helpers
applied eagerly, generate_weather_data.py:26-44); this module is the
net-new Spark-native surface.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, LongType


_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list:
    # identical normalization to functions.normalize_text / the SQL _NORM
    return [t for t in _TOKEN_RE.sub(" ", (text or "").lower()).strip().split(" ") if t]


@pandas_udf(DoubleType())
def token_entropy(texts: pd.Series) -> pd.Series:
    """Shannon entropy (nats) of each document's within-doc token
    distribution — a vectorized scalar pandas UDF (one Arrow batch in,
    one out). Summation over counts in token-sorted order so any engine
    replaying the formula reproduces the float exactly."""

    def ent(text: str) -> float:
        toks = _tokens(text)
        n = len(toks)
        if n == 0:
            return 0.0
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        acc = 0.0
        for t in sorted(counts):
            p = counts[t] / n
            acc += p * math.log(p)
        return -acc

    return texts.map(ent)


@udf(LongType())
def knuth_checksum(doc_id: int) -> int:
    """Row-at-a-time ``F.udf`` surface demo: Knuth multiplicative hash on
    the id — exact integer math, so the plain-UDF path itself is under
    the oracle. Policy note: this path deserializes one row per call;
    anything hot uses the Arrow forms instead."""
    return (int(doc_id) * 2654435761) % (1 << 31)


def mad_grouped_agg():
    """A true UDAF as a GROUPED_AGG pandas_udf: median absolute
    deviation. Two order statistics composed — inexpressible with
    built-in aggregates without double windows; numpy's interpolated
    median matches ANSI ``quantile_cont(0.5)`` bit-for-bit (midpoint
    average of the two central order statistics)."""
    import numpy as np

    @pandas_udf(DoubleType())
    def mad(values: pd.Series) -> float:
        v = values.dropna().to_numpy(dtype="float64")
        if v.size == 0:
            return None
        return float(np.median(np.abs(v - np.median(v))))

    return mad


@udtf(returnType="pos int, context string")
class KeywordContext:
    """Python UDTF (table function): emit one row per occurrence of the
    keyword with a +-2-token context window — the span-extraction shape
    (entity mentions, citation mining) where one input row fans out to
    0..n output rows with computed columns. Positions are 0-based over
    the normalized token sequence."""

    def eval(self, text: str, keyword: str):
        toks = _tokens(text)
        n = len(toks)
        for j, t in enumerate(toks):
            if t == keyword:
                yield j, " ".join(toks[max(j - 2, 0) : min(j + 3, n)])
