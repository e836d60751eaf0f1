"""Single-process reference-shaped oracle for the gap-fill pipeline.

A deliberately naive, loop-per-doc, loop-per-segment implementation
that follows the reference algorithm structure literally
(/root/reference/src/04_reconstruct_s2_traits.py: prepare_lai_ts
:112-155, rescale :158-159, interpolate_between_assimilated_points
:162-213), with the engine's two documented fixes (per-key knockout
RNG, non-NaN-poisoned outlier stats). Used by pytest to verify the
vectorized ``gapfill_batch`` point-for-point — the "exact rollup-point
match to reference" gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.response import PARAMS, response_np, temperature_np
from ..sources.gen import EPOCH_UNIX, VALUE_SCALE
from .gapfill import _doc_key_hash, splitmix64

HOUR = 3600


def decode_doc(tokens: np.ndarray):
    t = np.asarray(tokens, dtype=np.int64)
    dts, vals = t[0::2], t[1::2]
    hours = np.cumsum(dts)
    return hours, vals.astype(np.float64) / VALUE_SCALE


def gapfill_doc_oracle(doc_id: str, tokens, curve: str = "asymptotic",
                       params: dict | None = None, knockout: float = 0.0,
                       outlier_filter: bool = True, seed: int = 42) -> pd.DataFrame:
    hours, vals = decode_doc(tokens)
    n = len(hours)

    if knockout > 0:
        key = _doc_key_hash(np.array([doc_id]), seed)[0]
        r = splitmix64(np.full(n, key, dtype=np.uint64)
                       ^ splitmix64(np.arange(n, dtype=np.uint64)))
        n_drop = int(n * knockout)
        drop = set(np.argsort(r, kind="stable")[:n_drop])
        keep = np.array([i not in drop for i in range(n)])
        hours, vals = hours[keep], vals[keep]

    if outlier_filter and len(vals):
        mean, std = np.mean(vals), np.std(vals)  # population std, like np.std
        keep = np.ones(len(vals), dtype=bool)
        for i in range(1, len(vals)):  # first point exempt (reference rule)
            if vals[i] < mean - std:
                keep[i] = False
        hours, vals = hours[keep], vals[keep]

    rows = []
    if len(hours) < 2:
        for h, v in zip(hours, vals):
            rows.append((h, v, True))
    else:
        for i in range(len(hours) - 1):
            seg_h = np.arange(hours[i], hours[i + 1] + 1)
            t_c = temperature_np((EPOCH_UNIX + seg_h * HOUR).astype(np.float64))
            resp = response_np(curve, t_c, params or PARAMS.get(curve))
            cum = np.cumsum(resp)
            in_min, in_max = cum[0], cum[-1]
            for j, h in enumerate(seg_h):
                if h == hours[i + 1] and i < len(hours) - 2:
                    continue  # right endpoint owned by next segment
                if in_max > in_min:
                    frac = (cum[j] - in_min) / (in_max - in_min)
                else:
                    frac = (h - hours[i]) / max(hours[i + 1] - hours[i], 1)
                v = vals[i] + frac * (vals[i + 1] - vals[i])
                rows.append((h, v, h == hours[i] or h == hours[-1]))
    out = pd.DataFrame(rows, columns=["hour", "value", "is_obs"])
    out["ts"] = pd.to_datetime((EPOCH_UNIX + out["hour"] * HOUR) * 1_000_000, unit="us")
    return out
