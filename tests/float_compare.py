"""Tolerance-aware DataFrame comparison for FLOAT-valued operators
(VERDICT r12 "Next round" #10).

The driver's correctness gate stringifies every cell and hashes it —
bitwise float equality across engines. That contract is achievable
for exact-decimal and fixed-point disciplines (dsum, the c05 integer
features, c05_audio_spectral's quantized trig table) but NOT for
genuinely spectral/float math: two correct implementations of an FFT
or a mel filterbank differ in the last ulps by summation order alone.
Those operators therefore ship as rows-only driver entries (no
oracle_sql — the driver records schema + row count) and get their
STRONG verification here: an explicit-band compare against an
INDEPENDENT reference implementation, run in pytest.

Bands are explicit and per-call: ``atol`` (absolute), ``rtol``
(relative), and ``max_ulps`` (units-in-the-last-place distance on the
float64 grid — the right measure when values span magnitudes). A pair
passes if ANY band accepts it; the report names the worst offender per
column so a failure is diagnosable without rerunning.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd


def ulp_distance(a: float, b: float) -> int:
    """Number of representable float64 values between a and b
    (0 = bitwise equal). Infinite/NaN pairs never match here —
    rows with expected NaN/inf must be filtered or matched exactly
    by the caller first."""
    if math.isnan(a) or math.isnan(b) or math.isinf(a) or math.isinf(b):
        return 1 << 62
    ia = int(np.float64(a).view(np.int64))
    ib = int(np.float64(b).view(np.int64))
    # map IEEE sign-magnitude bit order onto a monotone integer line
    # (Dawson's trick): negative floats fold below zero so -0.0 and
    # +0.0 land on the same point and distances cross zero correctly
    if ia < 0:
        ia = -(2**63) - ia
    if ib < 0:
        ib = -(2**63) - ib
    return abs(ia - ib)


@dataclass
class FloatCompareReport:
    ok: bool
    n_rows: int
    problems: list[str]
    worst: dict[str, tuple[float, float, float, int]]
    # col -> (got, want, abs_err, ulps) of the worst cell


def assert_frames_close(
    got: pd.DataFrame,
    want: pd.DataFrame,
    key_cols: list[str],
    atol: float = 0.0,
    rtol: float = 0.0,
    max_ulps: int = 0,
) -> FloatCompareReport:
    """Compare two frames cell-by-cell after aligning on key columns.

    Key columns compare EXACTLY (they carry the integer/string
    identity of each row); every other shared column is float-compared
    under the (atol | rtol | max_ulps) bands. Raises AssertionError
    with the per-column worst offenders on failure; returns the report
    on success so tests can additionally pin how tight the match was.
    """
    problems: list[str] = []
    g = got.sort_values(key_cols).reset_index(drop=True)
    w = want.sort_values(key_cols).reset_index(drop=True)
    if len(g) != len(w):
        raise AssertionError(f"row count {len(g)} != {len(w)}")
    if sorted(g.columns) != sorted(w.columns):
        raise AssertionError(f"columns {sorted(g.columns)} != {sorted(w.columns)}")
    for k in key_cols:
        if not (g[k].values == w[k].values).all():
            raise AssertionError(f"key column '{k}' misaligned")
    worst: dict[str, tuple[float, float, float, int]] = {}
    val_cols = [c for c in g.columns if c not in key_cols]
    for c in val_cols:
        gv = g[c].to_numpy(dtype=np.float64)
        wv = w[c].to_numpy(dtype=np.float64)
        nan_mismatch = np.isnan(gv) != np.isnan(wv)
        if nan_mismatch.any():
            i = int(np.argmax(nan_mismatch))
            problems.append(f"{c}: NaN pattern mismatch at row {i}")
            continue
        mask = ~np.isnan(gv)
        abs_err = np.abs(gv[mask] - wv[mask])
        rel_ok = abs_err <= rtol * np.abs(wv[mask])
        abs_ok = abs_err <= atol
        hard = ~(rel_ok | abs_ok)
        worst_cell = None
        for idx in np.nonzero(hard)[0]:
            u = ulp_distance(float(gv[mask][idx]), float(wv[mask][idx]))
            if u > max_ulps:
                cell = (
                    float(gv[mask][idx]),
                    float(wv[mask][idx]),
                    float(abs_err[idx]),
                    u,
                )
                if worst_cell is None or u > worst_cell[3]:
                    worst_cell = cell
        if worst_cell is not None:
            worst[c] = worst_cell
            problems.append(
                f"{c}: worst offender got={worst_cell[0]!r} want={worst_cell[1]!r} "
                f"abs_err={worst_cell[2]:.3e} ulps={worst_cell[3]} "
                f"(bands: atol={atol}, rtol={rtol}, max_ulps={max_ulps})"
            )
    if problems:
        raise AssertionError("; ".join(problems))
    return FloatCompareReport(True, len(g), [], worst)
