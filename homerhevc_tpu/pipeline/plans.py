"""Adapters: device pipeline outputs -> dense CtuPlans for the entropy layer."""

from __future__ import annotations

import numpy as np

from ..entropy.syntax import CtuPlan


def plans_from_fixed_grid(out: dict, B: int) -> list:
    """Convert encode_frame_intra outputs (CU = TU = B grid) to CtuPlans."""
    modes = np.asarray(out["modes"])
    lev_y = np.asarray(out["lev_y"])
    lev_u = np.asarray(out["lev_u"])
    lev_v = np.asarray(out["lev_v"])
    nby, nbx = modes.shape
    units = B // 4
    plans = []
    for r in range(nby):
        for c in range(nbx):
            m = int(modes[r, c])
            plans.append(CtuPlan(
                x0=c * B, y0=r * B,
                depth_map=np.zeros((units, units), np.int8),
                luma_mode=np.full((units, units), m, np.int8),
                chroma_mode=np.full((units, units), m, np.int8),
                part_nxn=np.zeros((units, units), bool),
                tr_depth_map=np.zeros((units, units), np.int8),
                coeff_y=lev_y[r, c],
                coeff_cb=lev_u[r, c],
                coeff_cr=lev_v[r, c],
            ))
    return plans
