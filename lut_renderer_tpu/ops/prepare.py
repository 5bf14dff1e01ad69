"""LUT preparation: Lut3D -> MXU-ready matrix.

The Pallas kernel contracts the (g, b) axes of the LUT jointly on the MXU:
    T'[col, pixel] = sum_{j,k} Lmat[col, j*N+k] * Wt[j*N+k, pixel]
so the LUT is prebaked as `Lmat[(c*N + r), (j*N + k)] = lut[r, j, k, c]`
with the row dim (3N) padded to a multiple of 128 lanes-worth of output rows.

Also carries the domain mapping parameters (DOMAIN_MIN/MAX of the .cube file)
so the apply path can remap inputs exactly like the reference oracle
(colorcore.interp._prepare).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..colorcore.cube import Lut3D


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class PreparedLut:
    lmat: np.ndarray        # (rows_pad, N*N) f32: rows_pad = round_up(3N+1, 128)
    lmat_hi: np.ndarray     # bf16 high half (ml_dtypes bfloat16 as uint16 view-safe)
    lmat_lo: np.ndarray     # bf16 residual: lmat - f32(lmat_hi)
    size: int               # N
    rows_pad: int           # padded row count (output dim of the matmul)
    ones_row: int           # row index of the all-ones sum-correction row (3N)
    domain_min: np.ndarray  # (3,) f32
    domain_max: np.ndarray  # (3,) f32
    table: np.ndarray       # original (N, N, N, 3) f32 (for fallback paths)

    @property
    def has_unit_domain(self) -> bool:
        return bool(
            np.allclose(self.domain_min, 0.0) and np.allclose(self.domain_max, 1.0)
        )


def prepare_lut(lut: Lut3D) -> PreparedLut:
    import ml_dtypes

    table = np.asarray(lut.table, dtype=np.float32)
    n = table.shape[0]
    rows = 3 * n
    rows_pad = _round_up(rows + 1, 128)
    # lmat[c*N + r, k*N + j] = table[r, j, k, c]; row 3N is all-ones so the
    # matmul also returns each pixel's actual weight-column sum (used to
    # cancel bf16 weight rounding in the kernel). Column order is b-major /
    # g-minor so the kernel can build the g-factor of the weight outer
    # product as a native tile (pltpu.repeat) — see lut3d._pass_kernel.
    lmat = np.zeros((rows_pad, n * n), dtype=np.float32)
    # table axes: (r, j, k, c) -> want (c, r, k, j) -> reshape (3N, N*N)
    lmat[:rows] = table.transpose(3, 0, 2, 1).reshape(rows, n * n)
    lmat[rows] = 1.0
    hi = lmat.astype(ml_dtypes.bfloat16)
    lo = (lmat - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return PreparedLut(
        lmat=lmat,
        lmat_hi=hi,
        lmat_lo=lo,
        size=n,
        rows_pad=rows_pad,
        ones_row=rows,
        domain_min=np.asarray(lut.domain_min, np.float32),
        domain_max=np.asarray(lut.domain_max, np.float32),
        table=table,
    )
