"""Vectorized string edit distance.

``levenshtein_batch`` computes Levenshtein distance for N string pairs
with NO per-pair Python loop: one DP whose rows vectorize across the
pair axis.  The insertion recurrence (a prefix dependency along the row)
is rewritten as a running minimum — with ``u[j] = cur[j] - j`` the
recurrence ``cur[j] = min(t[j-1], cur[j-1] + 1)`` becomes
``u[j] = min(t[j-1] - j, u[j-1])``, i.e. ``np.minimum.accumulate`` —
so the only Python loop is over the ≤max-string-length character
positions, each step O(N · Lb) in numpy.
"""

from __future__ import annotations

import numpy as np


def _code_matrix(strs, pad: int) -> tuple[np.ndarray, np.ndarray]:
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), np.int64, count=n)
    width = int(lens.max()) if n else 0
    mat = np.full((n, width), pad, dtype=np.int64)
    for i, s in enumerate(strs):
        if s:
            mat[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
    return mat, lens


def levenshtein_batch(a_strs, b_strs) -> np.ndarray:
    """Element-wise Levenshtein distance of two equal-length string
    sequences; returns int64 array of shape (len(a_strs),)."""
    a_strs = list(a_strs)
    b_strs = list(b_strs)
    n = len(a_strs)
    if n != len(b_strs):
        raise ValueError("levenshtein_batch needs equal-length sequences")
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    # distinct pads so padding never matches padding
    A, la = _code_matrix(a_strs, pad=-1)
    B, lb = _code_matrix(b_strs, pad=-2)
    La = A.shape[1]
    Lb = B.shape[1]
    j_idx = np.arange(Lb + 1, dtype=np.int64)
    prev = np.tile(j_idx, (n, 1))  # dp row for a-prefix length 0
    for i in range(1, La + 1):
        active = la >= i
        if not active.any():
            break
        ai = A[:, i - 1]
        sub = prev[:, :-1] + (B != ai[:, None])
        dele = prev[:, 1:] + 1
        t = np.minimum(sub, dele)  # candidates before the insertion term
        seed = np.full((n, 1), i, dtype=np.int64)  # u[0] = cur[0] - 0 = i
        u = np.minimum.accumulate(
            np.concatenate([seed, t - j_idx[None, 1:]], axis=1), axis=1
        )
        cur = u + j_idx[None, :]
        prev = np.where(active[:, None], cur, prev)
    return prev[np.arange(n), lb]
