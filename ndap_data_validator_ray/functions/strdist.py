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


def jaro_winkler_batch(a_strs, b_strs) -> np.ndarray:
    """Element-wise Jaro-Winkler similarity, bit-identical to DuckDB's
    ``jaro_winkler_similarity`` (fuzz-verified over random and fixture
    pairs in tests/test_new_ops_r5d.py) so engine output can be
    value-oracled against the SQL builtin.

    Semantics pinned by the fuzz: match window ``max(0, max(la,lb)//2-1)``
    (the clamp is what makes equal 1-char strings score 1.0), both-empty
    scores 0.0, case-sensitive, prefix bonus ``j + pref*0.1*(1-j)`` with
    ``pref <= 4`` applied only when jaro > 0.7.  Vectorized across the
    pair axis like ``levenshtein_batch``: the only Python loops are over
    the <= max-string-length character positions (greedy window matching
    is a per-position ``argmax`` over a masked equality matrix; the
    transposition count gathers matched chars with a cumsum-rank
    scatter).  Float expressions mirror the scalar/DuckDB evaluation
    order exactly — see the fuzz test for the bit-equality gate.
    """
    a_strs = list(a_strs)
    b_strs = list(b_strs)
    n = len(a_strs)
    if n != len(b_strs):
        raise ValueError("jaro_winkler_batch needs equal-length sequences")
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    A, la = _code_matrix(a_strs, pad=-1)
    B, lb = _code_matrix(b_strs, pad=-2)
    La = max(A.shape[1], 1)
    Lb = max(B.shape[1], 1)
    if A.shape[1] == 0:
        A = np.full((n, 1), -1, dtype=np.int64)
    if B.shape[1] == 0:
        B = np.full((n, 1), -2, dtype=np.int64)
    dist = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    j_idx = np.arange(Lb, dtype=np.int64)
    matched1 = np.zeros((n, La), dtype=bool)
    matched2 = np.zeros((n, Lb), dtype=bool)
    for i in range(int(la.max()) if n else 0):
        lo = np.maximum(i - dist, 0)
        hi = np.minimum(lb, i + dist + 1)
        window = (j_idx[None, :] >= lo[:, None]) & (j_idx[None, :] < hi[:, None])
        # pads never match: A pad -1 vs B codes/-2 pad always differ
        cand = window & ~matched2 & (B == A[:, i][:, None])
        anyc = cand.any(axis=1)
        first = np.argmax(cand, axis=1)
        matched1[anyc, i] = True
        matched2[anyc, first[anyc]] = True
    m = matched1.sum(axis=1).astype(np.int64)
    # transpositions: matched chars of each side in position order, via
    # cumsum ranks scattered into (n, max_m) gather matrices
    maxm = max(int(m.max()), 1)
    g1 = np.full((n, maxm), -3, dtype=np.int64)
    g2 = np.full((n, maxm), -4, dtype=np.int64)
    r1 = np.cumsum(matched1, axis=1) - 1
    r2 = np.cumsum(matched2, axis=1) - 1
    pi, pj = np.nonzero(matched1)
    g1[pi, r1[pi, pj]] = A[pi, pj]
    pi, pj = np.nonzero(matched2)
    g2[pi, r2[pi, pj]] = B[pi, pj]
    valid = np.arange(maxm, dtype=np.int64)[None, :] < m[:, None]
    t = (((g1 != g2) & valid).sum(axis=1) // 2).astype(np.int64)
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)
    # common prefix (<= 4); pads guarantee the run stops at min(la, lb)
    k = min(4, A.shape[1], B.shape[1])
    pref = (
        np.cumprod(A[:, :k] == B[:, :k], axis=1).sum(axis=1).astype(np.float64)
        if k
        else np.zeros(n, dtype=np.float64)
    )
    return np.where(jaro > 0.7, jaro + pref * 0.1 * (1.0 - jaro), jaro)
