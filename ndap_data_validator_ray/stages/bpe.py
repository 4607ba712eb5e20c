"""Distributed byte-pair-encoding (BPE) vocabulary training.

Iterative broadcast shape, like ``stages/kmeans.py``: each merge round
broadcasts the merge table learned so far (``ray.put`` once per round),
every batch re-segments its DISTINCT words under those merges and emits
pre-aggregated ``(left, right, count)`` adjacent-pair partials — only
tiny pair-count rows ever leave a worker, the corpus text never moves.
The driver folds the partials (a pandas groupby over ~vocab² rows at
most, in practice thousands) and picks the next merge with a
deterministic tie-break (count desc, then lexicographic), so the result
is independent of block order and worker count.

Driver state is O(n_merges); each round is one streaming pass.  At
100 TB you train the vocabulary on a documented sample (the op takes any
Dataset — pass ``ds.random_sample(...)`` / a hash-sampled subset), which
is how production tokenizers are trained; the full corpus is only ever
ENCODED (a stateless map_batches with the final merge table), never
iterated over per merge.

No reference counterpart — target-native training-data op (SURVEY §2.11
spirit).  Semantics: lower-cased whitespace words, symbols = characters,
no end-of-word marker (documented simplification; the merge loop is the
standard Sennrich et al. 2016 algorithm).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

import ray
import ray.data


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word under an ordered merge list (exact reference
    algorithm: earliest-learned merge applies first, left-to-right)."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _pair_partial(batch: pd.DataFrame, text_col: str, merges_ref) -> pd.DataFrame:
    merges: list[tuple[str, str]] = ray.get(merges_ref) if merges_ref is not None else []
    # distinct words weighted by frequency — vectorized explode + value_counts
    words = batch[text_col].fillna("").str.lower().str.split().explode()
    freqs = words.value_counts()
    pairs: Counter = Counter()
    for w, f in freqs.items():
        syms = apply_merges(w, merges)
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += int(f)
    if not pairs:
        return pd.DataFrame({"left": [], "right": [], "count": []})
    ks = list(pairs.keys())
    return pd.DataFrame(
        {
            "left": [k[0] for k in ks],
            "right": [k[1] for k in ks],
            "count": np.fromiter(pairs.values(), dtype=np.int64, count=len(ks)),
        }
    )


def bpe_train(
    ds: "ray.data.Dataset", text_col: str, n_merges: int = 20
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges; returns a DataFrame of
    (merge_rank, left, right, count) — count is the corpus-wide pair
    frequency at the round the merge was learned."""
    learned: list[tuple[str, str]] = []
    rows = []
    for rank in range(n_merges):
        merges_ref = ray.put(list(learned)) if learned else None
        parts = ds.map_batches(
            lambda b, _m=merges_ref: _pair_partial(b, text_col, _m),
            batch_format="pandas",
        ).to_pandas()
        if parts.empty:
            break
        folded = parts.groupby(["left", "right"], as_index=False)["count"].sum()
        best = folded.sort_values(
            ["count", "left", "right"], ascending=[False, True, True]
        ).iloc[0]
        if int(best["count"]) < 2:
            break  # nothing left worth merging
        learned.append((str(best["left"]), str(best["right"])))
        rows.append(
            {
                "merge_rank": rank,
                "left": str(best["left"]),
                "right": str(best["right"]),
                "count": int(best["count"]),
            }
        )
    out = pd.DataFrame(rows, columns=["merge_rank", "left", "right", "count"])
    out["merge_rank"] = out["merge_rank"].astype(np.int64)
    out["count"] = out["count"].astype(np.int64)
    return out


def bpe_encode(
    ds: "ray.data.Dataset", text_col: str, merges: list[tuple[str, str]], out_col: str = "n_bpe_tokens"
) -> "ray.data.Dataset":
    """Stateless encode pass: token count per doc under a trained merge
    table (the 100 TB-side op — one streaming map_batches, merge table
    broadcast once per actor)."""
    merges_ref = ray.put(list(merges))

    class _Encoder:
        def __init__(self):
            self.merges = ray.get(merges_ref)
            self.cache: dict[str, int] = {}

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            counts = []
            for t in batch[text_col].fillna(""):
                total = 0
                for w in t.lower().split():
                    n = self.cache.get(w)
                    if n is None:
                        n = len(apply_merges(w, self.merges))
                        self.cache[w] = n
                    total += n
                counts.append(total)
            out = batch.copy()
            out[out_col] = np.asarray(counts, dtype=np.int64)
            return out

    return ds.map_batches(_Encoder, batch_format="pandas", concurrency=(2, 8))
