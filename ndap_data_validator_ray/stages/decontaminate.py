"""Benchmark-overlap decontamination: broadcast n-gram filter.

The canonical LLM-training-data op (no reference counterpart — a
target-native extension in the spirit of SURVEY §2.11's plugin checks):
drop from the training corpus every document that shares at least one
word n-gram with a much smaller evaluation/benchmark set, so eval
questions cannot leak into training data.

Shape for 100 TB: the benchmark side is small BY CONSTRUCTION (eval sets
are 10^3-10^5 docs → at most ~10^6-10^7 distinct n-grams).  Its distinct
gram set is collected once (per-batch set partials, deduped on the
driver), ``ray.put`` once, and each filter ACTOR fetches it in
``__init__`` (one object-store read per actor, never per batch).  The
corpus then streams through a single ``map_batches`` with NO shuffle —
the 100 TB side never moves.  If the benchmark gram set ever outgrew
driver/actor memory, the fallback is an exploded-gram bucketed hash join
(corpus grams ⋈ bench grams) — strictly more shuffle, not needed at
real eval-set sizes.

The per-document shingling loop is inherent (same shape as
``stages/dedup_near``); the membership intersection ``grams & bench`` is
a C-level frozenset op, ~1 µs per gram.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ndap_data_validator_ray.functions.hashing import word_ngrams


def collect_gram_set(
    bench: "ray.data.Dataset", text_col: str, n: int = 3
) -> "ray.ObjectRef":
    """Distinct word n-grams of the (small) benchmark set, broadcast once.

    Per-batch partials emit each batch's distinct grams; the driver folds
    set unions — driver memory holds only the distinct grams (the
    benchmark invariant), never benchmark text.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        grams: set[str] = set()
        for t in batch[text_col]:
            grams |= word_ngrams(t or "", n)
        return pd.DataFrame({"gram": sorted(grams)})

    parts = bench.map_batches(partial, batch_format="pandas").to_pandas()
    return ray.put(frozenset(parts["gram"]))


class _OverlapStage:
    """Actor stage: count distinct benchmark grams per corpus doc.

    ``mode="contaminated"`` emits ``(id_col, n_overlap)`` rows only for
    docs with overlap > 0; ``mode="clean"`` passes through the original
    batch columns for docs with zero overlap (the decontaminated corpus).
    """

    def __init__(self, grams_ref, text_col: str, id_col: str, n: int, mode: str):
        self.grams: frozenset[str] = ray.get(grams_ref)
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.mode = mode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].tolist()
        counts = np.fromiter(
            (len(word_ngrams(t or "", self.n) & self.grams) for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        if self.mode == "clean":
            return batch.loc[counts == 0]
        hit = counts > 0
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy()[hit],
                "n_overlap": counts[hit],
            }
        )


def benchmark_overlap(
    corpus: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    n: int = 3,
    concurrency=(2, 8),
) -> "ray.data.Dataset":
    """``(id_col, n_overlap)`` for every corpus doc sharing ≥1 word
    n-gram with the benchmark set."""
    grams_ref = collect_gram_set(bench, text_col, n)
    return corpus.map_batches(
        _OverlapStage,
        fn_constructor_args=(grams_ref, text_col, id_col, n, "contaminated"),
        batch_format="pandas",
        concurrency=concurrency,
    )


def decontaminate(
    corpus: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    n: int = 3,
    concurrency=(2, 8),
) -> "ray.data.Dataset":
    """The corpus minus every doc sharing ≥1 word n-gram with the
    benchmark set (all original columns, streaming pass-through)."""
    grams_ref = collect_gram_set(bench, text_col, n)
    return corpus.map_batches(
        _OverlapStage,
        fn_constructor_args=(grams_ref, text_col, id_col, n, "clean"),
        batch_format="pandas",
        concurrency=concurrency,
    )
