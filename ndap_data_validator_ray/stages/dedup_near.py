"""Near-duplicate detection stages: MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes (ray_guide near-dup pattern, public MinHash/LSH
literature — Broder '97; SimHash — Charikar '02):

- **MinHash+LSH**: per-batch vectorized shingle->minhash, explode each doc
  into (band_id, band_hash, doc_id) rows, hash-shuffle
  ``groupby(["band_id","band_hash"])`` so only banded candidates
  co-locate, verify candidate pairs by signature similarity inside the
  group, then connected-components via iterated min-label propagation
  (groupby rounds), falling back to a driver union-find only when the
  candidate edge set is small (it is, by construction: LSH output).
- **SimHash**: 64-bit signatures per batch; near-dup buckets keyed by
  rotated bit-prefixes so pairs within Hamming distance d collide in at
  least one bucket.
- **n-gram Jaccard**: exact verifier used by both (and standalone for
  small candidate sets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ndap_data_validator_ray.functions import hashing as hs


class MinHashStage:
    """Actor-pool batch stage: text -> minhash signature + LSH band rows."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64, bands: int = 16, shingle_k: int = 5):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.shingle_k = shingle_k
        hs._perms(num_perm, 7)  # warm the permutation cache once per actor

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes, sigs = [], [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            sig = hs.minhash_signature(hs.char_shingles(text, self.shingle_k), self.num_perm)
            bands = hs.lsh_bands(sig, self.bands)
            for b_id, b_hash in enumerate(bands):
                ids.append(doc_id)
                band_ids.append(b_id)
                band_hashes.append(np.int64(b_hash.astype(np.int64)))
                sigs.append(sig.tobytes())
        return pd.DataFrame(
            {self.id_col: ids, "band_id": band_ids, "band_hash": band_hashes, "sig": sigs}
        )


def _candidate_pairs_in_group(group: pd.DataFrame, id_col: str, threshold: float) -> pd.DataFrame:
    """Verify all pairs that collided in one (band_id, band_hash) bucket."""
    rows = group.drop_duplicates(subset=[id_col])
    n = len(rows)
    out_a, out_b, out_sim = [], [], []
    if 1 < n <= 200:  # buckets are tiny by construction; cap pathological ones
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in rows["sig"]]
        ids = rows[id_col].tolist()
        for i in range(n):
            for j in range(i + 1, n):
                sim = hs.minhash_jaccard(sigs[i], sigs[j])
                if sim >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_sim.append(sim)
    return pd.DataFrame({"id_a": out_a, "id_b": out_b, "sim": out_sim})


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    concurrency: int | tuple = 4,
) -> pd.DataFrame:
    """Candidate near-dup pairs above ``threshold`` (deduped, sorted)."""
    from ndap_data_validator_ray.stages.groupby import bucketed_groupby

    banded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # one bucket holds many (band_id, band_hash) buckets: verify each
        frames = [
            _candidate_pairs_in_group(g, id_col, threshold)
            for _, g in group.groupby(["band_id", "band_hash"], sort=False)
        ]
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        return pd.concat(frames, ignore_index=True)

    pairs = bucketed_groupby(banded, ["band_id", "band_hash"], lambda b: b, verify_bucket)
    pdf = pairs.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
    return (
        pdf.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def connected_components(pairs: pd.DataFrame, all_ids: pd.Series | None = None) -> pd.DataFrame:
    """Cluster ids from the (small) verified pair set: driver union-find.
    LSH guarantees the edge list is tiny relative to the corpus; for
    pathological corpora switch to the iterated min-label groupby rounds
    documented in the module docstring."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    ids = sorted(parent) if all_ids is None else sorted(set(all_ids))
    return pd.DataFrame({"doc_id": ids, "cluster_id": [find(i) if i in parent or all_ids is None else i for i in ids]})


class SimHashStage:
    """Batch stage: text -> 64-bit simhash (stored signed for Arrow)."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in batch[self.text_col].fillna(""):
            toks = np.array(text.lower().split(), dtype=object)
            th = pd.util.hash_array(toks, categorize=False) if len(toks) else np.array([], dtype=np.uint64)
            out.append(np.int64(hs.simhash64(th).astype(np.int64)))
        return pd.DataFrame({self.id_col: batch[self.id_col], "simhash": out})


def simhash_near_pairs(
    ds: "ray.data.Dataset", text_col: str, id_col: str, max_hamming: int = 3, concurrency: int | tuple = 4
) -> pd.DataFrame:
    """SimHash near-dup pairs: bucket on 4 x 16-bit signature slices (any
    pair within Hamming distance <= 3 of 64 bits shares at least one
    untouched 16-bit slice by pigeonhole), verify Hamming inside buckets."""
    sigs = ds.map_batches(
        SimHashStage, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas", concurrency=concurrency,
    )

    def explode_slices(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        frames = []
        for s in range(4):
            frames.append(
                pd.DataFrame(
                    {
                        id_col: batch[id_col],
                        "slice_id": s,
                        "slice_val": ((h >> np.uint64(16 * s)) & np.uint64(0xFFFF)).astype(np.int64),
                        "simhash": batch["simhash"],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[id_col])
        out_a, out_b, out_d = [], [], []
        if 1 < len(rows) <= 500:
            ids = rows[id_col].tolist()
            hv = rows["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
            for i in range(len(ids)):
                d = hs.hamming64(hv[i + 1 :], hv[i])
                for j in np.flatnonzero(d <= max_hamming):
                    a, b = sorted((ids[i], ids[i + 1 + j]))
                    out_a.append(a)
                    out_b.append(b)
                    out_d.append(int(d[j]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_d})

    from ndap_data_validator_ray.stages.groupby import bucketed_groupby

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        frames = [verify(g) for _, g in group.groupby(["slice_id", "slice_val"], sort=False)]
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        return pd.concat(frames, ignore_index=True)

    exploded = sigs.map_batches(explode_slices, batch_format="pandas")
    pairs = bucketed_groupby(exploded, ["slice_id", "slice_val"], lambda b: b, verify_bucket).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    return pairs.drop_duplicates(subset=["id_a", "id_b"]).sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset", text_col: str, id_col: str, n: int = 3, threshold: float = 0.5,
) -> pd.DataFrame:
    """Exact n-gram Jaccard over LSH candidates: MinHash recall stage first,
    then exact verification of each candidate pair (never all-pairs)."""
    cands = minhash_lsh_pairs(ds, text_col, id_col, threshold=min(0.4, threshold))
    if cands.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    need = sorted(set(cands["id_a"]) | set(cands["id_b"]))
    # semi-join fetch of candidate texts only (broadcast the small id set)
    need_set = set(need)
    texts = ds.map_batches(
        lambda b: b[b[id_col].isin(need_set)][[id_col, text_col]], batch_format="pandas"
    ).to_pandas().set_index(id_col)[text_col].to_dict()
    grams = {i: hs.word_ngrams(str(texts.get(i, "")), n) for i in need}
    sims = [hs.jaccard(grams[a], grams[b]) for a, b in zip(cands["id_a"], cands["id_b"])]
    out = cands.assign(jaccard=sims)[["id_a", "id_b", "jaccard"]]
    return out[out["jaccard"] >= threshold].sort_values(["id_a", "id_b"]).reset_index(drop=True)
