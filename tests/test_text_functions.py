"""Semantics pins for the text-analysis kernels: the vectorized
implementations must agree with the straightforward per-row definitions
(the round-1 row-loop semantics) on edge cases — empty/null texts,
tie-breaks, mixed-language rows."""

import numpy as np
import pandas as pd

from ndap_data_validator_ray.functions.text import (
    _LANG_PROFILES,
    _WORD_RE,
    detect_language,
    quality_features,
    rolling_fingerprints,
)


TEXTS = pd.Series(
    [
        "the cat and the dog are in the house",          # en
        "der Hund und die Katze sind in dem Haus",       # de
        "le chat et le chien sont dans la maison",       # fr
        "el gato y el perro en la casa",                 # es
        "di che la il un a per in una sono",             # it
        "",                                              # empty -> und
        None,                                            # null -> und
        "zzz qqq xxx www",                               # no profile hits -> und
        "the der le el",                                 # 4-way tie (1 hit each) -> first lang wins
        "de la en un",                                   # fr/es overlap tie
        "a a a a the the der",                           # repeated words count with multiplicity
        "  THE AND OF to In ",                           # case-folding
    ]
)


def _loop_detect(texts: pd.Series) -> list[str]:
    """The original per-row definition (round-1 reference semantics)."""
    langs = list(_LANG_PROFILES)
    out = []
    for raw in texts.fillna(""):
        ws = _WORD_RE.findall(raw.lower())
        if not ws:
            out.append("und")
            continue
        best, best_hits = "und", 0
        for lang in langs:
            prof = _LANG_PROFILES[lang]
            hits = sum(1 for w in ws if w in prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        out.append(best)
    return out


def test_detect_language_matches_row_loop():
    got = detect_language(TEXTS)
    assert got.tolist() == _loop_detect(TEXTS)


def test_detect_language_expected_labels():
    got = detect_language(TEXTS).tolist()
    assert got[:5] == ["en", "de", "fr", "es", "it"]
    assert got[5] == "und" and got[6] == "und" and got[7] == "und"
    assert got[8] == "en"  # tie -> first profile in declaration order


def test_quality_features_ratios_match_row_loop():
    f = quality_features(TEXTS)
    en = _LANG_PROFILES["en"]
    for i, raw in enumerate(TEXTS.fillna("")):
        ws = _WORD_RE.findall(raw.lower())
        exp_stop = sum(w in en for w in ws) / max(1, len(ws))
        toks = raw.split()
        exp_uniq = len(set(toks)) / max(1, len(toks))
        assert abs(f["stopword_ratio"].iloc[i] - exp_stop) < 1e-12, i
        assert abs(f["repetition_ratio"].iloc[i] - (1.0 - exp_uniq)) < 1e-12, i


def test_quality_features_nonindexed_batch():
    """Works on batches whose index is not a clean RangeIndex."""
    shifted = TEXTS.copy()
    shifted.index = np.arange(100, 100 + len(TEXTS))
    f = quality_features(shifted)
    assert list(f.index) == list(shifted.index)
    assert f["n_tokens"].iloc[0] == len(TEXTS.iloc[0].split())


def test_rolling_fingerprints_short_text_stable():
    a = rolling_fingerprints("abc", window=8)
    b = rolling_fingerprints("abc", window=8)
    assert a.tolist() == b.tolist() and len(a) == 1
    assert rolling_fingerprints("abc") .tolist() != rolling_fingerprints("abd").tolist()


def test_char_shingles_batch_matches_per_doc():
    """Cross-doc-batched shingling + signatures are hash-identical to the
    per-doc kernels (incl. short-doc space padding and empty batch)."""
    import ndap_data_validator_ray.functions.hashing as hs

    texts = ["the quick brown fox jumps", "ab", "", "the quick brown fox jumped", "x" * 500]
    h, offs = hs.char_shingles_batch(texts, k=5)
    assert len(offs) == len(texts)
    ends = np.append(offs[1:], len(h))
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(h[offs[i] : ends[i]], hs.char_shingles(t, 5))
    sig = hs.minhash_signature_matrix_concat(h, offs, num_perm=32)
    per_doc = np.vstack([hs.minhash_signature(hs.char_shingles(t, 5), 32) for t in texts])
    np.testing.assert_array_equal(sig, per_doc)

    h0, o0 = hs.char_shingles_batch([], k=5)
    assert len(h0) == 0 and len(o0) == 0
    assert hs.minhash_signature_matrix_concat(h0, o0, 32).shape == (0, 32)
