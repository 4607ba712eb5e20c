"""Text-analysis kernels for training-data pipelines (target-only ops):
language ID (n-gram heuristic), quality scoring, token counting, document
fingerprinting.  All vectorized (pandas.str / numpy) — intended to run
inside ``map_batches``; regexes and profile tables are module-level so an
actor pool pays construction once per process.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# a BPE-ish word/punct splitter: word pieces, numbers, or single non-space marks
_TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_WORD_RE = re.compile(r"[A-Za-z']+")

# tiny per-language stopword/character profiles (public common-word lists).
# This is a heuristic scorer, not a model — deterministic and dependency-free.
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it he was for on are as with his they at be this".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist nicht ein eine als auch es an".split()),
    "fr": frozenset("le de la et les des en un du une que est dans qui par pour sur pas plus au".split()),
    "es": frozenset("de la que el en y a los se del las un por con no una su para es al lo".split()),
    "it": frozenset("di che la il un a per in una sono mi ho si lo ma le con non e più".split()),
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace-split token count (0 for null/empty)."""
    return texts.fillna("").str.split().str.len().to_numpy(dtype=np.int64)


def bpe_ish_token_count(texts: pd.Series) -> np.ndarray:
    """Sub-word-ish token count via the word/number/punct regex."""
    return texts.fillna("").str.findall(_TOKEN_RE).str.len().to_numpy(dtype=np.int64)


def _exploded_words(texts: pd.Series) -> tuple[np.ndarray, pd.Series, int]:
    """Tokenize + explode: (row_index_of_each_token, token_series, n_rows).
    One vectorized findall + explode; all per-row folds then run as
    bincount / isin over the flat token stream (no Python inner loops)."""
    words = texts.fillna("").str.lower().str.findall(_WORD_RE)
    ex = words.reset_index(drop=True).explode()
    valid = ex[ex.notna()]
    return valid.index.to_numpy(dtype=np.int64), valid, len(texts)


def detect_language(texts: pd.Series) -> pd.Series:
    """Stopword-overlap language ID: argmax over per-language hit counts;
    'und' (undetermined) when nothing matches or the text is empty.

    Vectorized: one explode of the token stream, then per-language
    ``Series.isin`` + bincount — hit counting never loops over rows or
    words in Python (round-1 weakness; semantics pinned by
    tests/test_text_functions.py against the row-loop definition)."""
    langs = list(_LANG_PROFILES)
    rows, valid, n = _exploded_words(texts)
    hits = np.zeros((n, len(langs)), dtype=np.int64)
    if len(valid):
        for j, lang in enumerate(langs):
            m = valid.isin(_LANG_PROFILES[lang]).to_numpy()
            hits[:, j] = np.bincount(rows[m], minlength=n)
    best = hits.argmax(axis=1)  # first max wins == the strict > row loop
    out = np.where(hits.max(axis=1) > 0, np.array(langs, dtype=object)[best], "und")
    return pd.Series(out, index=texts.index, dtype=object)


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Deterministic quality components (one row per doc):
    n_chars, n_tokens, mean_token_len, punct_ratio, digit_ratio,
    upper_ratio, stopword_ratio (en), repetition_ratio."""
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy(dtype=np.int64)
    toks = t.str.split()
    n_tokens = toks.str.len().to_numpy(dtype=np.int64)
    safe_chars = np.maximum(n_chars, 1)
    safe_toks = np.maximum(n_tokens, 1)
    punct = t.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    digits = t.str.count(r"\d").to_numpy(dtype=np.int64)
    upper = t.str.count(r"[A-Z]").to_numpy(dtype=np.int64)
    mean_tok = safe_chars / safe_toks
    n = len(t)
    # stopword ratio: exploded-token isin + bincount (no per-row loop)
    rows, valid, _ = _exploded_words(t)
    word_counts = np.bincount(rows, minlength=n) if len(valid) else np.zeros(n, dtype=np.int64)
    stop_hits = (
        np.bincount(rows[valid.isin(_LANG_PROFILES["en"]).to_numpy()], minlength=n)
        if len(valid)
        else np.zeros(n, dtype=np.int64)
    )
    stop_ratio = stop_hits / np.maximum(1, word_counts)
    # repetition: per-row distinct-token count via one grouped nunique
    ex_tok = toks.reset_index(drop=True).explode()
    ex_tok = ex_tok[ex_tok.notna()]
    nuniq = ex_tok.groupby(ex_tok.index).nunique()
    uniq_counts = np.zeros(n, dtype=np.int64)
    uniq_counts[nuniq.index.to_numpy(dtype=np.int64)] = nuniq.to_numpy(dtype=np.int64)
    uniq_ratio = uniq_counts / np.maximum(1, n_tokens)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": mean_tok,
            "punct_ratio": punct / safe_chars,
            "digit_ratio": digits / safe_chars,
            "upper_ratio": upper / safe_chars,
            "stopword_ratio": stop_ratio,
            "repetition_ratio": 1.0 - uniq_ratio,
        },
        index=texts.index,
    )


def quality_score(texts: pd.Series) -> np.ndarray:
    """Scalar [0,1] quality score from the feature bundle (heuristic:
    penalize very short docs, punct/digit soup, heavy repetition)."""
    f = quality_features(texts)
    length_term = np.clip(f["n_tokens"] / 20.0, 0, 1)
    punct_term = 1.0 - np.clip(f["punct_ratio"] * 3, 0, 1)
    digit_term = 1.0 - np.clip(f["digit_ratio"] * 3, 0, 1)
    rep_term = 1.0 - np.clip((f["repetition_ratio"] - 0.3) * 2, 0, 1)
    return (0.4 * length_term + 0.2 * punct_term + 0.2 * digit_term + 0.2 * rep_term).to_numpy()


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """Stable 64-bit document fingerprint: lower 8 MD5 bytes, little-endian
    — the exact twin of DuckDB's ``md5_number_lower``, so fingerprints are
    verifiable by a SQL oracle and content-addressed across engines (the
    previous pandas ``hash_array`` was engine-private)."""
    from ndap_data_validator_ray.functions.hashing import md5_lower64

    return np.fromiter(
        (md5_lower64(str(t)) for t in texts.fillna("")), dtype=np.uint64, count=len(texts)
    )


def rolling_fingerprints(text: str, window: int = 8, base: int = 257, mod: int = (1 << 61) - 1) -> np.ndarray:
    """Rolling (Rabin-Karp) hash fingerprints of character windows —
    the classic winnowing building block for near-dup document sketches."""
    if len(text) < window:
        # stable short-text fallback: builtin hash() is salted per process
        h = pd.util.hash_array(np.array([text], dtype=object), categorize=False)[0]
        return np.array([h & np.uint64(0x7FFFFFFFFFFFFFFF)], dtype=np.uint64)
    vals = np.frombuffer(text.encode("utf-8", "replace")[: len(text)], dtype=np.uint8)
    n = len(vals)
    if n < window:
        return np.array([int(vals.sum())], dtype=np.uint64)
    powers = pow(base, window - 1, mod)
    out = np.empty(n - window + 1, dtype=np.uint64)
    h = 0
    for i in range(window):
        h = (h * base + int(vals[i])) % mod
    out[0] = h
    for i in range(1, n - window + 1):
        h = ((h - int(vals[i - 1]) * powers) * base + int(vals[i + window - 1])) % mod
        out[i] = h
    return out


# --- PII scrubbing / repetition quality (training-data pipeline ops) -------

# Patterns are RE2-compatible (explicit ASCII classes, no backrefs) so the
# DuckDB oracle's regexp_replace/regexp_extract_all behave identically to
# pandas' re engine on ASCII text.
PII_URL_RE = r"https?://[^ \t\n\r]+"
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IDNUM_RE = r"[0-9]{6,}"


def redact_pii(texts: pd.Series) -> pd.DataFrame:
    """Redact URLs, email addresses and long digit runs (id/phone-like)
    from a text column, counting each kind.  Replacement order matters and
    is fixed (URL, then email, then digits) so an email inside a URL is
    counted once as a URL; each count is taken on the text state BEFORE its
    own replacement, mirroring the SQL oracle's staged CTEs.  Vectorized
    (three compiled-regex passes), per-row local — no shuffle."""
    t = texts.fillna("")
    n_urls = t.str.count(PII_URL_RE).astype(np.int64)
    t = t.str.replace(PII_URL_RE, "<URL>", regex=True)
    n_emails = t.str.count(PII_EMAIL_RE).astype(np.int64)
    t = t.str.replace(PII_EMAIL_RE, "<EMAIL>", regex=True)
    n_ids = t.str.count(PII_IDNUM_RE).astype(np.int64)
    t = t.str.replace(PII_IDNUM_RE, "<ID>", regex=True)
    return pd.DataFrame(
        {"clean_text": t, "n_urls": n_urls, "n_emails": n_emails, "n_ids": n_ids}
    )


def repetition_stats(texts: pd.Series) -> pd.DataFrame:
    """Gopher-style repetition signals per document: token count, distinct
    token count, top-token fraction and distinct-token ratio (raw float64
    ratios — consumers quantize; see repetition_scores_documents' ppm
    convention).  One exploded (doc, term) count frame per batch — no
    Python loop over rows."""
    toks = texts.fillna("").str.lower().str.findall(r"[a-z0-9]+")
    lens = toks.str.len().to_numpy()
    n = len(texts)
    out = pd.DataFrame(
        {
            "n_tokens": np.zeros(n, np.int64),
            "n_distinct": np.zeros(n, np.int64),
            "top_token_frac": np.zeros(n, np.float64),
            "distinct_ratio": np.zeros(n, np.float64),
        }
    )
    total = int(lens.sum())
    if total:
        pairs = pd.DataFrame(
            {
                "_i": np.repeat(np.arange(n), lens),
                "term": np.concatenate([a for a in toks.to_numpy() if len(a)] or [[]]),
            }
        )
        cnt = pairs.groupby(["_i", "term"], sort=False).size()
        g = cnt.groupby(level="_i")
        idx = g.sum().index.to_numpy()
        nt = g.sum().to_numpy().astype(np.int64)
        nd = g.size().to_numpy().astype(np.int64)
        mx = g.max().to_numpy().astype(np.int64)
        out.loc[idx, "n_tokens"] = nt
        out.loc[idx, "n_distinct"] = nd
        out.loc[idx, "top_token_frac"] = mx / nt
        out.loc[idx, "distinct_ratio"] = nd / nt
    return out


def bigram_counts(texts: pd.Series) -> pd.DataFrame:
    """Within-document adjacent-token bigram counts for one batch — the
    partial of a corpus-wide bucketed bigram aggregation.  Boundary-safe:
    the last token of each document never pairs with the next document's
    first token."""
    toks = texts.fillna("").str.lower().str.findall(r"[a-z0-9]+")
    lens = toks.str.len().to_numpy()
    total = int(lens.sum())
    if total < 2:
        return pd.DataFrame({"bigram": pd.Series([], dtype=object), "cnt": pd.Series([], dtype=np.int64)})
    arr = np.concatenate([a for a in toks.to_numpy() if len(a)])
    ends = np.cumsum(lens[lens > 0])
    valid = np.ones(total, dtype=bool)
    valid[ends - 1] = False  # last token of each doc starts no bigram
    left = arr[:-1][valid[:-1]]
    right = arr[1:][valid[:-1]]
    if not len(left):
        return pd.DataFrame({"bigram": pd.Series([], dtype=object), "cnt": pd.Series([], dtype=np.int64)})
    vc = (pd.Series(left, dtype=object) + " " + pd.Series(right, dtype=object)).value_counts()
    return pd.DataFrame({"bigram": vc.index.to_numpy(), "cnt": vc.to_numpy().astype(np.int64)})
