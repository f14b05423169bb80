"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's scope (its string work stops at hostname rewrites and
word-match domain repair, ``/root/reference/bcdc2bcdc/CustomTransformers.py:677-713``)
— these are the first-class text stages a 100 TB documents pipeline needs:
language ID, quality scoring, token counting, fingerprinting.

All operators are ``pa.Table -> pa.Table`` batch transforms. The regex-based
ones are exposed as callable CLASSES so ``map_batches(Cls, concurrency=N)``
compiles patterns once per actor (SURVEY §2.3 stateful-stage pattern), with
module-level function wrappers for stateless use.

DuckDB-oracle parity notes: token counting uses the same
``regexp_split_to_array(trim(text), '\\s+')`` semantics as the SQL oracle;
fingerprints use md5 (bit-identical to DuckDB's ``md5()``); quality ratios
use integer-count / integer-count double division (IEEE-identical on both
sides).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# top stopwords per language for the n-gram/stopword language-ID heuristic
_LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "que", "de"),
}


def token_count(batch: pa.Table, col: str = "text", out: str = "n_tokens") -> pa.Table:
    """Whitespace token count. Matches DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` exactly (empty string
    → 1, the singleton empty token)."""
    trimmed = pc.utf8_trim_whitespace(batch.column(col))
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    return batch.append_column(out, pc.cast(pc.list_value_length(toks), pa.int64()))


def quality_score(batch: pa.Table, col: str = "text") -> pa.Table:
    """Length / alpha-ratio / punctuation-ratio quality features.

    n_chars    = length(text)
    n_alpha    = count of [a-zA-Z]
    n_punct    = count of [.,;:!?]
    alpha_ratio, punct_ratio = counts / greatest(n_chars, 1)  (double)
    """
    text = batch.column(col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(
        pc.count_substring_regex(text, "[a-zA-Z]"), pa.int64()
    )
    n_punct = pc.cast(pc.count_substring_regex(text, "[.,;:!?]"), pa.int64())
    denom = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    batch = batch.append_column("n_chars_q", n_chars)
    batch = batch.append_column("n_alpha", n_alpha)
    batch = batch.append_column("n_punct", n_punct)
    batch = batch.append_column(
        "alpha_ratio", pc.divide(pc.cast(n_alpha, pa.float64()), denom)
    )
    batch = batch.append_column(
        "punct_ratio", pc.divide(pc.cast(n_punct, pa.float64()), denom)
    )
    return batch


class LangId:
    """Stopword-hit language ID — callable class: the per-language word-
    boundary regexes compile once per actor (``__init__``), batches stream
    through ``__call__``. Predicts the language with the most stopword hits;
    ties break by fixed language order; no hits → 'und'."""

    LANGS = tuple(_LANG_STOPWORDS)

    def __init__(self):
        # pattern strings built once per actor; Arrow's RE2 kernel does the
        # per-batch work fully vectorized
        self.pats = {
            lang: r"\b(" + "|".join(words) + r")\b"
            for lang, words in _LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column("text"))
        scores = np.zeros((batch.num_rows, len(self.LANGS)), dtype=np.int64)
        for j, lang in enumerate(self.LANGS):
            # count_substring_regex is null for null text — fill 0 BEFORE the
            # int cast (a raw NaN cast produces garbage scores) so null text
            # falls through to the no-hit 'und' branch below.
            scores[:, j] = pc.fill_null(
                pc.count_substring_regex(low, self.pats[lang]), 0
            ).to_numpy(zero_copy_only=False)
        best = scores.argmax(axis=1)
        pred = np.array(self.LANGS, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        return batch.append_column("lang_pred", pa.array(pred, pa.string()))


_LANGID_CACHE: list = []


def lang_id(batch: pa.Table) -> pa.Table:
    """Task-friendly LangId: worker-cached instance (pattern strings build
    once per worker process — no actor-pool startup per execution)."""
    if not _LANGID_CACHE:
        _LANGID_CACHE.append(LangId())
    return _LANGID_CACHE[0](batch)


def md5_fingerprint(batch: pa.Table, col: str = "text", out: str = "fp") -> pa.Table:
    """Hex-md5 document fingerprint — bit-identical to DuckDB ``md5(text)``.
    Per-row digest is inherently scalar; kept off hot CDC paths."""
    s = batch.column(col).to_pandas()
    fp = s.map(
        lambda v: None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
    )
    return batch.append_column(out, pa.array(fp, pa.string()))


def rolling_fingerprint(
    batch: pa.Table, col: str = "text", out: str = "rfp", window: int = 8
) -> pa.Table:
    """Rolling polynomial (Karp-Rabin) fingerprint: min rolling hash over
    byte windows — a locality-sensitive document signature used for
    fingerprint-based dedup. Vectorized per row over a numpy byte view."""
    s = batch.column(col).to_pandas()
    B = np.uint64(257)
    powB = B ** np.uint64(window - 1)

    def fp(v):
        if v is None:
            return None
        b = np.frombuffer(v.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < window:
            h = np.uint64(0)
            for x in b:
                h = h * B + x
            return int(h)
        with np.errstate(over="ignore"):
            h = np.zeros(len(b) - window + 1, dtype=np.uint64)
            acc = np.uint64(0)
            for i in range(window):  # window is small constant (8)
                acc = acc * B + b[i]
            h[0] = acc
            for i in range(1, len(h)):
                acc = (acc - b[i - 1] * powB) * B + b[i + window - 1]
                h[i] = acc
        return int(h.min())

    return batch.append_column(out, pa.array(s.map(fp), pa.uint64()))
