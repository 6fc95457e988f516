"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID, document fingerprinting.

All ratio/count metrics run JVM-side (built-in + higher-order functions —
whole-stage codegen, no Python). Language-ID is an n-gram cosine
heuristic in a vectorized pandas UDF (inherently model-driven, so the
slow path is justified and Arrow-batched).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "was",
    "for", "on", "are", "as", "with", "his", "they", "at", "be", "this",
]


def token_count(col: Column) -> Column:
    """Whitespace tokens (JVM-side)."""
    t = F.trim(col)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: word tokens + digit runs + punct marks
    (a cheap deterministic proxy for BPE token counts, JVM-side regex)."""
    words = F.size(F.split(F.trim(col), r"\s+"))
    long_words = F.size(F.filter(F.split(F.trim(col), r"\s+"), lambda w: F.length(w) > 7))
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return words + long_words + punct


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword ratios + a composite score.
    Pure built-ins — Catalyst keeps this in one codegen stage."""
    c = F.col(text_col)
    nonempty = F.length(c) > 0
    alpha_len = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    digit_len = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    punct_len = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    toks = F.split(F.trim(c), r"\s+")
    stop_hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(STOPWORDS)))
    n_toks = token_count(c)
    return df.select(
        "*",
        F.length(c).alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.when(nonempty, alpha_len / F.length(c)).otherwise(0.0).alias("alpha_ratio"),
        F.when(nonempty, digit_len / F.length(c)).otherwise(0.0).alias("digit_ratio"),
        F.when(nonempty, punct_len / F.length(c)).otherwise(0.0).alias("punct_ratio"),
        F.when(n_toks > 0, stop_hits / n_toks).otherwise(0.0).alias("stopword_ratio"),
        F.when(n_toks > 0, F.length(c) / n_toks).otherwise(0.0).alias("avg_token_len"),
    )


def fingerprint_md5(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint via md5 (JVM-side; oracle-identical in DuckDB)."""
    return df.withColumn("fingerprint", F.md5(F.col(text_col).cast("binary")))


def rolling_fingerprint(df: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Polynomial rolling-hash document fingerprint: min of window hashes
    (winnowing-style, deterministic) — vectorized pandas UDF."""

    @F.pandas_udf("long")
    def roll(s: pd.Series) -> pd.Series:
        B = np.uint64(1000003)
        mask = np.uint64(0x7FFFFFFFFFFFFFFF)
        powers = np.empty(window, dtype=np.uint64)
        powers[window - 1] = np.uint64(1)
        with np.errstate(over="ignore"):
            for j in range(window - 2, -1, -1):
                powers[j] = powers[j + 1] * B

        texts = s.tolist()
        out = np.zeros(len(texts), dtype=np.int64)
        long_idx, bufs = [], []
        for i, txt in enumerate(texts):
            if not txt:
                continue
            b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
            if len(b) < window:
                # short doc: plain polynomial over its actual length
                # (zero-padding would change the hash)
                h = np.uint64(0)
                with np.errstate(over="ignore"):
                    for x in b.astype(np.uint64):
                        h = h * B + x
                out[i] = np.int64(h & mask)
            else:
                long_idx.append(i)
                bufs.append(b)
        if long_idx:
            # batched winnowing min: one polynomial pass over the
            # concatenated buffers, segment-min via reduceat
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            offs = np.zeros(len(bufs) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            data = np.concatenate(bufs)
            n_all = len(data) - window + 1
            with np.errstate(over="ignore"):
                base = np.zeros(n_all, dtype=np.uint64)
                for j in range(window):
                    base += data[j : j + n_all].astype(np.uint64) * powers[j]
            n_win = lens - window + 1
            segs = np.zeros(len(bufs) + 1, dtype=np.int64)
            np.cumsum(n_win, out=segs[1:])
            valid = np.arange(int(segs[-1])) + np.repeat(offs[:-1] - segs[:-1], n_win)
            mins = np.minimum.reduceat(base[valid], segs[:-1])
            out[long_idx] = (mins & mask).astype(np.int64)
        return pd.Series(out)

    return df.withColumn("fingerprint", roll(F.col(text_col)))


# --- language ID: char-trigram cosine against per-language profiles ------
_LANG_PROFILES = {
    "en": "the and ing ion to of in is it that was for on are with he",
    "de": "der die und den ein ich sch cht ung ver gen das ist nicht",
    "fr": "les des ent que une est dans pour ait qui sur pas vous avec",
    "es": "los las que del con por una para est ado ción ente es en",
    "pt": "que ção ente com uma para dos por mais não está ada os de",
    "it": "che della ione per con una sono del alla anche più di il",
    "nl": "het van een voor met zijn aan niet ook maar deze wordt de",
    "ru": "что это как его все она так они был при или над под не",
}


def _profile_vectors(dim: int = 4096):
    profs = {}
    for lang, text in _LANG_PROFILES.items():
        v = np.zeros(dim, dtype=np.float64)
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        # stable trigram hash (never Python hash(): PYTHONHASHSEED varies
        # across executors)
        tri = (
            b[:-2].astype(np.uint64) * np.uint64(65536)
            + b[1:-1].astype(np.uint64) * np.uint64(256)
            + b[2:].astype(np.uint64)
        )
        np.add.at(v, (tri % np.uint64(dim)).astype(np.int64), 1.0)
        n = np.linalg.norm(v)
        profs[lang] = v / n if n else v
    return profs


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Char-trigram cosine language heuristic (vectorized pandas UDF;
    trigram hashing per doc is numpy-level, not per-row Python string ops)."""

    @F.pandas_udf("string")
    def predict(s: pd.Series) -> pd.Series:
        dim = 4096
        profs = _profile_vectors(dim)
        langs = list(profs)
        mat = np.stack([profs[l] for l in langs])  # (L, dim)
        texts = s.tolist()
        out: list = [None] * len(texts)
        keep, bufs = [], []
        for i, t in enumerate(texts):
            if not t or len(t) < 3:
                continue
            b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
            if len(b) >= 3:
                keep.append(i)
                bufs.append(b)
        # whole-batch trigram counting: one bincount over (doc, bucket)
        # keys and one BLAS matmul per chunk — no per-doc python loop
        CH = 2048  # bounds the (CH, dim) counts matrix to ~64 MB
        for c0 in range(0, len(keep), CH):
            chunk = bufs[c0 : c0 + CH]
            lens = np.array([len(b) for b in chunk], dtype=np.int64)
            offs = np.zeros(len(chunk) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            data = np.concatenate(chunk)
            n_all = len(data) - 2
            tri = (
                data[:n_all].astype(np.uint64) * np.uint64(65536)
                + data[1 : 1 + n_all].astype(np.uint64) * np.uint64(256)
                + data[2 : 2 + n_all].astype(np.uint64)
            )
            n_tri = lens - 2
            segs = np.zeros(len(chunk) + 1, dtype=np.int64)
            np.cumsum(n_tri, out=segs[1:])
            valid = np.arange(int(segs[-1])) + np.repeat(offs[:-1] - segs[:-1], n_tri)
            buckets = (tri[valid] % np.uint64(dim)).astype(np.int64)
            docidx = np.repeat(np.arange(len(chunk)), n_tri)
            counts = (
                np.bincount(docidx * dim + buckets, minlength=len(chunk) * dim)
                .reshape(len(chunk), dim)
                .astype(np.float64)
            )
            norms = np.linalg.norm(counts, axis=1)
            nz = np.flatnonzero(norms > 0)
            sims = (counts[nz] / norms[nz, None]) @ mat.T  # (nz, L)
            picks = sims.argmax(axis=1)
            for j, p in zip(nz, picks):
                out[keep[c0 + int(j)]] = langs[int(p)]
        return pd.Series(out)

    return df.withColumn(out_col, predict(F.col(text_col)))
