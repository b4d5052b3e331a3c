"""Scoring formulas: BM25 (default) and the reference tf-idf.

BM25 (Robertson & Zaragoza 2009; the north-star scorer):
    idf   = ln((N - df + 0.5) / (df + 0.5) + 1)
    wtf   = tf * (1 + importance)          # field weighting, reference-style
    score = idf * wtf*(k1+1) / (wtf + k1*(1 - b + b*dl/avgdl))

The field boost enters through ``wtf`` exactly as the reference's weighted tf
does (components/index_manager.py:36-50: ``weighted_tf = tf*(1+importance)``),
so documents with title/h1/bold matches rank higher under both scorers.

Reference tf-idf (index_manager.py:36-50), for the ``tfidf-ref`` parity mode:
    tf'    = tf / doclen        (0 when doclen == 0)
    tf_idf = tf' * (1 + importance) * log10(N / df)

All functions are numpy-vectorized over posting arrays.
"""

from __future__ import annotations

import numpy as np


def bm25_scores(tf: np.ndarray, importance: np.ndarray, doclen: np.ndarray,
                df: np.ndarray | float, num_docs: int, avgdl: float,
                k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    tf = tf.astype(np.float64)
    wtf = tf * (1.0 + importance.astype(np.float64))
    idf = np.log((num_docs - np.asarray(df, dtype=np.float64) + 0.5) /
                 (np.asarray(df, dtype=np.float64) + 0.5) + 1.0)
    denom = wtf + k1 * (1.0 - b + b * (doclen.astype(np.float64) / max(avgdl, 1e-12)))
    with np.errstate(divide="ignore", invalid="ignore"):
        s = idf * wtf * (k1 + 1.0) / denom
    return np.where(denom > 0, s, 0.0)


def tfidf_ref_scores(tf: np.ndarray, importance: np.ndarray, doclen: np.ndarray,
                     df: np.ndarray | float, num_docs: int) -> np.ndarray:
    dl = doclen.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        tfn = np.where(dl > 0, tf.astype(np.float64) / dl, 0.0)
    idf = np.log10(num_docs / np.asarray(df, dtype=np.float64))
    return tfn * (1.0 + importance.astype(np.float64)) * idf
