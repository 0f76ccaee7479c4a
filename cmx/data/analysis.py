"""Corpus analysis utilities (data_processing/utils.py:34-116).

Per-group intensity histograms and Bhattacharyya similarity between
hospital/site distributions — the reference uses these to study FAME2 site
shift; kept as host-side numpy (matplotlib optional).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def intensity_histogram(
    images: Sequence[np.ndarray], bins: int = 64, value_range=(-4.0, 4.0)
) -> np.ndarray:
    """Normalized intensity histogram over a set of images."""
    h = np.zeros(bins, dtype=np.float64)
    for im in images:
        hist, _ = np.histogram(np.asarray(im).ravel(), bins=bins, range=value_range)
        h += hist
    s = h.sum()
    return h / s if s > 0 else h


def bhattacharyya_coefficient(p: np.ndarray, q: np.ndarray) -> float:
    """BC(p, q) = sum sqrt(p_i q_i) in [0, 1]; 1 = identical distributions
    (data_processing/utils.py Bhattacharyya similarity)."""
    return float(np.sum(np.sqrt(np.asarray(p) * np.asarray(q))))


def group_similarity_matrix(
    groups: Dict[str, Sequence[np.ndarray]], bins: int = 64
) -> Dict[str, Dict[str, float]]:
    """Pairwise Bhattacharyya similarity between named groups of images."""
    hists = {k: intensity_histogram(v, bins=bins) for k, v in groups.items()}
    return {
        a: {b: bhattacharyya_coefficient(hists[a], hists[b]) for b in hists}
        for a in hists
    }
