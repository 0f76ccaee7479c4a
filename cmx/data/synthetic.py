"""Synthetic angiography-like corpus for tests and benchmarks.

The FAME2 dataset is private; tests and throughput benchmarks need data with
the same contract (float32 intensity-normalized 2-D images + binary vessel
masks, SURVEY §1 L0->L1). This generator draws random smooth "vessel" paths
(random-walk polylines with varying radius) on a noisy background — enough
structure for Dice/clDice/Hausdorff metrics and for SSL objectives to have
learnable signal.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _vessel_mask(rng: np.random.Generator, size: int, n_vessels: int = 3) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size]
    mask = np.zeros((size, size), dtype=bool)
    for _ in range(n_vessels):
        # random-walk centerline
        pos = np.array([rng.uniform(0, size), rng.uniform(0, size)])
        vel = rng.normal(size=2)
        vel /= np.linalg.norm(vel) + 1e-9
        radius = rng.uniform(1.5, 4.0)
        for _ in range(size * 2):
            pos = pos + vel * 2.0
            vel = vel + rng.normal(size=2) * 0.3
            vel /= np.linalg.norm(vel) + 1e-9
            if not (0 <= pos[0] < size and 0 <= pos[1] < size):
                break
            d2 = (yy - pos[0]) ** 2 + (xx - pos[1]) ** 2
            mask |= d2 <= radius**2
    return mask


def _smooth(img: np.ndarray, iters: int = 2) -> np.ndarray:
    for _ in range(iters):
        img = (
            img
            + np.roll(img, 1, 0)
            + np.roll(img, -1, 0)
            + np.roll(img, 1, 1)
            + np.roll(img, -1, 1)
        ) / 5.0
    return img


def make_sample(rng: np.random.Generator, size: int = 256) -> Tuple[np.ndarray, np.ndarray]:
    """One (image, mask) pair: dark vessels on smooth bright background,
    z-scored like the reference's Intensity_normalizer
    (data_processing/pre_processing.py:95-129)."""
    mask = _vessel_mask(rng, size)
    bg = _smooth(rng.normal(0.6, 0.15, (size, size)), 3)
    img = bg - 0.35 * _smooth(mask.astype(np.float64), 2)
    img = img + rng.normal(0, 0.03, (size, size))
    img = (img - img.mean()) / (img.std() + 1e-8)
    return img.astype(np.float32), mask.astype(np.uint8)


def write_corpus(data_dir: str, n: int = 32, size: int = 256, seed: int = 0) -> None:
    """Write a synthetic corpus in the reference's dataset/ layout."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(data_dir, "imgs")
    msk_dir = os.path.join(data_dir, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(msk_dir, exist_ok=True)
    for i in range(n):
        img, msk = make_sample(rng, size)
        np.save(os.path.join(img_dir, f"sample_{i:04d}.npy"), img)
        np.save(os.path.join(msk_dir, f"sample_{i:04d}.npy"), msk)


def make_batch(
    rng: np.random.Generator, batch: int, size: int = 256
) -> Tuple[np.ndarray, np.ndarray]:
    """In-memory batch: images (B,H,W) float32, one-hot masks (B,H,W,2)."""
    imgs, masks = zip(*(make_sample(rng, size) for _ in range(batch)))
    imgs = np.stack(imgs)
    m = np.stack(masks).astype(np.float32)
    onehot = np.stack([1 - m, m], axis=-1)
    return imgs, onehot
