"""Quantify the Genesis local-shuffle approximation (VERDICT r1 item 9).

Compares cmx's fast gather-free `local_pixel_shuffling` against an
independently-written faithful host implementation of the reference's
10 000-block sequential shuffle (Transformation_based/utils.py:79-109) on:

  * per-tile intensity-histogram preservation (Bhattacharyya coefficient
    of 16x16-tile histograms, original vs shuffled)
  * spatial autocorrelation decay at lags 1..32
  * global histogram L1 drift

Run: PYTHONPATH=/root/repo python tools/quantify_shuffle.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cmx.ops.genesis import local_pixel_shuffling


def faithful_block_shuffle(rng: np.random.Generator, x: np.ndarray) -> np.ndarray:
    """Reference semantics (utils.py:79-109), written from the behavioral spec:
    10 000 blocks, side ~ U{1..H//25} per axis, position uniform; each block's
    pixels are a shuffle of the ORIGINAL image's content there (not cumulative);
    later blocks overwrite earlier output."""
    h, w = x.shape
    out = x.copy()
    bmax_h, bmax_w = max(h // 25, 1), max(w // 25, 1)
    for _ in range(10_000):
        bh = rng.integers(1, bmax_h + 1)
        bw = rng.integers(1, bmax_w + 1)
        r0 = rng.integers(0, h - bh + 1)
        c0 = rng.integers(0, w - bw + 1)
        win = x[r0 : r0 + bh, c0 : c0 + bw].ravel()
        out[r0 : r0 + bh, c0 : c0 + bw] = rng.permutation(win).reshape(bh, bw)
    return out


def tile_bhattacharyya(a: np.ndarray, b: np.ndarray, tile: int = 16, bins: int = 32):
    """Mean Bhattacharyya coefficient between per-tile histograms of a and b."""
    h, w = a.shape
    lo = min(a.min(), b.min())
    hi = max(a.max(), b.max()) + 1e-6
    coefs = []
    for r in range(0, h - tile + 1, tile):
        for c in range(0, w - tile + 1, tile):
            ha, _ = np.histogram(a[r : r + tile, c : c + tile], bins=bins, range=(lo, hi))
            hb, _ = np.histogram(b[r : r + tile, c : c + tile], bins=bins, range=(lo, hi))
            pa = ha / ha.sum()
            pb = hb / hb.sum()
            coefs.append(np.sum(np.sqrt(pa * pb)))
    return float(np.mean(coefs))


def autocorr(x: np.ndarray, lags=(1, 2, 4, 8, 16, 32)):
    """Normalized spatial autocorrelation, mean of horizontal+vertical."""
    z = x - x.mean()
    denom = float((z * z).mean()) + 1e-12
    out = {}
    for lag in lags:
        ch = float((z[:, :-lag] * z[:, lag:]).mean())
        cv = float((z[:-lag, :] * z[lag:, :]).mean())
        out[lag] = 0.5 * (ch + cv) / denom
    return out


def global_hist_l1(a: np.ndarray, b: np.ndarray, bins: int = 64):
    lo = min(a.min(), b.min())
    hi = max(a.max(), b.max()) + 1e-6
    ha, _ = np.histogram(a, bins=bins, range=(lo, hi), density=True)
    hb, _ = np.histogram(b, bins=bins, range=(lo, hi), density=True)
    ha /= ha.sum()
    hb /= hb.sum()
    return float(np.abs(ha - hb).sum())


def main():
    from cmx.data.synthetic import make_batch

    imgs, _ = make_batch(np.random.default_rng(7), batch=4, size=256)
    imgs = np.asarray(imgs, np.float32)

    lags = (1, 2, 4, 8, 16, 32)
    rows = []
    for i, img in enumerate(imgs):
        rng = np.random.default_rng(100 + i)
        faith = faithful_block_shuffle(rng, img)
        key = jax.random.PRNGKey(200 + i)
        fast = np.asarray(local_pixel_shuffling(key, jnp.asarray(img), prob=1.1))
        ac0 = autocorr(img, lags)
        acf = autocorr(faith, lags)
        acq = autocorr(fast, lags)
        rows.append(
            dict(
                i=i,
                bc_faith=tile_bhattacharyya(img, faith),
                bc_fast=tile_bhattacharyya(img, fast),
                hist_faith=global_hist_l1(img, faith),
                hist_fast=global_hist_l1(img, fast),
                ac0=ac0,
                acf=acf,
                acq=acq,
            )
        )

    print(f"{'img':>3} {'BC faith':>9} {'BC fast':>8} {'histL1 f':>9} {'histL1 q':>9}")
    for r in rows:
        print(
            f"{r['i']:>3} {r['bc_faith']:>9.4f} {r['bc_fast']:>8.4f}"
            f" {r['hist_faith']:>9.4f} {r['hist_fast']:>9.4f}"
        )
    print("\nautocorrelation (mean over images): lag: orig / faithful / fast")
    for lag in lags:
        a0 = np.mean([r["ac0"][lag] for r in rows])
        af = np.mean([r["acf"][lag] for r in rows])
        aq = np.mean([r["acq"][lag] for r in rows])
        print(f"  lag {lag:>2}: {a0:+.4f} / {af:+.4f} / {aq:+.4f}")


if __name__ == "__main__":
    main()
