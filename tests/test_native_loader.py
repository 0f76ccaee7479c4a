"""Native C++ corpus loader: build, decode, resize parity with PIL path."""

import numpy as np
import pytest

from cmx.data.corpus import load_corpus
from cmx.data.splits import list_corpus
from cmx.data.synthetic import write_corpus
from cmx.native.loader import load_corpus_native


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, n=8, size=100)
    return list_corpus(d)


def test_native_loads_and_matches_python(corpus):
    xs, _ = corpus
    native = load_corpus_native(xs, 64)
    if native is None:
        pytest.skip("native toolchain unavailable")
    assert native.shape == (8, 64, 64)
    assert native.dtype == np.float32
    py, _ = load_corpus(xs, None, size=64)
    # The native resize implements PIL's antialiased bicubic (kernel support
    # scaled by the downscale factor) — numeric parity, not just correlation,
    # so a run trains on the same pixels whichever loader is available.
    np.testing.assert_allclose(native, py, atol=2e-5, rtol=1e-4)


def test_native_identity_resize(corpus):
    xs, _ = corpus
    native = load_corpus_native(xs, 100)
    if native is None:
        pytest.skip("native toolchain unavailable")
    raw = np.stack([np.load(p) for p in xs])
    np.testing.assert_allclose(native, raw, atol=1e-6)


def test_native_mask_nearest_binary(corpus):
    _, ys = corpus
    m = load_corpus_native(ys, 64, mode="nearest")
    if m is None:
        pytest.skip("native toolchain unavailable")
    assert set(np.unique(m)) <= {0.0, 1.0}
