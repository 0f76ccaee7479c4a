"""Split contract, corpus IO, sampler sharding, schedules, optimizers."""

import numpy as np
import pytest

from cmx.data import synthetic
from cmx.data.corpus import load_corpus, one_hot_encode
from cmx.data.splits import list_corpus, make_splits
from cmx.parallel.dist import InfiniteBatchSampler
from cmx.train import schedules


def test_split_contract_is_sklearn_seed42():
    """Bit-identical to the reference's double train_test_split
    (Finetuning/train.py:467-468)."""
    from sklearn.model_selection import train_test_split

    x = [f"img{i}" for i in range(100)]
    y = [f"msk{i}" for i in range(100)]
    s = make_splits(x, y, ratio=0.1)
    x_tr, x_te, y_tr, y_te = train_test_split(x, y, test_size=0.2, random_state=42)
    pre_x, ft_x, _, _ = train_test_split(x_tr, y_tr, test_size=0.1 / 0.8, random_state=42)
    assert s.test_x == x_te
    assert s.finetune_x == ft_x
    assert s.pretrain_x == pre_x
    assert len(s.test_x) == 20
    assert len(s.finetune_x) == 10  # 0.125 of the 80% train pool


def test_splits_cover_disjoint():
    x = [f"i{i}" for i in range(80)]
    y = [f"m{i}" for i in range(80)]
    s = make_splits(x, y, ratio=0.3)
    all_items = set(s.pretrain_x) | set(s.finetune_x) | set(s.test_x)
    assert len(all_items) == 80
    assert not (set(s.pretrain_x) & set(s.finetune_x))
    assert not (set(s.pretrain_x) & set(s.test_x))


def test_synthetic_corpus_layout(tmp_path):
    synthetic.write_corpus(str(tmp_path), n=6, size=64)
    xs, ys = list_corpus(str(tmp_path))
    assert len(xs) == 6 and len(ys) == 6
    imgs, masks = load_corpus(xs, ys, size=32)
    assert imgs.shape == (6, 32, 32)
    assert imgs.dtype == np.float32
    assert masks.shape == (6, 32, 32, 2)
    np.testing.assert_allclose(masks.sum(-1), 1.0)  # valid one-hot


def test_one_hot_encode_class_values():
    mask = np.array([[0, 1], [1, 0]])
    oh = one_hot_encode(mask, [[0], [1]])
    assert oh.shape == (2, 2, 2)
    np.testing.assert_array_equal(oh[..., 1], mask)


def test_sampler_rank_sharding_disjoint_and_complete():
    """Per-rank shards are disjoint and cover the permutation — the check the
    reference does by hand (Spark/sampler.py:70-74)."""
    world = 4
    samplers = [
        InfiniteBatchSampler(dataset_len=37, batch_size=4, rank=r, world_size=world, seed=7)
        for r in range(world)
    ]
    # one epoch from each rank
    per_rank = []
    for s in samplers:
        it = iter(s)
        idxs = np.concatenate([next(it) for _ in range(s.iters_per_epoch)])
        per_rank.append(idxs)
        assert len(idxs) == s.iters_per_epoch * 4
    allidx = np.concatenate(per_rank)
    # covers the whole dataset (with padding repeats)
    assert set(allidx.tolist()) == set(range(37))
    # deterministic per-seed
    s2 = InfiniteBatchSampler(dataset_len=37, batch_size=4, rank=0, world_size=world, seed=7)
    it2 = iter(s2)
    np.testing.assert_array_equal(per_rank[0][:4], next(it2))


def test_sampler_reshuffles_across_epochs():
    s = InfiniteBatchSampler(dataset_len=16, batch_size=16, rank=0, world_size=1, seed=0)
    it = iter(s)
    e0 = next(it)
    e1 = next(it)
    assert not np.array_equal(e0, e1)
    assert sorted(e0.tolist()) == list(range(16))


# ------------------------------------------------------------------ schedules


def test_warmup_cosine_shape():
    f = schedules.warmup_cosine(1.0, total_steps=100, warmup_steps=10)
    assert float(f(0)) == 0.0
    assert float(f(10)) == pytest.approx(1.0)
    assert float(f(100)) == pytest.approx(0.0, abs=1e-6)
    assert float(f(55)) > float(f(90))


def test_ema_momentum_cosine():
    f = schedules.ema_momentum_cosine(0.99, 0.996, 100)
    assert float(f(0)) == pytest.approx(0.99)
    assert float(f(100)) == pytest.approx(0.996)
    assert float(f(50)) == pytest.approx((0.99 + 0.996) / 2, abs=1e-4)


def test_step_decay():
    f = schedules.step_decay(1e-2, step_size=10, gamma=0.5)
    assert float(f(0)) == pytest.approx(1e-2)
    assert float(f(10)) == pytest.approx(5e-3)
    assert float(f(25)) == pytest.approx(2.5e-3)


def test_scaled_base_lr():
    assert schedules.scaled_base_lr(2e-4, 512) == pytest.approx(4e-4)


# ------------------------------------------------------------------ optimizers


def test_no_decay_mask():
    import jax.numpy as jnp
    from cmx.train.optim import no_decay_mask

    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros((8,))},
        "bn": {"scale": jnp.zeros((8,)), "bias": jnp.zeros((8,))},
        "mask_token": jnp.zeros((1, 1, 8)),
    }
    m = no_decay_mask(params)
    assert m["conv"]["kernel"] is True
    assert m["conv"]["bias"] is False
    assert m["bn"]["scale"] is False
    assert m["mask_token"] is False


@pytest.mark.parametrize("name", ["sgd", "adamw", "lamb", "lars"])
def test_optimizers_step(name):
    import jax
    import jax.numpy as jnp
    import optax
    from cmx.train.optim import make_optimizer
    from cmx.train.schedules import warmup_cosine, cosine_anneal

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = make_optimizer(
        name,
        warmup_cosine(1e-2, 100, 10),
        weight_decay=cosine_anneal(0.04, 0.2, 100),
        clip_norm=5.0,
        params_example=params,
    )
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    upd, st = tx.update(g, st, params)
    new = optax.apply_updates(params, upd)
    assert float(jnp.abs(new["w"] - params["w"]).sum()) >= 0.0
