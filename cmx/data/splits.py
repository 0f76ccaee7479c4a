"""Deterministic data-split contract (seed 42).

Every reference silo re-derives identical splits with sklearn's
train_test_split(random_state=42) (Finetuning/train.py:467-468,
Genesis_Chest_CT.py:28-29, Spark/main.py:56-57, moco_data_module.py:156-157,
cmunet_dataset.py:31-32). We call the same sklearn function so splits are
bit-identical to the reference for any given file list.

Layout contract (SURVEY §1 L0->L1): dataset/imgs/<key>.npy (float32 2-D,
intensity-normalized) and dataset/masks/<key>.npy (uint8 {0,1}).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Sequence, Tuple

from sklearn.model_selection import train_test_split


def list_corpus(data_dir: str) -> Tuple[List[str], List[str]]:
    """Sorted (image_paths, mask_paths) from dataset/imgs + dataset/masks.

    Mirrors prepare_train_test (Finetuning/dataset.py:116-132): sorted
    listdir over the two directories.
    """
    img_dir = os.path.join(data_dir, "imgs")
    msk_dir = os.path.join(data_dir, "masks")
    imgs = sorted(os.listdir(img_dir))
    msks = sorted(os.listdir(msk_dir))
    return (
        [os.path.join(img_dir, f) for f in imgs],
        [os.path.join(msk_dir, f) for f in msks],
    )


@dataclass
class Splits:
    """The three-way split every regime shares.

    test: fixed held-out 20%.
    pretrain: the (1 - ratio/0.8) share of the remaining 80% — unlabeled SSL.
    finetune: the ratio/0.8 share — labeled supervised set.
    """

    pretrain_x: List[str]
    pretrain_y: List[str]
    finetune_x: List[str]
    finetune_y: List[str]
    test_x: List[str]
    test_y: List[str]


def make_splits(x: Sequence[str], y: Sequence[str], ratio: float = 0.1) -> Splits:
    """The exact double-split: 80/20 then ratio/0.8 of the 80%.

    ratio is the fine-tune fraction of the FULL corpus: ratio=0.3 -> 50/30
    split, ratio=0.01 -> the 18-image 79/1 split (reference train.py:467-468;
    cmunet_dataset.py:32 hard-codes the equivalent 0.0125 of the 80%).
    """
    x_train, x_test, y_train, y_test = train_test_split(
        list(x), list(y), test_size=0.2, random_state=42
    )
    pre_x, ft_x, pre_y, ft_y = train_test_split(
        x_train, y_train, test_size=ratio / 0.8, random_state=42
    )
    return Splits(pre_x, pre_y, ft_x, ft_y, x_test, y_test)
