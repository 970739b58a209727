"""DataModule: multimodal loading, shared shuffle/split, static-shape batches.

Re-design of the reference Lightning DataModule
(multimodal_compare/models/dataloader.py): one dataset-class instance per
modality, a *shared* shuffle permutation across modalities, then a train/val
split by ``test_split`` (dataloader.py:49-68).  Differences, all deliberate:

* batches are plain numpy dicts ``{"mod_i": {"data", "masks"}}`` with *static*
  shapes — the trailing ragged batch is dropped in training (XLA recompiles on
  shape changes) and padded in eval;
* the reference's ``num_workers=0`` synchronous loader (its #1 speed bug,
  SURVEY.md §7) is replaced by an async double-buffered device prefetcher
  (see ``prefetch_to_device``) that overlaps H2D transfer with the train step;
* labels bookkeeping for t-SNE mirrors dataloader.py:178-210.
"""
from __future__ import annotations

import collections
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

from multimodal_vae_comparison_tpu.data.datasets import get_dataset_class


class DataModule:
    def __init__(self, config):
        self.config = config
        self.batch_size = config.batch_size
        self.val_split = config.test_split
        self.dataset_name = config.dataset_name
        cls = get_dataset_class(self.dataset_name)
        self.datasets = [cls(m.path, m.test_datapath, m.mod_type)
                         for m in config.mods]
        self.labels_train: Optional[List] = None
        self.labels_val: Optional[List] = None
        self._train: Optional[List[Dict[str, np.ndarray]]] = None
        self._val: Optional[List[Dict[str, np.ndarray]]] = None
        self._test: Optional[List[Dict[str, np.ndarray]]] = None
        self.labels_test: Optional[List] = None

    # -- setup -----------------------------------------------------------------

    def setup(self) -> None:
        """Load all modalities, apply one shared shuffle, split train/val
        (reference dataloader.py:49-68)."""
        if self._train is not None:
            return
        rng = np.random.default_rng(self.config.seed)
        shuffle = None
        train, val = [], []
        for i, (dataset, mod) in enumerate(zip(self.datasets, self.config.mods)):
            data, masks = dataset.get_data("train")
            if shuffle is None:
                shuffle = rng.permutation(len(data))
            elif len(data) != len(shuffle):
                # silently truncating a longer modality would train on
                # misaligned pairs; this is always a data-file mismatch
                raise ValueError(
                    f"modality files disagree on sample count: "
                    f"{mod.name} has {len(data)} rows, "
                    f"{self.config.mods[0].name} has {len(shuffle)}")
            data = data[shuffle]
            masks = masks[shuffle] if masks is not None else None
            n_train = int(len(data) * (1 - self.val_split))
            train.append({"data": data[:n_train],
                          "masks": masks[:n_train] if masks is not None else None})
            val.append({"data": data[n_train:],
                        "masks": masks[n_train:] if masks is not None else None})
            # feature dims flow into the model specs from the actual arrays
            mod.feature_dims = list(data.shape[1:])
        labels = self.get_labels()
        if labels is not None:
            labels = [labels[j] for j in shuffle]
            n_train = int(len(labels) * (1 - self.val_split))
            self.labels_train = labels[:n_train]
            self.labels_val = labels[n_train:]
        self._train, self._val = train, val
        # dedicated test split from test_datapath when configured; falls back
        # to val otherwise (reference dataloader.py:166-176)
        if any(m.test_datapath for m in self.config.mods):
            test = []
            for dataset, mod in zip(self.datasets, self.config.mods):
                data, masks = dataset.get_data("test")
                test.append({"data": data, "masks": masks})
            self._test = test
            lab = None
            for d in self.datasets:
                try:
                    lab = d.labels()
                except Exception:
                    lab = None
                if lab is not None:
                    break
            self.labels_test = lab

    def get_labels(self):
        if getattr(self.config, "labels", None):
            return self.config.labels
        for d in self.datasets:
            lab = d.labels()
            if lab is not None:
                return lab
        return None

    def split_arrays(self, i: int, split: str = "train"):
        """(data, masks) of modality ``i``'s train or val split, after the
        shared shuffle.  Judge classifiers MUST train on the train split
        only: judged evals sample the val split when no ``test_datapath`` is
        configured, so a judge trained on the full raw file would have its
        calibration scored on its own training data."""
        self.setup()
        part = {"train": self._train, "val": self._val}[split]
        return part[i]["data"], part[i]["masks"]

    @property
    def n_train(self) -> int:
        return len(self._train[0]["data"])

    @property
    def n_val(self) -> int:
        return len(self._val[0]["data"])

    def feature_dims(self) -> List[List[int]]:
        return [list(m.feature_dims) for m in self.config.mods]

    # -- batches -----------------------------------------------------------------

    def _make_batch(self, split: List[Dict], idx: np.ndarray) -> Dict:
        from multimodal_vae_comparison_tpu.data import native
        batch = {}
        for i, mod in enumerate(split):
            name = f"mod_{i + 1}"
            masks = mod["masks"]
            batch[name] = {
                "data": native.gather(mod["data"], idx),
                "masks": native.gather(masks, idx) if masks is not None else None,
            }
        return batch

    def batches(self, split: str = "train", batch_size: Optional[int] = None,
                shuffle: bool = False, seed: int = 0,
                drop_remainder: bool = True) -> Iterator[Dict]:
        """Iterate static-shape batches of one split."""
        self.setup()
        if split == "train":
            data = self._train
        elif split == "test":
            data = self._test if self._test is not None else self._val
        else:
            data = self._val
        n = len(data[0]["data"])
        bs = batch_size or self.batch_size
        order = np.arange(n)
        if shuffle:
            order = np.random.default_rng(seed).permutation(n)
        n_full = n // bs
        for b in range(n_full):
            yield self._make_batch(data, order[b * bs:(b + 1) * bs])
        rem = n - n_full * bs
        if rem and not drop_remainder:
            # pad the tail to keep shapes static (padded rows repeat data);
            # tile when the whole split is smaller than one pad's worth
            reps = int(np.ceil((bs - rem) / n))
            pad = np.tile(order, reps)[: bs - rem]
            yield self._make_batch(data, np.concatenate(
                [order[n_full * bs:], pad]))

    def steps_per_epoch(self, split: str = "train") -> int:
        self.setup()
        n = self.n_train if split == "train" else self.n_val
        return max(n // self.batch_size, 1)


def prefetch_to_device(iterator: Iterator, sharding=None, size: int = 2):
    """Double-buffered host->device prefetch.

    Eagerly device_puts up to ``size`` batches ahead so the H2D DMA of batch
    n+1 overlaps the computation of batch n (replaces the reference's
    synchronous ``num_workers=0`` DataLoader, dataloader.py:122-130).
    ``sharding`` places the batch across the mesh's data axis.
    """
    queue = collections.deque()

    def put(batch):
        def _place(x):
            if x is None:
                return None
            if sharding is not None:
                return jax.device_put(x, sharding)
            return jax.device_put(x)
        return jax.tree_util.tree_map(_place, batch,
                                      is_leaf=lambda x: x is None)

    it = iter(iterator)

    def enqueue(k):
        for _ in range(k):
            batch = next(it, None)
            if batch is None:
                return
            queue.append(put(batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
