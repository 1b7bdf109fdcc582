"""OASIS-1 volume→slice data pipeline, TPU-first.

Capability parity with the reference's four MONAI dataset builders
(dataset.py:30-275) re-architected for TPU feeding:

- host side (this module + the native decoder): Analyze volume decode →
  transpose to (V, Z, X, Y) → crop axial window Z∈[60,140), X<176, Y<208
  (dataset.py:55-56) → cached float32 slice stacks (the CacheDataset
  equivalent) → batched numpy slices in deterministic per-volume order
  (GridPatchDataset semantics, dataset.py:66-70).
- device side (one jit per batch): bilinear/nearest resize to 256², rot90,
  random-elastic moving-image synthesis (ops/elastic — replacing the
  reference's host-side Rand2DElasticd), fixed/moving channel concat and
  joint min-max intensity scaling (dataset.py:72-85).

Builders:
- ``volume2slices_datasets``: train/val/test split (fractions + seed
  matching dataset.py:36-49) feeding the training loop
- ``eval_random_dataset``: synthetic-deformation eval pairs, magnitude
  (0.5, 1) (dataset.py:169-219)
- ``real_pairs_dataset``: distinct fixed/moving subjects, no augmentation
  (dataset.py:222-275)
- ``volume_dataset``: whole-volume 3-D pairs with random-affine moving
  synthesis for the affine pre-registration stage (dataset.py:100-167)

Iterators yield dict batches {'image_c': [B,256,256,2], 'seg_c': ...} —
the reference's batch contract (train.py:41-44) in NHWC.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from glob import glob
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.elastic import rand_elastic_2d
from ..ops.resize import resize2d, resize_nd
from ..utils.seeding import seed_everything
from .analyze import read_analyze

__all__ = [
    "list_pairs",
    "split_volumes",
    "VolumeSliceSource",
    "volume2slices_datasets",
    "eval_random_dataset",
    "real_pairs_dataset",
    "volume_dataset",
    "prefetch_to_device",
    "synth_image_batch",
]

CROP_Z = (60, 140)   # dataset.py:56 — 80 axial slices per volume
CROP_X = (0, 176)
CROP_Y = (0, 208)
SLICES_PER_VOLUME = CROP_Z[1] - CROP_Z[0]


def list_pairs(img_dir: str, seg_dir: str) -> List[Dict[str, str]]:
    imgs = sorted(glob(os.path.join(img_dir, "*.img")))
    segs = sorted(glob(os.path.join(seg_dir, "*.img")))
    return [{"image": i, "seg": s} for i, s in zip(imgs, segs)]


def split_volumes(
    items: Sequence,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: int = 6,
    limit: Optional[int] = 10,
):
    """Shuffled train/val/test split (reference dataset.py:35-49 semantics,
    including the [:10] volume cap and the seed-6 permutation)."""
    items = list(items)[:limit] if limit else list(items)
    seed_everything(seed)
    idx = np.arange(len(items))
    np.random.shuffle(idx)
    n_test = int(test_frac * len(items))
    n_val = int(val_frac * len(items)) + n_test
    test = [items[i] for i in idx[:n_test]]
    val = [items[i] for i in idx[n_test:n_val]]
    train = [items[i] for i in idx[n_val:]]
    return train, val, test


def _load_cropped_slices(path: str) -> np.ndarray:
    """(Z=80, X≤176, Y≤208) axial slice stack from one Analyze volume."""
    vol = read_analyze(path)  # (X, Y, Z[, V])
    if vol.ndim == 3:
        vol = vol[..., None]
    # reference Transposed([3,2,0,1]): (V, Z, X, Y); V folds into channel=1
    vol = np.transpose(vol, (3, 2, 0, 1))[0]
    return vol[CROP_Z[0]:CROP_Z[1], CROP_X[0]:CROP_X[1], CROP_Y[0]:CROP_Y[1]]


class VolumeSliceSource:
    """Cached slice supplier for a list of {'image','seg'} volume pairs.

    The decode+crop result is cached on first touch — the CacheDataset role
    (dataset.py:62-64) — then slices are served in deterministic per-volume
    order (GridPatchDataset semantics).

    With ``device_cache=True`` (default) decoded volumes are pushed to the
    accelerator once (~23 MB per cropped volume) and batches are sliced
    on-device with ``jnp.take`` — per-batch host→device transfers through
    the device tunnel dominated the real-data training loop otherwise.
    """

    def __init__(self, items: Sequence[Dict[str, str]], with_seg: bool = True,
                 device_cache: bool = True):
        self.items = list(items)
        self.with_seg = with_seg
        self.device_cache = device_cache
        self._cache: Dict[str, np.ndarray] = {}

    def __len__(self):
        return len(self.items) * SLICES_PER_VOLUME

    def _vol(self, path: str):
        if path not in self._cache:
            vol = _load_cropped_slices(path)
            self._cache[path] = (
                jnp.asarray(vol) if self.device_cache else vol
            )
        return self._cache[path]

    def slice_at(self, index: int):
        vi, zi = divmod(index, SLICES_PER_VOLUME)
        item = self.items[vi]
        img = self._vol(item["image"])[zi]
        seg = self._vol(item["seg"])[zi] if self.with_seg else None
        return np.asarray(img), None if seg is None else np.asarray(seg)

    def _stacked(self):
        """[n_vols, Z, X, Y] device-resident stack of all cached volumes."""
        imgs = jnp.stack([self._vol(it["image"]) for it in self.items])
        segs = (
            jnp.stack([self._vol(it["seg"]) for it in self.items])
            if self.with_seg else None
        )
        return imgs, segs

    def flat_stacks(self):
        """([n_slices, X, Y], [n_slices, X, Y] or None) device-resident
        flattened slice stacks — the input of the fused take+process path."""
        imgs_all, segs_all = self._stacked()
        flat_i = imgs_all.reshape(-1, *imgs_all.shape[2:])
        flat_s = (None if segs_all is None
                  else segs_all.reshape(-1, *segs_all.shape[2:]))
        return flat_i, flat_s

    def batches(self, batch_size: int, order: Optional[np.ndarray] = None):
        """Yield (img [B,X,Y], seg [B,X,Y] or None) batches; the last
        partial batch is dropped (static shapes for jit)."""
        n = len(self)
        if n < batch_size:  # empty split (or fewer slices than one batch):
            return          # yield nothing, like the host path's range()
        order = np.arange(n) if order is None else np.asarray(order)
        if self.device_cache:
            flat_i, flat_s = self.flat_stacks()
            for start in range(0, n - batch_size + 1, batch_size):
                idx = jnp.asarray(order[start : start + batch_size])
                img = jnp.take(flat_i, idx, axis=0)
                seg = None if flat_s is None else jnp.take(flat_s, idx, axis=0)
                yield img, seg
            return
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            imgs, segs = [], []
            for i in idx:
                im, sg = self.slice_at(int(i))
                imgs.append(im)
                if sg is not None:
                    segs.append(sg)
            yield (
                np.stack(imgs).astype(np.float32),
                np.stack(segs).astype(np.float32) if segs else None,
            )


def _minmax_scale(x):
    """Joint per-sample min-max to [0,1] (ScaleIntensityd, dataset.py:83)."""
    lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return jnp.where(hi > lo, (x - lo) / (hi - lo), x)


@partial(jax.jit, static_argnames=("size", "magnitude"))
def _process_synth(key, img, seg, size: int = 256,
                   magnitude: Tuple[float, float] = (0.0, 0.5)):
    """Device-side slice prep + elastic moving synthesis (one fused program)."""
    img = img[..., None]
    img = resize2d(img, (size, size), "bilinear", align_corners=False)
    img = jnp.rot90(img, k=1, axes=(1, 2))
    if seg is not None:
        seg = seg[..., None]
        seg = resize2d(seg, (size, size), "nearest")
        seg = jnp.rot90(seg, k=1, axes=(1, 2))
    mov, mov_seg = rand_elastic_2d(key, img, seg, magnitude_range=magnitude)
    image_c = _minmax_scale(jnp.concatenate([img, mov], axis=-1))
    out = {"image_c": image_c}
    if seg is not None:
        out["seg_c"] = jnp.concatenate([seg, mov_seg], axis=-1)
    return out


@partial(jax.jit, static_argnames=("size", "magnitude"))
def _take_and_process(epoch_key, flat_img, flat_seg, idx, size: int = 256,
                      magnitude: Tuple[float, float] = (0.0, 0.5)):
    """Fused batch-gather + slice prep + elastic synthesis — ONE device
    program per batch instead of separate take/process dispatches (each
    dispatch pays a host→device round-trip, expensive through a tunnel).

    The per-batch augmentation key derives from the epoch key and the
    batch's start offset *inside* the program (no per-batch host-side
    ``jax.random.split`` dispatch chain)."""
    k_aug = jax.random.fold_in(epoch_key, idx[0])
    img = jnp.take(flat_img, idx, axis=0)
    seg = None if flat_seg is None else jnp.take(flat_seg, idx, axis=0)
    return _process_synth.__wrapped__(k_aug, img, seg, size, magnitude)


def synth_image_batch(epoch_key, flat_img, idx, size: int = 256,
                      magnitude: Tuple[float, float] = (0.0, 0.5)):
    """Traceable gather + prep + elastic synthesis → ``image_c`` [B,S,S,2].

    The fused-into-step data path: ``make_train_step(synth=...)`` calls this
    *inside* the jitted train step on a ``(epoch_key, flat_img, idx)`` spec
    from ``SliceDataset.batch_specs()``, so the per-batch augmentation
    program stops being a separate device dispatch that runs serially with
    the step on the single core. Identical math (and RNG stream) to the
    standalone ``_take_and_process`` path."""
    out = _take_and_process.__wrapped__(epoch_key, flat_img, None, idx,
                                        size, magnitude)
    return out["image_c"]


@partial(jax.jit, static_argnames=("size",))
def _take_and_process_real(flat_fi, flat_mi, flat_fs, flat_ms, idx,
                           size: int = 256):
    """Fused gather + prep for real pairs — one dispatch per eval batch
    (batch_size=1 over 80 slices/volume makes eval dispatch-latency-bound)."""
    take = lambda f: jnp.take(f, idx, axis=0)
    return _process_real.__wrapped__(
        take(flat_fi), take(flat_mi), take(flat_fs), take(flat_ms), size
    )


@partial(jax.jit, static_argnames=("size",))
def _process_real(fix_img, mov_img, fix_seg, mov_seg, size: int = 256):
    def prep(x, method):
        x = resize2d(x[..., None], (size, size), method,
                     align_corners=False)
        return jnp.rot90(x, k=1, axes=(1, 2))

    image_c = _minmax_scale(
        jnp.concatenate([prep(fix_img, "bilinear"), prep(mov_img, "bilinear")],
                        axis=-1)
    )
    seg_c = jnp.concatenate(
        [prep(fix_seg, "nearest"), prep(mov_seg, "nearest")], axis=-1
    )
    return {"image_c": image_c, "seg_c": seg_c}


@dataclass
class SliceDataset:
    """Iterable dataset: host slice source + device preprocessing."""

    source: VolumeSliceSource
    batch_size: int
    key: jax.Array
    magnitude: Tuple[float, float] = (0.0, 0.5)
    size: int = 256
    shuffle: bool = False
    epoch: int = 0

    def __len__(self):
        return len(self.source)

    def set_epoch(self, epoch: int):
        """Fold the epoch into the augmentation/shuffle RNG so successive
        epochs draw fresh elastic deformations (Rand2DElasticd redraws per
        epoch in the reference, dataset.py:77-80) while the dataset object —
        and its decoded/device-resident volume cache — is reused across the
        whole run instead of being rebuilt (and re-uploaded) every epoch."""
        self.epoch = epoch

    def _epoch_plan(self):
        """(epoch_key, order_arr, shuffled) for the current epoch — the RNG
        derivation shared by ``__iter__`` and ``batch_specs`` so the fused
        and standalone paths draw identical augmentations."""
        key = (jax.random.fold_in(self.key, self.epoch) if self.epoch
               else self.key)
        order = None
        if self.shuffle:
            key, k_perm = jax.random.split(key)
            order = np.asarray(
                jax.random.permutation(k_perm, len(self.source))
            )
        n = len(self.source)
        return key, (np.arange(n) if order is None else order), order is not None

    @property
    def supports_fused_step(self) -> bool:
        """True when ``batch_specs()`` can feed a ``synth=``-fused train
        step: device-resident cache, image-only (the train loop never reads
        ``seg_c``), and at least one full batch."""
        return (self.source.device_cache and not self.source.with_seg
                and len(self.source) >= self.batch_size)

    def batch_specs(self) -> Iterator[tuple]:
        """Yield ``(epoch_key, flat_img, idx)`` specs for in-step synthesis
        (``pipeline.synth_image_batch`` via ``make_train_step(synth=...)``).
        Same batches/RNG as ``__iter__``'s fused branch — only *where* the
        synthesis program runs differs (inside the step vs standalone)."""
        if not self.supports_fused_step:
            raise ValueError("batch_specs() needs device_cache, "
                             "with_seg=False, and >= one full batch")
        key, order_arr, _ = self._epoch_plan()
        flat_i, _ = self.source.flat_stacks()
        n, bs = len(self.source), self.batch_size
        for start in range(0, n - bs + 1, bs):
            yield key, flat_i, jnp.asarray(order_arr[start:start + bs])

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        key, order_arr, shuffled = self._epoch_plan()
        order = order_arr if shuffled else None
        n, bs = len(self.source), self.batch_size
        # Per-batch augmentation key = fold_in(epoch key, first slice index
        # of the batch) — unique per batch within an epoch (the order is a
        # permutation), reproducible, and free of a per-batch host-side
        # split chain (each split is its own device dispatch).
        if self.source.device_cache and n >= bs:
            # fused path: gather + prep + synthesis in one dispatch per batch
            flat_i, flat_s = self.source.flat_stacks()
            for start in range(0, n - bs + 1, bs):
                yield _take_and_process(
                    key, flat_i, flat_s,
                    jnp.asarray(order_arr[start:start + bs]),
                    self.size, self.magnitude,
                )
            return
        for start_i, (img, seg) in zip(
            range(0, max(n - bs + 1, 0), bs), self.source.batches(bs, order)
        ):
            k_aug = jax.random.fold_in(key, int(order_arr[start_i]))
            yield _process_synth(
                k_aug, jnp.asarray(img), None if seg is None else
                jnp.asarray(seg), self.size, self.magnitude,
            )


def volume2slices_datasets(
    data_dir: str,
    seg_dir: str,
    batch_size: int,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: int = 6,
    limit: Optional[int] = 10,
    shuffle_train: bool = False,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    with_seg: bool = True,
    magnitude: Tuple[float, float] = (0.0, 0.5),
):
    """(train, val, test, train_len, val_len) — reference dataset.py:30-97.

    ``magnitude``: elastic control-point offset range (px) for the moving-
    image synthesis. Default is the reference's hard-coded train range
    (dataset.py:75 Rand2DElastic magnitude (0, 0.5)); exposing it lets
    training cover the displacement scale of the registration task at hand
    (e.g. inter-subject residuals larger than half a pixel).

    ``with_seg=False`` skips segmentation decode + augmentation entirely —
    the reference's train driver never reads ``seg_c`` (train.py:41-44), so
    the training CLI opts out of the wasted per-batch seg elastic warp.

    Multi-host: the *training* volume list is sharded round-robin across
    processes (defaults to ``jax.process_index()/count()``) so each host
    decodes and augments only its slice of the corpus — the standard
    per-process input-pipeline split for data-parallel training over DCN.
    Each process also folds its index into the augmentation RNG so shards
    draw distinct elastic deformations. Val/test stay unsharded (evaluation
    semantics match the single-process reference).
    """
    items = list_pairs(data_dir, seg_dir)
    train_v, val_v, test_v = split_volumes(items, val_frac, test_frac, seed,
                                           limit)
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc > 1 and train_v:
        # Round-robin shard, truncated so every process gets the SAME number
        # of volumes (hence the same steps-per-epoch): unequal local lengths
        # would desync cross-host collectives at epoch end. When there are
        # fewer volumes than processes each process repeats one volume.
        common = max(1, len(train_v) // pc)
        shard = train_v[pi::pc] or [train_v[pi % len(train_v)]]
        train_v = shard[:common]
    key = jax.random.key(seed)
    kt, kv, ks = jax.random.split(key, 3)
    if pc > 1:
        kt = jax.random.fold_in(kt, pi)
    mk = lambda vols, k, shuf: SliceDataset(
        VolumeSliceSource(vols, with_seg=with_seg), batch_size, k,
        magnitude, 256, shuf,
    )
    train = mk(train_v, kt, shuffle_train)
    val = mk(val_v, kv, False)
    test = mk(test_v, ks, False)
    return train, val, test, len(train), len(val)


def eval_random_dataset(data_dir: str, seg_dir: str, batch_size: int,
                        limit: Optional[int] = 5, seed: int = 8):
    """(dataset, length) with eval-strength elastic pairs (dataset.py:169-219)."""
    items = list_pairs(data_dir, seg_dir)[:limit]
    ds = SliceDataset(
        VolumeSliceSource(items), batch_size, jax.random.key(seed),
        magnitude=(0.5, 1.0),
    )
    return ds, len(ds)


@dataclass
class RealPairsDataset:
    """Inter-subject fixed/moving pairs, no augmentation (dataset.py:222-275)."""

    fix_items: List[Dict[str, str]]
    mov_items: List[Dict[str, str]]
    batch_size: int
    size: int = 256

    def __post_init__(self):
        self.fix_src = VolumeSliceSource(self.fix_items)
        self.mov_src = VolumeSliceSource(self.mov_items)

    def __len__(self):
        return len(self.mov_src)

    def __iter__(self):
        bs = self.batch_size
        n = min(len(self.fix_src), len(self.mov_src))
        if (self.fix_src.device_cache and self.mov_src.device_cache
                and n >= bs):
            flat_fi, flat_fs = self.fix_src.flat_stacks()
            flat_mi, flat_ms = self.mov_src.flat_stacks()
            for start in range(0, n - bs + 1, bs):
                idx = jnp.asarray(np.arange(start, start + bs))
                yield _take_and_process_real(
                    flat_fi, flat_mi, flat_fs, flat_ms, idx, self.size
                )
            return
        for (fi, fs), (mi, ms) in zip(
            self.fix_src.batches(bs),
            self.mov_src.batches(bs),
        ):
            yield _process_real(
                jnp.asarray(fi), jnp.asarray(mi), jnp.asarray(fs),
                jnp.asarray(ms), self.size,
            )


def real_pairs_dataset(fiximg_dir, fixseg_dir, movimg_dir, movseg_dir,
                       batch_size: int):
    """(dataset, length). The reference tiles the fixed list to the moving
    list's length (dataset.py:228-229) — one fixed atlas vs many subjects."""
    fix = list_pairs(fiximg_dir, fixseg_dir)
    mov = list_pairs(movimg_dir, movseg_dir)
    fix = (fix * len(mov))[: len(mov)]
    ds = RealPairsDataset(fix, mov, batch_size)
    return ds, len(ds)


# ---------------------------------------------------------------------------
# 3-D volumetric path (affine pre-registration stage)


@partial(jax.jit, static_argnames=("size",))
def _process_volume(key, vol, size: Tuple[int, int, int] = (176, 256, 256)):
    """Resize volume, synthesize moving via random rigid transform.

    Reference volume_ds (dataset.py:141-157): resize to (256,256,176),
    RandAffine rotate ±π/4 about the axial axis + ±5 px in-plane translate.
    Layout here: [B, D, H, W, 1].
    """
    from ..models.affine3d import affine_warp3d

    b = vol.shape[0]
    vol = resize_nd(vol[..., None], size, "linear", align_corners=False)
    vol = jnp.rot90(vol, k=2, axes=(2, 3))  # Rotate90d k=2 (dataset.py:148)

    k_rot, k_tx, k_ty = jax.random.split(key, 3)
    ang = jax.random.uniform(k_rot, (b,), minval=-jnp.pi / 4, maxval=jnp.pi / 4)
    # ±5 px translation normalized to [-1,1] coords
    tx = jax.random.uniform(k_tx, (b,), minval=-5.0, maxval=5.0) * 2 / size[2]
    ty = jax.random.uniform(k_ty, (b,), minval=-5.0, maxval=5.0) * 2 / size[1]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    zeros, ones = jnp.zeros_like(ang), jnp.ones_like(ang)
    theta = jnp.stack(
        [
            jnp.stack([cos, -sin, zeros, tx], axis=-1),
            jnp.stack([sin, cos, zeros, ty], axis=-1),
            jnp.stack([zeros, zeros, ones, zeros], axis=-1),
        ],
        axis=1,
    )  # [B, 3, 4]
    moving = affine_warp3d(vol, theta)
    image_c = _minmax_scale(jnp.concatenate([vol, moving], axis=-1))
    return {"image_c": image_c}


@dataclass
class VolumePairDataset:
    items: List[Dict[str, str]]
    batch_size: int
    key: jax.Array
    size: Tuple[int, int, int] = (176, 256, 256)

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        key = self.key
        vols = []
        for item in self.items:
            v = read_analyze(item["image"])
            if v.ndim == 3:
                v = v[..., None]
            # Transposed([3,1,0,2]) (dataset.py:144): (V, Y, X, Z) → D,H,W
            vols.append(np.transpose(v, (3, 1, 0, 2))[0])
            if len(vols) == self.batch_size:
                key, k = jax.random.split(key)
                yield _process_volume(k, jnp.asarray(np.stack(vols)),
                                      self.size)
                vols = []


def volume_dataset(data_dir: str, batch_size: int, val_frac: float = 0.1,
                   test_frac: float = 0.1, seed: int = 6,
                   limit: Optional[int] = 20):
    """(train, val, test, train_len, val_len) 3-D pairs (dataset.py:100-167)."""
    imgs = sorted(glob(os.path.join(data_dir, "*.img")))
    items = [{"image": p} for p in imgs]
    train_v, val_v, test_v = split_volumes(items, val_frac, test_frac, seed,
                                           limit)
    key = jax.random.key(seed)
    kt, kv, ks = jax.random.split(key, 3)
    mk = lambda vols, k: VolumePairDataset(vols, batch_size, k)
    return mk(train_v, kt), mk(val_v, kv), mk(test_v, ks), len(train_v), len(val_v)


def prefetch_to_device(iterator, size: int = 2):
    """Background-thread prefetch: overlap host decode with device compute.

    Producer-thread exceptions (decode failure mid-epoch, device OOM on the
    transfer) propagate to the consumer instead of silently truncating the
    epoch — a short epoch that looks clean is far harder to diagnose than
    the original error.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.tree.map(jnp.asarray, item))
        except BaseException as e:  # re-raised in the consumer
            q.put(e)
        else:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
