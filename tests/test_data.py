"""Data pipeline: Analyze reader (incl. native path), slicing, datasets."""

import os
import struct

import numpy as np
import pytest

from tpureg.data import (
    AnalyzeHeader,
    VolumeSliceSource,
    list_pairs,
    read_analyze,
    split_volumes,
    volume2slices_datasets,
)
from tpureg.data.pipeline import SLICES_PER_VOLUME


def write_analyze(path_base, vol, datatype=4):
    """Write a minimal little-endian Analyze 7.5 pair (.hdr/.img)."""
    np_dtype = {2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32}[datatype]
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    dims = (len(vol.shape),) + vol.shape + (1,) * (7 - len(vol.shape))
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<h", hdr, 70, datatype)
    struct.pack_into("<h", hdr, 72, np_dtype().itemsize * 8)
    struct.pack_into("<8f", hdr, 76, 0, 1, 1, 1, 1, 0, 0, 0)
    with open(path_base + ".hdr", "wb") as f:
        f.write(hdr)
    vol.astype(np_dtype).ravel(order="F").tofile(path_base + ".img")


@pytest.fixture
def oasis_dir(tmp_path, rng):
    """Synthetic OASIS-like directory: 3 volumes + segs, 176×208×176."""
    img_dir = tmp_path / "img"
    seg_dir = tmp_path / "seg"
    img_dir.mkdir()
    seg_dir.mkdir()
    for i in range(3):
        vol = (rng.random((176, 208, 176, 1)) * 1000).astype(np.int16)
        seg = rng.integers(0, 4, (176, 208, 176, 1)).astype(np.int16)
        write_analyze(str(img_dir / f"sub{i:02d}_mpr"), vol)
        write_analyze(str(seg_dir / f"sub{i:02d}_seg"), seg)
    return str(img_dir), str(seg_dir)


def test_header_and_roundtrip(tmp_path, rng):
    vol = (rng.random((16, 20, 12)) * 255).astype(np.float32)
    write_analyze(str(tmp_path / "t"), vol, datatype=16)
    hdr = AnalyzeHeader(str(tmp_path / "t.hdr"))
    assert hdr.shape == (16, 20, 12)
    got = read_analyze(str(tmp_path / "t.img"), use_native=False)
    np.testing.assert_allclose(got, vol, atol=0)


@pytest.mark.skipif(
    not os.path.exists(
        os.path.join(os.path.dirname(__file__), "..", "native", "libanalyze.so")
    ),
    reason="native decoder not built (make -C native)",
)
@pytest.mark.parametrize("datatype", [2, 4, 8, 16])
def test_native_matches_numpy(tmp_path, rng, datatype):
    vol = (rng.random((8, 10, 6)) * 120).astype(np.float32)
    write_analyze(str(tmp_path / "t"), vol, datatype=datatype)
    a = read_analyze(str(tmp_path / "t.img"), use_native=False)
    b = read_analyze(str(tmp_path / "t.img"), use_native=True)
    np.testing.assert_allclose(a, b, atol=0)


def test_split_reproducible():
    items = list(range(10))
    t1 = split_volumes(items, seed=6)
    t2 = split_volumes(items, seed=6)
    assert t1 == t2
    assert len(t1[0]) == 8 and len(t1[1]) == 1 and len(t1[2]) == 1
    assert sorted(t1[0] + t1[1] + t1[2]) == items


def test_slice_source_shapes(oasis_dir):
    img_dir, seg_dir = oasis_dir
    src = VolumeSliceSource(list_pairs(img_dir, seg_dir))
    assert len(src) == 3 * SLICES_PER_VOLUME
    img, seg = src.slice_at(0)
    assert img.shape == (176, 208) and seg.shape == (176, 208)


def test_volume2slices_batches(oasis_dir):
    img_dir, seg_dir = oasis_dir
    train, val, test, train_len, val_len = volume2slices_datasets(
        img_dir, seg_dir, batch_size=4, limit=3
    )
    # int(0.1*3)=0 test/val volumes → all 3 land in train (reference floor math)
    assert train_len == 3 * SLICES_PER_VOLUME
    batch = next(iter(train))
    assert batch["image_c"].shape == (4, 256, 256, 2)
    assert batch["seg_c"].shape == (4, 256, 256, 2)
    x = np.asarray(batch["image_c"])
    assert 0.0 <= x.min() and x.max() <= 1.0 and x.max() > 0.5  # scaled
    segs = np.unique(np.asarray(batch["seg_c"]))
    assert set(segs.tolist()) <= {0.0, 1.0, 2.0, 3.0}
    # fixed channel differs from synthesized moving channel
    assert np.abs(x[..., 0] - x[..., 1]).max() > 1e-3


def test_volume2slices_magnitude_passthrough(oasis_dir):
    """--aug_magnitude plumbing: the train dataset synthesizes with the
    requested elastic range (default = the reference's (0, 0.5),
    dataset.py:75); a larger range produces visibly larger displacements."""
    img_dir, seg_dir = oasis_dir
    train_d, _, _, _, _ = volume2slices_datasets(
        img_dir, seg_dir, batch_size=4, limit=3)
    assert train_d.magnitude == (0.0, 0.5)
    train_w, _, _, _, _ = volume2slices_datasets(
        img_dir, seg_dir, batch_size=4, limit=3, magnitude=(0.0, 4.0))
    assert train_w.magnitude == (0.0, 4.0)
    d = next(iter(train_d))["image_c"]
    w = next(iter(train_w))["image_c"]
    # same fixed slices up to the JOINT pair min-max intensity scaling
    # (the moving synthesis strength shifts the pair's min/max — reference
    # dataset.py scales fixed+moving together), different moving strength
    np.testing.assert_allclose(np.asarray(d[..., 0]), np.asarray(w[..., 0]),
                               atol=0.05)
    assert float(np.abs(np.asarray(w[..., 1] - w[..., 0])).mean()) > float(
        np.abs(np.asarray(d[..., 1] - d[..., 0])).mean())


def test_volume2slices_process_sharding(oasis_dir):
    """Multi-host input split: disjoint round-robin train shards truncated
    to EQUAL per-process lengths (identical steps-per-epoch on every host —
    unequal lengths would desync cross-host collectives at epoch end);
    val/test unsharded; distinct per-process RNG."""
    from tpureg.data import volume2slices_datasets

    img_dir, seg_dir = oasis_dir
    full, _, _, _, _ = volume2slices_datasets(
        img_dir, seg_dir, batch_size=4, val_frac=0.0, test_frac=0.0,
        process_index=0, process_count=1,
    )
    shards = [
        volume2slices_datasets(
            img_dir, seg_dir, batch_size=4, val_frac=0.0, test_frac=0.0,
            process_index=i, process_count=2,
        )
        for i in range(2)
    ]
    full_items = {it["image"] for it in full.source.items}
    shard_items = [
        {it["image"] for it in s[0].source.items} for s in shards
    ]
    # equal local epoch length on every process (3 volumes / 2 procs → 1 each)
    assert len(shards[0][0]) == len(shards[1][0]) > 0
    assert shard_items[0] | shard_items[1] <= full_items
    assert not (shard_items[0] & shard_items[1])
    # val/test unsharded: same on every process
    assert len(shards[0][1]) == len(shards[1][1])
    # distinct augmentation keys per process
    import jax

    assert not np.array_equal(
        np.asarray(jax.random.key_data(shards[0][0].key)),
        np.asarray(jax.random.key_data(shards[1][0].key)),
    )


def test_volume2slices_sharding_covers_when_divisible(oasis_dir, tmp_path):
    """With n_volumes divisible by process_count the equal-length shards
    still cover the whole corpus (nothing dropped)."""
    from tpureg.data import volume2slices_datasets

    img_dir, seg_dir = oasis_dir
    shards = [
        volume2slices_datasets(
            img_dir, seg_dir, batch_size=4, val_frac=0.0, test_frac=0.0,
            process_index=i, process_count=3,
        )
        for i in range(3)
    ]
    items = [{it["image"] for it in s[0].source.items} for s in shards]
    assert all(len(s[0]) == len(shards[0][0]) for s in shards)
    union = set().union(*items)
    assert len(union) == 3  # all volumes covered


def test_prefetch_propagates_producer_error():
    """A decode error mid-epoch must raise in the consumer, not silently
    truncate the epoch (VERDICT r1 weakness #5a)."""
    import pytest

    from tpureg.data import prefetch_to_device

    def bad_iter():
        yield {"image_c": np.zeros((1, 4, 4, 2), np.float32)}
        raise ValueError("synthetic decode failure")

    it = prefetch_to_device(bad_iter())
    next(it)
    with pytest.raises(ValueError, match="synthetic decode failure"):
        next(it)


def test_empty_split_yields_no_batches():
    """An empty split (e.g. 6 volumes -> int(0.6)=0 val volumes) must yield
    zero batches on the device-cache path, not crash jnp.stack([]) — the
    reference's empty DataLoader iterates zero times the same way."""
    src = VolumeSliceSource([], with_seg=True, device_cache=True)
    assert list(src.batches(4)) == []


def test_set_epoch_redraws_augmentations(oasis_dir):
    """set_epoch must change the elastic draws (the reference's Rand2DElasticd
    redraws per epoch) without rebuilding the dataset/volume cache."""
    img_dir, seg_dir = oasis_dir
    train, _, _, _, _ = volume2slices_datasets(img_dir, seg_dir, 4, limit=3,
                                               val_frac=0.0, test_frac=0.0)
    train.set_epoch(1)
    b1 = next(iter(train))["image_c"]
    train.set_epoch(2)
    b2 = next(iter(train))["image_c"]
    train.set_epoch(1)
    b1_again = next(iter(train))["image_c"]
    assert not np.allclose(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b1_again))


def test_fused_take_process_matches_host_path(oasis_dir):
    """The fused one-dispatch gather+prep+synthesis path (device_cache) must
    reproduce the host slicing path bit-for-bit, and with_seg=False must not
    change the image synthesis (the displacement draw is seg-independent)."""
    import jax

    from tpureg.data.pipeline import SliceDataset

    img_dir, seg_dir = oasis_dir
    pairs = list_pairs(img_dir, seg_dir)
    key = jax.random.key(3)

    def batches(device_cache, with_seg, shuffle=True):
        ds = SliceDataset(
            VolumeSliceSource(pairs, with_seg=with_seg,
                              device_cache=device_cache),
            batch_size=4, key=key, shuffle=shuffle,
        )
        ds.set_epoch(2)
        return [jax.tree.map(np.asarray, b) for b, _ in zip(iter(ds), range(3))]

    fused = batches(device_cache=True, with_seg=True)
    host = batches(device_cache=False, with_seg=True)
    for f, h in zip(fused, host):
        np.testing.assert_allclose(f["image_c"], h["image_c"], atol=1e-6)
        np.testing.assert_array_equal(f["seg_c"], h["seg_c"])

    no_seg = batches(device_cache=True, with_seg=False)
    for f, n in zip(fused, no_seg):
        np.testing.assert_array_equal(f["image_c"], n["image_c"])
        assert "seg_c" not in n


def test_real_pairs_fused_matches_host_path(oasis_dir):
    import jax

    from tpureg.data.pipeline import RealPairsDataset

    img_dir, seg_dir = oasis_dir
    pairs = list_pairs(img_dir, seg_dir)
    fix, mov = pairs[:1] * 2, pairs[1:3]

    def batches(device_cache):
        ds = RealPairsDataset(fix, mov, batch_size=4)
        for src in (ds.fix_src, ds.mov_src):
            src.device_cache = device_cache
        return [jax.tree.map(np.asarray, b) for b, _ in zip(iter(ds), range(2))]

    for f, h in zip(batches(True), batches(False)):
        np.testing.assert_allclose(f["image_c"], h["image_c"], atol=1e-6)
        np.testing.assert_array_equal(f["seg_c"], h["seg_c"])


def test_batch_specs_match_iter(oasis_dir):
    """batch_specs + synth_image_batch (the make_train_step(synth=...) fused
    data path) must reproduce __iter__'s batches exactly — same order, same
    RNG stream — across shuffle and set_epoch."""
    import jax

    from tpureg.data.pipeline import SliceDataset, synth_image_batch

    img_dir, seg_dir = oasis_dir
    pairs = list_pairs(img_dir, seg_dir)
    ds = SliceDataset(
        VolumeSliceSource(pairs, with_seg=False, device_cache=True),
        batch_size=4, key=jax.random.key(5), shuffle=True,
    )
    assert ds.supports_fused_step
    for epoch in (0, 2):
        ds.set_epoch(epoch)
        for (batch, spec), _ in zip(
            zip(iter(ds), ds.batch_specs()), range(3)
        ):
            got = synth_image_batch(*spec, size=ds.size,
                                    magnitude=ds.magnitude)
            # identical RNG + math; only eager-vs-jitted fusion rounding
            # separates the two paths (fp32, ~1e-5)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(batch["image_c"]), atol=3e-5
            )
