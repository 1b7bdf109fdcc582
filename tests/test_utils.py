"""Utility modules: flow I/O, caffe-style import, profiling, meters."""

import numpy as np
import pytest

from tpureg.utils import (
    AverageMeter,
    IteratorTimer,
    TimerBlock,
    flow_to_image,
    make_color_wheel,
    read_flo,
    read_gen,
    write_flo,
)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((12, 20, 2)).astype(np.float32)
    path = str(tmp_path / "a.flo")
    write_flo(path, flow)
    got = read_flo(path)
    np.testing.assert_allclose(got, flow, atol=0)
    assert read_gen(path).shape == (12, 20, 2)


def test_flo_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 32)
    with pytest.raises(ValueError):
        read_flo(str(p))


def test_color_wheel_and_flow_image(rng):
    wheel = make_color_wheel()
    assert wheel.shape == (55, 3)
    assert wheel.min() >= 0 and wheel.max() <= 255
    flow = rng.standard_normal((16, 16, 2)).astype(np.float32) * 4
    img = flow_to_image(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # opposite directions map to different colors
    f1 = np.zeros((4, 4, 2)); f1[..., 0] = 3.0
    f2 = np.zeros((4, 4, 2)); f2[..., 0] = -3.0
    assert not np.array_equal(flow_to_image(f1), flow_to_image(f2))
    # invalid flow renders black
    f1[0, 0] = 1e9
    assert (flow_to_image(f1)[0, 0] == 0).all()


def test_read_gen_png(tmp_path, rng):
    from PIL import Image

    arr = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "x.png")
    got = read_gen(str(tmp_path / "x.png"))
    np.testing.assert_array_equal(got, arr)


def test_caffe_layer_ordered_import(rng):
    import jax
    import jax.numpy as jnp

    from tpureg.compat import assign_layer_ordered
    from tpureg.models import FlowNetFusion

    mod = FlowNetFusion(use_bn=False)
    variables = mod.init(jax.random.key(0), jnp.zeros((1, 32, 32, 9)),
                         train=False)
    params = variables["params"]

    # fabricate caffe-style (O, I, kh, kw) blobs matching the first 3 convs
    from tpureg.compat.caffe_import import _conv_leaves

    leaves = list(_conv_leaves(jax.tree.map(np.asarray, params)))[:3]
    layers = []
    for _, kern in leaves:
        o, i = kern.shape[3], kern.shape[2]
        kh, kw = kern.shape[0], kern.shape[1]
        layers.append((rng.standard_normal((o, i, kh, kw)).astype(np.float32),
                       rng.standard_normal((o,)).astype(np.float32)))

    new_params, report = assign_layer_ordered(params, layers)
    assert len([r for r in report if r.startswith("layer")]) == 3
    got = list(_conv_leaves(new_params))[0][1]
    np.testing.assert_allclose(got, layers[0][0].transpose(2, 3, 1, 0),
                               atol=0)


def test_profiling_helpers():
    logs = []
    with TimerBlock("t", log=logs.append) as tb:
        tb.log_step("step")
    assert len(logs) == 3

    it = IteratorTimer(range(5))
    assert list(it) == [0, 1, 2, 3, 4]
    assert it.count == 5 and it.sum >= 0


def test_average_meter_keeps_all():
    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0 and m.data == [1.0, 2.0, 3.0] and m.val == 3.0
    m.reset()
    assert m.count == 0
