"""Checkpoint import: torch→flax conversion parity + channel surgery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpureg.compat import (
    collapse_rgb_input,
    collapse_rgb_pair_input,
    import_torch_state_dict,
    load_torch_checkpoint,
)
from tpureg.nn import ConvBlock, TorchConvTranspose

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

KEY = jax.random.key(0)


def test_conv_bn_block_forward_parity(rng):
    """torch Sequential(conv,bn,leaky) == imported ConvBlock, eval mode."""
    tblock = tnn.Sequential(
        tnn.Conv2d(3, 8, 5, stride=2, padding=2, bias=False),
        tnn.BatchNorm2d(8),
        tnn.LeakyReLU(0.1),
    )
    tblock.eval()
    with torch.no_grad():  # randomize BN stats so the test is non-trivial
        tblock[1].running_mean.uniform_(-0.5, 0.5)
        tblock[1].running_var.uniform_(0.5, 1.5)
        tblock[1].weight.uniform_(0.5, 1.5)
        tblock[1].bias.uniform_(-0.2, 0.2)

    sd = {f"myblock.{k}": v.detach().numpy() for k, v in
          tblock.state_dict().items()}

    block = ConvBlock(8, 5, 2, use_bn=True)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    variables = block.init(KEY, jnp.asarray(x), train=False)

    params, stats, report = import_torch_state_dict(
        sd, variables["params"], variables["batch_stats"],
        prefix=(),
    )
    # our tree root is the block itself; torch prefix 'myblock' maps to it
    assert report["missing"], "prefix mismatch should report missing"

    # retry with matching tree nesting
    sd2 = {k.replace("myblock.", ""): v for k, v in sd.items()}
    # translate '0.weight' style: wrap names as conv-block members
    sd2 = {f"blk.{k}": v for k, v in sd2.items()}
    variables2 = {"params": {"blk": variables["params"]},
                  "batch_stats": {"blk": variables["batch_stats"]}}
    params, stats, report = import_torch_state_dict(
        sd2, variables2["params"], variables2["batch_stats"]
    )
    assert not report["missing"] and not report["shape_mismatch"]

    got = block.apply(
        {"params": params["blk"], "batch_stats": stats["blk"]},
        jnp.asarray(x), train=False,
    )
    want = tblock(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy()
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want, 1, -1), atol=1e-5
    )


def test_conv_transpose_forward_parity(rng):
    tconv = tnn.ConvTranspose2d(4, 6, 4, stride=2, padding=1, bias=True)
    sd = {"up.weight": tconv.weight.detach().numpy(),
          "up.bias": tconv.bias.detach().numpy()}
    # 'up' is not a recognized deconv name — use upflow naming
    sd = {"upflow2to1.weight": sd["up.weight"], "upflow2to1.bias": sd["up.bias"]}

    mod = TorchConvTranspose(6, 4, 2, 1, use_bias=True)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    variables = mod.init(KEY, jnp.asarray(x))
    params, _, report = import_torch_state_dict(
        sd, {"upflow2to1": variables["params"]}, {},
    )
    assert not report["missing"] and not report["shape_mismatch"]

    got = mod.apply({"params": params["upflow2to1"]}, jnp.asarray(x))
    want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy()
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want, 1, -1), atol=1e-5
    )


def test_channel_surgery():
    w = np.arange(2 * 6 * 3 * 3, dtype=np.float32).reshape(2, 6, 3, 3)
    pair = collapse_rgb_pair_input(w)
    assert pair.shape == (2, 2, 3, 3)
    np.testing.assert_allclose(pair[:, 0], w[:, :3].sum(1))
    np.testing.assert_allclose(pair[:, 1], w[:, 3:].sum(1))
    rgb = collapse_rgb_input(w[:, :3])
    assert rgb.shape == (2, 1, 3, 3)


def test_flownets_import_roundtrip(rng):
    """Invert conversions on our own FlowNetS tree → torch-style dict →
    reimport covers every leaf (full strict=False load, zero misses)."""
    from tpureg.models import FlowNetS

    mod = FlowNetS(style="pinard", use_bn=True)
    x = jnp.zeros((1, 64, 64, 2))
    variables = mod.init(KEY, x, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}

    def emit(path, leaf):
        arr = np.asarray(leaf)
        mods = list(path)
        name = mods[-1]
        if name == "bn":
            torch_name = ".".join(mods[:-1]) + ".1"
            return  # handled with params below via explicit mapping
        sd[".".join(mods)] = arr

    # build torch-style keys by inverting _translate for this tree
    def walk(tree, path, stats_tree):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict):
                walk(v, p, stats_tree)
            else:
                leafpath = p
                yield leafpath, v

    for p, v in walk(params, [], stats):
        arr = np.asarray(v)
        mods, leaf = p[:-1], p[-1]
        if mods and mods[-1] == "conv":
            key = ".".join(mods[:-1]) + ".0." + ("weight" if leaf == "kernel" else "bias")
            val = arr.transpose(3, 2, 0, 1) if leaf == "kernel" else arr
        elif mods and mods[-1] == "bn":
            key = ".".join(mods[:-1]) + ".1." + ("weight" if leaf == "scale" else "bias")
            val = arr
        elif mods and mods[-1] == "convt":
            key = ".".join(mods[:-1]) + ".0." + ("weight" if leaf == "kernel" else "bias")
            val = (np.flip(arr.transpose(2, 3, 0, 1), (2, 3))
                   if leaf == "kernel" else arr)
        elif mods and mods[-1].startswith("upflow"):
            a, b = mods[-1][6], mods[-1][-1]
            key = ".".join(mods[:-1] + [f"upsampled_flow{a}_to_{b}"]) + "." + (
                "weight" if leaf == "kernel" else "bias")
            val = (np.flip(arr.transpose(2, 3, 0, 1), (2, 3))
                   if leaf == "kernel" else arr)
        else:
            key = ".".join(mods) + "." + ("weight" if leaf == "kernel" else "bias")
            val = arr.transpose(3, 2, 0, 1) if leaf == "kernel" else arr
        sd[key] = np.ascontiguousarray(val)

    for p, v in walk(stats, [], None):
        mods, leaf = p[:-1], p[-1]
        assert mods[-1] == "bn"
        key = ".".join(mods[:-1]) + ".1." + (
            "running_mean" if leaf == "mean" else "running_var")
        sd[key] = np.asarray(v)

    new_params, new_stats, report = import_torch_state_dict(sd, params, stats)
    assert not report["missing"], report["missing"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    # every leaf restored identically
    for (pa, a), (pb, b) in zip(walk(params, [], None),
                                walk(new_params, [], None)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_load_torch_checkpoint_file(tmp_path, rng):
    w = torch.from_numpy(rng.standard_normal((4, 2, 3, 3)).astype(np.float32))
    torch.save({"state_dict": {"conv1.0.weight": w}}, tmp_path / "ckpt.pth.tar")
    sd = load_torch_checkpoint(str(tmp_path / "ckpt.pth.tar"))
    assert set(sd) == {"conv1.0.weight"} and sd["conv1.0.weight"].shape == (4, 2, 3, 3)


# ---------------------------------------------------------------------------
# caffemodel dump reader (compat/caffe_reader.py vs param_utils.py:5-254)

def _pb_varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(num, wire, payload):
    tag = _pb_varint((num << 3) | wire)
    if wire == 2:
        return tag + _pb_varint(len(payload)) + payload
    return tag + payload


def _pb_blob(arr, legacy=False):
    """Encode a BlobProto: packed float data + shape (or legacy 4-D dims)."""
    import struct

    arr = np.asarray(arr, np.float32)
    data = _pb_field(5, 2, arr.ravel().tobytes())
    if legacy:
        # caffe legacy 4-D blobs pad LEADING dims (bias = (1,1,1,N))
        dims = [1] * (4 - arr.ndim) + list(arr.shape)
        shape = b"".join(
            _pb_field(f, 0, _pb_varint(d))
            for f, d in zip((1, 2, 3, 4), dims)
        )
        return shape + data
    shape_msg = _pb_field(1, 2, b"".join(_pb_varint(d) for d in arr.shape))
    return data + _pb_field(7, 2, shape_msg)


def _pb_layer(name, blobs, v1=False, legacy_blob=False):
    name_f = 4 if v1 else 1
    blob_f = 6 if v1 else 7
    msg = _pb_field(name_f, 2, name.encode())
    for b in blobs:
        msg += _pb_field(blob_f, 2, _pb_blob(b, legacy=legacy_blob))
    return msg


def encode_caffemodel(layers, v1=False, legacy_blob=False):
    """Synthetic NetParameter wire encoding: {name: [blobs]} → bytes."""
    field = 2 if v1 else 100
    return b"".join(
        _pb_field(field, 2, _pb_layer(n, bs, v1, legacy_blob))
        for n, bs in layers.items()
    )


@pytest.mark.parametrize("v1,legacy", [(False, False), (True, True)])
def test_caffemodel_roundtrip(tmp_path, rng, v1, legacy):
    """Wire-format reader recovers names, shapes and values from both the
    modern (layer=100) and V1 (layers=2, legacy 4-D blob dims) formats."""
    from tpureg.compat import read_caffemodel

    w = rng.standard_normal((8, 3, 5, 5)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    raw = encode_caffemodel(
        {"conv1": [w, b], "relu1": [], "fc": [rng.standard_normal((4, 8)).astype(np.float32)]},
        v1=v1, legacy_blob=legacy,
    )
    path = tmp_path / "net.caffemodel"
    path.write_bytes(raw)
    blobs = read_caffemodel(str(path))
    assert set(blobs) == {"conv1", "fc"}  # blob-less layers skipped
    np.testing.assert_array_equal(blobs["conv1"][0], w)
    np.testing.assert_array_equal(blobs["conv1"][1], b)
    assert blobs["fc"][0].shape == (4, 8)


def test_caffe_layers_ordering_and_flip(rng):
    """caffe_layers returns (weight, bias) pairs in the reference's
    param_utils.py order with the stem BGR triplet flips applied."""
    from tpureg.compat import CAFFE_NETS, caffe_layers

    keys, prefix, double_up, flips = CAFFE_NETS["flownetfusion"]
    layers = {}
    shapes = {}
    for i, k in enumerate(keys):
        name = prefix + k
        cin = 11 if i == 0 else 4
        w = rng.standard_normal((6, cin, 3, 3)).astype(np.float32)
        layers[name] = [w, np.full((6,), float(i), np.float32)]
        shapes[name] = w
    raw = encode_caffemodel(layers)
    pairs = caffe_layers(raw, "flownetfusion")
    assert len(pairs) == len(keys)
    # order preserved: bias i identifies layer i
    for i, (_, b) in enumerate(pairs):
        assert b is not None and float(b[0]) == float(i)
    # stem: first RGB triplet flipped, remaining channels untouched
    stem = shapes[prefix + keys[0]]
    np.testing.assert_array_equal(pairs[0][0][:, 0:3], stem[:, 0:3][:, ::-1])
    np.testing.assert_array_equal(pairs[0][0][:, 3:], stem[:, 3:])
    # non-stem layers pass through untouched
    np.testing.assert_array_equal(pairs[3][0], shapes[prefix + keys[3]])


def test_caffe_layers_into_params(rng):
    """End-to-end: caffemodel dump → layer-ordered assignment into a
    params tree (the reference's copy-by-module-order semantics)."""
    from tpureg.compat import assign_layer_ordered, caffe_layers

    params = {
        "c0": {"kernel": np.zeros((3, 3, 11, 6), np.float32),
               "bias": np.zeros((6,), np.float32)},
        "c1": {"kernel": np.zeros((3, 3, 4, 6), np.float32),
               "bias": np.zeros((6,), np.float32)},
    }
    keys, prefix, _, _ = __import__(
        "tpureg.compat", fromlist=["CAFFE_NETS"]).CAFFE_NETS["flownetfusion"]
    layers = {}
    for i, k in enumerate(keys):
        cin = 11 if i == 0 else 4
        layers[prefix + k] = [
            rng.standard_normal((6, cin, 3, 3)).astype(np.float32),
            rng.standard_normal((6,)).astype(np.float32),
        ]
    pairs = caffe_layers(encode_caffemodel(layers), "flownetfusion")
    new, report = assign_layer_ordered(params, pairs)
    # first two caffe layers landed, in order, transposed to HWIO
    np.testing.assert_allclose(
        new["c0"]["kernel"], pairs[0][0].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(new["c0"]["bias"], pairs[0][1])
    np.testing.assert_allclose(
        new["c1"]["kernel"], pairs[1][0].transpose(2, 3, 1, 0))
    assert any("c1" in line for line in report)


def test_conv_transpose_phase_form_matches_dilated(rng):
    """The full-res phase lowering == the input-dilated lowering.

    TorchConvTranspose switches to a stride-1 phase-conv + depth-to-space at
    outputs >= 256x256 (layers.py); both forms must compute identical math.
    """
    mod = TorchConvTranspose(3, 4, 2, 1, use_bias=True)
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 5)).astype(np.float32))
    variables = mod.init(KEY, x)
    got = mod.apply(variables, x)
    assert got.shape == (2, 256, 256, 3)

    k = variables["params"]["kernel"]
    b = variables["params"]["bias"]
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    # gradients flow through the phase-expanded kernel identically
    def loss_mod(v):
        return jnp.sum(mod.apply(v, x) ** 2)

    def loss_dilated(v):
        y = jax.lax.conv_general_dilated(
            x, v["params"]["kernel"], (1, 1), ((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + v["params"]["bias"]
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_mod)(variables)["params"]["kernel"]
    g2 = jax.grad(loss_dilated)(variables)["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-2, rtol=1e-4)
