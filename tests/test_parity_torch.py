"""Forward-parity goldens vs the reference's ACTUAL PyTorch networks.

Round-1 parity evidence was self-referential (block-level checks plus an
import round-trip of our own trees). These tests close that gap (VERDICT r1
item 2): each CUDA-free reference net is built in CPU torch from
``/root/reference``, its ``state_dict()`` is imported through
``compat/torch_import.py``, and the forward outputs of the torch model and
the tpureg model are compared on the same random input, in BOTH train and
eval modes. This certifies simultaneously that (a) the architectures match
layer-for-layer, (b) checkpoint import covers every tensor with the right
layout transposes, and (c) numerics (LeakyReLU/BN/ConvTranspose semantics)
agree to ≤5e-4 abs / 1e-3 rel (pure fp32
accumulation-order noise across backends — see _assert_flows_match).

Covered nets (all runnable without CUDA ops):
- FlowNetS package net (FlowNetS/FlowNetS.py:10-93, pinard style)
- flownet2.networks.FlowNetS (6-ch cascade block, :15-94)
- flownet2.networks.FlowNetSD (:11-106)
- flownet2.networks.FlowNetFusion (:11-66)
- models.py local flowNetS (:58-153, full-resolution 7-flow decoder)

Skipped wholesale when /root/reference or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

REF = os.environ.get("TPUREG_REFERENCE_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

KEY = jax.random.key(0)


@pytest.fixture(autouse=True)
def _seed_torch_before_construction():
    """Torch models are constructed inside each test from the GLOBAL torch
    RNG; without this, the weight draw depends on which tests ran earlier in
    the process, and a marginal draw can push the fp32 accumulation-order
    delta (torch/MKL vs XLA:CPU) past the golden tolerance on some hosts
    (observed: 1/256 elements at 1.5e-4 after a VM migration). Seeding here
    pins the draw per-test regardless of suite order."""
    torch.manual_seed(7)


# ---------------------------------------------------------------------------
# reference-module loading helpers

def _with_ref_path(fn):
    sys.path.insert(0, REF)
    try:
        return fn()
    finally:
        sys.path.remove(REF)


@pytest.fixture(scope="module")
def ref_nets():
    def load():
        import FlowNetS.FlowNetS as pinard
        import flownet2.networks.FlowNetFusion as fusion
        import flownet2.networks.FlowNetS as nvidia
        import flownet2.networks.FlowNetSD as sd

        return {"pinard": pinard, "nvidia": nvidia, "sd": sd,
                "fusion": fusion}

    return _with_ref_path(load)


@pytest.fixture(scope="module")
def ref_models_py():
    """Load reference models.py with stubs for its unimportable imports
    (torchvision, RAFT, flownet2.models w/ CUDA packages, utils w/
    torchmetrics). Only the self-contained flowNetS class is used."""
    import importlib.util

    stub_names = [
        "torchvision", "torchvision.transforms",
        "RAFT", "RAFT.core", "RAFT.core.raft",
        "PWC", "PWC.models", "PWC.models.PWCNet",
        "flownet2.models", "utils",
    ]
    saved = {n: sys.modules.get(n) for n in stub_names}
    try:
        for n in stub_names:
            mod = types.ModuleType(n)
            sys.modules[n] = mod
        sys.modules["utils"].crop_like = lambda x, target: x
        sys.modules["utils"].grid_generator = None
        sys.modules["torchvision"].transforms = sys.modules[
            "torchvision.transforms"]

        def load():
            # flownet2 package must exist for 'flownet2.models' resolution
            import flownet2  # noqa: F401

            spec = importlib.util.spec_from_file_location(
                "tpureg_test_ref_models", os.path.join(REF, "models.py")
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod

        return _with_ref_path(load)
    finally:
        for n, prev in saved.items():
            if prev is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = prev


# ---------------------------------------------------------------------------
# comparison machinery

def _torch_sd_numpy(model):
    return {k: v.detach().cpu().numpy().copy()
            for k, v in model.state_dict().items()}


def _import_into(flax_model, sample_nhwc, sd):
    from tpureg.compat import import_torch_state_dict

    variables = flax_model.init(KEY, sample_nhwc, train=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    new_params, new_stats, report = import_torch_state_dict(sd, params, stats)
    assert not report["missing"], f"unmatched torch keys: {report['missing'][:8]}"
    assert not report["shape_mismatch"], report["shape_mismatch"][:8]
    return {"params": new_params, "batch_stats": new_stats}


def _flax_forward(flax_model, variables, x_nhwc, train):
    if train:
        out, _ = flax_model.apply(
            variables, x_nhwc, train=True, mutable=["batch_stats"]
        )
        return out
    return flax_model.apply(variables, x_nhwc, train=False)


def _assert_flows_match(torch_flows, flax_flows, atol=5e-4, what=""):
    # Tolerance: pure fp32 accumulation-order noise between torch/MKL and
    # XLA:CPU through 6+ conv+BN(train) layers measures up to ~2e-4 abs /
    # ~1e-3 rel at the coarsest flow scales (host-dependent; tightens to
    # <1e-4 on some CPUs). Any real architecture/import mismatch produces
    # O(1) deltas, so 5e-4/1e-3 keeps full discriminating power.
    torch_flows = (torch_flows if isinstance(torch_flows, (tuple, list))
                   else (torch_flows,))
    flax_flows = (flax_flows if isinstance(flax_flows, (tuple, list))
                  else (flax_flows,))
    assert len(torch_flows) == len(flax_flows), (
        f"{what}: {len(torch_flows)} torch flows vs {len(flax_flows)}"
    )
    for i, (t, f) in enumerate(zip(torch_flows, flax_flows)):
        t = t.detach().cpu().numpy()            # (B, 2, h, w)
        f = np.asarray(f).transpose(0, 3, 1, 2)  # NHWC → NCHW
        assert t.shape == f.shape, f"{what} flow{i}: {t.shape} vs {f.shape}"
        np.testing.assert_allclose(
            t, f, atol=atol, rtol=1e-3,
            err_msg=f"{what} flow index {i} (mode mismatch)",
        )


def _run_parity(torch_model, flax_model, in_ch, train, atol=5e-4,
                size=64, skip_torch_idx=(), skip_flax_idx=()):
    torch.manual_seed(0)
    torch_model = torch_model.train(train)
    x = np.random.default_rng(1).standard_normal(
        (2, in_ch, size, size)).astype(np.float32) * 0.5
    xt = torch.from_numpy(x)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))

    sd = _torch_sd_numpy(torch_model)
    variables = _import_into(flax_model, x_nhwc, sd)

    with torch.no_grad():
        t_out = torch_model(xt)
    f_out = _flax_forward(flax_model, variables, x_nhwc, train)
    t_out = [o for i, o in enumerate(
        t_out if isinstance(t_out, (tuple, list)) else (t_out,))
        if i not in skip_torch_idx]
    f_out = [o for i, o in enumerate(
        f_out if isinstance(f_out, (tuple, list)) else (f_out,))
        if i not in skip_flax_idx]
    _assert_flows_match(t_out, f_out, atol=atol,
                        what=type(torch_model).__name__)
    return variables


# ---------------------------------------------------------------------------
# the nets

@pytest.mark.parametrize("train", [True, False], ids=["train", "eval"])
def test_parity_flownets_pinard(ref_nets, train):
    """FlowNetS package net (FlowNetS/FlowNetS.py:10-93) — flows 2..6.

    flow0 (index 0) is excluded here because the reference hard-codes
    ``F.interpolate(flow2, size=(256,256))`` (FlowNetS.py:82) regardless of
    input size; its construction is checked at matching size in
    test_parity_pinard_flow0_upsample."""
    from tpureg.models import FlowNetS

    tm = ref_nets["pinard"].FlowNetS(batchNorm=True)
    fm = FlowNetS(style="pinard", use_bn=True)
    _run_parity(tm, fm, in_ch=2, train=train,
                skip_torch_idx=(0,), skip_flax_idx=(0,))


def test_parity_pinard_flow0_upsample(ref_nets):
    """Our flow0 equals torch's own bilinear upsample of the parity-checked
    flow2 at input size (the reference's op minus its hard-coded 256)."""
    import torch.nn.functional as F

    from tpureg.models import FlowNetS

    tm = ref_nets["pinard"].FlowNetS(batchNorm=True).eval()
    fm = FlowNetS(style="pinard", use_bn=True)
    x = np.random.default_rng(2).standard_normal(
        (1, 2, 64, 64)).astype(np.float32) * 0.5
    sd = _torch_sd_numpy(tm)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    variables = _import_into(fm, x_nhwc, sd)
    with torch.no_grad():
        _, t_flow2 = tm(torch.from_numpy(x))
        t_flow0 = F.interpolate(t_flow2, size=(64, 64), mode="bilinear")
    f_flow0, _ = _flax_forward(fm, variables, x_nhwc, train=False)
    np.testing.assert_allclose(
        t_flow0.numpy(), np.asarray(f_flow0).transpose(0, 3, 1, 2),
        atol=1e-4, rtol=1e-4,
    )


@pytest.mark.parametrize("train", [True, False], ids=["train", "eval"])
def test_parity_flownets_nvidia(ref_nets, train):
    """flownet2.networks.FlowNetS (6-ch S1/S2 cascade block, :15-94)."""
    from tpureg.models import FlowNetS

    tm = ref_nets["nvidia"].FlowNetS(None)
    fm = FlowNetS(input_channels=6, style="nvidia", use_bn=True)
    _run_parity(tm, fm, in_ch=6, train=train)


@pytest.mark.parametrize("train", [True, False], ids=["train", "eval"])
def test_parity_flownet_sd(ref_nets, train):
    """flownet2.networks.FlowNetSD (:11-106)."""
    from tpureg.models import FlowNetSD

    tm = ref_nets["sd"].FlowNetSD(None)
    fm = FlowNetSD()
    _run_parity(tm, fm, in_ch=2, train=train)


@pytest.mark.parametrize("train", [True, False], ids=["train", "eval"])
def test_parity_flownet_fusion(ref_nets, train):
    """flownet2.networks.FlowNetFusion (:11-66) — single full-res flow."""
    from tpureg.models import FlowNetFusion

    tm = ref_nets["fusion"].FlowNetFusion(None)
    fm = FlowNetFusion()
    _run_parity(tm, fm, in_ch=9, train=train)


@pytest.mark.parametrize("train", [True, False], ids=["train", "eval"])
def test_parity_local_flownets_full(ref_models_py, train):
    """models.py local flowNetS (:58-153): 7 flows to full resolution,
    batchNorm=False default."""
    from tpureg.models import FlowNetSFull

    tm = ref_models_py.flowNetS(batchNorm=False)
    fm = FlowNetSFull(use_bn=False)
    _run_parity(tm, fm, in_ch=2, train=train)
