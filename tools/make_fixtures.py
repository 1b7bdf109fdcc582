"""Generate OASIS-format Analyze fixtures for hardware runs.

OASIS-1 itself has no egress path in this environment, so hardware
measurements that need the *real data pipeline* (Analyze decode → slice
assembly → elastic synthesis; reference dataset.py:30-97) and the
*real-pairs eval* (inference.py real_ds inter-subject pairs,
dataset.py:222-275) run on synthetic smooth-anatomy volumes written in the
reference's exact on-disk format: Analyze 7.5 ``<name>_mpr.hdr/.img``
int16 volumes of shape (176, 208, 176, 1) with FSL-FAST-style ``_seg``
label volumes (0=bg, 1..3 = tercile labels, utils.py:72-91 Dice semantics).

Anatomy model: a shared template anatomy (smooth low-frequency random
field) with per-subject smooth residual deformations + mild intensity gain
fields. This mirrors the actual structure of the reference's data: the
OASIS-1 ``_mpr`` PROCESSED volumes it consumes are T88 atlas-registered
(the fixed crop window (60,0,0)-(140,176,208) at reference dataset.py:56
presumes that registered space), so real inter-subject pairs start
well-aligned with smooth residual anatomical differences — NOT independent
anatomies. (Round-5 measurement: fixtures built from independent random
fields score identity Dice 0.25 on inter-subject pairs — a regime no
method in the reference's protocol operates in; the template model scores
an identity floor comparable to registered brain data.)

Usage:
    python tools/make_fixtures.py [out_dir=/tmp/oasis_fix] [n_subjects=8]
        [deform_vox=1.2] [gain=0.05]

Layout produced (matches cli/train.py + cli/inference.py flags):
    out/img/subNN_mpr.{hdr,img}     training volumes
    out/seg/subNN_seg.{hdr,img}
    out/fiximg out/fixseg out/movimg out/movseg   real_ds split (first
        half of subjects = fixed, second half = moving)
"""

import os
import struct
import sys

import numpy as np

SHAPE = (176, 208, 176)  # OASIS-1 processed volume shape (dataset.py:56 crop
#                          window (60,0,0)-(140,176,208) presumes these dims)


def write_analyze(path_base, vol, datatype=4):
    """Minimal little-endian Analyze 7.5 pair (.hdr/.img) — same wire format
    tests/test_data.py::write_analyze round-trips against the native reader."""
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


def smooth_field(rng, shape, coarse=8):
    """Smooth low-frequency random field in [0, 1] at full resolution."""
    cshape = tuple(max(2, s // coarse) for s in shape)
    field = rng.standard_normal(cshape).astype(np.float32)
    # separable linear upsample to full res
    for ax, (cs, fs) in enumerate(zip(cshape, shape)):
        idx = np.linspace(0, cs - 1, fs)
        lo = np.floor(idx).astype(np.int64)
        hi = np.minimum(lo + 1, cs - 1)
        t = (idx - lo).astype(np.float32)
        sl_lo = np.take(field, lo, axis=ax)
        sl_hi = np.take(field, hi, axis=ax)
        tshape = [1, 1, 1]
        tshape[ax] = fs
        field = sl_lo + (sl_hi - sl_lo) * t.reshape(tshape[: field.ndim])
    field -= field.min()
    field /= max(field.max(), 1e-6)
    return field


def head_mask(shape):
    """Skull-like ellipsoid so slices have background like real MRI (the
    atlas-registered OASIS head occupies the same region in every volume)."""
    zz, yy, xx = np.meshgrid(
        *(np.linspace(-1, 1, s) for s in shape), indexing="ij")
    return (zz ** 2 / 0.9 + yy ** 2 / 0.95 + xx ** 2 / 0.9) < 1.0


def subject_volume(rng, template, mask, q, deform_vox=1.2, gain=0.05,
                   coarse=22):
    """One subject = template anatomy under a smooth residual deformation
    plus a mild multiplicative intensity gain field.

    ``deform_vox`` is the std of the per-axis displacement (voxels) of a
    low-frequency field — the residual inter-subject misalignment left
    after atlas registration. ``q`` are the TEMPLATE's tercile thresholds,
    applied to the deformed field so segmentation labels are consistent
    tissue classes across subjects.
    """
    from scipy.ndimage import map_coordinates

    shape = template.shape
    disp = np.stack(
        [smooth_field(rng, shape, coarse) * 2.0 - 1.0 for _ in range(3)])
    # per-component unit std, then deform_vox voxels of std displacement
    disp = disp / np.maximum(disp.std(axis=(1, 2, 3), keepdims=True), 1e-6)
    disp = disp * deform_vox
    coords = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]].astype(np.float32)
    sample = coords + disp.astype(np.float32)
    field = map_coordinates(template, sample, order=1, mode="nearest")
    g = 1.0 + gain * (smooth_field(rng, shape, coarse=44) * 2.0 - 1.0)
    img = (field * g * mask * 1000).astype(np.int16)
    seg = np.zeros(shape, np.int16)
    seg[mask] = (
        (field[mask] > q[0]).astype(np.int16)
        + (field[mask] > q[1]).astype(np.int16)
        + (field[mask] > q[2]).astype(np.int16)
    )
    return img[..., None], seg[..., None]


def main(out="/tmp/oasis_fix", n=8, deform_vox=1.2, gain=0.05):
    rng = np.random.default_rng(42)
    dirs = {d: os.path.join(out, d)
            for d in ("img", "seg", "fiximg", "fixseg", "movimg", "movseg")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    template = smooth_field(rng, SHAPE)
    mask = head_mask(SHAPE)
    q = np.quantile(template[mask], [0.25, 0.5, 0.75])
    half = n // 2
    for i in range(n):
        img, seg = subject_volume(rng, template, mask, q,
                                  deform_vox=deform_vox, gain=gain)
        write_analyze(os.path.join(dirs["img"], f"sub{i:02d}_mpr"), img)
        write_analyze(os.path.join(dirs["seg"], f"sub{i:02d}_seg"), seg)
        role = ("fix", "mov")[i >= half]
        write_analyze(os.path.join(dirs[f"{role}img"], f"sub{i:02d}_mpr"), img)
        write_analyze(os.path.join(dirs[f"{role}seg"], f"sub{i:02d}_seg"), seg)
        print(f"subject {i}: wrote img+seg ({role} split)")
    print(f"fixtures at {out}: {n} volumes {SHAPE}, "
          f"deform {deform_vox} vox, gain ±{gain:.0%}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/oasis_fix",
         int(sys.argv[2]) if len(sys.argv) > 2 else 8,
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.2,
         float(sys.argv[4]) if len(sys.argv) > 4 else 0.05)
