"""External-oracle goldens for the reimplemented eval metrics.

Round 1 checked ssim/MI only by invariance properties; these tests anchor
each reimplementation to an independent implementation (VERDICT r1 item 7):

- MI          vs sklearn.metrics.mutual_info_score — the torchmetrics
              function the reference calls (utils.py:52-55) wraps the same
              sklearn contingency formulation (natural log).
- CORR        vs scipy.stats.pearsonr (reference utils.py:58-59).
- Dice        vs sklearn.metrics.f1_score (F1 on binary masks == Dice).
- ssim        vs a brute-force per-window implementation of the Wang et al.
              formula with skimage's defaults (7×7 uniform window, sample
              covariance, border crop) — skimage itself is not installable
              in this environment, so the oracle is an independent
              computational path (explicit window loops, no uniform_filter),
              plus a committed golden value to freeze the numbers.
- Hausdorff   boundary extraction: the reference uses find_contours
              sub-pixel points cast to int (utils.py:155-170); ours uses
              4-neighbor boundary pixels. A marching-squares reimplementation
              of the reference's extraction quantifies the delta on a
              fixture (recorded in PARITY.md).
"""

import numpy as np
import pytest

from tpureg.metrics.image import CORR, MI, ssim
from tpureg.metrics.seg import (
    boundary_points,
    dice_coefficient,
    modified_hausdorff,
    seg_trans,
)

sklearn_metrics = pytest.importorskip("sklearn.metrics")


@pytest.fixture
def images(rng):
    a = rng.random((48, 48))
    # correlated second image: warped-ish intensity relation + noise
    b = np.clip(0.7 * a + 0.2 * rng.random((48, 48)), 0.0, 1.0)
    return a, b


def test_mi_matches_sklearn(images):
    a, b = images
    la = np.rint(a * 1500).astype(np.int64).ravel()
    lb = np.rint(b * 1500).astype(np.int64).ravel()
    want = sklearn_metrics.mutual_info_score(la, lb)
    got = MI(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_corr_matches_scipy(images):
    from scipy.stats import pearsonr

    a, b = images
    want = pearsonr(a.ravel(), b.ravel()).statistic
    np.testing.assert_allclose(CORR(a, b), want, rtol=1e-10)


def test_dice_matches_sklearn_f1(rng):
    seg1 = rng.integers(0, 4, (32, 32))
    seg2 = rng.integers(0, 4, (32, 32))
    for label in (1, 2, 3):
        m1 = seg_trans(seg1, label)
        m2 = seg_trans(seg2, label)
        want = sklearn_metrics.f1_score(m1.ravel(), m2.ravel())
        np.testing.assert_allclose(dice_coefficient(m1, m2), want, rtol=1e-12)


def _ssim_bruteforce(im1, im2, data_range=1.0, win=7):
    """Direct Wang et al. SSIM with skimage defaults: explicit window loops,
    sample (n-1) covariance, mean over valid (border-cropped) windows."""
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    h, w = im1.shape
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    n = win * win
    vals = []
    for i in range(h - win + 1):
        for j in range(w - win + 1):
            x = im1[i:i + win, j:j + win].ravel()
            y = im2[i:i + win, j:j + win].ravel()
            ux, uy = x.mean(), y.mean()
            vx = ((x - ux) ** 2).sum() / (n - 1)
            vy = ((y - uy) ** 2).sum() / (n - 1)
            vxy = ((x - ux) * (y - uy)).sum() / (n - 1)
            vals.append(
                ((2 * ux * uy + c1) * (2 * vxy + c2))
                / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
            )
    return float(np.mean(vals))


def test_ssim_matches_bruteforce(images):
    a, b = images
    want = _ssim_bruteforce(a, b)
    np.testing.assert_allclose(ssim(a, b), want, rtol=1e-9)


def test_ssim_golden_value():
    """Frozen golden on a deterministic fixture: catches silent numeric
    drift in either the filter path or its parameters."""
    rng = np.random.default_rng(1234)
    a = rng.random((32, 32))
    b = np.clip(a + 0.1 * rng.standard_normal((32, 32)), 0, 1)
    got = ssim(a, b)
    np.testing.assert_allclose(got, _ssim_bruteforce(a, b), rtol=1e-9)
    np.testing.assert_allclose(got, 0.9493458784093537, rtol=1e-7)


# ---------------------------------------------------------------------------
# marching-squares find_contours (metrics/contours.py): reference-exact
# boundary extraction (utils.py:155-170)

def test_find_contours_skimage_doctest_golden():
    """The published skimage.measure.find_contours doctest: a single corner
    pixel yields one open two-point contour."""
    from tpureg.metrics.contours import find_contours

    a = np.zeros((3, 3))
    a[0, 0] = 1
    (c,) = find_contours(a, 0.5)
    np.testing.assert_allclose(c, [[0.0, 0.5], [0.5, 0.0]])


def test_find_contours_closed_loop_duplicates_head():
    """An interior pixel produces one closed contour whose head point is
    repeated at the tail — the duplicate enters the reference's vstack and
    its Hausdorff means (utils.py:166-198)."""
    from tpureg.metrics.contours import extract_boundary_points, find_contours

    m = np.zeros((6, 6))
    m[2, 3] = 1
    (c,) = find_contours(m, 0.5)
    assert len(c) == 5 and np.array_equal(c[0], c[-1])
    pts = extract_boundary_points(m)
    assert pts.shape == (5, 2) and pts.dtype.kind == "i"


def test_find_contours_crossing_multiset_random_masks():
    """On random binary masks, the union of contour points equals the exact
    set of 0.5-level pixel-edge crossings; each contour repeats only its
    closure point; open contours end on the image border."""
    from tpureg.metrics.contours import find_contours

    rng = np.random.default_rng(7)
    for _ in range(10):
        m = (rng.random((13, 11)) > 0.6).astype(np.float64)
        got = set()
        for c in find_contours(m, 0.5):
            pts = [tuple(p) for p in c]
            if pts[0] == pts[-1]:
                pts = pts[:-1]
            else:  # open contour: both endpoints on the frame
                h, w = m.shape
                for p in (pts[0], pts[-1]):
                    assert (p[0] in (0.0, h - 1.0)) or (p[1] in (0.0, w - 1.0))
            assert len(set(pts)) == len(pts)
            got |= set(pts)
        want = {(r + 0.5, float(c_)) for r in range(m.shape[0] - 1)
                for c_ in range(m.shape[1])
                if (m[r, c_] > 0.5) != (m[r + 1, c_] > 0.5)}
        want |= {(float(r), c_ + 0.5) for r in range(m.shape[0])
                 for c_ in range(m.shape[1] - 1)
                 if (m[r, c_] > 0.5) != (m[r, c_ + 1] > 0.5)}
        assert got == want


def test_find_contours_subpixel_interpolation():
    """Non-binary values interpolate linearly along cell edges."""
    from tpureg.metrics.contours import find_contours

    a = np.zeros((3, 3))
    a[0, 0] = 0.8  # crossing at (0.5-0.8)/(0-0.8) = 0.375 along each edge
    (c,) = find_contours(a, 0.5)
    np.testing.assert_allclose(c, [[0.0, 0.375], [0.375, 0.0]])


def test_dist_hausdorff_uses_reference_extraction():
    """dist_hausdorff routes through the marching-squares extraction."""
    from tpureg.metrics.contours import extract_boundary_points
    from tpureg.metrics.seg import dist_hausdorff, modified_hausdorff, seg_trans

    rng = np.random.default_rng(3)
    s1 = rng.integers(0, 4, (40, 40)).astype(np.float64)
    s2 = rng.integers(0, 4, (40, 40)).astype(np.float64)
    want = np.mean([
        modified_hausdorff(extract_boundary_points(seg_trans(s1, i)),
                           extract_boundary_points(seg_trans(s2, i)))
        for i in (1, 2, 3)
    ])
    assert dist_hausdorff(s1, s2) == pytest.approx(float(want))


# ---------------------------------------------------------------------------
# legacy 4-neighbor extraction: delta vs the reference-exact contour points
# (metrics/contours.py is the single authoritative marching-squares impl)

def _blob_mask(h=48, w=48, cx=22.0, cy=25.0, r=11.0):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float64)


def test_hausdorff_boundary_extraction_delta():
    """Quantify the 4-neighbor vs find_contours-int boundary deviation on a
    realistic blob pair: the modified Hausdorff difference stays below one
    pixel (the sub-pixel contour is int-cast in the reference anyway).
    Measured value recorded in PARITY.md."""
    from tpureg.metrics.contours import extract_boundary_points

    m1 = _blob_mask()
    m2 = _blob_mask(cx=25.0, cy=23.5, r=10.0)

    ours = modified_hausdorff(boundary_points(m1), boundary_points(m2))
    ref = modified_hausdorff(
        extract_boundary_points(m1), extract_boundary_points(m2)
    )
    assert np.isfinite(ours) and np.isfinite(ref)
    assert abs(ours - ref) < 1.0, (ours, ref)


def test_boundary_points_vs_marching_squares_geometry():
    """Every 4-neighbor boundary pixel lies within 1 px (Chebyshev) of a
    contour-crossing point and vice versa — the two extractions trace the
    same curve."""
    from tpureg.metrics.contours import extract_boundary_points

    m = _blob_mask()
    a = boundary_points(m).astype(np.float64)
    b = np.unique(extract_boundary_points(m), axis=0).astype(np.float64)
    from scipy.spatial.distance import cdist

    d = cdist(a, b, metric="chebyshev")
    assert d.min(axis=1).max() <= 1.0
    assert d.min(axis=0).max() <= 1.0
