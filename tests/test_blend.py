# Morphology vs cv2 and Poisson CG vs a direct sparse solve of the same
# system (assembled independently here from the documented row semantics).
import numpy as np
import pytest

import jax.numpy as jnp

from ctrlhair_tpu.ops.morphology import dilate, erode, ellipse_kernel
from ctrlhair_tpu.ops.poisson import poisson_blend


@pytest.mark.parametrize('k', [3, 5, 13, 19])
def test_ellipse_kernel_matches_cv2(k):
    cv2 = pytest.importorskip('cv2')
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    np.testing.assert_array_equal(ellipse_kernel(k), ref.astype(np.float32))


def test_dilate_erode_match_cv2(rng):
    cv2 = pytest.importorskip('cv2')
    mask = (rng.random((64, 64)) > 0.85).astype(np.uint8)
    # dense border-touching blob: exposes the erosion border semantics
    # (cv2 treats outside as foreground for erode, background for dilate)
    border_mask = np.zeros((64, 64), np.uint8)
    border_mask[:30, :40] = 1
    for m in (mask, border_mask):
        for k in (5, 13):
            kern = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
            ref_d = cv2.dilate(m, kern, iterations=1)
            got_d = np.asarray(dilate(jnp.asarray(m), k)).astype(np.uint8)
            np.testing.assert_array_equal(ref_d, got_d)
            ref_e = cv2.erode(m, kern, iterations=1)
            got_e = np.asarray(erode(jnp.asarray(m), k)).astype(np.uint8)
            np.testing.assert_array_equal(ref_e, got_e)


def _direct_solve(source, target, mask, with_gamma=True):
    """Independent dense assembly of the blending system for verification:
    interior mask==0 pixels are Dirichlet; every other row is the full
    5-point Laplacian; rhs is the Laplacian of source, overridden by
    target wherever mask==0."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    gamma = 2.2 if with_gamma else 1.0
    src = np.power(source.astype(float), 1 / gamma)
    tgt = np.power(target.astype(float), 1 / gamma)
    h, w = mask.shape
    n = h * w

    def idx(y, x):
        return y * w + x

    rows, cols, vals = [], [], []
    for y in range(h):
        for x in range(w):
            k = idx(y, x)
            dirichlet = (0 < y < h - 1 and 0 < x < w - 1 and mask[y, x] == 0)
            if dirichlet:
                rows.append(k); cols.append(k); vals.append(1.0)
            else:
                rows.append(k); cols.append(k); vals.append(4.0)
                if x > 0:
                    rows.append(k); cols.append(idx(y, x - 1)); vals.append(-1.0)
                if x < w - 1:
                    rows.append(k); cols.append(idx(y, x + 1)); vals.append(-1.0)
                if y > 0:
                    rows.append(k); cols.append(idx(y - 1, x)); vals.append(-1.0)
                if y < h - 1:
                    rows.append(k); cols.append(idx(y + 1, x)); vals.append(-1.0)
    a = sp.csc_matrix((vals, (rows, cols)), shape=(n, n))

    lap = sp.csc_matrix(
        ([4.0] * n, (range(n), range(n))), shape=(n, n)).tolil()
    for y in range(h):
        for x in range(w):
            k = idx(y, x)
            if x > 0:
                lap[k, idx(y, x - 1)] = -1
            if x < w - 1:
                lap[k, idx(y, x + 1)] = -1
            if y > 0:
                lap[k, idx(y - 1, x)] = -1
            if y < h - 1:
                lap[k, idx(y + 1, x)] = -1
    lap = lap.tocsc()

    res = np.empty_like(src)
    mflat = mask.flatten()
    for c in range(src.shape[2]):
        b = lap.dot(src[:, :, c].flatten())
        t = tgt[:, :, c].flatten()
        b[mflat == 0] = t[mflat == 0]
        res[:, :, c] = spla.spsolve(a, b).reshape(h, w)
    return np.clip(np.power(np.clip(res, 0, None), gamma), 0, 255)


def test_poisson_cg_matches_direct(rng):
    pytest.importorskip('scipy')
    h = w = 32
    source = rng.random((h, w, 3)) * 255
    target = rng.random((h, w, 3)) * 255
    mask = np.zeros((h, w), np.uint8)
    mask[8:24, 10:26] = 1
    ref = _direct_solve(source, target, mask)
    got = np.asarray(poisson_blend(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(mask),
        iterations=400))
    assert np.abs(ref - got).max() < 0.75, np.abs(ref - got).max()


def test_poisson_cg_converges_on_large_unknown_region(rng):
    """The production polarity (mask = 1 - dilated_hair) leaves MOST of the
    image unknown; the smooth far-field mode then converges slowly from a
    target start (regression: CG-200 at 256px was 15 uint8 off the exact
    spsolve until x0 was switched to the source — caught by the
    full-pipeline golden test)."""
    pytest.importorskip('scipy')
    h = w = 96
    source = rng.random((h, w, 3)) * 255
    target = rng.random((h, w, 3)) * 255
    mask = np.ones((h, w), np.uint8)          # unknown almost everywhere
    mask[30:66, 26:70] = 0                    # Dirichlet island (the "hair")
    ref = _direct_solve(source, target, mask)
    got = np.asarray(poisson_blend(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(mask),
        iterations=200))
    assert np.abs(ref - got).max() < 1.0, np.abs(ref - got).max()


def test_poisson_identity_outside_mask(rng):
    h = w = 24
    source = rng.random((h, w, 3)) * 255
    target = rng.random((h, w, 3)) * 255
    mask = np.zeros((h, w), np.uint8)
    mask[6:18, 6:18] = 1
    out = np.asarray(poisson_blend(
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(mask),
        iterations=200))
    # interior pixels outside the mask keep the target exactly
    keep = np.zeros((h, w), bool)
    keep[1:-1, 1:-1] = True
    keep &= mask == 0
    # f32 gamma encode/decode roundtrip costs ~2e-3 in [0,255] units
    np.testing.assert_allclose(out[keep], target[keep], atol=6e-3)


def test_multigrid_odd_halving_chain(rng):
    """Sizes whose halving chain hits an odd dim > min_size (68->34->17)
    must not crash the pyramid builder (regression: reshape error)."""
    from ctrlhair_tpu.ops.poisson import poisson_blend
    s = 68
    src = rng.uniform(0, 255, (s, s, 3)).astype(np.float32)
    tgt = rng.uniform(0, 255, (s, s, 3)).astype(np.float32)
    mask = np.zeros((s, s), np.float32)
    mask[10:50, 10:50] = 1.0
    out = np.asarray(poisson_blend(jnp.asarray(src), jnp.asarray(tgt),
                                   jnp.asarray(mask), method='mg'))
    assert out.shape == (s, s, 3) and np.isfinite(out).all()
