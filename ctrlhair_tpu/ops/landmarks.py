# Facial landmark estimation without dlib.
#
# The reference depends on dlib's HOG detector + 68/81-point shape predictors
# (ref: external_code/landmarks_util.py:17-19) with binary model files that
# are not redistributable here.  TPU-native replacement strategy:
#   1. a parametric canonical 81-point template in FFHQ-aligned coordinates,
#   2. a similarity transform fitted from face-parsing region centroids
#      (eyes / nose / mouth from the BiSeNet label map) mapping the template
#      onto the actual face.
# This is fully batched array math (no host detector), is exact for
# FFHQ-aligned inputs, and degrades gracefully otherwise.  A learned landmark
# regressor can later drop in behind the same `estimate_landmarks_81` API.

from __future__ import annotations

import numpy as np

from ctrlhair_tpu.constants import PARSING_LABEL_LIST

_L_EYE = PARSING_LABEL_LIST.index('l_eye')
_R_EYE = PARSING_LABEL_LIST.index('r_eye')
_NOSE = PARSING_LABEL_LIST.index('nose')
_MOUTH_IDS = [PARSING_LABEL_LIST.index(n) for n in ('mouth', 'u_lip', 'l_lip')]


def canonical_template_81() -> np.ndarray:
    """81 landmarks in [0,1]^2 FFHQ-aligned coordinates (x right, y down).

    Index layout follows the dlib 68+13 convention: 0-16 jaw, 17-26 brows,
    27-35 nose, 36-47 eyes, 48-67 mouth, 68-80 forehead/hairline arc.
    """
    pts = np.zeros((81, 2), np.float64)
    # jaw: half-ellipse from left temple over the chin to the right temple
    t = np.linspace(np.pi, 2 * np.pi, 17)
    pts[0:17, 0] = 0.5 + 0.33 * np.cos(t)
    pts[0:17, 1] = 0.52 + 0.40 * np.sin(t - np.pi)
    # brows
    bx = np.linspace(-0.17, -0.04, 5)
    pts[17:22] = np.stack([0.5 + bx, 0.40 - 0.03 * np.cos(
        np.linspace(0, np.pi, 5))], 1)
    pts[22:27] = np.stack([0.5 - bx[::-1], 0.40 - 0.03 * np.cos(
        np.linspace(np.pi, 0, 5))], 1)
    # nose bridge + nostrils
    pts[27:31] = np.stack([np.full(4, 0.5),
                           np.linspace(0.45, 0.60, 4)], 1)
    nx = np.linspace(-0.05, 0.05, 5)
    pts[31:36] = np.stack([0.5 + nx, 0.645 - 0.012 * np.abs(nx) / 0.05], 1)
    # eyes (6 points each, left-clockwise)
    def eye(cx, cy, w=0.055, h=0.022):
        ang = np.array([180, 120, 60, 0, -60, -120]) * np.pi / 180
        return np.stack([cx + w * np.cos(ang), cy - h * np.sin(ang)], 1)
    pts[36:42] = eye(0.365, 0.465)
    pts[42:48] = eye(0.635, 0.465)
    # mouth: outer 12 left-clockwise, inner 8
    ang = np.linspace(np.pi, 3 * np.pi, 13)[:12]
    pts[48:60] = np.stack([0.5 + 0.10 * np.cos(ang),
                           0.76 + 0.045 * np.sin(ang)], 1)
    ang_i = np.linspace(np.pi, 3 * np.pi, 9)[:8]
    pts[60:68] = np.stack([0.5 + 0.06 * np.cos(ang_i),
                           0.76 + 0.022 * np.sin(ang_i)], 1)
    # forehead arc 68-80 (hairline), left to right
    t = np.linspace(np.pi * 0.95, np.pi * 0.05, 13)
    pts[68:81] = np.stack([0.5 + 0.36 * np.cos(t),
                           0.22 - 0.10 * np.sin(t)], 1)
    return pts.astype(np.float32)


_TEMPLATE = canonical_template_81()
# template anchor points used for the similarity fit
_TEMPLATE_ANCHORS = {
    'l_eye': _TEMPLATE[36:42].mean(0),
    'r_eye': _TEMPLATE[42:48].mean(0),
    'nose': _TEMPLATE[27:36].mean(0),
    'mouth': _TEMPLATE[48:68].mean(0),
}


def _region_centroid(label: np.ndarray, ids) -> np.ndarray | None:
    if np.isscalar(ids):
        ids = [ids]
    mask = np.isin(label, ids)
    if mask.sum() < 4:
        return None
    ys, xs = np.nonzero(mask)
    return np.array([xs.mean(), ys.mean()], np.float64) / label.shape[1]


def _fit_similarity(src: np.ndarray, dst: np.ndarray):
    """Least-squares similarity (scale+rot+shift) mapping src -> dst."""
    src_c = src - src.mean(0)
    dst_c = dst - dst.mean(0)
    num = (dst_c[:, 0] * src_c[:, 0] + dst_c[:, 1] * src_c[:, 1]).sum()
    num_r = (dst_c[:, 1] * src_c[:, 0] - dst_c[:, 0] * src_c[:, 1]).sum()
    den = (src_c ** 2).sum()
    if den < 1e-12:
        return 1.0, 0.0, dst.mean(0) - src.mean(0)
    a = num / den
    b = num_r / den
    rot = np.array([[a, -b], [b, a]])
    t = dst.mean(0) - src.mean(0) @ rot.T
    return rot, t


def estimate_landmarks_81(label_map: np.ndarray) -> np.ndarray:
    """[S, S] CelebA label map -> [81, 2] normalised landmarks in [0,1].

    Fits the canonical template through parsing-region centroids; identity
    placement if fewer than two anchor regions are visible.
    """
    anchors_src, anchors_dst = [], []
    for name, ids in (('l_eye', _L_EYE), ('r_eye', _R_EYE),
                      ('nose', _NOSE), ('mouth', _MOUTH_IDS)):
        c = _region_centroid(label_map, ids)
        if c is not None:
            anchors_src.append(_TEMPLATE_ANCHORS[name])
            anchors_dst.append(c)
    if len(anchors_src) < 2:
        return _TEMPLATE.copy()
    rot, t = _fit_similarity(np.asarray(anchors_src, np.float64),
                             np.asarray(anchors_dst, np.float64))
    out = _TEMPLATE.astype(np.float64) @ rot.T + t
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def estimate_landmarks_68(label_map: np.ndarray) -> np.ndarray:
    return estimate_landmarks_81(label_map)[:68]
