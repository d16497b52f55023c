"""Distribution metrics: Fréchet distance (FVD/FAD) and polynomial-kernel
MMD (KVD).

Re-design of the reference metric math (`evaluations/fvd/fvd.py:47-106` and
`mm_diffusion/evaluator.py:21-37`):

* Fréchet distance uses the TF-GAN formulation (trace-sqrt-product of the
  covariances); the symmetric PSD matrix square root is computed by
  eigendecomposition (numerically equivalent to the reference's SVD route
  for symmetric matrices, and stabler under float32).
* KVD is the unbiased polynomial-kernel MMD with sklearn's defaults
  (degree 3, gamma = 1/d, coef0 = 1), matching
  ``sklearn.metrics.pairwise.polynomial_kernel`` as used at evaluator.py:21-37.
"""

from __future__ import annotations

import numpy as np


def _sym_sqrt(mat: np.ndarray, eps: float = 1e-10) -> np.ndarray:
    """Square root of a symmetric PSD matrix (parity: fvd.py:48-52)."""
    mat = np.asarray(mat, np.float64)
    mat = (mat + mat.T) / 2.0
    w, v = np.linalg.eigh(mat)
    # parity with the reference's torch.where(s < eps, s, sqrt(s)) guard
    w = np.where(w < eps, np.maximum(w, 0.0), np.sqrt(np.maximum(w, 0.0)))
    # note: for w < eps the reference keeps the raw singular value; we clamp
    # tiny negatives from eigh to zero, which is strictly more correct.
    return (v * w) @ v.T


def trace_sqrt_product(sigma: np.ndarray, sigma_v: np.ndarray) -> float:
    """(parity: fvd.py:55-58)"""
    sqrt_sigma = _sym_sqrt(sigma)
    return float(np.trace(_sym_sqrt(sqrt_sigma @ sigma_v @ sqrt_sigma)))


def frechet_distance(x1: np.ndarray, x2: np.ndarray) -> float:
    """Fréchet distance between two embedding sets [N, D]
    (parity: frechet_distance, fvd.py:94-106)."""
    x1 = np.asarray(x1, np.float64).reshape(x1.shape[0], -1)
    x2 = np.asarray(x2, np.float64).reshape(x2.shape[0], -1)
    m1, m2 = x1.mean(0), x2.mean(0)
    s1 = np.cov(x1, rowvar=False)
    s2 = np.cov(x2, rowvar=False)
    trace = float(np.trace(s1 + s2)) - 2.0 * trace_sqrt_product(s1, s2)
    return float(np.sum((m1 - m2) ** 2) + trace)


def polynomial_kernel(x: np.ndarray, y: np.ndarray = None, degree: int = 3,
                      gamma: float = None, coef0: float = 1.0) -> np.ndarray:
    """sklearn-default polynomial kernel (evaluator.py uses the defaults)."""
    y = x if y is None else y
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def polynomial_mmd(x: np.ndarray, y: np.ndarray) -> float:
    """Unbiased polynomial-kernel MMD (parity: evaluator.py:21-37)."""
    x = np.asarray(x, np.float64).reshape(x.shape[0], -1)
    y = np.asarray(y, np.float64).reshape(y.shape[0], -1)
    m, n = x.shape[0], y.shape[0]
    k_xx = polynomial_kernel(x)
    k_yy = polynomial_kernel(y)
    k_xy = polynomial_kernel(x, y)
    s_xx = (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
    s_yy = (k_yy.sum() - np.trace(k_yy)) / (n * (n - 1))
    s_xy = k_xy.sum() / (m * n)
    return float(s_xx + s_yy - 2 * s_xy)


def preprocess_videos_for_i3d(videos_uint8: np.ndarray, resolution: int = 224) -> np.ndarray:
    """uint8 [B,T,H,W,C] -> float [-1,1] [B,T,res,res,C] (channels-last;
    parity with preprocess, fvd.py:5-40: scale shorter side, center crop)."""
    import cv2

    b, t, h, w, c = videos_uint8.shape
    scale = resolution / min(h, w)
    if h < w:
        nh, nw = resolution, int(np.ceil(w * scale))
    else:
        nh, nw = int(np.ceil(h * scale)), resolution
    out = np.empty((b, t, resolution, resolution, c), np.float32)
    y0 = (nh - resolution) // 2
    x0 = (nw - resolution) // 2
    for i in range(b):
        for j in range(t):
            fr = cv2.resize(
                videos_uint8[i, j], (nw, nh), interpolation=cv2.INTER_LINEAR
            ).astype(np.float32) / 255.0
            out[i, j] = fr[y0 : y0 + resolution, x0 : x0 + resolution]
    return (out - 0.5) * 2.0


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray, block: int = 2048) -> np.ndarray:
    """Blocked squared euclidean distances [Na, Nb] in float64."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    out = np.empty((a.shape[0], b.shape[0]), np.float64)
    b_sq = (b * b).sum(-1)
    for i in range(0, a.shape[0], block):
        chunk = a[i : i + block]
        d = (chunk * chunk).sum(-1)[:, None] + b_sq[None, :] - 2.0 * chunk @ b.T
        out[i : i + block] = np.maximum(d, 0.0)
    return out


def manifold_radii(features: np.ndarray, k: int = 3) -> np.ndarray:
    """Squared distance from each point to its k-th nearest OTHER point in
    the same set — the manifold hypersphere radii of improved
    precision/recall (parity: ManifoldEstimator.manifold_radii,
    evaluations/compute_image_is.py:249-282 with nhood_size=3)."""
    d = _pairwise_sq_dists(features, features)
    np.fill_diagonal(d, np.inf)
    # k-th smallest excluding self
    return np.partition(d, k - 1, axis=1)[:, k - 1]


def precision_recall(
    ref_features: np.ndarray, sample_features: np.ndarray, k: int = 3
) -> tuple:
    """Improved precision & recall (Kynkaanniemi et al. 2019) over arbitrary
    embedding spaces (parity: Evaluator.compute_prec_recall,
    evaluations/compute_image_is.py:195-204).

    precision = fraction of samples inside ANY ref manifold hypersphere;
    recall    = fraction of refs inside ANY sample manifold hypersphere.
    """
    ref = np.asarray(ref_features, np.float64).reshape(ref_features.shape[0], -1)
    sam = np.asarray(sample_features, np.float64).reshape(sample_features.shape[0], -1)
    r_ref = manifold_radii(ref, k)
    r_sam = manifold_radii(sam, k)
    d = _pairwise_sq_dists(sam, ref)  # [Ns, Nr]
    precision = float(np.mean((d <= r_ref[None, :]).any(axis=1)))
    recall = float(np.mean((d.T <= r_sam[None, :]).any(axis=1)))
    return precision, recall
