"""Evaluation metrics: PCK and L2, on-device.

Parity target: `motion_evaluation.py:4-23` (52-keypoint PCK @ alpha) and the
legacy 48-kp variant (`pose_video/evaluation.py:4-21`).  The reference
defines PCK but never wires it into a harness (SURVEY.md §4); here it is a
jittable function used by the eval pipeline and benchmarks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pck_radius(gt: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """alpha * max(bbox height, bbox width) per sample.

    gt: (N, 2, K) keypoints (row 0 = x, row 1 = y).
    """
    width = jnp.abs(gt[:, 0].max(axis=-1) - gt[:, 0].min(axis=-1))
    height = jnp.abs(gt[:, 1].max(axis=-1) - gt[:, 1].min(axis=-1))
    return jnp.maximum(width, height) * alpha


@functools.partial(jax.jit, static_argnames=('alpha',))
def compute_pck(pred: jnp.ndarray, gt: jnp.ndarray, alpha: float = 0.2
                ) -> jnp.ndarray:
    """Fraction of keypoints within alpha * person-scale of ground truth.

    pred/gt: (N, 2, K).  Returns (N,) per-sample PCK
    (motion_evaluation.py:4-23 semantics, any K).
    """
    radius = pck_radius(gt, alpha)[:, None]
    dist = jnp.linalg.norm(gt - pred, axis=1)        # (N, K)
    return jnp.mean((dist <= radius).astype(jnp.float32), axis=1)


def compute_pck_np(pred: np.ndarray, gt: np.ndarray, alpha: float = 0.2
                   ) -> np.ndarray:
    """NumPy twin of :func:`compute_pck` for host-side analysis."""
    width = np.abs(gt[:, 0].max(axis=-1) - gt[:, 0].min(axis=-1))
    height = np.abs(gt[:, 1].max(axis=-1) - gt[:, 1].min(axis=-1))
    radius = (np.maximum(width, height) * alpha)[:, None]
    dist = np.linalg.norm(gt - pred, axis=1)
    return (dist <= radius).mean(axis=1)


@jax.jit
def l2_pose_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint L2 error.  pred/gt: (..., 2, K) keypoints or flat
    (..., 2K) block-layout vectors."""
    if pred.ndim < 2 or pred.shape[-2] != 2:
        k = pred.shape[-1] // 2
        pred = pred.reshape(*pred.shape[:-1], 2, k)
        gt = gt.reshape(*gt.shape[:-1], 2, k)
    return jnp.mean(jnp.linalg.norm(gt - pred, axis=-2))


def pose_blocks_to_keypoints(pose: np.ndarray) -> np.ndarray:
    """(..., 104) block layout -> (..., 2, 52) keypoint layout for PCK."""
    return np.asarray(pose).reshape(*pose.shape[:-1], 2, 52)
