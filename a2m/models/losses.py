"""Motion + kinematic losses, vectorized over precomputed index arrays.

Parity targets: `version5_model_train.py:208-248` (motion diff, smoothness,
jerk) and `real_motion_model.py:307-461` (bone-length and joint-angle
losses).

Layout discipline: every function interprets a 104-vector as the canonical
**block layout** ``[x0..x51, y0..y51]`` -> ``(..., 2, 52)``.  The reference is
internally inconsistent here (its losses view ``(B, T, 52, 2)`` while its
data path uses ``(B, T, 2, 52)``, SURVEY.md §2.1/§3.3); this module defines
the single layout all consumers share.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from a2m import constants


def pos_to_motion(pose: jnp.ndarray) -> jnp.ndarray:
    """First-order temporal difference (version5_model_train.py:208-213).
    (B, T, F) -> (B, T-1, F)."""
    return pose[:, 1:] - pose[:, :-1]


def safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with a finite (zero) gradient at ``x == 0``.

    d||x||/dx at the origin is NaN under autodiff; temporal differences of
    generated motion *do* hit exact zeros (especially when upstream compute
    is bf16 and quantizes nearby frames to identical values), which silently
    NaN-poisons the whole gradient.  Double-where keeps the primal exact and
    the cotangent zero at the origin.
    """
    sq = jnp.sum(jnp.square(x), axis=axis)
    is_zero = sq == 0
    return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))


def temporal_smoothness_loss(motion: jnp.ndarray) -> jnp.ndarray:
    """Mean L2 norm of acceleration (version5_model_train.py:216-230)."""
    accel = motion[:, 1:] - motion[:, :-1]
    return jnp.mean(safe_norm(accel, axis=-1))


def jerk_loss(motion: jnp.ndarray) -> jnp.ndarray:
    """Mean L2 norm of jerk (version5_model_train.py:233-248)."""
    accel = motion[:, 1:] - motion[:, :-1]
    jerk = accel[:, 1:] - accel[:, :-1]
    return jnp.mean(safe_norm(jerk, axis=-1))


def to_joints(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 104) block layout -> (..., 52, 2) joint positions."""
    p = pose.reshape(*pose.shape[:-1], 2, constants.NUM_JOINTS)
    return jnp.swapaxes(p, -1, -2)


@functools.lru_cache(maxsize=1)
def _bone_indices() -> tuple[np.ndarray, np.ndarray]:
    """(child, parent) index pairs within JOINT_SUBSET space, excluding roots
    (reference real_motion_model.py:325-339)."""
    parents = constants.subset_parents()
    child = np.nonzero(parents != -1)[0].astype(np.int32)
    parent = parents[child]
    return child, parent


def bone_lengths(pose: jnp.ndarray) -> jnp.ndarray:
    """Per-bone 2D lengths averaged over time.

    pose: (B, T, 104) -> (B, n_bones); subset joints only
    (real_motion_model.py:331-339).
    """
    child, parent = _bone_indices()
    joints = to_joints(pose)[..., constants.JOINT_SUBSET, :]  # (B,T,49,2)
    vec = joints[..., child, :] - joints[..., parent, :]
    lengths = safe_norm(vec, axis=-1)                         # (B, T, n_bones)
    return lengths.mean(axis=1)


def bone_length_loss(real_pose: jnp.ndarray, gen_pose: jnp.ndarray
                     ) -> jnp.ndarray:
    """MSE between generated and real time-averaged bone lengths
    (real_motion_model.py:307-347)."""
    return jnp.mean((bone_lengths(gen_pose) - bone_lengths(real_pose)) ** 2)


def _signed_angles(joints: jnp.ndarray, triples: np.ndarray) -> jnp.ndarray:
    """Signed 2D angle at j for each (parent, joint, child) triple.

    joints: (..., J, 2); triples: (n, 3) local indices.  atan2(cross, dot) of
    (j - p) x (c - j) (real_motion_model.py:367-379).
    """
    p, j, c = triples[:, 0], triples[:, 1], triples[:, 2]
    vec_pj = joints[..., j, :] - joints[..., p, :]
    vec_jc = joints[..., c, :] - joints[..., j, :]
    dot = jnp.sum(vec_pj * vec_jc, axis=-1)
    cross = (vec_pj[..., 0] * vec_jc[..., 1]
             - vec_pj[..., 1] * vec_jc[..., 0])
    # grad(atan2) divides by cross^2 + dot^2 — NaN when a limb degenerates
    # to a point (both vectors zero).  Substitute dot=1 there: angle 0,
    # gradient 0 (double-where), primal unchanged elsewhere.
    degen = (dot == 0) & (cross == 0)
    return jnp.where(degen, 0.0,
                     jnp.arctan2(cross, jnp.where(degen, 1.0, dot)))


def hand_joint_angle_loss(gen_pose: jnp.ndarray) -> jnp.ndarray:
    """ReLU range penalty on hand joint angles outside [0, pi]
    (real_motion_model.py:350-392)."""
    joints = to_joints(gen_pose)[..., 10:52, :]
    angles = _signed_angles(joints, constants.hand_triples())
    lower = jax.nn.relu(0.0 - angles)
    upper = jax.nn.relu(angles - jnp.pi)
    return jnp.mean(lower + upper)


def body_joint_angle_loss(gen_pose: jnp.ndarray) -> jnp.ndarray:
    """ReLU range penalty on body joint angles outside [-pi/2, pi]
    (real_motion_model.py:394-447)."""
    triples = constants.body_triples()
    if len(triples) == 0:
        return jnp.asarray(0.0, gen_pose.dtype)
    joints = to_joints(gen_pose)[..., :10, :]
    angles = _signed_angles(joints, triples)
    lower = jax.nn.relu(-jnp.pi / 2 - angles)
    upper = jax.nn.relu(angles - jnp.pi)
    return jnp.mean(lower + upper)


def comprehensive_angle_loss(gen_pose: jnp.ndarray) -> jnp.ndarray:
    """0.7 * hand + 0.3 * body (real_motion_model.py:449-461)."""
    return (0.7 * hand_joint_angle_loss(gen_pose)
            + 0.3 * body_joint_angle_loss(gen_pose))


def generator_internal_losses(gen_pose: jnp.ndarray,
                              real_pose: jnp.ndarray | None = None
                              ) -> list[jnp.ndarray]:
    """The generator's internal loss list: [bone (iff real given), angle]
    (real_motion_model.py:268-276)."""
    losses = []
    if real_pose is not None:
        losses.append(bone_length_loss(real_pose, gen_pose))
    losses.append(comprehensive_angle_loss(gen_pose))
    return losses


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def mse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def masked_mean(per_sample: jnp.ndarray, mask: jnp.ndarray | None
                ) -> jnp.ndarray:
    """Mean over the batch excluding padded rows (mask 0).  per_sample is
    (B, ...); each sample is first reduced to a scalar mean."""
    if mask is None:
        return per_sample.mean()
    flat = per_sample.reshape(per_sample.shape[0], -1).mean(axis=1)
    return (flat * mask).sum() / jnp.maximum(mask.sum(), 1e-8)
