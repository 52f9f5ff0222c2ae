"""PCK/L2 metric tests + rendering smoke tests."""

import numpy as np
import pytest

from a2m.eval import (compute_pck, compute_pck_np, l2_pose_error,
                      pose_blocks_to_keypoints)


def test_pck_perfect_prediction(rng):
    gt = rng.standard_normal((5, 2, 52)).astype(np.float32) * 100
    pck = np.asarray(compute_pck(gt, gt, alpha=0.2))
    np.testing.assert_array_equal(pck, np.ones(5, np.float32))


def test_pck_scales_with_alpha(rng):
    gt = rng.uniform(0, 100, (8, 2, 52)).astype(np.float32)
    pred = gt + rng.normal(0, 10, gt.shape).astype(np.float32)
    loose = np.asarray(compute_pck(pred, gt, alpha=0.5)).mean()
    tight = np.asarray(compute_pck(pred, gt, alpha=0.05)).mean()
    assert loose >= tight
    assert 0.0 <= tight <= loose <= 1.0


def test_pck_jax_matches_numpy(rng):
    gt = rng.uniform(0, 100, (8, 2, 52)).astype(np.float32)
    pred = gt + rng.normal(0, 5, gt.shape).astype(np.float32)
    a = np.asarray(compute_pck(pred, gt, alpha=0.2))
    b = compute_pck_np(pred, gt, alpha=0.2)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_pck_radius_semantics():
    # single keypoint spread: bbox 10x20 -> radius = alpha * 20
    gt = np.zeros((1, 2, 52), np.float32)
    gt[0, 0, :26] = 10.0   # width 10
    gt[0, 1, :13] = 20.0   # height 20
    pred = gt.copy()
    pred[0, :, 0] += 3.9   # dist ~5.5 > 0.2*20=4 -> miss
    pred[0, 1, 0] += 0.0
    pck = compute_pck_np(pred, gt, alpha=0.2)
    assert pck[0] == pytest.approx(51 / 52)


def test_l2_pose_error_flat_and_kp(rng):
    gt = rng.standard_normal((4, 8, 104)).astype(np.float32)
    pred = gt + 1.0
    flat = float(l2_pose_error(pred, gt))
    kp = float(l2_pose_error(pose_blocks_to_keypoints(pred).transpose(
        0, 1, 2, 3), pose_blocks_to_keypoints(gt)))
    # shifting x and y by 1 -> per-joint distance sqrt(2)
    assert flat == pytest.approx(np.sqrt(2), rel=1e-4)
    assert kp == pytest.approx(np.sqrt(2), rel=1e-4)


def test_render_frames(tmp_path, rng):
    from a2m.viz import render
    kp1 = rng.uniform(100, 400, (3, 2, 52))
    kp2 = rng.uniform(100, 400, (3, 2, 52))
    out = tmp_path / 'video.mp4'
    render.save_side_by_side_video(str(tmp_path / 'frames'), kp1, kp2,
                                   str(out), delete_tmp=False)
    frames = list((tmp_path / 'frames').glob('*.jpg'))
    assert len(frames) == 3
    # without ffmpeg a GIF is produced instead
    assert out.exists() or out.with_suffix('.gif').exists()


def test_display_transform():
    from a2m.viz.render import display_transform
    kp = np.ones((2, 52))
    out = display_transform(kp, scale=3.0, offset=(-1500.0, 0.0))
    assert out[0, 0] == pytest.approx(3.0 - 1500.0)
    assert out[1, 0] == pytest.approx(-3.0)


def test_conditioning_frames(tmp_path, rng):
    from a2m.viz import render
    kp_pred = rng.uniform(100, 400, (2, 2, 52))
    kp_gt = rng.uniform(100, 400, (4, 2, 52))  # 2 extra context frames
    render.save_side_by_side_video(str(tmp_path / 'f'), kp_pred, kp_gt,
                                   str(tmp_path / 'v.mp4'), delete_tmp=False)
    assert len(list((tmp_path / 'f').glob('*.jpg'))) == 4
