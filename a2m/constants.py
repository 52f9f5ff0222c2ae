"""Canonical skeleton + audio constants for the PATS audio-to-motion stack.

This is the single source of truth the reference lacks: skeleton topology is
scattered across `pats/data_loading/skeleton.py:93-148`, audio constants
across `pats/data_loading/audio.py:174-180` and `pose_video/consts.py:13-21`
in the reference tree.  Everything downstream (models, losses, metrics,
rendering) imports from here.

Pose layout (canonical, block layout):
    A pose frame is a 104-vector ``[x_0..x_51, y_0..y_51]`` which reshapes to
    ``(2, 52)``.  Joint 0 (Neck) is the root used for neck-subtraction
    normalization.  The reference is internally inconsistent about this
    (its losses view `(B,T,52,2)` while its data/normalizer use `(B,T,2,52)`,
    see `real_motion_model.py:319` vs `normalization_tools.py:31`); we fix the
    block layout everywhere.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Skeleton topology (reference: pats/data_loading/skeleton.py:93-148)
# ---------------------------------------------------------------------------

NUM_JOINTS = 52
POSE_FEATS = 2 * NUM_JOINTS  # 104

#: parent index per joint; -1 == root (Neck).
PARENTS: tuple[int, ...] = (
    -1,
    0, 1, 2,
    0, 4, 5,
    0, 7, 7,
    6,
    10, 11, 12, 13,
    10, 15, 16, 17,
    10, 19, 20, 21,
    10, 23, 24, 25,
    10, 27, 28, 29,
    3,
    31, 32, 33, 34,
    31, 36, 37, 38,
    31, 40, 41, 42,
    31, 44, 45, 46,
    31, 48, 49, 50,
)

JOINT_NAMES: tuple[str, ...] = (
    'Neck',
    'RShoulder', 'RElbow', 'RWrist',
    'LShoulder', 'LElbow', 'LWrist',
    'Nose', 'REye', 'LEye',
    'LHandRoot',
    'LHandThumb1', 'LHandThumb2', 'LHandThumb3', 'LHandThumb4',
    'LHandIndex1', 'LHandIndex2', 'LHandIndex3', 'LHandIndex4',
    'LHandMiddle1', 'LHandMiddle2', 'LHandMiddle3', 'LHandMiddle4',
    'LHandRing1', 'LHandRing2', 'LHandRing3', 'LHandRing4',
    'LHandLittle1', 'LHandLittle2', 'LHandLittle3', 'LHandLittle4',
    'RHandRoot',
    'RHandThumb1', 'RHandThumb2', 'RHandThumb3', 'RHandThumb4',
    'RHandIndex1', 'RHandIndex2', 'RHandIndex3', 'RHandIndex4',
    'RHandMiddle1', 'RHandMiddle2', 'RHandMiddle3', 'RHandMiddle4',
    'RHandRing1', 'RHandRing2', 'RHandRing3', 'RHandRing4',
    'RHandLittle1', 'RHandLittle2', 'RHandLittle3', 'RHandLittle4',
)

ROOT_JOINT = 0  # Neck

#: Joints relevant for losses/metrics: drop Nose(7)/REye(8)/LEye(9)
#: (reference skeleton.py:122-124).
JOINT_SUBSET: np.ndarray = np.r_[range(7), range(10, NUM_JOINTS)]

NUM_BODY_JOINTS = 10   # Neck..LEye (reference real_motion_model.py:33)
NUM_HAND_JOINTS = 42   # LHandRoot..RHandLittle4

BODY_FEATS = 20        # 10 joints x 2 coords (generator body head width)
HAND_FEATS = 84        # 42 joints x 2 coords


def body_parents() -> list[int]:
    """Body subgraph parents, clamped to -1 outside the first 10 joints
    (reference real_motion_model.py:43-44)."""
    return [p if p < NUM_BODY_JOINTS else -1 for p in PARENTS[:NUM_BODY_JOINTS]]


def hand_parents() -> list[int]:
    """Hand subgraph parents re-indexed by -10; roots (wrist-attached) -> -1
    (reference real_motion_model.py:53-54)."""
    return [p - 10 if p >= 10 else -1 for p in PARENTS[10:10 + NUM_HAND_JOINTS]]


def _edges_from_parents(parents: list[int]) -> np.ndarray:
    """Bidirectional (child<->parent) edge list, shape (E, 2) of (src, dst).

    Edge order matches the reference construction (parent->child then
    child->parent per joint, reference real_motion_model.py:46-49) though the
    dense formulation below is order-invariant.
    """
    edges = []
    for i, par in enumerate(parents):
        if par != -1:
            edges.append((par, i))
            edges.append((i, par))
    return np.asarray(edges, dtype=np.int32).reshape(-1, 2)


def body_edges() -> np.ndarray:
    return _edges_from_parents(body_parents())


def hand_edges() -> np.ndarray:
    return _edges_from_parents(hand_parents())


def adjacency_from_edges(edges: np.ndarray, num_nodes: int,
                         self_loops: bool = False) -> np.ndarray:
    """Dense adjacency A[dst, src] = 1 for each directed edge (src, dst).

    The dense-GCN formulation replaces torch_geometric scatter ops: message
    aggregation at node i over incoming edges becomes a row of ``A @ X``.
    """
    adj = np.zeros((num_nodes, num_nodes), dtype=np.float32)
    for src, dst in edges:
        adj[dst, src] = 1.0
    if self_loops:
        adj = np.maximum(adj, np.eye(num_nodes, dtype=np.float32))
    return adj


def _triples_from_parents(parents: list[int]) -> list[tuple[int, int, int]]:
    """(parent, joint, first-child) triples for joint-angle losses.

    Mirrors the reference derivation (real_motion_model.py:280-304): for each
    joint with a parent, find the first higher-indexed child.
    """
    triples = []
    n = len(parents)
    for i in range(n):
        par = parents[i]
        if par == -1:
            continue
        for j in range(i + 1, n):
            if parents[j] == i:
                triples.append((par, i, j))
                break
    return triples


def hand_triples() -> np.ndarray:
    t = _triples_from_parents(hand_parents())
    return np.asarray(t, dtype=np.int32).reshape(-1, 3)


def body_triples() -> np.ndarray:
    t = _triples_from_parents(body_parents())
    return np.asarray(t, dtype=np.int32).reshape(-1, 3)


def subset_parents() -> np.ndarray:
    """Parents re-indexed into JOINT_SUBSET space for the bone-length loss
    (reference real_motion_model.py:325-328).  -1 where the parent is either
    the root or excluded from the subset."""
    subset = list(JOINT_SUBSET)
    pos = {j: k for k, j in enumerate(subset)}
    out = []
    for j in subset:
        p = PARENTS[j]
        out.append(pos.get(p, -1) if p != -1 else -1)
    return np.asarray(out, dtype=np.int32)


# ---------------------------------------------------------------------------
# Audio constants (reference: audio.py:174-180, pose_video/consts.py:13-21)
# ---------------------------------------------------------------------------

POSE_FPS = 15                  # skeleton sampling rate (Hz)
WINDOW_SECONDS = 4.3           # training window length
FRAMES_PER_WINDOW = int(WINDOW_SECONDS * POSE_FPS)  # 64

#: feature-rate map per audio preprocessing method; note the reference's
#: deliberate int() truncations (audio.py:177-179).
AUDIO_FS_MAP = {
    'log_mel_512': int(45.6 * 1000 / 512),   # 89 Hz
    'log_mel_400': int(16.52 * 1000 / 160),  # 103 Hz
    'silence': 15,
}

# librosa-compatible log_mel_512 spec (reference audio.py:58-75)
LOG_MEL_512 = dict(n_fft=2048, hop_length=512, n_mels=128, power=2.0,
                   fmin=0.0, fmax=None, eps=1e-10, center=True)

# log_mel_400 spec (reference audio.py:86-120): resample to 16 kHz first
LOG_MEL_400 = dict(sr=16000, n_fft=512, hop_length=160, win_length=400,
                   n_mels=64, power=1.0, fmin=125.0, fmax=7500.0,
                   eps=1e-6, center=False)

# VGGish-style frontend (reference pose_video/mel_features.py:192-223,
# audio_repr.py:18-26)
VGGISH = dict(sr=16000, window_secs=0.025, hop_secs=0.010, n_mels=64,
              fmin=125.0, fmax=7500.0, log_offset=0.01)

AUDIO_SR = 16000
MEL_FEATS_512 = 128   # audio/log_mel_512 feature width
MEL_FEATS_400 = 64
