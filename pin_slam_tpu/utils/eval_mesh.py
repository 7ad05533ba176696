"""Mesh quality evaluation: chamfer distances, precision/recall/F-score.

Rebuilds reference eval/eval_mesh_utils.py:8-125 (uniform mesh sampling +
truncated nearest-neighbor correspondences) with scipy's cKDTree replacing
Open3D's KD-tree.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from scipy.spatial import cKDTree


def sample_mesh_points(verts: np.ndarray, faces: np.ndarray,
                       n: int, seed: int = 0) -> np.ndarray:
    """Area-weighted uniform sampling of a triangle mesh."""
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    if area.sum() <= 0:
        return np.zeros((0, 3))
    rng = np.random.RandomState(seed)
    pick = rng.choice(faces.shape[0], n, p=area / area.sum())
    r1 = np.sqrt(rng.rand(n))
    r2 = rng.rand(n)
    a, b, c = tri[pick, 0], tri[pick, 1], tri[pick, 2]
    return (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b + \
        (r1 * r2)[:, None] * c


def nn_distances(src: np.ndarray, dst: np.ndarray,
                 truncation: float) -> np.ndarray:
    """Truncated nearest-neighbor distances src -> dst
    (reference: eval/eval_mesh_utils.py:94-125)."""
    tree = cKDTree(dst)
    d, _ = tree.query(src, k=1)
    return np.minimum(d, truncation)


def eval_mesh(
    pred_points: np.ndarray,
    gt_points: np.ndarray,
    threshold: float = 0.05,
    truncation_acc: float = 0.5,
    truncation_com: float = 0.5,
) -> Dict[str, float]:
    """Chamfer-L1/L2 [m] + precision/recall/F-score [%] at `threshold`
    (reference: eval/eval_mesh_utils.py:8-91)."""
    if pred_points.shape[0] == 0 or gt_points.shape[0] == 0:
        return {
            "MAE_accuracy (m)": float("inf"),
            "MAE_completeness (m)": float("inf"),
            "Chamfer_L1 (m)": float("inf"),
            "Chamfer_L2 (m)": float("inf"),
            "Precision [Accuracy] (%)": 0.0,
            "Recall [Completeness] (%)": 0.0,
            "F-score (%)": 0.0,
            "Spacing (m)": threshold,
        }
    acc = nn_distances(pred_points, gt_points, truncation_acc)
    com = nn_distances(gt_points, pred_points, truncation_com)
    precision = float((acc < threshold).mean() * 100.0)
    recall = float((com < threshold).mean() * 100.0)
    fscore = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0 else 0.0
    )
    chamfer_l1 = float(0.5 * (acc.mean() + com.mean()))
    chamfer_l2 = float(np.sqrt(0.5 * ((acc**2).mean() + (com**2).mean())))
    return {
        "MAE_accuracy (m)": float(acc.mean()),
        "MAE_completeness (m)": float(com.mean()),
        "Chamfer_L1 (m)": chamfer_l1,
        "Chamfer_L2 (m)": chamfer_l2,
        "Precision [Accuracy] (%)": precision,
        "Recall [Completeness] (%)": recall,
        "F-score (%)": fscore,
        "Spacing (m)": threshold,
    }
