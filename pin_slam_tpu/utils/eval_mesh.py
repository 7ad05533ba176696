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


def crop_points_to_region(
    pts: np.ndarray, region_pts: np.ndarray,
    voxel: float = 0.5, margin: int = 1,
) -> np.ndarray:
    """Keep `pts` whose voxel lies within `margin` voxels of any
    `region_pts` voxel — the evaluation analog of the reference's
    intersection cropping (reference: eval/eval_mesh_utils.py:164-201):
    predicted surface in regions the sensor never observed must not count
    as spurious geometry."""
    occ = np.unique(np.floor(region_pts / voxel).astype(np.int64), axis=0)
    if margin > 0:
        offs = np.stack(np.meshgrid(*([np.arange(-margin, margin + 1)] * 3),
                                    indexing="ij"), -1).reshape(-1, 3)
        occ = np.unique((occ[:, None, :] + offs[None]).reshape(-1, 3),
                        axis=0)
    occ_v = np.ascontiguousarray(occ).view(
        np.dtype((np.void, occ.dtype.itemsize * 3))).ravel()
    g = np.ascontiguousarray(
        np.floor(pts / voxel).astype(np.int64)).view(
        np.dtype((np.void, 8 * 3))).ravel()
    keep = np.isin(g, occ_v)
    return pts[keep]


def eval_mesh(
    pred_points: np.ndarray,
    gt_points: np.ndarray,
    threshold: float = 0.05,
    truncation_acc: float = 0.5,
    truncation_com: float = 0.5,
    crop_pred_to_gt: bool = False,
    crop_voxel: float = 0.5,
) -> Dict[str, float]:
    """Chamfer-L1/L2 [m] + precision/recall/F-score [%] at `threshold`
    (reference: eval/eval_mesh_utils.py:8-91). With crop_pred_to_gt the
    predicted samples are first restricted to the GT-observed region
    (reference intersection-crop protocol, :164-201)."""
    if crop_pred_to_gt and pred_points.shape[0] and gt_points.shape[0]:
        pred_points = crop_points_to_region(pred_points, gt_points,
                                            voxel=crop_voxel)
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
