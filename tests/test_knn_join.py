"""Direct tests of the tiled spatial-join k-NN kernel (interpret mode on
CPU) against brute force, including the dense-map case where the pair
budget must degrade gracefully (global nearest-first allocation) instead
of leaving query tiles without any pairs."""

import numpy as np
import jax.numpy as jnp

from pin_slam_tpu.ops import knn_join as kj


def _brute(q, p, k, max_d2):
    d2 = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    d2 = np.where(d2 <= max_d2, d2, np.inf)
    idx = np.argsort(d2, axis=1)[:, :k]
    dd = np.take_along_axis(d2, idx, axis=1)
    return np.where(np.isfinite(dd), idx, -1), dd


def _run(q, lpts, k=6, max_d2=1.44, res=0.4):
    L = lpts.shape[0]
    valid = np.ones(L, bool)
    si = np.asarray(kj._sort_by_morton(
        jnp.asarray(lpts), jnp.asarray(valid), res * 4.0))
    srt = lpts[si]
    npad = (-q.shape[0]) % kj.TQ
    qp = np.concatenate([q, np.full((npad, 3), 1e9, np.float32)])
    lpad = (-L) % kj.TL
    sp = np.concatenate([srt, np.full((lpad, 3), 1e9, np.float32)])
    idx, d2, cnt = kj.knn_join(jnp.asarray(qp), jnp.asarray(sp), k=k,
                               max_dist2=max_d2, resolution=res)
    idx = np.asarray(idx)[: q.shape[0]]
    d2 = np.asarray(d2)[: q.shape[0]]
    # local sorted index -> original lpts row
    mapped = np.where(idx >= 0, si[np.clip(idx, 0, L - 1)], -1)
    return mapped, d2, np.asarray(cnt)[: q.shape[0]]


class TestKnnJoin:
    def test_matches_brute_force_random(self):
        rng = np.random.RandomState(0)
        p = (rng.rand(4096, 3).astype(np.float32) * 20 - 10)
        q = p[rng.randint(0, len(p), 512)] + \
            rng.randn(512, 3).astype(np.float32) * 0.2
        idx, d2, cnt = _run(q, p)
        bidx, bd2 = _brute(q, p, 6, 1.44)
        # nearest neighbor always found exactly
        assert (idx[:, 0] == bidx[:, 0]).mean() > 0.999
        found = bd2[:, 0] < np.inf
        np.testing.assert_allclose(d2[found, 0], bd2[found, 0], rtol=1e-4)

    def test_dense_map_budget_degrades_gracefully(self):
        """A dense uniform sheet once exhausted the greedy per-row pair
        budget and left later query tiles with NO pairs (uninitialized
        outputs / zero neighbors). Global nearest-first allocation must
        keep at least the nearest tile per query."""
        rng = np.random.RandomState(1)
        L = 16384
        p = np.zeros((L, 3), np.float32)
        p[:, :2] = rng.rand(L, 2) * 60 - 30
        p[:, 2] = 0.2 * np.sin(p[:, 0])
        q = p[rng.randint(0, L, 1024)] + \
            rng.randn(1024, 3).astype(np.float32) * 0.05
        idx, d2, cnt = _run(q, p)
        # every query sits ~5 cm from a local point: ALL must find one
        assert (idx[:, 0] >= 0).all()
        # and the found nearest must be genuinely close
        assert float(np.sqrt(d2[:, 0]).max()) < 0.5
