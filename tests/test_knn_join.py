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


class TestBuildLocalSetSmallMap:
    def test_cap_exceeding_map_capacity_clamps(self):
        """A map smaller than the configured local_set_cap (the
        pre-growth-watchdog start capacity) must clamp the set size
        instead of mis-slicing the [C]-row sort permutation (round-4
        regression: broadcast error at the long gauntlet's --cap 14)."""
        rng = np.random.RandomState(2)
        C = 1024  # map capacity, far below the requested cap
        positions = np.full((C + 1, 3), 1e9, np.float32)
        n = 700
        positions[:n] = rng.rand(n, 3).astype(np.float32) * 10
        positions[C] = 0.0
        mask = np.zeros(C, bool)
        mask[:n] = True
        ls = kj.build_local_set(jnp.asarray(positions), jnp.asarray(mask),
                                resolution=0.3, cap=1 << 17)
        assert ls.cap <= C
        assert ls.cap % kj.TL == 0
        assert int(ls.count) == n
        gidx = np.asarray(ls.gidx)
        assert gidx.shape[0] == ls.cap + 1
        # every selected row is a real masked map row; dump rows = C
        sel = gidx[gidx < C]
        assert len(np.unique(sel)) == min(n, ls.cap)
        assert mask[sel].all()

    def test_cap_clamp_rounds_up_not_down(self):
        """C >= TL but not a TL multiple, with more valid rows than
        (C//TL)*TL: a down-rounding clamp would silently drop valid rows
        and leave count > cap. The clamp must round UP and dump-pad."""
        rng = np.random.RandomState(5)
        C = kj.TL * 2 + 76            # 1100: not a tile multiple
        n = kj.TL * 2 + 66            # 1090 valid rows > (C//TL)*TL = 1024
        positions = np.full((C + 1, 3), 1e9, np.float32)
        positions[:n] = rng.rand(n, 3).astype(np.float32) * 10
        positions[C] = 0.0
        mask = np.zeros(C, bool)
        mask[:n] = True
        ls = kj.build_local_set(jnp.asarray(positions), jnp.asarray(mask),
                                resolution=0.3, cap=1 << 17)
        assert ls.cap % kj.TL == 0
        assert int(ls.count) == n
        assert int(ls.count) <= ls.cap          # the violated invariant
        gidx = np.asarray(ls.gidx)
        sel = gidx[gidx < C]
        assert len(np.unique(sel)) == n         # no valid row dropped
        assert mask[sel].all()
        assert (gidx[n:] == C).all()            # tail is dump-padded

    def test_map_smaller_than_one_tile(self):
        """C < TL: the TL-padded selection must dump-pad, not crash."""
        C = 200
        positions = np.full((C + 1, 3), 1e9, np.float32)
        positions[:64] = np.random.RandomState(3).rand(64, 3).astype(
            np.float32)
        positions[C] = 0.0
        mask = np.zeros(C, bool)
        mask[:64] = True
        ls = kj.build_local_set(jnp.asarray(positions), jnp.asarray(mask),
                                resolution=0.3, cap=4096)
        assert ls.cap == kj.TL
        assert int(ls.count) == 64
        pts = np.asarray(ls.pts)
        assert np.isfinite(pts[:64]).all()
        assert (np.asarray(ls.gidx)[64:] == C).all()
