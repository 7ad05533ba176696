"""Join-kernel tuning: overflow fix + merge-skip + layout variants."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pin_slam_tpu.ops import knn_join as kj

print("devices:", jax.devices())
REPS = 10
BIG = 9e3


def timeit_carry(name, body, init, *args, reps=REPS):
    @jax.jit
    def run(carry, *a):
        return jax.lax.fori_loop(
            0, reps, lambda it, c: body(it, c, *a), carry)
    r = run(init, *args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(init, *args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:56s} {dt:8.3f} ms")
    return dt


# ---- data: surface map + random batch queries (bench-like)
rng = np.random.RandomState(0)
NPTS = 600_000
pts = np.zeros((NPTS, 3), np.float32)
pts[:, :2] = rng.rand(NPTS, 2) * 90 - 45
pts[:, 2] = 0.3 * np.sin(pts[:, 0]) + 0.3 * np.cos(pts[:, 1])
res = 0.4
max_dist2 = float(np.float32(2.0 * 2.0 * res * res * 1.21))  # ~ball r~2cells
# local set: voxel-downsampled surface -> ~65k pts like the bench map
vox = np.unique((pts / res).astype(np.int64), axis=0, return_index=True)[1]
lp_real = pts[vox][:120_000]
CAP = 1 << 17
lp = np.full((CAP, 3), 1e9, np.float32)
lp[:lp_real.shape[0]] = lp_real
valid = np.arange(CAP) < lp_real.shape[0]
si = np.asarray(kj._sort_by_morton(jnp.asarray(lp), jnp.asarray(valid),
                                   res * 4))
lps = jnp.asarray(lp[si])
print("local count:", lp_real.shape[0])

N = 16384
q = jnp.asarray(pts[rng.randint(0, NPTS, N)] + rng.randn(N, 3) * 0.1,
                jnp.float32)


def make_join(TQ, TL, pair_factor, per_row_cap, skip_merge, k=6):
    def kern(qid_ref, pid_ref, flags_ref, q_ref, p_ref,
             outd_ref, outi_ref, cnt_ref, cat_d, cat_i):
        i = pl.program_id(0)
        first = flags_ref[i] & 1
        valid = flags_ref[i] & 2

        @pl.when(first == 1)
        def _():
            outd_ref[:] = jnp.full((TQ, k), BIG, jnp.float32)
            outi_ref[:] = jnp.full((TQ, k), -1, jnp.int32)
            cnt_ref[:] = jnp.zeros((TQ, 1), jnp.int32)

        @pl.when(valid == 2)
        def _():
            qp_ = q_ref[:]
            pp = p_ref[:]
            dx = qp_[:, 0:1] - pp[:, 0][None, :]
            dy = qp_[:, 1:2] - pp[:, 1][None, :]
            dz = qp_[:, 2:3] - pp[:, 2][None, :]
            d2 = dx * dx + dy * dy + dz * dz
            in_r = d2 <= max_dist2
            cnt_ref[:] = cnt_ref[:] + jnp.sum(
                in_r, axis=1, keepdims=True).astype(jnp.int32)
            d2m = jnp.where(in_r, d2, BIG)

            def do_merge():
                base = pid_ref[i] * TL
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (TQ, TL), 1) + base
                cat_d[:, :k] = outd_ref[:]
                cat_d[:, k:] = d2m
                cat_i[:, :k] = outi_ref[:]
                cat_i[:, k:] = col
                for r in range(k):
                    vals = cat_d[:]
                    mn = jnp.min(vals, axis=1, keepdims=True)
                    ci = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
                    sel = jnp.min(
                        jnp.where(vals <= mn, ci, jnp.int32(1 << 30)),
                        axis=1, keepdims=True)
                    pick = ci == sel
                    idx = jnp.sum(jnp.where(pick, cat_i[:], 0), axis=1)
                    outd_ref[:, r] = mn[:, 0]
                    outi_ref[:, r] = jnp.where(mn[:, 0] < BIG, idx, -1)
                    cat_d[:] = jnp.where(pick, BIG, cat_d[:])

            if skip_merge:
                worst = outd_ref[:, k - 1]
                improves = jnp.any(d2m < worst[:, None])

                @pl.when(improves)
                def _():
                    do_merge()
            else:
                do_merge()

    @functools.partial(jax.jit, static_argnames=())
    def join(qpts, lpts):
        n = qpts.shape[0]
        qvalid = jnp.abs(qpts[:, 0]) < 1e8
        qsi = kj._sort_by_morton(qpts, qvalid, res * 4)
        qs = qpts[qsi]
        nq = n // TQ
        npt = lpts.shape[0] // TL
        qt = qs.reshape(nq, TQ, 3)
        pt = lpts.reshape(npt, TL, 3)
        q_real = jnp.abs(qt[:, :, 0]) < 1e8
        p_real = jnp.abs(pt[:, :, 0]) < 1e8
        inf3 = jnp.full((3,), jnp.inf)
        qmin = jnp.min(jnp.where(q_real[..., None], qt, inf3), 1)
        qmax = jnp.max(jnp.where(q_real[..., None], qt, -inf3), 1)
        pmin = jnp.min(jnp.where(p_real[..., None], pt, inf3), 1)
        pmax = jnp.max(jnp.where(p_real[..., None], pt, -inf3), 1)
        gap = jnp.maximum(jnp.maximum(qmin[:, None] - pmax[None],
                                      pmin[None] - qmax[:, None]), 0.0)
        bb2 = jnp.sum(jnp.where(jnp.isfinite(gap), gap * gap, jnp.inf), -1)
        act = bb2 <= max_dist2
        prc = min(npt, per_row_cap)
        cap_pairs = pair_factor * nq
        an = jnp.maximum(
            jnp.minimum(jnp.sum(act.astype(jnp.int32), 1), prc), 1)
        key = jnp.where(act, bb2, jnp.inf)
        ids = jnp.argsort(key, axis=1)[:, :prc].astype(jnp.int32)
        off = jnp.cumsum(an) - an
        jj = jnp.arange(prc)[None, :]
        slot = off[:, None] + jj
        put = (jj < an[:, None]) & (slot < cap_pairs)
        slot = jnp.where(put, slot, cap_pairs)
        qrow = jnp.broadcast_to(
            jnp.arange(nq, dtype=jnp.int32)[:, None], ids.shape)
        qid = jnp.full((cap_pairs + 1,), nq - 1, jnp.int32
                       ).at[slot.reshape(-1)].set(qrow.reshape(-1))[:cap_pairs]
        pid = jnp.zeros((cap_pairs + 1,), jnp.int32
                        ).at[slot.reshape(-1)].set(
            ids.reshape(-1))[:cap_pairs]
        vf = jnp.zeros((cap_pairs + 1,), jnp.int32
                       ).at[slot.reshape(-1)].set(
            act[qrow.reshape(-1), ids.reshape(-1)].astype(jnp.int32) * 2
        )[:cap_pairs]
        ff = jnp.zeros((cap_pairs + 1,), jnp.int32).at[
            jnp.where(off < cap_pairs, off, cap_pairs)].set(1)[:cap_pairs]
        flags = vf | ff
        overflow = jnp.sum(an) - cap_pairs

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cap_pairs,),
            in_specs=[
                pl.BlockSpec((TQ, 3), lambda i, a, b, c: (a[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TL, 3), lambda i, a, b, c: (b[i], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TQ, k), lambda i, a, b, c: (a[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TQ, k), lambda i, a, b, c: (a[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TQ, 1), lambda i, a, b, c: (a[i], 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((TQ, TL + k), jnp.float32),
                pltpu.VMEM((TQ, TL + k), jnp.int32),
            ],
        )
        outd, outi, cnt = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((n, k), jnp.float32),
                jax.ShapeDtypeStruct((n, k), jnp.int32),
                jax.ShapeDtypeStruct((n, 1), jnp.int32),
            ])(qid, pid, flags, qs, lpts)
        inv = jnp.zeros_like(qsi).at[qsi].set(jnp.arange(n, dtype=qsi.dtype))
        return outi[inv], outd[inv], cnt[inv, 0], overflow

    return join


# reference result via brute force on a subset
def check(join):
    li, d2, cnt, ovf = jax.jit(join)(q, lps)
    li = np.asarray(li); d2 = np.asarray(d2)
    sub = slice(0, 2048)
    lpn = np.asarray(lps)
    D = ((np.asarray(q)[sub, None] - lpn[None]) ** 2).sum(-1)
    D = np.where(D <= max_dist2, D, BIG)
    ref = np.sort(D, 1)[:, :6]
    got = np.sort(np.where(d2[sub] < BIG, d2[sub], BIG), 1)
    bad = (np.abs(got - np.where(ref < BIG, ref, BIG)) > 1e-4).sum()
    print(f"   overflow={int(ovf)} badvals={bad}")


for name, args in [
    ("TQ128 TL512 pf16 prc48 skip", (128, 512, 16, 48, True)),
    ("TQ128 TL256 pf24 prc64 skip", (128, 256, 24, 64, True)),
    ("TQ64  TL512 pf20 prc48 skip", (64, 512, 20, 48, True)),
    ("TQ128 TL512 pf12 prc32 skip", (128, 512, 12, 32, True)),
]:
    join = make_join(*args)
    check(join)
    timeit_carry(f"join {name}",
                 lambda it, acc, qq, ll: acc + jnp.sum(
                     join(qq + it * 1e-3, ll)[1]),
                 jnp.float32(0.0), q, lps)
