"""Correspondence-free point-to-SDF registration (odometry).

Rebuilds the reference `Tracker` (reference: utils/tracker.py:20-695) as ONE
jit-compiled `lax.while_loop` — the reference runs a Python loop with a host
sync per iteration; here the entire Gauss-Newton/LM iteration (transform →
query SDF + analytical gradient → robust weighting → 6x6 solve → pose
update → convergence/failure checks) stays on device and only the final pose
and diagnostics cross to the host once per frame.

Numerics: poses are composed in float32 in a *sensor-anchored* world frame
(the host subtracts a float64 anchor from the map/pose translation), which
keeps both the Jacobian cross products `p x grad` and the 6x6 normal system
well-conditioned without float64 (reference keeps everything float64
instead, utils/tracker.py:673).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pin_slam_tpu.models import neural_points as npm
from pin_slam_tpu.slam import map_query as mq
from pin_slam_tpu.ops.transforms import rotation_angle, so3_exp


class TrackerParams(NamedTuple):
    """Static registration parameters (reference: utils/tracker.py:77-104)."""

    reg_iter_n: int = 50
    min_grad_norm: float = 0.5
    max_grad_norm: float = 2.0
    gm_dist: float = 0.3
    gm_grad: float = 0.1
    lm_lambda: float = 1e-4
    term_thre_deg: float = 0.01
    term_thre_m: float = 0.001
    max_sdf_std: float = 0.25          # surface_sample_range_m * max_sdf_std_ratio
    max_valid_residual_cm: float = 15.0  # surface_range * final_residual_ratio * 100
    min_valid_ratio: float = 0.2       # 0.15 when loop_reg
    min_valid_points: int = 30
    mask_min_nn_count: int = 6         # track_mask_query_nn_k
    eigenvalue_check: bool = True
    eigenvalue_ratio_thre: float = 0.005
    max_increment_residual_ratio: float = 1.1
    weighted_first: bool = True
    # color handling (reference: utils/tracker.py:493-543):
    # 0 = geometry only, 1 = color-consistency weight, 2 = photometric term
    color_mode: int = 0
    photometric_weight: float = 0.01
    # GM kernel scale for the color residual (intensity in [0,1]; half-
    # weight at ~0.09 residual)
    photometric_gm: float = 0.02
    color_channel: int = 1
    # minimum GN iterations before the small-update termination may fire
    # (guards against a first-iteration |dx| < thre exit from an already
    # near-aligned initial guess)
    min_iter_n: int = 2
    # Graduated non-convexity: the Geman-McClure scales start gm_anneal x
    # larger and halve per iteration down to 1x (1.0 = off). Available for
    # hard relocalization; measured NOT to help the sustained-turn yaw
    # runaway (that was the rotation-extrapolating initial guess — see
    # config.motion_model), and slightly loosens normal convergence.
    gm_anneal: float = 1.0


class TrackResult(NamedTuple):
    pose: jnp.ndarray          # [4, 4] f32, anchored world frame
    cov: jnp.ndarray           # [6, 6]
    valid: jnp.ndarray         # scalar bool
    residual_cm: jnp.ndarray   # scalar
    valid_count: jnp.ndarray   # scalar i32
    iterations: jnp.ndarray    # scalar i32
    eigenvalues: jnp.ndarray   # [3] translation-part eigenvalues
    weights: jnp.ndarray       # [S] per-point robust weights (vis/debug)
    valid_mask: jnp.ndarray    # [S]
    fail_code: jnp.ndarray     # scalar i32 bitmask: 1=residual blow-up,
    #                            2=too few valid, 4=final residual,
    #                            8=eigenvalue degeneracy


def make_tracker(qp: mq.QueryParams, tp: TrackerParams):
    """Returns track(state, geo_features, geo_mlp, src, src_mask, init_T,
    lf, anchor) -> TrackResult; jit it at the call site (the system wraps it
    with donation)."""

    use_color = tp.color_mode > 0

    def registration_quantities(state, geo_features, geo_mlp, pts, src_mask,
                                lf, anchor, src_intensity, color_features,
                                color_mlp, lset, gm_scale=1.0):
        sdf, grad, out = mq.query_sdf_and_grad(
            state, geo_features, geo_mlp, pts, qp,
            anchor=anchor, lf=lf, lset=lset,
            with_std=not tp.weighted_first)
        grad_norm = jnp.linalg.norm(grad, axis=-1)

        valid = (
            src_mask
            & (out.nn_count >= tp.mask_min_nn_count)
            & (grad_norm > tp.min_grad_norm)
            & (grad_norm < tp.max_grad_norm)
        )
        if not tp.weighted_first and out.sdf_std is not None:
            valid = valid & (out.sdf_std < tp.max_sdf_std)

        residual = sdf  # source sdf labels are zero (surface points)
        grad_anomaly = grad_norm - 1.0

        # Geman-McClure robust weights (reference: utils/tracker.py:469-480)
        # with graduated non-convexity via gm_scale (see TrackerParams)
        gm_g = tp.gm_grad * gm_scale
        gm_d = tp.gm_dist * gm_scale
        w_grad = (gm_g / (gm_g + grad_anomaly**2)) ** 2
        w_res = (gm_d / (gm_d + residual**2)) ** 2
        w = w_grad * w_res

        int_pred = int_grad = None
        # color terms need the color args: calls that omit them (loop-
        # closure registration passes geometry only) trace the pure
        # geometric program even when color_mode > 0
        if use_color and color_mlp is not None:
            # predicted intensity + its spatial gradient
            def int_fn(p):
                o = mq.query_decode(
                    state, geo_features, geo_mlp, p, qp, anchor=anchor,
                    lf=lf, lset=lset, color_features=color_features,
                    color_mlp=color_mlp, color_channel=tp.color_channel)
                if tp.color_channel == 3:
                    inten = (0.299 * o.color[:, 0] + 0.587 * o.color[:, 1]
                             + 0.114 * o.color[:, 2])
                else:
                    inten = o.color[:, 0]
                return jnp.sum(inten), inten

            int_grad, int_pred = jax.grad(int_fn, has_aux=True)(pts)
            if tp.color_mode == 1:
                # intensity-consistency weight (reference :509-515)
                w = w * jnp.exp(-jnp.abs(int_pred - src_intensity))

        w = jnp.where(valid, w, 0.0)
        vcount = jnp.sum(valid.astype(jnp.int32))
        w_mean = jnp.sum(w) / jnp.maximum(vcount.astype(jnp.float32), 1.0)
        w = w / (2.0 * w_mean + 1e-12)  # (reference :522-524)

        # jacobian J = [p x grad, grad] (reference: utils/tracker.py:652-655)
        cross = jnp.cross(pts, grad)
        J = jnp.concatenate([cross, grad], axis=-1)        # [S, 6]
        Jw = J * w[:, None]
        H = Jw.T @ J                                       # [6, 6]
        g = -(Jw.T @ residual)                             # [6]

        if use_color and tp.color_mode == 2 and int_pred is not None:
            # photometric term (reference: implicit_color_reg,
            # utils/tracker.py:699-744), geometry-neutral by construction:
            # * robust GM weight on the color residual — an undertrained
            #   color decoder or view-dependent intensity must not drag
            #   the pose (the round-2 colored runs lost 1 cm ATE / 7 pts
            #   F-score to exactly this),
            # * annealed by the same GNC schedule as the geometric
            #   weights: coarse iterations (gm_scale > 1) are effectively
            #   geometry-only, full photometric weight only at the
            #   converged scale — color polishes the basin, never picks it
            res_c = int_pred - src_intensity
            w_c = (tp.photometric_gm / (tp.photometric_gm + res_c**2)) ** 2
            photo_fac = tp.photometric_weight / (gm_scale * gm_scale)
            Jc = jnp.concatenate([jnp.cross(pts, int_grad), int_grad], -1)
            Jcw = Jc * (w * w_c)[:, None]
            H = H + photo_fac * (Jcw.T @ Jc)
            g = g - photo_fac * (Jcw.T @ res_c)

        res_cm = (
            jnp.sum(jnp.where(valid, jnp.abs(residual), 0.0))
            / jnp.maximum(vcount.astype(jnp.float32), 1.0) * 100.0
        )
        mse = (
            jnp.sum(w * residual**2)
            / jnp.maximum(vcount.astype(jnp.float32), 1.0)
        )
        return H, g, res_cm, vcount, mse, w, valid

    # cached-candidate registration (join mode, geometry-only): probe a
    # k=12 candidate set, reuse it across GN iterations while the pose
    # moves < a fraction of a voxel, re-ranking to the exact top-6 by true
    # distance every iteration. ~4x fewer kernel probes per track.
    CAND_K = 12

    def registration_quantities_cached(geo_features, geo_mlp, pts, src_mask,
                                       anchor, lset, cand, cvalid,
                                       gm_scale=1.0, pack=None, rows=None):
        def sdf_fn(p):
            s, nn, std = mq.decode_sdf_candidates(
                lset, geo_features, geo_mlp, p + anchor, cand, cvalid, qp,
                with_std=not tp.weighted_first, pack=pack, rows=rows)
            return jnp.sum(s), (s, nn, std)

        grad, (sdf, nn_count, std) = jax.grad(
            sdf_fn, has_aux=True)(pts)
        grad_norm = jnp.linalg.norm(grad, axis=-1)
        valid = (
            src_mask
            & (nn_count >= tp.mask_min_nn_count)
            & (grad_norm > tp.min_grad_norm)
            & (grad_norm < tp.max_grad_norm)
        )
        if not tp.weighted_first and std is not None:
            valid = valid & (std < tp.max_sdf_std)

        residual = sdf
        grad_anomaly = grad_norm - 1.0
        gm_g = tp.gm_grad * gm_scale
        gm_d = tp.gm_dist * gm_scale
        w_grad = (gm_g / (gm_g + grad_anomaly**2)) ** 2
        w_res = (gm_d / (gm_d + residual**2)) ** 2
        w = jnp.where(valid, w_grad * w_res, 0.0)
        vcount = jnp.sum(valid.astype(jnp.int32))
        w_mean = jnp.sum(w) / jnp.maximum(vcount.astype(jnp.float32), 1.0)
        w = w / (2.0 * w_mean + 1e-12)

        cross = jnp.cross(pts, grad)
        J = jnp.concatenate([cross, grad], axis=-1)
        Jw = J * w[:, None]
        H = Jw.T @ J
        g = -(Jw.T @ residual)
        res_cm = (jnp.sum(jnp.where(valid, jnp.abs(residual), 0.0))
                  / jnp.maximum(vcount.astype(jnp.float32), 1.0) * 100.0)
        mse = (jnp.sum(w * residual**2)
               / jnp.maximum(vcount.astype(jnp.float32), 1.0))
        return H, g, res_cm, vcount, mse, w, valid

    def track(state: npm.MapState, geo_features, geo_mlp,
              src: jnp.ndarray, src_mask: jnp.ndarray,
              init_T: jnp.ndarray, lf: mq.LocalFilter,
              anchor: jnp.ndarray, loop_reg=False,
              src_intensity=None, color_features=None,
              color_mlp=None, lset=None) -> TrackResult:
        S = src.shape[0]
        src_count = jnp.maximum(jnp.sum(src_mask.astype(jnp.int32)), 1)
        min_ratio = 0.15 if loop_reg else tp.min_valid_ratio
        use_cache = (lset is not None) and not use_color
        # per-track packed row table (features are fixed during
        # registration): pos/quat/feats in one gather per GN iteration
        track_pack = (mq.pack_lset_rows(lset, geo_features)
                      if use_cache else None)
        if lset is not None:
            # one Morton sort per track: the source cloud moves rigidly by
            # centimeters between GN iterations, so the iteration-0 spatial
            # order stays coherent; knn_join recomputes tile bboxes from
            # the true transformed points every probe, so results are exact
            from pin_slam_tpu.ops import knn_join as kj
            pad0 = (-S) % kj.TQ

            def padq(p):
                return (jnp.concatenate(
                    [p, jnp.full((pad0, 3), kj.PAD, p.dtype)]) if pad0
                    else p)
            q0 = jnp.where(src_mask[:, None],
                           src @ init_T[:3, :3].T + init_T[:3, 3]
                           + anchor, kj.PAD)
            qperm0 = kj._sort_by_morton(
                padq(jax.lax.stop_gradient(q0)),
                jnp.concatenate([src_mask, jnp.zeros(pad0, bool)])
                if pad0 else src_mask, qp.resolution * 4.0)
        else:
            qperm0 = None

        def probe(pts_abs):
            qn = npm.query_neighbors_join(
                None, pts_abs, lset, nn_k=CAND_K,
                max_dist2=qp.join_max_dist2,
                resolution=qp.resolution, local_ids=True, qperm=qperm0)
            return qn.idx, qn.valid

        def gn_update(carry, quantities, i_probed):
            """One GN/LM update + failure/termination bookkeeping given
            this iteration's registration quantities. `i_probed` marks
            the unrolled probed-phase steps, whose updates must be
            MASKED on stop (a while-loop exits instead)."""
            (T, i, last_res, valid_flag, converged, stop,
             H_keep, res_keep, cnt_keep, mse_keep, fail_code,
             w_keep, vmask_keep) = carry
            H, g, res_cm, vcount, mse, w_pts, vmask = quantities

            H_lm = H + tp.lm_lambda * jnp.diag(jnp.diag(H))
            enough = vcount >= 10
            H_safe = jnp.where(enough, H_lm, jnp.eye(6))
            delta = jnp.linalg.solve(H_safe, jnp.where(enough, g, 0.0))
            dR = so3_exp(delta[:3])
            dT = jnp.eye(4).at[:3, :3].set(dR).at[:3, 3].set(delta[3:])
            T_new = jnp.where(enough, dT @ T, T)

            # failure: residual blow-up (reference :149-159)
            inc_fail = (res_cm - last_res) / last_res \
                > tp.max_increment_residual_ratio
            last_res_new = jnp.where(inc_fail, last_res, res_cm)
            # failure: not enough valid points (reference :161-169)
            few_fail = (vcount < tp.min_valid_points) | (
                vcount.astype(jnp.float32) / src_count.astype(jnp.float32)
                < min_ratio)
            valid_new = valid_flag & ~inc_fail & ~few_fail
            fail_new = fail_code | jnp.where(inc_fail, 1, 0) \
                | jnp.where(few_fail, 2, 0)

            stop_new = (~valid_new) | converged  # (reference :171-172)

            rot_deg = rotation_angle(dR) * 180.0 / jnp.pi
            tran_m = jnp.linalg.norm(delta[3:])
            small = (jnp.abs(rot_deg) < tp.term_thre_deg) & \
                (tran_m < tp.term_thre_m) & (i + 1 >= tp.min_iter_n)
            converged_new = converged | small | (i == tp.reg_iter_n - 2)

            new = (T_new, i + 1, last_res_new, valid_new, converged_new,
                   stop_new, H, res_cm, vcount, mse, fail_new,
                   w_pts, vmask)
            if not i_probed:
                return new
            # probed-phase step: freeze the carry once stopped
            return jax.tree.map(
                lambda n_, o: jnp.where(stop, o, n_), new, carry)

        init = (
            init_T, jnp.int32(0), jnp.float32(1e5),
            jnp.bool_(True), jnp.bool_(False), jnp.bool_(False),
            jnp.eye(6), jnp.float32(0.0), jnp.int32(0), jnp.float32(0.0),
            jnp.int32(0), jnp.zeros((S,), jnp.float32),
            jnp.zeros((S,), bool),
        )

        if use_cache:
            # two-phase registration: PROBED phase = N unrolled GN steps,
            # each with a fresh candidate probe (the pose moves most in
            # the first iterations); CACHED phase = while_loop reusing the
            # last probe's candidates with exact top-k re-ranking. After
            # the probed phase the per-iteration pose increments are
            # sub-voxel, so the cached 12-candidate sets cover the
            # remaining motion; dropping the old movement-triggered
            # re-probe removes a per-iteration lax.cond whose carried
            # candidate copies cost as much as the probes it saved.
            n_probed = 5 if loop_reg else 3
            carry = init
            cand = cvalid = rows = None
            for _ in range(n_probed):
                T_c, i_c = carry[0], carry[1]
                pts = src @ T_c[:3, :3].T + T_c[:3, 3]
                cand, cvalid = probe(pts + anchor)
                # one row gather per probe; the while phase below reuses
                # the LAST probe's rows — the gather is loop-invariant
                # there (candidates frozen, only the pose moves)
                rows = track_pack[jnp.where(cvalid, cand, lset.cap)]
                gm_scale = jnp.maximum(
                    1.0, tp.gm_anneal * (0.5 ** i_c.astype(jnp.float32)))
                q = registration_quantities_cached(
                    geo_features, geo_mlp, pts, src_mask, anchor,
                    lset, cand, cvalid, gm_scale, rows=rows)
                carry = gn_update(carry, q, i_probed=True)

            def body(c):
                T_c, i_c = c[0], c[1]
                pts = src @ T_c[:3, :3].T + T_c[:3, 3]
                gm_scale = jnp.maximum(
                    1.0, tp.gm_anneal * (0.5 ** i_c.astype(jnp.float32)))
                q = registration_quantities_cached(
                    geo_features, geo_mlp, pts, src_mask, anchor,
                    lset, cand, cvalid, gm_scale, rows=rows)
                return gn_update(c, q, i_probed=False)
        else:
            carry = init

            def body(c):
                T_c, i_c = c[0], c[1]
                pts = src @ T_c[:3, :3].T + T_c[:3, 3]
                gm_scale = jnp.maximum(
                    1.0, tp.gm_anneal * (0.5 ** i_c.astype(jnp.float32)))
                q = registration_quantities(
                    state, geo_features, geo_mlp, pts, src_mask, lf,
                    anchor, src_intensity, color_features, color_mlp,
                    lset, gm_scale)
                return gn_update(c, q, i_probed=False)

        def cond(c):
            return (c[1] < tp.reg_iter_n) & ~c[5]

        (T, iters, _, valid_flag, _, _, H_raw, res_cm, vcount, mse,
         fail_code, w_final, valid_final) = jax.lax.while_loop(
            cond, body, carry)

        # final checks (reference: utils/tracker.py:198-216)
        res_ok = res_cm <= tp.max_valid_residual_cm
        valid_flag = valid_flag & res_ok
        fail_code = fail_code | jnp.where(res_ok, 0, 4)
        eig = jnp.linalg.eigvalsh(H_raw[3:, 3:])
        if tp.eigenvalue_check:
            eig_ok = eig[0] >= vcount.astype(jnp.float32) \
                * tp.eigenvalue_ratio_thre
            valid_flag = valid_flag & eig_ok
            fail_code = fail_code | jnp.where(eig_ok, 0, 8)

        cov = jnp.linalg.inv(
            H_raw + 1e-9 * jnp.eye(6)) * mse  # (reference :689-693)

        # per-point weights from the last executed iteration
        # (vis / weight_pc output; avoids an extra full query)
        return TrackResult(
            pose=T, cov=cov, valid=valid_flag, residual_cm=res_cm,
            valid_count=vcount, iterations=iters, eigenvalues=eig,
            weights=w_final, valid_mask=valid_final, fail_code=fail_code,
        )

    return track
