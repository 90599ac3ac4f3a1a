"""Dissect ONE local-BA LM iteration on TPU: linearize vs solve vs loop.

Reimplements the two halves of `optim/local_ba.solve_ba`'s body with the
same shapes and times them separately (threaded fori carries, forced
values), then compares against the while_loop marginal — isolating whether
the 6+ ms/iteration cost is compute or loop structure.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from multi_orb_slam_tpu.config import SlamConfig, inv_sigma2_of_level
from multi_orb_slam_tpu.frontend import tracking
from multi_orb_slam_tpu.geometry import camera as cam_mod, se3
from multi_orb_slam_tpu.mapping import local_mapping
from multi_orb_slam_tpu.ops import orb
from multi_orb_slam_tpu.ops import pallas_kernels as _pk
from multi_orb_slam_tpu.optim import residuals
from multi_orb_slam_tpu.optim.pose_opt import CHI2_MONO, CHI2_STEREO

H, W, C = 480, 640, 2
cfg = SlamConfig(n_cams=C, width=W, height=H, orb=orb.ORBConfig(n_features=1024))
K = jnp.tile(jnp.asarray([[520.9, 521.0, 320.0, 240.0]]), (C, 1))
Ry = se3.so3_exp(jnp.asarray([0.0, np.pi / 2, 0.0]))
T_rc1 = jnp.eye(4).at[:3, :3].set(Ry).at[:3, 3].set(jnp.asarray([0.161, 0.004, -0.071]))
T_rc = jnp.stack([jnp.eye(4), T_rc1])
calib = cam_mod.CameraParams(K=K, dist=jnp.zeros((C, 5)), T_rc=T_rc,
                             bf=jnp.asarray(40.0), width=W, height=H)

from _bench_data import load_bench_frames
grays, depths = load_bench_frames()
tr = tracking.Tracker(calib, cfg)
tr.kf_inserted_cb = lambda s: local_mapping.run_mapping_stage(
    tr.map, s, tr.frame_id, calib, cfg)
for i in range(34):
    tr.process(jnp.asarray(grays[i]), jnp.asarray(depths[i]))
st = tr.map
ks = jnp.asarray(tr.last_kf_slot, jnp.int32)
prob = local_mapping.build_local_problem(st, ks, cfg, 12, 12)

L, Cc, F = prob.obs_mp.shape
P = prob.mp_pos.shape[0]
N = L * Cc * F
dtype = prob.mp_pos.dtype
bf = calib.bf
print(f"L={L} P={P} N={N} n_obs={int(jnp.sum(prob.obs_mp >= 0))}", flush=True)

obs_kf = jnp.broadcast_to(
    jnp.arange(L, dtype=jnp.int32)[:, None, None], (L, Cc, F)).reshape(N)
obs_cam = jnp.broadcast_to(
    jnp.arange(Cc, dtype=jnp.int32)[None, :, None], (L, Cc, F)).reshape(N)
obs_mp = prob.obs_mp.reshape(N)
obs_uvr = prob.obs_uvr.reshape(N, 3)
obs_is2 = prob.obs_inv_sigma2.reshape(N)
obs_valid = ((obs_mp >= 0) & prob.kf_valid[obs_kf]
             & prob.mp_valid[jnp.clip(obs_mp, 0, P - 1)])
mp_idx = jnp.clip(obs_mp, 0, P - 1)
LC = L * Cc
pidx_rows = jnp.where(obs_valid, obs_mp, P).reshape(LC, F)
_rows = jnp.arange(LC)[:, None]
inv_lc = jnp.full((LC, P + 1), -1, jnp.int32).at[
    _rows, pidx_rows].set(
    jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32), (LC, F)))[:, :P]
has_inv = inv_lc >= 0
ginv = jnp.clip(inv_lc, 0, F - 1)
inv_raw = jnp.where(has_inv, ginv, -1)
delta_m = jnp.sqrt(CHI2_MONO)
delta_s = jnp.sqrt(CHI2_STEREO)


def linearize(kf_Tcw, mp_pos):
    e, Jc, Jp, is_st, posd = residuals.reproj_residual(
        kf_Tcw[obs_kf], mp_pos[mp_idx], T_rc[obs_cam], K[obs_cam], bf,
        obs_uvr)
    act = obs_valid & posd
    row = residuals.row_weights(is_st, dtype)
    chi2 = jnp.sum(e * e * row, axis=-1) * obs_is2
    delta = jnp.where(is_st, delta_s, delta_m)
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    hw = jnp.where(r > delta, delta / r, 1.0)
    w = obs_is2 * hw * act.astype(dtype)
    Wr = row * w[:, None]
    Jc_eff = Jc * prob.kf_free[obs_kf][:, None, None].astype(dtype)
    JTc = Jc_eff * Wr[:, :, None]
    CF = Cc * F
    A18 = JTc.reshape(L, CF, 18)
    B18 = Jc_eff.reshape(L, CF, 18)
    H18 = jax.lax.dot_general(A18, B18, (((1,), (1,)), ((0,), (0,))))
    H18 = H18.reshape(L, 3, 6, 3, 6)
    Hcc = H18[:, 0, :, 0, :] + H18[:, 1, :, 1, :] + H18[:, 2, :, 2, :]
    bc = jnp.einsum("lnri,lnr->li", JTc.reshape(L, CF, 3, 6),
                    e.reshape(L, CF, 3))
    JTp = Jp * Wr[:, :, None]
    Vpp = jnp.einsum("nri,nrj->nij", JTp, Jp).reshape(N, 9)
    Vbp = jnp.einsum("nri,nr->ni", JTp, e)
    Vcp = jnp.einsum("nri,nrj->nij", JTc, Jp).reshape(N, 18)
    Vall = jnp.concatenate([Vpp, Vbp, Vcp], axis=-1)
    v = Vall.reshape(LC, F, 30)
    summed, g = _pk.point_sums_pallas(v, inv_raw)
    Hpp = summed[:, :9].reshape(P, 3, 3)
    bp = summed[:, 9:12]
    Wcp = jnp.sum(g[..., 12:].reshape(L, Cc, P, 6, 3), axis=1)
    Wcp = Wcp.transpose(1, 0, 2, 3)
    total = jnp.sum(jnp.where(act, chi2, 0.0))
    return Hcc, bc, Hpp, bp, Wcp, total


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    tot = jnp.zeros((), jnp.float32)
    for l in leaves:
        tot = tot + jnp.sum(l.astype(jnp.float32))
    return float(tot)


def amortized(name, step, init, reps=16):
    @partial(jax.jit, static_argnums=(1,))
    def loop(c, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), c)
    force(loop(init, 1))
    force(loop(init, reps + 1))
    t0 = time.perf_counter(); force(loop(init, 1)); t1 = time.perf_counter()
    force(loop(init, reps + 1)); t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / reps * 1e3
    print(f"{name:52s} {per:8.3f} ms/iter", flush=True)
    return per


def _rs(*xs):
    tot = jnp.zeros((), jnp.float32)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


# 1. linearize alone, threaded through mp_pos
def lin_step(c):
    mp_pos, acc = c
    Hcc, bc, Hpp, bp, Wcp, total = linearize(prob.kf_Tcw, mp_pos)
    return (mp_pos + 1e-30 * bp,
            acc + 1e-30 * _rs(Hcc, bc, Hpp, Wcp, total))

amortized("linearize (full, threaded)", lin_step,
          (prob.mp_pos, jnp.zeros((), dtype)))


# 1a. residual + FULL jacobians forced
def resj_step(c):
    mp_pos, acc = c
    e, Jc, Jp, is_st, posd = residuals.reproj_residual(
        prob.kf_Tcw[obs_kf], mp_pos[mp_idx], T_rc[obs_cam], K[obs_cam], bf,
        obs_uvr)
    return (mp_pos + 1e-30 * jnp.sum(e),
            acc + 1e-30 * _rs(e, Jc, Jp))

amortized("reproj_residual + FULL J forced", resj_step,
          (prob.mp_pos, jnp.zeros((), dtype)))


# 1a'. Hcc block contraction alone (given random JTc-sized inputs)
A18r = jax.random.normal(jax.random.PRNGKey(1), (L, Cc * F, 18), dtype)
def hcc_step(c):
    a18, acc = c
    H18 = jax.lax.dot_general(a18, a18, (((1,), (1,)), ((0,), (0,))))
    return (a18 + 1e-30 * H18[:, :1, :1], acc + 1e-30 * jnp.sum(H18))

amortized("Hcc dot_general [L,CF,18]^2", hcc_step,
          (A18r, jnp.zeros((), dtype)))


# 1a''. Vpp/Vbp/Vcp einsums alone, fully forced
JTr = jax.random.normal(jax.random.PRNGKey(2), (N, 3, 6), dtype)
Jpr = jax.random.normal(jax.random.PRNGKey(3), (N, 3, 3), dtype)
er = jax.random.normal(jax.random.PRNGKey(4), (N, 3), dtype)
def v_step(c):
    jt, acc = c
    Vpp = jnp.einsum("nri,nrj->nij", Jpr, Jpr).reshape(N, 9)
    Vbp = jnp.einsum("nri,nr->ni", Jpr, er)
    Vcp = jnp.einsum("nri,nrj->nij", jt, Jpr).reshape(N, 18)
    Vall = jnp.concatenate([Vpp, Vbp, Vcp], axis=-1)
    return (jt + 1e-30 * Vall[:, :1, None], acc + 1e-30 * jnp.sum(Vall))

amortized("V einsums [N,30] forced", v_step,
          (JTr, jnp.zeros((), dtype)))


# 1b. linearize WITHOUT the point_sums (pallas) stage
def lin_nops_step(c):
    mp_pos, acc = c
    e, Jc, Jp, is_st, posd = residuals.reproj_residual(
        prob.kf_Tcw[obs_kf], mp_pos[mp_idx], T_rc[obs_cam], K[obs_cam], bf,
        obs_uvr)
    act = obs_valid & posd
    row = residuals.row_weights(is_st, dtype)
    chi2 = jnp.sum(e * e * row, axis=-1) * obs_is2
    w = obs_is2 * act.astype(dtype)
    Wr = row * w[:, None]
    Jc_eff = Jc * prob.kf_free[obs_kf][:, None, None].astype(dtype)
    JTc = Jc_eff * Wr[:, :, None]
    CF = Cc * F
    A18 = JTc.reshape(L, CF, 18)
    B18 = Jc_eff.reshape(L, CF, 18)
    H18 = jax.lax.dot_general(A18, B18, (((1,), (1,)), ((0,), (0,))))
    JTp = Jp * Wr[:, :, None]
    Vpp = jnp.einsum("nri,nrj->nij", JTp, Jp).reshape(N, 9)
    Vbp = jnp.einsum("nri,nr->ni", JTp, e)
    Vcp = jnp.einsum("nri,nrj->nij", JTc, Jp).reshape(N, 18)
    Vall = jnp.concatenate([Vpp, Vbp, Vcp], axis=-1)
    return (mp_pos + 1e-30 * Vbp[:P], acc + jnp.sum(H18) * 1e-30
            + jnp.sum(Vall[0]) * 1e-30)

amortized("linearize minus point_sums", lin_nops_step,
          (prob.mp_pos, jnp.zeros((), dtype)))


# 1c. point_sums alone on the REAL inverse map
V0 = jax.random.normal(jax.random.PRNGKey(0), (LC, F, 30), dtype)
def ps_step(c):
    v, acc = c
    summed, g = _pk.point_sums_pallas(v, inv_raw)
    return (v + 1e-30 * summed[0, 0], acc + jnp.sum(g[0, 0]) * 1e-30)

amortized("point_sums_pallas (real inv map)", ps_step,
          (V0, jnp.zeros((), dtype)))


# 2. solve_step alone (fixed lin, lam threaded)
lin0 = jax.jit(linearize)(prob.kf_Tcw, prob.mp_pos)
force(lin0)
Hcc0, bc0, Hpp0, bp0, Wcp0, _ = lin0
eye3 = jnp.eye(3, dtype=dtype)
eye6 = jnp.eye(6, dtype=dtype)


def solve_step(lam):
    def damp(Hm, eye):
        d = jnp.diagonal(Hm, axis1=-2, axis2=-1)
        tr_ = jnp.sum(d, axis=-1, keepdims=True)
        dd = lam * d + 1e-6 * tr_ + 1e-9
        return Hm + dd[..., :, None] * eye
    Hcc_d = damp(Hcc0, eye6)
    Hpp_d = damp(Hpp0, eye3) + jnp.where(
        prob.mp_valid, 0.0, 1.0)[:, None, None] * eye3
    from multi_orb_slam_tpu.optim.local_ba import solve_ba  # noqa
    # closed-form 3x3 inverse (copy of local_ba.inv3 essentials)
    a, b, c_ = Hpp_d[..., 0, 0], Hpp_d[..., 0, 1], Hpp_d[..., 0, 2]
    d_, e_, f = Hpp_d[..., 1, 0], Hpp_d[..., 1, 1], Hpp_d[..., 1, 2]
    g, h, i = Hpp_d[..., 2, 0], Hpp_d[..., 2, 1], Hpp_d[..., 2, 2]
    A = e_ * i - f * h; B = c_ * h - b * i; Cc_ = b * f - c_ * e_
    D = f * g - d_ * i; E = a * i - c_ * g; Ff = c_ * d_ - a * f
    G = d_ * h - e_ * g; Hh = b * g - a * h; I = a * e_ - b * d_
    det = a * A + b * D + c_ * G
    det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    Hpp_inv = jnp.stack([jnp.stack([A, B, Cc_], -1), jnp.stack([D, E, Ff], -1),
                         jnp.stack([G, Hh, I], -1)], -2) / det[..., None, None]
    l11 = jnp.sqrt(jnp.maximum(Hpp_inv[:, 0, 0], 1e-20))
    l21 = Hpp_inv[:, 1, 0] / l11
    l31 = Hpp_inv[:, 2, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(Hpp_inv[:, 1, 1] - l21 * l21, 1e-20))
    l32 = (Hpp_inv[:, 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(Hpp_inv[:, 2, 2] - l31 * l31 - l32 * l32, 1e-20))
    c0 = (Wcp0[..., 0] * l11[:, None, None] + Wcp0[..., 1] * l21[:, None, None]
          + Wcp0[..., 2] * l31[:, None, None])
    c1 = Wcp0[..., 1] * l22[:, None, None] + Wcp0[..., 2] * l32[:, None, None]
    c2 = Wcp0[..., 2] * l33[:, None, None]
    Yc = jnp.stack([c0, c1, c2], axis=-1)
    Yr = Yc.transpose(0, 3, 1, 2).reshape(P * 3, L * 6)
    S = -Yr.T @ Yr
    Wr_flat = Wcp0.transpose(0, 3, 1, 2).reshape(P * 3, L * 6)
    bp3 = bp0.reshape(P, 3)
    hb = jnp.einsum("pij,pj->pi", Hpp_inv, bp3)
    li = jnp.arange(L)
    S = S.reshape(L, 6, L, 6)
    S = S.at[li, :, li, :].add(Hcc_d)
    S = S.reshape(L * 6, L * 6)
    free6 = jnp.repeat(prob.kf_free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    rhs = bc0.reshape(L * 6) - Wr_flat.T @ hb.reshape(P * 3)
    rhs = jnp.where(free6, rhs, 0.0)
    dxc = -jnp.linalg.solve(S, rhs)
    dxc = jnp.where(free6, dxc, 0.0).reshape(L, 6)
    WTdx = (Wr_flat @ dxc.reshape(L * 6)).reshape(P, 3)
    dp = -jnp.einsum("pij,pj->pi", Hpp_inv, bp3 + WTdx)
    return dxc, dp


def sol_step(c):
    lam, acc = c
    dxc, dp = solve_step(lam)
    return (lam * 1.0000001 + 1e-30 * jnp.sum(dxc),
            acc + jnp.sum(dp) * 1e-30)

amortized("solve_step (damp+schur+solve+backsub)", sol_step,
          (jnp.asarray(1e-4, dtype), jnp.zeros((), dtype)))


# 3. one full manual LM iteration (linearize + solve), threaded
def full_iter(c):
    kf_Tcw, mp_pos, lam = c
    lin = linearize(kf_Tcw, mp_pos)
    # reuse solve via closure over fresh lin: inline the same math but on
    # this iteration's blocks (closure copies above use lin0; acceptable
    # approximation for cost since shapes identical) -- here we just call
    # solve_step for shape-identical work and apply
    dxc, dp = solve_step(lam)
    kf_new = jax.vmap(lambda d, T: se3.exp(d) @ T)(dxc, kf_Tcw)
    return (kf_new, mp_pos + dp * 1e-6, lam * 1.001)

amortized("linearize + solve + apply (no while_loop)", full_iter,
          (prob.kf_Tcw, prob.mp_pos, jnp.asarray(1e-4, dtype)), reps=12)


# 4. a REAL threaded LM body: linearize THIS iterate, solve on ITS blocks,
# apply — no while_loop, no fixed-closure hoisting (the full_iter above
# reuses lin0 and gets LICM'd; this one cannot be)
def solve_on(lin, lam):
    Hcc1, bc1, Hpp1, bp1, Wcp1, _ = lin

    def damp(Hm, eye):
        d = jnp.diagonal(Hm, axis1=-2, axis2=-1)
        tr_ = jnp.sum(d, axis=-1, keepdims=True)
        dd = lam * d + 1e-6 * tr_ + 1e-9
        return Hm + dd[..., :, None] * eye
    eye3_ = jnp.eye(3, dtype=dtype)
    eye6_ = jnp.eye(6, dtype=dtype)
    Hcc_d = damp(Hcc1, eye6_)
    Hpp_d = damp(Hpp1, eye3_) + jnp.where(
        prob.mp_valid, 0.0, 1.0)[:, None, None] * eye3_
    a, b, c_ = Hpp_d[..., 0, 0], Hpp_d[..., 0, 1], Hpp_d[..., 0, 2]
    d_, e_, f = Hpp_d[..., 1, 0], Hpp_d[..., 1, 1], Hpp_d[..., 1, 2]
    g, h, i = Hpp_d[..., 2, 0], Hpp_d[..., 2, 1], Hpp_d[..., 2, 2]
    A = e_ * i - f * h; B = c_ * h - b * i; Cc_ = b * f - c_ * e_
    D = f * g - d_ * i; E = a * i - c_ * g; Ff = c_ * d_ - a * f
    G = d_ * h - e_ * g; Hh = b * g - a * h; I = a * e_ - b * d_
    det = a * A + b * D + c_ * G
    det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    Hpp_inv = jnp.stack([jnp.stack([A, B, Cc_], -1),
                         jnp.stack([D, E, Ff], -1),
                         jnp.stack([G, Hh, I], -1)], -2) / det[..., None, None]
    l11 = jnp.sqrt(jnp.maximum(Hpp_inv[:, 0, 0], 1e-20))
    l21 = Hpp_inv[:, 1, 0] / l11
    l31 = Hpp_inv[:, 2, 0] / l11
    l22 = jnp.sqrt(jnp.maximum(Hpp_inv[:, 1, 1] - l21 * l21, 1e-20))
    l32 = (Hpp_inv[:, 2, 1] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(Hpp_inv[:, 2, 2] - l31 * l31 - l32 * l32,
                               1e-20))
    c0 = (Wcp1[..., 0] * l11[:, None, None]
          + Wcp1[..., 1] * l21[:, None, None]
          + Wcp1[..., 2] * l31[:, None, None])
    c1 = (Wcp1[..., 1] * l22[:, None, None]
          + Wcp1[..., 2] * l32[:, None, None])
    c2 = Wcp1[..., 2] * l33[:, None, None]
    Yc = jnp.stack([c0, c1, c2], axis=-1)
    Yr = Yc.transpose(0, 3, 1, 2).reshape(P * 3, L * 6)
    S = -Yr.T @ Yr
    Wr_flat = Wcp1.transpose(0, 3, 1, 2).reshape(P * 3, L * 6)
    bp3 = bp1.reshape(P, 3)
    hb = jnp.einsum("pij,pj->pi", Hpp_inv, bp3)
    li = jnp.arange(L)
    S = S.reshape(L, 6, L, 6)
    S = S.at[li, :, li, :].add(Hcc_d)
    S = S.reshape(L * 6, L * 6)
    free6 = jnp.repeat(prob.kf_free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    rhs = bc1.reshape(L * 6) - Wr_flat.T @ hb.reshape(P * 3)
    rhs = jnp.where(free6, rhs, 0.0)
    dxc = -jnp.linalg.solve(S, rhs)
    dxc = jnp.where(free6, dxc, 0.0).reshape(L, 6)
    WTdx = (Wr_flat @ dxc.reshape(L * 6)).reshape(P, 3)
    dp = -jnp.einsum("pij,pj->pi", Hpp_inv, bp3 + WTdx)
    return dxc, dp * prob.mp_valid[:, None]


def real_iter(c):
    kf_Tcw, mp_pos, lam = c
    lin = linearize(kf_Tcw, mp_pos)
    dxc, dp = solve_on(lin, lam)
    kf_new = jax.vmap(lambda d, T: se3.exp(d) @ T)(dxc, kf_Tcw)
    return (kf_new, mp_pos + dp * 1e-6, lam * 1.0000001)

amortized("REAL iter: linearize+solve+apply (fori)", real_iter,
          (prob.kf_Tcw, prob.mp_pos, jnp.asarray(1e-4, dtype)), reps=12)


# 5. same REAL iter inside a lax.while_loop with an iteration counter —
# isolates while_loop-specific carry/layout overhead vs fori
def wl_step(c):
    kf0, mp0, lam0, acc = c

    def cond_fn(s):
        return s[0] < 12

    def body_fn(s):
        it, kf_Tcw, mp_pos, lam = s
        kf_new, mp_new, lam_new = real_iter((kf_Tcw, mp_pos, lam))
        return (it + 1, kf_new, mp_new, lam_new)

    _, kfn, mpn, lamn = jax.lax.while_loop(
        cond_fn, body_fn, (jnp.asarray(0, jnp.int32), kf0, mp0, lam0))
    return (kf0 + 1e-30 * kfn, mp0 + 1e-30 * mpn, lam0,
            acc + 1e-30 * jnp.sum(kfn))

t12 = amortized("12x REAL iter in while_loop", wl_step,
                (prob.kf_Tcw, prob.mp_pos, jnp.asarray(1e-4, dtype),
                 jnp.zeros((), dtype)), reps=3)
print(f"  -> per while_loop iteration: {t12 / 12:.3f} ms", flush=True)
