"""Numerical parity: our f64 JAX core vs the COMPILED reference MSCKF.

Generates a deterministic synthetic sequence, feeds the identical inputs to
(a) the reference `MSCKF<double>` compiled unmodified from
    /root/reference/include (see main.cpp / build.sh), and
(b) our f64 filter in strict-reference configuration (sequential updates,
    anisotropic R_o, chi2 off-by-one),
then diffs the per-frame IMU state, camera window, and full covariance
(ours permuted to the reference's cam-state order by state_id).

Writes REF_PARITY.json at the repo root.

Usage: python tools/ref_harness/run_parity.py [--frames 60] [--rebuild]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from msckf_mono_tpu.core import filter as mf  # noqa: E402
from msckf_mono_tpu.core.init import ground_truth_init  # noqa: E402
from msckf_mono_tpu.core.types import init_filter_state  # noqa: E402
from msckf_mono_tpu.data import synthetic  # noqa: E402
from msckf_mono_tpu.utils.config import MsckfConfig  # noqa: E402

MAGIC = 20260821.0


def write_input(path, cfg: MsckfConfig, seq, init_q, init_p, init_v):
    cam = cfg.camera
    T, K, _ = seq.imu_omega.shape
    F = seq.tracked_uv.shape[1]
    out = [MAGIC, T, K, F]
    out += [cam.f_u, cam.f_v, cam.c_u, cam.c_v]
    out += list(cam.q_CI) + list(cam.p_C_I)
    out += [cfg.u_var_prime, cfg.v_var_prime]
    out += cfg.q_imu_diag() + cfg.initial_imu_covar_diag()
    f = cfg.filter
    out += [
        cfg.max_gn_cost_norm, f.translation_threshold,
        f.redundancy_angle_thresh, f.redundancy_distance_thresh,
        f.min_track_length, f.max_track_length, f.max_cam_states,
    ]
    out += list(init_q) + list(init_p) + list(init_v)
    out += list(seq.b_g) + list(seq.b_a) + [0.0, 0.0, -9.81]
    head = np.asarray(out, np.float64)

    per_frame = []
    for t in range(T):
        imu = np.concatenate(
            [seq.imu_omega[t], seq.imu_acc[t], seq.imu_dt[t][:, None]], axis=1
        )  # (K, 7)
        trk = np.concatenate(
            [seq.tracked_uv[t], seq.tracked_ids[t][:, None].astype(np.float64),
             seq.tracked_valid[t][:, None].astype(np.float64)], axis=1
        )  # (F, 4)
        new = np.concatenate(
            [seq.new_uv[t], seq.new_ids[t][:, None].astype(np.float64),
             seq.new_valid[t][:, None].astype(np.float64)], axis=1
        )
        per_frame.append(np.concatenate(
            [imu.ravel(), trk.ravel(), new.ravel(), [seq.time[t]]]
        ))
    blob = np.concatenate([head] + per_frame)
    blob.astype("<f8").tofile(path)


def read_output(path):
    """Parse the multi-record stream: stages 0/1/2 are full state dumps
    (post-marginalize / post-pruneRedundant / post-pruneEmpty), stage 3 is
    the redundant-selection id list."""
    buf = np.fromfile(path, dtype="<f8")
    c = 0
    recs = []
    while c < len(buf):
        frame = int(buf[c]); stage = int(buf[c + 1]); c += 2
        if stage == 3:
            n = int(buf[c]); c += 1
            recs.append(dict(frame=frame, stage=3,
                             rm_ids=buf[c : c + n].astype(int)))
            c += n
            continue
        if stage == 5:
            n = int(buf[c]); c += 1
            cand = buf[c : c + 3 * n].reshape(n, 3); c += 3 * n
            recs.append(dict(frame=frame, stage=5, cand=cand,
                             map_size=int(buf[c]), n_resid=int(buf[c + 1])))
            c += 2
            continue
        if stage == 6:
            recs.append(dict(frame=frame, stage=6,
                             map_size=int(buf[c]), n_resid=int(buf[c + 1])))
            c += 2
            continue
        if stage == 7:
            n = int(buf[c]); c += 1
            tracks = buf[c : c + 8 * n].reshape(n, 8); c += 8 * n
            recs.append(dict(frame=frame, stage=7, tracks=tracks))
            continue
        if stage == 11:
            recs.append(dict(frame=frame, stage=11, p=buf[c : c + 3]))
            c += 3
            continue
        if stage == 10:
            recs.append(dict(frame=frame, stage=10,
                             leftover_resid=int(buf[c]),
                             leftover_remove=int(buf[c + 1])))
            c += 2
            continue
        if stage == 8:
            rows_n = int(buf[c]); D = int(buf[c + 1]); c += 2
            H = buf[c : c + rows_n * D].reshape(rows_n, D); c += rows_n * D
            r = buf[c : c + rows_n]; c += rows_n
            R = buf[c : c + rows_n * rows_n].reshape(rows_n, rows_n)
            c += rows_n * rows_n
            recs.append(dict(frame=frame, stage=8, H=H, r=r, R=R))
            continue
        N = int(buf[c]); c += 1
        imu = buf[c : c + 16]; c += 16
        cams = buf[c : c + 8 * N].reshape(N, 8); c += 8 * N
        D = 15 + 6 * N
        P = buf[c : c + D * D].reshape(D, D); c += D * D
        recs.append(
            dict(frame=frame, stage=stage, N=N, q=imu[0:4], p=imu[4:7],
                 v=imu[7:10], b_g=imu[10:13], b_a=imu[13:16],
                 cam_ids=cams[:, 0].astype(int), cam_q=cams[:, 1:5],
                 cam_p=cams[:, 5:8], P=P)
        )
    assert c == len(buf), (c, len(buf))
    return recs


def _snapshot(state):
    w = state.window
    return dict(
        q=np.asarray(state.imu.q_IG), p=np.asarray(state.imu.p_I_G),
        v=np.asarray(state.imu.v_I_G), b_g=np.asarray(state.imu.b_g),
        b_a=np.asarray(state.imu.b_a),
        slot_valid=np.asarray(w.valid), slot_ids=np.asarray(w.state_id),
        cam_q=np.asarray(w.q_CG), cam_p=np.asarray(w.p_C_G),
        P=np.asarray(state.P),
    )


def _inject_ref_state(state, ref_rec):
    """Overwrite our imu/window/P with the reference's dumped state (permuted
    into our slot layout by state_id). Used to measure the finish() TRANSFER
    FUNCTION on identical inputs, isolating it from the ~5e-6 compounded
    per-frame drift (which a near-threshold chi2 gate can amplify
    discretely)."""
    import jax.numpy as jnp

    w = state.window
    slot_ids = np.asarray(w.state_id)
    slot_valid = np.asarray(w.valid)
    slot_of = {int(s): i for i, s in enumerate(slot_ids) if slot_valid[i]}

    q_CG = np.asarray(w.q_CG).copy()
    p_C_G = np.asarray(w.p_C_G).copy()
    idx = list(range(15))
    for j, sid in enumerate(ref_rec["cam_ids"]):
        s = slot_of[int(sid)]
        q_CG[s] = ref_rec["cam_q"][j]
        p_C_G[s] = ref_rec["cam_p"][j]
        idx += list(range(15 + 6 * s, 15 + 6 * s + 6))
    idx = np.asarray(idx)
    P = np.asarray(state.P).copy()
    P[np.ix_(idx, idx)] = ref_rec["P"]

    imu = state.imu.replace(
        q_IG=jnp.asarray(ref_rec["q"]), p_I_G=jnp.asarray(ref_rec["p"]),
        v_I_G=jnp.asarray(ref_rec["v"]), b_g=jnp.asarray(ref_rec["b_g"]),
        b_a=jnp.asarray(ref_rec["b_a"]),
    )
    return state.replace(
        imu=imu, P=jnp.asarray(P),
        window=w.replace(q_CG=jnp.asarray(q_CG), p_C_G=jnp.asarray(p_C_G)),
    )


def run_ours(cfg: MsckfConfig, seq, init_q, init_p, init_v, ref_final=None):
    """Run the per-frame pipeline split at the same stage boundaries the C++
    harness dumps at. Returns {(frame, stage): snapshot, (frame, 3): rm ids}.

    ``ref_final``: the reference's last post-pruneEmpty dump; when given, the
    finish() stage starts from IT rather than our own accumulated state."""
    from msckf_mono_tpu.core import augment as aug_mod
    from msckf_mono_tpu.core import prune as prune_mod
    from msckf_mono_tpu.core import tracks as tracks_mod
    from msckf_mono_tpu.core import update as upd_mod

    imu = ground_truth_init(
        p_I_G=list(init_p), q_IG=list(init_q), v_I_G=list(init_v),
        b_g=seq.b_g, b_a=seq.b_a, dtype=jnp.float64,
    )
    state = init_filter_state(cfg, imu, dtype=jnp.float64)
    frames = synthetic.to_frame_inputs(seq, jnp.float64)
    prec = cfg.filter.matmul_precision

    @jax.jit
    def stage_a(s, f):
        with jax.default_matmul_precision(prec):
            s = mf.propagate_block(s, f, cfg)
            s = aug_mod.augment_state(s, f.state_id, f.time, cfg)
            s, staged = tracks_mod.update_tracks(
                s, f.tracked_uv, f.tracked_ids, f.tracked_valid, cfg
            )
            s = tracks_mod.add_features(s, f.new_uv, f.new_ids, f.new_valid, cfg)
            s = upd_mod.marginalize(s, staged, cfg)
        return s

    @jax.jit
    def stage_b(s):
        with jax.default_matmul_precision(prec):
            return prune_mod.prune_redundant_states(s, cfg)

    @jax.jit
    def stage_c(s):
        with jax.default_matmul_precision(prec):
            return prune_mod.prune_empty_states(s, cfg)

    @jax.jit
    def rm_sel(s):
        run = s.window.count >= 20
        return prune_mod.find_redundant_slots(s, cfg) & run

    T = seq.imu_omega.shape[0]
    recs = {}
    for t in range(T):
        f_t = jax.tree_util.tree_map(lambda x: x[t], frames)
        state = stage_a(state, f_t)
        recs[(t, 0)] = _snapshot(state)
        rm = np.asarray(rm_sel(state))
        sids = np.asarray(state.window.state_id)
        recs[(t, 3)] = np.sort(sids[rm & np.asarray(state.window.valid)])
        state = stage_b(state)
        recs[(t, 1)] = _snapshot(state)
        state = stage_c(state)
        recs[(t, 2)] = _snapshot(state)

    # End-of-sequence finish (msckf.h:765-807): the reference residualizes
    # ALL remaining eligible tracks in ONE stacked marginalize, so run our
    # finish with max_staged = max_tracks (a single pass == a single update).
    cfg_fin = dataclasses.replace(
        cfg, shapes=dataclasses.replace(cfg.shapes, max_staged=cfg.shapes.max_tracks)
    )
    if ref_final is not None:
        state = _inject_ref_state(state, ref_final)
    tr = state.tracks
    act = np.asarray(tr.active)
    recs[(T - 1, 5)] = dict(
        ids=np.asarray(tr.feature_id)[act],
        nobs=np.asarray(jnp.sum(tr.obs_mask, axis=1))[act],
        n_resid=int(state.num_residualized),
    )
    # per-track finish diagnostics (mirrors the C++ stage-7 probe): stage the
    # same single pass finish() will run and record motion/tri/gate verdicts
    from msckf_mono_tpu.core import update as upd_mod

    w_rows = cfg_fin.shapes.max_staged * (2 * cfg_fin.shapes.num_slots - 3)
    cfg_diag = dataclasses.replace(
        cfg_fin, shapes=dataclasses.replace(cfg_fin.shapes, max_update_rows=w_rows)
    )
    with jax.default_matmul_precision(cfg.filter.matmul_precision):
        st2, staged_d, _ = mf._stage_pass(state, cfg_diag)
        p_f_d, track_ok_d, motion_d, tri_d = upd_mod.marginalize_prep(
            st2, staged_d, cfg_diag)
        out_d = upd_mod.gated_row_stack(
            staged_d.obs, staged_d.obs_mask, p_f_d, track_ok_d, st2.window,
            st2.imu.g, st2.P, state.meas_sigma2.astype(jnp.float64), cfg_diag,
            m_cap=None,
        )
    sv = np.asarray(staged_d.valid)
    recs[(T - 1, 7)] = dict(
        ids=np.asarray(staged_d.feature_id)[sv],
        motion=np.asarray(motion_d)[sv], tri=np.asarray(tri_d)[sv],
        gate=np.asarray(out_d[2])[sv],
        nobs=np.asarray(jnp.sum(staged_d.obs_mask, axis=1))[sv],
        pf=np.asarray(p_f_d)[sv],
    )

    state, fpts, fmask = jax.jit(
        lambda s: mf.finish(s, cfg_fin, collect_map=True)
    )(state)
    recs[(T - 1, 6)] = dict(
        n_resid=int(state.num_residualized), n_map=int(np.asarray(fmask).sum())
    )
    recs[(T - 1, 4)] = _snapshot(state)
    # Stage 9 is the reference's finish with its p_f_G_vec misalignment bug
    # corrected (see main.cpp); our finish state is compared against BOTH —
    # stage 9 measures transfer-function parity, stage 4 documents the bug.
    recs[(T - 1, 9)] = recs[(T - 1, 4)]
    return recs


def quat_diff(a, b):
    """Angle-style diff tolerant to q/-q sign."""
    return min(float(np.abs(a - b).max()), float(np.abs(a + b).max()))


def compare(ref_recs, our_recs):
    rows = []
    for ref in ref_recs:
        key = (ref["frame"], ref["stage"])
        if ref["stage"] in (8, 11):
            continue  # analyzed by tools/ref_harness/finish_algebra.py
        if ref["stage"] == 10:
            rows.append(dict(frame=ref["frame"], stage=10,
                             leftover_resid=ref["leftover_resid"],
                             leftover_remove=ref["leftover_remove"]))
            continue
        if ref["stage"] == 7:
            ours = our_recs.get(key, {})
            our_by_id = {int(i): (bool(m), bool(tv), bool(g), int(n), pf)
                         for i, m, tv, g, n, pf in zip(
                             ours.get("ids", []), ours.get("motion", []),
                             ours.get("tri", []), ours.get("gate", []),
                             ours.get("nobs", []), ours.get("pf", []))}
            mism = []
            pf_diffs = []
            for rec7 in ref["tracks"]:
                fid, mo, tv, ga, nob = rec7[:5]
                pf_ref = rec7[5:8]
                o = our_by_id.get(int(fid))
                # effective verdict: does the track contribute rows?
                r_used = bool(mo and tv and ga)
                if o is None:
                    mism.append(dict(id=int(fid), ref_used=r_used, ours=None))
                    continue
                o_used = bool(o[0] and o[1] and o[2])
                if o_used != r_used:
                    mism.append(dict(id=int(fid), ref_used=r_used,
                                     ours=(o[0], o[1], o[2])))
                if r_used and o_used:
                    pf_diffs.append(
                        (float(np.abs(np.asarray(pf_ref) - o[4]).max()), int(fid)))
            pf_diffs.sort(reverse=True)
            rows.append(dict(frame=ref["frame"], stage=7,
                             n_ref=len(ref["tracks"]), n_ours=len(our_by_id),
                             verdict_mismatches=mism,
                             max_pf_diff=pf_diffs[0] if pf_diffs else None,
                             top_pf_diffs=pf_diffs[:5]))
            continue
        if ref["stage"] in (5, 6):
            ours = our_recs.get(key, {})
            row = dict(frame=ref["frame"], stage=ref["stage"],
                       ref_n_resid=ref["n_resid"],
                       our_n_resid=ours.get("n_resid"))
            if ref["stage"] == 5:
                ref_ids = set(int(i) for i in ref["cand"][:, 0])
                our_ids = set(int(i) for i in ours.get("ids", []))
                row.update(
                    ref_cand=sorted((int(i), int(n), int(m))
                                    for i, n, m in ref["cand"]),
                    our_cand=sorted(zip(map(int, ours.get("ids", [])),
                                        map(int, ours.get("nobs", [])))),
                    ids_match=ref_ids == our_ids,
                )
            else:
                row["ref_map_size"] = ref["map_size"]
                row["our_n_map"] = ours.get("n_map")
            rows.append(row)
            continue
        if ref["stage"] == 3:
            ours_rm = our_recs.get(key)
            match = np.array_equal(np.sort(ref["rm_ids"]), ours_rm)
            rows.append(dict(frame=ref["frame"], stage=3,
                             rm_match=bool(match),
                             ref_rm=ref["rm_ids"].tolist(),
                             our_rm=np.asarray(ours_rm).tolist()))
            continue
        ours = our_recs[key]
        N = ref["N"]
        # map reference cam order -> our slots by state_id
        slot_of = {int(sid): i for i, sid in enumerate(ours["slot_ids"])
                   if ours["slot_valid"][i]}
        n_matched = sum(1 for sid in ref["cam_ids"] if int(sid) in slot_of)
        row = dict(
            frame=ref["frame"], stage=ref["stage"], N_ref=N,
            N_ours=int(ours["slot_valid"].sum()), n_matched=n_matched,
            dq=quat_diff(ref["q"], ours["q"]),
            dp=float(np.abs(ref["p"] - ours["p"]).max()),
            dv=float(np.abs(ref["v"] - ours["v"]).max()),
            dbg=float(np.abs(ref["b_g"] - ours["b_g"]).max()),
            dba=float(np.abs(ref["b_a"] - ours["b_a"]).max()),
        )
        if n_matched == N and N == int(ours["slot_valid"].sum()):
            dcq = max(
                quat_diff(ref["cam_q"][j], ours["cam_q"][slot_of[int(sid)]])
                for j, sid in enumerate(ref["cam_ids"])
            )
            dcp = max(
                float(np.abs(ref["cam_p"][j] - ours["cam_p"][slot_of[int(sid)]]).max())
                for j, sid in enumerate(ref["cam_ids"])
            )
            # permute our P into reference order
            idx = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]
            for sid in ref["cam_ids"]:
                s = slot_of[int(sid)]
                idx += list(range(15 + 6 * s, 15 + 6 * s + 6))
            idx = np.asarray(idx)
            P_ours = ours["P"][np.ix_(idx, idx)]
            dP = np.abs(P_ours - ref["P"])
            scale = np.abs(ref["P"]).max()
            row.update(
                dcam_q=dcq, dcam_p=dcp,
                dP_max=float(dP.max()), dP_rel=float(dP.max() / scale),
            )
        rows.append(row)
    return rows


def parity_config() -> MsckfConfig:
    """Strict-reference configuration with drop-nothing capacities."""
    cfg = MsckfConfig()
    cfg = dataclasses.replace(
        cfg,
        filter=dataclasses.replace(
            cfg.filter,
            use_anisotropic_r=True,   # the reference's exact R_o
            use_qr_compression=True,  # the reference's T_H compression
            fused_updates=False,      # strict sequential stage order
            use_prune_redundant=True,
            chi2_offbyone=True,
        ),
        # Drop-nothing capacities: the reference has no static buffers, so a
        # parity run must never hit the serving-config caps (the first-prune
        # burst LM-triangulates every involved live track at once).
        shapes=dataclasses.replace(
            cfg.shapes,
            max_staged=32,
            max_staged_prune=128,
            max_tri_prune=128,
            max_update_rows=2048,
            staged_chunk=8,
        ),
    )
    return cfg


def run_parity(frames=24, noise=0.5, isotropic=False, rebuild=False):
    """Build (if needed), run both sides, compare. Returns (summary, rows)."""
    exe = os.path.join(HERE, "ref_harness")
    if rebuild or not os.path.exists(exe):
        subprocess.run([os.path.join(HERE, "build.sh")], check=True)

    cfg = parity_config()
    if isotropic:
        cfg = dataclasses.replace(
            cfg,
            camera=dataclasses.replace(cfg.camera, f_v=cfg.camera.f_u),
            filter=dataclasses.replace(cfg.filter, use_anisotropic_r=False),
        )
    seq = synthetic.generate(cfg, n_frames=frames, seed=7, pixel_noise=noise)
    init_q = [1.0, 0.0, 0.0, 0.0]
    init_p = [5.0, 0.0, 0.0]
    init_v = [0.0, 5.0 * 0.35, 0.2 * 1.4]

    inp = os.path.join(HERE, "input.bin")
    outp = os.path.join(HERE, "output.bin")
    write_input(inp, cfg, seq, init_q, init_p, init_v)
    subprocess.run([exe, inp, outp], check=True)
    ref_recs = read_output(outp)

    # finish() runs from the reference's own dumped pre-finish state: the
    # per-frame rows below measure compounded drift; the finish row measures
    # the finish transfer function on identical inputs (a near-threshold
    # chi2 gate would otherwise amplify the ~1e-6 drift discretely).
    ref_final = max(
        (r for r in ref_recs if r.get("stage") == 2), key=lambda r: r["frame"]
    )
    our_recs = run_ours(cfg, seq, init_q, init_p, init_v, ref_final=ref_final)
    rows = compare(ref_recs, our_recs)

    state_rows = [r for r in rows if r.get("stage") in (0, 1, 2)]
    finish_rows = [r for r in rows if r.get("stage") == 9]
    finish_buggy = [r for r in rows if r.get("stage") == 4]
    summary = {
        "frames": frames,
        "pixel_noise": noise,
        "final": state_rows[-1],
        "finish": finish_rows[-1] if finish_rows else None,
        "finish_vs_buggy_cpp": finish_buggy[-1] if finish_buggy else None,
        "finish_note": (
            "'finish' diffs our finish() against the reference's OWN "
            "measurementUpdate on the correctly-assembled finish system "
            "(main.cpp stage 9). The reference's as-written finish() "
            "('finish_vs_buggy_cpp') hits a latent marginalize() bug: "
            "motion-rejected tracks skip p_f_G_vec.push_back but not "
            "valid_tracks.push_back (msckf.h:352-374), so every later track "
            "residualizes against the wrong — eventually out-of-bounds — "
            "triangulated point; its output varies ~0.1 m with heap layout "
            "(finish_algebra.py documents the three-way bisection). "
            "We deliberately do not replicate the misalignment."),
        "max_dp": max(r["dp"] for r in state_rows),
        "max_dq": max(r["dq"] for r in state_rows),
        "max_dP_rel": max((r.get("dP_rel", float("nan")) for r in state_rows)),
        "all_windows_matched": all(
            r["n_matched"] == r["N_ref"] == r["N_ours"] for r in state_rows
        ),
        "all_rm_selections_matched": all(
            r["rm_match"] for r in rows if r.get("stage") == 3
        ),
    }
    return summary, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--noise", type=float, default=0.5)
    ap.add_argument("--isotropic", action="store_true",
                    help="force v_var_prime = u_var_prime on BOTH sides "
                         "(isolates the QR-compression/anisotropic-R gap)")
    args = ap.parse_args()

    summary, rows = run_parity(args.frames, args.noise, args.isotropic,
                               args.rebuild)

    stage_name = {0: "marg", 1: "pruneR", 2: "pruneE", 3: "rmsel",
                  4: "finish(cpp-bug)", 9: "finish"}
    for r in rows:
        if r.get("stage") == 3:
            if not r["rm_match"]:
                print(f"f{r['frame']:3d} rmsel MISMATCH ref={r['ref_rm']} ours={r['our_rm']}")
            continue
        if r.get("stage") == 5:
            print(f"f{r['frame']:3d} finish-cand ids_match={r['ids_match']} "
                  f"ref={r['ref_cand']} ours={r['our_cand']}")
            continue
        if r.get("stage") == 6:
            print(f"f{r['frame']:3d} finish-post ref_resid={r['ref_n_resid']} "
                  f"our_resid={r['our_n_resid']} our_map={r['our_n_map']}")
            continue
        if r.get("stage") == 10:
            print(f"f{r['frame']:3d} finish-leftovers resid={r['leftover_resid']} "
                  f"remove={r['leftover_remove']} (cleared by harness; "
                  f"reference finish() would double-apply these)")
            continue
        if r.get("stage") == 7:
            print(f"f{r['frame']:3d} finish-tracks n={r['n_ref']}/{r['n_ours']} "
                  f"verdict_mismatches={r['verdict_mismatches']} "
                  f"top_pf_diffs={r['top_pf_diffs']}")
            continue
        print(
            f"f{r['frame']:3d} {stage_name[r['stage']]:6s} "
            f"N={r['N_ref']}/{r['N_ours']} m={r['n_matched']} "
            f"dq={r['dq']:.2e} dp={r['dp']:.2e} dv={r['dv']:.2e} "
            + (f"dcp={r.get('dcam_p'):.2e} dP_rel={r.get('dP_rel'):.2e}"
               if "dP_rel" in r else "WINDOW MISMATCH")
        )

    with open(os.path.join(REPO, "REF_PARITY.json"), "w") as f:
        json.dump({"summary": summary, "per_frame": rows}, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
