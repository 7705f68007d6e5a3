"""Diff update ALGEBRAS on the reference's own stacked finish inputs.

run_parity.py found: per-frame parity <=5e-6, identical finish candidate
sets/gates, p_f agreement at 1e-14 — yet post-finish states differ by
~0.2 m. This script isolates why: it takes the reference's exact stacked
(H_o, r_o, R_o) (stage-8 dump) and pre-finish covariance (stage-2 dump) and
computes the measurement update THREE ways in numpy f64:

  A. the reference's exact formula (HouseholderQR -> T_H/Q_1 -> explicit
     temp.inverse(), msckf.h:1325-1423);
  B. direct Cholesky on the UNcompressed system (our serving path's algebra);
  C. compressed + Cholesky solve (our parity path's algebra).

If A/B/C agree with each other but not with the C++ post-finish dump, the
C++ run itself is unstable; if they disagree with each other at ~0.2, the
stacked system is numerically degenerate and ANY implementation's finish
output is ill-determined beyond the agreeing subspace.

Run AFTER run_parity.py (consumes its output.bin):
    python tools/ref_harness/finish_algebra.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from run_parity import read_output  # noqa: E402


def build_update_quat(dq):
    v = 0.5 * np.asarray(dq)
    n2 = float(v @ v)
    if n2 > 1.0:
        q = np.array([1.0, *v]) / np.sqrt(1.0 + n2)
    else:
        q = np.array([np.sqrt(1.0 - n2), *v])
    return q / np.linalg.norm(q)


def apply_delta(rec, dX):
    """Position-only application for comparison purposes."""
    return rec["p"] + dX[12:15]


def ref_formula(P, H, r, R):
    Q, Rq = np.linalg.qr(H, mode="complete")
    nz = np.abs(Rq).max(axis=1) > 0.0
    T_H = Rq[nz]
    Q1 = Q[:, nz]
    r_n = Q1.T @ r
    R_n = Q1.T @ R @ Q1
    temp = T_H @ P @ T_H.T + R_n
    K = (P @ T_H.T) @ np.linalg.inv(temp)
    dX = K @ r_n
    IKH = np.eye(P.shape[0]) - K @ T_H
    P_new = IKH @ P @ IKH.T + K @ R_n @ K.T
    return dX, 0.5 * (P_new + P_new.T), np.linalg.cond(temp)


def direct_formula(P, H, r, R):
    S = H @ P @ H.T + R
    K = np.linalg.solve(S, H @ P).T
    dX = K @ r
    IKH = np.eye(P.shape[0]) - K @ H
    P_new = IKH @ P @ IKH.T + K @ R @ K.T
    return dX, 0.5 * (P_new + P_new.T), np.linalg.cond(S)


def main():
    recs = read_output(os.path.join(HERE, "output.bin"))
    pre = max((x for x in recs if x.get("stage") == 2), key=lambda x: x["frame"])
    post = [x for x in recs if x.get("stage") == 4][0]
    s8 = [x for x in recs if x.get("stage") == 8][0]
    H, r, R = s8["H"], s8["r"], s8["R"]
    P = pre["P"]
    print(f"stacked rows={H.shape[0]} D={H.shape[1]} rank(H)={np.linalg.matrix_rank(H)}")
    w = np.linalg.eigvalsh(P)
    print(f"P eigs: min={w.min():.2e} max={w.max():.2e}")

    dA, PA, cA = ref_formula(P, H, r, R)
    dB, PB, cB = direct_formula(P, H, r, R)
    print(f"cond(temp)={cA:.2e}  cond(S)={cB:.2e}")
    print(f"|dA - dB|_inf = {np.abs(dA - dB).max():.3e}   (A=ref formula, B=direct)")
    print(f"|PA - PB|_inf = {np.abs(PA - PB).max():.3e}")

    # compare numpy-A against the C++ post-finish dump (position block)
    pA = pre["p"] + dA[12:15]
    pB = pre["p"] + dB[12:15]
    print(f"C++ post p: {post['p']}")
    print(f"numpy A  p: {pA}   |diff| {np.abs(pA - post['p']).max():.3e}")
    print(f"numpy B  p: {pB}   |diff| {np.abs(pB - post['p']).max():.3e}")
    print(f"C++ finish delta |p|: {np.abs(post['p'] - pre['p']).max():.3e}")
    s9 = [x for x in recs if x.get("stage") == 9]
    if s9:
        p9 = s9[0]["p"]
        print(f"C++ measurementUpdate(probe-stacked) p: {p9}")
        print(f"  vs numpy A: {np.abs(p9 - pA).max():.3e}"
              f"   vs C++ finish: {np.abs(p9 - post['p']).max():.3e}")
    s11 = [x for x in recs if x.get("stage") == 11]
    if s11:
        p11 = s11[0]["p"]
        print(f"C++ marginalize(replicated candidates) p: {p11}")
        print(f"  vs numpy A: {np.abs(p11 - pA).max():.3e}"
              f"   vs C++ finish: {np.abs(p11 - post['p']).max():.3e}")


if __name__ == "__main__":
    main()
