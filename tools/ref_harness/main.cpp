// Numerical-parity harness around the UNMODIFIED reference MSCKF header.
//
// This compiles /root/reference/include/msckf_mono/msckf.h (header-only,
// ROS-free C++14 — README.md:47-49) against the Eigen headers shipped inside
// the tensorflow wheel and a 30-line chi-squared stub (stub/boost/...), runs
// the exact asl_msckf per-frame pipeline (augment -> update -> addFeatures ->
// marginalize -> pruneRedundant -> pruneEmpty; datasets/asl_msckf.cpp:268-296)
// on a synthetic input dump, and writes per-frame state + full covariance for
// tools/ref_harness/run_parity.py to diff against our f64 JAX core.
//
// The reference code itself is NOT copied — it is #included from
// /root/reference at build time, for testing only. `#define private public`
// exposes the covariance blocks (no getters exist for them).
//
// Input binary (little-endian float64 stream, layout produced by
// run_parity.py):
//   magic, T, K, F
//   camera:  f_u f_v c_u c_v  q_CI(wxyz) p_C_I           [11]
//   noise:   u_var' v_var'  q_imu_diag[12] init_covar_diag[15]   [29]
//   params:  max_gn_cost_norm transl_thresh red_angle red_dist
//            min_track_len max_track_len max_cam_states   [7]
//   init:    q_IG(wxyz) p v b_g b_a g                     [19]
//   per frame: K*[omega(3) acc(3) dT]  F*[u v id valid]tracked
//              F*[u v id valid]new  time
//
// Output binary per frame:
//   frame, N, imu{q(wxyz) p v b_g b_a}[16], N*{state_id q(wxyz) p}[8],
//   P[(15+6N)^2] assembled [imu_covar imu_cam; imu_cam^T cam_covar]

#include <cstdio>
#include <cstdlib>
#include <vector>

#include <Eigen/Core>
// The reference writes `VectorX<_S> nonZeroRows = R.rowwise().any();`
// (msckf.h:1347) — a bool->double coefficient assignment that the Eigen the
// project was built against accepted implicitly. Modern Eigen requires the
// mixed pair to be sanctioned via ScalarBinaryOpTraits; this restores the
// historical semantics (bool 0/1 -> double) without touching the reference.
namespace Eigen {
template <>
struct ScalarBinaryOpTraits<double, bool, internal::assign_op<double, bool>> {
  typedef double ReturnType;
};
template <>
struct ScalarBinaryOpTraits<float, bool, internal::assign_op<float, bool>> {
  typedef float ReturnType;
};
}  // namespace Eigen

#define private public
#include <msckf_mono/msckf.h>
#undef private

using S = double;

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s input.bin output.bin\n", argv[0]);
    return 2;
  }
  FILE* fin = std::fopen(argv[1], "rb");
  if (!fin) { std::perror("input"); return 2; }
  std::fseek(fin, 0, SEEK_END);
  long nbytes = std::ftell(fin);
  std::fseek(fin, 0, SEEK_SET);
  std::vector<double> buf(nbytes / 8);
  if (std::fread(buf.data(), 8, buf.size(), fin) != buf.size()) return 2;
  std::fclose(fin);

  size_t c = 0;
  auto next = [&]() { return buf.at(c++); };

  if (next() != 20260821.0) { std::fprintf(stderr, "bad magic\n"); return 2; }
  const int T = (int)next(), K = (int)next(), F = (int)next();

  msckf_mono::Camera<S> camera;
  camera.f_u = next(); camera.f_v = next();
  camera.c_u = next(); camera.c_v = next();
  camera.b = 0;
  { double w = next(), x = next(), y = next(), z = next();
    camera.q_CI = Eigen::Quaternion<S>(w, x, y, z); }
  camera.p_C_I << next(), next(), next();

  msckf_mono::noiseParams<S> noise;
  noise.u_var_prime = next(); noise.v_var_prime = next();
  noise.Q_imu.setZero();
  for (int i = 0; i < 12; i++) noise.Q_imu(i, i) = next();
  noise.initial_imu_covar.setZero();
  for (int i = 0; i < 15; i++) noise.initial_imu_covar(i, i) = next();

  msckf_mono::MSCKFParams<S> params;
  params.max_gn_cost_norm = next();
  params.translation_threshold = next();
  params.redundancy_angle_thresh = next();
  params.redundancy_distance_thresh = next();
  params.min_track_length = (int)next();
  params.max_track_length = (int)next();
  params.max_cam_states = (int)next();
  params.min_rcond = 3e-12;  // unused by the core (types.h:96)

  msckf_mono::imuState<S> init;
  { double w = next(), x = next(), y = next(), z = next();
    init.q_IG = Eigen::Quaternion<S>(w, x, y, z); }
  init.p_I_G << next(), next(), next();
  init.v_I_G << next(), next(), next();
  init.b_g << next(), next(), next();
  init.b_a << next(), next(), next();
  init.g << next(), next(), next();

  msckf_mono::MSCKF<S> msckf;
  msckf.initialize(camera, noise, params, init);

  FILE* fout = std::fopen(argv[2], "wb");
  if (!fout) { std::perror("output"); return 2; }
  auto w1 = [&](double v) { std::fwrite(&v, 8, 1, fout); };

  for (int t = 0; t < T; t++) {
    for (int k = 0; k < K; k++) {
      msckf_mono::imuReading<S> r;
      r.omega << next(), next(), next();
      r.a << next(), next(), next();
      r.dT = next();
      msckf.propagate(r);
    }
    std::vector<msckf_mono::Vector2<S>,
                Eigen::aligned_allocator<msckf_mono::Vector2<S>>> feats, nfeats;
    std::vector<size_t> ids, nids;
    for (int f = 0; f < F; f++) {
      double u = next(), v = next(), id = next(), valid = next();
      if (valid > 0.5) {
        feats.push_back(msckf_mono::Vector2<S>(u, v));
        ids.push_back((size_t)id);
      }
    }
    for (int f = 0; f < F; f++) {
      double u = next(), v = next(), id = next(), valid = next();
      if (valid > 0.5) {
        nfeats.push_back(msckf_mono::Vector2<S>(u, v));
        nids.push_back((size_t)id);
      }
    }
    double time = next();

    auto dump_obj = [&](msckf_mono::MSCKF<S>& m, int stage) {
      const int N = (int)m.cam_states_.size();
      w1(t); w1(stage); w1(N);
      const auto& imu = m.imu_state_;
      w1(imu.q_IG.w()); w1(imu.q_IG.x()); w1(imu.q_IG.y()); w1(imu.q_IG.z());
      for (int i = 0; i < 3; i++) w1(imu.p_I_G(i));
      for (int i = 0; i < 3; i++) w1(imu.v_I_G(i));
      for (int i = 0; i < 3; i++) w1(imu.b_g(i));
      for (int i = 0; i < 3; i++) w1(imu.b_a(i));
      for (int n = 0; n < N; n++) {
        const auto& cs = m.cam_states_[n];
        w1(cs.state_id);
        w1(cs.q_CG.w()); w1(cs.q_CG.x()); w1(cs.q_CG.y()); w1(cs.q_CG.z());
        for (int i = 0; i < 3; i++) w1(cs.p_C_G(i));
      }
      const int D = 15 + 6 * N;
      Eigen::Matrix<S, Eigen::Dynamic, Eigen::Dynamic> P(D, D);
      P.block(0, 0, 15, 15) = m.imu_covar_;
      if (N > 0) {
        P.block(0, 15, 15, 6 * N) = m.imu_cam_covar_;
        P.block(15, 0, 6 * N, 15) = m.imu_cam_covar_.transpose();
        P.block(15, 15, 6 * N, 6 * N) = m.cam_covar_;
      }
      for (int i = 0; i < D; i++)
        for (int j = 0; j < D; j++) w1(P(i, j));
    };
    auto dump = [&](int stage) { dump_obj(msckf, stage); };

    msckf.augmentState(t + 1, time);  // our FrameInput.state_id is 1-based
    msckf.update(feats, ids);
    msckf.addFeatures(nfeats, nids);
    msckf.marginalize();
    dump(0);
    // record the redundant-selection ids (findRedundantCamStates only reads)
    {
      std::vector<size_t> rm_ids;
      if (msckf.cam_states_.size() >= 20) msckf.findRedundantCamStates(rm_ids);
      w1(t); w1(3); w1((double)rm_ids.size());
      for (size_t id : rm_ids) w1((double)id);
    }
    msckf.pruneRedundantStates();
    dump(1);
    msckf.pruneEmptyStates();
    dump(2);

    // End-of-sequence force-residualization (msckf.h:765-807): run it LAST
    // so the per-frame pipeline above is untouched. Stage 4 records the
    // post-finish state for run_parity.py's finish diff.
    if (t == T - 1) {
      // Stage 5: read-only pre-finish candidate census — per live tracked
      // feature: id, observation count, #window states that saw it (the
      // `camStatesTemp.size()` that finish() gates on), then map_/counter.
      {
        w1(t); w1(5); w1((double)msckf.tracked_feature_ids_.size());
        for (size_t fid : msckf.tracked_feature_ids_) {
          double nobs = 0, ncs = 0;
          for (auto& ft : msckf.feature_tracks_)
            if (ft.feature_id == fid) { nobs = (double)ft.observations.size(); break; }
          for (auto& cs : msckf.cam_states_)
            for (auto id2 : cs.tracked_feature_ids)
              if (id2 == fid) ncs += 1;
          w1((double)fid); w1(nobs); w1(ncs);
        }
        w1((double)msckf.map_.size());
        w1((double)msckf.num_feature_tracks_residualized_);
      }
      // Stage 7: per-track finish instrumentation on a COPY of the filter —
      // replicate the finish()/marginalize() track loop read-only, calling
      // the reference's own building blocks, and dump each candidate's
      // (feature_id, motion_pass, tri_valid, gate_pass, nObs) so a gate
      // flip vs our side is directly visible.
      {
        msckf_mono::MSCKF<S> probe = msckf;
        std::vector<size_t> tids = probe.tracked_feature_ids_;
        std::vector<msckf_mono::featureTrackToResidualize<S>> cand;
        for (size_t i = 0; i < tids.size(); i++) {
          std::vector<msckf_mono::camState<S>> cst;
          std::vector<size_t> cidx;
          probe.removeTrackedFeature(tids[i], cst, cidx);
          if ((int)cst.size() >= (int)probe.msckf_params_.min_track_length) {
            msckf_mono::featureTrackToResidualize<S> tr;
            for (auto& ft : probe.feature_tracks_)
              if (ft.feature_id == tids[i]) {
                tr.feature_id = ft.feature_id;
                tr.observations = ft.observations;
                tr.initialized = ft.initialized;
                if (ft.initialized) tr.p_f_G = ft.p_f_G;
                break;
              }
            tr.cam_states = cst;
            tr.cam_state_indices = cidx;
            cand.push_back(tr);
          }
        }
        std::vector<double> rows;
        for (auto& tr : cand) {
          double motion = probe.checkMotion(tr.observations.front(),
                                            tr.cam_states) ? 1.0 : 0.0;
          msckf_mono::Vector3<S> pf;
          double isvalid = probe.initializePosition(tr.cam_states,
                                                    tr.observations, pf) ? 1.0 : 0.0;
          double gate = 0.0;
          if (motion > 0.5 && isvalid > 0.5) {
            msckf_mono::VectorX<S> r_j =
                probe.calcResidual(pf, tr.cam_states, tr.observations);
            msckf_mono::MatrixX<S> H_o_j, A_j;
            probe.calcMeasJacobian(pf, tr.cam_state_indices, H_o_j, A_j);
            msckf_mono::VectorX<S> r_o_j = A_j.transpose() * r_j;
            gate = probe.gatingTest(H_o_j, r_o_j,
                                    (int)tr.cam_states.size() - 1) ? 1.0 : 0.0;
          }
          rows.push_back((double)tr.feature_id);
          rows.push_back(motion);
          rows.push_back(isvalid);
          rows.push_back(gate);
          rows.push_back((double)tr.observations.size());
          rows.push_back(pf(0)); rows.push_back(pf(1)); rows.push_back(pf(2));
        }
        w1(t); w1(7); w1((double)(rows.size() / 8));
        for (double v : rows) w1(v);

        // Stage 8: the exact stacked update inputs finish() will feed to
        // measurementUpdate (replicates marginalize's stacking, gated) —
        // lets Python diff update ALGEBRAS on bit-identical H_o/r_o/R_o.
        {
          int total_nObs = 0, num_passed = 0;
          std::vector<int> use;
          std::vector<msckf_mono::Vector3<S>,
                      Eigen::aligned_allocator<msckf_mono::Vector3<S>>> pfs;
          for (auto& tr : cand) {
            bool motion = probe.checkMotion(tr.observations.front(), tr.cam_states);
            msckf_mono::Vector3<S> pf;
            bool isvalid = motion &&
                probe.initializePosition(tr.cam_states, tr.observations, pf);
            pfs.push_back(pf);
            use.push_back(isvalid ? 1 : 0);
            if (isvalid) { num_passed++; total_nObs += (int)tr.observations.size(); }
          }
          int D = 15 + 6 * (int)probe.cam_states_.size();
          msckf_mono::MatrixX<S> H_o =
              msckf_mono::MatrixX<S>::Zero(2 * total_nObs - 3 * num_passed, D);
          msckf_mono::MatrixX<S> R_o = msckf_mono::MatrixX<S>::Zero(
              2 * total_nObs - 3 * num_passed, 2 * total_nObs - 3 * num_passed);
          msckf_mono::VectorX<S> r_o(2 * total_nObs - 3 * num_passed);
          Eigen::Matrix<S, 2, 1> rep;
          rep << probe.noise_params_.u_var_prime, probe.noise_params_.v_var_prime;
          int sc = 0;
          for (size_t i2 = 0; i2 < cand.size(); i2++) {
            if (!use[i2]) continue;
            auto& tr = cand[i2];
            msckf_mono::VectorX<S> r_j =
                probe.calcResidual(pfs[i2], tr.cam_states, tr.observations);
            int nObs = (int)tr.observations.size();
            msckf_mono::MatrixX<S> R_j =
                (rep.replicate(nObs, 1)).asDiagonal();
            msckf_mono::MatrixX<S> H_o_j, A_j;
            probe.calcMeasJacobian(pfs[i2], tr.cam_state_indices, H_o_j, A_j);
            msckf_mono::VectorX<S> r_o_j = A_j.transpose() * r_j;
            msckf_mono::MatrixX<S> R_o_j = A_j.transpose() * R_j * A_j;
            if (probe.gatingTest(H_o_j, r_o_j, (int)tr.cam_states.size() - 1)) {
              r_o.segment(sc, r_o_j.size()) = r_o_j;
              H_o.block(sc, 0, H_o_j.rows(), H_o_j.cols()) = H_o_j;
              R_o.block(sc, sc, R_o_j.rows(), R_o_j.cols()) = R_o_j;
              sc += (int)H_o_j.rows();
            }
          }
          w1(t); w1(8); w1((double)sc); w1((double)D);
          for (int i2 = 0; i2 < sc; i2++)
            for (int j2 = 0; j2 < D; j2++) w1(H_o(i2, j2));
          for (int i2 = 0; i2 < sc; i2++) w1(r_o(i2));
          for (int i2 = 0; i2 < sc; i2++)
            for (int j2 = 0; j2 < sc; j2++) w1(R_o(i2, j2));

          // Stage 9: feed the correctly-stacked system to the reference's
          // OWN measurementUpdate on a fresh copy and dump the FULL state.
          // This is the reference's finish() transfer function with its
          // p_f_G_vec index-misalignment bug (msckf.h:352-374: motion-
          // rejected tracks skip the p_f_G_vec.push_back but not the
          // valid_tracks.push_back, so every later track residualizes
          // against the WRONG — eventually out-of-bounds — 3D point)
          // corrected; our finish() is compared against THIS.
          {
            msckf_mono::MSCKF<S> probe2 = msckf;
            H_o.conservativeResize(sc, Eigen::NoChange);
            r_o.conservativeResize(sc);
            R_o.conservativeResize(sc, sc);
            probe2.measurementUpdate(H_o, r_o, R_o);
            dump_obj(probe2, 9);
          }
        }
      }
      // Stage 11: push the replicated candidates through the reference's OWN
      // marginalize() on a fresh copy — bisects candidate construction vs
      // stacking/update as the source of the finish() divergence.
      {
        msckf_mono::MSCKF<S> probe3 = msckf;
        std::vector<size_t> tids3 = probe3.tracked_feature_ids_;
        for (size_t i = 0; i < tids3.size(); i++) {
          std::vector<msckf_mono::camState<S>> cst;
          std::vector<size_t> cidx;
          probe3.removeTrackedFeature(tids3[i], cst, cidx);
          if ((int)cst.size() >= (int)probe3.msckf_params_.min_track_length) {
            msckf_mono::featureTrackToResidualize<S> tr;
            for (auto& ft : probe3.feature_tracks_)
              if (ft.feature_id == tids3[i]) {
                tr.feature_id = ft.feature_id;
                tr.observations = ft.observations;
                tr.initialized = ft.initialized;
                if (ft.initialized) tr.p_f_G = ft.p_f_G;
                break;
              }
            tr.cam_states = cst;
            tr.cam_state_indices = cidx;
            probe3.feature_tracks_to_residualize_.push_back(tr);
          }
          probe3.tracks_to_remove_.push_back(tids3[i]);
        }
        probe3.marginalize();
        w1(t); w1(11);
        for (int i2 = 0; i2 < 3; i2++) w1(probe3.imu_state_.p_I_G(i2));
      }
      // Stage 10: leftover-residualize census, then CORRECT the precondition.
      // finish() (msckf.h:765-807) appends to feature_tracks_to_residualize_/
      // tracks_to_remove_, but those are only cleared at the START of the
      // next update() (msckf.h:218-219) — so a finish() after a frame whose
      // update residualized tracks RE-APPLIES those tracks' measurements,
      // with cam_state_indices left stale by pruneRedundantStates' state
      // erasure. Stage-9 proves measurementUpdate on the correctly-assembled
      // finish system matches the replication to 1e-6; the harness clears
      // the leftovers so the comparison tests finish() semantics, not the
      // double-apply bug (which we deliberately do not replicate).
      w1(t); w1(10);
      w1((double)msckf.feature_tracks_to_residualize_.size());
      w1((double)msckf.tracks_to_remove_.size());
      msckf.feature_tracks_to_residualize_.clear();
      msckf.tracks_to_remove_.clear();
      msckf.finish();
      // Stage 6: post-finish counters (map growth == tracks triangulated).
      {
        w1(t); w1(6); w1((double)msckf.map_.size());
        w1((double)msckf.num_feature_tracks_residualized_);
      }
      dump(4);
    }
  }
  std::fclose(fout);
  std::fprintf(stderr, "ref harness done: %d frames (+finish)\n", T);
  return 0;
}
