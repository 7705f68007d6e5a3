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

    auto dump = [&](int stage) {
      const int N = (int)msckf.cam_states_.size();
      w1(t); w1(stage); w1(N);
      const auto& imu = msckf.imu_state_;
      w1(imu.q_IG.w()); w1(imu.q_IG.x()); w1(imu.q_IG.y()); w1(imu.q_IG.z());
      for (int i = 0; i < 3; i++) w1(imu.p_I_G(i));
      for (int i = 0; i < 3; i++) w1(imu.v_I_G(i));
      for (int i = 0; i < 3; i++) w1(imu.b_g(i));
      for (int i = 0; i < 3; i++) w1(imu.b_a(i));
      for (int n = 0; n < N; n++) {
        const auto& cs = msckf.cam_states_[n];
        w1(cs.state_id);
        w1(cs.q_CG.w()); w1(cs.q_CG.x()); w1(cs.q_CG.y()); w1(cs.q_CG.z());
        for (int i = 0; i < 3; i++) w1(cs.p_C_G(i));
      }
      const int D = 15 + 6 * N;
      Eigen::Matrix<S, Eigen::Dynamic, Eigen::Dynamic> P(D, D);
      P.block(0, 0, 15, 15) = msckf.imu_covar_;
      if (N > 0) {
        P.block(0, 15, 15, 6 * N) = msckf.imu_cam_covar_;
        P.block(15, 0, 6 * N, 15) = msckf.imu_cam_covar_.transpose();
        P.block(15, 15, 6 * N, 6 * N) = msckf.cam_covar_;
      }
      for (int i = 0; i < D; i++)
        for (int j = 0; j < D; j++) w1(P(i, j));
    };

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
  }
  std::fclose(fout);
  std::fprintf(stderr, "ref harness done: %d frames\n", T);
  return 0;
}
