// Standstill-init parity oracle (VERDICT r4 "missing" #4).
//
// The reference's no-ground-truth runner self-calibrates from a standstill
// window (/root/reference/datasets/asl_msckf_no_ground_truth.cpp:140-173):
//   accel_accum += a; gyro_accum += omega;          (Eigen::Vector3f, in order)
//   accel_mean = accel_accum / n; gyro_mean = gyro_accum / n;
//   b_g  = gyro_mean
//   g    = (0, 0, -9.81)
//   q_IG = Eigen::Quaternionf::FromTwoVectors(-g, accel_mean)
//   b_a  = q_IG * g + accel_mean
//   p = v = 0
// This program runs that exact formula (same Eigen calls, same float32
// accumulation order) on readings supplied in a binary file, so
// tests/test_standstill_parity.py can diff msckf_mono_tpu.core.init
// .standstill_init against the real Eigen semantics — FromTwoVectors'
// normalization/degenerate handling and Hamilton q*v rotation included.
//
// Input (argv[1], little-endian): int32 K, then K * 6 float32
// [omega_x omega_y omega_z a_x a_y a_z].
// Output (argv[2], little-endian): 16 float32
// [q_w q_x q_y q_z  b_g(3)  b_a(3)  accel_mean(3)  gyro_mean(3)].

#include <cstdint>
#include <cstdio>
#include <vector>

#include <Eigen/Core>
#include <Eigen/Geometry>

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s input.bin output.bin\n", argv[0]);
    return 2;
  }
  std::FILE* in = std::fopen(argv[1], "rb");
  if (!in) return 2;
  int32_t K = 0;
  if (std::fread(&K, sizeof(K), 1, in) != 1 || K <= 0) return 2;
  std::vector<float> buf(static_cast<size_t>(K) * 6);
  if (std::fread(buf.data(), sizeof(float), buf.size(), in) != buf.size())
    return 2;
  std::fclose(in);

  // asl_msckf_no_ground_truth.cpp:140-162 — float accumulators, in order.
  Eigen::Vector3f accel_accum, gyro_accum;
  accel_accum.setZero();
  gyro_accum.setZero();
  for (int32_t k = 0; k < K; ++k) {
    Eigen::Vector3f omega(buf[6 * k + 0], buf[6 * k + 1], buf[6 * k + 2]);
    Eigen::Vector3f a(buf[6 * k + 3], buf[6 * k + 4], buf[6 * k + 5]);
    accel_accum += a;
    gyro_accum += omega;
  }
  Eigen::Vector3f accel_mean = accel_accum / static_cast<float>(K);
  Eigen::Vector3f gyro_mean = gyro_accum / static_cast<float>(K);

  // asl_msckf_no_ground_truth.cpp:164-172
  Eigen::Vector3f b_g = gyro_mean;
  Eigen::Vector3f g(0.0f, 0.0f, -9.81f);
  Eigen::Quaternionf q_IG =
      Eigen::Quaternionf::FromTwoVectors(-g, accel_mean);
  Eigen::Vector3f b_a = q_IG * g + accel_mean;

  float out[16] = {q_IG.w(),      q_IG.x(),      q_IG.y(),      q_IG.z(),
                   b_g.x(),       b_g.y(),       b_g.z(),
                   b_a.x(),       b_a.y(),       b_a.z(),
                   accel_mean.x(), accel_mean.y(), accel_mean.z(),
                   gyro_mean.x(),  gyro_mean.y(),  gyro_mean.z()};
  std::FILE* outf = std::fopen(argv[2], "wb");
  if (!outf) return 2;
  std::fwrite(out, sizeof(float), 16, outf);
  std::fclose(outf);
  return 0;
}
