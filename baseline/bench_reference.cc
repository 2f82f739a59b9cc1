// Baseline measurement driver for the reference conex solver.
// Builds against the read-only reference sources (not copied) purely to
// measure the single-core CPU baseline recorded in BASELINE_MEASURED.json.
#include <chrono>
#include <cstdio>
#include <random>
#include <vector>
#include <Eigen/Dense>
#include "conex/cone_program.h"
#include "conex/dense_lmi_constraint.h"

using Eigen::MatrixXd;
using Eigen::VectorXd;

int main(int argc, char** argv) {
  int n = argc > 1 ? atoi(argv[1]) : 50;
  int m = argc > 2 ? atoi(argv[2]) : 25;
  int batch = argc > 3 ? atoi(argv[3]) : 8;
  std::mt19937 gen(0);
  std::uniform_real_distribution<double> dist(-1.0, 1.0);

  double total_sec = 0;
  long total_iters = 0;
  for (int bidx = 0; bidx < batch; bidx++) {
    std::vector<MatrixXd> A(m);
    for (int i = 0; i < m; i++) {
      MatrixXd M(n, n);
      for (int r = 0; r < n; r++)
        for (int c = 0; c < n; c++) M(r, c) = dist(gen);
      A[i] = 0.5 * (M + M.transpose());
    }
    MatrixXd C = MatrixXd::Identity(n, n);
    MatrixXd X0(n, n);
    for (int r = 0; r < n; r++)
      for (int c = 0; c < n; c++) X0(r, c) = dist(gen);
    X0 = (X0 * X0.transpose() + 0.1 * MatrixXd::Identity(n, n)).eval();
    VectorXd b(m);
    for (int i = 0; i < m; i++) b(i) = (A[i].array() * X0.array()).sum();

    conex::DenseLMIConstraint lmi{n, A, C};
    conex::Program prog(m);
    prog.AddConstraint(lmi);
    conex::SolverConfiguration config;
    config.max_iterations = 30;
    if (argc > 4 && atoi(argv[4])) {  // fixed-iteration throughput mode
      config.inv_sqrt_mu_max = 1e15;
      config.final_centering_steps = 0;
    }
    VectorXd y(m);
    auto t0 = std::chrono::steady_clock::now();
    conex::Solve(b, prog, config, y.data());
    auto t1 = std::chrono::steady_clock::now();
    total_sec += std::chrono::duration<double>(t1 - t0).count();
    total_iters += prog.Status().num_iterations;
  }
  printf("{\"newton_iters\": %ld, \"seconds\": %.6f, \"iters_per_sec\": %.3f}\n",
         total_iters, total_sec, total_iters / total_sec);
  return 0;
}
