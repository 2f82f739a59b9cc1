// Baseline measurement driver for the reference conex solver.
// Builds against the read-only reference sources (not copied) purely to
// measure the single-core CPU baseline recorded in BASELINE_MEASURED.json.
#include <chrono>
#include <cstdio>
#include <random>
#include <string>
#include <vector>
#include <Eigen/Dense>
#include "conex/cone_program.h"
#include "conex/dense_lmi_constraint.h"
#include "conex/soc_constraint.h"

using Eigen::MatrixXd;
using Eigen::VectorXd;

// Batched SOCP workload: `batch` independent programs, each one Lorentz
// cone of order n over m variables, solved sequentially (the reference has
// no batching) with fixed iteration count.
static void bench_socp(int n, int m, int batch, int fixed) {
  std::mt19937 gen(0);
  std::uniform_real_distribution<double> dist(-1.0, 1.0);
  double total_sec = 0;
  long total_iters = 0;
  for (int bidx = 0; bidx < batch; bidx++) {
    MatrixXd A(n + 1, m);
    for (int r = 0; r <= n; r++)
      for (int c = 0; c < m; c++) A(r, c) = dist(gen);
    MatrixXd C(n + 1, 1);
    for (int r = 0; r <= n; r++) C(r, 0) = dist(gen);
    C(0, 0) = C.bottomRows(n).norm() + 1.0;
    VectorXd x0(n + 1);
    for (int r = 0; r <= n; r++) x0(r) = dist(gen);
    x0(0) = x0.tail(n).norm() + 0.5;
    VectorXd b = A.transpose() * x0;

    conex::SOCConstraint soc(A, C);
    conex::Program prog(m);
    prog.AddConstraint(soc);
    conex::SolverConfiguration config;
    config.max_iterations = 30;
    if (fixed) {
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
  printf("{\"workload\": \"socp\", \"newton_iters\": %ld, \"seconds\": %.6f, \"iters_per_sec\": %.3f}\n",
         total_iters, total_sec, total_iters / total_sec);
}

// Sparse LMI chain: N cliques, clique i an LMI of order nc over the
// 6-variable window starting at 3i (overlap 3) — the LQR-chain sparsity
// shape of conex/test/assembly_test.cc (LDLT.Benchmark2), but as a full
// cone-program solve so both sides exercise assembly + supernodal
// factorization + solves end to end.
static void bench_sparse(int N, int nc, int reps, int fixed) {
  std::mt19937 gen(0);
  std::uniform_real_distribution<double> dist(-1.0, 1.0);
  const int w = 6;
  const int num_vars = 3 * N + w - 3;
  double total_sec = 0;
  long total_iters = 0;
  for (int rep = 0; rep < reps; rep++) {
    conex::Program prog(num_vars);
    VectorXd b = VectorXd::Zero(num_vars);
    for (int i = 0; i < N; i++) {
      std::vector<int> vars(w);
      for (int j = 0; j < w; j++) vars[j] = 3 * i + j;
      std::vector<MatrixXd> A(w);
      for (int v = 0; v < w; v++) {
        MatrixXd M(nc, nc);
        for (int r = 0; r < nc; r++)
          for (int c = 0; c < nc; c++) M(r, c) = dist(gen);
        A[v] = 0.5 * (M + M.transpose());
      }
      MatrixXd C = MatrixXd::Identity(nc, nc);
      MatrixXd X0(nc, nc);
      for (int r = 0; r < nc; r++)
        for (int c = 0; c < nc; c++) X0(r, c) = dist(gen);
      X0 = (X0 * X0.transpose() / nc + 0.1 * MatrixXd::Identity(nc, nc)).eval();
      for (int v = 0; v < w; v++)
        b(vars[v]) += (A[v].array() * X0.array()).sum();
      conex::DenseLMIConstraint lmi{nc, A, C};
      prog.AddConstraint(lmi, vars);
    }
    conex::SolverConfiguration config;
    config.max_iterations = 30;
    if (fixed) {
      config.inv_sqrt_mu_max = 1e15;
      config.final_centering_steps = 0;
    }
    VectorXd y(num_vars);
    auto t0 = std::chrono::steady_clock::now();
    conex::Solve(b, prog, config, y.data());
    auto t1 = std::chrono::steady_clock::now();
    total_sec += std::chrono::duration<double>(t1 - t0).count();
    total_iters += prog.Status().num_iterations;
  }
  printf("{\"workload\": \"sparse\", \"cliques\": %d, \"order\": %d, "
         "\"num_vars\": %d, \"newton_iters\": %ld, \"seconds\": %.6f, "
         "\"iters_per_sec\": %.3f}\n",
         N, nc, num_vars, total_iters, total_sec, total_iters / total_sec);
}

int main(int argc, char** argv) {
  if (argc > 1 && std::string(argv[1]) == "sparse") {
    int N = argc > 2 ? atoi(argv[2]) : 40;
    int nc = argc > 3 ? atoi(argv[3]) : 8;
    int reps = argc > 4 ? atoi(argv[4]) : 3;
    int fixed = argc > 5 ? atoi(argv[5]) : 1;
    bench_sparse(N, nc, reps, fixed);
    return 0;
  }
  if (argc > 1 && std::string(argv[1]) == "socp") {
    int n = argc > 2 ? atoi(argv[2]) : 20;
    int m = argc > 3 ? atoi(argv[3]) : 10;
    int batch = argc > 4 ? atoi(argv[4]) : 1000;
    int fixed = argc > 5 ? atoi(argv[5]) : 1;
    bench_socp(n, m, batch, fixed);
    return 0;
  }
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
