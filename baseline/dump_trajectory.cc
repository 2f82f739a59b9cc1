// Lockstep-parity driver: solves an LP instance read from a text file with
// the reference conex solver and dumps the per-iteration sqrt_inv_mu
// trajectory and final y as JSON.  Used by tests/test_lockstep.py to
// validate that conex_tpu reproduces the reference trajectory
// iteration-for-iteration (SURVEY.md hard part #1).
//
// Input file format (whitespace separated):
//   n m max_iterations enable_line_search enable_rescaling
//   divergence_upper_bound inv_sqrt_mu_max dinf_upper_bound
//   final_centering_tolerance
//   A (n*m doubles, row major)  c (n doubles)  b (m doubles)
#include <cstdio>
#include <cstring>
#include <vector>
#include <Eigen/Dense>
#include "conex/cone_program.h"
#include "conex/linear_constraint.h"
#include "conex/dense_lmi_constraint.h"
#include "conex/soc_constraint.h"

using Eigen::MatrixXd;
using Eigen::VectorXd;

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s instance.txt\n", argv[0]);
    return 1;
  }
  FILE* f = fopen(argv[1], "r");
  if (!f) return 1;
  char kind[8];
  int n, m, max_iter, line_search, rescale;
  double div_ub, k_max, dinf_ub, fct;
  if (fscanf(f, "%7s %d %d %d %d %d %lf %lf %lf %lf", kind, &n, &m, &max_iter,
             &line_search, &rescale, &div_ub, &k_max, &dinf_ub, &fct) != 10)
    return 1;
  bool is_sdp = strcmp(kind, "sdp") == 0;
  bool is_soc = strcmp(kind, "soc") == 0;  // n is the full dim (ref n+1)
  conex::Program prog(m);
  MatrixXd A(n, m);
  MatrixXd C(n, 1);
  std::vector<MatrixXd> As;
  MatrixXd Cs(n, n);
  VectorXd b(m);
  if (!is_sdp) {
    for (int i = 0; i < n; i++)
      for (int j = 0; j < m; j++)
        if (fscanf(f, "%lf", &A(i, j)) != 1) return 1;
    for (int i = 0; i < n; i++)
      if (fscanf(f, "%lf", &C(i, 0)) != 1) return 1;
  } else {
    As.resize(m, MatrixXd(n, n));
    for (int v = 0; v < m; v++)
      for (int i = 0; i < n; i++)
        for (int j = 0; j < n; j++)
          if (fscanf(f, "%lf", &As[v](i, j)) != 1) return 1;
    for (int i = 0; i < n; i++)
      for (int j = 0; j < n; j++)
        if (fscanf(f, "%lf", &Cs(i, j)) != 1) return 1;
  }
  for (int j = 0; j < m; j++)
    if (fscanf(f, "%lf", &b(j)) != 1) return 1;
  fclose(f);

  conex::LinearConstraint lin{n, &A, &C};
  if (is_sdp) {
    prog.AddConstraint(conex::DenseLMIConstraint(n, As, Cs));
  } else if (is_soc) {
    prog.AddConstraint(conex::SOCConstraint(A, C));
  } else {
    prog.AddConstraint(lin);
  }
  conex::SolverConfiguration config;
  config.max_iterations = max_iter;
  config.enable_line_search = line_search;
  config.enable_rescaling = rescale;
  config.divergence_upper_bound = div_ub;
  config.inv_sqrt_mu_max = k_max;
  config.dinf_upper_bound = dinf_ub;
  config.final_centering_tolerance = fct;
  VectorXd y(m);
  bool solved = conex::Solve(b, prog, config, y.data());

  printf("{\"solved\": %d, \"num_iter\": %d, \"sqrt_inv_mu\": [",
         solved ? 1 : 0, prog.stats->num_iter);
  for (int i = 0; i < prog.stats->num_iter; i++) {
    printf("%s%.17g", i ? ", " : "", prog.stats->sqrt_inv_mu[i]);
  }
  printf("], \"norm_inf_d\": [");
  for (int i = 0; i < prog.stats->num_iter; i++) {
    printf("%s%.17g", i ? ", " : "", prog.stats->norm_inf_d[i]);
  }
  printf("], \"y\": [");
  for (int j = 0; j < m; j++) printf("%s%.17g", j ? ", " : "", y(j));
  printf("]}\n");
  return 0;
}
