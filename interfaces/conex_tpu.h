/* conex_tpu C ABI — drop-in mirror of the reference C API
 * (/root/reference/interfaces/conex.h:41-99): the same CONEX_* symbols,
 * argument conventions (column-major matrices, LMI operators as m
 * consecutive column-major n x n blocks), and config struct layout.
 *
 * The implementation (conex_tpu_c.c) embeds CPython and drives
 * conex_tpu.interface.Conex, so a C or MATLAB (loadlibrary) caller of
 * libconex.so can switch to libconex_tpu.so and solve on the TPU.
 */
#ifndef CONEX_TPU_API_H
#define CONEX_TPU_API_H
#ifdef __cplusplus
extern "C" {
#endif

typedef int CONEX_STATUS;
enum { CONEX_SUCCESS = 0, CONEX_FAILURE = 1 };

typedef struct {
  int prepare_dual_variables;
  int initialization_mode;
  double inv_sqrt_mu_max;
  double minimum_mu;
  double maximum_mu;
  double divergence_upper_bound;
  int enable_line_search;
  double dinf_upper_bound;
  int final_centering_steps;
  double final_centering_tolerance;
  int initial_centering_steps_warmstart;
  int initial_centering_steps_coldstart;
  double warmstart_abort_threshold;
  int max_iterations;
  int iterative_refinement_iterations;
  double infeasibility_threshold;
  double kkt_error_tolerance;
  int enable_rescaling;
  int kkt_solver;
} CONEX_SolverConfiguration;

typedef struct {
  double mu;
  int iteration_number;
} CONEX_IterationStats;

void* CONEX_CreateConeProgram(void);
void CONEX_DeleteConeProgram(void*);

int CONEX_AddDenseLinearConstraint(void* prog, const double* A, int Ar,
                                   int Ac, const double* c, int cr);

int CONEX_AddDenseLMIConstraint(void* prog, const double* Aarray, int Ar,
                                int Ac, int m, const double* cmat, int cr,
                                int cc);

int CONEX_Maximize(void* prog, const double* b, int br,
                   const CONEX_SolverConfiguration* config, double* y,
                   int yr);

int CONEX_GetDualVariableSize(void* prog, int i);
void CONEX_GetDualVariable(void* prog, int i, double* x, int xr, int xc);

void CONEX_SetDefaultOptions(CONEX_SolverConfiguration* config);

void CONEX_GetIterationStats(void* prog, CONEX_IterationStats* stats,
                             int iter_num);

CONEX_STATUS CONEX_SetNumberOfVariables(void* prog, int m);

CONEX_STATUS CONEX_NewLinearMatrixInequality(void* prog, int order,
                                             int hyper_complex_dim,
                                             int* constraint_id);
CONEX_STATUS CONEX_NewLorentzConeConstraint(void* prog, int order,
                                            int* constraint_id);
CONEX_STATUS CONEX_NewLinearInequality(void* prog, int num_rows,
                                       int* constraint_id);
CONEX_STATUS CONEX_UpdateLinearOperator(void* prog, int constraint,
                                        double value, int variable, int row,
                                        int col, int hyper_complex_dim);
CONEX_STATUS CONEX_UpdateAffineTerm(void* prog, int constraint, double value,
                                    int row, int col, int hyper_complex_dim);

#ifdef __cplusplus
}
#endif
#endif
