/* conex_tpu C ABI implementation: embeds CPython and drives
 * conex_tpu.interface.Conex (reference surface: interfaces/conex.cc).
 *
 * A program handle is a PyObject* of a Conex instance.  Every entry point
 * takes the GIL (PyGILState), so the library is callable from arbitrary
 * C threads; on a Python exception it prints the traceback and returns
 * CONEX_FAILURE (mirroring the reference's CONEX_DEMAND error reporting,
 * error_checking_macros.h:15-19).
 *
 * Build: make -C interfaces  (produces libconex_tpu.so; see Makefile).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdio.h>
#include <string.h>

#include "conex_tpu.h"

static int ensure_python(void) {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    /* Release the GIL acquired by initialization so PyGILState works. */
    PyEval_SaveThread();
  }
  return 1;
}

/* Build a numpy array viewing `data` (copied, column-major interpretation)
 * with shape (r, c).  Returns a new reference or NULL. */
static PyObject* np_matrix_colmajor(const double* data, int r, int c) {
  PyObject *np = NULL, *mv = NULL, *flat = NULL, *arr = NULL;
  np = PyImport_ImportModule("numpy");
  if (!np) return NULL;
  mv = PyMemoryView_FromMemory((char*)data, (Py_ssize_t)r * c * 8, PyBUF_READ);
  if (!mv) goto done;
  flat = PyObject_CallMethod(np, "frombuffer", "Os", mv, "float64");
  if (!flat) goto done;
  /* column-major: reshape (c, r) then transpose, then copy */
  {
    PyObject* shaped = PyObject_CallMethod(flat, "reshape", "(ii)", c, r);
    if (!shaped) goto done;
    PyObject* t = PyObject_GetAttrString(shaped, "T");
    Py_DECREF(shaped);
    if (!t) goto done;
    arr = PyObject_CallMethod(t, "copy", NULL);
    Py_DECREF(t);
  }
done:
  Py_XDECREF(np);
  Py_XDECREF(mv);
  Py_XDECREF(flat);
  return arr;
}

static PyObject* np_vector(const double* data, int r) {
  PyObject *np = NULL, *mv = NULL, *flat = NULL, *arr = NULL;
  np = PyImport_ImportModule("numpy");
  if (!np) return NULL;
  mv = PyMemoryView_FromMemory((char*)data, (Py_ssize_t)r * 8, PyBUF_READ);
  if (!mv) goto done;
  flat = PyObject_CallMethod(np, "frombuffer", "Os", mv, "float64");
  if (!flat) goto done;
  arr = PyObject_CallMethod(flat, "copy", NULL);
done:
  Py_XDECREF(np);
  Py_XDECREF(mv);
  Py_XDECREF(flat);
  return arr;
}

static int fail(PyGILState_STATE st) {
  if (PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(st);
  return CONEX_FAILURE;
}

void* CONEX_CreateConeProgram(void) {
  ensure_python();
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* mod = PyImport_ImportModule("conex_tpu.interface");
  PyObject* prog = NULL;
  if (mod) {
    prog = PyObject_CallMethod(mod, "Conex", "i", -1);
    Py_DECREF(mod);
  }
  if (!prog && PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(st);
  return (void*)prog;
}

void CONEX_DeleteConeProgram(void* prog) {
  if (!prog) return;
  PyGILState_STATE st = PyGILState_Ensure();
  Py_DECREF((PyObject*)prog);
  PyGILState_Release(st);
}

CONEX_STATUS CONEX_SetNumberOfVariables(void* prog, int m) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* r =
      PyObject_CallMethod((PyObject*)prog, "SetNumberOfVariables", "i", m);
  if (!r) return fail(st);
  Py_DECREF(r);
  PyGILState_Release(st);
  return CONEX_SUCCESS;
}

int CONEX_AddDenseLinearConstraint(void* prog, const double* A, int Ar,
                                   int Ac, const double* c, int cr) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* Aa = np_matrix_colmajor(A, Ar, Ac);
  PyObject* ca = np_vector(c, cr);
  PyObject* r = NULL;
  if (Aa && ca)
    r = PyObject_CallMethod((PyObject*)prog, "AddLinearInequality", "OO", Aa,
                            ca);
  Py_XDECREF(Aa);
  Py_XDECREF(ca);
  if (!r) return fail(st);
  Py_DECREF(r);
  /* constraint id = num_constraints - 1 */
  PyObject* nc = PyObject_GetAttrString((PyObject*)prog, "num_constraints");
  int id = nc ? (int)PyLong_AsLong(nc) - 1 : -1;
  Py_XDECREF(nc);
  PyGILState_Release(st);
  return id;
}

int CONEX_AddDenseLMIConstraint(void* prog, const double* Aarray, int Ar,
                                int Ac, int m, const double* cmat, int cr,
                                int cc) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject *np = PyImport_ImportModule("numpy"), *r = NULL, *stack = NULL;
  if (np) {
    /* m consecutive column-major Ar x Ac blocks -> python list of arrays */
    PyObject* list = PyList_New(m);
    int ok = list != NULL;
    for (int i = 0; ok && i < m; i++) {
      PyObject* Ai =
          np_matrix_colmajor(Aarray + (Py_ssize_t)i * Ar * Ac, Ar, Ac);
      if (!Ai) ok = 0;
      else PyList_SET_ITEM(list, i, Ai); /* steals */
    }
    if (ok) stack = PyObject_CallMethod(np, "stack", "O", list);
    Py_XDECREF(list);
  }
  PyObject* Ca = np_matrix_colmajor(cmat, cr, cc);
  if (stack && Ca)
    r = PyObject_CallMethod((PyObject*)prog, "AddDenseLMIConstraint", "OO",
                            stack, Ca);
  Py_XDECREF(np);
  Py_XDECREF(stack);
  Py_XDECREF(Ca);
  if (!r) return fail(st);
  Py_DECREF(r);
  PyObject* nc = PyObject_GetAttrString((PyObject*)prog, "num_constraints");
  int id = nc ? (int)PyLong_AsLong(nc) - 1 : -1;
  Py_XDECREF(nc);
  PyGILState_Release(st);
  return id;
}

int CONEX_AddLinearInequalities(void* prog, const double* A, int Ar, int Ac,
                                const double* lb, int num_lb,
                                const double* ub, int num_ub) {
  if (Ar != num_lb || Ar != num_ub) return CONEX_FAILURE;
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* Aa = np_matrix_colmajor(A, Ar, Ac);
  PyObject* lba = np_vector(lb, num_lb);
  PyObject* uba = np_vector(ub, num_ub);
  PyObject* r = NULL;
  if (Aa && lba && uba)
    r = PyObject_CallMethod((PyObject*)prog, "AddLinearInequalities", "OOO",
                            Aa, lba, uba);
  Py_XDECREF(Aa);
  Py_XDECREF(lba);
  Py_XDECREF(uba);
  if (!r) return fail(st);
  Py_DECREF(r);
  PyGILState_Release(st);
  /* reference returns a placeholder id (interfaces/conex.cc:213-214). */
  return -1;
}

int CONEX_AddQuadraticCost(void* prog, const double* A, int Ar, int Ac) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* Aa = np_matrix_colmajor(A, Ar, Ac);
  PyObject* r = NULL;
  if (Aa)
    r = PyObject_CallMethod((PyObject*)prog, "AddQuadraticCost", "O", Aa);
  Py_XDECREF(Aa);
  if (!r) return fail(st);
  Py_DECREF(r);
  PyGILState_Release(st);
  return CONEX_SUCCESS;
}

int CONEX_AddSparseLMIConstraint(void* prog, const double* Aarray, int Ar,
                                 int Ac, int m, const double* cmat, int cr,
                                 int cc, const long* vars, int vars_c) {
  if (vars_c != m) return CONEX_FAILURE;
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject *np = PyImport_ImportModule("numpy"), *r = NULL, *stack = NULL;
  if (np) {
    PyObject* list = PyList_New(m);
    int ok = list != NULL;
    for (int i = 0; ok && i < m; i++) {
      PyObject* Ai =
          np_matrix_colmajor(Aarray + (Py_ssize_t)i * Ar * Ac, Ar, Ac);
      if (!Ai) ok = 0;
      else PyList_SET_ITEM(list, i, Ai); /* steals */
    }
    if (ok) stack = PyObject_CallMethod(np, "stack", "O", list);
    Py_XDECREF(list);
  }
  PyObject* Ca = np_matrix_colmajor(cmat, cr, cc);
  PyObject* vlist = PyList_New(vars_c);
  if (vlist) {
    for (int i = 0; i < vars_c; i++)
      PyList_SET_ITEM(vlist, i, PyLong_FromLong(vars[i]));
  }
  if (stack && Ca && vlist)
    r = PyObject_CallMethod((PyObject*)prog, "AddSparseLMIConstraint", "OOO",
                            stack, Ca, vlist);
  Py_XDECREF(np);
  Py_XDECREF(stack);
  Py_XDECREF(Ca);
  Py_XDECREF(vlist);
  if (!r) return fail(st);
  Py_DECREF(r);
  PyObject* nc = PyObject_GetAttrString((PyObject*)prog, "num_constraints");
  int id = nc ? (int)PyLong_AsLong(nc) - 1 : -1;
  Py_XDECREF(nc);
  PyGILState_Release(st);
  return id;
}

static PyObject* config_to_py(const CONEX_SolverConfiguration* c) {
  PyObject* mod = PyImport_ImportModule("conex_tpu");
  if (!mod) return NULL;
  PyObject* cls = PyObject_GetAttrString(mod, "SolverConfig");
  Py_DECREF(mod);
  if (!cls) return NULL;
  PyObject* kwargs = Py_BuildValue(
      "{s:i,s:i,s:d,s:d,s:d,s:d,s:i,s:d,s:i,s:d,s:i,s:i,s:d,s:i,s:i,s:d,"
      "s:d,s:i,s:i}",
      "prepare_dual_variables", c->prepare_dual_variables,
      "initialization_mode", c->initialization_mode,
      "inv_sqrt_mu_max", c->inv_sqrt_mu_max,
      "minimum_mu", c->minimum_mu,
      "maximum_mu", c->maximum_mu,
      "divergence_upper_bound", c->divergence_upper_bound,
      "enable_line_search", c->enable_line_search,
      "dinf_upper_bound", c->dinf_upper_bound,
      "final_centering_steps", c->final_centering_steps,
      "final_centering_tolerance", c->final_centering_tolerance,
      "initial_centering_steps_warmstart",
      c->initial_centering_steps_warmstart,
      "initial_centering_steps_coldstart",
      c->initial_centering_steps_coldstart,
      "warmstart_abort_threshold", c->warmstart_abort_threshold,
      "max_iterations", c->max_iterations,
      "iterative_refinement_iterations", c->iterative_refinement_iterations,
      "infeasibility_threshold", c->infeasibility_threshold,
      "kkt_error_tolerance", c->kkt_error_tolerance,
      "enable_rescaling", c->enable_rescaling,
      "kkt_solver", c->kkt_solver);
  PyObject* out = NULL;
  if (kwargs) {
    PyObject* empty = PyTuple_New(0);
    out = PyObject_Call(cls, empty, kwargs);
    Py_DECREF(empty);
    Py_DECREF(kwargs);
  }
  Py_DECREF(cls);
  return out;
}

void CONEX_SetDefaultOptions(CONEX_SolverConfiguration* c) {
  /* Reference defaults (interfaces/conex.cc:231-257 via cone_program.h). */
  memset(c, 0, sizeof(*c));
  c->prepare_dual_variables = 0;
  c->initialization_mode = 0;
  c->inv_sqrt_mu_max = 1000;
  c->minimum_mu = 1e-15;
  c->maximum_mu = 1e4;
  c->divergence_upper_bound = 1;
  c->enable_line_search = 0;
  c->dinf_upper_bound = 1;
  c->final_centering_steps = 5;
  c->final_centering_tolerance = .01;
  c->initial_centering_steps_warmstart = 0;
  c->initial_centering_steps_coldstart = 0;
  c->warmstart_abort_threshold = 2;
  c->max_iterations = 25;
  c->iterative_refinement_iterations = 0;
  c->infeasibility_threshold = 1e5;
  c->kkt_error_tolerance = 1e10;
  c->enable_rescaling = 1;
  c->kkt_solver = 0;
}

int CONEX_Maximize(void* prog, const double* b, int br,
                   const CONEX_SolverConfiguration* config, double* y,
                   int yr) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* ba = np_vector(b, br);
  PyObject* cfg = config_to_py(config);
  PyObject* sol = NULL;
  if (ba && cfg)
    sol = PyObject_CallMethod((PyObject*)prog, "Maximize", "OO", ba, cfg);
  Py_XDECREF(ba);
  Py_XDECREF(cfg);
  if (!sol) return fail(st);
  int solved = 0;
  PyObject* status = PyObject_GetAttrString(sol, "status");
  if (status) {
    solved = PyObject_IsTrue(status);
    Py_DECREF(status);
  }
  PyObject* yo = PyObject_GetAttrString(sol, "y");
  if (yo) {
    for (int i = 0; i < yr; i++) {
      PyObject* yi = PySequence_GetItem(yo, i);
      if (yi) {
        y[i] = PyFloat_AsDouble(yi);
        Py_DECREF(yi);
      }
    }
    Py_DECREF(yo);
  }
  Py_DECREF(sol);
  if (PyErr_Occurred()) return fail(st);
  PyGILState_Release(st);
  return solved;
}

/* Extract y + solved status from a Solution object; returns solved. */
static int read_solution(PyObject* sol, double* y, int yr) {
  int solved = 0;
  PyObject* status = PyObject_GetAttrString(sol, "status");
  if (status) {
    solved = PyObject_IsTrue(status);
    Py_DECREF(status);
  }
  PyObject* yo = PyObject_GetAttrString(sol, "y");
  if (yo) {
    for (int i = 0; i < yr; i++) {
      PyObject* yi = PySequence_GetItem(yo, i);
      if (yi) {
        y[i] = PyFloat_AsDouble(yi);
        Py_DECREF(yi);
      }
    }
    Py_DECREF(yo);
  }
  return solved;
}

int CONEX_Solve(void* prog, const CONEX_SolverConfiguration* config,
                double* y, int yr) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* cfg = config_to_py(config);
  PyObject* sol = NULL;
  if (cfg) sol = PyObject_CallMethod((PyObject*)prog, "Solve", "O", cfg);
  Py_XDECREF(cfg);
  if (!sol) return fail(st);
  int solved = read_solution(sol, y, yr);
  Py_DECREF(sol);
  if (PyErr_Occurred()) return fail(st);
  PyGILState_Release(st);
  return solved;
}

int CONEX_GetDualVariableSize(void* prog, int i) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* x = PyObject_CallMethod((PyObject*)prog, "GetDualVariable", "i", i);
  if (!x) return fail(st) - 2; /* -1 */
  PyObject* sz = PyObject_GetAttrString(x, "size");
  int out = sz ? (int)PyLong_AsLong(sz) : -1;
  Py_XDECREF(sz);
  Py_DECREF(x);
  PyGILState_Release(st);
  return out;
}

void CONEX_GetDualVariable(void* prog, int i, double* x, int xr, int xc) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* xa = PyObject_CallMethod((PyObject*)prog, "GetDualVariable", "i",
                                     i);
  if (xa) {
    /* column-major output, matching the reference's Eigen::Map fill */
    PyObject* np = PyImport_ImportModule("numpy");
    PyObject* flat = NULL;
    if (np) {
      PyObject* asarray = PyObject_CallMethod(np, "asarray", "O", xa);
      if (asarray) {
        PyObject* r = PyObject_CallMethod(asarray, "ravel", "s", "F");
        Py_DECREF(asarray);
        flat = r;
      }
      Py_DECREF(np);
    }
    if (flat) {
      for (int k = 0; k < xr * xc; k++) {
        PyObject* v = PySequence_GetItem(flat, k);
        if (v) {
          x[k] = PyFloat_AsDouble(v);
          Py_DECREF(v);
        }
      }
      Py_DECREF(flat);
    }
    Py_DECREF(xa);
  }
  if (PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(st);
}

void CONEX_GetIterationStats(void* prog, CONEX_IterationStats* stats,
                             int iter_num) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* s = PyObject_CallMethod((PyObject*)prog, "GetIterationNumberStats",
                                    "i", iter_num);
  if (s) {
    PyObject* mu = PyObject_GetAttrString(s, "mu");
    PyObject* it = PyObject_GetAttrString(s, "iteration_number");
    if (mu) stats->mu = PyFloat_AsDouble(mu);
    if (it) stats->iteration_number = (int)PyLong_AsLong(it);
    Py_XDECREF(mu);
    Py_XDECREF(it);
    Py_DECREF(s);
  }
  if (PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(st);
}

static CONEX_STATUS new_constraint(void* prog, const char* method,
                                   const char* fmt, int a, int b_,
                                   int* constraint_id) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* r;
  if (b_ >= 0)
    r = PyObject_CallMethod((PyObject*)prog, method, fmt, a, b_);
  else
    r = PyObject_CallMethod((PyObject*)prog, method, fmt, a);
  if (!r) return fail(st);
  *constraint_id = (int)PyLong_AsLong(r);
  Py_DECREF(r);
  if (PyErr_Occurred()) return fail(st);
  PyGILState_Release(st);
  return CONEX_SUCCESS;
}

CONEX_STATUS CONEX_NewLinearMatrixInequality(void* prog, int order,
                                             int hyper_complex_dim,
                                             int* constraint_id) {
  return new_constraint(prog, "NewLinearMatrixInequality", "ii", order,
                        hyper_complex_dim, constraint_id);
}

CONEX_STATUS CONEX_NewLorentzConeConstraint(void* prog, int order,
                                            int* constraint_id) {
  return new_constraint(prog, "NewLorentzConeConstraint", "i", order, -1,
                        constraint_id);
}

CONEX_STATUS CONEX_NewLinearInequality(void* prog, int num_rows,
                                       int* constraint_id) {
  return new_constraint(prog, "NewLinearInequality", "i", num_rows, -1,
                        constraint_id);
}

CONEX_STATUS CONEX_UpdateLinearOperator(void* prog, int constraint,
                                        double value, int variable, int row,
                                        int col, int hyper_complex_dim) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* r =
      PyObject_CallMethod((PyObject*)prog, "UpdateLinearOperator", "idiiii",
                          constraint, value, variable, row, col,
                          hyper_complex_dim);
  if (!r) return fail(st);
  Py_DECREF(r);
  PyGILState_Release(st);
  return CONEX_SUCCESS;
}

CONEX_STATUS CONEX_NewQuadraticCost(void* prog, int* constraint_id) {
  if (!constraint_id) return CONEX_FAILURE;
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* r = PyObject_CallMethod((PyObject*)prog, "NewQuadraticCost", NULL);
  if (!r) return fail(st);
  *constraint_id = (int)PyLong_AsLong(r);
  Py_DECREF(r);
  if (PyErr_Occurred()) return fail(st);
  PyGILState_Release(st);
  return CONEX_SUCCESS;
}

CONEX_STATUS CONEX_UpdateQuadraticCostMatrix(void* prog, int constraint_id,
                                             double value, int row, int col) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* r =
      PyObject_CallMethod((PyObject*)prog, "UpdateQuadraticCostMatrix",
                          "idii", constraint_id, value, row, col);
  if (!r) return fail(st);
  Py_DECREF(r);
  PyGILState_Release(st);
  return CONEX_SUCCESS;
}

CONEX_STATUS CONEX_UpdateAffineTerm(void* prog, int constraint, double value,
                                    int row, int col, int hyper_complex_dim) {
  PyGILState_STATE st = PyGILState_Ensure();
  PyObject* r =
      PyObject_CallMethod((PyObject*)prog, "UpdateAffineTerm", "idiii",
                          constraint, value, row, col, hyper_complex_dim);
  if (!r) return fail(st);
  Py_DECREF(r);
  PyGILState_Release(st);
  return CONEX_SUCCESS;
}
