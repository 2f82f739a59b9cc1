"""Run the on-chip Pallas kernel validation and record the artifact.

Writes PALLAS_TPU_VALIDATION.json with per-shape errors of the compiled
Mosaic kernel vs an f64 oracle.  Run on the chip:
    python benchmarks/validate_pallas_tpu.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import jax

    if jax.default_backend() != "tpu":
        print("not on TPU; aborting", file=sys.stderr)
        return 1
    from test_pallas_tpu import check_kernel_on_chip

    rows = []
    for n in (100, 128, 50):
        for m in (8, 50):
            for lo in (False, True):
                err, tol = check_kernel_on_chip(B=4, m=m, n=n, lo=lo)
                rows.append(dict(n=n, m=m, bf16_operand=lo,
                                 fro_relerr_vs_f64=float(f"{err:.3e}"),
                                 tol=tol, ok=bool(err < tol)))
                print(rows[-1], flush=True)
    payload = dict(
        description=(
            "Compiled Mosaic fused-Schur kernel vs f64 oracle on the real "
            "chip (tests/test_pallas_tpu.py).  n=100/50 exercise the "
            "padded non-128-aligned path; tolerance 6e-3 is the bf16 "
            "operand-truncation class (Mosaic truncates f32 matmul "
            "operands to bf16)."
        ),
        device=str(jax.devices()[0]),
        results=rows,
        all_ok=all(r["ok"] for r in rows),
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PALLAS_TPU_VALIDATION.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({"all_ok": payload["all_ok"]}))
    return 0 if payload["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
