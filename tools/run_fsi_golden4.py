"""Run the 4-level FSI golden (testFSISteady, main.cpp:148-196) through the
OWN solver stack with the committed 3+3 K-cycle config and REPORT achieved
norms — the validation run behind tests/test_golden_fsi_mg.py's heavy gate.

Prints per-Newton-step progress (level, eps norms, linear residual/iters)
and, at the end, per-variable |got - GOLD| so the gate's tolerances can be
set from measured numbers.  Writes a JSON record next to this file.
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

sys.path.insert(0, "/root/repo")
from femus_tpu.apps import fsi_bench

T0 = time.time()


def main():
    n_pre = int(os.environ.get("FSI_NPRE", "3"))
    n_post = int(os.environ.get("FSI_NPOST", "3"))
    restart = int(os.environ.get("FSI_RESTART", "150"))
    levels = int(os.environ.get("FSI_LEVELS", "4"))
    print(f"[golden4] levels={levels} K-cycle n_pre={n_pre} n_post={n_post} "
          f"restart={restart}", flush=True)
    prob, sys_ = fsi_bench.make_fsi_system(
        levels=levels, mg_cycle="K", rtol=1e-7, max_nonlinear=6,
        cfg_overrides={"restart": restart, "max_outer": 1,
                       "nonlinear_tol": 1e-7, "n_pre": n_pre,
                       "n_post": n_post})

    orig = sys_.eps_norms

    def eps_norms(delta, u_new, l):
        norms = orig(delta, u_new, l)
        print(f"[golden4] t={time.time()-T0:8.1f}s level={l} "
              f"eps={{" + ", ".join(f"{k}: {v:.3e}" for k, v in norms.items())
              + "}", flush=True)
        return norms

    sys_.eps_norms = eps_norms
    sys_.solve()
    asm = sys_.assemblers[-1]
    u = np.asarray(sys_.gather(-1))
    rec = {"n_pre": n_pre, "n_post": n_post, "restart": restart,
           "levels": levels, "wall_s": time.time() - T0,
           "history": sys_.history, "norms": {}, "abs_err": {}}
    print(f"[golden4] wall {rec['wall_s']:.1f}s", flush=True)
    for h in sys_.history:
        print(f"[golden4] hist level={h['level']} it={h['newton_it']} "
              f"lin_res={h['lin_res']:.3e} lin_iters={h['lin_iters']}",
              flush=True)
    ok = True
    for k in ("DX", "DY", "U", "V", "P"):
        got = fsi_bench.var_norm(asm, u, k)
        err = abs(got - fsi_bench.GOLD[k])
        rec["norms"][k] = got
        rec["abs_err"][k] = err
        inside = err < fsi_bench.TOL[k]
        ok = ok and inside
        print(f"[golden4] {k}: got={got:.12f} gold={fsi_bench.GOLD[k]:.12f} "
              f"abs_err={err:.3e} tol={fsi_bench.TOL[k]:.1e} "
              f"{'PASS' if inside else 'MISS'}", flush=True)
    rec["strict_pass"] = ok
    out = os.path.join(os.path.dirname(__file__),
                       f"fsi_golden4_{n_pre}{n_post}_r{restart}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1, default=float)
    print(f"[golden4] strict_pass={ok} -> {out}", flush=True)


if __name__ == "__main__":
    main()
