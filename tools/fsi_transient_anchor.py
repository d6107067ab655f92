"""dt self-convergence study for the transient-FSI quantitative anchor
(VERDICT r4 missing #4): the elastic-bed configuration of
tests/test_fsi_transient.py at FIXED physical parameters, theta = 0.5
(Crank-Nicolson — non-dissipative, so the ringing period is a sharp
observable), through the framework's own MG(material-Vanka)-GMRES solver.

Observables:
- T_ring: ringing period = 2 x the gap between the first two zero
  crossings of the solid's mean horizontal velocity (linear interp);
- A_dx: first-swing amplitude = first local max of |mean solid dx|.

    python tools/fsi_transient_anchor.py            # dt study
    FSI_ANCHOR_H=1 python tools/fsi_transient_anchor.py  # + h-refined run
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

BED = 0.25
V0 = 0.5


def make_sys(n=4, levels=2, dt=0.01, theta=0.5):
    from femus_tpu.mesh.generation import unit_box
    from femus_tpu.mesh.multilevel import MultiLevelMesh
    from femus_tpu.systems.fsi import (TransientMonolithicFSI,
                                       fsi_transient_form)
    from femus_tpu.systems.problem import MultiLevelProblem
    from femus_tpu.systems.solution import MultiLevelSolution

    coarse = unit_box((n, n), "quad")
    cent = coarse.coords[coarse.conn].mean(axis=1)
    coarse.elem_group = np.where(cent[:, 1] < BED, 1, 0).astype(np.int32)
    ml_mesh = MultiLevelMesh(coarse, levels)
    ml_sol = MultiLevelSolution(ml_mesh)
    for v in ("dx", "dy", "u", "v"):
        ml_sol.add_solution(v, "biquadratic", time_order=1)
    ml_sol.add_solution("p", "linear")

    def bc(var, x, grp, t):
        if var == "p":
            return False, 0.0
        return True, 0.0

    ml_sol.attach_bc(bc)

    def kick(x):
        inside = x[:, 1] < BED
        return np.where(inside,
                        V0 * np.sin(np.pi * x[:, 0])
                        * np.sin(np.pi * x[:, 1] / BED), 0.0)

    for v in ("dx", "dy", "v", "p"):
        ml_sol.initialize(v)
    ml_sol.initialize("u", kick)
    ml_sol.generate_bdc()
    ml_sol.fix_solution_at_point("p", 0, 0.0)

    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys_ = prob.add_system(TransientMonolithicFSI, "FSI")
    sys_.add_unknown("dx", "dy", "u", "v", "p")
    sys_.set_assembly(fsi_transient_form(
        ("dx", "dy"), ("u", "v"), "p", solid_groups=(1,),
        rho_f=1.0, nu=0.05, rho_s=1.0, lam=50.0, mu=50.0,
        solid_model="neo-hookean", theta=theta))
    sys_.config.use_mg = True
    sys_.config.smoother = "vanka"
    sys_.config.vanka_groups = "material"
    sys_.config.vanka_block_elems = 2
    sys_.config.outer = "gmres"
    sys_.config.restart = 60
    sys_.config.max_outer = 40
    sys_.config.rtol = 1e-9
    sys_.config.nonlinear_tol = 1e-8
    sys_.config.max_nonlinear = 8
    sys_.init_time(dt=dt)
    sys_.init()
    return prob, sys_


def observables(prob, sys_, t_end=0.6):
    mesh = prob.ml_mesh.finest()
    dm = mesh.dofmap("biquadratic")
    xy = mesh.coords[dm.nodes]
    solid = xy[:, 1] < BED - 1e-9
    dt = sys_.dt
    n_steps = int(round(t_end / dt))
    ts, mu_, mdx = [], [], []
    for k in range(n_steps):
        sys_.time_step()
        sol = prob.ml_sol.sol[-1]
        ts.append((k + 1) * dt)
        mu_.append(float(sol["u"][solid].mean()))
        mdx.append(float(sol["dx"][solid].mean()))
    ts, mu_, mdx = map(np.asarray, (ts, mu_, mdx))
    # zero crossings of mean solid u (linear interpolation)
    crossings = []
    for i in range(len(ts) - 1):
        if mu_[i] == 0.0 or mu_[i] * mu_[i + 1] < 0:
            frac = mu_[i] / (mu_[i] - mu_[i + 1])
            crossings.append(ts[i] + frac * dt)
    period = 2.0 * (crossings[1] - crossings[0]) if len(crossings) >= 2 \
        else np.nan
    # first-swing amplitude of |mean solid dx|
    amp = float(np.max(np.abs(mdx[:max(1, int(period / dt))])) if
                np.isfinite(period) else np.max(np.abs(mdx)))
    return {"period": float(period), "amp_dx": amp,
            "crossings": [float(c) for c in crossings[:4]],
            "steps": n_steps}


def main():
    out = []
    t00 = time.time()
    for dt in (0.02, 0.01, 0.005):
        t0 = time.time()
        prob, sys_ = make_sys(dt=dt)
        obs = observables(prob, sys_)
        obs.update(dt=dt, n=4, levels=2, wall_s=round(time.time() - t0, 1))
        out.append(obs)
        print(json.dumps(obs), flush=True)
    if os.environ.get("FSI_ANCHOR_H"):
        t0 = time.time()
        prob, sys_ = make_sys(dt=0.01, levels=3)
        obs = observables(prob, sys_)
        obs.update(dt=0.01, n=4, levels=3, wall_s=round(time.time() - t0, 1))
        out.append(obs)
        print(json.dumps(obs), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "fsi_anchor_study.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"total wall {time.time()-t00:.0f}s")


if __name__ == "__main__":
    main()
