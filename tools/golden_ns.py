"""Reproduce the reference testNSSteadyDD golden norms.

Reference: /root/reference/unittests/testNSSteadyDD/main.cpp
  - mesh input/nsbenc.neu, 3 uniform refinements -> level 3 (the level the
    golden norms are measured at; main.cpp:204-237)
  - U,V,T Lagrange SECOND (biquadratic), P DISCONTINUOUS FIRST (P1dc)
  - NS: nu=IRe=0.001, grad-grad viscous form, full Newton (main.cpp:420-700)
  - T: convection-diffusion, IPe=0.001 (main.cpp:746+)
  - BCs main.cpp:289-392 (face groups 1=inflow 2=outflow 3=wall 4=cylinder)

Golden values (main.cpp:204,215,226,237):
  |U|=35.68179309424519 |V|=6.86749406268887 |P|=3.10222750612995
  |T|=57.69748694700662  (rtol 1e-6)
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from femus_tpu.mesh.gambit import read_neu
from femus_tpu.mesh.refine import refine
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import navier_stokes
from femus_tpu.assembly.bc import generate_bdc, apply_dirichlet_values

GOLD = dict(U=35.68179309424519, V=6.86749406268887, P=3.10222750612995,
            T=57.69748694700662)


def inflow_u(y):
    return 1.5 * 0.2 * (4.0 / 0.1681) * y * (0.41 - y)


def bc_ns(var, x, grp, t):
    if var == "U":
        if grp == 1:
            return True, inflow_u(x[1])
        if grp == 2:
            return False, 0.0
        return True, 0.0
    if var == "V":
        if grp == 2:
            return False, 0.0
        return True, 0.0
    return False, 0.0          # P: no Dirichlet


def bc_T(var, x, grp, t):
    if grp == 1:
        return True, 1.0
    if grp == 4:
        return True, 5.0
    return False, 0.0


def to_csr(pattern, data):
    w = pattern.width
    rows = np.repeat(np.arange(pattern.n_rows), w)
    cols = np.asarray(pattern.cols).ravel()
    vals = np.asarray(data).ravel()
    valid = np.asarray(pattern.valid).ravel()
    m = sp.csr_matrix((vals[valid], (rows[valid], cols[valid])),
                      shape=(pattern.n_rows, pattern.n_rows))
    return m


def solve_level(mesh, verbose=True):
    asm = Assembler(mesh, [Unknown("U", "biquadratic"),
                           Unknown("V", "biquadratic"),
                           Unknown("P", "disc_linear")],
                    quad_order="seventh", dtype=jnp.float64)
    asm.set_volume_form(navier_stokes(("U", "V"), "P",
                                      pres_family="disc_linear", nu=0.001))
    generate_bdc(asm, bc_ns)
    assemble = asm.make_assemble_fn()

    u = np.zeros(asm.n_dofs)
    nU = asm.dofmaps["U"].n_dofs
    u[asm.offsets["U"]:asm.offsets["U"] + nU] = inflow_u(
        mesh.coords[asm.dofmaps["U"].nodes, 1])
    u = apply_dirichlet_values(asm, u)

    for it in range(12):
        R, data = assemble(jnp.asarray(u))
        J = to_csr(asm.pattern, data)[:asm.n_dofs, :asm.n_dofs]
        r = np.asarray(R)[:asm.n_dofs]
        rn = np.linalg.norm(r)
        if verbose:
            print(f"  newton {it}: |R| = {rn:.3e}")
        if rn < 1e-12:
            break
        du = spla.spsolve(J.tocsc(), r)
        u = u - du
        if np.linalg.norm(du) < 1e-13 * max(1.0, np.linalg.norm(u)):
            break
    return asm, u


def solve_temperature(mesh, asm_ns, u_ns, verbose=True):
    from femus_tpu.assembly.forms import mass  # noqa: F401

    asmT = Assembler(mesh, [Unknown("T", "biquadratic")],
                     quad_order="seventh", dtype=jnp.float64)
    asmT.add_aux_field("U", "biquadratic")
    asmT.add_aux_field("V", "biquadratic")

    def temp_form(ops, u, aux):
        GT = ops.grad("biquadratic", u["T"])
        Uq = ops.value("biquadratic", aux["U"])
        Vq = ops.value("biquadratic", aux["V"])
        adv = Uq * GT[:, 0] + Vq * GT[:, 1]
        return {"T": 0.001 * ops.tgrad("biquadratic", GT)
                + ops.t("biquadratic", adv)}

    asmT.set_volume_form(temp_form)
    generate_bdc(asmT, bc_T)
    assemble = asmT.make_assemble_fn()

    oU, oV = asm_ns.offsets["U"], asm_ns.offsets["V"]
    nU = asm_ns.dofmaps["U"].n_dofs
    nV = asm_ns.dofmaps["V"].n_dofs
    aux = {"U": jnp.asarray(u_ns[oU:oU + nU]),
           "V": jnp.asarray(u_ns[oV:oV + nV])}

    t = np.zeros(asmT.n_dofs)
    t = apply_dirichlet_values(asmT, t)
    R, data = assemble(jnp.asarray(t), aux_fields=aux)
    J = to_csr(asmT.pattern, data)[:asmT.n_dofs, :asmT.n_dofs]
    r = np.asarray(R)[:asmT.n_dofs]
    dt_ = spla.spsolve(J.tocsc(), r)
    t = t - dt_
    R, _ = assemble(jnp.asarray(t), aux_fields=aux)
    if verbose:
        print(f"  temperature: final |R| = {np.linalg.norm(np.asarray(R)[:asmT.n_dofs]):.3e}")
    return asmT, t


def main():
    mesh = read_neu("/root/reference/unittests/testNSSteadyDD/input/nsbenc.neu")
    for _ in range(3):
        mesh = refine(mesh)
    print("level 3:", mesh.coords.shape[0], "nodes,", mesh.conn.shape[0], "elems")
    asm, u = solve_level(mesh)
    asmT, t = solve_temperature(mesh, asm, u)

    norms = {}
    for name, a, vec in (("U", asm, u), ("V", asm, u), ("P", asm, u),
                         ("T", asmT, t)):
        off, n = a.offsets[name], a.dofmaps[name].n_dofs
        norms[name] = float(np.linalg.norm(vec[off:off + n]))
    for k in ("U", "V", "P", "T"):
        rel = abs(norms[k] - GOLD[k]) / GOLD[k]
        print(f"|{k}| = {norms[k]:.14f}   gold {GOLD[k]:.14f}   rel {rel:.2e}")


if __name__ == "__main__":
    main()
