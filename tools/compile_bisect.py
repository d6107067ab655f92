"""Bisect which HLO constructs compile slowly on the axon TPU toolchain.

Writes timing lines to tools/compile_bisect.out as each case finishes.
"""
import time, sys, os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import jax.numpy as jnp
import numpy as np

OUT = open("/root/repo/tools/compile_bisect.out", "a", buffering=1)

def case(name, fn):
    t0 = time.time()
    try:
        r = fn()
        jax.block_until_ready(r)
        OUT.write(f"{name}: {time.time()-t0:.1f}s\n")
    except Exception as e:
        OUT.write(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}\n")

ne, nq, nd = 72, 25, 22
phi = jnp.asarray(np.random.rand(nq, nd).astype(np.float32))
dphi = jnp.asarray(np.random.rand(nq, 9, 2).astype(np.float32))
u = jnp.ones((ne, nd))
c = jnp.ones((ne, 9, 2))

def res(ul, cl):
    J = jnp.einsum("qnd,nx->qdx", dphi, cl)
    detJ = jnp.linalg.det(J)
    invJ = jnp.linalg.inv(J)
    g = jnp.einsum("qnd,qxd->qnx", jnp.tile(dphi, (1, 3, 1))[:, :nd], invJ)
    q = phi @ ul
    return phi.T @ (q * q * detJ) + jnp.einsum("qnx,qx->n", g, g.sum(1))

case("vmap_residual", lambda: jax.jit(jax.vmap(res))(u, c))
case("vmap_jacfwd_residual", lambda: jax.jit(jax.vmap(jax.jacfwd(res)))(u, c))

idx = jnp.asarray(np.random.randint(0, 5000, size=(ne * nd,)))
case("scatter_add", lambda: jax.jit(lambda v: jnp.zeros(5000).at[idx].add(v))(jnp.ones(ne * nd)))

slots = jnp.asarray(np.random.randint(0, 200000, size=(ne * nd * nd,)))
case("scatter_add_jac", lambda: jax.jit(lambda v: jnp.zeros(200000).at[slots].add(v.ravel(), mode='drop'))(jnp.ones((ne, nd, nd))))

def spmv_like():
    data = jnp.ones((4000, 25)); cols = jnp.asarray(np.random.randint(0, 4000, size=(4000, 25)))
    x = jnp.ones(4000)
    return jax.jit(lambda d, cc, xx: (d * xx[cc]).sum(-1))(data, cols, x)
case("ell_spmv", spmv_like)

def gmres_case():
    from femus_tpu.algebra.krylov import gmres
    n = 1000
    d = jnp.linspace(1, 2, n)
    A = lambda x: d * x
    b = jnp.ones(n)
    return jax.jit(lambda b: gmres(A, b, restart=20, max_restarts=3)[0])(b)
case("gmres", gmres_case)

def lstsq_case():
    H = jnp.ones((21, 20)) + jnp.eye(21, 20)
    e = jnp.ones(21)
    return jax.jit(lambda H, e: jnp.linalg.lstsq(H, e)[0])(H, e)
case("lstsq", lstsq_case)

def linalg_case():
    J = jnp.tile(jnp.eye(2)[None, None], (ne, nq, 1, 1))
    return jax.jit(lambda J: (jnp.linalg.inv(J), jnp.linalg.det(J)))(J)
case("batched_inv_det", linalg_case)

def while_case():
    def cond(s): return (s[1] < 50) & (jnp.linalg.norm(s[0]) > 1e-10)
    def body(s): return (s[0] * 0.9, s[1] + 1)
    return jax.jit(lambda x: jax.lax.while_loop(cond, body, (x, 0)))(jnp.ones(1000))
case("while_loop", while_case)

OUT.write("DONE\n")
