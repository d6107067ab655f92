"""Geometric multigrid cycles (V/F/W) as jit-native preconditioners.

The reference drives PETSc PCMG (LinearEquationSolverPetsc.cpp:185-290:
MGInit + MGSetLevel with per-level smoother KSPs, interpolation/restriction
matrices, coarse LU).  Here a :class:`MGHierarchy` holds per-level operators
(assembled fine + Galerkin PtAP-scheduled coarse), transfer SpMV pairs and
smoother closures; cycles unroll statically over the (few) levels so XLA sees
one fused graph.

Coarse grids smaller than a threshold collapse to a dense direct solve on one
chip (SURVEY.md §2.4 "coarse-grid solve").
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from .smoothers import chebyshev_smoother, jacobi_smoother, power_lambda_max
from .sparse import SparseOp
from .transfer import PtAPSchedule


def krylov_smoother(A, M_inner: Callable, m: int = 5):
    """Per-level KRYLOV smoother: ``m`` fixed GMRES(m) iterations on the
    level residual, right-preconditioned by one inner sweep (e.g. a Vanka
    block sweep).  This is the reference's per-level smoother design —
    ``MGSetLevel`` installs a KSP (GMRES/Richardson + PC) on every level
    (LinearEquationSolverPetsc.cpp:219-288) — and, unlike a bare
    stationary block sweep, it is residual-MINIMIZING: a Vanka sweep that
    would amplify on a stiff saddle point (measured: >2 sweeps per level
    DIVERGE on the steady-FSI operator) becomes an unconditionally stable
    smoother inside the Krylov envelope."""
    from .krylov import fgmres

    def smooth(b, x):
        r = b - A @ x
        d, _ = fgmres(lambda v: A @ v, r, M=M_inner, tol=1e-30,
                      restart=m, max_restarts=1)
        return x + d

    return smooth


@dataclasses.dataclass
class MGLevel:
    A: SparseOp
    P: Optional[SparseOp] = None          # prolongation from level below (coarse->this)
    R: Optional[SparseOp] = None          # restriction (P^T) to level below
    smoother: Optional[Callable] = None   # smooth(b, x) -> x


@dataclasses.dataclass
class MGHierarchy:
    """levels[0] = coarsest, levels[-1] = finest."""

    levels: List[MGLevel]
    n_pre: int = 2
    n_post: int = 2
    coarse_dense: Optional[jnp.ndarray] = None   # LU-factorable dense coarse A
    compute_dtype: Optional[jnp.dtype] = None    # mixed-precision cycle dtype
    coarse_lu: Optional[tuple] = None            # cached per-trace LU factors
    k_inner: int = 2                             # K-cycle inner FGMRES its

    def setup_coarse(self):
        self.coarse_dense = self.levels[0].A.to_dense()
        self.coarse_lu = None

    def coarse_solve(self, b):
        if self.coarse_dense is not None:
            # NOTE: an explicit lu_factor-once + lu_solve-per-apply hoist
            # was MEASURED SLOWER on TPU (88 vs 68 ms NS Newton step): XLA
            # already CSEs the factorization across the cycle applications
            # of one traced step, and jax.scipy's explicit lu_solve lowers
            # to a worse triangular-solve path than linalg.solve's
            bd = b.astype(self.coarse_dense.dtype)
            return jnp.linalg.solve(self.coarse_dense, bd).astype(b.dtype)
        lv = self.levels[0]
        x = jnp.zeros_like(b)
        for _ in range(20):
            x = lv.smoother(b, x)
        return x

    def v_cycle(self, b, x=None, level: Optional[int] = None):
        l = len(self.levels) - 1 if level is None else level
        lv = self.levels[l]
        x = jnp.zeros_like(b) if x is None else x
        if l == 0:
            return self.coarse_solve(b)
        for _ in range(self.n_pre):
            x = lv.smoother(b, x)
        r = b - lv.A @ x
        rc = lv.R @ r
        ec = self.v_cycle(rc, level=l - 1)
        x = x + lv.P @ ec
        for _ in range(self.n_post):
            x = lv.smoother(b, x)
        return x

    def w_cycle(self, b, x=None, level: Optional[int] = None):
        l = len(self.levels) - 1 if level is None else level
        lv = self.levels[l]
        x = jnp.zeros_like(b) if x is None else x
        if l == 0:
            return self.coarse_solve(b)
        for _ in range(self.n_pre):
            x = lv.smoother(b, x)
        r = b - lv.A @ x
        rc = lv.R @ r
        ec = self.w_cycle(rc, level=l - 1)
        ec = self.w_cycle(rc, ec, level=l - 1)
        x = x + lv.P @ ec
        for _ in range(self.n_post):
            x = lv.smoother(b, x)
        return x

    def f_cycle(self, b, level: Optional[int] = None):
        """Full-MG cycle: restrict the rhs to the coarsest grid, solve, and
        ascend — at each level the prolonged coarse solution seeds one
        V-cycle (reference PCMGSetCycleType PC_MG_CYCLE full / MgType
        F_CYCLE; PETSc 'full' multigrid)."""
        l = len(self.levels) - 1 if level is None else level
        if l == 0:
            return self.coarse_solve(b)
        lv = self.levels[l]
        ec = self.f_cycle(lv.R @ b, level=l - 1)
        return self.v_cycle(b, lv.P @ ec, level=l)

    def k_cycle(self, b, x=None, level: Optional[int] = None,
                k: Optional[int] = None):
        """Krylov-accelerated K-cycle (Notay 2008): like a W-cycle, but the
        coarse-grid correction at every sub-level is computed by ``k``
        FGMRES iterations preconditioned by the sub-hierarchy's own
        K-cycle.  Residual-minimizing at each level, so it stays stable
        where the plain W-cycle's doubled Petrov-Galerkin corrections
        overshoot (measured: W diverges on steady monolithic FSI), and it
        repairs exactly the weak-middle-level failure mode — an inexact
        intermediate correction that a V-cycle cannot compensate."""
        from .krylov import fgmres
        k = self.k_inner if k is None else k
        l = len(self.levels) - 1 if level is None else level
        lv = self.levels[l]
        x = jnp.zeros_like(b) if x is None else x
        if l == 0:
            return self.coarse_solve(b)
        for _ in range(self.n_pre):
            x = lv.smoother(b, x)
        r = b - lv.A @ x
        rc = lv.R @ r
        if l - 1 == 0:
            ec = self.coarse_solve(rc)
        else:
            Ac = self.levels[l - 1].A
            ec, _ = fgmres(lambda v: Ac @ v, rc,
                           M=lambda v: self.k_cycle(v, level=l - 1, k=k),
                           tol=1e-30, restart=k, max_restarts=1)
        x = x + lv.P @ ec
        for _ in range(self.n_post):
            x = lv.smoother(b, x)
        return x

    def additive_cycle(self, b, level: Optional[int] = None):
        """Additive MG (PC_MG_ADDITIVE): every level smooths ITS restriction
        of the SAME residual independently; prolongated corrections sum —
        no inter-level residual updates (reference MGInit ADDITIVE branch,
        LinearEquationSolverPetsc.cpp:205-206)."""
        l = len(self.levels) - 1 if level is None else level
        if l == 0:
            return self.coarse_solve(b)
        lv = self.levels[l]
        x = jnp.zeros_like(b)
        for _ in range(self.n_pre):
            x = lv.smoother(b, x)
        return x + lv.P @ self.additive_cycle(lv.R @ b, level=l - 1)

    def kaskade_cycle(self, b, level: Optional[int] = None):
        """Kaskade / cascadic MG (PC_MG_KASKADE): one coarse-to-fine sweep —
        solve the coarsest restriction, prolongate, smooth, never descend
        again (reference MGInit KASKADE branch, :208-209)."""
        l = len(self.levels) - 1 if level is None else level
        if l == 0:
            return self.coarse_solve(b)
        lv = self.levels[l]
        x = lv.P @ self.kaskade_cycle(lv.R @ b, level=l - 1)
        for _ in range(self.n_pre + self.n_post):
            x = lv.smoother(b, x)
        return x

    def as_preconditioner(self, cycle: str = "V") -> Callable:
        """One cycle as M^{-1} — "V" | "W" | "F" (full MG) | "ADDITIVE" |
        "KASKADE": the reference's MgSmootherType {MULTIPLICATIVE, FULL,
        ADDITIVE, KASKADE} as selected into PETSc PCMGSetType by MGInit
        (LinearEquationSolverPetsc.cpp:185-215), plus the W-cycle.

        If the hierarchy was built with a lower compute_dtype (mixed
        precision), the input residual is cast down, the cycle runs in low
        precision on the MXU/VPU-friendly dtype, and the correction is cast
        back — the outer Krylov stays in the ambient precision, so final
        accuracy is unaffected (the cycle is only a preconditioner); only
        the convergence RATE can change."""
        fn = {"V": self.v_cycle, "W": self.w_cycle, "F": self.f_cycle,
              "K": self.k_cycle, "ADDITIVE": self.additive_cycle,
              "KASKADE": self.kaskade_cycle}[cycle.upper()]
        dt = self.compute_dtype
        if dt is None:
            return lambda r: fn(r)
        return lambda r: fn(r.astype(dt)).astype(r.dtype)


@dataclasses.dataclass
class MatFreeOp:
    """Fine-level operator as a J.v closure (``jax.linearize`` of the
    residual — SURVEY.md §7 design inversion "two matrix paths").  Quacks
    like :class:`SparseOp` where cycles need it (matvec / @)."""

    mv: Callable
    n: int

    @property
    def n_rows(self) -> int:
        return self.n

    def matvec(self, x):
        return self.mv(x)

    def __matmul__(self, x):
        return self.mv(x)


def build_hierarchy_matfree(fine_mv: Callable, fine_diag: jnp.ndarray,
                            next_op: SparseOp,
                            transfers: Sequence,
                            smoother: str = "chebyshev",
                            n_pre: int = 2, n_post: int = 2,
                            jacobi_omega: float = 0.8, cheb_degree: int = 3,
                            dir_masks: Optional[Sequence] = None,
                            vanka_blocks: Optional[Sequence] = None,
                            vanka_omega: float = 0.9,
                            compute_dtype=None) -> MGHierarchy:
    """Hierarchy whose FINEST level is matrix-free: operator = ``fine_mv``
    (J.v via linearized residual, no ELL data materialized), smoother =
    Chebyshev/Jacobi on the scatter-assembled ``fine_diag`` (a Vanka request
    falls back to Chebyshev on the fine level — Vanka needs assembled block
    slots — but still applies on the assembled sub-levels); the first
    coarse level is the ASSEMBLED ``next_op`` (assembled directly on the
    coarse mesh at the restricted state — non-Galerkin rediscretization
    replaces the PtAP that would otherwise need the fine matrix), and
    deeper levels Galerkin-coarsen from it via ``transfers[:-1]``.
    ``transfers[-1]`` supplies only the fine P/R pair."""
    sub = build_hierarchy(next_op, transfers[:-1], smoother=smoother,
                          n_pre=n_pre, n_post=n_post,
                          jacobi_omega=jacobi_omega, cheb_degree=cheb_degree,
                          dir_masks=dir_masks, vanka_blocks=vanka_blocks,
                          vanka_omega=vanka_omega,
                          compute_dtype=compute_dtype)
    safe = jnp.where(jnp.abs(fine_diag) < 1e-30, 1.0, fine_diag)
    if smoother == "jacobi":
        sm = jacobi_smoother(fine_mv, safe, jacobi_omega, iters=1)
    else:
        lam = power_lambda_max(fine_mv, 1.0 / safe, fine_diag.shape[0])
        sm = chebyshev_smoother(fine_mv, safe, lam, degree=cheb_degree)
    P, R = transfers[-1][0], transfers[-1][1]
    levels = sub.levels + [MGLevel(MatFreeOp(fine_mv, fine_diag.shape[0]),
                                   P, R, sm)]
    h = MGHierarchy(levels, n_pre, n_post, compute_dtype=compute_dtype)
    h.coarse_dense = sub.coarse_dense
    return h


def build_hierarchy_from_ops(ops: Sequence[SparseOp],
                             pr_pairs: Sequence,
                             smoother: str = "chebyshev",
                             n_pre: int = 2, n_post: int = 2,
                             jacobi_omega: float = 0.8, cheb_degree: int = 3,
                             vanka_blocks: Optional[Sequence] = None,
                             vanka_omega: float = 0.9,
                             krylov_m: int = 5,
                             vanka_multiplicative: bool = True,
                             compute_dtype=None) -> MGHierarchy:
    """Hierarchy from EXPLICIT per-level operators (coarsest first) —
    the non-Galerkin / rediscretized-coarse mode: each level's operator is
    assembled on its own mesh instead of PtAP-chained from the finest.
    This is the working analogue of the reference's FSI-specific restriction
    (MonolithicFSINonLinearImplicitSystem.hpp:83-101): chained Galerkin
    triple products pollute the FSI operator's mixed ALE/kinematic rows,
    while per-level re-assembly keeps every operator consistent.
    ``pr_pairs[l]`` = (P, R) connecting level l to l+1."""
    n_levels = len(ops)
    levels = []
    for l in range(n_levels):
        A = ops[l]
        if compute_dtype is not None:
            A = SparseOp(A.data.astype(compute_dtype), A.cols, A.n_cols)
        diag = A.diagonal()
        safe = jnp.where(jnp.abs(diag) < 1e-30, 1.0, diag)
        if (smoother == "vanka" and vanka_blocks is not None
                and vanka_blocks[l] is not None):
            from .vanka import vanka_smoother
            sm = vanka_smoother(A, vanka_blocks[l], omega=vanka_omega)
        elif smoother == "jacobi":
            sm = jacobi_smoother(A.matvec, safe, jacobi_omega, iters=1)
        else:
            lam = power_lambda_max(A.matvec, 1.0 / safe, A.n_rows)
            sm = chebyshev_smoother(A.matvec, safe, lam, degree=cheb_degree)
        P = R = None
        if l > 0:
            P, R = pr_pairs[l - 1][0], pr_pairs[l - 1][1]
        levels.append(MGLevel(A, P, R, sm))
    h = MGHierarchy(levels, n_pre, n_post, compute_dtype=compute_dtype)
    h.setup_coarse()
    return h


def apply_dirichlet_identity(op: SparseOp, valid, mask) -> SparseOp:
    """Zero rows/cols at masked dofs and put 1 on their diagonal (symmetric
    elimination, matching assembly/engine.py)."""
    rows = jnp.arange(op.n_rows)[:, None]
    bad = mask[rows] | mask[op.cols]
    ident = (op.cols == rows) & mask[rows] & valid
    data = jnp.where(bad, jnp.where(ident, 1.0, 0.0), op.data)
    return SparseOp(data, op.cols, op.n_cols)


def build_hierarchy(fine_op: SparseOp,
                    transfers: Sequence,      # [(P_op, R_op, ptap_schedule)] coarse->fine order
                    smoother: str = "chebyshev",
                    n_pre: int = 2, n_post: int = 2,
                    jacobi_omega: float = 0.8,
                    cheb_degree: int = 3,
                    dir_masks: Optional[Sequence] = None,
                    vanka_blocks: Optional[Sequence] = None,
                    vanka_omega: float = 0.9,
                    krylov_m: int = 5,
                    vanka_multiplicative: bool = True,
                    compute_dtype=None,
                    coarse_dense_max: Optional[int] = None,
                    bell_plans: Optional[Sequence] = None) -> MGHierarchy:
    """Construct the hierarchy from the finest assembled op via PtAP chain.

    transfers[i] connects level i (coarse) to level i+1 (fine); the finest
    level is len(transfers).  dir_masks (coarse->fine, excluding finest —
    the fine op arrives already eliminated) restores identity rows on the
    Galerkin-coarsened operators.  bell_plans (coarse->fine, len n_levels,
    entries BellDev or None) re-lays each level's matvec onto the
    blocked-ELL slab (algebra/bell.py) — PtAP and smoother block extraction
    keep reading the ELL side of the wrapped operators.
    """
    n_levels = len(transfers) + 1
    ops = [None] * n_levels
    ops[-1] = fine_op
    for l in range(n_levels - 2, -1, -1):
        sched: PtAPSchedule = transfers[l][2]
        data_c = sched.apply(ops[l + 1].data)
        ccols = (sched.coarse_cols if sched.coarse_cols is not None
                 else jnp.asarray(sched.coarse_pattern.cols))
        cvalid = (sched.coarse_valid if sched.coarse_valid is not None
                  else jnp.asarray(sched.coarse_pattern.valid))
        op_c = SparseOp(data_c, ccols, sched.coarse_pattern.n_cols)
        if dir_masks is not None and dir_masks[l] is not None:
            op_c = apply_dirichlet_identity(op_c, cvalid,
                                            jnp.asarray(dir_masks[l]))
        ops[l] = op_c
    P_ops = [t[0] for t in transfers]
    R_ops = [t[1] for t in transfers]
    if compute_dtype is not None:
        # mixed precision: PtAP coarsening above ran in ambient precision;
        # the cycle's operators, transfers, and smoothers run low-precision
        ops = [SparseOp(A.data.astype(compute_dtype), A.cols, A.n_cols)
               for A in ops]
        P_ops = [SparseOp(P.data.astype(compute_dtype), P.cols, P.n_cols)
                 for P in P_ops]
        R_ops = [SparseOp(R.data.astype(compute_dtype), R.cols, R.n_cols)
                 for R in R_ops]
    if bell_plans is not None:
        from .bell import BellBackedOp, bell_backed
        ops = [bell_backed(bp, A)
               if (bp is not None and not isinstance(A, BellBackedOp)) else A
               for bp, A in zip(bell_plans, ops)]
    levels = []
    for l in range(n_levels):
        A = ops[l]
        diag = A.diagonal()
        # guard zero diagonals (e.g. pressure block) for smoother scaling
        safe = jnp.where(jnp.abs(diag) < 1e-30, 1.0, diag)
        if (smoother in ("vanka", "vanka_gmres")
                and vanka_blocks is not None
                and vanka_blocks[l] is not None):
            from .vanka import vanka_smoother
            sm = vanka_smoother(A, vanka_blocks[l], omega=vanka_omega,
                                multiplicative=vanka_multiplicative)
            if smoother == "vanka_gmres":
                sm = krylov_smoother(
                    A, (lambda r, _s=sm: _s(r, jnp.zeros_like(r))),
                    m=krylov_m)
        elif smoother == "jacobi":
            sm = jacobi_smoother(A.matvec, safe, jacobi_omega, iters=1)
        else:
            lam = power_lambda_max(A.matvec, 1.0 / safe, A.n_rows)
            sm = chebyshev_smoother(A.matvec, safe, lam, degree=cheb_degree)
        P = R = None
        if l > 0:
            P, R = P_ops[l - 1], R_ops[l - 1]
        levels.append(MGLevel(A, P, R, sm))
    h = MGHierarchy(levels, n_pre, n_post, compute_dtype=compute_dtype)
    if coarse_dense_max is None or levels[0].A.n_rows <= coarse_dense_max:
        h.setup_coarse()          # else: coarse solve = repeated smoothing
    if compute_dtype is not None and h.coarse_dense is not None:
        # bf16 dense solves are unsupported/inaccurate; fp32 minimum
        cd = (jnp.float32 if compute_dtype == jnp.bfloat16 else compute_dtype)
        h.coarse_dense = h.coarse_dense.astype(cd)
        h.coarse_lu = None
    return h
