"""System hierarchy: linear / nonlinear implicit systems with geometric-MG
preconditioned Krylov solves.

Reference equivalents:
- ``System`` (System.hpp:51): named equation container, unknown list, user
  assemble callback.
- ``LinearImplicitSystem`` (LinearImplicitSystem.cpp:138 init, :288 MGsolve,
  :468 Vcycle): per-level operators, Galerkin coarse ops (matrix_PtAP), MG
  cycles, V_CYCLE (finest only) and F_CYCLE (coarse-to-fine ratchet) drive.
- ``NonLinearImplicitSystem`` (NonLinearImplicitSystem.cpp:157): outer Newton
  loop with per-variable relative-eps convergence (:113-153) and NaN "bit
  flip" restart (LinearImplicitSystem.cpp:415-449).

TPU design: each level owns ONE jitted solve step
(assemble -> PtAP chain -> MG-preconditioned GMRES/CG -> correction); the
Newton/F-cycle drive is a short host loop around it.
"""
from __future__ import annotations

import dataclasses
import time as _time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly.engine import Assembler, Unknown
from ..algebra.krylov import cg, gmres
from ..algebra.mg import apply_dirichlet_identity, build_hierarchy
from ..algebra.transfer import (block_diag_prolongation, build_ptap_schedule,
                                mask_prolongation, op_pair_from_scipy)
from .solution import DIRICHLET, MultiLevelSolution


@dataclasses.dataclass
class SolverConfig:
    outer: str = "gmres"            # "gmres" | "cg"
    rtol: float = 1e-8
    atol: float = 1e-50
    restart: int = 30
    max_outer: int = 20             # GMRES restarts / CG maxiter scale
    smoother: str = "chebyshev"     # "chebyshev" | "jacobi" | "vanka"
    n_pre: int = 2
    n_post: int = 2
    cheb_degree: int = 3
    # vanka/ASM block smoother (reference FEMuS_ASM + SetElementBlockNumber)
    vanka_block_elems: int = 2
    vanka_omega: float = 0.9
    # "vanka_gmres" (parity-only; not recommended): wraps the block sweep
    # in krylov_m fixed GMRES iterations per level, mirroring the
    # reference's per-level KSP smoother (MGSetLevel,
    # LinearEquationSolverPetsc.cpp:219-288).  Measured NO better than bare
    # "vanka" on the steady-FSI hierarchy (its design case) at ~krylov_m x
    # the cost — prefer "vanka"/"chebyshev"; any inner-Krylov smoother also
    # forces the FGMRES outer (nonlinear preconditioner)
    krylov_m: int = 5               # inner iterations of "vanka_gmres"
    # multiplicative (colored Gauss-Seidel sweeps, 1 residual refresh per
    # color) vs additive (single batched sweep with overlap averaging —
    # ~n_colors x fewer matvecs per smooth, needs omega ~0.5)
    vanka_multiplicative: bool = True
    # None = blocks sweep all elements; "material" = blocks never span two
    # element groups (reference MeshASMPartitioning block_type_range -- the
    # FSI fluid/solid split)
    vanka_groups: Optional[object] = None
    mg_type: str = "V"              # "V" | "F" (F = coarse-to-fine ratchet)
    # cycle shape of ONE preconditioner application (reference MgType
    # {V_CYCLE, F_CYCLE, M_CYCLE}, MgTypeEnum.hpp; PETSc PCMGSetCycleType in
    # MGInit, LinearEquationSolverPetsc.cpp:185-210): "V" | "W" | "F"
    # (F = full-MG: coarse solve first, then ascend with a V-cycle per level)
    mg_cycle: str = "V"
    use_mg: bool = True
    # operator path (SURVEY.md §7 design inversion "two matrix paths"):
    # "assembled" = ELL data + PtAP Galerkin chain (reference semantics);
    # "matrix_free" = finest-level J.v via jax.linearize of the residual (no
    # fine ELL data materialized), Chebyshev on a scatter-assembled diagonal,
    # first coarse level re-assembled on its own mesh at the restricted state;
    # "bell" = assembled semantics, but every Krylov/smoother matvec rides
    # the blocked-ELL slab (algebra/bell.py — the general-unstructured TPU
    # fast path; ~60x the ELL gather SpMV on unstructured operators);
    # "patch" = patch-lattice stencils on refined hierarchies
    operator: str = "assembled"
    # dof ordering for the operator="bell" slabs: "identity" trusts the mesh
    # numbering (no per-matvec permutes; combine with
    # mesh.reorder.rcm_reorder for unstructured meshes), "rcm" reorders at
    # plan build (densest slabs, two n-element gathers per matvec).  With
    # "identity", a plan whose slab exceeds ~24x the ELL bytes is rebuilt
    # with RCM automatically (nonlocal numberings would otherwise blow HBM)
    bell_order: str = "identity"
    # coarse operators inside the V-cycle: "galerkin" = PtAP chain from the
    # fine Jacobian (reference matrix_PtAP); "rediscretize" = re-assemble
    # each coarse level on its own mesh at the restricted state — the
    # working analogue of the reference's FSI-specific non-Galerkin
    # restriction (MonolithicFSINonLinearImplicitSystem.hpp:83-101): on
    # monolithic FSI, chained PtAP pollutes the mixed ALE/kinematic rows
    coarse_op: str = "galerkin"
    # cap on V-cycle depth: K = use only the top K mesh levels as the
    # preconditioner hierarchy (0 = unlimited).  The truncated coarsest
    # level is solved by repeated smoother sweeps when too large for the
    # dense direct solve (reference PCMG with fewer levels than meshes)
    max_mg_levels: int = 0
    # dofs above which the (possibly truncated) coarsest level of a V-cycle
    # hierarchy uses smoother sweeps instead of a dense LU
    coarse_dense_max_dofs: int = 20000
    # coarsest-level direct solve (reference PCMGGetCoarseSolve -> LU,
    # LinearEquationSolverPetsc.cpp:236-239); dofs below this threshold are
    # solved densely on-device instead of by preconditioned Krylov
    coarse_direct_max_dofs: int = 20000
    # node-major interleaved stacked layout (assembly/engine.py
    # ``interleave``): banded patterns for the BELL fast path with no
    # per-matvec permutes; logical per-variable offsets stay the API.
    # Incompatible with operator="patch"/"matrix_free" and
    # coarse_op="rediscretize" (those paths address raw slabs)
    interleave_dofs: bool = False
    # nonlinear
    max_nonlinear: int = 15
    nonlinear_tol: float = 1e-8
    # print the solver_info() line (configuration + operator auto-routing
    # decisions) once per solve — the reference's per-run solver print
    # (LinearEquationSolverPetsc.cpp:296-352)
    verbose: bool = False


class System:
    """Base equation system bound to a MultiLevelProblem."""

    def __init__(self, problem, name: str):
        self.problem = problem
        self.name = name
        self.unknown_names: List[str] = []
        self.volume_form: Optional[Callable] = None
        self.face_form: Optional[Callable] = None
        self.aux_specs: List[Tuple[str, str, bool]] = []  # (sol var, alias, use_old)
        self.aux_scalars: Dict[str, float] = {}
        self.config = SolverConfig()
        self._initialized = False
        self.timing = {"assembly": 0.0, "solve": 0.0}

    # ---- reference API surface ---------------------------------------
    def add_unknown(self, *names: str) -> None:
        """AddSolutionToSystemPDE (System.hpp:147)."""
        self.unknown_names.extend(names)

    def set_assembly(self, volume_form: Callable,
                     face_form: Optional[Callable] = None) -> None:
        """SetAssembleFunction (System.hpp:116) — here a pure weak form."""
        self.volume_form = volume_form
        self.face_form = face_form

    def add_aux_field(self, sol_var: str, alias: Optional[str] = None,
                      old: bool = False) -> None:
        """Expose another solution variable (or its old value) to the form."""
        self.aux_specs.append((sol_var, alias or (sol_var + ("_old" if old else "")), old))

    def set_scalar(self, **kw) -> None:
        self.aux_scalars.update(kw)

    # ---- setup --------------------------------------------------------
    @property
    def ml_sol(self) -> MultiLevelSolution:
        return self.problem.ml_sol

    @property
    def ml_mesh(self):
        return self.problem.ml_mesh

    def init(self) -> None:
        """Build per-level assemblers, masks, transfers, jitted steps
        (reference LinearImplicitSystem::init + BuildProlongatorMatrix)."""
        ml_sol = self.ml_sol
        self.unknowns = [Unknown(n, ml_sol.vars[n].family) for n in self.unknown_names]
        self.assemblers: List[Assembler] = []
        self.masks: List[np.ndarray] = []
        if self.config.operator == "patch":
            # patch-stencil operators (algebra/patchstencil.py): refined
            # levels assemble straight into batched lattice stencils; the
            # coarse level stays ELL.  PtAP cannot consume the patch layout,
            # so coarse V-cycle operators are re-assembled per level.
            assert self.config.coarse_op == "rediscretize" or \
                not self.config.use_mg, \
                "operator='patch' needs coarse_op='rediscretize'"
            assert self.config.smoother in ("jacobi", "chebyshev"), \
                "operator='patch': jacobi/chebyshev smoothers only"
        if self.config.interleave_dofs:
            assert self.config.operator in ("assembled", "bell") and \
                self.config.coarse_op == "galerkin", \
                "interleave_dofs needs assembled/bell operators + Galerkin"
        for l, mesh in enumerate(self.ml_mesh.levels):
            a = Assembler(mesh, self.unknowns, quad_order=self.problem.quad_order,
                          interleave=self.config.interleave_dofs)
            a.set_volume_form(self.volume_form)
            if (self.config.operator == "patch"
                    and getattr(mesh, "patch_plan", None) is not None):
                a.set_patch_layout(mesh.patch_plan)
            if self.face_form is not None:
                a.set_face_form(self.face_form)
            for (svar, alias, old) in self.aux_specs:
                a.add_aux_field(alias, ml_sol.vars[svar].family)
            mask = np.zeros(a.n_dofs, bool)
            vals = np.zeros(a.n_dofs)
            for u in self.unknowns:
                codes = ml_sol.bdc[l].get(u.name)
                if codes is None:
                    continue
                off = a.offsets[u.name]
                sel = codes == DIRICHLET
                mask[off:off + len(codes)][sel] = True
                vals[off:off + len(codes)][sel] = ml_sol.bdc_value[l][u.name][sel]
            a.set_dirichlet(mask, vals)
            self.assemblers.append(a)
            self.masks.append(a.dirichlet_mask)
        # transfers, chained top-down so each schedule consumes the actual
        # ELL pattern of the level above
        n_levels = len(self.ml_mesh.levels)
        self.transfers = [None] * (n_levels - 1)
        pat_above = self.assemblers[-1].pattern
        self._transfer_cache: Dict[int, list] = {}
        for l in range(n_levels - 2, -1, -1):
            self.transfers[l] = self._build_transfer(l, pat_above)
            pat_above = self.transfers[l][2].coarse_pattern
        # F-cycle needs transfers consistent per sub-hierarchy: the PtAP chain
        # above is for the full finest pattern; per-level chains built lazily.
        self._step_fns: Dict[int, Callable] = {}
        self._solution_P = {}      # unmasked prolongation for solution transfer
        self._initialized = True

    # ---- stacked vector <-> ml_sol ------------------------------------
    def gather(self, level: int = -1) -> np.ndarray:
        a = self.assemblers[level]
        out = np.zeros(a.n_dofs)
        for u in self.unknowns:
            off = a.offsets[u.name]
            s = self.ml_sol.sol[level][u.name]
            out[off:off + len(s)] = s
        if a.stack_perm is not None:          # logical -> physical
            phys = np.zeros(a.n_dofs)
            phys[a.stack_perm] = out
            return phys
        return out

    def scatter(self, x: np.ndarray, level: int = -1) -> None:
        a = self.assemblers[level]
        x = np.asarray(x)
        if a.stack_perm is not None:          # physical -> logical
            x = x[a.stack_perm]
        for u in self.unknowns:
            off = a.offsets[u.name]
            n = self.ml_sol.n_dofs(u.name, level)
            self.ml_sol.sol[level][u.name][:] = x[off:off + n]

    def _aux_arrays(self, level: int) -> Dict[str, jnp.ndarray]:
        out = {}
        for (svar, alias, old) in self.aux_specs:
            src = self.ml_sol.sol_old if old else self.ml_sol.sol
            out[alias] = jnp.asarray(src[level][svar])
        return out

    def _aux_scalars_traced(self) -> Dict[str, jnp.ndarray]:
        return {k: jnp.asarray(v) for k, v in self.aux_scalars.items()}

    # ---- per-level jitted solve step ----------------------------------
    def _route_note(self, **kw) -> None:
        """Record an operator auto-routing decision for solver telemetry
        (the reference prints its per-run solver configuration,
        LinearEquationSolverPetsc.cpp:296-352; here the decisions land in
        ``solver_info()`` so a user can tell WHICH matvec path a solve
        took)."""
        notes = getattr(self, "_routing_notes", None)
        if notes is None:
            notes = self._routing_notes = []
        notes.append(kw)

    def solver_info(self) -> Dict:
        """Solver configuration + recorded operator-routing decisions
        (bell/ell per pattern size, identity vs RCM-rescue ordering)."""
        cfg = self.config
        return {
            "system": self.name,
            "outer": cfg.outer, "operator": cfg.operator,
            "smoother": cfg.smoother, "mg_type": cfg.mg_type,
            "mg_cycle": cfg.mg_cycle, "n_pre": cfg.n_pre,
            "n_post": cfg.n_post, "rtol": cfg.rtol,
            "restart": cfg.restart, "max_outer": cfg.max_outer,
            "interleave_dofs": cfg.interleave_dofs,
            "routing": list(getattr(self, "_routing_notes", [])),
        }

    def _bell_dev(self, pattern):
        """Cached BELL device plan for an operator pattern (operator="bell");
        None below the size where the ELL gather is already cheap.  Every
        auto-routing decision (small-operator ELL fallback, identity->RCM
        rescue) is recorded via ``_route_note`` and surfaced in
        ``solver_info()``."""
        if pattern.n_rows < 2048:
            self._route_note(n_rows=pattern.n_rows, path="ell",
                             reason="below bell threshold (2048 rows)")
            return None
        cache = getattr(self, "_bell_plans", None)
        if cache is None:
            cache = self._bell_plans = {}
        # EllPattern is eq=False (identity hash), so the pattern object
        # itself is the key — and the dict entry pins it alive, unlike an
        # id() key that could be reused after garbage collection
        key = pattern
        if key not in cache:
            from ..algebra.bell import build_bell_plan
            order = self.config.bell_order
            plan = build_bell_plan(
                pattern, perm="identity" if order == "identity" else None)
            if order == "identity" and plan.nnz_bytes_ratio > 24.0:
                ratio = plan.nnz_bytes_ratio
                plan = build_bell_plan(pattern)        # RCM rescue
                self._route_note(
                    n_rows=pattern.n_rows, path="bell", order="rcm-rescue",
                    reason=f"identity slab {ratio:.1f} B/nnz > 24.0, "
                           f"rebuilt with RCM ({plan.nnz_bytes_ratio:.1f})")
            else:
                self._route_note(n_rows=pattern.n_rows, path="bell",
                                 order=order)
            cache[key] = plan.device()
        return cache[key]

    def _make_transfer_pair(self, l: int):
        """RAW (unmasked, logical-layout) scipy (P, R) for level l -> l+1;
        R=None means P^T (Galerkin).  ``MonolithicFSISystem`` overrides
        this with the FSI Petrov-Galerkin restriction (_RR pairing).
        ``_build_transfer`` permutes into the physical frame (interleaved
        layouts) and applies the essential-dof masking."""
        P = block_diag_prolongation(self.ml_mesh.levels[l],
                                    self.ml_mesh.levels[l + 1], self.unknowns)
        return P, None

    def _permute_transfer(self, M, row_perm, col_perm):
        """Reindex a (rows x cols) scipy transfer into the physical frame."""
        import scipy.sparse as sp_
        if row_perm is None and col_perm is None:
            return M
        coo = M.tocoo()
        r = coo.row if row_perm is None else row_perm[coo.row]
        c = coo.col if col_perm is None else col_perm[coo.col]
        out = sp_.csr_matrix((coo.data, (r, c)), shape=M.shape)
        out.sort_indices()
        return out

    def _build_transfer(self, l: int, pat_above):
        """(P_op, R_op, coarse schedule) for level l -> l+1 against the
        fine-side pattern ``pat_above`` (reference BuildProlongatorMatrix +
        matrix_PtAP / matrix_ABC, LinearImplicitSystem.cpp:345-370)."""
        P, R = self._make_transfer_pair(l)
        pf = self.assemblers[l + 1].stack_perm
        pc = self.assemblers[l].stack_perm
        if pf is not None or pc is not None:
            P = self._permute_transfer(P, pf, pc)
            if R is not None:
                R = self._permute_transfer(R, pc, pf)
        # essential-dof masking happens in the PHYSICAL frame (self.masks
        # are the assemblers' physical dirichlet masks)
        Pm = mask_prolongation(P, self.masks[l + 1], self.masks[l])
        Rm = (mask_prolongation(R, self.masks[l], self.masks[l + 1]).tocsr()
              if R is not None else None)
        Pop, Rop = op_pair_from_scipy(Pm, R=Rm)
        sched = build_ptap_schedule(pat_above, Pm, R=Rm)
        return (Pop, Rop, sched)

    def _transfers_for(self, level: int):
        """PtAP-chained transfers for a hierarchy whose finest level is
        ``level`` (cached)."""
        n_levels = len(self.ml_mesh.levels)
        if level < 0:
            level += n_levels
        if level in self._transfer_cache:
            return self._transfer_cache[level]
        if level == n_levels - 1:
            tr = self.transfers
        else:
            tr = [None] * level
            pat_above = self.assemblers[level].pattern
            for l in range(level - 1, -1, -1):
                tr[l] = self._build_transfer(l, pat_above)
                pat_above = tr[l][2].coarse_pattern
        self._transfer_cache[level] = tr
        return tr

    def step_fn(self, level: int = -1) -> Callable:
        """Jitted (u, aux_fields) -> (u_new, lin_res, lin_iters)."""
        n_levels = len(self.ml_mesh.levels)
        if level < 0:
            level += n_levels
        if level in self._step_fns:
            return self._step_fns[level]
        a = self.assemblers[level]
        assemble = a.make_assemble_fn(pass_tables=True)
        cfg = self.config
        transfers = self._transfers_for(level) if (cfg.use_mg and level > 0) else []
        base = 0                       # coarsest mesh level in the hierarchy
        if transfers and cfg.max_mg_levels and cfg.max_mg_levels >= 2:
            base = max(0, level - (cfg.max_mg_levels - 1))
            transfers = transfers[base:]
        dmasks = [jnp.asarray(m) for m in self.masks[base:level]]

        rediscretize = cfg.coarse_op == "rediscretize" and bool(transfers)
        assert not (rediscretize and cfg.max_mg_levels), \
            "rediscretize with truncated hierarchies is not wired up"

        vblocks = None
        if cfg.smoother in ("vanka", "vanka_gmres"):
            from ..algebra.vanka import build_element_blocks
            if transfers:
                vblocks = []
                for j, l in enumerate(range(base, level + 1)):
                    # galerkin coarse ops live on the PtAP pattern;
                    # rediscretized ones on each level's own assembler pattern
                    pat = (transfers[j][2].coarse_pattern
                           if (j < len(transfers) and not rediscretize)
                           else None)
                    vblocks.append(build_element_blocks(
                        self.assemblers[l], cfg.vanka_block_elems, pattern=pat,
                        groups=cfg.vanka_groups))
            else:
                vblocks = [build_element_blocks(a, cfg.vanka_block_elems,
                                                groups=cfg.vanka_groups)]

        # the coarsest level of an MG drive gets a direct dense solve, like
        # the reference's PCMG coarse LU — a Vanka/Jacobi-preconditioned
        # Krylov on the coarsest saddle point can stagnate and poison the
        # F-cycle ratchet
        coarse_direct = (not transfers and cfg.use_mg
                         and a.n_dofs_pad <= cfg.coarse_direct_max_dofs
                         and n_levels > 1)

        if cfg.operator == "matrix_free" and not coarse_direct:
            run = self._matrix_free_step(level, a, cfg, transfers, dmasks)
            self._step_fns[level] = run
            return run

        # blocked-ELL fast matvecs (operator="bell"): device plans per
        # hierarchy level, passed through jit as pytree arguments
        bell_fine = None
        bell_coarse = None
        if cfg.operator == "bell" and not coarse_direct:
            bell_fine = self._bell_dev(a.pattern)
            if transfers and rediscretize:
                bell_coarse = [self._bell_dev(self.assemblers[l].pattern)
                               for l in range(base, level)]
            elif transfers:
                bell_coarse = [self._bell_dev(t[2].coarse_pattern)
                               for t in transfers]

        # rediscretized coarse side: per-level assemble fns + state
        # restriction chain (u_{l} = (P^T u_{l+1}) / (P^T 1), unmasked P)
        coarse_assemble = rsol_chain = None
        if rediscretize:
            coarse_assemble = [self.assemblers[l].make_assemble_fn(
                pass_tables=True) for l in range(level)]
            rsol_chain = []
            for l in range(level):
                P_sol = block_diag_prolongation(self.ml_mesh.levels[l],
                                                self.ml_mesh.levels[l + 1],
                                                self.unknowns)
                _, Rsol = op_pair_from_scipy(P_sol.tocsr())
                w = np.asarray(P_sol.sum(axis=0)).ravel()
                winv = jnp.asarray(np.where(np.abs(w) > 1e-14,
                                            1.0 / np.maximum(np.abs(w), 1e-14),
                                            0.0))
                rsol_chain.append((Rsol, winv))

        # transfers (PtAP schedules, P/R operators), Vanka block tables, and
        # Dirichlet masks are passed through jit as ARGUMENTS (pytrees) —
        # baked-in constants of their size (tens of M entries on fine
        # levels) stall XLA constant folding for minutes per compile
        def step(u, tables, aux_fields, aux_scalars, transfers_a, dmasks_a,
                 vblocks_a, ctables_a, caux_a, rsol_a, bell_f_a, bell_c_a,
                 extra_rhs):
            R, data = assemble(u, tables, aux_fields, aux_scalars)
            A = a.op_with(data, tables.get("ell_cols"))
            if bell_f_a is not None:
                from ..algebra.bell import bell_backed
                A = bell_backed(bell_f_a, A)
            if coarse_direct:
                Ad = A.to_dense()
                delta = jnp.linalg.solve(Ad, -R)
                res = jnp.linalg.norm(R + A @ delta)
                if extra_rhs is not None:
                    D = jnp.linalg.solve(Ad, extra_rhs)
                    return u + delta, delta, res, jnp.array(1), D
                return u + delta, delta, res, jnp.array(1)
            if transfers and rediscretize:
                from ..algebra.mg import build_hierarchy_from_ops
                ops = [None] * (level + 1)
                ops[level] = A
                u_l = u
                for l in range(level - 1, -1, -1):
                    Rsol_l, winv_l = rsol_a[l]
                    u_c0 = (Rsol_l @ u_l[:Rsol_l.n_cols]) * winv_l
                    a_c = self.assemblers[l]
                    u_l = (jnp.zeros(a_c.n_dofs_pad, u.dtype)
                           .at[:u_c0.shape[0]].set(u_c0))
                    _, data_l = coarse_assemble[l](u_l, ctables_a[l],
                                                   caux_a[l], aux_scalars)
                    ops[l] = a_c.op_with(data_l,
                                          ctables_a[l].get("ell_cols"))
                    if bell_c_a is not None and bell_c_a[l] is not None:
                        from ..algebra.bell import bell_backed
                        ops[l] = bell_backed(bell_c_a[l], ops[l])
                pr = [(t[0], t[1]) for t in transfers_a]
                h = build_hierarchy_from_ops(
                    ops, pr, smoother=cfg.smoother, n_pre=cfg.n_pre,
                    n_post=cfg.n_post, cheb_degree=cfg.cheb_degree,
                    vanka_blocks=vblocks_a, vanka_omega=cfg.vanka_omega,
                    krylov_m=cfg.krylov_m,
                    vanka_multiplicative=cfg.vanka_multiplicative)
                M = h.as_preconditioner(cfg.mg_cycle)
            elif transfers:
                h = build_hierarchy(A, transfers_a, smoother=cfg.smoother,
                                    n_pre=cfg.n_pre, n_post=cfg.n_post,
                                    cheb_degree=cfg.cheb_degree,
                                    dir_masks=dmasks_a,
                                    vanka_blocks=vblocks_a,
                                    vanka_omega=cfg.vanka_omega,
                                    krylov_m=cfg.krylov_m,
                                    vanka_multiplicative=cfg.vanka_multiplicative,
                                    coarse_dense_max=cfg.coarse_dense_max_dofs,
                                    bell_plans=(None if bell_c_a is None
                                                else list(bell_c_a) + [None]))
                M = h.as_preconditioner(cfg.mg_cycle)
            elif cfg.smoother in ("vanka", "vanka_gmres"):
                from ..algebra.vanka import vanka_smoother
                sm = vanka_smoother(A, vblocks_a[0], omega=cfg.vanka_omega)
                M = lambda r: sm(jnp.zeros_like(r), r)
            else:
                d = A.diagonal()
                dsafe = jnp.where(jnp.abs(d) < 1e-30, 1.0, d)
                M = lambda r: r / dsafe
            if cfg.outer == "cg":
                solve1 = lambda b: cg(A.matvec, b, M=M, tol=cfg.rtol,
                                      atol=cfg.atol,
                                      maxiter=cfg.max_outer * cfg.restart)
            elif cfg.smoother == "vanka_gmres" or \
                    cfg.mg_cycle.upper() == "K":
                # inner-Krylov smoothers / K-cycles make the cycle a
                # NONLINEAR preconditioner: the outer iteration must be
                # flexible (right-preconditioned FGMRES, Saad 1993)
                from ..algebra.krylov import fgmres
                solve1 = lambda b: fgmres(A.matvec, b, M=M, tol=cfg.rtol,
                                          atol=cfg.atol, restart=cfg.restart,
                                          max_restarts=cfg.max_outer)
            else:
                solve1 = lambda b: gmres(A.matvec, b, M=M, tol=cfg.rtol,
                                         atol=cfg.atol, restart=cfg.restart,
                                         max_restarts=cfg.max_outer)
            delta, info = solve1(-R)
            if extra_rhs is not None:
                # bordered-system columns D = A^{-1} B (scalar global
                # unknowns, reference "theta" rows/cols
                # opt_systems_ns_dirichlet.hpp:995-1012)
                D = jnp.stack([solve1(extra_rhs[:, j])[0]
                               for j in range(extra_rhs.shape[1])], axis=1)
                return u + delta, delta, info.residual, info.iters, D
            return u + delta, delta, info.residual, info.iters

        jitted = jax.jit(step, static_argnames=())

        def run(u, tables, aux_fields, aux_scalars, extra_rhs=None):
            if rediscretize:
                ctables = [self.assemblers[l].device_tables_cached()
                           for l in range(level)]
                caux = [self._aux_arrays(l) for l in range(level)]
            else:
                ctables = caux = None
            return jitted(u, tables, aux_fields, aux_scalars, transfers,
                          dmasks, vblocks, ctables, caux, rsol_chain,
                          bell_fine, bell_coarse, extra_rhs)

        self._step_fns[level] = run
        return run

    def _matrix_free_step(self, level: int, a, cfg, transfers, dmasks):
        """Matrix-free step (SURVEY.md §7 "two matrix paths"): the fine
        operator is ``jax.linearize`` of the residual — NO fine-level ELL
        data is ever materialized.  MG coarse side: the level below is
        re-assembled on its own mesh at the averaged-restricted state
        (u_c = (P^T u)/(P^T 1)); deeper levels Galerkin-coarsen from it."""
        from ..algebra.mg import build_hierarchy_matfree
        assemble_res = a.make_assemble_fn(with_jacobian=False,
                                          pass_tables=True)
        diag_fn = a.make_diag_fn()
        m_f = jnp.asarray(a.dirichlet_mask)

        sub_tr = fine_pr = rsol = None
        a_c = None
        vblocks = None
        if transfers:
            sub_tr = self._transfers_for(level - 1)
            fine_pr = (transfers[level - 1][0], transfers[level - 1][1])
            a_c = self.assemblers[level - 1]
            assemble_c = a_c.make_assemble_fn(pass_tables=True)
            P_sol = block_diag_prolongation(self.ml_mesh.levels[level - 1],
                                            self.ml_mesh.levels[level],
                                            self.unknowns)
            from ..algebra.transfer import op_pair_from_scipy as _opp
            _, Rsol = _opp(P_sol.tocsr())
            w = np.asarray(P_sol.sum(axis=0)).ravel()
            winv = jnp.asarray(np.where(np.abs(w) > 1e-14, 1.0 / np.maximum(
                np.abs(w), 1e-14), 0.0))
            rsol = (Rsol, winv)
            if cfg.smoother == "vanka":
                from ..algebra.vanka import build_element_blocks
                vblocks = []
                for l in range(level):
                    pat = (sub_tr[l][2].coarse_pattern if l < len(sub_tr)
                           else None)
                    vblocks.append(build_element_blocks(
                        self.assemblers[l], cfg.vanka_block_elems,
                        pattern=pat))

        def step(u, tables, aux_fields, aux_scalars, sub_tr_a, fine_pr_a,
                 dmasks_a, vblocks_a, tables_c, aux_c, rsol_a):
            R, lin = jax.linearize(
                lambda uu: assemble_res(uu, tables, aux_fields,
                                        aux_scalars)[0], u)

            def Amv(v):
                vm = jnp.where(m_f, 0.0, v)
                return jnp.where(m_f, v, lin(vm))

            diag = diag_fn(u, tables, aux_fields, aux_scalars)
            if transfers:
                Rsol_a, winv_a = rsol_a
                u_c0 = (Rsol_a @ u[:Rsol_a.n_cols]) * winv_a
                u_c = (jnp.zeros(a_c.n_dofs_pad, u.dtype)
                       .at[:u_c0.shape[0]].set(u_c0))
                _, data_c = assemble_c(u_c, tables_c, aux_c, aux_scalars)
                A_c = a_c.op_with(data_c)
                h = build_hierarchy_matfree(
                    Amv, diag, A_c, list(sub_tr_a) + [fine_pr_a],
                    smoother=cfg.smoother, n_pre=cfg.n_pre,
                    n_post=cfg.n_post, cheb_degree=cfg.cheb_degree,
                    dir_masks=dmasks_a[:-1] if dmasks_a else None,
                    vanka_blocks=vblocks_a, vanka_omega=cfg.vanka_omega)
                M = h.as_preconditioner(cfg.mg_cycle)
            else:
                dsafe = jnp.where(jnp.abs(diag) < 1e-30, 1.0, diag)
                M = lambda r: r / dsafe
            if cfg.outer == "cg":
                delta, info = cg(Amv, -R, M=M, tol=cfg.rtol, atol=cfg.atol,
                                 maxiter=cfg.max_outer * cfg.restart)
            else:
                delta, info = gmres(Amv, -R, M=M, tol=cfg.rtol,
                                    atol=cfg.atol, restart=cfg.restart,
                                    max_restarts=cfg.max_outer)
            return u + delta, delta, info.residual, info.iters

        jitted = jax.jit(step)

        def run(u, tables, aux_fields, aux_scalars):
            tables_c = a_c.device_tables_cached() if a_c is not None else None
            aux_c = self._aux_arrays(level - 1) if a_c is not None else {}
            return jitted(u, tables, aux_fields, aux_scalars, sub_tr,
                          fine_pr, dmasks, vblocks, tables_c, aux_c, rsol)

        return run

    # ---- norms ---------------------------------------------------------
    def eps_norms(self, delta: np.ndarray, u: np.ndarray, level: int) -> Dict[str, float]:
        """Per-variable ||eps|| / ||sol|| (reference HasNonLinearConverged,
        NonLinearImplicitSystem.cpp:113-153)."""
        a = self.assemblers[level]
        if a.stack_perm is not None:          # physical -> logical slices
            delta = np.asarray(delta)[a.stack_perm]
            u = np.asarray(u)[a.stack_perm]
        out = {}
        for unk in self.unknowns:
            off = a.offsets[unk.name]
            n = self.dofmap_size(unk.name, level)
            e = np.linalg.norm(delta[off:off + n])
            s = np.linalg.norm(u[off:off + n])
            out[unk.name] = e / max(s, 1e-250)
        return out

    def profile_step(self, level: int = -1, reps: int = 3) -> Dict[str, float]:
        """Per-phase wall-time split of one solve step at ``level`` —
        assembly / Galerkin coarsening (PtAP or R A P) / smoother+hierarchy
        build / full solve — the reference prints exactly this split per
        run (LinearImplicitSystem.cpp:326,372,406 assembly vs preparation
        vs solver time; NonLinearImplicitSystem.cpp:89-98).  Times each
        phase as its own jitted function (compile excluded, best of
        ``reps``, host-fetch synchronized) at the CURRENT solution state;
        phases overlap the fused production step, so the split is
        diagnostic, not additive bookkeeping.  Returns seconds."""
        import time as _t

        n_levels = len(self.ml_mesh.levels)
        if level < 0:
            level += n_levels
        a = self.assemblers[level]
        assemble = jax.jit(a.make_assemble_fn(pass_tables=True))
        u = jnp.asarray(self.gather(level))
        tabs = a.device_tables_cached()
        aux = self._aux_arrays(level)
        scal = self._aux_scalars_traced()

        def best(fn, *args):
            np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
            ts = []
            for _ in range(reps):
                t0 = _t.perf_counter()
                np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
                ts.append(_t.perf_counter() - t0)
            return min(ts)

        out = {"assembly_s": best(lambda u_: assemble(u_, tabs, aux, scal),
                                  u)}
        _, data = assemble(u, tabs, aux, scal)
        if self.config.use_mg and level > 0:
            tr = self._transfers_for(level)
            coarsen = jax.jit(lambda d, t: t[0][2].apply(d))
            out["coarsen_s"] = best(coarsen, data, tr)
        step = self.step_fn(level)
        out["solve_step_s"] = best(lambda u_: step(u_, tabs, aux, scal)[0],
                                   u)
        self.timing.update({k: v for k, v in out.items()})
        return out

    def dofmap_size(self, name: str, level: int) -> int:
        return self.ml_sol.n_dofs(name, level)


class LinearImplicitSystem(System):
    """One assemble + MG-preconditioned solve per level (V_CYCLE) or a
    coarse-to-fine ratchet (F_CYCLE)."""

    def solve(self) -> Dict[str, float]:
        assert self._initialized, "call init() first"
        n_levels = len(self.ml_mesh.levels)
        levels = (range(n_levels) if self.config.mg_type.upper() == "F"
                  else [n_levels - 1])
        info = {}
        for l in levels:
            t0 = _time.perf_counter()
            u = jnp.asarray(self.gather(l))
            step = self.step_fn(l)
            u_new, delta, res, iters = step(u, self.assemblers[l].device_tables_cached(), self._aux_arrays(l), self._aux_scalars_traced())
            u_new.block_until_ready()
            self.timing["solve"] += _time.perf_counter() - t0
            self.scatter(np.asarray(u_new), l)
            info = {"level": l, "residual": float(res), "iters": int(iters)}
            if l < n_levels - 1 and self.config.mg_type.upper() == "F":
                self.ml_sol.refine_from(l)
                # re-impose fine-level Dirichlet values
                self._apply_bc_values(l + 1)
        if self.config.verbose:
            print(f"[{self.name}] solver: {self.solver_info()}")
        return info

    def _apply_bc_values(self, level: int) -> None:
        for u in self.unknowns:
            codes = self.ml_sol.bdc[level].get(u.name)
            if codes is None:
                continue
            sel = codes == DIRICHLET
            self.ml_sol.sol[level][u.name][sel] = \
                self.ml_sol.bdc_value[level][u.name][sel]


class NonLinearImplicitSystem(LinearImplicitSystem):
    """Newton-MG: outer Newton loop per level (reference MGsolve,
    NonLinearImplicitSystem.cpp:157-260)."""

    def solve(self) -> Dict[str, float]:
        assert self._initialized, "call init() first"
        cfg = self.config
        n_levels = len(self.ml_mesh.levels)
        levels = (range(n_levels) if cfg.mg_type.upper() == "F"
                  else [n_levels - 1])
        history = []
        for l in levels:
            step = self.step_fn(l)
            restarted = False
            it = 0
            while it < cfg.max_nonlinear:
                u = jnp.asarray(self.gather(l))
                t0 = _time.perf_counter()
                u_new, delta, res, iters = step(u, self.assemblers[l].device_tables_cached(), self._aux_arrays(l), self._aux_scalars_traced())
                u_new.block_until_ready()
                self.timing["solve"] += _time.perf_counter() - t0
                norms = self.eps_norms(np.asarray(delta), np.asarray(u_new), l)
                worst = max(norms.values())
                if np.isnan(worst) or np.isinf(worst):
                    # reference "bit flip" NaN recovery: restart level once
                    # (LinearImplicitSystem.cpp:394-449)
                    if not restarted:
                        restarted = True
                        self._apply_bc_values(l)
                        it = 0
                        continue
                    raise FloatingPointError(
                        f"NaN in system '{self.name}' level {l} after restart")
                self.scatter(np.asarray(u_new), l)
                history.append({"level": l, "newton_it": it, "eps": norms,
                                "lin_res": float(res), "lin_iters": int(iters)})
                it += 1
                if worst < cfg.nonlinear_tol:
                    break
            if l < n_levels - 1 and cfg.mg_type.upper() == "F":
                self.ml_sol.refine_from(l)
                self._apply_bc_values(l + 1)
        self.history = history
        if cfg.verbose:
            print(f"[{self.name}] solver: {self.solver_info()}")
        return history[-1] if history else {}
