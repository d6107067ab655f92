"""Full-state checkpoint / resume for long runs.

The reference has two checkpoint layers (SURVEY.md §5.4): per-variable binary
solution dumps (MultiLevelSolution.cpp SaveSolution/LoadSolution,
MultiLevelSolution.hpp:348-352) and run-directory restart bookkeeping
(Files::ConfigureRestart, Files.cpp:66-95).  The TPU-native equivalent is a
single checkpoint of the *whole* run state as a pytree — solution fields per
level, simulation time/step, transient old-solution fields, particle clouds
(markers/MPM), and PRNG keys — written atomically with orbax when available
(sharded-array aware, async-safe) and falling back to a plain ``.npz`` bundle
otherwise.

State is captured/restored through small adapter functions so any of the
framework's objects (MultiLevelSolution, MarkerCloud, MPMState, transient
systems) can participate without a hard dependency on this module.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import numpy as np

try:  # orbax is in the image; keep the fallback for minimal installs
    import orbax.checkpoint as _ocp
except Exception:  # pragma: no cover
    _ocp = None


# ---------------------------------------------------------------------------
# state capture / restore adapters
# ---------------------------------------------------------------------------

def capture_solution(ml_sol) -> Dict[str, Any]:
    """Snapshot a MultiLevelSolution into a pure-array pytree."""
    levels = []
    for l in range(len(ml_sol.sol)):
        levels.append({
            "sol": {k: np.asarray(v) for k, v in ml_sol.sol[l].items()},
            "old": {k: np.asarray(v) for k, v in ml_sol.sol_old[l].items()},
        })
    return {"levels": levels}


def restore_solution(ml_sol, state: Dict[str, Any]) -> None:
    for l, lev in enumerate(state["levels"]):
        for k, v in lev.get("sol", {}).items():
            ml_sol.sol[l][k][:] = v
        for k, v in lev.get("old", {}).items():
            if k in ml_sol.sol_old[l]:
                ml_sol.sol_old[l][k][:] = v


def capture_system(system) -> Dict[str, Any]:
    """Snapshot transient bookkeeping of a System (time, dt, step count)."""
    out = {}
    for attr in ("time", "dt", "step_count", "_time", "_dt"):
        if hasattr(system, attr):
            v = getattr(system, attr)
            if isinstance(v, (int, float)):
                out[attr] = np.asarray(v)
    return out


def restore_system(system, state: Dict[str, Any]) -> None:
    for attr, v in state.items():
        if hasattr(system, attr):
            cur = getattr(system, attr)
            setattr(system, attr, type(cur)(v) if isinstance(
                cur, (int, float)) else v)


def capture_particles(cloud) -> Dict[str, Any]:
    """Snapshot a MarkerCloud or MPMState (any dataclass of arrays)."""
    fields = getattr(cloud, "__dataclass_fields__", None)
    if fields is None:
        raise TypeError("expected a dataclass of arrays")
    out: Dict[str, Any] = {}
    for k in fields:
        v = getattr(cloud, k)
        if hasattr(v, "shape") and hasattr(v, "dtype"):
            out[k] = np.asarray(v)
        elif isinstance(v, dict) and all(
                hasattr(x, "shape") for x in v.values()):
            out[k] = {kk: np.asarray(x) for kk, x in v.items()}
    return out


def restore_particles(cloud, state: Dict[str, Any]):
    """Return a copy of ``cloud`` with checkpointed arrays substituted."""
    import dataclasses
    kw = {k: state[k] for k in state}
    return dataclasses.replace(cloud, **kw)


# ---------------------------------------------------------------------------
# checkpoint manager
# ---------------------------------------------------------------------------

class CheckpointManager:
    """Numbered, atomic checkpoints under a directory, newest-k retention.

    save(step, state) / restore(step=None) / latest_step().  With orbax the
    state pytree may contain live (sharded) jax.Arrays; the npz fallback
    requires host-transferable arrays.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 use_orbax: Optional[bool] = None):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._orbax = (_ocp is not None) if use_orbax is None else use_orbax
        if self._orbax:
            self._mgr = _ocp.CheckpointManager(
                self.dir,
                options=_ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True))

    # -- orbax path --------------------------------------------------------
    def save(self, step: int, state: Dict[str, Any]) -> None:
        if self._orbax:
            self._mgr.save(step, args=_ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
            return
        self._save_npz(step, state)

    def restore(self, step: Optional[int] = None) -> Dict[str, Any]:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        if self._orbax:
            return self._mgr.restore(step)
        return self._load_npz(step)

    def latest_step(self) -> Optional[int]:
        if self._orbax:
            return self._mgr.latest_step()
        steps = [int(d.split("_")[1]) for d in os.listdir(self.dir)
                 if d.startswith("ckpt_")]
        return max(steps) if steps else None

    # -- npz fallback (flat key paths, atomic rename) ----------------------
    def _save_npz(self, step: int, state: Dict[str, Any]) -> None:
        flat = {}
        _flatten("", state, flat)
        tmp = os.path.join(self.dir, f".tmp_ckpt_{step}")
        final = os.path.join(self.dir, f"ckpt_{step}")
        os.makedirs(tmp, exist_ok=True)
        np.savez(os.path.join(tmp, "state.npz"),
                 **{k: np.asarray(v) for k, v in flat.items()})
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        self._gc()

    def _load_npz(self, step: int) -> Dict[str, Any]:
        data = np.load(os.path.join(self.dir, f"ckpt_{step}", "state.npz"),
                       allow_pickle=False)
        out: Dict[str, Any] = {}
        for k in data.files:
            _insert(out, k.split("/"), data[k])
        return _unlistify(out)

    def _gc(self) -> None:
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(self.dir)
                       if d.startswith("ckpt_"))
        for s in steps[:-self.max_to_keep]:
            shutil.rmtree(os.path.join(self.dir, f"ckpt_{s}"))


def _flatten(prefix: str, tree: Any, out: Dict[str, Any]) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}{k}/", v, out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}#{i}/", v, out)
    else:
        out[prefix[:-1]] = tree


def _insert(tree: Dict[str, Any], path, leaf) -> None:
    key = path[0]
    if len(path) == 1:
        tree[key] = leaf
        return
    child = tree.setdefault(key, {})
    _insert(child, path[1:], leaf)


def _unlistify(tree: Any) -> Any:
    """Convert '#i' dict layers back to lists (npz fallback round-trip)."""
    if isinstance(tree, dict):
        if tree and all(k.startswith("#") for k in tree):
            items = sorted(tree.items(), key=lambda kv: int(kv[0][1:]))
            return [_unlistify(v) for _, v in items]
        return {k: _unlistify(v) for k, v in tree.items()}
    return tree
