"""Smoke-run the examples (tutorial-app parity, reference 000_tutorial
and friends) at reduced sizes."""
import importlib
import os
import sys

import pytest

pytestmark = pytest.mark.slow

EX_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, os.path.abspath(EX_DIR))


@pytest.mark.parametrize("mod,env", [
    ("ex01_function_approximation", {"EX_N": "4"}),
    ("ex03_navier_stokes_cavity", {"EX_N": "6"}),
    ("ex05_markers_magnetic", {}),
    ("ex06_mpm_fsi_block", {"EX_N": "4"}),
    ("ex07_uq_pce", {}),
    ("ex08_tumor_diffusion", {"EX_LEVELS": "2", "EX_STEPS": "3"}),
    ("ex09_amr_mg", {"EX_N": "4", "EX_CYCLES": "2"}),
    ("ex10_sharded_transient_particles", {"EX_N": "6", "EX_STEPS": "4"}),
])
def test_example_runs(mod, env, monkeypatch, capsys, tmp_path):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("EX_OUT", str(tmp_path / "out.vtu"))
    m = importlib.import_module(mod)
    m.main()
    out = capsys.readouterr().out
    assert out.strip(), mod
    assert "nan" not in out.lower().replace("nan)", "")
