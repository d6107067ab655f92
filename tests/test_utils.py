"""Tests for layer-00/01 equivalents: materials, config parsing, run dirs,
parsed functions (reference src/00_*, src/01_*)."""
import os

import numpy as np
import pytest

from femus_tpu.materials import Fluid, Parameter, Solid
from femus_tpu.utils.config import InputParser
from femus_tpu.utils.files import Files
from femus_tpu.utils.parsed_function import ParsedFunction


def test_fluid_reynolds():
    # Fluid.cpp:66: Re = rho*Uref*Lref/mu
    f = Fluid(parameter=Parameter(lref=0.1, uref=2.0), density=1000.0,
              viscosity=0.001)
    assert f.reynolds == pytest.approx(1000.0 * 2.0 * 0.1 / 0.001)
    assert f.ire == pytest.approx(1.0 / f.reynolds)


def test_solid_lame():
    # Solid.cpp:110-122
    s = Solid(young_module=210e9, poisson_coeff=0.3, model="Neo-Hookean")
    E, nu = 210e9, 0.3
    assert s.lame_lambda == pytest.approx(E * nu / ((1 + nu) * (1 - 2 * nu)))
    assert s.lame_shear_modulus == pytest.approx(E / (2 * (1 + nu)))
    assert s.physical_model == 1 and not s.penalty
    s_inc = Solid(poisson_coeff=0.5, model="Saint-Venant")
    assert s_inc.lame_lambda == 1.0e100
    with pytest.raises(ValueError):
        Solid(model="Bogus")
    with pytest.raises(ValueError):
        Solid(poisson_coeff=0.5, model="Saint-Venant-Penalty")


def test_input_parser(tmp_path):
    j = tmp_path / "conf.json"
    j.write_text('{"mesh": {"n": 16, "type": "quad"}, "levels": [1, 2, 3]}')
    p = InputParser.from_json(str(j))
    assert p.get("mesh.n") == 16
    assert p["mesh/type"] == "quad"
    assert p.get_size("levels") == 3
    assert p.get("missing.key", 7) == 7 and not p.have("missing.key")

    kv = tmp_path / "femus_conf.in"
    kv.write_text("nlevels 3  # comment\nsolver gmres\ntol 1e-8\n")
    q = InputParser.from_keyvalue(str(kv))
    assert q["nlevels"] == 3 and q["solver"] == "gmres"
    assert q["tol"] == pytest.approx(1e-8)

    a = InputParser.from_argv(["prog", "--nlevels=5", "--verbose"])
    merged = q.merge(a)
    assert merged["nlevels"] == 5 and merged["verbose"] is True


def test_files_restart(tmp_path):
    root = str(tmp_path / "out")
    f1 = Files(output_root=root)
    d1 = f1.setup(stamp="run1")
    assert os.path.isdir(d1)
    f1.mark_for_restart()

    f2 = Files(output_root=root)
    f2.setup(restart=True, stamp="run2")
    assert f2.restart_dir == d1
    with f2.redirect_stdout() as logpath:
        print("hello from run2")
    assert "hello" in open(logpath).read()


def test_parsed_function():
    f = ParsedFunction("sin(pi*x)*cos(pi*y) + t")
    x = np.array([[0.5, 0.0], [0.5, 1.0]])
    vals = f(x, t=2.0)
    assert vals == pytest.approx([3.0, 1.0])
    assert f(np.array([0.5, 0.0]), t=0.0) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        ParsedFunction("__import__('os')")
    with pytest.raises(ValueError):
        ParsedFunction("system(x)")


def test_phase_timer_and_convergence_table():
    import time as _t
    from femus_tpu.utils.telemetry import PhaseTimer, convergence_table
    pt = PhaseTimer()
    with pt.phase("assembly"):
        _t.sleep(0.01)
    with pt.phase("solve"):
        _t.sleep(0.02)
    with pt.phase("solve"):
        pass
    d = pt.as_dict()
    # both phases accumulated positive wall time; do NOT compare the two
    # sleeps against each other — scheduler jitter makes that flaky
    assert d["assembly"] > 0 and d["solve"] > 0
    rep = pt.report()
    assert "assembly" in rep and "solve" in rep
    hist = [{"level": 0, "newton_it": 0, "lin_iters": 5, "lin_res": 1e-3,
             "eps": {"u": 1e-2}},
            {"level": 0, "newton_it": 1, "lin_iters": 4, "lin_res": 1e-8,
             "eps": {"u": 1e-7}}]
    tab = convergence_table(hist)
    assert "1.000e-08" in tab and tab.count("\n") == 2
