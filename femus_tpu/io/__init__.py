"""Output writers: VTK (.vtu/.pvtu), GMV (binary), XDMF (+HDF5).

``build_writer`` mirrors the reference Writer factory (Writer.hpp:44,
build :58-61 over WriterEnum {VTK, GMV, XDMF}).
"""
from .vtk import VTKWriter, write_vtu, write_pvtu, nodal_field  # noqa: F401
from .gmv import GMVWriter, write_gmv, read_gmv                 # noqa: F401
from .xdmf import XDMFWriter, write_xdmf, read_xdmf_h5          # noqa: F401

_WRITERS = {"vtk": VTKWriter, "gmv": GMVWriter, "xdmf": XDMFWriter}


def build_writer(kind: str, ml_sol):
    """Writer::build equivalent: kind in {"vtk", "gmv", "xdmf"}."""
    try:
        return _WRITERS[kind.lower()](ml_sol)
    except KeyError:
        raise ValueError(f"unknown writer '{kind}'; one of {sorted(_WRITERS)}")
