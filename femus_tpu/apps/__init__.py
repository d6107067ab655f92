"""Reference-application equivalents (SURVEY.md §2.3).

Each module wires meshes + unknowns + forms + BCs into a runnable problem,
the way each ``applications/*/main.cpp`` of the reference does, so golden
tests and benchmarks can share one setup.
"""
