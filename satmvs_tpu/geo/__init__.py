"""Geodetic / camera-model core (reference layer L0)."""

from . import pinhole, rpc, solver, tmerc  # noqa: F401
