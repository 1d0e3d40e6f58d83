"""Compute kernels: tables, doric chemistry, thermal, the wavefront sweep."""
