"""Fortran binary I/O: unformatted sequential records and the sm3d cube
format.

Byte-exact re-implementation of the reference's file formats so its
outputs/inputs and post-processing tools interoperate unchanged:
  - Fortran unformatted sequential records: 4-byte length marker +
    payload + 4-byte length marker (gfortran convention).
  - sm3d cubes (/root/reference/read_sm3d.f90): record 1 = three int32
    mesh sizes, record 2 = the whole array (float64 "dp" or float32 "si"
    variants), Fortran (column-major) order.
  - stream-access files (densityaccess="stream",
    nbody_test.F90:74-77): raw header + data without record markers.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np


def read_unformatted_records(path: str) -> List[bytes]:
    """Read all records of a Fortran unformatted sequential file."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (n,) = struct.unpack("<i", head)
            payload = f.read(n)
            tail = f.read(4)
            if len(payload) != n or struct.unpack("<i", tail)[0] != n:
                raise IOError(f"corrupt Fortran record in {path}")
            out.append(payload)
    return out


def write_unformatted_records(path: str, records: List[bytes]) -> None:
    with open(path, "wb") as f:
        for payload in records:
            marker = struct.pack("<i", len(payload))
            f.write(marker)
            f.write(payload)
            f.write(marker)


def write_sm3d(path: str, array: np.ndarray, dtype=np.float64) -> None:
    """Write a 3D cube in sm3d format (write_sm3d_*_file_routine,
    read_sm3d.f90:63-104): header record (m1,m2,m3 int32) + data record
    in Fortran order."""
    a = np.asarray(array)
    header = np.asarray(a.shape, np.int32).tobytes()
    data = np.asfortranarray(a.astype(dtype)).tobytes(order="F")
    write_unformatted_records(path, [header, data])


def read_sm3d(path: str, dtype=np.float64,
              expect_mesh: Tuple[int, int, int] = None) -> np.ndarray:
    """Read an sm3d cube; validates the mesh header like the reference
    (read_sm3d.f90:22-27, density_module.F90:217-223)."""
    recs = read_unformatted_records(path)
    mesh = np.frombuffer(recs[0], np.int32)
    if expect_mesh is not None and tuple(mesh) != tuple(expect_mesh):
        raise ValueError(f"{path}: mesh {tuple(mesh)} != expected {expect_mesh}")
    a = np.frombuffer(recs[1], dtype).reshape(tuple(mesh), order="F")
    return np.ascontiguousarray(a)


def read_stream_cube(path: str, mesh: Tuple[int, int, int],
                     dtype=np.float32, header: bool = True) -> np.ndarray:
    """Read a stream-access (headerless-record) binary cube, optionally
    with a leading (m1,m2,m3) int32 header (densityformat="unformatted",
    densityaccess="stream" in the nbody adapters)."""
    with open(path, "rb") as f:
        if header:
            m = np.fromfile(f, np.int32, 3)
            if tuple(m) != tuple(mesh):
                raise ValueError(f"{path}: mesh {tuple(m)} != expected {mesh}")
        a = np.fromfile(f, dtype, int(np.prod(mesh)))
    return np.ascontiguousarray(a.reshape(mesh, order="F"))


def write_stream_cube(path: str, array: np.ndarray, dtype=np.float32,
                      header: bool = True) -> None:
    with open(path, "wb") as f:
        a = np.asarray(array)
        if header:
            np.asarray(a.shape, np.int32).tofile(f)
        a.astype(dtype).flatten(order="F").tofile(f)
