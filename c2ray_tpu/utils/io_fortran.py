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
from typing import List, Optional, Tuple

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


def read_sm3d_slab(path: str, dtype, mesh: Tuple[int, int, int],
                   row0: int, nrows: int) -> np.ndarray:
    """Read grid-axis-0 rows [row0, row0+nrows) of an sm3d cube without
    materializing the rest (the file is seekable; the halo layout's
    per-process slab ingestion relies on this).  Returns a C-order
    (nrows, n2, n3) slab."""
    with open(path, "rb") as f:
        head = f.read(4)
        (nh,) = struct.unpack("<i", head)
        m = np.frombuffer(f.read(nh), np.int32)
        if tuple(m) != tuple(mesh):
            raise ValueError(f"{path}: mesh {tuple(m)} != expected {mesh}")
        f.read(4)
        f.read(4)                      # data record marker
        data_off = f.tell()
    mm = np.memmap(path, dtype=dtype, mode="r", offset=data_off,
                   shape=tuple(mesh), order="F")
    return np.ascontiguousarray(mm[row0:row0 + nrows])


def read_stream_cube_slab(path: str, mesh: Tuple[int, int, int],
                          dtype=np.float32, row0: int = 0,
                          nrows: Optional[int] = None,
                          header: bool = True) -> np.ndarray:
    """Slab read of a stream-access cube (see read_stream_cube)."""
    nrows = mesh[0] if nrows is None else nrows
    off = 12 if header else 0
    if header:
        with open(path, "rb") as f:
            m = np.fromfile(f, np.int32, 3)
            if tuple(m) != tuple(mesh):
                raise ValueError(f"{path}: mesh {tuple(m)} != {mesh}")
    mm = np.memmap(path, dtype=dtype, mode="r", offset=off,
                   shape=tuple(mesh), order="F")
    return np.ascontiguousarray(mm[row0:row0 + nrows])


def write_sm3d_stream(path: str, mesh: Tuple[int, int, int], dtype,
                      blocks) -> None:
    """Write an sm3d cube from a stream of z-blocks.

    `blocks` yields C-order (n1, n2, kc) arrays covering ascending z.
    In the file's Fortran order z is the SLOWEST axis, so each block is
    one contiguous span of the data record — peak memory is one block,
    never the cube (the write path of the halo layout's outputs)."""
    n1, n2, n3 = mesh
    itemsize = np.dtype(dtype).itemsize
    total = n1 * n2 * n3 * itemsize
    header = np.asarray(mesh, np.int32).tobytes()
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(header)))
        f.write(header)
        f.write(struct.pack("<i", len(header)))
        f.write(struct.pack("<i", total))
        written = 0
        for b in blocks:
            chunk = np.asarray(b, dtype).tobytes(order="F")
            f.write(chunk)
            written += len(chunk)
        if written != total:
            raise IOError(f"{path}: wrote {written} bytes, expected {total}")
        f.write(struct.pack("<i", total))


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
