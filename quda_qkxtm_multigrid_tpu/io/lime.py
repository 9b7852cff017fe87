"""LIME / ILDG gauge-configuration I/O (pure NumPy host code).

The analogue of the reference's parallel LIME reader
(reference qkxtm/QKXTM_read_conf.h:299-764 readLimeGauge, big-endian
byte swap qudaQKXTM_Kepler.h:22-60).  The TPU build reads on host and
device_puts the canonical layout; file-system parallelism is handled by
the filesystem, not MPI-IO.

LIME container format: records with 144-byte headers
  magic   u32  BE  0x456789ab
  version u16  BE
  flags   u16  BE  (MB/ME bits)
  length  u64  BE  (data bytes; data padded to a multiple of 8)
  type    128 bytes, NUL-padded string
ILDG binary data record ("ildg-binary-data"): site-ordered
[t][z][y][x][mu][row][col][re,im] big-endian float64 (or float32),
mu in (x, y, z, t) order.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = 0x456789AB
_HDR = struct.Struct(">IHHQ128s")


def read_records(path: str):
    """Yield (type, bytes) for every LIME record."""
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(144)
            if len(hdr) < 144:
                break
            magic, _ver, _flags, length, rtype = _HDR.unpack(hdr)
            if magic != _MAGIC:
                raise ValueError(f"bad LIME magic {magic:#x} in {path}")
            name = rtype.split(b"\0", 1)[0].decode()
            data = f.read(length)
            pad = (8 - length % 8) % 8
            f.read(pad)
            out.append((name, data))
    return out


def write_records(path: str, records):
    """records: iterable of (type, bytes)."""
    with open(path, "wb") as f:
        n = len(records)
        for i, (name, data) in enumerate(records):
            flags = 0
            if i == 0:
                flags |= 0x8000          # MB
            if i == n - 1:
                flags |= 0x4000          # ME
            f.write(_HDR.pack(_MAGIC, 1, flags, len(data),
                              name.encode().ljust(128, b"\0")))
            f.write(data)
            f.write(b"\0" * ((8 - len(data) % 8) % 8))


def read_ildg_gauge(path: str, dims=None, precision=None):
    """Read an ILDG gauge configuration → [4, T, Z, Y, X, 3, 3] complex128
    (lexicographic; feed through fields.gauge_from_full for the canonical
    layout).  ``dims``=(X,Y,Z,T) may be inferred from the ildg-format
    record if present."""
    recs = dict(read_records(path))
    if dims is None:
        fmt = recs.get("ildg-format")
        if fmt is None:
            raise ValueError("no dims given and no ildg-format record")
        import re
        txt = fmt.decode(errors="ignore")
        g = {k: int(re.search(f"<{k}>(\\d+)</{k}>", txt).group(1))
             for k in ("lx", "ly", "lz", "lt")}
        dims = (g["lx"], g["ly"], g["lz"], g["lt"])
        if precision is None:
            m = re.search(r"<precision>(\d+)</precision>", txt)
            precision = int(m.group(1)) if m else 64
    if precision is None:
        precision = 64
    X, Y, Z, T = dims
    data = recs["ildg-binary-data"]
    # threaded native byte-swap when the g++-built helper is present
    # (native/qkxtm_native.cpp — the reference's swap loops,
    # qudaQKXTM_Kepler.h:22-60, run here as multi-core C++)
    from quda_qkxtm_multigrid_tpu.io._native import decode_be
    arr = decode_be(data, precision)
    arr = arr.reshape(T, Z, Y, X, 4, 3, 3, 2)
    cplx = arr[..., 0] + 1j * arr[..., 1]
    return np.moveaxis(cplx, 4, 0)       # [mu(x,y,z,t), T, Z, Y, X, 3, 3]


def write_ildg_gauge(path: str, u_full, precision: int = 64):
    """u_full [4, T, Z, Y, X, 3, 3] → ILDG LIME file."""
    mu_first = np.moveaxis(np.asarray(u_full), 0, 4)   # [T,Z,Y,X,4,3,3]
    T, Z, Y, X = mu_first.shape[:4]
    flat = np.stack([mu_first.real, mu_first.imag], axis=-1)
    from quda_qkxtm_multigrid_tpu.io._native import encode_be
    payload = encode_be(flat, precision)
    fmt = (f'<?xml version="1.0" encoding="UTF-8"?><ildgFormat>'
           f"<version>1.0</version><field>su3gauge</field>"
           f"<precision>{precision}</precision>"
           f"<lx>{X}</lx><ly>{Y}</ly><lz>{Z}</lz><lt>{T}</lt>"
           f"</ildgFormat>").encode()
    write_records(path, [("ildg-format", fmt), ("ildg-binary-data", payload)])
